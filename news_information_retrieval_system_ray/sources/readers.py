"""Doc-id-assigning Parquet reader.

The reference assigns dense int doc_ids by load order in one process
(/root/reference/src/ir/index/inverted_index.py:185-186).  At cluster
scale the assignment must be deterministic and independent of task
scheduling (SURVEY §7.6.5 — doc-id order feeds delta encoding).

Scheme: files sorted by path; the driver reads only Parquet *footers*
(metadata) to get per-row-group row counts; ``doc_id = base(file,
row_group) + offset_in_row_group`` where bases are the running cumsum.
The dataset is then built as ``from_items([(path, rg, base), ...])``
→ ``map_batches(load_row_group)``: each task reads one row group with
pyarrow and attaches its contiguous doc_id range.  Parallelism is per
row group; ordering of execution does not affect ids.
"""

from __future__ import annotations

import glob
import os
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


@dataclass(frozen=True)
class RowGroupItem:
    path: str
    row_group: int
    doc_base: int
    num_rows: int


def list_input_files(path: str | list[str]) -> list[str]:
    """Deterministic sorted file list (mirrors the reference's sorted
    glob, doc_reader.py:255-257)."""
    if isinstance(path, (list, tuple)):
        return sorted(path)
    if os.path.isdir(path):
        return sorted(glob.glob(os.path.join(path, "*.parquet")))
    return sorted(glob.glob(path)) if any(c in path for c in "*?[") else [path]


def plan_row_groups(files: list[str]) -> list[RowGroupItem]:
    """Metadata-only pass assigning contiguous doc-id bases per row group."""
    items: list[RowGroupItem] = []
    base = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        for rg in range(md.num_row_groups):
            n = md.row_group(rg).num_rows
            items.append(RowGroupItem(f, rg, base, n))
            base += n
    return items


def total_rows(items: list[RowGroupItem]) -> int:
    return sum(i.num_rows for i in items)


def read_jsonl_docs(path: str | list[str], *, limit_per_file: int | None = None,
                    content_fields: tuple[str, ...] = ("content", "content_clean", "text", "body")):
    """JSONL corpus reader with the reference's tolerance semantics
    (doc_reader.py:147-222): one JSON object per line, corrupt lines are
    SKIPPED (not fatal), docs whose content (first present field of
    ``content_fields``, the reference's field-fallback chain,
    document_service.py:159-174) is empty are dropped, optional per-file
    limit.  Returns a ``ray.data.Dataset`` of parsed rows with a ``text``
    column holding the resolved content."""
    import json

    import ray.data as rd

    files = list_input_files(path) if not isinstance(path, (list, tuple)) else sorted(path)
    ds = rd.from_items([{"path": f} for f in files], override_num_blocks=max(1, len(files)))

    def load_file(batch: pa.Table) -> pa.Table:
        rows: list[dict] = []
        for file_row in batch.to_pylist():
            kept = 0
            with open(file_row["path"], encoding="utf-8") as f:
                for line in f:
                    if limit_per_file is not None and kept >= limit_per_file:
                        break
                    line = line.strip()
                    if not line:
                        continue
                    try:
                        obj = json.loads(line)
                    except json.JSONDecodeError:
                        continue  # per-line tolerance (doc_reader.py:208-220)
                    text = next((obj[k] for k in content_fields
                                 if isinstance(obj.get(k), str) and obj[k].strip()), None)
                    if text is None:
                        continue  # skip empty-content docs
                    rows.append({
                        "title": str(obj.get("title", "") or ""),
                        "url": str(obj.get("url", "") or ""),
                        "text": text,
                    })
                    kept += 1
        return pa.Table.from_pylist(rows, schema=pa.schema(
            [("title", pa.string()), ("url", pa.string()), ("text", pa.string())]))

    return ds.map_batches(load_file, batch_size=1, batch_format="pyarrow")


def read_jsonl_glob(path: str) -> list[str]:
    """Deterministic sorted jsonl file list (mirrors doc_reader.py:255-257)."""
    if os.path.isdir(path):
        return sorted(glob.glob(os.path.join(path, "*.jsonl")))
    return sorted(glob.glob(path))


class _LoadRowGroups:
    """map_batches body: item rows -> the actual data with doc_id column."""

    def __init__(self, columns: list[str] | None, id_col: str | None):
        self.columns = columns
        self.id_col = id_col  # None -> assign from doc_base; else rename existing

    def __call__(self, batch: pa.Table) -> pa.Table:
        tables = []
        for row in batch.to_pylist():
            t = pq.ParquetFile(row["path"]).read_row_group(row["row_group"], columns=self.columns)
            if self.id_col is None:
                ids = pa.array(np.arange(row["doc_base"], row["doc_base"] + t.num_rows, dtype=np.int64))
                t = t.append_column("doc_id", ids)
            elif self.id_col != "doc_id":
                t = t.rename_columns(["doc_id" if c == self.id_col else c for c in t.column_names])
            if "shard" in row:  # resume-unit tag for partitioned writes
                t = t.append_column("shard", pa.array(
                    np.full(t.num_rows, row["shard"], dtype=np.int32)))
            tables.append(t)
        return pa.concat_tables(tables)


def read_with_doc_ids(path: str | list[str], columns: list[str] | None = None,
                      *, items: list[RowGroupItem] | None = None, id_col: str | None = None):
    """``ray.data.Dataset`` over the files with a deterministic ``doc_id``
    column (assigned from row-group bases, or renamed from ``id_col`` when
    the input already carries one). ``columns`` prunes at the read (never
    load ``html`` when only ``text`` is needed)."""
    import ray.data as rd

    if items is None:
        items = plan_row_groups(list_input_files(path))
    rows = [i.__dict__ if isinstance(i, RowGroupItem) else dict(i) for i in items]
    # one block per item -> one read task per row group (the parallelism
    # unit); without this from_items packs everything into few blocks and
    # the whole downstream chain runs nearly serial
    ds = rd.from_items(rows, override_num_blocks=len(rows))
    return ds.map_batches(_LoadRowGroups(columns, id_col), batch_size=1, batch_format="pyarrow")
