"""Unified-corpus ETL — the reference's CorpusBuilder rebuilt Ray-native.

Reference: ``src/ir_app/services/corpus_builder.py`` (431 LoC) — the
pipeline that normalizes multi-project crawler outputs (JSONL / JSON /
SQLite) into the one searchable corpus everything downstream consumes:

- ``normalize_record`` (corpus_builder.py:157-231): source resolution
  (``source`` | ``crawl_source`` | infer-from-filename :304-317), field
  fallback chains (title|title_clean; content|content_clean|text|body|
  excerpt; published_date|publish_date|created_at|date; article_id|
  post_id|dedup_hash; author|school; category|forum_alias), blocked-page
  title filter (:20,:181-183), tags from ``tags`` or Dcard ``topics``
  (:185, :325-340 + data_contract.normalize_tags), dedup hash
  (data_contract.py:80-89), taxonomy normalization (vendored in
  ``functions/taxonomy``), ``content_type`` = forum_post iff
  source.lower()=='dcard' (:210), validation
  (data_contract.validate_article:91-114: MISSING_FIELD /
  TITLE_TOO_SHORT(<2) / CONTENT_TOO_SHORT(<20)).
- first-wins dedup by arrival order over ``dedup_hash``
  (corpus_builder.py:224-229) — only VALID records enter the seen-set,
  and records later dropped by a source cap still own their hash.
- per-source / global caps applied to survivors in arrival order
  (corpus_builder.py:91-146).
- build stats (:23-76): per-source scanned/written/invalid/duplicates +
  global invalid_reasons counts (every issue code of an invalid record
  counts, corpus_builder.py:218-222 + :346-355).

Ray-native shape (single-process dict/set loops in the reference):

- normalization = one ``map_batches`` pass (per-record string/dict work;
  the cost is the md5, which is C either way);
- first-wins dedup = per-batch partial (hash -> min seq) -> ``Min``
  groupby -> distributed LEFT SEMI join (the index_build
  dedup_exact_first pattern; no driver set);
- per-source caps = per-batch partial top-cap per source -> bounded
  per-source merge -> LEFT SEMI join on seq (partial-top-k pattern;
  group payload is <= cap x n_batches rows, never the corpus);
- global cap = distributed ``sort(seq).limit(n)``;
- stats = small groupby-count aggregates (scanned/invalid from the
  normalized stream, written/duplicates from the keeper join), merged
  driver-side into one tiny frame.

Arrival order: the caller provides a monotone ``seq`` int64 column
(the reference's order = sorted-file x row order; deterministic doc_id
works for the fixture tables).
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.hashing import dedup_hash as _dedup_hash
from ..functions.taxonomy import normalize_taxonomy

BLOCKED_TITLES = {"sorry, you have been blocked"}  # corpus_builder.py:20
MIN_TITLE_CHARS = 2     # data_contract.py:11
MIN_CONTENT_CHARS = 20  # data_contract.py:10


def infer_source(origin_path: str) -> str:
    """corpus_builder.py:304-317 ``_infer_source`` semantics."""
    path = str(origin_path or "")
    name = path.replace("\\", "/").rsplit("/", 1)[-1].lower()
    if name.startswith("yahoo_"):
        return "yahoo"
    if name.endswith("_14days.jsonl"):
        return name.split("_", 1)[0]
    if "dcard" in path.lower():
        return "dcard"
    stem = name.rsplit(".", 1)[0]
    return stem.split("_", 1)[0]


def normalize_tags(tags: Any) -> list[str]:
    """data_contract.py:115-128 semantics (string split / list / scalar)."""
    if tags is None:
        return []
    if isinstance(tags, str):
        return [t.strip() for t in tags.split(",") if t.strip()]
    if isinstance(tags, (list, np.ndarray)):
        return [str(t).strip() for t in tags if str(t).strip()]
    return [str(tags).strip()] if str(tags).strip() else []


def topics_to_tags(topics: Any) -> list[str]:
    """corpus_builder.py:325-344 ``_topics_to_tags`` (Dcard topic dicts)."""
    if topics is None or not isinstance(topics, (list, np.ndarray)):
        return []
    out: list[str] = []
    for t in topics:
        if isinstance(t, dict):
            v = t.get("name") or t.get("title") or t.get("alias")
            if v:
                out.append(str(v).strip())
        elif t is not None and str(t).strip():
            out.append(str(t).strip())
    return out


def validate_candidate(title: str, content: str) -> list[str]:
    """data_contract.validate_article:91-114 on the normalized candidate
    -> ordered issue codes (MISSING_FIELD per required field, then
    TITLE_TOO_SHORT, then CONTENT_TOO_SHORT)."""
    codes: list[str] = []
    if not title:
        codes.append("MISSING_FIELD")
    if not content:
        codes.append("MISSING_FIELD")
    if title and len(title) < MIN_TITLE_CHARS:
        codes.append("TITLE_TOO_SHORT")
    if content and len(content) < MIN_CONTENT_CHARS:
        codes.append("CONTENT_TOO_SHORT")
    return codes


def _get(row: dict, key: str) -> Any:
    v = row.get(key)
    if v is None or (isinstance(v, float) and np.isnan(v)):
        return None
    return v


def normalize_record(row: dict) -> dict:
    """One raw record -> normalized candidate + status/issue columns
    (corpus_builder.normalize_record:157-231).  Returns every candidate
    field for every record; ``status`` in {'valid','blocked','invalid'}
    and ``issue_codes`` say what a driver loop would have dropped."""
    source = str(_get(row, "source") or _get(row, "crawl_source")
                 or infer_source(_get(row, "origin_path") or ""))
    title = str(_get(row, "title") or _get(row, "title_clean") or "").strip()
    content = str(_get(row, "content") or _get(row, "content_clean")
                  or _get(row, "text") or _get(row, "body")
                  or _get(row, "excerpt") or "").strip()

    out: dict[str, Any] = {
        "seq": int(row["seq"]), "stat_source": source or "unknown",
        "title": title, "content": content,
    }
    if title.lower() in BLOCKED_TITLES:
        out.update(status="blocked", issue_codes=["BLOCKED_PAGE"])
        return _pad_candidate(out)

    tags = normalize_tags(_get(row, "tags") or topics_to_tags(_get(row, "topics")))
    url = _get(row, "url")
    dh = str(_get(row, "dedup_hash") or _dedup_hash(title, str(url or "")))
    tax = normalize_taxonomy({**row, "source": source},
                             _get(row, "origin_path"))
    codes = validate_candidate(title, content)
    out.update(
        status="invalid" if codes else "valid",
        issue_codes=codes,
        article_id=str(_get(row, "article_id") or _get(row, "post_id") or dh),
        url=str(url) if url is not None else None,
        source=tax.source, source_name=tax.source_name,
        source_label=tax.source_label,
        author=str(_get(row, "author") or _get(row, "school") or ""),
        published_date=_first_str(row, "published_date", "publish_date",
                                  "created_at", "date"),
        category=str(_get(row, "category") or _get(row, "forum_alias") or "unknown"),
        category_name=str(_get(row, "category_name") or _get(row, "forum_name") or ""),
        tags="|".join(tags),
        content_type=("forum_post" if source.lower() == "dcard" else "news_article"),
        taxonomy_topic=tax.taxonomy_topic, taxonomy_label=tax.taxonomy_label,
        taxonomy_path=tax.taxonomy_path,
        origin_path=str(_get(row, "origin_path") or ""),
        dedup_hash=dh,
    )
    return out


def _first_str(row: dict, *keys: str) -> str | None:
    for k in keys:
        v = _get(row, k)
        if v:
            return str(v)
    return None


_CAND_DEFAULTS = dict(
    article_id="", url=None, source="", source_name="", source_label="",
    author="", published_date=None, category="", category_name="",
    tags="", content_type="", taxonomy_topic="", taxonomy_label="",
    taxonomy_path="", origin_path="", dedup_hash="",
)


def _pad_candidate(out: dict) -> dict:
    for k, v in _CAND_DEFAULTS.items():
        out.setdefault(k, v)
    return out


_OUT_SCHEMA = pa.schema([
    ("seq", pa.int64()), ("stat_source", pa.string()),
    ("status", pa.string()), ("issue_codes", pa.list_(pa.string())),
    ("article_id", pa.string()), ("url", pa.string()),
    ("source", pa.string()), ("source_name", pa.string()),
    ("source_label", pa.string()), ("title", pa.string()),
    ("content", pa.string()), ("author", pa.string()),
    ("published_date", pa.string()), ("category", pa.string()),
    ("category_name", pa.string()), ("tags", pa.string()),
    ("content_type", pa.string()), ("taxonomy_topic", pa.string()),
    ("taxonomy_label", pa.string()), ("taxonomy_path", pa.string()),
    ("origin_path", pa.string()), ("dedup_hash", pa.string()),
])


def normalize_batch(t: pa.Table) -> pa.Table:
    rows = [normalize_record(r) for r in t.to_pylist()]
    cols = {f.name: [r.get(f.name) for r in rows] for f in _OUT_SCHEMA}
    return pa.table(cols, schema=_OUT_SCHEMA)


def build_corpus(raw_ds, *, max_docs: int | None = None,
                 max_docs_per_source: int | None = None,
                 num_partitions: int = 8):
    """raw records Dataset (with ``seq``) -> (survivors Dataset,
    per-source stats DataFrame, invalid_reasons DataFrame).

    Streaming semantics note: the reference's global ``max_docs`` break
    also stops *scanning*, freezing the counters mid-stream
    (corpus_builder.py:112-115); a streaming engine scans everything,
    so stats here always reflect the full input.  The WRITTEN set is
    identical (first ``max_docs`` survivors in arrival order)."""
    from ray.data.aggregate import Min

    norm = raw_ds.map_batches(normalize_batch, batch_format="pyarrow").materialize()

    def _valid(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # drop the list column (unsupported as join payload) and the
        # now-constant status before the dedup/cap joins
        return t.filter(pc.equal(t.column("status"), "valid")) \
                .drop_columns(["status", "issue_codes"])

    valid = norm.map_batches(_valid, batch_format="pyarrow")

    # first-wins dedup: partial (hash -> min seq) per batch, Min
    # aggregate, LEFT SEMI join (index_build dedup_exact_first pattern)
    def _partial(t: pa.Table) -> pa.Table:
        df = t.select(["dedup_hash", "seq"]).to_pandas()
        g = df.groupby("dedup_hash", sort=False)["seq"].min().reset_index()
        return pa.table({"dedup_hash": pa.array(g["dedup_hash"], pa.string()),
                         "keeper_seq": pa.array(g["seq"], pa.int64())})

    keep_pairs = (
        valid.map_batches(_partial, batch_format="pyarrow")
        .groupby("dedup_hash").aggregate(Min("keeper_seq", alias_name="keeper_seq"))
        .repartition(max(2, num_partitions // 2))
    )
    keepers = valid.join(keep_pairs, "left_semi", num_partitions=num_partitions,
                         on=("dedup_hash", "seq"),
                         right_on=("dedup_hash", "keeper_seq")).materialize()

    survivors = keepers
    if max_docs_per_source is not None:
        cap = int(max_docs_per_source)

        def _cap_partial(t: pa.Table) -> pa.Table:
            df = t.select(["stat_source", "seq"]).to_pandas()
            df = df.sort_values("seq").groupby("stat_source", sort=False).head(cap)
            return pa.Table.from_pandas(df, preserve_index=False)

        def _cap_final(g: pd.DataFrame) -> pd.DataFrame:
            out = g.nsmallest(cap, "seq")[["seq"]]
            return out.rename(columns={"seq": "cap_seq"})

        cap_seqs = (
            keepers.map_batches(_cap_partial, batch_format="pyarrow")
            .groupby("stat_source")
            .map_groups(_cap_final, batch_format="pandas")
            .repartition(max(2, num_partitions // 2))
        )
        survivors = survivors.join(
            cap_seqs, "left_semi", num_partitions=num_partitions,
            on=("seq",), right_on=("cap_seq",))
    if max_docs is not None:
        survivors = survivors.sort("seq").limit(int(max_docs))
    if survivors is not keepers:
        survivors = survivors.materialize()

    # ---- stats: tiny groupby counts, merged driver-side ----
    def _status_counts(t: pa.Table) -> pa.Table:
        df = t.select(["stat_source", "status"]).to_pandas()
        g = (df.assign(scanned=1,
                       invalid=(df["status"] != "valid").astype(np.int64),
                       valid=(df["status"] == "valid").astype(np.int64))
             .groupby("stat_source", sort=False)[["scanned", "invalid", "valid"]]
             .sum().reset_index())
        return pa.Table.from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Sum

    sc = (norm.map_batches(_status_counts, batch_format="pyarrow")
          .groupby("stat_source")
          .aggregate(Sum("scanned", alias_name="scanned"),
                     Sum("invalid", alias_name="invalid"),
                     Sum("valid", alias_name="valid"))
          .to_pandas())

    def _count_by_source(ds) -> pd.DataFrame:
        def _c(t: pa.Table) -> pa.Table:
            df = t.select(["stat_source"]).to_pandas()
            g = df.assign(n=1).groupby("stat_source", sort=False)["n"].sum().reset_index()
            return pa.Table.from_pandas(g, preserve_index=False)

        return (ds.map_batches(_c, batch_format="pyarrow")
                .groupby("stat_source").aggregate(Sum("n", alias_name="n"))
                .to_pandas())

    # written = post-cap survivors (the reference's actual writes);
    # duplicates = valid non-keepers, counted in the LATER record's
    # source bucket (corpus_builder.py:224-229)
    wc = _count_by_source(survivors).rename(columns={"n": "written"})
    kc = _count_by_source(keepers).rename(columns={"n": "kept"})
    stats = (sc.merge(wc, on="stat_source", how="left")
             .merge(kc, on="stat_source", how="left")
             .fillna({"written": 0, "kept": 0}))
    stats["written"] = stats["written"].astype(np.int64)
    stats["duplicates"] = stats["valid"] - stats["kept"].astype(np.int64)
    stats = (stats.drop(columns=["valid", "kept"])
             .rename(columns={"stat_source": "source"})
             .sort_values("source").reset_index(drop=True))
    stats = stats[["source", "scanned", "written", "invalid", "duplicates"]]

    def _reasons(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        flat = pc.list_flatten(t.column("issue_codes"))
        df = pd.DataFrame({"code": flat.to_pylist()})
        if df.empty:
            return pa.table({"code": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        g = df.assign(n=1).groupby("code", sort=False)["n"].sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    reasons = (norm.map_batches(_reasons, batch_format="pyarrow")
               .groupby("code").aggregate(Sum("n", alias_name="n"))
               .to_pandas())
    if "code" not in reasons.columns:  # all-valid input -> empty aggregate
        reasons = pd.DataFrame({"code": pd.Series(dtype=str),
                                "n": pd.Series(dtype=np.int64)})
    reasons = reasons.sort_values("code").reset_index(drop=True)
    reasons["n"] = reasons["n"].astype(np.int64)

    return survivors, stats, reasons


# ---------------------------------------------------------------------------
# Driver-gate fixtures: the oracle tables carry no raw crawler records, so a
# raw-record table derives deterministically per doc_id (mirrored arithmetic
# in the SQL oracle), exercising every normalize_record fallback branch:
# title|title_clean and the 5-way content chain (placement rotates, so the
# Python coalesce runs against every slot), source|crawl_source|inferred,
# blocked titles, MISSING/TOO_SHORT validation, tags-string vs Dcard topics,
# provided-vs-computed dedup_hash, duplicate title+url pairs (k%7==3 copies
# k-1's identity), article_id|post_id|hash, 4-way date chain, author|school,
# category|forum_alias + taxonomy, dcard content_type, null urls.
# ---------------------------------------------------------------------------

_CONTENT_SLOTS = ["content", "content_clean", "text", "body", "excerpt"]
_DATE_SLOTS = ["published_date", "publish_date", "created_at", "date"]


def derive_raw_batch(t: pa.Table) -> pa.Table:
    from .analytics import TAX_CATS, TAX_SRCS

    rows = []
    for r in t.select(["doc_id", "text"]).to_pylist():
        k = int(r["doc_id"])
        dup_key = k - 1 if k % 7 == 3 else k
        if k % 29 == 0:
            title = "Sorry, You Have Been Blocked"
        elif k % 17 == 0:
            title = None
        elif k % 23 == 0:
            title = "x"
        else:
            title = f"doc {dup_key}"
        if k % 13 == 0:
            content = None
        elif k % 19 == 0:
            content = (r["text"] or "")[:10]
        else:
            content = r["text"]
        src = TAX_SRCS[k % 9]
        row: dict[str, Any] = {
            "seq": k,
            "title": None if k % 3 == 0 else title,
            "title_clean": title if k % 3 == 0 else None,
            "source": src if (k % 11 != 0 and k % 2 == 0) else None,
            "crawl_source": src if (k % 11 != 0 and k % 2 == 1) else None,
            "origin_path": ("data/raw/yahoo_finance_2024.jsonl" if k % 10 == 0
                            else f"data/processed/corpus_{src}.jsonl"),
            "url": None if k % 31 == 0 else f"https://news.example.com/{dup_key}",
            "category": None if k % 8 == 5 else TAX_CATS[k % 12],
            "forum_alias": "talk" if k % 8 == 5 else None,
            "forum_name": "熱門看板" if k % 8 == 5 else None,
            "tags": "AI, 台積電" if k % 4 == 0 else None,
            "topics": ([{"name": f"topic{k}"}, {"name": ""}]
                       if k % 4 == 2 else None),
            "dedup_hash": f"H{dup_key}" if k % 21 == 1 else None,
            "article_id": f"A{k}" if k % 6 in (0, 1) else None,
            "post_id": f"P{k}" if k % 6 in (2, 3) else None,
            "author": f"au{k}" if k % 5 == 0 else None,
            "school": f"sch{k}" if k % 5 == 1 else None,
        }
        for i, slot in enumerate(_CONTENT_SLOTS):
            row[slot] = content if k % 5 == i else None
        for i, slot in enumerate(_DATE_SLOTS):
            row[slot] = f"2024-01-{(k % 28) + 1:02d}" if k % 4 == i else None
        rows.append(row)
    cols = ["seq", "title", "title_clean", "content", "content_clean", "text",
            "body", "excerpt", "source", "crawl_source", "origin_path", "url",
            "category", "forum_alias", "forum_name", "tags", "topics",
            "dedup_hash", "article_id", "post_id", "author", "school",
            "published_date", "publish_date", "created_at", "date"]
    arrays = {}
    for c in cols:
        vals = [row.get(c) for row in rows]
        if c == "seq":
            arrays[c] = pa.array(vals, pa.int64())
        elif c == "topics":
            arrays[c] = pa.array(vals, pa.list_(pa.struct([("name", pa.string())])))
        else:
            arrays[c] = pa.array(vals, pa.string())
    return pa.table(arrays)


_CAND_COLS = ["seq", "article_id", "url", "source", "source_name",
              "source_label", "title", "content", "author", "published_date",
              "category", "category_name", "tags", "content_type",
              "taxonomy_topic", "taxonomy_label", "taxonomy_path",
              "origin_path", "dedup_hash"]

# both caps BIND on the 500-doc fixture (uncapped keepers run 27-38
# per source, ~341 total), so the oracle exercises both truncations
CAP_PER_SOURCE = 30
CAP_TOTAL = 250


def _raw_ds(sf_dir: str):
    from .analytics import _docs_ds

    return _docs_ds(sf_dir, ["doc_id", "text"]).map_batches(
        derive_raw_batch, batch_format="pyarrow")


def corpus_build(sf_dir: str) -> pd.DataFrame:
    """Survivor rows under both caps (corpus_builder.build:91-146 write
    set: first-wins dedup, then per-source cap 40, then global cap 300,
    all in arrival order)."""
    surv, _, _ = build_corpus(_raw_ds(sf_dir), max_docs=CAP_TOTAL,
                              max_docs_per_source=CAP_PER_SOURCE)
    df = surv.to_pandas()[_CAND_COLS]
    return df.sort_values("seq").reset_index(drop=True)


def corpus_build_stats(sf_dir: str) -> pd.DataFrame:
    """Per-source scanned/written/invalid/duplicates counters
    (CorpusBuildStats.by_source, corpus_builder.py:23-76), uncapped."""
    _, stats, _ = build_corpus(_raw_ds(sf_dir))
    return stats


def corpus_invalid_reasons(sf_dir: str) -> pd.DataFrame:
    """Global invalid_reasons counts — every issue code of each invalid
    record (corpus_builder.py:218-222,346-355)."""
    _, _, reasons = build_corpus(_raw_ds(sf_dir))
    return reasons


def read_raw_records(path: str | list[str], columns: list[str] | None = None):
    """Raw crawler records parquet -> Dataset with the deterministic
    arrival-order ``seq`` column (sorted input fragments x row offset —
    the reference's sorted-file x line order, corpus_builder.py:110-125),
    unless the input already carries ``seq``."""
    import pyarrow.parquet as pq

    from ..sources.readers import list_input_files, read_with_doc_ids

    files = list_input_files(path)
    has_seq = "seq" in set(pq.read_schema(files[0]).names)
    ds = read_with_doc_ids(files, columns,
                           id_col="seq" if has_seq else None)
    if not has_seq:
        ds = ds.map_batches(
            lambda t: t.rename_columns(
                ["seq" if c == "doc_id" else c for c in t.column_names]),
            batch_format="pyarrow")
    return ds


def write_corpus(survivors, out_dir: str, stats: pd.DataFrame | None = None,
                 reasons: pd.DataFrame | None = None) -> None:
    """Write the unified corpus hive-partitioned by ``source`` with an
    atomic tmp+rename promote (the index-sink convention: a failed run
    leaves no half-written corpus), plus the build report
    (CorpusBuilder.build report_path, corpus_builder.py:147-155)."""
    import json
    import os
    import shutil

    tmp = out_dir.rstrip("/") + ".tmp_write"
    shutil.rmtree(tmp, ignore_errors=True)
    survivors.write_parquet(tmp, partition_cols=["source"])
    report = {}
    if stats is not None:
        report["by_source"] = stats.set_index("source").to_dict("index")
        report["scanned"] = int(stats["scanned"].sum())
        report["written"] = int(stats["written"].sum())
        report["invalid"] = int(stats["invalid"].sum())
        report["duplicates"] = int(stats["duplicates"].sum())
    if reasons is not None:
        report["invalid_reasons"] = dict(
            zip(reasons["code"], (int(n) for n in reasons["n"])))
    # "_" prefix: parquet dataset discovery ignores the report file
    with open(os.path.join(tmp, "_build_report.json"), "w", encoding="utf-8") as f:
        json.dump(report, f, ensure_ascii=False, indent=2)
    shutil.rmtree(out_dir, ignore_errors=True)
    os.replace(tmp, out_dir)
