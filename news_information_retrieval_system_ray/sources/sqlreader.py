"""SQL database reader — the reference's PostgreSQL document source,
re-expressed as ``ray.data.read_sql`` over any DB-API2 connector.

Mirrors ``DocumentReader.read_from_postgres`` /
``read_from_postgres_iter`` (/root/reference/src/ir/index/
doc_reader.py:388-556): the filtered, ordered, limited SELECT over a
``news_articles`` table, plus keyed fetch by doc_id / content_hash.
The reference streams batches through one psycopg2 server-side cursor;
here the query becomes a Dataset so downstream stages
(ExtractNormalize -> TokenizeStage -> index build) consume it like any
parquet source.  Parallel reads use ``shard_keys`` on databases that
support MOD/ABS/CONCAT sharding (PostgreSQL does; sqlite executes as a
single task) — at cluster scale pass ``shard_keys=["doc_id"]``.

No PostgreSQL server exists in this sandbox, so tests exercise the
identical code path against stdlib sqlite3 (both are DB-API2; only the
connection factory differs).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any, Optional

ARTICLE_COLUMNS = ("doc_id", "title", "content", "url", "published_at",
                   "source", "category", "author", "content_hash")


def _quote(v: str) -> str:
    return "'" + str(v).replace("'", "''") + "'"


def build_articles_query(source: Optional[str] = None,
                         category: Optional[str] = None,
                         limit: Optional[int] = None,
                         table: str = "news_articles",
                         columns: tuple[str, ...] = ARTICLE_COLUMNS) -> str:
    """The reference's incremental SELECT (doc_reader.py:423-438).

    ``ray.data.read_sql`` takes one SQL string (no bind params), so
    values are escaped inline; identifiers come from the fixed column
    tuple, not user input.
    """
    q = f"SELECT {', '.join(columns)} FROM {table} WHERE 1=1"
    if source:
        q += f" AND source = {_quote(source)}"
    if category:
        q += f" AND category = {_quote(category)}"
    q += " ORDER BY published_at DESC"
    if limit:
        q += f" LIMIT {int(limit)}"
    return q


def read_articles_sql(connection_factory: Callable[[], Any], *,
                      source: Optional[str] = None,
                      category: Optional[str] = None,
                      limit: Optional[int] = None,
                      table: str = "news_articles",
                      shard_keys: Optional[list[str]] = None,
                      override_num_blocks: Optional[int] = None):
    """news_articles SELECT -> ray.data.Dataset (read_from_postgres)."""
    import ray.data as rd

    kwargs: dict[str, Any] = {}
    if shard_keys:
        kwargs["shard_keys"] = shard_keys
    if override_num_blocks:
        kwargs["override_num_blocks"] = override_num_blocks
    return rd.read_sql(
        build_articles_query(source, category, limit, table=table),
        connection_factory, **kwargs)


def read_articles_by_ids(connection_factory: Callable[[], Any],
                         doc_ids: Optional[list[int]] = None,
                         content_hashes: Optional[list[str]] = None,
                         table: str = "news_articles"):
    """Keyed fetch (read_from_postgres_iter): by doc_id (ordered) or by
    content_hash — the dedup-pipeline hydrate.  ANY(array) becomes a
    portable IN list."""
    import ray.data as rd

    if not doc_ids and not content_hashes:
        raise ValueError("provide doc_ids or content_hashes")
    cols = ", ".join(ARTICLE_COLUMNS)
    if doc_ids:
        vals = ", ".join(str(int(d)) for d in doc_ids)
        q = f"SELECT {cols} FROM {table} WHERE doc_id IN ({vals}) ORDER BY doc_id"
    else:
        vals = ", ".join(_quote(h) for h in content_hashes)
        q = f"SELECT {cols} FROM {table} WHERE content_hash IN ({vals})"
    return rd.read_sql(q, connection_factory)


IMPORT_COLUMNS = ("title", "content", "url", "published_at",
                  "source", "category", "author", "content_hash")

CREATE_ARTICLES_SQLITE = """
CREATE TABLE IF NOT EXISTS news_articles (
    doc_id INTEGER PRIMARY KEY AUTOINCREMENT,
    title TEXT, content TEXT, url TEXT, published_at TEXT,
    source TEXT, category TEXT, author TEXT,
    content_hash VARCHAR(32) UNIQUE NOT NULL
)"""


def content_hash_md5(title: str, content: str) -> str:
    """MD5 over 'title\\ncontent' (doc_reader.py:70-91 NewsDocument
    content_hash — the importer's dedup key)."""
    import hashlib

    return hashlib.md5(f"{title or ''}\n{content or ''}".encode("utf-8")).hexdigest()


def import_documents_sql(ds, connection_factory: Callable[[], Any], *,
                         dialect: str = "sqlite",
                         table: str = "news_articles") -> None:
    """Corpus Dataset -> SQL sink with content-hash dedup — the
    reference's JSONL importer (`src/database/jsonl_importer.py:105-306`
    batched inserts through `postgres_manager.py:245-250`'s
    ``INSERT ... ON CONFLICT (content_hash) DO NOTHING``), re-expressed
    as ``Dataset.write_sql``: each block becomes one executemany against
    a UNIQUE(content_hash) table, duplicates dropped by the database
    exactly as the reference does.

    The input needs the IMPORT_COLUMNS; ``content_hash`` is computed in
    a map stage if absent.  ``dialect`` picks the conflict syntax
    (sqlite ``INSERT OR IGNORE`` / postgres ``ON CONFLICT DO NOTHING``)."""
    import pyarrow as pa

    def ensure_cols(t: pa.Table) -> pa.Table:
        names = set(t.column_names)
        cols = {}
        titles = t.column("title").to_pylist() if "title" in names else [""] * t.num_rows
        contents = t.column("content").to_pylist() if "content" in names \
            else t.column("text").to_pylist()
        for c in IMPORT_COLUMNS:
            if c == "content_hash" and c not in names:
                cols[c] = pa.array([content_hash_md5(a, b)
                                    for a, b in zip(titles, contents)], pa.string())
            elif c == "content" and c not in names:
                cols[c] = pa.array([x or "" for x in contents], pa.string())
            elif c in names:
                cols[c] = t.column(c).cast(pa.string())
            else:
                cols[c] = pa.array([""] * t.num_rows, pa.string())
        return pa.table(cols)

    prepared = ds.map_batches(ensure_cols, batch_format="pyarrow")
    marks = ", ".join("?" for _ in IMPORT_COLUMNS)
    collist = ", ".join(IMPORT_COLUMNS)
    if dialect == "sqlite":
        stmt = f"INSERT OR IGNORE INTO {table} ({collist}) VALUES ({marks})"
    else:
        marks = ", ".join("%s" for _ in IMPORT_COLUMNS)
        stmt = (f"INSERT INTO {table} ({collist}) VALUES ({marks}) "
                f"ON CONFLICT (content_hash) DO NOTHING")
    prepared.write_sql(stmt, connection_factory)
