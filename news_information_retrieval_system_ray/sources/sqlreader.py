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
