"""SQL source (the reference's PostgreSQL reader path) against sqlite3,
including an end-to-end SQL -> tokenize -> index -> search drive."""

import hashlib
import sqlite3

import pytest

DB_ROWS = [
    (1, "title one", "alpha beta gamma alpha", "http://a", "2024-01-03", "cna", "tech", "au1"),
    (2, "title two", "beta delta", "http://b", "2024-01-02", "ltn", "politics", "au2"),
    (3, "title three", "alpha epsilon beta beta", "http://c", "2024-01-04", "cna", "tech", "au3"),
    (4, "title four", "zeta eta", "http://d", "2024-01-01", "udn", "sports", "au4"),
]


@pytest.fixture(scope="module")
def db_path(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("sqlsrc") / "news.db")
    conn = sqlite3.connect(p)
    conn.execute("""CREATE TABLE news_articles(
        doc_id INTEGER, title TEXT, content TEXT, url TEXT,
        published_at TEXT, source TEXT, category TEXT, author TEXT,
        content_hash TEXT)""")
    for r in DB_ROWS:
        h = hashlib.md5(r[2].encode()).hexdigest()
        conn.execute("INSERT INTO news_articles VALUES (?,?,?,?,?,?,?,?,?)", r + (h,))
    conn.commit()
    conn.close()
    return p


def test_read_articles_filters_and_order(ray_session, db_path):
    from news_information_retrieval_system_ray.sources.sqlreader import read_articles_sql

    ds = read_articles_sql(lambda: sqlite3.connect(db_path))
    df = ds.to_pandas()
    assert list(df["doc_id"]) == [3, 1, 2, 4]  # published_at DESC
    df2 = read_articles_sql(lambda: sqlite3.connect(db_path), source="cna").to_pandas()
    assert sorted(df2["doc_id"]) == [1, 3]
    df3 = read_articles_sql(lambda: sqlite3.connect(db_path),
                            category="tech", limit=1).to_pandas()
    assert list(df3["doc_id"]) == [3]


def test_read_by_ids_and_hashes(ray_session, db_path):
    from news_information_retrieval_system_ray.sources.sqlreader import read_articles_by_ids

    df = read_articles_by_ids(lambda: sqlite3.connect(db_path), doc_ids=[2, 4]).to_pandas()
    assert list(df["doc_id"]) == [2, 4]
    h = hashlib.md5(b"beta delta").hexdigest()
    df2 = read_articles_by_ids(lambda: sqlite3.connect(db_path),
                               content_hashes=[h]).to_pandas()
    assert list(df2["doc_id"]) == [2]
    with pytest.raises(ValueError):
        read_articles_by_ids(lambda: sqlite3.connect(db_path))


def test_sql_source_feeds_index_build(ray_session, db_path, tmp_path):
    """SQL rows -> text column -> build_index -> BM25 search end-to-end."""
    from news_information_retrieval_system_ray.sources.sqlreader import read_articles_sql
    from news_information_retrieval_system_ray.pipelines.index_build import build_index
    from news_information_retrieval_system_ray.pipelines.query import IndexSearcher

    ds = read_articles_sql(lambda: sqlite3.connect(db_path))
    src = str(tmp_path / "from_sql")
    ds.select_columns(["doc_id", "content"]).rename_columns(
        {"content": "text"}).write_parquet(src)
    idx = str(tmp_path / "idx")
    build_index(src, idx, text_source="text", id_col="doc_id",
                engine="whitespace", n_shards=1, chunk_bits=16, resume=False)
    s = IndexSearcher(idx)
    hits = s.search("beta", k=4)
    assert sorted(h[0] for h in hits) == [1, 2, 3]  # exactly the beta docs
    assert hits[0][0] == 3  # tf=2 for beta -> ranks first


def test_import_documents_sql_round_trip(ray_session, tmp_path):
    """Corpus -> write_sql importer with content-hash dedup (the
    reference jsonl_importer / ON CONFLICT DO NOTHING path) -> read
    back; duplicates silently dropped by the UNIQUE constraint."""
    import ray.data as rd

    from news_information_retrieval_system_ray.sources.sqlreader import (
        CREATE_ARTICLES_SQLITE,
        content_hash_md5,
        import_documents_sql,
        read_articles_sql,
    )

    p = str(tmp_path / "imp.db")
    conn = sqlite3.connect(p)
    conn.execute(CREATE_ARTICLES_SQLITE)
    conn.commit()
    conn.close()

    rows = [
        {"title": "t1", "text": "alpha beta", "source": "cna"},
        {"title": "t2", "text": "gamma delta", "source": "ltn"},
        {"title": "t1", "text": "alpha beta", "source": "cna"},   # exact dup
        {"title": "t3", "text": "alpha beta", "source": "udn"},   # same text, new title
    ]
    import_documents_sql(rd.from_items(rows), lambda: sqlite3.connect(p))

    out = read_articles_sql(lambda: sqlite3.connect(p)).to_pandas()
    assert len(out) == 3                                    # dup dropped
    assert set(out["title"]) == {"t1", "t2", "t3"}
    assert set(out["content_hash"]) == {
        content_hash_md5("t1", "alpha beta"),
        content_hash_md5("t2", "gamma delta"),
        content_hash_md5("t3", "alpha beta"),
    }
    # re-import is idempotent (skip_existing semantics)
    import_documents_sql(rd.from_items(rows), lambda: sqlite3.connect(p))
    again = read_articles_sql(lambda: sqlite3.connect(p)).to_pandas()
    assert len(again) == 3
