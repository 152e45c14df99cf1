"""Incremental append (incremental_builder.py:180-315 semantics):
append == full rebuild, rank- and score-identical."""

import tempfile

import pytest

from news_information_retrieval_system_ray.pipelines.index_build import append_index, build_index
from news_information_retrieval_system_ray.pipelines.query import IndexSearcher
from news_information_retrieval_system_ray.sources.pages import REFERENCE_QUERIES, generate_pages


@pytest.fixture(scope="module")
def corpora(tmp_path_factory):
    d = tmp_path_factory.mktemp("append_pages")
    paths = generate_pages(str(d), n_docs=400, seed=7, n_files=4)
    return paths


def _build(paths, **kw):
    idx = tempfile.mkdtemp(prefix="nirs_append_")
    build_index(paths, idx, text_source="html", engine="cjk_bigram",
                n_shards=2, chunk_bits=6, resume=False, **kw)
    return idx


def test_append_matches_full_rebuild(ray_session, corpora):
    full_idx = _build(corpora)
    base_idx = _build(corpora[:3])
    res = append_index(base_idx, corpora[3:])

    full = IndexSearcher(full_idx)
    inc = IndexSearcher(base_idx)
    assert res.n_docs == full.n_docs
    assert abs(inc.avgdl - full.avgdl) < 1e-9
    for method in ("naive", "wand"):
        for _qid, qtext in list(REFERENCE_QUERIES.items())[:8]:
            a = full.search(qtext, k=10, method=method)
            b = inc.search(qtext, k=10, method=method)
            assert [d for d, _ in a] == [d for d, _ in b], (method, qtext)
            for (_, sa), (_, sb) in zip(a, b):
                assert abs(sa - sb) < 1e-9


def test_append_is_idempotent_for_known_files(ray_session, corpora):
    base_idx = _build(corpora)
    before = IndexSearcher(base_idx).n_docs
    res = append_index(base_idx, corpora)  # all files already known
    assert res.n_docs == before


def test_append_requires_complete_index(ray_session, corpora, tmp_path):
    with pytest.raises(ValueError):
        append_index(str(tmp_path / "nonexistent"), corpora)


def test_streaming_ingest_plus_refresh_matches_rebuild(ray_session, corpora, tmp_path):
    """NRT loop: StreamingIndexer buffers row dicts and folds them in
    via the append path; IndexSearcher.refresh() picks them up — final
    results rank-identical to a one-shot rebuild over everything."""
    import pyarrow.parquet as pq

    from news_information_retrieval_system_ray.pipelines.index_build import (
        StreamingIndexer)

    base_idx = _build(corpora[:3])
    searcher = IndexSearcher(base_idx)  # opened BEFORE any streaming
    n_before = searcher.n_docs

    # stream the 4th corpus file's rows in uneven chunks
    rows = pq.read_table(corpora[3]).to_pylist()
    ing = StreamingIndexer(base_idx, flush_every=40,
                           spool_dir=str(tmp_path / "spool"))
    assert ing.add(rows[:10]) is None          # below threshold: buffered
    r = ing.add(rows[10:70])                   # crosses: auto-flush
    assert r is not None and r.n_docs > n_before
    ing.add(rows[70:])
    r2 = ing.flush()                           # explicit flush of the rest
    assert r2 is not None
    assert ing.flush() is None                 # empty buffer: no-op

    assert searcher.n_docs == n_before         # stale until refresh
    searcher.refresh()
    full = IndexSearcher(_build(corpora))
    assert searcher.n_docs == full.n_docs
    assert abs(searcher.avgdl - full.avgdl) < 1e-9
    for _qid, qtext in list(REFERENCE_QUERIES.items())[:6]:
        a = full.search(qtext, k=10, method="wand")
        b = searcher.search(qtext, k=10, method="wand")
        assert [d for d, _ in a] == [d for d, _ in b], qtext
