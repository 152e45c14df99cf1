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
