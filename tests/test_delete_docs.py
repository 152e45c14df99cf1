"""Tombstone deletion (index_build.delete_docs): deleted docs vanish
from every query path — BM25 (naive/WAND/auto), sharded serving,
boolean, phrase — while SURVIVING docs' scores stay bit-identical
(global stats keep build-time values until a rebuild, the documented
Lucene-style semantics).  Beyond-reference: the reference is
append-only with no delete path."""

import numpy as np
import pytest

from news_information_retrieval_system_ray.pipelines.index_build import (
    build_index, delete_docs)
from news_information_retrieval_system_ray.pipelines.query import IndexSearcher
from news_information_retrieval_system_ray.pipelines.serve import ShardedSearcher
from news_information_retrieval_system_ray.sources.pages import (
    REFERENCE_QUERIES, generate_pages)

N_DOCS = 300


@pytest.fixture()
def built(ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp("pages_del")
    paths = generate_pages(str(d), n_docs=N_DOCS, seed=11, n_files=3)
    idx = str(tmp_path_factory.mktemp("index_del"))
    build_index(paths, idx, text_source="html", engine="cjk_bigram",
                block_size=16, chunk_bits=5, n_shards=3, resume=False)
    return idx


def test_deleted_docs_vanish_scores_unchanged(built):
    pre = IndexSearcher(built)
    q = list(REFERENCE_QUERIES.values())[0]
    # k = corpus size: the post-delete result must be EXACTLY the
    # pre-delete list minus the deleted docs (stats frozen => surviving
    # scores bit-identical, so ranks among survivors cannot move)
    full_pre = pre.search(q, k=N_DOCS, method="wand")
    assert len(full_pre) >= 10
    victims = {d for d, _ in full_pre[:5]} | {full_pre[-1][0]}
    n = delete_docs(built, sorted(victims))
    assert n == len(victims)
    post = IndexSearcher(built)  # fresh: tombstones load lazily at query
    for method in ("naive", "wand", "auto"):
        got = post.search(q, k=N_DOCS, method=method)
        expect = [(d, s) for d, s in full_pre if d not in victims]
        assert [d for d, _ in got] == [d for d, _ in expect], method
        np.testing.assert_array_equal(
            np.array([s for _, s in got]), np.array([s for _, s in expect]))


def test_delete_docs_idempotent_and_validates(built):
    assert delete_docs(built, [1, 2, 3]) == 3
    assert delete_docs(built, [2, 3, 4]) == 1  # only 4 is new
    assert delete_docs(built, [1]) == 0
    with pytest.raises(ValueError, match="outside"):
        delete_docs(built, [N_DOCS + 7])
    with pytest.raises(FileNotFoundError):
        delete_docs("/tmp/definitely-not-an-index", [0])


def test_sharded_serving_respects_tombstones(built):
    single = IndexSearcher(built)
    q = list(REFERENCE_QUERIES.values())[1]
    pre = single.search(q, k=20, method="wand")
    victims = [d for d, _ in pre[:3]]
    delete_docs(built, victims)
    post_single = IndexSearcher(built)
    s = ShardedSearcher(built, n_shards=4)
    try:
        expect = post_single.search(q, k=10, method="wand")
        assert not set(victims) & {d for d, _ in expect}
        for seed in (True, False):
            assert s.search(q, k=10, method="wand", seed=seed) == expect
        assert s.search_many([q], k=10)[0] == expect
        # boolean: deleted docs leave intersections and complements
        inc = single._query_terms(q)[:2]
        if inc:
            b = s.boolean_and(inc)
            assert not set(victims) & set(b.tolist())
            assert b.tolist() == post_single.boolean_and(inc).tolist()
    finally:
        s.shutdown()


def test_phrase_respects_tombstones(ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp("pages_del_pos")
    paths = generate_pages(str(d), n_docs=150, seed=23, n_files=2)
    idx = str(tmp_path_factory.mktemp("index_del_pos"))
    build_index(paths, idx, text_source="html", engine="cjk_bigram",
                block_size=16, chunk_bits=5, n_shards=2,
                with_positions=True, resume=False)
    s = IndexSearcher(idx)
    phrase = ["台灣"]
    pre = s.phrase_docs(phrase).tolist()
    assert pre, "fixture phrase must match"
    delete_docs(idx, pre[:2])
    post = IndexSearcher(idx).phrase_docs(phrase).tolist()
    assert post == pre[2:]
