"""Doc-sharded distributed serving (pipelines/serve.py): rank- and
score-identical to the single-node searcher, with per-shard decoded
state bounded by the shard's chunk capacity — never by global df
(SURVEY §7.5 "per-partition WAND top-k -> driver k-way merge";
reference WAND contract: query_optimization.py:191-346).
"""

import numpy as np
import pytest

from news_information_retrieval_system_ray.pipelines.index_build import build_index
from news_information_retrieval_system_ray.pipelines.query import IndexSearcher
from news_information_retrieval_system_ray.pipelines.serve import ShardedSearcher
from news_information_retrieval_system_ray.sources.pages import REFERENCE_QUERIES, generate_pages

N_DOCS = 400
CHUNK_BITS = 5  # 32-doc chunks -> 13 chunks over 400 docs
N_SHARDS = 4


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp("pages_serve")
    paths = generate_pages(str(d), n_docs=N_DOCS, seed=7, n_files=4)
    index_dir = str(tmp_path_factory.mktemp("index_serve"))
    build_index(paths, index_dir, text_source="html", engine="cjk_bigram",
                block_size=16, chunk_bits=CHUNK_BITS, n_shards=3, resume=False)
    return index_dir


@pytest.fixture(scope="module")
def sharded(built):
    s = ShardedSearcher(built, n_shards=N_SHARDS)
    yield s
    s.shutdown()


def test_rank_and_score_identical_to_single_searcher(built, sharded):
    single = IndexSearcher(built)
    for qtext in REFERENCE_QUERIES.values():
        expect = single.search(qtext, k=10, method="wand")
        for seed in (True, False):
            got = sharded.search(qtext, k=10, method="wand", seed=seed)
            assert [d for d, _ in got] == [d for d, _ in expect], (qtext, seed)
            # scores bit-identical: same per-term weights, and a doc's
            # postings live wholly in one chunk (same float sum order)
            np.testing.assert_array_equal(
                np.array([s for _, s in got]), np.array([s for _, s in expect]))


def test_naive_method_matches_too(built, sharded):
    single = IndexSearcher(built)
    q = list(REFERENCE_QUERIES.values())[0]
    assert sharded.search(q, k=10, method="naive") == single.search(q, k=10, method="naive")


def test_global_df_resolved_across_shards(built, sharded):
    import ray

    single = IndexSearcher(built)
    # a stopword-class heavy term: present in ~every doc (df 395/400)
    term = "颱風"
    sharded.search(term, k=5)
    assert sharded._dfs[term] == single.df(term)
    # per-shard local decoded df sums to the global df (disjoint chunks)
    locals_ = ray.get([w.decoded_df.remote(term) for w in sharded.workers])
    assert sum(locals_) == single.df(term)


def test_per_shard_decoded_postings_bounded_by_chunk_capacity(built, sharded):
    """The scale invariant: no shard actor ever materializes a full
    stopword-class posting list — its decoded df is bounded by its own
    chunk capacity (n_owned_chunks * 2^chunk_bits), NOT by global df."""
    import ray

    single = IndexSearcher(built)
    term = "颱風"
    g_df = single.df(term)
    sharded.search(term, k=5)
    locals_ = ray.get([w.decoded_df.remote(term) for w in sharded.workers])
    n_chunks = ((N_DOCS - 1) >> CHUNK_BITS) + 1
    for s, local in enumerate(locals_):
        owned = len([c for c in range(n_chunks) if c % N_SHARDS == s])
        cap = owned * (1 << CHUNK_BITS)
        assert local <= cap < g_df, (s, local, cap, g_df)
        assert local < g_df


def test_theta_seeding_sound_on_skewed_corpus(built):
    """Seeded WAND prunes with the heaviest shard's k-th score; results
    must stay identical even when that theta prunes whole shards."""
    single = IndexSearcher(built)
    s = ShardedSearcher(built, n_shards=N_SHARDS)
    try:
        for q in ["颱風 台灣", "人工 智慧 模型", "的 在"]:
            expect = single.search(q, k=3, method="wand")
            got = s.search(q, k=3, method="wand", seed=True)
            assert got == expect, q
    finally:
        s.shutdown()


def test_more_shards_than_chunks_clamps(built):
    s = ShardedSearcher(built, n_shards=64)  # > 13 chunks -> clamped
    try:
        single = IndexSearcher(built)
        q = list(REFERENCE_QUERIES.values())[1]
        assert s.search(q, k=10) == single.search(q, k=10, method="wand")
    finally:
        s.shutdown()


def test_sharded_boolean_matches_single(built, sharded):
    single = IndexSearcher(built)
    for inc, exc in ([["颱風", "台灣"], []],
                     [["的"], ["台灣"]],
                     [["颱風"], ["人工", "台灣"]]):
        if exc:
            expect = single.boolean_not(inc, exc)
            got = sharded.boolean_not(inc, exc)
        else:
            expect = single.boolean_and(inc)
            got = sharded.boolean_and(inc)
        assert got.tolist() == sorted(expect.tolist()), (inc, exc)


def test_sharded_phrase_matches_single(ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp("pages_phrase")
    paths = generate_pages(str(d), n_docs=200, seed=13, n_files=2)
    idx = str(tmp_path_factory.mktemp("index_phrase"))
    build_index(paths, idx, text_source="html", engine="cjk_bigram",
                block_size=16, chunk_bits=5, n_shards=2,
                with_positions=True, resume=False)
    single = IndexSearcher(idx)
    s = ShardedSearcher(idx, n_shards=3)
    try:
        for phrase in (["台灣"], ["人工", "工智"]):
            expect = sorted(single.phrase_docs(phrase).tolist())
            assert s.phrase_docs(phrase).tolist() == expect, phrase
    finally:
        s.shutdown()


def test_chunkband_partitioned_layout_io_isolation(ray_session, tmp_path_factory):
    """chunkband_partitions=P hive-partitions the segments so each shard
    opens ONLY its own bands' files (IO isolation, not just bounded
    decode) — results stay rank/score-identical to the flat layout."""
    import ray

    d = tmp_path_factory.mktemp("pages_band")
    paths = generate_pages(str(d), n_docs=N_DOCS, seed=7, n_files=4)
    flat_idx = str(tmp_path_factory.mktemp("index_flat"))
    band_idx = str(tmp_path_factory.mktemp("index_band"))
    build_index(paths, flat_idx, text_source="html", engine="cjk_bigram",
                block_size=16, chunk_bits=CHUNK_BITS, n_shards=3, resume=False)
    build_index(paths, band_idx, text_source="html", engine="cjk_bigram",
                block_size=16, chunk_bits=CHUNK_BITS, n_shards=3, resume=False,
                chunkband_partitions=N_SHARDS)
    single = IndexSearcher(flat_idx)
    s = ShardedSearcher(band_idx, n_shards=N_SHARDS)
    try:
        for qtext in REFERENCE_QUERIES.values():
            assert s.search(qtext, k=10) == single.search(qtext, k=10, method="wand")
        # IO isolation: every worker's opened files live under ITS bands
        per_worker = ray.get([w.seg_files.remote() for w in s.workers])
        all_files = set()
        for si, files in enumerate(per_worker):
            assert files, si
            owned = {c % N_SHARDS for c in s._shard_chunks[si]}
            for f in files:
                assert "chunkband=" in f, f
                assert int(f.split("chunkband=")[1].split("/")[0]) in owned, (si, f)
            all_files.update(files)
        # bands partition the files: no file shared by two workers
        assert len(all_files) == sum(len(f) for f in per_worker)
    finally:
        s.shutdown()
    # the unrestricted single searcher reads the partitioned layout too
    sp = IndexSearcher(band_idx)
    q = list(REFERENCE_QUERIES.values())[0]
    assert sp.search(q, k=10, method="wand") == single.search(q, k=10, method="wand")


def test_append_to_banded_index_stays_shard_visible(ray_session, tmp_path_factory):
    """Appending to a chunkband-partitioned index must keep the new docs
    visible to band-restricted shard workers (appended segments are
    written banded; a flat append would be invisible to shards)."""
    from news_information_retrieval_system_ray.pipelines.index_build import append_index

    d = tmp_path_factory.mktemp("pages_band_app")
    paths = generate_pages(str(d), n_docs=300, seed=21, n_files=3)
    idx = str(tmp_path_factory.mktemp("index_band_app"))
    build_index(paths[:2], idx, text_source="html", engine="cjk_bigram",
                block_size=16, chunk_bits=CHUNK_BITS, n_shards=2, resume=False,
                chunkband_partitions=3)
    res = append_index(idx, paths[2])
    assert res.n_docs == 300
    import glob
    app_files = glob.glob(idx + "/segments/append_*/**/*.parquet", recursive=True)
    assert app_files and all("chunkband=" in f for f in app_files)
    single = IndexSearcher(idx)
    s = ShardedSearcher(idx, n_shards=3)
    try:
        for qtext in REFERENCE_QUERIES.values():
            assert s.search(qtext, k=10) == single.search(qtext, k=10, method="wand")
        # appended doc ids (>= the base count) actually appear in results
        term = "颱風"
        ids, _, _ = single.postings(term)
        assert (ids >= 200).any()
    finally:
        s.shutdown()


def test_driver_df_cache_lru_bounded(built):
    """r3 verdict item #6: the driver's per-term df caches must evict
    under a small cap with unchanged results."""
    single = IndexSearcher(built)
    s = ShardedSearcher(built, n_shards=N_SHARDS)
    try:
        s.max_cached_terms = 3
        for qtext in list(REFERENCE_QUERIES.values())[:4]:
            expect = single.search(qtext, k=10, method="wand")
            got = s.search(qtext, k=10, method="wand")
            assert [d for d, _ in got] == [d for d, _ in expect]
            assert len(s._dfs) <= 3 and len(s._mass) <= 3
            assert set(s._dfs) == set(s._mass)
        # re-query the first (evicted) query: re-resolves, still identical
        q0 = list(REFERENCE_QUERIES.values())[0]
        got = s.search(q0, k=10, method="wand")
        assert [d for d, _ in got] == \
            [d for d, _ in single.search(q0, k=10, method="wand")]
    finally:
        s.shutdown()


def test_seed_auto_engages_on_mass(built):
    """seed='auto' must pick the parallel single-round fan-out for small
    candidate mass and the seeded two-round flow above seed_mass_min —
    with identical results either way."""
    single = IndexSearcher(built)
    s = ShardedSearcher(built, n_shards=N_SHARDS)
    try:
        q = list(REFERENCE_QUERIES.values())[0]
        expect = single.search(q, k=10, method="wand")
        s.seed_mass_min = 10**9        # auto -> unseeded
        got_fast = s.search(q, k=10)   # default seed="auto"
        s.seed_mass_min = 0            # auto -> seeded
        got_seeded = s.search(q, k=10)
        for got in (got_fast, got_seeded):
            assert [d for d, _ in got] == [d for d, _ in expect]
            np.testing.assert_array_equal(
                np.array([sc for _, sc in got]),
                np.array([sc for _, sc in expect]))
    finally:
        s.shutdown()


def test_auto_chunkband_default(built):
    """r3 verdict item #5: the banded layout must be the DEFAULT above
    the documented flat-broadcast bound, flat below it."""
    from news_information_retrieval_system_ray.pipelines.index_build import (
        AUTO_CHUNKBAND_MIN_DOCS, auto_chunkband_partitions)
    from news_information_retrieval_system_ray.state.manifest import read_json
    import os

    assert auto_chunkband_partitions(0) == 0
    assert auto_chunkband_partitions(10**6) == 0
    assert auto_chunkband_partitions(AUTO_CHUNKBAND_MIN_DOCS) == 0
    p = auto_chunkband_partitions(AUTO_CHUNKBAND_MIN_DOCS + 1)
    assert p >= 2  # engaged, and slices bounded
    assert 2 <= auto_chunkband_partitions(10**12) <= 8192
    # slice bound holds up to the cap point
    assert (10**12 / auto_chunkband_partitions(10**12)) <= (1 << 27)
    assert auto_chunkband_partitions(2**43) == 8192  # cap engages
    # monotone non-decreasing band counts
    vals = [auto_chunkband_partitions(n)
            for n in (2**30 + 1, 2**31, 2**34, 2**38, 2**40)]
    assert vals == sorted(vals)
    # the module fixture's build used the auto default -> flat in-sandbox
    m = read_json(os.path.join(built, "manifest.json"))
    assert int(m["config"]["chunkband_partitions"]) == 0


def test_search_many_matches_per_query_search(built, sharded):
    """Pipelined bulk search must equal per-query search exactly,
    including queries with no indexed terms (empty result slots)."""
    qs = list(REFERENCE_QUERIES.values()) + ["zzzzunindexedzzz", ""]
    # tiny group size + window exercises the group pipelining edges
    bulk = sharded.search_many(qs, k=10, group_size=3, max_inflight_groups=2)
    assert len(bulk) == len(qs)
    for q, got in zip(qs, bulk):
        expect = sharded.search(q, k=10, method="wand", seed=False)
        assert got == expect, q


def test_search_many_survives_lru_smaller_than_batch(built):
    """A bulk request with more distinct terms than the LRU cap must
    still score every query from the resolve-round snapshot."""
    s = ShardedSearcher(built, n_shards=N_SHARDS)
    try:
        s.max_cached_terms = 2  # far below the batch's term count
        qs = list(REFERENCE_QUERIES.values())
        bulk = s.search_many(qs, k=5)
        for q, got in zip(qs, bulk):
            assert got == s.search(q, k=5, method="wand", seed=False), q
    finally:
        s.shutdown()


def test_seeded_search_survives_lru_smaller_than_query(built):
    """r4 review: seeded search must seed from the resolve-round mass
    snapshot, not the evictable cache — a query with more terms than
    the LRU cap used to KeyError in the seed-mass computation."""
    single = IndexSearcher(built)
    s = ShardedSearcher(built, n_shards=N_SHARDS)
    try:
        s.max_cached_terms = 1  # below any multi-term query's term count
        for q in list(REFERENCE_QUERIES.values())[:3]:
            expect = single.search(q, k=5, method="wand")
            got = s.search(q, k=5, method="wand", seed=True)
            assert [d for d, _ in got] == [d for d, _ in expect], q
    finally:
        s.shutdown()


def test_borrowed_tier_length_mismatch_raises(built):
    tier = ShardedSearcher(built, n_shards=N_SHARDS)
    try:
        with pytest.raises(ValueError, match="chunk sets"):
            ShardedSearcher(built, workers=tier.workers[:-1],
                            shard_chunks=tier._shard_chunks)
    finally:
        tier.shutdown()


def test_borrowed_tier_rejects_scoring_param_overrides(built):
    """Attaching to an existing tier with non-default k1/b/delta/compact
    must raise: scoring runs under the TIER's construction-time params,
    so accepting overrides would silently score under other settings."""
    tier = ShardedSearcher(built, n_shards=N_SHARDS)
    try:
        with pytest.raises(ValueError, match="construction-time"):
            ShardedSearcher(built, workers=tier.workers,
                            shard_chunks=tier._shard_chunks, k1=2.0)
        # defaults attach fine
        s = ShardedSearcher(built, workers=tier.workers,
                            shard_chunks=tier._shard_chunks)
        assert s.search(list(REFERENCE_QUERIES.values())[0], k=5)
    finally:
        tier.shutdown()
    # a non-default tier IS attachable when the facade declares the
    # tier's own params — and rejected when it declares the defaults
    tier2 = ShardedSearcher(built, n_shards=N_SHARDS, k1=1.2)
    try:
        s2 = ShardedSearcher(built, workers=tier2.workers,
                             shard_chunks=tier2._shard_chunks, k1=1.2)
        assert s2.search(list(REFERENCE_QUERIES.values())[0], k=5)
        with pytest.raises(ValueError, match="construction-time"):
            ShardedSearcher(built, workers=tier2.workers,
                            shard_chunks=tier2._shard_chunks)
    finally:
        tier2.shutdown()
