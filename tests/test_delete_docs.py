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


def _filtered_documents(tmp_path_factory, sf_dir, keep_fn):
    """documents.parquet subset with EXPLICIT doc_ids preserved."""
    import pyarrow.parquet as pq
    import pyarrow as pa

    t = pq.read_table(f"{sf_dir}/documents.parquet")
    ids = t.column("doc_id").to_numpy(zero_copy_only=False)
    keep = np.array([keep_fn(int(d)) for d in ids])
    out = str(tmp_path_factory.mktemp("docs_subset") / "documents.parquet")
    pq.write_table(t.filter(pa.array(keep)), out)
    return out


def test_compaction_equals_direct_build_on_survivors(ray_session, tmp_path_factory):
    """compact_index must produce an index rank/score-identical to one
    built directly on the surviving docs with the SAME ids (stats now
    reflect the live corpus — the opposite contract of the frozen-stats
    tombstone phase), and shard chunk universes must span the sparse id
    space."""
    from news_information_retrieval_system_ray.pipelines.index_build import (
        compact_index)
    from news_information_retrieval_system_ray.state.manifest import read_json
    import os

    sf = "/root/testdata/sf0.001"
    keep = lambda d: d % 5 != 2  # noqa: E731

    idx = str(tmp_path_factory.mktemp("index_compact"))
    build_index(f"{sf}/documents.parquet", idx, text_source="text",
                id_col="doc_id", engine="whitespace", n_shards=3,
                chunk_bits=5, resume=False)
    n0 = int(read_json(os.path.join(idx, "manifest.json"))["stats"]["n_docs"])
    victims = [d for d in range(n0) if not keep(d)]
    delete_docs(idx, victims)
    summary = compact_index(idx)
    assert summary is not None
    assert summary["n_compacted"] == len(victims)
    assert summary["n_docs"] == n0 - len(victims)
    assert compact_index(idx) is None  # tombstones cleared -> no-op

    ref_docs = _filtered_documents(tmp_path_factory, sf, keep)
    ref_idx = str(tmp_path_factory.mktemp("index_ref"))
    build_index(ref_docs, ref_idx, text_source="text", id_col="doc_id",
                engine="whitespace", n_shards=3, chunk_bits=5, resume=False)

    a, b = IndexSearcher(idx), IndexSearcher(ref_idx)
    assert a.n_docs == b.n_docs
    assert abs(a.avgdl - b.avgdl) < 1e-9
    for q in ("spark table join", "window agg batch", "customer value"):
        ra = a.search(q, k=20, method="wand")
        rb = b.search(q, k=20, method="wand")
        assert [d for d, _ in ra] == [d for d, _ in rb], q
        np.testing.assert_allclose([s for _, s in ra], [s for _, s in rb],
                                   rtol=0, atol=1e-12)
    # sharded serving over the compacted (sparse-id) index still finds
    # everything: chunk universe spans the id-space bound
    s = ShardedSearcher(idx, n_shards=4)
    try:
        for q in ("spark table join", "customer value"):
            assert s.search(q, k=10) == a.search(q, k=10, method="wand"), q
    finally:
        s.shutdown()
    # deleted docs are really gone from the postings
    assert not any(not keep(d) for d, _ in a.search("table", k=50))


def test_append_after_compact_allocates_from_id_space(ray_session, tmp_path_factory):
    """After compaction the live id set is sparse; an append must
    allocate NEW ids from the id-space bound, never reusing a surviving
    (or freed) id."""
    from news_information_retrieval_system_ray.pipelines.index_build import (
        append_index, compact_index)
    from news_information_retrieval_system_ray.state.manifest import read_json
    import os

    d = tmp_path_factory.mktemp("pages_idspace")
    paths = generate_pages(str(d), n_docs=200, seed=31, n_files=2)
    idx = str(tmp_path_factory.mktemp("index_idspace"))
    build_index(paths, idx, text_source="html", engine="cjk_bigram",
                block_size=16, chunk_bits=5, n_shards=2, resume=False)
    delete_docs(idx, list(range(0, 200, 3)))  # 67 victims
    assert compact_index(idx)["n_docs"] == 200 - 67
    m = read_json(os.path.join(idx, "manifest.json"))
    assert m["id_space"] == 200 and m["stats"]["n_docs"] == 133

    d2 = tmp_path_factory.mktemp("pages_idspace_new")
    new_paths = generate_pages(str(d2), n_docs=50, seed=77, n_files=1)
    res = append_index(idx, new_paths)
    assert res.n_docs == 183
    m2 = read_json(os.path.join(idx, "manifest.json"))
    assert m2["id_space"] == 250  # appended ids live in [200, 250)
    s = IndexSearcher(idx)
    hits = s.search(list(REFERENCE_QUERIES.values())[0], k=250, method="wand")
    ids = [doc for doc, _ in hits]
    assert len(ids) == len(set(ids))  # no id collisions anywhere
    assert max(ids) >= 200  # appended docs are searchable
    assert not any(i % 3 == 0 and i < 200 for i in ids)  # victims stay gone


def test_lifecycle_edges_after_compaction(ray_session, tmp_path_factory):
    """r4 review closures: (1) delete of a live doc with id >= n_docs
    works after compaction (validation uses the id-space bound); (2) a
    tombstone naming an already-absent id is a no-op that does NOT skew
    recomputed stats; (3) boolean NOT complements never resurrect
    deleted docs and track the sparse live id set; (4) compacting away
    every doc refuses loudly."""
    from news_information_retrieval_system_ray.pipelines.index_build import (
        compact_index)
    from news_information_retrieval_system_ray.state.manifest import read_json
    import os

    d = tmp_path_factory.mktemp("pages_edge")
    paths = generate_pages(str(d), n_docs=100, seed=41, n_files=1)
    idx = str(tmp_path_factory.mktemp("index_edge"))
    build_index(paths, idx, text_source="html", engine="cjk_bigram",
                block_size=16, chunk_bits=5, n_shards=2, resume=False)

    s0 = IndexSearcher(idx)
    # boolean NOT before any deletion: universe = all docs
    term = s0._query_terms(list(REFERENCE_QUERIES.values())[0])[0]
    not_pre = set(s0.boolean_query(f"NOT {term}").tolist())
    with_term = set(s0.postings(term)[0].tolist())
    assert not_pre == set(range(100)) - with_term

    delete_docs(idx, list(range(0, 100, 4)))  # 25 victims
    s1 = IndexSearcher(idx)
    not_post = set(s1.boolean_query(f"NOT {term}").tolist())
    assert not any(v % 4 == 0 for v in not_post)  # (3) no resurrection
    assert not_post == {d_ for d_ in not_pre if d_ % 4 != 0}

    assert compact_index(idx)["n_compacted"] == 25
    m = read_json(os.path.join(idx, "manifest.json"))
    assert m["stats"]["n_docs"] == 75 and m["id_space"] == 100

    # (1) doc 99 is live and >= n_docs(75): delete must validate OK
    assert delete_docs(idx, [99]) == 1
    # (2) tombstone a hole (id 4 was compacted away): no-op at compact,
    # stats derived from actual rows
    assert delete_docs(idx, [4]) == 1
    summary = compact_index(idx)
    assert summary["n_docs"] == 74          # only 99 actually removed
    assert summary["n_compacted"] == 1
    m2 = read_json(os.path.join(idx, "manifest.json"))
    assert m2["stats"]["n_docs"] == 74

    # (3) sparse-universe NOT after compaction: ids 0 mod 4 and 99 gone
    s2 = IndexSearcher(idx)
    uni = set(s2.live_doc_ids().tolist())
    assert uni == {d_ for d_ in range(100) if d_ % 4 != 0 and d_ != 99}
    assert set(s2.boolean_query(f"NOT {term}").tolist()) <= uni

    # (4) refusing to compact to empty
    delete_docs(idx, sorted(uni))
    with pytest.raises(ValueError, match="every document"):
        compact_index(idx)


def test_streaming_indexer_resumes_spool_sequence(ray_session, tmp_path_factory):
    """Restarting a StreamingIndexer over the same persistent spool dir
    must continue the file sequence (an overwrite would be silently
    dropped by append's known-file dedup)."""
    from news_information_retrieval_system_ray.pipelines.index_build import (
        StreamingIndexer)
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("pages_spool")
    paths = generate_pages(str(d), n_docs=120, seed=51, n_files=2)
    idx = str(tmp_path_factory.mktemp("index_spool"))
    build_index(paths[:1], idx, text_source="html", engine="cjk_bigram",
                block_size=16, chunk_bits=5, n_shards=2, resume=False)
    rows = pq.read_table(paths[1]).to_pylist()
    spool = str(tmp_path_factory.mktemp("spool_persist"))

    ing1 = StreamingIndexer(idx, flush_every=1000, spool_dir=spool)
    ing1.add(rows[:20])
    r1 = ing1.flush()
    n_after_first = r1.n_docs

    ing2 = StreamingIndexer(idx, flush_every=1000, spool_dir=spool)
    assert ing2._spooled == 1  # resumes PAST stream-000000.parquet
    ing2.add(rows[20:45])
    r2 = ing2.flush()
    assert r2.n_docs == n_after_first + 25  # second batch NOT dropped


def test_random_delete_sets_preserve_survivor_ranking(built, tmp_path_factory):
    """Property sweep: for random victim sets, the post-delete ranking
    is EXACTLY the pre-delete ranking minus the victims (frozen stats
    => survivor scores bit-identical), across naive and WAND."""
    import shutil

    pre = IndexSearcher(built)
    q = list(REFERENCE_QUERIES.values())[2]
    full_pre = pre.search(q, k=N_DOCS, method="wand")
    assert len(full_pre) >= 20
    for seed in range(5):
        rng = np.random.default_rng(seed)
        victims = set(int(v) for v in rng.choice(
            N_DOCS, size=int(rng.integers(1, 60)), replace=False))
        idx2 = str(tmp_path_factory.mktemp(f"index_rnd{seed}"))
        shutil.rmtree(idx2)
        shutil.copytree(built, idx2)
        delete_docs(idx2, sorted(victims))
        post = IndexSearcher(idx2)
        expect = [(d, s) for d, s in full_pre if d not in victims]
        for method in ("naive", "wand"):
            got = post.search(q, k=N_DOCS, method=method)
            assert got == expect, (seed, method)


def test_compaction_positional_layout(ray_session, tmp_path_factory):
    """compact_index's positional branch: phrase + BM25 results after
    delete+compact equal a direct rebuild on the surviving pages (page
    ids shift on rebuild, so compare via the compacted searcher's own
    invariants: victims gone, phrase set == pre-delete minus victims,
    and stats reflect the live corpus)."""
    from news_information_retrieval_system_ray.pipelines.index_build import (
        compact_index)

    d = tmp_path_factory.mktemp("pages_cpos")
    paths = generate_pages(str(d), n_docs=120, seed=61, n_files=2)
    idx = str(tmp_path_factory.mktemp("index_cpos"))
    build_index(paths, idx, text_source="html", engine="cjk_bigram",
                block_size=16, chunk_bits=5, n_shards=2,
                with_positions=True, resume=False)
    pre = IndexSearcher(idx)
    phrase = ["台灣"]
    pre_phrase = pre.phrase_docs(phrase).tolist()
    assert pre_phrase
    pre_total = pre.n_docs * pre.avgdl
    victims = set(pre_phrase[::2]) | {0, 1}
    delete_docs(idx, sorted(victims))
    res = compact_index(idx)
    assert res["n_docs"] == 120 - len(victims)
    post = IndexSearcher(idx)
    assert post.phrase_docs(phrase).tolist() == \
        [d_ for d_ in pre_phrase if d_ not in victims]
    assert post.n_docs == 120 - len(victims)
    assert post.n_docs * post.avgdl < pre_total  # stats shrank with corpus
    # BM25 over the compacted positional index finds no victims
    got = post.search(list(REFERENCE_QUERIES.values())[0], k=120)
    assert not victims & {d_ for d_, _ in got}


def test_delete_docs_unique_tombstone_filenames(built):
    """Two delete calls never collide on a tombstone path (unique
    per-writer suffix), and the union of both files is the full set."""
    import glob
    import os
    import re

    import pyarrow.parquet as pq

    delete_docs(built, [1, 2, 3])
    delete_docs(built, [4, 5])
    files = sorted(glob.glob(os.path.join(built, "deletes", "*.parquet")))
    assert len(files) == 2
    for f in files:
        assert re.search(r"delete-\d{5}-[0-9a-f]{8}\.parquet$", f), f
    got = set()
    for f in files:
        got |= set(pq.read_table(f).column("doc_id").to_pylist())
    assert got == {1, 2, 3, 4, 5}
    s = IndexSearcher(built)
    assert not ({1, 2, 3, 4, 5} &
                {d for d, _ in s.search(list(REFERENCE_QUERIES.values())[0],
                                        k=N_DOCS)})


def test_streaming_flush_retries_same_spool_file(ray_session, tmp_path_factory):
    """A failed append must be retried with the SAME spool file (append's
    crash-resume keys on the input path); rows buffered meanwhile flush
    afterwards without loss or duplication."""
    import pyarrow.parquet as pq

    import news_information_retrieval_system_ray.pipelines.index_build as ib

    d = tmp_path_factory.mktemp("pages_retry")
    paths = generate_pages(str(d), n_docs=120, seed=53, n_files=2)
    idx = str(tmp_path_factory.mktemp("index_retry"))
    build_index(paths[:1], idx, text_source="html", engine="cjk_bigram",
                block_size=16, chunk_bits=5, n_shards=2, resume=False)
    base = IndexSearcher(idx).n_docs
    rows = pq.read_table(paths[1]).to_pylist()
    spool = str(tmp_path_factory.mktemp("spool_retry"))
    ing = ib.StreamingIndexer(idx, flush_every=1000, spool_dir=spool)
    ing.add(rows[:20])

    real_append = ib.append_index
    calls = {"n": 0}

    def flaky(index_dir, inputs, **kw):
        calls["n"] += 1
        if calls["n"] == 1:
            calls["first_input"] = list(inputs)
            raise RuntimeError("injected transient append failure")
        calls.setdefault("retry_input", list(inputs))
        return real_append(index_dir, inputs, **kw)

    ib.append_index = flaky
    try:
        with pytest.raises(RuntimeError):
            ing.flush()
        assert ing._pending is not None  # same file armed for retry
        ing.add(rows[20:30])  # rows arriving between failure and retry
        res = ing.flush()
    finally:
        ib.append_index = real_append
    assert calls["retry_input"] == calls["first_input"]  # SAME path
    # the retried file held the first 20 rows; the next 10 flushed after
    assert res.n_docs == base + 30
    assert ing._pending is None and not ing._buf


@pytest.mark.parametrize("layout,kw", [
    ("default", {}),
    ("positional", {"with_positions": True}),
    ("chunkband", {"chunkband_partitions": 2}),
])
def test_full_lifecycle_per_layout(ray_session, tmp_path_factory, layout, kw):
    """delete -> query -> compact -> append -> query across every index
    layout: the tombstone phase preserves survivor order (frozen
    stats), and the compact+append index is rank/score-identical to a
    DIRECT build on (survivors + appended docs) with the same ids."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from news_information_retrieval_system_ray.pipelines.index_build import (
        append_index, compact_index)
    from news_information_retrieval_system_ray.state.manifest import read_json

    sf = "/root/testdata/sf0.001"
    common = dict(text_source="text", id_col="doc_id", engine="whitespace",
                  n_shards=3, chunk_bits=5, resume=False)
    idx = str(tmp_path_factory.mktemp(f"life_{layout}"))
    build_index(f"{sf}/documents.parquet", idx, **common, **kw)
    n0 = int(read_json(os.path.join(idx, "manifest.json"))["stats"]["n_docs"])
    s0 = IndexSearcher(idx)
    q = "spark table join"
    pre = s0.search(q, k=n0, method="wand")

    victims = sorted({d for d, _ in pre[:4]} | {d for d in range(0, n0, 7)})
    delete_docs(idx, victims)
    vset = set(victims)
    post = IndexSearcher(idx).search(q, k=n0, method="wand")
    assert post == [r for r in pre if r[0] not in vset]  # frozen stats

    assert compact_index(idx)["n_compacted"] == len(victims)

    new_docs = str(tmp_path_factory.mktemp(f"new_{layout}") / "new.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array([n0 + i for i in range(8)], pa.int64()),
        "text": pa.array([f"spark table join window batch epoch {i}"
                          for i in range(8)]),
    }), new_docs)
    append_index(idx, [new_docs])

    # direct-build twin on survivors + the appended docs, same ids
    surv = _filtered_documents(tmp_path_factory, sf, lambda d: d not in vset)
    ref_idx = str(tmp_path_factory.mktemp(f"ref_{layout}"))
    build_index([surv, new_docs], ref_idx, **common, **kw)

    a, b = IndexSearcher(idx), IndexSearcher(ref_idx)
    assert a.n_docs == b.n_docs == n0 - len(victims) + 8
    ra = a.search(q, k=a.n_docs, method="wand")
    rb = b.search(q, k=a.n_docs, method="wand")
    assert [d for d, _ in ra] == [d for d, _ in rb]
    np.testing.assert_allclose([x for _, x in ra], [x for _, x in rb],
                               rtol=0, atol=1e-12)
    assert any(d >= n0 for d, _ in ra)  # appended docs searchable
    if layout == "positional":
        np.testing.assert_array_equal(a.phrase_docs(["spark", "table"]),
                                      b.phrase_docs(["spark", "table"]))
    # sharded serving agrees on every layout (chunk universe spans the
    # sparse id space; banded layout restricts per-shard file IO)
    sh = ShardedSearcher(idx, n_shards=4)
    try:
        assert sh.search(q, k=10) == a.search(q, k=10, method="wand")
    finally:
        sh.shutdown()


def test_streaming_dedup_on_ingest(ray_session, tmp_path_factory):
    """dedup=True drops exact duplicates before they cost any index
    work — within a batch, across flushes, and across a RESTART over
    the same spool dir (hash sidecar reload); seed_hashes blocks
    base-corpus duplicates too."""
    import hashlib

    import pyarrow.parquet as pq

    from news_information_retrieval_system_ray.pipelines.index_build import (
        StreamingIndexer)

    d = tmp_path_factory.mktemp("pages_dedup")
    paths = generate_pages(str(d), n_docs=160, seed=61, n_files=2)
    idx = str(tmp_path_factory.mktemp("index_dedup"))
    build_index(paths[:1], idx, text_source="html", engine="cjk_bigram",
                block_size=16, chunk_bits=5, n_shards=2, resume=False)
    base = IndexSearcher(idx).n_docs
    rows = pq.read_table(paths[1]).to_pylist()
    spool = str(tmp_path_factory.mktemp("spool_dedup"))

    seed = {hashlib.md5(bytes(rows[0]["html"]).decode("utf-8", errors="replace").encode("utf-8")).hexdigest()}
    ing = StreamingIndexer(idx, flush_every=1000, spool_dir=spool,
                           dedup=True, seed_hashes=seed)
    # rows[0] blocked by the seed; rows[1] duplicated in-batch
    ing.add([rows[0], rows[1], dict(rows[1]), rows[2]])
    assert ing.n_dropped == 2
    ing.flush()
    assert IndexSearcher(idx).n_docs == base + 2

    # duplicate across flushes
    ing.add([dict(rows[2]), rows[3]])
    ing.flush()
    assert ing.n_dropped == 3
    assert IndexSearcher(idx).n_docs == base + 3

    # restart over the same spool: sidecar reload keeps blocking
    ing2 = StreamingIndexer(idx, flush_every=1000, spool_dir=spool,
                            dedup=True)
    ing2.add([dict(rows[1]), dict(rows[3]), rows[4]])
    assert ing2.n_dropped == 2
    ing2.flush()
    s = IndexSearcher(idx)
    assert s.n_docs == base + 4
    # everything indexed exactly once: no doc id duplicated
    hits = s.search(list(REFERENCE_QUERIES.values())[0], k=base + 10,
                    method="wand")
    ids = [doc for doc, _ in hits]
    assert len(ids) == len(set(ids))


def test_streaming_near_dup_on_ingest(ray_session, tmp_path_factory):
    """near_dup_threshold drops FUZZY duplicates at ingest (one-word
    edits of an accepted doc), keeps genuinely distinct docs, and the
    signature sidecar keeps blocking across a restart."""
    import pyarrow.parquet as pq

    from news_information_retrieval_system_ray.pipelines.index_build import (
        StreamingIndexer)

    d = tmp_path_factory.mktemp("pages_neardup")
    paths = generate_pages(str(d), n_docs=120, seed=67, n_files=2)
    idx = str(tmp_path_factory.mktemp("index_neardup"))
    build_index(paths[:1], idx, text_source="html", engine="cjk_bigram",
                block_size=16, chunk_bits=5, n_shards=2, resume=False)
    base = IndexSearcher(idx).n_docs
    rows = pq.read_table(paths[1]).to_pylist()
    spool = str(tmp_path_factory.mktemp("spool_neardup"))

    ing = StreamingIndexer(idx, flush_every=1000, spool_dir=spool,
                           near_dup_threshold=0.8)
    near = dict(rows[0])
    near["html"] = rows[0]["html"].replace(b"the", b"thy", 1)  # tiny edit
    ing.add([rows[0], near, rows[1]])
    assert ing.n_near_dropped == 1
    ing.flush()
    assert IndexSearcher(idx).n_docs == base + 2

    # restart: sidecar signatures still block near-dups of flushed docs
    ing2 = StreamingIndexer(idx, flush_every=1000, spool_dir=spool,
                            near_dup_threshold=0.8)
    near2 = dict(rows[1])
    near2["html"] = rows[1]["html"].replace(b"a", b"o", 1)
    ing2.add([near2, rows[2]])
    assert ing2.n_near_dropped == 1
    ing2.flush()
    assert IndexSearcher(idx).n_docs == base + 3


def test_verify_index_clean_and_corrupt(ray_session, tmp_path_factory):
    """verify_index passes a healthy index (default and positional
    layouts, with tombstones) and pinpoints a corrupted segment row."""
    import glob
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from news_information_retrieval_system_ray.pipelines.index_build import (
        verify_index)

    d = tmp_path_factory.mktemp("pages_verify")
    paths = generate_pages(str(d), n_docs=150, seed=71, n_files=2)
    idx = str(tmp_path_factory.mktemp("index_verify"))
    build_index(paths, idx, text_source="html", engine="cjk_bigram",
                block_size=16, chunk_bits=5, n_shards=2, resume=False)
    delete_docs(idx, [3, 7])
    r = verify_index(idx)
    assert r["ok"] and r["n_tombstones"] == 1 and r["postings"] > 0

    pidx = str(tmp_path_factory.mktemp("index_verify_pos"))
    build_index(paths, pidx, text_source="html", engine="cjk_bigram",
                block_size=16, chunk_bits=5, n_shards=2, resume=False,
                with_positions=True)
    rp = verify_index(pidx)
    assert rp["ok"] and rp["postings"] == r["postings"]

    # corrupt one row's df -> the audit must localize it
    f = sorted(glob.glob(os.path.join(idx, "segments", "**", "*.parquet"),
                         recursive=True))[0]
    t = pq.read_table(f)
    df = t.column("df").to_pylist()
    df[0] += 1
    t = t.set_column(t.schema.get_field_index("df"), "df",
                     pa.array(df, t.schema.field("df").type))
    pq.write_table(t, f, row_group_size=2048)
    bad = verify_index(idx)
    assert not bad["ok"]
    assert any("df" in e for e in bad["errors"])
