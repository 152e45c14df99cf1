"""Default-on vocab sidecar + 64-bit term-hash collision detection
(hash-only shuffle safety: ADVICE r01 — a silent collision would merge
two terms' posting lists)."""

import glob
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import news_information_retrieval_system_ray.functions.hashing as H
from news_information_retrieval_system_ray.pipelines.index_build import (
    _vocab_aggregate,
    build_index,
    vocab_check_and_project,
)


def _write_docs(tmp_path, texts):
    pq.write_table(
        pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())}),
        str(tmp_path / "docs.parquet"))
    return str(tmp_path / "docs.parquet")


def test_vocab_sidecar_and_hashcheck(ray_session, tmp_path):
    p = _write_docs(tmp_path, ["alpha beta", "beta gamma", "gamma alpha"])
    idx = tempfile.mkdtemp(prefix="vocab_idx_")
    build_index(p, idx, text_source="text", id_col="doc_id",
                engine="whitespace", n_shards=1, chunk_bits=8, resume=False,
                build_vocab=True)
    files = glob.glob(idx + "/vocab/*.parquet")
    assert files, "vocab sidecar not written"
    # default path: the collision check rides the segments sort — the
    # alt passenger column is stored per posting row and the manifest
    # records the layout (no separate hashcheck sidecar anymore)
    seg_files = glob.glob(idx + "/segments/*.parquet")
    assert seg_files
    seg = pq.read_table(seg_files[0], columns=["term_hash", "alt"])
    assert seg.num_rows > 0
    import json
    with open(idx + "/manifest.json") as fh:
        assert json.load(fh).get("alt_layout") is True
    # alt really is the second MD5 half of the hash's term
    th0 = int(np.uint64(seg.column("term_hash")[0].as_py()))
    alt0 = int(np.uint64(seg.column("alt")[0].as_py()))
    by_hash = {H.token_hash64(t): H.token_hash_pair(t)[1]
               for t in ("alpha", "beta", "gamma")}
    assert by_hash[th0] == alt0
    t = pa.concat_tables([pq.read_table(f) for f in files])
    terms = set(t.column("term").to_pylist())
    assert terms == {"alpha", "beta", "gamma"}
    # hashes stored as int64 bit-cast of the 64-bit token hash
    stored = set(np.asarray(t.column("term_hash"), dtype=np.int64)
                 .view(np.uint64).tolist())
    assert stored == {H.token_hash64(x) for x in terms}


def test_hashcheck_collision_raises():
    from news_information_retrieval_system_ray.pipelines.index_build import hashcheck_verify

    bad = pa.table({"term_hash": pa.array([1, 2], pa.int64()),
                    "a_min": pa.array([10, 7], pa.int64()),
                    "a_max": pa.array([11, 7], pa.int64())})
    with pytest.raises(ValueError, match="collision"):
        hashcheck_verify(bad)
    ok = pa.table({"term_hash": pa.array([1, 2], pa.int64()),
                   "a_min": pa.array([10, 7], pa.int64()),
                   "a_max": pa.array([10, 7], pa.int64())})
    assert hashcheck_verify(ok).num_rows == 2


def test_collision_check_raises():
    # aggregated hash group with two distinct terms -> collision
    bad = pa.table({"term_hash": pa.array([1, 2], pa.int64()),
                    "t_min": ["alpha", "gamma"],
                    "t_max": ["beta", "gamma"]})
    with pytest.raises(ValueError, match="collision"):
        vocab_check_and_project(bad)
    ok = pa.table({"term_hash": pa.array([1, 2], pa.int64()),
                   "t_min": ["alpha", "gamma"],
                   "t_max": ["alpha", "gamma"]})
    out = vocab_check_and_project(ok)
    assert out.column("term").to_pylist() == ["alpha", "gamma"]


def test_collision_detected_in_pipeline(ray_session):
    """End-to-end through the vocab aggregate: two distinct terms with a
    forced identical hash must fail the build-side aggregate."""
    import ray.data as rd

    pairs = rd.from_arrow(pa.table({
        "term_hash": pa.array([777, 777, 42], pa.int64()),
        "term": ["alpha", "beta", "gamma"],
    }))
    with pytest.raises(Exception, match="collision"):
        _vocab_aggregate(pairs).materialize()


def test_prepack_inbatch_collision_raises(monkeypatch):
    """Two distinct terms FORCED onto one 64-bit hash must fail inside
    PrePackTokens (the in-batch adjacency check on the alt passenger)."""
    import news_information_retrieval_system_ray.stages.indexing as IDX

    real_pair = H.token_hash_pair

    def fake_pair(tok):
        if tok in ("alpha", "beta"):  # same hash, different alt
            return (777, 1 if tok == "alpha" else 2)
        return real_pair(tok)

    monkeypatch.setattr(IDX, "token_hash_pair", fake_pair)
    batch = pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "doc_len": pa.array([2, 2], pa.int64()),
        "terms": pa.array([["alpha", "x"], ["beta", "y"]]),
        "tfs": pa.array([[1, 1], [1, 1]], pa.list_(pa.int32())),
    })
    with pytest.raises(ValueError, match="collision"):
        IDX.PrePackTokens(chunk_bits=8)(batch)
    # sanity: without the forced collision the same batch packs fine
    monkeypatch.setattr(IDX, "token_hash_pair", real_pair)
    out = IDX.PrePackTokens(chunk_bits=8)(batch)
    assert "alt" in out.column_names and out.num_rows > 0


def test_alt_edge_check_interior_and_edges():
    from news_information_retrieval_system_ray.pipelines.index_build import _alt_edge_check

    ok = pa.table({"term_hash": pa.array([1, 1, 2, 3], pa.uint64()),
                   "alt": pa.array([9, 9, 8, 7], pa.uint64())})
    edges = _alt_edge_check(ok)
    assert edges.column("term_hash").to_pylist() == [1, 3]  # first + last row
    bad = pa.table({"term_hash": pa.array([1, 1, 2], pa.uint64()),
                    "alt": pa.array([9, 5, 8], pa.uint64())})
    with pytest.raises(ValueError, match="collision"):
        _alt_edge_check(bad)


def test_verify_alt_sorted_cross_block(ray_session, tmp_path):
    """A collision whose conflicting rows sit in DIFFERENT parquet files
    is caught by the driver-side boundary check."""
    from news_information_retrieval_system_ray.pipelines.index_build import _verify_alt_sorted

    d = tmp_path / "segs"
    d.mkdir()
    pq.write_table(pa.table({"term_hash": pa.array([5, 7], pa.uint64()),
                             "alt": pa.array([1, 2], pa.uint64())}),
                   str(d / "a.parquet"))
    pq.write_table(pa.table({"term_hash": pa.array([7, 9], pa.uint64()),
                             "alt": pa.array([3, 4], pa.uint64())}),
                   str(d / "b.parquet"))
    with pytest.raises(ValueError, match="collision"):
        _verify_alt_sorted(str(d))
    # consistent boundary rows pass
    pq.write_table(pa.table({"term_hash": pa.array([7, 9], pa.uint64()),
                             "alt": pa.array([2, 4], pa.uint64())}),
                   str(d / "b.parquet"))
    _verify_alt_sorted(str(d))


def test_verify_alt_global_across_collections(ray_session, tmp_path):
    """Append layout: base and append_* segment dirs are each sorted but
    not mutually — an old-vs-new collision must fail the pairs groupby."""
    from news_information_retrieval_system_ray.pipelines.index_build import _verify_alt_global

    root = tmp_path / "segments"
    (root / "append_1").mkdir(parents=True)
    pq.write_table(pa.table({"term_hash": pa.array([5, 7], pa.uint64()),
                             "alt": pa.array([1, 2], pa.uint64())}),
                   str(root / "base.parquet"))
    pq.write_table(pa.table({"term_hash": pa.array([3, 7], pa.uint64()),
                             "alt": pa.array([6, 2], pa.uint64())}),
                   str(root / "append_1" / "seg.parquet"))
    _verify_alt_global(str(root))  # consistent: 7 -> alt 2 in both
    pq.write_table(pa.table({"term_hash": pa.array([3, 7], pa.uint64()),
                             "alt": pa.array([6, 9], pa.uint64())}),
                   str(root / "append_1" / "seg.parquet"))
    with pytest.raises(Exception, match="collision"):
        _verify_alt_global(str(root))


def test_positional_build_alt_layout(ray_session, tmp_path):
    """The positions layout now carries the alt passenger too (VERDICT
    r02 #7): segments store (term_hash, alt), the manifest records
    alt_layout, and NO separate hashcheck sidecar job runs — collision
    parity with the default layout."""
    import json
    import os

    from news_information_retrieval_system_ray.pipelines.query import IndexSearcher

    p = _write_docs(tmp_path, ["alpha beta gamma", "beta gamma alpha",
                               "gamma alpha beta"])
    idx = tempfile.mkdtemp(prefix="pos_alt_idx_")
    build_index(p, idx, text_source="text", id_col="doc_id",
                engine="whitespace", n_shards=1, chunk_bits=8, resume=False,
                with_positions=True)
    seg_files = glob.glob(idx + "/segments/*.parquet")
    assert seg_files
    seg = pq.read_table(seg_files[0], columns=["term_hash", "alt"])
    assert seg.num_rows > 0
    th0 = int(np.uint64(seg.column("term_hash")[0].as_py()))
    alt0 = int(np.uint64(seg.column("alt")[0].as_py()))
    by_hash = {H.token_hash64(t): H.token_hash_pair(t)[1]
               for t in ("alpha", "beta", "gamma")}
    assert by_hash[th0] == alt0
    with open(idx + "/manifest.json") as fh:
        assert json.load(fh).get("alt_layout") is True
    assert not os.path.isdir(idx + "/hashcheck")
    # the positional query path still works on the alt-carrying layout
    s = IndexSearcher(idx)
    assert set(s.phrase_docs(["alpha", "beta"]).tolist()) == {0, 2}


def test_packruns_positional_bit_identical_to_packgroups():
    """The vectorized positional PackRuns (one flattened delta+VByte
    pass) must emit BIT-identical rows to the per-run PackGroups loop
    it replaced — including the alt passenger and unsorted-position
    inputs (the defensive sorted(pl) semantics)."""
    from news_information_retrieval_system_ray.stages.indexing import (
        PackGroups, PackRuns)

    rng = np.random.default_rng(17)
    rows = []
    for th in (5, 9, 9, 12):
        for ch in (0, 1):
            docs = np.sort(rng.choice(1000, size=int(rng.integers(1, 40)),
                                      replace=False)) + ch * 1000
            for d in docs:
                k = int(rng.integers(1, 6))
                rows.append({"term_hash": th, "chunk": ch, "doc_id": int(d),
                             "tf": k, "dl": int(rng.integers(10, 200)),
                             "positions": sorted(
                                 int(x) for x in rng.integers(0, 500, size=k)),
                             "alt": th * 7 + 1})
    rows.sort(key=lambda r: (r["term_hash"], r["chunk"], r["doc_id"]))
    rows[3]["positions"] = rows[3]["positions"][::-1]  # unsorted input
    batch = pa.Table.from_pylist(rows, schema=pa.schema([
        ("term_hash", pa.uint64()), ("chunk", pa.int32()),
        ("doc_id", pa.int64()), ("tf", pa.int32()), ("dl", pa.int32()),
        ("positions", pa.list_(pa.int64())), ("alt", pa.uint64())]))
    new = PackRuns(block_size=8, with_positions=True)(batch)
    th_a = batch.column("term_hash").to_numpy(zero_copy_only=False)
    ch_a = batch.column("chunk").to_numpy(zero_copy_only=False).astype(np.int64)
    gs = np.concatenate(([0], np.flatnonzero(
        (np.diff(th_a.view(np.int64)) != 0) | (np.diff(ch_a) != 0)) + 1))
    pk = PackGroups(8, True)
    old = pa.concat_tables([pk(batch.slice(s, e - s)) for s, e in
                            zip(gs, np.append(gs[1:], len(batch)))])
    old = old.select(new.column_names).cast(new.schema)
    assert new.num_rows == old.num_rows
    for c in new.column_names:
        assert new.column(c).combine_chunks() == old.column(c).combine_chunks(), c


def test_packruns_detects_within_run_collision():
    """Two distinct terms forced onto one 64-bit hash interleave inside
    one (term_hash, chunk) run; the pack itself must raise — the
    post-write verify only sees the packed row's single alt value, so
    this is where the positional layout's collision net closes.  Both
    the vectorized PackRuns and the per-group PackGroups check."""
    from news_information_retrieval_system_ray.stages.indexing import (
        PackGroups, PackRuns)

    batch = pa.Table.from_pylist([
        {"term_hash": 777, "chunk": 0, "doc_id": 0, "tf": 1, "dl": 4,
         "positions": [1], "alt": 1},
        {"term_hash": 777, "chunk": 0, "doc_id": 1, "tf": 1, "dl": 4,
         "positions": [2], "alt": 2},  # same hash, different term
    ], schema=pa.schema([
        ("term_hash", pa.uint64()), ("chunk", pa.int32()),
        ("doc_id", pa.int64()), ("tf", pa.int32()), ("dl", pa.int32()),
        ("positions", pa.list_(pa.int64())), ("alt", pa.uint64())]))
    with pytest.raises(ValueError, match="collision"):
        PackRuns(block_size=8, with_positions=True)(batch)
    with pytest.raises(ValueError, match="collision"):
        PackRuns(block_size=8, with_positions=False)(
            batch.drop_columns(["positions"]))
    with pytest.raises(ValueError, match="collision"):
        PackGroups(8, True)(batch)
