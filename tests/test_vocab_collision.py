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
    # the default-on dual-hash collision check sidecar is also present
    assert glob.glob(idx + "/hashcheck/*.parquet"), "hashcheck sidecar missing"
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
