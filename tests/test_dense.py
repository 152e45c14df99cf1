"""Dense bi-encoder retrieval (feature-hashing encoder): encoder
determinism, schema, self-retrieval sanity, and broadcast top-k."""

import numpy as np
import pyarrow as pa

from news_information_retrieval_system_ray.stages.dense import (
    HashingEncoderStage, dense_topk, encode_text, hash_bucket)


def test_hash_bucket_deterministic():
    b1, s1 = hash_bucket("spark", 32)
    b2, s2 = hash_bucket("spark", 32)
    assert (b1, s1) == (b2, s2)
    assert 0 <= b1 < 32 and s1 in (-1, 1)


def test_encode_counts_multiplicity():
    v1 = encode_text("spark", 32)
    v2 = encode_text("spark spark", 32)
    assert np.allclose(v2, 2 * v1)
    assert np.count_nonzero(v1) == 1


def test_encoder_stage_schema():
    stage = HashingEncoderStage(dim=16)
    out = stage(pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                          "text": ["spark join", ""]}))
    assert out.column_names == ["doc_id", "embedding"]
    assert pa.types.is_fixed_size_list(out.schema.field("embedding").type)
    assert out.schema.field("embedding").type.list_size == 16
    mat = np.asarray(out.column("embedding").combine_chunks()
                     .values.to_numpy(zero_copy_only=False)).reshape(2, 16)
    assert np.allclose(mat[0], encode_text("spark join", 16))
    assert np.allclose(mat[1], 0)


def test_self_retrieval(ray_session):
    """A doc queried by its own text must rank itself first."""
    import ray.data as rd

    texts = ["spark join table", "merge sort window", "vector batch stream"]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()), "text": texts}))
    encoded = ds.map_batches(HashingEncoderStage(dim=32),
                             batch_format="pyarrow")
    qv = np.stack([encode_text(t, 32) for t in texts])
    out = dense_topk(encoded, qv, ["a", "b", "c"], k=2)
    top1 = out[out["rank"] == 1].sort_values("qid")
    assert list(top1["doc_id"]) == [0, 1, 2]
    assert all(abs(s - 1.0) < 1e-9 for s in top1["score"])


def test_zero_norm_docs_dropped(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([5, 6], pa.int64()),
        "text": ["spark", ""]}))
    encoded = ds.map_batches(HashingEncoderStage(dim=32),
                             batch_format="pyarrow")
    out = dense_topk(encoded, np.stack([encode_text("spark", 32)]),
                     ["q"], k=5)
    assert list(out["doc_id"]) == [5]
