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


def test_model_seam_selects_by_import_availability(monkeypatch):
    """VERDICT r02 #9: the stand-in and the real-model stage must select
    purely on import availability — faking the package present flips
    the seam to the model stage, absent falls back deterministically."""
    import sys
    import types

    import numpy as np
    import pyarrow as pa

    from news_information_retrieval_system_ray.stages.dense import (
        HashingEncoderStage,
        ModelEncoderStage,
        encoder_available,
        select_encoder_stage,
    )

    # this container has no sentence_transformers -> hashing stand-in
    assert not encoder_available()
    assert isinstance(select_encoder_stage(dim=8), HashingEncoderStage)

    class _StubModel:
        def __init__(self, name):
            self.name = name

        def encode(self, texts, batch_size=64):
            return np.full((len(texts), 4), 0.5)

    fake = types.ModuleType("sentence_transformers")
    fake.SentenceTransformer = _StubModel
    fake.__spec__ = types.SimpleNamespace(name="sentence_transformers")
    monkeypatch.setitem(sys.modules, "sentence_transformers", fake)

    assert encoder_available()
    stage = select_encoder_stage(dim=8, model_name="stub-model")
    assert isinstance(stage, ModelEncoderStage)
    assert stage.model.name == "stub-model"
    out = stage(pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                          "text": ["a b", "c d"]}))
    emb = out.column("embedding")
    assert emb.type.list_size == 4
    assert out.column("doc_id").to_pylist() == [1, 2]


def test_tokenizer_engine_seam(monkeypatch):
    """select_engine: model engines (jieba/ckip) fall back to the
    deterministic default when their package is absent, and select
    themselves when the import resolves."""
    import sys
    import types

    from news_information_retrieval_system_ray.functions.tokenize import (
        DEFAULT_ENGINE,
        engine_available,
        select_engine,
    )

    # deterministic engines are always available
    assert engine_available("whitespace") and engine_available("cjk_bigram")
    # model engines absent in this container -> fallback
    assert not engine_available("ckip")
    assert select_engine("ckip") == DEFAULT_ENGINE
    assert select_engine("jieba", fallback="whitespace") == "whitespace"
    # fake the CKIP package present -> the seam selects it
    fake = types.ModuleType("ckip_transformers")
    fake.__spec__ = types.SimpleNamespace(name="ckip_transformers")
    monkeypatch.setitem(sys.modules, "ckip_transformers", fake)
    assert engine_available("ckip")
    assert select_engine("ckip") == "ckip"
    # unknown engines are never "available"
    assert not engine_available("no_such_engine")
