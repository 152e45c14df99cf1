"""Training-data curation operators (pipelines/curation.py):
deterministic hash split, seeded epoch-shuffle head, keep/drop
composite with precedence."""

import hashlib

import numpy as np
import pandas as pd
import pytest

from news_information_retrieval_system_ray.pipelines import curation as CU


@pytest.fixture()
def corpus_dir(tmp_path):
    rows = []
    # doc 0/1: exact dups (same text) -> 1 keeps, other drop_dup
    dup_text = " ".join(f"dup{i}" for i in range(30))  # 30 distinct tokens
    rows.append((0, "en", dup_text))
    rows.append((1, "en", dup_text))
    # doc 2: wrong lang
    rows.append((2, "de", "ein zwei drei vier funf sechs sieben acht " * 3))
    # doc 3: too short
    rows.append((3, "en", "tiny doc here"))
    # doc 4: too long (> 80 tokens)
    rows.append((4, "en", " ".join(f"w{i}" for i in range(120))))
    # doc 5: low quality (2 distinct tokens, 40 total)
    rows.append((5, "en", "spam ham " * 20))
    # doc 6: clean keep (30 distinct tokens)
    rows.append((6, "en", " ".join(f"tok{i}" for i in range(30))))
    df = pd.DataFrame(rows, columns=["doc_id", "lang", "text"])
    df["source"] = "s"
    df.to_parquet(tmp_path / "documents.parquet")
    return str(tmp_path)


def test_corpus_curate_precedence(corpus_dir):
    out = CU.corpus_curate(corpus_dir).to_pandas().set_index("doc_id")
    # dup group keeper = min doc_id = 0
    assert out.loc[0, "status"] == "keep"
    assert out.loc[1, "status"] == "drop_dup"
    assert out.loc[2, "status"] == "drop_lang"
    assert out.loc[3, "status"] == "drop_short"
    assert out.loc[4, "status"] == "drop_long"
    assert out.loc[5, "status"] == "drop_lowq"
    assert out.loc[6, "status"] == "keep"
    assert len(out) == 7


def test_corpus_curate_dup_beats_lang(tmp_path):
    """Precedence: a non-keeper dup in the wrong language is drop_dup."""
    t = " ".join(f"es{i}" for i in range(20))
    df = pd.DataFrame({"doc_id": [7, 9], "lang": ["es", "es"],
                       "text": [t, t], "source": ["s", "s"]})
    df.to_parquet(tmp_path / "documents.parquet")
    out = CU.corpus_curate(str(tmp_path)).to_pandas().set_index("doc_id")
    assert out.loc[7, "status"] == "drop_lang"   # keeper, then lang rule
    assert out.loc[9, "status"] == "drop_dup"    # non-keeper short-circuits


def test_train_split_deterministic_and_complete(corpus_dir):
    a = CU.train_split(corpus_dir).to_pandas().sort_values("doc_id")
    b = CU.train_split(corpus_dir).to_pandas().sort_values("doc_id")
    pd.testing.assert_frame_equal(a.reset_index(drop=True), b.reset_index(drop=True))
    assert len(a) == 7
    # assignment matches the documented md5 formula
    for _, r in a.iterrows():
        h = int.from_bytes(hashlib.md5(
            f"{CU.SPLIT_SALT}:{r.doc_id}".encode()).digest()[:8], "big") % 100
        assert r.bucket == h
        expect = "test" if h < CU.SPLIT_TEST_LT else (
            "val" if h < CU.SPLIT_VAL_LT else "train")
        assert r.split == expect


def test_train_split_proportions():
    """Buckets are ~uniform over a larger id range (pure function, no Ray)."""
    buckets = np.array([CU._md5_u64(f"{CU.SPLIT_SALT}:{i}") % 100
                        for i in range(20000)])
    frac_test = float(np.mean(buckets < CU.SPLIT_TEST_LT))
    frac_val = float(np.mean((buckets >= CU.SPLIT_TEST_LT)
                             & (buckets < CU.SPLIT_VAL_LT)))
    assert 0.005 < frac_test < 0.015
    assert 0.005 < frac_val < 0.015


def test_train_shuffle_head_order_and_seed(corpus_dir):
    h1 = CU.train_shuffle_head(corpus_dir, seed="epoch1", k=5)
    assert list(h1["pos"]) == [1, 2, 3, 4, 5]
    # ordering is by (key_hex, doc_id)
    assert list(h1["key_hex"]) == sorted(h1["key_hex"])
    # key is the documented md5 prefix
    for _, r in h1.iterrows():
        assert r.key_hex == hashlib.md5(
            f"epoch1:{r.doc_id}".encode()).hexdigest()[:16]
    # a different seed permutes the order
    h2 = CU.train_shuffle_head(corpus_dir, seed="epoch2", k=5)
    assert list(h1["doc_id"]) != list(h2["doc_id"]) or \
        list(h1["key_hex"]) != list(h2["key_hex"])
    # deterministic per seed
    h1b = CU.train_shuffle_head(corpus_dir, seed="epoch1", k=5)
    pd.testing.assert_frame_equal(h1, h1b)


def test_decontaminate_flags_overlap(tmp_path):
    bench_text = " ".join(f"b{i}" for i in range(20))
    # doc 3 is a benchmark doc (DECON_BENCH_DOC_IDS); doc 20 copies a
    # 5-token span of it; doc 21 is clean
    leak = "x y " + " ".join(f"b{i}" for i in range(10, 15)) + " z"
    df = pd.DataFrame({
        "doc_id": [3, 20, 21],
        "lang": ["en"] * 3,
        "text": [bench_text, leak, " ".join(f"c{i}" for i in range(20))],
        "source": ["s"] * 3,
    })
    df.to_parquet(tmp_path / "documents.parquet")
    out = CU.decontaminate(str(tmp_path)).to_pandas().set_index("doc_id")
    assert out.loc[3, "n_matched"] == 18        # all own shingles
    assert out.loc[20, "n_matched"] == 3        # 5-token span -> 3 shingles
    assert 21 not in out.index


def test_pack_sequences_prefix_sum(tmp_path):
    """Distributed bucket prefix-sum == single-pass driver cumsum, with
    doc_ids spanning several buckets (shift 6 -> 64 docs/bucket)."""
    rng = np.random.default_rng(3)
    ids = np.sort(rng.choice(500, size=200, replace=False))
    texts = [" ".join(f"t{i}w{j}" for j in range(rng.integers(1, 40)))
             for i in ids]
    df = pd.DataFrame({"doc_id": ids, "lang": ["en"] * len(ids),
                       "text": texts, "source": ["s"] * len(ids)})
    df.to_parquet(tmp_path / "documents.parquet")
    out = CU.pack_sequences(str(tmp_path)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert list(out["doc_id"]) == list(ids)
    before = out["n_tokens"].cumsum().shift(1, fill_value=0)
    expect = (before // CU.PACK_SEQ_TOKENS).astype(np.int64)
    assert list(out["seq_id"]) == list(expect)
    # seq ids are nondecreasing and start at 0
    assert out["seq_id"].iloc[0] == 0
    assert (out["seq_id"].diff().fillna(0) >= 0).all()


def test_stratified_sample_determinism_and_size(tmp_path):
    df = pd.DataFrame({
        "doc_id": range(40),
        "lang": ["en"] * 40,
        "text": [f"doc {i}" for i in range(40)],
        "source": [f"s{i % 4}" for i in range(40)],
    })
    df.to_parquet(tmp_path / "documents.parquet")
    a = CU.stratified_sample(str(tmp_path), n_per_source=3)
    b = CU.stratified_sample(str(tmp_path), n_per_source=3)
    pd.testing.assert_frame_equal(a, b)
    assert (a.groupby("source").size() == 3).all()
    # keys are the documented md5 prefixes (same salt as train_split)
    for _, r in a.iterrows():
        assert r.skey == hashlib.md5(
            f"{CU.SPLIT_SALT}:{r.doc_id}".encode()).hexdigest()[:16]


def test_source_mix_rates(tmp_path):
    n = 4000
    df = pd.DataFrame({
        "doc_id": range(n),
        "lang": ["en"] * n,
        "text": [f"doc {i}" for i in range(n)],
        "source": ["src0" if i < 2000 else "srcX" for i in range(n)],
    })
    df.to_parquet(tmp_path / "documents.parquet")
    out = CU.source_mix_sample(str(tmp_path)).to_pandas()
    kept = out.groupby("source")["keep"].mean()
    assert kept["src0"] == 1.0                      # rate 1.0 keeps all
    assert abs(kept["srcX"] - CU.MIX_DEFAULT_RATE) < 0.03  # ~10%


def test_perplexity_filter_orders_quality(tmp_path):
    """A doc made of the corpus's dominant bigrams scores lower
    perplexity than a doc of corpus-rare sequences."""
    common = "the cat sat on the mat " * 20
    docs = [common] * 8 + ["zq xv jk wp mn bt dl rs gh fy " * 4]
    df = pd.DataFrame({"doc_id": range(len(docs)), "lang": ["en"] * len(docs),
                       "text": docs, "source": ["s"] * len(docs)})
    df.to_parquet(tmp_path / "documents.parquet")
    out = CU.perplexity_filter(str(tmp_path), threshold=10.0) \
        .to_pandas().set_index("doc_id")
    assert out.loc[0, "ppl"] < out.loc[8, "ppl"]
    # the flag is exactly the threshold predicate
    for _, r in out.iterrows():
        assert r.high_ppl == (1 if r.ppl > 10.0 else 0)
    assert len(out) == 9


def test_llm_corpus_pipeline_invariants(tmp_path):
    """Composition invariants: survivors are curate-keepers, packing is
    a per-split prefix sum, splits follow the hash rule."""
    rng = np.random.default_rng(11)
    rows = []
    for i in range(60):
        n = int(rng.integers(20, 60))
        rows.append((i, "en", " ".join(f"t{i}w{j}" for j in range(n)), "s"))
    # a few docs that must be dropped: wrong lang, short, exact dup
    rows.append((60, "de", " ".join(f"x{j}" for j in range(30)), "s"))
    rows.append((61, "en", "too short", "s"))
    rows.append((62, "en", rows[0][2], "s"))   # dup of doc 0
    df = pd.DataFrame(rows, columns=["doc_id", "lang", "text", "source"])
    df.to_parquet(tmp_path / "documents.parquet")
    # disable the LM gate (the synthetic unique-token vocab makes every
    # doc "high perplexity"); the gate itself is covered by
    # test_perplexity_filter_orders_quality and the oracle
    out = CU.llm_corpus_pipeline(str(tmp_path), ppl_threshold=1e9) \
        .to_pandas().sort_values(["split", "doc_id"]).reset_index(drop=True)
    assert not {60, 61, 62} & set(out["doc_id"])
    # benchmark docs 3/7/11 are decontaminated out
    assert not {3, 7, 11} & set(out["doc_id"])
    cur = CU.corpus_curate(str(tmp_path)).to_pandas()
    keepers = set(cur[cur.status == "keep"].doc_id)
    assert set(out["doc_id"]) <= keepers
    # per-split prefix-sum check
    for _, g in out.groupby("split"):
        g = g.sort_values("doc_id").reset_index(drop=True)
        before = g["n_tokens"].cumsum().shift(1, fill_value=0)
        assert list(g["seq_id"]) == list(
            (before // CU.PACK_SEQ_TOKENS).astype(np.int64))
    # split rule matches train_split's hash assignment
    sp = CU.train_split(str(tmp_path)).to_pandas().set_index("doc_id")["split"]
    for _, r in out.iterrows():
        assert r.split == sp[r.doc_id]
