"""SimHash / MinHash / shingle kernels (reference deduplication.py semantics)."""

import numpy as np

from news_information_retrieval_system_ray.functions.hashing import (
    MinHasher,
    content_hash,
    estimate_jaccard,
    hamming64,
    jaccard,
    md5_hex,
    shingles,
    simhash64,
    simhash_bands,
    winnow_fingerprints,
)


def test_content_hash_matches_md5_of_joined():
    assert content_hash("t", "c") == md5_hex("t\nc")


def test_simhash_identical_docs_equal():
    t = "the quick brown fox jumps over the lazy dog".split()
    assert simhash64(t) == simhash64(list(t))
    assert simhash64([]) == 0


def test_simhash_near_dup_small_distance():
    a = ("word%d" % i for i in range(100))
    a = list(a)
    b = a[:-1] + ["changed"]
    d_near = hamming64(simhash64(a), simhash64(b))
    c = ["totally%d" % i for i in range(100)]
    d_far = hamming64(simhash64(a), simhash64(c))
    assert d_near < d_far
    assert d_near <= 10


def test_simhash_bands_pigeonhole():
    sig = simhash64(["a", "b", "c", "d"])
    # flip 3 bits -> at least one of 4 bands identical
    flipped = sig ^ 0b10110
    assert hamming64(sig, flipped) == 3
    shared = set(enumerate(simhash_bands(sig))) & set(enumerate(simhash_bands(flipped)))
    assert shared


def test_shingles_and_jaccard():
    a = shingles(["a", "b", "c", "d"], n=2)
    b = shingles(["a", "b", "c", "e"], n=2)
    # shingle sets: {ab,bc,cd} vs {ab,bc,ce} -> J = 2/4
    assert jaccard(a, b) == 0.5
    assert jaccard(a, a) == 1.0
    assert jaccard(np.empty(0, np.uint64), np.empty(0, np.uint64)) == 1.0


def test_minhash_estimates_jaccard():
    mh = MinHasher(num_perm=256, seed=7)
    a = shingles([f"tok{i}" for i in range(200)], n=3)
    b = shingles([f"tok{i}" for i in range(150)] + [f"other{i}" for i in range(50)], n=3)
    true_j = jaccard(a, b)
    est = estimate_jaccard(mh.signature(a), mh.signature(b))
    assert abs(est - true_j) < 0.12
    # determinism across instances
    mh2 = MinHasher(num_perm=256, seed=7)
    assert np.array_equal(mh.signature(a), mh2.signature(a))


def test_minhash_band_keys_shape():
    mh = MinHasher(num_perm=128, seed=1)
    keys = mh.band_keys(mh.signature(shingles(list("abcdefgh"), 2)), n_bands=16)
    assert len(keys) == 16
    assert all(isinstance(b, int) and isinstance(h, int) for b, h in keys)


def test_winnow_fingerprints_subset_stability():
    toks = [f"w{i % 37}" for i in range(300)]
    fp1 = winnow_fingerprints(toks, k=5, window=4)
    fp2 = winnow_fingerprints(toks, k=5, window=4)
    assert np.array_equal(fp1, fp2)
    assert fp1.size > 0
    assert winnow_fingerprints(["a"], k=5, window=4).size == 1


# ---------------------------------------------------------------- property

from hypothesis import given, settings
from hypothesis import strategies as st


def _naive_shingle_hashes(token_hashes, n):
    """Reference Horner fold, one posting at a time."""
    from news_information_retrieval_system_ray.functions.hashing import SHINGLE_K

    K = int(SHINGLE_K)
    M = 1 << 64

    def fold(seq):
        h = 0
        for i, t in enumerate(seq):
            h = t if i == 0 else (h * K + t) % M
        return h

    if not token_hashes:
        return []
    if len(token_hashes) < n:
        return [fold(token_hashes)]
    return [fold(token_hashes[i:i + n])
            for i in range(len(token_hashes) - n + 1)]


@given(st.lists(st.lists(st.integers(min_value=0, max_value=2**64 - 1),
                         max_size=20), max_size=12),
       st.integers(min_value=2, max_value=5))
@settings(max_examples=200, deadline=None)
def test_shingle_hashes_flat_matches_naive(docs, n):
    """The one-pass flattened kernel equals the per-doc Horner fold for
    every doc-length mix (empty docs, short docs, window docs)."""
    from news_information_retrieval_system_ray.functions.hashing import (
        shingle_hashes_flat)

    th = np.array([t for d in docs for t in d], dtype=np.uint64)
    lens = np.array([len(d) for d in docs], dtype=np.int64)
    got_h, got_c = shingle_hashes_flat(th, lens, n)
    exp = [_naive_shingle_hashes(d, n) for d in docs]
    assert got_c.tolist() == [len(e) for e in exp]
    assert got_h.tolist() == [h for e in exp for h in e]


@given(st.lists(st.lists(st.text(alphabet="abcdefg", min_size=1, max_size=4),
                         max_size=15), max_size=10))
@settings(max_examples=100, deadline=None)
def test_simhash64_batch_matches_per_doc(docs):
    """The batched unpackbits+reduceat simhash equals the per-doc kernel
    bit for bit, including empty docs (signature 0)."""
    from news_information_retrieval_system_ray.functions.hashing import (
        simhash64, simhash64_batch, token_hash64)

    th = np.array([token_hash64(t) for d in docs for t in d], dtype=np.uint64)
    lens = np.array([len(d) for d in docs], dtype=np.int64)
    got = simhash64_batch(th, lens)
    exp = np.array([simhash64(d) for d in docs], dtype=np.uint64)
    np.testing.assert_array_equal(got, exp)
