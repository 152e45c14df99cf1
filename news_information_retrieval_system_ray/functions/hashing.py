"""Content hashing, SimHash, MinHash and fingerprint kernels.

Reference semantics reproduced:

- ``content_hash``: MD5 over ``f"{title}\\n{content}"`` (here: over the
  document text; /root/reference/src/ir/index/doc_reader.py:70-91).
- ``simhash64``: 64-bit SimHash over lowercased whitespace tokens with
  MD5 token hashes, duplicate iff Hamming distance <= 3
  (/root/reference/src/ir/index/deduplication.py:85-169).
- MinHash / LSH banding is our scale replacement for the reference's
  O(M) SimHash linear scan — the reference itself notes banding as the
  scalable option (deduplication.py:238-248).

All per-token hashing is memoized (vocabularies are tiny relative to
token streams) and per-document math is vectorized NumPy.
"""

from __future__ import annotations

import hashlib
from functools import lru_cache

import numpy as np


def md5_hex(text: str) -> str:
    return hashlib.md5(text.encode("utf-8")).hexdigest()


def content_hash(title: str, content: str) -> str:
    """MD5(title + '\\n' + content) (doc_reader.py:70-91)."""
    return md5_hex(f"{title}\n{content}")


def dedup_hash(title: str, url: str) -> str:
    """App-level dedup key MD5(strip-lower(title) || '||' ||
    strip-lower(url)) (data_contract.py:80-89 compute_dedup_hash)."""
    return md5_hex(f"{(title or '').strip().lower()}||{(url or '').strip().lower()}")


@lru_cache(maxsize=1 << 20)
def token_hash64(token: str) -> int:
    """Stable 64-bit token hash (first 8 bytes of MD5, big-endian)."""
    return int.from_bytes(hashlib.md5(token.encode("utf-8")).digest()[:8], "big")


@lru_cache(maxsize=1 << 20)
def token_hash_pair(token: str) -> tuple[int, int]:
    """(token_hash64, token_hash64_alt) from ONE md5 digest — the
    collision-check pass hashes every per-batch-unique term twice
    otherwise."""
    d = hashlib.md5(token.encode("utf-8")).digest()
    return int.from_bytes(d[:8], "big"), int.from_bytes(d[8:16], "big")


@lru_cache(maxsize=1 << 20)
def token_hash64_alt(token: str) -> int:
    """Independent second 64-bit hash (LAST 8 bytes of the same MD5).

    Used by the build's collision check: two distinct terms colliding on
    ``token_hash64`` AND on this alt hash has probability ~2^-128 per
    pair — the check compares int64s only, so no term strings ever enter
    the check shuffle."""
    return int.from_bytes(hashlib.md5(token.encode("utf-8")).digest()[8:16], "big")


def _token_hashes(tokens: list[str]) -> np.ndarray:
    return np.fromiter((token_hash64(t) for t in tokens), dtype=np.uint64, count=len(tokens))


def simhash64(tokens: list[str]) -> int:
    """64-bit SimHash (deduplication.py:85-140 semantics: MD5 token hash,
    +1/-1 bit votes weighted by term frequency, sign -> bit)."""
    if not tokens:
        return 0
    uniq, counts = np.unique(_token_hashes(tokens), return_counts=True)
    bits = np.unpackbits(uniq.view(np.uint8).reshape(-1, 8)[:, ::-1], axis=1)  # (n, 64) MSB-first
    votes = ((bits.astype(np.int64) * 2) - 1) * counts[:, None]
    sums = votes.sum(axis=0)
    out = 0
    for s in sums:  # 64 iterations
        out = (out << 1) | (1 if s > 0 else 0)
    return out


def simhash64_batch(th: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Vectorized :func:`simhash64` over a flattened per-doc token-hash
    stream (uint64 hashes concatenated doc-major + per-doc counts).

    Identical bit-for-bit: tf-weighted votes over unique tokens equal
    the plain sum of per-OCCURRENCE votes, so no per-doc unique is
    needed — one unpackbits + one segmented reduce for the whole batch.
    Empty docs get signature 0 (simhash64's no-token contract)."""
    lens = np.asarray(lens, dtype=np.int64)
    n = lens.size
    sums = np.zeros((n, 64), dtype=np.int64)
    if th.size:
        th = np.ascontiguousarray(th, dtype=np.uint64)
        bits = np.unpackbits(
            th.view(np.uint8).reshape(-1, 8)[:, ::-1], axis=1).astype(np.int64)
        votes = bits * 2 - 1
        ne = lens > 0
        starts = (np.concatenate(([0], np.cumsum(lens)))[:-1])[ne]
        # nonempty docs' token ranges tile the stream, so consecutive
        # nonempty starts are exactly the reduceat segment boundaries
        sums[ne] = np.add.reduceat(votes, starts, axis=0)
    packed = np.packbits(sums > 0, axis=1)  # MSB-first bytes
    return packed[:, ::-1].copy().view(np.uint64).reshape(-1)


def hamming64(a: int, b: int) -> int:
    return int(bin(a ^ b).count("1"))


def simhash_bands(sig: int, n_bands: int = 4) -> list[int]:
    """Split a 64-bit simhash into ``n_bands`` equal bit-bands (LSH keys).

    Two signatures within Hamming distance (n_bands - 1) share at least
    one identical band (pigeonhole), so 4 bands cover the reference's
    Hamming<=3 duplicate criterion exactly.
    """
    width = 64 // n_bands
    mask = (1 << width) - 1
    return [(sig >> (width * i)) & mask for i in range(n_bands)]


# Shingle-hash combiner: Horner polynomial over per-token MD5 hashes,
# h(t1..tm) = ((h(t1)*K + h(t2))*K + ... + h(tm)) mod 2^64 with the odd
# golden-ratio multiplier.  Replaces md5(" ".join(shingle)) — same
# injective-up-to-2^-64 identity, but computable as ONE vectorized pass
# over a flattened token-hash stream (no per-shingle string joins, no
# per-shingle MD5).  The DuckDB oracles replay this exact polynomial.
SHINGLE_K = np.uint64(0x9E3779B97F4A7C15)


def shingle_hashes_flat(th: np.ndarray, lens: np.ndarray,
                        n: int = 3) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized word-n-gram shingle hashes over a flattened per-doc
    token-hash stream.

    ``th``: uint64 token hashes of every doc concatenated doc-major;
    ``lens``: per-doc token counts.  Returns ``(hashes, counts)`` where
    ``hashes`` holds each doc's shingle hashes flattened doc-major and
    ``counts`` the per-doc shingle counts.  Docs shorter than ``n``
    contribute ONE shingle (the Horner fold of all their tokens),
    empty docs contribute none — the same semantics the old
    join-then-md5 path had.  No per-doc unique: MinHash mins are
    duplicate-invariant; set callers (``shingles``) uniquify themselves.
    """
    lens = np.asarray(lens, dtype=np.int64)
    th = np.ascontiguousarray(th, dtype=np.uint64)
    k = SHINGLE_K
    counts = np.where(lens >= n, lens - n + 1, (lens > 0).astype(np.int64))
    total = int(counts.sum())
    out = np.empty(total, dtype=np.uint64)
    if total == 0:
        return out, counts
    is_long = lens >= n
    slot_long = np.repeat(is_long, counts)
    nwin = th.size - n + 1
    if nwin > 0 and is_long.any():
        with np.errstate(over="ignore"):
            h = th[:nwin] * k + th[1:nwin + 1]
            for j in range(2, n):
                h = h * k + th[j:nwin + j]
        # windows crossing a doc boundary are invalid; same-doc test via
        # the window's first/last token doc ids
        doc_of = np.repeat(np.arange(lens.size, dtype=np.int64), lens)
        valid = doc_of[:nwin] == doc_of[n - 1:]
        out[slot_long] = h[valid]
    shorts = np.flatnonzero((lens > 0) & ~is_long)
    if shorts.size:
        starts = np.concatenate(([0], np.cumsum(lens)))[:-1]
        s0, sl = starts[shorts], lens[shorts]
        fold = th[s0].copy()
        with np.errstate(over="ignore"):
            for j in range(1, n - 1):
                m = sl > j
                fold[m] = fold[m] * k + th[s0[m] + j]
        out[~slot_long] = fold  # shorts ascend by doc, one slot each
    return out, counts


def shingles(tokens: list[str], n: int = 3) -> np.ndarray:
    """Hashed word n-gram shingle set (sorted unique uint64)."""
    if not tokens:
        return np.empty(0, dtype=np.uint64)
    h, _ = shingle_hashes_flat(
        _token_hashes(tokens), np.array([len(tokens)], dtype=np.int64), n)
    return np.unique(h)


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    """Jaccard similarity of two sorted-unique uint64 shingle sets."""
    if a.size == 0 and b.size == 0:
        return 1.0
    inter = np.intersect1d(a, b, assume_unique=True).size
    union = a.size + b.size - inter
    return inter / union if union else 0.0


class MinHasher:
    """k-permutation MinHash over hashed shingles.

    Each permutation is ``x -> a*x + b (mod 2^64)`` with *odd* ``a`` —
    an exact bijection of the 64-bit space (multiplicative hashing), so
    elementwise-min signatures are valid MinHash sketches.  Coefficients
    come from a seeded generator — deterministic across processes and
    cluster sizes.  Signatures are mergeable (elementwise min), so
    per-batch partial signatures combine in a reduce stage.
    """

    def __init__(self, num_perm: int = 128, seed: int = 1729):
        rng = np.random.default_rng(seed)
        self.num_perm = num_perm
        self.a = rng.integers(1, 1 << 63, size=num_perm, dtype=np.uint64) | np.uint64(1)
        self.b = rng.integers(0, 1 << 63, size=num_perm, dtype=np.uint64)

    def signature(self, shingle_hashes: np.ndarray) -> np.ndarray:
        """(num_perm,) uint64 signature; all-max for empty input."""
        if shingle_hashes.size == 0:
            return np.full(self.num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
        x = shingle_hashes.astype(np.uint64)[None, :]
        with np.errstate(over="ignore"):
            hv = self.a[:, None] * x + self.b[:, None]  # uint64 wrap == mod 2^64
        return hv.min(axis=1)

    def band_keys(self, sig: np.ndarray, n_bands: int = 16) -> list[tuple[int, int]]:
        """[(band_id, band_hash)] LSH keys; r = num_perm // n_bands rows/band."""
        r = self.num_perm // n_bands
        keys = []
        for i in range(n_bands):
            band = sig[i * r : (i + 1) * r]
            h = hashlib.md5(band.tobytes()).digest()[:8]
            keys.append((i, int.from_bytes(h, "big")))
        return keys


def estimate_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    return float(np.mean(sig_a == sig_b))


def winnow_fingerprints(tokens: list[str], k: int = 5, window: int = 4) -> np.ndarray:
    """Document fingerprint via winnowing (Schleimer et al. 2003): rolling
    k-gram hashes, keep the min in each sliding window -> sorted unique."""
    if len(tokens) < k:
        base = np.fromiter((token_hash64(" ".join(tokens)),), dtype=np.uint64) if tokens else np.empty(0, np.uint64)
        return base
    hs = np.fromiter(
        (token_hash64(" ".join(tokens[i : i + k])) for i in range(len(tokens) - k + 1)),
        dtype=np.uint64,
    )
    if hs.size <= window:
        return np.unique(hs.min(keepdims=True))
    from numpy.lib.stride_tricks import sliding_window_view

    mins = sliding_window_view(hs, window).min(axis=1)
    return np.unique(mins)
