"""Integer compression codecs for posting lists.

Semantics follow the reference's compression module
(/root/reference/src/ir/index/compression.py:103-257): VByte is
little-endian base-128 — each byte carries 7 payload bits, least
significant group first; every byte except the last of a value has the
MSB (0x80) continuation bit set.  Delta (gap) encoding requires a
strictly increasing sequence and raises otherwise, matching the
reference's invariant that postings are sorted unique doc_ids.

Implementations are vectorized NumPy (the reference is a per-int Python
loop); encode loops only over byte *positions* (<= 10), decode uses
``np.bitwise_or.reduceat`` over continuation-bit group boundaries.
"""

from __future__ import annotations

import numpy as np

_U64 = np.uint64
# thresholds[i] = smallest value needing > i+1 bytes
_THRESHOLDS = np.array([1 << (7 * i) for i in range(1, 10)], dtype=np.uint64)


def vbyte_encode(values: np.ndarray) -> bytes:
    """Encode a 1-D array of non-negative ints to VByte bytes."""
    v = np.ascontiguousarray(values, dtype=_U64)
    if v.size == 0:
        return b""
    nbytes = np.searchsorted(_THRESHOLDS, v, side="right").astype(np.int64) + 1
    ends = np.cumsum(nbytes) - 1
    starts = ends - (nbytes - 1)
    out = np.zeros(int(ends[-1]) + 1, dtype=np.uint8)
    max_nb = int(nbytes.max())
    for k in range(max_nb):
        mask = nbytes > k
        out[starts[mask] + k] = ((v[mask] >> _U64(7 * k)) & _U64(0x7F)) | _U64(0x80)
    out[ends] &= 0x7F
    return out.tobytes()


def vbyte_decode(buf: bytes | memoryview | np.ndarray) -> np.ndarray:
    """Decode VByte bytes to a uint64 array."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=_U64)
    is_end = (b & 0x80) == 0
    if not is_end[-1]:
        raise ValueError("truncated vbyte stream: last byte has continuation bit")
    val7 = (b & np.uint8(0x7F)).astype(_U64)
    end_idx = np.nonzero(is_end)[0]
    starts = np.empty_like(end_idx)
    starts[0] = 0
    starts[1:] = end_idx[:-1] + 1
    # position of each byte within its value group
    grp = np.cumsum(is_end) - is_end  # group id per byte
    pos = np.arange(b.size, dtype=np.int64) - starts[grp]
    shifted = val7 << (_U64(7) * pos.astype(_U64))
    return np.bitwise_or.reduceat(shifted, starts)


def delta_encode(sorted_ids: np.ndarray) -> np.ndarray:
    """Strictly-increasing ids -> [first, gap, gap, ...] (gaps >= 1).

    Raises ValueError on unsorted/duplicate input, matching the
    reference's gap-encoding contract (compression.py:188-257).
    """
    a = np.ascontiguousarray(sorted_ids, dtype=np.int64)
    if a.size == 0:
        return a.astype(_U64)
    d = np.diff(a)
    if a.size > 1 and d.min() <= 0:
        raise ValueError("delta_encode requires strictly increasing ids")
    out = np.empty(a.size, dtype=_U64)
    out[0] = _U64(a[0])
    out[1:] = d.astype(_U64)
    return out


def delta_decode(gaps: np.ndarray) -> np.ndarray:
    """Inverse of :func:`delta_encode` -> int64 ids."""
    g = np.ascontiguousarray(gaps, dtype=_U64)
    return np.cumsum(g.astype(np.int64))


def encode_sorted_ids(sorted_ids: np.ndarray) -> bytes:
    """delta + vbyte in one call."""
    return vbyte_encode(delta_encode(sorted_ids))


def decode_sorted_ids(buf: bytes) -> np.ndarray:
    return delta_decode(vbyte_decode(buf))
