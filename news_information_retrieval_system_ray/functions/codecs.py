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


def vbyte_lengths(values: np.ndarray) -> np.ndarray:
    """Per-value encoded byte count (for computing block offsets without
    encoding block-by-block)."""
    v = np.ascontiguousarray(values, dtype=_U64)
    return np.searchsorted(_THRESHOLDS, v, side="right").astype(np.int64) + 1


def vbyte_encode(values: np.ndarray) -> bytes:
    """Encode a 1-D array of non-negative ints to VByte bytes."""
    return vbyte_encode_with_lengths(values)[0]


_THRESHOLDS32 = np.array([1 << (7 * i) for i in range(1, 5)], dtype=np.uint32)


def vbyte_encode_with_lengths(values: np.ndarray) -> tuple[bytes, np.ndarray]:
    """One-pass encode returning (bytes, per-value byte counts int32).

    A ``uint32`` input stays in 32-bit arithmetic throughout (same wire
    format, half the memory traffic of the uint64 path) — the segment
    packer is memory-BANDWIDTH bound under full-node concurrency, so
    touched bytes, not instructions, set its scaling ceiling."""
    v = np.ascontiguousarray(values)
    if v.dtype == np.uint32:
        thresholds: np.ndarray = _THRESHOLDS32
        seven = np.uint32(7)
        mask7 = np.uint32(0x7F)
        cont = np.uint32(0x80)
    else:
        v = np.ascontiguousarray(v, dtype=_U64)
        thresholds = _THRESHOLDS
        seven = _U64(7)
        mask7 = _U64(0x7F)
        cont = _U64(0x80)
    if v.size == 0:
        return b"", np.empty(0, dtype=np.int32)
    nbytes = (np.searchsorted(thresholds, v, side="right") + 1).astype(np.int32)
    ends = np.cumsum(nbytes, dtype=np.int64) - 1
    starts = ends - (nbytes - 1)
    out = np.zeros(int(ends[-1]) + 1, dtype=np.uint8)
    max_nb = int(nbytes.max())
    for k in range(max_nb):
        mask = nbytes > k
        sel = v[mask] if k else v  # k=0 selects every value
        st = starts[mask] if k else starts
        out[st + k] = ((sel >> type(seven)(7 * k)) & mask7) | cont
    out[ends] &= 0x7F
    return out.tobytes(), nbytes


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


# ---------------------------------------------------------------------------
# Elias-Gamma / Elias-Delta (reference compression.py:296-639).  Values must
# be >= 1 (the reference raises on 0 — gaps are >= 1 by the delta contract).
# Bit order matches the reference: unary length prefix (N zeros + '1'), then
# the N low-order bits of the value, MSB-first, packed big-endian into bytes.
# Vectorized: the bitstream is assembled per-value into a uint8 bit matrix.
# ---------------------------------------------------------------------------

def _bit_lengths(v: np.ndarray) -> np.ndarray:
    return np.floor(np.log2(v.astype(np.float64))).astype(np.int64) + 1


def _pack_bits(bits: np.ndarray) -> bytes:
    pad = (-bits.size) % 8
    if pad:
        bits = np.concatenate([bits, np.zeros(pad, dtype=np.uint8)])
    return np.packbits(bits).tobytes()


def _values_to_bits(v: np.ndarray, nbits: np.ndarray) -> np.ndarray:
    """Concatenate, per value, its ``nbits`` low-order bits MSB-first."""
    total = int(nbits.sum())
    out = np.zeros(total, dtype=np.uint8)
    ends = np.cumsum(nbits)
    starts = ends - nbits
    # position j within a value's field holds bit (nbits-1-j)
    idx = np.arange(total, dtype=np.int64)
    grp = np.searchsorted(ends, idx, side="right")
    j = idx - starts[grp]
    shift = (nbits[grp] - 1 - j).astype(np.uint64)
    out[:] = ((v[grp] >> shift) & _U64(1)).astype(np.uint8)
    return out


def gamma_encode(values: np.ndarray) -> bytes:
    """Elias-Gamma: unary(len) ++ low (len-1) bits (compression.py:296-458)."""
    v = np.ascontiguousarray(values, dtype=_U64)
    if v.size == 0:
        return b""
    if int(v.min()) < 1:
        raise ValueError("elias-gamma requires values >= 1")
    L = _bit_lengths(v)
    # per value: (L-1) zeros, then the L bits of the value (MSB of value is 1)
    nbits = 2 * L - 1
    total = int(nbits.sum())
    bits = np.zeros(total, dtype=np.uint8)
    ends = np.cumsum(nbits)
    starts = ends - nbits
    val_bits = _values_to_bits(v, L)
    vends = np.cumsum(L)
    vstarts = vends - L
    for i in range(v.size):  # copy value fields (vector ops inside)
        bits[starts[i] + L[i] - 1 : ends[i]] = val_bits[vstarts[i] : vends[i]]
    return _pack_bits(bits)


def gamma_decode(buf: bytes, count: int) -> np.ndarray:
    """Decode ``count`` Elias-Gamma values."""
    if count == 0:
        return np.empty(0, dtype=_U64)
    bits = np.unpackbits(np.frombuffer(buf, dtype=np.uint8))
    out = np.empty(count, dtype=_U64)
    p = 0
    for i in range(count):
        z = 0
        while bits[p] == 0:
            z += 1
            p += 1
        field = bits[p : p + z + 1]
        p += z + 1
        val = 0
        for b in field:
            val = (val << 1) | int(b)
        out[i] = val
    return out


def delta_elias_encode(values: np.ndarray) -> bytes:
    """Elias-Delta: gamma(len) ++ low (len-1) bits (compression.py:492-639)."""
    v = np.ascontiguousarray(values, dtype=_U64)
    if v.size == 0:
        return b""
    if int(v.min()) < 1:
        raise ValueError("elias-delta requires values >= 1")
    L = _bit_lengths(v)
    LL = _bit_lengths(L.astype(_U64))
    nbits = (2 * LL - 1) + (L - 1)
    total = int(nbits.sum())
    bits = np.zeros(total, dtype=np.uint8)
    ends = np.cumsum(nbits)
    starts = ends - nbits
    len_bits = _values_to_bits(L.astype(_U64), LL)
    lends = np.cumsum(LL)
    lstarts = lends - LL
    val_bits = _values_to_bits(v, L)  # includes leading 1 bit; we drop it
    vends = np.cumsum(L)
    vstarts = vends - L
    for i in range(v.size):
        s = starts[i] + LL[i] - 1
        bits[s : s + LL[i]] = len_bits[lstarts[i] : lends[i]]
        bits[s + LL[i] : ends[i]] = val_bits[vstarts[i] + 1 : vends[i]]
    return _pack_bits(bits)


def delta_elias_decode(buf: bytes, count: int) -> np.ndarray:
    """Decode ``count`` Elias-Delta values."""
    if count == 0:
        return np.empty(0, dtype=_U64)
    bits = np.unpackbits(np.frombuffer(buf, dtype=np.uint8))
    out = np.empty(count, dtype=_U64)
    p = 0
    for i in range(count):
        z = 0
        while bits[p] == 0:
            z += 1
            p += 1
        lfield = bits[p : p + z + 1]
        p += z + 1
        L = 0
        for b in lfield:
            L = (L << 1) | int(b)
        val = 1
        for b in bits[p : p + L - 1]:
            val = (val << 1) | int(b)
        p += L - 1
        out[i] = val
    return out
