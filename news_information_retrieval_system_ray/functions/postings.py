"""Block-compressed posting-list layout.

Replaces the reference's in-heap ``Dict[term, List[(doc_id, tf)]]``
(/root/reference/src/ir/index/inverted_index.py:45-59) with a columnar,
shardable layout: postings are split into fixed-size blocks; within a
block doc_ids are delta-encoded (first value absolute) + VByte, tfs and
doc_lens VByte.  Every block is self-contained, so posting lists built
for disjoint doc-id chunks (the skew-splitting shuffle, SURVEY §7.5)
merge by plain concatenation — no re-encode.

Per-block metadata (``block_last_doc``, ``block_max_tf``,
``block_min_dl``) enables block-max WAND skipping: the upper bound is
``weight(max_tf, min_dl)`` exactly as the reference computes term upper
bounds (query_optimization.py:164-189, ``score(max_tf, min_doc_len)``),
held per block.  Storing raw (tf, dl) extremes instead of a precomputed
weight keeps segment files independent of global stats (avgdl) — the
bound is evaluated at query-load time.

Storing doc_len inline with each posting makes query scoring
self-contained (no doc-id -> length sidecar lookup at 10^12-doc scale).
"""

from __future__ import annotations

import numpy as np

from .codecs import vbyte_decode, vbyte_encode, vbyte_encode_with_lengths, vbyte_lengths

BLOCK_SIZE = 32

# Number of Pareto cover pairs per block (tighter WAND bounds, below).
BOUND_PAIRS = 4
_DL_PAD = (1 << 31) - 1  # "no posting" dl sentinel (weight contribution ~0)

PACKED_FIELDS = (
    "df", "cf", "docs_bytes", "tfs_bytes", "dls_bytes",
    "block_doc_nbytes", "block_tf_nbytes", "block_dl_nbytes",
    "block_len", "block_last_doc", "block_max_tf", "block_min_dl",
    "block_bound_tf", "block_bound_dl",
)


def _pareto_bound_pairs(tfs: np.ndarray, dls: np.ndarray, starts: np.ndarray,
                        block_size: int, s_pairs: int = BOUND_PAIRS
                        ) -> tuple[np.ndarray, np.ndarray]:
    """Per-block (tf, dl) cover pairs for tight block-max bounds.

    The classic single pair (max_tf, min_dl) combines extremes of two
    DIFFERENT postings and is far looser than the block's true best
    score.  Instead store up to ``s_pairs`` pairs covering the block's
    Pareto front in (tf desc, dl asc): every posting is dominated
    (tf' >= tf, dl' <= dl) by some stored pair, so
    ``max_j w(tf_j, dl_j)`` upper-bounds any monotone BM25-style weight
    for ANY (k1, b, avgdl) — the bound stays parameter-free like the
    reference's score(max_tf, min_doc_len) bound
    (query_optimization.py:164-189) but is near-exact (random-order
    blocks have expected front size ~ln(block_size) <= s_pairs).
    Fully vectorized across blocks: pad to a (n_blocks, block_size)
    matrix, per-row sort by a composite (-tf, dl) int64 key, segmented
    running-min for the front, then scatter max/min into front chunks.
    Returns flattened (n_blocks * s_pairs) arrays padded with
    (tf=0, dl=_DL_PAD) — zero-weight, harmless in the max.
    """
    n = tfs.size
    nb = starts.size
    pad = nb * block_size - n
    tfp = np.concatenate([tfs, np.zeros(pad, np.int64)]).reshape(nb, block_size)
    dlp = np.concatenate([dls, np.full(pad, _DL_PAD, np.int64)]).reshape(nb, block_size)
    return _pareto_from_matrices(tfp, dlp, s_pairs)


def _pareto_bound_pairs_gather(tfs: np.ndarray, dls: np.ndarray,
                               bstarts: np.ndarray, bends: np.ndarray,
                               block_size: int, s_pairs: int = BOUND_PAIRS
                               ) -> tuple[np.ndarray, np.ndarray]:
    """``_pareto_bound_pairs`` for NON-contiguous blocks (the multi-run
    packer: interior groups end in partial blocks, so the flat-reshape
    trick does not apply).  Gathers each block's postings into the
    (n_blocks, block_size) matrix by fancy indexing; int32 matrices
    (tf/dl fit) to halve the memory traffic of this bandwidth-bound
    stage."""
    idx = bstarts[:, None] + np.arange(block_size, dtype=np.int64)[None, :]
    valid = idx < bends[:, None]
    idx = np.minimum(idx, tfs.size - 1)
    tfp = np.where(valid, tfs[idx], 0).astype(np.int32, copy=False)
    dlp = np.where(valid, dls[idx], _DL_PAD).astype(np.int32, copy=False)
    return _pareto_from_matrices(tfp, dlp, s_pairs)


def _pareto_from_matrices(tfp: np.ndarray, dlp: np.ndarray,
                          s_pairs: int = BOUND_PAIRS
                          ) -> tuple[np.ndarray, np.ndarray]:
    """Works on int32 or int64 matrices; padding entries must carry
    (tf=0, dl=_DL_PAD) so they sort last and never enter the front."""
    nb = tfp.shape[0]
    # tf desc primary, dl asc secondary (tf,dl < 2^31 -> composite int64)
    key = (-(tfp.astype(np.int64)) << 32) + dlp
    o = np.argsort(key, axis=1, kind="stable")
    tfs_s = np.take_along_axis(tfp, o, 1)
    dls_s = np.take_along_axis(dlp, o, 1)
    cm = np.minimum.accumulate(dls_s, axis=1)
    sentinel = np.iinfo(dlp.dtype).max  # > any real dl; == _DL_PAD for int32
    prev = np.concatenate(
        [np.full((nb, 1), sentinel, dtype=dls_s.dtype), cm[:, :-1]], axis=1)
    front = dls_s < prev  # strictly-improving dl along descending tf
    k_front = front.sum(axis=1)  # >=1 (first sorted element is always front)
    rank = np.cumsum(front, axis=1, dtype=np.int32) - 1
    rows, cols = np.nonzero(front)
    chunk = (rank[rows, cols].astype(np.int64) * s_pairs) // k_front[rows]
    idx = rows * s_pairs + chunk
    btf = np.zeros(nb * s_pairs, dtype=tfp.dtype)
    bdl = np.full(nb * s_pairs, _DL_PAD, dtype=dlp.dtype)
    np.maximum.at(btf, idx, tfs_s[rows, cols])
    np.minimum.at(bdl, idx, dls_s[rows, cols])
    return btf, bdl


def pack_postings(doc_ids: np.ndarray, tfs: np.ndarray, dls: np.ndarray,
                  block_size: int = BLOCK_SIZE) -> dict:
    """Encode one (chunk of a) posting list sorted by doc_id.

    Fully vectorized single-pass encode: deltas are computed with an
    absolute reset at every block start, the whole stream is VByte-encoded
    in ONE call, and per-block byte offsets come from per-value encoded
    lengths via ``np.add.reduceat`` — no per-block Python loop (this stage
    dominates segment-build CPU at scale).  Returns a dict of the
    PACKED_FIELDS columns (term not included).
    """
    doc_ids = np.ascontiguousarray(doc_ids, dtype=np.int64)
    tfs = np.ascontiguousarray(tfs, dtype=np.int64)
    dls = np.ascontiguousarray(dls, dtype=np.int64)
    n = doc_ids.size
    if n == 0:
        return {
            "df": 0, "cf": 0, "docs_bytes": b"", "tfs_bytes": b"", "dls_bytes": b"",
            "block_doc_nbytes": [], "block_tf_nbytes": [], "block_dl_nbytes": [],
            "block_len": [], "block_last_doc": [], "block_max_tf": [], "block_min_dl": [],
            "block_bound_tf": [], "block_bound_dl": [],
        }
    starts = np.arange(0, n, block_size, dtype=np.int64)
    ends = np.minimum(starts + block_size, n)
    deltas = np.empty(n, dtype=np.uint64)
    deltas[0] = np.uint64(doc_ids[0])
    if n > 1:
        deltas[1:] = np.diff(doc_ids).astype(np.uint64)
    deltas[starts] = doc_ids[starts].astype(np.uint64)  # absolute at block start
    tfs_u = tfs.astype(np.uint64)
    dls_u = dls.astype(np.uint64)
    btf, bdl = _pareto_bound_pairs(tfs, dls, starts, block_size)
    return {
        "df": n,
        "cf": int(tfs.sum()),
        "docs_bytes": vbyte_encode(deltas),
        "tfs_bytes": vbyte_encode(tfs_u),
        "dls_bytes": vbyte_encode(dls_u),
        "block_doc_nbytes": np.add.reduceat(vbyte_lengths(deltas), starts).tolist(),
        "block_tf_nbytes": np.add.reduceat(vbyte_lengths(tfs_u), starts).tolist(),
        "block_dl_nbytes": np.add.reduceat(vbyte_lengths(dls_u), starts).tolist(),
        "block_len": (ends - starts).tolist(),
        "block_last_doc": doc_ids[ends - 1].tolist(),
        "block_max_tf": np.maximum.reduceat(tfs, starts).tolist(),
        "block_min_dl": np.minimum.reduceat(dls, starts).tolist(),
        "block_bound_tf": btf.tolist(),
        "block_bound_dl": bdl.tolist(),
    }


def pack_postings_runs(doc_ids: np.ndarray, tfs: np.ndarray, dls: np.ndarray,
                       group_starts: np.ndarray,
                       block_size: int = BLOCK_SIZE,
                       bounds: bool = True,
                       encode_dls: bool = True,
                       combined: bool = False) -> dict:
    """Pack MANY posting lists in one vectorized pass.

    Input is the concatenation of posting lists ("runs"): within each run
    (``group_starts[i] .. group_starts[i+1]``) doc_ids are sorted
    ascending; runs themselves may be in any order.  This is the
    batched form of :func:`pack_postings` — every delta / VByte /
    reduceat / Pareto-bound computation runs ONCE over the whole batch
    instead of per group, eliminating the per-group dispatch that
    dominates segment-build time at web-scale vocabularies (the
    reference builds its whole index in one heap,
    /root/reference/src/ir/index/inverted_index.py:134-159; our per-group
    form paid Ray+Python overhead per vocab term).

    Returns a dict of numpy arrays / byte blobs:
      per-group : df, cf (int64); docs_off/tfs_off/dls_off int64 byte
                  offsets (len n_groups+1) into docs_all/tfs_all/dls_all;
                  block_off int64 (len n_groups+1) block offsets.
      per-block : block_doc_nbytes, block_tf_nbytes, block_dl_nbytes,
                  block_len (int32), block_last_doc (int64),
                  block_max_tf, block_min_dl (int32),
                  and flattened bound pairs (block_off * BOUND_PAIRS
                  indexes them): block_bound_tf, block_bound_dl (int32).

    ``bounds=False`` packs shuffle FRAGMENTS (PrePackTokens): only the
    streams + block_len are emitted — the WAND metadata (Pareto bound
    pairs, per-block extremes, per-block byte counts) is the dominant
    pack cost and RepackFragments recomputes it from the decoded
    streams anyway, so computing or shipping it pre-sort is pure waste.

    ``encode_dls=False`` skips the dls VByte stream entirely (the
    doc-length-sidecar layout: every term's postings duplicating its
    docs' lengths is ~1/3 of posting-stream bytes both in the exchange
    and on disk; lengths live ONCE in the tokens table instead and are
    gathered at query/metadata time).  ``dls`` is still consumed for
    the block metadata when ``bounds=True``.

    ``combined=True`` merges the doc-delta and tf streams into ONE
    VByte stream (the "dt" layout): each value is
    ``(delta << 2) | min(tf - 1, 3)``, with ``tf >= 4`` spilling
    ``tf - 4`` to a small escape stream (per-block offsets via
    ``block_esc_nbytes``).  Webtext tfs are overwhelmingly 1-3, so the
    tf stream's ~1 byte/posting collapses into the delta's spare bits
    — measured −35% stream bytes on the bench pages corpus on top of
    the dls cut.  Returns ``dt_all/esc_all`` + ``dt_off/esc_off``
    (and per-block ``block_dt_nbytes/block_esc_nbytes`` when
    ``bounds``) instead of the docs/tfs pairs.
    """
    ids = np.ascontiguousarray(doc_ids, dtype=np.int64)
    tfs = np.ascontiguousarray(tfs)   # int32 in the explode schema; any
    dls = np.ascontiguousarray(dls)   # int dtype works (reduceat w/ dtype)
    gs = np.ascontiguousarray(group_starts, dtype=np.int64)
    n = ids.size
    ng = gs.size
    ge = np.append(gs[1:], n)
    glens = ge - gs
    nb = -(-glens // block_size)  # ceil: blocks per group (>=1, runs nonempty)
    block_off = np.concatenate(([0], np.cumsum(nb)))
    tot_blocks = int(block_off[-1])
    rep_g = np.repeat(np.arange(ng), nb)
    within = np.arange(tot_blocks, dtype=np.int64) - block_off[rep_g]
    bstarts = gs[rep_g] + within * block_size
    bends = np.minimum(bstarts + block_size, ge[rep_g])

    deltas = np.empty(n, dtype=np.uint64)
    deltas[0] = np.uint64(ids[0])
    if n > 1:
        # run-boundary diffs may be negative; they wrap here and are then
        # overwritten by the absolute reset (every run start IS a block start)
        deltas[1:] = np.diff(ids).astype(np.uint64)
    deltas[bstarts] = ids[bstarts].astype(np.uint64)
    # tf/dl are < 2^31 by schema -> the uint32 encode path (same wire
    # format, half the traffic; this stage is memory-bandwidth bound)
    def _off(lens: np.ndarray) -> np.ndarray:
        per_group = np.add.reduceat(lens, gs, dtype=np.int64)
        return np.concatenate(([0], np.cumsum(per_group)))

    r = {
        "df": glens,
        "cf": np.add.reduceat(tfs, gs, dtype=np.int64),
        "block_off": block_off,
        "block_len": (bends - bstarts).astype(np.int32),
    }
    if combined:
        tfs64 = tfs.astype(np.uint64, copy=False)
        field = np.minimum(tfs64 - 1, np.uint64(3))
        dt = (deltas << np.uint64(2)) | field
        dt_all, dt_len = vbyte_encode_with_lengths(dt)
        esc_mask = field == 3
        esc_vals = (tfs64[esc_mask] - np.uint64(4)).astype(np.uint32)
        esc_all, esc_len_nz = vbyte_encode_with_lengths(esc_vals)
        # scatter escape byte-lengths back to posting positions so the
        # same reduceat machinery yields per-group / per-block offsets
        esc_len = np.zeros(n, dtype=esc_len_nz.dtype if esc_len_nz.size
                           else np.int64)
        if esc_vals.size:
            esc_len[esc_mask] = esc_len_nz
        r.update({
            "dt_all": dt_all,
            "esc_all": esc_all,
            "dt_off": _off(dt_len),
            "esc_off": _off(esc_len),
        })
        d_len = t_len = None
    else:
        docs_all, d_len = vbyte_encode_with_lengths(deltas)
        tfs_all, t_len = vbyte_encode_with_lengths(tfs.astype(np.uint32, copy=False))
        r.update({
            "docs_all": docs_all,
            "tfs_all": tfs_all,
            "docs_off": _off(d_len),
            "tfs_off": _off(t_len),
        })
    if encode_dls:
        dls_all, l_len = vbyte_encode_with_lengths(dls.astype(np.uint32, copy=False))
        r["dls_all"] = dls_all
        r["dls_off"] = _off(l_len)
    if bounds:
        btf, bdl = _pareto_bound_pairs_gather(tfs, dls, bstarts, bends, block_size)
        r.update({
            "block_last_doc": ids[bends - 1],
            "block_max_tf": np.maximum.reduceat(tfs, bstarts).astype(np.int32, copy=False),
            "block_min_dl": np.minimum.reduceat(dls, bstarts).astype(np.int32, copy=False),
            "block_bound_tf": btf.astype(np.int32, copy=False),
            "block_bound_dl": bdl.astype(np.int32, copy=False),
        })
        if combined:
            r["block_dt_nbytes"] = np.add.reduceat(dt_len, bstarts, dtype=np.int32)
            r["block_esc_nbytes"] = np.add.reduceat(esc_len, bstarts, dtype=np.int32)
        else:
            r["block_doc_nbytes"] = np.add.reduceat(d_len, bstarts, dtype=np.int32)
            r["block_tf_nbytes"] = np.add.reduceat(t_len, bstarts, dtype=np.int32)
        if encode_dls:
            r["block_dl_nbytes"] = np.add.reduceat(l_len, bstarts, dtype=np.int32)
    return r


class DocLenLookup:
    """doc_id -> doc_len gather table (the doc-length sidecar).

    The sidecar layout stores each doc's length ONCE (the tokens table's
    (doc_id, doc_len) columns) instead of repeating it in every term's
    posting stream.  Dense fast path: when ids form a contiguous range
    [base, base+n) the lookup is a direct index; otherwise a
    searchsorted over the sorted id array.  At 10^12-doc scale this
    table is chunk-sharded (repack tasks / serving shards load only
    their doc-id ranges — ids are chunk-partitioned by construction);
    in-sandbox it is one numpy pair (~6 bytes/doc) broadcast once via
    ``ray.put``.
    """

    def __init__(self, ids: np.ndarray, dls: np.ndarray):
        ids = np.asarray(ids, dtype=np.int64)
        dls = np.asarray(dls)
        order = np.argsort(ids, kind="stable")
        ids, dls = ids[order], dls[order]
        self.dense = bool(ids.size) and int(ids[-1]) - int(ids[0]) + 1 == ids.size
        self.base = int(ids[0]) if ids.size else 0
        self.ids = ids
        self.dls = dls.astype(np.int32, copy=False)

    def __call__(self, ids: np.ndarray) -> np.ndarray:
        ids = np.asarray(ids, dtype=np.int64)
        if self.dense:
            # same membership guard as the sparse path: an id below base
            # would otherwise wrap to a NEGATIVE index and silently
            # return another doc's length
            off = ids - self.base
            bad = (off < 0) | (off >= self.dls.size)
            if bad.any():
                missing = ids[bad][:5].tolist()
                raise KeyError(
                    f"doc_ids absent from doc-length sidecar (first "
                    f"{len(missing)}): {missing} — postings and tokens "
                    "tables disagree")
            return self.dls[off]
        idx = np.searchsorted(self.ids, ids)
        # membership check: a doc_id absent from the sidecar must be a
        # loud error, not a silent neighboring doc's length (which would
        # corrupt BM25 scores undetected if postings/tokens disagree)
        if self.ids.size == 0:
            bad = np.ones(ids.shape, dtype=bool)
        else:
            bad = (idx >= self.ids.size) \
                | (self.ids[np.minimum(idx, self.ids.size - 1)] != ids)
        if bad.any():
            missing = ids[bad][:5].tolist()
            raise KeyError(
                f"doc_ids absent from doc-length sidecar (first {len(missing)}): "
                f"{missing} — postings and tokens tables disagree")
        return self.dls[idx]


def merge_packed(chunks: list[dict]) -> dict:
    """Concatenate packed chunks with disjoint, increasing doc-id ranges.

    Chunks must be ordered by their doc-id range (the chunked groupby
    emits them keyed by ``doc_id >> CHUNK_BITS``, so sorting by first
    block_last_doc is sufficient).  Blocks are self-contained, so the
    merge is pure byte/list concatenation (SURVEY §7.5 skew handling).
    """
    if len(chunks) == 1:
        return chunks[0]
    # chunks[0] decides field presence below; a mix of stream layouts
    # (dt vs split vs inline-dls) would silently DROP later chunks'
    # stream bytes, so refuse it loudly (append_index's base-layout
    # detection should make this unreachable — this is the backstop)
    stream_fields = ("docs_bytes", "tfs_bytes", "dls_bytes",
                     "dt_bytes", "esc_bytes", "positions_bytes")
    sig0 = {f for f in stream_fields if f in chunks[0]}
    for i, c in enumerate(chunks[1:], 1):
        sig = {f for f in stream_fields if f in c}
        if sig != sig0:
            raise ValueError(
                f"merge_packed: mixed stream layouts in one term's chunks "
                f"(chunk 0 has {sorted(sig0)}, chunk {i} has {sorted(sig)})")
    out = {}
    for f in ("df", "cf"):  # absent on dt FRAGMENT rows (df = block sums)
        if f in chunks[0]:
            out[f] = sum(c[f] for c in chunks)
    for f in ("docs_bytes", "tfs_bytes", "dls_bytes", "dt_bytes", "esc_bytes"):
        if f in chunks[0]:  # layout-dependent streams (split / dt / inline-dl)
            out[f] = b"".join(c[f] for c in chunks)
    for f in ("block_doc_nbytes", "block_tf_nbytes", "block_dl_nbytes",
              "block_dt_nbytes", "block_esc_nbytes",
              "block_len", "block_last_doc", "block_max_tf", "block_min_dl",
              "block_bound_tf", "block_bound_dl"):
        if f not in chunks[0]:
            continue
        acc: list = []
        for c in chunks:
            acc.extend(c[f])
        out[f] = acc
    if "positions_bytes" in chunks[0]:
        out["positions_bytes"] = b"".join(c["positions_bytes"] for c in chunks)
        pos_nb: list = []
        for c in chunks:
            pos_nb.extend(c["pos_nbytes"])
        out["pos_nbytes"] = pos_nb
    return out


def unpack_postings(row: dict) -> tuple[np.ndarray, np.ndarray, np.ndarray | None]:
    """Decode a packed posting row -> (doc_ids int64, tfs int64, dls).

    One-shot vectorized decode: the concatenated VByte streams are
    self-delimiting, so each of docs/tfs/dls decodes in a single call;
    per-block absolute resets in the delta stream are undone with a
    segmented cumsum (global cumsum minus the pre-block base, broadcast
    by ``np.repeat``) — no per-block Python loop.

    In the doc-length-sidecar layout (no ``dls_bytes`` in the row) the
    third element is ``None`` — callers gather lengths from the sidecar
    by doc id (query.IndexSearcher._dl_of).  The "dt" layout (combined
    delta+tf stream, see pack_postings_runs ``combined=True``) decodes
    through the same interface."""
    block_len = np.asarray(row["block_len"], dtype=np.int64)
    if block_len.size == 0:
        e = np.empty(0, dtype=np.int64)
        return e, e.copy(), e.copy()
    if row.get("dt_bytes") is not None:
        deltas, tfs = decode_dt(row["dt_bytes"], row.get("esc_bytes") or b"")
    else:
        deltas = vbyte_decode(row["docs_bytes"]).astype(np.int64)
        tfs = vbyte_decode(row["tfs_bytes"]).astype(np.int64)
    dls = vbyte_decode(row["dls_bytes"]).astype(np.int64) \
        if row.get("dls_bytes") is not None else None
    starts = np.concatenate(([0], np.cumsum(block_len)[:-1]))
    tot = np.cumsum(deltas)
    base = tot[starts] - deltas[starts]  # delta sum preceding each block
    ids = tot - np.repeat(base, block_len)
    return ids, tfs, dls


def decode_dt(dt_bytes, esc_bytes) -> tuple[np.ndarray, np.ndarray]:
    """Combined dt stream -> (doc deltas int64, tfs int64).

    Each value is ``(delta << 2) | min(tf - 1, 3)``; field 3 spills the
    remainder ``tf - 4`` to the escape stream (escapes appear in
    posting order, so one boolean gather re-aligns them)."""
    vals = vbyte_decode(dt_bytes)
    deltas = (vals >> np.uint64(2)).astype(np.int64)
    field = (vals & np.uint64(3)).astype(np.int64)
    tfs = field + 1
    esc_mask = field == 3
    if esc_mask.any():
        esc = vbyte_decode(esc_bytes).astype(np.int64)
        tfs[esc_mask] = 4 + esc
    return deltas, tfs


def unpack_block(row: dict, i: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode only block ``i`` of a packed posting row (WAND skipping path)."""
    d_off = int(sum(row["block_doc_nbytes"][:i]))
    t_off = int(sum(row["block_tf_nbytes"][:i]))
    l_off = int(sum(row["block_dl_nbytes"][:i]))
    dn = int(row["block_doc_nbytes"][i])
    tn = int(row["block_tf_nbytes"][i])
    ln = int(row["block_dl_nbytes"][i])
    deltas = vbyte_decode(row["docs_bytes"][d_off : d_off + dn])
    ids = np.cumsum(deltas.astype(np.int64))
    tfs = vbyte_decode(row["tfs_bytes"][t_off : t_off + tn]).astype(np.int64)
    dls = vbyte_decode(row["dls_bytes"][l_off : l_off + ln]).astype(np.int64)
    return ids, tfs, dls
