"""Posting-list construction stages: explode + per-group pack.

The reference accumulates ``temp_index[term][doc_id] += 1`` in one heap
(/root/reference/src/ir/index/inverted_index.py:134-159).  Here the same
reduction is a shuffle: tokens explode to one row per (doc, term) and a
``groupby([term_hash, chunk])`` builds each posting-list chunk.

``chunk = doc_id >> chunk_bits`` is the explicit skew split (SURVEY
§7.5): a stopword-class term with df ≈ N never lands in a single task —
each of its chunks packs at most ``2^chunk_bits`` postings, and chunks
concatenate block-wise at query time (blocks are self-contained).

Grouping on the 64-bit ``term_hash`` (not the term string) makes the
sort shuffle compare ints; the packer still splits defensively by term
string inside a group in case of a hash collision.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.codecs import vbyte_encode, vbyte_encode_with_lengths
from ..functions.hashing import token_hash64, token_hash_pair
from ..functions.postings import BOUND_PAIRS, pack_postings, pack_postings_runs

DEFAULT_CHUNK_BITS = 20  # 1M docs per chunk; tests use smaller


class ExplodeTokens:
    """(doc_id, doc_len, terms, tfs[, positions]) -> one row per (doc, term).

    Vectorized: Arrow list_flatten for the list columns, np.repeat for
    the per-doc columns. Emits ``term_hash`` (shuffle key) and ``chunk``.
    """

    def __init__(self, chunk_bits: int = DEFAULT_CHUNK_BITS, with_positions: bool = False,
                 emit_term: bool = True, carry_cols: tuple[str, ...] = (),
                 emit_alt: bool = False):
        self.chunk_bits = chunk_bits
        self.with_positions = with_positions
        # emit_term=False drops the term STRING from the shuffle (30%+ of
        # row bytes at web scale) — postings key on the 64-bit hash alone;
        # term strings live in the small vocab sidecar (index_build).
        self.emit_term = emit_term
        # emit_alt: also emit the SECOND 64-bit half of the same MD5 —
        # the collision-check passenger that rides the segments exchange
        # (two distinct terms sharing term_hash must differ in alt,
        # dual collision ~2^-128 per pair).  Free: one MD5 either way.
        self.emit_alt = emit_alt
        self.carry_cols = tuple(carry_cols)  # per-doc facet columns, repeated

    def __call__(self, batch: pa.Table) -> pa.Table:
        terms = batch.column("terms")
        lens = pc.list_value_length(terms).to_numpy(zero_copy_only=False).astype(np.int64)
        flat_terms = pc.list_flatten(terms)
        flat_tfs = pc.list_flatten(batch.column("tfs"))
        doc_ids = np.repeat(batch.column("doc_id").to_numpy(zero_copy_only=False), lens)
        dls = np.repeat(batch.column("doc_len").to_numpy(zero_copy_only=False), lens)
        # hash unique terms only (dictionary encode): token streams are
        # ~10^3x larger than their per-batch vocabulary
        if isinstance(flat_terms, pa.ChunkedArray):
            flat_terms = flat_terms.combine_chunks()
        dict_arr = pc.dictionary_encode(flat_terms)
        idx = dict_arr.indices.to_numpy(zero_copy_only=False)
        n_uniq = len(dict_arr.dictionary)
        if self.emit_alt:
            pairs = np.fromiter(
                (h for t in dict_arr.dictionary.to_pylist()
                 for h in token_hash_pair(t)),
                dtype=np.uint64, count=2 * n_uniq)
            uniq_hashes, uniq_alt = pairs[0::2], pairs[1::2]
        else:
            uniq_hashes = np.fromiter(
                (token_hash64(t) for t in dict_arr.dictionary.to_pylist()),
                dtype=np.uint64, count=n_uniq,
            )
        hashes = uniq_hashes[idx]
        cols = {
            "term_hash": pa.array(hashes),
            "chunk": pa.array((doc_ids >> self.chunk_bits).astype(np.int32)),
            "doc_id": pa.array(doc_ids),
            "tf": flat_tfs,
            "dl": pa.array(dls.astype(np.int32)),
        }
        if self.emit_alt:
            cols["alt"] = pa.array(uniq_alt[idx])
        if self.emit_term:
            cols["term"] = flat_terms
        if self.with_positions:
            cols["positions"] = pc.list_flatten(batch.column("positions"))
        for c in self.carry_cols:
            cols[c] = batch.column(c).take(pa.array(np.repeat(np.arange(len(batch)), lens)))
        return pa.table(cols)


class PackRuns:
    """Pack ALL (term_hash, chunk) runs of a SORTED batch in one pass.

    Input batches come from ``sort(["term_hash", "chunk", "doc_id"])`` —
    each batch is a contiguous key range whose runs are whole posting-list
    chunks, except possibly at batch edges.  A run split across two
    batches packs into one row per fragment; because ``doc_id`` is a sort
    key the fragments' doc ranges are disjoint and increasing, which is
    exactly the contract the query-side merge already supports
    (``query.py`` orders rows by (chunk, first block_last_doc) and
    ``merge_packed`` concatenates — property-tested for arbitrary splits
    in tests/test_postings_bm25.py).

    This replaces ``groupby([term_hash, chunk]).map_groups(PackGroups)``:
    same shuffle, but the pack side runs one vectorized
    :func:`pack_postings_runs` per BATCH instead of a Python dispatch +
    Arrow-table materialization per GROUP — the per-vocab-term overhead
    (~0.5 ms/group) that dominated segment builds on web-scale
    vocabularies.  Output binary/list columns are built zero-copy from
    offset arrays (``pa.Array.from_buffers`` / ``ListArray.from_arrays``).
    """

    def __init__(self, block_size: int = 32, with_positions: bool = False,
                 fmt: str = "classic"):
        """``fmt="dt"`` (positional builds): emit the combined
        delta+tf stream and NO dls stream (doc-length sidecar) — the
        same dt-era byte layout the default build writes — with the
        positional columns alongside.  ``"classic"`` keeps the split
        docs/tfs/dls streams (pre-dt positional bases, appends)."""
        self.block_size = block_size
        self.with_positions = with_positions
        self.fmt = fmt

    def _schema(self, has_alt: bool) -> pa.Schema:
        if self.fmt == "dt":
            return segment_schema_dt(with_alt=has_alt,
                                     with_positions=self.with_positions)
        return PackGroups(self.block_size, self.with_positions)._schema(
            with_term=False, with_alt=has_alt)

    def __call__(self, batch: pa.Table) -> pa.Table:
        has_alt = "alt" in batch.column_names
        schema = self._schema(has_alt)
        n = len(batch)
        if n == 0:
            return schema.empty_table()
        th = batch.column("term_hash").to_numpy(zero_copy_only=False)
        ch = batch.column("chunk").to_numpy(zero_copy_only=False).astype(np.int64)
        gs = np.concatenate(([0], np.flatnonzero(
            (np.diff(th.view(np.int64)) != 0) | (np.diff(ch) != 0)) + 1))
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        tfs = batch.column("tf").to_numpy(zero_copy_only=False)
        dls = batch.column("dl").to_numpy(zero_copy_only=False)
        alt_v = batch.column("alt").to_numpy(zero_copy_only=False) \
            if has_alt else None
        if self.with_positions:
            # per-posting position lists flatten zero-copy into ONE
            # delta+VByte pass inside _packed_runs_table (this was the
            # positional layout's per-run Python loop — the dt-era
            # parity item)
            pos = batch.column("positions")
            if isinstance(pos, pa.ChunkedArray):
                pos = pos.combine_chunks()
            po = pos.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
            po = po - po[0]
            pv = pos.flatten().to_numpy(zero_copy_only=False)
            return _packed_runs_table(th, ch, ids, tfs, dls, gs, schema,
                                      block_size=self.block_size, alt=alt_v,
                                      pos_values=pv, pos_offsets=po)
        return _packed_runs_table(th, ch, ids, tfs, dls, gs, schema,
                                  block_size=self.block_size, alt=alt_v)


def _packed_runs_table(th: np.ndarray, ch: np.ndarray, ids: np.ndarray,
                       tfs: np.ndarray, dls: np.ndarray, gs: np.ndarray,
                       schema: pa.Schema, *, block_size: int,
                       alt: np.ndarray | None = None,
                       pos_values: np.ndarray | None = None,
                       pos_offsets: np.ndarray | None = None) -> pa.Table:
    """Vectorized pack of sorted runs -> one Arrow table following
    ``schema`` (zero-copy binary/list columns from offset arrays).
    Only the columns the schema names are computed: the FRAGMENT schema
    (PrePackTokens) skips the whole WAND metadata family — the dominant
    pack cost — which RepackFragments re-derives post-sort.  ``alt``
    (aligned with ``th``) adds the collision-check passenger column.
    ``pos_values``/``pos_offsets`` (flattened per-posting position
    lists + int64 posting offsets, len n+1) drive the positional
    columns: per-posting delta+VByte encoding runs ONCE over the whole
    flattened stream — bit-identical to the old per-posting loop, since
    VByte is value-independent and concatenation-associative."""
    names = {f.name for f in schema}
    if alt is not None and ids.size > 1:
        # within-run alt uniformity: two distinct terms colliding on
        # term_hash interleave inside one (term_hash, chunk) run and
        # would otherwise pack silently into one row — the post-write
        # _verify_alt_sorted only sees the packed row's single alt
        changes = np.flatnonzero(np.diff(alt.view(np.int64)) != 0) + 1
        bad = np.setdiff1d(changes, gs)
        if bad.size:
            i = int(bad[0])
            raise ValueError(
                "64-bit term-hash collision detected (two distinct terms "
                f"share term_hash {int(th[i])} within one packed run)")
    r = pack_postings_runs(ids, tfs, dls, gs, block_size=block_size,
                           bounds="block_bound_tf" in names,
                           encode_dls="dls_bytes" in names,
                           combined="dt_bytes" in names)
    ng = gs.size
    n = ids.size
    if "positions_bytes" in names:
        pv = np.ascontiguousarray(pos_values, dtype=np.int64)
        po = np.ascontiguousarray(pos_offsets, dtype=np.int64)
        plens = np.diff(po)
        if pv.size:
            # positions arrive ascending per posting from the tokenizer;
            # verify in O(n) and lexsort only if some posting is not
            # (matches the old path's defensive sorted(pl))
            d = np.diff(pv)
            starts_mask = np.zeros(pv.size, dtype=bool)
            starts_mask[po[:-1][plens > 0]] = True
            if not (d >= 0)[~starts_mask[1:]].all():
                post_id = np.repeat(np.arange(n, dtype=np.int64), plens)
                pv = pv[np.lexsort((pv, post_id))]
            deltas = np.empty(pv.size, dtype=np.uint64)
            deltas[0] = np.uint64(pv[0])
            if pv.size > 1:
                deltas[1:] = np.diff(pv).astype(np.uint64)
            ne_starts = po[:-1][plens > 0]
            deltas[ne_starts] = pv[ne_starts].astype(np.uint64)
            pos_all, pos_len = vbyte_encode_with_lengths(deltas)
        else:
            pos_all, pos_len = b"", np.empty(0, dtype=np.int32)
        bytecum = np.concatenate(([0], np.cumsum(pos_len, dtype=np.int64)))
        per_post = (bytecum[po[1:]] - bytecum[po[:-1]]).astype(np.int32)
        run_post_off = np.append(gs, n)  # posting offsets per run (ng+1)
        pos_run_off = bytecum[po[run_post_off]]

    def _binary(blob: bytes, off: np.ndarray) -> pa.Array:
        if off[-1] < (1 << 31):
            return pa.Array.from_buffers(
                pa.binary(), ng,
                [None, pa.py_buffer(off.astype(np.int32).tobytes()),
                 pa.py_buffer(blob)])
        mv = memoryview(blob)  # >2 GiB batch: plain slicing fallback
        return pa.array([bytes(mv[off[i]:off[i + 1]]) for i in range(ng)],
                        pa.binary())

    boff = pa.array(r["block_off"].astype(np.int32))
    poff = pa.array((r["block_off"] * BOUND_PAIRS).astype(np.int32))

    def _blist(vals: np.ndarray, offsets=boff) -> pa.Array:
        return pa.ListArray.from_arrays(offsets, pa.array(vals))

    builders = {
        "term_hash": lambda: pa.array(th[gs]),
        "chunk": lambda: pa.array(ch[gs].astype(np.int32)),
        "first_doc": lambda: pa.array(ids[gs].astype(np.int64)),
        "df": lambda: pa.array(r["df"]),
        "cf": lambda: pa.array(r["cf"]),
        "docs_bytes": lambda: _binary(r["docs_all"], r["docs_off"]),
        "tfs_bytes": lambda: _binary(r["tfs_all"], r["tfs_off"]),
        "dls_bytes": lambda: _binary(r["dls_all"], r["dls_off"]),
        "dt_bytes": lambda: _binary(r["dt_all"], r["dt_off"]),
        "esc_bytes": lambda: _binary(r["esc_all"], r["esc_off"]),
        "block_doc_nbytes": lambda: _blist(r["block_doc_nbytes"]),
        "block_tf_nbytes": lambda: _blist(r["block_tf_nbytes"]),
        "block_dl_nbytes": lambda: _blist(r["block_dl_nbytes"]),
        "block_dt_nbytes": lambda: _blist(r["block_dt_nbytes"]),
        "block_esc_nbytes": lambda: _blist(r["block_esc_nbytes"]),
        "block_len": lambda: _blist(r["block_len"]),
        "block_last_doc": lambda: _blist(r["block_last_doc"]),
        "block_max_tf": lambda: _blist(r["block_max_tf"]),
        "block_min_dl": lambda: _blist(r["block_min_dl"]),
        "block_bound_tf": lambda: _blist(r["block_bound_tf"], poff),
        "block_bound_dl": lambda: _blist(r["block_bound_dl"], poff),
        "positions_bytes": lambda: _binary(pos_all, pos_run_off),
        "pos_nbytes": lambda: pa.ListArray.from_arrays(
            pa.array(run_post_off.astype(np.int32)), pa.array(per_post)),
        "alt": lambda: pa.array(alt[gs]),
    }
    return pa.table({f.name: builders[f.name]().cast(f.type) for f in schema})


def fragment_schema(with_alt: bool = True, fmt: str = "dt") -> pa.Schema:
    """The pre-sort shuffle-FRAGMENT schema (PrePackTokens output): sort
    keys + raw streams + block_len — everything RepackFragments actually
    reads, and nothing else.  Dropping the WAND metadata (bound pairs,
    per-block extremes/byte counts, cf) cuts ~40% of exchange row bytes
    and ~60% of the map-side pack CPU; Repack re-derives it all from the
    decoded streams for the final segments.

    Formats (``fmt``):
    - ``"dt"`` (default): ONE combined (delta<<2 | tf-field) stream +
      tiny escape stream (pack_postings_runs ``combined=True`` — −35%
      stream bytes vs split on the bench pages corpus) and NO df
      column (derivable as sum(block_len) per fragment) — the leanest
      exchange; doc lengths live in the sidecar.
    - ``"split"``: separate docs/tfs streams, dl sidecar (the
      intermediate round-3 layout, kept writable for appends).
    - ``"split_dls"``: split streams WITH the inline dls stream (the
      legacy layout; appends to pre-sidecar indexes)."""
    fields = [
        ("term_hash", pa.uint64()),
        ("chunk", pa.int32()),
        ("first_doc", pa.int64()),
    ]
    if fmt == "dt":
        fields += [
            ("dt_bytes", pa.binary()),
            ("esc_bytes", pa.binary()),
        ]
    else:
        fields += [
            ("df", pa.int64()),
            ("docs_bytes", pa.binary()),
            ("tfs_bytes", pa.binary()),
            *([("dls_bytes", pa.binary())] if fmt == "split_dls" else []),
        ]
    fields.append(("block_len", pa.list_(pa.int32())))
    if with_alt:
        fields.append(("alt", pa.uint64()))
    return pa.schema(fields)


def segment_schema_dt(with_alt: bool = False,
                      with_positions: bool = False) -> pa.Schema:
    """Final segment schema for the combined-stream ("dt") layout;
    ``with_positions`` adds the positional columns (the dt-era
    positional layout — same byte format, positions alongside)."""
    fields = [
        ("term_hash", pa.uint64()),
        ("chunk", pa.int32()),
        ("first_doc", pa.int64()),
        ("df", pa.int64()),
        ("cf", pa.int64()),
        ("dt_bytes", pa.binary()),
        ("esc_bytes", pa.binary()),
        ("block_dt_nbytes", pa.list_(pa.int32())),
        ("block_esc_nbytes", pa.list_(pa.int32())),
        ("block_len", pa.list_(pa.int32())),
        ("block_last_doc", pa.list_(pa.int64())),
        ("block_max_tf", pa.list_(pa.int32())),
        ("block_min_dl", pa.list_(pa.int32())),
        ("block_bound_tf", pa.list_(pa.int32())),
        ("block_bound_dl", pa.list_(pa.int32())),
    ]
    if with_positions:
        fields += [("positions_bytes", pa.binary()),
                   ("pos_nbytes", pa.list_(pa.int32()))]
    if with_alt:
        fields.append(("alt", pa.uint64()))
    return pa.schema(fields)


class PrePackTokens:
    """Map-side combine for the segments shuffle: explode -> local sort ->
    pack WITHIN each tokens batch, so the wide exchange ships compressed
    posting FRAGMENTS (delta+VByte blocks + block metadata) instead of one
    raw 30-byte row per (doc, term) — ~10x fewer shuffle bytes, and the
    post-shuffle ``sort(["term_hash", "chunk", "first_doc"])`` handles
    ~vocab-size fragment counts instead of token-stream row counts.  The
    sorted output IS the segments table (same schema as :class:`PackRuns`;
    the query side's fragment merge is unchanged).

    Fragment validity: ``merge_packed`` concatenates fragments of one
    (term_hash, chunk) ordered by first doc, which requires fragment
    doc-id INTERVALS to be pairwise disjoint across the whole build.
    Each batch is segmented into maximal contiguous doc-id runs and pack
    groups additionally break on run boundaries: batches partition the
    doc space, so maximal contiguous runs from different batches are
    disjoint as intervals, and so are the fragments inside them.
    """

    def __init__(self, chunk_bits: int = DEFAULT_CHUNK_BITS, block_size: int = 32,
                 emit_alt: bool = True, fmt: str = "dt",
                 band_partitions: int = 0):
        self.block_size = block_size
        # band_partitions > 0: emit chunkband = chunk % P so the
        # segments sort can lead with the band key — repack batches then
        # cover ~one band each and the per-band doc-length slices load
        # lazily per repack actor (index_build banded path)
        self.band_partitions = int(band_partitions)
        # emit_alt (default on): fragments carry the term's SECOND MD5
        # half, so the 64-bit-collision check rides the segments sort as
        # an 8-byte-per-fragment passenger instead of a separate
        # full-corpus scan + two extra exchanges (see index_build
        # _verify_alt_sorted for the post-sort adjacency verification).
        self.emit_alt = emit_alt
        # fmt (fragment_schema docstring): "dt" default — combined
        # delta+tf stream, dl sidecar, no df column; "split"/"split_dls"
        # stay writable for appends to older indexes
        self.fmt = fmt
        self._explode = ExplodeTokens(chunk_bits=chunk_bits, with_positions=False,
                                      emit_term=False, emit_alt=emit_alt)
        self._pack_schema = fragment_schema(with_alt=emit_alt, fmt=fmt)
        self._out_schema = self._pack_schema if not self.band_partitions else \
            self._pack_schema.append(pa.field("chunkband", pa.int32()))

    def __call__(self, batch: pa.Table) -> pa.Table:
        ex = self._explode(batch)
        n = len(ex)
        if n == 0:
            return self._out_schema.empty_table()
        th = ex.column("term_hash").to_numpy(zero_copy_only=False)
        ch = ex.column("chunk").to_numpy(zero_copy_only=False).astype(np.int64)
        ids = ex.column("doc_id").to_numpy(zero_copy_only=False)
        tfs = ex.column("tf").to_numpy(zero_copy_only=False)
        dls = ex.column("dl").to_numpy(zero_copy_only=False)
        # run id per row: maximal contiguous intervals of this batch's docs
        d = np.diff(ids)
        if ids.size < 2 or bool((d >= 0).all()):
            # build path: explode preserves row order and the tokens table
            # is read by ascending doc_id, so ids are nondecreasing —
            # runs are a direct cumsum, and ONE stable argsort on the
            # hash gives the full (th, chunk, run, doc) order for free
            # (chunk = doc>>bits and run index are both monotone in
            # doc_id, so stability supplies the remaining three keys)
            runs = np.concatenate(([0], np.cumsum(d > 1)))
            order = np.argsort(th.view(np.int64), kind="stable")
        else:
            u = np.unique(ids)
            run_of_u = np.concatenate(([0], np.cumsum(np.diff(u) > 1)))
            runs = run_of_u[np.searchsorted(u, ids)]
            order = np.lexsort((ids, runs, ch, th.view(np.int64)))
        th, ch, ids, tfs, dls, runs = (a[order] for a in (th, ch, ids, tfs, dls, runs))
        alt = None
        if self.emit_alt:
            alt = ex.column("alt").to_numpy(zero_copy_only=False)[order]
            _raise_on_alt_mismatch(th, alt)  # in-batch collisions
        gs = np.concatenate(([0], np.flatnonzero(
            (np.diff(th.view(np.int64)) != 0) | (np.diff(ch) != 0)
            | (np.diff(runs) != 0)) + 1))
        out = _packed_runs_table(th, ch, ids, tfs, dls, gs, self._pack_schema,
                                 block_size=self.block_size, alt=alt)
        if self.band_partitions > 0:
            band = (ch[gs] % self.band_partitions).astype(np.int32)
            out = out.append_column("chunkband", pa.array(band))
        return out


def _raise_on_alt_mismatch(th: np.ndarray, alt: np.ndarray) -> None:
    """Raise if any two ADJACENT rows share ``term_hash`` but differ in
    ``alt`` — proof of a 64-bit term-hash collision (rows sorted by
    term_hash, so equal hashes are adjacent)."""
    if th.size < 2:
        return
    bad = (th[1:] == th[:-1]) & (alt[1:] != alt[:-1])
    if bad.any():
        i = int(np.flatnonzero(bad)[0])
        raise ValueError(
            "64-bit term-hash collision detected (two distinct terms share "
            f"term_hash={int(th[i])}); rebuild with a wider key or inspect "
            "with build_vocab=True")


class RepackFragments:
    """Post-shuffle consolidation of :class:`PrePackTokens` fragments.

    Input batches come from ``sort(["term_hash", "chunk", "first_doc"])``
    over pre-packed fragments: each (term_hash, chunk) group's fragments
    are adjacent and interval-ordered, so their decoded doc streams
    concatenate into one ascending posting list.  The whole batch decodes
    in THREE vbyte calls (streams are self-delimiting; per-block absolute
    resets are undone with the same segmented-cumsum trick as
    ``unpack_postings``), then re-packs into optimally-full blocks via
    the shared vectorized packer — restoring the dense block layout (and
    row count ~= vocab x chunks) that block-max WAND pruning relies on,
    at ~1/10 the exchange bytes of shuffling raw (doc, term) rows.
    Groups split at batch edges remain as multiple interval-disjoint
    rows, which the query-side merge already handles.
    """

    def __init__(self, block_size: int = 32, doclens=None,
                 tokens_path: str | None = None, chunk_bits: int | None = None,
                 band_partitions: int = 0):
        self.block_size = block_size
        # doclens: DocLenLookup or a ray.ObjectRef to one — required for
        # sidecar-layout fragments (no dls stream in the exchange): the
        # WAND block metadata (min_dl / Pareto bound pairs) gathers
        # lengths by decoded doc id instead.  Shipped once per task via
        # the object store (zero-copy plasma read) up to ~10^10 docs.
        #
        # BANDED mode (tokens_path + chunk_bits + band_partitions,
        # doclens=None): the 10^12-doc shape — used as an ACTOR pool
        # behind a (chunkband, term_hash, ...) sort, each actor loads
        # only the dl slices of the bands its batches actually touch
        # (cached per actor; batches cover ~one band each), so no node
        # ever holds the global length table.
        self._doclens = doclens
        self._tokens_path = tokens_path
        self._chunk_bits = chunk_bits
        self._band_partitions = int(band_partitions)
        self._band_cache: dict[int, object] = {}

    def _dl_lookup(self):
        import ray

        if isinstance(self._doclens, ray.ObjectRef):
            self._doclens = ray.get(self._doclens)
        return self._doclens

    def _load_band(self, band: int):
        """DocLenLookup over one band's docs only (banded actor mode).
        At true scale the tokens/doclens table is itself written
        band-partitioned so this read touches one directory; here the
        two int columns are read and masked — with files pruned by their
        Parquet footer doc_id min/max stats first, so each band load
        touches only overlapping files instead of re-scanning the whole
        tokens table once per band."""
        import glob
        import os

        import pyarrow.parquet as pq

        from ..functions.postings import DocLenLookup

        files = sorted(glob.glob(
            os.path.join(self._tokens_path, "**", "*.parquet"),
            recursive=True))
        P, bits = self._band_partitions, self._chunk_bits

        def _touches(path: str) -> bool:
            try:
                md = pq.ParquetFile(path).metadata
                i = md.schema.to_arrow_schema().names.index("doc_id")
                lo = hi = None
                for g in range(md.num_row_groups):
                    st = md.row_group(g).column(i).statistics
                    if st is None or not st.has_min_max:
                        return True  # no stats -> must read
                    lo = st.min if lo is None else min(lo, st.min)
                    hi = st.max if hi is None else max(hi, st.max)
                if lo is None:
                    return False  # zero row groups
                c0, c1 = int(lo) >> bits, int(hi) >> bits
                if c1 - c0 + 1 >= P:
                    return True  # chunk range wraps every band
                return any(c % P == band for c in range(c0, c1 + 1))
            except Exception:
                return True  # unreadable footer -> fall back to reading

        hit = [f for f in files if _touches(f)]
        if not hit:
            return DocLenLookup(np.empty(0, np.int64), np.empty(0, np.int32))
        t = pa.concat_tables([pq.read_table(f, columns=["doc_id", "doc_len"])
                              for f in hit])
        ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        dls = t.column("doc_len").to_numpy(zero_copy_only=False)
        m = (ids >> self._chunk_bits) % self._band_partitions == band
        return DocLenLookup(ids[m], dls[m])

    def _dls_of(self, ids: np.ndarray) -> np.ndarray:
        if self._doclens is not None:
            return np.asarray(self._dl_lookup()(ids), dtype=np.int64)
        bands = (ids >> self._chunk_bits) % self._band_partitions
        out = np.empty(ids.size, dtype=np.int64)
        for b in np.unique(bands):
            lk = self._band_cache.get(int(b))
            if lk is None:
                lk = self._band_cache[int(b)] = self._load_band(int(b))
            m = bands == b
            out[m] = lk(ids[m])
        return out

    def _schema_for(self, has_alt: bool, has_dls: bool) -> pa.Schema:
        return PackGroups(self.block_size, False)._schema(
            with_term=False, with_alt=has_alt, with_dls=has_dls)

    def __call__(self, batch: pa.Table) -> pa.Table:
        has_alt = "alt" in batch.column_names
        has_dt = "dt_bytes" in batch.column_names
        has_dls = "dls_bytes" in batch.column_names
        schema = segment_schema_dt(with_alt=has_alt) if has_dt \
            else self._schema_for(has_alt, has_dls)
        nrows = len(batch)
        if nrows == 0:
            return schema.empty_table()
        from ..functions.codecs import vbyte_decode

        def _concat(col: str):
            # zero-copy: a non-null pa.binary() column's values buffer IS
            # the concatenation; slice it by the first/last offsets
            a = batch.column(col)
            if isinstance(a, pa.ChunkedArray):
                a = a.combine_chunks()
            if a.null_count:
                return b"".join(a.to_pylist())
            bufs = a.buffers()
            off = np.frombuffer(bufs[1], dtype=np.int32,
                                count=len(a) + 1, offset=a.offset * 4)
            return memoryview(bufs[2])[int(off[0]):int(off[-1])]

        block_len = pc.list_flatten(batch.column("block_len")) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        if has_dt:
            from ..functions.postings import decode_dt

            deltas, tfs = decode_dt(_concat("dt_bytes"), _concat("esc_bytes"))
        else:
            deltas = vbyte_decode(_concat("docs_bytes")).astype(np.int64)
            tfs = vbyte_decode(_concat("tfs_bytes")).astype(np.int64)
        bstarts = np.concatenate(([0], np.cumsum(block_len)[:-1]))
        tot = np.cumsum(deltas)
        base = tot[bstarts] - deltas[bstarts]
        ids = tot - np.repeat(base, block_len)
        if has_dls:
            dls = vbyte_decode(_concat("dls_bytes")).astype(np.int64)
        else:  # sidecar layout: gather lengths for the block metadata
            dls = self._dls_of(ids)

        th = batch.column("term_hash").to_numpy(zero_copy_only=False)
        ch = batch.column("chunk").to_numpy(zero_copy_only=False).astype(np.int64)
        if "df" in batch.column_names:
            df = batch.column("df").to_numpy(zero_copy_only=False).astype(np.int64)
        else:  # dt fragments: df = per-fragment posting count (block sums)
            ll = pc.list_value_length(batch.column("block_len")) \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            row_starts = np.concatenate(([0], np.cumsum(ll)[:-1]))
            df = np.add.reduceat(block_len, row_starts)
        alt_post = None
        if has_alt:
            alt_rows = batch.column("alt").to_numpy(zero_copy_only=False)
            # input is sorted by term_hash: equal hashes are adjacent, so
            # this catches every within-batch collision (incl. across
            # chunks); batch-boundary pairs are verified post-write by
            # index_build._verify_alt_sorted
            _raise_on_alt_mismatch(th, alt_rows)
            alt_post = np.repeat(alt_rows, df)
        row_breaks = np.concatenate(([0], np.flatnonzero(
            (np.diff(th.view(np.int64)) != 0) | (np.diff(ch) != 0)) + 1))
        post_off = np.concatenate(([0], np.cumsum(df)))
        gs = post_off[row_breaks]
        th_post = np.repeat(th, df)
        ch_post = np.repeat(ch, df)
        return _packed_runs_table(th_post, ch_post, ids, tfs, dls, gs,
                                  schema, block_size=self.block_size,
                                  alt=alt_post)


class PackGroups:
    """groupby([term_hash, chunk]).map_groups body -> one packed posting row.

    Block metadata holds (max_tf, min_dl) extremes; the WAND upper bound
    weight(max_tf, min_dl) (query_optimization.py:164-189) is evaluated
    at query-load time, so packing needs NO global stats.
    """

    def __init__(self, block_size: int = 32, with_positions: bool = False):
        self.block_size = block_size
        self.with_positions = with_positions

    def __call__(self, group: pa.Table) -> pa.Table:
        rows: list[dict] = []
        has_alt = "alt" in group.column_names
        if "term" not in group.column_names:
            # hash-only shuffle: collisions are detected by the alt
            # passenger (post-sort adjacency, index_build
            # _verify_alt_sorted) or at vocab build
            self._pack_one(group, None, rows)
            return pa.Table.from_pylist(
                rows, schema=self._schema(with_term=False, with_alt=has_alt))
        terms = group.column("term").to_pylist()
        # defensively split on term string (hash-collision guard)
        if len(set(terms)) == 1:
            self._pack_one(group, terms[0], rows)
        else:
            by_term: dict[str, list[int]] = {}
            for i, t in enumerate(terms):
                by_term.setdefault(t, []).append(i)
            for t, idx in sorted(by_term.items()):
                self._pack_one(group.take(idx), t, rows)
        return pa.Table.from_pylist(
            rows, schema=self._schema(with_term=True, with_alt=has_alt))

    def _pack_one(self, group: pa.Table, term: str | None, out: list[dict]) -> None:
        doc_ids = group.column("doc_id").to_numpy(zero_copy_only=False)
        tfs = group.column("tf").to_numpy(zero_copy_only=False)
        dls = group.column("dl").to_numpy(zero_copy_only=False)
        order = np.argsort(doc_ids, kind="stable")
        doc_ids, tfs, dls = doc_ids[order], tfs[order], dls[order]
        packed = pack_postings(doc_ids, tfs, dls, block_size=self.block_size)
        row = {
            "term_hash": int(group.column("term_hash")[0].as_py()),
            "chunk": int(group.column("chunk")[0].as_py()),
            "first_doc": int(doc_ids[0]) if doc_ids.size else -1,
            **packed,
        }
        if "alt" in group.column_names:  # collision-check passenger
            alts = group.column("alt").to_numpy(zero_copy_only=False)
            if alts.size and (alts != alts[0]).any():
                raise ValueError(
                    "64-bit term-hash collision detected (two distinct "
                    "terms share one term_hash within a packed group)")
            row["alt"] = int(alts[0])
        if term is not None:
            row["term"] = term
        if self.with_positions:
            pos_lists = [group.column("positions")[int(i)].as_py() for i in order]
            parts, nbytes = [], []
            for pl in pos_lists:
                arr = np.asarray(sorted(pl), dtype=np.int64)
                deltas = np.empty(arr.size, dtype=np.uint64)
                if arr.size:
                    deltas[0] = arr[0]
                    deltas[1:] = np.diff(arr)
                b = vbyte_encode(deltas)
                parts.append(b)
                nbytes.append(len(b))
            row["positions_bytes"] = b"".join(parts)
            row["pos_nbytes"] = nbytes
        out.append(row)

    def _schema(self, with_term: bool = True, with_alt: bool = False,
                with_dls: bool = True) -> pa.Schema:
        fields = [
            *([("term", pa.string())] if with_term else []),
            ("term_hash", pa.uint64()),
            ("chunk", pa.int32()),
            ("first_doc", pa.int64()),
            ("df", pa.int64()),
            ("cf", pa.int64()),
            ("docs_bytes", pa.binary()),
            ("tfs_bytes", pa.binary()),
            *([("dls_bytes", pa.binary())] if with_dls else []),
            ("block_doc_nbytes", pa.list_(pa.int32())),
            ("block_tf_nbytes", pa.list_(pa.int32())),
            *([("block_dl_nbytes", pa.list_(pa.int32()))] if with_dls else []),
            ("block_len", pa.list_(pa.int32())),
            ("block_last_doc", pa.list_(pa.int64())),
            ("block_max_tf", pa.list_(pa.int32())),
            ("block_min_dl", pa.list_(pa.int32())),
            ("block_bound_tf", pa.list_(pa.int32())),
            ("block_bound_dl", pa.list_(pa.int32())),
        ]
        if self.with_positions:
            fields += [("positions_bytes", pa.binary()), ("pos_nbytes", pa.list_(pa.int32()))]
        if with_alt:
            fields += [("alt", pa.uint64())]
        return pa.schema(fields)
