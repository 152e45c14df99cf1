"""Query engine over built index segments.

Reproduces the reference's query semantics (pinned for parity):

- naive BM25 top-k: candidate union -> score all -> order, with the
  query treated as a plain token list (duplicate query tokens
  contribute multiply — /root/reference/src/ir/retrieval/bm25.py:228-232),
  only docs with score > 0, canonical order (-score, doc_id asc)
  (SURVEY §7.6.2 spec-tightening of the reference's unspecified ties).
- WAND top-k (query_optimization.py:191-346): same contract (exact,
  rank-identical to naive) — here realized as an impact-ordered
  block-range search over block-max metadata (see ``_search_wand``):
  doc-id ranges are pruned wholesale when their metadata upper bound
  falls below the running k-th best score, and pruned ranges of long
  lists are never decoded.
- boolean AND/OR/NOT as sorted-postings merges
  (inverted_index.py:331-449) via numpy set ops.
- phrase matching via the positional index (positional_index.py:92-152):
  intersect docs, then check adjacency on decoded position lists.

The searcher is the query-side stateful actor of SURVEY §2.3: segment
slices load lazily per term (Parquet predicate pushdown on the sorted
``term_hash`` column) and are cached in-process.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow.dataset as pads

from ..functions.bm25 import idf as bm25_idf
from ..functions.bm25 import tf_weight, topk_order
from ..functions.codecs import vbyte_decode
from ..functions.hashing import token_hash64
from ..functions.postings import merge_packed, pack_postings, unpack_postings
from ..functions.tokenize import get_tokenizer
from ..functions.textnorm import normalize_text
from ..state.manifest import read_json

# superset across all three segment layouts (dt / split-sidecar /
# legacy inline-dls); each searcher fetches the intersection with its
# actual segment schema
_PACKED_COLS = [
    "term_hash", "chunk", "df", "cf", "docs_bytes", "tfs_bytes", "dls_bytes",
    "dt_bytes", "esc_bytes",
    "block_doc_nbytes", "block_tf_nbytes", "block_dl_nbytes",
    "block_dt_nbytes", "block_esc_nbytes",
    "block_len", "block_last_doc", "block_max_tf", "block_min_dl",
    "block_bound_tf", "block_bound_dl",
]


class IndexSearcher:
    """Loads one index directory; serves BM25 / boolean / phrase queries."""

    def __init__(self, index_dir: str, k1: float = 1.5, b: float = 0.75, delta: float = 0.0,
                 compact: bool = False, chunks: "frozenset[int] | None" = None):
        """``compact=True`` stores decoded postings as int32 ids +
        float32 base weights — half the per-query memory traffic, the
        standard quantized-impact serving tradeoff (scores differ in the
        last float bits from the exact float64 default, ranks can flip
        on exact ties).  Correctness paths use the default.

        ``chunks`` restricts this searcher to a subset of doc-id chunks
        (``chunk = doc_id >> eff_chunk_bits``): only segment rows for
        those chunks are decoded/cached, so per-term decoded state is
        bounded by the chunk capacity, never by global df.  This is the
        shard unit of doc-sharded serving (pipelines/serve.py) — local
        df then undercounts, so the driver installs global dfs via
        ``df_global`` before scoring."""
        manifest = read_json(os.path.join(index_dir, "manifest.json"))
        if manifest is None or manifest.get("stats") is None:
            raise FileNotFoundError(f"no completed index manifest in {index_dir}")
        self.index_dir = index_dir
        self.config = manifest["config"]
        self.n_docs = manifest["stats"]["n_docs"]
        self.avgdl = manifest["stats"]["avg_doc_length"]
        # legacy-manifest fallback MUST match build_index/ShardedSearcher
        # (is-None checks + max(10, n_docs.bit_length()-3)): a
        # chunk-restricted searcher with a different formula — or a
        # falsy-`or` chain that treats an explicit chunk_bits=0 as
        # missing — would mis-slice the dl sidecar vs the shard
        # assignment
        bits = manifest.get("eff_chunk_bits")
        if bits is None:
            bits = self.config.get("chunk_bits")
        if bits is None:
            bits = max(10, int(self.n_docs).bit_length() - 3)
        self.eff_chunk_bits = int(bits)
        self.k1, self.b, self.delta = k1, b, delta
        self.with_positions = self.config.get("with_positions", False)
        self.tokenize = get_tokenizer(self.config["engine"])
        # query-side stopword filter mirrors the index-time one so query
        # tokens align with what was indexed (stopwords.py:101-137)
        if self.config.get("stopword_lang"):
            from ..functions.stopwords import load_stopwords

            self._stops: frozenset[str] = load_stopwords(self.config["stopword_lang"])
        else:
            self._stops = frozenset()
        self.chunks = None if chunks is None else frozenset(int(c) for c in chunks)
        seg_root = os.path.join(index_dir, "segments")
        band_p = int(self.config.get("chunkband_partitions") or 0)
        if self.chunks is not None and band_p > 0:
            # IO-isolated serving: the chunkband=K hive layout lets a
            # doc shard open ONLY its own bands' files — foreign-chunk
            # bytes never leave storage (serve.py's scale assumption,
            # now real rather than documented)
            import glob as _glob

            owned = {c % band_p for c in self.chunks}
            files = [f for d in sorted(_glob.glob(
                os.path.join(seg_root, "**", "chunkband=*"), recursive=True))
                if int(d.rsplit("=", 1)[1]) in owned
                for f in sorted(_glob.glob(os.path.join(d, "**", "*.parquet"),
                                           recursive=True))]
            # defensive: any UNBANDED files (e.g. an append produced by
            # an older build) must still be visible to every shard —
            # their rows get chunk-filtered at decode like the flat case
            files += [f for f in sorted(_glob.glob(
                os.path.join(seg_root, "**", "*.parquet"), recursive=True))
                if "chunkband=" not in f]
            self._seg = pads.dataset(files if files else seg_root)
        else:
            self._seg = pads.dataset(seg_root)
        # doc-length-sidecar layout: segments without a dls stream; the
        # searcher gathers lengths from the tokens table's (doc_id,
        # doc_len) columns (loaded lazily, chunk-filtered for shards)
        seg_names = set(self._seg.schema.names)
        self.has_dls = "dls_bytes" in seg_names
        self._fetch_cols = [c for c in _PACKED_COLS if c in seg_names]
        self._dl_table = None
        self._rg_index = None  # lazy row-group sparse index (_ensure_rg_index)
        self._pq_files: dict[str, "object"] = {}
        self._cache: dict[str, dict | None] = {}
        # decoded-postings cache (query-independent: ids + base BM25
        # weights), bounded by total postings so a long-lived searcher
        # actor serving a hot query stream doesn't grow unboundedly
        self._tp: dict[str, _TermPostings | None] = {}
        self._tp_postings = 0
        self._tomb: "np.ndarray | None" = None  # lazy (_tombstones)
        self._tomb_loaded = False
        self._live_ids: "np.ndarray | None" = None  # lazy (live_doc_ids)
        self.max_cached_postings = 20_000_000
        self.compact = compact
        # global term -> df overrides (doc-sharded serving: idf must use
        # the GLOBAL df even though this searcher decodes only its chunks)
        self.df_global: dict[str, int] = {}

    # ------------------------------------------------------------------ IO
    def _ensure_rg_index(self) -> None:
        """Build the in-memory sparse index over segment row groups:
        (file, row_group, term_hash min/max) from Parquet footer
        statistics only — one footer read per file, no data pages.
        Segments are term_hash-sorted with small row groups
        (index_build writes row_group_size=2048), so a term's postings
        live in 1-2 row groups; a fetch reads exactly those.  This is
        the per-segment skip-list a searcher node would hold at
        10^12-doc scale (~24 bytes per 2048 posting rows)."""
        if self._rg_index is not None:
            return
        import pyarrow.parquet as pq

        files, rgs, mins, maxs = [], [], [], []
        for fi, path in enumerate(sorted(self._seg.files)):
            pf = pq.ParquetFile(path)
            self._pq_files[path] = pf
            md = pf.metadata
            ci = md.schema.to_arrow_schema().names.index("term_hash")
            for g in range(md.num_row_groups):
                st = md.row_group(g).column(ci).statistics
                if st is None or not st.has_min_max:  # stats absent: scan-all fallback
                    self._rg_index = ()
                    return
                files.append(fi)
                rgs.append(g)
                mins.append(st.min)
                maxs.append(st.max)
        order = np.argsort(np.asarray(mins, dtype=np.uint64), kind="stable")
        maxs_sorted = np.asarray(maxs, dtype=np.uint64)[order]
        self._rg_index = (
            [sorted(self._seg.files)[i] for i in np.asarray(files)[order]],
            np.asarray(rgs, dtype=np.int32)[order],
            np.asarray(mins, dtype=np.uint64)[order],
            maxs_sorted,
            # prefix running max of maxs: the left-walk in _read_hash can
            # stop as soon as NO group at or left of i can contain h
            np.maximum.accumulate(maxs_sorted),
        )

    def _read_hash(self, h: "np.uint64", cols: list[str]):
        """Rows for one term_hash, reading only the row groups whose
        footer min/max straddle it; None when no group can contain it."""
        import pyarrow.compute as pc

        self._ensure_rg_index()
        if self._rg_index == ():  # no stats: planner-side pushdown fallback
            return self._seg.to_table(columns=cols,
                                      filter=(pads.field("term_hash") == h))
        paths, rgs, mins, maxs, pmax = self._rg_index
        lo = int(np.searchsorted(mins, h, side="right"))
        out = []
        # candidate groups: min <= h <= max.  mins is sorted, so all
        # candidates are left of ``lo``; stop as soon as the prefix
        # running-max of maxs falls below h (then nothing further left
        # can contain it).  Disjoint ranges -> 1-2 steps; appended
        # segments overlap the base range and just add their own step.
        i = lo - 1
        while i >= 0 and pmax[i] >= h:
            if maxs[i] >= h:
                t = self._pq_files[paths[i]].read_row_group(int(rgs[i]), columns=cols)
                mask = pc.equal(t.column("term_hash"), h)
                if pc.any(mask).as_py():
                    out.append(t.filter(mask))
            i -= 1
        if not out:
            return None
        import pyarrow as pa

        return pa.concat_tables(out)

    def _fetch_terms(self, terms: list[str]) -> None:
        missing = [t for t in dict.fromkeys(terms) if t not in self._cache]
        if not missing:
            return
        import pyarrow as pa

        hash_of = {t: token_hash64(t) for t in missing}
        cols = list(self._fetch_cols)
        if self.with_positions:
            cols += ["positions_bytes", "pos_nbytes"]
        # one EQUALITY-filtered scan per hash: pyarrow pushes `==` down to
        # parquet row-group statistics (segments are term_hash-sorted with
        # small row groups), while `isin`/or-chains skip stats pruning and
        # decode every row group's binary columns (~20x slower cold fetch)
        parts = [self._read_hash(np.uint64(h), cols)
                 for h in dict.fromkeys(hash_of.values())]
        parts = [p for p in parts if p is not None]
        tbl = pa.concat_tables(parts) if parts else None
        if tbl is None:
            for t in missing:
                self._cache[t] = None
            return
        # segments key on the 64-bit hash (the term string never enters the
        # shuffle); the query term's own hash is the lookup key
        rows_by_hash: dict[int, list[dict]] = {}
        for row in tbl.to_pylist():
            rows_by_hash.setdefault(int(row["term_hash"]), []).append(row)
        for t in missing:
            rows = rows_by_hash.get(hash_of[t])
            if rows and self.chunks is not None:
                # shard restriction: decode only owned chunks.  (The row
                # FETCH above still reads whole term_hash row groups —
                # the scale layout partitions segment files by chunk
                # range so each shard node reads only its own files; see
                # pipelines/serve.py docstring for the assumption.)
                rows = [r for r in rows if int(r["chunk"]) in self.chunks]
            if not rows:
                self._cache[t] = None
                continue
            # order by doc-id range: chunk id, then first block's last doc
            # (append builds can emit two rows for one chunk — base +
            # appended docs — whose ranges are disjoint and increasing)
            rows.sort(key=lambda r: (r["chunk"],
                                     r["block_last_doc"][0] if r["block_last_doc"] else -1))
            merged = merge_packed(rows)
            # block coalescing on load: the map-side pre-pack build ships
            # posting FRAGMENTS whose tail blocks are short; concatenation
            # keeps them short, which multiplies block-max WAND's per-block
            # bookkeeping.  Re-encode once into dense blocks (cached, so
            # the warm serving path never pays it again).  Skip positional
            # rows: positions_bytes is aligned to the original blocks.
            if len(rows) > 1 and "positions_bytes" not in merged:
                ids, tfs, dls = unpack_postings(merged)
                if dls is None:  # sidecar layout: gather once, re-encode
                    dls = self._dl_of(ids).astype(np.int64)
                merged = pack_postings(ids, tfs, dls)
            self._cache[t] = merged

    def _dl_of(self, ids: np.ndarray) -> np.ndarray:
        """doc_id -> doc_len gather from the sidecar (tokens table).

        Loaded once per searcher, chunk-filtered when this searcher is
        a doc shard — so a shard's resident length table is bounded by
        its chunk capacity, exactly like its decoded postings.  At
        10^12-doc scale this is the per-chunk slice of a doc-stats
        table co-partitioned with the segments."""
        if self._dl_table is None:
            import glob

            import pyarrow as pa
            import pyarrow.parquet as pq

            from ..functions.postings import DocLenLookup

            files = sorted(glob.glob(os.path.join(self.index_dir, "tokens",
                                                  "**", "*.parquet"),
                           recursive=True))
            t = pa.concat_tables([pq.read_table(f, columns=["doc_id", "doc_len"])
                                  for f in files])
            ids_a = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
            dls_a = t.column("doc_len").to_numpy(zero_copy_only=False)
            if self.chunks is not None:
                mask = np.isin(ids_a >> self.eff_chunk_bits,
                               np.fromiter(self.chunks, dtype=np.int64,
                                           count=len(self.chunks)))
                ids_a, dls_a = ids_a[mask], dls_a[mask]
            self._dl_table = DocLenLookup(ids_a, dls_a)
        return self._dl_table(ids)

    def postings(self, term: str) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(doc_ids, tfs, dls) for one term; empty arrays if absent.
        Tombstoned docs are filtered (boolean/OR/NOT thus never see
        them)."""
        tp = self._term(term)
        if tp is None:
            e = np.empty(0, dtype=np.int64)
            return e, e.copy(), e.copy()
        ids, tfs, dls, _ = tp.full()
        m = self._live_mask(ids)
        if m is not None:
            ids, tfs = ids[m], tfs[m]
            if dls is not None:
                dls = dls[m]
        return ids, tfs, dls

    # -------------------------------------------------------- tombstones
    @property
    def _tombstones(self) -> "np.ndarray | None":
        """Sorted deleted doc_ids (deletes/*.parquet sidecar), loaded
        once; ``None`` when the index has no deletions.  Chunk-restricted
        searchers keep only their own chunks' tombstones.  See
        ``index_build.delete_docs`` for the liveness semantics (global
        stats keep build-time values until a rebuild, Lucene-style)."""
        if not self._tomb_loaded:
            self._tomb_loaded = True
            import glob

            import pyarrow.parquet as pq

            files = sorted(glob.glob(
                os.path.join(self.index_dir, "deletes", "*.parquet")))
            if files:
                d = np.unique(np.concatenate([
                    pq.read_table(f, columns=["doc_id"]).column("doc_id")
                    .to_numpy(zero_copy_only=False) for f in files]
                )).astype(np.int64)
                if self.chunks is not None and d.size:
                    cm = np.isin(d >> self.eff_chunk_bits,
                                 np.fromiter(self.chunks, dtype=np.int64,
                                             count=len(self.chunks)))
                    d = d[cm]
                self._tomb = d if d.size else None
        return self._tomb

    def _live_mask(self, ids: np.ndarray) -> "np.ndarray | None":
        """Boolean mask of NOT-tombstoned ids; None = no deletions (the
        zero-cost fast path)."""
        t = self._tombstones
        if t is None or ids.size == 0:
            return None
        idx = np.searchsorted(t, ids)
        hit = (idx < t.size) & (t[np.minimum(idx, t.size - 1)] == ids)
        return ~hit if hit.any() else None

    def _term(self, term: str) -> "_TermPostings | None":
        """Cached query-independent decoded state for one term."""
        tp = self._tp.get(term)
        if tp is None and term not in self._tp:
            self._fetch_terms([term])
            row = self._cache[term]
            tp = None if row is None else _TermPostings(
                row, self.avgdl, self.k1, self.b, compact=self.compact,
                dl_of=None if "dls_bytes" in row else self._dl_of)
            if tp is not None:
                if self._tp_postings + tp.df > self.max_cached_postings and self._tp:
                    # evict the least-recently-inserted HALF (dict order);
                    # clear-all caused full re-decode thrash on cycling
                    # query streams
                    drop = max(1, len(self._tp) // 2)
                    for key in list(self._tp)[:drop]:
                        old = self._tp.pop(key)
                        if old is not None:
                            self._tp_postings -= old.df
                    self._tp_postings = max(0, self._tp_postings)
                self._tp_postings += tp.df
            self._tp[term] = tp
        return tp

    def refresh(self) -> None:
        """NRT refresh: re-open the index, picking up segments appended,
        compactions run and tombstones written since this searcher
        loaded.  Drops every cache — equivalent to constructing a new
        searcher with the same parameters (the cheap-reopen granularity
        a streaming ingest loop needs between flushes)."""
        self.__init__(self.index_dir, k1=self.k1, b=self.b,
                      delta=self.delta, compact=self.compact,
                      chunks=self.chunks)

    def df(self, term: str) -> int:
        self._fetch_terms([term])
        row = self._cache[term]
        return 0 if row is None else int(row["df"])

    # ------------------------------------------------------------- scoring
    def _query_terms(self, query: str) -> list[str]:
        toks = self.tokenize(normalize_text(query))
        if self._stops:
            toks = [t for t in toks if t not in self._stops]
        return toks

    def search(self, query: str, k: int = 10, method: str = "naive",
               expand_synonyms: bool = False) -> list[tuple[int, float]]:
        """Top-k (doc_id, BM25 score), canonical order.

        ``expand_synonyms`` applies the reference's query-side synonym
        map (text_quality.py:90-177) before scoring.

        ``method="auto"`` dispatches per query between WAND and the
        exhaustive kernel from block metadata alone (both are exact and
        rank-identical, so the dispatch only affects latency): WAND's
        range pruning can fire only when block upper bounds VARY — if
        the weighted typical (median) bound is within 10% of the
        weighted max bound, no range can fall usefully below theta and
        WAND's range-partition overhead is pure loss, so score
        exhaustively instead."""
        q_tokens = self._query_terms(query)
        if expand_synonyms:
            from ..functions.synonyms import expand_terms

            q_tokens = expand_terms(q_tokens)
        if not q_tokens:
            return []
        if method == "auto":
            tw = self._term_weights(q_tokens)
            if not tw:
                return []
            method = "wand" if self._wand_prunable(tw) else "naive"
        if method == "wand":
            return self._search_wand(q_tokens, k)
        if method == "maxscore":
            return self._search_maxscore(q_tokens, k)
        return self._search_naive(q_tokens, k)

    def _wand_prunable(self, tw: list[tuple[str, float]]) -> bool:
        """Metadata-only WAND-pays-off test for method="auto"."""
        hi = typ = 0.0
        for t, w in tw:
            tp = self._term(t)
            if tp is None or tp.n_blocks == 0:
                continue
            hi += w * tp.max_base_ub
            typ += w * tp.med_base_ub
        return hi > 0.0 and typ < 0.9 * hi

    def _term_weights(self, q_tokens: list[str]) -> list[tuple[str, float]]:
        """Unique terms with qtf * idf weight (duplicates contribute multiply)."""
        qtf: dict[str, int] = {}
        for t in q_tokens:
            qtf[t] = qtf.get(t, 0) + 1
        self._fetch_terms(list(qtf))
        out = []
        for t, n in qtf.items():
            tp = self._term(t)
            df = self.df_global.get(t)
            if df is None:
                if tp is None:
                    continue
                df = tp.df
            if tp is None or df <= 0:
                continue
            out.append((t, n * float(bm25_idf(df, self.n_docs))))
        return out

    def _search_naive(self, q_tokens: list[str], k: int) -> list[tuple[int, float]]:
        tw = self._term_weights(q_tokens)
        if not tw:
            return []
        return self._score_exhaustive(tw, k)

    def search_weighted(self, tw: list[tuple[str, float]], k: int = 10,
                        method: str = "wand",
                        theta0: float = float("-inf")) -> list[tuple[int, float]]:
        """Top-k over EXPLICIT (term, weight) pairs — the doc-sharded
        serving entry (pipelines/serve.py): the driver computes weights
        once from GLOBAL dfs and broadcasts them, so every shard scores
        with identical per-term factors and per-doc float sums are
        bit-identical to the single-searcher's (a doc's postings live
        wholly in one chunk).

        ``theta0`` seeds WAND's running k-th-best score: docs whose
        range upper bound falls below it are pruned without decoding —
        sound for the global merge because such docs cannot enter the
        global top-k (theta0 must be a score actually achieved by k
        docs elsewhere)."""
        self._fetch_terms([t for t, _ in tw])  # one batched segment fetch
        tw = [(t, w) for t, w in tw if self._term(t) is not None]
        if not tw:
            return []
        if method == "auto":
            method = "wand" if self._wand_prunable(tw) else "naive"
        if method == "wand":
            return self._search_wand_tw(tw, k, theta0=theta0)
        return self._score_exhaustive(tw, k)

    def _agg_topk(self, ids: np.ndarray, contrib: np.ndarray, k: int
                  ) -> list[tuple[int, float]]:
        """Per-doc score aggregation + canonical top-k.

        When doc ids are dense (the deterministic-assignment index:
        0..N-1), sums go through one direct ``bincount`` over the id
        range — O(n), no sort — and only the docs at/above the k-th
        score enter the canonical (-score, doc_id) ordering.  Sparse /
        external ids fall back to unique+bincount."""
        if ids.size == 0:
            return []
        hi = int(ids.max()) + 1
        if hi <= max(self.n_docs + 1, 4 * ids.size):
            scores = np.bincount(ids, weights=contrib, minlength=hi)
            if scores.size > k:
                cut = np.partition(scores, scores.size - k)[scores.size - k]
            else:
                cut = 0.0
            cand = np.nonzero((scores >= cut) & (scores > 0.0))[0]
            if cand.size < k:  # fewer than k positive scores
                cand = np.nonzero(scores > 0.0)[0]
            cs = scores[cand]
        else:
            uniq, inv = np.unique(ids, return_inverse=True)
            cs_all = np.bincount(inv, weights=contrib, minlength=uniq.size)
            pos = cs_all > 0.0  # reference keeps score>0 only (bm25.py:304)
            cand, cs = uniq[pos], cs_all[pos]
        order = topk_order(cand, cs, k)
        return [(int(cand[i]), float(cs[i])) for i in order]

    def _score_exhaustive(self, tw: list[tuple[str, float]], k: int) -> list[tuple[int, float]]:
        all_ids, all_contrib = [], []
        for t, w in tw:
            tp = self._term(t)
            ids, _, _, base_w = tp.full()
            all_ids.append(ids)
            all_contrib.append(w * (base_w + self.delta))
        ids = np.concatenate(all_ids)
        contrib = np.concatenate(all_contrib)
        m = self._live_mask(ids)  # tombstoned docs never enter the heap
        if m is not None:
            ids, contrib = ids[m], contrib[m]
        return self._agg_topk(ids, contrib, k)

    def _search_maxscore(self, q_tokens: list[str], k: int) -> list[tuple[int, float]]:
        """MaxScore essential/non-essential split (query_optimization.py:495-612).

        Faithful to the reference: terms are ordered by upper bound
        descending and split, but its implementation sets
        ``max_non_essential_score = 0.0`` and scores EVERY candidate —
        so results are exhaustive and identical to naive scoring.  The
        UB ordering is reproduced; the scoring is delegated."""
        tw = self._term_weights(q_tokens)
        if not tw:
            return []
        # UB per term = weight * max block weight (the split criterion)
        cursors = [(t, w, w * (self._term(t).max_base_ub + self.delta)) for t, w in tw]
        cursors.sort(key=lambda x: -x[2])  # essential-first ordering
        return self._score_exhaustive([(t, w) for t, w, _ in cursors], k)

    def boolean_query(self, query: str, universe: np.ndarray | None = None) -> np.ndarray:
        """Parsed boolean search: terms, AND/OR/NOT, parentheses
        (shunting-yard + stack eval, boolean.py:132-260).  ``universe``
        defaults to the dense 0..N-1 doc-id range (valid when the index
        assigned ids; pass the actual id set otherwise).  NOT complements
        against the universe — expensive at web scale, as in the
        reference (inverted_index.py:422-449)."""
        from ..functions.boolquery import search_boolean

        if universe is None:
            universe = self.live_doc_ids()
        return search_boolean(query, lambda t: self.postings(t)[0], universe)

    def live_doc_ids(self) -> np.ndarray:
        """Sorted LIVE doc ids — the NOT-complement universe.  Derived
        from the tokens table (the doc-length sidecar source: exactly
        the ids that exist, dense or sparse) minus tombstones; a dense
        0..N-1 arange would resurrect deleted docs in complements and,
        after a compaction or append, mis-describe the sparse/extended
        id space entirely (r4 review).  Cached per searcher."""
        ids = getattr(self, "_live_ids", None)
        if ids is None:
            import glob

            import pyarrow.parquet as pq

            parts = [pq.read_table(f, columns=["doc_id"]).column("doc_id")
                     .to_numpy(zero_copy_only=False).astype(np.int64)
                     for f in sorted(glob.glob(os.path.join(
                         self.index_dir, "tokens", "**", "*.parquet"),
                         recursive=True))]
            ids = np.sort(np.concatenate(parts)) if parts \
                else np.empty(0, dtype=np.int64)
            if self.chunks is not None and ids.size:
                ids = ids[np.isin(ids >> self.eff_chunk_bits,
                                  np.fromiter(self.chunks, dtype=np.int64,
                                              count=len(self.chunks)))]
            m = self._live_mask(ids)
            if m is not None:
                ids = ids[m]
            self._live_ids = ids
        return ids

    # ---------------------------------------------------------------- WAND
    _WAND_DENSE_LIMIT = 512  # processed ranges before the bulk bailout

    def _search_wand(self, q_tokens: list[str], k: int) -> list[tuple[int, float]]:
        """Block-Max WAND as an impact-ordered block-range search (block-max
        metadata after Ding & Suel 2011; processing order after impact-ordered
        / score-at-a-time engines — both public).

        Doc-id space is partitioned into ranges by the union of every
        term's block boundaries, so each term contributes exactly one
        block per range and a range's score upper bound is a vectorized,
        metadata-only sum.  Because ranges partition docs, a doc's whole
        score lives in one range — ranges can be processed in ANY order,
        and a range whose UB is strictly below the running k-th best
        score can never contribute a result (strict ``<`` also makes the
        prune robust to float rounding in the bound).

        The loop processes ranges in descending-UB chunks (16 doubling
        to 256), scoring each chunk with one vectorized multi-range
        gather and raising theta (= k-th best processed score) after
        every chunk.  Each chunk first trims its tail at the theta cut
        (desc order -> one searchsorted); when the cut lands at the
        chunk head the whole remaining tail is pruned and never decoded.
        If no pruning has fired after enough processed ranges (bounds
        uninformative — dense/homogeneous lists), the remaining ranges
        are scored in one bulk vectorized pass, so WAND degrades to
        ~exhaustive cost instead of losing to it.  The per-block bound
        is the max over the block's Pareto cover pairs
        (postings._pareto_bound_pairs) — near-exact, hence the prune
        actually fires where the classic (max_tf, min_dl) pair bound
        cannot."""
        tw = self._term_weights(q_tokens)
        if not tw:
            return []
        return self._search_wand_tw(tw, k)

    def _search_wand_tw(self, tw: list[tuple[str, float]], k: int,
                        theta0: float = float("-inf")) -> list[tuple[int, float]]:
        lists = [(self._term(t), w) for t, w in tw]
        lists = [(tp, w) for tp, w in lists if tp.n_blocks > 0]
        if not lists:
            self.last_wand_stats = {"probes": 0, "skips": 0,
                                    "blocks_loaded": 0, "blocks_total": 0}
            return []
        loaded0 = sum(tp.n_blocks_loaded for tp, _ in lists)
        # global block boundaries -> ranges (ends[i-1], ends[i]]
        ends = np.unique(np.concatenate([tp.block_last for tp, _ in lists]))
        n_ranges = ends.size
        if n_ranges <= 32:
            # tiny range set: even perfect pruning cannot beat one bulk
            # bincount pass, while the chunked gather machinery adds a
            # constant ~25% — identical results either way
            self.last_wand_stats = {
                "probes": 0, "skips": 0, "blocks_loaded": 0,
                "blocks_total": sum(tp.n_blocks for tp, _ in lists),
            }
            return self._score_exhaustive(tw, k)
        # per-range candidate block + UB per term: metadata-only, vectorized
        blk = np.empty((len(lists), n_ranges), dtype=np.int64)
        ub = np.zeros(n_ranges, dtype=np.float64)
        for ci, (tp, w) in enumerate(lists):
            b = np.searchsorted(tp.block_last, ends, side="left")
            valid = b < tp.n_blocks
            blk[ci] = np.where(valid, b, -1)
            ub[valid] += w * (tp.block_base_ub[b[valid]] + self.delta)

        # flat-bound fast-out (metadata only): when the UB distribution is
        # near-uniform no theta can separate ranges, the adaptive loop
        # would detect density after one wasted chunk anyway — go straight
        # to the exhaustive kernel (identical results, it is just faster)
        if n_ranges > 256 and float(ub.max()) <= 1.25 * float(np.median(ub)):
            self.last_wand_stats = {
                "probes": 0, "skips": 0, "blocks_loaded": 0,
                "blocks_total": sum(tp.n_blocks for tp, _ in lists),
            }
            return self._score_exhaustive(tw, k)

        bnd_cache: dict[int, np.ndarray] = {}  # term -> posting offsets per range end

        def gather_ranges(cand: np.ndarray
                          ) -> tuple[list[np.ndarray], list[np.ndarray]]:
            """Raw per-term (doc_ids, contributions) parts over a range set.

            Fully-decoded terms use a vectorized multi-slice gather (range
            -> contiguous posting run via precomputed offsets; runs glued
            with the repeat/cumsum trick).  Cold terms decode only the
            blocks the candidate ranges touch (lazy, cached)."""
            parts_i: list[np.ndarray] = []
            parts_w: list[np.ndarray] = []
            for ci, (tp, w) in enumerate(lists):
                # lazy per-block decode costs ~fixed numpy overhead per
                # block; it only beats the one-shot full decode on LONG
                # lists where a small fraction of blocks is touched
                if (tp.has_full() or tp.df < 500_000
                        or cand.size * 4 >= tp.n_blocks):
                    ids_f, _, _, base_w = tp.full()
                    bnd = bnd_cache.get(ci)
                    if bnd is None:
                        bnd = np.searchsorted(ids_f, ends, side="right")
                        bnd_cache[ci] = bnd
                    hi = bnd[cand]
                    lo = np.where(cand > 0, bnd[cand - 1], 0)
                    ln = hi - lo
                    tot = int(ln.sum())
                    if tot == 0:
                        continue
                    idx = np.arange(tot, dtype=np.int64) + np.repeat(
                        lo - np.concatenate(([0], np.cumsum(ln)[:-1])), ln)
                    parts_i.append(ids_f[idx])
                    parts_w.append(w * (base_w[idx] + self.delta))
                else:
                    for i in cand:
                        b = int(blk[ci, i])
                        if b < 0:
                            continue
                        ids, base_w = tp.block(b)
                        lo_doc = int(ends[i - 1]) if i > 0 else -1
                        lo = int(np.searchsorted(ids, lo_doc, side="right"))
                        hi = int(np.searchsorted(ids, int(ends[i]), side="right"))
                        if lo < hi:
                            parts_i.append(ids[lo:hi])
                            parts_w.append(w * (base_w[lo:hi] + self.delta))
            return parts_i, parts_w

        def score_ranges(cand: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
            """Per-doc aggregated (doc_ids, scores) over a range set.
            Tombstoned docs are masked BEFORE theta/heap ever see them
            (range UBs still include them — an overestimate, so pruning
            stays sound)."""
            parts_i, parts_w = gather_ranges(cand)
            if not parts_i:
                return (np.empty(0, dtype=np.int64), np.empty(0))
            if len(parts_i) == 1:
                u, s = parts_i[0], parts_w[0]
            else:
                uniq, inv = np.unique(np.concatenate(parts_i),
                                      return_inverse=True)
                u, s = uniq, np.bincount(
                    inv, weights=np.concatenate(parts_w), minlength=uniq.size)
            m = self._live_mask(u)
            return (u, s) if m is None else (u[m], s[m])

        order = np.argsort(-ub, kind="stable")  # impact (desc-UB) order
        # running candidate buffer, compressed to the score->=cut set after
        # each chunk (keeps exact ties); theta = k-th best processed score
        buf_ids = np.empty(0, dtype=np.int64)
        buf_sc = np.empty(0, dtype=np.float64)
        theta = theta0
        probes = skips = 0
        pos = 0
        chunk = 16
        while pos < n_ranges:
            cand = order[pos: pos + chunk]
            if theta > float("-inf"):
                # desc order: one cut prunes the chunk tail — and if the
                # first element is below theta, the entire remainder is
                probes += cand.size
                keep = int(np.searchsorted(-ub[cand], -theta, side="right"))
                if keep == 0:
                    skips += n_ranges - pos
                    pos = n_ranges
                    break
                skips += cand.size - keep
                pos += cand.size
                cand = cand[:keep]
            else:
                pos += cand.size
            u, s = score_ranges(cand)
            if u.size:
                buf_ids = np.concatenate([buf_ids, u])
                buf_sc = np.concatenate([buf_sc, s])
                if buf_sc.size >= k:
                    cut = float(np.partition(buf_sc, buf_sc.size - k)[buf_sc.size - k])
                    theta = max(theta, cut)  # seeded theta0 never decreases
                    if buf_sc.size > 4 * k + 64:
                        m = buf_sc >= cut
                        buf_ids, buf_sc = buf_ids[m], buf_sc[m]
            chunk = min(chunk * 2, 256)
            # dense detection: bounds can't prune when most remaining
            # range UBs sit at/above theta — check as soon as theta
            # exists instead of grinding through chunks first
            dense = pos - skips >= self._WAND_DENSE_LIMIT
            if not dense and theta > float("-inf") and pos < n_ranges:
                rest = order[pos:]
                n_keep = int(np.searchsorted(-ub[rest], -theta, side="right"))
                dense = n_keep > max(64, rest.size // 2)
            if dense and pos < n_ranges:
                # bounds can't prune — hand the whole query to the
                # exhaustive scorer (sequential full-list bincount; a
                # range-order gather of ~everything is strictly slower).
                # The few chunk-phase docs are simply recomputed, so no
                # merge/dedupe bookkeeping is needed and the result is
                # bit-identical to naive.
                self.last_wand_stats = {
                    "probes": probes, "skips": skips,
                    "blocks_loaded": sum(tp.n_blocks_loaded for tp, _ in lists) - loaded0,
                    "blocks_total": sum(tp.n_blocks for tp, _ in lists),
                }
                return self._score_exhaustive(tw, k)
        self.last_wand_stats = {
            "probes": probes, "skips": skips,
            "blocks_loaded": sum(tp.n_blocks_loaded for tp, _ in lists) - loaded0,
            "blocks_total": sum(tp.n_blocks for tp, _ in lists),
        }
        return self._agg_topk(buf_ids, buf_sc, k)

    # ------------------------------------------------------------- boolean
    def boolean_and(self, terms: list[str]) -> np.ndarray:
        """Sorted intersection of posting doc_ids (inverted_index.py:331-373)."""
        sets = [self.postings(t)[0] for t in terms]
        if not sets:
            return np.empty(0, dtype=np.int64)
        out = sets[0]
        for s in sets[1:]:
            out = np.intersect1d(out, s, assume_unique=True)
        return out

    def boolean_or(self, terms: list[str]) -> np.ndarray:
        sets = [self.postings(t)[0] for t in terms]
        if not sets:
            return np.empty(0, dtype=np.int64)
        return np.unique(np.concatenate(sets))

    def boolean_not(self, include: list[str], exclude: list[str]) -> np.ndarray:
        """include-AND minus exclude-OR (complement vs doc universe,
        inverted_index.py:422-449 — the universe here is the matched set,
        complement against full 0..N is documented as expensive as-is)."""
        inc = self.boolean_and(include)
        exc = self.boolean_or(exclude)
        return np.setdiff1d(inc, exc, assume_unique=True)

    # -------------------------------------------------------------- phrase
    def positions(self, term: str) -> dict[int, np.ndarray]:
        """doc_id -> sorted positions (requires with_positions build)."""
        if not self.with_positions:
            raise RuntimeError("index built without positions")
        self._fetch_terms([term])
        row = self._cache[term]
        if row is None:
            return {}
        ids, _, _ = unpack_postings(row)
        live = self._live_mask(ids)
        out: dict[int, np.ndarray] = {}
        off = 0
        buf = row["positions_bytes"]
        for i, nb in enumerate(row["pos_nbytes"]):
            if live is None or live[i]:  # tombstoned docs never match
                deltas = vbyte_decode(buf[off : off + nb])
                out[int(ids[i])] = np.cumsum(deltas.astype(np.int64))
            off += nb
        return out

    def phrase_docs(self, phrase_terms: list[str]) -> np.ndarray:
        """Docs where the terms appear at consecutive positions."""
        if not phrase_terms:
            return np.empty(0, dtype=np.int64)
        pos_maps = [self.positions(t) for t in phrase_terms]
        cand = set(pos_maps[0])
        for m in pos_maps[1:]:
            cand &= set(m)
        hits = []
        for d in sorted(cand):
            starts = pos_maps[0][d]  # candidate run-start positions
            for i in range(1, len(pos_maps)):
                starts = starts[np.isin(starts + i, pos_maps[i][d], assume_unique=True)]
                if starts.size == 0:
                    break
            if starts.size:
                hits.append(d)
        return np.array(hits, dtype=np.int64)


class _TermPostings:
    """Query-independent decoded state for one term, cached per searcher.

    Shallow state is pure metadata built without touching the compressed
    bytes: ``block_last`` + per-block base score bounds
    ``tf_weight(max_tf, min_dl)`` — the reference's score(max_tf,
    min_doc_len) bound (query_optimization.py:164-189), held per block.
    Deep state decodes lazily: single blocks on demand (WAND selective
    path, cached) or the whole list one-shot (exhaustive path).  Base
    BM25 weights ``tf_weight(tf, dl)`` exclude the query-dependent
    ``qtf*idf`` factor and additive delta, so decode work is shared
    across every query that touches the term.  Byte offsets per block
    are precomputed cumulative sums (O(block) decode)."""

    def __init__(self, row: dict, avgdl: float, k1: float, b: float,
                 compact: bool = False, dl_of=None):
        self.row = row
        self.compact = compact
        # sidecar layout (no dls stream in the row): gather lengths by
        # doc id through the searcher's chunk-bounded lookup
        self._dl_of = dl_of
        self.df = int(row["df"])
        self.block_last = np.asarray(row["block_last_doc"], dtype=np.int64)
        self.n_blocks = self.block_last.size
        # per-block bound = max over the Pareto cover pairs (near-exact,
        # parameter-free; see postings._pareto_bound_pairs).  Falls back
        # to the classic (max_tf, min_dl) single pair for old segments.
        b_tf = np.asarray(row.get("block_bound_tf") or row["block_max_tf"],
                          dtype=np.float64)
        b_dl = np.asarray(row.get("block_bound_dl") or row["block_min_dl"],
                          dtype=np.float64)
        if b_tf.size:
            pair_w = np.where(b_tf > 0, tf_weight(b_tf, b_dl, avgdl, k1, b), 0.0)
            self.block_base_ub = pair_w.reshape(self.n_blocks, -1).max(axis=1)
            self.max_base_ub = float(self.block_base_ub.max())
            # typical (median) block bound — the method="auto" dispatch
            # statistic; query-independent, so computed once per term
            self.med_base_ub = float(np.median(self.block_base_ub))
        else:
            self.block_base_ub = b_tf
            self.max_base_ub = 0.0
            self.med_base_ub = 0.0
        self.n_blocks_loaded = 0
        self._avgdl, self._k1, self._b = avgdl, k1, b
        def _off(key: str):
            v = row.get(key)
            return None if v is None else np.concatenate(
                ([0], np.cumsum(np.asarray(v, dtype=np.int64))))

        self._len_off = np.concatenate(
            ([0], np.cumsum(np.asarray(row["block_len"], dtype=np.int64))))
        # split layout offsets (None under the combined-dt layout)
        self._doc_off = _off("block_doc_nbytes")
        self._tf_off = _off("block_tf_nbytes")
        self._dl_off = _off("block_dl_nbytes")
        # combined-dt layout offsets (None under the split layouts)
        self._dt_off = _off("block_dt_nbytes")
        self._esc_off = _off("block_esc_nbytes")
        self._blocks: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        self._full: tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray] | None = None

    def has_full(self) -> bool:
        return self._full is not None

    def full(self) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
        """(doc_ids, tfs, dls, base_weights) — whole list, one-shot decode."""
        if self._full is None:
            ids, tfs, dls = unpack_postings(self.row)
            if dls is None:  # sidecar layout
                dls = self._dl_of(ids).astype(np.int64)
            base_w = tf_weight(tfs.astype(np.float64), dls.astype(np.float64),
                               self._avgdl, self._k1, self._b)
            if self.compact:
                base_w = base_w.astype(np.float32)
                if ids.size and int(ids[-1]) < (1 << 31):
                    ids = ids.astype(np.int32)
            self.n_blocks_loaded = self.n_blocks
            self._full = (ids, tfs, dls, base_w)
            self._blocks.clear()  # block views now slice from the full arrays
        return self._full

    def block(self, bi: int) -> tuple[np.ndarray, np.ndarray]:
        """(doc_ids, base_weights) for block ``bi`` only (lazy, cached)."""
        if self._full is not None:
            lo, hi = int(self._len_off[bi]), int(self._len_off[bi + 1])
            return self._full[0][lo:hi], self._full[3][lo:hi]
        hit = self._blocks.get(bi)
        if hit is not None:
            return hit
        if len(self._blocks) >= max(16, self.n_blocks // 8):
            # enough scattered decodes — the one-shot full decode is far
            # cheaper per posting than many small per-block decodes
            self.full()
            lo, hi = int(self._len_off[bi]), int(self._len_off[bi + 1])
            return self._full[0][lo:hi], self._full[3][lo:hi]
        self.n_blocks_loaded += 1  # decode counter (skip-effectiveness tests)
        row = self.row
        if self._dt_off is not None:  # combined-dt layout
            from ..functions.postings import decode_dt

            deltas, tfs = decode_dt(
                row["dt_bytes"][self._dt_off[bi]: self._dt_off[bi + 1]],
                row["esc_bytes"][self._esc_off[bi]: self._esc_off[bi + 1]])
            ids = np.cumsum(deltas)
        else:
            deltas = vbyte_decode(row["docs_bytes"][self._doc_off[bi]: self._doc_off[bi + 1]])
            ids = np.cumsum(deltas.astype(np.int64))
            tfs = vbyte_decode(row["tfs_bytes"][self._tf_off[bi]: self._tf_off[bi + 1]])
        if self._dl_off is not None:
            dls = vbyte_decode(row["dls_bytes"][self._dl_off[bi]: self._dl_off[bi + 1]])
        else:  # sidecar layout: gather this block's lengths by doc id
            dls = self._dl_of(ids)
        base_w = tf_weight(tfs.astype(np.float64), dls.astype(np.float64),
                           self._avgdl, self._k1, self._b)
        self._blocks[bi] = (ids, base_w)
        return ids, base_w
