"""Query engine over built index segments.

Reproduces the reference's query semantics (pinned for parity):

- naive BM25 top-k: candidate union -> score all -> order, with the
  query treated as a plain token list (duplicate query tokens
  contribute multiply — /root/reference/src/ir/retrieval/bm25.py:228-232),
  only docs with score > 0, canonical order (-score, doc_id asc)
  (SURVEY §7.6.2 spec-tightening of the reference's unspecified ties).
- WAND top-k (query_optimization.py:191-346): bounded min-heap of size
  k, threshold = heap min, pivot by cumulative upper bounds, galloping
  advance — here the advance skips whole compressed blocks via
  ``block_last_doc`` and scores decode one block at a time
  (block-max metadata from the build).
- boolean AND/OR/NOT as sorted-postings merges
  (inverted_index.py:331-449) via numpy set ops.
- phrase matching via the positional index (positional_index.py:92-152):
  intersect docs, then check adjacency on decoded position lists.

The searcher is the query-side stateful actor of SURVEY §2.3: segment
slices load lazily per term (Parquet predicate pushdown on the sorted
``term_hash`` column) and are cached in-process.
"""

from __future__ import annotations

import heapq
import os

import numpy as np
import pyarrow.dataset as pads

from ..functions.bm25 import idf as bm25_idf
from ..functions.bm25 import tf_weight, topk_order
from ..functions.codecs import vbyte_decode
from ..functions.hashing import token_hash64
from ..functions.postings import merge_packed, unpack_block, unpack_postings
from ..functions.tokenize import get_tokenizer
from ..functions.textnorm import normalize_text
from ..state.manifest import read_json

_PACKED_COLS = [
    "term_hash", "chunk", "df", "cf", "docs_bytes", "tfs_bytes", "dls_bytes",
    "block_doc_nbytes", "block_tf_nbytes", "block_dl_nbytes",
    "block_len", "block_last_doc", "block_max_tf", "block_min_dl",
]


class IndexSearcher:
    """Loads one index directory; serves BM25 / boolean / phrase queries."""

    def __init__(self, index_dir: str, k1: float = 1.5, b: float = 0.75, delta: float = 0.0):
        manifest = read_json(os.path.join(index_dir, "manifest.json"))
        if manifest is None or manifest.get("stats") is None:
            raise FileNotFoundError(f"no completed index manifest in {index_dir}")
        self.config = manifest["config"]
        self.n_docs = manifest["stats"]["n_docs"]
        self.avgdl = manifest["stats"]["avg_doc_length"]
        self.k1, self.b, self.delta = k1, b, delta
        self.with_positions = self.config.get("with_positions", False)
        self.tokenize = get_tokenizer(self.config["engine"])
        self._seg = pads.dataset(os.path.join(index_dir, "segments"))
        self._cache: dict[str, dict | None] = {}

    # ------------------------------------------------------------------ IO
    def _fetch_terms(self, terms: list[str]) -> None:
        missing = [t for t in dict.fromkeys(terms) if t not in self._cache]
        if not missing:
            return
        import pyarrow as pa

        hash_of = {t: token_hash64(t) for t in missing}
        hashes = pa.array(list(hash_of.values()), pa.uint64())
        cols = list(_PACKED_COLS)
        if self.with_positions:
            cols += ["positions_bytes", "pos_nbytes"]
        tbl = self._seg.to_table(columns=cols, filter=pads.field("term_hash").isin(hashes))
        # segments key on the 64-bit hash (the term string never enters the
        # shuffle); the query term's own hash is the lookup key
        rows_by_hash: dict[int, list[dict]] = {}
        for row in tbl.to_pylist():
            rows_by_hash.setdefault(int(row["term_hash"]), []).append(row)
        for t in missing:
            rows = rows_by_hash.get(hash_of[t])
            if not rows:
                self._cache[t] = None
                continue
            # order by doc-id range: chunk id, then first block's last doc
            # (append builds can emit two rows for one chunk — base +
            # appended docs — whose ranges are disjoint and increasing)
            rows.sort(key=lambda r: (r["chunk"],
                                     r["block_last_doc"][0] if r["block_last_doc"] else -1))
            self._cache[t] = merge_packed(rows)

    def postings(self, term: str) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(doc_ids, tfs, dls) for one term; empty arrays if absent."""
        self._fetch_terms([term])
        row = self._cache[term]
        if row is None:
            e = np.empty(0, dtype=np.int64)
            return e, e.copy(), e.copy()
        return unpack_postings(row)

    def df(self, term: str) -> int:
        self._fetch_terms([term])
        row = self._cache[term]
        return 0 if row is None else int(row["df"])

    # ------------------------------------------------------------- scoring
    def _query_terms(self, query: str) -> list[str]:
        return self.tokenize(normalize_text(query))

    def search(self, query: str, k: int = 10, method: str = "naive",
               expand_synonyms: bool = False) -> list[tuple[int, float]]:
        """Top-k (doc_id, BM25 score), canonical order.

        ``expand_synonyms`` applies the reference's query-side synonym
        map (text_quality.py:90-177) before scoring."""
        q_tokens = self._query_terms(query)
        if expand_synonyms:
            from ..functions.synonyms import expand_terms

            q_tokens = expand_terms(q_tokens)
        if not q_tokens:
            return []
        if method == "wand":
            return self._search_wand(q_tokens, k)
        if method == "maxscore":
            return self._search_maxscore(q_tokens, k)
        return self._search_naive(q_tokens, k)

    def _term_weights(self, q_tokens: list[str]) -> list[tuple[str, float]]:
        """Unique terms with qtf * idf weight (duplicates contribute multiply)."""
        qtf: dict[str, int] = {}
        for t in q_tokens:
            qtf[t] = qtf.get(t, 0) + 1
        self._fetch_terms(list(qtf))
        out = []
        for t, n in qtf.items():
            row = self._cache[t]
            if row is None:
                continue
            out.append((t, n * float(bm25_idf(row["df"], self.n_docs))))
        return out

    def _search_naive(self, q_tokens: list[str], k: int) -> list[tuple[int, float]]:
        tw = self._term_weights(q_tokens)
        if not tw:
            return []
        return self._score_exhaustive(tw, k)

    def _score_exhaustive(self, tw: list[tuple[str, float]], k: int) -> list[tuple[int, float]]:
        all_ids, all_contrib = [], []
        for t, w in tw:
            ids, tfs, dls = unpack_postings(self._cache[t])
            contrib = w * (tf_weight(tfs, dls, self.avgdl, self.k1, self.b) + self.delta)
            all_ids.append(ids)
            all_contrib.append(contrib)
        ids = np.concatenate(all_ids)
        contrib = np.concatenate(all_contrib)
        uniq, inv = np.unique(ids, return_inverse=True)
        scores = np.zeros(uniq.size, dtype=np.float64)
        np.add.at(scores, inv, contrib)
        pos = scores > 0.0  # reference keeps score>0 only (bm25.py:304)
        uniq, scores = uniq[pos], scores[pos]
        order = topk_order(uniq, scores, k)
        return [(int(uniq[i]), float(scores[i])) for i in order]

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
        cursors = [(t, w, _Cursor(self._cache[t], w, self.avgdl, self.k1, self.b, self.delta).max_score)
                   for t, w in tw]
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
            universe = np.arange(self.n_docs, dtype=np.int64)
        return search_boolean(query, lambda t: self.postings(t)[0], universe)

    # ---------------------------------------------------------------- WAND
    def _search_wand(self, q_tokens: list[str], k: int) -> list[tuple[int, float]]:
        tw = self._term_weights(q_tokens)
        if not tw:
            return []
        cursors = [_Cursor(self._cache[t], w, self.avgdl, self.k1, self.b, self.delta) for t, w in tw]
        cursors = [c for c in cursors if not c.exhausted]
        heap: list[tuple[float, int]] = []  # (score, -doc_id) min-heap of size k
        # adaptive block-max probing: on dense/homogeneous lists the
        # shallow probe never skips and is pure overhead — disable it
        # after a trial window with a sub-1% hit rate (exactness is
        # unaffected; the probe is purely an optimization)
        probes = skips = 0
        probing = True
        theta_at_disable = float("-inf")
        while True:
            live = [c for c in cursors if not c.exhausted]
            if not live:
                break
            live.sort(key=lambda c: c.cur_doc)
            # heap not full -> no pruning yet (theta = -inf); ub >= theta is
            # non-strict so equal-score/smaller-doc_id candidates still get
            # scored (the heap tie-break decides), keeping WAND == naive.
            theta = heap[0][0] if len(heap) == k else float("-inf")
            ub = 0.0
            pivot_idx = -1
            for i, c in enumerate(live):
                ub += c.max_score
                if ub >= theta:
                    pivot_idx = i
                    break
            if pivot_idx < 0:
                break
            pivot_doc = live[pivot_idx].cur_doc
            # Block-Max shallow probe (Ding & Suel 2011, public): global
            # UBs chose the pivot; the CURRENT blocks' tighter bounds may
            # still rule it out.  If so, skip past the smallest block end
            # among the candidate cursors (the bound holds for every doc
            # in that range), capped at the next cursor's doc.  Strict
            # '<' keeps equal-score/tie-break candidates scored exactly.
            if probing and len(heap) == k:
                probes += 1
                bsum = 0.0
                skip_to = np.iinfo(np.int64).max
                for c in live[: pivot_idx + 1]:
                    ub, block_end = c.ub_for_doc(pivot_doc)
                    bsum += ub
                    skip_to = min(skip_to, block_end + 1)
                if bsum < theta:
                    if pivot_idx + 1 < len(live):
                        skip_to = min(skip_to, live[pivot_idx + 1].cur_doc)
                    if skip_to > pivot_doc:
                        skips += 1
                        for c in live[: pivot_idx + 1]:
                            c.advance_to(skip_to)
                        continue
                if probes == 256 and skips * 100 < probes:
                    probing = False
                    theta_at_disable = theta
            elif not probing and len(heap) == k and theta > theta_at_disable * 1.05 + 1e-12:
                # threshold rose materially since we gave up — bounds that
                # were useless then may prune now; re-arm the trial window
                probing = True
                probes = skips = 0
            if live[0].cur_doc == pivot_doc:
                score = 0.0
                for c in live:
                    if c.cur_doc == pivot_doc:
                        score += c.score_current()
                        c.advance()
                if score > 0.0 and (len(heap) < k or (score, -pivot_doc) > heap[0]):
                    heapq.heappush(heap, (score, -pivot_doc))
                    if len(heap) > k:
                        heapq.heappop(heap)
            else:
                for c in live[:pivot_idx]:
                    c.advance_to(pivot_doc)
        self.last_wand_stats = {
            "probes": probes, "skips": skips,
            "blocks_loaded": sum(c.n_blocks_loaded for c in cursors),
            "blocks_total": sum(c.n_blocks for c in cursors),
        }
        out = sorted(((s, -negid) for s, negid in heap), key=lambda x: (-x[0], x[1]))
        return [(int(d), float(s)) for s, d in out]

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
        out: dict[int, np.ndarray] = {}
        off = 0
        buf = row["positions_bytes"]
        for i, nb in enumerate(row["pos_nbytes"]):
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


class _Cursor:
    """Per-term posting cursor with block skipping (WAND path)."""

    def __init__(self, row: dict, weight: float, avgdl: float, k1: float, b: float, delta: float):
        self.row = row
        self.weight = weight
        self.avgdl, self.k1, self.b, self.delta = avgdl, k1, b, delta
        self.block_last = np.asarray(row["block_last_doc"], dtype=np.int64)
        # UB = weight(max_tf, min_dl) — the reference's score(max_tf,
        # min_doc_len) bound (query_optimization.py:164-189), per block
        max_tf = np.asarray(row["block_max_tf"], dtype=np.float64)
        min_dl = np.asarray(row["block_min_dl"], dtype=np.float64)
        ubs = tf_weight(max_tf, min_dl, avgdl, k1, b) if max_tf.size else max_tf
        self._block_ubs = weight * (ubs + delta)  # per-block score bound
        self.max_score = float(self._block_ubs.max()) if ubs.size else 0.0
        self.n_blocks = self.block_last.size
        self.n_blocks_loaded = 0
        self.bi = 0
        self._ids = self._tfs = self._dls = None
        self.ii = 0
        self.exhausted = self.n_blocks == 0
        if not self.exhausted:
            self._load_block(0)

    def _load_block(self, bi: int) -> None:
        self.bi = bi
        self.n_blocks_loaded += 1  # decode counter (skip-effectiveness tests)
        self._ids, self._tfs, self._dls = unpack_block(self.row, bi)
        # vectorized per-block weights once per load — score_current must
        # not allocate in the per-posting WAND loop
        self._w = tf_weight(self._tfs, self._dls, self.avgdl, self.k1, self.b)
        self.ii = 0

    @property
    def cur_doc(self) -> int:
        return int(self._ids[self.ii])

    def block_containing(self, doc: int) -> int:
        """Index of the block whose range covers ``doc`` (metadata only —
        no decode); returns n_blocks if doc is past the last posting."""
        if doc <= self.block_last[self.bi]:
            return self.bi
        return int(np.searchsorted(self.block_last, doc, side="left"))

    def ub_for_doc(self, doc: int) -> tuple[float, int]:
        """(score upper bound, block_end) for the block covering ``doc``
        — the Block-Max-WAND shallow probe (bound valid for every doc up
        to block_end)."""
        b = self.block_containing(doc)
        if b >= self.n_blocks:
            return 0.0, np.iinfo(np.int64).max
        return float(self._block_ubs[b]), int(self.block_last[b])

    def score_current(self) -> float:
        return float(self.weight * (self._w[self.ii] + self.delta))

    def advance(self) -> None:
        self.ii += 1
        if self.ii >= self._ids.size:
            if self.bi + 1 < self.n_blocks:
                self._load_block(self.bi + 1)
            else:
                self.exhausted = True

    def advance_to(self, target: int) -> None:
        """Gallop to the first posting >= target, skipping whole blocks."""
        if self.exhausted:
            return
        if self.block_last[self.bi] < target:
            nb = int(np.searchsorted(self.block_last, target, side="left"))
            if nb >= self.n_blocks:
                self.exhausted = True
                return
            self._load_block(nb)
        self.ii = int(np.searchsorted(self._ids[self.ii:], target, side="left")) + self.ii
        if self.ii >= self._ids.size:
            # target fell in a gap at block end
            if self.bi + 1 < self.n_blocks:
                self._load_block(self.bi + 1)
            else:
                self.exhausted = True
