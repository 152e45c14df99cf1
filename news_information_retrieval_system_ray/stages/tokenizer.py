"""Tokenizer stage — the stateful actor-pool stage of the pipeline.

The reference holds its tokenizer as a process-global singleton loaded
once (jieba lazy init chinese_tokenizer.py:186-199; CKIP ``__new__``
guard ckip_tokenizer.py:40-50).  Here that state lives in the actor:
``map_batches(TokenizeStage, concurrency=N)`` constructs the tokenizer
once per actor in ``__init__`` and reuses it per batch.

Output per doc: unique terms + term frequencies (the in-batch partial
aggregation of SURVEY §2.5 — the (doc, term)->tf reduce happens here,
before the shuffle, so the term shuffle moves one row per (doc, term)
not one per token), plus ``doc_len = max(1, n_tokens)`` (app clamp,
index_service.py:285) and optional per-term position lists for the
positional index (positional_index.py:92-152).
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pyarrow as pa

from ..functions.textnorm import normalize_text
from ..functions.tokenize import DEFAULT_ENGINE, get_tokenizer

TOKENS_SCHEMA_BASE = ("doc_id", "doc_len", "terms", "tfs")


class TokenizeStage:
    """text_norm (or text) -> (doc_id, doc_len, terms, tfs[, positions])."""

    def __init__(self, engine: str = DEFAULT_ENGINE, text_col: str = "text_norm",
                 pre_normalized: bool = True, with_positions: bool = False,
                 carry_cols: tuple[str, ...] = (), stopword_lang: str | None = None,
                 emit_hashpairs: bool = False):
        # emit_hashpairs: attach the batch's unique (term_hash, alt-hash)
        # pairs to the FIRST output row as two list<int64> columns
        # (hc_hash / hc_alt; every other row null).  The downstream
        # collision check then reads ONLY these two pruned columns —
        # instead of re-decoding and re-uniquing the whole terms column
        # (which cost as much as the segments pass itself).  Correctness
        # needs only "every term of the shard appears in some list",
        # which row splitting/merging downstream preserves.
        self.emit_hashpairs = emit_hashpairs
        self.engine = engine
        self.tokenize = get_tokenizer(engine)  # once per actor
        if engine.startswith("jieba"):
            # per-actor memo for expensive segmenters (the reference's
            # tokenizer LRU, chinese_tokenizer.py cache layer): repeated
            # titles/boilerplate skip re-segmentation; lists are treated
            # as read-only downstream
            from functools import lru_cache

            self.tokenize = lru_cache(maxsize=1 << 16)(self.tokenize)
        self.text_col = text_col
        self.pre_normalized = pre_normalized
        self.with_positions = with_positions
        # facet columns (e.g. source/lang) carried through so downstream
        # facet aggregates need no doc_id->facet join (SURVEY broadcast-
        # join avoidance: the facet rides the row instead of shuffling)
        self.carry_cols = tuple(carry_cols)
        # index-time stopword filtering (reference stopwords.py:101-137,
        # file-driven set, O(1) membership) — loaded once per actor
        if stopword_lang:
            from ..functions.stopwords import load_stopwords

            self.stops: frozenset[str] = load_stopwords(stopword_lang)
        else:
            self.stops = frozenset()
        # per-actor key->term decode memo for the vectorized cjk path
        # (webtext vocab repeats across batches; see fast_tokenize)
        self._decode_cache: dict[int, str] = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        if (not self.with_positions and self.engine in ("cjk_bigram", "whitespace")
                and batch.num_rows):
            import pyarrow.compute as pc

            col = batch.column(self.text_col)
            if pc.all(pc.string_is_ascii(pc.fill_null(col, ""))).as_py():
                # pure-ASCII batch: RE2's ASCII \w == Python's unicode \w,
                # and normalize_text reduces to lower + \s+ collapse
                # (NFKC is the identity on ASCII, 臺→台 can't apply), so
                # tokenization vectorizes exactly (see _call_ascii)
                return self._call_ascii(batch, col)
            if self.engine == "cjk_bigram" and self.pre_normalized:
                # constant-size kernel calls: one whole-block call hits
                # the host allocator cliff under full concurrency (45 s
                # vs 11 s over the 400k corpus at 32-way); slicing HERE
                # (not via map_batches batch_size, which would gate the
                # fused loader) keeps read granularity intact
                if batch.num_rows <= 1024:
                    return self._call_cjk_simple(batch, col)
                parts = [self._call_cjk_simple(batch.slice(i, 1024),
                                               col.slice(i, 1024))
                         for i in range(0, batch.num_rows, 1024)]
                return pa.concat_tables(parts)
        texts = batch.column(self.text_col).to_pylist()
        doc_ids = batch.column("doc_id")
        doc_lens = np.empty(len(texts), dtype=np.int32)
        terms_col: list[list[str]] = []
        tfs_col: list[np.ndarray] = []
        pos_col: list[list[list[int]]] = []
        for i, text in enumerate(texts):
            toks = self.tokenize(text if self.pre_normalized else normalize_text(text or ""))
            if self.stops:
                toks = [t for t in toks if t not in self.stops]
            doc_lens[i] = max(1, len(toks))  # app clamp (index_service.py:285)
            if self.with_positions:
                pos_map: dict[str, list[int]] = {}
                for p, t in enumerate(toks):
                    pos_map.setdefault(t, []).append(p)
                terms = sorted(pos_map)
                terms_col.append(terms)
                tfs_col.append(np.array([len(pos_map[t]) for t in terms], dtype=np.int32))
                pos_col.append([pos_map[t] for t in terms])
            else:
                # Counter beats np.unique(object) ~5x here; downstream
                # (explode -> shuffle) does not need per-doc term order
                c = Counter(toks)
                terms_col.append(list(c.keys()))
                tfs_col.append(np.fromiter(c.values(), dtype=np.int32, count=len(c)))
        cols = {
            "doc_id": doc_ids,
            "doc_len": pa.array(doc_lens),
            "terms": pa.array(terms_col, pa.list_(pa.string())),
            "tfs": pa.array([t.tolist() for t in tfs_col], pa.list_(pa.int32())),
        }
        if self.with_positions:
            cols["positions"] = pa.array(pos_col, pa.list_(pa.list_(pa.int32())))
        if self.emit_hashpairs:
            from ..functions.hashing import token_hash_pair

            vocab = set()
            for terms in terms_col:
                vocab.update(terms)
            pairs = np.fromiter((h for t in vocab for h in token_hash_pair(t)),
                                dtype=np.uint64, count=2 * len(vocab)).view(np.int64)
            n_rows = len(texts)
            hc_hash = [None] * n_rows
            hc_alt = [None] * n_rows
            if n_rows:
                hc_hash[0] = pairs[0::2].tolist()
                hc_alt[0] = pairs[1::2].tolist()
            cols["hc_hash"] = pa.array(hc_hash, pa.list_(pa.int64()))
            cols["hc_alt"] = pa.array(hc_alt, pa.list_(pa.int64()))
        if "shard" in batch.column_names:  # resume-unit tag (partitioned write)
            cols["shard"] = batch.column("shard")
        for c in self.carry_cols:
            cols[c] = batch.column(c)
        return pa.table(cols)

    def _call_cjk_simple(self, batch: pa.Table, col) -> pa.Table:
        """Vectorized cjk_bigram path (functions/fast_tokenize): token
        keys are 64-bit codes counted with one lexsort per batch; only
        the vocab materializes as strings.  Docs with codepoints outside
        ASCII + CJK-basic fall back to the exact per-doc loop inside the
        same batch, so output semantics are identical everywhere."""
        from ..functions.fast_tokenize import tokenize_batch

        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        n = batch.num_rows
        texts = ["" if t is None else t for t in col.to_pylist()]
        pair_doc, term_idx, pair_tf, vocab, fb = tokenize_batch(
            texts, decode_cache=self._decode_cache)
        if fb.size:
            vpos = {t: i for i, t in enumerate(vocab)}
            add_d: list[int] = []
            add_i: list[int] = []
            add_t: list[int] = []
            for d in fb.tolist():
                toks = self.tokenize(texts[d])
                c = Counter(toks)
                for t, tf in c.items():
                    i = vpos.get(t)
                    if i is None:
                        i = vpos[t] = len(vocab)
                        vocab.append(t)
                    add_d.append(d)
                    add_i.append(i)
                    add_t.append(tf)
            if add_d:
                pair_doc = np.concatenate((pair_doc, np.array(add_d, np.int64)))
                term_idx = np.concatenate((term_idx, np.array(add_i, np.int64)))
                pair_tf = np.concatenate((pair_tf, np.array(add_t, np.int64)))
                order = np.argsort(pair_doc, kind="stable")
                pair_doc, term_idx, pair_tf = (
                    pair_doc[order], term_idx[order], pair_tf[order])
        if self.stops:
            stop_i = np.array([i for i, t in enumerate(vocab) if t in self.stops],
                              dtype=np.int64)
            if stop_i.size:
                keep = ~np.isin(term_idx, stop_i)
                pair_doc, term_idx, pair_tf = (
                    pair_doc[keep], term_idx[keep], pair_tf[keep])
        doc_lens = np.zeros(n, dtype=np.int64)
        np.add.at(doc_lens, pair_doc, pair_tf)
        doc_lens = np.maximum(1, doc_lens).astype(np.int32)
        per_doc = np.bincount(pair_doc, minlength=n)
        offsets = np.concatenate(([0], np.cumsum(per_doc))).astype(np.int32)
        vocab_arr = pa.array(vocab, pa.string())
        terms_arr = pa.ListArray.from_arrays(
            pa.array(offsets), vocab_arr.take(pa.array(term_idx)))
        tfs_arr = pa.ListArray.from_arrays(
            pa.array(offsets), pa.array(pair_tf.astype(np.int32)))
        cols = {
            "doc_id": batch.column("doc_id"),
            "doc_len": pa.array(doc_lens),
            "terms": terms_arr,
            "tfs": tfs_arr,
        }
        if self.emit_hashpairs:
            from ..functions.hashing import token_hash_pair

            uniq_terms = [vocab[i] for i in np.unique(term_idx).tolist()]
            pairs = np.fromiter(
                (h for t in uniq_terms for h in token_hash_pair(t)),
                dtype=np.uint64, count=2 * len(uniq_terms)).view(np.int64)
            hc_hash = [None] * n
            hc_alt = [None] * n
            hc_hash[0] = pairs[0::2].tolist()
            hc_alt[0] = pairs[1::2].tolist()
            cols["hc_hash"] = pa.array(hc_hash, pa.list_(pa.int64()))
            cols["hc_alt"] = pa.array(hc_alt, pa.list_(pa.int64()))
        if "shard" in batch.column_names:
            cols["shard"] = batch.column("shard")
        for c in self.carry_cols:
            cols[c] = batch.column(c)
        return pa.table(cols)

    def _call_ascii(self, batch: pa.Table, col) -> pa.Table:
        """Vectorized tokenize+count for pure-ASCII batches.

        Semantics identical to the per-doc loop: on ASCII text the
        cjk_bigram engine reduces to \\w+ runs (the CJK branch can never
        match) and whitespace to split(' ') + keep_token (contains \\w);
        RE2's ASCII \\w equals Python's unicode \\w on ASCII input.  The
        per-doc (term, tf) pairs come from ONE dictionary-encode + ONE
        np.unique over (doc_idx << 32 | code) keys instead of a Python
        Counter per doc; per-doc term ORDER becomes code order, which no
        downstream consumer depends on (explode/shuffle re-sorts)."""
        import pyarrow.compute as pc

        n = batch.num_rows
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if not self.pre_normalized:
            # normalize_text on ASCII == lower + \s+ collapse + strip;
            # the collapse/strip is subsumed by splitting on \s+ below
            col = pc.utf8_lower(pc.fill_null(col, ""))
        if self.engine == "cjk_bigram":
            toks = pc.split_pattern_regex(col, r"[^\w]+")
        elif self.pre_normalized:  # whitespace on normalized text: ' ' only
            toks = pc.split_pattern(col, " ")
        else:  # whitespace + our own normalization: \s+ collapses here
            toks = pc.split_pattern_regex(col, r"\s+")
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        if self.engine == "cjk_bigram":
            keep = pc.not_equal(flat, "")  # split_pattern_regex edge empties
        else:
            keep = pc.match_substring_regex(flat, r"\w")  # keep_token, ASCII
        if self.stops:
            keep = pc.and_(keep, pc.invert(pc.is_in(
                flat, value_set=pa.array(sorted(self.stops), pa.string()))))
        keep_np = keep.to_numpy(zero_copy_only=False)
        flat = flat.filter(keep)
        parent = parent[keep_np]
        enc = flat.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        vocab_arr = enc.dictionary
        doc_lens = np.maximum(1, np.bincount(parent, minlength=n)).astype(np.int32)
        key = (parent.astype(np.int64) << 32) | codes
        uniq, counts = np.unique(key, return_counts=True)
        doc_of = (uniq >> 32).astype(np.int64)
        code_of = (uniq & 0xFFFFFFFF).astype(np.int64)
        per_doc = np.bincount(doc_of, minlength=n)
        offsets = np.concatenate(([0], np.cumsum(per_doc))).astype(np.int32)
        term_values = vocab_arr.take(pa.array(code_of))
        terms_arr = pa.ListArray.from_arrays(pa.array(offsets), term_values)
        tfs_arr = pa.ListArray.from_arrays(
            pa.array(offsets), pa.array(counts.astype(np.int32)))
        cols = {
            "doc_id": batch.column("doc_id"),
            "doc_len": pa.array(doc_lens),
            "terms": terms_arr,
            "tfs": tfs_arr,
        }
        if self.emit_hashpairs:
            from ..functions.hashing import token_hash_pair

            used = np.unique(code_of)
            vocab = vocab_arr.take(pa.array(used)).to_pylist()
            pairs = np.fromiter((h for t in vocab for h in token_hash_pair(t)),
                                dtype=np.uint64, count=2 * len(vocab)).view(np.int64)
            hc_hash = [None] * n
            hc_alt = [None] * n
            hc_hash[0] = pairs[0::2].tolist()
            hc_alt[0] = pairs[1::2].tolist()
            cols["hc_hash"] = pa.array(hc_hash, pa.list_(pa.int64()))
            cols["hc_alt"] = pa.array(hc_alt, pa.list_(pa.int64()))
        if "shard" in batch.column_names:
            cols["shard"] = batch.column("shard")
        for c in self.carry_cols:
            cols[c] = batch.column(c)
        return pa.table(cols)
