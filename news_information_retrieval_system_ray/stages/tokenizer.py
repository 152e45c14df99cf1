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

    def __call__(self, batch: pa.Table) -> pa.Table:
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
