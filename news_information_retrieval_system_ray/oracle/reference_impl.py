"""Single-process oracle re-implementing the reference's semantics.

Pure-Python dict-based inverted index + BM25, written from the formula
citations in SURVEY.md (NOT copied from the reference source): index
accumulation inverted_index.py:134-159, BM25 IDF bm25.py:203, term
contribution bm25.py:243-253, doc_len clamp index_service.py:285,
query-as-token-list with duplicate contribution bm25.py:228-232,
canonical tie order (-score, doc_id asc) per SURVEY §7.6.2.

Used by tests to assert that the distributed Ray pipelines produce
rank-identical top-k and (near-)bit-equal scores.
"""

from __future__ import annotations

import math

from ..functions.textnorm import normalize_text
from ..functions.tokenize import get_tokenizer


class OracleIndex:
    def __init__(self, engine: str = "cjk_bigram", k1: float = 1.5, b: float = 0.75):
        self.tokenize = get_tokenizer(engine)
        self.k1, self.b = k1, b
        self.postings: dict[str, dict[int, int]] = {}
        self.positions: dict[str, dict[int, list[int]]] = {}
        self.doc_lens: dict[int, int] = {}

    def add(self, doc_id: int, text: str) -> None:
        toks = self.tokenize(normalize_text(text))
        self.doc_lens[doc_id] = max(1, len(toks))
        for p, t in enumerate(toks):
            self.postings.setdefault(t, {})[doc_id] = self.postings.get(t, {}).get(doc_id, 0) + 1
            self.positions.setdefault(t, {}).setdefault(doc_id, []).append(p)

    @property
    def n_docs(self) -> int:
        return len(self.doc_lens)

    @property
    def avgdl(self) -> float:
        return sum(self.doc_lens.values()) / max(1, self.n_docs)

    def idf(self, term: str) -> float:
        df = len(self.postings.get(term, {}))
        return math.log((self.n_docs - df + 0.5) / (df + 0.5) + 1.0)

    def sorted_postings(self, term: str) -> list[tuple[int, int]]:
        return sorted(self.postings.get(term, {}).items())

    def score(self, q_tokens: list[str], doc_id: int) -> float:
        dl = self.doc_lens[doc_id]
        s = 0.0
        for t in q_tokens:  # duplicates contribute multiply
            tf = self.postings.get(t, {}).get(doc_id)
            if tf is None:
                continue
            num = tf * (self.k1 + 1.0)
            den = tf + self.k1 * (1.0 - self.b + self.b * dl / self.avgdl)
            s += self.idf(t) * num / den
        return s

    def search(self, query: str, k: int = 10) -> list[tuple[int, float]]:
        q = self.tokenize(normalize_text(query))
        if not q:
            return []
        cand: set[int] = set()
        for t in q:
            cand.update(self.postings.get(t, {}))
        scored = [(d, self.score(q, d)) for d in cand]
        scored = [(d, s) for d, s in scored if s > 0.0]
        scored.sort(key=lambda x: (-x[1], x[0]))
        return scored[:k]

    def phrase_docs(self, phrase_terms: list[str]) -> list[int]:
        if not phrase_terms:
            return []
        maps = [self.positions.get(t, {}) for t in phrase_terms]
        cand = set(maps[0])
        for m in maps[1:]:
            cand &= set(m)
        out = []
        for d in sorted(cand):
            starts = set(maps[0][d])
            for i in range(1, len(maps)):
                starts &= {p - i for p in maps[i][d]}
                if not starts:
                    break
            if starts:
                out.append(d)
        return out
