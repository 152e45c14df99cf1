"""KeyBERT-style keyword extraction on the hashing encoder.

Reference parity: `src/ir/keyextract/keybert_extractor.py` — a thin
wrapper over the public KeyBERT algorithm (module docstring lines
15-24 spell it out): extract candidate 1..3-gram keyphrases, embed
document and candidates, cosine-rank, then Maximal Marginal Relevance
(Carbonell & Goldstein 1998) for diversity with
``MMR = lambda * Sim(c, doc) - (1 - lambda) * max Sim(c, selected)``
where ``lambda = 1 - diversity`` (KeyBERT's ``mmr`` uses
``(1-diversity)*cand_sims - diversity*sel_sims``; reference defaults
``use_mmr=True, diversity=0.5, keyphrase_ngram_range=(1, 3)``,
keybert_extractor.py:130-141).

The reference's encoder is a sentence-transformers BERT model (absent
in this container).  Per the repo convention (see `stages/dense.py`),
the encoder here is the deterministic FEATURE-HASHING encoder — a
phrase embeds as the signed bucket-count sum of its tokens — which
keeps the ENTIRE path (candidates, embeddings, cosines, the greedy
MMR loop) SQL-expressible and oracle-checked rather than rows-only.
Swapping a real model in is confined to the embed step.

Candidate semantics follow KeyBERT's CountVectorizer defaults:
stopwords are removed from the token sequence first, then candidates
are the distinct contiguous n-grams (n in ngram_range) of the
REMAINING sequence (sklearn makes survivors adjacent).

Determinism pins (mirrored exactly in the SQL oracle):
  * all similarities are cosine on float64 with integer-component dot
    products, rounded half-away-from-zero to 4 dp (KeyBERT itself
    returns ``round(sim, 4)``);
  * zero-norm vectors (signed counts can cancel) are dropped;
  * every argmax tie-breaks on phrase ascending.
"""

from __future__ import annotations

import numpy as np

from ..stages.dense import hash_bucket


def _round4(a: np.ndarray) -> np.ndarray:
    """Vectorized half-away-from-zero round to 4 dp (DuckDB round)."""
    return np.floor(np.abs(a) * 1e4 + 0.5) / 1e4 * np.sign(a)


def candidate_phrases(tokens: list[str], stops: frozenset[str] | set[str],
                      ngram_max: int = 3) -> list[str]:
    """Distinct contiguous 1..ngram_max-grams of the stopword-filtered
    sequence (CountVectorizer semantics: drop stops, survivors become
    adjacent), sorted ascending for determinism."""
    seq = [t for t in tokens if t not in stops]
    out: set[str] = set()
    for n in range(1, ngram_max + 1):
        for i in range(len(seq) - n + 1):
            out.add(" ".join(seq[i:i + n]))
    return sorted(out)


def embed_phrases(phrases: list[str], dim: int,
                  _cache: dict[str, tuple[int, int]] | None = None) -> np.ndarray:
    """(len(phrases), dim) signed bucket-count matrix; a phrase is the
    sum of its tokens' hash vectors (== stages.dense.encode_text on the
    phrase text, but token-cached across phrases)."""
    cache = _cache if _cache is not None else {}
    mat = np.zeros((len(phrases), dim), dtype=np.float64)
    for i, ph in enumerate(phrases):
        for t in ph.split(" "):
            bs = cache.get(t)
            if bs is None:
                bs = hash_bucket(t, dim)
                cache[t] = bs
            mat[i, bs[0]] += bs[1]
    return mat


def keybert_extract(tokens: list[str], stops: frozenset[str] | set[str],
                    dim: int = 32, top_n: int = 5, diversity: float = 0.5,
                    ngram_max: int = 3,
                    _cache: dict[str, tuple[int, int]] | None = None,
                    ) -> list[tuple[str, float]]:
    """MMR-selected keyphrases for one doc's ordered token list.

    Returns [(phrase, score)] in SELECTION order, score = round4 cosine
    of phrase vs the whole-doc embedding (what KeyBERT reports).
    """
    cands = candidate_phrases(tokens, stops, ngram_max)
    if not cands or not tokens:
        return []
    cache = _cache if _cache is not None else {}
    doc_vec = embed_phrases([" ".join(tokens)], dim, cache)[0]
    nd = float(np.linalg.norm(doc_vec))
    if nd == 0.0:
        return []
    cmat = embed_phrases(cands, dim, cache)
    cn = np.linalg.norm(cmat, axis=1)
    keep = cn > 0  # cancelled signed counts -> undefined cosine: drop
    cands = [c for c, k in zip(cands, keep) if k]
    cmat, cn = cmat[keep], cn[keep]
    if not cands:
        return []

    sim_doc = _round4((cmat @ doc_vec) / (cn * nd))
    lam = 1.0 - diversity

    # greedy MMR; argmax tie-break = phrase asc (cands is sorted, and
    # np.argmax returns the first/lowest index on ties)
    selected: list[int] = [int(np.argmax(sim_doc))]
    remaining = [i for i in range(len(cands)) if i != selected[0]]
    while remaining and len(selected) < top_n:
        sel_mat, sel_n = cmat[selected], cn[selected]
        rem_mat, rem_n = cmat[remaining], cn[remaining]
        pair = _round4((rem_mat @ sel_mat.T) / (rem_n[:, None] * sel_n[None, :]))
        mmr = lam * sim_doc[remaining] - (1.0 - lam) * pair.max(axis=1)
        best = remaining[int(np.argmax(mmr))]
        selected.append(best)
        remaining.remove(best)
    return [(cands[i], float(sim_doc[i])) for i in selected]
