"""Keyword extraction kernels.

- TextRank (reference /root/reference/src/ir/keyextract/textrank.py:85-737
  semantics): undirected co-occurrence graph over tokens within a sliding
  window (default 5), PageRank power iteration with damping 0.85 until
  max-delta < tol or max_iter, scores ranked (score desc, term asc).
- Frequency keywords: top-k by tf (the reference's fallback extractor).

Pure NumPy; used per-doc inside map_batches stages.
"""

from __future__ import annotations

import numpy as np

DAMPING = 0.85
WINDOW = 5


def textrank_scores(tokens: list[str], window: int = WINDOW,
                    damping: float = DAMPING, max_iter: int = 50,
                    tol: float = 1e-6) -> list[tuple[str, float]]:
    """Full (term, score) TextRank vector over the token sequence (vocab
    order, unranked).  ``tol=0.0`` disables early stopping so exactly
    ``max_iter`` power iterations run — the deterministic form the SQL
    oracle unrolls."""
    if not tokens:
        return []
    vocab = sorted(set(tokens))
    idx = {t: i for i, t in enumerate(vocab)}
    n = len(vocab)
    if n == 1:
        return [(vocab[0], 1.0)]
    adj = np.zeros((n, n), dtype=np.float64)
    seq = np.fromiter((idx[t] for t in tokens), dtype=np.int64, count=len(tokens))
    for i in range(len(seq)):
        for j in range(i + 1, min(i + window, len(seq))):
            a, b = seq[i], seq[j]
            if a != b:
                adj[a, b] += 1.0
                adj[b, a] += 1.0
    deg = adj.sum(axis=1)
    deg[deg == 0] = 1.0
    trans = adj / deg[:, None]  # row-normalized
    r = np.full(n, 1.0 / n)
    for _ in range(max_iter):
        r_new = (1.0 - damping) / n + damping * (trans.T @ r)
        if tol > 0.0 and np.abs(r_new - r).max() < tol:
            r = r_new
            break
        r = r_new
    return [(t, float(r[idx[t]])) for t in vocab]


def textrank_keywords(tokens: list[str], k: int = 5, window: int = WINDOW,
                      damping: float = DAMPING, max_iter: int = 50,
                      tol: float = 1e-6) -> list[tuple[str, float]]:
    """Top-k (term, score) by TextRank over the token sequence."""
    scored = textrank_scores(tokens, window=window, damping=damping,
                             max_iter=max_iter, tol=tol)
    if not scored:
        return []
    vocab = [t for t, _ in scored]
    r = np.array([s for _, s in scored])
    order = np.lexsort((np.array(vocab), -r))  # (-score, term asc)
    return [(vocab[i], float(r[i])) for i in order[:k]]


def frequency_keywords(tokens: list[str], k: int = 5) -> list[tuple[str, int]]:
    """Top-k (term, tf) by raw frequency, ties by term asc."""
    from collections import Counter

    c = Counter(tokens)
    return sorted(c.items(), key=lambda x: (-x[1], x[0]))[:k]


def rake_phrases(tokens: list[str], stops: frozenset[str],
                 max_len: int = 4) -> list[tuple[str, ...]]:
    """Candidate phrases: maximal stopword-delimited token runs, capped
    at ``max_len`` words (RAKE, Rose et al. 2010; the reference wraps
    rake-nltk with the same phrase construction,
    /root/reference/src/ir/keyextract/rake_extractor.py:84-246)."""
    phrases: list[tuple[str, ...]] = []
    cur: list[str] = []
    for t in tokens:
        if t in stops:
            if cur:
                phrases.append(tuple(cur))
                cur = []
        else:
            cur.append(t)
            if len(cur) == max_len:
                phrases.append(tuple(cur))
                cur = []
    if cur:
        phrases.append(tuple(cur))
    return phrases


def rake_keywords(tokens: list[str], stops: frozenset[str], k: int = 5,
                  max_len: int = 4) -> list[tuple[str, float]]:
    """Top-k (phrase, score) by RAKE degree/frequency scoring.

    Word scores follow rake-nltk's co-occurrence-graph formulation (the
    engine the reference delegates to): within each candidate phrase,
    every word pair (including self-pairs) co-occurs once, so
    ``deg(w) = sum of len(phrase) over phrase occurrences containing w``
    (counted with multiplicity); ``score(w) = deg(w) / freq(w)``;
    phrase score = sum of member word scores; ties by phrase asc.

    Ranking uses the 4-dp-rounded score: the raw sum's float value
    depends on member-word addition order, so two mathematically-equal
    phrase scores can differ by one ulp and flip the tie between this
    kernel and the SQL oracle — rounding makes the rank key
    order-independent (same convention as the rocchio/keybert entries)."""
    phrases = rake_phrases(tokens, stops, max_len)
    if not phrases:
        return []
    freq: dict[str, int] = {}
    deg: dict[str, int] = {}
    for ph in phrases:
        for w in ph:
            freq[w] = freq.get(w, 0) + 1
            deg[w] = deg.get(w, 0) + len(ph)
    wscore = {w: deg[w] / freq[w] for w in freq}
    seen: dict[str, float] = {}
    for ph in phrases:
        text = " ".join(ph)
        if text not in seen:
            seen[text] = sum(wscore[w] for w in ph)
    ranked = sorted(seen.items(), key=lambda x: (-round(x[1], 4), x[0]))
    return [(p, float(s)) for p, s in ranked[:k]]
