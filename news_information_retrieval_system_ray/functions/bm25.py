"""BM25 scoring math (reference /root/reference/src/ir/retrieval/bm25.py).

Formulas pinned for rank-identical parity:

- IDF: ``log((N - df + 0.5) / (df + 0.5) + 1.0)`` (bm25.py:187-204;
  identical in the WAND module query_optimization.py:180-189).
- term score: ``idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))``
  with k1=1.5, b=0.75 (bm25.py:115-121 defaults; app adapter hydrates
  the same constants, index_service.py:346).
- doc_len is clamped ``max(1, len(tokens))`` (app path,
  index_service.py:285 — pinned in SURVEY §7.6.4).
- canonical result order: ``(-score, doc_id asc)`` — spec-tightening of
  the reference's unspecified tie order (SURVEY §7.6.2; WAND's heap
  already orders ties this way, query_optimization.py:303-309).

All functions are vectorized NumPy over posting arrays.
"""

from __future__ import annotations

import numpy as np

K1 = 1.5
B = 0.75


def idf(df: np.ndarray | float, n_docs: int) -> np.ndarray | float:
    """BM25 IDF (bm25.py:203). Also equals the app TF-IDF variant
    ``log(1 + (N-df+0.5)/(df+0.5))`` (index_service.py:295) — the two
    expressions are algebraically identical (SURVEY §7.6.3)."""
    return np.log((n_docs - np.asarray(df, dtype=np.float64) + 0.5) / (np.asarray(df, dtype=np.float64) + 0.5) + 1.0)


def tf_weight(tf: np.ndarray, dl: np.ndarray, avgdl: float, k1: float = K1, b: float = B) -> np.ndarray:
    """Per-posting BM25 weight excluding IDF: tf*(k1+1)/(tf + k1*(1-b+b*dl/avgdl))."""
    tf = np.asarray(tf, dtype=np.float64)
    dl = np.asarray(dl, dtype=np.float64)
    return tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))


def term_scores(tf: np.ndarray, dl: np.ndarray, df: int, n_docs: int, avgdl: float,
                k1: float = K1, b: float = B) -> np.ndarray:
    """Full per-posting BM25 contribution of one term."""
    return idf(df, n_docs) * tf_weight(tf, dl, avgdl, k1, b)


def topk_order(doc_ids: np.ndarray, scores: np.ndarray, k: int) -> np.ndarray:
    """Indices of the canonical top-k: sort by (-score, doc_id asc).

    Uses lexsort (stable, deterministic) rather than a partial sort so
    results are identical regardless of partitioning / batch order.
    """
    order = np.lexsort((doc_ids, -scores))
    return order[:k]
