"""Keyword-extraction quality metrics (keyextract/evaluator.py parity).

Reference formulas (src/ir/keyextract/evaluator.py):
- precision@k / recall@k / F1 against a gold keyword set (:234-313)
- diversity = unique tokens / total tokens over the keyword list (:435-471)
- coverage  = fraction of TEXT tokens that appear in the keyword token
  set (:473-515) — occurrence-weighted, i.e. sum of covered term
  frequencies over the doc token count.
"""

from __future__ import annotations


def precision_recall_f1(extracted: list[str],
                        gold: list[str]) -> tuple[float, float, float]:
    """P/R/F1 of an extracted keyword list vs a gold list
    (evaluator.py:234-313; sets, order-insensitive)."""
    if not extracted or not gold:
        return 0.0, 0.0, 0.0
    inter = len(set(extracted) & set(gold))
    p = inter / len(set(extracted))
    r = inter / len(set(gold))
    f1 = 2 * p * r / (p + r) if (p + r) > 0 else 0.0
    return p, r, f1


def diversity(keywords: list[str]) -> float:
    """Unique-token ratio over whitespace-split keywords
    (evaluator.py:435-471)."""
    toks = [t for kw in keywords for t in kw.split()]
    return len(set(toks)) / len(toks) if toks else 0.0


def coverage(keywords: list[str], text_tokens: list[str]) -> float:
    """Fraction of text tokens covered by the keyword token set
    (evaluator.py:473-515)."""
    if not keywords or not text_tokens:
        return 0.0
    kw_toks = {t for kw in keywords for t in kw.split()}
    return sum(1 for t in text_tokens if t in kw_toks) / len(text_tokens)
