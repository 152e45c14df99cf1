"""IR evaluation metrics — pure functions over ranked lists + qrels.

Reimplements the reference's metric battery
(/root/reference/src/ir/eval/metrics.py:84-872): P/R/F1, P@K, R@K,
AP/MAP, MRR, DCG/nDCG@K, ERR, GMAP, RBP, bpref, R-precision,
success@K.  These run driver-side (qrels and runs are tiny relative to
the corpus — SURVEY §2.5), vectorized NumPy.

Conventions (matching the reference):
- ``ranked``: doc ids in rank order (rank 1 first).
- ``qrels``: dict doc_id -> graded relevance (int >= 0); relevant iff
  grade > 0 for the binary metrics.
- DCG uses the ``rel / log2(rank+1)`` form (metrics.py's dcg_at_k);
  nDCG normalizes by the ideal DCG at the same cutoff.
- ERR uses graded probability ``(2^g - 1) / 2^g_max``.
- RBP persistence default 0.8 (metrics.py default).
"""

from __future__ import annotations

import math

import numpy as np


def _rel_mask(ranked: list[int], qrels: dict[int, int]) -> np.ndarray:
    return np.array([qrels.get(d, 0) > 0 for d in ranked], dtype=bool)


def precision(ranked: list[int], qrels: dict[int, int]) -> float:
    if not ranked:
        return 0.0
    return float(_rel_mask(ranked, qrels).sum()) / len(ranked)


def recall(ranked: list[int], qrels: dict[int, int]) -> float:
    n_rel = sum(1 for g in qrels.values() if g > 0)
    if n_rel == 0:
        return 0.0
    return float(_rel_mask(ranked, qrels).sum()) / n_rel


def f1(ranked: list[int], qrels: dict[int, int]) -> float:
    p, r = precision(ranked, qrels), recall(ranked, qrels)
    return 0.0 if p + r == 0 else 2 * p * r / (p + r)


def precision_at_k(ranked: list[int], qrels: dict[int, int], k: int) -> float:
    if k <= 0:
        return 0.0
    return float(_rel_mask(ranked[:k], qrels).sum()) / k


def recall_at_k(ranked: list[int], qrels: dict[int, int], k: int) -> float:
    n_rel = sum(1 for g in qrels.values() if g > 0)
    if n_rel == 0:
        return 0.0
    return float(_rel_mask(ranked[:k], qrels).sum()) / n_rel


def r_precision(ranked: list[int], qrels: dict[int, int]) -> float:
    n_rel = sum(1 for g in qrels.values() if g > 0)
    return precision_at_k(ranked, qrels, n_rel) if n_rel else 0.0


def success_at_k(ranked: list[int], qrels: dict[int, int], k: int) -> float:
    return 1.0 if _rel_mask(ranked[:k], qrels).any() else 0.0


def average_precision(ranked: list[int], qrels: dict[int, int]) -> float:
    rel = _rel_mask(ranked, qrels)
    n_rel = sum(1 for g in qrels.values() if g > 0)
    if n_rel == 0:
        return 0.0
    hits = np.cumsum(rel)
    ranks = np.arange(1, rel.size + 1)
    return float((hits[rel] / ranks[rel]).sum()) / n_rel


def reciprocal_rank(ranked: list[int], qrels: dict[int, int]) -> float:
    rel = _rel_mask(ranked, qrels)
    idx = np.nonzero(rel)[0]
    return 0.0 if idx.size == 0 else 1.0 / (int(idx[0]) + 1)


def dcg_at_k(ranked: list[int], qrels: dict[int, int], k: int) -> float:
    gains = np.array([qrels.get(d, 0) for d in ranked[:k]], dtype=np.float64)
    if gains.size == 0:
        return 0.0
    discounts = np.log2(np.arange(2, gains.size + 2))
    return float((gains / discounts).sum())


def ndcg_at_k(ranked: list[int], qrels: dict[int, int], k: int) -> float:
    ideal = sorted(qrels.values(), reverse=True)[:k]
    idcg = float(sum(g / math.log2(i + 2) for i, g in enumerate(ideal)))
    if idcg == 0.0:
        return 0.0
    return dcg_at_k(ranked, qrels, k) / idcg


def err(ranked: list[int], qrels: dict[int, int], k: int | None = None) -> float:
    g_max = max(qrels.values(), default=0)
    if g_max == 0:
        return 0.0
    docs = ranked if k is None else ranked[:k]
    p_stop_all = np.array([(2 ** qrels.get(d, 0) - 1) / (2 ** g_max) for d in docs])
    out, p_continue = 0.0, 1.0
    for r, p in enumerate(p_stop_all, 1):
        out += p_continue * p / r
        p_continue *= 1.0 - p
    return out


def rbp(ranked: list[int], qrels: dict[int, int], persistence: float = 0.8) -> float:
    rel = _rel_mask(ranked, qrels).astype(np.float64)
    weights = (1.0 - persistence) * persistence ** np.arange(rel.size)
    return float((rel * weights).sum())


def bpref(ranked: list[int], qrels: dict[int, int]) -> float:
    """bpref (metrics.py's judged-preference metric): for each relevant
    doc, penalty = min(#nonrelevant-judged ranked above, R) / min(N, R)."""
    judged_rel = {d for d, g in qrels.items() if g > 0}
    judged_non = {d for d, g in qrels.items() if g == 0}
    R, N = len(judged_rel), len(judged_non)
    if R == 0:
        return 0.0
    non_above = 0
    acc = 0.0
    for d in ranked:
        if d in judged_non:
            non_above += 1
        elif d in judged_rel:
            denom = min(R, N)
            acc += 1.0 - (min(non_above, denom) / denom if denom else 0.0)
    return acc / R


def gmap(ap_values: list[float], eps: float = 1e-5) -> float:
    if not ap_values:
        return 0.0
    return float(np.exp(np.mean(np.log(np.maximum(np.array(ap_values), eps)))))


def evaluate_run(run: dict[str, list[int]], qrels: dict[str, dict[int, int]],
                 k: int = 10) -> dict[str, float]:
    """Aggregate metrics over a run {qid: ranked doc_ids} vs {qid: qrels}.

    Mirrors the reference's evaluate_run summary (metrics.py:877-1023):
    macro-averages over queries present in both run and qrels.
    """
    qids = sorted(set(run) & set(qrels))
    if not qids:
        return {}
    aps, out = [], {}
    acc: dict[str, list[float]] = {m: [] for m in (
        "P", "R", "F1", f"P@{k}", f"R@{k}", "MRR", f"nDCG@{k}", "R-prec",
        f"ERR@{k}", "RBP", "bpref", f"success@{k}")}
    for qid in qids:
        ranked, qr = run[qid], qrels[qid]
        ap = average_precision(ranked, qr)
        aps.append(ap)
        acc["P"].append(precision(ranked, qr))
        acc["R"].append(recall(ranked, qr))
        acc["F1"].append(f1(ranked, qr))
        acc[f"P@{k}"].append(precision_at_k(ranked, qr, k))
        acc[f"R@{k}"].append(recall_at_k(ranked, qr, k))
        acc["MRR"].append(reciprocal_rank(ranked, qr))
        acc[f"nDCG@{k}"].append(ndcg_at_k(ranked, qr, k))
        acc["R-prec"].append(r_precision(ranked, qr))
        acc[f"ERR@{k}"].append(err(ranked, qr, k))
        acc["RBP"].append(rbp(ranked, qr))
        acc["bpref"].append(bpref(ranked, qr))
        acc[f"success@{k}"].append(success_at_k(ranked, qr, k))
    for m, vals in acc.items():
        out[m] = float(np.mean(vals))
    out["MAP"] = float(np.mean(aps))
    out["GMAP"] = gmap(aps)
    out["n_queries"] = float(len(qids))
    return out


def evaluate_run_reduced(run: dict[str, list[int]],
                         run_grades: dict[str, dict[int, int]],
                         hist: dict[str, dict[int, int]],
                         k: int = 10) -> dict[str, float]:
    """``evaluate_run`` from a REDUCED qrels view — the 10^12-doc shape.

    Instead of the full per-query qrels dict (O(judged docs) driver
    state), takes only what the metrics actually consume:

    - ``run_grades[qid][doc]``: grade of each JUDGED run doc (grade 0 =
      judged non-relevant; absent = unjudged) — O(run size);
    - ``hist[qid][grade]``: count of judged docs per grade over the
      WHOLE collection (computed distributed) — O(distinct grades).

    Output is float-identical to ``evaluate_run`` with the full dicts
    (property-tested in tests/test_metrics.py): every metric depends on
    qrels only through ranked-doc grade lookups, the grade multiset,
    and the judged-relevant / judged-nonrelevant counts.
    """
    qids = sorted(set(run) & set(hist))
    if not qids:
        return {}
    aps, out = [], {}
    acc: dict[str, list[float]] = {m: [] for m in (
        "P", "R", "F1", f"P@{k}", f"R@{k}", "MRR", f"nDCG@{k}", "R-prec",
        f"ERR@{k}", "RBP", "bpref", f"success@{k}")}
    for qid in qids:
        ranked = run[qid]
        rg = run_grades.get(qid, {})
        h = hist[qid]
        R = sum(n for g, n in h.items() if g > 0)
        N = sum(n for g, n in h.items() if g == 0)
        grades = np.array([rg.get(d, 0) for d in ranked], dtype=np.float64)
        judged = np.array([d in rg for d in ranked], dtype=bool)
        rel = grades > 0
        n = len(ranked)
        hits = float(rel.sum())
        # P / R / F1 (precision(), recall(), f1() semantics)
        p = hits / n if n else 0.0
        r = hits / R if R else 0.0
        acc["P"].append(p)
        acc["R"].append(r)
        acc["F1"].append(0.0 if p + r == 0 else 2 * p * r / (p + r))
        acc[f"P@{k}"].append(float(rel[:k].sum()) / k if k > 0 else 0.0)
        acc[f"R@{k}"].append(float(rel[:k].sum()) / R if R else 0.0)
        idx = np.nonzero(rel)[0]
        acc["MRR"].append(0.0 if idx.size == 0 else 1.0 / (int(idx[0]) + 1))
        # nDCG@k: ideal gains expand from the histogram (top-k grades desc)
        gains = grades[:k]
        if gains.size:
            dcg = float((gains / np.log2(np.arange(2, gains.size + 2))).sum())
        else:
            dcg = 0.0
        ideal: list[int] = []
        for g in sorted(h, reverse=True):
            take = min(h[g], k - len(ideal))
            ideal.extend([g] * take)
            if len(ideal) >= k:
                break
        idcg = float(sum(g / math.log2(i + 2) for i, g in enumerate(ideal)))
        acc[f"nDCG@{k}"].append(dcg / idcg if idcg else 0.0)
        # R-precision = precision_at_k(ranked, R)
        acc["R-prec"].append(float(rel[:R].sum()) / R if R > 0 else 0.0)
        # ERR@k (graded stop probabilities; g_max over ALL judged docs)
        g_max = max((g for g, cnt in h.items() if cnt > 0), default=0)
        if g_max == 0:
            acc[f"ERR@{k}"].append(0.0)
        else:
            p_stop_all = (2 ** grades[:k] - 1) / (2 ** g_max)
            e, p_cont = 0.0, 1.0
            for rr, ps in enumerate(p_stop_all, 1):
                e += p_cont * ps / rr
                p_cont *= 1.0 - ps
            acc[f"ERR@{k}"].append(e)
        weights = (1.0 - 0.8) * 0.8 ** np.arange(rel.size)  # rbp() float-exact
        acc["RBP"].append(float((rel.astype(np.float64) * weights).sum()))
        # bpref over judged run docs only (unjudged docs don't count)
        if R == 0:
            acc["bpref"].append(0.0)
        else:
            non_above, bp = 0, 0.0
            for d_judged, d_rel in zip(judged, rel):
                if d_judged and not d_rel:
                    non_above += 1
                elif d_rel:
                    denom = min(R, N)
                    bp += 1.0 - (min(non_above, denom) / denom if denom else 0.0)
            acc["bpref"].append(bp / R)
        acc[f"success@{k}"].append(1.0 if rel[:k].any() else 0.0)
        # AP over the full ranked list
        if R == 0:
            aps.append(0.0)
        else:
            cum = np.cumsum(rel)
            ranks = np.arange(1, rel.size + 1)
            aps.append(float((cum[rel] / ranks[rel]).sum()) / R)
    for m, vals in acc.items():
        out[m] = float(np.mean(vals))
    out["MAP"] = float(np.mean(aps))
    out["GMAP"] = gmap(aps)
    out["n_queries"] = float(len(qids))
    return out


def pr_curve_reduced(rel_flags: list[bool], n_rel: int) -> list[tuple[float, float]]:
    """``pr_curve`` from membership flags + the distributed relevant
    COUNT — no relevant-doc set on the driver."""
    if not rel_flags or n_rel == 0:
        return [(0.0, 0.0)]
    pts, hits = [], 0
    for rank, is_rel in enumerate(rel_flags, 1):
        if is_rel:
            hits += 1
        pts.append((hits / n_rel, hits / rank))
    return pts


def precision_at_recall_reduced(rel_flags: list[bool], n_rel: int,
                                levels: int = 11) -> list[tuple[float, float]]:
    """``precision_at_recall`` over the reduced view."""
    curve = pr_curve_reduced(rel_flags, n_rel)
    out = []
    for i in range(levels):
        level = i / 10
        out.append((level, max((p for r, p in curve if r >= level),
                               default=0.0)))
    return out


def pr_curve(ranked: list[int], relevant: set[int]) -> list[tuple[float, float]]:
    """Raw precision-recall points along a ranking — the app evaluation
    service's `_pr_curve` (evaluation_service.py:597-612): one
    (recall, precision) point per rank; [(0, 0)] when either side is
    empty."""
    if not ranked or not relevant:
        return [(0.0, 0.0)]
    pts, hits = [], 0
    for rank, doc_id in enumerate(ranked, 1):
        if doc_id in relevant:
            hits += 1
        pts.append((hits / len(relevant), hits / rank))
    return pts


def precision_at_recall(ranked: list[int], relevant: set[int],
                        levels: int = 11) -> list[tuple[float, float]]:
    """11-point interpolated precision (`_precision_at_recall` /
    `_interpolated_precision`, evaluation_service.py:579-595, 614-623):
    precision at level = max precision over curve points with
    recall >= level, default 0.0."""
    curve = pr_curve(ranked, relevant)
    out = []
    for i in range(levels):
        level = i / 10
        out.append((level, max((p for r, p in curve if r >= level),
                               default=0.0)))
    return out


def f_beta(p: float, r: float, beta: float) -> float:
    """F-beta (`_f_beta_scores`, evaluation_service.py:627-650):
    (1+b^2)PR / (b^2 P + R), 0 when the denominator is 0."""
    denom = beta * beta * p + r
    return (1 + beta * beta) * p * r / denom if denom else 0.0
