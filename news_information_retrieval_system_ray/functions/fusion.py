"""Rank-fusion kernels (reference /root/reference/src/ir/ranking/hybrid.py:241-433).

All take ``runs``: list of ranked lists ``[(doc_id, score), ...]`` in
rank order, and return a fused ``[(doc_id, score), ...]`` in canonical
(-score, doc_id) order.

- ``minmax_normalize``: per-run min-max to [0, 1] (constant runs -> 1.0,
  the reference's degenerate-case choice).
- ``fuse_linear``: weighted sum of normalized scores.
- ``fuse_rrf``: reciprocal-rank fusion, 1/(k + rank), k=60 default.
- ``fuse_combsum`` / ``fuse_combmnz``: sum of normalized scores; MNZ
  multiplies by the number of runs containing the doc.
"""

from __future__ import annotations

RRF_K = 60.0


def minmax_normalize(run: list[tuple[int, float]]) -> list[tuple[int, float]]:
    if not run:
        return []
    scores = [s for _, s in run]
    lo, hi = min(scores), max(scores)
    if hi == lo:
        return [(d, 1.0) for d, _ in run]
    return [(d, (s - lo) / (hi - lo)) for d, s in run]


def _order(acc: dict[int, float]) -> list[tuple[int, float]]:
    return sorted(acc.items(), key=lambda x: (-x[1], x[0]))


def fuse_linear(runs: list[list[tuple[int, float]]],
                weights: list[float] | None = None) -> list[tuple[int, float]]:
    weights = weights or [1.0] * len(runs)
    acc: dict[int, float] = {}
    for run, w in zip(runs, weights):
        for d, s in minmax_normalize(run):
            acc[d] = acc.get(d, 0.0) + w * s
    return _order(acc)


def fuse_rrf(runs: list[list[tuple[int, float]]], k: float = RRF_K,
             weights: list[float] | None = None) -> list[tuple[int, float]]:
    weights = weights or [1.0] * len(runs)
    acc: dict[int, float] = {}
    for run, w in zip(runs, weights):
        for rank, (d, _) in enumerate(run, 1):
            acc[d] = acc.get(d, 0.0) + w / (k + rank)
    return _order(acc)


def fuse_combsum(runs: list[list[tuple[int, float]]]) -> list[tuple[int, float]]:
    acc: dict[int, float] = {}
    for run in runs:
        for d, s in minmax_normalize(run):
            acc[d] = acc.get(d, 0.0) + s
    return _order(acc)


def fuse_combmnz(runs: list[list[tuple[int, float]]]) -> list[tuple[int, float]]:
    acc: dict[int, float] = {}
    hits: dict[int, int] = {}
    for run in runs:
        for d, s in minmax_normalize(run):
            acc[d] = acc.get(d, 0.0) + s
            hits[d] = hits.get(d, 0) + 1
    return _order({d: s * hits[d] for d, s in acc.items()})
