"""Metric kernels vs hand-computed values (reference metrics.py:84-872
semantics; 3-doc toy examples mirror its unit-test style, SURVEY §5)."""

import math

import pytest

from news_information_retrieval_system_ray.functions.metrics import (
    average_precision,
    bpref,
    dcg_at_k,
    err,
    evaluate_run,
    f1,
    gmap,
    ndcg_at_k,
    precision,
    precision_at_k,
    r_precision,
    rbp,
    recall,
    recall_at_k,
    reciprocal_rank,
    success_at_k,
)

QRELS = {1: 2, 2: 1, 3: 0, 4: 1}  # relevant: 1, 2, 4 (graded)
RANKED = [1, 3, 2, 5, 4]


def test_precision_recall_f1():
    assert precision(RANKED, QRELS) == pytest.approx(3 / 5)
    assert recall(RANKED, QRELS) == pytest.approx(1.0)
    p, r = 3 / 5, 1.0
    assert f1(RANKED, QRELS) == pytest.approx(2 * p * r / (p + r))


def test_precision_recall_at_k():
    assert precision_at_k(RANKED, QRELS, 2) == pytest.approx(1 / 2)
    assert precision_at_k(RANKED, QRELS, 3) == pytest.approx(2 / 3)
    assert recall_at_k(RANKED, QRELS, 3) == pytest.approx(2 / 3)
    assert r_precision(RANKED, QRELS) == pytest.approx(2 / 3)  # R=3 -> P@3
    assert success_at_k(RANKED, QRELS, 1) == 1.0
    assert success_at_k([3, 5], QRELS, 2) == 0.0


def test_average_precision():
    # hits at ranks 1, 3, 5 -> (1/1 + 2/3 + 3/5) / 3
    assert average_precision(RANKED, QRELS) == pytest.approx((1 + 2 / 3 + 3 / 5) / 3)


def test_reciprocal_rank():
    assert reciprocal_rank(RANKED, QRELS) == 1.0
    assert reciprocal_rank([3, 1], QRELS) == pytest.approx(1 / 2)
    assert reciprocal_rank([3, 5], QRELS) == 0.0


def test_dcg_ndcg():
    # gains [2,0,1,0,1] / log2([2,3,4,5,6])
    expect = 2 / math.log2(2) + 1 / math.log2(4) + 1 / math.log2(6)
    assert dcg_at_k(RANKED, QRELS, 5) == pytest.approx(expect)
    ideal = 2 / math.log2(2) + 1 / math.log2(3) + 1 / math.log2(4)
    assert ndcg_at_k(RANKED, QRELS, 5) == pytest.approx(expect / ideal)
    perfect = [1, 2, 4]
    assert ndcg_at_k(perfect, QRELS, 3) == pytest.approx(1.0)


def test_err_monotone_in_rank():
    early = err([1, 5, 6], QRELS, 3)
    late = err([5, 6, 1], QRELS, 3)
    assert early > late > 0.0


def test_rbp():
    # rel pattern [1,0,1,0,1], p=0.5 -> 0.5*(1 + 0.25 + 0.0625)
    assert rbp(RANKED, QRELS, persistence=0.5) == pytest.approx(0.5 * (1 + 0.25 + 0.0625))


def test_bpref():
    # judged nonrel: {3}; ranked: 1(rel, 0 nonrel above), 3(nonrel),
    # 2(rel, 1 above -> 1 - 1/1 = 0), 4(rel, 1 above -> 0); R=3
    assert bpref(RANKED, QRELS) == pytest.approx(1 / 3)


def test_gmap():
    assert gmap([1.0, 1.0]) == pytest.approx(1.0)
    assert gmap([0.25, 1.0]) == pytest.approx(0.5)
    assert gmap([]) == 0.0


def test_evaluate_run_summary():
    run = {"q1": RANKED, "q2": [2, 1]}
    qrels = {"q1": QRELS, "q2": {1: 1, 2: 1}}
    out = evaluate_run(run, qrels, k=5)
    assert out["n_queries"] == 2.0
    assert out["MAP"] == pytest.approx((average_precision(RANKED, QRELS) + 1.0) / 2)
    assert 0.0 < out["GMAP"] <= out["MAP"]
    assert out["MRR"] == 1.0


def test_pr_curve_and_interpolation():
    from news_information_retrieval_system_ray.functions.metrics import (
        f_beta,
        pr_curve,
        precision_at_recall,
    )

    # ranking [r, n, r, n]; relevant {1, 3}
    pts = pr_curve([1, 2, 3, 4], {1, 3})
    assert pts == [(0.5, 1.0), (0.5, 0.5), (1.0, 2 / 3), (1.0, 0.5)]
    # interpolated: levels <= 0.5 take max precision at recall >= level
    interp = dict(precision_at_recall([1, 2, 3, 4], {1, 3}))
    assert interp[0.0] == 1.0
    assert interp[0.5] == 1.0
    assert interp[0.6] == 2 / 3          # only points with recall 1.0
    assert interp[1.0] == 2 / 3
    # empty edges -> single (0,0) point, all-zero interpolation
    assert pr_curve([], {1}) == [(0.0, 0.0)]
    assert pr_curve([1], set()) == [(0.0, 0.0)]
    assert all(p == 0.0 for _, p in precision_at_recall([], {1}))
    # f-beta: beta=1 reduces to F1; zero denominator -> 0
    assert f_beta(0.5, 0.5, 1.0) == 0.5
    assert f_beta(0.0, 0.0, 2.0) == 0.0
    assert abs(f_beta(1.0, 0.2, 0.5) - (1.25 * 0.2 / (0.25 + 0.2))) < 1e-12


def test_evaluate_run_reduced_matches_full():
    """evaluate_run_reduced (distributed-shape qrels view) must be
    float-identical to evaluate_run with the full qrels dict — random
    runs/qrels including judged-nonrelevant (grade 0) docs for bpref."""
    import numpy as np

    from news_information_retrieval_system_ray.functions.metrics import (
        evaluate_run,
        evaluate_run_reduced,
        pr_curve,
        pr_curve_reduced,
        precision_at_recall,
        precision_at_recall_reduced,
    )

    rng = np.random.default_rng(4)
    for trial in range(30):
        n_docs = int(rng.integers(5, 60))
        qids = [f"q{i}" for i in range(int(rng.integers(1, 4)))]
        qrels = {}
        run = {}
        for qid in qids:
            judged = rng.choice(n_docs, size=int(rng.integers(0, n_docs)), replace=False)
            qrels[qid] = {int(d): int(rng.integers(0, 3)) for d in judged}
            run[qid] = [int(d) for d in
                        rng.choice(n_docs, size=int(rng.integers(0, 15)), replace=False)]
        k = int(rng.integers(1, 12))
        full = evaluate_run(run, qrels, k=k)
        # reduced view: run-doc grades (judged only) + grade histogram
        run_grades = {qid: {d: g for d, g in qrels[qid].items() if d in set(run[qid])}
                      for qid in qids}
        hist = {}
        for qid in qids:
            h = {}
            for g in qrels[qid].values():
                h[g] = h.get(g, 0) + 1
            hist[qid] = h
        red = evaluate_run_reduced(run, run_grades, hist, k=k)
        assert set(full) == set(red)
        for m in full:
            assert full[m] == red[m], (trial, m, full[m], red[m])
        # reduced PR curves too
        for qid in qids:
            rel = {d for d, g in qrels[qid].items() if g > 0}
            flags = [d in rel for d in run[qid]]
            assert pr_curve(run[qid], rel) == pr_curve_reduced(flags, len(rel))
            assert precision_at_recall(run[qid], rel) == \
                precision_at_recall_reduced(flags, len(rel))
