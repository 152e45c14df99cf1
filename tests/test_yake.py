"""YAKE kernel tests (functions/yake.py) — hand-computed unigram golden,
full-extractor feature behavior, and seqm deduplication."""

import math

from news_information_retrieval_system_ray.functions.yake import (
    yake_keywords,
    yake_unigram_scores,
)


def _unigram_golden(seq):
    """Independent re-derivation of the sentence-free unigram spec."""
    terms = sorted(set(seq))
    pos = {t: [i for i, w in enumerate(seq) if w == t] for t in terms}
    tf = {t: len(pos[t]) for t in terms}
    tfs = list(tf.values())
    mean = sum(tfs) / len(tfs)
    std = math.sqrt(sum((x - mean) ** 2 for x in tfs) / len(tfs))
    mx = max(tfs)
    out = {}
    for t in terms:
        sp = pos[t]
        m = len(sp)
        med = (sp[m // 2] + 1) if m % 2 else (sp[m // 2 - 1] + sp[m // 2]) / 2 + 1
        posw = math.log(math.log(3 + med))
        lset = {seq[p - 1] for p in sp if p > 0}
        rset = {seq[p + 1] for p in sp if p < len(seq) - 1}
        lc = sum(1 for p in sp if p > 0)
        rc = sum(1 for p in sp if p < len(seq) - 1)
        wl = len(lset) / lc if lc else 0.0
        wr = len(rset) / rc if rc else 0.0
        rel = 1 + (wl + wr) * tf[t] / mx
        tfn = tf[t] / (mean + std)
        out[t] = (rel * posw) / ((tfn + 1) / rel)
    return out


def test_unigram_matches_independent_golden():
    seq = "a b a c b a d e a b".split()
    terms = sorted(set(seq))
    positions = [[i for i, w in enumerate(seq) if w == t] for t in terms]
    got = dict(yake_unigram_scores(terms, positions))
    want = _unigram_golden(seq)
    assert set(got) == set(want)
    for t in got:
        assert abs(got[t] - want[t]) < 1e-12, t


def test_unigram_ordering_and_edges():
    # single token: rel=1, med=1 -> ln(ln(4)); tfnorm = 1/(1+0) = 1
    got = yake_unigram_scores(["only"], [[0]])
    assert len(got) == 1
    assert abs(got[0][1] - math.log(math.log(4.0)) / 2.0) < 1e-12
    assert yake_unigram_scores([], []) == []
    # ties break term-ascending
    seq = ["x", "y"]  # symmetric stats except position
    terms = sorted(set(seq))
    positions = [[i for i, w in enumerate(seq) if w == t] for t in terms]
    ranked = yake_unigram_scores(terms, positions)
    assert ranked[0][0] == "x"  # earlier median position -> lower (better)


def test_full_yake_prefers_frequent_early_dispersed():
    text = ("Spark streams data. Spark joins tables. Spark scales well. "
            "Obscure word appears once at the end.")
    ranked = yake_keywords(text, k=5, max_ngram=1)
    names = [w for w, _ in ranked]
    assert names[0] == "spark"


def test_full_yake_phrases_and_dedup():
    text = ("machine learning models train fast. "
            "machine learning models generalize. "
            "machine learning wins.")
    ranked = yake_keywords(text, k=10, max_ngram=3, dedup_lim=0.9)
    names = [w for w, _ in ranked]
    assert any(" " in n for n in names)  # multi-word phrases exist
    # seqm dedup: 'machine learning models' and 'machine learning model*'
    # style near-dups can't both appear at ratio >= 0.9
    for i, a in enumerate(names):
        for b in names[i + 1:]:
            from difflib import SequenceMatcher

            assert SequenceMatcher(None, a, b).ratio() < 0.9
    # scores ascend (lower = better keyword)
    scores = [s for _, s in ranked]
    assert scores == sorted(scores)


def test_full_yake_casing_feature():
    # An ACRONYM in the middle of sentences gets W_Case credit -> ranks
    # better than the same-shape lowercase term with identical stats.
    text = ("alpha NASA beta. gamma NASA delta. epsilon NASA zeta. "
            "alpha rover beta. gamma rover delta. epsilon rover zeta.")
    ranked = dict(yake_keywords(text, k=20, max_ngram=1))
    assert ranked["nasa"] < ranked["rover"]


def test_full_yake_empty_and_stops():
    assert yake_keywords("", k=5) == []
    ranked = yake_keywords("the cat sat on the mat", k=5,
                           stops=frozenset({"the", "on"}))
    names = [w for w, _ in ranked]
    assert "the" not in names and "on" not in names


def test_keyword_eval_kernels():
    from news_information_retrieval_system_ray.functions.keyword_eval import (
        coverage,
        diversity,
        precision_recall_f1,
    )

    p, r, f1 = precision_recall_f1(["a", "b", "c"], ["b", "c", "d", "e"])
    assert p == 2 / 3 and r == 0.5
    assert abs(f1 - (2 * p * r / (p + r))) < 1e-12
    assert precision_recall_f1([], ["a"]) == (0.0, 0.0, 0.0)
    # diversity: phrase lists with repeated tokens (evaluator.py:435-471)
    assert diversity(["data lake", "lake house"]) == 3 / 4
    assert diversity(["x", "y"]) == 1.0
    # coverage is occurrence-weighted over the text tokens (:473-515)
    assert coverage(["cat"], ["the", "cat", "sat", "cat"]) == 0.5
    assert coverage([], ["a"]) == 0.0


def test_keyword_eval_pipeline(ray_session, sf_dir):
    from news_information_retrieval_system_ray.pipelines import analytics as A

    out = A.keyword_eval(sf_dir)
    assert set(out.columns) == {"doc_id", "p_at_k", "r_at_k", "f1", "coverage"}
    for c in ("p_at_k", "r_at_k", "f1", "coverage"):
        assert out[c].between(0, 1).all()
    # F1 consistency with P/R on a sample
    s = out.head(20)
    import numpy as np
    pr = s["p_at_k"] + s["r_at_k"]
    exp = np.where(pr > 0, 2 * s["p_at_k"] * s["r_at_k"] / pr, 0.0)
    assert np.allclose(s["f1"], exp, atol=5e-4)
