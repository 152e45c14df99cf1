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
