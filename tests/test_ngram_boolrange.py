"""N-gram LM smoothing/perplexity parity (ngram.py:43-421) and boolean
parser field/range predicate extensions (query_parser.py RANGE nodes)."""

import math

import numpy as np
import pytest

from news_information_retrieval_system_ray.functions.boolquery import (
    parse_boolean,
    search_boolean,
)
from news_information_retrieval_system_ray.functions.ngram_lm import (
    NGramLM,
    default_tokenizer,
)

DOCS = [["the", "cat", "sat"], ["the", "dog", "ran"], ["the", "cat", "ran"]]


def test_default_tokenizer():
    assert default_tokenizer("Hello 世界ok Test42!") == ["hello", "世界", "ok", "test42"]


def test_mle_bigram_probability():
    m = NGramLM(n=2, smoothing="mle").train(DOCS)
    # count(the, cat)=2, count context (the)=3
    assert m.probability(("the",), "cat") == pytest.approx(2 / 3)
    assert m.probability(("cat",), "sat") == pytest.approx(1 / 2)
    assert m.probability(("cat",), "flew") == 0.0


def test_laplace_bigram():
    m = NGramLM(n=2, smoothing="laplace").train(DOCS)
    # V = 5 (the, cat, sat, dog, ran)
    assert m.probability(("the",), "cat") == pytest.approx((2 + 1) / (3 + 5))
    assert m.probability(("cat",), "flew") == pytest.approx(1 / (2 + 5))


def test_jm_and_dirichlet():
    m = NGramLM(n=2, smoothing="jm").train(DOCS)
    # P(cat|the): ML 2/3; Pc(cat) = 2/9
    assert m.probability(("the",), "cat") == pytest.approx(0.7 * 2 / 3 + 0.3 * 2 / 9)
    d = NGramLM(n=2, smoothing="dirichlet").train(DOCS)
    # (2 + 2000 * 2/9) / (3 + 2000)
    assert d.probability(("the",), "cat") == pytest.approx(
        (2 + 2000 * 2 / 9) / (3 + 2000))


def test_from_counts_matches_train():
    trained = NGramLM(n=2, smoothing="laplace").train(DOCS)
    uni = {}
    for doc in DOCS:
        for w in doc:
            uni[w] = uni.get(w, 0) + 1
    loaded = NGramLM.from_counts(2, trained.ngram_counts, trained.context_counts,
                                 uni, smoothing="laplace")
    for ctx, w in [(("the",), "cat"), (("cat",), "sat"), (("dog",), "ran")]:
        assert loaded.probability(ctx, w) == pytest.approx(trained.probability(ctx, w))
    toks = ["the", "cat", "ran"]
    assert loaded.perplexity(toks) == pytest.approx(trained.perplexity(toks))


def test_perplexity_formula():
    m = NGramLM(n=1, smoothing="laplace").train(DOCS)
    toks = ["the", "cat"]
    # unigram: P(the) = (3+1)/(9+5), P(cat) = (2+1)/(9+5)
    p1, p2 = 4 / 14, 3 / 14
    expect = 2 ** (-(math.log2(p1) + math.log2(p2)) / 2)
    assert m.perplexity(toks) == pytest.approx(expect)
    assert m.perplexity([]) == float("inf")


def test_sentence_probability_start_pad():
    m = NGramLM(n=2, smoothing="laplace").train(DOCS)
    # first event is P(the | <START>): unseen context -> (0+1)/(0+V)
    p = m.sentence_probability(["the"])
    assert p == pytest.approx(1 / 5)


# ------------------------------------------------------- parser extensions

def test_parse_keeps_predicates_whole():
    toks = parse_boolean("date:[2025-01-01 TO 2025-02-01] AND status:F")
    assert toks == ["date:[2025-01-01 TO 2025-02-01]", "status:F", "AND"]


def test_search_with_field_and_range():
    universe = np.arange(10, dtype=np.int64)
    postings = {"cat": np.array([1, 2, 3], dtype=np.int64)}

    def field_docs(field, value):
        assert (field, value) == ("status", "F")
        return np.array([2, 3, 4], dtype=np.int64)

    def range_docs(field, start, end):
        assert (field, start, end) == ("date", "2025-01-01", "2025-02-01")
        return np.array([3, 4, 5], dtype=np.int64)

    out = search_boolean(
        "cat AND status:F AND date:[2025-01-01 TO 2025-02-01]",
        lambda t: postings.get(t, np.empty(0, dtype=np.int64)),
        universe, field_docs=field_docs, range_docs=range_docs)
    assert list(out) == [3]


def test_predicates_require_callbacks():
    universe = np.arange(3, dtype=np.int64)
    with pytest.raises(ValueError, match="field predicate"):
        search_boolean("status:F", lambda t: universe, universe)
    with pytest.raises(ValueError, match="range predicate"):
        search_boolean("d:[1 TO 2]", lambda t: universe, universe)


def test_ngram_generate_deterministic_and_on_distribution():
    from news_information_retrieval_system_ray.functions.ngram_lm import NGramLM

    m = NGramLM(n=2, smoothing="laplace")
    m.train([["the", "cat", "sat", "on", "the", "mat"],
             ["the", "cat", "ran"]])
    out = m.generate(("the",), max_len=4, seed=3)
    assert out == m.generate(("the",), max_len=4, seed=3)  # reproducible
    assert out and out[0] in {"cat", "mat"}  # observed bigram continuation
    greedy = m.generate(("the",), max_len=4)
    assert greedy[0] == "cat"  # argmax of P(.|the): cat has count 2
    # unseen context stops immediately
    assert m.generate(("zebra",), max_len=4) == []


def test_svo_tree_walk_reference_semantics():
    from news_information_retrieval_system_ray.functions.svo import (
        DependencyEdge as E,
        extract_svo,
    )

    # full SVO: root at index 2, nsubj child, dobj child (parser.py:453-505)
    edges = [E(0, 2, "ROOT", "likes", "root"),
             E(2, 1, "likes", "kim", "nsubj"),
             E(2, 3, "likes", "tea", "dobj")]
    (t,) = extract_svo(edges)
    assert (t.subject, t.verb, t.object, t.confidence) == ("kim", "likes", "tea", 1.0)
    # SV only -> confidence 0.7, dropped when include_partial=False
    sv = [E(0, 2, "ROOT", "runs", "root"), E(2, 1, "runs", "kim", "nsubj")]
    (p,) = extract_svo(sv)
    assert p.object is None and p.confidence == 0.7
    assert extract_svo(sv, include_partial=False) == []
    # no root / no subject -> nothing
    assert extract_svo([E(2, 1, "x", "y", "nsubj")]) == []
    assert extract_svo([E(0, 2, "ROOT", "v", "root"),
                        E(2, 3, "v", "o", "dobj")]) == []
    # subject priority: first matching relation wins; 'top' accepted
    edges2 = [E(0, 2, "ROOT", "v", "root"),
              E(2, 1, "v", "s1", "top"),
              E(2, 4, "v", "s2", "nsubj"),
              E(2, 3, "v", "o", "attr")]
    (t2,) = extract_svo(edges2)
    assert (t2.subject, t2.object) == ("s1", "o")


def test_svo_stage_over_documents(ray_session, sf_dir):
    from news_information_retrieval_system_ray.pipelines import analytics as A

    out = A.svo_triples(sf_dir, limit=50)
    assert set(out.columns) == {"doc_id", "subject", "verb", "object", "confidence"}
    assert len(out) > 0
    assert out["confidence"].isin([1.0, 0.7]).all()


def test_proximity_and_window_match(ray_session, sf_dir):
    import numpy as np

    from news_information_retrieval_system_ray.pipelines import analytics as A

    prox = A.proximity_match(sf_dir)
    win = A.window_match(sf_dir)
    assert len(prox) > 0 and len(win) > 0
    # every proximity hit must be verifiable against raw token positions
    import pyarrow.parquet as pq

    from news_information_retrieval_system_ray.functions.tokenize import tokenize
    docs = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    docs = docs.set_index("doc_id")["text"]
    t1, t2 = A.PROX_TERMS
    for doc_id in prox["doc_id"].head(5):
        toks = tokenize(docs.loc[doc_id], engine="whitespace")
        p1 = [i for i, t in enumerate(toks) if t == t1]
        p2 = [i for i, t in enumerate(toks) if t == t2]
        assert min(abs(a - b) for a in p1 for b in p2) <= A.PROX_DIST
    # a proximity miss containing both terms must exceed the distance
    have_both = [d for d, txt in docs.items()
                 if t1 in tokenize(txt, engine="whitespace")
                 and t2 in tokenize(txt, engine="whitespace")]
    misses = sorted(set(have_both) - set(prox["doc_id"]))
    for doc_id in misses[:3]:
        toks = tokenize(docs.loc[doc_id], engine="whitespace")
        p1 = [i for i, t in enumerate(toks) if t == t1]
        p2 = [i for i, t in enumerate(toks) if t == t2]
        assert min(abs(a - b) for a in p1 for b in p2) > A.PROX_DIST
    # window hits: one position per term with span < WINDOW_SIZE
    for doc_id in win["doc_id"].head(3):
        toks = tokenize(docs.loc[doc_id], engine="whitespace")
        pos = {t: [i for i, x in enumerate(toks) if x == t] for t in A.WINDOW_TERMS}
        best = min(
            max(c) - min(c)
            for c in __import__("itertools").product(*(pos[t] for t in A.WINDOW_TERMS)))
        assert best < A.WINDOW_SIZE
