"""Golden tests for the summarizer battery (static.py:110-698 semantics)
and the RAKE keyphrase extractor (rake_extractor.py:84-246)."""

import math

import pytest

from news_information_retrieval_system_ray.functions.keywords import (
    rake_keywords,
    rake_phrases,
)
from news_information_retrieval_system_ray.functions.stopwords import (
    EN_STOPWORDS,
    filter_stopwords,
    load_stopwords,
)
from news_information_retrieval_system_ray.functions.summarize import (
    key_sentence_summary,
    multi_doc_summary,
    query_focused_summary,
    segment_sentences,
    sent_tokenize,
)

STOPS = frozenset({"the", "of", "and", "a", "in", "is", "to"})


# ------------------------------------------------------------------ RAKE

def test_rake_phrases_split_on_stopwords():
    toks = "deep learning is the best of machine learning".split()
    assert rake_phrases(toks, STOPS) == [
        ("deep", "learning"), ("best",), ("machine", "learning")]


def test_rake_phrase_max_len():
    toks = "one two three four five six".split()
    assert rake_phrases(toks, STOPS, max_len=4) == [
        ("one", "two", "three", "four"), ("five", "six")]


def test_rake_scores_hand_computed():
    # phrases: (deep, learning), (best), (machine, learning)
    # freq: deep 1, learning 2, best 1, machine 1
    # deg : deep 2, learning 4, best 1, machine 2
    # score: deep 2.0, learning 2.0, best 1.0, machine 2.0
    # phrase scores: "deep learning"=4.0, "machine learning"=4.0, "best"=1.0
    toks = "deep learning is the best of machine learning".split()
    out = rake_keywords(toks, STOPS, k=5)
    assert out == [("deep learning", 4.0), ("machine learning", 4.0), ("best", 1.0)]


def test_rake_empty_and_all_stopwords():
    assert rake_keywords([], STOPS) == []
    assert rake_keywords(["the", "of", "a"], STOPS) == []


# ------------------------------------------------------------- stopwords

def test_stopword_sets():
    zh = load_stopwords("zh")
    assert "我們" in zh and "的" in zh and len(zh) > 200
    assert "the" in EN_STOPWORDS
    assert load_stopwords("xx") == frozenset()
    assert filter_stopwords(["the", "cat", "sat"], EN_STOPWORDS) == ["cat", "sat"]


# ----------------------------------------------------------- summarizers

def test_sent_tokenize_cjk_explodes():
    assert sent_tokenize("Hello 世界 world") == ["hello", "世", "界", "world"]


def test_segment_positions_count_filtered():
    # short sentences are dropped but still advance the position counter
    text = "tiny one. alpha beta gamma delta epsilon. ok. zeta eta theta iota kappa."
    sents = segment_sentences(text, min_len=5, max_len=100)
    assert [(p, toks) for p, _, toks in sents] == [
        (1, ["alpha", "beta", "gamma", "delta", "epsilon"]),
        (3, ["zeta", "eta", "theta", "iota", "kappa"]),
    ]


def test_key_sentence_hand_computed():
    # 2 sentences, min_len=1 so both kept.
    # s0: "apple apple banana" s1: "banana cherry cherry"
    # tf: apple 2, banana 2, cherry 2; df: apple 1, banana 2, cherry 1
    # idf: apple ln2, banana 0, cherry ln2
    # s0 score = (2*ln2 + 2*ln2 + 2*0)/3 = 4ln2/3; bias pos0: *1.5
    # s1 score = (2*0 + 2*ln2 + 2*ln2)/3 = 4ln2/3; bias pos1: *1.25
    text = "apple apple banana. banana cherry cherry."
    out = key_sentence_summary(text, k=1, min_len=1)
    assert out == ["apple apple banana"]
    out2 = key_sentence_summary(text, k=1, min_len=1, position_bias=False)
    # equal scores -> stable order keeps the earlier sentence
    assert out2 == ["apple apple banana"]


def test_query_focused_hand_computed():
    text = "dogs are loyal pets always. cats are independent pets mostly. birds can fly far away."
    # query tokens {dogs, cats}; s0 overlap 1, s1 overlap 1, s2 overlap 0
    out = query_focused_summary(text, "dogs cats", k=2, min_len=1)
    assert out == ["dogs are loyal pets always", "cats are independent pets mostly"]
    # normalization check: overlap/sqrt(2*5) identical for both
    sents = segment_sentences(text, min_len=1)
    assert len(sents) == 3


def test_multi_doc_diversity():
    # two near-identical docs and one different: diversity skips the dup
    docs = ["alpha beta gamma delta epsilon.",
            "alpha beta gamma delta epsilon.",
            "zeta eta theta iota kappa."]
    out = multi_doc_summary(docs, k=2, min_len=1)
    assert len(out) == 2
    picked_docs = {di for di, _ in out}
    assert picked_docs == {0, 2}  # the duplicate (doc 1) is skipped


def test_multi_doc_order_is_doc_position():
    docs = ["low low low low low.", "unique words score higher here."]
    out = multi_doc_summary(docs, k=2, min_len=1)
    assert [di for di, _ in out] == sorted(di for di, _ in out)
