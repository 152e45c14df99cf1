"""KeyBERT-on-hashing-encoder kernel tests (functions/keybert.py).

Reference semantics: keybert_extractor.py:130-295 — 1..3-gram
candidates over the stopword-filtered sequence, cosine to the doc
embedding, MMR (lambda = 1 - diversity) greedy selection.
"""

import numpy as np
import pytest

from news_information_retrieval_system_ray.functions.keybert import (
    candidate_phrases, embed_phrases, keybert_extract)
from news_information_retrieval_system_ray.stages.dense import encode_text


STOPS = frozenset({"the", "a", "of"})


def test_candidates_are_ngrams_of_filtered_sequence():
    toks = ["the", "quick", "fox", "of", "red", "farm"]
    # filtered seq: quick fox red farm -> 4 unigrams, 3 bigrams, 2 trigrams
    cands = candidate_phrases(toks, STOPS, ngram_max=3)
    assert "quick fox" in cands           # adjacent in original
    assert "fox red" in cands             # adjacent only AFTER stop removal
    assert "quick fox red" in cands
    assert "the" not in cands and "of red" not in cands
    assert cands == sorted(cands)
    assert len(cands) == 4 + 3 + 2


def test_phrase_embedding_matches_encode_text():
    mat = embed_phrases(["quick fox", "fox"], dim=32)
    np.testing.assert_array_equal(mat[0], encode_text("quick fox", 32))
    np.testing.assert_array_equal(mat[1], encode_text("fox", 32))


def test_extract_first_pick_is_most_similar_and_scores_sorted_desc_start():
    toks = "alpha beta gamma alpha beta alpha".split()
    out = keybert_extract(toks, frozenset(), dim=32, top_n=3)
    assert out, "non-empty extraction"
    # pick 1 is the global argmax of cosine-to-doc over all candidates
    cands = candidate_phrases(toks, frozenset())
    doc = encode_text(" ".join(toks), 32)
    best = max(
        cands,
        key=lambda c: (round(float(
            np.dot(encode_text(c, 32), doc)
            / (np.linalg.norm(encode_text(c, 32)) * np.linalg.norm(doc))), 4),
            # tie-break mirrors the kernel: phrase ASC wins
            [-ord(ch) for ch in c]),
    )
    assert out[0][0] == best


def test_diversity_changes_selection():
    # repeated phrase dominates; with diversity the 2nd pick must differ
    toks = ("spark join spark join spark join " "merge sort table").split()
    rel_only = keybert_extract(toks, frozenset(), dim=32, top_n=4,
                               diversity=0.0)
    diverse = keybert_extract(toks, frozenset(), dim=32, top_n=4,
                              diversity=0.9)
    assert [p for p, _ in rel_only] != [p for p, _ in diverse]
    # both report the round4 cosine-to-doc as the score
    for phrase, score in rel_only + diverse:
        assert -1.0 <= score <= 1.0


def test_empty_and_all_stopword_docs():
    assert keybert_extract([], STOPS) == []
    assert keybert_extract(["the", "of", "a"], STOPS) == []


def test_top_n_caps_output():
    toks = "one two three four five six seven".split()
    out = keybert_extract(toks, frozenset(), top_n=5)
    assert len(out) == 5
    assert len({p for p, _ in out}) == 5  # no repeats


def test_deterministic_across_calls():
    toks = "window batch stream row column key hash scan".split()
    a = keybert_extract(toks, frozenset(), top_n=5)
    b = keybert_extract(toks, frozenset(), top_n=5)
    assert a == b
