"""Snippet / highlight / KWIC kernels (search_service.py:627-703,
dynamic.py:100-472 semantics)."""

from news_information_retrieval_system_ray.functions.snippets import (
    highlight,
    kwic_windows,
    make_snippet,
    split_sentences,
)


def test_split_sentences_cjk_and_ascii():
    assert split_sentences("甲句。乙句！丙句？end.") == ["甲句", "乙句", "丙句", "end"]


def test_snippet_picks_sentence_with_most_distinct_hits():
    text = "nothing here. spark alone. spark join together!"
    assert make_snippet(text, ["spark", "join"]) == "spark join together"


def test_snippet_first_wins_ties_and_trims():
    text = "spark one. spark two."
    assert make_snippet(text, ["spark"]) == "spark one"
    long = "x" * 300
    out = make_snippet(long, ["spark"])
    assert len(out) == 181 and out.endswith("…")


def test_snippet_empty_and_no_sentences():
    assert make_snippet("", ["a"]) == ""
    assert make_snippet("no punct at all", ["a"]) == "no punct at all"


def test_highlight_escapes_then_marks():
    out = highlight("a<b & spark", ["spark"])
    assert out == "a&lt;b &amp; <mark>spark</mark>"


def test_highlight_case_insensitive():
    assert highlight("Spark SPARK", ["spark"]).count("<mark>") == 2


def test_kwic_positions_and_windows():
    text = "aaa spark bbb spark ccc"
    wins = kwic_windows(text, "spark", width=4, max_windows=5)
    assert [p for p, _ in wins] == [4, 14]
    assert wins[0][1] == "aaa spark bbb"
    assert kwic_windows(text, "spark", max_windows=1) == [(4, text[0:39])]


def test_kwic_empty():
    assert kwic_windows("", "x") == []
    assert kwic_windows("abc", "") == []
