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


def test_kwic_window_modes_reference_semantics():
    from news_information_retrieval_system_ray.functions.snippets import (
        kwic_contexts,
        kwic_matches,
    )

    text = "Alpha beta, gamma spark delta; epsilon. Next sentence spark here."
    p = text.find("spark")
    # fixed: char window trimmed at word boundaries (dynamic.py:302-337)
    l, r = kwic_contexts(text, p, 5, "fixed", 10)
    assert l == "gamma " and r == " delta;"
    # sentence: to the enclosing terminators, stripped (:339-373)
    l, r = kwic_contexts(text, p, 5, "sentence")
    assert l == "Alpha beta, gamma" and r == "delta; epsilon"
    # adaptive: fixed window cut at natural breakpoints (:375-413)
    l, r = kwic_contexts(text, p, 5, "adaptive", 20)
    assert "," not in l and ";" not in r
    assert l == "gamma" and r == "delta"
    # multi-match iteration, case-insensitive, max_matches
    ms = kwic_matches(text, "SPARK", "fixed", 10, max_matches=5)
    assert [m["position"] for m in ms] == [p, text.find("spark", p + 1)]
    assert all(m["keyword"] == "spark" for m in ms)
    assert kwic_matches(text, "zzz") == []


def test_kwic_query_modes(ray_session, sf_dir):
    from news_information_retrieval_system_ray.pipelines import analytics as A

    fixed = A.kwic_contexts_query(sf_dir)
    sent = A.kwic_contexts_query(sf_dir, window_type="sentence")
    assert len(fixed) == len(sent) > 0
    assert (fixed["keyword"] == A.KWIC_KEYWORD).all()
    # fixed contexts are width-bounded
    assert fixed["left_ctx"].str.len().max() <= A.KWIC_WIDTH
    assert fixed["right_ctx"].str.len().max() <= A.KWIC_WIDTH
