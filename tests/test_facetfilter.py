"""FacetFilter condition semantics (functions/facetfilter.py) — branch
parity with the reference's facet_filter.py:64-160 matches() and
:350-411 AND-combination."""

import pytest

from news_information_retrieval_system_ray.functions.facetfilter import (
    FacetFilter,
    FilterCondition,
    range_filter,
    term_filter,
)


def test_missing_field_never_matches():
    for op, v in [("equals", "x"), ("in", ["x"]), ("range", ("a", "b")),
                  ("gt", 1), ("contains", "x"), ("starts_with", "x")]:
        assert FilterCondition("f", op, v).matches(None) is False


def test_equals_string_normalizes():
    assert FilterCondition("f", "equals", 5).matches("5")
    assert FilterCondition("f", "equals", "5").matches(5)
    assert not FilterCondition("f", "equals", "5").matches(5.0)  # "5.0" != "5"


def test_in_multivalue_doc_list():
    c = term_filter("tags", ["politics", "finance"])
    assert c.operator == "in"
    assert c.matches(["sports", "finance"])
    assert not c.matches(["sports", "tech"])
    assert c.matches("politics")          # scalar doc value
    assert term_filter("source", "CNA").operator == "equals"


def test_range_is_lexicographic_iso_date_semantics():
    c = range_filter("pub_date", "2024-11-01", "2024-11-30")
    assert c.matches("2024-11-15")
    assert not c.matches("2024-10-20")
    # reference quirk: RANGE compares as strings, so numbers order
    # lexicographically ("9" > "30")
    assert not range_filter("n", 10, 30).matches(9)
    # non-tuple value -> False (facet_filter.py:121-123)
    assert not FilterCondition("f", "range", [1, 2]).matches(1)


def test_numeric_comparisons_prefer_float_fall_back_to_string():
    assert FilterCondition("n", "gte", 200).matches("1000")   # numeric path
    assert FilterCondition("n", "lt", "b").matches("a")       # string fallback
    assert not FilterCondition("n", "gt", "b").matches("a")


def test_contains_and_starts_with():
    assert FilterCondition("t", "contains", "park").matches("spark join")
    assert not FilterCondition("t", "contains", "parka").matches("spark")
    assert FilterCondition("s", "starts_with", "src1").matches("src12")
    assert not FilterCondition("s", "starts_with", "src1").matches("src2")


def test_unknown_operator_rejected():
    with pytest.raises(ValueError):
        FilterCondition("f", "between", (1, 2))


def test_filter_is_and_across_conditions():
    docs = [
        {"source": "CNA", "category": "politics", "pub_date": "2024-11-15"},
        {"source": "UDN", "category": "finance", "pub_date": "2024-11-16"},
        {"source": "CNA", "category": "politics", "pub_date": "2024-10-20"},
    ]
    ff = (FacetFilter()
          .add_condition(term_filter("source", ["CNA", "UDN"]))
          .add_condition(range_filter("pub_date", "2024-11-01", "2024-11-30")))
    assert len(ff.filter(docs)) == 2          # the reference's doctest
    assert ff.filter([]) == []
    ff.clear()
    assert ff.filter(docs) == docs            # no conditions -> no-op
    ff.add_condition(FilterCondition("missing", "equals", "x"))
    assert ff.filter(docs) == []
    assert ff.has_filter("missing") and not ff.has_filter("source")
    ff.remove_condition("missing")
    assert ff.get_filter_count() == 0
