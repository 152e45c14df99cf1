"""Rank-fusion kernels (hybrid.py:241-433) and the boolean parser/
evaluator (boolean.py:132-260)."""

import numpy as np
import pytest

from news_information_retrieval_system_ray.functions.boolquery import (
    evaluate_boolean,
    parse_boolean,
    search_boolean,
)
from news_information_retrieval_system_ray.functions.fusion import (
    fuse_combmnz,
    fuse_combsum,
    fuse_linear,
    fuse_rrf,
    minmax_normalize,
)

RUN_A = [(1, 10.0), (2, 5.0), (3, 0.0)]
RUN_B = [(2, 2.0), (4, 1.0)]


def test_minmax_normalize():
    assert minmax_normalize(RUN_A) == [(1, 1.0), (2, 0.5), (3, 0.0)]
    assert minmax_normalize([(7, 3.0), (8, 3.0)]) == [(7, 1.0), (8, 1.0)]
    assert minmax_normalize([]) == []


def test_fuse_linear_weights():
    out = dict(fuse_linear([RUN_A, RUN_B], weights=[1.0, 2.0]))
    assert out[1] == pytest.approx(1.0)
    assert out[2] == pytest.approx(0.5 + 2.0 * 1.0)
    assert out[4] == pytest.approx(2.0 * 0.0)


def test_fuse_rrf_order_and_ties():
    out = fuse_rrf([RUN_A, RUN_B], k=60)
    scores = dict(out)
    assert scores[2] == pytest.approx(1 / 62 + 1 / 61)
    assert out[0][0] == 2  # appears in both runs -> top


def test_fuse_combsum_combmnz():
    s = dict(fuse_combsum([RUN_A, RUN_B]))
    m = dict(fuse_combmnz([RUN_A, RUN_B]))
    assert m[2] == pytest.approx(s[2] * 2)
    assert m[1] == pytest.approx(s[1] * 1)


POSTINGS = {
    "a": np.array([1, 2, 3], dtype=np.int64),
    "b": np.array([2, 3, 4], dtype=np.int64),
    "c": np.array([3, 5], dtype=np.int64),
}
UNIVERSE = np.arange(1, 7, dtype=np.int64)


def _p(t):
    return POSTINGS.get(t, np.empty(0, dtype=np.int64))


def test_parse_postfix():
    assert parse_boolean("a AND b") == ["a", "b", "AND"]
    assert parse_boolean("a AND (b OR c)") == ["a", "b", "c", "OR", "AND"]
    assert parse_boolean("NOT a AND b") == ["a", "NOT", "b", "AND"]
    assert parse_boolean("a OR b AND c") == ["a", "b", "c", "AND", "OR"]


def test_parse_unbalanced():
    with pytest.raises(ValueError):
        parse_boolean("(a AND b")
    with pytest.raises(ValueError):
        parse_boolean("a AND b)")


def test_evaluate_and_or_not():
    assert list(search_boolean("a AND b", _p, UNIVERSE)) == [2, 3]
    assert list(search_boolean("a OR c", _p, UNIVERSE)) == [1, 2, 3, 5]
    assert list(search_boolean("NOT a", _p, UNIVERSE)) == [4, 5, 6]
    assert list(search_boolean("b AND NOT a", _p, UNIVERSE)) == [4]
    assert list(search_boolean("(a OR c) AND NOT b", _p, UNIVERSE)) == [1, 5]


def test_evaluate_precedence_matches_reference():
    # NOT > AND > OR
    assert list(search_boolean("a OR b AND c", _p, UNIVERSE)) == \
        list(np.union1d(POSTINGS["a"], np.intersect1d(POSTINGS["b"], POSTINGS["c"])))


def test_evaluate_malformed():
    with pytest.raises(ValueError):
        evaluate_boolean(["AND"], _p, UNIVERSE)
    with pytest.raises(ValueError):
        evaluate_boolean(["a", "b"], _p, UNIVERSE)
    with pytest.raises(ValueError):
        evaluate_boolean(["NOT"], _p, UNIVERSE)


def test_unknown_term_is_empty():
    assert list(search_boolean("zzz AND a", _p, UNIVERSE)) == []
    assert list(search_boolean("NOT zzz", _p, UNIVERSE)) == list(UNIVERSE)


def test_detect_query_mode_reference_rules():
    from news_information_retrieval_system_ray.pipelines.analytics import (
        detect_query_mode,
    )

    assert detect_query_mode("lang:en spark") == "field"
    assert detect_query_mode("date:[2024 TO 2025]") == "field"
    assert detect_query_mode("spark AND join") == "boolean"
    assert detect_query_mode("(a OR b) AND NOT c") == "boolean"
    assert detect_query_mode("spark join") == "simple"
    # faithful substring quirk (unified_search.py:566-571): 'AND'
    # inside a word still routes boolean; unknown field prefix falls
    # through to the boolean/simple checks
    assert detect_query_mode("random walk") == "boolean"
    assert detect_query_mode("title:foo") == "simple"


def test_unified_search_modes(ray_session, sf_dir):
    from news_information_retrieval_system_ray.pipelines import analytics as A

    out = A.unified_search(sf_dir)
    modes = dict(out.groupby("qid")["mode"].first())
    assert modes == {"u_simple": "simple", "u_bool": "boolean",
                     "u_field": "field"}
    simple = out[out["qid"] == "u_simple"]
    assert len(simple) <= 10 and (simple["score"] > 0).all()
    rest = out[out["qid"] != "u_simple"]
    assert (rest["score"] == 0).all()


def test_facet_numeric_ranges_buckets(ray_session, sf_dir):
    import pyarrow.parquet as pq

    from news_information_retrieval_system_ray.pipelines import analytics as A

    out = A.facet_numeric_ranges(sf_dir)
    n = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    assert out["count"].sum() == n  # buckets cover the whole n_chars range
    # inclusive-lower / exclusive-upper: recount one bucket directly
    vals = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["n_chars"]).column("n_chars").to_numpy()
    mid = int(((vals >= 200) & (vals < 400)).sum())
    got = out.set_index("label")["count"].get("200-399", 0)
    assert got == mid
