"""Feedback-analytics pipeline (pipelines/feedback.py) — semantics
parity with feedback_analytics_service.py over the derived events log."""

import numpy as np
import pyarrow as pa

from news_information_retrieval_system_ray.pipelines import feedback as FB

SF = "/root/testdata/sf0.001"


def test_derive_mapping():
    t = pa.table({
        "ts": pa.array([1, 2, 3, 4], pa.timestamp("us")),
        "user_id": pa.array([0, 1, 2, 3], pa.int64()),
        "event_type": pa.array(["view", "click", "purchase", "error"]),
        "value": pa.array([10.9, 5.0, 7.2, 1.0]),
        "props": pa.array(['{"k": 87}', '{"k": 0}', '{"k": 16}', '{"k": 3}']),
    })
    out = FB._derive(t).to_pydict()
    # 'error' rows drop; view->search, click->click, purchase->relevance
    assert out["kind"] == ["search", "click", "relevance"]
    assert out["query"] == ["q3", "q0", "q2"]          # k % 7
    assert out["model"] == ["bm25", "tfidf", "hybrid"]  # user_id % 3
    assert out["rank"] == [88 % 15 + 0, 1, 2]           # k % 15 + 1
    assert out["rank"] == [13, 1, 2]
    assert out["doc_id"] == [37, 0, 16]                 # k % 50
    assert out["grade"] == [10 % 4, 1, 3]               # floor(value) % 4


def test_ratio_and_round6():
    assert FB._ratio(1, 0) == 0.0
    assert FB._ratio(1, 3) == 0.333333
    assert FB.round6(-1.2345675) == -1.234568  # half away from zero


def test_position_bias_buckets_always_present(ray_session):
    pb = FB.feedback_position_bias(SF)
    assert list(pb["bucket"]) == ["rank_1", "rank_2_3", "rank_4_10",
                                  "rank_11_plus", "unknown"]
    # our derived ranks are always 1..15 -> unknown bucket is zero
    assert int(pb[pb["bucket"] == "unknown"]["clicks"].iloc[0]) == 0
    # totals across buckets == click + relevance event counts
    s = FB.feedback_summary(SF)
    assert int(pb["clicks"].sum()) == int(s["total_clicks"].iloc[0])
    assert int(pb["relevance"].sum()) == int(s["total_relevance_labels"].iloc[0])


def test_model_metrics_consistency(ray_session):
    m = FB.feedback_model_metrics(SF)
    s = FB.feedback_summary(SF)
    assert int(m["searches"].sum()) == int(s["total_searches"].iloc[0])
    assert int(m["clicks"].sum()) == int(s["total_clicks"].iloc[0])
    # ctr recomputes from the row's own counts
    for _, r in m.iterrows():
        assert r["ctr"] == FB._ratio(r["clicks"], r["searches"])
    # ordered by searches desc
    assert list(m["searches"]) == sorted(m["searches"], reverse=True)


def test_search_serving_invariants(ray_session):
    """Filter-then-truncate semantics (search_service.py:108): every
    served doc passes the facet filter, scores include the boost, and
    each qid serves exactly k results."""
    import duckdb

    from news_information_retrieval_system_ray.pipelines.analytics import (
        FIXED_QUERIES,
        search_serving,
    )

    out = search_serving(SF, k=5)
    assert set(out["qid"]) == set(FIXED_QUERIES)
    assert (out.groupby("qid")["rank"].max() == 5).all()
    langs = duckdb.sql(
        f"SELECT doc_id, lang FROM '{SF}/documents.parquet'").df()
    lang_of = dict(zip(langs["doc_id"], langs["lang"]))
    assert all(lang_of[d] == "en" for d in out["doc_id"])
    # matched terms are a subset of the query's terms and non-empty
    for q, m in zip(out["qid"], out["matched_terms"]):
        terms = set(m.split("|")) if m else set()
        assert terms and terms <= set(FIXED_QUERIES[q])
