"""Recommenders: CF similarities, user recs, content similar, hybrid, ALS.

Cross-checks the distributed pair-contribution/broadcast designs against
tiny in-memory reimplementation of the reference math
(src/ir/recommendation/{content_based,collaborative_filtering,
hybrid_recommender}.py).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from news_information_retrieval_system_ray.pipelines import analytics as A
from news_information_retrieval_system_ray.pipelines import recommend as R


@pytest.fixture(scope="module")
def inter_df(ray_session, sf_dir):
    """Interactions recomputed independently with pandas+duckdb-free path."""
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/events.parquet",
                      columns=["user_id", "value", "props"]).to_pandas()
    t["item"] = t["props"].str.extract(r"(\d+)").astype(np.int64)
    return (t.groupby(["user_id", "item"], as_index=False)["value"].sum()
             .rename(columns={"value": "rating"}))


def _dense(inter_df):
    users = sorted(inter_df["user_id"].unique())
    items = sorted(inter_df["item"].unique())
    u_ix = {u: i for i, u in enumerate(users)}
    i_ix = {v: i for i, v in enumerate(items)}
    M = np.zeros((len(users), len(items)))
    for _, r in inter_df.iterrows():
        M[u_ix[r["user_id"]], i_ix[r["item"]]] = r["rating"]
    return M, users, items


def test_item_similar_matches_dense_cosine(ray_session, sf_dir, inter_df):
    out = R.cf_item_similar(sf_dir, k=3)
    M, users, items = _dense(inter_df)
    # dense item-item cosine (collaborative_filtering.py:324-348)
    V = M.T
    norms = np.linalg.norm(V, axis=1)
    S = (V @ V.T) / np.outer(norms, norms)
    np.fill_diagonal(S, 0.0)
    for item in out["item"].unique()[:5]:
        got = out[out["item"] == item]
        row = np.floor(np.abs(S[items.index(item)]) * 1e6 + 0.5) / 1e6
        order = sorted(
            ((row[j], items[j]) for j in range(len(items))
             if items[j] != item and row[j] >= R.MIN_SIM),
            key=lambda t: (-t[0], t[1]))[:3]
        assert list(got["other_item"]) == [o for _, o in order]
        for (sim, _), got_sim in zip(order, got["sim"]):
            assert abs(sim - got_sim) < 5e-4


def test_user_recs_excludes_seen_and_normalizes(ray_session, sf_dir, inter_df):
    out = R.cf_user_recs(sf_dir, k=5)
    assert set(out.columns) == {"user_id", "rank", "item", "score"}
    # no recommended item may already be in the user's interaction set
    seen = set(map(tuple, inter_df[["user_id", "item"]].to_numpy()))
    assert not any((u, i) in seen
                   for u, i in out[["user_id", "item"]].to_numpy())
    # scores are sim-weighted rating means -> within observed rating range
    assert (out["score"] > 0).all()
    assert out.groupby("user_id")["rank"].is_monotonic_increasing.all()


def test_recommend_similar_self_excluded_and_sorted(ray_session, sf_dir):
    out = R.recommend_similar(sf_dir, seeds=(0, 1), k=5)
    assert not ((out["seed_id"] == out["doc_id"]).any())
    for s, g in out.groupby("seed_id"):
        assert list(g["rank"]) == list(range(1, len(g) + 1))
        assert (np.diff(g["score"].to_numpy()) <= 1e-9).all()
    # cosine bounded
    assert (out["score"] <= 1.0 + 1e-9).all()


def test_hybrid_weights(ray_session, sf_dir):
    out = R.hybrid_recommend(sf_dir, seed=5, k=10)
    # score must equal 0.5*content + 0.1*popularity (cf term absent)
    expect = (R.W_CONTENT * out["content_score"]
              + R.W_POP * out["popularity"]).map(lambda v: A.round4(v))
    assert np.allclose(out["score"], expect, atol=5e-4)
    assert (np.diff(out["score"].to_numpy()) <= 1e-9).all()


def test_als_rmse_decreases(ray_session, sf_dir):
    hist = R.cf_als(sf_dir, n_factors=4, n_iterations=3)
    rmse = hist["rmse"].to_numpy()
    assert len(rmse) == 4
    assert rmse[-1] < rmse[0] * 0.5  # ALS must cut observed-entry RMSE
    assert (np.diff(rmse) < 0).all()  # each alternation is an exact descent


def test_als_fixed_rmse_decreases_and_deterministic(ray_session, sf_dir):
    hist = R.cf_als_fixed(sf_dir, n_iterations=3)
    rmse = hist["rmse"].to_numpy()
    assert len(rmse) == 4
    assert (np.diff(rmse) < 0).all()
    # arithmetic init -> identical across runs (no RNG anywhere)
    again = R.cf_als_fixed(sf_dir, n_iterations=3)
    assert (hist["rmse"].to_numpy() == again["rmse"].to_numpy()).all()


def test_pat_keywords_methods_consistent(ray_session, sf_dir):
    out = A.pat_keywords(sf_dir, k=10)
    assert set(out["method"]) == set(A.PAT_METHODS)
    freq = out[out["method"] == "frequency"]
    # frequency method's score IS the frequency
    assert (freq["score"] == freq["frequency"]).all()
    comb = out[out["method"] == "combined"].set_index("term")
    tfidf = out[out["method"] == "tfidf"].set_index("term")
    shared = comb.index.intersection(tfidf.index)
    # combined = tfidf * (1+ln(df+1)) (pat_tree.py:353-362)
    for t in list(shared)[:5]:
        df = comb.loc[t, "doc_frequency"]
        assert comb.loc[t, "score"] == pytest.approx(
            tfidf.loc[t, "score"] * (1 + math.log(df + 1)), rel=5e-3)
