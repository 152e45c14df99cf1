"""LTR feature extraction + distributed logistic training."""

from __future__ import annotations

import numpy as np

from news_information_retrieval_system_ray.pipelines import ltr


def test_ltr_features_label_rule(ray_session, sf_dir):
    f = ltr.ltr_features(sf_dir)
    assert len(f) > 0
    # label = grade/3 where grade 2 iff all terms, 1 iff >= half
    full = f[f["match_count"] == f["query_term_count"]]
    assert np.allclose(full["label"], 2 / 3, atol=1e-6)
    half = f[(2 * f["match_count"] >= f["query_term_count"])
             & (f["match_count"] < f["query_term_count"])]
    assert np.allclose(half["label"], 1 / 3, atol=1e-6)
    # every candidate shares at least one term -> bm25 positive
    assert (f["bm25_score"] > 0).all()
    assert (f["match_count"] >= 1).all()


def test_ltr_train_learns(ray_session, sf_dir):
    out = ltr.ltr_train(sf_dir, epochs=40)
    vals = out.set_index("feature")["coefficient"]
    # loss must fall from ln(2); accuracy must beat the majority class
    assert vals["_loss_first"] == np.floor(np.log(2) * 1e4 + 0.5) / 1e4
    assert vals["_loss_last"] < vals["_loss_first"] * 0.7
    f = ltr.ltr_features(sf_dir)
    majority = max((f["label"] >= 0.5).mean(), 1 - (f["label"] >= 0.5).mean())
    assert vals["_train_accuracy"] > majority
    # match_count must carry positive weight (it defines the label)
    assert vals["match_count"] > 0
    # deterministic: same call, same coefficients
    out2 = ltr.ltr_train(sf_dir, epochs=40)
    assert (out["coefficient"] == out2["coefficient"]).all()


def test_ltr_rerank_serving_loop(ray_session, sf_dir):
    out = ltr.ltr_rerank(sf_dir, k=5, epochs=30)
    assert set(out.columns) == {"qid", "rank", "doc_id", "prob"}
    assert out["prob"].between(0, 1).all()
    feats = ltr.ltr_features(sf_dir)
    cands = set(map(tuple, feats[["qid", "doc_id"]].to_numpy()))
    assert all((q, d) in cands for q, d in out[["qid", "doc_id"]].to_numpy())
    for _, g in out.groupby("qid"):
        assert list(g["rank"]) == list(range(1, len(g) + 1))
        assert (np.diff(g["prob"].to_numpy()) <= 1e-9).all()
