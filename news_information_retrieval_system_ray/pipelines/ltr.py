"""Learning-to-rank: feature extraction + weak-supervision training.

Reference: the app's LTR services
(src/ir_app/services/learning_to_rank_feature_service.py:140-228 — one
feature row per (query, doc) interaction with query-term counts, match
counts, model scores and a weak label graded/3;
learning_to_rank_training_service.py:38-123 — standardize features,
fit a logistic-regression click model, report coefficients + training
metrics).

Rebuild:
- ``ltr_features``: per (fixed query, candidate doc sharing >= 1 term):
  query_term_count, match_count (distinct query terms present),
  bm25_score, doc_len, and label = grade/3 with the repo's synthetic
  qrels grades (2 = all terms, 1 = at least half — analytics._grade_qrels).
  Fully SQL-expressible -> oracle-checked.
- ``ltr_train``: logistic regression by DISTRIBUTED full-batch gradient
  descent: feature standardization from streamed moment partials, then
  per-epoch map_batches gradient partials against a broadcast weight
  vector (the factor-broadcast pattern of cf_als).  Deterministic
  (zero init, fixed epochs).  sklearn is absent in this container; the
  plain-numpy solver is the same model class (L2-less logistic fit).

Scale: the candidate table is |queries| x docs-with-a-term; this
harness collects it driver-side only for the final merge of two
candidate-sized tables (documented small at the fixed-query scale); at
web scale both sides stay Datasets and merge by a (qid, doc_id) hash
join, and the gradient loop is unchanged (partials stream, weights
broadcast).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa

from .analytics import (
    FIXED_QUERIES,
    _bm25_scores,
    _corpus_stats,
    _exploded_ds,
    _memo,
    _sum_by,
    round4,
)

FEATURES = ("query_term_count", "match_count", "bm25_score", "doc_len")


def ltr_features(sf_dir: str) -> pd.DataFrame:
    """(qid, doc_id, query_term_count, match_count, bm25_score, doc_len,
    label) for every candidate (doc shares >= 1 query term)."""

    def build():
        n_docs, avgdl = _corpus_stats(sf_dir)
        qterms = sorted({t for ts in FIXED_QUERIES.values() for t in ts})
        t2q = {t: [q for q, ts in FIXED_QUERIES.items() if t in ts]
               for t in qterms}

        bm25 = _bm25_scores(sf_dir, n_docs, avgdl).to_pandas()

        # distinct query-term matches + doc_len per (qid, doc): exploded
        # rows are unique per (doc, term), so a partial count suffices
        ex = _exploded_ds(sf_dir)
        import pyarrow.compute as pc

        def emit(t: pa.Table) -> pa.Table:
            t = t.filter(pc.is_in(t.column("term"), value_set=pa.array(qterms)))
            qs, ds_, dls = [], [], []
            terms = t.column("term").to_pylist()
            docs = t.column("doc_id").to_numpy()
            dl = t.column("dl").to_numpy()
            for i, term in enumerate(terms):
                for q in t2q[term]:
                    qs.append(q)
                    ds_.append(int(docs[i]))
                    dls.append(int(dl[i]))
            return pa.table({"qid": pa.array(qs, pa.string()),
                             "doc_id": pa.array(ds_, pa.int64()),
                             "dl": pa.array(dls, pa.int64())})

        mc = _sum_by(ex.map_batches(emit, batch_format="pyarrow"),
                     ("qid", "doc_id"), ("dl",), counts=("match_count",)).to_pandas()
        # dl was summed over match_count rows -> divide back to the value
        mc["doc_len"] = (mc["dl"] // mc["match_count"]).astype(np.int64)

        out = mc.merge(bm25, on=["qid", "doc_id"], how="left")
        out["bm25_score"] = out["score"].fillna(0.0).map(round4)
        out["query_term_count"] = out["qid"].map(
            {q: len(ts) for q, ts in FIXED_QUERIES.items()}).astype(np.int64)
        grade = np.where(out["match_count"] == out["query_term_count"], 2,
                         np.where(2 * out["match_count"] >= out["query_term_count"], 1, 0))
        # weak label = grade / 3 at 6 decimals (feature_service.py:217-228)
        out["label"] = np.floor(grade / 3.0 * 1e6 + 0.5) / 1e6
        out["match_count"] = out["match_count"].astype(np.int64)
        return (out[["qid", "doc_id", "query_term_count", "match_count",
                     "bm25_score", "doc_len", "label"]]
                .sort_values(["qid", "doc_id"]).reset_index(drop=True))

    return _memo(("ltr_features", sf_dir), build).copy()


def ltr_train(sf_dir: str, epochs: int = 60, lr: float = 0.5) -> pd.DataFrame:
    """Distributed logistic regression on the LTR features.

    training_service.py:38-123 semantics: binary class = (label >= 0.5),
    standardized features, logistic fit, report per-feature coefficients
    (+ intercept) and training accuracy.  Executed as per-epoch
    map_batches gradient partials against a broadcast weight vector.
    Returns rows (feature, coefficient, direction) plus summary rows
    ``_intercept``, ``_train_accuracy``, ``_loss_first``, ``_loss_last``.
    """
    import ray
    import ray.data as rd

    feats = ltr_features(sf_dir)
    y_all = (feats["label"].to_numpy() >= 0.5).astype(np.float64)
    X_all = feats[list(FEATURES)].to_numpy(dtype=np.float64)
    ds = rd.from_pandas(
        pd.DataFrame({**{f: X_all[:, i] for i, f in enumerate(FEATURES)},
                      "y": y_all})).repartition(4).materialize()

    # standardization moments via streamed partials
    def moments(t: pa.Table) -> pa.Table:
        m = np.stack([t.column(f).to_numpy() for f in FEATURES], axis=1)
        return pa.table({"n": pa.array([len(m)], pa.int64()),
                         "s": pa.array([m.sum(axis=0).tolist()]),
                         "ss": pa.array([(m * m).sum(axis=0).tolist()])})

    mm = ds.map_batches(moments, batch_size=None, batch_format="pyarrow").to_pandas()
    n = float(mm["n"].sum())
    mu = np.sum(np.stack(mm["s"].to_numpy()), axis=0) / n
    var = np.sum(np.stack(mm["ss"].to_numpy()), axis=0) / n - mu ** 2
    sd = np.sqrt(np.maximum(var, 1e-12))

    w = np.zeros(len(FEATURES) + 1)  # [bias, features...] — deterministic init
    losses = []
    for _ in range(epochs):
        wref = ray.put(w)

        def grad_part(t: pa.Table) -> pa.Table:
            wv = ray.get(wref)
            m = np.stack([t.column(f).to_numpy() for f in FEATURES], axis=1)
            Xs = np.hstack([np.ones((len(m), 1)), (m - mu) / sd])
            yv = t.column("y").to_numpy()
            z = Xs @ wv
            p = 1.0 / (1.0 + np.exp(-z))
            eps = 1e-12
            loss = -(yv * np.log(p + eps) + (1 - yv) * np.log(1 - p + eps)).sum()
            g = Xs.T @ (p - yv)
            acc = float(((p >= 0.5) == (yv >= 0.5)).sum())
            return pa.table({"g": pa.array([g.tolist()]),
                             "loss": pa.array([float(loss)]),
                             "acc": pa.array([acc]),
                             "n": pa.array([len(yv)], pa.int64())})

        parts = ds.map_batches(grad_part, batch_size=None,
                               batch_format="pyarrow").to_pandas()
        g = np.sum(np.stack(parts["g"].to_numpy()), axis=0) / n
        losses.append(float(parts["loss"].sum()) / n)
        w = w - lr * g

    acc = float(parts["acc"].sum()) / n  # accuracy at the final weights
    rows = [{"feature": f, "coefficient": round4(float(w[i + 1])),
             "direction": "positive" if w[i + 1] >= 0 else "negative"}
            for i, f in enumerate(FEATURES)]
    rows += [{"feature": "_intercept", "coefficient": round4(float(w[0])),
              "direction": "positive" if w[0] >= 0 else "negative"},
             {"feature": "_train_accuracy", "coefficient": round4(acc),
              "direction": ""},
             {"feature": "_loss_first", "coefficient": round4(losses[0]),
              "direction": ""},
             {"feature": "_loss_last", "coefficient": round4(losses[-1]),
              "direction": ""}]
    return pd.DataFrame(rows)


def ltr_rerank(sf_dir: str, k: int = 10, epochs: int = 40) -> pd.DataFrame:
    """LTR serving loop: rerank each query's candidates by the trained
    model's probability (the reference's LTR demo closes the same loop:
    features -> logistic model -> score).  Deterministic; rows-only.

    Output: (qid, rank, doc_id, prob) with rank by (prob desc, doc_id).
    """
    feats = ltr_features(sf_dir)
    coefs = ltr_train(sf_dir, epochs=epochs).set_index("feature")["coefficient"]
    X = feats[list(FEATURES)].to_numpy(dtype=np.float64)
    mu, sd = X.mean(axis=0), np.maximum(X.std(axis=0), 1e-6)
    z = (coefs["_intercept"]
         + ((X - mu) / sd) @ np.array([coefs[f] for f in FEATURES]))
    feats = feats.copy()
    feats["prob"] = 1.0 / (1.0 + np.exp(-z))

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["prob", "doc_id"], ascending=[False, True]).head(k).copy()
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        g["prob"] = g["prob"].map(round4)
        return g[["qid", "rank", "doc_id", "prob"]]

    return (feats.groupby("qid", group_keys=False)[feats.columns]
            .apply(topk).reset_index(drop=True))
