"""Feedback analytics over a search/click/relevance log, Ray-Data-first.

Reference parity: ``src/ir_app/services/feedback_analytics_service.py``
— the dashboard analytics over the app's sqlite feedback store:
summary totals + CTR (:24-87), top queries (:102-133), zero-result
queries (:135-168), top clicked docs (:170-202), per-model metrics
with the two-source merge and default rows (:205-266), relevance-grade
distribution over a fixed 0..3 domain (:268-293), session metrics
(:334-395), and click/relevance counts by rank bucket + average
clicked rank (:453-508).

The sandbox has no app feedback store; the synthetic ``events`` table
stands in as the interaction log (the same convention the recommender
pipelines use for user-item events).  The derived log is pinned
DETERMINISTICALLY (mirrored verbatim in the SQL oracles):

- ``k``        = first integer in the ``props`` JSON string
- *search events*   = rows with event_type='view':
    query='q'+(k%7), latency=value, result_count=k%5,
    model=MODELS[user_id%3], session_id=user_id
- *feedback events* = rows with event_type in ('click','purchase'):
    click->'click', purchase->'relevance'; rank=(k%15)+1,
    doc_id=k%50, relevance_grade=floor(value)%4 (relevance only),
    query / model / session_id as above
- the analytics window is the whole log (the tables carry fixed
  synthetic timestamps, so the reference's "last N days" predicate
  degenerates to all-rows).

Spec tightening (documented, same convention as BM25 ties): the
reference orders top-clicked docs by clicks DESC only and zero-result
queries by (count DESC, last_seen DESC) — both nondeterministic under
ties; the canonical order here appends ascending key tie-breaks.

Distributed shape: the log derivation is one streaming ``map_batches``
over the events read (column-pruned); every analytic is a small keyed
aggregate (per-batch partial -> merge via ``_sum_by``) — the log never
materializes on the driver; only the aggregated frames (<= |queries| x
|models| rows) do.
"""

from __future__ import annotations

import math
import re

import numpy as np
import pandas as pd
import pyarrow as pa

from .analytics import _memo, _sum_by, round4

MODELS = ("bm25", "tfidf", "hybrid")
_INT_RE = re.compile(r"[0-9]+")


def round6(x: float) -> float:
    """Half-away-from-zero at 6 places (DuckDB round semantics)."""
    return math.floor(abs(x) * 1e6 + 0.5) / 1e6 * (1 if x >= 0 else -1)


def _ratio(num: float, den: float) -> float:
    """feedback_analytics_service.py:524-533 (0.0 on zero denominator)."""
    return round6(float(num) / float(den)) if den else 0.0


def _derive(t: pa.Table) -> pa.Table:
    """events batch -> unified derived-log rows (kind='search'|'click'|
    'relevance'); vectorized numpy over the decoded columns."""
    et = np.asarray(t.column("event_type").to_pylist())
    keep = np.isin(et, ("view", "click", "purchase"))
    et = et[keep]
    uid = t.column("user_id").to_numpy(zero_copy_only=False)[keep]
    val = t.column("value").to_numpy(zero_copy_only=False)[keep]
    k = np.array([int(_INT_RE.search(p).group()) if _INT_RE.search(p) else 0
                  for p in np.asarray(t.column("props").to_pylist())[keep]],
                 dtype=np.int64)
    ts = t.column("ts").take(pa.array(np.flatnonzero(keep)))
    kind = np.where(et == "view", "search",
                    np.where(et == "click", "click", "relevance"))
    model = np.asarray(MODELS)[uid % 3]
    return pa.table({
        "kind": pa.array(kind),
        "query": pa.array(np.char.add("q", (k % 7).astype(str))),
        "model": pa.array(model),
        "session_id": pa.array(uid.astype(np.int64)),
        "latency": pa.array(val),
        "result_count": pa.array((k % 5).astype(np.int64)),
        "rank": pa.array((k % 15 + 1).astype(np.int64)),
        "doc_id": pa.array((k % 50).astype(np.int64)),
        "grade": pa.array((np.floor(val).astype(np.int64)) % 4),
        "ts": ts,
    })


def _log_ds(sf_dir: str):
    import ray.data as rd

    def build():
        return rd.read_parquet(
            f"{sf_dir}/events.parquet",
            columns=["ts", "user_id", "event_type", "value", "props"],
        ).map_batches(_derive, batch_format="pyarrow").materialize()

    return _memo(("feedback_log", sf_dir), build)


def _zero_result_groups(sf_dir: str, limit: int = 20) -> pd.DataFrame:
    ds = _log_ds(sf_dir).filter(
        lambda r: r["kind"] == "search" and r["result_count"] == 0)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["query", "model"], as_index=False).agg(
            count=("kind", "size"), last_seen=("ts", "max"))

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    if parts.empty:
        return pd.DataFrame(columns=["query", "model", "count", "last_seen"])
    g = parts.groupby(["query", "model"], as_index=False).agg(
        count=("count", "sum"), last_seen=("last_seen", "max"))
    g = g.sort_values(["count", "last_seen", "query", "model"],
                      ascending=[False, False, True, True]).head(limit)
    return g.reset_index(drop=True)


def feedback_zero_results(sf_dir: str, limit: int = 20) -> pd.DataFrame:
    """(query, model, count, last_seen): zero-result query aggregates
    (:135-168), canonical tie-break appended."""
    g = _zero_result_groups(sf_dir, limit).copy()
    g["count"] = g["count"].astype(np.int64)
    return g[["query", "model", "count", "last_seen"]]


def feedback_top_queries(sf_dir: str, limit: int = 20) -> pd.DataFrame:
    """(query, count, avg_latency): most common queries
    (:102-133, ORDER BY count DESC, query ASC)."""
    ds = _log_ds(sf_dir).filter(lambda r: r["kind"] == "search")
    g = _sum_by(ds, ("query",), ("latency",), counts=("count",)).to_pandas()
    g["avg_latency"] = (g["latency"] / g["count"]).map(round6)
    g = g.sort_values(["count", "query"], ascending=[False, True]).head(limit)
    g["count"] = g["count"].astype(np.int64)
    return g[["query", "count", "avg_latency"]].reset_index(drop=True)


def feedback_top_clicked(sf_dir: str, limit: int = 20) -> pd.DataFrame:
    """(doc_id, query, model, clicks): most clicked documents
    (:170-202); canonical tie-break (doc_id, query, model) appended to
    the reference's clicks-DESC-only order."""
    ds = _log_ds(sf_dir).filter(lambda r: r["kind"] == "click")
    g = _sum_by(ds, ("doc_id", "query", "model"), (), counts=("clicks",)).to_pandas()
    g = g.sort_values(["clicks", "doc_id", "query", "model"],
                      ascending=[False, True, True, True]).head(limit)
    g["clicks"] = g["clicks"].astype(np.int64)
    g["doc_id"] = g["doc_id"].astype(np.int64)
    return g[["doc_id", "query", "model", "clicks"]].reset_index(drop=True)


def feedback_model_metrics(sf_dir: str) -> pd.DataFrame:
    """Per-model searches/avg_latency/zero_results/clicks/labels/ctr/
    zero_result_rate (:205-266) — the search-side and feedback-side
    aggregates merged, missing sides defaulting to 0, ordered by
    searches DESC (model ASC tie-break pinned)."""
    log = _log_ds(sf_dir)

    def spart(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["kind"] == "search"]
        if df.empty:
            return pd.DataFrame({"model": [], "searches": [], "lat": [], "zero": []})
        return df.assign(zero=(df["result_count"] == 0).astype(np.int64)) \
                 .groupby("model", as_index=False) \
                 .agg(searches=("kind", "size"), lat=("latency", "sum"),
                      zero=("zero", "sum"))

    s = _log_ds(sf_dir).map_batches(spart, batch_format="pandas").to_pandas()
    s = s.groupby("model", as_index=False).sum()

    def fpart(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["kind"] != "search"]
        if df.empty:
            return pd.DataFrame({"model": [], "clicks": [], "labels": []})
        return df.assign(c=(df["kind"] == "click").astype(np.int64),
                         l=(df["kind"] == "relevance").astype(np.int64)) \
                 .groupby("model", as_index=False) \
                 .agg(clicks=("c", "sum"), labels=("l", "sum"))

    f = log.map_batches(fpart, batch_format="pandas").to_pandas()
    f = f.groupby("model", as_index=False).sum()

    m = s.merge(f, on="model", how="outer").fillna(0)
    m["avg_latency"] = [
        round6(lat / n) if n else 0.0 for lat, n in zip(m["lat"], m["searches"])]
    m["ctr"] = [_ratio(c, n) for c, n in zip(m["clicks"], m["searches"])]
    m["zero_result_rate"] = [_ratio(z, n) for z, n in zip(m["zero"], m["searches"])]
    for c in ("searches", "zero", "clicks", "labels"):
        m[c] = m[c].astype(np.int64)
    m = m.rename(columns={"zero": "zero_results", "labels": "relevance_labels"})
    m = m.sort_values(["searches", "model"], ascending=[False, True])
    return m[["model", "searches", "avg_latency", "zero_results", "clicks",
              "relevance_labels", "ctr", "zero_result_rate"]].reset_index(drop=True)


def feedback_relevance_dist(sf_dir: str) -> pd.DataFrame:
    """(grade, count) over the fixed 0..3 domain (:268-293 — absent
    grades emit 0 rows)."""
    ds = _log_ds(sf_dir).filter(lambda r: r["kind"] == "relevance")
    g = _sum_by(ds, ("grade",), (), counts=("count",)).to_pandas()
    got = dict(zip(g["grade"], g["count"]))
    return pd.DataFrame({
        "grade": np.arange(4, dtype=np.int64),
        "count": np.array([int(got.get(i, 0)) for i in range(4)], dtype=np.int64),
    })


def feedback_position_bias(sf_dir: str) -> pd.DataFrame:
    """(bucket, clicks, relevance): rank-bucket counts (:453-508 with
    the :492-508 bucket map); all five buckets always present."""
    buckets = ["rank_1", "rank_2_3", "rank_4_10", "rank_11_plus", "unknown"]

    def part(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["kind"] != "search"]
        if df.empty:
            return pd.DataFrame({"bucket": [], "clicks": [], "relevance": []})
        r = df["rank"]
        b = np.where(r == 1, "rank_1",
                     np.where(r <= 3, "rank_2_3",
                              np.where(r <= 10, "rank_4_10", "rank_11_plus")))
        return pd.DataFrame({"bucket": b,
                             "clicks": (df["kind"] == "click").astype(np.int64),
                             "relevance": (df["kind"] == "relevance").astype(np.int64)}) \
            .groupby("bucket", as_index=False).sum()

    g = _log_ds(sf_dir).map_batches(part, batch_format="pandas").to_pandas()
    g = g.groupby("bucket", as_index=False).sum()
    got = g.set_index("bucket")
    return pd.DataFrame({
        "bucket": buckets,
        "clicks": np.array([int(got["clicks"].get(b, 0)) for b in buckets], dtype=np.int64),
        "relevance": np.array([int(got["relevance"].get(b, 0)) for b in buckets], dtype=np.int64),
    })


def feedback_summary(sf_dir: str, limit: int = 20) -> pd.DataFrame:
    """One-row dashboard summary (:67-87) + session metrics (:334-395)
    + average clicked rank (:484-487)."""
    log = _log_ds(sf_dir)

    def part(df: pd.DataFrame) -> pd.DataFrame:
        clicks = df[df["kind"] == "click"]
        return pd.DataFrame({
            "searches": [int((df["kind"] == "search").sum())],
            "clicks": [len(clicks)],
            "labels": [int((df["kind"] == "relevance").sum())],
            "rank_sum": [int(clicks["rank"].sum())],
        })

    tot = log.map_batches(part, batch_format="pandas").to_pandas().sum()
    search_sessions = len(set(
        r["session_id"] for r in
        _sum_by(log.filter(lambda r: r["kind"] == "search"),
                ("session_id",), (), counts=("n",)).take_all()))
    fb = _sum_by(log.filter(lambda r: r["kind"] != "search"),
                 ("session_id",), (), counts=("n",)).to_pandas()
    total_feedback = int(tot["clicks"] + tot["labels"])
    zero = _zero_result_groups(sf_dir, limit)
    return pd.DataFrame([{
        "total_searches": int(tot["searches"]),
        "total_clicks": int(tot["clicks"]),
        "total_relevance_labels": int(tot["labels"]),
        "ctr": _ratio(tot["clicks"], tot["searches"]),
        "zero_result_queries": int(zero["count"].sum()) if len(zero) else 0,
        "unique_search_sessions": int(search_sessions),
        "unique_feedback_sessions": int(len(fb)),
        "searches_per_session": _ratio(tot["searches"], search_sessions),
        "feedback_per_session": _ratio(total_feedback, len(fb)),
        "average_clicked_rank": round4(float(tot["rank_sum"]) / tot["clicks"])
        if tot["clicks"] else 0.0,
    }])
