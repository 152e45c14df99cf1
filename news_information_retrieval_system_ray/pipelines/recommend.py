"""Recommenders rebuilt Ray-Data-first over the testdata tables.

Reference semantics (math only; the execution model here is Ray Data):

- content-based similar items: TF-IDF doc vectors, cosine, exclude self,
  top-k  (src/ir/recommendation/content_based.py:265-341, 215-233).
- item-based CF: item-item cosine over the user-item interaction matrix
  with ``min_similarity`` floor  (collaborative_filtering.py:324-371, 89-108).
- user-based CF: top-``n_neighbors`` similar users by cosine, score unseen
  items by sim-weighted ratings normalized by the sim mass of the
  contributing neighbors  (collaborative_filtering.py:187-316).
- ALS matrix factorization: alternating ridge solves per user / per item
  over observed entries  (collaborative_filtering.py:460-584).
- weighted hybrid: ``0.5*content + 0.4*cf + 0.1*popularity`` where
  popularity = fraction of users who interacted with the item
  (hybrid_recommender.py:95-134, 166-276, 682-700).

Interactions are derived from the ``events`` table: item id = the integer
in ``props`` (``{"k": N}``), rating = sum(value) per (user, item).

Scale design (the reference builds dense in-memory user x item matrices;
none of that survives web scale):

- similarity is computed from PAIR CONTRIBUTIONS: group interactions by
  the co-occurrence key (user for item-item, item for user-user), emit
  the upper-triangle products vectorized, then one ``groupby((i,j)).sum``
  shuffle.  Cost is sum-of-squares of group sizes, NOT |I|^2 * |U|; at
  web scale hot groups (viral items / bot users) must be capped or
  sampled before pairing - noted on each operator.
- norms / neighbor lists / factor matrices are the designated SMALL side
  (k-bounded per entity) and are broadcast once; the interactions table
  is the big side and only ever streams through ``map_batches`` /
  ``groupby`` stages.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .analytics import (
    FIXED_QUERIES,  # noqa: F401  (shared query-surface conventions)
    _app_idf_vec,
    _corpus_stats,
    _memo,
    _sum_by,
    round4,
)

MIN_SIM = 0.1          # collaborative_filtering.py:93 (min_similarity)
N_NEIGHBORS = 20       # recommend_user_based default (collaborative_filtering.py:237)
W_CONTENT, W_CF, W_POP = 0.5, 0.4, 0.1   # hybrid_recommender.py:102-124
SEED_DOCS = (0, 1, 2)  # content-based seed documents
HYBRID_SEED = 5        # hybrid recommend_weighted(doc_id=...) seed


def _round_away(x: float, d: int) -> float:
    """Half-away-from-zero rounding at d decimals (DuckDB round)."""
    p = 10.0 ** d
    return math.floor(abs(x) * p + 0.5) / p * (1 if x >= 0 else -1)


def _round6_arr(a: np.ndarray) -> np.ndarray:
    """Vectorized half-away-from-zero at 6 decimals.

    Similarities are ranked on their 6-decimal rounding (ties broken by
    id) so that 1e-15 summation-order noise between this engine and the
    DuckDB oracle can never flip a rank.
    """
    return np.floor(np.abs(a) * 1e6 + 0.5) / 1e6 * np.sign(a)


# ------------------------------------------------------------ interactions

def _interactions_ds(sf_dir: str):
    """(user_id, item, rating) from events; rating = sum(value)."""

    def build():
        import ray.data as rd

        ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                             columns=["user_id", "value", "props"])

        def extract(t: pa.Table) -> pa.Table:
            item = pc.cast(
                pc.struct_field(
                    pc.extract_regex(t.column("props"), r"(?P<k>[0-9]+)"), "k"),
                pa.int64())
            return pa.table({"user_id": t.column("user_id"), "item": item,
                             "value": t.column("value")})

        agg = _sum_by(ds.map_batches(extract, batch_format="pyarrow"),
                      ("user_id", "item"), ("value",))
        return agg.map_batches(
            lambda t: t.rename_columns(["user_id", "item", "rating"]),
            batch_format="pyarrow").materialize()

    return _memo(("interactions", sf_dir), build)


def _norms_map(sf_dir: str, key: str) -> dict[int, float]:
    """L2 norm of each entity's rating vector (key='item' or 'user_id').

    Collected driver-side: one float per entity - the small side by
    construction (|entities| << |interactions|); at web scale this is a
    ``ray.put`` broadcast read inside every scoring task.
    """

    def build():
        sq = _interactions_ds(sf_dir).map_batches(
            lambda t: pa.table({key: t.column(key),
                                "sq": pc.multiply(t.column("rating"),
                                                  t.column("rating"))}),
            batch_format="pyarrow")
        rows = _sum_by(sq, (key,), ("sq",)).take_all()
        return {int(r[key]): math.sqrt(float(r["sq"])) for r in rows}

    return _memo(("norms", sf_dir, key), build)


def _pair_dots(sf_dir: str, group_key: str, pair_key: str):
    """Upper-triangle co-rating dot products.

    groupby(group_key) -> vectorized pair products within each group ->
    partial-sum merge on (a,b).  Group sizes bound the blow-up: at web
    scale, cap or sample members of hot groups before pairing (viral
    items / bot users), exactly like salting a skewed join key.
    """
    inter = _interactions_ds(sf_dir)

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = g[pair_key].to_numpy(dtype=np.int64)
        r = g["rating"].to_numpy(dtype=np.float64)
        order = np.argsort(ids)
        ids, r = ids[order], r[order]
        n = len(ids)
        if n < 2:
            return pd.DataFrame({"a": [], "b": [], "dot": []}).astype(
                {"a": np.int64, "b": np.int64, "dot": np.float64})
        iu, ju = np.triu_indices(n, k=1)
        return pd.DataFrame({"a": ids[iu], "b": ids[ju], "dot": r[iu] * r[ju]})

    emitted = inter.groupby(group_key).map_groups(pairs, batch_format="pandas")
    return _sum_by(emitted, ("a", "b"), ("dot",))


def _sims_ds(sf_dir: str, group_key: str, pair_key: str, min_sim: float):
    """Symmetric (entity, other, sim) with sim rounded at 6 decimals and
    floored at min_sim (collaborative_filtering.py min_similarity)."""
    norms = _norms_map(sf_dir, pair_key)

    def to_sims(t: pa.Table) -> pa.Table:
        a = t.column("a").to_numpy()
        b = t.column("b").to_numpy()
        dot = t.column("dot").to_numpy()
        na = np.array([norms[int(x)] for x in a])
        nb = np.array([norms[int(x)] for x in b])
        sim = _round6_arr(dot / (na * nb))
        keep = sim >= min_sim
        a, b, sim = a[keep], b[keep], sim[keep]
        return pa.table({"entity": np.concatenate([a, b]),
                         "other": np.concatenate([b, a]),
                         "sim": np.concatenate([sim, sim])})

    return _pair_dots(sf_dir, group_key, pair_key).map_batches(
        to_sims, batch_format="pyarrow")


# ------------------------------------------------------- item-based CF

def cf_item_similar(sf_dir: str, k: int = 5, min_sim: float = MIN_SIM) -> pd.DataFrame:
    """Top-k most similar items per item (item-item cosine).

    Mirrors compute_item_similarity(metric='cosine') + per-item top-k
    (collaborative_filtering.py:324-371, 640-661); ties broken by the
    other item's id ascending (canonical order, SURVEY §7.6.2).
    """
    sims = _sims_ds(sf_dir, "user_id", "item", min_sim)

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["sim", "other"], ascending=[False, True]).head(k).copy()
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    out = sims.groupby("entity").map_groups(topk, batch_format="pandas").to_pandas()
    out = out.rename(columns={"entity": "item", "other": "other_item"})
    out["sim"] = out["sim"].map(lambda v: round4(float(v)))
    return (out.sort_values(["item", "rank"]).reset_index(drop=True)
               [["item", "rank", "other_item", "sim"]])


# ------------------------------------------------------- user-based CF

def cf_user_recs(sf_dir: str, k: int = 5, n_neighbors: int = N_NEIGHBORS,
                 min_sim: float = MIN_SIM) -> pd.DataFrame:
    """User-based CF recommendations for every user.

    recommend_user_based (collaborative_filtering.py:235-316): take the
    top-``n_neighbors`` users by cosine sim (floor ``min_sim``), score
    each item the user has NOT consumed as
    ``sum(sim*rating) / sum(sim)`` over the neighbors holding it.

    Distributed shape: neighbor lists are k-bounded per user (the small
    side; broadcast as an inverted v->[(u,sim)] map), interactions
    stream once through a flat map_batches emitting (u, item)
    contributions, then one groupby((u,item)) aggregate.  "Already
    seen" is folded into the SAME aggregate via a tagged union instead
    of a second anti-join shuffle.
    """
    inter = _interactions_ds(sf_dir)
    sims = _sims_ds(sf_dir, "item", "user_id", min_sim)

    def topn(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(["sim", "other"], ascending=[False, True]).head(n_neighbors)

    nbrs = sims.groupby("entity").map_groups(topn, batch_format="pandas").take_all()
    # inverted neighbor map: source user v -> (target users array, sims array)
    _tmp: dict[int, list[tuple[int, float]]] = {}
    for r in nbrs:
        _tmp.setdefault(int(r["other"]), []).append((int(r["entity"]), float(r["sim"])))
    inv = {v: (np.array([u for u, _ in lst], np.int64),
               np.array([s for _, s in lst], np.float64))
           for v, lst in _tmp.items()}
    _empty = (np.empty(0, np.int64), np.empty(0, np.float64))

    def contribs(t: pa.Table) -> pa.Table:
        v_arr = t.column("user_id").to_numpy()
        i_arr = t.column("item").to_numpy()
        r_arr = t.column("rating").to_numpy()
        fans = [inv.get(int(v), _empty) for v in v_arr]
        counts = np.fromiter((len(f[0]) for f in fans), np.int64, len(fans))
        cat_u = (np.concatenate([f[0] for f in fans]) if fans
                 else np.empty(0, np.int64))
        cat_s = (np.concatenate([f[1] for f in fans]) if fans
                 else np.empty(0, np.float64))
        rep_i = np.repeat(i_arr, counts)
        rep_r = np.repeat(r_arr, counts)
        n_own = len(v_arr)
        return pa.table({
            "user_id": np.concatenate([v_arr, cat_u]),
            "item": np.concatenate([i_arr, rep_i]),
            "num": np.concatenate([np.zeros(n_own), cat_s * rep_r]),
            "den": np.concatenate([np.zeros(n_own), cat_s]),
            "own": np.concatenate([np.ones(n_own, np.int64),
                                   np.zeros(len(cat_u), np.int64)]),
        })

    agg = _sum_by(inter.map_batches(contribs, batch_format="pyarrow"),
                  ("user_id", "item"), ("num", "den", "own"))

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g[(g["own"] == 0) & (g["den"] > 0)].copy()
        if g.empty:
            return pd.DataFrame({"user_id": [], "item": [], "score": [],
                                 "rank": []})
        g["score"] = g["num"] / g["den"]
        g["skey"] = _round6_arr(g["score"].to_numpy())
        g = g.sort_values(["skey", "item"], ascending=[False, True]).head(k)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["user_id", "item", "score", "rank"]]

    out = agg.groupby("user_id").map_groups(topk, batch_format="pandas").to_pandas()
    out["user_id"] = out["user_id"].astype(np.int64)
    out["item"] = out["item"].astype(np.int64)
    out["rank"] = out["rank"].astype(np.int64)
    out["score"] = out["score"].map(lambda v: round4(float(v)))
    return (out.sort_values(["user_id", "rank"]).reset_index(drop=True)
               [["user_id", "rank", "item", "score"]])


# --------------------------------------------------- content-based similar

def _doc_tfidf_parts(sf_dir: str):
    """(exploded ⋈ df dataset, vectorized idf) shared by the content
    recommenders: per-(doc,term) df rides each row via the distributed
    hash join against the df table — no driver vocab dict."""
    n_docs, _ = _corpus_stats(sf_dir)
    from .analytics import _ex_df_ds

    return _ex_df_ds(sf_dir), _app_idf_vec(n_docs)


def recommend_similar(sf_dir: str, seeds: tuple[int, ...] = SEED_DOCS,
                      k: int = 10) -> pd.DataFrame:
    """Content-based similar documents for each seed doc.

    recommend_similar (content_based.py:265-341): cosine between TF-IDF
    doc vectors, self excluded, top-k.  Weights are the repo's SMART
    app math (1+log10 tf)*idf with L2 norms, identical to tfidf_topk so
    one oracle CTE serves both.

    Seeds' vectors are fetched once (a provably tiny filter) and
    broadcast; candidates stream through the same per-doc group stage
    as tfidf_topk.
    """
    ex, idf_vec = _doc_tfidf_parts(sf_dir)

    seed_set = set(int(s) for s in seeds)
    seed_rows = ex.map_batches(
        lambda t: t.filter(pc.is_in(t.column("doc_id"),
                                    value_set=pa.array(sorted(seed_set)))),
        batch_format="pyarrow").take_all()
    svecs: dict[int, dict[str, float]] = {}
    for r in seed_rows:
        svecs.setdefault(int(r["doc_id"]), {})[r["term"]] = \
            (1.0 + math.log10(float(r["tf"]))) \
            * float(idf_vec(np.array([r["df"]], dtype=np.float64))[0])
    for s, w in svecs.items():
        nrm = math.sqrt(sum(v * v for v in w.values()))
        svecs[s] = {t: v / nrm for t, v in w.items()} if nrm else {}

    def doc_scores(group: pd.DataFrame) -> pd.DataFrame:
        tfs = group["tf"].to_numpy(dtype=np.float64)
        terms = group["term"].tolist()
        ws = (1.0 + np.log10(tfs)) * idf_vec(group["df"].to_numpy())
        nrm = float(np.sqrt((ws * ws).sum()))
        if nrm == 0.0:
            return pd.DataFrame({"seed_id": [], "doc_id": [], "score": []})
        doc_id = int(group["doc_id"].iloc[0])
        tw = dict(zip(terms, ws / nrm))
        rows = []
        for s, sv in svecs.items():
            if doc_id == s:
                continue  # exclude_self (content_based.py:299-301)
            sc = sum(tw.get(t, 0.0) * sw for t, sw in sv.items())
            if sc > 0:
                rows.append((s, doc_id, sc))
        return pd.DataFrame(rows, columns=["seed_id", "doc_id", "score"])

    scored = ex.groupby("doc_id").map_groups(doc_scores, batch_format="pandas")

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.copy()
        g["skey"] = _round6_arr(g["score"].to_numpy())
        g = g.sort_values(["skey", "doc_id"], ascending=[False, True]).head(k)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["seed_id", "rank", "doc_id", "score"]]

    out = scored.groupby("seed_id").map_groups(topk, batch_format="pandas").to_pandas()
    out["seed_id"] = out["seed_id"].astype(np.int64)
    out["doc_id"] = out["doc_id"].astype(np.int64)
    out["rank"] = out["rank"].astype(np.int64)
    out["score"] = out["score"].map(lambda v: round4(float(v)))
    return (out.sort_values(["seed_id", "rank"]).reset_index(drop=True)
               [["seed_id", "rank", "doc_id", "score"]])


# -------------------------------------------------------- weighted hybrid

def hybrid_recommend(sf_dir: str, seed: int = HYBRID_SEED, k: int = 10) -> pd.DataFrame:
    """Weighted hybrid for a seed document (recommend_weighted(doc_id=..)).

    hybrid_recommender.py:166-276: candidates = content top-3k similar
    docs; score = 0.5*content + 0.4*cf + 0.1*popularity.  With no target
    user the CF signal is absent (contributes 0 - the reference does NOT
    renormalize on missing signals); popularity(item) = fraction of all
    users who interacted with the item (get_item_profile,
    collaborative_filtering.py:682-700), 0 for docs never seen in events.
    """
    from ray.data.aggregate import Count

    content = recommend_similar(sf_dir, seeds=(seed,), k=3 * k)

    inter = _interactions_ds(sf_dir)
    pop_rows = inter.groupby("item").aggregate(Count(alias_name="nu")).take_all()
    n_users = inter.groupby("user_id").count().count()
    pop = {int(r["item"]): float(r["nu"]) / float(n_users) for r in pop_rows}

    out = content.copy()
    out["content_score"] = out["score"]
    out["popularity"] = out["doc_id"].map(lambda d: round4(pop.get(int(d), 0.0)))
    hybrid = (W_CONTENT * out["content_score"].to_numpy()
              + W_POP * out["popularity"].to_numpy())
    out["score"] = _round6_arr(hybrid)
    out = out.sort_values(["score", "doc_id"], ascending=[False, True]).head(k).copy()
    out["rank"] = np.arange(1, len(out) + 1, dtype=np.int64)
    out["score"] = out["score"].map(lambda v: round4(float(v)))
    return out.reset_index(drop=True)[
        ["rank", "doc_id", "score", "content_score", "popularity"]]


# ------------------------------------------------------------------- ALS

def cf_als(sf_dir: str, n_factors: int = 8, n_iterations: int = 4,
           reg: float = 0.1, seed: int = 7) -> pd.DataFrame:
    """Distributed ALS over observed interactions; returns per-iteration RMSE.

    _train_als (collaborative_filtering.py:522-584) re-expressed for Ray
    Data: each half-step fixes one factor matrix, BROADCASTS it (the
    designated small side: n*k floats), and solves the other side's
    ridge systems inside a groupby().map_groups over the interactions -
    the big side never leaves the object store.  RMSE over observed
    entries is a streamed partial-sum aggregate, not a dense n_users x
    n_items reconstruction.

    At 1e9 users the collected factor matrix no longer fits one driver;
    the same loop then keeps factors as a Dataset and hash-joins factor
    shards to interaction buckets - the solve stage is unchanged.

    Init is per-id deterministic (seeded by entity id), so results do
    not depend on partitioning.
    """
    from ray.data.aggregate import Count, Sum

    inter = _interactions_ds(sf_dir)

    def init_factors(key: str) -> dict[int, np.ndarray]:
        ids = [int(r[key]) for r in
               inter.groupby(key).aggregate(Count(alias_name="c")).take_all()]
        return {i: np.random.default_rng(seed * 1_000_003 + i)
                .normal(0.0, 0.1, n_factors) for i in ids}

    user_f = init_factors("user_id")
    item_f = init_factors("item")
    eye = reg * np.eye(n_factors)

    def solve_side(own_key: str, other_key: str,
                   other_f: dict[int, np.ndarray]) -> dict[int, np.ndarray]:
        def solve(g: pd.DataFrame) -> pd.DataFrame:
            oid = int(g[own_key].iloc[0])
            V = np.stack([other_f[int(x)] for x in g[other_key]])
            r = g["rating"].to_numpy(dtype=np.float64)
            f = np.linalg.solve(V.T @ V + eye, V.T @ r)
            return pd.DataFrame({"id": [oid], "f": [f.tolist()]})

        rows = inter.groupby(own_key).map_groups(solve, batch_format="pandas").take_all()
        return {int(r["id"]): np.asarray(r["f"], dtype=np.float64) for r in rows}

    def rmse() -> float:
        u_ids = sorted(user_f)
        i_ids = sorted(item_f)
        U = np.stack([user_f[u] for u in u_ids])
        V = np.stack([item_f[i] for i in i_ids])
        u_row = {u: j for j, u in enumerate(u_ids)}
        i_row = {i: j for j, i in enumerate(i_ids)}

        def se(t: pa.Table) -> pa.Table:
            ui = pd.Series(t.column("user_id").to_numpy()).map(u_row).to_numpy()
            vi = pd.Series(t.column("item").to_numpy()).map(i_row).to_numpy()
            r = t.column("rating").to_numpy()
            pred = np.einsum("ij,ij->i", U[ui], V[vi])
            err = (r - pred) ** 2
            # per-batch PARTIAL sums: only two floats per batch shuffle
            return pa.table({"se": pa.array([float(err.sum())], pa.float64()),
                             "n": pa.array([len(err)], pa.int64())})

        agg = inter.map_batches(se, batch_format="pyarrow").aggregate(
            Sum("se", alias_name="se"), Sum("n", alias_name="n"))
        return math.sqrt(float(agg["se"]) / float(agg["n"]))

    hist = [{"iteration": 0, "rmse": round4(rmse())}]
    for it in range(1, n_iterations + 1):
        user_f = solve_side("user_id", "item", item_f)
        item_f = solve_side("item", "user_id", user_f)
        hist.append({"iteration": it, "rmse": round4(rmse())})
    return pd.DataFrame(hist)


def _als_init(entity_id: int, j: int) -> float:
    """Arithmetic deterministic factor init — pure integer ops both
    NumPy and SQL evaluate exactly (all intermediates < 2^53):
    ((id*2654435761 + j*40503) % 1000003) / 1000003 * 0.2 - 0.1."""
    return ((entity_id * 2654435761 + j * 40503) % 1000003) / 1000003.0 * 0.2 - 0.1


def cf_als_fixed(sf_dir: str, n_iterations: int = 3, reg: float = 0.1) -> pd.DataFrame:
    """Oracle-deterministic rank-2 ALS (the cf_als alternation with the
    two SQL-blocking pieces swapped out): factor init is the arithmetic
    `_als_init` formula instead of a NumPy RNG, and each ridge solve is
    the explicit 2x2 Cramer rule instead of LAPACK — so the oracle can
    unroll the full alternation in SQL and match RMSE at round4.
    Distributed shape is cf_als's exactly: fixed side broadcast,
    per-entity solves in groupby().map_groups, RMSE as partial sums
    (collaborative_filtering.py:522-584 semantics)."""
    from ray.data.aggregate import Sum

    inter = _interactions_ds(sf_dir)

    def init_factors(key: str) -> dict[int, np.ndarray]:
        ids = [int(r[key]) for r in
               inter.groupby(key).aggregate(Sum("rating", alias_name="s")).take_all()]
        return {i: np.array([_als_init(i, 1), _als_init(i, 2)]) for i in ids}

    user_f = init_factors("user_id")
    item_f = init_factors("item")

    def solve_side(own_key: str, other_key: str,
                   other_f: dict[int, np.ndarray]) -> dict[int, np.ndarray]:
        def solve(g: pd.DataFrame) -> pd.DataFrame:
            oid = int(g[own_key].iloc[0])
            V = np.stack([other_f[int(x)] for x in g[other_key]])
            r = g["rating"].to_numpy(dtype=np.float64)
            s11 = float(np.sum(V[:, 0] * V[:, 0])) + reg
            s22 = float(np.sum(V[:, 1] * V[:, 1])) + reg
            s12 = float(np.sum(V[:, 0] * V[:, 1]))
            b1 = float(np.sum(r * V[:, 0]))
            b2 = float(np.sum(r * V[:, 1]))
            det = s11 * s22 - s12 * s12
            f = [(b1 * s22 - b2 * s12) / det, (b2 * s11 - b1 * s12) / det]
            return pd.DataFrame({"id": [oid], "f": [f]})

        rows = inter.groupby(own_key).map_groups(solve, batch_format="pandas").take_all()
        return {int(r["id"]): np.asarray(r["f"], dtype=np.float64) for r in rows}

    def rmse() -> float:
        u_ids = sorted(user_f)
        i_ids = sorted(item_f)
        U = np.stack([user_f[u] for u in u_ids])
        V = np.stack([item_f[i] for i in i_ids])
        u_row = {u: j for j, u in enumerate(u_ids)}
        i_row = {i: j for j, i in enumerate(i_ids)}

        def se(t: pa.Table) -> pa.Table:
            ui = pd.Series(t.column("user_id").to_numpy()).map(u_row).to_numpy()
            vi = pd.Series(t.column("item").to_numpy()).map(i_row).to_numpy()
            r = t.column("rating").to_numpy()
            pred = np.einsum("ij,ij->i", U[ui], V[vi])
            err = (r - pred) ** 2
            return pa.table({"se": pa.array([float(err.sum())], pa.float64()),
                             "n": pa.array([len(err)], pa.int64())})

        agg = inter.map_batches(se, batch_format="pyarrow").aggregate(
            Sum("se", alias_name="se"), Sum("n", alias_name="n"))
        return math.sqrt(float(agg["se"]) / float(agg["n"]))

    hist = [{"iteration": 0, "rmse": round4(rmse())}]
    for it in range(1, n_iterations + 1):
        user_f = solve_side("user_id", "item", item_f)
        item_f = solve_side("item", "user_id", user_f)
        hist.append({"iteration": it, "rmse": round4(rmse())})
    return pd.DataFrame(hist)
