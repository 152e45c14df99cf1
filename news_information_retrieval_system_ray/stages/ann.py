"""Similarity search over an embedding column (list<float>).

- Brute-force cosine top-k: the query matrix is broadcast ONCE via
  ``ray.put`` (never re-shipped per batch); each batch does one
  vectorized matmul and emits only its per-batch top-k candidates
  (partial top-k), which a tiny final groupby(qid) reduces — so the
  full score matrix never materializes.
- LSH-bucketed variant (the scale path): deterministic random
  hyperplane signatures bucket the corpus; queries probe only their
  bucket (+ multiprobe neighbors), trading recall for touched rows.
  Recall is measured against brute force in tests.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _normalize_rows(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def vecs_from_column(col) -> np.ndarray:
    """Arrow list<float> column -> (n, d) float64 matrix, zero-copy-ish:
    flatten the child values buffer and reshape (embeddings are
    fixed-dimension, so the list lengths are uniform) — no Python-object
    round-trip through ``to_pylist``."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty((0, 0), dtype=np.float64)
    if pa.types.is_fixed_size_list(col.type):
        d = col.type.list_size
        return col.values.to_numpy(zero_copy_only=False).astype(
            np.float64, copy=False).reshape(n, d)
    import pyarrow.compute as pc

    flat = pc.list_flatten(col).to_numpy(zero_copy_only=False)
    assert flat.size % n == 0, "ragged embedding column"
    return flat.astype(np.float64, copy=False).reshape(n, -1)


class BruteForceTopK:
    """map_batches body: per-batch cosine top-k against broadcast queries."""

    def __init__(self, queries_ref, k: int = 10, vec_col: str = "embedding", id_col: str = "vec_id"):
        import ray

        q = ray.get(queries_ref) if not isinstance(queries_ref, np.ndarray) else queries_ref
        self.q = _normalize_rows(np.asarray(q, dtype=np.float64))  # (nq, d), once per actor
        self.k = k
        self.vec_col = vec_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_numpy(zero_copy_only=False)
        mat = vecs_from_column(batch.column(self.vec_col))
        mat = _normalize_rows(mat)
        sims = self.q @ mat.T  # (nq, batch)
        k = min(self.k, ids.size)
        out_q, out_id, out_s = [], [], []
        for qi in range(self.q.shape[0]):
            row = sims[qi]
            top = np.argpartition(-row, k - 1)[:k] if k < row.size else np.arange(row.size)
            for j in top:
                out_q.append(qi)
                out_id.append(int(ids[j]))
                out_s.append(float(row[j]))
        return pa.table({
            "qid": pa.array(out_q, pa.int64()),
            "vec_id": pa.array(out_id, pa.int64()),
            "score": pa.array(out_s, pa.float64()),
        })


def brute_force_topk(ds, queries: np.ndarray, k: int = 10,
                     vec_col: str = "embedding", id_col: str = "vec_id") -> pd.DataFrame:
    """Global top-k per query: partial per-batch top-k -> groupby(qid) merge.

    Returns (qid, rank, vec_id, score) with canonical (-score, vec_id)
    tie-break, score rounded to 4 decimals AFTER ranking.
    """
    import ray

    qref = ray.put(np.asarray(queries, dtype=np.float64))
    partial = ds.map_batches(
        BruteForceTopK(qref, k=k, vec_col=vec_col, id_col=id_col),
        batch_format="pyarrow",
    )

    # tiny driver merge (<= nq*k rows per batch) instead of a
    # groupby(qid) sort exchange — the all-to-all cost ~1 s of fixed
    # latency to merge a few hundred rows (same pattern as analytics
    # _topk_by_qid).  Per-(qid, id) dedupe first: the bucketed-LSH
    # layout stores a row once per table, so a candidate can arrive
    # several times (identical score each time).
    parts = partial.to_pandas()
    parts = parts.drop_duplicates(["qid", "vec_id"]) \
                 .sort_values(["score", "vec_id"], ascending=[False, True])
    out = parts.groupby("qid", sort=True).head(k).copy()
    out["rank"] = (out.groupby("qid").cumcount() + 1).astype(np.int64)
    out = out.sort_values(["qid", "rank"]).reset_index(drop=True)
    out["score"] = out["score"].round(4)
    return out[["qid", "rank", "vec_id", "score"]]


def kmeans(ds, *, k: int = 8, dim: int, n_iter: int = 10, seed: int = 17,
           vec_col: str = "embedding", id_col: str = "vec_id",
           with_assign: bool = True):
    """Distributed Lloyd's k-means (the reference's doc-clustering
    capability, /root/reference/src/ir/cluster/doc_cluster.py, re-expressed
    Ray-Data-first): each iteration is one map_batches pass emitting
    per-batch partial sums (sum vector + count per centroid); the driver
    reduces partials and updates centroids (k x dim — tiny).  Returns
    (centroids, assignments DataFrame).  Deterministic: seeded init from
    the first batch's vectors, fixed iteration count."""
    import ray

    # pin the input in the object store once: a lazy read_parquet would
    # otherwise re-read and re-decode the parquet on EVERY iteration
    ds = ds.materialize()
    first = ds.take_batch(max(k * 4, 64), batch_format="pandas")
    init = np.array(first[vec_col].tolist(), dtype=np.float64)
    rng = np.random.default_rng(seed)
    centroids = init[rng.choice(init.shape[0], size=k, replace=False)]

    for _ in range(n_iter):
        cref = ray.put(centroids)

        def partial(t: pa.Table) -> pa.Table:
            # plain function (task pool, elastic): the centroid matrix is
            # k x dim — the per-batch ray.get hits the local object store
            c = ray.get(cref)
            m = vecs_from_column(t.column(vec_col))
            d2 = ((m[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
            lab = d2.argmin(axis=1)
            sums = np.zeros_like(c)
            np.add.at(sums, lab, m)
            counts = np.bincount(lab, minlength=c.shape[0])
            return pa.table({
                "cid": pa.array(np.arange(c.shape[0]), pa.int64()),
                "vsum": pa.array(sums.tolist(), pa.list_(pa.float64())),
                "n": pa.array(counts.astype(np.int64)),
            })

        parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
        sums = np.zeros_like(centroids)
        counts = np.zeros(k, dtype=np.int64)
        for cid, vs, n in zip(parts["cid"], parts["vsum"], parts["n"]):
            sums[cid] += np.asarray(vs)
            counts[cid] += n
        nonzero = counts > 0
        centroids[nonzero] = sums[nonzero] / counts[nonzero, None]

    if not with_assign:
        return centroids, None
    assign = assign_to_centroids(ds, centroids, vec_col=vec_col,
                                 id_col=id_col).to_pandas()
    return centroids, assign.sort_values(id_col).reset_index(drop=True)


def assign_to_centroids(ds, centroids: np.ndarray, *,
                        vec_col: str = "embedding", id_col: str = "vec_id"):
    """Nearest-centroid assignment as a streaming ``map_batches`` —
    returns the lazy Dataset (id, cluster, dist2) so callers can keep it
    distributed (e.g. join it against a token stream) instead of pulling
    every row to the driver.  Centroids (k x dim — tiny) broadcast once
    via ``ray.put``; ties break to the lowest centroid id (numpy argmin)."""
    import ray

    cref = ray.put(np.asarray(centroids, dtype=np.float64))

    def assign_fn(t: pa.Table) -> pa.Table:
        c = ray.get(cref)
        m = vecs_from_column(t.column(vec_col))
        d2 = ((m[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        return pa.table({
            id_col: t.column(id_col).cast(pa.int64()),
            "cluster": pa.array(d2.argmin(axis=1).astype(np.int64)),
            "dist2": pa.array(d2.min(axis=1)),
        })

    return ds.map_batches(assign_fn, batch_format="pyarrow")


class LshSignStage:
    """Multi-table random-hyperplane LSH (deterministic seed).

    ``n_tables`` independent sign-hash tables of ``n_planes`` bits each;
    a row is a candidate for a query if ANY table's bucket matches (the
    standard L-table LSH recall boost). Bucket ids are table-offset so
    one int64 column carries all tables."""

    def __init__(self, dim: int, n_planes: int = 8, n_tables: int = 4,
                 seed: int = 99, vec_col: str = "embedding"):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((n_tables, n_planes, dim))
        self.n_planes = n_planes
        self.n_tables = n_tables
        self.vec_col = vec_col

    def buckets_of(self, vecs: np.ndarray) -> np.ndarray:
        """(n, n_tables) int64 bucket ids, offset by table."""
        out = np.empty((vecs.shape[0], self.n_tables), dtype=np.int64)
        for t in range(self.n_tables):
            signs = (vecs @ self.planes[t].T) > 0
            b = (signs * (1 << np.arange(self.n_planes))).sum(axis=1)
            out[:, t] = b + (t << (self.n_planes + 1))
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        mat = vecs_from_column(batch.column(self.vec_col))
        return batch.append_column(
            "buckets", pa.array(self.buckets_of(mat).tolist(), pa.list_(pa.int64())))


def lsh_topk(ds, queries: np.ndarray, k: int = 10, *, dim: int, n_planes: int = 8,
             n_tables: int = 4, seed: int = 99, multiprobe: int = 1,
             vec_col: str = "embedding", id_col: str = "vec_id") -> pd.DataFrame:
    """Approximate top-k: probe rows sharing a bucket with a query in any
    table (plus ``multiprobe``-bit-flip neighbor buckets).  At scale the
    bucket columns are partition keys (bucketed layout, one shuffle at
    ingest); here they are a vectorized filter."""
    stage = LshSignStage(dim=dim, n_planes=n_planes, n_tables=n_tables,
                         seed=seed, vec_col=vec_col)
    q = np.asarray(queries, dtype=np.float64)
    probe: set[int] = set()
    for row in stage.buckets_of(q):
        for t, b in enumerate(row.tolist()):
            probe.add(b)
            if multiprobe >= 1:
                base = b - (t << (n_planes + 1))
                for i in range(n_planes):
                    probe.add((base ^ (1 << i)) + (t << (n_planes + 1)))
    bucketed = ds.map_batches(stage, batch_format="pyarrow")
    probe_arr = pa.array(sorted(probe), pa.int64())

    def filter_candidates(t: pa.Table) -> pa.Table:
        flat = pa.compute.list_flatten(t.column("buckets"))
        hit = pa.compute.is_in(flat, value_set=probe_arr).to_numpy(zero_copy_only=False)
        mask = hit.reshape(t.num_rows, n_tables).any(axis=1)
        return t.filter(pa.array(mask)).drop_columns(["buckets"])

    cand = bucketed.map_batches(filter_candidates, batch_format="pyarrow")
    return brute_force_topk(cand, q, k=k, vec_col=vec_col, id_col=id_col)


def lsh_build_bucketed(ds, out_dir: str, *, dim: int, n_planes: int = 8,
                       n_tables: int = 4, seed: int = 99,
                       vec_col: str = "embedding") -> str:
    """Materialize the BUCKETED LAYOUT — the 100-TB scale path: each row
    is written once per LSH table under a hive partition keyed by its
    bucket id, so a query's probe set maps to a handful of partition
    DIRECTORIES and everything else is never read (Parquet partition
    pruning), instead of scanning + filtering the whole corpus.
    Storage cost is the standard L-times LSH duplication (n_tables x).
    """
    stage = LshSignStage(dim=dim, n_planes=n_planes, n_tables=n_tables,
                         seed=seed, vec_col=vec_col)

    def explode(batch: pa.Table) -> pa.Table:
        mat = vecs_from_column(batch.column(vec_col))
        buckets = stage.buckets_of(mat)  # (n, n_tables)
        n = batch.num_rows
        rep = np.repeat(np.arange(n, dtype=np.int64), stage.n_tables)
        take = pa.array(rep)
        cols = {name: batch.column(name).take(take) for name in batch.column_names}
        cols["bucket"] = pa.array(buckets.reshape(-1))
        return pa.table(cols)

    ds.map_batches(explode, batch_format="pyarrow") \
      .write_parquet(out_dir, partition_cols=["bucket"])
    return out_dir


def lsh_topk_bucketed(out_dir: str, queries: np.ndarray, k: int = 10, *,
                      dim: int, n_planes: int = 8, n_tables: int = 4,
                      seed: int = 99, multiprobe: int = 1,
                      vec_col: str = "embedding", id_col: str = "vec_id") -> pd.DataFrame:
    """Query the bucketed layout: probe buckets -> partition-pruned read
    -> per-id dedupe happens in the top-k merge (a row stored in several
    probed buckets must not occupy several result slots)."""
    import pyarrow.dataset as pads
    import ray.data as rd

    stage = LshSignStage(dim=dim, n_planes=n_planes, n_tables=n_tables,
                         seed=seed, vec_col=vec_col)
    q = np.asarray(queries, dtype=np.float64)
    probe: set[int] = set()
    for row in stage.buckets_of(q):
        for t, b in enumerate(row.tolist()):
            probe.add(b)
            if multiprobe >= 1:
                base = b - (t << (n_planes + 1))
                for i in range(n_planes):
                    probe.add((base ^ (1 << i)) + (t << (n_planes + 1)))
    def dedupe_batch(t: pa.Table) -> pa.Table:
        # a vec can land in several probed buckets coalesced into one
        # batch; per-batch top-k slots must go to distinct ids (the merge
        # handles cross-batch duplicates)
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        _, first = np.unique(ids, return_index=True)
        return t.take(pa.array(np.sort(first)))

    # partition pruning by PATH: only the probe buckets' directories are
    # ever listed/read (Ray's read_parquet cannot push a filter down to
    # hive partition columns, so the pruning is done at path level —
    # same IO outcome)
    import glob as _glob
    import os as _os

    paths = [f for b in sorted(probe)
             for f in sorted(_glob.glob(
                 _os.path.join(out_dir, f"bucket={b}", "*.parquet")))]
    if not paths:
        return pd.DataFrame({"qid": pd.Series(dtype=np.int64),
                             "rank": pd.Series(dtype=np.int64),
                             "vec_id": pd.Series(dtype=np.int64),
                             "score": pd.Series(dtype=np.float64)})
    cand = rd.read_parquet(paths).map_batches(dedupe_batch, batch_format="pyarrow")
    return brute_force_topk(cand, q, k=k, vec_col=vec_col, id_col=id_col)


# ---------------------------------------------------------------- IVF
def ivf_build(ds, out_dir: str, *, dim: int, n_lists: int = 16,
              n_iter: int = 8, seed: int = 17,
              vec_col: str = "embedding", id_col: str = "vec_id") -> str:
    """Materialize the IVF layout — the k-means scale path: train a
    coarse quantizer (the distributed :func:`kmeans` above), then write
    each row ONCE under a hive partition keyed by its nearest centroid
    ("inverted list").  Unlike LSH there is no storage duplication; the
    probe set is chosen by centroid distance at query time.  Centroids
    persist as a parquet sidecar (tiny: n_lists x dim).
    """
    import os as _os

    import pyarrow.parquet as _pq
    import ray

    centroids, _ = kmeans(ds, k=n_lists, dim=dim, n_iter=n_iter, seed=seed,
                          vec_col=vec_col, id_col=id_col)
    cref = ray.put(centroids)

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(cref)
        m = vecs_from_column(batch.column(vec_col))
        d2 = ((m[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        cols = {name: batch.column(name) for name in batch.column_names}
        cols["ivf_list"] = pa.array(d2.argmin(axis=1).astype(np.int64))
        return pa.table(cols)

    ds.map_batches(assign, batch_format="pyarrow") \
      .write_parquet(out_dir, partition_cols=["ivf_list"])
    _pq.write_table(
        pa.table({"list_id": pa.array(np.arange(n_lists, dtype=np.int64)),
                  "centroid": pa.array(centroids.tolist(),
                                       pa.list_(pa.float64()))}),
        _os.path.join(out_dir, "_centroids.parquet"))
    return out_dir


def ivf_topk(out_dir: str, queries: np.ndarray, k: int = 10, *,
             nprobe: int = 4, vec_col: str = "embedding",
             id_col: str = "vec_id") -> pd.DataFrame:
    """Query the IVF layout: each query probes its ``nprobe`` nearest
    inverted lists; only the union of probed list PARTITIONS is read
    (path-level pruning, same IO outcome as partition-filter pushdown),
    then the brute-force kernel ranks the candidate subset.  Recall vs
    exhaustive search is measured in tests (tests/test_dedup_ann_stages).
    """
    import glob as _glob
    import os as _os

    import pyarrow.parquet as _pq
    import ray.data as rd

    cent_tbl = _pq.read_table(_os.path.join(out_dir, "_centroids.parquet"))
    centroids = vecs_from_column(cent_tbl.column("centroid"))
    q = np.asarray(queries, dtype=np.float64)
    d2 = ((q[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
    nprobe = min(nprobe, centroids.shape[0])
    probe = np.unique(np.argsort(d2, axis=1)[:, :nprobe])
    paths = [f for b in probe.tolist()
             for f in sorted(_glob.glob(
                 _os.path.join(out_dir, f"ivf_list={b}", "*.parquet")))]
    if not paths:
        return pd.DataFrame({"qid": pd.Series(dtype=np.int64),
                             "rank": pd.Series(dtype=np.int64),
                             "vec_id": pd.Series(dtype=np.int64),
                             "score": pd.Series(dtype=np.float64)})
    cand = rd.read_parquet(paths, columns=[id_col, vec_col])
    return brute_force_topk(cand, q, k=k, vec_col=vec_col, id_col=id_col)


# --------------------------------------------------------------- IVF-PQ

def _pq_train_codebooks(sample: np.ndarray, m_sub: int, n_codes: int,
                        n_iter: int = 12, seed: int = 17) -> np.ndarray:
    """(m_sub, n_codes, dim/m_sub) product-quantizer codebooks via
    per-subspace Lloyd k-means on a TRAINING SAMPLE (the standard PQ
    recipe — Jegou et al., "Product Quantization for Nearest Neighbor
    Search", TPAMI 2011: codebooks train on a corpus sample, never the
    full collection).  Deterministic seeded init per subspace."""
    n, dim = sample.shape
    if dim % m_sub:
        raise ValueError(f"dim {dim} not divisible by m_sub {m_sub}")
    dsub = dim // m_sub
    k = min(n_codes, n)
    books = np.empty((m_sub, k, dsub), dtype=np.float64)
    for m in range(m_sub):
        x = sample[:, m * dsub:(m + 1) * dsub]
        rng = np.random.default_rng(seed * 10_007 + m)
        cent = x[rng.choice(n, size=k, replace=False)].copy()
        for _ in range(n_iter):
            d2 = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            a = d2.argmin(axis=1)
            for j in range(k):
                mask = a == j
                if mask.any():
                    cent[j] = x[mask].mean(axis=0)
        books[m] = cent
    return books


def _pq_encode(residual: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(n, m_sub) uint8 codes: per-subspace nearest codeword."""
    n, dim = residual.shape
    m_sub, k, dsub = books.shape
    codes = np.empty((n, m_sub), dtype=np.uint8)
    for m in range(m_sub):
        x = residual[:, m * dsub:(m + 1) * dsub]
        d2 = ((x[:, None, :] - books[m][None, :, :]) ** 2).sum(axis=2)
        codes[:, m] = d2.argmin(axis=1).astype(np.uint8)
    return codes


def ivfpq_build(ds, out_dir: str, *, dim: int, n_lists: int = 16,
                m_sub: int = 8, n_codes: int = 256, train_sample: int = 4096,
                n_iter: int = 8, seed: int = 17,
                vec_col: str = "embedding", id_col: str = "vec_id") -> str:
    """Materialize the IVF-PQ layout — the MEMORY scale path: the coarse
    quantizer partitions rows into inverted lists (hive dirs, like
    :func:`ivf_build`), and each row stores only ``m_sub`` BYTES of PQ
    codes over its residual (x - centroid) instead of ``dim`` float64s
    — a 64x shrink at dim=64/m_sub=8, which is what lets a 10^11-vector
    collection's candidate lists stream through workers.  Codebooks
    train on a bounded sample (driver-side numpy, documented PQ
    practice); centroids + codebooks persist as sidecars."""
    import os as _os

    import pyarrow.parquet as _pq
    import ray

    centroids, _ = kmeans(ds, k=n_lists, dim=dim, n_iter=n_iter, seed=seed,
                          vec_col=vec_col, id_col=id_col)
    sample_rows = ds.limit(int(train_sample)).take_all()
    sample = np.array([r[vec_col] for r in sample_rows], dtype=np.float64)
    d2s = ((sample[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
    books = _pq_train_codebooks(sample - centroids[d2s.argmin(axis=1)],
                                m_sub, n_codes, seed=seed)
    cref = ray.put((centroids, books))

    def encode(batch: pa.Table) -> pa.Table:
        c, b = ray.get(cref)
        m = vecs_from_column(batch.column(vec_col))
        d2 = ((m[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        lists = d2.argmin(axis=1)
        codes = _pq_encode(m - c[lists], b)
        blob = codes.tobytes()  # one serialization for the whole batch
        w = codes.shape[1]
        return pa.table({
            id_col: batch.column(id_col),
            "pq_code": pa.array([blob[i * w:(i + 1) * w]
                                 for i in range(codes.shape[0])],
                                pa.binary()),
            # list id rides IN the row too (1 byte after parquet dict
            # encoding): the query side reads every probed partition in
            # ONE dataset, where the hive key column is absent
            "list_id": pa.array(lists.astype(np.int32)),
            "ivf_list": pa.array(lists.astype(np.int64)),
        })

    ds.map_batches(encode, batch_format="pyarrow") \
      .write_parquet(out_dir, partition_cols=["ivf_list"])
    _pq.write_table(
        pa.table({"list_id": pa.array(np.arange(centroids.shape[0],
                                                dtype=np.int64)),
                  "centroid": pa.array(centroids.tolist(),
                                       pa.list_(pa.float64()))}),
        _os.path.join(out_dir, "_centroids.parquet"))
    _pq.write_table(
        pa.table({"m": pa.array(np.repeat(np.arange(books.shape[0]),
                                          books.shape[1]).astype(np.int64)),
                  "code": pa.array(np.tile(np.arange(books.shape[1]),
                                           books.shape[0]).astype(np.int64)),
                  "codeword": pa.array(
                      books.reshape(-1, books.shape[2]).tolist(),
                      pa.list_(pa.float64()))}),
        _os.path.join(out_dir, "_codebooks.parquet"))
    return out_dir


def ivfpq_topk(out_dir: str, queries: np.ndarray, k: int = 10, *,
               nprobe: int = 4, id_col: str = "vec_id") -> pd.DataFrame:
    """Query the IVF-PQ layout with asymmetric distance computation:
    per (query, probed list) the score is the inner product
    ``q . centroid + sum_m LUT[m, code_m]`` where
    ``LUT[m, c] = q_sub_m . codeword[m, c]`` — one tiny table per
    query, then candidate scoring is ONE uint8 gather + sum per batch
    (no float vectors are ever read back).  Candidates stream from only
    the probed hive partitions; per-batch partial top-k, driver merge.
    Approximate by construction — recall vs exhaustive is asserted in
    tests; ranking key is (-score, vec_id) like the exact kernels."""
    import glob as _glob
    import os as _os

    import pyarrow.parquet as _pq
    import ray.data as rd

    cent_tbl = _pq.read_table(_os.path.join(out_dir, "_centroids.parquet"))
    centroids = vecs_from_column(cent_tbl.column("centroid"))
    cb = _pq.read_table(_os.path.join(out_dir, "_codebooks.parquet"))
    m_sub = int(cb.column("m").to_numpy().max()) + 1
    n_codes = int(cb.column("code").to_numpy().max()) + 1
    books = vecs_from_column(cb.column("codeword")).reshape(
        m_sub, n_codes, -1)
    dsub = books.shape[2]
    q = np.asarray(queries, dtype=np.float64)
    nq = q.shape[0]
    d2 = ((q[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
    nprobe = min(nprobe, centroids.shape[0])
    probes = np.argsort(d2, axis=1)[:, :nprobe]          # (nq, nprobe)
    # per-query ADC tables: (nq, m_sub, n_codes)
    luts = np.einsum("qmd,mcd->qmc",
                     q.reshape(nq, m_sub, dsub), books)
    qdotc = q @ centroids.T                              # (nq, n_lists)

    probed_lists = np.unique(probes).tolist()
    paths = [f for b in probed_lists
             for f in sorted(_glob.glob(
                 _os.path.join(out_dir, f"ivf_list={b}", "*.parquet")))]
    if not paths:
        return pd.DataFrame({"qid": pd.Series(dtype=np.int64),
                             "rank": pd.Series(dtype=np.int64),
                             "vec_id": pd.Series(dtype=np.int64),
                             "score": pd.Series(dtype=np.float64)})
    qids_of = {b: np.flatnonzero((probes == b).any(axis=1))
               for b in probed_lists}

    def score(t: pa.Table) -> pa.Table:
        # ONE dataset over every probed partition (not one Ray job per
        # list); the in-row list_id column restores each candidate's
        # coarse cell, and the tiny per-batch loop over distinct lists
        # (<= nprobe * nq cells) keeps the gather+sum fully vectorized
        ids_all = t.column(id_col).to_numpy(zero_copy_only=False)
        lid = t.column("list_id").to_numpy(zero_copy_only=False)
        code_col = t.column("pq_code")
        if isinstance(code_col, pa.ChunkedArray):
            code_col = code_col.combine_chunks()
        codes_all = np.frombuffer(
            b"".join(code_col.to_pylist()),
            dtype=np.uint8).reshape(ids_all.size, m_sub)
        o_q, o_id, o_s = [], [], []
        for b in np.unique(lid).tolist():
            rows_b = np.flatnonzero(lid == b)
            _qids = qids_of.get(int(b))
            if _qids is None or rows_b.size == 0:
                continue
            ids = ids_all[rows_b]
            codes = codes_all[rows_b]
            s = qdotc[_qids, int(b)][:, None] \
                + luts[_qids][:, np.arange(m_sub)[None, :], codes].sum(axis=2)
            kk = min(k, ids.size)
            part = np.argpartition(-s, kk - 1, axis=1)[:, :kk]
            for row, qi in enumerate(_qids.tolist()):
                sel = part[row]
                order = sel[np.lexsort((ids[sel], -s[row, sel]))]
                o_q += [qi] * kk
                o_id += ids[order].astype(np.int64).tolist()
                o_s += s[row, order].tolist()
        return pa.table({"qid": pa.array(o_q, pa.int64()),
                         "vec_id": pa.array(o_id, pa.int64()),
                         "score": pa.array(o_s, pa.float64())})

    allp = rd.read_parquet(paths, columns=[id_col, "pq_code", "list_id"]) \
             .map_batches(score, batch_format="pyarrow").to_pandas()
    if allp.empty:
        return pd.DataFrame({"qid": pd.Series(dtype=np.int64),
                             "rank": pd.Series(dtype=np.int64),
                             "vec_id": pd.Series(dtype=np.int64),
                             "score": pd.Series(dtype=np.float64)})
    allp = allp.sort_values(["qid", "score", "vec_id"],
                            ascending=[True, False, True], kind="mergesort")
    allp = allp.groupby("qid", group_keys=False).head(k).copy()
    allp["rank"] = allp.groupby("qid").cumcount() + 1
    return allp.reset_index(drop=True)[["qid", "rank", "vec_id", "score"]]
