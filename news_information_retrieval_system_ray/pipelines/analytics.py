"""Analytics / IR queries over the testdata tables (documents, embeddings,
events, orders) — the ``queries()`` surface checked by the correctness
driver against DuckDB oracle SQL.

Conventions shared with the SQL in ``__ray_entry__.oracle_sql``:

- normalization: ``trim(regexp_replace(lower(text),'\\s+',' '))`` — the
  app chain (index_service.py:71-81); NFKC and 臺→台 are identity on this
  ASCII corpus, so the whitespace tokenizer is SQL-expressible.
- tokens: split on ' ', keep tokens matching ``[a-z0-9_]`` (the
  reference's token filter, index_service.py:97).
- doc_len: ``max(1, n_tokens)`` (index_service.py:285).
- floats are rounded half-away-from-zero to 4 decimals to match DuckDB
  ``round``; ratio-style outputs return integer numerators/denominators
  instead of floats wherever possible (exact hashing).
- canonical ranking order: (-score, id asc) (SURVEY §7.6.2).

Scale notes are inline: anything that collects to the driver here is a
provably small result (top-k, vocab-sized maps, fixed-query postings);
the wide paths are groupby shuffles.
"""

from __future__ import annotations

import math
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from ..stages.indexing import ExplodeTokens
from ..stages.tokenizer import TokenizeStage

K1, B = 1.5, 0.75

# fixed query sets (terms exist in the synthetic documents vocabulary)
FIXED_QUERIES: dict[str, list[str]] = {
    "q1": ["spark", "join"],
    "q2": ["merge", "sort", "table"],
    "q3": ["vector", "window", "batch", "stream"],
}
PHRASE = ["batch", "stream"]
BOOL_AND = ["spark", "vector"]
BOOL_NOT = (["spark", "join"], ["dup"])
FUZZY_TERM = "spark"      # edit-distance<=1 expansion target (fuzzy.py:63-213)
FUZZY_EXPAND_TERM = "part"  # distance<=2 expand/stats target (richest neighborhood in the test vocab)
WILDCARD_PREFIX = "wind"  # prefix wildcard 'wind*' (wildcard.py:81-175)
FACET_LANG = "en"         # facet filter value (search_service.py:413-432)
MU = 2000.0               # Dirichlet smoothing (index_service.py:383-388)
RRF_K0 = 60.0             # RRF constant (search_service.py:268-295)
RRF_DEPTH = 50            # per-ranker depth max(50, k*5) at k=10
RRF_W_BM25, RRF_W_TFIDF = 0.65, 0.35


def round4(x: float) -> float:
    """Half-away-from-zero, matching DuckDB round (Python round is banker's)."""
    return math.floor(abs(x) * 1e4 + 0.5) / 1e4 * (1 if x >= 0 else -1)


def _docs_ds(sf_dir: str, columns: list[str] | None = None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


# Memoized materialized intermediates shared across the query battery.
# Every analytics query re-derives the tokenized/exploded corpus; at
# correctness-harness scale these tables are tiny (<< object store), and
# the driver/bench call dozens of queries in one session — materializing
# once cuts the battery wall-time ~3x.  Keyed per (sf_dir, variant);
# bounded by eviction so long sessions over many sf_dirs don't pin
# unbounded object-store memory.
_MEMO: dict = {}
_MEMO_MAX = 12


def _memo(key, build):
    hit = _MEMO.get(key)
    if hit is None:
        if len(_MEMO) >= _MEMO_MAX:
            _MEMO.clear()
        hit = _MEMO[key] = build()
    return hit


def _tokens_ds(sf_dir: str, with_positions: bool = False,
               carry_cols: tuple[str, ...] = ()):
    def build():
        ds = _docs_ds(sf_dir, ["doc_id", "text", *carry_cols])
        return ds.map_batches(
            TokenizeStage(engine="whitespace", text_col="text", pre_normalized=False,
                          with_positions=with_positions, carry_cols=carry_cols),
            batch_format="pyarrow",
        ).materialize()

    return _memo(("tokens", sf_dir, with_positions, carry_cols), build)


def _exploded_ds(sf_dir: str, carry_cols: tuple[str, ...] = ()):
    def build():
        return _tokens_ds(sf_dir, carry_cols=carry_cols).map_batches(
            ExplodeTokens(chunk_bits=40, carry_cols=carry_cols),
            batch_format="pyarrow").materialize()

    return _memo(("exploded", sf_dir, carry_cols), build)


# Auto-bucketing threshold for _sum_by: partial-row counts at or below
# this merge in one task (the common vocab-sized case); above it the
# finish hash-buckets so no single task holds the whole key domain.
# ~2M partial rows is a few hundred MB of pandas frame — far inside one
# worker's heap, far outside anything the sandbox produces.
_SUM_BY_AUTO_ROWS = 2_000_000
# Diagnostics/test hook: bucket count chosen by the most recent auto
# (num_buckets<=0) _sum_by call.
_SUM_BY_LAST_BUCKETS = 0


def _sum_by(ds, keys: tuple[str, ...], vals: tuple[str, ...],
            counts: tuple[str, ...] = (), num_buckets: int = 0,
            rows_per_bucket: int | None = None):
    """Distributed sum/count-by-key WITHOUT Ray's groupby aggregate.

    Ray Data's sort-based aggregate pays ~7 us/input-row of Python
    overhead (measured: 176k rows -> 24-52 s on this host), so any
    non-tiny keyed aggregate must shrink FIRST: a per-batch pandas
    groupby (C speed) reduces each block to <= |key domain| rows.

    The finish depends on the key-domain size:
    - ``num_buckets=0`` (default, AUTO): materialize the partials (they
      are already the reduced form; the object store spills if huge),
      count their rows, and pick ``B = ceil(rows / rows_per_bucket)``
      capped at 256 — so small key domains get the cheap one-task merge
      and large ones bucket automatically.  No call site can silently
      keep the whole key domain in one task at scale.  The materialize
      is a driver barrier, but a necessary one: counting a lazy dataset
      would execute the partial map twice, and the finish consumes the
      same materialized blocks, so the barrier costs only the count
      (measured ~0 at bench scale; term_stats unchanged).
    - ``num_buckets=1``: force the single-partition pandas merge.
    - ``num_buckets>1``: force the web-scale path — partials get a
      ``hash(key) %% B`` bucket column and merge inside a
      groupby(bucket) (B bounded groups, C-speed merge per bucket).

    ``counts`` columns come out as row-counts of the group (named as
    given); ``vals`` columns are summed under their own names.
    """
    cols = list(vals) + list(counts)

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        for c in counts:
            df[c] = 1
        g = df.groupby(list(keys), as_index=False)[cols].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    parts = ds.map_batches(partial, batch_size=None, batch_format="pyarrow")
    if num_buckets <= 0:  # auto: size the finish to the partials
        global _SUM_BY_LAST_BUCKETS
        target = rows_per_bucket if rows_per_bucket else _SUM_BY_AUTO_ROWS
        parts = parts.materialize()
        n = parts.count()
        num_buckets = 1 if n <= target else min(256, -(-n // target))
        _SUM_BY_LAST_BUCKETS = num_buckets
    if num_buckets > 1:
        nb = num_buckets

        def bucket(t: pa.Table) -> pa.Table:
            g = t.to_pandas()
            if len(g):
                # categorize=False: the default factorize path hashes object
                # values as C strings (truncates at NUL, frame-dependent), so
                # equal keys could land in different buckets across batches.
                h = pd.util.hash_pandas_object(
                    g[list(keys)], index=False, categorize=False)
                g["__bucket"] = (h % nb).astype(np.int64)
            else:
                g["__bucket"] = pd.Series([], dtype=np.int64)
            return pa.Table.from_pandas(g, preserve_index=False)

        def merge(df: pd.DataFrame) -> pd.DataFrame:
            return df.groupby(list(keys), as_index=False)[cols].sum()

        return (parts.map_batches(bucket, batch_format="pyarrow")
                     .groupby("__bucket").map_groups(merge, batch_format="pandas"))

    def finish(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        g = df.groupby(list(keys), as_index=False)[cols].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    return (parts.repartition(1)
                 .map_batches(finish, batch_size=None, batch_format="pyarrow"))


def _stable_key(s: str) -> str:
    """Process-stable 8-hex key for /tmp layout caches (Python's str
    hash is salted per process, so abs(hash(...)) never matched across
    runs — every fresh process silently rebuilt the layout and leaked a
    new /tmp dir)."""
    import hashlib

    return hashlib.md5(s.encode("utf-8")).hexdigest()[:8]


def _layout_key(sf_dir: str, src: str = "embeddings.parquet") -> str:
    """Cache key for derived /tmp layouts: path + the source parquet's
    (mtime, size) identity, so a REGENERATED dataset under the same
    path invalidates the cache instead of silently serving stale
    partitions."""
    try:
        st = os.stat(os.path.join(sf_dir, src))
        ident = f"{sf_dir}:{st.st_mtime_ns}:{st.st_size}"
    except OSError:
        ident = sf_dir
    return _stable_key(ident)


def _df_ds(sf_dir: str):
    """(term, df) document-frequency table as a materialized DATASET —
    the vocab never collects on the driver.  Full-vocab consumers
    (``_tfidf_scores_for``, ``_tfidf_weights_ds``) hash-join against
    it; bounded consumers resolve just their terms via
    ``_df_for_terms``."""

    def build():
        ex = _exploded_ds(sf_dir)
        return _sum_by(ex, ("term",), (), counts=("df",)).materialize()

    return _memo(("df_ds", sf_dir), build)


def _ex_df_ds(sf_dir: str):
    """Exploded postings hash-joined with the df table, materialized
    once per sf_dir — several battery entries (tfidf/vsm/rocchio, the
    content recommenders, the weights stream) score per-(doc,term) with
    idf, and each would otherwise re-run the same join."""

    def build():
        return _exploded_ds(sf_dir).join(
            _df_ds(sf_dir), "inner", num_partitions=8,
            on=("term",)).materialize()

    return _memo(("ex_df", sf_dir), build)


def _df_for_terms(sf_dir: str, terms) -> dict[str, int]:
    """df for a BOUNDED term collection (query terms, a few docs'
    vocabulary): an is_in-pruned scan of the distributed df table.
    Absent terms are simply missing (callers treat missing as df=0).
    Memoized per term-set — the battery re-resolves the same fixed
    query terms many times."""
    tl = tuple(sorted(set(terms)))
    if not tl:
        return {}

    def build():
        tset = pa.array(list(tl))
        t = _df_ds(sf_dir).map_batches(
            lambda b: b.filter(pa.compute.is_in(b.column("term"),
                                                value_set=tset)),
            batch_format="pyarrow").to_pandas()
        if "term" not in t.columns:  # Ray drops the schema on empty frames
            return {}
        return dict(zip(t["term"], t["df"].astype(int)))

    return _memo(("df_for_terms", sf_dir, tl), build)


def _corpus_stats(sf_dir: str) -> tuple[int, float]:
    def build():
        # per-batch partials + driver reduce: one streaming map job
        # instead of the Aggregate all-to-all (which costs ~1 s of fixed
        # exchange latency even on a 500-row table)
        parts = _tokens_ds(sf_dir).map_batches(
            lambda t: pa.table({
                "total": pa.array([int(pa.compute.sum(t.column("doc_len")).as_py() or 0)], pa.int64()),
                "n": pa.array([t.num_rows], pa.int64()),
            }),
            batch_format="pyarrow",
        ).to_pandas()
        n = int(parts["n"].sum())
        return n, float(parts["total"].sum()) / max(1, n)

    return _memo(("corpus_stats", sf_dir), build)


# ------------------------------------------------------------------ basics

def doc_stats(sf_dir: str):
    """(doc_id, doc_len) — clamped token counts."""
    ds = _tokens_ds(sf_dir)
    return ds.map_batches(
        lambda t: pa.table({
            "doc_id": t.column("doc_id"),
            "doc_len": t.column("doc_len").cast(pa.int64()),
        }),
        batch_format="pyarrow",
    )


def term_stats(sf_dir: str):
    """(term, df, cf) — the index df/cf aggregate (partial-sum pattern,
    see _sum_by: per-batch pandas shrink, tiny merge)."""
    ex = _exploded_ds(sf_dir)
    out = _sum_by(ex, ("term",), ("tf",), counts=("df",))
    return out.map_batches(
        lambda t: pa.table({"term": t.column("term"),
                            "df": t.column("df").cast(pa.int64()),
                            "cf": t.column("tf").cast(pa.int64())}),
        batch_format="pyarrow")


def postings_flat(sf_dir: str):
    """(term, doc_id, tf) — the exploded postings table."""
    ex = _exploded_ds(sf_dir)
    return ex.map_batches(
        lambda t: t.select(["term", "doc_id", "tf"]).set_column(
            2, "tf", t.column("tf").cast(pa.int64())),
        batch_format="pyarrow",
    )


def corpus_stats(sf_dir: str) -> pd.DataFrame:
    """Single row: n_docs, total_tokens (clamped), vocab_size, avg_doc_len."""
    from ray.data.aggregate import Count, Sum

    agg = _tokens_ds(sf_dir).aggregate(Sum("doc_len", alias_name="total"), Count(alias_name="n"))
    vocab = term_stats(sf_dir).count()
    n, total = int(agg["n"]), int(agg["total"])
    return pd.DataFrame([{
        "n_docs": n,
        "total_tokens": total,
        "vocab_size": int(vocab),
        "avg_doc_len": round4(total / max(1, n)),
    }])


# ------------------------------------------------------------------ ranking

def _topk_group(k: int):
    """pandas map_groups body: rank top-k by (-score, doc_id) (SURVEY §7.6.2)."""

    def topk(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["score", "doc_id"], ascending=[False, True]).head(k).copy()
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return topk


def _topk_by_qid(scores, k: int) -> pd.DataFrame:
    """Distributed per-qid top-k WITHOUT a sort shuffle: a per-batch
    partial top-k (a row outside its batch's per-qid top-k can never be
    in the global top-k) then a tiny driver merge — both with the
    canonical (-score, doc_id) tie-break.  Replaces
    groupby("qid").map_groups(_topk_group) at ~1 s less per query on
    this host (the groupby is a full sort exchange of all scored rows;
    the partial ships <= k x n_qids rows per batch)."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["score", "doc_id"], ascending=[False, True]) \
                 .groupby("qid", sort=False).head(k)

    parts = scores.map_batches(partial, batch_format="pandas").to_pandas()
    parts = parts.sort_values(["score", "doc_id"], ascending=[False, True])
    out = parts.groupby("qid", sort=False).head(k).copy()
    out["rank"] = (out.groupby("qid").cumcount() + 1).astype(np.int64)
    return out


def _bm25_scores(sf_dir: str, n_docs: int, avgdl: float,
                 term_to_qids: dict[str, list[str]] | None = None):
    """Dataset (qid, doc_id, score) of BM25 scores for the fixed queries
    (or for an explicit term->qids map, e.g. after query expansion).

    postings for the (broadcast) query terms are scored inside
    map_batches; per-doc sums are a groupby stage.  df/N/avgdl are tiny
    aggregates collected to the driver (vocab-sized).
    """
    if term_to_qids is None:
        qterms = sorted({t for ts in FIXED_QUERIES.values() for t in ts})
        term_to_qids = {
            t: [qid for qid, ts in FIXED_QUERIES.items() if t in ts] for t in qterms
        }
    else:
        qterms = sorted(term_to_qids)
    return _bm25_scores_over(_exploded_ds(sf_dir), n_docs, avgdl, term_to_qids)


def _bm25_scores_over(ex_full, n_docs: int, avgdl: float,
                      term_to_qids: dict[str, list[str]]):
    """Same scoring over an arbitrary (doc_id, term, tf, dl) exploded
    stream (e.g. the field-weighted one)."""
    qterms = sorted(term_to_qids)
    ex = ex_full.map_batches(
        lambda t: t.filter(pa.compute.is_in(t.column("term"), value_set=pa.array(qterms))),
        batch_format="pyarrow",
    ).materialize()  # small: query-term postings only
    # per-batch partial counts + tiny merge (_sum_by) instead of Ray's
    # sort-based aggregate — same ~7 us/row overhead reason as _sum_by's
    # docstring; query-term postings are 1e5+ rows at bench scale
    dft = _sum_by(ex.select_columns(["term"]), ("term",), (),
                  counts=("df",)).to_pandas()
    if dft.empty:
        # no query term occurs in the corpus -> no candidates (the
        # reference returns an empty ranking); empty frames lose their
        # schema through Ray, so build the typed empty result directly
        import ray.data as rd

        return rd.from_arrow(pa.table({"qid": pa.array([], pa.string()),
                                       "doc_id": pa.array([], pa.int64()),
                                       "score": pa.array([], pa.float64())}))
    dfs = dict(zip(dft["term"], dft["df"].astype(int)))

    # per-term expansion tables (tiny: |query vocab|): idf, the flat
    # qid-code list and its offsets — score_batch then runs fully
    # vectorized (dictionary-encode rows, repeat by each term's qid
    # count, gather qids from the flat list)
    qid_strings = sorted({q for qs in term_to_qids.values() for q in qs})
    qid_code = {q: i for i, q in enumerate(qid_strings)}

    def score_batch(t: pa.Table) -> pa.Table:
        tf = t.column("tf").to_numpy(zero_copy_only=False).astype(np.float64)
        dl = t.column("dl").to_numpy(zero_copy_only=False).astype(np.float64)
        doc = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        col = t.column("term")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        denc = pa.compute.dictionary_encode(col)
        idx = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        uniq = denc.dictionary.to_pylist()
        idf_u = np.zeros(len(uniq))
        nq_u = np.zeros(len(uniq), dtype=np.int64)
        flat_q: list[int] = []
        offs_u = np.zeros(len(uniq), dtype=np.int64)
        for j, term in enumerate(uniq):
            df = dfs.get(term, 0)
            offs_u[j] = len(flat_q)
            if df == 0:
                continue
            idf_u[j] = math.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)
            ql = term_to_qids[term]
            nq_u[j] = len(ql)
            flat_q.extend(qid_code[q] for q in ql)
        w = tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * dl / avgdl))
        reps = nq_u[idx]
        total = int(reps.sum())
        within = np.arange(total) - np.repeat(
            np.concatenate(([0], np.cumsum(reps)))[:-1], reps)
        qcodes = np.asarray(flat_q, dtype=np.int64)[
            np.repeat(offs_u[idx], reps) + within] if total else \
            np.empty(0, dtype=np.int64)
        return pa.table({
            "qid": pa.compute.take(pa.array(qid_strings, pa.string()),
                                   pa.array(qcodes)),
            "doc_id": pa.array(np.repeat(doc, reps)),
            "c": pa.array(np.repeat(idf_u[idx] * w, reps)),
        })

    scored = ex.map_batches(score_batch, batch_format="pyarrow")
    summed = _sum_by(scored, ("qid", "doc_id"), ("c",))
    return summed.map_batches(
        lambda t: t.rename_columns(
            ["score" if c == "c" else c for c in t.column_names]),
        batch_format="pyarrow")


def bm25_topk(sf_dir: str, k: int = 10) -> pd.DataFrame:
    """Fixed-query BM25 top-k, distributed scoring."""
    n_docs, avgdl = _corpus_stats(sf_dir)
    scores = _bm25_scores(sf_dir, n_docs, avgdl)
    out = _topk_by_qid(scores, k)
    out["score"] = out["score"].map(round4)
    return out.sort_values(["qid", "rank"]).reset_index(drop=True)[["qid", "rank", "doc_id", "score"]]


def bm25_wand_topk(sf_dir: str, k: int = 10) -> pd.DataFrame:
    """Fixed-query BM25 top-k served by the REAL index engine: distributed
    segment build (groupby(term) shuffle -> VByte/block-max postings) then
    block-max WAND with a bounded min-heap (pipelines/query.py).  Shares
    the bm25_topk oracle SQL — proving WAND pruning == exhaustive scoring
    == SQL, rank-identically (north-rule invariant)."""
    import tempfile

    from .index_build import build_index
    from .query import IndexSearcher

    idx = tempfile.mkdtemp(prefix="nirs_wand_idx_")
    build_index(f"{sf_dir}/documents.parquet", idx, text_source="text",
                id_col="doc_id", engine="whitespace", n_shards=4, resume=False)
    s = IndexSearcher(idx)
    rows = []
    for qid, terms in FIXED_QUERIES.items():
        for rank, (doc_id, score) in enumerate(s.search(" ".join(terms), k=k, method="wand"), 1):
            rows.append((qid, rank, doc_id, round4(score)))
    return pd.DataFrame(rows, columns=["qid", "rank", "doc_id", "score"])


def index_audit(sf_dir: str) -> pd.DataFrame:
    """End-to-end index-format audit, ORACLE-CHECKED: build an index
    over the documents table, run the distributed integrity auditor
    (index_build.verify_index — every posting row decoded and
    cross-checked against its own metadata), and return the decoded
    posting total — which must equal SQL's count of distinct
    (doc, term) pairs, proving the packed VByte/block-max format holds
    exactly the token stream and nothing else."""
    from .index_build import build_index, verify_index
    from ..state.manifest import read_json

    def build():
        # stable, content-keyed /tmp path (the _layout_key pattern): the
        # built index reuses across processes and invalidates when the
        # dataset regenerates; a completed manifest marks it reusable
        idx = f"/tmp/nirs_audit_idx_{_layout_key(sf_dir, 'documents.parquet')}"
        m = read_json(os.path.join(idx, "manifest.json"))
        if m is None or m.get("stats") is None \
                or not m.get("segments_done"):
            build_index(f"{sf_dir}/documents.parquet", idx,
                        text_source="text", id_col="doc_id",
                        engine="whitespace", n_shards=4, resume=False)
        return idx

    idx = _memo(("audit_idx", sf_dir), build)
    r = verify_index(idx)
    return pd.DataFrame({
        "ok": np.array([1 if r["ok"] else 0], dtype=np.int64),
        "n_docs": np.array([r["n_docs"]], dtype=np.int64),
        "postings": np.array([r["postings"]], dtype=np.int64),
    })


def _sharded_searcher(sf_dir: str):
    """Memoized doc-sharded searcher over the sf documents (one index
    build + actor pool per sf_dir per session, shared by every sharded
    serving query).  Small chunks (32-doc) so the fixed 500-doc sf
    tables actually split across shards; web scale uses the build's
    auto chunk_bits."""

    def build():
        import tempfile

        from .index_build import build_index
        from .serve import ShardedSearcher

        idx = tempfile.mkdtemp(prefix="nirs_shard_idx_")
        build_index(f"{sf_dir}/documents.parquet", idx, text_source="text",
                    id_col="doc_id", engine="whitespace", n_shards=4,
                    chunk_bits=5, resume=False)
        return ShardedSearcher(idx, n_shards=4)

    return _memo(("sharded_searcher", sf_dir), build)


def bm25_sharded_topk(sf_dir: str, k: int = 10) -> pd.DataFrame:
    """Fixed-query BM25 top-k served by DOC-SHARDED distributed actors
    (pipelines/serve.py): each shard owns a disjoint chunk set, runs
    block-max WAND over only its chunks with a theta seeded from the
    heaviest shard, and the driver k-way-merges the partial top-k's.
    Shares the bm25_topk oracle SQL — proving sharded serving ==
    single-searcher == exhaustive == SQL, rank- and score-identically
    (reference WAND contract: query_optimization.py:191-346)."""
    s = _sharded_searcher(sf_dir)
    rows = []
    for qid, terms in FIXED_QUERIES.items():
        for rank, (doc_id, score) in enumerate(
                s.search(" ".join(terms), k=k, method="wand"), 1):
            rows.append((qid, rank, doc_id, round4(score)))
    return pd.DataFrame(rows, columns=["qid", "rank", "doc_id", "score"])


def bm25_sharded_bulk(sf_dir: str, k: int = 10) -> pd.DataFrame:
    """The same fixed queries through ``ShardedSearcher.search_many`` —
    the pipelined bulk-serving path (one df round for the whole stream,
    bounded in-flight fan-outs, no per-query barrier).  Shares the
    bm25_topk oracle SQL: bulk serving == per-query sharded == single
    searcher == SQL, rank- and score-identically."""
    s = _sharded_searcher(sf_dir)
    qids = list(FIXED_QUERIES)
    bulk = s.search_many([" ".join(FIXED_QUERIES[q]) for q in qids], k=k)
    rows = []
    for qid, res in zip(qids, bulk):
        for rank, (doc_id, score) in enumerate(res, 1):
            rows.append((qid, rank, doc_id, round4(score)))
    return pd.DataFrame(rows, columns=["qid", "rank", "doc_id", "score"])


def _deleted_searcher(sf_dir: str):
    """Searcher over an index with doc_id %% 7 == 3 tombstoned (the
    deterministic oracle delete set)."""

    def build():
        import tempfile

        from .index_build import build_index, delete_docs
        from .query import IndexSearcher

        idx = tempfile.mkdtemp(prefix="nirs_del_idx_")
        build_index(f"{sf_dir}/documents.parquet", idx, text_source="text",
                    id_col="doc_id", engine="whitespace", n_shards=4,
                    chunk_bits=5, resume=False)
        n = int(IndexSearcher(idx).n_docs)
        delete_docs(idx, [d for d in range(n) if d % 7 == 3])
        return IndexSearcher(idx)

    return _memo(("deleted_searcher", sf_dir), build)


def bm25_deleted_topk(sf_dir: str, k: int = 10) -> pd.DataFrame:
    """Fixed-query BM25 top-k AFTER tombstone deletion of every
    doc_id %% 7 == 3 (index_build.delete_docs — beyond-reference:
    Lucene-style liveness, the reference has no delete path).  Oracle:
    the bm25 SQL with scores filtered to live docs while n/avgdl/df
    keep FULL-corpus values — exactly the documented frozen-stats
    semantics, so surviving docs score identically to the undeleted
    index."""
    s = _deleted_searcher(sf_dir)
    rows = []
    for qid, terms in FIXED_QUERIES.items():
        for rank, (doc_id, score) in enumerate(
                s.search(" ".join(terms), k=k, method="wand"), 1):
            rows.append((qid, rank, doc_id, round4(score)))
    return pd.DataFrame(rows, columns=["qid", "rank", "doc_id", "score"])


def bm25_compacted_topk(sf_dir: str, k: int = 10) -> pd.DataFrame:
    """Fixed-query BM25 top-k after delete + COMPACT (doc_id %% 7 == 3
    removed, segments rewritten, stats recomputed): equivalent to an
    index built directly on the live docs with the same ids.  Oracle:
    the bm25 SQL computed entirely over the live subset (live n, avgdl,
    df — the opposite stats contract of bm25_deleted_topk's frozen
    phase)."""

    def build():
        import tempfile

        from .index_build import build_index, compact_index, delete_docs
        from .query import IndexSearcher

        idx = tempfile.mkdtemp(prefix="nirs_compact_idx_")
        build_index(f"{sf_dir}/documents.parquet", idx, text_source="text",
                    id_col="doc_id", engine="whitespace", n_shards=4,
                    chunk_bits=5, resume=False)
        n = int(IndexSearcher(idx).n_docs)
        delete_docs(idx, [d for d in range(n) if d % 7 == 3])
        compact_index(idx)
        return IndexSearcher(idx)

    s = _memo(("compacted_searcher", sf_dir), build)
    rows = []
    for qid, terms in FIXED_QUERIES.items():
        for rank, (doc_id, score) in enumerate(
                s.search(" ".join(terms), k=k, method="wand"), 1):
            rows.append((qid, rank, doc_id, round4(score)))
    return pd.DataFrame(rows, columns=["qid", "rank", "doc_id", "score"])


def boolean_sharded(sf_dir: str) -> pd.DataFrame:
    """(A AND B) NOT C served by the doc-sharded actors: each shard
    resolves its own chunks' sorted-merge boolean (disjoint doc
    spaces), the driver concatenates.  Shares the boolean_and_not
    oracle SQL — sharded boolean == single-searcher == SQL."""
    s = _sharded_searcher(sf_dir)
    ids = s.boolean_not(list(BOOL_NOT[0]), list(BOOL_NOT[1]))
    return pd.DataFrame({"doc_id": pd.Series(ids, dtype=np.int64)})


def _app_idf_vec(n_docs: int):
    """Vectorized app TF-IDF idf (index_service.py:297-306) over a df
    array; df=0 rows come out 0."""

    def f(df: np.ndarray) -> np.ndarray:
        df = df.astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            out = np.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
        out[df == 0] = 0.0
        return out

    return f


def _tfidf_scores_for(sf_dir: str, qvecs: dict[str, dict[str, float]],
                      idf_vec=None):
    """(qid, doc_id, score>0) Dataset: cosine of the given NORMALIZED
    query vectors against (1+log10 tf)·idf, L2-normalized-per-doc
    vectors.  ``idf_vec`` is a VECTORIZED ``df-array -> idf-array``
    function, defaulting to the app TF-IDF variant
    (index_service.py:297-306); pass e.g. the SMART 't' idf for VSM.

    Per-(doc,term) df comes from a Dataset hash join against the
    distributed df table — no driver vocab dict, nothing vocab-sized
    in any shipped closure.  Per-doc norms need the full doc vector,
    so scoring stays a per-doc group stage."""
    n_docs, _ = _corpus_stats(sf_dir)
    if idf_vec is None:
        idf_vec = _app_idf_vec(n_docs)
    ex = _ex_df_ds(sf_dir)

    def doc_scores(group: pd.DataFrame) -> pd.DataFrame:
        tfs = group["tf"].to_numpy(dtype=np.float64)
        terms = group["term"].tolist()
        ws = (1.0 + np.log10(tfs)) * idf_vec(group["df"].to_numpy())
        nrm = float(np.sqrt((ws * ws).sum()))
        if nrm == 0.0:
            return pd.DataFrame({"qid": [], "doc_id": [], "score": []})
        doc_id = int(group["doc_id"].iloc[0])
        tw = dict(zip(terms, ws / nrm))
        rows = []
        for qid, qv in qvecs.items():
            s = sum(tw.get(t, 0.0) * qw for t, qw in qv.items())
            if s > 0:
                rows.append((qid, doc_id, s))
        return pd.DataFrame(rows, columns=["qid", "doc_id", "score"])

    return ex.groupby("doc_id").map_groups(doc_scores, batch_format="pandas")


def tfidf_topk(sf_dir: str, k: int = 10) -> pd.DataFrame:
    """SMART-style TF-IDF cosine top-k (app math: (1+log10 tf)·idf,
    L2-normalized doc & query vectors — index_service.py:297-306).

    Per-doc norms need the FULL doc vector, so the per-doc group stage
    computes the norm and emits only query-term dot contributions.  The
    doc side resolves df through the distributed hash join inside
    ``_tfidf_scores_for``; the driver resolves df only for the QUERY
    terms (bounded ``_df_for_terms``).
    """
    n_docs, _ = _corpus_stats(sf_dir)
    df_map = _df_for_terms(
        sf_dir, (t for ts in FIXED_QUERIES.values() for t in ts))

    def idf(term: str) -> float:
        df = df_map.get(term, 0)
        if df == 0:
            return 0.0
        return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))

    # query vectors (normalized), driver-side: queries are tiny
    qvecs: dict[str, dict[str, float]] = {}
    for qid, terms in FIXED_QUERIES.items():
        w = {t: (1.0 + math.log10(1)) * idf(t) for t in terms if df_map.get(t)}
        nrm = math.sqrt(sum(v * v for v in w.values()))
        qvecs[qid] = {t: v / nrm for t, v in w.items()} if nrm else {}

    scored = _tfidf_scores_for(sf_dir, qvecs)

    def topk(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["score", "doc_id"], ascending=[False, True]).head(k).copy()
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    out = scored.groupby("qid").map_groups(topk, batch_format="pandas").to_pandas()
    out["score"] = out["score"].map(round4)
    return out.sort_values(["qid", "rank"]).reset_index(drop=True)[["qid", "rank", "doc_id", "score"]]


def distinct_terms_hll(sf_dir: str) -> pd.DataFrame:
    """HyperLogLog distinct-term estimate over the exploded corpus
    (stages/sketches.py: p=8, md5-keyed, deterministic — the SQL twin
    computes bit-identical registers)."""
    from ..stages.sketches import hll_distinct_terms

    return hll_distinct_terms(_exploded_ds(sf_dir))


def term_counts_cms(sf_dir: str) -> pd.DataFrame:
    """Count-Min collection-frequency estimates for the fixed query
    terms (stages/sketches.py: 4x1024, md5-keyed — integer outputs,
    never under the true count)."""
    from ..stages.sketches import cms_term_counts

    terms = sorted({t for ts in FIXED_QUERIES.values() for t in ts})
    return cms_term_counts(_exploded_ds(sf_dir), terms)


def vsm_topk(sf_dir: str, k: int = 10) -> pd.DataFrame:
    """SMART lnc.ltc Vector-Space-Model top-k (vsm.py:86-300): document
    vectors ltc = (1+log10 tf)·log10(N/df), cosine-normalized
    (term_weighting.py:138-185); query vector lnc = (1+log10 qtf), NO
    idf, cosine-normalized (the use_idf_for_query=False default,
    vsm.py:242); score = dot of the two normalized vectors over shared
    terms, candidates = docs with >= 1 query term, score > 0 only.
    Canonical tie order (-score, doc_id) — the reference's
    heapq.nlargest leaves equal-score order unspecified (spec-tightening
    as SURVEY §7.6.2).  Same distributed shape as tfidf_topk: per-doc
    group stage for the norms, tiny driver top-k."""
    n_docs, _ = _corpus_stats(sf_dir)

    def idf_t_vec(df: np.ndarray) -> np.ndarray:
        df = df.astype(np.float64)
        with np.errstate(divide="ignore"):
            out = np.log10(n_docs / np.maximum(df, 1.0))
        out[df == 0] = 0.0
        return out

    qvecs: dict[str, dict[str, float]] = {}
    for qid, terms in FIXED_QUERIES.items():
        w = {t: 1.0 for t in dict.fromkeys(terms)}  # (1+log10(1)), idf 'n'
        nrm = math.sqrt(sum(v * v for v in w.values()))
        qvecs[qid] = {t: v / nrm for t, v in w.items()} if nrm else {}

    scored = _tfidf_scores_for(sf_dir, qvecs, idf_vec=idf_t_vec)
    out = _topk_by_qid(scored, k)
    out["score"] = out["score"].map(round4)
    return out.sort_values(["qid", "rank"]).reset_index(drop=True)[
        ["qid", "rank", "doc_id", "score"]]


LAMBDA_JM = 0.7           # Jelinek-Mercer interpolation (language_model_retrieval.py:90)


def lm_jm_topk(sf_dir: str, k: int = 10, lam: float = LAMBDA_JM) -> pd.DataFrame:
    """Jelinek-Mercer-smoothed query-likelihood top-k
    (language_model_retrieval.py:233-248, λ=0.7 default :90).

    score(q,d) = sum_t log(λ*tf/dl + (1-λ)*P(t|C)).  Distributed form
    mirrors ``lm_dirichlet_topk``: present-(qid,term,doc) rows emit
    ``a = log(λ*tf/dl + (1-λ)*Pc) - log((1-λ)*Pc)``; per-(qid,doc)
    score = ``sum(a) + C_q`` with the per-query constant
    ``C_q = sum_t log((1-λ)*Pc_t)`` — only present rows ever shuffle
    (no per-doc dl correction term, unlike Dirichlet).
    Candidates (reference semantics) are docs containing >= 1 query term.
    """
    from ray.data.aggregate import Sum

    ex = _exploded_ds(sf_dir).materialize()
    qterms = sorted({t for ts in FIXED_QUERIES.values() for t in ts})
    cf_rows = ex.map_batches(
        lambda t: t.filter(pa.compute.is_in(t.column("term"), value_set=pa.array(qterms))),
        batch_format="pyarrow",
    ).groupby("term").aggregate(Sum("tf", alias_name="cf")).take_all()
    cf = {r["term"]: int(r["cf"]) for r in cf_rows}
    total = int(ex.aggregate(Sum("tf", alias_name="t"))["t"])
    live = {qid: [t for t in ts if cf.get(t)] for qid, ts in FIXED_QUERIES.items()}
    bg = {t: (1.0 - lam) * cf[t] / total for t in cf}  # (1-λ)·P(t|C)
    cq = {qid: sum(math.log(bg[t]) for t in ts) for qid, ts in live.items()}
    term_to_qids = {t: [qid for qid, ts in live.items() if t in ts] for t in qterms}

    def present(t: pa.Table) -> pa.Table:
        t = t.filter(pa.compute.is_in(t.column("term"), value_set=pa.array(qterms)))
        terms = t.column("term").to_pylist()
        tf = t.column("tf").to_numpy(zero_copy_only=False).astype(np.float64)
        dl = t.column("dl").to_numpy(zero_copy_only=False).astype(np.float64)
        doc = t.column("doc_id").to_numpy(zero_copy_only=False)
        out_q, out_d, out_a = [], [], []
        for i, term in enumerate(terms):
            a = math.log(lam * tf[i] / dl[i] + bg[term]) - math.log(bg[term])
            for qid in term_to_qids[term]:
                out_q.append(qid)
                out_d.append(int(doc[i]))
                out_a.append(a)
        return pa.table({
            "qid": pa.array(out_q, pa.string()),
            "doc_id": pa.array(out_d, pa.int64()),
            "a": pa.array(out_a, pa.float64()),
        })

    agg = ex.map_batches(present, batch_format="pyarrow") \
            .groupby(["qid", "doc_id"]) \
            .aggregate(Sum("a", alias_name="sum_a"))

    def score_rows(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["score"] = df["sum_a"].to_numpy() + df["qid"].map(cq).to_numpy(dtype=np.float64)
        return df[["qid", "doc_id", "score"]]

    scores = agg.map_batches(score_rows, batch_format="pandas")
    out = _topk_by_qid(scores, k)
    out["score"] = out["score"].map(round4)
    return out.sort_values(["qid", "rank"]).reset_index(drop=True)[["qid", "rank", "doc_id", "score"]]


def lm_dirichlet_topk(sf_dir: str, k: int = 10, mu: float = MU) -> pd.DataFrame:
    """Dirichlet-smoothed query-likelihood top-k (language_model_retrieval.py:250-268,
    app mu=2000 index_service.py:383-388).

    score(q,d) = sum_t log((tf + mu*P(t|C)) / (dl + mu)) over the query's
    terms (absent terms contribute the smoothed background).  Distributed
    form: present-(qid,term,doc) rows emit
    ``a = log(tf + mu*Pc) - log(mu*Pc)``; per-(qid,doc) score is then
    ``sum(a) + C_q - |q|*log(dl + mu)`` with the per-query constant
    ``C_q = sum_t log(mu*Pc_t)`` — only present rows ever shuffle.
    Candidates (reference semantics) are docs containing >= 1 query term.
    """
    from ray.data.aggregate import Max, Sum

    ex = _exploded_ds(sf_dir).materialize()
    qterms = sorted({t for ts in FIXED_QUERIES.values() for t in ts})
    # collection stats for the query terms + total token count (tiny)
    cf_rows = ex.map_batches(
        lambda t: t.filter(pa.compute.is_in(t.column("term"), value_set=pa.array(qterms))),
        batch_format="pyarrow",
    ).groupby("term").aggregate(Sum("tf", alias_name="cf")).take_all()
    cf = {r["term"]: int(r["cf"]) for r in cf_rows}
    total = int(ex.aggregate(Sum("tf", alias_name="t"))["t"])
    live = {qid: [t for t in ts if cf.get(t)] for qid, ts in FIXED_QUERIES.items()}
    cq = {qid: sum(math.log(mu * cf[t] / total) for t in ts) for qid, ts in live.items()}
    nq = {qid: len(ts) for qid, ts in live.items()}
    term_to_qids = {t: [qid for qid, ts in live.items() if t in ts] for t in qterms}

    def present(t: pa.Table) -> pa.Table:
        t = t.filter(pa.compute.is_in(t.column("term"), value_set=pa.array(qterms)))
        terms = t.column("term").to_pylist()
        tf = t.column("tf").to_numpy(zero_copy_only=False).astype(np.float64)
        dl = t.column("dl").to_numpy(zero_copy_only=False).astype(np.float64)
        doc = t.column("doc_id").to_numpy(zero_copy_only=False)
        out_q, out_d, out_a, out_dl = [], [], [], []
        for i, term in enumerate(terms):
            pc = mu * cf[term] / total
            a = math.log(tf[i] + pc) - math.log(pc)
            for qid in term_to_qids[term]:
                out_q.append(qid)
                out_d.append(int(doc[i]))
                out_a.append(a)
                out_dl.append(dl[i])
        return pa.table({
            "qid": pa.array(out_q, pa.string()),
            "doc_id": pa.array(out_d, pa.int64()),
            "a": pa.array(out_a, pa.float64()),
            "dl": pa.array(out_dl, pa.float64()),
        })

    agg = ex.map_batches(present, batch_format="pyarrow") \
            .groupby(["qid", "doc_id"]) \
            .aggregate(Sum("a", alias_name="sum_a"), Max("dl", alias_name="dl"))

    def score_rows(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        qv = df["qid"].map(cq).to_numpy(dtype=np.float64)
        nv = df["qid"].map(nq).to_numpy(dtype=np.float64)
        df["score"] = df["sum_a"].to_numpy() + qv - nv * np.log(df["dl"].to_numpy() + mu)
        return df[["qid", "doc_id", "score"]]

    scores = agg.map_batches(score_rows, batch_format="pandas")
    out = _topk_by_qid(scores, k)
    out["score"] = out["score"].map(round4)
    return out.sort_values(["qid", "rank"]).reset_index(drop=True)[["qid", "rank", "doc_id", "score"]]


def bim_topk(sf_dir: str, k: int = 10) -> pd.DataFrame:
    """Binary Independence Model top-k: score = sum over matched distinct
    query terms of RSJ weight log((N-df+0.5)/(df+0.5)) (bim.py:187-207 —
    note: no +1, unlike BM25 IDF; SURVEY §7.6.3)."""
    from ray.data.aggregate import Count, Sum

    n_docs, _ = _corpus_stats(sf_dir)
    qterms = sorted({t for ts in FIXED_QUERIES.values() for t in ts})
    term_to_qids = {t: [qid for qid, ts in FIXED_QUERIES.items() if t in ts] for t in qterms}
    ex = _exploded_ds(sf_dir).map_batches(
        lambda t: t.filter(pa.compute.is_in(t.column("term"), value_set=pa.array(qterms))),
        batch_format="pyarrow",
    ).materialize()
    dfs = {r["term"]: int(r["df"]) for r in
           ex.groupby("term").aggregate(Count(alias_name="df")).take_all()}

    def weigh(t: pa.Table) -> pa.Table:
        terms = t.column("term").to_pylist()
        doc = t.column("doc_id").to_numpy(zero_copy_only=False)
        out_q, out_d, out_w = [], [], []
        for i, term in enumerate(terms):
            df = dfs.get(term, 0)
            if df == 0:
                continue
            w = math.log((n_docs - df + 0.5) / (df + 0.5))
            for qid in term_to_qids[term]:
                out_q.append(qid)
                out_d.append(int(doc[i]))
                out_w.append(w)
        return pa.table({
            "qid": pa.array(out_q, pa.string()),
            "doc_id": pa.array(out_d, pa.int64()),
            "w": pa.array(out_w, pa.float64()),
        })

    scores = ex.map_batches(weigh, batch_format="pyarrow") \
               .groupby(["qid", "doc_id"]).aggregate(Sum("w", alias_name="score"))
    out = _topk_by_qid(scores, k)
    out["score"] = out["score"].map(round4)
    return out.sort_values(["qid", "rank"]).reset_index(drop=True)[["qid", "rank", "doc_id", "score"]]


def hybrid_rrf(sf_dir: str, k: int = 10) -> pd.DataFrame:
    """Hybrid reciprocal-rank fusion of BM25 + TF-IDF
    (search_service.py:268-295): per-ranker depth max(50, k*5), fused
    score = 0.65/(60+rank_bm25) + 0.35/(60+rank_tfidf), top-k by
    (-fused, doc_id).  The per-ranker top lists are tiny — fusion is a
    driver-side join (SURVEY §2.6)."""
    bm = bm25_topk(sf_dir, k=RRF_DEPTH)[["qid", "doc_id", "rank"]]
    tf = tfidf_topk(sf_dir, k=RRF_DEPTH)[["qid", "doc_id", "rank"]]
    bm["c_bm"] = RRF_W_BM25 / (RRF_K0 + bm.pop("rank"))
    tf["c_tf"] = RRF_W_TFIDF / (RRF_K0 + tf.pop("rank"))
    fused = bm.merge(tf, on=["qid", "doc_id"], how="outer").fillna(0.0)
    fused["score"] = fused["c_bm"] + fused["c_tf"]
    rows = []
    for qid, g in fused.groupby("qid"):
        g = g.sort_values(["score", "doc_id"], ascending=[False, True]).head(k)
        for rank, (_, r) in enumerate(g.iterrows(), 1):
            rows.append((qid, rank, int(r["doc_id"]), round4(float(r["score"]))))
    return pd.DataFrame(rows, columns=["qid", "rank", "doc_id", "score"])


def _edit_distance_le1(a: str, b: str) -> bool:
    """Levenshtein <= 1 without the full DP table (fuzzy.py:63-213)."""
    la, lb = len(a), len(b)
    if abs(la - lb) > 1:
        return False
    if la == lb:
        return sum(x != y for x, y in zip(a, b)) <= 1
    if la > lb:
        a, b, la, lb = b, a, lb, la
    i = j = diff = 0
    while i < la and j < lb:
        if a[i] == b[j]:
            i += 1
        else:
            diff += 1
            if diff > 1:
                return False
        j += 1
    return True


def fuzzy_match(sf_dir: str, term: str | None = None) -> pd.DataFrame:
    """Docs containing any vocabulary term within edit distance 1 of the
    query term (fuzzy.py:63-213 expansion -> OR).  The vocab scan is a
    distributed filter over term_stats; the matched set (tiny) broadcasts
    into a semi-join on the exploded table."""
    term = term or FUZZY_TERM
    ts = term_stats(sf_dir)
    matched = ts.map_batches(
        lambda t: t.filter(pa.array([_edit_distance_le1(x, term) for x in t.column("term").to_pylist()])),
        batch_format="pyarrow",
    ).select_columns(["term"]).take_all()
    mset = pa.array(sorted({r["term"] for r in matched}))
    if len(mset) == 0:
        return pd.DataFrame({"doc_id": pd.Series(dtype=np.int64)})
    hits = _exploded_ds(sf_dir).map_batches(
        lambda t: t.filter(pa.compute.is_in(t.column("term"), value_set=mset)).select(["doc_id"]),
        batch_format="pyarrow",
    ).to_pandas()
    return hits.drop_duplicates().sort_values("doc_id").reset_index(drop=True)


FUZZY_MAX_DIST = 2        # FuzzyMatcher default max_distance (fuzzy.py:43-61)
FUZZY_MAX_EXPANSIONS = 50  # expansion cap (fuzzy.py:43-61,170-178)


def _levenshtein_banded(a: str, b: str, maxd: int) -> int:
    """Levenshtein distance, banded: returns the exact distance when it
    is <= maxd, else any value > maxd (reference DP: fuzzy.py:63-128;
    the band makes the scan O(len * maxd) instead of O(len^2))."""
    la, lb = len(a), len(b)
    if abs(la - lb) > maxd:
        return maxd + 1
    if la > lb:
        a, b, la, lb = b, a, lb, la
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        lo = max(1, i - maxd)
        hi = min(lb, i + maxd)
        cur = [maxd + 1] * (lb + 1)
        cur[0] = i if i <= maxd else maxd + 1
        ca = a[i - 1]
        for j in range(lo, hi + 1):
            cost = 0 if ca == b[j - 1] else 1
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
        if min(cur[max(0, lo - 1):hi + 1]) > maxd:
            return maxd + 1
        prev = cur
    return prev[lb]


def _fuzzy_dist_ds(sf_dir: str, term: str, max_distance: int):
    """Dataset of (term, dist) vocabulary matches within ``max_distance``
    of ``term`` — the FuzzyMatcher vocabulary scan (fuzzy.py:129-188)
    distributed over the term_stats vocab.  A vectorized utf8-length
    band prefilter drops most of the vocab before the per-term DP."""
    ts = term_stats(sf_dir)
    q = term.lower()
    lq = len(q)

    def _batch(t):
        lens = pa.compute.utf8_length(t.column("term"))
        band = pa.compute.and_(
            pa.compute.greater_equal(lens, lq - max_distance),
            pa.compute.less_equal(lens, lq + max_distance))
        cand = t.filter(band).column("term").to_pylist()
        out_t, out_d = [], []
        for x in cand:
            d = _levenshtein_banded(x, q, max_distance)
            if d <= max_distance:
                out_t.append(x)
                out_d.append(d)
        return pa.table({"term": pa.array(out_t, pa.string()),
                         "dist": pa.array(out_d, pa.int64())})

    return ts.map_batches(_batch, batch_format="pyarrow")


def fuzzy_expand(sf_dir: str, term: str | None = None,
                 max_distance: int = FUZZY_MAX_DIST,
                 max_expansions: int = FUZZY_MAX_EXPANSIONS) -> pd.DataFrame:
    """(term, dist) expansion of the query term over the index vocabulary,
    sorted by (distance, term) and capped at ``max_expansions`` — the
    FuzzyMatcher.expand surface (fuzzy.py:129-213).  Spec-tightening as
    elsewhere: the reference applies the cap in set-iteration order
    BEFORE sorting (nondeterministic in the reference itself); we sort
    the full match set first so the cap is deterministic.  The matched
    set is tiny (<= a few hundred terms), so the sort+cap runs driver-side."""
    term = term or FUZZY_EXPAND_TERM
    m = _fuzzy_dist_ds(sf_dir, term, max_distance).to_pandas()
    return (m.sort_values(["dist", "term"]).head(max_expansions)
             .reset_index(drop=True))


def fuzzy_distance_groups(sf_dir: str, term: str | None = None,
                          max_distance: int = FUZZY_MAX_DIST) -> pd.DataFrame:
    """(dist, n_terms) — FuzzyMatcher.get_stats ``distance_distribution``
    over the full (uncapped) match set (fuzzy.py:214-278).  Per-batch
    partial counts; only the <= max_distance+1 distinct distances reach
    the driver."""
    term = term or FUZZY_EXPAND_TERM
    ds = _fuzzy_dist_ds(sf_dir, term, max_distance)
    parts = ds.map_batches(
        lambda t: pa.Table.from_pandas(
            t.column("dist").to_pandas().value_counts().rename_axis("dist")
             .reset_index(name="n_terms"), preserve_index=False),
        batch_format="pyarrow").to_pandas()
    if parts.empty:
        return pd.DataFrame({"dist": pd.Series(dtype=np.int64),
                             "n_terms": pd.Series(dtype=np.int64)})
    out = parts.groupby("dist", as_index=False)["n_terms"].sum()
    return out.sort_values("dist").reset_index(drop=True).astype(np.int64)


def wildcard_match(sf_dir: str, prefix: str | None = None) -> pd.DataFrame:
    """(term, df) for vocabulary terms matching ``prefix*``
    (wildcard.py:81-175 prefix expansion; also the PAT-tree prefix-search
    semantics, pat_tree.py prefix queries)."""
    prefix = prefix or WILDCARD_PREFIX
    ts = term_stats(sf_dir)
    out = ts.map_batches(
        lambda t: t.filter(pa.compute.starts_with(t.column("term"), prefix)),
        batch_format="pyarrow",
    ).select_columns(["term", "df"]).to_pandas()
    return out.sort_values("term").reset_index(drop=True)


def facet_filtered_search(sf_dir: str, k: int = 10, lang: str = FACET_LANG) -> pd.DataFrame:
    """BM25 with a facet filter: score at full retrieval depth, intersect
    with the allowed doc set, THEN truncate to top-k — the reference's
    filter-then-truncate semantics (search_service.py:108,413-432).  The
    The lang->doc mask is a distributed LEFT SEMI hash join of the
    scored rows against the allowed doc ids (no driver-built broadcast
    set — both sides hash-partition on doc_id)."""
    import ray.data as rd

    n_docs, avgdl = _corpus_stats(sf_dir)
    allowed = (
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"])
        .map_batches(
            lambda t: t.filter(pa.compute.equal(t.column("lang"), lang)).select(["doc_id"]),
            batch_format="pyarrow")
        .repartition(2)  # merge empty zero-schema blocks (join quirk)
    )
    scores = _bm25_scores(sf_dir, n_docs, avgdl)
    filt = scores.join(allowed, "left_semi", num_partitions=8, on=("doc_id",))
    out = _topk_by_qid(filt, k)
    out["score"] = out["score"].map(round4)
    return out.sort_values(["qid", "rank"]).reset_index(drop=True)[["qid", "rank", "doc_id", "score"]]


def _qrels_reduced(sf_dir: str):
    """Distributed qrels grading — the 10^12-doc shape (VERDICT r02 #4):
    the driver never builds an O(matching-docs) dict.

    grade contract (_grade_qrels): grade 2 iff the doc contains ALL the
    query's terms, 1 iff >= half.  Computed as Dataset aggregates:
    exploded tokens filtered to the query vocabulary -> distinct
    (doc, term) pairs (bucketed partial-sum merge) -> expand each term
    to its qids (tiny broadcast map, vectorized dictionary-encode) ->
    distinct-matched-term count per (qid, doc) -> grade.

    Returns ``(grades_ds, hist)``: a materialized Dataset
    (qid, doc_id, grade>0) that stays distributed, and the tiny
    per-(qid, grade) count histogram {qid: {grade: n}} — all the
    driver ever holds besides the run rows themselves.
    """

    def build():
        qterms = sorted({t for ts in FIXED_QUERIES.values() for t in ts})
        qid_strings = sorted(FIXED_QUERIES)
        qid_code = {q: i for i, q in enumerate(qid_strings)}
        term_qids = {t: [qid for qid, ts in FIXED_QUERIES.items() if t in ts]
                     for t in qterms}
        need = {qid: len(set(ts)) for qid, ts in FIXED_QUERIES.items()}

        ex = _exploded_ds(sf_dir).map_batches(
            lambda t: t.filter(pa.compute.is_in(
                t.column("term"), value_set=pa.array(qterms))).select(
                    ["doc_id", "term"]),
            batch_format="pyarrow",
        )
        # distinct (doc, term): bucketed merge — no single task holds
        # the whole matched key domain
        pairs = _sum_by(ex, ("doc_id", "term"), (), counts=("n",),
                        num_buckets=8)

        def expand(t: pa.Table) -> pa.Table:
            col = t.column("term")
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            denc = pa.compute.dictionary_encode(col)
            idx = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
            uniq = denc.dictionary.to_pylist()
            doc = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
            nq_u = np.array([len(term_qids[u]) for u in uniq], dtype=np.int64)
            offs_u = np.concatenate(([0], np.cumsum(nq_u)))[:-1] if len(uniq) \
                else np.empty(0, dtype=np.int64)
            flat_q = np.array([qid_code[q] for u in uniq for q in term_qids[u]],
                              dtype=np.int64)
            reps = nq_u[idx] if idx.size else np.empty(0, dtype=np.int64)
            total = int(reps.sum())
            within = np.arange(total) - np.repeat(
                np.concatenate(([0], np.cumsum(reps)))[:-1], reps)
            qcodes = flat_q[np.repeat(offs_u[idx], reps) + within] if total \
                else np.empty(0, dtype=np.int64)
            return pa.table({
                "qid": pa.compute.take(pa.array(qid_strings, pa.string()),
                                       pa.array(qcodes)),
                "doc_id": pa.array(np.repeat(doc, reps)),
                "hits": pa.array(np.ones(total, dtype=np.int64)),
            })

        hits = _sum_by(pairs.map_batches(expand, batch_format="pyarrow"),
                       ("qid", "doc_id"), ("hits",), num_buckets=8)

        def grade_batch(t: pa.Table) -> pa.Table:
            col = t.column("qid")
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            denc = pa.compute.dictionary_encode(col)
            idx = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
            need_u = np.array([need[q] for q in denc.dictionary.to_pylist()],
                              dtype=np.int64)
            h = t.column("hits").to_numpy(zero_copy_only=False).astype(np.int64)
            nd = need_u[idx] if idx.size else np.empty(0, dtype=np.int64)
            grade = np.where(h == nd, 2, np.where(2 * h >= nd, 1, 0))
            keep = grade > 0
            return pa.table({
                "qid": col.filter(pa.array(keep)),
                "doc_id": t.column("doc_id").filter(pa.array(keep)),
                "grade": pa.array(grade[keep].astype(np.int64)),
            })

        grades = hits.map_batches(grade_batch, batch_format="pyarrow").materialize()
        hist_df = _sum_by(grades.select_columns(["qid", "grade"]),
                          ("qid", "grade"), (), counts=("n",)).to_pandas()
        hist: dict[str, dict[int, int]] = {qid: {} for qid in FIXED_QUERIES}
        for _, r in hist_df.iterrows():
            hist[r["qid"]][int(r["grade"])] = int(r["n"])
        return grades, hist

    return _memo(("qrels_reduced", sf_dir), build)


def _run_grades(sf_dir: str, doc_ids) -> pd.DataFrame:
    """(qid, doc_id, grade) rows for the given run docs only — the
    O(k x |queries|) slice of the distributed grades table."""
    grades, _ = _qrels_reduced(sf_dir)
    dset = pa.array(np.unique(np.asarray(doc_ids, dtype=np.int64)))
    return grades.map_batches(
        lambda t: t.filter(pa.compute.is_in(t.column("doc_id"), value_set=dset)),
        batch_format="pyarrow",
    ).to_pandas()


def eval_metrics(sf_dir: str, k: int = 10) -> pd.DataFrame:
    """Metric battery (metrics.py:84-872) of the BM25 run against a
    deterministic synthetic qrels: doc is relevant (grade 2) iff it
    contains ALL the query's terms, grade 1 iff >= half; graded
    DISTRIBUTED (_qrels_reduced) — the driver holds only the run rows'
    grades plus the per-(qid, grade) histogram.  Oracle-checked: the
    full battery (AP/nDCG/ERR/RBP/bpref/GMAP...) is replicated in
    window-function SQL."""
    from ..functions.metrics import evaluate_run_reduced

    run_df = bm25_topk(sf_dir, k=k)
    run = {qid: g.sort_values("rank")["doc_id"].tolist() for qid, g in run_df.groupby("qid")}
    _, hist = _qrels_reduced(sf_dir)
    rg = _run_grades(sf_dir, run_df["doc_id"].to_numpy())
    run_grades: dict[str, dict[int, int]] = {qid: {} for qid in FIXED_QUERIES}
    for r in rg.itertuples():
        run_grades[r.qid][int(r.doc_id)] = int(r.grade)
    summary = evaluate_run_reduced(run, run_grades, hist, k=k)
    rows = [(m, round4(v)) for m, v in sorted(summary.items())]
    return pd.DataFrame(rows, columns=["metric", "value"])


def _grade_qrels(doc_terms: dict[int, set[str]]) -> dict[str, dict[int, int]]:
    """Synthetic graded qrels: grade 2 iff the doc contains ALL the
    query's terms, grade 1 iff at least half (eval_metrics contract)."""
    qrels: dict[str, dict[int, int]] = {}
    for qid, terms in FIXED_QUERIES.items():
        need = set(terms)
        qq = {}
        for d, ts in doc_terms.items():
            hit = len(need & ts)
            if hit == len(need):
                qq[d] = 2
            elif hit * 2 >= len(need):
                qq[d] = 1
        qrels[qid] = qq
    return qrels


def _binary_rel_reduced(sf_dir: str, run_df: pd.DataFrame
                        ) -> tuple[dict[str, set[int]], dict[str, int]]:
    """Binary relevance in the REDUCED form (no O(matching-docs) driver
    set): (rel membership for RUN docs only, distributed relevant
    count per qid) from the _qrels_reduced grades table."""
    _, hist = _qrels_reduced(sf_dir)
    rg = _run_grades(sf_dir, run_df["doc_id"].to_numpy())
    rel_run: dict[str, set[int]] = {qid: set() for qid in FIXED_QUERIES}
    for r in rg.itertuples():
        if int(r.grade) >= 1:
            rel_run[r.qid].add(int(r.doc_id))
    n_rel = {qid: sum(n for g, n in hist[qid].items() if g >= 1)
             for qid in FIXED_QUERIES}
    return rel_run, n_rel


def eval_pr_curve(sf_dir: str, k: int = 10) -> pd.DataFrame:
    """(qid, rank, recall, precision): raw PR points along the BM25
    ranking (evaluation_service.py:597-612) vs the binary qrels."""
    from ..functions.metrics import pr_curve_reduced

    run_df = bm25_topk(sf_dir, k=k)
    rel_run, n_rel = _binary_rel_reduced(sf_dir, run_df)
    rows = []
    for qid in sorted(FIXED_QUERIES):
        ranked = run_df[run_df.qid == qid].sort_values("rank")["doc_id"].tolist()[:k]
        flags = [d in rel_run[qid] for d in ranked]
        for rank, (r, p) in enumerate(pr_curve_reduced(flags, n_rel[qid]), 1):
            rows.append((qid, rank, round4(r), round4(p)))
    return pd.DataFrame(rows, columns=["qid", "rank", "recall", "precision"])


def eval_interpolated_precision(sf_dir: str, k: int = 10) -> pd.DataFrame:
    """(qid, recall_level, precision): 11-point interpolated precision
    (evaluation_service.py:579-595)."""
    from ..functions.metrics import precision_at_recall_reduced

    run_df = bm25_topk(sf_dir, k=k)
    rel_run, n_rel = _binary_rel_reduced(sf_dir, run_df)
    rows = []
    for qid in sorted(FIXED_QUERIES):
        ranked = run_df[run_df.qid == qid].sort_values("rank")["doc_id"].tolist()[:k]
        flags = [d in rel_run[qid] for d in ranked]
        for level, p in precision_at_recall_reduced(flags, n_rel[qid]):
            rows.append((qid, round4(level), round4(p)))
    return pd.DataFrame(rows, columns=["qid", "recall_level", "precision"])


def eval_f_beta(sf_dir: str, k: int = 10) -> pd.DataFrame:
    """(qid, k, beta, f_beta): F-beta 0.5 / 2.0 at cutoffs 5 and 10
    (evaluation_service.py:627-650)."""
    from ..functions.metrics import f_beta

    run_df = bm25_topk(sf_dir, k=k)
    rel_run, n_rel = _binary_rel_reduced(sf_dir, run_df)
    rows = []
    for qid in sorted(FIXED_QUERIES):
        ranked = run_df[run_df.qid == qid].sort_values("rank")["doc_id"].tolist()[:k]
        for beta in (0.5, 2.0):
            for kk in (5, 10):
                hits = sum(1 for d in ranked[:kk] if d in rel_run[qid])
                p = hits / kk
                r = hits / n_rel[qid] if n_rel[qid] else 0.0
                rows.append((qid, kk, beta, round4(f_beta(p, r, beta))))
    return pd.DataFrame(rows, columns=["qid", "k", "beta", "f_beta"])


def eval_pr_at_k(sf_dir: str, k: int = 10) -> pd.DataFrame:
    """Per-query precision@k / recall@k / MRR@k of the BM25 run against
    the synthetic binary qrels (grade >= 1) — the SQL-expressible slice
    of the metric battery (metrics.py:84-210), oracle-checked end to end
    (run AND qrels both derived in DuckDB)."""
    run_df = bm25_topk(sf_dir, k=k)
    rel_run, n_rel = _binary_rel_reduced(sf_dir, run_df)
    rows = []
    for qid in sorted(FIXED_QUERIES):
        ranked = run_df[run_df.qid == qid].sort_values("rank")["doc_id"].tolist()[:k]
        relk = sum(1 for d in ranked if d in rel_run[qid])
        p = relk / k
        r = relk / n_rel[qid] if n_rel[qid] else 0.0
        mrr = 0.0
        for i, d in enumerate(ranked, 1):
            if d in rel_run[qid]:
                mrr = 1.0 / i
                break
        rows.append((qid, round4(p), round4(r), round4(mrr)))
    return pd.DataFrame(rows, columns=["qid", "p_at_k", "r_at_k", "mrr"])


def search_snippets(sf_dir: str, k: int = 5) -> pd.DataFrame:
    """Result assembly for the fixed queries: BM25 top-k hydrated with
    snippet + highlight + matched-term count (search_service.py:627-703
    serving-side map; doc texts fetched by id — the small-side hydrate
    lookup of SURVEY §2.4).  Rows-only check; kernels unit-tested."""
    from ..functions.snippets import highlight, make_snippet

    top = bm25_topk(sf_dir, k=k)
    ids = sorted(set(top["doc_id"]))
    tbl = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    tmap = dict(zip(tbl.column("doc_id").to_pylist(), tbl.column("text").to_pylist()))
    rows = []
    for _, r in top.iterrows():
        terms = FIXED_QUERIES[r["qid"]]
        text = tmap.get(int(r["doc_id"]), "") or ""
        snip = make_snippet(text, terms)
        marked = highlight(snip, terms)
        rows.append((r["qid"], int(r["rank"]), int(r["doc_id"]),
                     snip, marked.count("<mark>")))
    return pd.DataFrame(rows, columns=["qid", "rank", "doc_id", "snippet", "n_marks"])


def textrank_keywords(sf_dir: str, k: int = 5) -> pd.DataFrame:
    """Per-doc TextRank keywords (textrank.py:85-737: window-5
    co-occurrence graph, damping 0.85) as a map_batches stage over the
    tokenized docs.  Pinned to the DETERMINISTIC configuration (tol=0,
    30 power iterations, rank on the rounded score) so the result is
    oracle-checkable — with early-stop tolerance the top-k boundary
    can flip on float summation-order jitter between the NumPy kernel
    and the SQL unroll; the free-running-tolerance kernel itself stays
    available and unit-tested (functions/keywords.textrank_keywords)."""
    return textrank_fixed_topk(sf_dir, k=k)


def textrank_fixed_topk(sf_dir: str, k: int = 5, iters: int = 30) -> pd.DataFrame:
    """Oracle-determinstic TextRank variant: exactly ``iters`` power
    iterations (tol=0, no early stop) and ranking on the ROUNDED
    (4-decimal) score so float summation-order jitter between the NumPy
    kernel and the SQL unroll cannot flip a rank at the top-k boundary.
    Same graph/damping semantics as :func:`textrank_keywords`
    (reference textrank.py:85-737)."""
    from ..functions.keywords import textrank_scores

    toks = _tokens_ds(sf_dir, with_positions=True)

    def kw(t: pa.Table) -> pa.Table:
        doc_out, rank_out, term_out, score_out = [], [], [], []
        for row in t.to_pylist():
            seq: list[tuple[int, str]] = []
            for term, poss in zip(row["terms"], row["positions"]):
                seq.extend((p, term) for p in poss)
            seq.sort()
            scored = textrank_scores([w for _, w in seq], max_iter=iters, tol=0.0)
            ranked = sorted(((round4(s), term) for term, s in scored),
                            key=lambda x: (-x[0], x[1]))[:k]
            for rank, (score, term) in enumerate(ranked, 1):
                doc_out.append(row["doc_id"])
                rank_out.append(rank)
                term_out.append(term)
                score_out.append(score)
        return pa.table({
            "doc_id": pa.array(doc_out, pa.int64()),
            "rank": pa.array(rank_out, pa.int64()),
            "term": pa.array(term_out, pa.string()),
            "score": pa.array(score_out, pa.float64()),
        })

    return toks.map_batches(kw, batch_format="pyarrow").to_pandas() \
               .sort_values(["doc_id", "rank"]).reset_index(drop=True)


def rake_keywords(sf_dir: str, k: int = 5) -> pd.DataFrame:
    """Per-doc RAKE keyphrases (rake_extractor.py:84-246 — stopword-
    delimited phrases, degree/frequency word scores) as a map_batches
    stage over tokenized docs (rows-only; kernel unit-tested against
    hand-computed goldens)."""
    from ..functions.keywords import rake_keywords as rk
    from ..functions.stopwords import load_stopwords

    stops = load_stopwords("en")
    toks = _tokens_ds(sf_dir, with_positions=True)

    def kw(t: pa.Table) -> pa.Table:
        doc_out, rank_out, phrase_out, score_out = [], [], [], []
        for row in t.to_pylist():
            seq: list[tuple[int, str]] = []
            for term, poss in zip(row["terms"], row["positions"]):
                seq.extend((p, term) for p in poss)
            seq.sort()
            for rank, (phrase, score) in enumerate(rk([w for _, w in seq], stops, k=k), 1):
                doc_out.append(row["doc_id"])
                rank_out.append(rank)
                phrase_out.append(phrase)
                score_out.append(round4(score))
        return pa.table({
            "doc_id": pa.array(doc_out, pa.int64()),
            "rank": pa.array(rank_out, pa.int64()),
            "phrase": pa.array(phrase_out, pa.string()),
            "score": pa.array(score_out, pa.float64()),
        })

    return toks.map_batches(kw, batch_format="pyarrow").to_pandas() \
               .sort_values(["doc_id", "rank"]).reset_index(drop=True)


def yake_unigram_topk(sf_dir: str, k: int = 5) -> pd.DataFrame:
    """Per-doc sentence-free unigram YAKE (yake_extractor.py:120-439
    wraps the yake library; this is the published Campos-2018 scoring
    restricted to unigrams with the doc as one sentence, so every
    feature — median position, TF z-norm, distinct-neighbor
    relatedness — is SQL-expressible and the query is oracle-checked).
    Output: (doc_id, rank, term, score), score asc = best."""
    from ..functions.yake import yake_unigram_scores

    toks = _tokens_ds(sf_dir, with_positions=True)

    def kw(t: pa.Table) -> pa.Table:
        doc_out, rank_out, term_out, score_out = [], [], [], []
        for row in t.to_pylist():
            ranked = yake_unigram_scores(row["terms"], row["positions"])
            for rank, (term, score) in enumerate(ranked[:k], 1):
                doc_out.append(row["doc_id"])
                rank_out.append(rank)
                term_out.append(term)
                score_out.append(round4(score))
        return pa.table({
            "doc_id": pa.array(doc_out, pa.int64()),
            "rank": pa.array(rank_out, pa.int64()),
            "term": pa.array(term_out, pa.string()),
            "score": pa.array(score_out, pa.float64()),
        })

    return toks.map_batches(kw, batch_format="pyarrow").to_pandas() \
               .sort_values(["doc_id", "rank"]).reset_index(drop=True)


def yake_doc_keywords(sf_dir: str, k: int = 5) -> pd.DataFrame:
    """Per-doc full YAKE keyphrases (sentence structure, casing,
    dispersion, up-to-3-gram candidates, seqm dedup 0.9 — the reference
    wrapper's defaults, yake_extractor.py:115-127) over the raw text
    column (rows-only; kernel unit-tested against hand-computed
    goldens).  Output: (doc_id, rank, keyword, score, n_words)."""
    from ..functions.stopwords import load_stopwords
    from ..functions.yake import yake_keywords as yk

    stops = load_stopwords("en")

    def kw(t: pa.Table) -> pa.Table:
        doc_out, rank_out, kw_out, score_out, n_out = [], [], [], [], []
        ids = t.column("doc_id").to_pylist()
        for did, text in zip(ids, t.column("text").to_pylist()):
            for rank, (phrase, score) in enumerate(yk(text or "", k=k, stops=stops), 1):
                doc_out.append(did)
                rank_out.append(rank)
                kw_out.append(phrase)
                score_out.append(round4(score))
                n_out.append(phrase.count(" ") + 1)
        return pa.table({
            "doc_id": pa.array(doc_out, pa.int64()),
            "rank": pa.array(rank_out, pa.int64()),
            "keyword": pa.array(kw_out, pa.string()),
            "score": pa.array(score_out, pa.float64()),
            "n_words": pa.array(n_out, pa.int64()),
        })

    return _docs_ds(sf_dir, ["doc_id", "text"]) \
        .map_batches(kw, batch_format="pyarrow").to_pandas() \
        .sort_values(["doc_id", "rank"]).reset_index(drop=True)


def yake_phrase_topk(sf_dir: str, k: int = 5) -> pd.DataFrame:
    """Full-phrase YAKE with the seqm near-duplicate pruning disabled
    (``dedup_lim=2.0`` — an unreachable SequenceMatcher ratio), so the
    whole pipeline — sentence segmentation, casing features, window-1
    relatedness, up-to-3-gram candidate phrases, the prod/(tf*(1+sum))
    phrase score — is deterministically replicable in SQL and the query
    is oracle-checked end-to-end (yake_extractor.py:115-127 semantics
    minus the 'seqm' dedup step, which ``yake_keywords``/`yake_doc_
    keywords` keep and unit tests cover).  Ranking is pinned on the
    4-dp-rounded score (ties broken keyword asc) so Python/DuckDB
    last-ulp float divergence (stddev_pop accumulation order) cannot
    flip near-tie ranks.  Output:
    (doc_id, rank, keyword, score, n_words), score asc = best."""
    from ..functions.stopwords import load_stopwords
    from ..functions.yake import yake_keywords as yk

    stops = load_stopwords("en")

    def kw(t: pa.Table) -> pa.Table:
        doc_out, rank_out, kw_out, score_out, n_out = [], [], [], [], []
        ids = t.column("doc_id").to_pylist()
        for did, text in zip(ids, t.column("text").to_pylist()):
            allph = yk(text or "", k=1 << 62, dedup_lim=2.0, stops=stops)
            ranked = sorted(((round4(s), p) for p, s in allph),
                            key=lambda x: (x[0], x[1]))[:k]
            for rank, (score, phrase) in enumerate(ranked, 1):
                doc_out.append(did)
                rank_out.append(rank)
                kw_out.append(phrase)
                score_out.append(score)
                n_out.append(phrase.count(" ") + 1)
        return pa.table({
            "doc_id": pa.array(doc_out, pa.int64()),
            "rank": pa.array(rank_out, pa.int64()),
            "keyword": pa.array(kw_out, pa.string()),
            "score": pa.array(score_out, pa.float64()),
            "n_words": pa.array(n_out, pa.int64()),
        })

    return _docs_ds(sf_dir, ["doc_id", "text"]) \
        .map_batches(kw, batch_format="pyarrow").to_pandas() \
        .sort_values(["doc_id", "rank"]).reset_index(drop=True)


def yake_levdedup_topk(sf_dir: str, k: int = 5, m: int = 30,
                       sim_threshold: float = 0.6) -> pd.DataFrame:
    """YAKE keyphrases with GREEDY near-duplicate pruning, the
    Levenshtein-ratio variant: the reference wrapper's 'seqm'
    SequenceMatcher criterion (yake_extractor.py:115-127) is swapped
    for 1 - lev/max(len) >= 0.9 so the greedy selection LOOP itself is
    SQL-replicable (recursive CTE over a materialized similar-pair
    edge list) and oracle-checked — the seqm criterion stays in
    ``yake_keywords`` with unit goldens.  Deterministic operator
    definition: candidates = top-``m`` phrases by (round4 score,
    keyword); walk them in order, keep a phrase iff no already-kept
    phrase is >= ``sim_threshold`` similar; return the first ``k``
    kept.  Default threshold 0.6: short synthetic phrases almost never
    reach the reference's 0.9 (which stays the seqm default in
    ``yake_keywords``), and 0.6 makes the rejection branch do real work
    on this corpus (~2% of top-5 slots change).  Output: (doc_id, rank, keyword, score, n_words)."""
    from ..functions.cluster import edit_similarity
    from ..functions.stopwords import load_stopwords
    from ..functions.yake import yake_keywords as yk

    stops = load_stopwords("en")

    def kw(t: pa.Table) -> pa.Table:
        doc_out, rank_out, kw_out, score_out, n_out = [], [], [], [], []
        ids = t.column("doc_id").to_pylist()
        for did, text in zip(ids, t.column("text").to_pylist()):
            allph = yk(text or "", k=1 << 62, dedup_lim=2.0, stops=stops)
            cand = sorted(((round4(s), p) for p, s in allph),
                          key=lambda x: (x[0], x[1]))[:m]
            picked: list[tuple[str, float]] = []
            for s4, p in cand:
                if any(edit_similarity(p, q) >= sim_threshold
                       for q, _ in picked):
                    continue
                picked.append((p, s4))
                if len(picked) >= k:
                    break
            for rank, (phrase, score) in enumerate(picked, 1):
                doc_out.append(did)
                rank_out.append(rank)
                kw_out.append(phrase)
                score_out.append(score)
                n_out.append(phrase.count(" ") + 1)
        return pa.table({
            "doc_id": pa.array(doc_out, pa.int64()),
            "rank": pa.array(rank_out, pa.int64()),
            "keyword": pa.array(kw_out, pa.string()),
            "score": pa.array(score_out, pa.float64()),
            "n_words": pa.array(n_out, pa.int64()),
        })

    return _docs_ds(sf_dir, ["doc_id", "text"]) \
        .map_batches(kw, batch_format="pyarrow").to_pandas() \
        .sort_values(["doc_id", "rank"]).reset_index(drop=True)


def summarize_leadk(sf_dir: str, k: int = 2) -> pd.DataFrame:
    """Lead-k-sentence summaries per doc (static.py lead mode; rows-only)."""
    from ..functions.snippets import lead_k_summary

    def s(t: pa.Table) -> pa.Table:
        outs = [lead_k_summary(x or "", k) for x in t.column("text").to_pylist()]
        return pa.table({
            "doc_id": t.column("doc_id"),
            "summary": pa.array(outs, pa.string()),
            "summary_len": pa.array([len(x) for x in outs], pa.int64()),
        })

    return _docs_ds(sf_dir, ["doc_id", "text"]).map_batches(s, batch_format="pyarrow") \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)


def summarize_key_sentences(sf_dir: str, k: int = 2) -> pd.DataFrame:
    """Per-doc TF-IDF key-sentence summaries (static.py:334-407:
    sentence-as-document IDF, length-normalized scores, position bias;
    rows-only, kernel unit-tested against goldens)."""
    from ..functions.summarize import key_sentence_summary

    def s(t: pa.Table) -> pa.Table:
        outs = [" ".join(key_sentence_summary(x or "", k))
                for x in t.column("text").to_pylist()]
        return pa.table({
            "doc_id": t.column("doc_id"),
            "summary": pa.array(outs, pa.string()),
            "summary_len": pa.array([len(x) for x in outs], pa.int64()),
        })

    return _docs_ds(sf_dir, ["doc_id", "text"]).map_batches(s, batch_format="pyarrow") \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)


SUMMARY_QUERY = "slow query scan"


def summarize_query_focused(sf_dir: str, k: int = 2,
                            query: str = SUMMARY_QUERY) -> pd.DataFrame:
    """Per-doc query-focused summaries (static.py:413-503: overlap /
    sqrt(|q|*|s|) over token sets; rows-only)."""
    from ..functions.summarize import query_focused_summary

    def s(t: pa.Table) -> pa.Table:
        outs = [" ".join(query_focused_summary(x or "", query, k))
                for x in t.column("text").to_pylist()]
        return pa.table({
            "doc_id": t.column("doc_id"),
            "summary": pa.array(outs, pa.string()),
            "summary_len": pa.array([len(x) for x in outs], pa.int64()),
        })

    return _docs_ds(sf_dir, ["doc_id", "text"]).map_batches(s, batch_format="pyarrow") \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)


FIELD_WEIGHTS = {"title": 0.45, "tags": 0.25, "category": 0.18, "content": 0.06}


def field_boost_topk(sf_dir: str, k: int = 10) -> pd.DataFrame:
    """BM25 + field-aware boost rerank (search_service.py:434-481:
    title .45 / tags .25 / category .18 / content .06 per distinct
    matched query term, each field capped at 3 hits, total boost capped
    at 1.5 and rounded to 6 places; reranked = score + boost).

    The oracle tables have no title/tags columns, so fields derive
    DETERMINISTICALLY from the documents row (mirrored in the SQL
    oracle): title = first 5 normalized whitespace tokens, tags =
    {source}, category = {lang}, content = all normalized tokens.
    Boosts are computed per doc batch distributed; the rerank itself
    runs on the (small) retrieved candidate list, as the reference
    reranks its ranked list."""
    n_docs, avgdl = _corpus_stats(sf_dir)
    scores = _bm25_scores(sf_dir, n_docs, avgdl).to_pandas()
    boosts = _field_boosts_ds(sf_dir).to_pandas()
    merged = scores.merge(boosts, on=["qid", "doc_id"], how="left")
    merged["adj"] = merged["score"] + merged["boost"].fillna(0.0)
    rows = []
    for qid in FIXED_QUERIES:
        g = merged[merged["qid"] == qid].sort_values(
            ["adj", "doc_id"], ascending=[False, True]).head(k)
        for rank, (_, r) in enumerate(g.iterrows(), 1):
            rows.append((qid, rank, int(r["doc_id"]), round4(float(r["adj"]))))
    return pd.DataFrame(rows, columns=["qid", "rank", "doc_id", "score"])


def _field_boosts_ds(sf_dir: str, qsets: dict[str, list[str]] | None = None):
    """(qid, doc_id, boost) Dataset: the reference field-boost per doc
    and query (search_service.py:434-481 weights/caps; fields derived
    deterministically as documented in field_boost_topk).  ``qsets``
    defaults to the fixed query battery."""
    from ..functions.textnorm import normalize_text

    qsets = {qid: list(dict.fromkeys(ts))
             for qid, ts in (qsets or FIXED_QUERIES).items()}

    def boost_batch(t: pa.Table) -> pa.Table:
        out_q, out_d, out_b = [], [], []
        for row in t.to_pylist():
            toks = normalize_text(row["text"] or "").split()
            title5 = set(toks[:5])
            allset = set(toks)
            for qid, terms in qsets.items():
                c_title = sum(1 for x in terms if x in title5)
                c_tags = sum(1 for x in terms if x == row["source"])
                c_cat = sum(1 for x in terms if x == row["lang"])
                c_cont = sum(1 for x in terms if x in allset)
                b = (FIELD_WEIGHTS["title"] * min(c_title, 3)
                     + FIELD_WEIGHTS["tags"] * min(c_tags, 3)
                     + FIELD_WEIGHTS["category"] * min(c_cat, 3)
                     + FIELD_WEIGHTS["content"] * min(c_cont, 3))
                out_q.append(qid)
                out_d.append(row["doc_id"])
                out_b.append(round(min(b, 1.5), 6))
        return pa.table({
            "qid": pa.array(out_q, pa.string()),
            "doc_id": pa.array(out_d, pa.int64()),
            "boost": pa.array(out_b, pa.float64()),
        })

    return _docs_ds(sf_dir, ["doc_id", "text", "source", "lang"]) \
        .map_batches(boost_batch, batch_format="pyarrow")


def search_serving(sf_dir: str, k: int = 5,
                   filter_lang: str = FACET_LANG) -> pd.DataFrame:
    """The app's FULL serving flow for one model (search_service.py:
    82-197): BM25 base ranking at retrieval depth = corpus (the
    filter-then-truncate rule when filters are present, :108) ->
    field-boost rerank (:157 / :434-481) -> facet filter (:158,
    lang = FACET_LANG) -> [:top_k] -> result assembly with the
    per-doc matched query terms (:165-196).

    Distributed composition: the scored candidates, the per-doc field
    boosts and the facet-allowed ids are three Datasets joined with
    hash/semi joins; the driver sees only the merged top-k.  Canonical
    tie order (adjusted score desc, doc_id asc)."""
    n_docs, avgdl = _corpus_stats(sf_dir)
    scores = _bm25_scores(sf_dir, n_docs, avgdl)          # (qid, doc_id, score)
    boosts = _field_boosts_ds(sf_dir)                     # (qid, doc_id, boost)
    adj = scores.join(boosts, "inner", num_partitions=8, on=("qid", "doc_id")) \
        .map_batches(lambda t: pa.table({
            "qid": t.column("qid"), "doc_id": t.column("doc_id"),
            "score": pa.compute.add(t.column("score"), t.column("boost"))}),
            batch_format="pyarrow")
    allowed = _docs_ds(sf_dir, ["doc_id", "lang"]).map_batches(
        lambda t: t.filter(pa.compute.equal(t.column("lang"), filter_lang))
        .select(["doc_id"]), batch_format="pyarrow")
    filt = adj.join(allowed, "left_semi", num_partitions=8, on=("doc_id",))
    out = _topk_by_qid(filt, k)
    out["score"] = out["score"].map(round4)

    # matched query terms for the (tiny) served page, from the exploded
    # stream restricted to the top doc ids
    top_ids = pa.array(sorted(set(out["doc_id"])))
    qterms = sorted({t for ts in FIXED_QUERIES.values() for t in ts})
    pres = _exploded_ds(sf_dir).map_batches(
        lambda t: t.filter(pa.compute.and_(
            pa.compute.is_in(t.column("doc_id"), value_set=top_ids),
            pa.compute.is_in(t.column("term"), value_set=pa.array(qterms)))),
        batch_format="pyarrow").to_pandas()
    have: dict[int, set[str]] = {}
    for d, t in zip(pres["doc_id"], pres["term"]):
        have.setdefault(int(d), set()).add(t)
    out["matched_terms"] = [
        "|".join(sorted(set(FIXED_QUERIES[q]) & have.get(int(d), set())))
        for q, d in zip(out["qid"], out["doc_id"])]
    return out.sort_values(["qid", "rank"]).reset_index(drop=True)[
        ["qid", "rank", "doc_id", "score", "matched_terms"]]


def fieldweighted_bm25(sf_dir: str, k: int = 10) -> pd.DataFrame:
    """BM25 over the reference app's FIELD-WEIGHTED document text —
    what the served system actually indexes: ``f"{title} {title}
    {title} {tags} {category} {content}"`` (title x3,
    index_service.py:220-231), doc length clamped ``max(1, len)``
    (index_service.py:285), BM25 IDF/k1/b as the plain path.

    The oracle tables carry no title/tags columns, so fields derive
    deterministically from the documents row exactly as
    ``field_boost_topk``: title = first 5 normalized ws tokens, tags =
    {source}, category = {lang}, content = all tokens.  Weighted tf =
    3*tf(title) + 1[term=source] + 1[term=lang] + tf(content); df,
    avgdl and scoring all run over the weighted stream (note tags /
    category introduce vocabulary the text alone lacks, so df genuinely
    differs from the plain index).  One map_batches builds the weighted
    exploded stream; scoring shares `_bm25_scores_over`."""
    from collections import Counter

    from ..functions.textnorm import keep_token, normalize_text

    def weighted(t: pa.Table) -> pa.Table:
        out_d, out_t, out_tf, out_dl = [], [], [], []
        for row in t.to_pylist():
            raw = normalize_text(row["text"] or "").split(" ")
            content = [x for x in raw if x and keep_token(x)]
            title = [x for x in raw[:5] if x and keep_token(x)]
            cnt = Counter(content)
            for x in title:
                cnt[x] += 3
            for extra in (row["source"], row["lang"]):
                if extra and keep_token(extra):
                    cnt[extra] += 1
            dl = max(1, sum(cnt.values()))
            for term, tf in cnt.items():
                out_d.append(row["doc_id"])
                out_t.append(term)
                out_tf.append(tf)
                out_dl.append(dl)
        return pa.table({
            "doc_id": pa.array(out_d, pa.int64()),
            "term": pa.array(out_t, pa.string()),
            "tf": pa.array(out_tf, pa.int64()),
            "dl": pa.array(out_dl, pa.int32()),
        })

    def build():
        return _docs_ds(sf_dir, ["doc_id", "text", "source", "lang"]) \
            .map_batches(weighted, batch_format="pyarrow").materialize()

    ex = _memo(("fieldweighted", sf_dir), build)

    # weighted corpus stats: every doc contributes a clamped dl (docs
    # with no tokens at all clamp to 1, mirroring the LEFT JOIN +
    # greatest(1, ...) in the SQL twin)
    n_docs = _docs_ds(sf_dir, ["doc_id"]).count()
    from ray.data.aggregate import Count, Sum
    # a doc's rows never split across batches (the map emits whole docs),
    # so a per-batch drop_duplicates is an exact per-doc (doc_id, dl)
    uniq = ex.map_batches(lambda df: df[["doc_id", "dl"]].drop_duplicates(),
                          batch_format="pandas")
    agg = uniq.aggregate(Sum("dl"), Count())
    # docs with zero weighted tokens emit no rows; they clamp to dl=1
    total_dl = float(agg["sum(dl)"]) + (n_docs - int(agg["count()"]))
    avgdl = total_dl / n_docs

    qterms = sorted({t for ts in FIXED_QUERIES.values() for t in ts})
    term_to_qids = {
        t: [qid for qid, ts in FIXED_QUERIES.items() if t in ts] for t in qterms
    }
    scores = _bm25_scores_over(ex, n_docs, avgdl, term_to_qids)
    out = _topk_by_qid(scores, k)
    out["score"] = out["score"].map(round4)
    return out.sort_values(["qid", "rank"]).reset_index(drop=True)[
        ["qid", "rank", "doc_id", "score"]]


CSOUNDEX_QUERY = "spark"


def csoundex_expand(sf_dir: str, query_term: str = CSOUNDEX_QUERY,
                    threshold: float = 0.72, k: int = 8) -> pd.DataFrame:
    """CSoundex phonetic query expansion over the corpus vocabulary —
    one of the reference's ten ranking models (search_service.py:397-411:
    find_similar threshold 0.72, top-8; csoundex.py:306-533 encoding).

    The vocabulary side runs distributed: each term batch encodes +
    scores against the (tiny, broadcast-by-closure) query term inside
    map_batches; only (term, sim) survivors leave the tasks.  On this
    English test vocabulary the per-char code is the uppercase letter,
    so similarity reduces to positional character match / max length —
    which is what the DuckDB oracle mirrors (the CJK branch is covered
    by unit parity tests on the vendored pinyin lexicon)."""
    from ..functions.csoundex import similarity

    terms = term_stats(sf_dir)

    def score(t: pa.Table) -> pa.Table:
        out_t, out_s = [], []
        for term in t.column("term").to_pylist():
            if not term.isalpha():
                continue
            s = similarity(query_term, term, "fuzzy")
            if s >= threshold:
                out_t.append(term)
                out_s.append(round4(s))
        return pa.table({"term": pa.array(out_t, pa.string()),
                         "sim": pa.array(out_s, pa.float64())})

    hits = terms.map_batches(score, batch_format="pyarrow").to_pandas()
    hits = hits.sort_values(["sim", "term"], ascending=[False, True]).head(k)
    hits["rank"] = np.arange(1, len(hits) + 1, dtype=np.int64)
    return hits.reset_index(drop=True)[["rank", "term", "sim"]]


def phonetic_search(sf_dir: str, threshold: float = 0.72, expand_k: int = 8,
                    k: int = 10) -> pd.DataFrame:
    """Phonetic retrieval end-to-end — the reference's CSoundex ranking
    model (search_service.py:397-411): every fixed-query term is
    expanded to its top-8 phonetic matches (threshold 0.72) over the
    corpus vocabulary, the per-query expansions are unioned, and BM25
    ranks docs over the expanded term set.

    Expansion runs distributed: each vocab batch scores against the
    (tiny, closure-broadcast) query-term list inside map_batches and
    only survivors leave the task; the driver holds just the O(q*8)
    expansion table.  At web scale the vocab side would be the
    csoundex-code-bucketed sidecar (group vocab by code_key, look up
    only the query's bucket) — same output, no full-vocab scan."""
    from ..functions.csoundex import similarity

    qterms = sorted({t for ts in FIXED_QUERIES.values() for t in ts})
    vocab = term_stats(sf_dir)

    def score(t: pa.Table) -> pa.Table:
        out_q, out_t, out_s = [], [], []
        for term in t.column("term").to_pylist():
            if not term.isalpha():
                continue
            for qt in qterms:
                s = similarity(qt, term, "fuzzy")
                if s >= threshold:
                    out_q.append(qt)
                    out_t.append(term)
                    out_s.append(s)
        return pa.table({"qterm": pa.array(out_q, pa.string()),
                         "term": pa.array(out_t, pa.string()),
                         "sim": pa.array(out_s, pa.float64())})

    hits = vocab.map_batches(score, batch_format="pyarrow").to_pandas()
    term_to_qids: dict[str, list[str]] = {}
    for qt, g in hits.groupby("qterm"):
        exp = g.sort_values(["sim", "term"], ascending=[False, True]).head(expand_k)
        for qid, ts in FIXED_QUERIES.items():
            if qt in ts:
                for t in exp["term"]:
                    qids = term_to_qids.setdefault(t, [])
                    if qid not in qids:
                        qids.append(qid)
    n_docs, avgdl = _corpus_stats(sf_dir)
    scores = _bm25_scores(sf_dir, n_docs, avgdl, term_to_qids=term_to_qids)
    out = _topk_by_qid(scores, k)
    out["score"] = out["score"].map(round4)
    return out.sort_values(["qid", "rank"]).reset_index(drop=True)[
        ["qid", "rank", "doc_id", "score"]]


def summarize_multidoc(sf_dir: str, k: int = 3) -> pd.DataFrame:
    """Per-source multi-document summaries (static.py:507-571: global
    TF-IDF + greedy Jaccard-diversity selection).  Each source group is
    small (facet cardinality), so the per-group kernel runs inside
    ``groupby(source).map_groups`` — the shuffle co-locates a source's
    docs; oracle-checked (greedy selection unrolled in SQL)."""
    import ray.data as rd

    from ..functions.summarize import multi_doc_summary

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "source", "text"])

    def per_source(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id")
        picks = multi_doc_summary(list(g["text"]), k=k)
        src = g["source"].iloc[0]
        return pd.DataFrame({
            "source": [src] * len(picks),
            "rank": np.arange(1, len(picks) + 1, dtype=np.int64),
            "doc_id": [int(g["doc_id"].iloc[di]) for di, _ in picks],
            "sentence": [s_ for _, s_ in picks],
        })

    out = ds.groupby("source").map_groups(per_source, batch_format="pandas").to_pandas()
    return out.sort_values(["source", "rank"]).reset_index(drop=True)


# ------------------------------------------------------------------ boolean / phrase

def boolean_and(sf_dir: str, terms: list[str] | None = None) -> pd.DataFrame:
    """doc_ids containing ALL terms (sorted-merge AND,
    inverted_index.py:331-373, expressed as a distinct-count match)."""
    from ray.data.aggregate import Count

    terms = terms or BOOL_AND
    tset = pa.array(sorted(set(terms)))
    ex = _exploded_ds(sf_dir).map_batches(
        lambda t: t.filter(pa.compute.is_in(t.column("term"), value_set=tset)),
        batch_format="pyarrow",
    )
    counts = ex.groupby("doc_id").aggregate(Count(alias_name="n_terms"))
    need = len(set(terms))
    hit = counts.map_batches(
        lambda t: t.filter(pa.compute.equal(t.column("n_terms"), need)).select(["doc_id"]),
        batch_format="pyarrow",
    )
    return hit.to_pandas().sort_values("doc_id").reset_index(drop=True)


def boolean_and_not(sf_dir: str) -> pd.DataFrame:
    """(A AND B) NOT C.  The exclude set is collected as doc_ids only
    (a semi-join mask; at scale -> broadcast Bloom filter)."""
    inc = boolean_and(sf_dir, BOOL_NOT[0])
    exc = set(boolean_and(sf_dir, BOOL_NOT[1])["doc_id"])
    out = inc[~inc["doc_id"].isin(exc)].reset_index(drop=True)
    return out


BOOL_EXPR = "(spark OR vector) AND NOT dup"


def boolean_parsed(sf_dir: str, expr: str | None = None) -> pd.DataFrame:
    """Full parsed boolean query (shunting-yard -> postfix -> stack eval,
    boolean.py:132-260) over the exploded postings.  Term doc-sets are
    distributed filters; the set algebra runs on the collected (small)
    per-term id arrays; NOT complements against the doc universe."""
    from ..functions.boolquery import parse_boolean, search_boolean

    expr = expr or BOOL_EXPR
    expr_terms = [t for t in parse_boolean(expr)
                  if t not in ("AND", "OR", "NOT") and ":" not in t]
    tset = pa.array(sorted(set(expr_terms)))
    rows = _exploded_ds(sf_dir).map_batches(
        lambda t: t.filter(pa.compute.is_in(t.column("term"), value_set=tset))
                   .select(["term", "doc_id"]),
        batch_format="pyarrow",
    ).to_pandas()
    postings = {t: np.unique(g["doc_id"].to_numpy(dtype=np.int64))
                for t, g in rows.groupby("term")}
    universe = np.sort(pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"])
                       .column("doc_id").to_numpy())

    def p(term: str) -> np.ndarray:
        return postings.get(term, np.empty(0, dtype=np.int64))

    hits = search_boolean(expr, p, universe)
    return pd.DataFrame({"doc_id": np.sort(hits)})


DATE_RANGE_EXPR = ("o_orderdate:[1996-01-01 TO 1997-12-31] "
                   "AND o_orderstatus:F AND NOT o_orderpriority:1-URGENT")


def date_range_query(sf_dir: str, expr: str = DATE_RANGE_EXPR) -> pd.DataFrame:
    """Boolean query AST with date-range + field predicates
    (query_parser.py RANGE nodes / boolean.py:19-29 ``date:[start TO
    end]`` syntax) evaluated over the orders table.

    Each predicate resolves to a sorted orderkey id-set via a
    column-pruned, filter-pushdown distributed read; the set algebra
    runs on the collected id arrays (same shape as boolean_parsed).
    Inclusive date bounds, as the reference's range semantics."""
    import pyarrow.dataset as pads

    from ..functions.boolquery import search_boolean

    dset = pads.dataset(f"{sf_dir}/orders.parquet")

    def ids_where(flt) -> np.ndarray:
        t = dset.to_table(columns=["o_orderkey"], filter=flt)
        return np.unique(t.column("o_orderkey").to_numpy(zero_copy_only=False))

    def field_docs(field: str, value: str) -> np.ndarray:
        return ids_where(pads.field(field) == value)

    def range_docs(field: str, start: str, end: str) -> np.ndarray:
        import datetime as _dt

        lo = _dt.datetime.fromisoformat(start)
        hi = _dt.datetime.fromisoformat(end)
        return ids_where((pads.field(field) >= lo) & (pads.field(field) <= hi))

    universe = np.unique(
        pq.read_table(f"{sf_dir}/orders.parquet", columns=["o_orderkey"])
        .column("o_orderkey").to_numpy())
    hits = search_boolean(expr, lambda t: np.empty(0, dtype=np.int64), universe,
                          field_docs=field_docs, range_docs=range_docs)
    return pd.DataFrame({"o_orderkey": np.sort(hits)})


FIELD_QUERY = {"lang": "en", "source": "src3", "term": "spark"}


def field_query(sf_dir: str) -> pd.DataFrame:
    """Field EXACT-match query (field_indexer.py:63-96 EXACT_FIELDS
    semantics): docs with lang=en AND source=src3 that contain the text
    term 'spark'.  Field predicates push down to the documents read; the
    term predicate is a broadcast semi-join of the (small) posting set."""
    term_docs = boolean_and(sf_dir, [FIELD_QUERY["term"]])
    tset = pa.array(sorted(term_docs["doc_id"].astype(np.int64)))
    docs = _docs_ds(sf_dir, ["doc_id", "lang", "source"])

    def f(t: pa.Table) -> pa.Table:
        m = pa.compute.and_(
            pa.compute.equal(t.column("lang"), FIELD_QUERY["lang"]),
            pa.compute.equal(t.column("source"), FIELD_QUERY["source"]),
        )
        t = t.filter(m)
        return t.filter(pa.compute.is_in(t.column("doc_id"), value_set=tset)).select(["doc_id"])

    return docs.map_batches(f, batch_format="pyarrow").to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)


def phrase_match(sf_dir: str, phrase: list[str] | None = None) -> pd.DataFrame:
    """doc_ids where the phrase occurs at consecutive token positions
    (positional-index adjacency, positional_index.py:92-152)."""
    phrase = phrase or PHRASE
    toks = _tokens_ds(sf_dir, with_positions=True)

    def check(t: pa.Table) -> pa.Table:
        hits = []
        for row in t.to_pylist():
            pos = dict(zip(row["terms"], row["positions"]))
            if any(x not in pos for x in phrase):
                continue
            starts = np.asarray(pos[phrase[0]], dtype=np.int64)
            for i in range(1, len(phrase)):
                starts = starts[np.isin(starts + i, np.asarray(pos[phrase[i]], dtype=np.int64))]
                if starts.size == 0:
                    break
            if starts.size:
                hits.append(row["doc_id"])
        return pa.table({"doc_id": pa.array(hits, pa.int64())})

    return toks.map_batches(check, batch_format="pyarrow").to_pandas() \
               .sort_values("doc_id").reset_index(drop=True)


def clean_corpus(sf_dir: str) -> pd.DataFrame:
    """The reference's cleaning pass (clean_dataset.py:39-63,98-133):
    whitespace-collapse + strip per doc, drop rows whose cleaned text is
    empty (validation drop).  NOTE: clean_text does NOT lowercase (that
    is the separate app normalization chain)."""
    from ..functions.textnorm import clean_text

    def c(t: pa.Table) -> pa.Table:
        cleaned = [clean_text(x or "") for x in t.column("text").to_pylist()]
        out = pa.table({
            "doc_id": t.column("doc_id"),
            "text_clean": pa.array(cleaned, pa.string()),
        })
        return out.filter(pa.compute.not_equal(out.column("text_clean"), ""))

    return _docs_ds(sf_dir, ["doc_id", "text"]).map_batches(c, batch_format="pyarrow") \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)


_DATE_STYLE_FMTS = ["%Y-%m-%d", "%Y/%m/%d", "%d/%m/%Y", "%Y年%m月%d日"]


def standardize_dates(sf_dir: str) -> pd.DataFrame:
    """Round-trip test of the multi-format date parser
    (clean_dataset.py:65-97): render each order date in one of 4 formats
    (cycled deterministically by o_orderkey % 4) then standardize back to
    YYYY-MM-DD.  The oracle computes the expected value directly from the
    timestamp, so any parser defect mismatches."""
    import ray.data as rd

    from ..functions.dates import standardize_date

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderdate"])

    def s(df: pd.DataFrame) -> pd.DataFrame:
        raws = [
            d.strftime(_DATE_STYLE_FMTS[int(k) % 4])
            for k, d in zip(df["o_orderkey"], df["o_orderdate"])
        ]
        return pd.DataFrame({
            "o_orderkey": df["o_orderkey"].astype(np.int64),
            "date_std": [standardize_date(r) for r in raws],
        })

    return ds.map_batches(s, batch_format="pandas").to_pandas() \
        .sort_values("o_orderkey").reset_index(drop=True)


def rocchio_topk(sf_dir: str, k: int = 10, alpha: float = 1.0, beta: float = 0.75,
                 n_feedback: int = 5) -> pd.DataFrame:
    """Rocchio pseudo-relevance feedback on TF-IDF vectors (reference
    Rocchio adapter hydrated from the lexical cache, index_service.py:308-392):
    q' = alpha*q + beta*centroid(top-n tfidf docs); rerank by cosine
    against q'.  Rows-only check (fusion of two distributed passes);
    vector math unit-tested via tfidf parity."""
    from ray.data.aggregate import Count

    n_docs, _ = _corpus_stats(sf_dir)
    base = tfidf_topk(sf_dir, k=n_feedback)
    ex = _exploded_ds(sf_dir).materialize()

    # normalized doc vectors for the feedback docs (small set -> driver)
    fb_ids = sorted(set(base["doc_id"]))
    fb_set = pa.array(fb_ids)
    fb_rows = ex.map_batches(
        lambda t: t.filter(pa.compute.is_in(t.column("doc_id"), value_set=fb_set)),
        batch_format="pyarrow",
    ).to_pandas()
    # df only for the BOUNDED working vocabulary: feedback-doc terms +
    # the fixed query terms (never the corpus vocab)
    df_map = _df_for_terms(
        sf_dir, set(fb_rows["term"])
        | {t for ts in FIXED_QUERIES.values() for t in ts})

    def idf(term: str) -> float:
        df = df_map.get(term, 0)
        return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5)) if df else 0.0

    doc_vecs: dict[int, dict[str, float]] = {}
    for d, g in fb_rows.groupby("doc_id"):
        ws = {t: (1.0 + math.log10(tf)) * idf(t) for t, tf in zip(g["term"], g["tf"])}
        nrm = math.sqrt(sum(v * v for v in ws.values())) or 1.0
        doc_vecs[int(d)] = {t: v / nrm for t, v in ws.items()}

    # expanded vectors for ALL queries, then ONE distributed scoring job
    # (the per-query-job loop re-ran the full pass per query)
    qvecs: dict[str, dict[str, float]] = {}
    for qid, terms in FIXED_QUERIES.items():
        qw = {t: (1.0 + math.log10(1)) * idf(t) for t in terms if df_map.get(t)}
        nrm = math.sqrt(sum(v * v for v in qw.values())) or 1.0
        qvec = {t: alpha * v / nrm for t, v in qw.items()}
        fb = base[base["qid"] == qid]["doc_id"].tolist()
        for d in fb:
            for t, v in doc_vecs.get(int(d), {}).items():
                qvec[t] = qvec.get(t, 0.0) + beta * v / max(1, len(fb))
        qvecs[qid] = qvec
    term_to_qw: dict[str, list[tuple[str, float]]] = {}
    for qid, qvec in qvecs.items():
        for t, w in qvec.items():
            term_to_qw.setdefault(t, []).append((qid, idf(t) * w))
    all_qterms = pa.array(sorted(term_to_qw))

    def score(tb: pa.Table) -> pa.Table:
        tb = tb.filter(pa.compute.is_in(tb.column("term"), value_set=all_qterms))
        if tb.num_rows == 0:
            return pa.table({"qid": pa.array([], pa.string()),
                             "doc_id": pa.array([], pa.int64()),
                             "c": pa.array([], pa.float64())})
        tfv = tb.column("tf").to_numpy(zero_copy_only=False).astype(np.float64)
        terms_l = tb.column("term").to_pylist()
        docs = tb.column("doc_id").to_numpy(zero_copy_only=False)
        tfw = 1.0 + np.log10(tfv)
        out_q, out_d, out_c = [], [], []
        for i, t in enumerate(terms_l):
            for qid, w in term_to_qw[t]:
                out_q.append(qid)
                out_d.append(int(docs[i]))
                out_c.append(tfw[i] * w)
        return pa.table({
            "qid": pa.array(out_q, pa.string()),
            "doc_id": pa.array(out_d, pa.int64()),
            "c": pa.array(out_c, pa.float64()),
        })

    from ray.data.aggregate import Sum

    sc = ex.map_batches(score, batch_format="pyarrow") \
           .groupby(["qid", "doc_id"]).aggregate(Sum("c", alias_name="score")).to_pandas()
    rows = []
    # rank on the 4-dp-rounded score: distributed Sum aggregates in
    # arbitrary block order, so raw floats carry summation-order noise
    # in the last bits — ties must break deterministically (doc_id asc)
    sc["score"] = sc["score"].map(round4)
    for qid in FIXED_QUERIES:
        g = sc[sc["qid"] == qid].sort_values(
            ["score", "doc_id"], ascending=[False, True]).head(k)
        for rank, (_, r) in enumerate(g.iterrows(), 1):
            rows.append((qid, rank, int(r["doc_id"]), float(r["score"])))
    return pd.DataFrame(rows, columns=["qid", "rank", "doc_id", "score"])


def _rocchio_explicit_vectors(sf_dir: str, alpha: float = 1.0,
                              beta: float = 0.75, gamma: float = 0.15,
                              n_nonrel: int = 10):
    """(clamped expanded query vectors, original normalized query
    vectors, memoized exploded ds, idf fn) for the explicit-feedback
    Rocchio family — the full three-term formula (rocchio.py:248-276)
    over D_r = qrels grade-2 docs / D_nr = TF-IDF top-10 grade-0 docs."""
    from ray.data.aggregate import Count

    n_docs, _ = _corpus_stats(sf_dir)
    base = tfidf_topk(sf_dir, k=n_nonrel)
    ex = _exploded_ds(sf_dir).materialize()

    # graded qrels (the eval_metrics contract)
    qterms_all = sorted({t for ts in FIXED_QUERIES.values() for t in ts})
    per_doc = ex.map_batches(
        lambda t: t.filter(pa.compute.is_in(t.column("term"),
                                            value_set=pa.array(qterms_all))),
        batch_format="pyarrow",
    ).groupby(["doc_id", "term"]).aggregate(Count(alias_name="n")).to_pandas()
    doc_terms: dict[int, set[str]] = {}
    for d, t in zip(per_doc["doc_id"], per_doc["term"]):
        doc_terms.setdefault(int(d), set()).add(t)
    qrels = _grade_qrels(doc_terms)
    rel = {qid: sorted(d for d, g in qq.items() if g == 2)
           for qid, qq in qrels.items()}
    nonrel = {qid: sorted(
        int(d) for d in base[base["qid"] == qid]["doc_id"]
        if int(d) not in qrels[qid]) for qid in FIXED_QUERIES}

    need = sorted({d for ds_ in rel.values() for d in ds_}
                  | {d for ds_ in nonrel.values() for d in ds_})
    need_set = pa.array(need)
    fb_rows = ex.map_batches(
        lambda t: t.filter(pa.compute.is_in(t.column("doc_id"), value_set=need_set)),
        batch_format="pyarrow",
    ).to_pandas()
    # bounded df resolve: feedback-doc terms + the fixed query terms
    df_map = _df_for_terms(sf_dir, set(fb_rows["term"]) | set(qterms_all))

    def idf(term: str) -> float:
        df = df_map.get(term, 0)
        return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5)) if df else 0.0

    doc_vecs: dict[int, dict[str, float]] = {}
    for d, g in fb_rows.groupby("doc_id"):
        ws = {t: (1.0 + math.log10(tf)) * idf(t) for t, tf in zip(g["term"], g["tf"])}
        nrm = math.sqrt(sum(v * v for v in ws.values())) or 1.0
        doc_vecs[int(d)] = {t: v / nrm for t, v in ws.items()}

    qvecs: dict[str, dict[str, float]] = {}
    qorig: dict[str, dict[str, float]] = {}
    for qid, terms in FIXED_QUERIES.items():
        qw = {t: idf(t) for t in terms if df_map.get(t)}
        nrm = math.sqrt(sum(v * v for v in qw.values())) or 1.0
        qorig[qid] = {t: v / nrm for t, v in qw.items()}
        qvec = {t: alpha * v for t, v in qorig[qid].items()}
        for d in rel[qid]:
            for t, v in doc_vecs.get(int(d), {}).items():
                qvec[t] = qvec.get(t, 0.0) + beta * v / max(1, len(rel[qid]))
        for d in nonrel[qid]:
            for t, v in doc_vecs.get(int(d), {}).items():
                qvec[t] = qvec.get(t, 0.0) - gamma * v / max(1, len(nonrel[qid]))
        # clamp: Rocchio can go negative after the gamma term (rocchio.py:272-275)
        qvecs[qid] = {t: max(0.0, v) for t, v in qvec.items()}
    return qvecs, qorig, ex, idf


def rocchio_explicit(sf_dir: str, k: int = 10, alpha: float = 1.0,
                     beta: float = 0.75, gamma: float = 0.15,
                     n_nonrel: int = 10) -> pd.DataFrame:
    """EXPLICIT-feedback Rocchio with the full three-term formula
    (rocchio.py:248-276: q' = alpha*q + beta*centroid(D_r) -
    gamma*centroid(D_nr), negative weights clamped to 0 at :272-275;
    the expand_query.py:174-268 explicit protocol, gamma=0.15 default
    rocchio.py:100).

    D_r = the synthetic qrels' grade-2 docs (docs containing ALL the
    query's terms — the eval_metrics contract); D_nr = the TF-IDF
    top-10 docs with grade 0 (retrieved but judged non-relevant).
    Rescoring and canonical rank as rocchio_topk."""
    qvecs, _, ex, idf = _rocchio_explicit_vectors(sf_dir, alpha, beta,
                                                  gamma, n_nonrel)

    term_to_qw: dict[str, list[tuple[str, float]]] = {}
    for qid, qvec in qvecs.items():
        for t, w in qvec.items():
            if w > 0.0:
                term_to_qw.setdefault(t, []).append((qid, idf(t) * w))
    all_qterms = pa.array(sorted(term_to_qw))

    def score(tb: pa.Table) -> pa.Table:
        tb = tb.filter(pa.compute.is_in(tb.column("term"), value_set=all_qterms))
        if tb.num_rows == 0:
            return pa.table({"qid": pa.array([], pa.string()),
                             "doc_id": pa.array([], pa.int64()),
                             "c": pa.array([], pa.float64())})
        tfv = tb.column("tf").to_numpy(zero_copy_only=False).astype(np.float64)
        terms_l = tb.column("term").to_pylist()
        docs = tb.column("doc_id").to_numpy(zero_copy_only=False)
        tfw = 1.0 + np.log10(tfv)
        out_q, out_d, out_c = [], [], []
        for i, t in enumerate(terms_l):
            for qid, w in term_to_qw[t]:
                out_q.append(qid)
                out_d.append(int(docs[i]))
                out_c.append(tfw[i] * w)
        return pa.table({
            "qid": pa.array(out_q, pa.string()),
            "doc_id": pa.array(out_d, pa.int64()),
            "c": pa.array(out_c, pa.float64()),
        })

    from ray.data.aggregate import Sum

    sc = ex.map_batches(score, batch_format="pyarrow") \
           .groupby(["qid", "doc_id"]).aggregate(Sum("c", alias_name="score")).to_pandas()
    sc["score"] = sc["score"].map(round4)
    rows = []
    for qid in FIXED_QUERIES:
        g = sc[sc["qid"] == qid].sort_values(
            ["score", "doc_id"], ascending=[False, True]).head(k)
        for rank, (_, r) in enumerate(g.iterrows(), 1):
            rows.append((qid, rank, int(r["doc_id"]), float(r["score"])))
    return pd.DataFrame(rows, columns=["qid", "rank", "doc_id", "score"])


def rocchio_expansion_terms(sf_dir: str, top_n: int = 10) -> pd.DataFrame:
    """The expander's QUERY-EXPANSION output (rocchio.py:278-333):
    candidates = terms not in the original query with weight >=
    min_term_weight (0.1, :102), sorted by weight desc (term asc
    pinned), top max_expansion_terms (10, :101) — reduced only under a
    query-drift warning (cosine distance original-vs-expanded > 0.7,
    :85; measured ~0.11 on this corpus so the guard never fires; the
    SQL twin replicates the drift computation and the CASE anyway).
    Decision keys (weight threshold/order) rounded 9dp both sides."""
    qvecs, qorig, _, _ = _rocchio_explicit_vectors(sf_dir)
    rows = []
    for qid in sorted(FIXED_QUERIES):
        qv, qo = qvecs[qid], qorig[qid]
        common = set(qo) & set(qv)
        n1 = math.sqrt(sum(v * v for v in qo.values()))
        n2 = math.sqrt(sum(v * v for v in qv.values()))
        if common and n1 and n2:
            dot = sum(qo[t] * qv[t] for t in common)
            drift = 1.0 - dot / (n1 * n2)
        else:
            drift = 1.0
        max_terms = top_n if drift <= 0.7 else max(1, int(top_n * 0.7 / drift))
        cands = [(t, v) for t, v in qv.items()
                 if t not in qo and round(v, 9) >= 0.1]
        cands.sort(key=lambda x: (-round(x[1], 9), x[0]))
        for r, (t, v) in enumerate(cands[:max_terms], 1):
            rows.append((qid, r, t, round4(v), round4(drift)))
    return pd.DataFrame(rows, columns=["qid", "rank", "term", "weight", "drift"])


# ------------------------------------------------------------------ quality / counts

def doc_quality(sf_dir: str):
    """Integer quality features per doc (exact-hashable: no float ratios):
    n_tokens (unclamped), n_distinct, n_stop ('the'/'a'), sum_token_len."""
    toks = _tokens_ds(sf_dir)

    def q(t: pa.Table) -> pa.Table:
        n_tok, n_dis, n_stop, s_len = [], [], [], []
        for row in t.to_pylist():
            terms, tfs = row["terms"], row["tfs"]
            n_tok.append(int(sum(tfs)))
            n_dis.append(len(terms))
            n_stop.append(int(sum(tf for tm, tf in zip(terms, tfs) if tm in ("the", "a"))))
            s_len.append(int(sum(len(tm) * tf for tm, tf in zip(terms, tfs))))
        return pa.table({
            "doc_id": t.column("doc_id"),
            "n_tokens": pa.array(n_tok, pa.int64()),
            "n_distinct": pa.array(n_dis, pa.int64()),
            "n_stop": pa.array(n_stop, pa.int64()),
            "sum_token_len": pa.array(s_len, pa.int64()),
        })

    return toks.map_batches(q, batch_format="pyarrow")


def token_counts(sf_dir: str):
    """Whitespace + BPE-ish subword token counts per doc."""
    from ..stages.textstats import TokenCountStage

    return _docs_ds(sf_dir, ["doc_id", "text"]).map_batches(
        TokenCountStage(text_col="text"), batch_format="pyarrow")


def lang_id(sf_dir: str):
    """Heuristic language ID (rows-only check; unit-tested separately)."""
    from ..stages.textstats import LangIdStage

    return _docs_ds(sf_dir, ["doc_id", "text"]).map_batches(
        LangIdStage(text_col="text"), batch_format="pyarrow")


def fingerprints(sf_dir: str):
    """SimHash64 + winnowed fingerprints per doc, oracle-checked.

    The 64-bit values travel as zero-padded hex STRINGS in this entry:
    uint64 > 2^63 round-trips through pandas/DuckDB as float64 and loses
    low bits, so exact-hash comparison needs a lossless encoding."""
    from ..stages.textstats import FingerprintStage

    def to_hex(t: pa.Table) -> pa.Table:
        sh = t.column("simhash").to_numpy(zero_copy_only=False)
        mf = t.column("min_fingerprint").to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": t.column("doc_id"),
            "simhash": pa.array([format(int(x), "016x") for x in sh], pa.string()),
            "n_fingerprints": t.column("n_fingerprints"),
            "min_fingerprint": pa.array([format(int(x), "016x") for x in mf], pa.string()),
        })

    return _docs_ds(sf_dir, ["doc_id", "text"]).map_batches(
        FingerprintStage(text_col="text"), batch_format="pyarrow") \
        .map_batches(to_hex, batch_format="pyarrow")


# ------------------------------------------------------------------ NER

def _ner_ds(sf_dir: str):
    from ..stages.ner import NERStage

    return _docs_ds(sf_dir, ["doc_id", "text"]).map_batches(
        NERStage(text_col="text"), batch_format="pyarrow")


def ner_entities(sf_dir: str):
    """Flat entity stream: (doc_id, pos, start_char, ent_text, ent_type)
    — gazetteer extraction (ner_extractor.py:185-298 extract/extract_batch
    with the dictionary fallback; see functions/ner.py)."""
    return _ner_ds(sf_dir)


def ner_type_stats(sf_dir: str) -> pd.DataFrame:
    """entity_statistics parity (ner_extractor.py:456-529): per type,
    entity count, unique surface forms, and percentage distribution."""
    per_text = _sum_by(_ner_ds(sf_dir), ("ent_type", "ent_text"),
                       (), counts=("n",)).to_pandas()
    g = per_text.groupby("ent_type", as_index=False).agg(
        n_entities=("n", "sum"), n_unique_texts=("ent_text", "nunique"))
    total = int(g["n_entities"].sum())
    g["pct"] = (100.0 * g["n_entities"] / total).map(round4) if total \
        else 0.0
    return g.sort_values("ent_type").reset_index(drop=True)[
        ["ent_type", "n_entities", "n_unique_texts", "pct"]]


def ner_top_entities(sf_dir: str, k: int = 5) -> pd.DataFrame:
    """most_common_entities parity (ner_extractor.py:520-563), per type:
    top-k surface forms by count, canonical ties (count desc, text asc)."""
    per_text = _sum_by(_ner_ds(sf_dir), ("ent_type", "ent_text"),
                       (), counts=("n",)).to_pandas()
    per_text = per_text.sort_values(["ent_type", "n", "ent_text"],
                                    ascending=[True, False, True])
    per_text["rank"] = per_text.groupby("ent_type").cumcount() + 1
    out = per_text[per_text["rank"] <= k].reset_index(drop=True)
    out["rank"] = out["rank"].astype(np.int64)
    return out[["ent_type", "rank", "ent_text", "n"]]


# ------------------------------------------------------------------ dense retrieval

def dense_retrieval(sf_dir: str, dim: int = 32, k: int = 10) -> pd.DataFrame:
    """Bi-encoder dense retrieval (bert_retrieval.py:233-355 semantics)
    with the feature-hashing encoder: encode corpus (actor stage) ->
    broadcast encoded queries -> partial cosine top-k -> tiny merge.
    (qid, rank, doc_id, score) ranked on round4(cosine), doc_id asc."""
    from ..stages.dense import HashingEncoderStage, dense_topk, encode_text

    encoded = _docs_ds(sf_dir, ["doc_id", "text"]).map_batches(
        HashingEncoderStage(dim=dim, text_col="text"),
        batch_format="pyarrow")
    qids = sorted(FIXED_QUERIES)
    qvecs = np.stack([encode_text(" ".join(FIXED_QUERIES[q]), dim)
                      for q in qids])
    return dense_topk(encoded, qvecs, qids, k=k)


def keybert_keywords(sf_dir: str, k: int = 5, dim: int = 32,
                     diversity: float = 0.5) -> pd.DataFrame:
    """Per-doc KeyBERT keyphrases (keybert_extractor.py:130-295 —
    1..3-gram candidates, embed doc + candidates, cosine, MMR
    diversity 0.5) on the feature-hashing encoder (stages/dense.py
    convention), so the whole path incl. the greedy MMR loop is
    oracle-checked.  Output (doc_id, rank, phrase, score); rank =
    MMR selection order, score = round4 cosine to the doc."""
    from ..functions.keybert import keybert_extract
    from ..functions.stopwords import load_stopwords

    stops = load_stopwords("en")
    toks = _tokens_ds(sf_dir, with_positions=True)

    def kw(t: pa.Table) -> pa.Table:
        doc_out, rank_out, phrase_out, score_out = [], [], [], []
        cache: dict[str, tuple[int, int]] = {}
        for row in t.to_pylist():
            seq: list[tuple[int, str]] = []
            for term, poss in zip(row["terms"], row["positions"]):
                seq.extend((p, term) for p in poss)
            seq.sort()
            picks = keybert_extract([w for _, w in seq], stops, dim=dim,
                                    top_n=k, diversity=diversity, _cache=cache)
            for rank, (phrase, score) in enumerate(picks, 1):
                doc_out.append(row["doc_id"])
                rank_out.append(rank)
                phrase_out.append(phrase)
                score_out.append(score)
        return pa.table({
            "doc_id": pa.array(doc_out, pa.int64()),
            "rank": pa.array(rank_out, pa.int64()),
            "phrase": pa.array(phrase_out, pa.string()),
            "score": pa.array(score_out, pa.float64()),
        })

    return toks.map_batches(kw, batch_format="pyarrow").to_pandas() \
               .sort_values(["doc_id", "rank"]).reset_index(drop=True)


# ------------------------------------------------------------------ dedup

def dedup_exact(sf_dir: str):
    """(content_hash, keeper_doc_id, n_docs) — exact dedup groups."""
    from ..stages.dedup import exact_dedup_groups

    return exact_dedup_groups(_docs_ds(sf_dir, ["doc_id", "text"]))


def dedup_minhash(sf_dir: str, threshold: float = 0.8) -> pd.DataFrame:
    """MinHash-LSH near-dup candidate pairs (rows-only check)."""
    from ..stages.dedup import minhash_pairs

    return minhash_pairs(_docs_ds(sf_dir, ["doc_id", "text"]),
                         engine="whitespace", threshold=threshold)


def dedup_simhash(sf_dir: str) -> pd.DataFrame:
    """SimHash Hamming<=3 near-dup pairs (rows-only check)."""
    from ..stages.dedup import simhash_pairs

    return simhash_pairs(_docs_ds(sf_dir, ["doc_id", "text"]), engine="whitespace")


def dedup_ngram_jaccard(sf_dir: str, threshold: float = 0.6) -> pd.DataFrame:
    """Exact word-3-gram Jaccard pairs >= threshold, with MinHash-LSH
    candidate generation (est >= threshold-0.2) and exact verification.

    Shingling runs DISTRIBUTED over only the candidate docs (the doc-id
    set is broadcast into a filter; non-candidates never leave the
    scan); only the O(duplicates) candidate shingle sets are collected
    for the pair verify."""
    from ..functions.hashing import jaccard, shingles
    from ..functions.tokenize import get_tokenizer
    from ..functions.textnorm import normalize_text
    from ..stages.dedup import minhash_pairs

    cands = minhash_pairs(_docs_ds(sf_dir, ["doc_id", "text"]),
                          engine="whitespace", threshold=max(0.0, threshold - 0.2))
    if cands.empty:
        return pd.DataFrame({"doc_a": pd.Series(dtype=np.int64),
                             "doc_b": pd.Series(dtype=np.int64),
                             "jaccard": pd.Series(dtype=np.float64)})
    ids = sorted(set(cands["doc_a"]) | set(cands["doc_b"]))
    idset = pa.array(np.asarray(ids, dtype=np.int64))

    def shingle_batch(t: pa.Table) -> pa.Table:
        t = t.filter(pa.compute.is_in(t.column("doc_id"), value_set=idset))
        tok = get_tokenizer("whitespace")
        out_ids, out_sh = [], []
        for row in t.to_pylist():
            out_ids.append(int(row["doc_id"]))
            # sorted-unique uint64 shingles, carried as int64 bit-view
            out_sh.append(shingles(tok(normalize_text(row["text"] or "")), 3)
                          .view(np.int64).tolist())
        return pa.table({"doc_id": pa.array(out_ids, pa.int64()),
                         "sh": pa.array(out_sh, pa.list_(pa.int64()))})

    rows_sh = _docs_ds(sf_dir, ["doc_id", "text"]).map_batches(
        shingle_batch, batch_format="pyarrow").take_all()
    sh = {int(r["doc_id"]): np.asarray(r["sh"], dtype=np.int64).view(np.uint64)
          for r in rows_sh}
    rows = []
    for a, b in zip(cands["doc_a"], cands["doc_b"]):
        j = jaccard(sh[int(a)], sh[int(b)])
        if j >= threshold:
            rows.append((int(a), int(b), round4(j)))
    return pd.DataFrame(rows, columns=["doc_a", "doc_b", "jaccard"])


def dedup_embedding(sf_dir: str, threshold: float = 0.45, n_blocks: int = 4) -> pd.DataFrame:
    """EXACT embedding-cosine near-dup pairs (oracle-checked against a
    DuckDB self-join).  Distributed block-pair join — see
    stages/dedup.py:embedding_dup_pairs for the N*B shuffle design."""
    import ray.data as rd

    from ..stages.dedup import embedding_dup_pairs

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return embedding_dup_pairs(ds, threshold=threshold, n_blocks=n_blocks)


def dedup_embedding_lsh(sf_dir: str, threshold: float = 0.45) -> pd.DataFrame:
    """Approximate (banded hyperplane LSH) embedding near-dup — the scale
    path; rows-only driver check, recall-vs-exact asserted in units."""
    import ray.data as rd

    from ..stages.dedup import embedding_dup_pairs_lsh

    q, _ = _query_vectors(sf_dir, 1)
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return embedding_dup_pairs_lsh(ds, dim=q.shape[1], threshold=threshold)


# ------------------------------------------------------------------ facets / browse

def facet_filter_multi(sf_dir: str) -> pd.DataFrame:
    """Composable multi-condition facet filtering (the reference's
    FacetFilter engine, facet_filter.py:251-458: AND across conditions,
    OR within a field via IN) — five operator families exercised at
    once: IN (multi-select), STARTS_WITH (prefix/hierarchy), RANGE
    (lexicographic, the ISO-date semantics), GTE (numeric-preferred),
    CONTAINS (substring).

    Distributed shape: the FacetFilter is a tiny driver object closed
    over by a per-batch mask — each task emits only survivors, the
    Dataset streams.  matches() is kept branch-identical to the
    reference (string normalization, numeric fallback); every condition
    used here also has the vectorized pushdown form the SQL twin shows."""
    from ..functions.facetfilter import FacetFilter, FilterCondition, range_filter, term_filter

    ff = (FacetFilter()
          .add_condition(term_filter("lang", ["en", "es"]))
          .add_condition(FilterCondition("source", "starts_with", "src"))
          .add_condition(range_filter("source", "src0", "src3"))
          .add_condition(FilterCondition("n_chars", "gte", 200))
          .add_condition(FilterCondition("text", "contains", "spark")))

    def mask(t: pa.Table) -> pa.Table:
        rows = t.to_pylist()
        keep = [i for i, r in enumerate(rows) if ff.matches_row(r)]
        return t.take(pa.array(keep, pa.int64()))

    out = _docs_ds(sf_dir, ["doc_id", "text", "source", "lang", "n_chars"]) \
        .map_batches(mask, batch_format="pyarrow").to_pandas()
    return (out[["doc_id", "source", "lang", "n_chars"]]
            .sort_values("doc_id").reset_index(drop=True))


TAX_CATS = ["aipl", "政治", "國際", "財經", "AI科技", "3C", "生活", "娛樂",
            "體育", "健康", "兩岸", "zzz"]
TAX_SRCS = ["CNA", "yahoo", "LTN", "NextApple", "SETN", "UDN", "PTS",
            "dcard", "misc"]


def taxonomy_normalize(sf_dir: str) -> pd.DataFrame:
    """Source/topic taxonomy normalization (taxonomy.py:118-186) as a
    per-batch map over the corpus.  The oracle tables carry no raw
    category/origin metadata, so the fixtures derive deterministically
    per doc (mirrored in SQL): category = TAX_CATS[doc_id % 12]
    (exercising CJK aliases, exact-vs-lower lookup and the unknown
    fallback), source = TAX_SRCS[doc_id % 9] (exercising the yahoo/cna
    casing fixes and the label fallback), origin_path = a
    yahoo_finance file for doc_id % 10 == 0 (the filename-prefix
    override that outranks the category)."""
    from ..functions.taxonomy import classify_category, normalize_source, TOPIC_LABELS

    def tax(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        out = {k: [] for k in ("doc_id", "source", "source_label",
                               "taxonomy_topic", "taxonomy_label",
                               "taxonomy_path")}
        for d in ids:
            code, _, label = normalize_source(TAX_SRCS[d % 9])
            origin = "data/raw/yahoo_finance_2024.jsonl" if d % 10 == 0 else None
            topic, leaf = classify_category(TAX_CATS[d % 12], None, origin)
            out["doc_id"].append(d)
            out["source"].append(code)
            out["source_label"].append(label)
            out["taxonomy_topic"].append(topic)
            out["taxonomy_label"].append(TOPIC_LABELS.get(topic, TOPIC_LABELS["other"]))
            out["taxonomy_path"].append(f"news/{topic}/{leaf}")
        return pa.table({"doc_id": pa.array(out["doc_id"], pa.int64()),
                         **{k: pa.array(out[k], pa.string())
                            for k in list(out)[1:]}})

    res = _docs_ds(sf_dir, ["doc_id"]).map_batches(tax, batch_format="pyarrow")
    return res.to_pandas().sort_values("doc_id").reset_index(drop=True)


def _tfidf_weights_ds(sf_dir: str):
    """(doc_id, term, w) stream of L2-normalized app-TF-IDF weights
    (w = (1+log10(tf)) * ln(1+(N-df+0.5)/(df+0.5)), per-doc L2 norm —
    index_service.py:297-306), the doc_hac weights map generalized to
    the full corpus.

    df comes from a Dataset hash join against the distributed df table
    and the per-doc norm from a keyed partial-sum joined back on doc_id
    — vectorized per batch, no driver vocab dict anywhere."""
    n_corpus, _ = _corpus_stats(sf_dir)
    idf_vec = _app_idf_vec(n_corpus)

    def unnorm(t: pa.Table) -> pa.Table:
        tf = t.column("tf").to_numpy(zero_copy_only=False).astype(np.float64)
        w = (1.0 + np.log10(tf)) \
            * idf_vec(t.column("df").to_numpy(zero_copy_only=False))
        return pa.table({"term": t.column("term"),
                         "doc_id": t.column("doc_id"),
                         "w": pa.array(w, pa.float64()),
                         "w2": pa.array(w * w, pa.float64())})

    def norm(t: pa.Table) -> pa.Table:
        nrm = np.sqrt(t.column("w2").to_numpy(zero_copy_only=False))
        nrm[nrm == 0.0] = 1.0
        w = t.column("w").to_numpy(zero_copy_only=False) / nrm
        return pa.table({"term": t.column("term"),
                         "doc_id": t.column("doc_id"),
                         "w": pa.array(w, pa.float64())})

    def build():
        un = _ex_df_ds(sf_dir) \
            .map_batches(unnorm, batch_format="pyarrow").materialize()
        norms = _sum_by(un.select_columns(["doc_id", "w2"]),
                        ("doc_id",), ("w2",))
        return un.select_columns(["term", "doc_id", "w"]) \
            .join(norms, "inner", num_partitions=8, on=("doc_id",)) \
            .map_batches(norm, batch_format="pyarrow").materialize()

    return _memo(("tfidf_weights", sf_dir), build)


def _cluster_centroids(sf_dir: str, k: int = 6) -> tuple[pd.DataFrame, pd.DataFrame, "object"]:
    """(cent, sizes, assign_ds): per-cluster mean TF-IDF centroid terms
    over the standard k-means(6) document clustering (the same
    clustering backbone as bertopic/embedding_kmeans; cluster centroid
    = mean of member doc vectors, doc_cluster.py:599-623).  Centroid
    weights carry a 9dp-rounded ranking key so FP summation order
    cannot flip a rank (the doc_hac convention)."""
    from ..stages.ann import assign_to_centroids
    from .bertopic import fit_bertopic

    m = fit_bertopic(sf_dir, k=k)
    import ray.data as rd

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    assign = assign_to_centroids(emb, m.centroids).map_batches(
        lambda t: pa.table({"doc_id": t.column("vec_id"),
                            "topic": t.column("cluster")}),
        batch_format="pyarrow")
    joined = _tfidf_weights_ds(sf_dir).join(assign, "inner", num_partitions=8,
                                            on=("doc_id",))
    cent = _sum_by(joined, ("topic", "term"), ("w",)).to_pandas()
    sizes = m.topic_sizes()
    szmap = dict(zip(sizes["topic"], sizes["size"]))
    cent["w"] = cent["w"] / cent["topic"].map(szmap)
    cent["w9"] = cent["w"].map(lambda x: round(x, 9))
    return cent, sizes, joined


def cluster_topic_cards(sf_dir: str, k: int = 6, n_keywords: int = 8) -> pd.DataFrame:
    """Topic cards over document clusters (cluster_topic_service.py:
    130-216): per cluster the size, the label = top-3 centroid terms
    joined ' / ', and the top-8 centroid keywords with weights."""
    cent, sizes, _ = _cluster_centroids(sf_dir, k)
    cent = cent.sort_values(["topic", "w9", "term"],
                            ascending=[True, False, True],
                            kind="mergesort").reset_index(drop=True)
    cent["rank"] = cent.groupby("topic").cumcount() + 1
    labels = (cent[cent["rank"] <= 3].sort_values(["topic", "rank"])
              .groupby("topic")["term"]
              .agg(lambda ts: " / ".join(ts)).to_dict())
    out = cent[cent["rank"] <= n_keywords].copy()
    szmap = dict(zip(sizes["topic"], sizes["size"]))
    out["size"] = out["topic"].map(szmap).astype(np.int64)
    out["label"] = out["topic"].map(labels)
    out["weight"] = out["w"].map(round4)
    out = out.rename(columns={"topic": "cluster_id"})
    return out[["cluster_id", "size", "label", "rank", "term",
                "weight"]].reset_index(drop=True)


def cluster_representatives(sf_dir: str, k: int = 6, limit: int = 6) -> pd.DataFrame:
    """Representative documents nearest each cluster's TF-IDF centroid
    (cluster_topic_service.py:157-194: cosine(doc vector, centroid),
    top-6).  Cosine over the sparse product: the weights stream joins
    the (small, broadcast) centroid frame per batch; only docs sharing
    >= 1 centroid term participate (a zero-dot doc can never reach the
    top-6 of these cluster sizes; pinned identically in the SQL
    twin)."""
    import ray

    cent, _, joined = _cluster_centroids(sf_dir, k)
    cmap_ref = ray.put({(int(t), s): float(w)
                        for t, s, w in zip(cent["topic"], cent["term"], cent["w"])})
    cnorm = {int(t): math.sqrt(v) for t, v in
             cent.groupby("topic")["w"].apply(lambda s: float((s ** 2).sum())).items()}

    def dots(df: pd.DataFrame) -> pd.DataFrame:
        cmap = ray.get(cmap_ref)
        wc = np.array([cmap.get((int(t), s), 0.0)
                       for t, s in zip(df["topic"], df["term"])])
        df = df.assign(dw=df["w"] * wc, w2=df["w"] ** 2)
        return df.groupby(["doc_id", "topic"], as_index=False)[["dw", "w2"]].sum()

    agg = joined.map_batches(dots, batch_format="pandas").to_pandas()
    agg = agg.groupby(["doc_id", "topic"], as_index=False)[["dw", "w2"]].sum()
    agg = agg[agg["dw"] > 0].copy()
    agg["sim"] = agg["dw"] / (np.sqrt(agg["w2"]) * agg["topic"].map(cnorm))
    agg["sim9"] = agg["sim"].map(lambda x: round(x, 9))
    agg = agg.sort_values(["topic", "sim9", "doc_id"],
                          ascending=[True, False, True],
                          kind="mergesort").reset_index(drop=True)
    agg["rank"] = agg.groupby("topic").cumcount() + 1
    out = agg[agg["rank"] <= limit].copy()
    out["similarity"] = out["sim"].map(round4)
    out = out.rename(columns={"topic": "cluster_id"})
    return out[["cluster_id", "rank", "doc_id", "similarity"]].reset_index(drop=True)


def document_detail(sf_dir: str, n_docs: int = 15) -> pd.DataFrame:
    """Document-detail assembly (document_detail_service.py:32-136):
    per doc the availability flag, the lead-2 summary and the top-3
    per-doc TF-IDF keywords (tf.idf against corpus-wide df, the
    search_service.py:1004-1029 keyword scoring) — the service's data
    core over the first ``n_docs`` docs (kwic / related / taxonomy are
    covered by their standalone oracle-checked entries).  Keyword rank
    keys rounded 9dp both sides."""
    from ..functions.snippets import lead_k_summary

    n_corpus, _ = _corpus_stats(sf_dir)

    def s(t: pa.Table) -> pa.Table:
        t = t.filter(pa.compute.less(t.column("doc_id"), n_docs))
        outs = [lead_k_summary(x or "", 2) for x in t.column("text").to_pylist()]
        return pa.table({
            "doc_id": t.column("doc_id"),
            "available": pa.array([1 if x else 0 for x in outs], pa.int64()),
            "summary": pa.array(outs, pa.string()),
        })

    det = _docs_ds(sf_dir, ["doc_id", "text"]).map_batches(
        s, batch_format="pyarrow").to_pandas()

    ex = _exploded_ds(sf_dir).map_batches(
        lambda t: t.filter(pa.compute.less(t.column("doc_id"), n_docs)),
        batch_format="pyarrow").to_pandas()
    # df only for the selected docs' vocabulary (bounded)
    df_map = _df_for_terms(sf_dir, ex["term"])
    ex["w"] = [(1.0 + math.log10(tf))
               * math.log(1.0 + (n_corpus - df_map[t] + 0.5) / (df_map[t] + 0.5))
               for t, tf in zip(ex["term"], ex["tf"])]
    ex["w9"] = ex["w"].map(lambda x: round(x, 9))
    ex = ex.sort_values(["doc_id", "w9", "term"],
                        ascending=[True, False, True],
                        kind="mergesort").reset_index(drop=True)
    ex["rank"] = ex.groupby("doc_id").cumcount() + 1
    kws = (ex[ex["rank"] <= 3].sort_values(["doc_id", "rank"])
           .groupby("doc_id")["term"].agg(lambda ts: "|".join(ts)).to_dict())
    det["keywords"] = det["doc_id"].map(lambda d: kws.get(int(d), ""))
    return det.sort_values("doc_id").reset_index(drop=True)[
        ["doc_id", "available", "summary", "keywords"]]


RELATED_DOC_ID = 0        # related_documents source doc
RELATED_TOPK = 5
RELATED_KW_K = 8          # _related_query tfidf keywords (search_service.py:898)
RELATED_DEPTH = 60        # search_top_k = max(50, top_k*12)
RELATED_RANKER_DEPTH = 300  # _search_hybrid ranker_topk = max(50, depth*5)
RELATED_CTYPE_MIN = 40    # content_type = 'long' if n_tokens > 40 (derived field)
# relation-boost weights (search_service.py:913-941)
REL_W_TOPIC, REL_W_CAT, REL_W_SRC, REL_W_CTYPE = 0.25, 0.18, 0.08, 0.05
REL_W_TAG, REL_W_TAG_CAP = 0.06, 0.18


def round6(x: float) -> float:
    """Half-away-from-zero to 6 places (matches DuckDB round)."""
    return math.floor(abs(x) * 1e6 + 0.5) / 1e6 * (1 if x >= 0 else -1)


def round9(x: float) -> float:
    return math.floor(abs(x) * 1e9 + 0.5) / 1e9 * (1 if x >= 0 else -1)


def _topic_code(source: str) -> str:
    """Derived taxonomy_topic: md5-hash group of the source (3 groups —
    coarser than source so same_topic != same_source; md5 convention
    mirrored in SQL)."""
    import hashlib

    g = int.from_bytes(hashlib.md5(source.encode("utf-8")).digest()[:8],
                       "big") % 3
    return f"g{g}"


def related_documents(sf_dir: str, doc_id: int = RELATED_DOC_ID,
                      k: int = RELATED_TOPK) -> pd.DataFrame:
    """Explainable related documents (search_service.py:803-948):
    related query = title + per-doc tfidf top-8 keywords + tags
    (:882-897, extract_keywords :1004-1029 = tf*idf, len>1) -> hybrid
    RRF search (0.65 BM25 / 0.35 TFIDF, k0=60, ranker depth 300 :268-295)
    at depth 60 -> field-boost rerank (:434-481) -> relation metadata
    boost (+0.25 topic / +0.18 category / +0.08 source / +0.05
    content_type / +min(0.06*tag_overlap, 0.18), :913-941) -> exclude
    the source doc -> top-5 with similarity = clamp(score/max_selected)
    and the relation-reason flags (:943-989).

    Fields derive deterministically (the field_boost_topk convention):
    title = first-5 filtered tokens, tags = {source}, category = lang,
    taxonomy_topic = md5-group of source, content_type = token-count
    band.  BM25 counts duplicate query terms multiply (bm25.py:228-231,
    the reference's query-tf proxy); TFIDF uses (1+log10 qtf).  Rank
    keys rounded 9dp both sides; boosts rounded 6dp (:941).

    Distributed shape: BM25/TFIDF scoring and the field boosts are the
    existing distributed stages; the fused/boosted candidate list is
    depth-bounded (<= 300 rows) driver-side, as the reference reranks
    its ranked list."""
    from collections import Counter

    from ..functions.textnorm import normalize_text
    from ..functions.tokenize import get_tokenizer

    n_docs, avgdl = _corpus_stats(sf_dir)
    tokenize = get_tokenizer("whitespace")

    srow = _docs_ds(sf_dir, ["doc_id", "text", "source", "lang"]) \
        .map_batches(lambda t: t.filter(
            pa.compute.equal(t.column("doc_id"), doc_id)),
            batch_format="pyarrow").take_all()[0]
    toks = tokenize(normalize_text(srow["text"] or ""))
    tfc = Counter(toks)
    # df only for the source doc's vocabulary + its source tag (bounded)
    df_map = _df_for_terms(sf_dir, set(tfc) | {srow["source"]})

    def idf_app(t: str) -> float:
        df = df_map.get(t, 0)
        return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5)) if df else 0.0

    kwsc = [(t, round9(c * idf_app(t))) for t, c in tfc.items() if len(t) > 1]
    kws = [t for t, _ in sorted(kwsc, key=lambda x: (-x[1], x[0]))[:RELATED_KW_K]]
    qtoks = toks[:5] + kws + [srow["source"]]
    mult = Counter(qtoks)

    # hybrid: BM25 + TFIDF each at ranker depth, RRF-fused to depth 60
    bm = _bm25_scores(sf_dir, n_docs, avgdl,
                      {t: ["rq"] * m for t, m in mult.items()}).to_pandas()
    bm["key"] = bm["score"].map(round9)
    bm = bm.sort_values(["key", "doc_id"], ascending=[False, True]) \
        .head(RELATED_RANKER_DEPTH).reset_index(drop=True)
    bm["r"] = np.arange(1, len(bm) + 1)

    qw = {t: (1.0 + math.log10(m)) * idf_app(t)
          for t, m in mult.items() if df_map.get(t)}
    nrm = math.sqrt(sum(v * v for v in qw.values()))
    qv = {t: v / nrm for t, v in qw.items()} if nrm else {}
    tfd = _tfidf_scores_for(sf_dir, {"rq": qv}).to_pandas()
    tfd["key"] = tfd["score"].map(round9)
    tfd = tfd.sort_values(["key", "doc_id"], ascending=[False, True]) \
        .head(RELATED_RANKER_DEPTH).reset_index(drop=True)
    tfd["r"] = np.arange(1, len(tfd) + 1)

    fused = bm[["doc_id", "r"]].merge(tfd[["doc_id", "r"]], on="doc_id",
                                      how="outer", suffixes=("_b", "_t"))
    fused["f"] = (RRF_W_BM25 / (RRF_K0 + fused["r_b"])).fillna(0.0) \
        + (RRF_W_TFIDF / (RRF_K0 + fused["r_t"])).fillna(0.0)
    cand = fused.sort_values(["f", "doc_id"], ascending=[False, True]) \
        .head(RELATED_DEPTH).reset_index(drop=True)
    ids = pa.array(sorted(int(x) for x in cand["doc_id"]))

    # field boosts for the related query (distributed per-doc stage)
    fb = _field_boosts_ds(sf_dir, {"rq": qtoks}).to_pandas()
    cand = cand.merge(fb[["doc_id", "boost"]], on="doc_id", how="left")
    cand["boost"] = cand["boost"].fillna(0.0)

    # candidate metadata + token counts (pruned distributed filters)
    meta = _docs_ds(sf_dir, ["doc_id", "source", "lang"]).map_batches(
        lambda t: t.filter(pa.compute.is_in(t.column("doc_id"), value_set=ids)),
        batch_format="pyarrow").to_pandas()
    nq = doc_quality(sf_dir).map_batches(
        lambda t: t.filter(pa.compute.is_in(t.column("doc_id"), value_set=ids))
        .select(["doc_id", "n_tokens"]), batch_format="pyarrow").to_pandas()
    cand = cand.merge(meta, on="doc_id").merge(nq, on="doc_id")

    ptopic, pcat, psrc = _topic_code(srow["source"]), srow["lang"], srow["source"]
    pctype = "long" if len(toks) > RELATED_CTYPE_MIN else "short"
    same_topic = cand["source"].map(_topic_code) == ptopic
    same_cat = cand["lang"] == pcat
    same_src = cand["source"] == psrc
    same_ctype = np.where(cand["n_tokens"] > RELATED_CTYPE_MIN,
                          "long", "short") == pctype
    rel = (REL_W_TOPIC * same_topic + REL_W_CAT * same_cat
           + REL_W_SRC * same_src + REL_W_CTYPE * same_ctype
           + np.minimum(REL_W_TAG * same_src, REL_W_TAG_CAP))
    cand["rel"] = [round6(x) for x in rel]
    cand["same_topic"] = same_topic.astype(np.int64)
    cand["same_category"] = same_cat.astype(np.int64)
    cand["same_source"] = same_src.astype(np.int64)
    cand = cand[cand["doc_id"] != doc_id].copy()
    cand["score"] = cand["f"] + cand["boost"] + cand["rel"]
    sel = cand.sort_values(["score", "doc_id"], ascending=[False, True]) \
        .head(k).reset_index(drop=True)
    mx = float(sel["score"].max()) or 1.0
    return pd.DataFrame({
        "rank": np.arange(1, len(sel) + 1, dtype=np.int64),
        "doc_id": sel["doc_id"].astype(np.int64),
        "score": sel["score"].map(round6),
        "similarity": sel["score"].map(
            lambda s: round6(min(1.0, max(0.0, s / mx)))),
        "relation_boost": sel["rel"],
        "same_topic": sel["same_topic"],
        "same_category": sel["same_category"],
        "same_source": sel["same_source"],
    })


def _field_matrix_ds(sf_dir: str):
    """(qid, doc_id, field, term, matched) Dataset — the ranking-
    diagnostics field-match matrix (ranking_diagnostics_service.py:
    190-280) for every fixed query x document x field, fields derived
    per the field_boost_topk convention (title = first-5 split tokens,
    tags = {source}, category = {lang}, content = all tokens).  Pure
    per-batch map over the documents scan."""
    from ..functions.textnorm import normalize_text

    qsets = {qid: list(dict.fromkeys(ts)) for qid, ts in FIXED_QUERIES.items()}
    fields = ("title", "tags", "category", "content")

    def m(t: pa.Table) -> pa.Table:
        out = {k: [] for k in ("qid", "doc_id", "field", "term", "matched")}
        for row in t.to_pylist():
            toks = normalize_text(row["text"] or "").split()
            title5, allset = set(toks[:5]), set(toks)
            member = {"title": lambda x: x in title5,
                      "tags": lambda x: x == row["source"],
                      "category": lambda x: x == row["lang"],
                      "content": lambda x: x in allset}
            for qid, terms in qsets.items():
                for f in fields:
                    for term in terms:
                        out["qid"].append(qid)
                        out["doc_id"].append(row["doc_id"])
                        out["field"].append(f)
                        out["term"].append(term)
                        out["matched"].append(1 if member[f](term) else 0)
        return pa.table({
            "qid": pa.array(out["qid"], pa.string()),
            "doc_id": pa.array(out["doc_id"], pa.int64()),
            "field": pa.array(out["field"], pa.string()),
            "term": pa.array(out["term"], pa.string()),
            "matched": pa.array(out["matched"], pa.int64())})

    return _docs_ds(sf_dir, ["doc_id", "text", "source", "lang"]) \
        .map_batches(m, batch_format="pyarrow")


def explain_field_matrix(sf_dir: str, n_docs: int = 20):
    """The field-match matrix rows for the first ``n_docs`` docs
    (ranking_diagnostics_service.py:250-280 flattened)."""
    return _field_matrix_ds(sf_dir).map_batches(
        lambda t: t.filter(pa.compute.less(t.column("doc_id"), n_docs)),
        batch_format="pyarrow")


def explain_coverage(sf_dir: str) -> pd.DataFrame:
    """(qid, doc_id, matched_terms, missing_terms, coverage_ratio) —
    _query_coverage (ranking_diagnostics_service.py:223-248): a query
    term is covered when ANY field matches it; term order = the query's
    unique-term order; ratio round6.  Aggregated from the distributed
    matrix via a per-batch shrink, assembled per doc driver-side
    (n_docs x n_queries rows)."""
    qsets = {qid: list(dict.fromkeys(ts)) for qid, ts in FIXED_QUERIES.items()}
    agg = _sum_by(_field_matrix_ds(sf_dir).select_columns(
        ["qid", "doc_id", "term", "matched"]),
        ("qid", "doc_id", "term"), ("matched",)).to_pandas()
    cov = {(q, d, t): (m > 0) for q, d, t, m in
           zip(agg["qid"], agg["doc_id"], agg["term"], agg["matched"])}
    doc_ids = sorted(agg["doc_id"].unique())
    rows = []
    for qid, terms in qsets.items():
        for d in doc_ids:
            hit = [t for t in terms if cov.get((qid, d, t))]
            miss = [t for t in terms if not cov.get((qid, d, t))]
            rows.append((qid, int(d), " ".join(hit), " ".join(miss),
                         round6((len(terms) - len(miss)) / len(terms))
                         if terms else 0.0))
    return pd.DataFrame(rows, columns=[
        "qid", "doc_id", "matched_terms", "missing_terms", "coverage_ratio"])


SUGGEST_QID = "q1"          # suggestions query = FIXED_QUERIES[q1]
SUGGEST_FUZZY_DIST = 1      # _fuzzy_expansion max_distance (search_service.py:394)
SUGGEST_CS_THRESHOLD = 0.72  # _csoundex_expansion (:407)
SUGGEST_CS_K = 8
ROCCHIO_APP_ALPHA, ROCCHIO_APP_BETA = 1.0, 0.75   # RocchioExpander defaults
ROCCHIO_APP_MAX_TERMS = 8    # app expander (index_service.py:390)
ROCCHIO_APP_MIN_W = 0.01
ROCCHIO_APP_MAX_DRIFT = 0.7
SUGGEST_FEEDBACK_K = 5       # expand_query top_k (search_service.py:587)


def search_suggestions(sf_dir: str, terms: list[str] | None = None) -> pd.DataFrame:
    """No-result fallback suggestions (search_service.py:750-801):
    up to four typed expansions of the query —

    - ``synonym``: vendored synonym-map hits not already in the query
      (text_quality.py:114-135; empty on this ASCII corpus — branch
      exercised by unit tests);
    - ``fuzzy``: per-term edit-distance<=1 vocabulary expansion
      (:384-395), emitted only when it differs from the query terms
      (identity on this corpus — no dist-1 vocab pairs exist);
    - ``csoundex``: per-term phonetic find_similar 0.72/top-8 (:397-411),
      first-wins dedup across terms;
    - ``rocchio``: expand_query PRF (:587-625) — BM25 top-5 feedback,
      tfidf doc vectors, query vector idf-or-1, the app expander
      (alpha=1, beta=0.75, max_terms=8, min_w=0.01,
      index_service.py:390) with the drift-guard CASE.

    Output (stype, rank, term) — one row per suggested term; a branch
    whose condition fails emits no rows (the reference omits the entry).
    Vocabulary scans (fuzzy/csoundex) and the BM25/tfidf feedback run
    distributed; only per-branch top-k term lists reach the driver."""
    from ..functions.csoundex import similarity as cs_similarity
    from ..functions.text_quality import synonym_terms

    terms = list(terms if terms is not None else FIXED_QUERIES[SUGGEST_QID])
    raw_query = " ".join(terms)
    rows: list[tuple[str, int, str]] = []

    # --- synonym (text_quality.synonym_terms: term hits + phrase-in-text,
    # map order, first-wins dedup)
    syn = synonym_terms(terms, raw_query)
    rows += [("synonym", i, t) for i, t in enumerate(syn, 1)]

    # --- fuzzy (expand per term, dist<=1, (dist, term) order, cap 50)
    fz: list[str] = []
    for t in terms:
        m = _fuzzy_dist_ds(sf_dir, t, SUGGEST_FUZZY_DIST).to_pandas()
        if m.empty:
            continue  # empty Dataset -> schemaless frame (no 'dist' col)
        m = m.sort_values(["dist", "term"]).head(FUZZY_MAX_EXPANSIONS)
        fz += [x for x in m["term"] if x not in fz]
    if fz and fz != terms:
        rows += [("fuzzy", i, t) for i, t in enumerate(fz, 1)]

    # --- csoundex (find_similar 0.72 top-8 per term, first-wins dedup)
    ts_ds = term_stats(sf_dir).materialize()
    cs: list[str] = []
    for t in terms:
        def score(b: pa.Table, q=t) -> pa.Table:
            out_t, out_s = [], []
            for x in b.column("term").to_pylist():
                if not x.isalpha():
                    continue
                s = cs_similarity(q, x, "fuzzy")
                if s >= SUGGEST_CS_THRESHOLD:
                    out_t.append(x)
                    out_s.append(round4(s))
            return pa.table({"term": pa.array(out_t, pa.string()),
                             "sim": pa.array(out_s, pa.float64())})

        hits = ts_ds.map_batches(score, batch_format="pyarrow").to_pandas()
        if hits.empty:
            continue  # empty Dataset -> schemaless frame (no 'sim' col)
        hits = hits.sort_values(["sim", "term"],
                                ascending=[False, True]).head(SUGGEST_CS_K)
        cs += [x for x in hits["term"] if x not in cs]
    if cs and cs != terms:
        rows += [("csoundex", i, t) for i, t in enumerate(cs, 1)]

    # --- rocchio expand_query (BM25 top-5 PRF + app expander)
    exp, _ = _rocchio_expand_app(sf_dir, terms)
    rows += [("rocchio", i, t) for i, t in enumerate(exp, 1)]

    return pd.DataFrame(rows, columns=["stype", "rank", "term"]).astype(
        {"rank": np.int64})


ANALYSIS_QUERY = "的 Spark ai 臺灣 記者 foo"  # exercises stopword drop,
# protected-term guard, low-info drop, case fold, 臺->台 collapse and the
# normalized-original synonym exclusion


def query_analysis(sf_dir: str) -> pd.DataFrame:
    """The query-analysis API payload (text_quality.py:137-156) for the
    pinned fixture query: normalized query, term count, significant
    terms (stopword/low-info dropped unless protected), removed terms
    and the synonym expansion (the 臺灣 synonym collapses to an original
    and is excluded).  Pure query-side kernel — sf_dir unused; list
    fields joined with spaces for the relational compare."""
    from ..functions.text_quality import analysis
    from ..functions.textnorm import normalize_text

    terms = normalize_text(ANALYSIS_QUERY).split()
    a = analysis(ANALYSIS_QUERY, terms)
    return pd.DataFrame({
        "raw_query": [a["raw_query"]],
        "normalized_query": [a["normalized_query"]],
        "term_count": np.array([a["term_count"]], np.int64),
        "significant_terms": [" ".join(a["significant_terms"])],
        "removed_stopwords": [" ".join(a["removed_stopwords"])],
        "synonym_terms": [" ".join(a["synonym_terms"])],
    })


def _rocchio_expand_app(sf_dir: str, terms: list[str]) -> tuple[list[str], float]:
    """expand_query's Rocchio PRF core (search_service.py:587-625 +
    rocchio.py:177-333, app expander params): BM25 top-5 feedback docs,
    normalized tfidf vectors, query vector = idf-or-1, alpha/beta
    accumulation, drift-guarded candidate cut.  Returns (expansion
    terms, query_drift)."""
    from collections import Counter

    n_docs, avgdl = _corpus_stats(sf_dir)
    t2q = {t: ["rq"] for t in dict.fromkeys(terms)}
    bm = _bm25_scores(sf_dir, n_docs, avgdl, t2q).to_pandas()
    if bm.empty:  # Ray drops the schema on empty frames
        bm = pd.DataFrame({"qid": [], "doc_id": [], "score": []})
    bm["key"] = bm["score"].map(round9)
    top5 = bm.sort_values(["key", "doc_id"], ascending=[False, True]) \
        .head(SUGGEST_FEEDBACK_K)
    fb_ids = pa.array(sorted(int(x) for x in top5["doc_id"]))

    # normalized tfidf vectors of the 5 feedback docs (pruned scan)
    if len(fb_ids):
        fb = _exploded_ds(sf_dir).map_batches(
            lambda b: b.filter(pa.compute.is_in(b.column("doc_id"),
                                                value_set=fb_ids)),
            batch_format="pyarrow").to_pandas()
    else:  # no feedback docs -> empty expansion (rocchio.py:214-223)
        fb = pd.DataFrame({"doc_id": [], "term": [], "tf": []})
    # df only for the feedback docs' vocabulary + the query terms (bounded)
    df_map = _df_for_terms(sf_dir, set(fb["term"]) | set(terms))

    def idf_app(t: str) -> float:
        df = df_map.get(t, 0)
        return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5)) if df else 0.0

    vecs: list[dict[str, float]] = []
    for _, g in fb.groupby("doc_id"):
        ws = {t: (1.0 + math.log10(tf)) * idf_app(t)
              for t, tf in zip(g["term"], g["tf"])}
        nrm = math.sqrt(sum(v * v for v in ws.values()))
        vecs.append({t: v / nrm for t, v in ws.items()} if nrm else {})
    qvec = {t: (idf_app(t) or 1.0) for t in dict.fromkeys(terms)}
    new_q = Counter()
    for t, w in qvec.items():
        new_q[t] += ROCCHIO_APP_ALPHA * w
    for v in vecs:
        for t, w in v.items():
            new_q[t] += (ROCCHIO_APP_BETA / len(vecs)) * w
    new_q = {t: max(0.0, w) for t, w in new_q.items()}
    common = set(qvec) & set(new_q)
    n1 = math.sqrt(sum(v * v for v in qvec.values()))
    n2 = math.sqrt(sum(v * v for v in new_q.values()))
    drift = (1.0 - sum(qvec[t] * new_q[t] for t in common) / (n1 * n2)) \
        if (common and n1 and n2) else 1.0
    max_terms = ROCCHIO_APP_MAX_TERMS
    if drift > ROCCHIO_APP_MAX_DRIFT:
        max_terms = max(1, int(ROCCHIO_APP_MAX_TERMS
                               * ROCCHIO_APP_MAX_DRIFT / drift))
    cands = [(t, round9(w)) for t, w in new_q.items()
             if t not in set(terms) and w >= ROCCHIO_APP_MIN_W]
    exp = [t for t, _ in sorted(cands, key=lambda x: (-x[1], x[0]))[:max_terms]]
    return exp, drift


def expand_query(sf_dir: str, terms: list[str] | None = None) -> pd.DataFrame:
    """The expand_query API payload (search_service.py:587-625): one row
    with the original query, the expanded query string
    (dict.fromkeys(query_terms + expansion)), the expansion count, the
    query drift (round6) and the drift-warning flag."""
    terms = list(terms if terms is not None else FIXED_QUERIES[SUGGEST_QID])
    exp, drift = _rocchio_expand_app(sf_dir, terms)
    all_terms = list(dict.fromkeys(terms + exp))
    return pd.DataFrame({
        "original_query": [" ".join(terms)],
        "expanded_query": [" ".join(all_terms)],
        "n_expanded": np.array([len(exp)], dtype=np.int64),
        "query_drift": [round6(drift)],
        "drift_warning": np.array(
            [1 if drift > ROCCHIO_APP_MAX_DRIFT else 0], dtype=np.int64),
    })


def structured_query_or(sf_dir: str) -> pd.DataFrame:
    """Structured JSON query execution with OR logic
    (query_executor.py:319-424: conditions -> FIELD nodes -> set union
    via the executor's _execute_node OR branch; matched-fields
    collection :280-317).  Each condition resolves to a doc-id set
    (EXACT field-index lookup semantics, field_indexer EXACT_FIELDS);
    the union is a Dataset union + distinct-count, so n_matched echoes
    the executor's per-doc matched_fields length."""
    conds = [("lang", "es"), ("source", "src3")]
    sets = []
    for field, value in conds:
        sets.append(_docs_ds(sf_dir, ["doc_id", field]).map_batches(
            lambda t, f=field, v=value: t.filter(
                pa.compute.equal(t.column(f), v)).select(["doc_id"]),
            batch_format="pyarrow"))
    u = sets[0].union(*sets[1:])
    out = _sum_by(u, ("doc_id",), (), counts=("n_matched",)).to_pandas()
    out["doc_id"] = out["doc_id"].astype(np.int64)
    out["n_matched"] = out["n_matched"].astype(np.int64)
    return out.sort_values("doc_id").reset_index(drop=True)[
        ["doc_id", "n_matched"]]


def facet_source_counts(sf_dir: str):
    return _docs_ds(sf_dir, ["source"]).groupby("source").count().rename_columns({"count()": "n_docs"})


def facet_lang_counts(sf_dir: str):
    return _docs_ds(sf_dir, ["lang"]).groupby("lang").count().rename_columns({"count()": "n_docs"})


def top_terms(sf_dir: str, n: int = 20) -> pd.DataFrame:
    """Top-n terms by collection frequency (collection-LM head,
    index_service.py:394-422)."""
    ts = term_stats(sf_dir).to_pandas()
    ts = ts.sort_values(["cf", "term"], ascending=[False, True]).head(n).reset_index(drop=True)
    ts["rank"] = np.arange(1, len(ts) + 1, dtype=np.int64)
    return ts[["rank", "term", "df", "cf"]]


def per_source_top_terms(sf_dir: str, n: int = 3) -> pd.DataFrame:
    """Top-n terms by cf within each source (facet × term aggregate).

    ``source`` is carried through the tokenize/explode stages on each
    row (TokenizeStage/ExplodeTokens carry_cols), so NO doc_id->source
    join or driver-built broadcast map exists — the facet aggregate is
    a plain groupby over the already-faceted rows.
    """
    from ray.data.aggregate import Sum

    ex = _exploded_ds(sf_dir, carry_cols=("source",))
    agg = ex.groupby(["source", "term"]).aggregate(Sum("tf", alias_name="cf")).to_pandas()
    agg = agg.sort_values(["source", "cf", "term"], ascending=[True, False, True])
    agg["rank"] = agg.groupby("source").cumcount() + 1
    out = agg[agg["rank"] <= n].reset_index(drop=True)
    out["rank"] = out["rank"].astype(np.int64)
    return out[["source", "rank", "term", "cf"]]


def browse_sort(sf_dir: str, n: int = 100) -> pd.DataFrame:
    """Browse ordering: (o_orderdate, o_orderkey) desc, limit n
    (reference browse sort semantics, search_service.py:1089-1147)."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"])
    top = ds.sort(["o_orderdate", "o_orderkey"], descending=[True, True]).limit(n).to_pandas()
    top["o_date"] = top["o_orderdate"].dt.strftime("%Y-%m-%d %H:%M:%S")
    return top[["o_orderkey", "o_custkey", "o_date", "o_totalprice"]]


def _bigram_counts(sf_dir: str) -> tuple[pd.DataFrame, dict, int, int]:
    """Shared bigram/unigram statistics for the collocation measures:
    (pair_counts df[w1,w2,n_ab], unigram cf dict, N_pairs, N_tokens).

    Bigrams are adjacent pairs in the FILTERED token sequence; pair
    counting is a map_batches explode + groupby (pre-aggregated per
    batch); unigram cfs reuse term_stats."""
    from ray.data.aggregate import Sum

    toks = _tokens_ds(sf_dir, with_positions=True)

    def pairs(t: pa.Table) -> pa.Table:
        from collections import Counter

        c: Counter = Counter()
        for row in t.to_pylist():
            # rebuild the positional token sequence (filtered order)
            seq: list[tuple[int, str]] = []
            for term, poss in zip(row["terms"], row["positions"]):
                seq.extend((p, term) for p in poss)
            seq.sort()
            for (p1, w1), (p2, w2) in zip(seq, seq[1:]):
                if p2 == p1 + 1:
                    c[(w1, w2)] += 1
        if not c:
            return pa.table({"w1": pa.array([], pa.string()),
                             "w2": pa.array([], pa.string()),
                             "n_ab": pa.array([], pa.int64())})
        ws = list(c.keys())
        return pa.table({
            "w1": pa.array([w[0] for w in ws], pa.string()),
            "w2": pa.array([w[1] for w in ws], pa.string()),
            "n_ab": pa.array(list(c.values()), pa.int64()),
        })

    pair_counts = toks.map_batches(pairs, batch_format="pyarrow") \
                      .groupby(["w1", "w2"]).aggregate(Sum("n_ab", alias_name="n_ab")) \
                      .to_pandas()
    n_pairs = int(pair_counts["n_ab"].sum())
    ts = term_stats(sf_dir).to_pandas()
    cf = dict(zip(ts["term"], ts["cf"]))
    n_tok = int(ts["cf"].sum())
    return pair_counts, cf, n_pairs, n_tok


def bigram_pmi(sf_dir: str, n: int = 20, min_count: int = 5) -> pd.DataFrame:
    """Top-n adjacent-bigram collocations by PMI (collocation.py:330-360
    PMI scoring over bigram/unigram frequencies):

    ``PMI(a,b) = ln( (n_ab/N_pairs) / ((cf_a/N_tok) * (cf_b/N_tok)) )``

    min_count prunes the tail before ranking."""
    pair_counts, cf, n_pairs, n_tok = _bigram_counts(sf_dir)
    pc_ = pair_counts[pair_counts["n_ab"] >= min_count].copy()
    pc_["pmi"] = [
        round4(math.log((nab / n_pairs) / ((cf[a] / n_tok) * (cf[b] / n_tok))))
        for a, b, nab in zip(pc_["w1"], pc_["w2"], pc_["n_ab"])
    ]
    pc_ = pc_.sort_values(["pmi", "w1", "w2"], ascending=[False, True, True]).head(n)
    pc_["rank"] = np.arange(1, len(pc_) + 1, dtype=np.int64)
    return pc_.reset_index(drop=True)[["rank", "w1", "w2", "n_ab", "pmi"]]


def bigram_collocations(sf_dir: str, n: int = 20, min_count: int = 5) -> pd.DataFrame:
    """Top-n adjacent bigrams by LLR, with the reference's full measure
    battery per pair (collocation.py:262-448): LLR, chi-square, t-score
    and Dice.

    Contingency table exactly as the reference builds it
    (collocation.py:179-215 — unigram counts as marginal proxies,
    N = total bigrams, cells clamped at 0, marginals RE-derived from
    the clamped cells):

    - n11 = n_ab, n12 = max(0, cf_a - n11), n21 = max(0, cf_b - n11),
      n22 = max(0, N_pairs - cf_a - cf_b + n11)
    - LLR  = 2 * sum O_ij * ln(O_ij / E_ij)   (cells with O>0, E>0)
    - chi2 = sum (O_ij - E_ij)^2 / E_ij       (cells with E>0)
    - t    = (p_ab - p_a*p_b) / sqrt(p_ab / N_pairs)
    - dice = 2*n_ab / (cf_a + cf_b)
    """
    pair_counts, cf, n_pairs, n_tok = _bigram_counts(sf_dir)
    d = pair_counts[pair_counts["n_ab"] >= min_count].copy()
    cfa = d["w1"].map(cf).to_numpy(dtype=np.float64)
    cfb = d["w2"].map(cf).to_numpy(dtype=np.float64)
    n11 = d["n_ab"].to_numpy(dtype=np.float64)
    n12 = np.maximum(0.0, cfa - n11)
    n21 = np.maximum(0.0, cfb - n11)
    n22 = np.maximum(0.0, n_pairs - cfa - cfb + n11)
    r1, r2 = n11 + n12, n21 + n22
    c1, c2 = n11 + n21, n12 + n22
    nn = r1 + r2
    with np.errstate(divide="ignore", invalid="ignore"):
        e11, e12 = r1 * c1 / nn, r1 * c2 / nn
        e21, e22 = r2 * c1 / nn, r2 * c2 / nn

        def cell_llr(o, e):
            return np.where((o > 0) & (e > 0), o * np.log(np.where(o > 0, o, 1.0) / np.where(e > 0, e, 1.0)), 0.0)

        llr = 2.0 * (cell_llr(n11, e11) + cell_llr(n12, e12)
                     + cell_llr(n21, e21) + cell_llr(n22, e22))

        def cell_chi(o, e):
            return np.where(e > 0, (o - e) ** 2 / np.where(e > 0, e, 1.0), 0.0)

        chi2 = cell_chi(n11, e11) + cell_chi(n12, e12) + cell_chi(n21, e21) + cell_chi(n22, e22)
    p_ab = n11 / n_pairs
    p_a, p_b = cfa / n_tok, cfb / n_tok
    t_sc = (p_ab - p_a * p_b) / np.sqrt(p_ab / n_pairs)
    dice = 2.0 * n11 / (cfa + cfb)
    d["llr"] = [round4(x) for x in llr]
    d["chi2"] = [round4(x) for x in chi2]
    d["t_score"] = [round4(x) for x in t_sc]
    d["dice"] = [round4(x) for x in dice]
    d = d.sort_values(["llr", "w1", "w2"], ascending=[False, True, True]).head(n)
    d["rank"] = np.arange(1, len(d) + 1, dtype=np.int64)
    return d.reset_index(drop=True)[["rank", "w1", "w2", "n_ab", "llr", "chi2", "t_score", "dice"]]


def substring_freq(sf_dir: str, n_lo: int = 2, n_hi: int = 4, k: int = 20,
                   min_count: int = 5) -> pd.DataFrame:
    """Frequent substring (character n-gram) extraction — the analytical
    capability the reference's PAT tree serves (pat_tree.py:22-588:
    substring/prefix frequency queries and PAT-based keyword
    extraction), re-expressed as a shuffle: explode every character
    n-gram of each token (lengths n_lo..n_hi) inside map_batches with
    per-batch partial counts, one groupby-sum, rank by (count desc,
    gram asc).  A suffix structure answers these queries in O(|q|) per
    lookup; the batch analog is one pass + one small aggregate."""
    from ray.data.aggregate import Sum

    toks = _tokens_ds(sf_dir)

    def grams(t: pa.Table) -> pa.Table:
        from collections import Counter

        c: Counter = Counter()
        for row in t.to_pylist():
            for term, tf in zip(row["terms"], row["tfs"]):
                L = len(term)
                for n in range(n_lo, n_hi + 1):
                    if L < n:
                        continue
                    for i in range(L - n + 1):
                        c[term[i:i + n]] += tf
        if not c:
            return pa.table({"gram": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64())})
        return pa.table({"gram": pa.array(list(c.keys()), pa.string()),
                         "cnt": pa.array(list(c.values()), pa.int64())})

    agg = toks.map_batches(grams, batch_format="pyarrow") \
              .groupby("gram").aggregate(Sum("cnt", alias_name="cnt")).to_pandas()
    agg = agg[agg["cnt"] >= min_count]
    agg = agg.sort_values(["cnt", "gram"], ascending=[False, True]).head(k)
    agg["rank"] = np.arange(1, len(agg) + 1, dtype=np.int64)
    agg["cnt"] = agg["cnt"].astype(np.int64)
    return agg.reset_index(drop=True)[["rank", "gram", "cnt"]]


NGRAM_TEST_TEXTS = {
    "t1": "the fast query scan",
    "t2": "slow window merge batch",
    "t3": "data stream group sort join",
}


def ngram_lm_perplexity(sf_dir: str) -> pd.DataFrame:
    """Bigram LM perplexity of fixed test texts under each smoothing
    (ngram.py:43-421: MLE / Laplace / JM λ=0.7 / Dirichlet μ=2000).

    The training counts are DISTRIBUTED aggregates: bigram counts come
    from the positional pair shuffle (shared with the collocation
    queries), context counts fold out of them (sum over w2 per w1),
    unigram cf from term_stats — the driver only holds the vocab-sized
    count tables and runs the cheap per-text scoring loop.
    Rows-only (kernel parity unit-tested against in-memory training)."""
    from ..functions.ngram_lm import NGramLM
    from ..functions.tokenize import get_tokenizer

    pair_counts, cf, n_pairs, n_tok = _bigram_counts(sf_dir)
    ngrams = {(a, b): int(n) for a, b, n in
              zip(pair_counts["w1"], pair_counts["w2"], pair_counts["n_ab"])}
    ctx = pair_counts.groupby("w1")["n_ab"].sum()
    contexts = {(w,): int(n) for w, n in ctx.items()}
    tok = get_tokenizer("whitespace")
    rows = []
    for smoothing in ("mle", "laplace", "jm", "dirichlet"):
        m = NGramLM.from_counts(2, ngrams, contexts, cf, smoothing=smoothing)
        for tid, text in NGRAM_TEST_TEXTS.items():
            ppl = m.perplexity(tok(text))
            rows.append((smoothing, tid, round4(ppl) if math.isfinite(ppl) else -1.0))
    return pd.DataFrame(rows, columns=["smoothing", "text_id", "perplexity"])


def facet_date_ranges(sf_dir: str) -> pd.DataFrame:
    """Month-bucket facet over orders (the reference's date-range facet
    buckets, facet_engine.py:173-498): count + revenue per month."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderdate", "o_totalprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["month"] = df["o_orderdate"].dt.strftime("%Y-%m")
        return df.groupby("month", sort=False).agg(
            n_orders=("o_totalprice", "size"), revenue=("o_totalprice", "sum")).reset_index()

    from ray.data.aggregate import Sum

    part = ds.map_batches(partial, batch_format="pandas")
    out = part.groupby("month").aggregate(
        Sum("n_orders", alias_name="n_orders"), Sum("revenue", alias_name="revenue"),
    ).to_pandas()
    out["n_orders"] = out["n_orders"].astype(np.int64)
    out["revenue"] = out["revenue"].map(round4)
    return out.sort_values("month").reset_index(drop=True)


# ------------------------------------------------------------------ events

def events_windowed(sf_dir: str) -> pd.DataFrame:
    """Tumbling 1-hour windows per event_type: count, distinct users, sum.

    Partial aggregation inside map_batches emits (type, window, user)
    partials; the groupby merges them (pre-aggregate pattern — the only
    all-to-all moves the reduced rows)."""
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "user_id", "event_type", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["window_start"] = df["ts"].dt.floor("h").dt.strftime("%Y-%m-%d %H:%M:%S")
        g = df.groupby(["event_type", "window_start", "user_id"], sort=False).agg(
            n_events=("value", "size"), sum_value=("value", "sum")).reset_index()
        return g

    part = ds.map_batches(partial, batch_format="pandas")
    # two-level partial-sum merge: first collapse per (type, window, USER)
    # across batches, then count the distinct-user rows per (type, window)
    per_user = _sum_by(part, ("event_type", "window_start", "user_id"),
                       ("n_events", "sum_value"))
    out = _sum_by(per_user, ("event_type", "window_start"),
                  ("n_events", "sum_value"), counts=("n_users",)).to_pandas()
    out["n_events"] = out["n_events"].astype(np.int64)
    out["n_users"] = out["n_users"].astype(np.int64)
    out["sum_value"] = out["sum_value"].map(lambda v: round4(float(v)))
    return (out[["event_type", "window_start", "n_events", "n_users", "sum_value"]]
            .sort_values(["event_type", "window_start"]).reset_index(drop=True))


SESSION_GAP_SEC = 1800


def events_sessionize(sf_dir: str) -> pd.DataFrame:
    """Gap-based sessionization (sessions split at >30 min of user
    inactivity) — the stateful-streaming window pattern expressed as a
    per-user groupby: shuffle keys on user_id, per-group work is a
    vectorized diff/cumsum.  Emits (user_id, session_idx, n_events,
    start_ts, duration_sec)."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "user_id"])

    def sess(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("ts")
        gaps = g["ts"].diff()  # exact Timedelta compare — no float seconds
        sid = ((gaps > pd.Timedelta(seconds=SESSION_GAP_SEC)) | gaps.isna()).cumsum()
        out = g.groupby(sid).agg(start=("ts", "min"), end=("ts", "max"),
                                 n_events=("ts", "size")).reset_index(drop=True)
        dur_us = (out["end"].to_numpy() - out["start"].to_numpy()) \
            .astype("timedelta64[us]").astype(np.int64)
        return pd.DataFrame({
            "user_id": np.full(len(out), g["user_id"].iloc[0], dtype=np.int64),
            "session_idx": np.arange(1, len(out) + 1, dtype=np.int64),
            "n_events": out["n_events"].astype(np.int64),
            "start_ts": out["start"].dt.strftime("%Y-%m-%d %H:%M:%S"),
            "duration_us": dur_us,
        })

    return ds.groupby("user_id").map_groups(sess, batch_format="pandas").to_pandas() \
        .sort_values(["user_id", "session_idx"]).reset_index(drop=True)


# ------------------------------------------------------------------ embeddings

def _query_vectors(sf_dir: str, n: int = 5) -> tuple[np.ndarray, list[int]]:
    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    df = t.to_pandas().sort_values("vec_id").head(n)
    return np.array(df["embedding"].tolist(), dtype=np.float64), df["vec_id"].tolist()


def ann_topk(sf_dir: str, k: int = 10) -> pd.DataFrame:
    """Brute-force cosine top-k for the first 5 vectors as queries."""
    import ray.data as rd

    from ..stages.ann import brute_force_topk

    q, qids = _query_vectors(sf_dir, 5)
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    out = brute_force_topk(ds, q, k=k)
    out["qid"] = out["qid"].map(dict(enumerate(qids))).astype(np.int64)
    return out.sort_values(["qid", "rank"]).reset_index(drop=True)


def ann_lsh(sf_dir: str, k: int = 10) -> pd.DataFrame:
    """LSH-bucketed approximate ANN (rows-only; recall tested vs brute
    force in the unit suite)."""
    import ray.data as rd

    from ..stages.ann import lsh_topk

    q, qids = _query_vectors(sf_dir, 5)
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    out = lsh_topk(ds, q, k=k, dim=q.shape[1], n_planes=8, n_tables=4, multiprobe=1)
    out["qid"] = out["qid"].map(dict(enumerate(qids))).astype(np.int64)
    return out.sort_values(["qid", "rank"]).reset_index(drop=True)


def ann_lsh_bucketed(sf_dir: str, k: int = 10) -> pd.DataFrame:
    """Bucketed-LAYOUT LSH ANN — the 100-TB scale path: the corpus is
    written once per LSH table under hive partitions keyed by bucket id,
    and a query reads ONLY its probe buckets' partition directories
    (Parquet partition pruning; no full scan + filter).  Results are
    identical to the scan-based `ann_lsh` for the same parameters
    (asserted in unit tests); rows-only driver check."""
    import ray.data as rd

    from ..stages.ann import lsh_build_bucketed, lsh_topk_bucketed

    q, qids = _query_vectors(sf_dir, 5)
    layout = f"/tmp/nirs_lsh_bucketed_{_layout_key(sf_dir)}"
    if not os.path.isdir(layout):
        ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                             columns=["vec_id", "embedding"])
        lsh_build_bucketed(ds, layout, dim=q.shape[1], n_planes=8, n_tables=4)
    out = lsh_topk_bucketed(layout, q, k=k, dim=q.shape[1], n_planes=8,
                            n_tables=4, multiprobe=1)
    out["qid"] = out["qid"].map(dict(enumerate(qids))).astype(np.int64)
    return out.sort_values(["qid", "rank"]).reset_index(drop=True)


def embedding_kmeans(sf_dir: str, k: int = 8) -> pd.DataFrame:
    """Distributed k-means over the embeddings table (doc-clustering,
    doc_cluster.py capability): per-vector cluster id + squared distance.
    Deterministic (seeded init, fixed iterations); rows-only check with
    inertia-decrease asserted in unit tests."""
    import ray.data as rd

    from ..stages.ann import kmeans

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    dim = len(ds.take_batch(1, batch_format="pandas")["embedding"].iloc[0])
    _, assign = kmeans(ds, k=k, dim=dim, n_iter=8, seed=17)
    assign["dist2"] = assign["dist2"].map(round4)
    return assign


def doc_hac_clusters(sf_dir: str, n_docs: int = 60, k: int = 8,
                     linkage: str = "complete",
                     sim_decimals: int | None = None) -> pd.DataFrame:
    """Hierarchical agglomerative doc clustering (doc_cluster.py:252-376:
    complete/single/average linkage over pairwise cosine of TF-IDF
    vectors; naive O(n^3) merge loop with 0-sim for disjoint docs).

    Distributed shape: per-doc L2-normalized TF-IDF vectors come out of
    the tokenize stage; pairwise cosine is the TERM-PARTITIONED sparse
    product — groupby(term) emits w_i*w_j contributions only for doc
    pairs sharing the term (vectorized outer product per posting list),
    then a (d1, d2) groupby-sum yields the sparse similarity matrix.
    No doc ever compares against docs sharing no term.  The HAC merge
    loop itself is inherently O(n^3) sequential — the reference calls
    it pedagogical — so it runs driver-side over the FIRST ``n_docs``
    docs (at web scale one runs it over k-means centroids instead;
    see embedding_kmeans for the distributed pre-clustering).
    Rows-only check; kernel parity unit-tested."""
    from ray.data.aggregate import Count, Sum

    from ..functions.cluster import hac

    n_corpus, _ = _corpus_stats(sf_dir)

    # normalized TF-IDF weights for the HAC doc subset, driver-side and
    # bounded (n_docs docs, their vocab only — df via _df_for_terms);
    # the quadratic pair-contribution stage below stays distributed
    wrows = _exploded_ds(sf_dir).map_batches(
        lambda t: t.filter(pa.compute.less(t.column("doc_id"), n_docs)),
        batch_format="pyarrow").to_pandas()
    df_map = _df_for_terms(sf_dir, wrows["term"])
    idf_vec = _app_idf_vec(n_corpus)
    dfv = wrows["term"].map(df_map).fillna(0).to_numpy(dtype=np.float64)
    wun = (1.0 + np.log10(wrows["tf"].to_numpy(dtype=np.float64))) \
        * idf_vec(dfv)
    nrm = np.sqrt(pd.Series(wun * wun).groupby(wrows["doc_id"]).transform("sum")
                  .to_numpy())
    nrm[nrm == 0.0] = 1.0
    weights_df = pd.DataFrame({"term": wrows["term"],
                               "doc_id": wrows["doc_id"].astype(np.int64),
                               "w": wun / nrm})

    def pair_contrib(df: pd.DataFrame) -> pd.DataFrame:
        d = df["doc_id"].to_numpy()
        w = df["w"].to_numpy()
        order = np.argsort(d)
        d, w = d[order], w[order]
        if len(d) < 2:
            return pd.DataFrame({"d1": [], "d2": [], "p": []})
        i, j = np.triu_indices(len(d), 1)
        return pd.DataFrame({"d1": d[i], "d2": d[j], "p": w[i] * w[j]})

    import ray.data as rd

    contrib = rd.from_pandas(weights_df) \
                .groupby("term").map_groups(pair_contrib, batch_format="pandas")
    sims = _sum_by(contrib, ("d1", "d2"), ("p",)).to_pandas() \
        .rename(columns={"p": "sim"})
    if sim_decimals is not None:
        # oracle-determinism mode: the merge loop takes argmax over raw
        # float sims, so distributed-vs-SQL summation-order jitter
        # (~1e-16) could flip a merge decision; rounding both sides to
        # the same precision BEFORE the loop removes that degree of
        # freedom (min-of-rounded == rounded-min for complete/single
        # linkage, so the loop semantics are unchanged)
        sims["sim"] = sims["sim"].round(sim_decimals)
    ids = sorted(set(sims["d1"]) | set(sims["d2"]))
    pos = {d: i for i, d in enumerate(ids)}
    S = np.zeros((len(ids), len(ids)))
    for d1, d2, s in zip(sims["d1"], sims["d2"], sims["sim"]):
        S[pos[d1], pos[d2]] = S[pos[d2], pos[d1]] = s
    assign = hac(ids, S, k=k, linkage=linkage)
    sizes: dict[int, int] = {}
    for cid in assign.values():
        sizes[cid] = sizes.get(cid, 0) + 1
    return pd.DataFrame(
        [(d, assign[d], sizes[assign[d]]) for d in ids],
        columns=["doc_id", "cluster_id", "cluster_size"])


def term_star_clusters(sf_dir: str, top_n: int = 150,
                       threshold: float = 0.7) -> pd.DataFrame:
    """Star clustering of the top-N vocabulary by edit-distance
    similarity (term_cluster.py:193-332: greedy max-potential centers,
    sim = 1 - levenshtein/maxlen, threshold 0.7).

    The pairwise similarity matrix is computed DISTRIBUTED: the top-N
    term list (tiny) broadcasts into map_batches over the vocab
    Dataset; each batch scores its terms against the list and emits
    only pairs above threshold.  The greedy star loop is driver-side
    over that (sparse, vocab-independent) pair set.  At full-web vocab
    the vocab side would be q-gram-LSH bucketed first.  Rows-only."""
    from ..functions.cluster import edit_similarity, star_clusters

    ts = term_stats(sf_dir).to_pandas()
    ts = ts.sort_values(["cf", "term"], ascending=[False, True]).head(top_n)
    top = sorted(ts["term"])  # deterministic input order for the greedy loop

    import ray.data as rd

    vocab_ds = rd.from_pandas(pd.DataFrame({"term": top}))

    def score(t: pa.Table) -> pa.Table:
        out_a, out_b, out_s = [], [], []
        for a in t.column("term").to_pylist():
            for b in top:
                if a < b:
                    s = edit_similarity(a, b)
                    if s >= threshold:
                        out_a.append(a)
                        out_b.append(b)
                        out_s.append(s)
        return pa.table({"a": pa.array(out_a, pa.string()),
                         "b": pa.array(out_b, pa.string()),
                         "s": pa.array(out_s, pa.float64())})

    pairs = vocab_ds.map_batches(score, batch_format="pyarrow").to_pandas()
    sims = ({} if pairs.empty else
            {(a, b): s for a, b, s in zip(pairs["a"], pairs["b"], pairs["s"])})
    rows = []
    for cid, (center, members) in enumerate(star_clusters(top, sims, threshold)):
        for t in members:
            rows.append((cid, center, t))
    return pd.DataFrame(rows, columns=["cluster_id", "center", "term"])


def term_cooccurrence_clusters(sf_dir: str, top_n: int = 100,
                               min_cooccurrence: int = 2) -> pd.DataFrame:
    """Co-occurrence term clustering (term_cluster.py:411-490: greedy
    centers absorb terms sharing >= min_cooccurrence docs).

    Doc-level pair counts are distributed: each tokenized doc
    intersects with the broadcast top-N list and emits its term pairs
    (pre-counted per batch), then a pair groupby-sum gives the
    co-occurrence matrix — the classic explode -> shuffle aggregate.
    Greedy absorption is driver-side over the N^2-bounded counts.
    Rows-only."""
    from ray.data.aggregate import Sum

    from ..functions.cluster import cooccurrence_clusters

    ts = term_stats(sf_dir).to_pandas()
    ts = ts.sort_values(["cf", "term"], ascending=[False, True]).head(top_n)
    top = sorted(ts["term"])
    top_set = frozenset(top)

    def pairs(t: pa.Table) -> pa.Table:
        from collections import Counter

        c: Counter = Counter()
        for row in t.to_pylist():
            present = sorted(set(row["terms"]) & top_set)
            for i in range(len(present)):
                for j in range(i + 1, len(present)):
                    c[(present[i], present[j])] += 1
        ks = list(c.keys())
        return pa.table({"a": pa.array([k[0] for k in ks], pa.string()),
                         "b": pa.array([k[1] for k in ks], pa.string()),
                         "n": pa.array(list(c.values()), pa.int64())})

    agg = _tokens_ds(sf_dir).map_batches(pairs, batch_format="pyarrow") \
        .groupby(["a", "b"]).aggregate(Sum("n", alias_name="n")).to_pandas()
    cooc = {(a, b): int(n) for a, b, n in zip(agg["a"], agg["b"], agg["n"])}
    rows = []
    for cid, (center, members) in enumerate(
            cooccurrence_clusters(top, cooc, min_cooccurrence)):
        for t in members:
            rows.append((cid, center, t))
    return pd.DataFrame(rows, columns=["cluster_id", "center", "term"])


def media_features(sf_dir: str) -> pd.DataFrame:
    """Multimodal plumbing: opaque binary payloads -> feature vectors via
    an actor-pool stage with small batches (decode stubbed — see
    stages/multimodal.py). Deterministic fake corpus; rows-only check."""
    import ray.data as rd

    from ..stages.multimodal import MediaFeatureStage, make_fake_media_table

    ds = rd.from_arrow(make_fake_media_table(n=64, seed=5))
    out = ds.map_batches(MediaFeatureStage(out_dim=16), batch_format="pyarrow",
                         batch_size=8, concurrency=2).to_pandas()
    out["feat_norm"] = out["feature"].map(lambda f: round4(float(np.linalg.norm(f))))
    return out[["media_id", "feat_norm"]].sort_values("media_id").reset_index(drop=True)


def video_frame_features(sf_dir: str) -> pd.DataFrame:
    """Frame-sampling plumbing: fake video rows -> every-10th-frame
    feature rows via an actor-pool stage with small batches (decode
    stubbed; rows-only check, determinism unit-tested)."""
    import ray.data as rd

    from ..stages.multimodal import FrameSampleStage, make_fake_media_table

    t = make_fake_media_table(n=32, seed=11)
    t = t.set_column(t.schema.get_field_index("kind"), "kind",
                     pa.array(["video"] * t.num_rows))
    t = t.set_column(t.schema.get_field_index("duration_ms"), "duration_ms",
                     pa.array([4000 + 250 * i for i in range(t.num_rows)], pa.int32()))
    ds = rd.from_arrow(t)
    out = ds.map_batches(FrameSampleStage(every_n=10), batch_format="pyarrow",
                         batch_size=8, concurrency=2).to_pandas()
    out["feat_norm"] = out["feature"].map(lambda f: round4(float(np.linalg.norm(f))))
    return out[["media_id", "frame_idx", "feat_norm"]] \
        .sort_values(["media_id", "frame_idx"]).reset_index(drop=True)


def video_frame_features_real(sf_dir: str) -> pd.DataFrame:
    """REAL video decode path: synthetic uncompressed AVI payloads
    (RIFF/DIB, pure struct+numpy — no ffmpeg) decoded frame-by-frame,
    every-2nd frame scored with the same real image-feature kernel the
    PPM path uses (stages/multimodal.RealFrameSampleStage).  Rows-only
    check; codec roundtrip and feature values unit-tested."""
    import ray.data as rd

    from ..stages.multimodal import RealFrameSampleStage, make_real_video_table

    ds = rd.from_arrow(make_real_video_table(n=8, seed=5))
    out = ds.map_batches(RealFrameSampleStage(every_n=2), batch_format="pyarrow",
                         batch_size=4, concurrency=2).to_pandas()
    out["feat_norm"] = out["feature"].map(lambda f: round4(float(np.linalg.norm(f))))
    out["feat_dim"] = out["feature"].map(len)
    return out[["media_id", "frame_idx", "feat_dim", "feat_norm"]] \
        .sort_values(["media_id", "frame_idx"]).reset_index(drop=True)


def embedding_nn_within_label(sf_dir: str) -> pd.DataFrame:
    """Nearest neighbor per vector within its label group (the
    embedding-cosine near-dup operator with label blocking; emits the
    top candidate per vector)."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet")

    def nn(group: pd.DataFrame) -> pd.DataFrame:
        if len(group) < 2:
            return pd.DataFrame({"vec_id": pd.Series(dtype=np.int64),
                                 "nn_vec_id": pd.Series(dtype=np.int64),
                                 "score": pd.Series(dtype=np.float64)})
        ids = group["vec_id"].to_numpy()
        m = np.array(group["embedding"].tolist(), dtype=np.float64)
        m = m / np.linalg.norm(m, axis=1, keepdims=True)
        sims = m @ m.T
        np.fill_diagonal(sims, -np.inf)
        order = np.argsort(ids)
        # deterministic: for ties pick smallest neighbor vec_id
        rows = []
        for i in range(len(ids)):
            s = sims[i]
            best = np.lexsort((ids, -s))[0]
            rows.append((int(ids[i]), int(ids[best]), round4(float(s[best]))))
        return pd.DataFrame(rows, columns=["vec_id", "nn_vec_id", "score"])

    out = ds.groupby("label").map_groups(nn, batch_format="pandas").to_pandas()
    return out.sort_values("vec_id").reset_index(drop=True)


def ann_ivf(sf_dir: str, k: int = 10) -> pd.DataFrame:
    """IVF-partitioned ANN — the k-means scale path (complement of the
    LSH layout): a distributed-k-means coarse quantizer partitions the
    corpus into inverted lists (hive layout, each row stored once); a
    query probes its ``nprobe`` nearest lists and only those partition
    directories are read.  Rows-only driver check; recall vs brute force
    asserted in unit tests (tests/test_dedup_ann_stages.py)."""
    import ray.data as rd

    from ..stages.ann import ivf_build, ivf_topk

    q, qids = _query_vectors(sf_dir, 5)
    layout = f"/tmp/nirs_ivf_{_layout_key(sf_dir)}"
    if not os.path.isdir(layout):
        ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                             columns=["vec_id", "embedding"])
        ivf_build(ds, layout, dim=q.shape[1], n_lists=16, n_iter=8)
    out = ivf_topk(layout, q, k=k, nprobe=4)
    out["qid"] = out["qid"].map(dict(enumerate(qids))).astype(np.int64)
    return out.sort_values(["qid", "rank"]).reset_index(drop=True)


def ann_ivfpq(sf_dir: str, k: int = 10) -> pd.DataFrame:
    """IVF-PQ ANN — the MEMORY scale path: inverted lists from the
    coarse quantizer plus 8-byte product-quantized residual codes per
    vector (~64x smaller than the float rows), scored by asymmetric
    distance (per-query LUT + uint8 gather — no float vectors are read
    at query time).  Rows-only driver check; recall vs brute force and
    layout determinism asserted in unit tests."""
    import ray.data as rd

    from ..stages.ann import ivfpq_build, ivfpq_topk

    q, qids = _query_vectors(sf_dir, 5)
    layout = f"/tmp/nirs_ivfpq2_{_layout_key(sf_dir)}"  # v2: in-row list_id
    if not os.path.isdir(layout):
        ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                             columns=["vec_id", "embedding"])
        ivfpq_build(ds, layout, dim=q.shape[1], n_lists=16,
                    m_sub=8, n_iter=8)
    out = ivfpq_topk(layout, q, k=k, nprobe=6)
    out["qid"] = out["qid"].map(dict(enumerate(qids))).astype(np.int64)
    out["score"] = out["score"].map(round4)
    return out.sort_values(["qid", "rank"]).reset_index(drop=True)


# --------------------------------------------- PAT-tree keyword extraction

PAT_MIN_FREQ = 2        # extract_keywords default (pat_tree.py:302)
PAT_METHODS = ("tfidf", "frequency", "doc_frequency", "combined")


def pat_keywords(sf_dir: str, k: int = 20, min_freq: int = PAT_MIN_FREQ,
                 min_doc_freq: int = 1) -> pd.DataFrame:
    """Corpus keyword extraction with the PAT-tree term-stats scoring.

    extract_keywords (pat_tree.py:302-382): candidates pass freq /
    doc-freq floors; tf = freq/total_terms (total TOKENS in the tree),
    idf = ln((total_docs+1)/(df+1)) + 1 where total_docs counts the
    distinct docs holding ANY candidate term; four methods are scored —
    tfidf, frequency, doc_frequency, combined = tfidf*(1+ln(df+1)).
    Ties are broken by term ascending (the reference inherits dict
    order; we pin a canonical order, SURVEY §7.6.2).

    Distributed shape: one groupby(term) aggregate (the index df/cf
    shuffle, shared with term_stats), one scalar token-count aggregate,
    one distinct-doc count over a term-semi-joined stream; scoring is a
    vectorized map over the (vocab-sized) candidate table, and only the
    4*k winners are collected.
    """
    from ray.data.aggregate import Count, Sum

    ex = _exploded_ds(sf_dir)
    stats = _sum_by(ex, ("term",), ("tf",), counts=("df",)).map_batches(
        lambda t: pa.table({"term": t.column("term"), "df": t.column("df"),
                            "freq": t.column("tf")}),
        batch_format="pyarrow").materialize()
    total_terms = float(ex.aggregate(Sum("tf", alias_name="t"))["t"])

    cand = stats.map_batches(
        lambda t: t.filter(pa.compute.and_(
            pa.compute.greater_equal(t.column("freq"), min_freq),
            pa.compute.greater_equal(t.column("df"), min_doc_freq))),
        batch_format="pyarrow").materialize()

    # total_docs = |union of candidate terms' doc sets| — a distinct
    # count over the exploded stream semi-joined to candidate terms
    total_docs = float(
        ex.join(cand.select_columns(["term"]), "left_semi",
                num_partitions=8, on=("term",))
          .groupby("doc_id").count().count())

    def score(t: pa.Table) -> pa.Table:
        freq = t.column("freq").to_numpy().astype(np.float64)
        df = t.column("df").to_numpy().astype(np.float64)
        tfn = freq / total_terms
        idf = np.log((total_docs + 1.0) / (df + 1.0)) + 1.0
        tfidf = tfn * idf
        return pa.table({
            "term": t.column("term"),
            "frequency": t.column("freq").cast(pa.int64()),
            "doc_frequency": t.column("df").cast(pa.int64()),
            "tfidf": tfidf,
            "frequency_s": freq,
            "doc_frequency_s": df,
            "combined": tfidf * (1.0 + np.log(df + 1.0)),
        })

    scored = cand.map_batches(score, batch_format="pyarrow").materialize()

    frames = []
    for method in PAT_METHODS:
        col = {"tfidf": "tfidf", "frequency": "frequency_s",
               "doc_frequency": "doc_frequency_s", "combined": "combined"}[method]
        top = (scored.sort([col, "term"], descending=[True, False])
                     .limit(k).to_pandas())
        top = top.sort_values([col, "term"], ascending=[False, True]).reset_index(drop=True)
        frames.append(pd.DataFrame({
            "method": method,
            "rank": np.arange(1, len(top) + 1, dtype=np.int64),
            "term": top["term"],
            "frequency": top["frequency"].astype(np.int64),
            "doc_frequency": top["doc_frequency"].astype(np.int64),
            "score": top[col].map(lambda v: round4(float(v))),
        }))
    return pd.concat(frames, ignore_index=True)


def svo_triples(sf_dir: str, limit: int = 200) -> pd.DataFrame:
    """SVO triples per document (syntax plumbing; parser stubbed).

    Drives the dependency-parse -> SVO tree walk (functions/svo.py;
    reference src/ir/syntax/parser.py:420-511) as an actor-pool stage.
    The SuPar model is absent in this container, so the parse step is
    the declared deterministic fake; the tree-walk kernel itself is
    real and unit-tested on hand-built edge lists.  Rows-only check.
    """
    from ..functions.svo import SVOStage

    ds = _docs_ds(sf_dir, ["doc_id", "text"]).map_batches(
        SVOStage(parser="fake"), batch_format="pyarrow", concurrency=2)
    out = ds.to_pandas().sort_values("doc_id").reset_index(drop=True)
    return out.head(limit)


# --------------------------------------------- positional proximity/window

PROX_TERMS = ("spark", "join")   # proximity_query example pair
PROX_DIST = 2                    # max token distance (<=, positional_index.py:383)
WINDOW_TERMS = ("merge", "sort", "table")
WINDOW_SIZE = 6                  # strict span < size (positional_index.py:460)


def proximity_match(sf_dir: str, term1: str | None = None,
                    term2: str | None = None,
                    max_distance: int = PROX_DIST) -> pd.DataFrame:
    """doc_ids where term1 and term2 occur within ``max_distance`` tokens
    (positional_index.py:318-393: any position pair with |p1-p2| <= d).

    Same distributed shape as phrase_match: the per-doc positional
    postings stream through one map_batches; the pair check is a
    vectorized searchsorted against the sorted position lists (the
    reference's two-pointer scan, batched)."""
    t1 = term1 or PROX_TERMS[0]
    t2 = term2 or PROX_TERMS[1]
    toks = _tokens_ds(sf_dir, with_positions=True)

    def check(t: pa.Table) -> pa.Table:
        hits = []
        for row in t.to_pylist():
            pos = dict(zip(row["terms"], row["positions"]))
            if t1 not in pos or t2 not in pos:
                continue
            p1 = np.asarray(pos[t1], dtype=np.int64)
            p2 = np.sort(np.asarray(pos[t2], dtype=np.int64))
            idx = np.searchsorted(p2, p1)
            best = np.full(p1.shape, np.iinfo(np.int64).max)
            left = idx > 0
            best[left] = np.abs(p1[left] - p2[idx[left] - 1])
            right = idx < len(p2)
            best[right] = np.minimum(best[right],
                                     np.abs(p2[idx[right]] - p1[right]))
            if (best <= max_distance).any():
                hits.append(row["doc_id"])
        return pa.table({"doc_id": pa.array(hits, pa.int64())})

    return toks.map_batches(check, batch_format="pyarrow").to_pandas() \
               .sort_values("doc_id").reset_index(drop=True)


def window_match(sf_dir: str, terms: tuple[str, ...] | None = None,
                 window_size: int = WINDOW_SIZE) -> pd.DataFrame:
    """doc_ids where ALL terms occur inside a token window of
    ``window_size`` (positional_index.py:395-469: some choice of one
    position per term with max-min < window_size — the reference's
    sliding scan over the merged position list, equivalently)."""
    ts = tuple(terms or WINDOW_TERMS)
    toks = _tokens_ds(sf_dir, with_positions=True)

    def check(t: pa.Table) -> pa.Table:
        hits = []
        for row in t.to_pylist():
            pos = dict(zip(row["terms"], row["positions"]))
            if any(x not in pos for x in ts):
                continue
            merged = np.concatenate([np.asarray(pos[x], np.int64) for x in ts])
            labels = np.concatenate([np.full(len(pos[x]), i, np.int64)
                                     for i, x in enumerate(ts)])
            order = np.argsort(merged, kind="stable")
            merged, labels = merged[order], labels[order]
            # sliding window over the merged sorted positions, counting
            # distinct term coverage (two-pointer; O(p) per doc)
            need = len(ts)
            count = np.zeros(need, np.int64)
            covered = 0
            lo = 0
            found = False
            for hi in range(len(merged)):
                if count[labels[hi]] == 0:
                    covered += 1
                count[labels[hi]] += 1
                while merged[hi] - merged[lo] >= window_size:
                    count[labels[lo]] -= 1
                    if count[labels[lo]] == 0:
                        covered -= 1
                    lo += 1
                if covered == need:
                    found = True
                    break
            if found:
                hits.append(row["doc_id"])
        return pa.table({"doc_id": pa.array(hits, pa.int64())})

    return toks.map_batches(check, batch_format="pyarrow").to_pandas() \
               .sort_values("doc_id").reset_index(drop=True)


# --------------------------------------------- unified search facade

UNIFIED_QUERIES = {
    "u_simple": "spark join",
    "u_bool": "(spark OR vector) AND NOT dup",
    "u_field": "lang:en spark",
}
# recognized field prefixes (unified_search.py:578-597 derives these from
# FieldIndexer.supported_fields + aliases; ours are the oracle-table fields)
FIELD_PREFIXES = ("lang:", "source:", "date:")


def detect_query_mode(query: str) -> str:
    """Query-mode auto-detection (unified_search.py:549-577), faithfully:
    field if any known 'field:' prefix occurs; else boolean if
    'AND'/'OR'/'NOT' occurs as a SUBSTRING of the uppercased query (the
    reference does not tokenize here — 'RANDOM' counts as boolean);
    else simple."""
    ql, qu = query.lower(), query.upper()
    if ":" in query and any(p in ql for p in FIELD_PREFIXES):
        return "field"
    if any(op in qu for op in ("AND", "OR", "NOT")):
        return "boolean"
    return "simple"


def unified_search(sf_dir: str, k: int = 10) -> pd.DataFrame:
    """Unified search facade (unified_search.py:486-547): detect each
    query's mode and dispatch — simple -> distributed BM25 ranking,
    boolean -> parsed set algebra, field -> exact-field filter + term
    containment.  Boolean/field hits carry rank-by-doc_id and score 0
    (set semantics, as the reference's boolean path)."""
    rows: list[tuple] = []
    for qid, qtext in UNIFIED_QUERIES.items():
        mode = detect_query_mode(qtext)
        if mode == "simple":
            n_docs, avgdl = _corpus_stats(sf_dir)
            t2q = {t: [qid] for t in set(qtext.split())}
            out = _topk_by_qid(_bm25_scores(sf_dir, n_docs, avgdl, t2q), k)
            for _, r in out.iterrows():
                rows.append((qid, mode, int(r["rank"]), int(r["doc_id"]),
                             round4(float(r["score"]))))
        elif mode == "boolean":
            hits = boolean_parsed(sf_dir, expr=qtext)["doc_id"]
            rows += [(qid, mode, i, int(d), 0.0)
                     for i, d in enumerate(hits, 1)]
        else:  # field
            parts = qtext.split()
            fields = dict(p.split(":", 1) for p in parts if ":" in p)
            terms = [p for p in parts if ":" not in p]
            base = boolean_and(sf_dir, terms)["doc_id"] if terms else None
            tset = pa.array(sorted(base.astype(np.int64))) if base is not None else None
            docs = _docs_ds(sf_dir, ["doc_id", *fields])

            def f(t: pa.Table) -> pa.Table:
                m = None
                for fld, val in fields.items():
                    e = pa.compute.equal(t.column(fld), val)
                    m = e if m is None else pa.compute.and_(m, e)
                t = t.filter(m)
                if tset is not None:
                    t = t.filter(pa.compute.is_in(t.column("doc_id"), value_set=tset))
                return t.select(["doc_id"])

            hits = (docs.map_batches(f, batch_format="pyarrow").to_pandas()
                        .sort_values("doc_id")["doc_id"])
            rows += [(qid, mode, i, int(d), 0.0)
                     for i, d in enumerate(hits, 1)]
    return pd.DataFrame(rows, columns=["qid", "mode", "rank", "doc_id", "score"])


# --------------------------------------------- numeric-range facet

NUMERIC_FACET_BUCKETS = ((0, 200, "0-199"), (200, 400, "200-399"),
                         (400, 10**9, "400+"))


def facet_numeric_ranges(sf_dir: str, field: str = "n_chars",
                         buckets=NUMERIC_FACET_BUCKETS) -> pd.DataFrame:
    """Numeric range facet (facet_engine.py:426-497): inclusive lower
    bound, exclusive upper bound, configured bucket order, empty buckets
    dropped.  Per-batch vectorized bucket counts (one histogram per
    batch) -> a bucket-count aggregate; only |buckets| rows shuffle."""
    from ray.data.aggregate import Sum

    edges = np.array([b[0] for b in buckets] + [buckets[-1][1]], dtype=np.float64)
    labels = [b[2] for b in buckets]

    def count_batch(t: pa.Table) -> pa.Table:
        v = t.column(field).to_numpy(zero_copy_only=False).astype(np.float64)
        counts = np.zeros(len(labels), np.int64)
        if len(v):
            idx = np.searchsorted(edges, v, side="right") - 1
            valid = (idx >= 0) & (idx < len(labels))
            iv, vv = idx[valid], v[valid]
            iv = iv[vv < edges[iv + 1]]  # exclusive upper bound
            counts = np.bincount(iv, minlength=len(labels)).astype(np.int64)
        return pa.table({"label": pa.array(labels, pa.string()),
                         "n": pa.array(counts, pa.int64())})

    agg = (_docs_ds(sf_dir, [field])
           .map_batches(count_batch, batch_format="pyarrow")
           .groupby("label").aggregate(Sum("n", alias_name="count"))
           .to_pandas())
    agg = agg[agg["count"] > 0]
    order = {lb: i for i, lb in enumerate(labels)}
    agg = agg.sort_values("label", key=lambda s: s.map(order)).reset_index(drop=True)
    agg["count"] = agg["count"].astype(np.int64)
    return agg[["label", "count"]]


def keyword_eval(sf_dir: str, k: int = 5) -> pd.DataFrame:
    """Per-doc keyword-extraction evaluation (evaluator.py:146-515):
    extracted = YAKE unigram top-k, gold = top-k terms by raw tf (tie:
    term asc); metrics = precision/recall/F1 vs gold + occurrence-
    weighted coverage of the doc's tokens.  (Diversity is identically 1
    for distinct unigram lists, so it is unit-tested on phrase lists in
    functions/keyword_eval.py rather than reported here.)

    Everything is computed inside ONE map_batches over the positional
    tokens stream — extraction, gold and metrics share the per-doc row;
    nothing shuffles."""
    from ..functions.keyword_eval import precision_recall_f1
    from ..functions.yake import yake_unigram_scores

    toks = _tokens_ds(sf_dir, with_positions=True)

    def ev(t: pa.Table) -> pa.Table:
        ids, ps, rs, f1s, covs = [], [], [], [], []
        for row in t.to_pylist():
            terms, tfs = row["terms"], row["tfs"]
            ext = [term for term, _ in
                   yake_unigram_scores(terms, row["positions"])[:k]]
            order = sorted(range(len(terms)), key=lambda i: (-tfs[i], terms[i]))
            gold = [terms[i] for i in order[:k]]
            p, r, f1 = precision_recall_f1(ext, gold)
            tfmap = dict(zip(terms, tfs))
            total = float(sum(tfs))
            cov = sum(tfmap[x] for x in ext) / total if total else 0.0
            ids.append(row["doc_id"]); ps.append(round4(p))
            rs.append(round4(r)); f1s.append(round4(f1)); covs.append(round4(cov))
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "p_at_k": pa.array(ps, pa.float64()),
                         "r_at_k": pa.array(rs, pa.float64()),
                         "f1": pa.array(f1s, pa.float64()),
                         "coverage": pa.array(covs, pa.float64())})

    return toks.map_batches(ev, batch_format="pyarrow").to_pandas() \
               .sort_values("doc_id").reset_index(drop=True)


KWIC_KEYWORD = "spark"
KWIC_WIDTH = 30


def kwic_contexts_query(sf_dir: str, keyword: str = KWIC_KEYWORD,
                        window_type: str = "fixed",
                        window_size: int = KWIC_WIDTH) -> pd.DataFrame:
    """First KWIC match of ``keyword`` per doc with mode-specific contexts
    (dynamic.py KWICGenerator, window modes :302-413).  The ``fixed``
    mode is oracle-checked; sentence/adaptive share the same kernel and
    are golden-tested (tests/test_snippets.py)."""
    from ..functions.snippets import kwic_matches

    def k(t: pa.Table) -> pa.Table:
        ids, pos, lefts, kws, rights = [], [], [], [], []
        for row in t.to_pylist():
            for m in kwic_matches(row["text"], keyword, window_type,
                                  window_size, max_matches=1):
                ids.append(row["doc_id"])
                pos.append(m["position"])
                lefts.append(m["left"])
                kws.append(m["keyword"])
                rights.append(m["right"])
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "position": pa.array(pos, pa.int64()),
                         "left_ctx": pa.array(lefts, pa.string()),
                         "keyword": pa.array(kws, pa.string()),
                         "right_ctx": pa.array(rights, pa.string())})

    return _docs_ds(sf_dir, ["doc_id", "text"]) \
        .map_batches(k, batch_format="pyarrow").to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)


def _hist_stats(values: np.ndarray, counts: np.ndarray) -> tuple:
    """(min, max, mean, median) EXACTLY from a value->count histogram —
    the distributed form of corpus_audit_service._numeric_stats
    (statistics.fmean / statistics.median semantics)."""
    order = np.argsort(values)
    v, c = values[order].astype(np.float64), counts[order].astype(np.int64)
    n = int(c.sum())
    cum = np.cumsum(c)
    mean = float((v * c).sum()) / n

    def at(pos_1based: int) -> float:  # value holding the k-th sorted slot
        return float(v[np.searchsorted(cum, pos_1based)])

    if n % 2 == 1:
        med = at((n + 1) // 2)
    else:
        med = (at(n // 2) + at(n // 2 + 1)) / 2.0
    return float(v[0]), float(v[-1]), mean, med


def corpus_audit(sf_dir: str) -> pd.DataFrame:
    """One-row corpus audit (corpus_audit_service.py:45-256): doc count,
    empty-after-clean count, content-char and token-length
    min/max/mean/median, distinct content hashes and duplicate count.

    Distributed shape: both length distributions reduce to value->count
    HISTOGRAMS (bounded domains) via the partial-sum pattern, so exact
    medians come from a cumsum over the tiny histogram instead of a
    global sort; the distinct-hash count is a partial-count stream whose
    row count is taken without collecting.
    """
    from ..functions.hashing import md5_hex
    from ..functions.textnorm import clean_text

    docs = _docs_ds(sf_dir, ["text", "n_chars"])

    def chars_and_flags(t: pa.Table) -> pa.Table:
        texts = t.column("text").to_pylist()
        return pa.table({
            "n_chars": t.column("n_chars"),
            "empty": pa.array([1 if clean_text(x or "") == "" else 0
                               for x in texts], pa.int64()),
            "h": pa.array([md5_hex(x or "") for x in texts], pa.string()),
        })

    enriched = docs.map_batches(chars_and_flags, batch_format="pyarrow").materialize()
    chist = _sum_by(enriched, ("n_chars",), ("empty",), counts=("c",)).to_pandas()
    n_empty = int(chist["empty"].sum())
    cmin, cmax, cmean, cmed = _hist_stats(chist["n_chars"].to_numpy(),
                                          chist["c"].to_numpy())
    unique_hashes = int(_sum_by(enriched, ("h",), (), counts=("c",)).count())

    thist = _sum_by(_tokens_ds(sf_dir), ("doc_len",), (), counts=("c",)).to_pandas()
    tmin, tmax, tmean, tmed = _hist_stats(thist["doc_len"].to_numpy(),
                                          thist["c"].to_numpy())
    n = int(chist["c"].sum())
    return pd.DataFrame([{
        "total_documents": n,
        "empty_docs": n_empty,
        "chars_min": int(cmin), "chars_max": int(cmax),
        "chars_mean": round4(cmean), "chars_median": round4(cmed),
        "tokens_min": int(tmin), "tokens_max": int(tmax),
        "tokens_mean": round4(tmean), "tokens_median": round4(tmed),
        "unique_hashes": unique_hashes,
        "duplicate_hashes": n - unique_hashes,
    }])


def explain_scores(sf_dir: str) -> pd.DataFrame:
    """Per-term BM25 score breakdown for each fixed query's rank-1 doc
    (ranking_diagnostics_service.py:24-134 'explain': term-level
    contributions + total).  Columns: qid, doc_id, term, tf, df, idf,
    contribution, total_score.

    Distributed shape: the rank-1 docs come from the standard scoring
    pipeline; the breakdown streams only the (query-term x chosen-doc)
    postings — a double-pruned filter, never the corpus."""
    n_docs, avgdl = _corpus_stats(sf_dir)
    top = bm25_topk(sf_dir, k=1)
    chosen = {r["qid"]: int(r["doc_id"]) for _, r in top.iterrows()}
    qterms = sorted({t for ts in FIXED_QUERIES.values() for t in ts})
    df_map = _df_for_terms(sf_dir, qterms)

    ex = _exploded_ds(sf_dir)
    tset = pa.array(qterms)
    dset = pa.array(sorted(set(chosen.values())))
    rows = ex.map_batches(
        lambda t: t.filter(pa.compute.and_(
            pa.compute.is_in(t.column("term"), value_set=tset),
            pa.compute.is_in(t.column("doc_id"), value_set=dset))),
        batch_format="pyarrow").to_pandas()
    posting = {(r["term"], int(r["doc_id"])): (int(r["tf"]), int(r["dl"]))
               for _, r in rows.iterrows()}

    out = []
    for qid, terms in FIXED_QUERIES.items():
        doc = chosen[qid]
        total = 0.0
        contribs = []
        for term in terms:
            tf, dl = posting.get((term, doc), (0, 0))
            if tf == 0:
                continue
            df = df_map.get(term, 0)
            idf = math.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)
            c = idf * tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * dl / avgdl))
            total += c
            contribs.append((term, tf, df, idf, c))
        for term, tf, df, idf, c in contribs:
            out.append({"qid": qid, "doc_id": doc, "term": term,
                        "tf": tf, "df": df, "idf": round4(idf),
                        "contribution": round4(c),
                        "total_score": round4(total)})
    return (pd.DataFrame(out)
            .sort_values(["qid", "term"]).reset_index(drop=True))


def media_features_real(sf_dir: str) -> pd.DataFrame:
    """REAL multimodal decode path: synthetic WAV payloads decoded with
    the stdlib wave module, PPM/PNG/baseline-JPEG images decoded with
    pure numpy+stdlib codecs (functions/jpeg.py, stages/multimodal.py),
    then real signal/image features (duration/RMS/ZCR/spectral
    centroid; RGB moments + luminance histogram) — same actor-pool
    stage interface as the stubbed decoders.  Rows-only check; feature
    values and codec bit-exactness asserted in unit tests."""
    import ray.data as rd

    from ..stages.multimodal import RealMediaFeatureStage, make_real_media_table

    ds = rd.from_arrow(make_real_media_table(n=32, seed=5))
    out = ds.map_batches(RealMediaFeatureStage(out_dim=16), batch_format="pyarrow",
                         batch_size=8, concurrency=2).to_pandas()
    out["feat_norm"] = out["feature"].map(lambda f: round4(float(np.linalg.norm(f))))
    out["feat_dim"] = out["feature"].map(len)
    return out[["media_id", "feat_dim", "feat_norm"]] \
        .sort_values("media_id").reset_index(drop=True)
