"""Training-data curation operators (beyond-reference scale surface).

The operations a 100-TB LLM-training-data pipeline runs between "raw
crawl" and "tokenizer input", composed from the engine's existing
kernels (md5 hashing conventions from functions/hashing.py, the
doc_quality aggregate, exact-dedup groups from stages/dedup.py):

- ``train_split``: deterministic hash-based train/val/test assignment —
  ``md5("split:{doc_id}")`` first-8-bytes uint64 mod 100 buckets,
  bucket 0 -> test, 1 -> val, else train (98/1/1).  Pure per-batch map:
  no shuffle, stable across runs/cluster sizes/epochs, exactly the
  property a resumable multi-node ingest needs.
- ``train_shuffle_head``: seeded epoch shuffle order — rank docs by
  ``md5("{seed}:{doc_id}")``; returns the first K of the epoch order
  via per-batch partial top-k + tiny driver merge (the ann.py partial
  top-k pattern; a full epoch ordering at scale is the same key used
  as a sort key).  64-bit keys travel as fixed-width hex strings (the
  fingerprints convention: uint64 doesn't survive int64 casts).
- ``corpus_curate``: the keep/drop composite — exact-dup (non-keeper of
  an md5(text) group), language filter, token-count band, distinct-
  ratio floor, applied in fixed precedence so every doc gets exactly
  one status.  Quality counts ride the doc_quality aggregate; dup
  keepers come from the dedup groupby; both join back on hash-
  partitioned keys (no driver-built broadcast sets).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

# split thresholds (bucket space 100)
SPLIT_TEST_LT = 1    # bucket 0          -> test  (1%)
SPLIT_VAL_LT = 2     # bucket 1          -> val   (1%)
SPLIT_SALT = "split"

SHUFFLE_SEED = "epoch1"
SHUFFLE_HEAD_K = 100

# curation rule thresholds (documented precedence: dup > lang > short
# > long > lowq > keep)
CURATE_LANG = "en"
CURATE_MIN_TOKENS = 15
CURATE_MAX_TOKENS = 80
# low-quality: distinct_ratio < 0.5, compared as integers (2*nd < n)
# so no float threshold enters the oracle hash
CURATE_LOWQ_NUM = 2


def _md5_u64(s: str) -> int:
    return int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:8], "big")


def _md5_hex16(s: str) -> str:
    return hashlib.md5(s.encode("utf-8")).hexdigest()[:16]


def train_split(sf_dir: str):
    """(doc_id, bucket, split) for every document — deterministic
    98/1/1 hash split, a pure narrow map (no shuffle at any scale)."""
    from .analytics import _docs_ds

    def _batch(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        buckets = np.fromiter(
            (_md5_u64(f"{SPLIT_SALT}:{i}") % 100 for i in ids),
            dtype=np.int64, count=len(ids))
        split = np.select([buckets < SPLIT_TEST_LT, buckets < SPLIT_VAL_LT],
                          ["test", "val"], "train")
        return pa.table({"doc_id": t.column("doc_id"),
                         "bucket": pa.array(buckets),
                         "split": pa.array(split.tolist(), pa.string())})

    return _docs_ds(sf_dir, ["doc_id"]).map_batches(_batch, batch_format="pyarrow")


def train_shuffle_head(sf_dir: str, seed: str = SHUFFLE_SEED,
                       k: int = SHUFFLE_HEAD_K) -> pd.DataFrame:
    """(pos, doc_id, key_hex) — the first ``k`` documents of the seeded
    epoch-shuffle order.  Per-batch partial top-k: only k rows per batch
    reach the driver merge, never the corpus."""
    from .analytics import _docs_ds

    def _batch(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        keys = [_md5_hex16(f"{seed}:{i}") for i in ids]
        order = sorted(range(len(ids)), key=lambda j: (keys[j], ids[j]))[:k]
        return pa.table({
            "doc_id": pa.array([int(ids[j]) for j in order], pa.int64()),
            "key_hex": pa.array([keys[j] for j in order], pa.string())})

    parts = _docs_ds(sf_dir, ["doc_id"]).map_batches(
        _batch, batch_format="pyarrow").to_pandas()
    head = parts.sort_values(["key_hex", "doc_id"]).head(k).reset_index(drop=True)
    head.insert(0, "pos", np.arange(1, len(head) + 1, dtype=np.int64))
    return head


STRATA_N = 5                # stratified sample size per source
MIX_SALT = "mix"
# per-source sampling rates (data mixing: up/down-weight sources);
# sources not listed use MIX_DEFAULT_RATE
MIX_RATES = {"src0": 1.0, "src1": 0.5, "src2": 0.25}
MIX_DEFAULT_RATE = 0.1
MIX_SCALE = 10000


def stratified_sample(sf_dir: str, n_per_source: int = STRATA_N):
    """(source, doc_id, skey) — a deterministic n-per-source sample:
    within each source keep the n docs with the smallest
    ``md5("{salt}:{doc_id}")`` keys (hash order = a uniform but
    reproducible draw).  Per-batch partial top-n per source, then a
    tiny per-source merge — the groupby ships <= n rows per (batch,
    source), never the corpus."""
    from .analytics import _docs_ds

    def _batch(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "source": t.column("source").to_pandas(),
            "doc_id": t.column("doc_id").to_pandas()})
        df["skey"] = [_md5_hex16(f"{SPLIT_SALT}:{i}") for i in df["doc_id"]]
        part = df.sort_values(["source", "skey", "doc_id"]) \
            .groupby("source", sort=False).head(n_per_source)
        return pa.Table.from_pandas(part, preserve_index=False)

    parts = _docs_ds(sf_dir, ["doc_id", "source"]).map_batches(
        _batch, batch_format="pyarrow").to_pandas()
    out = parts.sort_values(["source", "skey", "doc_id"]) \
        .groupby("source", sort=False).head(n_per_source)
    return out.sort_values(["source", "skey"]).reset_index(drop=True) \
        .astype({"doc_id": np.int64})


def source_mix_sample(sf_dir: str):
    """(doc_id, source, keep) — source-weighted mixing: keep a doc when
    ``md5("mix:{doc_id}") % 10000 < rate(source) * 10000`` (per-source
    up/down-sampling with a deterministic, resume-stable draw).  Pure
    narrow map — no shuffle at any scale."""
    from .analytics import _docs_ds

    def _batch(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        srcs = t.column("source").to_pylist()
        draws = np.fromiter((_md5_u64(f"{MIX_SALT}:{i}") % MIX_SCALE
                             for i in ids), np.int64, count=len(ids))
        cuts = np.fromiter(
            (int(MIX_RATES.get(s, MIX_DEFAULT_RATE) * MIX_SCALE)
             for s in srcs), np.int64, count=len(srcs))
        return pa.table({
            "doc_id": t.column("doc_id"),
            "source": t.column("source"),
            "keep": pa.array((draws < cuts).astype(np.int64))})

    return _docs_ds(sf_dir, ["doc_id", "source"]).map_batches(
        _batch, batch_format="pyarrow")


PPL_THRESHOLD = 30.0   # high-perplexity flag cutoff (fixture-scaled)


def perplexity_filter(sf_dir: str, threshold: float = PPL_THRESHOLD):
    """(doc_id, ppl, high_ppl) — CCNet-style LM quality gate: Laplace
    bigram perplexity of every document under the corpus-trained model
    (functions/ngram_lm.NGramLM; training counts are the SAME
    distributed aggregates the collocation/LM queries use), flagging
    docs above ``threshold``.  Scoring is a pure per-batch map with the
    (vocab-sized) count tables riding the task closure — at web scale
    the count tables would be pruned/quantized before broadcast (CCNet
    ships a fixed KenLM binary the same way).  Docs with no tokens are
    skipped (perplexity undefined)."""
    from ..functions.ngram_lm import NGramLM
    from ..functions.textnorm import normalize_text
    from ..functions.tokenize import get_tokenizer
    from .analytics import _bigram_counts, _docs_ds, round4

    pair_counts, cf, _, _ = _bigram_counts(sf_dir)
    ngrams = {(a, b): int(n) for a, b, n in
              zip(pair_counts["w1"], pair_counts["w2"], pair_counts["n_ab"])}
    ctx = pair_counts.groupby("w1")["n_ab"].sum()
    contexts = {(w,): int(n) for w, n in ctx.items()}
    model = NGramLM.from_counts(2, ngrams, contexts, cf, smoothing="laplace")
    tokenize = get_tokenizer("whitespace")

    def _batch(t: pa.Table) -> pa.Table:
        ids, ppls, flags = [], [], []
        for i, txt in zip(t.column("doc_id").to_pylist(),
                          t.column("text").to_pylist()):
            toks = tokenize(normalize_text(txt or ""))
            if not toks:
                continue
            p = model.perplexity(toks)
            ids.append(i)
            ppls.append(round4(p))
            flags.append(1 if p > threshold else 0)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "ppl": pa.array(ppls, pa.float64()),
                         "high_ppl": pa.array(flags, pa.int64())})

    return _docs_ds(sf_dir, ["doc_id", "text"]).map_batches(
        _batch, batch_format="pyarrow")


def llm_corpus_pipeline(sf_dir: str, ppl_threshold: float = PPL_THRESHOLD):
    """(doc_id, split, n_tokens, seq_id) — the END-TO-END training-data
    pipeline over the raw corpus, composing this module's stages:

    1. ``corpus_curate`` keep/drop (dup > lang > length band > quality);
    2. drop every doc sharing an eval-set shingle (``decontaminate``,
       including the benchmark docs themselves);
    3. drop high-perplexity docs (``perplexity_filter`` LM gate);
    4. deterministic ``train_split`` hash assignment on the survivors;
    5. per-SPLIT sequence packing: ``seq_id = floor(tokens_before_me /
       PACK_SEQ_TOKENS)`` over doc_id order within each split (train /
       val / test shard streams pack independently).

    Composition is Dataset joins end-to-end: the keep set is curate
    filtered to 'keep' LEFT-ANTI-joined against the decontamination and
    perplexity flag sets; the split is a narrow map; packing reuses the
    two-pass bucket prefix sum, partitioned by (split, bucket).  Every
    stage's semantics are individually oracle-checked; this entry
    oracle-checks the composition."""
    from .analytics import _corpus_stats

    # materialize each stage before the next join: curate's own lineage
    # already holds two hash-shuffle joins, and fusing further joins
    # into one streaming DAG deadlocks when the shuffle actor pools
    # cannot all co-schedule on a small CPU budget (also a natural
    # per-stage checkpoint; the kept set is 2 narrow columns)
    cur = corpus_curate(sf_dir).map_batches(
        lambda t: t.filter(pa.compute.equal(t.column("status"), "keep"))
        .select(["doc_id", "n_tokens"]),
        batch_format="pyarrow").materialize()
    decon = decontaminate(sf_dir).select_columns(["doc_id"]).repartition(2)
    highppl = perplexity_filter(sf_dir, threshold=ppl_threshold).map_batches(
        lambda t: t.filter(pa.compute.equal(t.column("high_ppl"), 1))
        .select(["doc_id"]), batch_format="pyarrow").repartition(2)
    kept = cur
    for flagged in (decon, highppl):
        # an EMPTY right side breaks the arrow anti join (zero-schema
        # blocks) and means "drop nothing"; the flag sets are tiny so
        # the count is cheap.  materialize() after each join: chained
        # hash-shuffle joins in ONE streaming DAG deadlock when the
        # aggregator actor pools can't all co-schedule on a small CPU
        # budget — sequencing the shuffles also gives the pipeline a
        # natural per-stage checkpoint (the kept set is 3 narrow cols)
        if flagged.count() > 0:
            kept = kept.join(flagged, "left_anti", num_partitions=8,
                             on=("doc_id",)).materialize()

    n_docs, _ = _corpus_stats(sf_dir)
    shift = min(20, max(PACK_BUCKET_SHIFT,
                        (max(1, n_docs // PACK_TARGET_BUCKETS)).bit_length()))

    def _assign(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        buckets = np.fromiter(
            (_md5_u64(f"{SPLIT_SALT}:{i}") % 100 for i in ids),
            dtype=np.int64, count=len(ids))
        split = np.select([buckets < SPLIT_TEST_LT, buckets < SPLIT_VAL_LT],
                          ["test", "val"], "train")
        return pa.table({
            "doc_id": t.column("doc_id"),
            "n_tokens": t.column("n_tokens"),
            "split": pa.array(split.tolist(), pa.string()),
            "bucket": pa.array(ids >> shift)})

    keyed = kept.map_batches(_assign, batch_format="pyarrow")
    sums = keyed.groupby(["split", "bucket"]).sum("n_tokens").to_pandas() \
        .sort_values(["split", "bucket"]).reset_index(drop=True)
    offsets: dict[tuple[str, int], int] = {}
    for split, g in sums.groupby("split", sort=True):
        csum = g["sum(n_tokens)"].cumsum().shift(1, fill_value=0)
        offsets.update({(split, int(b)): int(c)
                        for b, c in zip(g["bucket"], csum)})

    def _pack(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id").reset_index(drop=True)
        key = (g["split"].iloc[0], int(g["bucket"].iloc[0]))
        before = g["n_tokens"].cumsum().shift(1, fill_value=0) + offsets[key]
        return pd.DataFrame({
            "doc_id": g["doc_id"].astype(np.int64),
            "split": g["split"],
            "n_tokens": g["n_tokens"].astype(np.int64),
            "seq_id": (before // PACK_SEQ_TOKENS).astype(np.int64)})

    return keyed.groupby(["split", "bucket"]).map_groups(
        _pack, batch_format="pandas")


DECON_BENCH_DOC_IDS = (3, 7, 11)   # the pinned "eval set" docs
DECON_SHINGLE = 3                  # word n-gram size

PACK_SEQ_TOKENS = 512              # training-sequence token budget
PACK_BUCKET_SHIFT = 6              # MIN docs-per-bucket shift (64); the
PACK_TARGET_BUCKETS = 4096         # shift auto-scales so the driver's
                                   # offsets dict stays O(4k) at any
                                   # corpus size (seq_id output is
                                   # bucket-granularity-invariant)


def _doc_shingles(text: str) -> list[str]:
    """Ordered word 3-gram shingles of the filtered token stream (the
    _CTE ft tokenization: normalize -> whitespace -> [a-z0-9_] filter)."""
    from ..functions.textnorm import normalize_text
    from ..functions.tokenize import get_tokenizer

    toks = get_tokenizer("whitespace")(normalize_text(text or ""))
    return [" ".join(toks[i:i + DECON_SHINGLE])
            for i in range(len(toks) - DECON_SHINGLE + 1)]


def decontaminate(sf_dir: str):
    """(doc_id, n_matched) — documents sharing >= 1 word-3-gram shingle
    with the pinned benchmark docs (eval-set decontamination: training
    corpora must drop text that overlaps the eval set).  The benchmark
    shingle set is tiny (a handful of docs) and is read with a doc_id
    filter pushed into the scan, then rides each task as a broadcast
    frozenset; the corpus side is a pure per-batch map — no shuffle."""
    import pyarrow.compute as pc

    from .analytics import _docs_ds

    bench_set = pa.array(sorted(DECON_BENCH_DOC_IDS))
    bench_rows = _docs_ds(sf_dir, ["doc_id", "text"]).map_batches(
        lambda t: t.filter(pc.is_in(t.column("doc_id"), value_set=bench_set)),
        batch_format="pyarrow").take_all()
    bench = frozenset(g for r in bench_rows for g in _doc_shingles(r["text"]))

    def _batch(t: pa.Table) -> pa.Table:
        ids, hits = [], []
        for i, txt in zip(t.column("doc_id").to_pylist(),
                          t.column("text").to_pylist()):
            n = len(set(_doc_shingles(txt)) & bench)
            if n:
                ids.append(i)
                hits.append(n)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "n_matched": pa.array(hits, pa.int64())})

    return _docs_ds(sf_dir, ["doc_id", "text"]).map_batches(
        _batch, batch_format="pyarrow")


def pack_sequences(sf_dir: str):
    """(doc_id, n_tokens, seq_id) — document-order sequence packing:
    ``seq_id = floor(tokens_before_me / PACK_SEQ_TOKENS)`` over the
    global doc_id order (the deterministic chunk assignment a training
    loader uses to slice a corpus into ~fixed-token shards).

    Distributed prefix sum, two passes: (1) per-bucket token sums via a
    small groupby (buckets = contiguous doc_id ranges; the bucket shift
    auto-scales so there are O(PACK_TARGET_BUCKETS) buckets at any
    corpus size — seq_id does not depend on the granularity), cumsum'd
    on the driver into per-bucket offsets; (2) a
    groupby(bucket).map_groups within-bucket scan adds the offset.  No
    pass materializes the corpus; the only all-to-all moves one row per
    doc of 3 ints."""
    from .analytics import _corpus_stats, doc_quality

    n_docs, _ = _corpus_stats(sf_dir)
    # clamp docs-per-bucket to [2^6, 2^20]: the upper bound keeps one
    # bucket's rows inside a single map_groups task; past ~10^9 buckets
    # the offsets dict itself would need one more scan level (noted)
    shift = min(20, max(PACK_BUCKET_SHIFT,
                        (max(1, n_docs // PACK_TARGET_BUCKETS)).bit_length()))
    q = doc_quality(sf_dir).select_columns(["doc_id", "n_tokens"])
    q = q.map_batches(
        lambda t: t.append_column(
            "bucket", pa.compute.shift_right(t.column("doc_id"), shift)),
        batch_format="pyarrow")
    sums = q.groupby("bucket").sum("n_tokens").to_pandas() \
        .sort_values("bucket").reset_index(drop=True)
    csum = sums["sum(n_tokens)"].cumsum().shift(1, fill_value=0)
    offsets = dict(zip(sums["bucket"].astype(int), csum.astype(int)))

    def _pack(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id").reset_index(drop=True)
        before = g["n_tokens"].cumsum().shift(1, fill_value=0) \
            + offsets[int(g["bucket"].iloc[0])]
        return pd.DataFrame({
            "doc_id": g["doc_id"].astype(np.int64),
            "n_tokens": g["n_tokens"].astype(np.int64),
            "seq_id": (before // PACK_SEQ_TOKENS).astype(np.int64)})

    return q.groupby("bucket").map_groups(_pack, batch_format="pandas")


def corpus_curate(sf_dir: str):
    """(doc_id, n_tokens, status) — keep/drop with one status per doc.

    Precedence (first match wins): ``drop_dup`` (not the min-doc_id
    keeper of its md5(text) group), ``drop_lang`` (lang != 'en'),
    ``drop_short`` / ``drop_long`` (whitespace-token count outside
    [15, 80]), ``drop_lowq`` (distinct/total ratio < 0.5, integer
    compare), else ``keep``."""
    from ..stages.dedup import exact_dedup_groups
    from .analytics import _docs_ds, doc_quality

    docs = _docs_ds(sf_dir, ["doc_id", "lang", "text"])

    def _hash(t: pa.Table) -> pa.Table:
        hashes = [hashlib.md5((x or "").encode("utf-8")).hexdigest()
                  for x in t.column("text").to_pylist()]
        return pa.table({"doc_id": t.column("doc_id"),
                         "lang": t.column("lang"),
                         "content_hash": pa.array(hashes, pa.string())})

    hashed = docs.map_batches(_hash, batch_format="pyarrow")
    groups = exact_dedup_groups(_docs_ds(sf_dir, ["doc_id", "text"])) \
        .select_columns(["content_hash", "keeper_doc_id"]) \
        .repartition(2)  # merge empty zero-schema blocks (join quirk)
    # hash joins on content_hash then doc_id: both sides narrow,
    # hash-partitioned — no broadcast sets
    j = hashed.join(groups, "inner", num_partitions=8, on=("content_hash",)) \
        .repartition(2)  # ditto, before the chained join
    quality = doc_quality(sf_dir).select_columns(
        ["doc_id", "n_tokens", "n_distinct"]).repartition(2)
    j2 = j.join(quality, "inner", num_partitions=8, on=("doc_id",))

    def _status(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        keep_id = t.column("keeper_doc_id").to_numpy(zero_copy_only=False)
        lang = np.asarray(t.column("lang").to_pylist(), dtype=object)
        n = t.column("n_tokens").to_numpy(zero_copy_only=False).astype(np.int64)
        nd = t.column("n_distinct").to_numpy(zero_copy_only=False).astype(np.int64)
        status = np.select(
            [ids != keep_id, lang != CURATE_LANG, n < CURATE_MIN_TOKENS,
             n > CURATE_MAX_TOKENS, CURATE_LOWQ_NUM * nd < n],
            ["drop_dup", "drop_lang", "drop_short", "drop_long", "drop_lowq"],
            "keep")
        return pa.table({"doc_id": pa.array(ids.astype(np.int64)),
                         "n_tokens": pa.array(n),
                         "status": pa.array(status.tolist(), pa.string())})

    return j2.map_batches(_status, batch_format="pyarrow")
