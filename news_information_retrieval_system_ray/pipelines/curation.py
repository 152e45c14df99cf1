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
