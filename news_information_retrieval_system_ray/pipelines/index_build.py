"""Distributed inverted-index build (the north-rule pipeline).

Stages (each a Ray Data pipeline; persisted outputs are the resume
units, mirroring the reference's ``processed_files`` checkpoint
semantics, /root/reference/src/ir/index/incremental_builder.py:415-418):

1. **tokens** (per input shard, resumable): read row groups with
   deterministic doc_ids -> extract/normalize (map_batches, Arrow) ->
   tokenizer actor pool -> write ``tokens/shard=K/`` Parquet
   (atomic tmp+rename; a re-run skips completed shards).
2. **stats**: ``n_docs`` / ``avg_doc_length`` from the tokens table
   reading ONLY the ``doc_len`` column (column pruning; the reference's
   global mean, bm25.py:176).
3. **segments**: read tokens (files in doc-id order) -> PrePackTokens
   (map-side combine: explode + local sort + pack per batch) ->
   sort([term_hash, chunk, first_doc]) over compressed posting
   FRAGMENTS -> ``segments/`` Parquet sorted by term_hash, so
   query-time term lookups prune row groups via Parquet statistics.
   The stats aggregate and the collision check execute concurrently
   with this shuffle (independent jobs over the tokens table).

Scale notes (100 TB design): the term shuffle moves delta+VByte posting
fragments, not raw (doc, term) rows — ~10x fewer exchanged bytes and a
sort over ~vocab x n_batches rows instead of the token stream; heavy
terms are chunk-split so no single task materializes a full stopword
posting list; tokens/segments are partitioned Parquet so a failed run
resumes per shard. At sandbox scale everything runs identically on one
node.
"""

from __future__ import annotations

import os
import shutil
import sys
import time
from dataclasses import dataclass

from ..sources.readers import RowGroupItem, list_input_files, plan_row_groups, read_with_doc_ids
from ..stages.extract import ExtractNormalize
from ..stages.indexing import (ExplodeTokens, PackGroups, PackRuns,
                               PrePackTokens, RepackFragments)
from ..stages.tokenizer import TokenizeStage
from ..state.manifest import BuildManifest


@dataclass
class IndexBuildResult:
    index_dir: str
    n_docs: int
    avg_doc_length: float
    n_posting_rows: int
    resumed_shards: int


def _shard_items(items: list[RowGroupItem], n_shards: int) -> list[list[RowGroupItem]]:
    """Contiguous slices -> each shard covers a contiguous doc_id range."""
    n = len(items)
    n_shards = max(1, min(n_shards, n))
    per = (n + n_shards - 1) // n_shards
    return [items[i : i + per] for i in range(0, n, per)]



def vocab_uniq_terms(t):
    """Batch of tokens rows (``terms`` list column) -> unique
    (term_hash, term) pairs.  The hash is the int64 BIT-CAST of the
    uint64 token hash: Ray's hash-shuffle aggregate corrupts uint64
    keys > 2^63 (silently falls back to a pickled-object column);
    consumers bit-cast back via ``.view(np.uint64)``."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..functions.hashing import token_hash64

    flat = pc.list_flatten(t.column("terms"))
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    u = pc.unique(flat)
    hashes = np.fromiter((token_hash64(x) for x in u.to_pylist()),
                         dtype=np.uint64, count=len(u)).view(np.int64)
    return pa.table({"term_hash": pa.array(hashes), "term": u})


def vocab_check_and_project(t):
    """Aggregated (term_hash, t_min, t_max) -> (term_hash, term) vocab
    rows; raises on a 64-bit collision (min != max within a hash group).
    Ray's Min/Max on strings yields a pickled-object extension column,
    so coerce back to native arrow strings first."""
    import pyarrow as pa
    import pyarrow.compute as pc

    tmin = pa.array(t.column("t_min").to_pylist(), pa.string())
    tmax = pa.array(t.column("t_max").to_pylist(), pa.string())
    bad = pc.invert(pc.equal(tmin, tmax))
    if pc.any(bad).as_py():
        i = pc.index(bad, True).as_py()
        raise ValueError(
            "64-bit term-hash collision: "
            f"{tmin[i].as_py()!r} vs {tmax[i].as_py()!r}")
    return pa.table({"term_hash": t.column("term_hash"), "term": tmin})


def _vocab_aggregate(pairs_ds):
    """(term_hash, term) rows -> checked vocab dataset (one row per hash)."""
    from ray.data.aggregate import Max, Min

    return pairs_ds.groupby("term_hash") \
        .aggregate(Min("term", alias_name="t_min"), Max("term", alias_name="t_max")) \
        .map_batches(vocab_check_and_project, batch_format="pyarrow")


def hashcheck_pairs(t):
    """Batch of tokens rows -> unique (term_hash, alt) int64 pairs.

    The cheap default-on collision detector: both 64-bit hashes come
    from one MD5 (first/last 8 bytes), so two distinct terms sharing
    ``term_hash`` but differing in ``alt`` prove a collision, and a
    dual collision is ~2^-128 per pair.  No term STRINGS enter the
    check shuffle (the string vocab sidecar stays opt-in via
    ``build_vocab``).  int64 bit-cast as in ``vocab_uniq_terms``."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..functions.hashing import token_hash_pair

    flat = pc.list_flatten(t.column("terms"))
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    u = pc.unique(flat).to_pylist()
    pairs = np.fromiter((h for x in u for h in token_hash_pair(x)),
                        dtype=np.uint64, count=2 * len(u)).view(np.int64)
    return pa.table({"term_hash": pa.array(pairs[0::2]), "alt": pa.array(pairs[1::2])})


def hashcheck_verify(t):
    """Aggregated (term_hash, a_min, a_max) -> same pairs back; raises on
    a 64-bit collision (alt hashes differ within a term_hash group)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    bad = pc.invert(pc.equal(t.column("a_min"), t.column("a_max")))
    if pc.any(bad).as_py():
        i = pc.index(bad, True).as_py()
        raise ValueError(
            "64-bit term-hash collision detected (two distinct terms share "
            f"term_hash={t.column('term_hash')[i].as_py()}); rebuild with a "
            "wider key or inspect with build_vocab=True")
    return pa.table({"term_hash": t.column("term_hash"),
                     "alt": t.column("a_min")})


def hashpairs_from_cols(t):
    """Tokens batch -> unique (term_hash, alt) pairs from the tiny
    pre-computed ``hc_hash``/``hc_alt`` sidecar columns (TokenizeStage
    emit_hashpairs): no terms-column decode, no re-hashing.  Dedupes
    within the batch (map-side combine) so the downstream groupby sees
    ~vocab-size row counts, not vocab x n_batches."""
    import pyarrow as pa
    import pyarrow.compute as pc

    h = pc.list_flatten(t.column("hc_hash")).to_numpy(zero_copy_only=False)
    a = pc.list_flatten(t.column("hc_alt")).to_numpy(zero_copy_only=False)
    h, a = _uniq_pairs(h, a)
    return pa.table({"term_hash": pa.array(h), "alt": pa.array(a)})


def _uniq_pairs(h, a):
    import numpy as np

    o = np.lexsort((a, h))
    h, a = h[o], a[o]
    if h.size:
        keep = np.concatenate(([True], (np.diff(h) != 0) | (np.diff(a) != 0)))
        h, a = h[keep], a[keep]
    return h, a


def _compact_pairs(t):
    import pyarrow as pa

    h = t.column("term_hash").to_numpy(zero_copy_only=False)
    a = t.column("alt").to_numpy(zero_copy_only=False)
    h, a = _uniq_pairs(h, a)
    return pa.table({"term_hash": pa.array(h), "alt": pa.array(a)})


def _alt_edge_check(t):
    """Per-batch collision check over SORTED segments (term_hash, alt):
    raises on any within-batch adjacent mismatch, returns only the
    batch's first and last rows (the only groups that can span block
    boundaries in globally sorted data) for the driver-side cross-batch
    check.  ~2 rows out per batch — no shuffle anywhere."""
    import numpy as np
    import pyarrow as pa

    if len(t) == 0:
        return pa.table({"term_hash": pa.array([], pa.uint64()),
                         "alt": pa.array([], pa.uint64())})
    th = t.column("term_hash").to_numpy(zero_copy_only=False)
    alt = t.column("alt").to_numpy(zero_copy_only=False)
    bad = (th[1:] == th[:-1]) & (alt[1:] != alt[:-1])
    if bad.any():
        i = int(np.flatnonzero(bad)[0])
        raise ValueError(
            "64-bit term-hash collision detected (two distinct terms share "
            f"term_hash={int(th[i])}); rebuild with a wider key or inspect "
            "with build_vocab=True")
    keep = [0, len(t) - 1] if len(t) > 1 else [0]
    return pa.table({"term_hash": pa.array(th[keep]),
                     "alt": pa.array(alt[keep])})


def _verify_alt_sorted(seg_root: str) -> None:
    """Exact 64-bit term-hash collision check over the freshly SORTED
    segments table, replacing the former full-corpus hashcheck job: the
    ``alt`` passenger column rode the segments exchange, so equal hashes
    are adjacent and one linear scan of two pruned int columns suffices.
    Within-batch pairs are checked in :func:`_alt_edge_check` (and
    earlier in PrePack/Repack); cross-batch pairs reduce to the tiny
    per-batch edge rows collected here, because every sort output block
    is a contiguous key range — a hash spanning blocks sits at their
    edges."""
    import ray.data as rd

    edges = rd.read_parquet(seg_root, columns=["term_hash", "alt"]) \
              .map_batches(_alt_edge_check, batch_format="pyarrow") \
              .take_all()
    seen: dict[int, int] = {}
    for r in edges:
        h, a = int(r["term_hash"]), int(r["alt"])
        if seen.setdefault(h, a) != a:
            raise ValueError(
                "64-bit term-hash collision detected at a block boundary "
                f"(term_hash={h}); rebuild with a wider key or inspect "
                "with build_vocab=True")


def _verify_alt_global(seg_root: str) -> None:
    """Collision check across MULTIPLE sorted segment collections (the
    append layout: base ``segments/`` plus ``append_*/`` dirs, each
    sorted internally but not mutually) — harvest per-batch-unique
    (term_hash, alt) pairs from the two pruned columns and verify one
    alt per hash with a small groupby (~vocab-size rows, not corpus)."""
    import ray.data as rd

    pairs = rd.read_parquet(seg_root, columns=["term_hash", "alt"]) \
              .map_batches(_compact_pairs_cast, batch_format="pyarrow")
    # .count() drives the verify map_batches; it raises on a collision
    _hashcheck_aggregate(pairs).count()


def _compact_pairs_cast(t):
    """Like :func:`_compact_pairs` but bit-casts the uint64 segment
    columns to int64 first (the groupby aggregate's expected key type)."""
    import numpy as np
    import pyarrow as pa

    h = t.column("term_hash").to_numpy(zero_copy_only=False).view(np.int64)
    a = t.column("alt").to_numpy(zero_copy_only=False).view(np.int64)
    h, a = _uniq_pairs(h, a)
    return pa.table({"term_hash": pa.array(h), "alt": pa.array(a)})


def _tokens_have_hashpairs(tokens_root: str) -> bool:
    import glob as _glob

    import pyarrow.parquet as _pq

    files = sorted(_glob.glob(os.path.join(tokens_root, "**", "*.parquet"),
                              recursive=True))
    if not files:
        return False
    names = _pq.read_schema(files[0]).names
    return "hc_hash" in names and "hc_alt" in names


def _hashcheck_pairs_ds(tokens_root: str, num_blocks: int):
    """Dataset of (term_hash, alt) pairs for the collision check —
    from the pruned sidecar columns when the tokens layout has them,
    else by re-hashing the terms column (old-layout resume)."""
    import ray.data as rd

    if _tokens_have_hashpairs(tokens_root):
        # read just the sidecar columns, combine map-side, then compact
        # to ~one vocab per block before the (now tiny) groupby
        return rd.read_parquet(tokens_root, columns=["hc_hash", "hc_alt"]) \
                 .map_batches(hashpairs_from_cols, batch_format="pyarrow") \
                 .repartition(min(8, num_blocks)) \
                 .map_batches(_compact_pairs, batch_format="pyarrow")
    return rd.read_parquet(tokens_root, columns=["terms"],
                           override_num_blocks=num_blocks) \
             .map_batches(hashcheck_pairs, batch_format="pyarrow")


def _hashcheck_aggregate(pairs_ds):
    """(term_hash, alt) rows -> verified one-row-per-hash dataset."""
    from ray.data.aggregate import Max, Min

    return pairs_ds.groupby("term_hash") \
        .aggregate(Min("alt", alias_name="a_min"), Max("alt", alias_name="a_max")) \
        .map_batches(hashcheck_verify, batch_format="pyarrow")


# The flat segment layout ships ONE global doc-length sidecar (~6 B/doc
# via ray.put) to every repack task and lets every serving shard open
# every segment file.  That broadcast is fine to ~10^9 docs (a few GB of
# plasma, zero-copy reads); past it the chunkband-partitioned layout —
# per-band dl slices loaded by an actor pool, per-shard file-level IO
# isolation — must be the default, not an opt-in (r3 verdict item #5).
AUTO_CHUNKBAND_MIN_DOCS = 1 << 30
# band count sizes each band's doc-length slice to ~<=800 MB (2^27 docs
# x ~6 B), capped so the hive layout stays a sane file count
_AUTO_CHUNKBAND_DOCS_PER_BAND = 1 << 27
_AUTO_CHUNKBAND_MAX = 8192


def auto_chunkband_partitions(n_docs: int) -> int:
    """Banded-layout default for a corpus of ``n_docs``: 0 (flat) below
    ``AUTO_CHUNKBAND_MIN_DOCS``, else enough bands that each band's
    doc-length slice stays ~<=800 MB, capped at 8192 (at 10^12 docs:
    8192 bands x ~122M docs x 6 B ~= 730 MB/band)."""
    n_docs = int(n_docs)
    if n_docs <= AUTO_CHUNKBAND_MIN_DOCS:
        return 0
    return int(min(_AUTO_CHUNKBAND_MAX,
                   -(-n_docs // _AUTO_CHUNKBAND_DOCS_PER_BAND)))


def build_index(
    input_path: str | list[str],
    index_dir: str,
    *,
    text_source: str = "text",          # "html" -> extract; "text"/other -> use column as-is
    id_col: str | None = None,           # existing id column; None -> deterministic assignment
    engine: str = "cjk_bigram",
    block_size: int = 32,
    chunk_bits: int | None = None,       # None -> auto: ~8 chunks over the
                                         # corpus so stopword-class terms
                                         # split at ANY corpus size (SURVEY §7.5)
    n_shards: int = 4,
    with_positions: bool = False,
    stopword_lang: str | None = None,    # index-time stopword filter
                                         # ('zh' -> vendored TC set, 'en');
                                         # also applied query-side by the
                                         # searcher (stopwords.py:101-137)
    shuffle_blocks: int | None = None,       # blocks into the term shuffle;
                                             # None -> cluster CPU count (too
                                             # many tiny blocks inflate the
                                             # sort's coordination overhead)
    chunkband_partitions: int | None = None,  # >0: hive-partition segments by
                                             # chunkband = chunk % P so a
                                             # doc-shard serving actor reads
                                             # ONLY its own band's files (IO
                                             # isolation, pipelines/serve.py);
                                             # default layout only.  None ->
                                             # AUTO: flat below
                                             # AUTO_CHUNKBAND_MIN_DOCS input
                                             # rows, banded above (the
                                             # 10^12-doc-safe layout engages
                                             # by default at the scale where
                                             # the flat dl broadcast stops
                                             # being safe); 0 forces flat
    tokenize_batch_size: int | None = None,  # None -> one batch per row-group
                                             # block (the stage slices itself
                                             # into constant 1024-doc kernel
                                             # calls internally — Ray-level
                                             # rebatching here would gate the
                                             # fused loader and serialize reads)
    tokenize_concurrency: int | None = None,
    resume: bool = True,
    build_vocab: bool = False,           # (term_hash, term) STRING sidecar
                                         # (term recovery / debugging); the
                                         # default collision safety is the
                                         # cheaper collision_check below
    collision_check: bool = True,        # default-on 64-bit collision
                                         # detector: the alt hash rides the
                                         # segments sort as an 8-byte
                                         # passenger, verified by sorted
                                         # adjacency (_verify_alt_sorted) —
                                         # a silent collision would merge two
                                         # terms' posting lists (ADVICE r01).
                                         # positions layout keeps the
                                         # separate dual-hash pairs job.
    dedup_exact_first: bool = False,     # the reference's use_dedup flag
                                         # (incremental_builder.py:147-158):
                                         # exact content-hash dedup BEFORE
                                         # tokenization, first-wins by doc_id
    verbose: bool = False,
) -> IndexBuildResult:
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    files = list_input_files(input_path)
    if not files:
        raise FileNotFoundError(f"no parquet inputs under {input_path!r}")
    # Fail fast with a readable error instead of a mid-pipeline KeyError
    # when the input glob caught tables without the text/html column
    # (e.g. pointing --input at a directory of heterogeneous parquet).
    import pyarrow.parquet as pq

    needed = {"html", "url"} if text_source == "html" else \
        ({text_source} if text_source else set())
    if id_col:
        needed = needed | {id_col}
    est_rows = 0
    for f in files:
        pf = pq.ParquetFile(f)
        est_rows += pf.metadata.num_rows
        cols = set(pf.schema_arrow.names)
        missing = needed - cols
        if missing:
            raise ValueError(
                f"input file {f!r} lacks column(s) {sorted(missing)} "
                f"(has {sorted(cols)[:8]}...); pass the documents parquet "
                "itself, a glob matching only page files, or --html for "
                "raw-HTML inputs")
    if chunkband_partitions is None:
        # footer-metadata row estimate (pre-dedup/validation, which only
        # shrinks it — a coarse over-estimate is exactly right for a
        # scale threshold); positions layout has no banded variant
        chunkband_partitions = 0 if with_positions \
            else auto_chunkband_partitions(est_rows)
    config = {
        "text_source": text_source, "id_col": id_col, "engine": engine,
        "block_size": block_size, "chunk_bits": chunk_bits, "n_shards": n_shards,
        "with_positions": with_positions, "dedup_exact_first": dedup_exact_first,
        "stopword_lang": stopword_lang,
        "chunkband_partitions": int(chunkband_partitions),
    }
    if not resume and os.path.isdir(index_dir):
        shutil.rmtree(index_dir)
    os.makedirs(index_dir, exist_ok=True)
    manifest = BuildManifest(index_dir, files, config)

    t_start = time.perf_counter()

    def _v(msg: str) -> None:
        if verbose:
            print(f"[build_index +{time.perf_counter() - t_start:6.2f}s] {msg}",
                  file=sys.stderr, flush=True)

    # per-phase wall-clock metrics for THIS run (resumed phases show ~0),
    # persisted under manifest "metrics" next to the per-shard lineage
    phase_secs: dict[str, float] = {}
    _t_prev = [t_start]

    def _mark(phase: str) -> None:
        now = time.perf_counter()
        phase_secs[phase] = round(now - _t_prev[0], 3)
        _t_prev[0] = now

    items = plan_row_groups(files)
    shards = _shard_items(items, n_shards)
    tokens_root = os.path.join(index_dir, "tokens")
    os.makedirs(tokens_root, exist_ok=True)

    use_html = text_source == "html"
    read_cols = None
    if use_html:
        read_cols = ["url", "html"] + ([id_col] if id_col else [])
    elif text_source:
        read_cols = [text_source] + ([id_col] if id_col else [])

    if dedup_exact_first:
        # exact dedup BEFORE tokenization (incremental_builder.py:147-158;
        # the scalable form per SURVEY §7.5: hash-partition on the content
        # hash, keep the smallest doc_id per group = first-wins by arrival
        # order).  Survivors are re-written as the build corpus — the one
        # shuffle moves each surviving row once.
        dedup_dir = os.path.join(index_dir, "dedup_corpus")
        if not (manifest.state.get("dedup_done") and os.path.isdir(dedup_dir)):
            import hashlib as _hl

            import pyarrow as _pa

            from ..stages.dedup import exact_dup_partial

            items0 = plan_row_groups(files)
            ds0 = read_with_doc_ids(None, read_cols, items=items0, id_col=id_col)
            ds0 = ds0.map_batches(
                ExtractNormalize(text_col=text_source if not use_html else "text",
                                 use_html=use_html, keep_cols=("url", "doc_id")),
                batch_format="pyarrow",
            )

            def add_hash(t: "_pa.Table") -> "_pa.Table":
                hs = [_hl.md5((x or "").encode("utf-8")).hexdigest()
                      for x in t.column("text").to_pylist()]
                keep = [c for c in ("doc_id", "url", "text") if c in t.column_names]
                return t.select(keep).append_column("content_hash", _pa.array(hs, _pa.string()))

            # Scalable first-wins dedup (stages/dedup.py pattern — no
            # per-group pandas invocation): (1) hash the corpus once to
            # parquet, (2) per-batch partial (hash -> min doc_id) then a
            # tiny Min-aggregate groupby (only pre-aggregated rows
            # shuffle), (3) LEFT SEMI hash-join of rows against keeper
            # (hash, doc_id) pairs — distributed, no driver broadcast.
            from ray.data.aggregate import Min

            tmp_hashed = os.path.join(index_dir, ".tmp_hashed")
            shutil.rmtree(tmp_hashed, ignore_errors=True)
            ds0.map_batches(add_hash, batch_format="pyarrow").write_parquet(tmp_hashed)

            import ray.data as _rd

            hashed = _rd.read_parquet(tmp_hashed)
            keepers = (
                _rd.read_parquet(tmp_hashed, columns=["content_hash", "doc_id"])
                .map_batches(lambda b: exact_dup_partial(b), batch_format="pyarrow")
                .map_batches(lambda b: b.select(["content_hash", "keeper_doc_id"]),
                             batch_format="pyarrow")
                .groupby("content_hash")
                .aggregate(Min("keeper_doc_id", alias_name="keeper_doc_id"))
                # merge away the aggregate's empty zero-schema partitions —
                # they crash the downstream hash join (acero FieldRef)
                .repartition(max(2, min(8, n_shards // 8)))
            )
            survivors = hashed.join(
                keepers, "left_semi",
                num_partitions=max(8, n_shards // 8),
                on=("content_hash", "doc_id"),
                right_on=("content_hash", "keeper_doc_id"),
            ).drop_columns(["content_hash"])
            tmp = os.path.join(index_dir, ".tmp_dedup")
            shutil.rmtree(tmp, ignore_errors=True)
            survivors.write_parquet(tmp)
            shutil.rmtree(dedup_dir, ignore_errors=True)
            os.replace(tmp, dedup_dir)
            shutil.rmtree(tmp_hashed, ignore_errors=True)
            manifest.state["dedup_done"] = True
            manifest.save()
        _v("exact dedup done")
        _mark("dedup")
        # build proceeds from the deduped, already-extracted corpus
        files = list_input_files(dedup_dir)
        use_html = False
        text_source = "text"
        id_col = "doc_id"
        read_cols = ["text", "doc_id"]
        items = plan_row_groups(files)
        shards = _shard_items(items, n_shards)

    # One streaming pipeline over ALL pending shards (a sequential
    # per-shard loop would serialize the cluster); the ``shard`` column
    # drives a hive-partitioned write so each shard directory can still
    # be promoted atomically (tmp+rename) — per-shard resume granularity
    # is preserved without giving up whole-cluster parallelism.
    pending = [k for k in range(len(shards))
               if not (manifest.shard_done(k) and os.path.isdir(os.path.join(tokens_root, f"shard={k}")))]
    resumed = len(shards) - len(pending)
    if pending:
        tmp_root = os.path.join(tokens_root, ".tmp_write")
        shutil.rmtree(tmp_root, ignore_errors=True)
        items_w = [{**i.__dict__, "shard": k} for k in pending for i in shards[k]]
        ds = read_with_doc_ids(None, read_cols, items=items_w, id_col=id_col)
        ds = ds.map_batches(
            ExtractNormalize(text_col=text_source if not use_html else "text", use_html=use_html),
            batch_format="pyarrow",
        )
        tok_kwargs = dict(batch_format="pyarrow")
        if tokenize_batch_size:
            tok_kwargs["batch_size"] = tokenize_batch_size
        if tokenize_concurrency:
            tok_kwargs["concurrency"] = tokenize_concurrency
        ds = ds.map_batches(
            TokenizeStage(engine=engine, text_col="text_norm", pre_normalized=True,
                          with_positions=with_positions, stopword_lang=stopword_lang,
                          # both layouts: the collision check rides the
                          # segments sort (alt passenger), no sidecar
                          emit_hashpairs=False),
            **tok_kwargs,
        )
        ds.write_parquet(tmp_root, partition_cols=["shard"])
        for k in pending:
            src = os.path.join(tmp_root, f"shard={k}")
            dst = os.path.join(tokens_root, f"shard={k}")
            shutil.rmtree(dst, ignore_errors=True)
            os.replace(src, dst)
            manifest.mark_shard(k, rows=sum(i.num_rows for i in shards[k]),
                                inputs=sorted({i.path for i in shards[k]}), save=False)
        manifest.save()  # one atomic write for the whole promotion batch
        shutil.rmtree(tmp_root, ignore_errors=True)
    _v(f"tokens stage done ({len(pending)} shards built, {resumed} resumed)")
    _mark("tokens")

    # ---- global stats + collision check OVERLAP the segments shuffle.
    # Neither packing (block metadata stores raw tf/dl extremes, not
    # avgdl-dependent weights) nor the chunk-bits choice (n_docs is known
    # from the Parquet footers that planned the shards) depends on the
    # stats aggregate, and the collision check reads only its own tiny
    # sidecar columns — so all three are independent jobs over the tokens
    # table.  Ray Data runs concurrent streaming executions fine, but the
    # datasets must be PLANNED on the driver thread: concurrent
    # read_parquet resolution races on Ray's fsspec-http probe import
    # (aiohttp absent in this env, ImportError escapes Ray's
    # ModuleNotFoundError catch).  Plan serially, execute in threads.
    import threading

    n_docs_meta = manifest.stats["n_docs"] if manifest.stats else \
        sum(i.num_rows for i in items)
    side_errs: list[BaseException] = []
    side_threads: list[threading.Thread] = []

    def _spawn(fn, name: str) -> None:
        def _run():
            t0 = time.perf_counter()
            try:
                fn()
            except BaseException as e:  # re-raised on the main thread below
                side_errs.append(e)
            finally:  # per-side-job wall (overlaps segments; tail shows in
                side_results[f"{name}_secs"] = round(  # stats_collision)
                    time.perf_counter() - t0, 3)
        t = threading.Thread(target=_run, daemon=True)
        side_threads.append(t)
        t.start()

    side_results: dict = {}  # manifest is updated on the main thread only

    if manifest.stats is None:
        stats_ds = rd.read_parquet(tokens_root, columns=["doc_len"])

        def _run_stats():
            agg = stats_ds.aggregate(Sum("doc_len", alias_name="total_len"),
                                     Count(alias_name="n_docs"))
            side_results["stats"] = (int(agg["n_docs"]), int(agg["total_len"]))
        _spawn(_run_stats, "stats")

    # BOTH layouts now check collisions inside the segments exchange
    # itself (alt passenger + post-sort adjacency — _verify_alt_sorted);
    # the separate dual-hash pairs job survives only in append_index for
    # pre-alt-layout indexes (hashcheck/ directory present).

    # ---- segments (the wide shuffle; main thread) ----
    seg_dir = os.path.join(index_dir, "segments")
    n_rows = manifest.state.get("segments_rows", 0)
    if not manifest.segments_done:
        shutil.rmtree(seg_dir, ignore_errors=True)
        tmp_seg = os.path.join(index_dir, ".tmp_segments")
        shutil.rmtree(tmp_seg, ignore_errors=True)
        eff_chunk_bits = chunk_bits if chunk_bits is not None else \
            max(10, int(n_docs_meta).bit_length() - 3)
        manifest.state["eff_chunk_bits"] = eff_chunk_bits  # appends must reuse
        manifest.save()
        if shuffle_blocks is None:
            import ray

            shuffle_blocks = max(8, int(ray.cluster_resources().get("CPU", 8)))
        _segments_pipeline(
            tokens_root, tmp_seg, with_positions=with_positions,
            block_size=block_size, eff_chunk_bits=eff_chunk_bits,
            band_p=int(chunkband_partitions) if not with_positions else 0,
            emit_alt=collision_check, shuffle_blocks=shuffle_blocks,
            n_docs_est=int(n_docs_meta))
        if collision_check:
            manifest.state["alt_layout"] = True  # appends pick the
            manifest.save()                      # segments-side check
        os.replace(tmp_seg, seg_dir)
        n_rows = _count_rows(seg_dir)
        manifest.mark_segments(n_rows)
    _v(f"segments done ({n_rows} posting rows)")
    _mark("segments")

    for t in side_threads:
        t.join()
    if side_errs:
        raise side_errs[0]
    if "stats" in side_results:
        manifest.set_stats(*side_results["stats"])
    stats = manifest.stats
    avgdl = stats["avg_doc_length"]
    _v(f"stats done (n_docs={stats['n_docs']}, avgdl={avgdl:.1f})")
    _mark("stats_collision")

    # ---- vocab sidecar: (term_hash, term), the small side of the index.
    # Also the hash-collision check: two distinct terms sharing a 64-bit
    # hash would silently merge posting lists in the hash-only shuffle.
    vocab_dir = os.path.join(index_dir, "vocab")
    if build_vocab and not manifest.state.get("vocab_done"):
        tmp_vocab = os.path.join(index_dir, ".tmp_vocab")
        shutil.rmtree(tmp_vocab, ignore_errors=True)
        pairs = rd.read_parquet(tokens_root, columns=["terms"]) \
                  .map_batches(vocab_uniq_terms, batch_format="pyarrow")
        _vocab_aggregate(pairs).write_parquet(tmp_vocab)
        os.replace(tmp_vocab, vocab_dir)
        manifest.state["vocab_done"] = True
        manifest.save()
        _v("vocab sidecar done")
        _mark("vocab")

    total_s = round(time.perf_counter() - t_start, 3)
    if any(v > 0.05 for v in phase_secs.values()) \
            or "metrics" not in manifest.state:  # a no-op resume keeps the
        manifest.state["metrics"] = {            # real build's timings
            "phase_secs": phase_secs,            # this run; resumed phases ~0
            "side_job_secs": {k: v for k, v in side_results.items()
                              if k.endswith("_secs")},  # overlap segments
            "total_secs": total_s,
            "docs_per_sec": round(stats["n_docs"] / total_s, 1) if total_s else None,
            "posting_rows": n_rows,
            "shards_built": len(pending),
            "shards_resumed": resumed,
        }
        manifest.save()

    return IndexBuildResult(
        index_dir=index_dir,
        n_docs=stats["n_docs"],
        avg_doc_length=avgdl,
        n_posting_rows=n_rows,
        resumed_shards=resumed,
    )


def delete_docs(index_dir: str, doc_ids) -> int:
    """Tombstone deletion (Lucene-style liveness) — beyond-reference:
    the reference is append-only with no delete path at all.

    Appends the given doc_ids to ``<index_dir>/deletes/*.parquet``; no
    segment is rewritten.  Searchers (single, chunk-restricted shards,
    boolean/phrase) load the tombstone sidecar lazily and filter doc
    ids at the gather points, so deleted docs never enter a heap,
    intersection or phrase match.  SCORING SEMANTICS: global stats
    (n_docs, avg_doc_length, df/idf) intentionally keep their
    build-time values until a rebuild ("compaction" = re-running
    build_index on the remaining corpus) — the standard
    deleted-docs-affect-idf tradeoff every tombstone engine makes;
    surviving docs' scores are bit-identical before and after a delete.

    At 10^12-doc scale the sidecar stays tiny relative to the index
    (8 bytes/tombstone), each file carries doc_id footer stats for
    chunk-restricted pruning, and compaction is the existing resumable
    build.  Returns the number of NEW tombstones written (already-dead
    ids are dropped)."""
    import glob

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ..state.manifest import read_json

    manifest = read_json(os.path.join(index_dir, "manifest.json"))
    if manifest is None or manifest.get("stats") is None:
        raise FileNotFoundError(f"no completed index manifest in {index_dir}")
    # validate against the id-space BOUND, not the live count: after a
    # compaction the live ids are sparse up to the bound, and a doc with
    # id >= n_docs can be perfectly live (r4 review).  Ids inside the
    # bound that no longer exist are harmless no-ops at compaction time
    # (stats are derived from the actual surviving rows, never from
    # tombstone arithmetic).
    bound = int(manifest.get("id_space", manifest["stats"]["n_docs"]))
    ids = np.unique(np.asarray(list(doc_ids), dtype=np.int64))
    if ids.size and (ids[0] < 0 or ids[-1] >= bound):
        bad = ids[(ids < 0) | (ids >= bound)][:5].tolist()
        raise ValueError(f"doc_ids outside [0, {bound}): {bad}")
    ddir = os.path.join(index_dir, "deletes")
    os.makedirs(ddir, exist_ok=True)
    existing = sorted(glob.glob(os.path.join(ddir, "*.parquet")))
    if existing:
        old = np.concatenate([
            pq.read_table(f, columns=["doc_id"]).column("doc_id")
            .to_numpy(zero_copy_only=False) for f in existing])
        ids = np.setdiff1d(ids, old.astype(np.int64), assume_unique=False)
    if ids.size == 0:
        return 0
    # unique per-writer filename so two concurrent callers can never
    # compute the same path and silently overwrite each other's
    # tombstones (r4 ADVICE); readers glob the directory, so the name
    # only needs uniqueness, not a dense sequence.  The read-dedupe
    # above stays advisory — a lost race at worst re-records an id,
    # which every reader already de-duplicates.
    import uuid

    path = os.path.join(
        ddir, f"delete-{len(existing):05d}-{uuid.uuid4().hex[:8]}.parquet")
    tmp = path + ".tmp"
    pq.write_table(pa.table({"doc_id": pa.array(ids, pa.int64())}), tmp)
    os.replace(tmp, path)  # atomic like the segment promote
    return int(ids.size)


def _segments_pipeline(tokens_path: str, tmp_seg: str, *,
                       with_positions: bool, block_size: int,
                       eff_chunk_bits: int, band_p: int, emit_alt: bool,
                       shuffle_blocks: int, n_docs_est: int) -> None:
    """The segments exchange, shared by build_index and compact_index:
    prepack (map-side combine; dt fragments, dls sidecar) -> sort ->
    actor/task repack for the default layout, or explode -> sort ->
    PackRuns for the positional one; then the hive write (chunkband
    partitioning when banded) and the alt-passenger collision verify
    into ``tmp_seg`` (the caller promotes it atomically).  append_index
    keeps its own variant (base-layout format detection + single-shard
    scope).  See the inline rationale comments for the batch caps and
    byte-shape choices — they are the measured 100-TB-safe settings."""
    import ray.data as rd

    tok_cols = ["doc_id", "doc_len", "terms", "tfs"] \
        + (["positions"] if with_positions else [])
    shutil.rmtree(tmp_seg, ignore_errors=True)
    if not with_positions:
        # Map-side combine (PrePackTokens): explode + local sort + pack
        # per BATCH, so the wide exchange ships compressed posting
        # FRAGMENTS (~10x fewer bytes than raw (doc, term) rows).
        # batch_size is CAPPED at a constant: a pre-pack call over
        # n_docs/shuffle_blocks docs grows with the corpus and falls off
        # this host's allocator cliff under full concurrency; constant
        # per-task memory is also the only shape that survives 100 TB.
        # The fragment inflation is undone by RepackFragments post-sort.
        prepack_batch = max(1, min(4096, -(-int(n_docs_est) // shuffle_blocks)))
        prepacked = rd.read_parquet(
            _tokens_files_by_docid(tokens_path), columns=tok_cols,
            override_num_blocks=shuffle_blocks,
        ).map_batches(
            # dt fragments: the dls stream stays OUT of the wide
            # exchange (doc-length sidecar layout) — Repack gathers
            # lengths by doc id for the block metadata
            PrePackTokens(chunk_bits=eff_chunk_bits, block_size=block_size,
                          emit_alt=emit_alt, band_partitions=band_p),
            batch_format="pyarrow", batch_size=prepack_batch,
        )
        if band_p > 0:
            # banded build (the 10^12-doc shape): lead the sort with
            # the band key so each repack batch covers ~one band, and
            # repack as an ACTOR pool whose per-band dl slices load
            # lazily — no broadcast of the global length table
            packed = prepacked.sort(
                ["chunkband", "term_hash", "chunk", "first_doc"]
            ).map_batches(
                RepackFragments,
                fn_constructor_kwargs=dict(
                    block_size=block_size, tokens_path=tokens_path,
                    chunk_bits=eff_chunk_bits, band_partitions=band_p),
                batch_format="pyarrow", batch_size=8192,
                concurrency=(1, shuffle_blocks),
            )
        else:
            packed = prepacked.sort(
                ["term_hash", "chunk", "first_doc"]
            ).map_batches(
                RepackFragments(block_size=block_size,
                                doclens=_doclens_ref(tokens_path)),
                batch_format="pyarrow", batch_size=8192,
            )
    else:
        exploded = rd.read_parquet(
            _tokens_files_by_docid(tokens_path), columns=tok_cols,
            override_num_blocks=shuffle_blocks,
        ).map_batches(
            # hash-only shuffle: the term STRING never enters the wide
            # exchange; the alt collision passenger rides it (8 B/row)
            ExplodeTokens(chunk_bits=eff_chunk_bits,
                          with_positions=with_positions,
                          emit_term=False, emit_alt=emit_alt),
            batch_format="pyarrow",
        )
        # One sort shuffle, then the vectorized multi-run packer per
        # BATCH — batch-edge fragments have disjoint increasing doc
        # ranges, which the query-side merge already handles.  fmt="dt":
        # positional builds write the same combined delta+tf stream +
        # doc-length sidecar the default layout uses (measured −35%
        # stream bytes), with positions alongside; the reader detects
        # the format per row.
        packed = exploded.sort(["term_hash", "chunk", "doc_id"]).map_batches(
            PackRuns(block_size=block_size, with_positions=with_positions,
                     fmt="dt"),
            batch_format="pyarrow", batch_size=None,
        )
    # small row groups -> fine-grained predicate pushdown: a cold term
    # fetch decodes ~2k-row groups instead of whole files
    if band_p > 0:
        # IO-isolated serving layout: hive-partition by chunkband so
        # each doc-shard actor opens only its own band's files
        def _add_band(t, _p=band_p):
            import numpy as _np
            import pyarrow as _pa

            ch = t.column("chunk").to_numpy(zero_copy_only=False)
            return t.append_column(
                "chunkband", _pa.array((ch % _p).astype(_np.int32)))

        packed = packed.map_batches(_add_band, batch_format="pyarrow")
        packed.write_parquet(tmp_seg, partition_cols=["chunkband"],
                             row_group_size=2048)
    else:
        packed.write_parquet(tmp_seg, row_group_size=2048)
    if emit_alt:
        if band_p > 0:
            # partitioned layout: a term's chunk rows scatter across
            # band dirs mid-file — use the order-independent pairs check
            _verify_alt_global(tmp_seg)
        else:
            # one linear 2-column scan over the sorted segments
            _verify_alt_sorted(tmp_seg)


def compact_index(index_dir: str, *,
                  shuffle_blocks: int | None = None) -> "dict | None":
    """Rewrite the index without its tombstoned docs — the delete
    lifecycle's second half (``delete_docs`` is the first).

    Doc ids are UNCHANGED (the live id space just becomes sparse), so
    external doc references stay valid; what changes is the STATS:
    n_docs / avg_doc_length / df now reflect the live corpus, so BM25
    scores legitimately shift — a compacted index is rank/score
    -identical to an index built directly on the remaining docs with
    the same ids (equivalence-tested), unlike the frozen-stats
    tombstone phase.

    Flow (each artifact swapped by atomic rename; ``deletes/`` survives
    until the very end and stats derive from the ACTUAL surviving rows
    — never tombstone arithmetic — so a crashed compaction at any point
    is recovered by running it again; a half-finished rename pair is
    restored by the entry guard):

    1. restore any ``*.old`` artifact a previous crash left mid-swap;
    2. read tombstones; no-op if none;
    3. write the FILTERED tokens table once (one scan; tombstoned ids
       inside the bound that no longer exist are harmless no-ops);
    4. rebuild segments FROM the filtered copy through the SAME prepack
       -> sort -> repack exchange the build uses (or the explode ->
       sort -> pack positional path), honoring the built layout (block
       size, eff_chunk_bits, chunkband partitions, alt passenger);
    5. swap segments, swap tokens, write stats counted from the
       filtered rows, drop ``deletes/``.

    Returns the new ``{"n_docs", "avg_doc_length", "n_posting_rows",
    "n_compacted"}`` or ``None`` when there was nothing to do."""
    import glob

    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    from ..state.manifest import read_json

    manifest_d = read_json(os.path.join(index_dir, "manifest.json"))
    if manifest_d is None or manifest_d.get("stats") is None:
        raise FileNotFoundError(f"no completed index manifest in {index_dir}")
    # crash recovery: a previous run that died between its two renames
    # left the live dir missing and the .old sibling present — restore
    for live in (os.path.join(index_dir, "segments"),
                 os.path.join(index_dir, "tokens")):
        if not os.path.isdir(live) and os.path.isdir(live + ".old"):
            os.replace(live + ".old", live)
    dfiles = sorted(glob.glob(os.path.join(index_dir, "deletes", "*.parquet")))
    if not dfiles:
        return None
    dead = np.unique(np.concatenate([
        pq.read_table(f, columns=["doc_id"]).column("doc_id")
        .to_numpy(zero_copy_only=False) for f in dfiles])).astype(np.int64)
    if dead.size == 0:
        shutil.rmtree(os.path.join(index_dir, "deletes"), ignore_errors=True)
        return None
    config = manifest_d["config"]
    block_size = int(config.get("block_size") or 32)
    with_positions = bool(config.get("with_positions"))
    band_p = int(config.get("chunkband_partitions") or 0) \
        if not with_positions else 0
    # is-None chain, NOT falsy-`or`: an explicit chunk_bits=0 in a
    # legacy manifest must resolve to 0 here exactly as the searchers
    # resolve it (query.py/serve.py) — an `or` chain would rebuild with
    # bits>=10 while readers keep slicing with 0
    eff_chunk_bits = manifest_d.get("eff_chunk_bits")
    if eff_chunk_bits is None:
        eff_chunk_bits = config.get("chunk_bits")
    if eff_chunk_bits is None:
        eff_chunk_bits = max(
            10, int(manifest_d["stats"]["n_docs"]).bit_length() - 3)
    eff_chunk_bits = int(eff_chunk_bits)
    emit_alt = bool(manifest_d.get("alt_layout"))
    tokens_root = os.path.join(index_dir, "tokens")
    seg_dir = os.path.join(index_dir, "segments")
    if shuffle_blocks is None:
        shuffle_blocks = max(2, int(ray.cluster_resources().get("CPU", 8)))
    dead_ref = ray.put(dead)

    def _drop_dead(t, _ref=dead_ref):
        d = ray.get(_ref)  # zero-copy plasma read, cached per worker
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        idx = np.searchsorted(d, ids)
        hit = (idx < d.size) & (d[np.minimum(idx, d.size - 1)] == ids)
        return t.filter(pa.array(~hit)) if hit.any() else t

    # -- ONE scan: write the filtered tokens table first; the segment
    # rebuild then reads the already-filtered copy (r4 review: the old
    # flow scanned+filtered the tokens twice)
    tmp_tok = os.path.join(index_dir, ".tmp_tok_compact")
    shutil.rmtree(tmp_tok, ignore_errors=True)
    rd.read_parquet(tokens_root).map_batches(
        _drop_dead, batch_format="pyarrow"
    ).write_parquet(tmp_tok, partition_cols=["shard"])
    # actual-row stats (NEVER tombstone arithmetic: tombstones may name
    # ids that no longer exist after an earlier compaction — harmless
    # no-ops that must not skew n_docs/avgdl)
    n_live = 0
    total_len = 0
    for f in glob.glob(os.path.join(tmp_tok, "**", "*.parquet"),
                       recursive=True):
        t = pq.read_table(f, columns=["doc_len"])
        n_live += t.num_rows
        total_len += int(pc.sum(t.column("doc_len")).as_py() or 0)
    if n_live == 0:
        shutil.rmtree(tmp_tok, ignore_errors=True)
        raise ValueError(
            "compaction would remove every document — delete the index "
            "directory instead of compacting it to empty")

    tmp_seg = os.path.join(index_dir, ".tmp_seg_compact")
    _segments_pipeline(
        tmp_tok, tmp_seg, with_positions=with_positions,
        block_size=block_size, eff_chunk_bits=eff_chunk_bits,
        band_p=band_p, emit_alt=emit_alt, shuffle_blocks=shuffle_blocks,
        n_docs_est=n_live)

    # -- swaps (the entry guard restores a crash between either rename
    # pair; deletes/ still present means a rerun redoes everything from
    # the actual rows, which is idempotent)
    old_seg = seg_dir + ".old"
    shutil.rmtree(old_seg, ignore_errors=True)
    os.replace(seg_dir, old_seg)
    os.replace(tmp_seg, seg_dir)
    shutil.rmtree(old_seg, ignore_errors=True)
    old_tok = tokens_root + ".old"
    shutil.rmtree(old_tok, ignore_errors=True)
    os.replace(tokens_root, old_tok)
    os.replace(tmp_tok, tokens_root)
    shutil.rmtree(old_tok, ignore_errors=True)
    # update the raw manifest json in place (the manifest IS its state
    # dict) — fingerprints/shard lineage stay untouched: inputs did not
    # change, only the live subset did.  id_space preserves the doc-id
    # ASSIGNMENT bound (the live set is now sparse): appends allocate
    # from it and shard chunk universes span it.
    manifest_d["id_space"] = int(manifest_d.get(
        "id_space", manifest_d["stats"]["n_docs"]))
    n_before_compact = int(manifest_d["stats"]["n_docs"])
    manifest_d["stats"] = {
        "n_docs": int(n_live),
        "total_len": int(total_len),
        "avg_doc_length": (total_len / n_live) if n_live else 0.0,
    }
    n_rows = _count_rows(seg_dir)
    manifest_d["segments_rows"] = n_rows
    from ..state.manifest import write_json_atomic

    write_json_atomic(os.path.join(index_dir, "manifest.json"), manifest_d)
    shutil.rmtree(os.path.join(index_dir, "deletes"), ignore_errors=True)
    return {"n_docs": int(n_live),
            "avg_doc_length": manifest_d["stats"]["avg_doc_length"],
            "n_posting_rows": n_rows,
            # docs ACTUALLY removed (tombstones naming already-absent
            # ids are no-ops and are not counted)
            "n_compacted": int(n_before_compact - n_live)}


class StreamingIndexer:
    """Buffered near-real-time ingestion over an existing index.

    ``add(rows)`` buffers plain row dicts (the columns the index was
    built from: ``url``/``html`` for an html build, the text column
    otherwise, plus the id column if configured); once the buffer
    reaches ``flush_every`` docs — or on an explicit ``flush()`` — the
    batch is written as a parquet file and folded in through
    ``append_index``, which is rank/score-identical to a full rebuild
    (tests/test_append_index.py).  Searchers pick new docs up with
    ``IndexSearcher.refresh()`` — the Lucene NRT shape: writer buffers,
    segment-granular commits, cheap reader reopen.

    ``dedup=True`` adds exact dedup-on-ingest (the web-crawl shape:
    refetches and mirror pages dominate a stream): each incoming doc's
    content MD5 is checked against the hashes this spool has already
    accepted — duplicates are dropped BEFORE they cost tokenize/index
    work, accepted hashes persist as a parquet sidecar next to the
    spool files (reloaded on restart, same crash-resume contract as the
    spool sequence), and ``seed_hashes`` pre-loads hashes from an
    existing corpus (e.g. ``exact_dedup_groups``'s content_hash column)
    so the stream also dedups against the base index.  At web scale one
    StreamingIndexer owns one hash-partition of the stream, so its seen
    set is the partition's hash range, not the corpus (replace the set
    with a bloom filter when even that slice outgrows memory).

    ``near_dup_threshold=0.8`` adds FUZZY dedup-on-ingest: each
    incoming doc's MinHash signature is banded into the partition's
    in-memory LSH buckets and dropped when its signature-estimated
    Jaccard against any bucket-mate clears the threshold (the
    minhash_pairs math, applied online).  Accepted signatures persist
    per flush as a ``dedup-sigs-*`` sidecar and the buckets re-derive
    on restart.  MinHash parameters must stay FIXED for the life of a
    spool (sidecar signatures replay under them).

    Scale shape: one StreamingIndexer per ingest partition (an actor),
    each flushing its own append shard; flushes are the existing
    resumable append path, so a crashed flush re-runs."""

    def __init__(self, index_dir: str, flush_every: int = 1000,
                 spool_dir: str | None = None, dedup: bool = False,
                 seed_hashes=None, near_dup_threshold: float | None = None,
                 num_perm: int = 128, n_bands: int = 16, shingle_n: int = 3,
                 minhash_seed: int = 1729):
        import tempfile

        from ..state.manifest import read_json

        m = read_json(os.path.join(index_dir, "manifest.json"))
        if m is None or m.get("stats") is None:
            raise FileNotFoundError(f"no completed index manifest in {index_dir}")
        self.index_dir = index_dir
        self.flush_every = int(flush_every)
        cfg = m["config"]
        self._text_col = cfg["text_source"]  # "html" -> the html column
        self.dedup = bool(dedup)
        self.n_dropped = 0
        if spool_dir:
            os.makedirs(spool_dir, exist_ok=True)
            self.spool_dir = spool_dir
        else:
            self.spool_dir = tempfile.mkdtemp(prefix="nirs_spool_")
        self._buf: list[dict] = []
        self._n_flushed = 0
        # resume the spool sequence past any existing files: restarting
        # over a persistent spool_dir must never overwrite a spool file
        # append_index already recorded as known (it would silently drop
        # the new batch AND destroy the old copy — r4 review)
        import glob as _glob
        import re as _re

        existing = [_re.search(r"stream-(\d+)\.parquet$", f)
                    for f in _glob.glob(os.path.join(self.spool_dir,
                                                     "stream-*.parquet"))]
        self._spooled = 1 + max((int(m.group(1)) for m in existing if m),
                                default=-1)
        # in-flight spool file from a failed append: retries MUST
        # re-submit the SAME path (append's crash-resume keys on the
        # input), never respool the rows under a new sequence number —
        # a half-promoted append replayed with a different file would
        # duplicate docs (r4 ADVICE)
        self._pending: str | None = None
        self._pending_rows = 0
        self._seen: set[str] = set()
        if self.dedup:
            import pyarrow.parquet as _spq

            for f in sorted(_glob.glob(os.path.join(
                    self.spool_dir, "dedup-hashes-*.parquet"))):
                self._seen.update(
                    _spq.read_table(f, columns=["content_hash"])
                    .column("content_hash").to_pylist())
            if seed_hashes is not None:
                self._seen.update(seed_hashes)
        # hashes of the rows currently buffered (aligned decisions: a
        # buffered doc must also block its own in-stream duplicates)
        self._buf_hashes: list[str] = []
        # fuzzy (MinHash-LSH) dedup-on-ingest: band buckets + accepted
        # signatures live in this partition's memory (its slice of the
        # stream's hash space), persisted per flush as a signature
        # sidecar and re-derived on restart.  At true web scale replace
        # the in-memory buckets with an LRU or bloom layer per band.
        self.near_dup_threshold = near_dup_threshold
        self.n_near_dropped = 0
        self._mh_params = (num_perm, n_bands, shingle_n, minhash_seed)
        if near_dup_threshold is not None:
            import numpy as _np
            import pyarrow.parquet as _spq

            from ..stages.dedup import MinHashStage, band_keys_for_sigs

            self._mh_stage = MinHashStage(
                engine=cfg["engine"], text_col=self._text_col,
                num_perm=num_perm, shingle_n=shingle_n, seed=minhash_seed)
            self._sig_rows: list[_np.ndarray] = []
            self._buckets: dict[int, list[int]] = {}
            for f in sorted(_glob.glob(os.path.join(
                    self.spool_dir, "dedup-sigs-*.parquet"))):
                for blob in _spq.read_table(f, columns=["sig"]) \
                                .column("sig").to_pylist():
                    self._register_sig(
                        _np.frombuffer(blob, dtype=_np.uint64))
            self._buf_sigs: list[_np.ndarray] = []

    def _register_sig(self, sig) -> None:
        import numpy as np

        from ..stages.dedup import band_keys_for_sigs

        idx = len(self._sig_rows)
        self._sig_rows.append(sig)
        for key in band_keys_for_sigs(sig[None, :],
                                      self._mh_params[1])[0].tolist():
            self._buckets.setdefault(int(key), []).append(idx)

    def _near_dup_sigs(self, rows: list):
        """(sigs, band keys) for a whole add() batch in ONE vectorized
        MinHashStage pass — the expensive part; accept/drop decisions
        stay sequential in the caller."""
        import numpy as np
        import pyarrow as pa

        from ..stages.dedup import band_keys_for_sigs

        out = self._mh_stage(pa.table({
            "doc_id": pa.array(list(range(len(rows))), pa.int64()),
            self._text_col: pa.array([self._text_of(r) for r in rows])}))
        num_perm = self._mh_params[0]
        sigs = np.frombuffer(b"".join(out.column("sig").to_pylist()),
                             dtype=np.uint64).reshape(len(rows), num_perm)
        return sigs, band_keys_for_sigs(sigs, self._mh_params[1])

    def _near_dup_check(self, sig, keys_i) -> bool:
        """True iff sig's estimated Jaccard against any already-accepted
        bucket-mate clears the threshold; registers it otherwise (an
        accepted row must block its own later duplicates)."""
        cands: set[int] = set()
        for key in keys_i.tolist():
            cands.update(self._buckets.get(int(key), ()))
        for ci in cands:
            if float((self._sig_rows[ci] == sig).mean()) \
                    >= self.near_dup_threshold:
                self.n_near_dropped += 1
                return True
        self._register_sig(sig.copy())
        self._buf_sigs.append(sig.copy())
        return False

    def _text_of(self, row: dict) -> str:
        v = row.get(self._text_col)
        if v is None:
            return ""
        if isinstance(v, (bytes, bytearray)):  # html payloads are bytes
            return bytes(v).decode("utf-8", errors="replace")
        return str(v)

    def _content_hash(self, row: dict) -> str:
        import hashlib

        return hashlib.md5(self._text_of(row).encode("utf-8")).hexdigest()

    def add(self, rows) -> "IndexBuildResult | None":
        """Buffer rows; auto-flush at ``flush_every``.  Returns the
        flush result when one happened, else None.  With ``dedup=True``
        exact duplicates (by content MD5) are dropped here — before any
        spool/tokenize/index cost — and counted in ``n_dropped``."""
        if self.dedup or self.near_dup_threshold is not None:
            rows = list(rows)
            if self.near_dup_threshold is not None and rows:
                sigs, keys = self._near_dup_sigs(rows)
            for i, r in enumerate(rows):
                if self.dedup:
                    h = self._content_hash(r)
                    if h in self._seen:
                        self.n_dropped += 1
                        continue
                if self.near_dup_threshold is not None \
                        and self._near_dup_check(sigs[i], keys[i]):
                    continue
                if self.dedup:
                    self._seen.add(h)
                    self._buf_hashes.append(h)
                self._buf.append(dict(r))
        else:
            self._buf.extend(dict(r) for r in rows)
        if len(self._buf) >= self.flush_every:
            return self.flush()
        return None

    def flush(self) -> "IndexBuildResult | None":
        if not self._buf and self._pending is None:
            return None
        import pyarrow as pa
        import pyarrow.parquet as pq

        if self._pending is None:
            path = os.path.join(self.spool_dir,
                                f"stream-{self._spooled:06d}.parquet")
            self._spooled += 1
            tmp = path + ".tmp"
            pq.write_table(pa.Table.from_pylist(self._buf), tmp)
            os.replace(tmp, path)
            self._pending = path
            self._pending_rows = len(self._buf)
        # buffered rows survive until the append succeeds (a transient
        # append failure must not lose them); on failure the SAME spool
        # file is re-submitted next flush so append's resumability
        # contract (same input re-run) holds
        res = append_index(self.index_dir, [self._pending])
        if self.dedup and self._pending_rows:
            # persist the accepted hashes only AFTER the append lands:
            # a crash in between re-admits duplicates of this one batch
            # on restart (at-least-once), never silently drops docs
            # that were hashed but never indexed
            pdir, pname = os.path.split(self._pending)
            hpath = os.path.join(pdir, pname.replace("stream-",
                                                     "dedup-hashes-"))
            htmp = hpath + ".tmp"
            pq.write_table(pa.table({"content_hash": pa.array(
                self._buf_hashes[:self._pending_rows], pa.string())}), htmp)
            os.replace(htmp, hpath)
            del self._buf_hashes[:self._pending_rows]
        if self.near_dup_threshold is not None and self._pending_rows:
            pdir, pname = os.path.split(self._pending)
            spath = os.path.join(pdir, pname.replace("stream-",
                                                     "dedup-sigs-"))
            stmp = spath + ".tmp"
            pq.write_table(pa.table({"sig": pa.array(
                [s.tobytes() for s in self._buf_sigs[:self._pending_rows]],
                pa.binary())}), stmp)
            os.replace(stmp, spath)
            del self._buf_sigs[:self._pending_rows]
        del self._buf[:self._pending_rows]
        self._pending = None
        self._pending_rows = 0
        self._n_flushed += 1
        if self._buf:
            # rows buffered between a failed append and its retry (or
            # past the pending snapshot) drain in their own spool file —
            # flush() means "everything buffered is in the index"
            return self.flush()
        return res


def append_index(
    index_dir: str,
    new_input: str | list[str],
    *,
    tokenize_concurrency: int | None = None,
) -> IndexBuildResult:
    """Incrementally add documents to a COMPLETE index (the reference's
    incremental builder semantics, incremental_builder.py:180-315: append
    monotone doc_ids, postings stay sorted).

    New files become new token shards (doc_ids continue from the current
    count); their postings pack into ADDITIONAL segment files under
    ``segments/append_*`` — valid because every chunk row is
    self-contained and the query-side merge orders rows by (chunk, first
    doc): appended ranges are strictly above all existing ids.  Stats and
    manifest update in place; the original build config (engine, chunk
    bits, block size) is reused from the manifest.
    """
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    from ..state.manifest import read_json, write_json_atomic

    mpath = os.path.join(index_dir, "manifest.json")
    state = read_json(mpath)
    if not state or state.get("stats") is None or not state.get("segments_done"):
        raise ValueError(f"append requires a completed index at {index_dir}")
    config = state["config"]
    # same is-None fallback chain as the searchers (query.py/serve.py):
    # explicit chunk_bits=0 means 0, and a manifest missing both fields
    # resolves to the formula readers use — never a divergent constant
    eff_chunk_bits = state.get("eff_chunk_bits")
    if eff_chunk_bits is None:
        eff_chunk_bits = config.get("chunk_bits")
    if eff_chunk_bits is None:
        eff_chunk_bits = max(
            10, int(state["stats"]["n_docs"]).bit_length() - 3)
    eff_chunk_bits = int(eff_chunk_bits)
    with_positions = config.get("with_positions", False)
    use_html = config["text_source"] == "html"
    id_col = config.get("id_col")

    files = list_input_files(new_input)
    known = set(state["files"])
    files = [f for f in files if f not in known]
    if not files:
        return IndexBuildResult(index_dir, state["stats"]["n_docs"],
                                state["stats"]["avg_doc_length"],
                                state.get("segments_rows", 0), 0)

    # id_space = the doc-id ASSIGNMENT bound (>= n_docs once a
    # compaction has made the live id set sparse): new ids must never
    # reuse a surviving sparse id, so appends allocate from the bound,
    # not the live count
    base = int(state.get("id_space", state["stats"]["n_docs"]))
    items = []
    for it in plan_row_groups(files):
        items.append(RowGroupItem(it.path, it.row_group, it.doc_base + base, it.num_rows))

    read_cols = None
    if use_html:
        read_cols = ["url", "html"] + ([id_col] if id_col else [])
    elif config["text_source"]:
        read_cols = [config["text_source"]] + ([id_col] if id_col else [])

    next_shard = max((int(k) for k in state["shards"]), default=-1) + 1
    tokens_root = os.path.join(index_dir, "tokens")
    items_w = [{**i.__dict__, "shard": next_shard} for i in items]
    ds = read_with_doc_ids(None, read_cols, items=items_w, id_col=id_col)
    ds = ds.map_batches(
        ExtractNormalize(text_col=config["text_source"] if not use_html else "text",
                         use_html=use_html),
        batch_format="pyarrow",
    )
    tok_kwargs = dict(batch_format="pyarrow")
    if tokenize_concurrency:
        tok_kwargs["concurrency"] = tokenize_concurrency
    ds = ds.map_batches(
        TokenizeStage(engine=config["engine"], text_col="text_norm", pre_normalized=True,
                      with_positions=with_positions,
                      stopword_lang=config.get("stopword_lang"),
                      emit_hashpairs=os.path.isdir(os.path.join(index_dir, "hashcheck"))),
        **tok_kwargs,
    )
    tmp_root = os.path.join(tokens_root, ".tmp_append")
    shutil.rmtree(tmp_root, ignore_errors=True)
    ds.write_parquet(tmp_root, partition_cols=["shard"])
    src = os.path.join(tmp_root, f"shard={next_shard}")
    dst = os.path.join(tokens_root, f"shard={next_shard}")
    shutil.rmtree(dst, ignore_errors=True)
    os.replace(src, dst)
    shutil.rmtree(tmp_root, ignore_errors=True)

    # pack ONLY the new shard into an additional segment directory
    tok_cols = ["doc_id", "doc_len", "terms", "tfs"] + (["positions"] if with_positions else [])
    if not with_positions:
        import glob as _glob

        import pyarrow.parquet as _pq
        import ray as _ray

        n_new_docs = sum(i.num_rows for i in items)
        ncpu = max(8, int(_ray.cluster_resources().get("CPU", 8)))
        # appended segments must match the BASE layout: the query-side
        # merge cannot mix stream formats (dt / split / inline-dls)
        # for one term's rows
        seg_files = _glob.glob(os.path.join(index_dir, "segments", "**", "*.parquet"),
                               recursive=True)
        base_names = set(_pq.read_schema(sorted(seg_files)[0]).names) \
            if seg_files else set()
        if "dt_bytes" in base_names or not base_names:
            fmt, need_doclens = "dt", True
        elif "dls_bytes" in base_names:
            fmt, need_doclens = "split_dls", False
        else:
            fmt, need_doclens = "split", True
        # a chunkband-partitioned base keeps its IO isolation: appended
        # segments are written banded too (the shard searcher's band
        # glob finds append_*/chunkband=K dirs; unbanded files would be
        # invisible to band-restricted shards without the defensive
        # flat-file fallback in query.py)
        band_p = int(config.get("chunkband_partitions") or 0)
        prepacked = rd.read_parquet(
            _tokens_files_by_docid(dst), columns=tok_cols,
        ).map_batches(
            PrePackTokens(chunk_bits=eff_chunk_bits, block_size=config["block_size"],
                          emit_alt=state.get("alt_layout", False), fmt=fmt,
                          band_partitions=band_p),
            batch_format="pyarrow",
            # same constant cap as the main build (allocator cliff)
            batch_size=min(4096, max(1, -(-n_new_docs // ncpu))),
        )
        sort_keys = (["chunkband"] if band_p else []) + \
            ["term_hash", "chunk", "first_doc"]
        packed = prepacked.sort(sort_keys).map_batches(
            # appended fragments cover only the new shard's doc ids
            RepackFragments(block_size=config["block_size"],
                            doclens=_doclens_ref(dst) if need_doclens else None),
            batch_format="pyarrow", batch_size=8192,
        )
        if band_p:
            def _add_band_app(t, _p=band_p):
                import numpy as _np
                import pyarrow as _pa

                ch = t.column("chunk").to_numpy(zero_copy_only=False)
                return t.append_column(
                    "chunkband", _pa.array((ch % _p).astype(_np.int32)))

            packed = packed.map_batches(_add_band_app, batch_format="pyarrow")
    else:
        # match the BASE's positional byte layout (dt-combined vs the
        # classic split streams) — merge_packed refuses mixed layouts
        # for one term's rows
        import glob as _pglob

        import pyarrow.parquet as _ppq

        seg_files = _pglob.glob(os.path.join(index_dir, "segments", "**",
                                             "*.parquet"), recursive=True)
        base_names = set(_ppq.read_schema(sorted(seg_files)[0]).names) \
            if seg_files else set()
        pos_fmt = "dt" if ("dt_bytes" in base_names or not base_names) \
            else "classic"
        exploded = rd.read_parquet(dst, columns=tok_cols).map_batches(
            ExplodeTokens(chunk_bits=eff_chunk_bits, with_positions=with_positions,
                          emit_term=False, emit_alt=state.get("alt_layout", False)),
            batch_format="pyarrow",
        )
        packed = exploded.sort(["term_hash", "chunk", "doc_id"]).map_batches(
            PackRuns(block_size=config["block_size"], with_positions=with_positions,
                     fmt=pos_fmt),
            batch_format="pyarrow", batch_size=None)
    tmp_seg = os.path.join(index_dir, ".tmp_append_seg")
    shutil.rmtree(tmp_seg, ignore_errors=True)
    if not with_positions and int(config.get("chunkband_partitions") or 0):
        packed.write_parquet(tmp_seg, partition_cols=["chunkband"],
                             row_group_size=2048)
    else:
        packed.write_parquet(tmp_seg, row_group_size=2048)
    seg_dst = os.path.join(index_dir, "segments", f"append_{next_shard}")
    shutil.rmtree(seg_dst, ignore_errors=True)
    os.replace(tmp_seg, seg_dst)

    # vocab sidecar + collision check over old vocab UNION new terms —
    # appended docs must not silently collide with existing hashes either
    vocab_dir = os.path.join(index_dir, "vocab")
    if os.path.isdir(vocab_dir):
        new_terms = rd.read_parquet(dst, columns=["terms"]) \
                      .map_batches(vocab_uniq_terms, batch_format="pyarrow")
        merged = _vocab_aggregate(rd.read_parquet(vocab_dir).union(new_terms))
        tmp_vocab = os.path.join(index_dir, ".tmp_append_vocab")
        shutil.rmtree(tmp_vocab, ignore_errors=True)
        merged.write_parquet(tmp_vocab)
        shutil.rmtree(vocab_dir, ignore_errors=True)
        os.replace(tmp_vocab, vocab_dir)

    if state.get("alt_layout"):
        # alt-carrying layout: old + appended segment collections all
        # store the second hash, so old-vs-new collisions reduce to a
        # small pairs groupby over the two pruned segment columns
        _verify_alt_global(os.path.join(index_dir, "segments"))
    hashcheck_dir = os.path.join(index_dir, "hashcheck")
    if os.path.isdir(hashcheck_dir):
        new_pairs = _hashcheck_pairs_ds(dst, 8)
        merged_hc = _hashcheck_aggregate(
            rd.read_parquet(hashcheck_dir).union(new_pairs))
        tmp_hc = os.path.join(index_dir, ".tmp_append_hashcheck")
        shutil.rmtree(tmp_hc, ignore_errors=True)
        merged_hc.write_parquet(tmp_hc)
        shutil.rmtree(hashcheck_dir, ignore_errors=True)
        os.replace(tmp_hc, hashcheck_dir)

    agg = rd.read_parquet(dst, columns=["doc_len"]).aggregate(
        Sum("doc_len", alias_name="t"), Count(alias_name="n"))
    n_new, len_new = int(agg["n"]), int(agg["t"])
    state["files"] = sorted(known | set(files))
    state["shards"][str(next_shard)] = {"done": True, "rows": n_new, "inputs": files,
                                        "appended": True}
    st = state["stats"]
    st["n_docs"] += n_new
    st["total_len"] += len_new
    st["avg_doc_length"] = st["total_len"] / max(1, st["n_docs"])
    # advance the id-space bound by the PLANNED rows (ids are assigned
    # per input row even if extraction drops some)
    state["id_space"] = base + sum(i.num_rows for i in items)
    state["segments_rows"] = state.get("segments_rows", 0) + _count_rows(seg_dst)
    write_json_atomic(mpath, state)
    return IndexBuildResult(index_dir, st["n_docs"], st["avg_doc_length"],
                            state["segments_rows"], 0)


def _doclens_ref(tokens_path: str):
    """ray.put a DocLenLookup over the tokens table's (doc_id, doc_len)
    columns — the doc-length sidecar consumed by RepackFragments (WAND
    block metadata) now that the dls stream no longer rides the
    exchange.  Column-pruned read, ~6 bytes/doc in plasma, shipped once
    per node by the object store.

    Scale note: one broadcast table holds to ~10^9-10^10 docs
    (6-60 GB/node).  Beyond that the build flips to the banded variant:
    sort the fragments by (chunkband, term_hash, chunk, first_doc) with
    ``chunkband_partitions=P`` so each repack task sees one band's
    fragments and loads only that band's dl slice (the tokens table is
    doc_id-ordered parquet — row-group stats prune the read to the
    band's doc ranges); per-band segment files stay term_hash-sorted so
    the query-side row-group pruning is unchanged.  The serving side
    already does exactly this slice-by-chunks load
    (query.IndexSearcher._dl_of)."""
    import glob

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray

    from ..functions.postings import DocLenLookup

    files = sorted(glob.glob(os.path.join(tokens_path, "**", "*.parquet"),
                             recursive=True))
    t = pa.concat_tables([pq.read_table(f, columns=["doc_id", "doc_len"])
                          for f in files])
    return ray.put(DocLenLookup(
        t.column("doc_id").to_numpy(zero_copy_only=False),
        t.column("doc_len").to_numpy(zero_copy_only=False)))


def _tokens_files_by_docid(tokens_root: str) -> list[str]:
    """Token files ordered by their min doc_id (Parquet footer stats).

    ``read_parquet`` forms blocks in the given file order; lexicographic
    path order interleaves doc ranges (``shard=1, shard=10, ...``), which
    splits each PrePackTokens batch into several contiguous doc runs and
    multiplies fragment rows.  Doc-id-ordered files make each batch ~one
    maximal run -> ~vocab fragments per batch."""
    import glob

    import pyarrow.parquet as pq

    files = glob.glob(os.path.join(tokens_root, "**", "*.parquet"), recursive=True)

    def _min_doc(path: str) -> int:
        md = pq.ParquetFile(path).metadata
        try:
            i = md.schema.to_arrow_schema().names.index("doc_id")
            return md.row_group(0).column(i).statistics.min
        except Exception:
            return 0

    return sorted(files, key=_min_doc)


def _count_rows(parquet_dir: str) -> int:
    import glob

    import pyarrow.parquet as pq

    return sum(pq.ParquetFile(f).metadata.num_rows for f in glob.glob(os.path.join(parquet_dir, "**", "*.parquet"), recursive=True))


def verify_index(index_dir: str, *, sample_frac: float = 1.0) -> dict:
    """Distributed index integrity audit (an ops tool, not a query
    path): every segment row's streams decode and their metadata is
    consistent — per-row df == decoded posting count == block_len sum,
    doc ids strictly increasing with block_last_doc matching the
    decoded block tails, positional sidecars aligned byte-for-byte —
    plus manifest-level checks (stats present, tombstones inside the id
    space, doc-count parity between the tokens table and the stats).

    Runs as one ``map_batches`` over the segment files (per-row decode
    is the point of an auditor; ``sample_frac`` hash-samples rows for a
    cheaper spot check at scale).  Returns ``{"ok", "errors"[:20],
    "rows_checked", "postings", "n_docs", ...}`` — it reports, never
    repairs."""
    import glob as _glob

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from ..functions.codecs import vbyte_decode
    from ..functions.postings import unpack_postings
    from ..state.manifest import read_json

    manifest = read_json(os.path.join(index_dir, "manifest.json"))
    errors: list[str] = []
    if manifest is None or manifest.get("stats") is None \
            or not manifest.get("segments_done"):
        return {"ok": False, "errors": ["no completed index manifest"],
                "rows_checked": 0, "postings": 0}
    n_docs = int(manifest["stats"]["n_docs"])
    id_bound = int(manifest.get("id_space") or n_docs)

    def check(t: pa.Table) -> pa.Table:
        errs: list[str] = []
        rows = 0
        postings = 0
        tbl = t.to_pylist()
        for row in tbl:
            if sample_frac < 1.0 and \
                    (hash((row["term_hash"], row["chunk"])) % 1000) \
                    >= sample_frac * 1000:
                continue
            rows += 1
            th = int(row["term_hash"])
            try:
                ids, tfs, dls = unpack_postings(row)
            except Exception as e:
                errs.append(f"term_hash {th}: stream decode failed: {e}")
                continue
            postings += ids.size
            bl = np.asarray(row["block_len"], dtype=np.int64)
            if int(row["df"]) != ids.size or int(bl.sum()) != ids.size:
                errs.append(f"term_hash {th}: df {row['df']} != decoded "
                            f"{ids.size} (block_len sum {int(bl.sum())})")
                continue
            if int(row["cf"]) != int(tfs.sum()):
                errs.append(f"term_hash {th}: cf mismatch")
            ends = np.cumsum(bl) - 1
            last = np.asarray(row["block_last_doc"], dtype=np.int64)
            if not np.array_equal(ids[ends], last):
                errs.append(f"term_hash {th}: block_last_doc mismatch")
            starts = np.concatenate(([0], np.cumsum(bl)[:-1]))
            within = np.ones(ids.size, dtype=bool)
            within[starts] = False
            if ids.size > 1 and not (np.diff(ids) > 0)[within[1:]].all():
                errs.append(f"term_hash {th}: doc ids not strictly "
                            "increasing within blocks")
            # blocks within one packed row must also ascend: overlapping
            # or duplicated blocks break WAND range skipping and the
            # boolean sorted-merge even when each block is sorted
            if bl.size > 1 and not (ids[starts][1:] > ids[ends][:-1]).all():
                errs.append(f"term_hash {th}: block doc ranges overlap "
                            "or regress")
            if ids.size and (int(ids.min()) < 0
                             or int(ids.max()) >= id_bound):
                errs.append(f"term_hash {th}: doc id outside "
                            f"[0, {id_bound})")
            if row.get("positions_bytes") is not None:
                nb = np.asarray(row["pos_nbytes"], dtype=np.int64)
                if nb.size != ids.size:
                    errs.append(f"term_hash {th}: pos_nbytes count != df")
                elif int(nb.sum()) != len(row["positions_bytes"]):
                    errs.append(f"term_hash {th}: positions byte total "
                                "mismatch")
                else:
                    off = np.concatenate(([0], np.cumsum(nb)))
                    buf = row["positions_bytes"]
                    for i in range(ids.size):
                        try:
                            p = vbyte_decode(buf[off[i]:off[i + 1]])
                        except Exception as e:
                            errs.append(f"term_hash {th}: positions "
                                        f"decode failed: {e}")
                            break
                        if p.size != int(tfs[i]):
                            errs.append(f"term_hash {th}: position count "
                                        f"{p.size} != tf {int(tfs[i])}")
                            break
        return pa.table({"rows": pa.array([rows], pa.int64()),
                         "postings": pa.array([postings], pa.int64()),
                         "errors": pa.array([errs[:5]],
                                            pa.list_(pa.string()))})

    seg_files = sorted(_glob.glob(os.path.join(index_dir, "segments", "**",
                                               "*.parquet"), recursive=True))
    if not seg_files:
        return {"ok": False, "errors": ["no segment files on disk"],
                "rows_checked": 0, "postings": 0, "n_docs": n_docs,
                "id_space": id_bound, "n_tombstones": 0}
    parts = rd.read_parquet(seg_files).map_batches(
        check, batch_format="pyarrow").to_pandas()
    rows_checked = int(parts["rows"].sum())
    postings = int(parts["postings"].sum())
    for el in parts["errors"]:
        errors.extend(el)
    # manifest-level checks
    tomb = sorted(_glob.glob(os.path.join(index_dir, "deletes", "*.parquet")))
    if tomb:
        import pyarrow.parquet as _vpq

        t_ids = np.concatenate([
            _vpq.read_table(f, columns=["doc_id"]).column("doc_id")
            .to_numpy(zero_copy_only=False) for f in tomb])
        if t_ids.size and (t_ids.min() < 0 or t_ids.max() >= id_bound):
            errors.append("tombstone doc id outside the id space")
    tok_n = rd.read_parquet(os.path.join(index_dir, "tokens"),
                            columns=["doc_id"]).count()
    if tok_n != n_docs:
        errors.append(f"tokens table has {tok_n} docs, stats say {n_docs}")
    return {"ok": not errors, "errors": errors[:20],
            "rows_checked": rows_checked, "postings": postings,
            "n_docs": n_docs, "id_space": id_bound,
            "n_tombstones": int(len(tomb))}
