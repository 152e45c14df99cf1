"""RepackFragments parity: the capped-batch prepack -> sort -> repack
segments path must decode to EXACTLY the postings of a single-call pack
over the same tokens (and the dense ~vocab x chunks row layout) — in
both the doc-length-sidecar layout (default: no dls stream anywhere in
the exchange or the segments) and the legacy inline-dls layout (the
append-compat path)."""

import numpy as np
import pyarrow as pa
import pytest

from news_information_retrieval_system_ray.functions.postings import (
    DocLenLookup, merge_packed, unpack_postings)
from news_information_retrieval_system_ray.stages.indexing import (
    PrePackTokens, RepackFragments)


def _tokens_table(n_docs: int, seed: int = 5) -> pa.Table:
    rng = np.random.default_rng(seed)
    terms, tfs, dls = [], [], []
    for i in range(n_docs):
        vocab = [f"w{rng.integers(0, 300)}" for _ in range(rng.integers(3, 25))]
        uniq, cnt = np.unique(vocab, return_counts=True)
        terms.append(list(uniq))
        tfs.append(cnt.astype(np.int64).tolist())
        dls.append(int(cnt.sum()))
    return pa.table({
        "doc_id": pa.array(np.arange(n_docs, dtype=np.int64)),
        "doc_len": pa.array(dls, pa.int64()),
        "terms": pa.array(terms, pa.list_(pa.string())),
        "tfs": pa.array(tfs, pa.list_(pa.int64())),
    })


def _decode_all(tbl: pa.Table) -> dict:
    """(term_hash, chunk) -> (docs, tfs[, dls]), merging multi-fragment rows."""
    rows = tbl.to_pylist()
    groups: dict = {}
    for r in rows:
        groups.setdefault((r["term_hash"], r["chunk"]), []).append(r)
    out = {}
    for k, frs in groups.items():
        frs.sort(key=lambda r: r["first_doc"])
        merged = merge_packed(frs)
        out[k] = tuple(a.tolist() for a in unpack_postings(merged)
                       if a is not None)
    return out


@pytest.mark.parametrize("small_batch", [64, 257])
@pytest.mark.parametrize("emit_dls", [False, True])
def test_repack_matches_single_call_pack(small_batch, emit_dls):
    tok = _tokens_table(1500)
    pp = PrePackTokens(chunk_bits=16, block_size=32, emit_dls=emit_dls)
    # reference: ONE pre-pack call over the whole corpus = dense layout
    ref = _decode_all(pp(tok))

    doclens = DocLenLookup(
        tok.column("doc_id").to_numpy(zero_copy_only=False),
        tok.column("doc_len").to_numpy(zero_copy_only=False))

    # fragmented: many small pre-pack calls (as the capped pipeline does),
    # sorted like the shuffle, then repacked in bounded batches
    frags = [pp(tok.slice(i, small_batch))
             for i in range(0, tok.num_rows, small_batch)]
    frag_tbl = pa.concat_tables(frags)
    assert ("dls_bytes" in frag_tbl.column_names) == emit_dls
    order = pa.compute.sort_indices(
        frag_tbl, sort_keys=[("term_hash", "ascending"),
                             ("chunk", "ascending"),
                             ("first_doc", "ascending")])
    frag_tbl = frag_tbl.take(order)
    rp = RepackFragments(block_size=32, doclens=doclens)
    out_parts = [rp(frag_tbl.slice(i, 8192))
                 for i in range(0, frag_tbl.num_rows, 8192)]
    out = pa.concat_tables(out_parts)
    assert ("dls_bytes" in out.column_names) == emit_dls
    got = _decode_all(out)

    assert set(got) == set(ref)
    for k in ref:
        assert got[k] == ref[k], f"postings differ for {k}"
    # density restored: repacked row count collapses back toward the
    # dense layout (far below the fragment count)
    assert out.num_rows < frag_tbl.num_rows / 3
    assert out.num_rows <= len(ref) + frag_tbl.num_rows // 8192 + 1


def test_sidecar_block_metadata_matches_inline():
    """The sidecar layout's WAND block metadata (min_dl, Pareto bound
    pairs) must be identical to the inline-dls layout's — the gather
    from DocLenLookup reproduces the exchange-shipped lengths."""
    tok = _tokens_table(800, seed=9)
    doclens = DocLenLookup(
        tok.column("doc_id").to_numpy(zero_copy_only=False),
        tok.column("doc_len").to_numpy(zero_copy_only=False))

    def build(emit_dls):
        pp = PrePackTokens(chunk_bits=16, block_size=16, emit_dls=emit_dls)
        frag = pp(tok)
        order = pa.compute.sort_indices(
            frag, sort_keys=[("term_hash", "ascending"),
                             ("chunk", "ascending"),
                             ("first_doc", "ascending")])
        return RepackFragments(block_size=16, doclens=doclens)(frag.take(order))

    inline = build(True)
    sidecar = build(False)
    for col in ("term_hash", "chunk", "df", "cf", "block_len",
                "block_last_doc", "block_max_tf", "block_min_dl",
                "block_bound_tf", "block_bound_dl"):
        assert inline.column(col).to_pylist() == sidecar.column(col).to_pylist(), col
    assert "dls_bytes" not in sidecar.column_names
    assert "block_dl_nbytes" not in sidecar.column_names
