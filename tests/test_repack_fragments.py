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
@pytest.mark.parametrize("fmt", ["dt", "split", "split_dls"])
def test_repack_matches_single_call_pack(small_batch, fmt):
    tok = _tokens_table(1500)
    pp = PrePackTokens(chunk_bits=16, block_size=32, fmt=fmt)
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
    assert ("dls_bytes" in frag_tbl.column_names) == (fmt == "split_dls")
    assert ("dt_bytes" in frag_tbl.column_names) == (fmt == "dt")
    order = pa.compute.sort_indices(
        frag_tbl, sort_keys=[("term_hash", "ascending"),
                             ("chunk", "ascending"),
                             ("first_doc", "ascending")])
    frag_tbl = frag_tbl.take(order)
    rp = RepackFragments(block_size=32, doclens=doclens)
    out_parts = [rp(frag_tbl.slice(i, 8192))
                 for i in range(0, frag_tbl.num_rows, 8192)]
    out = pa.concat_tables(out_parts)
    assert ("dls_bytes" in out.column_names) == (fmt == "split_dls")
    assert ("dt_bytes" in out.column_names) == (fmt == "dt")
    got = _decode_all(out)

    assert set(got) == set(ref)
    for k in ref:
        assert got[k] == ref[k], f"postings differ for {k}"
    # density restored: repacked row count collapses back toward the
    # dense layout (far below the fragment count)
    assert out.num_rows < frag_tbl.num_rows / 3
    assert out.num_rows <= len(ref) + frag_tbl.num_rows // 8192 + 1


def test_sidecar_block_metadata_matches_inline():
    """Every layout's WAND block metadata (min_dl, Pareto bound pairs)
    and df/cf must be identical — the DocLenLookup gather (sidecar
    layouts) reproduces the exchange-shipped lengths, and the combined
    dt stream reproduces the split streams' tf extremes."""
    tok = _tokens_table(800, seed=9)
    doclens = DocLenLookup(
        tok.column("doc_id").to_numpy(zero_copy_only=False),
        tok.column("doc_len").to_numpy(zero_copy_only=False))

    def build(fmt):
        pp = PrePackTokens(chunk_bits=16, block_size=16, fmt=fmt)
        frag = pp(tok)
        order = pa.compute.sort_indices(
            frag, sort_keys=[("term_hash", "ascending"),
                             ("chunk", "ascending"),
                             ("first_doc", "ascending")])
        return RepackFragments(block_size=16, doclens=doclens)(frag.take(order))

    inline = build("split_dls")
    sidecar = build("split")
    dt = build("dt")
    for col in ("term_hash", "chunk", "df", "cf", "block_len",
                "block_last_doc", "block_max_tf", "block_min_dl",
                "block_bound_tf", "block_bound_dl"):
        assert inline.column(col).to_pylist() == sidecar.column(col).to_pylist(), col
        assert inline.column(col).to_pylist() == dt.column(col).to_pylist(), col
    assert "dls_bytes" not in sidecar.column_names
    assert "block_dl_nbytes" not in sidecar.column_names
    for col in ("dls_bytes", "docs_bytes", "tfs_bytes",
                "block_doc_nbytes", "block_tf_nbytes", "block_dl_nbytes"):
        assert col not in dt.column_names, col
    # the dt stream really is smaller than the split pair
    import pyarrow.compute as pc

    dt_stream = int(pc.sum(pc.binary_length(dt.column("dt_bytes"))).as_py()) \
        + int(pc.sum(pc.binary_length(dt.column("esc_bytes"))).as_py())
    split_stream = int(pc.sum(pc.binary_length(sidecar.column("docs_bytes"))).as_py()) \
        + int(pc.sum(pc.binary_length(sidecar.column("tfs_bytes"))).as_py())
    assert dt_stream < split_stream


# ------------------------------------------------- positional PackRuns prop

from hypothesis import given, settings
from hypothesis import strategies as st


@st.composite
def _sorted_positional_batch(draw):
    import pyarrow as pa

    rows = []
    n_keys = draw(st.integers(min_value=1, max_value=5))
    for ki in range(n_keys):
        th = (ki + 1) * 97
        for ch in range(draw(st.integers(min_value=1, max_value=2))):
            nd = draw(st.integers(min_value=1, max_value=12))
            docs = sorted(draw(st.sets(
                st.integers(min_value=0, max_value=400),
                min_size=nd, max_size=nd)))
            for d in docs:
                k = draw(st.integers(min_value=1, max_value=4))
                pos = draw(st.lists(st.integers(min_value=0, max_value=300),
                                    min_size=k, max_size=k))
                rows.append({"term_hash": th, "chunk": ch,
                             "doc_id": int(d) + ch * 1000, "tf": k,
                             "dl": draw(st.integers(min_value=1, max_value=99)),
                             "positions": pos, "alt": th + 1})
    schema = pa.schema([
        ("term_hash", pa.uint64()), ("chunk", pa.int32()),
        ("doc_id", pa.int64()), ("tf", pa.int32()), ("dl", pa.int32()),
        ("positions", pa.list_(pa.int64())), ("alt", pa.uint64())])
    return pa.Table.from_pylist(rows, schema=schema)


@given(_sorted_positional_batch(), st.integers(min_value=2, max_value=9))
@settings(max_examples=60, deadline=None)
def test_packruns_positional_property_parity(batch, block_size):
    """Random sorted positional batches: the vectorized PackRuns equals
    the per-run PackGroups loop bit for bit (classic AND dt formats
    decode back to the same postings+positions)."""
    import pyarrow as pa

    from news_information_retrieval_system_ray.functions.codecs import vbyte_decode
    from news_information_retrieval_system_ray.stages.indexing import (
        PackGroups, PackRuns)

    th = batch.column("term_hash").to_numpy(zero_copy_only=False)
    ch = batch.column("chunk").to_numpy(zero_copy_only=False).astype(np.int64)
    gs = np.concatenate(([0], np.flatnonzero(
        (np.diff(th.view(np.int64)) != 0) | (np.diff(ch) != 0)) + 1))
    ge = np.append(gs[1:], len(batch))
    new = PackRuns(block_size=block_size, with_positions=True)(batch)
    pk = PackGroups(block_size, True)
    old = pa.concat_tables([pk(batch.slice(s, e - s)) for s, e in zip(gs, ge)])
    old = old.select(new.column_names).cast(new.schema)
    for c in new.column_names:
        assert new.column(c).combine_chunks() == old.column(c).combine_chunks(), c
    # dt format: same postings + identical positions stream
    dt = PackRuns(block_size=block_size, with_positions=True, fmt="dt")(batch)
    assert dt.column("positions_bytes").combine_chunks() == \
        new.column("positions_bytes").combine_chunks()
    assert dt.column("pos_nbytes").combine_chunks() == \
        new.column("pos_nbytes").combine_chunks()
    from news_information_retrieval_system_ray.functions.postings import decode_dt

    for i in range(dt.num_rows):
        deltas, tfs = decode_dt(dt.column("dt_bytes")[i].as_py(),
                                dt.column("esc_bytes")[i].as_py())
        ids = np.cumsum(deltas.astype(np.int64))
        # classic row decodes to the same ids/tfs
        crow = new.slice(i, 1).to_pylist()[0]
        cids = np.cumsum(vbyte_decode(crow["docs_bytes"]).astype(np.int64))
        np.testing.assert_array_equal(ids, cids)
        np.testing.assert_array_equal(
            tfs.astype(np.int64), vbyte_decode(crow["tfs_bytes"]).astype(np.int64))
