"""Posting block packing round-trips + BM25 math vs hand-computed values
(style of the reference's tests/test_term_weighting.py:12-90)."""

import math

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from news_information_retrieval_system_ray.functions.bm25 import idf, term_scores, tf_weight, topk_order
from news_information_retrieval_system_ray.functions.postings import (
    merge_packed,
    pack_postings,
    unpack_block,
    unpack_postings,
)


def test_idf_hand_value():
    # N=100, df=10 -> log((100-10+0.5)/(10+0.5)+1)
    assert math.isclose(float(idf(10, 100)), math.log((90.5 / 10.5) + 1.0))


def test_tf_weight_hand_value():
    # tf=2, dl=10, avgdl=10 -> 2*2.5/(2+1.5*1) = 5/3.5
    w = float(tf_weight(np.array([2]), np.array([10]), 10.0))
    assert math.isclose(w, 5.0 / 3.5)


def test_term_scores_combines():
    s = float(term_scores(np.array([2]), np.array([10]), df=10, n_docs=100, avgdl=10.0))
    assert math.isclose(s, math.log(90.5 / 10.5 + 1.0) * 5.0 / 3.5)


def test_topk_order_tiebreak():
    ids = np.array([7, 3, 9, 1])
    scores = np.array([1.0, 2.0, 1.0, 2.0])
    order = topk_order(ids, scores, 4)
    assert list(ids[order]) == [1, 3, 7, 9]  # (-score, doc_id asc)


def _rt(ids, tfs, dls, block_size):
    packed = pack_postings(np.array(ids), np.array(tfs), np.array(dls), block_size=block_size)
    out_ids, out_tfs, out_dls = unpack_postings(packed)
    assert list(out_ids) == list(ids)
    assert list(out_tfs) == list(tfs)
    assert list(out_dls) == list(dls)
    return packed


def test_pack_roundtrip_multi_block():
    ids = list(range(0, 1000, 3))
    tfs = [(i % 7) + 1 for i in range(len(ids))]
    dls = [10 + (i % 50) for i in range(len(ids))]
    packed = _rt(ids, tfs, dls, block_size=128)
    assert packed["df"] == len(ids)
    assert packed["cf"] == sum(tfs)
    assert len(packed["block_len"]) == math.ceil(len(ids) / 128)
    assert packed["block_last_doc"][-1] == ids[-1]
    # (max_tf, min_dl) extremes bound every in-block weight: weight is
    # monotone up in tf, down in dl (the reference UB, query_optimization.py:164-189)
    i0, t0, l0 = unpack_block(packed, 0)
    assert packed["block_max_tf"][0] == int(t0.max())
    assert packed["block_min_dl"][0] == int(l0.min())
    ub = float(tf_weight(np.array([packed["block_max_tf"][0]]),
                         np.array([packed["block_min_dl"][0]]), 10.0)[0])
    assert float(tf_weight(t0, l0, 10.0).max()) <= ub + 1e-12


def test_merge_packed_equals_single_pack():
    ids = np.arange(0, 500, 2)
    tfs = (ids % 5) + 1
    dls = np.full_like(ids, 20)
    whole = pack_postings(ids, tfs, dls, block_size=64)
    a = pack_postings(ids[:100], tfs[:100], dls[:100], block_size=64)
    b = pack_postings(ids[100:], tfs[100:], dls[100:], block_size=64)
    merged = merge_packed([a, b])
    mi, mt, ml = unpack_postings(merged)
    wi, wt, wl = unpack_postings(whole)
    assert list(mi) == list(wi)
    assert list(mt) == list(wt)
    assert list(ml) == list(wl)
    assert merged["df"] == whole["df"] and merged["cf"] == whole["cf"]


@given(st.sets(st.integers(min_value=0, max_value=10**9), min_size=1, max_size=400),
       st.integers(min_value=1, max_value=7))
@settings(max_examples=100, deadline=None)
def test_pack_roundtrip_property(idset, tfbase):
    ids = sorted(idset)
    tfs = [((i * tfbase) % 11) + 1 for i in range(len(ids))]
    dls = [((i * 13) % 90) + 1 for i in range(len(ids))]
    _rt(ids, tfs, dls, block_size=32)


@given(
    st.sets(st.integers(min_value=0, max_value=1 << 30), min_size=1, max_size=300),
    st.integers(min_value=1, max_value=5),
    st.integers(min_value=1, max_value=64),
)
@settings(max_examples=100, deadline=None)
def test_merge_packed_arbitrary_splits_property(ids_set, n_chunks, block_size):
    """Pack(whole) == merge(Pack(chunk_i)) for ANY split into consecutive
    doc-id ranges — the invariant behind skew chunk-splitting (SURVEY
    §7.5) and incremental append."""
    ids = np.array(sorted(ids_set), dtype=np.int64)
    tfs = (ids % 7) + 1
    dls = (ids % 90) + 10
    whole = pack_postings(ids, tfs, dls, block_size=block_size)
    bounds = np.linspace(0, ids.size, n_chunks + 1).astype(int)
    chunks = [pack_postings(ids[a:b], tfs[a:b], dls[a:b], block_size=block_size)
              for a, b in zip(bounds, bounds[1:]) if b > a]
    merged = merge_packed(chunks)
    wi, wt, wl = unpack_postings(whole)
    mi, mt, ml = unpack_postings(merged)
    assert list(mi) == list(wi)
    assert list(mt) == list(wt)
    assert list(ml) == list(wl)
    assert merged["df"] == whole["df"] and merged["cf"] == whole["cf"]
    # block metadata stays consistent for WAND: bounds must cover actuals
    assert max(merged["block_max_tf"]) == int(tfs.max())
    assert min(merged["block_min_dl"]) == int(dls.min())
    assert merged["block_last_doc"][-1] == int(ids[-1])


def test_explain_scores_consistency(ray_session, sf_dir):
    """Per-term contributions must sum to the rank-1 BM25 score."""
    import numpy as np

    from news_information_retrieval_system_ray.pipelines import analytics as A

    ex = A.explain_scores(sf_dir)
    top = A.bm25_topk(sf_dir, k=1).set_index("qid")
    for qid, g in ex.groupby("qid"):
        assert g["doc_id"].iloc[0] == top.loc[qid, "doc_id"]
        assert abs(g["contribution"].sum() - g["total_score"].iloc[0]) < 5e-3
        assert abs(g["total_score"].iloc[0] - top.loc[qid, "score"]) < 5e-3
        assert (g["contribution"] > 0).all()


@given(st.lists(st.tuples(st.integers(0, 1 << 40),    # doc id
                          st.integers(1, 1 << 20),    # tf (escape-heavy tail)
                          st.integers(1, 1 << 18)),   # dl
                min_size=1, max_size=300),
       st.integers(2, 64))
@settings(max_examples=60, deadline=None)
def test_dt_stream_roundtrip_property(rows, block_size):
    """Combined dt layout (pack_postings_runs combined=True) round-trips
    arbitrary (id, tf) pairs — including huge tfs through the escape
    stream and 40-bit doc ids through the shifted delta — and its df/cf
    and block metadata match the split layout bit-for-bit."""
    from news_information_retrieval_system_ray.functions.postings import (
        decode_dt,
        pack_postings_runs,
    )

    ids = np.array(sorted({r[0] for r in rows}), dtype=np.int64)
    rng = np.random.default_rng(7)
    tfs = np.array([rows[i % len(rows)][1] for i in range(ids.size)], dtype=np.int64)
    dls = np.array([rows[i % len(rows)][2] for i in range(ids.size)], dtype=np.int64)
    gs = np.array([0], dtype=np.int64)
    dt = pack_postings_runs(ids, tfs, dls, gs, block_size=block_size,
                            bounds=True, encode_dls=False, combined=True)
    split = pack_postings_runs(ids, tfs, dls, gs, block_size=block_size,
                               bounds=True, encode_dls=False, combined=False)
    deltas, tfs_out = decode_dt(dt["dt_all"], dt["esc_all"])
    # undo per-block absolute resets exactly like unpack_postings
    bl = dt["block_len"].astype(np.int64)
    starts = np.concatenate(([0], np.cumsum(bl)[:-1]))
    tot = np.cumsum(deltas)
    base = tot[starts] - deltas[starts]
    ids_out = tot - np.repeat(base, bl)
    np.testing.assert_array_equal(ids_out, ids)
    np.testing.assert_array_equal(tfs_out, tfs)
    for key in ("df", "cf", "block_len", "block_last_doc", "block_max_tf",
                "block_min_dl", "block_bound_tf", "block_bound_dl"):
        np.testing.assert_array_equal(np.asarray(dt[key]), np.asarray(split[key]), err_msg=key)
    # per-block slicing: every block decodes independently
    dt_off = np.concatenate(([0], np.cumsum(dt["block_dt_nbytes"])))
    esc_off = np.concatenate(([0], np.cumsum(dt["block_esc_nbytes"])))
    for bi in range(bl.size):
        d_b, t_b = decode_dt(dt["dt_all"][dt_off[bi]:dt_off[bi + 1]],
                             dt["esc_all"][esc_off[bi]:esc_off[bi + 1]])
        lo, hi = int(starts[bi]), int(starts[bi] + bl[bi])
        np.testing.assert_array_equal(np.cumsum(d_b), ids[lo:hi])
        np.testing.assert_array_equal(t_b, tfs[lo:hi])


def test_merge_packed_rejects_mixed_stream_layouts():
    """ADVICE r3: field presence is keyed off chunks[0]; a mix of stream
    layouts in one term's chunks must raise, not silently drop bytes."""
    import pytest

    ids = np.arange(0, 200, 2)
    tfs = (ids % 5) + 1
    dls = np.full_like(ids, 20)
    a = pack_postings(ids[:50], tfs[:50], dls[:50], block_size=64)
    b = pack_postings(ids[50:], tfs[50:], dls[50:], block_size=64)
    b2 = dict(b)
    del b2["dls_bytes"]  # simulate a sidecar-layout chunk next to inline-dls
    with pytest.raises(ValueError, match="mixed stream layouts"):
        merge_packed([a, b2])


def test_doclen_lookup_missing_id_raises():
    """ADVICE r3: a doc_id absent from the sidecar must raise, never
    return a neighboring doc's length."""
    import pytest

    from news_information_retrieval_system_ray.functions.postings import DocLenLookup

    lk = DocLenLookup(np.array([2, 5, 9], dtype=np.int64),
                      np.array([10, 20, 30], dtype=np.int64))
    assert list(lk(np.array([5, 2, 9]))) == [20, 10, 30]
    with pytest.raises(KeyError, match="sidecar"):
        lk(np.array([5, 3]))  # 3 absent (interior)
    with pytest.raises(KeyError, match="sidecar"):
        lk(np.array([11]))  # past the end
    # empty sidecar: any lookup is an error, empty query is fine
    empty = DocLenLookup(np.empty(0, np.int64), np.empty(0, np.int64))
    assert list(empty(np.empty(0, np.int64))) == []
    with pytest.raises(KeyError, match="sidecar"):
        empty(np.array([0]))


def test_doclen_lookup_dense_path_missing_id_raises():
    """r4 review: the dense fast path must not wrap negative offsets —
    an id below base silently returned another doc's length."""
    import pytest

    from news_information_retrieval_system_ray.functions.postings import DocLenLookup

    lk = DocLenLookup(np.arange(100, 200, dtype=np.int64),
                      np.arange(100, 200, dtype=np.int64) * 2)
    assert lk.dense
    assert list(lk(np.array([150, 100, 199]))) == [300, 200, 398]
    with pytest.raises(KeyError, match="sidecar"):
        lk(np.array([50]))  # below base: used to wrap to dls[-50]
    with pytest.raises(KeyError, match="sidecar"):
        lk(np.array([200]))  # past the end
