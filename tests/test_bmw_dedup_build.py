"""Block-Max-WAND skip effectiveness on skewed postings, and the
dedup-before-indexing build flag (incremental_builder.py use_dedup)."""

import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from news_information_retrieval_system_ray.pipelines.index_build import build_index
from news_information_retrieval_system_ray.pipelines.query import IndexSearcher


@pytest.fixture(scope="module")
def skewed_index(ray_session, tmp_path_factory):
    """Corpus where 'common' is everywhere with tf=1 but a small cluster
    of docs has huge tf for both query terms — selective enough for the
    block-max probe to skip."""
    rng = np.random.default_rng(3)
    texts = []
    for i in range(12000):
        if i % 997 == 0:
            # spike: huge tf for 'peaky' -> high GLOBAL upper bound
            texts.append(" ".join(["common"] * 3 + ["peaky"] * 50))
        elif i % 3 == 0:
            # weak peaky presence: tf=1 -> weak BLOCK upper bounds
            texts.append("common peaky " + " ".join(f"w{rng.integers(0, 500)}" for _ in range(18)))
        else:
            texts.append("common " + " ".join(f"w{rng.integers(0, 500)}" for _ in range(20)))
    d = tmp_path_factory.mktemp("skew")
    pq.write_table(pa.table({"doc_id": pa.array(range(12000), pa.int64()),
                             "text": pa.array(texts, pa.string())}),
                   str(d / "docs.parquet"), row_group_size=1000)
    idx = tempfile.mkdtemp(prefix="skew_idx_")
    build_index(str(d / "docs.parquet"), idx, text_source="text", id_col="doc_id",
                engine="whitespace", n_shards=2, chunk_bits=16, block_size=64,
                resume=False)
    return IndexSearcher(idx)


def test_bmw_skips_blocks_and_stays_exact(skewed_index):
    s = skewed_index
    wand = s.search("common peaky", k=4, method="wand")
    naive = s.search("common peaky", k=4, method="naive")
    assert wand == naive
    st = s.last_wand_stats
    # the probe prunes per-posting scoring inside weak blocks; whole-block
    # decode bypass would need a shallow/deep cursor split (future work)
    assert st["skips"] > 0, f"block-max probe never fired: {st}"


def test_dedup_first_build(ray_session, tmp_path):
    texts = ["alpha beta gamma", "delta epsilon", "alpha beta gamma",
             "zeta eta", "delta epsilon", "unique doc"]
    pq.write_table(pa.table({"doc_id": pa.array(range(6), pa.int64()),
                             "text": pa.array(texts, pa.string())}),
                   str(tmp_path / "docs.parquet"))
    idx = tempfile.mkdtemp(prefix="dedup_idx_")
    r = build_index(str(tmp_path / "docs.parquet"), idx, text_source="text",
                    id_col="doc_id", engine="whitespace", n_shards=1,
                    chunk_bits=8, resume=False, dedup_exact_first=True)
    assert r.n_docs == 4  # two duplicate pairs collapsed, first-wins
    s = IndexSearcher(idx)
    ids, _, _ = s.postings("alpha")
    assert list(ids) == [0]  # keeper is the smallest doc_id
    ids2, _, _ = s.postings("delta")
    assert list(ids2) == [1]
    assert list(s.postings("unique")[0]) == [5]


def test_auto_dispatch(skewed_index):
    """method='auto' must (a) return rank-identical results, (b) pick
    WAND on the skewed (prunable) query and naive on a flat one."""
    s = skewed_index
    assert s.search("common peaky", k=4, method="auto") \
        == s.search("common peaky", k=4, method="naive")
    # skewed query: bounds vary -> dispatch says prunable
    tw = s._term_weights(s._query_terms("common peaky"))
    assert s._wand_prunable(tw) is True
    # flat query: 'common' alone has tf~1 everywhere except spikes...
    # w-terms have uniform tf=1 -> median == max -> not prunable
    tw_flat = s._term_weights(s._query_terms("w1 w2"))
    assert s._wand_prunable(tw_flat) is False
    assert s.search("w1 w2", k=4, method="auto") \
        == s.search("w1 w2", k=4, method="naive")
