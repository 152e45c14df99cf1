"""End-to-end: synthetic pages corpus -> distributed index build -> BM25
query parity against the vendored single-process oracle (FIXTURES §4.3).

Uses small blocks + small chunks so multi-block postings and chunk
merging are actually exercised at test scale.
"""

import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from news_information_retrieval_system_ray.functions.textnorm import extract_text_from_html
from news_information_retrieval_system_ray.oracle.reference_impl import OracleIndex
from news_information_retrieval_system_ray.pipelines.index_build import build_index
from news_information_retrieval_system_ray.pipelines.query import IndexSearcher
from news_information_retrieval_system_ray.sources.pages import REFERENCE_QUERIES, generate_pages

N_DOCS = 400


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("pages")
    paths = generate_pages(str(d), n_docs=N_DOCS, seed=42, n_files=4)
    return str(d), paths


@pytest.fixture(scope="module")
def built(ray_session, corpus, tmp_path_factory):
    corpus_dir, paths = corpus
    index_dir = str(tmp_path_factory.mktemp("index"))
    res = build_index(
        paths, index_dir,
        text_source="html", engine="cjk_bigram",
        block_size=16, chunk_bits=6, n_shards=3, with_positions=True,
        resume=False,
    )
    return res, index_dir


@pytest.fixture(scope="module")
def oracle(corpus):
    _, paths = corpus
    oi = OracleIndex(engine="cjk_bigram")
    doc_id = 0
    for p in paths:
        t = pq.read_table(p)
        for row in t.to_pylist():
            oi.add(doc_id, row["text"])
            doc_id += 1
    return oi


def test_extraction_byte_identical(corpus):
    """The extraction chain reproduces the golden `text` column per url."""
    _, paths = corpus
    for p in paths:
        t = pq.read_table(p)
        for row in t.to_pylist():
            assert extract_text_from_html(row["html"].decode("utf-8")) == row["text"]


def test_build_stats_match_oracle(built, oracle):
    res, _ = built
    assert res.n_docs == oracle.n_docs == N_DOCS
    assert abs(res.avg_doc_length - oracle.avgdl) < 1e-9


def test_postings_match_oracle(built, oracle):
    _, index_dir = built
    s = IndexSearcher(index_dir)
    # spot-check heavy, medium and rare terms incl. stopword-class skew terms
    for term in ["的", "在", "台灣", "颱風", "人工", "蘇澳", "word3", "ai"]:
        ids, tfs, dls = s.postings(term)
        expected = oracle.sorted_postings(term)
        assert list(ids) == [d for d, _ in expected], term
        assert list(tfs) == [tf for _, tf in expected], term
        assert list(dls) == [oracle.doc_lens[d] for d, _ in expected], term
        assert s.df(term) == len(expected)


def test_topk_rank_identical_all_queries(built, oracle):
    _, index_dir = built
    s = IndexSearcher(index_dir)
    for qid, query in REFERENCE_QUERIES.items():
        got = s.search(query, k=10, method="naive")
        want = oracle.search(query, k=10)
        assert [d for d, _ in got] == [d for d, _ in want], (qid, query, got, want)
        np.testing.assert_allclose(
            [sc for _, sc in got], [sc for _, sc in want], rtol=1e-12, atol=1e-12,
        )


def test_wand_equals_naive(built):
    _, index_dir = built
    s = IndexSearcher(index_dir)
    for qid, query in REFERENCE_QUERIES.items():
        naive = s.search(query, k=10, method="naive")
        wand = s.search(query, k=10, method="wand")
        assert [d for d, _ in naive] == [d for d, _ in wand], (qid, query)
        np.testing.assert_allclose(
            [sc for _, sc in naive], [sc for _, sc in wand], rtol=1e-9,
        )


def test_boolean_ops_match_oracle(built, oracle):
    _, index_dir = built
    s = IndexSearcher(index_dir)
    a, b = "颱風", "救援"
    and_ids = set(s.boolean_and([a, b]))
    or_ids = set(s.boolean_or([a, b]))
    pa_ids = set(oracle.postings.get(a, {}))
    pb_ids = set(oracle.postings.get(b, {}))
    assert and_ids == pa_ids & pb_ids
    assert or_ids == pa_ids | pb_ids
    not_ids = set(s.boolean_not([a], [b]))
    assert not_ids == pa_ids - pb_ids


def test_phrase_match_oracle(built, oracle):
    _, index_dir = built
    s = IndexSearcher(index_dir)
    # bigram tokens: phrase 台灣經濟 -> tokens 台灣,灣經,經濟 adjacent
    for phrase in [["台灣", "灣經", "經濟"], ["人工", "工智", "智慧"]]:
        got = list(s.phrase_docs(phrase))
        want = oracle.phrase_docs(phrase)
        assert got == want, phrase


def test_resume_skips_done_shards_and_is_identical(ray_session, corpus, tmp_path_factory):
    _, paths = corpus
    index_dir = str(tmp_path_factory.mktemp("index_resume"))
    r1 = build_index(paths, index_dir, text_source="html", engine="cjk_bigram",
                     block_size=16, chunk_bits=6, n_shards=3, resume=False)
    s1 = IndexSearcher(index_dir)
    q = "颱風災害"
    first = s1.search(q, k=10)
    # simulate a failed segments stage: wipe segments + manifest flag
    import json
    man_path = os.path.join(index_dir, "manifest.json")
    with open(man_path) as f:
        man = json.load(f)
    man["segments_done"] = False
    man["stats"] = None
    with open(man_path, "w") as f:
        json.dump(man, f)
    import shutil
    shutil.rmtree(os.path.join(index_dir, "segments"))
    r2 = build_index(paths, index_dir, text_source="html", engine="cjk_bigram",
                     block_size=16, chunk_bits=6, n_shards=3, resume=True)
    assert r2.resumed_shards == 3  # tokens stage skipped entirely
    s2 = IndexSearcher(index_dir)
    assert s2.search(q, k=10) == first
    assert r2.n_docs == r1.n_docs
    # per-phase metrics persisted next to the lineage; the resumed run
    # re-ran segments, so the recorded metrics reflect a real build
    with open(man_path) as f:
        metrics = json.load(f)["metrics"]
    assert metrics["posting_rows"] == r2.n_posting_rows
    assert set(metrics["phase_secs"]) >= {"tokens", "segments", "stats_collision"}
    assert metrics["total_secs"] > 0


def test_resume_rebuilds_only_missing_shard(ray_session, corpus, tmp_path_factory):
    _, paths = corpus
    index_dir = str(tmp_path_factory.mktemp("index_resume2"))
    build_index(paths, index_dir, text_source="html", engine="cjk_bigram",
                block_size=16, chunk_bits=6, n_shards=3, resume=False)
    s1 = IndexSearcher(index_dir)
    first = s1.search("颱風災害", k=10)
    # simulate a crash that lost one token shard mid-build
    import json
    import shutil as _sh
    man_path = os.path.join(index_dir, "manifest.json")
    with open(man_path) as f:
        man = json.load(f)
    man["shards"].pop("1")
    man["segments_done"] = False
    man["stats"] = None
    with open(man_path, "w") as f:
        json.dump(man, f)
    _sh.rmtree(os.path.join(index_dir, "tokens", "shard=1"))
    _sh.rmtree(os.path.join(index_dir, "segments"))
    r2 = build_index(paths, index_dir, text_source="html", engine="cjk_bigram",
                     block_size=16, chunk_bits=6, n_shards=3, resume=True)
    assert r2.resumed_shards == 2  # only the lost shard was rebuilt
    assert IndexSearcher(index_dir).search("颱風災害", k=10) == first
