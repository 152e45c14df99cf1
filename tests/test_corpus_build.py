"""Unified-corpus ETL (pipelines/corpus_build) — normalize_record branch
parity with corpus_builder.py:157-231 / data_contract.py:91-128, plus the
distributed dedup/cap/stats semantics on a hand-computed fixture."""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pytest

from news_information_retrieval_system_ray.functions.hashing import dedup_hash
from news_information_retrieval_system_ray.pipelines.corpus_build import (
    build_corpus,
    infer_source,
    normalize_record,
    normalize_tags,
    topics_to_tags,
    validate_candidate,
)


def ref_dedup_hash(title: str, url: str) -> str:
    # data_contract.compute_dedup_hash, verbatim formula
    key = f"{(title or '').strip().lower()}||{(url or '').strip().lower()}"
    return hashlib.md5(key.encode("utf-8")).hexdigest()


def test_dedup_hash_reference_formula():
    assert dedup_hash(" Big News ", "HTTPS://X.Y/a") == \
        ref_dedup_hash(" Big News ", "HTTPS://X.Y/a")
    assert dedup_hash("", "") == ref_dedup_hash(None, None)


def test_infer_source():
    assert infer_source("data/raw/yahoo_finance_2024.jsonl") == "yahoo"
    assert infer_source("data/raw/cna_14days.jsonl") == "cna"
    assert infer_source("x/dcard_posts.db") == "dcard"
    assert infer_source("data/processed/corpus_LTN.jsonl") == "corpus"


def test_normalize_tags_and_topics():
    assert normalize_tags("a, b ,, c ") == ["a", "b", "c"]
    assert normalize_tags(["x", " ", 3]) == ["x", "3"]
    assert normalize_tags(None) == []
    assert topics_to_tags([{"name": "n"}, {"title": "t"}, {"alias": "al"},
                           {"name": ""}, "plain", None]) == ["n", "t", "al", "plain"]


def test_validate_candidate_codes():
    assert validate_candidate("", "") == ["MISSING_FIELD", "MISSING_FIELD"]
    assert validate_candidate("x", "long enough content here....") == ["TITLE_TOO_SHORT"]
    assert validate_candidate("ok title", "short") == ["CONTENT_TOO_SHORT"]
    assert validate_candidate("ok title", "x" * 20) == []


def test_normalize_record_fallbacks_and_blocked():
    base = {"seq": 0, "title_clean": "A Fine Title", "body": "c" * 30,
            "crawl_source": "dcard", "origin_path": "p.jsonl",
            "topics": [{"name": "tv"}], "post_id": "P9", "school": "NTU",
            "created_at": "2024-02-02"}
    out = normalize_record(base)
    assert out["status"] == "valid"
    assert out["title"] == "A Fine Title"          # title_clean fallback
    assert out["content"] == "c" * 30              # body fallback
    assert out["content_type"] == "forum_post"     # dcard
    assert out["tags"] == "tv"                     # topics -> tags
    assert out["article_id"] == "P9"               # post_id fallback
    assert out["author"] == "NTU"                  # school fallback
    assert out["published_date"] == "2024-02-02"   # created_at fallback
    assert out["dedup_hash"] == ref_dedup_hash("A Fine Title", "")

    blocked = normalize_record({"seq": 1, "title": "Sorry, You Have Been Blocked",
                                "content": "c" * 30})
    assert blocked["status"] == "blocked"
    assert blocked["issue_codes"] == ["BLOCKED_PAGE"]

    missing = normalize_record({"seq": 2})
    assert missing["status"] == "invalid"
    assert missing["issue_codes"] == ["MISSING_FIELD", "MISSING_FIELD"]
    # no source, no crawl_source, empty origin -> the 'unknown' bucket
    assert missing["stat_source"] == "unknown"


@pytest.fixture()
def tiny_raw(ray_session):
    import ray.data as rd

    # arrival order = seq; sources A and B; hand-computed outcome:
    #   s0 A keeper h1 | s1 A dup(h1) | s2 B keeper h2 | s3 A invalid |
    #   s4 A keeper h3 | s5 A keeper h4 (capped at 2/source) |
    #   s6 A dup(h4) — its keeper was CAPPED but still owns the hash |
    #   s7 blocked
    rows = [
        dict(seq=0, title="t one", content="c" * 25, source="A", url="u1"),
        dict(seq=1, title="t one", content="c" * 25, source="A", url="u1"),
        dict(seq=2, title="t two", content="c" * 25, source="B", url="u2"),
        dict(seq=3, title="", content="c" * 25, source="A", url="u3"),
        dict(seq=4, title="t three", content="c" * 25, source="A", url="u4"),
        dict(seq=5, title="t four", content="c" * 25, source="A", url="u5"),
        dict(seq=6, title="t four", content="c" * 25, source="A", url="u5"),
        dict(seq=7, title="Sorry, You Have Been Blocked", content="c" * 25,
             source="A", url="u6"),
    ]
    cols = {k: [r.get(k) for r in rows] for k in ("seq", "title", "content",
                                                  "source", "url")}
    t = pa.table({"seq": pa.array(cols["seq"], pa.int64()),
                  **{k: pa.array(cols[k], pa.string())
                     for k in ("title", "content", "source", "url")}})
    return rd.from_arrow(t)


def test_build_corpus_dedup_caps_stats(tiny_raw):
    surv, stats, reasons = build_corpus(tiny_raw, max_docs_per_source=2,
                                        num_partitions=2)
    got = surv.to_pandas().sort_values("seq")
    # keepers: 0 (h1), 2 (h2), 4 (h3), 5 (h4) -> cap 2/source keeps A:0,4 B:2
    assert got["seq"].tolist() == [0, 2, 4]

    st = stats.set_index("source")
    assert st.loc["A", "scanned"] == 7
    assert st.loc["A", "invalid"] == 2          # s3 missing-title + s7 blocked
    assert st.loc["A", "duplicates"] == 2       # s1, s6 (s6's keeper was capped)
    assert st.loc["A", "written"] == 2          # post-cap writes
    assert st.loc["B", "written"] == 1

    rs = dict(zip(reasons["code"], reasons["n"]))
    assert rs == {"BLOCKED_PAGE": 1, "MISSING_FIELD": 1}


def test_build_corpus_global_cap(tiny_raw):
    surv, _, _ = build_corpus(tiny_raw, max_docs=2, num_partitions=2)
    got = surv.to_pandas().sort_values("seq")
    # keepers 0,2,4,5 in arrival order -> first 2
    assert got["seq"].tolist() == [0, 2]


def test_etl_file_roundtrip(ray_session, tmp_path):
    """parquet raw records -> read_raw_records (derived seq) ->
    build_corpus -> write_corpus (hive partitions + report) -> reread."""
    import json

    import pyarrow.parquet as pq
    from ray.data import read_parquet

    from news_information_retrieval_system_ray.pipelines.corpus_build import (
        read_raw_records, write_corpus)

    raw = pa.table({
        "title": pa.array([f"title {i}" for i in range(6)] + ["title 2"]),
        "content": pa.array(["c" * 30] * 7),
        "source": pa.array(["A", "A", "B", "B", "A", "B", "B"]),
        "url": pa.array([f"u{i}" for i in range(6)] + ["u2"]),  # row 6 dups row 2
    })
    src = tmp_path / "raw"
    src.mkdir()
    pq.write_table(raw, src / "part-0.parquet")

    ds = read_raw_records(str(src))
    assert "seq" in ds.schema().names
    surv, stats, reasons = build_corpus(ds, num_partitions=2)
    out = tmp_path / "corpus"
    write_corpus(surv, str(out), stats, reasons)

    assert (out / "_build_report.json").exists()
    rep = json.loads((out / "_build_report.json").read_text())
    assert rep["written"] == 6 and rep["duplicates"] == 1
    back = read_parquet(str(out)).to_pandas()
    assert len(back) == 6
    assert set(back["source"]) == {"A", "B"}  # hive partition column survives
