"""Regression guard for the driver's correctness gate: a fast subset of
queries() vs oracle_sql() at sf0.001 (the full sweep is
scripts/check_oracle.py)."""

import importlib.util
import sys

import duckdb
import pytest

SUBSET = [
    "doc_stats", "term_stats", "corpus_stats", "bm25_topk", "boolean_and",
    "phrase_match", "facet_source_counts", "top_terms", "dedup_exact",
    "ann_topk", "doc_quality",
    # round-2 unroll/recursion oracles: exercise the fixed-iteration,
    # recursive-CTE and closed-form-solve SQL machinery from pytest too
    "textrank_fixed_topk", "term_star_clusters", "doc_hac_fixed",
    "cf_als_fixed", "lda_fixed_topics", "svo_triples",
    # full-phrase YAKE (sentence segmentation + n-gram phrase scoring,
    # seqm dedup disabled, ranks pinned on round4 scores) and the
    # greedy lev-ratio dedup replay (recursive-CTE walk)
    "yake_phrase_topk", "yake_levdedup_topk",
    # gazetteer NER: token-ordinal + char-offset extraction and the
    # entity_statistics / most_common_entities aggregates
    "ner_entities", "ner_type_stats", "ner_top_entities",
    # dense bi-encoder retrieval (feature-hashing encoder)
    "dense_retrieval",
    # distance-2 fuzzy expansion (banded Levenshtein vs DuckDB levenshtein)
    "fuzzy_expand", "fuzzy_distance_groups",
    # training-data curation (hash split + keep/drop composite)
    "train_split", "corpus_curate",
    # related-documents serving chain (hybrid RRF + field/relation boosts)
    "related_documents",
    # suggestion/expansion endpoints + diagnostics + VSM
    "search_suggestions", "expand_query", "query_analysis",
    "vsm_topk", "explain_coverage",
    # sketches, mixing, LM gate and the end-to-end curation composite
    "distinct_terms_hll", "term_counts_cms", "stratified_sample",
    "source_mix_sample", "perplexity_filter", "pack_sequences",
    "decontaminate", "llm_corpus_pipeline",
    # KeyBERT keyphrases: hashing encoder + the MMR greedy loop
    # unrolled as 4 chained SQL argmax steps
    "keybert_keywords",
]

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _load_checker():
    spec = importlib.util.spec_from_file_location("check_oracle", "/root/repo/scripts/check_oracle.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def harness(ray_session, sf_dir):
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return _load_checker(), entrymod, con


@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_oracle(harness, sf_dir, name):
    checker, entrymod, con = harness
    ray_df = checker.to_pandas(entrymod.queries()[name](sf_dir))
    sql_df = con.sql(entrymod.oracle_sql()[name]).df()
    assert checker.compare(name, ray_df, sql_df)
