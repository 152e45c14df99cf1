"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship pipeline (full inverted-index build +
BM25 top-k) on sf0.001; ``queries()`` exposes each implemented operator
(SURVEY.md §2) as a callable over an sf_dir; ``oracle_sql()`` gives the
DuckDB-equivalent SQL for every SQL-expressible operator.

Ray is initialised by the caller; nothing here calls ray.init/shutdown.
"""

from __future__ import annotations

import tempfile
from collections.abc import Callable
from typing import Any

from news_information_retrieval_system_ray.pipelines import analytics as A
from news_information_retrieval_system_ray.pipelines import corpus_build as CB
from news_information_retrieval_system_ray.pipelines import ltr as L
from news_information_retrieval_system_ray.pipelines import recommend as RC
from news_information_retrieval_system_ray.pipelines import bertopic as BT
from news_information_retrieval_system_ray.pipelines import feedback as FB
from news_information_retrieval_system_ray.pipelines import topics as T
from news_information_retrieval_system_ray.pipelines import curation as CU

# ---------------------------------------------------------------------------
# Shared SQL fragments. Tokenization contract (matches the Ray side exactly —
# see pipelines/analytics.py docstring): lower -> ws-collapse -> trim ->
# split(' ') -> keep tokens matching [a-z0-9_].
# ---------------------------------------------------------------------------
_CTE = """
WITH norm AS (
  SELECT doc_id, source, lang,
         trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
  FROM documents
),
toks AS (
  SELECT doc_id, unnest(string_split(t, ' ')) AS term FROM norm
),
ft AS (
  SELECT doc_id, term FROM toks WHERE regexp_matches(term, '[a-z0-9_]')
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM ft GROUP BY doc_id, term),
dln AS (SELECT d.doc_id, greatest(1, coalesce(c.n, 0)) AS dl
        FROM documents d LEFT JOIN
             (SELECT doc_id, count(*) AS n FROM ft GROUP BY doc_id) c
             ON d.doc_id = c.doc_id),
stats AS (SELECT (SELECT count(*) FROM documents) AS n,
                 (SELECT avg(dl) FROM dln) AS avgdl)
"""


# gazetteer NER: filtered-token ordinality + the demo lexicon
# (mirrors functions/ner.py DEFAULT_GAZETTEER — keep the VALUES in sync)
_NER_CTE = """
            WITH norm AS (
              SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
              FROM documents),
            nfl AS (
              SELECT doc_id, list_filter(string_split(t, ' '),
                     x -> regexp_matches(x, '[a-z0-9_]')) AS toks
              FROM norm),
            nseq AS (
              SELECT doc_id, unnest(toks) AS term, generate_subscripts(toks, 1) AS pos
              FROM nfl WHERE len(toks) > 0),
            gaz(ent_text, ent_type) AS (VALUES
              ('spark', 'PRODUCT'), ('customer', 'PERSON'),
              ('group', 'ORG'), ('part', 'ORG'),
              ('window', 'EVENT'), ('stream', 'EVENT'),
              ('batch', 'QUANTITY'), ('row', 'QUANTITY'),
              ('table', 'WORK_OF_ART'))"""


_YAKE_CTE = """
            WITH norm AS (
              SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
              FROM documents),
            fl AS (
              SELECT doc_id, list_filter(string_split(t, ' '),
                     x -> regexp_matches(x, '[a-z0-9_]')) AS toks
              FROM norm),
            seq AS (
              SELECT doc_id, unnest(toks) AS term, generate_subscripts(toks, 1) AS pos
              FROM fl WHERE len(toks) > 0),
            nb AS (
              SELECT doc_id, term, pos,
                     lag(term)  OVER (PARTITION BY doc_id ORDER BY pos) AS lt,
                     lead(term) OVER (PARTITION BY doc_id ORDER BY pos) AS rt
              FROM seq),
            tstat AS (
              SELECT doc_id, term, count(*) AS tf, median(pos) AS med,
                     count(lt) AS lc, count(DISTINCT lt) AS ld,
                     count(rt) AS rc, count(DISTINCT rt) AS rd
              FROM nb GROUP BY doc_id, term),
            dstat AS (
              SELECT doc_id, avg(tf) AS mtf, coalesce(stddev_pop(tf), 0) AS stf,
                     max(tf) AS xtf
              FROM tstat GROUP BY doc_id),
            s AS (
              SELECT t.doc_id, t.term,
                     (1 + ((CASE WHEN t.lc > 0 THEN t.ld * 1.0 / t.lc ELSE 0 END)
                         + (CASE WHEN t.rc > 0 THEN t.rd * 1.0 / t.rc ELSE 0 END))
                          * t.tf / d.xtf) AS rel,
                     ln(ln(3 + t.med)) AS posw,
                     t.tf / (d.mtf + d.stf) AS tfnorm
              FROM tstat t JOIN dstat d USING (doc_id)),
            ranked AS (
              SELECT doc_id, term, (rel * posw) / ((tfnorm + 1) / rel) AS score,
                     row_number() OVER (
                       PARTITION BY doc_id
                       ORDER BY (rel * posw) / ((tfnorm + 1) / rel) ASC, term ASC) AS rank
              FROM s)
"""


def _qterms_values() -> str:
    rows = []
    for qid, terms in A.FIXED_QUERIES.items():
        rows += [f"('{qid}', '{t}')" for t in terms]
    return ", ".join(rows)


def entry() -> Any:
    """Flagship: build the inverted index over sf0.001 documents (whitespace
    engine) and serve the fixed BM25 queries -> (qid, rank, doc_id, score)."""
    import pandas as pd

    from news_information_retrieval_system_ray.pipelines.index_build import build_index
    from news_information_retrieval_system_ray.pipelines.query import IndexSearcher

    sf_dir = "/root/testdata/sf0.001"
    index_dir = tempfile.mkdtemp(prefix="nirs_entry_idx_")
    build_index(
        f"{sf_dir}/documents.parquet", index_dir,
        text_source="text", id_col="doc_id", engine="whitespace",
        n_shards=2, chunk_bits=8, resume=False,
    )
    s = IndexSearcher(index_dir)
    rows = []
    for qid, terms in A.FIXED_QUERIES.items():
        for rank, (doc_id, score) in enumerate(s.search(" ".join(terms), k=10, method="wand"), 1):
            rows.append((qid, rank, doc_id, A.round4(score)))
    return pd.DataFrame(rows, columns=["qid", "rank", "doc_id", "score"])


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        # core IR pipeline (documents table)
        "doc_stats": A.doc_stats,
        "term_stats": A.term_stats,
        "postings_flat": A.postings_flat,
        "corpus_stats": A.corpus_stats,
        "bm25_topk": A.bm25_topk,
        "bm25_wand_topk": A.bm25_wand_topk,
        # doc-sharded distributed serving: per-shard WAND over disjoint
        # chunk sets + driver k-way merge (pipelines/serve.py)
        "bm25_sharded_topk": A.bm25_sharded_topk,
        # same queries through the pipelined BULK serving path
        # (ShardedSearcher.search_many)
        "bm25_sharded_bulk": A.bm25_sharded_bulk,
        # tombstone deletion (beyond-reference): doc_id %% 7 == 3 deleted,
        # frozen-stats semantics (index_build.delete_docs)
        "bm25_deleted_topk": A.bm25_deleted_topk,
        # delete + compact: segments rewritten, stats recomputed over
        # the live corpus (index_build.compact_index)
        "bm25_compacted_topk": A.bm25_compacted_topk,
        "tfidf_topk": A.tfidf_topk,
        "lm_dirichlet_topk": A.lm_dirichlet_topk,
        "lm_jm_topk": A.lm_jm_topk,
        "bim_topk": A.bim_topk,
        "hybrid_rrf": A.hybrid_rrf,
        # SMART lnc.ltc vector-space model (vsm.py:86-300)
        "vsm_topk": A.vsm_topk,
        # deterministic md5-keyed sketches (stages/sketches.py)
        "distinct_terms_hll": A.distinct_terms_hll,
        "term_counts_cms": A.term_counts_cms,
        "field_boost_topk": A.field_boost_topk,
        # the app's INDEX-side field weighting (title x3 + tags +
        # category + content composed text, index_service.py:220-231)
        "fieldweighted_bm25": A.fieldweighted_bm25,
        # the FULL serving flow: rank at corpus depth -> field boost ->
        # facet filter -> truncate -> matched terms (search_service.py:
        # 82-197 filter-then-truncate rule)
        "search_serving": A.search_serving,
        "fuzzy_match": A.fuzzy_match,
        "fuzzy_expand": A.fuzzy_expand,
        "fuzzy_distance_groups": A.fuzzy_distance_groups,
        "wildcard_match": A.wildcard_match,
        "facet_filtered_search": A.facet_filtered_search,
        # multi-condition FacetFilter engine (IN + STARTS_WITH + RANGE
        # + GTE + CONTAINS, AND-combined; facet_filter.py:251-458)
        "facet_filter_multi": A.facet_filter_multi,
        # source/topic taxonomy normalization (taxonomy.py:118-186)
        "taxonomy_normalize": A.taxonomy_normalize,
        # structured JSON query, OR logic + matched-condition count
        # (query_executor.py:319-424)
        "structured_query_or": A.structured_query_or,
        # document-detail assembly: lead-2 summary + per-doc tf.idf
        # keywords (document_detail_service.py:32-136)
        "document_detail": A.document_detail,
        # explainable related documents: related-query -> hybrid RRF ->
        # field boost -> relation boost (search_service.py:803-989)
        "related_documents": A.related_documents,
        # typed no-result suggestions: synonym/fuzzy/csoundex/rocchio
        # expansions (search_service.py:750-801)
        "search_suggestions": A.search_suggestions,
        # the expand_query API payload (search_service.py:587-625)
        "expand_query": A.expand_query,
        # query-analysis payload: stopword/protected/synonym machinery
        # (text_quality.py:137-156)
        "query_analysis": A.query_analysis,
        # ranking-diagnostics field matrix + query coverage
        # (ranking_diagnostics_service.py:190-280)
        "explain_field_matrix": A.explain_field_matrix,
        "explain_coverage": A.explain_coverage,
        "eval_metrics": A.eval_metrics,
        "explain_scores": A.explain_scores,
        "eval_pr_at_k": A.eval_pr_at_k,
        # app evaluation-service curve diagnostics
        # (evaluation_service.py:579-650)
        "eval_pr_curve": A.eval_pr_curve,
        "eval_interpolated_precision": A.eval_interpolated_precision,
        "eval_f_beta": A.eval_f_beta,
        "search_snippets": A.search_snippets,
        "kwic_fixed": A.kwic_contexts_query,
        "textrank_keywords": A.textrank_keywords,
        "textrank_fixed_topk": A.textrank_fixed_topk,
        "summarize_leadk": A.summarize_leadk,
        "summarize_key_sentences": A.summarize_key_sentences,
        "summarize_query_focused": A.summarize_query_focused,
        "summarize_multidoc": A.summarize_multidoc,
        "boolean_and": A.boolean_and,
        "boolean_and_not": lambda sf: A.boolean_and_not(sf),
        # sharded boolean serving shares the and_not oracle
        "boolean_sharded": A.boolean_sharded,
        "boolean_parsed": A.boolean_parsed,
        "date_range_query": A.date_range_query,
        "field_query": A.field_query,
        "phrase_match": A.phrase_match,
        "proximity_match": A.proximity_match,
        "window_match": A.window_match,
        "unified_search": A.unified_search,
        # facets / browse / aggregates
        "facet_numeric_ranges": A.facet_numeric_ranges,
        "facet_source_counts": A.facet_source_counts,
        "facet_lang_counts": A.facet_lang_counts,
        "top_terms": A.top_terms,
        "per_source_top_terms": A.per_source_top_terms,
        "browse_sort": A.browse_sort,
        "events_windowed": A.events_windowed,
        "events_sessionize": A.events_sessionize,
        "bigram_pmi": A.bigram_pmi,
        "bigram_collocations": A.bigram_collocations,
        "ngram_lm_perplexity": A.ngram_lm_perplexity,
        "substring_freq": A.substring_freq,
        "rake_keywords": A.rake_keywords,
        "keyword_eval": A.keyword_eval,
        "yake_unigram_topk": A.yake_unigram_topk,
        "yake_phrase_topk": A.yake_phrase_topk,
        "yake_levdedup_topk": A.yake_levdedup_topk,
        "yake_keywords": A.yake_doc_keywords,
        "csoundex_expand": A.csoundex_expand,
        "phonetic_search": A.phonetic_search,
        "facet_date_ranges": A.facet_date_ranges,
        # cleaning / dates / feedback
        "clean_corpus": A.clean_corpus,
        # unified-corpus ETL (corpus_builder.py:91-231): normalize_record
        # fallback chains + blocked/validation + first-wins dedup +
        # per-source/global caps (rows), per-source counters, and the
        # global invalid_reasons tally
        "corpus_build": CB.corpus_build,
        "corpus_build_stats": CB.corpus_build_stats,
        "corpus_invalid_reasons": CB.corpus_invalid_reasons,
        "corpus_audit": A.corpus_audit,
        "standardize_dates": A.standardize_dates,
        "rocchio_topk": A.rocchio_topk,
        # explicit-feedback Rocchio with the gamma negative term
        # (rocchio.py:248-276, expand_query.py explicit protocol)
        "rocchio_explicit": A.rocchio_explicit,
        # the expander's query-expansion output: drift-guarded top-10
        # candidate terms (rocchio.py:278-333)
        "rocchio_expansion_terms": A.rocchio_expansion_terms,
        # feedback-analytics dashboard core over the derived search/
        # click/relevance log (feedback_analytics_service.py:24-508)
        "feedback_summary": FB.feedback_summary,
        "feedback_model_metrics": FB.feedback_model_metrics,
        "feedback_top_queries": FB.feedback_top_queries,
        "feedback_top_clicked": FB.feedback_top_clicked,
        "feedback_zero_results": FB.feedback_zero_results,
        "feedback_relevance_dist": FB.feedback_relevance_dist,
        "feedback_position_bias": FB.feedback_position_bias,
        # quality / counting / fingerprints
        "doc_quality": A.doc_quality,
        "token_counts": A.token_counts,
        "lang_id": A.lang_id,
        "fingerprints": A.fingerprints,
        # NER (gazetteer fallback; ner_extractor.py parity)
        "ner_entities": A.ner_entities,
        "ner_type_stats": A.ner_type_stats,
        "ner_top_entities": A.ner_top_entities,
        # dense bi-encoder retrieval (bert_retrieval.py parity;
        # feature-hashing encoder, full path oracle-checked)
        "dense_retrieval": A.dense_retrieval,
        # KeyBERT keyphrases (keybert_extractor.py parity; hashing
        # encoder, MMR loop oracle-checked via 4 unrolled argmax steps)
        "keybert_keywords": A.keybert_keywords,
        # dedup family
        # training-data curation (hash split / epoch shuffle / keep-drop
        # composite — pipelines/curation.py)
        "train_split": CU.train_split,
        "train_shuffle_head": CU.train_shuffle_head,
        "corpus_curate": CU.corpus_curate,
        "decontaminate": CU.decontaminate,
        "pack_sequences": CU.pack_sequences,
        "stratified_sample": CU.stratified_sample,
        "source_mix_sample": CU.source_mix_sample,
        # CCNet-style LM quality gate (per-doc bigram perplexity)
        "perplexity_filter": CU.perplexity_filter,
        # the END-TO-END training-data pipeline: curate -> decontaminate
        # -> perplexity gate -> split -> per-split sequence packing
        "llm_corpus_pipeline": CU.llm_corpus_pipeline,
        "dedup_exact": A.dedup_exact,
        "dedup_minhash": A.dedup_minhash,
        "dedup_simhash": A.dedup_simhash,
        "dedup_ngram_jaccard": A.dedup_ngram_jaccard,
        "dedup_embedding": A.dedup_embedding,
        "dedup_embedding_lsh": A.dedup_embedding_lsh,
        # similarity search
        "ann_topk": A.ann_topk,
        "ann_lsh": A.ann_lsh,
        "ann_lsh_bucketed": A.ann_lsh_bucketed,
        "ann_ivf": A.ann_ivf,
        "ann_ivfpq": A.ann_ivfpq,
        "index_audit": A.index_audit,
        "embedding_nn_within_label": A.embedding_nn_within_label,
        "embedding_kmeans": A.embedding_kmeans,
        "doc_hac_clusters": A.doc_hac_clusters,
        # oracle-checkable HAC variant: smaller doc set + sims rounded
        # to 9dp on both sides so FP summation order can't flip a merge
        "doc_hac_fixed":
            lambda sf: A.doc_hac_clusters(sf, n_docs=40, k=6, sim_decimals=9),
        # threshold 0.3 (not the reference's 0.7 default) so the tiny
        # synthetic vocab actually forms multi-member stars and the
        # greedy absorb path is exercised end-to-end by the oracle
        "term_star_clusters": lambda sf: A.term_star_clusters(sf, threshold=0.3),
        # min_cooc 330 sits at the ~90th percentile of the synthetic
        # corpus's pair-doc counts, so the greedy walk exercises BOTH
        # paths: some centers absorb members, others stay singletons
        "term_cooccurrence_clusters":
            lambda sf: A.term_cooccurrence_clusters(sf, min_cooccurrence=330),
        "lda_topics": T.lda_topics,
        "lda_fixed_topics": T.lda_fixed_topics,
        "lda_fixed_doc_topics": T.lda_fixed_doc_topics,
        "lda_fixed_perplexity": T.lda_fixed_perplexity,
        "lda_doc_topics": T.lda_doc_topics,
        "lda_perplexity": T.lda_perplexity,
        # BERTopic pipeline (embed -> cluster -> c-TF-IDF), k-means
        # clustering backend + corpus embedding column standing in for
        # the absent HDBSCAN/SentenceTransformer (pipelines/bertopic.py)
        "bertopic_topics": BT.bertopic_topics,
        "bertopic_topic_info": BT.bertopic_topic_info,
        "bertopic_doc_topics": BT.bertopic_doc_topics,
        "bertopic_repr_docs": BT.bertopic_repr_docs,
        "bertopic_find_topics": BT.bertopic_find_topics,
        "bertopic_reduced_topics": BT.bertopic_reduced_topics,
        # cluster-topic exploration cards (cluster_topic_service.py:
        # 130-216) over the same kmeans backbone
        "cluster_topic_cards": A.cluster_topic_cards,
        "cluster_representatives": A.cluster_representatives,
        # multimodal: stubbed plumbing + REAL wav/ppm decode path
        "media_features": A.media_features,
        "media_features_real": A.media_features_real,
        "video_frame_features": A.video_frame_features,
        "video_frame_features_real": A.video_frame_features_real,
        # recommenders (events interactions + documents content)
        "cf_item_similar": RC.cf_item_similar,
        "cf_user_recs": RC.cf_user_recs,
        "cf_als": RC.cf_als,
        "cf_als_fixed": RC.cf_als_fixed,
        "recommend_similar": RC.recommend_similar,
        "hybrid_recommend": RC.hybrid_recommend,
        # PAT-tree keyword extraction (corpus term-stats scoring)
        "pat_keywords": A.pat_keywords,
        # syntax plumbing (SVO tree walk; parser model stubbed)
        "svo_triples": A.svo_triples,
        # learning-to-rank (app LTR services)
        "ltr_features": L.ltr_features,
        "ltr_train": L.ltr_train,
        "ltr_rerank": L.ltr_rerank,
    }


def _ann_lsh_sql() -> str:
    """DuckDB replica of analytics.ann_lsh (stages/ann.LshSignStage +
    lsh_topk, n_planes=8, n_tables=4, seed=99, multiprobe=1, k=10)."""
    import numpy as np

    planes = np.random.default_rng(99).standard_normal((4, 8, 64))
    plane_rows = ", ".join(
        f"({t},{p},{j},{float(planes[t, p, j])!r})"
        for t in range(4) for p in range(8) for j in range(64))
    return f"""
        WITH planes(t, p, j, w) AS (VALUES {plane_rows}),
        ev AS (SELECT vec_id, unnest(CAST(embedding AS DOUBLE[])) AS x,
                      unnest(range(0, 64)) AS j
               FROM embeddings),
        dots AS (SELECT e.vec_id, pl.t, pl.p, sum(e.x * pl.w) AS d
                 FROM ev e JOIN planes pl ON pl.j = e.j
                 GROUP BY e.vec_id, pl.t, pl.p),
        bits AS (SELECT vec_id, t,
                        sum(CASE WHEN d > 0 THEN 1 << p ELSE 0 END) + (t << 9) AS bucket
                 FROM dots GROUP BY vec_id, t),
        qb AS (SELECT t, bucket FROM bits WHERE vec_id < 5),
        probe AS (SELECT DISTINCT bucket FROM qb
                  UNION
                  SELECT DISTINCT xor(bucket - (t << 9), 1 << r.i) + (t << 9)
                  FROM qb CROSS JOIN range(0, 8) r(i)),
        cand AS (SELECT DISTINCT b.vec_id FROM bits b
                 JOIN probe pr ON b.bucket = pr.bucket),
        sims AS (SELECT q.vec_id AS qid, e.vec_id,
                        list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                               CAST(e.embedding AS DOUBLE[])) AS score
                 FROM embeddings q
                 CROSS JOIN (SELECT em.* FROM embeddings em JOIN cand USING (vec_id)) e
                 WHERE q.vec_id < 5),
        ranked AS (SELECT qid, vec_id, score,
                          row_number() OVER (PARTITION BY qid
                                             ORDER BY score DESC, vec_id) AS rank
                   FROM sims)
        SELECT qid, rank, vec_id, round(score, 4) AS score
        FROM ranked WHERE rank <= 10"""


def _kmeans_cte(k: int, n_iter: int = 8, seed: int = 17) -> str:
    """WITH-chain replicating stages/ann.kmeans: seeded init + ``n_iter``
    Lloyd iterations UNROLLED as chained CTEs, final centroids in
    ``cent{n_iter}`` and the unnested vectors in ``ev``.

    Init replicates take_batch(64) + default_rng(seed).choice(64, k,
    replace=False) — the embeddings parquet is written in vec_id order,
    so the first batch's row i IS vec_id i.  Assignment ties break to
    the lowest cid (numpy argmin); empty clusters keep their previous
    centroid (coalesce)."""
    import numpy as np

    idx = np.random.default_rng(seed).choice(64, size=k, replace=False)
    init_rows = ", ".join(f"({c}, {int(v)})" for c, v in enumerate(idx))
    parts = [f"""
        WITH initidx(cid, vid) AS (VALUES {init_rows}),
        ev AS (SELECT vec_id, unnest(CAST(embedding AS DOUBLE[])) AS x,
                      unnest(range(0, 64)) AS j
               FROM embeddings),
        cent0 AS (SELECT i.cid, e.j, e.x AS w
                  FROM initidx i JOIN ev e ON e.vec_id = i.vid)"""]
    prev = "cent0"
    for i in range(1, n_iter + 1):
        parts.append(f""",
        d{i} AS (SELECT e.vec_id, c.cid, sum((e.x - c.w) * (e.x - c.w)) AS d2
                 FROM ev e JOIN {prev} c ON c.j = e.j
                 GROUP BY e.vec_id, c.cid),
        l{i} AS (SELECT vec_id, cid FROM (
                   SELECT vec_id, cid,
                          row_number() OVER (PARTITION BY vec_id
                                             ORDER BY d2, cid) AS rn
                   FROM d{i}) WHERE rn = 1),
        u{i} AS (SELECT l.cid, e.j, avg(e.x) AS w
                 FROM l{i} l JOIN ev e USING (vec_id) GROUP BY l.cid, e.j),
        cent{i} AS (SELECT c.cid, c.j, coalesce(u.w, c.w) AS w
                    FROM {prev} c LEFT JOIN u{i} u
                         ON u.cid = c.cid AND u.j = c.j)""")
        prev = f"cent{i}"
    return "".join(parts)


def _kmeans_sql() -> str:
    """DuckDB replica of analytics.embedding_kmeans (k=8, n_iter=8,
    seed=17): final assignment + squared distance per vector."""
    return _kmeans_cte(8) + """,
        df AS (SELECT e.vec_id, c.cid, sum((e.x - c.w) * (e.x - c.w)) AS d2
               FROM ev e JOIN cent8 c ON c.j = e.j
               GROUP BY e.vec_id, c.cid)
        SELECT vec_id, cid AS cluster, round(d2, 4) AS dist2 FROM (
          SELECT vec_id, cid, d2,
                 row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
          FROM df) WHERE rn = 1 ORDER BY vec_id"""


def _taxonomy_sql() -> str:
    """DuckDB replica of analytics.taxonomy_normalize: the vendored
    mapping tables as VALUES (generated from functions/taxonomy.py so
    they cannot drift), the yahoo/cna source-casing fixes, exact-then-
    lowercased alias lookup, the yahoo-filename override (the fixture
    only uses yahoo_finance -> business/finance), and the label/path
    assembly."""
    from news_information_retrieval_system_ray.functions.taxonomy import (
        CATEGORY_ALIASES, SOURCE_LABELS, TOPIC_LABELS)
    from news_information_retrieval_system_ray.pipelines.analytics import (
        TAX_CATS, TAX_SRCS)

    cats = ", ".join(f"({i}, '{c}')" for i, c in enumerate(TAX_CATS))
    srcs = ", ".join(f"({i}, '{s}')" for i, s in enumerate(TAX_SRCS))
    slab = ", ".join(f"('{k}', '{v}')" for k, v in SOURCE_LABELS.items())
    tlab = ", ".join(f"('{k}', '{v}')" for k, v in TOPIC_LABELS.items())
    amap = ", ".join(f"('{k}', '{t}', '{l}')"
                     for k, (t, l) in CATEGORY_ALIASES.items() if k)
    return f"""
        WITH cats(i, cat) AS (VALUES {cats}),
        srcs(j, src) AS (VALUES {srcs}),
        slab(code, label) AS (VALUES {slab}),
        tlab(topic, label) AS (VALUES {tlab}),
        amap(k, topic, leaf) AS (VALUES {amap}),
        base AS (SELECT d.doc_id, c.cat, s.src,
                        CASE WHEN d.doc_id % 10 = 0 THEN 1 ELSE 0 END AS is_yahoo
                 FROM documents d
                 JOIN cats c ON c.i = d.doc_id % 12
                 JOIN srcs s ON s.j = d.doc_id % 9),
        srcn AS (SELECT doc_id, cat, is_yahoo,
                        CASE WHEN lower(src) = 'yahoo' THEN 'Yahoo'
                             WHEN lower(src) = 'cna' THEN 'cna'
                             ELSE src END AS source
                 FROM base),
        cls AS (SELECT n.doc_id, n.source,
                       coalesce(sl.label, n.source) AS source_label,
                       CASE WHEN n.is_yahoo = 1 THEN 'business'
                            ELSE coalesce(a1.topic, a2.topic, 'other') END AS topic,
                       CASE WHEN n.is_yahoo = 1 THEN 'finance'
                            ELSE coalesce(a1.leaf, a2.leaf, 'unknown') END AS leaf
                FROM srcn n
                LEFT JOIN slab sl ON sl.code = n.source
                LEFT JOIN amap a1 ON a1.k = n.cat
                LEFT JOIN amap a2 ON a2.k = lower(n.cat))
        SELECT c.doc_id, c.source, c.source_label,
               c.topic AS taxonomy_topic,
               coalesce(t.label, '其他 Other') AS taxonomy_label,
               'news/' || c.topic || '/' || c.leaf AS taxonomy_path
        FROM cls c LEFT JOIN tlab t ON t.topic = c.topic
        ORDER BY c.doc_id"""


def _corpus_build_cte() -> str:
    """Shared CTE prefix replicating pipelines/corpus_build: the fixture
    derivation arithmetic (derive_raw_batch), the normalize_record
    fallback chains COALESCED to their effective values (the slot
    rotation only exercises the Python chain; the result is the same
    field), blocked/validation flags, the dedup hash
    (data_contract.py:80-89), and the taxonomy joins (vendored tables
    generated from functions/taxonomy so they cannot drift)."""
    from news_information_retrieval_system_ray.functions.taxonomy import (
        CATEGORY_ALIASES, SOURCE_LABELS)
    from news_information_retrieval_system_ray.pipelines.analytics import (
        TAX_CATS, TAX_SRCS)

    cats = ", ".join(f"({i}, '{c}')" for i, c in enumerate(TAX_CATS))
    srcs = ", ".join(f"({i}, '{s}')" for i, s in enumerate(TAX_SRCS))
    slab = ", ".join(f"('{k}', '{v}')" for k, v in SOURCE_LABELS.items())
    amap = ", ".join(f"('{k}', '{t}', '{l}')"
                     for k, (t, l) in CATEGORY_ALIASES.items() if k)
    return f"""
        WITH cats(i, cat) AS (VALUES {cats}),
        srcs(j, src) AS (VALUES {srcs}),
        slab(code, label) AS (VALUES {slab}),
        amap(a, topic, leaf) AS (VALUES {amap}),
        raw AS (
          SELECT d.doc_id AS k, d.doc_id AS seq,
                 CASE WHEN d.doc_id % 7 = 3 THEN d.doc_id - 1
                      ELSE d.doc_id END AS dup_key,
                 d.text AS dtext, c.cat AS cat, s.src AS src
          FROM documents d
          JOIN cats c ON c.i = d.doc_id % 12
          JOIN srcs s ON s.j = d.doc_id % 9),
        fld AS (
          SELECT *,
            trim(coalesce(CASE WHEN k % 29 = 0 THEN 'Sorry, You Have Been Blocked'
                               WHEN k % 17 = 0 THEN NULL
                               WHEN k % 23 = 0 THEN 'x'
                               ELSE 'doc ' || CAST(dup_key AS VARCHAR) END, '')) AS title,
            trim(coalesce(CASE WHEN k % 13 = 0 THEN NULL
                               WHEN k % 19 = 0 THEN substr(dtext, 1, 10)
                               ELSE dtext END, '')) AS content,
            CASE WHEN k % 11 = 0 THEN
                   CASE WHEN k % 10 = 0 THEN 'yahoo'
                        WHEN src = 'dcard' THEN 'dcard'
                        ELSE 'corpus' END
                 ELSE src END AS rsrc,
            CASE WHEN k % 10 = 0 THEN 'data/raw/yahoo_finance_2024.jsonl'
                 ELSE 'data/processed/corpus_' || src || '.jsonl' END AS origin_path,
            CASE WHEN k % 31 = 0 THEN NULL
                 ELSE 'https://news.example.com/' || CAST(dup_key AS VARCHAR) END AS url,
            CASE WHEN k % 8 = 5 THEN 'talk' ELSE cat END AS category,
            CASE WHEN k % 8 = 5 THEN '熱門看板' ELSE '' END AS category_name,
            CASE WHEN k % 8 = 5 THEN '熱門看板' ELSE NULL END AS forum_name,
            CASE WHEN k % 4 = 0 THEN 'AI|台積電'
                 WHEN k % 4 = 2 THEN 'topic' || CAST(k AS VARCHAR)
                 ELSE '' END AS tags,
            '2024-01-' || lpad(CAST(k % 28 + 1 AS VARCHAR), 2, '0') AS published_date,
            CASE WHEN k % 5 = 0 THEN 'au' || CAST(k AS VARCHAR)
                 WHEN k % 5 = 1 THEN 'sch' || CAST(k AS VARCHAR)
                 ELSE '' END AS author
          FROM raw),
        st AS (
          SELECT *,
            CASE WHEN k % 21 = 1 THEN 'H' || CAST(dup_key AS VARCHAR)
                 ELSE md5(lower(title) || '||' || lower(coalesce(url, ''))) END AS dedup_hash,
            (CASE WHEN title = '' THEN 1 ELSE 0 END)
              + (CASE WHEN content = '' THEN 1 ELSE 0 END) AS n_missing,
            CASE WHEN title <> '' AND length(title) < 2 THEN 1 ELSE 0 END AS tshort,
            CASE WHEN content <> '' AND length(content) < 20 THEN 1 ELSE 0 END AS cshort,
            CASE WHEN lower(title) = 'sorry, you have been blocked' THEN 'blocked'
                 WHEN (CASE WHEN title = '' THEN 1 ELSE 0 END)
                      + (CASE WHEN content = '' THEN 1 ELSE 0 END)
                      + (CASE WHEN title <> '' AND length(title) < 2 THEN 1 ELSE 0 END)
                      + (CASE WHEN content <> '' AND length(content) < 20 THEN 1 ELSE 0 END) > 0
                 THEN 'invalid' ELSE 'valid' END AS status
          FROM fld)"""


def _corpus_build_sql() -> str:
    """Survivor rows: taxonomy-normalized candidates, first-wins dedup
    (row_number over dedup_hash among valid), per-source cap, global cap
    — all in seq (arrival) order."""
    from news_information_retrieval_system_ray.functions.taxonomy import TOPIC_LABELS
    from news_information_retrieval_system_ray.pipelines.corpus_build import (
        CAP_PER_SOURCE, CAP_TOTAL)

    tlab = ", ".join(f"('{k}', '{v}')" for k, v in TOPIC_LABELS.items())
    return _corpus_build_cte() + f""",
        tlab(topic, label) AS (VALUES {tlab}),
        cand AS (
          SELECT s.*,
            CASE WHEN lower(rsrc) = 'yahoo' THEN 'Yahoo'
                 WHEN lower(rsrc) = 'cna' THEN 'cna' ELSE rsrc END AS code
          FROM st s WHERE status = 'valid'),
        tax AS (
          SELECT c.*,
            coalesce(c.forum_name, sl.label, c.code) AS source_name,
            coalesce(sl.label, c.forum_name, c.code) AS source_label,
            CASE WHEN k % 10 = 0 THEN 'business'
                 ELSE coalesce(a1.topic, a2.topic, a3.topic, a4.topic, 'other') END AS topic,
            CASE WHEN k % 10 = 0 THEN 'finance'
                 ELSE coalesce(a1.leaf, a2.leaf, a3.leaf, a4.leaf, 'unknown') END AS leaf
          FROM cand c
          LEFT JOIN slab sl ON sl.code = c.code
          LEFT JOIN amap a1 ON a1.a = c.category
          LEFT JOIN amap a2 ON a2.a = lower(c.category)
          LEFT JOIN amap a3 ON a3.a = c.category_name
          LEFT JOIN amap a4 ON a4.a = lower(c.category_name)),
        rk AS (SELECT *, row_number() OVER (PARTITION BY dedup_hash ORDER BY seq) AS rhash
               FROM tax),
        kp AS (SELECT *, row_number() OVER (PARTITION BY rsrc ORDER BY seq) AS rsn
               FROM rk WHERE rhash = 1),
        cp AS (SELECT *, row_number() OVER (ORDER BY seq) AS rglob
               FROM kp WHERE rsn <= {CAP_PER_SOURCE})
        SELECT seq,
               CASE WHEN k % 6 IN (0, 1) THEN 'A' || CAST(k AS VARCHAR)
                    WHEN k % 6 IN (2, 3) THEN 'P' || CAST(k AS VARCHAR)
                    ELSE dedup_hash END AS article_id,
               url, code AS source, source_name, source_label, title, content,
               author, published_date, category, category_name, tags,
               CASE WHEN lower(rsrc) = 'dcard' THEN 'forum_post'
                    ELSE 'news_article' END AS content_type,
               cp.topic AS taxonomy_topic,
               coalesce(tl.label, '其他 Other') AS taxonomy_label,
               'news/' || cp.topic || '/' || leaf AS taxonomy_path,
               origin_path, dedup_hash
        FROM cp LEFT JOIN tlab tl ON tl.topic = cp.topic
        WHERE rglob <= {CAP_TOTAL} ORDER BY seq"""


def _corpus_stats_sql() -> str:
    """Per-source scanned/written(uncapped keepers)/invalid/duplicates."""
    return _corpus_build_cte() + """,
        rk AS (SELECT seq, row_number() OVER (PARTITION BY dedup_hash ORDER BY seq) AS rhash
               FROM st WHERE status = 'valid')
        SELECT s.rsrc AS source,
               CAST(count(*) AS BIGINT) AS scanned,
               CAST(coalesce(sum(CASE WHEN r.rhash = 1 THEN 1 END), 0) AS BIGINT) AS written,
               CAST(sum(CASE WHEN s.status <> 'valid' THEN 1 ELSE 0 END) AS BIGINT) AS invalid,
               CAST(coalesce(sum(CASE WHEN r.rhash > 1 THEN 1 END), 0) AS BIGINT) AS duplicates
        FROM st s LEFT JOIN rk r ON r.seq = s.seq
        GROUP BY s.rsrc ORDER BY s.rsrc"""


def _corpus_reasons_sql() -> str:
    """Global invalid_reasons tally: BLOCKED_PAGE for blocked rows; all
    issue codes of each invalid record (corpus_builder.py:218-222)."""
    return _corpus_build_cte() + """
        SELECT code, CAST(n AS BIGINT) AS n FROM (
          SELECT 'BLOCKED_PAGE' AS code, count(*) AS n FROM st WHERE status = 'blocked'
          UNION ALL SELECT 'MISSING_FIELD', sum(n_missing) FROM st WHERE status = 'invalid'
          UNION ALL SELECT 'TITLE_TOO_SHORT', sum(tshort) FROM st WHERE status = 'invalid'
          UNION ALL SELECT 'CONTENT_TOO_SHORT', sum(cshort) FROM st WHERE status = 'invalid'
        ) WHERE n > 0 ORDER BY code"""


_FEEDBACK_CTE = """
        WITH ev AS (SELECT ts, user_id, value,
                           CASE event_type WHEN 'view' THEN 'search'
                                WHEN 'click' THEN 'click'
                                ELSE 'relevance' END AS kind,
                           CAST(regexp_extract(props, '[0-9]+') AS BIGINT) AS k
                    FROM events
                    WHERE event_type IN ('view', 'click', 'purchase')),
        log AS MATERIALIZED (SELECT kind,
                       'q' || CAST(k % 7 AS VARCHAR) AS query,
                       CASE user_id % 3 WHEN 0 THEN 'bm25'
                            WHEN 1 THEN 'tfidf' ELSE 'hybrid' END AS model,
                       user_id AS session_id,
                       value AS latency,
                       k % 5 AS result_count,
                       k % 15 + 1 AS rank,
                       k % 50 AS doc_id,
                       CAST(floor(value) AS BIGINT) % 4 AS grade,
                       ts
                FROM ev)"""


def _ctfidf_frag(src: str, out: str) -> str:
    """c-TF-IDF CTE over a (topic, term, ctf) relation ``src`` into
    ``{out}``: W = (ctf/|c|) * ln(1 + floor(mean |c|) / f_t) — the
    bertopic ClassTfidfTransformer formula (pipelines/bertopic.py)."""
    return f"""
        {out} AS MATERIALIZED (SELECT c.topic, c.term,
                         (c.ctf * 1.0 / ct.tot) * ln(1 + ac.a / ft.f) AS w
                  FROM {src} c
                  JOIN (SELECT topic, sum(ctf) AS tot
                        FROM {src} GROUP BY topic) ct USING (topic)
                  JOIN (SELECT term, sum(ctf) AS f
                        FROM {src} GROUP BY term) ft USING (term)
                  CROSS JOIN (SELECT floor(avg(tot)) AS a FROM
                              (SELECT sum(ctf) AS tot
                               FROM {src} GROUP BY topic)) ac)"""


def _bertopic_cte() -> str:
    """kmeans(6, 8 iters, seed 17) unroll + nearest-centroid topic
    assignment (``topicof``) + the standard tokenization contract +
    class-term counts (``bctf``) + ranked c-TF-IDF words (``branked``)
    — replicates pipelines/bertopic.fit_bertopic end-to-end."""
    return _kmeans_cte(6) + f""",
        bdf AS (SELECT e.vec_id, c.cid, sum((e.x - c.w) * (e.x - c.w)) AS d2
                FROM ev e JOIN cent8 c ON c.j = e.j
                GROUP BY e.vec_id, c.cid),
        topicof AS MATERIALIZED (SELECT vec_id AS doc_id, cid AS topic, d2 FROM (
                      SELECT vec_id, cid, d2,
                             row_number() OVER (PARTITION BY vec_id
                                                ORDER BY d2, cid) AS rn
                      FROM bdf) WHERE rn = 1),
        bnorm AS (SELECT doc_id,
                         trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
                  FROM documents),
        btoks AS (SELECT doc_id, unnest(string_split(t, ' ')) AS term
                  FROM bnorm),
        bft AS MATERIALIZED (SELECT doc_id, term FROM btoks
                WHERE regexp_matches(term, '[a-z0-9_]')),
        bctf AS MATERIALIZED (SELECT tp.topic, f.term, count(*) AS ctf
                 FROM bft f JOIN topicof tp USING (doc_id)
                 GROUP BY tp.topic, f.term),{_ctfidf_frag("bctf", "bsc")},
        branked AS MATERIALIZED (SELECT topic, term, w,
                           row_number() OVER (PARTITION BY topic
                                              ORDER BY w DESC, term) AS rank
                    FROM bsc)"""


def _cluster_centroid_cte() -> str:
    """On top of _bertopic_cte (topicof + bft): per-doc L2-normalized
    app-TF-IDF weights, per-cluster mean centroids, 9dp-rounded
    centroid-term ranking (analytics._cluster_centroids)."""
    return _bertopic_cte() + """,
        tf2 AS MATERIALIZED (SELECT doc_id, term, count(*) AS tf
                FROM bft GROUP BY doc_id, term),
        dfs2 AS (SELECT term, count(*) AS df FROM tf2 GROUP BY term),
        nn AS (SELECT count(*) AS n FROM documents),
        wun AS (SELECT t.doc_id, t.term,
                       (1 + log10(t.tf))
                       * ln(1 + (nn.n - d.df + 0.5) / (d.df + 0.5)) AS wu
                FROM tf2 t JOIN dfs2 d USING (term) CROSS JOIN nn),
        dnrm AS (SELECT doc_id, sqrt(sum(wu * wu)) AS nrm
                 FROM wun GROUP BY doc_id),
        wn AS MATERIALIZED (SELECT w.doc_id, w.term, w.wu / d.nrm AS w
               FROM wun w JOIN dnrm d USING (doc_id)),
        sizes2 AS MATERIALIZED (SELECT topic, count(*) AS size
                  FROM topicof GROUP BY topic),
        centw AS MATERIALIZED (SELECT tp.topic, w.term,
                                      sum(w.w) / s.size AS w
                 FROM wn w JOIN topicof tp USING (doc_id)
                 JOIN sizes2 s ON s.topic = tp.topic
                 GROUP BY tp.topic, w.term, s.size),
        crank AS MATERIALIZED (SELECT topic, term, w,
                       row_number() OVER (PARTITION BY topic
                                          ORDER BY round(w, 9) DESC, term)
                           AS rank
                FROM centw)"""


def _bertopic_reduce_sql(n_merges: int = 2) -> str:
    """DuckDB replica of bertopic_reduced_topics (k=6 -> 4): the
    smallest-into-most-similar merge loop unrolled — per step, argmin
    size (tie: lowest topic), c-TF-IDF cosine vs every other topic
    (rounded 9dp on both sides), argmax cosine (tie: lowest topic),
    counts + sizes merged; final words re-scored over the merged
    counts."""
    parts = [_bertopic_cte(), """,
        rctf0 AS MATERIALIZED (SELECT topic, term, ctf FROM bctf),
        rsz0 AS MATERIALIZED (SELECT topic, count(*) AS size
                 FROM topicof GROUP BY topic)"""]
    for i in range(n_merges):
        j = i + 1
        parts.append(f""",{_ctfidf_frag(f"rctf{i}", f"rsc{i}")},
        rsmall{i} AS MATERIALIZED (SELECT topic FROM rsz{i} ORDER BY size, topic LIMIT 1),
        rnorm{i} AS MATERIALIZED (SELECT topic, sqrt(sum(w * w)) AS nrm
                     FROM rsc{i} GROUP BY topic),
        rcos{i} AS MATERIALIZED (SELECT b.topic AS other,
                           round(sum(a.w * b.w)
                                 / ((SELECT nrm FROM rnorm{i}
                                     WHERE topic = (SELECT topic FROM rsmall{i}))
                                    * bn.nrm), 9) AS cos
                    FROM rsc{i} a
                    JOIN rsc{i} b USING (term)
                    JOIN rnorm{i} bn ON bn.topic = b.topic
                    WHERE a.topic = (SELECT topic FROM rsmall{i})
                      AND b.topic <> a.topic
                    GROUP BY b.topic, bn.nrm),
        rbest{i} AS MATERIALIZED (SELECT other AS tgt FROM rcos{i}
                     ORDER BY cos DESC, other LIMIT 1),
        rctf{j} AS MATERIALIZED (SELECT CASE WHEN topic = (SELECT topic FROM rsmall{i})
                                THEN (SELECT tgt FROM rbest{i})
                                ELSE topic END AS topic,
                           term, CAST(sum(ctf) AS BIGINT) AS ctf
                    FROM rctf{i} GROUP BY 1, term),
        rsz{j} AS MATERIALIZED (SELECT CASE WHEN topic = (SELECT topic FROM rsmall{i})
                               THEN (SELECT tgt FROM rbest{i})
                               ELSE topic END AS topic,
                          CAST(sum(size) AS BIGINT) AS size
                   FROM rsz{i} GROUP BY 1)""")
    parts.append(f""",{_ctfidf_frag(f"rctf{n_merges}", "rscF")},
        rrank AS (SELECT topic, term, w,
                         row_number() OVER (PARTITION BY topic
                                            ORDER BY w DESC, term) AS rank
                  FROM rscF)
        SELECT r.topic, s.size, r.rank, r.term AS word, round(r.w, 4) AS score
        FROM rrank r JOIN rsz{n_merges} s USING (topic)
        WHERE r.rank <= 10 ORDER BY r.topic, r.rank""")
    return "".join(parts)


def _ann_ivf_sql() -> str:
    """DuckDB replica of analytics.ann_ivf (stages/ann.ivf_build +
    ivf_topk: n_lists=16, n_iter=8, seed=17, nprobe=4, k=10): the same
    unrolled-kmeans quantizer, every row assigned to its nearest final
    centroid (inverted list), the 5 queries probing the UNION of their
    4 nearest lists, exact cosine top-10 over the candidate union."""
    return _kmeans_cte(16) + """,
        df AS (SELECT e.vec_id, c.cid, sum((e.x - c.w) * (e.x - c.w)) AS d2
               FROM ev e JOIN cent8 c ON c.j = e.j
               GROUP BY e.vec_id, c.cid),
        assignf AS (SELECT vec_id, cid AS ivf_list FROM (
                      SELECT vec_id, cid,
                             row_number() OVER (PARTITION BY vec_id
                                                ORDER BY d2, cid) AS rn
                      FROM df) WHERE rn = 1),
        probe AS (SELECT DISTINCT cid FROM (
                    SELECT vec_id, cid,
                           row_number() OVER (PARTITION BY vec_id
                                              ORDER BY d2, cid) AS rn
                    FROM df WHERE vec_id < 5) WHERE rn <= 4),
        cand AS (SELECT a.vec_id FROM assignf a
                 JOIN probe p ON p.cid = a.ivf_list),
        sims AS (SELECT q.vec_id AS qid, e.vec_id,
                        list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                               CAST(e.embedding AS DOUBLE[])) AS score
                 FROM embeddings q
                 CROSS JOIN (SELECT em.* FROM embeddings em JOIN cand USING (vec_id)) e
                 WHERE q.vec_id < 5),
        ranked AS (SELECT qid, vec_id, score,
                          row_number() OVER (PARTITION BY qid
                                             ORDER BY score DESC, vec_id) AS rank
                   FROM sims)
        SELECT qid, rank, vec_id, round(score, 4) AS score
        FROM ranked WHERE rank <= 10"""


def _dedup_embedding_lsh_sql() -> str:
    """DuckDB replica of analytics.dedup_embedding_lsh
    (stages/dedup.EmbeddingLshStage + embedding_dup_pairs_lsh: 32 bands
    x 4 bits, seed=7, threshold=0.45): the seeded 128x64 hyperplane
    matrix embedded as literals; band_key = (band << 4) | sign-bits;
    candidate pairs share any band key; exact cosine verify."""
    import numpy as np

    planes = np.random.default_rng(7).standard_normal((128, 64))
    plane_rows = ", ".join(
        f"({i},{j},{float(planes[i, j])!r})"
        for i in range(128) for j in range(64))
    return f"""
        WITH planes(i, j, w) AS (VALUES {plane_rows}),
        ev AS (SELECT vec_id, unnest(CAST(embedding AS DOUBLE[])) AS x,
                      unnest(range(0, 64)) AS j
               FROM embeddings),
        dots AS (SELECT e.vec_id, pl.i, sum(e.x * pl.w) AS d
                 FROM ev e JOIN planes pl ON pl.j = e.j
                 GROUP BY e.vec_id, pl.i),
        keys AS (SELECT vec_id,
                        (band << 4) + sum(CASE WHEN d >= 0
                                               THEN 1 << bit ELSE 0 END) AS band_key
                 FROM (SELECT vec_id, i // 4 AS band, i % 4 AS bit, d FROM dots)
                 GROUP BY vec_id, band),
        cand AS (SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
                 FROM keys a JOIN keys b
                      ON a.band_key = b.band_key AND a.vec_id < b.vec_id),
        sims AS (SELECT c.id_a, c.id_b,
                        list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),
                                               CAST(eb.embedding AS DOUBLE[])) AS cos
                 FROM cand c JOIN embeddings ea ON ea.vec_id = c.id_a
                             JOIN embeddings eb ON eb.vec_id = c.id_b)
        SELECT id_a, id_b, round(cos, 4) AS cos FROM sims
        WHERE cos >= 0.45 ORDER BY id_a, id_b"""


def oracle_sql() -> dict[str, str]:
    qv = _qterms_values()
    qv_pos = ", ".join(f"('{qid}', '{t}', {i})"
                       for qid, terms in A.FIXED_QUERIES.items()
                       for i, t in enumerate(terms, 1))
    from news_information_retrieval_system_ray.stages import sketches as _SK
    cms_terms_vals = ", ".join(
        f"({t!r})" for t in sorted({x for ts in A.FIXED_QUERIES.values() for x in ts}))
    bm25_rank_cte = f""",
            qterms(qid, term) AS (VALUES {qv}),
            dfs AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
            contrib AS (
              SELECT q.qid, tf.doc_id,
                     ln((stats.n - dfs.df + 0.5) / (dfs.df + 0.5) + 1.0)
                     * (tf.tf * 2.5) / (tf.tf + 1.5 * (1 - 0.75 + 0.75 * dln.dl / stats.avgdl)) AS c
              FROM tf
              JOIN qterms q USING (term)
              JOIN dfs USING (term)
              JOIN dln ON tf.doc_id = dln.doc_id
              CROSS JOIN stats),
            scores AS (SELECT qid, doc_id, sum(c) AS score FROM contrib GROUP BY qid, doc_id),
            ranked AS (SELECT qid, doc_id, score,
                              row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id) AS rank
                       FROM scores)"""
    bm25_sql = _CTE + bm25_rank_cte + """
            SELECT qid, rank, doc_id, round(score, 4) AS score FROM ranked WHERE rank <= 10"""
    # tombstone-delete variant: scores filtered to LIVE docs while
    # n/avgdl/df keep FULL-corpus values (delete_docs frozen-stats
    # semantics: surviving docs score identically to the undeleted index)
    # compaction variant: the ENTIRE bm25 computation over the live
    # subset (live n/avgdl/df — stats recomputed, the opposite contract
    # of the frozen-stats tombstone phase)
    live_cte = _CTE.replace("FROM documents", "FROM docs_live").replace(
        "WITH norm AS (",
        "WITH docs_live AS (SELECT * FROM documents WHERE doc_id % 7 <> 3),\nnorm AS (")
    bm25_compacted_sql = live_cte + bm25_rank_cte + """
            SELECT qid, rank, doc_id, round(score, 4) AS score FROM ranked WHERE rank <= 10"""
    bm25_deleted_sql = _CTE + bm25_rank_cte.replace(
        "ranked AS (SELECT qid, doc_id, score,",
        "live AS (SELECT * FROM scores WHERE doc_id % 7 <> 3),\n"
        "            ranked AS (SELECT qid, doc_id, score,",
    ).replace("FROM scores)", "FROM live)") + """
            SELECT qid, rank, doc_id, round(score, 4) AS score FROM ranked WHERE rank <= 10"""
    # shared sentence segmentation for the summarizer oracles
    # (functions/summarize.segment_sentences: split on [.!?。！？]+, strip,
    # keep 5..100-token sentences, positions count all non-empty raws;
    # corpus is pure ASCII so the CJK-explode branch is identity)
    summ_cte = """
            WITH parts AS (
              SELECT doc_id,
                     list_filter(list_transform(
                         regexp_split_to_array(trim(text, ' ' || chr(9) || chr(10) || chr(13)),
                                               '[.!?。！？]+'),
                         s -> trim(s, ' ' || chr(9) || chr(10) || chr(13))),
                                 s -> s <> '') AS ps
              FROM documents),
            raws AS (SELECT doc_id, unnest(ps) AS raw, unnest(range(0, len(ps))) AS pos
                     FROM parts),
            stoks AS (SELECT doc_id, raw, pos,
                             list_filter(string_split_regex(
                                 regexp_replace(lower(raw), '[^\\w\\s一-鿿]', ' ', 'g'),
                                 '\\s+'), t -> t <> '') AS tk
                      FROM raws),
            kept AS (SELECT doc_id, raw, pos, tk, len(tk) AS ntok
                     FROM stoks WHERE len(tk) BETWEEN 5 AND 100)"""
    summ_tail = """
            sel AS (SELECT doc_id, raw, pos,
                           row_number() OVER (PARTITION BY doc_id ORDER BY sc DESC, pos) AS rn
                    FROM scored),
            summ AS (SELECT doc_id, string_agg(raw, ' ' ORDER BY pos) AS summary
                     FROM sel WHERE rn <= 2 GROUP BY doc_id)
            SELECT d.doc_id, coalesce(s.summary, '') AS summary,
                   length(coalesce(s.summary, ''))::BIGINT AS summary_len
            FROM documents d LEFT JOIN summ s USING (doc_id) ORDER BY d.doc_id"""
    # multi-doc summary (functions/summarize.multi_doc_summary, k=3 over
    # per-source groups): sentence segmentation as in summ_cte but with
    # source carried; GLOBAL (per-source) tf-idf over sentences; greedy
    # diversity selection UNROLLED as 3 chained argmax steps — valid
    # because a candidate rejected against an earlier pick stays
    # rejected (the selected set only grows), so "min ord passing the
    # Jaccard test against every pick so far" IS the greedy scan.
    multidoc_sql = """
            WITH parts AS (
              SELECT doc_id, source,
                     list_filter(list_transform(
                         regexp_split_to_array(trim(text, ' ' || chr(9) || chr(10) || chr(13)),
                                               '[.!?。！？]+'),
                         s -> trim(s, ' ' || chr(9) || chr(10) || chr(13))),
                                 s -> s <> '') AS ps
              FROM documents),
            raws AS (SELECT doc_id, source, unnest(ps) AS raw,
                            unnest(range(0, len(ps))) AS pos
                     FROM parts),
            stoks AS (SELECT doc_id, source, raw, pos,
                             list_filter(string_split_regex(
                                 regexp_replace(lower(raw), '[^\\w\\s一-鿿]', ' ', 'g'),
                                 '\\s+'), t -> t <> '') AS tk
                      FROM raws),
            kept AS (SELECT doc_id, source, raw, pos, tk, len(tk) AS ntok,
                            list_distinct(tk) AS dk
                     FROM stoks WHERE len(tk) BETWEEN 5 AND 100),
            nst AS (SELECT source, count(*) AS n FROM kept GROUP BY source),
            tokrows AS (SELECT source, doc_id, pos, unnest(tk) AS t FROM kept),
            gtf AS (SELECT source, t, count(*) AS tf FROM tokrows GROUP BY source, t),
            gdf AS (SELECT source, t, count(*) AS df
                    FROM (SELECT DISTINCT source, doc_id, pos, t FROM tokrows)
                    GROUP BY source, t),
            w AS (SELECT g.source, g.t, g.tf * ln(nst.n * 1.0 / d.df) AS wgt
                  FROM gtf g JOIN gdf d USING (source, t) JOIN nst USING (source)),
            ssc AS (SELECT k.source, k.doc_id, k.pos,
                           sum(w.wgt) / any_value(k.ntok) AS sc
                    FROM kept k JOIN tokrows tr
                         ON tr.source = k.source AND tr.doc_id = k.doc_id
                            AND tr.pos = k.pos
                    JOIN w ON w.source = k.source AND w.t = tr.t
                    GROUP BY k.source, k.doc_id, k.pos),
            scored AS (SELECT k.source, k.doc_id, k.pos, k.raw, k.dk,
                              coalesce(s.sc, 0.0) AS sc,
                              row_number() OVER (PARTITION BY k.source
                                                 ORDER BY coalesce(s.sc, 0.0) DESC,
                                                          k.doc_id, k.pos) AS ord
                       FROM kept k LEFT JOIN ssc s
                            ON s.source = k.source AND s.doc_id = k.doc_id
                               AND s.pos = k.pos),
            s1 AS (SELECT * FROM scored WHERE ord = 1),
            s2 AS (SELECT * FROM (
                     SELECT c.*, row_number() OVER (PARTITION BY c.source
                                                    ORDER BY c.ord) AS r
                     FROM scored c JOIN s1 ON s1.source = c.source
                     WHERE c.ord > s1.ord
                       AND len(list_intersect(c.dk, s1.dk)) * 2.0 <=
                           len(c.dk) + len(s1.dk) - len(list_intersect(c.dk, s1.dk)))
                   WHERE r = 1),
            s3 AS (SELECT * FROM (
                     SELECT c.*, row_number() OVER (PARTITION BY c.source
                                                    ORDER BY c.ord) AS r
                     FROM scored c
                     JOIN s1 ON s1.source = c.source
                     JOIN s2 ON s2.source = c.source
                     WHERE c.ord <> s1.ord AND c.ord <> s2.ord
                       AND len(list_intersect(c.dk, s1.dk)) * 2.0 <=
                           len(c.dk) + len(s1.dk) - len(list_intersect(c.dk, s1.dk))
                       AND len(list_intersect(c.dk, s2.dk)) * 2.0 <=
                           len(c.dk) + len(s2.dk) - len(list_intersect(c.dk, s2.dk)))
                   WHERE r = 1),
            picks AS (SELECT source, doc_id, pos, raw FROM s1
                      UNION ALL SELECT source, doc_id, pos, raw FROM s2
                      UNION ALL SELECT source, doc_id, pos, raw FROM s3)
            SELECT source,
                   row_number() OVER (PARTITION BY source
                                      ORDER BY doc_id, pos) AS rank,
                   doc_id, raw AS sentence
            FROM picks ORDER BY source, rank"""
    # RAKE: stopword-delimited phrases capped at 4 words (a longer run
    # splits 4+4+...), deg/freq word scores, phrase score = member sum
    from news_information_retrieval_system_ray.functions.stopwords import EN_STOPWORDS

    stop_list = ", ".join(f"'{w}'" for w in sorted(EN_STOPWORDS))
    rake_sql = _CTE + f""",
            tkl AS (SELECT doc_id,
                           list_filter(string_split(t, ' '),
                                       s -> s <> '' AND regexp_matches(s, '[a-z0-9_]')) AS tk
                    FROM norm),
            seq AS (SELECT doc_id, unnest(tk) AS term, unnest(range(0, len(tk))) AS idx
                    FROM tkl),
            flags AS (SELECT doc_id, term, idx,
                             CASE WHEN term IN ({stop_list}) THEN 1 ELSE 0 END AS st
                      FROM seq),
            runs AS (SELECT doc_id, term, idx, st,
                            sum(st) OVER (PARTITION BY doc_id ORDER BY idx
                                          ROWS UNBOUNDED PRECEDING) AS run_id
                     FROM flags),
            members AS (SELECT doc_id, term, idx, run_id,
                               (row_number() OVER (PARTITION BY doc_id, run_id ORDER BY idx) - 1) // 4 AS sub
                        FROM runs WHERE st = 0),
            phr AS (SELECT doc_id, run_id, sub,
                           string_agg(term, ' ' ORDER BY idx) AS phrase,
                           count(*) AS plen
                    FROM members GROUP BY doc_id, run_id, sub),
            pm AS (SELECT m.doc_id, m.term, m.run_id, m.sub, p.plen, p.phrase
                   FROM members m JOIN phr p
                        ON p.doc_id = m.doc_id AND p.run_id = m.run_id AND p.sub = m.sub),
            ws AS (SELECT doc_id, term, sum(plen)::DOUBLE / count(*) AS wscore
                   FROM pm GROUP BY doc_id, term),
            pscore AS (SELECT pm.doc_id, pm.run_id, pm.sub, any_value(pm.phrase) AS phrase,
                              sum(ws.wscore) AS score
                       FROM pm JOIN ws ON ws.doc_id = pm.doc_id AND ws.term = pm.term
                       GROUP BY pm.doc_id, pm.run_id, pm.sub),
            uniq AS (SELECT doc_id, phrase, any_value(score) AS score
                     FROM pscore GROUP BY doc_id, phrase),
            rranked AS (SELECT doc_id, phrase, score,
                               -- rank on the ROUNDED score: the raw sum's float
                               -- value depends on member-word addition order, so
                               -- equal phrase scores can differ by one ulp between
                               -- engines and flip the tie (kernel matches)
                               row_number() OVER (PARTITION BY doc_id
                                                  ORDER BY round(score, 4) DESC, phrase) AS rank
                        FROM uniq)
            SELECT doc_id, rank, phrase, round(score, 4) AS score
            FROM rranked WHERE rank <= 5 ORDER BY doc_id, rank"""
    # KeyBERT on the hashing encoder (functions/keybert.py): candidates =
    # distinct 1..3-grams of the stopword-filtered token sequence, doc +
    # phrase embeddings = signed md5 bucket-count sums (dim 32, exactly the
    # dense_retrieval encoder), sims = round4 cosine, then the greedy MMR
    # loop (lambda = 1 - diversity = 0.5) UNROLLED as 4 chained argmax
    # steps; every argmax tie-breaks on phrase asc.
    kb_base = """
            WITH norm AS (
              SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
              FROM documents),
            nfl AS (
              SELECT doc_id, list_filter(string_split(t, ' '),
                     x -> regexp_matches(x, '[a-z0-9_]')) AS tk
              FROM norm),
            seq AS (
              SELECT doc_id, unnest(tk) AS term, generate_subscripts(tk, 1) AS pos
              FROM nfl WHERE len(tk) > 0),
            dvec AS (
              SELECT doc_id, ('0x' || substr(md5(term), 1, 8))::BIGINT % 32 AS b,
                     sum(CASE WHEN ('0x' || substr(md5(term), 9, 1))::BIGINT % 2 = 0
                              THEN 1 ELSE -1 END)::DOUBLE AS v
              FROM seq GROUP BY 1, 2),
            dnorm AS (SELECT doc_id, sqrt(sum(v * v)) AS nd FROM dvec
                      GROUP BY 1 HAVING sum(v * v) > 0),
            fseq AS (
              SELECT doc_id, term,
                     row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS fp
              FROM seq WHERE term NOT IN ({stop_list})),
            grams AS (
              SELECT doc_id, term AS ph FROM fseq
              UNION SELECT a.doc_id, a.term || ' ' || b.term
                    FROM fseq a JOIN fseq b
                    ON b.doc_id = a.doc_id AND b.fp = a.fp + 1
              UNION SELECT a.doc_id, a.term || ' ' || b.term || ' ' || c.term
                    FROM fseq a JOIN fseq b
                    ON b.doc_id = a.doc_id AND b.fp = a.fp + 1
                    JOIN fseq c ON c.doc_id = a.doc_id AND c.fp = a.fp + 2),
            ctok AS (SELECT doc_id, ph, unnest(string_split(ph, ' ')) AS term
                     FROM grams),
            cvec AS MATERIALIZED (
              SELECT doc_id, ph, ('0x' || substr(md5(term), 1, 8))::BIGINT % 32 AS b,
                     sum(CASE WHEN ('0x' || substr(md5(term), 9, 1))::BIGINT % 2 = 0
                              THEN 1 ELSE -1 END)::DOUBLE AS v
              FROM ctok GROUP BY 1, 2, 3),
            cnorm AS MATERIALIZED (
              SELECT doc_id, ph, sqrt(sum(v * v)) AS nc FROM cvec
              GROUP BY 1, 2 HAVING sum(v * v) > 0),
            sdoc AS MATERIALIZED (
              SELECT cn.doc_id, cn.ph,
                     round(coalesce(dt.dot, 0) / (cn.nc * dn.nd), 4) AS sim
              FROM cnorm cn JOIN dnorm dn USING (doc_id)
              LEFT JOIN (SELECT c.doc_id, c.ph, sum(c.v * d.v) AS dot
                         FROM cvec c JOIN dvec d
                         ON d.doc_id = c.doc_id AND d.b = c.b
                         GROUP BY 1, 2) dt
              ON dt.doc_id = cn.doc_id AND dt.ph = cn.ph),
            sel1 AS (
              SELECT doc_id, ph, 1 AS step FROM (
                SELECT doc_id, ph,
                       row_number() OVER (PARTITION BY doc_id
                                          ORDER BY sim DESC, ph ASC) AS rn
                FROM sdoc) WHERE rn = 1)"""
    kb_steps = []
    for s in range(1, 5):  # picks 2..5
        kb_steps.append(f""",
            dots{s} AS (
              SELECT a.doc_id, a.ph AS rp, b.ph AS sp, sum(a.v * b.v) AS dot
              FROM sel{s} s
              JOIN cvec b ON b.doc_id = s.doc_id AND b.ph = s.ph
              JOIN cvec a ON a.doc_id = b.doc_id AND a.b = b.b
              GROUP BY 1, 2, 3),
            msel{s} AS (
              SELECT r.doc_id, r.ph,
                     max(round(coalesce(d.dot, 0) / (r.nc * sn.nc), 4)) AS msel
              FROM cnorm r
              JOIN sel{s} s ON s.doc_id = r.doc_id
              JOIN cnorm sn ON sn.doc_id = s.doc_id AND sn.ph = s.ph
              LEFT JOIN dots{s} d ON d.doc_id = r.doc_id AND d.rp = r.ph
                                  AND d.sp = s.ph
              WHERE NOT EXISTS (SELECT 1 FROM sel{s} x
                                WHERE x.doc_id = r.doc_id AND x.ph = r.ph)
              GROUP BY 1, 2),
            pick{s + 1} AS (
              SELECT doc_id, ph, {s + 1} AS step FROM (
                SELECT m.doc_id, m.ph,
                       row_number() OVER (PARTITION BY m.doc_id
                           ORDER BY (0.5 * sd.sim - 0.5 * m.msel) DESC,
                                    m.ph ASC) AS rn
                FROM msel{s} m
                JOIN sdoc sd ON sd.doc_id = m.doc_id AND sd.ph = m.ph)
              WHERE rn = 1),
            sel{s + 1} AS (SELECT * FROM sel{s} UNION ALL SELECT * FROM pick{s + 1})""")
    keybert_sql = (kb_base.format(stop_list=stop_list) + "".join(kb_steps) + """
            SELECT s.doc_id, s.step AS rank, s.ph AS phrase, sd.sim AS score
            FROM sel5 s JOIN sdoc sd ON sd.doc_id = s.doc_id AND sd.ph = s.ph
            ORDER BY s.doc_id, s.step""")
    # Full-phrase YAKE with seqm dedup disabled (dedup_lim=2.0 on the Ray
    # side): sentence segmentation on [.!?\n。！？]+, case-preserving \w+
    # tokens, per-term W_Case / W_Pos(median sentence idx) / TF_Norm over
    # non-stopword candidates / window-1 relatedness / sentence dispersion,
    # then contiguous stopword-free 1..3-gram phrases scored
    # prod(S)/(tf*(1+sum(S))).  Every arithmetic step mirrors the Python
    # kernel's operation order (functions/yake.py:99-183) so float64
    # results agree bitwise before the final round(,4).  NOTE: DuckDB's
    # RE2 \w is ASCII while Python's is Unicode — equivalent on this
    # ASCII corpus (documented kernel caveat).
    _yake_ph_cte = f"""
            WITH chunks AS (
              SELECT doc_id,
                     unnest(regexp_split_to_array(text, '[.!?\\n。！？]+')) AS chunk,
                     generate_subscripts(regexp_split_to_array(text, '[.!?\\n。！？]+'), 1) AS cidx
              FROM documents),
            ctoks AS (
              SELECT doc_id, cidx, regexp_extract_all(chunk, '\\w+') AS toks
              FROM chunks),
            sents AS (
              SELECT doc_id, toks,
                     row_number() OVER (PARTITION BY doc_id ORDER BY cidx) - 1 AS snum
              FROM ctoks WHERE len(toks) > 0),
            sseq AS (
              SELECT doc_id, snum, unnest(toks) AS raw,
                     generate_subscripts(toks, 1) AS wi
              FROM sents),
            tok AS (
              SELECT doc_id, snum, wi, lower(raw) AS term,
                     (length(raw) > 1 AND raw = upper(raw)
                      AND raw <> lower(raw)) AS allcaps,
                     (substr(raw, 1, 1) = upper(substr(raw, 1, 1))
                      AND substr(raw, 1, 1) <> lower(substr(raw, 1, 1))) AS capfirst
              FROM sseq),
            nb AS (
              SELECT doc_id, snum, wi, term, allcaps, capfirst,
                     lag(term)  OVER w AS lt,
                     lead(term) OVER w AS rt
              FROM tok WINDOW w AS (PARTITION BY doc_id, snum ORDER BY wi)),
            nsent AS (SELECT doc_id, count(*) AS ns FROM sents GROUP BY doc_id),
            tstat AS (
              SELECT doc_id, term, count(*) AS tf,
                     sum(CASE WHEN allcaps THEN 1 ELSE 0 END) AS tf_caps,
                     sum(CASE WHEN (NOT allcaps) AND capfirst AND wi > 1
                              THEN 1 ELSE 0 END) AS tf_proper,
                     median(snum) AS med,
                     count(DISTINCT snum) AS nds,
                     count(lt) AS lc, count(DISTINCT lt) AS ld,
                     count(rt) AS rc, count(DISTINCT rt) AS rd
              FROM nb GROUP BY doc_id, term),
            xstat AS (SELECT doc_id, max(tf) AS xtf FROM tstat GROUP BY doc_id),
            cand AS (SELECT * FROM tstat WHERE term NOT IN ({stop_list})),
            dstat AS (SELECT doc_id, avg(tf) AS mtf,
                             coalesce(stddev_pop(tf), 0) AS stf
                      FROM cand GROUP BY doc_id),
            sfeat AS (
              SELECT c.doc_id, c.term,
                     greatest(c.tf_caps, c.tf_proper) / (1.0 + ln(c.tf)) AS wcase,
                     ln(ln(3.0 + c.med)) AS wpos,
                     1.0 + ((CASE WHEN c.lc > 0 THEN c.ld * 1.0 / c.lc ELSE 0 END)
                          + (CASE WHEN c.rc > 0 THEN c.rd * 1.0 / c.rc ELSE 0 END))
                           * c.tf / x.xtf AS rel,
                     c.tf / (d.mtf + d.stf) AS tfnorm,
                     c.nds * 1.0 / n.ns AS wdif
              FROM cand c JOIN xstat x USING (doc_id)
                   JOIN dstat d USING (doc_id) JOIN nsent n USING (doc_id)),
            sc AS (
              SELECT doc_id, term,
                     (rel * wpos) / (wcase + tfnorm / rel + wdif / rel) AS s
              FROM sfeat),
            grams AS (
              SELECT doc_id, term AS w1, CAST(NULL AS VARCHAR) AS w2,
                     CAST(NULL AS VARCHAR) AS w3
              FROM tok
              UNION ALL
              SELECT a.doc_id, a.term, b.term, CAST(NULL AS VARCHAR)
              FROM tok a JOIN tok b ON b.doc_id = a.doc_id
                   AND b.snum = a.snum AND b.wi = a.wi + 1
              UNION ALL
              SELECT a.doc_id, a.term, b.term, c.term
              FROM tok a JOIN tok b ON b.doc_id = a.doc_id
                   AND b.snum = a.snum AND b.wi = a.wi + 1
                   JOIN tok c ON c.doc_id = a.doc_id
                   AND c.snum = a.snum AND c.wi = a.wi + 2),
            gf AS (
              SELECT doc_id, w1, w2, w3, count(*) AS ptf
              FROM grams
              WHERE w1 NOT IN ({stop_list})
                AND (w2 IS NULL OR w2 NOT IN ({stop_list}))
                AND (w3 IS NULL OR w3 NOT IN ({stop_list}))
              GROUP BY doc_id, w1, w2, w3),
            ph AS (
              SELECT g.doc_id,
                     CASE WHEN g.w3 IS NOT NULL
                            THEN g.w1 || ' ' || g.w2 || ' ' || g.w3
                          WHEN g.w2 IS NOT NULL THEN g.w1 || ' ' || g.w2
                          ELSE g.w1 END AS keyword,
                     CASE WHEN g.w3 IS NOT NULL THEN 3
                          WHEN g.w2 IS NOT NULL THEN 2 ELSE 1 END AS n_words,
                     CASE WHEN g.w3 IS NOT NULL
                            THEN s1.s * s2.s * s3.s
                                 / (g.ptf * (1.0 + (s1.s + s2.s + s3.s)))
                          WHEN g.w2 IS NOT NULL
                            THEN s1.s * s2.s / (g.ptf * (1.0 + (s1.s + s2.s)))
                          ELSE s1.s / (g.ptf * (1.0 + s1.s)) END AS score
              FROM gf g
              JOIN sc s1 ON s1.doc_id = g.doc_id AND s1.term = g.w1
              LEFT JOIN sc s2 ON s2.doc_id = g.doc_id AND s2.term = g.w2
              LEFT JOIN sc s3 ON s3.doc_id = g.doc_id AND s3.term = g.w3)"""
    yake_phrase_sql = _yake_ph_cte + """,
            yranked AS (
              SELECT doc_id, keyword, n_words, round(score, 4) AS score,
                     row_number() OVER (PARTITION BY doc_id
                                        ORDER BY round(score, 4) ASC,
                                                 keyword ASC) AS rank
              FROM ph)
            SELECT doc_id, rank, keyword, score, n_words
            FROM yranked WHERE rank <= 5 ORDER BY doc_id, rank"""
    # YAKE greedy near-dup pruning, Levenshtein-ratio variant: candidates
    # = top-30 phrases by (round4 score, keyword); a recursive CTE walks
    # them in order carrying the picked list (the exact greedy loop of
    # analytics.yake_levdedup_topk), rejecting a phrase when any earlier
    # pick is >= 0.6 similar (precomputed similar-pair edge list +
    # list_has_any, the star-clustering MIS pattern); first 5 picks win.
    yake_levdedup_sql = _yake_ph_cte.replace(
        "WITH chunks", "WITH RECURSIVE chunks", 1) + """,
            ycand AS MATERIALIZED (
              SELECT doc_id, keyword, n_words, round(score, 4) AS score,
                     row_number() OVER (PARTITION BY doc_id
                                        ORDER BY round(score, 4) ASC,
                                                 keyword ASC) AS rn
              FROM ph QUALIFY rn <= 30),
            yedges AS MATERIALIZED (
              SELECT a.doc_id, a.keyword AS a, b.keyword AS b
              FROM ycand a JOIN ycand b
                   ON b.doc_id = a.doc_id AND b.keyword <> a.keyword
              WHERE 1.0 - levenshtein(a.keyword, b.keyword)
                          / greatest(length(a.keyword), length(b.keyword))
                    >= 0.6),
            ynbrs AS MATERIALIZED (
              SELECT c.doc_id, c.rn, c.keyword,
                     coalesce((SELECT list(e.b) FROM yedges e
                               WHERE e.doc_id = c.doc_id AND e.a = c.keyword),
                              CAST([] AS VARCHAR[])) AS nb
              FROM ycand c),
            ystep AS (
              SELECT doc_id, 0 AS i, CAST([] AS VARCHAR[]) AS picked
              FROM (SELECT DISTINCT doc_id FROM ycand)
              UNION ALL
              SELECT s.doc_id, s.i + 1,
                     CASE WHEN NOT list_has_any(o.nb, s.picked)
                          THEN list_append(s.picked, o.keyword)
                          ELSE s.picked END
              FROM ystep s JOIN ynbrs o
                   ON o.doc_id = s.doc_id AND o.rn = s.i + 1),
            yfin AS (
              SELECT doc_id, picked,
                     row_number() OVER (PARTITION BY doc_id
                                        ORDER BY i DESC) AS rr
              FROM ystep),
            ysel AS (
              SELECT doc_id, unnest(picked) AS keyword,
                     generate_subscripts(picked, 1) AS rank
              FROM yfin WHERE rr = 1)
            SELECT y.doc_id, y.rank, y.keyword, c.score, c.n_words
            FROM ysel y JOIN ycand c
                 ON c.doc_id = y.doc_id AND c.keyword = y.keyword
            WHERE y.rank <= 5 ORDER BY y.doc_id, y.rank"""
    # MinHash-LSH near-dup, replicated end-to-end: 3-gram shingle hashes
    # as the Horner polynomial over per-token md5 hashes (hashing.py
    # SHINGLE_K; short docs fold all their tokens), the
    # MinHasher(seed=1729) permutation table (a*x+b mod 2^64 via
    # UHUGEINT), 16x8 banding via signature-slice equality (two docs
    # share a band key iff the 8 sig values match), candidate pairwise
    # signature-estimated Jaccard >= 0.8
    import numpy as _np

    from news_information_retrieval_system_ray.functions.hashing import MinHasher as _MH
    from news_information_retrieval_system_ray.functions.hashing import SHINGLE_K as _SHK

    _mh = _MH(num_perm=128, seed=1729)
    perm_rows = ", ".join(f"({i}, {int(a)}, {int(b)})"
                          for i, (a, b) in enumerate(zip(_mh.a, _mh.b)))
    _K = f"{int(_SHK)}::UHUGEINT"
    _M = "18446744073709551616::UHUGEINT"
    minhash_sql = _CTE + f""",
            tkl AS (SELECT doc_id,
                           list_filter(string_split(t, ' '),
                                       s -> s <> '' AND regexp_matches(s, '[a-z0-9_]')) AS tk
                    FROM norm),
            ntk AS (SELECT doc_id,
                           list_transform(tk, s -> ('0x' || substr(md5(s), 1, 16))::UBIGINT) AS th,
                           len(tk) AS n
                    FROM tkl),
            shl AS (SELECT doc_id,
                           CASE WHEN n >= 3
                                THEN list_transform(range(0, n - 2),
                                     i -> ((((th[i+1]::UHUGEINT * {_K} + th[i+2]::UHUGEINT) % {_M})
                                            * {_K} + th[i+3]::UHUGEINT) % {_M})::UBIGINT)
                                WHEN n = 2
                                THEN [((th[1]::UHUGEINT * {_K} + th[2]::UHUGEINT) % {_M})::UBIGINT]
                                WHEN n = 1 THEN [th[1]]
                                ELSE [] END AS gs
                    FROM ntk),
            sh AS (SELECT DISTINCT doc_id, g AS h
                   FROM (SELECT doc_id, unnest(gs) AS g FROM shl)),
            perm(pid, pa, pb) AS (VALUES {perm_rows}),
            sig AS (SELECT doc_id, pid,
                           min(((pa::UHUGEINT * h::UHUGEINT + pb::UHUGEINT)
                                % 18446744073709551616::UHUGEINT)::UBIGINT) AS s
                    FROM sh CROSS JOIN perm GROUP BY doc_id, pid),
            bnd AS (SELECT doc_id, pid // 8 AS band_id,
                           string_agg(lpad(to_hex(s), 16, '0'), '' ORDER BY pid) AS bkey
                    FROM sig GROUP BY doc_id, pid // 8),
            cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                     FROM bnd a JOIN bnd b
                          ON a.band_id = b.band_id AND a.bkey = b.bkey
                             AND a.doc_id < b.doc_id),
            estj AS (SELECT c.doc_a, c.doc_b,
                            avg(CASE WHEN sa.s = sb.s THEN 1.0 ELSE 0.0 END) AS est_jaccard
                     FROM cand c JOIN sig sa ON sa.doc_id = c.doc_a
                                 JOIN sig sb ON sb.doc_id = c.doc_b AND sb.pid = sa.pid
                     GROUP BY c.doc_a, c.doc_b)
            SELECT doc_a, doc_b, est_jaccard FROM estj
            WHERE est_jaccard >= 0.8 ORDER BY doc_a, doc_b"""
    # SimHash near-dup: same bit-vote simhash as the fingerprints oracle,
    # 4x16-bit LSB-first bands, pairs sharing any band, Hamming<=3 verify
    simhash_sql = _CTE + """,
            hsh AS (SELECT doc_id, tf,
                           ('0x' || substr(md5(term), 1, 16))::UBIGINT AS h
                    FROM tf),
            votes AS (SELECT doc_id, r.b,
                             sum(tf * (2 * ((h >> r.b) & 1)::BIGINT - 1)) AS v
                      FROM hsh CROSS JOIN range(0, 64) r(b)
                      GROUP BY doc_id, r.b),
            sim AS (SELECT doc_id,
                           bit_or(CASE WHEN v > 0 THEN (1::UBIGINT << b)
                                       ELSE 0::UBIGINT END)::UBIGINT AS sh
                    FROM votes GROUP BY doc_id),
            sbnd AS (SELECT doc_id, r.b AS band_id,
                            (sh >> (16 * r.b)) & 65535::UBIGINT AS bval
                     FROM sim CROSS JOIN range(0, 4) r(b)),
            spairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                       FROM sbnd a JOIN sbnd b
                            ON a.band_id = b.band_id AND a.bval = b.bval
                               AND a.doc_id < b.doc_id)
            SELECT p.doc_a, p.doc_b,
                   bit_count(xor(sa.sh, sb.sh))::BIGINT AS hamming
            FROM spairs p JOIN sim sa ON sa.doc_id = p.doc_a
                          JOIN sim sb ON sb.doc_id = p.doc_b
            WHERE bit_count(xor(sa.sh, sb.sh)) <= 3
            ORDER BY doc_a, doc_b"""
    # exact word-3-gram Jaccard >= 0.6 over MinHash-LSH candidates
    # (est >= 0.4): reuses the minhash sig/band replica, then exact
    # set-intersection Jaccard over the md5 shingle hashes
    ngram_jac_sql = minhash_sql[:minhash_sql.rindex("SELECT doc_a")] + """,
            cand04 AS (SELECT doc_a, doc_b FROM estj WHERE est_jaccard >= 0.4),
            inter AS (SELECT c.doc_a, c.doc_b, count(*) AS ni
                      FROM cand04 c JOIN sh a ON a.doc_id = c.doc_a
                                    JOIN sh b ON b.doc_id = c.doc_b AND b.h = a.h
                      GROUP BY c.doc_a, c.doc_b),
            szs AS (SELECT doc_id, count(*) AS ns FROM sh GROUP BY doc_id),
            jac AS (SELECT i.doc_a, i.doc_b,
                           i.ni::DOUBLE / (sa.ns + sb.ns - i.ni) AS j
                    FROM inter i JOIN szs sa ON sa.doc_id = i.doc_a
                                 JOIN szs sb ON sb.doc_id = i.doc_b)
            SELECT doc_a, doc_b, round(j, 4) AS jaccard FROM jac
            WHERE j >= 0.6 ORDER BY doc_a, doc_b"""
    qfocus_sql = summ_cte + """,
            scored AS (SELECT doc_id, raw, pos,
                              CASE WHEN len(list_intersect(list_distinct(tk),
                                                           ['slow', 'query', 'scan'])) > 0
                                   THEN len(list_intersect(list_distinct(tk),
                                                           ['slow', 'query', 'scan']))
                                        / sqrt(3.0 * len(list_distinct(tk)))
                                   ELSE 0.0 END AS sc
                       FROM kept),""" + summ_tail
    keysent_sql = summ_cte + """,
            tokrows AS (SELECT doc_id, pos, unnest(tk) AS term FROM kept),
            tfc AS (SELECT doc_id, term, count(*)::DOUBLE AS c
                    FROM tokrows GROUP BY doc_id, term),
            dfc AS (SELECT doc_id, term, count(DISTINCT pos)::DOUBLE AS d
                    FROM tokrows GROUP BY doc_id, term),
            nk AS (SELECT doc_id, count(*)::DOUBLE AS n FROM kept GROUP BY doc_id),
            contrib AS (SELECT tr.doc_id, tr.pos, sum(tfc.c * ln(nk.n / dfc.d)) AS s
                        FROM tokrows tr
                        JOIN tfc ON tfc.doc_id = tr.doc_id AND tfc.term = tr.term
                        JOIN dfc ON dfc.doc_id = tr.doc_id AND dfc.term = tr.term
                        JOIN nk ON nk.doc_id = tr.doc_id
                        GROUP BY tr.doc_id, tr.pos),
            scored AS (SELECT k.doc_id, k.raw, k.pos,
                              (coalesce(c.s, 0) / k.ntok) * (1 + 0.5 / (1 + k.pos)) AS sc
                       FROM kept k LEFT JOIN contrib c
                            ON k.doc_id = c.doc_id AND k.pos = c.pos),""" + summ_tail
    # snippet assembly: best sentence by distinct-term substring hits
    # (first max wins), 180-char trim, highlight-count via the same
    # longest-first alternation the pipeline compiles
    pv = ", ".join(
        "('{}', '{}')".format(qid, "|".join(sorted(set(ts), key=len, reverse=True)))
        for qid, ts in A.FIXED_QUERIES.items())
    snippets_sql = _CTE + bm25_rank_cte + f""",
            qpat(qid, pat) AS (VALUES {pv}),
            topk AS (SELECT qid, rank, doc_id FROM ranked WHERE rank <= 5),
            sents0 AS (SELECT doc_id, text,
                              list_filter(list_transform(regexp_split_to_array(text, '[。！？.!?]'),
                                                         s -> trim(s, ' ' || chr(9) || chr(10) || chr(13))),
                                          s -> s <> '') AS ss
                       FROM documents),
            sents AS (SELECT doc_id,
                             CASE WHEN len(ss) = 0
                                  THEN [trim(text, ' ' || chr(9) || chr(10) || chr(13))]
                                  ELSE ss END AS ss
                      FROM sents0),
            sflat AS (SELECT t.qid, t.rank, t.doc_id,
                             unnest(s.ss) AS sent,
                             unnest(range(1, len(s.ss) + 1)) AS si
                      FROM topk t JOIN sents s USING (doc_id)),
            shits AS (SELECT f.*,
                             (SELECT count(*) FROM qterms q
                              WHERE q.qid = f.qid AND contains(lower(f.sent), q.term)) AS h
                      FROM sflat f),
            sbest AS (SELECT qid, rank, doc_id, sent,
                             row_number() OVER (PARTITION BY qid, rank, doc_id
                                                ORDER BY h DESC, si) AS rn
                      FROM shits),
            snip AS (SELECT qid, rank, doc_id,
                            CASE WHEN length(sent) > 180
                                 THEN substr(sent, 1, 180) || '…' ELSE sent END AS snippet
                     FROM sbest WHERE rn = 1)
            SELECT s.qid, s.rank, s.doc_id, s.snippet,
                   len(regexp_extract_all(s.snippet, p.pat, 0, 'i'))::BIGINT AS n_marks
            FROM snip s JOIN qpat p USING (qid)
            ORDER BY s.qid, s.rank"""
    # per-query P@10 / R@10 / MRR@10: run AND binary qrels (doc relevant
    # iff it contains >= half the query's distinct terms) both derived
    # in SQL — mirrors analytics.eval_pr_at_k / _grade_qrels
    eval_pr_sql = _CTE + bm25_rank_cte + """,
            topk AS (SELECT qid, doc_id, rank FROM ranked WHERE rank <= 10),
            need AS (SELECT qid, count(*) AS n_terms FROM qterms GROUP BY qid),
            hitcount AS (
              SELECT q.qid, t.doc_id, count(DISTINCT t.term) AS hit
              FROM (SELECT DISTINCT doc_id, term FROM tf) t
              JOIN qterms q USING (term)
              GROUP BY q.qid, t.doc_id),
            rel AS (SELECT h.qid, h.doc_id FROM hitcount h JOIN need USING (qid)
                    WHERE 2 * h.hit >= need.n_terms),
            relcount AS (SELECT qid, count(*) AS n_rel FROM rel GROUP BY qid),
            hitsk AS (SELECT t.qid, count(r.doc_id) AS relk,
                             min(CASE WHEN r.doc_id IS NOT NULL THEN t.rank END) AS fr
                      FROM topk t LEFT JOIN rel r
                           ON t.qid = r.qid AND t.doc_id = r.doc_id
                      GROUP BY t.qid)
            SELECT n.qid,
                   round(coalesce(h.relk, 0) / 10.0, 4) AS p_at_k,
                   round(CASE WHEN coalesce(rc.n_rel, 0) = 0 THEN 0.0
                              ELSE coalesce(h.relk, 0) * 1.0 / rc.n_rel END, 4) AS r_at_k,
                   round(coalesce(1.0 / h.fr, 0.0), 4) AS mrr
            FROM need n LEFT JOIN hitsk h ON n.qid = h.qid
                        LEFT JOIN relcount rc ON n.qid = rc.qid
            ORDER BY n.qid"""
    # Full metric battery (functions/metrics.evaluate_run) over the BM25
    # top-10 run vs the synthetic GRADED qrels (grade 2 iff the doc holds
    # ALL query terms, 1 iff >= half).  Every metric macro-averaged over
    # the run's qids.  Notes: the qrels contain NO grade-0 judged docs, so
    # bpref degenerates to recall (N=0 => zero penalty per relevant hit);
    # ERR's sequential continue-product is exp(window-sum of ln(1-p)).
    _metric_cols = [
        ("P", "p"), ("R", "rcl"), ("F1", "f1"), ("P@10", "pk"),
        ("R@10", "rcl"), ("MRR", "mrr"), ("nDCG@10", "ndcg"),
        ("R-prec", "rpr"), ("ERR@10", "errv"), ("RBP", "rbp"),
        ("bpref", "rcl"), ("success@10", "succ"), ("MAP", "ap"),
    ]
    unpivot = "\n              UNION ALL ".join(
        f"SELECT '{name}' AS metric, avg({col}) AS value FROM f1q"
        for name, col in _metric_cols)
    # shared base for the evaluation-service curve diagnostics: the
    # BM25 top-10 run + binary qrels (grade >= 1) + running PR points
    pr_curve_base = _CTE + bm25_rank_cte + """,
            topk AS (SELECT qid, doc_id, rank FROM ranked WHERE rank <= 10),
            need AS (SELECT qid, count(*) AS n_terms FROM qterms GROUP BY qid),
            hitcount AS (
              SELECT q.qid, t.doc_id, count(DISTINCT t.term) AS hit
              FROM (SELECT DISTINCT doc_id, term FROM tf) t
              JOIN qterms q USING (term)
              GROUP BY q.qid, t.doc_id),
            grades AS (SELECT h.qid, h.doc_id,
                              CASE WHEN h.hit = n.n_terms THEN 2 ELSE 1 END AS g
                       FROM hitcount h JOIN need n USING (qid)
                       WHERE 2 * h.hit >= n.n_terms),
            nrel AS (SELECT qid, count(*) AS n_rel FROM grades GROUP BY qid),
            jj AS (SELECT t.qid, t.rank,
                          CASE WHEN g.g IS NOT NULL THEN 1 ELSE 0 END AS rel
                   FROM topk t LEFT JOIN grades g
                        ON t.qid = g.qid AND t.doc_id = g.doc_id),
            curve AS (SELECT j.qid, j.rank,
                             sum(j.rel) OVER (PARTITION BY j.qid ORDER BY j.rank)
                                 * 1.0 / n.n_rel AS rc,
                             sum(j.rel) OVER (PARTITION BY j.qid ORDER BY j.rank)
                                 * 1.0 / j.rank AS pr
                      FROM jj j JOIN nrel n USING (qid))"""
    eval_metrics_sql = _CTE + bm25_rank_cte + f""",
            topk AS (SELECT qid, doc_id, rank FROM ranked WHERE rank <= 10),
            need AS (SELECT qid, count(*) AS n_terms FROM qterms GROUP BY qid),
            hitcount AS (
              SELECT q.qid, t.doc_id, count(DISTINCT t.term) AS hit
              FROM (SELECT DISTINCT doc_id, term FROM tf) t
              JOIN qterms q USING (term)
              GROUP BY q.qid, t.doc_id),
            grades AS (SELECT h.qid, h.doc_id,
                              CASE WHEN h.hit = n.n_terms THEN 2 ELSE 1 END AS g
                       FROM hitcount h JOIN need n USING (qid)
                       WHERE 2 * h.hit >= n.n_terms),
            relstats AS (SELECT qid, count(*) AS n_rel, max(g) AS gmax
                         FROM grades GROUP BY qid),
            ideal AS (SELECT qid, g,
                             row_number() OVER (PARTITION BY qid ORDER BY g DESC) AS rn
                      FROM grades),
            idcg AS (SELECT qid, sum(g / log2(rn + 1.0)) AS v
                     FROM ideal WHERE rn <= 10 GROUP BY qid),
            j AS (SELECT t.qid, t.rank, coalesce(g.g, 0) AS g,
                         CASE WHEN coalesce(g.g, 0) > 0 THEN 1 ELSE 0 END AS rel
                  FROM topk t LEFT JOIN grades g
                       ON t.qid = g.qid AND t.doc_id = g.doc_id),
            apcum AS (SELECT qid, rank, rel, g,
                             sum(rel) OVER (PARTITION BY qid ORDER BY rank) AS hits
                      FROM j),
            perq_base AS (
              SELECT a.qid,
                     count(*) AS nlen,
                     sum(a.rel) AS relk,
                     sum(CASE WHEN a.rel = 1 THEN a.hits * 1.0 / a.rank END) AS apnum,
                     min(CASE WHEN a.rel = 1 THEN a.rank END) AS fr,
                     sum(a.g / log2(a.rank + 1.0)) AS dcg,
                     sum(a.rel * 0.2 * power(0.8, a.rank - 1)) AS rbp,
                     max(a.rel) * 1.0 AS succ
              FROM apcum a GROUP BY a.qid),
            rprec AS (SELECT a.qid, sum(a.rel) AS hits_r
                      FROM apcum a JOIN relstats r
                           ON a.qid = r.qid AND a.rank <= r.n_rel
                      GROUP BY a.qid),
            errt AS (SELECT a.qid, a.rank,
                            (power(2.0, a.g) - 1) / power(2.0, r.gmax) AS p
                     FROM apcum a JOIN relstats r USING (qid)
                     WHERE r.gmax > 0),
            errc AS (SELECT qid, rank, p,
                            coalesce(sum(ln(1 - p)) OVER (
                                PARTITION BY qid ORDER BY rank
                                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                                0) AS lpc
                     FROM errt),
            errq AS (SELECT qid, sum(exp(lpc) * p / rank) AS v
                     FROM errc GROUP BY qid),
            perq AS (
              SELECT b.qid,
                     b.relk * 1.0 / b.nlen AS p,
                     CASE WHEN coalesce(r.n_rel, 0) = 0 THEN 0.0
                          ELSE b.relk * 1.0 / r.n_rel END AS rcl,
                     CASE WHEN coalesce(r.n_rel, 0) = 0 THEN 0.0
                          ELSE coalesce(b.apnum, 0) / r.n_rel END AS ap,
                     b.relk / 10.0 AS pk,
                     coalesce(1.0 / b.fr, 0.0) AS mrr,
                     CASE WHEN coalesce(i.v, 0) = 0 THEN 0.0
                          ELSE b.dcg / i.v END AS ndcg,
                     CASE WHEN coalesce(r.n_rel, 0) = 0 THEN 0.0
                          ELSE coalesce(rp.hits_r, 0) * 1.0 / r.n_rel END AS rpr,
                     coalesce(e.v, 0.0) AS errv,
                     b.rbp AS rbp,
                     b.succ AS succ
              FROM perq_base b
              LEFT JOIN relstats r USING (qid)
              LEFT JOIN idcg i USING (qid)
              LEFT JOIN rprec rp USING (qid)
              LEFT JOIN errq e USING (qid)),
            f1q AS (SELECT *, CASE WHEN p + rcl = 0 THEN 0.0
                                   ELSE 2 * p * rcl / (p + rcl) END AS f1
                    FROM perq),
            allm AS ({unpivot}
              UNION ALL SELECT 'GMAP', exp(avg(ln(greatest(ap, 0.00001)))) FROM f1q
              UNION ALL SELECT 'n_queries', count(*) * 1.0 FROM f1q)
            SELECT metric, round(value, 4) AS value FROM allm ORDER BY metric"""
    # Distributed logistic-regression training (pipelines/ltr.ltr_train,
    # 60 full-batch GD epochs, lr=0.5, zero init) UNROLLED: the feature
    # table is the (already-green) ltr_features replica; each epoch is
    # one aggregate over the standardized rows producing the next weight
    # row, which also carries the PREVIOUS weights' loss/accuracy so
    # _loss_first (at w0), _loss_last and _train_accuracy (both at w59)
    # fall out of w1/w60 exactly as the Python loop reports them.  GD at
    # a stable lr is contractive, so sub-ulp exp/sum differences between
    # numpy and DuckDB stay far below the round4 reporting precision.
    ltr_feats_cte = bm25_rank_cte + """,
            cand AS (SELECT q.qid, tf.doc_id, count(*) AS match_count,
                            min(dln.dl) AS doc_len
                     FROM tf JOIN qterms q USING (term)
                             JOIN dln USING (doc_id)
                     GROUP BY 1, 2),
            qtc AS (SELECT qid, count(*) AS qtc FROM qterms GROUP BY qid),
            feats AS (SELECT c.qid, c.doc_id, qtc.qtc AS query_term_count,
                             c.match_count,
                             round(coalesce(s.score, 0), 4) AS bm25_score,
                             c.doc_len,
                             CASE WHEN c.match_count = qtc.qtc THEN 2
                                  WHEN 2 * c.match_count >= qtc.qtc THEN 1
                                  ELSE 0 END AS grade
                      FROM cand c JOIN qtc USING (qid)
                      LEFT JOIN scores s ON s.qid = c.qid AND s.doc_id = c.doc_id)"""
    _fcols = ["query_term_count", "match_count", "bm25_score", "doc_len"]
    _zparts = " + ".join(f"w2.w{j} * x{j}" for j in range(1, 5))

    def _ltr_chain(epochs: int) -> str:
        parts = [_CTE + ltr_feats_cte + ",\n            fx AS MATERIALIZED (SELECT qid, doc_id, "
                 + ", ".join(f"{c}::DOUBLE AS f{j}"
                             for j, c in enumerate(_fcols, 1))
                 + ", CASE WHEN round(grade / 3.0, 6) >= 0.5 THEN 1.0 ELSE 0.0 END AS y FROM feats),"
                 + "\n            mom AS (SELECT "
                 + ", ".join(f"avg(f{j}) AS m{j}, avg(f{j} * f{j}) AS s{j}"
                             for j in range(1, 5)) + " FROM fx),"
                 + "\n            xs AS MATERIALIZED (SELECT "
                 + ", ".join(
                     f"(f{j} - m{j}) / sqrt(greatest(s{j} - m{j} * m{j}, 1e-12)) AS x{j}"
                     for j in range(1, 5))
                 + ", y FROM fx CROSS JOIN mom),"
                 + "\n            w0(b, w1, w2, w3, w4, loss, acc) AS "
                 "MATERIALIZED (SELECT 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)"]
        for i in range(1, epochs + 1):
            grads = ", ".join(f"avg((p - y) * x{j}) AS g{j}" for j in range(1, 5))
            wups = ", ".join(f"w.w{j} - 0.5 * g.g{j} AS w{j}" for j in range(1, 5))
            # MATERIALIZED is load-bearing: each step references its
            # predecessor twice, and CTE inlining would re-evaluate the
            # whole chain exponentially (observed as fd exhaustion)
            parts.append(f""",
            w{i} AS MATERIALIZED (SELECT w.b - 0.5 * g.g0 AS b, {wups},
                            g.loss AS loss, g.acc AS acc
                     FROM w{i - 1} w CROSS JOIN (
                       SELECT avg(p - y) AS g0, {grads},
                              -avg(y * ln(p + 1e-12)
                                   + (1 - y) * ln(1 - p + 1e-12)) AS loss,
                              avg(CASE WHEN (p >= 0.5) = (y >= 0.5)
                                       THEN 1.0 ELSE 0.0 END) AS acc
                       FROM (SELECT xs.*,
                                    1.0 / (1.0 + exp(-(w2.b + {_zparts}))) AS p
                             FROM xs CROSS JOIN w{i - 1} w2)) g)""")
        return "".join(parts)

    def _star_sql(top_n: int = 150, threshold: float = 0.7) -> str:
        """Greedy star clustering (functions/cluster.star_clusters over
        edit-distance similarity) replicated EXACTLY in SQL.  The greedy
        loop uses a STATIC potential (neighbor count, never updated), so
        the selected centers are precisely the lexicographically-first
        maximal independent set along the fixed (potential DESC, term)
        order — computed by a recursive CTE that walks that order one
        term per step, carrying the centers list; every non-center then
        joins the EARLIEST-selected adjacent center, which is exactly
        the absorb step of the Python loop."""
        return _CTE.replace("WITH norm", "WITH RECURSIVE norm", 1) + f""",
            cfs AS (SELECT term, sum(tf) AS cf FROM tf GROUP BY term),
            topv AS (SELECT term FROM cfs ORDER BY cf DESC, term LIMIT {top_n}),
            edges AS MATERIALIZED (
              SELECT a.term AS a, b.term AS b
              FROM topv a JOIN topv b ON a.term <> b.term
              WHERE 1.0 - levenshtein(a.term, b.term)
                          / greatest(length(a.term), length(b.term)) >= {threshold}),
            nbrs AS (
              SELECT t.term,
                     coalesce((SELECT list(e.b) FROM edges e WHERE e.a = t.term),
                              CAST([] AS VARCHAR[])) AS nb,
                     (SELECT count(*) FROM edges e WHERE e.a = t.term) AS ndeg
              FROM topv t),
            ordered AS MATERIALIZED (
              SELECT term, nb, row_number() OVER (ORDER BY ndeg DESC, term) AS rn
              FROM nbrs),
            step AS (
              SELECT 0 AS i, CAST([] AS VARCHAR[]) AS centers
              UNION ALL
              SELECT s.i + 1,
                     CASE WHEN NOT list_has_any(o.nb, s.centers)
                          THEN list_append(s.centers, o.term) ELSE s.centers END
              FROM step s JOIN ordered o ON o.rn = s.i + 1),
            fin AS (SELECT centers FROM step ORDER BY i DESC LIMIT 1),
            cent AS (SELECT unnest(centers) AS center,
                            generate_subscripts(centers, 1) AS ord FROM fin),
            memb AS (
              SELECT e.a AS term, min(c.ord) AS ord
              FROM edges e JOIN cent c ON c.center = e.b
              WHERE e.a NOT IN (SELECT center FROM cent)
              GROUP BY e.a)
            SELECT CAST(ord - 1 AS BIGINT) AS cluster_id, center, center AS term
            FROM cent
            UNION ALL
            SELECT CAST(m.ord - 1 AS BIGINT), c.center, m.term
            FROM memb m JOIN cent c ON c.ord = m.ord
            ORDER BY cluster_id, term"""

    def _lda_sql(n_topics: int = 3, passes: int = 2, inner: int = 5,
                 eta: float = 0.01, top_n: int = 10,
                 output: str = "topics") -> str:
        """Batch variational LDA (pipelines/topics.lda_fixed_topics):
        both EM passes AND the fixed 5-iteration per-doc E-step are
        unrolled as chained CTEs over the (doc, vid, k) relations, and
        functions/lda.py's hand-rolled digamma (6 guarded recurrence
        shifts + 5-term asymptotic series — the container has no scipy,
        so NumPy and SQL evaluate the SAME formula) is inlined wherever
        psi() appears.  Lambda init is the arithmetic _lam_init_fixed
        formula (integer-exact both sides); ranking is on round4
        normalized weights."""
        alpha = repr(1.0 / n_topics)

        def psi(x: str) -> str:
            shifts = " ".join(
                f"- (CASE WHEN {x} + {t} < 6 THEN 1.0 / ({x} + {t}) ELSE 0.0 END)"
                for t in range(6))
            x6 = f"({x} + greatest(0.0, ceil(6.0 - {x})))"
            inv2 = f"(1.0 / ({x6} * {x6}))"
            coefs = (-1.0 / 12, 1.0 / 120, -1.0 / 252, 1.0 / 240, -1.0 / 132)
            series = " + ".join(f"({c!r}) * pow({inv2}, {p})"
                                for p, c in enumerate(coefs, 1))
            return (f"(0.0 {shifts} + ln({x6}) - 0.5 / {x6} + ({series}))")

        parts = [_CTE + f""",
            ldf AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
            lvocab AS MATERIALIZED (
              SELECT term, row_number() OVER (ORDER BY term) - 1 AS vid
              FROM ldf WHERE df >= 2 AND df <= 1.0 * (SELECT n FROM stats)),
            bow AS MATERIALIZED (
              SELECT tf.doc_id, v.vid, CAST(tf.tf AS DOUBLE) AS cts
              FROM tf JOIN lvocab v USING (term)),
            ltop AS (SELECT unnest(range(0, {n_topics})) AS k),
            lnd AS (SELECT doc_id, sum(cts) AS ndl FROM bow GROUP BY doc_id),
            lam0 AS MATERIALIZED (
              SELECT t.k, v.vid,
                     1.0 + (((t.k + 1) * 131071 + (v.vid + 1) * 524287) % 1000003)
                           / 1000003.0 * 0.1 - 0.05 AS lam
              FROM ltop t, lvocab v)"""]
        # passes 0..passes-1 update lambda; the extra chain at p=passes
        # (emitted for the doc_topics/perplexity outputs) is the FINAL
        # fixed-iteration E-step against the fitted lambda
        n_chains = passes if output == "topics" else passes + 1
        for p in range(n_chains):
            parts.append(f""",
            ls{p} AS (SELECT k, sum(lam) AS s FROM lam{p} GROUP BY k),
            xb{p} AS MATERIALIZED (
              SELECT l.k, l.vid, exp({psi('l.lam')} - {psi('ls.s')}) AS xb
              FROM lam{p} l JOIN ls{p} ls USING (k)),
            g{p}_0 AS (SELECT lnd.doc_id, t.k, {alpha} + lnd.ndl / {n_topics} AS g
                       FROM lnd, ltop t)""")
            for t in range(inner + 1):
                # et/pn for state t; then (if t < inner) gamma update t+1
                parts.append(f""",
            gs{p}_{t} AS (SELECT doc_id, sum(g) AS s FROM g{p}_{t} GROUP BY doc_id),
            et{p}_{t} AS MATERIALIZED (
              SELECT g.doc_id, g.k, exp({psi('g.g')} - {psi('gs.s')}) AS et
              FROM g{p}_{t} g JOIN gs{p}_{t} gs USING (doc_id)),
            pn{p}_{t} AS MATERIALIZED (
              SELECT b.doc_id, b.vid, sum(e.et * x.xb) + 1e-100 AS pn
              FROM bow b JOIN et{p}_{t} e USING (doc_id)
                   JOIN xb{p} x ON x.k = e.k AND x.vid = b.vid
              GROUP BY b.doc_id, b.vid)""")
                if t < inner:
                    parts.append(f""",
            g{p}_{t + 1} AS (
              SELECT e.doc_id, e.k, {alpha} + e.et * coalesce(s.acc, 0.0) AS g
              FROM et{p}_{t} e LEFT JOIN (
                SELECT b.doc_id, x.k, sum(x.xb * b.cts / pn.pn) AS acc
                FROM bow b JOIN pn{p}_{t} pn
                       ON pn.doc_id = b.doc_id AND pn.vid = b.vid
                     JOIN xb{p} x ON x.vid = b.vid
                GROUP BY b.doc_id, x.k) s
                ON s.doc_id = e.doc_id AND s.k = e.k)""")
            if p < passes:
                parts.append(f""",
            ss{p} AS (
              SELECT e.k, b.vid, sum(e.et * b.cts / pn.pn) AS raw
              FROM bow b JOIN pn{p}_{inner} pn
                     ON pn.doc_id = b.doc_id AND pn.vid = b.vid
                   JOIN et{p}_{inner} e ON e.doc_id = b.doc_id
              GROUP BY e.k, b.vid),
            lam{p + 1} AS MATERIALIZED (
              SELECT l.k, l.vid,
                     {eta} + coalesce(x.xb * s.raw, 0.0) AS lam
              FROM lam{p} l
              LEFT JOIN ss{p} s ON s.k = l.k AND s.vid = l.vid
              LEFT JOIN xb{p} x ON x.k = l.k AND x.vid = l.vid)""")
        if output == "topics":
            parts.append(f""",
            lsumf AS (SELECT k, sum(lam) AS s FROM lam{passes} GROUP BY k),
            lprob AS (SELECT l.k, v.term, round(l.lam / ls.s, 4) AS w
                      FROM lam{passes} l JOIN lsumf ls USING (k)
                           JOIN lvocab v USING (vid)),
            lrank AS (SELECT k AS topic_id, term, w,
                             row_number() OVER (PARTITION BY k
                                                ORDER BY w DESC, term) AS rank
                      FROM lprob)
            SELECT CAST(topic_id AS BIGINT) AS topic_id, rank, term, w AS weight
            FROM lrank WHERE rank <= {top_n} ORDER BY topic_id, rank""")
        elif output == "doc_topics":
            parts.append(f""",
            gnorm AS (SELECT g.doc_id, g.k, round(g.g / gs.s, 4) AS p
                      FROM g{passes}_{inner} g
                      JOIN gs{passes}_{inner} gs USING (doc_id))
            SELECT doc_id, CAST(k AS BIGINT) AS topic_id, p AS prob
            FROM gnorm WHERE p >= 0.01 ORDER BY doc_id, topic_id""")
        else:  # perplexity — Hoffman eq.4 word term, max-stabilized LSE
            parts.append(f""",
            eltF AS (SELECT g.doc_id, g.k, {psi('g.g')} - {psi('gs.s')} AS elt
                     FROM g{passes}_{inner} g
                     JOIN gs{passes}_{inner} gs USING (doc_id)),
            elbF AS (SELECT l.k, l.vid, {psi('l.lam')} - {psi('ls.s')} AS elb
                     FROM lam{passes} l JOIN ls{passes} ls USING (k)),
            mrel AS MATERIALIZED (
              SELECT b.doc_id, b.vid, b.cts, e.k, t.elt + e.elb AS m
              FROM bow b JOIN elbF e ON e.vid = b.vid
                   JOIN eltF t ON t.doc_id = b.doc_id AND t.k = e.k),
            mxr AS (SELECT doc_id, vid, max(m) AS mx
                    FROM mrel GROUP BY doc_id, vid),
            lse AS (SELECT m.doc_id, m.vid, any_value(m.cts) AS cts,
                           ln(sum(exp(m.m - x.mx))) + any_value(x.mx) AS l
                    FROM mrel m JOIN mxr x
                      ON x.doc_id = m.doc_id AND x.vid = m.vid
                    GROUP BY m.doc_id, m.vid),
            tot AS (SELECT sum(cts * l) AS loglik,
                           CAST(sum(cts) AS BIGINT) AS n_tokens FROM lse)
            SELECT (SELECT n FROM stats) AS n_docs, n_tokens,
                   round(exp(-loglik / n_tokens), 4) AS perplexity
            FROM tot""")
        return "".join(parts)

    def _als_sql(iters: int = 3, reg: float = 0.1) -> str:
        """Rank-2 ALS (pipelines/recommend.cf_als_fixed): the arithmetic
        factor init and explicit Cramer 2x2 ridge solves are replicated
        term-for-term; each alternation is two join-aggregate CTE layers
        (user solve from fixed items, item solve from fresh users) and
        RMSE is computed after every alternation, matching the Ray
        variant at round4."""

        def init(col: str, j: int) -> str:
            return (f"(({col} * 2654435761 + {j * 40503}) % 1000003)"
                    f" / 1000003.0 * 0.2 - 0.1")

        def solve(dst: str, own: str, other: str, src: str) -> str:
            return f""",
            {dst}s AS (
              SELECT i.{own},
                     sum(f.f1 * f.f1) + {reg} AS s11,
                     sum(f.f2 * f.f2) + {reg} AS s22,
                     sum(f.f1 * f.f2) AS s12,
                     sum(i.r * f.f1) AS b1,
                     sum(i.r * f.f2) AS b2
              FROM inter i JOIN {src} f USING ({other})
              GROUP BY i.{own}),
            {dst} AS (
              SELECT {own},
                     (b1 * s22 - b2 * s12) / (s11 * s22 - s12 * s12) AS f1,
                     (b2 * s11 - b1 * s12) / (s11 * s22 - s12 * s12) AS f2
              FROM {dst}s)"""

        def rmse(tag: str, usrc: str, isrc: str) -> str:
            return f""",
            rmse{tag} AS (
              SELECT sqrt(sum((i.r - (u.f1 * v.f1 + u.f2 * v.f2))
                              * (i.r - (u.f1 * v.f1 + u.f2 * v.f2))) / count(*)) AS e
              FROM inter i JOIN {usrc} u USING (user_id) JOIN {isrc} v USING (item))"""

        parts = [f"""
            WITH inter AS (
              SELECT user_id, CAST(regexp_extract(props, '[0-9]+') AS BIGINT) AS item,
                     sum(value) AS r
              FROM events GROUP BY 1, 2),
            u0 AS (SELECT DISTINCT user_id, {init('user_id', 1)} AS f1,
                          {init('user_id', 2)} AS f2 FROM inter),
            v0 AS (SELECT DISTINCT item, {init('item', 1)} AS f1,
                          {init('item', 2)} AS f2 FROM inter)"""]
        parts.append(rmse("0", "u0", "v0"))
        for t in range(1, iters + 1):
            parts.append(solve(f"u{t}", "user_id", "item", f"v{t - 1}"))
            parts.append(solve(f"v{t}", "item", "user_id", f"u{t}"))
            parts.append(rmse(str(t), f"u{t}", f"v{t}"))
        finals = [f"SELECT CAST({t} AS BIGINT) AS iteration, round(e, 4) AS rmse "
                  f"FROM rmse{t}" for t in range(0, iters + 1)]
        return "".join(parts) + "\n            " + \
            "\n            UNION ALL ".join(finals) + "\n            ORDER BY iteration"

    def _hac_sql(n_docs: int = 40, k: int = 6) -> str:
        """Complete-linkage HAC (functions/cluster.hac, reference
        doc_cluster.py:252-376) simulated EXACTLY in SQL: the flat
        pairwise TF-IDF-cosine matrix is carried as a list into a
        recursive CTE that replays the merge loop one step per
        iteration — candidate pairs, the complete-linkage min over the
        member cross product, and the first-strictly-best argmax (ties
        by insertion-order scan position) are all pure list lambdas, so
        no aggregation appears in the recursive term.  Both sides round
        sims to 9dp before the loop (see doc_hac_fixed) so summation
        order can't flip an argmax; min-of-rounded == rounded-min keeps
        complete linkage semantics intact."""
        return _CTE.replace("WITH norm", "WITH RECURSIVE norm", 1) + f""",
            hdf AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
            hw AS (
              SELECT tf.doc_id, tf.term,
                     (1.0 + log10(tf.tf))
                     * ln(1.0 + ((SELECT n FROM stats) - hdf.df + 0.5)
                                / (hdf.df + 0.5)) AS w
              FROM tf JOIN hdf USING (term) WHERE tf.doc_id < {n_docs}),
            hnorm AS (SELECT doc_id, sqrt(sum(w * w)) AS nrm
                      FROM hw GROUP BY doc_id),
            hwn AS (SELECT hw.doc_id, hw.term,
                           hw.w / (CASE WHEN hnorm.nrm = 0 THEN 1.0
                                        ELSE hnorm.nrm END) AS wn
                    FROM hw JOIN hnorm USING (doc_id)),
            hp AS (SELECT a.doc_id AS d1, b.doc_id AS d2,
                          round(sum(a.wn * b.wn), 9) AS sim
                   FROM hwn a JOIN hwn b
                     ON a.term = b.term AND a.doc_id < b.doc_id
                   GROUP BY a.doc_id, b.doc_id),
            hidx AS MATERIALIZED (
              SELECT d AS doc_id, row_number() OVER (ORDER BY d) AS i,
                     count(*) OVER () AS m
              FROM (SELECT d1 AS d FROM hp UNION SELECT d2 FROM hp)),
            hsym AS (
              SELECT i1.i AS i, i2.i AS j, hp.sim
              FROM hp JOIN hidx i1 ON hp.d1 = i1.doc_id
                      JOIN hidx i2 ON hp.d2 = i2.doc_id
              UNION ALL
              SELECT i2.i, i1.i, hp.sim
              FROM hp JOIN hidx i1 ON hp.d1 = i1.doc_id
                      JOIN hidx i2 ON hp.d2 = i2.doc_id),
            hmat AS MATERIALIZED (
              SELECT g.m, list(coalesce(s.sim, 0.0) ORDER BY g.i, g.j) AS mat
              FROM (SELECT a.i AS i, b.i AS j, a.m FROM hidx a, hidx b) g
              LEFT JOIN hsym s ON s.i = g.i AND s.j = g.j
              GROUP BY g.m),
            hstep AS (
              SELECT 0 AS it, range(1, m + 1) AS ords,
                     range(1, m + 1) AS assign, mat, m
              FROM hmat
              UNION ALL
              SELECT it + 1,
                     list_append(list_filter(ords, c -> c <> best.a AND c <> best.b),
                                 m + it + 1),
                     list_transform(assign, c -> CASE WHEN c = best.a OR c = best.b
                                                      THEN m + it + 1 ELSE c END),
                     mat, m
              FROM (
                SELECT it, ords, assign, mat, m,
                       (list_sort(list_transform(
                          flatten(list_transform(range(1, len(ords) + 1), i ->
                            list_transform(range(i + 1, len(ords) + 1),
                                           j -> {{'i': i, 'j': j}}))),
                          p -> {{'negl': -list_min(flatten(list_transform(
                                    list_filter(range(1, m + 1),
                                                d -> assign[d] = ords[p.i]), x ->
                                      list_transform(
                                        list_filter(range(1, m + 1),
                                                    d -> assign[d] = ords[p.j]),
                                        y -> mat[(x - 1) * m + y])))),
                                'pi': p.i, 'pj': p.j}})))[1] AS sel
                FROM hstep WHERE len(ords) > {k}
              ) s, LATERAL (SELECT {{'a': s.ords[s.sel.pi],
                                    'b': s.ords[s.sel.pj]}} AS best) l),
            hfin AS (SELECT assign, m FROM hstep ORDER BY it DESC LIMIT 1),
            hassign AS (SELECT unnest(assign) AS cid,
                               generate_subscripts(assign, 1) AS i FROM hfin),
            hmemb AS (SELECT h.cid, x.doc_id FROM hassign h JOIN hidx x USING (i)),
            hrank AS (SELECT cid, min(doc_id) AS mn, count(*) AS cluster_size
                      FROM hmemb GROUP BY cid),
            hlabel AS (SELECT cid, row_number() OVER (ORDER BY mn) - 1 AS cluster_id,
                              cluster_size
                       FROM hrank)
            SELECT d.doc_id, CAST(f.cluster_id AS BIGINT) AS cluster_id,
                   CAST(f.cluster_size AS BIGINT) AS cluster_size
            FROM hmemb d JOIN hlabel f USING (cid) ORDER BY d.doc_id"""

    def _cooc_sql(top_n: int = 100, min_cooc: int = 2) -> str:
        """Greedy co-occurrence clustering
        (functions/cluster.cooccurrence_clusters): same recursive
        lexicographic-first-MIS shape as _star_sql, but the walk order
        is plain lexicographic and the edge relation is 'appears in >=
        min_cooc common docs' (distinct doc-level presence, matching
        the set(tokens) pair counting in the Ray stage)."""
        return _CTE.replace("WITH norm", "WITH RECURSIVE norm", 1) + f""",
            cfs AS (SELECT term, sum(tf) AS cf FROM tf GROUP BY term),
            topv AS (SELECT term FROM cfs ORDER BY cf DESC, term LIMIT {top_n}),
            pres AS (SELECT DISTINCT tf.doc_id, tf.term
                     FROM tf JOIN topv USING (term)),
            co AS (SELECT p1.term AS a, p2.term AS b, count(*) AS n
                   FROM pres p1 JOIN pres p2
                     ON p1.doc_id = p2.doc_id AND p1.term < p2.term
                   GROUP BY p1.term, p2.term),
            edges AS MATERIALIZED (
              SELECT a, b FROM co WHERE n >= {min_cooc}
              UNION ALL
              SELECT b, a FROM co WHERE n >= {min_cooc}),
            nbrs AS (
              SELECT t.term,
                     coalesce((SELECT list(e.b) FROM edges e WHERE e.a = t.term),
                              CAST([] AS VARCHAR[])) AS nb
              FROM topv t),
            ordered AS MATERIALIZED (
              SELECT term, nb, row_number() OVER (ORDER BY term) AS rn
              FROM nbrs),
            step AS (
              SELECT 0 AS i, CAST([] AS VARCHAR[]) AS centers
              UNION ALL
              SELECT s.i + 1,
                     CASE WHEN NOT list_has_any(o.nb, s.centers)
                          THEN list_append(s.centers, o.term) ELSE s.centers END
              FROM step s JOIN ordered o ON o.rn = s.i + 1),
            fin AS (SELECT centers FROM step ORDER BY i DESC LIMIT 1),
            cent AS (SELECT unnest(centers) AS center,
                            generate_subscripts(centers, 1) AS ord FROM fin),
            memb AS (
              SELECT e.a AS term, min(c.ord) AS ord
              FROM edges e JOIN cent c ON c.center = e.b
              WHERE e.a NOT IN (SELECT center FROM cent)
              GROUP BY e.a)
            SELECT CAST(ord - 1 AS BIGINT) AS cluster_id, center, center AS term
            FROM cent
            UNION ALL
            SELECT CAST(m.ord - 1 AS BIGINT), c.center, m.term
            FROM memb m JOIN cent c ON c.ord = m.ord
            ORDER BY cluster_id, term"""

    def _textrank_sql(iters: int = 30, k: int = 5, window: int = 5) -> str:
        """TextRank (functions/keywords.textrank_scores: window-5
        co-occurrence graph, damping 0.85) with the power iteration
        UNROLLED as ``iters`` chained CTEs — exact because the Ray-side
        ``textrank_fixed_topk`` runs tol=0 / max_iter=iters and both
        sides rank on the ROUNDED score (round4 desc, term asc)."""
        head = f"""
            WITH norm AS (
              SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
              FROM documents),
            fl AS (
              SELECT doc_id, list_filter(string_split(t, ' '),
                     x -> regexp_matches(x, '[a-z0-9_]')) AS toks
              FROM norm),
            seq AS (
              SELECT doc_id, unnest(toks) AS term, generate_subscripts(toks, 1) AS pos
              FROM fl WHERE len(toks) > 0),
            pairs AS (
              SELECT s1.doc_id, s1.term AS a, s2.term AS b
              FROM seq s1 JOIN seq s2
                ON s1.doc_id = s2.doc_id
               AND s2.pos - s1.pos BETWEEN 1 AND {window - 1}
               AND s1.term <> s2.term),
            edges AS MATERIALIZED (
              SELECT doc_id, a, b, CAST(count(*) AS DOUBLE) AS w FROM (
                SELECT doc_id, a, b FROM pairs
                UNION ALL
                SELECT doc_id, b AS a, a AS b FROM pairs)
              GROUP BY doc_id, a, b),
            vocab AS MATERIALIZED (SELECT DISTINCT doc_id, term FROM seq),
            nd AS MATERIALIZED (SELECT doc_id, count(*) AS n FROM vocab
                                GROUP BY doc_id),
            dg AS MATERIALIZED (SELECT doc_id, a AS term, sum(w) AS deg
                                FROM edges GROUP BY doc_id, a),
            r0 AS (SELECT v.doc_id, v.term, 1.0 / nd.n AS r
                   FROM vocab v JOIN nd USING (doc_id))"""
        steps = []
        for i in range(1, iters + 1):
            steps.append(f""",
            r{i} AS MATERIALIZED (
              SELECT v.doc_id, v.term,
                     0.15 / nd.n + 0.85 * coalesce(s.acc, 0.0) AS r
              FROM vocab v JOIN nd USING (doc_id)
              LEFT JOIN (
                SELECT e.doc_id, e.b AS term, sum(e.w / dg.deg * p.r) AS acc
                FROM edges e
                JOIN dg ON e.doc_id = dg.doc_id AND e.a = dg.term
                JOIN r{i - 1} p ON e.doc_id = p.doc_id AND e.a = p.term
                GROUP BY e.doc_id, e.b) s
                ON v.doc_id = s.doc_id AND v.term = s.term)""")
        tail = f""",
            scored AS (
              SELECT rr.doc_id, rr.term,
                     CASE WHEN nd.n = 1 THEN 1.0 ELSE round(rr.r, 4) END AS sc
              FROM r{iters} rr JOIN nd ON rr.doc_id = nd.doc_id),
            ranked AS (
              SELECT doc_id, term, sc,
                     row_number() OVER (PARTITION BY doc_id
                                        ORDER BY sc DESC, term) AS rank
              FROM scored)
            SELECT doc_id, rank, term, sc AS score
            FROM ranked WHERE rank <= {k} ORDER BY doc_id, rank"""
        return head + "".join(steps) + tail

    _dirsel = "CASE WHEN {v} >= 0 THEN 'positive' ELSE 'negative' END"
    finals = [f"SELECT '{c}' AS feature, round(w{60}.w{j}, 4) AS coefficient, "
              + _dirsel.format(v=f"w{60}.w{j}") + f" AS direction FROM w{60}"
              for j, c in enumerate(_fcols, 1)]
    finals.append(f"SELECT '_intercept', round(w{60}.b, 4), "
                  + _dirsel.format(v=f"w{60}.b") + f" FROM w{60}")
    finals.append(f"SELECT '_train_accuracy', round(w{60}.acc, 4), '' FROM w{60}")
    finals.append("SELECT '_loss_first', round(w1.loss, 4), '' FROM w1")
    finals.append(f"SELECT '_loss_last', round(w{60}.loss, 4), '' FROM w{60}")
    ltr_train_sql = _ltr_chain(60) + "\n            " + \
        "\n            UNION ALL ".join(finals)
    # serving loop (pipelines/ltr.ltr_rerank, epochs=40): score every
    # candidate with the ROUNDED trained coefficients; standardization
    # here is numpy mean / std clamped at 1e-6 (two-pass variance)
    _rz = " + ".join(
        f"coef.c{j} * (f.f{j} - mu2.am{j}) / sd2.sd{j}" for j in range(1, 5))
    ltr_rerank_sql = _ltr_chain(40) + f""",
            coef AS MATERIALIZED (SELECT round(b, 4) AS b,
                   {', '.join(f'round(w{40}.w{j}, 4) AS c{j}' for j in range(1, 5))}
                   FROM w{40}),
            mu2 AS MATERIALIZED (SELECT
                   {', '.join(f'avg(f{j}) AS am{j}' for j in range(1, 5))} FROM fx),
            sd2 AS MATERIALIZED (SELECT
                   {', '.join(f'greatest(sqrt(avg((f{j} - am{j}) * (f{j} - am{j}))), 1e-6) AS sd{j}' for j in range(1, 5))}
                   FROM fx CROSS JOIN mu2),
            prob AS (SELECT f.qid, f.doc_id,
                            1.0 / (1.0 + exp(-(coef.b + {_rz}))) AS prob
                     FROM fx f CROSS JOIN coef CROSS JOIN mu2 CROSS JOIN sd2),
            rr AS (SELECT qid, doc_id, prob,
                          row_number() OVER (PARTITION BY qid
                                             ORDER BY prob DESC, doc_id) AS rank
                   FROM prob)
            SELECT qid, rank, doc_id, round(prob, 4) AS prob
            FROM rr WHERE rank <= 10 ORDER BY qid, rank"""
    field_boost_sql = _CTE + f""",
            qterms(qid, term) AS (VALUES {qv}),
            dfs AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
            contrib AS (
              SELECT q.qid, tf.doc_id,
                     ln((stats.n - dfs.df + 0.5) / (dfs.df + 0.5) + 1.0)
                     * (tf.tf * 2.5) / (tf.tf + 1.5 * (1 - 0.75 + 0.75 * dln.dl / stats.avgdl)) AS c
              FROM tf
              JOIN qterms q USING (term)
              JOIN dfs USING (term)
              JOIN dln ON tf.doc_id = dln.doc_id
              CROSS JOIN stats),
            scores AS (SELECT qid, doc_id, sum(c) AS score FROM contrib GROUP BY qid, doc_id),
            fields AS (SELECT doc_id, source, lang,
                              list_slice(string_split(t, ' '), 1, 5) AS title5,
                              string_split(t, ' ') AS alltoks
                       FROM norm),
            boosts AS (SELECT q.qid, f.doc_id,
                round(least(1.5,
                  0.45 * least(count(DISTINCT q.term)
                               FILTER (list_contains(f.title5, q.term)), 3)
                + 0.25 * least(count(DISTINCT q.term)
                               FILTER (q.term = f.source), 3)
                + 0.18 * least(count(DISTINCT q.term)
                               FILTER (q.term = f.lang), 3)
                + 0.06 * least(count(DISTINCT q.term)
                               FILTER (list_contains(f.alltoks, q.term)), 3)), 6) AS boost
                FROM fields f CROSS JOIN qterms q
                GROUP BY q.qid, f.doc_id),
            adjusted AS (SELECT s.qid, s.doc_id,
                                s.score + coalesce(b.boost, 0) AS adj
                         FROM scores s LEFT JOIN boosts b
                              ON s.qid = b.qid AND s.doc_id = b.doc_id),
            ranked AS (SELECT qid, doc_id, adj,
                              row_number() OVER (PARTITION BY qid ORDER BY adj DESC, doc_id) AS rank
                       FROM adjusted)
            SELECT qid, rank, doc_id, round(adj, 4) AS score FROM ranked WHERE rank <= 10"""
    # related_documents: related-query build -> hybrid RRF -> field boost
    # -> relation boost -> top-5 (search_service.py:803-989); every stage
    # of analytics.related_documents replicated (rank keys round9,
    # boosts round6, fields per the field_boost_topk derivation)
    related_sql = _CTE + f""",
            dfs AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
            dtoks AS (SELECT list_filter(string_split(t, ' '),
                             x -> regexp_matches(x, '[a-z0-9_]')) AS toks,
                             source AS psrc, lang AS pcat
                      FROM norm WHERE doc_id = {A.RELATED_DOC_ID}),
            kwsc AS (SELECT t.term,
                            round(t.tf * ln(1 + (stats.n - dfs.df + 0.5) / (dfs.df + 0.5)), 9) AS s
                     FROM tf t JOIN dfs USING (term) CROSS JOIN stats
                     WHERE t.doc_id = {A.RELATED_DOC_ID} AND length(t.term) > 1),
            kw8 AS (SELECT term FROM kwsc ORDER BY s DESC, term LIMIT {A.RELATED_KW_K}),
            qtok AS (SELECT term FROM (SELECT unnest(toks) AS term,
                                              generate_subscripts(toks, 1) AS pos
                                       FROM dtoks) WHERE pos <= 5
                     UNION ALL SELECT term FROM kw8
                     UNION ALL SELECT psrc FROM dtoks),
            qmult AS (SELECT term, count(*) AS m FROM qtok GROUP BY term),
            bmc AS (SELECT tf.doc_id,
                           q.m * ln((stats.n - dfs.df + 0.5) / (dfs.df + 0.5) + 1.0)
                           * (tf.tf * 2.5) / (tf.tf + 1.5 * (1 - 0.75 + 0.75 * dln.dl / stats.avgdl)) AS c
                    FROM tf JOIN qmult q USING (term) JOIN dfs USING (term)
                    JOIN dln ON tf.doc_id = dln.doc_id CROSS JOIN stats),
            bms AS (SELECT doc_id, round(sum(c), 9) AS score FROM bmc GROUP BY doc_id),
            bmr AS (SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS r
                    FROM bms),
            bm300 AS (SELECT * FROM bmr WHERE r <= {A.RELATED_RANKER_DEPTH}),
            qvw AS (SELECT q.term,
                           (1 + log10(q.m)) * ln(1 + (stats.n - dfs.df + 0.5) / (dfs.df + 0.5)) AS w
                    FROM qmult q JOIN dfs USING (term) CROSS JOIN stats),
            qnorm AS (SELECT sqrt(sum(w * w)) AS nn FROM qvw),
            dw AS (SELECT tf.doc_id, tf.term,
                          (1 + log10(tf.tf)) * ln(1 + (stats.n - dfs.df + 0.5) / (dfs.df + 0.5)) AS w
                   FROM tf JOIN dfs USING (term) CROSS JOIN stats),
            dnorm AS (SELECT doc_id, sqrt(sum(w * w)) AS nn FROM dw GROUP BY doc_id),
            tfsq AS (SELECT dw.doc_id,
                            round(sum((qvw.w / qnorm.nn) * (dw.w / dnorm.nn)), 9) AS score
                     FROM dw JOIN qvw USING (term) CROSS JOIN qnorm
                     JOIN dnorm ON dw.doc_id = dnorm.doc_id
                     GROUP BY dw.doc_id),
            tfr AS (SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS r
                    FROM tfsq),
            tf300 AS (SELECT * FROM tfr WHERE r <= {A.RELATED_RANKER_DEPTH}),
            fusedq AS (SELECT coalesce(b.doc_id, x.doc_id) AS doc_id,
                              coalesce({A.RRF_W_BM25} / ({A.RRF_K0} + b.r), 0)
                            + coalesce({A.RRF_W_TFIDF} / ({A.RRF_K0} + x.r), 0) AS f
                       FROM bm300 b FULL OUTER JOIN tf300 x ON b.doc_id = x.doc_id),
            top60 AS (SELECT doc_id, f FROM fusedq
                      ORDER BY f DESC, doc_id LIMIT {A.RELATED_DEPTH}),
            qdist AS (SELECT DISTINCT term FROM qmult),
            fields AS (SELECT n2.doc_id, n2.source, n2.lang,
                              list_slice(string_split(n2.t, ' '), 1, 5) AS title5,
                              string_split(n2.t, ' ') AS alltoks
                       FROM norm n2 JOIN top60 USING (doc_id)),
            fbv AS (SELECT f.doc_id,
                      round(least(1.5,
                        0.45 * least(count(DISTINCT q.term)
                                     FILTER (list_contains(f.title5, q.term)), 3)
                      + 0.25 * least(count(DISTINCT q.term)
                                     FILTER (q.term = f.source), 3)
                      + 0.18 * least(count(DISTINCT q.term)
                                     FILTER (q.term = f.lang), 3)
                      + 0.06 * least(count(DISTINCT q.term)
                                     FILTER (list_contains(f.alltoks, q.term)), 3)), 6) AS boost
                    FROM fields f CROSS JOIN qdist q GROUP BY f.doc_id),
            cnts AS (SELECT doc_id, count(*) AS n FROM ft GROUP BY doc_id),
            prof AS (SELECT ('g' || (('0x' || substr(md5(psrc), 1, 16))::UBIGINT % 3)) AS ptopic,
                            pcat, psrc,
                            CASE WHEN len(dtoks.toks) > {A.RELATED_CTYPE_MIN}
                                 THEN 'long' ELSE 'short' END AS pctype
                     FROM dtoks),
            relc AS (SELECT t.doc_id, t.f, coalesce(fbv.boost, 0) AS boost,
                            CASE WHEN ('g' || (('0x' || substr(md5(d.source), 1, 16))::UBIGINT % 3)) = prof.ptopic
                                 THEN 1 ELSE 0 END AS same_topic,
                            CASE WHEN d.lang = prof.pcat THEN 1 ELSE 0 END AS same_category,
                            CASE WHEN d.source = prof.psrc THEN 1 ELSE 0 END AS same_source,
                            CASE WHEN (CASE WHEN coalesce(c.n, 0) > {A.RELATED_CTYPE_MIN}
                                            THEN 'long' ELSE 'short' END) = prof.pctype
                                 THEN 1 ELSE 0 END AS same_ctype
                     FROM top60 t JOIN norm d USING (doc_id)
                     LEFT JOIN fbv ON t.doc_id = fbv.doc_id
                     LEFT JOIN cnts c ON t.doc_id = c.doc_id
                     CROSS JOIN prof),
            boosted AS (SELECT doc_id, same_topic, same_category, same_source,
                               round({A.REL_W_TOPIC} * same_topic + {A.REL_W_CAT} * same_category
                                     + {A.REL_W_SRC} * same_source + {A.REL_W_CTYPE} * same_ctype
                                     + least({A.REL_W_TAG} * same_source, {A.REL_W_TAG_CAP}), 6) AS rel,
                               f, boost
                        FROM relc WHERE doc_id != {A.RELATED_DOC_ID}),
            scored2 AS (SELECT doc_id, same_topic, same_category, same_source, rel,
                               f + boost + rel AS score
                        FROM boosted),
            sel AS (SELECT * FROM scored2
                    ORDER BY score DESC, doc_id LIMIT {A.RELATED_TOPK}),
            final AS (SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank,
                             doc_id, round(score, 6) AS score,
                             round(least(1, greatest(0, score / max(score) OVER ())), 6) AS similarity,
                             rel AS relation_boost,
                             CAST(same_topic AS BIGINT) AS same_topic,
                             CAST(same_category AS BIGINT) AS same_category,
                             CAST(same_source AS BIGINT) AS same_source
                      FROM sel)
            SELECT * FROM final"""
    # search_suggestions: the four typed no-result expansions
    # (search_service.py:750-801) with each branch's emission condition
    # derived in SQL (synonym map embedded from functions/synonyms;
    # fuzzy/csoundex identity-expansions suppressed like the reference)
    from news_information_retrieval_system_ray.functions.synonyms import SYNONYMS as _SYN
    _sq_terms = list(A.FIXED_QUERIES[A.SUGGEST_QID])
    _sq_list = "[" + ", ".join(repr(t) for t in _sq_terms) + "]"
    _sq_vals = ", ".join(f"({t!r}, {i})" for i, t in enumerate(_sq_terms, 1))
    _syn_vals = ", ".join(
        f"({a!r}, {b!r}, {ai}, {bi})"
        for ai, (a, bs) in enumerate(_SYN.items())
        for bi, b in enumerate(bs)) or "('', '', 0, 0)"
    _sq_raw = " ".join(_sq_terms)
    suggestions_sql = _CTE + f""",
            dfs AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
            vocab AS (SELECT DISTINCT term FROM tf),
            qts(term, qpos) AS (VALUES {_sq_vals}),
            -- synonym branch (text_quality.py:114-135): term hits (query
            -- order, then map-list order) + phrase-in-text hits (map
            -- insertion order), first-wins dedup; a synonym whose
            -- NORMALIZED form is already a normalized query term is
            -- excluded (the 臺灣->台灣 collapse)
            synmap(a, b, ai, bi) AS (VALUES {_syn_vals}),
            qnormed AS (SELECT replace(lower(term), '臺', '台') AS nt FROM qts),
            synhit AS (
              SELECT b AS term, q.qpos * 100000 + bi AS k
              FROM qts q JOIN synmap ON a = q.term
              WHERE replace(lower(b), '臺', '台') NOT IN (SELECT nt FROM qnormed)
              UNION ALL
              SELECT b AS term, 100000000 + ai * 100 + bi AS k FROM synmap
              WHERE a NOT IN (SELECT term FROM qts) AND a != ''
                AND position(replace(lower(a), '臺', '台') IN '{_sq_raw}') > 0
                AND replace(lower(b), '臺', '台') NOT IN (SELECT nt FROM qnormed)),
            synord AS (SELECT term, min(k) AS k FROM synhit GROUP BY term),
            semit AS (SELECT 'synonym' AS stype,
                             CAST(row_number() OVER (ORDER BY k, term) AS BIGINT) AS rank,
                             term FROM synord),
            -- fuzzy branch (:384-395): per-term dist<=1 expand, (dist,
            -- term) order, cap {A.FUZZY_MAX_EXPANSIONS}, first-wins
            -- dedup; emitted only if != the query term list
            fexp AS (SELECT q.qpos, v.term, levenshtein(v.term, q.term) AS dist
                     FROM qts q JOIN vocab v ON levenshtein(v.term, q.term) <= {A.SUGGEST_FUZZY_DIST}),
            fcap AS (SELECT * FROM (
                       SELECT qpos, term,
                              row_number() OVER (PARTITION BY qpos ORDER BY dist, term) AS rn
                       FROM fexp) WHERE rn <= {A.FUZZY_MAX_EXPANSIONS}),
            ford AS (SELECT term, min(qpos * 1000000 + rn) AS k FROM fcap GROUP BY term),
            flist AS (SELECT coalesce(list(term ORDER BY k), []) AS l FROM ford),
            femit AS (SELECT 'fuzzy' AS stype,
                             CAST(row_number() OVER (ORDER BY k) AS BIGINT) AS rank,
                             term FROM ford
                      WHERE (SELECT len(l) FROM flist) > 0
                        AND (SELECT l FROM flist) != {_sq_list}),
            -- csoundex branch (:397-411): ASCII positional-match
            -- similarity >= {A.SUGGEST_CS_THRESHOLD}, top-{A.SUGGEST_CS_K} per term
            csim AS (SELECT q.qpos, v.term,
                            round(len(list_filter(
                                range(least(length(v.term), length(q.term))),
                                i -> substr(v.term, i::INT + 1, 1)
                                     = substr(q.term, i::INT + 1, 1)))::DOUBLE
                            / greatest(length(v.term), length(q.term)), 4) AS s
                     FROM qts q JOIN vocab v ON regexp_matches(v.term, '^[a-z]+$')),
            ccap AS (SELECT * FROM (
                       SELECT qpos, term,
                              row_number() OVER (PARTITION BY qpos ORDER BY s DESC, term) AS rn
                       FROM csim WHERE s >= {A.SUGGEST_CS_THRESHOLD})
                     WHERE rn <= {A.SUGGEST_CS_K}),
            cord AS (SELECT term, min(qpos * 1000000 + rn) AS k FROM ccap GROUP BY term),
            clist AS (SELECT coalesce(list(term ORDER BY k), []) AS l FROM cord),
            cemit AS (SELECT 'csoundex' AS stype,
                             CAST(row_number() OVER (ORDER BY k) AS BIGINT) AS rank,
                             term FROM cord
                      WHERE (SELECT len(l) FROM clist) > 0
                        AND (SELECT l FROM clist) != {_sq_list}),
            -- rocchio branch (:587-625 + rocchio.py:177-333, app params
            -- alpha=1 beta={A.ROCCHIO_APP_BETA} max_terms={A.ROCCHIO_APP_MAX_TERMS}
            -- min_w={A.ROCCHIO_APP_MIN_W}): BM25 top-{A.SUGGEST_FEEDBACK_K} PRF
            bmc AS (SELECT tf.doc_id,
                           ln((stats.n - dfs.df + 0.5) / (dfs.df + 0.5) + 1.0)
                           * (tf.tf * 2.5) / (tf.tf + 1.5 * (1 - 0.75 + 0.75 * dln.dl / stats.avgdl)) AS c
                    FROM tf JOIN qts USING (term) JOIN dfs USING (term)
                    JOIN dln ON tf.doc_id = dln.doc_id CROSS JOIN stats),
            bms AS (SELECT doc_id, round(sum(c), 9) AS score FROM bmc GROUP BY doc_id),
            top5 AS (SELECT doc_id FROM bms
                     ORDER BY score DESC, doc_id LIMIT {A.SUGGEST_FEEDBACK_K}),
            nrel AS (SELECT count(*) AS nr FROM top5),
            dw AS (SELECT tf.doc_id, tf.term,
                          (1 + log10(tf.tf)) * ln(1 + (stats.n - dfs.df + 0.5) / (dfs.df + 0.5)) AS w
                   FROM tf JOIN dfs USING (term) CROSS JOIN stats
                   WHERE tf.doc_id IN (SELECT doc_id FROM top5)),
            dnorm AS (SELECT doc_id, sqrt(sum(w * w)) AS nn FROM dw GROUP BY doc_id),
            qv AS (SELECT q.term,
                          coalesce(ln(1 + (stats.n - dfs.df + 0.5) / (dfs.df + 0.5)), 1.0) AS w
                   FROM (SELECT DISTINCT term FROM qts) q
                   LEFT JOIN dfs ON q.term = dfs.term CROSS JOIN stats),
            newq AS (SELECT term, greatest(0, sum(w)) AS w FROM (
                       SELECT term, {A.ROCCHIO_APP_ALPHA} * w AS w FROM qv
                       UNION ALL
                       SELECT dw.term,
                              ({A.ROCCHIO_APP_BETA} / nrel.nr) * dw.w / dnorm.nn AS w
                       FROM dw JOIN dnorm USING (doc_id) CROSS JOIN nrel)
                     GROUP BY term),
            drift AS (SELECT 1.0
                             - (SELECT sum(qv.w * newq.w) FROM qv JOIN newq USING (term))
                             / ((SELECT sqrt(sum(w * w)) FROM qv)
                                * (SELECT sqrt(sum(w * w)) FROM newq)) AS d),
            maxt AS (SELECT CASE WHEN d > {A.ROCCHIO_APP_MAX_DRIFT}
                                 THEN greatest(1, CAST(trunc({A.ROCCHIO_APP_MAX_TERMS}
                                      * {A.ROCCHIO_APP_MAX_DRIFT} / d) AS BIGINT))
                                 ELSE {A.ROCCHIO_APP_MAX_TERMS} END AS mt FROM drift),
            rcand AS (SELECT term, round(w, 9) AS w9 FROM newq
                      WHERE term NOT IN (SELECT term FROM qts)
                        AND w >= {A.ROCCHIO_APP_MIN_W}),
            remit AS (SELECT 'rocchio' AS stype, rank, term FROM (
                        SELECT term,
                               CAST(row_number() OVER (ORDER BY w9 DESC, term) AS BIGINT) AS rank
                        FROM rcand) CROSS JOIN maxt WHERE rank <= maxt.mt)
            SELECT stype, rank, term FROM semit
            UNION ALL SELECT stype, rank, term FROM femit
            UNION ALL SELECT stype, rank, term FROM cemit
            UNION ALL SELECT stype, rank, term FROM remit"""
    # expand_query payload: the same rocchio-PRF CTE chain as
    # suggestions_sql, emitting the API row (search_service.py:587-625)
    expand_query_sql = _CTE + f""",
            dfs AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
            qts(term, qpos) AS (VALUES {_sq_vals}),
            bmc AS (SELECT tf.doc_id,
                           ln((stats.n - dfs.df + 0.5) / (dfs.df + 0.5) + 1.0)
                           * (tf.tf * 2.5) / (tf.tf + 1.5 * (1 - 0.75 + 0.75 * dln.dl / stats.avgdl)) AS c
                    FROM tf JOIN qts USING (term) JOIN dfs USING (term)
                    JOIN dln ON tf.doc_id = dln.doc_id CROSS JOIN stats),
            bms AS (SELECT doc_id, round(sum(c), 9) AS score FROM bmc GROUP BY doc_id),
            top5 AS (SELECT doc_id FROM bms
                     ORDER BY score DESC, doc_id LIMIT {A.SUGGEST_FEEDBACK_K}),
            nrel AS (SELECT count(*) AS nr FROM top5),
            dw AS (SELECT tf.doc_id, tf.term,
                          (1 + log10(tf.tf)) * ln(1 + (stats.n - dfs.df + 0.5) / (dfs.df + 0.5)) AS w
                   FROM tf JOIN dfs USING (term) CROSS JOIN stats
                   WHERE tf.doc_id IN (SELECT doc_id FROM top5)),
            dnorm AS (SELECT doc_id, sqrt(sum(w * w)) AS nn FROM dw GROUP BY doc_id),
            qvx AS (SELECT q.term,
                           coalesce(ln(1 + (stats.n - dfs.df + 0.5) / (dfs.df + 0.5)), 1.0) AS w
                    FROM (SELECT DISTINCT term FROM qts) q
                    LEFT JOIN dfs ON q.term = dfs.term CROSS JOIN stats),
            newq AS (SELECT term, greatest(0, sum(w)) AS w FROM (
                       SELECT term, {A.ROCCHIO_APP_ALPHA} * w AS w FROM qvx
                       UNION ALL
                       SELECT dw.term,
                              ({A.ROCCHIO_APP_BETA} / nrel.nr) * dw.w / dnorm.nn AS w
                       FROM dw JOIN dnorm USING (doc_id) CROSS JOIN nrel)
                     GROUP BY term),
            drift AS (SELECT 1.0
                             - (SELECT sum(qvx.w * newq.w) FROM qvx JOIN newq USING (term))
                             / ((SELECT sqrt(sum(w * w)) FROM qvx)
                                * (SELECT sqrt(sum(w * w)) FROM newq)) AS d),
            maxt AS (SELECT CASE WHEN d > {A.ROCCHIO_APP_MAX_DRIFT}
                                 THEN greatest(1, CAST(trunc({A.ROCCHIO_APP_MAX_TERMS}
                                      * {A.ROCCHIO_APP_MAX_DRIFT} / d) AS BIGINT))
                                 ELSE {A.ROCCHIO_APP_MAX_TERMS} END AS mt FROM drift),
            rcand AS (SELECT term, round(w, 9) AS w9 FROM newq
                      WHERE term NOT IN (SELECT term FROM qts)
                        AND w >= {A.ROCCHIO_APP_MIN_W}),
            rexp AS (SELECT term, rank FROM (
                       SELECT term,
                              CAST(row_number() OVER (ORDER BY w9 DESC, term) AS BIGINT) AS rank
                       FROM rcand) CROSS JOIN maxt WHERE rank <= maxt.mt),
            agg AS (SELECT count(*) AS ne,
                           coalesce(string_agg(term, ' ' ORDER BY rank), '') AS etxt
                    FROM rexp)
            SELECT '{_sq_raw}' AS original_query,
                   CASE WHEN agg.ne > 0 THEN '{_sq_raw}' || ' ' || agg.etxt
                        ELSE '{_sq_raw}' END AS expanded_query,
                   CAST(agg.ne AS BIGINT) AS n_expanded,
                   round(drift.d, 6) AS query_drift,
                   CAST(CASE WHEN drift.d > {A.ROCCHIO_APP_MAX_DRIFT} THEN 1 ELSE 0 END AS BIGINT) AS drift_warning
            FROM agg CROSS JOIN drift"""
    # query_analysis: stopword/protected/synonym machinery replicated
    # with the vendored tables embedded (functions/text_quality.py)
    from news_information_retrieval_system_ray.functions import text_quality as _TQ
    from news_information_retrieval_system_ray.functions.textnorm import normalize_text as _NORM
    _stop_vals = ", ".join(f"({s!r})" for s in sorted(_TQ._STOPS))
    _prot_vals = ", ".join(f"({p!r})" for p in sorted(_TQ._PROTECTED_NORM))
    _aq = A.ANALYSIS_QUERY
    query_analysis_sql = f"""
            WITH nq AS (SELECT trim(regexp_replace(replace(lower('{_aq}'), '臺', '台'),
                                                   '\\s+', ' ', 'g')) AS n),
            tl AS (SELECT string_split(n, ' ') AS toks FROM nq),
            terms AS (SELECT unnest(toks) AS term, generate_subscripts(toks, 1) AS pos FROM tl),
            stops(s) AS (VALUES {_stop_vals}),
            prot(p) AS (VALUES {_prot_vals}),
            cls AS (SELECT term, pos,
                           CASE WHEN replace(lower(term), '臺', '台') IN (SELECT p FROM prot) THEN 0
                                WHEN replace(lower(term), '臺', '台') IN (SELECT s FROM stops) THEN 1
                                ELSE 0 END AS lowinfo
                    FROM terms),
            sig AS (SELECT term, pos FROM cls WHERE lowinfo = 0),
            rem AS (SELECT term, pos FROM cls WHERE lowinfo = 1),
            signorm AS (SELECT replace(lower(term), '臺', '台') AS nt FROM sig),
            synmap(a, b, ai, bi) AS (VALUES {_syn_vals}),
            synhit AS (
              SELECT b AS term, sig.pos * 100000 + bi AS k
              FROM sig JOIN synmap ON a = sig.term
              WHERE replace(lower(b), '臺', '台') NOT IN (SELECT nt FROM signorm)
              UNION ALL
              SELECT b AS term, 100000000 + ai * 100 + bi AS k FROM synmap
              WHERE a NOT IN (SELECT term FROM sig) AND a != ''
                AND position(replace(lower(a), '臺', '台') IN (SELECT n FROM nq)) > 0
                AND replace(lower(b), '臺', '台') NOT IN (SELECT nt FROM signorm)),
            synord AS (SELECT term, min(k) AS k FROM synhit GROUP BY term)
            SELECT '{_aq}' AS raw_query,
                   (SELECT n FROM nq) AS normalized_query,
                   (SELECT CAST(count(*) AS BIGINT) FROM terms) AS term_count,
                   coalesce((SELECT string_agg(term, ' ' ORDER BY pos) FROM sig), '') AS significant_terms,
                   coalesce((SELECT string_agg(term, ' ' ORDER BY pos) FROM rem), '') AS removed_stopwords,
                   coalesce((SELECT string_agg(term, ' ' ORDER BY k) FROM synord), '') AS synonym_terms"""
    # bigram events of the fixed LM test texts, one <START> pad (n=2)
    ev_rows = []
    for tid, text in A.NGRAM_TEST_TEXTS.items():
        prev = "<START>"
        for w in text.split():
            ev_rows.append(f"('{tid}', '{prev}', '{w}')")
            prev = w
    ngram_ev = ", ".join(ev_rows)
    fieldweighted_sql = f"""
        WITH wnorm AS (SELECT doc_id, source, lang,
                              trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
                       FROM documents),
        wtl AS (SELECT doc_id, source, lang,
                       list_slice(string_split(t, ' '), 1, 5) AS title5,
                       string_split(t, ' ') AS alltoks
                FROM wnorm),
        wrows AS (
          SELECT doc_id, unnest(title5) AS term, 3 AS w FROM wtl
          UNION ALL SELECT doc_id, source, 1 FROM wtl
          UNION ALL SELECT doc_id, lang, 1 FROM wtl
          UNION ALL SELECT doc_id, unnest(alltoks), 1 FROM wtl),
        wft AS MATERIALIZED (SELECT doc_id, term, w FROM wrows
                WHERE regexp_matches(term, '[a-z0-9_]')),
        wtf AS MATERIALIZED (SELECT doc_id, term, CAST(sum(w) AS BIGINT) AS tf
                FROM wft GROUP BY doc_id, term),
        wdl AS MATERIALIZED (SELECT d.doc_id, greatest(1, coalesce(s.n, 0)) AS dl
               FROM documents d LEFT JOIN
                    (SELECT doc_id, sum(w) AS n FROM wft GROUP BY doc_id) s
                    ON d.doc_id = s.doc_id),
        wstats AS (SELECT (SELECT count(*) FROM documents) AS n,
                          (SELECT avg(dl) FROM wdl) AS avgdl),
        wdfs AS (SELECT term, count(*) AS df FROM wtf GROUP BY term),
        wq(qid, term) AS (VALUES {qv}),
        wcontrib AS (
          SELECT q.qid, wtf.doc_id,
                 ln((ws.n - wdfs.df + 0.5) / (wdfs.df + 0.5) + 1.0)
                 * (wtf.tf * 2.5)
                 / (wtf.tf + 1.5 * (1 - 0.75 + 0.75 * wdl.dl / ws.avgdl)) AS c
          FROM wtf
          JOIN wq q USING (term)
          JOIN wdfs USING (term)
          JOIN wdl ON wtf.doc_id = wdl.doc_id
          CROSS JOIN wstats ws),
        wsc AS (SELECT qid, doc_id, sum(c) AS score
                FROM wcontrib GROUP BY qid, doc_id),
        wranked AS (SELECT qid, doc_id, score,
                           row_number() OVER (PARTITION BY qid
                                              ORDER BY score DESC, doc_id) AS rank
                    FROM wsc)
        SELECT qid, rank, doc_id, round(score, 4) AS score
        FROM wranked WHERE rank <= 10 ORDER BY qid, rank"""
    search_serving_sql = _CTE + f""",
            qterms(qid, term) AS (VALUES {qv}),
            dfs AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
            contrib AS (
              SELECT q.qid, tf.doc_id,
                     ln((stats.n - dfs.df + 0.5) / (dfs.df + 0.5) + 1.0)
                     * (tf.tf * 2.5) / (tf.tf + 1.5 * (1 - 0.75 + 0.75 * dln.dl / stats.avgdl)) AS c
              FROM tf
              JOIN qterms q USING (term)
              JOIN dfs USING (term)
              JOIN dln ON tf.doc_id = dln.doc_id
              CROSS JOIN stats),
            scores AS (SELECT qid, doc_id, sum(c) AS score
                       FROM contrib GROUP BY qid, doc_id),
            fields AS (SELECT doc_id, source, lang,
                              list_slice(string_split(t, ' '), 1, 5) AS title5,
                              string_split(t, ' ') AS alltoks
                       FROM norm),
            boosts AS (SELECT q.qid, f.doc_id,
                round(least(1.5,
                  0.45 * least(count(DISTINCT q.term)
                               FILTER (list_contains(f.title5, q.term)), 3)
                + 0.25 * least(count(DISTINCT q.term)
                               FILTER (q.term = f.source), 3)
                + 0.18 * least(count(DISTINCT q.term)
                               FILTER (q.term = f.lang), 3)
                + 0.06 * least(count(DISTINCT q.term)
                               FILTER (list_contains(f.alltoks, q.term)), 3)), 6) AS boost
                FROM fields f CROSS JOIN qterms q
                GROUP BY q.qid, f.doc_id),
            adjusted AS (SELECT s.qid, s.doc_id,
                                s.score + coalesce(b.boost, 0) AS adj
                         FROM scores s LEFT JOIN boosts b
                              ON s.qid = b.qid AND s.doc_id = b.doc_id),
            filtered AS (SELECT a.* FROM adjusted a
                         JOIN documents d ON d.doc_id = a.doc_id
                         WHERE d.lang = 'en'),
            rankedv AS (SELECT qid, doc_id, adj,
                               row_number() OVER (PARTITION BY qid
                                                  ORDER BY adj DESC, doc_id) AS rank
                        FROM filtered),
            top AS (SELECT * FROM rankedv WHERE rank <= 5),
            matched AS (SELECT t2.qid, t2.doc_id,
                               string_agg(DISTINCT q.term, '|' ORDER BY q.term)
                                   AS matched_terms
                        FROM top t2
                        JOIN qterms q ON q.qid = t2.qid
                        JOIN tf ON tf.doc_id = t2.doc_id AND tf.term = q.term
                        GROUP BY t2.qid, t2.doc_id)
            SELECT t.qid, t.rank, t.doc_id, round(t.adj, 4) AS score,
                   coalesce(m.matched_terms, '') AS matched_terms
            FROM top t LEFT JOIN matched m
                 ON m.qid = t.qid AND m.doc_id = t.doc_id
            ORDER BY t.qid, t.rank"""
    rocchio_exp_cte = _CTE + f""",
            dfs AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
            idf AS (SELECT term, ln(1 + (stats.n - df + 0.5) / (df + 0.5)) AS idf
                    FROM dfs CROSS JOIN stats),
            wd AS MATERIALIZED (SELECT tf.doc_id, tf.term,
                                       (1 + log10(tf.tf)) * idf.idf AS w
                   FROM tf JOIN idf USING (term)),
            norms AS (SELECT doc_id, sqrt(sum(w * w)) AS nrm FROM wd GROUP BY doc_id),
            qterms(qid, term) AS (VALUES {qv}),
            qw AS (SELECT q.qid, q.term, idf.idf AS w FROM qterms q JOIN idf USING (term)),
            qnorm AS (SELECT qid, sqrt(sum(w * w)) AS qn FROM qw GROUP BY qid),
            tscores AS MATERIALIZED (SELECT qw.qid, wd.doc_id,
                               sum((wd.w / norms.nrm) * (qw.w / qnorm.qn)) AS score
                        FROM wd JOIN qw USING (term)
                        JOIN norms ON wd.doc_id = norms.doc_id
                        JOIN qnorm ON qw.qid = qnorm.qid
                        GROUP BY qw.qid, wd.doc_id),
            need AS (SELECT qid, count(*) AS n_terms FROM qterms GROUP BY qid),
            hitcount AS (SELECT q.qid, t.doc_id, count(DISTINCT t.term) AS hit
                         FROM (SELECT DISTINCT doc_id, term FROM tf) t
                         JOIN qterms q USING (term)
                         GROUP BY q.qid, t.doc_id),
            grades AS MATERIALIZED (SELECT h.qid, h.doc_id,
                              CASE WHEN h.hit = n.n_terms THEN 2 ELSE 1 END AS g
                       FROM hitcount h JOIN need n USING (qid)
                       WHERE 2 * h.hit >= n.n_terms),
            rel AS (SELECT qid, doc_id FROM grades WHERE g = 2),
            nrelc AS (SELECT qid, count(*) AS nr FROM rel GROUP BY qid),
            top10 AS (SELECT qid, doc_id FROM
                        (SELECT qid, doc_id,
                                row_number() OVER (PARTITION BY qid
                                                   ORDER BY score DESC, doc_id) AS rank
                         FROM tscores WHERE score > 0) WHERE rank <= 10),
            nonrel AS (SELECT t.qid, t.doc_id FROM top10 t
                       LEFT JOIN grades g
                            ON g.qid = t.qid AND g.doc_id = t.doc_id
                       WHERE g.doc_id IS NULL),
            nnonc AS (SELECT qid, count(*) AS nn FROM nonrel GROUP BY qid),
            dvec AS MATERIALIZED (SELECT wd.doc_id, wd.term, wd.w / norms.nrm AS v
                     FROM wd JOIN norms ON wd.doc_id = norms.doc_id),
            centr AS (SELECT r.qid, d.term,
                             0.75 * sum(d.v) / greatest(1, max(c.nr)) AS v
                      FROM rel r JOIN dvec d ON r.doc_id = d.doc_id
                                 JOIN nrelc c ON c.qid = r.qid
                      GROUP BY r.qid, d.term),
            centn AS (SELECT nr2.qid, d.term,
                             -0.15 * sum(d.v) / greatest(1, max(c.nn)) AS v
                      FROM nonrel nr2 JOIN dvec d ON nr2.doc_id = d.doc_id
                                      JOIN nnonc c ON c.qid = nr2.qid
                      GROUP BY nr2.qid, d.term),
            qhat AS (SELECT qw.qid, qw.term, 1.0 * qw.w / qnorm.qn AS v
                     FROM qw JOIN qnorm USING (qid)),
            qexp AS (SELECT qid, term, greatest(0.0, sum(v)) AS qv
                     FROM (SELECT * FROM qhat
                           UNION ALL SELECT * FROM centr
                           UNION ALL SELECT * FROM centn)
                     GROUP BY qid, term)"""
    d = {
        "field_boost_topk": field_boost_sql,
        "related_documents": related_sql,
        "search_suggestions": suggestions_sql,
        "expand_query": expand_query_sql,
        "query_analysis": query_analysis_sql,
        "explain_field_matrix": _CTE + f""",
            qterms(qid, term) AS (VALUES {qv}),
            fields AS (SELECT doc_id, source, lang,
                              list_slice(string_split(t, ' '), 1, 5) AS title5,
                              string_split(t, ' ') AS alltoks
                       FROM norm WHERE doc_id < 20),
            mat AS (SELECT q.qid, f.doc_id, fld.field, q.term,
                           CASE fld.field
                                WHEN 'title' THEN CASE WHEN list_contains(f.title5, q.term) THEN 1 ELSE 0 END
                                WHEN 'tags' THEN CASE WHEN q.term = f.source THEN 1 ELSE 0 END
                                WHEN 'category' THEN CASE WHEN q.term = f.lang THEN 1 ELSE 0 END
                                ELSE CASE WHEN list_contains(f.alltoks, q.term) THEN 1 ELSE 0 END
                           END AS matched
                    FROM fields f CROSS JOIN qterms q
                    CROSS JOIN (SELECT unnest(['title', 'tags', 'category', 'content']) AS field) fld)
            SELECT qid, doc_id, field, term, CAST(matched AS BIGINT) AS matched FROM mat""",
        "explain_coverage": _CTE + f""",
            qterms(qid, term, tpos) AS (VALUES {qv_pos}),
            fields AS (SELECT doc_id, source, lang,
                              list_slice(string_split(t, ' '), 1, 5) AS title5,
                              string_split(t, ' ') AS alltoks
                       FROM norm),
            cov AS (SELECT q.qid, f.doc_id, q.term, q.tpos,
                           CASE WHEN list_contains(f.title5, q.term) OR q.term = f.source
                                  OR q.term = f.lang OR list_contains(f.alltoks, q.term)
                                THEN 1 ELSE 0 END AS m
                    FROM fields f CROSS JOIN qterms q)
            SELECT qid, doc_id,
                   coalesce(string_agg(term, ' ' ORDER BY tpos) FILTER (m = 1), '') AS matched_terms,
                   coalesce(string_agg(term, ' ' ORDER BY tpos) FILTER (m = 0), '') AS missing_terms,
                   round(sum(m)::DOUBLE / count(*), 6) AS coverage_ratio
            FROM cov GROUP BY qid, doc_id""",
        "distinct_terms_hll": _CTE + f""",
            vocab AS (SELECT DISTINCT term FROM tf),
            hh AS (SELECT ('0x' || substr(md5(term), 1, 16))::UBIGINT AS hv FROM vocab),
            regs AS (SELECT CAST(hv >> {64 - _SK.HLL_P} AS BIGINT) AS bucket,
                            max(CASE WHEN hv % {1 << (64 - _SK.HLL_P)} = 0
                                     THEN {64 - _SK.HLL_P + 1}
                                     ELSE {64 - _SK.HLL_P + 1}
                                          - length(bin(hv % {1 << (64 - _SK.HLL_P)}))
                                END) AS rho
                     FROM hh GROUP BY 1),
            agg AS (SELECT count(*) AS nhit, sum(power(2.0, -rho)) AS s FROM regs),
            est AS (SELECT nhit,
                           {0.7213 / (1.0 + 1.079 / _SK.HLL_M) * _SK.HLL_M * _SK.HLL_M}::DOUBLE
                           / (s + ({_SK.HLL_M} - nhit)) AS e,
                           {_SK.HLL_M} - nhit AS v
                    FROM agg)
            SELECT CAST(nhit AS BIGINT) AS n_registers_hit,
                   round(CASE WHEN e <= {2.5 * _SK.HLL_M} AND v > 0
                              THEN {_SK.HLL_M} * ln({_SK.HLL_M}::DOUBLE / v)
                              ELSE e END, 4) AS estimate
            FROM est""",
        "term_counts_cms": _CTE + f""",
            cf AS (SELECT term, sum(tf) AS cf FROM tf GROUP BY term),
            rws AS (SELECT unnest([0, 1, 2, 3]) AS i),
            cells AS (SELECT r.i AS row_,
                             ('0x' || substr(md5(r.i || ':' || c.term), 1, 16))::UBIGINT % {_SK.CMS_W} AS cell,
                             sum(c.cf) AS cnt
                      FROM cf c CROSS JOIN rws r GROUP BY 1, 2),
            qt(term) AS (VALUES {cms_terms_vals}),
            est AS (SELECT q.term, min(coalesce(cl.cnt, 0)) AS est_count
                    FROM qt q CROSS JOIN rws r
                    LEFT JOIN cells cl ON cl.row_ = r.i
                         AND cl.cell = ('0x' || substr(md5(r.i || ':' || q.term), 1, 16))::UBIGINT % {_SK.CMS_W}
                    GROUP BY q.term)
            SELECT term, CAST(est_count AS BIGINT) AS est_count FROM est""",
        "vsm_topk": _CTE + f""",
            qterms(qid, term) AS (VALUES {qv}),
            dfs AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
            qn AS (SELECT qid, sqrt(count(*)::DOUBLE) AS nn
                   FROM (SELECT DISTINCT qid, term FROM qterms) GROUP BY qid),
            dw AS (SELECT tf.doc_id, tf.term,
                          (1 + log10(tf.tf)) * log10(stats.n::DOUBLE / dfs.df) AS w
                   FROM tf JOIN dfs USING (term) CROSS JOIN stats),
            dnorm AS (SELECT doc_id, sqrt(sum(w * w)) AS nn FROM dw GROUP BY doc_id),
            sc AS (SELECT q.qid, dw.doc_id,
                          sum((1.0 / qn.nn) * (dw.w / dnorm.nn)) AS score
                   FROM dw JOIN (SELECT DISTINCT qid, term FROM qterms) q USING (term)
                   JOIN qn ON q.qid = qn.qid
                   JOIN dnorm ON dw.doc_id = dnorm.doc_id
                   GROUP BY q.qid, dw.doc_id),
            ranked AS (SELECT qid, doc_id, score,
                              row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id) AS rank
                       FROM sc WHERE score > 0)
            SELECT qid, rank, doc_id, round(score, 4) AS score
            FROM ranked WHERE rank <= 10""",
        "search_serving": search_serving_sql,
        "fieldweighted_bm25": fieldweighted_sql,
        # bigram-LM perplexity under 4 smoothers (functions/ngram_lm.py
        # mirrors reference ngram.py:224-421); training counts are the
        # adjacent-pair / unigram aggregates over the filtered stream,
        # scoring is 2^(-mean log2 P) over events with P > 0
        "ngram_lm_perplexity": f"""
            WITH norm AS (
              SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
              FROM documents),
            fl AS (
              SELECT doc_id, list_filter(string_split(t, ' '),
                     x -> regexp_matches(x, '[a-z0-9_]')) AS toks
              FROM norm),
            seq AS (
              SELECT doc_id, unnest(toks) AS term, generate_subscripts(toks, 1) AS pos
              FROM fl WHERE len(toks) > 0),
            pairs AS (
              SELECT doc_id, term AS w2,
                     lag(term) OVER (PARTITION BY doc_id ORDER BY pos) AS w1
              FROM seq),
            bg AS (SELECT w1, w2, count(*) AS n_ab FROM pairs
                   WHERE w1 IS NOT NULL GROUP BY w1, w2),
            ctx AS (SELECT w1, sum(n_ab) AS n_ctx FROM bg GROUP BY w1),
            uni AS (SELECT term, count(*) AS cf FROM seq GROUP BY term),
            tot AS (SELECT (SELECT count(*) FROM seq) AS n_tok,
                           (SELECT count(*) FROM uni) AS v),
            ev(text_id, w1, w2) AS (VALUES {ngram_ev}),
            j AS (
              SELECT ev.text_id,
                     coalesce(bg.n_ab, 0) AS c_ng,
                     coalesce(ctx.n_ctx, 0) AS c_ctx,
                     coalesce(uni.cf * 1.0 / tot.n_tok, 1.0 / tot.v) AS p_c,
                     tot.v AS v
              FROM ev
              LEFT JOIN bg  ON ev.w1 = bg.w1 AND ev.w2 = bg.w2
              LEFT JOIN ctx ON ev.w1 = ctx.w1
              LEFT JOIN uni ON ev.w2 = uni.term
              CROSS JOIN tot),
            p AS (
              SELECT text_id, 'mle' AS smoothing,
                     CASE WHEN c_ctx > 0 THEN c_ng * 1.0 / c_ctx ELSE 0 END AS p
              FROM j
              UNION ALL
              SELECT text_id, 'laplace', (c_ng + 1.0) / (c_ctx + v) FROM j
              UNION ALL
              SELECT text_id, 'jm',
                     0.7 * (CASE WHEN c_ctx > 0 THEN c_ng * 1.0 / c_ctx ELSE 0 END)
                     + 0.3 * p_c
              FROM j
              UNION ALL
              SELECT text_id, 'dirichlet',
                     (c_ng + 2000.0 * p_c) / (c_ctx + 2000.0) FROM j),
            ppl AS (
              SELECT smoothing, text_id,
                     CASE WHEN count(*) FILTER (WHERE p > 0) = 0 THEN -1.0
                          ELSE pow(2.0, -avg(log2(nullif(p, 0))))
                     END AS perplexity
              FROM p GROUP BY smoothing, text_id)
            SELECT smoothing, text_id, round(perplexity, 4) AS perplexity
            FROM ppl""",
        "date_range_query": """
            SELECT o_orderkey FROM orders
            WHERE o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate <= TIMESTAMP '1997-12-31'
              AND o_orderstatus = 'F'
              AND NOT o_orderpriority = '1-URGENT'
            ORDER BY o_orderkey""",
        "doc_stats": _CTE + "SELECT doc_id, dl AS doc_len FROM dln",
        "term_stats": _CTE + """
            SELECT term, count(*) AS df, sum(tf)::BIGINT AS cf FROM tf GROUP BY term""",
        "postings_flat": _CTE + "SELECT term, doc_id, tf FROM tf",
        "corpus_stats": _CTE + """
            SELECT (SELECT count(*) FROM documents) AS n_docs,
                   (SELECT sum(dl)::BIGINT FROM dln) AS total_tokens,
                   (SELECT count(DISTINCT term) FROM ft) AS vocab_size,
                   round((SELECT sum(dl)::DOUBLE FROM dln) / (SELECT count(*) FROM documents), 4) AS avg_doc_len""",
        "bm25_topk": bm25_sql,
        "eval_pr_at_k": eval_pr_sql,
        "eval_pr_curve": pr_curve_base + """
            SELECT qid, rank, round(rc, 4) AS recall, round(pr, 4) AS precision
            FROM curve ORDER BY qid, rank""",
        "eval_interpolated_precision": pr_curve_base + """,
            lv AS (SELECT unnest(range(0, 11)) AS lvl)
            SELECT c.qid, round(l.lvl / 10.0, 4) AS recall_level,
                   round(coalesce(max(CASE WHEN c.rc >= l.lvl / 10.0
                                           THEN c.pr END), 0.0), 4) AS precision
            FROM curve c CROSS JOIN lv l
            GROUP BY c.qid, l.lvl ORDER BY qid, recall_level""",
        "eval_f_beta": pr_curve_base + """,
            kb AS (SELECT j.qid, kk.k,
                          sum(CASE WHEN j.rank <= kk.k THEN j.rel ELSE 0 END) AS hits
                   FROM jj j CROSS JOIN (VALUES (5), (10)) kk(k)
                   GROUP BY j.qid, kk.k),
            pr2 AS (SELECT kb.qid, kb.k, kb.hits * 1.0 / kb.k AS p,
                           kb.hits * 1.0 / n.n_rel AS r
                    FROM kb JOIN nrel n USING (qid))
            SELECT qid, k, b.beta,
                   round(CASE WHEN (b.beta * b.beta * p + r) > 0
                              THEN (1 + b.beta * b.beta) * p * r
                                   / (b.beta * b.beta * p + r)
                              ELSE 0.0 END, 4) AS f_beta
            FROM pr2 CROSS JOIN (VALUES (0.5), (2.0)) b(beta)
            ORDER BY qid, k, beta""",
        "eval_metrics": eval_metrics_sql,
        "bm25_wand_topk": bm25_sql,
        "bm25_sharded_topk": bm25_sql,
        "bm25_sharded_bulk": bm25_sql,
        "bm25_deleted_topk": bm25_deleted_sql,
        "bm25_compacted_topk": bm25_compacted_sql,
        "search_snippets": snippets_sql,
        "summarize_query_focused": qfocus_sql,
        "summarize_key_sentences": keysent_sql,
        "summarize_multidoc": multidoc_sql,
        "rake_keywords": rake_sql,
        "textrank_fixed_topk": _textrank_sql(30),
        # textrank_keywords is pinned to the same deterministic config
        # (tol=0, 30 iterations, rank on rounded score) -> same oracle
        "textrank_keywords": _textrank_sql(30),
        "term_star_clusters": _star_sql(150, threshold=0.3),
        "term_cooccurrence_clusters": _cooc_sql(100, 330),
        "doc_hac_fixed": _hac_sql(40, 6),
        # svo_triples: the declared fake parse (functions/svo.fake_parse:
        # token1=root verb, token0=nsubj, token2=dobj) + the reference
        # tree walk (parser.py:450-511) collapse to a pure per-doc
        # expression over the RAW whitespace split of text, so the
        # stubbed-parser pipeline is oracle-checkable end-to-end
        "svo_triples": """
            WITH lf AS (
              SELECT doc_id,
                     list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS tk
              FROM documents),
            t3 AS (SELECT doc_id, tk[1] AS subject, tk[2] AS verb,
                          CASE WHEN len(tk) >= 3 THEN tk[3] END AS object,
                          len(tk) AS n
                   FROM lf)
            SELECT doc_id, subject, verb, object,
                   CASE WHEN object IS NULL THEN 0.7 ELSE 1.0 END AS confidence
            FROM t3 WHERE n >= 2 ORDER BY doc_id LIMIT 200""",
        "cf_als_fixed": _als_sql(3, 0.1),
        "lda_fixed_topics": _lda_sql(3, 2, 5),
        "lda_fixed_doc_topics": _lda_sql(3, 2, 5, output="doc_topics"),
        "lda_fixed_perplexity": _lda_sql(3, 2, 5, output="perplexity"),
        "dedup_minhash": minhash_sql,
        "dedup_simhash": simhash_sql,
        "dedup_ngram_jaccard": ngram_jac_sql,
        # SimHash64 (MD5 token hash, tf-weighted bit votes) + winnowing
        # (k=5 rolling grams, window-4 mins, distinct) — functions/hashing
        # replicated bit-for-bit: token_hash64 is the FIRST 8 md5 bytes
        # big-endian == ('0x' || substr(md5(t),1,16))::UBIGINT
        "fingerprints": _CTE + """,
            tkl AS (SELECT doc_id,
                           list_filter(string_split(t, ' '),
                                       s -> s <> '' AND regexp_matches(s, '[a-z0-9_]')) AS tk
                    FROM norm),
            hsh AS (SELECT doc_id, tf,
                           ('0x' || substr(md5(term), 1, 16))::UBIGINT AS h
                    FROM tf),
            votes AS (SELECT doc_id, r.b,
                             sum(tf * (2 * ((h >> r.b) & 1)::BIGINT - 1)) AS v
                      FROM hsh CROSS JOIN range(0, 64) r(b)
                      GROUP BY doc_id, r.b),
            sim AS (SELECT doc_id,
                           bit_or(CASE WHEN v > 0 THEN (1::UBIGINT << b)
                                       ELSE 0::UBIGINT END)::UBIGINT AS simhash
                    FROM votes GROUP BY doc_id),
            nt AS (SELECT doc_id, tk, len(tk) AS n FROM tkl),
            short AS (SELECT doc_id,
                             ('0x' || substr(md5(array_to_string(tk, ' ')), 1, 16))::UBIGINT AS fp
                      FROM nt WHERE n > 0 AND n < 5),
            grams0 AS (SELECT doc_id, n - 4 AS m,
                              list_transform(range(0, n - 4),
                                  i -> ('0x' || substr(md5(array_to_string(tk[i+1:i+5], ' ')), 1, 16))::UBIGINT) AS hs
                       FROM nt WHERE n >= 5),
            gr AS (SELECT doc_id, m, unnest(hs) AS h, unnest(range(0, m)) AS i FROM grams0),
            slid AS (SELECT doc_id, i, m,
                            min(h) OVER (PARTITION BY doc_id ORDER BY i
                                         ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wm
                     FROM gr),
            fps AS (SELECT DISTINCT doc_id, wm AS fp FROM slid WHERE m > 4 AND i <= m - 4
                    UNION ALL
                    SELECT doc_id, min(h) AS fp FROM gr WHERE m <= 4 GROUP BY doc_id
                    UNION ALL
                    SELECT doc_id, fp FROM short),
            fstat AS (SELECT doc_id, count(DISTINCT fp)::BIGINT AS n_fingerprints,
                             min(fp) AS min_fingerprint
                      FROM fps GROUP BY doc_id)
            SELECT d.doc_id,
                   lower(lpad(to_hex(coalesce(s.simhash, 0::UBIGINT)), 16, '0')) AS simhash,
                   coalesce(f.n_fingerprints, 0)::BIGINT AS n_fingerprints,
                   lower(lpad(to_hex(coalesce(f.min_fingerprint, 0::UBIGINT)), 16, '0')) AS min_fingerprint
            FROM documents d LEFT JOIN sim s USING (doc_id)
                             LEFT JOIN fstat f USING (doc_id)
            ORDER BY d.doc_id""",
        # Rocchio PRF: tfidf top-5 as feedback -> q' = 1.0*q_hat +
        # 0.75*centroid(normalized fb doc vectors) -> rescore by
        # sum((1+log10 tf) * idf * q'[t]) — mirrors analytics.rocchio_topk
        "rocchio_topk": _CTE + f""",
            dfs AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
            idf AS (SELECT term, ln(1 + (stats.n - df + 0.5) / (df + 0.5)) AS idf
                    FROM dfs CROSS JOIN stats),
            wd AS (SELECT tf.doc_id, tf.term, (1 + log10(tf.tf)) * idf.idf AS w
                   FROM tf JOIN idf USING (term)),
            norms AS (SELECT doc_id, sqrt(sum(w * w)) AS nrm FROM wd GROUP BY doc_id),
            qterms(qid, term) AS (VALUES {qv}),
            qw AS (SELECT q.qid, q.term, idf.idf AS w FROM qterms q JOIN idf USING (term)),
            qnorm AS (SELECT qid, sqrt(sum(w * w)) AS qn FROM qw GROUP BY qid),
            tscores AS (SELECT qw.qid, wd.doc_id,
                               sum((wd.w / norms.nrm) * (qw.w / qnorm.qn)) AS score
                        FROM wd JOIN qw USING (term)
                        JOIN norms ON wd.doc_id = norms.doc_id
                        JOIN qnorm ON qw.qid = qnorm.qid
                        GROUP BY qw.qid, wd.doc_id),
            fb AS (SELECT qid, doc_id FROM
                     (SELECT qid, doc_id,
                             row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id) AS rank
                      FROM tscores WHERE score > 0)
                   WHERE rank <= 5),
            nfb AS (SELECT qid, count(*) AS nf FROM fb GROUP BY qid),
            dvec AS (SELECT wd.doc_id, wd.term, wd.w / norms.nrm AS v
                     FROM wd JOIN norms ON wd.doc_id = norms.doc_id
                     WHERE wd.doc_id IN (SELECT doc_id FROM fb)),
            cent AS (SELECT fb.qid, d.term, 0.75 * sum(d.v) / greatest(1, max(n.nf)) AS v
                     FROM fb JOIN dvec d ON fb.doc_id = d.doc_id
                             JOIN nfb n ON n.qid = fb.qid
                     GROUP BY fb.qid, d.term),
            qhat AS (SELECT qw.qid, qw.term, 1.0 * qw.w / qnorm.qn AS v
                     FROM qw JOIN qnorm USING (qid)),
            qexp AS (SELECT qid, term, sum(v) AS qv
                     FROM (SELECT * FROM qhat UNION ALL SELECT * FROM cent)
                     GROUP BY qid, term),
            rescore AS (SELECT e.qid, tf.doc_id,
                               sum((1 + log10(tf.tf)) * idf.idf * e.qv) AS score
                        FROM qexp e JOIN tf ON tf.term = e.term
                                    JOIN idf ON idf.term = e.term
                        GROUP BY e.qid, tf.doc_id),
            rr AS (SELECT qid, doc_id, round(score, 4) AS score,
                          row_number() OVER (PARTITION BY qid
                                             ORDER BY round(score, 4) DESC, doc_id) AS rank
                   FROM rescore)
            SELECT qid, rank, doc_id, score
            FROM rr WHERE rank <= 10 ORDER BY qid, rank""",
        "rocchio_explicit": rocchio_exp_cte + """,
            rescore AS (SELECT e.qid, tf.doc_id,
                               sum((1 + log10(tf.tf)) * idf.idf * e.qv) AS score
                        FROM qexp e JOIN tf ON tf.term = e.term
                                    JOIN idf ON idf.term = e.term
                        WHERE e.qv > 0
                        GROUP BY e.qid, tf.doc_id),
            rr AS (SELECT qid, doc_id, round(score, 4) AS score,
                          row_number() OVER (PARTITION BY qid
                                             ORDER BY round(score, 4) DESC,
                                                      doc_id) AS rank
                   FROM rescore)
            SELECT qid, rank, doc_id, score
            FROM rr WHERE rank <= 10 ORDER BY qid, rank""",
        "rocchio_expansion_terms": rocchio_exp_cte + """,
            qn1 AS (SELECT qid, sqrt(sum(v * v)) AS n1 FROM qhat GROUP BY qid),
            qn2 AS (SELECT qid, sqrt(sum(qv * qv)) AS n2 FROM qexp GROUP BY qid),
            qdot AS (SELECT h.qid, sum(h.v * e.qv) AS dot
                     FROM qhat h JOIN qexp e
                          ON e.qid = h.qid AND e.term = h.term
                     GROUP BY h.qid),
            maxt AS (SELECT q1.qid,
                            1.0 - d.dot / (q1.n1 * q2.n2) AS drift,
                            CASE WHEN 1.0 - d.dot / (q1.n1 * q2.n2) <= 0.7
                                 THEN 10
                                 ELSE greatest(1, CAST(floor(
                                      10 * 0.7 / (1.0 - d.dot / (q1.n1 * q2.n2)))
                                      AS INT)) END AS mt
                     FROM qn1 q1 JOIN qn2 q2 USING (qid)
                                 JOIN qdot d USING (qid)),
            candr AS (SELECT e.qid, e.term, e.qv,
                             row_number() OVER (PARTITION BY e.qid
                                                ORDER BY round(e.qv, 9) DESC,
                                                         e.term) AS rank
                      FROM qexp e LEFT JOIN qhat h
                           ON h.qid = e.qid AND h.term = e.term
                      WHERE h.term IS NULL AND round(e.qv, 9) >= 0.1)
            SELECT c.qid, c.rank, c.term, round(c.qv, 4) AS weight,
                   round(m.drift, 4) AS drift
            FROM candr c JOIN maxt m USING (qid)
            WHERE c.rank <= m.mt ORDER BY c.qid, c.rank""",

        "explain_scores": _CTE + bm25_rank_cte + """,
            top1 AS (SELECT qid, doc_id FROM ranked WHERE rank = 1),
            dfs2 AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
            bd AS (SELECT q.qid, t1.doc_id, q.term, tf.tf, dfs2.df,
                          ln((stats.n - dfs2.df + 0.5) / (dfs2.df + 0.5) + 1.0) AS idf,
                          ln((stats.n - dfs2.df + 0.5) / (dfs2.df + 0.5) + 1.0)
                          * (tf.tf * 2.5)
                          / (tf.tf + 1.5 * (1 - 0.75 + 0.75 * dln.dl / stats.avgdl)) AS c
                   FROM top1 t1
                   JOIN qterms q ON q.qid = t1.qid
                   JOIN tf ON tf.doc_id = t1.doc_id AND tf.term = q.term
                   JOIN dfs2 ON dfs2.term = q.term
                   JOIN dln ON dln.doc_id = t1.doc_id
                   CROSS JOIN stats),
            tot AS (SELECT qid, sum(c) AS total FROM bd GROUP BY qid)
            SELECT bd.qid, bd.doc_id, bd.term, bd.tf, bd.df,
                   round(bd.idf, 4) AS idf, round(bd.c, 4) AS contribution,
                   round(tot.total, 4) AS total_score
            FROM bd JOIN tot USING (qid) ORDER BY bd.qid, bd.term""",
        "ltr_train": ltr_train_sql,
        "ltr_rerank": ltr_rerank_sql,
        "ltr_features": _CTE + bm25_rank_cte + """,
            cand AS (SELECT q.qid, tf.doc_id, count(*) AS match_count,
                            min(dln.dl) AS doc_len
                     FROM tf JOIN qterms q USING (term)
                             JOIN dln USING (doc_id)
                     GROUP BY 1, 2),
            qtc AS (SELECT qid, count(*) AS qtc FROM qterms GROUP BY qid),
            feats AS (SELECT c.qid, c.doc_id, qtc.qtc AS query_term_count,
                             c.match_count,
                             round(coalesce(s.score, 0), 4) AS bm25_score,
                             c.doc_len,
                             CASE WHEN c.match_count = qtc.qtc THEN 2
                                  WHEN 2 * c.match_count >= qtc.qtc THEN 1
                                  ELSE 0 END AS grade
                      FROM cand c JOIN qtc USING (qid)
                      LEFT JOIN scores s ON s.qid = c.qid AND s.doc_id = c.doc_id)
            SELECT qid, doc_id, query_term_count, match_count, bm25_score,
                   doc_len, round(grade / 3.0, 6) AS label
            FROM feats ORDER BY qid, doc_id""",
        "tfidf_topk": _CTE + f""",
            dfs AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
            wd AS (SELECT tf.doc_id, tf.term,
                          (1 + log10(tf.tf)) * ln(1 + (stats.n - dfs.df + 0.5) / (dfs.df + 0.5)) AS w
                   FROM tf JOIN dfs USING (term) CROSS JOIN stats),
            norms AS (SELECT doc_id, sqrt(sum(w * w)) AS nrm FROM wd GROUP BY doc_id),
            qterms(qid, term) AS (VALUES {qv}),
            qw AS (SELECT q.qid, q.term,
                          (1 + log10(1)) * ln(1 + (stats.n - dfs.df + 0.5) / (dfs.df + 0.5)) AS w
                   FROM qterms q JOIN dfs USING (term) CROSS JOIN stats),
            qnorm AS (SELECT qid, sqrt(sum(w * w)) AS qn FROM qw GROUP BY qid),
            scores AS (SELECT qw.qid, wd.doc_id,
                              sum((wd.w / norms.nrm) * (qw.w / qnorm.qn)) AS score
                       FROM wd JOIN qw USING (term)
                       JOIN norms ON wd.doc_id = norms.doc_id
                       JOIN qnorm ON qw.qid = qnorm.qid
                       GROUP BY qw.qid, wd.doc_id),
            ranked AS (SELECT qid, doc_id, score,
                              row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id) AS rank
                       FROM scores WHERE score > 0)
            SELECT qid, rank, doc_id, round(score, 4) AS score FROM ranked WHERE rank <= 10""",
        "lm_dirichlet_topk": _CTE + f""",
            qterms(qid, term) AS (VALUES {qv}),
            cfs AS (SELECT term, sum(tf)::DOUBLE AS cf FROM tf GROUP BY term),
            tot AS (SELECT sum(tf)::DOUBLE AS t FROM tf),
            cands AS (SELECT DISTINCT q.qid, tf.doc_id FROM tf JOIN qterms q USING (term)),
            contrib AS (
              SELECT c.qid, c.doc_id,
                     ln((coalesce(tf.tf, 0) + {A.MU} * cfs.cf / tot.t) / (dln.dl + {A.MU})) AS s
              FROM cands c
              JOIN qterms q ON q.qid = c.qid
              JOIN cfs ON cfs.term = q.term
              LEFT JOIN tf ON tf.doc_id = c.doc_id AND tf.term = q.term
              JOIN dln ON dln.doc_id = c.doc_id
              CROSS JOIN tot),
            scores AS (SELECT qid, doc_id, sum(s) AS score FROM contrib GROUP BY qid, doc_id),
            ranked AS (SELECT qid, doc_id, score,
                              row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id) AS rank
                       FROM scores)
            SELECT qid, rank, doc_id, round(score, 4) AS score FROM ranked WHERE rank <= 10""",
        "lm_jm_topk": _CTE + f""",
            qterms(qid, term) AS (VALUES {qv}),
            cfs AS (SELECT term, sum(tf)::DOUBLE AS cf FROM tf GROUP BY term),
            tot AS (SELECT sum(tf)::DOUBLE AS t FROM tf),
            cands AS (SELECT DISTINCT q.qid, tf.doc_id FROM tf JOIN qterms q USING (term)),
            contrib AS (
              SELECT c.qid, c.doc_id,
                     ln({A.LAMBDA_JM} * coalesce(tf.tf, 0) / dln.dl
                        + (1 - {A.LAMBDA_JM}) * cfs.cf / tot.t) AS s
              FROM cands c
              JOIN qterms q ON q.qid = c.qid
              JOIN cfs ON cfs.term = q.term
              LEFT JOIN tf ON tf.doc_id = c.doc_id AND tf.term = q.term
              JOIN dln ON dln.doc_id = c.doc_id
              CROSS JOIN tot),
            scores AS (SELECT qid, doc_id, sum(s) AS score FROM contrib GROUP BY qid, doc_id),
            ranked AS (SELECT qid, doc_id, score,
                              row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id) AS rank
                       FROM scores)
            SELECT qid, rank, doc_id, round(score, 4) AS score FROM ranked WHERE rank <= 10""",
        "bim_topk": _CTE + f""",
            qterms(qid, term) AS (VALUES {qv}),
            dfs AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
            contrib AS (SELECT q.qid, tf.doc_id,
                               ln((stats.n - dfs.df + 0.5) / (dfs.df + 0.5)) AS w
                        FROM tf JOIN qterms q USING (term)
                        JOIN dfs USING (term) CROSS JOIN stats),
            scores AS (SELECT qid, doc_id, sum(w) AS score FROM contrib GROUP BY qid, doc_id),
            ranked AS (SELECT qid, doc_id, score,
                              row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id) AS rank
                       FROM scores)
            SELECT qid, rank, doc_id, round(score, 4) AS score FROM ranked WHERE rank <= 10""",
        "hybrid_rrf": _CTE + f""",
            qterms(qid, term) AS (VALUES {qv}),
            dfs AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
            bmcontrib AS (
              SELECT q.qid, tf.doc_id,
                     ln((stats.n - dfs.df + 0.5) / (dfs.df + 0.5) + 1.0)
                     * (tf.tf * 2.5) / (tf.tf + 1.5 * (1 - 0.75 + 0.75 * dln.dl / stats.avgdl)) AS c
              FROM tf JOIN qterms q USING (term) JOIN dfs USING (term)
              JOIN dln ON tf.doc_id = dln.doc_id CROSS JOIN stats),
            bmscores AS (SELECT qid, doc_id, sum(c) AS score FROM bmcontrib GROUP BY qid, doc_id),
            bmranked AS (SELECT qid, doc_id,
                                row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id) AS rank
                         FROM bmscores),
            wd AS (SELECT tf.doc_id, tf.term,
                          (1 + log10(tf.tf)) * ln(1 + (stats.n - dfs.df + 0.5) / (dfs.df + 0.5)) AS w
                   FROM tf JOIN dfs USING (term) CROSS JOIN stats),
            norms AS (SELECT doc_id, sqrt(sum(w * w)) AS nrm FROM wd GROUP BY doc_id),
            qw AS (SELECT q.qid, q.term,
                          (1 + log10(1)) * ln(1 + (stats.n - dfs.df + 0.5) / (dfs.df + 0.5)) AS w
                   FROM qterms q JOIN dfs USING (term) CROSS JOIN stats),
            qnorm AS (SELECT qid, sqrt(sum(w * w)) AS qn FROM qw GROUP BY qid),
            tfscores AS (SELECT qw.qid, wd.doc_id,
                                sum((wd.w / norms.nrm) * (qw.w / qnorm.qn)) AS score
                         FROM wd JOIN qw USING (term)
                         JOIN norms ON wd.doc_id = norms.doc_id
                         JOIN qnorm ON qw.qid = qnorm.qid
                         GROUP BY qw.qid, wd.doc_id),
            tfranked AS (SELECT qid, doc_id,
                                row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id) AS rank
                         FROM tfscores WHERE score > 0),
            fused AS (SELECT coalesce(b.qid, t.qid) AS qid,
                             coalesce(b.doc_id, t.doc_id) AS doc_id,
                             coalesce({A.RRF_W_BM25} / ({A.RRF_K0} + b.rank), 0)
                           + coalesce({A.RRF_W_TFIDF} / ({A.RRF_K0} + t.rank), 0) AS score
                      FROM (SELECT * FROM bmranked WHERE rank <= {A.RRF_DEPTH}) b
                      FULL OUTER JOIN (SELECT * FROM tfranked WHERE rank <= {A.RRF_DEPTH}) t
                           ON b.qid = t.qid AND b.doc_id = t.doc_id),
            final AS (SELECT qid, doc_id, score,
                             row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id) AS rank
                      FROM fused)
            SELECT qid, rank, doc_id, round(score, 4) AS score FROM final WHERE rank <= 10""",
        "fuzzy_match": _CTE + f"""
            SELECT DISTINCT doc_id FROM tf WHERE term IN (
              SELECT DISTINCT term FROM tf WHERE levenshtein(term, '{A.FUZZY_TERM}') <= 1)""",
        "fuzzy_expand": _CTE + f""",
            vocab AS (SELECT DISTINCT term FROM tf),
            d AS (SELECT term, levenshtein(term, '{A.FUZZY_EXPAND_TERM}') AS dist FROM vocab)
            SELECT term, CAST(dist AS BIGINT) AS dist FROM d
            WHERE dist <= {A.FUZZY_MAX_DIST}
            ORDER BY dist, term LIMIT {A.FUZZY_MAX_EXPANSIONS}""",
        "fuzzy_distance_groups": _CTE + f""",
            vocab AS (SELECT DISTINCT term FROM tf),
            d AS (SELECT term, levenshtein(term, '{A.FUZZY_EXPAND_TERM}') AS dist FROM vocab)
            SELECT CAST(dist AS BIGINT) AS dist, CAST(count(*) AS BIGINT) AS n_terms
            FROM d WHERE dist <= {A.FUZZY_MAX_DIST}
            GROUP BY dist ORDER BY dist""",
        "wildcard_match": _CTE + f""",
            ts AS (SELECT term, count(*) AS df FROM tf GROUP BY term)
            SELECT term, df FROM ts WHERE term LIKE '{A.WILDCARD_PREFIX}%'""",
        "facet_filtered_search": _CTE + f""",
            qterms(qid, term) AS (VALUES {qv}),
            dfs AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
            contrib AS (
              SELECT q.qid, tf.doc_id,
                     ln((stats.n - dfs.df + 0.5) / (dfs.df + 0.5) + 1.0)
                     * (tf.tf * 2.5) / (tf.tf + 1.5 * (1 - 0.75 + 0.75 * dln.dl / stats.avgdl)) AS c
              FROM tf JOIN qterms q USING (term) JOIN dfs USING (term)
              JOIN dln ON tf.doc_id = dln.doc_id CROSS JOIN stats),
            scores AS (SELECT qid, doc_id, sum(c) AS score FROM contrib GROUP BY qid, doc_id),
            filtered AS (SELECT s.* FROM scores s JOIN documents d ON s.doc_id = d.doc_id
                         WHERE d.lang = '{A.FACET_LANG}'),
            ranked AS (SELECT qid, doc_id, score,
                              row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id) AS rank
                       FROM filtered)
            SELECT qid, rank, doc_id, round(score, 4) AS score FROM ranked WHERE rank <= 10""",
        "boolean_and": _CTE + f"""
            SELECT doc_id FROM tf WHERE term IN ({", ".join(repr(t) for t in A.BOOL_AND)})
            GROUP BY doc_id HAVING count(DISTINCT term) = {len(set(A.BOOL_AND))}""",
        "boolean_and_not": _CTE + f""",
            inc AS (SELECT doc_id FROM tf WHERE term IN ({", ".join(repr(t) for t in A.BOOL_NOT[0])})
                    GROUP BY doc_id HAVING count(DISTINCT term) = {len(set(A.BOOL_NOT[0]))}),
            exc AS (SELECT DISTINCT doc_id FROM tf
                    WHERE term IN ({", ".join(repr(t) for t in A.BOOL_NOT[1])}))
            SELECT doc_id FROM inc WHERE doc_id NOT IN (SELECT doc_id FROM exc)""",
        "field_query": _CTE + f"""
            SELECT d.doc_id FROM documents d
            WHERE d.lang = '{A.FIELD_QUERY["lang"]}'
              AND d.source = '{A.FIELD_QUERY["source"]}'
              AND d.doc_id IN (SELECT doc_id FROM tf WHERE term = '{A.FIELD_QUERY["term"]}')""",
        "boolean_parsed": _CTE + """
            SELECT DISTINCT doc_id FROM tf
            WHERE term IN ('spark', 'vector')
              AND doc_id NOT IN (SELECT doc_id FROM tf WHERE term = 'dup')""",
        "phrase_match": _CTE + f"""
            SELECT doc_id FROM norm
            WHERE (' ' || t || ' ') LIKE '% {" ".join(A.PHRASE)} %'""",
        "corpus_build": _corpus_build_sql(),
        "corpus_build_stats": _corpus_stats_sql(),
        "corpus_invalid_reasons": _corpus_reasons_sql(),
        "clean_corpus": r"""
            SELECT doc_id, trim(regexp_replace(text, '\s+', ' ', 'g')) AS text_clean
            FROM documents
            WHERE trim(regexp_replace(text, '\s+', ' ', 'g')) <> ''""",
        "corpus_audit": _CTE + r""",
            cleaned AS (SELECT trim(regexp_replace(text, '\s+', ' ', 'g')) AS ct
                        FROM documents)
            SELECT (SELECT count(*) FROM documents) AS total_documents,
                   (SELECT count(*) FROM cleaned WHERE ct = '') AS empty_docs,
                   (SELECT min(n_chars) FROM documents) AS chars_min,
                   (SELECT max(n_chars) FROM documents) AS chars_max,
                   (SELECT round(avg(n_chars), 4) FROM documents) AS chars_mean,
                   (SELECT round(median(n_chars), 4) FROM documents) AS chars_median,
                   (SELECT min(dl) FROM dln) AS tokens_min,
                   (SELECT max(dl) FROM dln) AS tokens_max,
                   (SELECT round(avg(dl), 4) FROM dln) AS tokens_mean,
                   (SELECT round(median(dl), 4) FROM dln) AS tokens_median,
                   (SELECT count(DISTINCT md5(text)) FROM documents) AS unique_hashes,
                   (SELECT count(*) FROM documents)
                     - (SELECT count(DISTINCT md5(text)) FROM documents) AS duplicate_hashes""",
        "standardize_dates": """
            SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS date_std
            FROM orders""",
        "facet_source_counts": "SELECT source, count(*) AS n_docs FROM documents GROUP BY source",
        "feedback_top_queries": _FEEDBACK_CTE + """
            SELECT query, count(*) AS count, round(avg(latency), 6) AS avg_latency
            FROM log WHERE kind = 'search'
            GROUP BY query ORDER BY count DESC, query LIMIT 20""",
        "feedback_zero_results": _FEEDBACK_CTE + """
            SELECT query, model, count(*) AS count, max(ts) AS last_seen
            FROM log WHERE kind = 'search' AND result_count = 0
            GROUP BY query, model
            ORDER BY count DESC, last_seen DESC, query, model LIMIT 20""",
        "feedback_top_clicked": _FEEDBACK_CTE + """
            SELECT doc_id, query, model, count(*) AS clicks
            FROM log WHERE kind = 'click'
            GROUP BY doc_id, query, model
            ORDER BY clicks DESC, doc_id, query, model LIMIT 20""",
        "feedback_model_metrics": _FEEDBACK_CTE + """,
            s AS (SELECT model, count(*) AS searches,
                         round(avg(latency), 6) AS avg_latency,
                         CAST(sum(CASE WHEN result_count = 0 THEN 1 ELSE 0 END)
                              AS BIGINT) AS zero_results
                  FROM log WHERE kind = 'search' GROUP BY model),
            f AS (SELECT model,
                         CAST(sum(CASE WHEN kind = 'click' THEN 1 ELSE 0 END)
                              AS BIGINT) AS clicks,
                         CAST(sum(CASE WHEN kind = 'relevance' THEN 1 ELSE 0 END)
                              AS BIGINT) AS relevance_labels
                  FROM log WHERE kind <> 'search' GROUP BY model)
            SELECT model,
                   coalesce(s.searches, 0) AS searches,
                   coalesce(s.avg_latency, 0.0) AS avg_latency,
                   coalesce(s.zero_results, 0) AS zero_results,
                   coalesce(f.clicks, 0) AS clicks,
                   coalesce(f.relevance_labels, 0) AS relevance_labels,
                   CASE WHEN coalesce(s.searches, 0) > 0
                        THEN round(coalesce(f.clicks, 0) * 1.0 / s.searches, 6)
                        ELSE 0.0 END AS ctr,
                   CASE WHEN coalesce(s.searches, 0) > 0
                        THEN round(coalesce(s.zero_results, 0) * 1.0 / s.searches, 6)
                        ELSE 0.0 END AS zero_result_rate
            FROM s FULL OUTER JOIN f USING (model)
            ORDER BY searches DESC, model""",
        "feedback_relevance_dist": _FEEDBACK_CTE + """
            SELECT g.grade, CAST(coalesce(c.n, 0) AS BIGINT) AS count
            FROM (SELECT unnest(range(0, 4)) AS grade) g
            LEFT JOIN (SELECT grade, count(*) AS n FROM log
                       WHERE kind = 'relevance' GROUP BY grade) c USING (grade)
            ORDER BY g.grade""",
        "feedback_position_bias": _FEEDBACK_CTE + """,
            bk AS (SELECT CASE WHEN rank = 1 THEN 'rank_1'
                               WHEN rank <= 3 THEN 'rank_2_3'
                               WHEN rank <= 10 THEN 'rank_4_10'
                               ELSE 'rank_11_plus' END AS bucket,
                          CAST(sum(CASE WHEN kind = 'click' THEN 1 ELSE 0 END)
                               AS BIGINT) AS clicks,
                          CAST(sum(CASE WHEN kind = 'relevance' THEN 1 ELSE 0 END)
                               AS BIGINT) AS relevance
                   FROM log WHERE kind <> 'search' GROUP BY 1)
            SELECT b.bucket, CAST(coalesce(bk.clicks, 0) AS BIGINT) AS clicks,
                   CAST(coalesce(bk.relevance, 0) AS BIGINT) AS relevance
            FROM (VALUES ('rank_1'), ('rank_2_3'), ('rank_4_10'),
                         ('rank_11_plus'), ('unknown')) b(bucket)
            LEFT JOIN bk USING (bucket)""",
        "feedback_summary": _FEEDBACK_CTE + """
            SELECT
              (SELECT count(*) FROM log WHERE kind = 'search') AS total_searches,
              (SELECT count(*) FROM log WHERE kind = 'click') AS total_clicks,
              (SELECT count(*) FROM log WHERE kind = 'relevance')
                  AS total_relevance_labels,
              round((SELECT count(*) FROM log WHERE kind = 'click') * 1.0
                    / (SELECT count(*) FROM log WHERE kind = 'search'), 6) AS ctr,
              (SELECT CAST(coalesce(sum(count), 0) AS BIGINT) FROM (
                 SELECT count(*) AS count, max(ts) AS last_seen, query, model
                 FROM log WHERE kind = 'search' AND result_count = 0
                 GROUP BY query, model
                 ORDER BY count DESC, last_seen DESC, query, model
                 LIMIT 20)) AS zero_result_queries,
              (SELECT count(DISTINCT session_id) FROM log
               WHERE kind = 'search') AS unique_search_sessions,
              (SELECT count(DISTINCT session_id) FROM log
               WHERE kind <> 'search') AS unique_feedback_sessions,
              round((SELECT count(*) FROM log WHERE kind = 'search') * 1.0
                    / (SELECT count(DISTINCT session_id) FROM log
                       WHERE kind = 'search'), 6) AS searches_per_session,
              round((SELECT count(*) FROM log WHERE kind <> 'search') * 1.0
                    / (SELECT count(DISTINCT session_id) FROM log
                       WHERE kind <> 'search'), 6) AS feedback_per_session,
              round((SELECT sum(rank) * 1.0 FROM log WHERE kind = 'click')
                    / (SELECT count(*) FROM log WHERE kind = 'click'), 4)
                  AS average_clicked_rank""",
        # FacetFilter: AND of IN / STARTS_WITH / lexicographic RANGE /
        # numeric GTE / CONTAINS — each the vectorized pushdown form of
        # a FilterCondition branch (facet_filter.py:64-160)
        "taxonomy_normalize": _taxonomy_sql(),
        "structured_query_or": """
            SELECT doc_id, count(*) AS n_matched FROM (
              SELECT doc_id FROM documents WHERE lang = 'es'
              UNION ALL
              SELECT doc_id FROM documents WHERE source = 'src3')
            GROUP BY doc_id ORDER BY doc_id""",
        "document_detail": _CTE + """,
            dd AS (SELECT doc_id, text FROM documents WHERE doc_id < 15),
            sents AS (
              SELECT doc_id,
                     list_filter(list_transform(regexp_split_to_array(text, '[。！？.!?]'),
                                                s -> trim(s, ' ' || chr(9) || chr(10) || chr(13))),
                                 s -> s <> '') AS ss
              FROM dd),
            j AS (SELECT doc_id, array_to_string(ss[1:2], '。') AS summary FROM sents),
            kw AS (SELECT tf.doc_id, tf.term,
                          (1 + log10(tf.tf))
                          * ln(1 + (stats.n - dfs.df + 0.5) / (dfs.df + 0.5)) AS w
                   FROM tf
                   JOIN (SELECT term, count(*) AS df FROM tf GROUP BY term) dfs
                        USING (term)
                   CROSS JOIN stats
                   WHERE tf.doc_id < 15),
            kr AS (SELECT doc_id, term,
                          row_number() OVER (PARTITION BY doc_id
                                             ORDER BY round(w, 9) DESC, term) AS rank
                   FROM kw),
            kx AS (SELECT doc_id, string_agg(term, '|' ORDER BY rank) AS keywords
                   FROM kr WHERE rank <= 3 GROUP BY doc_id)
            SELECT d.doc_id,
                   CASE WHEN j.summary <> '' THEN 1 ELSE 0 END AS available,
                   j.summary, coalesce(kx.keywords, '') AS keywords
            FROM dd d LEFT JOIN j USING (doc_id) LEFT JOIN kx USING (doc_id)
            ORDER BY d.doc_id""",
        "facet_filter_multi": """
            SELECT doc_id, source, lang, n_chars FROM documents
            WHERE lang IN ('en', 'es')
              AND starts_with(source, 'src')
              AND source BETWEEN 'src0' AND 'src3'
              AND CAST(n_chars AS DOUBLE) >= 200.0
              AND contains(text, 'spark')
            ORDER BY doc_id""",
        "facet_lang_counts": "SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang",
        "top_terms": _CTE + """,
            ts AS (SELECT term, count(*) AS df, sum(tf)::BIGINT AS cf FROM tf GROUP BY term),
            ranked AS (SELECT term, df, cf,
                              row_number() OVER (ORDER BY cf DESC, term) AS rank FROM ts)
            SELECT rank, term, df, cf FROM ranked WHERE rank <= 20""",
        "per_source_top_terms": _CTE + """,
            st AS (SELECT n.source, tf.term, sum(tf.tf)::BIGINT AS cf
                   FROM tf JOIN norm n ON tf.doc_id = n.doc_id
                   GROUP BY n.source, tf.term),
            ranked AS (SELECT source, term, cf,
                              row_number() OVER (PARTITION BY source ORDER BY cf DESC, term) AS rank
                       FROM st)
            SELECT source, rank, term, cf FROM ranked WHERE rank <= 3""",
        "bigram_pmi": _CTE + """,
            arr AS (SELECT doc_id,
                           list_filter(string_split(t, ' '),
                                       x -> regexp_matches(x, '[a-z0-9_]')) AS a
                    FROM norm),
            tokpos AS (SELECT doc_id, unnest(a) AS w, generate_subscripts(a, 1) AS i
                       FROM arr),
            prs AS (SELECT p1.w AS w1, p2.w AS w2
                    FROM tokpos p1 JOIN tokpos p2
                         ON p1.doc_id = p2.doc_id AND p2.i = p1.i + 1),
            big AS (SELECT w1, w2, count(*) AS n_ab FROM prs GROUP BY w1, w2),
            npairs AS (SELECT count(*)::DOUBLE AS np FROM prs),
            uni AS (SELECT term, sum(tf)::DOUBLE AS cf FROM tf GROUP BY term),
            ntok AS (SELECT sum(tf)::DOUBLE AS nt FROM tf),
            scored AS (SELECT b.w1, b.w2, b.n_ab,
                              round(ln((b.n_ab / npairs.np)
                                       / ((u1.cf / ntok.nt) * (u2.cf / ntok.nt))), 4) AS pmi
                       FROM big b
                       JOIN uni u1 ON u1.term = b.w1
                       JOIN uni u2 ON u2.term = b.w2
                       CROSS JOIN npairs CROSS JOIN ntok
                       WHERE b.n_ab >= 5),
            ranked AS (SELECT *, row_number() OVER (ORDER BY pmi DESC, w1, w2) AS rank
                       FROM scored)
            SELECT rank, w1, w2, n_ab, pmi FROM ranked WHERE rank <= 20""",
        "substring_freq": _CTE + """,
            terms_cf AS (SELECT term, sum(tf)::BIGINT AS cf FROM tf GROUP BY term),
            grams AS (
              SELECT unnest(flatten(list_transform(range(2, 5),
                       n -> list_transform(range(0, greatest(0, length(term) - n::INT + 1)),
                                           i -> substr(term, i::INT + 1, n::INT))))) AS gram,
                     cf
              FROM terms_cf),
            counts AS (SELECT gram, sum(cf)::BIGINT AS cnt FROM grams
                       GROUP BY gram HAVING sum(cf) >= 5),
            ranked AS (SELECT gram, cnt,
                              row_number() OVER (ORDER BY cnt DESC, gram) AS rank
                       FROM counts)
            SELECT rank, gram, cnt FROM ranked WHERE rank <= 20""",
        # sentence-free unigram YAKE (Campos 2018 features over the
        # filtered token sequence; doc = one sentence) — positions via
        # generate_subscripts over the SAME filtered list the Ray
        # tokenizer produces, neighbors via lag/lead window
        "yake_unigram_topk": _YAKE_CTE + """
            SELECT doc_id, rank, term, round(score, 4) AS score
            FROM ranked WHERE rank <= 5""",
        "yake_phrase_topk": yake_phrase_sql,
        "yake_levdedup_topk": yake_levdedup_sql,
        "keyword_eval": _YAKE_CTE + """,
            ext AS (SELECT doc_id, term FROM ranked WHERE rank <= 5),
            gold AS (SELECT doc_id, term FROM (
                       SELECT doc_id, term,
                              row_number() OVER (PARTITION BY doc_id
                                                 ORDER BY tf DESC, term) AS g
                       FROM tstat) WHERE g <= 5),
            ecnt AS (SELECT doc_id, count(*)::DOUBLE AS ne FROM ext GROUP BY doc_id),
            gcnt AS (SELECT doc_id, count(*)::DOUBLE AS ng FROM gold GROUP BY doc_id),
            icnt AS (SELECT e.doc_id, count(*)::DOUBLE AS ni
                     FROM ext e JOIN gold g USING (doc_id, term) GROUP BY e.doc_id),
            dlen AS (SELECT doc_id, sum(tf)::DOUBLE AS nt FROM tstat GROUP BY doc_id),
            cov AS (SELECT t.doc_id, sum(t.tf)::DOUBLE AS ct
                    FROM tstat t JOIN ext USING (doc_id, term) GROUP BY t.doc_id),
            m AS (SELECT e.doc_id,
                         coalesce(i.ni, 0) / e.ne AS p,
                         coalesce(i.ni, 0) / g.ng AS r,
                         coalesce(c.ct, 0) / d.nt AS cv
                  FROM ecnt e JOIN gcnt g USING (doc_id)
                  LEFT JOIN icnt i USING (doc_id)
                  JOIN dlen d USING (doc_id)
                  LEFT JOIN cov c USING (doc_id))
            SELECT doc_id, round(p, 4) AS p_at_k, round(r, 4) AS r_at_k,
                   round(CASE WHEN p + r > 0 THEN 2 * p * r / (p + r)
                              ELSE 0 END, 4) AS f1,
                   round(cv, 4) AS coverage
            FROM m ORDER BY doc_id""",
        "csoundex_expand": _CTE + f""",
            vocab AS (SELECT DISTINCT term FROM tf
                      WHERE regexp_matches(term, '^[a-z]+$')),
            sims AS (SELECT term,
                            len(list_filter(
                                range(least(length(term), length('{A.CSOUNDEX_QUERY}'))),
                                i -> substr(term, i::INT + 1, 1)
                                     = substr('{A.CSOUNDEX_QUERY}', i::INT + 1, 1)
                            ))::DOUBLE
                            / greatest(length(term), length('{A.CSOUNDEX_QUERY}')) AS s
                     FROM vocab),
            ranked AS (SELECT term, round(s, 4) AS sim,
                              row_number() OVER (ORDER BY s DESC, term) AS rank
                       FROM sims WHERE s >= 0.72)
            SELECT rank, term, sim FROM ranked WHERE rank <= 8""",
        # CSoundex expansion (top-8, threshold .72, per query term) then
        # BM25 over the unioned expansion sets (search_service.py:397-411)
        "phonetic_search": _CTE + f""",
            qterms(qid, qterm) AS (VALUES {qv}),
            vocab AS (SELECT DISTINCT term FROM tf
                      WHERE regexp_matches(term, '^[a-z]+$')),
            sims AS (SELECT q.qterm, v.term,
                            len(list_filter(
                                range(least(length(v.term), length(q.qterm))),
                                i -> substr(v.term, i::INT + 1, 1)
                                     = substr(q.qterm, i::INT + 1, 1)
                            ))::DOUBLE
                            / greatest(length(v.term), length(q.qterm)) AS s
                     FROM (SELECT DISTINCT qterm FROM qterms) q
                     CROSS JOIN vocab v),
            exp8 AS (SELECT qterm, term FROM (
                       SELECT qterm, term, s,
                              row_number() OVER (PARTITION BY qterm
                                                 ORDER BY s DESC, term) AS rk
                       FROM sims WHERE s >= 0.72)
                     WHERE rk <= 8),
            expu AS (SELECT DISTINCT q.qid, e.term
                     FROM qterms q JOIN exp8 e ON q.qterm = e.qterm),
            dfs AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
            contrib AS (
              SELECT x.qid, tf.doc_id,
                     ln((stats.n - dfs.df + 0.5) / (dfs.df + 0.5) + 1.0)
                     * (tf.tf * 2.5) / (tf.tf + 1.5 * (1 - 0.75 + 0.75 * dln.dl / stats.avgdl)) AS c
              FROM tf
              JOIN expu x USING (term)
              JOIN dfs USING (term)
              JOIN dln ON tf.doc_id = dln.doc_id
              CROSS JOIN stats),
            scores AS (SELECT qid, doc_id, sum(c) AS score FROM contrib GROUP BY qid, doc_id),
            ranked AS (SELECT qid, doc_id, score,
                              row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id) AS rank
                       FROM scores)
            SELECT qid, rank, doc_id, round(score, 4) AS score FROM ranked WHERE rank <= 10""",
        "bigram_collocations": _CTE + """,
            arr AS (SELECT doc_id,
                           list_filter(string_split(t, ' '),
                                       x -> regexp_matches(x, '[a-z0-9_]')) AS a
                    FROM norm),
            tokpos AS (SELECT doc_id, unnest(a) AS w, generate_subscripts(a, 1) AS i
                       FROM arr),
            prs AS (SELECT p1.w AS w1, p2.w AS w2
                    FROM tokpos p1 JOIN tokpos p2
                         ON p1.doc_id = p2.doc_id AND p2.i = p1.i + 1),
            big AS (SELECT w1, w2, count(*) AS n_ab FROM prs GROUP BY w1, w2),
            npairs AS (SELECT count(*)::DOUBLE AS np FROM prs),
            uni AS (SELECT term, sum(tf)::DOUBLE AS cf FROM tf GROUP BY term),
            ntok AS (SELECT sum(tf)::DOUBLE AS nt FROM tf),
            cont AS (SELECT b.w1, b.w2, b.n_ab,
                            b.n_ab::DOUBLE AS n11,
                            greatest(0, u1.cf - b.n_ab) AS n12,
                            greatest(0, u2.cf - b.n_ab) AS n21,
                            greatest(0, npairs.np - u1.cf - u2.cf + b.n_ab) AS n22,
                            b.n_ab / npairs.np AS p_ab,
                            u1.cf / ntok.nt AS p_a, u2.cf / ntok.nt AS p_b,
                            npairs.np AS np, u1.cf AS cfa, u2.cf AS cfb
                     FROM big b
                     JOIN uni u1 ON u1.term = b.w1
                     JOIN uni u2 ON u2.term = b.w2
                     CROSS JOIN npairs CROSS JOIN ntok
                     WHERE b.n_ab >= 5),
            marg AS (SELECT *, n11 + n12 AS r1, n21 + n22 AS r2,
                            n11 + n21 AS c1, n12 + n22 AS c2,
                            n11 + n12 + n21 + n22 AS nn
                     FROM cont),
            ex AS (SELECT *, r1 * c1 / nn AS e11, r1 * c2 / nn AS e12,
                          r2 * c1 / nn AS e21, r2 * c2 / nn AS e22
                   FROM marg),
            scored AS (SELECT w1, w2, n_ab,
                round(2 * ((CASE WHEN n11 > 0 AND e11 > 0 THEN n11 * ln(n11 / e11) ELSE 0 END)
                         + (CASE WHEN n12 > 0 AND e12 > 0 THEN n12 * ln(n12 / e12) ELSE 0 END)
                         + (CASE WHEN n21 > 0 AND e21 > 0 THEN n21 * ln(n21 / e21) ELSE 0 END)
                         + (CASE WHEN n22 > 0 AND e22 > 0 THEN n22 * ln(n22 / e22) ELSE 0 END)), 4) AS llr,
                round((CASE WHEN e11 > 0 THEN (n11 - e11) * (n11 - e11) / e11 ELSE 0 END)
                    + (CASE WHEN e12 > 0 THEN (n12 - e12) * (n12 - e12) / e12 ELSE 0 END)
                    + (CASE WHEN e21 > 0 THEN (n21 - e21) * (n21 - e21) / e21 ELSE 0 END)
                    + (CASE WHEN e22 > 0 THEN (n22 - e22) * (n22 - e22) / e22 ELSE 0 END), 4) AS chi2,
                round((p_ab - p_a * p_b) / sqrt(p_ab / np), 4) AS t_score,
                round(2 * n11 / (cfa + cfb), 4) AS dice
                FROM ex),
            ranked AS (SELECT *, row_number() OVER (ORDER BY llr DESC, w1, w2) AS rank
                       FROM scored)
            SELECT rank, w1, w2, n_ab, llr, chi2, t_score, dice
            FROM ranked WHERE rank <= 20""",
        "facet_date_ranges": """
            SELECT strftime(o_orderdate, '%Y-%m') AS month,
                   count(*) AS n_orders, round(sum(o_totalprice), 4) AS revenue
            FROM orders GROUP BY 1 ORDER BY 1""",
        "browse_sort": """
            SELECT o_orderkey, o_custkey,
                   strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_date, o_totalprice
            FROM orders ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 100""",
        "events_sessionize": f"""
            WITH d AS (
              SELECT user_id, ts,
                     CASE WHEN lag(ts) OVER w IS NULL
                            OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > {A.SESSION_GAP_SEC} * 1000000
                          THEN 1 ELSE 0 END AS brk
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
            s AS (SELECT user_id, ts,
                         CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
                  FROM d)
            SELECT user_id, session_idx, count(*) AS n_events,
                   strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS start_ts,
                   epoch_us(max(ts)) - epoch_us(min(ts)) AS duration_us
            FROM s GROUP BY user_id, session_idx""",
        "events_windowed": """
            SELECT event_type,
                   strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
                   count(*) AS n_events,
                   count(DISTINCT user_id) AS n_users,
                   round(sum(value), 4) AS sum_value
            FROM events GROUP BY 1, 2""",
        "doc_quality": _CTE + """,
            q AS (SELECT doc_id, count(*) AS n_tokens, count(DISTINCT term) AS n_distinct,
                         count(*) FILTER (term IN ('the', 'a')) AS n_stop,
                         sum(length(term))::BIGINT AS sum_token_len
                  FROM ft GROUP BY doc_id)
            SELECT d.doc_id, coalesce(q.n_tokens, 0) AS n_tokens,
                   coalesce(q.n_distinct, 0) AS n_distinct,
                   coalesce(q.n_stop, 0) AS n_stop,
                   coalesce(q.sum_token_len, 0) AS sum_token_len
            FROM documents d LEFT JOIN q ON d.doc_id = q.doc_id""",
        "lang_id": _CTE + """,
            cj AS (SELECT doc_id,
                          len(regexp_extract_all(text, '[一-鿿]'))::DOUBLE AS cjk,
                          greatest(1, length(text))::DOUBLE AS nch
                   FROM documents),
            h AS (SELECT d.doc_id,
                         coalesce(sum(CASE WHEN term IN ('the','and','of','to','in','is','a','for','with','news') THEN 1 ELSE 0 END), 0)::DOUBLE AS en,
                         coalesce(sum(CASE WHEN term IN ('der','die','das','und','ist','nicht','mit','ein','zu') THEN 1 ELSE 0 END), 0)::DOUBLE AS de,
                         coalesce(sum(CASE WHEN term IN ('le','la','les','et','est','une','pour','dans','que') THEN 1 ELSE 0 END), 0)::DOUBLE AS fr,
                         coalesce(sum(CASE WHEN term IN ('el','los','las','es','una','para','con','por','como') THEN 1 ELSE 0 END), 0)::DOUBLE AS es
                  FROM documents d LEFT JOIN ft ON d.doc_id = ft.doc_id
                  GROUP BY d.doc_id),
            sc AS (SELECT h.doc_id, h.en / dln.dl AS en, h.de / dln.dl AS de,
                          h.fr / dln.dl AS fr, h.es / dln.dl AS es,
                          cj.cjk / cj.nch AS zhr
                   FROM h JOIN dln ON h.doc_id = dln.doc_id
                          JOIN cj ON h.doc_id = cj.doc_id)
            SELECT doc_id,
                   CASE WHEN zhr > 0.2 THEN 'zh'
                        WHEN en >= greatest(de, fr, es) THEN 'en'
                        WHEN de >= greatest(fr, es) THEN 'de'
                        WHEN fr >= es THEN 'fr'
                        ELSE 'es' END AS pred_lang,
                   round(CASE WHEN zhr > 0.2 THEN zhr
                              ELSE greatest(en, de, fr, es) END, 4) AS confidence
            FROM sc ORDER BY doc_id""",
        "ner_entities": _NER_CTE + """,
            noff AS (SELECT doc_id, term, pos,
                            CAST(coalesce(sum(length(term)) OVER (
                                     PARTITION BY doc_id ORDER BY pos
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING), 0)
                                 + (pos - 1) AS BIGINT) AS start_char
                     FROM nseq)
            SELECT o.doc_id, o.pos, o.start_char,
                   o.term AS ent_text, g.ent_type
            FROM noff o JOIN gaz g ON o.term = g.ent_text
            ORDER BY doc_id, pos""",
        "ner_type_stats": _NER_CTE + """,
            ent AS (SELECT o.term AS ent_text, g.ent_type
                    FROM nseq o JOIN gaz g ON o.term = g.ent_text)
            SELECT ent_type, count(*) AS n_entities,
                   count(DISTINCT ent_text) AS n_unique_texts,
                   round(100.0 * count(*) / (SELECT count(*) FROM ent), 4) AS pct
            FROM ent GROUP BY ent_type ORDER BY ent_type""",
        "ner_top_entities": _NER_CTE + """,
            cnt AS (SELECT g.ent_type, o.term AS ent_text, count(*) AS n
                    FROM nseq o JOIN gaz g ON o.term = g.ent_text
                    GROUP BY 1, 2),
            r AS (SELECT ent_type, ent_text, n,
                         row_number() OVER (PARTITION BY ent_type
                                            ORDER BY n DESC, ent_text ASC) AS rank
                  FROM cnt)
            SELECT ent_type, rank, ent_text, n FROM r WHERE rank <= 5
            ORDER BY ent_type, rank""",
        "dense_retrieval": _CTE + """,
            bkt AS (SELECT doc_id,
                           ('0x' || substr(md5(term), 1, 8))::BIGINT % 32 AS b,
                           CASE WHEN ('0x' || substr(md5(term), 9, 1))::BIGINT % 2 = 0
                                THEN 1 ELSE -1 END AS s
                    FROM ft),
            dvec AS (SELECT doc_id, b, sum(s)::DOUBLE AS v FROM bkt GROUP BY 1, 2),
            dnorm AS (SELECT doc_id, sqrt(sum(v * v)) AS nd FROM dvec
                      GROUP BY 1 HAVING sum(v * v) > 0),
            qterms(qid, term) AS (VALUES
              ('q1', 'spark'), ('q1', 'join'),
              ('q2', 'merge'), ('q2', 'sort'), ('q2', 'table'),
              ('q3', 'vector'), ('q3', 'window'), ('q3', 'batch'), ('q3', 'stream')),
            qbkt AS (SELECT qid,
                            ('0x' || substr(md5(term), 1, 8))::BIGINT % 32 AS b,
                            CASE WHEN ('0x' || substr(md5(term), 9, 1))::BIGINT % 2 = 0
                                 THEN 1 ELSE -1 END AS s
                     FROM qterms),
            qvec AS (SELECT qid, b, sum(s)::DOUBLE AS v FROM qbkt GROUP BY 1, 2),
            qnorm AS (SELECT qid, sqrt(sum(v * v)) AS nq FROM qvec GROUP BY 1),
            dots AS (SELECT q.qid, d.doc_id, sum(q.v * d.v) AS dot
                     FROM qvec q JOIN dvec d ON q.b = d.b GROUP BY 1, 2),
            scored AS (SELECT qn.qid, dn.doc_id,
                              round(coalesce(dt.dot, 0) / (qn.nq * dn.nd), 4) AS score
                       FROM qnorm qn CROSS JOIN dnorm dn
                       LEFT JOIN dots dt ON dt.qid = qn.qid AND dt.doc_id = dn.doc_id),
            rnk AS (SELECT qid, doc_id, score,
                           row_number() OVER (PARTITION BY qid
                                              ORDER BY score DESC, doc_id ASC) AS rank
                    FROM scored)
            SELECT qid, rank, doc_id, score FROM rnk WHERE rank <= 10
            ORDER BY qid, rank""",
        "keybert_keywords": keybert_sql,
        "summarize_leadk": """
            WITH sents AS (
              SELECT doc_id,
                     list_filter(list_transform(regexp_split_to_array(text, '[。！？.!?]'),
                                                s -> trim(s, ' ' || chr(9) || chr(10) || chr(13))),
                                 s -> s <> '') AS ss
              FROM documents),
            j AS (SELECT doc_id, array_to_string(ss[1:2], '。') AS summary FROM sents)
            SELECT doc_id, summary, length(summary)::BIGINT AS summary_len
            FROM j ORDER BY doc_id""",
        "token_counts": _CTE + """
            SELECT n.doc_id,
                   (SELECT count(*) FROM ft WHERE ft.doc_id = n.doc_id) AS n_ws_tokens,
                   len(regexp_extract_all(n.t, '[a-z0-9]{1,4}|[一-鿿]')) AS n_subword_tokens
            FROM norm n""",
        "dedup_exact": """
            SELECT md5(text) AS content_hash, min(doc_id) AS keeper_doc_id,
                   count(*) AS n_docs
            FROM documents GROUP BY md5(text)""",
        "train_split": f"""
            WITH b AS (SELECT doc_id,
                              CAST(('0x' || substr(md5('{CU.SPLIT_SALT}:' || CAST(doc_id AS VARCHAR)), 1, 16))::UBIGINT % 100 AS BIGINT) AS bucket
                       FROM documents)
            SELECT doc_id, bucket,
                   CASE WHEN bucket < {CU.SPLIT_TEST_LT} THEN 'test'
                        WHEN bucket < {CU.SPLIT_VAL_LT} THEN 'val'
                        ELSE 'train' END AS split
            FROM b""",
        "train_shuffle_head": f"""
            WITH keyed AS (SELECT doc_id,
                                  substr(md5('{CU.SHUFFLE_SEED}:' || CAST(doc_id AS VARCHAR)), 1, 16) AS key_hex
                           FROM documents),
            ranked AS (SELECT CAST(row_number() OVER (ORDER BY key_hex, doc_id) AS BIGINT) AS pos,
                              doc_id, key_hex FROM keyed)
            SELECT pos, doc_id, key_hex FROM ranked WHERE pos <= {CU.SHUFFLE_HEAD_K}""",
        "decontaminate": f"""
            WITH norm AS (
              SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
              FROM documents),
            nfl AS (
              SELECT doc_id, list_filter(string_split(t, ' '),
                     x -> regexp_matches(x, '[a-z0-9_]')) AS toks
              FROM norm),
            nseq AS (
              SELECT doc_id, unnest(toks) AS term, generate_subscripts(toks, 1) AS pos
              FROM nfl WHERE len(toks) > 0),
            sh AS (
              SELECT doc_id,
                     term || ' ' || lead(term, 1) OVER w || ' ' || lead(term, 2) OVER w AS g
              FROM nseq WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
              QUALIFY g IS NOT NULL),
            bench AS (SELECT DISTINCT g FROM sh
                      WHERE doc_id IN {CU.DECON_BENCH_DOC_IDS}),
            hits AS (SELECT s.doc_id, count(DISTINCT s.g) AS n_matched
                     FROM sh s JOIN bench USING (g) GROUP BY s.doc_id)
            SELECT doc_id, CAST(n_matched AS BIGINT) AS n_matched FROM hits""",
        "pack_sequences": _CTE + f""",
            cnt AS (SELECT d.doc_id, coalesce(c.n, 0) AS n
                    FROM documents d LEFT JOIN
                         (SELECT doc_id, count(*) AS n FROM ft GROUP BY doc_id) c
                         ON d.doc_id = c.doc_id),
            cum AS (SELECT doc_id, n,
                           coalesce(sum(n) OVER (ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
                    FROM cnt)
            SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
                   CAST(cb // {CU.PACK_SEQ_TOKENS} AS BIGINT) AS seq_id
            FROM cum""",
        "llm_corpus_pipeline": _CTE + f""",
            cnt AS (SELECT doc_id, count(*) AS n, count(DISTINCT term) AS nd
                    FROM ft GROUP BY doc_id),
            k AS (SELECT md5(text) AS h, min(doc_id) AS keeper
                  FROM documents GROUP BY md5(text)),
            curated AS (
              SELECT d.doc_id, CAST(coalesce(c.n, 0) AS BIGINT) AS n_tokens
              FROM documents d JOIN k ON md5(d.text) = k.h
              LEFT JOIN cnt c ON d.doc_id = c.doc_id
              WHERE d.doc_id = k.keeper AND d.lang = '{CU.CURATE_LANG}'
                AND coalesce(c.n, 0) >= {CU.CURATE_MIN_TOKENS}
                AND coalesce(c.n, 0) <= {CU.CURATE_MAX_TOKENS}
                AND {CU.CURATE_LOWQ_NUM} * coalesce(c.nd, 0) >= coalesce(c.n, 0)),
            nfl AS (SELECT doc_id, list_filter(string_split(t, ' '),
                           x -> regexp_matches(x, '[a-z0-9_]')) AS toks
                    FROM norm),
            nseq AS (SELECT doc_id, unnest(toks) AS term,
                            generate_subscripts(toks, 1) AS pos
                     FROM nfl WHERE len(toks) > 0),
            sh AS (SELECT doc_id,
                          term || ' ' || lead(term, 1) OVER w || ' ' || lead(term, 2) OVER w AS g
                   FROM nseq WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
                   QUALIFY g IS NOT NULL),
            bench AS (SELECT DISTINCT g FROM sh
                      WHERE doc_id IN {CU.DECON_BENCH_DOC_IDS}),
            contaminated AS (SELECT DISTINCT s.doc_id FROM sh s JOIN bench USING (g)),
            prs AS (SELECT doc_id, term AS w2,
                           lag(term) OVER (PARTITION BY doc_id ORDER BY pos) AS w1
                    FROM nseq),
            bg AS (SELECT w1, w2, count(*) AS n_ab FROM prs
                   WHERE w1 IS NOT NULL GROUP BY w1, w2),
            ctx AS (SELECT w1, sum(n_ab) AS n_ctx FROM bg GROUP BY w1),
            tot AS (SELECT count(DISTINCT term) AS v FROM nseq),
            evp AS (SELECT doc_id, coalesce(w1, '<START>') AS w1, w2 FROM prs),
            jp AS (SELECT evp.doc_id,
                          (coalesce(bg.n_ab, 0) + 1.0)
                          / (coalesce(ctx.n_ctx, 0) + tot.v) AS p
                   FROM evp LEFT JOIN bg ON evp.w1 = bg.w1 AND evp.w2 = bg.w2
                   LEFT JOIN ctx ON evp.w1 = ctx.w1 CROSS JOIN tot),
            highppl AS (SELECT doc_id FROM (
                          SELECT doc_id, pow(2.0, -avg(log2(p))) AS ppl
                          FROM jp GROUP BY doc_id)
                        WHERE ppl > {CU.PPL_THRESHOLD}),
            kept AS (SELECT cu.doc_id, cu.n_tokens,
                            CASE WHEN ('0x' || substr(md5('{CU.SPLIT_SALT}:' || CAST(cu.doc_id AS VARCHAR)), 1, 16))::UBIGINT % 100 < {CU.SPLIT_TEST_LT} THEN 'test'
                                 WHEN ('0x' || substr(md5('{CU.SPLIT_SALT}:' || CAST(cu.doc_id AS VARCHAR)), 1, 16))::UBIGINT % 100 < {CU.SPLIT_VAL_LT} THEN 'val'
                                 ELSE 'train' END AS split
                     FROM curated cu
                     WHERE cu.doc_id NOT IN (SELECT doc_id FROM contaminated)
                       AND cu.doc_id NOT IN (SELECT doc_id FROM highppl)),
            packed AS (SELECT doc_id, split, n_tokens,
                              coalesce(sum(n_tokens) OVER (PARTITION BY split ORDER BY doc_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
                       FROM kept)
            SELECT doc_id, split, n_tokens,
                   CAST(cb // {CU.PACK_SEQ_TOKENS} AS BIGINT) AS seq_id
            FROM packed""",
        "perplexity_filter": f"""
            WITH norm AS (
              SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
              FROM documents),
            fl AS (
              SELECT doc_id, list_filter(string_split(t, ' '),
                     x -> regexp_matches(x, '[a-z0-9_]')) AS toks
              FROM norm),
            seq AS (
              SELECT doc_id, unnest(toks) AS term, generate_subscripts(toks, 1) AS pos
              FROM fl WHERE len(toks) > 0),
            pairs AS (
              SELECT doc_id, term AS w2,
                     lag(term) OVER (PARTITION BY doc_id ORDER BY pos) AS w1
              FROM seq),
            bg AS (SELECT w1, w2, count(*) AS n_ab FROM pairs
                   WHERE w1 IS NOT NULL GROUP BY w1, w2),
            ctx AS (SELECT w1, sum(n_ab) AS n_ctx FROM bg GROUP BY w1),
            tot AS (SELECT count(DISTINCT term) AS v FROM seq),
            ev AS (SELECT doc_id, coalesce(w1, '<START>') AS w1, w2 FROM pairs),
            j AS (SELECT ev.doc_id,
                         (coalesce(bg.n_ab, 0) + 1.0)
                         / (coalesce(ctx.n_ctx, 0) + tot.v) AS p
                  FROM ev LEFT JOIN bg ON ev.w1 = bg.w1 AND ev.w2 = bg.w2
                  LEFT JOIN ctx ON ev.w1 = ctx.w1 CROSS JOIN tot),
            ppl AS (SELECT doc_id, pow(2.0, -avg(log2(p))) AS ppl
                    FROM j GROUP BY doc_id)
            SELECT doc_id, round(ppl, 4) AS ppl,
                   CAST(CASE WHEN ppl > {CU.PPL_THRESHOLD} THEN 1 ELSE 0 END AS BIGINT) AS high_ppl
            FROM ppl""",
        "stratified_sample": f"""
            WITH keyed AS (SELECT source, doc_id,
                                  substr(md5('{CU.SPLIT_SALT}:' || CAST(doc_id AS VARCHAR)), 1, 16) AS skey
                           FROM documents),
            ranked AS (SELECT source, doc_id, skey,
                              row_number() OVER (PARTITION BY source ORDER BY skey, doc_id) AS rn
                       FROM keyed)
            SELECT source, doc_id, skey FROM ranked WHERE rn <= {CU.STRATA_N}""",
        "source_mix_sample": f"""
            WITH rates(src, cut) AS (VALUES {", ".join(f"({s!r}, {int(r * CU.MIX_SCALE)})" for s, r in CU.MIX_RATES.items())})
            SELECT d.doc_id, d.source,
                   CAST(CASE WHEN ('0x' || substr(md5('{CU.MIX_SALT}:' || CAST(d.doc_id AS VARCHAR)), 1, 16))::UBIGINT % {CU.MIX_SCALE}
                             < coalesce(r.cut, {int(CU.MIX_DEFAULT_RATE * CU.MIX_SCALE)})
                        THEN 1 ELSE 0 END AS BIGINT) AS keep
            FROM documents d LEFT JOIN rates r ON d.source = r.src""",
        "corpus_curate": _CTE + f""",
            cnt AS (SELECT doc_id, count(*) AS n, count(DISTINCT term) AS nd
                    FROM ft GROUP BY doc_id),
            k AS (SELECT md5(text) AS h, min(doc_id) AS keeper
                  FROM documents GROUP BY md5(text))
            SELECT d.doc_id, CAST(coalesce(c.n, 0) AS BIGINT) AS n_tokens,
                   CASE WHEN d.doc_id != k.keeper THEN 'drop_dup'
                        WHEN d.lang != '{CU.CURATE_LANG}' THEN 'drop_lang'
                        WHEN coalesce(c.n, 0) < {CU.CURATE_MIN_TOKENS} THEN 'drop_short'
                        WHEN coalesce(c.n, 0) > {CU.CURATE_MAX_TOKENS} THEN 'drop_long'
                        WHEN {CU.CURATE_LOWQ_NUM} * coalesce(c.nd, 0) < coalesce(c.n, 0) THEN 'drop_lowq'
                        ELSE 'keep' END AS status
            FROM documents d JOIN k ON md5(d.text) = k.h
            LEFT JOIN cnt c ON d.doc_id = c.doc_id""",
        "dedup_embedding_lsh": _dedup_embedding_lsh_sql(),
        "dedup_embedding": """
            WITH sims AS (
              SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                     list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                            CAST(b.embedding AS DOUBLE[])) AS c
              FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id)
            SELECT id_a, id_b, round(c, 4) AS cos FROM sims
            WHERE c >= 0.45 ORDER BY id_a, id_b""",
        "ann_topk": """
            WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 5),
            sims AS (SELECT q.qid, e.vec_id,
                            list_cosine_similarity(CAST(q.qe AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])) AS score
                     FROM q CROSS JOIN embeddings e),
            ranked AS (SELECT qid, vec_id, score,
                              row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rank
                       FROM sims)
            SELECT qid, rank, vec_id, round(score, 4) AS score FROM ranked WHERE rank <= 10""",
        # LSH ANN end-to-end: the seeded LshSignStage plane matrix (4
        # tables x 8 planes x 64 dims, default_rng(99)) is embedded as
        # literals; buckets = sign-bit packing + (t << 9) table offset;
        # probe set = the 5 query buckets plus every 1-bit flip
        # (multiprobe=1); candidates = rows sharing ANY probe bucket
        # (GLOBAL set, shared across queries — lsh_topk filters once);
        # exact cosine top-10 over the candidate set
        "ann_lsh": _ann_lsh_sql(),
        # the bucketed LAYOUT path computes the identical result through
        # hive-partition pruning (unit-pinned equal to the scan path), so
        # it shares the scan path's oracle
        "ann_lsh_bucketed": _ann_lsh_sql(),
        # distributed k-means, 8 seeded Lloyd iterations unrolled in SQL
        "embedding_kmeans": _kmeans_sql(),
        "bertopic_topics": _bertopic_cte() + """
            SELECT topic, rank, term AS word, round(w, 4) AS score
            FROM branked WHERE rank <= 10 ORDER BY topic, rank""",
        "bertopic_topic_info": _bertopic_cte() + """,
            bsizes AS (SELECT topic, count(*) AS size
                       FROM topicof GROUP BY topic),
            bnames AS (SELECT topic, string_agg(term, '_' ORDER BY rank) AS nm
                       FROM branked WHERE rank <= 4 GROUP BY topic)
            SELECT s.topic, s.size,
                   CAST(s.topic AS VARCHAR) || '_' || n.nm AS name
            FROM bsizes s JOIN bnames n USING (topic) ORDER BY s.topic""",
        "bertopic_doc_topics": _bertopic_cte() + """
            SELECT doc_id, topic, round(d2, 4) AS dist2
            FROM topicof ORDER BY doc_id""",
        "bertopic_repr_docs": _bertopic_cte() + """
            SELECT topic, rank, doc_id FROM (
              SELECT topic, doc_id,
                     row_number() OVER (PARTITION BY topic
                                        ORDER BY d2, doc_id) AS rank
              FROM topicof) WHERE rank <= 3 ORDER BY topic, rank""",
        "bertopic_find_topics": _bertopic_cte() + """,
            bq(term) AS (VALUES ('spark'), ('window'), ('merge')),
            bfind AS (SELECT q.term AS query_term, s.topic, s.w,
                             row_number() OVER (PARTITION BY q.term
                                                ORDER BY s.w DESC, s.topic) AS rank
                      FROM bq q JOIN bsc s ON s.term = q.term)
            SELECT query_term, rank, topic, round(w, 4) AS score
            FROM bfind WHERE rank <= 3 ORDER BY query_term, rank""",
        "bertopic_reduced_topics": _bertopic_reduce_sql(2),
        "cluster_topic_cards": _cluster_centroid_cte() + """,
            labels AS (SELECT topic,
                              string_agg(term, ' / ' ORDER BY rank) AS label
                       FROM crank WHERE rank <= 3 GROUP BY topic)
            SELECT c.topic AS cluster_id, s.size, l.label, c.rank, c.term,
                   round(c.w, 4) AS weight
            FROM crank c JOIN sizes2 s USING (topic)
                         JOIN labels l USING (topic)
            WHERE c.rank <= 8 ORDER BY cluster_id, rank""",
        "cluster_representatives": _cluster_centroid_cte() + """,
            cn AS (SELECT topic, sqrt(sum(w * w)) AS nrm
                   FROM centw GROUP BY topic),
            dotv AS (SELECT w.doc_id, tp.topic, sum(w.w * c.w) AS dw
                     FROM wn w JOIN topicof tp USING (doc_id)
                     JOIN centw c ON c.topic = tp.topic AND c.term = w.term
                     GROUP BY w.doc_id, tp.topic),
            dn2 AS (SELECT doc_id, sqrt(sum(w * w)) AS nd
                    FROM wn GROUP BY doc_id),
            sims AS (SELECT d.doc_id, d.topic, d.dw / (n.nd * c.nrm) AS sim
                     FROM dotv d JOIN dn2 n USING (doc_id)
                     JOIN cn c ON c.topic = d.topic
                     WHERE d.dw > 0),
            srank AS (SELECT topic, doc_id, sim,
                             row_number() OVER (PARTITION BY topic
                                                ORDER BY round(sim, 9) DESC,
                                                         doc_id) AS rank
                      FROM sims)
            SELECT topic AS cluster_id, rank, doc_id, round(sim, 4) AS similarity
            FROM srank WHERE rank <= 6 ORDER BY cluster_id, rank""",
        # IVF ANN: unrolled-kmeans quantizer + nprobe-union + cosine rerank
        "ann_ivf": _ann_ivf_sql(),
        "index_audit": _CTE + """
            SELECT 1::BIGINT AS ok,
                   (SELECT count(*) FROM documents)::BIGINT AS n_docs,
                   (SELECT count(*) FROM tf)::BIGINT AS postings""",
        "embedding_nn_within_label": """
            WITH sims AS (SELECT a.vec_id, b.vec_id AS nn_vec_id,
                                 list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) AS score
                          FROM embeddings a JOIN embeddings b
                               ON a.label = b.label AND a.vec_id <> b.vec_id),
            ranked AS (SELECT vec_id, nn_vec_id, score,
                              row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, nn_vec_id) AS rn
                       FROM sims)
            SELECT vec_id, nn_vec_id, round(score, 4) AS score FROM ranked WHERE rn = 1""",
        "cf_item_similar": """
            WITH inter AS (
              SELECT user_id, CAST(regexp_extract(props, '[0-9]+') AS BIGINT) AS item,
                     sum(value) AS r
              FROM events GROUP BY 1, 2),
            nrm AS (SELECT item, sqrt(sum(r * r)) AS n FROM inter GROUP BY item),
            dots AS (SELECT a.item AS i, b.item AS j, sum(a.r * b.r) AS dot
                     FROM inter a JOIN inter b
                          ON a.user_id = b.user_id AND a.item <> b.item
                     GROUP BY 1, 2),
            sims AS (SELECT i AS item, j AS other_item,
                            round(dot / (na.n * nb.n), 6) AS sim
                     FROM dots JOIN nrm na ON na.item = i
                               JOIN nrm nb ON nb.item = j),
            ranked AS (SELECT item, other_item, sim,
                              row_number() OVER (PARTITION BY item
                                                 ORDER BY sim DESC, other_item) AS rank
                       FROM sims WHERE sim >= 0.1)
            SELECT item, rank, other_item, round(sim, 4) AS sim
            FROM ranked WHERE rank <= 5 ORDER BY item, rank""",
        "cf_user_recs": """
            WITH inter AS (
              SELECT user_id, CAST(regexp_extract(props, '[0-9]+') AS BIGINT) AS item,
                     sum(value) AS r
              FROM events GROUP BY 1, 2),
            unrm AS (SELECT user_id, sqrt(sum(r * r)) AS n FROM inter GROUP BY user_id),
            udots AS (SELECT a.user_id AS u, b.user_id AS v, sum(a.r * b.r) AS dot
                      FROM inter a JOIN inter b
                           ON a.item = b.item AND a.user_id <> b.user_id
                      GROUP BY 1, 2),
            usims AS (SELECT u, v, round(dot / (na.n * nb.n), 6) AS sim
                      FROM udots JOIN unrm na ON na.user_id = u
                                 JOIN unrm nb ON nb.user_id = v),
            nbr AS (SELECT u, v, sim FROM (
                      SELECT u, v, sim,
                             row_number() OVER (PARTITION BY u ORDER BY sim DESC, v) AS rn
                      FROM usims WHERE sim >= 0.1) WHERE rn <= 20),
            contrib AS (SELECT n.u AS user_id, i.item,
                               sum(n.sim * i.r) AS num, sum(n.sim) AS den
                        FROM nbr n JOIN inter i ON i.user_id = n.v
                        GROUP BY 1, 2),
            unseen AS (SELECT c.user_id, c.item, c.num / c.den AS score
                       FROM contrib c LEFT JOIN inter s
                            ON s.user_id = c.user_id AND s.item = c.item
                       WHERE s.item IS NULL AND c.den > 0),
            ranked AS (SELECT user_id, item, score,
                              row_number() OVER (PARTITION BY user_id
                                                 ORDER BY round(score, 6) DESC, item) AS rank
                       FROM unseen)
            SELECT user_id, rank, item, round(score, 4) AS score
            FROM ranked WHERE rank <= 5 ORDER BY user_id, rank""",
        "recommend_similar": _CTE + """,
            dfs AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
            wd AS (SELECT tf.doc_id, tf.term,
                          (1 + log10(tf.tf)) * ln(1 + (stats.n - dfs.df + 0.5) / (dfs.df + 0.5)) AS w
                   FROM tf JOIN dfs USING (term) CROSS JOIN stats),
            norms AS (SELECT doc_id, sqrt(sum(w * w)) AS nrm FROM wd GROUP BY doc_id),
            seeds(seed_id) AS (VALUES (CAST(0 AS BIGINT)), (1), (2)),
            sw AS (SELECT s.seed_id, wd.term, wd.w / norms.nrm AS w
                   FROM wd JOIN norms USING (doc_id)
                           JOIN seeds s ON wd.doc_id = s.seed_id),
            scores AS (SELECT sw.seed_id, wd.doc_id,
                              sum((wd.w / norms.nrm) * sw.w) AS score
                       FROM wd JOIN sw USING (term)
                       JOIN norms ON wd.doc_id = norms.doc_id
                       WHERE wd.doc_id <> sw.seed_id
                       GROUP BY 1, 2),
            ranked AS (SELECT seed_id, doc_id, score,
                              row_number() OVER (PARTITION BY seed_id
                                                 ORDER BY round(score, 6) DESC, doc_id) AS rank
                       FROM scores WHERE score > 0)
            SELECT seed_id, rank, doc_id, round(score, 4) AS score
            FROM ranked WHERE rank <= 10 ORDER BY seed_id, rank""",
        "hybrid_recommend": _CTE + """,
            dfs AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
            wd AS (SELECT tf.doc_id, tf.term,
                          (1 + log10(tf.tf)) * ln(1 + (stats.n - dfs.df + 0.5) / (dfs.df + 0.5)) AS w
                   FROM tf JOIN dfs USING (term) CROSS JOIN stats),
            norms AS (SELECT doc_id, sqrt(sum(w * w)) AS nrm FROM wd GROUP BY doc_id),
            sw AS (SELECT wd.term, wd.w / norms.nrm AS w
                   FROM wd JOIN norms USING (doc_id) WHERE wd.doc_id = 5),
            scores AS (SELECT wd.doc_id, sum((wd.w / norms.nrm) * sw.w) AS score
                       FROM wd JOIN sw USING (term)
                       JOIN norms ON wd.doc_id = norms.doc_id
                       WHERE wd.doc_id <> 5 GROUP BY 1),
            content AS (SELECT doc_id, score,
                               row_number() OVER (ORDER BY round(score, 6) DESC, doc_id) AS rn
                        FROM scores WHERE score > 0),
            cand AS (SELECT doc_id, round(score, 4) AS content_score
                     FROM content WHERE rn <= 30),
            inter AS (SELECT user_id,
                             CAST(regexp_extract(props, '[0-9]+') AS BIGINT) AS item
                      FROM events GROUP BY 1, 2),
            nu AS (SELECT CAST(count(DISTINCT user_id) AS DOUBLE) AS n FROM inter),
            pop AS (SELECT item, CAST(count(*) AS DOUBLE) / nu.n AS p
                    FROM inter CROSS JOIN nu GROUP BY item, nu.n),
            hybrid AS (SELECT c.doc_id, c.content_score,
                              round(coalesce(p.p, 0), 4) AS popularity,
                              round(0.5 * c.content_score
                                    + 0.1 * round(coalesce(p.p, 0), 4), 6) AS score
                       FROM cand c LEFT JOIN pop p ON p.item = c.doc_id),
            ranked AS (SELECT *, row_number() OVER (ORDER BY score DESC, doc_id) AS rank
                       FROM hybrid)
            SELECT rank, doc_id, round(score, 4) AS score, content_score, popularity
            FROM ranked WHERE rank <= 10 ORDER BY rank""",
        "proximity_match": _CTE + f""",
            ptoks AS (
              SELECT doc_id, term,
                     row_number() OVER (PARTITION BY doc_id ORDER BY pos) - 1 AS tpos
              FROM (SELECT doc_id, unnest(string_split(t, ' ')) AS term,
                           generate_subscripts(string_split(t, ' '), 1) AS pos
                    FROM norm) u
              WHERE regexp_matches(term, '[a-z0-9_]'))
            SELECT DISTINCT a.doc_id
            FROM ptoks a JOIN ptoks b USING (doc_id)
            WHERE a.term = '{A.PROX_TERMS[0]}' AND b.term = '{A.PROX_TERMS[1]}'
              AND abs(a.tpos - b.tpos) <= {A.PROX_DIST}
            ORDER BY doc_id""",
        "window_match": _CTE + f""",
            ptoks AS (
              SELECT doc_id, term,
                     row_number() OVER (PARTITION BY doc_id ORDER BY pos) - 1 AS tpos
              FROM (SELECT doc_id, unnest(string_split(t, ' ')) AS term,
                           generate_subscripts(string_split(t, ' '), 1) AS pos
                    FROM norm) u
              WHERE regexp_matches(term, '[a-z0-9_]'))
            SELECT DISTINCT a.doc_id
            FROM ptoks a JOIN ptoks b USING (doc_id) JOIN ptoks c USING (doc_id)
            WHERE a.term = '{A.WINDOW_TERMS[0]}' AND b.term = '{A.WINDOW_TERMS[1]}'
              AND c.term = '{A.WINDOW_TERMS[2]}'
              AND greatest(a.tpos, b.tpos, c.tpos)
                  - least(a.tpos, b.tpos, c.tpos) < {A.WINDOW_SIZE}
            ORDER BY doc_id""",
        "kwic_fixed": f"""
            WITH hit AS (
              SELECT doc_id, text,
                     strpos(lower(text), '{A.KWIC_KEYWORD}') AS p,
                     {len(A.KWIC_KEYWORD)} AS kl
              FROM documents WHERE strpos(lower(text), '{A.KWIC_KEYWORD}') > 0),
            raw AS (
              SELECT doc_id, text, p, kl,
                     greatest(0, p - 1 - {A.KWIC_WIDTH}) AS ls,
                     least(length(text), p - 1 + kl + {A.KWIC_WIDTH}) AS re
              FROM hit),
            ctx AS (
              SELECT doc_id, p - 1 AS position,
                     substr(text, ls + 1, (p - 1) - ls) AS l0,
                     substr(text, p, kl) AS keyword,
                     substr(text, p + kl, re - (p - 1 + kl)) AS r0,
                     ls, re, length(text) AS n
              FROM raw)
            SELECT doc_id, position,
                   CASE WHEN ls > 0 AND contains(l0, ' ')
                        THEN regexp_replace(l0, '^[^ ]* ', '') ELSE l0 END AS left_ctx,
                   keyword,
                   CASE WHEN re < n AND contains(r0, ' ')
                        THEN regexp_replace(r0, ' [^ ]*$', '') ELSE r0 END AS right_ctx
            FROM ctx ORDER BY doc_id""",
        "unified_search": _CTE + f""",
            qterms(qid, term) AS (VALUES ('u_simple', 'spark'), ('u_simple', 'join')),
            dfs AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
            contrib AS (
              SELECT q.qid, tf.doc_id,
                     ln((stats.n - dfs.df + 0.5) / (dfs.df + 0.5) + 1.0)
                     * (tf.tf * 2.5) / (tf.tf + 1.5 * (1 - 0.75 + 0.75 * dln.dl / stats.avgdl)) AS c
              FROM tf
              JOIN qterms q USING (term)
              JOIN dfs USING (term)
              JOIN dln ON tf.doc_id = dln.doc_id
              CROSS JOIN stats),
            scores AS (SELECT qid, doc_id, sum(c) AS score FROM contrib GROUP BY qid, doc_id),
            ranked AS (SELECT qid, doc_id, score,
                              row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id) AS rank
                       FROM scores),
            booln AS (SELECT DISTINCT doc_id FROM tf
                      WHERE term IN ('spark', 'vector')
                        AND doc_id NOT IN (SELECT doc_id FROM tf WHERE term = 'dup')),
            fieldm AS (SELECT d.doc_id FROM documents d
                       WHERE d.lang = 'en'
                         AND d.doc_id IN (SELECT doc_id FROM tf WHERE term = 'spark'))
            SELECT qid, 'simple' AS mode, rank, doc_id, round(score, 4) AS score
            FROM ranked WHERE rank <= 10
            UNION ALL
            SELECT 'u_bool', 'boolean', row_number() OVER (ORDER BY doc_id),
                   doc_id, 0.0 FROM booln
            UNION ALL
            SELECT 'u_field', 'field', row_number() OVER (ORDER BY doc_id),
                   doc_id, 0.0 FROM fieldm""",
        "facet_numeric_ranges": f"""
            WITH lab AS (
              SELECT CASE
                WHEN n_chars >= 0 AND n_chars < 200 THEN '0-199'
                WHEN n_chars >= 200 AND n_chars < 400 THEN '200-399'
                WHEN n_chars >= 400 THEN '400+'
              END AS label
              FROM documents)
            SELECT label, count(*) AS count FROM lab
            WHERE label IS NOT NULL GROUP BY label ORDER BY min(CASE label
              WHEN '0-199' THEN 0 WHEN '200-399' THEN 1 ELSE 2 END)""",
        "pat_keywords": _CTE + """,
            cand AS (SELECT term, sum(tf)::BIGINT AS freq, count(*) AS df
                     FROM tf GROUP BY term
                     HAVING sum(tf) >= 2 AND count(*) >= 1),
            tot AS (SELECT sum(tf)::DOUBLE AS t FROM tf),
            td AS (SELECT CAST(count(DISTINCT tf.doc_id) AS DOUBLE) AS nd
                   FROM tf JOIN cand USING (term)),
            scored AS (SELECT term, freq, df,
                              (freq / tot.t) * (ln((td.nd + 1) / (df + 1)) + 1) AS tfidf
                       FROM cand CROSS JOIN tot CROSS JOIN td),
            m AS (SELECT 'tfidf' AS method, term, freq, df, tfidf AS score FROM scored
                  UNION ALL SELECT 'frequency', term, freq, df, freq::DOUBLE FROM scored
                  UNION ALL SELECT 'doc_frequency', term, freq, df, df::DOUBLE FROM scored
                  UNION ALL SELECT 'combined', term, freq, df,
                                   tfidf * (1 + ln(df + 1)) FROM scored),
            ranked AS (SELECT method, term, freq AS frequency, df AS doc_frequency, score,
                              row_number() OVER (PARTITION BY method
                                                 ORDER BY score DESC, term) AS rank
                       FROM m)
            SELECT method, rank, term, frequency, doc_frequency, round(score, 4) AS score
            FROM ranked WHERE rank <= 20 ORDER BY method, rank""",
        # Remaining rows-only entries, each with a stated reason and an
        # oracle-checked sibling where one exists:
        # - lda_topics / lda_doc_topics / lda_perplexity: variational EM
        #   with DATA-DEPENDENT per-doc inner-loop iteration counts
        #   (tol=1e-3 early stop) and an RNG Gamma lambda init — but the
        #   algorithm itself IS oracle-checked via the fixed sibling
        #   lda_fixed_topics (tol=0, arithmetic init, full EM + digamma
        #   series unrolled in SQL); kernels golden-tested in
        #   tests/test_lda.py.
        # - cf_als (RNG init + LAPACK solves) -> oracle-checked sibling
        #   cf_als_fixed; doc_hac_clusters (raw-float argmax) ->
        #   doc_hac_fixed; textrank_keywords (tol early-stop) ->
        #   textrank_fixed_topk; yake_keywords (SequenceMatcher seqm
        #   dedup, not SQL-replicable) -> oracle-checked siblings
        #   yake_unigram_topk AND yake_phrase_topk (full phrase scoring
        #   with dedup disabled, ranks pinned on round4 scores).
        # - media_features / video_frame_features (declared fake-decode
        #   plumbing) and media_features_real / video_frame_features_real
        #   (REAL wav/ppm/avi decodes): binary codec work has no SQL
        #   form; codecs are roundtrip-unit-tested bit-exactly.
        # (svo_triples graduated to oracle-checked: the fake parse +
        # tree walk collapse to a per-doc SQL expression.)
    }
    # sharded serving entries share their single-path oracles
    d["boolean_sharded"] = d["boolean_and_not"]
    return d
