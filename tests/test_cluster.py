"""Clustering kernels (functions/cluster.py) vs reference semantics
(doc_cluster.py:252-376, term_cluster.py:79-490)."""

import numpy as np
import pandas as pd
import pytest

from news_information_retrieval_system_ray.functions.cluster import (
    cooccurrence_clusters,
    edit_distance,
    edit_similarity,
    hac,
    star_clusters,
)


# ---------------------------------------------------------------- edit dist
def test_edit_distance_classic_cases():
    assert edit_distance("kitten", "sitting") == 3
    assert edit_distance("", "abc") == 3
    assert edit_distance("abc", "") == 3
    assert edit_distance("same", "same") == 0
    assert edit_distance("ab", "ba") == 2


def test_edit_similarity_normalization():
    assert edit_similarity("", "") == 1.0
    assert edit_similarity("abcd", "abcd") == 1.0
    # distance 1 over maxlen 4
    assert edit_similarity("abcd", "abcx") == pytest.approx(0.75)
    assert edit_similarity("a", "bcde") == pytest.approx(1.0 - 4 / 4)


# ---------------------------------------------------------------- HAC
def _two_blob_matrix():
    # docs 0,1,2 are one tight blob; 3,4 another; cross-sim low
    ids = [10, 11, 12, 20, 21]
    S = np.array([
        [0.0, 0.9, 0.8, 0.1, 0.0],
        [0.9, 0.0, 0.85, 0.0, 0.1],
        [0.8, 0.85, 0.0, 0.05, 0.0],
        [0.1, 0.0, 0.05, 0.0, 0.95],
        [0.0, 0.1, 0.0, 0.95, 0.0],
    ])
    return ids, S


@pytest.mark.parametrize("linkage", ["single", "complete", "average"])
def test_hac_recovers_blobs(linkage):
    ids, S = _two_blob_matrix()
    assign = hac(ids, S, k=2, linkage=linkage)
    assert set(assign) == set(ids)
    # blob members share a cluster, blobs differ
    assert assign[10] == assign[11] == assign[12]
    assert assign[20] == assign[21]
    assert assign[10] != assign[20]
    # relabeled by ascending min member id: blob containing 10 gets id 0
    assert assign[10] == 0 and assign[20] == 1


def test_hac_k_ge_n_identity():
    assign = hac([5, 7, 9], np.zeros((3, 3)), k=3)
    assert assign == {5: 0, 7: 1, 9: 2}
    assert hac([5, 7], np.zeros((2, 2)), k=10) == {5: 0, 7: 1}


def test_hac_complete_vs_single_disagree_on_chain():
    # chain: 0-1 strong, 1-2 strong, 0-2 zero. single merges all three
    # before touching the far pair; complete-link (min) prefers the pair
    # with nonzero min. With k=2:
    ids = [0, 1, 2, 3]
    S = np.array([
        [0.0, 0.9, 0.0, 0.0],
        [0.9, 0.0, 0.8, 0.0],
        [0.0, 0.8, 0.0, 0.3],
        [0.0, 0.0, 0.3, 0.0],
    ])
    single = hac(ids, S, k=2, linkage="single")
    # single-link chains 0-1-2 together (0.9 then 0.8), 3 alone
    assert single[0] == single[1] == single[2] != single[3]
    complete = hac(ids, S, k=2, linkage="complete")
    # complete: merge (0,1)=0.9, then best min-linkage pair is (2,3)=0.3
    # because ({0,1},{2}) has min(0.0,0.8)=0.0
    assert complete[0] == complete[1]
    assert complete[2] == complete[3]
    assert complete[0] != complete[2]


def test_hac_first_best_pair_wins_on_tie():
    # two identical-score pairs: (0,1) and (2,3) both 0.5. Scan order is
    # insertion order, strict > means the FIRST pair found wins round 1.
    ids = [0, 1, 2, 3]
    S = np.array([
        [0.0, 0.5, 0.0, 0.0],
        [0.5, 0.0, 0.0, 0.0],
        [0.0, 0.0, 0.0, 0.5],
        [0.0, 0.0, 0.5, 0.0],
    ])
    assign = hac(ids, S, k=3)
    # after one merge: {0,1} merged, 2 and 3 still singletons
    assert assign[0] == assign[1]
    assert assign[2] != assign[3]


# ---------------------------------------------------------------- star
def test_star_clusters_greedy_max_potential():
    terms = ["aa", "ab", "ac", "zz"]
    sims = {("aa", "ab"): 0.8, ("aa", "ac"): 0.75, ("ab", "ac"): 0.9}
    out = star_clusters(terms, sims, threshold=0.7)
    # potentials (self incl.): aa=3, ab=3, ac=3, zz=1 -> first max = aa
    assert out[0][0] == "aa"
    assert out[0][1] == ["aa", "ab", "ac"]
    assert out[1] == ("zz", ["zz"])


def test_star_clusters_threshold_excludes():
    terms = ["aa", "ab"]
    out = star_clusters(terms, {("aa", "ab"): 0.5}, threshold=0.7)
    assert len(out) == 2  # below threshold -> separate stars


def test_star_clusters_symmetric_lookup():
    out = star_clusters(["x", "y"], {("y", "x"): 0.9}, threshold=0.7)
    assert out == [("x", ["x", "y"])]


# ---------------------------------------------------------------- cooc
def test_cooccurrence_clusters_greedy_order():
    terms = ["t1", "t2", "t3", "t4"]
    cooc = {("t1", "t2"): 3, ("t1", "t3"): 2, ("t3", "t4"): 5}
    out = cooccurrence_clusters(terms, cooc, min_cooccurrence=2)
    # t1 absorbs t2, t3 (input order); t4 left -> own cluster
    assert out[0] == ("t1", ["t1", "t2", "t3"])
    assert out[1] == ("t4", ["t4"])


def test_cooccurrence_min_threshold():
    out = cooccurrence_clusters(["a", "b"], {("a", "b"): 1}, min_cooccurrence=2)
    assert out == [("a", ["a"]), ("b", ["b"])]


# ---------------------------------------------------------------- e2e
def test_doc_hac_pipeline_e2e(ray_session, sf_dir):
    from news_information_retrieval_system_ray.pipelines.analytics import (
        doc_hac_clusters,
        term_cooccurrence_clusters,
        term_star_clusters,
    )

    df = doc_hac_clusters(sf_dir, n_docs=30, k=5)
    assert set(df.columns) == {"doc_id", "cluster_id", "cluster_size"}
    assert df["cluster_id"].nunique() == 5
    assert len(df) == 30
    # cluster_size is consistent with the actual assignment
    sizes = df.groupby("cluster_id").size()
    for _, row in df.iterrows():
        assert row["cluster_size"] == sizes[row["cluster_id"]]

    stars = term_star_clusters(sf_dir, top_n=25)
    assert set(stars.columns) == {"cluster_id", "center", "term"}
    # every term appears exactly once
    assert stars["term"].is_unique
    assert len(stars) == 25

    cooc = term_cooccurrence_clusters(sf_dir, top_n=20, min_cooccurrence=2)
    assert cooc["term"].is_unique
    assert len(cooc) == 20
    # centers belong to their own cluster
    merged = cooc.merge(cooc, left_on=["cluster_id", "center"],
                        right_on=["cluster_id", "term"], how="left")
    assert merged["term_y"].notna().all()


def test_doc_hac_deterministic(ray_session, sf_dir):
    from news_information_retrieval_system_ray.pipelines.analytics import (
        doc_hac_clusters,
    )

    a = doc_hac_clusters(sf_dir, n_docs=25, k=4)
    b = doc_hac_clusters(sf_dir, n_docs=25, k=4)
    pd.testing.assert_frame_equal(a, b)
