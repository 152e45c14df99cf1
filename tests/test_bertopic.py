"""BERTopic pipeline (pipelines/bertopic.py) — capability parity with
the reference's bertopic-library wrapper (bertopic_model.py:200-670):
c-TF-IDF math, topic reduction semantics, transform, and the
distributed fit end-to-end on the sf0.001 tables."""

import math

import numpy as np
import pandas as pd
import pytest

from news_information_retrieval_system_ray.pipelines.bertopic import (
    BERTopicModel,
    _rank_scores,
    ctfidf_scores,
    fit_bertopic,
)

SF = "/root/testdata/sf0.001"


def _model(counts: dict[int, dict[str, int]],
           sizes: dict[int, int]) -> BERTopicModel:
    rows = [(t, term, c) for t, d in counts.items() for term, c in d.items()]
    ctf = pd.DataFrame(rows, columns=["topic", "term", "ctf"])
    dt_rows = []
    did = 0
    for t, n in sizes.items():
        for _ in range(n):
            dt_rows.append((did, t, 0.5 + did * 0.01))
            did += 1
    dt = pd.DataFrame(dt_rows, columns=["doc_id", "topic", "dist2"])
    return BERTopicModel(centroids=np.zeros((len(sizes), 2)),
                         doc_topics=dt,
                         scores=_rank_scores(ctfidf_scores(ctf)))


def test_ctfidf_hand_computed():
    # topics {0: a:2 b:2, 1: a:1 c:3}; |c0|=|c1|=4; A=floor(mean)=4;
    # f(a)=3 f(b)=2 f(c)=3  ->  W = (ctf/4) * ln(1 + 4/f)
    ctf = pd.DataFrame(
        [(0, "a", 2), (0, "b", 2), (1, "a", 1), (1, "c", 3)],
        columns=["topic", "term", "ctf"])
    s = ctfidf_scores(ctf).set_index(["topic", "term"])["score"]
    assert s[(0, "a")] == pytest.approx(0.5 * math.log(1 + 4 / 3))
    assert s[(0, "b")] == pytest.approx(0.5 * math.log(1 + 4 / 2))
    assert s[(1, "a")] == pytest.approx(0.25 * math.log(1 + 4 / 3))
    assert s[(1, "c")] == pytest.approx(0.75 * math.log(1 + 4 / 3))


def test_ctfidf_a_truncates_like_the_library():
    # class totals 3 and 4 -> mean 3.5 -> A = int(3.5) = 3
    ctf = pd.DataFrame([(0, "a", 3), (1, "b", 4)],
                       columns=["topic", "term", "ctf"])
    s = ctfidf_scores(ctf).set_index(["topic", "term"])["score"]
    assert s[(0, "a")] == pytest.approx(1.0 * math.log(1 + 3 / 3))
    assert s[(1, "b")] == pytest.approx(1.0 * math.log(1 + 3 / 4))


def test_rank_orders_score_desc_then_term():
    ctf = pd.DataFrame([(0, "b", 2), (0, "a", 2), (0, "c", 5)],
                       columns=["topic", "term", "ctf"])
    r = _rank_scores(ctfidf_scores(ctf))
    # c has highest tf; a and b tie -> term asc breaks the tie
    assert list(r.sort_values("rank")["term"]) == ["c", "a", "b"]


def test_reduce_merges_smallest_into_most_similar():
    # topic 0 (size 1) shares 'x' with topic 1 only -> 0 merges into 1
    m = _model({0: {"x": 1}, 1: {"x": 5, "y": 1}, 2: {"z": 6}},
               {0: 1, 1: 2, 2: 3})
    r = m.reduce_topics(2)
    assert sorted(r.topic_sizes()["topic"]) == [1, 2]
    sizes = dict(zip(r.topic_sizes()["topic"], r.topic_sizes()["size"]))
    assert sizes == {1: 3, 2: 3}
    # doc of topic 0 remapped to 1
    assert set(r.doc_topics["topic"]) == {1, 2}
    # merged counts: topic 1 now has x:6
    merged = r.scores.set_index(["topic", "term"])["ctf"]
    assert merged[(1, "x")] == 6


def test_reduce_remap_chain_survives_target_merges():
    # reduce to 1 topic: every doc must land on the single survivor
    m = _model({0: {"x": 1}, 1: {"x": 5, "y": 1}, 2: {"x": 1, "z": 6}},
               {0: 1, 1: 2, 2: 3})
    r = m.reduce_topics(1)
    assert len(set(r.doc_topics["topic"])) == 1
    assert int(r.topic_sizes()["size"].iloc[0]) == 6
    assert r.doc_topics.shape[0] == 6


def test_transform_vectors_identity_on_centroids():
    m = _model({0: {"x": 1}, 1: {"y": 1}}, {0: 1, 1: 1})
    m.centroids = np.array([[0.0, 0.0], [10.0, 10.0]])
    out = m.transform_vectors(m.centroids)
    assert list(out["topic"]) == [0, 1]
    assert list(out["dist2"]) == [0.0, 0.0]


def test_find_topics_ranks_by_weight():
    m = _model({0: {"x": 9, "y": 1}, 1: {"x": 1, "y": 9}}, {0: 1, 1: 1})
    top = m.find_topics("x", top_n=2)
    assert [t for t, _ in top] == [0, 1]
    assert top[0][1] > top[1][1]


def test_fit_end_to_end(ray_session):
    m = fit_bertopic(SF)
    sizes = m.topic_sizes()
    assert int(sizes["size"].sum()) == 500
    info = m.get_topic_info()
    assert set(info["topic"]) == set(sizes["topic"])
    # names follow the {id}_{w1}_{w2}_{w3}_{w4} convention
    for _, row in info.iterrows():
        words = [w for w, _ in m.get_topic_words(int(row["topic"]), 4)]
        assert row["name"] == f"{int(row['topic'])}_{'_'.join(words)}"
    # representative docs belong to their topic
    dt = m.doc_topics.set_index("doc_id")["topic"]
    for t in sizes["topic"]:
        for d in m.get_representative_docs(int(t)):
            assert int(dt[d]) == int(t)
    # transform on the centroids is the identity
    assert list(m.transform_vectors(m.centroids)["topic"]) == sorted(
        set(int(t) for t in sizes["topic"]))


def test_fieldweighted_bm25_weights_title_terms(ray_session):
    """A title(first-5)-only query term must outscore in the weighted
    index relative to plain BM25: the weighted stream multiplies
    title-token tf by 4 (3 extra + 1 content)."""
    from news_information_retrieval_system_ray.pipelines.analytics import (
        bm25_topk,
        fieldweighted_bm25,
    )

    w = fieldweighted_bm25(SF)
    p = bm25_topk(SF)
    assert list(w.columns) == ["qid", "rank", "doc_id", "score"]
    assert set(w["qid"]) == set(p["qid"])
    assert (w.groupby("qid")["rank"].max() == 10).all()
    # weighting changes the ranking (title occurrences dominate)
    assert not w[["qid", "doc_id"]].equals(p[["qid", "doc_id"]])
