"""BERTopic-style neural topic modeling, Ray-Data-first.

Reference parity: ``src/ir/topic/bertopic_model.py`` — the reference is
a wrapper over the public ``bertopic`` library (Grootendorst 2022,
arXiv:2203.05794, cited at bertopic_model.py:27-29) whose pipeline is
(1) document embeddings (SentenceTransformer) -> (2) dimensionality
reduction (UMAP) -> (3) clustering (HDBSCAN) -> (4) topic
representation via class-based TF-IDF, surfacing ``fit`` /
``fit_transform`` / ``get_topic_info`` / ``get_topics`` /
``get_topic_words`` / ``get_representative_docs`` / ``transform`` /
``reduce_topics`` / ``find_topics`` (bertopic_model.py:200-330,
350-425, 600-670).

Container swaps (the KeyBERT / dense-retrieval convention — each
declared where the reference's heavyweight dependency is absent):

- *embeddings*: the corpus embedding column (``embeddings.parquet``,
  ``vec_id`` aligned with ``doc_id``); for raw text the repo's
  feature-hashing encoder (``stages/dense.HashingEncoderStage``,
  oracle-checked there) is the drop-in.
- *UMAP* -> none needed at this dimensionality (64); for very wide
  model embeddings a seeded Gaussian random projection
  (Johnson-Lindenstrauss) slots in front of the clustering stage the
  same way UMAP does in the library.
- *HDBSCAN* -> the repo's distributed seeded Lloyd k-means
  (``stages/ann.kmeans``) — k-means is an officially supported
  bertopic clustering backend (``bertopic.cluster`` accepts any
  estimator with fit/predict), so this is a configuration the real
  library runs, not an approximation of one.

c-TF-IDF follows the library's ``ClassTfidfTransformer`` exactly
(which the reference executes): with ``ctf(t, c)`` the count of term
``t`` in class ``c``,

    W(t, c) = ctf(t, c) / |c|  *  ln(1 + A / f(t))

where ``|c|`` is the token count of class ``c`` (row-L1 tf
normalization), ``f(t)`` the count of ``t`` across all classes, and
``A = floor(mean class token count)`` (the library truncates the mean
to int before the log).

Distributed shape (100-TB posture):
- clustering: per-batch partial sums, k x dim driver reduce
  (``stages/ann.kmeans``);
- assignment: broadcast-centroid streaming ``map_batches``
  (``stages/ann.assign_to_centroids``) — kept as a *Dataset*;
- doc->topic attach to the token stream: a distributed hash join
  (``Dataset.join`` on doc_id) — no driver-built doc->topic dict;
- the class-term aggregate: one ``(topic, term)`` sum via the
  partial-then-merge ``_sum_by`` shape.
Everything after the aggregate is O(k x vocab) (the c-TF-IDF matrix
itself), which is the same driver-side footprint the library holds;
at web scale the per-topic top-n finishes with the partial-top-k
merge pattern instead of a full sort.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa

from ..stages.ann import assign_to_centroids, kmeans
from .analytics import _exploded_ds, _memo, round4

DEFAULT_K = 6
DEFAULT_ITER = 8
DEFAULT_SEED = 17
FIND_TERMS = ("spark", "window", "merge")  # find_topics() fixture queries


def ctfidf_scores(ctf: pd.DataFrame) -> pd.DataFrame:
    """c-TF-IDF over a (topic, term, ctf) count frame (formula above).

    Pure so :meth:`BERTopicModel.reduce_topics` can re-score merged
    counts, exactly as the library refits its transformer after a
    merge."""
    out = ctf.copy()
    tot = out.groupby("topic")["ctf"].transform("sum")
    f_t = out.groupby("term")["ctf"].transform("sum")
    a = math.floor(float(ctf.groupby("topic")["ctf"].sum().mean()))
    out["score"] = (out["ctf"] / tot) * np.log(1.0 + a / f_t)
    return out


def _rank_scores(scores: pd.DataFrame) -> pd.DataFrame:
    """Per-topic dense word ranking: score desc, term asc (canonical)."""
    s = scores.sort_values(["topic", "score", "term"],
                           ascending=[True, False, True],
                           kind="mergesort").reset_index(drop=True)
    s["rank"] = s.groupby("topic").cumcount() + 1
    return s


@dataclass
class BERTopicModel:
    """Fitted model: the reference wrapper's query surface
    (bertopic_model.py:301-425, 600-670) over driver-small state
    (centroids k x dim; c-TF-IDF k x vocab; doc_topics n x 3 — the one
    piece that stays a Dataset at web scale, pulled here at harness
    scale only)."""

    centroids: np.ndarray
    doc_topics: pd.DataFrame      # doc_id, topic, dist2
    scores: pd.DataFrame          # topic, term, ctf, score, rank
    top_n: int = 10

    def topic_sizes(self) -> pd.DataFrame:
        s = (self.doc_topics.groupby("topic").size()
             .reset_index(name="size").sort_values("topic"))
        return s.reset_index(drop=True)

    def get_topics(self) -> dict[int, list[tuple[str, float]]]:
        t = self.scores[self.scores["rank"] <= self.top_n]
        return {int(tid): list(zip(g["term"], g["score"]))
                for tid, g in t.groupby("topic")}

    def get_topic_words(self, topic: int,
                        top_n: int | None = None) -> list[tuple[str, float]]:
        n = top_n or self.top_n
        g = self.scores[(self.scores["topic"] == topic)
                        & (self.scores["rank"] <= n)]
        return list(zip(g["term"], g["score"]))

    def get_topic_info(self) -> pd.DataFrame:
        """(topic, size, name) with the library's ``{id}_{w1}_{w2}_{w3}_{w4}``
        Name convention."""
        sizes = self.topic_sizes()
        top4 = self.scores[self.scores["rank"] <= 4]
        names = (top4.sort_values(["topic", "rank"])
                 .groupby("topic")["term"]
                 .agg(lambda ws: "_".join(ws)).reset_index(name="nm"))
        info = sizes.merge(names, on="topic")
        info["name"] = info["topic"].astype(str) + "_" + info["nm"]
        return info[["topic", "size", "name"]]

    def get_representative_docs(self, topic: int, n_docs: int = 3) -> list[int]:
        """Docs closest to the topic centroid (dist2 asc, doc_id asc) —
        the library samples docs by similarity to the topic vector;
        centroid distance is that notion in the k-means backend."""
        g = self.doc_topics[self.doc_topics["topic"] == topic]
        g = g.sort_values(["dist2", "doc_id"]).head(n_docs)
        return [int(d) for d in g["doc_id"]]

    def find_topics(self, term: str, top_n: int = 3) -> list[tuple[int, float]]:
        """Topics ranked by the term's c-TF-IDF weight.  The reference
        embeds the search term with the sentence model and cosines
        against topic embeddings (bertopic_model.py:649-670); without a
        text encoder into the corpus embedding space, the class-based
        TF-IDF weight is the model's own term->topic relevance."""
        g = self.scores[self.scores["term"] == term]
        g = g.sort_values(["score", "topic"], ascending=[False, True]).head(top_n)
        return [(int(t), float(s)) for t, s in zip(g["topic"], g["score"])]

    def transform_vectors(self, vecs: np.ndarray) -> pd.DataFrame:
        """Nearest-centroid topic for new embedding rows
        (bertopic_model.py:270-299 transform)."""
        m = np.asarray(vecs, dtype=np.float64)
        d2 = ((m[:, None, :] - self.centroids[None, :, :]) ** 2).sum(axis=2)
        return pd.DataFrame({"topic": d2.argmin(axis=1).astype(np.int64),
                             "dist2": d2.min(axis=1)})

    def reduce_topics(self, nr_topics: int) -> "BERTopicModel":
        """Iteratively merge the smallest topic into its most
        c-TF-IDF-cosine-similar topic until ``nr_topics`` remain
        (bertopic_model.py:622-647 / the library's reduce_topics).
        Deterministic ties: smallest size -> lowest topic id; highest
        cosine -> lowest topic id.  Counts merge, scores refit — the
        library refits its vectorizer after merges the same way."""
        counts = self.scores[["topic", "term", "ctf"]].copy()
        sizes = {int(t): int(n) for t, n in
                 zip(self.topic_sizes()["topic"], self.topic_sizes()["size"])}
        remap: dict[int, int] = {}
        while len(sizes) > nr_topics:
            small = min(sizes, key=lambda t: (sizes[t], t))
            sc = ctfidf_scores(counts)
            smat = sc.pivot_table(index="topic", columns="term",
                                  values="score", fill_value=0.0,
                                  aggfunc="sum")
            v = smat.loc[small].to_numpy()
            best, best_cos = None, -2.0
            for t in sorted(sizes):
                if t == small:
                    continue
                w = smat.loc[t].to_numpy()
                denom = (np.linalg.norm(v) * np.linalg.norm(w)) or 1.0
                # round 9dp so FP summation order can't flip a merge
                # (same convention as doc_hac_fixed's sim matrix)
                cos = round(float(v @ w) / denom, 9)
                if cos > best_cos:
                    best, best_cos = t, cos
            counts.loc[counts["topic"] == small, "topic"] = best
            counts = (counts.groupby(["topic", "term"], as_index=False)["ctf"]
                      .sum())
            sizes[best] += sizes.pop(small)
            remap[small] = best
            for k, tgt in list(remap.items()):
                if tgt == small:
                    remap[k] = best
        dt = self.doc_topics.copy()
        if remap:
            dt["topic"] = dt["topic"].map(lambda t: remap.get(int(t), int(t)))
        return BERTopicModel(centroids=self.centroids, doc_topics=dt,
                             scores=_rank_scores(ctfidf_scores(counts)),
                             top_n=self.top_n)


def fit_bertopic(sf_dir: str, *, k: int = DEFAULT_K, n_iter: int = DEFAULT_ITER,
                 seed: int = DEFAULT_SEED, top_n: int = 10) -> BERTopicModel:
    """embed -> cluster -> c-TF-IDF over ``{sf_dir}/embeddings.parquet``
    (document embeddings) + the documents token stream."""
    import ray.data as rd

    def build() -> BERTopicModel:
        emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                              columns=["vec_id", "embedding"]).materialize()
        dim = len(emb.take_batch(1, batch_format="pandas")["embedding"].iloc[0])
        centroids, _ = kmeans(emb, k=k, dim=dim, n_iter=n_iter, seed=seed,
                              with_assign=False)
        assign = assign_to_centroids(emb, centroids)

        topic_of = assign.map_batches(
            lambda t: pa.table({"doc_id": t.column("vec_id"),
                                "topic": t.column("cluster")}),
            batch_format="pyarrow")
        ex = _exploded_ds(sf_dir).select_columns(["doc_id", "term", "tf"])
        joined = ex.join(topic_of, "inner", num_partitions=8, on=("doc_id",))

        from .analytics import _sum_by
        ctf = (_sum_by(joined, ("topic", "term"), ("tf",)).to_pandas()
               .rename(columns={"tf": "ctf"}))
        ctf["topic"] = ctf["topic"].astype(np.int64)

        dt = (assign.to_pandas()
              .rename(columns={"vec_id": "doc_id", "cluster": "topic"})
              .sort_values("doc_id").reset_index(drop=True))
        return BERTopicModel(centroids=centroids, doc_topics=dt,
                             scores=_rank_scores(ctfidf_scores(ctf)),
                             top_n=top_n)

    return _memo(("bertopic", sf_dir, k, n_iter, seed, top_n), build)


# --------------------------------------------------------------------------
# queries() wrappers (driver correctness gate)
# --------------------------------------------------------------------------

def bertopic_topics(sf_dir: str, k: int = DEFAULT_K, top_n: int = 10) -> pd.DataFrame:
    """(topic, rank, word, score): per-topic c-TF-IDF top words —
    get_topics()/get_topic_words() (bertopic_model.py:350-389)."""
    m = fit_bertopic(sf_dir, k=k)
    t = m.scores[m.scores["rank"] <= top_n].copy()
    t["score"] = t["score"].map(round4)
    t = t.rename(columns={"term": "word"})
    return t[["topic", "rank", "word", "score"]].reset_index(drop=True)


def bertopic_topic_info(sf_dir: str, k: int = DEFAULT_K) -> pd.DataFrame:
    """(topic, size, name): get_topic_info() with the library Name
    convention (bertopic_model.py:301-348)."""
    return fit_bertopic(sf_dir, k=k).get_topic_info()


def bertopic_doc_topics(sf_dir: str, k: int = DEFAULT_K) -> pd.DataFrame:
    """(doc_id, topic, dist2): per-document topic assignment —
    fit_transform's topics/probs surface (bertopic_model.py:244-268)."""
    dt = fit_bertopic(sf_dir, k=k).doc_topics.copy()
    dt["dist2"] = dt["dist2"].map(round4)
    return dt[["doc_id", "topic", "dist2"]]


def bertopic_repr_docs(sf_dir: str, k: int = DEFAULT_K, n_docs: int = 3) -> pd.DataFrame:
    """(topic, rank, doc_id): representative documents per topic —
    get_representative_docs (bertopic_model.py:391-425)."""
    m = fit_bertopic(sf_dir, k=k)
    g = m.doc_topics.sort_values(["topic", "dist2", "doc_id"],
                                 kind="mergesort").copy()
    g["rank"] = g.groupby("topic").cumcount() + 1
    g = g[g["rank"] <= n_docs]
    return g[["topic", "rank", "doc_id"]].reset_index(drop=True)


def bertopic_find_topics(sf_dir: str, k: int = DEFAULT_K, top_n: int = 3) -> pd.DataFrame:
    """(query_term, rank, topic, score): find_topics over the fixture
    terms (bertopic_model.py:649-670)."""
    m = fit_bertopic(sf_dir, k=k)
    rows = []
    for term in FIND_TERMS:
        for r, (tid, s) in enumerate(m.find_topics(term, top_n=top_n), 1):
            rows.append((term, r, tid, round4(s)))
    return pd.DataFrame(rows, columns=["query_term", "rank", "topic", "score"])


def bertopic_reduced_topics(sf_dir: str, k: int = DEFAULT_K,
                            nr_topics: int = 4, top_n: int = 10) -> pd.DataFrame:
    """(topic, size, rank, word, score): topic words after reduce_topics
    k -> nr_topics (two deterministic smallest-into-most-similar merges
    at the defaults; bertopic_model.py:622-647)."""
    m = fit_bertopic(sf_dir, k=k).reduce_topics(nr_topics)
    sizes = {int(t): int(n) for t, n in
             zip(m.topic_sizes()["topic"], m.topic_sizes()["size"])}
    t = m.scores[m.scores["rank"] <= top_n].copy()
    t["score"] = t["score"].map(round4)
    t["size"] = t["topic"].map(sizes)
    t = t.rename(columns={"term": "word"})
    return t[["topic", "size", "rank", "word", "score"]].reset_index(drop=True)
