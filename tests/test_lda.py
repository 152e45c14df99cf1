"""LDA variational-EM kernels (functions/lda.py) and the distributed
fit (pipelines/topics.py) — capability parity with the reference's
gensim wrapper (lda_model.py:85-603)."""

import numpy as np
import pandas as pd
import pytest

from news_information_retrieval_system_ray.functions.lda import (
    bound_batch,
    digamma,
    dirichlet_expectation,
    e_step_batch,
    init_lambda,
    m_step,
)


def test_digamma_known_values():
    # psi(1) = -Euler-Mascheroni; psi(0.5) = -gamma - 2 ln 2; psi(n+1) =
    # psi(n) + 1/n
    assert digamma(1.0) == pytest.approx(-0.57721566490153286, abs=1e-10)
    assert digamma(0.5) == pytest.approx(-1.9635100260214235, abs=1e-10)
    assert digamma(5.0) == pytest.approx(1.5061176684318003, abs=1e-10)
    assert digamma(0.01) == pytest.approx(-100.56088545786867, abs=1e-7)
    # recurrence check, vectorized
    x = np.array([0.1, 0.7, 2.3, 9.0])
    np.testing.assert_allclose(digamma(x + 1), digamma(x) + 1.0 / x,
                               atol=1e-10)
    with pytest.raises(ValueError):
        digamma(0.0)


def test_dirichlet_expectation_shapes():
    v = dirichlet_expectation(np.array([1.0, 1.0]))
    # symmetric Dirichlet -> equal components, negative (E[log theta])
    assert v[0] == pytest.approx(v[1])
    assert v[0] < 0
    m = dirichlet_expectation(np.ones((3, 4)))
    assert m.shape == (3, 4)
    np.testing.assert_allclose(m, m[0][0])


def _planted_docs(n=60, seed=0):
    rng = np.random.default_rng(seed)
    docs = []
    for i in range(n):
        base = 0 if i % 2 == 0 else 5
        ids = np.arange(base, base + 5)
        cts = rng.integers(2, 8, size=5).astype(float)
        docs.append((ids, cts))
    return docs


def _fit(docs, k=2, v=10, passes=30, alpha=0.5, eta=0.01, seed=42):
    lam = init_lambda(k, v, seed=seed)
    for _ in range(passes):
        _, ss = e_step_batch(docs, lam, alpha)
        lam = m_step(ss, eta)
    return lam


def test_planted_topics_recovered():
    docs = _planted_docs()
    lam = _fit(docs)
    probs = lam / lam.sum(1, keepdims=True)
    tops = [tuple(sorted(np.argsort(-probs[t])[:5])) for t in range(2)]
    assert set(tops) == {(0, 1, 2, 3, 4), (5, 6, 7, 8, 9)}
    # docs assign cleanly to their planted topic
    g, _ = e_step_batch(docs, lam, 0.5)
    assign = g.argmax(1)
    assert len(set(assign[::2])) == 1
    assert len(set(assign[1::2])) == 1
    assert assign[0] != assign[1]


def test_bound_perplexity_sane_and_improves():
    docs = _planted_docs()
    lam0 = init_lambda(2, 10, seed=42)
    g0, _ = e_step_batch(docs, lam0, 0.5)
    ll0, nt = bound_batch(docs, g0, lam0, 0.5)
    lam = _fit(docs)
    g, _ = e_step_batch(docs, lam, 0.5)
    ll, nt2 = bound_batch(docs, g, lam, 0.5)
    assert nt == nt2 > 0
    # training improves the word-likelihood bound
    assert ll > ll0
    ppl = np.exp(-ll / nt)
    assert 1.0 < ppl < 10.0  # 10-word vocab, separable corpus


def test_kernels_deterministic():
    docs = _planted_docs()
    a, b = _fit(docs), _fit(docs)
    np.testing.assert_array_equal(a, b)


def test_empty_doc_handled():
    docs = [(np.array([], dtype=np.int64), np.array([])),
            (np.array([0, 1]), np.array([2.0, 3.0]))]
    lam = init_lambda(2, 3, seed=1)
    g, ss = e_step_batch(docs, lam, 0.5)
    assert np.all(g[0] == 0.5)  # empty doc -> prior
    assert np.isfinite(ss).all()


# -------------------------------------------------------------- pipeline
def test_lda_pipeline_e2e(ray_session, sf_dir):
    from news_information_retrieval_system_ray.pipelines.topics import (
        lda_doc_topics,
        lda_perplexity,
        lda_topics,
    )

    topics = lda_topics(sf_dir)
    assert list(topics.columns) == ["topic_id", "rank", "term", "weight"]
    assert topics["topic_id"].nunique() == 6
    # per-topic weights are descending by rank
    for _, grp in topics.groupby("topic_id"):
        w = grp.sort_values("rank")["weight"].to_numpy()
        assert (np.diff(w) <= 1e-12).all()
    assert ((topics["weight"] > 0) & (topics["weight"] <= 1)).all()

    dt = lda_doc_topics(sf_dir)
    assert list(dt.columns) == ["doc_id", "topic_id", "prob"]
    # each doc's kept probs sum to <= 1 and >= 1 - 6*min_prob slack
    sums = dt.groupby("doc_id")["prob"].sum()
    assert ((sums > 0.9) & (sums <= 1.0 + 1e-6)).all()

    ppl = lda_perplexity(sf_dir)
    assert len(ppl) == 1
    v = float(ppl["perplexity"].iloc[0])
    # must beat the uniform model over the corpus vocabulary
    from news_information_retrieval_system_ray.pipelines.topics import fit_lda
    vocab_size = len(fit_lda(sf_dir, max_df_frac=1.0)["vocab"])
    assert 1.0 < v < vocab_size


def test_lda_pipeline_deterministic(ray_session, sf_dir):
    from news_information_retrieval_system_ray.pipelines import topics

    a = topics.lda_topics(sf_dir)
    topics._LDA_MEMO.clear()
    b = topics.lda_topics(sf_dir)
    pd.testing.assert_frame_equal(a, b)


def test_lda_fixed_topics_shape_and_determinism(ray_session, sf_dir):
    from news_information_retrieval_system_ray.pipelines.topics import lda_fixed_topics

    a = lda_fixed_topics(sf_dir)
    assert list(a.columns) == ["topic_id", "rank", "term", "weight"]
    assert a["topic_id"].nunique() == 3
    assert (a.groupby("topic_id")["rank"].max() == 10).all()
    # tol=0 + arithmetic init -> bit-identical across runs
    b = lda_fixed_topics(sf_dir)
    pd.testing.assert_frame_equal(a, b)


def test_e_step_tol_zero_runs_fixed_iters():
    import numpy as np

    from news_information_retrieval_system_ray.functions.lda import (
        dirichlet_expectation,
        e_step_doc,
    )

    lam = np.array([[1.1, 0.9, 1.0], [0.95, 1.05, 1.0]])
    xb = np.exp(dirichlet_expectation(lam))
    ids = np.array([0, 2])
    cts = np.array([3.0, 1.0])
    g1, _ = e_step_doc(ids, cts, xb, alpha=0.5, max_iters=1, tol=0.0)
    g5, _ = e_step_doc(ids, cts, xb, alpha=0.5, max_iters=5, tol=0.0)
    g5b, _ = e_step_doc(ids, cts, xb, alpha=0.5, max_iters=5, tol=0.0)
    assert not np.allclose(g1, g5)  # more fixed iterations move gamma
    assert (g5 == g5b).all()
