"""Latent Dirichlet Allocation — batch variational Bayes kernels.

Capability parity with the reference's LDA wrapper
(/root/reference/src/ir/topic/lda_model.py:85-603), which delegates to
gensim (absent in this container).  This module implements the public
batch variational-Bayes EM algorithm (Blei, Ng & Jordan 2003; Hoffman,
Blei & Bach 2010) from the papers' update equations directly — nothing
is derived from gensim internals beyond the algorithm both share.

Distributed shape (see pipelines/topics.py): the topic-word variational
parameter lambda (K x V) is broadcast once per pass via ``ray.put``;
each ``map_batches`` task runs the per-document E-step over its batch
and emits a single partial sufficient-statistics row (K*V flattened);
the driver sums the partials and applies the M-step (lambda = eta +
sstats).  At extreme vocabulary sizes lambda would be sharded by term
id (parameter-server layout); at news-corpus vocabularies K x V fits a
broadcast comfortably.

All kernels are deterministic given (seed, batch contents).
"""

from __future__ import annotations

import numpy as np

# Euler–Mascheroni-free asymptotic digamma: shift x up past 6 with the
# recurrence psi(x) = psi(x+1) - 1/x, then the standard series.
_DIGAMMA_COEF = (-1.0 / 12, 1.0 / 120, -1.0 / 252, 1.0 / 240, -1.0 / 132)


def digamma(x: np.ndarray | float) -> np.ndarray:
    """Vectorized digamma (psi).  Accurate to ~1e-12 for x > 0."""
    x = np.array(x, dtype=np.float64, copy=True)
    scalar = x.ndim == 0
    x = np.atleast_1d(x)
    if (x <= 0).any():
        raise ValueError("digamma requires x > 0")
    acc = np.zeros_like(x)
    mask = x < 6.0
    while mask.any():
        acc[mask] -= 1.0 / x[mask]
        x[mask] += 1.0
        mask = x < 6.0
    inv2 = 1.0 / (x * x)
    series = np.zeros_like(x)
    pw = inv2.copy()
    for c in _DIGAMMA_COEF:
        series += c * pw
        pw *= inv2
    out = acc + np.log(x) - 0.5 / x + series
    return out[0] if scalar else out


def dirichlet_expectation(arr: np.ndarray) -> np.ndarray:
    """E[log theta | Dirichlet(arr)] = psi(arr) - psi(sum(arr)).

    1-D: over the whole vector; 2-D: row-wise."""
    if arr.ndim == 1:
        return digamma(arr) - digamma(arr.sum())
    return digamma(arr) - digamma(arr.sum(axis=1))[:, None]


def init_lambda(n_topics: int, vocab_size: int, seed: int = 42) -> np.ndarray:
    """Deterministic lambda init ~ Gamma(100, 1/100), the VB standard."""
    rng = np.random.default_rng(seed)
    return rng.gamma(100.0, 1.0 / 100.0, (n_topics, vocab_size))


def e_step_doc(term_ids: np.ndarray, counts: np.ndarray,
               exp_elogbeta: np.ndarray, alpha: float,
               max_iters: int = 100, tol: float = 1e-3,
               ) -> tuple[np.ndarray, np.ndarray]:
    """Variational E-step for one document.

    Returns (gamma [K], phi_sstats [K x n_doc_terms]) where the sstats
    contribution to lambda is phi_sstats * exp_elogbeta[:, term_ids]
    (the caller multiplies — it lets a batch accumulate into a dense
    K x V array once).
    """
    k = exp_elogbeta.shape[0]
    cts = counts.astype(np.float64)
    # deterministic gamma init (the classic 1.0 init; no RNG per doc)
    gammad = np.full(k, alpha + cts.sum() / k)
    expelogthetad = np.exp(dirichlet_expectation(gammad))
    betad = exp_elogbeta[:, term_ids]  # K x n
    phinorm = expelogthetad @ betad + 1e-100
    for _ in range(max_iters):
        last = gammad
        gammad = alpha + expelogthetad * (betad @ (cts / phinorm))
        expelogthetad = np.exp(dirichlet_expectation(gammad))
        phinorm = expelogthetad @ betad + 1e-100
        if tol > 0.0 and np.abs(gammad - last).mean() < tol:
            break
    sstats = np.outer(expelogthetad, cts / phinorm)  # K x n
    return gammad, sstats


def e_step_batch(docs: list[tuple[np.ndarray, np.ndarray]],
                 lam: np.ndarray, alpha: float,
                 max_iters: int = 100, tol: float = 1e-3,
                 ) -> tuple[np.ndarray, np.ndarray]:
    """E-step over a list of (term_ids, counts) docs.

    Returns (gamma [n_docs x K], sstats [K x V]); sstats already
    multiplied by exp(E[log beta]) — ready to sum into the M-step.
    ``tol=0`` disables the per-doc early stop so exactly ``max_iters``
    inner iterations run (the deterministic form the SQL oracle
    unrolls)."""
    exp_elogbeta = np.exp(dirichlet_expectation(lam))
    k, v = lam.shape
    sstats = np.zeros((k, v))
    gammas = np.zeros((len(docs), k))
    for i, (ids, cts) in enumerate(docs):
        if len(ids) == 0:
            gammas[i] = alpha
            continue
        gammad, part = e_step_doc(ids, cts, exp_elogbeta, alpha,
                                  max_iters=max_iters, tol=tol)
        gammas[i] = gammad
        np.add.at(sstats, (slice(None), ids), part)
    sstats *= exp_elogbeta
    return gammas, sstats


def m_step(sstats: np.ndarray, eta: float) -> np.ndarray:
    """Batch M-step: lambda = eta + summed sufficient statistics."""
    return eta + sstats


def bound_batch(docs: list[tuple[np.ndarray, np.ndarray]],
                gammas: np.ndarray, lam: np.ndarray, alpha: float,
                ) -> tuple[float, int]:
    """Per-batch contribution to the corpus variational bound's
    word-likelihood term: sum_d sum_w cts * log(sum_k exp(Elogtheta_dk
    + Elogbeta_kw)).  Returns (loglik, n_tokens); perplexity =
    exp(-loglik / n_tokens) over the summed corpus totals (the same
    token-normalized bound gensim's log_perplexity exposes, per
    Hoffman et al. eq. 4 word term)."""
    elogbeta = dirichlet_expectation(lam)
    total = 0.0
    n_tokens = 0
    for (ids, cts), gammad in zip(docs, gammas):
        if len(ids) == 0:
            continue
        elogthetad = dirichlet_expectation(gammad)
        # log sum_k exp(...) per word, stable
        mat = elogthetad[:, None] + elogbeta[:, ids]
        mx = mat.max(axis=0)
        total += float((cts * (np.log(np.exp(mat - mx).sum(axis=0)) + mx)).sum())
        n_tokens += int(cts.sum())
    return total, n_tokens
