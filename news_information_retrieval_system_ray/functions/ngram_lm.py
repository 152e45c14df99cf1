"""N-gram language model with smoothing + perplexity.

Reference semantics reproduced from
/root/reference/src/ir/langmodel/ngram.py:

- counts (:128-194): sliding window of n over each token sequence;
  ngram/context counts, collection model P(w|C) = cf(w)/|C|.
- smoothing (:224-347): MLE count(ngram)/count(context); Laplace
  (+1 / +V); Jelinek-Mercer ``λ*P_ML + (1-λ)*P(w|C)`` (λ=0.7);
  Dirichlet ``(count + μ*P(w|C)) / (context_count + μ)`` (μ=2000).
  Unseen words fall back to uniform 1/V in the collection model.
- sentence probability (:349-376): (n-1) ``<START>`` pads, product of
  conditional probabilities in log space.
- perplexity (:378-421): ``2^(-mean log2 P)`` over events with P>0.

The model object holds only the (vocab-sized) count dictionaries; at
scale those come out of distributed aggregates (see
analytics.ngram_lm_perplexity) and the per-text scoring is a cheap
driver/actor-side lookup loop.
"""

from __future__ import annotations

import math
import re
from collections import Counter

START = "<START>"
_TOKEN_RE = re.compile(r"[一-鿿]+|[a-zA-Z0-9]+")


def default_tokenizer(text: str) -> list[str]:
    """The reference's baseline tokenizer (ngram.py:121-126)."""
    return _TOKEN_RE.findall(text.lower())


class NGramLM:
    def __init__(self, n: int = 2, smoothing: str = "laplace",
                 lambda_param: float = 0.7, mu_param: float = 2000.0):
        if n < 1:
            raise ValueError("n must be >= 1")
        self.n = n
        self.smoothing = smoothing
        self.lambda_param = lambda_param
        self.mu_param = mu_param
        self.ngram_counts: dict[tuple, int] = {}
        self.context_counts: dict[tuple, int] = {}
        self.collection_probs: dict[str, float] = {}
        self.vocab: set[str] = set()
        self.total_ngrams = 0
        self.total_unigrams = 0

    # ------------------------------------------------------------ build
    def train(self, token_seqs: list[list[str]]) -> "NGramLM":
        """In-memory training (ngram.py:128-194); the distributed path
        instead aggregates the same counts with Ray and loads them via
        ``from_counts``."""
        uni: Counter = Counter()
        for toks in token_seqs:
            uni.update(toks)
        self.total_unigrams = sum(uni.values())
        self.vocab = set(uni)
        self.collection_probs = {w: c / self.total_unigrams for w, c in uni.items()}
        ng: Counter = Counter()
        ctx: Counter = Counter()
        total = 0
        for toks in token_seqs:
            for i in range(len(toks) - self.n + 1):
                gram = tuple(toks[i: i + self.n])
                ng[gram] += 1
                if self.n > 1:
                    ctx[gram[:-1]] += 1
                total += 1
        self.ngram_counts = dict(ng)
        self.context_counts = dict(ctx)
        self.total_ngrams = total
        return self

    @classmethod
    def from_counts(cls, n: int, ngram_counts: dict[tuple, int],
                    context_counts: dict[tuple, int],
                    unigram_counts: dict[str, int], *,
                    smoothing: str = "laplace", lambda_param: float = 0.7,
                    mu_param: float = 2000.0) -> "NGramLM":
        """Build from pre-aggregated (distributed) count tables."""
        m = cls(n=n, smoothing=smoothing, lambda_param=lambda_param, mu_param=mu_param)
        m.ngram_counts = dict(ngram_counts)
        m.context_counts = dict(context_counts)
        m.total_ngrams = sum(ngram_counts.values())
        m.total_unigrams = sum(unigram_counts.values())
        m.vocab = set(unigram_counts)
        m.collection_probs = {w: c / m.total_unigrams for w, c in unigram_counts.items()}
        return m

    # ------------------------------------------------------------ score
    def _mle(self, gram: tuple, context: tuple) -> float:
        c_ng = self.ngram_counts.get(gram, 0)
        c_ctx = self.context_counts.get(context, 0) if context else self.total_ngrams
        return c_ng / c_ctx if c_ctx else 0.0

    def probability(self, context: tuple, word: str) -> float:
        gram = (*context, word)
        if self.smoothing == "laplace":
            c_ng = self.ngram_counts.get(gram, 0)
            c_ctx = self.context_counts.get(context, 0) if context else self.total_ngrams
            return (c_ng + 1) / (c_ctx + len(self.vocab))
        if self.smoothing == "jm":
            p_ml = self._mle(gram, context)
            p_c = self.collection_probs.get(word, 1.0 / len(self.vocab))
            return self.lambda_param * p_ml + (1 - self.lambda_param) * p_c
        if self.smoothing == "dirichlet":
            c_ng = self.ngram_counts.get(gram, 0)
            c_ctx = self.context_counts.get(context, 0) if context else self.total_ngrams
            p_c = self.collection_probs.get(word, 1.0 / len(self.vocab))
            den = c_ctx + self.mu_param
            return (c_ng + self.mu_param * p_c) / den if den > 0 else 0.0
        return self._mle(gram, context)  # 'mle'

    def log_probability(self, context: tuple, word: str) -> float:
        p = self.probability(context, word)
        return math.log(p) if p > 0 else float("-inf")

    def sentence_probability(self, tokens: list[str]) -> float:
        """Π P(w_i | context) with (n-1) START pads (ngram.py:349-376)."""
        if not tokens:
            return 0.0
        padded = [START] * (self.n - 1) + list(tokens)
        lp = 0.0
        for i in range(self.n - 1, len(padded)):
            lp += self.log_probability(tuple(padded[i - self.n + 1: i]), padded[i])
        return math.exp(lp)

    def perplexity(self, tokens: list[str]) -> float:
        """2^(-mean log2 P) over events with P>0 (ngram.py:378-421)."""
        if not tokens:
            return float("inf")
        padded = [START] * (self.n - 1) + list(tokens)
        s = 0.0
        cnt = 0
        for i in range(self.n - 1, len(padded)):
            p = self.probability(tuple(padded[i - self.n + 1: i]), padded[i])
            if p > 0:
                s += math.log2(p)
                cnt += 1
        if cnt == 0:
            return float("inf")
        return 2 ** (-(s / cnt))

    def generate(self, context: tuple, max_len: int = 20,
                 seed: int | None = None) -> list[str]:
        """Sample a continuation of ``context`` (ngram.py:423-465).

        Candidates are restricted to OBSERVED n-grams for the current
        (n-1)-token window; the next word is drawn proportional to its
        smoothed probability.  Unlike the reference's ``random.choices``
        this takes an explicit ``seed`` so generation is reproducible
        (and, with seed=None, greedy argmax — deterministic by
        construction, ties broken lexicographically).
        """
        import numpy as np

        rng = np.random.default_rng(seed) if seed is not None else None
        generated = list(context)
        # observed continuations per context: derived once from the
        # trained n-gram table (no vocab scan per step as in the
        # reference's O(V) loop)
        conts: dict[tuple, list[str]] = {}
        for gram in self.ngram_counts:
            conts.setdefault(gram[:-1], []).append(gram[-1])
        for _ in range(max_len):
            cur = tuple(generated[-(self.n - 1):]) if self.n > 1 else ()
            words = sorted(conts.get(cur, ()))
            if not words:
                break
            probs = np.array([self.probability(cur, w) for w in words])
            tot = probs.sum()
            if tot <= 0:
                break
            if rng is None:
                nxt = words[int(np.argmax(probs))]
            else:
                nxt = words[int(rng.choice(len(words), p=probs / tot))]
            generated.append(nxt)
        return generated[len(context):]
