"""SMART term-weighting schemes (reference
/root/reference/src/ir/index/term_weighting.py:101-189 and the
``ltc/lnc/...`` scheme setter, vsm.py:300-338).

Scheme string is 3 letters: tf ∈ {n, l, a, b}, idf ∈ {n, t, p},
normalization ∈ {n, c}:

- tf:  n = tf; l = 1 + log10(tf); a = 0.5 + 0.5*tf/max_tf; b = 1 if tf>0
- idf: n = 1; t = log10(N/df); p = max(0, log10((N-df)/df))
- norm: n = none; c = cosine (L2)

``smart_vector`` weights one document's tf map; ``cosine`` scores two
weighted vectors.
"""

from __future__ import annotations

import math


def _tf_weight(tf: float, max_tf: float, scheme: str) -> float:
    if tf <= 0:
        return 0.0
    if scheme == "n":
        return tf
    if scheme == "l":
        return 1.0 + math.log10(tf)
    if scheme == "a":
        return 0.5 + 0.5 * tf / max_tf
    if scheme == "b":
        return 1.0
    raise ValueError(f"unknown tf scheme {scheme!r}")


def _idf_weight(df: int, n_docs: int, scheme: str) -> float:
    if scheme == "n":
        return 1.0
    if df <= 0:
        return 0.0
    if scheme == "t":
        return math.log10(n_docs / df)
    if scheme == "p":
        return max(0.0, math.log10((n_docs - df) / df)) if df < n_docs else 0.0
    raise ValueError(f"unknown idf scheme {scheme!r}")


def smart_vector(tf_map: dict[str, int], df_map: dict[str, int], n_docs: int,
                 scheme: str = "ltc") -> dict[str, float]:
    """Weight one document's term->tf map under a SMART scheme."""
    if len(scheme) != 3:
        raise ValueError(f"scheme must be 3 letters, got {scheme!r}")
    tf_s, idf_s, norm_s = scheme
    if norm_s not in ("n", "c"):
        raise ValueError(f"unknown normalization {norm_s!r}")
    max_tf = max(tf_map.values(), default=1)
    out = {}
    for t, tf in tf_map.items():
        w = _tf_weight(tf, max_tf, tf_s) * _idf_weight(df_map.get(t, 0), n_docs, idf_s)
        if w != 0.0:
            out[t] = w
    if norm_s == "c" and out:
        nrm = math.sqrt(sum(v * v for v in out.values()))
        if nrm > 0:
            out = {t: v / nrm for t, v in out.items()}
    return out


def cosine(a: dict[str, float], b: dict[str, float]) -> float:
    """Dot product of weighted vectors (cosine when both L2-normalized,
    term_weighting.py:271-316)."""
    if len(b) < len(a):
        a, b = b, a
    return sum(v * b.get(t, 0.0) for t, v in a.items())
