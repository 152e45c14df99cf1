"""Banded Levenshtein + FuzzyMatcher expand/get_stats semantics
(reference fuzzy.py:63-278)."""

import random

import pytest

from news_information_retrieval_system_ray.pipelines.analytics import (
    _levenshtein_banded,
)


def _lev_full(a: str, b: str) -> int:
    """Reference full-DP Levenshtein (fuzzy.py:63-128)."""
    m, n = len(a), len(b)
    dp = [[0] * (n + 1) for _ in range(m + 1)]
    for i in range(m + 1):
        dp[i][0] = i
    for j in range(n + 1):
        dp[0][j] = j
    for i in range(1, m + 1):
        for j in range(1, n + 1):
            if a[i - 1] == b[j - 1]:
                dp[i][j] = dp[i - 1][j - 1]
            else:
                dp[i][j] = 1 + min(dp[i][j - 1], dp[i - 1][j], dp[i - 1][j - 1])
    return dp[m][n]


CASES = [
    ("", "", 0), ("a", "", 1), ("", "ab", 2),
    ("test", "test", 0), ("test", "tests", 1), ("test", "text", 1),
    ("test", "rest", 1), ("test", "tset", 2), ("kitten", "sitting", 3),
    ("part", "spark", 2), ("part", "parts", 1), ("ab", "ba", 2),
]


@pytest.mark.parametrize("a,b,d", CASES)
def test_banded_matches_full_dp_fixed(a, b, d):
    assert _lev_full(a, b) == d
    for maxd in (1, 2, 3):
        got = _levenshtein_banded(a, b, maxd)
        if d <= maxd:
            assert got == d
        else:
            assert got > maxd


def test_banded_matches_full_dp_random():
    rng = random.Random(7)
    alpha = "abcd"
    for _ in range(500):
        a = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 8)))
        b = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 8)))
        d = _lev_full(a, b)
        for maxd in (1, 2):
            got = _levenshtein_banded(a, b, maxd)
            assert (got == d) if d <= maxd else (got > maxd), (a, b, maxd)


def test_banded_symmetry():
    for a, b, _ in CASES:
        assert _levenshtein_banded(a, b, 2) == _levenshtein_banded(b, a, 2)


def test_expand_cap_and_order(tmp_path):
    """fuzzy_expand sorts by (dist, term) and caps at max_expansions
    (spec-tightened deterministic cap, fuzzy.py:170-188)."""
    import pandas as pd
    import ray.data as rd

    from news_information_retrieval_system_ray.pipelines import analytics as A

    docs = pd.DataFrame({
        "doc_id": range(6),
        "text": ["cat bat rat hat mat catt"] * 6,
        "source": ["s"] * 6, "lang": ["en"] * 6,
    })
    p = tmp_path / "documents.parquet"
    docs.to_parquet(p)
    out = A.fuzzy_expand(str(tmp_path), term="cat", max_distance=2,
                         max_expansions=3)
    # dist 0: cat; dist 1: bat, catt, hat, mat, rat -> cap 3 keeps
    # (0,'cat'), (1,'bat'), (1,'catt')
    assert list(out["term"]) == ["cat", "bat", "catt"]
    assert list(out["dist"]) == [0, 1, 1]
    groups = A.fuzzy_distance_groups(str(tmp_path), term="cat", max_distance=2)
    got = dict(zip(groups["dist"], groups["n_terms"]))
    assert got[0] == 1 and got[1] == 5
