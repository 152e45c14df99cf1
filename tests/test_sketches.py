"""HyperLogLog / Count-Min sketches (stages/sketches.py): estimator
accuracy, merge associativity, CMS one-sided error."""

import numpy as np
import pandas as pd
import pytest

from news_information_retrieval_system_ray.stages.sketches import (
    CMS_D,
    CMS_W,
    _md5_u64,
    cms_term_counts,
    hll_distinct_terms,
    hll_estimate,
    hll_partial,
)


def test_hll_accuracy_bands():
    # standard error ~1.04/sqrt(256) = 6.5%; assert a generous 4-sigma
    for n in (50, 500, 5000, 50000):
        regs = hll_partial([f"term{i}" for i in range(n)])
        est = hll_estimate(regs)
        assert abs(est - n) / n < 0.26, (n, est)


def test_hll_merge_associative():
    a = [f"x{i}" for i in range(1000)]
    b = [f"y{i}" for i in range(1000)]
    whole = hll_partial(a + b)
    pa_, pb = hll_partial(a), hll_partial(b)
    merged = dict(pa_)
    for k, v in pb.items():
        merged[k] = max(merged.get(k, 0), v)
    assert merged == whole
    # duplicates never change registers
    assert hll_partial(a + a) == pa_


def test_hll_dataset_wrapper(tmp_path):
    import ray.data as rd

    ex = rd.from_pandas(pd.DataFrame({
        "term": [f"t{i % 700}" for i in range(5000)],
        "tf": [1] * 5000}))
    out = hll_distinct_terms(ex)
    assert len(out) == 1
    assert abs(out["estimate"].iloc[0] - 700) / 700 < 0.26


def test_cms_never_underestimates_and_tight_when_sparse():
    import ray.data as rd

    rng = np.random.default_rng(5)
    terms = [f"w{i}" for i in range(50)]
    cf = {t: int(rng.integers(1, 200)) for t in terms}
    rows = [{"term": t, "tf": c} for t, c in cf.items()]
    ex = rd.from_pandas(pd.DataFrame(rows))
    out = cms_term_counts(ex, terms).set_index("term")["est_count"]
    for t in terms:
        assert out[t] >= cf[t]                  # one-sided error
    # with 50 terms in 4x1024 cells, collisions are rare: most exact
    exact = sum(1 for t in terms if out[t] == cf[t])
    assert exact >= 45


def test_cms_hash_stability():
    # pinned md5 row hashes: regression guard for the SQL twin
    assert _md5_u64("0:spark") % CMS_W == (
        int.from_bytes(__import__("hashlib").md5(b"0:spark").digest()[:8],
                       "big") % CMS_W)
