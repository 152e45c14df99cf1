"""Probabilistic sketches for corpus-scale cardinality/frequency
estimation — deterministic (md5-keyed) so both the distributed run and
the DuckDB oracle compute bit-identical registers.

- HyperLogLog (Flajolet et al. 2007): p=8 -> m=256 registers;
  ``bucket = h >> 56``, ``rho = 57 - bit_length(h mod 2^56)`` (the
  leading-zero count of the remaining 56 bits, + 1; 57 when they are
  all zero); estimate ``alpha_m * m^2 / sum 2^-M[j]``
  with the small-range ``m * ln(m / V)`` correction.  Distributed form:
  per-batch partial registers (a batch's unique terms -> max-rho per
  bucket), then a tiny (256 x n_batches) driver max-merge — duplicates
  across batches cannot raise a register, so streaming merges are
  exact.
- Count-Min (Cormode & Muthukrishnan 2005): d=4 rows x w=1024 cells,
  ``h_i(t) = md5("{i}:{t}") % w``; cells accumulate collection
  frequency; a point estimate is the min over rows — never an
  underestimate.  Distributed form: per-batch partial (row, cell,
  count) triples, summed by a tiny (4096-key) aggregate.

At 100 TB both sketches keep their fixed O(m)/O(d*w) footprint per
task and merge associatively — the whole corpus never concentrates
anywhere.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd
import pyarrow as pa

HLL_P = 8
HLL_M = 1 << HLL_P
CMS_D = 4
CMS_W = 1024


def _md5_u64(s: str) -> int:
    return int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:8], "big")


def hll_partial(terms: list[str]) -> dict[int, int]:
    """bucket -> max rho over the given terms."""
    regs: dict[int, int] = {}
    for t in set(terms):
        h = _md5_u64(t)
        bucket = h >> (64 - HLL_P)
        w = h & ((1 << (64 - HLL_P)) - 1)   # low 56 bits
        rho = (64 - HLL_P + 1) - w.bit_length()  # 57 when w == 0
        if rho > regs.get(bucket, 0):
            regs[bucket] = rho
    return regs


def hll_estimate(regs: dict[int, int]) -> float:
    """The HLL estimator with the small-range correction."""
    m = HLL_M
    alpha = 0.7213 / (1.0 + 1.079 / m)
    s = sum(2.0 ** -rho for rho in regs.values()) + (m - len(regs))
    est = alpha * m * m / s
    v = m - len(regs)
    if est <= 2.5 * m and v > 0:
        est = m * math.log(m / v)
    return est


def hll_distinct_terms(exploded_ds) -> pd.DataFrame:
    """One row: (n_registers_hit, estimate round4) for the distinct
    terms of an exploded (doc_id, term, ...) Dataset."""

    def part(t: pa.Table) -> pa.Table:
        regs = hll_partial(t.column("term").to_pylist())
        return pa.table({
            "bucket": pa.array(list(regs), pa.int64()),
            "rho": pa.array(list(regs.values()), pa.int64())})

    parts = exploded_ds.map_batches(part, batch_format="pyarrow").to_pandas()
    regs = parts.groupby("bucket")["rho"].max().to_dict() if len(parts) else {}
    from ..pipelines.analytics import round4

    return pd.DataFrame({
        "n_registers_hit": np.array([len(regs)], np.int64),
        "estimate": [round4(hll_estimate(regs))]})


def cms_term_counts(exploded_ds, query_terms: list[str]) -> pd.DataFrame:
    """(term, est_count) — Count-Min point estimates of collection
    frequency for ``query_terms`` (integers: exact-hashable)."""

    def part(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({"term": t.column("term").to_pandas(),
                           "tf": t.column("tf").to_pandas()})
        agg = df.groupby("term", sort=False)["tf"].sum()
        rows_r, rows_c, rows_n = [], [], []
        for term, cf in agg.items():
            for i in range(CMS_D):
                rows_r.append(i)
                rows_c.append(_md5_u64(f"{i}:{term}") % CMS_W)
                rows_n.append(int(cf))
        return pa.table({"row": pa.array(rows_r, pa.int64()),
                         "cell": pa.array(rows_c, pa.int64()),
                         "cnt": pa.array(rows_n, pa.int64())})

    parts = exploded_ds.map_batches(part, batch_format="pyarrow").to_pandas()
    cells = parts.groupby(["row", "cell"])["cnt"].sum().to_dict()
    out = []
    for term in query_terms:
        est = min(cells.get((i, _md5_u64(f"{i}:{term}") % CMS_W), 0)
                  for i in range(CMS_D))
        out.append((term, int(est)))
    return pd.DataFrame(out, columns=["term", "est_count"]).astype(
        {"est_count": np.int64})
