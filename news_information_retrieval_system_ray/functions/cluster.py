"""Clustering kernels — HAC, star, and co-occurrence clustering.

Reference semantics reproduced from
/root/reference/src/ir/cluster/doc_cluster.py and term_cluster.py:

- ``hac`` (doc_cluster.py:252-376): agglomerative merge loop — every
  round scans cluster pairs in insertion order, merges the FIRST pair
  with the strictly highest linkage score (single=max / complete=min /
  average=mean over the full cross product, missing pair sim = 0.0,
  matching the reference's dense matrix where disjoint docs score 0),
  until k clusters remain.
- ``star_clusters`` (term_cluster.py:193-296): greedy star clustering —
  potential(t) = #terms with sim >= threshold (self included, the
  reference matrix stores (t,t)=1.0); repeatedly pick the unclustered
  term with max potential (first wins on ties, input order) as center
  and absorb its unclustered neighbors in input order.
- ``cooccurrence_clusters`` (term_cluster.py:411-490): greedy in input
  term order; a center absorbs terms co-occurring >= min_cooccurrence.

These kernels run driver-side over SMALL inputs (cluster counts,
top-N vocab, pre-aggregated pair similarities); the O(N²) pair
statistics they consume are produced by distributed stages (see
analytics.doc_hac_clusters / term_star_clusters).
"""

from __future__ import annotations


def hac(doc_ids: list[int], sim_matrix, k: int,
        linkage: str = "complete") -> dict[int, int]:
    """Agglomerative clustering -> {doc_id: cluster_id}.

    ``sim_matrix`` is a dense (n, n) array aligned to ``doc_ids`` order
    (missing pairs must be pre-filled with 0.0, mirroring the
    reference's dense matrix where disjoint docs score 0).  The merge
    loop is the reference's exactly — first strictly-best pair in
    insertion order wins — with the linkage reduction vectorized via
    matrix slicing.  Cluster ids are relabeled 0..k-1 by ascending min
    member id (stable output)."""
    import numpy as np

    if linkage not in ("single", "complete", "average"):
        raise ValueError(f"Unknown linkage: {linkage}")
    if k >= len(doc_ids):
        return {d: i for i, d in enumerate(doc_ids)}
    S = np.asarray(sim_matrix, dtype=np.float64)
    red = {"single": np.max, "complete": np.min, "average": np.mean}[linkage]
    # cluster id -> member row indices (insertion-ordered dict, as ref)
    clusters: dict[int, list[int]] = {i: [i] for i in range(len(doc_ids))}
    counter = len(doc_ids)
    while len(clusters) > k:
        best_pair = None
        best_sim = float("-inf")
        cids = list(clusters.keys())
        for i in range(len(cids)):
            m1 = clusters[cids[i]]
            for j in range(i + 1, len(cids)):
                s = float(red(S[np.ix_(m1, clusters[cids[j]])]))
                if s > best_sim:
                    best_sim = s
                    best_pair = (cids[i], cids[j])
        if best_pair is None:
            break
        a, b = best_pair
        merged = clusters.pop(a) + clusters.pop(b)
        clusters[counter] = merged
        counter += 1
    ordered = sorted(([doc_ids[i] for i in m] for m in clusters.values()), key=min)
    return {d: cid for cid, members in enumerate(ordered) for d in members}


def star_clusters(terms: list[str], sims: dict[tuple[str, str], float],
                  threshold: float = 0.7) -> list[tuple[str, list[str]]]:
    """Greedy star clustering -> [(center, members incl. center), ...]
    in creation order.  ``sims`` is symmetric-keyed (lookup tries both
    orders); missing = 0; self-sim is implicitly 1."""

    def sim(a: str, b: str) -> float:
        if a == b:
            return 1.0
        return sims.get((a, b), sims.get((b, a), 0.0))

    potential = {t: sum(1 for o in terms if sim(t, o) >= threshold) for t in terms}
    out: list[tuple[str, list[str]]] = []
    done: set[str] = set()
    while len(done) < len(terms):
        center = None
        best = -1
        for t in terms:
            if t not in done and potential[t] > best:
                best = potential[t]
                center = t
        if center is None:
            break
        members = [center]
        done.add(center)
        for t in terms:
            if t not in done and sim(center, t) >= threshold:
                members.append(t)
                done.add(t)
        out.append((center, members))
    return out


def cooccurrence_clusters(terms: list[str],
                          cooc: dict[tuple[str, str], int],
                          min_cooccurrence: int = 2) -> list[tuple[str, list[str]]]:
    """Greedy co-occurrence clustering in input term order ->
    [(center, members incl. center), ...]."""

    def count(a: str, b: str) -> int:
        return cooc.get((a, b), cooc.get((b, a), 0))

    out: list[tuple[str, list[str]]] = []
    done: set[str] = set()
    for term in terms:
        if term in done:
            continue
        members = [term]
        done.add(term)
        for other in terms:
            if other not in done and count(term, other) >= min_cooccurrence:
                members.append(other)
                done.add(other)
        out.append((term, members))
    return out


def edit_distance(a: str, b: str) -> int:
    """Levenshtein distance (term_cluster.py:79-143, classic DP)."""
    if a == b:
        return 0
    if not a:
        return len(b)
    if not b:
        return len(a)
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def edit_similarity(a: str, b: str) -> float:
    """1 - normalized edit distance (term_cluster.py:144-162)."""
    mx = max(len(a), len(b))
    return 1.0 - edit_distance(a, b) / mx if mx else 1.0
