"""UPGMA hierarchical clustering — equivalent of upgma.h / pbcluster_upgma.pl.

Used by the reference's read-clustering helper scripts to group reads by
pairwise similarity (e.g. haplotype phasing experiments).  Distances come
from overlap identities; clustering is plain average-linkage UPGMA.
"""

from __future__ import annotations

import numpy as np


def upgma(dist: np.ndarray):
    """Average-linkage clustering of a symmetric distance matrix.

    Returns a list of merge records (a, b, height, size) in scipy-linkage
    style, with cluster ids: leaves 0..n-1, internal nodes n, n+1, ...
    """
    n = dist.shape[0]
    d = dist.astype(np.float64).copy()
    np.fill_diagonal(d, np.inf)
    active = {i: (i, 1) for i in range(n)}  # row index -> (cluster id, size)
    merges = []
    next_id = n
    rows = list(range(n))
    while len(rows) > 1:
        sub = d[np.ix_(rows, rows)]
        k = np.argmin(sub)
        i, j = divmod(int(k), len(rows))
        if i == j:
            break
        ri, rj = rows[i], rows[j]
        ci, si = active[ri]
        cj, sj = active[rj]
        h = float(sub[i, j])
        merges.append((ci, cj, h, si + sj))
        # average-linkage update into row ri
        for rk in rows:
            if rk in (ri, rj):
                continue
            d[ri, rk] = d[rk, ri] = (si * d[ri, rk] + sj * d[rj, rk]) / (si + sj)
        active[ri] = (next_id, si + sj)
        next_id += 1
        rows.remove(rj)
    return merges


def cluster_reads_by_overlaps(n_reads: int, overlaps, max_dist: float = 1.0):
    """Distance = 1 - identity for overlapping pairs, max_dist otherwise."""
    d = np.full((n_reads, n_reads), max_dist, np.float64)
    np.fill_diagonal(d, 0.0)
    for ov in overlaps:
        v = max(0.0, 1.0 - min(1.0, ov.identity))
        d[ov.rid1, ov.rid2] = d[ov.rid2, ov.rid1] = min(d[ov.rid1, ov.rid2], v)
    return upgma(d)


def cut_clusters(merges, n_leaves: int, height: float):
    """Flat clusters at the given height; returns leaf -> cluster label."""
    parent = {}
    heights = {}
    for idx, (a, b, h, size) in enumerate(merges):
        nid = n_leaves + idx
        heights[nid] = h
        if h <= height:
            parent[a] = nid
            parent[b] = nid
    label = {}
    for leaf in range(n_leaves):
        cur = leaf
        while cur in parent:
            cur = parent[cur]
        label[leaf] = cur
    # renumber
    remap = {}
    out = {}
    for leaf, c in label.items():
        out[leaf] = remap.setdefault(c, len(remap))
    return out
