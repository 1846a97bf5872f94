"""Connected components over the candidate-edge stream.

Ray Data has no native union-find; the scalable shape (cf. BTS, ICDE
2024 — load-balanced distributed union-find via partial spanning
forests) is:

1. a *spanning-forest reduction* ``map_batches`` pass: each edge block
   collapses to the spanning forest of the nodes it touches (≤ nodes-1
   edges, usually far fewer than the input edges because verified
   candidate pairs arrive highly duplicated across bands);
2. a driver-side final union-find over the reduced edge stream,
   consumed with ``iter_batches`` (never ``take_all`` on raw edges).

The reduction can be applied repeatedly (tree reduce) for larger edge
volumes; one distributed pass + driver finish is sufficient here and the
knob is ``reduce_rounds``.

Canonical cluster id = min(image_id) of the component — deterministic
and independent of edge arrival order, replacing kmcp's QueryIdx-based
output ordering (reference: kmcp/cmd/search.go:733-781) with a
content-derived label.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


class UnionFind:
    """Dict-based union-find with path halving; roots track min member id."""

    __slots__ = ("parent",)

    def __init__(self):
        self.parent: dict = {}

    def find(self, x):
        p = self.parent
        if x not in p:
            p[x] = x
            return x
        while p[x] != x:
            p[x] = p[p[x]]
            x = p[x]
        return x

    def union(self, a, b) -> bool:
        ra, rb = self.find(a), self.find(b)
        if ra == rb:
            return False
        # union by min id → the root IS the canonical cluster id
        if rb < ra:
            ra, rb = rb, ra
        self.parent[rb] = ra
        return True

    def components(self) -> dict:
        """node → canonical (min-id) root, for every node ever seen."""
        return {x: self.find(x) for x in list(self.parent)}

    def spanning_edges(self):
        """One (root, node) edge per non-root node — a spanning forest."""
        out_a, out_b = [], []
        for x in list(self.parent):
            r = self.find(x)
            if r != x:
                out_a.append(r)
                out_b.append(x)
        return out_a, out_b


def numpy_components(a: np.ndarray, b: np.ndarray):
    """Vectorized connected components over string edge arrays.

    Returns (node_ids, canonical_ids): for every node appearing in an
    edge, the lexicographically-smallest id of its component.  Min-label
    propagation with pointer jumping — O(E log V) numpy ops, no
    per-edge Python.
    """
    import pandas as pd
    if len(a) == 0:
        return np.empty(0, object), np.empty(0, object)
    codes, uniques = pd.factorize(np.concatenate([a, b]))
    uniques = np.asarray(uniques, dtype=object)
    m = len(a)
    # re-index nodes by string rank so numeric min-label == min-id
    order = np.argsort(uniques, kind="stable")
    rank = np.empty(len(uniques), dtype=np.int64)
    rank[order] = np.arange(len(uniques))
    ea, eb = rank[codes[:m]], rank[codes[m:]]
    labels = np.arange(len(uniques), dtype=np.int64)
    while True:
        before = labels.copy()
        mn = np.minimum(labels[ea], labels[eb])
        np.minimum.at(labels, ea, mn)
        np.minimum.at(labels, eb, mn)
        while True:
            nl = labels[labels]
            if np.array_equal(nl, labels):
                break
            labels = nl
        if np.array_equal(labels, before):
            break
    sorted_uniques = uniques[order]
    return sorted_uniques, sorted_uniques[labels]


def spanning_forest_batch(batch: pa.Table) -> pa.Table:
    """map_batches reducer: edge block → spanning forest of that block
    (one root→node edge per non-root node)."""
    a = batch.column("id_a").to_numpy(zero_copy_only=False)
    b = batch.column("id_b").to_numpy(zero_copy_only=False)
    nodes, roots = numpy_components(a, b)
    keep = nodes != roots
    return pa.table({"id_a": pa.array(roots[keep], pa.string()),
                     "id_b": pa.array(nodes[keep], pa.string())})


def connected_components(edges_ds, reduce_rounds: int = 1,
                         reduce_batch_size: int = 1 << 20) -> dict:
    """edges Dataset (id_a, id_b, ...) → {node: canonical_cluster_id}.

    Streams through ``reduce_rounds`` distributed spanning-forest passes,
    then finishes on the driver over the (much smaller) forest stream.
    """
    ds = edges_ds.select_columns(["id_a", "id_b"])
    for _ in range(max(0, reduce_rounds)):
        ds = ds.map_batches(spanning_forest_batch, batch_format="pyarrow",
                            batch_size=reduce_batch_size)
    parts_a, parts_b = [], []
    for batch in ds.iter_batches(batch_size=reduce_batch_size,
                                 batch_format="pyarrow"):
        parts_a.append(batch.column("id_a").to_numpy(zero_copy_only=False))
        parts_b.append(batch.column("id_b").to_numpy(zero_copy_only=False))
    if not parts_a:
        return {}
    nodes, roots = numpy_components(np.concatenate(parts_a),
                                    np.concatenate(parts_b))
    return dict(zip(nodes, roots))
