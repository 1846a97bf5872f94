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


def _min_label_per_node(rows_ds, P: int):
    """(node, label) rows → one (node, min label) row per node via one
    packed exchange keyed by node."""
    import pandas as pd
    from kmcp_ray.exchange import Exchange, hash_part_fn

    ex = Exchange([("node", pa.string()), ("label", pa.string())], P)
    packed = rows_ds.map_batches(ex.make_pack_fn(
        hash_part_fn("node", P=P)), batch_format="pyarrow",
        zero_copy_batch=True)

    def mins(group: pa.Table) -> pa.Table:
        u = ex.unpack(group)
        node = u["node"].to_numpy(zero_copy_only=False)
        label = u["label"].to_numpy(zero_copy_only=False)
        order = np.lexsort((label, node))
        node_s, label_s = node[order], label[order]
        first = np.concatenate(([True], node_s[1:] != node_s[:-1])) \
            if len(node_s) else np.empty(0, bool)
        return pa.table({"node": pa.array(node_s[first], pa.string()),
                         "label": pa.array(label_s[first], pa.string())})

    return packed.groupby("part").map_groups(mins, batch_format="pyarrow")


def _label_signature(labels_ds) -> tuple:
    """(n_rows, additive content hash) — equal signatures across rounds
    ⇒ the labeling is stable (probabilistically exact)."""
    from kmcp_ray import hashing

    def sig(batch: pa.Table) -> pa.Table:
        node = batch.column("node").to_numpy(zero_copy_only=False)
        label = batch.column("label").to_numpy(zero_copy_only=False)
        h = hashing.splitmix64(hashing.hash_strings(node)
                               + hashing.hash_strings(label) * np.uint64(3))
        return pa.table({"n": pa.array([len(node)], pa.int64()),
                         "h": pa.array([int(h.sum() % (1 << 63))], pa.int64())})

    parts = labels_ds.map_batches(sig, batch_format="pyarrow",
                                  zero_copy_batch=True).to_pandas()
    return int(parts["n"].sum()), int(parts["h"].sum() % (1 << 63))


def labels_via_exchange(edges_ds, P: int = 64, max_rounds: int = 32):
    """Fully-distributed connected components: edges → (node,
    label=min-id of component) Dataset, no driver-side union-find.

    Hook + pointer-jump label propagation (the classic Shiloach-Vishkin
    shape on Datasets): each round (a) hooks every node to the minimum
    of its neighbors' labels and its own, (b) compresses label chains by
    one pointer-jump join; distance-to-root roughly halves per round, so
    rounds ≈ log2(longest chain).  All steps are packed exchanges; no
    per-row shuffle, nothing driver-resident.  Terminates when the label
    signature is stable.
    """
    from kmcp_ray.exchange import join_lookup

    arcs = edges_ds.map_batches(
        lambda t: pa.table({
            "node": pa.concat_arrays([
                t.column("id_a").combine_chunks().cast(pa.string()),
                t.column("id_b").combine_chunks().cast(pa.string())]),
            "nbr": pa.concat_arrays([
                t.column("id_b").combine_chunks().cast(pa.string()),
                t.column("id_a").combine_chunks().cast(pa.string())])}),
        batch_format="pyarrow", zero_copy_batch=True)

    # round 0: label(v) = min(v, min neighbor)
    labels = _min_label_per_node(
        arcs.map_batches(lambda t: pa.table({
            "node": pa.concat_arrays([t.column("node").combine_chunks(),
                                      t.column("node").combine_chunks()]),
            "label": pa.concat_arrays([t.column("node").combine_chunks(),
                                       t.column("nbr").combine_chunks()])}),
            batch_format="pyarrow", zero_copy_batch=True), P).materialize()
    prev_sig = _label_signature(labels)

    for _round in range(max_rounds):
        # (a) hook: candidate labels from neighbors' current labels
        nbr_labels = join_lookup(arcs, "nbr", labels, "node", "label",
                                 P, out_col="label", carry_col="node")
        cand = nbr_labels.map_batches(
            lambda t: pa.table({"node": t.column("node"),
                                "label": t.column("label")}),
            batch_format="pyarrow", zero_copy_batch=True)
        # materialize: consumed twice below (self-join) — a lazy
        # self-union deadlocks Ray's streaming executor in this release.
        # repartition bounds the block count, which otherwise grows ~4x
        # per round through the chained groupbys (each round's cost
        # would grow geometrically with scheduling overhead).
        hooked = _min_label_per_node(cand.union(labels), P) \
            .repartition(P).materialize()
        # (b) pointer jump: label(v) <- label(label(v))
        jumped = join_lookup(hooked, "label", hooked, "node", "label",
                             P, out_col="label2", carry_col="node")
        labels = jumped.map_batches(
            lambda t: pa.table({"node": t.column("node"),
                                "label": t.column("label2")}),
            batch_format="pyarrow", zero_copy_batch=True) \
            .repartition(P).materialize()
        sig = _label_signature(labels)
        if sig == prev_sig:
            break
        prev_sig = sig
    return labels


def connected_components_arrays(edges_ds, reduce_rounds: int = 1,
                                reduce_batch_size: int = 1 << 20):
    """edges Dataset (id_a, id_b, ...) → (nodes, canonical_ids) numpy
    arrays (only nodes touched by ≥1 edge).

    Streams through ``reduce_rounds`` distributed spanning-forest passes,
    then finishes on the driver over the (much smaller) forest stream.
    The array form feeds ``broadcast.build_map_table`` directly — no
    driver-side Python dict of every duplicate row.
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
        return np.empty(0, object), np.empty(0, object)
    return numpy_components(np.concatenate(parts_a),
                            np.concatenate(parts_b))


def connected_components(edges_ds, reduce_rounds: int = 1,
                         reduce_batch_size: int = 1 << 20) -> dict:
    """Dict view of :func:`connected_components_arrays` (small corpora /
    tests; the pipeline hot path uses the array form)."""
    nodes, roots = connected_components_arrays(
        edges_ds, reduce_rounds=reduce_rounds,
        reduce_batch_size=reduce_batch_size)
    return dict(zip(nodes, roots))


def triangle_count(pairs_ds, *, id_a: str = "id_a", id_b: str = "id_b",
                   P: int = 16):
    """Count triangles in an undirected edge set given as ordered pairs
    (``id_a < id_b``, ids < 2^31): returns a one-row Dataset
    ``(n_triangles,)``.  Density diagnostic for the dup-pair graph —
    near-duplicate clusters should be near-cliques, so a low
    triangle-to-wedge ratio flags LSH false-positive chains (the same
    cluster-quality role as kmcp's index-density diagnostics,
    reference: kmcp/cmd/index.go:640-667, semantics re-derived).

    Shape: the textbook two-join decomposition, both as partitioned
    :func:`kmcp_ray.joins.hash_join` exchanges — (1) wedges
    ``a<b<c`` from edges ⨝ edges on the middle vertex (ordered input
    makes every wedge emit exactly once), (2) a semi join of the packed
    ``a<<32|c`` closing edge against the edge set, then one count.
    Nothing broadcasts; wedge volume is Σ_v deg²(v) — pre-bound it
    upstream by capping bucket sizes, exactly as the LSH pipeline
    already does."""
    from kmcp_ray.joins import hash_join

    def pack_ac(t: pa.Table) -> pa.Table:
        a = t.column(id_a).to_numpy(zero_copy_only=False).astype(np.int64)
        c = t.column("id_c").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"ac": pa.array((a << np.int64(32)) | c,
                                        pa.int64())})

    def pack_edge(t: pa.Table) -> pa.Table:
        a = t.column(id_a).to_numpy(zero_copy_only=False).astype(np.int64)
        b = t.column(id_b).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"ac": pa.array((a << np.int64(32)) | b,
                                        pa.int64())})

    edges = pairs_ds.select_columns([id_a, id_b]).materialize()
    wedges = hash_join(
        edges, edges.map_batches(
            lambda t: t.rename_columns(["mid", "id_c"]),
            batch_format="pyarrow", zero_copy_batch=True),
        key=id_b, right_key="mid", how="inner",
        left_cols=[(id_a, pa.int64())],
        right_cols=[("id_c", pa.int64())], P=P)
    closing = wedges.map_batches(pack_ac, batch_format="pyarrow",
                                 zero_copy_batch=True)
    tri = hash_join(
        closing, edges.map_batches(pack_edge, batch_format="pyarrow",
                                   zero_copy_batch=True),
        key="ac", how="semi", P=P)
    n = tri.count()
    import ray.data
    return ray.data.from_arrow(pa.table(
        {"n_triangles": pa.array([n], pa.int64())}))
