"""Distributed k-means + SemDeDup-style semantic near-duplicate pruning.

Beyond-reference training-data operators (the reference has no embedding
stage; its closest analogue is the profile stage's broadcast per-target
accumulator state, kmcp/cmd/profile.go:730 — semantics re-derived, not
translated).  Public-method background: spherical k-means / Lloyd
iterations and cluster-then-prune semantic deduplication as published in
SemDeDup (Abbas et al., 2023, arXiv:2303.09540).

Scale shape
-----------
``kmeans_fit`` is the distributed full-corpus Lloyd refinement: each
iteration is ONE ``map_batches`` pass emitting k x (dim+1) *melted*
integer partial rows per batch (cluster, dim, ssum) and one tiny
``groupby(["cluster","dim"]).sum()`` — the corpus itself never
shuffles, centroids travel by broadcast (``ray.put``).  Partial sums
are fixed-point int64 (scale 2^20 on unit-normalized vectors), so the
reduction is exact and ORDER-INDEPENDENT: refits are bit-reproducible
regardless of block scheduling (float accumulation order varies
between runs; integers don't).  Overflow bound: |sum| <=
rows_per_cluster * 2^20 — safe to ~8.8e12 rows per cluster in int64.

``semantic_dedup`` = fit -> broadcast-argmax assign -> per-cluster
cosine-threshold connected components (min-id representative) inside
``groupby("cluster").map_groups``.  Within a group the adjacency is
processed in row chunks (memory O(chunk * group)), min-label
propagation converges to the component minimum.  Like SemDeDup, pairs
split across clusters by the k-means partition are by-design misses —
recall vs the exact pair predicate is measured in tests, and the
label-grouped variant (``group_semantic_dedup`` with a categorical
group column) is exact within groups and SQL-mirrorable.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from kmcp_ray.ann import _emb_matrix, _normalize, train_ivf_centroids

#: fixed-point scale for the exact integer partial-sum reduction.
_FP_SHIFT = 20
_FP_SCALE = float(1 << _FP_SHIFT)


def _melt_partials(assign: np.ndarray, m: np.ndarray, k: int) -> pa.Table:
    """Per-batch partial sums, melted to (cluster, dim, ssum) int64 rows.

    dim == -1 carries the member count; vector sums are fixed-point
    int64 so the downstream groupby-sum is exact in any order.  Uses a
    sort + ``add.reduceat`` segment sum (vectorized, no Python loop
    over rows)."""
    order = np.argsort(assign, kind="stable")
    a_sorted = assign[order]
    bounds = np.nonzero(np.diff(a_sorted))[0] + 1
    starts = np.concatenate(([0], bounds))
    present = a_sorted[starts]
    scaled = np.rint(m[order] * _FP_SCALE).astype(np.int64)
    sums = np.add.reduceat(scaled, starts, axis=0)      # (g, dim)
    cnts = np.diff(np.concatenate((starts, [len(assign)])))
    g, d = sums.shape
    cl = np.repeat(present.astype(np.int64), d + 1)
    dim = np.tile(np.concatenate(([-1], np.arange(d, dtype=np.int64))), g)
    ssum = np.concatenate(
        (cnts[:, None].astype(np.int64), sums), axis=1).ravel()
    return pa.table({"cluster": pa.array(cl, pa.int64()),
                     "dim": pa.array(dim, pa.int64()),
                     "ssum": pa.array(ssum, pa.int64())})


def kmeans_fit(ds, k: int = 16, iters: int = 4, emb_col: str = "embedding",
               init: np.ndarray = None):
    """Spherical k-means centroids (k, dim) — deterministic sample init
    (:func:`kmcp_ray.ann.train_ivf_centroids`) followed by ``iters``
    distributed Lloyd passes over the FULL dataset (one melted-partial
    map + one k*(dim+1)-row groupby per pass; see module docstring).
    Empty clusters keep their previous centroid (deterministic)."""
    cent = _normalize(np.asarray(
        init if init is not None
        else train_ivf_centroids(ds, nlist=k, emb_col=emb_col),
        dtype=np.float64))
    k = cent.shape[0]
    for _ in range(iters):
        cref = ray.put(cent)

        def partial(batch: pa.Table) -> pa.Table:
            c = ray.get(cref)
            m = _normalize(_emb_matrix(batch, emb_col))
            assign = np.argmax(m @ c.T, axis=1)
            return _melt_partials(assign, m, k)

        rows = ds.map_batches(partial, batch_format="pyarrow",
                              batch_size=4096, zero_copy_batch=True) \
            .groupby(["cluster", "dim"]).sum("ssum").take_all()
        sums = np.zeros((k, cent.shape[1]))
        cnts = np.zeros(k)
        for r in rows:
            c, d = int(r["cluster"]), int(r["dim"])
            if d < 0:
                cnts[c] = float(r["sum(ssum)"])
            else:
                sums[c, d] = r["sum(ssum)"] / _FP_SCALE
        nxt = cent.copy()
        nz = cnts > 0
        nxt[nz] = sums[nz] / cnts[nz, None]
        cent = _normalize(nxt)
    return cent


def assign_clusters(ds, centroids: np.ndarray, emb_col: str = "embedding",
                    out_col: str = "cluster", nprobe: int = 1):
    """Append the nearest-centroid id (int32) — broadcast centroids,
    one small matmul per batch, no shuffle.

    ``nprobe > 1`` emits one row per (row, top-p centroid) — the
    multi-probe expansion (IVF-nprobe analogue): a near-boundary row
    lands in each of its p closest clusters, at p x row volume."""
    cref = ray.put(_normalize(np.asarray(centroids, dtype=np.float64)))

    def tag(batch: pa.Table) -> pa.Table:
        c = ray.get(cref)
        m = _normalize(_emb_matrix(batch, emb_col))
        sims = m @ c.T
        if nprobe == 1:
            a = np.argmax(sims, axis=1).astype(np.int32)
            return batch.append_column(out_col, pa.array(a, pa.int32()))
        p = min(nprobe, sims.shape[1])
        top = np.argpartition(-sims, p - 1, axis=1)[:, :p].astype(np.int32)
        rep = batch.take(pa.array(np.repeat(np.arange(len(m)), p)))
        return rep.append_column(out_col, pa.array(top.ravel(), pa.int32()))

    return ds.map_batches(tag, batch_format="pyarrow", batch_size=4096,
                          zero_copy_batch=True)


def _dedup_group(t: pa.Table, *, group_col: str, id_col: str,
                 emb_col: str, threshold: float, chunk: int,
                 max_group_rows: int) -> pa.Table:
    ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
    n = len(ids)
    if n > max_group_rows:
        raise ValueError(
            f"semantic-dedup group {t.column(group_col)[0].as_py()!r} has "
            f"{n} rows > max_group_rows={max_group_rows}: O(n^2) verify "
            "would blow up — raise k (more, smaller clusters) or "
            "max_group_rows.")
    order = np.argsort(ids, kind="stable")
    ids = ids[order]
    m = _normalize(_emb_matrix(t, emb_col)[order])
    labels = ids.copy()
    # min-label propagation over the cosine>=threshold graph; adjacency
    # is rebuilt per sweep in row chunks (memory O(chunk * n)), sweeps
    # bounded by component diameter (tiny for near-dup cliques).
    while True:
        new = labels.copy()
        for s in range(0, n, chunk):
            e = min(s + chunk, n)
            adj = (m[s:e] @ m.T) >= threshold       # includes self
            block = np.where(adj, labels[None, :], np.iinfo(np.int64).max)
            new[s:e] = np.minimum(new[s:e], block.min(axis=1))
        if np.array_equal(new, labels):
            break
        labels = new
    return pa.table({id_col: pa.array(ids, pa.int64()),
                     "rep_id": pa.array(labels, pa.int64()),
                     "kept": pa.array((labels == ids).astype(np.int64),
                                      pa.int64())})


def group_semantic_dedup(ds, group_col: str, threshold: float = 0.4,
                         id_col: str = "vec_id",
                         emb_col: str = "embedding", chunk: int = 2048,
                         max_group_rows: int = 1_000_000):
    """(id, rep_id, kept) for EVERY row: within each ``group_col``
    group, connected components of the cosine>=threshold graph with the
    min-id member as the kept representative.  Exact within groups —
    with a categorical group column this is the SQL-mirrorable arm;
    with a k-means ``cluster`` column it is the SemDeDup approximation
    (cross-cluster pairs are by-design misses)."""
    import functools
    fn = functools.partial(_dedup_group, group_col=group_col,
                           id_col=id_col, emb_col=emb_col,
                           threshold=threshold, chunk=chunk,
                           max_group_rows=max_group_rows)
    return ds.groupby(group_col).map_groups(fn, batch_format="pyarrow")


def semantic_dedup(ds, k: int = 16, threshold: float = 0.4, iters: int = 4,
                   id_col: str = "vec_id", emb_col: str = "embedding",
                   centroids: np.ndarray = None, nprobe: int = 1,
                   **group_kw):
    """SemDeDup: distributed k-means partition -> per-cluster
    cosine-threshold components -> min-id representative.  Returns
    (id, rep_id, kept) over every row; ``kept == 0`` rows are the
    pruned semantic near-duplicates.

    ``nprobe > 1`` is the recall knob: each row joins its p closest
    clusters (p x verify volume), per-probe components are then merged
    through the shared pairs->forest->union-find tail
    (:func:`kmcp_ray.ann.int_pair_labels`) — every (row, rep) link is
    a real tau-path, so precision is unchanged while boundary-straddling
    pairs co-bucket."""
    if centroids is None:
        centroids = kmeans_fit(ds, k=k, iters=iters, emb_col=emb_col)
    sel = ds.select_columns([id_col, emb_col])
    tagged = assign_clusters(sel, centroids, emb_col=emb_col,
                             nprobe=nprobe)
    part = group_semantic_dedup(tagged, "cluster", threshold,
                                id_col=id_col, emb_col=emb_col, **group_kw)
    if nprobe == 1:
        return part

    from kmcp_ray.ann import int_pair_labels

    def to_edges(t: pa.Table) -> pa.Table:
        v = t.column(id_col).to_numpy(zero_copy_only=False)
        r = t.column("rep_id").to_numpy(zero_copy_only=False)
        keep = v != r                        # dup-count-sized edge set
        return pa.table({"id_a": pa.array(v[keep], pa.int64()),
                         "id_b": pa.array(r[keep], pa.int64())})

    pairs = part.map_batches(to_edges, batch_format="pyarrow",
                             zero_copy_batch=True)
    labels = int_pair_labels(sel, pairs, id_col=id_col)

    def finish(t: pa.Table) -> pa.Table:
        v = t.column(id_col).to_numpy(zero_copy_only=False)
        r = t.column("cluster_id").to_numpy(zero_copy_only=False)
        return pa.table({id_col: pa.array(v, pa.int64()),
                         "rep_id": pa.array(r, pa.int64()),
                         "kept": pa.array((v == r).astype(np.int64),
                                          pa.int64())})

    return labels.map_batches(finish, batch_format="pyarrow",
                              zero_copy_batch=True)
