"""Similarity search over embedding columns (list<float>).

- :func:`topk_cosine` — brute-force cosine top-k against a broadcast
  query matrix: each batch does ONE numpy matmul against the queries
  (``ray.put`` once, read per task), partial top-k per batch, final
  top-k per query in a tiny groupby — the scalable
  baseline (no all-to-all shuffle; cost O(rows x queries)).
- :func:`cosine_pairs` — all pairs with cosine >= threshold via a
  broadcast of the (small) candidate matrix; exact.
- :func:`lsh_cosine_pairs` — random-hyperplane SimHash banding for the
  scale path: sign-sketch → Hamming-chunk buckets → exact verify within
  buckets.  Approximate (recall < 1); measured in tests against the
  exact variant.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from kmcp_ray import hashing
from kmcp_ray.config import DedupConfig

_HYPERPLANE_SEED = 0x5EED


def _emb_matrix(batch: pa.Table, emb_col: str) -> np.ndarray:
    from kmcp_ray.arrowutil import list_to_numpy
    vals, offsets = list_to_numpy(batch.column(emb_col), dtype=np.float64)
    n = len(offsets) - 1
    return vals.reshape(n, -1)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def topk_cosine(ds, queries: "tuple[np.ndarray, np.ndarray]", k: int = 5,
                id_col: str = "vec_id", emb_col: str = "embedding"):
    """(query_id, neighbor_id, rank) — top-k cosine neighbors of each
    query vector; self-matches excluded; ties broken by neighbor id.

    ``queries`` = (query_ids int64 (q,), query_matrix float64 (q, d)).
    """
    q_ids, q_mat = queries
    q_ref = ray.put((q_ids.astype(np.int64), _normalize(q_mat.astype(np.float64))))

    def partial_topk(batch: pa.Table) -> pa.Table:
        qi, qm = ray.get(q_ref)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        m = _normalize(_emb_matrix(batch, emb_col))
        sims = qm @ m.T                                  # (q, batch)
        out_q, out_n, out_s = [], [], []
        for r in range(len(qi)):
            s = sims[r]
            mask = ids != qi[r]
            cand_idx = np.nonzero(mask)[0]
            if len(cand_idx) == 0:
                continue
            sc = s[cand_idx]
            top = min(k, len(cand_idx))
            # partial selection, widened to ALL candidates tied with the
            # k-th similarity, then the deterministic (-sim, id) cut —
            # otherwise an equal-sim neighbor with smaller id can be
            # dropped batch-locally before the global tie-break runs
            part = np.argpartition(-sc, top - 1)[:top]
            kth = sc[part].min()
            tied = np.nonzero(sc >= kth)[0]
            nb_ids = ids[cand_idx[tied]]
            order2 = np.lexsort((nb_ids, -sc[tied]))[:top]
            out_q.append(np.full(top, qi[r], dtype=np.int64))
            out_n.append(nb_ids[order2])
            out_s.append(sc[tied][order2])
        if not out_q:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "neighbor_id": pa.array([], pa.int64()),
                             "sim": pa.array([], pa.float64())})
        return pa.table({"query_id": pa.array(np.concatenate(out_q), pa.int64()),
                         "neighbor_id": pa.array(np.concatenate(out_n), pa.int64()),
                         "sim": pa.array(np.concatenate(out_s), pa.float64())})

    def final_topk(group: pa.Table) -> pa.Table:
        q = group.column("query_id").to_numpy(zero_copy_only=False)
        nb = group.column("neighbor_id").to_numpy(zero_copy_only=False)
        s = group.column("sim").to_numpy(zero_copy_only=False)
        order = np.lexsort((nb, -s))[:k]
        return pa.table({"query_id": pa.array(q[order], pa.int64()),
                         "neighbor_id": pa.array(nb[order], pa.int64()),
                         "rank": pa.array(np.arange(1, len(order) + 1), pa.int64())})

    partial = ds.map_batches(partial_topk, batch_format="pyarrow",
                             batch_size=4096, zero_copy_batch=True)
    return partial.groupby("query_id").map_groups(final_topk,
                                                  batch_format="pyarrow")


def cosine_pairs(ds, threshold: float, id_col: str = "vec_id",
                 emb_col: str = "embedding", ref_ds=None,
                 max_broadcast_rows: int = 200_000):
    """Exact pairs (id_a < id_b, both sides in ds) with cosine >=
    threshold, via a broadcast of the full (small-side) matrix.

    Broadcast-join shape for small reference sides; above
    ``max_broadcast_rows`` it cuts over to :func:`lsh_cosine_pairs`
    (approximate, recall measured >= 0.95 in tests) instead of silently
    materializing a huge matrix on the driver.
    """
    src = ref_ds if ref_ds is not None else ds
    if ref_ds is None and src.count() > max_broadcast_rows:
        return lsh_cosine_pairs(ds, threshold, id_col=id_col,
                                emb_col=emb_col)
    all_tbl = src.select_columns([id_col, emb_col]).to_arrow_refs()
    tables = [ray.get(r) for r in all_tbl]
    full = pa.concat_tables([t for t in tables if t.num_rows] or tables)
    ref_ids = full.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
    ref_mat = _normalize(_emb_matrix(full, emb_col))
    ref = ray.put((ref_ids, ref_mat))

    def pairs_batch(batch: pa.Table) -> pa.Table:
        rids, rmat = ray.get(ref)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        m = _normalize(_emb_matrix(batch, emb_col))
        sims = m @ rmat.T                                # (batch, ref)
        ii, jj = np.nonzero(sims >= threshold)
        keep = ids[ii] < rids[jj]                        # dedup + drop self
        ii, jj = ii[keep], jj[keep]
        return pa.table({"id_a": pa.array(ids[ii], pa.int64()),
                         "id_b": pa.array(rids[jj], pa.int64()),
                         "cos_sim": pa.array(sims[ii, jj], pa.float64())})

    return ds.map_batches(pairs_batch, batch_format="pyarrow",
                          batch_size=2048, zero_copy_batch=True)


def embedding_simhash(mat: np.ndarray, dim: int, n_bits: int = 64) -> np.ndarray:
    """Random-hyperplane sign sketch (deterministic seed) → int64."""
    rng = np.random.default_rng(_HYPERPLANE_SEED)
    planes = rng.standard_normal((dim, n_bits))
    signs = (mat @ planes) > 0
    weights = (np.uint64(1) << np.arange(n_bits, dtype=np.uint64))
    return (signs.astype(np.uint64) * weights[None, :]).sum(
        axis=1, dtype=np.uint64).view(np.int64)


def lsh_cosine_pairs(ds, threshold: float, cfg: DedupConfig = None,
                     id_col: str = "vec_id", emb_col: str = "embedding"):
    """Approximate cosine pairs: hyperplane SimHash → Hamming-chunk LSH
    buckets → globally-deduplicated candidate pairs → exact cosine
    verification.

    Scale shape: only (key, vid) — 16 bytes/row — rides the packed band
    shuffle (embeddings are NOT replicated x chunks); candidates are
    deduplicated with one exchange; verification reads the embeddings
    either from a broadcast matrix (small side, kmcp load-whole mode)
    or through the partitioned attach exchange (mmap-mode analogue).
    """
    cfg = cfg or DedupConfig()
    chunks = 8
    from kmcp_ray.exchange import Exchange, dedup_pairs

    ex = Exchange([("key", pa.uint64()), ("vid", pa.int64())],
                  cfg.num_partitions)

    def sketch(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        m = _normalize(_emb_matrix(batch, emb_col))
        sh = embedding_simhash(m, m.shape[1])
        keys = _chunk_keys(sh, chunks)
        n = len(ids)
        rows = np.repeat(np.arange(n), chunks)
        tbl = pa.table({"key": pa.array(keys.reshape(-1), pa.uint64()),
                        "vid": pa.array(ids[rows], pa.int64())})
        part = (keys.reshape(-1) % np.uint64(cfg.num_partitions)).astype(np.int64)
        return ex.make_pack_fn(lambda _b: part)(tbl)

    def cand(group: pa.Table) -> pa.Table:
        u = ex.unpack(group)
        keys = u["key"].to_numpy(zero_copy_only=False).astype(np.uint64)
        vid = u["vid"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((vid, keys))
        keys_s, vid_s = keys[order], vid[order]
        m = len(keys_s)
        if m < 2:
            return pa.table({"id_a": pa.array([], pa.int64()),
                             "id_b": pa.array([], pa.int64())})
        first = np.concatenate(([True], keys_s[1:] != keys_s[:-1]))
        starts = np.nonzero(first)[0]
        ends = np.concatenate((starts[1:], [m]))
        # deterministic bucket cap: smallest vids kept (already sorted)
        ends = np.minimum(ends, starts + cfg.max_bucket)
        from kmcp_ray.buckets import _pairs_within_segments
        i, j = _pairs_within_segments(starts, ends)
        a, b = vid_s[i], vid_s[j]
        keep = a != b
        lo, hi = np.minimum(a[keep], b[keep]), np.maximum(a[keep], b[keep])
        return pa.table({"id_a": pa.array(lo, pa.int64()),
                         "id_b": pa.array(hi, pa.int64())})

    banded = ds.map_batches(sketch, batch_format="pyarrow", batch_size=4096,
                            zero_copy_batch=True)
    raw_pairs = banded.groupby("part").map_groups(cand,
                                                  batch_format="pyarrow")
    pairs = dedup_pairs(raw_pairs, cfg.num_partitions, typ=pa.int64())

    n_rows = ds.count()
    if n_rows <= cfg.broadcast_verify_rows:
        # broadcast the (small) normalized matrix once; vectorized
        # row-wise dot per pair batch
        all_tbl = ds.select_columns([id_col, emb_col]).to_arrow_refs()
        tables = [ray.get(r) for r in all_tbl]
        full = pa.concat_tables([t for t in tables if t.num_rows] or tables)
        ref_ids = full.column(id_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ref_mat = _normalize(_emb_matrix(full, emb_col))
        order = np.argsort(ref_ids, kind="stable")
        ref = ray.put((ref_ids[order], ref_mat[order]))

        def verify_b(batch: pa.Table) -> pa.Table:
            rids, rmat = ray.get(ref)
            a = batch.column("id_a").to_numpy(zero_copy_only=False)
            b = batch.column("id_b").to_numpy(zero_copy_only=False)
            ia = np.searchsorted(rids, a)
            ib = np.searchsorted(rids, b)
            sims = np.einsum("ij,ij->i", rmat[ia], rmat[ib])
            ok = sims >= threshold
            return pa.table({"id_a": pa.array(a[ok], pa.int64()),
                             "id_b": pa.array(b[ok], pa.int64()),
                             "cos_sim": pa.array(sims[ok], pa.float64())})

        return pairs.map_batches(verify_b, batch_format="pyarrow",
                                 batch_size=16384, zero_copy_batch=True)

    # large side: attach embedding blobs through the partitioned exchange
    from kmcp_ray.buckets import attach_sketches

    def to_str_pairs(batch: pa.Table) -> pa.Table:
        a = batch.column("id_a").to_numpy(zero_copy_only=False)
        b = batch.column("id_b").to_numpy(zero_copy_only=False)
        return pa.table({
            "id_a": pa.array([f"v{x:015d}" for x in a], pa.string()),
            "id_b": pa.array([f"v{x:015d}" for x in b], pa.string())})

    def emb_payload(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        m = _normalize(_emb_matrix(batch, emb_col))
        return pa.table({
            "image_id": pa.array([f"v{x:015d}" for x in ids], pa.string()),
            "vsk": pa.array([row.tobytes() for row in m], pa.binary())})

    attached = attach_sketches(
        pairs.map_batches(to_str_pairs, batch_format="pyarrow"),
        ds.map_batches(emb_payload, batch_format="pyarrow",
                       zero_copy_batch=True), cfg)

    def verify_j(batch: pa.Table) -> pa.Table:
        from kmcp_ray.arrowutil import column
        a = column(batch, "id_a").to_numpy(zero_copy_only=False)
        b = column(batch, "id_b").to_numpy(zero_copy_only=False)
        va = column(batch, "vsk_a").to_numpy(zero_copy_only=False)
        vb = column(batch, "vsk_b").to_numpy(zero_copy_only=False)
        ok_rows = np.array([x is not None and y is not None
                            for x, y in zip(va, vb)], dtype=bool)
        idx = np.nonzero(ok_rows)[0]
        if len(idx) == 0:
            return pa.table({"id_a": pa.array([], pa.int64()),
                             "id_b": pa.array([], pa.int64()),
                             "cos_sim": pa.array([], pa.float64())})
        ma = np.stack([np.frombuffer(va[i], np.float64) for i in idx])
        mb = np.stack([np.frombuffer(vb[i], np.float64) for i in idx])
        sims = np.einsum("ij,ij->i", ma, mb)
        ok = sims >= threshold
        sel = idx[ok]
        return pa.table({
            "id_a": pa.array([int(s[1:]) for s in a[sel]], pa.int64()),
            "id_b": pa.array([int(s[1:]) for s in b[sel]], pa.int64()),
            "cos_sim": pa.array(sims[ok], pa.float64())})

    return attached.map_batches(verify_j, batch_format="pyarrow",
                                batch_size=8192, zero_copy_batch=True)


def _chunk_keys(sh: np.ndarray, chunks: int) -> np.ndarray:
    ph = np.asarray(sh).astype(np.int64).view(np.uint64)
    width = 64 // chunks
    mask = np.uint64((1 << width) - 1)
    consts = hashing.splitmix64(np.arange(chunks, dtype=np.uint64)
                                + np.uint64(0xE7037ED1A0B428DB))
    out = np.empty((len(ph), chunks), dtype=np.uint64)
    for c in range(chunks):
        out[:, c] = hashing.splitmix64(((ph >> np.uint64(c * width)) & mask)
                                       + consts[c])
    return out
