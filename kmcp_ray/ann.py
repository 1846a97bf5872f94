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
- :func:`ivf_topk` / :func:`train_ivf_centroids` / :func:`assign_lists`
  — IVF (inverted-file) top-k: spherical k-means on a bounded sample,
  broadcast centroids, per-batch assign + probe-mask pruning.  Exact at
  nprobe == nlist (the driver-oracle identity); recall at lower nprobe
  measured in tests.
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


def _tie_exact_topk(cand_ids: np.ndarray, sims: np.ndarray, k: int):
    """Batch-local partial top-k that is safe under the global
    (-sim, neighbor_id) tie-break: select the k best, widened to ALL
    candidates tied with the k-th similarity, then apply the
    deterministic lexsort cut — otherwise an equal-sim neighbor with a
    smaller id can be dropped batch-locally before the global
    tie-break runs.  Returns (neighbor_ids, sims), each len <= k."""
    n = len(cand_ids)
    if n == 0:
        return (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64))
    top = min(k, n)
    part = np.argpartition(-sims, top - 1)[:top]
    kth = sims[part].min()
    tied = np.nonzero(sims >= kth)[0]
    nb_ids = cand_ids[tied]
    order = np.lexsort((nb_ids, -sims[tied]))[:top]
    return nb_ids[order], sims[tied][order]


def topk_cosine(ds, queries: "tuple[np.ndarray, np.ndarray]", k: int = 5,
                id_col: str = "vec_id", emb_col: str = "embedding",
                q_labels: np.ndarray = None, label_col: str = "label"):
    """(query_id, neighbor_id, rank) — top-k cosine neighbors of each
    query vector; self-matches excluded; ties broken by neighbor id.

    ``queries`` = (query_ids int64 (q,), query_matrix float64 (q, d)).

    ``q_labels`` (optional, int64 (q,)): per-query label to EXCLUDE —
    candidates sharing the query's ``label_col`` value are masked out,
    turning the op into hard-NEGATIVE mining (the top-k most similar
    items of a *different* class, the contrastive-training staple).
    Same partial-top-k economics: labels ride the broadcast, the mask
    is one vectorized compare per batch.
    """
    q_ids, q_mat = queries
    q_ref = ray.put((q_ids.astype(np.int64),
                     _normalize(q_mat.astype(np.float64)),
                     None if q_labels is None
                     else np.asarray(q_labels, dtype=np.int64)))

    def partial_topk(batch: pa.Table) -> pa.Table:
        qi, qm, qlab = ray.get(q_ref)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        blab = (batch.column(label_col).to_numpy(zero_copy_only=False)
                .astype(np.int64) if qlab is not None else None)
        m = _normalize(_emb_matrix(batch, emb_col))
        sims = qm @ m.T                                  # (q, batch)
        out_q, out_n, out_s = [], [], []
        for r in range(len(qi)):
            mask = ids != qi[r]
            if qlab is not None:
                mask &= blab != qlab[r]
            cand_idx = np.nonzero(mask)[0]
            nb, sc = _tie_exact_topk(ids[cand_idx], sims[r][cand_idx], k)
            if len(nb) == 0:
                continue
            out_q.append(np.full(len(nb), qi[r], dtype=np.int64))
            out_n.append(nb)
            out_s.append(sc)
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


def hard_negatives(ds, queries, k: int = 5, id_col: str = "vec_id",
                   emb_col: str = "embedding", label_col: str = "label"):
    """(query_id, neighbor_id, rank) — hard-NEGATIVE mining: for each
    query vector, the top-k most cosine-similar rows whose ``label``
    differs from the query's (contrastive-training staple).

    ``queries`` = (ids int64 (q,), matrix float64 (q, d), labels int64
    (q,)).  Thin wrapper over :func:`topk_cosine`'s label-exclusion
    arm: queries+labels broadcast once, one matmul + one label-compare
    mask per batch, tie-exact partial top-k — no shuffle beyond the
    query-sized final groupby."""
    q_ids, q_mat, q_labels = queries
    return topk_cosine(ds, (q_ids, q_mat), k=k, id_col=id_col,
                       emb_col=emb_col, q_labels=q_labels,
                       label_col=label_col)


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
    ref_ids = full.column(id_col).to_numpy(zero_copy_only=False)
    # int64 ids (the embeddings tables) and string ids (image corpora)
    # both ride: the `<` dedup compare and the output type follow dtype
    id_type = pa.string() if ref_ids.dtype == object else pa.int64()
    if ref_ids.dtype != object:
        ref_ids = ref_ids.astype(np.int64)
    ref_mat = _normalize(_emb_matrix(full, emb_col))
    ref = ray.put((ref_ids, ref_mat))

    def pairs_batch(batch: pa.Table) -> pa.Table:
        rids, rmat = ray.get(ref)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        if ids.dtype != object:
            ids = ids.astype(np.int64)
        m = _normalize(_emb_matrix(batch, emb_col))
        sims = m @ rmat.T                                # (batch, ref)
        ii, jj = np.nonzero(sims >= threshold)
        keep = ids[ii] < rids[jj]                        # dedup + drop self
        ii, jj = ii[keep], jj[keep]
        return pa.table({"id_a": pa.array(ids[ii], id_type),
                         "id_b": pa.array(rids[jj], id_type),
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


# ---------------------------------------------------------------------------
# IVF (inverted-file) approximate top-k — the scale path for similarity
# search.  Brute-force topk_cosine scores every row against every query
# (O(rows x queries) FLOPs); IVF trains nlist spherical-k-means
# centroids on a bounded sample, assigns each row to its nearest
# centroid (one small matmul per batch), and scores a row against a
# query only when the row's list is among the query's nprobe closest
# centroids.  At nprobe == nlist the result is exactly topk_cosine
# (every list probed) — that identity is the correctness gate; recall
# at nprobe < nlist is measured in tests.
#
# Scale shape: centroids + probe masks are broadcast once (ray.put,
# nlist x dim floats); the dataset streams — no shuffle, no
# materialization.  For a persisted index, write the dataset
# partitioned by list_id (assign_lists) so a probe reads only
# nprobe/nlist of the files; the streaming path below prunes FLOPs
# per batch, which is the same economics without the index build.
# ---------------------------------------------------------------------------

def train_ivf_centroids(ds, nlist: int = 16, emb_col: str = "embedding",
                        sample_rows: int = 65536, iters: int = 10,
                        seed: int = _HYPERPLANE_SEED) -> np.ndarray:
    """Spherical k-means centroids (nlist, dim) from a bounded,
    deterministic sample (first ``sample_rows`` rows in dataset order —
    <= ~32 MB at 64k x 64 float64, never the full corpus).

    Deterministic: seeded init (distinct sample rows), Lloyd iterations
    with cosine assignment, empty clusters reseeded to the currently
    worst-served point."""
    sample = ds.select_columns([emb_col]).limit(sample_rows)
    tables = [ray.get(r) for r in sample.to_arrow_refs()]
    full = pa.concat_tables([t for t in tables if t.num_rows] or tables)
    m = _normalize(_emb_matrix(full, emb_col))
    n = m.shape[0]
    if n == 0:
        raise ValueError("train_ivf_centroids: empty sample")
    nlist = min(nlist, n)
    rng = np.random.default_rng(seed)
    cent = m[rng.choice(n, size=nlist, replace=False)].copy()
    for _ in range(iters):
        sims = m @ cent.T                          # (n, nlist)
        assign = np.argmax(sims, axis=1)
        best = sims[np.arange(n), assign]
        for c in range(nlist):
            members = m[assign == c]
            if len(members) == 0:
                # reseed to the point farthest from its centroid
                worst = int(np.argmin(best))
                cent[c] = m[worst]
                best[worst] = 1.0
                continue
            v = members.sum(axis=0)
            norm = np.linalg.norm(v)
            cent[c] = v / norm if norm > 0 else cent[c]
    return cent


def assign_lists(ds, centroids: np.ndarray, id_col: str = "vec_id",
                 emb_col: str = "embedding"):
    """Add the IVF ``list_id`` (int32 nearest-centroid) column — the
    partition key to write a persisted IVF index under
    (``write_parquet(partition_cols=["list_id"])``), so a search reads
    only the probed lists' files."""
    cent = ray.put(_normalize(np.asarray(centroids, dtype=np.float64)))

    def tag(batch: pa.Table) -> pa.Table:
        c = ray.get(cent)
        m = _normalize(_emb_matrix(batch, emb_col))
        a = np.argmax(m @ c.T, axis=1).astype(np.int32)
        return batch.append_column("list_id", pa.array(a, pa.int32()))

    return ds.map_batches(tag, batch_format="pyarrow", batch_size=4096,
                          zero_copy_batch=True)


def ivf_topk(ds, queries: "tuple[np.ndarray, np.ndarray]", k: int = 5,
             nlist: int = 16, nprobe: int = 4, centroids: np.ndarray = None,
             id_col: str = "vec_id", emb_col: str = "embedding",
             list_col: str = None):
    """(query_id, neighbor_id, rank) — IVF-pruned cosine top-k.  Same
    output contract as :func:`topk_cosine` (self-matches excluded,
    ties broken by neighbor id); exact when nprobe >= nlist.

    ``list_col``: name of a precomputed list-assignment column (a
    persisted index written via :func:`write_ivf_index` stores it);
    when given, the per-batch centroid argmax is skipped entirely."""
    q_ids, q_mat = queries
    if centroids is None:
        centroids = train_ivf_centroids(ds, nlist=nlist, emb_col=emb_col)
    cent = _normalize(np.asarray(centroids, dtype=np.float64))
    nlist = cent.shape[0]
    nprobe = min(nprobe, nlist)
    qm = _normalize(q_mat.astype(np.float64))
    # probe mask (q, nlist): True where the list is among the query's
    # nprobe nearest centroids
    qc = qm @ cent.T
    probed = np.argpartition(-qc, nprobe - 1, axis=1)[:, :nprobe]
    probe_mask = np.zeros((len(q_ids), nlist), dtype=bool)
    probe_mask[np.arange(len(q_ids))[:, None], probed] = True
    state = ray.put((q_ids.astype(np.int64), qm, cent, probe_mask))

    def partial(batch: pa.Table) -> pa.Table:
        qi, qmat, c, pmask = ray.get(state)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        m = _normalize(_emb_matrix(batch, emb_col))
        if list_col is not None:                         # persisted index
            lv = batch.column(list_col)
            if not pa.types.is_integer(lv.type):         # hive readback may
                import pyarrow.compute as _pc            # infer string/dict
                lv = _pc.cast(lv.combine_chunks().dictionary_decode()
                              if pa.types.is_dictionary(lv.type) else lv,
                              pa.int64())
            assign = np.asarray(lv.to_numpy(zero_copy_only=False),
                                dtype=np.int64)
        else:
            assign = np.argmax(m @ c.T, axis=1)          # (batch,)
        out_q, out_n, out_s = [], [], []
        for r in range(len(qi)):
            keep = pmask[r][assign] & (ids != qi[r])
            cand_idx = np.nonzero(keep)[0]
            if len(cand_idx) == 0:
                continue
            sims = qmat[r] @ m[cand_idx].T
            nb, sc = _tie_exact_topk(ids[cand_idx], sims, k)
            out_q.append(np.full(len(nb), qi[r], dtype=np.int64))
            out_n.append(nb)
            out_s.append(sc)
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
                         "rank": pa.array(np.arange(1, len(order) + 1),
                                          pa.int64())})

    partial_ds = ds.map_batches(partial, batch_format="pyarrow",
                                batch_size=4096, zero_copy_batch=True)
    return partial_ds.groupby("query_id").map_groups(final_topk,
                                                     batch_format="pyarrow")


def write_ivf_index(ds, path: str, nlist: int = 16,
                    centroids: np.ndarray = None, id_col: str = "vec_id",
                    emb_col: str = "embedding") -> np.ndarray:
    """Persist an IVF index: the dataset written as Parquet
    hive-partitioned by ``list_id`` (one directory per inverted list —
    the kmcp index-block-on-disk analogue, search.go's prebuilt .uniki
    blocks) plus ``_centroids.npy`` / ``_ivf_meta.json`` sidecars
    (underscore prefix: ignored by Parquet dataset discovery).

    Returns the trained centroids.  A search then reads ONLY the probed
    lists' files — partition pruning at the scan, so I/O scales with
    nprobe/nlist instead of corpus size."""
    import json as _json
    import os as _os

    if centroids is None:
        centroids = train_ivf_centroids(ds, nlist=nlist, emb_col=emb_col)
    cent = _normalize(np.asarray(centroids, dtype=np.float64))
    tagged = assign_lists(ds, cent, id_col=id_col, emb_col=emb_col)
    tagged.write_parquet(path, partition_cols=["list_id"])
    np.save(_os.path.join(path, "_centroids.npy"), cent)
    with open(_os.path.join(path, "_ivf_meta.json"), "w") as f:
        _json.dump({"nlist": int(cent.shape[0]), "dim": int(cent.shape[1]),
                    "id_col": id_col, "emb_col": emb_col}, f)
    return cent


def search_ivf_index(path: str, queries: "tuple[np.ndarray, np.ndarray]",
                     k: int = 5, nprobe: int = 4):
    """Top-k search against a persisted IVF index (see
    :func:`write_ivf_index`): loads the centroid sidecar, computes the
    union of probed lists over all queries, and lists ONLY those hive
    partition directories (``PathPartitionFilter`` — unprobed files are
    pruned at path listing, before any byte leaves storage).  Per-query
    probe masks still apply inside :func:`ivf_topk`; the stored
    ``list_id`` column skips the per-batch centroid argmax."""
    import json as _json
    import os as _os
    from ray.data.datasource.partitioning import (Partitioning,
                                                  PathPartitionFilter)

    cent = np.load(_os.path.join(path, "_centroids.npy"))
    with open(_os.path.join(path, "_ivf_meta.json")) as f:
        meta = _json.load(f)
    nlist = meta["nlist"]
    nprobe = min(nprobe, nlist)
    q_ids, q_mat = queries
    qm = _normalize(np.asarray(q_mat, dtype=np.float64))
    probed_lists = np.unique(
        np.argpartition(-(qm @ cent.T), nprobe - 1, axis=1)[:, :nprobe])
    allowed = {str(int(x)) for x in probed_lists}
    ds = ray.data.read_parquet(
        path,
        partition_filter=PathPartitionFilter.of(
            lambda kv: kv.get("list_id") in allowed, style="hive"),
        partitioning=Partitioning("hive"),
        file_extensions=["parquet"])
    return ivf_topk(ds, queries, k=k, nlist=nlist, nprobe=nprobe,
                    centroids=cent, id_col=meta["id_col"],
                    emb_col=meta["emb_col"], list_col="list_id")


def embedding_dedup(ds, threshold: float, cfg: DedupConfig = None,
                    id_col: str = "vec_id", emb_col: str = "embedding"):
    """(id, cluster_id) — embedding-cosine near-duplicate CLUSTERING:
    pairs from :func:`cosine_pairs` (exact broadcast arm below its row
    gate, LSH arm above it), spanning-forest reduction + union-find,
    canonical min-id cluster labels broadcast back over the corpus —
    the same pairs→forest→assign machinery as the caption pipeline
    (kmcp search→merge→profile funnel analogue), with rows never
    materialized beyond the pair stream.

    Ids ride as zero-padded strings through the string-keyed CC stage
    (docs_dedup pattern) and return as int64.
    """
    pairs = cosine_pairs(ds, threshold, id_col=id_col, emb_col=emb_col)
    return int_pair_labels(ds, pairs, cfg, id_col=id_col)


def int_pair_labels(ds, pairs, cfg: DedupConfig = None,
                    id_col: str = "vec_id"):
    """(id, cluster_id) int64 min-id component labels over every row of
    ``ds`` from an int64 (id_a, id_b) edge stream — the shared
    pairs→spanning-forest→union-find→assign tail (broadcast map below
    the forest-size gate, partitioned join above it)."""
    cfg = cfg or DedupConfig()
    from kmcp_ray import cc as cc_mod
    from kmcp_ray.pipeline import assign_stage

    fmt = "v{:012d}"

    def to_str_pairs(batch: pa.Table) -> pa.Table:
        a = batch.column("id_a").to_numpy(zero_copy_only=False)
        b = batch.column("id_b").to_numpy(zero_copy_only=False)
        return pa.table({
            "id_a": pa.array([fmt.format(int(x)) for x in a], pa.string()),
            "id_b": pa.array([fmt.format(int(x)) for x in b], pa.string())})

    forest = pairs.map_batches(to_str_pairs, batch_format="pyarrow",
                               zero_copy_batch=True) \
        .map_batches(cc_mod.spanning_forest_batch, batch_format="pyarrow",
                     batch_size=1 << 20).materialize()
    n_forest = forest.count()                # materialized: metadata only

    def ids_str(batch: pa.Table) -> pa.Table:
        v = batch.column(id_col).to_numpy(zero_copy_only=False)
        return pa.table({"image_id": pa.array(
            [fmt.format(int(x)) for x in v], pa.string())})

    ids_ds = ds.select_columns([id_col]).map_batches(
        ids_str, batch_format="pyarrow", zero_copy_batch=True)
    if n_forest <= cfg.broadcast_assign_edges:
        cluster_map = cc_mod.connected_components_arrays(forest,
                                                         reduce_rounds=0)
        assignments = assign_stage(ids_ds, cluster_map, id_col="image_id")
    else:                                    # dup-heavy: distributed CC
        from kmcp_ray.pipeline import assign_via_join
        labels = cc_mod.labels_via_exchange(forest, cfg.num_partitions)
        assignments = assign_via_join(ids_ds, labels, cfg,
                                      id_col="image_id")

    def to_int(batch: pa.Table) -> pa.Table:
        ids = batch.column("image_id").to_numpy(zero_copy_only=False)
        cl = batch.column("cluster_id").to_numpy(zero_copy_only=False)
        return pa.table({
            id_col: pa.array([int(s[1:]) for s in ids], pa.int64()),
            "cluster_id": pa.array([int(s[1:]) for s in cl], pa.int64())})

    return assignments.map_batches(to_int, batch_format="pyarrow")


def label_centroids(ds, label_col: str = "label",
                    emb_col: str = "embedding"):
    """Per-label mean vector (float64): map-side partial sums — one
    ``(label, sum_vec, n)`` row per label per block — streamed to the
    driver and reduced with one bincount-style add.  The result is
    class-cardinality-sized (labels, not rows), the corpus itself
    never shuffles.  Returns ``(labels int64[], centroids float64
    [L, dim])`` sorted by label."""
    def partial(t: pa.Table) -> pa.Table:
        lab = t.column(label_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        m = _emb_matrix(t, emb_col).astype(np.float64)
        u, inv = np.unique(lab, return_inverse=True)
        sums = np.zeros((len(u), m.shape[1]))
        np.add.at(sums, inv, m)
        return pa.table({
            "label": pa.array(u, pa.int64()),
            "psum": pa.array(list(sums), pa.list_(pa.float64())),
            "n": pa.array(np.bincount(inv).astype(np.int64), pa.int64())})

    acc: dict[int, tuple[np.ndarray, int]] = {}
    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
    for b in parts.iter_batches(batch_size=1 << 14,
                                batch_format="pyarrow"):
        labs = b.column("label").to_numpy(zero_copy_only=False)
        ns = b.column("n").to_numpy(zero_copy_only=False)
        vecs = b.column("psum")
        if isinstance(vecs, pa.ChunkedArray):
            vecs = vecs.combine_chunks()
        flat = vecs.flatten().to_numpy(zero_copy_only=False)
        dim = len(flat) // max(len(labs), 1)
        mat = flat.reshape(len(labs), dim)
        for i, lb in enumerate(labs):
            s, n = acc.get(int(lb), (0.0, 0))
            acc[int(lb)] = (s + mat[i], n + int(ns[i]))
    labels = np.array(sorted(acc), dtype=np.int64)
    cents = np.stack([acc[int(lb)][0] / acc[int(lb)][1]
                      for lb in labels]) if len(labels) \
        else np.empty((0, 0))
    return labels, cents


def label_outliers(ds, k: int = 5, label_col: str = "label",
                   id_col: str = "vec_id", emb_col: str = "embedding"):
    """The ``k`` vectors FARTHEST from their own label's centroid, per
    label — the semantic-quality outlier flagging step of an
    embedding-curated corpus (mislabeled / off-topic candidates).

    Rank-only output ``(label, vec_id, rank)`` with rank 1 = farthest,
    ties by vec_id — no float column, so engine and SQL agree exactly
    (same contract as topk_cosine).  Shape: centroids broadcast once
    (``ray.put``), each batch computes one matmul-free row-wise cosine
    and keeps its k worst per label (map-side combine), then one
    label-sized ``groupby`` finishes — the corpus streams once."""
    labels, cents = label_centroids(ds, label_col, emb_col)
    norm_c = cents / np.maximum(
        np.linalg.norm(cents, axis=1, keepdims=True), 1e-30)
    ref = ray.put((labels, norm_c))

    def partial_worst(t: pa.Table) -> pa.Table:
        labs_all, nc = ray.get(ref)
        lab = t.column(label_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        vid = t.column(id_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        m = _emb_matrix(t, emb_col).astype(np.float64)
        mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True),
                            1e-30)
        li = np.searchsorted(labs_all, lab)
        cos = np.einsum("ij,ij->i", mn, nc[li])
        # keep k worst per label in this batch
        order = np.lexsort((vid, cos, lab))
        lab_s = lab[order]
        new = np.concatenate(([True], lab_s[1:] != lab_s[:-1]))
        seg = np.cumsum(new) - 1
        starts = np.nonzero(new)[0]
        rank_in = np.arange(len(lab_s)) - starts[seg]
        keep = order[rank_in < k]
        return pa.table({
            "label": pa.array(lab[keep], pa.int64()),
            "vec_id": pa.array(vid[keep], pa.int64()),
            "cos": pa.array(cos[keep], pa.float64())})

    def finish(group: pa.Table) -> pa.Table:
        lab = group.column("label").to_numpy(zero_copy_only=False)
        vid = group.column("vec_id").to_numpy(zero_copy_only=False)
        cos = group.column("cos").to_numpy(zero_copy_only=False)
        order = np.lexsort((vid, cos))[:k]
        return pa.table({
            "label": pa.array(lab[order], pa.int64()),
            "vec_id": pa.array(vid[order], pa.int64()),
            "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int64),
                             pa.int64())})

    return ds.map_batches(partial_worst, batch_format="pyarrow",
                          zero_copy_batch=True) \
        .groupby("label").map_groups(finish, batch_format="pyarrow")


# ------------------------------------------------- Hamming top-k retrieval

def topk_hamming(ds, queries: "tuple[np.ndarray, np.ndarray]", k: int = 5,
                 id_col: str = "doc_id", code_col: str = "simhash"):
    """(query_id, neighbor_id, dist, rank) — top-k nearest rows of each
    query by Hamming distance over 64-bit codes (phash / simhash); the
    image near-duplicate RETRIEVAL primitive (kmcp's per-query match
    ranking, util-db-search.go:105-145, with Hamming distance as the
    score).  Self-matches excluded; ties broken by neighbor id, so the
    result is a deterministic total order.

    ``queries`` = (query_ids int64 (q,), query_codes uint64 (q,)).

    Scale shape: the query codes are broadcast once (``ray.put``), each
    batch does ONE vectorized xor + SWAR popcount against the corpus
    codes — a (q, batch) uint64 matrix — then a tie-exact partial top-k
    per query; the final exact cut is a query-sized groupby.  No
    all-to-all shuffle; cost O(rows x queries).  For the pair-at-radius
    (rather than top-k) shape use the pigeonhole Hamming banding of
    :func:`kmcp_ray.docs_dedup.simhash_dedup` — band buckets shuffle
    16 B/row instead of touching every (query, row) cell.
    """
    from kmcp_ray.hashing import popcount64

    q_ids, q_codes = queries
    q_ref = ray.put((np.asarray(q_ids, dtype=np.int64),
                     np.asarray(q_codes, dtype=np.uint64)))

    def _tie_exact_topk_asc(cand_ids, dists, kk):
        # ascending-distance twin of _tie_exact_topk: widen to all
        # candidates tied with the k-th distance before the lexsort cut
        n = len(cand_ids)
        if n == 0:
            return (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64))
        top = min(kk, n)
        part = np.argpartition(dists, top - 1)[:top]
        kth = dists[part].max()
        tied = np.nonzero(dists <= kth)[0]
        nb_ids = cand_ids[tied]
        order = np.lexsort((nb_ids, dists[tied]))[:top]
        return nb_ids[order], dists[tied][order]

    def partial_topk(batch: pa.Table) -> pa.Table:
        qi, qc = ray.get(q_ref)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        codes = batch.column(code_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64).view(np.uint64)
        dmat = popcount64(qc[:, None] ^ codes[None, :]).astype(np.int64)
        out_q, out_n, out_d = [], [], []
        for r in range(len(qi)):
            cand = np.nonzero(ids != qi[r])[0]
            nb, dd = _tie_exact_topk_asc(ids[cand], dmat[r][cand], k)
            if len(nb) == 0:
                continue
            out_q.append(np.full(len(nb), qi[r], dtype=np.int64))
            out_n.append(nb)
            out_d.append(dd)
        if not out_q:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "neighbor_id": pa.array([], pa.int64()),
                             "dist": pa.array([], pa.int64())})
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q), pa.int64()),
            "neighbor_id": pa.array(np.concatenate(out_n), pa.int64()),
            "dist": pa.array(np.concatenate(out_d), pa.int64())})

    def final_topk(group: pa.Table) -> pa.Table:
        q = group.column("query_id").to_numpy(zero_copy_only=False)
        nb = group.column("neighbor_id").to_numpy(zero_copy_only=False)
        d = group.column("dist").to_numpy(zero_copy_only=False)
        order = np.lexsort((nb, d))[:k]
        return pa.table({
            "query_id": pa.array(q[order], pa.int64()),
            "neighbor_id": pa.array(nb[order], pa.int64()),
            "dist": pa.array(d[order], pa.int64()),
            "rank": pa.array(np.arange(1, len(order) + 1), pa.int64())})

    partial = ds.map_batches(partial_topk, batch_format="pyarrow",
                             batch_size=8192, zero_copy_batch=True)
    return partial.groupby("query_id").map_groups(final_topk,
                                                  batch_format="pyarrow")
