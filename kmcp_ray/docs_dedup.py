"""Deduplication operators over generic document tables
(id + text), built from the same frozen machinery as the image+caption
pipeline: exact (hash-partition + per-group min), MinHash-LSH,
SimHash/Hamming, and n-gram-Jaccard pair extraction.

Ids are carried as zero-padded strings through the union-find stage
(canonical cluster id = min id) and returned as int64.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from kmcp_ray import hashing, textops
from kmcp_ray.config import DedupConfig
from kmcp_ray.pipeline import dedup_pipeline

_ID_FMT = "d{:012d}"


def _with_str_id(ds, id_col: str, text_col: str):
    def fn(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        sid = np.array([_ID_FMT.format(int(i)) for i in ids], dtype=object)
        return pa.table({"image_id": pa.array(sid, pa.string()),
                         "caption": batch.column(text_col),
                         "orig_id": pa.array(ids, pa.int64())})
    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def _to_int_assignments(assignments, id_col: str):
    def fn(batch: pa.Table) -> pa.Table:
        ids = batch.column("image_id").to_numpy(zero_copy_only=False)
        cl = batch.column("cluster_id").to_numpy(zero_copy_only=False)
        return pa.table({
            id_col: pa.array([int(s[1:]) for s in ids], pa.int64()),
            "cluster_id": pa.array([int(s[1:]) for s in cl], pa.int64())})
    return assignments.map_batches(fn, batch_format="pyarrow")


# -------------------------------------------------------------- exact dedup

def exact_dedup(ds, id_col="doc_id", text_col="text", num_partitions: int = 64):
    """Every row annotated with its exact-dup group: (id, keep_id,
    n_copies) where keep_id = min id among rows with identical text.

    Pattern: content-hash column in map_batches → ONE hash-partition
    groupby → vectorized per-partition segment processing (no per-group
    Python calls) — the scalable exact-dedup shape from the Ray guide.
    """
    def add_hash(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_numpy(zero_copy_only=False)
        th = hashing.hash_strings(np.where(texts == None, "", texts))  # noqa: E711
        part = (th % np.uint64(num_partitions)).astype(np.int64)
        return pa.table({id_col: batch.column(id_col),
                         "th": pa.array(th, pa.uint64()),
                         "part": pa.array(part, pa.int64())})

    def per_partition(batch: pa.Table) -> pa.Table:
        th = batch.column("th").to_numpy(zero_copy_only=False).astype(np.uint64)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        if len(th) == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "keep_id": pa.array([], pa.int64()),
                             "n_copies": pa.array([], pa.int64())})
        order = np.lexsort((ids, th))
        th_s, ids_s = th[order], ids[order]
        seg = np.concatenate(([True], th_s[1:] != th_s[:-1]))
        seg_id = np.cumsum(seg) - 1
        n_seg = int(seg_id[-1]) + 1
        keep = ids_s[np.nonzero(seg)[0]]        # first id per segment == min
        counts = np.bincount(seg_id, minlength=n_seg)
        return pa.table({id_col: pa.array(ids_s, pa.int64()),
                         "keep_id": pa.array(keep[seg_id], pa.int64()),
                         "n_copies": pa.array(counts[seg_id], pa.int64())})

    hashed = ds.map_batches(add_hash, batch_format="pyarrow", zero_copy_batch=True)
    return hashed.groupby("part").map_groups(per_partition, batch_format="pyarrow")


# ----------------------------------------------------- normalized dedup

def normalized_dedup(ds, id_col="doc_id", text_col="text",
                     num_partitions: int = 64):
    """Exact dedup after text canonicalization (lower → strip
    non-[a-z0-9 ] → collapse spaces → trim): catches trivially-mangled
    copies (case, punctuation, whitespace) that byte-exact dedup
    misses — the standard "fuzzy exact" pass of web-corpus pipelines,
    run before the MinHash stage so LSH never pays for them.

    One extra vectorized normalize kernel in the same map pass that
    hashes content; identical shuffle shape to :func:`exact_dedup`
    (hash-partition groupby over 8-byte digests, payloads stay put)."""
    def norm(batch: pa.Table) -> pa.Table:
        return pa.table({
            id_col: batch.column(id_col),
            text_col: textops.normalize_text(batch.column(text_col))})

    nds = ds.map_batches(norm, batch_format="pyarrow", zero_copy_batch=True)
    return exact_dedup(nds, id_col=id_col, text_col=text_col,
                       num_partitions=num_partitions)


# -------------------------------------------------------- minhash-LSH dedup

def minhash_dedup(ds, cfg: DedupConfig = None, id_col="doc_id", text_col="text"):
    """(id, cluster_id) via the full MinHash-LSH + containment pipeline."""
    cfg = cfg or DedupConfig()
    sds = _with_str_id(ds, id_col, text_col)
    res = dedup_pipeline(sds, cfg, id_col="image_id", text_col="caption",
                         phash_col=None, bytes_col=None,
                         enable=("minhash", "contain", "exact"))
    return _to_int_assignments(res.assignments, id_col)


def minhash_dedup_incremental(ds_old, ds_new, cfg: DedupConfig, workdir: str,
                              id_col="doc_id", text_col="text"):
    """(id, cluster_id) over old ∪ new documents, computed as a
    checkpointed base run over ``ds_old`` plus ONE incremental epoch for
    ``ds_new`` (increment.dedup_increment): new text is sketched, old
    epochs contribute only their persisted band keys, and stale buckets
    are never re-verified.  Equals ``minhash_dedup`` over the union when
    no skew cap binds differently (exact mode lifts the caps)."""
    from kmcp_ray.increment import dedup_increment

    dedup_pipeline(_with_str_id(ds_old, id_col, text_col), cfg,
                   id_col="image_id", text_col="caption",
                   phash_col=None, bytes_col=None,
                   enable=("minhash", "contain", "exact"),
                   workdir=workdir)   # checkpoints written eagerly
    res = dedup_increment(_with_str_id(ds_new, id_col, text_col), cfg,
                          workdir, phash_col=None, bytes_col=None,
                          enable=("minhash", "contain", "exact"))
    return _to_int_assignments(res.assignments, id_col)


# ------------------------------------------------------------ simhash dedup

def simhash_dedup(ds, cfg: DedupConfig = None, id_col="doc_id", text_col="text",
                  k: int = 3, token_hash: str = "sip"):
    """(id, cluster_id): SimHash-64 + Hamming-chunk banding.

    Text SimHash distances for near-dups are larger than image pHash
    ones (a 1-word edit flips ~3 shingles → ~6 bits), so this op runs at
    8 chunks / radius 7 — still pigeonhole-exact.  ``token_hash="md5"``
    switches the shingle hash to the SQL-mirrorable md5 variant (driver
    oracle); the banding/verify/CC machinery is identical."""
    import dataclasses
    cfg = dataclasses.replace(cfg or DedupConfig(),
                              phash_chunks=8, hamming_radius=7)

    def prep(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        sid = np.array([_ID_FMT.format(int(i)) for i in ids], dtype=object)
        sh = textops.simhash_batch(batch.column(text_col), k,
                                   token_hash=token_hash)
        return pa.table({"image_id": pa.array(sid, pa.string()),
                         "caption": batch.column(text_col),
                         "phash": pa.array(sh, pa.int64())})

    sds = ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
    res = dedup_pipeline(sds, cfg, id_col="image_id", text_col="caption",
                         phash_col="phash", bytes_col=None, enable=("phash",))
    return _to_int_assignments(res.assignments, id_col)


# ------------------------------------------------------ n-gram-Jaccard pairs

def ngram_jaccard_pairs(ds, cfg: DedupConfig = None, id_col="doc_id",
                        text_col="text"):
    """Verified near-dup pairs (id_a, id_b, via, score) with
    shingle-Jaccard >= cfg.jaccard_threshold or containment >=
    cfg.containment_threshold — the kmcp search-result analogue
    (qCov/jacc rows, reference kmcp/cmd/search.go:84-104)."""
    cfg = cfg or DedupConfig()
    from kmcp_ray.pipeline import edges_stage, sketch_stage
    sds = _with_str_id(ds, id_col, text_col)
    sig = sketch_stage(sds, cfg, id_col="image_id", text_col="caption",
                       phash_col=None, bytes_col=None, batch_size=4096) \
        .materialize()     # consumed 3x in edges_stage (bands, attach,
    #                        row-count mode switch) — sketch once
    edges = edges_stage(sig, cfg, enable=("minhash", "contain"))

    def to_int(batch: pa.Table) -> pa.Table:
        a = batch.column("id_a").to_numpy(zero_copy_only=False)
        b = batch.column("id_b").to_numpy(zero_copy_only=False)
        return pa.table({"id_a": pa.array([int(s[1:]) for s in a], pa.int64()),
                         "id_b": pa.array([int(s[1:]) for s in b], pa.int64()),
                         "via": batch.column("via"),
                         "score": batch.column("score")})
    return edges.map_batches(to_int, batch_format="pyarrow")


# -------------------------------------------- exact token-Jaccard (oracle)

def token_jaccard_exact(ds, *, max_id: int = 300, min_jacc_u: int = 650000,
                        id_col="doc_id", text_col="text"):
    """Exact distinct-token Jaccard over the ``doc_id < max_id`` slice —
    the all-pairs ground-truth baseline the MinHash/LSH path
    approximates (reference similarity definition:
    kmcp/cmd/search.go:84-104 jaccard line).

    Distributed shape: explode to distinct (doc, token) rows, pair
    within per-token groups (the textbook exact algorithm — output is
    sum_t C(df_t, 2) rows before the pair reduce, which is why LSH is
    the scale path and this entry is bounded by ``max_id``), reduce
    with one groupby, then attach the tiny per-doc distinct counts as
    a broadcast lookup.

    jaccard_u = floor(1e6 * shared / (n_a + n_b - shared)), float64
    both here and in the DuckDB oracle so boundary rows agree bit-wise.
    """
    import pyarrow.compute as pc

    sub = ds.map_batches(
        lambda t: t.filter(pc.less(t[id_col], max_id)),
        batch_format="pyarrow", zero_copy_batch=True)

    def explode(batch: pa.Table) -> pa.Table:
        lowered = pc.utf8_lower(batch.column(text_col))
        lists = pc.split_pattern_regex(lowered, pattern="[^a-z0-9]+")
        flat = pc.list_flatten(lists)
        parent = pc.list_parent_indices(lists)
        doc = pc.take(batch.column(id_col), parent)
        t = pa.table({"doc": pc.cast(doc, pa.int64()), "tok": flat})
        t = t.filter(pc.not_equal(t["tok"], ""))
        # distinct (doc, tok) — docs are whole within a batch, so a
        # per-batch distinct is a global distinct
        return t.group_by(["doc", "tok"]).aggregate([])

    # bounded-slice-sized (<= max_id * vocab rows); materialized because
    # the count side and the pair side both consume it — lazy fan-out
    # would run the explode twice
    toks = sub.map_batches(explode, batch_format="pyarrow",
                           zero_copy_batch=True).materialize()

    # per-doc distinct-token counts: <= max_id rows — the broadcast side
    cnt_rows = toks.groupby("doc").count().take_all()
    cnt_ids = np.array([r["doc"] for r in cnt_rows], np.int64)
    cnt_n = np.array([r["count()"] for r in cnt_rows], np.float64)
    order = np.argsort(cnt_ids)
    cnt_ids, cnt_n = cnt_ids[order], cnt_n[order]

    def pairs_fn(g: pa.Table) -> pa.Table:
        d = np.sort(g.column("doc").to_numpy(zero_copy_only=False)
                    .astype(np.int64))
        if len(d) < 2:
            return pa.table({"id_a": pa.array([], pa.int64()),
                             "id_b": pa.array([], pa.int64())})
        ia, ib = np.triu_indices(len(d), k=1)
        return pa.table({"id_a": d[ia], "id_b": d[ib]})

    shared = toks.groupby("tok").map_groups(
        pairs_fn, batch_format="pyarrow") \
        .groupby(["id_a", "id_b"]).count()

    def score(batch: pa.Table) -> pa.Table:
        a = batch.column("id_a").to_numpy(zero_copy_only=False)
        b = batch.column("id_b").to_numpy(zero_copy_only=False)
        s = batch.column("count()").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        na = cnt_n[np.searchsorted(cnt_ids, a)]
        nb = cnt_n[np.searchsorted(cnt_ids, b)]
        j = 1000000.0 * s / (na + nb - s)
        keep = j >= float(min_jacc_u)
        return pa.table({
            "id_a": pa.array(a[keep], pa.int64()),
            "id_b": pa.array(b[keep], pa.int64()),
            "jaccard_u": pa.array(np.floor(j[keep]).astype(np.int64),
                                  pa.int64())})

    return shared.map_batches(score, batch_format="pyarrow") \
        .sort(["id_a", "id_b"])


# ------------------------------------------------- representative selection

def select_representatives(assignments, docs, *, id_col="doc_id",
                           quality_col="n_chars", num_partitions: int = 64):
    """Pick each dedup cluster's surviving document by a quality policy:
    max ``quality_col``, ties broken by min id (the training-data "which
    duplicate do we keep" step; generalizes the pipeline's min-id
    canonical choice).  Emits one row per cluster:
    ``(cluster_id, rep_id, rep_quality, n_members)``.

    Shape: two packed exchanges, both pair-sized — (1) hash-partition by
    doc id to attach the quality value to each (id, cluster) assignment
    row via an in-partition searchsorted join (the non-broadcast arm,
    same as exchange.join_lookup but int64-typed end to end); (2)
    hash-partition by cluster id, one vectorized lexsort + segment-first
    per partition.  No driver pass, no broadcast of either side.
    """
    from kmcp_ray.exchange import Exchange, u64_part_fn

    P = int(num_partitions)
    ex1 = Exchange([("rt", pa.int8()), ("id", pa.int64()),
                    ("v", pa.int64())], P)
    pack1 = ex1.make_pack_fn(u64_part_fn("id", P=P))

    def tag_docs(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table({"rt": pa.array(np.zeros(n, np.int8), pa.int8()),
                         "id": t.column(id_col).cast(pa.int64()),
                         "v": t.column(quality_col).cast(pa.int64())})

    def tag_assign(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table({"rt": pa.array(np.ones(n, np.int8), pa.int8()),
                         "id": t.column(id_col).cast(pa.int64()),
                         "v": t.column("cluster_id").cast(pa.int64())})

    both = docs.map_batches(tag_docs, batch_format="pyarrow",
                            zero_copy_batch=True) \
        .union(assignments.map_batches(tag_assign, batch_format="pyarrow",
                                       zero_copy_batch=True)) \
        .map_batches(pack1, batch_format="pyarrow", zero_copy_batch=True)

    def attach_quality(group: pa.Table) -> pa.Table:
        u = ex1.unpack(group)
        rt = u["rt"].to_numpy(zero_copy_only=False)
        ids = u["id"].to_numpy(zero_copy_only=False)
        v = u["v"].to_numpy(zero_copy_only=False)
        kv = rt == 0
        pid, pcl = ids[~kv], v[~kv]
        if len(pid) == 0:
            return pa.table({"cluster_id": pa.array([], pa.int64()),
                             "doc_id": pa.array([], pa.int64()),
                             "q": pa.array([], pa.int64())})
        kid, kq = ids[kv], v[kv]
        order = np.argsort(kid, kind="stable")
        kid, kq = kid[order], kq[order]
        pos = np.searchsorted(kid, pid)
        pos_c = np.minimum(pos, max(len(kid) - 1, 0))
        hit = (pos < len(kid)) & (kid[pos_c] == pid) if len(kid) \
            else np.zeros(len(pid), bool)
        q = np.where(hit, kq[pos_c] if len(kid) else 0, 0)
        return pa.table({"cluster_id": pa.array(pcl, pa.int64()),
                         "doc_id": pa.array(pid, pa.int64()),
                         "q": pa.array(q.astype(np.int64), pa.int64())})

    triples = both.groupby("part").map_groups(attach_quality,
                                              batch_format="pyarrow")

    ex2 = Exchange([("cluster_id", pa.int64()), ("doc_id", pa.int64()),
                    ("q", pa.int64())], P)
    pack2 = ex2.make_pack_fn(u64_part_fn("cluster_id", P=P))

    def per_cluster(group: pa.Table) -> pa.Table:
        u = ex2.unpack(group)
        cl = u["cluster_id"].to_numpy(zero_copy_only=False)
        ids = u["doc_id"].to_numpy(zero_copy_only=False)
        q = u["q"].to_numpy(zero_copy_only=False)
        if len(cl) == 0:
            return pa.table({"cluster_id": pa.array([], pa.int64()),
                             "rep_id": pa.array([], pa.int64()),
                             "rep_quality": pa.array([], pa.int64()),
                             "n_members": pa.array([], pa.int64())})
        order = np.lexsort((ids, -q, cl))     # per cluster: q desc, id asc
        cl_s, ids_s, q_s = cl[order], ids[order], q[order]
        first = np.concatenate(([True], cl_s[1:] != cl_s[:-1]))
        starts = np.nonzero(first)[0]
        counts = np.diff(np.append(starts, len(cl_s)))
        return pa.table({
            "cluster_id": pa.array(cl_s[starts], pa.int64()),
            "rep_id": pa.array(ids_s[starts], pa.int64()),
            "rep_quality": pa.array(q_s[starts], pa.int64()),
            "n_members": pa.array(counts.astype(np.int64), pa.int64()),
        })

    return triples.map_batches(pack2, batch_format="pyarrow",
                               zero_copy_batch=True) \
        .groupby("part").map_groups(per_cluster, batch_format="pyarrow")


# ------------------------------------------------- duplication by group

def dup_rate_by_source(ds, group_col: str = "source",
                       text_col: str = "text",
                       num_partitions: int = 64):
    """Per-group duplication metrics: ``(group, n_docs, n_dup_docs,
    n_distinct)`` where a dup doc is one whose text occurs more than
    once CORPUS-WIDE (not just within its group) and n_distinct counts
    the group's distinct texts — the curation dashboard that decides
    which crawl sources feed the dedup stage (kmcp analogue: the
    per-database index-density diagnostics, kmcp/cmd/index.go:524-537
    dup-name accounting; semantics re-derived for corpus sources).

    Same shuffle shape as :func:`exact_dedup` — ONE hash-partition
    groupby over 8-byte content digests; each partition reduces to at
    most one row per (group) so the final groupby is group-count-sized.
    Integer-only outputs keep the DuckDB oracle bit-exact."""
    from ray.data.aggregate import Sum

    def add_hash(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_numpy(zero_copy_only=False)
        th = hashing.hash_strings(np.where(texts == None, "", texts))  # noqa: E711
        return pa.table({
            group_col: batch.column(group_col),
            "th": pa.array(th, pa.uint64()),
            "part": pa.array((th % np.uint64(num_partitions))
                             .astype(np.int64), pa.int64())})

    def per_partition(batch: pa.Table) -> pa.Table:
        th = batch.column("th").to_numpy(zero_copy_only=False) \
            .astype(np.uint64)
        grp = batch.column(group_col).to_numpy(zero_copy_only=False)
        empty = pa.table({group_col: pa.array([], pa.string()),
                          "n_docs": pa.array([], pa.int64()),
                          "n_dup_docs": pa.array([], pa.int64()),
                          "n_distinct": pa.array([], pa.int64())})
        if len(th) == 0:
            return empty
        # corpus-wide copy count per digest (a digest's rows all land
        # in this partition)
        u_th, inv_th, cnt = np.unique(th, return_inverse=True,
                                      return_counts=True)
        is_dup = (cnt > 1)[inv_th]
        g_u, g_inv = np.unique(grp, return_inverse=True)
        n_docs = np.bincount(g_inv, minlength=len(g_u))
        n_dup = np.bincount(g_inv[is_dup], minlength=len(g_u))
        # distinct (group, digest) pairs per group
        pair = g_inv.astype(np.uint64) * np.uint64(len(u_th)) \
            + inv_th.astype(np.uint64)
        up = np.unique(pair)
        n_dis = np.bincount((up // np.uint64(len(u_th))).astype(np.int64),
                            minlength=len(g_u))
        return pa.table({
            group_col: pa.array(g_u),
            "n_docs": pa.array(n_docs.astype(np.int64), pa.int64()),
            "n_dup_docs": pa.array(n_dup.astype(np.int64), pa.int64()),
            "n_distinct": pa.array(n_dis.astype(np.int64), pa.int64())})

    partials = ds.map_batches(add_hash, batch_format="pyarrow",
                              zero_copy_batch=True) \
        .groupby("part").map_groups(per_partition, batch_format="pyarrow")
    return partials.groupby(group_col).aggregate(
        Sum(on="n_docs", alias_name="n_docs"),
        Sum(on="n_dup_docs", alias_name="n_dup_docs"),
        Sum(on="n_distinct", alias_name="n_distinct"))


def cross_source_dup_matrix(ds, group_col: str = "source",
                            text_col: str = "text",
                            num_partitions: int = 64):
    """Cross-source duplication matrix: for every (source_a <=
    source_b) pair, the number of document PAIRS with byte-identical
    text where one copy sits in each source — the provenance view of
    exact duplication (which crawls/feeds re-publish each other), the
    natural sequel to :func:`dup_rate_by_source`.

    Counts are CLOSED-FORM per digest class (``cnt_a * cnt_b`` across
    sources, ``C(cnt,2)`` within one) — a viral doc copied 10^6 times
    contributes its 5·10^11 pairs as one multiplication, never as
    enumerated rows.  One hash-partition exchange over 8-byte digests;
    per-partition output is at most one row per (class, source pair);
    the final groupby is matrix-sized."""
    from kmcp_ray.buckets import _pairs_within_segments

    def add_hash(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_numpy(zero_copy_only=False)
        th = hashing.hash_strings(np.where(texts == None, "", texts))  # noqa: E711
        return pa.table({
            group_col: batch.column(group_col),
            "th": pa.array(th, pa.uint64()),
            "part": pa.array((th % np.uint64(num_partitions))
                             .astype(np.int64), pa.int64())})

    def per_partition(batch: pa.Table) -> pa.Table:
        th = batch.column("th").to_numpy(zero_copy_only=False) \
            .astype(np.uint64)
        grp = batch.column(group_col).to_numpy(zero_copy_only=False)
        if len(th) == 0:
            return pa.table({"source_a": pa.array([], pa.string()),
                             "source_b": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        _u_th, inv_th = np.unique(th, return_inverse=True)
        g_u, g_inv = np.unique(grp, return_inverse=True)
        S = np.int64(len(g_u))
        key = inv_th.astype(np.int64) * S + g_inv
        uk, c = np.unique(key, return_counts=True)
        c = c.astype(np.int64)
        cls, src = uk // S, (uk % S).astype(np.int64)
        # within-source pairs: C(cnt, 2) per (class, source) entry
        m = c > 1
        sa = [src[m]]
        sb = [src[m]]
        n = [(c[m] * (c[m] - 1)) // 2]
        # cross-source pairs: cnt_a * cnt_b for every source pair
        # inside one class segment (uk sorted => src ascending within
        # cls => source_a < source_b canonically, no post-sort)
        first = np.ones(len(uk), dtype=bool)
        first[1:] = cls[1:] != cls[:-1]
        starts = np.nonzero(first)[0]
        ends = np.append(starts[1:], len(uk))
        f, s2 = _pairs_within_segments(starts, ends)
        sa.append(src[f])
        sb.append(src[s2])
        n.append(c[f] * c[s2])
        return pa.table({
            "source_a": pa.array(g_u[np.concatenate(sa)]),
            "source_b": pa.array(g_u[np.concatenate(sb)]),
            "n": pa.array(np.concatenate(n), pa.int64())})

    from ray.data.aggregate import Sum
    out = ds.map_batches(add_hash, batch_format="pyarrow",
                         zero_copy_batch=True) \
        .groupby("part").map_groups(per_partition, batch_format="pyarrow") \
        .groupby(["source_a", "source_b"]) \
        .aggregate(Sum("n", alias_name="n_pairs"))

    def finish(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        kept = t.filter(pc.greater(t["n_pairs"], 0))
        return pa.table({"source_a": kept["source_a"],
                         "source_b": kept["source_b"],
                         "n_pairs": kept["n_pairs"].cast(pa.int64())})

    # a dup-free corpus yields ZERO blocks downstream of the groupby;
    # union a schema-carrying empty block so consumers (to_pandas, the
    # driver's schema compare) still see the contract columns
    import ray.data
    empty = ray.data.from_arrow(pa.table({
        "source_a": pa.array([], pa.string()),
        "source_b": pa.array([], pa.string()),
        "n_pairs": pa.array([], pa.int64())}))
    return empty.union(out.map_batches(finish, batch_format="pyarrow",
                                       zero_copy_batch=True))


def consensus_pairs(docs, emb, cfg: DedupConfig = None, *,
                    min_cos_u: int = 80_000, id_col="doc_id",
                    text_col="text", vec_col="vec_id",
                    emb_col="embedding"):
    """Multi-signal near-dup pairs: caption n-gram-Jaccard/containment
    pairs (:func:`ngram_jaccard_pairs`) CORROBORATED by embedding
    cosine >= min_cos_u/1e6 on the same ids — the text x embedding
    fusion cut (a pair must look duplicated in BOTH modalities).

    Scale shape: the pair stream is dup-volume-sized, so the vectors it
    needs are fetched with one distributed SEMI join of the corpus-sized
    embedding table against the pair-id set, and only that pair-bounded
    subset is collected + broadcast for the vectorized cosine pass —
    the embedding table itself never materializes.

    Returns (id_a, id_b, via, score_u, cos_u) sorted upstream of the
    caller."""
    import ray
    from kmcp_ray.joins import hash_join

    cfg = cfg or DedupConfig()
    pairs = ngram_jaccard_pairs(docs, cfg, id_col=id_col,
                                text_col=text_col).materialize()

    def pair_ids(t: pa.Table) -> pa.Table:
        a = t.column("id_a").to_numpy(zero_copy_only=False)
        b = t.column("id_b").to_numpy(zero_copy_only=False)
        return pa.table({"pid": pa.array(
            np.unique(np.concatenate((a, b))), pa.int64())})

    ids = pairs.map_batches(pair_ids, batch_format="pyarrow",
                            zero_copy_batch=True)
    vecs = hash_join(emb.select_columns([vec_col, emb_col]), ids,
                     how="semi", key=vec_col, right_key="pid",
                     left_cols=((vec_col, pa.int64()),
                                (emb_col, pa.list_(pa.float32())))) \
        .take_all()
    vid = np.array([r[vec_col] for r in vecs], dtype=np.int64)
    mat = np.stack([np.asarray(r[emb_col], dtype=np.float64)
                    for r in vecs]) if vecs else np.zeros((0, 1))
    mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True),
                           1e-300)
    order = np.argsort(vid)
    side = ray.put((vid[order], mat[order]))

    def fuse(t: pa.Table) -> pa.Table:
        sv, sm = ray.get(side)
        a = t.column("id_a").to_numpy(zero_copy_only=False)
        b = t.column("id_b").to_numpy(zero_copy_only=False)
        s = t.column("score").to_numpy(zero_copy_only=False)

        def vec_at(keys):
            pos = np.searchsorted(sv, keys)
            pos = np.minimum(pos, max(len(sv) - 1, 0))
            hit = sv[pos] == keys if len(sv) else np.zeros(len(keys), bool)
            return pos, hit

        pa_, ha = vec_at(a)
        pb_, hb = vec_at(b)
        both = ha & hb
        cos = np.full(len(a), -2.0)
        if both.any():
            cos[both] = np.einsum("ij,ij->i", sm[pa_[both]], sm[pb_[both]])
        cos_u = np.floor(cos * 1e6).astype(np.int64)
        keep = both & (cos_u >= min_cos_u)
        return pa.table({
            "id_a": pa.array(a[keep], pa.int64()),
            "id_b": pa.array(b[keep], pa.int64()),
            "via": pc.take(t.column("via"),
                           pa.array(np.nonzero(keep)[0], pa.int64())),
            "score_u": pa.array(np.floor(1e6 * s[keep]).astype(np.int64),
                                pa.int64()),
            "cos_u": pa.array(cos_u[keep], pa.int64())})

    return pairs.map_batches(fuse, batch_format="pyarrow",
                             zero_copy_batch=True)


def dedup_audit(ds, cfg_prod: DedupConfig = None, *, sample_pct: int = 20,
                id_col="doc_id", text_col="text"):
    """Sampled quality audit of the PRODUCTION dedup config: on a
    deterministic hash sample, run the near-dup pair generator twice —
    once with the exact knobs (bucket_scale=1, verify_k=inf, caps
    lifted: candidate recall 1 by construction, the driver-verifiable
    mode) and once with the production sampled-LSH knobs — and report
    pair precision/recall of production vs exact.  The per-epoch
    "is my LSH config still catching the dups" health check; both arms
    share one code path, so the audit measures exactly the knobs a
    real corpus run uses.

    Scale shape: everything downstream of the sample filter is
    sample-bounded; the two pair streams are compared with one tagged
    union + pair-keyed groupby (never collected).  Returns ONE row:
    (n_sample, n_exact, n_prod, n_common, recall_u, precision_u).
    """
    import dataclasses

    from kmcp_ray.curate import hash_sample

    cfg_prod = cfg_prod or DedupConfig()
    cfg_exact = dataclasses.replace(
        cfg_prod, bucket_scale=1, verify_k=1 << 30,
        min_containment_shingles=1, max_shingle_df=1 << 30,
        max_bucket=1 << 30)
    sample = hash_sample(ds.select_columns([id_col, text_col]),
                         sample_pct, id_col=id_col).materialize()
    n_sample = sample.count()

    def tag(is_exact: bool):
        def fn(t: pa.Table) -> pa.Table:
            n = t.num_rows
            one = np.ones(n, np.int64)
            zero = np.zeros(n, np.int64)
            return pa.table({
                "id_a": t.column("id_a"), "id_b": t.column("id_b"),
                "ex": pa.array(one if is_exact else zero, pa.int64()),
                "ap": pa.array(zero if is_exact else one, pa.int64())})
        return fn

    ex_pairs = ngram_jaccard_pairs(sample, cfg_exact, id_col=id_col,
                                   text_col=text_col) \
        .map_batches(tag(True), batch_format="pyarrow",
                     zero_copy_batch=True)
    ap_pairs = ngram_jaccard_pairs(sample, cfg_prod, id_col=id_col,
                                   text_col=text_col) \
        .map_batches(tag(False), batch_format="pyarrow",
                     zero_copy_batch=True)
    per_pair = ex_pairs.union(ap_pairs).groupby(["id_a", "id_b"]) \
        .sum(["ex", "ap"])

    def count_partial(t: pa.Table) -> pa.Table:
        e = t.column("sum(ex)").to_numpy(zero_copy_only=False) > 0
        a = t.column("sum(ap)").to_numpy(zero_copy_only=False) > 0
        return pa.table({
            "n_exact": pa.array([int(e.sum())], pa.int64()),
            "n_prod": pa.array([int(a.sum())], pa.int64()),
            "n_common": pa.array([int((e & a).sum())], pa.int64())})

    parts = per_pair.map_batches(count_partial, batch_format="pyarrow") \
        .take_all()
    n_exact = sum(r["n_exact"] for r in parts)
    n_prod = sum(r["n_prod"] for r in parts)
    n_common = sum(r["n_common"] for r in parts)
    recall_u = 1_000_000 if n_exact == 0 \
        else (1_000_000 * n_common) // n_exact
    precision_u = 1_000_000 if n_prod == 0 \
        else (1_000_000 * n_common) // n_prod
    return pa.table({
        "n_sample": pa.array([n_sample], pa.int64()),
        "n_exact": pa.array([n_exact], pa.int64()),
        "n_prod": pa.array([n_prod], pa.int64()),
        "n_common": pa.array([n_common], pa.int64()),
        "recall_u": pa.array([recall_u], pa.int64()),
        "precision_u": pa.array([precision_u], pa.int64())})


# ------------------------------------------------ edit-distance verify

def levenshtein_batch(A, B) -> np.ndarray:
    """Unit-cost Levenshtein distance for a BATCH of string pairs,
    vectorized across pairs AND along the DP row (no per-cell Python).

    The in-row dependence ``dp[i][j] = min(u[j], dp[i][j-1]+1)``
    unrolls to ``dp[i][j] = j + min_{k<=j}(u[k]-k)`` — one
    ``np.minimum.accumulate`` per row — so the whole batch advances one
    DP row per iteration as 2-D (pairs x cols) kernels; ``max_len``
    iterations total.  Strings are compared as UNICODE CODE POINTS
    (fixed-width utf-32 buffers), so semantics are identical to
    DuckDB's character-level ``levenshtein()`` (insert/delete/
    substitute, cost 1 each) for non-ASCII input too, which is the
    oracle mirror."""
    P = len(A)
    out = np.zeros(P, np.int64)
    if P == 0:
        return out
    la = np.array([len(s) for s in A], np.int64)
    lb = np.array([len(s) for s in B], np.int64)
    Ma, Mb = int(la.max()), int(lb.max())
    Abuf = np.zeros((P, max(Ma, 1)), np.uint32)
    Bbuf = np.zeros((P, max(Mb, 1)), np.uint32)
    for i, s in enumerate(A):
        if s:
            Abuf[i, :len(s)] = np.frombuffer(s.encode("utf-32-le"),
                                             np.uint32)
    for i, s in enumerate(B):
        if s:
            Bbuf[i, :len(s)] = np.frombuffer(s.encode("utf-32-le"),
                                             np.uint32)
    idx = np.arange(Mb + 1, dtype=np.int32)
    dp = np.tile(idx, (P, 1))
    out[la == 0] = lb[la == 0]
    u = np.empty_like(dp)
    for i in range(1, Ma + 1):
        cost = (Abuf[:, i - 1:i] != Bbuf[:, :Mb]).astype(np.int32)
        u[:, 0] = i
        u[:, 1:] = np.minimum(dp[:, 1:] + 1, dp[:, :-1] + cost)
        np.minimum(u, np.minimum.accumulate(u - idx, axis=1) + idx,
                   out=u)
        active = la >= i
        dp[active] = u[active]
        done = la == i
        if done.any():
            out[done] = dp[done, lb[done]]
    return out


def edit_distance_pairs(ds, *, max_id: int = 300,
                        cand_jacc_u: int = 900_000, max_dist: int = 25,
                        id_col: str = "doc_id", text_col: str = "text"):
    """Edit-distance-verified near-duplicate pairs: exact-Jaccard
    candidates (>= ``cand_jacc_u``) re-verified with CHARACTER-level
    Levenshtein over the normalized token-joined strings, keeping
    ``dist <= max_dist`` — ``(id_a, id_b, dist)``.  The order-sensitive
    second opinion the set-based Jaccard can't give: token-permuted
    texts share a perfect Jaccard but a large edit distance
    (kmcp analogue: the match-verification funnel after k-mer
    containment, reference kmcp/cmd/search.go:84-104, semantics
    re-derived).

    Scale shape: candidates are pair-bounded (here the bounded
    ground-truth slice, in production the LSH mine — swap unchanged);
    the ``max_id`` normalized texts broadcast once; verification is the
    batch-vectorized :func:`levenshtein_batch` wavefront, distributed
    across candidate partitions."""
    import ray
    import pyarrow.compute as pc

    pairs = token_jaccard_exact(ds, max_id=max_id,
                                min_jacc_u=cand_jacc_u,
                                id_col=id_col, text_col=text_col)

    def norm(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less(t[id_col], max_id))
        lowered = pc.utf8_lower(t.column(text_col))
        lists = pc.split_pattern_regex(lowered, pattern="[^a-z0-9]+")
        joined = pc.binary_join(lists, " ")
        # leading/trailing separators leave empty list slots
        joined = pc.utf8_trim_whitespace(joined)
        return pa.table({"did": t.column(id_col).cast(pa.int64()),
                         "txt": joined})

    side = [(np.empty(0, np.int64), [])]
    for b in ds.select_columns([id_col, text_col]) \
            .map_batches(norm, batch_format="pyarrow",
                         zero_copy_batch=True) \
            .iter_batches(batch_size=1 << 16, batch_format="pyarrow"):
        side.append((b.column("did").to_numpy(zero_copy_only=False),
                     b.column("txt").to_pylist()))
    ids = np.concatenate([s[0] for s in side])
    txts = np.array([t for s in side for t in s[1]], dtype=object)
    order = np.argsort(ids)
    ref = ray.put((ids[order], txts[order]))

    def verify(t: pa.Table) -> pa.Table:
        ids_s, txts_s = ray.get(ref)
        a = t.column("id_a").to_numpy(zero_copy_only=False)
        b = t.column("id_b").to_numpy(zero_copy_only=False)
        ta = txts_s[np.searchsorted(ids_s, a)]
        tb = txts_s[np.searchsorted(ids_s, b)]
        d = levenshtein_batch(ta, tb)
        keep = d <= max_dist
        return pa.table({"id_a": pa.array(a[keep], pa.int64()),
                         "id_b": pa.array(b[keep], pa.int64()),
                         "dist": pa.array(d[keep], pa.int64())})

    return pairs.map_batches(verify, batch_format="pyarrow",
                             zero_copy_batch=True).sort(["id_a", "id_b"])
