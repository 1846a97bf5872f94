"""Query-vs-reference containment search + shard merge — the kmcp
``search`` / ``merge`` analogue.

kmcp scores every query sketch against every reference chunk by
counting shared k-mers in a bit-sliced Bloom index and reports
qCov/tCov/jacc per (query, target) with an FPR gate and a
top-N-distinct-scores cut (reference: kmcp/cmd/search.go:84-104,
util-db-search.go:7466-7493, 284-311).  Here the same semantics are
Ray-Data-native and **count-based**: every kept shingle hash is a
bucket key; a (query, target) pair appears in exactly one bucket per
shared kept shingle, so ``groupby(query, target).count()`` IS the
shared-shingle count — no sketch payload moves at all, and with
``search_scale == 1`` the counts (hence qCov) are exact, which is
kmcp's exact k-mer containment mode.

Shard merge: kmcp merges per-shard result streams with a QueryIdx
k-way heap merge (merge.go:333-367).  Content-keyed grouping replaces
ordering entirely: ``merge_search_results`` = union → re-apply the
per-query top cut; by construction
``merge(search(q, refs_A), search(q, refs_B)) == search(q, refs_A∪B)``
(verified in tests).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from kmcp_ray import hashing
from kmcp_ray.config import DedupConfig
from kmcp_ray.relops import binom_sf
from kmcp_ray.text import shingle_sets

_QKEY_SALT = np.uint64(0x8EBC6AF09C88C6E3)

MATCH_COLUMNS = ["query", "q_kept", "target", "t_kept", "m_shared",
                 "qcov", "tcov", "jacc", "fpr", "q_ntok", "t_ntok"]


def _bucket_rows(ds, cfg: DedupConfig, id_col, text_col, role: int,
                 scale: int):
    """id/text rows → (part, key, role, rid, kept, ntok) bucket rows.

    The per-row kept-shingle count and token count ride WITH each bucket
    row (16 bytes), so downstream scoring needs no broadcast of per-row
    count tables — at 10^9+ rows a driver-collected count map would be
    tens of GB.  ``ntok`` feeds the kmcp 15-column TSV's qLen/tLen
    (reference: kmcp/cmd/search.go:84-104)."""
    max_hash = hashing.MAX_U64 // np.uint64(scale)

    def expand(batch: pa.Table) -> pa.Table:
        ss = shingle_sets(batch.column(text_col), cfg.shingle_k, int(max_hash))
        h, off = ss["hashes"], ss["offsets"]
        n = len(off) - 1
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        if ids.dtype != object:
            ids = ids.astype(str).astype(object)
        lens = off[1:] - off[:-1]
        rows = np.repeat(np.arange(n), lens)
        keys = hashing.splitmix64(h + _QKEY_SALT)
        part = (keys % np.uint64(cfg.num_partitions)).astype(np.int64)
        return pa.table({
            "part": pa.array(part, pa.int64()),
            "key": pa.array(keys, pa.uint64()),
            "role": pa.array(np.full(len(rows), role, dtype=np.int8), pa.int8()),
            "rid": pa.array(ids[rows].astype(object), pa.string()),
            "kept": pa.array(lens[rows].astype(np.int64), pa.int64()),
            "ntok": pa.array(ss["n_tokens"][rows].astype(np.int64),
                             pa.int64()),
        })

    return ds.map_batches(expand, batch_format="pyarrow", zero_copy_batch=True)


def _pairs_per_partition(group: pa.Table, max_df: int) -> pa.Table:
    """One partition: for every equal-key segment emit (query, target)
    once per shared kept shingle.  Buckets with more rows than
    ``max_df`` on either side are truncated with a warning counter
    (high-df shingles; kmcp's Bloom-FPR cost analogue).

    Fully vectorized: per-segment q/t counts fall out of one bincount
    over (segment, role); non-mixed segments are masked out; the
    cross-products of all mixed segments are emitted with one
    repeat/arange pass — no per-distinct-shingle Python (at
    search_scale=1 a big corpus has millions of segments/partition).
    The rare ``max_df``-capped segments keep a per-segment loop."""
    keys = group.column("key").to_numpy(zero_copy_only=False).astype(np.uint64)
    roles = group.column("role").to_numpy(zero_copy_only=False)
    rids = group.column("rid").to_numpy(zero_copy_only=False)
    kept = group.column("kept").to_numpy(zero_copy_only=False).astype(np.int64)
    ntok = group.column("ntok").to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((roles, keys))
    keys_s, roles_s = keys[order], roles[order]
    m = len(keys_s)
    if m == 0:
        return _empty_pairs()
    seg_first = np.concatenate(([True], keys_s[1:] != keys_s[:-1]))
    seg_id = np.cumsum(seg_first) - 1
    nseg = int(seg_id[-1]) + 1
    seg_start = np.nonzero(seg_first)[0]
    # q rows sort before t rows within a segment (lexsort minor = role)
    nq = np.bincount(seg_id[roles_s == 0], minlength=nseg)
    nt = np.bincount(seg_id[roles_s == 1], minlength=nseg)
    mixed = (nq > 0) & (nt > 0)
    easy = mixed & (nq <= max_df) & (nt <= max_df)
    capped = mixed & ~easy

    out_q, out_t = [], []
    if easy.any():
        qs_start = seg_start[easy]
        ts_start = qs_start + nq[easy]
        nqe = nq[easy]
        nte = nt[easy]
        counts = nqe * nte
        total = int(counts.sum())
        excl = np.concatenate(([0], np.cumsum(counts)[:-1]))
        within = np.arange(total) - np.repeat(excl, counts)
        nte_r = np.repeat(nte, counts)
        qi = within // nte_r
        ti = within % nte_r
        out_q.append(order[np.repeat(qs_start, counts) + qi])
        out_t.append(order[np.repeat(ts_start, counts) + ti])

    dropped = 0
    for sidx in np.nonzero(capped)[0]:          # rare: df-capped segments
        s = seg_start[sidx]
        qs = order[s:s + nq[sidx]]
        ts = order[s + nq[sidx]:s + nq[sidx] + nt[sidx]]
        # deterministic cut: sort each side by rid first — Ray's
        # groupby row order is not stable across runs
        dropped += max(0, len(qs) - max_df) + max(0, len(ts) - max_df)
        qs = qs[np.argsort(rids[qs], kind="stable")][:max_df]
        ts = ts[np.argsort(rids[ts], kind="stable")][:max_df]
        qq, tt = np.meshgrid(qs, ts, indexing="ij")
        out_q.append(qq.ravel())
        out_t.append(tt.ravel())
    if dropped:
        import logging
        logging.getLogger(__name__).warning(
            "shingle df cap: %d bucket rows truncated (max_df=%d)",
            dropped, max_df)
    if not out_q:
        return _empty_pairs()
    oq, ot = np.concatenate(out_q), np.concatenate(out_t)
    return pa.table({"query": pa.array(rids[oq], pa.string()),
                     "target": pa.array(rids[ot], pa.string()),
                     "q_kept": pa.array(kept[oq], pa.int64()),
                     "t_kept": pa.array(kept[ot], pa.int64()),
                     "q_ntok": pa.array(ntok[oq], pa.int64()),
                     "t_ntok": pa.array(ntok[ot], pa.int64())})


def _empty_pairs() -> pa.Table:
    return pa.table({"query": pa.array([], pa.string()),
                     "target": pa.array([], pa.string()),
                     "q_kept": pa.array([], pa.int64()),
                     "t_kept": pa.array([], pa.int64()),
                     "q_ntok": pa.array([], pa.int64()),
                     "t_ntok": pa.array([], pa.int64())})


def search(query_ds, ref_ds, cfg: DedupConfig = DedupConfig(), *,
           query_id="doc_id", query_text="text",
           ref_id="doc_id", ref_text="text",
           min_qcov: float = 0.5, min_shared: int = 3,
           max_fpr: float = 0.01, search_scale: int = 1,
           shingle_df_cap: int = 1024, top_n_scores: int = 0):
    """Containment search of queries against references.

    Returns a Dataset with :data:`MATCH_COLUMNS`; ids are prefixed
    strings of the inputs' id columns.  ``search_scale == 1`` → exact
    shared-shingle counts (kmcp exact containment); > 1 → FracMinHash
    estimates at 1/scale cost.
    """
    from kmcp_ray.exchange import count_pairs

    qb = _bucket_rows(query_ds, cfg, query_id, query_text,
                      role=0, scale=search_scale)
    rb = _bucket_rows(ref_ds, cfg, ref_id, ref_text,
                      role=1, scale=search_scale)

    pairs = qb.union(rb).groupby("part").map_groups(
        lambda g: _pairs_per_partition(g, shingle_df_cap),
        batch_format="pyarrow")
    # kept counts rode with the bucket rows; carry them through the
    # count exchange (constant within a (query, target) group)
    shared = count_pairs(pairs, cfg.num_partitions, "query", "target",
                         count_name="m_shared",
                         carry_int_cols=("q_kept", "t_kept",
                                         "q_ntok", "t_ntok"))

    def score(batch: pa.Table) -> pa.Table:
        q = batch.column("query").to_numpy(zero_copy_only=False)
        t = batch.column("target").to_numpy(zero_copy_only=False)
        c = batch.column("m_shared").to_numpy(zero_copy_only=False).astype(np.int64)
        kq = batch.column("q_kept").to_numpy(zero_copy_only=False).astype(np.int64)
        kt = batch.column("t_kept").to_numpy(zero_copy_only=False).astype(np.int64)
        qn = batch.column("q_ntok").to_numpy(zero_copy_only=False).astype(np.int64)
        tn = batch.column("t_ntok").to_numpy(zero_copy_only=False).astype(np.int64)
        ok = (kq > 0) & (kt > 0) & (c >= min_shared)
        q, t, c, kq, kt = q[ok], t[ok], c[ok], kq[ok], kt[ok]
        qn, tn = qn[ok], tn[ok]
        qcov = c / np.maximum(kq, 1)
        tcov = c / np.maximum(kt, 1)
        jacc = c / np.maximum(kq + kt - c, 1)
        keep = qcov >= min_qcov
        q, t, c, kq, kt = q[keep], t[keep], c[keep], kq[keep], kt[keep]
        qn, tn = qn[keep], tn[keep]
        qcov, tcov, jacc = qcov[keep], tcov[keep], jacc[keep]
        # chance-collision significance gate (kmcp query-fpr, M16):
        # p = prob a random kept shingle of the query also hits the target
        p_hit = np.minimum(0.999, kt / 2.0 ** 20)
        fpr = binom_sf(kq, c, np.maximum(1e-12, p_hit))
        keep2 = fpr <= max_fpr
        return pa.table({
            "query": pa.array(q[keep2], pa.string()),
            "q_kept": pa.array(kq[keep2], pa.int64()),
            "target": pa.array(t[keep2], pa.string()),
            "t_kept": pa.array(kt[keep2], pa.int64()),
            "m_shared": pa.array(c[keep2], pa.int64()),
            "qcov": pa.array(qcov[keep2], pa.float64()),
            "tcov": pa.array(tcov[keep2], pa.float64()),
            "jacc": pa.array(jacc[keep2], pa.float64()),
            "fpr": pa.array(fpr[keep2], pa.float64()),
            "q_ntok": pa.array(qn[keep2], pa.int64()),
            "t_ntok": pa.array(tn[keep2], pa.int64()),
        })

    matches = shared.map_batches(score, batch_format="pyarrow",
                                 zero_copy_batch=True)
    if top_n_scores > 0:
        matches = top_scores_per_query(matches, top_n_scores)
    return matches


def top_scores_per_query(matches, n: int):
    """kmcp --keep-top-scores: keep matches whose qcov is among the
    query's top-n DISTINCT score values (reference:
    kmcp/cmd/util-db-search.go:284-311 semantics, re-derived)."""
    def cut(group: pa.Table) -> pa.Table:
        qcov = group.column("qcov").to_numpy(zero_copy_only=False)
        distinct = np.unique(np.round(qcov, 12))[::-1]
        if len(distinct) > n:
            thresh = distinct[n - 1]
            keep = np.round(qcov, 12) >= thresh
            group = group.filter(pa.array(keep))
        # deterministic order: qcov desc, then target
        t = group.column("target").to_numpy(zero_copy_only=False)
        qc = group.column("qcov").to_numpy(zero_copy_only=False)
        order = np.lexsort((t, -qc))
        return group.take(pa.array(order, pa.int64()))

    return matches.groupby("query").map_groups(cut, batch_format="pyarrow")


_MATCH_EX_SCHEMA = [("query", pa.string()), ("q_kept", pa.int64()),
                    ("target", pa.string()), ("t_kept", pa.int64()),
                    ("m_shared", pa.int64()), ("qcov", pa.float64()),
                    ("tcov", pa.float64()), ("jacc", pa.float64()),
                    ("fpr", pa.float64()), ("q_ntok", pa.int64()),
                    ("t_ntok", pa.int64())]


def _match_exchange(ds_list, P):
    from kmcp_ray.exchange import Exchange, hash_part_fn
    ex = Exchange(_MATCH_EX_SCHEMA, P)
    pack = ex.make_pack_fn(hash_part_fn("query", P=P))

    def pack_compat(batch: pa.Table) -> pa.Table:
        # legacy 9-column match tables (results written before the TSV
        # ntok columns existed) still merge/intersect: fill ntok with 0
        for name in ("q_ntok", "t_ntok"):
            if name not in batch.column_names:
                batch = batch.append_column(
                    name, pa.array(np.zeros(batch.num_rows, np.int64),
                                   pa.int64()))
        return pack(batch)

    packed = None
    for ds in ds_list:
        p = ds.map_batches(pack_compat, batch_format="pyarrow",
                           zero_copy_batch=True)
        packed = p if packed is None else packed.union(p)
    return ex, packed


def intersect_search_results(result_dses, num_partitions: int = 64):
    """Multi-DB search intersection (J2): keep (query, target) matches
    present in ALL result sets, with the minimum shared-count row's
    scores — the kmcp multi-database workflow semantics (reference:
    kmcp/cmd/util-db-search.go:359-474, re-derived: per query, targets
    missing from any DB are deleted and the minimum k-mer count wins)."""
    n_dbs = len(result_dses)
    ex, packed = _match_exchange(result_dses, num_partitions)

    def isect(group: pa.Table) -> pa.Table:
        u = ex.unpack(group)
        cols = {name: u[name].to_numpy(zero_copy_only=False)
                for name, _t in _MATCH_EX_SCHEMA}
        q, t, m = cols["query"], cols["target"], cols["m_shared"]
        order = np.lexsort((m, t, q))
        q_s, t_s = q[order], t[order]
        first = np.concatenate(([True],
                                (q_s[1:] != q_s[:-1]) | (t_s[1:] != t_s[:-1]))) \
            if len(q_s) else np.empty(0, bool)
        seg = np.cumsum(first) - 1
        sizes = np.bincount(seg) if len(seg) else np.empty(0, np.int64)
        keep_seg = sizes == n_dbs
        # min m_shared row = first row of each kept segment (m-sorted)
        keep_rows = first & keep_seg[seg] if len(seg) else first
        sel = order[keep_rows]
        return pa.table({name: pa.array(cols[name][sel], typ)
                         for name, typ in _MATCH_EX_SCHEMA})

    return packed.groupby("part").map_groups(isect, batch_format="pyarrow")


def add_hits(matches, num_partitions: int = 64):
    """Attach the per-query ``hits`` column (number of matched targets)
    — recomputed AFTER any merge, the kmcp post-merge hits rewrite
    (reference: kmcp/cmd/merge.go:210-224)."""
    ex, packed = _match_exchange([matches], num_partitions)

    def hits(group: pa.Table) -> pa.Table:
        u = ex.unpack(group)
        cols = {name: u[name].to_numpy(zero_copy_only=False)
                for name, _t in _MATCH_EX_SCHEMA}
        q = cols["query"]
        order = np.argsort(q, kind="stable")
        q_s = q[order]
        first = np.concatenate(([True], q_s[1:] != q_s[:-1])) \
            if len(q_s) else np.empty(0, bool)
        seg = np.cumsum(first) - 1
        sizes = np.bincount(seg) if len(seg) else np.empty(0, np.int64)
        out = {name: pa.array(cols[name][order], typ)
               for name, typ in _MATCH_EX_SCHEMA}
        out["hits"] = pa.array(sizes[seg], pa.int64())
        return pa.table(out)

    return packed.groupby("part").map_groups(hits, batch_format="pyarrow")


def build_ref_index(ref_ds, cfg: DedupConfig, *, ref_id="doc_id",
                    ref_text="text", scale: int = 1):
    """Reference side → an in-memory inverted index (the kmcp
    load-whole-index mode, reference: kmcp/cmd/util-db-search.go:
    1238-1280 / search.go:66-83): sorted shingle-hash postings with
    int32 target ids, plus per-target kept counts and names.

    Returns numpy arrays (keys_sorted, tgt_of_posting, names, kept,
    ntok) — near-zero-copy through ``ray.put``.
    """
    keys_parts, tgt_parts, name_parts, kept_parts = [], [], [], []
    ntok_parts = []
    max_hash = hashing.MAX_U64 // np.uint64(scale)
    base = 0
    for b in ref_ds.iter_batches(batch_format="pyarrow"):
        ss = shingle_sets(b.column(ref_text), cfg.shingle_k, int(max_hash))
        h, off = ss["hashes"], ss["offsets"]
        n = len(off) - 1
        ids = b.column(ref_id).to_numpy(zero_copy_only=False)
        if ids.dtype != object:
            ids = ids.astype(str).astype(object)
        lens = off[1:] - off[:-1]
        keys_parts.append(h)
        tgt_parts.append(np.repeat(np.arange(base, base + n), lens)
                         .astype(np.int32))
        name_parts.append(ids)
        kept_parts.append(lens.astype(np.int64))
        ntok_parts.append(ss["n_tokens"].astype(np.int64))
        base += n
    if not keys_parts:
        return (np.empty(0, np.uint64), np.empty(0, np.int32),
                np.empty(0, object), np.empty(0, np.int64),
                np.empty(0, np.int64))
    keys = np.concatenate(keys_parts)
    tgt = np.concatenate(tgt_parts)
    order = np.argsort(keys, kind="stable")
    return (keys[order], tgt[order], np.concatenate(name_parts),
            np.concatenate(kept_parts), np.concatenate(ntok_parts))


class IndexedSearcher:
    """Actor-pool searcher: the broadcast index is fetched ONCE per
    actor in ``__init__`` (kmcp per-worker index load, T1) along with
    the per-actor FPR cache (T2 = relops' process-level log-factorial
    table); ``__call__`` scores one query batch with searchsorted
    probes + one sparse bincount — no shuffle at all."""

    def __init__(self, index_ref, cfg: DedupConfig, min_qcov, min_shared,
                 max_fpr, scale, query_id, query_text):
        import ray as _ray
        (self.keys, self.tgt, self.names, self.kept,
         self.ref_ntok) = _ray.get(index_ref)
        self.cfg = cfg
        self.min_qcov, self.min_shared = min_qcov, min_shared
        self.max_fpr, self.scale = max_fpr, scale
        self.query_id, self.query_text = query_id, query_text

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        max_hash = hashing.MAX_U64 // np.uint64(self.scale)
        ss = shingle_sets(batch.column(self.query_text), cfg.shingle_k,
                          int(max_hash))
        h, off = ss["hashes"], ss["offsets"]
        qids = batch.column(self.query_id).to_numpy(zero_copy_only=False)
        if qids.dtype != object:
            qids = qids.astype(str).astype(object)
        nq = len(off) - 1
        kq_all = (off[1:] - off[:-1]).astype(np.int64)
        qn_all = ss["n_tokens"].astype(np.int64)
        lo = np.searchsorted(self.keys, h, side="left")
        hi = np.searchsorted(self.keys, h, side="right")
        lens = hi - lo
        from kmcp_ray.bands import _segment_gather
        gather = _segment_gather(lo, lens)
        row_of_shingle = np.repeat(np.arange(nq), off[1:] - off[:-1])
        rows = np.repeat(row_of_shingle, lens)
        tgts = self.tgt[gather].astype(np.int64)
        T = max(len(self.kept), 1)
        code = rows * T + tgts
        uniq, counts = np.unique(code, return_counts=True)
        qrow = (uniq // T).astype(np.int64)
        tcol = (uniq % T).astype(np.int64)
        c = counts.astype(np.int64)
        kq = kq_all[qrow]
        kt = self.kept[tcol]
        ok = (c >= self.min_shared)
        qrow, tcol, c, kq, kt = qrow[ok], tcol[ok], c[ok], kq[ok], kt[ok]
        qcov = c / np.maximum(kq, 1)
        keep = qcov >= self.min_qcov
        qrow, tcol, c, kq, kt = (qrow[keep], tcol[keep], c[keep],
                                 kq[keep], kt[keep])
        qcov = qcov[keep]
        tcov = c / np.maximum(kt, 1)
        jacc = c / np.maximum(kq + kt - c, 1)
        from kmcp_ray.relops import binom_sf
        p_hit = np.minimum(0.999, kt / 2.0 ** 20)
        fpr = binom_sf(kq, c, np.maximum(1e-12, p_hit))
        keep2 = fpr <= self.max_fpr
        return pa.table({
            "query": pa.array(qids[qrow[keep2]], pa.string()),
            "q_kept": pa.array(kq[keep2], pa.int64()),
            "target": pa.array(self.names[tcol[keep2]], pa.string()),
            "t_kept": pa.array(kt[keep2], pa.int64()),
            "m_shared": pa.array(c[keep2], pa.int64()),
            "qcov": pa.array(qcov[keep2], pa.float64()),
            "tcov": pa.array(tcov[keep2], pa.float64()),
            "jacc": pa.array(jacc[keep2], pa.float64()),
            "fpr": pa.array(fpr[keep2], pa.float64()),
            "q_ntok": pa.array(qn_all[qrow[keep2]], pa.int64()),
            "t_ntok": pa.array(self.ref_ntok[tcol[keep2]], pa.int64()),
        })


def search_indexed(query_ds, ref_ds, cfg: DedupConfig = DedupConfig(), *,
                   query_id="doc_id", query_text="text",
                   ref_id="doc_id", ref_text="text",
                   min_qcov: float = 0.5, min_shared: int = 3,
                   max_fpr: float = 0.01, search_scale: int = 1,
                   concurrency: int = 4, batch_size: int = 4096,
                   top_n_scores: int = 0, max_index_rows: int = 8_000_000):
    """Shuffle-free search against a broadcast inverted index held by an
    actor pool — same MATCH_COLUMNS and semantics as :func:`search`
    (verified equal in tests); right when the index fits in worker
    memory and queries vastly outnumber references (the kmcp common
    case: short reads vs a prebuilt DB).

    ``max_index_rows`` guards the driver-side index build (the kmcp
    load-whole-index mode bound, search.go:66-83): a reference side
    larger than this falls back to the shuffle :func:`search` — same
    output, no whole-reference materialization on the driver (mirrors
    ann.cosine_pairs' ``max_broadcast_rows`` cutover)."""
    import ray
    if ref_ds.count() > max_index_rows:
        return search(query_ds, ref_ds, cfg, query_id=query_id,
                      query_text=query_text, ref_id=ref_id,
                      ref_text=ref_text, min_qcov=min_qcov,
                      min_shared=min_shared, max_fpr=max_fpr,
                      search_scale=search_scale, top_n_scores=top_n_scores)
    index_ref = ray.put(build_ref_index(ref_ds, cfg, ref_id=ref_id,
                                        ref_text=ref_text,
                                        scale=search_scale))
    matches = query_ds.map_batches(
        IndexedSearcher, fn_constructor_args=(
            index_ref, cfg, min_qcov, min_shared, max_fpr, search_scale,
            query_id, query_text),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)
    if top_n_scores > 0:
        matches = top_scores_per_query(matches, top_n_scores)
    return matches


def assign_best_target(query_ds, ref_ds, cfg: DedupConfig = DedupConfig(),
                       **search_kw):
    """Fragment → most-similar-target assignment (J5, reference:
    kmcp/cmd/split-genomes.go:538-580 semantics re-derived): search,
    then keep each query's argmax match by (m_shared, qcov), ties by
    target id; one row per assigned query."""
    matches = search(query_ds, ref_ds, cfg, **search_kw)

    def best(group: pa.Table) -> pa.Table:
        m = group.column("m_shared").to_numpy(zero_copy_only=False)
        qc = group.column("qcov").to_numpy(zero_copy_only=False)
        t = group.column("target").to_numpy(zero_copy_only=False)
        order = np.lexsort((t, -qc, -m))
        return group.take(pa.array(order[:1], pa.int64()))

    return matches.groupby("query").map_groups(best, batch_format="pyarrow")


def merge_search_results(result_dses, top_n_scores: int = 0):
    """Union per-shard search outputs; re-apply the per-query cut.

    Replaces kmcp merge's QueryIdx heap merge with content-keyed
    grouping (no ordering contract; SURVEY §2.6 O4)."""
    merged = result_dses[0]
    for other in result_dses[1:]:
        merged = merged.union(other)
    if top_n_scores > 0:
        merged = top_scores_per_query(merged, top_n_scores)
    return merged


def to_kmcp_tsv(matches, path: str, cfg: DedupConfig, total_queries: int,
                num_partitions: int = 64) -> dict:
    """Write matches as the reference's 15-column TSV + trailer stats
    (kmcp/cmd/search.go:84-104 column layout, 1023-1025 trailer lines;
    semantics re-derived for token documents):

      query qLen qKmers FPR hits target chunkIdx chunks tLen kSize
      mKmers qCov tCov jacc queryIdx

    qLen/tLen are token counts (the sequence-length analogue), qKmers =
    kept shingles, chunkIdx/chunks decode "id#c/n" chunk identities
    (plain ids → 0/1), queryIdx is the dense rank of the query id (a
    content-derived stand-in for kmcp's input-order index — this engine
    has no ordering contract).  A CLI convenience matching kmcp's
    single-writer TSV — but STREAMED: columns derive per batch, the
    ordering contract runs as a distributed sort, and the driver only
    formats one batch at a time (``iter_batches``), so driver RSS is
    bounded by (batch size + the distinct-query rank table), never by
    the match count (r3 verdict #4).  Parquet stays the scale path.
    """
    import pyarrow.compute as pc
    import ray

    hits_ds = add_hits(matches, num_partitions=num_partitions) \
        .materialize()       # consumed twice: query ranks + the rows
    # distinct query ids → dense rank table (query-count-bounded, NOT
    # match-count-bounded; broadcast once as a sorted fixed-width array)
    chunks = [np.empty(0, dtype="S1")]
    for b in hits_ds.select_columns(["query"]).map_batches(
            lambda t: pa.table({"query": pc.unique(t["query"])}),
            batch_format="pyarrow", zero_copy_batch=True) \
            .iter_batches(batch_size=1 << 18, batch_format="pyarrow"):
        # cast utf8 -> binary so numpy packs UTF-8 bytes (never an
        # implicit ASCII encode, which raised on non-ASCII ids); UTF-8
        # byte order == code-point order, so ranks are unchanged.
        qb = pc.cast(b.column("query"), pa.binary()) \
            .to_numpy(zero_copy_only=False)
        chunks.append(np.asarray(qb, dtype="S"))
    width = max(c.dtype.itemsize for c in chunks)
    uniq = np.unique(np.concatenate(
        [c.astype(f"S{width}") for c in chunks]))
    matched = len(uniq)
    uniq_ref = ray.put(uniq)

    def derive(t: pa.Table) -> pa.Table:
        import pandas as pd
        keys = ray.get(uniq_ref)
        qn = pc.cast(t.column("query"), pa.binary()) \
            .to_numpy(zero_copy_only=False)
        ts = pd.Series(t.column("target").to_numpy(zero_copy_only=False),
                       dtype=object).astype(str)
        tdoc = ts.str.replace(r"#.*$", "", regex=True)
        has_chunk = ts.str.contains("#")
        chunk_idx = np.where(has_chunk,
                             ts.str.replace(r"^.*#|/.*$", "", regex=True)
                               .replace("", "0"), "0").astype(np.int64)
        n_chunks = np.where(has_chunk,
                            ts.str.replace(r"^.*/", "", regex=True)
                              .replace("", "1"), "1").astype(np.int64)
        probes = np.asarray(qn, dtype="S")
        w = max(keys.dtype.itemsize, probes.dtype.itemsize, 1)
        qidx = np.searchsorted(keys.astype(f"S{w}"),
                               probes.astype(f"S{w}")).astype(np.int64)
        n = t.num_rows
        return pa.table({
            "query": t.column("query"), "qLen": t.column("q_ntok"),
            "qKmers": t.column("q_kept"), "FPR": t.column("fpr"),
            "hits": t.column("hits"),
            "target_doc": pa.array(tdoc.to_numpy(dtype=object),
                                   pa.string()),
            "chunkIdx": pa.array(chunk_idx, pa.int64()),
            "chunks": pa.array(n_chunks, pa.int64()),
            "tLen": t.column("t_ntok"),
            "kSize": pa.array(np.full(n, cfg.shingle_k, np.int64)),
            "mKmers": t.column("m_shared"), "qCov": t.column("qcov"),
            "tCov": t.column("tcov"), "jacc": t.column("jacc"),
            "queryIdx": pa.array(qidx, pa.int64())})

    cols = ["query", "qLen", "qKmers", "FPR", "hits", "target_doc",
            "chunkIdx", "chunks", "tLen", "kSize", "mKmers", "qCov",
            "tCov", "jacc", "queryIdx"]
    out_ds = hits_ds.map_batches(derive, batch_format="pyarrow",
                                 zero_copy_batch=True) \
        .sort(["queryIdx", "target_doc", "chunkIdx"])
    rows = 0
    with open(path, "w") as f:
        f.write("\t".join(["query", "qLen", "qKmers", "FPR", "hits",
                           "target", "chunkIdx", "chunks", "tLen",
                           "kSize", "mKmers", "qCov", "tCov", "jacc",
                           "queryIdx"]) + "\n")
        for b in out_ds.iter_batches(batch_size=65536,
                                     batch_format="pandas"):
            rows += len(b)
            b[cols].to_csv(f, sep="\t", header=False, index=False,
                           float_format="%.4f")
        f.write(f"# input queries: {total_queries}\n")
        f.write(f"# matched queries: {matched}\n")
        pct = 100.0 * matched / max(total_queries, 1)
        f.write(f"# matched percentage: {pct:.4f}%\n")
    return {"rows": rows, "matched": int(matched),
            "total": int(total_queries)}
