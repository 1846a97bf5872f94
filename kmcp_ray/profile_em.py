"""The kmcp ``profile`` funnel, stages 1-4 — per-target candidate
filtering, pairwise co-occurrence ambiguity correction and EM abundance
estimation — over a search-match table.

Reference semantics (re-derived, /root/reference/kmcp/cmd/profile.go):

  stage 1 (760-1115)  per-query grouping → per-target match counts
      (fractional 1/len(ms) credit across a target's chunks), unique-
      match counts, high-confidence unique counts (qcov >= hic_qcov),
      qcov distribution; candidate filters minReads / minUReads /
      minHicUreads / minFragsProp (1013-1095).
  stage 2 (1118-1279) pairwise target co-occurrence counts over queries
      matching >= 2 candidates.
  stage 3 (1282-1904) recount with the MegaPath-style pair-deletion
      rule (1357-1387): for candidates i, j of one query (i stronger),
      delete j when  sum_match_i * (1 - min_dreads_prop) >= cooc(i,j)
      and  sum_uniq_j < sum_uniq_i * max_mismatch_err;
      surviving multi-target queries split credit equally.
  stage 4 (1859-2570) EM: M-step coverage = sum(qlen)/ref_size
      (norm_abund mean/min/max, 2484-2509); E-step redistributes each
      multi-target query by coverage share prop = cov_h / sum cov
      (2075-2117); converge when the top target's percentage changes
      < abund_pct_threshold (2551-2562); low-abundance tail filter
      (2816-2853).

Ray-Data-first shape: matches are hash-partitioned by query through the
packed exchange ONCE and pinned (kmcp re-reads its TSV once per stage /
EM iteration; we re-scan the object store instead).  Every stage is a
``map_batches`` kernel over whole partitions (packed rows are never
split mid-query), emitting pre-aggregated "melted" per-target partials
(target, kind, key, val) that one small ``groupby().sum()`` reduces.
Per-target state (the kmcp driver hash maps, T5) stays a small numpy
table broadcast with ``ray.put`` — same memory model as the reference,
which holds all candidate targets in RAM.

Deviations from the reference, frozen for the oracle contract
(tests/oracle_profile.py):
- "first match" per (query, target) is the max-qcov chunk row (the
  reference takes file order, which its search stage emits qcov-sorted);
- stage-3 candidate ordering breaks qcov ties by target id (the
  reference's sort is unstable);
- qcov quantiles use a fixed 1024-bin histogram (the reference uses an
  approximate streaming quantiler).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import ray

from kmcp_ray.exchange import Exchange, hash_part_fn

_NBINS = 1024

# melted partial kinds
K_MATCH, K_UNIQ, K_HIC, K_HIST_ALL, K_QLEN, K_HIST_UNIQ = 0, 1, 2, 3, 4, 5


@dataclass(frozen=True)
class ProfileParams:
    """kmcp profile knobs (mode-0 defaults; reference profile.go:241-313,
    3104-3154)."""
    min_qcov: float = 0.55
    min_reads: float = 1.0
    min_uniq_reads: float = 1.0
    min_hic_ureads: float = 1.0
    hic_qcov: float = 0.7
    min_frags_prop: float = 0.2
    min_dreads_prop: float = 0.05
    max_mismatch_err: float = 0.05
    #: stage-3 rel-depth uniformity gate (A7, profile.go:1832-1857):
    #: drop targets whose per-chunk relative depth (qlen_i / total * n)
    #: has population stddev above this (kmcp -D default 2.0; inert for
    #: single-chunk targets, whose stddev is 0)
    max_frags_depth_stdev: float = 2.0
    max_iters: int = 10
    abund_pct_threshold: float = 0.01
    norm_abund: str = "mean"          # mean | min | max
    low_abc_pct: float = 0.0          # -F/--filter-low-pct
    no_amb_corr: bool = False


# ------------------------------------------------------------ partitioning

_MATCH_SCHEMA = [("query", pa.string()), ("target", pa.string()),
                 ("qcov", pa.float64()), ("qlen", pa.int64()),
                 ("gsize", pa.int64()), ("chunk", pa.int32()),
                 ("nchunk", pa.int32())]


def partition_matches(matches_ds, P: int, *, query_col="query",
                      target_col="target", qcov_col="qcov",
                      qlen_col="q_kept", gsize_col="t_kept",
                      chunk_col=None, nchunk_col=None, min_qcov=0.0):
    """matches → one packed row per query-hash partition, pinned.

    Without chunk columns every target is a single chunk (chunk 0 of 1).
    """
    import pyarrow.compute as pc
    ex = Exchange(_MATCH_SCHEMA, P)

    def norm(batch: pa.Table) -> pa.Table:
        if min_qcov > 0:
            batch = batch.filter(pc.greater_equal(batch[qcov_col],
                                                  pa.scalar(min_qcov)))
        n = batch.num_rows
        one = pa.array(np.ones(n, np.int32), pa.int32())
        zero = pa.array(np.zeros(n, np.int32), pa.int32())
        return pa.table({
            "query": batch.column(query_col).cast(pa.string()),
            "target": batch.column(target_col).cast(pa.string()),
            "qcov": batch.column(qcov_col).cast(pa.float64()),
            "qlen": batch.column(qlen_col).cast(pa.int64()),
            "gsize": batch.column(gsize_col).cast(pa.int64()),
            "chunk": batch.column(chunk_col).cast(pa.int32())
            if chunk_col else zero,
            "nchunk": batch.column(nchunk_col).cast(pa.int32())
            if nchunk_col else one,
        })

    packed = matches_ds.map_batches(norm, batch_format="pyarrow",
                                    zero_copy_batch=True) \
        .map_batches(ex.make_pack_fn(hash_part_fn("query", P=P)),
                     batch_format="pyarrow", zero_copy_batch=True)

    def repack(group: pa.Table) -> pa.Table:
        """All of one partition's packs → ONE packed row (atomic unit:
        a query's matches can never be split across stage batches)."""
        u = ex.unpack(group)
        m = len(u["query"])
        off = pa.array(np.array([0, m], np.int32), pa.int32())
        cols = {"part": group.column("part").slice(0, 1)}
        for name, _typ in _MATCH_SCHEMA:
            arr = u[name]
            cols[name] = pa.ListArray.from_arrays(off, arr)
        return pa.table(cols)

    return packed.groupby("part").map_groups(
        repack, batch_format="pyarrow").materialize()


def _flat(batch: pa.Table, names):
    out = []
    for name in names:
        col = batch.column(name)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        out.append(col.flatten().to_numpy(zero_copy_only=False))
    return out


def _segments(sorted_keys):
    """Boundaries of equal-key runs over one or more aligned sorted
    arrays → (first_mask, seg_id)."""
    n = len(sorted_keys[0])
    first = np.zeros(n, dtype=bool)
    if n:
        first[0] = True
        for k in sorted_keys:
            first[1:] |= k[1:] != k[:-1]
    return first, np.cumsum(first) - 1


def _melt(targets: np.ndarray, kinds: np.ndarray, keys: np.ndarray,
          vals: np.ndarray) -> pa.Table:
    """Pre-aggregate melted partials within the kernel (map-side
    combine): sum val over (target, kind, key)."""
    if len(targets) == 0:
        return pa.table({"target": pa.array([], pa.string()),
                         "kind": pa.array([], pa.int8()),
                         "key": pa.array([], pa.int32()),
                         "val": pa.array([], pa.float64())})
    t_uniq, t_inv = np.unique(targets, return_inverse=True)
    code = (t_inv.astype(np.int64) * (_NBINS * 8)
            + kinds.astype(np.int64) * _NBINS + keys.astype(np.int64))
    c_uniq, c_inv = np.unique(code, return_inverse=True)
    sums = np.bincount(c_inv, weights=vals, minlength=len(c_uniq))
    out_t = t_uniq[(c_uniq // (_NBINS * 8)).astype(np.int64)]
    out_kind = ((c_uniq // _NBINS) % 8).astype(np.int8)
    out_key = (c_uniq % _NBINS).astype(np.int32)
    return pa.table({"target": pa.array(out_t, pa.string()),
                     "kind": pa.array(out_kind, pa.int8()),
                     "key": pa.array(out_key, pa.int32()),
                     "val": pa.array(sums, pa.float64())})


def _reduce_melted(ds) -> "tuple":
    """melted partials → driver-side {(target, kind, key): val} pivot
    (small: candidates x chunks/bins)."""
    from ray.data.aggregate import Sum
    agg = ds.groupby(["target", "kind", "key"]).aggregate(
        Sum("val", alias_name="v"))
    df = agg.to_pandas()
    return (df["target"].to_numpy(), df["kind"].to_numpy(),
            df["key"].to_numpy(), df["v"].to_numpy())


def _qbin(qcov: np.ndarray) -> np.ndarray:
    return np.minimum((qcov * _NBINS).astype(np.int64), _NBINS - 1)


def _hist_p90(bins: np.ndarray, counts: np.ndarray) -> float:
    """90th percentile from a histogram (bin midpoint convention):
    smallest bin with cumulative count >= 0.9 * total."""
    if counts.sum() <= 0:
        return 0.0
    order = np.argsort(bins)
    b, c = bins[order], counts[order]
    cum = np.cumsum(c)
    idx = np.searchsorted(cum, 0.9 * cum[-1], side="left")
    return (float(b[min(idx, len(b) - 1)]) + 0.5) / _NBINS


# ------------------------------------------------------------ stage kernels

def _prep_partition(batch: pa.Table):
    """Flatten packed rows and sort by (query, target, chunk); returns
    the sorted flat arrays plus (q,t)-segment and q-segment structure."""
    q, t, qcov, qlen, gsize, chunk, nchunk = _flat(
        batch, ["query", "target", "qcov", "qlen", "gsize", "chunk",
                "nchunk"])
    order = np.lexsort((chunk, t, q))
    q, t = q[order], t[order]
    qcov, qlen = qcov[order], qlen[order]
    gsize, chunk, nchunk = gsize[order], chunk[order], nchunk[order]
    qt_first, qt_seg = _segments([q, t])
    q_first, q_seg = _segments([q])
    return dict(q=q, t=t, qcov=qcov, qlen=qlen, gsize=gsize, chunk=chunk,
                nchunk=nchunk, qt_first=qt_first, qt_seg=qt_seg,
                q_first=q_first, q_seg=q_seg)


def _per_qt(p):
    """Per-(query,target) reductions: ms_size, best qcov, n_targets of
    the owning query."""
    n = len(p["q"])
    if n == 0:
        z = np.empty(0, np.int64)
        return z, np.empty(0, np.float64), z
    starts = np.nonzero(p["qt_first"])[0]
    ms_size = np.diff(np.concatenate((starts, [n])))
    best_qcov = np.maximum.reduceat(p["qcov"], starts)
    # number of distinct targets per query = count of qt_first per q_seg
    qt_q_seg = p["q_seg"][starts]
    n_targets_per_q = np.bincount(qt_q_seg,
                                  minlength=int(p["q_seg"][-1]) + 1)
    n_targets = n_targets_per_q[qt_q_seg]
    return ms_size, best_qcov, n_targets


def make_stage1_kernel(params: ProfileParams):
    def kernel(batch: pa.Table) -> pa.Table:
        p = _prep_partition(batch)
        n = len(p["q"])
        if n == 0:
            return _melt(*(np.empty(0, object), np.empty(0, np.int8),
                           np.empty(0, np.int32), np.empty(0)))
        ms_size, best_qcov, n_targets = _per_qt(p)
        starts = np.nonzero(p["qt_first"])[0]
        row_ms = np.repeat(ms_size, ms_size).astype(np.float64)

        ts, ks, keys, vals = [], [], [], []
        # match credit: 1/ms_size per chunk row (profile.go:864-867)
        ts.append(p["t"]); ks.append(np.full(n, K_MATCH, np.int8))
        keys.append(p["chunk"].astype(np.int32)); vals.append(1.0 / row_ms)
        # per-(q,t) firsts: uniq / hic / qcov histogram
        ft, fq = p["t"][starts], best_qcov
        uniq = n_targets == 1
        ts.append(ft[uniq]); ks.append(np.full(int(uniq.sum()), K_UNIQ, np.int8))
        keys.append(np.zeros(int(uniq.sum()), np.int32))
        vals.append(np.ones(int(uniq.sum())))
        hic = uniq & (fq >= params.hic_qcov)
        ts.append(ft[hic]); ks.append(np.full(int(hic.sum()), K_HIC, np.int8))
        keys.append(np.zeros(int(hic.sum()), np.int32))
        vals.append(np.ones(int(hic.sum())))
        ts.append(ft); ks.append(np.full(len(ft), K_HIST_ALL, np.int8))
        keys.append(_qbin(fq).astype(np.int32)); vals.append(np.ones(len(ft)))
        return _melt(np.concatenate(ts), np.concatenate(ks),
                     np.concatenate(keys), np.concatenate(vals))
    return kernel


def make_cooc_kernel(cand_ref):
    """Pairwise candidate co-occurrence per query (profile.go:1163-1191);
    pairs are target-sorted so (a, b) is canonical."""
    def kernel(batch: pa.Table) -> pa.Table:
        keys_tbl = ray.get(cand_ref)
        p = _prep_partition(batch)
        n = len(p["q"])
        empty = pa.table({"id_a": pa.array([], pa.string()),
                          "id_b": pa.array([], pa.string())})
        if n == 0:
            return empty
        starts = np.nonzero(p["qt_first"])[0]
        ft = p["t"][starts]
        is_cand = _probe_member(keys_tbl, ft)
        qt_q_seg = p["q_seg"][starts]
        # count candidate targets per query
        ncand = np.bincount(qt_q_seg[is_cand],
                            minlength=int(p["q_seg"][-1]) + 1)
        keep = is_cand & (ncand[qt_q_seg] >= 2)
        if not keep.any():
            return empty
        kt = ft[keep]                      # already target-sorted within q
        kq = qt_q_seg[keep]
        from kmcp_ray.buckets import _pairs_within_segments
        first, _seg = _segments([kq])
        s = np.nonzero(first)[0]
        e = np.concatenate((s[1:], [len(kq)]))
        i, j = _pairs_within_segments(s, e)
        return pa.table({"id_a": pa.array(kt[i], pa.string()),
                         "id_b": pa.array(kt[j], pa.string())})
    return kernel


def make_stage3_kernel(params: ProfileParams, state_ref):
    """Recount with ambiguous-pair deletion + equal redistribution
    (profile.go:1340-1470)."""
    def kernel(batch: pa.Table) -> pa.Table:
        keys_tbl, sum_match, sum_uniq, cooc_keys, cooc_vals = ray.get(state_ref)
        p = _prep_partition(batch)
        n = len(p["q"])
        if n == 0:
            return _melt(np.empty(0, object), np.empty(0, np.int8),
                         np.empty(0, np.int32), np.empty(0))
        ms_size, best_qcov, _nt = _per_qt(p)
        starts = np.nonzero(p["qt_first"])[0]
        ends = np.concatenate((starts[1:], [n]))
        ft = p["t"][starts]
        cand_idx = _probe_index(keys_tbl, ft)          # -1 = not candidate
        is_cand = cand_idx >= 0
        qt_q_seg = p["q_seg"][starts]

        ts, ks, keys, vals = [], [], [], []

        def emit(rows_mask_qt, prop_per_qt):
            """credit the chunk rows of selected (q,t) groups with
            prop/ms_size (match) and qlen*prop/ms_size (qlen)."""
            sel = np.nonzero(rows_mask_qt)[0]
            if len(sel) == 0:
                return
            row_idx = np.concatenate(
                [np.arange(starts[i], ends[i]) for i in sel])
            prop_rows = np.repeat(prop_per_qt[sel] / ms_size[sel],
                                  ms_size[sel])
            tt = p["t"][row_idx]
            cc = p["chunk"][row_idx].astype(np.int32)
            ts.append(tt); ks.append(np.full(len(tt), K_MATCH, np.int8))
            keys.append(cc); vals.append(prop_rows)
            ts.append(tt); ks.append(np.full(len(tt), K_QLEN, np.int8))
            keys.append(cc)
            vals.append(p["qlen"][row_idx].astype(np.float64) * prop_rows)

        # group (q,t) firsts by query, keep candidates only
        nq = int(p["q_seg"][-1]) + 1
        ncand = np.bincount(qt_q_seg[is_cand], minlength=nq)
        # single-candidate queries: full unique credit (vectorized)
        single = is_cand & (ncand[qt_q_seg] == 1)
        prop = np.zeros(len(starts))
        prop[single] = 1.0
        emit(single, prop)
        st = ft[single]
        ts.append(st); ks.append(np.full(len(st), K_UNIQ, np.int8))
        keys.append(np.zeros(len(st), np.int32)); vals.append(np.ones(len(st)))
        hic = single & (best_qcov >= params.hic_qcov)
        ht = ft[hic]
        ts.append(ht); ks.append(np.full(len(ht), K_HIC, np.int8))
        keys.append(np.zeros(len(ht), np.int32)); vals.append(np.ones(len(ht)))
        ts.append(st); ks.append(np.full(len(st), K_HIST_UNIQ, np.int8))
        keys.append(_qbin(best_qcov[single]).astype(np.int32))
        vals.append(np.ones(len(st)))
        allc = is_cand
        ts.append(ft[allc]); ks.append(np.full(int(allc.sum()), K_HIST_ALL, np.int8))
        keys.append(_qbin(best_qcov[allc]).astype(np.int32))
        vals.append(np.ones(int(allc.sum())))

        # ambiguous queries: pair-deletion rule then equal split
        multi_q = np.nonzero(np.bincount(qt_q_seg[is_cand], minlength=nq) >= 2)[0]
        if len(multi_q):
            qt_by_q_start = np.searchsorted(qt_q_seg, multi_q, side="left")
            qt_by_q_end = np.searchsorted(qt_q_seg, multi_q, side="right")
            mask2 = np.zeros(len(starts), dtype=bool)
            prop2 = np.zeros(len(starts))
            for s0, e0 in zip(qt_by_q_start, qt_by_q_end):
                sel = np.arange(s0, e0)[is_cand[s0:e0]]
                # order by (-qcov, target): reference sorts qcov desc
                order = np.lexsort((ft[sel], -best_qcov[sel]))
                sel = sel[order]
                ci = cand_idx[sel]
                alive = np.ones(len(sel), dtype=bool)
                if not params.no_amb_corr:
                    for a in range(len(sel) - 1):
                        if not alive[a]:
                            continue
                        for b in range(a + 1, len(sel)):
                            if not alive[b]:
                                continue
                            ia, ib = ci[a], ci[b]
                            shared = _cooc_get(cooc_keys, cooc_vals, ia, ib)
                            if (sum_match[ia] * (1 - params.min_dreads_prop)
                                    >= shared and sum_uniq[ib]
                                    < sum_uniq[ia] * params.max_mismatch_err):
                                alive[b] = False
                            elif (sum_match[ib] * (1 - params.min_dreads_prop)
                                    >= shared and sum_uniq[ia]
                                    < sum_uniq[ib] * params.max_mismatch_err):
                                alive[a] = False
                                break
                surv = sel[alive]
                if len(surv) == 1:
                    mask2[surv] = True
                    prop2[surv] = 1.0
                    # late unique credit (reference stage-3 uniqMatch path)
                    tt = ft[surv]
                    ts.append(tt)
                    ks.append(np.full(1, K_UNIQ, np.int8))
                    keys.append(np.zeros(1, np.int32)); vals.append(np.ones(1))
                    if best_qcov[surv[0]] >= params.hic_qcov:
                        ts.append(tt)
                        ks.append(np.full(1, K_HIC, np.int8))
                        keys.append(np.zeros(1, np.int32))
                        vals.append(np.ones(1))
                    ts.append(tt)
                    ks.append(np.full(1, K_HIST_UNIQ, np.int8))
                    keys.append(_qbin(best_qcov[surv]).astype(np.int32))
                    vals.append(np.ones(1))
                elif len(surv) > 1:
                    mask2[surv] = True
                    prop2[surv] = 1.0 / len(surv)
            emit(mask2, prop2)

        return _melt(np.concatenate(ts) if ts else np.empty(0, object),
                     np.concatenate(ks) if ks else np.empty(0, np.int8),
                     np.concatenate(keys) if keys else np.empty(0, np.int32),
                     np.concatenate(vals) if vals else np.empty(0))
    return kernel


def make_em_kernel(state_ref):
    """One E-step pass: redistribute multi-target queries by coverage
    share (profile.go:2075-2117); single-target queries keep full
    credit."""
    def kernel(batch: pa.Table) -> pa.Table:
        keys_tbl, coverage = ray.get(state_ref)
        p = _prep_partition(batch)
        n = len(p["q"])
        if n == 0:
            return _melt(np.empty(0, object), np.empty(0, np.int8),
                         np.empty(0, np.int32), np.empty(0))
        ms_size, best_qcov, _nt = _per_qt(p)
        starts = np.nonzero(p["qt_first"])[0]
        ends = np.concatenate((starts[1:], [n]))
        ft = p["t"][starts]
        widx = _probe_index(keys_tbl, ft)
        in_wl = widx >= 0
        qt_q_seg = p["q_seg"][starts]
        nq = int(p["q_seg"][-1]) + 1
        nwl = np.bincount(qt_q_seg[in_wl], minlength=nq)

        # prop per (q,t): 1 for single, cov share for multi — vectorized
        prop = np.zeros(len(starts))
        single = in_wl & (nwl[qt_q_seg] == 1)
        prop[single] = 1.0
        multi = in_wl & (nwl[qt_q_seg] >= 2)
        if multi.any():
            cov = np.zeros(len(starts))
            cov[multi] = coverage[widx[multi]]
            cov_sum_per_q = np.bincount(qt_q_seg[multi], weights=cov[multi],
                                        minlength=nq)
            denom = cov_sum_per_q[qt_q_seg[multi]]
            with np.errstate(invalid="ignore", divide="ignore"):
                share = np.where(denom > 0, cov[multi] / denom, 0.0)
            # all-zero-coverage groups fall back to equal split
            eq = denom <= 0
            if eq.any():
                cnt = nwl[qt_q_seg[multi]]
                share[eq] = 1.0 / cnt[eq]
            prop[multi] = share

        sel = np.nonzero(prop > 0)[0]
        row_idx = np.concatenate(
            [np.arange(starts[i], ends[i]) for i in sel]) \
            if len(sel) else np.empty(0, np.int64)
        prop_rows = np.repeat(prop[sel] / ms_size[sel], ms_size[sel]) \
            if len(sel) else np.empty(0)
        tt = p["t"][row_idx]
        cc = p["chunk"][row_idx].astype(np.int32)
        ts = [tt, tt]
        ks = [np.full(len(tt), K_MATCH, np.int8),
              np.full(len(tt), K_QLEN, np.int8)]
        keys = [cc, cc]
        vals = [prop_rows, p["qlen"][row_idx].astype(np.float64) * prop_rows]
        # uniq-query qcov stats drive the score (reference Stats)
        st = ft[single]
        ts.append(st); ks.append(np.full(len(st), K_HIST_UNIQ, np.int8))
        keys.append(_qbin(best_qcov[single]).astype(np.int32))
        vals.append(np.ones(len(st)))
        return _melt(np.concatenate(ts), np.concatenate(ks),
                     np.concatenate(keys), np.concatenate(vals))
    return kernel


# ----------------------------------------------------- broadcast-side probes

def _build_member(keys: np.ndarray):
    s = np.asarray(keys, dtype="S")
    return np.sort(s)


def _probe_member(table: np.ndarray, probes: np.ndarray) -> np.ndarray:
    if len(table) == 0:
        return np.zeros(len(probes), dtype=bool)
    p = np.asarray(probes, dtype="S")
    w = max(table.dtype.itemsize, p.dtype.itemsize, 1)
    t, p = table.astype(f"S{w}"), p.astype(f"S{w}")
    pos = np.searchsorted(t, p)
    pos_c = np.clip(pos, 0, len(t) - 1)
    return (pos < len(t)) & (t[pos_c] == p)


def _probe_index(table: np.ndarray, probes: np.ndarray) -> np.ndarray:
    """sorted S-table → index of each probe, -1 when absent."""
    if len(table) == 0:
        return np.full(len(probes), -1, dtype=np.int64)
    p = np.asarray(probes, dtype="S")
    w = max(table.dtype.itemsize, p.dtype.itemsize, 1)
    t, p = table.astype(f"S{w}"), p.astype(f"S{w}")
    pos = np.searchsorted(t, p)
    pos_c = np.clip(pos, 0, len(t) - 1)
    hit = (pos < len(t)) & (t[pos_c] == p)
    return np.where(hit, pos_c, -1)


def _cooc_get(cooc_keys: np.ndarray, cooc_vals: np.ndarray,
              ia: int, ib: int) -> float:
    a, b = (ia, ib) if ia < ib else (ib, ia)
    code = np.int64(a) << np.int64(20) | np.int64(b)
    pos = np.searchsorted(cooc_keys, code)
    if pos < len(cooc_keys) and cooc_keys[pos] == code:
        return float(cooc_vals[pos])
    return 0.0


# ----------------------------------------------------------------- driver

def _pivot(melted, cand_keys=None):
    """melted driver arrays → dict of per-target accumulators keyed by
    target string (numpy S)."""
    t, kind, key, val = melted
    t = np.asarray(t, dtype="S")
    out = {}
    for k in (K_MATCH, K_UNIQ, K_HIC, K_HIST_ALL, K_QLEN, K_HIST_UNIQ):
        m = kind == k
        out[k] = (t[m], key[m], val[m])
    return out


def _sum_by_target(keys_tbl, t, val):
    idx = _probe_index(keys_tbl, t)
    ok = idx >= 0
    return np.bincount(idx[ok], weights=val[ok], minlength=len(keys_tbl))


def _coverage(keys_tbl, piv, gsize_of, norm_abund: str):
    """M-step: per-target coverage from per-chunk qlen sums
    (profile.go:2484-2509)."""
    t, key, val = piv[K_QLEN]
    idx = _probe_index(keys_tbl, t)
    ok = idx >= 0
    idx, key, val = idx[ok], key[ok], val[ok]
    M = len(keys_tbl)
    qlens = np.bincount(idx, weights=val, minlength=M)
    if norm_abund == "mean":
        cov = qlens / np.maximum(gsize_of, 1.0)
    else:
        cov = np.zeros(M)
        code = idx * np.int64(_NBINS) + key
        order = np.argsort(code)
        code_s, val_s = code[order], val[order]
        first = np.concatenate(([True], code_s[1:] != code_s[:-1])) \
            if len(code_s) else np.empty(0, bool)
        chunk_sums = np.add.reduceat(val_s, np.nonzero(first)[0]) \
            if first.any() else np.empty(0)
        chunk_t = (code_s[first] // _NBINS).astype(np.int64)
        nchunks = np.bincount(chunk_t, minlength=M).astype(np.float64)
        for ti in range(M):
            vals_t = chunk_sums[chunk_t == ti]
            vals_t = vals_t[vals_t > 0]
            if len(vals_t) == 0:
                continue
            v = vals_t.min() if norm_abund == "min" else vals_t.max()
            cov[ti] = v * nchunks[ti] / max(gsize_of[ti], 1.0)
    return cov, qlens


def profile_funnel(matches_ds, params: ProfileParams = ProfileParams(), *,
                   num_partitions: int = 64, query_col="query",
                   target_col="target", qcov_col="qcov", qlen_col="q_kept",
                   gsize_col="t_kept", chunk_col=None, nchunk_col=None):
    """matches Dataset → per-target abundance profile Dataset with
    columns (target, percentage, coverage, score, chunks_frac, reads,
    ureads, hic_ureads, refsize), coverage-descending — the kmcp
    profile output analogue (reference profile.go:2872-2909)."""
    import ray.data
    parts = partition_matches(
        matches_ds, num_partitions, query_col=query_col,
        target_col=target_col, qcov_col=qcov_col, qlen_col=qlen_col,
        gsize_col=gsize_col, chunk_col=chunk_col, nchunk_col=nchunk_col,
        min_qcov=params.min_qcov)

    empty = pa.table({
        "target": pa.array([], pa.string()),
        "percentage": pa.array([], pa.float64()),
        "coverage": pa.array([], pa.float64()),
        "score": pa.array([], pa.float64()),
        "chunks_frac": pa.array([], pa.float64()),
        "reads": pa.array([], pa.float64()),
        "ureads": pa.array([], pa.float64()),
        "hic_ureads": pa.array([], pa.float64()),
        "refsize": pa.array([], pa.int64())})

    # ---- per-target reference metadata (gsize, nchunk) — small ----
    def meta_batch(batch: pa.Table) -> pa.Table:
        t, gsize, nchunk = _flat(batch, ["target", "gsize", "nchunk"])
        tu, ti = np.unique(t, return_index=True)
        return pa.table({"target": pa.array(tu, pa.string()),
                         "gsize": pa.array(gsize[ti], pa.int64()),
                         "nchunk": pa.array(nchunk[ti], pa.int32())})
    meta = parts.map_batches(meta_batch, batch_format="pyarrow") \
        .to_pandas().drop_duplicates("target")
    if len(meta) == 0:
        return ray.data.from_arrow(empty)
    meta_keys = np.asarray(meta["target"].to_numpy(), dtype="S")
    morder = np.argsort(meta_keys)
    meta_keys = meta_keys[morder]
    meta_gsize = meta["gsize"].to_numpy()[morder].astype(np.float64)
    meta_nchunk = meta["nchunk"].to_numpy()[morder].astype(np.float64)

    # ---- stage 1: counts + candidate filters ----
    s1 = _reduce_melted(parts.map_batches(make_stage1_kernel(params),
                                          batch_format="pyarrow"))
    piv1 = _pivot(s1)
    sum_match = _sum_by_target(meta_keys, *_drop_key(piv1[K_MATCH]))
    sum_uniq = _sum_by_target(meta_keys, *_drop_key(piv1[K_UNIQ]))
    sum_hic = _sum_by_target(meta_keys, *_drop_key(piv1[K_HIC]))
    # chunks fraction: chunks with any match / nchunk
    tM, keyM, valM = piv1[K_MATCH]
    idxM = _probe_index(meta_keys, tM)
    okM = (idxM >= 0) & (valM > 0)
    frag_codes = np.unique(idxM[okM] * np.int64(_NBINS) + keyM[okM])
    frags = np.bincount((frag_codes // _NBINS).astype(np.int64),
                        minlength=len(meta_keys)).astype(np.float64)
    frags_prop = frags / np.maximum(meta_nchunk, 1.0)

    cand_mask = ((sum_match >= params.min_reads)
                 & (sum_uniq >= params.min_uniq_reads)
                 & (sum_hic >= params.min_hic_ureads)
                 & (frags_prop >= params.min_frags_prop))
    cand_keys = meta_keys[cand_mask]
    if len(cand_keys) == 0:
        return ray.data.from_arrow(empty)
    cand_match = sum_match[cand_mask]
    cand_uniq = sum_uniq[cand_mask]

    # ---- stage 2: pairwise co-occurrence over candidates ----
    if params.no_amb_corr:
        cooc_keys = np.empty(0, np.int64)
        cooc_vals = np.empty(0, np.float64)
    else:
        cand_ref = ray.put(cand_keys)
        from kmcp_ray.exchange import count_pairs
        cooc = count_pairs(
            parts.map_batches(make_cooc_kernel(cand_ref),
                              batch_format="pyarrow"),
            num_partitions, "id_a", "id_b", count_name="n").to_pandas()
        if len(cooc) == 0:          # no ambiguous queries at all
            cooc = __import__("pandas").DataFrame(
                {"id_a": [], "id_b": [], "n": []})
        ia = _probe_index(cand_keys, np.asarray(cooc["id_a"].to_numpy(),
                                                dtype="S"))
        ib = _probe_index(cand_keys, np.asarray(cooc["id_b"].to_numpy(),
                                                dtype="S"))
        lo, hi = np.minimum(ia, ib), np.maximum(ia, ib)
        codes = lo.astype(np.int64) << np.int64(20) | hi.astype(np.int64)
        order = np.argsort(codes)
        cooc_keys = codes[order]
        cooc_vals = cooc["n"].to_numpy().astype(np.float64)[order]

    # ---- stage 3: recount with pair deletion ----
    state3 = ray.put((cand_keys, cand_match, cand_uniq,
                      cooc_keys, cooc_vals))
    s3 = _reduce_melted(parts.map_batches(make_stage3_kernel(params, state3),
                                          batch_format="pyarrow"))
    piv3 = _pivot(s3)
    m3 = _sum_by_target(cand_keys, *_drop_key(piv3[K_MATCH]))
    u3 = _sum_by_target(cand_keys, *_drop_key(piv3[K_UNIQ]))
    h3 = _sum_by_target(cand_keys, *_drop_key(piv3[K_HIC]))
    cand_gsize = meta_gsize[cand_mask]
    cand_nchunk = meta_nchunk[cand_mask]
    # stage-3 chunks fraction counts chunks with match >= min_reads
    # (profile.go:1807-1814; the stage-1 pass used match > 0)
    tM, keyM, valM = piv3[K_MATCH]
    idxM = _probe_index(cand_keys, tM)
    okM = (idxM >= 0) & (valM >= params.min_reads)
    fc = np.unique(idxM[okM] * np.int64(_NBINS) + keyM[okM])
    frags3 = np.bincount((fc // _NBINS).astype(np.int64),
                         minlength=len(cand_keys)).astype(np.float64)
    fp3 = frags3 / np.maximum(cand_nchunk, 1.0)
    # rel-depth uniformity (A7, profile.go:1832-1857): population std
    # of qlen_i / total * n over the FULL n-chunk vector (absent
    # chunks are zeros); Σrel == n ⇒ mean == 1 exactly
    tQ, keyQ, valQ = piv3[K_QLEN]
    idxQ = _probe_index(cand_keys, tQ)
    okQ = idxQ >= 0
    codeQ = idxQ[okQ] * np.int64(_NBINS) + keyQ[okQ]
    cu, cinv = np.unique(codeQ, return_inverse=True)
    chunk_sums = np.bincount(cinv, weights=valQ[okQ], minlength=len(cu))
    ct = (cu // _NBINS).astype(np.int64)
    M3 = len(cand_keys)
    totq = np.bincount(ct, weights=chunk_sums, minlength=M3)
    sumsq = np.bincount(ct, weights=chunk_sums ** 2, minlength=M3)
    nch = np.maximum(cand_nchunk, 1.0)
    with np.errstate(divide="ignore", invalid="ignore"):
        sum_rel_sq = np.where(totq > 0, (nch / totq) ** 2 * sumsq, 0.0)
        depth_var = np.where(totq > 0, sum_rel_sq / nch - 1.0, 0.0)
    depth_std = np.sqrt(np.maximum(depth_var, 0.0))
    wl_mask = ((m3 >= params.min_reads) & (u3 >= params.min_uniq_reads)
               & (h3 >= params.min_hic_ureads)
               & (fp3 >= params.min_frags_prop)
               & (depth_std <= params.max_frags_depth_stdev))
    wl_keys = cand_keys[wl_mask]
    if len(wl_keys) == 0:
        return ray.data.from_arrow(empty)
    wl_gsize = cand_gsize[wl_mask]
    cov, _ = _coverage(wl_keys, piv3, wl_gsize, params.norm_abund)

    # ---- stage 4: EM iterations ----
    hist_uniq = piv3[K_HIST_UNIQ]
    m_final, fp_final = m3[wl_mask], fp3[wl_mask]
    dom_pre = None
    for _it in range(max(1, params.max_iters)):
        total = cov.sum()
        pct = cov / total * 100.0 if total > 0 else np.zeros_like(cov)
        dom = float(pct.max()) if len(pct) else 0.0
        if dom_pre is not None and abs(dom - dom_pre) < params.abund_pct_threshold:
            break
        dom_pre = dom
        state_em = ray.put((wl_keys, cov))
        sE = _reduce_melted(parts.map_batches(make_em_kernel(state_em),
                                              batch_format="pyarrow"))
        pivE = _pivot(sE)
        cov, _ = _coverage(wl_keys, pivE, wl_gsize, params.norm_abund)
        hist_uniq = pivE[K_HIST_UNIQ]
        m_final = _sum_by_target(wl_keys, *_drop_key(pivE[K_MATCH]))

    total = cov.sum()
    pct = cov / total * 100.0 if total > 0 else np.zeros_like(cov)

    # ---- low-abundance tail filter (profile.go:2816-2853) ----
    keep = np.ones(len(wl_keys), dtype=bool)
    if params.low_abc_pct > 0 and len(wl_keys) > 1:
        order = np.argsort(-cov, kind="stable")
        acc = 0.0
        drop = []
        for i in order[::-1]:
            acc += pct[i]
            if acc > params.low_abc_pct:
                break
            drop.append(i)
        if drop:
            keep[np.array(drop)] = False
            total = cov[keep].sum()
            pct = np.where(keep, cov / max(total, 1e-300) * 100.0, 0.0)

    # ---- score: p90 of unique-query qcov (reference Stats p90 * 100) ----
    ht, hkey, hval = hist_uniq
    hidx = _probe_index(wl_keys, ht)
    score = np.zeros(len(wl_keys))
    for ti in range(len(wl_keys)):
        m = hidx == ti
        score[ti] = _hist_p90(hkey[m], hval[m]) * 100.0

    sel = np.nonzero(keep)[0]
    order = sel[np.argsort(-cov[sel], kind="stable")]
    out = pa.table({
        "target": pa.array(np.char.decode(wl_keys[order].astype("S"),
                                          "utf-8"), pa.string()),
        "percentage": pa.array(pct[order], pa.float64()),
        "coverage": pa.array(cov[order], pa.float64()),
        "score": pa.array(score[order], pa.float64()),
        "chunks_frac": pa.array(fp_final[order], pa.float64()),
        "reads": pa.array(m_final[order], pa.float64()),
        "ureads": pa.array(u3[wl_mask][order], pa.float64()),
        "hic_ureads": pa.array(h3[wl_mask][order], pa.float64()),
        "refsize": pa.array(wl_gsize[order].astype(np.int64), pa.int64()),
    })
    return ray.data.from_arrow(out)


def _drop_key(triple):
    t, _key, val = triple
    return t, val
