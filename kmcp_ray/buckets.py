"""Per-partition bucket processing: packed band rows → edges,
membership rows and candidate class pairs.

The whole LSH shuffle is ONE ``groupby("part")`` with this module's
verifier applied per partition (vectorized inside), instead of a
groupby over millions of tiny band keys — the same reason kmcp scores a
query against a whole index block in one bit-matrix pass instead of
probing chunks one by one (reference: kmcp/cmd/util-db-search.go:6613+).

Within a partition, entries (both streams, see bands.py) are sorted by
(kind, key, ident); every equal-(kind, key) segment is a bucket.
Everything pair-shaped happens at the **ident equivalence-class**
level — the ``image_id`` string exists only on designated entries:

- designated entries emit, per (bucket, ident) group: star edges from
  the minimum id to every other member (via exact/minhash/phash,
  score 1.0) and one ``member_sk`` / ``member_ph`` row per entry — the
  (ident → id) membership table downstream expansion joins against.
- ``phash`` buckets verify Hamming(ident_a, ident_b) ≤ radius in place
  between DISTINCT pHash classes and emit ``phashc`` class pairs, only
  in the pair's first agreeing chunk's bucket (globally unique without
  a dedup pass).
- ``minhash`` / ``contain`` buckets emit ``cand`` class pairs between
  distinct sketch folds; sketches do NOT travel through the band
  shuffle — class pairs are globally deduplicated, expanded to member
  pairs, and verified against re-derived sketches (pipeline.edges_stage),
  the way kmcp routes queries to the index that holds the sketches
  instead of shipping sketches with every query.

Skew (the kmcp block-size-threshold analogue, index.go:213-259):
- containment buckets larger than ``max_shingle_df`` are dominated by a
  high-document-frequency shingle with no dedup signal → no pairs (the
  identical-sketch linkage lives on the designated-bucket stars);
- any bucket larger than ``max_bucket`` pairs at most ``max_bucket``
  ident classes (ident-ascending — the deterministic truncation
  contract); overflow is counted and logged.
"""

from __future__ import annotations

import logging

import numpy as np
import pyarrow as pa

from kmcp_ray import imagecodec
from kmcp_ray.bands import KIND_CONTAIN, KIND_EXACT, KIND_MINHASH, KIND_PHASH
from kmcp_ray.config import DedupConfig

logger = logging.getLogger(__name__)

EDGE_SCHEMA = pa.schema([
    ("id_a", pa.string()),
    ("id_b", pa.string()),
    ("via", pa.string()),
    ("score", pa.float64()),
])

#: verifier output: final star edges ride (id_a, id_b); class-level rows
#: (cand / phashc) and membership rows (member_sk / member_ph) ride the
#: u64 ident columns with null ids — pipeline.edges_stage splits on via
RAW_COLS = ("id_a", "id_b", "via", "score", "ident_a", "ident_b")

_VIA_OF_KIND = {KIND_MINHASH: "minhash", KIND_CONTAIN: "contain",
                KIND_PHASH: "phash", KIND_EXACT: "exact"}


def empty_edges() -> pa.Table:
    return pa.table({"id_a": pa.array([], pa.string()),
                     "id_b": pa.array([], pa.string()),
                     "via": pa.array([], pa.string()),
                     "score": pa.array([], pa.float64())})


#: int8 row classifier carried NEXT TO the ``via`` string (r5): the
#: driver extraction pass classifies ~10M rows per 3.2M inputs, and an
#: int8 ``to_numpy`` + integer compare is ~5x cheaper than a string
#: ``index_in`` scan.  Codes 0-3 are the extraction-relevant kinds;
#: every star row is 4 (the extractor never distinguishes stars).
VIA_CAND, VIA_PHASHC, VIA_MEMBER_SK, VIA_MEMBER_PH, VIA_STAR = range(5)


def _empty_raw() -> pa.Table:
    return pa.table({"id_a": pa.array([], pa.string()),
                     "id_b": pa.array([], pa.string()),
                     "via": pa.array([], pa.string()),
                     "via_code": pa.array([], pa.int8()),
                     "score": pa.array([], pa.float64()),
                     "ident_a": pa.array([], pa.uint64()),
                     "ident_b": pa.array([], pa.uint64())})


def _raw_table(id_a, id_b, via, score, ident_a, ident_b,
               via_code) -> pa.Table:
    """Assemble one verifier sub-table; id/ident columns accept None
    for all-null.  ``via_code``: int scalar or int8 array (see
    VIA_* constants)."""
    n = len(via)
    code = np.full(n, via_code, np.int8) if np.isscalar(via_code) \
        else np.asarray(via_code, np.int8)
    return pa.table({
        "id_a": pa.array(id_a, pa.string()) if id_a is not None
        else pa.nulls(n, pa.string()),
        "id_b": pa.array(id_b, pa.string()) if id_b is not None
        else pa.nulls(n, pa.string()),
        "via": pa.array(via, pa.string()),
        "via_code": pa.array(code, pa.int8()),
        "score": pa.array(score, pa.float64()),
        "ident_a": pa.array(ident_a, pa.uint64()) if ident_a is not None
        else pa.array(np.zeros(n, np.uint64), pa.uint64()),
        "ident_b": pa.array(ident_b, pa.uint64()) if ident_b is not None
        else pa.array(np.zeros(n, np.uint64), pa.uint64()),
    })


def _pairs_within_segments(starts: np.ndarray, ends: np.ndarray):
    """Vectorized all-(i<j)-pairs generation inside [start, end) index
    segments.  Returns (first, second) position arrays.  No per-segment
    Python: the (row, countdown-reps) streams are built with the same
    repeat/cumsum trick the inner index already used."""
    starts = np.asarray(starts, dtype=np.int64)
    ends = np.asarray(ends, dtype=np.int64)
    lens1 = np.maximum(ends - starts - 1, 0)    # pair-emitting rows/segment
    total1 = int(lens1.sum())
    if total1 == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    from kmcp_ray.bands import _segment_gather
    row_pos = _segment_gather(starts, lens1)    # s..e-2 per segment, flat
    excl = np.concatenate(([0], np.cumsum(lens1)[:-1]))
    within_seg = np.arange(total1) - np.repeat(excl, lens1)
    reps = np.repeat(lens1, lens1) - within_seg  # e-1-s, e-2-s, ..., 1
    total = int(reps.sum())
    first = np.repeat(row_pos, reps)
    csum = np.cumsum(reps)
    within = np.arange(total) - np.repeat(csum - reps, reps)
    second = first + within + 1
    return first, second


def make_bucket_verifier(cfg: DedupConfig, fresh_gate: bool = False):
    """Factory for the per-partition bucket processor — fully vectorized
    (no per-edge Python): emits star edges + membership rows from the
    designated entry stream and deduplicated ident-class pairs (verified
    in place for pHash, ``cand`` for sketches) from both streams.

    ``fresh_gate=True`` (incremental mode, increment.py): packed rows
    carry a scalar ``fresh`` flag (0 = rows from a prior epoch, 1 = new
    rows); star and pair generation run ONLY in buckets containing ≥1
    fresh entry — stale buckets' edges are already in the prior epoch's
    edge checkpoint — while (ident → id) membership rows stay
    unconditional (a stale class can still be the partner of a pair
    formed in a fresh bucket, and expansion must find its members)."""

    def verify_partition(batch: pa.Table) -> pa.Table:
        from kmcp_ray.arrowutil import column, list_to_numpy
        from kmcp_ray.bands import bkey_kind

        keys1, off1 = list_to_numpy(column(batch, "bkey"), dtype=np.uint32)
        idn1, _ = list_to_numpy(column(batch, "ident"), dtype=np.uint64)
        keys2, off2 = list_to_numpy(column(batch, "dbkey"), dtype=np.uint32)
        idn2, _ = list_to_numpy(column(batch, "dident"), dtype=np.uint64)
        k1, k2 = bkey_kind(keys1), bkey_kind(keys2)
        ids2 = column(batch, "did").flatten().to_numpy(zero_copy_only=False)
        n1, n2 = len(k1), len(k2)
        m = n1 + n2
        if m == 0:
            return _empty_raw()

        if fresh_gate:
            fr = column(batch, "fresh").to_numpy(zero_copy_only=False) \
                .astype(bool)
            fresh1 = np.repeat(fr, off1[1:] - off1[:-1])
            fresh2 = np.repeat(fr, off2[1:] - off2[:-1])
        else:
            fresh1 = fresh2 = None

        out_tables = []

        # ---- membership rows: (ident → id), one per designated sk/ph
        # entry — the table downstream class→member expansion joins
        # against.  Emitted unconditionally (a singleton class's ident
        # can still appear in pairs formed in OTHER buckets). ---------
        is_sk2 = (k2 == KIND_MINHASH) | (k2 == KIND_CONTAIN)
        is_ph2 = k2 == KIND_PHASH
        for mask, via, vcode in ((is_sk2, "member_sk", VIA_MEMBER_SK),
                                 (is_ph2, "member_ph", VIA_MEMBER_PH)):
            if mask.any():
                nm = int(mask.sum())
                out_tables.append(_raw_table(
                    ids2[mask], None,
                    np.full(nm, via, dtype=object),
                    np.zeros(nm), idn2[mask], None, vcode))

        # unified entry view: id-free stream first, designated second.
        # bkey embeds the kind in its top 2 bits, so sorting by bkey IS
        # the (kind, key) order and a bkey change IS a bucket boundary.
        kinds = np.concatenate((k1, k2))
        keys = np.concatenate((keys1, keys2))
        ident = np.concatenate((idn1, idn2))

        order = np.lexsort((ident, keys))
        k_s, key_s, idn_s = kinds[order], keys[order], ident[order]
        seg_first = np.concatenate(([True], key_s[1:] != key_s[:-1]))
        seg_id = np.cumsum(seg_first) - 1
        seg_start = np.nonzero(seg_first)[0]
        seg_end = np.concatenate((seg_start[1:], [m]))
        seg_size = seg_end - seg_start
        seg_kind = k_s[seg_start]
        seg_of = np.empty(m, dtype=np.int64)
        seg_of[order] = seg_id

        if fresh_gate:
            fresh_s = np.concatenate((fresh1, fresh2))[order]
            # per-segment any(fresh): one add.reduceat over sorted entries
            seg_fresh = np.add.reduceat(
                fresh_s.astype(np.int64), seg_start) > 0
        else:
            seg_fresh = np.ones(len(seg_start), dtype=bool)

        # ---- stars: designated entries grouped by (bucket, ident) —
        # every member of an ident class designates the same bucket
        # (identical content ⇒ identical first band / chunk-0 / exact
        # key), so the whole class meets exactly here and nowhere else.
        # Root = lexicographic min id.  Exact buckets degenerate to
        # per-segment stars (equal exact_key ⇒ equal fold). ------------
        if n2 and fresh_gate:
            # stars only in fresh-touching buckets (stale classes'
            # stars are already checkpointed)
            keep2 = seg_fresh[seg_of[n1:]]
        if n2 and fresh_gate and not keep2.all():
            uids2, rank2 = np.unique(ids2[keep2], return_inverse=True)
            seg2 = seg_of[n1:][keep2]
            idn2g, k2g = idn2[keep2], k2[keep2]
        elif n2:
            uids2, rank2 = np.unique(ids2, return_inverse=True)
            seg2 = seg_of[n1:]
            idn2g, k2g = idn2, k2
        if n2 and len(seg2):
            ordg = np.lexsort((rank2, idn2g, seg2))
            g_seg, g_idn, g_rank = seg2[ordg], idn2g[ordg], rank2[ordg]
            g_first = np.concatenate(([True], (g_seg[1:] != g_seg[:-1])
                                      | (g_idn[1:] != g_idn[:-1])))
            grp = np.cumsum(g_first) - 1
            roots_per_grp = g_rank[g_first]
            members = ~g_first
            if members.any():
                r_rank = roots_per_grp[grp[members]]
                m_rank = g_rank[members]
                via_k = k2g[ordg][members]
                via = np.where(via_k == KIND_EXACT, "exact",
                               np.where(via_k == KIND_PHASH, "phash",
                                        "minhash")).astype(object)
                out_tables.append(_raw_table(
                    uids2[r_rank], uids2[m_rank], via,
                    np.ones(len(m_rank)), None, None, VIA_STAR))

        # ---- class pairs: one representative entry per (bucket, ident)
        # (entries are ident-sorted within segments, so reps are the
        # first-of-ident positions) --------------------------------------
        rep_first = seg_first | np.concatenate(([True],
                                                idn_s[1:] != idn_s[:-1]))
        pair_i, pair_j, pair_cls = [], [], []
        dropped = 0

        pairable = (seg_kind != KIND_EXACT) & seg_fresh & \
            ~((seg_kind == KIND_CONTAIN) & (seg_size > cfg.max_shingle_df))

        # normal buckets: all rep pairs (sizes gate on RAW entry counts —
        # the skew caps act on observed bucket load, not class counts)
        sel = pairable & (seg_size >= 2) & (seg_size <= cfg.max_bucket)
        if sel.any():
            rep_pos = np.nonzero(rep_first & np.repeat(sel, seg_size))[0]
            rep_seg = seg_id[rep_pos]
            rfirst = np.concatenate(([True], rep_seg[1:] != rep_seg[:-1]))
            rstart = np.nonzero(rfirst)[0]
            rend = np.concatenate((rstart[1:], [len(rep_pos)]))
            f, s2 = _pairs_within_segments(rstart, rend)
            pi, pj = rep_pos[f], rep_pos[s2]
            cls = np.where(k_s[pi] == KIND_PHASH, 0, 1).astype(np.int8)
            pair_i.append(pi); pair_j.append(pj)
            pair_cls.append(cls)

        # oversized buckets: at most max_bucket ident classes pair up,
        # ident-ascending (deterministic truncation; rare — loop fine)
        sel_over = pairable & (seg_size > cfg.max_bucket)
        for sidx in np.nonzero(sel_over)[0]:
            s, e = seg_start[sidx], seg_end[sidx]
            reps = np.nonzero(rep_first[s:e])[0] + s   # ident-ascending
            if len(reps) > cfg.max_bucket:
                dropped += len(reps) - cfg.max_bucket
                reps = reps[:cfg.max_bucket]
            if len(reps) >= 2:
                ii, jj = np.triu_indices(len(reps), k=1)
                pair_i.append(reps[ii]); pair_j.append(reps[jj])
                pair_cls.append(np.full(
                    len(ii), 0 if seg_kind[sidx] == KIND_PHASH else 1,
                    dtype=np.int8))

        if dropped:
            logger.warning("bucket cap overflow: %d ident classes dropped "
                           "in partition (max_bucket=%d)", dropped,
                           cfg.max_bucket)

        if pair_i:
            pi = np.concatenate(pair_i)
            pj = np.concatenate(pair_j)
            ccls = np.concatenate(pair_cls)        # int8: 0=ph, 1=sk
            ia, ib = idn_s[pi], idn_s[pj]
            swap = ia > ib
            ia2 = np.where(swap, ib, ia)
            ib2 = np.where(swap, ia, ib)

            # pHash class pairs: Hamming-verify in place; emit in the
            # pair's first agreeing chunk's bucket.  With full keys
            # that bucket is globally unique; under bkey truncation
            # (bands.py r4) a later agreeing chunk whose truncated key
            # + partition collide with the first's (~2^-30 per extra
            # chunk) can re-emit the pair — edges_from_raw dedups
            # phashc class pairs in both extraction arms, so edge
            # multiplicity is unaffected
            ph_mask = ccls == 0
            if ph_mask.any():
                from kmcp_ray.bands import KIND_PHASH as _KP, pack_bkey
                pa_i, pb_i = ia2[ph_mask], ib2[ph_mask]
                ham = np.asarray(imagecodec.hamming64(pa_i, pb_i))
                d0 = pack_bkey(
                    imagecodec.phash_first_agree_key(
                        pa_i, pb_i, cfg.phash_chunks),
                    np.full(int(ph_mask.sum()), _KP, np.int8))
                ok = (ham <= cfg.hamming_radius) & (key_s[pi[ph_mask]] == d0)
                if ok.any():
                    nph = int(ok.sum())
                    out_tables.append(_raw_table(
                        None, None, np.full(nph, "phashc", dtype=object),
                        1.0 - ham[ok] / 64.0, pa_i[ok], pb_i[ok],
                        VIA_PHASHC))

            # sketch class pairs: dedup within the partition (the same
            # class pair recurs across shared bands), verified later
            sk_mask = ccls == 1
            if sk_mask.any():
                sa, sb = ia2[sk_mask], ib2[sk_mask]
                osk = np.lexsort((sb, sa))
                sa, sb = sa[osk], sb[osk]
                first = np.concatenate(([True], (sa[1:] != sa[:-1])
                                        | (sb[1:] != sb[:-1])))
                sa, sb = sa[first], sb[first]
                out_tables.append(_raw_table(
                    None, None, np.full(len(sa), "cand", dtype=object),
                    np.zeros(len(sa)), sa, sb, VIA_CAND))

        if not out_tables:
            return _empty_raw()
        return pa.concat_tables(out_tables)

    return verify_partition


# ---------------------------------------------------- candidate verification

def _binary_u64(col) -> "tuple[np.ndarray, np.ndarray]":
    """Arrow binary column of LE-uint64 blobs → (flat uint64 values,
    int64 element offsets); nulls become empty rows.  Zero-copy reads
    of the Arrow buffers — no per-row frombuffer."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty(0, np.uint64), np.zeros(1, np.int64)
    bufs = col.buffers()
    if pa.types.is_large_binary(col.type):
        byte_off = np.frombuffer(bufs[1], dtype=np.int64, count=n + 1,
                                 offset=col.offset * 8).copy()
    else:
        byte_off = np.frombuffer(bufs[1], dtype=np.int32, count=n + 1,
                                 offset=col.offset * 4).astype(np.int64)
    data = np.frombuffer(bufs[2], dtype=np.uint8) if bufs[2] is not None \
        else np.empty(0, np.uint8)
    start, end = byte_off[0], byte_off[-1]
    vals = data[start:end]
    # element offsets relative to the slice, in uint64 units
    off = (byte_off - start) // 8
    if col.null_count:
        isnull = np.asarray(pa.compute.is_null(col).to_numpy(
            zero_copy_only=False))
        lens = np.diff(off)
        lens[isnull] = 0
        # rebuild a compacted value stream without null rows' bytes
        from kmcp_ray.bands import _segment_gather
        gather = _segment_gather(off[:-1] * 8, lens * 8)
        vals = vals[gather]
        off = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(lens, out=off[1:])
    return np.frombuffer(vals.tobytes(), dtype=np.uint64), off


def make_pair_verifier(cfg: DedupConfig):
    """map_batches verifier for joined candidate pairs
    (id_a, id_b, vsk_a, vsk_b): exact Jaccard / containment on the
    bottom-``verify_k`` sketches (kmcp qCov/jacc semantics,
    util-db-search.go:7466-7493 re-derived).

    Fully vectorized: both sides' (sorted-unique per row) sketch values
    are tagged with their pair index and sorted once; a value occurring
    twice within one pair is an intersection hit, so per-pair shared
    counts fall out of one bincount — no per-pair Python."""

    def verify_pairs(batch: pa.Table) -> pa.Table:
        from kmcp_ray.arrowutil import column
        a = column(batch, "id_a").to_numpy(zero_copy_only=False)
        b = column(batch, "id_b").to_numpy(zero_copy_only=False)
        va, off_a = _binary_u64(column(batch, "vsk_a"))
        vb, off_b = _binary_u64(column(batch, "vsk_b"))
        n = len(a)
        na = np.diff(off_a)
        nb = np.diff(off_b)
        pid = np.concatenate((np.repeat(np.arange(n), na),
                              np.repeat(np.arange(n), nb)))
        vals = np.concatenate((va, vb))
        order = np.lexsort((vals, pid))
        pid_s, vals_s = pid[order], vals[order]
        dup = np.zeros(len(pid_s), dtype=bool)
        if len(pid_s) > 1:
            dup[1:] = (pid_s[1:] == pid_s[:-1]) & (vals_s[1:] == vals_s[:-1])
        c = np.bincount(pid_s[dup], minlength=n).astype(np.float64)

        both = (na > 0) & (nb > 0)
        denom_j = np.maximum(na + nb - c, 1.0)
        jacc = np.where(both, c / denom_j, 0.0)
        small = np.minimum(na, nb)
        contain = np.where(both & (small > 0), c / np.maximum(small, 1), 0.0)

        is_mh = jacc >= cfg.jaccard_threshold
        is_ct = (~is_mh) & (small >= cfg.min_containment_shingles) \
            & (contain >= cfg.containment_threshold) & both
        keep = is_mh | is_ct
        via = np.where(is_mh, "minhash", "contain").astype(object)
        score = np.where(is_mh, jacc, contain)
        return pa.table({"id_a": pa.array(a[keep], pa.string()),
                         "id_b": pa.array(b[keep], pa.string()),
                         "via": pa.array(via[keep], pa.string()),
                         "score": pa.array(score[keep], pa.float64())})

    return verify_pairs


# --------------------------------------------------- payload-attach "join"

def attach_sketches(pairs_ds, sig_small_ds, cfg: DedupConfig):
    """(id_a, id_b) pairs + (image_id, vsk:binary) payload table →
    (id_a, id_b, vsk_a, vsk_b) via two packed union+groupby exchanges.

    A hand-rolled partitioned hash join on the packed-exchange
    primitive: ``Dataset.join`` in the pinned Ray release (2.49.2,
    re-confirmed broken 2026-08-18; re-test on upgrade) mis-handles
    empty partitions, and its aggregator actors deadlock when
    partitions exceed cluster CPUs — the packed groupby path is always
    safe and an order of magnitude cheaper per row.
    """
    from kmcp_ray.exchange import Exchange, hash_part_fn

    P = cfg.num_partitions
    ex = Exchange([("rt", pa.int8()), ("kid", pa.string()),
                   ("oid", pa.string()), ("carry", pa.binary()),
                   ("pl", pa.binary())], P)

    def tag_sig(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table({
            "rt": pa.array(np.zeros(n, np.int8), pa.int8()),
            "kid": batch.column("image_id"),
            "oid": pa.nulls(n, pa.string()),
            "carry": pa.nulls(n, pa.binary()),
            "pl": batch.column("vsk"),
        })

    def tag_pairs(side, other, carry_col):
        def fn(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            carry = batch.column(carry_col) if carry_col else \
                pa.nulls(n, pa.binary())
            return pa.table({
                "rt": pa.array(np.ones(n, np.int8), pa.int8()),
                "kid": batch.column(side),
                "oid": batch.column(other),
                "carry": carry,
                "pl": pa.nulls(n, pa.binary()),
            })
        return fn

    def attach_group(group: pa.Table) -> pa.Table:
        u = ex.unpack(group)
        rt = u["rt"].to_numpy(zero_copy_only=False)
        kid = u["kid"].to_numpy(zero_copy_only=False)
        pl = u["pl"].to_numpy(zero_copy_only=False)
        is_sig = rt == 0
        pair_idx = np.nonzero(~is_sig)[0]
        if len(pair_idx) == 0:
            return pa.table({"kid": pa.array([], pa.string()),
                             "oid": pa.array([], pa.string()),
                             "carry": pa.array([], pa.binary()),
                             "pl": pa.array([], pa.binary())})
        oid = u["oid"].to_numpy(zero_copy_only=False)
        carry = u["carry"].to_numpy(zero_copy_only=False)
        # vectorized probe: sorted sig keys + searchsorted (no per-row
        # Python dict of bytes payloads)
        sig_keys = np.asarray(kid[is_sig], dtype="S")
        order = np.argsort(sig_keys, kind="stable")
        keys_sorted = sig_keys[order]
        pl_sorted = pl[is_sig][order]
        probes = np.asarray(kid[pair_idx], dtype="S")
        if keys_sorted.dtype.itemsize and probes.dtype.itemsize:
            width = max(keys_sorted.dtype.itemsize, probes.dtype.itemsize)
            keys_sorted = keys_sorted.astype(f"S{width}")
            probes = probes.astype(f"S{width}")
        n = len(keys_sorted)
        if n:
            pos = np.searchsorted(keys_sorted, probes)
            pos_c = np.minimum(pos, n - 1)
            hit = (pos < n) & (keys_sorted[pos_c] == probes)
            attached = np.where(hit, pl_sorted[pos_c], None)
        else:
            attached = np.full(len(probes), None, dtype=object)
        return pa.table({
            "kid": pa.array(kid[pair_idx], pa.string()),
            "oid": pa.array(oid[pair_idx], pa.string()),
            "carry": pa.array(carry[pair_idx], pa.binary()),
            "pl": pa.array(attached, pa.binary()),
        })

    part_by_kid = hash_part_fn("kid", P=P)
    pack = ex.make_pack_fn(part_by_kid)

    # materialize: consumed by BOTH attach rounds — lazy would re-run
    # the full payload tag+pack (the dominant data volume) twice
    sig_tagged = sig_small_ds.map_batches(tag_sig, batch_format="pyarrow",
                                          zero_copy_batch=True) \
        .map_batches(pack, batch_format="pyarrow", zero_copy_batch=True) \
        .materialize()

    # round 1: attach side a
    p1 = pairs_ds.map_batches(tag_pairs("id_a", "id_b", None),
                              batch_format="pyarrow", zero_copy_batch=True) \
        .map_batches(pack, batch_format="pyarrow", zero_copy_batch=True)
    r1 = p1.union(sig_tagged).groupby("part").map_groups(
        attach_group, batch_format="pyarrow")
    # round 2: rows are (kid=id_a, oid=id_b, pl=vsk_a); re-key on id_b
    r1 = r1.map_batches(
        lambda t: pa.table({"id_b": t["oid"], "id_a": t["kid"],
                            "vsk_a": t["pl"]}),
        batch_format="pyarrow", zero_copy_batch=True)
    p2 = r1.map_batches(tag_pairs("id_b", "id_a", "vsk_a"),
                        batch_format="pyarrow", zero_copy_batch=True) \
        .map_batches(pack, batch_format="pyarrow", zero_copy_batch=True)
    r2 = p2.union(sig_tagged).groupby("part").map_groups(
        attach_group, batch_format="pyarrow")
    return r2.map_batches(
        lambda t: pa.table({"id_a": t["oid"], "id_b": t["kid"],
                            "vsk_a": t["carry"], "vsk_b": t["pl"]}),
        batch_format="pyarrow", zero_copy_batch=True)
