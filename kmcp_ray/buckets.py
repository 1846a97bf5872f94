"""Per-partition bucket processing: packed band rows → edges and
candidate pairs.

The whole LSH shuffle is ONE ``groupby("part")`` with this module's
verifier applied per partition (vectorized inside), instead of a
groupby over millions of tiny band keys — the same reason kmcp scores a
query against a whole index block in one bit-matrix pass instead of
probing chunks one by one (reference: kmcp/cmd/util-db-search.go:6613+).

Within a partition, rows are sorted by (kind, key); every equal-key
segment is a bucket:

- ``exact`` buckets emit star edges to the minimum id (no verification —
  key == content hash of caption+bytes).
- ``phash`` buckets verify Hamming(phash) ≤ radius in place (the phash
  travels with the band row) → via "phash".
- ``minhash`` / ``contain`` buckets emit **candidate pairs**
  (via "cand"); their sketches do NOT travel through the band shuffle —
  candidates are globally deduplicated and verified against the
  signature table in a separate hash join (pipeline.edges_stage), the
  way kmcp routes queries to the index that holds the sketches instead
  of shipping sketches with every query.

Skew (the kmcp block-size-threshold analogue, index.go:213-259):
- containment buckets larger than ``max_shingle_df`` are dominated by a
  high-document-frequency shingle with no dedup signal → identical-
  sketch star edges only;
- any bucket larger than ``max_bucket`` collapses to one representative
  per identical content (star edges) and at most max_bucket
  representatives pair up; overflow is counted and logged.
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

_VIA_OF_KIND = {KIND_MINHASH: "minhash", KIND_CONTAIN: "contain",
                KIND_PHASH: "phash", KIND_EXACT: "exact"}


def empty_edges() -> pa.Table:
    return pa.table({"id_a": pa.array([], pa.string()),
                     "id_b": pa.array([], pa.string()),
                     "via": pa.array([], pa.string()),
                     "score": pa.array([], pa.float64())})


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


def _stars_by_group(pos_sorted: np.ndarray, *group_keys):
    """Rows sorted so equal group-key runs are contiguous and id-ascending
    within runs → (root_pos, member_pos) star edges, vectorized.  Multiple
    key arrays are compared jointly (no combined-hash collisions)."""
    if len(pos_sorted) == 0:
        return pos_sorted, pos_sorted
    change = np.zeros(len(pos_sorted), dtype=bool)
    change[0] = True
    for gk in group_keys:
        change[1:] |= gk[1:] != gk[:-1]
    grp = np.cumsum(change) - 1
    roots = pos_sorted[change]
    members = ~change
    return roots[grp[members]], pos_sorted[members]


def make_bucket_verifier(cfg: DedupConfig):
    """Factory for the per-partition bucket processor — fully vectorized
    (no per-edge Python); emits deduplicated star edges, in-place phash
    verdicts and sk candidate pairs."""

    def verify_partition(batch: pa.Table) -> pa.Table:
        from kmcp_ray.arrowutil import column, list_to_numpy

        kinds, _ = list_to_numpy(column(batch, "kind"), dtype=np.int8)
        # high bit = designated star-emission site (bands.STAR_FLAG):
        # identical-content star edges are emitted only where the member
        # entry is flagged, so each (root, member) link exists once
        # globally instead of once per band/chunk
        star = kinds >= 8
        kinds = (kinds & 7).astype(np.int8)
        m = len(kinds)
        if m < 2:
            return empty_edges()
        keys, _ = list_to_numpy(column(batch, "key"), dtype=np.uint64)
        ids = column(batch, "image_id").flatten().to_numpy(zero_copy_only=False)
        # one u64 identity per entry: sketch fold for minhash/contain
        # entries, raw phash bits for phash entries (see bands.band_batch)
        ident, _ = list_to_numpy(column(batch, "ident"), dtype=np.uint64)

        # rank ids once so all later sorts are integer sorts; rank order
        # == lexicographic id order, so rank compares replace string
        # compares everywhere below
        uids, id_rank = np.unique(ids, return_inverse=True)
        n_ids = np.uint64(max(1, len(uids)))

        order = np.lexsort((id_rank, keys, kinds))
        k_s, key_s = kinds[order], keys[order]
        seg_first = np.concatenate(([True],
                                    (k_s[1:] != k_s[:-1]) | (key_s[1:] != key_s[:-1])))
        seg_id = np.cumsum(seg_first) - 1
        seg_start = np.nonzero(seg_first)[0]
        seg_end = np.concatenate((seg_start[1:], [m]))
        seg_size = seg_end - seg_start
        seg_kind = k_s[seg_start]

        star_roots, star_members, star_via = [], [], []   # arrays of positions
        pair_i, pair_j, pair_cls = [], [], []
        dropped = 0

        def seg_rows_mask(sel):
            """row mask (in sorted space) for selected segments."""
            return np.repeat(sel, seg_size)

        # ---- exact buckets: star to min id --------------------------------
        sel = (seg_kind == KIND_EXACT) & (seg_size >= 2)
        if sel.any():
            rows_mask = seg_rows_mask(sel)
            pos = np.arange(m)[rows_mask]
            r, mem = _stars_by_group(order[pos], seg_id[pos])
            star_roots.append(r); star_members.append(mem)
            star_via.append(np.full(len(mem), 0, dtype=np.int8))

        # ---- high-df containment buckets: identical-sketch stars only -----
        sel = (seg_kind == KIND_CONTAIN) & (seg_size > cfg.max_shingle_df)
        if sel.any():
            rows_mask = seg_rows_mask(sel)
            pos = np.nonzero(rows_mask)[0]
            rows = order[pos]
            sub = np.lexsort((id_rank[rows], ident[rows], seg_id[pos]))
            r, mem = _stars_by_group(rows[sub], seg_id[pos][sub],
                                     ident[rows][sub])
            smask = star[mem]
            r, mem = r[smask], mem[smask]
            star_roots.append(r); star_members.append(mem)
            star_via.append(np.full(len(mem), 1, dtype=np.int8))

        # ---- oversized buckets (salted): ident stars + capped rep pairs ---
        sel_over = (seg_size > cfg.max_bucket) &             ~((seg_kind == KIND_CONTAIN) & (seg_size > cfg.max_shingle_df)) &             (seg_kind != KIND_EXACT)
        for sidx in np.nonzero(sel_over)[0]:        # rare — python loop fine
            s, e = seg_start[sidx], seg_end[sidx]
            rows = order[s:e]                        # id-ascending
            kind = seg_kind[sidx]
            idn = ident[rows]
            sub = np.argsort(idn, kind="stable")
            r, mem = _stars_by_group(rows[sub], idn[sub])
            smask = star[mem]
            r, mem = r[smask], mem[smask]
            star_roots.append(r); star_members.append(mem)
            star_via.append(np.full(
                len(mem), 2 if kind == KIND_PHASH else 1, dtype=np.int8))
            first = np.concatenate(([True], idn[sub][1:] != idn[sub][:-1]))
            reps = rows[sub][first]
            reps = reps[np.argsort(id_rank[reps], kind="stable")]
            if len(reps) > cfg.max_bucket:
                dropped += len(reps) - cfg.max_bucket
                reps = reps[:cfg.max_bucket]
            if len(reps) >= 2:
                ii, jj = np.triu_indices(len(reps), k=1)
                pair_i.append(reps[ii]); pair_j.append(reps[jj])
                pair_cls.append(np.full(
                    len(ii), 0 if kind == KIND_PHASH else 1, dtype=np.int8))

        # ---- normal buckets: all pairs ------------------------------------
        sel = (seg_size >= 2) & (seg_size <= cfg.max_bucket) & \
            (seg_kind != KIND_EXACT) & \
            ~((seg_kind == KIND_CONTAIN) & (seg_size > cfg.max_shingle_df))
        if sel.any():
            f, s2 = _pairs_within_segments(seg_start[sel], seg_end[sel])
            rows_f, rows_s = order[f], order[s2]
            cls = np.where(k_s[f] == KIND_PHASH, 0, 1).astype(np.int8)
            pair_i.append(rows_f); pair_j.append(rows_s)
            pair_cls.append(cls)

        if dropped:
            logger.warning("bucket cap overflow: %d representatives dropped "
                           "in partition (max_bucket=%d)", dropped, cfg.max_bucket)

        # ---- assemble + dedup (integer ranks — no pandas object-dtype
        # hashtables: on this host the per-group allocation volume of
        # object-array factorize/drop_duplicates dominated wall time
        # through machine-serialized first-touch page faults) ----------
        VIA_NAMES = np.array(["exact", "minhash", "phash", "cand"],
                             dtype=object)
        out_tables = []
        if star_roots:
            r = np.concatenate(star_roots)
            mem = np.concatenate(star_members)
            viac = np.concatenate(star_via)
            ra, rb = id_rank[r], id_rank[mem]
            key = (viac.astype(np.uint64) * n_ids
                   + ra.astype(np.uint64)) * n_ids + rb.astype(np.uint64)
            _, ix = np.unique(key, return_index=True)
            out_tables.append(pa.table({
                "id_a": pa.array(uids[ra[ix]], pa.string()),
                "id_b": pa.array(uids[rb[ix]], pa.string()),
                "via": pa.array(VIA_NAMES[viac[ix]], pa.string()),
                "score": pa.array(np.ones(len(ix)), pa.float64())}))

        if pair_i:
            ci = np.concatenate(pair_i)
            cj = np.concatenate(pair_j)
            ccls = np.concatenate(pair_cls)        # int8: 0=ph, 1=sk
            ra, rb = id_rank[ci], id_rank[cj]
            swap = ra > rb
            ra2 = np.where(swap, rb, ra)
            rb2 = np.where(swap, ra, rb)
            keep = ra2 != rb2
            ra2, rb2, ccls = ra2[keep], rb2[keep], ccls[keep]
            ci, cj = ci[keep], cj[keep]
            # np.unique keeps the FIRST occurrence: order DESIGNATED
            # instances first so cross-bucket dedup inside this
            # partition never discards a designated-bucket instance in
            # favor of a non-designated one (the emit gates below depend
            # on it).  Designation: flagged-both (sk ident pairs, star
            # edges) or, for phash pairs, sitting in the first agreeing
            # chunk's bucket.
            pref = star[ci] & star[cj]
            ph_all = ccls == 0
            if ph_all.any():
                d0 = imagecodec.phash_first_agree_key(
                    ident[ci[ph_all]], ident[cj[ph_all]], cfg.phash_chunks)
                pref = pref.copy()
                pref[ph_all] = keys[ci[ph_all]] == d0
            if not pref.all():
                ordp = np.argsort(~pref, kind="stable")
                ra2, rb2, ccls = ra2[ordp], rb2[ordp], ccls[ordp]
                ci, cj = ci[ordp], cj[ordp]
                pref = pref[ordp]
            key = (ccls.astype(np.uint64) * n_ids
                   + ra2.astype(np.uint64)) * n_ids + rb2.astype(np.uint64)
            _, ix = np.unique(key, return_index=True)
            ra2, rb2, ccls = ra2[ix], rb2[ix], ccls[ix]
            ci, cj = ci[ix], cj[ix]
            pref = pref[ix]

            # every phash pair collides in one bucket per AGREEING chunk
            # (Hamming 0 pairs in all of them) — emit each verified pair
            # only in its DESIGNATED bucket, the first agreeing chunk's,
            # recomputed locally from the two full phashes riding as
            # idents: kills the cross-partition duplicate edge rows the
            # per-bucket emission produced (r3; generalizes the r2
            # STAR_FLAG rule, which this subsumes for Hamming 0)
            ph_mask = ccls == 0
            if ph_mask.any():
                ii, jj = ci[ph_mask], cj[ph_mask]
                ham = np.asarray(imagecodec.hamming64(ident[ii], ident[jj]))
                ok = (ham <= cfg.hamming_radius) & pref[ph_mask]
                out_tables.append(pa.table({
                    "id_a": pa.array(uids[ra2[ph_mask][ok]], pa.string()),
                    "id_b": pa.array(uids[rb2[ph_mask][ok]], pa.string()),
                    "via": pa.array(np.full(int(ok.sum()), "phash",
                                            dtype=object), pa.string()),
                    "score": pa.array(1.0 - ham[ok] / 64.0, pa.float64())}))

            sk_mask = ccls == 1
            if sk_mask.any():
                ii, jj = ci[sk_mask], cj[sk_mask]
                same = ident[ii] == ident[jj]
                emit = ~same | (star[ii] & star[jj])
                ii, jj, same = ii[emit], jj[emit], same[emit]
                via_c = np.where(same, np.int8(1), np.int8(3))
                out_tables.append(pa.table({
                    "id_a": pa.array(uids[ra2[sk_mask][emit]], pa.string()),
                    "id_b": pa.array(uids[rb2[sk_mask][emit]], pa.string()),
                    "via": pa.array(VIA_NAMES[via_c], pa.string()),
                    "score": pa.array(same.astype(np.float64),
                                      pa.float64())}))

        if not out_tables:
            return empty_edges()
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
    primitive: ``Dataset.join`` in this Ray release mis-handles empty
    partitions, and its aggregator actors deadlock when partitions
    exceed cluster CPUs — the packed groupby path is always safe and an
    order of magnitude cheaper per row.
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
