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
import pandas as pd
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


def _star_identical(rows, ident_arr, ids, via, star_a, star_b, star_via):
    """Collapse bucket rows to one representative per identical content
    value (star edges root→member), fully vectorized.  ``rows`` must be
    id-sorted; returns the id-sorted representatives."""
    ident = ident_arr[rows]
    order = np.argsort(ident, kind="stable")   # stable: id order kept per group
    rs = rows[order]
    iv = ident[order]
    first = np.concatenate(([True], iv[1:] != iv[:-1]))
    group_of = np.cumsum(first) - 1
    roots = rs[first]
    member_mask = ~first
    for root_idx, r in zip(group_of[member_mask], rs[member_mask]):
        star_a.append(ids[roots[root_idx]]); star_b.append(ids[r])
        star_via.append(via)
    reps = rs[first]
    return reps[np.argsort(ids[reps], kind="stable")]


def make_bucket_verifier(cfg: DedupConfig):
    """Factory for the per-partition ``map_groups`` bucket processor."""

    def verify_partition(batch: pa.Table) -> pa.Table:
        from kmcp_ray.arrowutil import column, list_to_numpy

        kinds, _ = list_to_numpy(column(batch, "kind"), dtype=np.int8)
        m = len(kinds)
        if m < 2:
            return empty_edges()
        keys, _ = list_to_numpy(column(batch, "key"), dtype=np.uint64)
        ids = column(batch, "image_id").flatten().to_numpy(zero_copy_only=False)
        sk_fold, _ = list_to_numpy(column(batch, "sk_fold"), dtype=np.uint64)
        phash, _ = list_to_numpy(column(batch, "phash"), dtype=np.int64)

        order = np.lexsort((keys, kinds))
        kinds_s, keys_s = kinds[order], keys[order]
        seg_start = np.nonzero(np.concatenate((
            [True], (kinds_s[1:] != kinds_s[:-1]) | (keys_s[1:] != keys_s[:-1]))))[0]
        seg_end = np.concatenate((seg_start[1:], [m]))
        multi = (seg_end - seg_start) >= 2
        seg_start, seg_end = seg_start[multi], seg_end[multi]

        star_a, star_b, star_via = [], [], []     # unverified-safe edges
        cand_i, cand_j, cand_cls = [], [], []     # row-index pairs
        dropped = 0

        for s, e in zip(seg_start, seg_end):
            rows = order[s:e]
            kind = kinds_s[s]
            rows = rows[np.argsort(ids[rows], kind="stable")]

            if kind == KIND_EXACT:
                root = rows[0]
                for r in rows[1:]:
                    star_a.append(ids[root]); star_b.append(ids[r])
                    star_via.append("exact")
                continue

            group_ident = sk_fold if kind in (KIND_MINHASH, KIND_CONTAIN) \
                else phash.view(np.uint64)
            cls = "sk" if kind in (KIND_MINHASH, KIND_CONTAIN) else "ph"

            if kind == KIND_CONTAIN and len(rows) > cfg.max_shingle_df:
                _star_identical(rows, group_ident, ids, "minhash",
                                star_a, star_b, star_via)
                continue

            if len(rows) > cfg.max_bucket:
                via = _VIA_OF_KIND[kind] if kind != KIND_CONTAIN else "minhash"
                reps = _star_identical(rows, group_ident, ids, via,
                                       star_a, star_b, star_via)
                if len(reps) > cfg.max_bucket:
                    dropped += len(reps) - cfg.max_bucket
                    reps = reps[:cfg.max_bucket]
                rows = reps
                if len(rows) < 2:
                    continue

            ii, jj = np.triu_indices(len(rows), k=1)
            cand_i.append(rows[ii]); cand_j.append(rows[jj])
            cand_cls.append(np.full(len(ii), cls, dtype=object))

        if dropped:
            logger.warning("bucket cap overflow: %d representatives dropped "
                           "in partition (max_bucket=%d)", dropped, cfg.max_bucket)

        out_a = list(star_a)
        out_b = list(star_b)
        out_via = list(star_via)
        out_score = [1.0] * len(star_a)

        if cand_i:
            ci = np.concatenate(cand_i)
            cj = np.concatenate(cand_j)
            ccls = np.concatenate(cand_cls)
            df = pd.DataFrame({
                "a": np.where(ids[ci] <= ids[cj], ids[ci], ids[cj]),
                "b": np.where(ids[ci] <= ids[cj], ids[cj], ids[ci]),
                "cls": ccls, "i": ci, "j": cj})
            df = df[df["a"] != df["b"]]
            df = df.drop_duplicates(subset=["a", "b", "cls"])

            ph_mask = (df["cls"] == "ph").to_numpy()
            if ph_mask.any():
                sub = df[ph_mask]
                ham = imagecodec.hamming64(phash[sub["i"].to_numpy()],
                                           phash[sub["j"].to_numpy()])
                ok = np.asarray(ham) <= cfg.hamming_radius
                for a, b, h in zip(sub["a"].to_numpy()[ok], sub["b"].to_numpy()[ok],
                                   np.asarray(ham)[ok]):
                    out_a.append(a); out_b.append(b)
                    out_via.append("phash"); out_score.append(1.0 - float(h) / 64.0)

            sk_mask = (df["cls"] == "sk").to_numpy()
            if sk_mask.any():
                sub = df[sk_mask]
                # identical-sketch pairs short-circuit to verified edges
                fi = sk_fold[sub["i"].to_numpy()]
                fj = sk_fold[sub["j"].to_numpy()]
                same = fi == fj
                for a, b in zip(sub["a"].to_numpy()[same], sub["b"].to_numpy()[same]):
                    out_a.append(a); out_b.append(b)
                    out_via.append("minhash"); out_score.append(1.0)
                for a, b in zip(sub["a"].to_numpy()[~same], sub["b"].to_numpy()[~same]):
                    out_a.append(a); out_b.append(b)
                    out_via.append("cand"); out_score.append(0.0)

        if not out_a:
            return empty_edges()
        return pa.table({"id_a": pa.array(out_a, pa.string()),
                         "id_b": pa.array(out_b, pa.string()),
                         "via": pa.array(out_via, pa.string()),
                         "score": pa.array(out_score, pa.float64())})

    return verify_partition


# ---------------------------------------------------- candidate verification

def make_pair_verifier(cfg: DedupConfig):
    """map_batches verifier for joined candidate pairs
    (id_a, id_b, ska, skb): exact Jaccard / containment on the
    bottom-``verify_k`` sketches (kmcp qCov/jacc semantics,
    util-db-search.go:7466-7493 re-derived)."""

    def verify_pairs(batch: pa.Table) -> pa.Table:
        from kmcp_ray.arrowutil import column
        a = column(batch, "id_a").to_numpy(zero_copy_only=False)
        b = column(batch, "id_b").to_numpy(zero_copy_only=False)
        ska = column(batch, "vsk_a").to_numpy(zero_copy_only=False)
        skb = column(batch, "vsk_b").to_numpy(zero_copy_only=False)
        out_a, out_b, out_via, out_score = [], [], [], []
        for p in range(len(a)):
            ta = np.frombuffer(ska[p], dtype=np.uint64)
            tb = np.frombuffer(skb[p], dtype=np.uint64)
            na, nb = len(ta), len(tb)
            if na == 0 or nb == 0:
                continue
            c = np.intersect1d(ta, tb, assume_unique=True).size
            jacc = c / float(na + nb - c)
            if jacc >= cfg.jaccard_threshold:
                out_a.append(a[p]); out_b.append(b[p])
                out_via.append("minhash"); out_score.append(jacc)
                continue
            small = min(na, nb)
            if small >= cfg.min_containment_shingles:
                contain = c / float(small)
                if contain >= cfg.containment_threshold:
                    out_a.append(a[p]); out_b.append(b[p])
                    out_via.append("contain"); out_score.append(contain)
        return pa.table({"id_a": pa.array(out_a, pa.string()),
                         "id_b": pa.array(out_b, pa.string()),
                         "via": pa.array(out_via, pa.string()),
                         "score": pa.array(out_score, pa.float64())})

    return verify_pairs


# --------------------------------------------------- payload-attach "join"

def make_attach_tagger(side_col: str, other_col: str, P: int,
                       carry_col: "str | None"):
    """Tag pair rows for the bucket exchange keyed on ``side_col``."""
    from kmcp_ray import hashing

    def tag_pairs(batch: pa.Table) -> pa.Table:
        kid = batch.column(side_col).to_numpy(zero_copy_only=False)
        bkt = (hashing.hash_strings(kid) % np.uint64(P)).astype(np.int64)
        carry = batch.column(carry_col) if carry_col else \
            pa.nulls(len(kid), pa.binary())
        return pa.table({
            "bkt": pa.array(bkt, pa.int64()),
            "rt": pa.array(np.ones(len(kid), dtype=np.int8), pa.int8()),
            "kid": pa.array(kid, pa.string()),
            "oid": batch.column(other_col),
            "carry": carry,
            "pl": pa.nulls(len(kid), pa.binary()),
        })

    return tag_pairs


def make_sig_tagger(P: int):
    from kmcp_ray import hashing

    def tag_sig(batch: pa.Table) -> pa.Table:
        kid = batch.column("image_id").to_numpy(zero_copy_only=False)
        bkt = (hashing.hash_strings(kid) % np.uint64(P)).astype(np.int64)
        n = len(kid)
        return pa.table({
            "bkt": pa.array(bkt, pa.int64()),
            "rt": pa.array(np.zeros(n, dtype=np.int8), pa.int8()),
            "kid": pa.array(kid, pa.string()),
            "oid": pa.nulls(n, pa.string()),
            "carry": pa.nulls(n, pa.binary()),
            "pl": batch.column("vsk"),
        })

    return tag_sig


def attach_group(group: pa.Table) -> pa.Table:
    """One hash bucket: attach each pair row's ``pl`` from the sig rows
    sharing its key.  Output: (kid, oid, carry, pl)."""
    rt = group.column("rt").to_numpy(zero_copy_only=False)
    kid = group.column("kid").to_numpy(zero_copy_only=False)
    pl = group.column("pl").to_numpy(zero_copy_only=False)
    is_sig = rt == 0
    lookup = dict(zip(kid[is_sig], pl[is_sig]))
    pair_idx = np.nonzero(~is_sig)[0]
    if len(pair_idx) == 0:
        return pa.table({"kid": pa.array([], pa.string()),
                         "oid": pa.array([], pa.string()),
                         "carry": pa.array([], pa.binary()),
                         "pl": pa.array([], pa.binary())})
    oid = group.column("oid").to_numpy(zero_copy_only=False)
    carry = group.column("carry").to_numpy(zero_copy_only=False)
    attached = [lookup.get(kid[i]) for i in pair_idx]
    return pa.table({
        "kid": pa.array(kid[pair_idx], pa.string()),
        "oid": pa.array(oid[pair_idx], pa.string()),
        "carry": pa.array(carry[pair_idx], pa.binary()),
        "pl": pa.array(attached, pa.binary()),
    })


def attach_sketches(pairs_ds, sig_small_ds, cfg: DedupConfig):
    """(id_a, id_b) pairs + (image_id, vsk) signatures →
    (id_a, id_b, vsk_a, vsk_b) via two union+groupby bucket exchanges.

    A hand-rolled partitioned hash join: ``Dataset.join`` in this Ray
    release mis-handles empty partitions (empty-schema blocks reach the
    acero join and fail), so the exchange is expressed with the always-
    safe groupby path instead.
    """
    P = cfg.num_partitions
    sig_tagged = sig_small_ds.map_batches(make_sig_tagger(P),
                                          batch_format="pyarrow",
                                          zero_copy_batch=True)
    # round 1: attach side a
    p1 = pairs_ds.map_batches(make_attach_tagger("id_a", "id_b", P, None),
                              batch_format="pyarrow", zero_copy_batch=True)
    r1 = p1.union(sig_tagged).groupby("bkt").map_groups(
        attach_group, batch_format="pyarrow")
    # round 2: r1 rows are (kid=id_a, oid=id_b, carry=None, pl=vsk_a);
    # re-tag keyed on id_b, carrying vsk_a
    r1 = r1.map_batches(
        lambda t: pa.table({"id_b": t["oid"], "id_a": t["kid"],
                            "vsk_a": t["pl"]}),
        batch_format="pyarrow", zero_copy_batch=True)
    p2 = r1.map_batches(make_attach_tagger("id_b", "id_a", P, "vsk_a"),
                        batch_format="pyarrow", zero_copy_batch=True)
    r2 = p2.union(sig_tagged).groupby("bkt").map_groups(
        attach_group, batch_format="pyarrow")
    return r2.map_batches(
        lambda t: pa.table({"id_a": t["oid"], "id_b": t["kid"],
                            "vsk_a": t["carry"], "vsk_b": t["pl"]}),
        batch_format="pyarrow", zero_copy_batch=True)
