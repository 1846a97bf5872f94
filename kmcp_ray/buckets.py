"""Per-partition bucket processing: band rows → verified candidate-pair
edges.

The whole LSH shuffle is ONE ``groupby("part")`` with this module's
verifier applied per partition (vectorized inside), instead of a
groupby over millions of tiny band keys — the same reason kmcp scores a
query against a whole index block in one bit-matrix pass instead of
probing chunks one by one (reference: kmcp/cmd/util-db-search.go:6613+).

Within a partition, rows are sorted by (kind, key); every equal-key
segment is a bucket:

- ``exact`` buckets emit star edges to the minimum id (no verification —
  key == content hash of caption+bytes).
- ``minhash`` / ``contain`` buckets emit candidate pairs, verified
  against the exact scaled-sketch sets: Jaccard ≥ τ_j  → via "minhash",
  else containment ≥ τ_c (kmcp qCov, util-db-search.go:7466-7493
  semantics re-derived) → via "contain".
- ``phash`` buckets verify Hamming(phash) ≤ radius → via "phash".

Skew (the kmcp block-size-threshold analogue, index.go:213-259): buckets
larger than ``max_bucket`` are *salted* — rows collapse to one
representative per identical sketch/phash (star edges inside each
identical group are exact duplicates by construction), and at most
``max_bucket`` representatives are pairwise verified; any overflow is
counted and logged, never silently dropped.
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


def _intersect_size(a: np.ndarray, b: np.ndarray) -> int:
    return np.intersect1d(a, b, assume_unique=True).size


def make_bucket_verifier(cfg: DedupConfig):
    """Factory for the per-partition ``map_groups`` verifier."""

    def verify_partition(batch: pa.Table) -> pa.Table:
        m = batch.num_rows
        if m < 2:
            return empty_edges()
        kinds = batch.column("kind").to_numpy(zero_copy_only=False)
        keys = batch.column("key").to_numpy(zero_copy_only=False).astype(np.uint64)
        ids = batch.column("image_id").to_numpy(zero_copy_only=False)
        sk_fold = batch.column("sk_fold").to_numpy(zero_copy_only=False).astype(np.uint64)
        phash = batch.column("phash").to_numpy(zero_copy_only=False).astype(np.int64)
        n_sh = batch.column("n_sh").to_numpy(zero_copy_only=False).astype(np.int64)
        from kmcp_ray.arrowutil import column, list_to_numpy
        sketch_col = column(batch, "sketch")

        order = np.lexsort((keys, kinds))
        kinds_s, keys_s = kinds[order], keys[order]
        seg_start = np.nonzero(np.concatenate((
            [True], (kinds_s[1:] != kinds_s[:-1]) | (keys_s[1:] != keys_s[:-1]))))[0]
        seg_end = np.concatenate((seg_start[1:], [m]))

        star_a, star_b, star_via = [], [], []     # unverified-safe edges
        cand_i, cand_j, cand_cls = [], [], []     # row-index pairs to verify
        dropped = 0

        for s, e in zip(seg_start, seg_end):
            if e - s < 2:
                continue
            rows = order[s:e]
            kind = kinds_s[s]
            # deterministic within-bucket order
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

            if len(rows) > cfg.max_bucket:
                # salted path: collapse identical content, verify reps only
                ident = group_ident[rows]
                uniq, first_idx = np.unique(ident, return_index=True)
                reps = []
                for u, fi in zip(uniq, first_idx):
                    members = rows[ident == u]
                    root = members[0]
                    reps.append(root)
                    via = _VIA_OF_KIND[kind] if kind != KIND_CONTAIN else "minhash"
                    for r in members[1:]:
                        star_a.append(ids[root]); star_b.append(ids[r])
                        star_via.append(via)
                reps = np.array(sorted(reps, key=lambda r: ids[r]))
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
                ok = ham <= cfg.hamming_radius
                for a, b, h in zip(sub["a"].to_numpy()[ok], sub["b"].to_numpy()[ok],
                                   np.asarray(ham)[ok]):
                    out_a.append(a); out_b.append(b)
                    out_via.append("phash"); out_score.append(1.0 - float(h) / 64.0)

            sk_mask = (df["cls"] == "sk").to_numpy()
            if sk_mask.any():
                sub = df[sk_mask]
                sk_val, sk_off = list_to_numpy(sketch_col, dtype=np.uint64)
                for a, b, i, j in zip(sub["a"].to_numpy(), sub["b"].to_numpy(),
                                      sub["i"].to_numpy(), sub["j"].to_numpy()):
                    na, nb = n_sh[i], n_sh[j]
                    if na == 0 or nb == 0:
                        continue
                    if sk_fold[i] == sk_fold[j]:
                        c = int(na)
                    else:
                        c = _intersect_size(
                            sk_val[sk_off[i]:sk_off[i] + na],
                            sk_val[sk_off[j]:sk_off[j] + nb])
                    jacc = c / float(na + nb - c)
                    if jacc >= cfg.jaccard_threshold:
                        out_a.append(a); out_b.append(b)
                        out_via.append("minhash"); out_score.append(jacc)
                        continue
                    small = min(na, nb)
                    if small >= cfg.min_containment_shingles:
                        contain = c / float(small)
                        if contain >= cfg.containment_threshold:
                            out_a.append(a); out_b.append(b)
                            out_via.append("contain"); out_score.append(contain)

        if not out_a:
            return empty_edges()
        return pa.table({"id_a": pa.array(out_a, pa.string()),
                         "id_b": pa.array(out_b, pa.string()),
                         "via": pa.array(out_via, pa.string()),
                         "score": pa.array(out_score, pa.float64())})

    return verify_partition
