"""Band-row expansion: signature table → packed LSH shuffle rows.

Each signature row fans out into candidate-bucket keys across four
generators — the Ray-Data-native replacement for kmcp's bit-sliced
Bloom-filter index probe (reference: kmcp/cmd/index.go,
util-db-search.go): rows that agree on a bucket key meet in a
``groupby`` shuffle instead of a bit-matrix AND.

  kind 0  MinHash band key        (Jaccard candidates; near-dup captions)
  kind 1  scaled shingle hash     (containment candidates — kmcp's exact
                                   k-mer containment query analogue)
  kind 2  pHash 16-bit chunk      (Hamming candidates; near-dup images)
  kind 3  exact content key       (identical caption+bytes)

**Map-side packing** (the one big shuffle-cost lever): instead of one
shuffle row per (row, key) — ~30 tiny rows per input row — each input
batch emits ONE packed row per partition (``part = key % num_partitions``)
holding columnar lists of that partition's keys/ids/folds.  The
downstream ``groupby("part")`` then sorts thousands of fat rows, not
millions of 40-byte ones; payload bytes are identical.  This is the
map-side-combine shape from the Ray Data guide, and the analogue of
kmcp packing 8-file batches into block columns (kmcp/cmd/index.go:1066+).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from kmcp_ray import imagecodec
from kmcp_ray.arrowutil import column, list_to_numpy
from kmcp_ray.config import DedupConfig

KIND_MINHASH = 0
KIND_CONTAIN = 1
KIND_PHASH = 2
KIND_EXACT = 3

#: high bit of the packed ``kind`` byte: this entry is its row's
#: DESIGNATED star-emission site.  Identical sketches share their whole
#: band-key vector (and identical phashes share all chunk keys), so
#: linking identical-content members to a representative only needs to
#: happen in ONE deterministic bucket — the row's first band / chunk 0 —
#: instead of once per band (16x/8x duplicate star edges measured at
#: 3.2M rows: 6.3M minhash + 1.5M phash stars before, ~0.6M after).
#: Costs zero extra shuffle bytes; the verifier masks the bit off.
STAR_FLAG = np.int8(8)

_CONTAIN_SALT = np.uint64(0x9FB21C651E98DF25)


def _segment_gather(starts: np.ndarray, lengths: np.ndarray) -> np.ndarray:
    """Flat gather indices for concatenating segments
    [starts_i, starts_i + lengths_i) — fully vectorized."""
    total = int(lengths.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    excl_cumsum = np.concatenate(([0], np.cumsum(lengths)[:-1]))
    out = np.repeat(starts - excl_cumsum, lengths)
    return out + np.arange(total)


def make_band_fn(cfg: DedupConfig, enable=("minhash", "contain", "phash", "exact")):
    """Factory for the stateless packed band-expansion function."""
    enabled = frozenset(enable)

    def band_batch(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        ids = column(batch, "image_id")
        sk_fold = batch.column("sk_fold").to_numpy(zero_copy_only=False).astype(np.uint64)
        phash = batch.column("phash").to_numpy(zero_copy_only=False).astype(np.int64)
        exact_key = batch.column("exact_key").to_numpy(zero_copy_only=False).astype(np.uint64)

        row_parts, key_parts, kind_parts, star_parts = [], [], [], []

        # band + containment bucket keys are FINALIZED by the sketch
        # stage (sketch.py): this stage only fans them out into packed
        # shuffle rows — no hashing work, no raw minhash in its input
        if "minhash" in enabled:
            bk_vals, bk_off = list_to_numpy(column(batch, "bkeys"),
                                            dtype=np.uint64)
            row_parts.append(np.repeat(np.arange(n), bk_off[1:] - bk_off[:-1]))
            key_parts.append(bk_vals)
            kind_parts.append(np.full(len(bk_vals), KIND_MINHASH, dtype=np.int8))
            st = np.zeros(len(bk_vals), dtype=np.int8)
            st[bk_off[:-1][bk_off[1:] > bk_off[:-1]]] = 1   # first band/row
            star_parts.append(st)

        if "contain" in enabled:
            ck_vals, ck_off = list_to_numpy(column(batch, "ckeys"),
                                            dtype=np.uint64)
            row_parts.append(np.repeat(np.arange(n), ck_off[1:] - ck_off[:-1]))
            key_parts.append(ck_vals)
            kind_parts.append(np.full(len(ck_vals), KIND_CONTAIN, dtype=np.int8))
            st = np.zeros(len(ck_vals), dtype=np.int8)
            if "minhash" not in enabled:
                # fallback designated site: identical sketches share the
                # whole (sorted) ckey list, so "first ckey" is the same
                # bucket for every member of an identical group
                st[ck_off[:-1][ck_off[1:] > ck_off[:-1]]] = 1
            star_parts.append(st)

        if "phash" in enabled:
            pk = imagecodec.phash_chunk_keys(phash, cfg.phash_chunks)
            row_parts.append(np.repeat(np.arange(n), cfg.phash_chunks))
            key_parts.append(pk.reshape(-1))
            kind_parts.append(np.full(n * cfg.phash_chunks, KIND_PHASH, dtype=np.int8))
            st = np.zeros(n * cfg.phash_chunks, dtype=np.int8)
            st[::cfg.phash_chunks] = 1                       # chunk 0/row
            star_parts.append(st)

        if "exact" in enabled:
            row_parts.append(np.arange(n))
            key_parts.append(exact_key)
            kind_parts.append(np.full(n, KIND_EXACT, dtype=np.int8))
            star_parts.append(np.ones(n, dtype=np.int8))     # 1 entry/row

        rows = np.concatenate(row_parts) if row_parts else np.empty(0, np.int64)
        keys = np.concatenate(key_parts) if key_parts else np.empty(0, np.uint64)
        kinds = np.concatenate(kind_parts) if kind_parts else np.empty(0, np.int8)
        stars = np.concatenate(star_parts) if star_parts else np.empty(0, np.int8)
        part = (keys % np.uint64(cfg.num_partitions)).astype(np.int64)

        # per-entry identity payload — ONE u64, selected by kind: the
        # phash travels only with phash-band entries (Hamming verify +
        # salted-bucket ident) and the sketch fold only with
        # minhash/contain entries; exact entries verify by key alone.
        # Shipping both (16 B) per entry doubled the shuffle payload for
        # no reader.
        ident = np.where(kinds == KIND_PHASH,
                         phash.view(np.uint64)[rows], sk_fold[rows])
        kinds = kinds | (stars * STAR_FLAG)   # flag rides the kind byte

        # ---- pack: one output row per partition present in this batch ----
        order = np.argsort(part, kind="stable")
        rows, keys, kinds, part = rows[order], keys[order], kinds[order], part[order]
        ident = ident[order]
        m = len(rows)
        bound = np.nonzero(np.concatenate(([True], part[1:] != part[:-1])))[0] \
            if m else np.empty(0, np.int64)
        bound_end = np.concatenate((bound[1:], [m])) if m else bound
        pack_part = part[bound] if m else np.empty(0, np.int64)

        ids_np = ids.to_numpy(zero_copy_only=False)

        def pack_list(values: np.ndarray, arrow_type) -> pa.ListArray:
            return pa.ListArray.from_arrays(
                pa.array(np.concatenate((bound, [m])), type=pa.int32()),
                pa.array(values, type=arrow_type))

        out = pa.table({
            "part": pa.array(pack_part, pa.int64()),
            "key": pack_list(keys, pa.uint64()),
            "kind": pack_list(kinds, pa.int8()),
            "image_id": pack_list(ids_np[rows], pa.string()),
            "ident": pack_list(ident, pa.uint64()),
        })
        return out

    return band_batch
