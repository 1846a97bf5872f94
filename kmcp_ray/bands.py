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

**Identity compression (r3)**: the ``image_id`` string rides ONLY each
row's DESIGNATED entries — its first MinHash band (or first containment
key when MinHash is off), its pHash chunk 0, and its exact entry; all
other entries ship just ``(bkey u32, ident u64)`` = 12 B.
``ident`` is the row's content-equivalence-class key for the entry's
kind (whole-sketch fold for minhash/contain, the 64-bit pHash for
phash): rows with equal ident are duplicates by construction, share
their entire band-key vector, and therefore all meet in the SAME
designated bucket — which is where the verifier emits their star edges,
their (ident → id) membership rows, and nothing else id-bearing.
Everything downstream of the wide exchange works on u64 equivalence
classes and re-attaches strings from the (tiny) membership table.  This
roughly halves the one wide shuffle's bytes — the reference's analogue
is kmcp indexing k-mers against compact integer reference indices, not
names (kmcp/cmd/index.go:213+, semantics re-derived).

**Bucket-key truncation (r4)**: the shipped bucket key is ONE u32 —
kind in the top 2 bits, the full key's HIGH 30 bits below (``bkey =
kind << 30 | key >> 34``); the shuffle partition still derives from the
FULL 64-bit key map-side, so a truncated collision only merges buckets
when both the low bits (mod num_partitions) and the high 30 bits agree
(~2^-37 per entry pair at P=128).  Collisions can only ADD candidate
pairs — every sketch pair is exactly re-verified downstream, every
phash pair Hamming-verified on its full 64-bit ident in the bucket,
and phashc class pairs that re-emit from a colliding later chunk's
bucket (~2^-30 per extra agreeing chunk) are deduplicated in
edges_from_raw — never lose them (equal full keys ⇒ equal bkey +
part), so recall and verified-edge semantics are unchanged while the
id-free entry stream
drops from 17 B to 12 B (-30%): the expected false-candidate volume at
10^12 rows (~3e13 entries, P~10^6) is ~1e11 pairs, a bounded verify
surcharge traded for ~120 TB less exchange traffic.  The reference's
analogue is kmcp's Bloom-FPR knob — accepted false positives at the
candidate stage, exact verification after (kmcp/cmd/index.go:88-92).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from kmcp_ray.arrowutil import column, list_to_numpy
from kmcp_ray.config import DedupConfig

KIND_MINHASH = 0
KIND_CONTAIN = 1
KIND_PHASH = 2
KIND_EXACT = 3

_CONTAIN_SALT = np.uint64(0x9FB21C651E98DF25)

#: packed band-row columns: the id-free entry stream + the designated
#: (id-carrying) entry stream, offsets aligned on the same ``part`` rows
PACKED_COLS = ("bkey", "ident", "dbkey", "dident", "did")

#: bits of the full 64-bit bucket key kept in the shipped u32 (the top
#: 2 bits carry the kind)
BKEY_BITS = 30


def pack_bkey(keys: np.ndarray, kinds: np.ndarray) -> np.ndarray:
    """(full u64 key, kind) → shipped u32 bucket key: kind in the top
    2 bits, the key's high ``BKEY_BITS`` bits below.  Equal full keys
    (same kind) always map to equal bkeys; the partition is derived
    from the full key separately, so truncated collisions must also
    agree mod num_partitions to ever share a bucket."""
    return ((kinds.astype(np.uint32) << np.uint32(BKEY_BITS))
            | (keys >> np.uint64(64 - BKEY_BITS)).astype(np.uint32))


def bkey_kind(bkey: np.ndarray) -> np.ndarray:
    """Shipped u32 bucket key → kind (top 2 bits)."""
    return (bkey >> np.uint32(BKEY_BITS)).astype(np.int8)


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

        row_parts, key_parts, kind_parts, desig_parts = [], [], [], []

        # band + containment bucket keys are FINALIZED by the sketch
        # stage (sketch.py): this stage only fans them out into packed
        # shuffle rows — no hashing work, no raw minhash in its input
        if "minhash" in enabled:
            bk_vals, bk_off = list_to_numpy(column(batch, "bkeys"),
                                            dtype=np.uint64)
            row_parts.append(np.repeat(np.arange(n), bk_off[1:] - bk_off[:-1]))
            key_parts.append(bk_vals)
            kind_parts.append(np.full(len(bk_vals), KIND_MINHASH, dtype=np.int8))
            st = np.zeros(len(bk_vals), dtype=bool)
            st[bk_off[:-1][bk_off[1:] > bk_off[:-1]]] = True   # first band/row
            desig_parts.append(st)

        if "contain" in enabled:
            ck_vals, ck_off = list_to_numpy(column(batch, "ckeys"),
                                            dtype=np.uint64)
            row_parts.append(np.repeat(np.arange(n), ck_off[1:] - ck_off[:-1]))
            key_parts.append(ck_vals)
            kind_parts.append(np.full(len(ck_vals), KIND_CONTAIN, dtype=np.int8))
            st = np.zeros(len(ck_vals), dtype=bool)
            if "minhash" not in enabled:
                # fallback designated site: identical sketches share the
                # whole (sorted) ckey list, so "first ckey" is the same
                # bucket for every member of an identical group
                st[ck_off[:-1][ck_off[1:] > ck_off[:-1]]] = True
            desig_parts.append(st)

        if "phash" in enabled:
            from kmcp_ray import imagecodec
            pk = imagecodec.phash_chunk_keys(phash, cfg.phash_chunks)
            row_parts.append(np.repeat(np.arange(n), cfg.phash_chunks))
            key_parts.append(pk.reshape(-1))
            kind_parts.append(np.full(n * cfg.phash_chunks, KIND_PHASH, dtype=np.int8))
            st = np.zeros(n * cfg.phash_chunks, dtype=bool)
            st[::cfg.phash_chunks] = True                       # chunk 0/row
            desig_parts.append(st)

        if "exact" in enabled:
            row_parts.append(np.arange(n))
            key_parts.append(exact_key)
            kind_parts.append(np.full(n, KIND_EXACT, dtype=np.int8))
            desig_parts.append(np.ones(n, dtype=bool))          # 1 entry/row

        rows = np.concatenate(row_parts) if row_parts else np.empty(0, np.int64)
        keys = np.concatenate(key_parts) if key_parts else np.empty(0, np.uint64)
        kinds = np.concatenate(kind_parts) if kind_parts else np.empty(0, np.int8)
        desig = np.concatenate(desig_parts) if desig_parts else np.empty(0, bool)
        part = (keys % np.uint64(cfg.num_partitions)).astype(np.int64)
        bkeys = pack_bkey(keys, kinds)

        # per-entry identity payload — ONE u64, selected by kind: the
        # phash travels only with phash-band entries (Hamming verify +
        # equivalence-class key) and the sketch fold with everything
        # else; exact entries group by key alone but their fold ident
        # keeps the unified (seg, ident) star grouping exact (equal
        # exact_key ⇒ equal caption ⇒ equal fold).
        ident = np.where(kinds == KIND_PHASH,
                         phash.view(np.uint64)[rows], sk_fold[rows])

        # ---- pack: one output row per partition present in this batch,
        # with the id-free and the designated entry streams as separate,
        # part-aligned list columns -------------------------------------
        order = np.argsort(part, kind="stable")
        part_s = part[order]
        m = len(part_s)
        bound = np.nonzero(np.concatenate(([True], part_s[1:] != part_s[:-1])))[0] \
            if m else np.empty(0, np.int64)
        uparts = part_s[bound] if m else np.empty(0, np.int64)

        desig_s = desig[order]
        o1 = order[~desig_s]              # id-free entries, part-ascending
        o2 = order[desig_s]               # designated entries
        p1, p2 = part[o1], part[o2]
        # ascending starts per present part; zero-length where absent
        off1 = np.append(np.searchsorted(p1, uparts), len(p1)).astype(np.int32)
        off2 = np.append(np.searchsorted(p2, uparts), len(p2)).astype(np.int32)

        ids_np = ids.to_numpy(zero_copy_only=False)

        def pack_list(offsets, values: np.ndarray, arrow_type) -> pa.ListArray:
            return pa.ListArray.from_arrays(
                pa.array(offsets, type=pa.int32()),
                pa.array(values, type=arrow_type))

        return pa.table({
            "part": pa.array(uparts, pa.int64()),
            "bkey": pack_list(off1, bkeys[o1], pa.uint32()),
            "ident": pack_list(off1, ident[o1], pa.uint64()),
            "dbkey": pack_list(off2, bkeys[o2], pa.uint32()),
            "dident": pack_list(off2, ident[o2], pa.uint64()),
            "did": pack_list(off2, ids_np[rows[o2]], pa.string()),
        })

    return band_batch
