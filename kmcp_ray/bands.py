"""Band-row expansion: signature table → LSH shuffle rows.

Each signature row fans out into candidate-bucket rows across four
generators — this is the Ray-Data-native replacement for kmcp's
bit-sliced Bloom-filter index probe (reference: kmcp/cmd/index.go,
util-db-search.go): instead of ANDing bit-matrix rows addressed by query
hashes, rows that agree on a bucket key meet in a ``groupby`` shuffle.

  kind 0  MinHash band key        (Jaccard candidates; near-dup captions)
  kind 1  scaled shingle hash     (containment candidates — kmcp's exact
                                   k-mer containment query analogue)
  kind 2  pHash 16-bit chunk      (Hamming candidates; near-dup images)
  kind 3  exact content key       (identical caption+bytes)

Rows carry ``part = key % num_partitions`` so the wide shuffle is ONE
explicit hash partition (``groupby("part")``) processed vectorized per
partition, instead of millions of tiny per-key groups.  Skewed keys are
handled downstream (buckets.py) — the kmcp block-size-threshold analogue.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from kmcp_ray import hashing, imagecodec, text
from kmcp_ray.config import DedupConfig

KIND_MINHASH = 0
KIND_CONTAIN = 1
KIND_PHASH = 2
KIND_EXACT = 3

_CONTAIN_SALT = np.uint64(0x9FB21C651E98DF25)

BAND_SCHEMA = pa.schema([
    ("part", pa.int64()),
    ("key", pa.uint64()),
    ("kind", pa.int8()),
    ("image_id", pa.string()),
    ("sketch", pa.list_(pa.uint64())),
    ("sk_fold", pa.uint64()),
    ("phash", pa.int64()),
    ("n_sh", pa.int32()),
])


def make_band_fn(cfg: DedupConfig, enable=("minhash", "contain", "phash", "exact")):
    """Factory for the stateless band-expansion ``map_batches`` function.

    ``enable`` selects generators — the documents-table dedup operators
    reuse this with a subset.
    """
    enabled = frozenset(enable)

    def band_batch(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        from kmcp_ray.arrowutil import column, list_to_numpy
        ids = column(batch, "image_id")
        sketch_col = column(batch, "sketch")
        sk_values, sk_offsets = list_to_numpy(sketch_col, dtype=np.uint64)
        sk_fold = batch.column("sk_fold").to_numpy(zero_copy_only=False).astype(np.uint64)
        phash = batch.column("phash").to_numpy(zero_copy_only=False).astype(np.int64)
        exact_key = batch.column("exact_key").to_numpy(zero_copy_only=False).astype(np.uint64)
        n_sh = (sk_offsets[1:] - sk_offsets[:-1]).astype(np.int32)

        # per-generator (row_idx, key, kind) triples
        row_parts, key_parts, kind_parts = [], [], []

        if "minhash" in enabled:
            mh_values, _mh_off = list_to_numpy(column(batch, "minhash"),
                                               dtype=np.uint64)
            sig = mh_values.reshape(n, cfg.num_perm)
            keys = text.band_keys(sig, cfg.bands)          # (n, bands)
            rows = np.repeat(np.arange(n), cfg.bands)
            flat = keys.reshape(-1)
            keep = flat != hashing.MAX_U64                  # degenerate rows
            row_parts.append(rows[keep])
            key_parts.append(flat[keep])
            kind_parts.append(np.full(keep.sum(), KIND_MINHASH, dtype=np.int8))

        if "contain" in enabled:
            # one row per kept shingle hash; only rows with enough shingles
            eligible = n_sh >= cfg.min_containment_shingles
            row_of_val = np.repeat(np.arange(n), sk_offsets[1:] - sk_offsets[:-1])
            keep = eligible[row_of_val] & (sk_values <= np.uint64(cfg.bucket_max_hash))
            row_parts.append(row_of_val[keep])
            key_parts.append(hashing.splitmix64(sk_values[keep] + _CONTAIN_SALT))
            kind_parts.append(np.full(keep.sum(), KIND_CONTAIN, dtype=np.int8))

        if "phash" in enabled:
            pk = imagecodec.phash_chunk_keys(phash, cfg.phash_chunks)
            row_parts.append(np.repeat(np.arange(n), cfg.phash_chunks))
            key_parts.append(pk.reshape(-1))
            kind_parts.append(np.full(n * cfg.phash_chunks, KIND_PHASH, dtype=np.int8))

        if "exact" in enabled:
            row_parts.append(np.arange(n))
            key_parts.append(exact_key)
            kind_parts.append(np.full(n, KIND_EXACT, dtype=np.int8))

        rows = np.concatenate(row_parts) if row_parts else np.empty(0, np.int64)
        keys = np.concatenate(key_parts) if key_parts else np.empty(0, np.uint64)
        kinds = np.concatenate(kind_parts) if kind_parts else np.empty(0, np.int8)
        part = (keys % np.uint64(cfg.num_partitions)).astype(np.int64)

        take = pa.array(rows, type=pa.int64())
        # phash / exact rows never read the sketch — null it out so the
        # wide shuffle doesn't move those list payloads (take() with a
        # null index yields a null list element)
        sketch_take = pa.array(rows, type=pa.int64(),
                               mask=(kinds >= KIND_PHASH))
        out_sketch = sketch_col.take(sketch_take)
        return pa.table({
            "part": pa.array(part, type=pa.int64()),
            "key": pa.array(keys, type=pa.uint64()),
            "kind": pa.array(kinds, type=pa.int8()),
            "image_id": ids.take(take),
            "sketch": out_sketch,
            "sk_fold": pa.array(sk_fold[rows], type=pa.uint64()),
            "phash": pa.array(phash[rows], type=pa.int64()),
            "n_sh": pa.array(n_sh[rows], type=pa.int32()),
        })

    return band_batch
