"""Signature-table schema contract.

The sketch stage FINALIZES the LSH band keys and salted containment
bucket keys (kmcp derives both from one ntHash value per k-mer,
reference: kmcp/cmd/util-hash.go:61-142); the band stage is pure
fan-out.  These tests pin the stored columns to the raw definitions in
``text``/``hashing`` so a refactor of either side cannot silently
change which pairs meet in a bucket.
"""

import numpy as np
import pyarrow as pa

from kmcp_ray import hashing, testgen, text
from kmcp_ray.bands import _CONTAIN_SALT
from kmcp_ray.config import DedupConfig
from kmcp_ray.sketch import SIGNATURE_SCHEMA_COLS, make_sketch_fn

CFG = DedupConfig(num_partitions=16)


def _sig_table(n=80, seed=7):
    table, _, _ = testgen.make_pairs_corpus(n=n, seed=seed, cfg=CFG)
    fn = make_sketch_fn(CFG)
    return table, fn(table)


def test_signature_columns():
    _, sig = _sig_table()
    assert sig.column_names == SIGNATURE_SCHEMA_COLS


def test_bkeys_match_raw_minhash_banding():
    table, sig = _sig_table()
    ss = text.shingle_sets(table.column("caption"), CFG.shingle_k, CFG.max_hash)
    mh = text.minhash_signatures(ss["hashes"], ss["offsets"], CFG.num_perm)
    expect = text.band_keys(mh, CFG.bands)          # (n, bands)
    got = sig.column("bkeys").to_pylist()
    for i, row in enumerate(got):
        keep = expect[i][expect[i] != hashing.MAX_U64]
        assert row == keep.tolist(), f"row {i}"


def test_ckeys_are_salted_filtered_shingles():
    table, sig = _sig_table()
    ss = text.shingle_sets(table.column("caption"), CFG.shingle_k, CFG.max_hash)
    off = ss["offsets"]
    got = sig.column("ckeys").to_pylist()
    n_sh = sig.column("n_sh").to_pylist()
    for i in range(table.num_rows):
        vals = ss["hashes"][off[i]:off[i + 1]]
        assert n_sh[i] == len(vals)
        if len(vals) < CFG.min_containment_shingles:
            assert got[i] == []
            continue
        keep = vals[vals <= np.uint64(CFG.bucket_max_hash)]
        with np.errstate(over="ignore"):
            expect = hashing.splitmix64(keep + _CONTAIN_SALT)
        assert got[i] == expect.tolist(), f"row {i}"


def test_empty_caption_bands_nowhere():
    tbl = pa.table({
        "image_id": pa.array(["a"], pa.string()),
        "caption": pa.array([""], pa.string()),
        "phash": pa.array([3], pa.int64()),
        "bytes": pa.array([b"z"], pa.binary())})
    sig = make_sketch_fn(CFG)(tbl)
    assert sig.column("bkeys").to_pylist() == [[]]
    assert sig.column("ckeys").to_pylist() == [[]]
    assert sig.column("n_sh").to_pylist() == [0]
