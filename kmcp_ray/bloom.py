"""Bloom-filter membership over shingle sets — the probabilistic
scale path for benchmark decontamination.

kmcp's index IS a bloom-filter bit matrix: every reference bucket
stores k-mer membership as hashed bit positions that queries re-derive
and test (kmcp/cmd/index.go bit-matrix construction, SURVEY M12/S6;
semantics re-derived).  Here the same structure answers "does this
corpus shingle appear in the eval set": the exact
``curate.decontaminate`` broadcasts the full sorted blocklist hash
array (8 bytes per distinct shingle); this bloom variant broadcasts a
FIXED ``m_bits/8``-byte filter regardless of blocklist size — the mode
you want when the eval set itself is web-scale.  False positives only
over-drop (safe direction for decontamination) at rate
~(1 - e^{-kn/m})^k.

Determinism contract (same as hll.py / cms.py): bit positions derive
from the sip+splitmix row-hash family (production) or the md5-prefix
family (``('0x' || substr(md5(s || '|' || r), 1, 16))::UBIGINT %
m_bits``), so with md5 the DuckDB oracle rebuilds the same filter —
false positives included — and the driver hash-checks the end-to-end
result, not a fuzzy approximation of it.

Execution shape: filter build is one bitmap row per block OR-folded on
the driver (HLL's max-fold with OR); the probe is a broadcast
``ray.put`` of the words array tested per batch with pure bit math.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from kmcp_ray import textops
from kmcp_ray.cms import _row_hashes


def _positions(shingles: np.ndarray, k_hashes: int, m_bits: int,
               token_hash: str) -> np.ndarray:
    """(k_hashes, n) int64 bit positions for n shingle strings."""
    hv = _row_hashes(shingles, k_hashes, token_hash)
    return (hv % np.uint64(m_bits)).astype(np.int64)


def _set_bits(words: np.ndarray, pos: np.ndarray) -> None:
    np.bitwise_or.at(words, pos >> 6,
                     np.uint64(1) << (pos.astype(np.uint64)
                                      & np.uint64(63)))


def _test_bits(words: np.ndarray, pos: np.ndarray) -> np.ndarray:
    return (words[pos >> 6] >> (pos.astype(np.uint64) & np.uint64(63))) \
        & np.uint64(1) != 0


def shingle_bloom(eval_ds, text_col: str = "text", k: int = 3, *,
                  m_bits: int = 1 << 20, k_hashes: int = 3,
                  token_hash: str = "sip") -> np.ndarray:
    """Build the filter over the eval set's distinct k-token shingles.

    Returns the uint64 word array (``m_bits // 64`` words).  Per batch:
    shingle → unique → set bits in a local bitmap → one row; the driver
    OR-folds one ``m_bits/8``-byte row per block."""
    if m_bits % 64:
        raise ValueError("m_bits must be a multiple of 64")

    def partial(t: pa.Table) -> pa.Table:
        sh, _rows, _n = textops.shingle_strings(t.column(text_col), k)
        words = np.zeros(m_bits >> 6, dtype=np.uint64)
        if len(sh):
            pos = _positions(np.unique(sh), k_hashes, m_bits, token_hash)
            _set_bits(words, pos.ravel())
        return pa.table({"bloom": pa.array([words.tobytes()], pa.binary())})

    acc = np.zeros(m_bits >> 6, dtype=np.uint64)
    rows = eval_ds.map_batches(partial, batch_format="pyarrow",
                               zero_copy_batch=True)
    for b in rows.iter_batches(batch_size=1024, batch_format="pyarrow"):
        for blob in b.column("bloom"):
            acc |= np.frombuffer(blob.as_py(), dtype=np.uint64)
    return acc


def contains(words: np.ndarray, shingles: np.ndarray, *,
             k_hashes: int = 3, token_hash: str = "sip") -> np.ndarray:
    """Membership test per shingle: ALL k_hashes bits set."""
    if len(shingles) == 0:
        return np.empty(0, bool)
    m_bits = len(words) << 6
    pos = _positions(np.asarray(shingles, dtype=object), k_hashes,
                     m_bits, token_hash)
    return np.logical_and.reduce(_test_bits(words, pos), axis=0)


def bit_table(words: np.ndarray) -> pa.Table:
    """Filter state as sorted (bit) integer rows — deterministic and
    hash-comparable against the SQL mirror."""
    bits = []
    nz = np.nonzero(words)[0]
    for w in nz:
        b = np.nonzero((words[w] >> np.arange(64, dtype=np.uint64))
                       & np.uint64(1))[0]
        bits.append((np.int64(w) << 6) + b.astype(np.int64))
    out = np.concatenate(bits) if bits else np.empty(0, np.int64)
    return pa.table({"bit": pa.array(out, pa.int64())})


def bloom_decontaminate(ds, eval_ds, k: int = 3, text_col: str = "text",
                        *, m_bits: int = 1 << 20, k_hashes: int = 3,
                        token_hash: str = "sip"):
    """Drop corpus rows sharing ANY k-token shingle with the eval set,
    membership tested through the bloom filter (over-drops at the FP
    rate; never under-drops).  Same anti-join shape as
    ``curate.decontaminate`` with the broadcast shrunk to m_bits/8
    bytes."""
    words_ref = ray.put(shingle_bloom(eval_ds, text_col, k,
                                      m_bits=m_bits, k_hashes=k_hashes,
                                      token_hash=token_hash))

    def fn(t: pa.Table) -> pa.Table:
        words = ray.get(words_ref)
        sh, rows, n = textops.shingle_strings(t.column(text_col), k)
        hit_rows = np.zeros(n, dtype=bool)
        if len(sh):
            hit = contains(words, sh, k_hashes=k_hashes,
                           token_hash=token_hash)
            hit_rows[rows[hit]] = True
        return t.filter(pa.array(~hit_rows))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
