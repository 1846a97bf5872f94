"""HyperLogLog distinct-count sketch over a Dataset.

The reference computes exact distinct k-mer counts by sort+dedup per
chunk (kmcp/cmd/compute.go:813-824, A3) — affordable because a chunk
fits memory.  Corpus-wide distinct counts (vocabulary size, distinct
shingles across 10^12 rows) need a mergeable sketch instead: classic
HyperLogLog (Flajolet et al. 2007), ~1.6% standard error at 4096
registers, built here as a fully DETERMINISTIC operator — the hash is
the md5-prefix variant shared with the DuckDB oracles
(hashing.md5_lower64), so even the sketch's register state is
SQL-mirrorable and driver-hash-checkable.

Execution shape: each batch reduces to ONE 2^p-byte register row
(map-side combine); rows merge by element-wise max — the driver folds
one tiny row per block, nothing shuffles.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from kmcp_ray import hashing


def _registers(h: np.ndarray, p: int) -> np.ndarray:
    """Per-batch register maxima of 64-bit hash values.

    reg = top p bits; rank = 1 + leading zeros of the remaining
    (64-p)-bit suffix.  64-p <= 52 keeps the suffix below 2^53, so
    ``np.frexp`` returns its bit length EXACTLY (no log2 rounding at
    power-of-two boundaries) — the SQL mirror uses ``length(bin(w))``,
    equally exact."""
    if 64 - p > 52:
        raise ValueError("p must be >= 12 so the suffix fits float64")
    m = 1 << p
    regs = np.zeros(m, dtype=np.int8)
    if not len(h):
        return regs
    h = np.asarray(h, dtype=np.uint64)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    mask = np.uint64((1 << (64 - p)) - 1)
    w = (h & mask).astype(np.uint64)
    bl = np.frexp(w.astype(np.float64))[1]       # exact bit length
    rank = (64 - p) + 1 - bl                     # 1..(64-p)+1
    np.maximum.at(regs, idx, rank.astype(np.int8))
    return regs


def estimate(regs: np.ndarray) -> float:
    """Standard HLL estimator with linear-counting small-range
    correction (Flajolet et al. 2007, public algorithm)."""
    m = len(regs)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    e = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    if e <= 2.5 * m:
        v = int(np.sum(regs == 0))
        if v:
            e = m * np.log(m / v)
    return float(e)


def shingle_hll(ds, text_col: str = "text", k: int = 3, p: int = 12,
                token_hash: str = "sip"):
    """Corpus-wide distinct-shingle HLL: returns (registers ndarray,
    estimate float).

    Per batch: shingle strings → 64-bit hashes → one register row; the
    driver element-wise-maxes one row per block.  ``token_hash="sip"``
    (production, vectorized SipHash) or ``"md5"`` (the SQL-mirrorable
    variant the driver oracle checks register-state-exactly; md5 runs
    once per distinct string — oracle-scale only)."""
    from kmcp_ray import textops

    hash_fn = (hashing.md5_lower64 if token_hash == "md5"
               else hashing.hash_tokens)

    def partial(t: pa.Table) -> pa.Table:
        sh, _rows, _n = textops.shingle_strings(t.column(text_col), k)
        regs = _registers(hash_fn(np.unique(sh))
                          if len(sh) else np.empty(0, np.uint64), p)
        return pa.table({"regs": pa.array([regs.tobytes()], pa.binary())})

    acc = np.zeros(1 << p, dtype=np.int8)
    rows = ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
    for b in rows.iter_batches(batch_size=1024, batch_format="pyarrow"):
        for blob in b.column("regs"):
            acc = np.maximum(acc, np.frombuffer(blob.as_py(), dtype=np.int8))
    return acc, estimate(acc)


def register_histogram(regs: np.ndarray) -> pa.Table:
    """(rank, n_registers) rows — the sketch state as pure integers,
    deterministic and hash-comparable against the SQL mirror."""
    ranks, counts = np.unique(regs, return_counts=True)
    return pa.table({"rank": pa.array(ranks.astype(np.int64), pa.int64()),
                     "n_registers": pa.array(counts.astype(np.int64),
                                             pa.int64())})
