"""Count-min sketch: mergeable token-frequency counters over a Dataset.

kmcp keeps per-target match counters in fixed-size arrays that workers
merge additively (kmcp/cmd/profile.go per-target accumulators, T5;
semantics re-derived).  At open-vocabulary corpus scale the analogue
for "how often does each token occur across 10^12 rows" is a mergeable
counter sketch: the count-min sketch (Cormode & Muthukrishnan 2005,
public algorithm).  ``d`` hash rows × ``w`` buckets of int64 counters;
a point estimate is the MIN over the d counters that a token maps to —
always >= the true count, and <= true + (N/w) * e with probability
1 - exp(-d).

Determinism contract (same as hll.py): row hashes derive from either
the vectorized SipHash+splitmix64 family (production) or the
md5-prefix family shared with the DuckDB oracles
(``('0x' || substr(md5(tok || '|' || r), 1, 16))::UBIGINT % w``) — with
md5 the ENTIRE counter state is integer-exact and SQL-mirrorable, so
the driver hash-checks the sketch itself, not just derived numbers.

Execution shape: each batch reduces to ONE d*w int64 counter row
(map-side combine; counters merge by element-wise SUM), so nothing
shuffles and the driver folds one small row per block — the same
one-row-per-block reduce as shingle_hll.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from kmcp_ray import hashing

#: seed family for the production (sip+splitmix) row hashes
_ROW_SEED = np.uint64(0x6C62272E07BB0142)


def _row_hashes(toks: np.ndarray, d: int, token_hash: str) -> np.ndarray:
    """(d, n) uint64 hash matrix for n token strings.

    ``"sip"``: one vectorized SipHash pass, then d cheap splitmix64
    re-mixes (independent-enough rows, zero per-row string work).
    ``"md5"``: md5_lower64 of ``tok + "|" + r`` per row — the exact
    expression the SQL mirror evaluates; Python-loop md5, oracle-scale
    only."""
    if token_hash == "md5":
        return np.stack([hashing.md5_lower64(
            np.array([t + "|" + str(r) for t in toks], dtype=object))
            for r in range(d)])
    base = hashing.hash_tokens(toks)
    seeds = hashing.splitmix64(np.arange(d, dtype=np.uint64) + _ROW_SEED)
    return hashing.splitmix64(base[None, :] ^ seeds[:, None])


def _counters(toks: np.ndarray, counts: np.ndarray, d: int, w: int,
              token_hash: str) -> np.ndarray:
    """(d, w) int64 counter block for distinct tokens + multiplicities."""
    acc = np.zeros((d, w), dtype=np.int64)
    if len(toks) == 0:
        return acc
    hv = _row_hashes(toks, d, token_hash)
    buckets = (hv % np.uint64(w)).astype(np.int64)
    for r in range(d):
        acc[r] += np.bincount(buckets[r], weights=counts,
                              minlength=w).astype(np.int64)
    return acc


def token_cms(ds, text_col: str = "text", *, d: int = 4, w: int = 2048,
              token_hash: str = "sip"):
    """Corpus-wide token-occurrence count-min sketch.

    Returns the (d, w) int64 counter matrix.  Per batch: tokenize →
    distinct-token multiplicities → one counter row; the driver
    element-wise-sums one row per block (mergeable: two corpora's
    sketches add)."""
    from kmcp_ray import text

    def partial(t: pa.Table) -> pa.Table:
        toks, _rows, _n = text.tokenize(t.column(text_col))
        if len(toks):
            u, cnt = np.unique(toks, return_counts=True)
        else:
            u, cnt = np.empty(0, object), np.empty(0, np.int64)
        block = _counters(u, cnt.astype(np.int64), d, w, token_hash)
        return pa.table({"cms": pa.array([block.tobytes()], pa.binary())})

    acc = np.zeros((d, w), dtype=np.int64)
    rows = ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
    for b in rows.iter_batches(batch_size=1024, batch_format="pyarrow"):
        for blob in b.column("cms"):
            acc += np.frombuffer(blob.as_py(),
                                 dtype=np.int64).reshape(d, w)
    return acc


def point_estimate(cms: np.ndarray, tokens, token_hash: str = "sip"
                   ) -> np.ndarray:
    """CMS point estimates (>= true count) for an array of tokens."""
    toks = np.asarray(tokens, dtype=object)
    if len(toks) == 0:
        return np.empty(0, np.int64)
    d, w = cms.shape
    hv = _row_hashes(toks, d, token_hash)
    buckets = (hv % np.uint64(w)).astype(np.int64)
    ests = np.stack([cms[r][buckets[r]] for r in range(d)])
    return ests.min(axis=0)


def counter_table(cms: np.ndarray) -> pa.Table:
    """Non-zero sketch state as (row, bucket, cnt) integer rows —
    deterministic and hash-comparable against the SQL mirror."""
    r, b = np.nonzero(cms)
    return pa.table({"row": pa.array(r.astype(np.int64), pa.int64()),
                     "bucket": pa.array(b.astype(np.int64), pa.int64()),
                     "cnt": pa.array(cms[r, b], pa.int64())})
