"""DSIR-style importance resampling: select raw documents that look
like a small target corpus.

Public algorithm: Data Selection via Importance Resampling (Xie et al.,
NeurIPS 2023) — represent each document by hashed n-gram bucket counts,
fit unigram bucket distributions for the raw and target corpora, score
each document by the log importance weight
``sum_b c_doc[b] * (ln p_target[b] - ln p_raw[b])`` (add-one smoothed),
and keep high scorers.  kmcp analogue: the FracMinHash scale filter
keeps a deterministic, hash-defined subset of an open-domain stream
(kmcp/cmd/compute.go sketch scale filter; semantics re-derived) — here
the keep rule is distribution-matching instead of uniform.

Scale shape (the part that matters at 10^12 rows):

* Distribution fitting is ONE ``map_batches`` pass emitting one
  fixed-size ``int64[buckets]`` partial row per block for BOTH corpora
  at once (target rows identified by a column predicate) — no shuffle,
  driver folds ``blocks × buckets`` integers, independent of corpus
  size (same one-row-per-block reduce as cms.py / hll.py).
* The bucket-weight table (``buckets`` int64s) is broadcast via
  ``ray.put`` once; scoring is a second stateless ``map_batches`` pass
  (tokenize → hash → bincount → per-doc weighted sum), no shuffle.

Determinism contract (same as cms.py): fixed-point integer weights
``w[b] = floor(1e6 * (ln((t[b]+1)/(T+B)) - ln((r[b]+1)/(R+B))))`` make
per-doc scores exact int64 sums — associative, order-free, and
bit-identical to the DuckDB mirror (both engines call the same libm
``log`` on identically-rounded doubles; ``floor`` avoids the
numpy-banker's vs SQL-half-away ``round`` divergence).  Token→bucket
hashing follows the two-family convention: vectorized SipHash
(production) or md5-prefix (``('0x'||substr(md5(tok),1,16))::UBIGINT``,
oracle-mirrorable).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from kmcp_ray import hashing

#: fixed-point scale for the integer log-ratio weights
WEIGHT_SCALE = 1_000_000


def _token_buckets(toks: np.ndarray, buckets: int,
                   token_hash: str) -> np.ndarray:
    if token_hash == "md5":
        hv = hashing.md5_lower64(toks)
    else:
        hv = hashing.hash_tokens(toks)
    return (hv % np.uint64(buckets)).astype(np.int64)


def bucket_count_pass(ds, target_mask_fn, text_col: str = "text", *,
                      buckets: int = 1024, token_hash: str = "sip"):
    """One pass → (raw_counts, target_counts) int64[buckets].

    ``target_mask_fn(table) -> bool ndarray`` marks the target rows
    (e.g. ``lang == 'en'``).  Each block reduces to a single
    2×buckets counter row; the driver folds one small row per block.
    """
    from kmcp_ray import text

    def partial(t: pa.Table) -> pa.Table:
        toks, rows, _n = text.tokenize(t.column(text_col))
        raw = np.zeros(buckets, dtype=np.int64)
        tgt = np.zeros(buckets, dtype=np.int64)
        if len(toks):
            b = _token_buckets(toks, buckets, token_hash)
            raw += np.bincount(b, minlength=buckets).astype(np.int64)
            mask = np.asarray(target_mask_fn(t), dtype=bool)[rows]
            if mask.any():
                tgt += np.bincount(b[mask], minlength=buckets
                                   ).astype(np.int64)
        return pa.table({"raw": [raw.tobytes()], "tgt": [tgt.tobytes()]})

    raw = np.zeros(buckets, dtype=np.int64)
    tgt = np.zeros(buckets, dtype=np.int64)
    folded = ds.map_batches(partial, batch_format="pyarrow")
    for row in folded.iter_rows():
        raw += np.frombuffer(row["raw"], dtype=np.int64)
        tgt += np.frombuffer(row["tgt"], dtype=np.int64)
    return raw, tgt


def dsir_weights(raw_counts: np.ndarray,
                 target_counts: np.ndarray) -> np.ndarray:
    """Fixed-point per-bucket importance weights (int64).

    ``floor(1e6 * (ln p_tgt[b] - ln p_raw[b]))`` with add-one smoothing
    over ``B`` buckets.  Integer so downstream sums are exact and
    SQL-mirrorable; monotone in the true log ratio.
    """
    B = len(raw_counts)
    R = float(raw_counts.sum()) + B
    T = float(target_counts.sum()) + B
    lr = (np.log((target_counts + 1.0) / T)
          - np.log((raw_counts + 1.0) / R))
    return np.floor(WEIGHT_SCALE * lr).astype(np.int64)


def dsir_select(ds, target_mask_fn, text_col: str = "text",
                id_col: str = "doc_id", *, buckets: int = 1024,
                token_hash: str = "sip", top_frac: float = 0.2):
    """Score every document by its integer DSIR importance weight and
    keep the ``top_frac`` highest scorers (the deterministic rank
    variant of the paper's Gumbel-top-k resampling; ties break on
    ``id_col`` so output is reproducible and SQL-mirrorable).

    Returns a Dataset of ``(id_col, dsir_score:int64)`` for the kept
    rows, ascending by id.  Two streaming passes over the corpus, zero
    wide shuffles on payloads: the sort/limit ranking runs on the
    score table (16 B/row — at 10^12 rows swap the exact sort for a
    histogram-quantile threshold, cf. profile_em's p90 cut), and the
    weight table (``buckets`` int64s) is the only broadcast state.
    """
    import math
    import ray

    raw, tgt = bucket_count_pass(ds, target_mask_fn, text_col,
                                 buckets=buckets, token_hash=token_hash)
    w_ref = ray.put(dsir_weights(raw, tgt))

    def score(t: pa.Table) -> pa.Table:
        from kmcp_ray import text
        w = ray.get(w_ref)
        toks, rows, n = text.tokenize(t.column(text_col))
        scores = np.zeros(n, dtype=np.int64)
        n_tok = np.zeros(n, dtype=np.int64)
        if len(toks):
            b = _token_buckets(toks, buckets, token_hash)
            # float64 bincount sums stay exact below 2^53: |w| <= ~2e7,
            # tokens/doc << 2^45
            acc = np.bincount(rows, weights=w[b].astype(np.float64),
                              minlength=n)
            scores = acc.astype(np.int64)
            n_tok = np.bincount(rows, minlength=n)
        keep = n_tok > 0    # token-free rows are unscorable, not rank 0
        return pa.table({
            id_col: t.column(id_col).to_numpy(zero_copy_only=False)[keep],
            "dsir_score": scores[keep],
        })

    # score table: 16 B/row — materialize so count + rank don't
    # re-execute the corpus pass
    scored = ds.map_batches(score, batch_format="pyarrow").materialize()
    k = max(1, math.ceil(top_frac * scored.count()))
    top = scored.sort(["dsir_score", id_col],
                      descending=[True, False]).limit(k)
    return top.sort(id_col)


def dsir_select_oracle(toks_by_doc: dict, target_ids: set, *,
                       buckets: int = 1024, token_hash: str = "md5",
                       top_frac: float = 0.2) -> dict:
    """Pure-Python reference for tests: doc_id → score for kept docs."""
    import math
    raw = np.zeros(buckets, dtype=np.int64)
    tgt = np.zeros(buckets, dtype=np.int64)
    bmap = {}
    for did, toks in toks_by_doc.items():
        for tok in toks:
            if tok not in bmap:
                bmap[tok] = int(_token_buckets(
                    np.array([tok], dtype=object), buckets,
                    token_hash)[0])
            b = bmap[tok]
            raw[b] += 1
            if did in target_ids:
                tgt[b] += 1
    w = dsir_weights(raw, tgt)
    scores = {did: int(sum(int(w[bmap[t]]) for t in toks))
              for did, toks in toks_by_doc.items() if toks}
    k = max(1, math.ceil(top_frac * len(scores)))
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return dict(ranked)
