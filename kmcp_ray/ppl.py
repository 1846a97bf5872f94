"""Bigram-LM perplexity scoring — the CCNet-style quality signal
(Wenzek et al. 2020: score corpus text under an LM fit on a curated
reference; keep the low-perplexity tail).  Beyond-reference operator;
the reference's closest analogue is the per-worker FPR score table
(kmcp/cmd/util-fpr.go:77-191 — broadcast scoring state, semantics
re-derived).

Model: add-V smoothed bigram NLL with quantized integer log-probs.
For each adjacent token pair (w1, w2) the contribution is

    qlog(c_bi(w1 w2) + 1) - qlog(c_uni(w1) + V),   qlog(x) = floor(ln(x) * 1e6)

summed per document as exact int64 — quantizing each log BEFORE the
sum makes the reduction order-independent and SQL-mirrorable (the same
fixed-point discipline as the rest of the repo).  ``nll_u`` is the
negated sum (higher = more surprising under the reference LM).

Scale shape: the fit is one map pass emitting DISTINCT (w1, w2, cnt)
partials per batch (bounded by batch vocab, not tokens) into a
vocab-sized groupby; the count tables collect to the driver and
broadcast once (``ray.put``) — vocab-bounded, never corpus-bounded,
with optional ``max_vocab``/``max_bigrams`` deterministic (cnt desc,
key asc) caps for open-vocabulary corpora.  Scoring is one stateless
map pass: per-batch np.unique over bigram strings, ONE searchsorted
of the batch-distinct keys against the broadcast table, bincount by
row id.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from kmcp_ray import text

#: fixed-point scale for quantized log-probs.
_Q = 1_000_000.0


def _qlog(x: np.ndarray) -> np.ndarray:
    return np.floor(np.log(x.astype(np.float64)) * _Q).astype(np.int64)


def _batch_bigrams(t: pa.Table, text_col: str):
    """Batch-DISTINCT bigram structure — no per-occurrence strings.

    Returns ``(vocab U-array, dw1, dw2 (distinct bigram token codes),
    dcnt, inv (occurrence -> distinct idx), rows, n_rows)``; strings
    are materialized only at the distinct level by callers."""
    toks, rows, n = text.tokenize(t.column(text_col))
    empty = np.empty(0, dtype=np.int64)
    if len(toks) < 2:
        return (np.empty(0, dtype=str), empty, empty, empty, empty,
                empty, n)
    adj = rows[1:] == rows[:-1]
    u, codes = np.unique(toks.astype(str), return_inverse=True)
    m = np.int64(len(u))
    key = codes[:-1][adj] * m + codes[1:][adj]
    uk, inv, dcnt = np.unique(key, return_inverse=True,
                              return_counts=True)
    return u, uk // m, uk % m, dcnt.astype(np.int64), inv, \
        rows[:-1][adj], n


def _bi_strings(u: np.ndarray, dw1: np.ndarray,
                dw2: np.ndarray) -> np.ndarray:
    """'w1 w2' strings for the DISTINCT bigrams only."""
    return np.char.add(np.char.add(u[dw1], " "), u[dw2])


def fit_bigram_lm(ref_ds, text_col: str = "text",
                  max_vocab: int = None, max_bigrams: int = None):
    """Fit the reference LM: distinct-count partials -> one vocab-sized
    groupby -> driver-resident sorted lookup arrays.  Returns an opaque
    dict (sorted unigram/bigram key arrays + counts + vocab size V),
    ready to ``ray.put``."""
    def partial(t: pa.Table) -> pa.Table:
        toks, _, _ = text.tokenize(t.column(text_col))
        out = []
        if len(toks):
            uu, ucnt = np.unique(toks.astype(str), return_counts=True)
            out.append(pa.table({
                "w1": pa.array(uu, pa.string()),
                "w2": pa.array(np.full(len(uu), "", dtype=object),
                               pa.string()),
                "cnt": pa.array(ucnt.astype(np.int64), pa.int64())}))
        u, dw1, dw2, dcnt, _, _, _ = _batch_bigrams(t, text_col)
        if len(dcnt):
            out.append(pa.table({
                "w1": pa.array(u[dw1], pa.string()),
                "w2": pa.array(u[dw2], pa.string()),
                "cnt": pa.array(dcnt, pa.int64())}))
        if not out:
            return pa.table({"w1": pa.array([], pa.string()),
                             "w2": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64())})
        return pa.concat_tables(out)

    from ray.data.aggregate import Sum
    rows = ref_ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True) \
        .groupby(["w1", "w2"]).aggregate(Sum(on="cnt", alias_name="cnt")) \
        .take_all()
    uni = [(r["w1"], int(r["cnt"])) for r in rows if r["w2"] == ""]
    bi = [(r["w1"] + " " + r["w2"], int(r["cnt"]))
          for r in rows if r["w2"] != ""]

    def cap_sort(items, cap):
        if cap is not None and len(items) > cap:
            items = sorted(items, key=lambda kv: (-kv[1], kv[0]))[:cap]
        items.sort(key=lambda kv: kv[0])
        keys = np.array([k for k, _ in items], dtype=object)
        cnts = np.array([c for _, c in items], dtype=np.int64)
        return keys.astype(str), cnts

    uk, uc = cap_sort(uni, max_vocab)
    bk, bc = cap_sort(bi, max_bigrams)
    return {"uni_keys": uk, "uni_cnts": uc,
            "bi_keys": bk, "bi_cnts": bc, "V": len(uni)}


def _lookup(keys_sorted: np.ndarray, cnts: np.ndarray,
            probe: np.ndarray) -> np.ndarray:
    """count per probe key, 0 where absent (one searchsorted)."""
    if len(keys_sorted) == 0 or len(probe) == 0:
        return np.zeros(len(probe), dtype=np.int64)
    pos = np.searchsorted(keys_sorted, probe)
    pos = np.minimum(pos, len(keys_sorted) - 1)
    hit = keys_sorted[pos] == probe
    out = np.where(hit, cnts[pos], 0)
    return out.astype(np.int64)


def nll_scores(ds, lm: dict, id_col: str = "doc_id",
               text_col: str = "text"):
    """(id, n_bigrams, nll_u) per document — every input row emitted
    (zero-bigram docs score 0).  One stateless map pass against the
    broadcast LM."""
    ref = ray.put(lm)

    def score(t: pa.Table) -> pa.Table:
        m = ray.get(ref)
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        u, dw1, dw2, _, inv, rows, n = _batch_bigrams(t, text_col)
        nbg = np.bincount(rows, minlength=n).astype(np.int64) \
            if len(rows) else np.zeros(n, dtype=np.int64)
        nll = np.zeros(n, dtype=np.int64)
        if len(inv):
            # lookups at the batch-DISTINCT level, fanned out via inv
            c_bi = _lookup(m["bi_keys"], m["bi_cnts"],
                           _bi_strings(u, dw1, dw2))
            c_w1 = _lookup(m["uni_keys"], m["uni_cnts"], u)[dw1]
            dcontrib = _qlog(c_bi + 1) - _qlog(c_w1 + m["V"])
            contrib = dcontrib[inv]
            np.subtract.at(nll, rows, contrib)
        return pa.table({id_col: pa.array(ids),
                         "n_bigrams": pa.array(nbg, pa.int64()),
                         "nll_u": pa.array(nll, pa.int64())})

    return ds.map_batches(score, batch_format="pyarrow",
                          zero_copy_batch=True)


def perplexity_filter(ds, lm: dict, max_avg_nll_u: int,
                      id_col: str = "doc_id", text_col: str = "text"):
    """Keep documents whose mean per-bigram NLL is at or below the
    threshold (zero-bigram docs are dropped — no evidence).  The CCNet
    keep-the-head cut, composed from :func:`nll_scores`."""
    scored = nll_scores(ds, lm, id_col=id_col, text_col=text_col)

    def keep(t: pa.Table) -> pa.Table:
        n = t.column("n_bigrams").to_numpy(zero_copy_only=False)
        s = t.column("nll_u").to_numpy(zero_copy_only=False)
        with np.errstate(divide="ignore", invalid="ignore"):
            ok = (n > 0) & (s <= max_avg_nll_u * n)
        return t.filter(pa.array(ok))

    return scored.map_batches(keep, batch_format="pyarrow",
                              zero_copy_batch=True)
