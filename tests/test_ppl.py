"""Bigram-LM perplexity scorer — filter arm, cap determinism, and a
pure-python oracle for the quantized NLL (the SQL mirror is covered in
test_entry_queries.py; this pins the engine against independent code).
"""

import math
import re

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from kmcp_ray import ppl

SF = "/root/testdata/sf0.001"


def _docs_ds():
    import ray.data
    return ray.data.read_parquet(f"{SF}/documents.parquet",
                                 columns=["doc_id", "text"])


def _ref_ds():
    def f(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        return t.filter(pa.array(ids % 10 == 0))
    return _docs_ds().map_batches(f, batch_format="pyarrow",
                                  zero_copy_batch=True)


def _oracle(texts_by_id, ref_ids):
    tok = re.compile(r"[a-z0-9]+")
    uni, bi = {}, {}
    for i in ref_ids:
        ts = tok.findall((texts_by_id[i] or "").lower())
        for w in ts:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(ts, ts[1:]):
            bi[(a, b)] = bi.get((a, b), 0) + 1
    V = len(uni)

    def qlog(x):
        return math.floor(math.log(x) * 1e6)

    out = {}
    for i, txt in texts_by_id.items():
        ts = tok.findall((txt or "").lower())
        s, n = 0, 0
        for a, b in zip(ts, ts[1:]):
            s += qlog(bi.get((a, b), 0) + 1) - qlog(uni.get(a, 0) + V)
            n += 1
        out[i] = (n, -s)
    return out


def test_nll_scores_match_pure_python(ray_session):
    t = pq.read_table(f"{SF}/documents.parquet",
                      columns=["doc_id", "text"])
    texts = dict(zip(t.column("doc_id").to_pylist(),
                     t.column("text").to_pylist()))
    want = _oracle(texts, [i for i in texts if i % 10 == 0])
    lm = ppl.fit_bigram_lm(_ref_ds())
    got = ppl.nll_scores(_docs_ds(), lm).take_all()
    assert len(got) == len(texts)
    for r in got:
        n, s = want[r["doc_id"]]
        assert (r["n_bigrams"], r["nll_u"]) == (n, s)


def test_perplexity_filter_threshold(ray_session):
    lm = ppl.fit_bigram_lm(_ref_ds())
    scored = ppl.nll_scores(_docs_ds(), lm).take_all()
    avg = [r["nll_u"] / r["n_bigrams"] for r in scored
           if r["n_bigrams"] > 0]
    cut = int(np.median(avg))
    kept = ppl.perplexity_filter(_docs_ds(), lm, cut).take_all()
    want = {r["doc_id"] for r in scored
            if r["n_bigrams"] > 0 and r["nll_u"] <= cut * r["n_bigrams"]}
    assert {r["doc_id"] for r in kept} == want
    assert 0 < len(kept) < len(scored)


def test_vocab_caps_deterministic(ray_session):
    """Capped fits keep the top-(cnt desc, key asc) entries and stay
    reproducible; scoring still emits every row."""
    a = ppl.fit_bigram_lm(_ref_ds(), max_vocab=20, max_bigrams=60)
    b = ppl.fit_bigram_lm(_ref_ds(), max_vocab=20, max_bigrams=60)
    assert np.array_equal(a["uni_keys"], b["uni_keys"])
    assert np.array_equal(a["bi_cnts"], b["bi_cnts"])
    full = ppl.fit_bigram_lm(_ref_ds())
    assert len(a["uni_keys"]) == min(20, len(full["uni_keys"]))
    assert len(a["bi_keys"]) == min(60, len(full["bi_keys"]))
    assert len(a["uni_keys"]) < len(full["uni_keys"])   # cap actually cut
    assert a["V"] == full["V"]          # V is the TRUE vocab size
    out = ppl.nll_scores(_docs_ds(), a).take_all()
    assert len(out) == 500
