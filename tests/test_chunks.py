"""Chunk slider (M6), multi-k sketch/search (M5) and long-document
partial-overlap detection."""

import numpy as np
import pyarrow as pa
import pytest

from kmcp_ray import testgen, text
from kmcp_ray.chunks import (chunk_slider, chunk_slider_batch,
                             longdoc_overlap_pairs, search_multi_k,
                             split_chunk_col)
from kmcp_ray.config import DedupConfig

CFG = DedupConfig(num_partitions=8)


def _tbl(texts):
    return pa.table({"doc_id": pa.array([f"d{i}" for i in range(len(texts))],
                                        pa.string()),
                     "text": pa.array(texts, pa.string())})


def test_chunk_slider_math_and_text():
    toks = [f"w{i:03d}" for i in range(25)]
    t = chunk_slider_batch(_tbl([" ".join(toks), "a b", ""]),
                           id_col="doc_id", text_col="text",
                           chunk_tokens=10, overlap=2)
    df = t.to_pandas()
    d0 = df[df.doc_id == "d0"]
    # n = ceil((25-2)/(10-2)) = 3
    assert d0.n_chunks.tolist() == [3, 3, 3]
    assert d0.text.tolist() == [" ".join(toks[0:10]), " ".join(toks[8:18]),
                                " ".join(toks[16:25])]
    assert d0.chunk_id.tolist() == ["d0#0/3", "d0#1/3", "d0#2/3"]
    # short + empty rows: single chunk
    assert df[df.doc_id == "d1"].text.tolist() == ["a b"]
    assert df[df.doc_id == "d2"].n_chunks.tolist() == [1]


def test_split_chunk_col(ray_session):
    import ray.data
    m = ray.data.from_items([{"target": "doc7#2/5", "x": 1},
                             {"target": "d#0/1", "x": 2}])
    df = split_chunk_col(m, "target").to_pandas().sort_values("x")
    assert df.target.tolist() == ["doc7", "d"]
    assert df.chunk.tolist() == [2, 0]
    assert df.nchunk.tolist() == [5, 1]


def test_multi_k_sketch_is_union_of_per_k():
    texts = pa.array(["alpha beta gamma delta epsilon zeta", "x", ""])
    ks = (2, 4)
    got = text.multi_k_shingle_sets(texts, ks, int((1 << 64) - 1))
    for row in range(3):
        union = np.unique(np.concatenate([
            text.shingle_sets(texts, k, int((1 << 64) - 1))["hashes"][
                text.shingle_sets(texts, k, int((1 << 64) - 1))["offsets"][row]:
                text.shingle_sets(texts, k, int((1 << 64) - 1))["offsets"][row + 1]]
            for k in ks]))
        s, e = got["offsets"][row], got["offsets"][row + 1]
        assert np.array_equal(got["hashes"][s:e], union)


def test_sketcher_multi_k_config_roundtrip():
    cfg = DedupConfig(shingle_ks=(2, 3))
    cfg2 = DedupConfig.from_json(cfg.to_json())
    assert cfg2 == cfg
    texts = pa.array(["one two three four five six seven"])
    ss = text.shingle_sets_sketcher(texts, cfg)
    want = text.multi_k_shingle_sets(texts, (2, 3), cfg.max_hash)
    assert np.array_equal(ss["hashes"], want["hashes"])


def test_search_multi_k_fallback(ray_session):
    """A query sharing only a 3-token run with its target matches at
    k=3 but not k=5 — the smaller-k retry must catch it."""
    import ray.data
    vocab = testgen.make_vocab(300, seed=5)
    rng = np.random.default_rng(5)
    ref_toks = [vocab[i] for i in rng.integers(0, 300, 40)]
    refs = ray.data.from_arrow(_tbl([" ".join(ref_toks)]))
    q_exact = " ".join(ref_toks)                       # matches at k=5
    run = ref_toks[10:13]                              # 3-token shared run
    other = [vocab[i] for i in rng.integers(0, 300, 20)]
    q_partial = " ".join(other[:10] + run + other[10:])
    queries = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(["qe", "qp"], pa.string()),
        "text": pa.array([q_exact, q_partial], pa.string())}))
    out = search_multi_k(queries, refs, CFG, ks=(5, 3),
                         min_qcov=0.01, min_shared=1,
                         max_fpr=1.0).to_pandas()
    by_q = {r.query: int(r.k) for r in out.itertuples()}
    assert by_q["qe"] == 5          # found at the largest k, no retry
    assert by_q["qp"] == 3          # zero hits at k=5, caught at k=3


def test_longdoc_partial_overlap_recall(ray_session):
    """Planted contiguous ~30% slices: whole-doc Jaccard is far below
    dedup thresholds, chunked containment search must find every pair
    (recall >= 0.99) with no false positives among unrelated docs."""
    import ray.data
    tbl, planted = testgen.make_longdoc_corpus(n=40, seed=19)
    assert len(planted) >= 8
    sds = ray.data.from_arrow(pa.table({
        "doc_id": pa.compute.cast(tbl["doc_id"], pa.string()),
        "text": tbl["text"]}))
    pairs = longdoc_overlap_pairs(sds, CFG, chunk_tokens=64,
                                  min_qcov=0.8, min_shared=4,
                                  min_chunk_hits=1).to_pandas()
    got = {frozenset((int(a), int(b)))
           for a, b in zip(pairs.id_a, pairs.id_b)}
    want = {frozenset(p) for p in planted}
    recall = len(got & want) / len(want)
    assert recall >= 0.99, f"recall {recall} missing {want - got}"
    false_pos = got - want
    assert not false_pos, f"false positives: {false_pos}"
