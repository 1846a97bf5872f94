import numpy as np
import pyarrow as pa
import pytest

from kmcp_ray import textops
from kmcp_ray.hashing import popcount64


def _tbl(texts):
    return pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                     "text": pa.array(texts, pa.string())})


def test_token_count_batch():
    t = textops.token_count_batch(_tbl(["one two three", "", "  x  ", None]))
    assert t.column("n_tokens").to_pylist() == [3, 0, 1, 0]


def test_doc_stats_batch():
    t = textops.doc_stats_batch(_tbl(["aa bb aa", "xyz"]))
    assert t.column("n_tokens").to_pylist() == [3, 1]
    assert t.column("n_uniq_tokens").to_pylist() == [2, 1]
    assert t.column("sum_token_len").to_pylist() == [6, 3]
    assert t.column("n_chars_m").to_pylist() == [8, 3]


def test_quality_score_monotone_in_diversity():
    rich = "alpha beta gamma delta epsilon zeta eta theta " * 4
    poor = "spam " * 32
    t = textops.quality_score_batch(_tbl([rich, poor]))
    q = t.column("quality").to_pylist()
    assert q[0] > q[1]
    assert all(0.0 <= x <= 1.0 for x in q)


def test_simhash_near_dup_small_hamming():
    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = base.replace("lazy", "sleepy")
    far = "completely unrelated content about databases and query engines"
    sh = textops.simhash_batch(pa.array([base, near, far, ""]), k=3)
    d_near = popcount64(np.uint64(sh[0]) ^ np.uint64(sh[1]))
    d_far = popcount64(np.uint64(sh[0]) ^ np.uint64(sh[2]))
    assert d_near < d_far
    assert sh[3] == 0  # empty text → simhash 0


def test_winnow_fingerprints_substring_overlap():
    long = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12 w13 w14 w15 w16 w17 w18 w19 w20"
    sub = "w5 w6 w7 w8 w9 w10 w11 w12 w13 w14 w15"
    other = "z1 z2 z3 z4 z5 z6 z7 z8 z9 z10"
    vals, off = textops.winnow_batch(pa.array([long, sub, other]), k=3, w=4)
    f_long = set(vals[off[0]:off[1]].tolist())
    f_sub = set(vals[off[1]:off[2]].tolist())
    f_other = set(vals[off[2]:off[3]].tolist())
    # winnowing guarantee: fingerprints of a contained substring mostly
    # appear in the container's fingerprint set
    assert len(f_sub & f_long) / len(f_sub) >= 0.5
    assert not (f_sub & f_other)


def test_lang_id_markers():
    stage = textops.LangIdStage()
    t = stage(_tbl(["the cat and the dog in the house",
                    "der hund und die katze ist nicht da",
                    "le chat est dans la maison pour un jour",
                    "el perro es un animal para la casa",
                    "no markers here whatsoever",
                    "你好世界"]))
    pred = t.column("lang_pred").to_pylist()
    assert pred[:4] == ["en", "de", "fr", "es"]
    assert pred[5] == "zh"


def test_simhash_batch_composition_invariant():
    """ADVICE r1 regression: a document's simhash must not depend on
    which other rows (esp. trailing empty ones) share its batch."""
    doc = "the quick brown fox jumps over the lazy dog again today"
    alone = textops.simhash_batch(pa.array([doc]), k=3)[0]
    with_empty = textops.simhash_batch(pa.array([doc, ""]), k=3)[0]
    with_more = textops.simhash_batch(pa.array(["", doc, "", "x y"]), k=3)[1]
    assert alone == with_empty == with_more
    assert textops.simhash_batch(pa.array([""]), k=3)[0] == 0
