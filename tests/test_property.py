"""Property-based tests (hypothesis) for the pure vectorized kernels —
each is checked against a direct pure-Python reference on randomized
inputs, covering the edge layouts example-based tests miss (empty rows,
single-token docs, all-identical tokens, adversarial segment shapes).
Only driver-side numpy/Arrow kernels are exercised here (no Ray), so
hundreds of examples stay fast."""

import re
from itertools import combinations

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from kmcp_ray import curate, hashing, textops
from kmcp_ray.buckets import _pairs_within_segments

# small vocab → dense collisions, the interesting regime
_token = st.sampled_from(["a", "bb", "ccc", "the", "x1", "longword"])
_text = st.lists(_token, min_size=0, max_size=12).map(" ".join)
_texts = st.lists(_text, min_size=0, max_size=8)


def _tok(s):
    return re.findall("[a-z0-9]+", s.lower())


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=6), min_size=0,
                max_size=8))
def test_pairs_within_segments_matches_combinations(seg_lens):
    starts = np.concatenate(([0], np.cumsum(seg_lens)))[:-1] \
        if seg_lens else np.empty(0, np.int64)
    ends = starts + np.asarray(seg_lens, dtype=np.int64) \
        if seg_lens else np.empty(0, np.int64)
    f, s = _pairs_within_segments(starts, ends)
    got = sorted(zip(f.tolist(), s.tolist()))
    want = sorted((i, j)
                  for a, b in zip(starts.tolist(), ends.tolist())
                  for i, j in combinations(range(a, b), 2))
    assert got == want


@settings(max_examples=150, deadline=None)
@given(_texts, st.integers(min_value=1, max_value=4))
def test_shingle_strings_matches_python(texts, k):
    sh, rows, n = textops.shingle_strings(pa.array(texts, pa.string()), k)
    assert n == len(texts)
    got = sorted(zip(rows.tolist(), sh.tolist()))
    want = []
    for i, s in enumerate(texts):
        tk = _tok(s)
        if len(tk) >= k:
            want += [(i, " ".join(tk[j:j + k]))
                     for j in range(len(tk) - k + 1)]
        elif tk:
            want.append((i, " ".join(tk)))
    assert got == sorted(want)


@settings(max_examples=150, deadline=None)
@given(_texts, st.integers(min_value=2, max_value=4))
def test_doc_windows_matches_python(texts, w):
    ids = np.arange(10, 10 + len(texts), dtype=np.int64)
    flat, rows, row_starts, h, packed, win_row = curate._doc_windows(
        ids, pa.array(texts, pa.string()), w)
    # tokenization layout
    want_tok = [(i, t) for i, s in enumerate(texts) for t in _tok(s)]
    assert list(zip(rows.tolist(), flat.tolist())) == want_tok
    # windows: non-overlapping full w-token strides, in order
    want_win = []
    for i, s in enumerate(texts):
        tk = _tok(s)
        for j in range(len(tk) // w):
            want_win.append((int(ids[i]) << curate.SPAN_WIDX_BITS | j,
                             " ".join(tk[j * w:(j + 1) * w])))
    assert packed.tolist() == [p for p, _ in want_win]
    assert np.array_equal(
        h, hashing.hash_tokens(np.array([t for _, t in want_win],
                                        dtype=object)))


@settings(max_examples=100, deadline=None)
@given(_texts, st.integers(min_value=2, max_value=3), st.data())
def test_rebuild_clean_matches_python(texts, w, data):
    ids = np.arange(5, 5 + len(texts), dtype=np.int64)
    # choose a random subset of each doc's windows to remove
    rdoc, rwid = [], []
    for i, s in enumerate(texts):
        nw = len(_tok(s)) // w
        for j in range(nw):
            if data.draw(st.booleans()):
                rdoc.append(int(ids[i]))
                rwid.append(j)
    clean, nrem = curate._rebuild_clean(
        ids, pa.array(texts, pa.string()), w,
        np.array(rdoc, np.int64), np.array(rwid, np.int64))
    for i, s in enumerate(texts):
        tk = _tok(s)
        gone = {j for d, j in zip(rdoc, rwid) if d == ids[i]}
        keep = [t for p, t in enumerate(tk)
                if not (p // w in gone and p < (len(tk) // w) * w)]
        assert clean[i] == " ".join(keep)
        assert nrem[i] == len(gone)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**62), min_size=1,
                max_size=50))
def test_sample_hash32_scalar_reference(ids):
    got = curate.sample_hash32(np.array(ids, dtype=np.int64))
    M32 = 0xFFFFFFFF
    for x, g in zip(ids, got.tolist()):
        h = (x * curate.SAMPLE_MULT_1) & M32
        h ^= h >> 16
        h = (h * curate.SAMPLE_MULT_2) & M32
        h ^= h >> 16
        assert g == h


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1),
                min_size=1, max_size=50))
def test_popcount64_matches_python(xs):
    got = hashing.popcount64(np.array(xs, dtype=np.uint64))
    assert got.tolist() == [bin(x).count("1") for x in xs]
