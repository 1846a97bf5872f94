"""Bloom filter tests: no false negatives, exact bit-state round trip,
and the over-drop-only relation to exact decontamination."""

import numpy as np
import pyarrow as pa
import ray.data

from kmcp_ray import bloom, curate, textops


def _docs(ids, texts):
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string())}))


def test_no_false_negatives(ray_session):
    texts = [f"w{i} w{i+1} w{i+2} w{i+3}" for i in range(50)]
    ds = _docs(list(range(50)), texts)
    words = bloom.shingle_bloom(ds, k=3, m_bits=1 << 14)
    sh, _r, _n = textops.shingle_strings(pa.array(texts, pa.string()), 3)
    assert bloom.contains(words, np.unique(sh)).all()


def test_bit_table_matches_positions(ray_session):
    texts = ["a b c d"]
    ds = _docs([0], texts)
    words = bloom.shingle_bloom(ds, k=3, m_bits=1 << 10, k_hashes=2,
                                token_hash="md5")
    sh, _r, _n = textops.shingle_strings(pa.array(texts, pa.string()), 3)
    pos = bloom._positions(np.unique(sh), 2, 1 << 10, "md5")
    want = np.unique(pos.ravel())
    got = bloom.bit_table(words).column("bit").to_numpy()
    assert np.array_equal(got, want)


def test_bloom_decontaminate_over_drops_only(ray_session):
    # eval docs share shingles with corpus docs 0..9; docs 100+ are clean
    ev = _docs([1000], ["shared one two three four"])
    corpus_texts = (["shared one two three extra"] * 10
                    + [f"clean{i} x{i} y{i} z{i}" for i in range(40)])
    corpus = _docs(list(range(50)), corpus_texts)
    exact = set(curate.decontaminate(corpus, ev, k=3)
                .to_pandas()["doc_id"])
    for m in (1 << 16, 1 << 8):    # large m ≈ exact; tiny m over-drops
        got = set(bloom.bloom_decontaminate(corpus, ev, k=3, m_bits=m)
                  .to_pandas()["doc_id"])
        assert got <= exact, m     # survivors never exceed exact's
    big = set(bloom.bloom_decontaminate(corpus, ev, k=3, m_bits=1 << 20)
              .to_pandas()["doc_id"])
    assert big == exact            # at 1M bits / ~120 shingles: no FPs
