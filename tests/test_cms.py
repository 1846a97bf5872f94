"""Count-min sketch tests: over-estimate guarantee, exactness in the
no-collision regime, mergeability, and sip/md5 hash-family agreement
on sketch shape."""

import numpy as np
import pyarrow as pa
import ray.data

from kmcp_ray import cms


def _corpus(texts):
    return ray.data.from_arrow(
        pa.table({"text": pa.array(texts, pa.string())}))


def test_point_estimate_never_underestimates(ray_session):
    texts = [f"tok{i % 37} tok{i % 11} filler{i}" for i in range(500)]
    ds = _corpus(texts)
    sk = cms.token_cms(ds, d=4, w=256)          # small w forces collisions
    # exact truth
    from collections import Counter
    truth = Counter(t for s in texts for t in s.split())
    toks = np.array(sorted(truth), dtype=object)
    est = cms.point_estimate(sk, toks)
    true = np.array([truth[t] for t in toks])
    assert (est >= true).all()                  # CMS invariant
    assert sk.sum() == 4 * sum(truth.values())  # every row counts all N


def test_exact_when_no_collisions(ray_session):
    texts = ["alpha alpha beta", "beta gamma", "alpha"]
    sk = cms.token_cms(_corpus(texts), d=4, w=4096)
    est = cms.point_estimate(sk, np.array(
        ["alpha", "beta", "gamma"], dtype=object))
    assert list(est) == [3, 2, 1]


def test_sketches_merge_additively(ray_session):
    a = ["x y z"] * 10
    b = ["x q"] * 7
    sk_a = cms.token_cms(_corpus(a), d=4, w=512)
    sk_b = cms.token_cms(_corpus(b), d=4, w=512)
    sk_ab = cms.token_cms(_corpus(a + b), d=4, w=512)
    assert np.array_equal(sk_a + sk_b, sk_ab)


def test_md5_variant_matches_invariants(ray_session):
    texts = ["alpha beta beta", "gamma alpha"]
    sk = cms.token_cms(_corpus(texts), d=3, w=64, token_hash="md5")
    est = cms.point_estimate(sk, np.array(["beta", "alpha", "gamma"],
                                          dtype=object), token_hash="md5")
    assert (est >= np.array([2, 2, 1])).all()
    tbl = cms.counter_table(sk)
    assert int(pa.compute.sum(tbl.column("cnt")).as_py()) == 3 * 5
