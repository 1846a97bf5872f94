import numpy as np
import pyarrow as pa
import pytest

from kmcp_ray import substr, testgen
from kmcp_ray.config import DedupConfig
from kmcp_ray.pipeline import dedup_pipeline
from kmcp_ray.profile import abundance, cluster_profile

CFG = DedupConfig(num_partitions=8)


def test_kmp_contains():
    a = np.array([1, 2, 3, 4, 5], dtype=np.uint64)
    assert substr._kmp_contains(np.array([2, 3, 4], dtype=np.uint64), a)
    assert substr._kmp_contains(a, a)
    assert not substr._kmp_contains(np.array([2, 4], dtype=np.uint64), a)
    assert not substr._kmp_contains(np.array([1, 2, 3, 4, 5, 6], dtype=np.uint64), a)
    assert not substr._kmp_contains(np.empty(0, np.uint64), a)


def test_substr_containment_pairs(ray_session):
    import ray.data
    base = " ".join(f"w{i}" for i in range(30))
    contiguous = " ".join(base.split()[5:22])            # true substring
    scattered = " ".join(base.split()[5:22][::-1])       # same tokens reversed
    texts = [base, contiguous, scattered,
             "nothing in common with the others at all here"]
    tbl = pa.table({"doc_id": pa.array(range(4), pa.int64()),
                    "text": pa.array(texts, pa.string())})
    out = substr.substr_containment_pairs(
        ray.data.from_arrow(tbl), CFG).to_pandas()
    vias = {(a, b): v for a, b, v in zip(out.id_a, out.id_b, out.via)}
    assert vias.get((0, 1)) == "substr"
    # reversed tokens: set-contained but NOT a contiguous substring
    if (0, 2) in vias:
        assert vias[(0, 2)] == "contain"


def test_cluster_profile_and_abundance(ray_session):
    import ray.data
    table, planted, _ = testgen.make_pairs_corpus(n=300, seed=5, cfg=CFG)
    res = dedup_pipeline(ray.data.from_arrow(table), CFG)
    prof = cluster_profile(res.assignments, res.edges, res.cluster_map) \
        .to_pandas()
    assert prof["size"].sum() == table.num_rows
    multi = prof[prof["size"] > 1]
    assert len(multi) > 0
    assert (multi["n_edges"] > 0).all()
    assert ((prof["p90_score"] >= 0) & (prof["p90_score"] <= 1)).all()
    ab = abundance(res.assignments).to_pandas()
    assert ab["fraction"].sum() == pytest.approx(1.0)


def test_window_sum_prefilter_never_rejects_true_substring():
    """The rolling-sum prefilter is a sound screen: every true
    contiguous occurrence has a matching window sum, so composing it
    with KMP changes nothing but the Python-loop volume."""
    import numpy as np
    from kmcp_ray.substr import _kmp_contains, _window_sum_hit
    rng = np.random.default_rng(7)
    rejected_nonsub = 0
    for _ in range(500):
        hay = rng.integers(0, 2**63, size=int(rng.integers(3, 60)),
                           dtype=np.uint64)
        if rng.random() < 0.5:
            i = int(rng.integers(0, len(hay)))
            j = int(rng.integers(i + 1, len(hay) + 1))
            needle = hay[i:j].copy()
        else:
            needle = rng.integers(0, 2**63, size=int(rng.integers(1, 10)),
                                  dtype=np.uint64)
        truth = _kmp_contains(needle, hay)
        pre = _window_sum_hit(needle, hay)
        if truth:
            assert pre, "prefilter rejected a true substring"
        elif not pre:
            rejected_nonsub += 1
    assert rejected_nonsub > 0      # the screen actually screens
