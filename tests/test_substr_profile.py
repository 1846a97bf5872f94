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
