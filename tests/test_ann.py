import numpy as np
import pyarrow as pa
import pytest

from kmcp_ray import ann
from kmcp_ray.config import DedupConfig


def _emb_table(n=200, d=16, seed=5, planted=8):
    rng = np.random.default_rng(seed)
    m = rng.standard_normal((n, d))
    # plant near-dup pairs: rows (i, n-planted+i) nearly identical
    for i in range(planted):
        m[n - planted + i] = m[i] + 0.01 * rng.standard_normal(d)
    return pa.table({"vec_id": pa.array(range(n), pa.int64()),
                     "embedding": pa.array([list(map(float, r)) for r in m],
                                           pa.list_(pa.float32()))}), m


def _brute_pairs(m, threshold):
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    sims = mn @ mn.T
    ii, jj = np.nonzero(np.triu(sims >= threshold, k=1))
    return {(int(a), int(b)) for a, b in zip(ii, jj)}


def test_topk_cosine_matches_numpy(ray_session):
    import ray.data
    tbl, m = _emb_table()
    mn = (m / np.linalg.norm(m, axis=1, keepdims=True))
    q_ids = np.array([0, 1, 2], dtype=np.int64)
    out = ann.topk_cosine(ray.data.from_arrow(tbl), (q_ids, m[:3]), k=4) \
        .to_pandas()
    for q in q_ids:
        sims = mn[q] @ mn.T
        sims[q] = -np.inf
        order = np.lexsort((np.arange(len(sims)), -sims))[:4]
        got = out[out.query_id == q].sort_values("rank").neighbor_id.tolist()
        assert got == order.tolist(), f"query {q}"


def test_cosine_pairs_exact(ray_session):
    import ray.data
    tbl, m = _emb_table()
    want = _brute_pairs(np.stack([np.array(v, dtype=np.float64) for v in
                                  tbl.column("embedding").to_pylist()]), 0.95)
    out = ann.cosine_pairs(ray.data.from_arrow(tbl), 0.95).to_pandas()
    got = {(a, b) for a, b in zip(out.id_a, out.id_b)}
    assert got == want and len(got) >= 8


def test_lsh_cosine_pairs_high_recall_on_near_dups(ray_session):
    import ray.data
    tbl, m = _emb_table()
    m32 = np.stack([np.array(v, dtype=np.float64) for v in
                    tbl.column("embedding").to_pylist()])
    want = _brute_pairs(m32, 0.95)
    out = ann.lsh_cosine_pairs(ray.data.from_arrow(tbl), 0.95,
                               DedupConfig(num_partitions=8)).to_pandas()
    got = {(a, b) for a, b in zip(out.id_a, out.id_b)}
    assert got <= want                     # no false positives (verified)
    recall = len(got & want) / len(want)
    assert recall >= 0.9, f"recall {recall}"


def test_topk_ties_prefer_smaller_id(ray_session):
    """ADVICE r1 regression: equal-sim neighbors at the k-th boundary
    must resolve to the smaller neighbor id, batch-deterministically."""
    import ray.data
    from kmcp_ray import ann
    # 6 identical vectors -> every sim tied at 1.0; k=3 must pick ids 1,2,3
    vecs = [[1.0, 0.0, 0.0]] * 6
    tbl = pa.table({"vec_id": pa.array(range(6), pa.int64()),
                    "embedding": pa.array(vecs, pa.list_(pa.float64()))})
    ds = ray.data.from_arrow(tbl)
    q = (np.array([0], dtype=np.int64), np.array([[1.0, 0.0, 0.0]]))
    out = ann.topk_cosine(ds, q, k=3).to_pandas().sort_values("rank")
    assert out["neighbor_id"].tolist() == [1, 2, 3]


def test_lsh_exchange_attach_path_matches_broadcast(ray_session):
    """Forcing the partitioned-attach verification path (as if the
    matrix were too big to broadcast) must give the same pairs."""
    import dataclasses
    import ray.data
    from kmcp_ray import ann
    from kmcp_ray.config import DedupConfig
    rng = np.random.default_rng(5)
    base = rng.standard_normal((40, 16))
    near = base[:10] + 0.02 * rng.standard_normal((10, 16))
    mat = np.vstack([base, near])
    tbl = pa.table({"vec_id": pa.array(range(len(mat)), pa.int64()),
                    "embedding": pa.array(list(mat),
                                          pa.list_(pa.float64()))})
    ds = ray.data.from_arrow(tbl)
    cfg_b = DedupConfig(num_partitions=8)
    cfg_j = dataclasses.replace(cfg_b, broadcast_verify_rows=0)
    got_b = ann.lsh_cosine_pairs(ds, 0.9, cfg_b).to_pandas() \
        .sort_values(["id_a", "id_b"]).reset_index(drop=True)
    got_j = ann.lsh_cosine_pairs(ds, 0.9, cfg_j).to_pandas() \
        .sort_values(["id_a", "id_b"]).reset_index(drop=True)
    assert got_b[["id_a", "id_b"]].values.tolist() == \
        got_j[["id_a", "id_b"]].values.tolist()
    assert len(got_b) >= 10      # the 10 planted near-dups all found
