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


def test_ivf_topk_exact_at_full_probe(ray_session):
    """nprobe == nlist probes every list, so IVF must equal the exact
    brute-force top-k row for row (the driver-oracle identity)."""
    import ray.data
    tbl, m = _emb_table()
    q_ids = np.arange(5, dtype=np.int64)
    q_mat = m[:5]
    ds = ray.data.from_arrow(tbl).repartition(4)
    exact = (ann.topk_cosine(ds, (q_ids, q_mat), k=5).to_pandas()
             .sort_values(["query_id", "rank"]).reset_index(drop=True))
    ivf = (ann.ivf_topk(ds, (q_ids, q_mat), k=5, nlist=8, nprobe=8)
           .to_pandas().sort_values(["query_id", "rank"])
           .reset_index(drop=True))
    assert exact.equals(ivf)


def test_ivf_topk_planted_neighbors_found_at_low_probe(ray_session):
    """A planted near-identical pair lands in the same k-means list, so
    even nprobe=1 must return the planted twin as the top neighbor."""
    import ray.data
    tbl, m = _emb_table(n=200, planted=8)
    n = 200
    q_ids = np.arange(8, dtype=np.int64)
    q_mat = m[:8]                      # twins live at n-8+i
    ds = ray.data.from_arrow(tbl).repartition(4)
    out = ann.ivf_topk(ds, (q_ids, q_mat), k=1, nlist=8, nprobe=1).to_pandas()
    got = dict(zip(out["query_id"], out["neighbor_id"]))
    for i in range(8):
        assert got[i] == n - 8 + i


def test_ivf_recall_improves_with_nprobe(ray_session):
    import ray.data
    tbl, m = _emb_table()
    q_ids = np.arange(10, dtype=np.int64)
    q_mat = m[:10]
    ds = ray.data.from_arrow(tbl).repartition(4)
    exact = ann.topk_cosine(ds, (q_ids, q_mat), k=5).to_pandas()
    eset = set(map(tuple, exact[["query_id", "neighbor_id"]]
                   .itertuples(index=False)))
    cent = ann.train_ivf_centroids(ds, nlist=8)
    recalls = []
    for nprobe in (1, 4, 8):
        ivf = ann.ivf_topk(ds, (q_ids, q_mat), k=5, centroids=cent,
                           nprobe=nprobe).to_pandas()
        vset = set(map(tuple, ivf[["query_id", "neighbor_id"]]
                       .itertuples(index=False)))
        recalls.append(len(eset & vset) / len(eset))
    assert recalls[-1] == 1.0
    assert recalls[0] <= recalls[1] <= recalls[2]


def test_train_ivf_centroids_deterministic(ray_session):
    import ray.data
    tbl, _ = _emb_table()
    ds = ray.data.from_arrow(tbl).repartition(4)
    c1 = ann.train_ivf_centroids(ds, nlist=8)
    c2 = ann.train_ivf_centroids(ds, nlist=8)
    assert np.array_equal(c1, c2)
    assert c1.shape == (8, 16)
    assert np.allclose(np.linalg.norm(c1, axis=1), 1.0)


def test_assign_lists_partition_pruning(ray_session):
    """assign_lists tags every row with a valid list id, and the probed
    subset is a strict subset at nprobe < nlist — the persisted-index
    read-pruning contract."""
    import ray.data
    tbl, m = _emb_table()
    ds = ray.data.from_arrow(tbl).repartition(4)
    cent = ann.train_ivf_centroids(ds, nlist=8)
    tagged = ann.assign_lists(ds, cent).to_pandas()
    assert len(tagged) == 200
    assert tagged["list_id"].between(0, 7).all()
    # every list non-empty on this corpus; one probed list reads a
    # strict subset of rows
    sizes = tagged.groupby("list_id").size()
    assert (sizes > 0).all() and sizes.max() < 200


def test_embedding_dedup_matches_bruteforce_closure(ray_session):
    """Cluster labels equal the transitive closure of the exact cosine
    pair graph with min-id canonical labels."""
    import ray.data
    tbl, m = _emb_table(n=150, planted=10)
    ds = ray.data.from_arrow(tbl).repartition(4)
    got = ann.embedding_dedup(ds, 0.8).to_pandas()
    assert len(got) == 150
    # brute-force closure
    pairs = _brute_pairs(m, 0.8)
    parent = list(range(150))
    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {i: find(i) for i in range(150)}
    gotmap = dict(zip(got["vec_id"], got["cluster_id"]))
    assert gotmap == want
    # the planted twins actually cluster (non-trivial case)
    assert any(v != k for k, v in want.items())


def test_ivf_persisted_index_roundtrip(ray_session, tmp_path):
    """write_ivf_index → search_ivf_index: exact vs brute force at
    nprobe==nlist, identical to the streaming IVF at nprobe<nlist, and
    the probed read is a strict subset of the corpus (path-level
    partition pruning actually prunes)."""
    import ray.data
    import numpy as np
    import pyarrow as pa
    rng = np.random.default_rng(5)
    m = rng.normal(size=(400, 32))
    tbl = pa.table({
        "vec_id": pa.array(range(400), pa.int64()),
        "embedding": pa.array([r.tolist() for r in m],
                              pa.list_(pa.float32()))})
    ds = ray.data.from_arrow(tbl).repartition(4)
    q = (np.array([0, 7, 99], dtype=np.int64), m[[0, 7, 99]])
    idx = str(tmp_path / "ivf_idx")
    cent = ann.write_ivf_index(ds, idx, nlist=8)

    def canon(d):
        return d.to_pandas().sort_values(
            ["query_id", "rank"]).reset_index(drop=True)

    full = canon(ann.topk_cosine(ds, q, k=5))
    assert canon(ann.search_ivf_index(idx, q, k=5, nprobe=8)).equals(full)
    s_stream = canon(ann.ivf_topk(ds, q, k=5, nprobe=2, centroids=cent))
    assert canon(ann.search_ivf_index(idx, q, k=5, nprobe=2)).equals(s_stream)
    # pruning: nprobe=1 per 3 queries unions to <= 3 of 8 lists
    from ray.data.datasource.partitioning import (Partitioning,
                                                  PathPartitionFilter)
    qm = m[[0, 7, 99]] / np.linalg.norm(m[[0, 7, 99]], axis=1,
                                        keepdims=True)
    probed = {str(int(x)) for x in np.argmax(qm @ cent.T, axis=1)}
    pruned = ray.data.read_parquet(
        idx,
        partition_filter=PathPartitionFilter.of(
            lambda kv: kv.get("list_id") in probed, style="hive"),
        partitioning=Partitioning("hive"), file_extensions=["parquet"])
    assert 0 < pruned.count() < 400


def test_topk_hamming_matches_bruteforce(ray_session):
    import ray.data
    from kmcp_ray.hashing import popcount64
    rng = np.random.default_rng(11)
    codes = rng.integers(0, 2**62, size=60).astype(np.int64)
    codes[5] = codes[0]              # exact dup of query 0 (dist 0)
    codes[6] = codes[0] ^ 1          # 1-bit neighbor of query 0
    codes[7] = codes[1]              # tie pair for query 1: two dist-0
    codes[8] = codes[1]              # neighbors -> id tie-break decides
    ids = np.arange(60, dtype=np.int64)
    tbl = pa.table({"doc_id": pa.array(ids, pa.int64()),
                    "simhash": pa.array(codes, pa.int64())})
    q_ids = ids[:3]
    q_codes = codes[:3].view(np.uint64)
    out = ann.topk_hamming(ray.data.from_arrow(tbl), (q_ids, q_codes), k=4,
                           id_col="doc_id", code_col="simhash").to_pandas()
    u = codes.view(np.uint64)
    for q in q_ids:
        d = popcount64(u[q] ^ u).astype(np.int64)
        d[q] = 1 << 30               # exclude self
        order = np.lexsort((ids, d))[:4]
        sub = out[out.query_id == q].sort_values("rank")
        assert sub.neighbor_id.tolist() == order.tolist(), f"query {q}"
        assert sub.dist.tolist() == d[order].tolist(), f"query {q}"
        assert sub["rank"].tolist() == [1, 2, 3, 4]


def test_topk_hamming_small_corpus_and_k_overshoot(ray_session):
    """k larger than the corpus: every non-self row returned once,
    ranks contiguous from 1."""
    import ray.data
    tbl = pa.table({"doc_id": pa.array([0, 1, 2], pa.int64()),
                    "simhash": pa.array([0, -1, 7], pa.int64())})
    q = (np.array([0], dtype=np.int64), np.array([0], dtype=np.uint64))
    out = ann.topk_hamming(ray.data.from_arrow(tbl), q, k=10,
                           code_col="simhash").to_pandas() \
        .sort_values("rank")
    assert out.neighbor_id.tolist() == [2, 1]   # dist 3 < dist 64
    assert out.dist.tolist() == [3, 64]
    assert out["rank"].tolist() == [1, 2]


def test_ivf_default_nprobe_recall_on_clustered_corpus(ray_session):
    """IVF at the DEFAULT knob (nprobe=4, nlist=16) keeps top-k recall
    >= 0.95 on a corpus with real neighbor structure (16 Gaussian
    clusters — embedding geometry where ANN is actually deployed; on
    unstructured random vectors recall ~= 2x the probed fraction, the
    sweep in BASELINE.md documents both regimes, r3 verdict #8)."""
    import pyarrow as pa
    import ray.data

    rng = np.random.default_rng(5)
    ncl, d, per = 16, 32, 200
    cent = rng.normal(0, 1, (ncl, d))
    m = np.concatenate([cent[i] + 0.15 * rng.normal(0, 1, (per, d))
                        for i in range(ncl)])
    ids = np.arange(len(m), dtype=np.int64)
    off = pa.array(np.arange(len(m) + 1, dtype=np.int32) * d)
    emb = pa.ListArray.from_arrays(
        off, pa.array(m.reshape(-1), pa.float64()))
    ds = ray.data.from_arrow(pa.table({
        "vec_id": pa.array(ids), "embedding": emb})).repartition(4)
    q = (ids[:48], m[:48])
    exact = ann.topk_cosine(ds, q, k=5).to_pandas()
    eset = set(map(tuple, exact[["query_id", "neighbor_id"]]
                   .itertuples(index=False)))
    c = ann.train_ivf_centroids(ds, nlist=16)
    ivf = ann.ivf_topk(ds, q, k=5, centroids=c, nprobe=4).to_pandas()
    vset = set(map(tuple, ivf[["query_id", "neighbor_id"]]
                   .itertuples(index=False)))
    assert len(eset & vset) / len(eset) >= 0.95
