"""Distributed k-means + SemDeDup semantic dedup vs pure-numpy oracles
(SURVEY §5 golden-oracle strategy: same semantics, independent code).
"""

import numpy as np
import pyarrow.parquet as pq
import pytest

from kmcp_ray import ann, kmeans

SF = "/root/testdata/sf0.001"


def _load():
    t = pq.read_table(f"{SF}/embeddings.parquet",
                      columns=["vec_id", "label", "embedding"])
    ids = t.column("vec_id").to_numpy().astype(np.int64)
    labels = t.column("label").to_numpy().astype(np.int64)
    m = np.stack([np.asarray(v, dtype=np.float64)
                  for v in t.column("embedding").to_pylist()])
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    return ids, labels, m


def _emb_ds(columns):
    import ray.data
    return ray.data.read_parquet(f"{SF}/embeddings.parquet",
                                 columns=columns)


def _oracle_group_dedup(ids, m, groups, tau):
    """Per-group connected components of the cosine>=tau graph with
    min-id representative — plain union-find, no vectorized tricks."""
    parent = {int(i): int(i) for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    sims = m @ m.T
    n = len(ids)
    for i in range(n):
        for j in range(i + 1, n):
            if groups[i] == groups[j] and sims[i, j] >= tau:
                a, b = find(int(ids[i])), find(int(ids[j]))
                if a != b:
                    parent[max(a, b)] = min(a, b)
    return {int(i): find(int(i)) for i in ids}


def test_group_semantic_dedup_matches_oracle(ray_session):
    ids, labels, m = _load()
    want = _oracle_group_dedup(ids, m, labels, 0.3)
    out = kmeans.group_semantic_dedup(
        _emb_ds(["vec_id", "label", "embedding"]), "label", 0.3).take_all()
    assert len(out) == len(ids)
    for r in out:
        assert r["rep_id"] == want[r["vec_id"]]
        assert r["kept"] == int(r["rep_id"] == r["vec_id"])


def test_group_dedup_chunking_invariant(ray_session):
    """Row-chunked adjacency must not change the result."""
    base = {r["vec_id"]: r["rep_id"] for r in kmeans.group_semantic_dedup(
        _emb_ds(["vec_id", "label", "embedding"]), "label", 0.3,
        chunk=2048).take_all()}
    tiny = {r["vec_id"]: r["rep_id"] for r in kmeans.group_semantic_dedup(
        _emb_ds(["vec_id", "label", "embedding"]), "label", 0.3,
        chunk=7).take_all()}
    assert base == tiny


def test_kmeans_fit_deterministic(ray_session):
    """Fixed-point integer partial sums make the distributed refit
    bit-reproducible regardless of block scheduling order."""
    ds = _emb_ds(["vec_id", "embedding"])
    c1 = kmeans.kmeans_fit(ds, k=8, iters=3)
    c2 = kmeans.kmeans_fit(ds, k=8, iters=3)
    assert c1.shape == (8, 64)
    assert np.array_equal(c1, c2)


def test_semantic_dedup_components_are_real_and_recall(ray_session):
    """Precision gate: every pruned row is tau-similar to >=1 row of
    its own component (no phantom merges).  Recall gate: WITHIN a
    k-means cluster the component closure is exact (recall 1.0) — the
    only misses are cross-cluster pairs, SemDeDup's documented trade;
    the global number is pinned as a measured corpus property (this
    synthetic corpus has only weak cos~=0.3 pairs, which straddle
    centroid boundaries far more than real near-dup cliques do)."""
    ids, _, m = _load()
    pos = {int(v): i for i, v in enumerate(ids)}
    ds = _emb_ds(["vec_id", "embedding"])
    cent = kmeans.kmeans_fit(ds, k=8, iters=3)
    out = kmeans.semantic_dedup(ds, threshold=0.3,
                                centroids=cent).take_all()
    assert len(out) == len(ids)
    rep = {r["vec_id"]: r["rep_id"] for r in out}
    comp = {}
    for v, r in rep.items():
        comp.setdefault(r, []).append(v)
    sims = m @ m.T
    for r, members in comp.items():
        for v in members:
            if v == r and len(members) == 1:
                continue
            others = [pos[o] for o in members if o != v]
            assert sims[pos[v], others].max() >= 0.3 - 1e-12

    assign = np.argmax(m @ cent.T, axis=1)
    iu = np.triu_indices(len(ids), k=1)
    hit = sims[iu] >= 0.3
    ia, ib = iu[0][hit], iu[1][hit]
    same_rep = np.fromiter((rep[int(ids[x])] == rep[int(ids[y])]
                            for x, y in zip(ia, ib)), dtype=bool)
    same_cluster = assign[ia] == assign[ib]
    assert same_rep[same_cluster].all()          # within-cluster: exact
    recall = same_rep.mean() if len(same_rep) else 1.0
    assert recall >= 0.3, f"semantic-dedup pair recall {recall:.3f}"


def test_semantic_dedup_multiprobe_recall(ray_session):
    """nprobe=2 co-buckets boundary-straddling pairs: measured pair
    recall jumps 0.35 -> 0.95+ on this corpus, precision stays exact
    (every merged component is connected by real tau-edges via the
    per-probe CC + pair union-find)."""
    ids, _, m = _load()
    sims = m @ m.T
    iu = np.triu_indices(len(ids), k=1)
    hit = sims[iu] >= 0.3
    a, b = ids[iu[0][hit]], ids[iu[1][hit]]
    ds = _emb_ds(["vec_id", "embedding"])
    cent = kmeans.kmeans_fit(ds, k=8, iters=3)

    recalls = {}
    for p in (1, 2):
        out = kmeans.semantic_dedup(ds, threshold=0.3, centroids=cent,
                                    nprobe=p).take_all()
        assert len(out) == len(ids)
        rep = {r["vec_id"]: r["rep_id"] for r in out}
        for r in out:
            assert r["kept"] == int(r["rep_id"] == r["vec_id"])
        same = np.fromiter((rep[int(x)] == rep[int(y)]
                            for x, y in zip(a, b)), dtype=bool)
        recalls[p] = same.mean()
    assert recalls[2] > recalls[1]
    assert recalls[2] >= 0.9, f"nprobe=2 recall {recalls[2]:.3f}"


def test_hard_negatives_matches_numpy_oracle(ray_session):
    ids, labels, m = _load()
    qmask = (ids >= 16) & (ids < 24)
    out = ann.hard_negatives(
        _emb_ds(["vec_id", "embedding", "label"]),
        (ids[qmask], m[qmask], labels[qmask]), k=5).take_all()
    got = {}
    for r in out:
        got.setdefault(r["query_id"], []).append(
            (r["rank"], r["neighbor_id"]))
    sims = m[qmask] @ m.T
    for qi, (qid, qlab) in enumerate(zip(ids[qmask], labels[qmask])):
        mask = (ids != qid) & (labels != qlab)
        cand = np.nonzero(mask)[0]
        order = np.lexsort((ids[cand], -sims[qi][cand]))[:5]
        want = [(rk + 1, int(ids[cand][o])) for rk, o in enumerate(order)]
        assert sorted(got[int(qid)]) == want
