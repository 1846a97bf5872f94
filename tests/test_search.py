import numpy as np
import pyarrow as pa
import pytest

from kmcp_ray import search
from kmcp_ray.config import DedupConfig

from tests import oracle

CFG = DedupConfig(num_partitions=8)


def _mk(texts, start=0):
    return pa.table({"doc_id": pa.array([f"d{start+i:04d}" for i in range(len(texts))],
                                        pa.string()),
                     "text": pa.array(texts, pa.string())})


REF_TEXTS = [
    "alpha beta gamma delta epsilon zeta eta theta iota kappa "
    "lam mu nu xi omicron pi rho sigma tau upsilon",
    "one two three four five six seven eight nine ten eleven twelve "
    "thirteen fourteen fifteen sixteen",
    "totally unrelated reference document about storage engines and "
    "write amplification in log structured trees",
]


def _brute_qcov(q, r, cfg=CFG):
    sq, sr = oracle.sketch_of(q, cfg), oracle.sketch_of(r, cfg)
    c = np.intersect1d(sq, sr, assume_unique=True).size
    return c, len(sq), len(sr)


def test_search_exact_containment(ray_session):
    import ray.data
    refs = _mk(REF_TEXTS)
    # query = contiguous slice of ref0 → qcov 1.0 against ref0
    q_text = " ".join(REF_TEXTS[0].split()[3:15])
    queries = _mk([q_text], start=100)
    out = search.search(ray.data.from_arrow(queries), ray.data.from_arrow(refs),
                        CFG, min_qcov=0.5).to_pandas()
    assert len(out) == 1
    row = out.iloc[0]
    c, kq, kt = _brute_qcov(q_text, REF_TEXTS[0])
    assert row.target == "d0000" and row.m_shared == c
    assert row.q_kept == kq and row.t_kept == kt
    assert row.qcov == pytest.approx(c / kq) and row.qcov == 1.0


def test_search_scores_match_bruteforce(ray_session):
    import ray.data
    refs = _mk(REF_TEXTS)
    q1 = " ".join(REF_TEXTS[1].split()[:10]) + " extra words here now"
    queries = _mk([q1], start=200)
    out = search.search(ray.data.from_arrow(queries), ray.data.from_arrow(refs),
                        CFG, min_qcov=0.1, min_shared=1).to_pandas()
    hit = out[out.target == "d0001"].iloc[0]
    c, kq, kt = _brute_qcov(q1, REF_TEXTS[1])
    assert hit.m_shared == c
    assert hit.jacc == pytest.approx(c / (kq + kt - c))
    assert not (out.target == "d0002").any()


def test_shard_merge_equals_full_search(ray_session):
    """kmcp shard workflow invariant: searching two reference shards
    separately and merging equals searching the union."""
    import ray.data
    refs_a = _mk(REF_TEXTS[:2])
    refs_b = _mk(REF_TEXTS[2:], start=2)
    q_text = " ".join(REF_TEXTS[0].split()[0:12])
    queries = _mk([q_text], start=300)
    qd = ray.data.from_arrow(queries)
    full = search.search(qd, ray.data.from_arrow(_mk(REF_TEXTS)), CFG,
                         min_qcov=0.2, min_shared=1).to_pandas()
    pa_res = search.search(qd, ray.data.from_arrow(refs_a), CFG,
                           min_qcov=0.2, min_shared=1)
    pb_res = search.search(qd, ray.data.from_arrow(refs_b), CFG,
                           min_qcov=0.2, min_shared=1)
    merged = search.merge_search_results([pa_res, pb_res]).to_pandas()
    key = ["query", "target"]
    f = full.sort_values(key).reset_index(drop=True)
    m = merged.sort_values(key).reset_index(drop=True)
    assert f[key + ["m_shared", "qcov"]].equals(m[key + ["m_shared", "qcov"]])


def test_top_scores_cut(ray_session):
    import ray.data
    base = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12 w13 w14 w15 w16"
    refs = _mk([base,                                # full match
                " ".join(base.split()[:12]),         # partial
                " ".join(base.split()[:8]),          # smaller partial
                "unrelated totally different words here entirely"])
    queries = _mk([base], start=400)
    out = search.search(ray.data.from_arrow(queries), ray.data.from_arrow(refs),
                        CFG, min_qcov=0.0, min_shared=1,
                        top_n_scores=1).to_pandas()
    # top-1 distinct score keeps only the best-scoring target(s)
    assert set(out.target) == {"d0000"}


def test_binom_sf_matches_scalar_reference():
    """Vectorized binomial tail == direct scalar log-gamma computation."""
    from math import exp, lgamma, log
    from kmcp_ray.relops import binom_sf

    def scalar(n, m, p):
        if m <= 0:
            return 1.0
        if m > n:
            return 0.0
        lp, lq = log(p), log(1.0 - p)
        return min(1.0, sum(
            exp(lgamma(n + 1) - lgamma(j + 1) - lgamma(n - j + 1)
                + j * lp + (n - j) * lq) for j in range(m, n + 1)))

    rng = np.random.default_rng(7)
    n = rng.integers(1, 200, size=50)
    m = rng.integers(0, 220, size=50)
    for p in (0.5, 0.05, 1e-4):
        got = binom_sf(n, m, p)
        want = np.array([scalar(int(a), int(b), p) for a, b in zip(n, m)])
        np.testing.assert_allclose(got, want, rtol=1e-10)
    # per-row p array support
    ps = rng.uniform(1e-6, 0.5, size=50)
    got = binom_sf(n, m, ps)
    want = np.array([scalar(int(a), int(b), float(p))
                     for a, b, p in zip(n, m, ps)])
    np.testing.assert_allclose(got, want, rtol=1e-10)


def test_intersect_search_results(ray_session):
    """J2: keep only (query, target) present in ALL DBs, min-count row
    wins (kmcp util-db-search.go:359-474 semantics)."""
    import ray.data
    shared = REF_TEXTS[0]
    only_a = REF_TEXTS[1]
    only_b = REF_TEXTS[2]
    refs_a = ray.data.from_arrow(_mk([shared, only_a], start=0))
    refs_b = ray.data.from_arrow(_mk([shared, only_b], start=10))

    # make the shared target the SAME id in both shards
    import pyarrow.compute as pc

    def rename(t):
        ids = t.column("doc_id").to_numpy(zero_copy_only=False).copy()
        ids[0] = "rshared"
        return pa.table({"doc_id": pa.array(ids, pa.string()),
                         "text": t.column("text")})
    refs_a = refs_a.map_batches(rename, batch_format="pyarrow")
    refs_b = refs_b.map_batches(rename, batch_format="pyarrow")

    queries = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(["q1"], pa.string()),
        "text": pa.array([shared], pa.string())}))
    ra = search.search(queries, refs_a, CFG, min_qcov=0.2, min_shared=1)
    rb = search.search(queries, refs_b, CFG, min_qcov=0.2, min_shared=1)
    # each shard alone matches its private target too
    assert set(ra.to_pandas().target) >= {"rshared"}
    inter = search.intersect_search_results([ra, rb], num_partitions=8)
    df = inter.to_pandas()
    assert set(df.target) == {"rshared"}
    assert len(df) == 1


def test_intersect_min_count_row_wins(ray_session):
    import ray.data
    cols = ["query", "q_kept", "target", "t_kept", "m_shared",
            "qcov", "tcov", "jacc", "fpr"]

    def row(q, t, m, qc):
        return dict(zip(cols, [q, 10, t, 10, m, qc, qc, qc, 0.0]))
    a = ray.data.from_items([row("q", "t1", 7, 0.7), row("q", "t2", 5, 0.5)])
    b = ray.data.from_items([row("q", "t1", 4, 0.4)])
    df = search.intersect_search_results([a, b], num_partitions=4).to_pandas()
    assert len(df) == 1
    assert df.target.iloc[0] == "t1"
    assert int(df.m_shared.iloc[0]) == 4      # the min-count row's values
    assert abs(float(df.qcov.iloc[0]) - 0.4) < 1e-12


def test_add_hits_counts_targets_per_query(ray_session):
    import ray.data
    cols = ["query", "q_kept", "target", "t_kept", "m_shared",
            "qcov", "tcov", "jacc", "fpr"]

    def row(q, t):
        return dict(zip(cols, [q, 10, t, 10, 3, 0.5, 0.5, 0.5, 0.0]))
    m = ray.data.from_items([row("q1", "a"), row("q1", "b"),
                             row("q2", "c")])
    df = search.add_hits(m, num_partitions=4).to_pandas()
    got = {(r.query, r.target): r.hits for r in df.itertuples()}
    assert got == {("q1", "a"): 2, ("q1", "b"): 2, ("q2", "c"): 1}


def test_search_indexed_equals_shuffle_search(ray_session):
    """The actor-pool indexed mode (T1/T2) must produce exactly the
    shuffle mode's matches on the same inputs."""
    import ray.data
    rng = np.random.default_rng(13)
    from kmcp_ray import testgen
    vocab = testgen.make_vocab(400, seed=13)
    refs_txt = [" ".join(vocab[i] for i in rng.integers(0, 400, 30))
                for _ in range(40)]
    # queries: slices of refs + noise
    q_txt = [" ".join(r.split()[3:18]) for r in refs_txt[:15]]
    q_txt += [" ".join(vocab[i] for i in rng.integers(0, 400, 12))
              for _ in range(5)]
    refs = ray.data.from_arrow(_mk(refs_txt, start=100))
    queries = ray.data.from_arrow(_mk(q_txt, start=500))
    kw = dict(min_qcov=0.3, min_shared=2, max_fpr=0.05)
    a = search.search(queries, refs, CFG, **kw).to_pandas()
    b = search.search_indexed(queries, refs, CFG, concurrency=2,
                              **kw).to_pandas()
    key = ["query", "target"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    assert len(a) == len(b) > 10
    import pandas as pd
    pd.testing.assert_frame_equal(a[sorted(a.columns)], b[sorted(b.columns)])


def test_search_indexed_size_gate_falls_back(ray_session):
    """A reference side above ``max_index_rows`` must take the shuffle
    search() arm — identical output either path (r2 verdict #4)."""
    import ray.data
    refs = _mk(REF_TEXTS)
    queries = _mk([" ".join(REF_TEXTS[0].split()[3:15]),
                   " ".join(REF_TEXTS[1].split()[:10])], start=300)
    kw = dict(min_qcov=0.3, min_shared=1, max_fpr=1.0)
    direct = search.search_indexed(
        ray.data.from_arrow(queries), ray.data.from_arrow(refs), CFG,
        concurrency=2, **kw).to_pandas()
    gated = search.search_indexed(
        ray.data.from_arrow(queries), ray.data.from_arrow(refs), CFG,
        concurrency=2, max_index_rows=1, **kw).to_pandas()
    key = ["query", "target"]
    d = direct.sort_values(key).reset_index(drop=True)
    g = gated.sort_values(key).reset_index(drop=True)
    import pandas as pd
    pd.testing.assert_frame_equal(d, g[d.columns], check_dtype=False)
    assert len(d) >= 2
