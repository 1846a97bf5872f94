"""End-to-end pipeline tests vs the pure-Python oracle (FIXTURES.md).

The engine's cluster assignments must EQUAL the oracle's (not just
recall ≥ 0.99 — exact match at the same shingle/signature config),
planted duplicate pairs must be recovered, hard negatives must not
cluster, and runs must be deterministic and resumable.
"""

import os

import numpy as np
import pyarrow as pa
import pytest

from kmcp_ray import imagecodec, testgen
from kmcp_ray.config import DedupConfig
from kmcp_ray.pipeline import cluster_stats, dedup_pipeline

from tests import oracle

CFG = DedupConfig(num_partitions=16)


@pytest.fixture(scope="module")
def corpus():
    return testgen.make_pairs_corpus(n=600, seed=42, cfg=CFG)


@pytest.fixture(scope="module")
def oracle_result(corpus):
    table, _, _ = corpus
    return oracle.oracle_cluster(table, CFG)


@pytest.fixture(scope="module")
def engine_result(ray_session, corpus):
    import ray.data
    table, _, _ = corpus
    res = dedup_pipeline(ray.data.from_arrow(table), CFG)
    adf = res.assignments.to_pandas()
    return dict(zip(adf.image_id, adf.cluster_id)), res


def test_engine_matches_oracle_exactly(engine_result, oracle_result, corpus):
    eng, _ = engine_result
    oassign, _ = oracle_result
    table, _, _ = corpus
    assert len(eng) == table.num_rows
    mismatches = {k: (eng.get(k), oassign[k])
                  for k in oassign if eng.get(k) != oassign[k]}
    assert not mismatches, f"{len(mismatches)} mismatches: {list(mismatches.items())[:5]}"


def test_dup_pair_recall(engine_result, corpus):
    eng, _ = engine_result
    _, planted, _ = corpus
    hits = sum(1 for a, b, _c in planted if eng[a] == eng[b])
    recall = hits / len(planted)
    assert recall >= 0.99, f"recall {recall:.4f} ({hits}/{len(planted)})"


def test_no_false_clusters_on_hard_negatives(engine_result, corpus):
    eng, _ = engine_result
    _, _, negatives = corpus
    bad = [(a, b, c) for a, b, c in negatives if eng[a] == eng[b]]
    assert not bad, f"hard negatives clustered: {bad[:5]}"


def test_payload_invariants(corpus):
    """decoded-pixel invariance (PSNR >= 40 lossy / exact lossless) and
    caption integrity per row (BASELINE.json input_hint)."""
    table, _, _ = corpus
    caps = table.column("caption").to_pylist()
    fmts = table.column("fmt").to_pylist()
    bts = table.column("bytes").to_pylist()
    phs = table.column("phash").to_pylist()
    for i in range(0, table.num_rows, 17):
        px = imagecodec.decode(bts[i])
        assert px.shape == (table.column("h")[i].as_py(),
                            table.column("w")[i].as_py(), 3)
        # phash column matches the decoded pixels
        assert imagecodec.phash64(px) == phs[i]
        re_enc = imagecodec.encode(px, fmts[i])
        px2 = imagecodec.decode(re_enc)
        if fmts[i] == "png":
            assert (px2 == px).all()
        else:
            assert imagecodec.psnr(px, px2) >= 40.0
        assert isinstance(caps[i], str)


def test_determinism_two_runs(ray_session, corpus):
    import ray.data
    table, _, _ = corpus
    a = dedup_pipeline(ray.data.from_arrow(table), CFG).assignments.to_pandas()
    b = dedup_pipeline(ray.data.from_arrow(table), CFG).assignments.to_pandas()
    a = a.sort_values("image_id").reset_index(drop=True)
    b = b.sort_values("image_id").reset_index(drop=True)
    assert a.equals(b)


def test_salted_buckets_still_match_oracle(ray_session):
    """Tiny max_bucket forces the salted/representative path everywhere;
    engine and oracle must still agree exactly."""
    import ray.data
    cfg = DedupConfig(num_partitions=8, max_bucket=8)
    table, planted, _ = testgen.make_pairs_corpus(n=300, seed=7, cfg=cfg)
    oassign, _ = oracle.oracle_cluster(table, cfg)
    res = dedup_pipeline(ray.data.from_arrow(table), cfg)
    adf = res.assignments.to_pandas()
    eng = dict(zip(adf.image_id, adf.cluster_id))
    assert eng == oassign


def test_attach_exchange_path_matches_oracle(ray_session):
    """broadcast_verify_rows=0 forces the partitioned attach exchange
    (the at-scale path); results must equal the oracle exactly."""
    import ray.data
    cfg = DedupConfig(num_partitions=8, broadcast_verify_rows=0)
    table, _, _ = testgen.make_pairs_corpus(n=300, seed=21, cfg=cfg)
    oassign, _ = oracle.oracle_cluster(table, cfg)
    adf = dedup_pipeline(ray.data.from_arrow(table), cfg).assignments.to_pandas()
    assert dict(zip(adf.image_id, adf.cluster_id)) == oassign


def test_checkpoint_resume(ray_session, corpus, tmp_path):
    import ray.data
    table, _, _ = corpus
    wd = str(tmp_path / "ckpt")
    first = dedup_pipeline(ray.data.from_arrow(table), CFG, workdir=wd) \
        .assignments.to_pandas().sort_values("image_id").reset_index(drop=True)
    assert os.path.exists(os.path.join(wd, "01_signatures", "_DONE"))
    assert os.path.exists(os.path.join(wd, "02_edges", "_DONE"))
    # per-PARTITION lineage manifest (north rule): every stage records
    # rows+bytes per part file, and the parts sum to the stage total
    import json
    for stage in ("01_signatures", "02_edges", "03_clusters"):
        with open(os.path.join(wd, stage, "_manifest.json")) as f:
            man = json.load(f)
        assert man["n_files"] == len(man["partitions"]) > 0
        assert man["rows"] == sum(p["rows"] for p in man["partitions"])
        assert all(p["bytes"] > 0 for p in man["partitions"])
    # resume: feed an EMPTY input — completed signature/edge checkpoints
    # must be reused, proving stages 1-2 are skipped
    empty = ray.data.from_arrow(table.slice(0, 0))
    resumed = dedup_pipeline(empty, CFG, workdir=wd) \
        .assignments.to_pandas().sort_values("image_id").reset_index(drop=True)
    assert first.equals(resumed)
    # config mismatch must be refused
    with pytest.raises(ValueError, match="different"):
        dedup_pipeline(empty, DedupConfig(num_partitions=16, bands=8), workdir=wd)


def test_cluster_stats(ray_session, engine_result):
    _, res = engine_result
    stats = cluster_stats(res.assignments).to_pandas()
    assert stats["size"].sum() == res.assignments.count()
    assert (stats["size"] >= 1).all()


def test_empty_input(ray_session):
    import ray.data
    table, _, _ = testgen.make_pairs_corpus(n=50, seed=3, cfg=CFG)
    res = dedup_pipeline(ray.data.from_arrow(table.slice(0, 0)), CFG)
    assert res.assignments.count() == 0


def test_sketch_missing_phash_col_raises(ray_session):
    """ADVICE r1 regression: a phash_col absent from the input must fail
    loudly, not zero-fill (which collapses the corpus into one cluster)."""
    import ray.data
    from kmcp_ray.pipeline import sketch_stage
    tbl = pa.table({"image_id": pa.array(["a", "b"], pa.string()),
                    "caption": pa.array(["x y z", "p q r"], pa.string())})
    sig = sketch_stage(ray.data.from_arrow(tbl), CFG,
                       phash_col="phash", bytes_col=None)
    with pytest.raises(Exception, match="phash_col"):
        sig.materialize()


def test_null_phash_rows_do_not_cocluster(ray_session):
    """Null phashes get unique sentinels — two unrelated rows with null
    phash must not meet in a Hamming bucket."""
    import ray.data
    tbl = pa.table({
        "image_id": pa.array(["a", "b"], pa.string()),
        "caption": pa.array(["alpha beta gamma delta", "wholly different text"],
                            pa.string()),
        "phash": pa.array([None, None], pa.int64())})
    res = dedup_pipeline(ray.data.from_arrow(tbl), CFG, bytes_col=None)
    adf = res.assignments.to_pandas()
    assert set(adf.cluster_id) == {"a", "b"}


def test_checkpoint_stale_partial_stage_cleared(ray_session, corpus, tmp_path):
    """ADVICE r1 regression: a crashed stage dir (no _DONE) must be
    cleared on rerun, not appended to (silent row duplication)."""
    import ray.data
    table, _, _ = corpus
    wd = str(tmp_path / "wd")
    res1 = dedup_pipeline(ray.data.from_arrow(table), CFG, workdir=wd)
    n1 = res1.assignments.count()
    # simulate a crash after stage 1 wrote files but before _DONE
    os.remove(os.path.join(wd, "01_signatures", "_DONE"))
    os.remove(os.path.join(wd, "02_edges", "_DONE"))
    os.remove(os.path.join(wd, "03_clusters", "_DONE"))
    res2 = dedup_pipeline(ray.data.from_arrow(table), CFG, workdir=wd)
    assert res2.assignments.count() == n1
    assert res2.signatures.count() == len(table)


def test_distributed_cc_matches_numpy(ray_session):
    """labels_via_exchange (hook + pointer-jump, no driver union-find)
    must agree with the numpy CC on random graphs and a long path."""
    import ray.data
    from kmcp_ray.cc import labels_via_exchange, numpy_components
    rng = np.random.default_rng(3)
    a = np.array([f"n{int(x):04d}" for x in rng.integers(0, 300, 500)],
                 dtype=object)
    b = np.array([f"n{int(x):04d}" for x in rng.integers(0, 300, 500)],
                 dtype=object)
    # long path: stresses pointer jumping (diameter 200)
    pa_ids = np.array([f"p{i:04d}" for i in range(200)], dtype=object)
    a = np.concatenate([a, pa_ids[:-1]])
    b = np.concatenate([b, pa_ids[1:]])
    edges = pa.table({"id_a": pa.array(a, pa.string()),
                      "id_b": pa.array(b, pa.string())})
    got = labels_via_exchange(ray.data.from_arrow(edges), P=8).to_pandas()
    nodes, roots = numpy_components(a, b)
    want = dict(zip(nodes, roots))
    gotd = dict(zip(got.node, got.label))
    assert gotd == want


def test_pipeline_join_emission_matches_oracle(ray_session, corpus,
                                               oracle_result):
    """Forcing the distributed-CC + partitioned-join emission path must
    reproduce the oracle assignments exactly."""
    import dataclasses
    import ray.data
    table, _, _ = corpus
    cfg = dataclasses.replace(CFG, broadcast_assign_edges=0)
    res = dedup_pipeline(ray.data.from_arrow(table), cfg)
    adf = res.assignments.to_pandas()
    eng = dict(zip(adf.image_id, adf.cluster_id))
    oassign, _ = oracle_result
    assert len(eng) == table.num_rows
    assert all(eng[k] == v for k, v in oassign.items())


def test_inmemory_signature_table_is_slim(engine_result):
    """The one full-corpus materialized table must not carry the vsk
    verification blob (lazy candidate-only recompute path); the
    checkpointed signature table keeps it (resume needs no raw input)."""
    _, res = engine_result
    assert "vsk" not in res.signatures.schema().names


def test_checkpoint_signature_table_keeps_vsk(ray_session, tmp_path):
    import ray.data
    table, _, _ = testgen.make_pairs_corpus(n=100, seed=3, cfg=CFG)
    res = dedup_pipeline(ray.data.from_arrow(table), CFG,
                         workdir=str(tmp_path / "wd"))
    assert "vsk" in res.signatures.schema().names


def test_hash_shuffle_strategy(ray_session):
    """Dedicated coverage for the hash-shuffle arm (ADVICE r2 #1):
    dedup_pipeline under HASH_SHUFFLE must equal the sort-strategy
    result, and edges_stage must RESTORE the caller's strategy after
    re-rooting (ADVICE r2 #2)."""
    import ray.data
    from ray.data.context import ShuffleStrategy
    from kmcp_ray.perf import tune_data_context

    table, _, _ = testgen.make_pairs_corpus(n=200, seed=5, cfg=CFG)
    base = dedup_pipeline(ray.data.from_arrow(table), CFG) \
        .assignments.to_pandas().sort_values("image_id") \
        .reset_index(drop=True)
    ctx = ray.data.DataContext.get_current()
    prev = ctx.shuffle_strategy
    try:
        tune_data_context("hash")
        assert ctx.shuffle_strategy == ShuffleStrategy.HASH_SHUFFLE
        got = dedup_pipeline(ray.data.from_arrow(table), CFG) \
            .assignments.to_pandas().sort_values("image_id") \
            .reset_index(drop=True)
        # edges_stage flipped to sort for the re-root, then restored
        assert ctx.shuffle_strategy == ShuffleStrategy.HASH_SHUFFLE
    finally:
        ctx.shuffle_strategy = prev
    import pandas as pd
    pd.testing.assert_frame_equal(got, base)


def test_checkpoint_schema_marker_refusal(ray_session, tmp_path):
    """Resuming a workdir written under an older signature-table schema
    must be refused with a clear message (ADVICE r2 #3), and a workdir
    missing the marker entirely (pre-versioning) is refused too."""
    import ray.data
    table, _, _ = testgen.make_pairs_corpus(n=60, seed=3, cfg=CFG)
    wd = str(tmp_path / "wd")
    dedup_pipeline(ray.data.from_arrow(table), CFG, workdir=wd)
    # same config + same schema resumes fine
    dedup_pipeline(ray.data.from_arrow(table), CFG, workdir=wd)
    # stale / missing schema marker -> refused
    sp = os.path.join(wd, "schema.txt")
    with open(sp, "w") as f:
        f.write("image_id,old_col")
    with pytest.raises(ValueError, match="schema"):
        dedup_pipeline(ray.data.from_arrow(table), CFG, workdir=wd)
    os.remove(sp)
    with pytest.raises(ValueError, match="schema"):
        dedup_pipeline(ray.data.from_arrow(table), CFG, workdir=wd)


def test_distributed_cc_giant_component_scale(ray_session):
    """r2 verdict #10: force the labels_via_exchange arm (distributed
    CC + join emission) on an edge volume ~10x the other CC tests with
    one giant component plus many small ones, and assert exact equality
    with the driver union-find arm."""
    import time
    import numpy as np
    import pyarrow as pa
    import ray.data
    from kmcp_ray import cc
    from kmcp_ray.pipeline import assign_stage, assign_via_join

    rng = np.random.default_rng(23)
    n = 40_000
    ids = np.array([f"n{i:07d}" for i in range(n)], dtype=object)
    # giant component: a long chain over a random permutation of the
    # first half (worst case for label propagation depth), plus random
    # extra edges; second half pairs up into 2-cliques
    perm = rng.permutation(n // 2)
    chain_a = ids[perm[:-1]]
    chain_b = ids[perm[1:]]
    extra = rng.integers(0, n // 2, size=n // 4)
    extra2 = rng.integers(0, n // 2, size=n // 4)
    pair_a = ids[np.arange(n // 2, n - 1, 2)]
    pair_b = ids[np.arange(n // 2 + 1, n, 2)]
    edges = pa.table({
        "id_a": pa.array(np.concatenate([chain_a, ids[extra], pair_a]),
                         pa.string()),
        "id_b": pa.array(np.concatenate([chain_b, ids[extra2], pair_b]),
                         pa.string())})
    edges_ds = ray.data.from_arrow(edges)
    ids_ds = ray.data.from_arrow(pa.table({"image_id":
                                           pa.array(ids, pa.string())}))

    t0 = time.time()
    labels = cc.labels_via_exchange(edges_ds, P=16)
    got = assign_via_join(ids_ds, labels, CFG).to_pandas() \
        .sort_values("image_id").reset_index(drop=True)
    t_dist = time.time() - t0

    cluster_map = cc.connected_components_arrays(edges_ds, reduce_rounds=1)
    want = assign_stage(ids_ds, cluster_map).to_pandas() \
        .sort_values("image_id").reset_index(drop=True)

    import pandas as pd
    pd.testing.assert_frame_equal(got, want)
    # the giant component must have collapsed to ONE label
    giant = want[want.image_id.isin(ids[:n // 2])]
    assert giant.cluster_id.nunique() == 1
    print(f"distributed CC wall: {t_dist:.1f}s over "
          f"{edges.num_rows} edges")
