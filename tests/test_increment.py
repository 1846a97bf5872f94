"""Incremental dedup (increment.dedup_increment): epoch growth must
equal a from-scratch rebuild over the union — the kmcp incremental
shard-growth contract (reference README.md:118-122) re-expressed as a
checkpoint-epoch invariant."""

import pyarrow as pa
import pytest
import ray
import ray.data

from kmcp_ray import testgen
from kmcp_ray.config import DedupConfig
from kmcp_ray.increment import dedup_increment
from kmcp_ray.pipeline import dedup_pipeline


def _sorted(df):
    return df.sort_values("image_id").reset_index(drop=True)


def test_increment_matches_full_rebuild(ray_session, tmp_path):
    cfg = DedupConfig(num_partitions=8)
    # split at 340: the corpus lays out 276 base rows then 120 planted
    # dup rows referencing earlier seeds, so the base epoch holds real
    # edges (stale-edge preservation is exercised) AND the increment
    # adds cross-epoch pairs
    table, planted, _ = testgen.make_pairs_corpus(n=400, seed=13, cfg=cfg)
    full = dedup_pipeline(ray.data.from_arrow(table), cfg) \
        .assignments.to_pandas()
    wd = str(tmp_path / "wd")
    base = dedup_pipeline(ray.data.from_arrow(table.slice(0, 340)), cfg,
                          workdir=wd)
    assert base.edges.count() > 0
    res = dedup_increment(ray.data.from_arrow(table.slice(340)), cfg, wd)
    inc = res.assignments.to_pandas()
    assert _sorted(full).equals(_sorted(inc))
    # cross-epoch planted pairs must have been discovered
    eng = dict(zip(inc.image_id, inc.cluster_id))
    assert all(eng[a] == eng[b] for a, b, _ in planted)
    # combined edge table carries each (id_a, id_b, via) once
    e = res.edges.to_pandas()
    assert not e.duplicated(subset=["id_a", "id_b", "via"]).any()


def test_two_increments(ray_session, tmp_path):
    cfg = DedupConfig(num_partitions=8)
    table, _, _ = testgen.make_pairs_corpus(n=300, seed=29, cfg=cfg)
    full = dedup_pipeline(ray.data.from_arrow(table), cfg) \
        .assignments.to_pandas()
    wd = str(tmp_path / "wd2")
    dedup_pipeline(ray.data.from_arrow(table.slice(0, 150)), cfg, workdir=wd)
    dedup_increment(ray.data.from_arrow(table.slice(150, 100)), cfg, wd)
    res = dedup_increment(ray.data.from_arrow(table.slice(250)), cfg, wd)
    assert _sorted(full).equals(_sorted(res.assignments.to_pandas()))


def test_increment_requires_completed_base(ray_session, tmp_path):
    cfg = DedupConfig(num_partitions=8)
    table, _, _ = testgen.make_pairs_corpus(n=50, seed=3, cfg=cfg)
    with pytest.raises(ValueError, match="base"):
        dedup_increment(ray.data.from_arrow(table), cfg,
                        str(tmp_path / "empty_wd"))


def test_increment_refuses_config_mismatch(ray_session, tmp_path):
    cfg = DedupConfig(num_partitions=8)
    table, _, _ = testgen.make_pairs_corpus(n=60, seed=5, cfg=cfg)
    wd = str(tmp_path / "wd3")
    dedup_pipeline(ray.data.from_arrow(table.slice(0, 40)), cfg, workdir=wd)
    with pytest.raises(ValueError, match="DedupConfig"):
        dedup_increment(ray.data.from_arrow(table.slice(40)),
                        DedupConfig(num_partitions=4), wd)


def test_corpus_diff_statuses(ray_session):
    import ray.data
    from kmcp_ray.increment import corpus_diff
    old = pa.table({"doc_id": pa.array([0, 1, 2, 3], pa.int64()),
                    "text": pa.array(["a", "b", "c", None], pa.string())})
    new = pa.table({"doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                    "text": pa.array(["b", "CHANGED", "", "e"], pa.string())})
    out = {r["doc_id"]: r["status"] for r in corpus_diff(
        ray.data.from_arrow(old), ray.data.from_arrow(new),
        num_partitions=4).take_all()}
    # null text hashes as "" -> id 3 (None vs "") counts as same
    assert out == {0: "removed", 1: "same", 2: "changed", 3: "same",
                   4: "added"}
