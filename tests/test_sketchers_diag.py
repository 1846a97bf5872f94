import dataclasses

import numpy as np
import pyarrow as pa
import pytest

from kmcp_ray import testgen, text
from kmcp_ray.config import DedupConfig
from kmcp_ray.imagecodec import decode_verify
from kmcp_ray.pipeline import dedup_pipeline

BASE = DedupConfig(num_partitions=8)


def _sets(cfg, texts):
    ss = text.shingle_sets_sketcher(pa.array(texts), cfg)
    return [set(ss["hashes"][ss["offsets"][i]:ss["offsets"][i + 1]].tolist())
            for i in range(len(texts))]


TEXTS = ["the quick brown fox jumps over the lazy dog and keeps running "
         "through the wide open field toward the distant hills",
         "one two", ""]


def test_minimizer_subset_of_scaled():
    full = _sets(BASE, TEXTS)
    mini = _sets(dataclasses.replace(BASE, sketcher="minimizer"), TEXTS)
    for f, m in zip(full, mini):
        assert m <= f
    assert 0 < len(mini[0]) < len(full[0])
    assert mini[1] == full[1]          # short row: single fold shingle


def test_syncmer_subset_and_deterministic():
    sync = _sets(dataclasses.replace(BASE, sketcher="syncmer"), TEXTS)
    full = _sets(BASE, TEXTS)
    for s, f in zip(sync, full):
        assert s <= f
    assert sync == _sets(dataclasses.replace(BASE, sketcher="syncmer"), TEXTS)
    assert len(sync[0]) > 0


def test_minimizer_pipeline_still_clusters_exact_dups(ray_session):
    import ray.data
    cfg = dataclasses.replace(BASE, sketcher="minimizer")
    table, planted, _ = testgen.make_pairs_corpus(n=200, seed=13, cfg=BASE)
    adf = dedup_pipeline(ray.data.from_arrow(table), cfg).assignments.to_pandas()
    eng = dict(zip(adf.image_id, adf.cluster_id))
    exact = [(a, b) for a, b, c in planted if c == "exact"]
    hits = sum(1 for a, b in exact if eng[a] == eng[b])
    assert hits == len(exact)


def test_decode_verify_stage(ray_session):
    import ray.data
    table, _, _ = testgen.make_pairs_corpus(n=120, seed=4, cfg=BASE)
    out = decode_verify(ray.data.from_arrow(table), concurrency=2,
                        batch_size=64).to_pandas()
    assert len(out) == table.num_rows
    assert out.phash_ok.all()
    assert (out.psnr_db >= 40.0).all()
    assert (out.w_decoded > 0).all()


def test_bucket_stats(ray_session):
    import ray.data
    from kmcp_ray.diagnostics import bucket_stats
    from kmcp_ray.pipeline import sketch_stage
    table, _, _ = testgen.make_pairs_corpus(n=200, seed=3, cfg=BASE)
    sig = sketch_stage(ray.data.from_arrow(table), BASE)
    st = bucket_stats(sig, BASE).to_pandas()
    assert (st.n_buckets > 0).all()
    assert set(st.kind.unique()) <= {0, 1, 2, 3}
    # dup-heavy corpus must show some buckets of size >= 2
    assert (st.bucket_size >= 2).any()


def test_reports():
    import pandas as pd
    from kmcp_ray.diagnostics import report_cami, report_kmcp
    prof = pd.DataFrame({
        "cluster_id": ["a", "b"], "size": [3, 1], "n_edges": [2, 0],
        "n_exact": [1, 0], "n_minhash": [1, 0], "n_contain": [0, 0],
        "n_phash": [0, 0], "mean_score": [0.9, 0.0], "p90_score": [1.0, 0.0]})
    txt = report_kmcp(prof)
    assert txt.startswith("cluster_id\t") and "\na\t3\t" in txt
    ab = pd.DataFrame({"cluster_id": ["a", "b"], "size": [3, 1],
                       "fraction": [0.75, 0.25]})
    cami = report_cami(ab)
    assert "@SampleID" in cami and "a\tcluster\t75.000000" in cami
