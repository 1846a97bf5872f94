"""Profile funnel (stages 1-4 + EM) vs the pure-Python oracle."""

import numpy as np
import pytest

from kmcp_ray import testgen
from kmcp_ray.profile_em import ProfileParams, profile_funnel

from tests.oracle_profile import oracle_profile

PARAMS = ProfileParams(min_qcov=0.55, min_reads=5, min_uniq_reads=2,
                       min_hic_ureads=1, min_frags_prop=0.0)


@pytest.fixture(scope="module")
def matches():
    return testgen.make_profile_matches(n_targets=12, n_queries=3000, seed=7)


@pytest.fixture(scope="module")
def engine_df(ray_session, matches):
    import ray.data
    ds = ray.data.from_arrow(matches)
    return profile_funnel(ds, PARAMS, num_partitions=8).to_pandas()


def test_profile_matches_oracle_exactly(engine_df, matches):
    want = oracle_profile(matches, PARAMS)
    got = engine_df
    assert list(got.target) == list(want.target)
    for col in ["percentage", "coverage", "score", "chunks_frac",
                "reads", "ureads", "hic_ureads"]:
        np.testing.assert_allclose(got[col].to_numpy(),
                                   want[col].to_numpy(),
                                   rtol=1e-9, atol=1e-9, err_msg=col)
    assert got.refsize.tolist() == want.refsize.tolist()


def test_shadow_ambiguous_matches_deleted(engine_df, matches):
    """Stage 3's pair-deletion rule strips the planted shadow target's
    ambiguous matches (co-occurring with a strong target, almost no
    unique support) — the MegaPath ambiguity-correction scenario.  The
    shadow keeps only its few unique reads and collapses to a tiny
    abundance instead of its raw ~30% match share."""
    df = matches.to_pandas()
    raw_t001 = df[df.target == "t001"]["query"].nunique()
    assert raw_t001 > 1000                       # planted: huge raw share
    row = engine_df[engine_df.target == "t001"]
    assert len(row) == 1
    assert float(row.reads.iloc[0]) < 50         # ambiguous matches deleted
    assert float(row.percentage.iloc[0]) < 3.0
    assert engine_df.target.iloc[0] == "t000"


def test_abundances_normalized_and_ranked(engine_df):
    assert abs(engine_df.percentage.sum() - 100.0) < 1e-6
    # output is coverage-descending
    cov = engine_df.coverage.to_numpy()
    assert (np.diff(cov) <= 1e-12).all()
    # planted geometric abundances: t000 dominates
    assert engine_df.target.iloc[0] == "t000"


def test_no_amb_corr_keeps_shadows(ray_session, matches):
    import ray.data
    p = ProfileParams(min_qcov=0.55, min_reads=5, min_uniq_reads=1,
                      min_hic_ureads=0, min_frags_prop=0.0,
                      no_amb_corr=True)
    got = profile_funnel(ray.data.from_arrow(matches), p,
                         num_partitions=8).to_pandas()
    want = oracle_profile(matches, p)
    assert list(got.target) == list(want.target)
    np.testing.assert_allclose(got.percentage.to_numpy(),
                               want.percentage.to_numpy(), rtol=1e-9)
    # with correction off the shadow keeps its ambiguous matches (EM
    # still down-weights them by coverage share) — clearly more reads
    # than the corrected run's ~31
    nc_reads = float(got[got.target == "t001"].reads.iloc[0])
    assert nc_reads > 60


def test_low_abundance_tail_filter(ray_session, matches):
    import ray.data
    p = ProfileParams(min_qcov=0.55, min_reads=5, min_uniq_reads=2,
                      min_hic_ureads=1, min_frags_prop=0.0,
                      low_abc_pct=5.0)
    got = profile_funnel(ray.data.from_arrow(matches), p,
                         num_partitions=8).to_pandas()
    want = oracle_profile(matches, p)
    assert list(got.target) == list(want.target)
    np.testing.assert_allclose(got.percentage.to_numpy(),
                               want.percentage.to_numpy(), rtol=1e-9)
    assert abs(got.percentage.sum() - 100.0) < 1e-6


def test_norm_abund_min_max(ray_session, matches):
    import ray.data
    for norm in ("min", "max"):
        p = ProfileParams(min_qcov=0.55, min_reads=5, min_uniq_reads=2,
                          min_hic_ureads=1, min_frags_prop=0.0,
                          norm_abund=norm)
        got = profile_funnel(ray.data.from_arrow(matches), p,
                             num_partitions=8).to_pandas()
        want = oracle_profile(matches, p)
        assert list(got.target) == list(want.target), norm
        np.testing.assert_allclose(got.coverage.to_numpy(),
                                   want.coverage.to_numpy(), rtol=1e-9,
                                   err_msg=norm)


def test_empty_matches(ray_session):
    import pyarrow as pa
    import ray.data
    empty = pa.table({"query": pa.array([], pa.string()),
                      "target": pa.array([], pa.string()),
                      "qcov": pa.array([], pa.float64()),
                      "q_kept": pa.array([], pa.int64()),
                      "t_kept": pa.array([], pa.int64())})
    out = profile_funnel(ray.data.from_arrow(empty), PARAMS,
                         num_partitions=4).to_pandas()
    assert len(out) == 0


def test_depth_stddev_filter_chunked(ray_session):
    """A7: a target whose coverage concentrates in one of 8 chunks has
    rel-depth stddev ~2.65 > 2.0 and must be dropped; an evenly-covered
    target stays.  Engine == oracle on chunk-aware matches."""
    import pyarrow as pa
    import ray.data
    rows = {"query": [], "target": [], "qcov": [], "q_kept": [],
            "t_kept": [], "chunk": [], "nchunk": []}
    qn = 0
    for name, spiky in [("even", False), ("spiky", True)]:
        for i in range(200):
            rows["query"].append(f"q{qn:05d}"); qn += 1
            rows["target"].append(name)
            rows["qcov"].append(0.9)
            rows["q_kept"].append(50)
            rows["t_kept"].append(1000)
            rows["chunk"].append(0 if spiky else i % 8)
            rows["nchunk"].append(8)
    tbl = pa.table({k: pa.array(v) for k, v in rows.items()})
    p = ProfileParams(min_qcov=0.5, min_reads=5, min_uniq_reads=2,
                      min_hic_ureads=1, min_frags_prop=0.0,
                      max_frags_depth_stdev=2.0)
    got = profile_funnel(ray.data.from_arrow(tbl), p, num_partitions=4,
                         chunk_col="chunk", nchunk_col="nchunk").to_pandas()
    assert set(got.target) == {"even"}
    want = oracle_profile(tbl, p)
    assert list(got.target) == list(want.target)
    np.testing.assert_allclose(got.coverage.to_numpy(),
                               want.coverage.to_numpy(), rtol=1e-9)
    np.testing.assert_allclose(got.chunks_frac.to_numpy(),
                               want.chunks_frac.to_numpy(), rtol=1e-9)
    # relaxing the gate keeps both
    p2 = ProfileParams(min_qcov=0.5, min_reads=5, min_uniq_reads=2,
                       min_hic_ureads=1, min_frags_prop=0.0,
                       max_frags_depth_stdev=5.0)
    got2 = profile_funnel(ray.data.from_arrow(tbl), p2, num_partitions=4,
                          chunk_col="chunk", nchunk_col="nchunk").to_pandas()
    assert set(got2.target) == {"even", "spiky"}
