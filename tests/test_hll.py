"""HyperLogLog sketch tests: estimator accuracy on known cardinalities
and exact register math."""

import numpy as np
import pyarrow as pa
import ray.data

from kmcp_ray import hashing, hll


def test_registers_rank_math_exact():
    p = 12
    # hand-built hashes: reg = top 12 bits, suffix w controls rank
    # w = 2^51 -> bit length 52 -> rank 1;  w = 1 -> rank 52;  w = 0 -> 53
    h = np.array([(5 << 52) | (1 << 51), (6 << 52) | 1, (7 << 52)],
                 dtype=np.uint64)
    regs = hll._registers(h, p)
    assert regs[5] == 1 and regs[6] == 52 and regs[7] == 53
    assert int((regs != 0).sum()) == 3


def test_estimate_accuracy_on_known_cardinalities():
    rng = np.random.default_rng(3)
    for n in [100, 5000, 200000]:
        # uniform random 64-bit hashes stand in for hashed distinct keys
        h = rng.integers(0, 1 << 63, size=n, dtype=np.int64) \
            .astype(np.uint64) * np.uint64(2) + np.uint64(1)
        h = hashing.splitmix64(h)
        est = hll.estimate(hll._registers(np.unique(h), 12))
        assert abs(est - n) / n < 0.06, (n, est)


def test_shingle_hll_estimates_distinct_shingles(ray_session):
    texts = [f"a{i} b{i} c{i} d{i} e{i}" for i in range(2000)] * 3
    ds = ray.data.from_arrow(pa.table({"text": pa.array(texts, pa.string())}))
    # 3 shingles per distinct doc -> 6000 distinct shingles, tripled rows
    regs, est = hll.shingle_hll(ds, k=3, p=12)
    assert abs(est - 6000) / 6000 < 0.06, est
    hist = hll.register_histogram(regs)
    assert int(pa.compute.sum(hist.column("n_registers")).as_py()) == 4096
    # merging batch rows is order-independent: same corpus in one batch
    ds1 = ray.data.from_arrow(pa.table({"text": pa.array(texts)})) \
        .repartition(1)
    regs1, est1 = hll.shingle_hll(ds1, k=3, p=12)
    assert np.array_equal(regs, regs1) and est == est1
