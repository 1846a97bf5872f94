"""joins.hash_join: all four modes vs DuckDB on duplicate-key data."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

MODES = [
    ("inner", "SELECT L.k, lv, ls, rv FROM L JOIN R ON L.k = R.k"),
    ("left", "SELECT L.k, lv, ls, rv FROM L LEFT JOIN R ON L.k = R.k"),
    ("semi", "SELECT k, lv, ls FROM L "
             "WHERE EXISTS (SELECT 1 FROM R WHERE R.k = L.k)"),
    ("anti", "SELECT k, lv, ls FROM L "
             "WHERE NOT EXISTS (SELECT 1 FROM R WHERE R.k = L.k)"),
]


@pytest.fixture(scope="module")
def sides():
    rng = np.random.RandomState(7)
    left = pa.table({
        "k": pa.array(rng.randint(0, 30, 200), pa.int64()),
        "lv": pa.array(rng.randint(0, 1000, 200), pa.int64()),
        "ls": pa.array([f"s{i % 5}" for i in range(200)], pa.string())})
    right = pa.table({
        "k": pa.array(rng.randint(10, 40, 120), pa.int64()),
        "rv": pa.array(rng.uniform(0, 1, 120), pa.float64())})
    con = duckdb.connect()
    con.register("L", left.to_pandas())
    con.register("R", right.to_pandas())
    return left, right, con


@pytest.mark.parametrize("how,sql", MODES)
def test_hash_join_matches_duckdb(ray_session, sides, how, sql):
    import ray.data
    from kmcp_ray.joins import hash_join
    left, right, con = sides
    got = hash_join(ray.data.from_arrow(left), ray.data.from_arrow(right),
                    key="k", how=how,
                    left_cols=[("lv", pa.int64()), ("ls", pa.string())],
                    right_cols=[("rv", pa.float64())], P=8).to_pandas()
    want = con.sql(sql).df()

    def canon(df):
        return df.sort_values(list(df.columns)).reset_index(drop=True)

    pd.testing.assert_frame_equal(canon(got), canon(want),
                                  check_dtype=False)


def test_hash_join_empty_sides(ray_session):
    import ray.data
    from kmcp_ray.joins import hash_join
    left = pa.table({"k": pa.array([1, 2], pa.int64()),
                     "lv": pa.array([10, 20], pa.int64())})
    empty = pa.table({"k": pa.array([], pa.int64())})
    out = hash_join(ray.data.from_arrow(left), ray.data.from_arrow(empty),
                    key="k", how="left",
                    left_cols=[("lv", pa.int64())], P=4).to_pandas()
    assert sorted(out["k"].tolist()) == [1, 2]
    anti = hash_join(ray.data.from_arrow(left), ray.data.from_arrow(empty),
                     key="k", how="anti",
                     left_cols=[("lv", pa.int64())], P=4).to_pandas()
    assert len(anti) == 2


@pytest.mark.parametrize("how,sql", MODES)
def test_broadcast_join_matches_duckdb(ray_session, sides, how, sql):
    import ray.data
    from kmcp_ray.joins import broadcast_hash_join
    left, right, con = sides
    got = broadcast_hash_join(
        ray.data.from_arrow(left), ray.data.from_arrow(right),
        key="k", how=how,
        left_cols=[("lv", pa.int64()), ("ls", pa.string())],
        right_cols=[("rv", pa.float64())]).to_pandas()
    want = con.sql(sql).df()

    def canon(df):
        return df.sort_values(list(df.columns)).reset_index(drop=True)

    pd.testing.assert_frame_equal(canon(got), canon(want),
                                  check_dtype=False)


def test_broadcast_join_row_gate(ray_session, sides):
    import ray.data
    from kmcp_ray.joins import broadcast_hash_join
    left, right, _con = sides
    with pytest.raises(ValueError, match="exceeds"):
        broadcast_hash_join(ray.data.from_arrow(left),
                            ray.data.from_arrow(right), key="k",
                            max_broadcast_rows=10)


def test_hash_join_salted_equals_unsalted(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data
    from kmcp_ray.joins import hash_join
    rng = np.random.default_rng(3)
    # hot key 7 on BOTH sides: 200 probe rows + 3 build rows
    lk = np.concatenate((np.full(200, 7), rng.integers(0, 30, 100)))
    left = pa.table({"k": pa.array(lk, pa.int64()),
                     "lv": pa.array(np.arange(len(lk)), pa.int64())})
    rk = np.concatenate((np.full(3, 7), rng.integers(0, 30, 40)))
    right = pa.table({"k": pa.array(rk, pa.int64()),
                      "rv": pa.array(np.arange(len(rk)), pa.int64())})
    for how in ("inner", "left", "semi", "anti"):
        outs = []
        for s in (1, 4):
            df = hash_join(ray.data.from_arrow(left),
                           ray.data.from_arrow(right),
                           key="k", how=how,
                           left_cols=[("lv", pa.int64())],
                           right_cols=[("rv", pa.int64())],
                           P=8, salt=s).to_pandas()
            outs.append(sorted(map(tuple, df.fillna(-1).values.tolist())))
        assert outs[0] == outs[1], how
        if how == "inner":
            want = int((lk == 7).sum()) * int((rk == 7).sum())
            assert sum(1 for r in outs[0] if r[0] == 7) == want
