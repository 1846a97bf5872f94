"""Unit tests for the ordered/windowed operators (kmcp_ray/windows.py)
against constructed corpora with hand-computed expectations."""

import numpy as np
import pyarrow as pa
import ray.data

from kmcp_ray import windows

_US = 1_000_000
_MIN = 60 * _US


def _ts(minutes):
    return pa.array((np.asarray(minutes, np.int64) * _MIN),
                    pa.timestamp("us"))


def test_sessionize_gap_boundaries(ray_session):
    # user 0: events at 0, 30, 61 min  (gap=30 → 30-min step stays in
    # session: 30*60e6 us is NOT > gap; 31-min step breaks)
    # user 1: single event
    t = pa.table({
        "event_id": pa.array([0, 1, 2, 3], pa.int64()),
        "ts": _ts([0, 30, 61, 5]),
        "user_id": pa.array([0, 0, 0, 1], pa.int64()),
        "value": pa.array([1.25, 2.50, 4.00, 0.10], pa.float64()),
    })
    out = sorted(windows.sessionize(ray.data.from_arrow(t),
                                    gap_minutes=30).take_all(),
                 key=lambda r: (r["user_id"], r["session_id"]))
    assert [(r["user_id"], r["session_id"], r["n_events"], r["sum_cents"])
            for r in out] == [(0, 0, 2, 375), (0, 1, 1, 400), (1, 0, 1, 10)]
    assert out[0]["t_start_us"] == 0
    assert out[0]["t_end_us"] == 30 * _MIN
    assert out[1]["t_start_us"] == 61 * _MIN


def test_sessionize_ties_ordered_by_event_id(ray_session):
    # two events with the SAME timestamp: deterministic (ts, event_id)
    # order, zero gap between them keeps one session
    t = pa.table({
        "event_id": pa.array([5, 4], pa.int64()),
        "ts": _ts([10, 10]),
        "user_id": pa.array([7, 7], pa.int64()),
        "value": pa.array([1.0, 2.0], pa.float64()),
    })
    out = windows.sessionize(ray.data.from_arrow(t)).take_all()
    assert len(out) == 1 and out[0]["n_events"] == 2
    assert out[0]["sum_cents"] == 300


def test_asof_join_picks_latest_prior(ray_session):
    ev = pa.table({
        "event_id": pa.array([0, 1, 2, 3], pa.int64()),
        "ts": _ts([5, 15, 25, 8]),
        "user_id": pa.array([1, 1, 1, 2], pa.int64()),
    })
    od = pa.table({
        "o_orderkey": pa.array([100, 101, 102, 200], pa.int64()),
        "o_custkey": pa.array([1, 1, 1, 3], pa.int64()),
        "o_orderdate": _ts([10, 20, 10, 1]),   # 102 ties 100 at t=10
    })
    out = {r["event_id"]: r
           for r in windows.asof_join(ray.data.from_arrow(ev),
                                      ray.data.from_arrow(od)).take_all()}
    assert out[0]["o_orderkey"] is None        # no order at/before t=5
    assert out[1]["o_orderkey"] == 102         # tie at t=10 → max key
    assert out[1]["o_orderdate_us"] == 10 * _MIN
    assert out[2]["o_orderkey"] == 101         # latest prior is t=20
    assert out[3]["o_orderkey"] is None        # user 2 has no orders
    assert len(out) == 4


def test_range_join_window_bounds(ray_session):
    # right rows at t = 0, 50, 100 min; window = 1 day means all are in
    # range of a left at t=100; shrink via minutes→days scaling: use
    # window_days=0 is degenerate, so place rows days apart instead.
    day = 24 * 60
    ev = pa.table({"event_id": pa.array([0, 1], pa.int64()),
                   "ts": _ts([10 * day, 0]),
                   "user_id": pa.array([1, 1], pa.int64())})
    od = pa.table({"o_orderkey": pa.array([100, 101, 102], pa.int64()),
                   "o_custkey": pa.array([1, 1, 1], pa.int64()),
                   "o_orderdate": _ts([8 * day, 10 * day, 3 * day])})
    out = windows.range_join(ray.data.from_arrow(ev),
                             ray.data.from_arrow(od),
                             window_days=5).take_all()
    pairs = sorted((r["left_id"], r["right_id"]) for r in out)
    # left 0 at day 10: right in (day 5, day 10] → keys 100 (day 8) and
    # 101 (day 10, inclusive); 102 (day 3) is outside.  left 1 at day 0:
    # only rows in (day -5, day 0] → none.
    assert pairs == [(0, 100), (0, 101)]
    assert all(r["key"] == 1 for r in out)


def test_asof_join_exact_timestamp_inclusive(ray_session):
    ev = pa.table({"event_id": pa.array([9], pa.int64()),
                   "ts": _ts([10]),
                   "user_id": pa.array([1], pa.int64())})
    od = pa.table({"o_orderkey": pa.array([7], pa.int64()),
                   "o_custkey": pa.array([1], pa.int64()),
                   "o_orderdate": _ts([10])})
    out = windows.asof_join(ray.data.from_arrow(ev),
                            ray.data.from_arrow(od)).take_all()
    assert out[0]["o_orderkey"] == 7           # <= is inclusive


def test_hopping_window_membership_invariant(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data
    from kmcp_ray import windows
    n = 200
    ts = pa.array((np.arange(n, dtype=np.int64) * 137_000_000 + 5),
                  pa.timestamp("us"))
    val = pa.array(np.ones(n), pa.float64())
    ds = ray.data.from_arrow(pa.table({"ts": ts, "value": val}))
    out = windows.hopping_window_agg(ds).to_pandas()
    # every event lands in exactly size/hop = 4 windows
    assert out["n"].sum() == 4 * n
    assert out["sum_cents"].sum() == 4 * n * 100
    # each event's 4 window ids are consecutive and cover its timestamp
    base = (np.arange(n, dtype=np.int64) * 137_000_000 + 5) // 900_000_000
    want = np.unique(np.concatenate([base - k for k in range(4)]))
    assert np.array_equal(np.sort(out["win_id"].to_numpy()), want)


def test_running_window_invariants(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data
    from kmcp_ray import windows
    n = 60
    rng = np.random.RandomState(3)
    t = pa.table({
        "event_id": pa.array(np.arange(n), pa.int64()),
        "user_id": pa.array(rng.randint(0, 4, n), pa.int64()),
        "ts": pa.array(rng.randint(0, 10**9, n).astype("datetime64[us]"),
                       pa.timestamp("us")),
        "value": pa.array(rng.uniform(0, 50, n), pa.float64())})
    out = windows.running_window(ray.data.from_arrow(t), window_rows=3) \
        .to_pandas().sort_values(["user_id", "rn"])
    for uid, g in out.groupby("user_id"):
        # running total is the cumsum of per-row deltas
        deltas = g["run_cents"].diff().fillna(g["run_cents"].iloc[0])
        assert (np.cumsum(deltas) == g["run_cents"]).all()
        # rolling equals running for the first W rows, window-sum after
        w = 3
        rc, rl = g["run_cents"].to_numpy(), g["roll_cents"].to_numpy()
        assert (rl[:w] == rc[:w]).all()
        assert (rl[w:] == rc[w:] - rc[:-w]).all()


def test_event_funnel_strict_order(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data
    from kmcp_ray import windows
    US = 1_000_000

    def ev(uid, t, typ):
        return (uid, t * US, typ)

    rows = [
        # user 1 completes a->b->c in order
        ev(1, 10, "a"), ev(1, 20, "b"), ev(1, 30, "c"),
        # user 2: b BEFORE a -> stalls at step 1 (a only)
        ev(2, 5, "b"), ev(2, 10, "a"),
        # user 3: a and b at the SAME ts -> strict > rejects b
        ev(3, 7, "a"), ev(3, 7, "b"),
        # user 4: greedy earliest-a (t=1) lets the late b (t=2) count
        ev(4, 1, "a"), ev(4, 9, "a"), ev(4, 2, "b"),
        # user 5: only c -> counted nowhere
        ev(5, 3, "c"),
    ]
    t = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array(np.array([r[1] for r in rows], np.int64),
                       pa.timestamp("us")),
        "event_type": pa.array([r[2] for r in rows], pa.string())})
    out = windows.event_funnel(ray.data.from_arrow(t), ["a", "b", "c"]) \
        .to_pandas()
    assert out.step.tolist() == [1, 2, 3]
    assert out.event_type.tolist() == ["a", "b", "c"]
    assert out.n_users.tolist() == [4, 2, 1]   # a: u1,2,3,4; b: u1,u4; c: u1
