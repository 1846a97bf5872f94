"""Ordered / windowed operators: gap sessionization and as-of join.

Ray Data has no native window or as-of primitives; both operators here
follow the composition rule the survey prescribes (SURVEY §2 / custom
operators): ONE ``groupby(key)`` shuffle, then fully vectorized
order-dependent kernels inside ``map_groups`` — the same
partition-then-sweep shape as the BED6 merge-regions port
(kmcp/cmd/merge-regions.go analogue, regions.py).

Partitioning assumption: one group = one user/key fits a worker.  For a
pathological hot key (one user with billions of events), pre-split by
time range and stitch boundary sessions in a second tiny pass — the
same salt-and-recurse treatment the LSH buckets get (buckets.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_US = 1_000_000


def _epoch_us(col: "pa.ChunkedArray | pa.Array") -> np.ndarray:
    """timestamp[us] column → int64 epoch microseconds."""
    import pyarrow.compute as pc
    return pc.cast(col, pa.int64()).to_numpy(zero_copy_only=False)


def sessionize(events_ds, gap_minutes: int = 30, *, user_col="user_id",
               ts_col="ts", id_col="event_id", value_col="value"):
    """Gap-based sessionization: a new session starts when the time
    since the user's previous event exceeds ``gap_minutes``.

    Emits one row per session: ``(user_id, session_id, n_events,
    t_start_us, t_end_us, sum_cents)`` with ``session_id`` the 0-based
    session rank within the user and ``sum_cents`` the integer-cents
    value total (floats summed as integers so engine and SQL agree
    bit-exactly).  Ordering inside a user is ``(ts, event_id)`` — a
    deterministic total order even with equal timestamps."""
    gap_us = int(gap_minutes) * 60 * _US

    def per_user(group: pa.Table) -> pa.Table:
        n = group.num_rows
        uid = group.column(user_col)[0].as_py()
        ts = _epoch_us(group.column(ts_col))
        eid = group.column(id_col).to_numpy(zero_copy_only=False)
        val = group.column(value_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts))
        ts, val = ts[order], val[order]
        new_sess = np.ones(n, dtype=bool)
        new_sess[1:] = (ts[1:] - ts[:-1]) > gap_us
        sid = np.cumsum(new_sess) - 1
        starts = np.nonzero(new_sess)[0]
        counts = np.diff(np.append(starts, n))
        cents = np.rint(val * 100.0).astype(np.int64)
        sum_cents = np.add.reduceat(cents, starts)
        t_end = ts[np.append(starts[1:], n) - 1]
        return pa.table({
            "user_id": pa.array(np.full(len(starts), uid), pa.int64()),
            "session_id": pa.array(sid[starts], pa.int64()),
            "n_events": pa.array(counts.astype(np.int64), pa.int64()),
            "t_start_us": pa.array(ts[starts], pa.int64()),
            "t_end_us": pa.array(t_end, pa.int64()),
            "sum_cents": pa.array(sum_cents, pa.int64()),
        })

    return events_ds.groupby(user_col).map_groups(per_user,
                                                  batch_format="pyarrow")


def asof_join(events_ds, orders_ds, *, left_key="user_id", left_ts="ts",
              left_id="event_id", right_key="o_custkey",
              right_ts="o_orderdate", right_val="o_orderkey",
              num_partitions: int = 64):
    """As-of (most-recent-prior) join: each left row picks the right row
    with the greatest ``right_ts <= left_ts`` for the same key.

    Right-side ties on (key, ts) are resolved deterministically by
    keeping the max ``right_val``.  Shape: both sides are tagged and
    unioned so ONE ``groupby(key)`` co-locates them; inside a group the
    match is a single ``searchsorted`` over the sorted right side — no
    driver state, no broadcast, works when both sides are huge.  Emits
    ``(event_id, user_id, ts_us, o_orderkey, o_orderdate_us)`` with
    nulls where no prior right row exists."""
    def tag_left(t: pa.Table) -> pa.Table:
        return pa.table({
            "k": t.column(left_key).cast(pa.int64()),
            "tus": pa.array(_epoch_us(t.column(left_ts)), pa.int64()),
            "rid": t.column(left_id).cast(pa.int64()),
            "side": pa.array(np.zeros(t.num_rows, np.int8), pa.int8()),
        })

    def tag_right(t: pa.Table) -> pa.Table:
        return pa.table({
            "k": t.column(right_key).cast(pa.int64()),
            "tus": pa.array(_epoch_us(t.column(right_ts)), pa.int64()),
            "rid": t.column(right_val).cast(pa.int64()),
            "side": pa.array(np.ones(t.num_rows, np.int8), pa.int8()),
        })

    both = events_ds.map_batches(tag_left, batch_format="pyarrow",
                                 zero_copy_batch=True) \
        .union(orders_ds.map_batches(tag_right, batch_format="pyarrow",
                                     zero_copy_batch=True))

    def per_key(group: pa.Table) -> pa.Table:
        k = group.column("k")[0].as_py()
        side = group.column("side").to_numpy(zero_copy_only=False)
        tus = group.column("tus").to_numpy(zero_copy_only=False)
        rid = group.column("rid").to_numpy(zero_copy_only=False)
        lm = side == 0
        le_t, le_id = tus[lm], rid[lm]
        if not len(le_t):
            return pa.table({
                "event_id": pa.array([], pa.int64()),
                "user_id": pa.array([], pa.int64()),
                "ts_us": pa.array([], pa.int64()),
                "o_orderkey": pa.array([], pa.int64()),
                "o_orderdate_us": pa.array([], pa.int64())})
        rt, rv = tus[~lm], rid[~lm]
        if len(rt):
            # dedupe right side per ts: keep max val (deterministic tie)
            o = np.lexsort((rv, rt))
            rt, rv = rt[o], rv[o]
            last = np.append(rt[1:] != rt[:-1], True)
            rt, rv = rt[last], rv[last]
            pos = np.searchsorted(rt, le_t, side="right") - 1
            ok = pos >= 0
            okey = np.where(ok, rv[np.maximum(pos, 0)], 0)
            odate = np.where(ok, rt[np.maximum(pos, 0)], 0)
        else:
            ok = np.zeros(len(le_t), bool)
            okey = odate = np.zeros(len(le_t), np.int64)
        return pa.table({
            "event_id": pa.array(le_id, pa.int64()),
            "user_id": pa.array(np.full(len(le_t), k), pa.int64()),
            "ts_us": pa.array(le_t, pa.int64()),
            "o_orderkey": pa.array(okey.astype(np.int64), pa.int64(),
                                   mask=~ok),
            "o_orderdate_us": pa.array(odate.astype(np.int64), pa.int64(),
                                       mask=~ok),
        })

    return both.groupby("k").map_groups(per_key, batch_format="pyarrow")


def range_join(events_ds, orders_ds, window_days: int = 30, *,
               left_key="user_id", left_ts="ts", left_id="event_id",
               right_key="o_custkey", right_ts="o_orderdate",
               right_val="o_orderkey"):
    """Range (interval) join: every (event, order) pair with the same
    key where ``right_ts <= left_ts < right_ts + window``.

    Same tag/union/one-groupby shape as :func:`asof_join`; inside a
    group each event's matching order index range is TWO searchsorted
    calls (window lower/upper bound) and the pair expansion is a
    vectorized repeat+gather — per-group cost is O((n+m) log m + pairs),
    never the n×m nested loop.  Fan-out is bounded by orders-per-window,
    the analogue of the LSH bucket-size cap (buckets.py)."""
    window_us = int(window_days) * 86_400 * _US

    def tag(side_val, key, ts, idc):
        def fn(t: pa.Table) -> pa.Table:
            return pa.table({
                "k": t.column(key).cast(pa.int64()),
                "tus": pa.array(_epoch_us(t.column(ts)), pa.int64()),
                "rid": t.column(idc).cast(pa.int64()),
                "side": pa.array(np.full(t.num_rows, side_val, np.int8),
                                 pa.int8()),
            })
        return fn

    both = events_ds.map_batches(tag(0, left_key, left_ts, left_id),
                                 batch_format="pyarrow",
                                 zero_copy_batch=True) \
        .union(orders_ds.map_batches(tag(1, right_key, right_ts, right_val),
                                     batch_format="pyarrow",
                                     zero_copy_batch=True))

    _EMPTY = pa.table({"left_id": pa.array([], pa.int64()),
                       "key": pa.array([], pa.int64()),
                       "right_id": pa.array([], pa.int64()),
                       "right_ts_us": pa.array([], pa.int64())})

    def per_key(group: pa.Table) -> pa.Table:
        k = group.column("k")[0].as_py()
        side = group.column("side").to_numpy(zero_copy_only=False)
        tus = group.column("tus").to_numpy(zero_copy_only=False)
        rid = group.column("rid").to_numpy(zero_copy_only=False)
        lm = side == 0
        le_t, le_id = tus[lm], rid[lm]
        rt, rv = tus[~lm], rid[~lm]
        if not len(le_t) or not len(rt):
            return _EMPTY
        o = np.argsort(rt, kind="stable")
        rt, rv = rt[o], rv[o]
        lo = np.searchsorted(rt, le_t - window_us, side="right")
        hi = np.searchsorted(rt, le_t, side="right")
        counts = hi - lo
        tot = int(counts.sum())
        if tot == 0:
            return _EMPTY
        # repeat+gather pair expansion (bands._segment_gather pattern)
        excl = np.concatenate(([0], np.cumsum(counts)[:-1]))
        idx = np.repeat(lo - excl, counts) + np.arange(tot)
        return pa.table({
            "left_id": pa.array(np.repeat(le_id, counts), pa.int64()),
            "key": pa.array(np.full(tot, k), pa.int64()),
            "right_id": pa.array(rv[idx], pa.int64()),
            "right_ts_us": pa.array(rt[idx], pa.int64()),
        })

    return both.groupby("k").map_groups(per_key, batch_format="pyarrow")


# --------------------------------------------------- per-group top-k

def _topk_per_group(g: np.ndarray, v: np.ndarray, ids: np.ndarray, k: int):
    """Row indices of the top-k rows per group under the total order
    (v desc, id asc), plus each kept row's 1-based rank.  Vectorized:
    one lexsort + segment arithmetic, no per-group Python."""
    if len(g) == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    _, gc = np.unique(g, return_inverse=True)
    order = np.lexsort((ids, -v, gc))
    gs = gc[order]
    new = np.concatenate(([True], gs[1:] != gs[:-1]))
    starts = np.nonzero(new)[0]
    lens = np.diff(np.append(starts, len(gs)))
    rank = np.arange(len(gs)) - np.repeat(starts, lens)
    keep = rank < k
    return order[keep], rank[keep] + 1


def group_topk(ds, k: int = 10, *, group_col: str = "lang",
               order_col: str = "n_chars", id_col: str = "doc_id"):
    """Per-group top-k rows by (order_col desc, id asc) with 1-based
    rank — the ``ROW_NUMBER() OVER (PARTITION BY g ORDER BY v DESC)``
    window Ray Data lacks (kmcp analogue: --keep-top-scores per-query
    top-N, kmcp/cmd/util-db-search.go:284-311, semantics re-derived).

    Two-level: a map-side combiner keeps ≤k rows per group per block
    (so the shuffle moves at most k·groups·blocks rows, never the
    corpus), then one small ``groupby(group)`` finalizes ranks.  Ties
    broken by id so output is deterministic."""
    def cols(t: pa.Table):
        return (t.column(group_col).to_numpy(zero_copy_only=False),
                t.column(order_col).to_numpy(zero_copy_only=False)
                    .astype(np.int64),
                t.column(id_col).to_numpy(zero_copy_only=False)
                    .astype(np.int64))

    def partial(t: pa.Table) -> pa.Table:
        g, v, ids = cols(t)
        keep, _ = _topk_per_group(g, v, ids, k)
        return pa.table({group_col: pa.array(g[keep]),
                         order_col: pa.array(v[keep], pa.int64()),
                         id_col: pa.array(ids[keep], pa.int64())})

    def final(t: pa.Table) -> pa.Table:
        g, v, ids = cols(t)
        keep, rnk = _topk_per_group(g, v, ids, k)
        return pa.table({group_col: pa.array(g[keep]),
                         id_col: pa.array(ids[keep], pa.int64()),
                         order_col: pa.array(v[keep], pa.int64()),
                         "rnk": pa.array(rnk, pa.int64())})

    part = ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
    return part.groupby(group_col).map_groups(final, batch_format="pyarrow")


def hopping_window_agg(events_ds, *, size_us: int = 3_600_000_000,
                       hop_us: int = 900_000_000, ts_col: str = "ts",
                       value_col: str = "value"):
    """Hopping (sliding) window aggregate: ``(win_id, n, sum_cents)``
    where window ``w`` covers ``[w*hop, w*hop + size)`` — every event
    lands in exactly ``size/hop`` consecutive windows.

    The one windowed shape tumbling groupbys can't express: per batch a
    vectorized ``np.repeat``/tile expands each event into its
    ``size/hop`` window ids and PRE-AGGREGATES within the batch, so the
    shuffle moves one row per (block, window), never ``size/hop`` rows
    per event.  ``hop_us`` must divide ``size_us`` (windows stay
    aligned; same integer-microsecond parity rule as
    relops.events_hourly_user)."""
    import pyarrow.compute as pc

    if size_us % hop_us:
        raise ValueError("hop_us must divide size_us")
    ratio = size_us // hop_us

    def partial(t: pa.Table) -> pa.Table:
        ts = _epoch_us(t.column(ts_col))
        cents = pc.cast(pc.floor(pc.multiply(
            t.column(value_col), pa.scalar(100.0))), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        base = ts // hop_us
        wins = (np.repeat(base, ratio)
                - np.tile(np.arange(ratio, dtype=np.int64), len(base)))
        c = np.repeat(cents, ratio)
        u, inv = np.unique(wins, return_inverse=True)
        return pa.table({
            "win_id": pa.array(u, pa.int64()),
            "n": pa.array(np.bincount(inv).astype(np.int64), pa.int64()),
            "sum_cents": pa.array(
                np.bincount(inv, weights=c).astype(np.int64), pa.int64())})

    from ray.data.aggregate import Sum
    return events_ds.map_batches(partial, batch_format="pyarrow",
                                 zero_copy_batch=True) \
        .groupby("win_id").aggregate(Sum(on="n", alias_name="n"),
                                     Sum(on="sum_cents",
                                         alias_name="sum_cents"))


def running_window(events_ds, window_rows: int = 3, *, user_col="user_id",
                   ts_col="ts", id_col="event_id", value_col="value"):
    """Per-key cumulative AND last-N-rows rolling aggregates — the SQL
    ``sum() OVER (PARTITION BY key ORDER BY ts ROWS ...)`` pair, one
    output row per event: ``(event_id, user_id, ts_us, rn, run_cents,
    roll_cents)`` where ``rn`` is the 1-based rank inside the user,
    ``run_cents`` the unbounded-preceding running total and
    ``roll_cents`` the ``window_rows``-row trailing sum (both integer
    cents, same derivation as :func:`sessionize` so engine and SQL are
    bit-exact).

    Shape: one ``groupby(user)`` shuffle; inside a group the whole
    window family is two ``np.cumsum`` lines — per-key history never
    leaves its partition, and group size is bounded by the busiest
    key, not the corpus."""
    W = int(window_rows)

    def per_user(group: pa.Table) -> pa.Table:
        n = group.num_rows
        uid = group.column(user_col)[0].as_py()
        ts = _epoch_us(group.column(ts_col))
        eid = group.column(id_col).to_numpy(zero_copy_only=False)
        val = group.column(value_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts))
        ts, eid = ts[order], eid[order]
        cents = np.rint(val[order] * 100.0).astype(np.int64)
        cum = np.cumsum(cents)
        roll = cum.copy()
        if n > W:
            roll[W:] = cum[W:] - cum[:-W]
        return pa.table({
            "event_id": pa.array(eid, pa.int64()),
            "user_id": pa.array(np.full(n, uid), pa.int64()),
            "ts_us": pa.array(ts, pa.int64()),
            "rn": pa.array(np.arange(1, n + 1, dtype=np.int64), pa.int64()),
            "run_cents": pa.array(cum, pa.int64()),
            "roll_cents": pa.array(roll, pa.int64()),
        })

    return events_ds.groupby(user_col).map_groups(per_user,
                                                  batch_format="pyarrow")


def cohort_retention(events_ds, *, user_col="user_id", ts_col="ts"):
    """Cohort-retention matrix: users bucketed by their FIRST active
    day (the cohort), counted per ``(cohort_day, day_offset)`` cell —
    the standard activity-retention analytics query, here as a
    two-stage streaming aggregation:

    1. map-side distinct ``(user, day)`` per batch (one lexsort) — the
       shuffle moves one row per user-day per block, never one per
       event;
    2. ``groupby(user)``: the user's whole day set lands in one group,
       ``cohort = min(day)``, one output row per distinct day;
    3. a cell-sized ``groupby((cohort, offset)).count`` — rows are
       already distinct per user, so ``count == distinct users``.

    Day = ``epoch_us // 86_400_000_000`` (integer UTC bucketing, the
    same frozen arithmetic as the SQL oracle)."""
    DAY = 86_400_000_000

    def slim(t: pa.Table) -> pa.Table:
        uid = t.column(user_col).to_numpy(zero_copy_only=False)
        day = _epoch_us(t.column(ts_col)) // DAY
        order = np.lexsort((day, uid))
        u_s, d_s = uid[order], day[order]
        first = np.ones(len(u_s), dtype=bool)
        first[1:] = (u_s[1:] != u_s[:-1]) | (d_s[1:] != d_s[:-1])
        return pa.table({"user_id": pa.array(u_s[first], pa.int64()),
                         "day": pa.array(d_s[first], pa.int64())})

    def per_user(group: pa.Table) -> pa.Table:
        days = np.unique(group.column("day").to_numpy(zero_copy_only=False))
        cohort = days[0]
        return pa.table({
            "cohort_day": pa.array(np.full(len(days), cohort), pa.int64()),
            "day_offset": pa.array(days - cohort, pa.int64())})

    from ray.data.aggregate import Count
    return events_ds.map_batches(slim, batch_format="pyarrow",
                                 zero_copy_batch=True) \
        .groupby("user_id").map_groups(per_user, batch_format="pyarrow") \
        .groupby(["cohort_day", "day_offset"]) \
        .aggregate(Count(alias_name="n_users"))


def event_funnel(events_ds, steps, *, user_col="user_id", ts_col="ts",
                 type_col="event_type", num_partitions: int = 64):
    """Ordered-funnel conversion: how many users completed step 1, then
    step 2 STRICTLY later, then step 3 strictly later than that, ...
    Each step's completion time is the user's EARLIEST qualifying event
    (min ts with ``ts > t_prev``), so a user is counted for step i iff
    the greedy earliest-completion chain reaches i — the standard
    product-analytics funnel.

    Shape: map-side filter to funnel-relevant event types (the shuffle
    moves only those rows, as (part, uid, ts, step-code) — no strings),
    ONE hash-partition exchange on ``user_id``, then a fully vectorized
    per-partition sweep: one lexsort, then per step one mask +
    first-occurrence ``np.unique`` across ALL users in the partition at
    once — no per-user Python loop.  Per-partition step counts reduce
    through a K-row ``groupby(step).sum``.

    Returns ``(step, event_type, n_users)``, one row per step."""
    import ray.data  # noqa: F401  (Dataset ops on events_ds)
    from kmcp_ray import hashing

    steps = list(steps)
    K = len(steps)
    P = num_partitions
    code_of = {s: i for i, s in enumerate(steps)}
    I64MIN = np.iinfo(np.int64).min

    def slim(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        m = pc.is_in(t[type_col], value_set=pa.array(steps))
        tt = t.filter(m)
        uid = tt.column(user_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ts = _epoch_us(tt.column(ts_col))
        typ = tt.column(type_col).to_numpy(zero_copy_only=False)
        code = np.array([code_of[x] for x in typ], dtype=np.int8)
        part = (hashing.splitmix64(uid.astype(np.uint64))
                % np.uint64(P)).astype(np.int32)
        return pa.table({"part": pa.array(part),
                         "uid": pa.array(uid, pa.int64()),
                         "ts": pa.array(ts, pa.int64()),
                         "code": pa.array(code, pa.int8())})

    def sweep(g: pa.Table) -> pa.Table:
        uid = g.column("uid").to_numpy(zero_copy_only=False)
        ts = g.column("ts").to_numpy(zero_copy_only=False)
        code = g.column("code").to_numpy(zero_copy_only=False)
        order = np.lexsort((ts, uid))
        uid, ts, code = uid[order], ts[order], code[order]
        _uu, inv = np.unique(uid, return_inverse=True)
        n_u = len(_uu)
        tprev = np.full(n_u, I64MIN)
        reach = np.ones(n_u, dtype=bool)
        counts = np.zeros(K, dtype=np.int64)
        for s in range(K):
            cand = (code == s) & reach[inv] & (ts > tprev[inv])
            ui, first = np.unique(inv[cand], return_index=True)
            reach = np.zeros(n_u, dtype=bool)
            reach[ui] = True
            tprev = np.full(n_u, I64MIN)
            tprev[ui] = ts[cand][first]
            counts[s] = len(ui)
        return pa.table({"step": pa.array(np.arange(K, dtype=np.int64)),
                         "n": pa.array(counts, pa.int64())})

    from ray.data.aggregate import Sum
    agg = events_ds.map_batches(slim, batch_format="pyarrow",
                                zero_copy_batch=True) \
        .groupby("part").map_groups(sweep, batch_format="pyarrow") \
        .groupby("step").aggregate(Sum("n", alias_name="n_users"))

    names = pa.array(steps, pa.string())

    def label(t: pa.Table) -> pa.Table:
        st = t.column("step").to_numpy(zero_copy_only=False)
        return pa.table({
            "step": pa.array(st + 1, pa.int64()),
            "event_type": names.take(pa.array(st, pa.int64())),
            "n_users": t["n_users"].cast(pa.int64())})

    return agg.map_batches(label, batch_format="pyarrow",
                           zero_copy_batch=True).sort("step")
