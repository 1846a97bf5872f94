"""Relational operators over the synthetic star schema — the
SQL-checkable face of the engine (driver correctness gate runs these
against DuckDB oracles).

Float-sum parity rule: every aggregated money/value column is converted
to integer units (``floor(x * 100)``) BEFORE summing, so Ray's
parallel summation and DuckDB's sequential summation agree exactly.
Window ids use integer microsecond arithmetic for the same reason.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data.aggregate import Count, Max, Min, Sum


def _cents(col, factor: int = 100):
    """floor(x * factor) as int64 — identical IEEE ops in DuckDB/numpy."""
    return pc.cast(pc.floor(pc.multiply(col, pa.scalar(float(factor)))),
                   pa.int64())


# ------------------------------------------------------------ aggregations

def lang_source_agg(docs):
    """documents grouped by (lang, source): n_docs, sum_chars."""
    return docs.groupby(["lang", "source"]).aggregate(
        Count(alias_name="n_docs"), Sum("n_chars", alias_name="sum_chars"))


def events_type_agg(events):
    """events per event_type: n_events, sum_value_cents, min/max cents."""
    def prep(batch: pa.Table) -> pa.Table:
        return pa.table({"event_type": batch.column("event_type"),
                         "value_cents": _cents(batch.column("value"))})
    e = events.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
    return e.groupby("event_type").aggregate(
        Count(alias_name="n_events"),
        Sum("value_cents", alias_name="sum_value_cents"),
        Min("value_cents", alias_name="min_value_cents"),
        Max("value_cents", alias_name="max_value_cents"))


def events_hourly_user(events):
    """Tumbling 1-hour windows per user: (user_id, hour_id, n, sum_cents).

    hour_id = epoch_microseconds // 3_600_000_000 (integer arithmetic —
    exact parity with DuckDB's epoch_us//3600000000).
    """
    def prep(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts")
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        us = ts.cast(pa.int64())
        hour = pc.divide(us, pa.scalar(3_600_000_000, pa.int64()))
        return pa.table({"user_id": batch.column("user_id"),
                         "hour_id": pc.cast(hour, pa.int64()),
                         "value_cents": _cents(batch.column("value"))})
    e = events.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
    return e.groupby(["user_id", "hour_id"]).aggregate(
        Count(alias_name="n"), Sum("value_cents", alias_name="sum_cents"))


def lineitem_pricing(li):
    """TPC-H Q1-shaped summary with integer-cents sums."""
    def prep(batch: pa.Table) -> pa.Table:
        ep = batch.column("l_extendedprice")
        disc = batch.column("l_discount")
        disc_price = pc.multiply(ep, pc.subtract(pa.scalar(1.0), disc))
        return pa.table({
            "l_returnflag": batch.column("l_returnflag"),
            "l_linestatus": batch.column("l_linestatus"),
            "qty_x100": _cents(batch.column("l_quantity")),
            "price_cents": _cents(ep),
            "disc_price_cents": _cents(disc_price),
        })
    p = li.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
    return p.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Count(alias_name="n_rows"),
        Sum("qty_x100", alias_name="sum_qty_x100"),
        Sum("price_cents", alias_name="sum_price_cents"),
        Sum("disc_price_cents", alias_name="sum_disc_price_cents"))


def top_docs_by_len(docs, k: int = 10):
    """Top-k longest documents (ties by doc_id) — global sort + limit."""
    return docs.select_columns(["doc_id", "n_chars", "lang"]) \
        .sort(["n_chars", "doc_id"], descending=[True, False]).limit(k)


# --------------------------------------------- kmcp scalar-function ports

def cov2simi(ds, col: str = "qcov"):
    """kmcp's coverage→similarity polynomial (reference:
    kmcp/cmd/cov2simi.go:114-121, re-derived from its published formula):
    simi = 87.456 + 26.410q - 22.008q^2 + 7.325q^3, clamped to [0,100].
    Output keeps an integer micro-units column for exact comparison."""
    def fn(batch: pa.Table) -> pa.Table:
        q = batch.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        simi = 87.456 + 26.410 * q - 22.008 * q * q + 7.325 * q * q * q
        simi = np.clip(simi, 0.0, 100.0)
        return batch.append_column("simi", pa.array(simi, pa.float64())) \
            .append_column("simi_u", pa.array(
                np.floor(simi * 1e6).astype(np.int64), pa.int64()))
    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


_LFACT = np.zeros(1, dtype=np.float64)   # lfact[i] = log(i!), grown on demand


def _lfact_table(up_to: int) -> np.ndarray:
    """Cached log-factorial table (per process — the kmcp per-worker
    binomial-coefficient cache analogue, reference: util-fpr.go:77-191)."""
    global _LFACT
    if len(_LFACT) <= up_to:
        new_n = max(up_to + 1, 2 * len(_LFACT))
        ext = np.log(np.arange(len(_LFACT), new_n, dtype=np.float64))
        ext[0] = 0.0 if len(_LFACT) == 0 else ext[0]
        _LFACT = np.concatenate((_LFACT, _LFACT[-1] + np.cumsum(ext)))
    return _LFACT


def binom_sf(n: np.ndarray, m: np.ndarray, p) -> np.ndarray:
    """Vectorized P(X >= m), X ~ Binomial(n, p); ``p`` scalar or array.

    Flat-segment evaluation: one exp over all (row, j=m..n) terms, then
    ``np.add.reduceat`` per row — no per-row Python (the kmcp query-FPR
    tail, reference: kmcp/cmd/util-fpr.go:28-50, re-derived from the
    standard binomial formula via log-factorials)."""
    n = np.asarray(n, dtype=np.int64)
    m = np.asarray(m, dtype=np.int64)
    p = np.broadcast_to(np.asarray(p, dtype=np.float64), n.shape)
    out = np.ones(len(n), dtype=np.float64)
    out[m > n] = 0.0
    live = (m > 0) & (m <= n)
    if not live.any():
        return out
    nl, ml, pl = n[live], m[live], np.clip(p[live], 1e-300, 1 - 1e-16)
    lf = _lfact_table(int(nl.max()))
    lens = nl - ml + 1
    starts = np.zeros(len(nl) + 1, dtype=np.int64)
    np.cumsum(lens, out=starts[1:])
    # flat j index: for row i, j runs ml[i] .. nl[i]
    j = np.arange(int(starts[-1])) - np.repeat(starts[:-1], lens) \
        + np.repeat(ml, lens)
    nn = np.repeat(nl, lens)
    lp = np.repeat(np.log(pl), lens)
    lq = np.repeat(np.log1p(-pl), lens)
    log_terms = lf[nn] - lf[j] - lf[nn - j] + j * lp + (nn - j) * lq
    s = np.add.reduceat(np.exp(log_terms), starts[:-1])
    out[live] = np.minimum(1.0, s)
    return out


def query_fpr_values(n_kmers: np.ndarray, m_matched: np.ndarray,
                     p_fpr: float) -> np.ndarray:
    """P(>= m chance matches out of n trials at per-k-mer FPR p) —
    binomial upper tail (the kmcp query-FPR significance gate,
    reference: kmcp/cmd/util-fpr.go:28-50)."""
    return binom_sf(np.asarray(n_kmers), np.asarray(m_matched), p_fpr)


def query_fpr(ds, n_col: str, m_col: str, p_fpr: float = 0.05):
    """Adds ``fpr_tail`` — pair-level significance of m shared elements
    out of n, used as an edge filter (kmcp M16 analogue)."""
    def fn(batch: pa.Table) -> pa.Table:
        n = batch.column(n_col).to_numpy(zero_copy_only=False)
        m = batch.column(m_col).to_numpy(zero_copy_only=False)
        return batch.append_column(
            "fpr_tail", pa.array(query_fpr_values(n, m, p_fpr), pa.float64()))
    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


# ------------------------------------------------- exact order statistics

def exact_quantiles(ds, col: str, q_pcts=(25, 50, 90, 99)):
    """Exact order statistics of an integer metric column without a
    global sort: ONE ``groupby(col).count()`` collapses the dataset to
    its distinct-value histogram (bounded by the metric's cardinality,
    not the row count), then the driver cumsums the sorted histogram
    and picks the value at rank ``(n-1) * q // 100`` per quantile.

    The exact counterpart of the reference's approximate qCov quantile
    sketch (kmcp/cmd/util-profile.go:228-230 analogue, A6) — at 10^12
    rows the shuffle moves one row per distinct metric value per block.
    Returns a pyarrow Table ``(q_pct, value)`` sorted by q_pct."""
    from ray.data.aggregate import Count

    vc = ds.groupby(col).aggregate(Count(alias_name="cnt")).take_all()
    vals = np.array([r[col] for r in vc], dtype=np.int64)
    cnts = np.array([r["cnt"] for r in vc], dtype=np.int64)
    order = np.argsort(vals)
    vals, cnts = vals[order], cnts[order]
    cum = np.cumsum(cnts)
    n = int(cum[-1]) if len(cum) else 0
    out_q, out_v = [], []
    for q in q_pcts:
        if n == 0:
            continue
        rank = (n - 1) * int(q) // 100          # 0-based lower statistic
        out_q.append(int(q))
        out_v.append(int(vals[np.searchsorted(cum, rank + 1)]))
    return pa.table({"q_pct": pa.array(out_q, pa.int64()),
                     "value": pa.array(out_v, pa.int64())})


def group_quantiles(ds, group_col: str, col: str,
                    q_pcts=(25, 50, 90, 99)):
    """Per-group exact order statistics — :func:`exact_quantiles` with
    the selection DISTRIBUTED: one ``groupby([group, col]).count()``
    collapses the corpus to per-group distinct-value histograms
    (bounded by groups x metric cardinality, not rows), then each
    group's cumsum + rank pick runs inside ``map_groups`` — nothing is
    ever driver-resident, so 10^6 groups cost the same driver memory
    as one.  Rank = ``(n-1) * q // 100`` (0-based lower statistic),
    identical to the global variant and the SQL window mirror.

    Returns rows ``(group, q_pct, value)``."""
    from ray.data.aggregate import Count

    hist = ds.groupby([group_col, col]).aggregate(Count(alias_name="cnt"))
    qarr = np.array(sorted({int(q) for q in q_pcts}), dtype=np.int64)

    def per_group(t: pa.Table) -> pa.Table:
        vals = t.column(col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        cnts = t.column("cnt").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        order = np.argsort(vals)
        vals = vals[order]
        cum = np.cumsum(cnts[order])
        n = int(cum[-1])
        ranks = (n - 1) * qarr // 100
        sel = vals[np.searchsorted(cum, ranks + 1)]
        return pa.table({
            group_col: pa.array([t.column(group_col)[0].as_py()]
                                * len(qarr)),
            "q_pct": pa.array(qarr, pa.int64()),
            "value": pa.array(sel, pa.int64())})

    return hist.groupby(group_col).map_groups(per_group,
                                              batch_format="pyarrow")


def order_revenue_topk(customer_ds, orders_ds, lineitem_ds, *,
                       segment: str = "BUILDING",
                       cutoff: str = "1998-06-01", k: int = 10,
                       num_partitions: int = 64, salt: "int | str" = "auto"):
    """Top-k orders by post-cutoff revenue within a market segment —
    the canonical 3-table star join (customer ⨝ orders ⨝ lineitem),
    TPC-H Q3's shape, composed scale-first:

    * lineitem (the big side) never joins raw: rows are filtered and
      PRE-AGGREGATED map-side to one ``(orderkey, rev_c4)`` partial per
      batch, and the partials finish summing INSIDE the join exchange
      (which co-partitions by orderkey anyway) — the only wide
      lineitem operation is that one exchange of order-level rows, no
      separate global groupby.  Revenue is exact integer arithmetic —
      ``round(price*100) * (100 - round(disc*100))`` — so engine and
      SQL agree bitwise.
    * customer ⨝ orders is :func:`kmcp_ray.joins.hash_join` semi on
      custkey — no broadcast, either side may be huge, and
      ``salt="auto"`` (the default, r4 verdict #7) measures the orders
      custkey histogram and spreads only hot keys (a viral customer
      with a data-proportional order share would otherwise pin one
      partition); uniform corpora degenerate to the plain join.
    * order-revenue ⨝ filtered-orders is a packed exchange on orderkey
      (inner, searchsorted) where the revenue partials FINISH summing.
      That exchange deliberately takes no salt: per-orderkey row volume
      is bounded by the per-batch map-side combine (≤ #input blocks
      rows per key, data-independent), and salting would split the
      in-exchange partial sums.
    * global top-k: per-block partial top-k, then one tiny sort+limit
      over ≤ k×blocks survivors.

    Returns ``(l_orderkey, rev_c4, o_orderdate_us)``, revenue
    descending, orderkey ascending on ties."""
    from kmcp_ray.exchange import Exchange, u64_part_fn
    from kmcp_ray.joins import hash_join

    P = int(num_partitions)
    cutoff_us = int(np.datetime64(cutoff, "us").astype(np.int64))

    # ---- lineitem: filter + map-side combine → groupby(orderkey).sum
    def li_partial(t: pa.Table) -> pa.Table:
        ship = pc.cast(t.column("l_shipdate"), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        m = ship > cutoff_us
        ok = t.column("l_orderkey").to_numpy(zero_copy_only=False)[m]
        price = np.rint(t.column("l_extendedprice")
                        .to_numpy(zero_copy_only=False)[m] * 100.0) \
            .astype(np.int64)
        disc = np.rint(t.column("l_discount")
                       .to_numpy(zero_copy_only=False)[m] * 100.0) \
            .astype(np.int64)
        rev = price * (100 - disc)
        u, inv = np.unique(ok, return_inverse=True)
        return pa.table({
            "l_orderkey": pa.array(u, pa.int64()),
            "rev_c4": pa.array(np.bincount(inv, weights=rev)
                               .astype(np.int64), pa.int64())})

    # NO global groupby here: the inner-join exchange below already
    # co-partitions by orderkey, so per-batch partials finish summing
    # inside ``inner`` — one whole all-to-all removed (3 → 2 shuffles)
    rev = lineitem_ds.map_batches(li_partial, batch_format="pyarrow",
                                  zero_copy_batch=True)

    # ---- customer ⨝ orders: generic hash_join semi on custkey — the
    # auto-salt arm (hot custkey spread + replicate, joins.py) replaces
    # the former bespoke packed semi; identical output, skew-protected
    def cust_slim(t: pa.Table) -> pa.Table:
        keep = pc.equal(t.column("c_mktsegment"), pa.scalar(segment))
        return pa.table({"ck": t.filter(keep).column("c_custkey")
                         .cast(pa.int64())})

    def orders_slim(t: pa.Table) -> pa.Table:
        od = pc.cast(t.column("o_orderdate"), pa.int64())
        t = t.filter(pc.less(od, pa.scalar(cutoff_us, pa.int64())))
        return pa.table({"ck": t.column("o_custkey").cast(pa.int64()),
                         "okey": t.column("o_orderkey").cast(pa.int64()),
                         "od": pc.cast(t.column("o_orderdate"),
                                       pa.int64())})

    sel_orders = hash_join(
        orders_ds.map_batches(orders_slim, batch_format="pyarrow",
                              zero_copy_batch=True),
        customer_ds.map_batches(cust_slim, batch_format="pyarrow",
                                zero_copy_batch=True),
        key="ck", how="semi",
        left_cols=[("okey", pa.int64()), ("od", pa.int64())],
        P=P, salt=salt)

    # ---- revenue ⨝ selected orders: packed inner join on orderkey
    ex2 = Exchange([("side", pa.int8()), ("okey", pa.int64()),
                    ("a", pa.int64())], P)
    pack2 = ex2.make_pack_fn(u64_part_fn("okey", P=P))

    def tag_rev(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table({"side": pa.array(np.zeros(n, np.int8), pa.int8()),
                         "okey": t.column("l_orderkey"),
                         "a": t.column("rev_c4")})

    def tag_sel(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table({"side": pa.array(np.ones(n, np.int8), pa.int8()),
                         "okey": t.column("okey"),
                         "a": t.column("od")})

    def inner(group: pa.Table) -> pa.Table:
        u = ex2.unpack(group)
        side = u["side"].to_numpy(zero_copy_only=False)
        okey = u["okey"].to_numpy(zero_copy_only=False)
        a = u["a"].to_numpy(zero_copy_only=False)
        sel = side == 1
        so, sod = okey[sel], a[sel]
        order = np.argsort(so)
        so, sod = so[order], sod[order]
        ro, rrev = okey[~sel], a[~sel]
        if len(so) == 0 or len(ro) == 0:
            return pa.table({
                "l_orderkey": pa.array([], pa.int64()),
                "rev_c4": pa.array([], pa.int64()),
                "o_orderdate_us": pa.array([], pa.int64())})
        pos = np.searchsorted(so, ro)
        pos_c = np.clip(pos, 0, len(so) - 1)
        hit = (pos < len(so)) & (so[pos_c] == ro)
        # finish the per-order revenue sum HERE (rev rows arrive as
        # per-batch partials; this partition holds ALL of an okey's
        # partials) — exact int64 via sort + reduceat
        ro_h, rv_h = ro[hit], rrev[hit]
        od_h = sod[pos_c][hit]
        o2 = np.argsort(ro_h, kind="stable")
        ro_s, rv_s, od_s = ro_h[o2], rv_h[o2], od_h[o2]
        firstm = np.ones(len(ro_s), dtype=bool)
        firstm[1:] = ro_s[1:] != ro_s[:-1]
        starts = np.nonzero(firstm)[0]
        sums = np.add.reduceat(rv_s, starts) if len(starts) \
            else np.empty(0, np.int64)
        return pa.table({
            "l_orderkey": pa.array(ro_s[firstm], pa.int64()),
            "rev_c4": pa.array(sums.astype(np.int64), pa.int64()),
            "o_orderdate_us": pa.array(od_s[firstm], pa.int64())})

    joined = rev.map_batches(tag_rev, batch_format="pyarrow",
                             zero_copy_batch=True) \
        .union(sel_orders.map_batches(tag_sel, batch_format="pyarrow",
                                      zero_copy_batch=True)) \
        .map_batches(pack2, batch_format="pyarrow", zero_copy_batch=True) \
        .groupby("part").map_groups(inner, batch_format="pyarrow")

    # ---- global top-k: block-local partial, then tiny global sort
    def partial_topk(t: pa.Table) -> pa.Table:
        if t.num_rows <= k:
            return t
        rev_np = t.column("rev_c4").to_numpy(zero_copy_only=False)
        ok_np = t.column("l_orderkey").to_numpy(zero_copy_only=False)
        order = np.lexsort((ok_np, -rev_np))[:k]
        return t.take(pa.array(np.sort(order), pa.int64()))

    return joined.map_batches(partial_topk, batch_format="pyarrow",
                              zero_copy_batch=True) \
        .sort(["rev_c4", "l_orderkey"], descending=[True, False]) \
        .limit(k)


def rollup_agg(docs_ds, *, g1: str = "lang", g2: str = "source",
               val_col: str = "n_chars", all_token: str = "<all>"):
    """ROLLUP-style grouping-sets aggregate in ONE shuffle: per-
    ``(g1, g2)``, per-``g1`` subtotal and grand-total rows, with
    ``all_token`` standing in for the rolled-up level.

    SQL needs ``GROUP BY ROLLUP (g1, g2)``; Ray Data has no grouping
    sets, so each batch expands its rows into the three granularities
    MAP-SIDE after first collapsing to distinct (g1, g2) partials —
    the shuffle then carries ≤ 3 rows per distinct group per block
    (never 3× the corpus) into one ``groupby.sum``.  Emits
    ``(g1, g2, n_rows, sum_val)``."""
    def expand(t: pa.Table) -> pa.Table:
        a = t.column(g1).to_numpy(zero_copy_only=False)
        b = t.column(g2).to_numpy(zero_copy_only=False)
        v = t.column(val_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        if t.num_rows == 0:   # grand-total row only (SQL ROLLUP () set)
            return pa.table({g1: pa.array([all_token], pa.string()),
                             g2: pa.array([all_token], pa.string()),
                             "n_rows": pa.array([0], pa.int64()),
                             "sum_val": pa.array([0], pa.int64())})
        ua, ca = np.unique(a, return_inverse=True)
        ub, cb = np.unique(b, return_inverse=True)
        code = ca.astype(np.int64) * len(ub) + cb
        uc, inv = np.unique(code, return_inverse=True)
        n = np.bincount(inv).astype(np.int64)
        s = np.bincount(inv, weights=v).astype(np.int64)
        ga, gb = ua[uc // len(ub)], ub[uc % len(ub)]
        # subtotal per g1 and grand total, derived from the partials
        us, si = np.unique(ga, return_inverse=True)
        n1 = np.bincount(si, weights=n).astype(np.int64)
        s1 = np.bincount(si, weights=s).astype(np.int64)
        out_a = np.concatenate((ga, us, [all_token]))
        out_b = np.concatenate((gb, np.full(len(us), all_token,
                                            dtype=object), [all_token]))
        out_n = np.concatenate((n, n1, [n.sum()]))
        out_s = np.concatenate((s, s1, [s.sum()]))
        return pa.table({g1: pa.array(out_a, pa.string()),
                         g2: pa.array(out_b, pa.string()),
                         "n_rows": pa.array(out_n, pa.int64()),
                         "sum_val": pa.array(out_s, pa.int64())})

    return docs_ds.map_batches(expand, batch_format="pyarrow",
                               zero_copy_batch=True) \
        .groupby([g1, g2]).aggregate(Sum("n_rows", alias_name="n_rows"),
                                     Sum("sum_val", alias_name="sum_val"))


def big_orders_topk(customer_ds, orders_ds, lineitem_ds, *,
                    min_qty_c2: int = 15000, k: int = 100,
                    num_partitions: int = 64, salt: "int | str" = "auto"):
    """Large-volume orders (TPC-H Q18's shape — the group-HAVING +
    double join + top-k classic): orders whose total lineitem quantity
    exceeds a threshold, joined back to orders and customer, top-k by
    order totalprice.

    Scale composition (mirrors :func:`order_revenue_topk`):

    * lineitem never joins raw — per-batch integer quantity PARTIALS
      ``(orderkey, qty_c2)`` ride the orderkey exchange and finish
      summing inside it (the HAVING filter runs where the sums
      complete — no separate global groupby);
    * the surviving order rows carry (custkey, date, totalprice)
      through :func:`kmcp_ray.joins.hash_join` inner on custkey where
      the customer name attaches — either side may be huge, nothing
      broadcasts, and ``salt="auto"`` (default, r4 verdict #7) levels a
      hot custkey (one customer owning a data-proportional share of
      big orders).  The survivors are materialized first so the
      auto-salt histogram pass re-reads the (small, post-HAVING) table
      instead of re-running the quantity exchange.  The orderkey
      exchange itself takes no salt: per-key partial volume is bounded
      by the map-side combine (≤ #input blocks rows/key) and salting
      would split the in-exchange sums;
    * global top-k = block-local partial cut (total order: totalprice
      desc, orderkey asc — orderkey is unique so the cut is exact),
      then one tiny sort+limit.

    All money/quantity columns are integer (``*100`` cents) so engine
    and DuckDB oracle agree bit-exactly.  Returns ``(c_custkey, c_name,
    o_orderkey, o_orderdate_us, tp_c2, qty_c2)``.
    """
    from kmcp_ray.exchange import Exchange, u64_part_fn

    P = int(num_partitions)
    thr = np.int64(min_qty_c2)

    def li_partial(t: pa.Table) -> pa.Table:
        ok = t.column("l_orderkey").to_numpy(zero_copy_only=False)
        qty = np.rint(t.column("l_quantity")
                      .to_numpy(zero_copy_only=False) * 100.0) \
            .astype(np.int64)
        u, inv = np.unique(ok, return_inverse=True)
        return pa.table({
            "okey": pa.array(u, pa.int64()),
            "qty_c2": pa.array(np.bincount(inv, weights=qty)
                               .astype(np.int64), pa.int64())})

    qty_parts = lineitem_ds.map_batches(li_partial, batch_format="pyarrow",
                                        zero_copy_batch=True)

    # ---- exchange 1 (orderkey): finish qty sums + HAVING + join orders
    ex1 = Exchange([("side", pa.int8()), ("okey", pa.int64()),
                    ("a", pa.int64()), ("b", pa.int64()),
                    ("c", pa.int64())], P)
    pack1 = ex1.make_pack_fn(u64_part_fn("okey", P=P))

    def tag_qty(t: pa.Table) -> pa.Table:
        n = t.num_rows
        z = pa.array(np.zeros(n, np.int64), pa.int64())
        return pa.table({"side": pa.array(np.zeros(n, np.int8), pa.int8()),
                         "okey": t.column("okey"),
                         "a": t.column("qty_c2"), "b": z, "c": z})

    def tag_orders(t: pa.Table) -> pa.Table:
        n = t.num_rows
        tp = np.rint(t.column("o_totalprice")
                     .to_numpy(zero_copy_only=False) * 100.0) \
            .astype(np.int64)
        return pa.table({"side": pa.array(np.ones(n, np.int8), pa.int8()),
                         "okey": t.column("o_orderkey").cast(pa.int64()),
                         "a": t.column("o_custkey").cast(pa.int64()),
                         "b": pc.cast(t.column("o_orderdate"), pa.int64()),
                         "c": pa.array(tp, pa.int64())})

    def having_join(group: pa.Table) -> pa.Table:
        u = ex1.unpack(group)
        side = u["side"].to_numpy(zero_copy_only=False)
        okey = u["okey"].to_numpy(zero_copy_only=False)
        a = u["a"].to_numpy(zero_copy_only=False)
        b = u["b"].to_numpy(zero_copy_only=False)
        c = u["c"].to_numpy(zero_copy_only=False)
        empty = pa.table({
            "ck": pa.array([], pa.int64()),
            "okey": pa.array([], pa.int64()),
            "od": pa.array([], pa.int64()),
            "tp_c2": pa.array([], pa.int64()),
            "qty_c2": pa.array([], pa.int64())})
        qm = side == 0
        qo, qv = okey[qm], a[qm]
        if len(qo) == 0 or len(qo) == len(okey):
            return empty
        o2 = np.argsort(qo, kind="stable")
        qo_s, qv_s = qo[o2], qv[o2]
        firstm = np.ones(len(qo_s), dtype=bool)
        firstm[1:] = qo_s[1:] != qo_s[:-1]
        starts = np.nonzero(firstm)[0]
        sums = np.add.reduceat(qv_s, starts).astype(np.int64)
        keys = qo_s[firstm]
        big = sums > thr
        keys, sums = keys[big], sums[big]
        if len(keys) == 0:
            return empty
        om = ~qm
        oo, ock, ood, otp = okey[om], a[om], b[om], c[om]
        pos = np.searchsorted(keys, oo)
        pos_c = np.clip(pos, 0, max(len(keys) - 1, 0))
        hit = (pos < len(keys)) & (keys[pos_c] == oo) if len(keys) \
            else np.zeros(len(oo), dtype=bool)
        return pa.table({
            "ck": pa.array(ock[hit], pa.int64()),
            "okey": pa.array(oo[hit], pa.int64()),
            "od": pa.array(ood[hit], pa.int64()),
            "tp_c2": pa.array(otp[hit], pa.int64()),
            "qty_c2": pa.array(sums[pos_c][hit], pa.int64())})

    big_orders = qty_parts.map_batches(tag_qty, batch_format="pyarrow",
                                       zero_copy_batch=True) \
        .union(orders_ds.map_batches(tag_orders, batch_format="pyarrow",
                                     zero_copy_batch=True)) \
        .map_batches(pack1, batch_format="pyarrow", zero_copy_batch=True) \
        .groupby("part").map_groups(having_join, batch_format="pyarrow")

    # ---- custkey attach: generic hash_join inner (auto-salted) — the
    # survivor table is small (post-HAVING), so materialize it once and
    # let the auto-salt histogram pass read the materialized blocks
    # rather than re-running the quantity exchange
    from kmcp_ray.joins import hash_join
    if salt == "auto":
        big_orders = big_orders.materialize()
    joined0 = hash_join(
        big_orders,
        customer_ds.select_columns(["c_custkey", "c_name"]),
        key="ck", right_key="c_custkey", how="inner",
        left_cols=[("okey", pa.int64()), ("od", pa.int64()),
                   ("tp_c2", pa.int64()), ("qty_c2", pa.int64())],
        right_cols=[("c_name", pa.string())], P=P, salt=salt)

    def rename(t: pa.Table) -> pa.Table:
        return pa.table({
            "c_custkey": t.column("ck"),
            "c_name": t.column("c_name"),
            "o_orderkey": t.column("okey"),
            "o_orderdate_us": t.column("od"),
            "tp_c2": t.column("tp_c2"),
            "qty_c2": t.column("qty_c2")})

    joined = joined0.map_batches(rename, batch_format="pyarrow",
                                 zero_copy_batch=True)

    def partial_topk(t: pa.Table) -> pa.Table:
        if t.num_rows <= k:
            return t
        tp = t.column("tp_c2").to_numpy(zero_copy_only=False)
        ok = t.column("o_orderkey").to_numpy(zero_copy_only=False)
        order = np.lexsort((ok, -tp))[:k]
        return t.take(pa.array(np.sort(order), pa.int64()))

    return joined.map_batches(partial_topk, batch_format="pyarrow",
                              zero_copy_batch=True) \
        .sort(["tp_c2", "o_orderkey"], descending=[True, False]) \
        .limit(k)


def region_revenue(region_ds, nation_ds, supplier_ds, customer_ds,
                   orders_ds, lineitem_ds, *, region: str = "ASIA",
                   date_from: str = "1996-01-01",
                   date_to: str = "1997-01-01",
                   num_partitions: int = 64, salt: "int | str" = "auto"):
    """Per-nation revenue inside one region where customer and supplier
    share the nation — the canonical 6-table join (TPC-H Q5's shape),
    composed from this engine's join arsenal by side size:

    * region ⨝ nation: dimension tables (25 rows) — driver-collected
      once and broadcast as sorted numpy maps (the kmcp name-map
      broadcast, kmcp/cmd/search.go name mapping analogue).
    * customer / supplier: map-side semi-filter + nation attach against
      the broadcast map — no shuffle for the dimension hop, either
      fact side arbitrarily large.  Supplier's (suppkey → nationkey)
      map is itself driver-sized here; at 10^9 suppliers swap the
      lineitem attach for ``joins.hash_join`` on l_suppkey (same
      contract).
    * orders ⨝ customer, lineitem ⨝ that: the generic packed-exchange
      ``joins.hash_join`` — two wide shuffles total, lineitem rows
      pre-slimmed map-side to (orderkey, s_nat, rev_c4) partials.
      ``salt="auto"`` (default, r4 verdict #7) applies to the custkey
      join (the skew-sensitive key: a viral customer); the orderkey
      join runs unsalted because its probe side is the per-batch
      lineitem PARTIALS — per-key volume ≤ #input blocks by the
      map-side combine — and an auto histogram pass there would re-read
      the whole lineitem table for no bound improvement.
    * final: nation-count-sized groupby.sum, names re-attached
      map-side.

    Revenue = ``round(price*100) * (100 - round(disc*100))`` in exact
    int64 — bit-identical to the SQL oracle.  Returns
    ``(n_name, revenue_c4)``, revenue descending."""
    import ray

    from kmcp_ray.joins import hash_join

    P = int(num_partitions)
    from_us = int(np.datetime64(date_from, "us").astype(np.int64))
    to_us = int(np.datetime64(date_to, "us").astype(np.int64))

    # dimension hop on the driver: 5 regions × 25 nations
    reg = region_ds.to_pandas()
    rkeys = set(reg[reg.r_name == region].r_regionkey.tolist())
    nat = nation_ds.to_pandas()
    nat = nat[nat.n_regionkey.isin(rkeys)]
    nat_keys = np.sort(nat.n_nationkey.to_numpy(np.int64))
    key_to_name = dict(zip(nat.n_nationkey.tolist(), nat.n_name.tolist()))
    nat_ref = ray.put(nat_keys)

    def in_region(keys: np.ndarray, ref) -> np.ndarray:
        tbl = ray.get(ref)
        pos = np.searchsorted(tbl, keys)
        pos_c = np.minimum(pos, max(len(tbl) - 1, 0))
        return (pos < len(tbl)) & (tbl[pos_c] == keys) if len(tbl) \
            else np.zeros(len(keys), bool)

    def cust_slim(t: pa.Table) -> pa.Table:
        nk = t.column("c_nationkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        keep = in_region(nk, nat_ref)
        return pa.table({
            "c_custkey": pa.array(t.column("c_custkey")
                                  .to_numpy(zero_copy_only=False)
                                  .astype(np.int64)[keep], pa.int64()),
            "c_nat": pa.array(nk[keep], pa.int64())})

    def orders_slim(t: pa.Table) -> pa.Table:
        od = pc.cast(t.column("o_orderdate"), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        keep = (od >= from_us) & (od < to_us)
        return pa.table({
            "o_orderkey": pa.array(t.column("o_orderkey")
                                   .to_numpy(zero_copy_only=False)
                                   .astype(np.int64)[keep], pa.int64()),
            "o_custkey": pa.array(t.column("o_custkey")
                                  .to_numpy(zero_copy_only=False)
                                  .astype(np.int64)[keep], pa.int64())})

    cust = customer_ds.map_batches(cust_slim, batch_format="pyarrow",
                                   zero_copy_batch=True)
    orders = orders_ds.map_batches(orders_slim, batch_format="pyarrow",
                                   zero_copy_batch=True)
    ord_nat = hash_join(orders, cust, key="o_custkey",
                        right_key="c_custkey", how="inner",
                        left_cols=[("o_orderkey", pa.int64())],
                        right_cols=[("c_nat", pa.int64())], P=P,
                        salt=salt)

    # supplier (suppkey → region nationkey) broadcast map
    sup = supplier_ds.select_columns(["s_suppkey", "s_nationkey"]) \
        .to_pandas()
    sk = sup.s_suppkey.to_numpy(np.int64)
    sn = sup.s_nationkey.to_numpy(np.int64)
    keep = np.isin(sn, nat_keys)
    order = np.argsort(sk[keep])
    sup_ref = ray.put((sk[keep][order], sn[keep][order]))

    def li_slim(t: pa.Table) -> pa.Table:
        skeys, snats = ray.get(sup_ref)
        lsk = t.column("l_suppkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        pos = np.searchsorted(skeys, lsk)
        pos_c = np.minimum(pos, max(len(skeys) - 1, 0))
        hit = (pos < len(skeys)) & (skeys[pos_c] == lsk) if len(skeys) \
            else np.zeros(len(lsk), bool)
        ok = t.column("l_orderkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)[hit]
        nat_v = snats[pos_c[hit]]
        price = np.rint(t.column("l_extendedprice")
                        .to_numpy(zero_copy_only=False)[hit] * 100.0) \
            .astype(np.int64)
        disc = np.rint(t.column("l_discount")
                       .to_numpy(zero_copy_only=False)[hit] * 100.0) \
            .astype(np.int64)
        rev = price * (100 - disc)
        # map-side combine on (orderkey, nation): nationkey < 32
        key = ok * 32 + nat_v
        u, inv = np.unique(key, return_inverse=True)
        return pa.table({
            "l_orderkey": pa.array(u // 32, pa.int64()),
            "s_nat": pa.array(u % 32, pa.int64()),
            "rev_c4": pa.array(np.bincount(inv, weights=rev)
                               .astype(np.int64), pa.int64())})

    li = lineitem_ds.map_batches(li_slim, batch_format="pyarrow",
                                 zero_copy_batch=True)
    joined = hash_join(li, ord_nat, key="l_orderkey",
                       right_key="o_orderkey", how="inner",
                       left_cols=[("s_nat", pa.int64()),
                                  ("rev_c4", pa.int64())],
                       right_cols=[("c_nat", pa.int64())], P=P)

    def same_nation(t: pa.Table) -> pa.Table:
        sn_v = t.column("s_nat").to_numpy(zero_copy_only=False)
        cn = t.column("c_nat").to_numpy(zero_copy_only=False)
        keep = sn_v == cn
        return pa.table({
            "n_key": pa.array(sn_v[keep], pa.int64()),
            "rev_c4": pa.array(t.column("rev_c4")
                               .to_numpy(zero_copy_only=False)[keep],
                               pa.int64())})

    agg = joined.map_batches(same_nation, batch_format="pyarrow",
                             zero_copy_batch=True) \
        .groupby("n_key").aggregate(Sum("rev_c4", alias_name="revenue_c4"))

    names = {int(k): v for k, v in key_to_name.items()}

    def label(t: pa.Table) -> pa.Table:
        keys = t.column("n_key").to_numpy(zero_copy_only=False)
        return pa.table({
            "n_name": pa.array([names[int(k)] for k in keys], pa.string()),
            "revenue_c4": t["revenue_c4"].cast(pa.int64())})

    return agg.map_batches(label, batch_format="pyarrow",
                           zero_copy_batch=True) \
        .sort(["revenue_c4", "n_name"], descending=[True, False])


def winsorize(ds, group_col: str = "source", col: str = "n_chars",
              *, lo_pct: int = 5, hi_pct: int = 95,
              id_col: str = "doc_id"):
    """Per-group winsorization: clip an integer metric to its group's
    exact [lo_pct, hi_pct] order statistics (the :func:`group_quantiles`
    rank rule, ``rank = (n-1)*q // 100``) — the outlier-taming stage
    before length/quality features feed a mixture or curriculum
    schedule.  Emits ``(id, group, col, clipped)``.

    Shape: quantiles come from the histogram-collapsed distributed
    selection (shuffle bounded by groups x distinct values, never
    rows); the per-group (lo, hi) table — two i64 per group — is
    broadcast once and applied in one vectorized clip pass.  At 10^6+
    groups swap the broadcast for a partitioned
    :func:`kmcp_ray.joins.hash_join` on the group key; the quantile
    side is already distributed."""
    import ray

    from kmcp_ray import hashing

    q = group_quantiles(ds, group_col, col,
                        q_pcts=(lo_pct, hi_pct)).to_pandas()
    lo_t = q[q.q_pct == lo_pct].set_index(group_col)["value"]
    hi_t = q[q.q_pct == hi_pct].set_index(group_col)["value"]
    groups = lo_t.index.to_numpy(dtype=object)
    gh = hashing.hash_strings(groups)
    order = np.argsort(gh)
    ref = ray.put((gh[order],
                   lo_t.to_numpy()[order].astype(np.int64),
                   hi_t.reindex(lo_t.index).to_numpy()[order]
                   .astype(np.int64)))

    def clip(t: pa.Table) -> pa.Table:
        gh_s, lo, hi = ray.get(ref)
        g = t.column(group_col).to_numpy(zero_copy_only=False)
        v = t.column(col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        pos = np.searchsorted(gh_s, hashing.hash_strings(g))
        pos = np.minimum(pos, len(gh_s) - 1)
        clipped = np.minimum(np.maximum(v, lo[pos]), hi[pos])
        return pa.table({id_col: t.column(id_col),
                         group_col: t.column(group_col),
                         col: pa.array(v, pa.int64()),
                         "clipped": pa.array(clipped, pa.int64())})

    return ds.select_columns([id_col, group_col, col]) \
        .map_batches(clip, batch_format="pyarrow", zero_copy_batch=True)
