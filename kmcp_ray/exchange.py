"""Packed hash exchange — the engine's one shuffle primitive.

Ray's generic shuffles (sort- and hash-based alike) pay a large
per-row constant in this environment; every wide operation in this
engine therefore moves **packed** rows instead: each input batch
groups its rows by ``part = hash % P`` map-side and emits ONE fat row
per partition whose columns are lists.  The downstream
``groupby("part")`` then sorts thousands of packs instead of millions
of rows — payload bytes identical, per-row overhead gone.  This is the
generalization of kmcp packing 8-file column batches into index-block
rows (reference: kmcp/cmd/index.go:1066-1319) and of classic map-side
combining.

Usage::

    ex = Exchange([("id", pa.string()), ("score", pa.float64())], P=64)
    packed = ds.map_batches(ex.make_pack_fn(part_of_batch), ...)
    out = packed.groupby("part").map_groups(
        lambda g: process(**ex.unpack(g)), batch_format="pyarrow")

where ``part_of_batch(batch) -> np.int64 array`` assigns partitions.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


class Exchange:
    def __init__(self, schema, P: int):
        """schema: list of (column_name, pyarrow_type); P: partitions."""
        self.schema = list(schema)
        self.P = P

    def make_pack_fn(self, part_of_batch):
        schema = self.schema

        def pack(batch: pa.Table) -> pa.Table:
            part = np.asarray(part_of_batch(batch), dtype=np.int64)
            order = np.argsort(part, kind="stable")
            part_s = part[order]
            m = len(part_s)
            if m == 0:
                cols = {"part": pa.array([], pa.int64())}
                for name, typ in schema:
                    cols[name] = pa.array([], pa.list_(typ))
                return pa.table(cols)
            bound = np.nonzero(np.concatenate(([True], part_s[1:] != part_s[:-1])))[0]
            offsets = pa.array(np.concatenate((bound, [m])), type=pa.int32())
            take = pa.array(order, type=pa.int64())
            cols = {"part": pa.array(part_s[bound], pa.int64())}
            for name, typ in schema:
                col = batch.column(name)
                if isinstance(col, pa.ChunkedArray):
                    col = col.combine_chunks()
                vals = col.cast(typ) if col.type != typ else col
                cols[name] = pa.ListArray.from_arrays(offsets, vals.take(take))
            return pa.table(cols)

        return pack

    def unpack(self, group: pa.Table) -> dict:
        """Packed group table → {name: flat pa.Array} (+ row count)."""
        out = {}
        for name, _typ in self.schema:
            col = group.column(name)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            out[name] = col.flatten()
        return out


def hash_part_fn(*cols, P: int, salt: int = 0):
    """Partition assignment from the hash of one or more string columns."""
    from kmcp_ray import hashing

    def part_of(batch: pa.Table) -> np.ndarray:
        h = None
        for c in cols:
            arr = batch.column(c).to_numpy(zero_copy_only=False)
            hc = hashing.hash_strings(arr)
            h = hc if h is None else hashing.splitmix64(h + hc * np.uint64(3))
        if salt:
            h = hashing.splitmix64(h ^ np.uint64(salt))
        return (h % np.uint64(P)).astype(np.int64)

    return part_of


def u64_part_fn(*cols, P: int):
    """Partition assignment from the mixed hash of u64/int64 columns."""
    from kmcp_ray import hashing

    def part_of(batch: pa.Table) -> np.ndarray:
        h = None
        for c in cols:
            v = batch.column(c).to_numpy(zero_copy_only=False)
            v = v.view(np.uint64) if v.dtype != np.uint64 else v
            hc = hashing.splitmix64(v)
            h = hc if h is None else hashing.splitmix64(h + hc * np.uint64(3))
        return (h % np.uint64(P)).astype(np.int64)

    return part_of


def dedup_pairs(pairs_ds, P: int, typ=pa.string()):
    """Globally deduplicate (id_a, id_b) pairs (string or u64/int64 ids)
    via one packed exchange + per-partition drop_duplicates."""
    import pandas as pd

    ex = Exchange([("id_a", typ), ("id_b", typ)], P)
    if typ == pa.string():
        part_fn = hash_part_fn("id_a", "id_b", P=P)
    else:
        part_fn = u64_part_fn("id_a", "id_b", P=P)
    packed = pairs_ds.map_batches(ex.make_pack_fn(part_fn),
                                  batch_format="pyarrow",
                                  zero_copy_batch=True)

    def uniq(group: pa.Table) -> pa.Table:
        u = ex.unpack(group)
        df = pd.DataFrame({"id_a": u["id_a"].to_numpy(zero_copy_only=False),
                           "id_b": u["id_b"].to_numpy(zero_copy_only=False)})
        df = df.drop_duplicates()
        return pa.table({"id_a": pa.array(df["id_a"].to_numpy(), typ),
                         "id_b": pa.array(df["id_b"].to_numpy(), typ)})

    return packed.groupby("part").map_groups(uniq, batch_format="pyarrow")


def join_lookup(probe_ds, key_col: str, kv_ds, kv_key: str, kv_val: str,
                P: int, out_col: str, carry_col: str = None,
                default_self: bool = False):
    """Partitioned hash join: attach ``kv_val`` (string) from ``kv_ds``
    to every probe row by ``key_col`` — one packed exchange, no
    broadcast.  ``carry_col``: one extra probe string column carried
    through.  Missing keys yield the key itself (``default_self``) or
    null.  This is the scalable (non-broadcast) arm of kmcp's
    load-whole-index vs mmap mode switch (search.go:66-83 analogue).
    """
    import pandas as pd

    ex = Exchange([("rt", pa.int8()), ("k", pa.string()),
                   ("c", pa.string()), ("v", pa.string())], P)
    pack = ex.make_pack_fn(hash_part_fn("k", P=P))

    def tag_kv(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table({"rt": pa.array(np.zeros(n, np.int8), pa.int8()),
                         "k": batch.column(kv_key),
                         "c": pa.nulls(n, pa.string()),
                         "v": batch.column(kv_val)})

    def tag_probe(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        carry = batch.column(carry_col) if carry_col else \
            pa.nulls(n, pa.string())
        return pa.table({"rt": pa.array(np.ones(n, np.int8), pa.int8()),
                         "k": batch.column(key_col),
                         "c": carry,
                         "v": pa.nulls(n, pa.string())})

    def join_group(group: pa.Table) -> pa.Table:
        u = ex.unpack(group)
        rt = u["rt"].to_numpy(zero_copy_only=False)
        k = u["k"].to_numpy(zero_copy_only=False)
        is_kv = rt == 0
        probe = np.nonzero(~is_kv)[0]
        if len(probe) == 0:
            return pa.table({key_col: pa.array([], pa.string()),
                             carry_col or "_c": pa.array([], pa.string()),
                             out_col: pa.array([], pa.string())})
        kv_k = np.asarray(k[is_kv], dtype="S")
        kv_v = u["v"].to_numpy(zero_copy_only=False)[is_kv]
        order = np.argsort(kv_k, kind="stable")
        kv_k, kv_v = kv_k[order], kv_v[order]
        pk = np.asarray(k[probe], dtype="S")
        w = max(kv_k.dtype.itemsize, pk.dtype.itemsize, 1)
        kv_kw, pkw = kv_k.astype(f"S{w}"), pk.astype(f"S{w}")
        if len(kv_kw) == 0:
            vals = k[probe] if default_self \
                else np.full(len(probe), None, dtype=object)
        else:
            pos = np.searchsorted(kv_kw, pkw)
            pos_c = np.clip(pos, 0, len(kv_kw) - 1)
            hit = (pos < len(kv_kw)) & (kv_kw[pos_c] == pkw)
            vals = np.where(hit, kv_v[pos_c],
                            k[probe] if default_self else None)
        return pa.table({
            key_col: pa.array(k[probe], pa.string()),
            carry_col or "_c": pa.array(
                u["c"].to_numpy(zero_copy_only=False)[probe], pa.string()),
            out_col: pa.array(vals, pa.string())})

    kv_packed = kv_ds.map_batches(tag_kv, batch_format="pyarrow",
                                  zero_copy_batch=True) \
        .map_batches(pack, batch_format="pyarrow", zero_copy_batch=True)
    probe_packed = probe_ds.map_batches(tag_probe, batch_format="pyarrow",
                                        zero_copy_batch=True) \
        .map_batches(pack, batch_format="pyarrow", zero_copy_batch=True)
    out = probe_packed.union(kv_packed).groupby("part").map_groups(
        join_group, batch_format="pyarrow")
    if not carry_col:
        out = out.map_batches(lambda t: t.drop_columns(["_c"]),
                              batch_format="pyarrow", zero_copy_batch=True)
    return out


def build_member_table(idn: np.ndarray, ids: np.ndarray):
    """(ident u64, id object) rows → the sorted lookup tuple
    ``(uniq, starts, counts, ids_sorted)`` the broadcast expansion
    probes — shared by the broadcast arm (ray.put per task) and the
    r5 driver fast path (pipeline.edges_from_raw, zero executor
    runs)."""
    o = np.argsort(idn, kind="stable")
    idn, ids = idn[o], ids[o]
    first = np.concatenate(([True], idn[1:] != idn[:-1])) \
        if len(idn) else np.empty(0, bool)
    uniq = idn[first]
    starts = np.nonzero(first)[0]
    counts = np.diff(np.append(starts, len(idn)))
    return (uniq, starts.astype(np.int64), counts.astype(np.int64), ids)


def member_lookup(table, v: np.ndarray):
    """Probe a :func:`build_member_table` tuple: per value →
    (start, count), zeros where absent."""
    uniq_l, starts_l, counts_l, _ids = table
    pos = np.searchsorted(uniq_l, v)
    pos_c = np.minimum(pos, max(len(uniq_l) - 1, 0))
    found = (pos < len(uniq_l)) & (uniq_l[pos_c] == v) \
        if len(uniq_l) else np.zeros(len(v), bool)
    return (np.where(found, starts_l[pos_c], 0),
            np.where(found, counts_l[pos_c], 0))


def expand_pairs_with_table(table, ia: np.ndarray, ib: np.ndarray, *,
                            score: "np.ndarray | None" = None,
                            via_value: str = None) -> pa.Table:
    """The class→member cross-product expansion kernel over a
    :func:`build_member_table` tuple — pure numpy, shared by the
    broadcast map_batches arm and the driver fast path."""
    ids_l = table[3]
    n = len(ia)
    sa, ca = member_lookup(table, ia)
    sb, cb = member_lookup(table, ib)
    tot = ca * cb
    T = int(tot.sum())
    cum = np.concatenate(([0], np.cumsum(tot)))
    pair_of = np.repeat(np.arange(n), tot)
    local = np.arange(T) - cum[pair_of]
    cb_p = cb[pair_of]
    a_ids = ids_l[sa[pair_of] + local // cb_p] if T \
        else np.empty(0, object)
    b_ids = ids_l[sb[pair_of] + local % cb_p] if T \
        else np.empty(0, object)
    aS = np.asarray(a_ids, dtype="S")
    bS = np.asarray(b_ids, dtype="S")
    w = max(aS.dtype.itemsize, bS.dtype.itemsize, 1)
    swap = aS.astype(f"S{w}") > bS.astype(f"S{w}")
    out = {"id_a": pa.array(np.where(swap, b_ids, a_ids), pa.string()),
           "id_b": pa.array(np.where(swap, a_ids, b_ids), pa.string())}
    if via_value is not None:
        out["via"] = pa.array(np.full(T, via_value, dtype=object),
                              pa.string())
    if score is not None:
        out["score"] = pa.array(score[pair_of], pa.float64())
    return pa.table(out)


def expansion_volume(table, ia: np.ndarray, ib: np.ndarray) -> int:
    """Exact output-row count the expansion would produce — cheap
    (two lookups), used to gate the driver fast path."""
    _sa, ca = member_lookup(table, ia)
    _sb, cb = member_lookup(table, ib)
    return int((ca * cb).sum())


def expand_ident_pairs_broadcast(pairs_ds, members_mat, *,
                                 with_score: bool = False,
                                 via_value: str = None):
    """Broadcast arm of the class→member expansion: the (already
    ident-filtered, small, materialized) membership table is collected
    once into sorted numpy arrays and ``ray.put``; the expansion is then
    ONE zero-shuffle ``map_batches`` over the class pairs — each batch
    does two searchsorted lookups and a vectorized cross-product gather.

    The exchange arm (``expand_ident_pairs``) is the scale fallback:
    four union-fed groupby exchanges cost ~40 s of fixed scheduling
    latency on this Ray release even at 10^5-row volumes (measured at
    800k corpus rows), so the broadcast arm is the default whenever the
    filtered membership fits the broadcast gate — the same load-whole
    vs mmap switch the verify stage already applies
    (kmcp/cmd/search.go:66-83, semantics re-derived).
    """
    import ray

    idn_chunks, id_chunks = [np.empty(0, np.uint64)], [np.empty(0, object)]
    for b in members_mat.iter_batches(batch_size=1 << 18,
                                      batch_format="pyarrow"):
        idn_chunks.append(b.column("ident").to_numpy(zero_copy_only=False)
                          .astype(np.uint64))
        id_chunks.append(b.column("id").to_numpy(zero_copy_only=False))
    table_ref = ray.put(build_member_table(np.concatenate(idn_chunks),
                                           np.concatenate(id_chunks)))

    def expand(batch: pa.Table) -> pa.Table:
        table = ray.get(table_ref)
        ia = batch.column("ident_a").to_numpy(zero_copy_only=False) \
            .astype(np.uint64)
        ib = batch.column("ident_b").to_numpy(zero_copy_only=False) \
            .astype(np.uint64)
        sc = batch.column("score").to_numpy(zero_copy_only=False) \
            if with_score else None
        return expand_pairs_with_table(table, ia, ib, score=sc,
                                       via_value=via_value)

    return pairs_ds.map_batches(expand, batch_format="pyarrow",
                                zero_copy_batch=True)


def expand_ident_pairs(pairs_ds, members_ds, P: int, *,
                       with_score: bool = False, via_value: str = None):
    """Ident-class pairs → member-level id pairs (full cross product).

    ``pairs_ds``: (ident_a u64, ident_b u64[, score f64]) — distinct
    class pairs.  ``members_ds``: (ident u64, id str) — the class
    membership table (see buckets.verify_partition's ``member_*`` rows;
    pre-filter it to the idents that actually occur in ``pairs_ds`` when
    that set is small).  Two packed u64-keyed exchanges; each step
    gathers every member of the keyed side per pair (one-to-many,
    vectorized searchsorted + segment gather).  Output pairs are
    canonicalized to ``id_a < id_b``; ``via_value``/``score`` columns
    are attached when requested.

    This is the class→member expansion that makes the ident-compressed
    band shuffle (bands.py r3) invisible downstream: verified class
    pairs come out as exactly the member pairs the id-level pipeline
    used to emit (members of a class share their whole key vector, so
    every member pair did co-occur in the same buckets).
    """
    from kmcp_ray.bands import _segment_gather

    def step(rows_ds, key_col, carry_str: bool, carry_score: bool):
        """Join ``members_ds`` on ``rows_ds[key_col]``: one output row
        per (probe row, member of key's class)."""
        schema = [("rt", pa.int8()), ("k", pa.uint64()),
                  ("ob", pa.uint64()), ("sc", pa.float64()),
                  ("cid", pa.string()), ("mid", pa.string())]
        ex = Exchange(schema, P)
        pack = ex.make_pack_fn(u64_part_fn("k", P=P))

        def tag_members(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            return pa.table({
                "rt": pa.array(np.zeros(n, np.int8), pa.int8()),
                "k": batch.column("ident").cast(pa.uint64()),
                "ob": pa.array(np.zeros(n, np.uint64), pa.uint64()),
                "sc": pa.array(np.zeros(n), pa.float64()),
                "cid": pa.nulls(n, pa.string()),
                "mid": batch.column("id"),
            })

        def tag_probe(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            return pa.table({
                "rt": pa.array(np.ones(n, np.int8), pa.int8()),
                "k": batch.column(key_col).cast(pa.uint64()),
                "ob": batch.column("ob").cast(pa.uint64())
                if "ob" in batch.column_names
                else pa.array(np.zeros(n, np.uint64), pa.uint64()),
                "sc": batch.column("sc") if carry_score
                else pa.array(np.zeros(n), pa.float64()),
                "cid": batch.column("cid") if carry_str
                else pa.nulls(n, pa.string()),
                "mid": pa.nulls(n, pa.string()),
            })

        def join_group(group: pa.Table) -> pa.Table:
            u = ex.unpack(group)
            rt = u["rt"].to_numpy(zero_copy_only=False)
            k = u["k"].to_numpy(zero_copy_only=False)
            is_mem = rt == 0
            probe = np.nonzero(~is_mem)[0]
            empty = {"k": pa.array([], pa.uint64()),
                     "ob": pa.array([], pa.uint64()),
                     "sc": pa.array([], pa.float64()),
                     "cid": pa.array([], pa.string()),
                     "mid": pa.array([], pa.string())}
            if len(probe) == 0:
                return pa.table(empty)
            mk = k[is_mem]
            mids = u["mid"].to_numpy(zero_copy_only=False)[is_mem]
            osort = np.argsort(mk, kind="stable")
            mk, mids = mk[osort], mids[osort]
            pk = k[probe]
            lo = np.searchsorted(mk, pk, side="left")
            hi = np.searchsorted(mk, pk, side="right")
            counts = hi - lo
            gather = _segment_gather(lo, counts)     # member positions
            rep = np.repeat(probe, counts)           # probe row per output
            return pa.table({
                "k": pa.array(k[rep], pa.uint64()),
                "ob": pa.array(u["ob"].to_numpy(zero_copy_only=False)[rep],
                               pa.uint64()),
                "sc": pa.array(u["sc"].to_numpy(zero_copy_only=False)[rep],
                               pa.float64()),
                "cid": pa.array(u["cid"].to_numpy(zero_copy_only=False)[rep],
                                pa.string()),
                "mid": pa.array(mids[gather], pa.string()),
            })

        mem_packed = members_ds.map_batches(
            tag_members, batch_format="pyarrow", zero_copy_batch=True) \
            .map_batches(pack, batch_format="pyarrow", zero_copy_batch=True)
        probe_packed = rows_ds.map_batches(
            tag_probe, batch_format="pyarrow", zero_copy_batch=True) \
            .map_batches(pack, batch_format="pyarrow", zero_copy_batch=True)
        return probe_packed.union(mem_packed).groupby("part").map_groups(
            join_group, batch_format="pyarrow")

    # step 1: expand side a — probes keyed by ident_a carrying ident_b
    def prep1(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table({
            "k": batch.column("ident_a").cast(pa.uint64()),
            "ob": batch.column("ident_b").cast(pa.uint64()),
            "sc": batch.column("score") if with_score
            else pa.array(np.zeros(n), pa.float64()),
            "cid": pa.nulls(n, pa.string()),
        })

    s1 = step(pairs_ds.map_batches(prep1, batch_format="pyarrow",
                                   zero_copy_batch=True),
              "k", carry_str=False, carry_score=True)
    # step 1 output rows: (k=ident_a, ob=ident_b, sc, mid=id_a) —
    # re-key on ident_b, carry id_a in cid
    s1 = s1.map_batches(
        lambda t: pa.table({"k": t["ob"], "ob": t["k"], "sc": t["sc"],
                            "cid": t["mid"]}),
        batch_format="pyarrow", zero_copy_batch=True)
    s2 = step(s1, "k", carry_str=True, carry_score=True)

    def finalize(batch: pa.Table) -> pa.Table:
        a = batch.column("cid").to_numpy(zero_copy_only=False)
        b = batch.column("mid").to_numpy(zero_copy_only=False)
        aS = np.asarray(a, dtype="S")
        bS = np.asarray(b, dtype="S")
        w = max(aS.dtype.itemsize, bS.dtype.itemsize, 1)
        swap = aS.astype(f"S{w}") > bS.astype(f"S{w}")
        out = {"id_a": pa.array(np.where(swap, b, a), pa.string()),
               "id_b": pa.array(np.where(swap, a, b), pa.string())}
        if via_value is not None:
            out["via"] = pa.array(
                np.full(len(a), via_value, dtype=object), pa.string())
        if with_score:
            out["score"] = batch.column("sc")
        return pa.table(out)

    return s2.map_batches(finalize, batch_format="pyarrow",
                          zero_copy_batch=True)


def count_pairs(pairs_ds, P: int, col_a: str, col_b: str,
                count_name: str = "n", carry_int_cols: tuple = ()):
    """(a, b) rows → distinct (a, b, count) via one packed exchange.

    ``carry_int_cols``: int64 columns constant within an (a, b) group
    (e.g. per-side set sizes) carried through with first-value semantics.
    """
    import pandas as pd

    schema = [(col_a, pa.string()), (col_b, pa.string())]
    schema += [(c, pa.int64()) for c in carry_int_cols]
    ex = Exchange(schema, P)
    packed = pairs_ds.map_batches(ex.make_pack_fn(
        hash_part_fn(col_a, col_b, P=P)), batch_format="pyarrow",
        zero_copy_batch=True)

    def cnt(group: pa.Table) -> pa.Table:
        u = ex.unpack(group)
        data = {col_a: u[col_a].to_numpy(zero_copy_only=False),
                col_b: u[col_b].to_numpy(zero_copy_only=False)}
        for c in carry_int_cols:
            data[c] = u[c].to_numpy(zero_copy_only=False)
        df = pd.DataFrame(data)
        g = df.groupby([col_a, col_b], sort=False).agg(
            **{count_name: (col_a, "size")},
            **{c: (c, "first") for c in carry_int_cols}).reset_index()
        cols = {col_a: pa.array(g[col_a].to_numpy(), pa.string()),
                col_b: pa.array(g[col_b].to_numpy(), pa.string()),
                count_name: pa.array(g[count_name].to_numpy(), pa.int64())}
        for c in carry_int_cols:
            cols[c] = pa.array(g[c].to_numpy().astype(np.int64), pa.int64())
        return pa.table(cols)

    return packed.groupby("part").map_groups(cnt, batch_format="pyarrow")
