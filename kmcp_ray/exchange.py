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


def dedup_pairs(pairs_ds, P: int, typ=pa.string()):
    """Globally deduplicate (id_a, id_b) pairs (string or int64 ids)
    via one packed exchange + per-partition drop_duplicates."""
    import pandas as pd

    ex = Exchange([("id_a", typ), ("id_b", typ)], P)
    if typ == pa.string():
        part_fn = hash_part_fn("id_a", "id_b", P=P)
    else:
        from kmcp_ray import hashing

        def part_fn(batch: pa.Table) -> np.ndarray:
            a = batch.column("id_a").to_numpy(zero_copy_only=False) \
                .astype(np.int64).view(np.uint64)
            b = batch.column("id_b").to_numpy(zero_copy_only=False) \
                .astype(np.int64).view(np.uint64)
            h = hashing.splitmix64(hashing.splitmix64(a) + b * np.uint64(3))
            return (h % np.uint64(P)).astype(np.int64)
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
