"""Concat-with-spacers / grouped sketch (kmcp M7).

kmcp's ``compute --by-seq=false`` mode concatenates every sequence of a
genome file with ``k-1`` ``'N'`` spacers before sketching (reference:
kmcp/cmd/compute.go:567-628); because the ntHash iterator skips windows
containing non-ACGT bases, the net semantics is **the union of the
per-sequence k-mer sets** — one sketch per genome, with no window ever
spanning a sequence boundary.

Re-expressed Ray-Data-first for text: no giant concatenated row is ever
built.  Each member row is shingled vectorized in ``map_batches`` (the
unscaled distinct set — needed because the exact group distinct count
does not commute with the scale filter, while the scaled sketch does),
the per-row sets ride ONE packed hash exchange keyed by group, and each
partition unions its groups' sets with a single lexsort.  The literal
concatenated string (kmcp's ``bigSeq``) is also available via
:func:`concat_with_spacers` for API parity / round-trip tests.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from kmcp_ray import hashing, text
from kmcp_ray.arrowutil import column, list_to_numpy
from kmcp_ray.config import DedupConfig
from kmcp_ray.exchange import Exchange, hash_part_fn

MAX_U64 = int(hashing.MAX_U64)

#: spacer token used by :func:`concat_with_spacers` — all-consonant so
#: it cannot collide with a real ``[a-z0-9]+`` token in natural text is
#: not guaranteed; callers needing exact set semantics use
#: :func:`grouped_sketch`, which never materializes the spacer at all.
SPACER_TOKEN = "zqxjkvzq"


def grouped_sketch(ds, cfg: DedupConfig, group_col: str = "group_id",
                   text_col: str = "text", num_partitions: int = 32):
    """One sketch row per group: union of member-row shingle sets.

    Returns a Dataset with columns ``(group_col, n_members, n_tokens,
    n_distinct, sketch)`` where ``n_distinct`` is the EXACT distinct
    shingle count of the union (kmcp's per-genome k-mer count on the
    concatenated sequence) and ``sketch`` is the scale-filtered sorted
    union (``list<uint64>``).
    """
    k = cfg.shingle_k
    max_hash = cfg.max_hash

    ex = Exchange([("gid", pa.string()),
                   ("hset", pa.list_(pa.uint64())),
                   ("ntok", pa.int64())], num_partitions)

    def row_sets(batch: pa.Table) -> pa.Table:
        ss = text.shingle_sets(column(batch, text_col), k, MAX_U64)
        return pa.table({
            "gid": column(batch, group_col).cast(pa.string()),
            "hset": pa.ListArray.from_arrays(
                pa.array(ss["offsets"], pa.int32()),
                pa.array(ss["hashes"], pa.uint64())),
            "ntok": pa.array(ss["n_tokens"], pa.int64())})

    packed = ds.map_batches(row_sets, batch_format="pyarrow",
                            zero_copy_batch=True) \
        .map_batches(ex.make_pack_fn(hash_part_fn("gid", P=num_partitions)),
                     batch_format="pyarrow", zero_copy_batch=True)

    def union_groups(group: pa.Table) -> pa.Table:
        u = ex.unpack(group)
        gid = u["gid"].to_numpy(zero_copy_only=False)
        vals, off = list_to_numpy(u["hset"], dtype=np.uint64)
        ntok = u["ntok"].to_numpy(zero_copy_only=False).astype(np.int64)
        uniq, codes = np.unique(gid, return_inverse=True)
        ng = len(uniq)
        n_members = np.bincount(codes, minlength=ng).astype(np.int64)
        n_tokens = np.bincount(codes, weights=ntok,
                               minlength=ng).astype(np.int64)
        g_of_val = np.repeat(codes, np.diff(off))
        order = np.lexsort((vals, g_of_val))
        gv, vv = g_of_val[order], vals[order]
        first = np.ones(len(vv), dtype=bool)
        first[1:] = (gv[1:] != gv[:-1]) | (vv[1:] != vv[:-1])
        gv, vv = gv[first], vv[first]
        n_distinct = np.bincount(gv, minlength=ng).astype(np.int64)
        if max_hash < MAX_U64:
            keep = vv <= np.uint64(max_hash)
            gv, vv = gv[keep], vv[keep]
        counts = np.bincount(gv, minlength=ng).astype(np.int64)
        goff = np.zeros(ng + 1, dtype=np.int64)
        np.cumsum(counts, out=goff[1:])
        return pa.table({
            group_col: pa.array(uniq, pa.string()),
            "n_members": pa.array(n_members, pa.int64()),
            "n_tokens": pa.array(n_tokens, pa.int64()),
            "n_distinct": pa.array(n_distinct, pa.int64()),
            "sketch": pa.ListArray.from_arrays(
                pa.array(goff, pa.int32()), pa.array(vv, pa.uint64()))})

    return packed.groupby("part").map_groups(union_groups,
                                             batch_format="pyarrow")


def concat_with_spacers(ds, k: int, group_col: str = "group_id",
                        text_col: str = "text", order_col: str = None,
                        num_partitions: int = 32,
                        spacer: str = SPACER_TOKEN):
    """Literal kmcp ``bigSeq`` analogue: one row per group whose text is
    the members' texts joined by ``k-1`` spacer tokens, members in
    deterministic ``order_col`` order (string sort; defaults to the
    text itself for stability when no order column exists)."""
    sep = " " + " ".join([spacer] * max(k - 1, 1)) + " "

    ex = Exchange([("gid", pa.string()), ("okey", pa.string()),
                   ("txt", pa.string())], num_partitions)

    def prep(batch: pa.Table) -> pa.Table:
        gid = column(batch, group_col).cast(pa.string())
        txt = column(batch, text_col).cast(pa.string())
        okey = column(batch, order_col).cast(pa.string()) if order_col \
            else txt
        return pa.table({"gid": gid, "okey": okey, "txt": txt})

    packed = ds.map_batches(prep, batch_format="pyarrow",
                            zero_copy_batch=True) \
        .map_batches(ex.make_pack_fn(hash_part_fn("gid", P=num_partitions)),
                     batch_format="pyarrow", zero_copy_batch=True)

    def join_groups(group: pa.Table) -> pa.Table:
        u = ex.unpack(group)
        gid = u["gid"].to_numpy(zero_copy_only=False)
        okey = u["okey"].to_numpy(zero_copy_only=False)
        txt = u["txt"].to_numpy(zero_copy_only=False)
        order = np.lexsort((okey, gid))
        gid, txt = gid[order], txt[order]
        uniq, codes = np.unique(gid, return_inverse=True)
        out = [None] * len(uniq)
        bounds = np.nonzero(np.concatenate(
            ([True], codes[1:] != codes[:-1])))[0]
        ends = np.concatenate((bounds[1:], [len(codes)]))
        for g, (s, e) in enumerate(zip(bounds, ends)):
            out[codes[s]] = sep.join(x or "" for x in txt[s:e])
        return pa.table({group_col: pa.array(uniq, pa.string()),
                         text_col: pa.array(out, pa.string())})

    return packed.groupby("part").map_groups(join_groups,
                                             batch_format="pyarrow")
