"""Interval merging — the kmcp ``utils merge-regions`` analogue
(reference: kmcp/cmd/merge-regions.go:304-386: per-chromosome sweep
merging overlapping/adjacent BED intervals).

Ray-Data-first: intervals are hash-partitioned by group key through the
packed exchange; each partition runs one vectorized sweep (sort by
(group, start); an interval starts a new merged region iff its start
exceeds the running max end — the classic island detection, computed
with cummax over segment boundaries, no per-interval Python)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from kmcp_ray.exchange import Exchange, hash_part_fn


def merge_regions(ds, *, group_col: str = "chrom", start_col: str = "start",
                  end_col: str = "end", num_partitions: int = 64,
                  adjacent: bool = True):
    """(group, start, end) rows → merged disjoint regions per group:
    (group, start, end, n_merged).  ``adjacent``: end == next start
    counts as overlapping (BED half-open convention merges these)."""
    ex = Exchange([(group_col, pa.string()), (start_col, pa.int64()),
                   (end_col, pa.int64())], num_partitions)

    def norm(batch: pa.Table) -> pa.Table:
        return pa.table({
            group_col: batch.column(group_col).cast(pa.string()),
            start_col: batch.column(start_col).cast(pa.int64()),
            end_col: batch.column(end_col).cast(pa.int64())})

    packed = ds.map_batches(norm, batch_format="pyarrow",
                            zero_copy_batch=True) \
        .map_batches(ex.make_pack_fn(hash_part_fn(group_col,
                                                  P=num_partitions)),
                     batch_format="pyarrow", zero_copy_batch=True)

    def sweep(group: pa.Table) -> pa.Table:
        u = ex.unpack(group)
        g = u[group_col].to_numpy(zero_copy_only=False)
        s = u[start_col].to_numpy(zero_copy_only=False).astype(np.int64)
        e = u[end_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(g) == 0:
            return pa.table({group_col: pa.array([], pa.string()),
                             start_col: pa.array([], pa.int64()),
                             end_col: pa.array([], pa.int64()),
                             "n_merged": pa.array([], pa.int64())})
        order = np.lexsort((e, s, g))
        g, s, e = g[order], s[order], e[order]
        gfirst = np.concatenate(([True], g[1:] != g[:-1]))
        # running max end within each group, vectorized cummax with
        # resets at group boundaries via the offset trick
        seg = np.cumsum(gfirst) - 1
        big = (e.max() - e.min() + 1) if len(e) else 1
        cummax = np.maximum.accumulate(e + seg * big) - seg * big
        prev_max = np.empty_like(cummax)
        prev_max[0] = np.iinfo(np.int64).min
        prev_max[1:] = cummax[:-1]
        if adjacent:
            new_region = gfirst | (s > prev_max)
        else:
            new_region = gfirst | (s >= prev_max)
        rid = np.cumsum(new_region) - 1
        n_regions = int(rid[-1]) + 1
        out_g = g[new_region]
        out_s = s[new_region]
        out_e = np.maximum.reduceat(cummax, np.nonzero(new_region)[0])
        n_merged = np.bincount(rid, minlength=n_regions)
        return pa.table({group_col: pa.array(out_g, pa.string()),
                         start_col: pa.array(out_s, pa.int64()),
                         end_col: pa.array(out_e, pa.int64()),
                         "n_merged": pa.array(n_merged, pa.int64())})

    return packed.groupby("part").map_groups(sweep, batch_format="pyarrow")


def to_bed6(regions, *, group_col="chrom", start_col="start",
            end_col="end", name_prefix: str = "region"):
    """Merged regions → BED6-shaped columns (chrom, start, end, name,
    score, strand) — the S11 writer shape (merge-regions.go:304-386)."""
    def fn(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        names = pa.array([f"{name_prefix}_{i}" for i in range(n)],
                         pa.string())
        return pa.table({
            "chrom": batch.column(group_col),
            "start": batch.column(start_col),
            "end": batch.column(end_col),
            "name": names,
            "score": batch.column("n_merged"),
            "strand": pa.array(["."] * n, pa.string())})
    return regions.map_batches(fn, batch_format="pyarrow",
                               zero_copy_batch=True)
