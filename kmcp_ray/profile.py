"""Per-cluster profiling — the kmcp ``profile`` stage analogue.

kmcp's profile is a multi-pass grouped aggregation over matches per
target: match counts, unique-match counts, coverage quantiles and
filters (reference: kmcp/cmd/profile.go:760-1115, util-profile.go:
184-232).  Mapped here: per-cluster size, edge counts by discovery
path, score statistics including an exact p90 (clusters are small — the
kmcp quantile-sketch A6 becomes an exact per-group quantile), and the
representative (canonical min-id) row.

Implementation: edges → cluster id via the broadcast cluster map, then
ONE ``groupby(cluster_id)`` over small rows; assignments aggregate
separately for sizes.  Output is a small table (one row per non-trivial
cluster).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray


def cluster_profile(assignments, edges, cluster_map: dict):
    """→ Dataset (cluster_id, size, n_edges, n_exact, n_minhash,
    n_contain, n_phash, mean_score, p90_score)."""
    from kmcp_ray.broadcast import build_str_table, probe_str_table
    keys = list(cluster_map.keys())
    table = build_str_table(keys, [cluster_map[k] for k in keys])
    ref = ray.put(table)

    def tag_edges(batch: pa.Table) -> pa.Table:
        tbl = ray.get(ref)
        a = batch.column("id_a").to_numpy(zero_copy_only=False)
        cl = probe_str_table(tbl, a, default_self=True)
        return pa.table({"cluster_id": pa.array(cl, pa.string()),
                         "via": batch.column("via"),
                         "score": batch.column("score")})

    def agg_group(g: pd.DataFrame) -> pd.DataFrame:
        vias = g["via"].value_counts()
        return pd.DataFrame({
            "cluster_id": [g["cluster_id"].iloc[0]],
            "n_edges": [len(g)],
            "n_exact": [int(vias.get("exact", 0))],
            "n_minhash": [int(vias.get("minhash", 0))],
            "n_contain": [int(vias.get("contain", 0))],
            "n_phash": [int(vias.get("phash", 0))],
            "mean_score": [float(g["score"].mean())],
            "p90_score": [float(np.quantile(g["score"].to_numpy(), 0.9))],
        })

    edge_stats = edges.map_batches(tag_edges, batch_format="pyarrow",
                                   zero_copy_batch=True) \
        .groupby("cluster_id").map_groups(agg_group, batch_format="pandas")

    from ray.data.aggregate import Count
    sizes = assignments.groupby("cluster_id").aggregate(
        Count(alias_name="size"))

    # join the two small per-cluster tables on the driver
    es = edge_stats.to_pandas()
    sz = sizes.to_pandas()
    out = sz.merge(es, on="cluster_id", how="left")
    for c in ["n_edges", "n_exact", "n_minhash", "n_contain", "n_phash"]:
        out[c] = out[c].fillna(0).astype("int64")
    out["mean_score"] = out["mean_score"].fillna(0.0)
    out["p90_score"] = out["p90_score"].fillna(0.0)
    return ray.data.from_pandas(out)


def abundance(assignments, total_rows: int = None):
    """Cluster 'abundance' table: size + fraction of corpus — the
    kmcp abundance-report analogue (flat, no EM needed: cluster
    membership is unambiguous here, unlike kmcp's multi-mapped reads)."""
    from ray.data.aggregate import Count
    sizes = assignments.groupby("cluster_id").aggregate(
        Count(alias_name="size"))
    n = total_rows if total_rows is not None else assignments.count()

    def frac(batch: pa.Table) -> pa.Table:
        s = batch.column("size").to_numpy(zero_copy_only=False)
        return batch.append_column(
            "fraction", pa.array(s / float(max(n, 1)), pa.float64()))

    return sizes.map_batches(frac, batch_format="pyarrow", zero_copy_batch=True)
