"""Index/bucket diagnostics — the kmcp ``utils index-density`` /
``ref-info`` analogue (reference: kmcp/cmd/index-density.go,
ref-info.go:146): recompute invariants of the banding structure so skew
is observable before it costs a run.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from kmcp_ray import bands as bands_mod
from kmcp_ray.config import DedupConfig


def bucket_stats(sig_ds, cfg: DedupConfig, enable=("minhash", "contain",
                                                   "phash", "exact")):
    """Per-kind bucket-size histogram of the LSH banding.

    Returns a small Dataset (kind, bucket_size, n_buckets) — the
    distribution every skew knob (max_bucket, max_shingle_df) acts on.
    """
    band_fn = bands_mod.make_band_fn(cfg, enable=enable)
    band_ds = sig_ds.map_batches(band_fn, batch_format="pyarrow",
                                 batch_size=4096, zero_copy_batch=True)

    def hist_partition(group: pa.Table) -> pa.Table:
        from kmcp_ray.arrowutil import column, list_to_numpy
        from kmcp_ray.bands import bkey_kind
        # both packed entry streams (id-free + designated) form buckets;
        # bkey embeds the kind in its top 2 bits (bands.pack_bkey)
        key1, _ = list_to_numpy(column(group, "bkey"), dtype=np.uint32)
        key2, _ = list_to_numpy(column(group, "dbkey"), dtype=np.uint32)
        keys = np.concatenate((key1, key2))
        kinds = bkey_kind(keys)
        if len(kinds) == 0:
            return pa.table({"kind": pa.array([], pa.int8()),
                             "bucket_size": pa.array([], pa.int64()),
                             "n_buckets": pa.array([], pa.int64())})
        df = pd.DataFrame({"kind": kinds, "key": keys})
        sizes = df.groupby(["kind", "key"], sort=False).size()
        hist = sizes.reset_index(name="sz").groupby(["kind", "sz"],
                                                    sort=False).size()
        out = hist.reset_index(name="n")
        return pa.table({"kind": pa.array(out["kind"].to_numpy(), pa.int8()),
                         "bucket_size": pa.array(out["sz"].to_numpy(), pa.int64()),
                         "n_buckets": pa.array(out["n"].to_numpy(), pa.int64())})

    from ray.data.aggregate import Sum
    per_part = band_ds.groupby("part").map_groups(hist_partition,
                                                  batch_format="pyarrow")
    return per_part.groupby(["kind", "bucket_size"]).aggregate(
        Sum("n_buckets", alias_name="n_buckets"))


def report_kmcp(profile_df: pd.DataFrame) -> str:
    """Render a cluster profile as a kmcp-profile-shaped TSV string
    (reference: kmcp/cmd/profile.go:2872-2909 output shape, re-derived:
    one row per target with abundance + stats columns)."""
    cols = ["cluster_id", "size", "n_edges", "n_exact", "n_minhash",
            "n_contain", "n_phash", "mean_score", "p90_score"]
    df = profile_df[cols].sort_values(["size", "cluster_id"],
                                      ascending=[False, True])
    lines = ["\t".join(cols)]
    for _, r in df.iterrows():
        lines.append("\t".join(
            f"{r[c]:.6f}" if isinstance(r[c], float) else str(r[c])
            for c in cols))
    return "\n".join(lines) + "\n"


def report_metaphlan(abundance_df: pd.DataFrame,
                     version: int = 3) -> str:
    """MetaPhlAn2/3-shaped report (reference:
    kmcp/cmd/profile.go:2938-2994 shape, re-derived): v3 adds the
    clade-taxid column; abundances are percentages, largest first."""
    df = abundance_df.sort_values("fraction", ascending=False)
    if version >= 3:
        lines = ["#clade_name\tclade_taxid\trelative_abundance"]
        for _, r in df.iterrows():
            lines.append(f"{r['cluster_id']}\t-\t"
                         f"{100.0 * r['fraction']:.6f}")
    else:
        lines = ["#clade_name\trelative_abundance"]
        for _, r in df.iterrows():
            lines.append(f"{r['cluster_id']}\t{100.0 * r['fraction']:.6f}")
    return "\n".join(lines) + "\n"


def cami_binning_lines(assignments):
    """CAMI binning format (reference: kmcp/cmd/profile.go:2593-2784
    shape, re-derived): per-ROW assignment lines ``@@SEQUENCEID\\tBINID``.
    Unlike the profile reports this output is corpus-sized, so it stays
    a Dataset of text lines (write with ``write_csv``/``write_parquet``);
    prepend :func:`cami_binning_header` when assembling a file."""
    def fn(batch: pa.Table) -> pa.Table:
        ids = batch.column("image_id" if "image_id" in batch.column_names
                           else batch.column_names[0])
        cl = batch.column("cluster_id")
        import pyarrow.compute as pc
        line = pc.binary_join_element_wise(ids.cast(pa.string()),
                                           cl.cast(pa.string()), "\t")
        return pa.table({"line": line})
    return assignments.map_batches(fn, batch_format="pyarrow",
                                   zero_copy_batch=True)


def cami_binning_header(sample_id: str = "sample_0") -> str:
    return (f"@SampleID:{sample_id}\n@Version:0.10.0\n"
            "@@SEQUENCEID\tBINID\n")


def report_cami(abundance_df: pd.DataFrame, sample_id: str = "sample_0") -> str:
    """CAMI-profiling-format-shaped report (reference:
    kmcp/cmd/profile.go:2996-3046 shape, re-derived): header + one line
    per cluster with percentage abundance."""
    lines = [f"@SampleID:{sample_id}", "@Version:0.10.0",
             "@Ranks:cluster", "@@CLUSTERID\tRANK\tPERCENTAGE"]
    df = abundance_df.sort_values("fraction", ascending=False)
    for _, r in df.iterrows():
        lines.append(f"{r['cluster_id']}\tcluster\t{100.0 * r['fraction']:.6f}")
    return "\n".join(lines) + "\n"
