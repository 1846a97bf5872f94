"""CLI entry points — the kmcp subcommand surface re-expressed.

    python -m kmcp_ray compute --input PQ --output DIR  (kmcp compute)
    python -m kmcp_ray dedup   --input DIR --output DIR [--workdir DIR]
    python -m kmcp_ray search  --queries PQ --refs PQ --output DIR
    python -m kmcp_ray merge   --inputs DIR [DIR ...] --output DIR
                               [--mode union|intersect]   (kmcp merge /
                               util-db-search multi-DB intersection)
    python -m kmcp_ray profile --assignments DIR --edges DIR --output DIR
    python -m kmcp_ray merge-regions --input PQ --output BED

Each command owns its Ray session (the library never calls ray.init).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _init(args) -> bool:
    """→ True iff this call started the Ray session (and so owns it).

    ``--ray-address local`` (the default when $RAY_ADDRESS is unset or
    ``local``) starts a single-node session sized by ``--num-cpus``;
    any other address ATTACHES to that running cluster — the mode a
    ``ray job submit`` driver runs in (the job runtime exports
    RAY_ADDRESS, so submitted jobs attach with no extra flags; see
    jobs/submit_dedup.sh).  An attached session never passes num_cpus —
    the cluster's resources are the cluster's."""
    import ray
    import ray.data
    started = not ray.is_initialized()
    if started:
        if args.ray_address == "local":
            ray.init(address="local", num_cpus=args.num_cpus,
                     include_dashboard=False, logging_level="ERROR")
        else:
            ray.init(address=args.ray_address, logging_level="ERROR")
    ray.data.DataContext.get_current().enable_progress_bars = False
    return started


def main(argv=None):
    p = argparse.ArgumentParser(prog="kmcp_ray")
    p.add_argument("--num-cpus", type=int, default=32)
    p.add_argument("--ray-address",
                   default=os.environ.get("RAY_ADDRESS") or "local",
                   help='"local" = own single-node session; anything '
                        "else = attach to that cluster (ray job submit "
                        "drivers inherit $RAY_ADDRESS)")
    sub = p.add_subparsers(dest="cmd", required=True)

    d = sub.add_parser("dedup", help="near-dup detection + clustering")
    d.add_argument("--input", required=True, help="parquet file/dir")
    d.add_argument("--output", required=True)
    d.add_argument("--workdir", default=None, help="checkpoint dir (resumable)")
    d.add_argument("--config", default=None, help="JSON DedupConfig overrides")
    d.add_argument("--id-col", default="image_id")
    d.add_argument("--text-col", default="caption")
    d.add_argument("--phash-col", default="phash")
    d.add_argument("--bytes-col", default="bytes")

    c = sub.add_parser("compute", help="sketch only: input rows → signature "
                       "table parquet (kmcp compute analogue)")
    c.add_argument("--input", required=True, help="parquet file/dir")
    c.add_argument("--output", required=True)
    c.add_argument("--config", default=None, help="JSON DedupConfig overrides")
    c.add_argument("--id-col", default="image_id")
    c.add_argument("--text-col", default="caption")
    c.add_argument("--phash-col", default="phash")
    c.add_argument("--bytes-col", default="bytes")

    s = sub.add_parser("search", help="query-vs-reference containment search")
    s.add_argument("--queries", required=True)
    s.add_argument("--refs", required=True)
    s.add_argument("--output", required=True)
    s.add_argument("--id-col", default="doc_id")
    s.add_argument("--text-col", default="text")
    s.add_argument("--min-qcov", type=float, default=0.5)
    s.add_argument("--top-n-scores", type=int, default=0)
    s.add_argument("--tsv", default=None, help="also write the kmcp "
                   "15-column TSV (+ trailer stats) to this path")

    m = sub.add_parser("merge", help="merge per-shard search results "
                       "(kmcp merge; --mode intersect = multi-DB keep-if-"
                       "in-all with min count, util-db-search.go:359-474)")
    m.add_argument("--inputs", required=True, nargs="+",
                   help="search-result parquet dirs")
    m.add_argument("--output", required=True)
    m.add_argument("--mode", default="union", choices=["union", "intersect"])
    m.add_argument("--top-n-scores", type=int, default=0)

    pr = sub.add_parser("profile", help="per-cluster profiling report")
    pr.add_argument("--input", required=True, help="original input parquet")
    pr.add_argument("--assignments", required=True, help="assignments parquet dir")
    pr.add_argument("--output", required=True)

    mr = sub.add_parser("merge-regions", help="sort + merge overlapping "
                        "intervals → BED6 (kmcp utils merge-regions)")
    mr.add_argument("--input", required=True,
                    help="parquet with chrom/start/end columns")
    mr.add_argument("--output", required=True, help="BED6 text file")
    mr.add_argument("--no-adjacent", action="store_true",
                    help="do not merge touching (end == next start) intervals")

    args = p.parse_args(argv)
    owns_ray = _init(args)
    import ray
    import ray.data

    from kmcp_ray.config import DedupConfig

    if args.cmd == "compute":
        from kmcp_ray.pipeline import sketch_stage
        overrides = json.loads(args.config) if args.config else {}
        cfg = DedupConfig(**overrides)
        ds = ray.data.read_parquet(args.input)
        sig = sketch_stage(
            ds, cfg, id_col=args.id_col, text_col=args.text_col,
            phash_col=args.phash_col if args.phash_col != "none" else None,
            bytes_col=args.bytes_col if args.bytes_col != "none" else None)
        sig.write_parquet(args.output)
        print(json.dumps({"signatures": ray.data.read_parquet(args.output).count(),
                          "output": args.output}))
    elif args.cmd == "merge":
        from kmcp_ray.search import intersect_search_results, merge_search_results
        shards = [ray.data.read_parquet(p) for p in args.inputs]
        if args.mode == "intersect":
            out = intersect_search_results(shards)
        else:
            out = merge_search_results(shards, top_n_scores=args.top_n_scores)
        out.write_parquet(args.output)
        print(json.dumps({"matches": ray.data.read_parquet(args.output).count()}))
    elif args.cmd == "merge-regions":
        from kmcp_ray.regions import merge_regions, to_bed6
        regions = merge_regions(ray.data.read_parquet(args.input),
                                adjacent=not args.no_adjacent)
        bed = to_bed6(regions).to_pandas().sort_values(
            ["chrom", "start", "end"])
        with open(args.output, "w") as f:
            for row in bed.itertuples(index=False):
                f.write("\t".join(str(v) for v in row) + "\n")
        print(json.dumps({"regions": len(bed), "output": args.output}))
    elif args.cmd == "dedup":
        from kmcp_ray.pipeline import dedup_pipeline
        overrides = json.loads(args.config) if args.config else {}
        cfg = DedupConfig(**overrides)
        ds = ray.data.read_parquet(args.input)
        res = dedup_pipeline(ds, cfg, id_col=args.id_col,
                             text_col=args.text_col,
                             phash_col=args.phash_col if args.phash_col != "none" else None,
                             bytes_col=args.bytes_col if args.bytes_col != "none" else None,
                             workdir=args.workdir)
        res.assignments.write_parquet(args.output)
        n = ray.data.read_parquet(args.output).count()
        print(json.dumps({"assignments": n, "output": args.output}))
    elif args.cmd == "search":
        from kmcp_ray import search as search_mod
        out = search_mod.search(
            ray.data.read_parquet(args.queries),
            ray.data.read_parquet(args.refs), DedupConfig(),
            query_id=args.id_col, query_text=args.text_col,
            ref_id=args.id_col, ref_text=args.text_col,
            min_qcov=args.min_qcov, top_n_scores=args.top_n_scores)
        out.write_parquet(args.output)
        stats = {"matches": ray.data.read_parquet(args.output).count()}
        if args.tsv:
            total = ray.data.read_parquet(args.queries).count()
            stats["tsv"] = search_mod.to_kmcp_tsv(
                ray.data.read_parquet(args.output), args.tsv,
                DedupConfig(), total)
        print(json.dumps(stats))
    elif args.cmd == "profile":
        from kmcp_ray.profile import abundance
        assignments = ray.data.read_parquet(args.assignments)
        abundance(assignments).write_parquet(args.output)
        print(json.dumps({"clusters": ray.data.read_parquet(args.output).count()}))
    if owns_ray:
        ray.shutdown()


if __name__ == "__main__":
    main()
