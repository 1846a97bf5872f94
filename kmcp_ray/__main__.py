"""CLI entry points — the kmcp subcommand surface re-expressed.

    python -m kmcp_ray dedup   --input DIR --output DIR [--workdir DIR]
    python -m kmcp_ray search  --queries PQ --refs PQ --output DIR
    python -m kmcp_ray profile --assignments DIR --edges DIR --output DIR

Each command owns its Ray session (the library never calls ray.init).
"""

from __future__ import annotations

import argparse
import json
import sys


def _init(args):
    import ray
    import ray.data
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    ray.data.DataContext.get_current().enable_progress_bars = False


def main(argv=None):
    p = argparse.ArgumentParser(prog="kmcp_ray")
    p.add_argument("--num-cpus", type=int, default=32)
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

    s = sub.add_parser("search", help="query-vs-reference containment search")
    s.add_argument("--queries", required=True)
    s.add_argument("--refs", required=True)
    s.add_argument("--output", required=True)
    s.add_argument("--id-col", default="doc_id")
    s.add_argument("--text-col", default="text")
    s.add_argument("--min-qcov", type=float, default=0.5)
    s.add_argument("--top-n-scores", type=int, default=0)

    pr = sub.add_parser("profile", help="per-cluster profiling report")
    pr.add_argument("--input", required=True, help="original input parquet")
    pr.add_argument("--assignments", required=True, help="assignments parquet dir")
    pr.add_argument("--output", required=True)

    args = p.parse_args(argv)
    _init(args)
    import ray
    import ray.data

    from kmcp_ray.config import DedupConfig

    if args.cmd == "dedup":
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
        print(json.dumps({"matches": ray.data.read_parquet(args.output).count()}))
    elif args.cmd == "profile":
        from kmcp_ray.profile import abundance
        assignments = ray.data.read_parquet(args.assignments)
        abundance(assignments).write_parquet(args.output)
        print(json.dumps({"clusters": ray.data.read_parquet(args.output).count()}))
    ray.shutdown()


if __name__ == "__main__":
    main()
