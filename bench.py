#!/usr/bin/env python
"""Benchmark harness — prints ONE JSON line.

  python bench.py             # run at $RAY_GRAFT_CPUS (default 32) on
                              # $GRAFT_SF_DIR (default /root/testdata/sf0.1)
  python bench.py --scaling   # same job at num_cpus=8 and 32 in fresh
                              # processes → throughputs + efficiency

Headline = the flagship near-dup pipeline (sketch → LSH shuffle →
verify → union-find → emit) over a cached deterministic synthetic
image+caption corpus (default 800k rows; GRAFT_BENCH_ROWS overrides),
consumed by writing cluster assignments to Parquet.  Secondary queries
time the other operator families on the sf tables.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

BENCH_ROWS = int(os.environ.get("GRAFT_BENCH_ROWS", "800000"))
SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NCPU = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
CACHE = os.environ.get("GRAFT_BENCH_CACHE", "/tmp/kmcp_bench_cache")


def _quiet_known_ray_warnings():
    """Drop two known-benign Ray 2.49 warnings from the bench output.

    Both are reproducible with stock Ray Data and no user code:
    (1) ``groupby(k).map_groups(fn)`` emits a key-only / empty-schema
    RefBundle for every empty sort partition, so the executor logs
    "Operator produced a RefBundle with a different schema" even though
    the data blocks all share the UDF's schema; (2) parquet files that
    carry a pandas-metadata blob make ``hash(pa.Schema)`` raise, so the
    block-schema dedup logs "Failed to hash the schemas" per read.
    Neither affects results (all oracle checks green with them on)."""
    import logging

    class _Drop(logging.Filter):
        def filter(self, rec):
            m = rec.getMessage()
            return not (
                m.startswith("Operator produced a RefBundle with a "
                             "different schema")
                or m.startswith("Failed to hash the schemas"))

    for name in ("ray.data._internal.execution.streaming_executor_state",
                 "ray.data._internal.arrow_ops.transform_pyarrow"):
        logging.getLogger(name).addFilter(_Drop())


def _calibration_wall() -> float:
    """Fixed synthetic workload timed per bench run (r4 verdict #2):
    ~1 s nominal on a quiet host — CPU (matmul) plus fresh first-touch
    pages (new 8 MB allocation per iteration), the two host-regime
    variables that drifted the r3→r4 secondary queries 10-30% with no
    code change.  Emitted as ``calibration_wall`` in the bench JSON so
    round-over-round query diffs are machine-separable: read query
    walls as (query / calibration_wall) ratios; a query that moves with
    the calibration number is regime drift, one that moves against it
    is code."""
    import numpy as np
    t0 = time.time()
    a = np.random.default_rng(0).random((512, 512))
    s = 0.0
    for _ in range(40):
        s += float((a @ a).sum())
        b = np.zeros(8 << 20, dtype=np.uint8)   # 8 MB first-touch
        b[::4096] = 1
        s += float(b[::4096].sum())
    return round(time.time() - t0, 3)


def run_bench() -> dict:
    import ray
    import ray.data

    _quiet_known_ray_warnings()
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from kmcp_ray.perf import tune_malloc
    tune_malloc()      # before ray.init so workers inherit the env

    if not ray.is_initialized():
        # keep the worker pool stable: this VM's first-touch page faults
        # make fresh worker processes expensive, so never reap idle ones.
        # GRAFT_OBJ_GB bounds the object store so CONCURRENT bench
        # processes (the fault-tax attribution experiment) don't overrun
        # /dev/shm + heap with two default-sized stores.
        obj_gb = os.environ.get("GRAFT_OBJ_GB")
        kw = {"object_store_memory": int(float(obj_gb) * (1 << 30))} \
            if obj_gb else {}
        ray.init(address="local", num_cpus=NCPU, include_dashboard=False,
                 logging_level="ERROR",
                 _system_config={"kill_idle_workers_interval_ms": 0}, **kw)
    ctx = ray.data.DataContext.get_current()
    ctx.enable_progress_bars = False
    from kmcp_ray.perf import tune_data_context

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from kmcp_ray import testgen
    from kmcp_ray.config import DedupConfig
    from kmcp_ray.pipeline import dedup_pipeline

    # GRAFT_NUM_PARTS pins the partition count — the scaling protocol
    # sets it to the HIGH level's P so both levels run the IDENTICAL
    # job (partitioning is a property of the job/data, sized for the
    # largest cluster, not re-derived per cluster size)
    n_parts = int(os.environ.get("GRAFT_NUM_PARTS", max(64, NCPU * 4)))
    # host-sized gate knobs (this box: 128 GiB, single node): the
    # broadcast/driver-arm caps are MEMORY-safety levers, so the job
    # owner sizes them to the deployment — exactly kmcp's
    # load-whole-index vs mmap decision (search.go:66-83).  The 12.8M
    # runs overflowed the conservative defaults (2 GB extract gate,
    # 8M-row broadcast cap, 2M-edge driver-UF cap) and fell onto the
    # exchange arms this host executes ~5x slower (BASELINE.md r4
    # forced-arm measurement); at these values every arm stays on the
    # measured-fast path while tables stay far under host memory
    # (vsk table ≤ ~16 GB plasma, member/driver state ≤ ~3 GB heap).
    # driver_class_pair_rows stays at its 32M default: the 12.8M A/B
    # (BASELINE.md r5) measured the serial driver extraction LOSING to
    # the parallel exchange arms past that volume (27.5 s driver vs
    # ~15 s exchange) — the cap is a measured crossover, not a memory
    # limit
    cfg = DedupConfig(num_partitions=n_parts,
                      broadcast_verify_rows=32_000_000,
                      broadcast_assign_edges=16_000_000,
                      driver_extract_bytes=16 << 30)
    corpus = os.path.join(CACHE, f"pairs_n{BENCH_ROWS}_s42")
    testgen.make_corpus_parquet(corpus, BENCH_ROWS, seed=42, cfg=cfg)
    paths = os.path.join(corpus, "pairs")

    # warm-up (untimed): OS page cache for the input + one small
    # end-to-end pass so worker heaps/code paths are faulted in.  This
    # VM's first-touch page faults serialize machine-wide (~8 ms/MB), so
    # the hot (second) rep is the meaningful number — same protocol as
    # the reference's hot-cache baselines (kmcp README.md:140-160).
    # hash shuffle for the wide headline job only (see perf.py: it is a
    # large-job setting; the small secondary queries run faster on the
    # default sort strategy, restored below) — set before the warm-up so
    # the aggregator actors + their heap pages are warm for the reps
    tune_data_context("hash")
    ray.data.read_parquet(paths).count()
    # the warm-up must be SCALE-PROPORTIONAL: worker-heap pages are
    # faulted in proportion to per-task group size, so a 100k warm-up
    # leaves a 3.2M timed rep paying the (machine-serialized) fault tax
    warm = ray.data.read_parquet(
        paths, columns=["image_id", "bytes", "caption", "phash"])
    dedup_pipeline(warm, cfg, materialize_edges=False).assignments.count()
    out_dir = "/tmp/kmcp_bench_out_%d%s" % (
        NCPU, os.environ.get("GRAFT_BENCH_TAG", ""))
    import shutil
    shutil.rmtree(out_dir, ignore_errors=True)

    calib = _calibration_wall()

    import gc
    reps = []
    n_reps = int(os.environ.get("GRAFT_BENCH_REPS", "2"))
    for _rep in range(n_reps):  # min-of-N: damps residual warmup/variance
        shutil.rmtree(out_dir, ignore_errors=True)
        # the pipeline restores "sort" after its wide exchange — re-arm
        # hash for each rep's band stage
        tune_data_context("hash")
        t0 = time.time()
        ds = ray.data.read_parquet(
            paths, columns=["image_id", "bytes", "caption", "phash"])
        # materialize_edges=False: the headline consumes only the
        # assignments — the verified-edge stream flows straight into
        # the forest reduction, one fewer barrier (see pipeline.py)
        res = dedup_pipeline(ds, cfg, materialize_edges=False)
        res.assignments.write_parquet(out_dir)
        reps.append(time.time() - t0)
        # release materialized datasets so the next rep doesn't run
        # against a half-full object store
        del res, ds
        gc.collect()
    t_headline = min(reps)

    queries: dict[str, float] = {}

    def timed(name, fn):
        t = time.time()
        fn()
        queries[name] = round(time.time() - t, 3)

    tune_data_context("sort")    # small queries: default strategy
    skip_queries = os.environ.get("GRAFT_SKIP_QUERIES") == "1"
    import __ray_entry__ as em
    qs = em.queries() if not skip_queries else {}

    def consume(ds_like):
        import pandas as pd
        import pyarrow as pa
        if isinstance(ds_like, (pd.DataFrame, pa.Table)):
            return len(ds_like)
        return ds_like.count()

    if not skip_queries:
        # minhash/simhash: the driver-verified queries() entries run the
        # ORACLE-EXACT knob configuration (bucket_scale=1, verify_k→∞,
        # skew caps lifted — an ~11M-pair exact verification on the
        # word-salad sf corpus BY DESIGN, see __ray_entry__.ex_cfg), so
        # they are timed under the ``*_oracle`` suffix; the PRIMARY
        # names time the production sampled-bands + skew-caps configs a
        # real corpus run uses — keeping round-over-round bench diffs
        # like-for-like (r3 verdict #1).
        from kmcp_ray.config import DedupConfig as _DC
        from kmcp_ray import docs_dedup as _dd
        _pcfg = _DC(num_partitions=16)
        timed("minhash_dedup_docs",
              lambda: _dd.minhash_dedup(em._docs(SF_DIR), _pcfg).count())
        timed("simhash_dedup_docs",
              lambda: _dd.simhash_dedup(em._docs(SF_DIR), _pcfg).count())
        for name in ["exact_dedup_docs", "doc_stats", "lineitem_pricing",
                     "events_hourly_user", "ann_topk", "lsh_cosine_pairs",
                     "doc_fingerprint", "profile_em", "merge_regions",
                     "search_indexed_docs", "hash_sample", "decontaminate",
                     "vocab_topk", "pii_scrub", "sessionize",
                     "pack_sequences", "order_revenue", "brand_revenue",
                     "cohort_retention", "running_window",
                     "source_balance", "span_dedup",
                     "fuzzy_decontaminate", "dsir_select",
                     "semantic_dedup", "hard_negatives",
                     "quality_filter_pctl", "perplexity_score",
                     "hamming_topk", "novelty_score", "big_orders",
                     "oov_rate", "heavy_hitters", "pmi_pairs",
                     "boilerplate_dedup", "contrastive_triplets",
                     "winsorize", "curriculum_order",
                     "triangle_count", "edit_distance_pairs"]:
            timed(name, lambda n=name: consume(qs[n](SF_DIR)))
        # exact-mode twins (the driver-verified queries() entries):
        # timed separately so their cost is visible but never conflated
        # with the production numbers above
        timed("minhash_dedup_oracle",
              lambda: consume(qs["minhash_dedup_docs"](SF_DIR)))
        timed("simhash_dedup_oracle",
              lambda: consume(qs["simhash_dedup_docs"](SF_DIR)))

    n_assign = ray.data.read_parquet(out_dir).count()
    result = {
        "metric": "near-dup pipeline wall time (sketch→LSH→verify→CC→emit, "
                  f"{BENCH_ROWS} image+caption rows)",
        "value": round(t_headline, 3),
        "unit": "sec",
        "queries": queries,
        "sf": SF_DIR,
        "num_cpus": NCPU,
        "rows": BENCH_ROWS,
        "images_per_sec": round(BENCH_ROWS / t_headline, 1),
        "headline_reps": [round(r, 3) for r in reps],
        "assignments": n_assign,
        "calibration_wall": calib,
    }
    ray.shutdown()
    return result


def run_scaling() -> dict:
    """Same job at num_cpus=8 and 32 in fresh processes.

    The sandbox host is noisy (CPU bursts vary the same computation up
    to 8x; first-touch page faults serialize machine-wide), so each
    level runs twice, alternating, and the best run per level is the
    design's scaling signal; all raw observations are reported.
    """
    # the corpus must be compute-dominated at the LOW cpu count or the
    # comparison only measures fixed startup overhead: at 100k rows the
    # whole pipeline finishes in ~5 s and 8→32 CPUs can't show.  The
    # job carries ~9 s of fixed single-process cost (Ray operator
    # launch/planning + the broadcast-table build + driver CC finish)
    # regardless of input size — at 100 TB that fixed cost is noise,
    # so measure scaling in the same strong-scaling regime: 3.2M rows
    # ≈ 1000 CPU-s of parallel work (~2 min at 8 CPUs).
    rows = int(os.environ.get("GRAFT_SCALING_ROWS",
                              str(max(BENCH_ROWS, 3200000))))

    def run(ncpu: int) -> dict:
        # scaling measures the headline pipeline only — the secondary
        # query suite would quadruple wall time without adding signal.
        # GRAFT_NUM_PARTS pinned to the HIGH level's P: both levels run
        # the identical job (see run_bench)
        # partition count sized to DATA, not cores (r5: at 12.8M rows
        # P=128 OOMs the host — per-group verifier heap × concurrent
        # tasks; ~50k rows/partition keeps groups bounded)
        hi_p = str(max(64, int(os.environ.get(
            "GRAFT_SCALING_HI", "32")) * 4, rows // 50_000))
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu),
                   GRAFT_BENCH_ROWS=str(rows),
                   GRAFT_NUM_PARTS=os.environ.get(
                       "GRAFT_NUM_PARTS", hi_p),
                   GRAFT_SKIP_QUERIES="1")
        out = subprocess.run([sys.executable, os.path.abspath(__file__)],
                             env=env, capture_output=True, text=True,
                             check=True).stdout
        return json.loads(out.strip().splitlines()[-1])
    # the N→4N pair under test (default 8→32); any pair with hi = 4*lo
    # is a valid instance of the criterion — 2→8 probes the
    # parallel-dominated regime where the machine-global fault tax
    # (see the concurrency experiment) distorts the ratio least
    lo = int(os.environ.get("GRAFT_SCALING_LO", "8"))
    hi = int(os.environ.get("GRAFT_SCALING_HI", "32"))
    obs = {lo: [], hi: []}
    calibs = []
    for _ in range(2):
        for lvl in (lo, hi):
            r = run(lvl)
            obs[lvl].append(r["value"])
            calibs.append(r.get("calibration_wall"))
    t_lo, t_hi = min(obs[lo]), min(obs[hi])
    eff = (t_lo / t_hi) / (hi / lo)
    return {
        "metric": "scaling efficiency (same job, fresh ray.init at "
                  f"num_cpus={lo} vs {hi}; best of 2 alternating runs)",
        "sec_8": t_lo, "sec_32": t_hi,
        "all_sec_8": obs[lo], "all_sec_32": obs[hi],
        "calibration_walls": calibs,
        "images_per_sec_8": round(rows / t_lo, 1),
        "images_per_sec_32": round(rows / t_hi, 1),
        "scaling_efficiency": round(eff, 3),
        "rows": rows,
        "unit": "ratio",
        "value": round(eff, 3),
    }


def run_scaling_sweep() -> dict:
    """Same job at num_cpus in {2, 4, 8, 16, 32} (one hot rep each,
    full-scale warm-up per process) + a least-squares Amdahl fit
    T(n) = P/n + S over the sweep.

    Rationale (BASELINE.md): on this single host the n-independent term
    S is dominated by a machine-global serialized resource (first-touch
    page faults — proven by the concurrency experiment), which on a
    real N→4N *node* comparison divides by node count like P does.  The
    sweep shows the whole curve instead of one ratio: every measured
    N→4N efficiency plus the fit that separates P from S.
    """
    rows = int(os.environ.get("GRAFT_SCALING_ROWS",
                              str(max(BENCH_ROWS, 3200000))))
    # override to re-measure specific levels (comma-separated), e.g.
    # GRAFT_SWEEP_LEVELS=16,32 — per-level minima across sweep runs are
    # the design signal on this noisy host (see BASELINE.md)
    levels = [int(x) for x in os.environ.get(
        "GRAFT_SWEEP_LEVELS", "2,4,8,16,32").split(",")]

    def run(ncpu: int) -> float:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu),
                   GRAFT_BENCH_ROWS=str(rows),
                   GRAFT_SKIP_QUERIES="1", GRAFT_BENCH_REPS="1")
        out = subprocess.run([sys.executable, os.path.abspath(__file__)],
                             env=env, capture_output=True, text=True,
                             check=True).stdout
        return json.loads(out.strip().splitlines()[-1])["value"]

    walls = {n: run(n) for n in levels}
    # least squares for T = P*(1/n) + S over (1/n, T)
    import numpy as np
    x = np.array([1.0 / n for n in levels])
    y = np.array([walls[n] for n in levels])
    A = np.stack([x, np.ones_like(x)], axis=1)
    (P, S), *_ = np.linalg.lstsq(A, y, rcond=None)
    effs = {f"eff_{n}_to_{4*n}": round((walls[n] / walls[4*n]) / 4.0, 3)
            for n in levels if 4 * n in walls}
    return {
        "metric": "scaling sweep (same job, fresh ray.init per level, "
                  "one hot rep after full-scale warm-up)",
        "rows": rows,
        "walls_sec": {str(n): round(walls[n], 1) for n in levels},
        "amdahl_fit": {"P_cpu_sec": round(float(P), 1),
                       "S_sec": round(float(S), 1)},
        **effs,
        "unit": "ratio",
        "value": effs.get("eff_8_to_32"),
    }


if __name__ == "__main__":
    if "--scaling-sweep" in sys.argv:
        print(json.dumps(run_scaling_sweep()))
    elif "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
