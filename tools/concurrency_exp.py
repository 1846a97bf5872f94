"""Fault-tax attribution experiment (r2 verdict next-round #2a).

Run the 3.2M-row headline job at num_cpus=8 SOLO, then TWO copies
CONCURRENTLY (separate Ray clusters, bounded object stores).  If the
serial term S in T(n) = P/n + S is machine-global (one kernel-side
lock — the first-touch page-fault hypothesis), each concurrent job's
wall time inflates by roughly the OTHER job's serial demand; a purely
per-process S leaves the concurrent walls ~unchanged (16 of 32 host
CPUs are idle during the solo run, so there is no CPU starvation).

Usage: python tools/concurrency_exp.py [rows]   (default 3200000)
"""
import json
import os
import subprocess
import sys
import time

ROWS = sys.argv[1] if len(sys.argv) > 1 else "3200000"
ENV = dict(os.environ, RAY_GRAFT_CPUS="8", GRAFT_BENCH_ROWS=ROWS,
           GRAFT_SKIP_QUERIES="1", GRAFT_OBJ_GB="20")
BENCH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "bench.py")


def run(tag):
    env = dict(ENV, GRAFT_BENCH_TAG=tag, RAY_TMPDIR=f"/tmp/ray_{tag}")
    os.makedirs(f"/tmp/ray_{tag}", exist_ok=True)
    return subprocess.Popen(
        [sys.executable, BENCH], env=env, stdout=subprocess.PIPE,
        stderr=open(f"/tmp/conc{tag}.err", "w"), text=True)


def collect(p, tag):
    out, _ = p.communicate()
    lines = out.strip().splitlines()
    if p.returncode != 0 or not lines:
        sys.exit(f"job {tag} failed rc={p.returncode}; "
                 f"see /tmp/conc{tag}.err")
    return json.loads(lines[-1])


t0 = time.time()
solo = collect(run("_solo"), "_solo")
print("SOLO  :", solo["headline_reps"], "min", solo["value"], flush=True)

pa, pb = run("_a"), run("_b")
ra = collect(pa, "_a")
rb = collect(pb, "_b")
print("CONC_A:", ra["headline_reps"], "min", ra["value"], flush=True)
print("CONC_B:", rb["headline_reps"], "min", rb["value"], flush=True)
print(json.dumps({"rows": int(ROWS),
                  "solo_reps": solo["headline_reps"],
                  "conc_a_reps": ra["headline_reps"],
                  "conc_b_reps": rb["headline_reps"],
                  "solo_min": solo["value"],
                  "conc_min_a": ra["value"],
                  "conc_min_b": rb["value"]}))
