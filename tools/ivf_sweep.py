"""IVF accuracy/cost sweep: recall vs nprobe at fixed k.

Documents the IVF accuracy knob the way kmcp documents FPR vs block
size (reference: kmcp/cmd/index.go:88-92 flag docs): for each nprobe,
run ``ann.ivf_topk`` over the sf embeddings table against the
brute-force ``ann.topk_cosine`` ground truth and report top-k recall +
the probed fraction (the FLOP/IO cost proxy — a probe reads
nprobe/nlist of the inverted lists).

Usage: python tools/ivf_sweep.py [sf_dir] [k] [nlist]
Result table is recorded in BASELINE.md (r3 verdict #8).
"""

from __future__ import annotations

import sys

import numpy as np


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    nlist = int(sys.argv[3]) if len(sys.argv) > 3 else 16

    import ray
    import ray.data
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    ray.data.DataContext.get_current().enable_progress_bars = False
    sys.path.insert(0, "/root/repo")
    import pyarrow.parquet as pq

    from kmcp_ray import ann

    emb = pq.read_table(f"{sf_dir}/embeddings.parquet",
                        columns=["vec_id", "embedding"])
    ids = emb.column("vec_id").to_numpy().astype(np.int64)
    mat = np.stack([np.asarray(v, dtype=np.float64)
                    for v in emb.column("embedding").to_pylist()])
    qsel = ids < 64
    q = (ids[qsel], mat[qsel])
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])

    exact = ann.topk_cosine(ds, q, k=k).to_pandas()
    eset = set(map(tuple, exact[["query_id", "neighbor_id"]]
                   .itertuples(index=False)))
    cent = ann.train_ivf_centroids(ds, nlist=nlist)
    print(f"# IVF sweep: sf={sf_dir} rows={len(ids)} k={k} nlist={nlist}"
          f" queries={int(qsel.sum())}")
    print("nprobe\tprobed_frac\trecall")
    import time
    for nprobe in (1, 2, 4, 8, nlist):
        t0 = time.time()
        ivf = ann.ivf_topk(ds, q, k=k, centroids=cent,
                           nprobe=nprobe).to_pandas()
        dt = time.time() - t0
        vset = set(map(tuple, ivf[["query_id", "neighbor_id"]]
                       .itertuples(index=False)))
        rec = len(eset & vset) / max(len(eset), 1)
        print(f"{nprobe}\t{nprobe / nlist:.3f}\t{rec:.4f}\t[{dt:.1f}s]")
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
