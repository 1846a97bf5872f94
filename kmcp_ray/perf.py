"""Host-specific allocator tuning.

This sandbox's first-touch page faults cost ~100-200 ms/MB (see
BASELINE.md), and glibc returns every >128 KB allocation to the OS on
free — so each large numpy temporary re-pays the fault tax forever.
Raising the mmap/trim thresholds makes glibc RETAIN big blocks in the
heap after free: the second and every later temporary of a worker
process reuses already-faulted pages (measured: a 50 MB copy drops
from ~6.8 s to ~5 ms once warm).

On a normal host these settings are harmless (slightly higher RSS).
"""

from __future__ import annotations

import ctypes
import os

_M_TRIM_THRESHOLD = -1
_M_MMAP_THRESHOLD = -3
_ONE_GB = 1 << 30


def tune_malloc(limit: int = _ONE_GB) -> None:
    """Apply to the CURRENT process (mallopt) and export env vars so
    Ray worker processes forked later inherit the same behavior."""
    os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", str(limit))
    os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", str(limit))
    try:
        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        libc.mallopt(_M_MMAP_THRESHOLD, limit)
        libc.mallopt(_M_TRIM_THRESHOLD, limit)
    except Exception:                   # pragma: no cover - non-glibc
        pass


def tune_data_context(strategy: "str | None" = None) -> None:
    """Per-process Ray Data shuffle-strategy switch.

    ``strategy``: "hash" | "sort" | None (None reads ``$KMCP_SHUFFLE``,
    default "sort").  The hash strategy streams groupby map outputs
    straight to per-partition aggregator actors instead of the default
    materialize+sort, cutting the packed band exchange's 2x traffic
    (measured: band+verify 88.8 s -> 63-71 s at 3.2M rows / 32 CPUs).
    It is a LARGE-JOB setting: per-shuffle aggregator-actor startup
    dwarfs small groupbys (the pytest suite slows >10x under it), so
    only the headline bench/production entry points opt in; read at
    execution time, safe to flip between executions."""
    import os

    import ray.data
    from ray.data.context import ShuffleStrategy

    strategy = strategy or os.environ.get("KMCP_SHUFFLE", "sort")
    ctx = ray.data.DataContext.get_current()
    if strategy == "hash":
        import ray
        ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
        # the defaults (200 partitions, 64 aggregator actors) DEADLOCK
        # when aggregators outnumber schedulable CPUs (reproduced: a
        # 1000-row groupby hangs forever at num_cpus=8) — size both to
        # the session
        ncpu = int(ray.cluster_resources().get("CPU", 8)) \
            if ray.is_initialized() else 8
        ctx.default_hash_shuffle_parallelism = max(8, 4 * ncpu)
        ctx.max_hash_shuffle_aggregators = max(4, ncpu // 2)
    else:
        ctx.shuffle_strategy = ShuffleStrategy.SORT_SHUFFLE_PULL_BASED
