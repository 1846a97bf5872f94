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
