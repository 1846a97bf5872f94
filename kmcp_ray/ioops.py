"""Source/sink utilities: Lance-with-Parquet-fallback I/O, directory
walking with regex file filters, duplicate-input validation.

BASELINE.json's input_hint specifies Lance tables; the ``lance``
package is not installed in this sandbox, so every reader/writer goes
through :func:`read_table` / :func:`write_table`, which use
``ray.data.read_lance`` / ``Dataset.write_lance`` when the package is
importable and Parquet otherwise — and record which path ran.
"""

from __future__ import annotations

import os
import re

try:                                   # availability check, not a stub
    import lance  # noqa: F401
    HAS_LANCE = True
except Exception:                      # pragma: no cover - env-dependent
    HAS_LANCE = False


def io_format() -> str:
    return "lance" if HAS_LANCE else "parquet"


def read_table(path: str, *, columns=None, **kw):
    """ray.data.read_lance when available (and the path looks like a
    Lance dataset), else read_parquet."""
    import ray.data
    if HAS_LANCE and (path.endswith(".lance")
                      or os.path.isdir(os.path.join(path, "_versions"))):
        return ray.data.read_lance(path, columns=columns, **kw)
    return ray.data.read_parquet(path, columns=columns, **kw)


def write_table(ds, path: str, **kw) -> str:
    """→ the format actually written ("lance" | "parquet"), recorded by
    callers in their manifests (kmcp __db.yml analogue)."""
    if HAS_LANCE:
        ds.write_lance(path, **kw)
        return "lance"
    ds.write_parquet(path, **kw)
    return "parquet"


def list_files(root: str, file_regexp: str = r"\.parquet$") -> list:
    """Recursive directory walk + regex file filter (kmcp
    -r/--file-regexp, reference: kmcp/cmd/util.go:115-143 semantics:
    the pattern matches the file NAME).  Returns sorted paths."""
    rx = re.compile(file_regexp)
    out = []
    for dirpath, _dirs, files in os.walk(root):
        for f in files:
            if rx.search(f):
                out.append(os.path.join(dirpath, f))
    return sorted(out)


def check_duplicate_inputs(paths) -> list:
    """Refuse duplicated input files (kmcp merge's duplicate-input
    check, reference: kmcp/cmd/merge.go:140-149)."""
    seen, dups = set(), []
    for p in paths:
        rp = os.path.realpath(p)
        if rp in seen:
            dups.append(p)
        seen.add(rp)
    if dups:
        raise ValueError(f"duplicated input files: {dups}")
    return list(paths)


def duplicate_names(ds, col: str):
    """Names occurring more than once (kmcp index-build duplicate-name
    warning, reference: kmcp/cmd/index.go:524-537) — one groupby over
    a single projected column."""
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Count
    counts = ds.select_columns([col]).groupby(col).aggregate(
        Count(alias_name="n"))
    return counts.map_batches(
        lambda t: t.filter(pc.greater(t["n"], pa.scalar(1))),
        batch_format="pyarrow", zero_copy_batch=True)
