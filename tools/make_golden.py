"""Generate the golden-output parquet files for the image-stage
oracle entries (decode_verify / resize_images / frame_sample /
image_features / image_dedup).

The kmcp analogue is the version-pinned golden profile shipped with the
reference (demo-profiling/mock.kmcp.gz.kmcp.profile.v0.8.2): the stub
codec is deterministic and the five queries build their corpora from
fixed (n, seed) with NO dependence on the sf tables, so their outputs
are constants of the codebase.  This tool runs each query once and
freezes the result under tests/golden/; ``oracle_sql()`` then reads the
frozen file back with DuckDB ``read_parquet`` and the driver's value
hash compares engine vs golden — converting the five entries from
rows-only to hash-verified.

Regenerate ONLY on an intentional codec/stage semantics change:

    python tools/make_golden.py

tests/test_imagecodec.py asserts live query output == golden, so an
accidental drift fails pytest before it ever reaches the driver.
"""

from __future__ import annotations

import os
import sys

GOLDEN_QUERIES = ["decode_verify", "resize_images", "frame_sample",
                  "image_features", "image_dedup",
                  # r5: both (n, seed)-deterministic and bit-stable
                  # across runs (verified twice-run-equal before
                  # freezing) — the same version-pinned pattern
                  "profile_em", "audio_features"]

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "golden")


def main() -> int:
    import ray
    import ray.data

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    ray.data.DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, os.path.dirname(GOLDEN_DIR.rstrip("/")
                                       .rsplit("/tests", 1)[0]) or "/")
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod
    import pyarrow.parquet as pq

    os.makedirs(GOLDEN_DIR, exist_ok=True)
    qs = entrymod.queries()
    for name in GOLDEN_QUERIES:
        # sf_dir is unused by these queries (corpora are (n, seed)-
        # deterministic), but pass the canonical one for the signature
        tbl = qs[name]("/root/testdata/sf0.01")
        import pandas as pd
        import pyarrow as pa
        if isinstance(tbl, ray.data.Dataset):
            at = pa.Table.from_pandas(tbl.to_pandas(),
                                      preserve_index=False)
        elif isinstance(tbl, pd.DataFrame):
            at = pa.Table.from_pandas(tbl, preserve_index=False)
        else:
            at = tbl
        out = os.path.join(GOLDEN_DIR, f"{name}.parquet")
        pq.write_table(at, out)
        print(f"wrote {out}: {at.num_rows} rows, "
              f"{at.schema.names}")
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
