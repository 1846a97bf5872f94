"""Arrow helpers: safe zero-copy-ish extraction of list columns.

``ListArray.values``/``.offsets`` are raw child buffers that ignore
slicing and nulls — unsafe when Ray hands a sliced batch.  This helper
rebuilds (values, offsets) that are always consistent: null entries get
length 0.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def list_to_numpy(col, dtype=None):
    """list-typed Array/ChunkedArray → (flat_values, offsets[int64 n+1]).

    Null list entries contribute zero elements.
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    lens = pc.list_value_length(col)
    lens = pc.fill_null(lens, 0).to_numpy(zero_copy_only=False).astype(np.int64)
    offsets = np.zeros(len(lens) + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    values = col.flatten().to_numpy(zero_copy_only=False)
    if dtype is not None:
        values = values.astype(dtype, copy=False)
    if len(values) != offsets[-1]:
        raise AssertionError(
            f"list flatten mismatch: {len(values)} values vs offsets[-1]="
            f"{offsets[-1]} — unexpected layout")
    return values, offsets


def column(batch: pa.Table, name: str) -> pa.Array:
    """Table column as a combined (non-chunked) Array."""
    col = batch.column(name)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return col
