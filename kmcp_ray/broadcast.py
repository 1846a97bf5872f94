"""Zero-copy-friendly broadcast lookup tables.

Python dicts broadcast via ``ray.put`` re-pickle on every task-side
``ray.get``; numpy arrays instead deserialize near-zero-copy from
plasma.  Keys are fixed-width ``S``-dtype byte arrays (our ids are
short ASCII), values either fixed-width numeric arrays or a
(offsets, buffer) blob pair; probes use C-speed ``searchsorted``.
This is the broadcast-small-side idiom from the Ray guide with the
serialization tax removed.
"""

from __future__ import annotations

import numpy as np


def build_blob_table(ids, blobs):
    """ids: sequence of str; blobs: sequence of bytes|None →
    (keys_S_sorted, starts_int64, lens_int64, buffer_uint8).

    The byte buffer stays in INPUT order — only the per-row (start,
    len) index is key-sorted.  Physically reordering the payload would
    need a values-sized gather index (bytes-count int64 entries ≈ 8×
    the payload in fresh pages), which on hosts with slow first-touch
    faults costs more than the whole rest of the pipeline stage."""
    keys = np.asarray(ids, dtype="S")
    order = np.argsort(keys, kind="stable")
    lens_all = np.fromiter((len(b) if b is not None else 0 for b in blobs),
                           dtype=np.int64, count=len(keys))
    src_off = np.zeros(len(lens_all) + 1, dtype=np.int64)
    np.cumsum(lens_all, out=src_off[1:])
    buf = np.frombuffer(b"".join(b or b"" for b in blobs), dtype=np.uint8)
    return keys[order], src_off[:-1][order], lens_all[order], buf


def _harmonize(keys: np.ndarray, probe_ids) -> tuple:
    """Cast keys/probes to a common S-width (numpy strips trailing NULs
    in comparisons, so widening preserves order and equality)."""
    probes = np.asarray(probe_ids, dtype="S")
    w = max(keys.dtype.itemsize, probes.dtype.itemsize, 1)
    return keys.astype(f"S{w}"), probes.astype(f"S{w}")


def probe_blob_table(table, probe_ids) -> list:
    """→ list of memoryview|None per probe id (slices of the buffer)."""
    keys, starts, lens, buf = table
    if len(keys) == 0:
        return [None] * len(probe_ids)
    keys, probes = _harmonize(keys, probe_ids)
    pos = np.searchsorted(keys, probes)
    out = []
    n = len(keys)
    mv = memoryview(buf)
    for i, p in enumerate(pos):
        if p < n and keys[p] == probes[i] and lens[p] > 0:
            s = starts[p]
            out.append(mv[s:s + lens[p]])
        else:
            out.append(None)
    return out


def build_str_table(keys_seq, values_seq):
    """str → str map as (keys_S_sorted, values_S_aligned)."""
    keys = np.asarray(keys_seq, dtype="S")
    values = np.asarray(values_seq, dtype="S")
    order = np.argsort(keys, kind="stable")
    return keys[order], values[order]


def build_map_table(cluster_map):
    """dict OR (nodes, roots) array pair → sorted str table.  The array
    form skips the per-entry Python dict walk (a 1.5M-node cluster map
    costs seconds as a dict, milliseconds as two numpy gathers)."""
    if isinstance(cluster_map, tuple):
        nodes, roots = cluster_map
        return build_str_table(nodes, roots)
    keys = list(cluster_map.keys())
    return build_str_table(keys, [cluster_map[k] for k in keys])


def probe_str_table(table, probe_ids, default_self: bool = True):
    """→ object ndarray of str; missing keys map to themselves when
    ``default_self`` (singleton rows are their own cluster)."""
    keys, values = table
    keys, probes = _harmonize(keys, probe_ids)
    pos = np.searchsorted(keys, probes)
    pos_c = np.clip(pos, 0, max(len(keys) - 1, 0))
    if len(keys):
        hit = (pos < len(keys)) & (keys[pos_c] == probes)
        out = np.where(hit, values[pos_c], probes if default_self else b"")
    else:
        out = probes if default_self else np.full(len(probes), b"")
    return np.char.decode(out.astype("S"), "utf-8")


def build_int_table(keys_seq, values_seq):
    keys = np.asarray(keys_seq, dtype="S")
    values = np.asarray(values_seq, dtype=np.int64)
    order = np.argsort(keys, kind="stable")
    return keys[order], values[order]


def probe_int_table(table, probe_ids, default: int = 0) -> np.ndarray:
    keys, values = table
    if len(keys) == 0:
        return np.full(len(probe_ids), default, dtype=np.int64)
    keys, probes = _harmonize(keys, probe_ids)
    pos = np.searchsorted(keys, probes)
    pos_c = np.clip(pos, 0, len(keys) - 1)
    hit = (pos < len(keys)) & (keys[pos_c] == probes)
    return np.where(hit, values[pos_c], default)


def collect_blob_table(ds, id_col: str, blob_col: str):
    """Build a blob table from a Dataset of (id, binary) — buffer
    concatenation happens vectorized, no per-row Python."""
    ids_parts, len_parts, buf_parts = [], [], []
    for b in ds.iter_batches(batch_size=1 << 18, batch_format="pyarrow"):
        import pyarrow as pa
        import pyarrow.compute as pc
        col = b.column(blob_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        lens = pc.fill_null(pc.binary_length(col), 0) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        # flatten the binary column's data buffer for the valid range
        joined = col.cast(pa.large_binary())
        flat = b"".join(x or b"" for x in joined.to_pylist()) \
            if col.null_count else None
        if flat is None:
            # zero-copy-ish: use the arrow buffers directly
            offs = np.frombuffer(col.buffers()[1], dtype=np.int32,
                                 count=len(col) + 1, offset=col.offset * 4)
            data = np.frombuffer(col.buffers()[2], dtype=np.uint8)
            flat_np = data[offs[0]:offs[-1]]
        else:
            flat_np = np.frombuffer(flat, dtype=np.uint8)
        ids_parts.append(b.column(id_col).to_numpy(zero_copy_only=False))
        len_parts.append(lens)
        buf_parts.append(flat_np)
    if not ids_parts:
        return (np.empty(0, "S1"), np.empty(0, np.int64),
                np.empty(0, np.int64), np.empty(0, np.uint8))
    ids = np.concatenate(ids_parts)
    lens = np.concatenate(len_parts)
    buf = np.concatenate(buf_parts)
    src_off = np.zeros(len(lens) + 1, dtype=np.int64)
    np.cumsum(lens, out=src_off[1:])
    keys = np.asarray(ids, dtype="S")
    order = np.argsort(keys, kind="stable")
    # index-only sort: the byte buffer keeps arrival order; probes
    # slice it via (start, len).  A physical reorder would need a
    # bytes-count gather index (8 bytes per payload byte of fresh
    # pages) — measured 70+ s at 133 MB payload on slow-fault hosts.
    return keys[order], src_off[:-1][order], lens[order], buf
