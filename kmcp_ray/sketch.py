"""Sketch stage: pairs batch → signature table (kmcp ``compute``).

One vectorized ``map_batches`` transform (Arrow in / Arrow out,
``zero_copy_batch=True``) turns each input row into its sketch record:

  image_id, n_tokens, n_distinct, n_sh(i32), bkeys(list<u64> ≤ bands),
  ckeys(list<u64>), sk_fold(u64), phash(i64), exact_key(u64), vsk(binary)

This is the `.unik`-producing core of the reference
(kmcp/cmd/compute.go:746-824: per-k sketch iterators → scale filter →
sort+dedup → write) re-expressed columnar.  The heavy ``bytes`` payload
is consumed here (exact-dup key + optional decode checks) and DROPPED —
image bytes never enter the LSH shuffle, mirroring how kmcp never moves
sequences past ``compute``.

The LSH band keys (``bkeys``) and salted containment bucket keys
(``ckeys``) are FINALIZED here rather than in the band stage: the
signature table is the one full-corpus table the pipeline materializes,
so storing 16 band keys (128 B) instead of the 64-perm raw minhash
(512 B) plus pre-filtered contain keys instead of the whole scaled
sketch cuts its footprint ~3x — every byte saved is an object-store
page never faulted (the measured n-independent term in bench --scaling).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from kmcp_ray import hashing, text
from kmcp_ray.config import DedupConfig

_EXACT_SALT = np.uint64(0x71D67FFFEDA60000)

SIGNATURE_SCHEMA_COLS = [
    "image_id", "n_tokens", "n_distinct", "n_sh", "bkeys", "ckeys",
    "sk_fold", "phash", "exact_key", "vsk",
]


def _list_array(values: np.ndarray, offsets: np.ndarray) -> pa.ListArray:
    return pa.ListArray.from_arrays(
        pa.array(offsets, type=pa.int32()),
        pa.array(values, type=pa.uint64()))


def sketch_fold(sketch_values: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Per-row order-sensitive fold of the (sorted-unique) sketch —
    a cheap whole-sketch identity used by the salted-bucket path."""
    n = len(offsets) - 1
    out = np.empty(n, dtype=np.uint64)
    lens = (offsets[1:] - offsets[:-1]).astype(np.uint64)
    h = lens * hashing._MIX_A
    # iterate position-within-row, vectorized across rows (max len passes)
    maxlen = int(lens.max()) if n else 0
    idx = offsets[:-1].copy()
    for j in range(maxlen):
        active = (offsets[:-1] + j) < offsets[1:]
        pos = offsets[:-1][active] + j
        h[active] = hashing.splitmix64(
            h[active] + sketch_values[pos] * hashing._MIX_B)
    out[:] = h
    return out


def _vsk_array(ss: dict, cfg: DedupConfig) -> pa.Array:
    """Bottom-``verify_k`` of each row's sorted-unique scaled sketch as
    LE-uint64 binary — the pair-verification blob (single definition
    shared by the full sketch pass and the lazy candidate-only pass)."""
    from kmcp_ray.bands import _segment_gather

    off = ss["offsets"]
    n = len(off) - 1
    seg_lens = off[1:] - off[:-1]
    vlens = np.minimum(seg_lens, cfg.verify_k)
    vgather = _segment_gather(off[:-1], vlens)
    voff = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(vlens, out=voff[1:])
    return pa.Array.from_buffers(
        pa.binary(), n,
        [None, pa.py_buffer((voff * 8).astype(np.int32).tobytes()),
         pa.py_buffer(ss["hashes"][vgather].tobytes())])


def _membership(sorted_keys: np.ndarray, probes_obj: np.ndarray) -> np.ndarray:
    """Boolean mask: which probe strings are in the sorted S-dtype key
    array (searchsorted on fixed-width bytes — no Python hashing)."""
    if len(sorted_keys) == 0:
        return np.zeros(len(probes_obj), dtype=bool)
    probes = np.asarray(probes_obj, dtype="S")
    w = max(sorted_keys.dtype.itemsize, probes.dtype.itemsize, 1)
    kk, pp = sorted_keys.astype(f"S{w}"), probes.astype(f"S{w}")
    pos = np.searchsorted(kk, pp)
    pos_c = np.minimum(pos, len(kk) - 1)
    return (pos < len(kk)) & (kk[pos_c] == pp)


def make_vsk_fn(cfg: DedupConfig, id_col: str = "image_id",
                text_col: str = "caption", need_ref=None):
    """Candidate-only verification-sketch pass: batch → (image_id, vsk)
    for rows whose id is in the broadcast ``need_ref`` set (all rows if
    None).  Rows are filtered BEFORE tokenization, so a corpus scan
    recomputing sketches for a small candidate set costs only the
    membership test per non-candidate row.  This keeps the 10^12-row
    signature table free of the ~160 B/row vsk blob that only
    candidate-pair ids (≪ corpus) ever need."""
    import ray as _ray

    def vsk_batch(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col)
        if need_ref is not None:
            keys = _ray.get(need_ref)
            hit = _membership(
                keys, ids.to_numpy(zero_copy_only=False))
            batch = batch.filter(pa.array(hit))
            ids = batch.column(id_col)
        ss = text.shingle_sets_sketcher(batch.column(text_col), cfg)
        return pa.table({"image_id": ids.cast(pa.string()),
                         "vsk": _vsk_array(ss, cfg)})

    return vsk_batch


def make_sketch_fn(cfg: DedupConfig, id_col: str = "image_id",
                   text_col: str = "caption", phash_col: "str | None" = "phash",
                   bytes_col: "str | None" = "bytes", with_vsk: bool = True):
    """Factory for the stateless sketch ``map_batches`` function.

    ``with_vsk=False`` omits the verification blob (~160 B/row, 36% of
    the signature row): the in-memory pipeline recomputes vsk lazily for
    candidate ids only (``make_vsk_fn``), so the one full-corpus
    materialized table stays minimal.  Checkpointed runs keep vsk so a
    resume needs no raw input."""

    def sketch_batch(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        texts = batch.column(text_col)
        ss = text.shingle_sets_sketcher(texts, cfg)
        sig = text.minhash_signatures(ss["hashes"], ss["offsets"], cfg.num_perm)

        cap_np = texts.combine_chunks().to_numpy(zero_copy_only=False) \
            if isinstance(texts, pa.ChunkedArray) else texts.to_numpy(zero_copy_only=False)
        # hash_mode="md5": the SQL-oracle twin hashes whole strings with
        # md5-prefix64 (mirrored by DuckDB md5()); production uses the
        # vectorized SipHash path
        _content_hash = hashing.md5_lower64 \
            if getattr(cfg, "hash_mode", "siphash") == "md5" \
            else hashing.hash_strings
        cap_h = _content_hash(np.where(cap_np == None, "", cap_np))  # noqa: E711
        if bytes_col is not None and bytes_col in batch.column_names:
            bts = batch.column(bytes_col).combine_chunks() \
                if isinstance(batch.column(bytes_col), pa.ChunkedArray) \
                else batch.column(bytes_col)
            byte_h = _content_hash(bts.to_numpy(zero_copy_only=False))
        else:
            byte_h = np.zeros(n, dtype=np.uint64)
        exact_key = hashing.combine3(cap_h, byte_h, np.full(n, _EXACT_SALT))

        if phash_col is not None:
            if phash_col not in batch.column_names:
                raise ValueError(
                    f"phash_col={phash_col!r} not in input columns "
                    f"{batch.column_names}; pass phash_col=None to disable "
                    "the pHash generator (a silent zero-fill would collapse "
                    "the whole corpus into one Hamming bucket)")
            phash = batch.column(phash_col)
            if isinstance(phash, pa.ChunkedArray):
                phash = phash.combine_chunks()
            # null phashes must not all share one garbage bucket key:
            # give each null row a unique sentinel derived from its
            # exact_key so it never collides (bands treat it as normal)
            if phash.null_count:
                ph_np = phash.to_numpy(zero_copy_only=False)
                isnull = pa.compute.is_null(phash).to_numpy(zero_copy_only=False)
                ph_np = np.where(isnull, exact_key.view(np.int64), ph_np)
                phash = pa.array(ph_np.astype(np.int64), type=pa.int64())
        else:
            # pHash generator disabled downstream; store a per-row unique
            # sentinel so accidental use cannot produce false buckets
            phash = pa.array(exact_key.view(np.int64), type=pa.int64())

        from kmcp_ray.bands import _CONTAIN_SALT, _segment_gather

        # ---- LSH band keys, finalized (empty-sketch rows band nowhere) --
        bk = text.band_keys(sig, cfg.bands)          # (n, bands) uint64
        bk_flat = bk.reshape(-1)
        bk_keep = bk_flat != hashing.MAX_U64
        bk_counts = bk_keep.reshape(n, cfg.bands).sum(axis=1)
        bk_off = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(bk_counts, out=bk_off[1:])

        # ---- salted containment bucket keys (kmcp exact k-mer query
        # analogue): only rows with >= min_containment_shingles kept
        # shingles emit, and only hashes under bucket_max_hash ----------
        off = ss["offsets"]
        seg_lens = off[1:] - off[:-1]
        n_sh = seg_lens.astype(np.int32)
        row_of_val = np.repeat(np.arange(n), seg_lens)
        eligible = n_sh >= cfg.min_containment_shingles
        ck_keep = eligible[row_of_val] \
            & (ss["hashes"] <= np.uint64(cfg.bucket_max_hash))
        with np.errstate(over="ignore"):  # uint64 wraparound is intended
            ck_vals = hashing.splitmix64(ss["hashes"][ck_keep] + _CONTAIN_SALT)
        ck_counts = np.bincount(row_of_val[ck_keep], minlength=n) \
            if ck_keep.any() else np.zeros(n, dtype=np.int64)
        ck_off = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(ck_counts, out=ck_off[1:])

        cols = {
            "image_id": batch.column(id_col),
            "n_tokens": pa.array(ss["n_tokens"], type=pa.int64()),
            "n_distinct": pa.array(ss["n_distinct"], type=pa.int64()),
            "n_sh": pa.array(n_sh, type=pa.int32()),
            "bkeys": _list_array(bk_flat[bk_keep], bk_off),
            "ckeys": _list_array(ck_vals, ck_off),
            "sk_fold": pa.array(sketch_fold(ss["hashes"], ss["offsets"]),
                                type=pa.uint64()),
            "phash": phash,
            "exact_key": pa.array(exact_key, type=pa.uint64()),
        }
        if with_vsk:
            # verification blob: bottom-verify_k sketch as LE-uint64
            # bytes — precomputed so the verify stage needs no extra pass
            cols["vsk"] = _vsk_array(ss, cfg)
        return pa.table(cols)

    return sketch_batch
