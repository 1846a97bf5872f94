"""Deterministic stand-in image codec + perceptual hash.

STUB NOTICE (multimodal plumbing): this container has no PIL / libjpeg /
libpng, so real PNG/JPEG coding is replaced by two deterministic fake
codecs with the right *shape* — a lossless one ("png" rows) and a lossy
quantizing one ("jpeg" rows, PSNR ≈ 47 dB > the 40 dB invariant).  The
Ray-side plumbing (binary column schema, actor-pool decode stage, batch
sizing for wide binary rows) is real and tested; swapping in
PIL.Image.open/save in :class:`DecodeStage` is the only production
change, marked with ``# PRODUCTION:`` below.

Formats (all little-endian):
  b"KRAW" | u16 w | u16 h | w*h*3 raw RGB bytes              (lossless)
  b"KJPG" | u16 w | u16 h | u8 q | w*h*3 bytes of round(px/q)  (lossy)

The perceptual hash is the standard 8x8-DCT sign hash: resize to 32x32
gray (already 32x32 here), 2-D DCT-II, take the top-left 8x8 block minus
DC, bit = coefficient > median.  Implemented as two matmuls with a
precomputed DCT basis — no scipy needed.
"""

from __future__ import annotations

import struct

import numpy as np

MAGIC_RAW = b"KRAW"
MAGIC_JPG = b"KJPG"
_JPG_Q = 4  # quantization step → max error 2/255 per channel


def encode(pixels: np.ndarray, fmt: str) -> bytes:
    """pixels: (h, w, 3) uint8 → encoded bytes."""
    h, w, _ = pixels.shape
    if fmt == "png":
        return MAGIC_RAW + struct.pack("<HH", w, h) + pixels.tobytes()
    if fmt == "jpeg":
        q = _JPG_Q
        quant = (pixels.astype(np.uint16) + q // 2) // q
        return (MAGIC_JPG + struct.pack("<HHB", w, h, q)
                + quant.astype(np.uint8).tobytes())
    raise ValueError(f"unknown fmt {fmt!r}")


def decode(data: bytes) -> np.ndarray:
    """encoded bytes → (h, w, 3) uint8 pixels.

    # PRODUCTION: replace body with PIL.Image.open(io.BytesIO(data)).
    """
    magic = data[:4]
    if magic == MAGIC_RAW:
        w, h = struct.unpack_from("<HH", data, 4)
        return np.frombuffer(data, np.uint8, w * h * 3, 8).reshape(h, w, 3).copy()
    if magic == MAGIC_JPG:
        w, h, q = struct.unpack_from("<HHB", data, 4)
        quant = np.frombuffer(data, np.uint8, w * h * 3, 9).reshape(h, w, 3)
        return np.minimum(quant.astype(np.uint16) * q, 255).astype(np.uint8)
    raise NotImplementedError(
        "real image formats need PIL/libjpeg — not available in this sandbox")


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(255.0 ** 2 / mse))


def _dct_matrix(n: int) -> np.ndarray:
    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    m = np.cos(np.pi * (2 * i + 1) * k / (2 * n)) * np.sqrt(2.0 / n)
    m[0, :] = np.sqrt(1.0 / n)
    return m


_DCT32 = _dct_matrix(32)


_RGB_W = np.array([0.299, 0.587, 0.114])
#: MSB-first weights matching the original shift-or loop: bit i of the
#: 63-bit block (DC dropped) lands at position 62-i
_PHASH_BIT_W = (np.uint64(1) << np.arange(62, -1, -1, dtype=np.uint64))


def _phash_stack(g32: np.ndarray) -> np.ndarray:
    """(n, 32, 32) float64 gray stack → (n,) int64 phashes — two batched
    matmuls + one weighted bit sum (no per-bit / per-row Python)."""
    coeffs = np.matmul(np.matmul(_DCT32[None, :, :], g32), _DCT32.T)
    block = coeffs[:, :8, :8].reshape(len(g32), 64)[:, 1:]   # drop DC
    med = np.median(block, axis=1, keepdims=True)
    bits = (block > med).astype(np.uint64)
    return (bits * _PHASH_BIT_W[None, :]).sum(axis=1,
                                              dtype=np.uint64).view(np.int64)


def phash64(pixels: np.ndarray) -> int:
    """64-bit perceptual hash of an RGB image (resized to 32x32 first)."""
    gray = pixels.astype(np.float64) @ _RGB_W
    return int(_phash_stack(_resize32(gray)[None, :, :])[0])


def phash64_batch(pixel_list) -> np.ndarray:
    """Vectorized phash over a sequence of (h, w, 3) uint8 arrays: the
    per-image gray/resize is cheap; the DCT + bit extraction run as one
    stacked pass (``_phash_stack``)."""
    n = len(pixel_list)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    g32 = np.empty((n, 32, 32), dtype=np.float64)
    for i, p in enumerate(pixel_list):
        g32[i] = _resize32(p.astype(np.float64) @ _RGB_W)
    return _phash_stack(g32)


def _resize32(gray: np.ndarray) -> np.ndarray:
    """Nearest-neighbour resize to 32x32 (deterministic, dependency-free)."""
    h, w = gray.shape
    if (h, w) == (32, 32):
        return gray
    yi = (np.arange(32) * h // 32).clip(0, h - 1)
    xi = (np.arange(32) * w // 32).clip(0, w - 1)
    return gray[np.ix_(yi, xi)]


def resize_pixels(px: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbour resize of (h, w[, c]) pixels to (out_h, out_w)
    — deterministic, dependency-free; PRODUCTION: PIL Image.resize."""
    h, w = px.shape[:2]
    if (h, w) == (out_h, out_w):
        return px
    yi = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xi = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return px[np.ix_(yi, xi)]


def pixel_checksum64(px: np.ndarray) -> int:
    """Order-sensitive 63-bit checksum of a uint8 pixel array: each
    byte weighted by a splitmix64 stream keyed on its position, summed
    mod 2^64, top bit dropped so the value rides int64/SQL BIGINT.

    The golden-output anchor for the image stages (kmcp's
    version-pinned profile goldens, demo-profiling/README.md
    "Compared to KMCP v0.8.2" analogue): the stub codec is
    deterministic, so per-image checksums precomputed into
    tests/golden/*.parquet let DuckDB hash-verify the decode / resize /
    frame-sample outputs value-exactly."""
    from kmcp_ray import hashing
    flat = px.reshape(-1).astype(np.uint64)
    w = hashing.splitmix64(np.arange(flat.size, dtype=np.uint64))
    total = (flat * w).sum(dtype=np.uint64)
    return int((total >> np.uint64(1)).astype(np.int64))


def hamming64(a, b) -> "np.ndarray | int":
    """Bitwise Hamming distance between int64/uint64 phash values."""
    from kmcp_ray.hashing import popcount64
    x = np.asarray(a).astype(np.int64).view(np.uint64) ^ \
        np.asarray(b).astype(np.int64).view(np.uint64)
    out = popcount64(x)
    return out if out.ndim else int(out)


def phash_chunk_keys(phash: np.ndarray, chunks: int) -> np.ndarray:
    """(n, chunks) uint64 bucket keys: 64/chunks-bit slices of the phash,
    mixed with the chunk index (pigeonhole banding for Hamming search).
    """
    from kmcp_ray import hashing
    ph = np.asarray(phash).astype(np.int64).view(np.uint64)
    width = 64 // chunks
    mask = np.uint64((1 << width) - 1)
    out = np.empty((len(ph), chunks), dtype=np.uint64)
    consts = hashing.splitmix64(
        np.arange(chunks, dtype=np.uint64) + np.uint64(0xA0761D6478BD642F))
    for c in range(chunks):
        part = (ph >> np.uint64(c * width)) & mask
        out[:, c] = hashing.splitmix64(part + consts[c])
    return out


def phash_first_agree_key(a: np.ndarray, b: np.ndarray,
                          chunks: int) -> np.ndarray:
    """For phash pairs (a, b) with Hamming <= chunks-1: the bucket key
    of the FIRST chunk where the two phashes agree — the pair's
    designated emission bucket (splitmix64 is a bijection, so chunk
    keys are equal iff the chunk slices are equal).  Pigeonhole
    guarantees at least one agreeing chunk for every pair inside the
    radius; pairs agreeing nowhere return chunk 0's key of ``a`` (they
    are outside the radius and dropped by the caller's gate anyway)."""
    ka = phash_chunk_keys(np.asarray(a), chunks)
    kb = phash_chunk_keys(np.asarray(b), chunks)
    agree = ka == kb
    first = agree.argmax(axis=1)
    return ka[np.arange(len(ka)), first]


class DecodeStage:
    """Actor-pool image decode/verify stage — the multimodal plumbing
    (schema, actor signature, batch sizing) is real; only the codec
    behind :func:`decode` is the sandbox stub.

    __init__ runs once per actor (codec/table setup); __call__ decodes
    each row's ``bytes``, recomputes the perceptual hash, and emits
    per-row integrity columns:

      phash_ok   stored phash == phash(decoded pixels)
      psnr_db    re-encode round-trip PSNR (inf for lossless)
      width/height from the decoded pixels

    Use:  ds.map_batches(DecodeStage, batch_format="pyarrow",
                         concurrency=N, batch_size=B, num_cpus=1)
    Small batches on purpose: rows carry wide binary payloads.
    """

    def __init__(self):
        # PRODUCTION: import PIL here (once per actor), build decoders
        self.decode = decode

    def __call__(self, batch):
        import numpy as np
        import pyarrow as pa
        bts = batch.column("bytes").to_numpy(zero_copy_only=False)
        phs = batch.column("phash").to_numpy(zero_copy_only=False)
        fmts = batch.column("fmt").to_numpy(zero_copy_only=False)
        n = len(bts)
        psnr_db = np.zeros(n, dtype=np.float64)
        ws = np.zeros(n, dtype=np.int32)
        hs = np.zeros(n, dtype=np.int32)
        sums = np.zeros(n, dtype=np.int64)
        pixels = []
        for i, data in enumerate(bts):          # stub-inherent decode loop
            px = self.decode(data)
            pixels.append(px)
            hs[i], ws[i] = px.shape[0], px.shape[1]
            sums[i] = pixel_checksum64(px)
            rt = self.decode(encode(px, fmts[i]))
            p = psnr(px, rt)
            psnr_db[i] = 99.0 if p == float("inf") else p
        # hash verification: one stacked DCT pass over the whole batch
        ok = phash64_batch(pixels) == phs.astype(np.int64)
        return pa.table({
            "image_id": batch.column("image_id"),
            "phash_ok": pa.array(ok),
            "psnr_db": pa.array(psnr_db, pa.float64()),
            "w_decoded": pa.array(ws, pa.int32()),
            "h_decoded": pa.array(hs, pa.int32()),
            "pix_sum": pa.array(sums, pa.int64()),
        })


def decode_verify(ds, concurrency: int = 4, batch_size: int = 256):
    """Distributed decode + integrity verification over an image table."""
    return ds.map_batches(DecodeStage, batch_format="pyarrow",
                          concurrency=concurrency, batch_size=batch_size,
                          num_cpus=1)


class FeatureStage:
    """Actor-pool image feature extraction: decode → resize to a fixed
    grid → per-channel stats + a low-frequency DCT embedding
    (list<float32>), the input shape for the ann.* similarity ops.

    The DCT basis is built ONCE per actor in __init__ (the model-load
    analogue); __call__ is per-batch work over wide binary rows, so
    keep ``batch_size`` small.  PRODUCTION: swap :func:`decode` for a
    real codec and the DCT for a model forward pass — the Ray plumbing
    (actor signature, schema, batch sizing) is unchanged.
    """

    def __init__(self, dct_k: int = 4):
        self.decode = decode
        self.d32 = _dct_matrix(32)
        self.dct_k = dct_k

    def __call__(self, batch):
        import numpy as np
        import pyarrow as pa
        bts = batch.column("bytes").to_numpy(zero_copy_only=False)
        k = self.dct_k
        n = len(bts)
        feats = np.zeros((n, k * k + 6), dtype=np.float32)
        for i, data in enumerate(bts):
            px = self.decode(data).astype(np.float64)
            gray = px.mean(axis=2) if px.ndim == 3 else px
            g32 = _resize32(gray)
            coeffs = self.d32 @ g32 @ self.d32.T
            feats[i, :k * k] = coeffs[:k, :k].reshape(-1)
            ch = px.reshape(-1, px.shape[-1]) if px.ndim == 3 \
                else px.reshape(-1, 1)
            feats[i, k * k:k * k + 3] = ch.mean(axis=0)[:3] \
                if ch.shape[1] >= 3 else ch.mean()
            feats[i, k * k + 3:k * k + 6] = ch.std(axis=0)[:3] \
                if ch.shape[1] >= 3 else ch.std()
        off = pa.array(np.arange(n + 1, dtype=np.int32) * feats.shape[1])
        emb = pa.ListArray.from_arrays(
            off, pa.array(feats.reshape(-1), pa.float32()))
        return pa.table({"image_id": batch.column("image_id"),
                         "embedding": emb})


def image_features(ds, concurrency: int = 4, batch_size: int = 256,
                   dct_k: int = 4):
    """Distributed decode → feature-extract: (image_id, embedding
    list<float32>) ready for ann.topk_cosine / lsh_cosine_pairs."""
    return ds.map_batches(FeatureStage,
                          fn_constructor_kwargs={"dct_k": dct_k},
                          batch_format="pyarrow", concurrency=concurrency,
                          batch_size=batch_size, num_cpus=1)


class ResizeStage:
    """Actor-pool image resize: decode → nearest-neighbour resample to
    a fixed (out_w, out_h) → re-encode lossless + recompute the phash —
    the thumbnail/normalize step of a training-data pipeline.  Output
    keeps the input-table shape (image_id, bytes, w, h, fmt, phash) so
    the resized corpus feeds straight back into dedup_pipeline /
    decode_verify / image_features.

    PRODUCTION: swap :func:`decode` / :func:`resize_pixels` /
    :func:`encode` for PIL — the actor plumbing is unchanged.
    """

    def __init__(self, out_w: int = 64, out_h: int = 64):
        self.decode = decode
        self.out_w, self.out_h = out_w, out_h

    def __call__(self, batch):
        import numpy as np
        import pyarrow as pa
        bts = batch.column("bytes").to_numpy(zero_copy_only=False)
        n = len(bts)
        out = []
        pixels = []
        sums = np.zeros(n, dtype=np.int64)
        for i, data in enumerate(bts):          # stub-inherent decode loop
            px = resize_pixels(self.decode(data), self.out_h, self.out_w)
            pixels.append(px)
            sums[i] = pixel_checksum64(px)
            out.append(encode(px, "png"))
        phs = phash64_batch(pixels)             # one stacked DCT pass
        return pa.table({
            "image_id": batch.column("image_id"),
            "bytes": pa.array(out, pa.binary()),
            "w": pa.array(np.full(n, self.out_w, np.int32)),
            "h": pa.array(np.full(n, self.out_h, np.int32)),
            "fmt": pa.array(["png"] * n, pa.string()),
            "phash": pa.array(phs, pa.int64()),
            "pix_sum": pa.array(sums, pa.int64()),
        })


def resize_images(ds, out_w: int = 64, out_h: int = 64,
                  concurrency: int = 4, batch_size: int = 256):
    """Distributed resize over an image table; output schema == input
    schema (minus caption), so stages compose."""
    return ds.map_batches(ResizeStage,
                          fn_constructor_kwargs={"out_w": out_w,
                                                 "out_h": out_h},
                          batch_format="pyarrow", concurrency=concurrency,
                          batch_size=batch_size, num_cpus=1)


# ---------------------------------------------------------------- video
#: b"KVID" | u16 w | u16 h | u16 n_frames | n*w*h*3 raw RGB bytes
MAGIC_VID = b"KVID"


def encode_video(frames: np.ndarray) -> bytes:
    """(n, h, w, 3) uint8 → deterministic stand-in video container.
    PRODUCTION: ffmpeg/pyav encode."""
    n, h, w, _ = frames.shape
    return MAGIC_VID + struct.pack("<HHH", w, h, n) + frames.tobytes()


def decode_video_frames(data: bytes, idx: np.ndarray) -> np.ndarray:
    """Decode ONLY the requested frame indices (idx sorted int array) —
    the seek-don't-scan shape a real container decoder has; the stub
    slices the raw buffer per frame.  PRODUCTION: pyav seek + decode."""
    if data[:4] != MAGIC_VID:
        raise NotImplementedError(
            "real video containers need ffmpeg/pyav — not in this sandbox")
    w, h, n = struct.unpack_from("<HHH", data, 4)
    fsz = w * h * 3
    out = np.empty((len(idx), h, w, 3), dtype=np.uint8)
    for j, i in enumerate(idx):
        off = 10 + int(i) * fsz
        out[j] = np.frombuffer(data, np.uint8, fsz, off).reshape(h, w, 3)
    return out


class FrameSampleStage:
    """Actor-pool video frame sampling: one input row
    (video_id, bytes) → ``ceil(n_frames / every)`` output rows, each a
    lossless-encoded frame with the image-table shape
    (image_id, bytes, w, h, fmt, phash, video_id, frame_idx) — ready to
    flow into resize / features / the dedup pipeline.

    Frame decode is selective (only sampled indices are materialized),
    so a 10k-frame clip sampled at every=250 decodes 40 frames.  Keep
    ``batch_size`` SMALL: each input row is a whole video payload.
    """

    def __init__(self, every: int = 10):
        if every < 1:
            raise ValueError("every must be >= 1")
        self.every = every
        self.decode_frames = decode_video_frames

    def __call__(self, batch):
        import numpy as np
        import pyarrow as pa
        vids = batch.column("video_id").to_numpy(zero_copy_only=False)
        bts = batch.column("bytes").to_numpy(zero_copy_only=False)
        ids, out_b, fidx, ws, hs = [], [], [], [], []
        pixels = []
        for vid, data in zip(vids, bts):
            if data[:4] != MAGIC_VID:
                raise NotImplementedError("not a KVID stand-in container")
            w, h, n = struct.unpack_from("<HHH", data, 4)
            take = np.arange(0, n, self.every)
            frames = self.decode_frames(data, take)
            for j, i in enumerate(take):
                ids.append(f"{vid}#f{int(i):06d}")
                out_b.append(encode(frames[j], "png"))
                fidx.append(int(i))
                ws.append(w)
                hs.append(h)
                pixels.append(frames[j])
        phs = phash64_batch(pixels)
        sums = np.array([pixel_checksum64(p) for p in pixels], np.int64)
        return pa.table({
            "image_id": pa.array(ids, pa.string()),
            "bytes": pa.array(out_b, pa.binary()),
            "w": pa.array(ws, pa.int32()),
            "h": pa.array(hs, pa.int32()),
            "fmt": pa.array(["png"] * len(ids), pa.string()),
            "phash": pa.array(phs, pa.int64()),
            "pix_sum": pa.array(sums, pa.int64()),
            "video_id": pa.array(
                [i.split("#f")[0] for i in ids], pa.string()),
            "frame_idx": pa.array(fidx, pa.int64()),
        })


def frame_sample(ds, every: int = 10, concurrency: int = 4,
                 batch_size: int = 8):
    """Distributed every-k-th frame sampling over a video table
    (video_id, bytes) → image-table rows.  batch_size defaults tiny:
    rows are whole-video binary payloads."""
    return ds.map_batches(FrameSampleStage,
                          fn_constructor_kwargs={"every": every},
                          batch_format="pyarrow", concurrency=concurrency,
                          batch_size=batch_size, num_cpus=1)


def image_feature_dedup(ds, threshold: float = 0.995, cfg=None, *,
                        concurrency: int = 4, batch_size: int = 256,
                        dct_k: int = 4):
    """(image_id, cluster_id) — PIXEL-space near-duplicate clustering:
    decode → DCT feature embedding (actor pool, :class:`FeatureStage`)
    → exact cosine pairs → spanning forest → min-id cluster labels.

    The image leg of the dedup tier: catches re-encoded / perturbed
    copies by pixel CONTENT, independent of the caption-shingle and
    phash legs of ``dedup_pipeline`` (kmcp analogue: searching the same
    query against a second database built with a different sketch, then
    intersecting — util-db-search.go:359-474; here the second "sketch"
    is the pixel embedding).  PRODUCTION: swap the DCT stage for a
    model forward pass; everything downstream is unchanged.

    Scale shape: features are (id, ~22 floats)/row; pair generation is
    the broadcast arm below ``ann.cosine_pairs``' row gate and LSH
    banding above it (string ids require pre-mapping to int ranks for
    the LSH arm — the broadcast arm used here is string-native); the
    forest is pair-sized; labels broadcast below the forest-size gate,
    partitioned join above (the dedup_pipeline emission switch).
    """
    import pyarrow as pa

    from kmcp_ray import ann, cc as cc_mod
    from kmcp_ray.config import DedupConfig
    from kmcp_ray.pipeline import assign_stage, assign_via_join

    cfg = cfg or DedupConfig()
    kk = int(dct_k)

    def strip_dc(t):
        # drop the DC coefficient and the channel means (indices 0 and
        # kk²..kk²+2): on flat/noisy images those dominate the norm and
        # drag every pairwise cosine to ~1 — the same reason phash
        # discards the DC term.  What remains (AC structure + stds) is
        # what "same picture" means.  All-zero AC vectors (constant
        # images) normalize to cosine 0 vs everything: constant images
        # are left to the exact/phash legs.
        from kmcp_ray.arrowutil import list_to_numpy
        vals, off = list_to_numpy(t.column("embedding"), dtype=np.float64)
        n = t.num_rows
        w = (off[1] - off[0]) if n else 0
        m = vals.reshape(n, w) if n else vals.reshape(0, 0)
        keep = np.r_[1:kk * kk, kk * kk + 3:w] if n else []
        sub = np.ascontiguousarray(m[:, keep]) if n else m
        offs = pa.array(np.arange(n + 1, dtype=np.int32)
                        * (sub.shape[1] if n else 0))
        emb = pa.ListArray.from_arrays(
            offs, pa.array(sub.reshape(-1), pa.float64()))
        return pa.table({"image_id": t.column("image_id"),
                         "embedding": emb})

    feats = image_features(ds, concurrency=concurrency,
                           batch_size=batch_size, dct_k=dct_k) \
        .map_batches(strip_dc, batch_format="pyarrow",
                     zero_copy_batch=True) \
        .materialize()      # id + ~22 floats/row: signature-sized, and
    # consumed twice (pair generation + the id stream below)
    pairs = ann.cosine_pairs(feats, threshold, id_col="image_id",
                             emb_col="embedding")
    forest = pairs.select_columns(["id_a", "id_b"]) \
        .map_batches(cc_mod.spanning_forest_batch, batch_format="pyarrow",
                     batch_size=1 << 20).materialize()
    ids_ds = feats.select_columns(["image_id"])
    if forest.count() <= cfg.broadcast_assign_edges:
        cmap = cc_mod.connected_components_arrays(forest, reduce_rounds=0)
        return assign_stage(ids_ds, cmap, id_col="image_id")
    labels = cc_mod.labels_via_exchange(forest, cfg.num_partitions)
    return assign_via_join(ids_ds, labels, cfg, id_col="image_id")
