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
        pixels = []
        for i, data in enumerate(bts):          # stub-inherent decode loop
            px = self.decode(data)
            pixels.append(px)
            hs[i], ws[i] = px.shape[0], px.shape[1]
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
