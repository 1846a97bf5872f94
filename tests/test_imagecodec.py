import numpy as np
import pytest

from kmcp_ray import imagecodec
from kmcp_ray.config import DedupConfig


def _pix(seed=0, w=32, h=32):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (h, w, 3)).astype(np.uint8)


def test_raw_roundtrip_lossless():
    p = _pix(1)
    assert (imagecodec.decode(imagecodec.encode(p, "png")) == p).all()


def test_jpeg_roundtrip_psnr_above_40():
    p = _pix(2)
    q = imagecodec.decode(imagecodec.encode(p, "jpeg"))
    assert imagecodec.psnr(p, q) >= 40.0


def test_decode_unknown_format_raises():
    with pytest.raises(NotImplementedError):
        imagecodec.decode(b"\x89PNG\r\n\x1a\nxxxx")


def test_phash_stability_and_sensitivity():
    p = _pix(3)
    h1 = imagecodec.phash64(p)
    h2 = imagecodec.phash64(p.copy())
    assert h1 == h2
    other = _pix(4)
    assert imagecodec.hamming64(h1, imagecodec.phash64(other)) > 8


def test_phash_nonsquare_resize():
    p = _pix(5, w=48, h=32)
    assert isinstance(imagecodec.phash64(p), int)


def test_phash_chunk_keys_pigeonhole():
    cfg = DedupConfig()
    # two hashes at hamming <= 3 must share at least one chunk key
    a = np.int64(0x0123456789ABCDEF)
    b = np.int64(a ^ 0b1011)  # 3 bit flips in low chunk
    ka = imagecodec.phash_chunk_keys(np.array([a]), cfg.phash_chunks)[0]
    kb = imagecodec.phash_chunk_keys(np.array([b]), cfg.phash_chunks)[0]
    assert (ka == kb).sum() >= 1


def test_image_features_stage(ray_session):
    """Decode -> resize -> DCT feature embedding: near-dup pixels give
    near-identical embeddings; unrelated images do not."""
    import ray.data
    from kmcp_ray import imagecodec, testgen
    from kmcp_ray.config import DedupConfig
    cfg = DedupConfig(num_partitions=8)
    table, planted, _neg = testgen.make_pairs_corpus(n=120, seed=21, cfg=cfg)
    ds = ray.data.from_arrow(table)
    feats = imagecodec.image_features(ds, concurrency=2).to_pandas()
    assert len(feats) == len(table)
    emb = {r.image_id: np.asarray(r.embedding, dtype=np.float64)
           for r in feats.itertuples()}
    d = next(iter(emb.values())).shape[0]
    assert d == 22                                  # 4x4 DCT + 6 stats
    # phash-planted pairs (same pixels + small noise) are cosine-close
    ph_pairs = [(a, b) for a, b, c in planted if c == "phash"]
    assert ph_pairs
    for a, b in ph_pairs[:5]:
        va, vb = emb[a], emb[b]
        cos = va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb) + 1e-12)
        assert cos > 0.98, (a, b, cos)


def test_phash64_batch_equals_scalar_loop():
    """The stacked-DCT batch phash must reproduce the original
    per-bit shift-or definition exactly (r2 verdict #5)."""
    rng = np.random.default_rng(11)
    imgs = [rng.integers(0, 256, (32, 32, 3)).astype(np.uint8)
            for _ in range(7)]
    imgs.append(rng.integers(0, 256, (48, 48, 3)).astype(np.uint8))

    def reference(pixels):
        gray = pixels.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
        g = imagecodec._resize32(gray)
        coeffs = imagecodec._DCT32 @ g @ imagecodec._DCT32.T
        block = coeffs[:8, :8].flatten()[1:]
        med = np.median(block)
        h = 0
        for bit in (block > med):
            h = (h << 1) | int(bit)
        return h

    got = imagecodec.phash64_batch(imgs)
    want = np.array([reference(p) for p in imgs], dtype=np.int64)
    assert np.array_equal(got, want)
    assert imagecodec.phash64(imgs[0]) == int(want[0])


def test_resize_stage_composes_with_decode_verify(ray_session):
    """resize_images keeps the image-table shape: output feeds straight
    into decode_verify with all integrity checks green, dims forced to
    the target, and resizing an already-target-size image is identity."""
    import ray.data
    from kmcp_ray import testgen
    from kmcp_ray.config import DedupConfig
    from kmcp_ray.imagecodec import decode, decode_verify, resize_images
    table, _, _ = testgen.make_pairs_corpus(n=60, seed=13,
                                            cfg=DedupConfig())
    small = resize_images(ray.data.from_arrow(table), out_w=16, out_h=16,
                          concurrency=2)
    ver = decode_verify(small, concurrency=2).to_pandas()
    assert len(ver) == 60
    assert ver["phash_ok"].all()
    assert (ver["w_decoded"] == 16).all() and (ver["h_decoded"] == 16).all()
    # identity when the target equals the source size (corpus is 32x32)
    same = resize_images(ray.data.from_arrow(table), out_w=32, out_h=32,
                         concurrency=2).to_pandas().set_index("image_id")
    for rid in list(same.index)[:5]:
        src = table.filter(
            __import__("pyarrow").compute.equal(table["image_id"], rid))
        assert np.array_equal(decode(same.loc[rid, "bytes"]),
                              decode(src["bytes"][0].as_py()))


def test_frame_sample_every_kth_frame(ray_session):
    """frame_sample emits exactly ceil(n/every) rows per video, frame
    indices 0, every, 2*every, ..., and each emitted frame's pixels
    equal the source frame (selective decode is lossless)."""
    import math
    import pyarrow as pa
    import ray.data
    from kmcp_ray.imagecodec import (decode, decode_video_frames,
                                     encode_video, frame_sample)
    rng = np.random.default_rng(23)
    vids, blobs, frames_by_vid = [], [], {}
    for v in range(6):
        n = int(rng.integers(5, 40))
        fr = rng.integers(0, 256, (n, 24, 24, 3)).astype(np.uint8)
        vids.append(f"vid{v:03d}")
        blobs.append(encode_video(fr))
        frames_by_vid[f"vid{v:03d}"] = fr
    tbl = pa.table({"video_id": pa.array(vids, pa.string()),
                    "bytes": pa.array(blobs, pa.binary())})
    out = frame_sample(ray.data.from_arrow(tbl).repartition(3),
                       every=7, concurrency=2).to_pandas()
    for v, fr in frames_by_vid.items():
        rows = out[out["video_id"] == v].sort_values("frame_idx")
        assert len(rows) == math.ceil(len(fr) / 7)
        assert list(rows["frame_idx"]) == list(range(0, len(fr), 7))
        for _, r in rows.iterrows():
            assert np.array_equal(decode(r["bytes"]), fr[r["frame_idx"]])
    # selective decode really selects
    got = decode_video_frames(blobs[0], np.array([0, 3]))
    assert np.array_equal(got[1], frames_by_vid["vid000"][3])


def test_image_feature_dedup_planted_exact_pairs(ray_session):
    """Pixel-space dedup: planted exact-copy images (identical pixels)
    always cluster; independent noise-base images never do (DC/means
    stripped, so noise pairs have near-zero structural cosine)."""
    import ray.data
    from kmcp_ray.config import DedupConfig
    from kmcp_ray.imagecodec import image_feature_dedup
    from kmcp_ray import testgen
    cfg = DedupConfig(num_partitions=16)
    table, planted, _neg = testgen.make_pairs_corpus(n=300, seed=23,
                                                     cfg=cfg)
    out = image_feature_dedup(ray.data.from_arrow(table), threshold=0.99,
                              concurrency=2).to_pandas()
    lab = dict(zip(out.image_id, out.cluster_id))
    exact = [(a, b) for a, b, c in planted if c == "exact"]
    assert len(exact) >= 10
    assert all(lab[a] == lab[b] for a, b in exact)
    # independent base images (different noise pixels) stay apart:
    # among the first 40 base rows no pair is a planted copy, so none
    # may share a cluster
    import itertools
    base = table.column("image_id").to_pylist()[:40]
    planted_set = {frozenset((a, b)) for a, b, _ in planted}
    false_pairs = [(a, b) for a, b in itertools.combinations(base, 2)
                   if lab[a] == lab[b]
                   and frozenset((a, b)) not in planted_set]
    assert not false_pairs, f"{len(false_pairs)} noise pairs clustered"


def test_image_queries_match_golden(ray_session):
    """Every golden-pinned driver entry equals its frozen golden
    (tests/golden/*.parquet, tools/make_golden.py) — the version-pinned
    golden-output pattern (kmcp demo-profiling/mock.kmcp.gz.kmcp
    .profile.v0.8.2); any codec/stage drift fails here before it ever
    reaches the driver's DuckDB compare.  The golden list is imported
    from tools/make_golden.py so new pins are covered automatically."""
    import os
    import sys

    import pyarrow.parquet as pq
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod
    from tools.make_golden import GOLDEN_QUERIES

    qs = entrymod.queries()
    gd = os.path.join("/root/repo", "tests", "golden")
    for name in GOLDEN_QUERIES:
        got = qs[name]("/root/testdata/sf0.001").to_pandas() \
            .reset_index(drop=True)
        exp = pq.read_table(os.path.join(gd, f"{name}.parquet")) \
            .to_pandas()
        assert list(got.columns) == list(exp.columns), name
        assert got.equals(exp), f"{name} drifted from golden"


def test_pixel_checksum64_independent_reimplementation():
    """ADVICE r4: the golden parquets are generated by this engine, so
    their hash-match certifies determinism, not independent
    correctness.  This pins the checksum kernel the goldens hang off
    (pixel_checksum64) against a pure-PYTHON big-int reimplementation
    — no numpy uint64 arithmetic, no kmcp_ray.hashing — derived
    directly from the published splitmix64 constant set."""
    import numpy as np
    from kmcp_ray.imagecodec import pixel_checksum64

    M = (1 << 64) - 1

    def sm64(x):
        z = (x + 0x9E3779B97F4A7C15) & M
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & M
        z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & M
        return z ^ (z >> 31)

    rng = np.random.default_rng(5)
    for shape in [(4, 7, 3), (16, 16), (1,), (3, 5)]:
        px = rng.integers(0, 256, size=shape, dtype=np.uint8)
        total = sum(int(b) * sm64(i)
                    for i, b in enumerate(px.reshape(-1))) & M
        assert pixel_checksum64(px) == total >> 1
