"""Deterministic synthetic image+caption corpus with planted duplicate
clusters (FIXTURES.md).

Mirrors the reference's test strategy — a small mock community with
known ground truth (kmcp demo-profiling/: 15 genomes + mock.gs.profile
golden) — as a seeded generator: every byte is a function of (n, seed),
no external data.  Planted categories:

  exact     identical caption + identical bytes
  minhash   caption with word substitutions, true shingle-Jaccard ≥ 0.75
  contain   contiguous caption sub-/super-sequence (≥16-token small side)
  phash     perturbed pixels with Hamming(phash) ≤ 3, unrelated caption
  hot       one near-constant caption template cluster (~1% of rows;
            the skew probe)
  negatives hard non-dups: shuffled-word captions (J < 0.55) and images
            at Hamming ∈ [8, 16] — must NOT cluster

The generator *verifies plantability at generation time* (true Jaccard /
containment / Hamming computed with the frozen engine semantics) and
retries deterministically, so recall targets are exact, not
probabilistic.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from kmcp_ray import imagecodec, text
from kmcp_ray.config import DedupConfig

_SYLL = ["ka", "lo", "mi", "ta", "re", "su", "ne", "vo", "pa", "zi",
         "du", "fe", "go", "hy", "ja", "qu", "xa", "we", "bo", "cho"]


def make_vocab(size: int = 500, seed: int = 42) -> list:
    rng = np.random.default_rng(seed * 7919 + 13)
    words, seen = [], set()
    while len(words) < size:
        k = rng.integers(2, 5)
        w = "".join(_SYLL[i] for i in rng.integers(0, len(_SYLL), k))
        if w not in seen:
            seen.add(w)
            words.append(w)
    return words


def _shingle_set(caption: str, cfg: DedupConfig) -> np.ndarray:
    ss = text.shingle_sets(pa.array([caption]), cfg.shingle_k, cfg.max_hash)
    return ss["hashes"]


def _true_jaccard(a: str, b: str, cfg: DedupConfig) -> float:
    sa, sb = _shingle_set(a, cfg), _shingle_set(b, cfg)
    if len(sa) == 0 or len(sb) == 0:
        return 0.0
    c = np.intersect1d(sa, sb, assume_unique=True).size
    return c / float(len(sa) + len(sb) - c)


def _base_pixels(rng: np.random.Generator, w: int = 32, h: int = 32) -> np.ndarray:
    """Random low-frequency image via inverse DCT of random 8x8 coeffs —
    gives near-uniform phashes across rows (unrelated rows land at
    Hamming ≈ 32)."""
    d = imagecodec._dct_matrix(32)
    coeffs = np.zeros((32, 32))
    coeffs[:8, :8] = rng.normal(0, 60, (8, 8))
    coeffs[0, 0] = 400 + rng.normal(0, 40)
    g = d.T @ coeffs @ d
    g = np.clip(g + 128, 0, 255)
    img = np.stack([g, np.roll(g, 1, 0), np.roll(g, 1, 1)], axis=-1)
    if (h, w) != (32, 32):
        yi = (np.arange(h) * 32 // h).clip(0, 31)
        xi = (np.arange(w) * 32 // w).clip(0, 31)
        img = img[np.ix_(yi, xi)]
    return img.astype(np.uint8)


def _perturb_to_hamming(pixels: np.ndarray, rng: np.random.Generator,
                        lo: int, hi: int, fmt: str):
    """Deterministically search a noise amplitude whose decoded-pixel
    phash lands at Hamming distance in [lo, hi] from the original's."""
    ref = imagecodec.phash64(imagecodec.decode(imagecodec.encode(pixels, fmt)))
    noise = rng.normal(0, 1, pixels.shape)
    for amp in ([0.5, 1, 2, 3, 4, 6, 8, 12, 16, 24, 32, 48, 64, 96]
                if hi <= 4 else [8, 16, 24, 32, 48, 64, 96, 128, 160, 200]):
        cand = np.clip(pixels.astype(np.float64) + amp * noise, 0, 255).astype(np.uint8)
        dec = imagecodec.decode(imagecodec.encode(cand, fmt))
        d = imagecodec.hamming64(ref, imagecodec.phash64(dec))
        if lo <= d <= hi:
            return cand, int(d)
    return None, -1


def make_pairs_corpus(n: int = 2000, seed: int = 42, dup_frac: float = 0.30,
                      cfg: DedupConfig = DedupConfig(), vocab=None,
                      captions=None):
    """Build the synthetic corpus.

    Returns ``(table, planted, negatives)``:
      table      pyarrow Table (image_id, bytes, w, h, fmt, caption, phash)
      planted    list of (id_a, id_b, category) true-dup pairs
      negatives  list of (id_a, id_b, category) must-NOT-cluster pairs
    """
    rng = np.random.default_rng(seed)
    vocab = vocab or make_vocab(500, seed)
    n_hot = max(3, n // 100)
    n_dup = int(n * dup_frac)
    n_base = n - n_dup - n_hot

    def rand_caption(lo=5, hi=40):
        m = int(rng.integers(lo, hi + 1))
        return " ".join(vocab[i] for i in rng.integers(0, len(vocab), m))

    rows = []          # dicts: caption, pixels, fmt, w, h
    for i in range(n_base):
        if captions is not None and i < len(captions):
            cap = captions[i]
        elif rng.random() < 0.01:
            cap = "" if rng.random() < 0.5 else "   "
        else:
            cap = rand_caption()
        w = 48 if rng.random() < 0.05 else 32
        fmt = "jpeg" if rng.random() < 0.2 else "png"
        rows.append({"caption": cap, "pixels": _base_pixels(rng, w=w), "fmt": fmt,
                     "w": w, "h": 32})

    planted, negatives = [], []

    # ---- planted duplicate rows referencing earlier seeds ----
    categories = ["exact", "minhash", "contain", "phash", "neg_caption", "neg_phash"]
    weights = np.array([0.22, 0.26, 0.2, 0.16, 0.08, 0.08])
    made = 0
    guard = 0
    while made < n_dup and guard < n_dup * 50:
        guard += 1
        cat = categories[int(rng.choice(len(categories), p=weights))]
        si = int(rng.integers(0, n_base))
        seed_row = rows[si]
        toks = seed_row["caption"].split()
        new = None
        if cat == "exact":
            new = dict(seed_row)
        elif cat == "minhash":
            if len(toks) < 8:
                continue
            n_edit = max(1, len(toks) // 15)
            for _ in range(6):
                t2 = list(toks)
                for pos in rng.integers(0, len(t2), n_edit):
                    t2[int(pos)] = vocab[int(rng.integers(0, len(vocab)))]
                cap2 = " ".join(t2)
                if _true_jaccard(seed_row["caption"], cap2, cfg) >= 0.75:
                    new = {"caption": cap2, "pixels": _base_pixels(rng),
                           "fmt": "png", "w": 32, "h": 32}
                    break
            if new is None:
                continue
        elif cat == "contain":
            if len(toks) < 18:
                continue
            if rng.random() < 0.5:
                m = int(rng.integers(16, len(toks)))
                s0 = int(rng.integers(0, len(toks) - m + 1))
                cap2 = " ".join(toks[s0:s0 + m])
            else:
                extra = [vocab[int(j)] for j in rng.integers(0, len(vocab), 6)]
                cap2 = " ".join(extra + toks) if rng.random() < 0.5 \
                    else " ".join(toks + extra)
            # plantability: small side must keep >=1 bucket shingle
            small = _shingle_set(cap2, cfg) if len(cap2.split()) <= len(toks) \
                else _shingle_set(seed_row["caption"], cfg)
            if (small <= np.uint64(cfg.bucket_max_hash)).sum() < 1:
                continue
            if cap2 == seed_row["caption"]:
                continue
            new = {"caption": cap2, "pixels": _base_pixels(rng),
                   "fmt": "png", "w": 32, "h": 32}
        elif cat == "phash":
            px, d = _perturb_to_hamming(seed_row["pixels"], rng, 1,
                                        cfg.hamming_radius, seed_row["fmt"])
            if px is None:
                continue
            new = {"caption": rand_caption(), "pixels": px,
                   "fmt": seed_row["fmt"], "w": seed_row["w"], "h": seed_row["h"]}
        elif cat == "neg_caption":
            if len(toks) < 10:
                continue
            perm = list(toks)
            ok = False
            for _ in range(6):
                rng.shuffle(perm)
                cap2 = " ".join(perm)
                if _true_jaccard(seed_row["caption"], cap2, cfg) < 0.5 and \
                        cap2 != seed_row["caption"]:
                    ok = True
                    break
            if not ok:
                continue
            rows.append({"caption": cap2, "pixels": _base_pixels(rng),
                         "fmt": "png", "w": 32, "h": 32})
            negatives.append((si, len(rows) - 1, "neg_caption"))
            made += 1
            continue
        else:  # neg_phash
            px, d = _perturb_to_hamming(seed_row["pixels"], rng, 8, 16,
                                        seed_row["fmt"])
            if px is None:
                continue
            rows.append({"caption": rand_caption(), "pixels": px,
                         "fmt": seed_row["fmt"], "w": seed_row["w"],
                         "h": seed_row["h"]})
            negatives.append((si, len(rows) - 1, "neg_phash"))
            made += 1
            continue
        rows.append(new)
        planted.append((si, len(rows) - 1, cat))
        made += 1

    # ---- hot cluster (skew probe): near-constant caption template ----
    template = [vocab[i] for i in rng.integers(0, len(vocab), 12)]
    hot_first = len(rows)
    for j in range(n_hot):
        t2 = list(template)
        t2[-1] = vocab[int(rng.integers(0, len(vocab)))]
        rows.append({"caption": " ".join(t2), "pixels": _base_pixels(rng),
                     "fmt": "png", "w": 32, "h": 32})
        if j > 0:
            planted.append((hot_first, hot_first + j, "hot"))

    # ---- materialize ----
    ids = [f"img{i:08d}" for i in range(len(rows))]
    bts, decoded, fmts, ws, hs, caps = [], [], [], [], [], []
    for r in rows:
        data = imagecodec.encode(r["pixels"], r["fmt"])
        bts.append(data)
        decoded.append(imagecodec.decode(data))
        fmts.append(r["fmt"]); ws.append(r["w"]); hs.append(r["h"])
        caps.append(r["caption"])
    phashes = imagecodec.phash64_batch(decoded)
    table = pa.table({
        "image_id": pa.array(ids, pa.string()),
        "bytes": pa.array(bts, pa.binary()),
        "w": pa.array(ws, pa.int32()),
        "h": pa.array(hs, pa.int32()),
        "fmt": pa.array(fmts, pa.string()),
        "caption": pa.array(caps, pa.string()),
        "phash": pa.array(phashes, pa.int64()),
    })
    planted_ids = [(ids[a], ids[b], c) for a, b, c in planted]
    negative_ids = [(ids[a], ids[b], c) for a, b, c in negatives]
    return table, planted_ids, negative_ids


def make_arith_corpus(n: int, captions, cfg: DedupConfig = DedupConfig()):
    """Deterministic ARITHMETIC-planted image+caption corpus — the
    SQL-oracle-verifiable face of the full image+caption pipeline.

    Planted structure is pure id arithmetic (no RNG in the pattern):
    row i with ``i % 4 == 1`` is a planted partner of row i-1, category
    cycling by ``(i // 4) % 4``:

      0 exact    identical caption AND identical pixels
      1 minhash  partner caption with the last token replaced
      2 contain  first half of the partner's tokens
      3 phash    unrelated caption; pixels perturbed to
                 Hamming <= cfg.hamming_radius (deterministic search
                 with exact-copy fallback, so the edge ALWAYS exists)

    Captions are token-normalized (``[a-z0-9]+`` of the lower-cased
    source text joined by single spaces), so a DuckDB oracle can
    reconstruct every caption — and therefore every text edge — from
    the documents table; the only non-SQL edges are the planted
    arithmetic ones (exact / phash), which the oracle enumerates by id
    pattern.  Base image pixels are seeded per row (unrelated rows land
    at Hamming ≈ 32, see _base_pixels), so no accidental phash edges.

    Returns ``(table, planted)`` with the make_pairs_corpus id scheme.
    """
    import re
    base_tok = [re.findall(r"[a-z0-9]+", (t or "").lower())
                for t in captions]
    caps: list = [None] * n
    pixels: list = [None] * n
    planted = []
    cats = ["exact", "minhash", "contain", "phash"]
    for i in range(n):
        rng = np.random.default_rng(1_000_003 * i + 17)
        if i % 4 != 1:
            caps[i] = " ".join(base_tok[i % len(base_tok)])
            pixels[i] = _base_pixels(rng)
            continue
        cat = cats[(i // 4) % 4]
        p = caps[i - 1].split()
        if cat == "exact":
            caps[i] = caps[i - 1]
            pixels[i] = pixels[i - 1]
        elif cat == "minhash":
            caps[i] = " ".join(p[:-1] + [f"qdup{i}"]) if len(p) >= 2 \
                else caps[i - 1]
            pixels[i] = _base_pixels(rng)
        elif cat == "contain":
            caps[i] = " ".join(p[:max(1, len(p) // 2)]) if p \
                else caps[i - 1]
            pixels[i] = _base_pixels(rng)
        else:  # phash
            caps[i] = f"ph zz {i}"
            px, _d = _perturb_to_hamming(pixels[i - 1], rng, 1,
                                         cfg.hamming_radius, "png")
            pixels[i] = px if px is not None else pixels[i - 1].copy()
        planted.append((i - 1, i, cat))

    ids = [f"img{i:08d}" for i in range(n)]
    bts = [imagecodec.encode(px, "png") for px in pixels]
    phashes = imagecodec.phash64_batch([imagecodec.decode(b) for b in bts])
    table = pa.table({
        "image_id": pa.array(ids, pa.string()),
        "bytes": pa.array(bts, pa.binary()),
        "w": pa.array([p.shape[1] for p in pixels], pa.int32()),
        "h": pa.array([p.shape[0] for p in pixels], pa.int32()),
        "fmt": pa.array(["png"] * n, pa.string()),
        "caption": pa.array(caps, pa.string()),
        "phash": pa.array(phashes, pa.int64()),
    })
    return table, [(ids[a], ids[b], c) for a, b, c in planted]


# --------------------------------------------------------- parallel builder

def make_corpus_parquet(out_dir: str, n: int, seed: int = 42,
                        shard_size: int = 4000,
                        cfg: "DedupConfig | None" = None) -> str:
    """Build an n-row corpus as partitioned Parquet using Ray tasks
    (one shard per task; ids globally unique; planted/negative pair
    tables written alongside).  Idempotent: returns immediately if the
    corpus is already complete (``_DONE`` marker) — the resumable-output
    pattern (one directory per shard + manifest).
    """
    import json
    import os

    import pyarrow.parquet as pq
    import ray

    cfg = cfg or DedupConfig()
    done = os.path.join(out_dir, "_DONE")
    meta = {"n": n, "seed": seed, "shard_size": shard_size}
    if os.path.exists(done):
        with open(done) as f:
            if json.load(f) == meta:
                return out_dir
    pairs_dir = os.path.join(out_dir, "pairs")
    os.makedirs(pairs_dir, exist_ok=True)

    n_shards = (n + shard_size - 1) // shard_size

    @ray.remote
    def gen_shard(si: int) -> tuple:
        rows = min(shard_size, n - si * shard_size)
        table, planted, negatives = make_pairs_corpus(
            rows, seed=seed + si * 1_000_003, cfg=cfg)
        offset = si * shard_size

        def remap(i: str) -> str:
            return f"img{offset + int(i[3:]):010d}"

        ids = [remap(s) for s in table.column("image_id").to_pylist()]
        table = table.set_column(0, "image_id", pa.array(ids, pa.string()))
        pq.write_table(table, os.path.join(pairs_dir, f"part-{si:05d}.parquet"))
        return ([(remap(a), remap(b), c) for a, b, c in planted],
                [(remap(a), remap(b), c) for a, b, c in negatives])

    results = ray.get([gen_shard.remote(si) for si in range(n_shards)])
    planted = [p for r in results for p in r[0]]
    negatives = [p for r in results for p in r[1]]
    for name, pairs in (("planted", planted), ("negatives", negatives)):
        pq.write_table(pa.table({
            "id_a": pa.array([a for a, _b, _c in pairs], pa.string()),
            "id_b": pa.array([b for _a, b, _c in pairs], pa.string()),
            "category": pa.array([c for _a, _b, c in pairs], pa.string()),
        }), os.path.join(out_dir, f"{name}.parquet"))
    with open(done, "w") as f:
        json.dump(meta, f)
    return out_dir


def make_profile_matches(n_targets: int = 12, n_queries: int = 3000,
                         seed: int = 7) -> "pa.Table":
    """Deterministic synthetic search-match table for the profile
    funnel: planted target abundances, ambiguous query pairs and one
    'mismatch shadow' target per strong target that stage 3's deletion
    rule should remove (reference profile.go:1357-1387 scenario).

    Columns: (query, target, qcov, q_kept, t_kept) — the search()
    output subset profile_funnel consumes.
    """
    rng = np.random.default_rng(seed)
    # true abundances: geometric over the real targets; each "shadow"
    # target rides its strong partner with ~3% of its weight, >90% of
    # its reads also hitting the strong one and almost no unique support
    # — exactly the profile stage-3 deletion scenario.
    names = [f"t{i:03d}" for i in range(n_targets)]
    gsize = rng.integers(200, 2000, size=n_targets).astype(np.int64)
    shadow_of = {}                      # shadow idx -> strong idx
    for i in range(1, n_targets, 4):
        shadow_of[i] = i - 1            # t1 shadows t0, t5 shadows t4...
    weight = 0.5 ** np.arange(n_targets)
    for s, m in shadow_of.items():
        weight[s] = 0.03 * weight[m]
    weight /= weight.sum()

    q_col, t_col, qc_col, ql_col, tk_col = [], [], [], [], []
    for qi in range(n_queries):
        qname = f"q{qi:06d}"
        main = int(rng.choice(n_targets, p=weight))
        qlen = int(rng.integers(20, 120))
        hits = [(main, float(np.clip(rng.normal(0.9, 0.06), 0.55, 1.0)))]
        if main in shadow_of.values():
            # strong target: 60% of its reads also hit its shadow with
            # lower qcov (the ambiguous co-occurring pair)
            sh = [s for s, m in shadow_of.items() if m == main][0]
            if rng.random() < 0.6:
                hits.append((sh, float(np.clip(rng.normal(0.75, 0.05),
                                               0.55, 1.0))))
        elif main in shadow_of:
            if rng.random() < 0.9:
                # shadow-main queries nearly always also hit the strong one
                hits.append((shadow_of[main],
                             float(np.clip(rng.normal(0.92, 0.04),
                                           0.55, 1.0))))
        elif rng.random() < 0.08:
            other = int(rng.choice(n_targets, p=weight))
            if other != main:
                hits.append((other, float(np.clip(rng.normal(0.7, 0.08),
                                                  0.55, 1.0))))
        for t_idx, qcov in hits:
            q_col.append(qname)
            t_col.append(names[t_idx])
            qc_col.append(qcov)
            ql_col.append(qlen)
            tk_col.append(int(gsize[t_idx]))
    return pa.table({"query": pa.array(q_col, pa.string()),
                     "target": pa.array(t_col, pa.string()),
                     "qcov": pa.array(qc_col, pa.float64()),
                     "q_kept": pa.array(ql_col, pa.int64()),
                     "t_kept": pa.array(tk_col, pa.int64())})


def make_longdoc_corpus(n: int = 60, seed: int = 19, n_tokens=(300, 600),
                        slice_frac: float = 0.3):
    """Long documents with planted PARTIAL overlaps: for each planted
    pair, doc B embeds a contiguous ~slice_frac token slice of doc A
    inside otherwise-unrelated text — whole-document sketch Jaccard
    stays far below any dedup threshold, so only chunked containment
    search can find these (kmcp chunk-slider scenario, M5/M6).

    Returns (table(doc_id int64, text), planted [(id_a, id_b)]).
    """
    rng = np.random.default_rng(seed)
    vocab = np.array(make_vocab(4000, seed=seed + 1), dtype=object)

    def fresh_tokens(k):
        return vocab[rng.integers(0, len(vocab), size=k)]

    texts, planted = [], []
    i = 0
    while i < n:
        la = int(rng.integers(*n_tokens))
        a_toks = fresh_tokens(la)
        texts.append(" ".join(a_toks))
        ida = i
        i += 1
        if i < n and rng.random() < 0.5:
            # plant a partial-overlap partner
            sl = max(40, int(la * slice_frac))
            s0 = int(rng.integers(0, la - sl))
            lb = int(rng.integers(*n_tokens))
            b_toks = np.concatenate([fresh_tokens(lb // 2),
                                     a_toks[s0:s0 + sl],
                                     fresh_tokens(lb - lb // 2)])
            texts.append(" ".join(b_toks))
            planted.append((ida, i))
            i += 1
    tbl = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts, pa.string())})
    return tbl, planted
