"""Single-threaded pure-Python/NumPy oracle for the near-dup pipeline.

Independently re-implements the frozen semantic contract (tokenize →
shingle → scaled sketch → MinHash → band/shingle/phash/exact buckets →
salted verification → union-find → canonical min-id clusters) with plain
loops, sharing ONLY the low-level hash primitives and the config with
the engine (kmcp_ray.hashing / kmcp_ray.config) — those constants ARE
the contract, exactly as kmcp stores sketch params in the DB header and
both build and query sides must use them (SURVEY.md §1.3).

The engine's Ray pipeline must match this oracle's cluster assignments
EXACTLY (not just recall) on the synthetic corpus.
"""

from __future__ import annotations

import re

import numpy as np

from kmcp_ray import hashing
from kmcp_ray.bands import _CONTAIN_SALT, KIND_CONTAIN, KIND_EXACT, \
    KIND_MINHASH, KIND_PHASH
from kmcp_ray.config import DedupConfig
from kmcp_ray.hashing import U64, _MIX_A, _MIX_B, splitmix64
from kmcp_ray.sketch import _EXACT_SALT

_TOKEN_RE = re.compile(r"[a-z0-9]+")


def tokens_of(caption: str) -> list:
    return _TOKEN_RE.findall((caption or "").lower())


def sketch_of(caption: str, cfg: DedupConfig) -> np.ndarray:
    toks = tokens_of(caption)
    th = hashing.hash_tokens(np.array(toks, dtype=object)) if toks else \
        np.empty(0, np.uint64)
    k = cfg.shingle_k
    sh = []
    if 0 < len(th) < k:
        sh.append(int(hashing.fold(th)))
    else:
        for i in range(len(th) - k + 1):
            sh.append(int(hashing.fold(th[i:i + k])))
    arr = np.unique(np.array(sh, dtype=np.uint64)) if sh else np.empty(0, np.uint64)
    return arr[arr <= U64(cfg.max_hash)]


def minhash_of(sketch: np.ndarray, cfg: DedupConfig) -> np.ndarray:
    if len(sketch) == 0:
        return np.full(cfg.num_perm, hashing.MAX_U64, dtype=np.uint64)
    seeds = hashing.perm_seeds(cfg.num_perm)
    sig = np.empty(cfg.num_perm, dtype=np.uint64)
    for i, s in enumerate(seeds):
        sig[i] = splitmix64(sketch ^ s).min()
    return sig


def band_keys_of(sig: np.ndarray, cfg: DedupConfig) -> list:
    if sig[0] == hashing.MAX_U64:
        return []
    r = cfg.rows_per_band
    consts = hashing.band_consts(cfg.bands)
    keys = []
    with np.errstate(over="ignore"):
        for b in range(cfg.bands):
            h = U64(r) * _MIX_A + consts[b]
            for j in range(r):
                h = splitmix64(h + sig[b * r + j] * _MIX_B)
            keys.append(int(h))
    return keys


def phash_keys_of(phash: int, cfg: DedupConfig) -> list:
    ph = np.int64(phash).view(np.uint64)
    width = 64 // cfg.phash_chunks
    mask = U64((1 << width) - 1)
    consts = splitmix64(np.arange(cfg.phash_chunks, dtype=np.uint64)
                        + U64(0xA0761D6478BD642F))
    return [int(splitmix64(((ph >> U64(c * width)) & mask) + consts[c]))
            for c in range(cfg.phash_chunks)]


def exact_key_of(caption: str, data: bytes) -> int:
    cap_h = hashing.hash_strings(np.array([caption or ""], dtype=object))[0]
    byte_h = hashing.hash_strings(np.array([data], dtype=object))[0] \
        if data is not None else U64(0)
    return int(hashing.combine3(np.array([cap_h]), np.array([byte_h]),
                                np.array([_EXACT_SALT]))[0])


class _UF:
    def __init__(self):
        self.p = {}

    def find(self, x):
        p = self.p
        p.setdefault(x, x)
        while p[x] != x:
            p[x] = p[p[x]]
            x = p[x]
        return x

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra == rb:
            return
        if rb < ra:
            ra, rb = rb, ra
        self.p[rb] = ra


def oracle_cluster(table, cfg: DedupConfig = DedupConfig()):
    """pyarrow Table (image_id, bytes, caption, phash) → (assignments,
    edges): assignments is {image_id: cluster_id} covering every row;
    edges a set of (id_a, id_b, via)."""
    ids = table.column("image_id").to_pylist()
    caps = table.column("caption").to_pylist()
    phs = table.column("phash").to_pylist()
    bts = table.column("bytes").to_pylist() if "bytes" in table.column_names \
        else [None] * len(ids)

    n = len(ids)
    sketches = [sketch_of(c, cfg) for c in caps]
    folds = [int(hashing.fold(s)) for s in sketches]
    sigs = [minhash_of(s, cfg) for s in sketches]

    buckets = {}

    def add(kind, key, row):
        buckets.setdefault((kind, key), []).append(row)

    for i in range(n):
        for key in band_keys_of(sigs[i], cfg):
            add(KIND_MINHASH, key, i)
        if len(sketches[i]) >= cfg.min_containment_shingles:
            for hv in sketches[i]:
                if hv <= U64(cfg.bucket_max_hash):
                    add(KIND_CONTAIN, int(splitmix64(hv + _CONTAIN_SALT)), i)
        for key in phash_keys_of(phs[i], cfg):
            add(KIND_PHASH, key, i)
        add(KIND_EXACT, exact_key_of(caps[i], bts[i]), i)

    edges = set()

    def verify_sk(i, j):
        # bottom-verify_k truncated sketches (frozen verification contract)
        ta = sketches[i][:cfg.verify_k]
        tb = sketches[j][:cfg.verify_k]
        na, nb = len(ta), len(tb)
        if na == 0 or nb == 0:
            return
        c = int(np.intersect1d(ta, tb, assume_unique=True).size)
        a, b = sorted((ids[i], ids[j]))
        jacc = c / float(na + nb - c)
        if jacc >= cfg.jaccard_threshold:
            edges.add((a, b, "minhash"))
            return
        small = min(na, nb)
        if small >= cfg.min_containment_shingles and \
                c / float(small) >= cfg.containment_threshold:
            edges.add((a, b, "contain"))

    def verify_ph(i, j):
        d = int(np.int64(phs[i]).view(np.uint64) ^ np.int64(phs[j]).view(np.uint64)
                ).bit_count() if hasattr(int, "bit_count") else \
            bin(int(np.int64(phs[i]).view(np.uint64)) ^
                int(np.int64(phs[j]).view(np.uint64))).count("1")
        if d <= cfg.hamming_radius:
            a, b = sorted((ids[i], ids[j]))
            edges.add((a, b, "phash"))

    for (kind, _key), rows in buckets.items():
        if len(rows) < 2:
            continue
        rows = sorted(set(rows), key=lambda r: ids[r])
        if kind == KIND_EXACT:
            root = rows[0]
            for r in rows[1:]:
                edges.add((ids[root], ids[r], "exact"))
            continue
        if kind == KIND_CONTAIN and len(rows) > cfg.max_shingle_df:
            groups = {}
            for r in rows:
                groups.setdefault(folds[r], []).append(r)
            for g in groups.values():
                for r in g[1:]:
                    edges.add((ids[g[0]], ids[r], "minhash"))
            continue
        if len(rows) > cfg.max_bucket:
            ident = folds if kind in (KIND_MINHASH, KIND_CONTAIN) else \
                [int(np.int64(p).view(np.uint64)) for p in phs]
            groups = {}
            for r in rows:
                groups.setdefault(ident[r], []).append(r)
            reps = []
            via = "phash" if kind == KIND_PHASH else "minhash"
            for g in groups.values():
                root = g[0]
                reps.append(root)
                for r in g[1:]:
                    edges.add((ids[root], ids[r], via))
            # ident-ascending truncation — the engine's deterministic
            # contract (buckets.py oversized path works on u64 ident
            # classes; id strings are not present in those buckets)
            rows = sorted(reps, key=lambda r: ident[r])[:cfg.max_bucket]
        for x in range(len(rows)):
            for y in range(x + 1, len(rows)):
                if kind == KIND_PHASH:
                    verify_ph(rows[x], rows[y])
                else:
                    verify_sk(rows[x], rows[y])

    uf = _UF()
    for a, b, _via in edges:
        uf.union(a, b)
    assignments = {i: i for i in ids}
    for i in ids:
        if i in uf.p:
            assignments[i] = uf.find(i)
    return assignments, edges
