"""Vectorized caption/document shingling → scaled shingle-hash sets.

This is the kmcp ``compute`` core re-expressed for text: sliding k-word
windows (k-mers → word k-shingles), 64-bit hash per window (ntHash →
fold of SipHash token hashes), FracMinHash scale filter
(code <= 2^64/scale, reference: kmcp/cmd/compute.go:311-316, 768-771)
and per-row sort+unique (reference: kmcp/cmd/compute.go:813-824).

Everything operates on a whole Arrow batch at once — tokenization with
``pyarrow.compute`` (RE2), hashing with numpy/pandas C kernels; there is
no per-row Python loop on the hot path (short rows with fewer tokens
than the shingle width are the one, rare, per-row fallback).

Semantics contract (shared with tests/oracle.py):
- tokens  = maximal runs of ``[a-z0-9]`` in the lower-cased text
- shingle = ``hashing.fold`` of the k consecutive token hashes;
  texts with 1..k-1 tokens produce ONE shingle folding all their tokens;
  empty texts produce none
- sketch  = sorted distinct shingle hashes <= max_hash
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from kmcp_ray import hashing
from kmcp_ray.hashing import U64, _MIX_A, _MIX_B, splitmix64

_TOKEN_SPLIT = "[^a-z0-9]+"


def tokenize(texts: "pa.Array | pa.ChunkedArray"):
    """Lower-case + split a string array into tokens.

    Returns ``(flat_tokens, row_ids, n_rows)`` where ``flat_tokens`` is an
    object ndarray of all non-empty tokens and ``row_ids`` maps each token
    to its source row.
    """
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    n = len(texts)
    lowered = pc.utf8_lower(pc.fill_null(texts, ""))
    lists = pc.split_pattern_regex(lowered, pattern=_TOKEN_SPLIT)
    flat = pc.list_flatten(lists)
    parents = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
    keep = pc.greater(pc.utf8_length(flat), 0).to_numpy(zero_copy_only=False)
    toks = flat.to_numpy(zero_copy_only=False)
    return toks[keep], parents[keep].astype(np.int64), n


def _window_hashes(token_hashes: np.ndarray, row_ids: np.ndarray, k: int):
    """fold() of every within-row window of width k, vectorized.

    Returns (hashes, window_row_ids).
    """
    m = len(token_hashes)
    if m < k:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    nw = m - k + 1
    with np.errstate(over="ignore"):          # uint64 wraparound is intended
        h = np.full(nw, U64(k) * _MIX_A, dtype=np.uint64)
        for j in range(k):
            h = splitmix64(h + token_hashes[j:j + nw] * _MIX_B)
    valid = row_ids[:nw] == row_ids[k - 1:]
    return h[valid], row_ids[:nw][valid]


def shingle_sets(texts, k: int, max_hash: int):
    """texts → per-row sorted-unique scaled shingle-hash sets.

    Returns a dict of numpy arrays:
      ``hashes``   flat uint64, all rows concatenated, sorted unique per row
      ``offsets``  int64 (n_rows+1,) row boundaries into ``hashes``
      ``n_tokens`` int64 per row
      ``n_distinct`` int64 per row: distinct shingles BEFORE the scale
      filter (kmcp's exact distinct-kmer count, compute.go:813-824)
    """
    flat_tokens, row_ids, n = tokenize(texts)
    th = hashing.hash_tokens(flat_tokens)
    n_tokens = np.bincount(row_ids, minlength=n).astype(np.int64) if len(row_ids) \
        else np.zeros(n, dtype=np.int64)

    wh, wrow = _window_hashes(th, row_ids, k)

    # rows with 1..k-1 tokens: one shingle folding all tokens (rare path)
    short_rows = np.nonzero((n_tokens > 0) & (n_tokens < k))[0]
    if len(short_rows):
        order = np.argsort(row_ids, kind="stable")
        starts = np.searchsorted(row_ids[order], short_rows, side="left")
        ends = np.searchsorted(row_ids[order], short_rows, side="right")
        sh = np.array([hashing.fold(th[order[s:e]]) for s, e in zip(starts, ends)],
                      dtype=np.uint64)
        wh = np.concatenate([wh, sh])
        wrow = np.concatenate([wrow, short_rows.astype(np.int64)])

    n_distinct = np.zeros(n, dtype=np.int64)
    if len(wh):
        # global (row, hash) sort → per-row unique, fully vectorized
        order = np.lexsort((wh, wrow))
        wh, wrow = wh[order], wrow[order]
        first = np.ones(len(wh), dtype=bool)
        first[1:] = (wrow[1:] != wrow[:-1]) | (wh[1:] != wh[:-1])
        wh, wrow = wh[first], wrow[first]
        n_distinct = np.bincount(wrow, minlength=n).astype(np.int64)
        if max_hash < int(hashing.MAX_U64):
            keep = wh <= U64(max_hash)
            wh, wrow = wh[keep], wrow[keep]

    counts = np.bincount(wrow, minlength=n).astype(np.int64) if len(wrow) \
        else np.zeros(n, dtype=np.int64)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    return {"hashes": wh, "offsets": offsets,
            "n_tokens": n_tokens, "n_distinct": n_distinct}


def multi_k_shingle_sets(texts, ks, max_hash: int):
    """Multi-k accumulation (kmcp compute.go:746-803): one sketch per
    row holding the union of every k's shingle hashes.  Per-k folds are
    k-tagged (fold seeds with k), so hashes never collide across ks.
    Same return shape as :func:`shingle_sets`; ``n_distinct`` counts
    the union before the scale filter."""
    all_h, all_rows = [], []
    n = 0
    n_tokens = None
    for k in ks:
        ss = shingle_sets(texts, int(k), int(hashing.MAX_U64))
        n = len(ss["offsets"]) - 1
        n_tokens = ss["n_tokens"]
        rows = np.repeat(np.arange(n), np.diff(ss["offsets"]))
        all_h.append(ss["hashes"])
        all_rows.append(rows)
    wh = np.concatenate(all_h) if all_h else np.empty(0, np.uint64)
    wrow = np.concatenate(all_rows) if all_rows else np.empty(0, np.int64)
    n_distinct = np.zeros(n, dtype=np.int64)
    if len(wh):
        order = np.lexsort((wh, wrow))
        wh, wrow = wh[order], wrow[order]
        first = np.ones(len(wh), dtype=bool)
        first[1:] = (wrow[1:] != wrow[:-1]) | (wh[1:] != wh[:-1])
        wh, wrow = wh[first], wrow[first]
        n_distinct = np.bincount(wrow, minlength=n).astype(np.int64)
        if max_hash < int(hashing.MAX_U64):
            keep = wh <= U64(max_hash)
            wh, wrow = wh[keep], wrow[keep]
    counts = np.bincount(wrow, minlength=n).astype(np.int64) if len(wrow) \
        else np.zeros(n, dtype=np.int64)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    return {"hashes": wh, "offsets": offsets,
            "n_tokens": n_tokens if n_tokens is not None
            else np.zeros(n, np.int64), "n_distinct": n_distinct}


def shingle_sets_md5(texts, k: int, max_hash: int):
    """SQL-mirrorable twin of :func:`shingle_sets`: the shingle hash is
    ``hashing.md5_lower64`` of the SPACE-JOINED shingle string (DuckDB:
    ``('0x' || substr(md5(s), 1, 16))::UBIGINT``) instead of the
    splitmix64 fold of SipHash token hashes.  Same contract otherwise:
    per-row distinct HASH sets, rows with 1..k-1 tokens yield one
    all-token shingle, the scale filter keeps hash <= max_hash, and
    ``n_distinct`` counts before the filter.  Used by driver-oracled
    entries only (DedupConfig.hash_mode="md5"); production stays on the
    vectorized SipHash fold — md5 is a per-distinct-string Python-loop
    hash, wrong for the 10^12-row hot path."""
    flat_tokens, row_ids, n = tokenize(texts)
    n_tokens = np.bincount(row_ids, minlength=n).astype(np.int64) \
        if len(row_ids) else np.zeros(n, dtype=np.int64)

    m = len(flat_tokens)
    wstr = np.empty(0, dtype=object)
    wrow = np.empty(0, dtype=np.int64)
    if m >= k:
        nw = m - k + 1
        valid = row_ids[:nw] == row_ids[k - 1:]
        idx = np.nonzero(valid)[0]
        if len(idx):
            s = flat_tokens[idx].astype(object)
            for j in range(1, k):
                s = s + " "
                s = s + flat_tokens[idx + j]
            wstr, wrow = s, row_ids[idx]
    short_rows = np.nonzero((n_tokens > 0) & (n_tokens < k))[0]
    if len(short_rows):
        order = np.argsort(row_ids, kind="stable")
        starts = np.searchsorted(row_ids[order], short_rows, side="left")
        ends = np.searchsorted(row_ids[order], short_rows, side="right")
        extr = np.array([" ".join(flat_tokens[order[s0:e0]])
                         for s0, e0 in zip(starts, ends)], dtype=object)
        wstr = np.concatenate([wstr, extr])
        wrow = np.concatenate([wrow, short_rows.astype(np.int64)])

    wh = hashing.md5_lower64(wstr)
    n_distinct = np.zeros(n, dtype=np.int64)
    if len(wh):
        order = np.lexsort((wh, wrow))
        wh, wrow = wh[order], wrow[order]
        first = np.ones(len(wh), dtype=bool)
        first[1:] = (wrow[1:] != wrow[:-1]) | (wh[1:] != wh[:-1])
        wh, wrow = wh[first], wrow[first]
        n_distinct = np.bincount(wrow, minlength=n).astype(np.int64)
        if max_hash < int(hashing.MAX_U64):
            keep = wh <= U64(max_hash)
            wh, wrow = wh[keep], wrow[keep]
    counts = np.bincount(wrow, minlength=n).astype(np.int64) if len(wrow) \
        else np.zeros(n, dtype=np.int64)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    return {"hashes": wh, "offsets": offsets,
            "n_tokens": n_tokens, "n_distinct": n_distinct}


def minhash_signatures(hashes: np.ndarray, offsets: np.ndarray,
                       num_perm: int, perm_chunk: int = 8) -> np.ndarray:
    """(n_rows, num_perm) uint64 MinHash signature matrix.

    perm_i(x) = splitmix64(x ^ seed_i); rows with empty sketches get
    all-MAX_U64 signatures (never banded — degenerate-row filter).
    Permutations are processed in chunks to bound the (chunk, n_hashes)
    temporary.
    """
    n = len(offsets) - 1
    sig = np.full((n, num_perm), hashing.MAX_U64, dtype=np.uint64)
    if len(hashes) == 0:
        return sig
    seeds = hashing.perm_seeds(num_perm)
    nonempty = offsets[1:] > offsets[:-1]
    starts = offsets[:-1][nonempty]
    for c0 in range(0, num_perm, perm_chunk):
        chunk = seeds[c0:c0 + perm_chunk]
        # (chunk, m): permuted hash values
        pm = splitmix64(hashes[None, :] ^ chunk[:, None])
        mins = np.minimum.reduceat(pm, starts, axis=1)
        sig[np.nonzero(nonempty)[0], c0:c0 + len(chunk)] = mins.T
    return sig


def band_keys(sig: np.ndarray, bands: int) -> np.ndarray:
    """(n_rows, bands) uint64 LSH band keys.

    Band b's key folds the band's signature rows with a per-band constant
    (kmcp M12/M13 analogue: deriving bucket addresses from one 64-bit
    value, reference kmcp/cmd/util-hash.go:61-142).  Rows whose band
    signature is all-MAX (empty sketch) get key MAX_U64 — callers drop it.
    """
    n, num_perm = sig.shape
    r = num_perm // bands
    consts = hashing.band_consts(bands)
    out = np.empty((n, bands), dtype=np.uint64)
    with np.errstate(over="ignore"):          # uint64 wraparound is intended
        for b in range(bands):
            h = np.full(n, U64(r) * _MIX_A, dtype=np.uint64) + consts[b]
            for j in range(r):
                h = splitmix64(h + sig[:, b * r + j] * _MIX_B)
            out[:, b] = h
    # degenerate: empty-sketch rows
    empty = sig[:, 0] == hashing.MAX_U64
    if empty.any():
        out[empty, :] = hashing.MAX_U64
    return out


def shingle_sets_sketcher(texts, cfg):
    """Dispatch on cfg.sketcher — same return shape as shingle_sets.

    "scaled"    FracMinHash keep-filter (kmcp -D, compute.go:311-316)
    "minimizer" window minima of the in-order shingle-hash sequence
                (kmcp -W, compute.go:776-788 semantics re-derived)
    "syncmer"   closed syncmers: keep a shingle iff the minimum token
                hash within it is at the first or last position
                (kmcp -S, compute.go:763-775 semantics re-derived)
    """
    if getattr(cfg, "hash_mode", "siphash") == "md5":
        if cfg.sketcher != "scaled" or cfg.shingle_ks:
            raise ValueError(
                "hash_mode='md5' (the SQL-oracle twin) supports only the "
                "single-k 'scaled' sketcher")
        return shingle_sets_md5(texts, cfg.shingle_k, cfg.max_hash)
    if cfg.sketcher == "scaled":
        if cfg.shingle_ks:
            return multi_k_shingle_sets(texts, cfg.shingle_ks, cfg.max_hash)
        return shingle_sets(texts, cfg.shingle_k, cfg.max_hash)

    flat_tokens, row_ids, n = tokenize(texts)
    from kmcp_ray import hashing as _h
    th = _h.hash_tokens(flat_tokens)
    wh, wrow = _window_hashes(th, row_ids, cfg.shingle_k)
    n_tokens = np.bincount(row_ids, minlength=n).astype(np.int64) if len(row_ids) \
        else np.zeros(n, dtype=np.int64)

    # rows with 1..k-1 tokens contribute one fold-shingle in every
    # sketcher family (the kmcp short-sequence rule)
    short_rows = np.nonzero((n_tokens > 0) & (n_tokens < cfg.shingle_k))[0]
    if len(short_rows) and cfg.sketcher == "minimizer":
        extr = np.array([_h.fold(th[row_ids == r]) for r in short_rows],
                        dtype=np.uint64)
        wh = np.concatenate([wh, extr])
        wrow = np.concatenate([wrow, short_rows.astype(np.int64)])

    if cfg.sketcher == "minimizer":
        keep_vals, keep_rows = [], []
        order = np.argsort(wrow, kind="stable")
        wh_s, wrow_s = wh[order], wrow[order]
        starts = np.searchsorted(wrow_s, np.arange(n), side="left")
        ends = np.searchsorted(wrow_s, np.arange(n), side="right")
        w = cfg.minimizer_w
        for i in range(n):
            seq = wh_s[starts[i]:ends[i]]
            if len(seq) == 0:
                continue
            if len(seq) <= w:
                vals = np.array([seq.min()], dtype=np.uint64)
            else:
                view = np.lib.stride_tricks.sliding_window_view(seq, w)
                vals = np.unique(view.min(axis=1))
            keep_vals.append(vals)
            keep_rows.append(np.full(len(vals), i, dtype=np.int64))
        wh = np.concatenate(keep_vals) if keep_vals else np.empty(0, np.uint64)
        wrow = np.concatenate(keep_rows) if keep_rows else np.empty(0, np.int64)
    elif cfg.sketcher == "syncmer":
        k = cfg.shingle_k
        m = len(th)
        if m >= k:
            nw = m - k + 1
            win = np.lib.stride_tricks.sliding_window_view(th, k)
            amin = win.argmin(axis=1)
            keep_w = (amin == 0) | (amin == k - 1)   # closed syncmer rule
            valid = row_ids[:nw] == row_ids[k - 1:]
            # wh/wrow from _window_hashes are the valid windows, in order
            wh, wrow = wh[keep_w[valid]], wrow[keep_w[valid]]
        else:
            wh, wrow = np.empty(0, np.uint64), np.empty(0, np.int64)
        # short rows (< k tokens) keep their single fold-shingle
        short_rows = np.nonzero((n_tokens > 0) & (n_tokens < k))[0]
        if len(short_rows):
            extr = np.array([_h.fold(th[row_ids == r]) for r in short_rows],
                            dtype=np.uint64)
            wh = np.concatenate([wh, extr])
            wrow = np.concatenate([wrow, short_rows.astype(np.int64)])
    else:
        raise ValueError(f"unknown sketcher {cfg.sketcher!r}")

    # sort + unique per row + n_distinct bookkeeping (shared tail)
    n_distinct = np.zeros(n, dtype=np.int64)
    if len(wh):
        order = np.lexsort((wh, wrow))
        wh, wrow = wh[order], wrow[order]
        first = np.ones(len(wh), dtype=bool)
        first[1:] = (wrow[1:] != wrow[:-1]) | (wh[1:] != wh[:-1])
        wh, wrow = wh[first], wrow[first]
        n_distinct = np.bincount(wrow, minlength=n).astype(np.int64)
        if cfg.max_hash < int(hashing.MAX_U64):
            keep = wh <= U64(cfg.max_hash)
            wh, wrow = wh[keep], wrow[keep]
    counts = np.bincount(wrow, minlength=n).astype(np.int64) if len(wrow) \
        else np.zeros(n, dtype=np.int64)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    return {"hashes": wh, "offsets": offsets,
            "n_tokens": n_tokens, "n_distinct": n_distinct}
