"""True-substring containment pass — the kmcp exact k-mer containment
query analogue, upgraded from set semantics to sequence semantics.

Shingle-set containment (via="contain" edges) admits reordered or
interleaved token overlap; this pass verifies that the smaller text's
token sequence occurs *contiguously* inside the larger one (KMP over
token hashes — equivalent to a suffix-automaton membership query, with
the automaton replaced by linear-time matching since each pair is
checked once).  Texts are attached to candidate pairs with the same
partitioned exchange used for sketches (buckets.attach_sketches) — no
broadcast of the corpus.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from kmcp_ray import hashing
from kmcp_ray.config import DedupConfig


def _kmp_contains(needle: np.ndarray, hay: np.ndarray) -> bool:
    """True iff uint64 sequence ``needle`` occurs contiguously in ``hay``."""
    n = len(needle)
    if n == 0 or n > len(hay):
        return False
    # failure function
    fail = np.zeros(n, dtype=np.int64)
    k = 0
    for i in range(1, n):
        while k and needle[i] != needle[k]:
            k = fail[k - 1]
        if needle[i] == needle[k]:
            k += 1
        fail[i] = k
    k = 0
    for x in hay:
        while k and x != needle[k]:
            k = fail[k - 1]
        if x == needle[k]:
            k += 1
            if k == n:
                return True
    return False


def _window_sum_hit(needle: np.ndarray, hay: np.ndarray) -> bool:
    """Vectorized rolling-hash prefilter (r2 verdict #7): a contiguous
    occurrence implies some length-n window of ``hay`` has the same
    wrapping u64 sum as ``needle``.  One cumsum + one compare in numpy
    rejects non-substring pairs without entering the per-token Python
    KMP loop; a (vanishingly rare) sum collision is caught by KMP."""
    n = len(needle)
    if n == 0 or n > len(hay):
        return False
    with np.errstate(over="ignore"):
        target = needle.sum(dtype=np.uint64)
        c = np.cumsum(hay, dtype=np.uint64)
        wins = c[n - 1:].copy()
        wins[1:] -= c[:-n]
    return bool(np.any(wins == target))


def token_hash_seq(text: str) -> np.ndarray:
    import re
    toks = re.findall(r"[a-z0-9]+", (text or "").lower())
    return hashing.hash_tokens(np.array(toks, dtype=object)) if toks \
        else np.empty(0, np.uint64)


def make_substr_verifier():
    """map_batches verifier for pairs with attached utf-8 texts
    (vsk_a / vsk_b binary): emits via="substr" when one token sequence
    is contiguous in the other, else via="contain"."""

    def verify(batch: pa.Table) -> pa.Table:
        from kmcp_ray.arrowutil import column
        a = column(batch, "id_a").to_numpy(zero_copy_only=False)
        b = column(batch, "id_b").to_numpy(zero_copy_only=False)
        ta = column(batch, "vsk_a").to_numpy(zero_copy_only=False)
        tb = column(batch, "vsk_b").to_numpy(zero_copy_only=False)
        vias = []
        for p in range(len(a)):
            sa = token_hash_seq(ta[p].decode("utf-8", "replace") if ta[p] is not None else "")
            sb = token_hash_seq(tb[p].decode("utf-8", "replace") if tb[p] is not None else "")
            small, big = (sa, sb) if len(sa) <= len(sb) else (sb, sa)
            vias.append("substr" if _window_sum_hit(small, big)
                        and _kmp_contains(small, big) else "contain")
        return pa.table({"id_a": pa.array(a, pa.string()),
                         "id_b": pa.array(b, pa.string()),
                         "via": pa.array(vias, pa.string()),
                         "score": pa.array(np.ones(len(a)), pa.float64())})

    return verify


def substr_containment_pairs(ds, cfg: DedupConfig = None,
                             id_col: str = "doc_id", text_col: str = "text"):
    """(id_a, id_b, via∈{substr, contain}, score) for all set-containment
    pairs, with true-substring pairs flagged via="substr"."""
    import pyarrow.compute as pc
    from kmcp_ray import docs_dedup
    from kmcp_ray.buckets import attach_sketches

    cfg = cfg or DedupConfig()
    pairs_all = docs_dedup.ngram_jaccard_pairs(ds, cfg, id_col=id_col,
                                               text_col=text_col)
    contain = pairs_all.map_batches(
        lambda t: t.filter(pc.equal(t["via"], "contain"))
                   .select(["id_a", "id_b"]),
        batch_format="pyarrow", zero_copy_batch=True)
    # no contain.count() empty-check: an empty candidate stream flows
    # through the attach exchange and verifier as empty tables — the
    # driver count barrier was a pure serial-term cost (r2 verdict #7)

    # texts as the attach payload, keyed like the dedup pairs (d-prefixed)
    def text_payload(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        sid = [docs_dedup._ID_FMT.format(int(i)) for i in ids]
        texts = batch.column(text_col).to_numpy(zero_copy_only=False)
        return pa.table({"image_id": pa.array(sid, pa.string()),
                         "vsk": pa.array([(t or "").encode() for t in texts],
                                         pa.binary())})

    def pair_to_str(batch: pa.Table) -> pa.Table:
        a = batch.column("id_a").to_numpy(zero_copy_only=False)
        b = batch.column("id_b").to_numpy(zero_copy_only=False)
        return pa.table({
            "id_a": pa.array([docs_dedup._ID_FMT.format(int(x)) for x in a],
                             pa.string()),
            "id_b": pa.array([docs_dedup._ID_FMT.format(int(x)) for x in b],
                             pa.string())})

    payload = ds.map_batches(text_payload, batch_format="pyarrow",
                             zero_copy_batch=True)
    spairs = contain.map_batches(pair_to_str, batch_format="pyarrow")
    attached = attach_sketches(spairs, payload, cfg)
    verified = attached.map_batches(make_substr_verifier(),
                                    batch_format="pyarrow")

    def back_to_int(batch: pa.Table) -> pa.Table:
        a = batch.column("id_a").to_numpy(zero_copy_only=False)
        b = batch.column("id_b").to_numpy(zero_copy_only=False)
        return pa.table({
            "id_a": pa.array([int(s[1:]) for s in a], pa.int64()),
            "id_b": pa.array([int(s[1:]) for s in b], pa.int64()),
            "via": batch.column("via"),
            "score": batch.column("score")})

    return verified.map_batches(back_to_int, batch_format="pyarrow")


# ------------------------------------------------- exact needle containment

def contains_exact(ds, needles, *, id_col="doc_id", text_col="text"):
    """Exact raw-character substring containment of a small needle set
    against the whole corpus (the kmcp exact-containment query run in
    reverse: instead of sketch-set containment, literal byte-sequence
    membership, reference kmcp/cmd/search.go qCov=1 semantics).

    ``needles`` is a list of ``(needle_id, needle_str)``; the set is
    assumed small (it rides into every task as a closure constant — the
    broadcast small side).  Each needle is matched against the corpus
    with one vectorized ``pc.match_substring`` kernel per batch; for
    needle counts beyond a few thousand an Aho-Corasick automaton in an
    actor pool would replace the per-needle loop.

    Returns (needle_id, hay_id) rows, self-matches excluded, sorted.
    """
    import pyarrow.compute as pc
    nd = sorted((int(i), s) for i, s in needles)

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        txt = batch.column(text_col)
        out_n, out_h = [], []
        for nid, ns in nd:
            if not ns:
                continue
            m = pc.match_substring(txt, pattern=ns).to_numpy(
                zero_copy_only=False)
            hit = ids[np.asarray(m, dtype=bool)]
            hit = hit[hit != nid]
            if len(hit):
                out_h.append(hit)
                out_n.append(np.full(len(hit), nid, np.int64))
        if not out_h:
            return pa.table({"needle_id": pa.array([], pa.int64()),
                             "hay_id": pa.array([], pa.int64())})
        return pa.table({"needle_id": np.concatenate(out_n),
                         "hay_id": np.concatenate(out_h)})

    return ds.map_batches(fn, batch_format="pyarrow",
                          zero_copy_batch=True).sort(["needle_id", "hay_id"])
