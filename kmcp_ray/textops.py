"""Text-analysis operators over document tables (training-data pipeline
staples): token counting, quality stats, language ID, SimHash and
winnowing fingerprints.

All operators are vectorized ``map_batches`` transforms over Arrow
batches; language ID is a stateful actor-pool stage (stopword tables
built once per actor) — the kmcp T2/T3 broadcast-state analogue.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from kmcp_ray import hashing, text
from kmcp_ray.hashing import U64

_TOKEN_RE = "[a-z0-9]+"


# ------------------------------------------------------------- token count

def token_count_batch(batch: pa.Table, *, id_col="doc_id", text_col="text") -> pa.Table:
    """(id, n_tokens): count of [a-z0-9]+ runs in the lower-cased text."""
    lowered = pc.utf8_lower(pc.fill_null(batch.column(text_col), ""))
    n = pc.count_substring_regex(lowered, pattern=_TOKEN_RE)
    return pa.table({id_col: batch.column(id_col),
                     "n_tokens": pc.cast(n, pa.int64())})


def token_count(ds, id_col="doc_id", text_col="text"):
    return ds.map_batches(
        lambda b: token_count_batch(b, id_col=id_col, text_col=text_col),
        batch_format="pyarrow", zero_copy_batch=True)


#: GPT-2-style BPE pretokenizer (public pattern), lookahead dropped so
#: it runs under RE2 — which both pyarrow.compute and DuckDB use, so
#: engine and oracle counts agree byte-for-byte (incl. unicode classes)
_BPE_RE = r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"
_WS_RE = r"\S+"


def token_stats_batch(batch: pa.Table, *, id_col="doc_id",
                      text_col="text") -> pa.Table:
    """(id, n_ws_tokens, n_bpe_tokens): whitespace-split token count
    and a BPE-ish pretokenizer count — the two standard corpus-sizing
    measures for a training-data pipeline; one vectorized RE2 pass
    each, no Python per row."""
    t = pc.fill_null(batch.column(text_col), "")
    return pa.table({
        id_col: batch.column(id_col),
        "n_ws_tokens": pc.cast(
            pc.count_substring_regex(t, pattern=_WS_RE), pa.int64()),
        "n_bpe_tokens": pc.cast(
            pc.count_substring_regex(t, pattern=_BPE_RE), pa.int64())})


def token_stats(ds, id_col="doc_id", text_col="text"):
    return ds.map_batches(
        lambda b: token_stats_batch(b, id_col=id_col, text_col=text_col),
        batch_format="pyarrow", zero_copy_batch=True)


# ------------------------------------------------------------ quality stats

def doc_stats_batch(batch: pa.Table, *, id_col="doc_id", text_col="text") -> pa.Table:
    """Integer quality features per document:
    n_chars_m(easured), n_tokens, n_uniq_tokens, sum_token_len."""
    texts = batch.column(text_col)
    flat_tokens, row_ids, n = text.tokenize(texts)
    n_tokens = np.bincount(row_ids, minlength=n).astype(np.int64) if len(row_ids) \
        else np.zeros(n, np.int64)
    tok_len = np.array([len(t) for t in flat_tokens], dtype=np.int64)
    sum_len = np.bincount(row_ids, weights=tok_len, minlength=n).astype(np.int64) \
        if len(row_ids) else np.zeros(n, np.int64)
    th = hashing.hash_tokens(flat_tokens)
    n_uniq = np.zeros(n, np.int64)
    if len(th):
        order = np.lexsort((th, row_ids))
        rr, hh = row_ids[order], th[order]
        first = np.ones(len(hh), dtype=bool)
        first[1:] = (rr[1:] != rr[:-1]) | (hh[1:] != hh[:-1])
        n_uniq = np.bincount(rr[first], minlength=n).astype(np.int64)
    n_chars = pc.cast(pc.utf8_length(pc.fill_null(texts, "")), pa.int64())
    return pa.table({id_col: batch.column(id_col),
                     "n_chars_m": n_chars,
                     "n_tokens": pa.array(n_tokens, pa.int64()),
                     "n_uniq_tokens": pa.array(n_uniq, pa.int64()),
                     "sum_token_len": pa.array(sum_len, pa.int64())})


def doc_stats(ds, id_col="doc_id", text_col="text"):
    return ds.map_batches(
        lambda b: doc_stats_batch(b, id_col=id_col, text_col=text_col),
        batch_format="pyarrow", zero_copy_batch=True)


def quality_score_batch(batch: pa.Table, *, id_col="doc_id", text_col="text") -> pa.Table:
    """Float quality score in [0,1]: token-diversity x length saturation
    x mean-token-length plausibility (heuristic; rows-only check)."""
    st = doc_stats_batch(batch, id_col=id_col, text_col=text_col)
    nt = st.column("n_tokens").to_numpy().astype(np.float64)
    nu = st.column("n_uniq_tokens").to_numpy().astype(np.float64)
    sl = st.column("sum_token_len").to_numpy().astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        diversity = np.where(nt > 0, nu / nt, 0.0)
        length_sat = 1.0 - np.exp(-nt / 32.0)
        mean_len = np.where(nt > 0, sl / nt, 0.0)
    len_plaus = np.clip(1.0 - np.abs(mean_len - 5.0) / 10.0, 0.0, 1.0)
    score = diversity * length_sat * (0.5 + 0.5 * len_plaus)
    return st.append_column("quality", pa.array(score, pa.float64())) \
        .append_column("quality_u", pa.array(
            np.floor(score * 1e6).astype(np.int64), pa.int64()))


def quality_score(ds, id_col="doc_id", text_col="text"):
    return ds.map_batches(
        lambda b: quality_score_batch(b, id_col=id_col, text_col=text_col),
        batch_format="pyarrow", zero_copy_batch=True)


# -------------------------------------------------------------- language ID

#: tiny per-language stopword lists (function words) — a deterministic
#: n-gram/stopword heuristic, NOT a trained model (none available here).
_LANG_MARKERS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "you", "that"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu", "ich"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "pas", "pour", "que"},
    "es": {"el", "la", "los", "las", "es", "un", "una", "por", "para", "que"},
    "zh": set(),   # no-latin-script marker handled by char heuristic below
}


class LangIdStage:
    """Actor-pool language classifier: sorted marker-hash tables built
    once per actor (__init__), per-batch fully-vectorized scoring
    (__call__) — token membership via searchsorted on 64-bit token
    hashes, non-ASCII detection via one RE2 pass."""

    def __init__(self, id_col="doc_id", text_col="text", append=False):
        self.id_col, self.text_col = id_col, text_col
        #: append=True: add lang_pred to the incoming batch instead of
        #: projecting (lets pipelines carry other columns through)
        self.append = append
        self.langs = sorted(k for k, v in _LANG_MARKERS.items() if v)
        self.marker_hashes = {
            lang: np.sort(hashing.hash_tokens(
                np.array(sorted(_LANG_MARKERS[lang]), dtype=object)))
            for lang in self.langs}

    def __call__(self, batch: pa.Table) -> pa.Table:
        flat_tokens, row_ids, n = text.tokenize(batch.column(self.text_col))
        th = hashing.hash_tokens(flat_tokens)
        mat = np.zeros((n, len(self.langs)))
        for li, lang in enumerate(self.langs):
            mk = self.marker_hashes[lang]
            pos = np.searchsorted(mk, th)
            pos_c = np.clip(pos, 0, len(mk) - 1)
            hit = ((pos < len(mk)) & (mk[pos_c] == th)).astype(np.float64) \
                if len(th) else np.empty(0)
            mat[:, li] = np.bincount(row_ids, weights=hit, minlength=n)
        head = pc.utf8_slice_codeunits(
            pc.fill_null(batch.column(self.text_col), ""), 0, 200)
        non_ascii = pc.match_substring_regex(head, "[^\\x00-\\x7f]") \
            .to_numpy(zero_copy_only=False).astype(bool)
        best = mat.argmax(axis=1)
        best_score = mat.max(axis=1)
        pred = np.array(self.langs, dtype=object)[best]
        pred[best_score == 0] = "und"
        pred[non_ascii] = "zh"
        lang_arr = pa.array(pred, pa.string())
        if self.append:
            return batch.append_column("lang_pred", lang_arr)
        return pa.table({self.id_col: batch.column(self.id_col),
                         "lang_pred": lang_arr})


def lang_id(ds, id_col="doc_id", text_col="text", concurrency=4):
    return ds.map_batches(LangIdStage, fn_constructor_kwargs={
        "id_col": id_col, "text_col": text_col},
        batch_format="pyarrow", concurrency=concurrency, batch_size=4096)


# ------------------------------------------------- text normalization

def normalize_text(col: "pa.Array | pa.ChunkedArray"):
    """Canonical text form for fuzzy-exact dedup: lower-case, strip
    every char outside ``[a-z0-9 ]``, collapse space runs, trim.

    Three vectorized RE2 kernels (pyarrow.compute embeds RE2, as does
    DuckDB's regexp_replace — engine and SQL oracle normalize
    byte-identically).  No Python per row."""
    x = pc.utf8_lower(pc.fill_null(col, ""))
    x = pc.replace_substring_regex(x, pattern=r"[^a-z0-9 ]", replacement="")
    x = pc.replace_substring_regex(x, pattern=r" +", replacement=" ")
    return pc.utf8_trim(x, characters=" ")


# ------------------------------------------- regex hooks (kmcp M8 / M9)

def filter_blacklist(ds, col: str = "text", pattern: str = r"plasmid"):
    """Drop rows whose ``col`` matches the blacklist regex (kmcp
    -B/--seq-name-filter, reference: kmcp/cmd/compute.go:248-260,
    586-598 semantics: case-insensitive containment)."""
    def fn(batch: pa.Table) -> pa.Table:
        hit = pc.match_substring_regex(
            pc.fill_null(batch.column(col), ""), pattern,
            ignore_case=True)
        return batch.filter(pc.invert(hit))
    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def extract_name(ds, col: str, pattern: str, out_col: str = "ref_name"):
    """Regex capture-group extraction into a new column (kmcp
    -N/--ref-name-regexp, reference: kmcp/cmd/compute.go:230-246,
    828-841: first capture group; non-matching rows keep the input)."""
    # RE2 named group: rewrap "(...)" as "(?P<g>...)" for extract_regex
    named = pattern.replace("(", "(?P<g>", 1)

    def fn(batch: pa.Table) -> pa.Table:
        col_v = pc.fill_null(batch.column(col), "")
        st = pc.extract_regex(col_v, named)
        g = pc.struct_field(st, "g")
        out = pc.if_else(pc.is_valid(g), g, col_v)
        return batch.append_column(out_col, out)
    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------- concat with spacers (kmcp M7)

def concat_sketch(ds, *, id_col: str, parts_col: str, k: int,
                  max_hash: int = None):
    """Concatenate each row's list<string> parts into one pseudo-document
    whose shingle sketch equals the UNION of the parts' sketches — no
    shingle spans a junction, exactly kmcp's concat-with-k-1-N-spacers
    semantics (reference: kmcp/cmd/compute.go:567-628: k-mers containing
    the spacer are skipped, so junctions contribute nothing).

    Output: (id, text = parts joined by one space, sketch list<uint64>).
    """
    from kmcp_ray.hashing import MAX_U64
    mh = int(max_hash if max_hash is not None else MAX_U64)

    def fn(batch: pa.Table) -> pa.Table:
        parts = batch.column(parts_col)
        if isinstance(parts, pa.ChunkedArray):
            parts = parts.combine_chunks()
        flat = parts.flatten()
        row_of_part = pc.list_parent_indices(parts).to_numpy(
            zero_copy_only=False)
        n = batch.num_rows
        ss = text.shingle_sets(flat, k, mh)
        h, off = ss["hashes"], ss["offsets"]
        rows = row_of_part[np.repeat(np.arange(len(off) - 1),
                                     np.diff(off))]
        # union per row: sort (row, hash), unique
        order = np.lexsort((h, rows))
        h, rows = h[order], rows[order]
        first = np.ones(len(h), dtype=bool)
        first[1:] = (rows[1:] != rows[:-1]) | (h[1:] != h[:-1])
        h, rows = h[first], rows[first]
        counts = np.bincount(rows, minlength=n) if len(rows) \
            else np.zeros(n, np.int64)
        offsets = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(counts, out=offsets[1:])
        joined = pc.binary_join(parts, " ")
        return pa.table({
            id_col: batch.column(id_col),
            "text": joined,
            "sketch": pa.ListArray.from_arrays(
                pa.array(offsets, pa.int32()),
                pa.array(h, pa.uint64()))})
    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------- shingle strings (SQL face)

def shingle_strings(texts, k: int, include_short: bool = True):
    """Per-row k-gram shingle STRINGS in positional order — the exact
    string form the DuckDB oracles build with
    ``list_transform(generate_series(...), i -> tk[i] || ' ' || ...)``:
    tokens are ``[a-z0-9]+`` runs of the lower-cased text, a shingle is
    k consecutive tokens joined by single spaces; rows with 1..k-1
    tokens yield ONE all-token shingle when ``include_short``.

    Returns (flat object array of shingles, row_ids int64, n_rows)."""
    flat, rows, n = text.tokenize(texts)
    m = len(flat)
    out_vals, out_rows = [], []
    if m >= k:
        nw = m - k + 1
        sh = flat[:nw].astype(object)
        for j in range(1, k):
            sh = sh + " "
            sh = sh + flat[j:j + nw]
        valid = rows[:nw] == rows[k - 1:]
        out_vals.append(sh[valid])
        out_rows.append(rows[:nw][valid])
    if include_short:
        n_tokens = np.bincount(rows, minlength=n).astype(np.int64) \
            if m else np.zeros(n, np.int64)
        short = np.nonzero((n_tokens > 0) & (n_tokens < k))[0]
        if len(short):
            # rows is nondecreasing (tokenize preserves row order)
            starts = np.searchsorted(rows, short, side="left")
            ends = np.searchsorted(rows, short, side="right")
            joined = np.array([" ".join(flat[s:e])
                               for s, e in zip(starts, ends)], dtype=object)
            out_vals.append(joined)
            out_rows.append(short.astype(np.int64))
    if not out_vals:
        return np.empty(0, object), np.empty(0, np.int64), n
    return (np.concatenate(out_vals), np.concatenate(out_rows), n)


# ------------------------------------------------------------------ simhash

def _simhash_vote(h: np.ndarray, off: np.ndarray) -> np.ndarray:
    """(per-row concatenated distinct shingle hashes, offsets) →
    int64 simhash per row (unweighted bit-majority vote)."""
    n = len(off) - 1
    out = np.zeros(n, dtype=np.uint64)
    if len(h) == 0:
        return out.view(np.int64)
    bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & U64(1)) \
        .astype(np.int64)
    # reduceat only over non-empty rows' starts: clamping empty trailing
    # starts would steal the last shingle from the preceding row's segment
    lens = (off[1:] - off[:-1])
    nonempty = lens > 0
    votes = np.full((n, 64), -1, dtype=np.int64)   # empty rows → simhash 0
    votes[nonempty] = np.add.reduceat(2 * bits - 1, off[:-1][nonempty], axis=0)
    sel = votes > 0
    weights = (U64(1) << np.arange(64, dtype=np.uint64))
    out = (sel.astype(np.uint64) * weights[None, :]).sum(axis=1, dtype=np.uint64)
    return out.view(np.int64)


def simhash_batch(texts, k: int, token_hash: str = "sip") -> np.ndarray:
    """64-bit SimHash over word-k-shingle hashes (unweighted bit vote).

    ``token_hash``: "sip" (default, vectorized SipHash+fold — the
    production hot path) or "md5" (md5 of the shingle STRING, the
    SQL-mirrorable oracle variant — see hashing.md5_lower64)."""
    if token_hash == "md5":
        vals, rows, n = shingle_strings(texts, k, include_short=True)
        h = hashing.md5_lower64(vals)
        if len(h):
            order = np.lexsort((h, rows))
            h, rows = h[order], rows[order]
            first = np.ones(len(h), dtype=bool)
            first[1:] = (rows[1:] != rows[:-1]) | (h[1:] != h[:-1])
            h, rows = h[first], rows[first]
        counts = np.bincount(rows, minlength=n).astype(np.int64) \
            if len(rows) else np.zeros(n, np.int64)
        off = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(counts, out=off[1:])
        return _simhash_vote(h, off)
    ss = text.shingle_sets(texts, k, int(hashing.MAX_U64))
    return _simhash_vote(ss["hashes"], ss["offsets"])


def doc_simhash(ds, id_col="doc_id", text_col="text", k: int = 3,
                token_hash: str = "sip"):
    def fn(batch: pa.Table) -> pa.Table:
        sh = simhash_batch(batch.column(text_col), k, token_hash=token_hash)
        return pa.table({id_col: batch.column(id_col),
                         "simhash": pa.array(sh, pa.int64())})
    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


# ------------------------------------------------- winnowing fingerprints

def winnow_batch(texts, k: int, w: int, token_hash: str = "sip"):
    """Winnowing (Schleimer et al. 2003): per row, the set of per-window
    minima over the sequence of shingle hashes (window size w).

    ``token_hash``: "sip" hashes each k-token window via the fold chain
    (production); "md5" hashes the shingle STRING (the SQL-mirrorable
    oracle variant).  Rows with fewer than k tokens yield no
    fingerprints in either variant.

    Returns (fp_values, fp_offsets) — sorted unique fingerprints per row.
    """
    from kmcp_ray.text import tokenize, _window_hashes
    if token_hash == "md5":
        wvals, wrow, n = shingle_strings(texts, k, include_short=False)
        wh = hashing.md5_lower64(wvals)
    else:
        flat_tokens, row_ids, n = tokenize(texts)
        th = hashing.hash_tokens(flat_tokens)
        wh, wrow = _window_hashes(th, row_ids, k)
    fp_vals, fp_offsets = [], np.zeros(n + 1, dtype=np.int64)
    # per-row loop over the (short) shingle sequence — winnowing is
    # order-dependent so it cannot reuse the global-sort trick
    counts = np.zeros(n, dtype=np.int64)
    order = np.argsort(wrow, kind="stable")
    wh_s, wrow_s = wh[order], wrow[order]
    starts = np.searchsorted(wrow_s, np.arange(n), side="left")
    ends = np.searchsorted(wrow_s, np.arange(n), side="right")
    for i in range(n):
        seq = wh_s[starts[i]:ends[i]]
        if len(seq) == 0:
            continue
        if len(seq) <= w:
            fps = np.array([seq.min()], dtype=np.uint64)
        else:
            view = np.lib.stride_tricks.sliding_window_view(seq, w)
            fps = np.unique(view.min(axis=1))
        fp_vals.append(fps)
        counts[i] = len(fps)
    np.cumsum(counts, out=fp_offsets[1:])
    vals = np.concatenate(fp_vals) if fp_vals else np.empty(0, np.uint64)
    return vals, fp_offsets


def doc_fingerprint(ds, id_col="doc_id", text_col="text", k: int = 3,
                    w: int = 4, token_hash: str = "sip"):
    """(id, n_fp, min_fp, fp_xor): winnowing fingerprint summary —
    deterministic, order-free ints (xor of the distinct fingerprints —
    SQL-aggregable, unlike the order-sensitive fold it replaces); full
    fingerprint sets stay distributed."""
    def fn(batch: pa.Table) -> pa.Table:
        vals, off = winnow_batch(batch.column(text_col), k, w,
                                 token_hash=token_hash)
        n = batch.num_rows
        n_fp = (off[1:] - off[:-1]).astype(np.int64)
        min_fp = np.zeros(n, dtype=np.uint64)
        fp_xor = np.zeros(n, dtype=np.uint64)
        nonempty = n_fp > 0
        if nonempty.any():
            min_fp[nonempty] = np.minimum.reduceat(vals, off[:-1][nonempty])
            fp_xor[nonempty] = np.bitwise_xor.reduceat(vals, off[:-1][nonempty])
        return pa.table({id_col: batch.column(id_col),
                         "n_fp": pa.array(n_fp, pa.int64()),
                         "min_fp": pa.array(min_fp.view(np.int64), pa.int64()),
                         "fp_xor": pa.array(fp_xor.view(np.int64), pa.int64())})
    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
