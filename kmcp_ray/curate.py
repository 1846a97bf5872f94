"""Corpus-curation operators for training-data pipelines.

The kmcp reference curates its inputs with regex blacklists and
duplicate checks before indexing (reference: kmcp/cmd/compute.go:248-260,
index.go:524-537); a 100 TB training-data pipeline needs the same
pre-index hygiene stages generalized: deterministic sampling,
benchmark decontamination, vocabulary statistics, PII redaction, and
intra-document repetition scoring.
Every operator here is a vectorized ``map_batches`` stage (RE2 /
numpy / SipHash kernels); the only shuffles are a vocabulary-sized
``groupby`` and a per-group quota selection, and the decontamination
blocklist is broadcast once (``ray.put``), never joined.

All text semantics (lower-cased ``[a-z0-9]+`` tokens, k-token
space-joined shingles) are the frozen contract shared with the DuckDB
oracles (textops.shingle_strings / text.tokenize).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

from kmcp_ray import hashing, text, textops

# ------------------------------------------------------------- hash sample

#: 32-bit multiplicative mixing constants (Knuth 2654435761 + the
#: lowbias32-style second multiplier) — SQL-mirrorable: every step stays
#: under 2^63 so DuckDB BIGINT arithmetic reproduces it bit-exactly.
SAMPLE_MULT_1 = 2654435761
SAMPLE_MULT_2 = 0x45D9F3B
_M32 = np.uint64(0xFFFFFFFF)


def sample_hash32(ids: np.ndarray) -> np.ndarray:
    """Deterministic 32-bit mix of integer ids (vectorized).

    ``h = mix(id)``; keep-decisions derive from ``h % 100``.  The same
    arithmetic is expressible in ANSI SQL over BIGINT (no wraparound
    ever exceeds 2^63), which is what makes sampled outputs
    driver-oracle-checkable — unlike a seeded RNG."""
    x = np.asarray(ids).astype(np.uint64)
    with np.errstate(over="ignore"):
        h = (x * np.uint64(SAMPLE_MULT_1)) & _M32
        h = h ^ (h >> np.uint64(16))
        h = (h * np.uint64(SAMPLE_MULT_2)) & _M32
        h = h ^ (h >> np.uint64(16))
    return h


def sample_hash_sql(id_expr: str) -> str:
    """The DuckDB expression computing :func:`sample_hash32`."""
    return (
        "xor((xor(({id} * {m1}) % 4294967296, "
        "(({id} * {m1}) % 4294967296) // 65536) * {m2}) % 4294967296, "
        "((xor(({id} * {m1}) % 4294967296, "
        "(({id} * {m1}) % 4294967296) // 65536) * {m2}) % 4294967296) "
        "// 65536)"
    ).format(id=id_expr, m1=SAMPLE_MULT_1, m2=SAMPLE_MULT_2)


def hash_sample(ds, pct: int = 10, id_col: str = "doc_id"):
    """Keep rows whose id-hash lands in the first ``pct`` of 100 buckets.

    Deterministic, stateless, embarrassingly parallel — the sampling
    primitive the reference lacks (SURVEY §2.6 O7) expressed as a pure
    filter: reproducible across runs and cluster sizes, no shuffle, no
    driver state, and the keep-set of a 10% sample is a superset of the
    5% sample (nested samples for ablations)."""
    pct_u = np.uint64(pct)

    def fn(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        keep = (sample_hash32(ids) % np.uint64(100)) < pct_u
        return t.filter(pa.array(keep))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def stratified_sample(ds, pct: int = 10, group_col: str = "lang",
                      id_col: str = "doc_id"):
    """Exact per-group quota sample: for each group keep the
    ``ceil(n_group * pct / 100)`` rows with the smallest
    ``(hash, id)`` — deterministic and total-ordered, so the quota is
    met exactly (plain :func:`hash_sample` only meets it in
    expectation).

    One ``groupby(group_col)`` shuffle; the quota is computed inside
    each group (no driver pass).  Scale note: a group is one language /
    domain — if a single group exceeds worker memory, switch to the
    two-pass histogram selection (per-(group, h>>24) counts → threshold
    per group), same semantics."""
    pct_i = int(pct)

    def select(group: pa.Table) -> pa.Table:
        n = group.num_rows
        if n == 0:
            return group
        ids = group.column(id_col).to_numpy(zero_copy_only=False)
        h = sample_hash32(ids)
        quota = -(-n * pct_i // 100)            # ceil
        order = np.lexsort((ids, h))[:quota]
        return group.take(pa.array(np.sort(order)))

    return ds.groupby(group_col).map_groups(select, batch_format="pyarrow")


# --------------------------------------------------------- decontamination

def eval_shingle_blocklist(eval_ds, k: int = 3, text_col: str = "text"):
    """Distinct shingle-hash blocklist of an eval/benchmark set.

    Per-batch distinct SipHash shingle hashes stream back to the driver
    and collapse with one ``np.unique`` — the blocklist is
    eval-set-sized (small by definition), the corpus side never
    shuffles.  Returns a sorted uint64 ndarray."""
    def partial(t: pa.Table) -> pa.Table:
        sh, _rows, _n = textops.shingle_strings(t.column(text_col), k)
        u = np.unique(hashing.hash_tokens(sh))
        return pa.table({"h": pa.array(u, pa.uint64())})

    chunks = [np.empty(0, np.uint64)]
    hashed = eval_ds.map_batches(partial, batch_format="pyarrow",
                                 zero_copy_batch=True)
    for b in hashed.iter_batches(batch_size=1 << 18, batch_format="pyarrow"):
        chunks.append(b.column("h").to_numpy(zero_copy_only=False))
    return np.unique(np.concatenate(chunks))


def decontaminate(ds, eval_ds, k: int = 3, text_col: str = "text"):
    """Drop corpus rows sharing ANY k-token shingle with the eval set.

    The standard benchmark-decontamination step for training corpora,
    shaped as a broadcast anti-semi-join: the eval shingle set is
    ``ray.put`` once and probed per batch with one ``searchsorted`` —
    the corpus is filtered in place, nothing corpus-sized moves.  The
    kmcp analogue is the seq-name blacklist filter applied before
    sketching (reference: kmcp/cmd/compute.go:248-260), lifted from
    name-level to content-level."""
    block = eval_shingle_blocklist(eval_ds, k=k, text_col=text_col)
    block_ref = ray.put(block)

    def fn(t: pa.Table) -> pa.Table:
        keys = ray.get(block_ref)
        sh, rows, n = textops.shingle_strings(t.column(text_col), k)
        hit_rows = np.zeros(n, dtype=bool)
        if len(sh) and len(keys):
            h = hashing.hash_tokens(sh)
            pos = np.searchsorted(keys, h)
            pos_c = np.minimum(pos, len(keys) - 1)
            hit = (pos < len(keys)) & (keys[pos_c] == h)
            hit_rows[rows[hit]] = True
        return t.filter(pa.array(~hit_rows))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


# ------------------------------------------------------------- vocabulary

def vocab_topk(ds, topk: int = 50, text_col: str = "text"):
    """Global top-k token vocabulary by occurrence count.

    Map-side combine (per-batch ``np.unique`` counts) → one
    vocabulary-sized ``groupby("token").sum`` → global sort + limit:
    the shuffle moves one row per distinct token per block, never one
    per occurrence.  Total order = (cnt desc, token asc) so ties are
    deterministic."""
    def partial(t: pa.Table) -> pa.Table:
        toks, _rows, _n = text.tokenize(t.column(text_col))
        if len(toks) == 0:
            return pa.table({"token": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64())})
        u, c = np.unique(toks, return_counts=True)
        return pa.table({"token": pa.array(u, pa.string()),
                         "cnt": pa.array(c.astype(np.int64), pa.int64())})

    from ray.data.aggregate import Sum
    agg = ds.map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True) \
        .groupby("token").aggregate(Sum(on="cnt", alias_name="cnt"))
    return agg.sort(["cnt", "token"], descending=[True, False]).limit(topk)


# -------------------------------------------------------------- PII scrub

#: RE2 patterns (pyarrow and DuckDB both embed RE2 — byte-identical
#: match semantics on both sides of the oracle)
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
LONGNUM_RE = r"[0-9]{6,}"


def pii_scrub(ds, id_col: str = "doc_id", text_col: str = "text"):
    """Redact email addresses and long digit runs; count redactions.

    Two RE2 passes per batch (count + global replace), fully inside
    Arrow kernels — the model-training privacy-hygiene stage, same
    execution shape as the reference's regex blacklist filter
    (kmcp/cmd/compute.go:586-598).  Emits
    ``(id, clean_text, n_redacted)``."""
    def fn(t: pa.Table) -> pa.Table:
        s = pc.fill_null(t.column(text_col), "")
        ne = pc.count_substring_regex(s, pattern=EMAIL_RE)
        s1 = pc.replace_substring_regex(s, pattern=EMAIL_RE,
                                        replacement="<EMAIL>")
        nn = pc.count_substring_regex(s1, pattern=LONGNUM_RE)
        s2 = pc.replace_substring_regex(s1, pattern=LONGNUM_RE,
                                        replacement="<NUM>")
        n_red = pc.add(pc.cast(ne, pa.int64()), pc.cast(nn, pa.int64()))
        return pa.table({id_col: t.column(id_col),
                         "clean_text": s2,
                         "n_redacted": n_red})

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


# ----------------------------------------------------- repetition scoring

def repetition_score(ds, id_col: str = "doc_id", text_col: str = "text",
                     k: int = 3):
    """Intra-document repetition: the fraction of k-token shingles that
    are duplicates of an earlier shingle in the SAME document — the
    Gopher/C4-style repetitious-text quality signal.

    Stateless and fully vectorized: one shingle pass per batch, distinct
    counting via a (row, hash) lexsort — no shuffle at all.  Emits
    ``(id, n_shingles, n_distinct, rep_milli)`` with ``rep_milli =
    floor(1000 * (n_shingles - n_distinct) / n_shingles)`` (0 for
    shingle-less docs) so the ratio hashes stably as an integer."""
    def fn(t: pa.Table) -> pa.Table:
        n = t.num_rows
        sh, rows, _ = textops.shingle_strings(t.column(text_col), k)
        tot = np.bincount(rows, minlength=n).astype(np.int64)
        if len(sh):
            h = hashing.hash_tokens(sh)
            order = np.lexsort((h, rows))
            hs, rs = h[order], rows[order]
            first = np.ones(len(hs), dtype=bool)
            first[1:] = (hs[1:] != hs[:-1]) | (rs[1:] != rs[:-1])
            dist = np.bincount(rs[first], minlength=n).astype(np.int64)
        else:
            dist = np.zeros(n, np.int64)
        with np.errstate(invalid="ignore", divide="ignore"):
            rep = np.floor(1000.0 * (tot - dist) / tot)
        rep_milli = np.where(tot > 0, rep, 0.0).astype(np.int64)
        return pa.table({id_col: t.column(id_col),
                         "n_shingles": pa.array(tot, pa.int64()),
                         "n_distinct": pa.array(dist, pa.int64()),
                         "rep_milli": pa.array(rep_milli, pa.int64())})

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


# --------------------------------------------------------- sequence packing

def pack_sequences(ds, budget: int = 2048, num_partitions: int = 64, *,
                   id_col: str = "doc_id", text_col: str = "text",
                   cache_slim: bool = True):
    """Context-window sequence packing: place documents end-to-end in
    ``id_col`` order and cut fixed ``budget``-token windows — the
    standard "pack the corpus into training sequences" step.  Emits one
    row per document: ``(doc_id, n_tokens, tok_offset, win_start,
    win_end)`` where ``tok_offset`` is the document's global starting
    token position, ``win_start = tok_offset // budget`` and
    ``win_end`` the window of its last token (documents may straddle
    windows; a window id is a training-sequence id).

    Shape — a distributed exclusive prefix sum, the one pattern
    ``Dataset`` lacks natively: (1) slim ``(id, n_tok)`` projection
    (tokenization = the frozen ``[a-z0-9]+`` contract shared with the
    token_count oracle); (2) contiguous range partitions
    ``part = id * P // (max_id + 1)``; (3) per-partition token totals —
    a P-row aggregate collected on the driver (P ints, never rows);
    (4) one ``groupby(part)`` whose in-group kernel is a vectorized
    argsort + cumsum seeded with the partition's broadcast offset.

    ``cache_slim=True`` materializes the 16 B/row projection because it
    is consumed twice (totals + binning); at 10^12 rows prefer
    ``cache_slim=False`` to re-read instead of spilling ~16 TB.
    """
    P = int(num_partitions)

    def slim_fn(t: pa.Table) -> pa.Table:
        lowered = pc.utf8_lower(pc.fill_null(t.column(text_col), ""))
        n = pc.count_substring_regex(lowered, pattern="[a-z0-9]+")
        return pa.table({"id": t.column(id_col).cast(pa.int64()),
                         "n_tok": pc.cast(n, pa.int64())})

    slim = ds.map_batches(slim_fn, batch_format="pyarrow",
                          zero_copy_batch=True)
    if cache_slim:
        slim = slim.materialize()
    max_id = slim.max("id")
    span = int(max_id) + 1

    def add_part(t: pa.Table) -> pa.Table:
        ids = t.column("id").to_numpy(zero_copy_only=False)
        part = (ids.astype(np.int64) * P) // span
        return t.append_column("part", pa.array(part, pa.int64()))

    parted = slim.map_batches(add_part, batch_format="pyarrow",
                              zero_copy_batch=True)
    totals = parted.groupby("part").sum("n_tok").take_all()   # ≤ P rows
    tok_of_part = np.zeros(P, np.int64)
    for r in totals:
        tok_of_part[int(r["part"])] = int(r["sum(n_tok)"])
    offsets = np.concatenate(([0], np.cumsum(tok_of_part)[:-1]))
    offsets_ref = ray.put(offsets)

    def per_part(group: pa.Table) -> pa.Table:
        offs = ray.get(offsets_ref)
        part = int(group.column("part")[0].as_py())
        ids = group.column("id").to_numpy(zero_copy_only=False)
        n = group.column("n_tok").to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")
        ids, n = ids[order], n[order]
        excl = offs[part] + np.concatenate(([0], np.cumsum(n)[:-1]))
        last = excl + np.maximum(n, 1) - 1   # empty doc: window of offset
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "n_tokens": pa.array(n, pa.int64()),
            "tok_offset": pa.array(excl, pa.int64()),
            "win_start": pa.array(excl // budget, pa.int64()),
            "win_end": pa.array(last // budget, pa.int64()),
        })

    return parted.groupby("part").map_groups(per_part,
                                             batch_format="pyarrow")


# ------------------------------------------------------- keyword search

def keyword_search(ds, terms, id_col: str = "doc_id",
                   keep_cols: tuple = ("lang",), text_col: str = "text"):
    """Boolean AND keyword search: keep docs whose token set contains
    EVERY query term (kmcp multi-DB intersection analogue, reference:
    kmcp/cmd/util-db-search.go:359-474 — keep targets present in all
    databases; semantics re-derived for token posting sets).

    The query side is tiny and broadcast by closure (≤63 term hashes);
    each batch pays one tokenize + one hash + one vectorized membership
    pass per term — no posting-list materialization, no shuffle, so the
    filter streams at read speed regardless of corpus size."""
    terms = sorted(set(terms))
    if not terms or len(terms) > 63:
        raise ValueError("keyword_search needs 1..63 distinct terms")
    term_h = hashing.hash_strings(np.array(terms, dtype=object))

    def fn(batch: pa.Table) -> pa.Table:
        toks, rows, n = text.tokenize(batch.column(text_col))
        ok = np.ones(n, dtype=bool)
        if len(toks):
            th = hashing.hash_strings(toks)
            for h in term_h:
                has = np.zeros(n, dtype=bool)
                has[rows[th == h]] = True
                ok &= has
        else:
            ok[:] = False
        return batch.select([id_col, *keep_cols]).filter(pa.array(ok))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


# ------------------------------------------------------ per-doc top term

def doc_top_term(ds, id_col: str = "doc_id", text_col: str = "text"):
    """Dominant term per document under the integer-exact total order
    (term frequency desc, token asc) — idf-free keyword extraction, so
    the SQL oracle needs no float math.  Docs with zero tokens emit no
    row (matching the oracle's unnest semantics).

    Per-batch only (a document is one row, so term counts never span
    batches): one tokenize + one np.unique on packed (row, token-code)
    keys + one lexsort — stateless, no shuffle."""
    def fn(batch: pa.Table) -> pa.Table:
        toks, rows, _n = text.tokenize(batch.column(text_col))
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        if len(toks) == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "top_token": pa.array([], pa.string()),
                             "tf": pa.array([], pa.int64())})
        u, codes = np.unique(toks, return_inverse=True)
        m = np.int64(len(u))
        key = rows * m + codes
        uk, cnt = np.unique(key, return_counts=True)
        d, c = uk // m, uk % m
        order = np.lexsort((c, -cnt, d))
        first = np.concatenate(([True], d[order][1:] != d[order][:-1]))
        sel = order[first]
        return pa.table({
            id_col: pa.array(ids[d[sel]], pa.int64()),
            "top_token": pa.array(u[c[sel]], pa.string()),
            "tf": pa.array(cnt[sel].astype(np.int64), pa.int64())})

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


# ------------------------------------------------------- bigram top-k

def bigram_topk(ds, topk: int = 25, text_col: str = "text"):
    """Global top-k adjacent-token bigrams by count (collocation mining
    — the n=2 instance of the reference's k-mer counting, kmcp
    compute.go:746-803 semantics over tokens instead of bases).

    Map-side combine: each batch reduces its bigrams to distinct
    (w1, w2, partial count) rows via one np.unique over packed token
    codes, so the shuffle carries one row per distinct bigram per
    block (bounded by vocab², not corpus size); then a bigram-sized
    groupby().sum() and a tiny global sort+limit.  Total order =
    (cnt desc, w1 asc, w2 asc)."""
    def partial(t: pa.Table) -> pa.Table:
        toks, rows, _n = text.tokenize(t.column(text_col))
        empty = pa.table({"w1": pa.array([], pa.string()),
                          "w2": pa.array([], pa.string()),
                          "cnt": pa.array([], pa.int64())})
        if len(toks) < 2:
            return empty
        adj = rows[1:] == rows[:-1]
        if not adj.any():
            return empty
        u, codes = np.unique(toks, return_inverse=True)
        m = np.int64(len(u))
        key = codes[:-1][adj] * m + codes[1:][adj]
        uk, cnt = np.unique(key, return_counts=True)
        return pa.table({
            "w1": pa.array(u[uk // m], pa.string()),
            "w2": pa.array(u[uk % m], pa.string()),
            "cnt": pa.array(cnt.astype(np.int64), pa.int64())})

    from ray.data.aggregate import Sum
    agg = ds.map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True) \
        .groupby(["w1", "w2"]).aggregate(Sum(on="cnt", alias_name="cnt"))
    return agg.sort(["cnt", "w1", "w2"],
                    descending=[True, False, False]).limit(topk)


# --------------------------------------------------- distinctive term

def _tf_segments(batch: pa.Table, id_col: str, text_col: str):
    """Per-batch (doc, token) term frequencies.

    Returns ``(seg_doc_idx, seg_tok_str, seg_tok_hash, seg_tf)`` — one
    entry per distinct (row, token) pair — plus the batch's int64 doc
    ids.  A document is one row, so term frequencies never span
    batches; everything is one tokenize + one lexsort + segment
    arithmetic."""
    toks, rows, _n = text.tokenize(batch.column(text_col))
    ids = batch.column(id_col).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    if len(toks) == 0:
        z = np.empty(0, np.int64)
        return z, np.empty(0, object), np.empty(0, np.uint64), z, ids
    th = hashing.hash_strings(toks)
    order = np.lexsort((th, rows))
    th_s, rows_s = th[order], rows[order]
    new = np.concatenate(([True],
                          (th_s[1:] != th_s[:-1])
                          | (rows_s[1:] != rows_s[:-1])))
    seg_id = np.cumsum(new) - 1
    tf = np.bincount(seg_id).astype(np.int64)
    first = np.nonzero(new)[0]
    return (rows_s[first], toks[order][first], th_s[first], tf, ids)


def document_frequency(ds, id_col: str = "doc_id",
                       text_col: str = "text"):
    """Corpus-wide document frequency per token, keyed by the token's
    u64 content hash: (th, df).  Map-side combine — each block emits
    one row per distinct token it contains — so the shuffle is
    vocab-per-block-sized, never corpus-sized."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        _d, _t, th, _tf, _ids = _tf_segments(batch, id_col, text_col)
        u, cnt = np.unique(th, return_counts=True)
        # int64 VIEW of the u64 hash — u64 values past int64 max don't
        # survive Ray's groupby key materialization (pickled-object
        # fallback); the two's-complement view is order-irrelevant here
        return pa.table({"th": pa.array(u.view(np.int64), pa.int64()),
                         "df": pa.array(cnt.astype(np.int64), pa.int64())})

    return ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True) \
        .groupby("th").aggregate(Sum(on="df", alias_name="df"))


def distinctive_term(ds, id_col: str = "doc_id", text_col: str = "text",
                     *, broadcast_vocab_limit: int = 2_000_000,
                     num_partitions: int = 64):
    """Most distinctive term per document under the integer-exact total
    order (tf desc, global df asc, token asc) — the idf intuition with
    no float math, so the DuckDB oracle reproduces it bit-exactly.

    Two passes over the corpus: (1) :func:`document_frequency` — a
    vocab-sized aggregate; (2) per-doc selection with df attached.  The
    df table rides as a broadcast sorted-u64 probe while the vocab fits
    (Heaps' law keeps real-text vocabularies in the millions), else the
    attach falls back to a partitioned exchange — the same
    broadcast-vs-join mode switch as the cluster-map emission
    (pipeline.py) and ann.cosine_pairs' row gate, decided on the
    MEASURED vocab size, vocab-sized driver work only."""
    df_ds = document_frequency(ds, id_col, text_col)
    n_vocab = df_ds.count()

    if n_vocab <= broadcast_vocab_limit:
        dft = df_ds.to_pandas()
        keys = dft["th"].to_numpy().astype(np.int64)
        order = np.argsort(keys)
        ref = ray.put((keys[order], dft["df"].to_numpy()
                       .astype(np.int64)[order]))

        def pick(batch: pa.Table) -> pa.Table:
            d, tok, th, tf, ids = _tf_segments(batch, id_col, text_col)
            if len(d) == 0:
                return _empty_distinctive(id_col)
            keys, vals = ray.get(ref)
            pos = np.searchsorted(keys, th.view(np.int64))
            df = vals[np.clip(pos, 0, len(keys) - 1)]
            sel, _rnk = _pick_per_doc(d, tf, df, tok)
            return pa.table({
                id_col: pa.array(ids[d[sel]], pa.int64()),
                "top_token": pa.array(tok[sel], pa.string()),
                "tf": pa.array(tf[sel], pa.int64()),
                "df": pa.array(df[sel], pa.int64())})

        return ds.map_batches(pick, batch_format="pyarrow",
                              zero_copy_batch=True)

    # exchange arm: union tf rows with df rows on a th-hash partition,
    # attach df inside each partition, then re-partition by doc for the
    # per-doc argmin — two packed exchanges, nothing driver-resident
    P = num_partitions

    def tf_rows(batch: pa.Table) -> pa.Table:
        d, tok, th, tf, ids = _tf_segments(batch, id_col, text_col)
        return pa.table({
            "part": pa.array((th % np.uint64(P)).astype(np.int64)),
            "rt": pa.array(np.zeros(len(d), np.int8), pa.int8()),
            "th": pa.array(th.view(np.int64), pa.int64()),
            "doc": pa.array(ids[d], pa.int64()),
            "tok": pa.array(tok, pa.string()),
            "v": pa.array(tf, pa.int64())})

    def df_rows(batch: pa.Table) -> pa.Table:
        th = batch.column("th").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        df = batch.column("df").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({
            "part": pa.array((th.view(np.uint64) % np.uint64(P))
                             .astype(np.int64)),
            "rt": pa.array(np.ones(len(th), np.int8), pa.int8()),
            "th": pa.array(th, pa.int64()),
            "doc": pa.array(np.zeros(len(th), np.int64), pa.int64()),
            "tok": pa.array([""] * len(th), pa.string()),
            "v": pa.array(df, pa.int64())})

    both = ds.map_batches(tf_rows, batch_format="pyarrow",
                          zero_copy_batch=True) \
        .union(df_ds.map_batches(df_rows, batch_format="pyarrow"))

    def attach(t: pa.Table) -> pa.Table:
        th = t.column("th").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        rt = t.column("rt").to_numpy(zero_copy_only=False)
        v = t.column("v").to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((rt, th))     # df row (rt=1) LAST per th
        th_s, rt_s, v_s = th[order], rt[order], v[order]
        # segment end index per th == its df row (every token present
        # in a partition's tf rows has its df row in the same partition)
        new = np.concatenate(([True], th_s[1:] != th_s[:-1]))
        seg_id = np.cumsum(new) - 1
        ends = np.append(np.nonzero(new)[0][1:], len(th_s)) - 1
        dfv = v_s[ends][seg_id]
        keep = rt_s == 0
        sel = order[keep]
        dpart = (t.column("doc").to_numpy(zero_copy_only=False)[sel]
                 % P).astype(np.int64)
        return pa.table({
            "dpart": pa.array(dpart, pa.int64()),
            "doc": pa.array(t.column("doc")
                            .to_numpy(zero_copy_only=False)[sel]),
            "tok": pa.array(t.column("tok")
                            .to_numpy(zero_copy_only=False)[sel]),
            "tf": pa.array(v_s[keep], pa.int64()),
            "df": pa.array(dfv[keep], pa.int64())})

    attached = both.groupby("part").map_groups(attach,
                                               batch_format="pyarrow")

    def finish(t: pa.Table) -> pa.Table:
        doc = t.column("doc").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        tok = t.column("tok").to_numpy(zero_copy_only=False)
        tf = t.column("tf").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        df = t.column("df").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        if len(doc) == 0:
            return _empty_distinctive(id_col)
        sel, _ = _pick_per_doc(doc, tf, df, tok)
        return pa.table({id_col: pa.array(doc[sel], pa.int64()),
                         "top_token": pa.array(tok[sel], pa.string()),
                         "tf": pa.array(tf[sel], pa.int64()),
                         "df": pa.array(df[sel], pa.int64())})

    return attached.groupby("dpart").map_groups(finish,
                                                batch_format="pyarrow")


def _empty_distinctive(id_col: str) -> pa.Table:
    return pa.table({id_col: pa.array([], pa.int64()),
                     "top_token": pa.array([], pa.string()),
                     "tf": pa.array([], pa.int64()),
                     "df": pa.array([], pa.int64())})


def _pick_per_doc(doc: np.ndarray, tf: np.ndarray, df: np.ndarray,
                  tok: np.ndarray):
    """Index of the winning (tf desc, df asc, token asc) entry per
    distinct doc value, plus nothing else — one lexsort."""
    order = np.lexsort((tok, df, -tf, doc))
    d_s = doc[order]
    first = np.concatenate(([True], d_s[1:] != d_s[:-1]))
    return order[first], None


# --------------------------------------------------------- source balance

def source_balance(ds, cap: int = 50, source_col: str = "source",
                   id_col: str = "doc_id"):
    """Downsample over-represented sources to ~``cap`` docs each (in
    expectation) — the domain-balancing step of a training-data mix.

    Per-source keep rates are pure integer arithmetic,
    ``rate_ppm = min(10^6, 10^6 * cap // n_source)``, and the keep
    decision reuses the SQL-mirrorable :func:`sample_hash32`, so the
    sampled corpus is deterministic, reproducible across cluster
    sizes, and driver-oracle-checkable.

    Shape: one source-sized ``groupby(source).count`` collected to the
    driver (one row per source/domain — bounded by Heaps-law domain
    counts, not corpus size; gate at ``len > 2M`` and switch the attach
    to exchange.join_lookup if a corpus ever exceeds it), broadcast as
    a sorted hash→rate probe, then ONE stateless filter pass — the
    corpus itself never shuffles, unlike :func:`stratified_sample`'s
    exact-quota groupby."""
    counts = ds.groupby(source_col).count().to_pandas()
    src = counts[source_col].to_numpy().astype(object)
    n = counts["count()"].to_numpy().astype(np.int64)
    rate = np.minimum(1_000_000, 1_000_000 * int(cap) // n)
    sh = hashing.hash_strings(src)
    order = np.argsort(sh)
    ref = ray.put((sh[order], rate[order]))

    def fn(t: pa.Table) -> pa.Table:
        keys, rates = ray.get(ref)
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        s = hashing.hash_strings(
            t.column(source_col).to_numpy(zero_copy_only=False))
        pos = np.clip(np.searchsorted(keys, s), 0, len(keys) - 1)
        r = rates[pos]
        keep = (sample_hash32(ids) % np.uint64(1_000_000)) \
            < r.astype(np.uint64)
        return t.filter(pa.array(keep))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------- fuzzy decontamination

def eval_shingle_postings(eval_ds, k: int = 3, id_col: str = "doc_id",
                          text_col: str = "text"):
    """Inverted shingle→eval-doc postings of an eval/benchmark set,
    driver-reduced (eval-set-sized by definition, like
    :func:`eval_shingle_blocklist`).  Returns ``(keys, starts, counts,
    eval_ids, eval_sizes)``: sorted distinct shingle hashes with their
    posting segments into ``eval_ids`` positions, plus each eval doc's
    distinct-shingle count aligned with ``np.unique(eval_ids)``."""
    def partial(t: pa.Table) -> pa.Table:
        sh, rows, _n = textops.shingle_strings(t.column(text_col), k)
        ids = t.column(id_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        h = hashing.hash_tokens(sh)
        order = np.lexsort((h, rows))
        hs, rs = h[order], rows[order]
        first = np.ones(len(hs), dtype=bool)
        first[1:] = (hs[1:] != hs[:-1]) | (rs[1:] != rs[:-1])
        return pa.table({"h": pa.array(hs[first], pa.uint64()),
                         "did": pa.array(ids[rs[first]], pa.int64())})

    hs, ds_ = [np.empty(0, np.uint64)], [np.empty(0, np.int64)]
    pairs = eval_ds.map_batches(partial, batch_format="pyarrow",
                                zero_copy_batch=True)
    for b in pairs.iter_batches(batch_size=1 << 18,
                                batch_format="pyarrow"):
        hs.append(b.column("h").to_numpy(zero_copy_only=False))
        ds_.append(b.column("did").to_numpy(zero_copy_only=False))
    h = np.concatenate(hs)
    did = np.concatenate(ds_)
    eval_ids, eidx = np.unique(did, return_inverse=True)
    eval_sizes = np.bincount(eidx, minlength=len(eval_ids)) \
        .astype(np.int64)
    order = np.argsort(h, kind="stable")
    h, eidx = h[order], eidx[order]
    first = np.concatenate(([True], h[1:] != h[:-1])) \
        if len(h) else np.empty(0, bool)
    keys = h[first]
    starts = np.nonzero(first)[0]
    counts = np.diff(np.append(starts, len(h))).astype(np.int64)
    return keys, starts.astype(np.int64), counts, eidx, eval_ids, \
        eval_sizes


def fuzzy_decontaminate(ds, eval_ds, k: int = 3,
                        min_jacc_u: int = 500_000,
                        id_col: str = "doc_id", text_col: str = "text"):
    """Drop corpus rows whose distinct-shingle Jaccard with ANY eval
    doc reaches ``min_jacc_u`` (ppm) — NEAR-dup benchmark
    decontamination, the fuzzy upgrade of :func:`decontaminate` (which
    drops on a single shared shingle).

    Shape: eval postings broadcast once (``ray.put``), then ONE
    stateless corpus pass — per batch: distinct (row, shingle-hash),
    searchsorted probe, vectorized posting expansion, one ``np.unique``
    intersection count per (row, eval doc), exact Jaccard against the
    in-batch corpus size and broadcast eval sizes.  Zero shuffle; the
    corpus streams at read speed whatever its size.  ``jacc_u =
    1e6 * c / (na + nb - c)`` in float64, the same expression the SQL
    oracle evaluates, so boundary rows agree bit-wise."""
    from kmcp_ray.bands import _segment_gather

    keys, starts, counts, eidx, _eval_ids, eval_sizes = \
        eval_shingle_postings(eval_ds, k=k, id_col=id_col,
                              text_col=text_col)
    ref = ray.put((keys, starts, counts, eidx, eval_sizes))
    thr = float(min_jacc_u)

    def fn(t: pa.Table) -> pa.Table:
        keys_l, starts_l, counts_l, eidx_l, esz = ray.get(ref)
        n = t.num_rows
        sh, rows, _n = textops.shingle_strings(t.column(text_col), k)
        h = hashing.hash_tokens(sh)
        order = np.lexsort((h, rows))
        hs, rs = h[order], rows[order]
        first = np.ones(len(hs), dtype=bool)
        first[1:] = (hs[1:] != hs[:-1]) | (rs[1:] != rs[:-1])
        hd, rd = hs[first], rs[first]
        csize = np.bincount(rd, minlength=n).astype(np.int64)
        drop = np.zeros(n, dtype=bool)
        if len(hd) and len(keys_l):
            pos = np.searchsorted(keys_l, hd)
            pos_c = np.minimum(pos, len(keys_l) - 1)
            hit = (pos < len(keys_l)) & (keys_l[pos_c] == hd)
            hrow, hpos = rd[hit], pos_c[hit]
            reps = counts_l[hpos]
            prow = np.repeat(hrow, reps)
            pev = eidx_l[_segment_gather(starts_l[hpos], reps)]
            if len(prow):
                E = np.int64(len(esz))
                key = prow.astype(np.int64) * E + pev
                uk, c = np.unique(key, return_counts=True)
                crow, cev = uk // E, uk % E
                jacc = 1000000.0 * c / (csize[crow] + esz[cev] - c)
                drop[crow[jacc >= thr]] = True
        return t.filter(pa.array(~drop))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


# ------------------------------------------------------ span (line) dedup

#: widx bits in the packed (doc_id, widx) key — docs are bounded at
#: 2^20 windows (w * 1M tokens); doc_id keeps the high 43 bits.
SPAN_WIDX_BITS = 20
_WIDX_MASK = np.int64((1 << SPAN_WIDX_BITS) - 1)


def _doc_windows(ids: np.ndarray, texts, w: int):
    """Non-overlapping ``w``-token window decomposition of a batch.

    Returns ``(flat_tokens, tok_rows, row_starts, win_hash, packed,
    win_row)``: the tokenization (for rebuild), plus per full window its
    u64 content hash (hash of the space-joined token string — the exact
    string the SQL oracle builds with ``array_to_string(tk[a:b], ' ')``)
    and the order-carrying packed key ``doc_id << 20 | widx``."""
    flat, rows, n = text.tokenize(texts)
    n_tok = np.bincount(rows, minlength=n).astype(np.int64) if len(rows) \
        else np.zeros(n, np.int64)
    row_starts = np.concatenate(([0], np.cumsum(n_tok)))
    nw = n_tok // w
    total = int(nw.sum())
    if total == 0:
        return (flat, rows, row_starts, np.empty(0, np.uint64),
                np.empty(0, np.int64), np.empty(0, np.int64))
    win_row = np.repeat(np.arange(n, dtype=np.int64), nw)
    widx = np.arange(total, dtype=np.int64) \
        - np.repeat(np.cumsum(nw) - nw, nw)
    start = row_starts[win_row] + w * widx
    s = flat[start].astype(object)
    for d in range(1, w):
        s = s + " "
        s = s + flat[start + d]
    h = hashing.hash_tokens(s)
    if int(nw.max()) >= (1 << SPAN_WIDX_BITS):
        raise ValueError(
            f"span_dedup: a document has {int(nw.max())} windows, over the "
            f"2^{SPAN_WIDX_BITS} packed-key bound (~{w << SPAN_WIDX_BITS} "
            "tokens/doc). Split oversized docs (chunks.split_chunk_col) or "
            "raise SPAN_WIDX_BITS.")
    packed = (ids[win_row] << SPAN_WIDX_BITS) | widx
    return flat, rows, row_starts, h, packed, win_row


def _rebuild_clean(ids: np.ndarray, texts, w: int, rdoc: np.ndarray,
                   rwid: np.ndarray):
    """Drop the removed windows (``rdoc``, ``rwid``) from each doc and
    re-join the surviving tokens — the shared kernel of both emission
    arms.  Returns (clean_text object array, n_spans_removed int64)."""
    flat, rows, row_starts, _h, _p, _wr = _doc_windows(ids, texts, w)
    n = len(ids)
    keep_tok = np.ones(len(flat), dtype=bool)
    removed_per_row = np.zeros(n, dtype=np.int64)
    if len(rdoc):
        order = np.argsort(ids, kind="stable")
        pos = np.searchsorted(ids[order], rdoc)
        row = order[np.minimum(pos, n - 1)]
        ok = ids[row] == rdoc            # removed rows of OTHER batches
        row, rwid = row[ok], rwid[ok]
        if len(row):
            kill = (row_starts[row] + w * rwid)[:, None] \
                + np.arange(w, dtype=np.int64)[None, :]
            keep_tok[kill.ravel()] = False
            removed_per_row += np.bincount(row, minlength=n)
    toks, trows = flat[keep_tok], rows[keep_tok]
    bounds = np.searchsorted(trows, np.arange(n + 1))
    clean = np.array([" ".join(toks[a:b])
                      for a, b in zip(bounds[:-1], bounds[1:])],
                     dtype=object)
    return clean, removed_per_row


def span_dedup(ds, w: int = 5, id_col: str = "doc_id",
               text_col: str = "text", num_partitions: int = 64,
               broadcast_removed_rows: int = 5_000_000):
    """Cross-document duplicated-span removal (the C4 "remove any
    three-sentence span occurring more than once" rule re-expressed
    over token windows): the corpus is cut into non-overlapping
    ``w``-token windows, the globally FIRST occurrence (min
    ``(doc_id, widx)``) of each distinct window content survives, every
    later occurrence is deleted from its document, and documents are
    re-emitted as the space-joined surviving token stream
    ``(doc_id, clean_text, n_spans_removed)``.  Trailing ``len % w``
    tokens are always kept.  The kmcp analogue is the duplicated-k-mer
    skip inside sketch dedup (reference: kmcp/cmd/compute.go:545-556),
    lifted from within-document to corpus-global.

    Shape: windows ride the ONE shuffle as 16 B rows (u64 content hash
    + packed ``doc_id<<20|widx``) — text never moves; per-partition
    segment-min picks winners vectorized (lexsort + first-of-segment).
    The removed set (duplication-proportional, not corpus-proportional)
    either broadcasts as one sorted i64 array (``ray.put``, exact
    membership by packed key) or, past ``broadcast_removed_rows``,
    rides a second hash-partitioned exchange keyed on ``doc_id``
    alongside the doc rows.  Window equality is u64-hash-based (the
    standard LSH-engine tradeoff; ~1e-7 false-merge odds at 10^9
    distinct windows)."""
    P = num_partitions

    def windows(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        _f, _r, _s, h, packed, _wr = _doc_windows(ids, t.column(text_col), w)
        return pa.table({
            "part": pa.array((h % np.uint64(P)).astype(np.int32)),
            "h": pa.array(h, pa.uint64()),
            "packed": pa.array(packed, pa.int64())})

    def removed_in_part(g: pa.Table) -> pa.Table:
        h = g.column("h").to_numpy(zero_copy_only=False)
        packed = g.column("packed").to_numpy(zero_copy_only=False)
        order = np.lexsort((packed, h))
        hs, ps = h[order], packed[order]
        dup = np.zeros(len(hs), dtype=bool)
        dup[1:] = hs[1:] == hs[:-1]      # all but the segment min
        return pa.table({"packed": pa.array(ps[dup], pa.int64())})

    removed = ds.select_columns([id_col, text_col]) \
        .map_batches(windows, batch_format="pyarrow", zero_copy_batch=True) \
        .groupby("part").map_groups(removed_in_part, batch_format="pyarrow") \
        .materialize()                   # removed set: pair-sized, small
    n_removed = removed.count()

    if n_removed <= broadcast_removed_rows:
        chunks = [np.empty(0, np.int64)]
        for b in removed.iter_batches(batch_size=1 << 18,
                                      batch_format="pyarrow"):
            chunks.append(b.column("packed").to_numpy(zero_copy_only=False))
        rem = np.sort(np.concatenate(chunks))
        rem_ref = ray.put(rem)

        def rebuild(t: pa.Table) -> pa.Table:
            rp = ray.get(rem_ref)
            ids = t.column(id_col).to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            lo = np.searchsorted(rp, ids.min() << SPAN_WIDX_BITS) \
                if len(ids) else 0
            hi = np.searchsorted(rp, ((ids.max() + 1) << SPAN_WIDX_BITS)) \
                if len(ids) else 0
            sub = rp[lo:hi]
            clean, nrem = _rebuild_clean(
                ids, t.column(text_col), w,
                sub >> SPAN_WIDX_BITS, sub & _WIDX_MASK)
            return pa.table({id_col: pa.array(ids, pa.int64()),
                             "clean_text": pa.array(clean, pa.string()),
                             "n_spans_removed": pa.array(nrem, pa.int64())})

        return ds.select_columns([id_col, text_col]) \
            .map_batches(rebuild, batch_format="pyarrow",
                         zero_copy_batch=True)

    return _exchange_rebuild(ds, removed, w, id_col, text_col, P)


def _exchange_rebuild(ds, removed, w: int, id_col: str, text_col: str,
                      P: int, cnt_col: str = "n_spans_removed"):
    """Exchange arm of window removal (shared by :func:`span_dedup` and
    :func:`boilerplate_dedup`): docs + removed packed ``doc<<20|widx``
    keys co-partitioned on hash(doc_id), text crosses the wire once
    (the join_lookup shape), per-partition vectorized rebuild."""
    def tag_docs(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        part = (hashing.splitmix64(ids.astype(np.uint64))
                % np.uint64(P)).astype(np.int32)
        return pa.table({"part": pa.array(part),
                         "doc_id": pa.array(ids, pa.int64()),
                         "text": t.column(text_col).cast(pa.string()),
                         "packed": pa.array(np.full(len(ids), -1, np.int64))})

    def tag_removed(t: pa.Table) -> pa.Table:
        packed = t.column("packed").to_numpy(zero_copy_only=False)
        did = packed >> SPAN_WIDX_BITS
        part = (hashing.splitmix64(did.astype(np.uint64))
                % np.uint64(P)).astype(np.int32)
        return pa.table({"part": pa.array(part),
                         "doc_id": pa.array(did, pa.int64()),
                         "text": pa.array([None] * len(did), pa.string()),
                         "packed": pa.array(packed, pa.int64())})

    both = ds.select_columns([id_col, text_col]) \
        .map_batches(tag_docs, batch_format="pyarrow",
                     zero_copy_batch=True) \
        .union(removed.map_batches(tag_removed, batch_format="pyarrow",
                                   zero_copy_batch=True))

    def rebuild_group(g: pa.Table) -> pa.Table:
        packed = g.column("packed").to_numpy(zero_copy_only=False)
        is_doc = packed < 0
        docs = g.filter(pa.array(is_doc))
        ids = docs.column("doc_id").to_numpy(zero_copy_only=False)
        rp = packed[~is_doc]
        clean, nrem = _rebuild_clean(
            ids, docs.column("text"), w,
            rp >> SPAN_WIDX_BITS, rp & _WIDX_MASK)
        return pa.table({id_col: pa.array(ids, pa.int64()),
                         "clean_text": pa.array(clean, pa.string()),
                         cnt_col: pa.array(nrem, pa.int64())})

    return both.groupby("part").map_groups(rebuild_group,
                                           batch_format="pyarrow")


# ------------------------------------------------------ quality-rule gate

#: The fixed must-contain stopword list of the Gopher quality rules
#: (Rae et al. 2021, public) — a doc passing R4 contains >= 2 of these.
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_filter(ds, *, min_words: int = 50, max_words: int = 100_000,
                  min_mwl: int = 3, max_mwl: int = 10,
                  max_symbol_pct: int = 10, min_stopwords: int = 2,
                  id_col: str = "doc_id", text_col: str = "text"):
    """Gopher-style composite quality gate, one stateless vectorized
    ``map_batches`` pass (kmcp analogue: the regex blacklist +
    min-length gates applied before indexing, kmcp/cmd/compute.go:248-260
    — generalized to the published web-corpus rule set).  Emits
    ``(doc_id, n_tokens, fail_mask)`` with one bit per violated rule:

      bit 0: word count outside [min_words, max_words]
      bit 1: mean word length outside [min_mwl, max_mwl] — compared as
             ``min_mwl*n <= total_len <= max_mwl*n`` so engine and SQL
             agree with NO float division
      bit 2: symbol chars (not [a-z0-9], not whitespace, case-folded)
             exceed ``max_symbol_pct``% of the text:
             ``100*sym > pct*len``
      bit 3: fewer than ``min_stopwords`` DISTINCT Gopher stopwords

    ``fail_mask == 0`` is the keep decision; callers filter on it so
    the rejected rows stay inspectable (the reject-reason ledger a
    production corpus run audits)."""
    sw = pa.array(list(GOPHER_STOPWORDS))

    def fn(t: pa.Table) -> pa.Table:
        n = t.num_rows
        ids = t.column(id_col)
        txt = pc.fill_null(t.column(text_col), "")
        low = pc.utf8_lower(txt)
        lists = pc.split_pattern_regex(low, pattern="[^a-z0-9]+")
        flat = pc.list_flatten(lists)
        parents = pc.list_parent_indices(lists) \
            .to_numpy(zero_copy_only=False)
        nonempty = pc.greater(pc.utf8_length(flat), 0) \
            .to_numpy(zero_copy_only=False)
        tlen = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
        n_tok = np.bincount(parents[nonempty], minlength=n) \
            .astype(np.int64)
        tot_len = np.bincount(parents[nonempty],
                              weights=tlen[nonempty],
                              minlength=n).astype(np.int64)
        # symbol chars: chars dropped by stripping [a-z0-9] and all
        # whitespace from the lower-cased text
        stripped = pc.replace_substring_regex(low, pattern=r"[a-z0-9\s]",
                                              replacement="")
        n_sym = pc.utf8_length(stripped).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        n_chars = pc.utf8_length(low).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        # distinct stopwords present: dedup (row, token) among stopword
        # hits, then count per row
        is_sw = pc.is_in(flat, value_set=sw).to_numpy(zero_copy_only=False)
        hit_rows = parents[is_sw & nonempty]
        hit_tok = flat.to_numpy(zero_copy_only=False)[is_sw & nonempty]
        n_sw = np.zeros(n, dtype=np.int64)
        if len(hit_rows):
            order = np.lexsort((hit_tok, hit_rows))
            hr, ht = hit_rows[order], hit_tok[order]
            firstm = np.ones(len(hr), dtype=bool)
            firstm[1:] = (hr[1:] != hr[:-1]) | (ht[1:] != ht[:-1])
            n_sw = np.bincount(hr[firstm], minlength=n).astype(np.int64)
        mask = np.zeros(n, dtype=np.int64)
        mask |= ((n_tok < min_words) | (n_tok > max_words)) * 1
        mask |= ((tot_len < min_mwl * n_tok)
                 | (tot_len > max_mwl * n_tok)) * 2
        mask |= (100 * n_sym > max_symbol_pct * n_chars) * 4
        mask |= (n_sw < min_stopwords) * 8
        return pa.table({id_col: ids,
                         "n_tokens": pa.array(n_tok, pa.int64()),
                         "fail_mask": pa.array(mask, pa.int64())})

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


# ------------------------------------------- training order + splits

def global_shuffle(ds, id_col: str = "doc_id", num_partitions: int = 64):
    """Deterministic training-order shuffle: every row gets a global
    position ``shuffle_pos`` = its rank under ``(sample_hash32(id),
    id)``.  Reproducible across runs/cluster sizes (vs
    ``Dataset.random_shuffle``'s seed-plus-topology order) and
    SQL-mirrorable, which is what makes a 10^12-row training order
    auditable.

    Shape: the same distributed exclusive prefix sum as
    ``pack_sequences`` — contiguous HASH-range partitions (the hash is
    uniform, so ranges are balanced without sampling), a P-row count
    table on the driver, then one groupby whose in-group kernel is a
    vectorized argsort seeded with the partition's broadcast offset.
    No driver-side rows beyond P integers.
    """
    P = int(num_partitions)

    def add_key(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        h = sample_hash32(ids).astype(np.int64)
        part = (h * P) >> 32
        return pa.table({"id": pa.array(ids.astype(np.int64), pa.int64()),
                         "h": pa.array(h, pa.int64()),
                         "part": pa.array(part, pa.int64())})

    keyed = ds.map_batches(add_key, batch_format="pyarrow",
                           zero_copy_batch=True).materialize()
    counts = keyed.groupby("part").count().take_all()    # ≤ P rows
    per_part = np.zeros(P, np.int64)
    for r in counts:
        per_part[int(r["part"])] = int(r["count()"])
    offsets_ref = ray.put(
        np.concatenate(([0], np.cumsum(per_part)[:-1])))

    def rank(group: pa.Table) -> pa.Table:
        offs = ray.get(offsets_ref)
        part = int(group.column("part")[0].as_py())
        ids = group.column("id").to_numpy(zero_copy_only=False)
        h = group.column("h").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, h))
        pos = np.empty(len(ids), np.int64)
        pos[order] = offs[part] + np.arange(len(ids), dtype=np.int64)
        return pa.table({id_col: pa.array(ids, pa.int64()),
                         "shuffle_pos": pa.array(pos, pa.int64())})

    return keyed.groupby("part").map_groups(rank, batch_format="pyarrow")


def hash_split(ds, id_col: str = "doc_id", *, train_pct: int = 80,
               val_pct: int = 10):
    """Deterministic train/val/test assignment: ``sample_hash32(id) %
    100`` < train_pct → train, < train_pct+val_pct → val, else test.
    Membership is a pure function of the id — stable under corpus
    growth, re-sharding and cluster size, unlike positional splits.
    One stateless map, no shuffle."""
    bound_v = train_pct + val_pct

    def fn(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        r = (sample_hash32(ids) % np.uint64(100)).astype(np.int64)
        split = np.where(r < train_pct, "train",
                         np.where(r < bound_v, "val", "test"))
        return pa.table({id_col: pa.array(ids.astype(np.int64), pa.int64()),
                         "split": pa.array(split.astype(object),
                                           pa.string())})

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def quality_filter_pctl(ds, pct: int = 25, id_col: str = "doc_id",
                        text_col: str = "text",
                        source_col: str = "source"):
    """Per-source percentile quality gate: keep documents whose integer
    quality score (:func:`kmcp_ray.textops.quality_score_batch`) is at
    or above their OWN source's ``pct``-th percentile — the standard
    per-domain curation cut (a global threshold over-prunes weak
    sources and under-prunes strong ones).

    Scale shape: one scoring pass (vectorized, carries ``source``
    alongside), per-source thresholds via the distributed exact
    order-statistic histogram (:func:`kmcp_ray.relops.group_quantiles`
    — the corpus collapses to source x distinct-score counts, never to
    the driver), thresholds broadcast (source-cardinality-sized), one
    filter pass.  Rank semantics identical to group_quantiles:
    0-based lower statistic at ``(n-1) * pct // 100``.

    Returns ``(id, source, quality_u)`` for the kept rows.
    """
    from kmcp_ray.relops import group_quantiles
    from kmcp_ray.textops import quality_score_batch

    def score(batch: pa.Table) -> pa.Table:
        st = quality_score_batch(batch, id_col=id_col, text_col=text_col)
        return pa.table({id_col: st.column(id_col),
                         source_col: batch.column(source_col),
                         "quality_u": st.column("quality_u")})

    scored = ds.map_batches(score, batch_format="pyarrow",
                            zero_copy_batch=True)
    thr_rows = group_quantiles(
        scored.select_columns([source_col, "quality_u"]),
        source_col, "quality_u", (int(pct),)).take_all()
    thr = {r[source_col]: int(r["value"]) for r in thr_rows}
    thr_ref = ray.put(thr)

    def keep(batch: pa.Table) -> pa.Table:
        t = ray.get(thr_ref)
        src = batch.column(source_col).to_numpy(zero_copy_only=False)
        q = batch.column("quality_u").to_numpy(zero_copy_only=False)
        cut = np.fromiter((t[s] for s in src), dtype=np.int64,
                          count=len(src))
        return batch.filter(pa.array(q >= cut))

    return scored.map_batches(keep, batch_format="pyarrow",
                              zero_copy_batch=True)


def mixture_resample(ds, targets: dict, id_col: str = "doc_id",
                     source_col: str = "source",
                     num_partitions: int = 64):
    """Target-mixture resampling (the data-mixing step): keep the
    LARGEST deterministic subset whose per-source proportions match
    integer-weight ``targets`` — the bottleneck source is kept whole
    and every other source's quota is ``floor(n* x w_s / w*)`` (exact
    integer arithmetic, no float proportions), selected as each
    source's first-``quota`` rows under the ``(sample_hash32(id), id)``
    order.  Sources absent from ``targets`` are dropped.

    Shape: one (source x hash-range) count groupby (S x P rows on the
    driver — source-cardinality-bounded), quotas broadcast, then one
    groupby whose in-group kernel ranks against the partition's
    prefix-sum offset — the same distributed ranking as
    :func:`global_shuffle`, nothing corpus-sized on the driver.

    Returns kept rows ``(id, source, mix_rank)``.
    """
    P = int(num_partitions)
    weights = {s: int(w) for s, w in targets.items()}
    if any(w <= 0 for w in weights.values()):
        raise ValueError("mixture weights must be positive integers")

    def add_key(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        h = sample_hash32(ids).astype(np.int64)
        part = (h * P) >> 32
        return pa.table({"id": pa.array(ids.astype(np.int64), pa.int64()),
                         source_col: t.column(source_col),
                         "h": pa.array(h, pa.int64()),
                         "part": pa.array(part, pa.int64())})

    keyed = ds.map_batches(add_key, batch_format="pyarrow",
                           zero_copy_batch=True).materialize()
    counts = keyed.groupby([source_col, "part"]).count().take_all()
    n_by_src: dict = {}
    for r in counts:
        n_by_src[r[source_col]] = n_by_src.get(r[source_col], 0) \
            + int(r["count()"])
    # bottleneck source t*: min n_t / w_t by exact cross-multiplication
    star = None
    for s, w in sorted(weights.items()):
        n = n_by_src.get(s, 0)
        if star is None or n * star[1] < star[0] * w:
            star = (n, w)
    n_star, w_star = star if star else (0, 1)
    quota = {s: (n_star * w) // w_star for s, w in weights.items()}
    # per-(source, part) exclusive prefix offsets within the source
    offs: dict = {}
    for s in weights:
        per = np.zeros(P, np.int64)
        for r in counts:
            if r[source_col] == s:
                per[int(r["part"])] = int(r["count()"])
        offs[s] = np.concatenate(([0], np.cumsum(per)[:-1]))
    side = ray.put((offs, quota))

    def rank(group: pa.Table) -> pa.Table:
        o, q = ray.get(side)
        src = group.column(source_col)[0].as_py()
        empty = pa.table({id_col: pa.array([], pa.int64()),
                          source_col: pa.array([], pa.string()),
                          "mix_rank": pa.array([], pa.int64())})
        if src not in q:
            return empty
        part = int(group.column("part")[0].as_py())
        ids = group.column("id").to_numpy(zero_copy_only=False)
        h = group.column("h").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, h))
        pos = np.empty(len(ids), np.int64)
        pos[order] = o[src][part] + np.arange(len(ids), dtype=np.int64)
        keep = pos < q[src]
        return pa.table({
            id_col: pa.array(ids[keep], pa.int64()),
            source_col: pa.array(np.full(int(keep.sum()), src,
                                         dtype=object), pa.string()),
            "mix_rank": pa.array(pos[keep], pa.int64())})

    return keyed.groupby([source_col, "part"]).map_groups(
        rank, batch_format="pyarrow")


# ---------------------------------------------------- per-doc novelty

def novelty_score(ds, id_col: str = "doc_id", text_col: str = "text",
                  k: int = 3, token_hash: str = "md5",
                  num_partitions: int = 64):
    """(doc_id, n_distinct, n_novel, novelty_u) — per-doc marginal-new-
    content score: over the doc's DISTINCT k-token shingles, how many
    have their global FIRST occurrence (minimum doc id holding the
    shingle) in this doc; ``novelty_u = floor(1e6 * n_novel /
    n_distinct)`` (0 for shingle-less docs).  The data-valuation /
    curriculum-ordering primitive: a 1e6-novelty doc contributes only
    new n-grams, a 0-novelty doc is fully covered by earlier corpus
    content (kmcp's per-file distinct-kmer accounting,
    compute.go:813-824, extended with the index build's
    first-occurrence union semantics, index.go:1114-1264 — semantics
    re-derived, not ported).

    Scale shape: per-batch distinct (shingle-hash, id) pairs — 16
    B/row, payload text never shuffles — through ONE hash-partition
    groupby; each partition credits first occurrences with a
    vectorized segment-min and emits per-doc PARTIAL counts (≤ docs ×
    partitions rows), so the final per-doc sum is a doc-sized groupby.

    ``token_hash``: "md5" hashes the shingle string (SQL-mirrorable —
    the driver-oracle variant); "sip" uses the vectorized SipHash fold
    chain (production hot path, same distinct/min semantics).
    """
    kk = int(k)
    nparts = np.uint64(num_partitions)

    def pairs(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        if token_hash == "md5":
            vals, rows, _ = textops.shingle_strings(
                batch.column(text_col), kk, include_short=True)
            h = hashing.md5_lower64(vals)
        else:
            ss = text.shingle_sets(batch.column(text_col), kk,
                                   int(hashing.MAX_U64))
            h, off = ss["hashes"], ss["offsets"]
            rows = np.repeat(np.arange(len(off) - 1, dtype=np.int64),
                             np.diff(off))
        did = ids[rows]
        if len(h):
            # distinct (h, doc) — one credit per shingle per doc
            order = np.lexsort((did, h))
            h, did = h[order], did[order]
            first = np.ones(len(h), dtype=bool)
            first[1:] = (h[1:] != h[:-1]) | (did[1:] != did[:-1])
            h, did = h[first], did[first]
        part = (h % nparts).astype(np.int64)
        return pa.table({"h": pa.array(h, pa.uint64()),
                         "did": pa.array(did, pa.int64()),
                         "part": pa.array(part, pa.int64())})

    def per_partition(batch: pa.Table) -> pa.Table:
        h = batch.column("h").to_numpy(zero_copy_only=False) \
            .astype(np.uint64)
        did = batch.column("did").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        if len(h) == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "nd": pa.array([], pa.int64()),
                             "nn": pa.array([], pa.int64())})
        order = np.lexsort((did, h))
        h_s, did_s = h[order], did[order]
        seg = np.concatenate(([True], h_s[1:] != h_s[:-1]))
        novel = seg                      # first (min) doc id per shingle
        uids, inv = np.unique(did_s, return_inverse=True)
        nd = np.bincount(inv, minlength=len(uids))
        nn = np.bincount(inv, weights=novel.astype(np.float64),
                         minlength=len(uids)).astype(np.int64)
        return pa.table({id_col: pa.array(uids, pa.int64()),
                         "nd": pa.array(nd.astype(np.int64), pa.int64()),
                         "nn": pa.array(nn, pa.int64())})

    def zeros(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table({id_col: batch.column(id_col),
                         "nd": pa.array(np.zeros(n, np.int64), pa.int64()),
                         "nn": pa.array(np.zeros(n, np.int64), pa.int64())})

    def finish(batch: pa.Table) -> pa.Table:
        nd = batch.column("n_distinct").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        nn = batch.column("n_novel").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        nov = np.where(nd > 0, (1_000_000 * nn) // np.maximum(nd, 1), 0)
        return pa.table({id_col: batch.column(id_col),
                         "n_distinct": pa.array(nd, pa.int64()),
                         "n_novel": pa.array(nn, pa.int64()),
                         "novelty_u": pa.array(nov, pa.int64())})

    from ray.data.aggregate import Sum
    pr = ds.map_batches(pairs, batch_format="pyarrow", zero_copy_batch=True)
    partials = pr.groupby("part").map_groups(per_partition,
                                             batch_format="pyarrow")
    base = ds.map_batches(zeros, batch_format="pyarrow",
                          zero_copy_batch=True)
    return base.union(partials).groupby(id_col) \
        .aggregate(Sum(on="nd", alias_name="n_distinct"),
                   Sum(on="nn", alias_name="n_novel")) \
        .map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


# ------------------------------------------------ contrastive triplets

def contrastive_triplets(ds, *, max_id: int = 300,
                         min_jacc_u: int = 650000,
                         id_col: str = "doc_id", text_col: str = "text",
                         P: int = 16):
    """(anchor_id, pos_id, neg_id) — contrastive training triplets
    mined from the dedup signal: every doc with at least one
    exact-Jaccard near-duplicate partner becomes an anchor, positive =
    its smallest partner id, negative = a deterministic hash-pick over
    the id range REJECTED (anti-join) when it is itself a near-dup of
    the anchor.  The SimCLR/CLIP-style data op: dedup clusters double
    as a positive-pair mine, and the hash-pick replaces an RNG so the
    driver oracle reproduces triplets bit-exactly.

    Negative candidates assume the bounded slice's ids are dense
    0..max_id-1 (the testdata contract; at scale pass an id-rank
    column — curate.global_shuffle produces one).  Scale shape: pairs
    from :func:`kmcp_ray.docs_dedup.token_jaccard_exact` (bounded
    ground-truth slice; the LSH pipeline is the production pair mine —
    swap it in unchanged), one pair-sized Min-groupby for positives,
    and one anti-join exchange (:func:`kmcp_ray.joins.hash_join`,
    packed unordered pair key) for negative rejection — nothing
    broadcasts, nothing materializes beyond pair-sized streams.
    """
    from ray.data.aggregate import Min

    from kmcp_ray import docs_dedup
    from kmcp_ray.joins import hash_join

    # pair-sized; materialized because BOTH the positive mine and the
    # anti-join key off it — lazy fan-out would re-run the exact
    # Jaccard ground-truth DAG twice
    pairs = docs_dedup.token_jaccard_exact(
        ds, max_id=max_id, min_jacc_u=min_jacc_u,
        id_col=id_col, text_col=text_col).materialize()

    def sym(t: pa.Table) -> pa.Table:
        a = t.column("id_a").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        b = t.column("id_b").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({
            "anchor_id": pa.array(np.concatenate([a, b]), pa.int64()),
            "partner": pa.array(np.concatenate([b, a]), pa.int64())})

    pos = pairs.map_batches(sym, batch_format="pyarrow",
                            zero_copy_batch=True) \
        .groupby("anchor_id").aggregate(Min(on="partner",
                                            alias_name="pos_id"))

    m = int(max_id)

    def add_neg(t: pa.Table) -> pa.Table:
        a = t.column("anchor_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        c0 = (sample_hash32(a) % np.uint64(m)).astype(np.int64)
        c = np.where(c0 == a, (c0 + 1) % m, c0)
        lo, hi = np.minimum(a, c), np.maximum(a, c)
        pk = (lo << np.int64(32)) | hi          # ids < 2^31 by contract
        return pa.table({"anchor_id": pa.array(a, pa.int64()),
                         "pos_id": t.column("pos_id"),
                         "neg_id": pa.array(c, pa.int64()),
                         "pk": pa.array(pk, pa.int64())})

    cand = pos.map_batches(add_neg, batch_format="pyarrow",
                           zero_copy_batch=True)

    def pair_key(t: pa.Table) -> pa.Table:
        a = t.column("id_a").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        b = t.column("id_b").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({"pk": pa.array((a << np.int64(32)) | b,
                                        pa.int64())})  # id_a < id_b

    keyed = pairs.map_batches(pair_key, batch_format="pyarrow",
                              zero_copy_batch=True)
    out = hash_join(cand, keyed, key="pk", how="anti",
                    left_cols=[("anchor_id", pa.int64()),
                               ("pos_id", pa.int64()),
                               ("neg_id", pa.int64())], P=P)
    return out.select_columns(["anchor_id", "pos_id", "neg_id"]) \
        .sort("anchor_id")


# ----------------------------------------------------- OOV / vocab coverage

def oov_rate(ds, vocab_size: int = 15, id_col: str = "doc_id",
             text_col: str = "text"):
    """Per-document out-of-vocabulary rate against the corpus' own
    top-``vocab_size`` token vocabulary: ``(doc_id, n_tok, n_oov,
    oov_u)`` with ``oov_u = 1_000_000 * n_oov // n_tok`` (integer-exact
    so the DuckDB oracle reproduces it bit-for-bit; 0 for empty docs).

    The tokenizer-coverage stage of a training-data pipeline: docs
    whose token mass falls outside the working vocabulary are candidate
    rejects (transcoding noise, wrong language, boilerplate markup) —
    the same pre-index hygiene role as kmcp's blacklist regex gate
    (reference: kmcp/cmd/compute.go:248-260, semantics re-derived).

    Shape: one vocabulary-sized ``groupby`` (:func:`vocab_topk` —
    map-combined, shuffle rows = distinct tokens per block), vocabulary
    broadcast once as a sorted u64 hash array (``ray.put``), then a
    single vectorized membership pass (searchsorted + bincount) over
    the corpus.  Nothing but the top-k vocabulary ever lands on the
    driver."""
    vdf = vocab_topk(ds, topk=vocab_size, text_col=text_col).to_pandas()
    vh = np.sort(hashing.hash_strings(
        vdf["token"].to_numpy(dtype=object))) if len(vdf) \
        else np.empty(0, np.uint64)
    ref = ray.put(vh)

    def score(t: pa.Table) -> pa.Table:
        vh = ray.get(ref)
        ids = t.column(id_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        n = len(ids)
        toks, rows, _n = text.tokenize(t.column(text_col))
        n_tok = np.bincount(rows, minlength=n).astype(np.int64) \
            if len(rows) else np.zeros(n, np.int64)
        if len(toks) and len(vh):
            th = hashing.hash_strings(toks)
            pos = np.searchsorted(vh, th)
            inv = vh[np.minimum(pos, len(vh) - 1)] == th
            n_oov = np.bincount(rows[~inv], minlength=n).astype(np.int64)
        else:
            n_oov = n_tok.copy()
        oov_u = np.zeros(n, np.int64)
        nz = n_tok > 0
        oov_u[nz] = np.int64(1_000_000) * n_oov[nz] // n_tok[nz]
        return pa.table({id_col: pa.array(ids, pa.int64()),
                         "n_tok": pa.array(n_tok, pa.int64()),
                         "n_oov": pa.array(n_oov, pa.int64()),
                         "oov_u": pa.array(oov_u, pa.int64())})

    return ds.select_columns([id_col, text_col]) \
        .map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


# ------------------------------------------------- Misra-Gries heavy hitters

def heavy_hitters(ds, k: int = 30, text_col: str = "text"):
    """Exact frequent tokens via a mergeable Misra-Gries candidate pass
    + exact recount: every token whose TRUE occurrence count exceeds
    ``N/(k+1)`` (N = total corpus tokens), with its exact count —
    ``(token, cnt)`` sorted (cnt desc, token asc).

    The two-pass candidate-prune shape that makes heavy hitters exact
    at 100 TB without a corpus-wide vocabulary aggregate: (1) each
    batch summarizes to a decremented MG sketch of at most ``k``
    counters (lower bounds; per-batch undercount <= batch_N/(k+1), so
    summing sketches preserves every global heavy hitter — the
    candidate union is a SUPERSET, at most k rows per block ride the
    shuffle); (2) candidates broadcast as a sorted u64 hash array and
    one vectorized membership recount fixes exact counts, then the
    threshold filters.  Complements the estimate-only sketches
    (:func:`token_cms <kmcp_ray.sketches.token_cms>`, shingle_hll) with
    an exact-guarantee one."""
    from ray.data.aggregate import Sum

    def mg_partial(t: pa.Table) -> pa.Table:
        toks, _rows, _n = text.tokenize(t.column(text_col))
        if len(toks) == 0:
            return pa.table({"token": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64())})
        u, c = np.unique(toks, return_counts=True)
        c = c.astype(np.int64)
        if len(u) > k:
            # decrement by the (k+1)-th largest count: at most k
            # counters stay positive; each survivor undercounts by
            # <= batch_N/(k+1) (the classic MG bound)
            kth = np.partition(c, len(c) - k - 1)[len(c) - k - 1]
            keep = (c - kth) > 0
            u, c = u[keep], c[keep] - kth
        # sentinel row carries the batch's total token count so the
        # global N rides the same vocabulary-sized aggregate ("" is
        # untokenizable, so it never collides with a real token)
        return pa.table({
            "token": pa.array(np.concatenate([u, [""]]), pa.string()),
            "cnt": pa.array(np.concatenate([c, [len(toks)]]), pa.int64())})

    sk = ds.map_batches(mg_partial, batch_format="pyarrow",
                        zero_copy_batch=True) \
        .groupby("token").aggregate(Sum(on="cnt", alias_name="cnt")) \
        .to_pandas()                     # <= k rows per block, merged
    total = int(sk.loc[sk.token == "", "cnt"].sum())
    cand = sk.loc[sk.token != "", "token"].to_numpy(dtype=object)
    if len(cand) == 0 or total == 0:
        return ray.data.from_arrow(pa.table({
            "token": pa.array([], pa.string()),
            "cnt": pa.array([], pa.int64())}))
    ch = np.sort(hashing.hash_strings(cand))
    ref = ray.put(ch)

    def recount(t: pa.Table) -> pa.Table:
        ch = ray.get(ref)
        toks, _rows, _n = text.tokenize(t.column(text_col))
        if len(toks) == 0:
            return pa.table({"token": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64())})
        th = hashing.hash_strings(toks)
        pos = np.searchsorted(ch, th)
        inv = ch[np.minimum(pos, len(ch) - 1)] == th
        u, c = np.unique(toks[inv], return_counts=True)
        return pa.table({"token": pa.array(u, pa.string()),
                         "cnt": pa.array(c.astype(np.int64), pa.int64())})

    exact = ds.map_batches(recount, batch_format="pyarrow",
                           zero_copy_batch=True) \
        .groupby("token").aggregate(Sum(on="cnt", alias_name="cnt"))

    def gate(t: pa.Table) -> pa.Table:   # keep iff cnt*(k+1) > N
        c = t.column("cnt").to_numpy(zero_copy_only=False)
        return t.filter(pa.array(c * (k + 1) > total))

    return exact.map_batches(gate, batch_format="pyarrow",
                             zero_copy_batch=True) \
        .sort(["cnt", "token"], descending=[True, False])


# ------------------------------------------------- skip-gram PMI pairs

def pmi_pairs(ds, *, window: int = 2, min_cnt: int = 5, topk: int = 50,
              text_col: str = "text"):
    """Top-``topk`` skip-gram token pairs by integer-scaled pointwise
    lift: unordered token pairs co-occurring within ``window`` positions
    get ``lift_u = 1_000_000 * cnt * n_pairs // (c_a * c_b)`` (the PMI
    ratio before the log, scaled and floor-divided so the DuckDB oracle
    reproduces every value bit-exactly), filtered to ``cnt >= min_cnt``
    and ordered (lift_u desc, tok_a asc, tok_b asc) — the word2vec /
    collocation-mining data op.

    Shape: one tokenize pass emits per-batch COMBINED pair counts
    (np.unique on the pair-key strings; shuffle rows = distinct pairs
    per block, never occurrences) plus a sentinel row carrying the
    batch's pair total; unigram occurrence counts ride the same
    aggregate as single-token keys.  The merged table is
    distinct-pair-sized and already count-filtered before the final
    sort+limit."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        toks, rows, _n = text.tokenize(t.column(text_col))
        keys = []
        cnts = []
        if len(toks):
            u, c = np.unique(toks, return_counts=True)
            keys.append(u.astype(object))          # unigrams: no space
            cnts.append(c.astype(np.int64))
            npairs = 0
            for d in range(1, window + 1):
                if len(toks) <= d:
                    break
                same = rows[d:] == rows[:-d]
                a, b = toks[:-d][same], toks[d:][same]
                lo = np.where(a <= b, a, b)
                hi = np.where(a <= b, b, a)
                pk = lo + " "
                pk = pk + hi                        # "lo hi" pair key
                u, c = np.unique(pk, return_counts=True)
                keys.append(u.astype(object))
                cnts.append(c.astype(np.int64))
                npairs += int(same.sum())
            keys.append(np.array([" "], dtype=object))   # sentinel
            cnts.append(np.array([npairs], dtype=np.int64))
        if not keys:
            return pa.table({"key": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64())})
        return pa.table({
            "key": pa.array(np.concatenate(keys), pa.string()),
            "cnt": pa.array(np.concatenate(cnts), pa.int64())})

    merged = ds.map_batches(partial, batch_format="pyarrow",
                            zero_copy_batch=True) \
        .groupby("key").aggregate(Sum(on="cnt", alias_name="cnt"))

    # split the merged table: unigram counts + the pair-total sentinel
    # are vocabulary-sized — they broadcast; pairs stay distributed
    def only_uni(t: pa.Table) -> pa.Table:
        m = pc.or_(pc.equal(pc.count_substring(t.column("key"), " "), 0),
                   pc.equal(t.column("key"), " "))
        return t.filter(m)

    udf = merged.map_batches(only_uni, batch_format="pyarrow",
                             zero_copy_batch=True).to_pandas()
    n_pairs = int(udf.loc[udf.key == " ", "cnt"].sum())
    uv = udf.loc[udf.key != " "]
    uh = hashing.hash_strings(uv["key"].to_numpy(dtype=object))
    order = np.argsort(uh)
    ref = ray.put((uh[order],
                   uv["cnt"].to_numpy().astype(np.int64)[order]))

    def score(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater(pc.count_substring(t.column("key"), " "),
                               0),
                    pc.not_equal(t.column("key"), " "))
        m = pc.and_(m, pc.greater_equal(t.column("cnt"),
                                        pa.scalar(min_cnt, pa.int64())))
        t = t.filter(m)
        if t.num_rows == 0 or n_pairs == 0:
            return pa.table({"tok_a": pa.array([], pa.string()),
                             "tok_b": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64()),
                             "lift_u": pa.array([], pa.int64())})
        cnt = t.column("cnt").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        parts = pc.split_pattern(t.column("key"), " ")
        a = pc.list_element(parts, 0).to_numpy(zero_copy_only=False)
        b = pc.list_element(parts, 1).to_numpy(zero_copy_only=False)
        kh, vals = ray.get(ref)
        ca = vals[np.searchsorted(kh, hashing.hash_strings(a))]
        cb = vals[np.searchsorted(kh, hashing.hash_strings(b))]
        # 1e6 * cnt * n_pairs wraps int64 once n_pairs approaches ~1e12
        # (corpus skip-gram total at 100 TB scale) while the DuckDB
        # oracle promotes to HUGEINT — so guard the fast int64 path and
        # fall back to exact arbitrary-precision integers (numpy object
        # math == Python ints, still elementwise-vectorized).  The
        # RESULT must fit int64 (lift_u ≤ 1e6·n_pairs/max(ca,cb)); if a
        # degenerate corpus exceeds that, pa.array raises rather than
        # silently wrapping.
        if (int(cnt.max(initial=0)) * n_pairs < (1 << 63) // 1_000_000
                and int(ca.max(initial=0)) * int(cb.max(initial=0))
                < (1 << 63)):
            lift = np.int64(1_000_000) * cnt * np.int64(n_pairs) \
                // (ca * cb)
        else:
            lift = (1_000_000 * cnt.astype(object) * n_pairs
                    // (ca.astype(object) * cb.astype(object))) \
                .astype(np.int64)
        return pa.table({"tok_a": pa.array(a, pa.string()),
                         "tok_b": pa.array(b, pa.string()),
                         "cnt": pa.array(cnt, pa.int64()),
                         "lift_u": pa.array(lift, pa.int64())})

    return merged.map_batches(score, batch_format="pyarrow",
                              zero_copy_batch=True) \
        .sort(["lift_u", "tok_a", "tok_b"],
              descending=[True, False, False]).limit(topk)


# --------------------------------------------- boilerplate line removal

def boilerplate_dedup(ds, w: int = 2, min_docs: int = 12,
                      id_col: str = "doc_id", text_col: str = "text",
                      num_partitions: int = 64,
                      broadcast_blocked_rows: int = 5_000_000):
    """CCNet-style boilerplate-line removal: the corpus is cut into
    non-overlapping ``w``-token lines and every line whose content
    appears in at least ``min_docs`` DISTINCT documents is deleted from
    ALL of them (unlike :func:`span_dedup`'s first-occurrence-wins C4
    rule, frequency-boilerplate dies everywhere — headers, cookie
    banners, navigation chrome).  Emits ``(doc_id, clean_text,
    n_lines_removed)``; trailing ``len % w`` tokens always survive.

    Shape: pass 1 ships 12 B rows (u64 line hash, i64 doc id, distinct
    per doc per batch — map-side combined) into one count-distinct
    ``groupby``; the blocked set (frequency-bounded: at most
    N/(w*min_docs) lines can qualify) broadcasts as a sorted u64 array
    and pass 2 rebuilds each doc inline in one vectorized membership
    sweep — no second shuffle.  Past ``broadcast_blocked_rows`` the
    removed OCCURRENCES are computed distributed (semi-join of line
    hashes against the blocked set) and docs rebuild through the same
    hash(doc_id) exchange as :func:`span_dedup`
    (:func:`_exchange_rebuild`)."""
    from ray.data.aggregate import Count

    P = num_partitions

    def line_docs(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        _f, _r, _s, h, _packed, win_row = _doc_windows(
            ids, t.column(text_col), w)
        if len(h) == 0:
            return pa.table({"h": pa.array([], pa.int64())})
        order = np.lexsort((h, win_row))
        hs, rs = h[order], win_row[order]
        first = np.concatenate(([True], (hs[1:] != hs[:-1])
                                | (rs[1:] != rs[:-1])))
        return pa.table({"h": pa.array(hs[first].view(np.int64),
                                       pa.int64())})

    def freq_gate(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater_equal(
            t.column("ndocs"), pa.scalar(min_docs, pa.int64()))) \
            .select(["h"])

    blocked = ds.select_columns([id_col, text_col]) \
        .map_batches(line_docs, batch_format="pyarrow",
                     zero_copy_batch=True) \
        .groupby("h").aggregate(Count(alias_name="ndocs")) \
        .map_batches(freq_gate, batch_format="pyarrow",
                     zero_copy_batch=True).materialize()
    n_blocked = blocked.count()

    if n_blocked <= broadcast_blocked_rows:
        chunks = [np.empty(0, np.int64)]
        for b in blocked.iter_batches(batch_size=1 << 18,
                                      batch_format="pyarrow"):
            chunks.append(b.column("h").to_numpy(zero_copy_only=False))
        bh = np.sort(np.concatenate(chunks).view(np.uint64))
        ref = ray.put(bh)

        def rebuild(t: pa.Table) -> pa.Table:
            bh = ray.get(ref)
            ids = t.column(id_col).to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            n = len(ids)
            flat, rows, row_starts, h, _p, win_row = _doc_windows(
                ids, t.column(text_col), w)
            keep_tok = np.ones(len(flat), dtype=bool)
            nrem = np.zeros(n, dtype=np.int64)
            if len(h) and len(bh):
                pos = np.searchsorted(bh, h)
                hit = bh[np.minimum(pos, len(bh) - 1)] == h
                if hit.any():
                    wr = win_row[hit]
                    widx = np.nonzero(hit)[0] \
                        - np.searchsorted(win_row, wr)
                    kill = (row_starts[wr] + w * widx)[:, None] \
                        + np.arange(w, dtype=np.int64)[None, :]
                    keep_tok[kill.ravel()] = False
                    nrem += np.bincount(wr, minlength=n)
            toks, trows = flat[keep_tok], rows[keep_tok]
            bounds = np.searchsorted(trows, np.arange(n + 1))
            clean = np.array([" ".join(toks[a:b])
                              for a, b in zip(bounds[:-1], bounds[1:])],
                             dtype=object)
            return pa.table({id_col: pa.array(ids, pa.int64()),
                             "clean_text": pa.array(clean, pa.string()),
                             "n_lines_removed": pa.array(nrem, pa.int64())})

        return ds.select_columns([id_col, text_col]) \
            .map_batches(rebuild, batch_format="pyarrow",
                         zero_copy_batch=True)

    # distributed arm: removed occurrences via semi-join on the line
    # hash, then the shared hash(doc_id) exchange rebuild
    from kmcp_ray.joins import hash_join

    def win_keys(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        _f, _r, _s, h, packed, _wr = _doc_windows(
            ids, t.column(text_col), w)
        return pa.table({"h": pa.array(h.view(np.int64), pa.int64()),
                         "packed": pa.array(packed, pa.int64())})

    wins = ds.select_columns([id_col, text_col]) \
        .map_batches(win_keys, batch_format="pyarrow",
                     zero_copy_batch=True)
    removed = hash_join(wins, blocked, key="h", how="semi",
                        left_cols=[("packed", pa.int64())], P=P) \
        .select_columns(["packed"])
    return _exchange_rebuild(ds, removed, w, id_col, text_col, P,
                             cnt_col="n_lines_removed")


# ---------------------------------------------------- curriculum order

def curriculum_order(ds, source_col: str = "source",
                     key_col: str = "n_chars", id_col: str = "doc_id"):
    """Deterministic curriculum training order: docs rank easy→hard
    (``key_col`` asc, id asc) WITHIN each source, then sources
    interleave round-robin — global position = rank under the
    lexicographic key ``(r, source)``.  Emits ``(doc_id, source, r,
    pos)``; reproducible across runs and cluster sizes, SQL-mirrorable
    (two ROW_NUMBERs), auditable like :func:`global_shuffle`.

    Shape: ONE groupby(source) ranks in-group (vectorized argsort);
    the global interleave position needs NO second shuffle — with the
    per-source size table broadcast (#sources rows), the rank of
    ``(r, s)`` has the closed form ``Σ_{s'} min(size_{s'}, r) +
    #{s' < s : size_{s'} > r}``, evaluated per batch as one
    clip-matmul against the size vector.  Assumes a source's rows fit
    one ``map_groups`` group (compose with the prefix-sum rank of
    ``global_shuffle`` per source past that)."""
    from ray.data.aggregate import Count

    sizes = ds.groupby(source_col).aggregate(
        Count(alias_name="n")).to_pandas().sort_values(source_col)
    src = sizes[source_col].to_numpy(dtype=object)
    n_s = sizes["n"].to_numpy().astype(np.int64)
    sh = hashing.hash_strings(src)
    order = np.argsort(sh)
    # src sorted lexicographically for the "< s" term; hash-sorted for
    # the per-batch lookup
    lex_rank = np.empty(len(src), np.int64)
    lex_rank[np.argsort(src)] = np.arange(len(src))
    ref = ray.put((sh[order], lex_rank[order], n_s[order],
                   n_s[np.argsort(src)]))

    def rank_group(g: pa.Table) -> pa.Table:
        ids = g.column(id_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        k = g.column(key_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        o = np.lexsort((ids, k))
        r = np.empty(len(ids), np.int64)
        r[o] = np.arange(len(ids), dtype=np.int64)
        sh_s, lex_s, _n_s, n_lex = ray.get(ref)
        s = g.column(source_col)
        h = hashing.hash_strings(
            s.to_numpy(zero_copy_only=False).astype(object))
        pos_i = np.searchsorted(sh_s, h)
        my_lex = lex_s[pos_i]
        # closed-form global rank of (r, source):
        #   sum_s' min(size_s', r)  +  #{s' <lex s : size_s' > r}
        # evaluated via searchsorted over the SORTED size vector —
        # O(rows log sources), no dense (rows x sources) intermediate:
        #   sum min(size, r) = prefix_sum(sizes <= r) + r * #(sizes > r)
        ss = np.sort(n_lex)
        ps = np.concatenate(([0], np.cumsum(ss)))
        c = np.searchsorted(ss, r, side="right")
        below = ps[c] + r * (len(ss) - c)
        # map_groups is per source, so my_lex is one value per group in
        # practice; the unique-loop keeps mixed batches correct anyway
        ties = np.empty(len(r), np.int64)
        for ml in np.unique(my_lex):
            m = my_lex == ml
            pre = np.sort(n_lex[:ml])
            ties[m] = ml - np.searchsorted(pre, r[m], side="right")
        pos = below + ties
        return pa.table({id_col: pa.array(ids, pa.int64()),
                         source_col: s,
                         "r": pa.array(r, pa.int64()),
                         "pos": pa.array(pos, pa.int64())})

    return ds.select_columns([id_col, source_col, key_col]) \
        .groupby(source_col).map_groups(rank_group,
                                        batch_format="pyarrow")
