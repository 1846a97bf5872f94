"""Long-document chunk slider + multi-k search fallback.

kmcp splits every reference genome into ``n`` overlapping windows whose
identity is (name, chunkIdx, idxNum) so short queries hit the right
region and per-chunk coverage drives profiling (reference:
kmcp/cmd/compute.go:677-744); at search time it retries smaller k sizes
for queries that found nothing (util-db-search.go:764-1024).  Here:

- :func:`chunk_slider` — flat_map one document row into overlapping
  token-window chunk rows ``(id, chunk_idx, n_chunks, text)``; chunk
  ids encode identity as ``"{id}#{chunk_idx}/{n_chunks}"``.
- :func:`split_chunk_col` — parse that identity back into columns
  (feeds profile_em's chunk-aware aggregation).
- :func:`search_multi_k` — search at the largest k, re-query only the
  zero-hit queries at each smaller k (anti-join via the partitioned
  lookup join; no broadcast of matched-query sets).
- :func:`longdoc_overlap_pairs` — chunk both sides, containment-search
  chunks vs chunks, aggregate chunk hits per (doc_a, doc_b): detects
  partial overlaps whole-document sketches miss.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import pyarrow as pa

from kmcp_ray.config import DedupConfig


def chunk_slider_batch(batch: pa.Table, *, id_col: str, text_col: str,
                       chunk_tokens: int, overlap: int) -> pa.Table:
    """One batch → chunk rows.  n_chunks = ceil((T - l) / (s - l))
    (kmcp compute.go:677-701 chunk-count math, re-derived for token
    windows; no circular wraparound — documents aren't plasmids).
    Chunk text is the token window joined by single spaces (shingle
    semantics are whitespace-insensitive, so sketches are identical)."""
    import pandas as pd
    from kmcp_ray.text import tokenize
    s, l = chunk_tokens, overlap
    step = max(1, s - l)
    flat_tokens, row_ids, n = tokenize(batch.column(text_col))
    ids = batch.column(id_col).to_numpy(zero_copy_only=False)
    if ids.dtype != object:
        ids = ids.astype(str).astype(object)
    n_tok = np.bincount(row_ids, minlength=n) if len(row_ids) \
        else np.zeros(n, np.int64)
    row_start = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(n_tok, out=row_start[1:])
    n_chunks = np.maximum(1, np.ceil(np.maximum(n_tok - l, 1)
                                     / step).astype(np.int64))
    n_chunks[n_tok == 0] = 1

    # flatten: one output row per (doc, chunk)
    out_doc = np.repeat(np.arange(n), n_chunks)
    chunk_idx = np.concatenate([np.arange(c) for c in n_chunks]) \
        if n else np.empty(0, np.int64)
    starts = row_start[out_doc] + chunk_idx * step
    ends = np.minimum(starts + s, row_start[out_doc + 1])
    lens = np.maximum(ends - starts, 0)
    from kmcp_ray.bands import _segment_gather
    gather = _segment_gather(starts, lens)
    chunk_of_token = np.repeat(np.arange(len(out_doc)), lens)
    toks = flat_tokens[gather] if len(gather) else np.empty(0, object)
    joined = pd.Series(toks).groupby(chunk_of_token).agg(" ".join) \
        if len(toks) else pd.Series(dtype=object)
    texts = np.full(len(out_doc), "", dtype=object)
    if len(joined):
        texts[joined.index.to_numpy()] = joined.to_numpy()
    nc = n_chunks[out_doc]
    cids = np.array([f"{ids[d]}#{c}/{t}" for d, c, t in
                     zip(out_doc, chunk_idx, nc)], dtype=object)
    return pa.table({
        "chunk_id": pa.array(cids, pa.string()),
        id_col: pa.array(ids[out_doc], pa.string()),
        "chunk_idx": pa.array(chunk_idx.astype(np.int32), pa.int32()),
        "n_chunks": pa.array(nc.astype(np.int32), pa.int32()),
        text_col: pa.array(texts, pa.string())})


def chunk_slider(ds, *, id_col="doc_id", text_col="text",
                 chunk_tokens: int = 128, overlap: int = 16):
    return ds.map_batches(
        lambda b: chunk_slider_batch(b, id_col=id_col, text_col=text_col,
                                     chunk_tokens=chunk_tokens,
                                     overlap=overlap),
        batch_format="pyarrow", zero_copy_batch=True)


def split_chunk_col(matches, col: str = "target"):
    """'id#c/n' chunk identities → plain ``col`` + chunk/nchunk columns
    (the (chunkIdx, idxNum) decode, kmcp search.go:532-533 analogue)."""
    import pyarrow.compute as pc

    def fn(batch: pa.Table) -> pa.Table:
        v = batch.column(col)
        doc = pc.replace_substring_regex(v, pattern="#.*$", replacement="")
        chunk = pc.cast(pc.replace_substring_regex(
            v, pattern="^.*#|/.*$", replacement=""), pa.int32())
        nch = pc.cast(pc.replace_substring_regex(
            v, pattern="^.*/", replacement=""), pa.int32())
        out = batch.drop_columns([col])
        return out.append_column(col, doc) \
            .append_column("chunk", chunk) \
            .append_column("nchunk", nch)
    return matches.map_batches(fn, batch_format="pyarrow",
                               zero_copy_batch=True)


def search_multi_k(query_ds, ref_ds, cfg: DedupConfig = DedupConfig(), *,
                   ks=(5, 3, 2), query_id="doc_id", query_text="text",
                   ref_id="doc_id", ref_text="text", **search_kw):
    """Search at ks[0]; queries with zero matches retry at each smaller
    k (kmcp's multi-k fallback, util-db-search.go:764-1024 semantics
    re-derived).  Output gains a ``k`` column.  The remaining-query set
    shrinks via a partitioned anti-join — never a driver collect."""
    import pyarrow.compute as pc
    from kmcp_ray.exchange import join_lookup
    from kmcp_ray.search import search

    remaining = query_ds
    out = None
    for i, k in enumerate(ks):
        res = search(remaining, ref_ds, dataclasses.replace(cfg, shingle_k=k),
                     query_id=query_id, query_text=query_text,
                     ref_id=ref_id, ref_text=ref_text, **search_kw) \
            .map_batches(lambda t, kk=k: t.append_column(
                "k", pa.array(np.full(t.num_rows, kk, np.int64))),
                batch_format="pyarrow", zero_copy_batch=True)
        res = res.materialize()      # consumed twice: output + anti-join
        out = res if out is None else out.union(res)
        if i == len(ks) - 1:
            break
        matched = res.map_batches(
            lambda t: pa.table({"node": t.column("query"),
                                "label": t.column("query")}),
            batch_format="pyarrow", zero_copy_batch=True)

        def to_str(batch: pa.Table, qc=query_id) -> pa.Table:
            v = batch.column(qc)
            if not pa.types.is_string(v.type if not isinstance(
                    v, pa.ChunkedArray) else v.type):
                v = v.cast(pa.string())
            return batch.set_column(batch.column_names.index(qc), qc, v)
        probe = remaining.map_batches(to_str, batch_format="pyarrow",
                                      zero_copy_batch=True)
        flagged = join_lookup(probe, query_id, matched, "node", "label",
                              cfg.num_partitions, out_col="_hit")
        # join_lookup only carries the key; re-attach texts by keeping
        # unmatched keys and joining back against the query table
        unmatched_keys = flagged.map_batches(
            lambda t: t.filter(pc.is_null(t["_hit"]))
                       .select([query_id]),
            batch_format="pyarrow", zero_copy_batch=True)
        kv_text = probe.map_batches(
            lambda t: pa.table({"node": t.column(query_id),
                                "label": t.column(query_text)}),
            batch_format="pyarrow", zero_copy_batch=True)
        remaining = join_lookup(unmatched_keys, query_id, kv_text,
                                "node", "label", cfg.num_partitions,
                                out_col=query_text).materialize()
        if remaining.count() == 0:
            break
    return out


def longdoc_overlap_pairs(ds, cfg: DedupConfig = DedupConfig(), *,
                          id_col="doc_id", text_col="text",
                          chunk_tokens: int = 128,
                          min_qcov: float = 0.8, min_shared: int = 4,
                          min_chunk_hits: int = 1):
    """Partial-overlap detection whole-document sketches miss: chunk
    every document, containment-search QUERY chunks against REF chunks,
    and aggregate matched chunks per (doc_a < doc_b) pair.

    Chunk geometry (the kmcp short-reads-vs-long-ref-chunks shape):
    reference chunks of ``chunk_tokens`` overlap by HALF, so any token
    run of ≤ chunk_tokens/2 lies wholly inside one ref chunk; query
    chunks are that half size (overlapping by a quarter), so a planted
    contiguous slice always produces query chunks with qcov ≈ 1 against
    a single ref chunk — alignment can never split the coverage."""
    import pyarrow.compute as pc
    from kmcp_ray.exchange import count_pairs
    from kmcp_ray.search import search

    q_tokens = max(8, chunk_tokens // 2)
    ref_chunks = chunk_slider(ds, id_col=id_col, text_col=text_col,
                              chunk_tokens=chunk_tokens,
                              overlap=chunk_tokens // 2)
    q_chunks = chunk_slider(ds, id_col=id_col, text_col=text_col,
                            chunk_tokens=q_tokens, overlap=q_tokens // 2)
    matches = search(q_chunks, ref_chunks, cfg, query_id="chunk_id",
                     query_text=text_col, ref_id="chunk_id",
                     ref_text=text_col, min_qcov=min_qcov,
                     min_shared=min_shared)

    def to_doc_pairs(batch: pa.Table) -> pa.Table:
        q = batch.column("query").to_numpy(zero_copy_only=False)
        t = batch.column("target").to_numpy(zero_copy_only=False)
        qd = np.array([s.split("#", 1)[0] for s in q], dtype=object)
        td = np.array([s.split("#", 1)[0] for s in t], dtype=object)
        keep = qd != td
        lo = np.minimum(qd[keep], td[keep])
        hi = np.maximum(qd[keep], td[keep])
        return pa.table({"id_a": pa.array(lo, pa.string()),
                         "id_b": pa.array(hi, pa.string())})

    pairs = matches.map_batches(to_doc_pairs, batch_format="pyarrow",
                                zero_copy_batch=True)
    counted = count_pairs(pairs, cfg.num_partitions, "id_a", "id_b",
                          count_name="chunk_hits")
    return counted.map_batches(
        lambda t: t.filter(pc.greater_equal(t["chunk_hits"],
                                            pa.scalar(min_chunk_hits))),
        batch_format="pyarrow", zero_copy_batch=True)
