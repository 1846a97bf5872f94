"""Training-data corpus funnel: quality gate → language ID → exact
dedup → per-language corpus stats, as ONE streaming composition.

The 100 TB shape (this is the point of the module):

1. gate+hash+count run FUSED over the read — quality score, content
   hash, whitespace-token count computed per batch, sub-threshold rows
   dropped, and ``text`` PROJECTED OUT in the same fused task chain, so
   document payloads never enter the object store.
2. the only wide exchange is the dedup groupby over ~40 B/row
   (id, hash, lang, count) survivors — never text.
3. the result is a tiny per-language table.

Every stage reuses an independently oracle-green operator
(quality_score / lang_id / exact_dedup semantics), so the composition
has a closed-form SQL oracle too (kmcp analogue: the compute→search→
profile funnel, reference kmcp/cmd/profile.go:24-47 stage economics —
semantics re-derived, not ported).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from kmcp_ray import hashing
from kmcp_ray.textops import LangIdStage, _WS_RE, quality_score_batch


def corpus_funnel(ds, min_quality_u: int = 300000, *, id_col="doc_id",
                  text_col="text", num_partitions: int = 64,
                  lang_concurrency: int = 4):
    """(lang_pred, n_docs, n_tokens) over quality-gated, exactly
    deduplicated documents — duplicates keep only the min-id copy.

    Quality and language are functions of the text, so gating before
    dedup and after dedup agree; gating first drops payload earliest.
    """

    def gate(batch: pa.Table) -> pa.Table:
        q = quality_score_batch(batch, id_col=id_col, text_col=text_col)
        qu = q.column("quality_u")
        texts_col = pc.fill_null(batch.column(text_col), "")
        n_ws = pc.cast(pc.count_substring_regex(texts_col, pattern=_WS_RE),
                       pa.int64())
        texts = texts_col.to_numpy(zero_copy_only=False)
        th = hashing.hash_strings(texts)
        part = (th % np.uint64(num_partitions)).astype(np.int64)
        t = pa.table({id_col: batch.column(id_col),
                      text_col: batch.column(text_col),
                      "th": pa.array(th, pa.uint64()),
                      "part": pa.array(part, pa.int64()),
                      "n_ws_tokens": n_ws,
                      "quality_u": qu})
        return t.filter(pc.greater_equal(qu, min_quality_u))

    gated = ds.map_batches(gate, batch_format="pyarrow",
                           zero_copy_batch=True)
    # lang tagging appends, then text is dropped INSIDE the fused chain
    tagged = gated.map_batches(
        LangIdStage,
        fn_constructor_kwargs={"id_col": id_col, "text_col": text_col,
                               "append": True},
        # autoscaling pool (1..N): a fixed-size pool equal to the
        # session's CPU count pins every core and starves the downstream
        # groupby tasks (observed deadlock at num_cpus=4)
        batch_format="pyarrow", concurrency=(1, lang_concurrency),
        batch_size=4096) \
        .select_columns([id_col, "th", "part", "n_ws_tokens", "lang_pred"])

    def dedup_partition(batch: pa.Table) -> pa.Table:
        th = batch.column("th").to_numpy(zero_copy_only=False).astype(np.uint64)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        if len(th) == 0:
            return pa.table({"lang_pred": pa.array([], pa.string()),
                             "n_ws_tokens": pa.array([], pa.int64())})
        order = np.lexsort((ids, th))
        th_s = th[order]
        first = np.concatenate(([True], th_s[1:] != th_s[:-1]))
        keep = order[first]                     # min-id row per text hash
        return batch.take(pa.array(keep)).select(
            ["lang_pred", "n_ws_tokens"])

    survivors = tagged.groupby("part").map_groups(dedup_partition,
                                                  batch_format="pyarrow")
    from ray.data.aggregate import Count, Sum
    out = survivors.groupby("lang_pred").aggregate(
        Count(alias_name="n_docs"),
        Sum("n_ws_tokens", alias_name="n_tokens"))
    return out.sort("lang_pred")
