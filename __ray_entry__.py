"""Driver contract for the kmcp_ray graft (Ray Data target).

The driver initialises Ray itself before importing this module; nothing
here (nor in kmcp_ray) calls ``ray.init``/``ray.shutdown``.

- ``entry()``  — flagship near-dup pipeline on a deterministic synthetic
  image+caption corpus seeded from /root/testdata/sf0.001 documents.
- ``queries()`` — one callable per implemented operator (SURVEY.md §2);
  each takes ``sf_dir`` and returns a Dataset / DataFrame / Table.
- ``oracle_sql()`` — DuckDB-equivalent SQL per entry, including the
  dedup-family cluster closures (recursive CTE), the SimHash/winnowing
  md5-variant mirrors and the lgamma binomial-tail FPR gate; only
  genuinely non-SQL ops (LSH-cosine recall path, EM iterations, image
  decode) stay rows+pytest-checked.

Column-name + float-parity rules: aggregates are integer units
(floor(x*100)) and every computed column is aliased identically in the
Ray code and the SQL.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

import numpy as np

import os as _os

#: golden-output directory for the image-stage oracles (absolute so the
#: DuckDB SQL works from any driver cwd)
_GOLDEN_DIR = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                            "tests", "golden")


def _docs(sf_dir: str):
    return _read(sf_dir, "documents")


def _read(sf_dir: str, name: str, columns=None):
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data
    path = f"{sf_dir}/{name}.parquet"
    # pass an explicit metadata-free (projected) schema: the testdata
    # files carry a pandas-metadata blob that makes hash(pa.Schema)
    # raise, so every read would log Ray's "Failed to hash the schemas"
    # warning on each block-schema dedup
    full = pq.read_schema(path).remove_metadata()
    schema = pa.schema([full.field(c) for c in columns]) if columns else full
    return ray.data.read_parquet(path, columns=columns, schema=schema)


def _finalize_matches(out, drop_self: bool = True):
    """Match table → integer-ized score columns (micro units) sorted by
    (query, target) — float qcov/tcov/jacc hash unreliably in the
    driver's value compare, int64 floors don't."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def finalize(t: pa.Table) -> pa.Table:
        q = t.column("query").to_numpy(zero_copy_only=False)
        tg = t.column("target").to_numpy(zero_copy_only=False)
        keep = (q != tg) if drop_self else np.ones(len(q), bool)
        c = t.column("m_shared").to_numpy(zero_copy_only=False)[keep]
        kq = t.column("q_kept").to_numpy(zero_copy_only=False)[keep]
        kt = t.column("t_kept").to_numpy(zero_copy_only=False)[keep]
        return pa.table({
            "query": pa.array(q[keep], pa.string()),
            "target": pa.array(tg[keep], pa.string()),
            "m_shared": pa.array(c.astype(np.int64), pa.int64()),
            "q_kept": pa.array(kq.astype(np.int64), pa.int64()),
            "t_kept": pa.array(kt.astype(np.int64), pa.int64()),
            "qcov_u": pa.array(np.floor(1000000.0 * c / kq)
                               .astype(np.int64), pa.int64()),
            "tcov_u": pa.array(np.floor(1000000.0 * c / kt)
                               .astype(np.int64), pa.int64()),
            "jacc_u": pa.array(np.floor(1000000.0 * c / (kq + kt - c))
                               .astype(np.int64), pa.int64())})
    return out.map_batches(finalize, batch_format="pyarrow",
                           zero_copy_batch=True).sort(["query", "target"])


# --------------------------------------------------------------- flagship

def entry() -> Any:
    """Near-dup detection + clustering over a synthetic image+caption
    corpus whose captions are seeded from the sf0.001 documents table."""
    import pyarrow.parquet as pq
    import ray.data

    from kmcp_ray.config import DedupConfig
    from kmcp_ray.pipeline import dedup_pipeline
    from kmcp_ray import testgen

    texts = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                          columns=["text"]).column("text").to_pylist()
    cfg = DedupConfig(num_partitions=16)
    table, _planted, _neg = testgen.make_pairs_corpus(
        n=800, seed=42, cfg=cfg, captions=texts)
    res = dedup_pipeline(ray.data.from_arrow(table), cfg)
    return res.assignments


# ---------------------------------------------------------------- queries

def queries() -> dict[str, Callable[[str], Any]]:
    import dataclasses

    from kmcp_ray import ann, docs_dedup, relops, textops
    from kmcp_ray.config import DedupConfig

    cfg = DedupConfig(num_partitions=16)
    # Exhaustive/exact configuration for the SQL-oracled dedup entries:
    # bucket_scale=1 + min_containment_shingles=1 make the containment
    # generator emit EVERY shingle as a bucket key (candidate recall 1
    # for any pair sharing >=1 shingle — kmcp's exact k-mer containment
    # mode), verify_k -> inf verifies on full distinct shingle sets, and
    # the skew caps are lifted so no deterministic truncation diverges
    # from the closed-form SQL predicate.  Production-scale runs keep
    # the default sampled config; this one IS the driver-verifiable
    # exact mode (same code path, different knobs).
    ex_cfg = dataclasses.replace(
        cfg, bucket_scale=1, verify_k=1 << 30, min_containment_shingles=1,
        max_shingle_df=1 << 30, max_bucket=1 << 30)

    def q_exact_dedup(sf):
        return docs_dedup.exact_dedup(_docs(sf), num_partitions=16)

    def q_token_count(sf):
        return textops.token_count(_docs(sf))

    def q_token_stats(sf):
        """Whitespace + BPE-ish-pretokenizer token counts; both sides
        run the same RE2 pattern (pyarrow and DuckDB both embed RE2),
        so the oracle is byte-exact including unicode classes."""
        return textops.token_stats(_docs(sf))

    def q_doc_stats(sf):
        return textops.doc_stats(_docs(sf))

    def q_lang_source_agg(sf):
        # deterministic total order + int64 dtypes: the driver's value
        # hash is order- and dtype-sensitive (r1 lesson)
        return relops.lang_source_agg(
            _read(sf, "documents", columns=["lang", "source", "n_chars"])) \
            .sort(["lang", "source"])

    def q_events_type_agg(sf):
        return relops.events_type_agg(
            _read(sf, "events", columns=["event_type", "value"])) \
            .sort("event_type")

    def q_events_hourly_user(sf):
        return relops.events_hourly_user(
            _read(sf, "events", columns=["user_id", "ts", "value"])) \
            .sort(["user_id", "hour_id"])

    def q_lineitem_pricing(sf):
        return relops.lineitem_pricing(_read(sf, "lineitem", columns=[
            "l_returnflag", "l_linestatus", "l_quantity",
            "l_extendedprice", "l_discount"])) \
            .sort(["l_returnflag", "l_linestatus"])

    def q_top_docs(sf):
        return relops.top_docs_by_len(
            _read(sf, "documents", columns=["doc_id", "n_chars", "lang"]))

    def q_cov2simi(sf):
        ds = relops.cov2simi(_read(sf, "lineitem", columns=[
            "l_orderkey", "l_linenumber", "l_discount"]), col="l_discount")
        return ds.select_columns(["l_orderkey", "l_linenumber", "simi_u"])

    def q_ann_topk(sf):
        import pyarrow.parquet as pq
        emb = pq.read_table(f"{sf}/embeddings.parquet",
                            columns=["vec_id", "embedding"])
        ids = emb.column("vec_id").to_numpy().astype(np.int64)
        mask = ids < 8
        mat = np.stack([np.asarray(v, dtype=np.float64)
                        for v in emb.column("embedding").to_pylist()])
        ds = _read(sf, "embeddings", columns=["vec_id", "embedding"])
        return ann.topk_cosine(ds, (ids[mask], mat[mask]), k=5)

    def q_ann_ivf_topk(sf):
        """IVF scale path, driven end-to-end at nprobe == nlist where
        its output is provably exact (every list probed) — the
        assign/probe/partial-topk plumbing is what the oracle checks;
        recall at nprobe < nlist is measured in tests/test_ann.py."""
        import pyarrow.parquet as pq
        emb = pq.read_table(f"{sf}/embeddings.parquet",
                            columns=["vec_id", "embedding"])
        ids = emb.column("vec_id").to_numpy().astype(np.int64)
        mask = (ids >= 8) & (ids < 16)
        mat = np.stack([np.asarray(v, dtype=np.float64)
                        for v in emb.column("embedding").to_pylist()])
        ds = _read(sf, "embeddings", columns=["vec_id", "embedding"])
        return ann.ivf_topk(ds, (ids[mask], mat[mask]), k=5,
                            nlist=16, nprobe=16)

    def q_ann_ivf_persisted(sf):
        """Persisted IVF index: write hive-partitioned by list_id +
        centroid sidecars, then search with path-level partition
        pruning — at nprobe == nlist every list is probed so the result
        is provably exact (same oracle as ann_ivf_topk); the pruned-read
        economics are asserted in tests/test_ann.py."""
        import pyarrow.parquet as pq
        import tempfile
        emb = pq.read_table(f"{sf}/embeddings.parquet",
                            columns=["vec_id", "embedding"])
        ids = emb.column("vec_id").to_numpy().astype(np.int64)
        mask = (ids >= 8) & (ids < 16)
        mat = np.stack([np.asarray(v, dtype=np.float64)
                        for v in emb.column("embedding").to_pylist()])
        ds = _read(sf, "embeddings", columns=["vec_id", "embedding"])
        idx = tempfile.mkdtemp(prefix="kmcp_ivf_idx_", dir="/tmp")
        ann.write_ivf_index(ds, idx, nlist=16)
        return ann.search_ivf_index(idx, (ids[mask], mat[mask]), k=5,
                                    nprobe=16)

    def q_embedding_pairs(sf):
        ds = _read(sf, "embeddings", columns=["vec_id", "embedding"])
        return ann.cosine_pairs(ds, 0.4).select_columns(["id_a", "id_b"])

    def q_embedding_dedup(sf):
        """Embedding-cosine near-dup clustering: exact pairs at 0.4 →
        spanning forest → union-find → min-id cluster labels over every
        vector; oracle = recursive-CTE transitive closure."""
        ds = _read(sf, "embeddings", columns=["vec_id", "embedding"])
        return ann.embedding_dedup(ds, 0.4)

    def q_minhash_dedup(sf):
        """Full MinHash-LSH + containment dedup pipeline in exact mode
        (ex_cfg): verified edges == the closed-form jacc/containment
        predicate, so cluster assignments equal the SQL transitive
        closure exactly."""
        return docs_dedup.minhash_dedup(_docs(sf), ex_cfg)

    def q_simhash_dedup(sf):
        """SimHash-64 + Hamming-chunk banding over an md5-derived
        shingle simhash (SQL-computable token/shingle hash; the
        production SipHash default is pytest-covered): pigeonhole-exact
        candidates + in-bucket Hamming verify ⇒ clusters equal the SQL
        hamming<=radius closure."""
        return docs_dedup.simhash_dedup(_docs(sf), ex_cfg,
                                        token_hash="md5")

    def q_hamming_topk(sf):
        """Hamming top-k retrieval over 64-bit content codes — the
        phash near-dup RETRIEVAL primitive (kmcp per-query match
        ranking, util-db-search.go:105-145, with Hamming distance as
        the score): md5-shingle simhash codes, first 10 docs as
        queries, k=5, ties broken by neighbor id.  Broadcast query
        codes + one xor/popcount pass per batch; no all-to-all
        shuffle.  Oracle: bit_count(xor()) + QUALIFY row_number."""
        import pyarrow as pa
        import pyarrow.compute as pc
        from kmcp_ray import ann as ann_mod
        codes = textops.doc_simhash(_docs(sf), token_hash="md5")
        qt = pa.Table.from_pylist(
            codes.map_batches(
                lambda t: t.filter(pc.less(t["doc_id"], 10)),
                batch_format="pyarrow", zero_copy_batch=True).take_all())
        q_ids = qt.column("doc_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        q_codes = qt.column("simhash").to_numpy(zero_copy_only=False) \
            .astype(np.int64).view(np.uint64)
        return ann_mod.topk_hamming(codes, (q_ids, q_codes), k=5,
                                    id_col="doc_id", code_col="simhash")

    def q_incremental_dedup(sf):
        """Incremental epoch growth (kmcp incremental shard-grow,
        reference README.md:118-122): checkpointed base run over
        doc_id < 350, then ONE increment epoch for the rest — new rows
        sketched, prior epochs contribute only persisted band keys,
        stale buckets never re-verified.  Assignments over the union
        equal the from-scratch transitive closure, so the oracle is the
        same SQL as minhash_dedup_docs."""
        import tempfile

        import pyarrow.compute as pc
        docs = _docs(sf)
        old = docs.map_batches(
            lambda t: t.filter(pc.less(t["doc_id"], 350)),
            batch_format="pyarrow", zero_copy_batch=True)
        new = docs.map_batches(
            lambda t: t.filter(pc.greater_equal(t["doc_id"], 350)),
            batch_format="pyarrow", zero_copy_batch=True)
        wd = tempfile.mkdtemp(prefix="kmcp_incdd_", dir="/tmp")
        return docs_dedup.minhash_dedup_incremental(old, new, ex_cfg, wd)

    def q_ngram_pairs(sf):
        import pyarrow as pa
        out = docs_dedup.ngram_jaccard_pairs(_docs(sf), ex_cfg)

        def intscore(t: pa.Table) -> pa.Table:
            s = t.column("score").to_numpy(zero_copy_only=False)
            return pa.table({
                "id_a": t.column("id_a"), "id_b": t.column("id_b"),
                "via": t.column("via"),
                "score_u": pa.array(np.floor(1e6 * s).astype(np.int64),
                                    pa.int64())})
        return out.map_batches(intscore, batch_format="pyarrow",
                               zero_copy_batch=True)

    def q_consensus_pairs(sf):
        """Multi-signal fusion: exact-mode caption near-dup pairs kept
        only when the same ids' embeddings agree (cosine >= 0.08) —
        semi-join fetches the pair-bounded vector subset, broadcast
        cosine pass; integer-ized jacc + cosine ride the output."""
        docs = _docs(sf)
        emb = _read(sf, "embeddings", columns=["vec_id", "embedding"])
        return docs_dedup.consensus_pairs(docs, emb, ex_cfg,
                                          min_cos_u=80_000) \
            .sort(["id_a", "id_b"])

    def q_fingerprint(sf):
        """Winnowing fingerprints over the md5 shingle-hash variant
        (SQL window-min mirror); summary columns are order-free ints."""
        return textops.doc_fingerprint(_docs(sf), token_hash="md5")

    def q_lang_id(sf):
        return textops.lang_id(_docs(sf), concurrency=2)

    def q_quality(sf):
        return textops.quality_score(_docs(sf)) \
            .select_columns(["doc_id", "quality_u"])

    def q_lsh_cosine(sf):
        ds = _read(sf, "embeddings", columns=["vec_id", "embedding"])
        return ann.lsh_cosine_pairs(ds, 0.35, cfg)

    def q_search_docs(sf):
        """kmcp search analogue with the FPR significance gate ON
        (max_fpr=0.01 default — the binomial tail is mirrored in SQL via
        lgamma): first 100 docs as queries vs all docs."""
        import pyarrow.compute as pc
        from kmcp_ray import search as search_mod
        docs = _docs(sf)
        queries_ds = docs.map_batches(
            lambda t: t.filter(pc.less(t["doc_id"], 100)),
            batch_format="pyarrow", zero_copy_batch=True)
        out = search_mod.search(
            queries_ds, docs, cfg, query_id="doc_id", query_text="text",
            ref_id="doc_id", ref_text="text", min_qcov=0.3, min_shared=2)
        return _finalize_matches(out, drop_self=True)

    def q_search_merge(sf):
        """shard-merge invariant surface: two ref shards, merged, then
        the post-merge per-query hits rewrite (kmcp merge.go:210-224);
        integer-ized scores + hits, self-matches dropped AFTER the hits
        count (hits counts all matched targets incl. self, as kmcp's
        does)."""
        import pyarrow as pa
        import pyarrow.compute as pc
        from kmcp_ray import search as search_mod
        docs = _docs(sf)
        queries_ds = docs.map_batches(
            lambda t: t.filter(pc.less(t["doc_id"], 30)),
            batch_format="pyarrow", zero_copy_batch=True)
        half_a = docs.map_batches(
            lambda t: t.filter(pc.equal(pc.bit_wise_and(t["doc_id"], 1), 0)),
            batch_format="pyarrow", zero_copy_batch=True)
        half_b = docs.map_batches(
            lambda t: t.filter(pc.equal(pc.bit_wise_and(t["doc_id"], 1), 1)),
            batch_format="pyarrow", zero_copy_batch=True)
        ra = search_mod.search(queries_ds, half_a, cfg, min_qcov=0.05,
                               min_shared=1, max_fpr=0.05)
        rb = search_mod.search(queries_ds, half_b, cfg, min_qcov=0.05,
                               min_shared=1, max_fpr=0.05)
        merged = search_mod.add_hits(
            search_mod.merge_search_results([ra, rb]),
            num_partitions=cfg.num_partitions)

        def finalize(t: pa.Table) -> pa.Table:
            q = t.column("query").to_numpy(zero_copy_only=False)
            tg = t.column("target").to_numpy(zero_copy_only=False)
            keep = q != tg
            c = t.column("m_shared").to_numpy(zero_copy_only=False)[keep]
            kq = t.column("q_kept").to_numpy(zero_copy_only=False)[keep]
            kt = t.column("t_kept").to_numpy(zero_copy_only=False)[keep]
            hits = t.column("hits").to_numpy(zero_copy_only=False)[keep]
            return pa.table({
                "query": pa.array(q[keep], pa.string()),
                "target": pa.array(tg[keep], pa.string()),
                "m_shared": pa.array(c.astype(np.int64), pa.int64()),
                "q_kept": pa.array(kq.astype(np.int64), pa.int64()),
                "t_kept": pa.array(kt.astype(np.int64), pa.int64()),
                "qcov_u": pa.array(np.floor(1000000.0 * c / kq)
                                   .astype(np.int64), pa.int64()),
                "hits": pa.array(hits.astype(np.int64), pa.int64())})
        return merged.map_batches(finalize, batch_format="pyarrow",
                                  zero_copy_batch=True) \
            .sort(["query", "target"])

    def q_search_intersect(sf):
        """multi-DB intersection (J2): targets must appear in BOTH
        overlapping ref shards; min-count row wins."""
        import pyarrow.compute as pc
        from kmcp_ray import search as search_mod
        docs = _docs(sf)
        queries_ds = docs.map_batches(
            lambda t: t.filter(pc.less(t["doc_id"], 100)),
            batch_format="pyarrow", zero_copy_batch=True)
        # shards overlap on doc_id % 3 == 1
        def shard(keep_mods):
            def fn(t):
                ids = t.column("doc_id").to_numpy(zero_copy_only=False)
                import pyarrow as pa
                return t.filter(pa.array(np.isin(ids % 3, keep_mods)))
            return fn
        shard_a = docs.map_batches(shard([0, 1]), batch_format="pyarrow",
                                   zero_copy_batch=True)
        shard_b = docs.map_batches(shard([1, 2]), batch_format="pyarrow",
                                   zero_copy_batch=True)
        ra = search_mod.search(queries_ds, shard_a, cfg, min_qcov=0.01,
                               min_shared=1, max_fpr=1.0)
        rb = search_mod.search(queries_ds, shard_b, cfg, min_qcov=0.01,
                               min_shared=1, max_fpr=1.0)
        return _finalize_matches(search_mod.intersect_search_results(
            [ra, rb], num_partitions=cfg.num_partitions))

    def q_substr(sf):
        """substring containment over documents plus planted contained
        variants (every 40th doc contributes a contiguous token slice
        as a new row), so the operator's hit path is driver-visible."""
        import pyarrow as pa
        from kmcp_ray import substr

        def plant(t: pa.Table) -> pa.Table:
            ids = t.column("doc_id").to_numpy(zero_copy_only=False)
            txt = t.column("text").to_numpy(zero_copy_only=False)
            sel = ids % 40 == 0
            new_ids, new_txt = [], []
            for i, x in zip(ids[sel], txt[sel]):
                toks = (x or "").split()
                if len(toks) < 24:
                    continue
                new_ids.append(int(i) + 1_000_000)
                new_txt.append(" ".join(toks[4:4 + max(16, len(toks) // 2)]))
            return pa.table({
                "doc_id": pa.array(list(ids) + new_ids, pa.int64()),
                "text": pa.array(list(txt) + new_txt, pa.string())})
        docs = _read(sf, "documents", columns=["doc_id", "text"]) \
            .map_batches(plant, batch_format="pyarrow", zero_copy_batch=True)
        out = substr.substr_containment_pairs(docs, ex_cfg)
        return out.select_columns(["id_a", "id_b", "via"]) \
            .sort(["id_a", "id_b"])

    def _sorted_texts(sf):
        import pyarrow.parquet as pq
        t = pq.read_table(f"{sf}/documents.parquet",
                          columns=["doc_id", "text"])
        order = np.argsort(t.column("doc_id").to_numpy(), kind="stable")
        return t.column("text").to_numpy(zero_copy_only=False)[order]

    def q_cluster_profile(sf):
        """Per-cluster profile over the arithmetic-planted corpus:
        sizes + per-discovery-path edge counts are fully determined by
        the SQL-reconstructable captions + the planted id pattern
        (scores stay engine-only — they depend on perturbed pixels)."""
        import ray.data
        from kmcp_ray import testgen
        from kmcp_ray.pipeline import dedup_pipeline
        from kmcp_ray.profile import cluster_profile
        table, _p = testgen.make_arith_corpus(600, _sorted_texts(sf),
                                              cfg=ex_cfg)
        res = dedup_pipeline(ray.data.from_arrow(table), ex_cfg)
        prof = cluster_profile(res.assignments, res.edges, res.cluster_map)
        return prof.select_columns(
            ["cluster_id", "size", "n_edges", "n_exact", "n_minhash",
             "n_contain", "n_phash"]).sort("cluster_id")

    def q_decode_verify(sf):
        """actor-pool multimodal decode + integrity stage on the
        (n, seed)-deterministic synthetic image corpus — sf-independent
        by construction, so the per-image pixel checksums precomputed
        into tests/golden/decode_verify.parquet are the DuckDB oracle
        (the kmcp version-pinned golden-profile pattern,
        demo-profiling/README.md)."""
        import pyarrow as pa
        import ray.data
        from kmcp_ray import testgen
        from kmcp_ray.imagecodec import decode_verify
        table, _p, _n = testgen.make_pairs_corpus(n=400, seed=42, cfg=cfg)
        out = decode_verify(ray.data.from_arrow(table), concurrency=2)

        def to_int(t: "pa.Table") -> "pa.Table":
            ok = t.column("phash_ok").to_numpy(zero_copy_only=False)
            ps = t.column("psnr_db").to_numpy(zero_copy_only=False)
            return pa.table({
                "image_id": t.column("image_id"),
                "phash_ok": pa.array(ok.astype(np.int64), pa.int64()),
                "psnr_cdb": pa.array(np.floor(ps * 100).astype(np.int64),
                                     pa.int64()),
                "w_decoded": pa.array(
                    t.column("w_decoded").to_numpy(zero_copy_only=False)
                    .astype(np.int64), pa.int64()),
                "h_decoded": pa.array(
                    t.column("h_decoded").to_numpy(zero_copy_only=False)
                    .astype(np.int64), pa.int64()),
                "pix_sum": t.column("pix_sum")})
        return out.map_batches(to_int, batch_format="pyarrow",
                               zero_copy_batch=True).sort("image_id")

    def q_resize_images(sf):
        """actor-pool resize stage: decode → 16x16 resample → lossless
        re-encode + fresh phash; output keeps the image-table shape so
        it composes with decode_verify / the dedup pipeline."""
        import pyarrow as pa
        import ray.data
        from kmcp_ray import testgen
        from kmcp_ray.imagecodec import resize_images
        table, _p, _n = testgen.make_pairs_corpus(n=400, seed=42, cfg=cfg)
        out = resize_images(ray.data.from_arrow(table), out_w=16,
                            out_h=16, concurrency=2) \
            .select_columns(["image_id", "w", "h", "fmt", "phash",
                             "pix_sum"])

        def widen(t: "pa.Table") -> "pa.Table":
            return pa.table({
                "image_id": t.column("image_id"),
                "w": t.column("w").cast(pa.int64()),
                "h": t.column("h").cast(pa.int64()),
                "fmt": t.column("fmt"), "phash": t.column("phash"),
                "pix_sum": t.column("pix_sum")})
        return out.map_batches(widen, batch_format="pyarrow",
                               zero_copy_batch=True).sort("image_id")

    def q_frame_sample(sf):
        """actor-pool video frame sampling (every 5th frame of a
        deterministic synthetic clip table) → image-table rows; frame
        decode is selective (only sampled indices materialize)."""
        import pyarrow as _pa
        import ray.data
        from kmcp_ray.imagecodec import encode_video, frame_sample
        rng = np.random.default_rng(99)
        vids, blobs = [], []
        for v in range(40):
            n = int(rng.integers(8, 30))
            fr = rng.integers(0, 256, (n, 24, 24, 3)).astype(np.uint8)
            vids.append(f"vid{v:03d}")
            blobs.append(encode_video(fr))
        tbl = _pa.table({"video_id": _pa.array(vids, _pa.string()),
                         "bytes": _pa.array(blobs, _pa.binary())})
        out = frame_sample(ray.data.from_arrow(tbl).repartition(4),
                           every=5, concurrency=2) \
            .select_columns(["image_id", "video_id", "frame_idx",
                             "w", "h", "phash", "pix_sum"])

        def widen(t: "_pa.Table") -> "_pa.Table":
            return _pa.table({
                "image_id": t.column("image_id"),
                "video_id": t.column("video_id"),
                "frame_idx": t.column("frame_idx"),
                "w": t.column("w").cast(_pa.int64()),
                "h": t.column("h").cast(_pa.int64()),
                "phash": t.column("phash"),
                "pix_sum": t.column("pix_sum")})
        return out.map_batches(widen, batch_format="pyarrow",
                               zero_copy_batch=True).sort("image_id")

    def q_corpus_funnel(sf):
        """Training-data funnel: quality gate → lang ID → exact dedup
        → per-language stats as ONE streaming composition; text is
        dropped inside the fused read chain, the only wide exchange
        carries ~40 B/row survivors."""
        from kmcp_ray.funnel import corpus_funnel
        return corpus_funnel(_docs(sf), min_quality_u=300000)

    def q_docs_pushdown(sf):
        """M14 predicate pushdown: row filter + column pruning applied
        AT THE SCAN (only matching row groups / columns leave disk)."""
        import pyarrow.compute as pc
        import ray.data
        ds = ray.data.read_parquet(
            f"{sf}/documents.parquet",
            columns=["doc_id", "lang", "n_chars"],
            filter=(pc.field("lang") == "en") & (pc.field("n_chars") > 500))
        return ds.sort("doc_id")

    def q_search_indexed(sf):
        """kmcp load-whole-index search mode: actor-pool searcher over
        a broadcast inverted index (T1/T2)."""
        import pyarrow.compute as pc
        from kmcp_ray import search as search_mod
        docs = _docs(sf)
        queries_ds = docs.map_batches(
            lambda t: t.filter(pc.less(t["doc_id"], 100)),
            batch_format="pyarrow", zero_copy_batch=True)
        out = search_mod.search_indexed(
            queries_ds, docs, cfg, query_id="doc_id", query_text="text",
            ref_id="doc_id", ref_text="text", min_qcov=0.3, min_shared=2,
            max_fpr=1.0, concurrency=2)
        return _finalize_matches(out)

    def q_merge_regions(sf):
        """interval merge (kmcp merge-regions S11): deterministic
        intervals derived from the events table."""
        import pyarrow as pa
        from kmcp_ray.regions import merge_regions

        def to_intervals(t: pa.Table) -> pa.Table:
            v = t.column("value").to_numpy(zero_copy_only=False)
            u = t.column("user_id").to_numpy(zero_copy_only=False)
            start = np.floor(v * 100).astype(np.int64)
            return pa.table({
                "chrom": pa.array((u % 20).astype(str), pa.string()),
                "start": pa.array(start, pa.int64()),
                "end": pa.array(start + 40, pa.int64())})
        iv = _read(sf, "events", columns=["user_id", "value"]) \
            .map_batches(to_intervals, batch_format="pyarrow",
                         zero_copy_batch=True)
        return merge_regions(iv, num_partitions=16) \
            .sort(["chrom", "start"])

    def q_assign_best(sf):
        """fragment -> argmax target assignment (J5)."""
        import pyarrow.compute as pc
        from kmcp_ray import search as search_mod
        docs = _docs(sf)
        queries_ds = docs.map_batches(
            lambda t: t.filter(pc.less(t["doc_id"], 30)),
            batch_format="pyarrow", zero_copy_batch=True)
        refs = docs.map_batches(
            lambda t: t.filter(pc.greater_equal(t["doc_id"], 30)),
            batch_format="pyarrow", zero_copy_batch=True)
        return _finalize_matches(search_mod.assign_best_target(
            queries_ds, refs, cfg, min_qcov=0.05, min_shared=1,
            max_fpr=1.0), drop_self=False)

    def q_longdoc_overlap(sf):
        """chunk slider + containment search: partial-overlap pairs
        whole-document sketches cannot see (kmcp M5/M6 analogue).

        Long docs are built arithmetically from the documents table
        (doc g = tokens of docs 5g..5g+4; odd g additionally embeds a
        contiguous quarter-offset slice of doc g-1's tokens at its
        midpoint) so the SQL oracle reconstructs the corpus, the chunk
        geometry AND the gated chunk search."""
        import re
        import pyarrow as pa
        import ray.data
        from kmcp_ray.chunks import longdoc_overlap_pairs
        texts = _sorted_texts(sf)[:200]
        toks = [re.findall(r"[a-z0-9]+", (t or "").lower()) for t in texts]
        G = len(toks) // 5
        base = [sum(toks[5 * g:5 * g + 5], []) for g in range(G)]
        docs = []
        for g in range(G):
            tk = base[g]
            if g % 2 == 1:
                prev = base[g - 1]
                q1 = len(prev) // 4
                sl = max(40, len(prev) // 3)
                mid = len(tk) // 2
                tk = tk[:mid] + prev[q1:q1 + sl] + tk[mid:]
            docs.append(" ".join(tk))
        sds = ray.data.from_arrow(pa.table({
            "doc_id": pa.array([str(g) for g in range(G)], pa.string()),
            "text": pa.array(docs, pa.string())}))
        return longdoc_overlap_pairs(sds, cfg, chunk_tokens=64,
                                     min_qcov=0.8, min_shared=4) \
            .sort(["id_a", "id_b"])

    def q_profile_em(sf):
        """kmcp profile funnel (stages 1-4 + EM abundance) on the
        deterministic planted-abundance match table."""
        import ray.data
        from kmcp_ray import testgen
        from kmcp_ray.profile_em import ProfileParams, profile_funnel
        m = testgen.make_profile_matches(n_targets=12, n_queries=3000, seed=7)
        return profile_funnel(
            ray.data.from_arrow(m),
            ProfileParams(min_qcov=0.55, min_reads=5, min_uniq_reads=2,
                          min_hic_ureads=1, min_frags_prop=0.0),
            num_partitions=16)

    def q_image_dedup(sf):
        """PIXEL-space near-dup clustering (the image leg of the dedup
        tier): decode -> DCT structure embedding (DC/means stripped) ->
        cosine pairs -> spanning forest -> min-id labels.  The
        (n, seed)-deterministic sf-independent corpus makes the cluster
        assignments golden-pinnable (tests/golden/image_dedup.parquet =
        the DuckDB oracle); planted-pair recall additionally pinned in
        tests/test_imagecodec.py."""
        import ray.data
        from kmcp_ray import testgen
        from kmcp_ray.imagecodec import image_feature_dedup
        table, _p, _n = testgen.make_pairs_corpus(n=400, seed=42, cfg=cfg)
        return image_feature_dedup(ray.data.from_arrow(table),
                                   threshold=0.99, concurrency=2) \
            .sort("image_id")

    def q_image_features(sf):
        """actor-pool multimodal decode -> feature-extract stage
        (DCT embedding per image; the model-inference plumbing).
        sf-independent deterministic corpus → integer embedding summary
        pinned by tests/golden/image_features.parquet (DuckDB oracle)."""
        import ray.data
        from kmcp_ray import testgen
        from kmcp_ray.imagecodec import image_features
        table, _p, _n = testgen.make_pairs_corpus(n=400, seed=42, cfg=cfg)
        feats = image_features(ray.data.from_arrow(table), concurrency=2)

        def summarize(t):
            import pyarrow as pa
            from kmcp_ray.arrowutil import list_to_numpy
            vals, off = list_to_numpy(t.column("embedding"),
                                      dtype=np.float64)
            n = t.num_rows
            dim = (off[1:] - off[:-1]).astype(np.int64)
            l2 = np.sqrt(np.add.reduceat(vals * vals, off[:-1])) \
                if len(vals) else np.zeros(n)
            return pa.table({
                "image_id": t.column("image_id"),
                "emb_dim": pa.array(dim, pa.int64()),
                "emb_l2_u": pa.array(np.floor(l2 * 1e3).astype(np.int64),
                                     pa.int64())})
        # scalar summary (the list column itself breaks value hashing)
        return feats.map_batches(summarize, batch_format="pyarrow",
                                 zero_copy_batch=True).sort("image_id")

    def q_bucket_stats(sf):
        """Per-kind LSH bucket-size histogram (index-density diagnostic,
        kmcp's block-stats analogue).  Runs the PRODUCTION banding +
        histogram code (sketch_stage → make_band_fn → bucket_stats) on
        the md5 hash twin (DedupConfig.hash_mode="md5") so the whole
        chain — shingle sets → MinHash perms → band folds → contain
        salt → exact combine3 → u32 bkey packing → histogram — has an
        exact DuckDB oracle (splitmix64 mirrored in SQL via 32-bit
        decomposed wraparound multiplies); the production SipHash mode
        is pinned by tests/oracle.py-backed pytests (r4 verdict #6)."""
        import dataclasses
        from kmcp_ray.diagnostics import bucket_stats
        from kmcp_ray.pipeline import sketch_stage
        bs_cfg = dataclasses.replace(cfg, hash_mode="md5")
        sds = _docs(sf).map_batches(
            lambda t: __import__("pyarrow").table(
                {"image_id": t["doc_id"].cast("string"),
                 "caption": t["text"]}),
            batch_format="pyarrow", zero_copy_batch=True)
        sig = sketch_stage(sds, bs_cfg, phash_col=None, bytes_col=None)
        return bucket_stats(sig, bs_cfg,
                            enable=("minhash", "contain", "exact"))

    def q_pairs_pipeline(sf):
        """Full image+caption dedup pipeline (all four generators) on
        the arithmetic-planted corpus: text edges are SQL-computable
        from the reconstructed captions, planted exact/phash edges are
        id arithmetic ⇒ cluster assignments equal the SQL closure."""
        import ray.data
        from kmcp_ray import testgen
        from kmcp_ray.pipeline import dedup_pipeline
        table, _p = testgen.make_arith_corpus(600, _sorted_texts(sf),
                                              cfg=ex_cfg)
        return dedup_pipeline(ray.data.from_arrow(table), ex_cfg) \
            .assignments.sort("image_id")

    def q_substr_exact(sf):
        """Exact needle containment: 80-char prefixes of docs 0..199 as
        needles, matched literally against the whole corpus."""
        import pyarrow.parquet as pq
        from kmcp_ray import substr
        nt = pq.read_table(f"{sf}/documents.parquet",
                           columns=["doc_id", "text"])
        ids = nt.column("doc_id").to_numpy(zero_copy_only=False)
        mask = ids < 200
        needles = [(int(i), (s or "")[:80]) for i, s in
                   zip(ids[mask], np.asarray(
                       nt.column("text").to_numpy(zero_copy_only=False))[mask])]
        return substr.contains_exact(_docs(sf), needles)

    def q_token_jaccard(sf):
        return docs_dedup.token_jaccard_exact(_docs(sf))

    def q_search_exact(sf):
        """Exact containment search (J1/A1/A2) with the FPR gate off
        and integer-ized scores — value-exact vs a 3-shingle self-join
        oracle.  search_scale=1 makes candidate generation exhaustive
        (every shared shingle is a bucket key), so this is kmcp's
        exact k-mer containment mode end-to-end."""
        import pyarrow as pa
        import pyarrow.compute as pc
        from kmcp_ray import search as search_mod
        docs = _docs(sf)
        queries_ds = docs.map_batches(
            lambda t: t.filter(pc.less(t["doc_id"], 100)),
            batch_format="pyarrow", zero_copy_batch=True)
        out = search_mod.search(
            queries_ds, docs, cfg, query_id="doc_id", query_text="text",
            ref_id="doc_id", ref_text="text", min_qcov=0.01, min_shared=1,
            max_fpr=1.0)
        return _finalize_matches(out)

    def q_grouped_sketch(sf):
        """M7 concat-with-spacers analogue: docs grouped by doc_id%50,
        one sketch per group = union of member shingle sets (shingles
        never cross member boundaries); scalar columns only (the
        sketch list itself breaks the driver's value hash)."""
        import pyarrow as pa
        from kmcp_ray.groupsketch import grouped_sketch

        def add_gid(t: pa.Table) -> pa.Table:
            ids = t.column("doc_id").to_numpy(zero_copy_only=False)
            return t.append_column(
                "group_id", pa.array((ids % 50).astype(str), pa.string()))
        ds = _read(sf, "documents", columns=["doc_id", "text"]) \
            .map_batches(add_gid, batch_format="pyarrow",
                         zero_copy_batch=True)
        out = grouped_sketch(ds, cfg, num_partitions=16)
        return out.select_columns(
            ["group_id", "n_members", "n_tokens", "n_distinct"]) \
            .sort("group_id")

    def q_contrastive_triplets(sf):
        """Contrastive (anchor, positive, negative) triplets mined
        from the near-dup signal: positives = smallest exact-Jaccard
        partner, negatives = deterministic hash-pick anti-joined
        against the pair set — the SimCLR/CLIP data op, RNG-free so
        the oracle reproduces it bit-exactly."""
        from kmcp_ray import curate
        return curate.contrastive_triplets(_docs(sf))

    def q_oov_rate(sf):
        """Per-doc OOV rate vs the corpus' own top-15 vocabulary:
        one vocab-sized groupby, vocab broadcast once, one vectorized
        membership pass (curate.oov_rate)."""
        from kmcp_ray import curate
        return curate.oov_rate(
            _read(sf, "documents", columns=["doc_id", "text"]),
            vocab_size=15)

    def q_heavy_hitters(sf):
        """Exact frequent tokens (cnt*(k+1) > N, k=30) via mergeable
        Misra-Gries candidates + exact recount — the candidate-prune
        pattern that avoids a corpus-wide vocabulary shuffle
        (curate.heavy_hitters)."""
        from kmcp_ray import curate
        return curate.heavy_hitters(
            _read(sf, "documents", columns=["text"]), k=30)

    def q_pmi_pairs(sf):
        """Skip-gram (window 2) collocations by integer-scaled lift:
        per-batch combined pair counts, unigrams + pair total riding
        the same aggregate, top-50 (curate.pmi_pairs)."""
        from kmcp_ray import curate
        return curate.pmi_pairs(
            _read(sf, "documents", columns=["text"]),
            window=2, min_cnt=5, topk=50)

    def q_boilerplate_dedup(sf):
        """CCNet-style boilerplate-line removal: 2-token lines present
        in >= 20 distinct docs deleted from ALL docs (vs span_dedup's
        first-occurrence-wins), docs rebuilt in one broadcast
        membership sweep (curate.boilerplate_dedup)."""
        from kmcp_ray import curate
        return curate.boilerplate_dedup(
            _read(sf, "documents", columns=["doc_id", "text"]),
            w=2, min_docs=20)

    def q_curriculum_order(sf):
        """Deterministic curriculum order: per-source easy→hard rank
        (n_chars asc), sources interleaved round-robin via the
        closed-form (r, source) rank — ONE groupby, no second shuffle
        (curate.curriculum_order)."""
        from kmcp_ray import curate
        return curate.curriculum_order(
            _read(sf, "documents",
                  columns=["doc_id", "source", "n_chars"]))

    def q_edit_distance(sf):
        """Edit-distance-verified near-dup pairs: exact-Jaccard >= 0.9
        candidates re-verified with batch-vectorized char Levenshtein,
        dist <= 150 kept.  The order-sensitive second opinion: on the
        word-salad corpus only 7 of 3429 perfect-set-overlap candidate
        pairs are true near-identical texts
        (docs_dedup.edit_distance_pairs)."""
        from kmcp_ray import docs_dedup
        return docs_dedup.edit_distance_pairs(
            _docs(sf), cand_jacc_u=900_000, max_dist=150)

    def q_winsorize(sf):
        """Per-source winsorization of n_chars to the exact [p5, p95]
        group order statistics — distributed histogram quantiles, the
        tiny (lo, hi)-per-group table broadcast once
        (relops.winsorize)."""
        from kmcp_ray import relops
        return relops.winsorize(
            _read(sf, "documents",
                  columns=["doc_id", "source", "n_chars"]))

    def q_triangle_count(sf):
        """Triangles in the exact-Jaccard dup-pair graph (bounded
        ground-truth slice): two partitioned hash-join exchanges —
        wedges on the middle vertex, closing-edge semi join — then one
        count (cc.triangle_count). Cluster-density diagnostic: near-dup
        components should be near-cliques."""
        from kmcp_ray import cc, docs_dedup
        pairs = docs_dedup.token_jaccard_exact(_docs(sf))
        return cc.triangle_count(pairs)

    def q_novelty_score(sf):
        """Per-doc marginal-new-content score: fraction of the doc's
        distinct 3-shingles whose global first occurrence (min doc_id)
        is this doc — the data-valuation / curriculum-ordering
        primitive (kmcp per-file distinct-kmer accounting +
        first-occurrence index-union semantics).  One 16 B/row
        hash-partition exchange; text never shuffles."""
        from kmcp_ray import curate
        return curate.novelty_score(_docs(sf), token_hash="md5")

    def q_hash_sample(sf):
        """Deterministic multiplicative-hash row sampling (SURVEY §2.6
        O7 — absent in the reference, required by training pipelines):
        pure stateless filter, nested keep-sets across rates."""
        from kmcp_ray import curate
        return curate.hash_sample(
            _read(sf, "documents", columns=["doc_id", "lang", "n_chars"]),
            pct=10).sort("doc_id")

    def q_stratified_sample(sf):
        """Exact per-language quota sample: smallest (hash, id) rows
        per group, quota = ceil(n_group * pct / 100)."""
        from kmcp_ray import curate
        return curate.stratified_sample(
            _read(sf, "documents", columns=["doc_id", "lang"]),
            pct=10, group_col="lang").sort("doc_id")

    def q_decontaminate(sf):
        """Benchmark decontamination: docs (doc_id % 20 == 0) form the
        eval set; every other doc sharing ANY 3-token shingle with it is
        dropped via the broadcast blocklist anti-join."""
        import pyarrow as pa
        from kmcp_ray import curate
        docs = _read(sf, "documents", columns=["doc_id", "text", "lang"])

        def split(keep_eval):
            def fn(t: "pa.Table") -> "pa.Table":
                ids = t.column("doc_id").to_numpy(zero_copy_only=False)
                m = (ids % 20) == 0
                return t.filter(pa.array(m if keep_eval else ~m))
            return fn

        eval_ds = docs.map_batches(split(True), batch_format="pyarrow",
                                   zero_copy_batch=True)
        corpus = docs.map_batches(split(False), batch_format="pyarrow",
                                  zero_copy_batch=True)
        out = curate.decontaminate(corpus, eval_ds, k=3)
        return out.select_columns(["doc_id", "lang"]).sort("doc_id")

    def q_bloom_decontaminate(sf):
        """Bloom-filter decontamination (the fixed-size-broadcast scale
        path beside the exact blocklist): same eval split as
        `decontaminate`, membership through a 65536-bit / 3-hash filter
        with md5-derived positions — the oracle rebuilds the SAME
        filter, so false positives are mirrored bit-exactly."""
        import pyarrow as pa
        from kmcp_ray import bloom
        docs = _read(sf, "documents", columns=["doc_id", "text", "lang"])

        def split(keep_eval):
            def fn(t: "pa.Table") -> "pa.Table":
                ids = t.column("doc_id").to_numpy(zero_copy_only=False)
                m = (ids % 20) == 0
                return t.filter(pa.array(m if keep_eval else ~m))
            return fn

        eval_ds = docs.map_batches(split(True), batch_format="pyarrow",
                                   zero_copy_batch=True)
        corpus = docs.map_batches(split(False), batch_format="pyarrow",
                                  zero_copy_batch=True)
        out = bloom.bloom_decontaminate(corpus, eval_ds, k=3,
                                        m_bits=65536, k_hashes=3,
                                        token_hash="md5")
        return out.select_columns(["doc_id", "lang"]).sort("doc_id")

    def q_vocab_topk(sf):
        """Token-frequency vocabulary: map-side combine → one
        vocabulary-sized groupby → global (cnt desc, token) top-k."""
        from kmcp_ray import curate
        return curate.vocab_topk(
            _read(sf, "documents", columns=["text"]), topk=40)

    def q_pii_scrub(sf):
        """RE2 email/long-number redaction with per-doc counts.  The
        corpus is synthetic word-salad, so PII-shaped content is
        PLANTED deterministically from doc_id (same expression on the
        SQL side) — the substr-entry pattern."""
        import pyarrow as pa
        from kmcp_ray import curate
        docs = _read(sf, "documents", columns=["doc_id", "text"])

        def plant(t: "pa.Table") -> "pa.Table":
            ids = t.column("doc_id").to_numpy(zero_copy_only=False)
            txt = t.column("text").to_numpy(zero_copy_only=False)
            out = txt.astype(object).copy()
            for i in np.nonzero(ids % 7 == 0)[0]:
                out[i] = ((out[i] or "")
                          + f" contact user{ids[i]}@mail.example ref "
                          + f"{ids[i] * 1000003 + 123456}")
            return pa.table({"doc_id": t.column("doc_id"),
                             "text": pa.array(out, pa.string())})

        planted = docs.map_batches(plant, batch_format="pyarrow",
                                   zero_copy_batch=True)
        return curate.pii_scrub(planted).sort("doc_id")

    def q_region_revenue(sf):
        """TPC-H-Q5-shaped 6-table join: dimension hop broadcast,
        customer/supplier nation attach map-side, two generic
        hash_join exchanges, nation-sized final groupby
        (relops.region_revenue)."""
        return relops.region_revenue(
            _read(sf, "region"), _read(sf, "nation"),
            _read(sf, "supplier", columns=["s_suppkey", "s_nationkey"]),
            _read(sf, "customer", columns=["c_custkey", "c_nationkey"]),
            _read(sf, "orders",
                  columns=["o_orderkey", "o_custkey", "o_orderdate"]),
            _read(sf, "lineitem",
                  columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                           "l_discount"]))

    def q_audio_features(sf):
        """Actor-pool audio feature extraction (log-mel filterbank,
        filterbank built once per actor) over a deterministic synthetic
        PCM corpus — the audio leg of the multimodal stage family
        (audiocodec.AudioFeatureStage); codec honestly stubbed, no
        audio libs in sandbox.  The (n, seed)-deterministic corpus +
        bit-deterministic features make the output golden-pinnable
        (tests/golden/audio_features.parquet — a drift pin, see the
        self-referential note in BASELINE.md); the list embedding is
        summarized to scalars for value hashing, full embeddings pinned
        in tests/test_audiocodec.py."""
        import ray.data
        from kmcp_ray import audiocodec
        table = audiocodec.make_audio_corpus(400, seed=42)
        feats = audiocodec.audio_features(ray.data.from_arrow(table),
                                          concurrency=2)

        def summarize(t):
            import pyarrow as pa
            from kmcp_ray.arrowutil import list_to_numpy
            vals, off = list_to_numpy(t.column("embedding"),
                                      dtype=np.float64)
            n = t.num_rows
            dim = (off[1:] - off[:-1]).astype(np.int64)
            l2 = np.sqrt(np.add.reduceat(vals * vals, off[:-1])) \
                if len(vals) else np.zeros(n)
            return pa.table({
                "audio_id": t.column("audio_id"),
                "duration_ms": t.column("duration_ms"),
                "n_frames": t.column("n_frames"),
                "rms_milli": t.column("rms_milli"),
                "emb_dim": pa.array(dim, pa.int64()),
                "emb_l2_u": pa.array(np.floor(l2 * 1e3).astype(np.int64),
                                     pa.int64())})

        return feats.map_batches(summarize, batch_format="pyarrow",
                                 zero_copy_batch=True).sort("audio_id")

    def q_gopher_filter(sf):
        """Gopher-rule quality gate: per-doc fail bitmask (word count /
        mean word length / symbol ratio / distinct stopwords), all
        thresholds integer-exact so the SQL oracle agrees bitwise
        (curate.gopher_filter)."""
        from kmcp_ray import curate
        return curate.gopher_filter(
            _read(sf, "documents", columns=["doc_id", "text"])) \
            .sort("doc_id")

    def q_dsir_select(sf):
        """DSIR importance resampling (Xie et al. 2023): keep the top
        20% of docs by hashed-unigram log-likelihood ratio vs the
        target (lang='en') distribution — the deterministic rank
        variant of Gumbel-top-k.  Fixed-point integer log-ratio
        weights make per-doc scores exact int64 sums, so the SQL
        oracle agrees bitwise; md5 bucket hashes are the
        oracle-mirrorable family, production uses SipHash
        (kmcp_ray/dsir.py)."""
        import pyarrow.compute as pc
        from kmcp_ray import dsir

        def target(t):
            return pc.equal(t.column("lang"), "en").to_numpy(
                zero_copy_only=False)

        return dsir.dsir_select(
            _read(sf, "documents", columns=["doc_id", "text", "lang"]),
            target, token_hash="md5")

    def q_global_shuffle(sf):
        """Deterministic training-order shuffle: global rank under
        (sample_hash32(id), id) via hash-range partitions + a P-int
        driver prefix sum — reproducible across cluster sizes, unlike
        Dataset.random_shuffle (curate.global_shuffle)."""
        from kmcp_ray import curate
        return curate.global_shuffle(
            _read(sf, "documents", columns=["doc_id"])).sort("doc_id")

    def q_hash_split(sf):
        """Train/val/test assignment as a pure function of doc_id
        (80/10/10 by hash residue) — stable under corpus growth and
        re-sharding (curate.hash_split)."""
        from kmcp_ray import curate
        return curate.hash_split(
            _read(sf, "documents", columns=["doc_id"])).sort("doc_id")

    def q_cross_source_dups(sf):
        """Cross-source duplicate-pair matrix keyed on each doc's
        first-3-token prefix (shared boilerplate provenance): counts
        are closed-form per digest class (cnt_a*cnt_b / C(cnt,2)), one
        digest exchange — a viral prefix's 10^12 pairs are one
        multiplication, never rows (docs_dedup.cross_source_dup_matrix)."""
        import numpy as np
        import pyarrow as pa
        from kmcp_ray import docs_dedup, text as ktext

        def add_pfx(t: "pa.Table") -> "pa.Table":
            flat, rows, n = ktext.tokenize(t.column("text"))
            n_tok = np.bincount(rows, minlength=n).astype(np.int64) \
                if len(rows) else np.zeros(n, np.int64)
            starts = np.concatenate(([0], np.cumsum(n_tok)))[:-1]
            s = np.where(n_tok > 0, flat[np.minimum(starts, max(len(flat) - 1, 0))]
                         if len(flat) else "", "").astype(object)
            for d in (1, 2):
                m = n_tok > d
                if m.any():
                    s[m] = s[m] + " " + flat[starts[m] + d]
            return pa.table({"source": t.column("source"),
                             "pfx": pa.array(s, pa.string())})

        docs = _read(sf, "documents", columns=["source", "text"]) \
            .map_batches(add_pfx, batch_format="pyarrow",
                         zero_copy_batch=True)
        return docs_dedup.cross_source_dup_matrix(docs, text_col="pfx") \
            .sort(["source_a", "source_b"])

    def q_event_funnel(sf):
        """Ordered funnel signup→view→click→purchase: per-user greedy
        earliest-completion chain with strictly increasing timestamps —
        one hash exchange on user_id, vectorized per-partition sweep
        (windows.event_funnel)."""
        from kmcp_ray import windows
        return windows.event_funnel(
            _read(sf, "events", columns=["ts", "user_id", "event_type"]),
            ["signup", "view", "click", "purchase"])

    def q_sessionize(sf):
        """Gap-based sessionization (30-min window) — the windowed
        aggregate Ray Data lacks, composed as groupby(user) + one
        vectorized in-group sweep; value totals in integer cents so
        engine and SQL sum bit-identically."""
        from kmcp_ray import windows
        return windows.sessionize(
            _read(sf, "events",
                  columns=["event_id", "ts", "user_id", "value"]),
            gap_minutes=30).sort(["user_id", "session_id"])

    def q_running_window(sf):
        """Per-user running total + 3-row trailing sum, one row per
        event — the SQL windowed-frame pair (UNBOUNDED PRECEDING and
        ROWS 2 PRECEDING) as one groupby(user) shuffle + two cumsum
        lines per group; integer cents for bit parity."""
        from kmcp_ray import windows
        return windows.running_window(
            _read(sf, "events",
                  columns=["event_id", "ts", "user_id", "value"]),
            window_rows=3).sort(["user_id", "ts_us", "event_id"])

    def q_big_orders(sf):
        """TPC-H Q18 shape (group-HAVING + double join + top-k):
        lineitem quantity partials finish inside the orderkey
        exchange, HAVING filter where the sums complete, customer
        name attached through a second packed exchange, exact
        integer money columns."""
        cust = _read(sf, "customer", columns=["c_custkey", "c_name"])
        orders = _read(sf, "orders",
                       columns=["o_orderkey", "o_custkey", "o_orderdate",
                                "o_totalprice"])
        li = _read(sf, "lineitem", columns=["l_orderkey", "l_quantity"])
        return relops.big_orders_topk(cust, orders, li,
                                      min_qty_c2=15000, k=100)

    def q_order_revenue(sf):
        """3-table star join (customer ⨝ orders ⨝ lineitem), TPC-H-Q3
        shape: lineitem pre-aggregated map-side, packed-exchange
        semi-join on custkey, packed inner join on orderkey,
        partial-then-global top-10 by exact integer revenue."""
        cust = _read(sf, "customer", columns=["c_custkey", "c_mktsegment"])
        orders = _read(sf, "orders",
                       columns=["o_orderkey", "o_custkey", "o_orderdate"])
        li = _read(sf, "lineitem",
                   columns=["l_orderkey", "l_extendedprice", "l_discount",
                            "l_shipdate"])
        return relops.order_revenue_topk(cust, orders, li,
                                         segment="BUILDING",
                                         cutoff="1998-06-01", k=10)

    def q_brand_revenue(sf):
        """Generic distributed inner join (joins.hash_join): lineitem
        pre-aggregated per partkey map-side, joined to part on the
        packed exchange, then a brand-sized groupby — fact table never
        moves raw rows."""
        import pyarrow as pa
        import pyarrow.compute as pc
        from ray.data.aggregate import Count, Sum

        from kmcp_ray.joins import hash_join

        def li_partial(t: "pa.Table") -> "pa.Table":
            pk = t.column("l_partkey").to_numpy(zero_copy_only=False)
            price = np.rint(t.column("l_extendedprice")
                            .to_numpy(zero_copy_only=False) * 100.0) \
                .astype(np.int64)
            disc = np.rint(t.column("l_discount")
                           .to_numpy(zero_copy_only=False) * 100.0) \
                .astype(np.int64)
            rev = price * (100 - disc)
            u, inv = np.unique(pk, return_inverse=True)
            return pa.table({
                "l_partkey": pa.array(u, pa.int64()),
                "rev_c4": pa.array(np.bincount(inv, weights=rev)
                                   .astype(np.int64), pa.int64())})

        li = _read(sf, "lineitem", columns=["l_partkey", "l_extendedprice",
                                            "l_discount"]) \
            .map_batches(li_partial, batch_format="pyarrow",
                         zero_copy_batch=True) \
            .groupby("l_partkey") \
            .aggregate(Sum("rev_c4", alias_name="rev_c4"))
        part = _read(sf, "part", columns=["p_partkey", "p_brand"])
        joined = hash_join(li, part, key="l_partkey", right_key="p_partkey",
                           how="inner", left_cols=[("rev_c4", pa.int64())],
                           right_cols=[("p_brand", pa.string())], P=32)
        return joined.groupby("p_brand").aggregate(
            Count(alias_name="n_parts"),
            Sum("rev_c4", alias_name="rev_c4")).sort("p_brand")

    def q_customers_no_urgent(sf):
        """Distributed ANTI join (joins.hash_join how='anti'):
        customers with no 1-URGENT order — NOT EXISTS at scale, both
        sides partitioned, nothing broadcast."""
        import pyarrow as pa
        import pyarrow.compute as pc

        from kmcp_ray.joins import hash_join

        cust = _read(sf, "customer", columns=["c_custkey", "c_mktsegment"])
        urgent = _read(sf, "orders",
                       columns=["o_custkey", "o_orderpriority"]) \
            .map_batches(lambda t: t.filter(
                pc.equal(t.column("o_orderpriority"),
                         pa.scalar("1-URGENT"))).select(["o_custkey"]),
                batch_format="pyarrow", zero_copy_batch=True)
        return hash_join(cust, urgent, key="c_custkey",
                         right_key="o_custkey", how="anti",
                         left_cols=[("c_mktsegment", pa.string())],
                         P=32).sort("c_custkey")

    def q_cohort_retention(sf):
        """Cohort-retention matrix over events: first-active-day cohort
        × day offset → distinct active users; map-side (user, day)
        dedup, one groupby(user), one cell-sized count."""
        from kmcp_ray import windows
        return windows.cohort_retention(
            _read(sf, "events", columns=["user_id", "ts"])) \
            .sort(["cohort_day", "day_offset"])

    def q_source_balance(sf):
        """Temperature-style source balancing: cap each source at ~40
        docs in expectation via integer ppm rates + the SQL-mirrorable
        id hash — one source-sized count, broadcast rates, stateless
        filter (corpus never shuffles)."""
        from kmcp_ray import curate
        return curate.source_balance(
            _read(sf, "documents", columns=["doc_id", "source"]),
            cap=40).select_columns(["doc_id", "source"]).sort("doc_id")

    def q_rollup_agg(sf):
        """Grouping-sets ROLLUP (lang, source) in one shuffle: map-side
        partials expanded to all three granularities with an '<all>'
        sentinel, then a single groupby.sum."""
        return relops.rollup_agg(
            _read(sf, "documents", columns=["lang", "source", "n_chars"])) \
            .sort(["lang", "source"])

    def q_span_dedup(sf):
        """C4-style duplicated-span removal: non-overlapping 5-token
        windows, global first occurrence wins, docs re-emitted as the
        surviving token stream — windows ride the one shuffle as 16 B
        hash+packed rows, text never moves (curate.span_dedup)."""
        from kmcp_ray import curate
        return curate.span_dedup(
            _read(sf, "documents", columns=["doc_id", "text"]),
            w=5).sort("doc_id")

    def q_fuzzy_decontaminate(sf):
        """NEAR-dup benchmark decontamination: docs (doc_id % 20 == 0)
        form the eval set; corpus docs with distinct-shingle Jaccard
        >= 0.5 against ANY eval doc are dropped — broadcast postings,
        one stateless corpus pass, zero shuffle."""
        import pyarrow as pa
        from kmcp_ray import curate
        docs = _read(sf, "documents", columns=["doc_id", "text", "lang"])

        def split(keep_eval):
            def fn(t: "pa.Table") -> "pa.Table":
                ids = t.column("doc_id").to_numpy(zero_copy_only=False)
                m = (ids % 20) == 0
                return t.filter(pa.array(m if keep_eval else ~m))
            return fn

        eval_ds = docs.map_batches(split(True), batch_format="pyarrow",
                                   zero_copy_batch=True)
        corpus = docs.map_batches(split(False), batch_format="pyarrow",
                                  zero_copy_batch=True)
        out = curate.fuzzy_decontaminate(corpus, eval_ds, k=3,
                                         min_jacc_u=500_000)
        return out.select_columns(["doc_id", "lang"]).sort("doc_id")

    def q_label_outliers(sf):
        """Per-label centroid outliers: the 5 vectors farthest (cosine)
        from their own label's mean — broadcast centroids, map-side
        k-worst combine, label-sized finish; rank-only output so engine
        and SQL agree without float columns."""
        from kmcp_ray import ann
        return ann.label_outliers(
            _read(sf, "embeddings",
                  columns=["vec_id", "label", "embedding"]),
            k=5).sort(["label", "rank"])

    def q_hard_negatives(sf):
        """Hard-negative mining: per query vector, the top-5 most
        cosine-similar rows of a DIFFERENT label — topk_cosine's
        label-exclusion arm (broadcast queries+labels, one matmul +
        one label-mask compare per batch, tie-exact partial top-k)."""
        import pyarrow.parquet as pq
        emb = pq.read_table(f"{sf}/embeddings.parquet",
                            columns=["vec_id", "embedding", "label"])
        ids = emb.column("vec_id").to_numpy().astype(np.int64)
        mask = (ids >= 16) & (ids < 24)
        mat = np.stack([np.asarray(v, dtype=np.float64)
                        for v in emb.column("embedding").to_pylist()])
        labs = emb.column("label").to_numpy().astype(np.int64)
        ds = _read(sf, "embeddings",
                   columns=["vec_id", "embedding", "label"])
        return ann.hard_negatives(
            ds, (ids[mask], mat[mask], labs[mask]), k=5)

    def q_semantic_dedup_label(sf):
        """Group-exact semantic dedup: within each label, connected
        components of the cosine>=0.3 graph, min-id representative —
        the SQL-mirrorable arm of the SemDeDup kernel (one groupby,
        chunked sim matrix + min-label propagation per group)."""
        from kmcp_ray import kmeans
        ds = _read(sf, "embeddings",
                   columns=["vec_id", "label", "embedding"])
        return kmeans.group_semantic_dedup(ds, "label", 0.3) \
            .sort("vec_id")

    def q_semantic_dedup(sf):
        """SemDeDup (Abbas et al. 2023): distributed fixed-point Lloyd
        k-means partition -> per-cluster cosine components -> min-id
        survivor, at nprobe=2 (each row joins its 2 closest clusters;
        per-probe components merged via the shared pairs->union-find
        tail — measured pair recall 0.95+ vs 0.35 single-probe in
        tests/test_kmeans.py, precision exact by construction).  No
        SQL oracle — k-means iterations aren't SQL-expressible."""
        from kmcp_ray import kmeans
        ds = _read(sf, "embeddings", columns=["vec_id", "embedding"])
        return kmeans.semantic_dedup(ds, k=8, threshold=0.3, iters=3,
                                     nprobe=2).sort("vec_id")

    def q_perplexity_score(sf):
        """CCNet-style bigram-LM perplexity scoring: add-V smoothed
        NLL under a reference LM fit on the doc_id%10==0 slice —
        quantized integer log-probs summed exactly per doc (one
        vocab-bounded fit groupby + one broadcast scoring pass)."""
        import pyarrow as pa
        from kmcp_ray import ppl
        docs = _read(sf, "documents", columns=["doc_id", "text"])

        def ref_slice(t: "pa.Table") -> "pa.Table":
            ids = t.column("doc_id").to_numpy(zero_copy_only=False)
            return t.filter(pa.array(ids % 10 == 0))

        ref = docs.map_batches(ref_slice, batch_format="pyarrow",
                               zero_copy_batch=True)
        lm = ppl.fit_bigram_lm(ref)
        return ppl.nll_scores(docs, lm).sort("doc_id")

    def q_dedup_audit(sf):
        """Sampled LSH-quality audit: production config vs exact knobs
        on a 30% hash sample, ONE row of pair precision/recall — the
        per-epoch dedup health check (rows-only driver check; the LSH
        arm is not SQL-expressible, invariants pinned in
        tests/test_docs_dedup.py)."""
        return docs_dedup.dedup_audit(
            _docs(sf), DedupConfig(num_partitions=16), sample_pct=70)

    def q_mixture_resample(sf):
        """Data-mixing: largest deterministic subset matching a 2:1
        source-weight mixture (src0-4 doubled) — integer-exact quotas
        off the bottleneck source, per-source hash-rank selection via
        the distributed prefix-sum ranking."""
        from kmcp_ray import curate
        targets = {f"src{i}": (2 if i < 5 else 1) for i in range(20)}
        docs = _read(sf, "documents", columns=["doc_id", "source"])
        return curate.mixture_resample(docs, targets).sort("doc_id")

    def q_quality_filter_pctl(sf):
        """Per-source percentile quality gate: keep docs at/above their
        own source's p25 integer quality score — scoring pass +
        distributed per-source exact order statistic (group_quantiles
        semantics) + broadcast-threshold filter pass."""
        from kmcp_ray import curate
        docs = _read(sf, "documents",
                     columns=["doc_id", "text", "source"])
        return curate.quality_filter_pctl(docs, pct=25).sort("doc_id")

    def q_asof_join(sf):
        """As-of join: each event picks the latest order of the same
        key at-or-before its timestamp — tag/union/groupby + one
        searchsorted per group; right-side (key, ts) ties keep the max
        orderkey so the match is deterministic."""
        from kmcp_ray import windows
        ev = _read(sf, "events", columns=["event_id", "ts", "user_id"])
        od = _read(sf, "orders",
                   columns=["o_orderkey", "o_custkey", "o_orderdate"])
        return windows.asof_join(ev, od).sort("event_id")

    def q_range_join(sf):
        """Range join: pairs of same-part shipments where the right
        ship date falls in the left's trailing 90-day window — two
        searchsorted bounds + vectorized repeat/gather per part group
        (includes the self pair, as the interval predicate does)."""
        import pyarrow as pa
        from kmcp_ray import windows

        def uid(t: "pa.Table") -> "pa.Table":
            ok = t.column("l_orderkey").to_numpy(zero_copy_only=False)
            ln = t.column("l_linenumber") \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table({"l_partkey": t.column("l_partkey"),
                             "uid": pa.array(ok * 10 + ln, pa.int64()),
                             "l_shipdate": t.column("l_shipdate")})

        li = _read(sf, "lineitem", columns=[
            "l_orderkey", "l_linenumber", "l_partkey", "l_shipdate"]) \
            .map_batches(uid, batch_format="pyarrow", zero_copy_batch=True)
        out = windows.range_join(
            li, li, window_days=90,
            left_key="l_partkey", left_ts="l_shipdate", left_id="uid",
            right_key="l_partkey", right_ts="l_shipdate", right_val="uid")
        return out.sort(["left_id", "right_id"])

    def q_repetition_score(sf):
        """Gopher/C4-style intra-doc repetition signal: duplicate
        3-shingle fraction per doc, integer-milli so it hashes stably."""
        from kmcp_ray import curate
        return curate.repetition_score(
            _read(sf, "documents", columns=["doc_id", "text"])) \
            .sort("doc_id")

    def q_select_reps(sf):
        """Cluster-representative selection after near-dup clustering:
        keep the longest document (n_chars, ties min id) per minhash
        cluster — the "which duplicate survives" policy step; oracle =
        row_number window over the SQL transitive closure."""
        assign = docs_dedup.minhash_dedup(_docs(sf), ex_cfg)
        docs = _read(sf, "documents", columns=["doc_id", "n_chars"])
        return docs_dedup.select_representatives(assign, docs)

    def q_corpus_diff(sf):
        """Epoch-to-epoch corpus delta (added/removed/changed/same by
        content hash): two deterministically derived versions of the
        documents table — old drops doc_id%7==0, new drops doc_id%10==0
        and appends ' v2' to doc_id%5==0 texts; oracle = the FULL OUTER
        JOIN CASE."""
        import pyarrow as pa
        from kmcp_ray.increment import corpus_diff
        docs = _docs(sf)

        def derive(drop_mod: int, with_edit: bool):
            def fn(t: pa.Table) -> pa.Table:
                ids = t.column("doc_id").to_numpy(zero_copy_only=False)
                texts = t.column("text").to_numpy(zero_copy_only=False)
                texts = np.where(texts == None, "", texts)  # noqa: E711
                keep = ids % drop_mod != 0
                ids, texts = ids[keep], texts[keep]
                if with_edit:
                    ed = ids % 5 == 0
                    texts = texts.astype(object)
                    texts[ed] = [s + " v2" for s in texts[ed]]
                return pa.table({"doc_id": pa.array(ids, pa.int64()),
                                 "text": pa.array(texts, pa.string())})
            return fn

        old = docs.map_batches(derive(7, False), batch_format="pyarrow",
                               zero_copy_batch=True)
        new = docs.map_batches(derive(10, True), batch_format="pyarrow",
                               zero_copy_batch=True)
        return corpus_diff(old, new)

    def q_pack_sequences(sf):
        """Context-window sequence packing (budget=256 tokens):
        distributed exclusive prefix sum in doc_id order — per-range
        token totals broadcast as offsets, in-group vectorized cumsum;
        oracle = the SQL running-sum window."""
        from kmcp_ray import curate
        return curate.pack_sequences(
            _read(sf, "documents", columns=["doc_id", "text"]),
            budget=256, num_partitions=16)

    def q_shingle_hll(sf):
        """HyperLogLog distinct-shingle sketch (p=12) with the
        md5-derived hash: the REGISTER-STATE histogram is deterministic
        pure integers, so even the approximate sketch is
        driver-hash-checkable; estimate accuracy is pytest-pinned."""
        from kmcp_ray import hll
        regs, _est = hll.shingle_hll(
            _read(sf, "documents", columns=["text"]), k=3, p=12,
            token_hash="md5")
        return hll.register_histogram(regs)

    def q_token_cms(sf):
        """Count-min sketch of token occurrences (d=4, w=2048) with the
        md5-derived row hashes: counters are exact integer sums, so the
        ENTIRE sketch state is driver-hash-checkable; over-estimate
        bounds are pytest-pinned (tests/test_sketches_diag.py)."""
        from kmcp_ray import cms
        sk = cms.token_cms(
            _read(sf, "documents", columns=["text"]), d=4, w=2048,
            token_hash="md5")
        return cms.counter_table(sk)

    def q_hopping_window(sf):
        """1-hour windows hopping every 15 min over events: batch-local
        expand×4 + pre-aggregate, one row per (block, window) shuffles."""
        from kmcp_ray import windows
        return windows.hopping_window_agg(
            _read(sf, "events", columns=["ts", "value"])).sort("win_id")

    def q_doc_len_quantiles(sf):
        """Exact order statistics of doc length via the distinct-value
        histogram — no global sort, driver state bounded by metric
        cardinality."""
        return relops.exact_quantiles(
            _read(sf, "documents", columns=["n_chars"]), "n_chars",
            q_pcts=(25, 50, 90, 99))

    def q_group_quantiles(sf):
        """Per-lang exact doc-length quantiles: histogram collapse +
        in-group rank pick inside map_groups — the distributed form of
        doc_len_quantiles (nothing driver-resident)."""
        return relops.group_quantiles(
            _read(sf, "documents", columns=["lang", "n_chars"]),
            "lang", "n_chars").sort(["lang", "q_pct"])

    def q_normalized_dedup(sf):
        """Fuzzy-exact dedup: canonicalize text (lower / strip
        punctuation / collapse whitespace), then exact dedup on the
        canonical form.  The corpus is already normalized, so messy
        copies are PLANTED deterministically (doc_id%10==3 rows gain an
        upper-cased, double-spaced, punctuated twin at id+1e9) — the
        pii_scrub planting pattern; oracle mirrors with UNION ALL."""
        import pyarrow as pa

        def plant(t: "pa.Table") -> "pa.Table":
            ids = t.column("doc_id").to_numpy(zero_copy_only=False)
            txt = t.column("text").to_numpy(zero_copy_only=False)
            sel = np.nonzero(ids % 10 == 3)[0]
            messy = np.array(
                ["!! " + (txt[i] or "").upper().replace(" ", "  ") + " ??"
                 for i in sel], dtype=object)
            return pa.table({
                "doc_id": pa.array(
                    np.concatenate([ids, ids[sel] + 1_000_000_000]),
                    pa.int64()),
                "text": pa.array(
                    np.concatenate([txt.astype(object), messy]),
                    pa.string())})

        planted = _read(sf, "documents", columns=["doc_id", "text"]) \
            .map_batches(plant, batch_format="pyarrow", zero_copy_batch=True)
        return docs_dedup.normalized_dedup(planted).sort("doc_id")

    def q_group_topk(sf):
        """Per-language top-10 docs by length (the ROW_NUMBER window
        analogue): map-side combiner keeps ≤k rows per group per block,
        one group-count-sized groupby finalizes ranks."""
        from kmcp_ray import windows
        return windows.group_topk(
            _read(sf, "documents", columns=["doc_id", "lang", "n_chars"]),
            k=10).sort(["lang", "rnk"])

    def q_keyword_search(sf):
        """Boolean AND keyword search over token sets (kmcp multi-DB
        intersection J2 re-expressed for posting semantics): terms ride
        a broadcast closure, the filter streams with zero shuffle."""
        from kmcp_ray import curate
        return curate.keyword_search(
            _read(sf, "documents", columns=["doc_id", "lang", "text"]),
            ["customer", "spark", "agg", "big", "slow"]).sort("doc_id")

    def q_doc_top_term(sf):
        """Per-doc dominant term under (tf desc, token asc) —
        integer-exact keyword extraction, float-free oracle."""
        from kmcp_ray import curate
        return curate.doc_top_term(
            _read(sf, "documents", columns=["doc_id", "text"])) \
            .sort("doc_id")

    def q_bigram_topk(sf):
        """Global top-25 adjacent-token bigrams (collocation mining):
        per-batch np.unique combine → bigram-sized groupby sum →
        (cnt desc, w1, w2) top-k."""
        from kmcp_ray import curate
        return curate.bigram_topk(
            _read(sf, "documents", columns=["text"]), topk=25)

    def q_distinctive_term(sf):
        """Per-doc most distinctive term under (tf desc, global df asc,
        token asc) — integer-exact idf analogue.  Two corpus passes:
        vocab-sized df aggregate, then broadcast-probe selection (the
        exchange arm takes over past the measured-vocab gate)."""
        from kmcp_ray import curate
        return curate.distinctive_term(
            _read(sf, "documents", columns=["doc_id", "text"])) \
            .sort("doc_id")

    def q_dup_rate_by_source(sf):
        """Per-source duplication dashboard: docs, corpus-wide dup
        docs, distinct texts — one content-hash partition groupby,
        partials reduce to ≤1 row per (partition, source)."""
        return docs_dedup.dup_rate_by_source(
            _read(sf, "documents", columns=["source", "text"])) \
            .sort("source")

    return {
        "exact_dedup_docs": q_exact_dedup,
        "token_count": q_token_count,
        "token_stats": q_token_stats,
        "corpus_funnel": q_corpus_funnel,
        "doc_stats": q_doc_stats,
        "lang_source_agg": q_lang_source_agg,
        "events_type_agg": q_events_type_agg,
        "events_hourly_user": q_events_hourly_user,
        "lineitem_pricing": q_lineitem_pricing,
        "top_docs_by_len": q_top_docs,
        "cov2simi": q_cov2simi,
        "ann_topk": q_ann_topk,
        "ann_ivf_topk": q_ann_ivf_topk,
        "ann_ivf_persisted": q_ann_ivf_persisted,
        "embedding_pairs": q_embedding_pairs,
        "embedding_dedup": q_embedding_dedup,
        "minhash_dedup_docs": q_minhash_dedup,
        "incremental_dedup": q_incremental_dedup,
        "simhash_dedup_docs": q_simhash_dedup,
        "hamming_topk": q_hamming_topk,
        "ngram_jaccard_pairs": q_ngram_pairs,
        "consensus_pairs": q_consensus_pairs,
        "doc_fingerprint": q_fingerprint,
        "lang_id": q_lang_id,
        "quality_score": q_quality,
        "lsh_cosine_pairs": q_lsh_cosine,
        "pairs_dedup_pipeline": q_pairs_pipeline,
        "search_docs": q_search_docs,
        "search_merge_docs": q_search_merge,
        "search_intersect_docs": q_search_intersect,
        "substr_containment": q_substr,
        "cluster_profile": q_cluster_profile,
        "profile_em": q_profile_em,
        "longdoc_overlap": q_longdoc_overlap,
        "merge_regions": q_merge_regions,
        "assign_best_target": q_assign_best,
        "docs_pushdown_scan": q_docs_pushdown,
        "search_indexed_docs": q_search_indexed,
        "decode_verify": q_decode_verify,
        "resize_images": q_resize_images,
        "frame_sample": q_frame_sample,
        "image_features": q_image_features,
        "image_dedup": q_image_dedup,
        "bucket_stats": q_bucket_stats,
        "substr_exact": q_substr_exact,
        "token_jaccard_pairs": q_token_jaccard,
        "grouped_sketch": q_grouped_sketch,
        "search_exact_docs": q_search_exact,
        "hash_sample": q_hash_sample,
        "novelty_score": q_novelty_score,
        "contrastive_triplets": q_contrastive_triplets,
        "oov_rate": q_oov_rate,
        "winsorize": q_winsorize,
        "triangle_count": q_triangle_count,
        "edit_distance_pairs": q_edit_distance,
        "curriculum_order": q_curriculum_order,
        "heavy_hitters": q_heavy_hitters,
        "pmi_pairs": q_pmi_pairs,
        "boilerplate_dedup": q_boilerplate_dedup,
        "global_shuffle": q_global_shuffle,
        "hash_split": q_hash_split,
        "stratified_sample": q_stratified_sample,
        "decontaminate": q_decontaminate,
        "bloom_decontaminate": q_bloom_decontaminate,
        "vocab_topk": q_vocab_topk,
        "pii_scrub": q_pii_scrub,
        "sessionize": q_sessionize,
        "hopping_window": q_hopping_window,
        "running_window": q_running_window,
        "order_revenue": q_order_revenue,
        "big_orders": q_big_orders,
        "brand_revenue": q_brand_revenue,
        "customers_no_urgent": q_customers_no_urgent,
        "cohort_retention": q_cohort_retention,
        "event_funnel": q_event_funnel,
        "cross_source_dups": q_cross_source_dups,
        "gopher_filter": q_gopher_filter,
        "dsir_select": q_dsir_select,
        "audio_features": q_audio_features,
        "region_revenue": q_region_revenue,
        "label_outliers": q_label_outliers,
        "hard_negatives": q_hard_negatives,
        "semantic_dedup_label": q_semantic_dedup_label,
        "perplexity_score": q_perplexity_score,
        "mixture_resample": q_mixture_resample,
        "dedup_audit": q_dedup_audit,
        "semantic_dedup": q_semantic_dedup,
        "quality_filter_pctl": q_quality_filter_pctl,
        "fuzzy_decontaminate": q_fuzzy_decontaminate,
        "span_dedup": q_span_dedup,
        "source_balance": q_source_balance,
        "rollup_agg": q_rollup_agg,
        "asof_join": q_asof_join,
        "range_join": q_range_join,
        "doc_len_quantiles": q_doc_len_quantiles,
        "group_quantiles": q_group_quantiles,
        "repetition_score": q_repetition_score,
        "shingle_hll": q_shingle_hll,
        "token_cms": q_token_cms,
        "pack_sequences": q_pack_sequences,
        "select_representatives": q_select_reps,
        "corpus_diff": q_corpus_diff,
        "normalized_dedup": q_normalized_dedup,
        "group_topk": q_group_topk,
        "keyword_search": q_keyword_search,
        "doc_top_term": q_doc_top_term,
        "bigram_topk": q_bigram_topk,
        "distinctive_term": q_distinctive_term,
        "dup_rate_by_source": q_dup_rate_by_source,
    }


# ------------------------------------------------------------- oracle SQL

def oracle_sql() -> dict[str, str]:
    from kmcp_ray.curate import EMAIL_RE as _EMAIL_RE
    from kmcp_ray.curate import LONGNUM_RE as _LONGNUM_RE
    from kmcp_ray.curate import sample_hash_sql
    _h32 = sample_hash_sql("doc_id")

    # shared CTE: exact distinct 3-token-shingle sets per document +
    # per-doc kept counts — the SQL mirror of the engine's scale=1
    # (exact containment) sketch.  {QF}/{RF} filter the two join sides;
    # {GATES} holds the per-query thresholds.
    shingle_cte = """
            WITH t AS (
                SELECT CAST(doc_id AS VARCHAR) AS id, doc_id AS did,
                       regexp_extract_all(lower(coalesce(text, '')),
                                          '[a-z0-9]+') AS tk
                FROM documents
            ), sh AS (
                SELECT id, did, unnest(
                    CASE WHEN len(tk) >= 3 THEN list_transform(
                              generate_series(1, len(tk) - 2),
                              i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])
                         WHEN len(tk) > 0 THEN [array_to_string(tk, ' ')]
                         ELSE [] END) AS s
                FROM t
            ), d AS (
                SELECT DISTINCT id, did, s FROM sh
            ), cnt AS (
                SELECT id, count(*) AS n FROM d GROUP BY id
            ), shared AS (
                SELECT q.id AS query, q.did AS qdid,
                       r.id AS target, r.did AS tdid,
                       count(*) AS m_shared
                FROM d q JOIN d r USING (s)
                WHERE ({QF}) AND ({RF}) AND ({SELF})
                GROUP BY 1, 2, 3, 4
            ), scored AS (
                SELECT query, target, m_shared,
                       cq.n AS q_kept, cr.n AS t_kept,
                       CAST(floor(1000000.0 * m_shared / cq.n) AS BIGINT)
                           AS qcov_u,
                       CAST(floor(1000000.0 * m_shared / cr.n) AS BIGINT)
                           AS tcov_u,
                       CAST(floor(1000000.0 * m_shared
                                  / (cq.n + cr.n - m_shared)) AS BIGINT)
                           AS jacc_u
                FROM shared
                JOIN cnt cq ON cq.id = query
                JOIN cnt cr ON cr.id = target
                WHERE {GATES}
            )
    """

    def containment(qf, rf, gates, tail, self_cond="q.did <> r.did"):
        return (shingle_cte
                .replace("{QF}", qf).replace("{RF}", rf)
                .replace("{SELF}", self_cond)
                .replace("{GATES}", gates) + tail)

    # binomial-tail significance gate (kmcp query-fpr, M16) in SQL:
    # P(X >= m), X ~ Binom(q_kept, p), p = min(0.999, t_kept / 2^20) —
    # the lgamma mirror of relops.binom_sf's log-factorial sum
    fpr_expr = (
        "least(1.0, list_sum(list_transform("
        "generate_series(m_shared, cq.n), j -> "
        "exp(lgamma(cq.n + 1) - lgamma(j + 1) - lgamma(cq.n - j + 1)"
        " + j * ln(least(0.999, cr.n / 1048576.0))"
        " + (cq.n - j) * ln(1.0 - least(0.999, cr.n / 1048576.0))))))")

    # shared pair-predicate CTE chain for the dedup-family oracles:
    # exact distinct 3-shingle sets over {SRC}(did, text) → pairwise
    # shared counts → the engine's exact-mode verification predicate
    # (jacc >= 0.7 OR containment >= 0.9 — ex_cfg in queries())
    pair_cte = """
            t AS (
                SELECT did,
                       regexp_extract_all(lower(coalesce(text, '')),
                                          '[a-z0-9]+') AS tk
                FROM {SRC}
            ), sh AS (
                SELECT did, unnest(
                    CASE WHEN len(tk) >= 3 THEN list_transform(
                              generate_series(1, len(tk) - 2),
                              i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])
                         WHEN len(tk) > 0 THEN [array_to_string(tk, ' ')]
                         ELSE [] END) AS s
                FROM t
            ), d AS (
                SELECT DISTINCT did, s FROM sh
            ), cnt AS (
                SELECT did, count(*) AS n FROM d GROUP BY did
            ), shared AS (
                SELECT a.did AS ia, b.did AS ib, count(*) AS c
                FROM d a JOIN d b USING (s)
                WHERE a.did < b.did GROUP BY 1, 2
            ), scoredp AS (
                SELECT ia, ib, c, ca.n AS na, cb.n AS nb,
                       1.0 * c / (ca.n + cb.n - c) AS jacc,
                       1.0 * c / least(ca.n, cb.n) AS ctn
                FROM shared
                JOIN cnt ca ON ca.did = ia
                JOIN cnt cb ON cb.did = ib
            )
    """

    # transitive closure → canonical min-id cluster per node (the CC +
    # emission stages); expects CTEs edges(ia, ib) and nodes(did)
    closure_tail = """
            , sym AS (
                SELECT ia AS x, ib AS y FROM edges
                UNION SELECT ib, ia FROM edges
            ), reach(a, b) AS (
                SELECT did, did FROM nodes
                UNION
                SELECT reach.a, sym.y FROM reach JOIN sym ON sym.x = reach.b
            )
            SELECT a AS doc_id, min(b) AS cluster_id FROM reach GROUP BY a
    """

    # caption reconstruction for the arithmetic-planted corpus
    # (testgen.make_arith_corpus): row i's caption is a pure function of
    # the documents table + id arithmetic — partners (i%4==1) derive
    # from the base caption at i-1 by category (i//4)%4
    _arith_caps = """
            texts AS (
                SELECT row_number() OVER (ORDER BY doc_id) - 1 AS rn,
                       array_to_string(regexp_extract_all(
                           lower(coalesce(text, '')), '[a-z0-9]+'), ' ')
                           AS cap
                FROM documents
            ), rows_ AS (
                SELECT unnest(generate_series(0, 599)) AS i
            ), caps0 AS (
                SELECT i, t.cap
                FROM rows_ JOIN texts t
                  ON t.rn = i % (SELECT count(*) FROM texts)
                WHERE i % 4 <> 1
            ), caps1 AS (
                SELECT i,
                       CASE (i // 4) % 4
                         WHEN 0 THEN cap
                         WHEN 1 THEN CASE WHEN len(tk) >= 2
                             THEN array_to_string(
                                      list_slice(tk, 1, len(tk) - 1), ' ')
                                  || ' qdup' || i
                             ELSE cap END
                         WHEN 2 THEN CASE WHEN len(tk) >= 1
                             THEN array_to_string(list_slice(tk, 1,
                                      greatest(1, len(tk) // 2)), ' ')
                             ELSE cap END
                         ELSE 'ph zz ' || i END AS cap
                FROM (SELECT r.i, b.cap,
                             regexp_extract_all(b.cap, '[a-z0-9]+') AS tk
                      FROM rows_ r JOIN caps0 b ON b.i = r.i - 1
                      WHERE r.i % 4 = 1)
            ), allcaps AS (
                SELECT i AS did, cap AS text FROM caps0
                UNION ALL SELECT i, cap FROM caps1
            )
    """

    # 64-bit md5-shingle SimHash per doc (sim(did, sh64)) — shared by
    # simhash_dedup_docs (Hamming-radius closure) and hamming_topk
    # (Hamming top-k retrieval); mirrors textops.simhash_batch(md5)
    _simhash_cte = """
            t AS (
                SELECT doc_id AS did,
                       regexp_extract_all(lower(coalesce(text, '')),
                                          '[a-z0-9]+') AS tk
                FROM documents
            ), sh AS (
                SELECT did, unnest(
                    CASE WHEN len(tk) >= 3 THEN list_transform(
                              generate_series(1, len(tk) - 2),
                              i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])
                         WHEN len(tk) > 0 THEN [array_to_string(tk, ' ')]
                         ELSE [] END) AS s
                FROM t
            ), d AS (
                SELECT DISTINCT did, s FROM sh
            ), h AS (
                SELECT did, ('0x' || substr(md5(s), 1, 16))::UBIGINT AS u
                FROM d
            ), bits AS (
                SELECT did, j,
                       sum(CASE WHEN (u >> j) & 1 = 1 THEN 1 ELSE -1 END)
                           AS vote
                FROM h, (SELECT unnest(generate_series(0, 63)) AS j)
                GROUP BY did, j
            ), sim0 AS (
                SELECT did,
                       CAST(sum(CASE WHEN vote > 0
                                THEN (1::UBIGINT << j)::HUGEINT
                                ELSE 0::HUGEINT END) AS UBIGINT) AS sh64
                FROM bits GROUP BY did
            ), sim AS (
                SELECT doc_id AS did,
                       coalesce(s.sh64, 0::UBIGINT) AS sh64
                FROM documents LEFT JOIN sim0 s ON s.did = doc_id
            )
    """

    # UBIGINT → the int64 bit-view numpy emits (two's complement)
    def i64(expr):
        return (f"CAST(CASE WHEN {expr} >= 9223372036854775808::UBIGINT "
                f"THEN {expr}::HUGEINT - 18446744073709551616::HUGEINT "
                f"ELSE {expr}::HUGEINT END AS BIGINT)")

    # ---- bucket_stats oracle: the FULL md5-twin banding chain in SQL.
    # splitmix64 runs on UBIGINT columns with every 64-bit wraparound
    # multiply decomposed into 32-bit halves so each partial fits
    # HUGEINT; MinHash permutation seeds and per-band fold constants
    # are deterministic (hashing.perm_seeds/band_consts) and embedded
    # as VALUES.  Mirrors sketch.make_sketch_fn(hash_mode="md5") →
    # bands.make_band_fn → diagnostics.bucket_stats bit-for-bit.
    import numpy as _np
    from kmcp_ray import hashing as _hx
    from kmcp_ray.bands import _CONTAIN_SALT as _CSALT
    from kmcp_ray.sketch import _EXACT_SALT as _ESALT

    _M64 = "18446744073709551616::HUGEINT"

    def _mulc(a, c):
        """SQL expr: (a * c) mod 2^64 on HUGEINT, a an expression
        already cast to HUGEINT, c a python-int constant."""
        lo, hi = c & 0xFFFFFFFF, c >> 32
        return (f"((({a}) % 4294967296) * {lo}::HUGEINT + "
                f"(((({a}) % 4294967296) * {hi}::HUGEINT + "
                f"(({a}) // 4294967296) * {lo}::HUGEINT) % 4294967296) * "
                f"4294967296::HUGEINT) % {_M64}")

    def _sm64(src, xexpr, keep):
        """Subquery string computing sm = splitmix64(xexpr) (UBIGINT)
        over ``src`` (CTE name or parenthesized subquery), carrying the
        ``keep`` columns through."""
        k = (", ".join(keep) + ", ") if keep else ""
        c1, c2, c3 = int(_hx._SM_C1), int(_hx._SM_C2), int(_hx._SM_C3)
        s = (f"(SELECT {k}CAST((({xexpr})::HUGEINT + {c1}::HUGEINT) % "
             f"{_M64} AS UBIGINT) AS z1 FROM {src} _a)")
        s = (f"(SELECT {k}CAST({_mulc('xor(z1, z1 >> 30)::HUGEINT', c2)} "
             f"AS UBIGINT) AS z2 FROM {s} _b)")
        s = (f"(SELECT {k}CAST({_mulc('xor(z2, z2 >> 27)::HUGEINT', c3)} "
             f"AS UBIGINT) AS z3 FROM {s} _c)")
        return f"(SELECT {k}xor(z3, z3 >> 31) AS sm FROM {s} _d)"

    _seeds_vals = ", ".join(
        f"({i}, {int(v)}::UBIGINT)"
        for i, v in enumerate(_hx.perm_seeds(64)))
    with _np.errstate(over="ignore"):
        _h0_vals = ", ".join(
            f"({b}, {int(_np.uint64(4) * _hx._MIX_A + c)}::UBIGINT)"
            for b, c in enumerate(_hx.band_consts(16)))
        _k3 = int(_np.uint64(_ESALT) * _hx._MIX_C)   # SALT*MIX_C mod 2^64
    _mixa, _mixb = int(_hx._MIX_A), int(_hx._MIX_B)
    _bmax = (1 << 63) - 1            # bucket_max_hash at bucket_scale=2

    def _fold_step(src, hcol, vcol, keep):
        """One band-fold step: sm64((h + v*MIX_B) mod 2^64)."""
        x = (f"(SELECT {', '.join(keep) + ', ' if keep else ''}"
             f"CAST((({hcol})::HUGEINT + {_mulc(f'({vcol})::HUGEINT', _mixb)})"
             f" % {_M64} AS UBIGINT) AS fx FROM {src} _e)")
        return _sm64(x, "fx", keep)

    _permq = _sm64(
        "(SELECT hs.did, sd.i, xor(hs.u, sd.seed) AS px "
        "FROM hs CROSS JOIN seeds sd)", "px", ["did", "i"])
    _f1 = _fold_step("(SELECT s.did, s.b, s.v1, s.v2, s.v3, b0.h0, s.v0 "
                     "FROM sigb s JOIN b0 USING (b))",
                     "h0", "v0", ["did", "b", "v1", "v2", "v3"])
    _f2 = _fold_step(_f1, "sm", "v1", ["did", "b", "v2", "v3"])
    _f3 = _fold_step(_f2, "sm", "v2", ["did", "b", "v3"])
    _f4 = _fold_step(_f3, "sm", "v3", ["did", "b"])
    _ckq = _sm64(
        f"(SELECT CAST((hs.u::HUGEINT + {int(_CSALT)}::HUGEINT) % {_M64} "
        f"AS UBIGINT) AS cx FROM hs JOIN elig USING (did) "
        f"WHERE hs.u <= {_bmax}::UBIGINT)", "cx", [])
    _exq = _sm64(
        f"(SELECT CAST(({_mulc('capu::HUGEINT', _mixa)} + {_k3}::HUGEINT) "
        f"% {_M64} AS UBIGINT) AS ex FROM "
        f"(SELECT ('0x' || substr(md5(coalesce(text, '')), 1, 16))::UBIGINT "
        f"AS capu FROM documents) _cap)", "ex", [])

    _bucket_stats_sql = f"""
        WITH tokz AS (
            SELECT doc_id AS did,
                   regexp_extract_all(lower(coalesce(text, '')),
                                      '[a-z0-9]+') AS tk
            FROM documents
        ), shz AS (
            SELECT did, unnest(
                CASE WHEN len(tk) >= 3 THEN list_transform(
                          generate_series(1, len(tk) - 2),
                          i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])
                     WHEN len(tk) > 0 THEN [array_to_string(tk, ' ')]
                     ELSE [] END) AS s
            FROM tokz
        ), hs AS (
            SELECT DISTINCT did,
                   ('0x' || substr(md5(s), 1, 16))::UBIGINT AS u
            FROM shz
        ), seeds(i, seed) AS (VALUES {_seeds_vals}
        ), b0(b, h0) AS (VALUES {_h0_vals}
        ), perm AS (
            SELECT did, i, min(sm) AS v FROM {_permq} _p GROUP BY did, i
        ), sigb AS (
            SELECT did, i // 4 AS b,
                   max(CASE WHEN i % 4 = 0 THEN v END) AS v0,
                   max(CASE WHEN i % 4 = 1 THEN v END) AS v1,
                   max(CASE WHEN i % 4 = 2 THEN v END) AS v2,
                   max(CASE WHEN i % 4 = 3 THEN v END) AS v3
            FROM perm GROUP BY did, i // 4
        ), elig AS (
            SELECT did FROM hs GROUP BY did HAVING count(*) >= 8
        ), ent AS (
            SELECT kind, (CAST(kind AS UBIGINT) << 30) + (key >> 34) AS bkey
            FROM (
                SELECT 0 AS kind, sm AS key FROM {_f4} _m
                UNION ALL SELECT 1 AS kind, sm AS key FROM {_ckq} _n
                UNION ALL SELECT 3 AS kind, sm AS key FROM {_exq} _o
            )
        ), buck AS (
            SELECT kind, bkey, count(*) AS sz FROM ent GROUP BY 1, 2
        )
        SELECT CAST(kind AS TINYINT) AS kind,
               CAST(sz AS BIGINT) AS bucket_size,
               CAST(count(*) AS BIGINT) AS n_buckets
        FROM buck GROUP BY 1, 2
    """

    return {
        "bucket_stats": _bucket_stats_sql,
        "exact_dedup_docs": """
            SELECT doc_id,
                   min(doc_id) OVER (PARTITION BY text) AS keep_id,
                   count(*)    OVER (PARTITION BY text) AS n_copies
            FROM documents
        """,
        "token_count": """
            SELECT doc_id,
                   CAST(length(regexp_extract_all(lower(text), '[a-z0-9]+'))
                        AS BIGINT) AS n_tokens
            FROM documents
        """,
        "corpus_funnel": r"""
            WITH toks AS (
                SELECT doc_id,
                       unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
                FROM documents
            ), agg AS (
                SELECT doc_id, count(*) AS n_tokens,
                       count(DISTINCT tok) AS n_uniq_tokens,
                       sum(length(tok)) AS sum_token_len
                FROM toks GROUP BY doc_id
            ), st AS (
                SELECT d.doc_id, d.text,
                       CAST(coalesce(a.n_tokens, 0) AS DOUBLE) AS nt,
                       CAST(coalesce(a.n_uniq_tokens, 0) AS DOUBLE) AS nu,
                       CAST(coalesce(a.sum_token_len, 0) AS DOUBLE) AS sl
                FROM documents d LEFT JOIN agg a USING (doc_id)
            ), gated AS (
                SELECT doc_id, text FROM st
                WHERE CAST(floor(
                     (CASE WHEN nt > 0 THEN nu / nt ELSE 0.0 END)
                     * (1.0 - exp(-nt / 32.0))
                     * (0.5 + 0.5 * least(1.0, greatest(0.0,
                          1.0 - abs((CASE WHEN nt > 0 THEN sl / nt
                                          ELSE 0.0 END) - 5.0) / 10.0)))
                     * 1000000.0) AS BIGINT) >= 300000
            ), surv AS (
                SELECT doc_id, text FROM (
                    SELECT doc_id, text,
                           min(doc_id) OVER (PARTITION BY text) AS keep_id
                    FROM gated
                ) WHERE doc_id = keep_id
            ), lt AS (
                SELECT doc_id, text,
                       regexp_extract_all(lower(coalesce(text, '')),
                                          '[a-z0-9]+') AS tk,
                       substr(coalesce(text, ''), 1, 200) AS head
                FROM surv
            ), sc AS (
                SELECT doc_id, text,
                    len(list_filter(tk, t -> t IN ('der','die','das','und',
                        'ist','nicht','ein','mit','zu','ich'))) AS de,
                    len(list_filter(tk, t -> t IN ('the','and','of','to','a',
                        'in','is','it','you','that'))) AS en,
                    len(list_filter(tk, t -> t IN ('el','la','los','las','es',
                        'un','una','por','para','que'))) AS es,
                    len(list_filter(tk, t -> t IN ('le','la','les','et','est',
                        'un','une','pas','pour','que'))) AS fr,
                    regexp_matches(head, '[^\x00-\x7f]') AS non_ascii
                FROM lt
            ), labeled AS (
                SELECT CASE WHEN non_ascii THEN 'zh'
                            WHEN greatest(de, en, es, fr) = 0 THEN 'und'
                            WHEN de >= en AND de >= es AND de >= fr THEN 'de'
                            WHEN en >= es AND en >= fr THEN 'en'
                            WHEN es >= fr THEN 'es'
                            ELSE 'fr' END AS lang_pred,
                       len(regexp_extract_all(coalesce(text, ''), '\S+'))
                           AS ws
                FROM sc
            )
            SELECT lang_pred, count(*) AS n_docs,
                   CAST(sum(ws) AS BIGINT) AS n_tokens
            FROM labeled GROUP BY lang_pred ORDER BY lang_pred
        """,
        "token_stats": r"""
            SELECT doc_id,
                   CAST(length(regexp_extract_all(coalesce(text, ''),
                        '\S+')) AS BIGINT) AS n_ws_tokens,
                   CAST(length(regexp_extract_all(coalesce(text, ''),
                        '''(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+'))
                        AS BIGINT) AS n_bpe_tokens
            FROM documents
        """,
        "doc_stats": """
            WITH toks AS (
                SELECT doc_id,
                       unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
                FROM documents
            ), agg AS (
                SELECT doc_id,
                       count(*)            AS n_tokens,
                       count(DISTINCT tok) AS n_uniq_tokens,
                       sum(length(tok))    AS sum_token_len
                FROM toks GROUP BY doc_id
            )
            SELECT d.doc_id,
                   CAST(length(d.text) AS BIGINT)          AS n_chars_m,
                   CAST(coalesce(a.n_tokens, 0) AS BIGINT) AS n_tokens,
                   CAST(coalesce(a.n_uniq_tokens, 0) AS BIGINT) AS n_uniq_tokens,
                   CAST(coalesce(a.sum_token_len, 0) AS BIGINT) AS sum_token_len
            FROM documents d LEFT JOIN agg a USING (doc_id)
        """,
        "lang_source_agg": """
            SELECT lang, source,
                   count(*) AS n_docs,
                   CAST(sum(n_chars) AS BIGINT) AS sum_chars
            FROM documents GROUP BY lang, source
            ORDER BY lang, source
        """,
        "events_type_agg": """
            SELECT event_type,
                   count(*) AS n_events,
                   CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
                       AS sum_value_cents,
                   min(CAST(floor(value * 100) AS BIGINT)) AS min_value_cents,
                   max(CAST(floor(value * 100) AS BIGINT)) AS max_value_cents
            FROM events GROUP BY event_type
            ORDER BY event_type
        """,
        "events_hourly_user": """
            SELECT user_id,
                   epoch_us(ts) // 3600000000 AS hour_id,
                   count(*) AS n,
                   CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
                       AS sum_cents
            FROM events GROUP BY user_id, hour_id
            ORDER BY user_id, hour_id
        """,
        "lineitem_pricing": """
            SELECT l_returnflag, l_linestatus,
                   count(*) AS n_rows,
                   CAST(sum(CAST(floor(l_quantity * 100) AS BIGINT)) AS BIGINT)
                       AS sum_qty_x100,
                   CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
                       AS sum_price_cents,
                   CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100)
                       AS BIGINT)) AS BIGINT) AS sum_disc_price_cents
            FROM lineitem GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        "top_docs_by_len": """
            SELECT doc_id, n_chars, lang FROM documents
            ORDER BY n_chars DESC, doc_id ASC LIMIT 10
        """,
        "cov2simi": """
            SELECT l_orderkey, l_linenumber,
                   CAST(floor(
                     least(100.0, greatest(0.0,
                       87.456 + 26.410 * l_discount
                       - 22.008 * l_discount * l_discount
                       + 7.325 * l_discount * l_discount * l_discount)) * 1000000.0)
                   AS BIGINT) AS simi_u
            FROM lineitem
        """,
        "ann_topk": """
            SELECT query_id, neighbor_id, rank FROM (
                SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
                       row_number() OVER (
                           PARTITION BY q.vec_id
                           ORDER BY list_cosine_similarity(q.embedding, e.embedding)
                                    DESC, e.vec_id ASC) AS rank
                FROM embeddings q, embeddings e
                WHERE q.vec_id < 8 AND e.vec_id <> q.vec_id
            ) WHERE rank <= 5
        """,
        "ann_ivf_topk": """
            SELECT query_id, neighbor_id, rank FROM (
                SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
                       row_number() OVER (
                           PARTITION BY q.vec_id
                           ORDER BY list_cosine_similarity(q.embedding, e.embedding)
                                    DESC, e.vec_id ASC) AS rank
                FROM embeddings q, embeddings e
                WHERE q.vec_id >= 8 AND q.vec_id < 16
                  AND e.vec_id <> q.vec_id
            ) WHERE rank <= 5
        """,
        "ann_ivf_persisted": """
            SELECT query_id, neighbor_id, rank FROM (
                SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
                       row_number() OVER (
                           PARTITION BY q.vec_id
                           ORDER BY list_cosine_similarity(q.embedding, e.embedding)
                                    DESC, e.vec_id ASC) AS rank
                FROM embeddings q, embeddings e
                WHERE q.vec_id >= 8 AND q.vec_id < 16
                  AND e.vec_id <> q.vec_id
            ) WHERE rank <= 5
        """,
        "embedding_pairs": """
            SELECT a.vec_id AS id_a, b.vec_id AS id_b
            FROM embeddings a, embeddings b
            WHERE a.vec_id < b.vec_id
              AND list_cosine_similarity(a.embedding, b.embedding) >= 0.4
        """,
        "embedding_dedup": """
            WITH RECURSIVE edges AS (
                SELECT a.vec_id AS u, b.vec_id AS v
                FROM embeddings a, embeddings b
                WHERE a.vec_id <> b.vec_id
                  AND list_cosine_similarity(a.embedding, b.embedding) >= 0.4
            ), reach(u, v) AS (
                SELECT u, v FROM edges
                UNION
                SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
                WHERE e.v <> r.u
            )
            SELECT e.vec_id,
                   coalesce(least(m.mn, e.vec_id), e.vec_id) AS cluster_id
            FROM embeddings e
            LEFT JOIN (SELECT u, min(v) AS mn FROM reach GROUP BY u) m
              ON m.u = e.vec_id
        """,
        "quality_score": """
            WITH toks AS (
                SELECT doc_id,
                       unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
                FROM documents
            ), agg AS (
                SELECT doc_id,
                       count(*)            AS n_tokens,
                       count(DISTINCT tok) AS n_uniq_tokens,
                       sum(length(tok))    AS sum_token_len
                FROM toks GROUP BY doc_id
            ), st AS (
                SELECT d.doc_id,
                       CAST(coalesce(a.n_tokens, 0) AS DOUBLE) AS nt,
                       CAST(coalesce(a.n_uniq_tokens, 0) AS DOUBLE) AS nu,
                       CAST(coalesce(a.sum_token_len, 0) AS DOUBLE) AS sl
                FROM documents d LEFT JOIN agg a USING (doc_id)
            )
            SELECT doc_id,
                   CAST(floor(
                     (CASE WHEN nt > 0 THEN nu / nt ELSE 0.0 END)
                     * (1.0 - exp(-nt / 32.0))
                     * (0.5 + 0.5 * least(1.0, greatest(0.0,
                          1.0 - abs((CASE WHEN nt > 0 THEN sl / nt
                                          ELSE 0.0 END) - 5.0) / 10.0)))
                     * 1000000.0) AS BIGINT) AS quality_u
            FROM st
        """,
        "docs_pushdown_scan": """
            SELECT doc_id, lang, n_chars FROM documents
            WHERE lang = 'en' AND n_chars > 500
            ORDER BY doc_id
        """,
        "merge_regions": """
            WITH iv AS (
                SELECT CAST(user_id % 20 AS VARCHAR) AS chrom,
                       CAST(floor(value * 100) AS BIGINT) AS start,
                       CAST(floor(value * 100) AS BIGINT) + 40 AS "end"
                FROM events
            ), o AS (
                SELECT chrom, start, "end",
                       max("end") OVER (
                           PARTITION BY chrom ORDER BY start, "end"
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND 1 PRECEDING) AS prev_max
                FROM iv
            ), flagged AS (
                SELECT chrom, start, "end",
                       CASE WHEN prev_max IS NULL OR start > prev_max
                            THEN 1 ELSE 0 END AS new_r
                FROM o
            ), grp AS (
                SELECT chrom, start, "end",
                       sum(new_r) OVER (
                           PARTITION BY chrom ORDER BY start, "end"
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW) AS rid
                FROM flagged
            )
            SELECT chrom, min(start) AS start,
                   CAST(max("end") AS BIGINT) AS "end",
                   count(*) AS n_merged
            FROM grp GROUP BY chrom, rid
            ORDER BY chrom, start
        """,
        "lang_id": """
            WITH t AS (
                SELECT doc_id,
                       regexp_extract_all(lower(coalesce(text, '')),
                                          '[a-z0-9]+') AS tk,
                       substr(coalesce(text, ''), 1, 200) AS head
                FROM documents
            ), sc AS (
                SELECT doc_id,
                    len(list_filter(tk, t -> t IN ('der','die','das','und',
                        'ist','nicht','ein','mit','zu','ich'))) AS de,
                    len(list_filter(tk, t -> t IN ('the','and','of','to','a',
                        'in','is','it','you','that'))) AS en,
                    len(list_filter(tk, t -> t IN ('el','la','los','las','es',
                        'un','una','por','para','que'))) AS es,
                    len(list_filter(tk, t -> t IN ('le','la','les','et','est',
                        'un','une','pas','pour','que'))) AS fr,
                    regexp_matches(head, '[^\\x00-\\x7f]') AS non_ascii
                FROM t
            )
            SELECT doc_id,
                   CASE WHEN non_ascii THEN 'zh'
                        WHEN greatest(de, en, es, fr) = 0 THEN 'und'
                        WHEN de >= en AND de >= es AND de >= fr THEN 'de'
                        WHEN en >= es AND en >= fr THEN 'en'
                        WHEN es >= fr THEN 'es'
                        ELSE 'fr' END AS lang_pred
            FROM sc
        """,
        "substr_exact": """
            SELECT a.doc_id AS needle_id, b.doc_id AS hay_id
            FROM documents a JOIN documents b
              ON a.doc_id < 200 AND a.doc_id <> b.doc_id
             AND contains(b.text, substr(a.text, 1, 80))
            ORDER BY needle_id, hay_id
        """,
        "search_exact_docs": containment(
            "q.did < 100", "TRUE",
            "m_shared >= 1 AND 1.0 * m_shared / cq.n >= 0.01",
            "SELECT * FROM scored ORDER BY query, target"),
        "search_docs": containment(
            "q.did < 100", "TRUE",
            "m_shared >= 2 AND 1.0 * m_shared / cq.n >= 0.3 AND "
            + fpr_expr + " <= 0.01",
            "SELECT * FROM scored ORDER BY query, target"),
        "search_merge_docs": containment(
            # two disjoint ref shards (doc_id parity) re-merged == one
            # search over the union; hits counted BEFORE dropping self
            # (the kmcp post-merge hits rewrite semantics)
            "q.did < 30", "TRUE",
            "m_shared >= 1 AND 1.0 * m_shared / cq.n >= 0.05 AND "
            + fpr_expr + " <= 0.05",
            """
            SELECT query, target, m_shared, q_kept, t_kept, qcov_u, hits
            FROM (SELECT query, target, m_shared, q_kept, t_kept, qcov_u,
                         count(*) OVER (PARTITION BY query) AS hits
                  FROM scored)
            WHERE query <> target
            ORDER BY query, target""",
            self_cond="TRUE"),
        "minhash_dedup_docs": (_minhash_closure := """
            WITH RECURSIVE """ + pair_cte.replace(
                "{SRC}", "(SELECT doc_id AS did, text FROM documents)") + """
            , verified AS (
                SELECT ia, ib FROM scoredp
                WHERE jacc >= 0.7 OR ctn >= 0.9
            ), exact_e AS (
                SELECT a.doc_id AS ia, b.doc_id AS ib
                FROM documents a JOIN documents b
                  ON coalesce(a.text, '') = coalesce(b.text, '')
                 AND a.doc_id < b.doc_id
            ), edges AS (
                SELECT ia, ib FROM verified
                UNION SELECT ia, ib FROM exact_e
            ), nodes AS (SELECT doc_id AS did FROM documents)
        """ + closure_tail),
        # incremental epoch growth == from-scratch rebuild (the module
        # invariant), so the oracle is the identical closure
        "incremental_dedup": _minhash_closure,
        "ngram_jaccard_pairs": """
            WITH """ + pair_cte.replace(
                "{SRC}", "(SELECT doc_id AS did, text FROM documents)") + """
            SELECT ia AS id_a, ib AS id_b,
                   CASE WHEN jacc >= 0.7 THEN 'minhash'
                        ELSE 'contain' END AS via,
                   CAST(floor(1000000.0 * CASE WHEN jacc >= 0.7 THEN jacc
                                               ELSE ctn END) AS BIGINT)
                       AS score_u
            FROM scoredp
            WHERE jacc >= 0.7 OR ctn >= 0.9
            ORDER BY id_a, id_b
        """,
        "consensus_pairs": """
            WITH """ + pair_cte.replace(
                "{SRC}", "(SELECT doc_id AS did, text FROM documents)") + """
            SELECT ia AS id_a, ib AS id_b,
                   CASE WHEN jacc >= 0.7 THEN 'minhash'
                        ELSE 'contain' END AS via,
                   CAST(floor(1000000.0 * CASE WHEN jacc >= 0.7 THEN jacc
                                               ELSE ctn END) AS BIGINT)
                       AS score_u,
                   CAST(floor(1000000.0 * list_cosine_similarity(
                            CAST(ea.embedding AS DOUBLE[]),
                            CAST(eb.embedding AS DOUBLE[]))) AS BIGINT)
                       AS cos_u
            FROM scoredp
            JOIN embeddings ea ON ea.vec_id = ia
            JOIN embeddings eb ON eb.vec_id = ib
            WHERE (jacc >= 0.7 OR ctn >= 0.9)
              AND list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),
                                         CAST(eb.embedding AS DOUBLE[]))
                  >= 0.08
            ORDER BY id_a, id_b
        """,
        "substr_containment": """
            WITH base AS (
                SELECT doc_id, coalesce(text, '') AS text FROM documents
            ), planted AS (
                SELECT doc_id + 1000000 AS doc_id,
                       array_to_string(list_slice(
                           regexp_extract_all(text, '\\S+'), 5,
                           4 + greatest(16,
                               len(regexp_extract_all(text, '\\S+')) // 2)),
                           ' ') AS text
                FROM base
                WHERE doc_id % 40 = 0
                  AND len(regexp_extract_all(text, '\\S+')) >= 24
            ), alldocs AS (
                SELECT doc_id AS did, text FROM base
                UNION ALL SELECT doc_id, text FROM planted
            ), """ + pair_cte.replace("{SRC}", "alldocs") + """
            , tok AS (
                SELECT did, array_to_string(tk, ' ') AS tj, len(tk) AS nt
                FROM t
            )
            SELECT ia AS id_a, ib AS id_b,
                   CASE WHEN contains(
                            ' ' || (CASE WHEN a.nt <= b.nt
                                         THEN b.tj ELSE a.tj END) || ' ',
                            ' ' || (CASE WHEN a.nt <= b.nt
                                         THEN a.tj ELSE b.tj END) || ' ')
                        THEN 'substr' ELSE 'contain' END AS via
            FROM scoredp
            JOIN tok a ON a.did = ia
            JOIN tok b ON b.did = ib
            WHERE NOT (jacc >= 0.7) AND ctn >= 0.9
            ORDER BY id_a, id_b
        """,
        "simhash_dedup_docs": "WITH RECURSIVE " + _simhash_cte + """
            , edges AS (
                SELECT a.did AS ia, b.did AS ib
                FROM sim a JOIN sim b ON a.did < b.did
                WHERE bit_count(xor(a.sh64, b.sh64)) <= 7
            ), nodes AS (SELECT doc_id AS did FROM documents)
        """ + closure_tail,
        "hamming_topk": "WITH " + _simhash_cte + """
            SELECT q.did AS query_id, c.did AS neighbor_id,
                   CAST(bit_count(xor(q.sh64, c.sh64)) AS BIGINT) AS dist,
                   CAST(row_number() OVER (
                        PARTITION BY q.did
                        ORDER BY bit_count(xor(q.sh64, c.sh64)), c.did)
                        AS BIGINT) AS rank
            FROM sim q JOIN sim c ON c.did <> q.did
            WHERE q.did < 10
            QUALIFY rank <= 5
        """,
        "doc_fingerprint": """
            WITH t AS (
                SELECT doc_id,
                       regexp_extract_all(lower(coalesce(text, '')),
                                          '[a-z0-9]+') AS tk
                FROM documents
            ), seq AS (
                SELECT doc_id, i.i AS pos,
                       ('0x' || substr(md5(tk[i.i] || ' ' || tk[i.i+1]
                            || ' ' || tk[i.i+2]), 1, 16))::UBIGINT AS h
                FROM t, unnest(generate_series(1, len(tk) - 2)) AS i(i)
                WHERE len(tk) >= 3
            ), wm AS (
                SELECT doc_id, pos,
                       min(h) OVER (PARTITION BY doc_id ORDER BY pos
                                    ROWS BETWEEN CURRENT ROW
                                             AND 3 FOLLOWING) AS mn,
                       count(*) OVER (PARTITION BY doc_id) AS n_seq
                FROM seq
            ), fps AS (
                SELECT DISTINCT doc_id, mn AS fp FROM wm
                WHERE (n_seq <= 4 AND pos = 1)
                   OR (n_seq > 4 AND pos <= n_seq - 3)
            ), agg AS (
                SELECT doc_id, count(*) AS n_fp, min(fp) AS mn,
                       bit_xor(fp) AS fx
                FROM fps GROUP BY doc_id
            )
            SELECT d.doc_id,
                   CAST(coalesce(a.n_fp, 0) AS BIGINT) AS n_fp,
                   coalesce(""" + i64("a.mn") + """, 0) AS min_fp,
                   coalesce(""" + i64("a.fx") + """, 0) AS fp_xor
            FROM documents d LEFT JOIN agg a USING (doc_id)
        """,
        "search_indexed_docs": containment(
            "q.did < 100", "TRUE",
            "m_shared >= 2 AND 1.0 * m_shared / cq.n >= 0.3",
            "SELECT * FROM scored ORDER BY query, target"),
        "search_intersect_docs": containment(
            # targets must be present in BOTH overlapping shards
            # (doc_id%3 in {0,1} and {1,2}) => doc_id%3 == 1; exact
            # counts make the per-shard rows identical, so the
            # min-count intersection row equals the single computation
            "q.did < 100", "r.did % 3 = 1",
            "m_shared >= 1 AND 1.0 * m_shared / cq.n >= 0.01",
            "SELECT * FROM scored ORDER BY query, target"),
        "assign_best_target": containment(
            "q.did < 30", "r.did >= 30",
            "m_shared >= 1 AND 1.0 * m_shared / cq.n >= 0.05",
            """
            SELECT query, target, m_shared, q_kept, t_kept,
                   qcov_u, tcov_u, jacc_u
            FROM (SELECT *, row_number() OVER (
                      PARTITION BY query
                      ORDER BY m_shared DESC, target ASC) AS rn
                  FROM scored)
            WHERE rn = 1
            ORDER BY query, target"""),
        "grouped_sketch": """
            WITH t AS (
                SELECT CAST(doc_id % 50 AS VARCHAR) AS group_id,
                       regexp_extract_all(lower(coalesce(text, '')),
                                          '[a-z0-9]+') AS tk
                FROM documents
            ), sh AS (
                SELECT group_id, unnest(
                    CASE WHEN len(tk) >= 3 THEN list_transform(
                              generate_series(1, len(tk) - 2),
                              i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])
                         WHEN len(tk) > 0 THEN [array_to_string(tk, ' ')]
                         ELSE [] END) AS s
                FROM t
            ), d AS (
                SELECT group_id, count(DISTINCT s) AS n_distinct
                FROM sh GROUP BY group_id
            ), m AS (
                SELECT group_id, count(*) AS n_members,
                       CAST(sum(len(tk)) AS BIGINT) AS n_tokens
                FROM t GROUP BY group_id
            )
            SELECT m.group_id, m.n_members, m.n_tokens,
                   CAST(coalesce(d.n_distinct, 0) AS BIGINT) AS n_distinct
            FROM m LEFT JOIN d USING (group_id)
            ORDER BY group_id
        """,
        "token_jaccard_pairs": """
            WITH toks AS (
                SELECT DISTINCT doc_id,
                       unnest(regexp_extract_all(lower(text),
                                                 '[a-z0-9]+')) AS tok
                FROM documents WHERE doc_id < 300
            ), cnt AS (
                SELECT doc_id, count(*) AS n FROM toks GROUP BY doc_id
            ), shared AS (
                SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                       count(*) AS n_shared
                FROM toks a JOIN toks b USING (tok)
                WHERE a.doc_id < b.doc_id GROUP BY 1, 2
            )
            SELECT id_a, id_b,
                   CAST(floor(1000000.0 * n_shared /
                              (ca.n + cb.n - n_shared)) AS BIGINT)
                       AS jaccard_u
            FROM shared
            JOIN cnt ca ON ca.doc_id = id_a
            JOIN cnt cb ON cb.doc_id = id_b
            WHERE 1000000.0 * n_shared / (ca.n + cb.n - n_shared)
                  >= 650000.0
            ORDER BY id_a, id_b
        """,
        "pairs_dedup_pipeline": """
            WITH RECURSIVE """ + _arith_caps + ", " + pair_cte.replace(
            "{SRC}", "allcaps") + """
            , verified AS (
                SELECT ia, ib FROM scoredp WHERE jacc >= 0.7 OR ctn >= 0.9
            ), planted_e AS (
                SELECT i - 1 AS ia, i AS ib FROM rows_
                WHERE i % 4 = 1
                  AND ((i // 4) % 4 = 0 OR (i // 4) % 4 = 3)
            ), edges AS (
                SELECT ia, ib FROM verified
                UNION SELECT ia, ib FROM planted_e
            ), sym AS (
                SELECT ia AS x, ib AS y FROM edges
                UNION SELECT ib, ia FROM edges
            ), reach(a, b) AS (
                SELECT i, i FROM rows_
                UNION
                SELECT reach.a, sym.y FROM reach JOIN sym ON sym.x = reach.b
            )
            SELECT printf('img%08d', a) AS image_id,
                   printf('img%08d', min(b)) AS cluster_id
            FROM reach GROUP BY a ORDER BY image_id
        """,
        "cluster_profile": """
            WITH RECURSIVE """ + _arith_caps + ", " + pair_cte.replace(
            "{SRC}", "allcaps") + """
            , iden AS (
                -- identical shingle SETS == identical sketch folds:
                -- the engine links such classes with k-1 star rows from
                -- the class-min id (designated-bucket stars, buckets.py
                -- r3), not all C(k,2) pairs
                SELECT ia, ib FROM scoredp WHERE c = na AND c = nb
            ), cls AS (
                SELECT t.did,
                       least(t.did, coalesce(min(nb.o), t.did)) AS rep
                FROM t LEFT JOIN (SELECT ia AS did, ib AS o FROM iden
                                  UNION ALL SELECT ib, ia FROM iden) nb
                  ON nb.did = t.did
                WHERE len(t.tk) > 0
                GROUP BY t.did
            ), via_pairs AS (
                SELECT rep AS ia, did AS ib, 'minhash' AS via
                FROM cls WHERE rep < did
                UNION ALL
                SELECT ia, ib,
                       CASE WHEN jacc >= 0.7 THEN 'minhash'
                            ELSE 'contain' END AS via
                FROM scoredp
                WHERE NOT (c = na AND c = nb)
                  AND (jacc >= 0.7 OR ctn >= 0.9)
            ), edges_via AS (
                -- engine edge-row multiplicity: every verified sk pair
                -- is one row; planted exact pairs ALSO yield an exact
                -- star row and (identical pixels) a Hamming-0 phash
                -- row; planted phash pairs yield one phash row
                SELECT ia, ib, via FROM via_pairs
                UNION ALL SELECT i - 1, i, 'exact' FROM rows_
                    WHERE i % 4 = 1 AND (i // 4) % 4 = 0
                UNION ALL SELECT i - 1, i, 'phash' FROM rows_
                    WHERE i % 4 = 1 AND (i // 4) % 4 = 0
                UNION ALL SELECT i - 1, i, 'phash' FROM rows_
                    WHERE i % 4 = 1 AND (i // 4) % 4 = 3
            ), edges AS (SELECT DISTINCT ia, ib FROM edges_via
            ), sym AS (
                SELECT ia AS x, ib AS y FROM edges
                UNION SELECT ib, ia FROM edges
            ), reach(a, b) AS (
                SELECT i, i FROM rows_
                UNION
                SELECT reach.a, sym.y FROM reach JOIN sym ON sym.x = reach.b
            ), assign AS (
                SELECT a AS did, min(b) AS cl FROM reach GROUP BY a
            ), vc AS (
                SELECT a1.cl,
                       count(*) AS n_edges,
                       sum(CASE WHEN via = 'exact' THEN 1 ELSE 0 END)
                           AS n_exact,
                       sum(CASE WHEN via = 'minhash' THEN 1 ELSE 0 END)
                           AS n_minhash,
                       sum(CASE WHEN via = 'contain' THEN 1 ELSE 0 END)
                           AS n_contain,
                       sum(CASE WHEN via = 'phash' THEN 1 ELSE 0 END)
                           AS n_phash
                FROM edges_via e JOIN assign a1 ON a1.did = e.ia
                GROUP BY a1.cl
            )
            SELECT printf('img%08d', s.cl) AS cluster_id,
                   s.size,
                   CAST(coalesce(vc.n_edges, 0) AS BIGINT) AS n_edges,
                   CAST(coalesce(vc.n_exact, 0) AS BIGINT) AS n_exact,
                   CAST(coalesce(vc.n_minhash, 0) AS BIGINT) AS n_minhash,
                   CAST(coalesce(vc.n_contain, 0) AS BIGINT) AS n_contain,
                   CAST(coalesce(vc.n_phash, 0) AS BIGINT) AS n_phash
            FROM (SELECT cl, count(*) AS size FROM assign GROUP BY cl) s
            LEFT JOIN vc ON vc.cl = s.cl
            ORDER BY cluster_id
        """,
        "longdoc_overlap": """
            WITH t0 AS (
                SELECT doc_id,
                       regexp_extract_all(lower(coalesce(text, '')),
                                          '[a-z0-9]+') AS tk
                FROM documents WHERE doc_id < 200
            ), ranked AS (
                SELECT row_number() OVER (ORDER BY doc_id) - 1 AS rn, tk
                FROM t0
            ), grp AS (
                SELECT rn // 5 AS g, flatten(list(tk ORDER BY rn)) AS tk
                FROM ranked GROUP BY rn // 5 HAVING count(*) = 5
            ), longdocs AS (
                SELECT CAST(e.g AS VARCHAR) AS gid,
                       CASE WHEN e.g % 2 = 1 THEN
                           list_concat(list_concat(
                               list_slice(e.tk, 1, len(e.tk) // 2),
                               list_slice(p.tk, len(p.tk) // 4 + 1,
                                          len(p.tk) // 4
                                          + greatest(40, len(p.tk) // 3))),
                               list_slice(e.tk, len(e.tk) // 2 + 1,
                                          len(e.tk)))
                       ELSE e.tk END AS tk
                FROM grp e LEFT JOIN grp p ON p.g = e.g - 1
            ), geom AS (
                SELECT gid, tk, len(tk) AS T FROM longdocs
            ), refc AS (
                SELECT gid, c AS ci,
                       list_slice(tk, c * 32 + 1,
                                  least(c * 32 + 64, T)) AS ctk
                FROM geom, unnest(generate_series(0,
                    greatest(1, CAST(ceil(greatest(T - 32, 1) / 32.0)
                                     AS BIGINT)) - 1)) AS u(c)
            ), qc AS (
                SELECT gid, c AS ci,
                       list_slice(tk, c * 16 + 1,
                                  least(c * 16 + 32, T)) AS ctk
                FROM geom, unnest(generate_series(0,
                    greatest(1, CAST(ceil(greatest(T - 16, 1) / 16.0)
                                     AS BIGINT)) - 1)) AS u(c)
            ), qsh AS (
                SELECT gid, ci, unnest(
                    CASE WHEN len(ctk) >= 3 THEN list_transform(
                              generate_series(1, len(ctk) - 2),
                              i -> ctk[i] || ' ' || ctk[i+1] || ' '
                                   || ctk[i+2])
                         WHEN len(ctk) > 0 THEN [array_to_string(ctk, ' ')]
                         ELSE [] END) AS s
                FROM qc
            ), rsh AS (
                SELECT gid, ci, unnest(
                    CASE WHEN len(ctk) >= 3 THEN list_transform(
                              generate_series(1, len(ctk) - 2),
                              i -> ctk[i] || ' ' || ctk[i+1] || ' '
                                   || ctk[i+2])
                         WHEN len(ctk) > 0 THEN [array_to_string(ctk, ' ')]
                         ELSE [] END) AS s
                FROM refc
            ), qd AS (SELECT DISTINCT gid, ci, s FROM qsh
            ), rd AS (SELECT DISTINCT gid, ci, s FROM rsh
            ), qcnt AS (SELECT gid, ci, count(*) AS n FROM qd GROUP BY 1, 2
            ), rcnt AS (SELECT gid, ci, count(*) AS n FROM rd GROUP BY 1, 2
            ), sharedm AS (
                SELECT q.gid AS qg, q.ci AS qi, r.gid AS rg, r.ci AS ri,
                       count(*) AS c
                FROM qd q JOIN rd r USING (s)
                GROUP BY 1, 2, 3, 4
            ), gated AS (
                SELECT qg, rg FROM sharedm
                JOIN qcnt ON qcnt.gid = qg AND qcnt.ci = qi
                JOIN rcnt ON rcnt.gid = rg AND rcnt.ci = ri
                WHERE c >= 4 AND 1.0 * c / qcnt.n >= 0.8
                  AND least(1.0, list_sum(list_transform(
                        generate_series(c, qcnt.n), j ->
                        exp(lgamma(qcnt.n + 1) - lgamma(j + 1)
                            - lgamma(qcnt.n - j + 1)
                            + j * ln(least(0.999, rcnt.n / 1048576.0))
                            + (qcnt.n - j)
                              * ln(1.0 - least(0.999,
                                               rcnt.n / 1048576.0))))))
                      <= 0.01
            )
            SELECT least(qg, rg) AS id_a, greatest(qg, rg) AS id_b,
                   count(*) AS chunk_hits
            FROM gated WHERE qg <> rg
            GROUP BY 1, 2 ORDER BY id_a, id_b
        """,
        "contrastive_triplets": f"""
            WITH toks AS (
                SELECT DISTINCT doc_id,
                       unnest(regexp_extract_all(lower(text),
                                                 '[a-z0-9]+')) AS tok
                FROM documents WHERE doc_id < 300
            ), cnt AS (
                SELECT doc_id, count(*) AS n FROM toks GROUP BY doc_id
            ), shared AS (
                SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                       count(*) AS n_shared
                FROM toks a JOIN toks b USING (tok)
                WHERE a.doc_id < b.doc_id GROUP BY 1, 2
            ), jp AS (
                SELECT id_a, id_b FROM shared
                JOIN cnt ca ON ca.doc_id = id_a
                JOIN cnt cb ON cb.doc_id = id_b
                WHERE 1000000.0 * n_shared / (ca.n + cb.n - n_shared)
                      >= 650000.0
            ), sym AS (
                SELECT id_a AS a, id_b AS p FROM jp
                UNION ALL SELECT id_b, id_a FROM jp
            ), pos AS (
                SELECT a AS anchor_id, min(p) AS pos_id FROM sym GROUP BY a
            ), neg AS (
                SELECT anchor_id, pos_id,
                       CASE WHEN ({sample_hash_sql('anchor_id')} % 300)
                                 = anchor_id
                            THEN (({sample_hash_sql('anchor_id')} % 300)
                                  + 1) % 300
                            ELSE ({sample_hash_sql('anchor_id')} % 300)
                       END AS neg_id
                FROM pos
            )
            SELECT anchor_id, pos_id, CAST(neg_id AS BIGINT) AS neg_id
            FROM neg n
            WHERE NOT EXISTS (
                SELECT 1 FROM jp
                WHERE jp.id_a = least(n.anchor_id, n.neg_id)
                  AND jp.id_b = greatest(n.anchor_id, n.neg_id))
            ORDER BY anchor_id
        """,
        "curriculum_order": """
            WITH r AS (
                SELECT doc_id, source,
                       ROW_NUMBER() OVER (PARTITION BY source
                                          ORDER BY n_chars, doc_id)
                           - 1 AS r
                FROM documents
            )
            SELECT doc_id, source, r,
                   ROW_NUMBER() OVER (ORDER BY r, source) - 1 AS pos
            FROM r ORDER BY doc_id
        """,
        "edit_distance_pairs": """
            WITH toks AS (
                SELECT DISTINCT doc_id,
                       unnest(regexp_extract_all(lower(text),
                                                 '[a-z0-9]+')) AS tok
                FROM documents WHERE doc_id < 300
            ), cnt AS (
                SELECT doc_id, count(*) AS n FROM toks GROUP BY doc_id
            ), shared AS (
                SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                       count(*) AS ns
                FROM toks a JOIN toks b USING (tok)
                WHERE a.doc_id < b.doc_id GROUP BY 1, 2
            ), jp AS (
                SELECT id_a, id_b FROM shared
                JOIN cnt ca ON ca.doc_id = id_a
                JOIN cnt cb ON cb.doc_id = id_b
                WHERE 1000000.0 * ns / (ca.n + cb.n - ns) >= 900000.0
            ), nt AS (
                SELECT doc_id,
                       array_to_string(regexp_extract_all(lower(text),
                                                          '[a-z0-9]+'),
                                       ' ') AS s
                FROM documents WHERE doc_id < 300
            )
            SELECT id_a, id_b,
                   CAST(levenshtein(a.s, b.s) AS BIGINT) AS dist
            FROM jp JOIN nt a ON a.doc_id = id_a
                    JOIN nt b ON b.doc_id = id_b
            WHERE levenshtein(a.s, b.s) <= 150
            ORDER BY id_a, id_b
        """,
        "winsorize": """
            WITH q AS (
                SELECT source,
                       (array_agg(n_chars ORDER BY n_chars))
                           [(count(*) - 1) * 5 // 100 + 1] AS lo,
                       (array_agg(n_chars ORDER BY n_chars))
                           [(count(*) - 1) * 95 // 100 + 1] AS hi
                FROM documents GROUP BY source
            )
            SELECT d.doc_id, d.source, d.n_chars,
                   least(greatest(d.n_chars, q.lo), q.hi) AS clipped
            FROM documents d JOIN q USING (source)
            ORDER BY doc_id
        """,
        "triangle_count": """
            WITH toks AS (
                SELECT DISTINCT doc_id,
                       unnest(regexp_extract_all(lower(text),
                                                 '[a-z0-9]+')) AS tok
                FROM documents WHERE doc_id < 300
            ), cnt AS (
                SELECT doc_id, count(*) AS n FROM toks GROUP BY doc_id
            ), shared AS (
                SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                       count(*) AS n_shared
                FROM toks a JOIN toks b USING (tok)
                WHERE a.doc_id < b.doc_id GROUP BY 1, 2
            ), jp AS (
                SELECT id_a, id_b FROM shared
                JOIN cnt ca ON ca.doc_id = id_a
                JOIN cnt cb ON cb.doc_id = id_b
                WHERE 1000000.0 * n_shared / (ca.n + cb.n - n_shared)
                      >= 650000.0
            ), w AS (
                SELECT e1.id_a AS a, e2.id_b AS c
                FROM jp e1 JOIN jp e2 ON e1.id_b = e2.id_a
            )
            SELECT count(*) AS n_triangles
            FROM w JOIN jp ON w.a = jp.id_a AND w.c = jp.id_b
        """,
        "oov_rate": """
            WITH t AS (
                SELECT doc_id,
                       regexp_extract_all(lower(coalesce(text, '')),
                                          '[a-z0-9]+') AS tk
                FROM documents
            ), f AS (
                SELECT doc_id, unnest(tk) AS tok FROM t
            ), c AS (
                SELECT tok, count(*) AS c FROM f GROUP BY 1
            ), v AS (
                SELECT tok FROM c ORDER BY c DESC, tok LIMIT 15
            ), p AS (
                SELECT doc_id, count(*) AS n_tok,
                       CAST(sum(CASE WHEN tok NOT IN (SELECT tok FROM v)
                                     THEN 1 ELSE 0 END) AS BIGINT) AS n_oov
                FROM f GROUP BY 1
            )
            SELECT t.doc_id, coalesce(p.n_tok, 0) AS n_tok,
                   coalesce(p.n_oov, 0) AS n_oov,
                   CASE WHEN coalesce(p.n_tok, 0) > 0
                        THEN 1000000 * p.n_oov // p.n_tok
                        ELSE 0 END AS oov_u
            FROM t LEFT JOIN p USING (doc_id) ORDER BY doc_id
        """,
        "heavy_hitters": """
            WITH f AS (
                SELECT unnest(regexp_extract_all(lower(coalesce(text, '')),
                                                 '[a-z0-9]+')) AS token
                FROM documents
            ), tot AS (
                SELECT count(*) AS n FROM f
            ), c AS (
                SELECT token, count(*) AS cnt FROM f GROUP BY 1
            )
            SELECT token, cnt FROM c, tot WHERE cnt * 31 > n
            ORDER BY cnt DESC, token
        """,
        "pmi_pairs": """
            WITH t AS (
                SELECT doc_id,
                       regexp_extract_all(lower(coalesce(text, '')),
                                          '[a-z0-9]+') AS tk
                FROM documents
            ), occ AS (
                SELECT tok, count(*) AS c
                FROM (SELECT unnest(tk) AS tok FROM t) GROUP BY 1
            ), pr AS (
                SELECT least(tk[i], tk[i+1]) AS a,
                       greatest(tk[i], tk[i+1]) AS b
                FROM t, unnest(generate_series(1, len(tk) - 1)) AS g(i)
                UNION ALL
                SELECT least(tk[i], tk[i+2]), greatest(tk[i], tk[i+2])
                FROM t, unnest(generate_series(1, len(tk) - 2)) AS g(i)
            ), np AS (
                SELECT count(*) AS n FROM pr
            ), pc AS (
                SELECT a, b, count(*) AS cnt FROM pr GROUP BY 1, 2
                HAVING count(*) >= 5
            )
            SELECT a AS tok_a, b AS tok_b, cnt,
                   1000000 * cnt * (SELECT n FROM np)
                       // (ca.c * cb.c) AS lift_u
            FROM pc JOIN occ ca ON ca.tok = pc.a
                    JOIN occ cb ON cb.tok = pc.b
            ORDER BY lift_u DESC, tok_a, tok_b LIMIT 50
        """,
        "boilerplate_dedup": """
            WITH t AS (
                SELECT doc_id,
                       regexp_extract_all(lower(coalesce(text, '')),
                                          '[a-z0-9]+') AS tk
                FROM documents
            ), w AS (
                SELECT doc_id, i - 1 AS widx,
                       array_to_string(tk[(i-1)*2+1 : (i-1)*2+2], ' ') AS s
                FROM t, unnest(generate_series(1, len(tk) // 2)) AS g(i)
            ), blk AS (
                SELECT s FROM w GROUP BY s
                HAVING count(DISTINCT doc_id) >= 20
            ), keepw AS (
                SELECT doc_id, widx, s FROM w
                WHERE s NOT IN (SELECT s FROM blk)
            ), tail AS (
                SELECT doc_id, len(tk) // 2 AS widx,
                       array_to_string(tk[len(tk)//2*2+1 : len(tk)], ' ') AS s
                FROM t WHERE len(tk) % 2 > 0
            ), parts AS (
                SELECT * FROM keepw UNION ALL SELECT * FROM tail
            ), agg AS (
                SELECT doc_id,
                       string_agg(s, ' ' ORDER BY widx) AS clean_text
                FROM parts GROUP BY 1
            ), kc AS (
                SELECT doc_id, count(*) AS c FROM keepw GROUP BY 1
            )
            SELECT t.doc_id, coalesce(agg.clean_text, '') AS clean_text,
                   len(t.tk) // 2 - coalesce(kc.c, 0) AS n_lines_removed
            FROM t LEFT JOIN agg USING (doc_id)
                   LEFT JOIN kc USING (doc_id)
            ORDER BY doc_id
        """,
        "novelty_score": """
            WITH t AS (
                SELECT doc_id AS did,
                       regexp_extract_all(lower(coalesce(text, '')),
                                          '[a-z0-9]+') AS tk
                FROM documents
            ), sh AS (
                SELECT did, unnest(
                    CASE WHEN len(tk) >= 3 THEN list_transform(
                              generate_series(1, len(tk) - 2),
                              i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])
                         WHEN len(tk) > 0 THEN [array_to_string(tk, ' ')]
                         ELSE [] END) AS s
                FROM t
            ), d AS (
                SELECT DISTINCT did, s FROM sh
            ), mn AS (
                SELECT s, min(did) AS first_did FROM d GROUP BY s
            ), per AS (
                SELECT d.did, count(*) AS nd,
                       sum(CASE WHEN mn.first_did = d.did
                           THEN 1 ELSE 0 END) AS nn
                FROM d JOIN mn USING (s) GROUP BY d.did
            )
            SELECT doc_id,
                   CAST(coalesce(per.nd, 0) AS BIGINT) AS n_distinct,
                   CAST(coalesce(per.nn, 0) AS BIGINT) AS n_novel,
                   CAST(CASE WHEN coalesce(per.nd, 0) = 0 THEN 0
                        ELSE (1000000 * per.nn) // per.nd END AS BIGINT)
                       AS novelty_u
            FROM documents LEFT JOIN per ON per.did = doc_id
        """,
        "hash_sample": f"""
            SELECT doc_id, lang, n_chars FROM documents
            WHERE ({_h32}) % 100 < 10
            ORDER BY doc_id
        """,
        "global_shuffle": f"""
            SELECT doc_id,
                   row_number() OVER (ORDER BY {_h32}, doc_id) - 1
                       AS shuffle_pos
            FROM documents ORDER BY doc_id
        """,
        "hash_split": f"""
            SELECT doc_id,
                   CASE WHEN ({_h32}) % 100 < 80 THEN 'train'
                        WHEN ({_h32}) % 100 < 90 THEN 'val'
                        ELSE 'test' END AS split
            FROM documents ORDER BY doc_id
        """,
        "stratified_sample": f"""
            WITH h AS (
                SELECT doc_id, lang, {_h32} AS hv FROM documents
            ), r AS (
                SELECT doc_id, lang,
                       row_number() OVER (PARTITION BY lang
                                          ORDER BY hv, doc_id) AS rk,
                       count(*) OVER (PARTITION BY lang) AS n
                FROM h
            )
            SELECT doc_id, lang FROM r
            WHERE rk <= (n * 10 + 99) // 100
            ORDER BY doc_id
        """,
        "decontaminate": """
            WITH t AS (
                SELECT doc_id AS did,
                       regexp_extract_all(lower(coalesce(text, '')),
                                          '[a-z0-9]+') AS tk
                FROM documents
            ), sh AS (
                SELECT did, unnest(
                    CASE WHEN len(tk) >= 3 THEN list_transform(
                              generate_series(1, len(tk) - 2),
                              i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])
                         WHEN len(tk) > 0 THEN [array_to_string(tk, ' ')]
                         ELSE [] END) AS s
                FROM t
            ), d AS (
                SELECT DISTINCT did, s FROM sh
            ), ev AS (
                SELECT DISTINCT s FROM d WHERE did % 20 = 0
            ), bad AS (
                SELECT DISTINCT did FROM d JOIN ev USING (s)
                WHERE did % 20 <> 0
            )
            SELECT doc_id, lang FROM documents
            WHERE doc_id % 20 <> 0
              AND doc_id NOT IN (SELECT did FROM bad)
            ORDER BY doc_id
        """,
        "bloom_decontaminate": """
            WITH t AS (
                SELECT doc_id AS did,
                       regexp_extract_all(lower(coalesce(text, '')),
                                          '[a-z0-9]+') AS tk
                FROM documents
            ), sh AS (
                SELECT did, unnest(
                    CASE WHEN len(tk) >= 3 THEN list_transform(
                              generate_series(1, len(tk) - 2),
                              i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])
                         WHEN len(tk) > 0 THEN [array_to_string(tk, ' ')]
                         ELSE [] END) AS s
                FROM t
            ), d AS (
                SELECT DISTINCT did, s FROM sh
            ), bits AS (
                SELECT DISTINCT
                       ('0x' || substr(md5(ev.s || '|' || r2.r), 1, 16))
                           ::UBIGINT % 65536 AS bit
                FROM (SELECT DISTINCT s FROM d WHERE did % 20 = 0) ev
                CROSS JOIN range(3) r2(r)
            ), probe AS (
                SELECT d.did, d.s,
                       ('0x' || substr(md5(d.s || '|' || r3.r), 1, 16))
                           ::UBIGINT % 65536 AS bit
                FROM d CROSS JOIN range(3) r3(r)
                WHERE d.did % 20 <> 0
            ), bad AS (
                SELECT DISTINCT did FROM (
                    SELECT did, s FROM probe JOIN bits USING (bit)
                    GROUP BY did, s HAVING count(*) = 3
                )
            )
            SELECT doc_id, lang FROM documents
            WHERE doc_id % 20 <> 0
              AND doc_id NOT IN (SELECT did FROM bad)
            ORDER BY doc_id
        """,
        "vocab_topk": """
            WITH t AS (
                SELECT regexp_extract_all(lower(coalesce(text, '')),
                                          '[a-z0-9]+') AS tk
                FROM documents
            ), f AS (
                SELECT unnest(tk) AS token FROM t
            )
            SELECT token, count(*) AS cnt FROM f
            GROUP BY 1 ORDER BY cnt DESC, token LIMIT 40
        """,
        "normalized_dedup": """
            WITH aug AS (
                SELECT doc_id, text FROM documents
                UNION ALL
                SELECT doc_id + 1000000000,
                       '!! ' || replace(upper(text), ' ', '  ') || ' ??'
                FROM documents WHERE doc_id % 10 = 3
            ), n AS (
                SELECT doc_id,
                       trim(regexp_replace(regexp_replace(
                            lower(coalesce(text, '')),
                            '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS nt
                FROM aug
            )
            SELECT doc_id,
                   min(doc_id) OVER (PARTITION BY nt) AS keep_id,
                   count(*)    OVER (PARTITION BY nt) AS n_copies
            FROM n
        """,
        "group_topk": """
            SELECT lang, doc_id, n_chars, rnk FROM (
                SELECT lang, doc_id, n_chars,
                       ROW_NUMBER() OVER (PARTITION BY lang
                           ORDER BY n_chars DESC, doc_id) AS rnk
                FROM documents
            ) WHERE rnk <= 10
        """,
        "keyword_search": """
            SELECT doc_id, lang FROM documents
            WHERE """ + " AND ".join(
                "list_contains(regexp_extract_all(lower(coalesce(text, "
                f"'')), '[a-z0-9]+'), '{t}')"
                for t in ("customer", "spark", "agg", "big", "slow")) + """
        """,
        "doc_top_term": """
            WITH f AS (
                SELECT doc_id,
                       unnest(regexp_extract_all(lower(coalesce(text, '')),
                                                 '[a-z0-9]+')) AS tok
                FROM documents
            ), tf AS (
                SELECT doc_id, tok, count(*) AS c FROM f GROUP BY 1, 2
            )
            SELECT doc_id, tok AS top_token, c AS tf FROM (
                SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                    ORDER BY c DESC, tok) AS r FROM tf
            ) WHERE r = 1
        """,
        "bigram_topk": """
            WITH t AS (
                SELECT regexp_extract_all(lower(coalesce(text, '')),
                                          '[a-z0-9]+') AS l
                FROM documents
            ), p AS (
                SELECT unnest(list_zip(l[1:len(l)-1], l[2:len(l)])) AS z
                FROM t WHERE len(l) >= 2
            )
            SELECT z[1] AS w1, z[2] AS w2, count(*) AS cnt
            FROM p GROUP BY 1, 2 ORDER BY cnt DESC, w1, w2 LIMIT 25
        """,
        "distinctive_term": """
            WITH f AS (
                SELECT doc_id,
                       unnest(regexp_extract_all(lower(coalesce(text, '')),
                                                 '[a-z0-9]+')) AS tok
                FROM documents
            ), tf AS (
                SELECT doc_id, tok, count(*) AS c FROM f GROUP BY 1, 2
            ), df AS (
                SELECT tok, count(DISTINCT doc_id) AS d FROM f GROUP BY 1
            )
            SELECT doc_id, tok AS top_token, c AS tf, d AS df FROM (
                SELECT tf.doc_id, tf.tok, tf.c, df.d,
                       ROW_NUMBER() OVER (PARTITION BY tf.doc_id
                           ORDER BY tf.c DESC, df.d, tf.tok) AS r
                FROM tf JOIN df USING (tok)
            ) WHERE r = 1
        """,
        "dup_rate_by_source": """
            WITH h AS (
                SELECT source, coalesce(text, '') AS t,
                       count(*) OVER (PARTITION BY coalesce(text, ''))
                           AS c
                FROM documents
            )
            SELECT source,
                   count(*) AS n_docs,
                   sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS n_dup_docs,
                   count(DISTINCT t) AS n_distinct
            FROM h GROUP BY source
        """,
        "pii_scrub": f"""
            WITH aug AS (
                SELECT doc_id,
                       CASE WHEN doc_id % 7 = 0 THEN
                           coalesce(text, '') || ' contact user' || doc_id
                           || '@mail.example ref '
                           || CAST(doc_id * 1000003 + 123456 AS VARCHAR)
                       ELSE coalesce(text, '') END AS s
                FROM documents
            ), e AS (
                SELECT doc_id,
                       len(regexp_extract_all(s, '{_EMAIL_RE}')) AS ne,
                       regexp_replace(s, '{_EMAIL_RE}', '<EMAIL>', 'g') AS s1
                FROM aug
            )
            SELECT doc_id,
                   regexp_replace(s1, '{_LONGNUM_RE}', '<NUM>', 'g')
                       AS clean_text,
                   ne + len(regexp_extract_all(s1, '{_LONGNUM_RE}'))
                       AS n_redacted
            FROM e ORDER BY doc_id
        """,
        "sessionize": """
            WITH e AS (
                SELECT user_id, event_id, epoch_us(ts) AS tus,
                       CAST(round(value * 100) AS BIGINT) AS cents
                FROM events
            ), l AS (
                SELECT *, lag(tus) OVER (PARTITION BY user_id
                                         ORDER BY tus, event_id) AS ptus
                FROM e
            ), s AS (
                SELECT *, CAST(sum(CASE WHEN ptus IS NULL
                                          OR tus - ptus > 1800000000
                                        THEN 1 ELSE 0 END)
                          OVER (PARTITION BY user_id
                                ORDER BY tus, event_id
                                ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT)
                          AS session_id
                FROM l
            )
            SELECT user_id, session_id, count(*) AS n_events,
                   min(tus) AS t_start_us, max(tus) AS t_end_us,
                   CAST(sum(cents) AS BIGINT) AS sum_cents
            FROM s GROUP BY 1, 2 ORDER BY user_id, session_id
        """,
        "running_window": """
            WITH e AS (
                SELECT event_id, user_id, epoch_us(ts) AS ts_us,
                       CAST(round(value * 100) AS BIGINT) AS cents
                FROM events
            )
            SELECT event_id, user_id, ts_us,
                   CAST(row_number() OVER w AS BIGINT) AS rn,
                   CAST(sum(cents) OVER (w ROWS UNBOUNDED PRECEDING)
                        AS BIGINT) AS run_cents,
                   CAST(sum(cents) OVER (w ROWS BETWEEN 2 PRECEDING
                                         AND CURRENT ROW)
                        AS BIGINT) AS roll_cents
            FROM e WINDOW w AS (PARTITION BY user_id
                                ORDER BY ts_us, event_id)
            ORDER BY user_id, ts_us, event_id
        """,
        "big_orders": """
            WITH q AS (
                SELECT l_orderkey,
                       CAST(sum(CAST(round(l_quantity * 100) AS BIGINT))
                            AS BIGINT) AS qty_c2
                FROM lineitem
                GROUP BY l_orderkey
                HAVING sum(CAST(round(l_quantity * 100) AS BIGINT)) > 15000
            )
            SELECT c.c_custkey, c.c_name, o.o_orderkey,
                   epoch_us(o.o_orderdate) AS o_orderdate_us,
                   CAST(round(o.o_totalprice * 100) AS BIGINT) AS tp_c2,
                   q.qty_c2
            FROM q
            JOIN orders o ON o.o_orderkey = q.l_orderkey
            JOIN customer c ON c.c_custkey = o.o_custkey
            ORDER BY tp_c2 DESC, o.o_orderkey
            LIMIT 100
        """,
        "order_revenue": """
            WITH li AS (
                SELECT l_orderkey,
                       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                                * (100 - CAST(round(l_discount * 100)
                                              AS BIGINT))) AS BIGINT)
                           AS rev_c4
                FROM lineitem
                WHERE l_shipdate > TIMESTAMP '1998-06-01'
                GROUP BY l_orderkey
            )
            SELECT li.l_orderkey, li.rev_c4,
                   epoch_us(o.o_orderdate) AS o_orderdate_us
            FROM li
            JOIN orders o ON o.o_orderkey = li.l_orderkey
            JOIN customer c ON c.c_custkey = o.o_custkey
            WHERE o.o_orderdate < TIMESTAMP '1998-06-01'
              AND c.c_mktsegment = 'BUILDING'
            ORDER BY li.rev_c4 DESC, li.l_orderkey
            LIMIT 10
        """,
        "brand_revenue": """
            WITH li AS (
                SELECT l_partkey,
                       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                                * (100 - CAST(round(l_discount * 100)
                                              AS BIGINT))) AS BIGINT)
                           AS rev_c4
                FROM lineitem GROUP BY l_partkey
            )
            SELECT p.p_brand,
                   CAST(count(*) AS BIGINT) AS n_parts,
                   CAST(sum(li.rev_c4) AS BIGINT) AS rev_c4
            FROM li JOIN part p ON p.p_partkey = li.l_partkey
            GROUP BY 1 ORDER BY p_brand
        """,
        "customers_no_urgent": """
            SELECT c_custkey, c_mktsegment FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_custkey = c.c_custkey
                                AND o.o_orderpriority = '1-URGENT')
            ORDER BY c_custkey
        """,
        "region_revenue": """
            SELECT n_name,
                   CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                            * (100 - CAST(round(l_discount * 100)
                                          AS BIGINT))) AS BIGINT)
                       AS revenue_c4
            FROM customer, orders, lineitem, supplier, nation, region
            WHERE c_custkey = o_custkey
              AND l_orderkey = o_orderkey
              AND l_suppkey = s_suppkey
              AND c_nationkey = s_nationkey
              AND s_nationkey = n_nationkey
              AND n_regionkey = r_regionkey
              AND r_name = 'ASIA'
              AND o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate < TIMESTAMP '1997-01-01'
            GROUP BY n_name
            ORDER BY revenue_c4 DESC, n_name
        """,
        "gopher_filter": """
            WITH t AS (
                SELECT doc_id, lower(coalesce(text, '')) AS lt,
                       regexp_extract_all(lower(coalesce(text, '')),
                                          '[a-z0-9]+') AS tk
                FROM documents
            ), m AS (
                SELECT doc_id, len(tk) AS n_tokens,
                       coalesce(list_sum(list_transform(tk, x -> len(x))),
                                0) AS tot,
                       len(regexp_replace(lt, '[a-z0-9\\s]', '', 'g'))
                           AS n_sym,
                       len(lt) AS n_chars,
                       len(list_intersect(list_distinct(tk),
                           ['the','be','to','of','and','that','have',
                            'with'])) AS n_sw
                FROM t
            )
            SELECT doc_id, n_tokens::BIGINT AS n_tokens,
                   (CASE WHEN n_tokens < 50 OR n_tokens > 100000
                         THEN 1 ELSE 0 END
                    + CASE WHEN tot < 3 * n_tokens OR tot > 10 * n_tokens
                           THEN 2 ELSE 0 END
                    + CASE WHEN 100 * n_sym > 10 * n_chars
                           THEN 4 ELSE 0 END
                    + CASE WHEN n_sw < 2 THEN 8 ELSE 0 END)::BIGINT
                       AS fail_mask
            FROM m ORDER BY doc_id
        """,
        "dsir_select": """
            WITH tok AS (
                SELECT doc_id, lang,
                       unnest(regexp_extract_all(lower(coalesce(text, '')),
                                                 '[a-z0-9]+')) AS tok
                FROM documents
            ), tb AS (
                SELECT doc_id, lang,
                       CAST(('0x' || substr(md5(tok), 1, 16))::UBIGINT
                            % 1024 AS BIGINT) AS b
                FROM tok
            ), raw AS (
                SELECT b, count(*) AS c FROM tb GROUP BY b
            ), tgt AS (
                SELECT b, count(*) AS c FROM tb WHERE lang = 'en'
                GROUP BY b
            ), tot AS (
                SELECT (SELECT count(*) FROM tb) AS r_tot,
                       (SELECT count(*) FROM tb WHERE lang = 'en') AS t_tot
            ), wt AS (
                SELECT r.b,
                       CAST(floor(1000000.0 *
                            (ln((coalesce(t.c, 0) + 1.0)
                                / (tot.t_tot + 1024.0))
                           - ln((r.c + 1.0) / (tot.r_tot + 1024.0))))
                            AS BIGINT) AS w
                FROM raw r LEFT JOIN tgt t USING (b), tot
            )
            , s AS (
                SELECT tb.doc_id, CAST(sum(wt.w) AS BIGINT) AS sc
                FROM tb JOIN wt USING (b)
                GROUP BY tb.doc_id
            ), r AS (
                SELECT doc_id, sc FROM s
                QUALIFY row_number() OVER (ORDER BY sc DESC, doc_id)
                        <= (SELECT CAST(ceil(0.2 * count(*)) AS BIGINT)
                            FROM s)
            )
            SELECT doc_id, sc AS dsir_score FROM r ORDER BY doc_id
        """,
        "cross_source_dups": """
            WITH c AS (
                SELECT array_to_string(
                           regexp_extract_all(lower(coalesce(text, '')),
                                              '[a-z0-9]+')[1:3], ' ') AS t,
                       source, count(*) AS cnt
                FROM documents GROUP BY 1, 2
            ), p AS (
                SELECT a.source AS source_a, b.source AS source_b,
                       CASE WHEN a.source = b.source
                            THEN a.cnt * (a.cnt - 1) // 2
                            ELSE a.cnt * b.cnt END AS n
                FROM c a JOIN c b
                  ON a.t = b.t AND a.source <= b.source
                WHERE NOT (a.source = b.source AND a.cnt < 2)
            )
            SELECT source_a, source_b, sum(n)::BIGINT AS n_pairs
            FROM p GROUP BY 1, 2 HAVING sum(n) > 0
            ORDER BY source_a, source_b
        """,
        "event_funnel": """
            WITH s1 AS (
                SELECT user_id, min(ts) AS t FROM events
                WHERE event_type = 'signup' GROUP BY 1
            ), s2 AS (
                SELECT e.user_id, min(e.ts) AS t
                FROM events e JOIN s1 USING (user_id)
                WHERE e.event_type = 'view' AND e.ts > s1.t GROUP BY 1
            ), s3 AS (
                SELECT e.user_id, min(e.ts) AS t
                FROM events e JOIN s2 USING (user_id)
                WHERE e.event_type = 'click' AND e.ts > s2.t GROUP BY 1
            ), s4 AS (
                SELECT e.user_id, min(e.ts) AS t
                FROM events e JOIN s3 USING (user_id)
                WHERE e.event_type = 'purchase' AND e.ts > s3.t GROUP BY 1
            )
            SELECT * FROM (
                SELECT 1 AS step, 'signup' AS event_type,
                       count(*)::BIGINT AS n_users FROM s1
                UNION ALL SELECT 2, 'view', count(*)::BIGINT FROM s2
                UNION ALL SELECT 3, 'click', count(*)::BIGINT FROM s3
                UNION ALL SELECT 4, 'purchase', count(*)::BIGINT FROM s4
            ) ORDER BY step
        """,
        "cohort_retention": """
            WITH d AS (
                SELECT DISTINCT user_id,
                       epoch_us(ts) // 86400000000 AS day
                FROM events
            ), c AS (
                SELECT user_id, day,
                       min(day) OVER (PARTITION BY user_id) AS cohort
                FROM d
            )
            SELECT cohort AS cohort_day, day - cohort AS day_offset,
                   CAST(count(*) AS BIGINT) AS n_users
            FROM c GROUP BY 1, 2 ORDER BY cohort_day, day_offset
        """,
        "source_balance": f"""
            WITH c AS (
                SELECT source, count(*) AS n FROM documents GROUP BY 1
            )
            SELECT d.doc_id, d.source
            FROM documents d JOIN c ON c.source = d.source
            WHERE ({_h32}) % 1000000 < least(1000000, 1000000 * 40 // c.n)
            ORDER BY doc_id
        """,
        "span_dedup": """
            WITH t AS (
                SELECT doc_id,
                       regexp_extract_all(lower(coalesce(text, '')),
                                          '[a-z0-9]+') AS tk
                FROM documents
            ), w AS (
                SELECT doc_id, i - 1 AS widx,
                       array_to_string(tk[(i-1)*5+1 : (i-1)*5+5], ' ') AS s
                FROM t, unnest(generate_series(1, len(tk) // 5)) AS g(i)
            ), f AS (
                SELECT s, min(doc_id * 1048576 + widx) AS first
                FROM w GROUP BY 1
            ), keepw AS (
                SELECT w.doc_id, w.widx, w.s FROM w JOIN f ON w.s = f.s
                WHERE w.doc_id * 1048576 + w.widx = f.first
            ), tail AS (
                SELECT doc_id, len(tk) // 5 AS widx,
                       array_to_string(tk[len(tk)//5*5+1 : len(tk)], ' ') AS s
                FROM t WHERE len(tk) % 5 > 0
            ), parts AS (
                SELECT * FROM keepw UNION ALL SELECT * FROM tail
            ), agg AS (
                SELECT doc_id,
                       string_agg(s, ' ' ORDER BY widx) AS clean_text
                FROM parts GROUP BY 1
            ), kc AS (
                SELECT doc_id, count(*) AS c FROM keepw GROUP BY 1
            )
            SELECT t.doc_id, coalesce(agg.clean_text, '') AS clean_text,
                   len(t.tk) // 5 - coalesce(kc.c, 0) AS n_spans_removed
            FROM t LEFT JOIN agg USING (doc_id) LEFT JOIN kc USING (doc_id)
            ORDER BY doc_id
        """,
        "fuzzy_decontaminate": """
            WITH t AS (
                SELECT doc_id AS did,
                       regexp_extract_all(lower(coalesce(text, '')),
                                          '[a-z0-9]+') AS tk
                FROM documents
            ), sh AS (
                SELECT did, unnest(
                    CASE WHEN len(tk) >= 3 THEN list_transform(
                              generate_series(1, len(tk) - 2),
                              i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])
                         WHEN len(tk) > 0 THEN [array_to_string(tk, ' ')]
                         ELSE [] END) AS s
                FROM t
            ), d AS (
                SELECT DISTINCT did, s FROM sh
            ), sz AS (
                SELECT did, count(*) AS n FROM d GROUP BY 1
            ), hit AS (
                SELECT c.did AS cid, e.did AS eid, count(*) AS c
                FROM d c JOIN d e USING (s)
                WHERE c.did % 20 <> 0 AND e.did % 20 = 0
                GROUP BY 1, 2
            ), bad AS (
                SELECT DISTINCT cid FROM hit
                JOIN sz cs ON cs.did = hit.cid
                JOIN sz es ON es.did = hit.eid
                WHERE 1000000.0 * c / (cs.n + es.n - c) >= 500000
            )
            SELECT doc_id, lang FROM documents
            WHERE doc_id % 20 <> 0
              AND doc_id NOT IN (SELECT cid FROM bad)
            ORDER BY doc_id
        """,
        "label_outliers": """
            WITH u AS (
                SELECT label, i, avg(v) AS m
                FROM (SELECT label,
                             unnest(CAST(embedding AS DOUBLE[])) AS v,
                             generate_subscripts(embedding, 1) AS i
                      FROM embeddings)
                GROUP BY label, i
            ), c AS (
                SELECT label, list(m ORDER BY i) AS centroid
                FROM u GROUP BY label
            ), s AS (
                SELECT e.label, e.vec_id,
                       row_number() OVER (
                           PARTITION BY e.label
                           ORDER BY list_cosine_similarity(
                                        CAST(e.embedding AS DOUBLE[]),
                                        c.centroid) ASC,
                                    e.vec_id ASC) AS rank
                FROM embeddings e JOIN c ON c.label = e.label
            )
            SELECT CAST(label AS BIGINT) AS label, vec_id,
                   CAST(rank AS BIGINT) AS rank
            FROM s WHERE rank <= 5 ORDER BY label, rank
        """,
        "hard_negatives": """
            SELECT query_id, neighbor_id, rank FROM (
                SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
                       row_number() OVER (
                           PARTITION BY q.vec_id
                           ORDER BY list_cosine_similarity(q.embedding, e.embedding)
                                    DESC, e.vec_id ASC) AS rank
                FROM embeddings q, embeddings e
                WHERE q.vec_id >= 16 AND q.vec_id < 24
                  AND e.vec_id <> q.vec_id AND e.label <> q.label
            ) WHERE rank <= 5
        """,
        "semantic_dedup_label": """
            WITH RECURSIVE edges AS (
                SELECT a.vec_id AS u, b.vec_id AS v
                FROM embeddings a, embeddings b
                WHERE a.vec_id <> b.vec_id AND a.label = b.label
                  AND list_cosine_similarity(a.embedding, b.embedding) >= 0.3
            ), reach(u, v) AS (
                SELECT u, v FROM edges
                UNION
                SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
                WHERE e.v <> r.u
            )
            SELECT e.vec_id,
                   coalesce(least(m.mn, e.vec_id), e.vec_id) AS rep_id,
                   CAST(CASE WHEN coalesce(least(m.mn, e.vec_id), e.vec_id)
                                  = e.vec_id THEN 1 ELSE 0 END
                        AS BIGINT) AS kept
            FROM embeddings e
            LEFT JOIN (SELECT u, min(v) AS mn FROM reach GROUP BY u) m
              ON m.u = e.vec_id
            ORDER BY e.vec_id
        """,
        "perplexity_score": """
            WITH t AS (
                SELECT doc_id,
                       regexp_extract_all(lower(coalesce(text, '')),
                                          '[a-z0-9]+') AS tk
                FROM documents
            ), ref_uni AS (
                SELECT w, count(*) AS c
                FROM (SELECT unnest(tk) AS w FROM t WHERE doc_id % 10 = 0)
                GROUP BY w
            ), vsz AS (
                SELECT count(*) AS v FROM ref_uni
            ), ref_bi AS (
                SELECT b, count(*) AS c FROM (
                    SELECT unnest(list_transform(
                        generate_series(1, len(tk) - 1),
                        i -> tk[i] || ' ' || tk[i + 1])) AS b
                    FROM t WHERE doc_id % 10 = 0 AND len(tk) >= 2)
                GROUP BY b
            ), db AS (
                SELECT doc_id, unnest(list_transform(
                    generate_series(1, len(tk) - 1),
                    i -> tk[i] || ' ' || tk[i + 1])) AS b
                FROM t WHERE len(tk) >= 2
            ), scored AS (
                SELECT d.doc_id,
                       CAST(floor(ln(coalesce(rb.c, 0) + 1)
                                  * 1000000.0) AS BIGINT)
                       - CAST(floor(ln(coalesce(ru.c, 0)
                                       + (SELECT v FROM vsz))
                                    * 1000000.0) AS BIGINT) AS contrib
                FROM db d
                LEFT JOIN ref_bi rb ON rb.b = d.b
                LEFT JOIN ref_uni ru ON ru.w = split_part(d.b, ' ', 1)
            )
            SELECT t.doc_id,
                   CAST(coalesce(s.n, 0) AS BIGINT) AS n_bigrams,
                   CAST(coalesce(-s.ssum, 0) AS BIGINT) AS nll_u
            FROM t LEFT JOIN (
                SELECT doc_id, count(*) AS n, sum(contrib) AS ssum
                FROM scored GROUP BY doc_id) s USING (doc_id)
            ORDER BY t.doc_id
        """,
        "mixture_resample": f"""
            WITH w(source, w) AS (
                SELECT 'src' || CAST(i AS VARCHAR),
                       CASE WHEN i < 5 THEN 2 ELSE 1 END
                FROM generate_series(0, 19) t(i)
            ), cnt AS (
                SELECT source, count(*) AS n FROM documents GROUP BY source
            ), j AS (
                SELECT w.source, coalesce(cnt.n, 0) AS n, w.w
                FROM w LEFT JOIN cnt USING (source)
            ), star AS (
                SELECT n AS ns, w AS ws FROM j
                ORDER BY 1.0 * n / w, source LIMIT 1
            ), q AS (
                SELECT j.source, (star.ns * j.w) // star.ws AS quota
                FROM j, star
            ), r AS (
                SELECT doc_id, source,
                       row_number() OVER (PARTITION BY source
                                          ORDER BY {_h32}, doc_id) - 1
                           AS mix_rank
                FROM documents
            )
            SELECT r.doc_id, r.source, r.mix_rank
            FROM r JOIN q USING (source)
            WHERE r.mix_rank < q.quota
            ORDER BY r.doc_id
        """,
        "quality_filter_pctl": """
            WITH toks AS (
                SELECT doc_id,
                       unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
                FROM documents
            ), agg AS (
                SELECT doc_id,
                       count(*)            AS n_tokens,
                       count(DISTINCT tok) AS n_uniq_tokens,
                       sum(length(tok))    AS sum_token_len
                FROM toks GROUP BY doc_id
            ), st AS (
                SELECT d.doc_id, d.source,
                       CAST(coalesce(a.n_tokens, 0) AS DOUBLE) AS nt,
                       CAST(coalesce(a.n_uniq_tokens, 0) AS DOUBLE) AS nu,
                       CAST(coalesce(a.sum_token_len, 0) AS DOUBLE) AS sl
                FROM documents d LEFT JOIN agg a USING (doc_id)
            ), q AS (
                SELECT doc_id, source,
                       CAST(floor(
                         (CASE WHEN nt > 0 THEN nu / nt ELSE 0.0 END)
                         * (1.0 - exp(-nt / 32.0))
                         * (0.5 + 0.5 * least(1.0, greatest(0.0,
                              1.0 - abs((CASE WHEN nt > 0 THEN sl / nt
                                              ELSE 0.0 END) - 5.0) / 10.0)))
                         * 1000000.0) AS BIGINT) AS quality_u
                FROM st
            ), r AS (
                SELECT source, quality_u,
                       row_number() OVER (PARTITION BY source
                                          ORDER BY quality_u) - 1 AS rk,
                       count(*) OVER (PARTITION BY source) AS n
                FROM q
            ), thr AS (
                SELECT source, quality_u AS cut
                FROM r WHERE rk = ((n - 1) * 25) // 100
            )
            SELECT q.doc_id, q.source, q.quality_u
            FROM q JOIN thr USING (source)
            WHERE q.quality_u >= thr.cut
            ORDER BY q.doc_id
        """,
        "rollup_agg": """
            SELECT coalesce(lang, '<all>') AS lang,
                   coalesce(source, '<all>') AS source,
                   CAST(count(n_chars) AS BIGINT) AS n_rows,
                   CAST(coalesce(sum(n_chars), 0) AS BIGINT) AS sum_val
            FROM documents
            GROUP BY ROLLUP (lang, source)
            ORDER BY lang, source
        """,
        "asof_join": """
            WITH o AS (
                SELECT o_custkey, epoch_us(o_orderdate) AS od_us,
                       max(o_orderkey) AS o_orderkey
                FROM orders GROUP BY 1, 2
            )
            SELECT e.event_id, e.user_id, epoch_us(e.ts) AS ts_us,
                   o.o_orderkey, o.od_us AS o_orderdate_us
            FROM events e ASOF LEFT JOIN o
              ON e.user_id = o.o_custkey AND epoch_us(e.ts) >= o.od_us
            ORDER BY e.event_id
        """,
        "range_join": """
            WITH li AS (
                SELECT l_partkey, l_orderkey * 10 + l_linenumber AS uid,
                       epoch_us(l_shipdate) AS tus
                FROM lineitem
            )
            SELECT a.uid AS left_id, a.l_partkey AS key,
                   b.uid AS right_id, b.tus AS right_ts_us
            FROM li a JOIN li b
              ON a.l_partkey = b.l_partkey
             AND a.tus >= b.tus
             AND a.tus < b.tus + 7776000000000
            ORDER BY left_id, right_id
        """,
        "doc_len_quantiles": """
            WITH r AS (
                SELECT n_chars,
                       row_number() OVER (ORDER BY n_chars) - 1 AS rk,
                       count(*) OVER () AS n
                FROM documents
            )
            SELECT CAST(q.q_pct AS BIGINT) AS q_pct, r.n_chars AS value
            FROM (VALUES (25), (50), (90), (99)) q(q_pct)
            JOIN r ON r.rk = ((r.n - 1) * q.q_pct) // 100
            ORDER BY q.q_pct
        """,
        "hopping_window": """
            WITH e AS (
                SELECT epoch_us(ts) // 900000000 AS base,
                       CAST(floor(value * 100) AS BIGINT) AS cents
                FROM events
            ), x AS (
                SELECT e.base - t.k AS win_id, e.cents
                FROM e CROSS JOIN range(4) t(k)
            )
            SELECT win_id, count(*) AS n,
                   CAST(sum(cents) AS BIGINT) AS sum_cents
            FROM x GROUP BY win_id ORDER BY win_id
        """,
        "group_quantiles": """
            WITH r AS (
                SELECT lang, n_chars,
                       row_number() OVER (PARTITION BY lang
                                          ORDER BY n_chars) - 1 AS rk,
                       count(*) OVER (PARTITION BY lang) AS n
                FROM documents
            )
            SELECT r.lang, CAST(q.q_pct AS BIGINT) AS q_pct,
                   r.n_chars AS value
            FROM (VALUES (25), (50), (90), (99)) q(q_pct)
            JOIN r ON r.rk = ((r.n - 1) * q.q_pct) // 100
            ORDER BY r.lang, q.q_pct
        """,
        "repetition_score": """
            WITH t AS (
                SELECT doc_id AS did,
                       regexp_extract_all(lower(coalesce(text, '')),
                                          '[a-z0-9]+') AS tk
                FROM documents
            ), sh AS (
                SELECT did, unnest(
                    CASE WHEN len(tk) >= 3 THEN list_transform(
                              generate_series(1, len(tk) - 2),
                              i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])
                         WHEN len(tk) > 0 THEN [array_to_string(tk, ' ')]
                         ELSE [] END) AS s
                FROM t
            ), tot AS (
                SELECT did, count(*) AS n_sh, count(DISTINCT s) AS n_di
                FROM sh GROUP BY did
            )
            SELECT d.doc_id,
                   coalesce(n_sh, 0) AS n_shingles,
                   coalesce(n_di, 0) AS n_distinct,
                   CASE WHEN coalesce(n_sh, 0) = 0 THEN 0
                        ELSE CAST(floor(1000.0 * (n_sh - n_di) / n_sh)
                                  AS BIGINT) END AS rep_milli
            FROM documents d LEFT JOIN tot ON tot.did = d.doc_id
            ORDER BY d.doc_id
        """,
        "corpus_diff": """
            WITH old_v AS (
                SELECT doc_id, coalesce(text, '') AS text FROM documents
                WHERE doc_id % 7 <> 0
            ), new_v AS (
                SELECT doc_id,
                       CASE WHEN doc_id % 5 = 0
                            THEN coalesce(text, '') || ' v2'
                            ELSE coalesce(text, '') END AS text
                FROM documents WHERE doc_id % 10 <> 0
            )
            SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
                   CASE WHEN o.doc_id IS NULL THEN 'added'
                        WHEN n.doc_id IS NULL THEN 'removed'
                        WHEN o.text = n.text THEN 'same'
                        ELSE 'changed' END AS status
            FROM old_v o FULL OUTER JOIN new_v n ON o.doc_id = n.doc_id
            ORDER BY doc_id
        """,
        "select_representatives": """
            SELECT cluster_id, doc_id AS rep_id, n_chars AS rep_quality,
                   n_members
            FROM (
                SELECT a.cluster_id, a.doc_id, d.n_chars,
                       row_number() OVER (PARTITION BY a.cluster_id
                           ORDER BY d.n_chars DESC, a.doc_id ASC) AS rn,
                       count(*) OVER (PARTITION BY a.cluster_id)
                           AS n_members
                FROM (""" + _minhash_closure + """) a
                JOIN documents d USING (doc_id)
            )
            WHERE rn = 1
            ORDER BY cluster_id
        """,
        "pack_sequences": """
            WITH t AS (
                SELECT doc_id,
                       CAST(length(regexp_extract_all(lower(text),
                                                      '[a-z0-9]+'))
                            AS BIGINT) AS n_tokens
                FROM documents
            ), c AS (
                SELECT doc_id, n_tokens,
                       CAST(coalesce(sum(n_tokens) OVER (
                                ORDER BY doc_id ROWS BETWEEN UNBOUNDED
                                PRECEDING AND 1 PRECEDING), 0)
                            AS BIGINT) AS tok_offset
                FROM t
            )
            SELECT doc_id, n_tokens, tok_offset,
                   tok_offset // 256 AS win_start,
                   (tok_offset + greatest(n_tokens, 1) - 1) // 256
                       AS win_end
            FROM c ORDER BY doc_id
        """,
        "token_cms": """
            WITH f AS (
                SELECT unnest(regexp_extract_all(lower(coalesce(text, '')),
                                                 '[a-z0-9]+')) AS tok
                FROM documents
            ), c AS (
                SELECT tok, count(*) AS n FROM f GROUP BY tok
            ), b AS (
                SELECT t.r,
                       CAST(('0x' || substr(md5(c.tok || '|' || t.r), 1, 16))
                            ::UBIGINT % 2048 AS BIGINT) AS bucket,
                       c.n
                FROM c CROSS JOIN range(4) t(r)
            )
            SELECT CAST(r AS BIGINT) AS "row", bucket,
                   CAST(sum(n) AS BIGINT) AS cnt
            FROM b GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "shingle_hll": """
            WITH t AS (
                SELECT regexp_extract_all(lower(coalesce(text, '')),
                                          '[a-z0-9]+') AS tk
                FROM documents
            ), sh AS (
                SELECT unnest(
                    CASE WHEN len(tk) >= 3 THEN list_transform(
                              generate_series(1, len(tk) - 2),
                              i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])
                         WHEN len(tk) > 0 THEN [array_to_string(tk, ' ')]
                         ELSE [] END) AS s
                FROM t
            ), d AS (
                SELECT DISTINCT s FROM sh
            ), h AS (
                SELECT ('0x' || substr(md5(s), 1, 16))::UBIGINT AS hv
                FROM d
            ), r AS (
                SELECT CAST(hv >> 52 AS BIGINT) AS reg,
                       hv & 4503599627370495 AS w
                FROM h
            ), rk AS (
                SELECT reg, max(CASE WHEN w = 0 THEN 53
                                     ELSE 53 - length(bin(w)) END) AS rank
                FROM r GROUP BY reg
            ), hist AS (
                SELECT rank, count(*) AS n_registers FROM rk GROUP BY rank
                UNION ALL
                SELECT 0, 4096 - (SELECT count(*) FROM rk)
                WHERE (SELECT count(*) FROM rk) < 4096
            )
            SELECT CAST(rank AS BIGINT) AS rank,
                   CAST(n_registers AS BIGINT) AS n_registers
            FROM hist ORDER BY rank
        """,
        # ---- golden-output oracles for the image stages: the corpora
        # are (n, seed)-deterministic with NO sf dependence, so the
        # frozen per-image integer outputs under tests/golden/ ARE the
        # expected values (kmcp's version-pinned golden profile,
        # demo-profiling/mock.kmcp.gz.kmcp.profile.v0.8.2 analogue;
        # regenerated only via tools/make_golden.py, drift caught by
        # tests/test_imagecodec.py before the driver ever runs) -------
        "decode_verify": f"""
            SELECT image_id, phash_ok, psnr_cdb, w_decoded, h_decoded,
                   pix_sum
            FROM read_parquet('{_GOLDEN_DIR}/decode_verify.parquet')
            ORDER BY image_id
        """,
        "resize_images": f"""
            SELECT image_id, w, h, fmt, phash, pix_sum
            FROM read_parquet('{_GOLDEN_DIR}/resize_images.parquet')
            ORDER BY image_id
        """,
        "frame_sample": f"""
            SELECT image_id, video_id, frame_idx, w, h, phash, pix_sum
            FROM read_parquet('{_GOLDEN_DIR}/frame_sample.parquet')
            ORDER BY image_id
        """,
        "image_features": f"""
            SELECT image_id, emb_dim, emb_l2_u
            FROM read_parquet('{_GOLDEN_DIR}/image_features.parquet')
            ORDER BY image_id
        """,
        "image_dedup": f"""
            SELECT image_id, cluster_id
            FROM read_parquet('{_GOLDEN_DIR}/image_dedup.parquet')
            ORDER BY image_id
        """,
        # r5: same golden pattern for the two remaining deterministic
        # no-oracle entries — profile_em's EM is iterative (inherently
        # non-SQL) but bit-deterministic on its (n, seed) corpus, and
        # audio_features likewise.  NOTE (ADVICE r4): golden oracles
        # are SELF-REFERENTIAL — they pin determinism/drift, not
        # independent correctness; independent pins live in pytest
        # (oracle_profile.py EM oracle; test_audiocodec filterbank
        # invariants; test_imagecodec numpy checksum property).
        "profile_em": f"""
            SELECT target, percentage, coverage, score, chunks_frac,
                   reads, ureads, hic_ureads, refsize
            FROM read_parquet('{_GOLDEN_DIR}/profile_em.parquet')
            ORDER BY target
        """,
        "audio_features": f"""
            SELECT audio_id, duration_ms, n_frames, rms_milli,
                   emb_dim, emb_l2_u
            FROM read_parquet('{_GOLDEN_DIR}/audio_features.parquet')
            ORDER BY audio_id
        """,
    }
