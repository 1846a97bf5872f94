"""Incremental near-dup growth: add new rows to a checkpointed dedup
corpus without re-reading payloads or re-verifying prior epochs.

kmcp analogue: the reference grows a database incrementally by building
per-shard indexes and searching new queries against every shard, then
merging results (reference: README.md:118-122, kmcp/cmd/merge.go —
semantics re-derived, not ported).  Here each increment is an *epoch*
under the same workdir:

    workdir/01_signatures 02_edges 03_clusters        epoch 0 (dedup_pipeline)
    workdir/inc_001/01_signatures 02_edges 03_clusters  epoch 1
    workdir/inc_002/...                                  epoch 2 ...

A new epoch:

1. sketches ONLY the new rows — payload (bytes/caption) I/O is
   increment-sized, never corpus-sized;
2. fans band keys of the new rows (``fresh=1``) and of every prior
   epoch's PERSISTED signature checkpoint (``fresh=0`` — bkeys/ckeys
   are stored finalized, so re-fanning costs no tokenization and no
   payload read) into one ``groupby(part)`` exchange;
3. the bucket verifier in ``fresh_gate`` mode generates stars/pairs
   ONLY in buckets containing ≥1 fresh entry — stale buckets' edges are
   already in prior epochs' 02_edges checkpoints — while (ident → id)
   membership rows stay unconditional so cross-bucket pairs against
   stale classes still expand;
4. the epoch's edges are checkpointed; connected components run over
   the union of ALL epochs' edge checkpoints (deduplicated: a stale
   pair re-verified because a fresh row joined its bucket must not
   double-count); assignments cover the union of all epochs' ids.

Invariant (tests/test_increment.py): ``pipeline(A)`` then
``increment(B)`` equals ``pipeline(A ∪ B)`` rebuilt from scratch —
provided no skew cap (``max_bucket`` / ``max_shingle_df``) binds
differently across the two paths, since caps act on observed bucket
load, which grows with the corpus.

100 TB shape: step 2 still moves prior epochs' band keys (~30 u64/row)
through the exchange.  That is the kmcp trade (every search probes all
shards) and is payload-free; for key-stable corpora the next
optimization is a persisted band index hive-partitioned by ``part`` so
stale keys are read node-locally instead of shuffled.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np
import pyarrow as pa
import ray

from kmcp_ray import bands as bands_mod
from kmcp_ray import buckets as buckets_mod
from kmcp_ray.config import DedupConfig
from kmcp_ray.pipeline import (ALL_GENERATORS, PipelineResult, _check_config,
                               _checkpoint, _done, _stage_dir, cc_and_assign,
                               edges_from_raw, sketch_stage)


def _epoch_dirs(workdir: str) -> list[str]:
    """Existing increment-epoch dirs, oldest first."""
    return sorted(d for d in os.listdir(workdir)
                  if d.startswith("inc_")
                  and os.path.isdir(os.path.join(workdir, d)))


def _stage_files(workdirs: list[str], name: str) -> list[str]:
    """Explicit parquet file list across epochs' stage dirs —
    ``read_parquet`` with MULTIPLE paths does not expand directories."""
    out = []
    for p in workdirs:
        d = _stage_dir(p, name)
        out.extend(os.path.join(d, f) for f in sorted(os.listdir(d))
                   if f.endswith(".parquet"))
    return out


def _add_fresh(value: int):
    def fn(t: pa.Table) -> pa.Table:
        return t.append_column(
            "fresh", pa.array(np.full(t.num_rows, value, np.int8),
                              pa.int8()))
    return fn


def dedup_edge_rows(edges_ds, P: int):
    """Globally drop duplicate (id_a, id_b, via) edge rows, keeping the
    max score — a fresh row joining a stale bucket re-verifies that
    bucket's stale pairs, and the combined edge table must count each
    discovery once (kmcp merge's duplicate-input guard analogue,
    kmcp/cmd/merge.go:140-149 — semantics re-derived)."""
    import pandas as pd

    from kmcp_ray.exchange import Exchange, hash_part_fn

    ex = Exchange([("id_a", pa.string()), ("id_b", pa.string()),
                   ("via", pa.string()), ("score", pa.float64())], P)
    packed = edges_ds.map_batches(
        ex.make_pack_fn(hash_part_fn("id_a", "id_b", P=P)),
        batch_format="pyarrow", zero_copy_batch=True)

    def uniq(group: pa.Table) -> pa.Table:
        u = ex.unpack(group)
        df = pd.DataFrame({
            "id_a": u["id_a"].to_numpy(zero_copy_only=False),
            "id_b": u["id_b"].to_numpy(zero_copy_only=False),
            "via": u["via"].to_numpy(zero_copy_only=False),
            "score": u["score"].to_numpy(zero_copy_only=False)})
        df = df.sort_values("score", ascending=False, kind="mergesort") \
            .drop_duplicates(subset=["id_a", "id_b", "via"])
        return pa.table({"id_a": pa.array(df["id_a"].to_numpy(), pa.string()),
                         "id_b": pa.array(df["id_b"].to_numpy(), pa.string()),
                         "via": pa.array(df["via"].to_numpy(), pa.string()),
                         "score": pa.array(df["score"].to_numpy(),
                                           pa.float64())})

    return packed.groupby("part").map_groups(uniq, batch_format="pyarrow")


def dedup_increment(new_ds, cfg: DedupConfig, workdir: str, *,
                    id_col: str = "image_id", text_col: str = "caption",
                    phash_col: Optional[str] = "phash",
                    bytes_col: Optional[str] = "bytes",
                    enable=ALL_GENERATORS) -> PipelineResult:
    """Add ``new_ds`` rows to the checkpointed corpus at ``workdir`` as
    a new epoch; returns assignments/edges/signatures covering ALL
    epochs.  The base epoch must be complete (01_signatures + 02_edges
    ``_DONE``); the config must match the checkpointed one."""
    _check_config(workdir, cfg)
    if not (_done(workdir, "01_signatures") and _done(workdir, "02_edges")):
        raise ValueError(
            f"{workdir} has no completed base run (01_signatures/02_edges "
            "must be _DONE) — run dedup_pipeline(..., workdir=...) first")

    prior = [workdir] + [os.path.join(workdir, d)
                         for d in _epoch_dirs(workdir)]
    for p in prior[1:]:
        if not (_done(p, "01_signatures") and _done(p, "02_edges")):
            raise ValueError(f"incomplete prior epoch at {p} — delete it "
                             "and re-run the increment")
    epoch_dir = os.path.join(workdir, f"inc_{len(prior):03d}")
    os.makedirs(epoch_dir, exist_ok=True)

    gens = tuple(g for g in enable
                 if not (g == "phash" and phash_col is None))

    # --- 1. sketch only the new rows (with vsk: epochs must verify on
    # resume without their raw input, like the base checkpointed run) --
    if _done(epoch_dir, "01_signatures"):
        new_sig = ray.data.read_parquet(
            _stage_dir(epoch_dir, "01_signatures"))
    else:
        new_sig = sketch_stage(new_ds, cfg, id_col=id_col, text_col=text_col,
                               phash_col=phash_col, bytes_col=bytes_col,
                               with_vsk=True)
        new_sig = _checkpoint(new_sig, epoch_dir, "01_signatures")

    old_sig = ray.data.read_parquet(_stage_files(prior, "01_signatures"))
    sig_union = old_sig.union(new_sig)

    # --- 2+3. fresh-gated band exchange → epoch edges ----------------
    if _done(epoch_dir, "02_edges"):
        inc_edges = ray.data.read_parquet(_stage_dir(epoch_dir, "02_edges"))
    else:
        band_fn = bands_mod.make_band_fn(cfg, enable=gens)
        old_bands = old_sig.map_batches(
            band_fn, batch_format="pyarrow", batch_size=4096,
            zero_copy_batch=True).map_batches(
            _add_fresh(0), batch_format="pyarrow", zero_copy_batch=True)
        new_bands = new_sig.map_batches(
            band_fn, batch_format="pyarrow", batch_size=4096,
            zero_copy_batch=True).map_batches(
            _add_fresh(1), batch_format="pyarrow", zero_copy_batch=True)
        verifier = buckets_mod.make_bucket_verifier(cfg, fresh_gate=True)
        raw = old_bands.union(new_bands).groupby("part") \
            .map_groups(verifier, batch_format="pyarrow")
        inc_edges = edges_from_raw(raw, sig_union, cfg)
        inc_edges = _checkpoint(inc_edges, epoch_dir, "02_edges")

    # --- 4. connected components over ALL epochs' deduplicated edges -
    # (write_parquet of an empty stage writes NO part files — an
    # edge-free prior epoch reads back as the empty edge table)
    efiles = _stage_files(prior, "02_edges")
    prior_edges = ray.data.read_parquet(efiles) if efiles \
        else ray.data.from_arrow(buckets_mod.empty_edges())
    all_edges = prior_edges.union(inc_edges)
    all_edges = dedup_edge_rows(all_edges, cfg.num_partitions).materialize()
    ids_ds = sig_union.select_columns(["image_id"])
    assignments, cluster_map = cc_and_assign(all_edges, ids_ds, cfg)
    if not _done(epoch_dir, "03_clusters"):
        assignments = _checkpoint(assignments, epoch_dir, "03_clusters")
    else:
        assignments = ray.data.read_parquet(
            _stage_dir(epoch_dir, "03_clusters"))

    return PipelineResult(assignments=assignments, edges=all_edges,
                          signatures=sig_union, cluster_map=cluster_map)


# ------------------------------------------------------------- corpus diff

def corpus_diff(old_ds, new_ds, *, id_col="doc_id", text_col="text",
                num_partitions: int = 64):
    """Epoch-to-epoch corpus delta by content hash: one row per id in
    either version, ``(doc_id, status)`` with status in
    ``added | removed | changed | same`` — the dataset-versioning diff
    that decides what an incremental rebuild must touch (added/changed
    rows feed :func:`dedup_increment`; removed ids invalidate their
    clusters).

    Shape: both sides map to ``(id, content_hash)`` (payload dropped at
    the read, as the sketch stage does), tag/union, ONE packed exchange
    by id hash, vectorized per-partition segment compare.  Never moves
    text, never materializes either corpus.
    """
    from kmcp_ray import hashing
    from kmcp_ray.exchange import Exchange, u64_part_fn

    P = int(num_partitions)
    ex = Exchange([("side", pa.int8()), ("id", pa.int64()),
                   ("h", pa.uint64())], P)
    pack = ex.make_pack_fn(u64_part_fn("id", P=P))

    def tag(side_val):
        def fn(t: pa.Table) -> pa.Table:
            texts = t.column(text_col).to_numpy(zero_copy_only=False)
            h = hashing.hash_strings(np.where(texts == None, "", texts))  # noqa: E711
            n = t.num_rows
            return pa.table({
                "side": pa.array(np.full(n, side_val, np.int8), pa.int8()),
                "id": t.column(id_col).cast(pa.int64()),
                "h": pa.array(h, pa.uint64())})
        return fn

    both = old_ds.map_batches(tag(0), batch_format="pyarrow",
                              zero_copy_batch=True) \
        .union(new_ds.map_batches(tag(1), batch_format="pyarrow",
                                  zero_copy_batch=True)) \
        .map_batches(pack, batch_format="pyarrow", zero_copy_batch=True)

    def per_partition(group: pa.Table) -> pa.Table:
        u = ex.unpack(group)
        side = u["side"].to_numpy(zero_copy_only=False)
        ids = u["id"].to_numpy(zero_copy_only=False)
        h = u["h"].to_numpy(zero_copy_only=False)
        if len(ids) == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "status": pa.array([], pa.string())})
        order = np.lexsort((side, ids))
        ids_s, side_s, h_s = ids[order], side[order], h[order]
        first = np.concatenate(([True], ids_s[1:] != ids_s[:-1]))
        starts = np.nonzero(first)[0]
        counts = np.diff(np.append(starts, len(ids_s)))
        # per id: 1 row -> added (side 1) / removed (side 0);
        # 2 rows (sorted old,new) -> same or changed by hash compare
        single = counts == 1
        out_ids = ids_s[starts]
        status = np.empty(len(starts), dtype=object)
        s_single = side_s[starts[single]]
        status[single] = np.where(s_single == 1, "added", "removed")
        both_m = ~single
        b_starts = starts[both_m]
        status[both_m] = np.where(h_s[b_starts] == h_s[b_starts + 1],
                                  "same", "changed")
        return pa.table({"doc_id": pa.array(out_ids, pa.int64()),
                         "status": pa.array(status, pa.string())})

    return both.groupby("part").map_groups(per_partition,
                                           batch_format="pyarrow")
