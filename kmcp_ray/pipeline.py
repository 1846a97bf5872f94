"""End-to-end near-duplicate detection + clustering pipeline.

    read (Lance/Parquet)
      → sketch    map_batches, Arrow zero-copy       (kmcp `compute`)
        [checkpoint 01_signatures]
      → bands     map_batches fan-out                 (kmcp `index`)
      → buckets   groupby(part) → vectorized verify   (kmcp `search`)
        [checkpoint 02_edges]
      → cc        spanning-forest reduce + driver UF  (kmcp `merge`)
      → emit      broadcast cluster map → assignments (kmcp `profile`)
        [checkpoint 03_clusters]

Checkpoint/resume: each stage writes partitioned Parquet into
``workdir/<stage>`` with a ``_DONE`` marker and the frozen config next
to it; a rerun skips completed stages and refuses a config mismatch —
the generalized ``_info.txt`` cache pattern of the reference
(kmcp/cmd/index.go:301-419) plus its schema-compatibility check
(kmcp/cmd/index/serialization.go:90-99).

Scale notes (100 TB / 10^12 rows): image ``bytes`` are dropped at the
sketch stage, so only (id, sketch, minhash, phash) ≈ 1.3 KB/row enters
the one wide shuffle; the shuffle key is a single hash partition column
(``num_partitions`` should be ≥ 4× total cores); the cluster map that is
broadcast for emission covers only rows that occur in ≥1 duplicate pair
— for worst-case dup-heavy corpora swap the broadcast for the bucketed
hash join in ``assign_via_join`` (same result, one more shuffle).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Any, Optional

import numpy as np
import pyarrow as pa
import ray

from kmcp_ray import bands as bands_mod
from kmcp_ray import buckets as buckets_mod
from kmcp_ray import cc as cc_mod
from kmcp_ray import sketch as sketch_mod
from kmcp_ray.config import DedupConfig

ALL_GENERATORS = ("minhash", "contain", "phash", "exact")


@dataclass
class PipelineResult:
    assignments: "ray.data.Dataset"   # (image_id, cluster_id)
    edges: "ray.data.Dataset"         # (id_a, id_b, via, score)
    signatures: "ray.data.Dataset"
    cluster_map: "dict | tuple"       # dict or (nodes, roots) arrays —
    #                                   only rows touched by ≥1 edge


# ---------------------------------------------------------------- checkpoints

def _stage_dir(workdir: str, name: str) -> str:
    return os.path.join(workdir, name)


def _done(workdir: str, name: str) -> bool:
    return os.path.exists(os.path.join(_stage_dir(workdir, name), "_DONE"))


def _schema_marker() -> str:
    """Version marker of the persisted signature-table layout: resuming
    a workdir whose checkpoints were written under an older column set
    must be refused up front with a clear message instead of crashing in
    the band stage with a missing-column error — the kmcp serialization
    compatibility check (kmcp/cmd/index/serialization.go:90-99
    analogue, ADVICE r2 #3)."""
    from kmcp_ray.sketch import SIGNATURE_SCHEMA_COLS
    return ",".join(SIGNATURE_SCHEMA_COLS)


def _check_config(workdir: str, cfg: DedupConfig) -> None:
    """Refuse resuming under a different sketch/signature config or an
    incompatible signature-table schema version."""
    path = os.path.join(workdir, "config.json")
    spath = os.path.join(workdir, "schema.txt")
    if os.path.exists(path):
        with open(path) as f:
            stored = f.read()
        if stored != cfg.to_json():
            raise ValueError(
                f"checkpoint at {workdir} was produced with a different "
                "DedupConfig — refusing to resume (kmcp compatibility-check "
                "analogue). Delete the workdir or pass the original config.")
        stored_schema = ""
        if os.path.exists(spath):
            with open(spath) as f:
                stored_schema = f.read()
        if stored_schema != _schema_marker():
            raise ValueError(
                f"checkpoint at {workdir} was written under signature-table "
                f"schema [{stored_schema or '<pre-versioning>'}] but this "
                f"build stores [{_schema_marker()}] — refusing to resume "
                "(kmcp serialization compatibility-check analogue). Delete "
                "the workdir to re-sketch.")
    else:
        os.makedirs(workdir, exist_ok=True)
        with open(path, "w") as f:
            f.write(cfg.to_json())
        with open(spath, "w") as f:
            f.write(_schema_marker())


def _checkpoint(ds: "ray.data.Dataset", workdir: str, name: str) -> "ray.data.Dataset":
    """Write a stage to Parquet (partitioned part files), mark done,
    and return a fresh Dataset reading from it (cheap lineage restart).

    A ``_manifest.json`` (underscore prefix: ignored by Parquet
    dataset discovery) records the stage's lineage + metrics (rows,
    file list, wall seconds, io format) — the kmcp ``_info.txt`` /
    ``__db.yml`` metadata analogue required by the north rule's
    per-partition lineage contract; ``rows`` comes from Parquet footer
    metadata (no data pass)."""
    import time as _time

    out = _stage_dir(workdir, name)
    if os.path.exists(out):
        # no _DONE marker (checked by the caller) → a prior run crashed
        # mid-write; stale partial files would silently duplicate rows
        import shutil
        shutil.rmtree(out)
    os.makedirs(out, exist_ok=True)
    t0 = _time.time()
    ds.write_parquet(out)
    wall = _time.time() - t0
    back = ray.data.read_parquet(out)
    files = sorted(f for f in os.listdir(out) if f.endswith(".parquet"))
    # per-PARTITION lineage (north rule): rows + bytes per part file,
    # straight from Parquet footers — no data pass, and a resumed run
    # can audit exactly which partition produced which rows.
    import pyarrow.parquet as _pq
    parts = [{"file": fn,
              "rows": _pq.ParquetFile(os.path.join(out, fn)).metadata.num_rows,
              "bytes": os.path.getsize(os.path.join(out, fn))}
             for fn in files]
    from kmcp_ray.ioops import io_format
    with open(os.path.join(out, "_manifest.json"), "w") as f:
        json.dump({"stage": name, "rows": sum(p["rows"] for p in parts),
                   "n_files": len(files), "partitions": parts,
                   "write_wall_s": round(wall, 3),
                   "io_format": io_format()}, f, indent=1)
    with open(os.path.join(out, "_DONE"), "w") as f:
        f.write("ok")
    return back


# ------------------------------------------------------------------- stages

def sketch_stage(ds, cfg: DedupConfig, *, id_col="image_id", text_col="caption",
                 phash_col="phash", bytes_col="bytes",
                 batch_size: "int | None" = None, with_vsk: bool = True):
    """Input rows → signature table; drops every payload column.

    ``batch_size=None`` (default) lets Ray FUSE this map with the
    upstream ReadParquet into one operator, so the wide ``bytes``
    payload never enters the object store — it is consumed inside the
    read task and only the ~1.3 KB/row signature block is written out
    (an explicit batch_size breaks that fusion and was measured to
    double the stage's wall time and plasma traffic).  Pass a value
    only when upstream blocks are too large for worker heaps."""
    fn = sketch_mod.make_sketch_fn(cfg, id_col=id_col, text_col=text_col,
                                   phash_col=phash_col, bytes_col=bytes_col,
                                   with_vsk=with_vsk)
    kw = {} if batch_size is None else {"batch_size": batch_size}
    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True,
                          **kw)


def edges_stage(sig_ds, cfg: DedupConfig, enable=ALL_GENERATORS,
                vsk_provider=None):
    """Signatures → verified candidate-pair edges.

    Shuffles, all over small rows — and the one WIDE exchange carries
    u64 ident-class entries, not id strings (bands.py r3):
      1. packed band rows → ``groupby(part)`` → bucket processing
         (stars + membership emitted at designated buckets; phash class
         pairs verified in place; sk class pairs emitted as ``cand``)
      2. global class-pair dedup over u64 idents — a pair colliding in
         many bands/partitions is verified exactly once
      3. class→member expansion joins against the membership rows
         (pair-volume-bounded: membership is semi-filtered to the
         idents that occur in pairs)
      4. two hash joins attach the bottom-k sketches from the signature
         table (kmcp: queries routed to the index that holds sketches)

    ``vsk_provider(need_ids | None) -> Dataset[(image_id, vsk)]``: when
    given, verification sketches come from this callable (the pipeline
    passes a lazy re-sketch over the raw input, filtered to candidate
    ids before tokenization) instead of a ``vsk`` column on ``sig_ds``
    — so the materialized signature table never carries the blob.
    """
    # batch_size=4096 DELIBERATELY breaks fusion with the read→sketch
    # chain: packing density dominates — fusing (whole-block batches at
    # the parquet reader's granularity) was measured 13.5-14.0 s for
    # this exchange at 800k rows vs 8.5-9.0 s unfused@4096, and
    # unfused@1024 reproduces the fused cost (12.8-13.2 s), so the ~5 s
    # is small-batch packing overhead (4x the part-rows through the
    # shuffle sort), not the ~274 B/row signature hop this op re-adds
    # (r4 A/B, recorded in BASELINE.md)
    band_fn = bands_mod.make_band_fn(cfg, enable=enable)
    band_ds = sig_ds.map_batches(band_fn, batch_format="pyarrow",
                                 batch_size=4096, zero_copy_batch=True)
    verifier = buckets_mod.make_bucket_verifier(cfg)
    raw = band_ds.groupby("part").map_groups(verifier, batch_format="pyarrow")
    return edges_from_raw(raw, sig_ds, cfg, vsk_provider=vsk_provider)


def _extract_class_pairs_driver(raw, cap: int, member_cap: int,
                                max_bytes: int = 2 << 30):
    """Small arm of the class-pair + membership extraction: ONE
    projected zero-copy pass over the MATERIALIZED verifier output
    (``to_arrow_refs`` + local-plasma ``ray.get``; no executor run)
    that does three things at once (r5 — the r4 version made two
    string-filter passes costing ~5.7 s at 3.2M rows):

    * pulls the ``cand``/``phashc`` rows' ident/score columns and
      dedups both pair families with one lexsort each (phashc dedup:
      ADVICE r4 — bkey truncation can re-emit a pair from a colliding
      later chunk's bucket, ~2^-30/extra chunk; scores deterministic
      per ident pair so first-wins is exact);
    * classifies every row ONCE via ``pc.index_in`` (a single string
      scan instead of four equality filters) and stashes the
      ``member_sk``/``member_ph`` row indices + idents per block;
    * after pair dedup, gathers the member ID STRINGS only for idents
      that occur in a pair — ``ChunkedArray.take`` on hit rows, so the
      heavy id column is never materialized for non-candidate rows.

    Returns ``(pairs_tbl, phc_tbl, mem_sk, mem_ph)`` where ``mem_*``
    are ``(ident u64 array, id object array)`` pairs — or ``mem_* =
    None`` when the filtered membership exceeds ``member_cap`` (the
    caller then runs the distributed expansion arms with the pair
    tables).  Returns ``None`` outright once more than ``cap`` pair
    rows accumulate or the materialized raw exceeds the 2 GB
    block-bytes gate (on a multi-node cluster the driver would have to
    FETCH every block — past the gate the distributed dedup exchange
    is the right arm; same measured-gate pattern as the
    broadcast/exchange switches)."""
    import pyarrow.compute as pc

    if (raw.size_bytes() or (1 << 62)) > max_bytes:
        return None
    _VIAS = pa.array(["cand", "phashc", "member_sk", "member_ph"])
    ca, cb, pa_a, pa_b, pa_s = [], [], [], [], []
    stash = []      # (block table, sk_rows, sk_idents, ph_rows, ph_idents)
    total = 0
    for ref in raw.to_arrow_refs():
        t = ray.get(ref)
        if t.num_rows == 0 or "via" not in t.column_names:
            # hash-shuffle aggregators emit schema-less empty bundles
            # for empty partitions (the Ray 2.49.2 artifact documented
            # below) — nothing to extract from them
            continue
        # int8 via_code (buckets.VIA_*, same 0-3 order as _VIAS) — a
        # zero-copy int read instead of a 10M-row string scan; the
        # index_in fallback keeps raw tables from older producers
        # working
        if "via_code" in t.column_names:
            code = t.column("via_code") \
                .to_numpy(zero_copy_only=False).astype(np.int64)
        else:
            code = pc.fill_null(
                pc.index_in(t["via"], value_set=_VIAS), -1) \
                .to_numpy(zero_copy_only=False).astype(np.int64)
        ia = t.column("ident_a").to_numpy(zero_copy_only=False)
        m = code == 0
        mp = code == 1
        if m.any() or mp.any():
            ib = t.column("ident_b").to_numpy(zero_copy_only=False)
            total += int(m.sum()) + int(mp.sum())
            if total > cap:
                return None
            if m.any():
                ca.append(ia[m])
                cb.append(ib[m])
            if mp.any():
                pa_a.append(ia[mp])
                pa_b.append(ib[mp])
                pa_s.append(t.column("score")
                            .to_numpy(zero_copy_only=False)[mp])
        sk_rows = np.nonzero(code == 2)[0]
        ph_rows = np.nonzero(code == 3)[0]
        if len(sk_rows) or len(ph_rows):
            stash.append((t, sk_rows, ia[sk_rows], ph_rows, ia[ph_rows]))

    def _dedup(aa, bb, ss=None):
        a = np.concatenate(aa) if aa else np.empty(0, np.uint64)
        b = np.concatenate(bb) if bb else np.empty(0, np.uint64)
        s = (np.concatenate(ss) if ss else np.empty(0, np.float64)) \
            if ss is not None else None
        if len(a):
            order = np.lexsort((b, a))
            a, b = a[order], b[order]
            first = np.concatenate(([True], (a[1:] != a[:-1])
                                    | (b[1:] != b[:-1])))
            if s is not None:
                s = s[order][first]
            a, b = a[first], b[first]
        return a, b, s

    a, b_, _ = _dedup(ca, cb)
    pha, phb, phs = _dedup(pa_a, pa_b, pa_s)
    pairs_tbl = pa.table({"ident_a": pa.array(a, pa.uint64()),
                          "ident_b": pa.array(b_, pa.uint64())})
    phc_tbl = pa.table({
        "ident_a": pa.array(pha, pa.uint64()),
        "ident_b": pa.array(phb, pa.uint64()),
        "score": pa.array(phs, pa.float64())})

    # ---- member id gather, restricted to pair-involved idents ------
    need_sk = np.unique(np.concatenate((a, b_))) if len(a) \
        else np.empty(0, np.uint64)
    need_ph = np.unique(np.concatenate((pha, phb))) if len(pha) \
        else np.empty(0, np.uint64)

    def _in(sorted_keys: np.ndarray, v: np.ndarray) -> np.ndarray:
        if len(sorted_keys) == 0 or len(v) == 0:
            return np.zeros(len(v), bool)
        pos = np.searchsorted(sorted_keys, v)
        pos_c = np.minimum(pos, len(sorted_keys) - 1)
        return (pos < len(sorted_keys)) & (sorted_keys[pos_c] == v)

    sk_idn, sk_ids, ph_idn, ph_ids = [], [], [], []
    n_mem = 0
    for t, sk_rows, sk_i, ph_rows, ph_i in stash:
        hit = _in(need_sk, sk_i)
        hit_ph = _in(need_ph, ph_i)
        n_mem += int(hit.sum()) + int(hit_ph.sum())
        if n_mem > member_cap:
            return pairs_tbl, phc_tbl, None, None
        if hit.any():
            sk_idn.append(sk_i[hit])
            sk_ids.append(t.column("id_a")
                          .take(pa.array(sk_rows[hit], pa.int64()))
                          .to_numpy(zero_copy_only=False))
        if hit_ph.any():
            ph_idn.append(ph_i[hit_ph])
            ph_ids.append(t.column("id_a")
                          .take(pa.array(ph_rows[hit_ph], pa.int64()))
                          .to_numpy(zero_copy_only=False))

    def _cat(idn_l, ids_l):
        return (np.concatenate(idn_l) if idn_l else np.empty(0, np.uint64),
                np.concatenate(ids_l) if ids_l else np.empty(0, object))

    return pairs_tbl, phc_tbl, _cat(sk_idn, sk_ids), _cat(ph_idn, ph_ids)


def _to_ds(tbl: pa.Table, chunks: int = 32):
    """Arrow table → multi-block in-memory Dataset so downstream maps
    parallelize (a single from_arrow block would serialize them)."""
    n = tbl.num_rows
    step = max(1, -(-n // chunks))
    slices = [tbl.slice(i, step) for i in range(0, max(n, 1), step)]
    return ray.data.from_arrow(slices)


def edges_from_raw(raw, sig_ds, cfg: DedupConfig, vsk_provider=None):
    """Verifier output stream → final verified edge dataset (the part
    of the edge stage shared by the full and the incremental band
    exchanges: class-pair dedup, class→member expansion, sketch attach,
    pair verification).

    ``KMCP_STAGE_TIMERS=1`` prints per-step wall times to stderr — the
    n-independent-tail diagnostic behind the r4 scaling work."""
    import pyarrow.compute as pc

    _timers = os.environ.get("KMCP_STAGE_TIMERS") == "1"
    import time as _time
    _t0 = [_time.time()]

    def _tick(name):
        if _timers:
            import sys as _sys
            print(f"[edges {name}] {_time.time() - _t0[0]:.2f}s",
                  file=_sys.stderr)
        _t0[0] = _time.time()

    raw = raw.materialize()          # small: pairs, stars + membership rows
    _tick("raw_mat")

    # hash shuffle (when the caller enabled it, see perf.py) is proven
    # for the one wide exchange above — but the pinned Ray release's
    # (2.49.2, re-confirmed broken 2026-08-18; re-test on upgrade)
    # aggregator crashes on the schema-less empty bundles that
    # union-fed exchanges downstream can produce (ArrowInvalid: no
    # FieldRef 'part' in empty schema).  Datasets capture the shuffle
    # strategy from their ROOT's context, so restoring the ambient
    # setting alone is not enough: re-root the materialized edge blocks
    # (zero-copy refs) under a temporary sort context so every
    # downstream exchange of THIS pipeline runs sort-based — then
    # restore the caller's strategy (a process that armed hash once
    # keeps it across pipeline runs; ADVICE r2 #2).
    import ray.data as _rd
    from ray.data.context import ShuffleStrategy as _SS
    _ctx = _rd.DataContext.get_current()
    if _ctx.shuffle_strategy == _SS.HASH_SHUFFLE:
        _ctx.shuffle_strategy = _SS.SORT_SHUFFLE_PULL_BASED
        try:
            refs = raw.to_arrow_refs()
            if refs:
                raw = _rd.from_arrow_refs(refs)
        finally:
            _ctx.shuffle_strategy = _SS.HASH_SHUFFLE

    FINAL_COLS = ["id_a", "id_b", "via", "score"]
    _STAR_VIAS = pa.array(["exact", "minhash", "phash"])
    verified = raw.map_batches(
        lambda t: t.filter(pc.is_in(t["via"], value_set=_STAR_VIAS))
                   .select(FINAL_COLS),
        batch_format="pyarrow", zero_copy_batch=True)

    def _members(via_name):
        def fn(t: pa.Table) -> pa.Table:
            tt = t.filter(pc.equal(t["via"], via_name))
            return pa.table({"ident": tt["ident_a"], "id": tt["id_a"]})
        return raw.map_batches(fn, batch_format="pyarrow",
                               zero_copy_batch=True)

    def _filter_members(members_ds, pairs_mat):
        """Semi-filter the (ident, id) membership to idents that occur
        in the materialized class-pair table — keeps the expansion
        pair-volume-bounded."""
        chunks = [np.empty(0, np.uint64)]
        for b in pairs_mat.iter_batches(batch_size=1 << 18,
                                        batch_format="pyarrow"):
            chunks.append(b.column("ident_a").to_numpy(zero_copy_only=False))
            chunks.append(b.column("ident_b").to_numpy(zero_copy_only=False))
        need = np.unique(np.concatenate(chunks))
        need_ref = ray.put(need)

        def filt(t: pa.Table) -> pa.Table:
            keys = ray.get(need_ref)
            v = t.column("ident").to_numpy(zero_copy_only=False)
            pos = np.searchsorted(keys, v)
            pos_c = np.minimum(pos, max(len(keys) - 1, 0))
            hit = (pos < len(keys)) & (keys[pos_c] == v) \
                if len(keys) else np.zeros(len(v), bool)
            return t.filter(pa.array(hit))

        return members_ds.map_batches(filt, batch_format="pyarrow",
                                      zero_copy_batch=True)

    from kmcp_ray.exchange import (dedup_pairs, expand_ident_pairs,
                                   expand_ident_pairs_broadcast)
    # class-pair extraction, two arms behind a measured row cap (the
    # same gate pattern as the broadcast/exchange switches):
    #
    # small arm — ONE projected pass over the materialized verifier
    # output pulls cand + phashc rows to the driver (ident/score
    # columns only, id strings never leave plasma) and dedups cand
    # pairs with one lexsort; replaces two executor runs + one dedup
    # exchange, which the r4 tail profile shows are ~2-3 s of pure
    # n-independent barrier latency.
    #
    # large arm (past the cap, or any iteration failure) — the
    # distributed dedup_pairs exchange below, unchanged.  materialize
    # there: class pairs are tiny, and fusing that groupby's Sort into
    # the downstream union DAG makes this Ray release's streaming
    # executor schedule the whole edge stage ~6x slower (measured
    # 102 s vs 16 s at 800k rows).
    extracted = _extract_class_pairs_driver(
        raw, cap=cfg.driver_class_pair_rows,
        member_cap=cfg.broadcast_verify_rows,
        max_bytes=cfg.driver_extract_bytes)
    _tick("extract_cls")
    # r5 driver fast path (r4 verdict #1 — collapse the barrier tail):
    # when the class pairs fit the driver arm, the SAME zero-copy pass
    # also pulled the pair-involved membership rows; the class→member
    # expansion then runs INSIDE the verify consumers (each worker
    # batch expands from the ray.put member table) — so the former two
    # membership-filter executor runs, the expansion materialize, and
    # the need-id scan (4 barriers) all disappear, and the pair stream
    # shipped to workers is class-pair-sized, not member-pair-sized.
    # Every step is gated on measured sizes; any gate miss falls back
    # to the distributed arms unchanged.
    pairs = None          # member-pair Dataset (lazy-expanding if fast)
    ph_edges = None       # phash edge  Dataset (lazy-expanding if fast)
    need = None           # vsk-needing id array  (sorted S) when fast
    n_pairs_known = None  # expansion volume, known without executing
    if extracted is not None:
        from kmcp_ray.exchange import (build_member_table,
                                       expand_pairs_with_table,
                                       expansion_volume)
        pairs_tbl, phc_tbl, mem_sk, mem_ph = extracted
        ia = pairs_tbl.column("ident_a").to_numpy(zero_copy_only=False)
        ib = pairs_tbl.column("ident_b").to_numpy(zero_copy_only=False)
        pha = phc_tbl.column("ident_a").to_numpy(zero_copy_only=False)
        phb = phc_tbl.column("ident_b").to_numpy(zero_copy_only=False)
        if mem_sk is not None:
            sk_table = build_member_table(*mem_sk)
            ph_table = build_member_table(*mem_ph)
            t_sk = expansion_volume(sk_table, ia, ib)
            t_ph = expansion_volume(ph_table, pha, phb)
            # 2*t_sk bound keeps the downstream verify-arm switch on
            # the broadcast arm — the fast path never changes arms
            if 2 * t_sk <= cfg.broadcast_verify_rows \
                    and t_ph <= cfg.broadcast_verify_rows:
                sk_ref = ray.put(sk_table)
                ph_ref = ray.put(ph_table)

                def _exp_sk(t: pa.Table) -> pa.Table:
                    tb = ray.get(sk_ref)
                    return expand_pairs_with_table(
                        tb,
                        t.column("ident_a").to_numpy(
                            zero_copy_only=False).astype(np.uint64),
                        t.column("ident_b").to_numpy(
                            zero_copy_only=False).astype(np.uint64))

                def _exp_ph(t: pa.Table) -> pa.Table:
                    tb = ray.get(ph_ref)
                    return expand_pairs_with_table(
                        tb,
                        t.column("ident_a").to_numpy(
                            zero_copy_only=False).astype(np.uint64),
                        t.column("ident_b").to_numpy(
                            zero_copy_only=False).astype(np.uint64),
                        score=t.column("score").to_numpy(
                            zero_copy_only=False),
                        via_value="phash").select(FINAL_COLS)

                pairs = _to_ds(pairs_tbl).map_batches(
                    _exp_sk, batch_format="pyarrow", zero_copy_batch=True)
                ph_edges = _to_ds(phc_tbl).map_batches(
                    _exp_ph, batch_format="pyarrow", zero_copy_batch=True)
                n_pairs_known = t_sk
                # vsk-needing ids == the pair-involved member ids (a
                # superset of the expanded pair ids: every member of a
                # paired, non-empty class expands into >=1 pair)
                need = np.unique(np.asarray(mem_sk[1], dtype="S")) \
                    if len(mem_sk[1]) else np.empty(0, dtype="S1")
                _tick("expand_plan")
        if pairs is None:
            # gates missed: hand the extracted tables to the
            # distributed arms below
            pairs_cls, phc = _to_ds(pairs_tbl), _to_ds(phc_tbl)
    else:
        cand = raw.map_batches(
            lambda t: t.filter(pc.equal(t["via"], "cand"))
                       .select(["ident_a", "ident_b"]),
            batch_format="pyarrow", zero_copy_batch=True)
        pairs_cls = dedup_pairs(
            cand.map_batches(lambda t: pa.table({"id_a": t["ident_a"],
                                                 "id_b": t["ident_b"]}),
                             batch_format="pyarrow", zero_copy_batch=True),
            cfg.num_partitions, typ=pa.uint64()) \
            .map_batches(lambda t: pa.table({"ident_a": t["id_a"],
                                             "ident_b": t["id_b"]}),
                         batch_format="pyarrow", zero_copy_batch=True) \
            .materialize()
        # dedup phashc class pairs globally (same truncation-collision
        # duplicate source as the driver arm); the score is recomputed
        # from the full 64-bit idents — bit-identical to the bucket's
        # own 1 - hamming/64
        from kmcp_ray import imagecodec as _ic

        def _phc_rescore(t: pa.Table) -> pa.Table:
            ia = t.column("id_a").to_numpy(zero_copy_only=False) \
                .astype(np.uint64)
            ib = t.column("id_b").to_numpy(zero_copy_only=False) \
                .astype(np.uint64)
            ham = np.asarray(_ic.hamming64(ia, ib), np.float64)
            return pa.table({
                "ident_a": pa.array(ia, pa.uint64()),
                "ident_b": pa.array(ib, pa.uint64()),
                "score": pa.array(1.0 - ham / 64.0, pa.float64())})

        phc = dedup_pairs(
            raw.map_batches(
                lambda t: t.filter(pc.equal(t["via"], "phashc"))
                           .select(["ident_a", "ident_b"])
                           .rename_columns(["id_a", "id_b"]),
                batch_format="pyarrow", zero_copy_batch=True),
            cfg.num_partitions, typ=pa.uint64()) \
            .map_batches(_phc_rescore, batch_format="pyarrow",
                         zero_copy_batch=True).materialize()

    def _expand(pairs_mat, members_via, **kw):
        """Class pairs → member pairs, broadcast arm when the filtered
        membership fits the verify gate, exchange arm at scale.  Both
        arms gate on MEASURED row counts (class-pair count first —
        cheap metadata — then the filtered membership)."""
        n_cls = pairs_mat.count()        # materialized: metadata only
        if 2 * n_cls > cfg.broadcast_verify_rows:
            return expand_ident_pairs(
                pairs_mat, _members(members_via), cfg.num_partitions, **kw)
        fmem = _filter_members(_members(members_via), pairs_mat) \
            .materialize()               # small by the gate above
        if fmem.count() > cfg.broadcast_verify_rows:
            return expand_ident_pairs(pairs_mat, fmem,
                                      cfg.num_partitions, **kw)
        return expand_ident_pairs_broadcast(pairs_mat, fmem, **kw)

    # class pairs → member-level id pairs (exactly the pairs the
    # id-level shuffle used to emit: class members share their whole
    # key vector, so every member pair did co-occur in the buckets).
    # ``pairs``/``ph_edges`` may already exist from the driver fast
    # path above — then these distributed arms are skipped entirely.
    if pairs is None:
        pairs = _expand(pairs_cls, "member_sk").materialize()
        _tick("expand_pairs")

    # verified-in-bucket pHash class pairs → member-level phash edges
    if ph_edges is None:
        ph_edges = _expand(phc, "member_ph", with_score=True,
                           via_value="phash") \
            .map_batches(lambda t: t.select(FINAL_COLS),
                         batch_format="pyarrow", zero_copy_batch=True)
        _tick("expand_phc")

    # Two verification modes, mirroring kmcp's load-whole vs mmap index
    # modes (reference: kmcp/cmd/search.go:66-83).  The switch keys on
    # the DEDUPLICATED pair count — the quantity that actually bounds
    # the broadcast table — not on corpus rows: a trillion-row corpus
    # with few duplicate candidates still takes the cheap broadcast arm.
    # fast path: the volume is known from the expansion arithmetic —
    # counting the lazy dataset would force the expansion to run twice
    n_pairs = n_pairs_known if n_pairs_known is not None \
        else pairs.count()           # materialized: metadata, no pass
    if 2 * n_pairs <= cfg.broadcast_verify_rows:
        from kmcp_ray.broadcast import collect_blob_table, probe_blob_table

        # semi-join: only ids that occur in >=1 candidate pair need a
        # verification sketch on the driver (<= 2*n_pairs rows, vs the
        # whole corpus before) — computed inline by the driver fast
        # path, or by this distributed scan on the fallback arms
        if need is None:
            import pyarrow.compute as pc
            id_chunks = [np.empty(0, dtype=object)]
            for b in pairs.iter_batches(batch_size=1 << 18,
                                        batch_format="pyarrow"):
                id_chunks.append(pc.unique(b.column("id_a"))
                                 .to_numpy(zero_copy_only=False))
                id_chunks.append(pc.unique(b.column("id_b"))
                                 .to_numpy(zero_copy_only=False))
            need = np.unique(np.concatenate(id_chunks).astype("S"))
        _tick("need_ids")

        if vsk_provider is not None:
            sig_needed = vsk_provider(need)
        else:
            need_ref = ray.put(need)     # sorted fixed-width key array

            def filter_needed(batch: pa.Table) -> pa.Table:
                hit = sketch_mod._membership(
                    ray.get(need_ref),
                    batch.column("image_id").to_numpy(zero_copy_only=False))
                return batch.filter(pa.array(hit))

            sig_needed = sig_ds.select_columns(["image_id", "vsk"]) \
                .map_batches(filter_needed, batch_format="pyarrow",
                             zero_copy_batch=True)
        table = collect_blob_table(sig_needed, "image_id", "vsk")
        ref = ray.put(table)       # three numpy arrays: near-zero-copy gets
        _tick("collect_vsk")

        def attach_local(batch: pa.Table) -> pa.Table:
            tbl = ray.get(ref)
            a = batch.column("id_a").to_numpy(zero_copy_only=False)
            b = batch.column("id_b").to_numpy(zero_copy_only=False)
            va = [bytes(x) if x is not None else None
                  for x in probe_blob_table(tbl, a)]
            vb = [bytes(x) if x is not None else None
                  for x in probe_blob_table(tbl, b)]
            return pa.table({
                "id_a": pa.array(a, pa.string()),
                "id_b": pa.array(b, pa.string()),
                "vsk_a": pa.array(va, pa.binary()),
                "vsk_b": pa.array(vb, pa.binary())})

        attached = pairs.map_batches(attach_local, batch_format="pyarrow",
                                     batch_size=8192, zero_copy_batch=True)
    else:
        sig_small = vsk_provider(None) if vsk_provider is not None \
            else sig_ds.select_columns(["image_id", "vsk"])
        attached = buckets_mod.attach_sketches(pairs, sig_small, cfg)
    pair_verifier = buckets_mod.make_pair_verifier(cfg)
    # modest batch_size: the verifier's flat temporaries stay a few MB
    # and reuse warm heap pages (this sandbox's first-touch faults make
    # one-giant-batch verification pathologically slow; see perf.py)
    verified_pairs = attached.map_batches(pair_verifier, batch_format="pyarrow",
                                          batch_size=8192,
                                          zero_copy_batch=True)
    _tick("plan_verify")
    return verified.union(verified_pairs).union(ph_edges)


def make_assign_fn(table_ref, id_col: str = "image_id"):
    """Broadcast cluster-map lookup: numpy searchsorted table
    (ray.put once, near-zero-copy get per task); unmapped rows are their
    own singleton cluster."""
    from kmcp_ray.broadcast import probe_str_table

    def assign(batch: pa.Table) -> pa.Table:
        tbl = ray.get(table_ref)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        mapped = probe_str_table(tbl, ids, default_self=True)
        return pa.table({id_col: pa.array(ids, pa.string()),
                         "cluster_id": pa.array(mapped, pa.string())})

    return assign


def assign_stage(ids_ds, cluster_map, id_col: str = "image_id"):
    """``cluster_map``: dict or (nodes, roots) array pair."""
    from kmcp_ray.broadcast import build_map_table
    table = build_map_table(cluster_map)
    ref = ray.put(table)
    return ids_ds.map_batches(make_assign_fn(ref, id_col),
                              batch_format="pyarrow", batch_size=65536,
                              zero_copy_batch=True)


def assign_via_join(ids_ds, labels_ds, cfg: DedupConfig,
                    id_col: str = "image_id"):
    """Dup-heavy-corpus emission: attach cluster ids by a partitioned
    hash join against the distributed (node, label) table — nothing
    driver-resident; unmatched rows are their own singleton cluster."""
    from kmcp_ray.exchange import join_lookup
    out = join_lookup(ids_ds, id_col, labels_ds, "node", "label",
                      cfg.num_partitions, out_col="cluster_id",
                      default_self=True)
    return out


def cc_and_assign(edges_ds, ids_ds, cfg: DedupConfig,
                  id_col: str = "image_id"):
    """Connected components + emission over an edge dataset (stage 3,
    shared by the full pipeline and incremental epochs): reduce edge
    blocks to spanning forests (distributed, map-only), switch on the
    forest size between driver union-find + broadcast map and
    distributed label propagation + partitioned join."""
    _timers = os.environ.get("KMCP_STAGE_TIMERS") == "1"
    import time as _time
    _t0 = [_time.time()]

    def _tick(name):
        if _timers:
            import sys as _sys
            print(f"[cc {name}] {_time.time() - _t0[0]:.2f}s",
                  file=_sys.stderr)
        _t0[0] = _time.time()

    forest = edges_ds.select_columns(["id_a", "id_b"]) \
        .map_batches(cc_mod.spanning_forest_batch, batch_format="pyarrow",
                     batch_size=1 << 20).materialize()
    _tick("forest_mat")
    n_forest = forest.count()
    if n_forest <= cfg.broadcast_assign_edges:
        cluster_map = cc_mod.connected_components_arrays(forest,
                                                         reduce_rounds=0)
        _tick("driver_uf")
        assignments = assign_stage(ids_ds, cluster_map, id_col=id_col)
        _tick("emit_plan")
    else:
        cluster_map = (np.empty(0, object), np.empty(0, object))
        labels = cc_mod.labels_via_exchange(forest, cfg.num_partitions)
        assignments = assign_via_join(ids_ds, labels, cfg, id_col=id_col)
        _tick("labels_join_plan")
    return assignments, cluster_map


def cluster_stats(assignments):
    """Per-cluster aggregates — the kmcp `profile` analogue (small)."""
    from ray.data.aggregate import Count
    return assignments.groupby("cluster_id").aggregate(Count(alias_name="size"))


# ------------------------------------------------------------------ pipeline

def dedup_pipeline(ds, cfg: DedupConfig = DedupConfig(), *,
                   id_col: str = "image_id", text_col: str = "caption",
                   phash_col: Optional[str] = "phash",
                   bytes_col: Optional[str] = "bytes",
                   enable=ALL_GENERATORS,
                   workdir: Optional[str] = None,
                   sketch_batch_size: "int | None" = None,
                   size_sort: bool = False,
                   materialize_edges: bool = True) -> PipelineResult:
    """Run (or resume) the full near-dup pipeline on an input Dataset.

    ``size_sort``: globally sort signatures by sketch size before
    banding (kmcp sorts file groups by k-mer count before block
    packing, reference: kmcp/cmd/index.go:657-667) so each packed
    shuffle batch carries similar-sized rows — cheap skew control for
    corpora with extreme document-length variance.

    ``materialize_edges=False`` (in-memory runs only): skip pinning the
    verified edge table and stream it straight into the spanning-forest
    reduction — one fewer barrier + materialization when the caller
    consumes only ``assignments`` (the bench headline shape).  The
    returned ``edges`` Dataset is then LAZY: reading it re-runs the
    final verify map (the broadcast vsk table is already collected, so
    the re-run is pair-sized, not corpus-sized).
    """
    if workdir:
        _check_config(workdir, cfg)

    # --- stage 1: signatures ---
    # Checkpointed runs persist the vsk verification blob with the
    # signatures (a resume must verify without the raw input);
    # in-memory runs keep the one full-corpus materialized table slim
    # (no vsk, -36% bytes) and re-derive vsk lazily for candidate ids
    # only via a filtered re-sketch of the raw input (``make_vsk_fn``).
    vsk_provider = None
    if workdir and _done(workdir, "01_signatures"):
        sig_ds = ray.data.read_parquet(_stage_dir(workdir, "01_signatures"))
    else:
        sig_ds = sketch_stage(ds, cfg, id_col=id_col, text_col=text_col,
                              phash_col=phash_col, bytes_col=bytes_col,
                              batch_size=sketch_batch_size,
                              with_vsk=bool(workdir))
        if workdir:
            sig_ds = _checkpoint(sig_ds, workdir, "01_signatures")
        else:
            # in-memory runs STREAM the signature table straight into
            # the band stage (read→sketch→band fuse into one operator):
            # ids for emission come from a column-pruned re-read of the
            # raw input and vsk from the lazy provider below, so nothing
            # consumes sig twice — dropping the r2 materialize barrier
            # removes ~1.4 GB of object-store traffic at 3.2M rows
            # (every plasma byte costs ~8 ms/MB of machine-serialized
            # first-touch faults on this host; see BASELINE.md)
            def vsk_provider(need):
                fn = sketch_mod.make_vsk_fn(
                    cfg, id_col=id_col, text_col=text_col,
                    need_ref=ray.put(need) if need is not None else None)
                return ds.select_columns([id_col, text_col]) \
                    .map_batches(fn, batch_format="pyarrow",
                                 zero_copy_batch=True)

    if size_sort:
        sig_ds = sig_ds.sort("n_tokens", descending=True)

    # --- stage 2: edges (band fan-out + partition shuffle + verify) ---
    if workdir and _done(workdir, "02_edges"):
        edges_ds = ray.data.read_parquet(_stage_dir(workdir, "02_edges"))
    else:
        gens = tuple(g for g in enable
                     if not (g == "phash" and phash_col is None))
        edges_ds = edges_stage(sig_ds, cfg, enable=gens,
                               vsk_provider=vsk_provider)
        if workdir:
            edges_ds = _checkpoint(edges_ds, workdir, "02_edges")
        elif materialize_edges:
            # consumed at least twice (edge count for the mode switch +
            # connected components + caller analytics): pin the small
            # edge table instead of re-running verification per consumer
            edges_ds = edges_ds.materialize()

    # --- stage 3: connected components + emission ---
    # mode switch (kmcp load-whole vs mmap analogue): the raw candidate
    # edge count is inflated by band duplication, so first reduce each
    # edge block to its spanning forest (distributed, map-only; forest
    # edges == non-root duplicate nodes) and switch on THAT — the
    # metric that actually bounds driver memory.  Small forests finish
    # union-find on the driver + broadcast the map; large ones run
    # distributed label propagation + a partitioned join.
    # emission ids: a column-pruned re-read of the INPUT (only the id
    # column leaves storage), not a second pass over sig_ds — keeping
    # sig_ds single-consumer is what lets it stream (see stage 1)
    ids_ds = ds.select_columns([id_col]) if not workdir \
        else sig_ds.select_columns([id_col])
    assignments, cluster_map = cc_and_assign(edges_ds, ids_ds, cfg,
                                             id_col=id_col)
    if workdir and not _done(workdir, "03_clusters"):
        assignments = _checkpoint(assignments, workdir, "03_clusters")
    elif workdir:
        assignments = ray.data.read_parquet(_stage_dir(workdir, "03_clusters"))

    return PipelineResult(assignments=assignments, edges=edges_ds,
                          signatures=sig_ds, cluster_map=cluster_map)
