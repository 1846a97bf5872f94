"""CLI surface (python -m kmcp_ray ...) — each subcommand end-to-end
on tiny inputs, reusing the session Ray (main() only shuts down a Ray
session it started)."""

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from kmcp_ray import testgen
from kmcp_ray.__main__ import main
from kmcp_ray.config import DedupConfig

CFG = DedupConfig(num_partitions=8)


@pytest.fixture()
def corpus_pq(tmp_path):
    table, _, _ = testgen.make_pairs_corpus(n=120, seed=5, cfg=CFG)
    path = str(tmp_path / "pairs.parquet")
    pq.write_table(table, path)
    return path


def _run(capsys, argv):
    main(argv)
    return json.loads(capsys.readouterr().out.strip().splitlines()[-1])


def test_cli_compute(ray_session, corpus_pq, tmp_path, capsys):
    out = str(tmp_path / "sig")
    res = _run(capsys, ["compute", "--input", corpus_pq, "--output", out,
                        "--config", json.dumps({"num_partitions": 8})])
    assert res["signatures"] == 120
    cols = set(pq.read_schema(os.path.join(out, os.listdir(out)[0])).names)
    assert {"image_id", "bkeys", "ckeys", "vsk"} <= cols


def test_cli_dedup_and_profile(ray_session, corpus_pq, tmp_path, capsys):
    out = str(tmp_path / "assign")
    res = _run(capsys, ["dedup", "--input", corpus_pq, "--output", out,
                        "--config", json.dumps({"num_partitions": 8})])
    assert res["assignments"] == 120
    prof = str(tmp_path / "prof")
    res2 = _run(capsys, ["profile", "--input", corpus_pq,
                         "--assignments", out, "--output", prof])
    assert 0 < res2["clusters"] <= 120


def test_cli_search_and_merge(ray_session, tmp_path, capsys):
    docs = pa.table({
        "doc_id": pa.array(["q1", "r1", "r2"], pa.string()),
        "text": pa.array(["alpha beta gamma delta epsilon zeta eta theta",
                          "alpha beta gamma delta epsilon zeta eta theta iota",
                          "totally unrelated caption text here now ok fine"],
                         pa.string())})
    dpath = str(tmp_path / "docs.parquet")
    pq.write_table(docs, dpath)
    sout = str(tmp_path / "matches")
    res = _run(capsys, ["search", "--queries", dpath, "--refs", dpath,
                        "--output", sout, "--min-qcov", "0.8"])
    assert res["matches"] >= 3       # self-matches + q1~r1 both directions

    mout = str(tmp_path / "merged")
    res2 = _run(capsys, ["merge", "--inputs", sout, sout, "--output", mout,
                         "--mode", "intersect"])
    assert res2["matches"] >= 3      # intersect of identical shards == shard


def test_cli_merge_regions(ray_session, tmp_path, capsys):
    tbl = pa.table({"chrom": pa.array(["c1", "c1", "c2"], pa.string()),
                    "start": pa.array([0, 5, 100], pa.int64()),
                    "end": pa.array([10, 20, 110], pa.int64())})
    ipath = str(tmp_path / "iv.parquet")
    pq.write_table(tbl, ipath)
    bed = str(tmp_path / "out.bed")
    res = _run(capsys, ["merge-regions", "--input", ipath, "--output", bed])
    assert res["regions"] == 2
    lines = [ln.split("\t") for ln in open(bed).read().splitlines()]
    assert lines[0][:3] == ["c1", "0", "20"]
    assert lines[1][:3] == ["c2", "100", "110"]


def test_search_tsv_golden(ray_session, tmp_path):
    """15-column kmcp TSV layout + trailer stats lines (S7 parity,
    reference kmcp/cmd/search.go:84-104, 1023-1025)."""
    import ray.data
    import pyarrow as pa
    import pyarrow.parquet as pq
    from kmcp_ray import search as search_mod
    from kmcp_ray.config import DedupConfig

    refs = pa.table({
        "doc_id": pa.array(["r0", "r1"], pa.string()),
        "text": pa.array([
            "alpha beta gamma delta epsilon zeta eta theta iota kappa",
            "one two three four five six seven eight nine ten"],
            pa.string())})
    queries = pa.table({
        "doc_id": pa.array(["q0", "q1"], pa.string()),
        "text": pa.array([
            "alpha beta gamma delta epsilon zeta eta theta",
            "nothing matches here at all whatsoever"], pa.string())})
    out = search_mod.search(ray.data.from_arrow(queries),
                            ray.data.from_arrow(refs), DedupConfig(),
                            min_qcov=0.5, min_shared=1, max_fpr=1.0)
    path = str(tmp_path / "out.tsv")
    stats = search_mod.to_kmcp_tsv(out, path, DedupConfig(),
                                   total_queries=2)
    lines = open(path).read().splitlines()
    header = lines[0].split("\t")
    assert header == ["query", "qLen", "qKmers", "FPR", "hits", "target",
                      "chunkIdx", "chunks", "tLen", "kSize", "mKmers",
                      "qCov", "tCov", "jacc", "queryIdx"]
    data = [ln for ln in lines[1:] if not ln.startswith("#")]
    trailer = [ln for ln in lines if ln.startswith("#")]
    assert len(data) == stats["rows"] == 1
    row = dict(zip(header, data[0].split("\t")))
    assert row["query"] == "q0" and row["target"] == "r0"
    assert row["qLen"] == "8" and row["tLen"] == "10"
    assert row["qKmers"] == "6" and row["mKmers"] == "6"
    assert row["qCov"] == "1.0000" and row["kSize"] == "3"
    assert row["chunkIdx"] == "0" and row["chunks"] == "1"
    assert trailer == ["# input queries: 2",
                      "# matched queries: 1",
                      "# matched percentage: 50.0000%"]


def test_ray_address_flag_attach_mode(ray_session, monkeypatch):
    """Non-local --ray-address ATTACHES (no num_cpus forced on the
    cluster) — the ray-job-submit driver mode (jobs/submit_dedup.sh)."""
    import ray
    from kmcp_ray import __main__ as cli
    calls = []
    monkeypatch.setattr(ray, "is_initialized", lambda: False)
    monkeypatch.setattr(ray, "init", lambda *a, **k: calls.append(k))
    ns = type("A", (), {"ray_address": "ray://head:10001", "num_cpus": 32})
    assert cli._init(ns) is True
    assert calls == [{"address": "ray://head:10001",
                      "logging_level": "ERROR"}]
    calls.clear()
    ns.ray_address = "local"
    cli._init(ns)
    assert calls[0]["num_cpus"] == 32 and calls[0]["address"] == "local"


def test_search_tsv_streams_large(ray_session, tmp_path):
    """The TSV writer streams: a multi-block ~120k-match table renders
    byte-identically to an independent in-memory pandas rendering —
    driver RSS is bounded by batch size, not by the match count
    (search.to_kmcp_tsv, r3 verdict #4)."""
    import numpy as np
    import pandas as pd
    import ray.data
    from kmcp_ray import search as search_mod

    rng = np.random.default_rng(11)
    n = 120_000
    qi = rng.integers(0, 4000, n)
    ti = rng.integers(0, 500, n)
    targets = np.array([f"r{t:04d}#{t % 4}/4" if t % 3 == 0
                        else f"r{t:04d}" for t in ti], object)
    m = rng.integers(1, 40, n).astype(np.int64)
    tbl = pa.table({
        "query": pa.array([f"q{q:05d}" for q in qi], pa.string()),
        "q_kept": pa.array(m + 2, pa.int64()),
        "target": pa.array(targets, pa.string()),
        "t_kept": pa.array(m + 5, pa.int64()),
        "m_shared": pa.array(m, pa.int64()),
        "qcov": pa.array(m / (m + 2.0), pa.float64()),
        "tcov": pa.array(m / (m + 5.0), pa.float64()),
        "jacc": pa.array(m / (m + 7.0), pa.float64()),
        "fpr": pa.array(rng.random(n) * 1e-3, pa.float64()),
        "q_ntok": pa.array(m + 3, pa.int64()),
        "t_ntok": pa.array(m + 6, pa.int64())})
    ds = ray.data.from_arrow(tbl).repartition(8)
    path = str(tmp_path / "big.tsv")
    stats = search_mod.to_kmcp_tsv(ds, path, CFG, total_queries=4000,
                                   num_partitions=8)
    assert stats["rows"] == n

    # independent rendering: plain pandas over the same table
    df = tbl.to_pandas()
    hits = df.groupby("query")["target"].transform("size")
    t = df["target"].astype(str)
    tdoc = t.str.replace(r"#.*$", "", regex=True)
    has_chunk = t.str.contains("#")
    cidx = np.where(has_chunk, t.str.replace(r"^.*#|/.*$", "", regex=True),
                    "0").astype(np.int64)
    nch = np.where(has_chunk, t.str.replace(r"^.*/", "", regex=True),
                   "1").astype(np.int64)
    order = {v: i for i, v in enumerate(sorted(set(df["query"])))}
    out = pd.DataFrame({
        "query": df["query"], "qLen": df["q_ntok"],
        "qKmers": df["q_kept"], "FPR": df["fpr"], "hits": hits,
        "target": tdoc, "chunkIdx": cidx, "chunks": nch,
        "tLen": df["t_ntok"], "kSize": CFG.shingle_k,
        "mKmers": df["m_shared"], "qCov": df["qcov"],
        "tCov": df["tcov"], "jacc": df["jacc"],
        "queryIdx": df["query"].map(order).astype(np.int64)})
    out = out.sort_values(["queryIdx", "target", "chunkIdx"],
                          kind="stable")
    import io
    buf = io.StringIO()
    buf.write("\t".join(out.columns) + "\n")
    out.to_csv(buf, sep="\t", header=False, index=False,
               float_format="%.4f")
    buf.write(f"# input queries: 4000\n")
    buf.write(f"# matched queries: {out['query'].nunique()}\n")
    pct = 100.0 * out["query"].nunique() / 4000
    buf.write(f"# matched percentage: {pct:.4f}%\n")
    # (queryIdx, target, chunkIdx) is not a total key over this corpus
    # (payload columns differ under ties), so byte-identity would pin
    # the two sorts' tie order — fragile across Ray versions.  Compare
    # the row multiset + header/trailer, and separately assert the
    # ordering contract (sort keys non-decreasing) on the engine file.
    got_lines = open(path).read().splitlines()
    exp_lines = buf.getvalue().splitlines()
    assert got_lines[0] == exp_lines[0]
    assert got_lines[-3:] == exp_lines[-3:]
    assert sorted(got_lines[1:-3]) == sorted(exp_lines[1:-3])
    keys = [(int(f[14]), f[5], int(f[6]))
            for f in (ln.split("\t") for ln in got_lines[1:-3])]
    assert keys == sorted(keys)


def test_search_tsv_non_ascii_query_ids(ray_session, tmp_path):
    """Unicode query ids stream through to_kmcp_tsv (UTF-8 bytes, no
    implicit ASCII encode) and queryIdx still ranks by code point."""
    import ray.data
    from kmcp_ray import search as search_mod

    qids = ["qé-accént", "q☃snow", "ascii-q"]
    n = len(qids)
    tbl = pa.table({
        "query": pa.array(qids, pa.string()),
        "q_kept": pa.array([5] * n, pa.int64()),
        "target": pa.array(["r1", "r2", "r3"], pa.string()),
        "t_kept": pa.array([7] * n, pa.int64()),
        "m_shared": pa.array([3] * n, pa.int64()),
        "qcov": pa.array([0.5] * n, pa.float64()),
        "tcov": pa.array([0.4] * n, pa.float64()),
        "jacc": pa.array([0.3] * n, pa.float64()),
        "fpr": pa.array([1e-4] * n, pa.float64()),
        "q_ntok": pa.array([6] * n, pa.int64()),
        "t_ntok": pa.array([8] * n, pa.int64())})
    path = str(tmp_path / "uni.tsv")
    stats = search_mod.to_kmcp_tsv(ray.data.from_arrow(tbl), path, CFG,
                                   total_queries=3, num_partitions=4)
    assert stats["rows"] == 3 and stats["matched"] == 3
    lines = open(path, encoding="utf-8").read().splitlines()
    rank = {ln.split("\t")[0]: int(ln.split("\t")[14])
            for ln in lines[1:-3]}
    expect = {q: i for i, q in enumerate(sorted(qids))}
    assert rank == expect
