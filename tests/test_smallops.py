"""Small operator-surface tests: regex hooks (M8/M9), concat-with-
spacers (M7), duplicate-name/input validation (D4/D5), dir walk +
regex filter (S2), Lance-fallback I/O, report writers (S10), size-sort
option (O5)."""

import os

import numpy as np
import pyarrow as pa
import pytest

from kmcp_ray import ioops, text, textops


def _docs(texts):
    return pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                     "text": pa.array(texts, pa.string())})


def test_filter_blacklist(ray_session):
    import ray.data
    ds = ray.data.from_arrow(_docs(["keep me", "a PLASMID sequence",
                                    "also keep", None]))
    out = textops.filter_blacklist(ds, "text", r"plasmid").to_pandas()
    assert sorted(out.doc_id.tolist()) == [0, 2, 3]


def test_extract_name(ray_session):
    import ray.data
    tbl = pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                    "path": pa.array(["refs/GCF_000123.fa",
                                      "nomatch.txt"], pa.string())})
    out = textops.extract_name(ray.data.from_arrow(tbl), "path",
                               r"(GCF_\d+)").to_pandas().sort_values("doc_id")
    assert out.ref_name.tolist() == ["GCF_000123", "nomatch.txt"]


def test_concat_sketch_is_union_not_naive(ray_session):
    """Sketch of concatenated parts == union of part sketches (no
    shingle spans a junction) and != the naive joined-text sketch."""
    import ray.data
    p1, p2 = "aa bb cc dd ee", "ff gg hh ii jj"
    tbl = pa.table({"doc_id": pa.array([0], pa.int64()),
                    "parts": pa.array([[p1, p2]],
                                      pa.list_(pa.string()))})
    out = textops.concat_sketch(ray.data.from_arrow(tbl), id_col="doc_id",
                                parts_col="parts", k=3).to_pandas()
    got = np.sort(np.array(out.sketch.iloc[0], dtype=np.uint64))
    M = int((1 << 64) - 1)
    want = np.union1d(text.shingle_sets(pa.array([p1]), 3, M)["hashes"],
                      text.shingle_sets(pa.array([p2]), 3, M)["hashes"])
    assert np.array_equal(got, want)
    naive = text.shingle_sets(pa.array([p1 + " " + p2]), 3, M)["hashes"]
    assert not np.array_equal(got, np.sort(naive))
    assert out.text.iloc[0] == p1 + " " + p2


def test_duplicate_names(ray_session):
    import ray.data
    tbl = pa.table({"name": pa.array(["a", "b", "a", "c", "b", "a"],
                                     pa.string())})
    out = ioops.duplicate_names(ray.data.from_arrow(tbl),
                                "name").to_pandas()
    assert dict(zip(out.name, out.n)) == {"a": 3, "b": 2}


def test_check_duplicate_inputs(tmp_path):
    p1 = tmp_path / "a.parquet"
    p1.write_text("x")
    ioops.check_duplicate_inputs([str(p1), str(tmp_path / "b")])
    with pytest.raises(ValueError, match="duplicated"):
        ioops.check_duplicate_inputs([str(p1), str(p1)])


def test_list_files_regex(tmp_path):
    (tmp_path / "sub").mkdir()
    for name in ["x1.parquet", "x2.parquet", "skip.txt"]:
        (tmp_path / name).write_text("")
    (tmp_path / "sub" / "x3.parquet").write_text("")
    got = ioops.list_files(str(tmp_path), r"\.parquet$")
    assert sorted(os.path.basename(p) for p in got) == \
        ["x1.parquet", "x2.parquet", "x3.parquet"]
    assert got == sorted(got)
    assert ioops.list_files(str(tmp_path), r"x1") == \
        [str(tmp_path / "x1.parquet")]


def test_io_fallback_roundtrip(ray_session, tmp_path):
    """write_table/read_table: Lance when available, Parquet fallback
    otherwise — either way a lossless round-trip."""
    import ray.data
    tbl = pa.table({"a": pa.array([1, 2, 3], pa.int64()),
                    "b": pa.array(["x", "y", "z"], pa.string())})
    out = str(tmp_path / "t")
    fmt = ioops.write_table(ray.data.from_arrow(tbl), out)
    assert fmt == ioops.io_format()
    back = ioops.read_table(out).to_pandas().sort_values("a")
    assert back.a.tolist() == [1, 2, 3]
    assert back.b.tolist() == ["x", "y", "z"]


def test_report_writers():
    import pandas as pd
    from kmcp_ray import diagnostics
    ab = pd.DataFrame({"cluster_id": ["c1", "c2"],
                       "size": [3, 1], "fraction": [0.75, 0.25]})
    m3 = diagnostics.report_metaphlan(ab, version=3)
    assert m3.startswith("#clade_name\tclade_taxid\trelative_abundance")
    assert "c1\t-\t75.000000" in m3
    m2 = diagnostics.report_metaphlan(ab, version=2)
    assert "c1\t75.000000" in m2
    hdr = diagnostics.cami_binning_header("s1")
    assert hdr.startswith("@SampleID:s1")


def test_cami_binning_lines(ray_session):
    import ray.data
    from kmcp_ray import diagnostics
    a = ray.data.from_items([{"image_id": "i1", "cluster_id": "c1"},
                             {"image_id": "i2", "cluster_id": "c1"}])
    lines = sorted(diagnostics.cami_binning_lines(a).to_pandas().line)
    assert lines == ["i1\tc1", "i2\tc1"]


def test_size_sort_pipeline_unchanged(ray_session):
    """O5 size-sort is a physical-layout knob: identical assignments."""
    import ray.data
    from kmcp_ray import testgen
    from kmcp_ray.config import DedupConfig
    from kmcp_ray.pipeline import dedup_pipeline
    cfg = DedupConfig(num_partitions=8)
    table, _p, _n = testgen.make_pairs_corpus(n=300, seed=3, cfg=cfg)
    base = dedup_pipeline(ray.data.from_arrow(table), cfg).assignments \
        .to_pandas()
    sorted_run = dedup_pipeline(ray.data.from_arrow(table), cfg,
                                size_sort=True).assignments.to_pandas()
    assert dict(zip(base.image_id, base.cluster_id)) == \
        dict(zip(sorted_run.image_id, sorted_run.cluster_id))


def test_merge_regions_vs_python_sweep(ray_session):
    import ray.data
    from kmcp_ray.regions import merge_regions, to_bed6
    rng = np.random.default_rng(11)
    chrom = np.array([f"c{i}" for i in rng.integers(0, 5, 300)], dtype=object)
    start = rng.integers(0, 1000, 300).astype(np.int64)
    end = start + rng.integers(1, 80, 300)
    tbl = pa.table({"chrom": pa.array(chrom, pa.string()),
                    "start": pa.array(start, pa.int64()),
                    "end": pa.array(end, pa.int64())})
    got = merge_regions(ray.data.from_arrow(tbl), num_partitions=4) \
        .to_pandas().sort_values(["chrom", "start"]).reset_index(drop=True)

    # reference sweep
    rows = sorted(zip(chrom, start, end), key=lambda r: (r[0], r[1], r[2]))
    want = []
    for c, s, e in rows:
        if want and want[-1][0] == c and s <= want[-1][2]:
            want[-1][2] = max(want[-1][2], e)
            want[-1][3] += 1
        else:
            want.append([c, s, e, 1])
    assert got[["chrom", "start", "end", "n_merged"]].values.tolist() == \
        [[c, s, e, n] for c, s, e, n in want]
    bed = to_bed6(merge_regions(ray.data.from_arrow(tbl),
                                num_partitions=4)).to_pandas()
    assert list(bed.columns) == ["chrom", "start", "end", "name",
                                 "score", "strand"]
    assert (bed.strand == ".").all()


def test_assign_best_target(ray_session):
    import ray.data
    from kmcp_ray import search as search_mod
    from kmcp_ray.config import DedupConfig
    cfg = DedupConfig(num_partitions=8)
    refs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(["r1", "r2"], pa.string()),
        "text": pa.array(["alpha beta gamma delta epsilon zeta eta theta",
                          "one two three four five six seven eight"],
                         pa.string())}))
    queries = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(["q1", "q2"], pa.string()),
        "text": pa.array(["alpha beta gamma delta epsilon",
                          "five six seven eight one two"], pa.string())}))
    out = search_mod.assign_best_target(
        queries, refs, cfg, min_qcov=0.1, min_shared=1,
        max_fpr=1.0).to_pandas()
    got = dict(zip(out["query"], out["target"]))
    assert got == {"q1": "r1", "q2": "r2"}
    assert len(out) == 2                      # exactly one row per query


def test_expand_ident_pairs_arms_agree(ray_session):
    """Broadcast and exchange arms of the class→member expansion emit
    the SAME member-pair set (the gate in pipeline._expand switches on
    size only, never semantics)."""
    import ray.data
    from kmcp_ray.exchange import (expand_ident_pairs,
                                   expand_ident_pairs_broadcast)

    rng = np.random.default_rng(7)
    idents = np.arange(1, 9, dtype=np.uint64)
    # classes of size 1..4, string ids with mixed lexicographic order
    mem_rows = [(int(i), f"id{int(i)}_{j:02d}")
                for i in idents for j in range(int(i) % 4 + 1)]
    members = ray.data.from_arrow(pa.table({
        "ident": pa.array([r[0] for r in mem_rows], pa.uint64()),
        "id": pa.array([r[1] for r in mem_rows], pa.string())}))
    pair_idx = [(1, 2), (3, 4), (5, 8), (2, 7)]
    pairs = ray.data.from_arrow(pa.table({
        "ident_a": pa.array([a for a, _ in pair_idx], pa.uint64()),
        "ident_b": pa.array([b for _, b in pair_idx], pa.uint64()),
        "score": pa.array(rng.uniform(size=len(pair_idx)), pa.float64()),
    })).materialize()

    def norm(ds):
        df = ds.to_pandas().sort_values(
            ["id_a", "id_b"]).reset_index(drop=True)
        return list(map(tuple, df[["id_a", "id_b", "via"]].values)), \
            np.asarray(df["score"])

    bc_rows, bc_sc = norm(expand_ident_pairs_broadcast(
        pairs, members.materialize(), with_score=True, via_value="phash"))
    ex_rows, ex_sc = norm(expand_ident_pairs(
        pairs, members, 8, with_score=True, via_value="phash"))
    assert bc_rows == ex_rows and len(bc_rows) > 0
    np.testing.assert_allclose(bc_sc, ex_sc)
    # expansion size: sum over pairs of |A| x |B|
    sizes = {int(i): int(i) % 4 + 1 for i in idents}
    assert len(bc_rows) == sum(sizes[a] * sizes[b] for a, b in pair_idx)


def test_group_quantiles_matches_numpy(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data
    from kmcp_ray import relops
    rng = np.random.RandomState(7)
    g = rng.choice(["a", "b", "c"], size=300)
    v = rng.randint(0, 50, size=300)
    ds = ray.data.from_arrow(pa.table({"g": pa.array(g), "v": pa.array(v)}))
    out = relops.group_quantiles(ds, "g", "v").to_pandas() \
        .set_index(["g", "q_pct"])["value"]
    for grp in "abc":
        s = np.sort(v[g == grp])
        for q in (25, 50, 90, 99):
            assert out[(grp, q)] == s[(len(s) - 1) * q // 100], (grp, q)


def test_order_revenue_topk_vs_duckdb(ray_session):
    import duckdb
    import ray.data
    from kmcp_ray import relops
    sf = "/root/testdata/sf0.001"
    got = relops.order_revenue_topk(
        ray.data.read_parquet(f"{sf}/customer.parquet"),
        ray.data.read_parquet(f"{sf}/orders.parquet"),
        ray.data.read_parquet(f"{sf}/lineitem.parquet"),
        segment="MACHINERY", cutoff="1997-01-01", k=5,
        num_partitions=8).to_pandas()
    want = duckdb.sql(f"""
        WITH li AS (
            SELECT l_orderkey, CAST(sum(
                CAST(round(l_extendedprice*100) AS BIGINT)
                * (100 - CAST(round(l_discount*100) AS BIGINT)))
                AS BIGINT) AS rev_c4
            FROM '{sf}/lineitem.parquet'
            WHERE l_shipdate > TIMESTAMP '1997-01-01' GROUP BY 1)
        SELECT li.l_orderkey, li.rev_c4,
               epoch_us(o.o_orderdate) AS o_orderdate_us
        FROM li JOIN '{sf}/orders.parquet' o ON o.o_orderkey = li.l_orderkey
        JOIN '{sf}/customer.parquet' c ON c.c_custkey = o.o_custkey
        WHERE o.o_orderdate < TIMESTAMP '1997-01-01'
          AND c.c_mktsegment = 'MACHINERY'
        ORDER BY li.rev_c4 DESC, li.l_orderkey LIMIT 5
    """).df()
    assert got["l_orderkey"].tolist() == want["l_orderkey"].tolist()
    assert got["rev_c4"].tolist() == want["rev_c4"].tolist()
    assert got["o_orderdate_us"].tolist() == want["o_orderdate_us"].tolist()


def test_label_centroids_match_numpy(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data
    from kmcp_ray import ann
    rng = np.random.RandomState(5)
    n, dim = 300, 8
    lab = rng.randint(0, 4, n)
    m = rng.uniform(-1, 1, (n, dim)).astype(np.float32)
    t = pa.table({"vec_id": pa.array(np.arange(n), pa.int64()),
                  "label": pa.array(lab, pa.int32()),
                  "embedding": pa.array(list(m.astype(np.float32)),
                                        pa.list_(pa.float32()))})
    labels, cents = ann.label_centroids(ray.data.from_arrow(t))
    assert labels.tolist() == [0, 1, 2, 3]
    for i, lb in enumerate(labels):
        want = m[lab == lb].astype(np.float64).mean(axis=0)
        assert np.allclose(cents[i], want, atol=1e-12)


def test_fuzzy_decontaminate_drops_neardups_keeps_overlap(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data
    from kmcp_ray import curate
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    corpus = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([
            base + " extra",            # near-dup of eval doc
            "totally different words here about other things entirely x",
            # shares one 3-shingle with eval but jaccard << 0.5:
            "alpha beta gamma " + " ".join(f"w{i}" for i in range(40)),
        ], pa.string())})
    eval_t = pa.table({"doc_id": pa.array([100], pa.int64()),
                       "text": pa.array([base], pa.string())})
    out = curate.fuzzy_decontaminate(
        ray.data.from_arrow(corpus), ray.data.from_arrow(eval_t),
        k=3, min_jacc_u=500_000).to_pandas()
    # doc 1 dropped (near-dup); docs 2 and 3 kept (3 would be dropped
    # by the exact any-shared-shingle decontaminate)
    assert sorted(out["doc_id"].tolist()) == [2, 3]
    exact = curate.decontaminate(
        ray.data.from_arrow(corpus), ray.data.from_arrow(eval_t),
        k=3).to_pandas()
    assert sorted(exact["doc_id"].tolist()) == [2]


def test_winsorize_clips_to_group_order_stats(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from kmcp_ray import relops

    rng = np.random.RandomState(3)
    g = np.repeat(np.array(["x", "y"], dtype=object), 50)
    v = np.concatenate([rng.randint(0, 1000, 50),
                        rng.randint(500, 2000, 50)]).astype(np.int64)
    tbl = pa.table({"doc_id": pa.array(range(100), pa.int64()),
                    "source": pa.array(g, pa.string()),
                    "n_chars": pa.array(v, pa.int64())})
    out = relops.winsorize(ray.data.from_arrow(tbl)) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    for grp in ("x", "y"):
        vals = np.sort(v[g == grp])
        lo = vals[(len(vals) - 1) * 5 // 100]
        hi = vals[(len(vals) - 1) * 95 // 100]
        got = out[out.source == grp]
        assert got.clipped.min() >= lo and got.clipped.max() <= hi
        exp = np.clip(got.n_chars.to_numpy(), lo, hi)
        assert (got.clipped.to_numpy() == exp).all()


def test_triangle_count_known_graph(ray_session):
    import pyarrow as pa
    import ray.data

    from kmcp_ray import cc

    # K4 on {0,1,2,3} (4 triangles) + pendant edge (4,5) + wedge 5-6-7
    ea = [0, 0, 0, 1, 1, 2, 4, 5, 6]
    eb = [1, 2, 3, 2, 3, 3, 5, 6, 7]
    tbl = pa.table({"id_a": pa.array(ea, pa.int64()),
                    "id_b": pa.array(eb, pa.int64())})
    out = cc.triangle_count(ray.data.from_arrow(tbl)).to_pandas()
    assert out.n_triangles.tolist() == [4]


def test_relops_auto_salt_skewed_custkey(ray_session):
    """r4 verdict #7: the TPC-H-shaped paths inherit the auto hot-key
    salting.  On a 90%-one-customer corpus (the viral-customer skew the
    salt exists for), order_revenue_topk and big_orders_topk with the
    default salt="auto" equal their salt=1 runs exactly."""
    import numpy as np
    import pyarrow as pa
    import ray.data
    from kmcp_ray import relops

    rng = np.random.default_rng(31)
    n_ord = 4000
    hot = 7
    ck = np.where(rng.random(n_ord) < 0.9, hot,
                  rng.integers(0, 200, n_ord)).astype(np.int64)
    okey = np.arange(n_ord, dtype=np.int64)
    odate = np.datetime64("1996-06-01", "us") + \
        rng.integers(0, 300, n_ord) * np.timedelta64(86400_000_000, "us")
    customer = pa.table({
        "c_custkey": pa.array(np.arange(200, dtype=np.int64), pa.int64()),
        "c_name": pa.array([f"cust{i}" for i in range(200)], pa.string()),
        "c_mktsegment": pa.array(
            ["BUILDING" if i % 2 == 0 else "AUTO" for i in range(200)],
            pa.string())})
    orders = pa.table({
        "o_orderkey": pa.array(okey, pa.int64()),
        "o_custkey": pa.array(ck, pa.int64()),
        "o_orderdate": pa.array(odate, pa.timestamp("us")),
        "o_totalprice": pa.array(rng.random(n_ord) * 1000, pa.float64())})
    n_li = 12_000
    li_ok = rng.integers(0, n_ord, n_li).astype(np.int64)
    lineitem = pa.table({
        "l_orderkey": pa.array(li_ok, pa.int64()),
        "l_quantity": pa.array(
            rng.integers(1, 50, n_li).astype(np.float64), pa.float64()),
        "l_extendedprice": pa.array(rng.random(n_li) * 100, pa.float64()),
        "l_discount": pa.array(rng.random(n_li) * 0.1, pa.float64()),
        "l_shipdate": pa.array(
            np.datetime64("1996-06-01", "us")
            + rng.integers(0, 600, n_li)
            * np.timedelta64(86400_000_000, "us"), pa.timestamp("us"))})

    def mk():
        return (ray.data.from_arrow(customer).repartition(4),
                ray.data.from_arrow(orders).repartition(4),
                ray.data.from_arrow(lineitem).repartition(4))

    outs = []
    for s in ("auto", 1):
        c, o, l = mk()
        outs.append(relops.order_revenue_topk(
            c, o, l, segment="BUILDING", cutoff="1996-12-01", k=20,
            num_partitions=8, salt=s).to_pandas())
    assert outs[0].values.tolist() == outs[1].values.tolist()

    outs2 = []
    for s in ("auto", 1):
        c, o, l = mk()
        outs2.append(relops.big_orders_topk(
            c, o, l, min_qty_c2=3000, k=30, num_partitions=8,
            salt=s).to_pandas())
    assert outs2[0].values.tolist() == outs2[1].values.tolist()
