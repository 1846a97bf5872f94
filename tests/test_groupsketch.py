"""M7 concat-with-spacers / grouped sketch vs a pure-Python oracle."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from kmcp_ray.config import DedupConfig
from kmcp_ray.groupsketch import (SPACER_TOKEN, concat_with_spacers,
                                  grouped_sketch)
from tests.oracle import sketch_of, tokens_of


def _corpus(n_groups=13, seed=3):
    rng = np.random.default_rng(seed)
    words = [f"w{i:03d}" for i in range(80)]
    gids, rids, texts = [], [], []
    rid = 0
    for g in range(n_groups):
        for _ in range(int(rng.integers(1, 6))):
            ln = int(rng.integers(0, 30))  # includes empty + short rows
            texts.append(" ".join(rng.choice(words, ln)))
            gids.append(f"g{g:02d}")
            rids.append(f"r{rid:04d}")
            rid += 1
    return pa.table({"group_id": pa.array(gids, pa.string()),
                     "row_id": pa.array(rids, pa.string()),
                     "text": pa.array(texts, pa.string())})


@pytest.mark.parametrize("scale", [1, 4])
def test_grouped_sketch_union_oracle(ray_session, scale):
    cfg = DedupConfig(shingle_k=3, scale=scale)
    tbl = _corpus()
    out = grouped_sketch(ray.data.from_arrow(tbl), cfg,
                         num_partitions=8).to_pandas()
    assert len(out) == len(set(tbl.column("group_id").to_pylist()))

    # oracle: per-group union of per-row UNSCALED shingle sets,
    # distinct count before scaling, scale filter after the union
    full_cfg = DedupConfig(shingle_k=3, scale=1)
    max_hash = cfg.max_hash
    exp = {}
    for gid, txt in zip(tbl.column("group_id").to_pylist(),
                        tbl.column("text").to_pylist()):
        s = exp.setdefault(gid, {"set": set(), "ntok": 0, "nmem": 0})
        s["set"].update(sketch_of(txt, full_cfg).tolist())
        s["ntok"] += len(tokens_of(txt))
        s["nmem"] += 1

    got = out.set_index("group_id")
    for gid, e in exp.items():
        row = got.loc[gid]
        assert row["n_members"] == e["nmem"]
        assert row["n_tokens"] == e["ntok"]
        assert row["n_distinct"] == len(e["set"])
        kept = sorted(h for h in e["set"]
                      if scale == 1 or h <= max_hash)
        assert list(np.asarray(row["sketch"], dtype=np.uint64)) == kept


def test_grouped_sketch_shingles_never_cross_rows(ray_session):
    """Two groups with identical member shingle-sets but different row
    splits of the same token stream must NOT produce the same sketch —
    boundary windows are excluded (the point of kmcp's k-1 'N' spacer,
    compute.go:567-628)."""
    cfg = DedupConfig(shingle_k=3)
    toks = [f"t{i}" for i in range(12)]
    split_a = [" ".join(toks)]                       # one long row
    split_b = [" ".join(toks[:6]), " ".join(toks[6:])]  # split in two
    tbl = pa.table({
        "group_id": pa.array(["a"] + ["b"] * 2, pa.string()),
        "text": pa.array(split_a + split_b, pa.string())})
    out = grouped_sketch(ray.data.from_arrow(tbl), cfg,
                         num_partitions=4).to_pandas().set_index("group_id")
    sk_a = set(np.asarray(out.loc["a"]["sketch"], dtype=np.uint64).tolist())
    sk_b = set(np.asarray(out.loc["b"]["sketch"], dtype=np.uint64).tolist())
    # b's shingles are a subset of a's minus the 2 boundary windows
    assert sk_b < sk_a
    assert len(sk_a - sk_b) == cfg.shingle_k - 1


def test_concat_with_spacers_roundtrip(ray_session):
    tbl = _corpus(n_groups=5, seed=9)
    k = 3
    out = concat_with_spacers(
        ray.data.from_arrow(tbl), k, order_col="row_id",
        num_partitions=4).to_pandas().set_index("group_id")
    sep = " " + " ".join([SPACER_TOKEN] * (k - 1)) + " "
    gids = tbl.column("group_id").to_pylist()
    rids = tbl.column("row_id").to_pylist()
    txts = tbl.column("text").to_pylist()
    for g in sorted(set(gids)):
        members = sorted(((r, t) for gg, r, t in zip(gids, rids, txts)
                          if gg == g))
        assert out.loc[g]["text"] == sep.join(t for _, t in members)
