import numpy as np
import pyarrow as pa
import pytest

from kmcp_ray import docs_dedup
from kmcp_ray.config import DedupConfig

CFG = DedupConfig(num_partitions=8)


def _docs_table():
    base = ("streaming engines shuffle blocks across the cluster while "
            "backpressure keeps memory bounded and spilling rare today "
            "because the scheduler pipelines map tasks with reduce tasks "
            "and object spilling absorbs transient pressure gracefully")
    near = base.replace("rare", "common")
    # 16 of 32 tokens → containment 1.0 but Jaccard ≈ 0.47 < τ
    contained = " ".join(base.split()[2:18])
    texts = [base, near, contained,
             "a totally different document about perceptual hashing",
             "a totally different document about perceptual hashing",  # exact dup
             "short one", ""]
    return pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                     "text": pa.array(texts, pa.string())})


def test_exact_dedup(ray_session):
    import ray.data
    out = docs_dedup.exact_dedup(ray.data.from_arrow(_docs_table()),
                                 num_partitions=8).to_pandas()
    out = out.set_index("doc_id").sort_index()
    assert out.loc[3, "keep_id"] == 3 and out.loc[4, "keep_id"] == 3
    assert out.loc[3, "n_copies"] == 2
    assert out.loc[0, "keep_id"] == 0 and out.loc[0, "n_copies"] == 1
    assert len(out) == 7


def test_minhash_dedup_clusters_near_and_contained(ray_session):
    import ray.data
    out = docs_dedup.minhash_dedup(ray.data.from_arrow(_docs_table()), CFG) \
        .to_pandas().set_index("doc_id")["cluster_id"]
    assert out[0] == out[1] == out[2] == 0     # near + contained cluster to min id
    assert out[3] == out[4] == 3               # exact dups
    assert out[5] == 5 and out[6] == 6         # singletons


def test_simhash_dedup(ray_session):
    # SimHash is a long-document sketch: a 1-word edit on a long doc
    # flips few bits; on short docs it is intentionally coarse.
    import ray.data
    base = " ".join(f"tok{i} word{i % 7} filler{i % 13}" for i in range(25))
    near = base.replace("tok12", "changed", 1)
    far = " ".join(f"other{i}" for i in range(40))
    tbl = pa.table({"doc_id": pa.array(range(4), pa.int64()),
                    "text": pa.array([base, near, far, far])})
    out = docs_dedup.simhash_dedup(ray.data.from_arrow(tbl), CFG) \
        .to_pandas().set_index("doc_id")["cluster_id"]
    assert out[0] == out[1]                    # small edit on long doc
    assert out[2] == out[3]                    # identical → distance 0
    assert out[0] != out[2]


def test_ngram_jaccard_pairs(ray_session):
    import ray.data
    out = docs_dedup.ngram_jaccard_pairs(ray.data.from_arrow(_docs_table()),
                                         CFG).to_pandas()
    pairs = {(a, b): (v, s) for a, b, v, s in
             zip(out.id_a, out.id_b, out.via, out.score)}
    assert (0, 1) in pairs and pairs[(0, 1)][0] == "minhash"
    assert (0, 2) in pairs and pairs[(0, 2)][0] == "contain"
    assert pairs[(0, 2)][1] == 1.0             # true subset containment
    assert (3, 4) in pairs


def test_contains_exact(ray_session):
    import ray.data
    from kmcp_ray import substr
    texts = ["alpha beta gamma delta", "xx alpha beta gamma delta yy",
             "unrelated words only here", "alpha beta"]
    tbl = pa.table({"doc_id": pa.array(range(4), pa.int64()),
                    "text": pa.array(texts)})
    out = substr.contains_exact(
        ray.data.from_arrow(tbl),
        [(0, texts[0]), (3, texts[3])]).to_pandas()
    got = set(zip(out.needle_id, out.hay_id))
    # doc0 is a literal substring of doc1; "alpha beta" occurs in 0 and 1
    assert got == {(0, 1), (3, 0), (3, 1)}


def test_token_jaccard_exact(ray_session):
    import ray.data
    tbl = pa.table({"doc_id": pa.array(range(4), pa.int64()),
                    "text": pa.array([
                        "a b c d",            # {a,b,c,d}
                        "a b c e",            # jacc with 0: 3/5 = 0.6
                        "a b c d",            # exact dup of 0: 1.0
                        "z y x w v"])})       # disjoint
    out = docs_dedup.token_jaccard_exact(
        ray.data.from_arrow(tbl), max_id=10, min_jacc_u=600000).to_pandas()
    got = {(a, b): j for a, b, j in zip(out.id_a, out.id_b, out.jaccard_u)}
    assert got == {(0, 1): 600000, (0, 2): 1000000, (1, 2): 600000}


def test_select_representatives_policy(ray_session):
    import ray.data
    # clusters: {0,1,2} and {3,4}; quality picks longest, tie -> min id
    assign = pa.table({"doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
                       "cluster_id": pa.array([0, 0, 0, 3, 3], pa.int64())})
    docs = pa.table({"doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
                     "n_chars": pa.array([5, 9, 9, 7, 7], pa.int64())})
    out = {r["cluster_id"]: r for r in docs_dedup.select_representatives(
        ray.data.from_arrow(assign), ray.data.from_arrow(docs),
        num_partitions=4).take_all()}
    assert (out[0]["rep_id"], out[0]["rep_quality"],
            out[0]["n_members"]) == (1, 9, 3)     # tie 1 vs 2 -> min id
    assert (out[3]["rep_id"], out[3]["rep_quality"],
            out[3]["n_members"]) == (3, 7, 2)


def test_cross_source_dup_matrix_closed_form(ray_session):
    import pyarrow as pa
    import ray.data
    from kmcp_ray import docs_dedup
    # class "x": a×3, b×2, c×1  → aa C(3,2)=3, ab 6, ac 3, bb 1, bc 2
    # class "y": a×2            → aa C(2,2)=1
    # class "z": c×1            → nothing
    t = pa.table({
        "source": pa.array(["a", "a", "a", "b", "b", "c", "a", "a", "c"]),
        "text": pa.array(["x", "x", "x", "x", "x", "x", "y", "y", "z"])})
    df = docs_dedup.cross_source_dup_matrix(
        ray.data.from_arrow(t), num_partitions=4).to_pandas() \
        .set_index(["source_a", "source_b"]).n_pairs
    assert df.to_dict() == {("a", "a"): 4, ("a", "b"): 6, ("a", "c"): 3,
                            ("b", "b"): 1, ("b", "c"): 2}
    # dup-free corpus: empty but schema-stable
    t2 = pa.table({"source": pa.array(["a", "b"]),
                   "text": pa.array(["p", "q"])})
    ds2 = docs_dedup.cross_source_dup_matrix(
        ray.data.from_arrow(t2), num_partitions=4)
    # Dataset-level schema survives the empty result (to_pandas() on any
    # 0-row Ray dataset returns a column-less frame — Ray quirk)
    assert ds2.schema().names == ["source_a", "source_b", "n_pairs"]
    assert ds2.count() == 0


def test_dedup_audit_invariants(ray_session):
    """The audit's production arm shares the exact arm's verify
    predicate, so production pairs are a SUBSET of exact pairs:
    precision must be 1.0 and recall = n_prod / n_exact; counts
    cross-checked against an independent pair run on the same
    sample."""
    import dataclasses

    import ray.data

    from kmcp_ray.curate import hash_sample

    docs = ray.data.read_parquet("/root/testdata/sf0.001/documents.parquet",
                                 columns=["doc_id", "text"])
    cfg = DedupConfig(num_partitions=8)
    row = docs_dedup.dedup_audit(docs, cfg, sample_pct=70).to_pylist()[0]
    assert row["n_common"] <= min(row["n_exact"], row["n_prod"])
    assert row["precision_u"] == 1_000_000          # prod ⊆ exact
    assert 0 <= row["recall_u"] <= 1_000_000
    assert row["n_exact"] > 0                        # non-degenerate

    sample = hash_sample(docs, 70)
    ex = dataclasses.replace(cfg, bucket_scale=1, verify_k=1 << 30,
                             min_containment_shingles=1,
                             max_shingle_df=1 << 30, max_bucket=1 << 30)
    want = {(r["id_a"], r["id_b"]) for r in
            docs_dedup.ngram_jaccard_pairs(sample, ex).take_all()}
    assert row["n_exact"] == len(want)
    assert row["n_sample"] == sample.count()


def test_levenshtein_batch_vs_bruteforce():
    import numpy as np

    from kmcp_ray.docs_dedup import levenshtein_batch

    def ref(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1,
                                         prev + (ca != cb))
        return dp[len(b)]

    rng = np.random.RandomState(11)
    alpha = "ab c"
    A, B = [], []
    for _ in range(60):
        A.append("".join(rng.choice(list(alpha),
                                    rng.randint(0, 15))))
        B.append("".join(rng.choice(list(alpha),
                                    rng.randint(0, 15))))
    A += ["", "kitten", "same", ""]
    B += ["abc", "sitting", "same", ""]
    got = levenshtein_batch(np.array(A, object), np.array(B, object))
    exp = [ref(a, b) for a, b in zip(A, B)]
    assert got.tolist() == exp


def test_edit_distance_pairs_planted(ray_session):
    import pyarrow as pa
    import ray.data

    from kmcp_ray import docs_dedup

    texts = ["alpha beta gamma delta epsilon zeta",
             "alpha beta gamma delta epsilon zett",   # 1 char swap-ish
             "zeta epsilon delta gamma beta alpha",   # permuted: jacc 1.0
             "one two three four five six"]
    tbl = pa.table({"doc_id": pa.array(range(4), pa.int64()),
                    "text": pa.array(texts, pa.string())})
    out = docs_dedup.edit_distance_pairs(
        ray.data.from_arrow(tbl), max_id=4, cand_jacc_u=500_000,
        max_dist=5).to_pandas()
    # (0,1): tiny char distance -> kept; (0,2)/(1,2): perfect-Jaccard
    # permutation but HUGE edit distance -> rejected by the verify
    assert list(zip(out.id_a, out.id_b)) == [(0, 1)]
    assert out.dist.tolist()[0] <= 2
