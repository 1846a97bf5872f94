"""Unit tests for the corpus-curation operators (kmcp_ray/curate.py)
against small pure-Python oracles on constructed corpora."""

import re
from collections import Counter

import numpy as np
import pyarrow as pa
import pytest

from kmcp_ray import curate

try:  # ray only needed by the dataset-level tests
    import ray.data
except ImportError:  # pragma: no cover
    ray = None


def _docs_table():
    rows = [
        (0, "alpha beta gamma delta epsilon", "en"),
        (1, "alpha beta gamma delta zeta", "en"),      # shares shingles w/ 0
        (2, "one two three four five six", "en"),
        (3, "uno dos tres cuatro cinco", "es"),
        (4, "seis siete ocho nueve diez", "es"),
        (5, "", "en"),
        (6, None, "en"),
        (7, "short one", "es"),                         # < k tokens
        (8, "completely different words here now", "en"),
        (9, "one two three totally else", "en"),        # shares w/ 2
    ]
    return pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array([r[2] for r in rows], pa.string()),
    })


def test_sample_hash32_deterministic_and_uniform():
    ids = np.arange(100000, dtype=np.int64)
    h = curate.sample_hash32(ids)
    assert np.array_equal(h, curate.sample_hash32(ids))
    assert h.max() <= 0xFFFFFFFF
    rate = float((h % 100 < 10).mean())
    assert 0.09 < rate < 0.11


def test_hash_sample_nested_keep_sets(ray_session):
    ds = ray.data.from_arrow(_docs_table())
    ids5 = set(r["doc_id"] for r in curate.hash_sample(ds, pct=55).take_all())
    ids9 = set(r["doc_id"] for r in curate.hash_sample(ds, pct=90).take_all())
    assert ids5 <= ids9           # nested samples
    # oracle: direct predicate
    h = curate.sample_hash32(np.arange(10))
    assert ids5 == set(np.nonzero(h % 100 < 55)[0].tolist())


def test_stratified_sample_exact_quota(ray_session):
    n = 300
    langs = np.array(["en", "es", "fr"])[np.arange(n) % 3]
    t = pa.table({"doc_id": pa.array(np.arange(n), pa.int64()),
                  "lang": pa.array(langs, pa.string())})
    out = curate.stratified_sample(ray.data.from_arrow(t), pct=17,
                                   group_col="lang").take_all()
    got = Counter(r["lang"] for r in out)
    assert got == {"en": 17, "es": 17, "fr": 17}    # ceil(100*17/100)
    # deterministic: smallest (hash, id) per group
    ids = np.arange(n)
    h = curate.sample_hash32(ids)
    for lang in ["en", "es", "fr"]:
        grp = ids[langs == lang]
        order = grp[np.lexsort((grp, h[langs == lang]))][:17]
        want = set(order.tolist())
        assert set(r["doc_id"] for r in out if r["lang"] == lang) == want


def test_decontaminate_drops_shingle_overlap(ray_session):
    t = _docs_table()
    ds = ray.data.from_arrow(t)
    eval_ds = ray.data.from_arrow(t.slice(0, 1))       # doc 0 is the eval set
    ev2 = ray.data.from_arrow(t.slice(2, 1))           # doc 2
    out = curate.decontaminate(ds, eval_ds, k=3).take_all()
    kept = {r["doc_id"] for r in out}
    # doc 0 itself and doc 1 (shares "alpha beta gamma" etc.) are dropped;
    # empty/None/short/disjoint docs survive
    assert kept == {2, 3, 4, 5, 6, 7, 8, 9}
    kept2 = {r["doc_id"]
             for r in curate.decontaminate(ds, ev2, k=3).take_all()}
    assert kept2 == {0, 1, 3, 4, 5, 6, 7, 8}           # 2 and 9 share

    # empty eval set: nothing dropped
    empty = ray.data.from_arrow(t.slice(5, 1))         # text == ""
    kept3 = {r["doc_id"]
             for r in curate.decontaminate(ds, empty, k=3).take_all()}
    assert kept3 == set(range(10))


def test_vocab_topk_matches_counter(ray_session):
    t = _docs_table()
    out = curate.vocab_topk(ray.data.from_arrow(t), topk=5).take_all()
    cnt = Counter()
    for s in t.column("text").to_pylist():
        cnt.update(re.findall("[a-z0-9]+", (s or "").lower()))
    want = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert [(r["token"], r["cnt"]) for r in out] == want


def test_pii_scrub_counts_and_text(ray_session):
    t = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array([
            "mail me at jane.doe+x@sub.example.org thanks",
            "card 1234567890 and pin 12345",        # one >=6-digit run
            None,
            "two mails a@b.io c@d.co and 999999888877",
        ], pa.string()),
    })
    out = {r["doc_id"]: r
           for r in curate.pii_scrub(ray.data.from_arrow(t)).take_all()}
    assert out[0]["clean_text"] == "mail me at <EMAIL> thanks"
    assert out[0]["n_redacted"] == 1
    assert out[1]["clean_text"] == "card <NUM> and pin 12345"
    assert out[1]["n_redacted"] == 1
    assert out[2]["clean_text"] == ""
    assert out[2]["n_redacted"] == 0
    assert out[3]["clean_text"] == "two mails <EMAIL> <EMAIL> and <NUM>"
    assert out[3]["n_redacted"] == 3


def test_sample_hash_sql_expression_matches_numpy():
    duckdb = pytest.importorskip("duckdb")
    ids = np.arange(2000, dtype=np.int64)
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT unnest(range(0, 2000)) AS i")
    sql = f"SELECT {curate.sample_hash_sql('i')} AS h FROM t ORDER BY i"
    got = con.execute(sql).fetchnumpy()["h"].astype(np.uint64)
    assert np.array_equal(got, curate.sample_hash32(ids))


def test_exact_quantiles_match_numpy_order_statistics(ray_session):
    from kmcp_ray import relops
    rng = np.random.default_rng(7)
    vals = rng.integers(0, 50, size=5000).astype(np.int64)   # heavy ties
    ds = ray.data.from_arrow(pa.table({"v": pa.array(vals, pa.int64())}))
    out = relops.exact_quantiles(ds, "v", q_pcts=(0, 25, 50, 90, 99, 100))
    s = np.sort(vals)
    for q, v in zip(out.column("q_pct").to_pylist(),
                    out.column("value").to_pylist()):
        assert v == int(s[(len(s) - 1) * q // 100]), q


def test_repetition_score_counts(ray_session):
    t = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array([
            "a b c a b c a b c",     # shingles: abc bca cab ×repeats
            "x y z w",               # all distinct
            "",                      # no shingles
            "p q",                   # short row: one all-token shingle
        ], pa.string()),
    })
    out = {r["doc_id"]: r
           for r in curate.repetition_score(ray.data.from_arrow(t)).take_all()}
    # doc 0: 7 shingles, 3 distinct ("a b c","b c a","c a b")
    assert (out[0]["n_shingles"], out[0]["n_distinct"]) == (7, 3)
    assert out[0]["rep_milli"] == int(np.floor(1000.0 * 4 / 7))
    assert (out[1]["n_shingles"], out[1]["n_distinct"],
            out[1]["rep_milli"]) == (2, 2, 0)
    assert (out[2]["n_shingles"], out[2]["rep_milli"]) == (0, 0)
    assert (out[3]["n_shingles"], out[3]["n_distinct"]) == (1, 1)


def test_pack_sequences_prefix_sum(ray_session):
    # ids deliberately out of order across blocks; doc 2 empty; budget 10
    t = pa.table({
        "doc_id": pa.array([3, 0, 2, 1, 4], pa.int64()),
        "text": pa.array(["g h i j k l",          # 6 tok, offset 12
                          "a b c d e f g",        # 7 tok, offset 0
                          "",                     # 0 tok, offset 12
                          "x y z w v",            # 5 tok, offset 7
                          "m n o p q r s t u"],   # 9 tok, offset 18
                         pa.string()),
    })
    out = {r["doc_id"]: r for r in curate.pack_sequences(
        ray.data.from_arrow(t), budget=10, num_partitions=4).take_all()}
    assert [out[i]["tok_offset"] for i in range(5)] == [0, 7, 12, 12, 18]
    assert [out[i]["n_tokens"] for i in range(5)] == [7, 5, 0, 6, 9]
    # doc 1 straddles windows 0→1; doc 4 spans 1→2; empty doc 2 sits at
    # its offset's window
    assert (out[1]["win_start"], out[1]["win_end"]) == (0, 1)
    assert (out[2]["win_start"], out[2]["win_end"]) == (1, 1)
    assert (out[3]["win_start"], out[3]["win_end"]) == (1, 1)
    assert (out[4]["win_start"], out[4]["win_end"]) == (1, 2)


def test_distinctive_term_arms_equal(ray_session):
    """The broadcast-probe arm and the two-exchange fallback arm must
    emit identical rows; winner order is (tf desc, df asc, tok asc)."""
    import ray.data
    t = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array([
            "apple apple banana cherry",   # tf: apple 2 → wins
            "banana cherry date",          # all tf 1 → rarest df wins
            "",                            # no tokens → no row
            "cherry cherry banana banana", # tf tie → lower-df wins
        ], pa.string())})
    ds = ray.data.from_arrow(t)
    broad = curate.distinctive_term(ds).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    exch = curate.distinctive_term(
        ds, broadcast_vocab_limit=1, num_partitions=4).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert broad.equals(exch)
    got = {r.doc_id: (r.top_token, r.tf, r.df) for r in broad.itertuples()}
    # df: apple 1, banana 3, cherry 3, date 1
    assert got[0] == ("apple", 2, 1)
    assert got[1] == ("date", 1, 1)
    assert 2 not in got
    # doc 3: banana/cherry both tf 2 df 3 → token asc
    assert got[3] == ("banana", 2, 3)


def test_dup_rate_by_source(ray_session):
    import ray.data
    from kmcp_ray import docs_dedup
    t = pa.table({
        "source": pa.array(["a", "a", "a", "b", "b", "c"], pa.string()),
        "text": pa.array(["x", "x", "y", "x", "z", "z"], pa.string())})
    df = docs_dedup.dup_rate_by_source(
        ray.data.from_arrow(t), num_partitions=4).to_pandas() \
        .set_index("source")
    # corpus-wide: "x"×3 dup, "z"×2 dup, "y"×1 unique
    assert tuple(df.loc["a"]) == (3, 2, 2)   # docs, dup(x,x), distinct{x,y}
    assert tuple(df.loc["b"]) == (2, 2, 2)   # both x and z are dups
    assert tuple(df.loc["c"]) == (1, 1, 1)


def test_span_dedup_first_occurrence_wins(ray_session):
    import ray.data
    from kmcp_ray import curate
    span = "one two three four five"
    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array([
            span + " tail",                       # first occurrence + tail
            span + " six seven eight nine ten",   # window 0 removed
            "six seven eight nine ten " + span,   # window 1 removed
            "unique words only here now",         # untouched
        ], pa.string())})
    out = curate.span_dedup(ray.data.from_arrow(t), w=5).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert out.clean_text.tolist() == [
        span + " tail",                 # doc 1: winner (min doc_id), kept
        "six seven eight nine ten",     # doc 2: span removed, widx 1 is
        #                                 the FIRST 'six..ten' → kept
        # doc 3: 'six..ten' lost to doc 2 widx 1 ((2<<20|1) < (3<<20|0))
        # and span lost to doc 1 → both windows removed
        "",
        "unique words only here now",
    ]
    assert out.n_spans_removed.tolist() == [0, 1, 2, 0]


def test_span_dedup_arms_and_within_doc(ray_session):
    import ray.data
    from kmcp_ray import curate
    rep = "a b c d e"
    t = pa.table({
        "doc_id": pa.array([7], pa.int64()),
        "text": pa.array([rep + " " + rep + " " + rep + " zz"],
                         pa.string())})
    for gate in (10**6, 0):   # broadcast arm, exchange arm
        out = curate.span_dedup(ray.data.from_arrow(t), w=5,
                                broadcast_removed_rows=gate).to_pandas()
        # within-doc duplicates: first window survives, 2 removed
        assert out.clean_text.tolist() == [rep + " zz"]
        assert out.n_spans_removed.tolist() == [2]


def test_gopher_filter_rule_bits(ray_session):
    import ray.data
    from kmcp_ray import curate
    good = ("the quick brown fox jumps over that lazy dog with more "
            "plain words here " + " ".join(f"word{i}" for i in range(40)))
    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array([
            good,                                  # passes all rules
            "the fox with cat",                    # too few words (bit 0)
            good + " aaaaaaaaaaaaaaaaaaaaaa" * 60,  # mwl > 10 (bit 1)
            good + " @@@@!!!!####$$$$%%%%" * 30,    # symbols > 10% (bit 2)
        ], pa.string())})
    out = curate.gopher_filter(ray.data.from_arrow(t), min_words=50) \
        .to_pandas().sort_values("doc_id")
    assert out.fail_mask.tolist() == [0, 1, 2, 4]
    # stopword rule: long doc with only one distinct stopword
    t2 = pa.table({"doc_id": pa.array([9], pa.int64()),
                   "text": pa.array([
                       "the " + " ".join(f"word{i}" for i in range(60))],
                       pa.string())})
    out2 = curate.gopher_filter(ray.data.from_arrow(t2)).to_pandas()
    assert out2.fail_mask.tolist() == [8]


def test_dsir_select_matches_pure_python(ray_session):
    """Production (sip) path vs the pure-Python reference: same corpus,
    same buckets — identical kept set and identical integer scores."""
    import ray.data
    from kmcp_ray import dsir
    rng = np.random.default_rng(7)
    target_vocab = [f"tgt{i}" for i in range(12)]
    other_vocab = [f"oth{i}" for i in range(12)]
    docs, toks_by_doc, target_ids = [], {}, set()
    for did in range(40):
        is_tgt = did % 4 == 0
        pool = target_vocab if is_tgt else other_vocab
        # mix in some shared tokens so distributions overlap
        toks = list(rng.choice(pool, size=30)) + ["shared"] * 5
        docs.append((did, " ".join(toks)))
        toks_by_doc[did] = toks
        if is_tgt:
            target_ids.add(did)
    t = pa.table({"doc_id": pa.array([d for d, _ in docs], pa.int64()),
                  "text": pa.array([x for _, x in docs], pa.string())})

    def mask(tab):
        return np.isin(tab.column("doc_id").to_numpy(zero_copy_only=False),
                       sorted(target_ids))

    for th in ("sip", "md5"):
        got = dsir.dsir_select(ray.data.from_arrow(t), mask,
                               buckets=256, token_hash=th,
                               top_frac=0.25).to_pandas()
        want = dsir.dsir_select_oracle(toks_by_doc, target_ids,
                                       buckets=256, token_hash=th,
                                       top_frac=0.25)
        assert dict(zip(got.doc_id, got.dsir_score)) == want, th
        # distribution-matching sanity: target-like docs rank on top
        assert set(got.doc_id) <= target_ids, th


def test_global_shuffle_is_a_permutation(ray_session):
    """Every position 0..n-1 appears exactly once; order matches the
    driver-side (hash, id) sort; stable across partition counts."""
    import ray.data
    from kmcp_ray import curate
    ids = np.arange(137, dtype=np.int64) * 3 + 1
    t = pa.table({"doc_id": pa.array(ids, pa.int64())})
    out = curate.global_shuffle(ray.data.from_arrow(t), num_partitions=8) \
        .to_pandas().sort_values("doc_id")
    assert sorted(out.shuffle_pos) == list(range(len(ids)))
    h = curate.sample_hash32(ids)
    order = np.lexsort((ids, h))
    want = np.empty(len(ids), np.int64)
    want[order] = np.arange(len(ids))
    assert out.shuffle_pos.tolist() == want[np.argsort(ids)].tolist()
    out2 = curate.global_shuffle(ray.data.from_arrow(t),
                                 num_partitions=32).to_pandas() \
        .sort_values("doc_id")
    assert out2.shuffle_pos.tolist() == out.shuffle_pos.tolist()


def test_hash_split_fractions_and_stability(ray_session):
    """Split is a pure function of id: a grown corpus never reassigns
    old ids, and fractions land near 80/10/10."""
    import ray.data
    from kmcp_ray import curate
    small = pa.table({"doc_id": pa.array(range(500), pa.int64())})
    big = pa.table({"doc_id": pa.array(range(2000), pa.int64())})
    s = curate.hash_split(ray.data.from_arrow(small)).to_pandas()
    b = curate.hash_split(ray.data.from_arrow(big)).to_pandas()
    merged = s.merge(b, on="doc_id", suffixes=("_s", "_b"))
    assert (merged.split_s == merged.split_b).all()
    frac = b.split.value_counts(normalize=True)
    assert abs(frac["train"] - 0.8) < 0.05
    assert abs(frac["val"] - 0.1) < 0.04
    assert abs(frac["test"] - 0.1) < 0.04


def test_novelty_score_planted_and_hash_variants(ray_session):
    """Planted corpus: doc 0 introduces everything (novelty 1e6); an
    exact copy later introduces nothing (0); a half-overlap doc sits in
    between — and the sip production hash agrees with the md5 oracle
    variant exactly (first-occurrence is hash-set semantics)."""
    import ray.data
    texts = ["alpha beta gamma delta epsilon zeta",   # all novel
             "alpha beta gamma delta epsilon zeta",   # exact copy: 0
             "alpha beta gamma NEW1 NEW2 NEW3",       # mixed
             "totally fresh words here now"]          # all novel
    tbl = pa.table({"doc_id": pa.array(range(4), pa.int64()),
                    "text": pa.array(texts, pa.string())})
    out = curate.novelty_score(ray.data.from_arrow(tbl),
                               token_hash="md5").to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert out.novelty_u.tolist()[0] == 1_000_000
    assert out.novelty_u.tolist()[1] == 0
    assert 0 < out.novelty_u.tolist()[2] < 1_000_000
    assert out.novelty_u.tolist()[3] == 1_000_000
    # doc 2: 4 shingles, shares "alpha beta gamma" with doc 0 -> 3 novel
    assert out.n_distinct.tolist()[2] == 4
    assert out.n_novel.tolist()[2] == 3
    sip = curate.novelty_score(ray.data.from_arrow(tbl),
                               token_hash="sip").to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert sip.equals(out)


def test_novelty_score_degenerate_docs(ray_session):
    """Empty/null/sub-k-token docs: zero-shingle docs appear with
    all-zero counts; short docs fall back to the one all-token
    shingle (include_short contract shared with the SQL oracle)."""
    import ray.data
    tbl = pa.table({"doc_id": pa.array([0, 1, 2, 3], pa.int64()),
                    "text": pa.array(["", None, "one two", "one two"],
                                     pa.string())})
    out = curate.novelty_score(ray.data.from_arrow(tbl),
                               token_hash="md5").to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert out.n_distinct.tolist() == [0, 0, 1, 1]
    assert out.n_novel.tolist() == [0, 0, 1, 0]
    assert out.novelty_u.tolist() == [0, 0, 1_000_000, 0]


def test_contrastive_triplets_planted(ray_session):
    """Planted near-dup pair (0,1) + unrelated docs: both members
    become anchors with each other as positive; negatives are the
    deterministic hash-pick, never the anchor itself and never a
    near-dup partner."""
    import ray.data
    texts = ["alpha beta gamma delta epsilon zeta eta theta",
             "alpha beta gamma delta epsilon zeta eta iota",  # ~0.78 jacc
             "one two three four five six seven eight",
             "cat dog bird fish lion tiger bear wolf"]
    tbl = pa.table({"doc_id": pa.array(range(4), pa.int64()),
                    "text": pa.array(texts, pa.string())})
    out = curate.contrastive_triplets(
        ray.data.from_arrow(tbl), max_id=4, min_jacc_u=650000) \
        .to_pandas().sort_values("anchor_id").reset_index(drop=True)
    # anchor 0: hash-pick 0 == self -> bumped to 1 == its near-dup
    # partner -> the whole triplet is anti-joined away (rejection path)
    # anchor 1: hash-pick 2, unrelated -> kept
    h = curate.sample_hash32(np.array([0, 1], dtype=np.int64)) % 4
    assert h.tolist() == [0, 2]          # pins the scenario
    assert out.anchor_id.tolist() == [1]
    assert out.pos_id.tolist() == [0]
    assert out.neg_id.tolist() == [2]


def test_oov_rate_planted(ray_session):
    """vocab_size=2 over a skewed corpus: 'a' and 'b' are in-vocab,
    everything else counts as OOV; empty doc scores 0."""
    import ray.data
    texts = ["a a a b b z", "q r s", "a b", ""]
    tbl = pa.table({"doc_id": pa.array(range(4), pa.int64()),
                    "text": pa.array(texts, pa.string())})
    out = curate.oov_rate(ray.data.from_arrow(tbl), vocab_size=2) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert out.n_tok.tolist() == [6, 3, 2, 0]
    assert out.n_oov.tolist() == [1, 3, 0, 0]
    assert out.oov_u.tolist() == [166666, 1000000, 0, 0]


def test_heavy_hitters_exact(ray_session):
    """k=2 -> threshold N/3: only tokens with true count > N/3 emerge,
    with EXACT counts, despite the decremented per-batch sketches."""
    import ray.data
    # 12 tokens total: x*7, y*3, z*2 -> N/3 = 4: only x qualifies
    texts = ["x x x y z", "x x y z", "x x y"]
    tbl = pa.table({"doc_id": pa.array(range(3), pa.int64()),
                    "text": pa.array(texts, pa.string())})
    out = curate.heavy_hitters(ray.data.from_arrow(tbl), k=2) \
        .to_pandas()
    assert out.token.tolist() == ["x"]
    assert out.cnt.tolist() == [7]


def test_heavy_hitters_matches_bruteforce(ray_session):
    """Random-ish corpus: MG candidates + recount == brute-force
    threshold rule for several k."""
    import ray.data
    rng = np.random.RandomState(7)
    vocab = np.array([f"t{i}" for i in range(20)], dtype=object)
    p = 1.0 / (np.arange(20) + 1.0) ** 2; p /= p.sum()
    texts = [" ".join(rng.choice(vocab, size=30, p=p)) for _ in range(40)]
    tbl = pa.table({"doc_id": pa.array(range(40), pa.int64()),
                    "text": pa.array(texts, pa.string())})
    from collections import Counter
    truth = Counter(w for t in texts for w in t.split())
    n = sum(truth.values())
    for k in (3, 8):
        out = curate.heavy_hitters(
            ray.data.from_arrow(tbl), k=k).to_pandas()
        exp = sorted(((c, t) for t, c in truth.items()
                      if c * (k + 1) > n),
                     key=lambda x: (-x[0], x[1]))
        if len(out) == 0:
            assert exp == []
        else:
            assert out.token.tolist() == [t for _c, t in exp]
            assert out.cnt.tolist() == [c for c, _t in exp]


def test_pmi_pairs_planted(ray_session):
    """'p q' always adjacent -> top lift; sentinel and unigram rows
    never leak into the output."""
    import ray.data
    texts = ["p q r s", "p q s r", "r p q s", "s r p q"]
    tbl = pa.table({"doc_id": pa.array(range(4), pa.int64()),
                    "text": pa.array(texts, pa.string())})
    out = curate.pmi_pairs(ray.data.from_arrow(tbl), window=1,
                           min_cnt=2, topk=3).to_pandas()
    assert out.iloc[0].tok_a == "p" and out.iloc[0].tok_b == "q"
    assert out.iloc[0].cnt == 4
    # n_pairs = 4 docs * 3 adjacent = 12; c_p = c_q = 4
    assert out.iloc[0].lift_u == 1_000_000 * 4 * 12 // (4 * 4)
    assert not (out.tok_a == " ").any()


def test_boilerplate_dedup_planted(ray_session):
    """A 2-token line planted in 3 docs dies everywhere at min_docs=3;
    the same line in only 2 docs survives; trailing odd token kept."""
    import ray.data
    texts = ["aa bb xx yy tail",        # 'aa bb' + 'xx yy' + trail
             "aa bb cc dd",
             "aa bb dd cc",
             "xx yy cc dd"]
    tbl = pa.table({"doc_id": pa.array(range(4), pa.int64()),
                    "text": pa.array(texts, pa.string())})
    out = curate.boilerplate_dedup(
        ray.data.from_arrow(tbl), w=2, min_docs=3) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    # 'aa bb' in docs 0,1,2 (3 docs) -> removed; 'xx yy' in 0,3 -> kept
    assert out.clean_text.tolist() == [
        "xx yy tail", "cc dd", "dd cc", "xx yy cc dd"]
    assert out.n_lines_removed.tolist() == [1, 1, 1, 0]


def test_boilerplate_dedup_exchange_arm(ray_session):
    """Forcing broadcast_blocked_rows=0 drives the semi-join +
    exchange-rebuild arm; output equals the broadcast arm."""
    import ray.data
    texts = ["aa bb xx yy tail", "aa bb cc dd", "aa bb dd cc",
             "xx yy cc dd"]
    tbl = pa.table({"doc_id": pa.array(range(4), pa.int64()),
                    "text": pa.array(texts, pa.string())})
    a = curate.boilerplate_dedup(
        ray.data.from_arrow(tbl), w=2, min_docs=3) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = curate.boilerplate_dedup(
        ray.data.from_arrow(tbl), w=2, min_docs=3,
        broadcast_blocked_rows=0) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b[a.columns])


def test_curriculum_order_matches_two_rownumbers(ray_session):
    """Closed-form interleave position == rank under (r, source) for
    uneven source sizes; r == within-source (key, id) rank."""
    import ray.data
    rng = np.random.RandomState(5)
    n = 120
    src = rng.choice(np.array(["a", "bb", "c"], dtype=object),
                     n, p=[0.5, 0.3, 0.2])
    k = rng.randint(0, 40, n).astype(np.int64)
    tbl = pa.table({"doc_id": pa.array(range(n), pa.int64()),
                    "source": pa.array(src, pa.string()),
                    "n_chars": pa.array(k, pa.int64())})
    out = curate.curriculum_order(ray.data.from_arrow(tbl)) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    import pandas as pd
    df = tbl.to_pandas()
    df["r"] = df.sort_values(["n_chars", "doc_id"]) \
        .groupby("source").cumcount().reindex(
            df.sort_values(["n_chars", "doc_id"]).index)
    df = df.sort_values("doc_id").reset_index(drop=True)
    assert out.r.tolist() == df.r.tolist()
    exp_pos = df.sort_values(["r", "source"]).reset_index()
    pos_map = {int(row["doc_id"]): i
               for i, row in exp_pos.iterrows()}
    assert out.pos.tolist() == [pos_map[i] for i in range(n)]
    assert sorted(out.pos.tolist()) == list(range(n))
