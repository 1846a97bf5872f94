"""Driver-contract tests: entry() smoke + queries() vs oracle_sql()
via DuckDB at sf0.001 (the same comparison the driver runs at sf0.01).
"""

import duckdb
import pandas as pd
import pytest

import __ray_entry__ as entrymod
from tools.check_queries import TABLES, canon, to_pandas

SF = "/root/testdata/sf0.001"

# SQL-checked queries, kept fast at sf0.001
SQL_CHECKED = ["exact_dedup_docs", "token_count", "token_stats", "doc_stats",
               "lang_source_agg", "events_type_agg", "events_hourly_user",
               "lineitem_pricing", "top_docs_by_len", "cov2simi",
               "ann_topk", "ann_ivf_topk", "ann_ivf_persisted",
               "embedding_pairs", "embedding_dedup", "corpus_funnel",
               "incremental_dedup", "hash_sample", "stratified_sample",
               "decontaminate", "bloom_decontaminate",
               "fuzzy_decontaminate", "span_dedup", "vocab_topk",
               "pii_scrub", "sessionize", "hopping_window",
               "running_window", "event_funnel", "cross_source_dups",
               "gopher_filter", "dsir_select", "global_shuffle",
               "hash_split",
               "order_revenue", "brand_revenue", "region_revenue",
               "big_orders",
               "customers_no_urgent", "cohort_retention", "label_outliers",
               "source_balance", "rollup_agg",
               "asof_join", "range_join", "doc_len_quantiles",
               "group_quantiles",
               "hard_negatives", "semantic_dedup_label",
               "quality_filter_pctl", "perplexity_score",
               "consensus_pairs", "mixture_resample",
               "repetition_score", "shingle_hll", "token_cms",
               "hamming_topk", "novelty_score", "contrastive_triplets",
               "oov_rate", "heavy_hitters", "pmi_pairs",
               "boilerplate_dedup", "winsorize", "triangle_count",
               "edit_distance_pairs", "curriculum_order",
               "pack_sequences",
               "select_representatives", "corpus_diff",
               "normalized_dedup", "group_topk", "keyword_search",
               "doc_top_term", "bigram_topk", "distinctive_term",
               "dup_rate_by_source"]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return c


def test_entry_smoke(ray_session):
    ds = entrymod.entry()
    df = to_pandas(ds)
    assert len(df) >= 1
    assert set(df.columns) == {"image_id", "cluster_id"}


@pytest.mark.parametrize("name", SQL_CHECKED)
def test_query_matches_oracle(ray_session, con, name):
    got = canon(to_pandas(entrymod.queries()[name](SF)))
    want = canon(con.sql(entrymod.oracle_sql()[name]).df())
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_rows_only_queries_run(ray_session):
    qs = entrymod.queries()
    for name in ["minhash_dedup_docs", "doc_fingerprint", "lang_id",
                 "resize_images", "frame_sample", "audio_features",
                 "image_dedup"]:
        df = to_pandas(qs[name](SF))
        assert len(df) > 0, name
