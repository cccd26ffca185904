"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (tf-idf over the documents table) at
sf0.001. ``queries()`` / ``oracle_sql()`` — one entry per implemented
operator from SURVEY.md §2 plus the training-data-pipeline extensions;
implementations live in ``diffdataflowmlpipelines_spark/plans/``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from diffdataflowmlpipelines_spark.plans import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: tf-idf re-weighted token counts on sf0.001 documents."""
    return QUERIES["c9_tfidf"](spark, "/root/testdata/sf0.001")


# Round-6 rotation (VERDICT r5 #4): lead with the 53 registry queries
# NOT sampled in CORRECTNESS_r05 — s9/s10/s11 FIRST (the only three
# with zero driver rows ever), then the r1-r4 tail — so the driver's
# 50-query prefix covers the complement. The full registry passes the
# identical tools/check_oracle.py harness regardless of order;
# first-covered-round coverage is tabulated in STATUS.md.
_LEAD_THIS_ROUND = [
    "s9_quantized_topk",
    "s10_random_projection",
    "s11_pq_topk",
    "p3_projection_filter",
    "p4_explode_tokens",
    "p5_join_agg",
    "p6_antijoin",
    "p7_p8_union_distinct",
    "p9_p10_weighted_agg",
    "p13_consolidate",
    "c3_standard_scaler",
    "c3_standard_scaler_rounded",
    "c4_minmax_scaler",
    "c5_kbins",
    "c5_kbins_quantile",
    "c7_ordinal_encoder",
    "c6_onehot_encoder",
    "c8_token_counts",
    "c9_tfidf",
    "c10_hash_vectorizer_buckets",
    "c11_polynomial",
    "c12_dictionary",
    "d10_semantic_dedup",
    "s4_cluster_profile",
    "t12_gopher_filter",
    "t13_bigram_lm_score",
    "t14_oov_stats",
    "t16_hash_split",
    "t17_chunking",
    "t15_curation_v2",
    "d8_duplicated_spans",
    "d9_bloom_decontamination",
    "cm4_hll_distinct",
    "cm5_bottomk_quantiles",
    "m3_real_decode",
    "j3_asof_join",
    "a2_time_rollup",
    "w7_distinct_users_per_window",
    "w6_trending_tokens",
    "a3_grouped_percentiles",
    "p15_pivot_event_types",
    "cep1_event_funnel",
    "cep2_absence",
    "p17_region_rollout",
    "w8_time_since_last",
    "w9_ewma_value",
    "cep3_funnel_conversion",
    "v1_bpe_pair_counts",
    "v2_bpe_learn",
    "v3_bpe_encode",
    "t18_importance_resample",
    "t19_source_drift_kl",
    "t20_tokenizer_pipeline",
]


def _ordered(d: dict) -> dict:
    first = {k: d[k] for k in _LEAD_THIS_ROUND if k in d}
    return {**first, **{k: v for k, v in d.items() if k not in first}}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _ordered(dict(QUERIES))


def oracle_sql() -> dict[str, str]:
    return _ordered(dict(ORACLES))
