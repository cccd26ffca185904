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


# Round-5 rotation: the 39 registry queries NOT sampled in
# CORRECTNESS_r04 (the r1-r3-covered tail) lead the ordering, so every
# query regains a POST-round-4-fixes driver row — the complement of the
# r4 prefix. The full registry passes the identical
# tools/check_oracle.py harness regardless of order; per-query
# first-covered-round coverage is tabulated in STATUS.md
# ("driver coverage").
_LEAD_THIS_ROUND = [
    "c16_multi_column_pipeline",
    "w1_tumbling_window",
    "w2_sliding_window",
    "w3_session_window",
    "j1_interval_join",
    "d1_exact_dedup",
    "d2_minhash_signatures",
    "d3_jaccard_pairs",
    "d4_simhash",
    "s1_cosine_topk",
    "s3_ivf_ann_topk",
    "s2_lsh_ann_topk",
    "t1_quality_features",
    "t2_language_id",
    "t3_fingerprint",
    "d7_near_dup_candidates",
    "cm1_count_min_sketch",
    "cm3_heavy_hitters",
    "cm2_count_min_estimate",
    "m1_media_features",
    "m2_frame_sample_plan",
    "t5_decontamination",
    "t6_repetition_stats",
    "t7_stratified_sample",
    "t8_sequence_packing",
    "t9_pii_redaction",
    "t10_domain_mixture",
    "t11_corpus_pipeline",
    "c2_pipeline_chain",
    "c8_count_vectorizer_dense",
    "c14_function_encoder",
    "p14_sharded_arrow_map",
    "t4_token_stats",
    "d5_embedding_near_dups",
    "d6_dup_clusters",
    "w4_topk_per_user",
    "w5_running_sum",
    "a1_rollup",
    "j2_join_then_window",
    # round-5 additions (never driver-covered): lead so the 50-prefix
    # samples them alongside the rotated 39
    "t21_pmi_collocations",
    "t22_source_ngram_overlap",
    "s5_embedding_dim_stats",
    "a4_cube",
    "w10_windowed_percentiles",
    "j4_bucketed_range_join",
    "t23_ngram_novelty",
    "s7_knn_graph",
    "t24_priority_sample",
    "s8_knn_components",
    "d11_containment_pairs",
]


def _ordered(d: dict) -> dict:
    first = {k: d[k] for k in _LEAD_THIS_ROUND if k in d}
    return {**first, **{k: v for k, v in d.items() if k not in first}}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _ordered(dict(QUERIES))


def oracle_sql() -> dict[str, str]:
    return _ordered(dict(ORACLES))
