"""Unit coverage for the t18/t19 curation diagnostics (importance
resampling gate semantics; KL drift identities and null groups)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from diffdataflowmlpipelines_spark.functions.sampling import (
    quality_weighted_sample,
)
from diffdataflowmlpipelines_spark.functions.text import source_unigram_kl

DOCS = "doc_id string, text string, source string"


def test_quality_weighted_sample_gate_semantics(spark):
    df = spark.createDataFrame(
        [(f"d{i}",) for i in range(200)] + [(None,)], "doc_id string"
    )
    # weight 0 drops everything; weight >= scale keeps every hashable id
    assert quality_weighted_sample(df, "doc_id", F.lit(0)).count() == 0
    kept_all = quality_weighted_sample(df, "doc_id", F.lit(1000))
    assert kept_all.count() == 200  # NULL id has no identity -> dropped
    # NULL weight drops the row
    assert quality_weighted_sample(df, "doc_id", F.lit(None)).count() == 0
    # half weight keeps roughly half, and membership is deterministic
    half1 = {r["doc_id"] for r in quality_weighted_sample(df, "doc_id", F.lit(500)).collect()}
    half2 = {r["doc_id"] for r in quality_weighted_sample(df, "doc_id", F.lit(500)).collect()}
    assert half1 == half2 and 50 < len(half1) < 150
    # monotone: raising the weight never evicts a kept row
    at700 = {r["doc_id"] for r in quality_weighted_sample(df, "doc_id", F.lit(700)).collect()}
    assert half1 <= at700


def test_source_unigram_kl_zero_for_identical_distributions(spark):
    docs = spark.createDataFrame(
        [
            ("d1", "a b c", "s1"),
            ("d2", "a b c", "s2"),
            ("d3", "a b c a b c", "s2"),
        ],
        DOCS,
    )
    got = {r["source"]: r for r in source_unigram_kl(docs).collect()}
    assert got["s1"]["kl"] == 0.0 and got["s1"]["n_tokens"] == 3
    assert got["s2"]["kl"] == 0.0 and got["s2"]["n_tokens"] == 9


def test_source_unigram_kl_hand_computed(spark):
    # s1: {a: 2}, s2: {b: 2}; corpus: {a: 2, b: 2}
    # KL_s = 1.0 * ln(1.0 / 0.5) = ln 2 for both
    docs = spark.createDataFrame(
        [("d1", "a a", "s1"), ("d2", "b b", "s2")], DOCS
    )
    got = {r["source"]: r["kl"] for r in source_unigram_kl(docs).collect()}
    assert abs(got["s1"] - math.log(2)) < 1e-6
    assert abs(got["s2"] - math.log(2)) < 1e-6


def test_source_unigram_kl_null_group_is_a_group(spark):
    docs = spark.createDataFrame(
        [("d1", "a a", None), ("d2", "a b", "s2")], DOCS
    )
    got = {r["source"]: r for r in source_unigram_kl(docs).collect()}
    assert set(got) == {None, "s2"}
    assert got[None]["n_tokens"] == 2
    assert got[None]["kl"] > 0.0
