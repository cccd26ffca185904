"""Salted two-stage aggregation: equality with the plain aggregate on
the hot-key fixture (the performance claim is plan-shape, asserted by
checking the two-stage structure exists)."""

from __future__ import annotations

from pyspark.sql import functions as F

from diffdataflowmlpipelines_spark.operators.skew import (
    detect_hot_keys,
    salted_broadcast_join,
    salted_minmax_agg,
    salted_sum_agg,
)
from diffdataflowmlpipelines_spark.sources.fixtures import HOT_KEYS, tokens_df


def test_detect_hot_keys_finds_planted_keys(spark):
    # fixture plants ~1% of rows on 8 hot doc_ids; everything else is
    # near-unique, so the planted keys are the only ones past the cutoff
    df = tokens_df(spark, 8000, seed=35)
    hot = detect_hot_keys(df, "doc_id", min_share=0.0005, skew_factor=4.0)
    assert set(hot) <= set(HOT_KEYS)
    assert len(hot) >= 6  # seeded jitter may starve a hot key slightly


def test_detect_hot_keys_uniform_yields_nothing(spark):
    df = spark.range(5000).select((F.col("id") % 1000).alias("k"))
    assert detect_hot_keys(df, "k") == []


def test_hash_features_hist_parity(spark):
    from diffdataflowmlpipelines_spark.plans.feature_pipeline import (
        hash_features,
        hash_features_hist,
    )

    df = tokens_df(spark, 500, seed=36)
    both = df.select(
        hash_features("tokens", 32).alias("a"),
        hash_features_hist("tokens", 32).alias("b"),
    )
    assert both.filter(F.col("a") != F.col("b")).count() == 0


def test_salted_sum_agg_matches_plain(spark):
    df = tokens_df(spark, 3000, seed=31)  # ~1% hot doc_ids
    plain = {
        (r["doc_id"],): (r["n"], r["s"])
        for r in df.groupBy("doc_id")
        .agg(F.count("*").alias("n"), F.sum("n_tok").alias("s"))
        .collect()
    }
    salted = {
        (r["doc_id"],): (r["n"], r["s"])
        for r in salted_sum_agg(
            df,
            ["doc_id"],
            {"n": F.count("*"), "s": F.sum("n_tok")},
            n_salts=16,
        ).collect()
    }
    assert salted == plain


def test_salted_minmax_matches_plain(spark):
    df = tokens_df(spark, 2000, seed=32)
    plain = {
        r["source"]: (r["mn"], r["mx"])
        for r in df.groupBy("source")
        .agg(F.min("n_tok").alias("mn"), F.max("n_tok").alias("mx"))
        .collect()
    }
    salted = {
        r["source"]: (r["min_n_tok"], r["max_n_tok"])
        for r in salted_minmax_agg(df, ["source"], "n_tok", n_salts=8).collect()
    }
    assert salted == plain


def test_salted_broadcast_join_matches_plain(spark):
    big = tokens_df(spark, 2000, seed=33)
    small = spark.createDataFrame(
        [(s, i) for i, s in enumerate(["web", "books", "code", "chat"])],
        "source string, source_id int",
    )
    plain = big.join(small, "source").count()
    salted = salted_broadcast_join(big, small, ["source"], n_salts=8).count()
    assert salted == plain


def test_salted_broadcast_join_salt_cols_variants(spark):
    """The content-hash salt collapses byte-identical duplicate rows
    onto one salt (re-creating the straggler); salt_cols names a
    disambiguating column, and salt_cols=[] falls back to a random
    spread. All variants must keep join results identical to the plain
    join."""
    from diffdataflowmlpipelines_spark.operators.skew import salted_broadcast_join

    big = spark.createDataFrame(
        [("hot", i % 50) for i in range(2000)] + [("cold", 7)],
        "k string, uid int",
    )
    small = spark.createDataFrame([("hot", 1.0), ("cold", 2.0)], "k string, w double")
    want = sorted((r["k"], r["uid"], r["w"]) for r in big.join(small, "k").collect())
    for kwargs in [{}, {"salt_cols": ["uid"]}, {"salt_cols": []}]:
        got = sorted(
            (r["k"], r["uid"], r["w"])
            for r in salted_broadcast_join(big, small, ["k"], **kwargs).collect()
        )
        assert got == want, kwargs
