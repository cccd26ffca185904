"""Round-5 scale-path guards and strategy flags (verdict r4 #6/#7):

* CountVectorizer / TfidfTransformer dense forms are bounded-vocab by
  CONTRACT — over the cap they must raise with a pointer at the
  exploded-pair scale path instead of collecting an unbounded statistic.
* grouped_percentiles(mode="approx") is the coded 100 TB swap for a3's
  exact ordered statistic — accuracy-tested against exact here.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from diffdataflowmlpipelines_spark.functions.sketches import (
    grouped_percentiles,
)
from diffdataflowmlpipelines_spark.functions.vectorizers import (
    CountVectorizer,
    TfidfTransformer,
)


def _docs(spark, n_tokens: int):
    return spark.createDataFrame(
        [(i, [f"tok{j}" for j in range(n_tokens)]) for i in range(3)],
        "doc_id long, tokens array<string>",
    )


def test_count_vectorizer_raises_over_dense_cap(spark):
    df = _docs(spark, 10)
    with pytest.raises(ValueError, match="dense-path cap"):
        CountVectorizer(max_vocab=4).fit(df, "tokens")
    # under the cap, and with the cap disabled, fit succeeds
    assert CountVectorizer(max_vocab=16).fit(df, "tokens").vec_len_ >= 10
    assert CountVectorizer(max_vocab=None).fit(df, "tokens").vec_len_ >= 10


def test_tfidf_transformer_raises_over_dense_cap(spark):
    vecs = spark.createDataFrame(
        [(i, [float(i + j) for j in range(6)]) for i in range(3)],
        "doc_id long, vec array<double>",
    )
    with pytest.raises(ValueError, match="dense-path cap"):
        TfidfTransformer(max_vocab=4).fit(vecs, "vec")
    assert TfidfTransformer(max_vocab=8).fit(vecs, "vec").df_ is not None


def test_grouped_percentiles_approx_within_rank_error(spark):
    # 20k deterministic values per group; GK sketch with
    # accuracy=10000 -> rank error <= 1/10000, so |approx - exact| is
    # bounded by the local value gap around the target rank.
    df = (
        spark.range(40_000)
        .select(
            (F.col("id") % 2).cast("string").alias("g"),
            # deterministic, non-uniform spacing (quadratic)
            ((F.col("id") / 2).cast("double") ** 2 / 1e4).alias("value"),
        )
    )
    ps = [(0.5, "p50"), (0.9, "p90"), (0.99, "p99")]
    exact = {
        r["g"]: r
        for r in grouped_percentiles(df, "g", "value", ps, mode="exact").collect()
    }
    approx = {
        r["g"]: r
        for r in grouped_percentiles(
            df, "g", "value", ps, mode="approx", accuracy=10000
        ).collect()
    }
    assert set(exact) == {"0", "1"} == set(approx)
    for g in exact:
        assert exact[g]["n"] == approx[g]["n"] == 20_000
        rng = 20_000**2 / 1e4
        for _, name in ps:
            assert abs(exact[g][name] - approx[g][name]) <= rng * 0.005, (
                g,
                name,
                exact[g][name],
                approx[g][name],
            )


def test_grouped_percentiles_rejects_unknown_mode(spark):
    df = spark.range(4).select(
        F.lit("g").alias("g"), F.col("id").cast("double").alias("value")
    )
    with pytest.raises(ValueError, match="mode"):
        grouped_percentiles(df, "g", "value", [(0.5, "p50")], mode="sketchy")
