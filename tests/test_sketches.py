"""Count-min sketch: one-sided error invariant (estimate >= true count,
always), retraction correctness (additive signed cells), and streaming
windowed parity vs the batch recompute."""

from __future__ import annotations

from datetime import datetime, timedelta

import pandas as pd
from pyspark.sql import functions as F

from diffdataflowmlpipelines_spark.functions.sketches import (
    count_min_estimate,
    count_min_sketch,
    windowed_count_min,
)
from diffdataflowmlpipelines_spark.sources.fixtures import (
    TOKENS_STREAM_SCHEMA,
    gen_tokens_pdf,
    tokens_df,
)
from diffdataflowmlpipelines_spark.streaming.sink import ExactlyOnceParquetSink
from diffdataflowmlpipelines_spark.streaming.sources import EpochFileSource


def test_estimate_dominates_true_count(spark):
    from diffdataflowmlpipelines_spark.operators.collection import DIFF, with_diff

    df = tokens_df(spark, 2000, seed=51)
    sk = count_min_sketch(df, "tokens", depth=4, width=128)
    # diff-aware truth: the fixture re-emits ~0.5% of rows with diff=-1
    # and the sketch nets them, so the oracle must net them too
    ex = with_diff(df).select(F.explode("tokens").alias("token"), DIFF)
    true = ex.groupBy("token").agg(F.sum(DIFF).alias("tf")).filter("tf > 0")
    est = count_min_estimate(sk, ex, "token", depth=4, width=128)
    joined = est.join(true, "token")
    assert joined.count() > 0
    assert joined.filter(F.col("est") < F.col("tf")).count() == 0
    # CMS error bound: E[overestimate] per hash row is N/width, the min
    # over depth rows is no worse — assert the empirical mean stays
    # within a small factor of that
    n_total = ex.count()
    stats = joined.agg(
        F.avg(F.col("est") - F.col("tf")).alias("mean_over")
    ).first()
    assert stats["mean_over"] <= 2.0 * n_total / 128


def test_sketch_retraction_cancels(spark):
    df = tokens_df(spark, 500, seed=52).withColumn("diff", F.lit(1).cast("long"))
    neg = df.withColumn("diff", F.lit(-1).cast("long"))
    both = df.unionByName(neg)
    sk = count_min_sketch(both, "tokens", depth=4, width=64)
    assert sk.count() == 0  # every cell nets to zero and is dropped


def test_windowed_count_min_streaming_parity(spark, tmp_path):
    pdf = gen_tokens_pdf(3000, seed=53, rows_per_second=500.0)
    src = EpochFileSource(spark, str(tmp_path / "src"), TOKENS_STREAM_SCHEMA)
    n = len(pdf)
    src.add_epoch(pdf.iloc[: n // 2])
    src.add_epoch(pdf.iloc[n // 2 :])

    sink = ExactlyOnceParquetSink(
        str(tmp_path / "out"), ["window_start", "depth_j", "bucket"]
    )
    q = (
        windowed_count_min(src.stream(), window="60 seconds", depth=4, width=64)
        .writeStream.foreachBatch(sink.foreach_batch())
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got = {
        (r["window_start"], r["depth_j"], r["bucket"]): r["count"]
        for r in sink.read_current(spark).collect()
        if r["count"] != 0
    }
    batch = spark.createDataFrame(pdf, TOKENS_STREAM_SCHEMA)
    want = {
        (r["window_start"], r["depth_j"], r["bucket"]): r["count"]
        for r in windowed_count_min(
            batch, window="60 seconds", depth=4, width=64, streaming=False
        ).collect()
        if r["count"] != 0
    }
    assert got == want
