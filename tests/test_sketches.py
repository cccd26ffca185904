"""Count-min sketch: one-sided error invariant (estimate >= true count,
always), retraction correctness (additive signed cells), and streaming
windowed parity vs the batch recompute."""

from __future__ import annotations

from datetime import datetime, timedelta

import pandas as pd
import pytest
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


# --- HyperLogLog -------------------------------------------------------------


def _py_hll_registers(values, p=9):
    import hashlib

    m, wbits = 1 << p, 60 - p
    regs = {}
    for v in values:
        h = int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)
        bucket, w = h % m, h // m
        rho = wbits + 1 if w == 0 else wbits + 1 - w.bit_length()
        regs[bucket] = max(regs.get(bucket, 0), rho)
    return regs


def test_hll_registers_match_python_twin(spark):
    from diffdataflowmlpipelines_spark.functions.sketches import hll_registers

    vals = [f"v{i}" for i in range(3000)]
    df = spark.createDataFrame([(v,) for v in vals], ["t"])
    got = {
        r["bucket"]: r["rho"]
        for r in hll_registers(df, "t", p=9).collect()
    }
    assert got == _py_hll_registers(vals, p=9)


def test_hll_estimate_accuracy(spark):
    from diffdataflowmlpipelines_spark.functions.sketches import (
        hll_estimate,
        hll_registers,
    )

    # duplicates must not matter; relative error ~1.04/sqrt(512) = 4.6%
    for n in (500, 5000, 20000):
        vals = [f"item-{i % n}" for i in range(2 * n)]
        df = spark.createDataFrame([(v,) for v in vals], ["t"])
        est = hll_estimate(hll_registers(df, "t", p=9), p=9).collect()[0]["est"]
        assert abs(est - n) / n < 0.15, (n, est)


def test_hll_registers_merge_by_max(spark):
    from diffdataflowmlpipelines_spark.functions.sketches import hll_registers

    vals = [f"x{i}" for i in range(2000)]
    df_all = spark.createDataFrame([(v,) for v in vals], ["t"])
    half_a = spark.createDataFrame([(v,) for v in vals[:1200]], ["t"])
    half_b = spark.createDataFrame([(v,) for v in vals[900:]], ["t"])
    full = {
        r["bucket"]: r["rho"] for r in hll_registers(df_all, "t", p=9).collect()
    }
    merged = (
        hll_registers(half_a, "t", p=9)
        .unionByName(hll_registers(half_b, "t", p=9))
        .groupBy("bucket")
        .agg(F.max("rho").alias("rho"))
        .collect()
    )
    assert {r["bucket"]: r["rho"] for r in merged} == full


def test_hll_grouped_and_validation(spark):
    import pytest

    from diffdataflowmlpipelines_spark.functions.sketches import (
        hll_estimate,
        hll_registers,
    )

    rows = [("a", f"t{i}") for i in range(800)] + [("b", f"t{i}") for i in range(50)]
    df = spark.createDataFrame(rows, ["g", "t"])
    out = {
        r["g"]: r["est"]
        for r in hll_estimate(
            hll_registers(df, "t", ("g",), p=9), ("g",), p=9
        ).collect()
    }
    assert abs(out["a"] - 800) / 800 < 0.15
    assert abs(out["b"] - 50) / 50 < 0.15
    with pytest.raises(ValueError, match="p must"):
        hll_registers(df, "t", p=3)


def test_windowed_hll_streaming_parity(spark, tmp_path):
    from diffdataflowmlpipelines_spark.functions.sketches import windowed_hll

    pdf = gen_tokens_pdf(3000, seed=54, rows_per_second=500.0)
    src = EpochFileSource(spark, str(tmp_path / "src"), TOKENS_STREAM_SCHEMA)
    n = len(pdf)
    src.add_epoch(pdf.iloc[: n // 2])
    src.add_epoch(pdf.iloc[n // 2 :])

    sink = ExactlyOnceParquetSink(str(tmp_path / "out"), ["window_start", "bucket"])
    q = (
        windowed_hll(src.stream(), window="60 seconds", p=9)
        .writeStream.foreachBatch(sink.foreach_batch())
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got = {
        (r["window_start"], r["bucket"]): r["rho"]
        for r in sink.read_current(spark).collect()
    }
    batch = spark.createDataFrame(pdf, TOKENS_STREAM_SCHEMA)
    want = {
        (r["window_start"], r["bucket"]): r["rho"]
        for r in windowed_hll(batch, window="60 seconds", p=9, streaming=False).collect()
    }
    assert got == want


# --- bottom-k quantile sketch ------------------------------------------------


def test_bottomk_merge_equals_sketch_of_union(spark):
    from diffdataflowmlpipelines_spark.functions.sketches import (
        bottomk_quantile_sketch,
        merge_bottomk_sketches,
    )

    rows = [(i, f"g{i % 2}", float((i * 37) % 101)) for i in range(400)]
    df = spark.createDataFrame(rows, "id long, g string, value double")
    a = df.filter("id < 250")
    b = df.filter("id >= 250")
    sk_a = bottomk_quantile_sketch(a, "value", "id", ("g",), k=32)
    sk_b = bottomk_quantile_sketch(b, "value", "id", ("g",), k=32)
    merged = merge_bottomk_sketches(sk_a, sk_b, ("g",), k=32)
    direct = bottomk_quantile_sketch(df, "value", "id", ("g",), k=32)
    got = sorted(map(tuple, merged.collect()))
    want = sorted(map(tuple, direct.collect()))
    assert got == want  # semilattice: merge == sketch of concatenation
    assert len(want) == 64  # k per group


def test_bottomk_null_ids_dropped(spark):
    from diffdataflowmlpipelines_spark.functions.sketches import (
        bottomk_quantile_sketch,
    )

    # NULL ids must not occupy sample slots (Spark sorts NULLs first,
    # SQL sorts them last, and the streaming twin can't hash them)
    df = spark.createDataFrame(
        [(None, 1.0), (None, 2.0)] + [(i, float(i)) for i in range(10)],
        "id long, value double",
    )
    sk = bottomk_quantile_sketch(df, "value", "id", (), k=4)
    rows = sk.collect()
    assert len(rows) == 4
    assert all(r["h"] is not None for r in rows)


def test_bottomk_quantile_accuracy(spark):
    import numpy as np

    from diffdataflowmlpipelines_spark.functions.sketches import (
        bottomk_quantile_sketch,
        bottomk_quantiles,
    )

    n = 20_000
    rows = [(i, float((i * 7919) % n)) for i in range(n)]  # permutation of 0..n-1
    df = spark.createDataFrame(rows, "id long, value double").repartition(8)
    sk = bottomk_quantile_sketch(df, "value", "id", (), k=1024)
    est = bottomk_quantiles(sk, (), quantiles=(0.5, 0.9)).head()
    assert est["n_sample"] == 1024
    # rank error O(1/sqrt(k)) ~ 3% of the range at k=1024 (3 sigma)
    assert est["p50"] == pytest.approx(np.percentile([r[1] for r in rows], 50), abs=0.05 * n)
    assert est["p90"] == pytest.approx(np.percentile([r[1] for r in rows], 90), abs=0.05 * n)


def test_bottomk_small_group_is_exact(spark):
    from diffdataflowmlpipelines_spark.functions.sketches import (
        bottomk_quantile_sketch,
        bottomk_quantiles,
    )

    # group smaller than k: the sketch IS the group, quantiles exact
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(11)], "id long, value double"
    )
    sk = bottomk_quantile_sketch(df, "value", "id", (), k=64)
    row = bottomk_quantiles(sk, (), quantiles=(0.5, 0.9)).head()
    assert row["n_sample"] == 11
    assert row["p50"] == 5.0
    assert row["p90"] == 9.0
