"""Incremental scaler statistics: retraction-correct running
(mean, var, min, max) per key with rounding-gated update suppression
(reference standard_scaler.rs rounding optimization)."""

from __future__ import annotations

from datetime import datetime, timedelta

import pandas as pd
import pytest
from pyspark.sql import types as T

from diffdataflowmlpipelines_spark.streaming.sink import ExactlyOnceParquetSink
from diffdataflowmlpipelines_spark.streaming.sources import EpochFileSource
from diffdataflowmlpipelines_spark.streaming.stats import incremental_scaler_stats

SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType(), False),
        T.StructField("x", T.DoubleType(), False),
        T.StructField("diff", T.LongType(), False),
        T.StructField("event_time", T.TimestampType(), False),
    ]
)

T0 = datetime(2024, 1, 1)


def ep(i, rows):
    return pd.DataFrame(
        {
            "key": [k for k, *_ in rows],
            "x": [x for _, x, *_ in rows],
            "diff": [r[2] if len(r) > 2 else 1 for r in rows],
            "event_time": [T0 + timedelta(seconds=i * 10 + j) for j in range(len(rows))],
        }
    )


def run(spark, tmp_path, epochs, **kw):
    src = EpochFileSource(spark, str(tmp_path / "src"), SCHEMA)
    sink = ExactlyOnceParquetSink(str(tmp_path / "out"), ["key"])
    for e in epochs:
        src.add_epoch(e)
    q = (
        incremental_scaler_stats(src.stream(), "key", "x", **kw)
        .writeStream.foreachBatch(sink.foreach_batch())
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return sink


def test_stats_parity_and_retraction(spark, tmp_path):
    # epoch 0: values 0..9 on key 'a'; epoch 1: retract the 9
    epochs = [
        ep(0, [("a", float(i)) for i in range(10)]),
        ep(1, [("a", 9.0, -1)]),
    ]
    sink = run(spark, tmp_path, epochs)
    cur = {r["key"]: r for r in sink.read_current(spark).collect()}
    a = cur["a"]
    mean = sum(range(9)) / 9.0
    var = sum((i - mean) ** 2 for i in range(9)) / 9.0
    assert a["n"] == 9
    assert a["mean"] == pytest.approx(mean)
    assert a["var_pop"] == pytest.approx(var)
    assert (a["min"], a["max"]) == (0.0, 8.0)  # max retraction handled exactly


def test_stats_rounding_suppression(spark, tmp_path):
    # with rounding (-2, 0): epoch 1 adds a value that barely moves the
    # stats -> suppressed (no new emission); epoch 2 moves them past a
    # boundary -> emitted.
    # tight distribution: mean 499.5, var 0.25 (rounds to 0 at 10^0);
    # adding the exact mean moves var by var/n ~ 0.00025 and mean by 0 —
    # both inside the rounding deadband -> suppressed.
    epochs = [
        ep(0, [("a", 499.0 if i % 2 else 500.0) for i in range(1000)]),
        ep(1, [("a", 499.5)]),  # inside the deadband
        ep(2, [("a", 1e6)]),    # big jump
    ]
    sink = run(spark, tmp_path, epochs, round_to=(-2, 0))
    per_epoch = sink.read_all(spark).select("epoch", "key", "mean").collect()
    epochs_emitting = sorted({r["epoch"] for r in per_epoch})
    # epoch 0 emits, epoch 1 suppressed, epoch 2 emits
    assert 0 in epochs_emitting
    assert 1 not in epochs_emitting
    assert any(e >= 2 for e in epochs_emitting)


def test_stats_multi_key_isolation(spark, tmp_path):
    epochs = [ep(0, [("a", 1.0), ("b", 100.0), ("a", 3.0), ("b", 300.0)])]
    sink = run(spark, tmp_path, epochs)
    cur = {r["key"]: r for r in sink.read_current(spark).collect()}
    assert cur["a"]["mean"] == pytest.approx(2.0)
    assert cur["b"]["mean"] == pytest.approx(200.0)
    assert cur["a"]["n"] == 2 and cur["b"]["n"] == 2


def test_stats_full_retraction_emits_tombstone(spark, tmp_path):
    """Retracting a key's last live row must emit an n=0 row so an
    upsert consumer retracts the stale statistics (the old gate
    suppressed any emission at n<=0)."""
    import math

    epochs = [
        ep(0, [("a", 10.0)]),
        ep(1, [("a", 10.0, -1)]),  # key fully retracted
    ]
    sink = run(spark, tmp_path, epochs)
    (r,) = sink.read_current(spark).collect()
    assert r["n"] == 0
    # "no statistic": NaN in the emission, read back as NaN or NULL
    assert r["mean"] is None or math.isnan(r["mean"])


def test_stats_null_values_ignored(spark, tmp_path):
    """A NULL value is not an observation: the old code counted its
    diff in n while pandas skipna dropped it from the sums, silently
    corrupting the mean."""
    nullable = T.StructType(
        [
            T.StructField("key", T.StringType(), False),
            T.StructField("x", T.DoubleType(), True),
            T.StructField("diff", T.LongType(), False),
            T.StructField("event_time", T.TimestampType(), False),
        ]
    )
    pdf = pd.DataFrame(
        {
            "key": ["a", "a"],
            "x": [None, 10.0],
            "diff": [1, 1],
            "event_time": [T0, T0 + timedelta(seconds=1)],
        }
    )
    src = EpochFileSource(spark, str(tmp_path / "src"), nullable)
    sink = ExactlyOnceParquetSink(str(tmp_path / "out"), ["key"])
    src.add_epoch(pdf)
    q = (
        incremental_scaler_stats(src.stream(), "key", "x")
        .writeStream.foreachBatch(sink.foreach_batch())
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    (r,) = sink.read_current(spark).collect()
    assert (r["n"], r["mean"], r["var_pop"]) == (1, 10.0, 0.0)


def test_stats_null_key_stays_null(spark, tmp_path):
    """A NULL group key must come back as a NULL key, not the phantom
    string "None" (the old emission str()-ed the key; the batch groupBy
    twin keeps the null group)."""
    nullable = T.StructType(
        [
            T.StructField("key", T.StringType(), True),
            T.StructField("x", T.DoubleType(), True),
            T.StructField("diff", T.LongType(), False),
            T.StructField("event_time", T.TimestampType(), False),
        ]
    )
    pdf = pd.DataFrame(
        {
            "key": [None, "a"],
            "x": [4.0, 10.0],
            "diff": [1, 1],
            "event_time": [T0, T0 + timedelta(seconds=1)],
        }
    )
    src = EpochFileSource(spark, str(tmp_path / "src"), nullable)
    sink = ExactlyOnceParquetSink(str(tmp_path / "out"), ["key"])
    src.add_epoch(pdf)
    q = (
        incremental_scaler_stats(src.stream(), "key", "x")
        .writeStream.foreachBatch(sink.foreach_batch())
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    rows = {r["key"]: r for r in sink.read_current(spark).collect()}
    assert set(rows) == {None, "a"}  # no "None" string key
    assert rows[None]["mean"] == pytest.approx(4.0)
    assert rows["a"]["mean"] == pytest.approx(10.0)
