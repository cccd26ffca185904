"""Streaming bottom-k quantile sketch: exact parity with the batch
sketch over any epoch split (semilattice fold), duplicate-delivery
idempotence, and checkpoint resume."""

from __future__ import annotations

import random

import pandas as pd
import pytest
from pyspark.sql import types as T

from diffdataflowmlpipelines_spark.functions.sketches import (
    bottomk_quantile_sketch,
    bottomk_quantiles,
)
from diffdataflowmlpipelines_spark.streaming.quantiles import (
    md5_hash60_py,
    streaming_bottomk_quantiles,
)
from diffdataflowmlpipelines_spark.streaming.sink import ExactlyOnceParquetSink
from diffdataflowmlpipelines_spark.streaming.sources import EpochFileSource

K = 32

EV_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType(), False),
        T.StructField("event_id", T.LongType(), False),
        T.StructField("value", T.DoubleType(), True),
    ]
)


def _events(seed, n=600, types=3):
    rnd = random.Random(seed)
    return [
        (f"t{i % types}", i, round(rnd.uniform(0, 1000), 3))
        for i in range(n)
    ]


def _batch_reference(spark, rows, schema=EV_SCHEMA):
    df = spark.createDataFrame(rows, schema)
    sk = bottomk_quantile_sketch(df, "value", "event_id", ("event_type",), k=K)
    ref = bottomk_quantiles(sk, ("event_type",), quantiles=(0.5, 0.9, 0.99))
    return {
        r["event_type"]: (r["n_sample"], r["p50"], r["p90"], r["p99"])
        for r in ref.collect()
    }


def _pdf(rows):
    return pd.DataFrame(rows, columns=["event_type", "event_id", "value"])


def _run(spark, tmp_path, epochs, restart_after=None, schema=EV_SCHEMA):
    epochs = [_pdf(ep) for ep in epochs]
    src = EpochFileSource(spark, str(tmp_path / "src"), schema)
    sink = ExactlyOnceParquetSink(str(tmp_path / "out"), ["group"])

    def start():
        return (
            streaming_bottomk_quantiles(src.stream(), k=K)
            .writeStream.foreachBatch(sink.foreach_batch())
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )

    if restart_after is None:
        for ep in epochs:
            src.add_epoch(ep)
        start().awaitTermination(300)
    else:
        for ep in epochs[:restart_after]:
            src.add_epoch(ep)
        start().awaitTermination(300)
        for ep in epochs[restart_after:]:
            src.add_epoch(ep)
        start().awaitTermination(300)
    return {
        r["group"]: (r["n_sample"], r["p50"], r["p90"], r["p99"])
        for r in sink.read_current(spark).collect()
    }


def _assert_close(got, want):
    assert set(got) == set(want)
    for g in want:
        assert got[g][0] == want[g][0], g
        for a, b in zip(got[g][1:], want[g][1:]):
            assert a == pytest.approx(b, abs=1e-6), g


def test_streaming_matches_batch_sketch(spark, tmp_path):
    rows = _events(1)
    epochs = [rows[:200], rows[200:350], rows[350:]]
    got = _run(spark, tmp_path, epochs)
    _assert_close(got, _batch_reference(spark, rows))


def test_out_of_order_split_same_result(spark, tmp_path):
    # bottom-k is order-insensitive: shuffled epoch assignment converges
    # to the identical sketch
    rows = _events(2, n=400)
    shuffled = list(rows)
    random.Random(7).shuffle(shuffled)
    got = _run(spark, tmp_path, [shuffled[:100], shuffled[100:]])
    _assert_close(got, _batch_reference(spark, rows))


def test_duplicate_delivery_is_idempotent(spark, tmp_path):
    rows = _events(3, n=300)
    # epoch 2 redelivers all of epoch 1 plus new rows (at-least-once)
    got = _run(spark, tmp_path, [rows[:150], rows[:150] + rows[150:]])
    _assert_close(got, _batch_reference(spark, rows))


def test_checkpoint_resume(spark, tmp_path):
    rows = _events(4, n=450)
    epochs = [rows[:150], rows[150:300], rows[300:]]
    got = _run(spark, tmp_path, epochs, restart_after=2)
    _assert_close(got, _batch_reference(spark, rows))


def test_null_values_hold_slots_but_not_quantiles(spark, tmp_path):
    # ids chosen so nulls land in the sample; n_sample counts them,
    # quantiles ignore them (matching batch percentile semantics)
    rows = [("t0", i, None if i % 5 == 0 else float(i)) for i in range(100)]
    got = _run(spark, tmp_path, [rows])
    want = _batch_reference(spark, rows)
    _assert_close(got, want)
    assert got["t0"][0] == K


def test_string_ids_sample_identically_to_batch(spark, tmp_path):
    """Review r4d: the streaming twin cast ids to LONG, so '0123'
    hashed as md5('123') (a silently different bottom-k sample than the
    batch sketch's md5(cast(id as string))) and a non-numeric id
    aborted the query under Spark 4 ANSI. Ids now flow as strings —
    leading-zero and alphanumeric ids must match the batch sketch
    exactly."""
    schema = T.StructType(
        [
            T.StructField("event_type", T.StringType(), False),
            T.StructField("event_id", T.StringType(), False),
            T.StructField("value", T.DoubleType(), True),
        ]
    )
    rows = [("t0", f"{i:04d}", float(i * 7 % 101)) for i in range(120)]
    rows += [("t1", f"a{i}", float(i)) for i in range(60)]
    got = _run(spark, tmp_path, [rows[:90], rows[90:]], schema=schema)
    _assert_close(got, _batch_reference(spark, rows, schema=schema))


def test_py_hash_matches_spark_hash(spark):
    from pyspark.sql import functions as F

    from diffdataflowmlpipelines_spark.functions.dedup import md5_hash60

    ids = [0, 1, 42, 10**12, 987654321]
    df = spark.createDataFrame([(i,) for i in ids], "id long")
    got = [
        r["h"]
        for r in df.select(md5_hash60(F.col("id").cast("string")).alias("h"))
        .orderBy("id")
        .collect()
    ]
    assert got == [md5_hash60_py(str(i)) for i in sorted(ids)]
