"""Regression tests for the round-4d operators/sources review pass
(findings in encoders NULL/zero-variance handling, skew-tool contracts,
as-of tie determinism, TableIO path consistency, fixture lateness)."""

from __future__ import annotations

import math
from datetime import datetime

import pandas as pd
import pytest
from pyspark.sql import functions as F


def _col_df(spark, vals):
    return spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "id long, x double"
    )


def test_minmax_null_input_stays_null(spark):
    """Review r4d: the range-0 coalesce also swallowed NULL inputs into
    0.0 — the column MINIMUM. NULL must propagate (StandardScaler and
    the DuckDB oracle semantics); the constant-column 0.0 mapping stays
    for non-null inputs."""
    from diffdataflowmlpipelines_spark.operators.encoders import MinMaxScaler

    df = _col_df(spark, [1.0, 3.0, None])
    enc = MinMaxScaler().fit(df, "x")
    got = {r["id"]: r["y"] for r in enc.transform(df, "x", "y").collect()}
    assert got[0] == 0.0 and got[1] == 1.0 and got[2] is None
    # constant column: non-null -> 0.0, NULL still NULL
    cdf = _col_df(spark, [5.0, 5.0, None])
    enc2 = MinMaxScaler().fit(cdf, "x")
    got2 = {r["id"]: r["y"] for r in enc2.transform(cdf, "x", "y").collect()}
    assert got2[0] == 0.0 and got2[1] == 0.0 and got2[2] is None


def test_kbins_uniform_null_input_stays_null(spark):
    from diffdataflowmlpipelines_spark.operators.encoders import (
        KBinsDiscretizer,
    )

    df = _col_df(spark, [0.0, 5.0, 10.0, None])
    enc = KBinsDiscretizer(2, strategy="uniform").fit(df, "x")
    got = {r["id"]: r["y"] for r in enc.transform(df, "x", "y").collect()}
    assert got[0] == 0.0 and got[2] == 1.0 and got[3] is None
    # quantile strategy already propagated NULL — pin the agreement
    encq = KBinsDiscretizer(2, strategy="quantile").fit(df, "x")
    gotq = {r["id"]: r["y"] for r in encq.transform(df, "x", "y").collect()}
    assert gotq[3] is None


def test_standard_scaler_zero_variance_ieee_not_crash(spark):
    """Review r4d: Spark 4 ANSI `/` throws DIVIDE_BY_ZERO on doubles
    too, so a constant column (or round_to rounding the variance to 0)
    crashed transform mid-query. The plan-time branch now emits the
    reference's IEEE f64 result: +/-inf by numerator sign, NaN at
    x == mean, NULL stays NULL."""
    from diffdataflowmlpipelines_spark.operators.encoders import (
        StandardScaler,
    )

    df = _col_df(spark, [2.0, 2.0, None])
    enc = StandardScaler().fit(df, "x")
    assert enc.var_ == 0.0
    got = {r["id"]: r["y"] for r in enc.transform(df, "x", "y").collect()}
    assert math.isnan(got[0]) and math.isnan(got[1]) and got[2] is None
    # rounded-to-zero variance on a NON-constant column: signed inf by
    # the numerator's sign against the (rounded) mean, NaN at equality
    df2 = _col_df(spark, [1.8, 2.0, 2.2])
    enc2 = StandardScaler(round_to=(0, 0)).fit(df2, "x")
    assert enc2.var_ == 0.0 and enc2.mean_ == 2.0
    got2 = {r["id"]: r["y"] for r in enc2.transform(df2, "x", "y").collect()}
    assert got2[0] == float("-inf")
    assert math.isnan(got2[1])
    assert got2[2] == float("inf")


def test_salted_broadcast_join_rejects_right_preserving(spark):
    """Review r4d: the small side is replicated across salts, so a
    right/full join would emit each unmatched small row n_salts times —
    reject instead of silently duplicating."""
    from diffdataflowmlpipelines_spark.operators.skew import (
        salted_broadcast_join,
    )

    big = spark.createDataFrame([("k1", 1)], "k string, v int")
    small = spark.createDataFrame([("k2", 9)], "k string, w int")
    with pytest.raises(ValueError, match="big-side-preserving"):
        salted_broadcast_join(big, small, on=["k"], how="full")
    # the supported shapes still work
    got = salted_broadcast_join(big, small, on=["k"], how="left").collect()
    assert len(got) == 1 and got[0]["w"] is None


def test_detect_hot_keys_ignores_null_keys(spark):
    """Review r4d: a NULL hot key would be returned but can never match
    F.col(key).isin(...) downstream — excluded up front now."""
    from diffdataflowmlpipelines_spark.operators.skew import detect_hot_keys

    rows = [(None,)] * 500 + [("hot",)] * 400 + [
        (f"c{i}",) for i in range(100)
    ]
    df = spark.createDataFrame(rows, "k string")
    hot = detect_hot_keys(df, "k", min_share=0.1, skew_factor=2.0)
    assert hot == ["hot"]


def test_fit_dictionary_first_seen_requires_row_order(spark):
    from diffdataflowmlpipelines_spark.operators.encoders import (
        fit_dictionary,
    )

    df = spark.createDataFrame([("a",), ("b",)], "w string")
    with pytest.raises(ValueError, match="__row_order"):
        fit_dictionary(df, "w", order="first_seen")


def test_tableio_stream_reads_what_read_reads(spark, tmp_path):
    """Review r4d: read_stream watched {root}/{table} while read() used
    {root}/{table}.parquet — batch and stream reads of one table name
    must see the same files."""
    from diffdataflowmlpipelines_spark.sources.tableio import ParquetTableIO

    io = ParquetTableIO(str(tmp_path))
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string")
    df.write.parquet(io.path("t"))
    assert io.read(spark, "t").count() == 2
    q = (
        io.read_stream(spark, "t", df.schema)
        .writeStream.format("memory")
        .queryName("tio_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert spark.sql("select * from tio_stream").count() == 2


def test_asof_join_tie_on_right_time_is_deterministic(spark):
    """Review r4d: several right rows sharing (keys, right_time) left
    last() to pick by shuffle order. The payload struct is now the
    tie-break: the greatest (field-wise) payload wins, every run."""
    from diffdataflowmlpipelines_spark.operators.asof import asof_join

    t = datetime(2024, 1, 1, 0, 0, 0)
    left = spark.createDataFrame(
        [("u1", datetime(2024, 1, 1, 0, 1))], "user_id string, lt timestamp"
    )
    right = spark.createDataFrame(
        [("u1", t, 10.0), ("u1", t, 30.0), ("u1", t, 20.0)],
        "user_id string, rt timestamp, val double",
    ).repartition(4)
    for _ in range(3):
        got = asof_join(
            left, right, ["user_id"], "lt", "rt", ["val"]
        ).collect()
        assert len(got) == 1 and got[0]["val"] == 30.0


def test_fixture_preserves_arrival_order_lateness(spark):
    """Review r4d: the fixture's global event-time sort (applied when
    retractions were generated) erased the late rows' out-of-orderness.
    Arrival order is row order now — late rows really arrive late."""
    from diffdataflowmlpipelines_spark.sources.fixtures import gen_tokens_pdf

    pdf = gen_tokens_pdf(
        2000, seed=9, late_frac=0.05, retract_frac=0.01, rows_per_second=100.0
    )
    ts = pd.to_datetime(pdf["event_time"]).astype("int64").to_numpy()
    assert (ts[1:] < ts[:-1]).sum() > 0, "no out-of-order arrivals"
    # retractions still arrive after their inserts (appended at the end)
    d = pdf["diff"].to_numpy()
    first_retract = int((d < 0).argmax())
    assert (d[:first_retract] > 0).all() and (d[first_retract:] < 0).all()
