"""bucketed_range_join: keyless interval join via bucket equi-join.

Pinned properties: exact multiplicity-1 parity with the naive theta
join (randomized), inclusive bounds, pre-1970 correctness (floor vs
truncate division), the no-nested-loop plan shape, and the guard
errors."""

from __future__ import annotations

import datetime as dt
import random

import pytest
from pyspark.sql import functions as F

from diffdataflowmlpipelines_spark.operators.rangejoin import (
    bucketed_range_join,
)


def _ts(s: float) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


def _frames(spark, lsecs, rsecs):
    left = spark.createDataFrame(
        [(i, _ts(s)) for i, s in enumerate(lsecs)], "lid long, lt timestamp"
    )
    right = spark.createDataFrame(
        [(i, _ts(s)) for i, s in enumerate(rsecs)], "rid long, rt timestamp"
    )
    return left, right


def test_closed_form_inclusive_bounds(spark):
    # window [lt-10, lt]: right rows at EXACTLY both ends must match
    left, right = _frames(spark, [100.0], [89.999999, 90.0, 95.0, 100.0, 100.000001])
    out = bucketed_range_join(left, right, "lt", "rt", lower=-10, upper=0)
    assert sorted(r.rid for r in out.collect()) == [1, 2, 3]


def test_randomized_parity_with_naive_theta_join(spark):
    rng = random.Random(7)
    lsecs = [rng.uniform(0, 500) for _ in range(120)]
    rsecs = [rng.uniform(0, 500) for _ in range(150)]
    left, right = _frames(spark, lsecs, rsecs)
    lo, hi = -7.5, 3.25
    out = bucketed_range_join(left, right, "lt", "rt", lower=lo, upper=hi)
    got = sorted((r.lid, r.rid) for r in out.collect())
    naive = left.crossJoin(right).filter(
        F.unix_micros(F.col("rt")).between(
            F.unix_micros(F.col("lt")) + int(lo * 1_000_000),
            F.unix_micros(F.col("lt")) + int(hi * 1_000_000),
        )
    )
    want = sorted((r.lid, r.rid) for r in naive.collect())
    assert got == want
    # multiplicity exactly 1 per qualifying pair (no dedup step exists)
    assert len(got) == len(set(got))


def test_pre_1970_timestamps(spark):
    # floor-division (not truncate-toward-zero) on negative micros
    old = dt.datetime(1969, 12, 31, 23, 59, 50)
    left = spark.createDataFrame([(0, old)], "lid long, lt timestamp")
    right = spark.createDataFrame(
        [(0, old - dt.timedelta(seconds=5)), (1, old + dt.timedelta(seconds=1))],
        "rid long, rt timestamp",
    )
    out = bucketed_range_join(left, right, "lt", "rt", lower=-10, upper=0)
    assert sorted(r.rid for r in out.collect()) == [0]


def test_plan_has_no_nested_loop_join(spark):
    left, right = _frames(spark, [1.0, 2.0], [1.5])
    out = bucketed_range_join(left, right, "lt", "rt", lower=-1, upper=1)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoopJoin" not in plan and "CartesianProduct" not in plan


def test_guards(spark):
    left, right = _frames(spark, [1.0], [1.0])
    with pytest.raises(ValueError, match="lower"):
        bucketed_range_join(left, right, "lt", "rt", lower=1, upper=0)
    with pytest.raises(ValueError, match="collision"):
        bucketed_range_join(
            left, left.withColumnRenamed("lid", "x"), "lt", "lt", lower=0, upper=1
        )
