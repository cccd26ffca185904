"""As-of join closed-form semantics: inclusive tie, latest-prior
selection, inner vs left behavior, and the no-range-join plan shape."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from diffdataflowmlpipelines_spark.operators.asof import asof_join

T = lambda s: datetime(2024, 1, 1, 0, 0, s)  # noqa: E731


def _dfs(spark):
    left = spark.createDataFrame(
        [
            (1, "u", T(10)),   # after r@5 -> matches 5
            (2, "u", T(20)),   # exact tie with r@20 -> inclusive match
            (3, "u", T(3)),    # before any right row -> unmatched
            (4, "v", T(50)),   # other key, after r@40
        ],
        "lid long, k string, lt timestamp",
    )
    right = spark.createDataFrame(
        [
            ("u", T(5), 100.0),
            ("u", T(20), 200.0),
            ("u", T(30), 300.0),  # later than every left row -> never used
            ("v", T(40), 400.0),
        ],
        "k string, rt timestamp, val double",
    )
    return left, right


def test_asof_inner_semantics(spark):
    left, right = _dfs(spark)
    out = asof_join(left, right, ["k"], "lt", "rt", ["val"], how="inner")
    got = {r["lid"]: (r["val"], r["__asof_time"]) for r in out.collect()}
    assert got == {
        1: (100.0, T(5)),
        2: (200.0, T(20)),  # inclusive at equal timestamps
        4: (400.0, T(40)),
    }


def test_asof_left_keeps_unmatched(spark):
    left, right = _dfs(spark)
    out = asof_join(left, right, ["k"], "lt", "rt", ["val"], how="left")
    got = {r["lid"]: r["val"] for r in out.collect()}
    assert got[3] is None and len(got) == 4


def test_asof_plan_has_no_range_join(spark):
    left, right = _dfs(spark)
    out = asof_join(left, right, ["k"], "lt", "rt", ["val"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    # union trick: single key-partitioned sort window, no join operator
    assert "Join" not in plan
    assert "Window" in plan


def test_asof_null_value_cols_not_resurrected(spark):
    """ADVICE r2: when the matched right row has NULL in a value column,
    that NULL must be preserved — the old per-column carry resurrected a
    stale non-null from an OLDER right row, and different value_cols
    could come from different right rows. DuckDB ASOF carries the whole
    matched row; so do we (struct carry)."""
    left = spark.createDataFrame(
        [(1, "u", T(25))], "lid long, k string, lt timestamp"
    )
    right = spark.createDataFrame(
        [
            ("u", T(5), 100.0, 1.0),
            ("u", T(20), None, 2.0),  # the matched row: val is NULL
        ],
        "k string, rt timestamp, val double, aux double",
    )
    out = asof_join(left, right, ["k"], "lt", "rt", ["val", "aux"])
    row = out.collect()[0]
    assert row["__asof_time"] == T(20)
    assert row["val"] is None        # NOT 100.0 from the older row
    assert row["aux"] == 2.0         # same matched row for every col


def test_asof_null_right_time_not_matchable(spark):
    """A right row with NULL time has no ASOF position: a left-joined
    left row must get no-match NULLs, not that row's payload."""
    from pyspark.sql import types as ST

    from diffdataflowmlpipelines_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 5)], "k long, lt long")
    right = spark.createDataFrame(
        [(1, None, 99.0)],
        ST.StructType(
            [
                ST.StructField("k", ST.LongType(), False),
                ST.StructField("rt", ST.LongType(), True),
                ST.StructField("val", ST.DoubleType(), False),
            ]
        ),
    )
    (r,) = asof_join(
        left, right, keys=["k"], left_time="lt", right_time="rt",
        value_cols=["val"], how="left",
    ).collect()
    assert r["val"] is None
