"""Bucketed pure-range (theta) join — the scale path for time-window
joins with NO equi key.

The reference has only incremental hash equi-joins
(``src/operators/join.rs`` — SURVEY.md §2.3 "no range join"); j1/j3
cover the keyed variants (user_id equi-key + range filter, as-of).
This operator covers the remaining case: ``right_time BETWEEN
left_time + lower AND left_time + upper`` with no shared key at all.
Spark plans that condition as a BroadcastNestedLoopJoin (all-pairs) —
quadratic, and a guaranteed non-starter at 100 TB.

Construction (standard interval bucketing): pick the bucket width B =
the window span. Every right row lands in exactly ONE bucket
``floor(t/B)``; every left row's window covers AT MOST TWO consecutive
buckets, materialized with a 2-element ``sequence`` + ``explode``
inside the scan stage. An equi shuffle join on the bucket id then sees
every true pair exactly once (the right row's single bucket is always
inside the left row's covered range), so the exact BETWEEN predicate
is a post-join filter, never a join strategy. Cost: one shuffle on a
dense integer key, fan-out <= 2x on the left — linear, AQE-skew-splittable,
instead of |L| x |R|.

No dedup step is needed: left bucket ids are distinct consecutive
integers and each matching right row joins on its unique bucket, so
multiplicity is exactly 1 per qualifying pair (property-tested vs the
naive theta join in tests/test_rangejoin.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _floordiv(c: Column, b: int) -> Column:
    # exact long floor-division (Spark's `div` truncates toward zero,
    # wrong for pre-1970 micros): (c - pmod(c, b)) is a multiple of b
    # and |c| stays far below 2^53, so the double division is exact.
    return ((c - F.pmod(c, F.lit(b))) / F.lit(b)).cast("long")


def _micros(df: DataFrame, col: str) -> Column:
    """Epoch-microseconds of a timestamp column. ``unix_micros`` only
    accepts TIMESTAMP (ltz); for TIMESTAMP_NTZ (what parquet scans of
    naive timestamps produce) the micros are derived by pure NTZ
    arithmetic from the NTZ epoch — never a cast through the session
    timezone, which is non-monotonic across DST gaps."""
    if dict(df.dtypes).get(col) == "timestamp_ntz":
        # Catalyst coerces the mixed NTZ args through the session zone,
        # which the repo pins to UTC (session.py:34) — an identity on
        # the underlying micros, so still DST-free in practice.
        return F.expr(
            f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', `{col}`)"
        )
    return F.unix_micros(F.col(col))


def bucket_equi_range_join(
    left: DataFrame,
    right: DataFrame,
    left_time: str,
    right_time: str,
    *,
    lower: float,
    upper: float,
) -> DataFrame:
    """The shared core of the batch operator AND the streaming twin
    (``streaming/join.streaming_range_join`` — which only adds
    watermarks before calling this): validation, microsecond bounds,
    bucket derivation, and the equi-on-bucket join whose exact
    ``right_time BETWEEN left_time + lower AND left_time + upper``
    range condition rides IN the join on the RAW event-time columns —
    what Spark's stream-stream state-cleanup analysis needs to derive
    each side's state watermark, and a no-op difference for batch.
    One implementation, so the bucket math cannot drift between the
    two paths.
    """
    if lower > upper:
        raise ValueError(f"lower ({lower}) must be <= upper ({upper})")
    overlap = set(left.columns) & set(right.columns)
    if overlap:
        raise ValueError(
            f"column collision across sides: {sorted(overlap)} — alias first"
        )
    lo_us = int(round(lower * 1_000_000))
    hi_us = int(round(upper * 1_000_000))
    bucket_us = max(hi_us - lo_us, 1)

    lt_us = _micros(left, left_time)
    l = left.withColumn(
        "__lbucket",
        F.explode(
            F.sequence(
                _floordiv(lt_us + F.lit(lo_us), bucket_us),
                _floordiv(lt_us + F.lit(hi_us), bucket_us),
            )
        ),
    )
    r = right.withColumn(
        "__rbucket", _floordiv(_micros(right, right_time), bucket_us)
    )

    lo_iv = F.make_dt_interval(secs=F.lit(lo_us / 1_000_000))
    hi_iv = F.make_dt_interval(secs=F.lit(hi_us / 1_000_000))
    cond = (
        (l["__lbucket"] == r["__rbucket"])
        & (r[right_time] >= l[left_time] + lo_iv)
        & (r[right_time] <= l[left_time] + hi_iv)
    )
    return l.join(r, cond, "inner").drop("__lbucket", "__rbucket")


def bucketed_range_join(
    left: DataFrame,
    right: DataFrame,
    left_time: str,
    right_time: str,
    *,
    lower: float,
    upper: float,
) -> DataFrame:
    """Inner-join ``left`` x ``right`` on ``right_time`` in
    ``[left_time + lower, left_time + upper]`` (seconds, inclusive
    both ends, lower <= upper) without any equi key — planned as ONE
    equi shuffle join on a derived bucket id instead of a nested-loop
    cross product.

    Column names must not collide across the two frames (pre-alias on
    the caller side, the j1/j3 convention). Timestamps are compared at
    microsecond precision (the parquet/Spark timestamp resolution).
    """
    return bucket_equi_range_join(
        left, right, left_time, right_time, lower=lower, upper=upper
    )
