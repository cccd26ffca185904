"""Hypothesis properties for the interval-bucket math behind
bucketed_range_join / streaming_range_join (operators/rangejoin.py).

The two load-bearing claims, checked over random micros (including
negative/pre-1970 and degenerate lower == upper):

1. NO FALSE NEGATIVES: every (lt, rt) pair satisfying the exact range
   predicate also matches on the bucket equi-key — the right row's
   single bucket lies inside the left row's covered bucket range.
2. BOUNDED FAN-OUT: the left row's covered range spans at most TWO
   consecutive buckets (the <= 2x explode cost claim).

The python twin of the floor-division is anchored to Spark's actual
expression by a cross-check test over the hostile values (negative,
boundary-multiple), so the properties exercise the same arithmetic
the plan runs."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st


def _floordiv_py(a: int, b: int) -> int:
    # python's // IS floor division — the twin of rangejoin._floordiv
    return a // b


def _buckets(lt_us: int, lo_us: int, hi_us: int) -> tuple[int, int, int]:
    b = max(hi_us - lo_us, 1)
    return (
        _floordiv_py(lt_us + lo_us, b),
        _floordiv_py(lt_us + hi_us, b),
        b,
    )


MICROS = st.integers(-(2**45), 2**45)  # ±~1970 +/- 1100 years
SPANS = st.tuples(
    st.integers(-(10**9), 10**9), st.integers(0, 2 * 10**9)
).map(lambda t: (t[0], t[0] + t[1]))  # lo <= hi, span up to ~33 min


@settings(max_examples=2000, deadline=None)
@given(lt=MICROS, rt=MICROS, span=SPANS)
def test_no_false_negatives(lt, rt, span):
    lo, hi = span
    first, last, b = _buckets(lt, lo, hi)
    if lt + lo <= rt <= lt + hi:  # exact predicate holds
        assert first <= _floordiv_py(rt, b) <= last  # bucket key matches


@settings(max_examples=2000, deadline=None)
@given(lt=MICROS, span=SPANS)
def test_left_fanout_at_most_two_buckets(lt, span):
    lo, hi = span
    first, last, _ = _buckets(lt, lo, hi)
    assert 0 <= last - first <= 1  # sequence(first, last) emits <= 2 rows


def test_python_twin_anchored_to_spark_expression(spark):
    from pyspark.sql import functions as F

    from diffdataflowmlpipelines_spark.operators.rangejoin import _floordiv

    hostile = [-(10**15), -1800000001, -1, 0, 1, 1799999999, 1800000000, 10**15]
    df = spark.createDataFrame([(v,) for v in hostile], "v long")
    for b in (1, 1800000000, 7):
        got = {
            r.v: r.fd
            for r in df.select("v", _floordiv(F.col("v"), b).alias("fd")).collect()
        }
        assert got == {v: _floordiv_py(v, b) for v in hostile}, f"b={b}"
