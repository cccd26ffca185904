"""Hypothesis properties for the int8 scalar quantizer
(functions/similarity.scalar_quantize / dequantize_expr).

Load-bearing claims, checked over random values/ranges (including
negative mins, tiny and huge scales, out-of-range inputs):

1. CODES IN RANGE: every emitted code fits the signed byte.
2. ROUND-TRIP BOUND: for x inside [mn, mx], |dequant(quant(x)) - x|
   <= sc/2 (+1 ulp slack); outside, reconstruction clips to the range.
3. MONOTONE: quantization never inverts order within a dimension.
4. ENDPOINTS: mn encodes to -128 and reconstructs exactly to mn.

The python twin mirrors Spark's arithmetic: HALF_UP rounding on the
non-negative (x-mn)/sc (floor(q+0.5) == decimal HALF_UP for
non-negative doubles), least/greatest clipping, the -128 shift. It is
anchored to the actual Spark expression by a cross-check over hostile
values (exact .5 steps, negative ranges, denormal-ish scales) in
test_twin_anchored_to_spark."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st


def _quant_py(x: float, mn: float, sc: float) -> int:
    if sc == 0.0:
        return -128
    q = math.floor((x - mn) / sc + 0.5)  # HALF_UP on a non-negative value
    q = min(255.0, max(0.0, float(q)))
    return int(q) - 128


def _dequant_py(code: int, mn: float, sc: float) -> float:
    return mn + (code + 128.0) * sc


FINITE = st.floats(
    min_value=-1e12, max_value=1e12, allow_nan=False, allow_infinity=False
)
SPANS = st.tuples(
    FINITE, st.floats(min_value=1e-9, max_value=1e12, allow_nan=False)
).map(lambda t: (t[0], t[0] + t[1]))


@settings(max_examples=2000, deadline=None)
@given(x=FINITE, span=SPANS)
def test_codes_in_signed_byte(x, span):
    mn, mx = span
    sc = (mx - mn) / 255.0
    assert -128 <= _quant_py(x, mn, sc) <= 127


@settings(max_examples=2000, deadline=None)
@given(t=st.floats(min_value=0.0, max_value=1.0, allow_nan=False), span=SPANS)
def test_round_trip_bound_inside_range(t, span):
    mn, mx = span
    sc = (mx - mn) / 255.0
    x = mn + (mx - mn) * t  # inside [mn, mx] by construction
    r = _dequant_py(_quant_py(x, mn, sc), mn, sc)
    # half-step bound with float slack proportional to the magnitudes
    slack = 1e-9 * max(abs(mn), abs(mx), 1.0)
    assert abs(r - x) <= sc / 2 + slack


@settings(max_examples=2000, deadline=None)
@given(x=FINITE, span=SPANS)
def test_out_of_range_clips_to_span(x, span):
    mn, mx = span
    sc = (mx - mn) / 255.0
    r = _dequant_py(_quant_py(x, mn, sc), mn, sc)
    slack = 1e-9 * max(abs(mn), abs(mx), 1.0)
    assert mn - slack <= r <= mn + 255.0 * sc + slack


@settings(max_examples=2000, deadline=None)
@given(x1=FINITE, x2=FINITE, span=SPANS)
def test_quantization_is_monotone(x1, x2, span):
    mn, mx = span
    sc = (mx - mn) / 255.0
    lo, hi = min(x1, x2), max(x1, x2)
    assert _quant_py(lo, mn, sc) <= _quant_py(hi, mn, sc)


@settings(max_examples=1000, deadline=None)
@given(span=SPANS)
def test_endpoint_exact(span):
    mn, mx = span
    sc = (mx - mn) / 255.0
    assert _quant_py(mn, mn, sc) == -128
    assert _dequant_py(-128, mn, sc) == mn


def test_twin_anchored_to_spark(spark):
    """The python twin must reproduce the ACTUAL Spark expression on
    hostile values: exact .5 rounding steps, negative ranges, huge and
    tiny scales, out-of-range inputs, constant dims."""
    from diffdataflowmlpipelines_spark.functions.similarity import (
        dequantize_expr,
        scalar_quantize,
    )

    cases = [
        # (x, mn, mx) — x at exact half-step boundaries of (mx-mn)/255
        (0.5 * (255.0 / 255.0), 0.0, 255.0),
        (127.5, 0.0, 255.0),  # exact .5 -> HALF_UP -> 128
        (-3.5, -10.0, 10.0),
        (1e12, -1.0, 1.0),  # clips high
        (-1e12, -1.0, 1.0),  # clips low
        (7.0, 7.0, 7.0),  # constant dim (sc == 0)
        (2.500000000000001, 0.0, 5.1),
        (-0.1, -0.1, 254.9),
        (1e-300, 0.0, 2.55e-298),  # tiny scale
    ]
    dim = len(cases)
    mins = [c[1] for c in cases]
    scales = [(c[2] - c[1]) / 255.0 for c in cases]
    vec = [float(c[0]) for c in cases]
    df = spark.createDataFrame([(0, vec)], "id long, v array<double>")
    out = scalar_quantize(df, "v", mins, scales, code_col="c")
    row = out.select("c", dequantize_expr("c", mins, scales).alias("r")).first()
    for d in range(dim):
        want_code = _quant_py(vec[d], mins[d], scales[d])
        assert row["c"][d] == want_code, f"dim {d}: {row['c'][d]} != {want_code}"
        want_rec = _dequant_py(want_code, mins[d], scales[d])
        assert row["r"][d] == want_rec, f"dim {d} recon"
