"""Regression tests for the round-4 ADVICE findings (fixed in round 5):

* initial_symbols: the Java split regex '(?!^)(?=.)' excluded Unicode
  line terminators (U+0085, U+2028, U+2029) — they survive tokenize's
  ASCII-only \\s+ split, so Spark fused a multi-char symbol where the
  python twin (list(w)) and the DuckDB oracle split per codepoint. Now
  DOTALL: '(?s)(?!^)(?=.)'.
* StandardScaler zero-variance branch: Spark orders NaN greater than
  every double, so `x > mean` mapped a NaN input to +inf while the
  emulated IEEE result (NaN - mean)/0.0 is NaN (the non-zero-variance
  branch already yielded NaN). Now guards isnan first.
* tools/: `from scaling_subproc import ...` resolved only via the
  script-dir sys.path entry 'python tools/x.py' adds; now each caller
  inserts HERE explicitly (tested by importing the modules the other
  way).
"""

from __future__ import annotations

import importlib
import os
import sys

from pyspark.sql import functions as F

from diffdataflowmlpipelines_spark.functions.bpe import initial_symbols
from diffdataflowmlpipelines_spark.operators.encoders import StandardScaler

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_initial_symbols_splits_unicode_line_terminators(spark):
    # U+2028 (line separator), U+0085 (NEL), U+2029 (paragraph sep)
    # embedded INSIDE a word — tokenize's ASCII \s+ does not strip them.
    for ch in ("\u2028", "\u0085", "\u2029"):
        w = f"a{ch}b"
        got = (
            spark.range(1)
            .select(initial_symbols(F.lit(w)).alias("s"))
            .first()["s"]
        )
        assert got == list(w) + ["</w>"], (repr(w), got)


def test_standard_scaler_zero_variance_nan_input_stays_nan(spark):
    df = spark.createDataFrame(
        [(1.0,), (1.0,), (float("nan"),), (None,), (2.0,), (0.0,)],
        "x double",
    )
    fitted = StandardScaler().fit(df.filter(F.col("x") == 1.0), "x")
    assert fitted.var_ == 0.0
    rows = {
        (None if r["x"] is None else str(r["x"])): r["y"]
        for r in fitted.transform(df, "x", "y").collect()
    }
    import math

    assert math.isnan(rows["nan"])  # was +inf before the guard
    assert rows[None] is None
    assert rows["2.0"] == float("inf")
    assert rows["0.0"] == float("-inf")
    assert math.isnan(rows["1.0"])  # x == mean


def test_tools_scaling_subproc_resolves_without_script_dir_on_path():
    # Simulate `python -m` / pytest collection: tools/ NOT on sys.path.
    # The fixed run() helpers insert HERE before importing
    # scaling_subproc; replicate that exact sequence here.
    tools_dir = os.path.join(REPO, "tools")
    saved = list(sys.path)
    try:
        sys.path = [p for p in sys.path if os.path.abspath(p) != tools_dir]
        sys.modules.pop("scaling_subproc", None)
        try:
            importlib.import_module("scaling_subproc")
            raise AssertionError("expected ModuleNotFoundError without HERE")
        except ModuleNotFoundError:
            pass
        sys.path.insert(0, tools_dir)  # the fix's sequence
        m = importlib.import_module("scaling_subproc")
        assert hasattr(m, "run_scaling_one")
        for script in ("scaling_bench.py", "scaling_round.py", "skew_bench.py"):
            src = open(os.path.join(tools_dir, script)).read()
            assert "sys.path.insert(0, HERE)" in src, script
    finally:
        sys.path = saved
        sys.modules.pop("scaling_subproc", None)
