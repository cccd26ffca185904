"""int8 scalar quantization + asymmetric-distance top-k
(functions/similarity.scalar_quant_fit / scalar_quantize /
dequantize_expr / quantized_topk).

Pinned: the affine round-trip error bound (<= scale/2 per dimension,
exact at the min/max endpoints), constant-dimension handling (code
-128, reconstruction == the constant), the ragged-dimension guard,
codes staying in tinyint range, and recall of the quantized top-k vs
the exact full-precision baseline on planted clusters."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from diffdataflowmlpipelines_spark.functions.similarity import (
    cosine_topk,
    dequantize_expr,
    quantized_topk,
    scalar_quant_fit,
    scalar_quantize,
)


def _mk(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "id long, v array<double>",
    )


def test_fit_matches_local_minmax(spark):
    rng = random.Random(7)
    vecs = [[rng.uniform(-3, 3) for _ in range(5)] for _ in range(40)]
    mins, scales = scalar_quant_fit(_mk(spark, vecs), "v")
    for d in range(5):
        col = [v[d] for v in vecs]
        assert mins[d] == min(col)
        assert scales[d] == (max(col) - min(col)) / 255.0


def test_round_trip_error_bound_and_endpoints(spark):
    rng = random.Random(11)
    vecs = [[rng.uniform(-2, 5) for _ in range(4)] for _ in range(64)]
    df = _mk(spark, vecs)
    mins, scales = scalar_quant_fit(df, "v")
    rec = (
        scalar_quantize(df, "v", mins, scales, code_col="c")
        .select("id", "v", dequantize_expr("c", mins, scales).alias("r"))
        .collect()
    )
    by_id = {r["id"]: (r["v"], r["r"]) for r in rec}
    for _id, (v, r) in by_id.items():
        for d in range(4):
            # affine round-to-nearest: reconstruction within half a step
            assert abs(v[d] - r[d]) <= scales[d] / 2 + 1e-12
    # endpoints reconstruct exactly (code 0 / 255 land on mn / mx)
    for d in range(4):
        col = [v[d] for v in vecs]
        lo_id = col.index(min(col))
        assert by_id[lo_id][1][d] == pytest.approx(mins[d], abs=1e-12)


def test_constant_dimension(spark):
    vecs = [[1.5, float(i)] for i in range(10)]
    df = _mk(spark, vecs)
    mins, scales = scalar_quant_fit(df, "v")
    assert scales[0] == 0.0
    rows = (
        scalar_quantize(df, "v", mins, scales, code_col="c")
        .select("c", dequantize_expr("c", mins, scales).alias("r"))
        .collect()
    )
    for r in rows:
        assert r["c"][0] == -128  # the pinned constant-dim code
        assert r["r"][0] == 1.5  # reconstructs the constant exactly


def test_codes_are_tinyint_range(spark):
    rng = random.Random(3)
    vecs = [[rng.uniform(-1, 1) for _ in range(3)] for _ in range(32)]
    df = _mk(spark, vecs)
    mins, scales = scalar_quant_fit(df, "v")
    out = scalar_quantize(df, "v", mins, scales, code_col="c")
    assert dict(out.dtypes)["c"] == "array<tinyint>"
    lohi = out.select(
        F.array_min("c").alias("lo"), F.array_max("c").alias("hi")
    ).agg(F.min("lo").alias("lo"), F.max("hi").alias("hi")).first()
    assert -128 <= lohi["lo"] and lohi["hi"] <= 127


def test_ragged_dims_raise(spark):
    df = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, [1.0, 2.0, 3.0])], "id long, v array<double>"
    )
    with pytest.raises(ValueError, match="ragged"):
        scalar_quant_fit(df, "v")


def test_empty_corpus_raises(spark):
    df = spark.createDataFrame([], "id long, v array<double>")
    with pytest.raises(ValueError, match="empty"):
        scalar_quant_fit(df, "v")


def test_quantized_topk_recall_on_planted_clusters(spark):
    # 3 well-separated direction clusters in 8-d: int8 quantization
    # cannot confuse them, so quantized top-3 == exact top-3 on ids.
    rng = random.Random(42)
    base = [[5.0 if d == c * 3 else 0.0 for d in range(8)] for c in range(3)]
    vecs = []
    for i in range(30):
        b = base[i % 3]
        vecs.append([x + rng.uniform(-0.05, 0.05) for x in b])
    df = _mk(spark, vecs)
    queries = df.filter(F.col("id") < 3)
    got = quantized_topk(df, queries, "id", "v", k=3).collect()
    exact = cosine_topk(df, queries, "id", "v", k=3, round_to=6).collect()
    gset = {(r["query_id"], r["neighbor_id"]) for r in got}
    eset = {(r["query_id"], r["neighbor_id"]) for r in exact}
    # same cluster membership for every retrieved neighbor
    for q, n in gset:
        assert n % 3 == q % 3
    assert len(gset & eset) / len(eset) >= 0.8  # recall@3 >= 0.8


def test_quantized_cosine_close_to_exact(spark):
    rng = random.Random(9)
    vecs = [[rng.uniform(-1, 1) for _ in range(16)] for _ in range(50)]
    df = _mk(spark, vecs)
    queries = df.filter(F.col("id") < 4)
    got = {
        (r["query_id"], r["neighbor_id"]): r["cosine"]
        for r in quantized_topk(df, queries, "id", "v", k=5).collect()
    }
    exact = {
        (r["query_id"], r["neighbor_id"]): r["cosine"]
        for r in cosine_topk(df, queries, "id", "v", k=5, round_to=6).collect()
    }
    # 8-bit quantization over [-1,1]^16: step ~0.008/dim, cosine of the
    # reconstruction stays within a few steps of the true value
    for key in got.keys() & exact.keys():
        assert abs(got[key] - exact[key]) < 0.02
