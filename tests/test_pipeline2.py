"""Reference pipeline_2 semantics on the F4 adultlike fixture."""

from __future__ import annotations

from pyspark.sql import functions as F

from diffdataflowmlpipelines_spark.operators.encoders import overprovisioned_len
from diffdataflowmlpipelines_spark.plans.pipeline2 import (
    EXCLUDED_IDX,
    adultlike_df,
    build_pipeline2,
    run_pipeline2,
)


def test_pipeline2_feature_layout(spark):
    df = adultlike_df(spark, n_rows=800, seed=42)
    mce = build_pipeline2(df)
    used = [c for c, _ in mce.config]
    excluded = {df.columns[i] for i in EXCLUDED_IDX}
    assert not (set(used) & excluded)
    assert len(used) == 11  # 15 - 4 excluded

    out = run_pipeline2(df)
    dims = out.select(F.size("features").alias("d")).distinct().collect()
    assert len(dims) == 1  # fixed-width feature vector
    # expected width: sum of one-hot overprovisioned lens + numeric 1s
    width = 0
    for col, enc in mce.config:
        if enc.output_is_vector:
            n = df.select(col).distinct().count()
            width += overprovisioned_len(n)
        else:
            width += 1
    assert dims[0]["d"] == width

    # every one-hot block row-sums to exactly 1 (all values seen in fit)
    total = out.select(
        F.aggregate("features", F.lit(0.0), lambda a, x: a + x).alias("s"),
        *[F.col(c) for c, e in mce.config if not e.output_is_vector],
    )
    # sum(features) = sum(numeric passthroughs) + (#categorical cols)
    n_cat = sum(1 for _, e in mce.config if e.output_is_vector)
    chk = total.withColumn(
        "expect",
        sum(F.col(c).cast("double") for c, e in mce.config if not e.output_is_vector)
        + F.lit(float(n_cat)),
    )
    bad = chk.filter(F.abs(F.col("s") - F.col("expect")) > 1e-6).count()
    assert bad == 0
