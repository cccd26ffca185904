"""ADC compute A/B: pq_topk (per-query distance-table lookups, O(m)
per joined pair) vs the same top-k computed with exact per-pair
squared-L2 folds (O(dim) per pair) on identical synthetic data — the
evidence that the ADC table is a compute win, not just a shuffle-bytes
win. Timing: run ALONE on a quiet host (CLAUDE.md rule).

Env: PQ_ROWS (corpus size, default 40000), PQ_QUERIES (default 256),
PQ_DIM (default 64), PQ_M (default 8). Appends to SCALING.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from diffdataflowmlpipelines_spark import get_spark
from diffdataflowmlpipelines_spark.functions.similarity import (
    _sqdist,
    pq_fit,
    pq_topk,
)

ROWS = int(os.environ.get("PQ_ROWS", "40000"))
QUERIES = int(os.environ.get("PQ_QUERIES", "256"))
DIM = int(os.environ.get("PQ_DIM", "64"))
M = int(os.environ.get("PQ_M", "8"))
K = 10


def exact_l2_topk(corpus, queries, key, vec_col, *, k):
    """The O(dim)-per-pair baseline: same broadcast join shape, same
    window, but every joined pair pays the full squared-L2 fold."""
    q = queries.select(
        F.col(key).alias("query_id"), F.col(vec_col).alias("__qv")
    )
    c = corpus.select(
        F.col(key).alias("neighbor_id"), F.col(vec_col).alias("__cv")
    )
    scored = (
        F.broadcast(q)
        .join(c, F.col("query_id") != F.col("neighbor_id"), "inner")
        .withColumn("dist", F.round(_sqdist(F.col("__qv"), F.col("__cv")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("dist").asc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "dist", "rank")
    )


def main() -> None:
    spark = get_spark()
    # deterministic synthetic corpus: seeded columnar expressions, no
    # driver-side data generation (rand(seed) is deterministic per plan)
    base = spark.range(ROWS).withColumnRenamed("id", "vec_id")
    vec = F.array(
        *[
            (F.sin(F.col("vec_id") * F.lit(0.137 + 0.011 * d)) * F.lit(3.0))
            for d in range(DIM)
        ]
    )
    corpus = base.withColumn("v", vec).localCheckpoint(eager=True)
    queries = corpus.filter(F.col("vec_id") < QUERIES).localCheckpoint(eager=True)

    cents = pq_fit(corpus, "vec_id", "v", dim=DIM, m=M, ksub=256)

    # encode ONCE, timed separately — a store encodes at ingest and the
    # per-query cost is scoring over the materialized (key, codes) table
    from diffdataflowmlpipelines_spark.functions.similarity import pq_encode

    from diffdataflowmlpipelines_spark.functions.similarity import (
        pq_encode_arrow,
    )

    # symmetric timing: force code MATERIALIZATION on both lanes with
    # an aggregate over the codes column. Neither count() (Catalyst
    # prunes the codes projection entirely on the JVM lane — measured
    # 3 s of computing nothing) nor localCheckpoint (charges a persist
    # to one lane only — an earlier run's mistake) compares the lanes.
    def force(df):
        return df.agg(
            F.sum(F.element_at("codes", 1).cast("long"))
        ).collect()[0][0]

    jvm_df = pq_encode(corpus, "v", cents, code_col="codes").select(
        "vec_id", "codes"
    )
    arrow_df = pq_encode_arrow(corpus, "v", cents, code_col="codes").select(
        "vec_id", "codes"
    )
    force(jvm_df)  # warm codegen / python workers
    force(arrow_df)
    t0 = time.monotonic()
    s1 = force(jvm_df)
    encode_s = time.monotonic() - t0
    t0 = time.monotonic()
    s2 = force(arrow_df)
    encode_arrow_s = time.monotonic() - t0
    assert s1 == s2, f"lane disagreement: {s1} != {s2}"

    code_tbl = (
        pq_encode(corpus, "v", cents, code_col="codes")
        .select("vec_id", "codes")
        .localCheckpoint(eager=True)
    )

    # build each plan ONCE and time only execution — the first version
    # of this bench re-built the pq plan inside the timer and measured
    # ~18 s of driver-side py4j literal construction, not Spark work
    t0 = time.monotonic()
    df_pq = pq_topk(
        corpus, queries, "vec_id", "v", dim=DIM, m=M, ksub=256,
        k=K, centroids=cents, codes=code_tbl,
    )
    build_s = time.monotonic() - t0

    df_exact = exact_l2_topk(corpus, queries, "vec_id", "v", k=K)

    results = {}
    for name, df in (("pq_adc", df_pq), ("exact_l2", df_exact)):
        df.count()  # warm
        t0 = time.monotonic()
        n = df.count()
        dt = time.monotonic() - t0
        results[name] = (dt, n)
        print(f"{name:10s} {dt:7.2f} s  rows={n}")
    print(f"encode jvm   {encode_s:7.2f} s (one-time, {ROWS} rows)")
    print(f"encode arrow {encode_arrow_s:7.2f} s (one-time, {ROWS} rows)")
    print(f"plan build   {build_s:7.2f} s (one-time, driver-side)")

    speedup = results["exact_l2"][0] / results["pq_adc"][0]
    lines = [
        "",
        f"## PQ ADC vs exact L2 compute A/B ({ROWS} x {DIM}-d corpus, "
        f"{QUERIES} queries, k={K}, m={M}, ksub=256)",
        "",
        "Same broadcast-join + window plan on both sides; the only "
        "difference is per-pair scoring — ADC's O(m) element_at lookups "
        "into the per-query distance table vs the exact O(dim) "
        "squared-L2 fold. Corpus codes are encoded once — JVM "
        f"transform+array_min lane {encode_s:.2f} s vs the Arrow/numpy "
        f"bulk-ingest lane (pq_encode_arrow, bit-parity pinned) "
        f"{encode_arrow_s:.2f} s — and scored from the materialized "
        "(key, codes) table via pq_topk(codes=...). Warm-run wall "
        "clock, second run timed:",
        "",
        "| scorer | wall | per-pair work |",
        "|---|---|---|",
        f"| exact squared-L2 fold | {results['exact_l2'][0]:.2f} s | O(dim={DIM}) |",
        f"| PQ ADC table lookup | {results['pq_adc'][0]:.2f} s | O(m={M}) |",
        "",
        f"ADC speedup: **{speedup:.1f}x** at identical join/window cost "
        "— the compute half of PQ's 100 TB case (the storage half is "
        "the 50x smaller shuffle payload in the footprint table above).",
        "",
    ]
    with open(
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "SCALING.md",
        ),
        "a",
    ) as f:
        f.write("\n".join(lines))


if __name__ == "__main__":
    main()
