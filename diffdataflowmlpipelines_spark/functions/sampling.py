"""Deterministic sampling operators for training-data curation.

The reference has no sampling stage (its pipelines consume whole
relations); a web-scale corpus needs per-source quotas — e.g. cap every
domain/source at N documents so no single crawl dominates the mixture.
Everything here is hash-deterministic (portable md5 arithmetic, see
``functions/dedup.md5_hash60``), so the sample is reproducible across
engines, retries, and partitionings — never ``rand()``, which breaks
exactly-once replay and oracle checks alike.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from diffdataflowmlpipelines_spark.functions.dedup import md5_hash60

SCALE = 1_000_000


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    target_per_stratum: int,
    scale: int = SCALE,
) -> DataFrame:
    """Keep ~``target_per_stratum`` rows per stratum via a deterministic
    hash gate: a row survives iff
    ``md5_hash60(id) % scale < floor(target * scale / |stratum|)``
    (integer arithmetic — identical in ANSI SQL, no float thresholds).

    Scale shape: one aggregation computes per-stratum counts (map-side
    partials; |strata| rows total), the thresholds are BROADCAST back,
    and the gate itself is a map-only filter — the corpus never shuffles.
    Strata at or under the target keep every row (threshold >= scale).
    """
    counts = df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("__n"))
    thr = counts.select(
        strata_col,
        F.expr(f"CAST({target_per_stratum} AS BIGINT) * {scale} DIV __n").alias(
            "__thr"
        ),
    )
    gate = F.pmod(md5_hash60(F.col(id_col).cast("string")), F.lit(scale))
    return (
        df.join(F.broadcast(thr), strata_col)
        .filter(gate < F.col("__thr"))
        .drop("__thr")
    )
