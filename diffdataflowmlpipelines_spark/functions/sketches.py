"""Count-min sketch over token streams — named directly by the target
metric ("token-frequency/count-min feature aggregation"); the reference
itself has no sketches (SURVEY.md §2.3 "no approx sketches"), its only
hashing structure being the HashVectorizer
(``feature_extraction/hash_vectorizer.rs:21-48``), whose hashing-trick
construction this generalizes to d independent rows with a min-query.

Design for scale:
- building the sketch is ONE explode (xd rows, d small) + ONE partial/
  final hash aggregation — map-side combined, no skew (buckets are
  uniform by construction), output d*width cells regardless of corpus
  size. The sketch is additive (a signed sum per cell), so it is
  retraction-correct and window-mergeable like every statistic here.
- estimates broadcast the (tiny) sketch back to the token side.
- hashes are the engine-portable md5-based family (functions/dedup.py),
  so every query is oracle-checkable in DuckDB with literal params.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from diffdataflowmlpipelines_spark.functions.dedup import (
    MERSENNE_P,
    _minhash_params,
    md5_hash60,
)
from diffdataflowmlpipelines_spark.operators.collection import DIFF, with_diff


def _bucket(h: Column, a: int, b: int, width: int) -> Column:
    return ((F.lit(a) * h + F.lit(b)) % F.lit(MERSENNE_P)) % F.lit(width)


def count_min_sketch(
    df: DataFrame,
    tokens_col: str,
    *,
    depth: int = 4,
    width: int = 256,
    seed: int = 42,
) -> DataFrame:
    """Build the sketch: (depth_j, bucket, count) sparse cells, count =
    signed sum of multiplicities (diff-aware). Absent cells are zero."""
    params = _minhash_params(depth, seed)
    ex = with_diff(df).select(
        F.explode(F.col(tokens_col)).alias("__t"), DIFF
    )
    h = md5_hash60(F.col("__t").cast("string")) % F.lit(MERSENNE_P)
    rows = F.array(
        *[
            F.struct(
                F.lit(j).alias("depth_j"),
                _bucket(h, a, b, width).alias("bucket"),
            )
            for j, (a, b) in enumerate(params)
        ]
    )
    return (
        ex.select(F.explode(rows).alias("__c"), DIFF)
        .groupBy(
            F.col("__c.depth_j").alias("depth_j"),
            F.col("__c.bucket").alias("bucket"),
        )
        .agg(F.sum(DIFF).cast("long").alias("count"))
        .filter(F.col("count") != 0)
    )


# NOTE: estimate/heavy-hitter calls must use the SAME (depth, width,
# seed) the sketch was built with — the sketch frame carries only
# (row, col, count) cells (schema pinned by the cm1 oracle), so a
# mismatch is undetectable and silently probes the wrong buckets.


def count_min_estimate(
    sketch: DataFrame,
    tokens: DataFrame,
    token_col: str,
    *,
    depth: int = 4,
    width: int = 256,
    seed: int = 42,
) -> DataFrame:
    """Point-query the sketch for each distinct token in ``tokens``:
    estimate = min over depth rows of the hashed cell. Guaranteed
    >= the true count (one-sided error ~ N/width per row)."""
    params = _minhash_params(depth, seed)
    toks = tokens.select(F.col(token_col).alias("token")).dropDuplicates()
    h = md5_hash60(F.col("token").cast("string")) % F.lit(MERSENNE_P)
    cells = F.array(
        *[
            F.struct(
                F.lit(j).alias("depth_j"),
                _bucket(h, a, b, width).alias("bucket"),
            )
            for j, (a, b) in enumerate(params)
        ]
    )
    probes = toks.select("token", F.explode(cells).alias("__c")).select(
        "token",
        F.col("__c.depth_j").alias("depth_j"),
        F.col("__c.bucket").alias("bucket"),
    )
    joined = probes.join(F.broadcast(sketch), ["depth_j", "bucket"], "left")
    return (
        joined.groupBy("token")
        .agg(F.min(F.coalesce(F.col("count"), F.lit(0))).cast("long").alias("est"))
    )


def windowed_count_min(
    df: DataFrame,
    *,
    window: str = "60 seconds",
    watermark: str = "30 seconds",
    depth: int = 4,
    width: int = 256,
    seed: int = 42,
    tokens_col: str = "tokens",
    streaming: bool = True,
) -> DataFrame:
    """Per-event-time-window sketch, incrementally maintained (update
    mode): (window_start, depth_j, bucket, count). Window sketches merge
    by cell-wise addition, so rollups to coarser windows are a second
    tiny aggregation. Same code path batch/streaming (parity-testable)."""
    params = _minhash_params(depth, seed)
    ex = with_diff(df).select(
        "event_time", F.explode(F.col(tokens_col)).alias("__t"), DIFF
    )
    if streaming:
        ex = ex.withWatermark("event_time", watermark)
    h = md5_hash60(F.col("__t").cast("string")) % F.lit(MERSENNE_P)
    rows = F.array(
        *[
            F.struct(
                F.lit(j).alias("depth_j"),
                _bucket(h, a, b, width).alias("bucket"),
            )
            for j, (a, b) in enumerate(params)
        ]
    )
    return (
        ex.select("event_time", F.explode(rows).alias("__c"), DIFF)
        .groupBy(
            F.window("event_time", window).alias("w"),
            F.col("__c.depth_j").alias("depth_j"),
            F.col("__c.bucket").alias("bucket"),
        )
        .agg(F.sum(DIFF).cast("long").alias("count"))
        .select(
            F.col("w.start").alias("window_start"), "depth_j", "bucket", "count"
        )
    )
