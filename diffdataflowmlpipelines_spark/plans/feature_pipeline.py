"""End-to-end streaming ML feature pipeline (SURVEY.md §7.2 M5):

  tokens stream ──┐
                  ├── stateful join on (doc_id, source) ──> hash-vectorizer
  labels stream ──┘        (watermarked)                     features (C10)
                                                             + tf-idf weights
                                                             per window (C9)

The per-row invariant carried through every stage is the untouched
``tokens`` array (BASELINE.json: token-array equality per row) —
asserted by the parity test against the batch recompute.

Everything is DataFrame ops; the vectorizer is the hashing trick
(stateless, reference hash_vectorizer.rs) so the streaming path needs
no dictionary state; the windowed df (document-frequency) statistic is
the only stateful aggregate and is maintained incrementally.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from diffdataflowmlpipelines_spark.streaming.join import label_join


# reference hash_vectorizer.rs:21-48 (bucket = hash(token) % n) ------------


def hash_buckets(tokens_col: str, n_features: int) -> F.Column:
    """murmur3 bucket per token, JVM-side (shared by both histogram
    implementations so they are bit-identical)."""
    return F.transform(
        F.col(tokens_col),
        lambda t: F.pmod(F.hash(t.cast("string")), F.lit(n_features)).cast("int"),
    )


def hash_features(tokens_col: str, n_features: int = 64) -> F.Column:
    """Dense hashing-trick count vector as a column expression —
    per-row, no shuffle, fully codegen'd.

    Cost is O(n_features x n_tok) per row (one filter pass per output
    slot) — the right trade at small widths (<=~256), where staying
    inside whole-stage codegen beats any Arrow transfer. For wide
    vectors use :func:`hash_features_hist` (linear-time bincount over
    the same buckets)."""
    buckets = hash_buckets(tokens_col, n_features)
    return F.transform(
        F.sequence(F.lit(0), F.lit(n_features - 1)),
        lambda i: F.size(F.filter(buckets, lambda b: b == i)).cast("double"),
    )


def hash_features_hist(tokens_col: str, n_features: int = 1024) -> F.Column:
    """Linear-time variant for wide vectors: buckets are computed
    JVM-side with the identical murmur3 expression, then histogrammed
    with numpy bincount in an Arrow-batched pandas UDF —
    O(n_tok + n_features) per row instead of O(n_features x n_tok).
    Output is bit-identical to :func:`hash_features` (parity-tested)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<double>")
    def _bincount(buckets: pd.Series) -> pd.Series:
        # a NULL tokens array must yield a NULL vector, like the
        # codegen twin (np.asarray(None) raises TypeError otherwise)
        return buckets.map(
            lambda b: None
            if b is None
            else np.bincount(
                np.asarray(b, dtype="int64"), minlength=n_features
            ).astype("float64")
        )

    return _bincount(hash_buckets(tokens_col, n_features))


def labeled_feature_stream(
    tokens: DataFrame,
    labels: DataFrame,
    *,
    n_features: int = 64,
    watermark: str = "30 seconds",
    streaming: bool = True,
) -> DataFrame:
    """Join tokens with labels, attach hash features. Output keeps the
    raw token array byte-identical (the parity invariant)."""
    joined = label_join(tokens, labels, watermark=watermark, streaming=streaming)
    return joined.withColumn("features", hash_features("tokens", n_features))


def joined_window_stats(
    tokens: DataFrame,
    labels: DataFrame,
    *,
    window: str = "20 seconds",
    streaming: bool = True,
) -> DataFrame:
    """North-star composition in ONE query: the stateful stream-stream
    join chained into a tumbling-window aggregation (two stateful
    operators; watermark propagates through the join; append mode)."""
    j = label_join(tokens, labels, streaming=streaming)
    return (
        j.groupBy(F.window("event_time", window).alias("w"), "source", "label")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.sum("n_tok").cast("long").alias("n_tokens"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "source",
            "label",
            "n_rows",
            "n_tokens",
        )
    )
