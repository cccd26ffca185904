"""Stateful stream-stream join on (doc_id, source) with watermarks —
the north-rule join. Every DD join in the reference is a continuously
maintained stream x stream join (e.g.
``src/feature_encoders/multi_column_encoder.rs:32-35``); Spark's
watermarked stream-stream equi-join with a time-range condition is the
bounded-state analogue: state for a side is dropped once the watermark
passes its join-window.

The same function handles the batch recompute oracle (streaming=False),
which the parity tests compare against epoch outputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def label_join(
    tokens: DataFrame,
    labels: DataFrame,
    *,
    watermark: str = "30 seconds",
    tolerance_s: int = 10,
    streaming: bool = True,
) -> DataFrame:
    """tokens (doc_id, tokens, n_tok, source, event_time[, diff]) INNER
    JOIN labels (doc_id, source, label, event_time) where the label
    arrives within +-tolerance_s of the token row. Output keeps both
    event times; diff (if present) passes through — a retracted token
    row's join outputs are retracted downstream by the same diff.
    """
    t = tokens.withWatermark("event_time", watermark) if streaming else tokens
    l = labels.withWatermark("event_time", watermark) if streaming else labels
    l2 = l.select(
        F.col("doc_id").alias("l_doc_id"),
        F.col("source").alias("l_source"),
        "label",
        F.col("event_time").alias("label_time"),
    )
    cond = (
        (t["doc_id"] == l2["l_doc_id"])
        & (t["source"] == l2["l_source"])
        & (l2["label_time"] >= t["event_time"] - F.expr(f"INTERVAL {tolerance_s} SECONDS"))
        & (l2["label_time"] <= t["event_time"] + F.expr(f"INTERVAL {tolerance_s} SECONDS"))
    )
    out_cols = ["doc_id", "source", "tokens", "n_tok", "event_time", "label", "label_time"]
    if "diff" in tokens.columns:
        out_cols.append("diff")
    return t.join(l2, cond, "inner").select(*out_cols)
