"""Windowed tf-idf maintained incrementally.

The reference's TfidfTransformer keeps (document-frequency vector, doc
count) as a continuously-maintained aggregate and re-weights on
transform (``tfidf_transformer.rs:29-87``). Windowed Spark version:

  stream: one stateful aggregation maintains per-(window, doc, token)
          net term frequencies (signed by diff — retraction-correct);
  view:   tf-idf is DERIVED from that state at read time:
            df(w, t) = #docs in window w containing t
            N(w)     = #docs in window w
            weight   = tf * ln(N/df)
          — the reference's transform-as-join against the statistic,
          with the sink playing the arrangement's role.

Keeping only the finest-grained statistic in state (tf per window/doc/
token) and deriving df/N on read means ONE stateful operator per
stream; everything downstream is stateless and exactly reproducible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from diffdataflowmlpipelines_spark.operators.collection import DIFF, with_diff


def windowed_doc_token_counts(
    df: DataFrame,
    window: str = "60 seconds",
    watermark: str = "30 seconds",
    streaming: bool = True,
) -> DataFrame:
    """(window_start, doc_id, token, tf) — the maintained statistic."""
    ex = with_diff(df).select(
        "event_time", "doc_id", F.explode(F.col("tokens")).alias("token"), DIFF
    )
    if streaming:
        ex = ex.withWatermark("event_time", watermark)
    return (
        ex.groupBy(F.window("event_time", window).alias("w"), "doc_id", "token")
        .agg(F.sum(DIFF).alias("tf"))
        .select(F.col("w.start").alias("window_start"), "doc_id", "token", "tf")
    )


def tfidf_from_counts(counts: DataFrame, *, round_to: int | None = 6) -> DataFrame:
    """Derive per-(window, doc, token) tf-idf weights from the
    maintained counts (e.g. ``sink.read_current(...)``). Stateless."""
    live = counts.filter(F.col("tf") > 0)
    docfreq = live.groupBy("window_start", "token").agg(
        F.count("*").alias("__df")
    )
    ndocs = (
        live.select("window_start", "doc_id")
        .dropDuplicates()
        .groupBy("window_start")
        .agg(F.count("*").alias("__n"))
    )
    w = F.col("tf") * F.log(F.col("__n").cast("double") / F.col("__df"))
    if round_to is not None:
        w = F.round(w, round_to)
    return (
        live.join(docfreq, on=["window_start", "token"])
        .join(F.broadcast(ndocs), on="window_start")
        .select("window_start", "doc_id", "token", "tf", w.alias("weight"))
    )
