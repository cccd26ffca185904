"""The north-star composition in ONE streaming query: stateful
stream-stream join on (doc_id, source) chained into a tumbling-window
aggregation (two stateful operators, watermark propagated through the
join), exactly-once sink, parity vs batch recompute.

This is the literal BASELINE.json north_star sentence exercised
end-to-end: windows + watermark frontier + stateful join + exactly-once
sink + consolidation parity.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from diffdataflowmlpipelines_spark.sources.fixtures import (
    LABELS_SCHEMA,
    TOKENS_STREAM_SCHEMA,
    gen_labels_pdf,
    gen_tokens_pdf,
)
from diffdataflowmlpipelines_spark.plans.feature_pipeline import joined_window_stats
from diffdataflowmlpipelines_spark.streaming.sink import ExactlyOnceParquetSink
from diffdataflowmlpipelines_spark.streaming.sources import EpochFileSource


def test_join_then_window_single_query(spark, tmp_path):
    tok_pdf = gen_tokens_pdf(800, seed=71, rows_per_second=12, retract_frac=0.0)
    lab_pdf = gen_labels_pdf(tok_pdf, seed=72)

    flush_t = tok_pdf["event_time"].max() + pd.Timedelta(minutes=10)
    tok_flush = tok_pdf.iloc[[0]].copy()
    tok_flush["doc_id"] = "__flush__"
    tok_flush["event_time"] = flush_t
    lab_flush = lab_pdf.iloc[[0]].copy()
    lab_flush["doc_id"] = "__flush__lab"
    lab_flush["event_time"] = flush_t

    tsrc = EpochFileSource(spark, str(tmp_path / "tok"), TOKENS_STREAM_SCHEMA)
    lsrc = EpochFileSource(spark, str(tmp_path / "lab"), LABELS_SCHEMA)
    n_t, n_l = len(tok_pdf), len(lab_pdf)
    for k in range(2):
        tsrc.add_epoch(tok_pdf.iloc[(n_t * k) // 2 : (n_t * (k + 1)) // 2])
        lsrc.add_epoch(lab_pdf.iloc[(n_l * k) // 2 : (n_l * (k + 1)) // 2])
    tsrc.add_epoch(tok_flush)
    lsrc.add_epoch(lab_flush)

    sink = ExactlyOnceParquetSink(
        str(tmp_path / "out"), ["window_start", "source", "label"]
    )
    q = (
        joined_window_stats(tsrc.stream(2), lsrc.stream(2))
        .writeStream.foreachBatch(sink.foreach_batch())
        .outputMode("append")  # chained stateful ops require append
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got = sink.read_all(spark).drop("epoch").toPandas()

    want = joined_window_stats(
        spark.createDataFrame(tok_pdf, TOKENS_STREAM_SCHEMA).filter(
            ~F.col("doc_id").startswith("__flush__")
        ),
        spark.createDataFrame(lab_pdf, LABELS_SCHEMA),
        streaming=False,
    ).toPandas()

    def canon(p):
        c = sorted(p.columns)
        return p[c].sort_values(c, kind="stable").reset_index(drop=True)

    assert len(got) >= 16  # multiple windows x sources x labels
    pd.testing.assert_frame_equal(canon(got), canon(want), check_dtype=False)
