"""M5 end-to-end: streaming join + hash features; token arrays must be
byte-identical to the batch recompute (the north-rule parity
invariant), and features must equal a numpy recomputation."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from diffdataflowmlpipelines_spark.plans.feature_pipeline import labeled_feature_stream
from diffdataflowmlpipelines_spark.sources.fixtures import (
    LABELS_SCHEMA,
    TOKENS_STREAM_SCHEMA,
    gen_labels_pdf,
    gen_tokens_pdf,
)
from diffdataflowmlpipelines_spark.streaming.sink import ExactlyOnceParquetSink
from diffdataflowmlpipelines_spark.streaming.sources import EpochFileSource


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.copy()
    pdf["tokens"] = pdf["tokens"].map(tuple)
    pdf["features"] = pdf["features"].map(tuple)
    cols = sorted(pdf.columns)
    return pdf[cols].sort_values(cols, kind="stable").reset_index(drop=True)


def test_streaming_feature_pipeline_token_parity(spark, tmp_path):
    tok_pdf = gen_tokens_pdf(400, seed=21, rows_per_second=40)
    lab_pdf = gen_labels_pdf(tok_pdf, seed=22)

    flush_t = tok_pdf["event_time"].max() + pd.Timedelta(minutes=5)
    tok_flush = tok_pdf.iloc[[0]].copy()
    tok_flush["doc_id"] = "__flush__"
    tok_flush["event_time"] = flush_t
    lab_flush = lab_pdf.iloc[[0]].copy()
    lab_flush["doc_id"] = "__flush__lab"
    lab_flush["event_time"] = flush_t

    tsrc = EpochFileSource(spark, str(tmp_path / "tok"), TOKENS_STREAM_SCHEMA)
    lsrc = EpochFileSource(spark, str(tmp_path / "lab"), LABELS_SCHEMA)
    for k in range(2):
        n_t, n_l = len(tok_pdf), len(lab_pdf)
        tsrc.add_epoch(tok_pdf.iloc[(n_t * k) // 2 : (n_t * (k + 1)) // 2])
        lsrc.add_epoch(lab_pdf.iloc[(n_l * k) // 2 : (n_l * (k + 1)) // 2])
    tsrc.add_epoch(tok_flush)
    lsrc.add_epoch(lab_flush)

    sink = ExactlyOnceParquetSink(
        str(tmp_path / "out"), ["doc_id", "source", "event_time", "label_time"]
    )
    q = (
        labeled_feature_stream(tsrc.stream(2), lsrc.stream(2), n_features=32)
        .writeStream.foreachBatch(sink.foreach_batch())
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got = sink.read_all(spark).drop("epoch").toPandas()
    got = got[~got["doc_id"].str.startswith("__flush__")]

    want = labeled_feature_stream(
        spark.createDataFrame(tok_pdf, TOKENS_STREAM_SCHEMA),
        spark.createDataFrame(lab_pdf, LABELS_SCHEMA),
        n_features=32,
        streaming=False,
    ).toPandas()

    assert len(got) > 50
    pd.testing.assert_frame_equal(_canon(got), _canon(want), check_dtype=False)

    # feature vectors: recompute one row's histogram in numpy through
    # Spark's own murmur3 (F.hash) bucket assignment
    row = got.iloc[0]
    buckets = (
        spark.createDataFrame([(list(map(int, row["tokens"])),)], "toks array<int>")
        .select(
            F.transform(
                F.col("toks"), lambda t: F.pmod(F.hash(t.cast("string")), F.lit(32))
            ).alias("b")
        )
        .head()["b"]
    )
    hist = np.zeros(32)
    for b in buckets:
        hist[b] += 1
    assert list(hist) == list(row["features"])
