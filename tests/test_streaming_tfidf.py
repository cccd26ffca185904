"""Windowed incremental tf-idf: streaming-maintained counts + derived
weights == batch recompute, under late rows and retractions."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from diffdataflowmlpipelines_spark.sources.fixtures import (
    TOKENS_STREAM_SCHEMA,
    gen_tokens_pdf,
)
from diffdataflowmlpipelines_spark.streaming.sink import ExactlyOnceParquetSink
from diffdataflowmlpipelines_spark.streaming.sources import write_epoch_files
from diffdataflowmlpipelines_spark.streaming.tfidf import (
    tfidf_from_counts,
    windowed_doc_token_counts,
)


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(pdf.columns)
    return pdf[cols].sort_values(cols, kind="stable").reset_index(drop=True)


def test_windowed_tfidf_parity(spark, tmp_path):
    pdf = gen_tokens_pdf(900, seed=13, rows_per_second=60)
    write_epoch_files(pdf, str(tmp_path / "src"), 4)
    sink = ExactlyOnceParquetSink(
        str(tmp_path / "out"), ["window_start", "doc_id", "token"]
    )
    stream = (
        spark.readStream.schema(TOKENS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "src"))
    )
    q = (
        windowed_doc_token_counts(stream)
        .writeStream.foreachBatch(sink.foreach_batch())
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got = tfidf_from_counts(sink.read_current(spark)).toPandas()

    batch = spark.createDataFrame(pdf, TOKENS_STREAM_SCHEMA)
    want = tfidf_from_counts(
        windowed_doc_token_counts(batch, streaming=False)
    ).toPandas()

    assert len(got) > 500
    pd.testing.assert_frame_equal(_canon(got), _canon(want), check_dtype=False)
    # retractions netted out: no nonpositive tf in the live view
    assert (got["tf"] > 0).all()
