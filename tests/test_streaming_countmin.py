"""windowed_count_min coverage (it was exported but untested): epoch-
driven streaming parity vs the same transform with streaming=False, and
the cell-additivity rollup — summing per-window cells over (depth_j,
bucket) must equal the whole-corpus count_min_sketch cells, the property
that makes coarser-window rollups a second tiny aggregation at 100 TB.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from diffdataflowmlpipelines_spark.functions.sketches import (
    count_min_sketch,
    windowed_count_min,
)
from diffdataflowmlpipelines_spark.sources.fixtures import (
    TOKENS_STREAM_SCHEMA,
    gen_tokens_pdf,
)
from diffdataflowmlpipelines_spark.streaming.sink import ExactlyOnceParquetSink
from diffdataflowmlpipelines_spark.streaming.sources import write_epoch_files


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(pdf.columns)
    return pdf[cols].sort_values(cols, kind="stable").reset_index(drop=True)


def test_windowed_count_min_streaming_parity(spark, tmp_path):
    pdf = gen_tokens_pdf(1200, seed=42, rows_per_second=100.0)
    src = str(tmp_path / "src")
    write_epoch_files(pdf, src, 6)
    sink = ExactlyOnceParquetSink(
        str(tmp_path / "out"), ["window_start", "depth_j", "bucket"]
    )
    stream = (
        spark.readStream.schema(TOKENS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        windowed_count_min(stream, depth=2, width=64)
        .writeStream.foreachBatch(sink.foreach_batch())
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = sink.read_current(spark).filter(F.col("count") != 0).toPandas()
    batch = spark.createDataFrame(pdf, TOKENS_STREAM_SCHEMA)
    want = (
        windowed_count_min(batch, depth=2, width=64, streaming=False)
        .filter(F.col("count") != 0)
        .toPandas()
    )
    assert len(got) > 50
    pd.testing.assert_frame_equal(
        _canon(got), _canon(want), check_dtype=False
    )


def test_windowed_count_min_rolls_up_to_global_sketch(spark):
    pdf = gen_tokens_pdf(600, seed=7, rows_per_second=100.0)
    df = spark.createDataFrame(pdf, TOKENS_STREAM_SCHEMA)
    windowed = windowed_count_min(df, depth=2, width=64, streaming=False)
    rolled = (
        windowed.groupBy("depth_j", "bucket")
        .agg(F.sum("count").cast("long").alias("count"))
        .filter(F.col("count") != 0)
        .toPandas()
    )
    total = (
        count_min_sketch(df, "tokens", depth=2, width=64)
        .filter(F.col("count") != 0)
        .toPandas()
    )
    pd.testing.assert_frame_equal(
        _canon(rolled), _canon(total), check_dtype=False
    )


def test_global_count_min_streaming_parity(spark, tmp_path):
    """count_min_sketch's own plan run as an UNWATERMARKED update-mode
    streaming aggregation (state bounded at depth*width cells by
    construction): final consolidated cells must equal the batch sketch
    over the full multiset, including retraction-bearing epochs —
    emit_zeros=True so a cell retracted to 0 overwrites its stale value
    in the latest-row-wins sink."""
    pdf = gen_tokens_pdf(1000, seed=13, rows_per_second=100.0)
    src = str(tmp_path / "src")
    write_epoch_files(pdf, src, 5)
    sink = ExactlyOnceParquetSink(str(tmp_path / "out"), ["depth_j", "bucket"])
    stream = (
        spark.readStream.schema(TOKENS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        count_min_sketch(
            stream, "tokens", depth=2, width=64, emit_zeros=True
        )
        .writeStream.foreachBatch(sink.foreach_batch())
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = sink.read_current(spark).filter(F.col("count") != 0).toPandas()
    batch = spark.createDataFrame(pdf, TOKENS_STREAM_SCHEMA)
    want = count_min_sketch(batch, "tokens", depth=2, width=64).toPandas()
    assert len(got) > 10
    pd.testing.assert_frame_equal(_canon(got), _canon(want), check_dtype=False)


def test_hll_registers_streaming_parity(spark, tmp_path):
    """hll_registers' own plan as an unwatermarked update-mode streaming
    aggregation: bounded state (m=2^p registers), MAX is idempotent so
    at-least-once delivery is free, and the final register table — and
    therefore the integer-exact estimate — must equal the batch sketch.
    (No retraction path: a MAX register cannot un-see a value; deletes
    are out of HLL's contract, unlike the signed count-min cells.)"""
    from diffdataflowmlpipelines_spark.functions.sketches import (
        hll_estimate,
        hll_registers,
    )

    pdf = gen_tokens_pdf(800, seed=21, rows_per_second=100.0)
    src = str(tmp_path / "src_hll")
    write_epoch_files(pdf, src, 4)
    sink = ExactlyOnceParquetSink(str(tmp_path / "out_hll"), ["bucket"])
    stream = (
        spark.readStream.schema(TOKENS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .select(F.explode("tokens").alias("tok"))
    )
    q = (
        hll_registers(stream, "tok", p=9)
        .writeStream.foreachBatch(sink.foreach_batch())
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt_hll"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = sink.read_current(spark)
    batch = spark.createDataFrame(pdf, TOKENS_STREAM_SCHEMA).select(
        F.explode("tokens").alias("tok")
    )
    want = hll_registers(batch, "tok", p=9)
    pd.testing.assert_frame_equal(
        _canon(got.toPandas()), _canon(want.toPandas()), check_dtype=False
    )
    est_stream = hll_estimate(got.select("bucket", "rho"), p=9).first()
    est_batch = hll_estimate(want, p=9).first()
    assert est_stream["est"] == est_batch["est"]


def test_chunk_documents_is_streaming_safe(spark, tmp_path):
    """chunk_documents is pure column expressions (no agg, no state):
    it must run unchanged on a streaming frame, and the streamed chunks
    must equal the batch chunks over the same rows."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from diffdataflowmlpipelines_spark.functions.text import chunk_documents

    pdf = pd.DataFrame(
        {"doc_id": [0, 1], "text": ["a b c d e f g h", "x y z"]}
    )
    src = str(tmp_path / "src_chunk")
    os.makedirs(src, exist_ok=True)
    pq.write_table(
        pa.Table.from_pandas(pdf, preserve_index=False),
        os.path.join(src, "part-0.parquet"),
    )
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    sink = ExactlyOnceParquetSink(
        str(tmp_path / "out_chunk"), ["doc_id", "chunk_id"]
    )
    q = (
        chunk_documents(stream, max_tokens=4, overlap=2)
        .writeStream.foreachBatch(sink.foreach_batch())
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_chunk"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = sink.read_current(spark).toPandas()
    want = chunk_documents(
        spark.createDataFrame(pdf, "doc_id long, text string"),
        max_tokens=4,
        overlap=2,
    ).toPandas()
    pd.testing.assert_frame_equal(_canon(got), _canon(want), check_dtype=False)
