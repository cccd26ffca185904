"""M4: stateful stream-stream join on (doc_id, source) with watermarks —
epoch-fed two-stream join, append-mode output, parity vs the batch join
on the same inputs (north-rule join semantics)."""

from __future__ import annotations

import pandas as pd

from diffdataflowmlpipelines_spark.sources.fixtures import (
    LABELS_SCHEMA,
    TOKENS_STREAM_SCHEMA,
    gen_labels_pdf,
    gen_tokens_pdf,
)
from diffdataflowmlpipelines_spark.streaming.join import label_join
from diffdataflowmlpipelines_spark.streaming.sink import ExactlyOnceParquetSink
from diffdataflowmlpipelines_spark.streaming.sources import EpochFileSource


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.copy()
    pdf["tokens"] = pdf["tokens"].map(tuple)
    cols = sorted(pdf.columns)
    return pdf[cols].sort_values(cols, kind="stable").reset_index(drop=True)


def test_stream_stream_join_parity(spark, tmp_path):
    tok_pdf = gen_tokens_pdf(600, seed=11, rows_per_second=50)
    lab_pdf = gen_labels_pdf(tok_pdf, seed=12)

    # sentinel rows push both watermarks far enough to flush all matches
    flush_t = tok_pdf["event_time"].max() + pd.Timedelta(minutes=5)
    tok_flush = tok_pdf.iloc[[0]].copy()
    tok_flush["doc_id"] = "__flush__"
    tok_flush["event_time"] = flush_t
    lab_flush = lab_pdf.iloc[[0]].copy()
    lab_flush["doc_id"] = "__flush__lab"
    lab_flush["event_time"] = flush_t

    tsrc = EpochFileSource(spark, str(tmp_path / "tok"), TOKENS_STREAM_SCHEMA)
    lsrc = EpochFileSource(spark, str(tmp_path / "lab"), LABELS_SCHEMA)
    n_t, n_l = len(tok_pdf), len(lab_pdf)
    for k in range(3):
        tsrc.add_epoch(tok_pdf.iloc[(n_t * k) // 3 : (n_t * (k + 1)) // 3])
        lsrc.add_epoch(lab_pdf.iloc[(n_l * k) // 3 : (n_l * (k + 1)) // 3])
    tsrc.add_epoch(tok_flush)
    lsrc.add_epoch(lab_flush)

    sink = ExactlyOnceParquetSink(
        str(tmp_path / "out"), ["doc_id", "source", "event_time", "label_time"]
    )
    q = (
        label_join(tsrc.stream(files_per_trigger=2), lsrc.stream(files_per_trigger=2))
        .writeStream.foreachBatch(sink.foreach_batch())
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got = sink.read_all(spark).drop("epoch").toPandas()
    got = got[~got["doc_id"].str.startswith("__flush__")]

    tokens_b = spark.createDataFrame(tok_pdf, TOKENS_STREAM_SCHEMA)
    labels_b = spark.createDataFrame(lab_pdf, LABELS_SCHEMA)
    want = label_join(tokens_b, labels_b, streaming=False).toPandas()

    assert len(got) > 100  # the join actually matched
    pd.testing.assert_frame_equal(_canon(got), _canon(want), check_dtype=False)


def test_salted_join_parity_with_plain(spark, tmp_path):
    """Salted split-path join must produce exactly the plain join's
    output multiset (batch mode: same code path, salting on)."""
    from diffdataflowmlpipelines_spark.sources.fixtures import HOT_KEYS
    from diffdataflowmlpipelines_spark.streaming.join import salted_label_join

    tok_pdf = gen_tokens_pdf(800, seed=44, rows_per_second=50, hot_frac=0.2)
    lab_pdf = gen_labels_pdf(tok_pdf, seed=45)
    tokens = spark.createDataFrame(tok_pdf, TOKENS_STREAM_SCHEMA)
    labels = spark.createDataFrame(lab_pdf, LABELS_SCHEMA)

    plain = label_join(tokens, labels, streaming=False).toPandas()
    salted = salted_label_join(
        tokens, labels, HOT_KEYS, n_salts=4, streaming=False
    ).toPandas()
    assert len(plain) > 100
    pd.testing.assert_frame_equal(_canon(plain), _canon(salted), check_dtype=False)


def test_salted_join_with_autodetected_hot_keys(spark, tmp_path):
    """End-to-end auto-skew path: hot keys derived from batch key
    frequencies (detect_hot_keys over the input prefix) feed
    salted_label_join; output must equal the plain join's multiset."""
    from diffdataflowmlpipelines_spark.operators.skew import detect_hot_keys
    from diffdataflowmlpipelines_spark.sources.fixtures import HOT_KEYS
    from diffdataflowmlpipelines_spark.streaming.join import salted_label_join

    tok_pdf = gen_tokens_pdf(800, seed=46, rows_per_second=50, hot_frac=0.2)
    lab_pdf = gen_labels_pdf(tok_pdf, seed=47)
    tokens = spark.createDataFrame(tok_pdf, TOKENS_STREAM_SCHEMA)
    labels = spark.createDataFrame(lab_pdf, LABELS_SCHEMA)

    hot = detect_hot_keys(tokens, "doc_id", min_share=0.005, skew_factor=4.0)
    assert hot and set(hot) <= set(HOT_KEYS)

    plain = label_join(tokens, labels, streaming=False).toPandas()
    salted = salted_label_join(
        tokens, labels, hot, n_salts=4, streaming=False
    ).toPandas()
    pd.testing.assert_frame_equal(_canon(plain), _canon(salted), check_dtype=False)


def test_salted_join_streaming(spark, tmp_path):
    """Streaming salted join: same epoch-fed protocol as the plain test,
    compared against the batch salted output."""
    from diffdataflowmlpipelines_spark.sources.fixtures import HOT_KEYS
    from diffdataflowmlpipelines_spark.streaming.join import salted_label_join

    tok_pdf = gen_tokens_pdf(600, seed=46, rows_per_second=50, hot_frac=0.2)
    lab_pdf = gen_labels_pdf(tok_pdf, seed=47)

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
        salted_label_join(tsrc.stream(2), lsrc.stream(2), HOT_KEYS, n_salts=4)
        .writeStream.foreachBatch(sink.foreach_batch())
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = sink.read_all(spark).drop("epoch").toPandas()
    got = got[~got["doc_id"].str.startswith("__flush__")]

    want = label_join(
        spark.createDataFrame(tok_pdf, TOKENS_STREAM_SCHEMA),
        spark.createDataFrame(lab_pdf, LABELS_SCHEMA),
        streaming=False,
    ).toPandas()
    assert len(got) > 50
    pd.testing.assert_frame_equal(_canon(got), _canon(want), check_dtype=False)


def test_recommended_state_partitions():
    """Sizing rule from the measured join_tune matrices (SCALING.md):
    ~20k rows/partition/batch density, power-of-two, capped at the
    available parallelism."""
    import pytest

    from diffdataflowmlpipelines_spark.streaming.join import (
        recommended_state_partitions,
    )

    # the two measured shapes reproduce their measured winners
    assert recommended_state_partitions(200_000, max_parallelism=32) == 8
    assert recommended_state_partitions(1_333_333, max_parallelism=64) == 64
    # tiny batches never go below one partition
    assert recommended_state_partitions(1, max_parallelism=32) == 1
    assert recommended_state_partitions(19_999, max_parallelism=32) == 1
    # parallelism cap binds on huge batches
    assert recommended_state_partitions(10_000_000, max_parallelism=32) == 32
    # non-power-of-two cap rounds down
    assert recommended_state_partitions(10_000_000, max_parallelism=48) == 32
    with pytest.raises(ValueError):
        recommended_state_partitions(0, max_parallelism=32)
    with pytest.raises(ValueError):
        recommended_state_partitions(100, max_parallelism=0)
