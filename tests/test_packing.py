"""Sequence packing: hand-computed window semantics + parity between
the window form (oracle-checked as t8) and the sharded distributed
prefix-sum form (the 100-TB shape, no global sort-window)."""

from __future__ import annotations

from pyspark.sql import functions as F

from diffdataflowmlpipelines_spark.functions.packing import (
    pack_sequences,
    pack_sequences_sharded,
)


def _rows(df):
    return sorted(
        (r["source"], r["doc_id"], r["n_tok"], r["chunk"], r["chunk_offset"])
        for r in df.collect()
    )


def test_pack_sequences_hand_case(spark):
    df = spark.createDataFrame(
        [
            ("a", 1, 300),  # starts at 0   -> chunk 0, offset 0
            ("a", 2, 300),  # starts at 300 -> chunk 0, offset 300 (straddles)
            ("a", 3, 100),  # starts at 600 -> chunk 1, offset 88
            ("b", 7, 600),  # separate stratum restarts at 0
            ("b", 9, 10),  # starts at 600 -> chunk 1, offset 88
        ],
        "source string, doc_id long, n_tok long",
    )
    got = _rows(pack_sequences(df, "doc_id", "n_tok", "source", budget=512))
    assert got == [
        ("a", 1, 300, 0, 0),
        ("a", 2, 300, 0, 300),
        ("a", 3, 100, 1, 88),
        ("b", 7, 600, 0, 0),
        ("b", 9, 10, 1, 88),
    ]


def test_sharded_packing_parity(spark):
    # 1200 docs over 7 strata with irregular lengths; several shards so
    # strata straddle partition boundaries
    df = spark.range(1200).select(
        F.concat(F.lit("s"), F.pmod(F.col("id"), F.lit(7))).alias("source"),
        F.col("id").alias("doc_id"),
        (F.pmod(F.xxhash64("id"), F.lit(900)) + 1).cast("long").alias("n_tok"),
    )
    want = _rows(pack_sequences(df, "doc_id", "n_tok", "source", budget=256))
    got = _rows(
        pack_sequences_sharded(
            df, "doc_id", "n_tok", "source", budget=256, n_shards=11
        )
    )
    assert got == want
    # chunk boundaries are token-exact: next chunk's first doc starts at
    # offset (prev_start + len) mod budget
    assert len({(s, c) for s, _, _, c, _ in got}) > 20  # real multi-chunk load


def test_streaming_batch_packing_any_epoch_split(spark, tmp_path):
    """Property: for ANY split of an id-ordered stream into epochs, the
    streaming packer's accumulated emissions equal the batch packing of
    the union (state carries exact token offsets across boundaries)."""
    from datetime import datetime, timedelta

    import pandas as pd
    from pyspark.sql import types as T

    from diffdataflowmlpipelines_spark.streaming.packing import (
        incremental_packing,
    )
    from diffdataflowmlpipelines_spark.streaming.sink import (
        ExactlyOnceParquetSink,
    )
    from diffdataflowmlpipelines_spark.streaming.sources import EpochFileSource

    schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType(), False),
            T.StructField("n_tok", T.LongType(), False),
            T.StructField("source", T.StringType(), False),
            T.StructField("event_time", T.TimestampType(), False),
        ]
    )
    t0 = datetime(2024, 1, 1)
    n = 90
    pdf = pd.DataFrame(
        {
            "doc_id": [f"d{i:06d}" for i in range(n)],
            "n_tok": [((i * 101) % 217) + 1 for i in range(n)],
            "source": [f"s{i % 2}" for i in range(n)],
            "event_time": [t0 + timedelta(seconds=i) for i in range(n)],
        }
    )
    for cuts in ([13], [1, 2, 3], [45, 89]):  # uneven, tiny, boundary epochs
        edges = [0, *cuts, n]
        wd = tmp_path / f"cut{'_'.join(map(str, cuts))}"
        src = EpochFileSource(spark, str(wd / "src"), schema)
        sink = ExactlyOnceParquetSink(str(wd / "out"), ["source", "doc_id"])
        for a, b in zip(edges, edges[1:]):
            src.add_epoch(pdf.iloc[a:b])
            q = (
                incremental_packing(src.stream(), budget=128)
                .writeStream.foreachBatch(sink.foreach_batch())
                .outputMode("update")
                .option("checkpointLocation", str(wd / "ckpt"))
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(300)
        got = sorted(
            (r["source"], r["doc_id"], r["chunk"], r["chunk_offset"])
            for r in sink.read_current(spark).collect()
        )
        want = sorted(
            (r["source"], r["doc_id"], r["chunk"], r["chunk_offset"])
            for r in pack_sequences(
                spark.createDataFrame(pdf, schema), "doc_id", "n_tok", "source", 128
            ).collect()
        )
        assert got == want, cuts


def test_sharded_packing_null_keys_parity(spark):
    """NULL stratum / NULL doc_id rows are real groups/rows in the
    window form (Spark nulls-first ordering, null group kept); the
    sharded twin must agree instead of crashing on pandas' NaN-last
    sort and null-dropping groupby."""
    rows = [
        ("a", 1, 100),
        ("a", 2, 500),
        (None, 3, 300),   # null stratum: its own group
        (None, 4, 300),
        ("b", None, 50),  # null id: sorts FIRST within stratum b
        ("b", 6, 600),
    ]
    df = spark.createDataFrame(rows, "source string, doc_id long, n_tok long")
    want = {
        (r["source"], r["doc_id"], r["n_tok"], r["chunk"], r["chunk_offset"])
        for r in pack_sequences(df, "doc_id", "n_tok", "source", budget=512).collect()
    }
    got = {
        (r["source"], r["doc_id"], r["n_tok"], r["chunk"], r["chunk_offset"])
        for r in pack_sequences_sharded(
            df, "doc_id", "n_tok", "source", budget=512, n_shards=4
        ).collect()
    }
    assert got == want
    assert (None, 4, 300, 0, 300) in got  # null stratum packed from 0
    assert ("b", 6, 600, 0, 50) in got  # null id consumed offset 0..50
