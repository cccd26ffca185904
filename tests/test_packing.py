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
