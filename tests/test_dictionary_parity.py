"""Batch/streaming dictionary index parity — closes the documented
arrival-order deviation (VERDICT r1 'What's missing' #4): for insert-
only epochs with n_shards=1, fit_dictionary(order='first_seen') over
each prefix must produce the exact token->index map the streaming
incremental vocabulary (reference PositionAssignmentAggregate,
integer_assignment_aggregate.rs:43-50) holds after that epoch."""

from __future__ import annotations

from datetime import datetime, timedelta

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from diffdataflowmlpipelines_spark.operators.encoders import fit_dictionary
from diffdataflowmlpipelines_spark.streaming.sink import ExactlyOnceParquetSink
from diffdataflowmlpipelines_spark.streaming.sources import EpochFileSource
from diffdataflowmlpipelines_spark.streaming.vocabulary import (
    incremental_vocabulary,
)

TOK_SCHEMA = T.StructType(
    [
        T.StructField("token", T.StringType(), False),
        T.StructField("diff", T.LongType(), False),
        T.StructField("event_time", T.TimestampType(), False),
    ]
)
T0 = datetime(2024, 1, 1)


def _epochs():
    seqs = [
        ["pear", "apple", "pear", "plum"],          # first-seen: pear,apple,plum
        ["kiwi", "apple", "fig"],                   # adds kiwi, fig
        ["plum", "banana", "banana", "cherry"],     # adds banana, cherry
    ]
    out = []
    for i, toks in enumerate(seqs):
        out.append(
            pd.DataFrame(
                {
                    "token": toks,
                    "diff": [1] * len(toks),
                    "event_time": [
                        T0 + timedelta(seconds=i * 100 + j)
                        for j in range(len(toks))
                    ],
                }
            )
        )
    return out


def test_batch_first_seen_matches_streaming_vocabulary(spark, tmp_path):
    epochs = _epochs()
    src = EpochFileSource(spark, str(tmp_path / "src"), TOK_SCHEMA)
    sink = ExactlyOnceParquetSink(str(tmp_path / "out"), ["token"])

    for k, ep in enumerate(epochs):
        src.add_epoch(ep)
        q = (
            incremental_vocabulary(src.stream(), n_shards=1)
            .writeStream.foreachBatch(sink.foreach_batch())
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

        streaming_map = {
            r["token"]: r["idx"]
            for r in sink.read_current(spark).collect()
            if r["idx"] >= 0
        }

        # batch over the same prefix with arrival order as __row_order
        prefix = pd.concat(epochs[: k + 1], ignore_index=True)
        prefix["__row_order"] = range(len(prefix))
        bdf = spark.createDataFrame(
            prefix[["token", "diff", "__row_order"]],
            "token string, diff long, __row_order long",
        )
        batch_map = {
            r["token"]: r["__idx"]
            for r in fit_dictionary(bdf, "token", order="first_seen").collect()
        }
        assert batch_map == streaming_map, f"epoch {k}"
