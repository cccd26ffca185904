"""streaming_range_join: the keyless bucketed interval join (j4's
batch trick) as a watermarked stream-stream join — epoch-fed, parity
vs the identical plan on batch frames, plus parity with the batch
operator itself."""

from __future__ import annotations

import datetime as dt
import random

import pandas as pd
from pyspark.sql import types as T

from diffdataflowmlpipelines_spark.streaming.join import streaming_range_join
from diffdataflowmlpipelines_spark.streaming.sink import ExactlyOnceParquetSink
from diffdataflowmlpipelines_spark.streaming.sources import EpochFileSource

L_SCHEMA = T.StructType(
    [
        T.StructField("lid", T.LongType(), False),
        T.StructField("lt", T.TimestampType(), False),
    ]
)
R_SCHEMA = T.StructType(
    [
        T.StructField("rid", T.LongType(), False),
        T.StructField("rt", T.TimestampType(), False),
    ]
)

BASE = dt.datetime(2024, 1, 1)


def _pdfs(n_left=150, n_right=200, span_s=300.0, seed=5):
    rng = random.Random(seed)
    lp = pd.DataFrame(
        {
            "lid": range(n_left),
            "lt": [BASE + dt.timedelta(seconds=rng.uniform(0, span_s)) for _ in range(n_left)],
        }
    )
    rp = pd.DataFrame(
        {
            "rid": range(n_right),
            "rt": [BASE + dt.timedelta(seconds=rng.uniform(0, span_s)) for _ in range(n_right)],
        }
    )
    return lp, rp


def test_streaming_range_join_parity_with_batch(spark, tmp_path):
    lp, rp = _pdfs()
    lo, hi = -20.0, 5.0

    # sentinel rows drive both watermarks past every real window
    flush = BASE + dt.timedelta(hours=1)
    lf = pd.DataFrame({"lid": [10**9], "lt": [flush]})
    rf = pd.DataFrame({"rid": [10**9], "rt": [flush + dt.timedelta(hours=1)]})

    lsrc = EpochFileSource(spark, str(tmp_path / "l"), L_SCHEMA)
    rsrc = EpochFileSource(spark, str(tmp_path / "r"), R_SCHEMA)
    for k in range(3):
        lsrc.add_epoch(lp.iloc[(len(lp) * k) // 3 : (len(lp) * (k + 1)) // 3])
        rsrc.add_epoch(rp.iloc[(len(rp) * k) // 3 : (len(rp) * (k + 1)) // 3])
    lsrc.add_epoch(lf)
    rsrc.add_epoch(rf)

    sink = ExactlyOnceParquetSink(str(tmp_path / "out"), ["lid", "rid"])
    q = (
        streaming_range_join(
            lsrc.stream(files_per_trigger=2),
            rsrc.stream(files_per_trigger=2),
            "lt",
            "rt",
            lower=lo,
            upper=hi,
            watermark="30 seconds",
        )
        .select("lid", "rid")
        .writeStream.foreachBatch(sink.foreach_batch())
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got = sink.read_all(spark).drop("epoch").toPandas()
    got = got[got["lid"] < 10**9]
    got_pairs = sorted(map(tuple, got[["lid", "rid"]].itertuples(index=False)))

    lb = spark.createDataFrame(lp, L_SCHEMA)
    rb = spark.createDataFrame(rp, R_SCHEMA)
    want = streaming_range_join(
        lb, rb, "lt", "rt", lower=lo, upper=hi, streaming=False
    ).select("lid", "rid")
    want_pairs = sorted((r.lid, r.rid) for r in want.collect())

    assert len(want_pairs) > 100  # the join actually matched
    assert got_pairs == want_pairs
    # multiplicity 1 per qualifying pair survives the streaming path
    assert len(got_pairs) == len(set(got_pairs))


def test_batch_mode_matches_batch_operator(spark):
    from diffdataflowmlpipelines_spark.operators.rangejoin import (
        bucketed_range_join,
    )

    lp, rp = _pdfs(n_left=80, n_right=90, seed=9)
    lb = spark.createDataFrame(lp, L_SCHEMA)
    rb = spark.createDataFrame(rp, R_SCHEMA)
    a = streaming_range_join(
        lb, rb, "lt", "rt", lower=-7.5, upper=3.25, streaming=False
    )
    b = bucketed_range_join(lb, rb, "lt", "rt", lower=-7.5, upper=3.25)
    pa = sorted((r.lid, r.rid) for r in a.collect())
    pb = sorted((r.lid, r.rid) for r in b.collect())
    assert pa == pb and len(pa) > 0
