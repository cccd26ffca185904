"""Stateful per-key feature stream (inter-arrival + recursive EWMA):
parity with a pure-python replay over any in-order epoch split, plus
checkpoint resume."""

from __future__ import annotations

import random
from datetime import datetime, timedelta

import pandas as pd
import pytest
from pyspark.sql import types as T

from diffdataflowmlpipelines_spark.streaming.features import (
    streaming_event_features,
)
from diffdataflowmlpipelines_spark.streaming.sink import ExactlyOnceParquetSink
from diffdataflowmlpipelines_spark.streaming.sources import EpochFileSource

T0 = datetime(2024, 1, 1)
ALPHA = 0.1

EV_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("event_time", T.TimestampType(), False),
        T.StructField("event_id", T.LongType(), False),
        T.StructField("value", T.DoubleType(), False),
    ]
)


def _events(seed, n=300, users=12):
    rnd = random.Random(seed)
    rows = []
    for i in range(n):
        rows.append(
            (
                rnd.randrange(users),
                T0 + timedelta(seconds=i * 3 + rnd.randrange(3)),
                i,
                round(rnd.uniform(0, 100), 3),
            )
        )
    return rows


def _python_replay(rows):
    """Sequential oracle in (event_time, event_id) order per key."""
    state: dict[int, tuple] = {}
    out = {}
    for u, t, eid, v in sorted(rows, key=lambda r: (r[1], r[2])):
        last, seq, ewma = state.get(u, (None, 0, None))
        us = int(t.timestamp() * 1_000_000)
        secs = (us - last) // 1_000_000 if last is not None else -1
        seq += 1
        ewma = v if ewma is None else ALPHA * v + (1 - ALPHA) * ewma
        out[eid] = (u, secs, seq, ewma)
        state[u] = (us, seq, ewma)
    return out


def _run(spark, tmp_path, epochs, restart_after=None):
    src = EpochFileSource(spark, str(tmp_path / "src"), EV_SCHEMA)
    sink = ExactlyOnceParquetSink(str(tmp_path / "out"), ["event_id"])

    def start():
        return (
            streaming_event_features(src.stream(), alpha=ALPHA)
            .writeStream.foreachBatch(sink.foreach_batch())
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )

    if restart_after is None:
        for ep in epochs:
            src.add_epoch(ep)
        start().awaitTermination(300)
    else:
        for ep in epochs[:restart_after]:
            src.add_epoch(ep)
        start().awaitTermination(300)
        for ep in epochs[restart_after:]:
            src.add_epoch(ep)
        start().awaitTermination(300)
    return sink


def _epochize(rows, n_epochs):
    """In-order split (epoch-monotone event time, the operator's stated
    assumption)."""
    rows = sorted(rows, key=lambda r: (r[1], r[2]))
    size = max(1, len(rows) // n_epochs)
    out = []
    for i in range(0, len(rows), size):
        chunk = rows[i : i + size]
        out.append(
            pd.DataFrame(
                {
                    "user_id": [r[0] for r in chunk],
                    "event_time": [r[1] for r in chunk],
                    "event_id": [r[2] for r in chunk],
                    "value": [r[3] for r in chunk],
                }
            )
        )
    return out


@pytest.mark.parametrize("n_epochs", [1, 5])
def test_streaming_features_parity(spark, tmp_path, n_epochs):
    rows = _events(13)
    sink = _run(spark, tmp_path, _epochize(rows, n_epochs))
    got = {
        r["event_id"]: (r["user_id"], r["secs_since_prev"], r["event_seq"], r["ewma"])
        for r in sink.read_current(spark).collect()
    }
    want = _python_replay(rows)
    assert set(got) == set(want)
    for eid, (u, secs, seq, ewma) in want.items():
        gu, gsecs, gseq, gewma = got[eid]
        assert (gu, gsecs, gseq) == (u, secs, seq), eid
        assert gewma == pytest.approx(ewma, rel=1e-12), eid


def test_streaming_features_checkpoint_resume(spark, tmp_path):
    rows = _events(29)
    sink = _run(spark, tmp_path, _epochize(rows, 4), restart_after=2)
    got = {
        r["event_id"]: (r["secs_since_prev"], r["event_seq"], r["ewma"])
        for r in sink.read_current(spark).collect()
    }
    want = _python_replay(rows)
    assert set(got) == set(want)
    for eid, (_, secs, seq, ewma) in want.items():
        assert got[eid][0] == secs and got[eid][1] == seq
        assert got[eid][2] == pytest.approx(ewma, rel=1e-12)


def test_streaming_features_multi_chunk_batches(spark, tmp_path):
    """A key whose micro-batch spans MULTIPLE Arrow chunks (tiny
    maxRecordsPerBatch) with later event times in the earlier chunks:
    the processor must concatenate all chunks before its one global
    sort — a per-chunk sort threads state in the wrong order."""
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "16")
    try:
        rows = [
            (1, T0 + timedelta(seconds=i), i, float((i * 37) % 100))
            for i in range(200)
        ]
        # file written newest-first: chunk 1 carries the LATEST times
        epoch = pd.DataFrame(
            {
                "user_id": [r[0] for r in reversed(rows)],
                "event_time": [r[1] for r in reversed(rows)],
                "event_id": [r[2] for r in reversed(rows)],
                "value": [r[3] for r in reversed(rows)],
            }
        )
        sink = _run(spark, tmp_path, [epoch])
        got = {
            r["event_id"]: (r["secs_since_prev"], r["event_seq"], r["ewma"])
            for r in sink.read_current(spark).collect()
        }
        want = _python_replay(rows)
        assert set(got) == set(want)
        for eid, (_, secs, seq, ewma) in want.items():
            assert got[eid][0] == secs and got[eid][1] == seq, eid
            assert got[eid][2] == pytest.approx(ewma, rel=1e-12), eid
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
