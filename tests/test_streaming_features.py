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


# --- retraction-capable twin -------------------------------------------------

RET_SCHEMA = T.StructType(
    [*EV_SCHEMA.fields, T.StructField("diff", T.LongType(), False)]
)

from diffdataflowmlpipelines_spark.streaming.features import (  # noqa: E402
    streaming_event_features_retractable,
)


def _ret_epoch(rows):
    return pd.DataFrame(
        {
            "user_id": [r[0] for r in rows],
            "event_time": [r[1] for r in rows],
            "event_id": [r[2] for r in rows],
            "value": [r[3] for r in rows],
            "diff": [r[4] for r in rows],
        }
    )


def _run_retract(spark, tmp_path, epochs, horizon_s=None):
    src = EpochFileSource(spark, str(tmp_path / "src"), RET_SCHEMA)
    sink = ExactlyOnceParquetSink(str(tmp_path / "out"), ["event_id"])
    for ep in epochs:
        src.add_epoch(_ret_epoch(ep))
    (
        streaming_event_features_retractable(
            src.stream(), alpha=ALPHA, horizon_s=horizon_s
        )
        .writeStream.foreachBatch(sink.foreach_batch())
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination(300)
    )
    return sink


def _view(spark, sink):
    return {
        r["event_id"]: (
            r["secs_since_prev"],
            r["event_seq"],
            r["ewma"],
            r["deleted"],
        )
        for r in sink.read_current(spark).collect()
    }


def test_retractable_late_delete_reemits_corrections(spark, tmp_path):
    base = [(1, T0 + timedelta(seconds=10 * i), i, float(10 + i)) for i in range(6)]
    e1 = [(*r, 1) for r in base]
    e2 = [(1, base[2][1], 2, base[2][3], -1)]  # late delete of event 2
    sink = _run_retract(spark, tmp_path, [e1, e2])
    view = _view(spark, sink)
    assert view[2][3] is True  # tombstone wins the upsert view
    want = _python_replay([r for r in base if r[2] != 2])
    for eid, (_u, secs, seq, ewma) in want.items():
        assert view[eid] == (secs, seq, ewma, False)
    # the delete epoch re-emitted EXACTLY the affected suffix (3, 4, 5)
    # plus the tombstone — events 0 and 1 were untouched
    per_epoch = sink.read_all(spark).collect()
    last = max(r["epoch"] for r in per_epoch)
    emitted = {r["event_id"] for r in per_epoch if r["epoch"] == last}
    assert emitted == {2, 3, 4, 5}


def test_retractable_late_insert_corrects_downstream(spark, tmp_path):
    base = [(1, T0 + timedelta(seconds=10 * i), i, float(i)) for i in range(5)]
    late = (1, T0 + timedelta(seconds=25), 99, 7.5)  # lands between 2 and 3
    sink = _run_retract(spark, tmp_path, [[(*r, 1) for r in base], [(*late, 1)]])
    view = _view(spark, sink)
    want = _python_replay(base + [late])
    assert len(view) == 6 and not any(v[3] for v in view.values())
    for eid, (_u, secs, seq, ewma) in want.items():
        assert view[eid] == (secs, seq, ewma, False)


def test_retractable_insert_only_matches_append_twin_replay(spark, tmp_path):
    rows = _events(7, n=120, users=5)
    epochs = [
        [(*r, 1) for r in rows[:40]],
        [(*r, 1) for r in rows[40:80]],
        [(*r, 1) for r in rows[80:]],
    ]
    sink = _run_retract(spark, tmp_path, epochs)
    view = _view(spark, sink)
    want = _python_replay(rows)
    assert len(view) == len(want)
    for eid, (_u, secs, seq, ewma) in want.items():
        assert view[eid][:3] == (secs, seq, ewma) and view[eid][3] is False


def test_retractable_horizon_freezes_and_ignores_old_deletes(spark, tmp_path):
    base = [(1, T0 + timedelta(seconds=10 * i), i, float(i + 1)) for i in range(12)]
    # horizon 30 s: after epoch 1 (max t = 110 s) everything <= 80 s is
    # frozen; epoch 2's delete of event 0 (t=0) must be IGNORED
    e2 = [(1, base[0][1], 0, base[0][3], -1)]
    # and a fresh in-horizon insert must still extend the stream exactly
    tail = (1, T0 + timedelta(seconds=115), 50, 2.5)
    sink = _run_retract(spark, tmp_path, [[(*r, 1) for r in base], e2, [(*tail, 1)]], horizon_s=30)
    view = _view(spark, sink)
    want = _python_replay(base + [tail])  # delete had no effect
    assert len(view) == 13 and not any(v[3] for v in view.values())
    for eid, (_u, secs, seq, ewma) in want.items():
        assert view[eid] == (secs, seq, ewma, False)


def test_retractable_horizon_ignores_inserts_behind_frozen_prefix(spark, tmp_path):
    # an insert timestamped BEFORE the frozen prefix would otherwise
    # walk from frozen_us with a negative lag and a wrong ordinal —
    # it must be ignored exactly like an out-of-horizon delete
    base = [(1, T0 + timedelta(seconds=10 * i), i, float(i + 1)) for i in range(12)]
    stale = (1, T0 + timedelta(seconds=5), 77, 9.9)  # behind the frozen prefix
    sink = _run_retract(
        spark, tmp_path, [[(*r, 1) for r in base], [(*stale, 1)]], horizon_s=30
    )
    view = _view(spark, sink)
    want = _python_replay(base)  # the stale insert had no effect
    assert 77 not in view and len(view) == 12
    for eid, (_u, secs, seq, ewma) in want.items():
        assert view[eid] == (secs, seq, ewma, False)


def test_retractable_all_tombstone_batch(spark, tmp_path):
    # deleting the LAST event produces a batch whose only emission is
    # the tombstone — every feature column all-None (the pyarrow
    # empty-object-column inference trap from CLAUDE.md)
    base = [(1, T0 + timedelta(seconds=10 * i), i, float(i)) for i in range(4)]
    e2 = [(1, base[3][1], 3, base[3][3], -1)]
    sink = _run_retract(spark, tmp_path, [[(*r, 1) for r in base], e2])
    view = _view(spark, sink)
    assert view[3][3] is True
    want = _python_replay(base[:3])
    for eid, (_u, secs, seq, ewma) in want.items():
        assert view[eid] == (secs, seq, ewma, False)


def test_retractable_null_diff_rows_filtered_not_crash(spark, tmp_path):
    # a NULL diff is not an update: int(NaN) would abort the query
    base = [(1, T0 + timedelta(seconds=10 * i), i, float(i), 1) for i in range(3)]
    withnull = base + [(1, T0 + timedelta(seconds=40), 9, 4.0, None)]
    ep = _ret_epoch(withnull)
    # [1, 1, 1, None] infers float64 -> parquet DOUBLE vs declared long
    ep["diff"] = ep["diff"].astype("Int64")
    src = EpochFileSource(
        spark,
        str(tmp_path / "src"),
        T.StructType([*EV_SCHEMA.fields, T.StructField("diff", T.LongType(), True)]),
    )
    sink = ExactlyOnceParquetSink(str(tmp_path / "out"), ["event_id"])
    src.add_epoch(ep)
    (
        streaming_event_features_retractable(src.stream(), alpha=ALPHA)
        .writeStream.foreachBatch(sink.foreach_batch())
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination(300)
    )
    view = _view(spark, sink)
    assert 9 not in view and len(view) == 3


def test_retractable_insert_tied_with_frozen_boundary_ignored(spark, tmp_path):
    # t == frozen_us may belong BEFORE the last frozen event in (t, eid)
    # order, which no replay from frozen state can honor -> ignored
    base = [(1, T0 + timedelta(seconds=10 * i), i, float(i + 1)) for i in range(12)]
    # after epoch 1 with horizon 30 s: cutoff = 110 - 30 = 80 s, frozen
    # prefix ends at t = 80 s (event 8); the tied insert targets 80 s
    tied = (1, T0 + timedelta(seconds=80), 3, 5.0)
    sink = _run_retract(
        spark, tmp_path, [[(*r, 1) for r in base], [(*tied, 1)]], horizon_s=30
    )
    view = _view(spark, sink)
    want = _python_replay(base)
    assert 3 in view and len(view) == 12  # original event 3 intact, no 13th
    for eid, (_u, secs, seq, ewma) in want.items():
        assert view[eid] == (secs, seq, ewma, False)
