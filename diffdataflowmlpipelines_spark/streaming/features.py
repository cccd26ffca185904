"""Stateful per-key feature streams: inter-arrival lag and recursive
EWMA (streaming twins of the w8/w9 batch feature queries).

Both keep O(1) state per key — the previous event time / ordinal for
the lag features, the running smoothed value for the EWMA — which is
the form that scales to unbounded history (the batch w9 uses a
trailing-window closed form instead; the recursion here has no window
to truncate and no overflow concern).

Ordering: rows are applied in (event_time, event_id) order within each
micro-batch; across batches the state is strictly sequential, so the
operator assumes epoch-monotone event time like the incremental
vocabulary does (the repo's epoch-file sources deliver that; a
late-arriving earlier event would need the CEP-style candidate-buffer
treatment instead, which these O(1) features deliberately trade away).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupStateTimeout

FEATURE_OUTPUT_SCHEMA = (
    "user_id long, event_id long, secs_since_prev long, event_seq long, "
    "ewma double"
)
FEATURE_STATE_SCHEMA = "last_us long, seq long, ewma double"


def _features_fn(alpha: float):
    def fn(key, pdfs: Iterator[pd.DataFrame], state):
        last_us, seq, ewma = state.get if state.exists else (None, 0, None)
        rows = []
        # concatenate ALL Arrow chunks before the one global sort — a
        # key whose batch spans multiple chunks (maxRecordsPerBatch)
        # has no cross-chunk ordering guarantee, and state threads
        # sequentially (same bug class as the TWS vocabulary fix)
        chunks = [c for c in pdfs if len(c)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True)
            pdf = pdf[pdf["event_time"].notna()]
            pdf = pdf.sort_values(["event_time", "event_id"], kind="stable")
            ts = pdf["event_time"].astype("datetime64[us]").astype("int64")
            for t, eid, val in zip(ts, pdf["event_id"], pdf["value"]):
                secs = (int(t) - last_us) // 1_000_000 if last_us is not None else -1
                seq += 1
                # a NULL value updates lag/seq but not the smoothed
                # statistic (the batch w9 SUM skips NULLs the same way);
                # float(NaN) folding in would poison the key forever
                if not pd.isna(val):
                    v = float(val)
                    ewma = v if ewma is None else alpha * v + (1.0 - alpha) * ewma
                rows.append((key[0], int(eid), secs, seq, ewma))
                last_us = int(t)
        state.update((last_us, seq, ewma))
        if rows:
            yield pd.DataFrame(
                rows,
                columns=[
                    "user_id", "event_id", "secs_since_prev", "event_seq", "ewma",
                ],
            )

    return fn


def streaming_event_features(
    events: DataFrame,
    *,
    key_col: str = "user_id",
    time_col: str = "event_time",
    id_col: str = "event_id",
    value_col: str = "value",
    alpha: float = 0.1,
) -> DataFrame:
    """One row per input event carrying (secs_since_prev, event_seq,
    ewma) for its key — append-mode emission (each event's features are
    final under the epoch-monotone assumption above)."""
    keyed = events.filter(
        F.col(time_col).isNotNull() & F.col(id_col).isNotNull()
    ).select(
        F.col(key_col).cast("long").alias("user_id"),
        F.col(time_col).cast("timestamp").alias("event_time"),
        F.col(id_col).cast("long").alias("event_id"),
        F.col(value_col).cast("double").alias("value"),
    )
    return keyed.groupBy("user_id").applyInPandasWithState(
        _features_fn(alpha),
        outputStructType=FEATURE_OUTPUT_SCHEMA,
        stateStructType=FEATURE_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
