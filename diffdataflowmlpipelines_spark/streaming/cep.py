"""Streaming CEP: incremental event-funnel detection per key
(streaming twin of functions/cep.event_funnel; north_rule "CEP engine").

Stateful operator (``applyInPandasWithState`` keyed by the funnel key)
that maintains, per key, the *candidate time lists* needed to recompute
the earliest-anchor cascade exactly — so it is robust to out-of-order
arrival ACROSS micro-batches (a late-arriving earlier 'view' re-anchors
the funnel and the emitted completion times move accordingly), not just
within one batch.

Bounded state, with proofs in the pruning comments:

* without ``within_s``, completions are monotonically NONINCREASING as
  events accumulate (adding candidates can only move each min
  earlier), so any step-i candidate time strictly greater than the
  current step-i completion can never be chosen later — dropped;
* with ``within_s``, a late-arriving earlier anchor can also RETRACT a
  completion (the window ``[anchor, anchor+within]`` only moves
  earlier) — emitted rows then update to earlier times or NULL. The
  same pruning stays safe: a dropped time ``t > comp_i`` could only be
  chosen after ``comp_i`` turns ineligible, which requires the horizon
  to shrink below ``comp_i < t`` — making ``t`` ineligible too;
* step 0 needs only its minimum; candidate times beyond
  ``min(step_1) + within`` never qualify, so the whole per-key state
  is bounded by the funnel horizon — the CEP analogue of a watermark
  bound (unbounded only for never-anchored keys with no ``within``).

Emission ("update" mode): one row per key per batch that saw events —
the key's CURRENT funnel row, identical in schema and values to the
batch ``event_funnel`` over every event seen so far (the parity test
pins last-emitted-per-key == batch recompute, including under
cross-batch out-of-order delivery).
"""

from __future__ import annotations

import bisect
from collections.abc import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupStateTimeout

from diffdataflowmlpipelines_spark.functions.cep import funnel_cascade


def _state_schema(k: int) -> str:
    return ", ".join(f"l{i} array<long>" for i in range(k))


def _output_schema(k: int, key_type: str) -> str:
    steps = ", ".join(f"step_{i + 1}_ts timestamp" for i in range(k))
    return f"key {key_type}, {steps}, steps_completed int"


def _funnel_fn(steps: Sequence[str], within_us: int | None):
    k = len(steps)
    step_ix = {s: i for i, s in enumerate(steps)}

    def fn(key, pdfs: Iterator[pd.DataFrame], state):
        lists: list[list[int]] = (
            [[int(v) for v in x] for x in state.get]
            if state.exists
            else [[] for _ in range(k)]
        )
        for pdf in pdfs:
            ts = pdf["event_time"].astype("datetime64[us]").astype("int64")
            for t, ty in zip(ts, pdf["event_type"]):
                bisect.insort(lists[step_ix[ty]], int(t))
        comp = funnel_cascade(lists, within_us)
        # prune: times > current completion are never chosen again
        # (completions only move earlier); step 0 keeps its min only;
        # within prunes everything beyond the anchor horizon.
        lists[0] = lists[0][:1]
        horizon = (
            lists[0][0] + within_us if within_us is not None and lists[0] else None
        )
        for i in range(1, k):
            if comp[i] is not None:
                lists[i] = lists[i][: bisect.bisect_right(lists[i], comp[i])]
            if horizon is not None:
                lists[i] = lists[i][: bisect.bisect_right(lists[i], horizon)]
        state.update(tuple(lists))
        row = {"key": key[0]}
        for i in range(k):
            row[f"step_{i + 1}_ts"] = (
                pd.Timestamp(comp[i], unit="us") if comp[i] is not None else pd.NaT
            )
        row["steps_completed"] = sum(1 for t in comp if t is not None)
        yield pd.DataFrame([row])

    return fn


def streaming_event_funnel(
    events: DataFrame,
    steps: Sequence[str],
    *,
    key_col: str = "user_id",
    time_col: str = "event_time",
    type_col: str = "event_type",
    within_s: int | None = None,
    key_type: str = "long",
) -> DataFrame:
    """Per-key funnel state stream. The type filter is stateless and
    pushed to the source scan; state lives only for keys that emit step
    events. Parity invariant (pinned in tests/test_streaming_cep.py):
    last emitted row per key == functions/cep.event_funnel over the
    union of all epochs, for any epoch split and cross-epoch arrival
    order."""
    k = len(steps)
    keyed = events.filter(F.col(type_col).isin(list(steps))).select(
        F.col(key_col).cast(key_type).alias("key"),
        F.col(time_col).cast("timestamp").alias("event_time"),
        F.col(type_col).alias("event_type"),
    )
    within_us = int(within_s) * 1_000_000 if within_s is not None else None
    return keyed.groupBy("key").applyInPandasWithState(
        _funnel_fn(steps, within_us),
        outputStructType=_output_schema(k, key_type),
        stateStructType=_state_schema(k),
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
