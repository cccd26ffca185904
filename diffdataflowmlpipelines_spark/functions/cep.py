"""Complex-event-processing primitives: ordered event-sequence (funnel)
detection per key.

The reference engine has no CEP operator; this extends the engine the
same way the windowed/interval-join family does (SURVEY §2.3 "generic
OLAP beyond the reference") and covers the "CEP" half of the target
rule (BASELINE.json north_rule: "structured-streaming / CEP engine").
Semantics follow the earliest-anchor funnel used by analytics engines
(ClickHouse ``windowFunnel``-style, but with a deterministic cascade so
an exact SQL oracle exists):

  step_1 = min t over events of type steps[0]
  step_i = min t over events of type steps[i] with t > step_{i-1}
           (and, when ``within`` is set, t <= step_1 + within)

The cascade is deterministic (no "exists any matching subsequence"
search), so DuckDB can replicate it with k chained aggregates — the
registry query ``cep1_event_funnel`` does exactly that.

Scale: one shuffle (groupBy key). The per-key fold runs entirely inside
Catalyst higher-order functions (aggregate/transform over an array of
structs) — whole-stage-codegen'd JVM execution, no Python. Per-key
state during the fold is the sorted event list for the *matched types
only* (the type filter is pushed to the parquet scan), which is the
same per-key footprint as any session-window or top-k-per-user
aggregate; skewed keys are ordinary groupBy skew (AQE / salting apply).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F


def event_funnel(
    df: DataFrame,
    key_col: str,
    time_col: str,
    type_col: str,
    steps: Sequence[str],
    within_s: int | None = None,
) -> DataFrame:
    """Earliest-anchor k-step funnel per key.

    Returns one row per key that completed at least step 1:
    ``(key, step_1_ts .. step_k_ts, steps_completed)`` where unmatched
    trailing steps are NULL and ``steps_completed`` counts the matched
    prefix.

    Implementation: filter to the k step types (scan pushdown), one
    ``groupBy(key)`` collecting ``(unix_micros(t), type)`` structs, then
    a single JVM-side fold (``F.aggregate``) over the time-sorted array
    applying the cascade above. Strict ``t >`` means one event can never
    satisfy two steps, and ties at the same timestamp do not chain.

    Precondition (enforced): event times must be >= 1970-01-01 UTC. The
    fold's unset sentinel is -1 micros, so a negative unix_micros would
    silently never complete a step — diverging from the streaming twin
    (None sentinel) and the SQL oracle. Rather than silently dropping
    such events, the map-side projection raises on the first one.
    """
    k = len(steps)
    if k == 0:
        raise ValueError("steps must be non-empty")
    steps_arr = F.array(*[F.lit(s) for s in steps])
    within_us = F.lit(int(within_s) * 1_000_000) if within_s is not None else None

    # unix_micros requires TIMESTAMP (LTZ); parquet event times are often
    # TIMESTAMP_NTZ — the cast is wall-clock-identity under the engine's
    # pinned UTC session timezone (session.get_spark), and outputs are
    # cast back to the input's own timestamp type below.
    t_type = df.schema[time_col].dataType
    # NULL event times are dropped: a null-t struct would sort first and
    # write NULL into its slot, permanently blocking the step (NULL
    # comparisons propagate through the fold)
    micros = F.unix_micros(F.col(time_col).cast("timestamp"))
    # -1 micros is the fold's unset sentinel: pre-1970 events would
    # silently never chain, so fail loudly instead (see docstring)
    checked_t = F.when(
        micros < 0,
        F.raise_error(
            F.concat(
                F.lit("event_funnel requires event times >= 1970-01-01, got "),
                F.col(time_col).cast("string"),
            )
        ).cast("long"),
    ).otherwise(micros)
    ev = df.filter(
        F.col(type_col).isin(list(steps)) & F.col(time_col).isNotNull()
    ).select(
        F.col(key_col).alias("__key"),
        F.struct(
            checked_t.alias("t"),
            F.col(type_col).alias("ty"),
        ).alias("__e"),
    )

    def merge(acc: Column, e: Column) -> Column:
        # acc: array<long> of length k (completion micros, -1 = unset).
        # Events arrive time-ascending (sort_array below), so the first
        # qualifying write per slot is the earliest one; acc is read
        # BEFORE the write, so an event can only extend yesterday's
        # prefix, never a slot it just filled itself.
        def slot(cur: Column, i: Column) -> Column:
            # F.get (not acc[i-1]): null-safe on the i==0 branch where
            # the index is -1 — ANSI mode throws on GetArrayItem(-1)
            prev = F.get(acc, i - 1)
            prev_ok = (i == 0) | (prev >= 0) & (e["t"] > prev)
            win_ok = (
                F.lit(True)
                if within_us is None
                else (i == 0) | (acc[0] >= 0) & (e["t"] <= acc[0] + within_us)
            )
            qualifies = (
                (cur < 0)
                & (e["ty"] == F.element_at(steps_arr, i + 1))
                & prev_ok
                & win_ok
            )
            return F.when(qualifies, e["t"]).otherwise(cur)

        return F.transform(acc, slot)

    init = F.array_repeat(F.lit(-1).cast("long"), k)
    agg = ev.groupBy("__key").agg(
        F.aggregate(
            F.sort_array(F.collect_list("__e")), init, merge
        ).alias("__steps")
    )

    done = F.aggregate(
        F.col("__steps"),
        F.lit(0),
        lambda n, t: F.when(t >= 0, n + 1).otherwise(n),
    )
    cols = [F.col("__key").alias(key_col)]
    for i in range(k):
        cols.append(
            F.when(F.col("__steps")[i] >= 0, F.timestamp_micros(F.col("__steps")[i]))
            .cast(t_type)
            .alias(f"step_{i + 1}_ts")
        )
    cols.append(done.cast("int").alias("steps_completed"))
    return agg.select(*cols).filter(F.col("step_1_ts").isNotNull())


def prune_candidates(
    lists: list[list[int]], comp: Sequence[int | None], within_us: int | None
) -> list[list[int]]:
    """Drop candidate times that can never be chosen again (the bounded-
    state core of the streaming processor; safety arguments in
    streaming/cep.py's module docstring). Shared with the hypothesis
    property test so the test exercises THIS code, not a copy.

    * step 0 keeps only its min (the anchor is a monotone min);
    * step i>0 keeps times <= its current completion (completions never
      move past a still-kept earlier time);
    * with ``within_us`` and an anchor present, times beyond
      ``anchor + within`` never qualify (the window only moves earlier).
    """
    import bisect

    k = len(lists)
    lists = [list(x) for x in lists]
    lists[0] = lists[0][:1]
    horizon = lists[0][0] + within_us if within_us is not None and lists[0] else None
    for i in range(1, k):
        if comp[i] is not None:
            lists[i] = lists[i][: bisect.bisect_right(lists[i], comp[i])]
        if horizon is not None:
            lists[i] = lists[i][: bisect.bisect_right(lists[i], horizon)]
    return lists


def funnel_cascade(times_by_step: Sequence[Sequence[int]], within_us: int | None):
    """Pure-python twin of the cascade (oracle for unit tests and the
    recompute core of the streaming processor): ``times_by_step[i]`` is
    the sorted candidate time list (micros) for step i. Returns list of
    k completion times (None = unmatched)."""
    import bisect

    k = len(times_by_step)
    out: list[int | None] = [None] * k
    for i in range(k):
        ts = times_by_step[i]
        if i == 0:
            out[0] = ts[0] if ts else None
        else:
            if out[i - 1] is None:
                break
            j = bisect.bisect_right(ts, out[i - 1])
            t = ts[j] if j < len(ts) else None
            if (
                t is not None
                and within_us is not None
                and t > (out[0] or 0) + within_us
            ):
                t = None
            out[i] = t
        if out[i] is None:
            break
    return out
