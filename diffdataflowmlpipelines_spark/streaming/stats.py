"""Incremental per-key scaler statistics with rounding-gated update
suppression — the streaming form of StandardScaler/MinMaxScaler fit
(reference ``standard_scaler.rs:63-98``, ``minmax_scaler.rs:129-166``).

State per key: running (n, sum, sumsq) — Chan-mergeable, retraction-
correct via signed diffs — plus the value->count map needed for exact
min/max under retraction (the reference's MinMaxAggregate count-map,
``minmax_scaler.rs:16-47``; its two heaps are unnecessary at pandas
speed). Emission is suppressed unless the ROUNDED statistics changed
(reference rounding optimization ``standard_scaler.rs:73-76,116-120``):
downstream re-encodes only happen when a statistic drifts past a 10^n
boundary.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATS_OUTPUT_SCHEMA = (
    "key string, n long, mean double, var_pop double, min double, max double"
)
STATS_STATE_SCHEMA = (
    "n long, s1 double, s2 double, vals array<double>, cnts array<long>, "
    "last_mean double, last_var double, last_min double, last_max double"
)


def _round_to(x: float, n: int) -> float:
    # reference round_to_decimal: half away from zero at 10^n
    f = 10.0 ** n
    q = x / f
    r = int(q + 0.5) if q >= 0 else -int(-q + 0.5)
    return r * f


def _stats_fn(round_mean: int | None, round_var: int | None):
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            n, s1, s2, vals, cnts, lm, lv, lmin, lmax = state.get
            counts = dict(zip([float(v) for v in vals], [int(c) for c in cnts]))
            n, s1, s2 = int(n), float(s1), float(s2)
        else:
            n, s1, s2, counts = 0, 0.0, 0.0, {}
            lm = lv = lmin = lmax = None

        for pdf in pdfs:
            # a NULL value is not an observation: unfiltered it would
            # count in n (diff sums) while pandas skipna drops it from
            # s1/s2 — mean/var silently wrong, state never self-corrects
            pdf = pdf[pdf["x"].notna()]
            d = pdf["diff"].astype("int64")
            x = pdf["x"].astype("float64")
            n += int(d.sum())
            s1 += float((x * d).sum())
            s2 += float((x * x * d).sum())
            for v, c in (d.groupby(x).sum()).items():
                nc = counts.get(float(v), 0) + int(c)
                if nc:
                    counts[float(v)] = nc
                else:
                    counts.pop(float(v), None)

        if n > 0:
            mean = s1 / n
            var = s2 / n - mean * mean
            alive = [v for v, c in counts.items() if c > 0]
            mn, mx = (min(alive), max(alive)) if alive else (float("nan"),) * 2
            if round_mean is not None:
                mean = _round_to(mean, round_mean)
            if round_var is not None:
                var = _round_to(var, round_var)
        else:
            mean = var = mn = mx = float("nan")

        changed = (mean, var, mn, mx) != (lm, lv, lmin, lmax)
        vals_sorted = sorted(counts)
        state.update(
            (
                n,
                s1,
                s2,
                vals_sorted,
                [counts[v] for v in vals_sorted],
                mean,
                var,
                mn,
                mx,
            )
        )
        was_live = lm is not None and not (
            isinstance(lm, float) and lm != lm
        )
        if changed and (n > 0 or was_live):
            # n <= 0 after a FULL retraction of a previously-live key:
            # emit the n=0 tombstone row (NaN statistics) so an upsert
            # sink retracts the stale statistics instead of keeping them
            yield pd.DataFrame(
                {
                    # key[0] verbatim, never str(): the column is already
                    # string-cast upstream and a NULL key must stay NULL
                    # (str(None) minted a phantom "None" key where the
                    # batch groupBy twin keeps the null group)
                    "key": [key[0]],
                    "n": [n],
                    "mean": [mean],
                    "var_pop": [var],
                    "min": [mn],
                    "max": [mx],
                }
            )
        # suppressed: no output row this batch for this key

    return fn


def incremental_scaler_stats(
    df: DataFrame,
    key_col: str,
    value_col: str,
    *,
    round_to: tuple[int, int] | None = None,
) -> DataFrame:
    """Stateful (mean, var_pop, min, max) per key over a stream of
    (key, value, diff). Emits a row for a key only on (rounded) change.
    """
    rm, rv = round_to if round_to else (None, None)
    keyed = df.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(value_col).cast("double").alias("x"),
        F.col("diff").cast("long").alias("diff"),
    )
    return keyed.groupBy("key").applyInPandasWithState(
        _stats_fn(rm, rv),
        outputStructType=STATS_OUTPUT_SCHEMA,
        stateStructType=STATS_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
