"""As-of join — named in the build brief's custom-operator list; the
reference has only incremental hash equi-joins (SURVEY.md §2.3 "no ...
as-of"), and Spark has no native ASOF JOIN either.

Scale-first construction (the "union trick"): instead of a range join
(whose cost is the product of per-key row counts), union both sides,
shuffle ONCE on the join keys, sort within each partition by event time,
and carry the most recent right-side values forward with
``last(..., ignorenulls=True)`` over a running window. Cost is one
shuffle + one in-partition sort — linear in rows per key, immune to the
quadratic blowup a BETWEEN join suffers on hot keys.

Tie semantics: a right row AT the left row's timestamp matches
(inclusive, ``l.t >= r.t``) — right rows sort before left rows at equal
timestamps. This matches DuckDB's ASOF JOIN, which the registry oracle
uses as the cross-engine check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_time: str,
    right_time: str,
    value_cols: list[str],
    *,
    how: str = "inner",
) -> DataFrame:
    """For every left row, attach the right row with the greatest
    ``right_time`` <= ``left_time`` within the same ``keys`` group.

    ``value_cols`` are the right-side columns to carry (they must not
    collide with left column names). The matched right timestamp is
    emitted as ``__asof_time``. ``how='inner'`` drops left rows with no
    prior right row; ``'left'`` keeps them with nulls.

    All carried columns come from ONE matched right row: the right side
    is packed into a single struct and `last(struct, ignorenulls=True)`
    carries the whole row forward, so a NULL inside a value column of
    the matched row stays NULL instead of resurrecting a stale non-null
    value from an older right row (ADVICE r2 — per-column carry
    diverged from DuckDB ASOF semantics on null-bearing value_cols).
    """
    lcols = [c for c in left.columns]
    ltypes = dict(left.dtypes)

    payload = F.struct(
        F.col(right_time).alias("__asof_src_time"),
        *[F.col(c) for c in value_cols],
    )
    payload_type = right.select(payload.alias("p")).schema[0].dataType

    l = (
        left.withColumn("__t", F.col(left_time))
        .withColumn("__side", F.lit(1))
        .withColumn("__asof_payload", F.lit(None).cast(payload_type))
    )
    # a NULL right_time row is not matchable under ASOF semantics (it
    # has no position on the time axis) — unfiltered it would sort
    # nulls-first and its payload could be carried into every left row
    r = right.filter(F.col(right_time).isNotNull()).select(
        *keys,
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__side"),
        payload.alias("__asof_payload"),
    )
    for c in lcols:
        if c not in keys:
            r = r.withColumn(c, F.lit(None).cast(ltypes[c]))

    all_cols = [*keys, "__t", "__side", "__asof_payload"] + [
        c for c in lcols if c not in keys
    ]
    u = l.select(*all_cols).unionByName(r.select(*all_cols))

    w = (
        Window.partitionBy(*keys)
        # the payload struct is the tie-break: several right rows
        # sharing (keys, right_time) would otherwise leave last() to
        # pick by shuffle order — nondeterministic across runs (review
        # r4d). Struct comparison is field-wise (__asof_src_time is
        # equal within a tie, then value_cols in declaration order), so
        # the greatest payload wins deterministically. Left rows carry a
        # NULL payload and are already separated by __side. (Map-typed
        # value_cols are not orderable in Spark and would need a
        # caller-side serialization.)
        .orderBy(F.col("__t"), F.col("__side"), F.col("__asof_payload"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = F.last("__asof_payload", ignorenulls=True).over(w)
    out = (
        u.select(
            *[c for c in lcols],
            "__side",
            *[matched[c].alias(c) for c in value_cols],
            matched["__asof_src_time"].alias("__asof_time"),
        )
        .filter(F.col("__side") == 1)
        .drop("__side")
    )
    if how == "inner":
        out = out.filter(F.col("__asof_time").isNotNull())
    elif how != "left":  # pragma: no cover
        raise ValueError(how)
    return out
