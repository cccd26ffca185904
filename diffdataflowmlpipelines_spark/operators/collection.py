"""Differential-collection discipline over plain DataFrames.

The reference engine's core abstraction is a multiset of ``(data, time,
diff)`` updates (differential-dataflow ``Collection``; see reference
``src/main.rs:58`` and the project paper §2). We model it as a DataFrame
with an explicit ``diff: long`` column; sources emit ``diff = +1``,
retractions ``diff = -1``.

Consolidation (reference: DD collection-trace consolidation, semantically
load-bearing behind every ``count``/``join`` arrangement; cf. commented
``consolidate`` at ``src/feature_encoders/polynomial_features_encoder.rs:44-55``)
is a grouped signed sum that drops net-zero rows. This module keeps every
op a plain Catalyst aggregate/join so partial (map-side) aggregation,
AQE and whole-stage codegen all apply — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DIFF = "diff"


def with_diff(df: DataFrame) -> DataFrame:
    """Lift a plain relation into a collection: every row is one insert."""
    if DIFF in df.columns:
        return df
    return df.withColumn(DIFF, F.lit(1).cast("long"))


def negate(df: DataFrame) -> DataFrame:
    """Abelian negate (reference: ``Abelian::negate`` impls, e.g.
    ``src/types/integer_assignment_aggregate.rs:132-138``)."""
    return df.withColumn(DIFF, (-F.col(DIFF)).cast("long"))


def concat(a: DataFrame, b: DataFrame) -> DataFrame:
    """Multiset union (reference P7 ``concat``,
    ``src/feature_encoders/one_hot_encoder.rs:59``)."""
    return a.unionByName(b)


def consolidate(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Collapse (value, diff) rows into net diffs, dropping zeros.

    One shuffle on the value columns; Spark performs map-side partial
    aggregation first, so at scale each executor pre-consolidates its own
    partitions before the exchange.
    """
    df = with_diff(df)
    cols = cols or [c for c in df.columns if c != DIFF]
    return (
        df.groupBy(*cols)
        .agg(F.sum(DIFF).alias(DIFF))
        .filter(F.col(DIFF) != 0)
    )


def distinct(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """DD ``distinct`` (reference P8): any net-positive multiplicity -> 1.

    Used before dictionary assignment (``one_hot_encoder.rs:23``,
    ``ordinal_encoder.rs:22``).
    """
    c = consolidate(df, cols)
    return c.filter(F.col(DIFF) > 0).withColumn(DIFF, F.lit(1).cast("long"))


def join_diff(
    a: DataFrame,
    b: DataFrame,
    on: list[str] | str,
    how: str = "inner",
    broadcast_right: bool = False,
) -> DataFrame:
    """Equi-join of two collections; output diff = diff_a * diff_b
    (differential join semantics; reference P5 usage e.g.
    ``src/feature_encoders/multi_column_encoder.rs:32-35``).
    """
    a = with_diff(a)
    b = with_diff(b)
    ra = a.withColumnRenamed(DIFF, "__diff_a")
    rb = b.withColumnRenamed(DIFF, "__diff_b")
    if broadcast_right:
        rb = F.broadcast(rb)
    out = ra.join(rb, on=on, how=how)
    # outer joins: an unmatched row has a NULL diff on the missing side,
    # and null*long = null would then be silently dropped by every
    # downstream consolidate/filter — the outer-join differential
    # semantics is "the unmatched row keeps its own multiplicity"
    diff_a = F.coalesce(F.col("__diff_a"), F.lit(1))
    diff_b = F.coalesce(F.col("__diff_b"), F.lit(1))
    return (
        out.withColumn(DIFF, (diff_a * diff_b).cast("long"))
        .drop("__diff_a", "__diff_b")
    )


def antijoin(a: DataFrame, keys: DataFrame, on: list[str] | str) -> DataFrame:
    """Rows of ``a`` whose key is absent from ``keys`` (reference P6
    ``antijoin``, ``one_hot_encoder.rs:50-57`` unseen-category path).
    Diff column of ``keys`` is ignored — membership only.
    """
    on_cols = [on] if isinstance(on, str) else list(on)
    key_rel = keys.select(*on_cols).dropDuplicates()
    return with_diff(a).join(key_rel, on=on_cols, how="left_anti")


# --- signed ("threshold + count") aggregate expressions ------------------
# The reference re-weights each record's diff into a custom abelian
# aggregate and sums per key (P9/P10, e.g. standard_scaler.rs:81-86).
# For count/sum/mean/variance those abelian aggregates are exactly signed
# sums, which Spark executes with partial+final aggregation (same
# decomposition as Chan et al.'s mergeable variance used by the reference,
# standard_scaler.rs:36-48).

def weighted_count() -> Column:
    return F.sum(F.col(DIFF)).cast("long")


def weighted_sum(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c * F.col(DIFF))


def _obs_diff(c: Column) -> Column:
    # SQL AVG semantics: a NULL value is not an observation — it must
    # leave both the numerator (F.sum skips nulls anyway) AND the
    # denominator, or the mean silently shrinks toward 0
    return F.when(c.isNotNull(), F.col(DIFF)).otherwise(F.lit(0))


def weighted_avg(col: str | Column) -> Column:
    """NULL (not an ANSI DIVIDE_BY_ZERO crash) for a fully-retracted
    group — net count 0 has no mean. NULL values are excluded from both
    sides of the division (SQL AVG semantics)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.try_divide(F.sum(c * F.col(DIFF)), F.sum(_obs_diff(c)))


def weighted_var_pop(col: str | Column) -> Column:
    """Population variance under multiplicities: E[x^2] - E[x]^2 with
    signed sums (retraction-correct, unlike builtin ``var_pop`` which
    cannot see diffs). NULL for a fully-retracted group (net count 0),
    like weighted_avg — ANSI mode would otherwise throw. NULL values
    are excluded like SQL VAR_POP."""
    c = F.col(col) if isinstance(col, str) else col
    n = F.sum(_obs_diff(c))
    s1 = F.sum(c * F.col(DIFF))
    s2 = F.sum(c * c * F.col(DIFF))
    m = F.try_divide(s1, n)
    return F.try_divide(s2, n) - m * m
