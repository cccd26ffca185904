"""Feature encoders — Spark-first re-expression of the reference's
``ColumnEncoder`` trait (``src/feature_encoders/column_encoder.rs:6-15``):
``fit`` produces a continuously-maintainable statistic (here: a tiny
aggregate DataFrame), ``transform`` combines data with that statistic
(here: a broadcast join / pure column expressions — never a row-keyed
join chain, which the reference's paper names as its main bottleneck).

All fit statistics are signed (diff-aware) aggregates, so the same code
is retraction-correct when fed consolidated delta collections, matching
the reference's abelian-aggregate design (SURVEY.md §2.2).
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from diffdataflowmlpipelines_spark.operators.collection import (
    DIFF,
    consolidate,
    weighted_avg,
    weighted_count,
    weighted_var_pop,
    with_diff,
)


def _bc(meta: DataFrame) -> DataFrame:
    return F.broadcast(meta)


def round_to_decimal(col: Column, n: int) -> Column:
    """Reference rounding (``standard_scaler.rs:116-120``):
    ``(x / 10^n).round() * 10^n`` with half-away-from-zero — identical to
    Spark's HALF_UP ``F.round(x, -n)``. Used for update suppression: a
    rounded statistic only changes when the true statistic drifts past a
    10^n boundary, so downstream re-encodes are suppressed.
    """
    return F.round(col, -n)


def standard_scale_expr(col: Column, mean, var) -> Column:
    """``(x - mean) / var`` with plan-time IEEE emulation for ``var == 0.0``
    (reference ``standard_scaler.rs:112``: plain f64 division — +/-inf,
    NaN at x == mean). Spark 4 ANSI ``/`` THROWS on a 0.0 divisor even
    for doubles, and ``var`` here is always a plan-time python float
    (materialized fit statistic), so the branch is taken in python —
    shared by the batch StandardScaler and both incremental scaler
    pipelines (which crashed mid-stream on any zero-variance epoch
    before this was factored out). NaN guards first: Spark orders NaN
    greater than every double, so an unguarded ``x > mean`` would map a
    NaN input to +inf where IEEE (NaN - mean)/0.0 is NaN. NULL inputs
    stay NULL; a None/NaN variance (unfitted statistic) divides through
    to NULL/NaN without crashing, matching IEEE."""
    x = col.cast("double")
    if var == 0.0:
        ieee = (
            F.when(F.isnan(x), F.lit(float("nan")))
            .when(x > F.lit(mean), F.lit(float("inf")))
            .when(x < F.lit(mean), F.lit(float("-inf")))
            .otherwise(F.lit(float("nan")))
        )
        return F.when(x.isNotNull(), ieee)
    return (x - F.lit(mean)) / F.lit(var)


class ColumnEncoder:
    """fit(df, col) -> self; transform(df, col, out) -> df + out column."""

    meta_: DataFrame | None = None

    def fit(self, df: DataFrame, col: str) -> "ColumnEncoder":
        raise NotImplementedError

    def transform(self, df: DataFrame, col: str, out: str) -> DataFrame:
        raise NotImplementedError

    def fit_transform(self, df: DataFrame, col: str, out: str) -> DataFrame:
        return self.fit(df, col).transform(df, col, out)

    # encoders producing array outputs override this
    output_is_vector = False


class Passthrough(ColumnEncoder):
    """Identity (reference ``passthrough.rs:17-26``)."""

    def fit(self, df, col):
        return self

    def transform(self, df, col, out):
        return df.withColumn(out, F.col(col).cast("double"))


class FunctionEncoder(ColumnEncoder):
    """Stateless scalar function wrapper (reference
    ``function_encoder.rs:8-32``). Takes a Column->Column expression
    builder (JVM-side, codegen'd) — per the input hint, no per-row
    Python; for genuinely Python logic pass a vectorized
    ``pandas_udf`` instead.
    """

    def __init__(self, fn: Callable[[Column], Column]):
        self.fn = fn

    def fit(self, df, col):
        return self

    def transform(self, df, col, out):
        return df.withColumn(out, self.fn(F.col(col)))


class StandardScaler(ColumnEncoder):
    """Reference ``standard_scaler.rs:63-120``.

    fit: single-pass mean + population variance. The reference merges
    per-record ``VarianceAggregate`` values with Chan's parallel-variance
    formula (``:36-48``); Spark's partial+final aggregation of the signed
    sums below is the same decomposition, executed map-side first.

    transform: ``(x - mean) / variance`` — the reference divides by the
    VARIANCE, not the standard deviation (``:112``; its unit test pins
    ``(i-4.5)/8.25``), and we replicate that for parity.

    Optional rounding (``new_with_rounding``) rounds (mean, var) to
    10^n_mean / 10^n_var for update suppression (``:73-76,116-120``).
    """

    def __init__(self, round_to: tuple[int, int] | None = None):
        self.round_to = round_to

    def fit(self, df, col):
        df = with_diff(df)
        mean = weighted_avg(F.col(col).cast("double"))
        var = weighted_var_pop(F.col(col).cast("double"))
        if self.round_to is not None:
            n1, n2 = self.round_to
            mean = round_to_decimal(mean, n1)
            var = round_to_decimal(var, n2)
        # sklearn fit semantics: the 1-row statistic is materialized at
        # fit time (one aggregate job). Chained pipelines then get FLAT
        # transform plans (literals) instead of re-executing every
        # upstream fit subplan per downstream reference — measured 27s ->
        # sub-second on the 2-stage pipeline at sf0.01. Streaming stats
        # stay incremental in streaming/stats.py.
        row = df.agg(mean.alias("m"), var.alias("v")).first()
        self.mean_, self.var_ = row["m"], row["v"]
        return self

    def transform(self, df, col, out):
        # zero-variance ANSI/IEEE handling lives in standard_scale_expr
        # (review r4d, advice r4) — shared with the incremental pipelines
        return df.withColumn(
            out, standard_scale_expr(F.col(col), self.mean_, self.var_)
        )


class MinMaxScaler(ColumnEncoder):
    """Reference ``minmax_scaler.rs:129-166``: transform =
    ``(x - min) / (max - min)``.

    The reference keeps a value->count map plus two heaps so single-row
    retractions update min/max in O(log n) (``:16-72``). Under Spark's
    recompute-per-batch aggregation model we consolidate per value and
    take min/max over net-positive values — same result, retraction-
    correct, and fully map-side-combinable.
    """

    def fit(self, df, col):
        df = with_diff(df)
        alive = consolidate(df.select(F.col(col).cast("double").alias("__v"), DIFF))
        alive = alive.filter(F.col(DIFF) > 0)
        row = alive.agg(
            F.min("__v").alias("mn"),
            (F.max("__v") - F.min("__v")).alias("rg"),
        ).first()
        self.min_, self.range_ = (row["mn"], row["rg"]) if row else (None, None)
        return self

    def transform(self, df, col, out):
        # constant column (range 0): map to 0.0 like sklearn instead of
        # an ANSI DIVIDE_BY_ZERO crash / NaN features — gated on the
        # input being non-null: a bare coalesce also swallowed NULL
        # inputs into 0.0 (the column MINIMUM), while StandardScaler and
        # the DuckDB oracle propagate NULL (review r4d)
        x = F.col(col).cast("double")
        scaled = F.try_divide(x - F.lit(self.min_), F.lit(self.range_))
        return df.withColumn(
            out, F.when(x.isNotNull(), F.coalesce(scaled, F.lit(0.0)))
        )


class KBinsDiscretizer(ColumnEncoder):
    """Reference ``kbins_discretizer.rs:10-47``: uniform-width bins over
    [min, max]; ``bin = floor((x - min)/range * k)`` with the bin==k edge
    (x == max) clamped to k-1 (branchless in the reference ``:40-44``).

    ``strategy="quantile"`` extends beyond the reference (sklearn's other
    KBins strategy, which the reference does not implement): edges are
    the exact k-quantiles (linear interpolation — matches numpy/sklearn
    and DuckDB's quantile_cont), bin = number of interior edges <= x.
    At 100 TB swap the exact percentile for ``percentile_approx`` — the
    transform is unchanged.
    """

    def __init__(self, k: int, strategy: str = "uniform"):
        self.k = int(k)
        if strategy not in ("uniform", "quantile"):  # pragma: no cover
            raise ValueError(strategy)
        self.strategy = strategy

    def fit(self, df, col):
        if self.strategy == "uniform":
            MinMaxScaler.fit(self, df, col)  # same (min, range) statistic
            return self
        df = with_diff(df)
        alive = consolidate(
            df.select(F.col(col).cast("double").alias("__v"), DIFF)
        ).filter(F.col(DIFF) > 0)
        fracs = [i / self.k for i in range(1, self.k)]
        # consolidate nets duplicates to one row per VALUE — weight the
        # percentile by the net multiplicity or it runs over the distinct
        # values, not the multiset (found via a 6-row oracle mismatch)
        row = alive.agg(
            F.percentile(
                F.col("__v"),
                F.array(*[F.lit(f) for f in fracs]),
                F.col(DIFF),
            ).alias("q"),
            F.min("__v").alias("mn"),
            F.max("__v").alias("mx"),
        ).first()
        # sklearn dedupes equal bin edges (np.unique over the FULL edge
        # list [min, q_1..q_{k-1}, max], interior = unique[1:-1]):
        # constant / low-cardinality columns collapse coinciding edges
        # to one boundary instead of jumping most rows to bin k-1
        # (ADVICE r2). Continuous columns are unaffected.
        full = sorted(
            {float(x) for x in (row["q"] or [])}
            | {float(row["mn"]), float(row["mx"])}
        ) if row["mn"] is not None else []
        self.edges_ = full[1:-1]
        return self

    def transform(self, df, col, out):
        x = F.col(col).cast("double")
        if self.strategy == "uniform":
            # constant column: everything lands in bin 0, matching the
            # quantile strategy's collapsed-edges behavior (ADVICE r2)
            # rather than NaN/null bins from a 0/0 division. NULL-gated
            # like MinMaxScaler: a NULL input propagates NULL (the
            # quantile strategy already does — review r4d), it does not
            # become bin 0
            raw = F.floor(
                F.coalesce(
                    F.try_divide(x - F.lit(self.min_), F.lit(self.range_)),
                    F.lit(0.0),
                )
                * F.lit(self.k)
            )
            clamped = F.when(raw == self.k, F.lit(self.k - 1)).otherwise(raw)
            return df.withColumn(
                out, F.when(x.isNotNull(), clamped.cast("double"))
            )
        b = None
        for e in self.edges_:
            term = (x >= F.lit(e)).cast("int")
            b = term if b is None else b + term
        b = F.lit(0) if b is None else b
        return df.withColumn(out, b.cast("double"))


def overprovisioned_len(n_values: int) -> int:
    """Reference dictionary sizing policy
    (``integer_assignment_aggregate.rs:84-93``): logical vector length
    starts at 1 and grows by x1.5 (half-away-from-zero rounding) until it
    covers the live value count. Gives 1,2,3,5,8,12,18,27,41,...
    """
    ln = 1
    while n_values > ln:
        ln = int(ln * 1.5 + 0.5)
    return ln


def fit_dictionary(
    df: DataFrame, col: str, order: str = "sorted", n_shards: int | None = None
) -> DataFrame:
    """Batch dictionary: distinct net-positive values -> stable dense index.

    The reference assigns indices in arrival order with hole reuse
    (``integer_assignment_aggregate.rs:43-50,63-95``); arrival order is
    nondeterministic in a parallel batch engine, so the batch API pins a
    deterministic order (sorted values by default; ``first_seen`` uses
    min(row-id) when a ``__row_order`` column exists). The *streaming*
    vocabulary (streaming/vocabulary.py) reproduces true arrival-order
    assignment with holes.

    Scale: NO single-partition global window — a token vocabulary at
    100 TB is ~10^8 values. The global rank is computed as range-
    partitioned local rank + per-partition offset: rows are range-
    partitioned on the sort key (globally ordered across partitions),
    ranked in parallel within each partition, and shifted by the
    cumulative count of the preceding partitions (a vocab-shard-sized
    relation, broadcast back). Rank is partition-boundary-independent,
    so sampling variance in the range partitioner cannot change indices.

    Returns (value, __idx) with value column named after ``col``.
    """
    from pyspark.sql import Window

    spark = df.sparkSession
    if n_shards is None:
        n_shards = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    df = with_diff(df)
    if order == "sorted":
        keep, sort_cols = [F.col(col)], [col]
    elif order == "first_seen":
        if "__row_order" not in df.columns:
            raise ValueError(
                "order='first_seen' needs a __row_order column carrying "
                "arrival order (add one with monotonically_increasing_id "
                "or an explicit sequence before fit) — without it the "
                "'first seen' ordering is undefined"
            )
        alive_cols = df.groupBy(col).agg(
            F.sum(DIFF).alias(DIFF), F.min("__row_order").alias("__row_order")
        )
        keep, sort_cols = None, ["__row_order", col]
    else:  # pragma: no cover
        raise ValueError(order)
    if order == "sorted":
        alive = consolidate(df.select(*keep, DIFF)).filter(F.col(DIFF) > 0)
        alive = alive.select(col)
    else:
        alive = alive_cols.filter(F.col(DIFF) > 0).select(col, "__row_order")
    # NULL is not a category: it would take index 0 (nulls sort first),
    # shifting every real category's code, while the encoders' equality
    # joins can never match it — NULL rows encode as unseen (-1 / zero
    # vector) without disturbing the dictionary
    alive = alive.filter(F.col(col).isNotNull())

    part = alive.repartitionByRange(n_shards, *[F.col(c) for c in sort_cols])
    # localCheckpoint PINS the range-partition layout: the offsets
    # aggregate below and the consumer's transform are SEPARATELY
    # planned queries, and an uncached repartitionByRange re-executes
    # in each with a different RDD-id-derived sample seed — boundaries
    # (hence __pid -> offset) could differ between the two jobs,
    # silently corrupting indices once the vocabulary is large enough
    # for partial range sampling. Unlike persist() (which leaked for
    # the session lifetime, ADVICE r2), checkpoint blocks are released
    # by the ContextCleaner when the frame becomes unreachable.
    part = part.withColumn("__pid", F.spark_partition_id()).localCheckpoint(
        eager=True
    )
    # per-partition offsets: one tiny fit-time aggregate (<= n_shards
    # rows to the driver — same convention as the scalers' 1-row fit
    # statistics).
    counts = part.groupBy("__pid").agg(F.count("*").alias("__c")).collect()
    if not counts:
        return part.select(col, F.lit(0).cast("long").alias("__idx")).limit(0)
    offsets, acc = {}, 0
    for r in sorted(counts, key=lambda r: r["__pid"]):
        offsets[int(r["__pid"])] = acc
        acc += int(r["__c"])
    off_map = F.create_map(
        *[F.lit(x) for pid, off in offsets.items() for x in (pid, off)]
    )
    local = Window.partitionBy("__pid").orderBy(*[F.col(c) for c in sort_cols])
    out = part.withColumn(
        "__idx",
        (F.row_number().over(local) - 1 + off_map[F.col("__pid")]).cast("long"),
    )
    return out.select(col, "__idx")


class OrdinalEncoder(ColumnEncoder):
    """Reference ``ordinal_encoder.rs:21-52``: value -> Float(index);
    unseen values -> -1.0 via the antijoin path (``:45-49``), expressed
    here as a broadcast left join + coalesce.
    """

    def __init__(self, order: str = "sorted"):
        self.order = order

    def fit(self, df, col):
        self.meta_ = fit_dictionary(df, col, self.order)
        return self

    def transform(self, df, col, out):
        meta = self.meta_.withColumnRenamed("__idx", "__ord_idx")
        return (
            df.join(_bc(meta), on=col, how="left")
            .withColumn(out, F.coalesce(F.col("__ord_idx").cast("double"), F.lit(-1.0)))
            .drop("__ord_idx")
        )


class OneHotEncoder(ColumnEncoder):
    """Reference ``one_hot_encoder.rs:22-60``: dictionary -> one-hot
    vector of the overprovisioned length (x1.5 growth policy), unseen
    values -> all-zero vector (``:50-57``).
    """

    output_is_vector = True

    def __init__(self, order: str = "sorted"):
        self.order = order
        self.vec_len_: int | None = None

    def fit(self, df, col):
        self.meta_ = fit_dictionary(df, col, self.order)
        # vector length is part of the fitted statistic; one tiny action
        # over the vocab-sized dictionary (same as the reference reading
        # its aggregate's `len` field).
        n = self.meta_.count()
        self.vec_len_ = overprovisioned_len(max(int(n), 1))
        return self

    def transform(self, df, col, out):
        meta = self.meta_.withColumnRenamed("__idx", "__oh_idx")
        joined = df.join(_bc(meta), on=col, how="left")
        idx = F.col("__oh_idx")
        vec = F.transform(
            F.sequence(F.lit(0), F.lit(self.vec_len_ - 1)),
            lambda i: F.when(i == idx, F.lit(1.0)).otherwise(F.lit(0.0)),
        )
        return joined.withColumn(out, vec).drop("__oh_idx")


class PolynomialFeatures(ColumnEncoder):
    """Reference ``polynomial_features_encoder.rs:58-84``: per-scalar
    power ladder ``[x^min_degree .. x^max_degree]`` (stateless; the
    multi-feature combination generator in the reference is dead code).
    """

    output_is_vector = True

    def __init__(self, min_degree: int, max_degree: int):
        self.min_degree, self.max_degree = int(min_degree), int(max_degree)

    def fit(self, df, col):
        return self

    def transform(self, df, col, out):
        x = F.col(col).cast("double")
        powers = [
            F.pow(x, F.lit(float(d)))
            for d in range(self.min_degree, self.max_degree + 1)
        ]
        return df.withColumn(out, F.array(*powers))


class Pipeline:
    """Reference ``pipeline.rs:7-34`` (sklearn Pipeline over one column):
    fit chains fit->transform through stages; transform chains transforms.
    Stages see the previous stage's output column.
    """

    def __init__(self, stages: Sequence[ColumnEncoder]):
        self.stages = list(stages)

    def fit(self, df: DataFrame, col: str) -> "Pipeline":
        cur, cur_col = df, col
        for i, st in enumerate(self.stages):
            out = f"__stage_{i}"
            cur = st.fit_transform(cur, cur_col, out)
            cur_col = out
        return self

    def transform(self, df: DataFrame, col: str, out: str) -> DataFrame:
        cur, cur_col = df, col
        for i, st in enumerate(self.stages):
            nxt = f"__stage_{i}" if i < len(self.stages) - 1 else out
            cur = st.transform(cur, cur_col, nxt)
            if cur_col != col:
                cur = cur.drop(cur_col)
            cur_col = nxt
        return cur

    def fit_transform(self, df: DataFrame, col: str, out: str) -> DataFrame:
        return self.fit(df, col).transform(df, col, out)


class MultiColumnEncoder:
    """Reference ``multi_column_encoder.rs:10-38`` (sklearn
    ColumnTransformer): encode k columns and concatenate the outputs into
    one feature vector.

    The reference assembles outputs with a left-deep chain of k-1
    row-id equi-joins (its paper names this the end-to-end bottleneck).
    In a columnar engine the assembly is a single ``select`` with
    ``concat`` of arrays — zero joins, zero shuffles.
    """

    def __init__(self, config: Sequence[tuple[str, ColumnEncoder]]):
        self.config = list(config)

    def fit(self, df: DataFrame) -> "MultiColumnEncoder":
        for col, enc in self.config:
            enc.fit(df, col)
        return self

    def transform(self, df: DataFrame, out: str = "features") -> DataFrame:
        cur = df
        pieces: list[Column] = []
        for i, (col, enc) in enumerate(self.config):
            oc = f"__enc_{i}"
            cur = enc.transform(cur, col, oc)
            pieces.append(
                F.col(oc) if enc.output_is_vector else F.array(F.col(oc))
            )
        cur = cur.withColumn(out, F.concat(*pieces))
        return cur.drop(*[f"__enc_{i}" for i in range(len(self.config))])

    def fit_transform(self, df: DataFrame, out: str = "features") -> DataFrame:
        return self.fit(df).transform(df, out)
