"""Sequence packing — concat-and-split token sequences into fixed-budget
training chunks (the standard pretraining batching step: documents are
concatenated in a deterministic order and cut every ``budget`` tokens).

The reference consumes unpacked relations; packing is the
tokens-payload step between curation and the trainer, so it belongs in
this engine's beyond-reference set. Two implementations with identical
output (parity-tested):

- :func:`pack_sequences` — a window cumulative sum per stratum. Exact
  and SQL-oracle-checkable, but a per-stratum sort-window: fine when
  strata are bounded (source/domain), the wrong shape if one stratum
  is the whole corpus.
- :func:`pack_sequences_sharded` — the 100-TB shape: range-partition by
  (stratum, order), compute per-partition per-stratum token subtotals
  (ONE small aggregate; <= n_partitions x |strata-per-partition| rows
  collected, the repo's bounded fit-statistic convention), turn them
  into prefix offsets, and add each partition's local Arrow cumsum to
  its broadcast offset — a distributed prefix sum, no global sort, no
  single-partition window. Same pattern as operators/encoders.
  fit_dictionary's sharded ranking.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def pack_sequences(
    df: DataFrame,
    id_col: str,
    len_col: str,
    strata_col: str,
    budget: int,
) -> DataFrame:
    """Window form: cum = running token total per stratum in ``id_col``
    order; a row starts at global token position cum - len, so
    chunk = (cum - len) div budget, chunk_offset = (cum - len) mod
    budget. Documents may straddle a cut — exactly like GPT-style
    concat-then-split packing."""
    w = (
        Window.partitionBy(strata_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    base = df.select(
        strata_col, id_col, F.col(len_col).cast("long").alias(len_col)
    )
    start = F.sum(F.col(len_col)).over(w) - F.col(len_col)
    return base.withColumn("__start", start).select(
        strata_col,
        id_col,
        len_col,
        F.expr(f"__start DIV {budget}").alias("chunk"),
        F.pmod(F.col("__start"), F.lit(budget)).cast("long").alias("chunk_offset"),
    )


def pack_sequences_sharded(
    df: DataFrame,
    id_col: str,
    len_col: str,
    strata_col: str,
    budget: int,
    n_shards: int = 32,
) -> DataFrame:
    """Distributed prefix-sum form — output identical to
    :func:`pack_sequences` (pytest parity), built without a global
    per-stratum sort-window."""
    spark = df.sparkSession
    part = df.select(
        strata_col, id_col, F.col(len_col).cast("long").alias(len_col)
    ).repartitionByRange(n_shards, strata_col, id_col)
    # localCheckpoint pins the range-partition layout: the subtotal
    # aggregate and the mapInPandas pass are separately planned queries,
    # and an uncached repartitionByRange re-executes in each with a
    # different RDD-id-derived sample seed — a row crossing a shifted
    # boundary would make the broadcast offsets silently wrong (or
    # KeyError). Checkpoint blocks are ContextCleaner-released when the
    # frame becomes unreachable (same pattern as encoders.fit_dictionary).
    part = part.withColumn("__pid", F.spark_partition_id()).localCheckpoint(
        eager=True
    )

    # one small aggregate: per-(partition, stratum) token subtotals
    subtotals = (
        part.groupBy("__pid", strata_col)
        .agg(F.sum(len_col).alias("__sub"))
        .collect()
    )
    # prefix offsets: tokens in earlier partitions of the same stratum.
    # A NULL stratum is a real group (Spark's groupBy/window semantics,
    # which the window twin inherits): sort it first — matching Spark's
    # nulls-first range order — and key it as None.
    by_stratum: dict = {}
    offsets = {}
    for r in sorted(
        subtotals,
        key=lambda r: (r[strata_col] is not None, r[strata_col], r["__pid"]),
    ):
        key = (r["__pid"], r[strata_col])
        offsets[key] = by_stratum.get(r[strata_col], 0)
        by_stratum[r[strata_col]] = offsets[key] + int(r["__sub"])
    b_offsets = spark.sparkContext.broadcast(offsets)

    # output schema derived from the input's own types (doc ids are
    # strings in most corpus relations, longs in others — both work)
    in_types = {f.name: f.dataType.simpleString() for f in part.schema.fields}
    schema = (
        f"{strata_col} {in_types[strata_col]}, {id_col} {in_types[id_col]}, "
        f"{len_col} bigint, chunk bigint, chunk_offset bigint"
    )

    def add_offsets(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # mapInPandas preserves the range-partitioned order within a
        # partition only if we sort locally — cheap (partition-sized)
        pdfs = list(batches)
        if not pdfs:
            return
        # na_position='first' + dropna=False: Spark range-partitions and
        # window-orders nulls FIRST and groups them as a real key; the
        # pandas defaults (NaN last, null group dropped) would misalign
        # the prefix offsets and crash the int cast
        pdf = pd.concat(pdfs, ignore_index=True).sort_values(
            [strata_col, id_col], kind="stable", na_position="first"
        )
        pid = int(pdf["__pid"].iloc[0])
        local_cum = pdf.groupby(strata_col, sort=False, dropna=False)[
            len_col
        ].cumsum()
        start = (
            local_cum
            - pdf[len_col]
            + pdf[strata_col].map(
                lambda s: b_offsets.value[(pid, None if pd.isna(s) else s)]
            )
        )
        out = pdf[[strata_col, id_col, len_col]].copy()
        out["chunk"] = (start // budget).astype("int64")
        out["chunk_offset"] = (start % budget).astype("int64")
        yield out

    return part.mapInPandas(add_offsets, schema)
