"""CSV sources with the reference's per-column type discipline (C15).

``read_adult_csv`` (reference ``adult_dataset_reader.rs:6-29``) parses
each cell Float-if-parsable else Text; a column is numeric iff every
cell parses. Spark's ``inferSchema`` is also per-column but has its own
type-ladder (int/bigint/double/...); to pin the reference's two-type
model we read as string and cast columns where ALL values parse as
doubles.

``read_csv_all_float`` (reference ``diabetes_dataset_reader.rs:7-21``)
parses every cell as Float with unparsable -> -1.0.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_adult_like_csv(spark: SparkSession, path: str, header: bool = True) -> DataFrame:
    raw = spark.read.csv(
        path, header=header, ignoreLeadingWhiteSpace=True,
        ignoreTrailingWhiteSpace=True, escape='"'
    )
    df = raw
    # one pass: a column is Float iff no non-null cell fails to cast
    checks = [
        F.max(
            F.when(F.col(c).isNotNull() & F.col(c).try_cast("double").isNull(), 1).otherwise(0)
        ).alias(c)
        for c in raw.columns
    ]
    fails = raw.agg(*checks).first().asDict()
    for c in raw.columns:
        if fails[c] == 0:
            df = df.withColumn(c, F.col(c).try_cast("double"))
        else:
            df = df.withColumn(c, F.trim(F.col(c)))
    return df


def read_csv_all_float(spark: SparkSession, path: str, header: bool = True) -> DataFrame:
    """Every column double; unparsable cells -> -1.0 (reference
    ``diabetes_dataset_reader.rs:14-18``)."""
    raw = spark.read.csv(
        path, header=header, ignoreLeadingWhiteSpace=True,
        ignoreTrailingWhiteSpace=True, escape='"'
    )
    return raw.select(
        *[F.coalesce(F.col(c).try_cast("double"), F.lit(-1.0)).alias(c) for c in raw.columns]
    )
