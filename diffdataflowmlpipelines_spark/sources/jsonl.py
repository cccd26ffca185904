"""JSONL corpus source with corrupt-record quarantine.

Web-scale training corpora arrive as JSON-lines shards; at 10^12-row
scale some lines are always malformed, and silently dropping them (or
failing the job) are both wrong. ``read_jsonl_quarantine`` reads
PERMISSIVE with an explicit schema (no inference pass over 100 TB —
schema inference reads the data twice and samples nondeterministically)
and splits the result into (clean, quarantined) frames in ONE scan
lineage: clean rows with the declared schema, quarantined raw lines for
offline inspection/repair.

The reference has no JSON surface (SURVEY §2.3 "No parquet/JSON/JDBC/
Kafka"); this extends the source family the same way tableio.py does
for parquet/Iceberg.

Scale notes: the split is two filters over one scan (Spark reads the
file once per action; checkpoint/persist upstream if both sides are
consumed repeatedly). JSONL is splittable by newline, so a 100 TB
corpus parallelizes per-block without coordination — unlike multiline
JSON, which this reader deliberately does not support.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def read_jsonl_quarantine(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
) -> tuple[DataFrame, DataFrame]:
    """Returns ``(clean, quarantine)``.

    ``clean``: rows parsed against ``schema`` (declared columns only).
    ``quarantine``: ``(raw_line)`` for every line that failed to parse
    or missed the declared types (PERMISSIVE puts the original line in
    the corrupt column and nulls the rest).
    """
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    declared = [f.name for f in schema.fields if f.name != CORRUPT_COL]
    # copy before extending: StructType.add mutates in place, and the
    # caller's schema object must not grow a corrupt column
    schema = T.StructType(list(schema.fields))
    if CORRUPT_COL not in [f.name for f in schema.fields]:
        schema = schema.add(T.StructField(CORRUPT_COL, T.StringType(), True))
    # text scan + from_json rather than spark.read.json: filtering only
    # on the internal corrupt column of a JSON scan is disallowed
    # (SPARK-21610 requires caching the whole parse); this shape has no
    # such restriction and keeps the raw line for the quarantine side.
    lines = spark.read.text(path).filter(F.length(F.trim("value")) > 0)
    parsed = lines.select(
        "value",
        F.from_json(
            "value", schema, {"columnNameOfCorruptRecord": CORRUPT_COL}
        ).alias("r"),
    )
    bad = F.col("r").isNull() | F.col(f"r.{CORRUPT_COL}").isNotNull()
    clean = parsed.filter(~bad).select(*[F.col(f"r.{c}").alias(c) for c in declared])
    quarantine = parsed.filter(bad).select(F.col("value").alias("raw_line"))
    return clean, quarantine
