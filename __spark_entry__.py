"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (tf-idf over the documents table) at
sf0.001. ``queries()`` / ``oracle_sql()`` — one entry per implemented
operator from SURVEY.md §2 plus the training-data-pipeline extensions;
implementations live in ``diffdataflowmlpipelines_spark/plans/``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from diffdataflowmlpipelines_spark.plans import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: tf-idf re-weighted token counts on sf0.001 documents."""
    return QUERIES["c9_tfidf"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
