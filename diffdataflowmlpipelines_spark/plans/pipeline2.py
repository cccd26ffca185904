"""Reference pipeline_2 (adult dataset) re-expressed Spark-first
(``src/pipelines/pipeline_2.rs:17-82``):

- columns {8, 9} (protected attributes), {12} (proxy), {14} (target)
  are EXCLUDED from features (``:21-31``);
- remaining string columns -> OneHotEncoder, remaining numeric columns
  -> Passthrough, classified by dtype exactly as the reference's
  ``find_indices(Text)`` split (``:32-39``);
- outputs concatenated into one feature vector — columnar here, a
  k-way row-id join chain there.

Plus the F4 ``adultlike`` deterministic fixture (FIXTURES.md).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from diffdataflowmlpipelines_spark.operators.encoders import (
    MultiColumnEncoder,
    OneHotEncoder,
    Passthrough,
)

EXCLUDED_IDX = [8, 9, 12, 14]  # protected {8,9}, proxy {12}, target {14}


def gen_adultlike_pdf(n_rows: int = 3000, seed: int = 42) -> pd.DataFrame:
    """F4 adultlike: 15 columns, same type layout as adult_data.csv —
    numeric at positions {0,2,4,10,11,12}, categorical elsewhere."""
    rng = np.random.default_rng(seed)
    cols: dict = {}
    numeric_pos = {0, 2, 4, 10, 11, 12}
    cards = [0, 7, 0, 16, 0, 7, 14, 6, 5, 2, 0, 0, 0, 41, 2]
    for i in range(15):
        name = f"c{i:02d}"
        if i in numeric_pos:
            cols[name] = rng.integers(0, 100_000, size=n_rows).astype("int64")
        else:
            cols[name] = np.array(
                [f"v{int(x)}" for x in rng.integers(0, cards[i], size=n_rows)],
                dtype=object,
            )
    return pd.DataFrame(cols)


def adultlike_df(spark: SparkSession, n_rows: int = 3000, seed: int = 42) -> DataFrame:
    return spark.createDataFrame(gen_adultlike_pdf(n_rows, seed))


def build_pipeline2(df: DataFrame) -> MultiColumnEncoder:
    """Classify columns by dtype (reference find_indices split), skip
    the excluded indices, one-hot the categoricals, pass numerics."""
    excluded = {df.columns[i] for i in EXCLUDED_IDX}
    config = []
    for field in df.schema.fields:
        if field.name in excluded:
            continue
        if isinstance(field.dataType, T.StringType):
            config.append((field.name, OneHotEncoder()))
        else:
            config.append((field.name, Passthrough()))
    return MultiColumnEncoder(config)


def run_pipeline2(df: DataFrame, out: str = "features") -> DataFrame:
    return build_pipeline2(df).fit_transform(df, out=out)
