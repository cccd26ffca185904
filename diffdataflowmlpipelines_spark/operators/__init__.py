from diffdataflowmlpipelines_spark.operators.collection import (
    DIFF,
    antijoin,
    concat,
    consolidate,
    distinct,
    join_diff,
    negate,
    weighted_avg,
    weighted_count,
    weighted_sum,
    weighted_var_pop,
    with_diff,
)

__all__ = [
    "DIFF",
    "antijoin",
    "concat",
    "consolidate",
    "distinct",
    "join_diff",
    "negate",
    "weighted_avg",
    "weighted_count",
    "weighted_sum",
    "weighted_var_pop",
    "with_diff",
]
