from diffdataflowmlpipelines_spark.plans.reference_queries import (
    ORACLES,
    QUERIES,
    load,
)

__all__ = ["ORACLES", "QUERIES", "load"]
