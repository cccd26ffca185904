from diffdataflowmlpipelines_spark.plans.reference_queries import (
    ORACLES,
    QUERIES,
    load,
)
import diffdataflowmlpipelines_spark.plans.datapipeline_queries  # noqa: F401,E402  (registers into QUERIES/ORACLES)
import diffdataflowmlpipelines_spark.plans.more_queries  # noqa: F401,E402  (registers into QUERIES/ORACLES)
import diffdataflowmlpipelines_spark.plans.token_queries  # noqa: F401,E402  (registers into QUERIES/ORACLES)

__all__ = ["ORACLES", "QUERIES", "load"]
