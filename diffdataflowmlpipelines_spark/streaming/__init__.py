from diffdataflowmlpipelines_spark.streaming.sink import ExactlyOnceParquetSink
from diffdataflowmlpipelines_spark.streaming.sources import (
    EpochFileSource,
    write_epoch_files,
)
from diffdataflowmlpipelines_spark.streaming.windows import (
    session_token_activity,
    sliding_token_frequency,
    tumbling_token_frequency,
)

__all__ = [
    "EpochFileSource",
    "ExactlyOnceParquetSink",
    "session_token_activity",
    "sliding_token_frequency",
    "tumbling_token_frequency",
    "write_epoch_files",
]
