"""diffdataflowmlpipelines_spark — a from-scratch PySpark-native engine
recreating the semantics of e-strauss/DiffDataflowMLPipelines
("IncrementalFeatureEncoders", a Rust differential-dataflow research
prototype for incremental feature encoding of ML pipelines).

This is NOT a port: the reference's timely/differential execution engine
(arrangements, epochs, frontiers) maps onto Spark's own machinery —
Catalyst plans, micro-batches, watermarks, state stores. See SURVEY.md §7.

Layout:
  operators/   differential (key, time, diff) collection ops + feature encoders
  sources/     batch & streaming sources, deterministic fixtures
  functions/   tokenization, text analysis, dedup, similarity (vectorized)
  plans/       composed end-to-end pipelines (ColumnTransformer / Pipeline)
  streaming/   windows, watermarking, stateful vocabulary, join, exactly-once sink
"""

from diffdataflowmlpipelines_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
