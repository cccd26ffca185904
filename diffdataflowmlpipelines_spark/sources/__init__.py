from diffdataflowmlpipelines_spark.sources.jsonl import read_jsonl_quarantine
from diffdataflowmlpipelines_spark.sources.fixtures import (
    TOKENS_SCHEMA,
    TOKENS_STREAM_SCHEMA,
    gen_labels_pdf,
    gen_tokens_pdf,
    labels_df,
    tokens_df,
)

__all__ = [
    "TOKENS_SCHEMA",
    "TOKENS_STREAM_SCHEMA",
    "gen_labels_pdf",
    "gen_tokens_pdf",
    "labels_df",
    "read_jsonl_quarantine",
    "tokens_df",
]
