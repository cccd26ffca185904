"""Epoch-controlled streaming sources for tests and benchmarks.

The reference drives its dataflows epoch-by-epoch with
``InputSession::insert / advance_to / flush`` (``src/main.rs:75-98``).
The Spark analogue: each micro-batch is one epoch. For deterministic
tests we pre-split the input into one parquet file per intended epoch
and read it as a file stream with ``maxFilesPerTrigger=1`` — each
trigger consumes exactly one file, so batchId == epoch index and
``processAllAvailable()`` is the reference's ``step_while`` (P12).

In production the same DataFrame code runs off Kafka / an Iceberg
rate-limited snapshot stream; only this source module changes.
"""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def _to_parquet(pdf: pd.DataFrame, path: str) -> None:
    # Spark's streaming parquet reader rejects pandas' default INT64
    # nanosecond timestamps; coerce to micros.
    pdf.to_parquet(
        path, index=False, coerce_timestamps="us", allow_truncated_timestamps=True
    )


def write_epoch_files(
    pdf: pd.DataFrame, directory: str, n_epochs: int, sort_col: str | None = "event_time"
) -> list[str]:
    """Split a pandas frame into n_epochs parquet files (contiguous
    slices in sort_col order — mirrors arrival order of the stream)."""
    os.makedirs(directory, exist_ok=True)
    if sort_col is not None:
        pdf = pdf.sort_values(sort_col, kind="stable").reset_index(drop=True)
    n = len(pdf)
    paths = []
    for i in range(n_epochs):
        lo, hi = (n * i) // n_epochs, (n * (i + 1)) // n_epochs
        path = os.path.join(directory, f"epoch-{i:05d}.parquet")
        # same hidden-tmp + atomic-rename protocol as add_epoch: a
        # running file-stream source on this directory lists files
        # continuously and would record (and torn-read) a half-written
        # parquet (review r4d)
        tmp = os.path.join(directory, f".epoch-{i:05d}.parquet.tmp")
        _to_parquet(pdf.iloc[lo:hi], tmp)
        os.rename(tmp, path)
        paths.append(path)
    return paths


class EpochFileSource:
    """File-per-epoch streaming source with incremental file drops."""

    def __init__(self, spark: SparkSession, directory: str, schema: T.StructType):
        self.spark = spark
        self.directory = directory
        self.schema = schema
        os.makedirs(directory, exist_ok=True)
        # resume numbering after any pre-existing epoch files — starting
        # at 0 would silently OVERWRITE epoch-00000 (whose old content a
        # running file-stream source has already recorded and will never
        # re-read)
        existing = [
            int(n[len("epoch-"):].split(".", 1)[0])
            for n in os.listdir(directory)
            if n.startswith("epoch-") and n.endswith(".parquet")
        ]
        self._next = max(existing) + 1 if existing else 0

    def add_epoch(self, pdf: pd.DataFrame) -> str:
        path = os.path.join(self.directory, f"epoch-{self._next:05d}.parquet")
        # dot-prefixed temp name: Spark's file stream source ignores
        # hidden files, so the epoch appears atomically on rename — a
        # plain "<name>.tmp" IS listed and can be recorded mid-write
        # (FileNotFound at task time once renamed, or a torn read)
        tmp = os.path.join(self.directory, f".epoch-{self._next:05d}.parquet.tmp")
        _to_parquet(pdf, tmp)
        os.rename(tmp, path)  # files must appear atomically for the reader
        self._next += 1
        return path

    def stream(self, files_per_trigger: int = 1) -> DataFrame:
        return (
            self.spark.readStream.schema(self.schema)
            .option("maxFilesPerTrigger", files_per_trigger)
            .parquet(self.directory)
        )
