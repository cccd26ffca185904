"""Deterministic synthetic fixtures (FIXTURES.md F1/F2).

F1 — pre-tokenized training-sequence table, exactly the BASELINE.json
input_hint shape: (doc_id: string, tokens: array<int32>, n_tok: int32,
source: string); mirrors the reference's random 5-10-token strings over a
fixed vocab (``src/main.rs:244-259,286-296``). The streaming envelope
adds event_time (monotone with controlled late rows) and diff (+1; a
seeded ~0.5% re-emitted later with diff = -1 to exercise the abelian
negate/consolidation paths, cf.
``src/types/integer_assignment_aggregate.rs:132-138``).

Everything is seeded numpy — no wall clock, no external data.
"""

from __future__ import annotations

from datetime import datetime, timedelta

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

SOURCES = ["web", "books", "code", "chat"]
BASE_TS = datetime(2024, 1, 1, 0, 0, 0)
VOCAB = 32_000
HOT_KEYS = [f"doc-hot-{k}" for k in range(8)]

TOKENS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("tokens", T.ArrayType(T.IntegerType(), False), False),
        T.StructField("n_tok", T.IntegerType(), False),
        T.StructField("source", T.StringType(), False),
    ]
)

TOKENS_STREAM_SCHEMA = T.StructType(
    list(TOKENS_SCHEMA.fields)
    + [
        T.StructField("event_time", T.TimestampType(), False),
        T.StructField("diff", T.LongType(), False),
    ]
)

LABELS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("source", T.StringType(), False),
        T.StructField("label", T.IntegerType(), False),
        T.StructField("event_time", T.TimestampType(), False),
    ]
)


def gen_tokens_pdf(
    n_rows: int,
    seed: int = 42,
    *,
    vocab: int = VOCAB,
    hot_frac: float = 0.01,
    retract_frac: float = 0.005,
    late_frac: float = 0.05,
    late_max_s: int = 30,
    rows_per_second: float = 100.0,
) -> pd.DataFrame:
    """F1 rows with streaming envelope, as pandas (Arrow-convertible).

    event_time advances monotonically at ``rows_per_second``; a seeded
    ``late_frac`` of rows arrive up to ``late_max_s`` seconds late
    (out-of-order but inside a 30s watermark); ``retract_frac`` of rows
    are duplicated later in the stream with diff = -1.
    """
    rng = np.random.default_rng(seed)
    lengths = rng.integers(5, 11, size=n_rows)
    total = int(lengths.sum())
    toks = ((rng.zipf(1.5, size=total) - 1) % vocab).astype(np.int32)
    offs = np.concatenate([[0], np.cumsum(lengths)])
    tokens = [toks[offs[i] : offs[i + 1]] for i in range(n_rows)]

    hot = rng.random(n_rows) < hot_frac
    doc_ids = np.array([f"doc-{i:08d}" for i in range(n_rows)], dtype=object)
    doc_ids[hot] = rng.choice(HOT_KEYS, size=int(hot.sum()))

    src = np.array(SOURCES, dtype=object)[
        (np.arange(n_rows) + rng.integers(0, 4, size=n_rows)) % 4
    ]

    secs = np.arange(n_rows) / rows_per_second
    late = rng.random(n_rows) < late_frac
    secs = secs + np.where(late, rng.uniform(-late_max_s, 0, size=n_rows), 0.0)
    secs = np.maximum(secs, 0.0)
    ts = pd.Timestamp(BASE_TS) + pd.to_timedelta(
        np.round(secs * 1e6).astype("int64"), unit="us"
    )

    pdf = pd.DataFrame(
        {
            "doc_id": doc_ids,
            "tokens": tokens,
            "n_tok": lengths.astype(np.int32),
            "source": src,
            "event_time": ts,
            "diff": np.ones(n_rows, dtype=np.int64),
        }
    )

    # retractions: re-emit a seeded subset later with diff = -1.
    # Appended at the END (arrival after the insert, by construction) —
    # NOT re-sorted by event_time: a global sort here erased the late
    # rows' out-of-orderness, making every watermark-lateness test over
    # this fixture vacuously in-order (review r4d). Row order IS arrival
    # order; keep it with write_epoch_files(..., sort_col=None) — the
    # writer's default event-time sort deliberately produces the
    # in-order variant.
    n_retract = int(round(n_rows * retract_frac))
    if n_retract:
        idx = rng.choice(n_rows, size=n_retract, replace=False)
        retr = pdf.iloc[idx].copy()
        retr["event_time"] = retr["event_time"] + timedelta(seconds=late_max_s / 2)
        retr["diff"] = -1
        pdf = pd.concat([pdf, retr], ignore_index=True)
    return pdf


def gen_labels_pdf(tokens_pdf: pd.DataFrame, seed: int = 43) -> pd.DataFrame:
    """F2 side stream: (doc_id, source, label, event_time) sampled from
    F1's key population, timestamps within the watermark delay of the
    matching row — drives the stateful stream-stream join."""
    rng = np.random.default_rng(seed)
    base = tokens_pdf[tokens_pdf["diff"] > 0][["doc_id", "source", "event_time"]]
    take = rng.random(len(base)) < 0.7
    lab = base[take].copy()
    lab["label"] = rng.integers(0, 2, size=len(lab)).astype(np.int32)
    lab["event_time"] = lab["event_time"] + pd.to_timedelta(
        rng.uniform(-10, 10, size=len(lab)), unit="s"
    )
    lab["event_time"] = lab["event_time"].dt.floor("us")
    return lab[["doc_id", "source", "label", "event_time"]].reset_index(drop=True)


def tokens_df(
    spark: SparkSession, n_rows: int, seed: int = 42, *, stream_cols: bool = True, **kw
) -> DataFrame:
    pdf = gen_tokens_pdf(n_rows, seed, **kw)
    if not stream_cols:
        pdf = pdf[pdf["diff"] > 0][["doc_id", "tokens", "n_tok", "source"]]
        return spark.createDataFrame(pdf, schema=TOKENS_SCHEMA)
    return spark.createDataFrame(pdf, schema=TOKENS_STREAM_SCHEMA)


def labels_df(spark: SparkSession, tokens_pdf: pd.DataFrame, seed: int = 43) -> DataFrame:
    return spark.createDataFrame(gen_labels_pdf(tokens_pdf, seed), schema=LABELS_SCHEMA)
