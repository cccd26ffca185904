"""Multimodal columns: image/audio/video as opaque ``binary`` payloads
with typed metadata, processed by Arrow-batched pandas UDFs over
``mapInPandas``.

The DEFAULT decode step is a stub (``_fake_decode``: deterministic
pseudo-features from a sha256 of the payload, clearly marked) so the m1
oracle is independent of any codec. A REAL decoder exists behind the
same swap point: ``functions/media_codecs.decode_media_features``
decodes 24-bit BMP images (pure numpy) and PCM16 WAV audio (stdlib
``wave``) for real and featurizes them — exercised end-to-end by the
m3 registry query and tests/test_media_codecs.py. Only video decode
remains out of sandbox scope (needs ffmpeg). The Spark-side plumbing
(schema, batch iteration, partitioning, UDF signature) is identical for
both.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)

# ONE definition of the feature-vector contract: media_codecs sizes the
# vectors it produces, this module validates plug-in decoders against
# the same constant and uses the same bit-pattern checksum — a local
# copy of either silently drifts (review finding)
from diffdataflowmlpipelines_spark.functions.media_codecs import (  # noqa: E402
    FEATURE_DIM,
    feature_checksum,
)


def synthetic_media_df(spark, n_rows: int, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes)."""
    rng = np.random.default_rng(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n_rows):
        kind = kinds[i % 3]
        payload = rng.bytes(64 + int(rng.integers(0, 64)))
        rows.append(
            (
                f"media-{i:06d}",
                kind,
                bytearray(payload),
                int(rng.integers(16, 512)) if kind != "audio" else None,
                int(rng.integers(16, 512)) if kind != "audio" else None,
                int(rng.integers(100, 60_000)) if kind != "image" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _fake_decode_words(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """STUB decoder core: deterministic uint32 words from the sha256 of
    the payload (digest repeated to dim*4 bytes, read little-endian)."""
    h = hashlib.sha256(payload).digest()
    return np.frombuffer((h * ((dim * 4) // len(h) + 1))[: dim * 4], dtype="<u4")


def _fake_decode(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """STUB decoder: deterministic pseudo-features from a sha256 of the
    payload. Replace with a real decode + model forward pass."""
    raw = _fake_decode_words(payload, dim)
    return (raw.astype(np.float64) / np.iinfo(np.uint32).max).astype(np.float32)


FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("features", T.ArrayType(T.FloatType(), False), False),
        # exact-integer digest of the decode intermediate (sum of the raw
        # uint32 words): oracle-checkable cross-engine where the float32
        # feature array is not hashable by the driver's canonicalizer.
        T.StructField("feat_checksum", T.LongType(), False),
    ]
)


def extract_media_features(df: DataFrame, decode_fn=None) -> DataFrame:
    """mapInPandas feature extraction: Arrow batches in, one row per
    media item out. Partition-parallel; no driver collection.

    ``decode_fn`` is the production swap point (VERDICT r2 item 8):
    any ``bytes -> np.ndarray(float32, FEATURE_DIM)`` — a real
    PIL/ffmpeg decode + model forward pass — drops in; the contract
    test (tests/test_datapipeline.py) pins the schema/determinism
    requirements any decoder must satisfy. With a plug-in decoder the
    checksum is the exact-integer sum of the float32 bit patterns;
    the default stub keeps its historical raw-sha-word checksum so the
    m1 registry oracle is unchanged.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode_fn is None:
                words = [_fake_decode_words(bytes(p)) for p in pdf["payload"]]
                feats = [
                    (w.astype(np.float64) / np.iinfo(np.uint32).max).astype(
                        np.float32
                    )
                    for w in words
                ]
                checksums = [int(w.sum()) for w in words]
            else:
                feats = [
                    np.asarray(decode_fn(bytes(p)), dtype=np.float32)
                    for p in pdf["payload"]
                ]
                for v in feats:
                    if v.shape != (FEATURE_DIM,):  # enforce the contract
                        raise ValueError(
                            f"decode_fn must return shape ({FEATURE_DIM},), "
                            f"got {v.shape}"
                        )
                checksums = [feature_checksum(v) for v in feats]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(len).astype("int32"),
                    "features": feats,
                    "feat_checksum": checksums,
                }
            )

    return df.mapInPandas(fn, FEATURES_SCHEMA)


def features_bits_csv(col) -> "F.Column":
    """Bit-exact encoding of an ``array<float>`` column: CSV of the
    float32 bit patterns (Arrow-batched pandas UDF; no float formatting,
    so equality means bit-identical vectors — used by the m3 real-decode
    oracle against fixture-pinned strings)."""
    from diffdataflowmlpipelines_spark.functions.media_codecs import f32_bits_csv

    @F.pandas_udf(T.StringType())
    def _bits(feats: pd.Series) -> pd.Series:
        return feats.map(f32_bits_csv)

    return _bits(col)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: one output row per frame timestamp
    (explode over a JVM-side sequence — the decode itself would be a
    downstream mapInPandas). Demonstrates the 1->N multimodal fan-out
    shape without decoding."""
    frames = F.sequence(
        F.lit(0),
        F.greatest((F.col("duration_ms") - 1), F.lit(0)),
        F.lit(every_ms),
    )
    return (
        # a NULL or zero duration has no frames: greatest() skips NULLs,
        # so unfiltered those rows would emit a spurious frame at t=0
        df.filter(
            (F.col("kind") == "video")
            & F.col("duration_ms").isNotNull()
            & (F.col("duration_ms") > 0)
        )
        .select("media_id", F.explode(frames).alias("frame_ms"))
    )
