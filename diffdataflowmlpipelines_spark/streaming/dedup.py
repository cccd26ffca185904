"""Streaming near-duplicate detection — the dedup stage of a training
-data pipeline run where it actually has to run at 10^12-sequence scale:
on the ARRIVING stream, not as a post-hoc batch pass.

Composition (all bounded-state):

  docs stream ── minhash_signatures_rowwise (STATELESS projection —
                 the row-wise form needs no shuffle and no state)
              ── explode band buckets (stateless, xbands rows)
              ── watermarked stream-stream SELF-join on (band, bucket)
                 within ±tolerance event time  -> candidate pairs

State is bounded by the watermark exactly like the north-rule label
join: a document can only be matched against documents arriving within
the tolerance window, which is the correct semantic for streaming dedup
(matching against all history would need unbounded state; for cross-
window dedup, feed the emitted signatures to the batch LSH pass over
the exactly-once sink).

Candidate pairs may repeat across bands (band-level emission is
append-mode safe); exact-verify / distinct them in the downstream
foreachBatch (jaccard_pairs(candidates=...)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from diffdataflowmlpipelines_spark.functions.dedup import (
    lsh_band_buckets,
    minhash_signatures_rowwise,
)


def streaming_signatures(
    docs: DataFrame,
    *,
    key: str = "doc_id",
    tokens_col: str = "tokens",
    n_hashes: int = 8,
    shingle_n: int = 3,
    seed: int = 42,
) -> DataFrame:
    """(key, sig) — a stateless select, works identically on a streaming
    or batch DataFrame (persist these through the exactly-once sink for
    cross-window batch dedup passes)."""
    return minhash_signatures_rowwise(
        docs,
        key,
        tokens_col,
        n_hashes=n_hashes,
        shingle_n=shingle_n,
        seed=seed,
    )


def streaming_near_dup_candidates(
    docs: DataFrame,
    *,
    key: str = "doc_id",
    tokens_col: str = "tokens",
    n_hashes: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
    seed: int = 42,
    watermark: str = "30 seconds",
    tolerance_s: int = 30,
    streaming: bool = True,
) -> DataFrame:
    """Candidate near-dup pairs (a, b, a_time, b_time) from the arriving
    stream; a < b. Same function body serves the batch recompute oracle
    (streaming=False), which the parity test compares against."""
    from diffdataflowmlpipelines_spark.functions.dedup import (
        MERSENNE_P,
        _minhash_params,
        md5_hash60,
        word_shingles,
    )

    params = _minhash_params(n_hashes, seed)
    sh = F.array_distinct(word_shingles(F.col(tokens_col), shingle_n))
    hashes = F.transform(sh, lambda s: md5_hash60(s) % F.lit(MERSENNE_P))
    sig = F.array(
        *[
            F.array_min(
                F.transform(
                    hashes,
                    lambda h: (F.lit(a) * h + F.lit(b)) % F.lit(MERSENNE_P),
                )
            )
            for (a, b) in params
        ]
    )
    banded = docs.select(
        F.col(key),
        F.col("event_time"),
        F.explode(lsh_band_buckets(sig, bands=bands, sig_len=n_hashes)).alias("__bb"),
    ).select(
        key,
        "event_time",
        F.col("__bb.band").alias("band"),
        F.col("__bb.bucket").alias("bucket"),
    )
    if streaming:
        banded = banded.withWatermark("event_time", watermark)
    left = banded.select(
        F.col(key).alias("a"),
        F.col("event_time").alias("a_time"),
        "band",
        "bucket",
    )
    right = banded.select(
        F.col(key).alias("b"),
        F.col("event_time").alias("b_time"),
        F.col("band").alias("r_band"),
        F.col("bucket").alias("r_bucket"),
    )
    cond = (
        (left["band"] == right["r_band"])
        & (left["bucket"] == right["r_bucket"])
        & (left["a"] < right["b"])
        & (
            right["b_time"]
            >= left["a_time"] - F.expr(f"INTERVAL {tolerance_s} SECONDS")
        )
        & (
            right["b_time"]
            <= left["a_time"] + F.expr(f"INTERVAL {tolerance_s} SECONDS")
        )
    )
    return left.join(right, cond, "inner").select("a", "b", "a_time", "b_time")