"""Streaming scalar-quantizer fit — the incremental face of
``functions/similarity.scalar_quant_fit``.

A 100 TB embedding store doesn't refit its int8 quantizer by
rescanning the corpus: the per-dimension (min, max) is exactly the
retraction-capable statistic the streaming core already maintains for
MinMaxScaler (reference ``minmax_scaler.rs:53-72``), keyed by
embedding DIMENSION instead of by feature column. This module is that
composition: posexplode fan-out (stateless, stays in the scan stage)
into ``incremental_scaler_stats``, plus the fold from the emitted
update rows back to the ``(mins, scales)`` pair that
``scalar_quantize`` consumes — so batch fit and streamed fit are the
same numbers, test-pinned, including under retractions of the row
that held a dimension's extreme."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .stats import incremental_scaler_stats


def scalar_quant_stats_stream(
    df: DataFrame, vec_col: str, *, diff_col: str = "diff"
) -> DataFrame:
    """Per-dimension incremental statistics over a stream of
    ``(vec, diff)`` deltas. Output (update mode): ``(key=str(dim), n,
    mean, var_pop, min, max)`` — state is bounded by dimensionality x
    distinct values per dim (the multiset the retraction-capable
    min/max needs), never by corpus size."""
    exploded = df.select(
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("dim", "x"),
        F.col(diff_col).cast("long").alias("diff"),
    )
    return incremental_scaler_stats(exploded, "dim", "x")


def quant_params_from_stats(rows) -> tuple[list[float], list[float]]:
    """Fold emitted stats rows into ``(mins, scales)`` for
    :func:`~diffdataflowmlpipelines_spark.functions.similarity.scalar_quantize`.

    ``rows`` must be ordered oldest-first (e.g. the exactly-once sink's
    frame sorted by epoch): later updates for a dimension overwrite
    earlier ones, exactly the update-mode contract. Dimensions whose
    multiset emptied out (n == 0 after retractions) are dropped before
    the contiguity check. Requires UNSUPPRESSED emissions (the default
    here — :func:`scalar_quant_stats_stream` sets no rounding gate):
    with suppression, a dim whose min/max didn't move keeps a stale
    ``n`` and would trip the equal-population ragged guard."""
    latest: dict[int, dict] = {}
    for r in rows:
        latest[int(r["key"])] = r
    live = {d: r for d, r in latest.items() if int(r["n"]) > 0}
    if not live:
        raise ValueError("quant_params_from_stats: no live statistics")
    dims = sorted(live)
    # same two ragged guards as the batch scalar_quant_fit: contiguous
    # dims AND equal per-dim population (posexplode always yields a
    # contiguous prefix, so contiguity alone cannot see a short vector)
    if dims != list(range(len(dims))) or any(
        int(live[d]["n"]) != int(live[dims[0]]["n"]) for d in dims
    ):
        raise ValueError("quant_params_from_stats: ragged dimensions")
    mins = [float(live[d]["min"]) for d in dims]
    scales = [
        (float(live[d]["max"]) - float(live[d]["min"])) / 255.0 for d in dims
    ]
    return mins, scales
