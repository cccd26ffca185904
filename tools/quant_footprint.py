"""Storage-footprint evidence for the quantized-search family (s9-s11):
write the sf0.1 embeddings table as (a) raw float64 arrays, (b) int8
scalar-quant codes, (c) JL-projected 16-d floats, (d) PQ codes (m=8),
and report parquet bytes per row. Bytes are deterministic — unlike the
wall-clock benches this is safe to run on a busy host.

Usage: PYTHONPATH=/root/repo python tools/quant_footprint.py
Appends a markdown block to SCALING.md.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import shutil
import tempfile

from pyspark.sql import functions as F

from diffdataflowmlpipelines_spark import get_spark
from diffdataflowmlpipelines_spark.functions.similarity import (
    pq_encode,
    pq_fit,
    random_projection,
    scalar_quant_fit,
    scalar_quantize,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def du(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    return total


def main() -> None:
    spark = get_spark()
    emb = (
        spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
        .filter(F.col("embedding").isNotNull())
        .select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
    )
    n = emb.count()

    mins, scales = scalar_quant_fit(emb, "embedding")
    cents = pq_fit(emb, "vec_id", "embedding", dim=64, m=8, ksub=8)

    variants = {
        "raw float64[64]": emb,
        "scalar int8 codes (s9)": scalar_quantize(
            emb, "embedding", mins, scales, code_col="codes"
        ).select("vec_id", "codes"),
        "JL float64[16] (s10)": random_projection(
            emb, "embedding", 64, 16, out_col="proj"
        ).select("vec_id", "proj"),
        "PQ int8 codes m=8 (s11)": pq_encode(
            emb, "embedding", cents, code_col="codes"
        ).select("vec_id", "codes"),
    }

    tmp = tempfile.mkdtemp(prefix="quantfoot_")
    rows = []
    try:
        for name, df in variants.items():
            out = os.path.join(tmp, name.split()[0] + str(len(rows)))
            df.coalesce(1).write.mode("overwrite").parquet(out)
            b = du(out)
            rows.append((name, b, b / n))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    base = rows[0][1]
    lines = [
        "",
        "## Quantized-search storage footprint (s9/s10/s11, sf0.1, "
        f"n={n})",
        "",
        "Parquet bytes for the vector payload each representation ships "
        "through a candidate join / holds in an embedding store "
        "(single-file, default compression; deterministic — no timing):",
        "",
        "| representation | bytes | bytes/row | vs raw |",
        "|---|---|---|---|",
    ]
    for name, b, per in rows:
        lines.append(f"| {name} | {b:,} | {per:.1f} | {base / b:.1f}x smaller |")
    lines += [
        "",
        "PQ at m=8 stores 8 bytes of codes per 512-byte vector; the "
        "candidate join in `pq_topk` shuffles exactly this column, which "
        "is why ADC search survives 100 TB corpora. The scalar path (s9) "
        "keeps 64 bytes and reconstructs per-dimension; JL (s10) trades "
        "4x size for full-precision downstream math.",
        "",
    ]
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SCALING.md"), "a") as f:
        f.write("\n".join(lines))
    for name, b, per in rows:
        print(f"{name:28s} {b:>12,} bytes  {per:8.1f} B/row")


if __name__ == "__main__":
    main()
