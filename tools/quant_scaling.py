"""Two-parallelism scaling probe for the quantized-search family —
the north rule's N-vs-4N criterion applied to the round-5d operators.
One FRESH JVM per cell (local[8] then local[32], same deterministic
input), batch-only: Arrow PQ encode (ingest lane) and ADC scoring
over the materialized codes. Run ALONE on a quiet host.

Parent: spawns itself as a child per parallelism level, gathers one
JSON line each, computes efficiency = (t_8 / t_32) / 4 per stage,
appends to SCALING.md.

Env: QS_ROWS (default 120000), QS_QUERIES (default 384).
Child usage: quant_scaling.py --child <cpus>
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

ROWS = int(os.environ.get("QS_ROWS", "120000"))
QUERIES = int(os.environ.get("QS_QUERIES", "384"))
DIM, M, KSUB, K = 64, 8, 256, 10


def child(cpus: int) -> None:
    os.environ["SPARK_GRAFT_CPUS"] = str(cpus)
    from pyspark.sql import functions as F

    from diffdataflowmlpipelines_spark import get_spark
    from diffdataflowmlpipelines_spark.functions.similarity import (
        pq_encode_arrow,
        pq_fit,
        pq_topk,
    )

    spark = get_spark(app_name=f"quant_scaling_{cpus}")
    base = spark.range(ROWS).withColumnRenamed("id", "vec_id")
    vec = F.array(
        *[
            (F.sin(F.col("vec_id") * F.lit(0.137 + 0.011 * d)) * F.lit(3.0))
            for d in range(DIM)
        ]
    )
    corpus = base.withColumn("v", vec).localCheckpoint(eager=True)
    queries = corpus.filter(F.col("vec_id") < QUERIES).localCheckpoint(
        eager=True
    )
    cents = pq_fit(corpus, "vec_id", "v", dim=DIM, m=M, ksub=KSUB)

    enc = pq_encode_arrow(corpus, "v", cents, code_col="codes").select(
        "vec_id", "codes"
    )
    force = lambda df: df.agg(  # noqa: E731
        F.sum(F.element_at("codes", 1).cast("long"))
    ).collect()[0][0]
    force(enc)  # warm python workers + codegen
    t0 = time.monotonic()
    force(enc)
    encode_s = time.monotonic() - t0

    code_tbl = enc.localCheckpoint(eager=True)
    topk = pq_topk(
        corpus, queries, "vec_id", "v", dim=DIM, m=M, ksub=KSUB,
        k=K, centroids=cents, codes=code_tbl,
    )
    topk.count()  # warm
    t0 = time.monotonic()
    n = topk.count()
    score_s = time.monotonic() - t0

    print(
        json.dumps(
            {"cpus": cpus, "encode_s": round(encode_s, 2),
             "score_s": round(score_s, 2), "rows": n}
        )
    )


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(int(sys.argv[2]))
        return
    cells = {}
    for cpus in (8, 32):
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", str(cpus)],
            capture_output=True, text=True, timeout=1800,
            env={**os.environ, "PYTHONPATH": os.path.dirname(HERE)},
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        cells[cpus] = json.loads(line)
        print(line)
    eff_encode = (cells[8]["encode_s"] / cells[32]["encode_s"]) / 4
    eff_score = (cells[8]["score_s"] / cells[32]["score_s"]) / 4
    lines = [
        "",
        f"## Quantized-search two-parallelism scaling ({ROWS} x {DIM}-d, "
        f"{QUERIES} queries, m={M}, ksub={KSUB}, fresh JVM per cell)",
        "",
        "The north rule's N-vs-4N criterion applied to the round-5d "
        "family — batch stages (no state store), one process per "
        "parallelism level on identical deterministic input, warmed "
        "then timed:",
        "",
        "| stage | local[8] | local[32] | efficiency (N->4N) |",
        "|---|---|---|---|",
        f"| Arrow PQ encode (ingest lane) | {cells[8]['encode_s']:.2f} s | "
        f"{cells[32]['encode_s']:.2f} s | {eff_encode:.2f} |",
        f"| ADC top-{K} scoring over codes | {cells[8]['score_s']:.2f} s | "
        f"{cells[32]['score_s']:.2f} s | {eff_score:.2f} |",
        "",
    ]
    with open(os.path.join(os.path.dirname(HERE), "SCALING.md"), "a") as f:
        f.write("\n".join(lines))
    print(f"efficiency encode={eff_encode:.2f} score={eff_score:.2f}")


if __name__ == "__main__":
    main()
