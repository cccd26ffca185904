"""Blocked k-NN graph A/B (s7 evidence): cell-blocked knn_graph vs the
exact single-cell brute force on the sf0.1 embeddings, reporting BOTH
wall clock and edge recall — the honesty metric for cell blocking
(cross-cell true neighbors are missed; recall is governed by centroid
quality and count).

Pair-mass argument: brute force is |V|^2 pairs; C balanced cells cut it
to ~|V|^2/C. The 2k-vector local table keeps absolute walls small —
the reported pair counts are the scale story (at 10^9 vectors brute
force is 10^18 pairs and does not terminate; 50k cells make it ~2x10^13).

Env: KNN_REPS (default 3), KNN_CPUS (32), KNN_K (3). Prints one JSON
line and appends a section to SCALING.md. Run alone (repo rule).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

REPS = int(os.environ.get("KNN_REPS", "3"))
CPUS = int(os.environ.get("KNN_CPUS", "32"))
K = int(os.environ.get("KNN_K", "3"))


def main() -> None:
    from pyspark.sql import functions as F

    from diffdataflowmlpipelines_spark.functions.similarity import (
        kmeans_centroids,
        knn_graph,
    )
    from diffdataflowmlpipelines_spark.session import get_spark

    spark = get_spark(app_name="knn_bench", master=f"local[{CPUS}]")
    emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    n = emb.count()

    variants: dict[str, dict] = {}

    def edges(df) -> set:
        return {(r.vec_id, r.neighbor_id) for r in df.collect()}

    # ground truth: one cell == exact brute force (pinned by unit test)
    truth = edges(knn_graph(emb, "vec_id", "embedding", k=K, n_centroids=1))

    cents32 = kmeans_centroids(emb, "vec_id", "embedding", n_centroids=32, seed=7)
    cases = {
        "brute_force_1cell": dict(n_centroids=1),
        "first8_cells": dict(n_centroids=8),
        "kmeans32_cells": dict(centroids=cents32),
    }
    for name, kw in cases.items():
        got = edges(knn_graph(emb, "vec_id", "embedding", k=K, **kw))
        walls = []
        for _ in range(REPS):
            t0 = time.monotonic()
            knn_graph(emb, "vec_id", "embedding", k=K, **kw).count()
            walls.append(time.monotonic() - t0)
        variants[name] = {
            "median_s": statistics.median(walls),
            "recall": len(got & truth) / max(len(truth), 1),
        }

    out = {"bench": "knn_ab", "n_vectors": n, "k": K, "reps": REPS,
           "cpus": CPUS, "variants": variants}
    print(json.dumps(out))

    lines = [
        "",
        "## Blocked k-NN graph: cells vs brute force (s7)",
        "",
        f"{n:,} vectors, k={K}, median of {REPS} at local[{CPUS}]; recall "
        "= fraction of the exact graph's edges recovered (cell blocking "
        "misses cross-cell true neighbors — the disclosed approximation):",
        "",
        "| variant | median (s) | edge recall |",
        "|---|---|---|",
    ]
    for name, v in variants.items():
        lines.append(f"| {name} | {v['median_s']:.2f} | {v['recall']:.3f} |")
    lines += [
        "",
        "Pair mass: brute force is |V|^2; C balanced cells cut it to "
        "~|V|^2/C (10^9 vectors: 10^18 pairs brute vs ~2x10^13 with "
        "SemDeDup's 50k cells). Recall on this NEAR-UNIFORM synthetic "
        "table is the worst case (true neighbors angularly spread; more "
        "cells = lower recall) — on clustered data the unit tests pin "
        "recall 1.0; for unclustered corpora recall is bought with "
        "fewer/larger cells or query-time multiprobe, not more centroids.",
    ]
    with open(os.path.join(REPO, "SCALING.md"), "a") as f:
        f.write("\n".join(lines) + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
