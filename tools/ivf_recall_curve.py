"""IVF recall-vs-nprobe curve: sample-init vs KMeans-refined centroids
(VERDICT r3 item 7 — show the wired ``kmeans_centroids`` earning its
keep). Clustered corpus (the workload ANN indexes exist for): 64 true
clusters x 16 members in 64-d, 40 queries, recall@5 against the exact
``cosine_topk`` ground truth, 16 IVF cells, nprobe 1..4.

Appends a markdown table to SCALING.md.

Usage: PYTHONPATH=/root/repo python tools/ivf_recall_curve.py
Env: IVF_CLUSTERS, IVF_MEMBERS, IVF_QUERIES, IVF_CELLS.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CLUSTERS = int(os.environ.get("IVF_CLUSTERS", "64"))
MEMBERS = int(os.environ.get("IVF_MEMBERS", "16"))
QUERIES = int(os.environ.get("IVF_QUERIES", "40"))
CELLS = int(os.environ.get("IVF_CELLS", "16"))
K = 5


def main() -> None:
    from pyspark.sql import functions as F

    from diffdataflowmlpipelines_spark.functions.similarity import (
        cosine_topk,
        ivf_topk,
        kmeans_centroids,
    )
    from diffdataflowmlpipelines_spark.session import get_spark

    spark = get_spark(app_name="ivf_recall_curve")
    rng = np.random.default_rng(9)
    centers = rng.standard_normal((CLUSTERS, 64))
    n = CLUSTERS * MEMBERS
    vecs = np.repeat(centers, MEMBERS, axis=0) + 0.12 * rng.standard_normal((n, 64))
    df = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    ).localCheckpoint(eager=True)
    queries = df.filter(F.col("vec_id") < QUERIES)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(df, queries, "vec_id", "embedding", k=K).collect()
    }

    km = kmeans_centroids(df, "vec_id", "embedding", n_centroids=CELLS, seed=7)
    km = km.localCheckpoint(eager=True)

    def recall(cents, nprobe: int) -> float:
        approx = ivf_topk(
            df, queries, "vec_id", "embedding",
            k=K, nprobe=nprobe, n_centroids=CELLS, centroids=cents,
        )
        a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
        return len(exact & a) / len(exact)

    rows = []
    for nprobe in (1, 2, 3, 4):
        rows.append(
            (nprobe, recall(None, nprobe), recall(km, nprobe))
        )

    lines = [
        "",
        "## IVF recall@5 vs nprobe: sample-init vs KMeans centroids "
        f"(round 4; {CLUSTERS}x{MEMBERS} clustered corpus, 64-d, "
        f"{CELLS} cells, {QUERIES} queries)",
        "",
        "Sample init = the deterministic lowest-key default (oracle-"
        "replicable); KMeans = `kmeans_centroids` (distributed Lloyd's, "
        "seed 7). Ground truth = exact `cosine_topk`.",
        "",
        "| nprobe | recall (sample init) | recall (KMeans init) |",
        "|---|---|---|",
    ]
    for nprobe, rs, rk in rows:
        lines.append(f"| {nprobe} | {rs:.3f} | {rk:.3f} |")
    monotone = all(rk >= rs for _, rs, rk in rows)
    lines.append("")
    lines.append(
        f"KMeans >= sample at every nprobe: **{monotone}** "
        "(lowest-key init draws all cells from the first few clusters; "
        "Lloyd's spreads them, so fewer probes recover the true cell)."
    )
    with open(
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SCALING.md"),
        "a",
    ) as f:
        f.write("\n".join(lines) + "\n")
    for nprobe, rs, rk in rows:
        print(f"nprobe={nprobe} sample={rs:.3f} kmeans={rk:.3f}")
    print(f"kmeans_dominates={monotone}")
    spark.stop()


if __name__ == "__main__":
    main()
