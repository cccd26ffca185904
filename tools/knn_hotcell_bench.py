"""knn_graph hot-cell cap evidence (the semantic_dedup verdict-r4-#2
hazard, same fix, s7 face): plant a degenerate assignment — 90% of
vectors in ONE centroid cell — and compare the exact per-cell self-join
against the max_cell sub-split on (a) wall, (b) candidate-pair mass
(Σ|cell|² vs Σ|cell,band,sub|²), and (c) edge recall vs the exact
within-cell graph — the honesty metric: a capped rank-j neighbor may be
farther than the true j-th when true neighbors straddle sub-cells, and
OR-banding (subsplit_bands) buys that recall back at pair-mass ×bands.
Planted exact duplicates (identical directions always share every
band's sub-signature) must keep their rank-1 edges in every mode.

Appends the table to SCALING.md. Run alone (repo rule).

Env: KNNHOT_ROWS (default 8000 — exact mode is O(hot-cell²)),
KNNHOT_BIG (default 40000, capped-only, where exact would explode),
KNNHOT_MAX_CELL (256), KNNHOT_DIM (16), KNNHOT_BANDS (4),
KNNHOT_K (3).
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

HOT_ROWS = int(os.environ.get("KNNHOT_ROWS", "8000"))
BIG_ROWS = int(os.environ.get("KNNHOT_BIG", "40000"))
MAX_CELL = int(os.environ.get("KNNHOT_MAX_CELL", "256"))
DIM = int(os.environ.get("KNNHOT_DIM", "16"))
BANDS = int(os.environ.get("KNNHOT_BANDS", "4"))
K = int(os.environ.get("KNNHOT_K", "3"))


def make_rows(n: int):
    """90% of mass in centroid cell 0 + exact-duplicate plants (the
    semdedup_hotcell_bench corpus shape, so the two evidence tables
    are comparable)."""
    import numpy as np

    rng = np.random.default_rng(5)
    rows = []
    for i in range(n):
        v = rng.standard_normal(DIM) * 0.6
        if i % 10 != 0:
            v[0] = abs(v[0]) + 2.0
        else:
            v[1] = abs(v[1]) + 2.0
        rows.append((i, [float(x) for x in v]))
    for j in range(n // 100):
        rows.append((10_000_000 + j, list(rows[j * 10 + 1][1])))
    return rows


def pair_mass(df, keys):
    from pyspark.sql import functions as F

    return (
        df.groupBy(*keys)
        .count()
        .agg(F.sum(F.col("count") * F.col("count")).alias("p2"))
        .first()["p2"]
    )


def main() -> None:
    from pyspark.sql import functions as F

    from diffdataflowmlpipelines_spark.functions.similarity import (
        _nearest_assign,
        _subsplit_hot_cells,
        knn_graph,
    )
    from diffdataflowmlpipelines_spark.session import get_spark

    spark = get_spark(app_name="knn_hotcell_bench", shuffle_partitions=32)
    cents = spark.createDataFrame(
        [
            (0, [1.0] + [0.0] * (DIM - 1)),
            (1, [0.0, 1.0] + [0.0] * (DIM - 2)),
        ],
        "vec_id long, embedding array<double>",
    )
    n_plants = HOT_ROWS // 100
    df_hot = spark.createDataFrame(
        make_rows(HOT_ROWS), "vec_id long, embedding array<double>"
    )

    # pair-mass accounting over the same assignment the operator uses
    assigned = _nearest_assign(
        df_hot, "vec_id", "embedding", n_centroids=0, centroids=cents,
        round_to=9, what="bench",
    ).localCheckpoint(eager=True)
    mass_exact = pair_mass(assigned, ["cluster_id"])
    sub1 = _subsplit_hot_cells(assigned, max_cell=MAX_CELL, seed=42,
                               max_planes=16)
    mass_cap1 = pair_mass(sub1, ["cluster_id", "__band", "__sub"])
    subb = _subsplit_hot_cells(assigned, max_cell=MAX_CELL, seed=42,
                               max_planes=16, bands=BANDS)
    mass_capb = pair_mass(subb, ["cluster_id", "__band", "__sub"])

    def run(df, max_cell, bands=1):
        t0 = time.monotonic()
        out = knn_graph(
            df, "vec_id", "embedding", k=K, centroids=cents,
            max_cell=max_cell, subsplit_bands=bands,
        ).localCheckpoint(eager=True)
        wall = time.monotonic() - t0
        edges = {(r.vec_id, r.neighbor_id) for r in out.collect()}
        # planted duplicates must keep a cosine-1.0 rank-1 edge
        plants_r1 = (
            out.filter(
                (F.col("vec_id") >= 10_000_000)
                & (F.col("rank") == 1)
                & (F.col("cosine") >= 0.999999999)
            ).count()
        )
        return wall, edges, plants_r1

    t_exact, e_exact, p_exact = run(df_hot, None)
    t_cap1, e_cap1, p_cap1 = run(df_hot, MAX_CELL, 1)
    t_capb, e_capb, p_capb = run(df_hot, MAX_CELL, BANDS)

    def recall(e):
        return len(e & e_exact) / max(len(e_exact), 1)

    # big corpus: capped only (exact hot cell would be ~(0.9*BIG)^2 pairs)
    df_big = spark.createDataFrame(
        make_rows(BIG_ROWS), "vec_id long, embedding array<double>"
    )
    n_plants_big = BIG_ROWS // 100
    t_big, _, p_big = run(df_big, MAX_CELL, BANDS)

    result = {
        "hot_rows": HOT_ROWS,
        "k": K,
        "max_cell": MAX_CELL,
        "bands": BANDS,
        "pair_mass_exact": int(mass_exact),
        "pair_mass_cap1": int(mass_cap1),
        "pair_mass_capb": int(mass_capb),
        "t_exact_s": round(t_exact, 1),
        "t_cap1_s": round(t_cap1, 1),
        "t_capb_s": round(t_capb, 1),
        "recall_cap1": round(recall(e_cap1), 3),
        "recall_capb": round(recall(e_capb), 3),
        "plants_rank1_exact": p_exact,
        "plants_rank1_cap1": p_cap1,
        "plants_rank1_capb": p_capb,
        "n_plants": n_plants,
        "big_rows": BIG_ROWS,
        "t_big_capb_s": round(t_big, 1),
        "plants_rank1_big": p_big,
        "n_plants_big": n_plants_big,
    }
    print(json.dumps(result))

    r1 = round(mass_exact / max(mass_cap1, 1), 1)
    rb = round(mass_exact / max(mass_capb, 1), 1)
    with open(os.path.join(REPO, "SCALING.md"), "a") as f:
        f.write(
            f"\n## knn_graph hot-cell cap (round 5, tools/knn_hotcell_bench.py)\n\n"
            f"Planted degenerate assignment: 90% of {HOT_ROWS} vectors in ONE "
            f"centroid cell (+{n_plants} exact-duplicate plants), dim {DIM}, "
            f"k={K}, local[32] — the same corpus shape as the semantic_dedup "
            f"cap table, on the s7 operator:\n\n"
            f"| mode | pair mass Σ\\|group\\|² | wall | edge recall vs exact | dup plants at rank 1 |\n"
            f"|---|---|---|---|---|\n"
            f"| exact (within-cell) | {mass_exact:,} | {t_exact:.1f} s | 1.000 | {p_exact}/{n_plants} |\n"
            f"| max_cell={MAX_CELL}, 1 band | {mass_cap1:,} ({r1}× less) | {t_cap1:.1f} s | {result['recall_cap1']:.3f} | {p_cap1}/{n_plants} |\n"
            f"| max_cell={MAX_CELL}, {BANDS} bands | {mass_capb:,} ({rb}× less) | {t_capb:.1f} s | {result['recall_capb']:.3f} | {p_capb}/{n_plants} |\n"
            f"| max_cell={MAX_CELL}, {BANDS} bands @ {BIG_ROWS} rows | — | {t_big:.1f} s | — | {p_big}/{n_plants_big} |\n\n"
            f"Identical directions share every band's sub-signature, so exact\n"
            f"duplicates keep their cosine-1.0 rank-1 edges under the cap; edge\n"
            f"recall < 1 is the disclosed blocked-ANN trade (a true neighbor\n"
            f"straddling every band's sub-cells is invisible to the window —\n"
            f"raising bands buys it back at bounded extra pair mass). The\n"
            f"{BIG_ROWS}-row line is the flat-where-exact-is-quadratic point:\n"
            f"exact mode's hot cell there is ~{int(0.9 * BIG_ROWS):,}² pairs\n"
            f"and does not finish in bench time.\n"
        )
    spark.stop()


if __name__ == "__main__":
    main()
