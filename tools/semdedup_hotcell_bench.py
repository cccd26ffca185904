"""SemDeDup hot-cell cap evidence (verdict r4 #2 done-gate): plant a
degenerate assignment — most vectors in ONE centroid cell — and compare
the exact within-cell pairwise pass against the max_cell sub-split on
(a) time and (b) candidate-pair mass (Σ|cell|² vs Σ|sub-cell|²).
Appends the table to SCALING.md.

Second section (round-5 follow-through): OR-banding recall on planted
NEAR-duplicates (cos ≈ 0.95, NOT identical — the pairs a single band
can miss across sub-cell boundaries): exact vs 1-band vs
SEMDEDUP_BANDS-band capped drops, with per-mode pair mass and wall.

Env: SEMDEDUP_HOT_ROWS (default 8000 — exact mode is O(rows²)),
SEMDEDUP_BIG_ROWS (default 40000, capped-only, where exact would
explode), SEMDEDUP_MAX_CELL (256), SEMDEDUP_DIM (16),
SEMDEDUP_BANDS (4).
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

HOT_ROWS = int(os.environ.get("SEMDEDUP_HOT_ROWS", "8000"))
BIG_ROWS = int(os.environ.get("SEMDEDUP_BIG_ROWS", "40000"))
MAX_CELL = int(os.environ.get("SEMDEDUP_MAX_CELL", "256"))
DIM = int(os.environ.get("SEMDEDUP_DIM", "16"))
BANDS = int(os.environ.get("SEMDEDUP_BANDS", "4"))


def make_rows(n: int):
    import numpy as np

    rng = np.random.default_rng(5)
    rows = []
    for i in range(n):
        v = rng.standard_normal(DIM) * 0.6
        if i % 10 != 0:  # 90% of mass lands in cell 0
            v[0] = abs(v[0]) + 2.0
        else:
            v[1] = abs(v[1]) + 2.0
        rows.append((i, [float(x) for x in v]))
    # planted exact duplicates inside the hot cell
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
        semantic_dedup,
    )
    from diffdataflowmlpipelines_spark.session import get_spark

    spark = get_spark(app_name="semdedup_hotcell_bench", shuffle_partitions=32)
    cents = spark.createDataFrame(
        [
            (0, [1.0] + [0.0] * (DIM - 1)),
            (1, [0.0, 1.0] + [0.0] * (DIM - 2)),
        ],
        "vec_id long, embedding array<double>",
    )

    def run(n_rows: int, max_cell: int | None) -> tuple[float, int, int]:
        df = spark.createDataFrame(
            make_rows(n_rows), "vec_id long, embedding array<double>"
        )
        t0 = time.monotonic()
        out = semantic_dedup(
            df,
            "vec_id",
            "embedding",
            threshold=0.999,
            centroids=cents,
            max_cell=max_cell,
        )
        # count the PLANTED ids (vec_id >= 10M) separately from total
        # drops: incidental above-threshold pairs also drop, so "dups
        # caught" must verify the specific plants, like the unit test
        # does (review r5)
        row = out.agg(
            F.sum(F.when(F.col("keep") == 0, 1).otherwise(0)).alias("d"),
            F.sum(
                F.when(
                    (F.col("keep") == 0) & (F.col("vec_id") >= 10_000_000), 1
                ).otherwise(0)
            ).alias("p"),
        ).first()
        return time.monotonic() - t0, int(row["d"] or 0), int(row["p"] or 0)

    df_hot = spark.createDataFrame(
        make_rows(HOT_ROWS), "vec_id long, embedding array<double>"
    )
    assigned = _nearest_assign(
        df_hot, "vec_id", "embedding", n_centroids=0, centroids=cents,
        round_to=9, what="bench",
    ).localCheckpoint(eager=True)
    mass_exact = pair_mass(assigned, ["cluster_id"])
    sub = _subsplit_hot_cells(assigned, max_cell=MAX_CELL, seed=42, max_planes=16)
    mass_capped = pair_mass(sub, ["cluster_id", "__sub"])

    t_exact, d_exact, p_exact = run(HOT_ROWS, None)
    t_capped, d_capped, p_capped = run(HOT_ROWS, MAX_CELL)
    t_big, d_big, p_big = run(BIG_ROWS, MAX_CELL)

    n_dups_hot = HOT_ROWS // 100
    n_dups_big = BIG_ROWS // 100
    result = {
        "hot_rows": HOT_ROWS,
        "max_cell": MAX_CELL,
        "pair_mass_exact": int(mass_exact),
        "pair_mass_capped": int(mass_capped),
        "pair_mass_ratio": round(mass_exact / max(mass_capped, 1), 1),
        "t_exact_s": round(t_exact, 1),
        "t_capped_s": round(t_capped, 1),
        "dropped_exact": d_exact,
        "dropped_capped": d_capped,
        "planted_caught_exact": p_exact,
        "planted_caught_capped": p_capped,
        "planted_dups_hot": n_dups_hot,
        "big_rows": BIG_ROWS,
        "t_big_capped_s": round(t_big, 1),
        "dropped_big": d_big,
        "planted_caught_big": p_big,
        "planted_dups_big": n_dups_big,
    }
    print(json.dumps(result))

    # --- OR-banding near-dup recall section ------------------------------
    import numpy as np

    rng = np.random.default_rng(13)
    near_rows = make_rows(HOT_ROWS)
    n_near = HOT_ROWS // 100
    base_ids = [i * 10 + 1 for i in range(n_near)]  # hot-cell members
    for j, src in enumerate(base_ids):
        v = np.array(near_rows[src][1])
        vp = v + rng.standard_normal(DIM) * (float(np.linalg.norm(v)) * 0.08)
        near_rows.append((20_000_000 + j, [float(x) for x in vp]))
    df_near = spark.createDataFrame(
        near_rows, "vec_id long, embedding array<double>"
    )

    def run_near(max_cell: int | None, bands: int = 1):
        t0 = time.monotonic()
        out = semantic_dedup(
            df_near,
            "vec_id",
            "embedding",
            threshold=0.93,
            centroids=cents,
            max_cell=max_cell,
            subsplit_bands=bands,
        )
        row = out.agg(
            F.sum(
                F.when(
                    (F.col("keep") == 0) & (F.col("vec_id") >= 20_000_000), 1
                ).otherwise(0)
            ).alias("p")
        ).first()
        return time.monotonic() - t0, int(row["p"] or 0)

    t_nx, p_nx = run_near(None)
    t_n1, p_n1 = run_near(MAX_CELL, 1)
    t_nb, p_nb = run_near(MAX_CELL, BANDS)
    near = {
        "near_rows": HOT_ROWS,
        "near_plants": n_near,
        "bands": BANDS,
        "near_caught_exact": p_nx,
        "near_caught_1band": p_n1,
        f"near_caught_{BANDS}band": p_nb,
        "t_near_exact_s": round(t_nx, 1),
        "t_near_1band_s": round(t_n1, 1),
        f"t_near_{BANDS}band_s": round(t_nb, 1),
    }
    print(json.dumps(near))

    with open(os.path.join(REPO, "SCALING.md"), "a") as f:
        f.write(
            f"\n## SemDeDup hot-cell cap (round 5, tools/semdedup_hotcell_bench.py)\n\n"
            f"Planted degenerate assignment: 90% of {HOT_ROWS} vectors in ONE "
            f"centroid cell (+{n_dups_hot} exact-duplicate plants), dim {DIM}, "
            f"threshold 0.999, local[32].\n\n"
            f"| mode | candidate-pair mass Σ\\|group\\|² | wall | planted dups caught | total drops |\n"
            f"|---|---|---|---|---|\n"
            f"| exact (within-cell pairwise) | {mass_exact:,} | {t_exact:.1f} s | {p_exact}/{n_dups_hot} | {d_exact} |\n"
            f"| max_cell={MAX_CELL} sub-split | {mass_capped:,} ({result['pair_mass_ratio']}× less) | {t_capped:.1f} s | {p_capped}/{n_dups_hot} | {d_capped} |\n"
            f"| max_cell={MAX_CELL} @ {BIG_ROWS} rows | — | {t_big:.1f} s | {p_big}/{n_dups_big} | {d_big} |\n\n"
            f"Identical directions share a sub-signature by construction, so "
            f"every planted duplicate survives the cap; the pair mass — the "
            f"quantity that degenerates to all-pairs on a hot cell — drops "
            f"{result['pair_mass_ratio']}×, and the capped pass stays flat "
            f"where the exact pass is O(cell²) (see the {BIG_ROWS}-row line, "
            f"which exact mode cannot reach in bench time).\n"
            f"\n### OR-banding recall on planted NEAR-duplicates\n\n"
            f"{n_near} near-duplicate plants (cos ≈ 0.95, NOT identical — the "
            f"pairs a single band can split) in the same 90%-hot corpus, "
            f"threshold 0.93:\n\n"
            f"| mode | planted near-dups caught | wall |\n"
            f"|---|---|---|\n"
            f"| exact (ground truth) | {p_nx}/{n_near} | {t_nx:.1f} s |\n"
            f"| max_cell={MAX_CELL}, 1 band | {p_n1}/{n_near} | {t_n1:.1f} s |\n"
            f"| max_cell={MAX_CELL}, {BANDS} bands | {p_nb}/{n_near} | {t_nb:.1f} s |\n\n"
            f"Band 0 reuses the single-band planes, so drops are monotone in "
            f"bands; over-cap rows fan out ×bands in the pair join (within-cap "
            f"cells pay nothing), buying near-exact recall at a bounded "
            f"multiple of the capped pair mass — miss probability per pair is "
            f"(1 − p^bits)^bands for per-bit collision p = 1 − θ/π.\n"
        )
    spark.stop()


if __name__ == "__main__":
    main()
