"""Keyless range-join A/B (j4 evidence): the interval-bucket equi join
vs the naive theta join Spark would otherwise plan (BroadcastNestedLoop
over |purchases| x |clicks| pairs).

Both variants compute the identical aggregate (count of qualifying
pairs in the 30-minute window, cross-user) on the SAME events table at
two scales, interleaved A/B/A/B with the median reported — the naive
plan's cost grows with the PRODUCT of the side sizes (~100x from
sf0.01 to sf0.1), the bucketed plan's with rows + qualifying pairs
(~10x), so the two-scale growth RATIO is the scale argument, not just
one wall-clock win.

Env: RJB_REPS (default 3), RJB_CPUS (32). Prints one JSON line and
appends a section to SCALING.md. Run alone (repo rule: nothing else
concurrent with a perf measurement).
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

REPS = int(os.environ.get("RJB_REPS", "3"))
CPUS = int(os.environ.get("RJB_CPUS", "32"))


def main() -> None:
    from pyspark.sql import functions as F

    from diffdataflowmlpipelines_spark.operators.rangejoin import (
        bucketed_range_join,
    )
    from diffdataflowmlpipelines_spark.session import get_spark

    spark = get_spark(app_name="rangejoin_bench", master=f"local[{CPUS}]")
    results: dict[str, dict[str, float]] = {}
    counts: dict[str, int] = {}
    for sf in ("sf0.01", "sf0.1"):
        ev = spark.read.parquet(f"/root/testdata/{sf}/events.parquet")
        p = ev.filter(F.col("event_type") == "purchase").select(
            F.col("event_id").alias("pid"), F.col("ts").alias("p_ts")
        )
        c = ev.filter(F.col("event_type") == "click").select(
            F.col("event_id").alias("cid"), F.col("ts").alias("c_ts")
        )

        def bucketed():
            return bucketed_range_join(
                p, c, "p_ts", "c_ts", lower=-1800, upper=0
            ).count()

        def naive():
            # the plan Spark picks for a keyless theta join: broadcast
            # nested loop over the full cross product
            return (
                p.join(
                    c,
                    F.col("c_ts").between(
                        F.col("p_ts") - F.expr("INTERVAL 30 MINUTES"),
                        F.col("p_ts"),
                    ),
                )
            ).count()

        n_b = bucketed()  # warm both paths + pin the answer
        n_n = naive()
        assert n_b == n_n, f"variant disagreement at {sf}: {n_b} != {n_n}"
        counts[sf] = n_b
        walls: dict[str, list[float]] = {"bucketed": [], "naive": []}
        for _ in range(REPS):  # interleaved: steal bursts hit both
            for name, fn in (("bucketed", bucketed), ("naive", naive)):
                t0 = time.monotonic()
                fn()
                walls[name].append(time.monotonic() - t0)
        results[sf] = {k: statistics.median(v) for k, v in walls.items()}

    growth = {
        k: results["sf0.1"][k] / results["sf0.01"][k]
        for k in ("bucketed", "naive")
    }
    out = {
        "bench": "rangejoin_ab",
        "reps": REPS,
        "cpus": CPUS,
        "pairs": counts,
        "median_s": results,
        "growth_10x_input": growth,
    }
    print(json.dumps(out))

    lines = [
        "",
        "## Keyless range join: interval bucketing vs nested loop (j4)",
        "",
        f"Same aggregate over the same events table, interleaved A/B, "
        f"median of {REPS} at local[{CPUS}]:",
        "",
        "| scale | qualifying pairs | bucketed (s) | nested loop (s) | speedup |",
        "|---|---|---|---|---|",
    ]
    for sf in ("sf0.01", "sf0.1"):
        b, n = results[sf]["bucketed"], results[sf]["naive"]
        lines.append(
            f"| {sf} | {counts[sf]:,} | {b:.2f} | {n:.2f} | {n / b:.1f}x |"
        )
    lines += [
        "",
        f"Growth under a 10x input: bucketed {growth['bucketed']:.1f}x, "
        f"nested loop {growth['naive']:.1f}x — the nested-loop cost tracks "
        "the |L|x|R| pair product (~100x per 10x input), the bucketed "
        "plan tracks rows + qualifying pairs. At 100 TB the nested loop "
        "is not slower, it is non-terminating; the bucketed join is one "
        "equi shuffle on a dense integer key (AQE-skew-splittable).",
    ]
    with open(os.path.join(REPO, "SCALING.md"), "a") as f:
        f.write("\n".join(lines) + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
