"""Planted-skew streaming-join bench (VERDICT r2 item 5): measure the
salted hot-key join on the input shape it exists for — a SINGLE doc_id
carrying >=10% of all token traffic (north rule: "handles skewed doc_id
hot keys via salted repartitioning").

Hash partitioning pins every hot-key row to one stream-stream-join task:
at hot_frac=0.25 and 32 shuffle partitions that task ingests ~25% of
all state writes while the average task gets ~2.3% — a ~10x straggler.
``salted_label_join`` spreads the hot key over n_salts tasks. Earlier
rounds measured the NEGATIVE result at 1% hot traffic spread over 8
keys (salting overhead, no win — kept in SCALING.md); this harness
plants the shape where salting must win.

Protocol: Spark-native skewed input generated once (token side skewed,
label side cold-only, so the win is shuffle/state skew, not output-size
artifacts), then stream_join vs stream_join_salted each in a FRESH
subprocess JVM (tools/scaling_one.py) at local[CPUS], interleaved
A/B/A/B over SKEW_REPS rounds with the median reported — the sandbox
host has bursty co-tenant CPU steal, and interleaving keeps a steal
burst from landing entirely on one variant.

Env: SKEW_ROWS (default 2_000_000), SKEW_HOT_FRAC (0.25), SKEW_CPUS
(32), SKEW_SALTS (8), SKEW_REPS (3), SKEW_PROVIDER (hdfs).
Prints one JSON line and appends a section to SCALING.md.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

ROWS = int(os.environ.get("SKEW_ROWS", "2000000"))
EPOCHS = int(os.environ.get("SKEW_EPOCHS", "3"))
HOT_FRAC = float(os.environ.get("SKEW_HOT_FRAC", "0.25"))
CPUS = int(os.environ.get("SKEW_CPUS", "32"))
SALTS = int(os.environ.get("SKEW_SALTS", "8"))
REPS = int(os.environ.get("SKEW_REPS", "3"))
PROVIDER = os.environ.get("SKEW_PROVIDER", "hdfs")
HOT_KEY = "doc-hot-0"


def run_one(workload: str, tok: str, lab: str) -> dict:
    if HERE not in sys.path:  # robust under python -m / pytest collection
        sys.path.insert(0, HERE)
    from scaling_subproc import run_scaling_one

    return run_scaling_one(
        CPUS,
        tok,
        lab,
        PROVIDER,
        env_extra={
            "SCALE_WORKLOADS": workload,
            "SCALE_HOT_KEYS": HOT_KEY,
            "SCALE_SALTS": str(SALTS),
        },
    )


def main() -> None:
    from bench import host_delta, host_snapshot, prepare_scaling_inputs

    from diffdataflowmlpipelines_spark.session import get_spark

    base = tempfile.mkdtemp(prefix="skew_input_")
    tok, lab = f"{base}/tok", f"{base}/lab"
    gen = get_spark(app_name="skew-gen", master="local[8]", shuffle_partitions=8)
    try:
        prepare_scaling_inputs(
            gen, tok, lab, ROWS, epochs=EPOCHS, hot_frac=HOT_FRAC, hot_key=HOT_KEY
        )
        gen.stop()

        host0 = host_snapshot()
        runs: dict[str, list[dict]] = {"stream_join": [], "stream_join_salted": []}
        for _ in range(REPS):  # interleaved A/B per round
            for w in ("stream_join", "stream_join_salted"):
                runs[w].append(run_one(w, tok, lab))
        host = host_delta(host0, host_snapshot())

        def med(w: str, field: str) -> float:
            return round(statistics.median(r[f"{w}_{field}"] for r in runs[w]), 2)

        un_wall, sa_wall = med("stream_join", "wall_sec"), med(
            "stream_join_salted", "wall_sec"
        )
        un_rate, sa_rate = med("stream_join", "rows_per_s"), med(
            "stream_join_salted", "rows_per_s"
        )
        out = {
            "rows": ROWS,
            "epochs": EPOCHS,
            "hot_frac": HOT_FRAC,
            "hot_keys": 1,
            "cpus": CPUS,
            "n_salts": SALTS,
            "reps": REPS,
            "provider": PROVIDER,
            "unsalted_wall_sec": un_wall,
            "salted_wall_sec": sa_wall,
            "unsalted_sustained_rows_per_s": un_rate,
            "salted_sustained_rows_per_s": sa_rate,
            "salted_speedup_wall": round(un_wall / sa_wall, 2),
            "salted_speedup_rate": round(sa_rate / un_rate, 2),
            "unsalted_rep_walls": [r["stream_join_wall_sec"] for r in runs["stream_join"]],
            "salted_rep_walls": [
                r["stream_join_salted_wall_sec"] for r in runs["stream_join_salted"]
            ],
            "host": host,
        }
        print(json.dumps(out))

        with open(os.path.join(REPO, "SCALING.md"), "a") as f:
            f.write(
                "\n## Planted-skew salted-join bench (tools/skew_bench.py)\n\n"
                f"{ROWS:,} rows, ONE hot doc_id carrying {HOT_FRAC:.0%} of token\n"
                f"traffic (labels cold-only), local[{CPUS}], {PROVIDER} provider,\n"
                f"median of {REPS} interleaved fresh-JVM runs per variant.\n\n"
                "| variant | wall (s) | sustained rows/s |\n|---|---|---|\n"
                f"| unsalted label_join | {un_wall} | {un_rate:,.0f} |\n"
                f"| salted_label_join (n_salts={SALTS}) | {sa_wall} | {sa_rate:,.0f} |\n\n"
                f"**Salted speedup: {out['salted_speedup_wall']}x wall, "
                f"{out['salted_speedup_rate']}x sustained rate.** "
                f"(host steal during runs: {host['steal_pct_of_capacity']}% "
                f"of capacity; rep walls unsalted={out['unsalted_rep_walls']}, "
                f"salted={out['salted_rep_walls']})\n"
            )
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
