"""Scaling-efficiency evidence (BASELINE.md protocol): the same job on
the same input at two parallelism levels — local[8] vs local[32] stands
in for N vs 4N executors (no real cluster in this sandbox). Each level
runs in its own process/JVM with shuffle partitions matched to cores.

efficiency(workload) = (t_low / t_high) / (cpus_high / cpus_low)
                     = throughput ratio / resource ratio.

Writes SCALING.md and prints a JSON summary.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
LOW, HIGH = int(os.environ.get("SCALE_LOW", "8")), int(os.environ.get("SCALE_HIGH", "32"))
ROWS = os.environ.get("SCALE_ROWS", "400000")


def run(cpus: int) -> dict:
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    p = subprocess.run(
        [sys.executable, os.path.join(HERE, "scaling_one.py"), str(cpus), ROWS],
        capture_output=True,
        text=True,
        timeout=2400,
        env=env,
        cwd=REPO,
    )
    for line in p.stdout.splitlines():
        if line.startswith("SCALING_RESULT "):
            return json.loads(line[len("SCALING_RESULT "):])
    raise RuntimeError(f"no result from cpus={cpus}:\n{p.stdout[-2000:]}\n{p.stderr[-2000:]}")


def main() -> None:
    lo = run(LOW)
    hi = run(HIGH)
    ratio = HIGH / LOW
    workloads = [k for k in lo if k.endswith("_sec")]
    summary = {"low_cpus": LOW, "high_cpus": HIGH, "rows": int(ROWS), "workloads": {}}
    lines = [
        "# SCALING — two-parallelism evidence (sandbox substitute for N vs 4N executors)",
        "",
        f"Same job, same input ({ROWS} token sequences; sf0.1 batch tables), one JVM per",
        f"level, `spark.sql.shuffle.partitions` = cores. efficiency = (t_{LOW}/t_{HIGH})/{ratio:.0f}.",
        "",
        f"| workload | local[{LOW}] sec | local[{HIGH}] sec | speedup | efficiency |",
        "|---|---|---|---|---|",
    ]
    for w in workloads:
        sp = lo[w] / hi[w]
        eff = sp / ratio
        summary["workloads"][w[:-4]] = {
            f"sec_{LOW}": lo[w],
            f"sec_{HIGH}": hi[w],
            "speedup": round(sp, 2),
            "efficiency": round(eff, 3),
        }
        lines.append(f"| {w[:-4]} | {lo[w]} | {hi[w]} | {sp:.2f}x | {eff:.3f} |")
    with open(os.path.join(REPO, "SCALING.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
