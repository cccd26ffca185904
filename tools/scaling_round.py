"""Per-round two-parallelism scaling evidence (north rule: throughput
scaling efficiency >=0.8 from N to 4N executors; sandbox substitute =
local[8] vs local[32], one FRESH JVM per level over the same
pre-generated input).

Bundles three measurements into one JSON line:
- streaming workloads (SCALE_WORKLOADS, default stream_agg,stream_join)
  at both levels via tools/scaling_one.py;
- a pure-CPU spin calibration at 8 vs 32 processes — the compute-only
  ceiling this box can show at measurement time (the streaming path
  additionally hits the single box's shared memory bandwidth, which a
  real per-executor-bus cluster does not — see SCALING.md analysis);
- host steal/load before and after (bench.host_snapshot).

Env: SCALE_ROWS (default 4_000_000), SCALE_LOW/HIGH (8/32),
SCALE_PROVIDER (hdfs), SCALE_WORKLOADS. Appends nothing; the caller
copies numbers into SCALING.md / BASELINE.md.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import shutil
import sys
import tempfile
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

ROWS = int(os.environ.get("SCALE_ROWS", "4000000"))
LOW = int(os.environ.get("SCALE_LOW", "8"))
HIGH = int(os.environ.get("SCALE_HIGH", "32"))
PROVIDER = os.environ.get("SCALE_PROVIDER", "hdfs")
WORKLOADS = os.environ.get("SCALE_WORKLOADS", "stream_agg,stream_join")


def _spin(n_iters: int, out) -> None:
    x = 1.0
    t0 = time.time()
    for i in range(n_iters):
        x = x * 1.0000001 + 1e-9
    out.put((n_iters, time.time() - t0, x))


def spin_rate(procs: int, iters: int = 40_000_000) -> float:
    """Aggregate iterations/sec across ``procs`` concurrent processes."""
    q: mp.Queue = mp.Queue()
    ps = [mp.Process(target=_spin, args=(iters, q)) for _ in range(procs)]
    for p in ps:
        p.start()
    results = [q.get() for _ in ps]
    for p in ps:
        p.join()
    return sum(n / dt for n, dt, _ in results)


def run_level(cpus: int, tok: str, lab: str) -> dict:
    if HERE not in sys.path:  # robust under python -m / pytest collection
        sys.path.insert(0, HERE)
    from scaling_subproc import run_scaling_one

    return run_scaling_one(
        cpus, tok, lab, PROVIDER, env_extra={"SCALE_WORKLOADS": WORKLOADS}
    )


def main() -> None:
    from bench import host_delta, host_snapshot, prepare_scaling_inputs

    from diffdataflowmlpipelines_spark.session import get_spark

    base = tempfile.mkdtemp(prefix="scale_r_")
    tok, lab = f"{base}/tok", f"{base}/lab"
    gen = get_spark(app_name="scale-gen", master="local[8]", shuffle_partitions=8)
    try:
        prepare_scaling_inputs(gen, tok, lab, ROWS, epochs=3)
        gen.stop()

        host0 = host_snapshot()
        spin_lo = spin_rate(LOW)
        spin_hi = spin_rate(HIGH)
        lo = run_level(LOW, tok, lab)
        hi = run_level(HIGH, tok, lab)
        host = host_delta(host0, host_snapshot())

        ratio = HIGH / LOW
        out: dict = {
            "rows": ROWS,
            "cores_low": LOW,
            "cores_high": HIGH,
            "provider": PROVIDER,
            "spin_iters_per_s_low": round(spin_lo / 1e6, 1),
            "spin_iters_per_s_high": round(spin_hi / 1e6, 1),
            "spin_efficiency": round(spin_hi / (spin_lo * ratio), 3),
            "host": host,
            "workloads": {},
        }
        for w in WORKLOADS.split(","):
            r_lo, r_hi = lo[f"{w}_rows_per_s"], hi[f"{w}_rows_per_s"]
            out["workloads"][w] = {
                "rate_low": r_lo,
                "rate_high": r_hi,
                "wall_low": lo[f"{w}_wall_sec"],
                "wall_high": hi[f"{w}_wall_sec"],
                "efficiency": round(r_hi / (r_lo * ratio), 3) if r_lo else None,
            }
        print(json.dumps(out))
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
