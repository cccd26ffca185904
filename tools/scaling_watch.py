"""Watch for a co-tenancy window and run the scaling harness inside it.

Loops: wait for load1 < 1.5, run a quick spin probe at the requested
core pair; when the probe clears SPIN_GATE (default 0.8), immediately
run tools/scaling_round.py once and append its JSON to WATCH_OUT. Exits
after the first gated success or after WATCH_HOURS.

Rationale (SCALING.md round-3b addendum): steal jiffies and loadavg
both read quiet while hypervisor co-tenancy cuts per-core throughput —
the spin calibration is the only reliable go signal, and windows are
minutes long, so the probe->run gap must be seconds.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

from tools.scaling_round import spin_rate  # noqa: E402

GATE = float(os.environ.get("SPIN_GATE", "0.8"))
HOURS = float(os.environ.get("WATCH_HOURS", "3"))
LOW = int(os.environ.get("SCALE_LOW", "8"))
HIGH = int(os.environ.get("SCALE_HIGH", "32"))
OUT = os.environ.get("WATCH_OUT", "/tmp/scaling_watch.jsonl")


def main() -> int:
    deadline = time.time() + HOURS * 3600
    attempt = 0
    while time.time() < deadline:
        with open("/proc/loadavg") as f:
            load1 = float(f.read().split()[0])
        if load1 >= 1.5:
            time.sleep(30)
            continue
        lo = spin_rate(LOW, iters=20_000_000)
        hi = spin_rate(HIGH, iters=20_000_000)
        eff = hi / ((HIGH / LOW) * lo)  # ideal = HIGH/LOW x the low rate
        attempt += 1
        line = {"t": time.strftime("%H:%M:%S"), "probe_eff": round(eff, 3),
                "load1": load1}
        if eff < GATE:
            with open(OUT, "a") as f:
                f.write(json.dumps(line) + "\n")
            time.sleep(60)
            continue
        env = dict(os.environ, SCALE_LOW=str(LOW), SCALE_HIGH=str(HIGH))
        try:
            r = subprocess.run(
                [sys.executable, os.path.join(HERE, "scaling_round.py")],
                capture_output=True, text=True, timeout=1800, env=env,
            )
            tail = r.stdout.strip().splitlines()[-1] if r.stdout.strip() else "{}"
            line["run"] = json.loads(tail)
        except (subprocess.TimeoutExpired, json.JSONDecodeError, OSError) as e:
            # a single bad harness run must not kill a multi-hour watch
            line["run_error"] = repr(e)[:200]
            line["run"] = {}
        with open(OUT, "a") as f:
            f.write(json.dumps(line) + "\n")
        if line["run"].get("spin_efficiency", 0) >= GATE:
            print(json.dumps(line))
            return 0
        time.sleep(60)
    print(json.dumps({"timeout": True, "attempts": attempt}))
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
