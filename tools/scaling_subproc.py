"""Shared subprocess harness for the scaling/skew benches: run
tools/scaling_one.py in a fresh JVM and parse its SCALING_RESULT line.

One copy of the run/parse/raise logic — scaling_bench, scaling_round
and skew_bench previously each carried a near-identical ~20-line block
(review r4d: drift had already crept into the env handling; a timeout
bump would predictably miss one copy).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def run_scaling_one(
    cpus: int,
    tok_dir: str,
    lab_dir: str,
    provider: str,
    env_extra: dict[str, str] | None = None,
    timeout: int = 3000,
) -> dict:
    """One fresh-JVM scaling_one.py run -> parsed result dict.

    ``env_extra`` adds/overrides env vars (SCALE_WORKLOADS,
    SCALE_HOT_KEYS, ...); PYTHONPATH is always pinned to the repo root.
    Raises with the tail of stdout/stderr when no SCALING_RESULT line
    appears (crash, timeout kill, import error).
    """
    env = dict(os.environ, PYTHONPATH=REPO, **(env_extra or {}))
    p = subprocess.run(
        [
            sys.executable,
            os.path.join(HERE, "scaling_one.py"),
            str(cpus),
            tok_dir,
            lab_dir,
            provider,
        ],
        capture_output=True,
        text=True,
        timeout=timeout,
        env=env,
        cwd=REPO,
    )
    for line in p.stdout.splitlines():
        if line.startswith("SCALING_RESULT "):
            return json.loads(line[len("SCALING_RESULT "):])
    raise RuntimeError(
        f"no result cpus={cpus}:\n{p.stdout[-1500:]}\n{p.stderr[-1500:]}"
    )
