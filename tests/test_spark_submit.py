"""North-rule launch evidence: the engine really runs via
``spark-submit --py-files dist/diffdataflowmlpipelines_spark.zip`` with
the package importable ONLY from the zip (clean cwd, no PYTHONPATH) —
not just that the zip file exists."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not on this machine"
)
def test_spark_submit_pyfiles_launch(tmp_path):
    # build the zip
    zip_out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "make_pyfiles.py")],
        capture_output=True,
        text=True,
        check=True,
        cwd=REPO,
    ).stdout.strip()
    assert zip_out.endswith(".zip") and os.path.exists(zip_out)

    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("PYTHONPATH", "SPARK_GRAFT_CPUS")
    }
    work = tmp_path / "job"
    work.mkdir()
    p = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master",
            "local[2]",
            "--conf",
            "spark.ui.enabled=false",
            "--conf",
            "spark.driver.memory=4g",
            "--py-files",
            zip_out,
            os.path.join(REPO, "tools", "submit_job.py"),
            str(work),
        ],
        capture_output=True,
        text=True,
        timeout=600,
        env=env,
        cwd=str(tmp_path),  # NOT the repo: the package must come from the zip
    )
    result = None
    for line in p.stdout.splitlines():
        if line.startswith("SUBMIT_RESULT "):
            result = json.loads(line[len("SUBMIT_RESULT "):])
    assert result is not None, f"no result line:\n{p.stdout[-2000:]}\n{p.stderr[-2000:]}"
    assert result["from_zip"], result["pkg_file"]
    assert result["rows_streaming"] == result["rows_batch"] > 0
    assert result["mismatches"] == 0
    assert result["epochs_committed"]  # exactly-once sink committed epochs
