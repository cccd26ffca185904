"""Init + per-update latency bench — the reference's headline
measurement (``pipeline_3_diabetes.rs:33-54`` / BASELINE.md rows:
StandardScaler init 10.28s @ 1e6 rows, single-row update 1.45ms, 1e5-row
update 1.0s on their 6-core machine).

Drives IncrementalScalerPipeline epoch-by-epoch: one init epoch of
INIT_ROWS, then K single-row update epochs and one BULK_ROWS epoch,
timing each (rounding (-2, 0) as the reference's bench uses).

Usage: PYTHONPATH=. python tools/update_latency_bench.py
Env: INIT_ROWS (default 1_000_000), N_UPDATES (20), BULK_ROWS (100_000)
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

INIT_ROWS = int(os.environ.get("INIT_ROWS", "1000000"))
N_UPDATES = int(os.environ.get("N_UPDATES", "20"))
BULK_ROWS = int(os.environ.get("BULK_ROWS", "100000"))


def main() -> None:
    import numpy as np
    import pandas as pd

    from diffdataflowmlpipelines_spark.session import get_spark
    from diffdataflowmlpipelines_spark.streaming.incremental_transform import (
        IncrementalScalerPipeline,
    )

    spark = get_spark(app_name="update-latency")
    work = tempfile.mkdtemp(prefix="latbench_")
    pipe = IncrementalScalerPipeline(
        spark, work, ["row_id"], "x", round_to=(-2, 0)
    )
    rng = np.random.default_rng(42)

    def mkdf(start, n):
        pdf = pd.DataFrame(
            {
                "row_id": np.arange(start, start + n, dtype="int64"),
                "x": rng.normal(100.0, 25.0, size=n),
                "diff": np.ones(n, dtype="int64"),
            }
        )
        return spark.createDataFrame(pdf, "row_id long, x double, diff long")

    try:
        init_df = mkdf(0, INIT_ROWS)
        t0 = time.time()
        pipe.process_epoch(init_df, 0)
        init_sec = time.time() - t0

        update_ms = []
        for k in range(N_UPDATES):
            df = mkdf(INIT_ROWS + k, 1)
            t0 = time.time()
            pipe.process_epoch(df, k + 1)
            update_ms.append((time.time() - t0) * 1000)

        bulk_df = mkdf(INIT_ROWS + N_UPDATES, BULK_ROWS)
        t0 = time.time()
        pipe.process_epoch(bulk_df, N_UPDATES + 1)
        bulk_sec = time.time() - t0

        out = {
            "init_rows": INIT_ROWS,
            "init_sec": round(init_sec, 2),
            "init_rows_per_s": round(INIT_ROWS / init_sec, 0),
            "single_row_update_ms_median": round(statistics.median(update_ms), 1),
            "single_row_update_ms_min": round(min(update_ms), 1),
            "bulk_rows": BULK_ROWS,
            "bulk_update_sec": round(bulk_sec, 2),
            "full_reencodes": pipe.full_reencodes,
            "epochs": pipe.epochs,
            "reference": {
                "init_1e6_sec": 10.28,
                "single_row_update_ms": 1.45,
                "bulk_1e5_update_sec": 1.0,
            },
        }
        print(json.dumps(out))
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
