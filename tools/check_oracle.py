"""Local emulation of the driver's correctness gate: run every
``queries()`` entry and its ``oracle_sql()`` side-by-side (Spark vs
DuckDB) at sf0.01 and compare row count, column names, and values
(order-insensitive, arrays normalized, floats exact-after-rounding with
a 1e-9 fallback report).

Usage: PYTHONPATH=/root/repo python tools/check_oracle.py [name ...]
Env: ORACLE_SF_DIR overrides the scale (default /root/testdata/sf0.01).
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

import os
SF_DIR = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    if isinstance(v, (list, tuple, np.ndarray)):
        return tuple(norm_cell(x) for x in v)
    if isinstance(v, np.generic):
        v = v.item()
    if isinstance(v, float):
        # collapse -0.0 / 0.0, NaN -> None, quantize for stable comparison
        if v != v:
            return None
        if v == 0:
            return 0.0
        return round(v, 9)
    if isinstance(v, pd.Timestamp):
        return v.tz_localize(None) if v.tzinfo else v
    return v


def canon(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [tuple(norm_cell(v) for v in row) for row in df[cols].itertuples(index=False)]
    return sorted(rows, key=repr)


def main(only: list[str]) -> int:
    import __spark_entry__ as entrymod

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )

    from diffdataflowmlpipelines_spark.session import get_spark

    spark = get_spark(app_name="check_oracle", shuffle_partitions=16)

    failures = 0
    names = only or list(queries)
    unknown = [n for n in names if n not in queries]
    for n in unknown:
        # a typo'd CLI name must show as a FAIL row (and not abort the
        # remaining valid names with a bare KeyError)
        print(f"FAIL  {n}: unknown query name")
    failures += len(unknown)
    names = [n for n in names if n in queries]
    for name in names:
        fn = queries[name]
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            spdf = sdf.toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {str(e)[:400]}")
            failures += 1
            continue
        if name not in oracles:
            print(f"weak  {name}: rows={len(spdf)} (no oracle; rows-only check)")
            continue
        try:
            opdf = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {type(e).__name__}: {str(e)[:400]}")
            failures += 1
            continue
        dt = time.time() - t0

        issues = []
        if len(spdf) != len(opdf):
            issues.append(f"rowcount {len(spdf)} vs {len(opdf)}")
        if sorted(spdf.columns) != sorted(opdf.columns):
            issues.append(f"cols {sorted(spdf.columns)} vs {sorted(opdf.columns)}")
        if not issues:
            a, b = canon(spdf), canon(opdf)
            if a != b:
                n_bad = sum(1 for x, y in zip(a, b) if x != y)
                issues.append(f"values differ ({n_bad} rows); first: ")
                for x, y in zip(a, b):
                    if x != y:
                        issues.append(f"  spark={x!r}")
                        issues.append(f"  duck ={y!r}")
                        break
        if issues:
            print(f"FAIL  {name}: " + " | ".join(issues[:3]))
            failures += 1
        else:
            print(f"ok    {name}: rows={len(spdf)}  ({dt:.1f}s)")

    # smoke entry()
    if not only:
        res = entrymod.entry(spark)
        n = res.count()
        print(f"entry(): rows={n} schema={[f.name for f in res.schema.fields]}")

    spark.stop()
    print("FAILURES:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
