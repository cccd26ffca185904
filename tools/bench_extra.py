"""Per-query profiling harness for the optimization rounds (guide §1).

bench.py is FROZEN for measurement, so the noop-sink isolation, repeat
timing, construction-vs-execution split and plan capture live here:

    PYTHONPATH=. python tools/bench_extra.py --tag before [names...]

For every selected registry query it records
  * construction seconds (plan build incl. any fit-statistic collects),
  * ``reps`` noop-sink executions (guide §1.4) with per-rep seconds,
  * the ``.explain("formatted")`` plan into plans/r06/<name>_<tag>.txt
and prints one JSON line with the table. Uses the same session config
as bench.py (local[$SPARK_GRAFT_CPUS], shuffle partitions = cores,
16m maxPartitionBytes so single-file scans parallelize).
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

DEFAULT_QUERIES = [
    "c3_standard_scaler",
    "c9_tfidf",
    "c16_multi_column_pipeline",
    "p5_join_agg",
    "w1_tumbling_window",
    "w3_session_window",
    "j1_interval_join",
    "d2_minhash_signatures",
    "d4_simhash",
    "d8_duplicated_spans",
    "d9_bloom_decontamination",
    "d10_semantic_dedup",
    "t14_oov_stats",
    "cm4_hll_distinct",
    "cm5_bottomk_quantiles",
    "t13_bigram_lm_score",
    "t15_curation_v2",
    "s1_cosine_topk",
    "cep1_event_funnel",
    "t11_corpus_pipeline",
    "v3_bpe_encode",
    "t19_source_drift_kl",
    "t20_tokenizer_pipeline",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*", default=None)
    ap.add_argument("--tag", default=None, help="plans/r06/<name>_<tag>.txt")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", default=None, help="also write JSON here")
    args = ap.parse_args()

    from diffdataflowmlpipelines_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark(
        app_name="bench_extra",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
        extra_conf={"spark.sql.files.maxPartitionBytes": "16m"},
    )
    queries = entrymod.queries()
    names = args.names or DEFAULT_QUERIES
    plan_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r06")
    if args.tag:
        os.makedirs(plan_dir, exist_ok=True)

    results: dict[str, dict] = {}
    for name in names:
        sc = spark.sparkContext
        sc.setJobDescription(f"{name}: construct")
        t0 = time.time()
        df = queries[name](spark, SF_DIR)
        construct = time.time() - t0
        if args.tag:
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(plan_dir, f"{name}_{args.tag}.txt"), "w") as f:
                f.write(buf.getvalue())
        reps = []
        for r in range(args.reps):
            sc.setJobDescription(f"{name}: noop rep {r}")
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            reps.append(round(time.time() - t0, 3))
        sc.setJobDescription(None)
        results[name] = {
            "construct": round(construct, 3),
            "reps": reps,
            "min": min(reps),
            "median": sorted(reps)[len(reps) // 2],
        }
        print(f"# {name}: construct={construct:.3f} reps={reps}",
              file=sys.stderr)

    line = json.dumps({"sf_dir": SF_DIR, "cpus": CPUS, "queries": results})
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
