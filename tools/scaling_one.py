"""Single-configuration scaling probe — run the streaming workloads at
local[CPUS] over PRE-GENERATED epoch files and print one JSON line.
Invoked by tools/scaling_bench.py (one JVM per parallelism level).

Metrics per workload:
- wall_sec: end-to-end including session/planning fixed costs
- sustained_rows_per_s: median of Spark's own per-batch
  processedRowsPerSecond, excluding the first (cold) batch — the honest
  "sustained throughput" number the target metric asks for, insulated
  from constant startup costs that a long-running cluster job amortizes.

State store: local[k] runs k state partitions in ONE process, so
RocksDB's per-partition maintenance scales with k and anti-scales
locally (on a real cluster partitions-per-executor is constant).
Provider is a CLI arg; scaling evidence reports both, headline = hdfs
(in-memory + snapshot), production config stays RocksDB for 100 TB
state sizes.

Usage: scaling_one.py <cpus> <tok_dir> <lab_dir> <provider>
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

CPUS = int(sys.argv[1])
TOK_DIR, LAB_DIR = sys.argv[2], sys.argv[3]
PROVIDER = sys.argv[4] if len(sys.argv) > 4 else "hdfs"


def sustained(progress: list[dict]) -> float:
    rates = [
        p["sources"][0]["processedRowsPerSecond"]
        for p in progress
        if p["numInputRows"] > 0
    ]
    rates = rates[1:] if len(rates) > 1 else rates  # drop cold batch
    return round(statistics.median(rates), 1)


def main() -> None:
    from pyspark.sql import functions as F

    from diffdataflowmlpipelines_spark.functions.dedup import md5_hash60, word_shingles
    from diffdataflowmlpipelines_spark.session import get_spark
    from diffdataflowmlpipelines_spark.sources.fixtures import (
        HOT_KEYS,
        LABELS_SCHEMA,
        TOKENS_STREAM_SCHEMA,
    )
    from diffdataflowmlpipelines_spark.streaming.join import (
        label_join,
        salted_label_join,
    )
    from diffdataflowmlpipelines_spark.streaming.windows import tumbling_token_frequency

    conf = {"spark.sql.files.maxPartitionBytes": "4m"}
    if PROVIDER == "hdfs":
        conf["spark.sql.streaming.stateStore.providerClass"] = (
            "org.apache.spark.sql.execution.streaming.state."
            "HDFSBackedStateStoreProvider"
        )
    spark = get_spark(
        app_name=f"scaling-{CPUS}",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
        extra_conf=conf,
    )
    noop = lambda df, eid: df.write.format("noop").mode("overwrite").save()  # noqa: E731
    work = tempfile.mkdtemp(prefix=f"scale_{CPUS}_")
    out: dict = {"cpus": CPUS, "provider": PROVIDER}
    try:
        stream = (
            spark.readStream.schema(TOKENS_STREAM_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(TOK_DIR)
        )
        t0 = time.time()
        q = (
            tumbling_token_frequency(stream, window="60 seconds")
            .writeStream.foreachBatch(noop)
            .outputMode("update")
            .option("checkpointLocation", f"{work}/ckpt_agg")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(1800)
        out["stream_agg_wall_sec"] = round(time.time() - t0, 2)
        out["stream_agg_rows_per_s"] = sustained(
            [json.loads(p.json) for p in q.recentProgress]
        )

        # compute-dense variant: windowed aggregation over md5-hashed
        # 3-gram shingles (the north star's "count-min / feature-hashing"
        # statistic) — per-row CPU dominates scan/shuffle, isolating
        # compute scaling from the memory-bandwidth ceiling a single box
        # imposes on scan-bound aggregation.
        stream2 = (
            spark.readStream.schema(TOKENS_STREAM_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(TOK_DIR)
        )
        sh = stream2.select(
            "event_time",
            F.explode(word_shingles(F.col("tokens").cast("array<string>"), 3)).alias("s"),
            F.col("diff"),
        ).select(
            "event_time",
            (md5_hash60(F.col("s")) % F.lit(1 << 20)).alias("bucket"),
            "diff",
        )
        agg2 = (
            sh.withWatermark("event_time", "30 seconds")
            .groupBy(F.window("event_time", "60 seconds").alias("w"), "bucket")
            .agg(F.sum("diff").alias("tf"))
        )
        t0 = time.time()
        q = (
            agg2.writeStream.foreachBatch(noop)
            .outputMode("update")
            .option("checkpointLocation", f"{work}/ckpt_shingle")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(1800)
        out["stream_shingle_agg_wall_sec"] = round(time.time() - t0, 2)
        out["stream_shingle_agg_rows_per_s"] = sustained(
            [json.loads(p.json) for p in q.recentProgress]
        )

        def run_join(join_fn, tag):
            tok_s = (
                spark.readStream.schema(TOKENS_STREAM_SCHEMA)
                .option("maxFilesPerTrigger", 1)
                .parquet(TOK_DIR)
            )
            lab_s = (
                spark.readStream.schema(LABELS_SCHEMA)
                .option("maxFilesPerTrigger", 1)
                .parquet(LAB_DIR)
            )
            t0 = time.time()
            q = (
                join_fn(tok_s, lab_s)
                .writeStream.foreachBatch(noop)
                .outputMode("append")
                .option("checkpointLocation", f"{work}/ckpt_{tag}")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(1800)
            out[f"{tag}_wall_sec"] = round(time.time() - t0, 2)
            progress = [json.loads(p.json) for p in q.recentProgress]
            rates = [
                p["sources"][0]["processedRowsPerSecond"]
                for p in progress
                if p["numInputRows"] > 0
            ]
            rates = rates[1:] if len(rates) > 1 else rates
            out[f"{tag}_rows_per_s"] = round(statistics.median(rates), 1)

        run_join(label_join, "stream_join")
        run_join(
            lambda t, l: salted_label_join(t, l, HOT_KEYS, n_salts=8),
            "stream_join_salted",
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()

    print("SCALING_RESULT " + json.dumps(out))


if __name__ == "__main__":
    main()
