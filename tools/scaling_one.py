"""Single-configuration scaling probe: run the scaling workload at
local[CPUS] and print one JSON line. Invoked by tools/scaling_bench.py
in separate processes (one JVM per parallelism level).

Workloads (identical input across parallelism levels):
- stream_agg: windowed token-frequency aggregation over an epoch-file
  stream of SCALE_ROWS pre-tokenized sequences (the north-rule metric)
- stream_join: stateful stream-stream join on (doc_id, source)
- batch: tf-idf + interval-join at sf0.1 (shuffle-heavy batch anchors)

Usage: python tools/scaling_one.py <cpus> [rows]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = int(sys.argv[1])
ROWS = int(sys.argv[2]) if len(sys.argv) > 2 else 1_500_000
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_EPOCHS = 4


def main() -> None:
    from diffdataflowmlpipelines_spark.session import get_spark
    from diffdataflowmlpipelines_spark.sources.fixtures import (
        LABELS_SCHEMA,
        TOKENS_STREAM_SCHEMA,
        gen_labels_pdf,
        gen_tokens_pdf,
    )
    from diffdataflowmlpipelines_spark.streaming.join import label_join
    from diffdataflowmlpipelines_spark.streaming.sources import write_epoch_files
    from diffdataflowmlpipelines_spark.streaming.windows import tumbling_token_frequency

    spark = get_spark(
        app_name=f"scaling-{CPUS}",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
        # one parquet file per epoch: split scans into small byte ranges so
        # the source stage parallelizes at every level (a 1000-executor
        # cluster reads Iceberg manifests with many files; locally we must
        # split within the file)
        extra_conf={"spark.sql.files.maxPartitionBytes": "4m"},
    )
    noop = lambda df, eid: df.write.format("noop").mode("overwrite").save()  # noqa: E731

    work = tempfile.mkdtemp(prefix=f"scale_{CPUS}_")
    out: dict = {"cpus": CPUS, "rows": ROWS}
    try:
        pdf = gen_tokens_pdf(ROWS, seed=42, rows_per_second=5000.0)
        write_epoch_files(pdf, f"{work}/tok", N_EPOCHS)
        lab = gen_labels_pdf(pdf, seed=43)
        write_epoch_files(lab, f"{work}/lab", N_EPOCHS)

        stream = (
            spark.readStream.schema(TOKENS_STREAM_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{work}/tok")
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
        q.awaitTermination(900)
        out["stream_agg_sec"] = round(time.time() - t0, 2)

        tok_s = (
            spark.readStream.schema(TOKENS_STREAM_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{work}/tok")
        )
        lab_s = (
            spark.readStream.schema(LABELS_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{work}/lab")
        )
        t0 = time.time()
        q = (
            label_join(tok_s, lab_s)
            .writeStream.foreachBatch(noop)
            .outputMode("append")
            .option("checkpointLocation", f"{work}/ckpt_join")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(900)
        out["stream_join_sec"] = round(time.time() - t0, 2)

        import __spark_entry__ as em

        queries = em.queries()
        for name in ["c9_tfidf", "j1_interval_join"]:
            df = queries[name](spark, SF_DIR)
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            out[f"{name}_sec"] = round(time.time() - t0, 2)
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()

    print("SCALING_RESULT " + json.dumps(out))


if __name__ == "__main__":
    main()
