"""Pin the pure-python XXH64 twin to Spark's F.xxhash64 (the tripwire
for DriverVocabularyPipeline.process_epoch_local's shard routing), and
the vocabulary pipeline's local entry point to its Spark-df path."""

from __future__ import annotations

import random
import string as string_mod
from datetime import datetime, timedelta

import pandas as pd
from pyspark.sql import functions as F

from diffdataflowmlpipelines_spark.functions.xxhash import (
    spark_shard,
    spark_xxhash64_string,
)


def test_xxhash64_matches_spark_on_adversarial_strings(spark):
    rnd = random.Random(7)
    vals = (
        ["", "a", "ab", "abc", "abcd", "abcdefg", "abcdefgh"]
        + ["x" * n for n in (15, 16, 17, 31, 32, 33, 63, 64, 100)]
        + [
            "".join(rnd.choices(string_mod.printable, k=rnd.randrange(0, 120)))
            for _ in range(300)
        ]
        + ["é中文\U0001f600" * k for k in (1, 3, 9)]
    )
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    got = [r["h"] for r in df.select(F.xxhash64("s").alias("h")).collect()]
    assert got == [spark_xxhash64_string(v) for v in vals]
    # and the pmod shard routing
    got_sh = [
        r["sh"]
        for r in df.select(
            F.pmod(F.xxhash64("s"), F.lit(16)).cast("int").alias("sh")
        ).collect()
    ]
    assert got_sh == [spark_shard(v, 16) for v in vals]


def test_vocabulary_local_entry_matches_spark_path(spark, tmp_path):
    from diffdataflowmlpipelines_spark.streaming.vocabulary import (
        DriverVocabularyPipeline,
    )

    t0 = datetime(2024, 1, 1)
    rnd = random.Random(3)
    epochs = []
    for e in range(4):
        toks = [f"tok{rnd.randrange(40)}" for _ in range(25)]
        diffs = [1] * 20 + [rnd.choice([1, -1]) for _ in range(5)]
        epochs.append(
            pd.DataFrame(
                {
                    "token": toks,
                    "diff": diffs,
                    "event_time": [
                        t0 + timedelta(seconds=e * 100 + j) for j in range(25)
                    ],
                }
            )
        )
    schema = "token string, diff long, event_time timestamp"
    pa = DriverVocabularyPipeline(spark, str(tmp_path / "a"), n_shards=4)
    pb = DriverVocabularyPipeline(spark, str(tmp_path / "b"), n_shards=4)
    for i, e in enumerate(epochs):
        pa.process_epoch(spark.createDataFrame(e, schema), i)
        pb.process_epoch_local(e, i)
    va = {
        (r["shard"], r["token"]): (r["idx"], r["count"], r["vec_len"])
        for r in pa.current_vocabulary().collect()
    }
    vb = {
        (r["shard"], r["token"]): (r["idx"], r["count"], r["vec_len"])
        for r in pb.current_vocabulary().collect()
    }
    assert va == vb and len(va) > 0
    # replay: a committed epoch re-sent locally must not double-apply
    before = {s: d.val_to_count.copy() for s, d in pb.shards.items()}
    pb.process_epoch_local(epochs[2], 2)
    assert {s: d.val_to_count for s, d in pb.shards.items()} == before
