"""Round-3 curation operators: decontamination, repetition stats,
stratified quota sampling (beyond-reference training-data ops; registry
queries t5/t6/t7 carry the DuckDB oracles, these pin the operator
semantics on hand-computed cases)."""

from __future__ import annotations

from pyspark.sql import functions as F

from diffdataflowmlpipelines_spark.functions.dedup import (
    md5_hash60,
    ngram_contamination,
)
from diffdataflowmlpipelines_spark.functions.sampling import stratified_sample
from diffdataflowmlpipelines_spark.functions.text import (
    duplicate_ngram_stats,
    tokenize,
)


def test_duplicate_ngram_stats_hand_cases(spark):
    df = spark.createDataFrame(
        [
            (1, "a b a b a"),  # bigrams: ab ba ab ba -> 4 total, 2 distinct
            (2, "x y z"),  # xy yz -> no dups
            (3, "w"),  # too short: 0 grams
            (4, "r r r r"),  # rr rr rr -> 3 total, 1 distinct
        ],
        "doc_id int, text string",
    )
    stats = duplicate_ngram_stats(tokenize("text"), n=2)
    rows = {
        r["doc_id"]: (r["n_grams"], r["n_distinct"], r["dup_frac"])
        for r in df.select(
            "doc_id",
            stats["n_grams"].alias("n_grams"),
            stats["n_distinct"].alias("n_distinct"),
            stats["dup_frac"].alias("dup_frac"),
        ).collect()
    }
    assert rows[1] == (4, 2, 0.5)
    assert rows[2] == (2, 2, 0.0)
    assert rows[3] == (0, 0, 0.0)
    assert rows[4] == (3, 1, round(2 / 3, 6))


def test_ngram_contamination_counts(spark):
    corpus = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),  # shares "sat on the" etc.
            (2, "totally novel words here now"),
            (3, "on the mat"),  # exactly one 3-gram, contaminated
            (4, "xx yy"),  # too short for 3-grams: excluded
        ],
        "doc_id int, text string",
    ).withColumn("toks", tokenize("text"))
    bench = spark.createDataFrame(
        [(100, "he sat on the mat quietly")], "doc_id int, text string"
    ).withColumn("toks", tokenize("text"))

    got = {
        r["doc_id"]: (r["n_ngrams"], r["n_contaminated"], r["contamination_frac"])
        for r in ngram_contamination(corpus, bench, "doc_id", "toks", n=3).collect()
    }
    # doc 1 grams: "the cat sat","cat sat on","sat on the","on the mat"
    # bench grams: "he sat on","sat on the","on the mat","the mat quietly"
    assert got[1] == (4, 2, 0.5)
    assert got[2] == (3, 0, 0.0)
    assert got[3] == (1, 1, 1.0)
    assert 4 not in got  # too short: no n-grams, excluded like the oracle


def test_stratified_sample_gate_and_quota(spark):
    rows = [(i, "big") for i in range(400)] + [(10_000 + i, "tiny") for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = stratified_sample(df, "source", "doc_id", target_per_stratum=20)
    got = out.groupBy("source").count().collect()
    by_src = {r["source"]: r["count"] for r in got}
    # strata at/under target keep EVERY row (threshold >= scale)
    assert by_src["tiny"] == 5
    # big stratum lands near the 20-row quota (hash gate, not exact)
    assert 5 <= by_src.get("big", 0) <= 45
    # gate is the documented portable hash: verify row membership exactly
    thr = (20 * 1_000_000) // 400
    kept = {r["doc_id"] for r in out.filter(F.col("source") == "big").collect()}
    want = {
        r["doc_id"]
        for r in df.filter(F.col("source") == "big")
        .withColumn("h", F.pmod(md5_hash60(F.col("doc_id").cast("string")), F.lit(1_000_000)))
        .filter(F.col("h") < thr)
        .collect()
    }
    assert kept == want
    # deterministic: a second run returns the identical sample
    again = {
        r["doc_id"]
        for r in stratified_sample(df, "source", "doc_id", target_per_stratum=20)
        .filter(F.col("source") == "big")
        .collect()
    }
    assert again == kept
