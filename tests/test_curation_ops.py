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


def test_redact_pii_hand_cases(spark):
    from diffdataflowmlpipelines_spark.functions.text import redact_pii

    df = spark.createDataFrame(
        [
            (1, "mail bob.smith+x@sub.example.org now"),
            (2, "server at 192.168.0.1 and 10.0.0.255 up"),
            (3, "call 555-123-4567 or 555 987 6543"),
            (4, "clean text, no pii at all"),
            (5, "a@b.io via 1.2.3.4 tel 111-222-3333"),
        ],
        "i int, s string",
    )
    r = redact_pii("s")
    got = {
        row["i"]: (row["n_email"], row["n_ipv4"], row["n_phone"], row["red"])
        for row in df.select(
            "i",
            r["n_email"].alias("n_email"),
            r["n_ipv4"].alias("n_ipv4"),
            r["n_phone"].alias("n_phone"),
            r["redacted"].alias("red"),
        ).collect()
    }
    assert got[1] == (1, 0, 0, "mail <EMAIL> now")
    assert got[2] == (0, 2, 0, "server at <IP> and <IP> up")
    assert got[3] == (0, 0, 2, "call <PHONE> or <PHONE>")
    assert got[4] == (0, 0, 0, "clean text, no pii at all")
    # ordering: the email is consumed before its dotted host could be
    # half-matched; the IP is consumed before the phone pass
    assert got[5] == (1, 1, 1, "<EMAIL> via <IP> tel <PHONE>")


def test_mixture_weights_closed_form(spark):
    from diffdataflowmlpipelines_spark.functions.sampling import mixture_weights

    # 9 a-rows, 1 b-row, alpha=0.5: pw = 3, 1 -> weights .75/.25
    df = spark.createDataFrame(
        [("a",)] * 9 + [("b",)], "source string"
    )
    got = {
        r["source"]: (r["n"], r["weight"], r["target_rows"])
        for r in mixture_weights(df, "source", alpha=0.5, budget_rows=1000).collect()
    }
    assert got == {"a": (9, 0.75, 750), "b": (1, 0.25, 250)}
    # alpha=1 degenerates to proportional sampling
    got1 = {
        r["source"]: r["weight"]
        for r in mixture_weights(df, "source", alpha=1.0, budget_rows=1000).collect()
    }
    assert got1 == {"a": 0.9, "b": 0.1}


# --- d8: substring-level (suffix-style) span dedup -------------------------


def test_duplicated_spans_planted_passages(spark):
    from diffdataflowmlpipelines_spark.functions.dedup import duplicated_spans

    passage = [f"p{i}" for i in range(7)]
    d1 = [f"a{i}" for i in range(4)] + passage + [f"b{i}" for i in range(3)]
    d2 = [f"c{i}" for i in range(2)] + passage + [f"e{i}" for i in range(5)]
    # internal repeat only: the 5-gram recurs but within ONE doc — the
    # cross-document criterion (min_docs=2 distinct docs) must not flag
    d3 = "r0 r1 r2 r3 r4 x r0 r1 r2 r3 r4".split()
    d4 = [f"u{i}" for i in range(10)]
    df = spark.createDataFrame(
        [(1, d1), (2, d2), (3, d3), (4, d4)], "doc_id int, toks array<string>"
    )
    out = duplicated_spans(df, "doc_id", "toks", window=5, min_docs=2)
    rows = {
        r["doc_id"]: (r["span_start"], r["span_end"], r["span_len"])
        for r in out.collect()
    }
    # only windows fully inside the shared passage flag; islands merge
    # them into the maximal run covering the passage at each offset
    assert rows == {1: (4, 10, 7), 2: (2, 8, 7)}


def test_duplicated_spans_removal_drives_fraction_to_zero(spark):
    from diffdataflowmlpipelines_spark.functions.dedup import duplicated_spans

    passage = [f"p{i}" for i in range(6)]
    docs = {
        i: [f"x{i}_{j}" for j in range(3)] + passage + [f"y{i}_{j}" for j in range(4)]
        for i in range(1, 4)
    }
    df = spark.createDataFrame(
        list(docs.items()), "doc_id int, toks array<string>"
    )
    spans = {
        r["doc_id"]: (int(r["span_start"]), int(r["span_end"]))
        for r in duplicated_spans(df, "doc_id", "toks", window=5).collect()
    }
    assert set(spans) == {1, 2, 3}
    # remove each doc's flagged span; the deduped corpus has no repeated
    # cross-document 5-gram left (removal fraction check)
    cleaned = [
        (i, t[: spans[i][0]] + t[spans[i][1] + 1 :]) for i, t in docs.items()
    ]
    df2 = spark.createDataFrame(cleaned, "doc_id int, toks array<string>")
    assert duplicated_spans(df2, "doc_id", "toks", window=5).count() == 0


def test_duplicated_spans_overlapping_plants_merge(spark):
    from diffdataflowmlpipelines_spark.functions.dedup import duplicated_spans

    # doc 1 carries passage A immediately followed by passage B; docs 2
    # and 3 carry A and B separately -> doc 1's two flagged regions are
    # adjacent runs of window starts and must merge into ONE span
    pa = [f"a{i}" for i in range(5)]
    pb = [f"b{i}" for i in range(5)]
    df = spark.createDataFrame(
        [
            (1, pa + pb),
            (2, [f"q{i}" for i in range(3)] + pa + ["z"]),
            (3, ["w"] + pb + [f"v{i}" for i in range(3)]),
        ],
        "doc_id int, toks array<string>",
    )
    out = {
        r["doc_id"]: (r["span_start"], r["span_end"], r["span_len"])
        for r in duplicated_spans(df, "doc_id", "toks", window=5).collect()
    }
    assert out[1] == (0, 9, 10)  # A..B merged: starts {0, 5} not contiguous


def test_t15_curation_v2_flags_and_fused_keep(spark):
    from diffdataflowmlpipelines_spark.plans import QUERIES

    rows = QUERIES["t15_curation_v2"](spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 500
    for col in ("keep_quality", "keep_oov", "keep_dedup"):
        vals = {r[col] for r in rows}
        assert vals == {0, 1}, f"{col} must be two-class, got {vals}"
    for r in rows:
        assert r["keep"] == r["keep_quality"] * r["keep_oov"] * r["keep_dedup"]


def test_hash_split_deterministic_and_complete(spark):
    from diffdataflowmlpipelines_spark.functions.sampling import hash_split

    df = spark.createDataFrame([(i,) for i in range(500)], "doc_id long")
    out = df.select(
        "doc_id",
        hash_split("doc_id", [("train", 0.90), ("val", 0.05), ("test", 0.05)]).alias(
            "split"
        ),
    )
    got = {r["doc_id"]: r["split"] for r in out.collect()}
    from collections import Counter

    c = Counter(got.values())
    assert set(c) == {"train", "val", "test"}
    assert c["train"] > c["val"] and c["train"] > c["test"]
    # membership is a pure function of the id: a smaller corpus assigns
    # the same splits (hash-range, not ordinal)
    small = spark.createDataFrame([(i,) for i in range(100)], "doc_id long")
    got_small = {
        r["doc_id"]: r["split"]
        for r in small.select(
            "doc_id",
            hash_split(
                "doc_id", [("train", 0.90), ("val", 0.05), ("test", 0.05)]
            ).alias("split"),
        ).collect()
    }
    assert all(got[k] == v for k, v in got_small.items())


def test_hash_split_null_id_and_weight_normalization(spark):
    import pytest as _pytest

    from diffdataflowmlpipelines_spark.functions.sampling import hash_split

    df = spark.createDataFrame([(None,), (1,)], "doc_id long")
    rows = df.select(
        "doc_id", hash_split("doc_id").alias("split")
    ).collect()
    by_id = {r["doc_id"]: r["split"] for r in rows}
    assert by_id[None] is None and by_id[1] is not None

    # un-normalized weights behave like their normalized form
    a = df.select(hash_split("doc_id", [("a", 2.0), ("b", 2.0)]).alias("s"))
    b = df.select(hash_split("doc_id", [("a", 0.5), ("b", 0.5)]).alias("s"))
    assert [r["s"] for r in a.collect()] == [r["s"] for r in b.collect()]

    with _pytest.raises(ValueError):
        hash_split("doc_id", [("only", 1.0)])
    with _pytest.raises(ValueError):
        hash_split("doc_id", [("a", -0.1), ("b", 1.1)])
