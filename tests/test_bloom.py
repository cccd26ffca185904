"""Bloom-filter membership (functions/bloom.py): build parity against a
driver-side python twin, no-false-negative guarantee, bounded false
positives, and superset agreement with exact decontamination."""

import hashlib

import pytest
from pyspark.sql import functions as F

from diffdataflowmlpipelines_spark.functions.bloom import (
    WORD_BITS,
    bloom_contamination,
    bloom_member,
    build_bloom_words,
)
from diffdataflowmlpipelines_spark.functions.dedup import ngram_contamination

N_BITS = 1 << 12
K = 4


def _py_positions(s: str, n_bits: int, k: int) -> list[int]:
    d = hashlib.md5(s.encode()).hexdigest()
    h1 = int(d[:15], 16) % n_bits
    h2 = int(d[15:30], 16) % n_bits
    return [(h1 + i * h2) % n_bits for i in range(k)]


def _py_words(values, n_bits: int, k: int) -> list[int]:
    words = [0] * (n_bits // WORD_BITS)
    for v in values:
        for p in _py_positions(v, n_bits, k):
            words[p // WORD_BITS] |= 1 << (p % WORD_BITS)
    return words


def test_distributed_build_matches_python_twin(spark):
    vals = [f"token-{i}" for i in range(500)]
    df = spark.createDataFrame([(v,) for v in vals], ["v"])
    got = build_bloom_words(df, "v", n_bits=N_BITS, k=K)
    assert got == _py_words(vals, N_BITS, K)


def test_no_false_negatives_and_bounded_false_positives(spark):
    members = [f"in-{i}" for i in range(400)]
    others = [f"out-{i}" for i in range(2000)]
    words = _py_words(members, N_BITS, K)
    df = spark.createDataFrame(
        [(v, True) for v in members] + [(v, False) for v in others], ["v", "is_member"]
    )
    got = df.select(
        "is_member", bloom_member(F.col("v"), words, n_bits=N_BITS, k=K).alias("m")
    ).collect()
    fn = sum(1 for r in got if r["is_member"] and not r["m"])
    fp = sum(1 for r in got if not r["is_member"] and r["m"])
    assert fn == 0  # Bloom filters never false-negative
    # n=400, m=4096, k=4 -> theoretical fp ~ (1-e^(-kn/m))^4 ~ 1.1%
    assert fp / len(others) < 0.05


def test_member_agrees_with_python_positions(spark):
    members = [f"in-{i}" for i in range(100)]
    words = _py_words(members, N_BITS, K)
    probes = [f"probe-{i}" for i in range(300)]
    set_bits = {
        p for v in members for p in _py_positions(v, N_BITS, K)
    }
    want = {
        v: all(p in set_bits for p in _py_positions(v, N_BITS, K)) for v in probes
    }
    df = spark.createDataFrame([(v,) for v in probes], ["v"])
    got = df.select(
        "v", bloom_member(F.col("v"), words, n_bits=N_BITS, k=K).alias("m")
    ).collect()
    assert {r["v"]: r["m"] for r in got} == want


def test_contamination_is_superset_of_exact(spark):
    rows = []
    for i in range(60):
        toks = [f"w{(i * 7 + j) % 40}" for j in range(12)]
        rows.append((i, toks))
    df = spark.createDataFrame(rows, ["doc_id", "toks"])
    bench = df.filter(F.col("doc_id") % 5 == 0)
    corpus = df.filter(F.col("doc_id") % 5 != 0)
    exact = {
        r["doc_id"]: r
        for r in ngram_contamination(corpus, bench, "doc_id", "toks", n=3).collect()
    }
    bloom = {
        r["doc_id"]: r
        for r in bloom_contamination(
            corpus, bench, "doc_id", "toks", n=3, n_bits=N_BITS, k=K
        ).collect()
    }
    assert set(bloom) == set(exact)
    for doc_id, b in bloom.items():
        e = exact[doc_id]
        assert b["n_ngrams"] == e["n_ngrams"]
        # false positives only: the Bloom flag count never undershoots
        assert b["n_flagged"] >= e["n_contaminated"]


def test_parameter_validation(spark):
    df = spark.createDataFrame([("a",)], ["v"])
    with pytest.raises(ValueError, match="multiple"):
        build_bloom_words(df, "v", n_bits=100, k=4)
    with pytest.raises(ValueError, match="k must"):
        build_bloom_words(df, "v", n_bits=64, k=0)
    with pytest.raises(ValueError, match="does not match"):
        bloom_member(F.col("v"), [0] * 3, n_bits=64, k=4)


def test_with_bloom_member_paths_agree_and_literal_cap_enforced(spark, monkeypatch):
    import diffdataflowmlpipelines_spark.functions.bloom as bloom_mod
    from diffdataflowmlpipelines_spark.functions.bloom import with_bloom_member

    members = [f"in-{i}" for i in range(200)]
    words = _py_words(members, N_BITS, K)
    df = spark.createDataFrame(
        [(f"in-{i}",) for i in range(200)] + [(f"out-{i}",) for i in range(200)],
        ["v"],
    )
    lit_rows = {
        r["v"]: r["m"]
        for r in with_bloom_member(df, "v", words, "m", n_bits=N_BITS, k=K).collect()
    }
    # force the broadcast carrier on the same tiny filter
    monkeypatch.setattr(bloom_mod, "BLOOM_LITERAL_MAX_BYTES", 0)
    bc = with_bloom_member(df, "v", words, "m", n_bits=N_BITS, k=K)
    assert "__bloom_words" not in bc.columns
    bc_rows = {r["v"]: r["m"] for r in bc.collect()}
    assert lit_rows == bc_rows  # identical probe semantics on both carriers
    # the Column-level literal API refuses over-cap filters outright
    with pytest.raises(ValueError, match="with_bloom_member"):
        bloom_member(F.col("v"), words, n_bits=N_BITS, k=K)


def test_broadcast_carrier_round_trip_2e26_bits(spark):
    # The docstring's own hazard case: 2^26 bits = 16 MB packed — must
    # take the broadcast path, probe correctly, and leave the plan free
    # of a multi-MB literal.
    from diffdataflowmlpipelines_spark.functions.bloom import with_bloom_member

    n_bits = 1 << 26
    members = [f"big-{i}" for i in range(300)]
    words = _py_words(members, n_bits, K)
    assert len(words) * 8 == (1 << 24)  # 16 MiB of int64 words > 1 MiB cap
    df = spark.createDataFrame(
        [(v, True) for v in members]
        + [(f"no-{i}", False) for i in range(300)],
        ["v", "is_member"],
    )
    out = with_bloom_member(df, "v", words, "m", n_bits=n_bits, k=K)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert len(plan) < 200_000  # no 16 MB literal inlined in the plan
    got = out.collect()
    assert all(r["m"] for r in got if r["is_member"])  # no false negatives
    fps = sum(1 for r in got if not r["is_member"] and r["m"])
    assert fps == 0  # m/n so large the fp probability is ~0
