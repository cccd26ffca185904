"""Golden encoder tests ported verbatim from the reference's unit suite
(FIXTURES.md F3): same inputs, same closed-form expectations, including
the reference's divide-by-variance StandardScaler semantics.

- standard_scaler_works: reference src/feature_encoders/standard_scaler.rs:128-166
- min_max_works:         reference src/feature_encoders/minmax_scaler.rs:174-213
- kbins_works:           reference src/feature_encoders/kbins_discretizer.rs:54-92
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from diffdataflowmlpipelines_spark.operators.collection import (
    concat,
    consolidate,
    negate,
    with_diff,
)
from diffdataflowmlpipelines_spark.operators.encoders import (
    KBinsDiscretizer,
    MinMaxScaler,
    MultiColumnEncoder,
    OneHotEncoder,
    OrdinalEncoder,
    Passthrough,
    Pipeline,
    PolynomialFeatures,
    StandardScaler,
    fit_dictionary,
    overprovisioned_len,
)


def _col_df(spark, values):
    return spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(values)], "row_id long, x double"
    )


def rows_map(df, out="y"):
    return {r["row_id"]: r[out] for r in df.collect()}


def test_standard_scaler_golden(spark):
    # reference expectation: (i - 4.5) / 8.25 (mean 4.5, POPULATION VARIANCE
    # 8.25 as the divisor — standard_scaler.rs:112,162)
    df = _col_df(spark, range(10))
    got = rows_map(StandardScaler().fit_transform(df, "x", "y"))
    for i in range(10):
        assert got[i] == pytest.approx((i - 4.5) / 8.25, abs=1e-12)


def test_standard_scaler_rounding(spark):
    # rounding (n_mean=-2, n_var=0): mean->4.5 (already exact at 0.01),
    # var 8.25 -> rounded to 10^0 -> 8.0
    df = _col_df(spark, range(10))
    got = rows_map(StandardScaler(round_to=(-2, 0)).fit_transform(df, "x", "y"))
    for i in range(10):
        assert got[i] == pytest.approx((i - 4.5) / 8.0, abs=1e-12)


def test_standard_scaler_retraction(spark):
    # insert 0..9 then retract the value 9: statistics equal batch fit of 0..8
    base = with_diff(_col_df(spark, range(10)))
    retract = negate(with_diff(_col_df(spark, [9.0]).withColumn("row_id", F.lit(9))))
    col = consolidate(concat(base, retract))
    got = rows_map(StandardScaler().fit_transform(col, "x", "y").filter("diff > 0"))
    mean = sum(range(9)) / 9.0
    var = sum((i - mean) ** 2 for i in range(9)) / 9.0
    for i in range(9):
        assert got[i] == pytest.approx((i - mean) / var, rel=1e-9)


def test_minmax_golden(spark):
    # reference: input i % 5 for i in 0..9 -> (i % 5) / 4.0
    df = _col_df(spark, [i % 5 for i in range(10)])
    got = rows_map(MinMaxScaler().fit_transform(df, "x", "y"))
    for i in range(10):
        assert got[i] == pytest.approx((i % 5) / 4.0, abs=1e-12)


def test_kbins_golden(spark):
    # reference: k=3, input i % 5 -> floor((i % 5) / 1.4)  (range=4, 4/3≈1.333
    # per bin; the rust test's closed form floor(x/1.4) equals
    # clamp(floor(x/4*3)) on this domain)
    df = _col_df(spark, [i % 5 for i in range(10)])
    got = rows_map(KBinsDiscretizer(3).fit_transform(df, "x", "y"))
    for i in range(10):
        assert got[i] == pytest.approx(math.floor((i % 5) / 1.4), abs=1e-12)


def test_kbins_quantile_golden(spark):
    # extension beyond the reference (sklearn strategy="quantile"):
    # 0..9, k=4 -> interior edges [2.25, 4.5, 6.75] (linear interp),
    # bins = {0,1,2}->0, {3,4}->1, {5,6}->2, {7,8,9}->3
    df = _col_df(spark, list(range(10)))
    got = rows_map(
        KBinsDiscretizer(4, strategy="quantile").fit_transform(df, "x", "y")
    )
    want = {0: 0, 1: 0, 2: 0, 3: 1, 4: 1, 5: 2, 6: 2, 7: 3, 8: 3, 9: 3}
    for i in range(10):
        assert got[i] == pytest.approx(float(want[i]), abs=1e-12), i


def test_kbins_quantile_duplicate_edges_dedupe(spark):
    """ADVICE r2: coinciding quantile edges (constant / low-cardinality
    columns) must collapse like sklearn's np.unique(edges), not jump
    most rows to bin k-1."""
    # constant column: all 7 interior edges coincide -> everything bin 0
    df = _col_df(spark, [5] * 20)
    got = rows_map(
        KBinsDiscretizer(8, strategy="quantile").fit_transform(df, "x", "y")
    )
    assert set(got.values()) == {0.0}
    # two-valued column: one surviving edge -> exactly bins {0, 1}
    df2 = _col_df(spark, [1] * 10 + [9] * 10)
    enc = KBinsDiscretizer(8, strategy="quantile").fit(df2, "x")
    assert len(enc.edges_) < 7  # duplicates collapsed
    got2 = rows_map(enc.transform(df2, "x", "y"))
    assert {got2[i] for i in range(10)} == {0.0}
    assert {got2[i] for i in range(10, 20)} == {1.0}


def test_fit_dictionary_no_persist_leak(spark):
    """ADVICE r2: fit_dictionary persisted the range-partitioned frame
    and never unpersisted — every fit leaked SESSION-lifetime cache.
    The fix pins the range layout with localCheckpoint(eager=True)
    instead: blocks live exactly as long as the fitted dictionary is
    reachable (it IS the fitted state), and the ContextCleaner releases
    them once the frame is garbage-collected. Assert reclaimability,
    not instant emptiness."""
    import gc
    import time

    def nblocks():
        return len(spark.sparkContext._jsc.sc().getRDDStorageInfo())

    # drain first: earlier tests in the session leave garbage
    # checkpoint blocks that the ContextCleaner reclaims ASYNCHRONOUSLY
    # — a baseline snapshotted mid-drain races both asserts below
    # (observed once the checkpoint-heavy BPE suite ran before this
    # file). Stable-for-5-polls == drained.
    last, stable, t0 = nblocks(), 0, time.time()
    while time.time() - t0 < 60 and stable < 5:
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        time.sleep(1)
        cur = nblocks()
        stable = stable + 1 if cur == last else 0
        last = cur
    base = nblocks()
    df = _col_df(spark, list(range(50))).withColumn(
        "w", F.concat(F.lit("v"), F.col("x").cast("string"))
    )
    d = fit_dictionary(df, "w")
    assert d.count() == 50
    enc = OrdinalEncoder()
    enc.fit_transform(df, "w", "code").count()
    # while reachable the pinned layout is materialized (that's the fix
    # for the cross-job boundary-drift hazard, not a leak)
    assert nblocks() >= base
    del d, enc
    gc.collect()
    spark.sparkContext._jvm.System.gc()
    for i in range(45):
        if nblocks() <= base:
            break
        time.sleep(1)
        if i % 5 == 4:
            gc.collect()
            spark.sparkContext._jvm.System.gc()
    assert nblocks() <= base, "checkpoint blocks not reclaimed after GC"


def test_overprovisioned_len_policy(spark):
    # integer_assignment_aggregate.rs:84-93: 1, 2, 3, 5, 8, 12, 18, 27 ...
    assert [overprovisioned_len(n) for n in [1, 2, 3, 4, 5, 6, 8, 9, 12, 13]] == [
        1, 2, 3, 5, 5, 8, 8, 12, 12, 18,
    ]


def test_ordinal_encoder_unseen(spark):
    train = _col_df(spark, [1, 2, 3]).withColumn("x", F.col("x").cast("string"))
    test = spark.createDataFrame(
        [(10, "1.0"), (11, "3.0"), (12, "99.0")], "row_id long, x string"
    )
    enc = OrdinalEncoder().fit(train, "x")
    got = rows_map(enc.transform(test, "x", "y"))
    assert got[10] == 0.0 and got[11] == 2.0
    assert got[12] == -1.0  # unseen -> -1.0 (ordinal_encoder.rs:45-49)


def test_one_hot_encoder(spark):
    train = spark.createDataFrame(
        [(0, "a"), (1, "b"), (2, "c"), (3, "a")], "row_id long, x string"
    )
    enc = OneHotEncoder().fit(train, "x")
    assert enc.vec_len_ == 3
    got = rows_map(enc.transform(train, "x", "y"))
    assert got[0] == [1.0, 0.0, 0.0]
    assert got[1] == [0.0, 1.0, 0.0]
    assert got[2] == [0.0, 0.0, 1.0]
    # unseen -> zero vector (one_hot_encoder.rs:50-57)
    test = spark.createDataFrame([(9, "zzz")], "row_id long, x string")
    assert rows_map(enc.transform(test, "x", "y"))[9] == [0.0, 0.0, 0.0]


def test_polynomial_features(spark):
    df = _col_df(spark, [2.0])
    got = rows_map(PolynomialFeatures(1, 3).fit_transform(df, "x", "y"))
    assert got[0] == [2.0, 4.0, 8.0]


def test_pipeline_chaining(spark):
    # minmax then standard-scaler composition over one column
    df = _col_df(spark, range(10))
    pipe = Pipeline([MinMaxScaler(), StandardScaler()])
    got = rows_map(pipe.fit_transform(df, "x", "y"))
    mm = [i / 9.0 for i in range(10)]
    mean = sum(mm) / 10
    var = sum((v - mean) ** 2 for v in mm) / 10
    for i in range(10):
        assert got[i] == pytest.approx((mm[i] - mean) / var, rel=1e-9)


def test_multi_column_encoder_columnar_assembly(spark):
    # reference demo config (src/main.rs:61-69): scalers + onehot +
    # passthrough, outputs concatenated; here via pure select, no join.
    df = spark.createDataFrame(
        [(i, float(i), str(i % 2)) for i in range(4)],
        "row_id long, num double, cat string",
    )
    mce = MultiColumnEncoder(
        [("num", StandardScaler()), ("cat", OneHotEncoder()), ("num", Passthrough())]
    )
    out = mce.fit_transform(df, out="features")
    got = rows_map(out, out="features")
    mean, var = 1.5, 1.25
    for i in range(4):
        vec = got[i]
        assert vec[0] == pytest.approx((i - mean) / var)
        onehot = vec[1:3]
        assert onehot[i % 2] == 1.0 and sum(onehot) == 1.0
        assert vec[3] == float(i)
    # plan must contain no row-keyed join for assembly (columnar concat)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan


def test_fit_dictionary_large_vocab_dense_rank(spark):
    """Regression for the range-partition boundary-drift class: at a
    vocabulary large enough for partial range sampling, __idx must be a
    dense permutation 0..n-1 that equals the global sorted rank — a
    boundary mismatch between the offsets job and the consumer job
    would leave holes/collisions at shard seams."""
    n = 200_000
    df = spark.range(n).select(
        F.concat(F.lit("w"), F.format_string("%07d", (F.col("id") * 48271) % n))
        .alias("w")
    )
    d = fit_dictionary(df, "w", n_shards=16)
    stats = d.agg(
        F.count("*").alias("c"),
        F.countDistinct("__idx").alias("dc"),
        F.min("__idx").alias("mn"),
        F.max("__idx").alias("mx"),
        # idx must be the rank in sorted(w) order: monotone bijection ->
        # sum over a strict pairing check via self-ordering hash
        F.sum(F.col("__idx")).alias("s"),
    ).first()
    assert (stats["c"], stats["dc"]) == (n, n)
    assert (stats["mn"], stats["mx"]) == (0, n - 1)
    assert stats["s"] == n * (n - 1) // 2
    # order check on a deterministic sample: idx ordering == value ordering
    sample = (
        d.filter(F.pmod(F.xxhash64("w"), F.lit(997)) == 0)
        .orderBy("w")
        .collect()
    )
    idxs = [r["__idx"] for r in sample]
    assert idxs == sorted(idxs) and len(sample) > 50
