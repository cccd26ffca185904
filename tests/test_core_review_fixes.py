"""Regression tests for the core-file review findings (round 3b, fourth
pass): ANSI zero-division guards, retraction correctness in the
vectorizers, outer-join differential semantics, LSH parameter honesty."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from diffdataflowmlpipelines_spark.functions.similarity import (
    cosine_topk,
    lsh_topk,
)
from diffdataflowmlpipelines_spark.functions.vectorizers import (
    CountVectorizer,
    HashVectorizer,
    TfidfTransformer,
    tfidf_pairs,
)
from diffdataflowmlpipelines_spark.operators.collection import (
    join_diff,
    weighted_avg,
    weighted_count,
    weighted_var_pop,
)


def test_weighted_aggs_fully_retracted_group_null_not_crash(spark):
    """A fully-retracted group (net count 0) yields NULL mean/variance —
    ANSI mode previously threw DIVIDE_BY_ZERO."""
    df = spark.createDataFrame(
        [("a", 1.0, 1), ("a", 1.0, -1), ("b", 3.0, 1)],
        "k string, x double, diff long",
    )
    got = {
        r["k"]: (r["n"], r["avg"], r["var"])
        for r in df.groupBy("k")
        .agg(
            weighted_count().alias("n"),
            weighted_avg("x").alias("avg"),
            weighted_var_pop("x").alias("var"),
        )
        .collect()
    }
    assert got["a"] == (0, None, None)
    assert got["b"][0] == 1 and got["b"][1] == 3.0


def test_join_diff_left_keeps_unmatched(spark):
    """An unmatched left row must keep its own multiplicity, not get a
    NULL diff that downstream consolidation silently drops."""
    a = spark.createDataFrame([("x", 2), ("y", 1)], "k string, diff long")
    b = spark.createDataFrame([("x", 3)], "k string, diff long")
    got = {r["k"]: r["diff"] for r in join_diff(a, b, on="k", how="left").collect()}
    assert got == {"x": 6, "y": 1}


def test_tfidf_pairs_retracted_doc_shrinks_n(spark):
    """A fully-retracted document must leave N (the doc count), not just
    the tf rows — otherwise every weight uses ln((N+1)/df)."""
    import math

    rows = [
        (1, ["a", "b"], 1),
        (2, ["a"], 1),
        (3, ["b"], 1),
        (3, ["b"], -1),  # doc 3 fully retracted
    ]
    df = spark.createDataFrame(rows, "doc long, toks array<string>, diff long")
    got = {
        (r["doc"], r["token"]): r["weight"]
        for r in tfidf_pairs(df, "doc", "toks").collect()
    }
    # N = 2 live docs; 'b' now appears in 1 of 2 docs
    assert got[(1, "b")] == pytest.approx(math.log(2 / 1))
    assert got[(1, "a")] == pytest.approx(math.log(2 / 2))
    assert (3, "b") not in got


def test_count_vectorizer_binary_net_negative_absent(spark):
    """binary=True: a net-NEGATIVE token count is NOT presence."""
    train = spark.createDataFrame(
        [(1, ["a", "b"], 1)], "rid long, toks array<string>, diff long"
    )
    test = spark.createDataFrame(
        [(9, ["a"], -1), (10, ["b"], 1)],
        "rid long, toks array<string>, diff long",
    )
    cv = CountVectorizer(binary=True).fit(train, "toks")
    got = {r["rid"]: r["v"] for r in cv.transform(test, "rid", "toks", "v").collect()}
    assert got[10][1] == 1.0  # b present
    assert all(x == 0.0 for x in got[9])  # net-negative 'a': absent


def test_hash_vectorizer_retraction_cancels(spark):
    """A fully-retracted token leaves its bucket at 0.0 in both modes
    (binary previously emitted presence for a net-zero bucket)."""
    df = spark.createDataFrame(
        [(1, ["t"], 1), (1, ["t"], -1), (2, ["t"], 1)],
        "rid long, toks array<string>, diff long",
    )
    for binary in (False, True):
        hv = HashVectorizer(4, binary=binary)
        got = {r["rid"]: r["v"] for r in hv.transform(df, "rid", "toks", "v").collect()}
        assert all(x == 0.0 for x in got[1]), binary
        assert sum(got[2]) == 1.0, binary


def test_tfidf_transformer_round_to_rounds_weight(spark):
    """round_to is decimal places on the OUTPUT weight (the old code
    rounded the df statistic to the nearest 10^round_to, zeroing every
    weight)."""
    import math

    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [1.0, 1.0])], "rid long, v array<double>"
    )
    tt = TfidfTransformer(round_to=4)
    got = {r["rid"]: r["o"] for r in tt.fit_transform(df, "rid", "v", "o").collect()}
    # pos 0: df=2, n=2 -> ln(1)=0; pos 1: df=1 -> ln(2) rounded to 4dp
    assert got[2][1] == pytest.approx(round(math.log(2), 4))
    assert any(x != 0.0 for x in got[2])  # the old bug zeroed everything


def test_lsh_multiprobe_two_and_validation(spark):
    rows = [(i, [float((i * 7 + j) % 5 - 2) for j in range(8)]) for i in range(30)]
    df = spark.createDataFrame(rows, "id long, v array<double>")
    q = df.limit(3)
    r1 = lsh_topk(df, q, "id", "v", k=3, n_planes=4, dim=8, multiprobe=1)
    r2 = lsh_topk(df, q, "id", "v", k=3, n_planes=4, dim=8, multiprobe=2)
    # distance-2 probing can only widen the candidate set
    assert r2.count() >= r1.count()
    with pytest.raises(ValueError):
        lsh_topk(df, q, "id", "v", multiprobe=3)
    with pytest.raises(ValueError):
        lsh_topk(df, q, "id", "v", dim=64)  # data is 8-dim


def test_cosine_topk_zero_vector_excluded_not_crash(spark):
    """A zero-norm embedding has no cosine: excluded, and no ANSI
    DIVIDE_BY_ZERO abort."""
    rows = [(1, [1.0, 0.0]), (2, [0.0, 0.0]), (3, [0.5, 0.5])]
    df = spark.createDataFrame(rows, "id long, v array<double>")
    out = cosine_topk(df, df, "id", "v", k=5).collect()
    ids = {r["query_id"] for r in out} | {r["neighbor_id"] for r in out}
    assert 2 not in ids and len(out) > 0


# --- fifth-pass findings (encoders / dedup / text / sketches) ---------------


def test_exact_dedup_null_layouts_do_not_collide(spark):
    from diffdataflowmlpipelines_spark.functions.dedup import exact_dedup

    df = spark.createDataFrame(
        [(1, "a", None, "b"), (2, "a", "b", None), (3, "a", "b", None)],
        "id long, c1 string, c2 string, c3 string",
    )
    out = exact_dedup(df, "id", ["c1", "c2", "c3"]).collect()
    # rows 2 and 3 are true dups; row 1 differs (NULL in another slot)
    assert sorted(r["n_dups"] for r in out) == [1, 2]


def test_word_shingles_null_token_distinct(spark):
    from diffdataflowmlpipelines_spark.functions.dedup import word_shingles

    df = spark.createDataFrame(
        [(1, ["a", None]), (2, ["a"])], "id long, t array<string>"
    )
    got = {r["id"]: r["s"] for r in df.select(
        "id", word_shingles(F.col("t"), 3).alias("s")
    ).collect()}
    assert got[1] != got[2]


def test_lsh_banding_guards(spark):
    from diffdataflowmlpipelines_spark.functions.dedup import (
        lsh_band_buckets,
        minhash_lsh_candidates,
    )

    with pytest.raises(ValueError):
        lsh_band_buckets(F.col("sig"), bands=20, sig_len=16)  # r = 0
    with pytest.raises(ValueError):
        lsh_band_buckets(F.col("sig"), bands=5, sig_len=16)  # remainder
    sigs = spark.createDataFrame([(1, [1, 2, 3, 4])], "id long, sig array<long>")
    with pytest.raises(ValueError):
        minhash_lsh_candidates(sigs, "id", bands=3, sig_len=4)


def test_jaccard_duplicate_candidates_not_inflated(spark):
    from diffdataflowmlpipelines_spark.functions.dedup import jaccard_pairs

    docs = spark.createDataFrame(
        [(1, ["x", "y", "z", "w"]), (2, ["x", "y", "z", "q"])],
        "id long, toks array<string>",
    )
    dup_cands = spark.createDataFrame(
        [(1, 2), (1, 2)], "a long, b long"  # repeated candidate pair
    )
    (r,) = jaccard_pairs(
        docs, "id", "toks", threshold=0.0, candidates=dup_cands
    ).collect()
    assert 0.0 <= r["jaccard"] <= 1.0


def test_simhash_bits_guard(spark):
    from diffdataflowmlpipelines_spark.functions.dedup import simhash

    df = spark.createDataFrame([(1, ["a"])], "id long, toks array<string>")
    with pytest.raises(ValueError):
        simhash(df, "id", "toks", bits=61)


def test_constant_column_minmax_and_kbins(spark):
    from diffdataflowmlpipelines_spark.operators.encoders import (
        KBinsDiscretizer,
        MinMaxScaler,
    )

    df = spark.createDataFrame([(i, 5.0) for i in range(6)], "rid long, x double")
    mm = {r["rid"]: r["y"] for r in MinMaxScaler().fit_transform(df, "x", "y").collect()}
    assert set(mm.values()) == {0.0}  # sklearn-like, not NaN / ANSI crash
    kb = {r["rid"]: r["y"] for r in KBinsDiscretizer(4).fit_transform(df, "x", "y").collect()}
    assert set(kb.values()) == {0.0}  # matches the quantile strategy


def test_fit_dictionary_null_category_not_indexed(spark):
    from diffdataflowmlpipelines_spark.operators.encoders import OrdinalEncoder

    df = spark.createDataFrame(
        [(0, None), (1, "a"), (2, "b")], "rid long, x string"
    )
    got = {r["rid"]: r["y"] for r in OrdinalEncoder().fit_transform(df, "x", "y").collect()}
    # codes unshifted by the NULL (a=0, b=1); NULL row encodes unseen
    assert got[1] == 0.0 and got[2] == 1.0
    assert got[0] == -1.0


def test_mean_token_len_exact(spark):
    from diffdataflowmlpipelines_spark.functions.text import quality_features

    df = spark.createDataFrame(
        [(1, "a  b"), (2, ""), (3, "abc de")], "id long, t string"
    )
    feats = quality_features("t")
    got = {r["id"]: r["m"] for r in df.select(
        "id", feats["mean_token_len"].alias("m")
    ).collect()}
    assert got[1] == 1.0  # double space: closed form said 1.5
    assert got[2] == 0.0  # empty doc: closed form said 1.0
    assert got[3] == 2.5
