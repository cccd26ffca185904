"""Regression tests for the round-5b whole-file review of
functions/similarity.py + functions/dedup.py (10 findings)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_embedding_near_dups_zero_norm_excluded_not_crashed(spark):
    """A zero vector lands in sign block '1111' — before the fix the
    ANSI cosine division against it killed the whole query."""
    from diffdataflowmlpipelines_spark.functions.dedup import embedding_near_dups

    rows = [
        (1, [1.0, 1.0, 1.0, 1.0]),
        (2, [1.0, 1.0, 1.0, 0.999]),
        (3, [0.0, 0.0, 0.0, 0.0]),  # zero-norm, same sign block
        (4, None),                   # NULL vector
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = embedding_near_dups(df, "vec_id", "embedding", threshold=0.9).collect()
    assert [(r.a, r.b) for r in out] == [(1, 2)]


def test_embedding_near_dups_dim_guards(spark):
    from diffdataflowmlpipelines_spark.functions.dedup import embedding_near_dups

    short = spark.createDataFrame(
        [(1, [1.0, 2.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="dims"):
        embedding_near_dups(short, "vec_id", "embedding")
    # a mixed-dimension row raises in-plan instead of silently
    # dropping its pairs via null cosines
    mixed = spark.createDataFrame(
        [(1, [1.0, 1.0, 1.0, 1.0]), (2, [1.0, 1.0, 1.0, 1.0, 5.0])],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(Exception, match="mixed dims"):
        embedding_near_dups(mixed, "vec_id", "embedding", threshold=0.0).collect()


def test_nearest_assign_string_keys(spark):
    """semantic_dedup (via _nearest_assign) on STRING doc ids — before
    the fix this crashed at plan time on int(cid); float-like distinct
    keys must also stay distinct cells."""
    from diffdataflowmlpipelines_spark.functions.similarity import semantic_dedup

    rows = [
        ("doc_a", [1.0, 0.0]),
        ("doc_b", [0.99, 0.01]),
        ("doc_x", [0.0, 1.0]),
        ("doc_y", [0.01, 0.99]),
    ]
    df = spark.createDataFrame(rows, "doc_id string, embedding array<double>")
    cents = spark.createDataFrame(
        [("doc_a", [1.0, 0.0]), ("doc_x", [0.0, 1.0])],
        "doc_id string, embedding array<double>",
    )
    out = {
        r.doc_id: (r.cluster_id, r.keep)
        for r in semantic_dedup(
            df, "doc_id", "embedding", threshold=0.9, centroids=cents
        ).collect()
    }
    assert out["doc_a"] == ("doc_a", 1)
    assert out["doc_b"] == ("doc_a", 0)   # near-dup of doc_a, higher key drops
    assert out["doc_x"] == ("doc_x", 1)
    assert out["doc_y"] == ("doc_x", 0)


def test_dup_clusters_raises_on_non_convergence(spark):
    from diffdataflowmlpipelines_spark.functions.dedup import (
        dup_clusters,
        dup_clusters_star,
    )

    # a 12-node chain: diameter 11 > max_iter=3 — must raise, not hand
    # back silently-split clusters
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(11)], "a long, b long"
    )
    with pytest.raises(ValueError, match="not converged"):
        dup_clusters(chain, max_iter=3)
    # with budget it converges and matches the star form
    got = {r.doc: r.cluster_rep for r in dup_clusters(chain, max_iter=15).collect()}
    star = {r.doc: r.cluster_rep for r in dup_clusters_star(chain).collect()}
    assert got == star == {i: 0 for i in range(12)}


def test_kmeans_centroids_null_and_zero_rows_excluded(spark):
    from diffdataflowmlpipelines_spark.functions.similarity import kmeans_centroids

    rows = (
        [(i, [10.0 + i * 0.01, 0.0]) for i in range(5)]
        + [(10 + i, [0.0, 10.0 + i * 0.01]) for i in range(5)]
        + [(98, [0.0, 0.0]), (99, None)]  # would crash/degrade KMeans
    )
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = kmeans_centroids(df, "vec_id", "embedding", n_centroids=2, seed=3)
    got = cents.collect()
    assert len(got) == 2
    # both centers are real cluster directions, not zero-pulled
    assert all(sum(x * x for x in r.embedding) > 1.0 for r in got)


def test_ivf_topk_unchanged_without_dedup_shuffle(spark):
    """Pairs are unique by construction (one cell per neighbor, distinct
    probe cells) — removing the dropDuplicates must not change output."""
    import random

    from diffdataflowmlpipelines_spark.functions.similarity import ivf_topk

    rng = random.Random(13)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(40)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = ivf_topk(
        emb, emb.filter(F.col("vec_id") < 6), "vec_id", "embedding",
        k=4, n_centroids=4, nprobe=2,
    )
    got = [(r.query_id, r.neighbor_id) for r in out.collect()]
    assert len(got) == len(set(got))  # still no duplicate pairs
    assert len(got) > 0
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the dedup exchange is gone: only the top-k window's shuffle and
    # the candidate join remain
    assert "dropDuplicates" not in plan


# --- second review pass: text/sampling/sketches ---------------------------------

def test_stratified_sample_giant_stratum_capped_not_dropped(spark):
    """A stratum bigger than target*scale floored its threshold to 0 and
    vanished entirely; the clamp keeps ~|stratum|/scale rows."""
    from diffdataflowmlpipelines_spark.functions.sampling import stratified_sample

    rows = [(i, "big") for i in range(3000)] + [(10_000 + i, "small") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    # scale=100: target*scale = 200 < 3000 -> old threshold 0 -> all dropped
    out = stratified_sample(df, "source", "doc_id", target_per_stratum=2, scale=100)
    by = {r[0]: r[1] for r in out.groupBy("source").count().collect()}
    assert by.get("big", 0) > 0          # the dominant crawl is CAPPED, not erased
    assert by["big"] < 3000              # and genuinely sampled
    assert by.get("small", 0) > 0


def test_hll_null_values_do_not_shift_estimate(spark):
    from diffdataflowmlpipelines_spark.functions.sketches import (
        hll_estimate,
        hll_registers,
    )

    clean = spark.createDataFrame(
        [(f"u{i}",) for i in range(500)], "uid string"
    )
    dirty = clean.unionByName(
        spark.createDataFrame([(None,), (None,)], "uid string")
    )
    est = lambda df: hll_estimate(hll_registers(df, "uid")).collect()[0]["est"]  # noqa: E731
    assert est(clean) == est(dirty)  # a NULL has no identity to count


def test_count_min_null_tokens_excluded(spark):
    from diffdataflowmlpipelines_spark.functions.sketches import count_min_sketch

    df = spark.createDataFrame(
        [(["a", None, "b"],), (["a"],)], "toks array<string>"
    )
    sk = count_min_sketch(df, "toks", depth=2, width=16)
    rows = sk.collect()
    assert all(r.bucket is not None and 0 <= r.bucket < 16 for r in rows)
    assert sum(r["count"] for r in rows) == 2 * 3  # 3 real tokens x depth 2


def test_bottomk_quantile_names_unique_and_exact(spark):
    import pytest
    from diffdataflowmlpipelines_spark.functions.sketches import (
        bottomk_quantile_sketch,
        bottomk_quantiles,
    )

    df = spark.createDataFrame(
        [(str(i), float(i)) for i in range(200)], "id string, value double"
    )
    sk = bottomk_quantile_sketch(df, "id", "value", k=128)
    out = bottomk_quantiles(sk, quantiles=(0.5, 0.999))
    assert "p50" in out.columns and "p99_9" in out.columns  # not p100
    with pytest.raises(ValueError, match="duplicate"):
        bottomk_quantiles(sk, quantiles=(0.999, 0.999))


def test_quality_features_null_text_all_zero(spark):
    from diffdataflowmlpipelines_spark.functions.text import quality_features

    df = spark.createDataFrame([(1, None)], "doc_id long, text string")
    feats = quality_features("text")
    row = df.select(*[v.alias(k) for k, v in feats.items()]).collect()[0]
    assert row.n_chars == 0 and row.n_tokens == 0
    assert row.mean_token_len == 0.0 and row.punct_ratio == 0.0
    assert row.stopword_ratio == 0.0 and row.alpha_ratio == 0.0  # no NULLs


# --- third review pass: bpe/bloom/vectorizers/multimodal -------------------------

def test_word_frequencies_diff_aware(spark):
    """pair_counts(word_frequencies(docs)) == corpus_pair_counts(docs)
    must hold WITH retractions (the documented linearity identity)."""
    from diffdataflowmlpipelines_spark.functions.bpe import (
        corpus_pair_counts,
        initial_symbols,
        pair_counts,
        word_frequencies,
    )

    docs = spark.createDataFrame(
        [("a b", 1), ("a b", 1), ("a b", -1), ("c d", 1)],
        "text string, diff int",
    )
    wf = word_frequencies(docs)
    assert {r.word: r.freq for r in wf.collect()} == {
        "a": 1, "b": 1, "c": 1, "d": 1,  # one 'a b' retracted
    }
    via_wf = {
        (r.left, r.right): r.pair_count
        for r in pair_counts(
            wf.withColumn("symbols", initial_symbols(F.col("word")))
        ).collect()
    }
    direct = {
        (r.left, r.right): r.pair_count
        for r in corpus_pair_counts(docs).collect()
        if r.pair_count != 0  # streaming contract: 0 rows are tombstones
    }
    assert via_wf == direct and len(direct) > 0


def test_bloom_build_ignores_nulls(spark):
    from diffdataflowmlpipelines_spark.functions.bloom import build_bloom_words

    clean = spark.createDataFrame([("x",), ("y",)], "g string")
    dirty = spark.createDataFrame([("x",), (None,), ("y",)], "g string")
    a = build_bloom_words(clean, "g", n_bits=256)
    b = build_bloom_words(dirty, "g", n_bits=256)  # crashed before
    assert a == b


def test_hash_vectorizer_null_tokens_ignored(spark):
    from diffdataflowmlpipelines_spark.functions.vectorizers import HashVectorizer

    hv = HashVectorizer(n_features=8)
    clean = spark.createDataFrame([(1, ["a", "b"])], "doc_id long, toks array<string>")
    dirty = spark.createDataFrame(
        [(1, ["a", None, "b", None])], "doc_id long, toks array<string>"
    )
    va = hv.fit_transform(clean, "doc_id", "toks", "vec").collect()[0]["vec"]
    vb = hv.fit_transform(dirty, "doc_id", "toks", "vec").collect()[0]["vec"]
    assert va == vb and sum(va) == 2.0  # no phantom bucket at hash(NULL)=42
