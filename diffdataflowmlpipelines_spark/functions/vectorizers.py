"""Bag-of-words feature extraction — reference parity for
CountVectorizer (``feature_extraction/count_vectorizer.rs:25-69``),
TfidfTransformer (``tfidf_transformer.rs:29-87``) and HashVectorizer
(``hash_vectorizer.rs:21-48``), plus the exploded-pair forms that are
the actual 100 TB scale path (dense |V|-length vectors are a small-vocab
convenience; pairs shuffle only what exists).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from diffdataflowmlpipelines_spark.operators.collection import DIFF, with_diff
from diffdataflowmlpipelines_spark.operators.encoders import (
    fit_dictionary,
    overprovisioned_len,
)

# The dense classes below materialize a |V|-length statistic on the
# driver and a |V|-length array PER ROW — a bounded-vocab convenience by
# contract, never the 100 TB path (that is token_counts / tfidf_pairs +
# the sharded fit_dictionary, which shuffle only pairs that exist).
# Guarded so the contract fails loudly instead of OOMing the driver.
DENSE_VOCAB_CAP = 65536


def _check_dense_cap(
    n: int, cap: int | None, what: str, alt: str, truncated: bool = False
) -> None:
    if cap is not None and n > cap:
        # a collect bounded with limit(cap+1) only proves "> cap" — do
        # not report the truncated count as the actual size (review r5)
        size = f"more than {cap}" if truncated else f"{n}"
        raise ValueError(
            f"{what}: dictionary/statistic has {size} entries, over the "
            f"dense-path cap of {cap}. The dense vector form is a "
            f"bounded-vocab convenience (it collects a |V|-length fit "
            f"statistic and emits |V|-length arrays per row); for large "
            f"vocabularies use the exploded-pair scale path: {alt}. "
            f"Raise the cap explicitly (max_vocab=) only if the driver "
            f"and per-row memory budget allow it."
        )


def token_counts(df: DataFrame, key: str, tokens_col: str) -> DataFrame:
    """(key, token, tf) pairs — CountVectorizer's statistic in exploded
    form. Diff-aware: multiplicities propagate through the explode.
    Output columns: key, token, tf.
    """
    df = with_diff(df)
    ex = df.select(key, F.explode(F.col(tokens_col)).alias("token"), DIFF)
    return (
        ex.groupBy(key, "token")
        .agg(F.sum(DIFF).alias("tf"))
        .filter(F.col("tf") != 0)
    )


def tfidf_pairs(
    df: DataFrame, key: str, tokens_col: str, *, round_to: int | None = None
) -> DataFrame:
    """tf-idf over exploded pairs: weight = tf * ln(N / df_token), where
    df_token = number of distinct docs containing the token and N = doc
    count (reference idf formula ``tfidf_transformer.rs:73-80``).

    df_token is a window count over the tf relation (one shuffle on
    token) rather than a separate aggregate + join — Catalyst does not
    common-subexpression the tf subtree across two aggregates, so the
    join formulation scanned and aggregated the input twice.
    Output: key, token, tf, weight.
    """
    from pyspark.sql import Window

    tf = token_counts(df, key, tokens_col)
    tf = tf.withColumn("__df", F.count("*").over(Window.partitionBy("token")))
    # N is diff-aware: a fully-retracted document must leave the doc
    # count (a plain select(key).distinct() would keep counting it while
    # its tokens correctly vanish from tf — incremental != batch)
    n_docs = (
        with_diff(df)
        .groupBy(key)
        .agg(F.sum(DIFF).alias("__nd"))
        .filter(F.col("__nd") > 0)
        .agg(F.count("*").alias("__n"))
    )
    idf = F.log(F.col("__n").cast("double") / F.col("__df"))
    out = (
        tf.join(F.broadcast(n_docs), how="cross")
        .withColumn("weight", F.col("tf") * idf)
    )
    if round_to is not None:
        # decimal-places convention, rounding the WEIGHT — the same
        # quantity streaming/tfidf.tfidf_from_counts rounds. Rounding
        # the idf first (tf * round(idf)) diverged from the streaming
        # twin in the last decimal for every tf >= 2.
        out = out.withColumn("weight", F.round("weight", round_to))
    return out.select(key, "token", "tf", "weight")


class CountVectorizer:
    """Dense bag-of-words vectors (reference
    ``count_vectorizer.rs:25-69``): fit builds a token dictionary with
    the reference's overprovisioned length policy; transform emits a
    dense count (or 0/1) vector per row. Requires a row key column (the
    reference keys by row_id).
    """

    def __init__(
        self,
        binary: bool = False,
        order: str = "sorted",
        max_vocab: int | None = DENSE_VOCAB_CAP,
    ):
        self.binary = binary
        self.order = order
        self.max_vocab = max_vocab
        self.vocab_: DataFrame | None = None
        self.vec_len_: int | None = None

    def fit(self, df: DataFrame, tokens_col: str) -> "CountVectorizer":
        ex = with_diff(df).select(
            F.explode(F.col(tokens_col)).alias("token"), DIFF
        )
        self.vocab_ = fit_dictionary(ex, "token", self.order)
        n = self.vocab_.count()
        _check_dense_cap(
            int(n),
            self.max_vocab,
            "CountVectorizer.fit",
            "token_counts(df, key, tokens_col) + fit_dictionary",
        )
        self.vec_len_ = overprovisioned_len(max(int(n), 1))
        return self

    def transform(self, df: DataFrame, key: str, tokens_col: str, out: str) -> DataFrame:
        tf = token_counts(df, key, tokens_col)
        hits = tf.join(F.broadcast(self.vocab_), on="token", how="inner")
        if self.binary:
            # DD distinct semantics: presence = NET-POSITIVE count (a
            # net-negative tf must not light the bit)
            hits = hits.filter(F.col("tf") > 0)
        val = F.lit(1.0) if self.binary else F.col("tf").cast("double")
        entries = hits.groupBy(key).agg(
            F.map_from_entries(
                F.collect_list(F.struct(F.col("__idx"), val.alias("v")))
            ).alias("__m")
        )
        vec = F.transform(
            F.sequence(F.lit(0), F.lit(self.vec_len_ - 1)),
            lambda i: F.coalesce(
                F.element_at(F.col("__m"), i.cast("long")), F.lit(0.0)
            ),
        )
        return (
            df.join(entries, on=key, how="left")
            .withColumn(out, vec)
            .drop("__m")
        )

    def fit_transform(self, df, key, tokens_col, out):
        return self.fit(df, tokens_col).transform(df, key, tokens_col, out)


class TfidfTransformer:
    """Re-weights CountVectorizer vectors: ``tfidf = tf * ln(N / df)``,
    0 where df = 0 or tf = 0 (reference ``tfidf_transformer.rs:53-87``).

    Presence semantics: the reference's fit marks a dimension as present
    in a document when the value is *zero* (inverted epsilon test at
    ``:36-38`` — a reference bug). Default here is the correct
    ``tf != 0``; pass ``invert_presence=True`` to replicate the
    reference bit-for-bit.
    """

    def __init__(
        self,
        *,
        invert_presence: bool = False,
        round_to: int | None = None,
        max_vocab: int | None = DENSE_VOCAB_CAP,
    ):
        self.invert_presence = invert_presence
        self.round_to = round_to
        self.max_vocab = max_vocab
        self.df_: DataFrame | None = None  # (pos, __df, __n)

    def fit(self, df: DataFrame, vec_col: str) -> "TfidfTransformer":
        df = with_diff(df)
        ex = df.select(
            F.posexplode(F.col(vec_col)).alias("__pos", "__tf"), DIFF
        )
        present = (
            (F.col("__tf") == 0.0) if self.invert_presence else (F.col("__tf") != 0.0)
        )
        per_pos = ex.groupBy("__pos").agg(
            F.sum(F.when(present, F.col(DIFF)).otherwise(F.lit(0))).alias("__df"),
            F.sum(DIFF).alias("__n"),
        )
        # COLLECT the fit statistic (vec_len rows — the repo's fit-time
        # convention): an uncollected df_ re-executes the whole
        # posexplode+aggregate upstream subplan on every transform
        # action. The limit(cap+1) bounds the collect itself, so an
        # over-cap vector length raises instead of OOMing the driver.
        cap = self.max_vocab
        rows = (per_pos.limit(cap + 1) if cap is not None else per_pos).collect()
        if cap is not None and len(rows) > cap:
            _check_dense_cap(
                len(rows),
                cap,
                "TfidfTransformer.fit",
                "tfidf_pairs(df, key, tokens_col)",
                truncated=True,
            )
        self.df_ = df.sparkSession.createDataFrame(
            [(int(r["__pos"]), int(r["__df"]), int(r["__n"])) for r in rows],
            "__pos int, __df bigint, __n bigint",
        )
        return self

    def transform(self, df: DataFrame, key: str, vec_col: str, out: str) -> DataFrame:
        ex = df.select(key, F.posexplode(F.col(vec_col)).alias("__pos", "__tf"))
        w = (
            F.when(
                (F.col("__df") > 0) & (F.col("__tf") != 0.0),
                F.col("__tf") * F.log(F.col("__n").cast("double") / F.col("__df")),
            )
            .otherwise(F.lit(0.0))
        )
        if self.round_to is not None:
            # decimal places on the OUTPUT weight (the same convention
            # as tfidf_pairs / streaming tfidf; the old code rounded the
            # document-frequency statistic to the nearest 10^round_to,
            # which zeroed every weight for any realistic setting)
            w = F.round(w, self.round_to)
        weighted = (
            ex.join(F.broadcast(self.df_), on="__pos", how="left")
            .withColumn("__w", w)
        )
        rebuilt = weighted.groupBy(key).agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("__pos"), F.col("__w")))
            ).alias("__pw")
        )
        vec = F.transform(F.col("__pw"), lambda s: s.getField("__w"))
        return df.join(rebuilt, on=key, how="left").withColumn(out, vec).drop("__pw")

    def fit_transform(self, df, key, vec_col, out):
        return self.fit(df, vec_col).transform(df, key, vec_col, out)


class HashVectorizer:
    """Hashing-trick vectorizer (reference
    ``hash_vectorizer.rs:21-48``): stateless, ``bucket = hash(token) %
    n_features``, count or binary. Fit is a no-op (``:23-24``). Uses
    Spark's murmur3 ``F.hash`` (the reference uses Rust's DefaultHasher;
    bucket assignments differ across engines by construction — semantics,
    not bytes, are the parity surface here).
    """

    def __init__(self, n_features: int, binary: bool = False):
        self.n_features = int(n_features)
        self.binary = binary

    def fit(self, df: DataFrame, tokens_col: str) -> "HashVectorizer":
        return self

    def bucket(self, token: Column) -> Column:
        return F.pmod(F.hash(token), F.lit(self.n_features)).cast("long")

    def transform(self, df: DataFrame, key: str, tokens_col: str, out: str) -> DataFrame:
        df_ = with_diff(df)
        # NULL tokens are not features: F.hash(NULL) falls back to the
        # seed (42), which silently routed every NULL token in the
        # corpus into ONE phantom hot bucket — CountVectorizer drops
        # NULLs (fit_dictionary: "NULL is not a category"), so must this
        ex = df_.select(
            key, F.explode(F.col(tokens_col)).alias("token"), DIFF
        ).filter(F.col("token").isNotNull())
        per_bucket = (
            ex.withColumn("__b", self.bucket(F.col("token")))
            .groupBy(key, "__b")
            .agg(F.sum(DIFF).alias("__cnt"))
            .filter(F.col("__cnt") != 0)  # a fully-retracted bucket is absent
        )
        if self.binary:
            # presence = net-positive, like CountVectorizer/distinct
            per_bucket = per_bucket.filter(F.col("__cnt") > 0)
        val = F.lit(1.0) if self.binary else F.col("__cnt").cast("double")
        entries = per_bucket.groupBy(key).agg(
            F.map_from_entries(
                F.collect_list(F.struct(F.col("__b"), val.alias("v")))
            ).alias("__m")
        )
        vec = F.transform(
            F.sequence(F.lit(0), F.lit(self.n_features - 1)),
            lambda i: F.coalesce(
                F.element_at(F.col("__m"), i.cast("long")), F.lit(0.0)
            ),
        )
        return df.join(entries, on=key, how="left").withColumn(out, vec).drop("__m")

    def fit_transform(self, df, key, tokens_col, out):
        return self.transform(df, key, tokens_col, out)
