"""Corpus-trained n-gram language-model scoring — the CCNet-style
"perplexity filter" stage of a web-scale curation pipeline (CCNet /
Wenzek et al. 2020 filter documents by LM score; here the LM is an
add-one-smoothed bigram model trained ON the corpus itself, so the
whole operator is closed over its input and oracle-checkable).

Beyond-reference operator: the reference's text surface is tokenize-only
(``src/feature_encoders/feature_extraction/utils.rs:3-9``); this adds
the statistical-LM scoring stage on top.

100-TB shape:
  * the tokenized corpus is materialized ONCE (``localCheckpoint`` —
    the single-node analog of staging tokens to parquet between the
    count and score passes; without it Catalyst re-scans the base table
    under each of the three aggregation subtrees),
  * bigram/unigram count tables are plain hash aggregations (one
    shuffle each, map-side partial),
  * scoring is two hash joins keyed on the n-gram — the count tables
    are corpus-vocabulary-sized, so this is a genuine shuffle join, not
    a broadcast; frequent-bigram skew is bounded because the count
    table has ONE row per bigram (the probe side fans out, AQE skew
    handling applies),
  * the vocabulary size V is a single bounded aggregate collected at
    plan-build time (same convention as the encoders' fit statistics).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from diffdataflowmlpipelines_spark.functions.dedup import SEP
from diffdataflowmlpipelines_spark.functions.text import tokenize


def _bigram_structs(toks: Column) -> Column:
    """Array of (w1, pair) structs for adjacent token pairs; empty for
    docs shorter than 2 tokens. ``pair = w1 || SEP || w2`` (repo-wide
    chr(1) separator convention)."""
    n = F.size(toks)
    pairs = F.zip_with(
        F.slice(toks, 1, n - 1),
        F.slice(toks, 2, n - 1),
        lambda a, b: F.struct(
            a.alias("w1"), F.concat(a, F.lit(SEP), b).alias("pair")
        ),
    )
    return F.when(n >= 2, pairs).otherwise(
        F.array().cast("array<struct<w1:string,pair:string>>")
    )


def bigram_lm_score(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Score every document by its average add-one-smoothed bigram
    log-probability under the corpus's own bigram distribution:

        score(d) = avg over bigrams (w1,w2) of d of
                   ln( (count(w1,w2) + 1) / (count(w1) + V) )

    where counts are corpus-wide and V is the distinct-unigram
    vocabulary size. Returns (id_col, n_bigrams, avg_logprob) for every
    input document; documents with < 2 tokens get n_bigrams = 0 and a
    NULL score. Higher (less negative) = more typical of the corpus —
    the CCNet keep signal.
    """
    toks = docs.select(id_col, tokenize(text_col).alias("toks")).localCheckpoint(
        eager=True
    )

    bg = toks.select(
        id_col, F.explode(_bigram_structs(F.col("toks"))).alias("s")
    ).select(id_col, F.col("s.w1").alias("w1"), F.col("s.pair").alias("pair"))
    cb = bg.groupBy("pair").agg(F.count("*").alias("cb"))
    cu = (
        toks.select(F.explode("toks").alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("cu"))
    )
    # vocabulary size: bounded fit statistic (|V| rows aggregated to 1)
    vocab_size = cu.count()

    scored = (
        bg.join(cb, "pair")
        .join(cu, bg["w1"] == cu["w"])
        .select(
            id_col,
            F.log(
                (F.col("cb") + F.lit(1.0))
                / (F.col("cu") + F.lit(float(vocab_size)))
            ).alias("lp"),
        )
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_bigrams"),
            F.avg("lp").alias("avg_lp"),
        )
    )
    return (
        toks.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            F.round("avg_lp", 6).alias("avg_logprob"),
        )
    )
