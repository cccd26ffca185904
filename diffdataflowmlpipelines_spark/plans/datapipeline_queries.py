"""Training-data-pipeline queries (dedup / similarity / text analysis /
multimodal) — the beyond-the-reference operator set, each with a DuckDB
oracle where SQL can express it (multimodal and LSH-ANN get rows-only
checks; their correctness is pinned by pytest instead).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from diffdataflowmlpipelines_spark.functions.dedup import (
    MERSENNE_P,
    _minhash_params,
    exact_dedup,
    jaccard_pairs,
    minhash_signatures,
    simhash,
)
from diffdataflowmlpipelines_spark.functions.similarity import cosine_topk, lsh_topk
from diffdataflowmlpipelines_spark.functions.text import (
    STOPWORDS,
    quality_features,
    simple_language_id,
    tokenize,
    word_fingerprint,
)
from diffdataflowmlpipelines_spark.plans.reference_queries import (
    _DOC_TOKENS_SQL,
    load,
    q,
)

_TOKS_SQL = "list_filter(string_split_regex(trim(text), '\\s+'), t -> t <> '')"


def _tokenized_docs(spark, sf_dir):
    return load(spark, sf_dir, "documents").withColumn("toks", tokenize("text"))


# --- dedup -----------------------------------------------------------------

@q(
    "d1_exact_dedup",
    """
    SELECT md5(CONCAT(CAST(lang AS VARCHAR), chr(1), CAST(source AS VARCHAR)))
             AS content_hash,
           MIN(doc_id) AS keep_id,
           CAST(COUNT(*) AS BIGINT) AS n_dups
    FROM documents GROUP BY content_hash
    """,
)
def d1_exact_dedup(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    return exact_dedup(docs, "doc_id", ["lang", "source"])


def _minhash_sql(n_hashes: int) -> str:
    params = _minhash_params(n_hashes)
    mins = ",\n           ".join(
        f"MIN(({a} * h + {b}) % {MERSENNE_P}) AS m{i}"
        for i, (a, b) in enumerate(params)
    )
    return f"""
    WITH toks AS (SELECT doc_id, {_TOKS_SQL} AS t FROM documents),
    shingles AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(range(1, len(t) - 1),
                                   i -> t[i] || chr(1) || t[i+1] || chr(1) || t[i+2])) AS s
      FROM toks WHERE len(t) >= 3
    ),
    hashed AS (
      SELECT doc_id,
             CAST(CONCAT('0x', substr(md5(s), 1, 15)) AS BIGINT)
               % {MERSENNE_P} AS h
      FROM shingles
    )
    SELECT doc_id, {mins}
    FROM hashed GROUP BY doc_id
    """


@q("d2_minhash_signatures", _minhash_sql(8))
def d2_minhash_signatures(spark, sf_dir):
    docs = _tokenized_docs(spark, sf_dir)
    sigs = minhash_signatures(docs, "doc_id", "toks", n_hashes=8, shingle_n=3)
    cols = [F.col("sig")[i].alias(f"m{i}") for i in range(8)]
    return sigs.select("doc_id", *cols)


@q(
    "d3_jaccard_pairs",
    f"""
    WITH toks AS (SELECT doc_id, {_TOKS_SQL} AS t FROM documents),
    shingles AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(range(1, len(t) - 1),
                                   i -> t[i] || chr(1) || t[i+1] || chr(1) || t[i+2])) AS s
      FROM toks WHERE len(t) >= 3
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM shingles GROUP BY doc_id),
    inter AS (
      SELECT l.doc_id AS a, r.doc_id AS b, COUNT(*) AS i
      FROM shingles l JOIN shingles r USING (s)
      WHERE l.doc_id < r.doc_id
      GROUP BY a, b
    )
    SELECT a, b, ROUND(i / (sa.sz + sb.sz - i), 6) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = a
    JOIN sizes sb ON sb.doc_id = b
    WHERE i / (sa.sz + sb.sz - i) >= 0.1
    """,
)
def d3_jaccard_pairs(spark, sf_dir):
    docs = _tokenized_docs(spark, sf_dir)
    return jaccard_pairs(docs, "doc_id", "toks", threshold=0.1, shingle_n=3)


def _simhash_sql(bits: int) -> str:
    sums = ",\n             ".join(
        f"SUM(CASE WHEN (h >> {b}) & 1 = 1 THEN tf ELSE -tf END) AS b{b}"
        for b in range(bits)
    )
    recon = " + ".join(
        f"CASE WHEN b{b} > 0 THEN {1 << b} ELSE 0 END" for b in range(bits)
    )
    return f"""
    WITH tf AS (
      SELECT doc_id, token, COUNT(*) AS tf
      FROM ({_DOC_TOKENS_SQL}) GROUP BY doc_id, token
    ),
    hashed AS (
      SELECT doc_id, tf,
             CAST(CONCAT('0x', substr(md5(token), 1, 15)) AS BIGINT) AS h
      FROM tf
    ),
    bitsums AS (
      SELECT doc_id, {sums}
      FROM hashed GROUP BY doc_id
    )
    SELECT doc_id, CAST({recon} AS BIGINT) AS simhash FROM bitsums
    """


@q("d4_simhash", _simhash_sql(32))
def d4_simhash(spark, sf_dir):
    docs = _tokenized_docs(spark, sf_dir)
    return simhash(docs, "doc_id", "toks", bits=32)


# --- similarity search -------------------------------------------------------

@q(
    "s1_cosine_topk",
    """
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nn
          FROM e),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             ROUND(list_sum(list_transform(range(1, len(q.v) + 1),
                                           i -> q.v[i] * c.v[i]))
                   / (q.nn * c.nn), 9) AS cosine
      FROM n q JOIN n c ON q.vec_id <> c.vec_id
      WHERE q.vec_id < 16
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id) AS rank
      FROM scored
    )
    SELECT query_id, neighbor_id, cosine, CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= 5
    """,
)
def s1_cosine_topk(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    queries = emb.filter(F.col("vec_id") < 16)
    out = cosine_topk(emb, queries, "vec_id", "embedding", k=5)
    return out.withColumn("rank", F.col("rank").cast("long"))


def _lsh_sql(n_planes: int = 8, dim: int = 64, k: int = 5) -> str:
    """Generated oracle mirroring lsh_topk's exact arithmetic: sign-bit
    bucket from literal hyperplanes (same left-to-right fold order as
    F.aggregate), 1-bit multiprobe, exact cosine re-rank."""
    from diffdataflowmlpipelines_spark.functions.similarity import hyperplanes

    planes = hyperplanes(dim, n_planes, seed=42)
    bits = " + ".join(
        "(CASE WHEN ("
        + " + ".join(f"v[{j + 1}] * ({planes[i][j]!r})" for j in range(dim))
        + f") >= 0 THEN {1 << i} ELSE 0 END)"
        for i in range(n_planes)
    )
    probes = ", ".join(["bucket"] + [f"xor(bucket, {1 << i})" for i in range(n_planes)])
    return f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nn
          FROM e),
    sig AS (SELECT vec_id, v, nn, {bits} AS bucket FROM n),
    q AS (SELECT vec_id AS query_id, v AS qv, nn AS qn,
                 unnest([{probes}]) AS bucket
          FROM sig WHERE vec_id < 16),
    cand AS (SELECT DISTINCT q.query_id, c.vec_id AS neighbor_id,
                    ROUND(list_sum(list_transform(range(1, {dim} + 1),
                                                  i -> q.qv[i] * c.v[i]))
                          / (q.qn * c.nn), 9) AS cosine
             FROM q JOIN sig c USING (bucket)
             WHERE q.query_id <> c.vec_id),
    ranked AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                            ORDER BY cosine DESC, neighbor_id)
                         AS rank
               FROM cand)
    SELECT query_id, neighbor_id, cosine, CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= {k}
    """


@q("s2_lsh_ann_topk", _lsh_sql())
def s2_lsh_ann_topk(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    queries = emb.filter(F.col("vec_id") < 16)
    out = lsh_topk(emb, queries, "vec_id", "embedding", k=5, n_planes=8, dim=64)
    return out.withColumn("rank", F.col("rank").cast("long"))


# --- text analysis -----------------------------------------------------------

_STOP_SQL = "[" + ", ".join(f"'{w}'" for w in STOPWORDS) + "]"


@q(
    "t1_quality_features",
    f"""
    WITH t AS (SELECT doc_id, text, {_TOKS_SQL} AS toks FROM documents)
    SELECT doc_id,
           CAST(LENGTH(text) AS BIGINT) AS n_chars,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           ROUND((LENGTH(text) - len(toks) + 1)
                 / GREATEST(len(toks), 1), 6) AS mean_token_len,
           ROUND((LENGTH(text) -
                  LENGTH(regexp_replace(text, '[^a-zA-Z0-9_ ]', '', 'g')))
                 / GREATEST(LENGTH(text), 1), 6) AS punct_ratio,
           ROUND(len(list_filter(toks,
                                 x -> list_contains({_STOP_SQL}, lower(x))))
                 / GREATEST(len(toks), 1), 6) AS stopword_ratio,
           ROUND(LENGTH(regexp_replace(text, '[^A-Za-z]', '', 'g'))
                 / GREATEST(LENGTH(text), 1), 6) AS alpha_ratio
    FROM t
    """,
)
def t1_quality_features(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    feats = quality_features("text")
    return docs.select(
        "doc_id",
        feats["n_chars"].alias("n_chars"),
        feats["n_tokens"].alias("n_tokens"),
        F.round(feats["mean_token_len"], 6).alias("mean_token_len"),
        F.round(feats["punct_ratio"], 6).alias("punct_ratio"),
        F.round(feats["stopword_ratio"], 6).alias("stopword_ratio"),
        F.round(feats["alpha_ratio"], 6).alias("alpha_ratio"),
    )


@q(
    "t2_language_id",
    f"""
    WITH t AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents)
    SELECT doc_id,
           CASE WHEN len(list_filter(toks,
                         x -> list_contains({_STOP_SQL}, lower(x))))
                     / GREATEST(len(toks), 1) >= 0.08
                THEN 'en' ELSE 'unknown' END AS lang_pred
    FROM t
    """,
)
def t2_language_id(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    return docs.select("doc_id", simple_language_id("text").alias("lang_pred"))


@q(
    "t3_fingerprint",
    f"""
    WITH t AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents)
    SELECT doc_id,
           list_reduce(
             list_prepend(CAST(0 AS BIGINT),
               list_transform(toks,
                 w -> CAST(97 * LENGTH(w) + ascii(SUBSTRING(w, 1, 1)) AS BIGINT))),
             (acc, x) -> (acc * 31 + x) % 1000000007) AS fp
    FROM t
    """,
)
def t3_fingerprint(spark, sf_dir):
    docs = _tokenized_docs(spark, sf_dir)
    return docs.select("doc_id", word_fingerprint("toks").alias("fp"))


# --- multimodal (rows-only: no SQL surface for binary decode) ----------------

@q("m1_media_features")
def m1_media_features(spark, sf_dir):
    from diffdataflowmlpipelines_spark.functions.multimodal import (
        extract_media_features,
        synthetic_media_df,
    )

    media = synthetic_media_df(spark, 300, seed=42)
    return extract_media_features(media)


@q("m2_frame_sample_plan")
def m2_frame_sample_plan(spark, sf_dir):
    from diffdataflowmlpipelines_spark.functions.multimodal import (
        frame_sample_plan,
        synthetic_media_df,
    )

    media = synthetic_media_df(spark, 300, seed=42)
    return frame_sample_plan(media, every_ms=5000)
