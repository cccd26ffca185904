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
    duplicated_spans,
    exact_dedup,
    jaccard_pairs,
    minhash_lsh_candidates,
    minhash_signatures_rowwise,
    ngram_contamination,
    simhash,
)
from diffdataflowmlpipelines_spark.functions.sampling import stratified_sample
from diffdataflowmlpipelines_spark.functions.similarity import cosine_topk, lsh_topk
from diffdataflowmlpipelines_spark.functions.text import (
    STOPWORDS,
    duplicate_ngram_stats,
    gopher_quality_filter,
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
    # row-wise form: a pure projection (zero shuffle) — bit-identical to
    # the explode+groupBy form (pytest parity) and to the SQL oracle
    docs = _tokenized_docs(spark, sf_dir)
    sigs = minhash_signatures_rowwise(
        docs, "doc_id", "toks", n_hashes=8, shingle_n=3
    )
    cols = [F.col("sig")[i].alias(f"m{i}") for i in range(8)]
    return sigs.select("doc_id", *cols)


def _lsh_bands_cte(n_hashes: int = 8, bands: int = 4) -> str:
    """CTE block up to band buckets: minhash signatures (same literal
    (a,b) params as the Spark side) banded into (band, bucket) rows."""
    params = _minhash_params(n_hashes)
    r = n_hashes // bands
    mins = ",\n           ".join(
        f"MIN(({a} * h + {b}) % {MERSENNE_P}) AS m{i}"
        for i, (a, b) in enumerate(params)
    )
    band_sel = "\n      UNION ALL\n      ".join(
        f"SELECT doc_id, {i} AS band, CONCAT("
        + ", ',', ".join(f"CAST(m{i * r + j} AS VARCHAR)" for j in range(r))
        + ") AS bucket FROM sigs"
        for i in range(bands)
    )
    return f"""
    toks AS (SELECT doc_id, {_TOKS_SQL} AS t FROM documents),
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
    ),
    sigs AS (SELECT doc_id, {mins} FROM hashed GROUP BY doc_id),
    bands AS (
      {band_sel}
    )"""


def _lsh_jaccard_cte(n_hashes: int = 8, bands: int = 4) -> str:
    """Shared CTE block replicating the Spark LSH-pruned Jaccard scale
    path: band buckets, candidate pairs from bucket equality, exact
    intersection restricted to candidate pairs."""
    return f"""{_lsh_bands_cte(n_hashes, bands)},
    cand AS (
      SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
      FROM bands l JOIN bands r ON l.band = r.band AND l.bucket = r.bucket
      WHERE l.doc_id < r.doc_id
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM shingles GROUP BY doc_id),
    inter AS (
      SELECT c.a, c.b, COUNT(*) AS i
      FROM cand c
      JOIN shingles sa2 ON sa2.doc_id = c.a
      JOIN shingles sb2 ON sb2.doc_id = c.b AND sb2.s = sa2.s
      GROUP BY c.a, c.b
    )"""


def _lsh_jaccard_pairs(spark, sf_dir, *, threshold: float, n_hashes: int = 8,
                       bands: int = 4):
    """Spark side of the LSH-pruned Jaccard scale path (shared by
    d3/d6): signatures -> band-bucket candidates -> candidate-pair-
    driven exact verify."""
    docs = _tokenized_docs(spark, sf_dir)
    sigs = minhash_signatures_rowwise(docs, "doc_id", "toks",
                                      n_hashes=n_hashes, shingle_n=3)
    cand = minhash_lsh_candidates(sigs, "doc_id", bands=bands,
                                  sig_len=n_hashes)
    return jaccard_pairs(
        docs, "doc_id", "toks", threshold=threshold, shingle_n=3,
        candidates=cand,
    )


@q(
    "d3_jaccard_pairs",
    f"""
    WITH {_lsh_jaccard_cte()}
    SELECT a, b, ROUND(i / (sa.sz + sb.sz - i), 6) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = a
    JOIN sizes sb ON sb.doc_id = b
    WHERE i / (sa.sz + sb.sz - i) >= 0.1
    """,
)
def d3_jaccard_pairs(spark, sf_dir):
    # the LSH-pruned scale path (candidate generation is a bucket
    # equi-join, verify is candidate-pair-driven); the oracle replicates
    # the banding with the same literal hash params, so pruning is part
    # of the compared semantics.
    return _lsh_jaccard_pairs(spark, sf_dir, threshold=0.1)


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


def _ivf_sql(n_centroids: int = 8, nprobe: int = 2, k: int = 5) -> str:
    """Mirror of ivf_topk with the same deterministic centroid init
    (lowest-key vectors) and the same rounding/tie-break discipline."""
    dot = (
        "ROUND(list_sum(list_transform(range(1, len({a}) + 1), "
        "i -> {a}[i] * {b}[i])) / ({an} * {bn}), 9)"
    )
    c_asg = dot.format(a="c.v", b="ct.cv", an="c.nn", bn="ct.cn")
    c_probe = dot.format(a="q.v", b="ct.cv", an="q.nn", bn="ct.cn")
    c_cand = dot.format(a="p.qv", b="a.cv2", an="p.qn", bn="a.cn2")
    return f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nn
          FROM e),
    cent AS (SELECT vec_id AS cid, v AS cv, nn AS cn FROM n
             WHERE vec_id < {n_centroids}),
    asg AS (
      SELECT neighbor_id, cv2, cn2, cid FROM (
        SELECT c.vec_id AS neighbor_id, c.v AS cv2, c.nn AS cn2, ct.cid,
               ROW_NUMBER() OVER (PARTITION BY c.vec_id
                                  ORDER BY {c_asg} DESC, ct.cid) AS r
        FROM n c CROSS JOIN cent ct
      ) WHERE r = 1
    ),
    probe AS (
      SELECT query_id, qv, qn, cid FROM (
        SELECT q.vec_id AS query_id, q.v AS qv, q.nn AS qn, ct.cid,
               ROW_NUMBER() OVER (PARTITION BY q.vec_id
                                  ORDER BY {c_probe} DESC, ct.cid) AS r
        FROM n q CROSS JOIN cent ct WHERE q.vec_id < 16
      ) WHERE r <= {nprobe}
    ),
    cand AS (
      -- no DISTINCT: a neighbor lives in exactly one cell and probed
      -- cells are distinct, so pairs are unique by construction (the
      -- Spark side dropped its dedup shuffle for the same reason)
      SELECT p.query_id, a.neighbor_id, {c_cand} AS cosine
      FROM probe p JOIN asg a USING (cid)
      WHERE p.query_id <> a.neighbor_id
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id) AS rank
      FROM cand
    )
    SELECT query_id, neighbor_id, cosine, CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= {k}
    """


def _s4_sql(n_centroids: int = 8) -> str:
    dot = (
        "ROUND(list_sum(list_transform(range(1, len({a}) + 1), "
        "i -> {a}[i] * {b}[i])) / ({an} * {bn}), 9)"
    )
    sim = dot.format(a="c.v", b="ct.cv", an="c.nn", bn="ct.cn")
    return f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nn
          FROM e),
    cent AS (SELECT vec_id AS cid, v AS cv, nn AS cn FROM n
             WHERE vec_id < {n_centroids}),
    sims AS (SELECT c.vec_id, ct.cid, {sim} AS sim
             FROM n c CROSS JOIN cent ct),
    asg AS (
      SELECT vec_id, cid, sim FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                     ORDER BY sim DESC, cid) AS r
        FROM sims
      ) WHERE r = 1
    )
    SELECT cid AS cluster_id,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           ROUND(AVG(sim), 6) AS avg_cosine,
           ROUND(MIN(sim), 6) AS min_cosine
    FROM asg GROUP BY cid
    """


def _d10_sql(n_centroids: int = 8, tau: float = 0.35) -> str:
    dot = (
        "ROUND(list_sum(list_transform(range(1, len({a}) + 1), "
        "i -> {a}[i] * {b}[i])) / ({an} * {bn}), 9)"
    )
    sim = dot.format(a="c.v", b="ct.cv", an="c.nn", bn="ct.cn")
    pcos = dot.format(a="na.v", b="nb.v", an="na.nn", bn="nb.nn")
    return f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nn
          FROM e),
    cent AS (SELECT vec_id AS cid, v AS cv, nn AS cn FROM n
             WHERE vec_id < {n_centroids}),
    sims AS (SELECT c.vec_id, ct.cid, {sim} AS sim
             FROM n c CROSS JOIN cent ct),
    asg AS (
      SELECT vec_id, cid FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                     ORDER BY sim DESC, cid) AS r
        FROM sims
      ) WHERE r = 1
    ),
    dropped AS (
      SELECT DISTINCT a.vec_id AS hi
      FROM asg a JOIN asg b ON a.cid = b.cid AND a.vec_id > b.vec_id
      JOIN n na ON na.vec_id = a.vec_id
      JOIN n nb ON nb.vec_id = b.vec_id
      WHERE {pcos} >= {tau}
    )
    SELECT asg.vec_id, asg.cid AS cluster_id,
           CAST(CASE WHEN d.hi IS NULL THEN 1 ELSE 0 END AS BIGINT) AS keep
    FROM asg LEFT JOIN dropped d ON d.hi = asg.vec_id
    """


@q("d10_semantic_dedup", _d10_sql())
def d10_semantic_dedup(spark, sf_dir):
    """SemDeDup over the embeddings table: centroid cells (default
    first-8 convention, matching s4) + within-cell pairwise cosine at
    tau=0.35; lower-vec_id representative wins. Both classes exist at
    every SF (63/500 dropped at sf0.001, 76 at sf0.01, 759/5000 at
    sf0.1)."""
    from diffdataflowmlpipelines_spark.functions.similarity import semantic_dedup

    emb = load(spark, sf_dir, "embeddings")
    return semantic_dedup(
        emb, "vec_id", "embedding", threshold=0.35, n_centroids=8
    )


@q(
    "s5_embedding_dim_stats",
    """
    SELECT dim,
           CAST(COUNT(x) AS BIGINT) AS n,
           ROUND(AVG(x), 6) AS mean,
           ROUND(STDDEV_POP(x), 6) AS std,
           ROUND(MIN(x), 6) AS "min",
           ROUND(MAX(x), 6) AS "max"
    FROM (
      SELECT u.i - 1 AS dim, CAST(embedding[u.i] AS DOUBLE) AS x
      FROM embeddings, UNNEST(generate_series(1, len(embedding))) AS u(i)
      WHERE embedding IS NOT NULL
    )
    GROUP BY dim
    """,
)
def s5_embedding_dim_stats(spark, sf_dir):
    """Per-dimension embedding statistics (dead/runaway-dim QA before
    any ANN/SemDeDup stage) — functions/similarity.embedding_dim_stats:
    one posexplode fan-out inside the scan stage, one dim-keyed
    aggregation (group count == dimensionality, map-side combined)."""
    from diffdataflowmlpipelines_spark.functions.similarity import (
        embedding_dim_stats,
    )

    return embedding_dim_stats(
        load(spark, sf_dir, "embeddings"), "embedding"
    ).withColumn("dim", F.col("dim").cast("long"))


@q("s4_cluster_profile", _s4_sql())
def s4_cluster_profile(spark, sf_dir):
    from diffdataflowmlpipelines_spark.functions.similarity import cluster_profile

    emb = load(spark, sf_dir, "embeddings")
    return cluster_profile(emb, "vec_id", "embedding", n_centroids=8)


@q("s3_ivf_ann_topk", _ivf_sql())
def s3_ivf_ann_topk(spark, sf_dir):
    from diffdataflowmlpipelines_spark.functions.similarity import ivf_topk

    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    queries = emb.filter(F.col("vec_id") < 16)
    out = ivf_topk(
        emb, queries, "vec_id", "embedding", k=5, n_centroids=8, nprobe=2
    )
    return out.withColumn("rank", F.col("rank").cast("long"))


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
    WITH d AS (SELECT doc_id, COALESCE(text, '') AS text FROM documents),
    t AS (SELECT doc_id, text, {_TOKS_SQL} AS toks FROM d)
    SELECT doc_id,
           CAST(LENGTH(text) AS BIGINT) AS n_chars,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           ROUND(COALESCE(list_sum(list_transform(toks, x -> LENGTH(x))), 0)
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


# --- t12: Gopher-style composed quality filter ------------------------------
# thresholds tuned so both classes exist at every SF (median doc ~56
# tokens, 10-99 range; min_tokens=30 fails ~2 deciles, stopword>=2 fails
# the tail). Map-only: flags fuse into the scan at 100 TB.

_T12_MIN_TOKENS = 30
_T12_MIN_STOP = 2


@q(
    "t12_gopher_filter",
    f"""
    WITH t AS (SELECT doc_id, COALESCE(text, '') AS text,
                      list_filter(string_split_regex(trim(COALESCE(text, '')),
                                                     '\\s+'), t -> t <> '')
                        AS toks
               FROM documents),
    s AS (
      SELECT doc_id,
             CAST(len(toks) AS BIGINT) AS n_tokens,
             COALESCE(list_sum(list_transform(toks, x -> LENGTH(x))), 0)::DOUBLE
               / GREATEST(len(toks), 1) AS mean_len,
             ((LENGTH(text) - LENGTH(replace(text, '#', '')))
              + (LENGTH(text) - LENGTH(replace(text, '...', ''))) / 3.0)
               / GREATEST(len(toks), 1) AS symbol_ratio,
             len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]')))::DOUBLE
               / GREATEST(len(toks), 1) AS alpha_ratio,
             CAST(len(list_intersect(list_transform(toks, x -> lower(x)),
                                     {_STOP_SQL})) AS BIGINT) AS stopword_hits
      FROM t
    ),
    f AS (
      SELECT *,
             CASE WHEN n_tokens >= {_T12_MIN_TOKENS} AND n_tokens <= 100000
                  THEN 1 ELSE 0 END AS f_len,
             CASE WHEN mean_len >= 3.0 AND mean_len <= 10.0
                  THEN 1 ELSE 0 END AS f_mean_len,
             CASE WHEN symbol_ratio <= 0.1 THEN 1 ELSE 0 END AS f_symbol,
             CASE WHEN alpha_ratio >= 0.8 THEN 1 ELSE 0 END AS f_alpha,
             CASE WHEN stopword_hits >= {_T12_MIN_STOP} THEN 1 ELSE 0 END
               AS f_stopword
      FROM s
    )
    SELECT doc_id, n_tokens, ROUND(mean_len, 6) AS mean_token_len,
           ROUND(symbol_ratio, 6) AS symbol_ratio,
           ROUND(alpha_ratio, 6) AS alpha_word_ratio,
           stopword_hits, f_len, f_mean_len, f_symbol, f_alpha, f_stopword,
           f_len * f_mean_len * f_symbol * f_alpha * f_stopword AS keep
    FROM f
    """,
)
def t12_gopher_filter(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    # stage the token array ONCE: the signal battery otherwise inlines
    # its own tokenize(coalesce(text,'')) into every token-derived
    # signal expression (multi-referenced alias -> CollapseProject
    # keeps the staging projection, so the split runs once per row)
    staged = docs.select(
        "doc_id",
        "text",
        tokenize(F.coalesce(F.col("text"), F.lit(""))).alias("__toks"),
    )
    g = gopher_quality_filter(
        "text",
        min_tokens=_T12_MIN_TOKENS,
        min_stopword_hits=_T12_MIN_STOP,
        toks=F.col("__toks"),
    )
    return staged.select("doc_id", *[c.alias(k) for k, c in g.items()])


# --- t13: CCNet-style bigram LM scoring -------------------------------------
# the LM is trained on the corpus itself (add-one-smoothed bigrams), so
# the query is closed over its input and exactly oracle-checkable.

@q(
    "t13_bigram_lm_score",
    f"""
    WITH t AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
    bg AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(toks)),
                    i -> struct_pack(w1 := toks[i],
                                     pair := toks[i] || chr(1) || toks[i+1])))
               AS s
      FROM t WHERE len(toks) >= 2
    ),
    bgf AS (SELECT doc_id, s.w1 AS w1, s.pair AS pair FROM bg),
    cb AS (SELECT pair, COUNT(*) AS cb FROM bgf GROUP BY pair),
    cu AS (SELECT w, COUNT(*) AS cu
           FROM (SELECT unnest(toks) AS w FROM t) GROUP BY w),
    v AS (SELECT COUNT(*) AS v FROM cu),
    scored AS (
      SELECT bgf.doc_id,
             ln((cb.cb + 1.0) / (cu.cu + v.v)) AS lp
      FROM bgf JOIN cb USING (pair) JOIN cu ON cu.w = bgf.w1 CROSS JOIN v
    ),
    agg AS (SELECT doc_id, COUNT(*) AS n_bigrams, AVG(lp) AS avg_lp
            FROM scored GROUP BY doc_id)
    SELECT t.doc_id,
           CAST(COALESCE(agg.n_bigrams, 0) AS BIGINT) AS n_bigrams,
           ROUND(agg.avg_lp, 6) AS avg_logprob
    FROM t LEFT JOIN agg USING (doc_id)
    """,
)
def t13_bigram_lm_score(spark, sf_dir):
    from diffdataflowmlpipelines_spark.functions.lm import bigram_lm_score

    return bigram_lm_score(load(spark, sf_dir, "documents"))


_T14_V = 16  # the synthetic corpus has 31 distinct tokens: 16 keeps both
# in-vocab and OOV classes populated at every SF


@q(
    "t14_oov_stats",
    f"""
    WITH t AS (SELECT doc_id,
                      list_filter(string_split_regex(trim(COALESCE(text, '')),
                                                     '\\s+'), x -> x <> '')
                        AS toks
               FROM documents),
    tok AS (SELECT doc_id, unnest(toks) AS w FROM t),
    cnt AS (SELECT w, COUNT(*) AS c FROM tok GROUP BY w),
    vocab AS (SELECT w FROM (
        SELECT w, ROW_NUMBER() OVER (ORDER BY c DESC, w) AS r FROM cnt
    ) WHERE r <= {_T14_V}),
    pd AS (SELECT tok.doc_id, COUNT(*) AS n,
                  SUM(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END) AS oov
           FROM tok LEFT JOIN vocab v ON v.w = tok.w
           GROUP BY tok.doc_id)
    SELECT t.doc_id,
           CAST(COALESCE(pd.n, 0) AS BIGINT) AS n_tokens,
           CAST(COALESCE(pd.oov, 0) AS BIGINT) AS n_oov,
           ROUND(COALESCE(pd.oov, 0) / GREATEST(COALESCE(pd.n, 0), 1), 6)
             AS oov_rate
    FROM t LEFT JOIN pd ON pd.doc_id = t.doc_id
    """,
)
def t14_oov_stats(spark, sf_dir):
    from diffdataflowmlpipelines_spark.functions.text import oov_stats

    return oov_stats(load(spark, sf_dir, "documents"), vocab_size=_T14_V)


@q(
    "t16_hash_split",
    """
    WITH h AS (
      SELECT doc_id,
             CAST(CONCAT('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                  AS BIGINT) % 1000000 AS hv
      FROM documents
    )
    SELECT doc_id,
           CASE WHEN hv < 900000 THEN 'train'
                WHEN hv < 950000 THEN 'val'
                ELSE 'test' END AS split
    FROM h
    """,
)
def t16_hash_split(spark, sf_dir):
    """Deterministic 90/5/5 train/val/test assignment over documents —
    map-only, fuses into the scan; the split of a given doc_id never
    changes as the corpus grows (hash-range, not ordinal)."""
    from diffdataflowmlpipelines_spark.functions.sampling import hash_split

    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        hash_split(
            "doc_id", [("train", 0.90), ("val", 0.05), ("test", 0.05)]
        ).alias("split"),
    )


_T17_MAX, _T17_OVL = 32, 8  # stride 24; docs are 10-99 tokens -> 1-4 chunks


@q(
    "t17_chunking",
    f"""
    WITH t AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
    n AS (SELECT doc_id, toks, len(toks) AS n FROM t),
    c AS (SELECT doc_id, toks,
                 CASE WHEN n <= 0 THEN 0
                      ELSE CAST(ceil(GREATEST(n - {_T17_OVL}, 1)
                                     / CAST({_T17_MAX - _T17_OVL} AS DOUBLE))
                           AS INT) END AS n_chunks
          FROM n),
    ex AS (SELECT doc_id, toks, unnest(range(n_chunks)) AS i
           FROM c WHERE n_chunks > 0)
    SELECT doc_id, CAST(i AS BIGINT) AS chunk_id,
           array_to_string(
             toks[i * {_T17_MAX - _T17_OVL} + 1 :
                  i * {_T17_MAX - _T17_OVL} + {_T17_MAX}], ' ') AS chunk_text,
           CAST(len(toks[i * {_T17_MAX - _T17_OVL} + 1 :
                         i * {_T17_MAX - _T17_OVL} + {_T17_MAX}]) AS BIGINT)
             AS n_tokens
    FROM ex
    """,
)
def t17_chunking(spark, sf_dir):
    from diffdataflowmlpipelines_spark.functions.text import chunk_documents

    return chunk_documents(
        load(spark, sf_dir, "documents"),
        max_tokens=_T17_MAX,
        overlap=_T17_OVL,
    )


# --- t15: curation pipeline v2 ----------------------------------------------
# this round's new signals composed the way a production pipeline runs
# them: Gopher quality verdict AND vocabulary-coverage gate AND exact
# fingerprint dedup, all off ONE staged tokenization (localCheckpoint).
# Per-doc verdicts are emitted separately (keep_quality/keep_oov/
# keep_dedup) plus the fused keep, so downstream can attribute drops.

_T15_MAX_OOV = 0.6
_T15_FP_PREFIX = 8  # leading-passage dedup grain: docs opening with the
# same 8 tokens are template/boilerplate dups (the corpus's planted
# shared passages, cf. d8); whole-doc fingerprints collide only at
# sf0.1, which would leave keep_dedup single-class at the compare SF


@q(
    "t15_curation_v2",
    f"""
    WITH t AS (SELECT doc_id, COALESCE(text, '') AS text,
                      list_filter(string_split_regex(trim(COALESCE(text, '')),
                                                     '\\s+'), x -> x <> '')
                        AS toks
               FROM documents),
    s AS (
      SELECT doc_id,
             CAST(len(toks) AS BIGINT) AS n_tokens,
             COALESCE(list_sum(list_transform(toks, x -> LENGTH(x))), 0)::DOUBLE
               / GREATEST(len(toks), 1) AS mean_len,
             ((LENGTH(text) - LENGTH(replace(text, '#', '')))
              + (LENGTH(text) - LENGTH(replace(text, '...', ''))) / 3.0)
               / GREATEST(len(toks), 1) AS symbol_ratio,
             len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]')))::DOUBLE
               / GREATEST(len(toks), 1) AS alpha_ratio,
             CAST(len(list_intersect(list_transform(toks, x -> lower(x)),
                                     {_STOP_SQL})) AS BIGINT) AS stopword_hits
      FROM t
    ),
    q AS (
      SELECT doc_id,
             (CASE WHEN n_tokens >= {_T12_MIN_TOKENS} AND n_tokens <= 100000
                   THEN 1 ELSE 0 END)
             * (CASE WHEN mean_len >= 3.0 AND mean_len <= 10.0
                     THEN 1 ELSE 0 END)
             * (CASE WHEN symbol_ratio <= 0.1 THEN 1 ELSE 0 END)
             * (CASE WHEN alpha_ratio >= 0.8 THEN 1 ELSE 0 END)
             * (CASE WHEN stopword_hits >= {_T12_MIN_STOP} THEN 1 ELSE 0 END)
               AS keep_quality
      FROM s
    ),
    tok AS (SELECT doc_id, unnest(toks) AS w FROM t),
    cnt AS (SELECT w, COUNT(*) AS c FROM tok GROUP BY w),
    vocab AS (SELECT w FROM (
        SELECT w, ROW_NUMBER() OVER (ORDER BY c DESC, w) AS r FROM cnt
    ) WHERE r <= {_T14_V}),
    pd AS (SELECT tok.doc_id, COUNT(*) AS n,
                  SUM(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END) AS oov
           FROM tok LEFT JOIN vocab v ON v.w = tok.w
           GROUP BY tok.doc_id),
    o AS (SELECT t.doc_id,
                 CASE WHEN ROUND(COALESCE(pd.oov, 0)
                                 / GREATEST(COALESCE(pd.n, 0), 1), 6)
                           <= {_T15_MAX_OOV} THEN 1 ELSE 0 END AS keep_oov
          FROM t LEFT JOIN pd ON pd.doc_id = t.doc_id),
    fp AS (SELECT doc_id,
                  list_reduce(
                    list_prepend(CAST(0 AS BIGINT),
                      list_transform(toks[1:{_T15_FP_PREFIX}],
                        w -> CAST(97 * LENGTH(w) + ascii(SUBSTRING(w, 1, 1))
                                  AS BIGINT))),
                    (acc, x) -> (acc * 31 + x) % 1000000007) AS fp
           FROM t),
    dd AS (SELECT doc_id,
                  CASE WHEN ROW_NUMBER() OVER (PARTITION BY fp
                                               ORDER BY doc_id) = 1
                       THEN 1 ELSE 0 END AS keep_dedup
           FROM fp)
    SELECT q.doc_id, q.keep_quality, o.keep_oov, dd.keep_dedup,
           q.keep_quality * o.keep_oov * dd.keep_dedup AS keep
    FROM q JOIN o USING (doc_id) JOIN dd USING (doc_id)
    """,
)
def t15_curation_v2(spark, sf_dir):
    """Composed curation v2 — Gopher verdict x OOV gate x fingerprint
    dedup off one staged tokenization: the documents parquet is read
    ONCE (localCheckpoint), the vocab is a bounded top-V broadcast, the
    dedup winner is a window over the fingerprint, and every other
    signal fuses into the staged scan as column expressions."""
    from pyspark.sql import Window

    from diffdataflowmlpipelines_spark.functions.text import (
        gopher_quality_filter,
        tokenize,
        word_fingerprint,
    )

    docs = load(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        F.coalesce(F.col("text"), F.lit("")).alias("text"),
        tokenize(F.coalesce(F.col("text"), F.lit(""))).alias("toks"),
    ).localCheckpoint(eager=True)

    tok = base.select("doc_id", F.explode("toks").alias("__w"))
    cnt = tok.groupBy("__w").agg(F.count(F.lit(1)).alias("__c"))
    # orderBy+limit -> TakeOrderedAndProject: the distinct-token frame
    # never funnels through a single-partition window; (count desc,
    # token asc) is a total order so this equals the rank filter
    vocab = (
        cnt.orderBy(F.col("__c").desc(), F.col("__w").asc())
        .limit(_T14_V)
        .select("__w", F.lit(1).alias("__inv"))
    )
    per_doc = (
        tok.join(F.broadcast(vocab), "__w", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.sum(
                F.when(F.col("__inv").isNull(), F.lit(1)).otherwise(F.lit(0))
            ).alias("__oov"),
        )
    )
    rate = F.round(
        F.coalesce(F.col("__oov"), F.lit(0))
        / F.greatest(F.coalesce(F.col("__n"), F.lit(0)), F.lit(1)),
        6,
    )

    g = gopher_quality_filter(
        "text",
        min_tokens=_T12_MIN_TOKENS,
        min_stopword_hits=_T12_MIN_STOP,
        # base already staged tokenize(coalesce(text, '')): the
        # token-derived signals read the checkpointed column instead of
        # re-splitting the text once per signal expression
        toks=F.col("toks"),
    )
    fpw = Window.partitionBy("__fp").orderBy("doc_id")
    flagged = (
        base.select(
            "doc_id",
            g["keep"].alias("keep_quality"),
            word_fingerprint(F.slice("toks", 1, _T15_FP_PREFIX)).alias(
                "__fp"
            ),
        )
        .withColumn(
            "keep_dedup",
            (F.row_number().over(fpw) == 1).cast("int"),
        )
    )
    return (
        flagged.join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "keep_quality",
            (rate <= F.lit(_T15_MAX_OOV)).cast("int").alias("keep_oov"),
            "keep_dedup",
        )
        .withColumn(
            "keep",
            F.col("keep_quality") * F.col("keep_oov") * F.col("keep_dedup"),
        )
    )


# --- d7: streaming near-dup candidates, batch twin -----------------------------
# the exact code path streaming/dedup.streaming_near_dup_candidates runs
# on the arriving stream (streaming=False here); event_time is derived
# deterministically from doc_id on BOTH engines so the +-30s tolerance
# window is oracle-checkable.

@q(
    "d7_near_dup_candidates",
    f"""
    WITH {_lsh_bands_cte()},
    t AS (SELECT doc_id,
                 TIMESTAMP '2024-01-01 00:00:00'
                   + to_seconds(CAST(doc_id AS BIGINT)) AS event_time
          FROM documents)
    SELECT DISTINCT l.doc_id AS a, r.doc_id AS b,
           ta.event_time AS a_time, tb.event_time AS b_time
    FROM bands l
    JOIN bands r ON l.band = r.band AND l.bucket = r.bucket
    JOIN t ta ON ta.doc_id = l.doc_id
    JOIN t tb ON tb.doc_id = r.doc_id
    WHERE l.doc_id < r.doc_id
      AND tb.event_time BETWEEN ta.event_time - INTERVAL 30 SECOND
                            AND ta.event_time + INTERVAL 30 SECOND
    """,
)
def d7_near_dup_candidates(spark, sf_dir):
    from diffdataflowmlpipelines_spark.streaming.dedup import (
        streaming_near_dup_candidates,
    )

    docs = _tokenized_docs(spark, sf_dir).withColumn(
        "event_time",
        F.lit("2024-01-01 00:00:00").cast("timestamp")
        + F.make_interval(secs=F.col("doc_id").cast("double")),
    )
    out = streaming_near_dup_candidates(
        docs, tokens_col="toks", n_hashes=8, bands=4, tolerance_s=30,
        streaming=False,
    )
    return out.dropDuplicates()


def _spans_sql(w: int, min_docs: int) -> str:
    gram = " || chr(1) || ".join(f"t[i+{j}]" if j else "t[i]" for j in range(w))
    return f"""
    WITH toks AS (SELECT doc_id, {_TOKS_SQL} AS t FROM documents),
    wins AS (
      SELECT doc_id, u.pos AS pos,
             CAST(CONCAT('0x', substr(md5(u.s), 1, 15)) AS BIGINT) AS h
      FROM (
        SELECT doc_id,
               unnest(list_transform(range(1, len(t) - {w - 2}),
                      i -> {{'pos': i - 1, 's': {gram}}})) AS u
        FROM toks WHERE len(t) >= {w}
      )
    ),
    flagged AS (
      SELECT h FROM wins GROUP BY h HAVING COUNT(DISTINCT doc_id) >= {min_docs}
    ),
    dup AS (
      SELECT doc_id, pos,
             LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
      FROM wins WHERE h IN (SELECT h FROM flagged)
    ),
    isl AS (
      SELECT doc_id, pos,
             SUM(CASE WHEN pos - prev > {w} THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY pos) AS g
      FROM dup
    )
    SELECT doc_id,
           CAST(MIN(pos) AS BIGINT) AS span_start,
           CAST(MAX(pos) + {w - 1} AS BIGINT) AS span_end,
           CAST(MAX(pos) - MIN(pos) + {w} AS BIGINT) AS span_len
    FROM isl GROUP BY doc_id, g
    """


@q("d8_duplicated_spans", _spans_sql(5, 2))
def d8_duplicated_spans(spark, sf_dir):
    """Suffix-style substring dedup: maximal cross-document repeated
    token runs (every 5-gram shared by >= 2 docs), merged per document
    via gaps-and-islands (functions/dedup.duplicated_spans) — the one
    LLM-curation operator class document-level dedup cannot express."""
    docs = _tokenized_docs(spark, sf_dir)
    return duplicated_spans(docs, "doc_id", "toks", window=5, min_docs=2)


def _d9_sql(n_bits: int = 1 << 15, k: int = 4) -> str:
    """DuckDB rebuild of the Bloom structure: the set of set bit
    positions (word packing is storage, not semantics — membership in
    the distinct-position set IS the bit-array probe). Same md5 double
    hashing as functions/bloom._h1_h2, so false positives reproduce
    exactly."""
    h1 = "CAST(CONCAT('0x', substr(md5(g), 1, 15)) AS BIGINT)"
    h2 = "CAST(CONCAT('0x', substr(md5(g), 16, 15)) AS BIGINT)"
    pos = f"({h1} % {n_bits} + i.i * ({h2} % {n_bits})) % {n_bits}"
    return f"""
    WITH toks AS (SELECT doc_id, {_TOKS_SQL} AS t FROM documents),
    grams AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, len(t) - 1),
                           i -> t[i] || chr(1) || t[i+1] || chr(1) || t[i+2])) AS gs
      FROM toks WHERE len(t) >= 3
    ),
    ii AS (SELECT unnest(range(0, {k})) AS i),
    bench AS (SELECT DISTINCT unnest(gs) AS g FROM grams WHERE doc_id % 19 = 0),
    bpos AS (SELECT DISTINCT {pos} AS p FROM bench CROSS JOIN ii i),
    corpus AS (SELECT doc_id, unnest(gs) AS g FROM grams WHERE doc_id % 19 <> 0),
    cpos AS (SELECT doc_id, g, i.i AS i, {pos} AS p FROM corpus CROSS JOIN ii i),
    hits AS (
      SELECT doc_id, g,
             SUM(CASE WHEN bp.p IS NOT NULL THEN 1 ELSE 0 END) AS nhit
      FROM cpos c LEFT JOIN bpos bp ON c.p = bp.p
      GROUP BY doc_id, g
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_ngrams,
           CAST(SUM(CASE WHEN nhit = {k} THEN 1 ELSE 0 END) AS BIGINT)
             AS n_flagged,
           ROUND(CAST(SUM(CASE WHEN nhit = {k} THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS flagged_frac
    FROM hits GROUP BY doc_id
    """


@q("d9_bloom_decontamination", _d9_sql())
def d9_bloom_decontamination(spark, sf_dir):
    """t5's constant-memory sibling: the benchmark 3-gram set folds into
    a 32768-bit Bloom filter (functions/bloom.py) and the corpus probe
    is a JOIN-FREE map-only projection — the packed words ship as one
    array literal and each gram tests its 4 positions JVM-side via
    getbit. At 100 TB this replaces a broadcast of the full bench-gram
    set with O(n_bits/8) bytes per executor; flags are a deterministic
    superset of t5's exact answer (false positives only), which the
    oracle reproduces bit-for-bit."""
    from diffdataflowmlpipelines_spark.functions.bloom import bloom_contamination

    docs = _tokenized_docs(spark, sf_dir)
    bench = docs.filter(F.col("doc_id") % 19 == 0)
    corpus = docs.filter(F.col("doc_id") % 19 != 0)
    return bloom_contamination(
        corpus, bench, "doc_id", "toks", n=3, n_bits=1 << 15, k=4
    )


# --- count-min sketch (north-star "count-min feature aggregation") -----------

def _cm_sql_parts(depth: int, width: int):
    params = _minhash_params(depth, 42)
    cell_selects = "\n      UNION ALL\n      ".join(
        f"SELECT (({a} * h + {b}) % {MERSENNE_P}) % {width} AS bucket, "
        f"{j} AS depth_j FROM hashed"
        for j, (a, b) in enumerate(params)
    )
    probe_selects = "\n      UNION ALL\n      ".join(
        f"SELECT token, {j} AS depth_j, "
        f"(({a} * h + {b}) % {MERSENNE_P}) % {width} AS bucket FROM tok_h"
        for j, (a, b) in enumerate(params)
    )
    return cell_selects, probe_selects


def _cm1_sql(depth: int = 4, width: int = 64) -> str:
    cells, _ = _cm_sql_parts(depth, width)
    return f"""
    WITH toks AS ({_DOC_TOKENS_SQL}),
    hashed AS (
      SELECT CAST(CONCAT('0x', substr(md5(token), 1, 15)) AS BIGINT)
               % {MERSENNE_P} AS h
      FROM toks WHERE token IS NOT NULL
    ),
    cells AS (
      {cells}
    )
    SELECT depth_j, bucket, CAST(COUNT(*) AS BIGINT) AS cell_count
    FROM cells GROUP BY depth_j, bucket
    """


@q("cm1_count_min_sketch", _cm1_sql())
def cm1_count_min_sketch(spark, sf_dir):
    from diffdataflowmlpipelines_spark.functions.sketches import count_min_sketch

    docs = _tokenized_docs(spark, sf_dir)
    sk = count_min_sketch(docs, "toks", depth=4, width=64, seed=42)
    return sk.withColumnRenamed("count", "cell_count")


def _cm2_sql(depth: int = 4, width: int = 64) -> str:
    cells, probes = _cm_sql_parts(depth, width)
    return f"""
    WITH toks AS ({_DOC_TOKENS_SQL}),
    hashed AS (
      SELECT CAST(CONCAT('0x', substr(md5(token), 1, 15)) AS BIGINT)
               % {MERSENNE_P} AS h
      FROM toks WHERE token IS NOT NULL
    ),
    cells AS (
      {cells}
    ),
    sketch AS (
      SELECT depth_j, bucket, COUNT(*) AS c FROM cells GROUP BY depth_j, bucket
    ),
    tok_h AS (
      SELECT token,
             CAST(CONCAT('0x', substr(md5(token), 1, 15)) AS BIGINT)
               % {MERSENNE_P} AS h
      FROM (SELECT DISTINCT token FROM toks)
    ),
    probes AS (
      {probes}
    )
    SELECT token, CAST(MIN(coalesce(s.c, 0)) AS BIGINT) AS est
    FROM probes p LEFT JOIN sketch s USING (depth_j, bucket)
    GROUP BY token
    """


def _cm3_sql(depth: int = 4, width: int = 64, threshold: int = 500) -> str:
    return (
        _cm2_sql(depth, width)
        + f"    HAVING MIN(coalesce(s.c, 0)) >= {threshold}\n"
    )


@q("cm3_heavy_hitters", _cm3_sql())
def cm3_heavy_hitters(spark, sf_dir):
    """Heavy hitters straight off the sketch: tokens whose CMS estimate
    clears the support threshold — the standard approximate top-token
    query a 100 TB corpus scan answers without a per-token exact count."""
    from diffdataflowmlpipelines_spark.functions.sketches import (
        count_min_estimate,
        count_min_sketch,
    )

    docs = _tokenized_docs(spark, sf_dir)
    sk = count_min_sketch(docs, "toks", depth=4, width=64, seed=42)
    toks = docs.select(F.explode("toks").alias("token"))
    est = count_min_estimate(sk, toks, "token", depth=4, width=64, seed=42)
    return est.filter(F.col("est") >= 500)


@q("cm2_count_min_estimate", _cm2_sql())
def cm2_count_min_estimate(spark, sf_dir):
    from diffdataflowmlpipelines_spark.functions.sketches import (
        count_min_estimate,
        count_min_sketch,
    )

    docs = _tokenized_docs(spark, sf_dir)
    sk = count_min_sketch(docs, "toks", depth=4, width=64, seed=42)
    toks = docs.select(F.explode("toks").alias("token"))
    return count_min_estimate(sk, toks, "token", depth=4, width=64, seed=42)


def _cm4_sql(p: int = 9) -> str:
    """DuckDB twin of hll_registers/hll_estimate: same md5 bucket/w
    split, same string-bit-length rho, same exact dyadic-integer sum, so
    the estimate (a literal-over-integer double) matches bit-for-bit."""
    m = 1 << p
    maxrho = 60 - p + 1
    alpha = 0.7213 / (1.0 + 1.079 / m)
    numer = alpha * float(m) * float(m) * float(2**maxrho)
    e_raw = f"{numer!r} / CAST(s AS DOUBLE)"
    return f"""
    WITH toks AS (SELECT source, unnest({_TOKS_SQL}) AS t FROM documents),
    h AS (SELECT source,
                 CAST(CONCAT('0x', substr(md5(t), 1, 15)) AS BIGINT) AS h
          FROM toks WHERE t IS NOT NULL),
    b AS (SELECT source, h % {m} AS bucket, h // {m} AS w FROM h),
    r AS (SELECT source, bucket,
            CAST(MAX(CASE WHEN w = 0 THEN {maxrho}
                     ELSE {maxrho} - length(bin(w)) END) AS BIGINT) AS rho
          FROM b GROUP BY source, bucket),
    a AS (SELECT source,
            CAST(SUM(CAST(POWER(2, {maxrho} - rho) AS BIGINT)) AS BIGINT)
              AS s_occ,
            COUNT(*) AS n_occ
          FROM r GROUP BY source),
    f AS (SELECT source,
            CAST(s_occ + ({m} - n_occ) * {2**maxrho} AS BIGINT) AS s,
            CAST({m} - n_occ AS BIGINT) AS zeros
          FROM a)
    SELECT source,
           ROUND(CASE WHEN {e_raw} <= {2.5 * m!r} AND zeros > 0
                      THEN {float(m)!r} * ln({float(m)!r} / zeros)
                      ELSE {e_raw} END, 4) AS est,
           zeros, s
    FROM f
    """


@q("cm4_hll_distinct", _cm4_sql())
def cm4_hll_distinct(spark, sf_dir):
    """Per-source approximate distinct-token counts via HyperLogLog
    (functions/sketches.hll_registers/hll_estimate): the 100-TB distinct
    query without a distinct shuffle — only m=512 registers per source
    move (map-side-combined MAX), and registers merge by MAX for
    rollups. The estimator runs in exact integer arithmetic, so even the
    approximation's value is oracle-pinned, not tolerance-checked."""
    from diffdataflowmlpipelines_spark.functions.sketches import (
        hll_estimate,
        hll_registers,
    )

    docs = _tokenized_docs(spark, sf_dir)
    toks = docs.select("source", F.explode("toks").alias("t"))
    regs = hll_registers(toks, "t", ("source",), p=9)
    return hll_estimate(regs, ("source",), p=9)


_CM5_K = 64


def _cm5_sql(k: int = _CM5_K) -> str:
    return f"""
    WITH h AS (
      SELECT event_type, value,
             CAST(CONCAT('0x', substr(md5(CAST(event_id AS VARCHAR)), 1, 15))
                  AS BIGINT) AS h
      FROM events
    ),
    s AS (
      SELECT event_type, value,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rn
      FROM h
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_sample,
           ROUND(percentile_cont(0.5) WITHIN GROUP (ORDER BY value), 6) AS p50,
           ROUND(percentile_cont(0.9) WITHIN GROUP (ORDER BY value), 6) AS p90,
           ROUND(percentile_cont(0.99) WITHIN GROUP (ORDER BY value), 6) AS p99
    FROM s WHERE rn <= {k}
    GROUP BY event_type
    """


@q("cm5_bottomk_quantiles", _cm5_sql())
def cm5_bottomk_quantiles(spark, sf_dir):
    """Per-event-type quantile estimates from the bottom-k (KMV) sketch
    (functions/sketches.bottomk_quantile_sketch): a deterministic
    uniform sample of k=64 rows per group — the mergeable quantile-
    sketch path for 100-TB inputs, where the exact a3-style percentile
    needs the full value multiset per group and the sketch needs k rows.
    Like cm4, even the approximation's value is oracle-pinned because
    the sample membership is a pure function of the md5 row hash."""
    from diffdataflowmlpipelines_spark.functions.sketches import (
        bottomk_quantile_sketch,
        bottomk_quantiles,
    )

    ev = load(spark, sf_dir, "events")
    sk = bottomk_quantile_sketch(
        ev, "value", "event_id", ("event_type",), k=_CM5_K
    )
    return bottomk_quantiles(sk, ("event_type",), quantiles=(0.5, 0.9, 0.99))


# --- multimodal --------------------------------------------------------------
# the media table is a committed parquet fixture (tools/make_fixtures.py,
# seed=42) so the DuckDB oracle reads the identical rows. The fixture
# stores payload_sha256 computed at generation time; the Spark query
# recomputes the digest from the payload bytes inside mapInPandas, so a
# hash match proves the binary column round-trips and the decode
# plumbing reads the same bytes the oracle sees.

import os as _os

MEDIA_FIXTURE = _os.path.join(
    _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))),
    "fixtures",
    "media.parquet",
)


def _m1_sql(dim: int = 16) -> str:
    """Replicates _fake_decode exactly: sha256 digest repeated to dim*4
    bytes, read as little-endian uint32 words; feature i =
    float32(word_i / uint32_max); checksum = sum(words). The feature
    signature scales each float32 (exact as double) by 1e9 and rounds to
    an integer — identical arithmetic both engines."""
    words = []
    for i in range(dim):
        off = ((4 * i) % 32) * 2 + 1  # 1-indexed hex offset into the digest
        words.append(
            "CAST(CONCAT('0x', "
            f"substr(payload_sha256, {off + 6}, 2), "
            f"substr(payload_sha256, {off + 4}, 2), "
            f"substr(payload_sha256, {off + 2}, 2), "
            f"substr(payload_sha256, {off}, 2)) AS BIGINT) AS w{i}"
        )
    sig_elems = ", ".join(
        f"CAST(CAST(ROUND(CAST(CAST(w{i} / 4294967295.0 AS FLOAT) AS DOUBLE)"
        f" * 1000000000) AS BIGINT) AS VARCHAR)"
        for i in range(dim)
    )
    checksum = " + ".join(f"w{i}" for i in range(dim))
    word_defs = ",\n             ".join(words)
    return f"""
    WITH w AS (
      SELECT media_id, kind,
             CAST(octet_length(payload) AS BIGINT) AS n_bytes,
             {word_defs}
      FROM read_parquet('{MEDIA_FIXTURE}')
    )
    SELECT media_id, kind, n_bytes,
           array_to_string([{sig_elems}], ',') AS feat_sig,
           CAST({checksum} AS BIGINT) AS feat_checksum
    FROM w
    """


@q("m1_media_features", _m1_sql())
def m1_media_features(spark, sf_dir):
    from diffdataflowmlpipelines_spark.functions.multimodal import (
        MEDIA_SCHEMA,
        extract_media_features,
    )

    media = spark.read.parquet(MEDIA_FIXTURE).select(
        *[f.name for f in MEDIA_SCHEMA.fields]
    )
    out = extract_media_features(media)
    feat_sig = F.array_join(
        F.transform(
            "features",
            lambda x: F.round(x.cast("double") * 1e9, 0).cast("long").cast("string"),
        ),
        ",",
    )
    return out.select(
        "media_id",
        "kind",
        F.col("n_bytes").cast("long").alias("n_bytes"),
        feat_sig.alias("feat_sig"),
        "feat_checksum",
    )


MEDIA_REAL_FIXTURE = _os.path.join(_os.path.dirname(MEDIA_FIXTURE), "media_real.parquet")


@q(
    "m3_real_decode",
    f"""
    SELECT media_id, kind,
           CAST(octet_length(payload) AS BIGINT) AS n_bytes,
           feat_bits, feat_checksum
    FROM read_parquet('{MEDIA_REAL_FIXTURE}')
    WHERE kind <> 'video'
    """,
)
def m3_real_decode(spark, sf_dir):
    """REAL media decode through the distributed path (VERDICT r3 item
    8): payloads are genuine 24-bit BMP images and PCM16 WAV audio,
    decoded inside mapInPandas by pure-numpy/stdlib decoders
    (functions/media_codecs.py) and featurized to float32. The oracle
    reads feature strings PINNED AT FIXTURE-GENERATION TIME (CSV of the
    float32 bit patterns — zero float formatting), so a value-hash match
    proves the executor-side decode reproduces, bit-for-bit from the raw
    binary column, what the generator computed. Video rows stay honestly
    undecodable and are filtered on both sides."""
    from diffdataflowmlpipelines_spark.functions.media_codecs import (
        decode_media_features,
    )
    from diffdataflowmlpipelines_spark.functions.multimodal import (
        MEDIA_SCHEMA,
        extract_media_features,
        features_bits_csv,
    )

    media = (
        spark.read.parquet(MEDIA_REAL_FIXTURE)
        .filter(F.col("kind") != "video")
        .select(*[f.name for f in MEDIA_SCHEMA.fields])
    )
    out = extract_media_features(media, decode_fn=decode_media_features)
    return out.select(
        "media_id",
        "kind",
        F.col("n_bytes").cast("long").alias("n_bytes"),
        features_bits_csv("features").alias("feat_bits"),
        "feat_checksum",
    )


@q(
    "m2_frame_sample_plan",
    f"""
    SELECT media_id,
           CAST(unnest(range(0, CAST(duration_ms AS BIGINT), 5000)) AS BIGINT)
             AS frame_ms
    FROM read_parquet('{MEDIA_FIXTURE}')
    WHERE kind = 'video'
    """,
)
def m2_frame_sample_plan(spark, sf_dir):
    from diffdataflowmlpipelines_spark.functions.multimodal import frame_sample_plan

    media = spark.read.parquet(MEDIA_FIXTURE)
    return frame_sample_plan(media, every_ms=5000).withColumn(
        "frame_ms", F.col("frame_ms").cast("long")
    )


# --- round-3 curation ops: decontamination, repetition, quotas ---------------

@q(
    "t5_decontamination",
    f"""
    WITH toks AS (SELECT doc_id, {_TOKS_SQL} AS t FROM documents),
    grams AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, len(t) - 1),
                           i -> t[i] || chr(1) || t[i+1] || chr(1) || t[i+2])) AS gs
      FROM toks WHERE len(t) >= 3
    ),
    bench AS (SELECT DISTINCT unnest(gs) AS g FROM grams WHERE doc_id % 19 = 0),
    corpus AS (SELECT doc_id, unnest(gs) AS g FROM grams WHERE doc_id % 19 <> 0)
    SELECT c.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_ngrams,
           CAST(SUM(CASE WHEN b.g IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_contaminated,
           ROUND(CAST(SUM(CASE WHEN b.g IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS contamination_frac
    FROM corpus c LEFT JOIN bench b USING (g)
    GROUP BY c.doc_id
    """,
)
def t5_decontamination(spark, sf_dir):
    """Benchmark decontamination: every 19th doc_id plays the held-out
    eval set; the rest of the corpus is scored by distinct-3-gram
    overlap against it (broadcast bench-set join; see
    functions/dedup.ngram_contamination for the 100-TB shape)."""
    docs = _tokenized_docs(spark, sf_dir)
    bench = docs.filter(F.col("doc_id") % 19 == 0)
    corpus = docs.filter(F.col("doc_id") % 19 != 0)
    return ngram_contamination(corpus, bench, "doc_id", "toks", n=3)


@q(
    "t6_repetition_stats",
    f"""
    WITH toks AS (SELECT doc_id, {_TOKS_SQL} AS t FROM documents),
    s AS (
      SELECT doc_id,
             CAST(CASE WHEN len(t) >= 2 THEN len(t) - 1 ELSE 0 END AS BIGINT)
               AS n_grams,
             CAST(CASE WHEN len(t) >= 2
                  THEN len(list_distinct(list_transform(range(1, len(t)),
                                         i -> t[i] || chr(1) || t[i+1])))
                  ELSE 0 END AS BIGINT) AS n_distinct
      FROM toks
    )
    SELECT doc_id, n_grams, n_distinct,
           ROUND(CAST(n_grams - n_distinct AS DOUBLE)
                 / GREATEST(n_grams, 1), 6) AS dup_frac
    FROM s
    """,
)
def t6_repetition_stats(spark, sf_dir):
    """Gopher-style duplicate-bigram fraction per document — a pure
    row-wise projection (zero shuffle; functions/text.
    duplicate_ngram_stats)."""
    docs = _tokenized_docs(spark, sf_dir)
    stats = duplicate_ngram_stats(F.col("toks"), n=2)
    return docs.select(
        "doc_id",
        stats["n_grams"].alias("n_grams"),
        stats["n_distinct"].alias("n_distinct"),
        stats["dup_frac"].alias("dup_frac"),
    )


@q(
    "t7_stratified_sample",
    """
    WITH counts AS (SELECT source, COUNT(*) AS n FROM documents GROUP BY source),
    thr AS (SELECT source,
                   GREATEST(CAST(1 AS BIGINT), CAST(10 AS BIGINT) * 1000000 // n)
                     AS t
            FROM counts)
    SELECT d.doc_id, d.source
    FROM documents d JOIN thr ON d.source IS NOT DISTINCT FROM thr.source
    WHERE CAST(CONCAT('0x', substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 15))
               AS BIGINT) % 1000000 < thr.t
    """,
)
def t7_stratified_sample(spark, sf_dir):
    """Per-source quota sampling (~10 docs/source) via the portable
    md5 hash gate — deterministic across engines/retries, map-only on
    the corpus side (functions/sampling.stratified_sample)."""
    docs = load(spark, sf_dir, "documents")
    return stratified_sample(
        docs, "source", "doc_id", target_per_stratum=10
    ).select("doc_id", "source")


from diffdataflowmlpipelines_spark.functions.packing import pack_sequences


@q(
    "t8_sequence_packing",
    f"""
    WITH toks AS (
      SELECT doc_id, source,
             CAST(len({_TOKS_SQL}) AS BIGINT) AS n_tok
      FROM documents
    ),
    c AS (
      SELECT doc_id, source, n_tok,
             SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                              ROWS UNBOUNDED PRECEDING) - n_tok AS strt
      FROM toks
    )
    SELECT source, doc_id, n_tok,
           CAST(strt // 512 AS BIGINT) AS chunk,
           CAST(strt % 512 AS BIGINT) AS chunk_offset
    FROM c
    """,
)
def t8_sequence_packing(spark, sf_dir):
    """Concat-and-split packing of the documents stream into 512-token
    training chunks per source (functions/packing.pack_sequences; the
    sharded distributed-prefix-sum twin is parity-tested in
    tests/test_packing.py)."""
    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.size(tokenize("text")).cast("long").alias("n_tok"),
    )
    return pack_sequences(docs, "doc_id", "n_tok", "source", budget=512)


# --- round-3b curation ops: PII redaction, training-mix weights -------------

from diffdataflowmlpipelines_spark.functions.sampling import mixture_weights
from diffdataflowmlpipelines_spark.functions.text import PII_PATTERNS, redact_pii

_EMAIL_PAT, _IP_PAT, _PHONE_PAT = (p for _, p, _ in PII_PATTERNS)


@q(
    "t9_pii_redaction",
    f"""
    WITH aug AS (
      SELECT doc_id,
             text || ' contact user' || CAST(doc_id AS VARCHAR)
                  || '@example.com or 10.0.0.' || CAST(doc_id % 256 AS VARCHAR)
                  || ' tel 555-867-530' || CAST(doc_id % 10 AS VARCHAR) AS t0
      FROM documents
    ),
    s1 AS (SELECT doc_id,
                  CAST(COALESCE(len(regexp_extract_all(t0, '{_EMAIL_PAT}')), 0)
                       AS BIGINT) AS n_email,
                  regexp_replace(t0, '{_EMAIL_PAT}', '<EMAIL>', 'g') AS t1
           FROM aug),
    s2 AS (SELECT doc_id, n_email,
                  CAST(COALESCE(len(regexp_extract_all(t1, '{_IP_PAT}')), 0)
                       AS BIGINT) AS n_ipv4,
                  regexp_replace(t1, '{_IP_PAT}', '<IP>', 'g') AS t2
           FROM s1),
    s3 AS (SELECT doc_id, n_email, n_ipv4,
                  CAST(COALESCE(len(regexp_extract_all(t2, '{_PHONE_PAT}')), 0)
                       AS BIGINT) AS n_phone,
                  regexp_replace(t2, '{_PHONE_PAT}', '<PHONE>', 'g') AS redacted
           FROM s2)
    SELECT doc_id, n_email, n_ipv4, n_phone, redacted FROM s3
    """,
)
def t9_pii_redaction(spark, sf_dir):
    """PII scrub (emails / IPv4 / phone numbers) — map-only projection,
    JVM regex, zero shuffle. The corpus is deterministically augmented
    with synthetic PII per doc_id so every row exercises all three
    patterns on both engines (functions/text.redact_pii)."""
    docs = load(spark, sf_dir, "documents")
    aug = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or 10.0.0."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(" tel 555-867-530"),
        (F.col("doc_id") % 10).cast("string"),
    )
    r = redact_pii(aug)
    return docs.select(
        "doc_id",
        r["n_email"].alias("n_email"),
        r["n_ipv4"].alias("n_ipv4"),
        r["n_phone"].alias("n_phone"),
        r["redacted"].alias("redacted"),
    )


@q(
    "t10_domain_mixture",
    """
    WITH c AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n
               FROM documents GROUP BY source),
    p AS (SELECT source, n, POWER(CAST(n AS DOUBLE), 0.5) AS pw FROM c),
    t AS (SELECT SUM(pw) AS tot FROM p)
    SELECT source, n, ROUND(pw / tot, 6) AS weight,
           CAST(ROUND(ROUND(pw / tot, 6) * 1000000, 0) AS BIGINT) AS target_rows
    FROM p, t
    """,
)
def t10_domain_mixture(spark, sf_dir):
    """Temperature-scaled (alpha=0.5) training-mix weights per source —
    the multinomial upweighting rule for small domains; 1-row total
    broadcast back, no data-row shuffle (functions/sampling.
    mixture_weights)."""
    docs = load(spark, sf_dir, "documents")
    return mixture_weights(docs, "source", alpha=0.5, budget_rows=1_000_000)


# --- t11: the full curation pipeline, composed --------------------------------
# The "switch your pipeline to this engine" showcase: quality filter ->
# fingerprint dedup -> benchmark decontamination -> sequence packing,
# chained through the same library functions the individual queries use,
# verified end-to-end by one oracle. Each stage keeps its standalone
# scale shape (map-only filters, window dedup on the fingerprint key,
# broadcast bench set, per-stratum packing window).

from pyspark.sql import Window as _W

from diffdataflowmlpipelines_spark.functions.packing import pack_sequences
from diffdataflowmlpipelines_spark.functions.text import word_fingerprint


@q(
    "t11_corpus_pipeline",
    f"""
    WITH toks AS (SELECT doc_id, source, {_TOKS_SQL} AS t FROM documents),
    q AS (SELECT * FROM toks WHERE len(t) >= 5),
    fp AS (SELECT doc_id, source, t,
             list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(t,
                 w -> CAST(97 * LENGTH(w) + ascii(SUBSTRING(w, 1, 1)) AS BIGINT))),
               (acc, x) -> (acc * 31 + x) % 1000000007) AS fp
           FROM q),
    dd AS (SELECT doc_id, source, t FROM fp
           QUALIFY ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) = 1),
    bgrams AS (SELECT DISTINCT unnest(list_distinct(list_transform(
                 range(1, len(t) - 1),
                 i -> t[i] || chr(1) || t[i+1] || chr(1) || t[i+2]))) AS g
               FROM toks WHERE len(t) >= 3 AND doc_id % 19 = 0),
    cg AS (SELECT doc_id, unnest(list_distinct(list_transform(
                 range(1, len(t) - 1),
                 i -> t[i] || chr(1) || t[i+1] || chr(1) || t[i+2]))) AS g
           FROM dd WHERE doc_id % 19 <> 0),
    contam AS (SELECT c.doc_id,
                 ROUND(CAST(SUM(CASE WHEN b.g IS NOT NULL THEN 1 ELSE 0 END)
                            AS DOUBLE) / COUNT(*), 6) AS frac
               FROM cg c LEFT JOIN bgrams b USING (g) GROUP BY c.doc_id),
    surv AS (SELECT d.source, d.doc_id, CAST(len(d.t) AS BIGINT) AS n_tok
             FROM dd d JOIN contam k ON d.doc_id = k.doc_id
             WHERE k.frac <= 0.2),
    c AS (SELECT source, doc_id, n_tok,
            SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) - n_tok AS strt
          FROM surv)
    SELECT source, doc_id, n_tok,
           CAST(strt // 512 AS BIGINT) AS chunk,
           CAST(strt % 512 AS BIGINT) AS chunk_offset
    FROM c
    """,
)
def t11_corpus_pipeline(spark, sf_dir):
    """Quality gate (>=5 tokens) -> exact near-dup removal (rolling
    word-fingerprint, keep min doc_id) -> decontamination vs the
    doc_id%19 benchmark split (<=20% 3-gram overlap) -> 512-token
    sequence packing per source. One oracle verifies the composition
    end to end."""
    docs = _tokenized_docs(spark, sf_dir).select("doc_id", "source", "toks")
    q1 = docs.filter(F.size("toks") >= 5)
    fp = q1.withColumn("fp", word_fingerprint("toks"))
    rn = F.row_number().over(_W.partitionBy("fp").orderBy("doc_id"))
    dd = fp.withColumn("__rn", rn).filter(F.col("__rn") == 1).drop("__rn", "fp")
    # corpus feeds BOTH the contamination check and the survivor join:
    # unpinned, Catalyst re-planned the whole scan+tokenize+fingerprint
    # window under each consumer (two documents scans + two fp window
    # exchanges in the r6 plan audit — the d3/cep3 shared-subtree
    # class). localCheckpoint, the repo-wide convention for shared
    # staged frames (14 -> 9 Exchanges).
    corpus = dd.filter(F.col("doc_id") % 19 != 0).localCheckpoint(eager=True)
    bench = docs.filter(F.col("doc_id") % 19 == 0)
    contam = ngram_contamination(
        corpus.select("doc_id", "toks"), bench.select("doc_id", "toks"),
        "doc_id", "toks", n=3,
    )
    keep = contam.filter(F.col("contamination_frac") <= 0.2).select("doc_id")
    surv = corpus.join(keep, "doc_id").select(
        "source", "doc_id", F.size("toks").cast("long").alias("n_tok")
    )
    return pack_sequences(surv, "doc_id", "n_tok", "source", budget=512)


def _knn_cte(n_centroids: int = 8, k: int = 3) -> str:
    """Shared CTE block mirroring knn_graph exactly (the
    _lsh_jaccard_cte pattern): zero-norm vectors EXCLUDED before
    centroid selection AND assignment (``_nonzero`` runs first in
    ``_nearest_assign``, so the default centroids are the first N
    non-zero-norm keys — ORDER BY/LIMIT, not ``vec_id < N``, which
    would silently shrink the centroid set if a low id were
    zero-norm); round-9 cosine, assignment ties to the lower centroid
    id, within-cell exact top-k ties to the lower neighbor id.
    Exposes ``nz`` (the vector population) and ``knn`` (the ranked
    edge list) for s7/s8 to select from."""
    dot = (
        "ROUND(list_sum(list_transform(range(1, len({a}) + 1), "
        "i -> {a}[i] * {b}[i])) / ({an} * {bn}), 9)"
    )
    sim = dot.format(a="c.v", b="ct.cv", an="c.nn", bn="ct.cn")
    pcos = dot.format(a="na.v", b="nb.v", an="na.nn", bn="nb.nn")
    return f"""
    e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nn
          FROM e),
    nz AS (SELECT * FROM n WHERE nn > 0),
    cent AS (SELECT vec_id AS cid, v AS cv, nn AS cn FROM nz
             ORDER BY vec_id LIMIT {n_centroids}),
    sims AS (SELECT c.vec_id, ct.cid, {sim} AS sim
             FROM nz c CROSS JOIN cent ct),
    asg AS (
      SELECT vec_id, cid FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                     ORDER BY sim DESC, cid) AS r
        FROM sims
      ) WHERE r = 1
    ),
    knn AS (
      SELECT vec_id, neighbor_id, cosine, rank FROM (
        SELECT a.vec_id, b.vec_id AS neighbor_id, {pcos} AS cosine,
               ROW_NUMBER() OVER (PARTITION BY a.vec_id
                                  ORDER BY {pcos} DESC, b.vec_id) AS rank
        FROM asg a JOIN asg b ON a.cid = b.cid AND a.vec_id <> b.vec_id
        JOIN nz na ON na.vec_id = a.vec_id
        JOIN nz nb ON nb.vec_id = b.vec_id
      ) WHERE rank <= {k}
    )"""


def _s7_sql(n_centroids: int = 8, k: int = 3) -> str:
    return f"""
    WITH {_knn_cte(n_centroids, k)}
    SELECT vec_id, neighbor_id, cosine, CAST(rank AS BIGINT) AS rank
    FROM knn
    """


@q("s7_knn_graph", _s7_sql())
def s7_knn_graph(spark, sf_dir):
    """Blocked k-NN graph over the embeddings table (k=3 within
    first-8-centroid cells) — the corpus-vs-corpus companion to s1 and
    the precursor to graph-based curation
    (functions/similarity.knn_graph: Sigma|cell|^2 per-cell self-join,
    never all-pairs; recall vs brute force governed by centroid
    quality, tested with kmeans_centroids in tests/test_knn_graph.py)."""
    from diffdataflowmlpipelines_spark.functions.similarity import knn_graph

    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    return knn_graph(emb, "vec_id", "embedding", k=3, n_centroids=8)


def _s8_sql(n_centroids: int = 8, k: int = 3) -> str:
    """The shared knn CTE block (same builder as s7's oracle — one
    assignment convention, no drift) + the d6 recursive-CTE component
    oracle: undirected reach over the k-NN edges, component label =
    minimum vec_id; edge-less vectors are their own component."""
    return f"""
    WITH RECURSIVE {_knn_cte(n_centroids, k)},
    edges AS (SELECT vec_id AS src, neighbor_id AS dst FROM knn
              UNION SELECT neighbor_id, vec_id FROM knn),
    reach(node, lbl) AS (
      SELECT src, src FROM edges
      UNION
      SELECT ed.dst, r.lbl FROM reach r JOIN edges ed ON ed.src = r.node
    ),
    comp AS (SELECT node, MIN(lbl) AS rep FROM reach GROUP BY node)
    SELECT nz.vec_id, CAST(COALESCE(comp.rep, nz.vec_id) AS BIGINT) AS component
    FROM nz LEFT JOIN comp ON comp.node = nz.vec_id
    """


@q("s8_knn_components", _s8_sql())
def s8_knn_components(spark, sf_dir):
    """Connected components over the blocked k-NN graph — the
    graph-based clustering s7 feeds (mutual-reach groups of
    semantically close embeddings; the embedding-space cousin of d6's
    near-dup clusters). Composition: knn_graph edges (localCheckpoint —
    the star algorithm consumes the pair frame three ways) ->
    large-star/small-star components (O(log n) shuffle rounds, the
    100 TB path; functions/dedup.dup_clusters_star); singleton-cell
    vectors label themselves. Oracle: generated knn CTEs + the d6
    RECURSIVE reach."""
    from diffdataflowmlpipelines_spark.functions.dedup import dup_clusters_star
    from diffdataflowmlpipelines_spark.functions.similarity import knn_graph

    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    # return_assignment: the base population (every non-zero-norm
    # vector) reads the knn stage's already-checkpointed assignment
    # instead of re-scanning embeddings (the audit's duplicate-FileScan
    # detector fired on the re-scan shape — Spark even injected a
    # runtime bloom filter to reconcile the two scans)
    g, asg = knn_graph(
        emb, "vec_id", "embedding", k=3, n_centroids=8, return_assignment=True
    )
    pairs = g.select(
        F.col("vec_id").alias("a"), F.col("neighbor_id").alias("b")
    ).localCheckpoint(eager=True)
    comp = dup_clusters_star(pairs)  # (doc, cluster_rep)
    base = asg.select("vec_id")
    return base.join(comp, base["vec_id"] == comp["doc"], "left").select(
        "vec_id",
        F.coalesce(F.col("cluster_rep"), F.col("vec_id"))
        .cast("long")
        .alias("component"),
    )


@q(
    "d11_containment_pairs",
    f"""
    WITH {_lsh_jaccard_cte()}
    SELECT a, b,
           ROUND(i / sa.sz, 6) AS cont_a_in_b,
           ROUND(i / sb.sz, 6) AS cont_b_in_a,
           ROUND(GREATEST(i / sa.sz, i / sb.sz), 6) AS containment
    FROM inter
    JOIN sizes sa ON sa.doc_id = a
    JOIN sizes sb ON sb.doc_id = b
    WHERE GREATEST(i / sa.sz, i / sb.sz) >= 0.3
    """,
)
def d11_containment_pairs(spark, sf_dir):
    """Asymmetric containment over the SAME LSH candidate machinery as
    d3 (functions/dedup.containment_pairs): catches subset duplication
    (quotes, syndication, boilerplate wrapping) that symmetric Jaccard
    under-reports — C(A in B) = |A∩B|/|A| vs Jaccard's |A∩B|/|A∪B|."""
    from diffdataflowmlpipelines_spark.functions.dedup import containment_pairs

    docs = _tokenized_docs(spark, sf_dir)
    sigs = minhash_signatures_rowwise(
        docs, "doc_id", "toks", n_hashes=8, shingle_n=3
    )
    cand = minhash_lsh_candidates(sigs, "doc_id", bands=4, sig_len=8)
    return containment_pairs(
        docs, "doc_id", "toks", threshold=0.3, shingle_n=3, candidates=cand
    )


_S9_SQL = """
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
      FROM embeddings WHERE embedding IS NOT NULL
    ),
    ex AS (
      SELECT vec_id, u.i - 1 AS dim, v[u.i] AS x
      FROM e, UNNEST(generate_series(1, len(v))) AS u(i)
    ),
    fit AS (SELECT dim, MIN(x) AS mn, MAX(x) AS mx FROM ex GROUP BY dim),
    rec AS (
      SELECT ex.vec_id, ex.dim,
             CASE WHEN f.mx = f.mn THEN f.mn
                  ELSE f.mn + LEAST(255.0, GREATEST(0.0,
                           ROUND((ex.x - f.mn) / ((f.mx - f.mn) / 255.0))))
                       * ((f.mx - f.mn) / 255.0)
             END AS r
      FROM ex JOIN fit f USING (dim)
    ),
    cvec AS (SELECT vec_id, list(r ORDER BY dim) AS v FROM rec GROUP BY vec_id),
    cn AS (
      SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nn
      FROM cvec
    ),
    qn AS (
      SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nn
      FROM e WHERE vec_id < 16
    ),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             ROUND(list_sum(list_transform(range(1, len(q.v) + 1),
                                           i -> q.v[i] * c.v[i]))
                   / (q.nn * c.nn), 6) AS cosine
      FROM qn q JOIN cn c ON q.vec_id <> c.vec_id
      WHERE q.nn > 0 AND c.nn > 0
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id) AS rank
      FROM scored
    )
    SELECT query_id, neighbor_id, cosine, CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= 5
"""


@q("s9_quantized_topk", _S9_SQL)
def s9_quantized_topk(spark, sf_dir):
    """Asymmetric-distance top-k over int8 scalar-quantized embeddings
    (functions/similarity.quantized_topk): the corpus is stored as
    array<tinyint> codes (4x less memory/shuffle than float32 -- the
    representation a 100 TB embedding store actually holds), queries
    stay full-precision, scoring runs on the dequantized
    reconstruction (ADC, Jegou et al. TPAMI 2011, scalar case). The
    oracle replays the exact affine fit/quantize/dequantize arithmetic
    in DuckDB, so this checks the quantizer bit-for-bit, not just
    recall. Reference analogue: the fit-then-transform encoder split
    (src/dbsp/operator/aggregate.rs:1)."""
    from diffdataflowmlpipelines_spark.functions.similarity import quantized_topk

    # NULL filter mirrors the oracle's e CTE exactly (s10/s11 do the
    # same): without it, parity rests on the accidental invariant that
    # no dimension is constant (a constant dim would give a NULL vector
    # a partially non-NULL reconstruction that survives _nonzero)
    emb = (
        load(spark, sf_dir, "embeddings")
        .filter(F.col("embedding").isNotNull())
        .select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
    )
    queries = emb.filter(F.col("vec_id") < 16)
    out = quantized_topk(emb, queries, "vec_id", "embedding", k=5, round_to=6)
    return out.withColumn("rank", F.col("rank").cast("long"))


def _s10_sql(dim: int = 64, out_dim: int = 16, seed: int = 42) -> str:
    """Generated oracle for random_projection: literal plane matrix,
    explicit left-to-right + chain per component (the F.aggregate fold
    order), the same 1/sqrt(out_dim) scale literal."""
    import math

    from diffdataflowmlpipelines_spark.functions.similarity import hyperplanes

    planes = hyperplanes(dim, out_dim, seed)
    scale = 1.0 / math.sqrt(out_dim)
    comps = ", ".join(
        "ROUND(("
        + " + ".join(f"v[{j + 1}] * ({planes[i][j]!r})" for j in range(dim))
        + f") * ({scale!r}), 6)"
        for i in range(out_dim)
    )
    return f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings WHERE embedding IS NOT NULL),
    p AS (SELECT vec_id, [{comps}] AS pr FROM e)
    SELECT vec_id, CAST(u.i - 1 AS BIGINT) AS dim, pr[u.i] AS val
    FROM p, UNNEST(generate_series(1, {out_dim})) AS u(i)
    """


@q("s10_random_projection", _s10_sql())
def s10_random_projection(spark, sf_dir):
    """Johnson-Lindenstrauss dimensionality reduction 64 -> 16 over the
    embeddings table (functions/similarity.random_projection): the
    pre-ANN shrink stage a 100 TB embedding pipeline runs first (4x
    less shuffle in every downstream candidate join; distances kept
    within 1±eps). Pure map over the scan — the plane matrix is a plan
    literal, every dot product a codegen zip_with fold, zero shuffle,
    zero Python. Oracle replays the literal matrix with the same fold
    order, checking the projection bit-for-bit per component."""
    from diffdataflowmlpipelines_spark.functions.similarity import random_projection

    emb = (
        load(spark, sf_dir, "embeddings")
        .filter(F.col("embedding").isNotNull())
        .select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
    )
    out = random_projection(emb, "embedding", 64, 16, seed=42, round_to=6)
    return out.select(
        "vec_id", F.posexplode("proj").alias("dim", "val")
    ).withColumn("dim", F.col("dim").cast("long"))


def _s11_sql(dim: int = 64, m: int = 8, ksub: int = 8, k: int = 5) -> str:
    """Generated oracle for pq_topk: codebooks re-derived from the data
    (first-ksub convention), per-subspace argmin with the same fold
    order and cid tie-break, ADC summed in subspace order via
    list(d ORDER BY s) so the float chain matches Spark's + chain."""
    dsub = dim // m
    sq = (
        "list_sum(list_transform(range(1, {d} + 1), "
        "i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i])))"
    )
    return f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings WHERE embedding IS NOT NULL),
    subs AS (
      SELECT vec_id, u.s - 1 AS s,
             v[(u.s - 1) * {dsub} + 1 : (u.s - 1) * {dsub} + {dsub}] AS sv
      FROM e, UNNEST(generate_series(1, {m})) AS u(s)
    ),
    cent AS (SELECT vec_id AS cid, v FROM e ORDER BY vec_id LIMIT {ksub}),
    csubs AS (
      SELECT cid, u.s - 1 AS s,
             v[(u.s - 1) * {dsub} + 1 : (u.s - 1) * {dsub} + {dsub}] AS cv
      FROM cent, UNNEST(generate_series(1, {m})) AS u(s)
    ),
    asg AS (
      SELECT vec_id, s, cid, cv FROM (
        SELECT b.vec_id, b.s, c.cid, c.cv,
               ROW_NUMBER() OVER (PARTITION BY b.vec_id, b.s
                                  ORDER BY {sq.format(d=dsub, a="b.sv", b="c.cv")},
                                           c.cid) AS r
        FROM subs b JOIN csubs c USING (s)
      ) WHERE r = 1
    ),
    contrib AS (
      SELECT q.vec_id AS query_id, a.vec_id AS neighbor_id, q.s,
             {sq.format(d=dsub, a="q.sv", b="a.cv")} AS d
      FROM subs q JOIN asg a USING (s)
      WHERE q.vec_id < 16 AND q.vec_id <> a.vec_id
    ),
    adc AS (
      SELECT query_id, neighbor_id,
             ROUND(list_sum(list(d ORDER BY s)), 6) AS dist
      FROM contrib GROUP BY query_id, neighbor_id
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY dist ASC, neighbor_id) AS rank
      FROM adc
    )
    SELECT query_id, neighbor_id, dist, CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= {k}
    """


@q("s11_pq_topk", _s11_sql())
def s11_pq_topk(spark, sf_dir):
    """Product-quantization ADC top-k over the embeddings table
    (functions/similarity.pq_topk): 64-d float64 vectors stored as 8
    int8 codes (64x smaller), queries full-precision, distance = the
    s-ordered chain of per-subspace codebook lookups. Completes the
    quantized-search family next to s9 (scalar int8): PQ is what a
    100 TB vector store actually ships through its candidate joins.
    The oracle re-derives the codebooks from the data and replays the
    encode argmin and the ADC float chain order exactly."""
    from diffdataflowmlpipelines_spark.functions.similarity import pq_topk

    emb = (
        load(spark, sf_dir, "embeddings")
        .filter(F.col("embedding").isNotNull())
        .select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
    )
    queries = emb.filter(F.col("vec_id") < 16)
    return pq_topk(
        emb, queries, "vec_id", "embedding", dim=64, m=8, ksub=8, k=5
    ).withColumn("rank", F.col("rank").cast("long"))
