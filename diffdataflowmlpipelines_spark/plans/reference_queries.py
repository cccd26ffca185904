"""Query registry: one entry per implemented operator from SURVEY.md §2,
each with a DuckDB-runnable ANSI-SQL oracle over the same parquet tables.

Conventions (driver contract):
- every Spark query takes (spark, sf_dir) and returns a DataFrame;
- every computed column is aliased identically in Spark and SQL;
- float results whose summation order differs across engines are rounded
  to 6 decimals on BOTH sides;
- counts are cast to bigint on both sides (DuckDB sum() yields hugeint).

Reference citations are on the library classes these queries exercise
(operators/encoders.py, functions/vectorizers.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from diffdataflowmlpipelines_spark.functions.text import (
    FP_BASE,
    FP_MOD,
    STOPWORDS,
    quality_features,
    simple_language_id,
    tokenize,
    word_fingerprint,
)
from diffdataflowmlpipelines_spark.functions.vectorizers import (
    tfidf_pairs,
    token_counts,
)
from diffdataflowmlpipelines_spark.operators.collection import (
    DIFF,
    antijoin,
    consolidate,
    weighted_count,
    weighted_sum,
)
from diffdataflowmlpipelines_spark.operators.encoders import (
    KBinsDiscretizer,
    MinMaxScaler,
    MultiColumnEncoder,
    OneHotEncoder,
    OrdinalEncoder,
    Passthrough,
    PolynomialFeatures,
    StandardScaler,
    fit_dictionary,
)

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def q(name: str, sql: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLES[name] = sql
        return fn

    return deco


# tokens of the documents table, as (doc_id, token) — used by several
# queries. Whitespace split, empties dropped (reference utils.rs:3-9).
def _doc_tokens(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", F.explode(tokenize("text")).alias("token")
    )


_DOC_TOKENS_SQL = """
    SELECT doc_id, unnest(list_filter(string_split_regex(trim(text), '\\s+'),
                                      t -> t <> '')) AS token
    FROM documents
"""

# --- P3: map / projection + filter pushdown ------------------------------

@q(
    "p3_projection_filter",
    """
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice * (1 - l_discount), 6) AS net_price
    FROM lineitem
    WHERE l_shipdate < TIMESTAMP '1997-01-01' AND l_quantity > 25
    """,
)
def p3_projection_filter(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter((F.col("l_shipdate") < "1997-01-01") & (F.col("l_quantity") > 25))
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6).alias(
                "net_price"
            ),
        )
    )


# --- P4: flat_map / explode ----------------------------------------------

@q(
    "p4_explode_tokens",
    f"SELECT doc_id, token FROM ({_DOC_TOKENS_SQL})",
)
def p4_explode_tokens(spark, sf_dir):
    return _doc_tokens(spark, sf_dir)


# --- P5: equi-join (broadcast dim) ---------------------------------------

@q(
    "p5_join_agg",
    """
    SELECT n.n_name AS nation,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(SUM(o.o_totalprice), 4) AS revenue
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def p5_join_agg(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 4).alias("revenue"),
        )
    )


# --- P6: antijoin (unseen keys) ------------------------------------------

@q(
    "p6_antijoin",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey NOT IN
      (SELECT o_custkey FROM orders WHERE o_totalprice > 100000)
    """,
)
def p6_antijoin(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 100000)
    out = antijoin(c, o.withColumnRenamed("o_custkey", "c_custkey"), "c_custkey")
    return out.select("c_custkey", "c_name")


# --- P7+P8: concat (multiset union) + distinct ---------------------------

@q(
    "p7_p8_union_distinct",
    """
    SELECT part, CAST(cnt AS BIGINT) AS cnt FROM (
      SELECT part, COUNT(*) AS cnt FROM (
        SELECT o_orderpriority AS part FROM orders
        UNION ALL
        SELECT o_orderstatus AS part FROM orders
      ) GROUP BY part
    )
    """,
)
def p7_p8_union_distinct(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    u = o.select(F.col("o_orderpriority").alias("part")).unionByName(
        o.select(F.col("o_orderstatus").alias("part"))
    )
    return u.groupBy("part").agg(F.count("*").cast("long").alias("cnt"))


# --- P9+P10: threshold + count (signed diff aggregation) ------------------
# synthetic deterministic diff column: every 200th event is a retraction.

_DIFF_EVENTS_SQL = """
    SELECT *, CASE WHEN event_id % 200 = 0 THEN -1 ELSE 1 END AS diff
    FROM events
"""


def _diff_events(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    return ev.withColumn(
        DIFF,
        F.when(F.col("event_id") % 200 == 0, F.lit(-1)).otherwise(F.lit(1)).cast("long"),
    )


@q(
    "p9_p10_weighted_agg",
    f"""
    SELECT event_type,
           CAST(SUM(diff) AS BIGINT) AS net_count,
           ROUND(SUM(value * diff), 4) AS net_value
    FROM ({_DIFF_EVENTS_SQL})
    GROUP BY event_type
    """,
)
def p9_p10_weighted_agg(spark, sf_dir):
    ev = _diff_events(spark, sf_dir)
    return ev.groupBy("event_type").agg(
        weighted_count().alias("net_count"),
        F.round(weighted_sum("value"), 4).alias("net_value"),
    )


# --- P13: consolidate ------------------------------------------------------

@q(
    "p13_consolidate",
    f"""
    SELECT user_id, event_type, CAST(SUM(diff) AS BIGINT) AS diff
    FROM ({_DIFF_EVENTS_SQL})
    GROUP BY user_id, event_type
    HAVING SUM(diff) <> 0
    """,
)
def p13_consolidate(spark, sf_dir):
    ev = _diff_events(spark, sf_dir).select("user_id", "event_type", DIFF)
    return consolidate(ev, ["user_id", "event_type"])


# --- C3: StandardScaler (divide by population variance) -------------------

@q(
    "c3_standard_scaler",
    """
    WITH m AS (SELECT AVG(l_quantity) AS mu, VAR_POP(l_quantity) AS v FROM lineitem)
    SELECT l_orderkey, l_linenumber,
           ROUND((l_quantity - m.mu) / m.v, 6) AS scaled
    FROM lineitem, m
    """,
)
def c3_standard_scaler(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    out = StandardScaler().fit_transform(li, "l_quantity", "__scaled")
    return out.select(
        "l_orderkey", "l_linenumber", F.round("__scaled", 6).alias("scaled")
    )


@q(
    "c3_standard_scaler_rounded",
    """
    WITH m AS (SELECT ROUND(AVG(l_quantity), 2) AS mu,
                      ROUND(VAR_POP(l_quantity), 0) AS v FROM lineitem)
    SELECT l_orderkey, l_linenumber,
           ROUND((l_quantity - m.mu) / m.v, 6) AS scaled
    FROM lineitem, m
    """,
)
def c3_standard_scaler_rounded(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    out = StandardScaler(round_to=(-2, 0)).fit_transform(li, "l_quantity", "__scaled")
    return out.select(
        "l_orderkey", "l_linenumber", F.round("__scaled", 6).alias("scaled")
    )


# --- C4: MinMaxScaler ------------------------------------------------------

@q(
    "c4_minmax_scaler",
    """
    WITH m AS (SELECT MIN(value) AS mn, MAX(value) - MIN(value) AS rg FROM events)
    SELECT event_id, ROUND((value - m.mn) / m.rg, 6) AS scaled
    FROM events, m
    """,
)
def c4_minmax_scaler(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    out = MinMaxScaler().fit_transform(ev, "value", "__scaled")
    return out.select("event_id", F.round("__scaled", 6).alias("scaled"))


# --- C5: KBinsDiscretizer --------------------------------------------------

@q(
    "c5_kbins",
    """
    WITH m AS (SELECT MIN(value) AS mn, MAX(value) - MIN(value) AS rg FROM events)
    SELECT event_id,
           CAST(CASE WHEN b = 8 THEN 7 ELSE b END AS DOUBLE) AS bin
    FROM (SELECT event_id, FLOOR((value - m.mn) / m.rg * 8) AS b FROM events, m)
    """,
)
def c5_kbins(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    out = KBinsDiscretizer(8).fit_transform(ev, "value", "bin")
    return out.select("event_id", "bin")


# --- C5b: quantile-strategy KBins (sklearn surface beyond the reference) ----

_KQ_FRACS = ", ".join(str(i / 8) for i in range(1, 8))
_KQ_BIN = " + ".join(
    f"CASE WHEN value >= qs[{i}] THEN 1 ELSE 0 END" for i in range(1, 8)
)


@q(
    "c5_kbins_quantile",
    f"""
    WITH q AS (SELECT quantile_cont(value, [{_KQ_FRACS}]) AS qs FROM events)
    SELECT event_id, CAST(({_KQ_BIN}) AS DOUBLE) AS bin
    FROM events, q
    """,
)
def c5_kbins_quantile(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    out = KBinsDiscretizer(8, strategy="quantile").fit_transform(ev, "value", "bin")
    return out.select("event_id", "bin")


# --- C7: OrdinalEncoder (sorted dictionary; dense_rank oracle) -------------

@q(
    "c7_ordinal_encoder",
    """
    SELECT doc_id, lang,
           CAST(DENSE_RANK() OVER (ORDER BY lang) - 1 AS DOUBLE) AS code
    FROM documents
    """,
)
def c7_ordinal_encoder(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    return OrdinalEncoder().fit_transform(docs, "lang", "code").select(
        "doc_id", "lang", "code"
    )


# --- C6: OneHotEncoder (5 langs -> overprovisioned_len(5) = 5) -------------

# driver-hashable output: the library API returns array<double>; the
# registry serializes it to a CSV string of 0/1 identically on both
# sides (the driver's pandas canonicalizer cannot sort list columns).
@q(
    "c6_onehot_encoder",
    """
    WITH d AS (SELECT doc_id, lang,
                      DENSE_RANK() OVER (ORDER BY lang) - 1 AS idx
               FROM documents)
    SELECT doc_id, lang,
           CONCAT(CASE WHEN idx = 0 THEN '1' ELSE '0' END, ',',
                  CASE WHEN idx = 1 THEN '1' ELSE '0' END, ',',
                  CASE WHEN idx = 2 THEN '1' ELSE '0' END, ',',
                  CASE WHEN idx = 3 THEN '1' ELSE '0' END, ',',
                  CASE WHEN idx = 4 THEN '1' ELSE '0' END) AS onehot
    FROM d
    """,
)
def c6_onehot_encoder(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    out = OneHotEncoder().fit_transform(docs, "lang", "__oh")
    onehot_str = F.array_join(
        F.transform("__oh", lambda x: x.cast("int").cast("string")), ","
    )
    return out.select("doc_id", "lang", onehot_str.alias("onehot"))


# --- C8: CountVectorizer statistic as (doc, token, tf) pairs ---------------

@q(
    "c8_token_counts",
    f"""
    SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
    FROM ({_DOC_TOKENS_SQL})
    GROUP BY doc_id, token
    """,
)
def c8_token_counts(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").withColumn("__toks", tokenize("text"))
    return token_counts(docs, "doc_id", "__toks")


# --- C9: tf-idf ------------------------------------------------------------

@q(
    "c9_tfidf",
    f"""
    WITH tf AS (
      SELECT doc_id, token, COUNT(*) AS tf
      FROM ({_DOC_TOKENS_SQL}) GROUP BY doc_id, token
    ),
    df AS (SELECT token, COUNT(*) AS dfreq FROM tf GROUP BY token),
    n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents)
    SELECT tf.doc_id, tf.token,
           ROUND(tf.tf * LN(n.n_docs::DOUBLE / df.dfreq), 6) AS weight
    FROM tf JOIN df USING (token), n
    """,
)
def c9_tfidf(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").withColumn("__toks", tokenize("text"))
    out = tfidf_pairs(docs, "doc_id", "__toks")
    return out.select("doc_id", "token", F.round("weight", 6).alias("weight"))


# --- C10: hashing-trick vectorizer (engine-portable hash for the oracle) ---
# The library's HashVectorizer uses murmur3 (F.hash); for a cross-engine
# oracle we use the same hashing-trick construction with a portable word
# hash: (97*len(token) + ascii(first char)) % 64.

@q(
    "c10_hash_vectorizer_buckets",
    f"""
    SELECT doc_id,
           CAST((97 * LENGTH(token) + ASCII(SUBSTRING(token, 1, 1))) % 64 AS BIGINT)
             AS bucket,
           CAST(COUNT(*) AS BIGINT) AS cnt
    FROM ({_DOC_TOKENS_SQL})
    GROUP BY doc_id, bucket
    """,
)
def c10_hash_vectorizer_buckets(spark, sf_dir):
    toks = _doc_tokens(spark, sf_dir)
    bucket = (
        (F.lit(97) * F.length("token") + F.ascii(F.substring("token", 1, 1))) % 64
    ).cast("long")
    return (
        toks.withColumn("bucket", bucket)
        .groupBy("doc_id", "bucket")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


# --- C11: PolynomialFeatures ------------------------------------------------

@q(
    "c11_polynomial",
    """
    SELECT event_id, ROUND(value, 6) AS x1,
           ROUND(value * value, 6) AS x2,
           ROUND(value * value * value, 4) AS x3
    FROM events
    """,
)
def c11_polynomial(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    out = PolynomialFeatures(1, 3).fit_transform(ev, "value", "__p")
    return out.select(
        "event_id",
        F.round(F.col("__p")[0], 6).alias("x1"),
        F.round(F.col("__p")[1], 6).alias("x2"),
        F.round(F.col("__p")[2], 4).alias("x3"),
    )


# --- C12: dictionary (batch form; sorted-stable index) ----------------------

@q(
    "c12_dictionary",
    f"""
    SELECT token, CAST(ROW_NUMBER() OVER (ORDER BY token) - 1 AS BIGINT) AS __idx
    FROM (SELECT DISTINCT token FROM ({_DOC_TOKENS_SQL}))
    """,
)
def c12_dictionary(spark, sf_dir):
    toks = _doc_tokens(spark, sf_dir)
    return fit_dictionary(toks, "token")


# --- C16: multi-column pipeline (ColumnTransformer, columnar assembly) ------
# customer: scale c_acctbal (rounded stats), one-hot c_mktsegment (5 vals),
# passthrough c_nationkey — the reference demo config shape (main.rs:61-69).

# driver-hashable output: the 7-element feature vector is serialized to
# a CSV string of each element scaled by 1e6 and rounded to an integer —
# identical arithmetic in Spark and DuckDB, no float formatting.
@q(
    "c16_multi_column_pipeline",
    """
    WITH m AS (SELECT ROUND(AVG(c_acctbal), 2) AS mu,
                      ROUND(VAR_POP(c_acctbal), 0) AS v FROM customer),
    d AS (SELECT *, DENSE_RANK() OVER (ORDER BY c_mktsegment) - 1 AS idx
          FROM customer)
    SELECT d.c_custkey,
           array_to_string([
             CAST(CAST(ROUND(ROUND((d.c_acctbal - m.mu) / m.v, 6) * 1000000)
                       AS BIGINT) AS VARCHAR),
             CASE WHEN idx = 0 THEN '1000000' ELSE '0' END,
             CASE WHEN idx = 1 THEN '1000000' ELSE '0' END,
             CASE WHEN idx = 2 THEN '1000000' ELSE '0' END,
             CASE WHEN idx = 3 THEN '1000000' ELSE '0' END,
             CASE WHEN idx = 4 THEN '1000000' ELSE '0' END,
             CAST(CAST(ROUND(CAST(d.c_nationkey AS DOUBLE) * 1000000)
                       AS BIGINT) AS VARCHAR)
           ], ',') AS features
    FROM d, m
    """,
)
def c16_multi_column_pipeline(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    mce = MultiColumnEncoder(
        [
            ("c_acctbal", StandardScaler(round_to=(-2, 0))),
            ("c_mktsegment", OneHotEncoder()),
            ("c_nationkey", Passthrough()),
        ]
    )
    out = mce.fit_transform(c, out="__f")
    # round the scaled element for cross-engine float stability
    feats = F.concat(
        F.array(F.round(F.col("__f")[0], 6)),
        F.slice(F.col("__f"), 2, 6),
    )
    feat_sig = F.array_join(
        F.transform(
            feats, lambda x: F.round(x * 1e6, 0).cast("long").cast("string")
        ),
        ",",
    )
    return out.select("c_custkey", feat_sig.alias("features"))


# --- streaming analogues (batch-equivalent oracles; the streaming forms
#     are exercised in tests/test_streaming_*.py) ---------------------------

@q(
    "w1_tumbling_window",
    """
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(value), 4) AS total_value
    FROM events
    GROUP BY window_start, event_type
    """,
)
def w1_tumbling_window(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@q(
    "w2_sliding_window",
    """
    SELECT time_bucket(INTERVAL '30 minutes', ts) - k * INTERVAL '30 minutes'
             AS window_start,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events, (SELECT unnest([0, 1, 2, 3]) AS k)
    GROUP BY window_start
    """,
)
def w2_sliding_window(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "2 hours", "30 minutes"))
        .agg(F.count("*").cast("long").alias("n_events"))
        .select(F.col("window.start").alias("window_start"), "n_events")
    )


@q(
    "w3_session_window",
    """
    WITH e AS (
      SELECT user_id, ts,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       > INTERVAL '30 minutes'
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  THEN 1 ELSE 0 END AS brk
      FROM events),
    g AS (SELECT user_id, ts,
                 SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS sid
          FROM e)
    SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM g GROUP BY user_id, sid
    """,
)
def w3_session_window(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").cast("long").alias("n_events"),
        )
        .select("user_id", "session_start", "session_end", "n_events")
    )


@q(
    "j1_interval_join",
    """
    SELECT p.event_id AS purchase_id, c.event_id AS click_id
    FROM events p JOIN events c
      ON p.user_id = c.user_id
     AND c.event_type = 'click' AND p.event_type = 'purchase'
     AND c.ts BETWEEN p.ts - INTERVAL '30 minutes' AND p.ts
    """,
)
def j1_interval_join(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id"),
        F.col("ts").alias("p_ts"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id"),
        F.col("ts").alias("c_ts"),
    )
    out = p.join(
        c,
        on=[
            p.user_id == c.user_id,
            c.c_ts.between(p.p_ts - F.expr("INTERVAL 30 MINUTES"), p.p_ts),
        ],
    )
    return out.select("purchase_id", "click_id")
