"""Token-pipeline queries: BPE vocabulary learning (v1-v3) and corpus
composition diagnostics (t18 importance resampling, t19 source drift).

The graft's payload is TOKENS: BPE is the operator that decides what
the tokens ARE — upstream of everything the reference's vocabulary
aggregate (``src/types/integer_assignment_aggregate.rs:43-95``) and
this repo's packing/chunking/OOV stages consume.

Oracle coverage: v1 (the pair-count statistics kernel every BPE
iteration re-runs) has a full DuckDB oracle. v2/v3 are iterative-argmax
algorithms — k data-dependent argmax+fold rounds are not expressible in
one ANSI-SQL statement, so they are registered WITHOUT oracle_sql (the
driver records the weaker rows-only check) and their correctness gate
is tests/test_bpe.py: exact merge-table and encoding parity against a
pure-python Sennrich-2016 twin, plus adversarial greedy-merge cases.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from diffdataflowmlpipelines_spark.functions.bpe import (
    EOW,
    bpe_encode,
    learn_bpe,
    pair_counts,
    initial_symbols,
    word_frequencies,
)
from diffdataflowmlpipelines_spark.functions.sampling import (
    quality_weighted_sample,
)
from diffdataflowmlpipelines_spark.functions.text import (
    source_unigram_kl,
    tokenize,
)
from diffdataflowmlpipelines_spark.plans.reference_queries import load, q

_TOKS_SQL = "list_filter(string_split_regex(trim(text), '\\s+'), t -> t <> '')"

_V1_TOPK = 40


@q(
    "v1_bpe_pair_counts",
    f"""
    WITH wf AS (
      SELECT w AS word, COUNT(*) AS freq
      FROM (SELECT unnest({_TOKS_SQL}) AS w FROM documents)
      GROUP BY w
    ),
    syms AS (
      SELECT list_append(string_split(word, ''), '{EOW}') AS s, freq
      FROM wf
    ),
    pairs AS (
      SELECT s[i] AS "left", s[i + 1] AS "right", freq
      FROM syms, UNNEST(range(1, len(s))) AS u(i)
    )
    SELECT "left", "right", CAST(SUM(freq) AS BIGINT) AS pair_count
    FROM pairs
    GROUP BY "left", "right"
    ORDER BY pair_count DESC, "left", "right"
    LIMIT {_V1_TOPK}
    """,
)
def v1_bpe_pair_counts(spark, sf_dir):
    """BPE iteration-0 statistics: the top-{40} adjacent symbol pairs
    (char symbols + EOW) over the corpus word-frequency table — the
    aggregation kernel every merge iteration re-runs. One corpus
    shuffle to word frequencies, then vocab-sized work only."""
    wf = word_frequencies(load(spark, sf_dir, "documents")).select(
        "freq", initial_symbols("word").alias("symbols")
    )
    return (
        pair_counts(wf)
        .orderBy(F.desc("pair_count"), "left", "right")
        .limit(_V1_TOPK)
    )


@q("v2_bpe_learn")  # iterative argmax — no single-statement SQL oracle;
# correctness gate: tests/test_bpe.py exact parity vs the pure-python
# Sennrich twin (merge-by-merge, incl. tie-breaks) + golden example.
def v2_bpe_learn(spark, sf_dir):
    """Learn 8 BPE merges from the documents corpus. Deterministic:
    argmax pair_count, ties (left, right) ascending."""
    return learn_bpe(load(spark, sf_dir, "documents"), n_merges=8)


@q("v3_bpe_encode")  # depends on v2's learned merges — same gate.
def v3_bpe_encode(spark, sf_dir):
    """Encode every document with the 8 merges of v2: (doc_id,
    bpe_tokens, n_bpe). Merges apply to the DISTINCT-word frame; the
    corpus maps through one hash join (never folded per-merge)."""
    docs = load(spark, sf_dir, "documents")
    merges = [
        (r["left"], r["right"])
        for r in learn_bpe(docs, n_merges=8).collect()
    ]
    return bpe_encode(docs, merges)


@q(
    "t18_importance_resample",
    """
    WITH w AS (
      SELECT doc_id, source,
             len(list_distinct(list_filter(
                 string_split_regex(trim(text), '\\s+'), t -> t <> '')))
               AS n_distinct
      FROM documents
    )
    SELECT doc_id, source,
           CAST(n_distinct AS BIGINT) AS n_distinct_tokens,
           CAST(LEAST(1000, n_distinct * 25) AS BIGINT) AS weight_permille
    FROM w
    WHERE CAST(CONCAT('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
               AS BIGINT) % 1000 < LEAST(1000, n_distinct * 25)
    """,
)
def t18_importance_resample(spark, sf_dir):
    """Quality-weighted importance resampling: each document survives
    with probability ~ lexical diversity (distinct-token count * 25
    permille, capped) — upsamples diverse documents, thins repetitive
    ones. Integer-exact hash gate, map-only, growth-stable membership
    (functions/sampling.quality_weighted_sample)."""
    docs = load(spark, sf_dir, "documents")
    n_distinct = F.size(F.array_distinct(tokenize("text")))
    scored = docs.select(
        "doc_id",
        "source",
        n_distinct.cast("long").alias("n_distinct_tokens"),
        F.least(F.lit(1000), n_distinct * 25)
        .cast("long")
        .alias("weight_permille"),
    )
    return quality_weighted_sample(
        scored, "doc_id", F.col("weight_permille")
    )


@q(
    "t19_source_drift_kl",
    f"""
    WITH tok AS (
      SELECT source, unnest({_TOKS_SQL}) AS w FROM documents
    ),
    st AS (SELECT source, w, COUNT(*) AS c FROM tok GROUP BY source, w),
    ns AS (SELECT source, SUM(c) AS n FROM st GROUP BY source),
    ct AS (SELECT w, SUM(c) AS cw FROM st GROUP BY w),
    tot AS (SELECT SUM(c) AS n FROM st)
    SELECT st.source,
           CAST(MAX(ns.n) AS BIGINT) AS n_tokens,
           ROUND(SUM((st.c / ns.n) * ln((st.c / ns.n) / (ct.cw / tot.n))), 6)
             AS kl
    FROM st JOIN ns ON st.source IS NOT DISTINCT FROM ns.source
            JOIN ct USING (w) CROSS JOIN tot
    GROUP BY st.source
    """,
)
def t19_source_drift_kl(spark, sf_dir):
    """Unigram KL(P_source || P_corpus) per source — the composition-
    drift diagnostic before mixture re-weighting (t10 decides how much
    of each source; this measures how different each source reads)."""
    return source_unigram_kl(load(spark, sf_dir, "documents"))


@q("t20_tokenizer_pipeline")  # composes v2+v3+c12 — same oracle-less
# gate as v2/v3 (iterative upstream); token-array equality vs the
# python twin is pinned in tests/test_bpe.py.
def t20_tokenizer_pipeline(spark, sf_dir):
    """The complete tokenizer path, composed production-style from the
    same library functions the standalone queries use: text -> learned
    BPE units (v2) -> per-doc unit sequences (v3) -> stable dense int
    ids (c12's sharded fit_dictionary). Output is EXACTLY the
    north-rule input shape the streaming engine ingests — (doc_id,
    tokens array<int>, n_tok int, source) — i.e. this engine also
    BUILDS the pre-tokenized table the 10^12-sequence stream reads.

    Scale shape: learn_bpe = one corpus shuffle + vocab-sized
    iterations; bpe_encode maps the corpus through one hash join; the
    encoded frame is localCheckpoint'ed because BOTH the dictionary fit
    and the id mapping consume it (the d3/cep3 double-plan class,
    avoided at birth); fit_dictionary is the range-sharded rank (no
    single-partition window); the id mapping is one join keyed on the
    unit (vocabulary-sized build side) + one per-doc regroup.
    """
    from diffdataflowmlpipelines_spark.operators.encoders import (
        fit_dictionary,
    )

    docs = load(spark, sf_dir, "documents")
    merges = [
        (r["left"], r["right"]) for r in learn_bpe(docs, 8).collect()
    ]
    enc = bpe_encode(docs, merges).localCheckpoint(eager=True)
    vocab = fit_dictionary(
        enc.select(F.explode("bpe_tokens").alias("unit")), "unit"
    )
    ex = enc.select("doc_id", F.posexplode("bpe_tokens").alias("pos", "unit"))
    ids = (
        ex.join(vocab, "unit")
        .groupBy("doc_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "__idx"))),
                lambda s: s["__idx"].cast("int"),
            ).alias("tokens")
        )
    )
    return (
        docs.select("doc_id", "source")
        .join(ids, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("tokens", F.array().cast("array<int>")).alias(
                "tokens"
            ),
            "source",
        )
        .withColumn("n_tok", F.size("tokens").cast("int"))
        .select("doc_id", "tokens", "n_tok", "source")
    )
