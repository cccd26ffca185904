"""Token-pipeline queries: BPE vocabulary learning (v1-v3) and corpus
composition diagnostics (t18 importance resampling, t19 source drift).

The graft's payload is TOKENS: BPE is the operator that decides what
the tokens ARE — upstream of everything the reference's vocabulary
aggregate (``src/types/integer_assignment_aggregate.rs:43-95``) and
this repo's packing/chunking/OOV stages consume.

Oracle coverage: FULL, including the iterative queries. v1 is the
pair-count statistics kernel; v2/v3/t20's k data-dependent argmax+fold
rounds are expressed as GENERATED SQL (k repeated CTE blocks; the
greedy-leftmost merge fold runs via DuckDB list_reduce over a
chr(1)-joined symbol string — same precedent as the generated MinHash
oracles). tests/test_bpe.py additionally pins exact merge-table and
encoding parity against a pure-python Sennrich-2016 twin, adversarial
greedy-merge cases, tie-breaks, and early-stop.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from diffdataflowmlpipelines_spark.functions.bpe import (
    EOW,
    bpe_encode,
    learn_bpe,
    learn_bpe_incremental,
    pair_counts,
    initial_symbols,
    word_frequencies,
)
from diffdataflowmlpipelines_spark.functions.sampling import (
    quality_weighted_sample,
)
from diffdataflowmlpipelines_spark.functions.text import (
    pmi_collocations,
    source_ngram_overlap,
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
    """BPE iteration-0 statistics: the top-40 adjacent symbol pairs
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


_BPE_K = 8

# The iterative Sennrich loop IS expressible as one (generated) SQL
# statement — same precedent as the generated MinHash oracles: k
# repeated CTE blocks, each = a pair-count aggregation, a LIMIT-1
# argmax with the (left, right)-ascending tie-break, and the
# greedy-leftmost merge fold via DuckDB list_reduce over a
# chr(1)-joined symbol string (a just-merged symbol is left+right,
# which equals neither left nor right, so the string fold is exactly
# the left-to-right scan — same proof as the Catalyst fold).
# Caveat (documented, not hit at any test SF): if the corpus exhausts
# its pairs before k merges, Spark early-stops while the SQL's CROSS
# JOIN against an empty top{i} empties the symbol frame.
_FOLD = (
    "string_split(list_reduce(s, (acc, x) -> CASE "
    "WHEN (acc = t.lft OR ends_with(acc, chr(1) || t.lft)) AND x = t.rgt "
    "THEN substr(acc, 1, len(acc) - len(t.lft)) || t.lft || t.rgt "
    "ELSE acc || chr(1) || x END), chr(1))"
)


def _bpe_iter_blocks(k: int) -> str:
    """WITH-clause blocks: wf, syms0..syms{k}, pc/top per iteration —
    `word` is threaded through so the encode oracles can join back."""
    parts = [
        f"""wf AS (
      SELECT w AS word, COUNT(*) AS freq
      FROM (SELECT unnest({_TOKS_SQL}) AS w FROM documents) GROUP BY w
    ),
    syms0 AS (
      SELECT word, list_append(string_split(word, ''), '{EOW}') AS s, freq
      FROM wf
    )"""
    ]
    for i in range(k):
        parts.append(
            f"""pc{i} AS (
      SELECT s[j] AS lft, s[j + 1] AS rgt, SUM(freq) AS c
      FROM syms{i}, UNNEST(range(1, len(s))) AS u(j)
      GROUP BY 1, 2
    ),
    top{i} AS (SELECT lft, rgt, c FROM pc{i} ORDER BY c DESC, lft, rgt LIMIT 1),
    syms{i + 1} AS (
      SELECT word, {_FOLD} AS s, freq
      FROM syms{i} CROSS JOIN top{i} t
    )"""
        )
    return ",\n    ".join(parts)


def _bpe_learn_sql(k: int) -> str:
    union = "\n      UNION ALL ".join(
        f"SELECT {i} AS i, lft, rgt, c FROM top{i}" for i in range(k)
    )
    return f"""
    WITH {_bpe_iter_blocks(k)}
    SELECT CAST(i AS INT) AS rank, lft AS "left", rgt AS "right",
           lft || rgt AS merged, CAST(c AS BIGINT) AS pair_count
    FROM ({union})
    """


# per-doc encoded unit sequences from syms{k}: tokenize with position,
# join each word's final symbol list, flatten in order
def _bpe_encode_blocks(k: int) -> str:
    return f"""{_bpe_iter_blocks(k)},
    tok AS (
      SELECT t.doc_id, u.j AS pos, t.ts[u.j] AS word
      FROM (SELECT doc_id, {_TOKS_SQL} AS ts FROM documents) t,
           UNNEST(range(1, len(t.ts) + 1)) AS u(j)
    ),
    flat AS (
      SELECT tok.doc_id, flatten(list(e.s ORDER BY tok.pos)) AS bt
      FROM tok JOIN syms{k} e USING (word)
      GROUP BY tok.doc_id
    )"""


@q(
    "v2_bpe_learn",
    _bpe_learn_sql(_BPE_K),
)
def v2_bpe_learn(spark, sf_dir):
    """Learn 8 BPE merges from the documents corpus. Deterministic:
    argmax pair_count, ties (left, right) ascending. Oracle: the
    generated k-iteration SQL above; the python-twin parity suite
    (tests/test_bpe.py) additionally pins tie-breaks and early-stop."""
    return learn_bpe(load(spark, sf_dir, "documents"), n_merges=_BPE_K)


@q(
    "v3_bpe_encode",
    f"""
    WITH {_bpe_encode_blocks(_BPE_K)}
    SELECT d.doc_id,
           COALESCE(array_to_string(f.bt, ' '), '') AS bpe_text,
           CAST(COALESCE(len(f.bt), 0) AS INT) AS n_bpe
    FROM documents d LEFT JOIN flat f USING (doc_id)
    """,
)
def v3_bpe_encode(spark, sf_dir):
    """Encode every document with the 8 merges of v2. Merges apply to
    the DISTINCT-word frame; the corpus maps through one hash join
    (never folded per-merge). The unit sequence is serialized to a
    space-joined string for driver hashability (the m1/c16 convention;
    units cannot contain spaces — words are whitespace-split)."""
    docs = load(spark, sf_dir, "documents")
    # learn driver-side AND keep the final word->symbols table: the
    # encode then skips the distinct-vocab shuffle + merge folds over
    # the corpus it was just learned on (bpe_encode word_syms path)
    wf = {
        r["word"]: int(r["freq"]) for r in word_frequencies(docs).collect()
    }
    full, word_syms = learn_bpe_incremental(
        wf, _BPE_K, return_word_syms=True
    )
    merges = [(m[1], m[2]) for m in full]
    if len(merges) < _BPE_K:
        # self-diagnosing guard: Spark early-stops but the generated
        # oracle's CROSS JOIN against an empty top{i} empties the
        # symbol frame — the oracle would report '' for every doc and
        # the gate failure would read as an engine bug
        raise ValueError(
            f"corpus supports only {len(merges)} < {_BPE_K} merges; "
            "lower _BPE_K to keep the generated oracle aligned"
        )
    enc = bpe_encode(docs, merges, word_syms=word_syms)
    return enc.select(
        "doc_id",
        F.array_join("bpe_tokens", " ").alias("bpe_text"),
        "n_bpe",
    )


@q(
    "t18_importance_resample",
    """
    WITH w AS (
      SELECT doc_id, source,
             COALESCE(len(list_distinct(list_filter(
                 string_split_regex(trim(text), '\\s+'), t -> t <> ''))), 0)
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
    (functions/sampling.quality_weighted_sample). NULL text counts as
    0 distinct tokens -> weight 0 -> dropped (without the coalesce,
    F.least/LEAST skip the NULL and the LOWEST-quality document would
    get the MAXIMUM weight — review finding r4c)."""
    docs = load(spark, sf_dir, "documents")
    n_distinct = F.coalesce(
        F.size(F.array_distinct(tokenize("text"))), F.lit(0)
    )
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


_PMI_MIN = 5
_PMI_K = 50


@q(
    "t21_pmi_collocations",
    f"""
    WITH toks AS (SELECT {_TOKS_SQL} AS ts FROM documents),
    cu AS (
      SELECT w, COUNT(*) AS c
      FROM (SELECT unnest(ts) AS w FROM toks)
      GROUP BY w
    ),
    cb AS (
      SELECT w1, w2, COUNT(*) AS n_pair
      FROM (
        SELECT ts[i] AS w1, ts[i + 1] AS w2
        FROM toks, UNNEST(range(1, len(ts))) AS u(i)
      )
      GROUP BY w1, w2
    ),
    n1 AS (SELECT SUM(c) AS v FROM cu),
    n2 AS (SELECT SUM(n_pair) AS v FROM cb)
    SELECT cb.w1, cb.w2, CAST(cb.n_pair AS BIGINT) AS n_pair,
           ROUND(ln(
             (CAST(cb.n_pair AS DOUBLE) * CAST(n1.v AS DOUBLE)
              * CAST(n1.v AS DOUBLE))
             / (CAST(n2.v AS DOUBLE) * CAST(a.c AS DOUBLE)
                * CAST(b.c AS DOUBLE))
           ), 6) AS pmi
    FROM cb JOIN cu a ON cb.w1 = a.w JOIN cu b ON cb.w2 = b.w
    CROSS JOIN n1 CROSS JOIN n2
    WHERE cb.n_pair >= {_PMI_MIN}
    ORDER BY pmi DESC, cb.w1, cb.w2
    LIMIT {_PMI_K}
    """,
)
def t21_pmi_collocations(spark, sf_dir):
    """Top-k adjacent-bigram collocations by PMI (Church & Hanks 1990)
    over corpus-wide counts — the collocation diagnostic before
    tokenizer/vocab design (functions/text.pmi_collocations; the
    double-association shape of the PMI expression is mirrored in the
    oracle so ROUND(...,6) agrees cross-engine)."""
    return pmi_collocations(
        load(spark, sf_dir, "documents"), min_count=_PMI_MIN, top_k=_PMI_K
    )


@q(
    "t22_source_ngram_overlap",
    f"""
    WITH toks AS (
      SELECT source, {_TOKS_SQL} AS ts FROM documents
      WHERE source IS NOT NULL
    ),
    grams AS (
      SELECT DISTINCT source,
             ts[i] || chr(1) || ts[i + 1] || chr(1) || ts[i + 2] AS gram
      FROM toks, UNNEST(range(1, len(ts) - 1)) AS u(i)
    ),
    sizes AS (SELECT source, COUNT(*) AS n FROM grams GROUP BY source),
    inter AS (
      SELECT a.source AS source_a, b.source AS source_b,
             COUNT(*) AS n_common
      FROM grams a JOIN grams b USING (gram)
      WHERE a.source < b.source
      GROUP BY a.source, b.source
    )
    SELECT i.source_a, i.source_b,
           CAST(sa.n AS BIGINT) AS n_a,
           CAST(sb.n AS BIGINT) AS n_b,
           CAST(i.n_common AS BIGINT) AS n_common,
           ROUND(CAST(i.n_common AS DOUBLE)
                 / CAST(sa.n + sb.n - i.n_common AS DOUBLE), 6) AS jaccard
    FROM inter i
    JOIN sizes sa ON i.source_a = sa.source
    JOIN sizes sb ON i.source_b = sb.source
    """,
)
def t22_source_ngram_overlap(spark, sf_dir):
    """Pairwise cross-source 3-gram Jaccard — the corpus-level
    contamination matrix (functions/text.source_ngram_overlap):
    integer-exact intersection/set sizes, one rounded division."""
    return source_ngram_overlap(load(spark, sf_dir, "documents"), n=3)


@q(
    "t20_tokenizer_pipeline",
    f"""
    WITH {_bpe_encode_blocks(_BPE_K)},
    units AS (SELECT DISTINCT unnest(bt) AS unit FROM flat),
    ids AS (
      SELECT unit, CAST(ROW_NUMBER() OVER (ORDER BY unit) - 1 AS INT) AS idx
      FROM units
    ),
    ex AS (
      SELECT doc_id, u.j AS p, bt[u.j] AS unit
      FROM flat, UNNEST(range(1, len(bt) + 1)) AS u(j)
    ),
    mapped AS (
      SELECT ex.doc_id, list(ids.idx ORDER BY ex.p) AS tokens
      FROM ex JOIN ids USING (unit)
      GROUP BY ex.doc_id
    )
    SELECT d.doc_id,
           COALESCE(array_to_string(m.tokens, ' '), '') AS tokens_csv,
           CAST(COALESCE(len(m.tokens), 0) AS INT) AS n_tok,
           d.source
    FROM documents d LEFT JOIN mapped m USING (doc_id)
    """,
)
def t20_tokenizer_pipeline(spark, sf_dir):
    """The complete tokenizer path (functions/bpe.tokenizer_pipeline):
    text -> learned BPE units (v2) -> per-doc unit sequences (v3) ->
    stable dense int ids (c12's sharded fit_dictionary). The library
    function returns the true north-rule shape (tokens array<int>);
    this registry entry serializes the id array to a space-joined
    string for driver hashability (m1/c16 convention). The end-to-end
    token-ARRAY equality vs the python twin is pinned in
    tests/test_bpe.py."""
    from diffdataflowmlpipelines_spark.functions.bpe import (
        tokenizer_pipeline,
    )

    docs = load(spark, sf_dir, "documents")
    # learn driver-side AND keep the word->symbols table (see v3)
    wf = {
        r["word"]: int(r["freq"]) for r in word_frequencies(docs).collect()
    }
    full, word_syms = learn_bpe_incremental(
        wf, _BPE_K, return_word_syms=True
    )
    merges = [(m[1], m[2]) for m in full]
    if len(merges) < _BPE_K:
        # same self-diagnosing guard as v3: on an early-stopped corpus
        # the generated k-iteration oracle empties and the gate failure
        # would read as an engine bug
        raise ValueError(
            f"corpus supports only {len(merges)} < {_BPE_K} merges; "
            "lower _BPE_K to keep the generated oracle aligned"
        )
    out = tokenizer_pipeline(docs, merges=merges, word_syms=word_syms)
    return out.select(
        "doc_id",
        F.array_join(
            F.transform("tokens", lambda x: x.cast("string")), " "
        ).alias("tokens_csv"),
        "n_tok",
        "source",
    )


@q(
    "t23_ngram_novelty",
    f"""
    WITH toks AS (SELECT doc_id, {_TOKS_SQL} AS ts FROM documents),
    grams AS (
      SELECT DISTINCT doc_id,
             ts[i] || chr(1) || ts[i + 1] || chr(1) || ts[i + 2] AS gram
      FROM toks, UNNEST(range(1, len(ts) - 1)) AS u(i)
    ),
    per_doc AS (SELECT doc_id, COUNT(*) AS ng FROM grams GROUP BY doc_id),
    novel AS (
      SELECT fd AS doc_id, COUNT(*) AS nn
      FROM (SELECT gram, MIN(doc_id) AS fd FROM grams GROUP BY gram)
      GROUP BY fd
    )
    SELECT d.doc_id,
           CAST(COALESCE(p.ng, 0) AS BIGINT) AS n_grams,
           CAST(COALESCE(v.nn, 0) AS BIGINT) AS n_novel,
           ROUND(CASE WHEN COALESCE(p.ng, 0) > 0
                 THEN CAST(COALESCE(v.nn, 0) AS DOUBLE) / CAST(p.ng AS DOUBLE)
                 ELSE 0.0 END, 6) AS novelty
    FROM documents d
    LEFT JOIN per_doc p USING (doc_id)
    LEFT JOIN novel v USING (doc_id)
    """,
)
def t23_ngram_novelty(spark, sf_dir):
    """Per-document 3-gram novelty vs the earlier corpus (first
    occurrence by min doc_id) — the per-doc scalar face of t22's
    source-level overlap matrix and the cheap pre-filter before d2/d3
    pairwise near-dup (functions/text.ngram_novelty: one distinct
    shuffle, two re-aggregations, no second touch of the gram key)."""
    from diffdataflowmlpipelines_spark.functions.text import ngram_novelty

    return ngram_novelty(load(spark, sf_dir, "documents"), n=3)


@q(
    "t24_priority_sample",
    """
    WITH p AS (
      SELECT doc_id, CAST(n_chars AS DOUBLE) AS weight,
             CAST(n_chars AS DOUBLE) / (
               CAST((CAST(CONCAT('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                          AS BIGINT) % 1000000) + 1 AS DOUBLE) / 1000001.0
             ) AS pri
      FROM documents
      WHERE doc_id IS NOT NULL AND n_chars IS NOT NULL AND n_chars > 0
    )
    SELECT doc_id, weight, ROUND(pri, 6) AS priority
    FROM p ORDER BY pri DESC, doc_id LIMIT 200
    """,
)
def t24_priority_sample(spark, sf_dir):
    """Exactly-k weighted sample without replacement (priority
    sampling, Duffield-Lund-Thorup 2007) over documents weighted by
    n_chars — functions/sampling.priority_sample: deterministic
    hash-derived u, division-only priorities (cross-engine IEEE-exact,
    no libm), global top-k via TakeOrderedAndProject."""
    from diffdataflowmlpipelines_spark.functions.sampling import priority_sample

    return priority_sample(
        load(spark, sf_dir, "documents"), "doc_id", "n_chars", k=200
    )
