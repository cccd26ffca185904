"""Broadcast Bloom-filter membership — the constant-memory
decontamination/blocklist shape for 100 TB corpora.

t5-style decontamination broadcasts the *full distinct benchmark n-gram
set* to every executor; that stops being free when the held-out set is
itself large (a 10M-gram bench set is hundreds of MB per executor). The
Bloom filter compresses set membership to ``n_bits`` bits with a
bounded, tunable false-positive rate, and the probe becomes a ZERO-JOIN
row-wise projection: the packed bit words ship as ONE array literal
(Spark broadcasts task binaries; at cluster scale the same array rides
an explicit ``spark.sparkContext.broadcast`` or a literal, both O(m/8)
bytes per executor) and every corpus row tests its k positions with
JVM-side ``getbit`` — no shuffle of the corpus, no join at all.

Determinism / oracle story: positions come from the engine-portable
md5 hash family (functions/dedup.md5_hash60 plus the second 60-bit half
of the same digest) with Kirsch–Mitzenmacher double hashing
``(h1 + i*h2) mod n_bits``, so DuckDB can rebuild the IDENTICAL bit
array in SQL (bit_or of shifted bits) and reproduce every probe —
including false positives — bit-for-bit. The d9 registry query
value-hash-checks the whole structure end-to-end.

Reference parity: the reference has no sketches or membership
structures at all (SURVEY.md §2.3); its only hashing construction is
the HashVectorizer (``feature_extraction/hash_vectorizer.rs:21-48``).
This extends the hashing-trick idea to set membership, like
functions/sketches.py extends it to frequency.

All arithmetic stays below 2**62: hashes are reduced mod ``n_bits``
(≤ 2**26 here) before the ``i * h2`` product (i < k ≤ 16).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

WORD_BITS = 32  # packed word size; int64 storage keeps every engine exact


def _h1_h2(c: Column, n_bits: int) -> tuple[Column, Column]:
    """Two independent 60-bit halves of one md5 digest, reduced mod
    n_bits. DuckDB twins:
    CAST(CONCAT('0x', substr(md5(x), 1, 15)) AS BIGINT) % n_bits and
    CAST(CONCAT('0x', substr(md5(x), 16, 15)) AS BIGINT) % n_bits."""
    d = F.md5(c.cast("string"))
    h1 = F.conv(F.substring(d, 1, 15), 16, 10).cast("long") % F.lit(n_bits)
    h2 = F.conv(F.substring(d, 16, 15), 16, 10).cast("long") % F.lit(n_bits)
    return h1, h2


def _position(h1: Column, h2: Column, i: Column, n_bits: int) -> Column:
    return (h1 + i.cast("long") * h2) % F.lit(n_bits)


def bloom_sparse_words(
    df: DataFrame, col: str, *, n_bits: int, k: int = 4
) -> DataFrame:
    """Distributed Bloom build: explode each value's k positions, pack
    to (word_idx, word) via a map-side-combined ``bit_or`` aggregation.
    Output is ≤ n_bits/32 rows regardless of input size — the classic
    'aggregate a 100 TB column down to a constant-size state' shape
    (duplicate inserts are idempotent under bit_or, so no pre-distinct
    pass over the corpus is needed)."""
    if n_bits % WORD_BITS != 0:
        raise ValueError(f"n_bits must be a multiple of {WORD_BITS}")
    if not 1 <= k <= 16:
        raise ValueError(f"k must be in 1..16, got {k}")
    h1, h2 = _h1_h2(F.col(col), n_bits)
    # NULLs have no identity: md5(NULL) is NULL, so a NULL value would
    # reach the driver as word_idx=None and crash the densify with an
    # opaque TypeError (fit_dictionary's "NULL is not a category" rule)
    df = df.filter(F.col(col).isNotNull())
    pos = df.select(
        h1.alias("__h1"),
        h2.alias("__h2"),
        F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("__i"),
    ).select(
        _position(F.col("__h1"), F.col("__h2"), F.col("__i"), n_bits).alias("__p")
    )
    return (
        pos.select(
            (F.col("__p") / WORD_BITS).cast("long").alias("word_idx"),
            F.expr(f"shiftleft(1L, cast(__p % {WORD_BITS} as int))").alias("__v"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("__v").alias("word"))
    )


def build_bloom_words(
    df: DataFrame, col: str, *, n_bits: int, k: int = 4
) -> list[int]:
    """Collect the (tiny, ≤ n_bits/32-row) sparse build and densify to a
    plain word list — the driver-side artifact that ships to executors
    as a literal/broadcast. Memory is O(n_bits/8) independent of input
    size; the collect is the same bounded fit-statistic pattern every
    encoder here uses (operators/encoders.py)."""
    words = [0] * (n_bits // WORD_BITS)
    for r in bloom_sparse_words(df, col, n_bits=n_bits, k=k).collect():
        words[int(r["word_idx"])] = int(r["word"])
    return words


def _member_expr(c: Column, arr: Column, n_bits: int, k: int) -> Column:
    """True iff all k probe bits are set in ``arr`` (array<long> of
    packed words) — pure JVM expression, shared by the literal and
    broadcast carriers.

    The k probes are UNROLLED into an AND chain (k ≤ 16, a handful of
    integer ops each — nowhere near the 64KB codegen method limit)
    rather than folded with ``forall``: a higher-order function is
    evaluated interpreted with no common-subexpression elimination, so
    the ``forall`` form recomputed the md5 digest and both conv()
    halves inside the lambda for every i — 2k md5+conv evaluations per
    probed value. The unrolled chain stays inside whole-stage codegen
    where subexpression elimination evaluates the digest once
    (measured on d9: the probe projection dominated the query at 8x
    the necessary hash work; guide §4.1 — prefer built-ins/codegen
    over interpreted paths in hot projections)."""
    h1, h2 = _h1_h2(c, n_bits)

    def bit_set(i: int) -> Column:
        p = _position(h1, h2, F.lit(i), n_bits)
        word = F.element_at(arr, (p / WORD_BITS).cast("int") + 1)
        return F.getbit(word, (p % WORD_BITS).cast("int")) == 1

    out = bit_set(0)
    for i in range(1, k):
        out = out & bit_set(i)
    return out


def _check_words(words: list[int], n_bits: int) -> None:
    if len(words) * WORD_BITS != n_bits:
        raise ValueError(
            f"words length {len(words)} does not match n_bits {n_bits}"
        )


def bloom_member(c: Column, words: list[int], *, n_bits: int, k: int = 4) -> Column:
    """Zero-shuffle membership probe: true iff all k bits are set. The
    packed words ride along as a single array<long> literal; the k
    probes run entirely JVM-side (sequence → forall → getbit), so a
    100 TB corpus scan stays a map-only projection with whole-stage
    codegen.

    LITERAL-CARRIER ONLY: a plan literal is re-serialized into every
    task binary and inflates the plan/codegen source, so callers above
    ``BLOOM_LITERAL_MAX_BYTES`` must use ``with_bloom_member`` (the
    DataFrame-level API with the broadcast carrier) — enforced here so
    the hazard cannot be reintroduced silently (verdict r4 #3)."""
    _check_words(words, n_bits)
    if len(words) * 8 > BLOOM_LITERAL_MAX_BYTES:
        raise ValueError(
            f"bloom_member: {len(words) * 8} bytes of packed words "
            f"exceeds the plan-literal cap ({BLOOM_LITERAL_MAX_BYTES}); "
            f"use with_bloom_member(df, ...) which ships the array via "
            f"a one-row broadcast instead of a per-task plan literal"
        )
    return _member_expr(c, F.lit([int(w) for w in words]), n_bits, k)


# Above this many bytes of packed words the filter stops riding as a
# plan literal (re-serialized per task, codegen-source blowup) and ships
# once per executor via a one-row broadcast-join side instead.
BLOOM_LITERAL_MAX_BYTES = 1 << 20


def with_bloom_member(
    df: DataFrame,
    c: Column | str,
    words: list[int],
    out: str,
    *,
    n_bits: int,
    k: int = 4,
) -> DataFrame:
    """``df`` plus boolean column ``out`` = Bloom membership of ``c`` —
    the size-aware carrier switch (verdict r4 #3):

    * small filters (≤ BLOOM_LITERAL_MAX_BYTES packed): the array<long>
      literal form — zero extra operators, widest codegen span;
    * large filters (the docstring's own 2^26-bit case is 16 MB): the
      words become a ONE-ROW DataFrame joined with an explicit
      ``F.broadcast`` hint — Spark's torrent broadcast ships the array
      once per EXECUTOR (not once per task binary), the plan carries
      only a scan of the 1-row relation, and the probe expression is
      the same JVM getbit fold over the joined column. This is the
      c9-style 1-row scalar BroadcastNestedLoopJoin shape, not a real
      join fan-out.

    Probe semantics are identical on both paths (shared _member_expr).
    """
    _check_words(words, n_bits)
    col = F.col(c) if isinstance(c, str) else c
    if len(words) * 8 <= BLOOM_LITERAL_MAX_BYTES:
        return df.withColumn(out, bloom_member(col, words, n_bits=n_bits, k=k))
    wdf = df.sparkSession.createDataFrame(
        [([int(w) for w in words],)], "__bloom_words array<bigint>"
    )
    return (
        df.join(F.broadcast(wdf), how="cross")
        .withColumn(out, _member_expr(col, F.col("__bloom_words"), n_bits, k))
        .drop("__bloom_words")
    )


def bloom_contamination(
    docs: DataFrame,
    bench: DataFrame,
    id_col: str,
    token_col: str,
    *,
    n: int = 3,
    n_bits: int = 1 << 15,
    k: int = 4,
) -> DataFrame:
    """ngram_contamination's constant-memory sibling (same output
    schema: id, n_ngrams, n_flagged, flagged_frac): the benchmark n-gram
    set folds into a Bloom filter instead of a broadcast join side, and
    the corpus probe is join-free. Flags are a superset of the exact
    answer (false positives only, never false negatives) — the right
    trade for a pre-filter that gates expensive exact rechecks at
    scale."""
    from diffdataflowmlpipelines_spark.functions.dedup import (
        distinct_doc_ngrams,
    )

    # grams derived by the SAME helper as the exact checker — the
    # superset guarantee (flags >= exact hits) holds only while both
    # sides gram identically. No .distinct() before the build:
    # duplicate inserts are idempotent under bit_or (the builder's own
    # contract), so the dedup shuffle bought nothing.
    words = build_bloom_words(
        distinct_doc_ngrams(bench, id_col, token_col, n).select("__g"),
        "__g",
        n_bits=n_bits,
        k=k,
    )
    probed = with_bloom_member(
        distinct_doc_ngrams(docs, id_col, token_col, n),
        F.col("__g"),
        words,
        "__b",
        n_bits=n_bits,
        k=k,
    )
    return probed.select(
        F.col(id_col), F.col("__b").cast("int").alias("__hit")
    ).groupBy(
        id_col
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_ngrams"),
        F.sum("__hit").cast("long").alias("n_flagged"),
        F.round(F.sum("__hit").cast("double") / F.count(F.lit(1)), 6).alias(
            "flagged_frac"
        ),
    )
