"""Deterministic sampling operators for training-data curation.

The reference has no sampling stage (its pipelines consume whole
relations); a web-scale corpus needs per-source quotas — e.g. cap every
domain/source at N documents so no single crawl dominates the mixture.
Everything here is hash-deterministic (portable md5 arithmetic, see
``functions/dedup.md5_hash60``), so the sample is reproducible across
engines, retries, and partitionings — never ``rand()``, which breaks
exactly-once replay and oracle checks alike.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from diffdataflowmlpipelines_spark.functions.dedup import md5_hash60

SCALE = 1_000_000


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    target_per_stratum: int,
    scale: int = SCALE,
) -> DataFrame:
    """Keep ~``target_per_stratum`` rows per stratum via a deterministic
    hash gate: a row survives iff
    ``md5_hash60(id) % scale < floor(target * scale / |stratum|)``
    (integer arithmetic — identical in ANSI SQL, no float thresholds).

    Scale shape: one aggregation computes per-stratum counts (map-side
    partials; |strata| rows total), the thresholds are BROADCAST back,
    and the gate itself is a map-only filter — the corpus never shuffles.
    Strata at or under the target keep every row (threshold >= scale).

    Null semantics (repo convention: NULL groups are groups): a NULL
    stratum is sampled like any other — the threshold join is
    null-safe, so the NULL stratum's own count gates its rows (a plain
    equi-join would silently drop them while still counting them).
    Rows with a NULL ``id_col`` have no identity to hash, so the gate
    DROPS them (md5(NULL) is NULL and a NULL comparison filters false);
    assign surrogate ids upstream if such rows must be sampleable.
    """
    counts = df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("__n"))
    # GREATEST(1, ...): a stratum larger than target*scale rows would
    # otherwise floor its threshold to 0 and be dropped ENTIRELY — the
    # exact opposite of "cap the dominant crawl". With the clamp such a
    # stratum keeps ~|stratum|/scale rows (the finest rate one integer
    # gate can express); raise ``scale`` when giant strata need an
    # accurate target.
    thr = counts.select(
        F.col(strata_col).alias("__stratum"),
        F.expr(
            f"GREATEST(CAST(1 AS BIGINT), "
            f"CAST({target_per_stratum} AS BIGINT) * {scale} DIV __n)"
        ).alias("__thr"),
    )
    gate = F.pmod(md5_hash60(F.col(id_col).cast("string")), F.lit(scale))
    return (
        df.join(
            F.broadcast(thr),
            F.col(strata_col).eqNullSafe(F.col("__stratum")),
        )
        .filter(gate < F.col("__thr"))
        .drop("__thr", "__stratum")
    )


def mixture_weights(
    df: DataFrame,
    stratum_col: str,
    alpha: float = 0.5,
    budget_rows: int = 1_000_000,
) -> DataFrame:
    """Temperature-scaled mixture weights per stratum (training-mix
    design: w_s = n_s^alpha / sum_t n_t^alpha, alpha<1 upweights small
    sources — the multinomial sampling rule of multilingual/multi-domain
    LM training).

    Returns (stratum, n, weight, target_rows) where ``weight`` is
    rounded to 6 decimals and ``target_rows = round(budget * weight)``
    is computed FROM the rounded weight so both engines hit the same
    integer.

    Scale shape: one aggregation to |strata| rows, then the total is a
    whole-frame window SUM over that already-aggregated tiny frame (the
    single-partition window exchange moves |strata| rows, never data
    rows). A separate ``pows.agg(sum)`` + crossJoin made Catalyst plan
    the per-stratum count aggregation twice — two full corpus scans
    (round-3 VERDICT finding #2).
    """
    from pyspark.sql import Window as W

    pows = df.groupBy(stratum_col).agg(F.count(F.lit(1)).alias("n"))
    pows = pows.select(
        stratum_col,
        F.col("n").cast("long").alias("n"),
        F.pow(F.col("n").cast("double"), F.lit(float(alpha))).alias("__pw"),
    )
    total = F.sum("__pw").over(W.partitionBy())
    w = F.round(F.col("__pw") / total, 6)
    return pows.select(
        stratum_col,
        "n",
        w.alias("weight"),
        F.round(w * F.lit(float(budget_rows)), 0).cast("long").alias("target_rows"),
    )


def hash_split(
    id_col: str,
    splits: list[tuple[str, float]] | None = None,
    scale: int = SCALE,
) -> "F.Column":
    """Deterministic train/val/test split assignment — the final stage
    of every training-data pipeline. Returns a COLUMN (map-only, fuses
    into the scan at 100 TB): the row's split is chosen by where
    ``md5_hash60(id) mod scale`` falls among the cumulative integer
    thresholds ``floor(sum(weights) * scale)``. Hash-deterministic, so
    the assignment is stable across engines, retries, partitionings and
    reruns — never ``rand()`` (module docstring), and membership of a
    given id never changes when rows are added or removed (unlike
    ordinal splits).

    Weights need not sum to 1; they are normalized. NULL ids hash to
    NULL and get a NULL split (no identity, no stable assignment) —
    filter or surrogate upstream, same contract as stratified_sample.
    """
    if splits is None:
        splits = [("train", 0.98), ("val", 0.01), ("test", 0.01)]
    if len(splits) < 2:
        raise ValueError("hash_split needs at least two splits")
    if any(w < 0 for _, w in splits):
        # a negative weight would make the cumulative thresholds
        # non-monotonic: the preceding split silently absorbs the range
        raise ValueError("split weights must be non-negative")
    total = float(sum(w for _, w in splits))
    if total <= 0:
        raise ValueError("split weights must sum to a positive value")
    h = F.pmod(md5_hash60(F.col(id_col).cast("string")), F.lit(scale))
    expr = None
    cum = 0.0
    for name, w in splits[:-1]:
        cum += w / total
        thr = int(cum * scale)
        cond = h < F.lit(thr)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    # last split takes the remainder; NULL hash propagates to NULL split
    return F.when(h.isNotNull(), expr.otherwise(F.lit(splits[-1][0]))).otherwise(
        F.lit(None).cast("string")
    )


def quality_weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_permille,
    permille_scale: int = 1000,
) -> DataFrame:
    """Importance resampling: keep a row iff
    ``md5_hash60(id) % permille_scale < weight_permille`` where
    ``weight_permille`` is a caller-supplied INTEGER column expression
    in [0, permille_scale] derived from row content (quality score,
    length, dedup cluster size, ...). Soft per-row sampling — the
    content decides each row's survival probability, where
    ``stratified_sample`` applies one rate per stratum.

    Integer-exact by construction (hash and weight are both integers),
    so the kept set is bit-reproducible across engines, retries and
    partitionings — no float thresholds at the gate boundary. Map-only:
    fuses into the scan, nothing shuffles, membership of a given id is
    stable as the corpus grows.

    Null semantics: NULL ``id_col`` rows are dropped (no identity to
    hash — same contract as stratified_sample); a NULL weight drops the
    row (NULL comparison is false).
    """
    gate = F.pmod(md5_hash60(F.col(id_col).cast("string")), F.lit(permille_scale))
    return df.filter(gate < weight_permille)


def priority_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
    *,
    scale: int = SCALE,
) -> DataFrame:
    """Weighted sample WITHOUT replacement of exactly ``min(k, n)``
    rows: priority sampling (Duffield, Lund & Thorup 2007) — each row
    gets priority ``q = w / u`` with ``u`` uniform on (0, 1], keep the
    k largest. Higher-weight rows are proportionally likelier to make
    the sample, and the scheme supports unbiased subset-sum estimation
    (estimate weight = max(w, tau) with tau = the (k+1)-st priority).
    Complements the repo's Bernoulli gates (t7/t18 keep a random-SIZED
    subset; training-data curation often needs "exactly k docs, weighted
    by quality/length").

    Determinism (repo convention — never rand()): ``u`` is derived from
    the portable md5 hash, ``u = (md5_hash60(id) % scale + 1) /
    (scale + 1)``, so the sample is reproducible across engines,
    retries and partitionings. Cross-engine exactness: both u and q
    need ONE correctly-rounded IEEE division each (bit-identical in
    Spark and DuckDB) — deliberately no log/exp, whose libm rounding
    may differ at selection boundaries (why this is A-ES's
    priority-sampling cousin, not exponential-keys A-ES itself).

    Rows with NULL id, or NULL/non-positive weight, are dropped
    (documented: no identity to hash / no mass to sample).

    100-TB shape: map-only priority projection fused into the scan,
    then global top-k via orderBy().limit(k) — Spark plans
    TakeOrderedAndProject (per-partition heaps, k rows to the driver
    stage), never a global sort. Output: (id_col, weight, priority
    rounded to 6), priority DESC ties broken by id.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    w = F.col(weight_col).cast("double")
    u = (
        (F.pmod(md5_hash60(F.col(id_col).cast("string")), F.lit(scale)) + 1)
        .cast("double")
        / F.lit(float(scale + 1))
    )
    pri = w / u
    return (
        df.filter(F.col(id_col).isNotNull() & w.isNotNull() & (w > 0))
        .select(
            F.col(id_col),
            w.alias("weight"),
            pri.alias("__pri"),
        )
        .orderBy(F.col("__pri").desc(), F.col(id_col))
        .limit(k)
        .select(id_col, "weight", F.round(F.col("__pri"), 6).alias("priority"))
    )
