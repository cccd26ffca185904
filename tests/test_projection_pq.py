"""random_projection (JL) and product quantization
(functions/similarity.random_projection / pq_fit / pq_encode /
pq_topk).

Pinned: exact agreement of the projection with a numpy twin, JL
pairwise-distance preservation on planted data, codebook shapes and
the first-ksub fit convention, encode argmin vs a python twin
(including the lower-index tie-break), ADC recall on separated
clusters, and the dim%m guard."""

from __future__ import annotations

import math
import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from diffdataflowmlpipelines_spark.functions.similarity import (
    hyperplanes,
    pq_encode,
    pq_fit,
    pq_topk,
    random_projection,
)


def _mk(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "id long, v array<double>",
    )


def test_projection_matches_numpy_twin(spark):
    rng = random.Random(5)
    vecs = [[rng.uniform(-2, 2) for _ in range(12)] for _ in range(20)]
    out = {
        r["id"]: r["p"]
        for r in random_projection(_mk(spark, vecs), "v", 12, 4, seed=7, out_col="p")
        .select("id", "p")
        .collect()
    }
    P = np.array(hyperplanes(12, 4, seed=7))
    scale = 1.0 / math.sqrt(4)
    for i, v in enumerate(vecs):
        want = P @ np.array(v) * scale
        got = np.array(out[i])
        assert np.allclose(got, want, rtol=0, atol=1e-12)


def test_jl_preserves_pairwise_distances(spark):
    # 64 -> 32 on unit-ish gaussian vectors: squared distances within
    # a loose (1 +- 0.6) band for every pair — JL's guarantee shape
    rng = np.random.default_rng(1)
    vecs = rng.standard_normal((12, 64)).tolist()
    out = {
        r["id"]: np.array(r["p"])
        for r in random_projection(_mk(spark, vecs), "v", 64, 32, out_col="p")
        .select("id", "p")
        .collect()
    }
    V = np.array(vecs)
    ratios = []
    for i in range(12):
        for j in range(i + 1, 12):
            true = float(np.sum((V[i] - V[j]) ** 2))
            proj = float(np.sum((out[i] - out[j]) ** 2))
            ratios.append(proj / true)
    # per-pair estimator variance is 2/out_dim — individual ratios are
    # loose-banded, the mean over 66 pairs is tight around 1
    assert all(0.25 < r < 2.5 for r in ratios)
    assert 0.8 < float(np.mean(ratios)) < 1.2


def test_projection_dim_guard(spark):
    df = _mk(spark, [[1.0, 2.0, 3.0]])
    with pytest.raises(ValueError, match="embedding length"):
        random_projection(df, "v", 8, 4)


def test_pq_fit_shape_and_convention(spark):
    vecs = [[float(i * 10 + d) for d in range(8)] for i in range(20)]
    cents = pq_fit(_mk(spark, vecs), "id", "v", dim=8, m=4, ksub=3)
    assert len(cents) == 4  # m subspaces
    assert all(len(cs) == 3 for cs in cents)  # ksub centroids each
    assert all(len(c) == 2 for cs in cents for c in cs)  # dsub = 2
    # first-ksub convention: subspace 0 centroids are rows 0..2's v[0:2]
    assert cents[0] == [[0.0, 1.0], [10.0, 11.0], [20.0, 21.0]]
    assert cents[3][1] == [16.0, 17.0]


def test_pq_dim_not_divisible_raises(spark):
    df = _mk(spark, [[1.0] * 6])
    with pytest.raises(ValueError, match="not divisible"):
        pq_fit(df, "id", "v", dim=6, m=4)


def _local_encode(v, cents):
    codes = []
    for s, cs in enumerate(cents):
        dsub = len(cs[0])
        sub = v[s * dsub : (s + 1) * dsub]
        best = min(
            range(len(cs)),
            key=lambda j: (sum((a - b) * (a - b) for a, b in zip(sub, cs[j])), j),
        )
        codes.append(best)
    return codes


def test_pq_encode_matches_python_twin(spark):
    rng = random.Random(13)
    vecs = [[rng.uniform(-1, 1) for _ in range(8)] for _ in range(40)]
    df = _mk(spark, vecs)
    cents = pq_fit(df, "id", "v", dim=8, m=2, ksub=4)
    got = {
        r["id"]: list(r["c"])
        for r in pq_encode(df, "v", cents, code_col="c").select("id", "c").collect()
    }
    for i, v in enumerate(vecs):
        # codes are stored shifted by -128 (signed-byte storage)
        assert got[i] == [c - 128 for c in _local_encode(v, cents)]


def test_pq_encode_tie_breaks_low_index(spark):
    # two identical centroids: the argmin must pick index 0
    df = _mk(spark, [[5.0, 5.0]])
    cents = [[[5.0], [5.0]], [[9.0], [5.0]]]
    row = pq_encode(df, "v", cents, code_col="c").select("c").first()
    assert list(row["c"]) == [0 - 128, 1 - 128]


def test_pq_encode_full_256_codebook(spark):
    # the canonical ksub=256 (8-bit) configuration: indices above 127
    # must fit the signed byte via the -128 shift, not ANSI-overflow
    cents = [[[float(j)] for j in range(256)]]
    df = _mk(spark, [[0.0], [200.0], [255.0]])
    got = {
        r["id"]: list(r["c"])
        for r in pq_encode(df, "v", cents, code_col="c").select("id", "c").collect()
    }
    assert got[0] == [0 - 128]
    assert got[1] == [200 - 128]
    assert got[2] == [255 - 128]
    with pytest.raises(ValueError, match="256"):
        pq_encode(df, "v", [[[0.0]] * 257], code_col="c")


def test_pq_null_vector_yields_null_codes_and_is_excluded(spark):
    df = spark.createDataFrame(
        [(0, [0.0, 1.0]), (1, [0.1, 1.1]), (2, None), (3, [0.2, 0.9])],
        "id long, v array<double>",
    )
    cents = pq_fit(df, "id", "v", dim=2, m=1, ksub=2)
    enc = {r["id"]: r["c"] for r in pq_encode(df, "v", cents, code_col="c").collect()}
    assert enc[2] is None  # NOT centroid-0 codes
    got = pq_topk(df, df, "id", "v", dim=2, m=1, ksub=2, k=3).collect()
    ids = {r["neighbor_id"] for r in got} | {r["query_id"] for r in got}
    assert 2 not in ids  # the NULL row is neither query nor neighbor
    assert all(r["dist"] is not None for r in got)


def test_projection_null_vector_yields_null_column(spark):
    df = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, None)], "id long, v array<double>"
    )
    out = {
        r["id"]: r["p"]
        for r in random_projection(df, "v", 2, 2, out_col="p").collect()
    }
    assert out[1] is None  # whole column NULL, so isNotNull filtering works
    assert out[0] is not None and len(out[0]) == 2


def test_pq_fit_kmeans_keeps_zero_subspace(spark):
    from diffdataflowmlpipelines_spark.functions.similarity import pq_fit_kmeans

    # subspace 1 (dims 2-3) is all zeros: the L2 codebook fit must not
    # drop those subvectors (cosine convention) or crash on empty input
    rng = random.Random(17)
    vecs = [[rng.uniform(1, 2), rng.uniform(1, 2), 0.0, 0.0] for _ in range(20)]
    cents = pq_fit_kmeans(_mk(spark, vecs), "id", "v", dim=4, m=2, ksub=2, max_iter=3)
    assert len(cents) == 2
    # every centroid of the zero subspace IS the origin
    assert all(c == [0.0, 0.0] for c in cents[1])


def test_pq_topk_recall_on_separated_clusters(spark):
    # PQ with per-cluster codebook entries cannot confuse well-separated
    # clusters: every retrieved neighbor shares the query's cluster
    rng = random.Random(21)
    base = [[40.0 if d == c * 4 else 0.0 for d in range(16)] for c in range(4)]
    vecs = []
    for i in range(40):
        b = base[i % 4]
        vecs.append([x + rng.uniform(-0.2, 0.2) for x in b])
    df = _mk(spark, vecs)
    queries = df.filter(F.col("id") < 4)
    got = pq_topk(df, queries, "id", "v", dim=16, m=4, ksub=8, k=3).collect()
    assert len(got) == 12
    for r in got:
        assert r["neighbor_id"] % 4 == r["query_id"] % 4
        assert r["dist"] >= 0.0


def test_pq_codes_schema(spark):
    rng = random.Random(2)
    vecs = [[rng.uniform(-1, 1) for _ in range(8)] for _ in range(10)]
    df = _mk(spark, vecs)
    cents = pq_fit(df, "id", "v", dim=8, m=4, ksub=4)
    out = pq_encode(df, "v", cents, code_col="c")
    assert dict(out.dtypes)["c"] == "array<tinyint>"


def test_pq_fit_kmeans_shapes_and_recall(spark):
    from diffdataflowmlpipelines_spark.functions.similarity import pq_fit_kmeans

    rng = random.Random(31)
    base = [[30.0 if d == c * 2 else 0.0 for d in range(8)] for c in range(4)]
    vecs = []
    for i in range(40):
        b = base[i % 4]
        vecs.append([x + rng.uniform(-0.1, 0.1) for x in b])
    df = _mk(spark, vecs)
    cents = pq_fit_kmeans(df, "id", "v", dim=8, m=4, ksub=4, max_iter=5)
    assert len(cents) == 4
    assert all(len(cs) == 4 for cs in cents)
    assert all(len(c) == 2 for cs in cents for c in cs)
    got = pq_topk(
        df, df.filter(F.col("id") < 4), "id", "v",
        dim=8, m=4, ksub=4, k=3, centroids=cents,
    ).collect()
    assert len(got) == 12
    for r in got:
        assert r["neighbor_id"] % 4 == r["query_id"] % 4


def test_pq_encode_arrow_bit_parity_with_jvm(spark):
    from diffdataflowmlpipelines_spark.functions.similarity import pq_encode_arrow

    rng = random.Random(47)
    # dsub=8 is the load-bearing case: numpy's ndarray.sum goes
    # PAIRWISE at n=8, so a naive sum would diverge from the JVM fold
    # by ~1 ulp — the Arrow lane must use its explicit left fold
    vecs = [[rng.uniform(-2, 2) for _ in range(16)] for _ in range(200)]
    df = _mk(spark, vecs)
    cents = pq_fit(df, "id", "v", dim=16, m=2, ksub=8)
    jvm = {
        r["id"]: list(r["c"])
        for r in pq_encode(df, "v", cents, code_col="c").select("id", "c").collect()
    }
    arrow = {
        r["id"]: list(r["c"])
        for r in pq_encode_arrow(df, "v", cents, code_col="c")
        .select("id", "c")
        .collect()
    }
    assert arrow == jvm  # bit-identical, including any FP ties


def test_pq_encode_arrow_nulls_and_schema(spark):
    from diffdataflowmlpipelines_spark.functions.similarity import pq_encode_arrow

    df = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, None), (2, [0.5, 0.1])],
        "id long, v array<double>",
    )
    cents = [[[1.0], [0.0]], [[2.0], [0.0]]]
    out = pq_encode_arrow(df, "v", cents, code_col="c")
    assert dict(out.dtypes)["c"] == "array<tinyint>"
    got = {r["id"]: r["c"] for r in out.collect()}
    assert got[1] is None
    assert list(got[0]) == [0 - 128, 0 - 128]
    # subspace 0: 0.5 is EQUIDISTANT from 1.0 and 0.0 -> lower index 0;
    # subspace 1: 0.1 is nearest 0.0 -> index 1
    assert list(got[2]) == [0 - 128, 1 - 128]


def test_pq_encode_arrow_dim_mismatch_raises(spark):
    from diffdataflowmlpipelines_spark.functions.similarity import pq_encode_arrow

    df = _mk(spark, [[1.0, 2.0, 3.0]])
    cents = [[[1.0], [0.0]], [[2.0], [0.0]]]  # codebook dim 2 != 3
    with pytest.raises(Exception, match="codebook dim|PythonException"):
        pq_encode_arrow(df, "v", cents, code_col="c").collect()


def test_pq_encode_arrow_replaces_existing_code_col(spark):
    from diffdataflowmlpipelines_spark.functions.similarity import pq_encode_arrow

    df = _mk(spark, [[1.0, 2.0], [3.0, 4.0]])
    cents = [[[1.0], [3.0]], [[2.0], [4.0]]]
    once = pq_encode_arrow(df, "v", cents, code_col="codes")
    twice = pq_encode_arrow(once, "v", cents, code_col="codes")  # refit path
    assert twice.columns.count("codes") == 1
    a = {r["id"]: list(r["codes"]) for r in once.collect()}
    b = {r["id"]: list(r["codes"]) for r in twice.collect()}
    assert a == b


def test_pq_encode_lanes_agree_on_nan_centroid(spark):
    from diffdataflowmlpipelines_spark.functions.similarity import pq_encode_arrow

    # centroid 0 produces a NaN distance: Spark's struct ordering puts
    # NaN last (greatest), np.argmin would put it first — both lanes
    # must pick the finite centroid 1
    df = _mk(spark, [[1.0]])
    cents = [[[float("nan")], [5.0]]]
    jvm = pq_encode(df, "v", cents, code_col="c").select("c").first()["c"]
    arrow = (
        pq_encode_arrow(df, "v", cents, code_col="c").select("c").first()["c"]
    )
    assert list(jvm) == list(arrow) == [1 - 128]


def test_pq_topk_dim_mismatch_raises(spark):
    df = _mk(spark, [[1.0] * 8 for _ in range(10)])
    short_q = spark.createDataFrame(
        [(0, [1.0] * 4)], "id long, v array<double>"
    )
    with pytest.raises(ValueError, match="embedding length"):
        pq_topk(df, short_q, "id", "v", dim=8, m=2, ksub=2, k=2)
    # caller-supplied codebook that does not tile the declared dim
    bad_cents = [[[1.0], [0.0]]]  # covers 1 dim, dim=8 declared
    with pytest.raises(ValueError, match="codebook covers"):
        pq_topk(df, df, "id", "v", dim=8, m=2, ksub=2, k=2, centroids=bad_cents)


def test_check_dim_tolerates_null_first_row(spark):
    # a NULL vector in the FIRST row must not crash the documented
    # NULL-tolerant entry points (size(NULL) is NULL under ANSI)
    df = spark.createDataFrame(
        [(0, None), (1, [1.0, 2.0])], "id long, v array<double>"
    )
    out = {
        r["id"]: r["p"]
        for r in random_projection(df, "v", 2, 2, out_col="p").collect()
    }
    assert out[0] is None and len(out[1]) == 2
    cents = pq_fit(df, "id", "v", dim=2, m=1, ksub=1)
    assert cents == [[[1.0, 2.0]]]


def test_scalar_quantize_null_vec_all_constant_dims(spark):
    from diffdataflowmlpipelines_spark.functions.similarity import (
        dequantize_expr,
        scalar_quantize,
    )

    # all-constant corpus (every scale 0): a NULL vector must yield a
    # NULL code column, not the sc==0 branch's real -128 codes (which
    # would reconstruct a phantom neighbor)
    df = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, None)], "id long, v array<double>"
    )
    mins, scales = [1.0, 2.0], [0.0, 0.0]
    out = scalar_quantize(df, "v", mins, scales, code_col="c")
    got = {r["id"]: r["c"] for r in out.collect()}
    assert got[1] is None
    assert list(got[0]) == [-128, -128]
    rec = {
        r["id"]: r["r"]
        for r in out.select("id", dequantize_expr("c", mins, scales).alias("r")).collect()
    }
    assert rec[1] is None or all(x is None for x in rec[1])


def test_embedding_dim_stats_counts_nulls_as_missing(spark):
    from diffdataflowmlpipelines_spark.functions.similarity import (
        embedding_dim_stats,
    )

    # dim 1 carries a NULL element in one row: n must dip there (the
    # docstring's null cross-check) while dim 0 counts all rows
    df = spark.createDataFrame(
        [(0, [1.0, 5.0]), (1, [2.0, None]), (2, [3.0, 7.0])],
        "id long, v array<double>",
    )
    stats = {r["dim"]: r for r in embedding_dim_stats(df, "v").collect()}
    assert stats[0]["n"] == 3
    assert stats[1]["n"] == 2  # the NULL element is visible
    assert stats[1]["mean"] == 6.0


def test_pq_encode_arrow_inf_nan_edge_matches_jvm(spark):
    """Advice r5 #2: a NaN distance (inf-element vector vs an
    inf-element centroid) must LOSE to a genuine +inf distance at a
    higher index — Spark's struct ordering has inf < NaN, so a plain
    NaN->inf remap + argmin would pick the wrong code. All-NaN keeps
    the index-0 tie."""
    from diffdataflowmlpipelines_spark.functions.similarity import (
        pq_encode,
        pq_encode_arrow,
    )

    inf = float("inf")
    df = spark.createDataFrame(
        [(0, [inf]), (1, [1.0])], "id long, v array<double>"
    )
    # subspace 0: centroid 0 -> (inf-inf)^2 = NaN, centroid 1 -> +inf
    cents = [[[inf], [0.0]]]
    jvm = {r["id"]: list(r["c"])
           for r in pq_encode(df, "v", cents, code_col="c").collect()}
    arrow = {r["id"]: list(r["c"])
             for r in pq_encode_arrow(df, "v", cents, code_col="c").collect()}
    assert arrow == jvm
    assert jvm[0] == [1 - 128]  # the +inf centroid, not the NaN one

    all_nan_cents = [[[inf], [inf]]]
    jvm2 = {r["id"]: list(r["c"])
            for r in pq_encode(df, "v", all_nan_cents, code_col="c").collect()}
    arrow2 = {r["id"]: list(r["c"])
              for r in pq_encode_arrow(df, "v", all_nan_cents, code_col="c").collect()}
    assert arrow2 == jvm2
    assert jvm2[0] == [0 - 128]
