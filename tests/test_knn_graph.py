"""knn_graph: blocked k-NN graph over an embedding column.

Pinned: closed-form neighbor sets within hand-built cells, exact
equality with brute-force cosine ranking when everything shares one
cell, full recall on well-separated planted clusters under
kmeans_centroids, the singleton-cell contract, and the k guard."""

from __future__ import annotations

import math
import random

import pytest

from diffdataflowmlpipelines_spark.functions.similarity import (
    kmeans_centroids,
    knn_graph,
)


def _cos(a, b):
    num = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    return round(num / (na * nb), 9)


def _brute_topk(vecs: dict, k: int):
    want = set()
    for i, v in vecs.items():
        sims = sorted(
            ((_cos(v, w), -j) for j, w in vecs.items() if j != i), reverse=True
        )
        for rank, (c, nj) in enumerate(sims[:k], start=1):
            want.add((i, -nj, c, rank))
    return want


def test_single_cell_equals_brute_force(spark):
    # n_centroids=1: every vector lands in one cell -> the graph must
    # equal exact brute-force cosine top-k with the lower-id tie-break
    rng = random.Random(3)
    vecs = {i: [rng.uniform(-1, 1) for _ in range(6)] for i in range(30)}
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<double>"
    )
    out = knn_graph(df, "vec_id", "embedding", k=4, n_centroids=1)
    got = {(r.vec_id, r.neighbor_id, r.cosine, r.rank) for r in out.collect()}
    assert got == _brute_topk(vecs, 4)


def test_planted_clusters_full_recall_with_kmeans(spark):
    # 4 tight, well-separated clusters: every vector's true k nearest
    # live in its own cluster, so cell blocking loses nothing
    rng = random.Random(11)
    centers = [
        [10.0, 0.0, 0.0],
        [0.0, 10.0, 0.0],
        [0.0, 0.0, 10.0],
        [7.0, 7.0, 7.0],
    ]
    vecs = {}
    for ci, c in enumerate(centers):
        for j in range(12):
            vid = ci * 100 + j
            vecs[vid] = [x + rng.uniform(-0.05, 0.05) for x in c]
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<double>"
    )
    cents = kmeans_centroids(df, "vec_id", "embedding", n_centroids=4, seed=1)
    out = knn_graph(df, "vec_id", "embedding", k=3, centroids=cents)
    got = {(r.vec_id, r.neighbor_id, r.cosine, r.rank) for r in out.collect()}
    assert got == _brute_topk(vecs, 3)
    # and every neighbor is intra-cluster
    assert all(src // 100 == nb // 100 for src, nb, _, _ in got)


def test_singleton_cell_emits_no_rows(spark):
    # vec 99 is orthogonal to everything and becomes its own cell
    rows = [(0, [1.0, 0.0]), (1, [0.9, 0.1]), (99, [0.0, 1.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], "vec_id long, embedding array<double>"
    )
    out = knn_graph(df, "vec_id", "embedding", k=2, centroids=cents).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r.vec_id, []).append(r.neighbor_id)
    assert by_src == {0: [1], 1: [0]}  # 99 alone in its cell: no rows


def test_k_guard(spark):
    df = spark.createDataFrame([(0, [1.0])], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="k must be"):
        knn_graph(df, "vec_id", "embedding", k=0)


def test_knn_components_two_planted_groups(spark, tmp_path):
    """s8 composition: two tight angular clusters in one cell must
    resolve to exactly two components labeled by their minimum id;
    a singleton cell labels itself."""
    import pandas as pd

    rows = (
        # group A: exactly-collinear scaled copies of [1,0,0], ids 0..4 —
        # round-9 cosine 1.0 to every A centroid, tie -> cell 0
        [(i, [float(i + 1), 0.0, 0.0]) for i in range(5)]
        # loner: id 5 IS a centroid, alone in its direction -> its own
        # cell, no knn rows, the coalesce self-label path
        + [(5, [0.0, 0.0, 1.0])]
        # group B: collinear copies of [0,1,0], ids 10..14 -> cell 10
        + [(10 + i, [0.0, float(i + 1), 0.0]) for i in range(5)]
    )
    pdf = pd.DataFrame(rows, columns=["vec_id", "embedding"])
    spark.createDataFrame(pdf, "vec_id long, embedding array<double>").write.parquet(
        f"{tmp_path}/embeddings.parquet"
    )
    from diffdataflowmlpipelines_spark.plans.datapipeline_queries import (
        s8_knn_components,
    )

    out = {r.vec_id: r.component for r in s8_knn_components(spark, str(tmp_path)).collect()}
    assert {out[i] for i in range(5)} == {0}
    assert {out[10 + i] for i in range(5)} == {10}
    assert out[5] == 5
    assert len(out) == 11


def test_zero_norm_vectors_excluded(spark):
    # zero-norm vectors have no direction: excluded before centroid
    # selection AND pairing (the generated s7/s8 oracles mirror this
    # via their nz CTE + ORDER BY/LIMIT centroid pick)
    rows = [(0, [0.0, 0.0]), (1, [1.0, 0.0]), (2, [2.0, 0.0]), (3, [0.9, 0.1])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = knn_graph(df, "vec_id", "embedding", k=3, n_centroids=2)
    ids = {r.vec_id for r in out.collect()} | {r.neighbor_id for r in out.collect()}
    assert 0 not in ids and ids == {1, 2, 3}


def test_knn_graph_hot_cell_subsplit(spark):
    """The semantic_dedup verdict-r4-#2 hazard, knn_graph face: a
    planted hot cell must sub-split under max_cell — planted exact
    duplicates stay rank-1 neighbors of each other, and (at k >= cell
    size) the capped edge set is a subset of the exact edge set
    (sub-splitting only removes comparisons)."""
    import numpy as np

    rng = np.random.default_rng(7)
    dim = 8
    rows = []
    # hot cell: 120 vectors near +e0, angularly spread
    for i in range(120):
        v = rng.standard_normal(dim) * 0.8
        v[0] = abs(v[0]) + 2.0
        rows.append((i, [float(x) for x in v]))
    # planted exact duplicates inside the hot cell (higher id copies)
    dups = [(1000 + j, list(rows[src][1])) for j, src in enumerate((3, 57, 99))]
    rows += dups
    # cold cell: 10 vectors near +e1
    for i in range(10):
        v = rng.standard_normal(dim) * 0.1
        v[1] = abs(v[1]) + 2.0
        rows.append((2000 + i, [float(x) for x in v]))
    cents = spark.createDataFrame(
        [(0, [1.0] + [0.0] * (dim - 1)), (1, [0.0, 1.0] + [0.0] * (dim - 2))],
        "vec_id long, embedding array<double>",
    )
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    big_k = 200  # >= hot-cell size: top-k truncation never hides an edge
    exact = {
        (r.vec_id, r.neighbor_id)
        for r in knn_graph(
            df, "vec_id", "embedding", k=big_k, centroids=cents
        ).collect()
    }
    capped_rows = knn_graph(
        df, "vec_id", "embedding", k=big_k, centroids=cents, max_cell=16
    ).collect()
    capped = {(r.vec_id, r.neighbor_id) for r in capped_rows}
    assert capped <= exact
    assert len(capped) < len(exact)  # the hot cell actually split
    # identical directions always share a sub-cell: each planted
    # duplicate's rank-1 neighbor is its source (cosine 1.0)
    rank1 = {r.vec_id: (r.neighbor_id, r.cosine) for r in capped_rows if r.rank == 1}
    for (dup_id, _), src in zip(dups, (3, 57, 99)):
        assert rank1[dup_id] == (src, 1.0)
        assert rank1[src] == (dup_id, 1.0)


def test_knn_graph_max_cell_parity_when_large(spark):
    """max_cell at or above every cell size must be a bit-for-bit
    no-op vs exact mode (sub-split width is 0 bits for within-cap
    cells), including under bands > 1."""
    rng = random.Random(5)
    vecs = {i: [rng.uniform(-1, 1) for _ in range(5)] for i in range(40)}
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<double>"
    )
    exact = {
        (r.vec_id, r.neighbor_id, r.cosine, r.rank)
        for r in knn_graph(df, "vec_id", "embedding", k=3, n_centroids=2).collect()
    }
    for bands in (1, 4):
        capped = {
            (r.vec_id, r.neighbor_id, r.cosine, r.rank)
            for r in knn_graph(
                df,
                "vec_id",
                "embedding",
                k=3,
                n_centroids=2,
                max_cell=1000,
                subsplit_bands=bands,
            ).collect()
        }
        assert capped == exact, bands


def test_knn_graph_banded_ranks_are_dense(spark):
    """bands > 1 on an over-cap cell: a pair colliding in several bands
    must not burn duplicate ranks — per source, ranks are exactly
    1..n with distinct neighbors."""
    import numpy as np

    rng = np.random.default_rng(13)
    rows = []
    for i in range(60):
        v = rng.standard_normal(6) * 0.5
        v[0] = abs(v[0]) + 2.0
        rows.append((i, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0, 0.0, 0.0, 0.0])], "vec_id long, embedding array<double>"
    )
    out = knn_graph(
        df, "vec_id", "embedding", k=5, centroids=cents,
        max_cell=8, subsplit_bands=4,
    ).collect()
    by_src: dict = {}
    for r in out:
        by_src.setdefault(r.vec_id, []).append((r.rank, r.neighbor_id))
    for src, lst in by_src.items():
        ranks = sorted(rk for rk, _ in lst)
        assert ranks == list(range(1, len(lst) + 1)), src
        nbrs = [nb for _, nb in lst]
        assert len(set(nbrs)) == len(nbrs), src
