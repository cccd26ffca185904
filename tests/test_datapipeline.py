"""Training-data-pipeline ops: dedup recall, ANN recall vs brute force,
multimodal plumbing, text analysis sanity."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from diffdataflowmlpipelines_spark.functions.dedup import (
    exact_dedup,
    jaccard_pairs,
    minhash_lsh_candidates,
    minhash_signatures,
    simhash,
)
from diffdataflowmlpipelines_spark.functions.multimodal import (
    FEATURE_DIM,
    FEATURES_SCHEMA,
    extract_media_features,
    frame_sample_plan,
    synthetic_media_df,
)
from diffdataflowmlpipelines_spark.functions.similarity import cosine_topk, lsh_topk


@pytest.fixture(scope="module")
def near_dup_docs(spark):
    """60 docs in 20 clusters of 3: two near-identical (one token changed),
    one unrelated — ground truth for dedup recall."""
    rng = np.random.default_rng(5)
    rows = []
    for c in range(20):
        base = [f"w{int(x)}" for x in rng.integers(0, 50, size=30)]
        near = list(base)
        near[7] = "CHANGED"
        other = [f"w{int(x)}" for x in rng.integers(50, 120, size=30)]
        rows += [
            (c * 3 + 0, base),
            (c * 3 + 1, near),
            (c * 3 + 2, other),
        ]
    return spark.createDataFrame(rows, "doc_id long, toks array<string>")


def test_minhash_lsh_finds_near_dups(spark, near_dup_docs):
    sigs = minhash_signatures(near_dup_docs, "doc_id", "toks", n_hashes=16)
    cands = minhash_lsh_candidates(sigs, "doc_id", bands=8)
    verified = jaccard_pairs(
        near_dup_docs, "doc_id", "toks", threshold=0.5, candidates=cands
    )
    pairs = {(r["a"], r["b"]) for r in verified.collect()}
    want = {(c * 3, c * 3 + 1) for c in range(20)}
    recall = len(pairs & want) / len(want)
    assert recall >= 0.9, f"LSH near-dup recall {recall}"
    # no false positives above the jaccard threshold (exact verify stage)
    assert all(p in want for p in pairs)


def test_simhash_near_dups_close(spark, near_dup_docs):
    sh = {r["doc_id"]: r["simhash"] for r in simhash(near_dup_docs, "doc_id", "toks", bits=48).collect()}
    ham = lambda a, b: bin(a ^ b).count("1")  # noqa: E731
    near = [ham(sh[c * 3], sh[c * 3 + 1]) for c in range(20)]
    far = [ham(sh[c * 3], sh[c * 3 + 2]) for c in range(20)]
    assert np.mean(near) < np.mean(far) - 5
    assert max(near) <= 14  # one-token change flips few of the 48 bits


def test_exact_dedup_groups(spark):
    df = spark.createDataFrame(
        [(1, "x", "a"), (2, "x", "a"), (3, "y", "b")], "id long, u string, v string"
    )
    got = {r["keep_id"]: r["n_dups"] for r in exact_dedup(df, "id", ["u", "v"]).collect()}
    assert got == {1: 2, 3: 1}


def test_lsh_ann_recall_vs_brute_force(spark):
    # clustered corpus (the workload ANN indexes exist for): 50 centers x 8
    # members; true neighbors are same-cluster, cosine ~0.95+
    rng = np.random.default_rng(9)
    centers = rng.standard_normal((50, 64))
    vecs = np.repeat(centers, 8, axis=0) + 0.12 * rng.standard_normal((400, 64))
    df = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    queries = df.filter(F.col("vec_id") < 12)
    exact = cosine_topk(df, queries, "vec_id", "embedding", k=5)
    approx = lsh_topk(df, queries, "vec_id", "embedding", k=5, n_planes=8, dim=64)
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.8, f"ANN recall {recall} too low on clustered corpus"


def test_ivf_ann_recall_vs_brute_force(spark):
    # same clustered corpus as the LSH test; centroids = seeded sample
    # (lowest-key rows), nprobe=3 of 16 cells
    from diffdataflowmlpipelines_spark.functions.similarity import ivf_topk

    rng = np.random.default_rng(9)
    centers = rng.standard_normal((50, 64))
    vecs = np.repeat(centers, 8, axis=0) + 0.12 * rng.standard_normal((400, 64))
    df = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    queries = df.filter(F.col("vec_id") < 12)
    exact = cosine_topk(df, queries, "vec_id", "embedding", k=5)
    # seeded-sample centroids must SPREAD over the data: one member per
    # true cluster (ids 0, 8, 16, ... are the first member of each);
    # the default lowest-key init would draw all 16 from 2 clusters
    cents = df.filter((F.col("vec_id") % 8 == 0) & (F.col("vec_id") < 128))
    approx = ivf_topk(
        df, queries, "vec_id", "embedding", k=5, nprobe=3, centroids=cents
    )
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.8, f"IVF recall {recall} too low on clustered corpus"


def test_media_feature_plumbing(spark):
    media = synthetic_media_df(spark, 60, seed=3)
    feats = extract_media_features(media)
    rows = feats.collect()
    assert len(rows) == 60
    assert all(len(r["features"]) == FEATURE_DIM for r in rows)
    # deterministic: same payload -> same features
    again = {r["media_id"]: r["features"] for r in extract_media_features(media).collect()}
    first = {r["media_id"]: r["features"] for r in rows}
    assert again == first
    # frame sampling fans out only videos, inclusive of t=0
    plan = frame_sample_plan(media, every_ms=10_000)
    vids = media.filter("kind = 'video'").count()
    per_vid = plan.groupBy("media_id").count()
    assert per_vid.count() == vids
    assert plan.filter("frame_ms = 0").count() == vids


def test_dup_clusters_connected_components(spark):
    from diffdataflowmlpipelines_spark.functions.dedup import dup_clusters

    # two chains and a singleton pair: {1-2-3}, {10-11}, {20-21}
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21)], "a long, b long"
    )
    got = {r["doc"]: r["cluster_rep"] for r in dup_clusters(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20, 21: 20}


def test_dup_clusters_star_matches_label_propagation(spark):
    """large-star/small-star (the O(log n)-round 100 TB path) must
    produce identical components to min-label propagation on adversarial
    shapes: a long chain (worst case for propagation), a clique, random
    sparse edges, and singleton pairs."""
    from diffdataflowmlpipelines_spark.functions.dedup import (
        dup_clusters,
        dup_clusters_star,
    )

    rng = np.random.default_rng(17)
    edges = []
    edges += [(i, i + 1) for i in range(100, 140)]          # 41-node chain
    edges += [(200 + i, 200 + j) for i in range(6) for j in range(i)]  # K6
    base = rng.integers(300, 380, size=(40, 2)).tolist()     # random sparse
    edges += [(int(a), int(b)) for a, b in base if a != b]
    edges += [(500, 501), (600, 601)]
    pairs = spark.createDataFrame(edges, "a long, b long")

    prop = {r["doc"]: r["cluster_rep"] for r in dup_clusters(pairs, max_iter=60).collect()}
    star = {r["doc"]: r["cluster_rep"] for r in dup_clusters_star(pairs).collect()}
    assert star == prop
    # chain collapses to its minimum — the shape where propagation needs
    # O(length) rounds and star needs O(log)
    assert star[139] == 100 and star[140] == 100


def test_ivf_kmeans_centroids_improve_recall(spark):
    """VERDICT r2 item 4: KMeans-refined centroids must strictly beat
    the default sample-init (lowest-key rows) at equal nprobe on a
    clustered corpus. Lowest-key init draws all centroids from the
    first few clusters — most cells empty, assignments near-random."""
    from diffdataflowmlpipelines_spark.functions.similarity import (
        ivf_topk,
        kmeans_centroids,
    )

    rng = np.random.default_rng(9)
    centers = rng.standard_normal((50, 64))
    vecs = np.repeat(centers, 8, axis=0) + 0.12 * rng.standard_normal((400, 64))
    df = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    queries = df.filter(F.col("vec_id") < 12)
    exact = cosine_topk(df, queries, "vec_id", "embedding", k=5)
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}

    def recall(cents):
        approx = ivf_topk(
            df, queries, "vec_id", "embedding", k=5, nprobe=3,
            n_centroids=16, centroids=cents,
        )
        a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
        return len(e & a) / len(e)

    r_sample = recall(None)  # default lowest-key init (ids 0..15 = 2 clusters)
    km = kmeans_centroids(
        df, "vec_id", "embedding", n_centroids=16, seed=7
    )
    r_kmeans = recall(km)
    assert r_kmeans > r_sample, (r_kmeans, r_sample)
    assert r_kmeans >= 0.8, f"KMeans-IVF recall {r_kmeans}"


@pytest.mark.parametrize("decoder", ["stub", "histogram"])
def test_media_decode_fn_contract(spark, decoder):
    """VERDICT r2 item 8: ANY bytes -> float32[FEATURE_DIM] decoder
    drop-in must satisfy extract_media_features' schema + determinism
    contract, so the production PIL/ffmpeg swap is provably safe.
    (Decoders are defined in-closure: cloudpickle ships them by value —
    test modules are not importable on executors.)"""

    def histogram_decoder(payload: bytes):
        # trivial second decoder: 16-bucket byte histogram, L1-normalized
        counts = np.bincount(
            np.frombuffer(payload, dtype=np.uint8) >> 4, minlength=FEATURE_DIM
        ).astype(np.float64)
        return (counts / max(counts.sum(), 1)).astype(np.float32)

    decode_fn = None if decoder == "stub" else histogram_decoder
    media = synthetic_media_df(spark, 45, seed=5)
    out = extract_media_features(media, decode_fn=decode_fn)
    assert out.schema == FEATURES_SCHEMA
    rows = out.collect()
    assert len(rows) == 45
    for r in rows:
        assert len(r["features"]) == FEATURE_DIM
        assert isinstance(r["feat_checksum"], int)
    # determinism: a second full run yields identical rows
    again = {
        r["media_id"]: (r["features"], r["feat_checksum"])
        for r in extract_media_features(media, decode_fn=decode_fn).collect()
    }
    assert again == {
        r["media_id"]: (r["features"], r["feat_checksum"]) for r in rows
    }


def test_media_decode_fn_wrong_dim_rejected(spark):
    """A decoder violating the fixed-dim contract must fail loudly in
    the executor, not silently mis-shape the feature column."""
    media = synthetic_media_df(spark, 3, seed=5)
    bad = extract_media_features(
        media, decode_fn=lambda p: np.zeros(FEATURE_DIM + 1, dtype=np.float32)
    )
    with pytest.raises(Exception, match="decode_fn must return shape"):
        bad.collect()


def test_cluster_profile_recovers_planted_clusters(spark):
    from diffdataflowmlpipelines_spark.functions.similarity import (
        cluster_profile,
        kmeans_centroids,
    )

    # 4 well-separated centers x 25 members; with KMeans centroids the
    # profile must recover exactly 4 clusters of 25 with high cohesion
    rng = np.random.default_rng(11)
    centers = rng.standard_normal((4, 16)) * 4.0
    vecs = np.repeat(centers, 25, axis=0) + 0.05 * rng.standard_normal((100, 16))
    df = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    cents = kmeans_centroids(df, "vec_id", "embedding", n_centroids=4, seed=3)
    prof = cluster_profile(df, "vec_id", "embedding", centroids=cents)
    rows = prof.collect()
    assert len(rows) == 4
    assert sorted(r["n_members"] for r in rows) == [25, 25, 25, 25]
    assert all(r["avg_cosine"] > 0.99 for r in rows)
    assert all(r["min_cosine"] <= r["avg_cosine"] for r in rows)


def test_semantic_dedup_planted(spark):
    from diffdataflowmlpipelines_spark.functions.similarity import semantic_dedup

    cents = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    rows = [
        (10, [1.0, 0.05, 0.0, 0.0]),  # cell 0 representative
        (11, [1.0, 0.06, 0.0, 0.0]),  # ~copy of 10 -> dropped
        (12, [0.7, 0.3, 0.6, 0.0]),  # cell 0 but wide angle -> kept
        (20, [0.05, 1.0, 0.0, 0.0]),  # cell 1 representative
        (21, [0.06, 1.0, 0.0, 0.0]),  # ~copy of 20 -> dropped
        # cos(30, 31) = 0.995 >= tau, but they land in DIFFERENT cells:
        # SemDeDup is cell-scoped, so both survive
        (30, [0.74, 0.67, 0.0, 0.0]),
        (31, [0.67, 0.74, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = semantic_dedup(
        df, "vec_id", "embedding", threshold=0.9, centroids=cents
    )
    got = {r["vec_id"]: (r["cluster_id"], r["keep"]) for r in out.collect()}
    assert got == {
        10: (0, 1),
        11: (0, 0),
        12: (0, 1),
        20: (1, 1),
        21: (1, 0),
        30: (0, 1),
        31: (1, 1),
    }


def test_semantic_dedup_zero_vectors_excluded(spark):
    from diffdataflowmlpipelines_spark.functions.similarity import semantic_dedup

    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 0.0]), (2, [1.0, 0.01])],
        "vec_id long, embedding array<double>",
    )
    out = semantic_dedup(df, "vec_id", "embedding", threshold=0.9, n_centroids=1)
    got = {r["vec_id"]: r["keep"] for r in out.collect()}
    # zero-norm row 1 has no cosine and is excluded up front
    assert got == {0: 1, 2: 0}


def test_cluster_profile_dim_mismatch_raises(spark):
    from diffdataflowmlpipelines_spark.functions.similarity import cluster_profile

    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], "vec_id long, embedding array<double>"
    )
    bad = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(Exception, match="dim"):
        cluster_profile(df, "vec_id", "embedding", centroids=bad)


def test_semantic_dedup_hot_cell_subsplit(spark):
    """verdict r4 #2: a planted hot cell (80%+ of rows in ONE centroid
    cell) must sub-split under max_cell — planted duplicates still
    drop, pair width is bounded, and capped drops are a subset of the
    exact-mode drops (sub-splitting only removes comparisons)."""
    import numpy as np

    from diffdataflowmlpipelines_spark.functions.similarity import (
        _nearest_assign,
        _subsplit_hot_cells,
        semantic_dedup,
    )

    rng = np.random.default_rng(7)
    dim = 8
    rows = []
    # hot cell: 400 vectors near +e0, angularly spread
    for i in range(400):
        v = rng.standard_normal(dim) * 0.8
        v[0] = abs(v[0]) + 2.0
        rows.append((i, [float(x) for x in v]))
    # planted exact duplicates inside the hot cell (higher id copies)
    for j, src in enumerate((3, 57, 123, 250)):
        rows.append((1000 + j, list(rows[src][1])))
    # cold cell: 40 vectors near +e1
    for i in range(40):
        v = rng.standard_normal(dim) * 0.1
        v[1] = abs(v[1]) + 2.0
        rows.append((2000 + i, [float(x) for x in v]))
    cents = spark.createDataFrame(
        [(0, [1.0] + [0.0] * (dim - 1)), (1, [0.0, 1.0] + [0.0] * (dim - 2))],
        "vec_id long, embedding array<double>",
    )
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    exact = {
        r["vec_id"]: r["keep"]
        for r in semantic_dedup(
            df, "vec_id", "embedding", threshold=0.999, centroids=cents
        ).collect()
    }
    capped = {
        r["vec_id"]: r["keep"]
        for r in semantic_dedup(
            df,
            "vec_id",
            "embedding",
            threshold=0.999,
            centroids=cents,
            max_cell=32,
        ).collect()
    }
    assert set(capped) == set(exact)
    # identical directions always share a sub-cell: every planted
    # duplicate still drops under the cap
    for j in range(4):
        assert capped[1000 + j] == 0, j
    # sub-splitting only REMOVES comparisons: capped drops ⊆ exact drops
    assert {k for k, v in capped.items() if v == 0} <= {
        k for k, v in exact.items() if v == 0
    }

    # pair-width bound: the hot cell (404 rows) sub-splits; the cold
    # cell (40 <= 32? no, 40 > 32 — both split, cold barely)
    assigned = _nearest_assign(
        df, "vec_id", "embedding", n_centroids=0, centroids=cents,
        round_to=9, what="test",
    ).localCheckpoint(eager=True)
    sub = _subsplit_hot_cells(assigned, max_cell=32, seed=42, max_planes=16)
    sizes = (
        sub.groupBy("cluster_id", "__sub")
        .count()
        .groupBy("cluster_id")
        .agg(F.max("count").alias("mx"), F.sum(F.col("count") ** 2).alias("p2"))
        .collect()
    )
    by_cell = {r["cluster_id"]: r for r in sizes}
    # hot cell: 404 rows, 4 sign bits -> 16 sub-cells; pair mass far
    # below the unsplit 404^2, and the largest sub-cell well under the
    # cell size (spread directions split; only true duplicates collide)
    assert by_cell[0]["mx"] < 150
    assert by_cell[0]["p2"] < 404 * 404 / 4


def test_semantic_dedup_subsplit_bands_recall(spark):
    """OR-banding recall knob (VERDICT r4 #2 follow-through): NEAR
    duplicates (not identical — cos ≈ 0.95-0.99) inside a hot cell can
    straddle a single band's sub-cells; extra bands only ADD
    comparisons (band 0 reuses the single-band planes), so drops are
    monotone in bands and recall of planted near-dups approaches the
    exact mode's."""
    import numpy as np

    from diffdataflowmlpipelines_spark.functions.similarity import (
        semantic_dedup,
    )

    rng = np.random.default_rng(11)
    dim = 8
    rows = []
    # hot cell: 360 vectors near +e0, angularly spread
    for i in range(360):
        v = rng.standard_normal(dim) * 0.8
        v[0] = abs(v[0]) + 2.0
        rows.append((i, [float(x) for x in v]))
    # planted NEAR-duplicates of hot-cell rows: v' = v + noise, noise
    # sized so cos(v, v') lands ~0.95-0.99 — high-similarity redundant
    # pairs, but NOT identical directions (those trivially collide)
    planted = list(range(0, 300, 12))  # 25 sources
    for j, src in enumerate(planted):
        v = np.array(rows[src][1])
        vp = v + rng.standard_normal(dim) * (np.linalg.norm(v) * 0.08)
        rows.append((1000 + j, [float(x) for x in vp]))
    cents = spark.createDataFrame(
        [(0, [1.0] + [0.0] * (dim - 1)), (1, [0.0, 1.0] + [0.0] * (dim - 2))],
        "vec_id long, embedding array<double>",
    )
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    def drops(**kw):
        return {
            r["vec_id"]
            for r in semantic_dedup(
                df, "vec_id", "embedding", threshold=0.93, centroids=cents, **kw
            ).collect()
            if r["keep"] == 0
        }

    exact = drops()
    one_band = drops(max_cell=24, subsplit_bands=1)
    four_bands = drops(max_cell=24, subsplit_bands=4)

    # planted near-dups that the exact mode drops (ground truth)
    truth = {1000 + j for j in range(len(planted))} & exact
    assert len(truth) >= 20  # the planting actually creates dups

    # capped drops never exceed exact; bands only add drops
    assert one_band <= exact and four_bands <= exact
    assert one_band <= four_bands

    # recall on planted near-dups: banding must recover (nearly) all
    # of what the single band misses on this corpus
    r1 = len(one_band & truth) / len(truth)
    r4 = len(four_bands & truth) / len(truth)
    assert r4 >= r1
    assert r4 >= 0.9, (r1, r4)

    # output stays one row per input despite the ×bands pair fan-out
    n_out = semantic_dedup(
        df, "vec_id", "embedding", threshold=0.93, centroids=cents,
        max_cell=24, subsplit_bands=4,
    ).count()
    assert n_out == len(rows)


def test_semantic_dedup_empty_corpus_with_cap(spark):
    """An empty corpus with max_cell set must return empty, not crash —
    both the engine path (dim threaded from the collected centroids)
    and the direct-caller fallback (probe first() is None on empty)."""
    from diffdataflowmlpipelines_spark.functions.similarity import (
        _subsplit_hot_cells,
        semantic_dedup,
    )

    df = spark.createDataFrame([], "vec_id long, embedding array<double>")
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    out = semantic_dedup(
        df, "vec_id", "embedding", threshold=0.9, centroids=cents, max_cell=8
    )
    assert out.count() == 0
    empty_assigned = spark.createDataFrame(
        [],
        "__id long, __vec array<double>, __vn double, "
        "cluster_id long, __cos double",
    )
    sub = _subsplit_hot_cells(empty_assigned, max_cell=8, seed=1, max_planes=4)
    assert sub.count() == 0 and "__sub" in sub.columns


def test_embedding_dim_stats_closed_form(spark):
    from diffdataflowmlpipelines_spark.functions.similarity import (
        embedding_dim_stats,
    )

    # dim0: {1, 3} -> mean 2, std_pop 1; dim1: {2, 6} -> mean 4, std 2;
    # the NULL vector contributes to no dimension
    df = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, [3.0, 6.0]), (2, None)],
        "vec_id long, embedding array<double>",
    )
    got = {
        r["dim"]: (r["n"], r["mean"], r["std"], r["min"], r["max"])
        for r in embedding_dim_stats(df, "embedding").collect()
    }
    assert got == {
        0: (2, 2.0, 1.0, 1.0, 3.0),
        1: (2, 4.0, 2.0, 2.0, 6.0),
    }
