"""Deduplication operators for large-scale training-data pipelines —
exact, MinHash+LSH, SimHash, and n-gram-Jaccard near-dup. These extend
the reference's operator inventory (its only hashing structure is the
HashVectorizer, ``feature_extraction/hash_vectorizer.rs``); at 100 TB
dedup is the first pipeline stage, so everything here is shuffle-lean:
candidate generation via bucket equi-joins (never all-pairs), verify
only within buckets.

Portable hash: ``md5_hash60`` (60-bit integer from the md5 hex prefix)
is bit-identical in Spark and DuckDB, so every operator here is oracle-
checkable cross-engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Mersenne-31: keeps every product under 2^62, so the same arithmetic
# is overflow-free int64 in Spark, DuckDB, and numpy alike.
MERSENNE_P = (1 << 31) - 1

# join separator for shingles/content keys: chr(1) prevents boundary
# collisions ("ab"+"c" vs "a"+"bc"); expressed as chr(1) in oracle SQL too.
SEP = chr(1)


def md5_hash60(c: Column) -> Column:
    """Engine-portable 60-bit hash: int(md5(x)[:15], 16)."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def true_word_shingles(tokens: Column, n: int = 3) -> Column:
    """``word_shingles`` WITHOUT the short-document whole-doc fallback:
    documents shorter than ``n`` tokens yield an EMPTY array. The
    fallback exists for MinHash's benefit (every doc needs a non-empty
    set to sign); set-overlap statistics (t22 source overlap, t23
    novelty) want true n-grams only — this keeps that convention in
    one place."""
    return F.when(F.size(tokens) >= n, word_shingles(tokens, n)).otherwise(
        F.array().cast("array<string>")
    )


def _minhash_params(n_hashes: int, seed: int = 42) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for h_i(x) = (a*(x mod p) + b) mod p —
    LCG-seeded, reproducible in SQL as literals."""
    params, s = [], seed
    for _ in range(n_hashes):
        s = (s * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        a = (s % (MERSENNE_P - 1)) + 1
        s = (s * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        b = s % MERSENNE_P
        params.append((a, b))
    return params


NULL_SENTINEL = chr(2)  # concat_ws SKIPS nulls — distinct null layouts
# would otherwise collide; every element is coalesced to this marker


def word_shingles(tokens: Column, n: int = 3) -> Column:
    """n-gram shingles over a token array (strings or ints), as strings
    joined by SEP = chr(1) (collision-proof concat; NULL tokens encode
    as a sentinel so ['a', NULL] and ['a'] do not collide).

    Known degenerate collision (by design, DO NOT change casually): a
    NULL array, an empty array, and [''] all fall through the short-doc
    fallback to the same {''} shingle set, so fully-degenerate documents
    MinHash as duplicates of each other and NULL-vs-empty provenance is
    not recoverable from signatures. Collapse degenerate docs upstream
    with d1's exact dedup if they must stay distinct. The behavior is
    replicated verbatim in every generated SQL oracle (d2/d3/d6/d7) and
    the python twins — changing it means changing all of them together.
    ``true_word_shingles`` (below) is the no-fallback variant set
    statistics use."""
    idx = F.sequence(F.lit(0), F.size(tokens) - n)
    elem = lambda i, j: F.coalesce(  # noqa: E731
        F.element_at(tokens, (i + j + 1).cast("int")).cast("string"),
        F.lit(NULL_SENTINEL),
    )
    return F.when(
        F.size(tokens) >= n,
        F.transform(
            idx,
            lambda i: F.concat_ws(SEP, *[elem(i, j) for j in range(n)]),
        ),
    ).otherwise(
        F.array(
            F.concat_ws(
                SEP,
                F.transform(
                    tokens,
                    lambda t: F.coalesce(t.cast("string"), F.lit(NULL_SENTINEL)),
                ),
            )
        )
    )


def exact_dedup(df: DataFrame, key: str, content_cols: list[str]) -> DataFrame:
    """Exact dedup on an md5 content fingerprint; the representative is
    the min key per group (deterministic). Returns
    (content_hash, keep_id, n_dups). One shuffle on the hash."""
    # coalesce per column: concat_ws skips NULLs, so ('a', NULL, 'b')
    # and ('a', 'b', NULL) would otherwise share a fingerprint and merge
    # two genuinely different rows as duplicates
    fp = F.md5(
        F.concat_ws(
            SEP,
            *[
                F.coalesce(F.col(c).cast("string"), F.lit(NULL_SENTINEL))
                for c in content_cols
            ],
        )
    )
    return (
        df.withColumn("content_hash", fp)
        .groupBy("content_hash")
        .agg(
            F.min(key).alias("keep_id"),
            F.count("*").cast("long").alias("n_dups"),
        )
    )


def minhash_signatures(
    df: DataFrame,
    key: str,
    tokens_col: str,
    *,
    n_hashes: int = 16,
    shingle_n: int = 3,
    seed: int = 42,
) -> DataFrame:
    """MinHash signature per document: shingle -> portable 60-bit hash
    -> n_hashes independent (a*h+b) mod p minima. Output: (key,
    sig: array<long>). Distributed: explode + single groupBy(key)."""
    params = _minhash_params(n_hashes, seed)
    sh = df.select(
        key, F.explode(word_shingles(F.col(tokens_col), shingle_n)).alias("__s")
    ).dropDuplicates([key, "__s"])
    sh = sh.withColumn("__h", md5_hash60(F.col("__s")) % F.lit(MERSENNE_P))
    mins = [
        F.min((F.lit(a) * F.col("__h") + F.lit(b)) % F.lit(MERSENNE_P)).alias(f"__m{i}")
        for i, (a, b) in enumerate(params)
    ]
    agg = sh.groupBy(key).agg(*mins)
    return agg.select(
        key, F.array(*[f"__m{i}" for i in range(n_hashes)]).alias("sig")
    )


def minhash_signatures_rowwise(
    df: DataFrame,
    key: str,
    tokens_col: str,
    *,
    n_hashes: int = 16,
    shingle_n: int = 3,
    seed: int = 42,
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """MinHash as a PURE PROJECTION — zero shuffle, zero state.

    The signature is a per-document statistic, so it never needed the
    explode + groupBy of :func:`minhash_signatures` (kept as the oracle
    twin): each row's shingle set lives in its own token array, so
    min((a*h+b) mod p) folds over the array JVM-side. At 100 TB this is
    the difference between a full-corpus shuffle and a map-only scan;
    it is also what makes MinHash usable on an unbounded STREAM (a
    stateless select — see streaming/dedup.py). Bit-identical output to
    minhash_signatures (parity-tested). ``passthrough`` columns (e.g.
    event_time for the streaming self-join) are carried alongside."""
    params = _minhash_params(n_hashes, seed)
    sh = F.array_distinct(word_shingles(F.col(tokens_col), shingle_n))
    hashes = F.transform(
        sh, lambda s: md5_hash60(s) % F.lit(MERSENNE_P)
    )
    # hoist the md5 array into its own projection: each of the n_hashes
    # mins references it, and CollapseProject does not inline non-cheap
    # exprs with multiple references — without this the md5s are inlined
    # into every min and computed n_hashes times per row (measured 4x
    # slower than the grouped form; hoisted, rowwise wins)
    with_h = df.select(key, *passthrough, hashes.alias("__hs"))
    mins = [
        F.array_min(
            F.transform(
                F.col("__hs"),
                lambda h: (F.lit(a) * h + F.lit(b)) % F.lit(MERSENNE_P),
            )
        )
        for (a, b) in params
    ]
    return with_h.select(key, *passthrough, F.array(*mins).alias("sig"))


def lsh_band_buckets(
    sig_col: Column, *, bands: int, sig_len: int
) -> Column:
    """(band, bucket) structs for a signature — shared by the batch
    candidate join and the streaming self-join. ``bands`` must divide
    ``sig_len`` exactly: r = 0 would hash every doc into one empty
    bucket (the full |corpus|^2 cross product the banding exists to
    avoid), and a remainder would silently ignore trailing hashes."""
    if bands < 1 or sig_len % bands != 0:
        raise ValueError(
            f"bands={bands} must divide sig_len={sig_len} with r >= 1"
        )
    r = sig_len // bands
    return F.array(
        *[
            F.struct(
                F.lit(i).alias("band"),
                F.concat_ws(
                    ",",
                    *[sig_col[i * r + j].cast("string") for j in range(r)],
                ).alias("bucket"),
            )
            for i in range(bands)
        ]
    )


def minhash_lsh_candidates(
    sigs: DataFrame, key: str, *, bands: int = 4, sig_len: int | None = None
) -> DataFrame:
    """Band the signature; docs sharing any band bucket are candidates.
    Returns distinct (a, b) pairs with a < b. Bucket join only — cost is
    sum over buckets of |bucket|^2, never |corpus|^2.

    ``sig_len`` avoids the driver-side peek (pass the ``n_hashes`` used
    to build the signatures); without it, an empty signatures frame
    yields an empty candidate frame."""
    if sig_len is None:
        head = sigs.head()
        if head is None:
            return (
                sigs.select(F.col(key).alias("a"), F.col(key).alias("b"))
                .limit(0)
            )
        sig_len = len(head["sig"])
    # band via the SHARED lsh_band_buckets (one implementation keeps
    # batch and streaming candidates bit-identical, and one guard)
    banded = sigs.select(
        F.col(key).alias("__id"),
        F.explode(
            lsh_band_buckets(F.col("sig"), bands=bands, sig_len=sig_len)
        ).alias("__bb"),
    ).select(
        "__id", F.col("__bb.band").alias("band"), F.col("__bb.bucket").alias("bucket")
    )
    # pin the banded frame before the self-join: Catalyst plans the
    # signature projection (a full corpus scan + minhash) once per join
    # side otherwise — ReuseExchange does not collapse the two branches
    # (round-3 VERDICT finding #3). localCheckpoint, not persist: blocks
    # are ContextCleaner-released, no session-lifetime leak.
    banded = banded.localCheckpoint(eager=True)
    left = banded.select("band", "bucket", F.col("__id").alias("a"))
    right = banded.select("band", "bucket", F.col("__id").alias("b"))
    return (
        left.join(right, ["band", "bucket"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .dropDuplicates()
    )


def _pair_intersections(
    df: DataFrame,
    key: str,
    tokens_col: str,
    *,
    shingle_n: int,
    candidates: DataFrame | None,
    max_shingle_df: int | None = None,
):
    """Shared machinery for set-overlap pair metrics (jaccard_pairs /
    containment_pairs): distinct (key, shingle) frame -> per-pair
    intersection counts ``(a, b, __i)`` plus per-doc set sizes
    ``(key, __sz)``. Candidate-driven when ``candidates`` is given (the
    scale path), shingle self-join otherwise (test scale only)."""
    sh = df.select(
        key, F.explode(word_shingles(F.col(tokens_col), shingle_n)).alias("__s")
    ).dropDuplicates([key, "__s"])
    # the shingle frame feeds FOUR subtrees (both intersection sides and
    # both size joins); uncheckpointed, Catalyst re-derives it — four
    # corpus scans + explodes + dedup shuffles (round-3 VERDICT #3).
    # One materialization, then sizes (|docs| rows) pinned likewise so
    # its aggregation runs once, not once per size join.
    sh = sh.localCheckpoint(eager=True)
    sizes = sh.groupBy(key).agg(F.count("*").alias("__sz"))
    sizes = sizes.localCheckpoint(eager=True)
    if candidates is not None:
        # dropDuplicates: a repeated (a, b) candidate would double-count
        # the intersection and inflate the metric past 1.0
        ca = candidates.select("a", "b").dropDuplicates()
        a_sh = sh.select(F.col(key).alias("a"), "__s")
        b_sh = sh.select(F.col(key).alias("b"), "__s")
        inter = (
            ca.join(a_sh, "a")
            .join(b_sh, ["b", "__s"])
            .groupBy("a", "b")
            .agg(F.count("*").alias("__i"))
        )
    else:
        join_sh = sh
        if max_shingle_df is not None:
            dfreq = sh.groupBy("__s").agg(F.count("*").alias("__df"))
            join_sh = sh.join(
                F.broadcast(dfreq.filter(F.col("__df") > max_shingle_df)),
                "__s",
                "left_anti",
            )
        l = join_sh.select(F.col(key).alias("a"), F.col("__s"))
        rr = join_sh.select(F.col(key).alias("b"), F.col("__s"))
        inter = (
            l.join(rr, "__s")
            .filter(F.col("a") < F.col("b"))
            .groupBy("a", "b")
            .agg(F.count("*").alias("__i"))
        )
    return inter, sizes


def jaccard_pairs(
    df: DataFrame,
    key: str,
    tokens_col: str,
    *,
    threshold: float = 0.5,
    shingle_n: int = 3,
    candidates: DataFrame | None = None,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Exact shingle-set Jaccard over candidate pairs. Returns
    (a, b, jaccard).

    With ``candidates`` (the scale path — feed
    ``minhash_lsh_candidates``), the intersection is CANDIDATE-PAIR-
    DRIVEN: each pair's shingle sets are equi-joined directly, so cost
    is sum over candidate pairs of |shingles(a)| — never the shingle
    self-join, whose cost is sum over shingles of docfreq² and melts
    the shuffle on one hot shingle at corpus scale.

    With ``candidates=None`` the all-pairs-sharing-a-shingle self-join
    is used (fine at test scale only); ``max_shingle_df`` caps the
    document frequency of shingles entering that join (a standard
    approximation — ubiquitous shingles carry no pair signal), at the
    cost of slightly under-counting intersections for capped shingles.
    """
    inter, sizes = _pair_intersections(
        df,
        key,
        tokens_col,
        shingle_n=shingle_n,
        candidates=candidates,
        max_shingle_df=max_shingle_df,
    )
    out = (
        inter.join(sizes.withColumnRenamed(key, "a").withColumnRenamed("__sz", "__sa"), "a")
        .join(sizes.withColumnRenamed(key, "b").withColumnRenamed("__sz", "__sb"), "b")
        .withColumn(
            "jaccard",
            F.col("__i") / (F.col("__sa") + F.col("__sb") - F.col("__i")),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return out.select("a", "b", F.round("jaccard", 6).alias("jaccard"))


def containment_pairs(
    df: DataFrame,
    key: str,
    tokens_col: str,
    *,
    threshold: float = 0.5,
    shingle_n: int = 3,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """ASYMMETRIC set-overlap over candidate pairs: containment
    ``C(A in B) = |A ∩ B| / |A|`` (Broder 1997's second resemblance
    measure) — the dedup signal Jaccard structurally under-reports when
    one document is a SUBSET of a larger one (a quote, a syndicated
    article inside a portal page, boilerplate wrapping): |A|=100 inside
    |B|=900 has Jaccard 0.11 but containment 1.0. Returns
    ``(a, b, cont_a_in_b, cont_b_in_a, containment)`` with
    ``containment = max of the two`` (= i / min(|A|,|B|)), filtered at
    ``threshold``, rounded to 6.

    Scale shape: identical to :func:`jaccard_pairs` — candidate-pair-
    driven intersection, checkpointed shingle/size frames, one rounded
    division per metric. Honest recall caveat: MinHash-LSH candidates
    recall by JACCARD, so an extreme size-ratio subset pair may never
    become a candidate — re-scoring candidates catches moderate-ratio
    subsets (where Jaccard clears the banding floor but understates the
    duplication); true small-in-huge substring duplication is d8's
    window-hash span machinery, which needs no pairing at all.
    Beyond-reference operator (reference has no dedup surface)."""
    inter, sizes = _pair_intersections(
        df, key, tokens_col, shingle_n=shingle_n, candidates=candidates
    )
    out = (
        inter.join(
            sizes.withColumnRenamed(key, "a").withColumnRenamed("__sz", "__sa"),
            "a",
        )
        .join(
            sizes.withColumnRenamed(key, "b").withColumnRenamed("__sz", "__sb"),
            "b",
        )
        .withColumn("__ca", F.col("__i") / F.col("__sa"))
        .withColumn("__cb", F.col("__i") / F.col("__sb"))
        .filter(F.greatest("__ca", "__cb") >= threshold)
    )
    return out.select(
        "a",
        "b",
        F.round("__ca", 6).alias("cont_a_in_b"),
        F.round("__cb", 6).alias("cont_b_in_a"),
        F.round(F.greatest("__ca", "__cb"), 6).alias("containment"),
    )


def simhash(
    df: DataFrame, key: str, tokens_col: str, *, bits: int = 32
) -> DataFrame:
    """SimHash fingerprint: per-bit majority vote of token hashes
    weighted by tf. Portable hash -> oracle-checkable. Returns
    (key, simhash: long). One explode + one groupBy(key) with `bits`
    JVM-side conditional sums — no Python in the path."""
    if not 1 <= bits <= 60:
        # md5_hash60 supplies 60 hash bits; bits 61-63 of the fingerprint
        # would be constant 0 while the caller believes they count
        raise ValueError("bits must be in [1, 60] (md5_hash60 width)")
    ex = (
        df.select(key, F.explode(F.col(tokens_col)).alias("__t"))
        .groupBy(key, "__t")
        .agg(F.count("*").alias("__tf"))
        .withColumn("__h", md5_hash60(F.col("__t").cast("string")))
    )
    bit_sums = [
        F.sum(
            F.when(F.shiftright("__h", b).bitwiseAND(F.lit(1)) == 1, F.col("__tf"))
            .otherwise(-F.col("__tf"))
        ).alias(f"__b{b}")
        for b in range(bits)
    ]
    agg = ex.groupBy(key).agg(*bit_sums)
    sim = None
    for b in range(bits):
        term = F.when(F.col(f"__b{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
        sim = term if sim is None else sim + term
    return agg.select(key, sim.cast("long").alias("simhash"))


def embedding_near_dups(
    df: DataFrame,
    key: str,
    vec_col: str,
    *,
    threshold: float = 0.95,
    block_bits: Column | None = None,
) -> DataFrame:
    """Embedding near-duplicates: pairs with cosine >= threshold.
    Candidate blocking via sign of the first principal-ish components
    (optional Column of bucket ids); default blocks on sign bits of the
    first 4 dims — near-identical vectors agree on signs w.h.p.

    NULL and zero-norm vectors are EXCLUDED (the similarity.py
    convention): a zero vector has no direction, and the cosine
    division would throw under Spark 4 ANSI mode (repo pitfall:
    division by zero throws even for doubles). Dimensions are guarded:
    the first row pins the expected width (similarity._check_dim
    convention — at least ``4`` for the default sign block) and every
    row is asserted against it in-plan, because a silent zip_with pad
    would null the cosine and DROP the pair instead of erroring."""
    v = F.col(vec_col)
    # probe AFTER dropping NULL vectors (advice r5 #1, mirroring
    # _check_dim): a NULL first row would leave dim=None and silently
    # disable both the dims<4 guard and the in-plan mixed-dim assert —
    # exactly the silent-pair-drop these guards exist to prevent
    row = df.filter(v.isNotNull()).select(F.size(v).alias("n")).first()
    if row is not None and row["n"] is not None:
        dim = int(row["n"])
        if block_bits is None and dim < 4:
            raise ValueError(
                f"embedding_near_dups: default sign block reads dims 0..3 "
                f"but vectors have {dim} dims — pass block_bits"
            )
    else:
        dim = None
    if block_bits is None:
        block_bits = F.concat_ws(
            "", *[(v[i] >= 0).cast("int").cast("string") for i in range(4)]
        )
    norm = F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x))
    base = df.select(
        F.col(key).alias("__id"), v.alias("__v"), norm.alias("__n"), block_bits.alias("__blk")
    ).filter(F.col("__n") > 0)
    if dim is not None:
        # assert_true feeds a filter so Catalyst cannot prune it; a
        # mixed-dimension row raises instead of silently vanishing.
        # The condition self-guards NULL/zero-norm rows (Catalyst may
        # evaluate this conjunct before the __n > 0 filter excludes
        # them): they pass here and die on the norm filter.
        base = base.filter(
            F.assert_true(
                F.when(
                    F.col("__n") > 0, F.size(F.col("__v")) == F.lit(dim)
                ).otherwise(F.lit(True)),
                F.lit(f"embedding_near_dups: mixed dims (expected {dim})"),
            ).isNull()
        )
    l = base.select(
        F.col("__id").alias("a"), F.col("__v").alias("__va"),
        F.col("__n").alias("__na"), "__blk",
    )
    rr = base.select(
        F.col("__id").alias("b"), F.col("__v").alias("__vb"),
        F.col("__n").alias("__nb"), "__blk",
    )
    dot = F.aggregate(
        F.zip_with("__va", "__vb", lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
    )
    return (
        l.join(rr, "__blk")
        .filter(F.col("a") < F.col("b"))
        .withColumn("cosine", dot / (F.col("__na") * F.col("__nb")))
        .filter(F.col("cosine") >= threshold)
        .select("a", "b", F.round("cosine", 6).alias("cosine"))
    )


def dup_clusters_star(pairs: DataFrame, max_iter: int = 30) -> DataFrame:
    """Connected components via alternating large-star / small-star
    (Kiveris et al., "Connected Components in MapReduce and Beyond") —
    the 100 TB upgrade over min-label propagation: converges in
    O(log n) rounds instead of O(diameter), so a long dup-chain costs
    ~log rounds of shuffles rather than chain-length rounds.

    large-star: every node points its LARGER neighbors at the minimum
    of its neighborhood; small-star: every node folds its SMALLER
    neighbors onto that minimum. Both steps are one groupBy(min) + one
    window per round, all JVM-side. Returns (doc, cluster_rep) with
    cluster_rep = component minimum — identical output to
    :func:`dup_clusters` (parity-tested on random graphs).
    """
    # pin the caller's pair pipeline ONCE: nodes and the initial edge
    # canonicalization are two consumers, and pairs is typically a
    # multi-shuffle LSH/knn pipeline (the d3/cep3 duplicate-subtree
    # class — uncheckpointed, it would execute twice)
    pairs = pairs.select("a", "b").localCheckpoint(eager=True)
    nodes = (
        pairs.select(F.col("a").alias("n"))
        .unionByName(pairs.select(F.col("b").alias("n")))
        .dropDuplicates()
    )
    edges = (
        pairs.select(
            F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .dropDuplicates()
    )

    def _sym(e: DataFrame) -> DataFrame:
        return e.select(F.col("u").alias("s"), F.col("v").alias("d")).unionByName(
            e.select(F.col("v").alias("s"), F.col("u").alias("d"))
        )

    def _canon(e: DataFrame) -> DataFrame:
        return (
            e.select(
                F.least("s", "d").alias("u"), F.greatest("s", "d").alias("v")
            )
            .filter(F.col("u") != F.col("v"))
            .dropDuplicates()
        )

    def _large_star(e: DataFrame) -> DataFrame:
        sym = _sym(e)
        w = Window.partitionBy("s")
        m = F.least(F.min("d").over(w), F.col("s"))
        out = sym.withColumn("m", m).filter(F.col("d") > F.col("s")).select(
            F.col("d").alias("s"), F.col("m").alias("d")
        )
        return _canon(out)

    def _small_star(e: DataFrame) -> DataFrame:
        # orient towards the larger endpoint; fold smaller neighbors +
        # self onto the neighborhood minimum
        ori = e.select(F.col("v").alias("s"), F.col("u").alias("d"))
        w = Window.partitionBy("s")
        m = F.least(F.min("d").over(w), F.col("s"))
        with_m = ori.withColumn("m", m)
        out = with_m.select(F.col("d").alias("s"), F.col("m").alias("d")).unionByName(
            with_m.select(F.col("s"), F.col("m").alias("d")).dropDuplicates()
        )
        return _canon(out)

    def _checksum(e: DataFrame):
        # per-edge hash bounded to 2^31 so the ANSI-mode sum cannot
        # overflow int64 below ~2^32 edges
        row = e.agg(
            F.count("*").alias("c"),
            F.sum(F.pmod(F.xxhash64("u", "v"), F.lit(1 << 31))).alias("h"),
        ).first()
        return (row["c"], row["h"])

    prev = None
    for _ in range(max_iter):
        edges = _small_star(_large_star(edges)).localCheckpoint(eager=True)
        cur = _checksum(edges)
        if cur == prev:
            break
        prev = cur

    # at convergence every node is directly attached to its component
    # minimum: label = min(self, neighbors)
    sym = _sym(edges)
    labels = sym.groupBy(F.col("s").alias("doc")).agg(
        F.least(F.min("d"), F.first("s")).alias("cluster_rep")
    )
    return (
        nodes.join(labels, nodes["n"] == labels["doc"], "left")
        .select(
            F.col("n").alias("doc"),
            F.coalesce(F.col("cluster_rep"), F.col("n")).alias("cluster_rep"),
        )
    )


def dup_clusters(pairs: DataFrame, max_iter: int = 15) -> DataFrame:
    """Connected components over near-dup pairs -> (doc, cluster_rep)
    where cluster_rep is the minimum doc id reachable through dup edges
    (canonical-document selection, the last stage of corpus dedup).

    Min-label propagation: each iteration joins labels across symmetric
    edges and keeps the per-node minimum; converges in O(diameter)
    iterations (each a shuffle join — at 100 TB swap in large-star/
    small-star to cut the iteration count; propagation is the same
    join-and-min shape). Early-exits when an iteration changes nothing;
    RAISES if max_iter rounds pass while labels are still moving — a
    silently non-converged run hands back non-minimal representatives
    that split one dup cluster into several.
    """
    edges = (
        pairs.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .unionByName(pairs.select(F.col("b").alias("src"), F.col("a").alias("dst")))
        .dropDuplicates()
        # pinned: every iteration's join re-reads edges; uncheckpointed,
        # the caller's whole pairs pipeline would re-execute per round
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .dropDuplicates()
        .withColumn("lbl", F.col("node"))
    )
    changed = 0
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges["dst"] == labels["node"])
            .groupBy("src")
            .agg(F.min("lbl").alias("nlbl"))
        )
        new_labels = (
            labels.join(neighbor_min, labels["node"] == neighbor_min["src"], "left")
            .select(
                "node",
                F.least(F.col("lbl"), F.coalesce(F.col("nlbl"), F.col("lbl"))).alias(
                    "lbl"
                ),
            )
        )
        # truncate lineage every iteration — iterative joins otherwise
        # grow the plan tree exponentially and stall the analyzer
        new_labels = new_labels.localCheckpoint(eager=True)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.lbl") != F.col("o.lbl"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    if changed != 0:
        raise ValueError(
            f"dup_clusters: not converged after max_iter={max_iter} "
            "iterations (component diameter exceeds the budget) — raise "
            "max_iter, or use dup_clusters_star (O(log n) rounds)"
        )
    return labels.select(F.col("node").alias("doc"), F.col("lbl").alias("cluster_rep"))


def distinct_doc_ngrams(
    df: DataFrame, id_col: str, token_col: str, n: int
) -> DataFrame:
    """(id_col, __g): each document's DISTINCT word n-grams, deduped
    row-wise (array_distinct — no shuffle) before the explode; documents
    with fewer than ``n`` tokens have no n-grams and are excluded.
    SHARED by the exact decontamination checker (ngram_contamination)
    and its Bloom pre-filter (bloom.bloom_contamination): the Bloom
    flags must stay a superset of the exact hits, which holds only
    while both sides derive grams identically."""
    return df.filter(F.size(token_col) >= n).select(
        id_col,
        F.explode(F.array_distinct(word_shingles(F.col(token_col), n))).alias(
            "__g"
        ),
    )


def ngram_contamination(
    docs: DataFrame,
    bench: DataFrame,
    id_col: str,
    token_col: str,
    n: int = 3,
) -> DataFrame:
    """Benchmark decontamination: for every corpus document, how many of
    its distinct token n-grams appear anywhere in a held-out benchmark
    set (the standard pre-training hygiene check; production uses
    n=13 — the n here is a parameter, the dataflow is identical).

    Scale shape: the benchmark n-gram set is tiny next to a 100 TB
    corpus, so it is BROADCAST — the corpus side never shuffles for the
    join; the only shuffle is the per-document aggregation (map-side
    partials). Per-document n-grams are deduplicated row-wise
    (``array_distinct``, no shuffle) before the explode. Documents with
    fewer than ``n`` tokens have no n-grams and are excluded (matching
    the SQL oracle's ``len >= n`` guard).

    Returns (id_col, n_ngrams, n_contaminated, contamination_frac).
    """
    bench_grams = (
        distinct_doc_ngrams(bench, id_col, token_col, n)
        .select("__g")
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    joined = distinct_doc_ngrams(docs, id_col, token_col, n).join(
        F.broadcast(bench_grams), "__g", "left"
    )
    return joined.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_ngrams"),
        F.sum(F.coalesce(F.col("__hit"), F.lit(0))).cast("long").alias(
            "n_contaminated"
        ),
        F.round(
            F.sum(F.coalesce(F.col("__hit"), F.lit(0))).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("contamination_frac"),
    )


def duplicated_spans(
    df: DataFrame,
    key: str,
    tokens_col: str,
    *,
    window: int = 5,
    min_docs: int = 2,
) -> DataFrame:
    """Substring-level (suffix-array-style) dedup: per document, the
    maximal token runs covered by the UNION of length-``window``
    n-grams that occur in at least ``min_docs`` distinct documents —
    the repeated-passage detector web-scale curation runs (Lee et al.
    2022, "Deduplicating Training Data Makes Language Models Better")
    that document-level dedup (exact/MinHash/SimHash) cannot express.
    (Union, not intersection: when two flagged windows merely abut, the
    straddling n-grams between them need not themselves be duplicated —
    consumers trimming spans should treat span boundaries as flagged-
    coverage limits, not a per-n-gram guarantee.) The reference has no
    text surface beyond tokenization (``feature_extraction/utils.rs:
    3-9``); this is the engine's extension, like the rest of the d*
    family.

    Returns ``(key, span_start, span_end, span_len)``: 0-based token
    positions, ``span_end`` inclusive (the last token of the last
    flagged n-gram), ``span_len = span_end - span_start + 1 >= window``.
    Flagged windows whose token ranges overlap OR abut merge into one
    span (two duplicated passages planted back-to-back report as a
    single region, exactly as a suffix-array sweep would).
    Within-document repeats alone do NOT flag (the criterion is
    distinct-document count); documents shorter than ``window`` have no
    n-grams.

    Scale shape — deliberately NOT a suffix array (which needs a global
    sort of every corpus suffix): (1) slide the window row-wise
    (``word_shingles`` + posexplode: |tokens| rows, zero shuffle),
    (2) one count-distinct aggregation on the portable 60-bit n-gram
    hash (shuffle on the hash — hot boilerplate n-grams are ordinary
    agg skew, map-side partials apply), (3) a semi-join of the windows
    against the flagged hashes (AQE broadcasts it when the flagged set
    is small, the common case), (4) a per-document gaps-and-islands
    merge (row_number window + groupBy: one shuffle on the doc key).
    No suffix-array materialization, no global sort, every step an
    ordinary shuffle bounded by |corpus tokens|.
    """
    if window < 1:
        raise ValueError("window must be >= 1")
    wins = (
        df.filter(F.size(tokens_col) >= window)
        .select(
            key,
            F.posexplode(word_shingles(F.col(tokens_col), window)).alias(
                "__pos", "__s"
            ),
        )
        .select(key, "__pos", md5_hash60(F.col("__s")).alias("__h"))
    )
    # the window frame feeds both the flag aggregation and the semi-join
    # left side: pin it so the corpus is scanned + exploded once, not
    # once per consumer (same convention as jaccard_pairs' shingles)
    wins = wins.localCheckpoint(eager=True)
    flagged = (
        wins.groupBy("__h")
        .agg(F.countDistinct(key).alias("__nd"))
        .filter(F.col("__nd") >= min_docs)
        .select("__h")
    )
    dup = wins.join(flagged, "__h", "semi")
    # island merge: two flagged windows [p1, p1+w-1], [p2, p2+w-1]
    # belong to one span iff their token ranges overlap or abut
    # (p2 - p1 <= window) — a plain pos-minus-row_number island would
    # split adjacent duplicated passages that share no window
    w = Window.partitionBy(key).orderBy("__pos")
    gap = F.col("__pos") - F.lag("__pos").over(w) > window
    isl = dup.select(
        key,
        "__pos",
        F.sum(F.when(gap, 1).otherwise(0)).over(w).alias("__isl"),
    )
    return isl.groupBy(key, "__isl").agg(
        F.min("__pos").cast("long").alias("span_start"),
        (F.max("__pos") + window - 1).cast("long").alias("span_end"),
        (F.max("__pos") - F.min("__pos") + window).cast("long").alias("span_len"),
    ).drop("__isl")
