"""Round-5b closed-form tests: ngram_novelty and the a4 CUBE slice the
a1 ROLLUP never produces. (j4/s7 have their own files; a4/w10/j4/s7/t23
are all additionally value-hash oracle-checked via the registry.)"""

from __future__ import annotations

from pyspark.sql import functions as F

from diffdataflowmlpipelines_spark.functions.text import ngram_novelty


def test_ngram_novelty_closed_form(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b c d"),   # both grams first seen here
            (2, "a b c d"),   # exact dup of 1: nothing novel
            (3, "b c d e"),   # bcd seen in 1, cde fresh
            (4, "x y"),       # < 3 tokens: no grams at all
            (5, None),        # NULL text: no grams
            (6, "a a a a"),   # repeated gram counted ONCE (distinct)
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_grams, r.n_novel, r.novelty)
        for r in ngram_novelty(docs, n=3).collect()
    }
    assert got == {
        1: (2, 2, 1.0),
        2: (2, 0, 0.0),
        3: (2, 1, 0.5),
        4: (0, 0, 0.0),
        5: (0, 0, 0.0),
        6: (1, 1, 1.0),
    }


def test_cube_produces_the_all_bucket_slice(spark, tmp_path):
    # CUBE emits the (ALL event_type, bucket) grouping set that ROLLUP
    # (a1) structurally cannot — pin it on a tiny synthetic events table
    import datetime as dt

    ev = spark.createDataFrame(
        [
            (1, dt.datetime(2024, 1, 1), 10, "click", 1.0, None),
            (2, dt.datetime(2024, 1, 1), 21, "view", 2.0, None),
        ],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    ev.write.parquet(f"{tmp_path}/events.parquet")
    from diffdataflowmlpipelines_spark.plans.more_queries import a4_cube

    out = a4_cube(spark, str(tmp_path))
    rows = {(r.event_type, r.user_bucket): (r.n, r.total) for r in out.collect()}
    # the ROLLUP-impossible slices: all types, one bucket
    assert rows[("(all)", 0)] == (1, 1.0)
    assert rows[("(all)", 1)] == (1, 2.0)
    # plus the shared sets
    assert rows[("(all)", -1)] == (2, 3.0)
    assert rows[("click", 0)] == (1, 1.0)
    assert len(rows) == 2 + 2 + 2 + 1  # (t,b), (t,all), (all,b), (all,all)


# --- priority_sample (t24) ------------------------------------------------------

def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, n_chars long")


def test_priority_sample_exactly_k_and_deterministic(spark):
    from diffdataflowmlpipelines_spark.functions.sampling import priority_sample

    df = _docs(spark, [(i, 100 + i) for i in range(50)])
    a = priority_sample(df, "doc_id", "n_chars", k=10)
    b = priority_sample(df, "doc_id", "n_chars", k=10)
    ra = sorted((r.doc_id, r.weight, r.priority) for r in a.collect())
    rb = sorted((r.doc_id, r.weight, r.priority) for r in b.collect())
    assert len(ra) == 10 and ra == rb
    # fewer rows than k: the whole (eligible) population comes back
    small = priority_sample(_docs(spark, [(1, 5), (2, 7)]), "doc_id", "n_chars", k=10)
    assert small.count() == 2


def test_priority_sample_dominant_weight_always_selected(spark):
    from diffdataflowmlpipelines_spark.functions.sampling import priority_sample

    # pri = w/u with u > 1/(scale+1): a weight-1 row tops out at
    # 1_000_001 while the heavy row's pri >= 10^9 — always in
    rows = [(i, 1) for i in range(100)] + [(999, 10**9)]
    out = priority_sample(_docs(spark, rows), "doc_id", "n_chars", k=5)
    assert 999 in {r.doc_id for r in out.collect()}


def test_priority_sample_monotone_in_weight(spark):
    from diffdataflowmlpipelines_spark.functions.sampling import priority_sample

    base = [(i, 10) for i in range(40)]
    sel0 = {r.doc_id for r in priority_sample(_docs(spark, base), "doc_id", "n_chars", k=8).collect()}
    target = sorted(sel0)[0]
    boosted = [(i, 10_000 if i == target else w) for i, w in base]
    sel1 = {r.doc_id for r in priority_sample(_docs(spark, boosted), "doc_id", "n_chars", k=8).collect()}
    assert target in sel1  # raising a selected row's weight never evicts it


def test_priority_sample_null_and_nonpositive_dropped(spark):
    from diffdataflowmlpipelines_spark.functions.sampling import priority_sample

    rows = [(1, 10), (2, None), (3, 0), (4, -5), (None, 10), (5, 3)]
    out = priority_sample(_docs(spark, rows), "doc_id", "n_chars", k=10)
    assert sorted(r.doc_id for r in out.collect()) == [1, 5]


def test_priority_sample_plan_is_top_k_not_global_sort(spark):
    import pytest
    from diffdataflowmlpipelines_spark.functions.sampling import priority_sample

    df = _docs(spark, [(i, i + 1) for i in range(20)])
    out = priority_sample(df, "doc_id", "n_chars", k=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    with pytest.raises(ValueError, match="k must be"):
        priority_sample(df, "doc_id", "n_chars", k=0)


# --- containment_pairs (d11) ----------------------------------------------------

def test_containment_subset_scores_one_where_jaccard_is_low(spark):
    from diffdataflowmlpipelines_spark.functions.dedup import (
        containment_pairs,
        jaccard_pairs,
    )

    # doc 1 = a 6-token quote lifted verbatim into the middle of doc 2
    quote = "the quick brown fox jumps high"
    filler_a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    filler_b = "lambda mu nu xi omicron pi rho sigma tau upsilon"
    docs = spark.createDataFrame(
        [(1, quote), (2, f"{filler_a} {quote} {filler_b}")],
        "doc_id long, text string",
    ).selectExpr("doc_id", "split(text, ' ') AS toks")
    out = containment_pairs(docs, "doc_id", "toks", threshold=0.5).collect()
    assert len(out) == 1
    r = out[0]
    # all 4 of doc 1's 3-gram shingles appear in doc 2
    assert (r.a, r.b) == (1, 2)
    assert r.cont_a_in_b == 1.0 and r.containment == 1.0
    assert r.cont_b_in_a < 0.2  # the big doc is NOT contained in the quote
    # and symmetric Jaccard misses the same pair at the same threshold
    jac = jaccard_pairs(docs, "doc_id", "toks", threshold=0.5).collect()
    assert jac == []


def test_containment_threshold_and_candidate_parity(spark):
    from diffdataflowmlpipelines_spark.functions.dedup import containment_pairs

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f"),
            (2, "a b c d x y"),   # shares 2 of 4 shingles with 1
            (3, "p q r s t u"),   # disjoint
        ],
        "doc_id long, text string",
    ).selectExpr("doc_id", "split(text, ' ') AS toks")
    allp = containment_pairs(docs, "doc_id", "toks", threshold=0.5)
    got = {(r.a, r.b): r.containment for r in allp.collect()}
    assert got == {(1, 2): 0.5}  # 2/4 each way; disjoint pair filtered
    # candidate-driven path produces identical rows for covered pairs
    cand = spark.createDataFrame([(1, 2), (1, 3)], "a long, b long")
    got_c = {
        (r.a, r.b): r.containment
        for r in containment_pairs(
            docs, "doc_id", "toks", threshold=0.5, candidates=cand
        ).collect()
    }
    assert got_c == {(1, 2): 0.5}


def test_priority_sample_scale_invariant_selection(spark):
    """Multiplying every weight by a positive constant rescales every
    priority by the same factor, so the SELECTED SET is invariant —
    the property that makes the sample meaningful for relative
    weights (quality scores in arbitrary units)."""
    from diffdataflowmlpipelines_spark.functions.sampling import priority_sample

    base = [(i, (i * 37) % 100 + 1) for i in range(60)]
    scaled = [(i, w * 1000) for i, w in base]
    sel_a = {r.doc_id for r in priority_sample(_docs(spark, base), "doc_id", "n_chars", k=12).collect()}
    sel_b = {r.doc_id for r in priority_sample(_docs(spark, scaled), "doc_id", "n_chars", k=12).collect()}
    assert sel_a == sel_b and len(sel_a) == 12
