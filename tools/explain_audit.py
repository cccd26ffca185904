"""Plan audit: dump formatted physical plans for the headline queries
and flag anti-patterns (missing pushdown, unexpected cartesian products,
row-at-a-time Python UDFs, full-column scans). Writes PLANS.md.

Usage: PYTHONPATH=/root/repo python tools/explain_audit.py [name ...]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

AUDITED = [
    "p3_projection_filter",
    "p5_join_agg",
    "p6_antijoin",
    "c3_standard_scaler",
    "c9_tfidf",
    "c12_dictionary",
    "c16_multi_column_pipeline",
    "c8_count_vectorizer_dense",
    "w1_tumbling_window",
    "j1_interval_join",
    "d2_minhash_signatures",
    "d3_jaccard_pairs",
    "d8_duplicated_spans",
    "s1_cosine_topk",
    "s3_ivf_ann_topk",
    "j3_asof_join",
    "cm1_count_min_sketch",
    "c5_kbins_quantile",
    "t5_decontamination",
    "t6_repetition_stats",
    "t7_stratified_sample",
    "t8_sequence_packing",
    "cep1_event_funnel",
    "cep2_absence",
    "t9_pii_redaction",
    "t10_domain_mixture",
    "p17_region_rollout",
    "t11_corpus_pipeline",
    "w8_time_since_last",
    "w9_ewma_value",
    "cep3_funnel_conversion",
    "m3_real_decode",
    "d9_bloom_decontamination",
    "d10_semantic_dedup",
    "t14_oov_stats",
    "t15_curation_v2",
    "t16_hash_split",
    "t17_chunking",
    "cm4_hll_distinct",
    "t12_gopher_filter",
    "t13_bigram_lm_score",
    "cm5_bottomk_quantiles",
    "s4_cluster_profile",
    "v1_bpe_pair_counts",
    "v3_bpe_encode",
    "t18_importance_resample",
    "t19_source_drift_kl",
    "t20_tokenizer_pipeline",
    "t21_pmi_collocations",
    "t22_source_ngram_overlap",
    "s5_embedding_dim_stats",
    "a4_cube",
    "w10_windowed_percentiles",
    "j4_bucketed_range_join",
    "t23_ngram_novelty",
    "s7_knn_graph",
    "t24_priority_sample",
    "s8_knn_components",
    "d11_containment_pairs",
    "s9_quantized_topk",
    "s10_random_projection",
    "s11_pq_topk",
]

# curation queries whose small side (bench n-gram set / per-stratum
# thresholds) must be broadcast — the corpus side must not shuffle
MUST_BROADCAST = {"t5_decontamination", "t7_stratified_sample", "t11_corpus_pipeline"}

# dictionary-bearing plans must not rank the vocabulary in one task
# (fit_dictionary is sharded: range-partitioned local rank + offsets)
NO_SINGLE_PARTITION = {
    "t20_tokenizer_pipeline",
    "c12_dictionary",
    "c8_count_vectorizer_dense",
    "c6_onehot_encoder",
    "c7_ordinal_encoder",
}

# queries whose repeated FileScan of one base table is the algorithm
# (true self-joins: both sides apply DIFFERENT filters/projections of
# the table, so a shared materialization would read MORE columns/rows
# than the two pruned scans do) — everything else re-scanning a table
# is a duplicated subtree, the round-3 defect class (cep3/t10/d3)
SELF_JOIN_OK = {
    "cep2_absence",  # anti-join: 'view' events vs 'purchase' events
    "j1_interval_join",  # events x events interval self-join
    "j3_asof_join",  # events (trades side) x events (quotes side)
}


def flags(plan: str, name: str) -> list[str]:
    out = []
    if "BatchEvalPython" in plan:
        out.append("row-at-a-time Python UDF in plan")
    if "CartesianProduct" in plan:
        out.append("CartesianProduct (non-broadcast cross join)")
    if name in NO_SINGLE_PARTITION and "Exchange SinglePartition" in plan:
        out.append("Exchange SinglePartition under dictionary subtree")
    scans = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    for s in scans:
        ncols = s.count(",") + 1 if s else 0
        if ncols > 8:
            out.append(f"wide scan ({ncols} cols) — check column pruning")
    if name == "p3_projection_filter" and "PushedFilters: []" in plan:
        out.append("filter NOT pushed to parquet")
    if name in MUST_BROADCAST and "BroadcastHashJoin" not in plan:
        out.append("small side not broadcast — corpus would shuffle")
    # reused-subtree check: two IDENTICAL FileScans (same table, same
    # ReadSchema, same pushed filters, modulo expression ids) mean
    # Catalyst planned a shared frame twice (the cep3/t10/d3 class) —
    # at 100 TB that doubles the dominant scan+shuffle. Scans of one
    # table with DIFFERENT columns/filters are deliberate multi-pass
    # plans (a column-pruned aggregate side-scan, a filtered self-join
    # side) and stay unflagged; SELF_JOIN_OK exempts whole queries.
    if name not in SELF_JOIN_OK:
        def scan_key(ln: str) -> str:
            # structured key, not the raw line: normalize expression ids
            # (#12L -> #x), then compare (location, ReadSchema,
            # PushedFilters, DataFilters-prefix). The DataFilters field
            # is width-truncated by Spark AFTER id substitution, so
            # identical filters over different-length raw ids truncate
            # at different logical points (seen on d8: one-char shift) —
            # hence prefix-before-'...' only.
            s = re.sub(r"#\d+[A-Za-z]*", "#x", ln[ln.index("FileScan") :])

            def field(pat: str) -> str:
                # every extraction is guarded ('?' on a truncated line)
                # and bracket-aware — a '[^,]+' style pattern would cut
                # PushedFilters at its first comma and collide two
                # different filter sets into one key
                m = re.search(pat, s)
                return m.group(1) if m else "?"

            return "|".join(
                [
                    field(r"InMemoryFileIndex(?:\([^)]*\))?\[([^\],]+)"),
                    field(r"ReadSchema: (struct<[^>]*>?)"),
                    field(r"PushedFilters: \[([^\]]*)").split("...", 1)[0],
                    field(r"DataFilters: \[([^\]]*)").split("...", 1)[0],
                ]
            )

        scans_norm = [
            scan_key(ln) for ln in plan.splitlines() if "FileScan" in ln
        ]
        dup_lines = sorted({s for s in scans_norm if scans_norm.count(s) > 1})
        if dup_lines:
            tables = ", ".join(
                sorted({s.split("|", 1)[0].rstrip("/").split("/")[-1] for s in dup_lines})
            )
            out.append(
                f"identical FileScan of {tables} planned twice — reused subtree not pinned"
            )
    return out


def main(only: list[str]) -> int:
    from diffdataflowmlpipelines_spark.session import get_spark

    import __spark_entry__ as em

    spark = get_spark(app_name="explain_audit", shuffle_partitions=8)
    queries = em.queries()
    lines = ["# PLANS — physical plan audit (sf0.01)", ""]
    bad = 0
    for name in only or AUDITED:
        df = queries[name](spark, SF_DIR)
        plan = df._jdf.queryExecution().executedPlan().toString()
        fl = flags(plan, name)
        bad += len(fl)
        status = " / ".join(fl) if fl else "clean"
        print(f"{name}: {status}")
        lines += [f"## {name}", "", f"flags: {status}", "", "```", plan.strip()[:4000], "```", ""]
    if not only:
        # PLANS.md is the full-audit record; a subset run must not
        # clobber it (it once shrank 26 sections to 1)
        with open(
            os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                "PLANS.md",
            ),
            "w",
        ) as f:
            f.write("\n".join(lines))
    spark.stop()
    return 1 if bad else 0  # let scripted runs gate on plan regressions


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
