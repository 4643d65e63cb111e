"""Plan-shape audit for the flagship queries — timing-insensitive
scale evidence.

For each audited query the script builds the DataFrame at
$SPARK_GRAFT_SF_DIR (default sf0.01 — plan shape is scale-invariant)
and counts the physical-plan features the 100 TB story rests on:
shuffle exchanges, broadcast exchanges/joins, sort-merge joins, and
Python (Arrow) stages. (Whole-stage-codegen span ids are not exposed
in Spark 4.1's finalized-AQE explain output, so they are not counted
— the row_udfs column is the anti-pattern detector that matters.) Output: one JSON line per query plus a
markdown table on stdout; writes BENCH/plan_audit.json.

Run: python BENCH/plan_audit.py
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

AUDIT = [
    "extract_spans",
    "ocr_pipeline_e2e",
    "curation_pipeline_e2e",
    "dedup_minhash_lsh",
    "semantic_dedup",
    "warc_html_spans",
    "corpus_filter_pipeline",
    "sketch_hll_shingles",
    "web_pagerank",
    "host_quality_priors",
    "training_pack_interleaved",
    "events_asof_join",
    "corpus_balanced_shards",
    "decontam_span_mask",
    "corpus_leakage_safe_split",
    "events_gap_fill",
    "similarity_hard_negatives",
    "events_rolling_window",
    "text_ngram_novelty",
    "dedup_containment_pairs",
    "similarity_margin_pairs",
    "training_span_corruption",
    "search_rank_fusion",
    "events_anomaly_mad",
    "web_triangles",
    "web_components",
    "web_communities_lpa",
    "web_kcore",
    # session 8-9 waves
    "web_trustrank",
    "web_bfs_depth",
    "web_host_graph",
    "events_holt",
    "events_cusum",
    "corpus_zorder_skipping",
    "quality_classifier_auc",
    "dedup_winnowing",
    "similarity_recall_eval",
    "lm_kneser_ney_perplexity",
    # round-5 wave
    "ocr_select_embed_id",
    "embedding_top_component",
    "similarity_ann_pq",
    "similarity_ann_binary",
    "events_holt_winters",
    "dedup_prefix_filter",
    "error_bleu_corpus",
    # round-5 session-2 wave
    "corpus_bucketed_join",
    "lm_stupid_backoff",
    "error_chrf_corpus",
    # round-5 session-3 wave
    "html_table_markdown",
    "html_render_markdown",
    "training_fim_transform",
    "quality_classifier_nb",
    "jsonl_ingest",
    "crawl_sitemap_discovery",
    "text_fix_mojibake",
    "html_extract_metadata",
    "embedding_outlier_scores",
    "icetable_incremental_view",
    "icetable_changelog_cdc",
]


def audit_plan(plan: str) -> dict[str, int]:
    # a finalized AdaptiveSparkPlan prints BOTH the final and the
    # initial plan; count only the final section
    plan = plan.split("== Initial Plan ==")[0]
    return {
        # "Exchange hashpartitioning/rangepartitioning" = a real shuffle;
        # BroadcastExchange is counted separately (it ships the SMALL side)
        "shuffle_exchanges": len(
            re.findall(r"\bExchange (hash|range|Single)", plan)
        ),
        "broadcast_exchanges": plan.count("BroadcastExchange"),
        "broadcast_hash_joins": plan.count("BroadcastHashJoin"),
        "sort_merge_joins": plan.count("SortMergeJoin"),
        "python_stages": plan.count("ArrowEvalPython")
        + plan.count("MapInPandas")
        + plan.count("FlatMapGroupsInPandas"),
        "row_udfs": plan.count("BatchEvalPython"),
    }


def main() -> None:
    from pero_ocr_spark import queries as Q
    from pero_ocr_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark("plan_audit", shuffle_partitions=32)
    qs = Q.queries()
    rows = {}
    for name in AUDIT:
        df = qs[name](spark, sf_dir)
        # finalize THIS Dataset's own QueryExecution: an action on the
        # same df (collect) drives its AdaptiveSparkPlanExec to the
        # final plan. A side write would execute a DIFFERENT
        # QueryExecution and leave this one at isFinalPlan=false,
        # silently auditing the pre-AQE plan.
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=false" not in plan, name
        rows[name] = audit_plan(plan)
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plan_audit.json")
    with open(out, "w") as f:
        json.dump({"sf_dir": sf_dir, "plans": rows}, f, indent=1)
    cols = [
        "shuffle_exchanges",
        "broadcast_exchanges",
        "broadcast_hash_joins",
        "sort_merge_joins",
        "python_stages",
        "row_udfs",
    ]
    print("| query | " + " | ".join(c.replace("_", " ") for c in cols) + " |")
    print("|---|" + "---|" * len(cols))
    for name, r in rows.items():
        print(f"| {name} | " + " | ".join(str(r[c]) for c in cols) + " |")


if __name__ == "__main__":
    main()
