"""Physical-plan audit: for each headline (or named) query, count the
plan features that matter at 100 TB — shuffles, broadcasts, codegen
coverage, pushed filters, Python/Arrow hops — and write PLANS.md.

Complements tests/test_plan_shapes.py (which PINS invariants); this tool
makes the current plan posture inspectable at a glance without running
anything heavier than planning.

Usage: python tools/plan_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from market_data_pipeline_spark.plans import introspect
from market_data_pipeline_spark.session import get_spark

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DEFAULT = [
    "inv_q1_pricing_summary",
    "inv_q5_revenue_by_nation",
    "inv_q3_top_orders",
    "inv_w1_sma",
    "inv_w3_rsi",
    "inv_w14_composite_signal",
    "inv_w2_ema_macd",
    "inv_s1_bars_ohlcv",
    "inv_a1_breadth",
    "inv_o4_topk_per_group",
    "inv_d_minhash_lsh",
    "inv_d_simhash_pairs",
    "inv_sim_ann_topk",
    "inv_v_pq_topk",
    "inv_q_cms_heavy_hitters",
    "inv_t_line_dedup",
    "inv_t_tfidf",
    "inv_x_pack_sequences",
    "inv_q_histogram_eqdepth",
    "inv_o4b_liquidity_topn",
    "inv_x_curated_corpus",
    "inv_x_semantic_curation",
    "inv_g_degree_hist",
    "inv_g_triangles",
    "inv_d_jaccard_prefix",
    "inv_x_weighted_sample",
    "inv_x_weighted_group_sample",
    "inv_x_temperature_mix",
    "inv_er_editdist_pairs",
    "inv_er_entities",
    "inv_d_lsh_recall",
    "inv_t_nb_confusion",
    "inv_g_kcore",
    "inv_g_hits",
    "inv_asof_nearest",
    "inv_d_cross_source",
    "inv_q_calendar_gaps",
    "inv_q_benford",
    "inv_w_obv",
    "inv_w_mfi",
    "inv_w_rolling_corr",
    "inv_t_zipf_fit",
    "inv_w_liquidity",
    "inv_d_decontaminate_bloom",
    "inv_s_versioned_scan",
    "inv_t_unigram_lm",
    "inv_t_unigram_encode",
    "inv_x_host_quota",
    "inv_q_hll_portable",
    "inv_t_pmi_collocations",
    "inv_x_ols_regression",
    "inv_d_containment",
    "inv_t_textrank",
    "inv_g_assoc_rules",
    "inv_w_holt_forecast",
    "inv_e_attribution",
    "inv_e_cohort_ltv",
    "inv_q_hll_setops",
    "inv_w_cusum",
    "inv_w_seasonal_decomp",
    "inv_g_link_prediction",
    "inv_q_moments",
    "inv_x_robust_anomaly",
    "inv_w_theil_sen",
    "inv_q_ref_integrity",
    "inv_x_neyman_alloc",
    "inv_x_calibration",
    "inv_q_gini",
    "inv_t_bm25_topk",
    "inv_t_hybrid_rrf",
    "inv_t_hybrid_ndcg",
    "inv_d_incremental_versioned",
    "inv_t_bm25_prf",
    "inv_w_kalman",
    "inv_t_char_entropy",
    "inv_t_domain_kl",
    "inv_v_embedding_outliers",
    # round 8
    "inv_t_ql_dirichlet",
    "inv_t_hybrid_rrf3",
    "inv_t_hybrid_ndcg3",
    "inv_d_cdc_admission",
    "inv_t_unigram_ppl",
    "inv_g_label_prop",
    "inv_v_pca2",
    "inv_t_rake",
    "inv_e_markov_stationary",
    "inv_x_target_encode",
    "inv_w_hurst",
    "inv_t_gopher_repetition",
    # inv_st_quantile_bins is streaming (executes its store build on plan
    # construction) — covered by the streaming suite, not audited here
]


def audit(plan: str) -> dict:
    # count EVERY non-broadcast exchange (hash, range, single-partition) —
    # the same rule as plans/introspect.count_exchanges, so PLANS.md and
    # the test-pinned counts never disagree
    return {
        "shuffles": sum(
            1
            for ln in plan.splitlines()
            if "Exchange" in ln and "BroadcastExchange" not in ln
        ),
        "broadcasts": plan.count("BroadcastExchange"),
        "sort_merge_joins": plan.count("SortMergeJoin"),
        "bcast_joins": plan.count("BroadcastHashJoin")
        + plan.count("BroadcastNestedLoopJoin"),
        "arrow_hops": plan.count("MapInPandas")
        + plan.count("FlatMapGroupsInPandas")
        + plan.count("ArrowEvalPython"),
        "py_row_udfs": plan.count("BatchEvalPython"),
        "pushed_filters": "PushedFilters: [" in plan
        and "PushedFilters: []" not in plan,
        "group_limit": plan.count("WindowGroupLimit"),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    names = sys.argv[2:] or DEFAULT
    spark = get_spark("plan_audit")
    qs = entrymod.queries()
    rows = []
    for name in names:
        if name not in qs:
            print(f"WARNING: unknown query {name!r} — skipped", file=sys.stderr)
            continue
        df = qs[name](spark, sf_dir)
        plan = introspect.explain_str(df, "simple")
        # formatted explain includes scan details (PushedFilters/ReadSchema)
        formatted = introspect.explain_str(df, "formatted")
        a = audit(plan)
        # pushdown is only visible in the formatted explain
        a["pushed_filters"] = (
            "PushedFilters: [" in formatted and "PushedFilters: []" not in formatted
        )
        rows.append((name, a))
        print(name, a, file=sys.stderr)

    lines = [
        "# PLANS — physical-plan audit of representative queries",
        "",
        f"Generated by `python tools/plan_audit.py` at `{sf_dir}`"
        " (plan-time only; AQE may further coalesce/convert at runtime —"
        " runtime invariants are pinned in tests/test_plan_shapes.py).",
        "",
        "Columns: non-broadcast exchanges (hash/range/round-robin/single —"
        " the 100 TB cost drivers),"
        " broadcast exchanges, SortMergeJoin vs broadcast joins"
        " (codegen spans only materialize in executed AQE plans, so they"
        " are not counted here), Arrow-batched Python hops"
        " (mapInPandas/applyInPandas — the documented exceptions),"
        " row-at-a-time Python UDFs (must be 0), parquet filter pushdown,"
        " WindowGroupLimit top-k pruning.",
        "",
        "| query | shuffles | bcast | SMJ | bcast-join | arrow | row-udf | pushdown | grp-limit |",
        "|---|---|---|---|---|---|---|---|---|",
    ]
    for name, a in rows:
        lines.append(
            f"| {name} | {a['shuffles']} | {a['broadcasts']}"
            f" | {a['sort_merge_joins']} | {a['bcast_joins']} | {a['arrow_hops']}"
            f" | {a['py_row_udfs']} | {'yes' if a['pushed_filters'] else '—'}"
            f" | {a['group_limit']} |"
        )
    total_row_udfs = sum(a["py_row_udfs"] for _, a in rows)
    lines += [
        "",
        f"Row-at-a-time Python UDFs across all audited plans: {total_row_udfs}"
        " (contract: zero — Python appears only as Arrow-batched hops where"
        " the math demands it: EMA recursion, codec byte parsing, FFD"
        " packing).",
        "",
        "Dedup-family plans (curated corpus, keep-one/keep-best, line"
        " dedup) show their cluster-member/loser joins as SortMergeJoin at"
        " PLAN time on purpose: those sets are O(duplicates) — unbounded at"
        " web-corpus dup rates — so the hint is omitted and AQE promotes to"
        " broadcast only when the measured runtime size fits. A static"
        " broadcast there would be a driver OOM at 100 TB, not a win.",
    ]
    with open(os.path.join(REPO, "PLANS.md"), "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print("\n".join(lines))
    spark.stop()


if __name__ == "__main__":
    main()
