"""Synthetic scale check: does each operator family's cost grow linearly?

Builds a K-times replica of the event/document/embedding tables (new symbol /
doc / vector ids per copy — the realistic growth mode: MORE keys, same series
length per key) under .scalecheck/, then times a representative query per
family at sf0.1 and at K× and prints the ratio. A family whose time grows
much faster than K has a super-linear plan (quadratic candidate set, skewed
key, driver loop) — the thing SCALE.md claims cannot happen.

Exact-duplicate documents across copies are INTENTIONAL: dedup families get
a worst-case stress (every doc has K-1 exact dups sharing every MinHash
band), so candidate growth is visible if the bucketing is wrong.

Usage: python tools/scalecheck.py [K] [--rebuild]
Writes SCALECHECK.md at the repo root.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from market_data_pipeline_spark.session import get_spark
from market_data_pipeline_spark.sources.tables import TABLES, load_table

BASE = "/root/testdata/sf0.1"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

QUERIES = [
    "inv_s1_bars_ohlcv",        # tick→bar agg
    "inv_w1_sma",               # native window chain
    "inv_w2_ema_macd",          # bucketed Arrow recursion
    "inv_w14_composite_signal", # fused scan
    "inv_a1_breadth",           # window + date agg
    "inv_d_exact_dups",         # hash-groupBy dedup
    "inv_d_minhash_lsh",        # shingle→sig→band bucket join
    "inv_t_tfidf",              # explode + vocab shuffle
    "inv_sim_ann_topk",         # LSH bucketed ANN
    "inv_x_semantic_curation",  # quality gate + embedding-cluster collapse
    "inv_x_importance_weights", # hashed-unigram LM log-likelihood ratios
    "inv_x_curated_corpus",     # quality gate + text near-dup cluster collapse
    "inv_g_degree_hist",        # basket pair expansion + two keyed aggs
    "inv_g_pagerank",           # checkpointed iterative join loop
    "inv_d_jaccard_prefix",     # exact-Jaccard prefix join (clone-collapsed;
                                # output itself is quadratic in clones, like
                                # the SimHash pair dump). 10x ONLY: at the
                                # 100x all-clones replica the OUTPUT is
                                # ~70e9 rows (each rep pair expands to
                                # 100x100 member pairs) — output-bound by
                                # construction, see the SCALECHECK note
    "inv_er_entities",          # edit-distance entity resolution: record
                                # volume grows K×, the 64-value name domain
                                # does not — pairwise cost must stay flat
    "inv_g_hits",               # bipartite HITS: K× baskets over the same
                                # part catalog densifies the graph — the
                                # iterative join loop must stay linear in
                                # edges
    "inv_t_unigram_encode",     # unigram-LM train+encode: corpus pass +
                                # O(vocab) EM — growth must track the scan
    "inv_x_host_quota",         # per-host quality cap via WindowGroupLimit
    "inv_d_containment",        # shingle-containment join (clone-collapsed;
                                # like jaccard_prefix the OUTPUT is
                                # quadratic in clones — ordered pairs, so
                                # 2x the unordered dump). 10x ONLY.
    "inv_t_textrank",           # pagerank loop over the word graph: K×
                                # corpus, same vocabulary — the rank loop
                                # must stay vocabulary-bound
    "inv_t_pmi_collocations",   # two vocab-keyed count shuffles + a
                                # vocab-sized join — growth must track scan
    "inv_g_link_prediction",    # capped wedge enumeration + edge anti-join:
                                # K× baskets densify the graph — THE hub-
                                # growth risk; the wedge cap must hold it
    "inv_t_bm25_topk",          # inverted-index join: K× clones multiply
                                # the query terms' posting lists — candidate
                                # volume must track posting mass, not pairs
    "inv_g_assoc_rules",        # support-pruned itemset counts over K×
                                # baskets: the prune keeps the rule table
                                # catalog-bound while counts grow
    "inv_t_bm25_prf",           # two-pass PRF retrieval over one shared
                                # index: growth must track posting mass
    "inv_v_pca_power",          # 8 one-row-reduce rounds: growth must be
                                # scan-bound (driver state is O(dim))
    "inv_t_hybrid_ndcg",        # BM25 + ANN legs + RRF + 3 nDCG grades in
                                # one plan — every stage top-k-bounded
    "inv_d_incremental_versioned",  # change-feed dedup admission: batch-
                                # sized work against a K× store reference
    "inv_w_kalman",             # per-symbol fold on the WIDE axis too (K×
                                # symbols, same depth — the deep replica
                                # covers the other axis)
    "inv_t_char_entropy",       # one explode + two keyed aggs — scan-bound
    "inv_t_domain_kl",          # per-source unigram KL: vocab-keyed joins
    "inv_v_embedding_outliers", # mean reduce + distance scan + 2 quantile
                                # passes — scan-bound, O(1) driver state
    "inv_st_heavy_hitters",     # streaming CMS maintenance + estimate join:
                                # availableNow replay over K× events
    "inv_t_ql_dirichlet",       # LM leg over the shared inverted index:
                                # posting-mass-bound like bm25
    "inv_t_hybrid_rrf3",        # three top-k legs + two coalescing joins
    "inv_d_cdc_admission",      # full CDC lifecycle admission: eviction
                                # anti-join + batch-vs-store LSH
    "inv_t_rake",               # phrase runs + word-degree scoring —
                                # per-doc windows, scan-bound
    "inv_e_markov_stationary",  # one windowed lead pass + O(types^2) model
    "inv_x_target_encode",      # two bounded aggs + broadcast join back
    "inv_st_quantile_bins",     # streaming histogram store: linear-sketch
                                # merges, availableNow replay
    "inv_w_hurst",              # chunked R/S windows, symbol-partitioned
]

# Output-quadratic on the all-clones replica: the RESULT SET itself grows
# K² per clone set (an exact pair dump over K× exact duplicates), so a
# 100× run measures materializing ~70e9 rows, not the operator. Excluded
# from K ≥ 100 sweeps; the bound is pinned in SCALECHECK.md like simhash.
_OUTPUT_QUADRATIC = {"inv_d_jaccard_prefix", "inv_d_containment"}

# Deep-key mode (--deep, r7 verdict task 6): the wide replicas above grow
# the KEY COUNT at constant per-key depth, which never stresses the
# collect_list + F.aggregate fold family — their risk axis is per-key
# SERIES LENGTH (one symbol's whole ordered series becomes a single array
# in one task). The deep replica keeps the key set and replicates events
# K× with timestamps shifted a full span per copy: same symbols, K× the
# days, so every per-symbol array grows K×.
DEEP_QUERIES = [
    "inv_w_kalman",         # F.aggregate fold over the per-symbol series
    "inv_w_cusum",          # two-sided CUSUM fold, same shape
    "inv_w_holt_forecast",  # Holt double-exponential fold, same shape
    "inv_w2_ema_macd",      # the Arrow applyInPandas recursion — per-key
                            # group size is ALSO its depth axis
]


def build_deep_replica(spark, k: int, out_dir: str) -> None:
    """Same keys, K× per-key depth: events replicated with ts shifted one
    full span per copy (fresh event_ids keep uniqueness); every other
    table copies through unchanged."""
    os.makedirs(out_dir, exist_ok=True)
    e = load_table(spark, BASE, "events")
    span_row = e.agg(
        (F.datediff(F.max(F.to_date("ts")), F.min(F.to_date("ts"))) + 1).alias("d")
    ).first()
    span = int(span_row["d"])
    spine = spark.range(k).select(F.col("id").alias("__copy"))
    rep = (
        e.crossJoin(spine)
        .withColumn("ts", F.expr(f"timestampadd(DAY, __copy * {span}, ts)"))
        .withColumn(
            "event_id",
            (F.col("event_id") + F.col("__copy") * F.lit(1_000_000_000)).cast("long"),
        )
        .drop("__copy")
    )
    rep.repartition(32).write.mode("overwrite").parquet(
        os.path.join(out_dir, "events.parquet")
    )
    for name in TABLES:
        dst = os.path.join(out_dir, f"{name}.parquet")
        if not os.path.exists(dst):
            shutil.copy(os.path.join(BASE, f"{name}.parquet"), dst)


def build_replica(spark, k: int, out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    spine = spark.range(k).select(F.col("id").alias("__copy"))

    def replicate(name: str, id_shifts: dict[str, int]) -> None:
        df = load_table(spark, BASE, name)
        rep = df.crossJoin(spine)
        for col, stride in id_shifts.items():
            rep = rep.withColumn(
                col, (F.col(col) + F.col("__copy") * F.lit(stride)).cast("long")
            )
        # Write the replica in 32 files, NOT the crossJoin's inherited 1-2
        # partitions: synthetic text compresses so hard that a 100× corpus
        # lands under one 128 MB split, and every downstream scan then runs
        # on ONE core — a harness artifact that measured as a fake 30-37×
        # "growth" on the regex-heavy capstones (round 6). Real corpora at
        # K× arrive in K× more files; 32 files models that while keeping
        # the stress on the OPERATORS, not the file layout.
        rep.drop("__copy").repartition(32).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{name}.parquet")
        )

    replicate("events", {"user_id": 100_000, "event_id": 1_000_000_000})
    replicate("documents", {"doc_id": 10_000_000})
    replicate("embeddings", {"vec_id": 10_000_000})
    # fresh ORDERS per copy over the SAME part catalog: the co-purchase
    # graph densifies (more baskets, fixed node set) — the realistic
    # growth mode for a product/link graph, and the harder one (edge
    # weights and degrees grow, not just row count)
    replicate("lineitem", {"l_orderkey": 100_000_000})
    # fresh part RECORDS over the SAME 64-name attribute domain: the
    # linkage stress — entity resolution's pairwise work lives in the
    # value domain, so K× more records must not grow the join
    replicate("part", {"p_partkey": 100_000_000})
    for name in TABLES:
        dst = os.path.join(out_dir, f"{name}.parquet")
        if not os.path.exists(dst):
            src = os.path.join(BASE, f"{name}.parquet")
            shutil.copy(src, dst)


def time_query(spark, name: str, sf_dir: str) -> float:
    q = entrymod.queries()[name]
    q(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
    t0 = time.time()
    q(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return round(time.time() - t0, 3)


def _render(results: dict) -> str:
    lines = ["# SCALECHECK — measured cost growth at synthetic scale", ""]
    wide = [k for k in results if not k.startswith("deep:")]
    deep = [k for k in results if k.startswith("deep:")]
    for k_str in sorted(wide, key=int):
        k = int(k_str)
        rows = results[k_str]
        lines += [
            f"## {k}× replica",
            "",
            f"Data: sf0.1 replicated {k}× with fresh keys per copy (more symbols/",
            "docs/vectors, same per-key depth — the realistic growth mode)."
            " Documents are exact cross-copy duplicates on purpose: a worst-case",
            f"dedup stress where every doc shares all MinHash bands with its {k - 1} clones.",
            "",
            f"| query | sf0.1 (s) | {k}× (s) | growth vs {k}× data |",
            "|---|---|---|---|",
        ]
        for name, t1, tk, ratio in rows:
            verdict = (
                "sub-linear" if ratio < k else ("~linear" if ratio < 1.5 * k else "SUPER-LINEAR")
            )
            lines.append(f"| {name} | {t1} | {tk} | {ratio}× — {verdict} |")
        lines.append("")
    for k_str in sorted(deep, key=lambda s: int(s.split(":")[1])):
        k = int(k_str.split(":")[1])
        rows = results[k_str]
        lines += [
            f"## deep-key {k}× replica (per-key series depth)",
            "",
            "Data: sf0.1 events replicated with timestamps shifted one full",
            f"span per copy — SAME 1.5k symbols, {k}× the days, so every",
            f"per-symbol series (and the collect_list array each F.aggregate",
            "fold materializes, and each Arrow applyInPandas group) grows",
            f"{k}×. This is the axis the wide replicas never stress; the",
            "fold family's documented bound is per-key array size, measured",
            "here.",
            "",
            f"| query | sf0.1 (s) | deep {k}× (s) | growth vs {k}× depth |",
            "|---|---|---|---|",
        ]
        for name, t1, tk, ratio in rows:
            verdict = (
                "sub-linear" if ratio < k else ("~linear" if ratio < 1.5 * k else "SUPER-LINEAR")
            )
            lines.append(f"| {name} | {t1} | {tk} | {ratio}× — {verdict} |")
        lines.append("")
    lines += [
        "A ratio well under K× means fixed overhead still dominates at this",
        "size and the distributed fraction scales; a ratio far above would flag",
        "a quadratic candidate set or skewed key. Rebuild with",
        "`python tools/scalecheck.py K [query ...] --rebuild`.",
        "",
        "## Replica layout honesty (round-6 change)",
        "",
        "Replicas are now written in 32 files per table. The synthetic text",
        "compresses so hard that the old single-file 100× documents table",
        "(4.9 MB on disk for 500k docs) fit under one 128 MB split, so every",
        "downstream scan ran on ONE core — the round-5 'steep' capstone",
        "curves (36.6×/30.2×) were roughly half file-layout artifact. Real",
        "corpora at K× arrive in ~K× more files; 32 files keeps the stress",
        "on the operators. All ratios in this file are re-measured on the",
        "32-file replicas (2026-08-16).",
        "",
        "`inv_d_jaccard_prefix` runs at 10× only: on the all-clones replica",
        "its RESULT SET grows K² per clone set (every rep pair expands to",
        "K×K member pairs — ~70e9 output rows at 100×), so a 100× run",
        "measures materializing the answer, not the operator — the same",
        "documented output-bound class as the SimHash pair dump. The",
        "pairwise MACHINERY at 100× is covered by the capstone breakdown",
        "below (pairs 1.7 s, components 3.4 s on the same replica).",
        "",
        "## Capstone stage breakdown at 100× (round-6 task, 2026-08-16)",
        "",
        "Per-phase wall time on the 32-file 100× replica (500k docs/vectors),",
        "each phase noop-executed independently:",
        "",
        "| phase | inv_x_curated_corpus | inv_x_semantic_curation |",
        "|---|---|---|",
        "| quality/rep scan | 89.0 s (regex quality chain) | 0.9 s (vector rep collapse) |",
        "| signatures / LSH pairs | 54.5 s (shingle+minhash scan) | 2.1 s (bucket pairs + cosine) |",
        "| candidate pairs | 1.7 s | (above) |",
        "| connected components | 3.4 s | 2.8 s |",
        "| full query | 90.3 s | 64.8 s |",
        "",
        "Conclusion: the pairwise/cluster phases are FLAT at 100× (clone",
        "collapse + banded buckets + star contraction hold); the growth is",
        "inherent scan-bound work — per-document regex quality scoring and",
        "shingle hashing, both linear and embarrassingly parallel, i.e. the",
        "phases a 1000-executor cluster absorbs by adding executors. No",
        "super-linear phase remains; no fix needed beyond the replica-layout",
        "correction above.",
        "",
        "## Round-7 retrieval/graph rows",
        "",
        "`inv_g_link_prediction` measures 8.09× at 10× and 15.52× at 100× —",
        "the wedge cap SATURATES: the replica densifies the co-purchase",
        "graph (fixed part catalog, K× baskets), degrees exceed the",
        "256-neighbor cap between 10× and 100×, and per-node wedge fan-out",
        "stops growing (Σ min(deg,256)² is flat once saturated), so the",
        "10×→100× step adds only scan-bound work. Exactly the hub-growth",
        "bound the cap exists to provide. `inv_t_bm25_topk` (1.39× / 3.55×)",
        "is posting-list-bound as designed: candidate volume tracks the",
        "query terms' posting mass, never pairs. `inv_g_assoc_rules` 2.71×",
        "at 10× — support pruning keeps the rule table catalog-bound.",
        "Closing round-7 additions at 10×: `inv_v_pca_power` 1.08× (the",
        "loop is fixed-round one-row reduces — pure scan growth),",
        "`inv_t_hybrid_ndcg` 1.36× (every stage top-k-bounded),",
        "`inv_d_incremental_versioned` 1.76× (batch-sized admission work",
        "against a 10× store reference), `inv_t_bm25_prf` 2.09× (two",
        "posting-mass-bound passes over one index).",
        "",
        "## Round-8 rows",
        "",
        "100× for the round-7 heavies (r7 verdict task 7):",
        "`inv_v_pca_power` 1.18× — as predicted, ~flat: eight one-row",
        "reduces, growth is the scan and the scan parallelizes.",
        "`inv_t_hybrid_ndcg` 3.19× — every stage top-k-bounded; the",
        "growth is the two legs' corpus passes. `inv_t_bm25_prf` 6.82× —",
        "posting-mass-bound; the all-clones replica multiplies every",
        "query term's posting list 100×, so ~7× wall for 100× posting",
        "mass is the index doing its job. `inv_d_incremental_versioned`",
        "8.78× — the admission batch is 100× bigger AND the store",
        "reference is 100× bigger; both sides stay banded (no pair",
        "blowup: 100×/100× input at 8.8× wall).",
        "",
        "10× for the round-7/8 additions: kalman 1.43× (wide axis; the",
        "deep-key table above covers the depth axis), char_entropy 1.29×,",
        "domain_kl 0.89×, embedding_outliers 0.83× (both still",
        "overhead-dominated at this size), st_heavy_hitters 2.25×",
        "(availableNow replay + CMS merge — linear sketch, batch-sized",
        "work), ql_dirichlet 0.95× (posting-mass-bound like bm25),",
        "hybrid_rrf3 1.38× (three top-k legs + coalescing joins),",
        "cdc_admission 1.31× (eviction anti-join + batch-vs-store LSH).",
        "Later round-8 entries, same sweep: rake 1.05×, markov_stationary",
        "1.40×, target_encode 1.11×, st_quantile_bins 1.62×, hurst 1.85×",
        "— all overhead-dominated at this size.",
        "",
        "Streaming-source note: stream_events now streams the events",
        "directory directly when the table is multi-file (the replica /",
        "real-lake layout) — the old pathGlobFilter matched no leaf file",
        "inside a directory table and the stream was silently empty.",
        "",
        "HITS cadence/width sweep (r7 verdict task 3): checkpoint cadence",
        "1 is the floor — every-2nd-round checkpointing measured +45% and",
        "every-4th +160% at sf0.1 (the doubled lineage re-plans the whole",
        "half-step subtree), so the 5-iteration loop keeps one checkpoint",
        "per round. Width: HITS's two skinny (key,double) half-steps",
        "prefer 100k rows/task over the 300k default — order-independent",
        "fresh-JVM A/B: −33% at sf0.1 (3.24 vs 4.82 s), −20% at 100×",
        "(129–138 vs 162–166 s cold) — while pagerank's wider adjacency",
        "join prefers 300k (100k measured +25%); _loop_shuffle now takes",
        "a per-operator rows_per_task. The 100× absolute improved 120.8 →",
        "110.7 s in-harness; the remaining constant is the 5-iteration",
        "floor: 10 skinny join+agg passes over 57M edges plus 4 eager",
        "O(baskets) checkpoint materializations, all width-linear.",
        "",
        "## Adversarial hot bucket (round-4 cap)",
        "",
        "The replica stress above collapses exact clones before the LSH",
        "self-join, which kills the common quadratic — but many DISTINCT",
        "near-identical texts hashing to one band bucket still used to produce",
        "O(b²) candidates inside that bucket. `bucket_pair_candidates`",
        "(dedup.py) now routes buckets over `hot_bucket_cap` members to chain",
        "pairing: members are sorted by a similarity-preserving key and each",
        "pairs only with its `chain_window` successors, keeping real clusters",
        "connected (components re-join them) while bounding fan-out at",
        "window·b pairs. Measured on the degenerate corpus — 50,000 distinct",
        "docs in ONE bucket (cap 256, window 4): 199,990 candidate pairs in",
        "5.3 s where the uncapped self-join would emit 1,249,975,000 — a",
        "6,250× cut, linear in bucket size. Correctness pinned in",
        "tests/test_dedup_similarity.py (connectivity kept, sub-threshold",
        "buckets bit-identical to the uncapped path).",
    ]
    return "\n".join(lines) + "\n"


def main() -> None:
    import json

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    deep = "--deep" in sys.argv
    k = int(args[0]) if args else 10
    queries = args[1:] if len(args) > 1 else (DEEP_QUERIES if deep else QUERIES)
    out_dir = os.path.join(
        REPO, ".scalecheck", f"deep{k}" if deep else f"x{k}"
    )
    spark = get_spark("scalecheck")
    if "--rebuild" in sys.argv or not os.path.exists(
        os.path.join(out_dir, "events.parquet")
    ):
        print(f"building {'deep ' if deep else ''}{k}x replica at {out_dir} ...", file=sys.stderr)
        (build_deep_replica if deep else build_replica)(spark, k, out_dir)

    rows = []
    if not deep and k >= 100:
        skipped = [q for q in queries if q in _OUTPUT_QUADRATIC]
        queries = [q for q in queries if q not in _OUTPUT_QUADRATIC]
        for q in skipped:
            print(f"{q}: skipped at {k}x (output-quadratic pair dump; "
                  "see SCALECHECK.md)", file=sys.stderr)
    for name in queries:
        t1 = time_query(spark, name, BASE)
        tk = time_query(spark, name, out_dir)
        ratio = round(tk / t1, 2) if t1 > 0 else float("inf")
        rows.append((name, t1, tk, ratio))
        print(f"{name}: {t1}s -> {tk}s  ({ratio}x at {k}x data)", file=sys.stderr)

    # merge into the per-K results store so SCALECHECK.md keeps every K
    store = os.path.join(REPO, ".scalecheck", "results.json")
    results: dict = {}
    if os.path.exists(store):
        with open(store) as fh:
            results = json.load(fh)
    key = f"deep:{k}" if deep else str(k)
    existing = {r[0]: r for r in results.get(key, [])}
    for r in rows:
        existing[r[0]] = list(r)
    results[key] = [existing[n] for n in sorted(existing)]
    os.makedirs(os.path.dirname(store), exist_ok=True)
    with open(store, "w") as fh:
        json.dump(results, fh, indent=1)

    md = _render(results)
    with open(os.path.join(REPO, "SCALECHECK.md"), "w") as fh:
        fh.write(md)
    print(md)
    spark.stop()


if __name__ == "__main__":
    main()
