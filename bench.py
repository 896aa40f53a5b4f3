"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query executes to completion through the noop sink (full plan runs,
nothing collected to the driver — the honest distributed cost). Each is
run three times; the min is recorded and gated, and the max-min spread
is reported per query (shared-box noise filter; no data caching between
runs, see the loop comment). The spread field exists so a cross-round
comparison can tell a real regression from scheduler noise — round 3
produced two phantom regressions that a recorded spread would have
flagged immediately.

Regression gate (round-1 verdict #6): BASELINE_BENCH.json pins the r1
driver-recorded numbers; this script exits 1 (after printing the JSON line)
if total > 2x the baseline total or any query > 3x its baseline entry
plus a 1s absolute noise floor — the 2x perf contract is self-enforcing. Gate only engages at the baseline's
SF so local sf0.01 iteration never false-alarms.

r10 (r9 verdict task 2 — the r9 driver run tripped the gate on a clean
tree): both gate checks normalize by the run's own host-slowness factor
(the clamped MEDIAN time/budget ratio — budgets were pinned on a faster
box than the one the driver graded on), and any query still over its
normalized threshold is RE-MEASURED once at the end of the run before
gating, so a transient interference burst that outlasted its own three
back-to-back runs gets samples maximally distant from the burst. A
persistent regression reproduces in the late samples and still exits 1.
"""

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from market_data_pipeline_spark.session import get_spark

HEADLINE = [
    "inv_q1_pricing_summary",
    "inv_q5_revenue_by_nation",
    "inv_q3_top_orders",
    "inv_w1_sma",
    "inv_w3_rsi",
    "inv_w8_returns_momentum",
    "inv_s1_bars_ohlcv",
    "inv_a1_breadth",
    "inv_w14_composite_signal",
    "inv_w2_ema_macd",
    "inv_a6a8_quality",
    "inv_o4_topk_per_group",
    # LLM-data-pipeline families (round-2 verdict #6): the bench tracks the
    # dedup / similarity / text-analysis / curation capstones alongside the
    # relational+window headline so their regression gate is live too.
    "inv_d_minhash_lsh",
    "inv_sim_ann_topk",
    "inv_t_tfidf",
    "inv_x_curated_corpus",
    # the most expensive capstone in the repo (round-3 verdict #3): the
    # SemDeDup-shaped embedding-cluster curation joins documents ⋈
    # embeddings ⋈ LSH components in one plan — a regression here would
    # otherwise go unnoticed by the gate.
    "inv_x_semantic_curation",
    # round-4 additions, gated by the same "most expensive queries must be
    # in the regression gate" rule: the exact Jaccard prefix join (output-
    # bound on the clone-saturated corpus) and the iterative PageRank loop.
    "inv_d_jaccard_prefix",
    "inv_g_pagerank",
    # late round 4: bipartite HITS became the most expensive unbenched
    # query after its scalar-broadcast normalization was rewritten as a
    # whole-frame window (16.9 -> ~8 s at 5 rounds); same gate rule.
    "inv_g_hits",
    # and the LSH banding sweep (exact truth + three candidate configs in
    # one plan) lands in the same cost band as the gated capstones.
    "inv_d_lsh_band_sweep",
    # round 5: the versioned-store scan (manifest planning + file-skip
    # evaluation + stats-pruned read — the most expensive unbenched query
    # after the HITS rewrite, same gate rule) and the new iterative
    # logistic-regression trainer (one aggregate pass per GD step).
    "inv_s_versioned_scan",
    "inv_x_quality_logreg",
    # round 6: the unigram-LM tokenizer round trip (train via Viterbi-EM
    # folds + corpus encode) — the round's most expensive new query,
    # same gate rule.
    "inv_t_unigram_encode",
    # late round 6: the two most expensive new queries of the round — the
    # shingle-containment join (pairwise prefix-filter family, same cost
    # band as jaccard_prefix) and TextRank (a pagerank loop over the word
    # graph). Same gate rule.
    "inv_d_containment",
    "inv_t_textrank",
    # and the closing round-6 pair in the same cost band: the wedge-join
    # link prediction and the stateful streaming CUSUM (the one streaming
    # query in the headline — it runs its availableNow pass per
    # measurement, which is the honest cost of the streaming surface).
    "inv_g_link_prediction",
    "inv_st_cusum",
    # round 7: the two most expensive new queries (gate rule) — the
    # versioned-change-feed incremental dedup (table build + manifest-
    # planned batch + cross-corpus LSH per measurement) and the hybrid-
    # retrieval nDCG grading, whose plan CONTAINS the BM25 leg, the ANN
    # leg, and the RRF fusion as subplans (inv_t_hybrid_rrf regressions
    # surface here without double-measuring the shared legs).
    "inv_d_incremental_versioned",
    "inv_t_hybrid_ndcg",
    # and the round's closing retrieval entry: BM25 with pseudo-relevance
    # feedback — two scoring passes over one shared inverted index.
    "inv_t_bm25_prf",
    # plus the embedding-PCA power iteration (8 one-row-reduce rounds —
    # the round's most expensive new query after its codegen-reuse and
    # loop-conf fixes; gate rule).
    "inv_v_pca_power",
    # round 8 (gate rule, warm min-of-2 measured): the three-leg hybrid
    # nDCG grade (its plan CONTAINS the BM25, ANN, and QL legs plus the
    # rrf3 fusion — the r7 hybrid_ndcg precedent, so inv_t_ql_dirichlet /
    # inv_t_hybrid_rrf3 regressions surface here without double-measuring
    # the shared legs), the CDC-lifecycle dedup admission (table build +
    # merge + delete + keyed diff + admission per measurement), the
    # unigram-LM document cross-entropy (full-vocab Viterbi + corpus
    # join), label-propagation communities (5-round integer loop), and
    # top-2 PCA (two power-iteration fits; pca_power stays above so a
    # pca2 regression localizes to the deflation half).
    "inv_t_hybrid_ndcg3",
    "inv_d_cdc_admission",
    "inv_t_unigram_ppl",
    "inv_g_label_prop",
    "inv_v_pca2",
]

RUNS_PER_QUERY = 3


def _int_env(name: str, default: int) -> int:
    try:
        return int(os.environ.get(name, ""))
    except ValueError:
        return default


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    # Test-only knobs (r9 verdict task 1): the bench-CLI FORMAT contract
    # (one JSON line, complete queries dict, sidecar discipline) does not
    # need the full 38-entry × 3-run headline, whose honest sf0.001
    # runtime (~6 min alone) made the pytest subprocess timeout flake
    # under session load. The contract test subsets to a few queries ×
    # 1 run; the driver's invocations leave BOTH unset, so the measured
    # methodology (full headline, min-of-3) is unchanged. A subset run
    # never writes the sidecar and never engages the regression gate.
    n_sub = _int_env("SPARK_GRAFT_BENCH_QUERIES", 0)
    runs = max(1, _int_env("SPARK_GRAFT_BENCH_RUNS", RUNS_PER_QUERY))
    full_methodology = n_sub <= 0 and runs == RUNS_PER_QUERY
    spark = get_spark("bench")
    qs = entrymod.queries()
    names = [n for n in HEADLINE if n in qs]
    if n_sub > 0:
        names = names[:n_sub]
    # warm the JVM + file metadata cache once with the cheapest query, and
    # the Arrow/Python UDF workers (long-lived in a real deployment) with a
    # 1-row pandas-UDF round-trip so no query pays one-time startup cost
    qs["inv_q1_pricing_summary"](spark, sf_dir).write.format("noop").mode("overwrite").save()
    import pandas as pd
    from pyspark.sql import functions as F

    @F.pandas_udf("double")
    def _warm(v: pd.Series) -> pd.Series:
        return v * 1.0

    spark.range(32).repartition(32).select(_warm(F.col("id").cast("double"))).write.format(
        "noop"
    ).mode("overwrite").save()

    # Each query runs RUNS_PER_QUERY times; the min is recorded and gated,
    # max-min is reported as the spread. Rationale: this box is shared, and
    # several queries (the component-contraction loops) run a handful of
    # eager jobs whose fixed scheduling cost is noise-sensitive — a single
    # CPU-contention spike can triple a sub-10s measurement. No data is
    # cached between runs (noop sink, no .cache()), so every run re-executes
    # the full distributed plan; min-of-N measures achievable latency
    # rather than scheduler luck, and the spread quantifies that luck.
    def _samples(run, n=runs) -> list[float]:
        out = []
        for _ in range(n):
            t0 = time.time()
            run()
            out.append(time.time() - t0)
        return out

    def _run_of(name: str):
        if name == "entry_flagship":
            return lambda: entrymod.entry(spark).write.format("noop").mode(
                "overwrite"
            ).save()
        return lambda: qs[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()

    all_samples: dict[str, list[float]] = {}
    for name in names:
        all_samples[name] = _samples(_run_of(name))
    # the flagship daily path (entry) gets a tracked number too (verdict #8)
    all_samples["entry_flagship"] = _samples(_run_of("entry_flagship"))

    def _finalize():
        t = {n: round(min(s), 3) for n, s in all_samples.items()}
        sp = {n: round(max(s) - min(s), 3) for n, s in all_samples.items()}
        return t, sp

    timings, spreads = _finalize()
    # Suspect re-measure (r9 verdict task 2): min-of-3 back-to-back runs
    # cannot absorb a host-interference burst that outlasts all three (the
    # r9 driver run measured the untouched inv_x_curated_corpus at 34 s —
    # 3.6 s on the same commit an hour later — and the gate false-alarmed).
    # Any query that would trip the per-query gate gets ONE more full
    # measurement pass at the END of the run, maximally distant in time
    # from its own burst; the min over all samples is still an honest
    # fresh computation of the identical plan (no caching — noop sink).
    # A PERSISTENT 3x regression reproduces here and still trips.
    if full_methodology and sf == _baseline_sf():
        for name in _suspects(timings):
            all_samples[name] += _samples(_run_of(name))
        timings, spreads = _finalize()
    total = round(sum(timings.values()), 3)
    # Full payload (with the per-query spread block) goes to the committed
    # sidecar; the PRINTED line is the compact driver-contract subset.
    # Round-8 postmortem: the printed line grew to 2,243 chars while the
    # driver's merged-output tail window is 2,000 — the line's HEAD was
    # truncated and BENCH_r08.json parsed null. The driver contract needs
    # {"metric", "value", "unit", "queries", "sf"}; "spread" is bench-local
    # diagnostics, so it is the block that stays sidecar-only (~1.0 kB
    # saved, keeping the line comfortably inside the window as the
    # headline grows).
    payload = json.dumps(
        {
            "metric": "headline_queries_total",
            "value": total,
            "unit": "sec",
            "queries": timings,
            "spread": spreads,
            "sf": sf,
        }
    )
    line = json.dumps(
        {
            "metric": "headline_queries_total",
            "value": total,
            "unit": "sec",
            "queries": timings,
            "sf": sf,
        }
    )
    # The JSON line must be the FINAL stdout output (round-7 postmortem: the
    # streaming queries' StateStore maintenance thread logged a shutdown WARN
    # *after* the JSON line, and the driver's merged-output tail capture
    # pushed the medians out of its window — BENCH_r07.json lost its payload).
    # So: stop any still-active streams, silence the JVM logger, and stop the
    # session BEFORE printing; nothing can write to the merged stream after.
    for q in spark.streams.active:
        q.stop()
    spark.sparkContext.setLogLevel("OFF")
    spark.stop()
    # Sidecar with the same payload, committed to git, so per-query medians
    # survive any future output-capture quirk regardless of what the driver
    # manages to parse from stdout.
    # Only the driver-scale run (sf0.1 at the full 32-core width, full
    # methodology) owns the committed sidecar — a cheap sf0.001 invocation
    # (e.g. the bench-contract pytest) or the driver's reduced-core scaling
    # run (r9: the 8-core pass clobbered the committed 32-core closing
    # record) must not overwrite the per-round record.
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "")
    if sf == 0.1 and full_methodology and cpus in ("", "32"):
        sidecar = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "BENCH_SELF.json"
        )
        with open(sidecar, "w") as fh:
            fh.write(payload + "\n")
    # The per-query dict must stay complete (driver contract: entries are
    # never removed or renamed), so if the headline ever grows the line past
    # ~1.9 kB the fix is to shorten NOTHING here but to re-negotiate the
    # window — warn loudly on stderr instead of printing a mutilated line.
    if len(line) > 1900:
        print(f"WARNING: bench JSON line {len(line)} chars nears the 2000-char tail window", file=sys.stderr)
    print(line)
    sys.stdout.flush()
    sys.exit(_gate(timings, sf) if full_methodology else 0)


def _load_baseline() -> dict | None:
    base_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BASELINE_BENCH.json")
    try:
        with open(base_path) as fh:
            base = json.load(fh)
        return {"queries": dict(base["queries"]), "sf": base["sf"]}
    except (OSError, ValueError, KeyError, TypeError):
        return None


def _baseline_sf() -> float:
    base = _load_baseline()
    return base["sf"] if base is not None else -1.0


def _norm_factor(timings: dict[str, float], base_q: dict[str, float]) -> float:
    """Host-slowness factor for THIS run: the median of the per-query
    time/budget ratios over the tracked intersection, clamped to [1, 4].

    Budgets are pinned on one box; the driver's box has measured
    plan-identical fixed-cost queries 2-4x slower (r9: TPC-H q1, zero
    code change, 0.42 -> 1.38 s), so unnormalized thresholds alarm on a
    clean tree. The MEDIAN over ~38 queries moves only when the whole
    run is uniformly slow — the signature of a slow host, not of a code
    change, which lands in individual queries (plans are pinned per
    query by test_plan_shapes). A broad >4x code regression would saturate
    the clamp and still trip the total check. Needs >= 8 tracked queries
    to engage (a subset run gates unnormalized)."""
    ratios = sorted(
        timings[n] / base_q[n] for n in timings if n in base_q and base_q[n] > 0
    )
    if len(ratios) < 8:
        return 1.0
    mid = ratios[len(ratios) // 2]
    return min(max(mid, 1.0), 4.0)


def _suspects(timings: dict[str, float]) -> list[str]:
    """Queries whose current min would trip the normalized per-query
    check — the re-measure candidates (and, post re-measure, the trips).

    3x relative + 1s absolute: sub-second baselines are scheduling-
    noise-bound on a shared box (a single contention spike triples a
    0.9s query), so the per-query trigger needs an absolute floor —
    a real regression on any query that matters clears 3x + 1s easily."""
    base = _load_baseline()
    if base is None:
        return []
    base_q = base["queries"]
    tracked = {n: timings[n] for n in timings if n in base_q}
    factor = _norm_factor(tracked, base_q)
    return [n for n in tracked if tracked[n] > 3.0 * base_q[n] * factor + 1.0]


def _gate(timings: dict[str, float], sf: float) -> int:
    """Return 1 if the run regressed past the self-imposed contract.

    The total comparison is over the INTERSECTION of measured and baseline
    query names, so adding a newly tracked query can never trip the 2×
    total check asymmetrically. A malformed baseline file disables the
    gate (returns 0) rather than crashing the one-JSON-line contract.

    r10 (r9 verdict task 2 — the gate false-alarmed on a clean tree in the
    driver's environment): both checks normalize by the run's own host-
    slowness factor (_norm_factor). The per-query factor is the clamped
    median ratio; the total check clamps tighter (2.0) so it stays a live
    backstop against broad many-query regressions that normalization
    could otherwise absorb. Transient single-query bursts are handled by
    measurement, not math: main() re-measures every would-be trip at the
    end of the run before gating (a pure threshold cannot distinguish a
    burst that outlasted its three back-to-back runs from a real
    regression — more, later samples can)."""
    base = _load_baseline()
    if base is None:
        return 0
    if sf != base["sf"]:
        return 0  # gate is calibrated at the baseline SF only
    base_q = base["queries"]
    rc = 0
    tracked = {n: timings[n] for n in timings if n in base_q}
    factor = _norm_factor(tracked, base_q)
    got_total = sum(tracked.values())
    want_total = sum(base_q[n] for n in tracked)
    if want_total > 0 and got_total > 2.0 * want_total * min(factor, 2.0):
        print(
            f"BENCH GATE: tracked total {round(got_total, 3)}s > 2x baseline "
            f"{round(want_total, 3)}s (host factor {round(min(factor, 2.0), 2)})",
            file=sys.stderr,
        )
        rc = 1
    for name in _suspects(timings):
        print(
            f"BENCH GATE: {name} {timings[name]}s > 3x baseline "
            f"{base_q[name]}s (x{round(factor, 2)} host factor, +1s grace)",
            file=sys.stderr,
        )
        rc = 1
    return rc


if __name__ == "__main__":
    main()
