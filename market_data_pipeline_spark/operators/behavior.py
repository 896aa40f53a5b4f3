"""User-behavior analytics over the events stream table: conversion funnels
and cohort retention — the event-sequence queries a market/product pipeline
runs daily. Absent from the reference (its analytics stop at per-symbol
indicators; src/analyzers/ has empty placeholder files) — this module is the
events-table analog of the breadth derivation (SURVEY.md §2.4 A1): raw rows
in, market/user-level aggregates out.

Scale shape: every step keys on user_id, so the funnel's three aggregates
and the retention join reuse ONE hash partitioning (co-partitioned joins, no
extra exchanges); final outputs are O(stages) / O(cohorts × days) rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from market_data_pipeline_spark.sources.tables import load_table


def conversion_funnel(
    spark: SparkSession,
    sf_dir: str,
    stages: tuple[str, ...] = ("view", "click", "purchase"),
) -> DataFrame:
    """Ordered conversion funnel: a user counts for stage i+1 only with an
    event at-or-after their stage-i entry time (min-ts semantics).

    Each stage is a filtered min-aggregate joined to the previous stage's
    per-user times — all shuffles on user_id, so AQE plans them as one
    co-partitioned chain. Output: one row per stage with the surviving
    user count (the classic funnel table).
    """
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    prev: DataFrame | None = None
    counts: list[DataFrame] = []
    for i, stage in enumerate(stages):
        cur = ev.filter(F.col("event_type") == stage)
        if prev is not None:
            cur = cur.join(prev, "user_id").filter(F.col("ts") >= F.col("__t_prev"))
        entered = cur.groupBy("user_id").agg(F.min("ts").alias("__t_prev"))
        counts.append(
            entered.agg(F.count(F.lit(1)).alias("n_users")).select(
                F.lit(f"{i + 1}_{stage}").alias("stage"), "n_users"
            )
        )
        prev = entered
    out = counts[0]
    for c in counts[1:]:
        out = out.unionByName(c)
    return out


def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-activity day; for each
    (cohort_day, day_offset) the count of distinct active users.

    Two user-keyed shuffles (first-day agg, then the enrich join is
    co-partitioned) + one small (cohort, offset)-keyed count-distinct.
    Output is O(days²/2) rows regardless of event volume.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("day")
    )
    first_day = ev.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        ev.join(first_day, "user_id")
        .groupBy(
            "cohort_day",
            F.datediff(F.col("day"), F.col("cohort_day")).alias("day_offset"),
        )
        .agg(F.countDistinct("user_id").alias("active_users"))
    )


def cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime value: users grouped by first-activity day; for each
    (cohort_day, day_offset) the day's purchase revenue, the RUNNING
    cumulative revenue, and LTV per cohort user — the value-weighted twin
    of ``retention_cohorts`` (which counts bodies; this follows the money).

    Same shuffle shape as retention (user-keyed first-day agg + co-
    partitioned enrich join, then a (cohort, offset) aggregate); the
    cumulative sum is a cohort-partitioned ordered window over the
    O(days²/2) aggregate, never the event stream. Per-day revenue is
    4 dp-quantized BEFORE the running sum on both engines, so the
    left-to-right cumulative is bit-identical.
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("day"), "event_type", "value"
    )
    first_day = ev.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    size = first_day.groupBy("cohort_day").agg(
        F.count(F.lit(1)).alias("cohort_users")
    )
    per_day = (
        ev.join(first_day, "user_id")
        .groupBy(
            "cohort_day",
            F.datediff(F.col("day"), F.col("cohort_day")).alias("day_offset"),
        )
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(
                        0.0
                    )
                )
                + F.lit(1e-9),
                4,
            ).alias("day_revenue")
        )
    )
    w = Window.partitionBy("cohort_day").orderBy("day_offset")
    cum = F.sum("day_revenue").over(w)
    return (
        per_day.join(size, "cohort_day")
        .select(
            "cohort_day",
            "day_offset",
            "day_revenue",
            F.round(cum + F.lit(1e-9), 4).alias("cum_revenue"),
            F.col("cohort_users").cast("long").alias("cohort_users"),
            F.round(cum / F.col("cohort_users") + F.lit(1e-9), 6).alias(
                "ltv_per_user"
            ),
        )
    )


def event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition counts: for each user's time-ordered
    event stream, count (event_type → next event_type) pairs. One window
    exchange on user_id (lead is a per-partition sort), then a tiny
    (from, to)-keyed count — output is O(|event types|²) regardless of
    volume. The building block for path/journey analysis.
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts", "event_id")
    # event_id tiebreaks equal timestamps so the sequence is deterministic
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("next_type", F.lead("event_type").over(w))
        .filter(F.col("next_type").isNotNull())
        .groupBy(F.col("event_type").alias("from_type"), F.col("next_type").alias("to_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def touch_attribution(
    events: DataFrame,
    conversion_type: str = "purchase",
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """First-touch / last-touch conversion attribution: for every
    conversion event, credit the user's EARLIEST and LATEST preceding
    non-conversion event type with the conversion (and its value) — the
    two classic single-touch marketing-attribution models, side by side
    as (model, event_type, conversions, attributed_value) rows.

    One window exchange on the user (first/last with ignorenulls over
    the unbounded-preceding-to-1-preceding frame, ``id_col`` tiebreaking
    equal timestamps), then a tiny (model, type)-keyed aggregate —
    output is O(2·|event types|) at any volume. Conversions with no
    preceding touch (the user's first event) are unattributable and
    excluded from both models.
    """
    from pyspark.sql import Window

    touch = F.when(F.col(type_col) != conversion_type, F.col(type_col))
    w = (
        Window.partitionBy(user_col)
        .orderBy(ts_col, id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    pur = (
        events.select(user_col, type_col, ts_col, value_col, id_col)
        .withColumn("__ft", F.first(touch, ignorenulls=True).over(w))
        .withColumn("__lt", F.last(touch, ignorenulls=True).over(w))
        .filter(F.col(type_col) == conversion_type)
    )
    both = pur.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("first_touch").alias("model"),
                    F.col("__ft").alias("touch_type"),
                ),
                F.struct(
                    F.lit("last_touch").alias("model"),
                    F.col("__lt").alias("touch_type"),
                ),
            )
        ).alias("m"),
        F.col(value_col),
    ).select("m.model", F.col("m.touch_type").alias("event_type"), value_col)
    return (
        both.filter(F.col("event_type").isNotNull())
        .groupBy("model", "event_type")
        .agg(
            F.count(F.lit(1)).alias("conversions"),
            F.round(F.sum(value_col) + F.lit(1e-9), 4).alias("attributed_value"),
        )
        .orderBy("model", "event_type")
    )


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
    value_col: str | None = "value",
) -> DataFrame:
    """Gap-based sessionization: assign each event a session by splitting a
    user's ordered event stream wherever the inter-event gap exceeds
    ``gap_minutes``, then roll up one row per session (start, end, length,
    event count). The batch twin of ``session_window`` that ALSO yields the
    session id (the streaming form aggregates but never labels rows —
    labeling is what downstream joins need).

    Classic two-window trick: boundary flag = gap > threshold, session
    ordinal = running sum of flags. Both windows share one partitioning on
    ``user_col`` (a single exchange + sort); the rollup groupBy reuses it.
    At 100 TB a user's history fits one partition by construction — the key
    is the user, never the whole stream.

    ``value_col`` names the column rolled up into ``total_value``; pass
    ``None`` (or point at an input without it — the default ``"value"`` is
    skipped when absent) to omit the rollup instead of throwing on inputs
    that carry no value column.

    Reference analog: none (the reference has no event-stream semantics);
    BASELINE.json behavior-analytics surface.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(ts_col)
    gap_s = F.col(ts_col).cast("long") - F.lag(ts_col).over(w).cast("long")
    is_new = F.when(
        gap_s.isNull() | (gap_s > gap_minutes * 60), 1
    ).otherwise(0)
    labeled = events.withColumn("session_seq", F.sum(is_new).over(w))
    aggs = [
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        (F.max(ts_col).cast("long") - F.min(ts_col).cast("long")).alias(
            "duration_s"
        ),
        F.count(F.lit(1)).alias("n_events"),
    ]
    if value_col is not None and value_col in events.columns:
        aggs.append(F.round(F.sum(value_col), 4).alias("total_value"))
    return labeled.groupBy(user_col, "session_seq").agg(*aggs)


def activity_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user activity burstiness: the Fano factor (index of dispersion)
    of DAILY event counts — variance/mean of a user's per-day activity.
    Poisson-regular users sit near 1, bursty accounts (bots, scrapers,
    campaign spikes) run high, metronomic schedulers run low — the
    behavioral-regularity feature abuse pipelines threshold on.

    Daily counts are integers, so the dispersion moments are EXACT
    (decimal power sums, any partition order) and the closing division is
    one fixed IEEE expression — full value oracle. Two map-side-combined
    aggregates: (user, day) counts, then per-user moments.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("day")
    )
    daily = ev.groupBy("user_id", "day").agg(F.count(F.lit(1)).alias("c"))
    c = F.col("c").cast("bigint")
    d38 = lambda e: e.cast("decimal(38,0)")  # noqa: E731
    g = daily.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum(d38(c)).alias("__s1"),
        F.sum(d38(c * c)).alias("__s2"),
    )
    k = F.col("n_days").cast("double")
    s1, s2 = F.col("__s1").cast("double"), F.col("__s2").cast("double")
    mean = s1 / k
    var = (s2 / k) - (mean * mean)
    fano = var / mean
    return g.select(
        "user_id",
        F.col("n_days").cast("long").alias("n_days"),
        F.col("__s1").cast("long").alias("n_events"),
        F.round(mean + F.lit(1e-9), 6).alias("mean_daily"),
        F.round(fano + F.lit(1e-9), 6).alias("fano"),
        (fano > F.lit(1.5)).alias("is_bursty"),
    )


def top_paths(spark: SparkSession, sf_dir: str, k: int = 20) -> DataFrame:
    """Most-travelled 3-step event journeys: for every position in a
    user's time-ordered stream, the (step1 → step2 → step3) trigram,
    counted corpus-wide and ranked — the journey-analysis extension of
    ``event_transitions`` (first-order Markov counts can't see that
    view→click→purchase dwarfs view→click→view even when the pairwise
    edges agree).

    One window exchange on user_id (two leads share the sort); the count
    shuffle is O(|event types|³)-bounded. Deterministic: event_id
    tiebreaks equal timestamps, ties in count break lexicographically.
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("__t1", F.lead("event_type", 1).over(w))
        .withColumn("__t2", F.lead("event_type", 2).over(w))
        .filter(F.col("__t2").isNotNull())
        .groupBy(
            F.col("event_type").alias("step1"),
            F.col("__t1").alias("step2"),
            F.col("__t2").alias("step3"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "step1", "step2", "step3")
        .limit(k)
    )


def markov_stationary(
    spark: SparkSession, sf_dir: str, iterations: int = 8
) -> DataFrame:
    """Stationary distribution of the first-order event-type Markov
    chain — the long-run equilibrium share of each event type, the
    chain-level complement to ``event_transitions`` (one step) and
    ``top_paths`` (pattern mining): "where does user behavior settle".

    Chain construction: transition counts from ``event_transitions``;
    STATES are the types with outgoing transitions, edges into
    terminal-only types are dropped and each row renormalized over the
    kept edges so the matrix is row-stochastic OVER KEPT EDGES
    (documented bound: a type that only ever ends streams is excluded).
    Second-order drops are NOT iterated: if a source's kept edges all
    target dropped states, that row leaks probability mass each step and
    ``stationary_prob`` need not sum to ~1 — the SQL oracle replays the
    same single-pass drop, so parity holds; callers needing a closed
    chain should iterate the drop to a fixpoint upstream. π starts
    uniform and takes ``iterations`` quantized power steps.

    Scale shape: the corpus pays ONE user-windowed lead pass (inside
    event_transitions); everything after is O(|types|²) — a bounded
    MODEL, not data (the k-means-centroid class), so the π iteration
    runs driver-side in pure python on the collected matrix: no
    per-round Spark jobs at all for a ≤10⁴-cell matrix. Probabilities
    and every π iterate quantize at 10 dp (+1e-13), so the chained-CTE
    oracle replays the fixpoint exactly (sums span ≤|types| quantized
    terms — drift ~1e-16 against a 5e-11 half-quantum).

    Output: (event_type, stationary_prob, n_out) — n_out = kept
    outgoing transition count feeding the row's probabilities."""
    trans = event_transitions(spark, sf_dir)
    sources = trans.select(F.col("from_type").alias("to_type")).distinct()
    kept = trans.join(sources, "to_type")  # drop edges into terminal-only
    tot = kept.groupBy("from_type").agg(F.sum("n").alias("__tot"))
    pmat = kept.join(tot, "from_type").select(
        "from_type",
        "to_type",
        F.round(
            F.col("n").cast("double") / F.col("__tot") + F.lit(1e-13), 10
        ).alias("p"),
        F.col("__tot"),
    )
    rows = pmat.collect()  # O(|types|²) bounded model — never data-sized
    states = sorted({r["from_type"] for r in rows})
    if not states:
        return spark.createDataFrame(
            [], "event_type string, stationary_prob double, n_out long"
        )
    p = {(r["from_type"], r["to_type"]): r["p"] for r in rows}
    n_out = {r["from_type"]: int(r["__tot"]) for r in rows}
    pi = {s: round(1.0 / len(states) + 1e-13, 10) for s in states}
    for _ in range(iterations):
        pi = {
            b: round(
                sum(pi[a] * p.get((a, b), 0.0) for a in states) + 1e-13, 10
            )
            for b in states
        }
    out = [(s, pi[s], n_out[s]) for s in states]
    return spark.createDataFrame(
        out, "event_type string, stationary_prob double, n_out long"
    )
