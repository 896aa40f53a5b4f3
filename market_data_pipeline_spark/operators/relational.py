"""Relational layer: the join/agg/top-k/set-op surface exercised on the
TPC-H-ish tables, including the extensions SURVEY.md §2.3/§2.4 flags
(inner/left/semi/anti joins, intersect/except, cube/rollup, approx sketches).

These are deliberately thin wrappers over stock DataFrame ops — Catalyst owns
join strategy (broadcast below the threshold, sort-merge above, AQE skew
splitting) and the point of this module is the *plan shape*: filters before
joins, dims broadcast, partial aggregation everywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from market_data_pipeline_spark.sources.tables import load_table


def pricing_summary(spark: SparkSession, sf_dir: str, ship_before: str = "1998-09-02") -> DataFrame:
    """TPC-H Q1 shape — the canonical wide aggregate over lineitem."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.to_date("l_shipdate") <= F.lit(ship_before))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))), 2
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape — the 6-table star join. Dims (region/nation) broadcast;
    the orders⋈lineitem⋈customer path is the only real shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    # Partial-aggregate lineitem by orderkey BELOW the join (agg pushdown
    # Catalyst won't do): the join then sees |orders| rows, not |lineitem| —
    # a 4× input cut here, ~4–7× on real TPC-H data.
    li_per_order = li.groupBy("l_orderkey").agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("__rev"),
        F.count(F.lit(1)).alias("__n"),
    )
    return (
        li_per_order.join(o, li_per_order.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.round(F.sum("__rev"), 2).alias("revenue"),
            F.sum("__n").alias("n_items"),
        )
    )


def top_orders_by_revenue(spark: SparkSession, sf_dir: str, n: int = 10) -> DataFrame:
    """TPC-H Q3 shape — join + agg + deterministic top-N."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    # Aggregate per orderkey BEFORE the join: orderkey is the join key, so
    # the post-join group-by collapses to a 1:1 join + projection.
    li_per_order = li.groupBy(F.col("l_orderkey").alias("o_orderkey")).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue")
    )
    agg = li_per_order.join(o, "o_orderkey").select(
        "o_orderkey", "o_orderdate", "o_orderpriority", "revenue"
    )
    return agg.orderBy(F.col("revenue").desc(), F.col("o_orderkey")).limit(n)


def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join — NOT EXISTS (§2.3 extension)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return c.join(o, "c_custkey", "left_anti").select("c_custkey", "c_name", "c_mktsegment")


def customers_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi join — EXISTS (§2.3 extension)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return c.join(o, "c_custkey", "left_semi").select("c_custkey", "c_name", "c_mktsegment")


def part_supplier_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast dim lookup (J2 analog): lineitem ⋈ part, dim broadcast,
    grouped by brand."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("total_qty"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


def top_k_per_group(spark: SparkSession, sf_dir: str, k: int = 3) -> DataFrame:
    """Top-K per group via ranking window: biggest orders per market segment."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    j = o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        j.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("c_mktsegment", "o_orderkey", "o_totalprice", "rk")
    )


def rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (returnflag, linestatus) — §2.4 free extension."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


def cube_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (orderstatus, orderpriority)."""
    o = load_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )


def distinct_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact vs approximate distinct counts (§2.4 extension).

    approx_count_distinct is HLL++-based — the scale path when exact
    distinct's shuffle is the bottleneck. rsd pinned for determinism.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.countDistinct("l_partkey").alias("exact_parts"),
        F.countDistinct("l_suppkey").alias("exact_supps"),
    )


def price_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.4 extension — exact interpolated percentiles of order value per
    market segment (p50/p90/p99), plus the scale path approx_percentile.

    Exact `percentile` needs per-group sorted values (one shuffle on the
    group key, memory O(group)) and matches DuckDB quantile_cont's linear
    interpolation for the oracle. At 100 TB swap in `approx_percentile`
    (mergeable sketch, map-side combinable) — same call shape.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("p50"),
            F.round(F.expr("percentile(o_totalprice, 0.9)"), 4).alias("p90"),
            F.round(F.expr("percentile(o_totalprice, 0.99)"), 4).alias("p99"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


def segment_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1-U4 + extensions: union / intersect / except on customer key sets."""
    c = load_table(spark, sf_dir, "customer")
    auto = c.filter(F.col("c_mktsegment") == "AUTOMOBILE").select("c_nationkey")
    bld = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_nationkey")
    union = auto.union(bld).distinct().withColumn("set_op", F.lit("union"))
    inter = auto.intersect(bld).withColumn("set_op", F.lit("intersect"))
    minus = auto.exceptAll(bld).distinct().withColumn("set_op", F.lit("except"))
    return union.unionByName(inter).unionByName(minus)


def pivot_status_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (wide conditional aggregation) — order counts per segment by
    status. Pivot values pinned so the plan is static (no extra pass)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    j = o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
    return (
        j.groupBy("c_mktsegment")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.count(F.lit(1)))
        .na.fill(0)
        .toDF("c_mktsegment", "n_open", "n_fulfilled", "n_pending")
    )


# ---------------------------------------------------------------------------
# Decision-support depth (TPC-H-shaped, adapted to the testdata's columns).
# The point of this block is the *query-pattern* coverage Catalyst must
# optimize well: selective scans, semi joins with non-equi conditions,
# HAVING-subqueries, scalar-subquery thresholds, and correlated mins —
# the shapes the reference never needed but any engine claiming its
# workload at 100 TB will be asked for.
# ---------------------------------------------------------------------------


def selective_revenue(spark: SparkSession, sf_dir: str, year: int = 1996) -> DataFrame:
    """TPC-H Q6 shape — fully-pushable selective scan + single agg.

    All three predicates reach the parquet reader (``PushedFilters``); the
    aggregate is map-side partial. At 100 TB this is scan-bound and prunes
    to the year's partitions if the lake is date-partitioned.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.to_date("l_shipdate") >= F.lit(f"{year}-01-01"))
            & (F.to_date("l_shipdate") < F.lit(f"{year + 1}-01-01"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


def priority_order_counts(spark: SparkSession, sf_dir: str, quarter_start: str = "1996-07-01") -> DataFrame:
    """TPC-H Q4 shape — EXISTS with a non-equi correlated condition.

    Spark plans the semi join with the extra ``l_shipdate > o_orderdate``
    predicate as a join condition (no fallback to a per-row subquery); the
    orders-side date filter cuts the probe input before the shuffle.
    """
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o_q = o.filter(
        (F.to_date("o_orderdate") >= F.lit(quarter_start))
        & (F.to_date("o_orderdate") < F.add_months(F.lit(quarter_start).cast("date"), 3))
    )
    shipped_late = o_q.join(
        li,
        (o_q.o_orderkey == li.l_orderkey) & (li.l_shipdate > o_q.o_orderdate),
        "left_semi",
    )
    return shipped_late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


def returned_item_losses(spark: SparkSession, sf_dir: str, n: int = 20) -> DataFrame:
    """TPC-H Q10 shape — revenue lost to returns per customer, top-N.

    lineitem is filtered to returnflag='R' at the scan, pre-aggregated per
    orderkey below the join (same input-cut trick as Q5), then rolled up to
    the customer; nation broadcasts.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer")
    n_dim = load_table(spark, sf_dir, "nation")
    li_r = (
        li.filter(F.col("l_returnflag") == "R")
        .groupBy("l_orderkey")
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("__rev"))
    )
    per_cust = (
        li_r.join(o, li_r.l_orderkey == o.o_orderkey)
        .groupBy("o_custkey")
        .agg(F.sum("__rev").alias("__rev"))
    )
    return (
        per_cust.join(c, per_cust.o_custkey == c.c_custkey)
        .join(F.broadcast(n_dim), c.c_nationkey == n_dim.n_nationkey)
        .select(
            "c_custkey",
            "c_name",
            "n_name",
            F.round("c_acctbal", 2).alias("c_acctbal"),
            F.round("__rev", 2).alias("revenue"),
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(n)
    )


def priority_line_buckets(spark: SparkSession, sf_dir: str, year: int = 1996) -> DataFrame:
    """TPC-H Q12 shape — conditional (bucketed) counts after a fact join."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_linestatus", "l_shipdate")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    j = li.filter(
        (F.to_date("l_shipdate") >= F.lit(f"{year}-01-01"))
        & (F.to_date("l_shipdate") < F.lit(f"{year + 1}-01-01"))
    ).join(o, li.l_orderkey == o.o_orderkey)
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return j.groupBy("l_linestatus").agg(
        F.sum(F.when(is_high, 1).otherwise(0)).alias("high_line_count"),
        F.sum(F.when(is_high, 0).otherwise(1)).alias("low_line_count"),
    )


def promo_revenue_share(spark: SparkSession, sf_dir: str, month_start: str = "1996-09-01") -> DataFrame:
    """TPC-H Q14 shape — global conditional ratio over a broadcast-dim join."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    j = li.filter(
        (F.to_date("l_shipdate") >= F.lit(month_start))
        & (F.to_date("l_shipdate") < F.add_months(F.lit(month_start).cast("date"), 1))
    ).join(F.broadcast(p), li.l_partkey == p.p_partkey)
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return j.agg(
        F.round(
            F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))) * 100.0 / F.sum(rev),
            4,
        ).alias("promo_revenue_pct"),
        F.count(F.lit(1)).alias("n_lines"),
    )


def large_quantity_orders(spark: SparkSession, sf_dir: str, threshold: float = 250.0) -> DataFrame:
    """TPC-H Q18 shape — HAVING-subquery: orders whose total quantity
    exceeds a threshold, joined back to customer detail.

    The groupBy(l_orderkey) HAVING filter runs BEFORE the joins, so only
    qualifying orderkeys (a tiny fraction) reach the customer join.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .filter(F.col("total_qty") > threshold)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select("c_custkey", "c_name", "o_orderkey", "o_orderdate", F.round("o_totalprice", 2).alias("o_totalprice"), "total_qty")
        .orderBy(F.col("total_qty").desc(), F.col("o_orderkey"))
    )


def supplier_value_share(spark: SparkSession, sf_dir: str, fraction: float = 0.0105) -> DataFrame:
    """TPC-H Q11 shape — groups kept only if they exceed a fraction of a
    GLOBAL total (scalar subquery).

    The global total is a 1-row aggregate cross-joined (broadcast) into the
    per-supplier frame — no second scan of the fact table: both aggregates
    reuse one shuffled pass via a cached intermediate at scale, and here
    Spark's exchange reuse dedupes the scan.
    """
    li = load_table(spark, sf_dir, "lineitem")
    val = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("value")
    per_supp = li.groupBy("l_suppkey").agg(val)
    total = li.agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("__total"))
    return (
        per_supp.crossJoin(F.broadcast(total))
        .filter(F.col("value") > F.col("__total") * fraction)
        .select("l_suppkey", F.round("value", 2).alias("value"))
    )


def top_revenue_suppliers(spark: SparkSession, sf_dir: str, year: int = 1996) -> DataFrame:
    """TPC-H Q15 shape — rows equal to the MAX of their own aggregate
    (scalar-subquery equality; returns ties deterministically)."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    rev = (
        li.filter(
            (F.to_date("l_shipdate") >= F.lit(f"{year}-01-01"))
            & (F.to_date("l_shipdate") < F.lit(f"{year + 1}-01-01"))
        )
        .groupBy("l_suppkey")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("total_revenue"))
    )
    mx = rev.agg(F.max("total_revenue").alias("__mx"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("__mx"))
        .join(F.broadcast(s), rev.l_suppkey == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


def idle_rich_customers(spark: SparkSession, sf_dir: str, since: str = "1999-01-01") -> DataFrame:
    """TPC-H Q22 shape — scalar-subquery threshold + anti join.

    Customers with above-average positive balance and no orders SINCE the
    cutoff, rolled up by nation. The average is a broadcast 1-row frame;
    the anti join is a NOT EXISTS with the date predicate pushed into the
    orders scan (so the build side shrinks before hashing).
    """
    c = load_table(spark, sf_dir, "customer")
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.to_date("o_orderdate") >= F.lit(since))
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal").alias("__avg"))
    rich = c.crossJoin(F.broadcast(avg_bal)).filter(F.col("c_acctbal") > F.col("__avg"))
    idle = rich.join(o, "c_custkey", "left_anti")
    return idle.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("numcust"),
        F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
    )


def min_cost_supplier_per_part(spark: SparkSession, sf_dir: str, p_size: int = 15) -> DataFrame:
    """TPC-H Q2 shape — correlated MIN subquery: for each part of a given
    size, the supplier(s) achieving the minimum unit price.

    Decorrelated the way Catalyst itself would: aggregate the min per
    partkey, join back on (partkey, unit_price == min). The part dim filter
    broadcasts and prunes the fact scan's join input.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") == p_size).select("p_partkey", "p_name")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    unit = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .select("p_partkey", "p_name", "l_suppkey", F.round(F.col("l_extendedprice") / F.col("l_quantity"), 6).alias("unit_price"))
    )
    mins = unit.groupBy(F.col("p_partkey").alias("__pk")).agg(F.min("unit_price").alias("__min_price"))
    best = unit.join(
        F.broadcast(mins),
        (unit.p_partkey == F.col("__pk")) & (unit.unit_price == F.col("__min_price")),
    )
    return (
        best.join(F.broadcast(s), best.l_suppkey == s.s_suppkey)
        .select("p_partkey", "p_name", "s_suppkey", "s_name", "unit_price")
        .dropDuplicates(["p_partkey", "s_suppkey"])
    )


def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS + grouping_id — the general form of rollup/cube:
    per-status totals, per-priority totals, and the grand total in ONE pass
    (Expand node: each input row fans out once per set; single shuffle)."""
    o = load_table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("__orders_gs")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               grouping(o_orderstatus) AS g_status,
               grouping(o_orderpriority) AS g_priority,
               count(*) AS n,
               round(sum(o_totalprice), 2) AS total
        FROM __orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


def balance_rank_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-function family over one window: ntile quartiles,
    percent_rank, cume_dist, dense_rank — all computed in a single sort of
    each segment partition (one window exchange)."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return c.select(
        "c_mktsegment",
        "c_custkey",
        F.round("c_acctbal", 2).alias("c_acctbal"),
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.dense_rank().over(w).alias("drank"),
    )


def orders_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (range/theta) join: each order lands in the price band
    whose [lo, hi) interval contains it. The band dim is tiny and
    broadcast, so Spark plans BroadcastNestedLoopJoin — the right shape
    for interval joins against a small dimension (IP-geo, SLA tiers,
    rating bands). A shuffled theta join at 100 TB would be a plan bug;
    with a big interval dim the scale path is binning to an equi key
    (floor(price/width)) first."""
    o = load_table(spark, sf_dir, "orders")
    bands = spark.createDataFrame(
        [
            ("band_0_100k", 0.0, 100_000.0),
            ("band_100_200k", 100_000.0, 200_000.0),
            ("band_200_300k", 200_000.0, 300_000.0),
            ("band_300_400k", 300_000.0, 400_000.0),
            ("band_400k_plus", 400_000.0, 600_000.0),
        ],
        "band string, lo double, hi double",
    )
    j = o.join(
        F.broadcast(bands),
        (o.o_totalprice >= bands.lo) & (o.o_totalprice < bands.hi),
    )
    return j.groupBy("band").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total_value"),
    )


def unpivot_status_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (melt): the wide per-status pivot back to long form via
    stack() — a pure projection (Expand), no shuffle beyond the pivot's."""
    wide = pivot_status_by_segment(spark, sf_dir)
    return wide.select(
        "c_mktsegment",
        F.expr(
            "stack(3, 'O', n_open, 'F', n_fulfilled, 'P', n_pending) AS (o_orderstatus, n)"
        ),
    )


def monthly_revenue_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reporting staple: month-over-month revenue growth — a lag window
    OVER an aggregate's output (the window runs on O(months) rows, so the
    exchange after the agg is negligible at any scale)."""
    li = load_table(spark, sf_dir, "lineitem")
    monthly = li.groupBy(F.trunc(F.to_date("l_shipdate"), "month").alias("month")).agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("__rev"),
        F.count(F.lit(1)).alias("n_lines"),
    )
    w = Window.orderBy("month")
    return monthly.select(
        "month",
        F.round("__rev", 2).alias("revenue"),
        "n_lines",
        F.round(
            (F.col("__rev") - F.lag("__rev").over(w)) / F.nullif(F.lag("__rev").over(w), F.lit(0.0)) * 100.0,
            4,
        ).alias("mom_growth_pct"),
    )


# ---------------------------------------------------------------------------
# Remaining TPC-H-shaped decision-support queries (q7/q8/q9/q13/q16/q17/q19/
# q20/q21). The driver tables lack partsupp, l_commitdate/l_receiptdate,
# l_shipmode and p_container, so each query keeps the ORIGINAL's plan shape
# (the part Catalyst has to optimize) while substituting available columns;
# the substitution is documented per function.
# ---------------------------------------------------------------------------


def volume_shipping(
    spark: SparkSession, sf_dir: str, nation_a: str = "NATION_1", nation_b: str = "NATION_2"
) -> DataFrame:
    """TPC-H Q7 shape — bilateral trade volume between two nations by year.

    Two roles of the SAME dimension (supplier nation vs customer nation)
    with a symmetric pair predicate. Both nation sides and the 100-row
    supplier table broadcast; the only shuffle is lineitem⋈orders⋈customer
    on their keys. The pair filter is applied to the broadcast dims BEFORE
    the join, so the stream side prunes early.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    n1 = n.filter(F.col("n_name").isin(nation_a, nation_b)).select(
        F.col("n_nationkey").alias("__sn_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.filter(F.col("n_name").isin(nation_a, nation_b)).select(
        F.col("n_nationkey").alias("__cn_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.filter(
            (F.to_date("l_shipdate") >= F.lit("1995-01-01"))
            & (F.to_date("l_shipdate") <= F.lit("1996-12-31"))
        )
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("__sn_key"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("__cn_key"))
        .filter(
            ((F.col("supp_nation") == nation_a) & (F.col("cust_nation") == nation_b))
            | ((F.col("supp_nation") == nation_b) & (F.col("cust_nation") == nation_a))
        )
        .groupBy("supp_nation", "cust_nation", F.year(F.to_date("l_shipdate")).alias("l_year"))
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )


def national_market_share(
    spark: SparkSession,
    sf_dir: str,
    region: str = "ASIA",
    p_type: str = "ECONOMY",
    nation: str = "NATION_5",
) -> DataFrame:
    """TPC-H Q8 shape — a nation's share of a region's market for one part
    type, by year: conditional-sum ratio over a 7-table star join.

    The share numerator is sum(CASE WHEN supp_nation = X), i.e. one pass
    computes both numerator and denominator — no self-join. part/nation/
    region/supplier broadcast; orders⋈lineitem⋈customer shuffle once.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    p = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_type") == p_type)
        .select("p_partkey")
    )
    cust_region = (
        c.join(F.broadcast(n.select("n_nationkey", "n_regionkey")), c.c_nationkey == F.col("n_nationkey"))
        .join(
            F.broadcast(r.filter(F.col("r_name") == region)),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("c_custkey")
    )
    supp_nation = s.join(
        F.broadcast(n.select(F.col("n_nationkey").alias("__snk"), F.col("n_name").alias("supp_nation"))),
        s.s_nationkey == F.col("__snk"),
    ).select("s_suppkey", "supp_nation")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .filter(
            (F.to_date("o_orderdate") >= F.lit("1995-01-01"))
            & (F.to_date("o_orderdate") <= F.lit("1996-12-31"))
        )
        .join(cust_region, o.o_custkey == cust_region.c_custkey, "left_semi")
        .join(F.broadcast(supp_nation), li.l_suppkey == supp_nation.s_suppkey)
        .groupBy(F.year(F.to_date("o_orderdate")).alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == nation, vol).otherwise(F.lit(0.0)))
                / F.sum(vol),
                6,
            ).alias("mkt_share"),
            F.round(F.sum(vol), 2).alias("total_volume"),
        )
    )


def product_type_profit(
    spark: SparkSession, sf_dir: str, name_word: str = "widget", cost_factor: float = 0.6
) -> DataFrame:
    """TPC-H Q9 shape — profit by supplier nation and year for parts whose
    name contains a word.

    The driver tables have no partsupp.ps_supplycost, so cost is modeled as
    ``cost_factor * p_retailprice * l_quantity`` (same expression shape:
    amount minus a per-part unit cost times quantity). Substring filter on
    the broadcast part dim prunes the fact scan's join input; supplier and
    nation broadcast; one shuffle for the final (nation, year) aggregate.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    p = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").contains(name_word))
        .select("p_partkey", "p_retailprice")
    )
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.lit(cost_factor) * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.year(F.to_date("o_orderdate")).alias("o_year"))
        .agg(F.round(F.sum(profit), 2).alias("sum_profit"))
    )


def customer_order_distribution(spark: SparkSession, sf_dir: str, exclude_priority: str = "1-URGENT") -> DataFrame:
    """TPC-H Q13 shape — distribution of customers by how many orders they
    placed: LEFT join (customers with zero orders must survive as c_count=0)
    then a second aggregation over the first's output.

    The original excludes orders by a comment pattern; the driver tables
    have no o_comment, so the stand-in predicate excludes one priority
    class (same plan: filtered LEFT join under a two-level aggregate).
    The second group-by runs on O(|customers|) rows — the first shuffle
    dominates; the second is negligible at any scale.
    """
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != exclude_priority)
        .select("o_custkey", "o_orderkey")
    )
    per_cust = c.join(o, c.c_custkey == o.o_custkey, "left").groupBy("c_custkey").agg(
        F.count("o_orderkey").alias("c_count")
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


def supplier_part_variety(
    spark: SparkSession, sf_dir: str, exclude_brand: str = "Brand#1", max_size: int = 25
) -> DataFrame:
    """TPC-H Q16 shape — how many distinct suppliers can provide each
    (brand, type, size) bucket.

    No partsupp table, so the supplier↔part relation is DERIVED from
    lineitem's observed (l_partkey, l_suppkey) pairs — dropDuplicates on
    the pair FIRST so the count-distinct aggregate sees one row per
    relation, not one per shipment (at 100 TB that pre-dedup is the
    difference between shuffling 600 M and 6 B rows).
    """
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").dropDuplicates()
    p = (
        load_table(spark, sf_dir, "part")
        .filter((F.col("p_brand") != exclude_brand) & (F.col("p_size") <= max_size))
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


def small_quantity_revenue(spark: SparkSession, sf_dir: str, brand: str = "Brand#3") -> DataFrame:
    """TPC-H Q17 shape — revenue lost to small-quantity orders: lines of a
    brand's parts whose quantity is below 20% of that part's average.

    The correlated AVG subquery is decorrelated the way Catalyst would:
    aggregate avg(l_quantity) per partkey once, broadcast it back, filter.
    Both passes scan lineitem; at scale the per-part aggregate is tiny
    (|parts| rows) so the broadcast is free.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == brand).select("p_partkey")
    branded = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).select(
        "p_partkey", "l_quantity", "l_extendedprice"
    )
    avg_qty = branded.groupBy(F.col("p_partkey").alias("__pk")).agg(
        F.avg("l_quantity").alias("__avg_qty")
    )
    return (
        branded.join(F.broadcast(avg_qty), branded.p_partkey == F.col("__pk"))
        .filter(F.col("l_quantity") < 0.2 * F.col("__avg_qty"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


def disjunctive_band_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape — OR of three conjunctive (brand, size, quantity)
    bands. The original uses p_container/l_shipmode (absent here); p_size
    and l_quantity carry the same disjunctive-predicate structure.

    The whole OR-of-ANDs sits in ONE join condition so Catalyst evaluates
    it as a single pass post-join filter; the part side still broadcasts
    and the part-side half of each conjunct (brand, size) is pushed onto
    the dim scan via a derived OR predicate.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    band = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    p_pruned = p.filter(
        (F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#3")) & (F.col("p_size") <= 35)
    ).select("p_partkey", "p_brand", "p_size")
    return (
        li.join(F.broadcast(p_pruned), (li.l_partkey == p_pruned.p_partkey) & band)
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


def dominant_part_suppliers(
    spark: SparkSession, sf_dir: str, name_word: str = "red", year: int = 1996
) -> DataFrame:
    """TPC-H Q20 shape — suppliers who dominate supply of a part family.

    The original keeps suppliers whose ps_availqty exceeds half the year's
    shipped volume; without partsupp, 'dominant' means the supplier shipped
    MORE THAN HALF of a part's total volume that year. Same plan shape:
    nested aggregation (per part-supplier, then per part) + semi join up
    to the supplier dim. Emits one row per qualifying supplier.
    """
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    p = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").contains(name_word))
        .select("p_partkey")
    )
    shipped = (
        li.filter(
            (F.to_date("l_shipdate") >= F.lit(f"{year}-01-01"))
            & (F.to_date("l_shipdate") < F.lit(f"{year + 1}-01-01"))
        )
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("supp_qty"))
    )
    part_total = shipped.groupBy(F.col("p_partkey").alias("__pk")).agg(
        F.sum("supp_qty").alias("__part_qty")
    )
    dominant = (
        shipped.join(F.broadcast(part_total), shipped.p_partkey == F.col("__pk"))
        .filter(F.col("supp_qty") > 0.5 * F.col("__part_qty"))
        .select("l_suppkey")
        .dropDuplicates()
    )
    return s.join(dominant, s.s_suppkey == dominant.l_suppkey, "left_semi").select(
        "s_suppkey", "s_name"
    )


def late_sole_blame_suppliers(
    spark: SparkSession, sf_dir: str, late_days: int = 60, top_n: int = 20
) -> DataFrame:
    """TPC-H Q21 shape — suppliers solely to blame for late multi-supplier
    orders: EXISTS (another supplier in the order) AND NOT EXISTS (another
    LATE supplier in the order).

    No l_receiptdate/l_commitdate in the driver tables, so 'late' is
    l_shipdate > o_orderdate + late_days. Both correlated EXISTS are
    decorrelated into ONE per-order aggregate (distinct suppliers, distinct
    late suppliers) — a single extra shuffle instead of two self-joins,
    which is also how you'd want Catalyst to plan it at 100 TB.
    """
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    flagged = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey",
        "l_suppkey",
        (
            F.to_date("l_shipdate") > F.date_add(F.to_date("o_orderdate"), late_days)
        ).alias("is_late"),
    )
    per_order = flagged.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("__n_supp"),
        F.countDistinct(F.when(F.col("is_late"), F.col("l_suppkey"))).alias("__n_late_supp"),
    )
    blamed = (
        flagged.filter(F.col("is_late"))
        .select("l_orderkey", "l_suppkey")
        .dropDuplicates()
        .join(
            per_order.filter((F.col("__n_supp") > 1) & (F.col("__n_late_supp") == 1)),
            "l_orderkey",
            "left_semi",
        )
    )
    counts = blamed.groupBy("l_suppkey").agg(F.count(F.lit(1)).alias("numwait"))
    return (
        counts.join(F.broadcast(s), counts.l_suppkey == s.s_suppkey)
        .select("s_suppkey", "s_name", "numwait")
        .orderBy(F.col("numwait").desc(), F.col("s_suppkey"))
        .limit(top_n)
    )


def scd2_point_in_time_join(
    facts: DataFrame,
    dim: DataFrame,
    key: str,
    ts_col: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    how: str = "left",
) -> DataFrame:
    """SCD2 point-in-time join: each fact row picks the dimension version
    whose validity interval contains the fact's event time
    (``valid_from <= ts < valid_to``, open-ended current version = NULL
    valid_to) — the slowly-changing-dimension lookup every warehouse runs.

    Plan shape: equi-join on the key with the interval predicate as a join
    conjunct — Catalyst broadcasts a small dim and evaluates the range as a
    post-probe filter (versions per key are few, so the fan-out before the
    filter is bounded). For a dim too large to broadcast, rewrite as the
    as-of join (operators/asof.py) on valid_from per key, then filter
    ``ts < valid_to`` — linear, one shuffle, no theta join.
    """
    f = facts.alias("__f")
    d = dim.alias("__d")
    cond = (
        (F.col(f"__f.{key}") == F.col(f"__d.{key}"))
        & (F.col(f"__f.{ts_col}") >= F.col(f"__d.{valid_from}"))
        & (
            F.col(f"__d.{valid_to}").isNull()
            | (F.col(f"__f.{ts_col}") < F.col(f"__d.{valid_to}"))
        )
    )
    return f.join(F.broadcast(d), cond, how).drop(F.col(f"__d.{key}"))
