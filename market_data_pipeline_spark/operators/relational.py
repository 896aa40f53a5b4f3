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
