"""Fundamental analytics: sector medians, DCF, scoring, red flags.

Reference parity: /root/reference/src/analyzers/fundamental_analyzer.py +
src/extractors/fundamental_extractor.py. The reference scores one symbol at a
time from dicts; here each analysis is a grouped/windowed plan over a long
``(symbol, period, metrics...)`` table.

On the driver testdata, per-customer order history plays the per-symbol
period series (o_orderdate ≙ period, o_totalprice ≙ flow metric) and
nation/segment plays the sector dimension (FIXTURES.md §B).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from market_data_pipeline_spark.functions.helpers import safe_div


def sector_median_comparison(df: DataFrame, sector_col: str, metrics: tuple[str, ...]) -> DataFrame:
    """A9 — compare each entity's metrics to its sector median
    (fundamental_analyzer.py:90-114): median via the exact interpolated
    ``median`` aggregate, relative position as (x − med)/med.

    Shape: one groupBy(sector) agg (tiny result) broadcast back onto the
    entity rows — no second shuffle.
    """
    med = df.groupBy(sector_col).agg(
        *[F.median(m).alias(f"med_{m}") for m in metrics]
    )
    out = df.join(F.broadcast(med), sector_col)
    for m in metrics:
        out = out.withColumn(
            f"rel_{m}", F.round(safe_div(F.col(m) - F.col(f"med_{m}"), F.abs(F.col(f"med_{m}"))), 4)
        )
    return out


def dcf_fair_value(df: DataFrame, key_col: str, period_col: str, cf_col: str, rate: float = 0.1, min_periods: int = 3) -> DataFrame:
    """A10 — DCF present value per entity (fundamental_analyzer.py:26-32):
    PV = Σ cf_i / (1+rate)^(i+1) over the period-ordered flow series; null
    when fewer than ``min_periods`` periods exist."""
    w = Window.partitionBy(key_col).orderBy(period_col)
    idx = F.row_number().over(w)
    pv_term = F.col(cf_col) / F.pow(F.lit(1.0 + rate), idx.cast("double"))
    terms = df.withColumn("__pv", pv_term)
    agg = terms.groupBy(key_col).agg(
        F.round(F.sum("__pv"), 2).alias("__pv_sum"), F.count(F.lit(1)).alias("n_periods")
    )
    return agg.withColumn(
        "fair_value", F.when(F.col("n_periods") >= min_periods, F.col("__pv_sum"))
    ).drop("__pv_sum")


def fundamental_score(df: DataFrame) -> DataFrame:
    """A11 — 0-5 threshold score on the latest period
    (fundamental_analyzer.py:46-75): roe > sector avg, debt/equity < 1,
    current_ratio > 1.5, revenue growth > 0.1, gross margin > sector avg;
    buy if score ≥ 4. Expects those columns precomputed (canonical A6 shape).
    """
    checks = [
        (F.col("roe") > F.col("sector_avg_roe"), "roe"),
        (F.col("debt_to_equity") < 1.0, "debt"),
        (F.col("current_ratio") > 1.5, "liquidity"),
        (F.col("revenue_growth") > 0.1, "growth"),
        (F.col("gross_margin") > F.col("sector_avg_margin"), "margin"),
    ]
    score = sum(F.when(c, 1).otherwise(0) for c, _ in checks)
    breakdown = F.create_map(
        *[x for c, name in checks for x in (F.lit(name), F.when(c, 1).otherwise(0))]
    )
    return (
        df.withColumn("score", score)
        .withColumn("recommendation", F.when(F.col("score") >= 4, "buy").otherwise("hold"))
        .withColumn("breakdown", breakdown)
    )


def red_flags(df: DataFrame, key_col: str, period_col: str, revenue_col: str, cf_col: str, decline_periods: int = 5) -> DataFrame:
    """A12 — red-flag checks (fundamental_analyzer.py:77-88) per entity:
    monotone revenue decline over the last N periods; ≥3 negative-cash-flow
    periods. Windowed lags + one aggregate — a single shuffle on the key."""
    w = Window.partitionBy(key_col).orderBy(period_col)
    declining = F.col(revenue_col) < F.lag(revenue_col, 1).over(w)
    wdesc = Window.partitionBy(key_col).orderBy(F.col(period_col).desc())
    flagged = df.withColumn("__decl", declining).withColumn(
        "__rn", F.row_number().over(wdesc)
    )
    agg = flagged.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n_periods"),
        F.sum(
            F.when((F.col("__rn") <= decline_periods - 1) & F.col("__decl"), 1).otherwise(0)
        ).alias("__recent_declines"),
        F.sum(F.when(F.col(cf_col) < 0, 1).otherwise(0)).alias("neg_cf_periods"),
    )
    return (
        agg.withColumn(
            "monotone_decline",
            (F.col("n_periods") >= decline_periods)
            & (F.col("__recent_declines") == decline_periods - 1),
        )
        .withColumn("cf_red_flag", F.col("neg_cf_periods") >= 3)
        .drop("__recent_declines")
    )
