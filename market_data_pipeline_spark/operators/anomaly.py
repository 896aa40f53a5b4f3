"""Anomaly detection over per-symbol series — fills the reference's declared
extension surface /root/reference/src/analyzers/anomaly_detector.py (0-byte
placeholder; SURVEY.md preamble lists it as named intent with no behavior).

Rolling z-score: a bar is anomalous when its close deviates from the trailing
rolling mean by more than ``threshold`` rolling standard deviations. Pure
window expressions — one shuffle on symbol shared with the indicator chain,
codegen-able, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, WindowSpec
from pyspark.sql import functions as F

from market_data_pipeline_spark.functions.helpers import min_periods, safe_div, series_window


def rolling_zscore(
    df: DataFrame,
    col: str = "close",
    window: int = 20,
    w: WindowSpec | None = None,
) -> DataFrame:
    """z_t = (x_t − rolling_mean) / rolling_std over the trailing ``window``
    rows (pandas min_periods semantics: null until the window is full)."""
    w = w or series_window()
    mean = min_periods(F.avg(col), F.col(col), w, window)
    std = min_periods(F.stddev_samp(col), F.col(col), w, window)
    return df.withColumn("__mu", mean).withColumn("__sd", std).withColumn(
        "zscore", F.round(safe_div(F.col(col) - F.col("__mu"), F.col("__sd")), 4)
    ).drop("__mu", "__sd")


def zscore_anomalies(
    df: DataFrame,
    col: str = "close",
    window: int = 20,
    threshold: float = 2.5,
    w: WindowSpec | None = None,
) -> DataFrame:
    """Anomalous bars only: |z| > threshold. The filter lands after the
    window stage; Catalyst prunes every other column from the scan."""
    z = rolling_zscore(df, col, window, w)
    return z.filter(F.abs(F.col("zscore")) > threshold)


def mad_outliers(
    df: DataFrame,
    group_col: str,
    value_col: str,
    cutoff: float = 3.5,
) -> DataFrame:
    """Robust per-group outlier profile via median absolute deviation:
    modified z-score 0.6745·(x − median)/MAD with the Iglewicz–Hoaglin 3.5
    cutoff — the mean/std z-score's robust twin (one wild value inflates a
    std enough to hide itself; median/MAD has a 50% breakdown point).

    Three passes by necessity (quantiles are holistic: MAD needs the
    median, the outlier count needs the MAD): per-group median, then MAD
    over broadcast-joined deviations, then one counting aggregate. Each
    pass is a scan + map-side-combined agg — no pass shuffles row data on
    anything but the group key. Both medians use exact interpolated
    percentile — identical linear-interpolation semantics in Spark
    (``percentile``) and DuckDB (``quantile_cont``). Groups where MAD = 0
    (over half the values identical) define no z-score and report
    n_outliers = 0 by convention (mirrored in the oracle).
    """
    from pyspark.sql import functions as F

    med = df.groupBy(group_col).agg(
        F.expr(f"percentile({value_col}, 0.5)").alias("__med")
    )
    dev = df.join(F.broadcast(med), group_col)
    mad = (
        dev.select(
            group_col, F.abs(F.col(value_col) - F.col("__med")).alias("__ad")
        )
        .groupBy(group_col)
        .agg(F.expr("percentile(__ad, 0.5)").alias("__mad"))
    )
    z = F.lit(0.6745) * (F.col(value_col) - F.col("__med")) / F.col("__mad")
    flagged = dev.join(F.broadcast(mad), group_col).select(
        group_col,
        "__med",
        "__mad",
        F.when((F.col("__mad") > 0) & (F.abs(z) > F.lit(float(cutoff))), 1)
        .otherwise(0)
        .alias("__out"),
    )
    return (
        flagged.groupBy(group_col, "__med", "__mad")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("__out").alias("n_outliers"),
        )
        .select(
            group_col,
            F.col("n").cast("long").alias("n"),
            F.round(F.col("__med") + 1e-9, 6).alias("median"),
            F.round(F.col("__mad") + 1e-9, 6).alias("mad"),
            F.col("n_outliers").cast("long").alias("n_outliers"),
        )
    )
