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
