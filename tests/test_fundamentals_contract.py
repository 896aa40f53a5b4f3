"""The reference's own unit-test contracts, ported (SURVEY §5:
tests/test_fundamental_extractor.py:10-62 — happy path, empty frame for an
unlisted symbol, required-column contract) plus the analyzer operators on
the same golden shapes. The reference's mock fixture rows
({'time': '2024Q4', 'revenue': 1000, 'profit': 100, 'eps': 2.5}) are the
repo's only golden data — reused here verbatim."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from market_data_pipeline_spark.functions.helpers import require_columns
from market_data_pipeline_spark.operators import fundamentals

GOLDEN = [
    ("VNM", "2024Q3", 900.0, 80.0, 2.1),
    ("VNM", "2024Q4", 1000.0, 100.0, 2.5),
]


def test_income_statement_happy_path(spark):
    df = spark.createDataFrame(
        GOLDEN, "symbol string, time string, revenue double, profit double, eps double"
    )
    require_columns(df, ["time", "revenue", "profit", "eps"])
    assert df.count() == 2


def test_unlisted_symbol_empty_frame(spark):
    df = spark.createDataFrame(
        [], "symbol string, time string, revenue double, profit double, eps double"
    )
    # empty input flows through the analyzers without error
    out = fundamentals.dcf_fair_value(df, "symbol", "time", "revenue")
    assert out.count() == 0


def test_required_column_contract_raises(spark):
    df = spark.createDataFrame([("VNM", "2024Q4", 1000.0)], "symbol string, time string, revenue double")
    with pytest.raises(ValueError, match="eps"):
        require_columns(df, ["time", "revenue", "profit", "eps"])


def test_dcf_needs_min_periods(spark):
    df = spark.createDataFrame(
        GOLDEN, "symbol string, time string, revenue double, profit double, eps double"
    )
    out = fundamentals.dcf_fair_value(df, "symbol", "time", "profit", min_periods=3).collect()[0]
    assert out.fair_value is None  # only 2 periods
    three = spark.createDataFrame(
        GOLDEN + [("VNM", "2025Q1", 1100.0, 110.0, 2.6)],
        "symbol string, time string, revenue double, profit double, eps double",
    )
    out3 = fundamentals.dcf_fair_value(three, "symbol", "time", "profit", min_periods=3).collect()[0]
    # PV = 80/1.1 + 100/1.21 + 110/1.331
    assert out3.fair_value == pytest.approx(
        round(80 / 1.1 + 100 / 1.21 + 110 / 1.331, 2)
    )


def test_fundamental_score_breakdown(spark):
    row = [("VNM", 0.2, 0.15, 0.5, 2.0, 0.2, 0.4, 0.3)]
    df = spark.createDataFrame(
        row,
        "symbol string, roe double, sector_avg_roe double, debt_to_equity double, "
        "current_ratio double, revenue_growth double, gross_margin double, sector_avg_margin double",
    )
    out = fundamentals.fundamental_score(df).collect()[0]
    assert out.score == 5 and out.recommendation == "buy"
    assert dict(out.breakdown) == {"roe": 1, "debt": 1, "liquidity": 1, "growth": 1, "margin": 1}
