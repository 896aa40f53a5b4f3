from market_data_pipeline_spark.functions.helpers import (
    clip,
    cumprod1p_minus1,
    ffill,
    keep_last_dedupe,
    min_periods,
    rolling,
    safe_div,
    snake_case_columns,
    series_window,
)
from market_data_pipeline_spark.functions.parsing import parse_financial_value

__all__ = [
    "clip",
    "cumprod1p_minus1",
    "ffill",
    "keep_last_dedupe",
    "min_periods",
    "rolling",
    "safe_div",
    "snake_case_columns",
    "series_window",
    "parse_financial_value",
]
