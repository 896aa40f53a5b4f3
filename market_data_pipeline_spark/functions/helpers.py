"""Expression helpers encoding the reference's pandas semantics as Catalyst
expressions (SURVEY.md §4: "a small expression-builder helper, not a rule").

Everything here returns Columns / DataFrames built purely from
``pyspark.sql.functions`` — JVM-side, codegen-friendly, zero Python in the
hot path.
"""

from __future__ import annotations

import re
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F


def series_window(symbol_col: str = "symbol", time_col: str = "time", *tiebreak: str) -> WindowSpec:
    """The canonical per-symbol ordered window every indicator shares.

    One partitioning reused across the whole chain = one Exchange in the
    physical plan no matter how many indicators stack on top.
    """
    order = [F.col(time_col)] + [F.col(t) for t in tiebreak]
    return Window.partitionBy(symbol_col).orderBy(*order)


def rolling(w: WindowSpec, n: int) -> WindowSpec:
    """pandas ``rolling(n)`` frame: the current row and the n-1 before it."""
    return w.rowsBetween(-(n - 1), 0)


def min_periods(expr: Column, over_col: Column, w: WindowSpec, n: int) -> Column:
    """pandas ``rolling(n, min_periods=n)``: null until n non-null rows seen.

    Spark's window aggregates happily average 3 rows at the head of a
    20-row frame; the reference's indicators do not
    (/root/reference/src/transformers/technical_indicators.py:41).
    """
    frame = rolling(w, n)
    return F.when(F.count(over_col).over(frame) >= n, expr.over(frame))


def keep_last_dedupe(df: DataFrame, keys: Sequence[str], order_col: str = "event_id") -> DataFrame:
    """pandas ``drop_duplicates(subset=keys, keep='last')``
    (/root/reference/src/extractors/price_extractor.py:96).

    pandas keeps the last occurrence *in input order*; distributed engines
    have no input order, so an explicit ingest-sequence column is required —
    NOT ``dropDuplicates`` (arbitrary row) and NOT
    ``monotonically_increasing_id`` (unstable across retries). Single window
    shuffle on the keys; at scale this collapses into the same exchange as any
    following per-key window.
    """
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(F.col(order_col).desc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def ffill(col: str, w: WindowSpec) -> Column:
    """pandas ``ffill()`` (/root/reference/src/transformers/data_cleaner.py:49):
    last non-null value up to the current row."""
    return F.last(F.col(col), ignorenulls=True).over(
        w.rowsBetween(Window.unboundedPreceding, 0)
    )


def clip(col: Column, lo: float | None, hi: float | None) -> Column:
    """pandas/numpy ``clip`` → least/greatest
    (/root/reference/src/transformers/technical_indicators.py:70-71, 133)."""
    out = col
    if lo is not None:
        out = F.greatest(out, F.lit(float(lo)))
    if hi is not None:
        out = F.least(out, F.lit(float(hi)))
    return out


def safe_div(num: Column, den: Column, zero_as: float | None = None) -> Column:
    """Division with the reference's ÷0 guards
    (/root/reference/src/extractors/breadth_extractor.py:170-174): pandas
    ``replace({0: NA})`` then divide. ``zero_as`` mirrors the spots where the
    reference maps ÷0 to a constant instead of NA (adv_dec_ratio → 0)."""
    out = num / F.nullif(den, F.lit(0))
    if zero_as is not None:
        out = F.when(den == 0, F.lit(float(zero_as))).otherwise(out)
    return out


def cumprod1p_minus1(ret: Column, w: WindowSpec) -> Column:
    """Cumulative return ``Π(1+r) − 1``
    (/root/reference/src/transformers/technical_indicators.py:184-186).
    No cumprod window aggregate exists; the exact log-space rewrite
    ``exp(Σ log1p(r)) − 1`` is codegen-able and numerically stable.

    A −100% return (close hits 0) makes its factor 0, which log-space
    cannot carry — and silently SKIPPING it (log1p(−1) → null, sum ignores
    nulls) would resurrect the series. pandas cumprod semantics: once a
    factor is 0, every later cumulative product is 0, i.e. the cumulative
    return pins to −1 — reproduced with a running any-zero flag. (Factors
    below 0 would need negative prices; the flag treats them as wiped out
    too, which is the only sane reading for a price series.)"""
    win = w.rowsBetween(Window.unboundedPreceding, 0)
    wiped = F.max(F.when(ret <= -1.0, F.lit(1)).otherwise(F.lit(0))).over(win)
    logsum = F.sum(F.when(ret > -1.0, F.log1p(ret))).over(win)
    return F.when(wiped == 1, F.lit(-1.0)).otherwise(
        F.exp(F.coalesce(logsum, F.lit(0.0))) - 1
    )


_SNAKE = re.compile(r"[^0-9a-zA-Z]+")


def snake_case_columns(df: DataFrame) -> DataFrame:
    """P1 column-name normalize (/root/reference/src/transformers/
    data_cleaner.py:172-174): strip/lower/snake_case every column. Pure
    metadata — free at any scale."""
    return df.toDF(*[_SNAKE.sub("_", c.strip()).strip("_").lower() for c in df.columns])


def require_columns(df: DataFrame, required: Sequence[str]) -> DataFrame:
    """P2 required-column contract (/root/reference/src/extractors/
    price_extractor.py:91-94, technical_indicators.py:205-210): raise before
    Catalyst does, with the reference's error shape."""
    missing = set(required) - set(df.columns)
    if missing:
        raise ValueError(f"missing required columns: {sorted(missing)}")
    return df
