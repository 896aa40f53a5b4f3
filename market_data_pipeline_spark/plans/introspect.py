"""Physical-plan introspection: the feedback loop for scale tuning.

The rule (repo instructions + SURVEY.md §4): after an operator is correct,
read its plan — filters must reach the scan (``PushedFilters``), projections
must prune (``ReadSchema``), dims must broadcast, codegen spans must be wide.
These helpers make those checks assertable in tests instead of eyeballed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """Lines of the formatted plan that show parquet-pushed filters."""
    text = explain_str(df)
    return [ln.strip() for ln in text.splitlines() if "PushedFilters" in ln]


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df, "simple")


def count_exchanges(df: DataFrame) -> int:
    """Shuffle exchanges in the plan (excluding broadcast exchanges) — the
    number that must not grow as indicators stack on one window."""
    text = explain_str(df, "simple")
    return sum(
        1
        for ln in text.splitlines()
        if "Exchange" in ln and "BroadcastExchange" not in ln
    )


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema lines — what actually reaches each parquet scan."""
    text = explain_str(df)
    return [ln.strip() for ln in text.splitlines() if "ReadSchema" in ln]
