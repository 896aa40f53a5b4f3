"""As-of (point-in-time) join — the §2.3 "missing-but-implied" extension
(SURVEY.md: "range/as-of join expressible as windowed last()").

The reference has no as-of join, but any market-data engine needs one:
"attach the latest quote/bar at-or-before each event time". Semantics match
pandas ``merge_asof(direction='backward')`` and DuckDB ``ASOF JOIN``
(``left.t >= right.t``, greatest such right row, per key).

Scale design — NO range/theta join, NO per-row subquery: both sides are
tagged and unioned, then ONE window pass per key forward-fills the right
payload onto left rows. Cost = one shuffle on the key + one sort on
(key, t, side) — the same exchange shape as any per-key window chain, linear
in |L|+|R|, skew-safe under AQE. A broadcast-range join would be quadratic in
the worst case; this never is.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    payload: Sequence[str],
) -> DataFrame:
    """Left as-of join: every ``left`` row gains the ``payload`` columns of
    the ``right`` row with the greatest ``right_time`` <= ``left_time`` for
    the same ``key`` (null when no prior right row exists).

    At equal timestamps the right row IS visible (>= semantics, matching
    DuckDB ASOF JOIN and pandas merge_asof).

    Contract: ``right`` must be unique per (key, right_time) — apply
    keep-last dedupe upstream otherwise (equal-instant right rows have no
    deterministic winner in any engine's as-of join).
    """
    lcols = left.columns
    l = left.withColumn("__t", F.col(left_time).cast("timestamp")).withColumn(
        "__side", F.lit(1)
    )
    for c in payload:
        l = l.withColumn(f"__p_{c}", F.lit(None).cast(right.schema[c].dataType))
    r = right.select(
        F.col(key),
        F.col(right_time).cast("timestamp").alias("__t"),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"__p_{c}") for c in payload],
    )
    for c in lcols:
        if c not in r.columns:
            r = r.withColumn(c, F.lit(None).cast(l.schema[c].dataType))
    u = l.select(*lcols, "__t", "__side", *[f"__p_{c}" for c in payload]).unionByName(
        r.select(*lcols, "__t", "__side", *[f"__p_{c}" for c in payload])
    )
    # right rows (side 0) sort before left rows at the same instant, so an
    # equal-time right row is already visible to the ffill when the left row
    # is evaluated
    w = (
        Window.partitionBy(key)
        .orderBy("__t", "__side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    for c in payload:
        u = u.withColumn(f"__p_{c}", F.last(f"__p_{c}", ignorenulls=True).over(w))
    out = u.filter(F.col("__side") == 1).drop("__t", "__side")
    for c in payload:
        out = out.withColumnRenamed(f"__p_{c}", c)
    return out
