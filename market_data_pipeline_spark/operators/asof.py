"""As-of (point-in-time) join — the §2.3 "missing-but-implied" extension
(SURVEY.md: "range/as-of join expressible as windowed last()").

The reference has no as-of join, but any market-data engine needs one:
"attach the latest quote/bar at-or-before each event time". Semantics match
pandas ``merge_asof`` and DuckDB ``ASOF JOIN``: backward picks the greatest
``right.t <= left.t`` per key, forward the smallest ``right.t >= left.t``;
``tolerance`` bounds the allowed staleness either way.

Scale design — NO range/theta join, NO per-row subquery: both sides are
tagged and unioned, then ONE window pass per key forward-fills the right
payload onto left rows. Cost = one shuffle on the key + one sort on
(key, t, side) — the same exchange shape as any per-key window chain, linear
in |L|+|R|, skew-safe under AQE. A broadcast-range join would be quadratic in
the worst case; this never is. Forward direction is the same pass with the
sort reversed; tolerance is a post-fill null-out (the matched right time
rides inside the filled payload struct).
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
    direction: str = "backward",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """Left as-of join: every ``left`` row gains the ``payload`` columns of
    the nearest ``right`` row at-or-before (``direction='backward'``) or
    at-or-after (``'forward'``) its time, per ``key`` (null when none, or
    when the match is further than ``tolerance_seconds`` away).

    At equal timestamps the right row IS visible in both directions
    (>= / <= semantics, matching DuckDB ASOF JOIN and pandas merge_asof).

    Contract: ``right`` must be unique per (key, right_time) — apply
    keep-last dedupe upstream otherwise (equal-instant right rows have no
    deterministic winner in any engine's as-of join).
    """
    if direction == "nearest":
        return _asof_nearest(
            left, right, key, left_time, right_time, payload, tolerance_seconds
        )
    if direction not in ("backward", "forward"):
        raise ValueError(
            f"direction must be backward|forward|nearest, got {direction!r}"
        )
    lcols = left.columns
    l = left.withColumn("__t", F.col(left_time).cast("timestamp")).withColumn(
        "__side", F.lit(1)
    )
    # The whole right payload rides in ONE struct so a single
    # last(ignorenulls) fills it atomically: per-column fills would let a
    # matched right row with a NULL in one payload column borrow that
    # column from an OLDER right row (and a value older than the
    # tolerance window) — pandas merge_asof returns the matched row's
    # NULL, and so does this.
    r = right.select(
        F.col(key),
        F.col(right_time).cast("timestamp").alias("__t"),
        F.lit(0).alias("__side"),
        F.struct(
            F.col(right_time).cast("timestamp").alias("__rt"),
            *[F.col(c) for c in payload],
        ).alias("__p"),
    )
    l = l.withColumn("__p", F.lit(None).cast(r.schema["__p"].dataType))
    for c in lcols:
        if c not in r.columns:
            r = r.withColumn(c, F.lit(None).cast(l.schema[c].dataType))
    u = l.select(*lcols, "__t", "__side", "__p").unionByName(
        r.select(*lcols, "__t", "__side", "__p")
    )
    # right rows (side 0) sort before left rows at the same instant, so an
    # equal-time right row is already visible to the fill when the left row
    # is evaluated; forward = the same pass over reversed time
    t_order = F.col("__t").asc() if direction == "backward" else F.col("__t").desc()
    w = (
        Window.partitionBy(key)
        .orderBy(t_order, "__side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    u = u.withColumn("__p", F.last("__p", ignorenulls=True).over(w))
    out = u.filter(F.col("__side") == 1).drop("__side")
    if tolerance_seconds is not None:
        rt = F.col("__p").getField("__rt")
        gap = F.abs(F.unix_timestamp("__t") - F.unix_timestamp(rt))
        keep = F.col("__p").isNotNull() & (gap <= F.lit(tolerance_seconds))
        out = out.withColumn("__p", F.when(keep, F.col("__p")))
    for c in payload:
        out = out.withColumn(c, F.col("__p").getField(c))
    return out.drop("__t", "__p")


def _asof_nearest(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    payload: Sequence[str],
    tolerance_seconds: float | None,
) -> DataFrame:
    """direction='nearest': the closer of the backward and forward match,
    ties to backward (pandas merge_asof convention). ONE union-fill pass
    computes both sides — the same (key)-partitioned sort serves an
    ascending last-ignorenulls window (backward candidates) and its
    descending twin (forward candidates); a per-row conditional picks the
    smaller absolute gap. Same scale shape as the directional join: one
    exchange on key, two window passes over it, no join at all.

    Tolerance applies per side BEFORE the pick (a side beyond tolerance
    is not a candidate), matching pandas.
    """
    lcols = left.columns
    l = left.withColumn("__t", F.col(left_time).cast("timestamp")).withColumn(
        "__side", F.lit(1)
    )
    # single-struct fill per side — same atomic-match rationale as the
    # directional path: all payload columns (and the matched time) come
    # from ONE right row, never a column-wise mix of rows
    r = right.select(
        F.col(key),
        F.col(right_time).cast("timestamp").alias("__t"),
        F.lit(0).alias("__side"),
        F.struct(
            F.col(right_time).cast("timestamp").alias("__rt"),
            *[F.col(c) for c in payload],
        ).alias("__p"),
    )
    l = l.withColumn("__p", F.lit(None).cast(r.schema["__p"].dataType))
    for c in lcols:
        if c not in r.columns:
            r = r.withColumn(c, F.lit(None).cast(l.schema[c].dataType))
    u = l.select(*lcols, "__t", "__side", "__p").unionByName(
        r.select(*lcols, "__t", "__side", "__p")
    )
    wb = (
        Window.partitionBy(key)
        .orderBy(F.col("__t").asc(), "__side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wf = (
        Window.partitionBy(key)
        .orderBy(F.col("__t").desc(), "__side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    u = u.withColumn("__b", F.last("__p", ignorenulls=True).over(wb))
    u = u.withColumn("__f", F.last("__p", ignorenulls=True).over(wf))
    out = u.filter(F.col("__side") == 1).drop("__side")
    # cast-to-double keeps MICROSECONDS (unix_timestamp truncates to whole
    # seconds, which flips the winning side for left rows within a second
    # of the midpoint between two right rows — found by the sf0.1 oracle
    # sweep); DuckDB's epoch() mirrors the fractional-seconds double
    brt = F.col("__b").getField("__rt")
    frt = F.col("__f").getField("__rt")
    gap_b = F.col("__t").cast("double") - brt.cast("double")
    gap_f = frt.cast("double") - F.col("__t").cast("double")
    valid_b = F.col("__b").isNotNull()
    valid_f = F.col("__f").isNotNull()
    if tolerance_seconds is not None:
        valid_b = valid_b & (gap_b <= F.lit(tolerance_seconds))
        valid_f = valid_f & (gap_f <= F.lit(tolerance_seconds))
    take_b = valid_b & (~valid_f | (gap_b <= gap_f))
    out = out.withColumn(
        "__ch", F.when(take_b, F.col("__b")).when(valid_f, F.col("__f"))
    )
    for c in payload:
        out = out.withColumn(c, F.col("__ch").getField(c))
    return out.drop("__t", "__p", "__b", "__f", "__ch")
