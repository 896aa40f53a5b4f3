"""As-of join edge semantics + anomaly/correlation operators."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from market_data_pipeline_spark.operators import anomaly, asof, breadth


def _ts(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


def test_asof_join_backward_semantics(spark):
    left = spark.createDataFrame(
        [
            ("A", _ts(9), 1.0),   # before any mark -> null
            ("A", _ts(10), 2.0),  # equal to mark t10 -> mark visible
            ("A", _ts(11), 3.0),  # between marks -> t10
            ("A", _ts(13), 4.0),  # after last mark -> t12
            ("B", _ts(11), 5.0),  # other key, own marks only
        ],
        "sym string, t timestamp, v double",
    )
    right = spark.createDataFrame(
        [
            ("A", _ts(10), 100.0),
            ("A", _ts(12), 120.0),
            ("B", _ts(10), 200.0),
        ],
        "sym string, mt timestamp, mark double",
    )
    out = asof.asof_join(left, right, key="sym", left_time="t", right_time="mt", payload=["mark"])
    got = {(r.sym, r.t): r.mark for r in out.collect()}
    assert got[("A", _ts(9))] is None
    assert got[("A", _ts(10))] == 100.0
    assert got[("A", _ts(11))] == 100.0
    assert got[("A", _ts(13))] == 120.0
    assert got[("B", _ts(11))] == 200.0
    assert out.count() == left.count()  # left join: row count preserved


def test_asof_join_multiple_payload_columns(spark):
    left = spark.createDataFrame([("A", _ts(11), 1.0)], "sym string, t timestamp, v double")
    right = spark.createDataFrame(
        [("A", _ts(10), 9.0, "x")], "sym string, mt timestamp, a double, b string"
    )
    row = asof.asof_join(left, right, "sym", "t", "mt", ["a", "b"]).collect()[0]
    assert row.a == 9.0 and row.b == "x"


def test_asof_null_payload_not_borrowed_from_older_row(spark):
    """The matched right row's NULL stays NULL (pandas merge_asof): a
    per-column fill would borrow the missing column from an OLDER right
    row, emitting a row that mixes two right matches — the struct fill
    makes the match atomic. Applies to backward, forward, and nearest."""
    left = spark.createDataFrame(
        [("A", _ts(12), 1.0)], "sym string, t timestamp, v double"
    )
    right = spark.createDataFrame(
        [("A", _ts(9), 7.0, "old"), ("A", _ts(11), None, "new")],
        "sym string, mt timestamp, a double, b string",
    )
    row = asof.asof_join(left, right, "sym", "t", "mt", ["a", "b"]).collect()[0]
    assert row.b == "new" and row.a is None  # not 7.0 from the t9 row

    # forward: match is t13 (a=NULL); t15's a must not leak backward
    right_f = spark.createDataFrame(
        [("A", _ts(13), None, "first"), ("A", _ts(15), 5.0, "later")],
        "sym string, mt timestamp, a double, b string",
    )
    row = asof.asof_join(
        left, right_f, "sym", "t", "mt", ["a", "b"], direction="forward"
    ).collect()[0]
    assert row.b == "first" and row.a is None

    # nearest with tolerance: the in-tolerance side's NULL stays NULL even
    # when an out-of-tolerance row on the other side has a value
    row = asof.asof_join(
        left,
        spark.createDataFrame(
            [("A", _ts(11), None, "near"), ("A", _ts(7), 3.0, "far")],
            "sym string, mt timestamp, a double, b string",
        ),
        "sym",
        "t",
        "mt",
        ["a", "b"],
        direction="nearest",
        tolerance_seconds=2 * 3600,
    ).collect()[0]
    assert row.b == "near" and row.a is None


def test_rolling_zscore_flags_spike(spark):
    rows = [("S", float(i), 10.0 + (0.1 if i % 2 else -0.1)) for i in range(30)]
    rows[25] = ("S", 25.0, 50.0)  # spike
    df = spark.createDataFrame(rows, "symbol string, time double, close double")
    from pyspark.sql import Window

    w = Window.partitionBy("symbol").orderBy("time")
    out = anomaly.zscore_anomalies(df, window=20, threshold=2.5, w=w).collect()
    assert any(r.time == 25.0 for r in out)
    # head rows (window not full) are never flagged
    assert all(r.time >= 19.0 for r in out)


def test_correlation_matrix_shape(spark):
    import math

    rows = []
    for i in range(40):
        d = dt.date(2024, 1, 1) + dt.timedelta(days=i)
        rows.append(("A", d, 10.0 + i, 100.0))
        rows.append(("B", d, 20.0 + 2 * i, 90.0))   # perfectly correlated with A
        rows.append(("C", d, 10.0 + math.cos(i), 80.0))
    bars = spark.createDataFrame(rows, "symbol string, d date, close double, volume double")
    out = {(r.sym_a, r.sym_b): r.corr for r in breadth.correlation_matrix(bars, top_n=3).collect()}
    assert len(out) == 3
    assert abs(out[("A", "B")] - 1.0) < 1e-3
