"""Cleaning kernel + quality aggregate contracts (reference semantics:
data_cleaner.py, data_validator.py, pipeline.py:377-406)."""

from __future__ import annotations

import datetime

import pytest

from pyspark.sql import functions as F

from market_data_pipeline_spark.functions.helpers import (
    keep_last_dedupe,
    require_columns,
    snake_case_columns,
)
from market_data_pipeline_spark.operators import cleaning, quality
from market_data_pipeline_spark.sources.tables import series_from_events


def test_keep_last_dedupe_keeps_highest_order(spark):
    df = spark.createDataFrame(
        [
            (1, "A", 10, 1.0),
            (2, "A", 10, 2.0),  # same (symbol, time), later ingest — must win
            (3, "A", 11, 3.0),
        ],
        "event_id long, symbol string, time long, close double",
    )
    out = keep_last_dedupe(df, ["symbol", "time"], "event_id").collect()
    got = {(r.symbol, r.time): r.close for r in out}
    assert got == {("A", 10): 2.0, ("A", 11): 3.0}


def test_snake_case_columns(spark):
    df = spark.createDataFrame([(1, 2)], ["  Close Price ", "Volume(K)"])
    assert snake_case_columns(df).columns == ["close_price", "volume_k"]


def test_require_columns_raises(spark):
    df = spark.createDataFrame([(1,)], ["time"])
    with pytest.raises(ValueError, match="missing required columns"):
        require_columns(df, ["time", "close"])


def test_validate_symbols_format_and_dedupe(spark):
    df = spark.createDataFrame(
        [(" vnm ",), ("VNM",), ("toolong123",), ("ab",), ("HPG",)], ["symbol"]
    )
    out = {r.symbol for r in cleaning.validate_symbols(df).collect()}
    assert out == {"VNM", "HPG"}


def test_densify_fills_gaps(spark):
    df = spark.createDataFrame(
        [
            ("A", datetime.date(2024, 1, 1), 1.0, 5.0),
            ("A", datetime.date(2024, 1, 4), 2.0, 6.0),
        ],
        "symbol string, d date, close double, volume double",
    )
    out = cleaning.densify_calendar(df, zero_fill=("volume",)).orderBy("d").collect()
    assert [r.d.day for r in out] == [1, 2, 3, 4]
    assert [r.volume for r in out] == [5.0, 0.0, 0.0, 6.0]
    assert out[1].close is None


def test_quality_report_shapes(spark, sf_dir):
    s = series_from_events(spark, sf_dir)
    rep = quality.quality_report(s)
    rows = rep.collect()
    assert len(rows) == s.select("symbol").distinct().count()
    for r in rows:
        assert 0 <= r.quality_score <= 100
        assert r.dup_times == 0  # synthetic events have unique (symbol, ts)
        assert r.expected_bdays >= r.n_days - 10  # sanity: formula in range


def test_quality_business_day_formula(spark):
    # 2024-01-01 (Mon) .. 2024-01-14 (Sun) = exactly 10 business days
    rows = [
        ("A", datetime.datetime(2024, 1, 1), 1.0),
        ("A", datetime.datetime(2024, 1, 14), 2.0),
    ]
    df = spark.createDataFrame(rows, "symbol string, time timestamp, close double")
    r = quality.quality_report(df).collect()[0]
    assert r.expected_bdays == 10


def test_approx_count_distinct_within_tolerance(spark, sf_dir):
    """HLL++ sketch (the 100 TB path when exact distinct's shuffle is the
    bottleneck) stays within its rsd envelope of the exact count."""
    from pyspark.sql import functions as F

    from market_data_pipeline_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    row = li.agg(
        F.countDistinct("l_partkey").alias("exact"),
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx"),
    ).collect()[0]
    assert abs(row.approx - row.exact) / row.exact < 0.08


def test_permissive_bad_record_handling(spark, tmp_path):
    """Bad-record tolerance (SURVEY §4: reference skips failed symbols and
    continues): PERMISSIVE CSV parse nulls bad fields and captures the raw
    line instead of failing the job."""
    from pyspark.sql import functions as F

    p = tmp_path / "bad.csv"
    p.write_text("sym,close\nAAA,1.5\nBBB,not_a_number\nCCC,2.5\n")
    df = (
        spark.read.option("header", True)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .schema("sym string, close double, _corrupt string")
        .csv(str(p))
    )
    rows = {r.sym: (r.close, r._corrupt) for r in df.collect()}
    assert rows["AAA"] == (1.5, None)
    assert rows["BBB"][0] is None and "not_a_number" in rows["BBB"][1]
    assert rows["CCC"] == (2.5, None)


def test_sketch_accuracy_contract(spark, sf_dir):
    from market_data_pipeline_spark.operators.quality import sketch_accuracy
    from market_data_pipeline_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    rows = sketch_accuracy(
        li, by="l_returnflag", distinct_col="l_partkey", value_col="l_extendedprice"
    ).collect()
    assert rows, "grouping produced no rows"
    for r in rows:
        assert r.hll_ok, f"HLL distinct out of tolerance for {r.l_returnflag}"
        assert r.p50_ok, f"approx median out of tolerance for {r.l_returnflag}"
        assert r.exact_distinct > 0


def test_distribution_drift_hand_computed(spark):
    """KL/TVD on a 2-bucket toy: A = {0.1 x3, 0.9 x1}, B = {0.1 x1, 0.9 x3},
    alpha=0.5 smoothing -> p=(3.5/5, 1.5/5), q=(1.5/5, 3.5/5)."""
    import math

    from market_data_pipeline_spark.operators import quality

    a = spark.createDataFrame([(0.1,), (0.1,), (0.1,), (0.9,)], "x double")
    b = spark.createDataFrame([(0.1,), (0.9,), (0.9,), (0.9,)], "x double")
    row = quality.distribution_drift(a, b, "x", bins=2, lo=0.0, hi=1.0).collect()[0]
    p = [3.5 / 5, 1.5 / 5]
    q = [1.5 / 5, 3.5 / 5]
    kl = sum(pi * math.log(pi / qi) for pi, qi in zip(p, q))
    tvd = sum(abs(pi - qi) for pi, qi in zip(p, q)) / 2
    assert row.n_a == 4 and row.n_b == 4
    assert abs(row.kl_ab - round(kl, 6)) < 1e-9
    assert abs(row.kl_ba - round(kl, 6)) < 1e-9  # symmetric toy
    assert abs(row.tvd - round(tvd, 6)) < 1e-9
    # identical inputs -> zero drift
    same = quality.distribution_drift(a, a, "x", bins=2, lo=0.0, hi=1.0).collect()[0]
    assert same.kl_ab == 0.0 and same.tvd == 0.0


def test_interval_bars_match_daily_special_case(spark, sf_dir):
    """bars_from_events_interval(width='1 day') must reproduce the daily
    bar derivation exactly (same OHLCV per (symbol, day))."""
    from market_data_pipeline_spark.sources.tables import (
        bars_from_events,
        bars_from_events_interval,
    )
    import pyspark.sql.functions as F

    daily = {
        (r.symbol, str(r.d)): (r.open, r.high, r.low, r.close, r.volume, r.n_trades)
        for r in bars_from_events(spark, sf_dir).collect()
    }
    interval = {
        (r.symbol, str(r.bar_start.date())): (
            r.open, r.high, r.low, r.close, r.volume, r.n_trades
        )
        for r in bars_from_events_interval(spark, sf_dir, width="1 day").collect()
    }
    assert daily == interval and len(daily) > 0


def test_cms_heavy_hitters_never_undercounts_and_collisions_overcount(spark):
    """CMS property test: with width 4 (forced collisions) every estimate
    is >= the exact count; with a wide sketch estimates are exact."""
    from market_data_pipeline_spark.operators import quality

    rows = [(i % 10,) for i in range(1000)] + [(99,)] * 5
    df = spark.createDataFrame(rows, "user_id long")

    tight = quality.cms_heavy_hitters(df, "user_id", width=4, depth=2, min_count=1)
    got = {r.user_id: r for r in tight.collect()}
    assert len(got) == 11
    assert all(r.never_undercounts for r in got.values())
    assert all(r.cms_estimate >= r.exact_count for r in got.values())
    # width 4 << 11 keys: pigeonhole forces at least one overcount
    assert any(r.cms_estimate > r.exact_count for r in got.values())

    wide = quality.cms_heavy_hitters(df, "user_id", width=4096, depth=4, min_count=1)
    assert all(r.cms_estimate == r.exact_count for r in wide.collect())


def test_hll_portable_registers_and_merge(spark):
    """Portable-HLL properties: (1) registers match a pure-Python replay of
    the same hash, (2) the '__ALL__' merged row IS the union sketch (same
    sum_inv as running one group over the union of keys), (3) duplicates
    never move the sketch."""
    from market_data_pipeline_spark.operators import quality

    keys_a = [(i, "a") for i in range(40)]
    keys_b = [(i + 25, "b") for i in range(40)]  # overlaps a on 25..39
    df = spark.createDataFrame(keys_a + keys_b, "user_id long, grp string")
    out = {r.scope: r for r in quality.hll_portable_distinct(df, "grp", "user_id").collect()}
    assert set(out) == {"a", "b", "__ALL__"}
    assert out["a"].exact_distinct == 40 and out["__ALL__"].exact_distinct == 65

    # pure-Python replay of the register build for group 'a'
    m, wbits = quality._HLL_M, quality._HLL_WBITS
    regs: dict[int, int] = {}
    for k in range(40):
        h0 = (k * quality._CMS_KNUTH + quality._CMS_SEEDS[0]) % (1 << 31)
        h1 = h0 ^ (h0 >> 15)
        h2 = (h1 * quality._CMS_SEEDS[2]) % (1 << 31)
        h = h2 ^ (h2 >> 13)
        b, w = h % m, h // m
        rho = (wbits + 1) if w == 0 else (wbits + 1 - w.bit_length())
        regs[b] = max(regs.get(b, 0), rho)
    want_sum = sum(2.0**-r for r in regs.values()) + (m - len(regs))
    assert out["a"].v_set == len(regs)
    assert out["a"].sum_inv == want_sum  # exact doubles, no tolerance

    # merged row == single-group union sketch
    union = spark.createDataFrame(
        [(k, "u") for k in sorted({k for k, _ in keys_a + keys_b})],
        "user_id long, grp string",
    )
    urow = {
        r.scope: r for r in quality.hll_portable_distinct(union, "grp", "user_id").collect()
    }["u"]
    assert urow.sum_inv == out["__ALL__"].sum_inv
    assert urow.hll_estimate == out["__ALL__"].hll_estimate

    # duplicates are invisible to the sketch
    dup = df.unionByName(df).unionByName(df)
    drow = {
        r.scope: r for r in quality.hll_portable_distinct(dup, "grp", "user_id").collect()
    }
    assert drow["a"].sum_inv == out["a"].sum_inv
    assert drow["__ALL__"].hll_estimate == out["__ALL__"].hll_estimate


def test_observe_scan_metrics_free_telemetry(spark):
    from market_data_pipeline_spark.operators.quality import observe_scan_metrics

    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, 30.0), (4, 4.5)], "id long, v double"
    )
    observed, obs = observe_scan_metrics(df.filter("id > 1"), ["v"])
    observed.write.format("noop").mode("overwrite").save()
    got = obs.get
    assert got["n_rows"] == 3
    assert got["v_nulls"] == 1
    assert got["v_min"] == 4.5
    assert got["v_max"] == 30.0


def test_global_rank_matches_row_number_bitwise(spark):
    """quality.global_rank (two-pass distributed rank) must equal
    row_number() over the same total order exactly — including duplicate
    order-key values resolved by the tiebreak column — while never
    funneling the frame through one partition (plan pinned in
    test_plan_shapes)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from market_data_pipeline_spark.operators import quality

    rows = [(i, (i * 7919) % 97, f"w{i % 13:02d}") for i in range(5000)]
    df = spark.createDataFrame(rows, "id long, n long, w string")
    got = {
        r.id: r.rk
        for r in quality.global_rank(
            df, [("n", False), ("w", True), ("id", True)], "rk"
        ).collect()
    }
    want = {
        r.id: r.rk
        for r in df.withColumn(
            "rk",
            F.row_number().over(
                Window.orderBy(F.col("n").desc(), F.col("w").asc(), F.col("id").asc())
            ),
        ).collect()
    }
    assert got == want


def test_moment_profile_hand_computed(spark):
    """x=[1,2,3,4]: mean 2.5, population variance 1.25, skew 0 (symmetric),
    excess kurtosis 2.5625/1.5625-3 = -1.36."""
    from market_data_pipeline_spark.operators.quality import moment_profile

    df = spark.createDataFrame([("g", v) for v in (1, 2, 3, 4)], "grp string, x long")
    r = moment_profile(df, "grp", "x").collect()[0]
    assert r.n == 4
    assert r.mean == 2.5 and r.variance_pop == 1.25
    assert r.skewness == round(0.0 + 1e-9, 6)
    assert r.kurtosis_excess == round(2.5625 / 1.5625 - 3.0 + 1e-9, 6)


def test_mad_outliers_robust_vs_zscore_and_zero_mad(spark):
    """[1,2,3,4,100]: median 3, MAD 1 -> the 100 is a screaming modified-z
    outlier (65.4) even though the plain z-score (~1.8σ) would hide it;
    a majority-constant group has MAD 0 and reports no outliers."""
    from market_data_pipeline_spark.operators.anomaly import mad_outliers

    rows = [("a", v) for v in (1.0, 2.0, 3.0, 4.0, 100.0)] + [
        ("b", v) for v in (5.0, 5.0, 5.0, 9.0)
    ]
    df = spark.createDataFrame(rows, "grp string, value double")
    got = {r.grp: r for r in mad_outliers(df, "grp", "value").collect()}
    assert got["a"].median == round(3.0 + 1e-9, 6) and got["a"].mad == round(1.0 + 1e-9, 6)
    assert got["a"].n_outliers == 1
    # plain z-score never reaches 3.5 here: the outlier inflates the std
    import statistics

    vals = [1.0, 2.0, 3.0, 4.0, 100.0]
    z = abs(100.0 - statistics.mean(vals)) / statistics.pstdev(vals)
    assert z < 3.5
    assert got["b"].mad == round(0.0 + 1e-9, 6) and got["b"].n_outliers == 0


def test_hll_intersection_inclusion_exclusion(spark):
    """Sketch algebra: A={0..59}, B={30..89} (|∩|=30, |∪|=90). The union
    estimate equals a directly-built sketch of A∪B (register max IS the
    union), inclusion-exclusion lands within the tol·union contract, and
    a disjoint pair estimates a near-zero intersection."""
    from market_data_pipeline_spark.operators import quality

    rows = (
        [("A", k) for k in range(60)]
        + [("B", k) for k in range(30, 90)]
        + [("C", k) for k in range(1000, 1040)]  # disjoint from A
    )
    df = spark.createDataFrame(rows, "g string, k long")
    out = {(r.group_a, r.group_b): r for r in quality.hll_intersection_estimate(df, "g", "k").collect()}
    ab = out[("A", "B")]
    assert ab.exact_intersection == 30 and ab.exact_union == 90
    assert ab.within_bound
    # union estimate == the sketch of the literal union (closure property)
    u = spark.createDataFrame([("U", k) for k in range(90)], "g string, k long")
    urow = quality.hll_portable_distinct(u, "g", "k").filter("scope = 'U'").collect()[0]
    assert urow.hll_estimate == ab.est_union
    ac = out[("A", "C")]
    assert ac.exact_intersection == 0 and ac.within_bound


def test_referential_integrity_flags_orphans(spark):
    """Orphan and NULL-key accounting: child rows pointing nowhere are
    orphans, NULL keys are counted separately and are NOT orphans."""
    from market_data_pipeline_spark.operators.quality import referential_integrity

    child = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 99), (4, None)], "id long, fk long"
    )
    parent = spark.createDataFrame([(10,), (20,)], "pk long")
    out = referential_integrity(
        [(child, "child", "fk", parent, "parent", "pk")]
    ).collect()
    r = out[0]
    assert (r.child_key, r.parent_key) == ("child.fk", "parent.pk")
    assert (r.n_rows, r.n_null_keys, r.n_orphans, r.ok) == (4, 1, 1, False)


def test_gini_concentration_hand_computed(spark):
    """Uniform values -> Gini 0; one row holding everything -> (n-1)/n;
    [1,2,3,4] -> 2*(1+4+9+16)/(4*10) - 5/4 = 0.25."""
    from market_data_pipeline_spark.operators.quality import gini_concentration

    rows = (
        [("even", 5) for _ in range(4)]
        + [("one", 0), ("one", 0), ("one", 0), ("one", 100)]
        + [("mix", 1), ("mix", 2), ("mix", 3), ("mix", 4)]
    )
    df = spark.createDataFrame(rows, "g string, x long")
    got = {r.g: r.gini for r in gini_concentration(df, "g", "x").collect()}
    assert got["even"] == round(0.0 + 1e-9, 6)
    assert got["one"] == round(3.0 / 4.0 + 1e-9, 6)
    assert got["mix"] == round(0.25 + 1e-9, 6)


def test_target_encode_out_of_fold(spark):
    """Leakage-safe target encoding on a hand-built frame: expected
    values replayed in pure python with the operator's own fold hash and
    smoothing arithmetic; a category seen in one fold only encodes as
    the pure prior for its own rows (numerator/denominator reduce to
    m*g / m)."""
    from market_data_pipeline_spark.operators.features import target_encode

    rows = [
        (1, "x", 10), (2, "x", 20), (3, "x", 30),
        (4, "y", 100), (5, "y", 200),
        (6, "z", 50),
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, n_chars long")
    k, m = 2, 4.0
    fold = lambda i: (i * 2246822519) % k
    g = round(sum(r[2] for r in rows) / len(rows) + 1e-13, 10)
    sc = {}
    scf = {}
    for i, c, t in rows:
        sc.setdefault(c, [0, 0])
        sc[c][0] += t; sc[c][1] += 1
        scf.setdefault((c, fold(i)), [0, 0])
        scf[(c, fold(i))][0] += t; scf[(c, fold(i))][1] += 1
    want = {}
    for i, c, t in rows:
        sf, cf = scf[(c, fold(i))]
        s, n = sc[c]
        want[i] = round(((s - sf) + m * g) / ((n - cf) + m) + 1e-9, 6)
    got = {
        r.doc_id: (r.cat, r.fold, r.te)
        for r in target_encode(df, "lang", "n_chars", key="doc_id", k=k, smoothing=m).collect()
    }
    assert {i: v[2] for i, v in got.items()} == want
    for i, c, t in rows:
        assert got[i][0] == c and got[i][1] == fold(i)
    # the single-member category's row must encode as the pure prior
    solo = [i for i, c, t in rows if c == "z"][0]
    assert got[solo][2] == round((0 + m * g) / (0 + m) + 1e-9, 6)
