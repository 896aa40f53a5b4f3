"""Contracts for the behavior-analytics (funnel/retention) and TF-IDF
operators. Value-level parity is the DuckDB oracle's job; these pin the
structural invariants that survive any data."""

from __future__ import annotations

from pyspark.sql import functions as F

from market_data_pipeline_spark.operators import behavior, text
from market_data_pipeline_spark.sources.tables import load_table


def test_funnel_counts_monotone_nonincreasing(spark, sf_dir):
    rows = behavior.conversion_funnel(spark, sf_dir).orderBy("stage").collect()
    counts = [r.n_users for r in rows]
    assert len(counts) == 3
    assert counts == sorted(counts, reverse=True)
    assert counts[0] > 0


def test_funnel_respects_event_order(spark, sf_dir):
    """A user whose only purchase precedes every click must not convert."""
    ev = load_table(spark, sf_dir, "events")
    # stage counts can never exceed the distinct users holding that event type
    per_type = {
        r.event_type: r.n
        for r in ev.groupBy("event_type").agg(F.countDistinct("user_id").alias("n")).collect()
    }
    rows = {r.stage: r.n_users for r in behavior.conversion_funnel(spark, sf_dir).collect()}
    assert rows["2_click"] <= per_type["click"]
    assert rows["3_purchase"] <= per_type["purchase"]


def test_retention_day_zero_covers_all_users(spark, sf_dir):
    ret = behavior.retention_cohorts(spark, sf_dir)
    n_users = load_table(spark, sf_dir, "events").select("user_id").distinct().count()
    day0 = ret.filter(F.col("day_offset") == 0).agg(F.sum("active_users")).collect()[0][0]
    # every user is active on their own cohort day
    assert day0 == n_users
    assert ret.filter(F.col("day_offset") < 0).count() == 0


def test_tfidf_rank_and_bounds(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    out = text.tfidf_top_terms(d, k=3)
    assert out.filter((F.col("rk") < 1) | (F.col("rk") > 3)).count() == 0
    # a term present in every doc gets idf==1 -> tfidf == tf
    assert out.filter(F.col("tfidf") < 0).count() == 0
    per_doc = out.groupBy("doc_id").count()
    assert per_doc.filter(F.col("count") > 3).count() == 0
