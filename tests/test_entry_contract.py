"""Driver-contract smoke: entry() runs, every queries() entry runs at
sf0.001, and oracle_sql() keys are a subset of queries() keys."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"symbol", "overall_signal", "score"} <= set(df.columns)


def test_oracle_keys_subset():
    assert set(entrymod.oracle_sql()) <= set(entrymod.queries())


def test_all_queries_run_and_match_columns(spark, sf_dir):
    for name, fn in entrymod.queries().items():
        df = fn(spark, sf_dir)
        assert df.columns, name
        # cheap execution check (limit avoids full materialization cost here;
        # the full-result oracle comparison runs in tools/verify_local.py)
        df.limit(5).collect()
