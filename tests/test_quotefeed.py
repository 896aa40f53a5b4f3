"""Custom DataSource (sources/quotefeed.py): batch determinism, per-symbol
partitioning, and streaming offset semantics across a checkpoint restart —
the DataSource V2 re-expression of the reference's realtime quote scan
(price_extractor.py:109-155)."""

from __future__ import annotations

import time

from pyspark.sql import functions as F


def _read(spark, symbols="AAA,BBB,CCC", ticks=8):
    from market_data_pipeline_spark.sources import quotefeed

    quotefeed.register(spark)
    return (
        spark.read.format("quotefeed")
        .option("symbols", symbols)
        .option("ticks", str(ticks))
        .load()
    )


def test_batch_read_is_deterministic_and_complete(spark):
    df = _read(spark)
    rows = {(r.symbol, r.seq): (r.price, r.change, r.pct_change, r.volume) for r in df.collect()}
    assert len(rows) == 3 * 8
    again = {(r.symbol, r.seq): (r.price, r.change, r.pct_change, r.volume) for r in _read(spark).collect()}
    assert rows == again, "two reads of the same feed slice must be identical"
    # tick 0 anchors change/pct at zero; later ticks carry the raw deltas
    assert rows[("AAA", 0)][1] == 0.0 and rows[("AAA", 0)][2] == 0.0
    p0 = rows[("AAA", 0)][0]
    p1 = rows[("AAA", 1)][0]
    assert rows[("AAA", 1)][1] == p1 - p0


def test_batch_read_partitions_per_symbol(spark):
    df = _read(spark, symbols="A,B,C,D,E", ticks=4)
    # one input partition per symbol — the parallel-fetch contract
    assert df.rdd.getNumPartitions() == 5
    per = {r.symbol: r.n for r in df.groupBy("symbol").agg(F.count("*").alias("n")).collect()}
    assert per == {s: 4 for s in "ABCDE"}


def test_stream_resumes_offsets_exactly_once(spark, tmp_path):
    """Offsets live in the checkpoint: stop a quote stream, restart it with
    the same checkpoint, and the (symbol, seq) stream must continue
    gapless and duplicate-free from the committed tick."""
    from market_data_pipeline_spark.sources import quotefeed

    quotefeed.register(spark)
    out = str(tmp_path / "qf_out")
    ckpt = str(tmp_path / "qf_ckpt")

    def run_until(min_rows, deadline_s=60):
        stream = (
            spark.readStream.format("quotefeed")
            .option("symbols", "AAA,BBB")
            .option("ticks_per_batch", "5")
            .load()
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="1 second")
            .start()
        )
        try:
            deadline = time.time() + deadline_s
            while time.time() < deadline:
                try:
                    if spark.read.parquet(out).count() >= min_rows:
                        break
                except Exception:
                    pass
                time.sleep(0.5)
        finally:
            q.stop()
            q.awaitTermination()

    run_until(2 * 5)  # at least one full batch of both symbols
    n_first = spark.read.parquet(out).count()
    run_until(n_first + 2 * 5)  # restart: must continue, not repeat

    df = spark.read.parquet(out)
    per = df.groupBy("symbol").agg(
        F.count("*").alias("n"),
        F.countDistinct("seq").alias("n_distinct"),
        F.min("seq").alias("lo"),
        F.max("seq").alias("hi"),
    )
    for r in per.collect():
        assert r.n == r.n_distinct, f"{r.symbol}: duplicate seq after restart"
        assert r.lo == 0 and r.hi == r.n - 1, f"{r.symbol}: gap in seq after restart"


def test_streaming_quote_signals_match_batch_twin(spark, tmp_path):
    """End-to-end streaming composition: quotefeed stream → windowed
    momentum/volatility signals, append-mode. Every finalized window the
    stream emits must equal the batch twin computed over the same ticks —
    the custom source's determinism makes the comparison exact."""
    from market_data_pipeline_spark.sources import quotefeed
    from market_data_pipeline_spark.streaming import jobs

    quotefeed.register(spark)
    emitted = []

    stream = (
        spark.readStream.format("quotefeed")
        .option("symbols", "AAA,BBB")
        .option("ticks_per_batch", "10")
        .load()
    )
    sig = jobs.streaming_quote_signals(stream, width="10 minutes", watermark="5 minutes")

    def sink(batch_df, _bid):
        emitted.extend(batch_df.collect())

    q = (
        sig.writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "qs_ckpt"))
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = time.time() + 90
        while len(emitted) < 4 and time.time() < deadline:
            time.sleep(0.5)
    finally:
        q.stop()
        q.awaitTermination()
    assert len(emitted) >= 4, "stream finalized no windows"

    batch = (
        spark.read.format("quotefeed")
        .option("symbols", "AAA,BBB")
        .option("ticks", "500")
        .load()
    )
    want = {
        (r.symbol, r.win_start): r
        for r in batch.groupBy(F.window("ts", "10 minutes").alias("win"), "symbol")
        .agg(*jobs.quote_signal_aggs())
        .select(
            "symbol", F.col("win.start").alias("win_start"),
            "first_price", "last_price", "avg_price", "momentum_pct",
            "tick_vol", "total_volume", "n_ticks",
        )
        .collect()
    }
    keys = [(r.symbol, r.win_start) for r in emitted]
    assert len(keys) == len(set(keys)), "a window emitted twice"
    for r in emitted:
        w = want[(r.symbol, r.win_start)]
        assert r == w, f"stream window {r} != batch twin {w}"
