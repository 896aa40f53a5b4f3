"""CLI entry point — the reference's ``run_pipeline.py`` surface
(/root/reference/scripts/run_pipeline.py:46-103):

    python -m market_data_pipeline_spark --mode daily --source /root/testdata/sf0.001
    python -m market_data_pipeline_spark --mode full --source ... --report out.md
    python -m market_data_pipeline_spark --mode validate --source ...

Modes: daily (clean + indicators, optional --persist-to), full (daily +
breadth + health + regime + signals), validate (data-quality report),
report (signal + quality markdown to --report), realtime (the reference's
get_realtime + scanner loop as a bounded Structured Streaming run over
the quotefeed source: windowed momentum/volatility signals printed as
they finalize). ``--config`` accepts the reference's YAML (env overrides
MDP_* apply).
"""

from __future__ import annotations

import argparse
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="market_data_pipeline_spark")
    p.add_argument(
        "--mode",
        choices=("daily", "full", "validate", "report", "realtime", "curate"),
        default="daily",
    )
    p.add_argument("--source", required=True, help="input table directory (parquet)")
    p.add_argument("--config", default=None, help="optional YAML config path")
    p.add_argument("--persist-to", default=None, help="write enriched bars here (daily mode)")
    p.add_argument("--report", default=None, help="write markdown report here (full/report mode)")
    p.add_argument("--symbols", default="SYM00,SYM01,SYM02,SYM03", help="realtime mode universe")
    p.add_argument("--duration", type=float, default=10.0, help="realtime mode run seconds")
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    from market_data_pipeline_spark.pipeline import Pipeline
    from market_data_pipeline_spark.session import get_spark

    spark = get_spark("mdp-cli")
    pipe = Pipeline(spark, args.source, config=args.config)

    if args.mode == "daily":
        df = pipe.run_daily_update(persist_to=args.persist_to)
        print(f"daily update: {df.count()} rows, {len(df.columns)} columns")
    elif args.mode == "full":
        frames = pipe.run_full_pipeline()
        for name, df in frames.items():
            print(f"{name}: {df.count()} rows")
        if args.report:
            from market_data_pipeline_spark import reports

            md = reports.signal_report_markdown(frames["signals"])
            with open(args.report, "w", encoding="utf-8") as fh:
                fh.write(md)
            print(f"report written: {args.report}")
    elif args.mode == "validate":
        rep = pipe.validate_data_quality()
        bad = rep.filter("quality_score < 100").count()
        print(f"quality report: {rep.count()} symbols, {bad} with issues")
    elif args.mode == "report":
        from market_data_pipeline_spark import reports

        sig = pipe.run_batch_analysis()
        md = reports.signal_report_markdown(sig)
        md += "\n" + reports.quality_report_markdown(pipe.validate_data_quality())
        target = args.report or "report.md"
        with open(target, "w", encoding="utf-8") as fh:
            fh.write(md)
        print(f"report written: {target}")
    elif args.mode == "curate":
        # LLM-corpus curation end to end over the documents table: exact +
        # MinHash near-dup collapse (keep the cluster min id), token/quality
        # gating, then a temperature-scaled language mixture report — the
        # same operators the inv_x_* capstone queries register, wired as the
        # one-command pipeline a dataset release runs. --persist-to writes
        # the curated corpus as parquet.
        from pyspark.sql import functions as F

        from market_data_pipeline_spark.operators import dedup, features, text
        from market_data_pipeline_spark.sources.tables import load_table

        docs = load_table(spark, args.source, "documents")
        scored = text.add_quality_score(text.add_token_stats(docs))
        groups = dedup.dup_groups(
            dedup.minhash_lsh_pairs(docs, num_hashes=12, bands=4)
        )
        losers = groups.filter(F.col("doc_id") != F.col("group_id")).select(
            "doc_id"
        )
        curated = (
            scored.filter(
                (F.col("n_tokens") >= 10)
                & (F.col("n_tokens") <= 10000)
                & (F.col("quality_score") >= 0.5)
            )
            .join(losers, "doc_id", "left_anti")
            .select("doc_id", "lang", "source", "n_tokens", "quality_score", "text")
        )
        n_in = docs.count()
        n_out = curated.count()
        print(f"curate: {n_in} docs in -> {n_out} kept "
              f"({n_in - n_out} dropped by dedup/quality)")
        mix = features.temperature_mixture_rates(curated, by="lang", alpha=0.3)
        for r in mix.orderBy("lang").collect():
            print(f"  lang={r['lang']}: share={r['share']} "
                  f"temp_share={r['temp_share']} boost={r['boost']}")
        if args.persist_to:
            curated.write.mode("overwrite").parquet(args.persist_to)
            print(f"curated corpus written: {args.persist_to}")
    elif args.mode == "realtime":
        import time

        from market_data_pipeline_spark.sources import quotefeed
        from market_data_pipeline_spark.streaming import jobs as sjobs

        quotefeed.register(spark)
        stream = (
            spark.readStream.format("quotefeed")
            .option("symbols", args.symbols)
            .option("ticks_per_batch", "10")
            .load()
        )
        sig = sjobs.streaming_quote_signals(stream)
        emitted = []

        def sink(batch_df, _bid):
            emitted.extend(batch_df.collect())

        q = (
            sig.writeStream.outputMode("append")
            .foreachBatch(sink)
            .trigger(processingTime="1 second")
            .start()
        )
        deadline = time.time() + args.duration
        while time.time() < deadline:
            time.sleep(0.25)
        q.stop()
        q.awaitTermination()
        for r in sorted(emitted, key=lambda r: (r.symbol, r.win_start)):
            print(
                f"{r.symbol} {r.win_start} last={r.last_price} "
                f"mom={r.momentum_pct}% vol={r.tick_vol} n={r.n_ticks}"
            )
        print(f"realtime: {len(emitted)} finalized windows")
    return 0


if __name__ == "__main__":
    sys.exit(main())
