"""CLI entry point — the reference's ``run_pipeline.py`` surface
(/root/reference/scripts/run_pipeline.py:46-103):

    python -m market_data_pipeline_spark --mode daily --source /root/testdata/sf0.001
    python -m market_data_pipeline_spark --mode full --source ... --report out.md
    python -m market_data_pipeline_spark --mode validate --source ...

Modes: daily (clean + indicators, optional --persist-to), full (daily +
breadth + health + regime + signals), validate (data-quality report),
report (signal + quality markdown to --report). ``--config`` accepts the
reference's YAML (env overrides MDP_* apply).
"""

from __future__ import annotations

import argparse
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="market_data_pipeline_spark")
    p.add_argument("--mode", choices=("daily", "full", "validate", "report"), default="daily")
    p.add_argument("--source", required=True, help="input table directory (parquet)")
    p.add_argument("--config", default=None, help="optional YAML config path")
    p.add_argument("--persist-to", default=None, help="write enriched bars here (daily mode)")
    p.add_argument("--report", default=None, help="write markdown report here (full/report mode)")
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
    return 0


if __name__ == "__main__":
    sys.exit(main())
