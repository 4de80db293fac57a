"""Command-line driver: `python -m propensity_spark <cmd>`.

The reference is operated through Databricks Jobs (RUNME.py builds the
job DAG; 03_Define_Workflow.py schedules daily/weekly runs). Outside
that platform the equivalent is a CLI a scheduler (cron, Airflow
BashOperator, etc.) can call — one subcommand per reference job:

    python -m propensity_spark init   --sf-dir DATA --base OUT [--day D]
                                      [--backfill-days N] [--commodities K]
    python -m propensity_spark daily  --sf-dir DATA --base OUT --day D
    python -m propensity_spark weekly --sf-dir DATA --base OUT [--day D]
                                      [--tune]
    python -m propensity_spark drift  --sf-dir DATA --base OUT --day D

`init` prints the training manifest, `daily` the published paths plus
the in-flight publish metrics and PSI drift, `weekly` the manifest,
`drift` the PSI report. Exit code is non-zero on failed training rows
so schedulers alert without parsing output.
"""

from __future__ import annotations

import argparse
import datetime
import json
import sys


def _day(s: str) -> datetime.date:
    return datetime.datetime.strptime(s, "%Y-%m-%d").date()


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(prog="python -m propensity_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)
    for name in ("init", "daily", "weekly", "drift"):
        p = sub.add_parser(name)
        p.add_argument("--sf-dir", required=True)
        p.add_argument("--base", required=True)
        p.add_argument("--day", type=_day, default=None)
        if name == "init":
            p.add_argument("--backfill-days", type=int, default=1)
            p.add_argument("--commodities", type=int, default=2)
        if name in ("init", "weekly"):
            p.add_argument("--model-type", choices=("gbt", "lr"), default="gbt")
        if name == "weekly":
            p.add_argument("--tune", action="store_true")
    return ap


def run(args, spark=None) -> int:
    """Dispatch a parsed namespace; returns the process exit code.
    Separated from main() so tests drive it with a shared session."""
    from propensity_spark.pipeline import Pipeline
    from propensity_spark.session import get_spark

    spark = spark or get_spark(f"propensity-{args.cmd}")
    p = Pipeline(spark, args.sf_dir, args.base)

    def latest_day():
        from propensity_spark.operators.relational import silver_transactions

        return silver_transactions(spark, args.sf_dir).agg(
            {"day": "max"}
        ).collect()[0][0]

    day = args.day or latest_day()

    if args.cmd == "init":
        manifest = p.run_init(
            day,
            n_commodities=args.commodities,
            backfill_days=args.backfill_days,
            model_type=args.model_type,
        )
        rows = [r.asDict() for r in manifest.collect()]
        print(json.dumps({"cmd": "init", "day": str(day), "manifest": rows}, default=str))
        return 1 if any(r["stage"] == "failed" for r in rows) else 0

    if args.cmd == "weekly":
        manifest = p.run_weekly(day=day, tune=args.tune, model_type=args.model_type)
        rows = [r.asDict() for r in manifest.collect()]
        print(json.dumps({"cmd": "weekly", "day": str(day), "manifest": rows}, default=str))
        return 1 if any(r["stage"] == "failed" for r in rows) else 0

    if args.cmd == "daily":
        from pathlib import Path

        manifest_path = str(p.base / "manifest")

        if Path(manifest_path).exists():
            manifest = spark.read.parquet(manifest_path)
        else:
            # first daily without a stored manifest: train as init would
            manifest = p.run_weekly(day=day)
            manifest.write.mode("overwrite").parquet(manifest_path)
            manifest = spark.read.parquet(manifest_path)
        paths = p.run_daily(day, manifest)
        print(
            json.dumps(
                {
                    "cmd": "daily",
                    "day": str(day),
                    "published": list(paths),
                    "publish_metrics": p.last_publish_metrics,
                    "drift": p.last_drift,
                },
                default=str,
            )
        )
        return 0

    if args.cmd == "drift":
        report = p.drift(day)
        print(json.dumps({"cmd": "drift", "report": report}, default=str))
        return 0

    raise AssertionError(args.cmd)


def main(argv=None) -> int:
    return run(build_parser().parse_args(argv))


if __name__ == "__main__":
    sys.exit(main())
