"""In-session A/B for the r09 orchestration overlaps (guide §1: measure
first; §2.6 overlap). Whole-process A/B of the e2e entries is hopelessly
noisy (first-call codegen of the ~1100-column training plan, file-system
state, GC) — so each change is toggled by its env knob and measured
interleaved inside ONE warm session, isolating exactly the phase the
change touches:

  fsr     feature_store_roundtrip       SPARK_GRAFT_QUERY_CACHE 0/1
  stream  stream_ops_suite              SPARK_GRAFT_STREAM_JOBS 1/4
  grains  build_training_set(mat=True)  SPARK_GRAFT_GRAIN_JOBS  1/3
  train   train_commodity_models (gbt)  SPARK_GRAFT_TRAIN_JOBS  1/2
  publish Pipeline.score+publish        SPARK_GRAFT_QUERY_CACHE 0/1
  creates the isolated grain-CREATE phase SPARK_GRAFT_GRAIN_JOBS 1/3
          (the measurement OPTIMIZATION_r09.md §10 cites for the
          grain-build win; heavier than `grains`, so opt-in only —
          not in the no-args default set)

Usage: python tools/ab_overlap.py [--rounds 3] [case ...]
"""

from __future__ import annotations

import argparse
import datetime
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("cases", nargs="*", default=[])
    args = ap.parse_args()

    from propensity_spark.feature_store import q_feature_store_roundtrip
    from propensity_spark.ml.training import build_training_set, train_commodity_models
    from propensity_spark.pipeline import Pipeline
    from propensity_spark.session import get_spark
    from propensity_spark.streaming.windows import q_stream_ops_suite

    spark = get_spark("ab_overlap")

    def ab(name: str, knob: str, variants: list[str], fn) -> None:
        times: dict[str, list[float]] = {v: [] for v in variants}
        for _ in range(args.rounds):
            for v in variants:
                os.environ[knob] = v
                spark.sparkContext.setJobDescription(f"ab:{name}={v}")
                t0 = time.time()
                fn()
                times[v].append(time.time() - t0)
            os.environ.pop(knob, None)
        out = "  ".join(
            f"{knob}={v}: min {min(ts):.2f} med {sorted(ts)[len(ts) // 2]:.2f}"
            f" [{','.join(f'{t:.1f}' for t in ts)}]"
            for v, ts in times.items()
        )
        print(f"{name:8s} {out}", flush=True)

    cases = set(args.cases) or {"fsr", "stream", "grains", "train", "publish"}

    # warm
    q_feature_store_roundtrip(spark, SF).count() if "fsr" in cases or "publish" in cases else None

    if "fsr" in cases:
        ab("fsr", "SPARK_GRAFT_QUERY_CACHE", ["0", "1"],
           lambda: q_feature_store_roundtrip(spark, SF).count())

    if "stream" in cases:
        q_stream_ops_suite(spark, SF).count()  # warm streaming machinery
        ab("stream", "SPARK_GRAFT_STREAM_JOBS", ["1", "4"],
           lambda: q_stream_ops_suite(spark, SF).count())

    if "grains" in cases:
        def run_grains():
            d = tempfile.mkdtemp(prefix="ab_grains_")
            try:
                build_training_set(spark, SF, d, materialize=True)
            finally:
                shutil.rmtree(d, ignore_errors=True)

        run_grains()  # warm (compiles the wide lookup plan once)
        ab("grains", "SPARK_GRAFT_GRAIN_JOBS", ["1", "3"], run_grains)

    if "creates" in cases:
        # isolate exactly the changed phase: the three grain creates,
        # without build_training_set's (unchanged, dominant) wide
        # lookup+write stage diluting the signal.
        from concurrent.futures import ThreadPoolExecutor

        from pyspark.sql import functions as F

        from propensity_spark.feature_store import FeatureTable
        from propensity_spark.operators.features import (
            q_commodity_features,
            q_household_commodity_features,
            q_household_features,
        )

        def run_creates():
            d = tempfile.mkdtemp(prefix="ab_creates_")
            try:
                day = F.lit("2024-01-01").cast("date")
                work = [
                    (FeatureTable(spark, "household", ["household_key", "day"], d),
                     q_household_features),
                    (FeatureTable(spark, "commodity", ["commodity_desc", "day"], d),
                     q_commodity_features),
                    (FeatureTable(
                        spark, "household_commodity",
                        ["household_key", "commodity_desc", "day"], d),
                     q_household_commodity_features),
                ]
                jobs = int(os.environ.get("SPARK_GRAFT_GRAIN_JOBS", "3")) or 3

                def one(tq):
                    t, q = tq
                    t.create(q(spark, SF).withColumn("day", day))

                if jobs > 1:
                    with ThreadPoolExecutor(max_workers=jobs) as pool:
                        list(pool.map(one, work))
                else:
                    for tq in work:
                        one(tq)
            finally:
                shutil.rmtree(d, ignore_errors=True)

        run_creates()  # warm
        ab("creates", "SPARK_GRAFT_GRAIN_JOBS", ["1", "3"], run_creates)

    if "train" in cases:
        pre = tempfile.mkdtemp(prefix="ab_train_")
        try:
            build_training_set(spark, SF, pre, materialize=True)

            def run_train():
                train_commodity_models(
                    spark, SF, commodities=2, store_base=pre,
                    materialize_features=False,
                ).collect()

            run_train()  # warm
            ab("train", "SPARK_GRAFT_TRAIN_JOBS", ["1", "2"], run_train)
        finally:
            shutil.rmtree(pre, ignore_errors=True)

    if "publish" in cases:
        base = tempfile.mkdtemp(prefix="ab_publish_")
        try:
            p = Pipeline(spark, SF, base)
            day = datetime.date(2024, 2, 1)
            manifest = p.run_init(day, n_commodities=2, backfill_days=0,
                                  model_type="lr")
            p.run_daily(day, manifest)  # warm + creates published tables

            def run_publish():
                p.publish(p.score(manifest, day))

            ab("publish", "SPARK_GRAFT_QUERY_CACHE", ["0", "1"], run_publish)
        finally:
            shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
