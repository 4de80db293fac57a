"""Benchmark harness (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Headline set = the flagship pipeline stages plus one representative of
each extension family, so the number tracks the engine, not one hot
loop. Each query is collected to completion (count) — materialization
included, no lazy-plan cheating.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

BENCH_QUERIES = [
    "topk_commodities",
    "silver_projection",
    "summary_agg",
    "tpch_q1",
    "labels",
    "household_features",
    "household_commodity_features",
    "pivot_scores",
    "dedup_exact",
    "minhash_band_pairs",
    "ann_cosine_topk",
    "session_window",
    "asof_join",
    "text_quality",
    "salted_agg",
]


def main() -> None:
    import __spark_entry__ as e
    from propensity_spark.session import get_spark

    spark = get_spark("bench")
    qs = e.queries()
    # warm the JVM + parquet footers once so per-query times measure the
    # engine, not first-touch costs
    qs["agg_minmax_day"](spark, SF_DIR).count()

    # Steady-state timing: min of 2 runs per query (first run pays JIT /
    # codegen warm-up that a long-lived cluster never re-pays).
    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            qs[name](spark, SF_DIR).count()
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
            }
        )
    )


if __name__ == "__main__":
    main()
