"""Standing sf1 bench artifact (r08 VERDICT task 2).

bench.py's sf0.1 numbers are setup-dominated (29/41 queries run faster
in DuckDB purely on JVM fixed cost), so regressions in the heavy
families — the ones whose cost actually matters at 100 TB — are
invisible there. This sidecar times the heaviest registry entries at
the 10x fixture (tools/make_scaled_fixture.py -> .tmp/sf1) and writes
BENCH_sf1_r{N}.json so the triangle-partition / BLAS-block wins (and
any future regression) are tracked per round at the scale where they
show. SCALE.md's ratio table is updated from this file each round.

Timing protocol matches bench.py/scale_run.py: each query materialized
via .count(), repeats interleaved across full sweeps (a shared-host
load spike then degrades one sweep of many queries, not all repeats of
one query), min across sweeps. No DuckDB comparator by default — the
oracle side at sf1 costs tens of minutes and the <=2x gate is owned by
bench.py at sf0.1; this artifact tracks the ENGINE round-over-round.

Usage: python tools/bench_sf1.py [--repeats 2] [--out BENCH_sf1_rNN.json]
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

SF1 = str(REPO / ".tmp" / "sf1")

# The heavy set: every family whose sf1 cost is >~10x its sf0.1 cost
# in the r08 sweep, plus the round's flagship pipeline stages. Keep
# additive across rounds so per-query deltas stay comparable.
HEAVY_QUERIES = [
    "household_commodity_features",  # widest single-pass agg grain
    "household_features",
    "neardup_suite",          # simhash pair join — the r08 output-skew fix
    "semdedup",               # BLAS-block cluster scan (r08 rework)
    "minhash_band_pairs",     # LSH band join
    "setsim_join",            # prefix-filter all-pairs
    "exactsubstr_dedup",      # suffix-chunk substring dedup
    "dedup_components",       # iterative large-star/small-star CC
    "tpch_join_suite",
    "tpch_mini_suite",
    "stream_ops_suite",       # 2M-row streaming suite
    "salted_join",
    "salted_agg",
    "ann_cosine_topk",
    "quality_filter",
    "pipeline_e2e",           # end-to-end orchestration flagship
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--out", default=None, help="JSON artifact path")
    ap.add_argument("--only", nargs="*", default=None)
    args = ap.parse_args()
    queries = args.only if args.only else HEAVY_QUERIES

    if not Path(SF1, "lineitem.parquet").exists():
        raise SystemExit(
            f"sf1 fixture missing at {SF1}: run `python tools/make_scaled_fixture.py` first"
        )

    import __spark_entry__ as e
    from propensity_spark.session import get_spark

    spark = get_spark(
        "bench-sf1", extra_conf={"spark.driver.maxResultSize": "16g"}
    )
    qs = dict(e.queries())
    qs["tpch_q1"](spark, SF1).count()  # warm JVM + parquet footers

    best = {name: float("inf") for name in queries}
    rows: dict[str, int] = {}
    for sweep in range(args.repeats):
        for name in queries:
            t0 = time.time()
            n = qs[name](spark, SF1).count()
            dt = time.time() - t0
            best[name] = min(best[name], dt)
            rows[name] = n
            print(f"  sweep {sweep + 1} {name}: {dt:.1f}s ({n} rows)", flush=True)

    out = {}
    for name in queries:
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            qs[name](spark, SF1).explain("formatted")
        flags = [
            f
            for f in ("Expand", "CartesianProduct", "BatchEvalPython")
            if f in buf.getvalue()
        ]
        out[name] = {
            "sec": round(best[name], 3),
            "rows": rows[name],
            "plan_red_flags": flags,
        }
    record = {
        "metric": "heavy_queries_total_sf1",
        "value": round(sum(v["sec"] for v in out.values()), 3),
        "unit": "sec",
        "sf": 1.0,
        "repeats": args.repeats,
        "queries": out,
    }
    line = json.dumps(record, separators=(",", ":"))
    print(line)
    if args.out:
        Path(args.out).write_text(line + "\n")


if __name__ == "__main__":
    main()
