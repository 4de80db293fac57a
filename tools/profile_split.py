"""Split a bench query's wall time into DataFrame build, Catalyst
plan/optimize (explain), and execution (noop sink), per the optimization
guide §1.4: time the computation, not the sink, and separate driver-side
planning cost from cluster work.

Usage: python tools/profile_split.py [--sf-dir DIR] [--repeats 3] query ...
"""

from __future__ import annotations

import argparse
import contextlib
import io
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    import __spark_entry__ as e
    from propensity_spark.session import get_spark

    spark = get_spark("profile_split")
    qs = dict(e.queries())
    from propensity_spark.streaming import windows as _w

    qs["stream_tumbling"] = _w.q_stream_tumbling

    # warm
    from propensity_spark.operators.relational import q_agg_minmax_day

    q_agg_minmax_day(spark, args.sf_dir).count()

    print(f"{'query':35s} {'build':>8s} {'plan':>8s} {'noop':>8s} {'count':>8s}")
    for name in args.queries:
        best = [float("inf")] * 4
        for _ in range(args.repeats):
            spark.sparkContext.setJobDescription(f"profile:{name}")
            t0 = time.time()
            df = qs[name](spark, args.sf_dir)
            t1 = time.time()
            with contextlib.redirect_stdout(io.StringIO()):
                df.explain("formatted")
            t2 = time.time()
            df.write.format("noop").mode("overwrite").save()
            t3 = time.time()
            qs[name](spark, args.sf_dir).count()
            t4 = time.time()
            cur = [t1 - t0, t2 - t1, t3 - t2, t4 - t3]
            best = [min(b, c) for b, c in zip(best, cur)]
        print(
            f"{name:35s} {best[0]:8.3f} {best[1]:8.3f} {best[2]:8.3f} {best[3]:8.3f}"
        )


if __name__ == "__main__":
    main()
