"""Dump `.explain("formatted")` for bench queries to plans/<tag>/<query>_<suffix>.txt.

Usage:
    python tools/dump_plans.py [--tag r09] [--suffix before|after] [query ...]

With no query names, dumps every bench.py BENCH_QUERIES entry. Plans are
captured lazily (no execution) so this is cheap and can run alongside
other work; AQE plans therefore show `isFinalPlan=false`, which is fine
for shape-level review (Exchange count, join strategy, PushedFilters,
Python eval nodes).
"""

from __future__ import annotations

import argparse
import contextlib
import io
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="r09")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    import bench
    import __spark_entry__ as e
    from propensity_spark.session import get_spark

    spark = get_spark("dump_plans")
    qs = dict(e.queries())
    from propensity_spark.streaming import windows as _w

    qs["stream_tumbling"] = _w.q_stream_tumbling

    names = args.queries or bench.BENCH_QUERIES
    outdir = Path(__file__).resolve().parent.parent / "plans" / args.tag
    outdir.mkdir(parents=True, exist_ok=True)
    for name in names:
        try:
            df = qs[name](spark, args.sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as exc:  # noqa: BLE001 - record the failure in-place
            text = f"PLAN CAPTURE FAILED: {exc!r}\n"
        (outdir / f"{name}_{args.suffix}.txt").write_text(text)
        n_exch = text.count("Exchange")
        n_py = sum(text.count(k) for k in ("BatchEvalPython", "ArrowEvalPython"))
        joins = [
            k
            for k in ("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
                      "BroadcastNestedLoopJoin", "CartesianProduct")
            if k in text
        ]
        print(f"{name}: exchanges={n_exch} pyeval={n_py} joins={joins}")


if __name__ == "__main__":
    main()
