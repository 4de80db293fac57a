"""Clique-growth stress for the two quadratic-in-clique operators
(r08 VERDICT task 3): the simhash pair join and the setsim prefix
join emit ~B^2 pairs for a dup clique of size B, and both joins key
candidate generation on values every clique member SHARES (simhash
block value / prefix token) — so without output-aware partitioning a
growing clique concentrates its B^2 output in ever-fewer tasks. AQE
cannot help: its skew heuristics watch shuffle INPUT sizes, and the
clique's input is tiny. The r08 sf1 sweep caught exactly this (two
~25-min stragglers) and fixed the simhash side with cap=512 triangle
partitioning; this tool proves the fix HOLDS as cliques grow past
sf1, and measures the setsim side the same way.

Fixture (documents table only, .tmp/stress_m{N}): the sf0.1 corpus,
word-soup bulk copies (as in make_scaled_fixture), plus NC planted
cliques of BASE_CLIQUE*N IDENTICAL docs each — identical text is the
worst case (all simhash blocks collide, all prefix tokens shared).

Measurement: per-task durations of the heaviest stage of each query,
pulled from the Spark REST API (UI enabled for this tool only).
PASS = max task <= 2x median across *every* stage of the job at BOTH
multipliers (the straggler bound SCALE.md commits to).

Usage: python tools/stress_cliques.py [--mults 3 10] [--ops simhash setsim]
"""

from __future__ import annotations

import argparse
import json
import random
import sys
import time
import urllib.request
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

SRC = "/root/testdata/sf0.1"
NC = 8                 # planted cliques
BASE_CLIQUE = 120      # members per clique per multiplier unit
OFFSET = 100_000_000
CLIQUE_BASE_ID = 9_000_000_000


def build_fixture(out: Path, mult: int) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    out.mkdir(parents=True, exist_ok=True)
    orig = pq.read_table(f"{SRC}/documents.parquet").to_pylist()
    vocab = sorted({w for r in orig for w in r["text"].split() if w})
    rows = list(orig)
    for i in range(1, mult):
        for j, r in enumerate(orig):
            rng = random.Random(f"stress{i}:{j}")
            n = max(1, len(r["text"].split()))
            text = " ".join(rng.choice(vocab) for _ in range(n))
            rows.append(
                {
                    "doc_id": r["doc_id"] + i * OFFSET,
                    "text": text,
                    "lang": r["lang"],
                    "source": r["source"],
                    "n_chars": len(text),
                }
            )
    size = BASE_CLIQUE * mult
    for c in range(NC):
        seed = orig[(c * 37) % len(orig)]
        for k in range(size):
            rows.append(
                {
                    "doc_id": CLIQUE_BASE_ID + c * 1_000_000 + k,
                    "text": seed["text"],  # IDENTICAL: the worst case
                    "lang": seed["lang"],
                    "source": seed["source"],
                    "n_chars": seed["n_chars"],
                }
            )
    pq.write_table(
        pa.Table.from_pylist(rows, schema=pq.read_schema(f"{SRC}/documents.parquet")),
        out / "documents.parquet",
    )
    print(f"fixture {out}: {len(rows)} docs, {NC} cliques x {size}", flush=True)


def _rest(ui: str, path: str):
    with urllib.request.urlopen(f"{ui}/api/v1/{path}", timeout=30) as r:
        return json.loads(r.read())


def task_histogram(spark, run) -> dict:
    """Run `run()` and return per-stage task-duration stats for every
    stage the run executed (identified by stage-id watermark)."""
    ui = spark.sparkContext.uiWebUrl
    app = _rest(ui, "applications")[0]["id"]
    before = {s["stageId"] for s in _rest(ui, f"applications/{app}/stages")}
    t0 = time.time()
    n_rows = run()
    wall = time.time() - t0
    stats = []
    for s in _rest(ui, f"applications/{app}/stages?status=complete"):
        if s["stageId"] in before or s["numCompleteTasks"] == 0:
            continue
        tasks = _rest(
            ui,
            f"applications/{app}/stages/{s['stageId']}/{s['attemptId']}/taskList?length=100000",
        )
        durs = sorted(t.get("duration", 0) / 1000.0 for t in tasks)
        if not durs:
            continue
        med = durs[len(durs) // 2]
        stats.append(
            {
                "stage": s["stageId"],
                "name": s["name"].split("\n")[0][:60],
                "tasks": len(durs),
                "median_s": round(med, 2),
                "max_s": round(durs[-1], 2),
                "ratio": round(durs[-1] / med, 2) if med > 0.05 else None,
            }
        )
    stats.sort(key=lambda x: -x["max_s"])
    return {"rows": n_rows, "wall_s": round(wall, 1), "stages": stats}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mults", type=int, nargs="*", default=[3, 10])
    ap.add_argument("--ops", nargs="*", default=["simhash", "setsim"])
    ap.add_argument("--rebuild", action="store_true")
    args = ap.parse_args()

    from propensity_spark.session import get_spark
    from propensity_spark.text.dedup import q_setsim_join, simhash_near_dup_pairs

    spark = get_spark("stress-cliques", extra_conf={"spark.ui.enabled": "true"})
    ops = {
        "simhash": lambda d: simhash_near_dup_pairs(spark, d),
        "setsim": lambda d: q_setsim_join(spark, d),
    }
    verdicts = []
    report = {}
    for mult in args.mults:
        fix = REPO / ".tmp" / f"stress_m{mult}"
        if args.rebuild or not (fix / "documents.parquet").exists():
            build_fixture(fix, mult)
        for op in args.ops:
            res = task_histogram(spark, lambda: ops[op](str(fix)).count())
            # straggler verdict over the stages that matter (>= 5 tasks
            # and >= 5% of the heaviest stage's max — tiny setup stages
            # have meaningless ratios)
            floor = max((s["max_s"] for s in res["stages"]), default=0) * 0.05
            bad = [
                s
                for s in res["stages"]
                if s["tasks"] >= 5 and s["max_s"] >= max(floor, 1.0)
                and s["ratio"] is not None and s["ratio"] > 2.0
            ]
            verdict = "FAIL" if bad else "OK"
            verdicts.append(verdict == "OK")
            report[f"{op}@m{mult}"] = {**res, "verdict": verdict}
            print(
                f"{verdict}  {op}@m{mult}: {res['rows']} pairs, {res['wall_s']}s wall; "
                + "; ".join(
                    f"stage {s['stage']} ({s['tasks']}t med {s['median_s']}s "
                    f"max {s['max_s']}s r={s['ratio']})"
                    for s in res["stages"][:4]
                ),
                flush=True,
            )
    print(json.dumps(report, separators=(",", ":")))
    return 0 if all(verdicts) else 1


if __name__ == "__main__":
    raise SystemExit(main())
