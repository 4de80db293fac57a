"""Chunked gate check for the widest feature grain at big SFs.

household_commodity_features' DuckDB oracle carries ~250 aggregate
states x 1.45M groups at sf1, 56 of them count(DISTINCT ...) — DuckDB
materializes the distinct sets and the spill outgrows this box's disk
(observed r08: >85 GB temp, ENOSPC). The comparison itself decomposes
exactly: household_key is a GROUP KEY, so filtering the aggregate input
by household_key % K = k yields precisely the groups of that residue
class, while the day-bounds CTE stays global (it must — windows anchor
on the dataset-wide max day). K chunked oracle executions therefore
produce the same multiset of rows as one run, with 1/K the state.

The Spark side runs ONCE (its Expand-free decomposition holds ~30
shuffle-partitioned aggregate states per group — no such blow-up).

Usage: python tools/verify_wide_chunked.py [sf_dir] [K]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from tools.local_verify import (  # noqa: E402
    duck_canon_lines,
    hash_lines,
    make_duck_views,
    spark_canon_lines,
)

NAME = "household_commodity_features"
ANCHOR = "FROM src CROSS JOIN b"


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.tmp/sf1"
    k_chunks = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    import __spark_entry__ as e
    from propensity_spark.session import get_spark

    spark = get_spark(
        "verify_wide_chunked",
        extra_conf={"spark.driver.maxResultSize": "16g"},
    )
    t0 = time.time()
    sdf = e.queries()[NAME](spark, sf_dir)
    scols = sdf.columns
    s_lines = spark_canon_lines(sdf)
    print(f"spark: {len(s_lines)} rows  [{time.time() - t0:.1f}s]", flush=True)

    oracle = e.oracle_sql()[NAME]
    if oracle.count(ANCHOR) != 1:
        print(f"FAIL  {NAME}: oracle shape changed, chunk anchor not found")
        return 1

    con = duckdb.connect()
    con.execute("SET memory_limit='36GB'")
    con.execute("SET temp_directory='/tmp/duck_spill'")
    make_duck_views(con, sf_dir)
    d_lines: list[str] = []
    dcols: list[str] = []
    for k in range(k_chunks):
        t1 = time.time()
        chunk_sql = oracle.replace(
            ANCHOR, f"{ANCHOR} WHERE household_key % {k_chunks} = {k}"
        )
        res = con.execute(chunk_sql)
        dcols = [d[0] for d in res.description]
        d_lines.extend(duck_canon_lines(res, dcols))
        print(
            f"duck chunk {k + 1}/{k_chunks}: {len(d_lines)} rows total"
            f"  [{time.time() - t1:.1f}s]",
            flush=True,
        )

    problems = []
    if len(s_lines) != len(d_lines):
        problems.append(f"rows {len(s_lines)} vs {len(d_lines)}")
    if sorted(scols) != sorted(dcols):
        problems.append(f"cols {sorted(scols)} vs {sorted(dcols)}")
    elif hash_lines(s_lines) != hash_lines(d_lines):
        problems.append("value hash mismatch")
        sset, dset = set(s_lines), set(d_lines)
        for extra in list(sset - dset)[:2]:
            problems.append(f"  spark-only: {extra[:400]}")
        for extra in list(dset - sset)[:2]:
            problems.append(f"  duck-only:  {extra[:400]}")
    if problems:
        print(f"FAIL  {NAME}: " + "; ".join(problems))
        return 1
    print(f"OK    {NAME}: {len(s_lines)} rows  [{time.time() - t0:.1f}s total]")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
