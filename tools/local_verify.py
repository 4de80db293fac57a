"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry at the given SF, runs the matching
``oracle_sql()`` in DuckDB over the same parquet, and compares
row count, column names, and an order-insensitive value hash
(rows sorted, columns sorted by name, values canonicalized).

Usage: python tools/local_verify.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import math
import sys
import time
import traceback
from datetime import date, datetime, timezone
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:])

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def make_duck_views(con, sf_dir: str) -> None:
    """Register every fixture table as a DuckDB view over its parquet —
    shared by local_verify and gate_lint so the table list can't drift
    between the value-level and shape-level checks."""
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # Preserve IEEE zero sign BEFORE the int collapse: the driver's
        # canonicalizer is fixed-precision ("%.6f" renders -0.0 as
        # "-0.000000" != "0.000000"), so a gate that maps both zeros to
        # "0" is strictly weaker and ships -0.0 mismatches (the r06
        # anomaly_mad/mix_decomposition lesson).
        if v == 0.0 and math.copysign(1.0, v) < 0:
            return "-0"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return f"{v:.6f}"
    if isinstance(v, datetime):
        # toArrow() yields tz-aware UTC datetimes while DuckDB yields
        # naive ones; normalize tz-aware values to UTC and drop tzinfo so
        # both sides render identically on any host TZ (they only agreed
        # before because this machine's TZ happens to be UTC).
        if v.tzinfo is not None:
            v = v.astimezone(timezone.utc).replace(tzinfo=None)
        return v.strftime("%Y-%m-%d %H:%M:%S")
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def hash_lines(lines: list[str]) -> str:
    h = hashlib.sha256()
    for line in sorted(lines):
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def table_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return hash_lines(["|".join(canon(r[i]) for i in order) for r in rows])


def spark_canon_lines(sdf) -> list[str]:
    """Fetch the result as Arrow and keep only the canonicalized
    pipe-joined line per row. A plain collect() of the widest sf1 suite
    (1.45M rows x ~370 feature columns) materializes ~87 GB of Python
    tuples and gets OOM-killed (observed r08); the Arrow table for the
    same result is ~4 GB and the canon lines ~6 GB. (toLocalIterator is
    NOT the answer: it fetches partitions sequentially through Java
    object serialization — observed >30 min on one AQE-coalesced
    partition that Arrow moves in seconds.) Batch-wise to_pylist keeps
    the Python-object working set bounded."""
    cols = sdf.columns
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    tbl = sdf.toArrow()
    lines: list[str] = []
    for batch in tbl.to_batches(max_chunksize=65536):
        col_vals = [batch.column(i).to_pylist() for i in order]
        lines.extend("|".join(canon(v) for v in row) for row in zip(*col_vals))
    return lines


def duck_canon_lines(res, cols: list[str]) -> list[str]:
    """fetchmany-batched twin of spark_canon_lines for the oracle side."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines: list[str] = []
    while True:
        batch = res.fetchmany(50_000)
        if not batch:
            return lines
        lines.extend("|".join(canon(r[i]) for i in order) for r in batch)


def main() -> int:
    import __spark_entry__ as e
    from propensity_spark.session import get_spark

    # The gate collects FULL results to hash them (the driver does the
    # same); at sf1 the widest suites serialize >2 GiB of rows and trip
    # Spark's default 1g driver.maxResultSize — a harness limit, not an
    # engine one, so raise it here rather than in the production session.
    spark = get_spark(
        "local_verify", extra_conf={"spark.driver.maxResultSize": "16g"}
    )
    con = duckdb.connect()
    # Cap DuckDB and give it a spill dir: the widest-grain feature
    # oracle (~1000 agg states x 1.5M groups at sf1) otherwise grows
    # the in-memory hash table past physical RAM and the OOM killer
    # takes the whole sweep down (observed r08: 112 GB RSS, 3 GB free).
    con.execute("SET memory_limit='36GB'")
    con.execute("SET temp_directory='/tmp/duck_spill'")
    make_duck_views(con, SF_DIR)

    qs, oracles = e.queries(), e.oracle_sql()
    unknown = ONLY - set(qs)
    if unknown:
        # a typo'd name silently running n-1 of n queries and printing
        # "passed" is a fake-green gate — fail loudly instead.
        print(f"FAIL  unknown query name(s): {sorted(unknown)}")
        return 1
    names = [n for n in qs if not ONLY or n in ONLY]
    failures = 0
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, SF_DIR)
            scols = sdf.columns
            s_lines = spark_canon_lines(sdf)
        except Exception:
            print(f"FAIL  {name}: spark error")
            traceback.print_exc(limit=3)
            failures += 1
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(s_lines)} rows (no oracle)  [{time.time()-t0:.1f}s]")
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            d_lines = duck_canon_lines(res, dcols)
        except Exception as ex:
            print(f"FAIL  {name}: duckdb error: {ex}")
            failures += 1
            continue
        problems = []
        if len(s_lines) != len(d_lines):
            problems.append(f"rows {len(s_lines)} vs {len(d_lines)}")
        if sorted(scols) != sorted(dcols):
            problems.append(f"cols {sorted(scols)} vs {sorted(dcols)}")
        elif hash_lines(s_lines) != hash_lines(d_lines):
            problems.append("value hash mismatch")
            sset, dset = set(s_lines), set(d_lines)
            for extra in list(sset - dset)[:2]:
                problems.append(f"  spark-only: {extra}")
            for extra in list(dset - sset)[:2]:
                problems.append(f"  duck-only:  {extra}")
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems) + f"  [{time.time()-t0:.1f}s]")
            failures += 1
        else:
            print(f"OK    {name}: {len(s_lines)} rows  [{time.time()-t0:.1f}s]")
    print(f"\n{len(names) - failures}/{len(names)} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
