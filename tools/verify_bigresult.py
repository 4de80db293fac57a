"""Gate check for entries whose result is too large to ship to Python.

neardup_suite at sf1 emits ~4e8 near-dup pair rows (~25 GiB serialized):
the fixture's 10x-replicated dup groups make the pair sections grow
quadratically in group size, which is the CORRECT answer for a pair-
enumeration contract — the engine computes it fully distributed, but the
default harness fetches results into Python to hash them and dies in the
driver transfer. This tool keeps the comparison value-level and
all-rows while never moving rows to Python:

1. the Spark result is written to parquet (distributed, no driver path);
2. DuckDB reads BOTH that parquet and the oracle subquery and reduces
   each side to count + two independent commutative checksums
   (sum of md5_number(canonical line) mod two distinct 63-bit primes,
   BIGINT terms summed into HUGEINT — no overflow) per section;
3. the per-section reductions must match exactly. Multiset equality
   follows with collision probability ~2^-126 per differing multiset.

Both sides are canonicalized by the SAME DuckDB expression, so engine
rendering differences cannot leak in. Only exact-typed columns are
eligible (ints / strings / dates); the tool refuses float columns, whose
canonicalization belongs to the main harness.

Usage: python tools/verify_bigresult.py <entry> [sf_dir] [workdir]
"""

from __future__ import annotations

import shutil
import sys
import time
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from tools.local_verify import make_duck_views  # noqa: E402

P1 = 9223372036854775783  # largest prime < 2^63
P2 = 9223372036854775643  # next prime down

# Exact Spark simpleString() type names (no prefixes: "int" as a prefix
# would also admit "interval ...", which is not exact-rendered).
EXACT_TYPES = {
    "string", "bigint", "int", "smallint", "tinyint", "boolean", "date",
}


def _checksum_sql(cols: list[str], rel: str) -> str:
    # Escape each value so the column separator cannot be forged by data:
    # backslashes double, literal '|' becomes '\|', and SQL NULL gets the
    # sentinel '\N' (a REAL two-char "\N" value escapes to "\\N", so the
    # sentinel is unambiguous). Without this, a VARCHAR containing '|' or
    # equal to the old literal 'NULL' could alias another row's encoding.
    canon = " || '|' || ".join(
        "coalesce(replace(replace(CAST({c} AS VARCHAR),"
        " '\\', '\\\\'), '|', '\\|'), '\\N')".format(c=c)
        for c in sorted(cols)
    )
    return f"""
        SELECT count(*) AS n,
               sum(CAST(md5_number(line) % {P1} AS BIGINT)) AS h1,
               sum(CAST(md5_number('s2' || line) % {P2} AS BIGINT)) AS h2
        FROM (SELECT {canon} AS line FROM {rel})
    """


def main() -> int:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.tmp/sf1"
    workdir = sys.argv[3] if len(sys.argv) > 3 else f"/tmp/bigresult_{name}"

    import __spark_entry__ as e
    from propensity_spark.session import get_spark

    qs, oracles = e.queries(), e.oracle_sql()
    spark = get_spark("verify_bigresult")

    t0 = time.time()
    sdf = qs[name](spark, sf_dir)
    bad = [
        f.name for f in sdf.schema.fields
        if f.dataType.simpleString() not in EXACT_TYPES
    ]
    if bad:
        print(f"FAIL  {name}: non-exact columns {bad} — use the main harness")
        return 1
    cols = sdf.columns
    sdf.write.mode("overwrite").parquet(workdir)
    print(f"spark result staged  [{time.time() - t0:.1f}s]", flush=True)

    con = duckdb.connect()
    con.execute("SET memory_limit='36GB'")
    con.execute("SET temp_directory='/tmp/duck_spill'")
    make_duck_views(con, sf_dir)

    # Schema gate first: an oracle carrying extra/renamed columns is a
    # drift the main harness would flag — projecting only the Spark
    # columns out of it would silently ignore that here.
    o_cols = [
        r[0] for r in con.execute(f"DESCRIBE SELECT * FROM ({oracles[name]})").fetchall()
    ]
    if sorted(o_cols) != sorted(cols):
        print(f"FAIL  {name}: schema mismatch spark={sorted(cols)} oracle={sorted(o_cols)}")
        return 1

    t1 = time.time()
    s_row = con.execute(
        _checksum_sql(cols, f"read_parquet('{workdir}/*.parquet')")
    ).fetchone()
    print(f"spark side reduced: {s_row}  [{time.time() - t1:.1f}s]", flush=True)
    t2 = time.time()
    d_row = con.execute(
        _checksum_sql(cols, f"({oracles[name]})")
    ).fetchone()
    print(f"duck side reduced:  {d_row}  [{time.time() - t2:.1f}s]", flush=True)

    if s_row != d_row:
        # Keep the staged parquet: diagnosing a divergence without it
        # means recomputing the (very expensive) Spark result.
        print(f"FAIL  {name}: count/checksum mismatch {s_row} vs {d_row}")
        print(f"      staged spark parquet kept at {workdir} for diagnosis")
        return 1
    shutil.rmtree(workdir, ignore_errors=True)
    print(f"OK    {name}: {s_row[0]} rows  [{time.time() - t0:.1f}s total]")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
