"""Gate-contract linter (GATE_CONTRACT.md, rules 1 and 5).

Static checks over every ``queries()`` / ``oracle_sql()`` pair that the
driver's canonicalizer can hash the output at all:

- rule 1: every output column is scalar (no array/map/struct) — checked
  from the Spark schema at sf0.001 (lazy where the query allows it);
- rule 5a: the matching DuckDB oracle parses and its column NAMES equal
  the Spark columns (the driver sorts columns by name before hashing,
  so a name mismatch is an automatic hash fail);
- rule 5b: no oracle output column is a DuckDB LIST/STRUCT/MAP either.

Usage: python tools/gate_lint.py [sf_dir]
Exit 1 on any violation. tools/local_verify.py remains the value-level
check; this is the cheap shape-level pre-flight.
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

from tools.local_verify import make_duck_views  # noqa: E402 — shared table bootstrap

NON_SCALAR_SPARK = {"array", "map", "struct"}


def main() -> int:
    import __spark_entry__ as e
    from propensity_spark.session import get_spark

    spark = get_spark("gate_lint")
    con = duckdb.connect()
    make_duck_views(con, SF_DIR)
    qs, oracles = e.queries(), e.oracle_sql()
    problems: list[str] = []
    for name, fn in qs.items():
        try:
            sdf = fn(spark, SF_DIR)
        except Exception as ex:
            problems.append(f"{name}: spark build error: {ex}")
            continue
        for f in sdf.schema.fields:
            if f.dataType.typeName() in NON_SCALAR_SPARK:
                problems.append(
                    f"{name}: non-scalar Spark output column "
                    f"{f.name} ({f.dataType.simpleString()}) — rule 1"
                )
        if name not in oracles:
            continue  # rows-only entry; the driver records a weaker check
        try:
            rel = con.execute(
                f"DESCRIBE SELECT * FROM ({oracles[name]}) LIMIT 0"
            ).fetchall()
        except Exception as ex:
            problems.append(f"{name}: oracle does not parse: {ex}")
            continue
        dcols = [r[0] for r in rel]
        dtypes = {r[0]: r[1] for r in rel}
        if sorted(dcols) != sorted(sdf.columns):
            problems.append(
                f"{name}: column-name mismatch — spark {sorted(sdf.columns)}"
                f" vs oracle {sorted(dcols)} — rule 5a"
            )
        for c, t in dtypes.items():
            if "[]" in t or t.startswith(("STRUCT", "MAP", "LIST")):
                problems.append(
                    f"{name}: non-scalar oracle column {c} ({t}) — rule 5b"
                )
    for p in problems:
        print(f"LINT  {p}")
    print(f"\n{len(qs) - len({p.split(':')[0] for p in problems})}/{len(qs)} clean")
    return 1 if problems else 0


if __name__ == "__main__":
    raise SystemExit(main())
