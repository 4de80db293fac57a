"""Order-perturbation determinism sweep (GATE_CONTRACT rule 2, empirical).

A float sum is order-dependent: different partial-aggregation grouping
produces a different ulp tail, and if a rounded output sits close enough
to a rounding boundary the hash flips — the class behind the r05/r06
driver flakes. The epsilon nudge can MASK such a hazard at one
execution layout and ship it at another (the driver's JVM does not use
this box's layout). This sweep attacks the claim directly:

- Every Spark query runs twice: under the default layout (32 shuffle
  partitions, 128 MiB input splits) and under a perturbed layout
  (7 shuffle partitions, 8 MiB splits — different input-split
  boundaries AND different partial-agg grouping, hence a different
  float summation order), comparing order-insensitive value hashes.
- Every DuckDB oracle runs twice: threads=32 vs threads=1 (parallel
  vs serial aggregation order).

Any hash difference is an order-dependent output — a latent
cross-engine flake even if today's local_verify is green. Fix is the
FLOAT_AUDIT Class-A integer pattern at the producing site.

Usage: python tools/order_sweep.py [sf_dir] [query ...]
Exit 1 on any violation.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
ONLY = set(sys.argv[2:])

from tools.local_verify import make_duck_views, table_hash  # noqa: E402

PERTURBED = {
    "spark.sql.shuffle.partitions": "7",
    "spark.sql.files.maxPartitionBytes": str(8 * 1024 * 1024),
}
DEFAULTS = {
    "spark.sql.shuffle.partitions": "32",
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
}


def main() -> int:
    import __spark_entry__ as e
    from propensity_spark.session import get_spark

    spark = get_spark(
        "order_sweep", extra_conf={"spark.driver.maxResultSize": "16g"}
    )
    qs, oracles = e.queries(), e.oracle_sql()
    unknown = ONLY - set(qs)
    if unknown:
        # a typo'd name must not yield a green "0/0 order-stable" run
        print(f"SWEEP unknown query name(s): {sorted(unknown)}")
        return 1
    names = [n for n in qs if not ONLY or n in ONLY]
    failures = 0
    for name in names:
        t0 = time.time()
        try:
            for k, v in DEFAULTS.items():
                spark.conf.set(k, v)
            sdf = qs[name](spark, SF_DIR)
            cols = sdf.columns
            h_default = table_hash(cols, [tuple(r) for r in sdf.collect()])
            for k, v in PERTURBED.items():
                spark.conf.set(k, v)
            sdf2 = qs[name](spark, SF_DIR)  # rebuild under the new layout
            h_pert = table_hash(cols, [tuple(r) for r in sdf2.collect()])
        except Exception as ex:
            print(f"ERR   {name}: spark: {ex}")
            failures += 1
            continue
        finally:
            for k, v in DEFAULTS.items():
                spark.conf.set(k, v)
        spark_ok = h_default == h_pert
        duck_ok = True
        if name in oracles:
            try:
                con32 = duckdb.connect()
                con32.execute("SET threads=32")
                make_duck_views(con32, SF_DIR)
                r = con32.execute(oracles[name])
                dcols = [d[0] for d in r.description]
                h32 = table_hash(dcols, r.fetchall())
                con32.close()
                con1 = duckdb.connect()
                con1.execute("SET threads=1")
                make_duck_views(con1, SF_DIR)
                h1 = table_hash(dcols, con1.execute(oracles[name]).fetchall())
                con1.close()
                duck_ok = h32 == h1
            except Exception as ex:
                print(f"ERR   {name}: duckdb: {ex}")
                failures += 1
                continue
        if spark_ok and duck_ok:
            print(f"OK    {name}  [{time.time()-t0:.1f}s]")
        else:
            which = []
            if not spark_ok:
                which.append("spark layout-dependent")
            if not duck_ok:
                which.append("duckdb thread-order-dependent")
            print(f"FAIL  {name}: {', '.join(which)}  [{time.time()-t0:.1f}s]")
            failures += 1
    print(f"\n{len(names) - failures}/{len(names)} order-stable")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
