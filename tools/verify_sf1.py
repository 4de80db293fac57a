"""One command for the WHOLE registry at sf1 (r08 VERDICT task 6).

The plain gate (tools/local_verify.py) hashes full results through the
driver process, which two entries outgrow at sf≥1:

- ``neardup_suite``: ~4e8 pair rows (~25 GiB serialized) — verified
  distributed by tools/verify_bigresult.py (DuckDB-side commutative
  checksums over staged parquet; no row crosses the driver);
- ``household_commodity_features``: the widest oracle grain (~250 agg
  states x 1.45M groups) spills DuckDB past this box's disk — verified
  by tools/verify_wide_chunked.py (K group-key-residue oracle chunks,
  exact decomposition).

Before this wrapper those were standalone tools a round could silently
forget, leaving the two entries that MOST need sf1 evidence unchecked.
This runs local_verify on every other entry plus both special paths,
and fails if the special list drifts out of sync with the registry.

Usage: python tools/verify_sf1.py [sf_dir] [--skip-plain]
"""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

# entry -> argv for its dedicated distributed verifier
SPECIAL = {
    "neardup_suite": lambda sf: [
        sys.executable, str(REPO / "tools" / "verify_bigresult.py"), "neardup_suite", sf,
    ],
    "household_commodity_features": lambda sf: [
        sys.executable, str(REPO / "tools" / "verify_wide_chunked.py"), sf,
    ],
}


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else str(REPO / ".tmp" / "sf1")
    skip_plain = "--skip-plain" in sys.argv[1:]

    import __spark_entry__ as e

    names = list(e.queries())
    missing = [n for n in SPECIAL if n not in names]
    if missing:
        print(f"FAIL  special-path entries no longer in registry: {missing}")
        return 1
    plain = [n for n in names if n not in SPECIAL]

    failures = 0
    if not skip_plain:
        rc = subprocess.call(
            [sys.executable, str(REPO / "tools" / "local_verify.py"), sf_dir, *plain]
        )
        if rc:
            failures += 1
    for name, argv in SPECIAL.items():
        print(f"=== {name} (distributed verifier) ===", flush=True)
        rc = subprocess.call(argv(sf_dir))
        if rc:
            failures += 1
    print(f"\nverify_sf1: {'FAIL' if failures else 'OK'} ({len(plain)} plain + {len(SPECIAL)} special)")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
