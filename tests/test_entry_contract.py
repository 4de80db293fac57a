"""The driver contract itself: entry() smoke, registry integrity."""

import __spark_entry__ as e


def test_entry_returns_rows(spark):
    df = e.entry(spark)
    assert len(df.collect()) > 0


def test_every_oracle_has_a_query():
    qs, oracles = e.queries(), e.oracle_sql()
    # round 3: EVERY entry carries a DuckDB oracle — zero rows-only.
    # A new entry without an oracle (or an oracle whose query was
    # renamed away) fails here before it silently weakens the gate.
    assert set(oracles) == set(qs)
    # Driver gate budget: the first 50 registered entries are exactly
    # DRIVER_GATE_PRIORITY (round-6 rotation: the two fixed r05
    # failures + 48 never-driver-checked entries; ledger in
    # COVERAGE.md; dicts preserve registration order). Everything else
    # still gets hash-verified by tools/local_verify.py.
    assert len(qs) >= 50
    assert list(qs)[:50] == e.DRIVER_GATE_PRIORITY
    assert len(e.DRIVER_GATE_PRIORITY) == 50


def test_oracles_parse_in_duckdb():
    import duckdb

    con = duckdb.connect()
    sf = "/root/testdata/sf0.001"
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    for name, sql in e.oracle_sql().items():
        con.execute(sql).fetchall()  # raises on dialect errors


def test_gate_rotation_is_oldest_first_and_debt_free():
    """r08/r09 VERDICT task 1: the committed DRIVER_GATE_PRIORITY must be
    the deterministic schedule — this round's optimizer-touched entries
    (GATE_PRIORITY_HEAD) first, then oldest-first — computed from the
    CORRECTNESS files that existed when it was built (rounds <
    GATE_ROTATION_ROUND), and the staleness audit itself must pass — so a
    round that forgets to rotate goes red in `pytest tests/` instead of
    waiting for the judge."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
    from gate_lint import compute_rotation, rotation_audit

    names = list(e.queries())
    expected = compute_rotation(
        names, upto_round=e.GATE_ROTATION_ROUND, head=e.GATE_PRIORITY_HEAD
    )
    assert e.DRIVER_GATE_PRIORITY == expected
    assert rotation_audit() == 0
    # every head entry must be a real registry name (a typo would silently
    # shrink the verified-touched surface)
    assert set(e.GATE_PRIORITY_HEAD) <= set(names)
