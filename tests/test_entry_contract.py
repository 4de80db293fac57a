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
