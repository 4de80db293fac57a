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
    # Driver gate budget: exactly 50 entries BEFORE the overflow module
    # (operators/overflow.py registers post-budget entries last so the
    # driver-checked 50 stay stable; dicts preserve registration order).
    assert len(qs) >= 50
    from propensity_spark.operators import overflow

    assert list(qs)[50:] == list(overflow.QUERIES)


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
