"""The gate tooling is itself load-bearing (the r06 lesson: a
canonicalizer strictly weaker than the driver's shipped two hash-red
rounds), so its behavior is pinned here — pure-python, no Spark.
"""

from __future__ import annotations

import math

from tools.gate_lint import count_negzero
from tools.local_verify import canon, table_hash


def test_canon_distinguishes_signed_zero():
    """The driver renders floats at fixed precision, where -0.000000 !=
    0.000000 — canon() must keep the distinction (r06: collapsing both
    to "0" made the local gate blind to the driver's failure class)."""
    assert canon(0.0) == "0"
    assert canon(-0.0) == "-0"
    assert canon(0.0) != canon(-0.0)


def test_canon_integer_collapse_and_precision():
    assert canon(2.0) == "2"
    assert canon(-2.0) == "-2"
    assert canon(2.5) == "2.500000"
    assert canon(float("nan")) == "NaN"
    assert canon(None) == "NULL"
    assert canon(True) == "1"
    # huge exact doubles stay in the %.6f branch (int() would lose
    # nothing here, but the 1e15 cutoff guards float->int surprises)
    assert canon(1e16) == f"{1e16:.6f}"


def test_table_hash_order_insensitive_but_zero_sign_sensitive():
    cols = ["a", "b"]
    rows1 = [(1, 0.0), (2, 3.5)]
    rows2 = [(2, 3.5), (1, 0.0)]  # row order must not matter
    assert table_hash(cols, rows1) == table_hash(cols, rows2)
    rows3 = [(1, -0.0), (2, 3.5)]  # zero sign MUST matter
    assert table_hash(cols, rows1) != table_hash(cols, rows3)
    # column order must not matter either (sorted by name)
    assert table_hash(["b", "a"], [(0.0, 1), (3.5, 2)]) == table_hash(
        cols, rows1
    )


def test_count_negzero_finds_only_negative_zero_floats():
    rows = [
        (1, 0.0, -0.0),
        (2, -0.0, 1.5),
        (3, None, -0.0),
        (4, 0, False),  # ints/bools are not float cells
    ]
    hits = count_negzero(rows)
    assert hits == {1: 1, 2: 2}


def test_negzero_normalizer_identity():
    """`x + 0.0` is the prescribed fix (GATE_CONTRACT rule 7): a no-op
    for every float except -0.0 -> +0.0."""
    assert math.copysign(1.0, -0.0 + 0.0) > 0
    for v in (0.0, -1.25, 7.5, -0.005, 1e300, -1e-300):
        assert v + 0.0 == v and math.copysign(1.0, v + 0.0) == math.copysign(
            1.0, v
        )


def test_duck_round_mirrors_duckdb_exactly():
    """_duck_round (vector/similarity.py) must reproduce DuckDB's
    ROUND-on-DOUBLE bit-for-bit — including one-ulp-below-half values
    where floor(y + 0.5) diverges (the +0.5 addition rounds up) and
    exact .5 products (half AWAY from zero, unlike Python's half-even).
    This is what makes power_iteration's un-nudged 9dp normalize safe."""
    import random

    import duckdb

    from propensity_spark.vector.similarity import _duck_round

    con = duckdb.connect()
    random.seed(11)
    vals = [random.uniform(-1, 1) for _ in range(5000)]
    # adversarial: near 9dp half boundaries, both signs, +- k ulp
    vals += [((2 * k + 1) * 5e-10) * (1 + e) for k in range(300)
             for e in (0.0, 1e-16, -1e-16, 3e-16)]
    vals += [-v for v in vals[-1200:]]
    vals += [4.999999999999999e-10, -4.999999999999999e-10,
             0.5 / 1e9, -0.5 / 1e9, 2.5 / 1e9, -2.5 / 1e9, 0.0]
    duck = [r[0] for r in con.execute(
        "SELECT round(x, 9) FROM (SELECT unnest(?::DOUBLE[]) AS x)", [vals]
    ).fetchall()]
    import math
    for v, dr in zip(vals, duck):
        mv = _duck_round(v, 9)
        assert mv == dr and math.copysign(1.0, mv) == math.copysign(1.0, dr), (
            repr(v), repr(mv), repr(dr))


def test_verify_sf1_special_paths_cover_registry_entries():
    """tools/verify_sf1.py is the one-command sf1 gate: its special-path
    list must name real registry entries (drift = an entry silently
    losing its only feasible sf1 verifier), and the plain set plus the
    special set must cover the registry exactly."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
    import __spark_entry__ as e
    from verify_sf1 import SPECIAL

    names = set(e.queries())
    assert set(SPECIAL) <= names
    for build in SPECIAL.values():
        argv = build("/tmp/x")
        assert Path(argv[1]).exists()  # the verifier script itself


def test_bigresult_canon_escapes_separator_and_null():
    """r08 ADVICE: the checksum's canonical line must be injective —
    '|' in values, literal 'NULL'/'\\N' strings, and SQL NULL all encode
    distinctly."""
    import sys
    from pathlib import Path

    import duckdb

    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
    from verify_bigresult import _checksum_sql

    con = duckdb.connect()
    con.execute("CREATE TABLE t(a VARCHAR, b VARCHAR)")
    con.execute(
        r"INSERT INTO t VALUES ('x|y','z'), ('x','y|z'), (NULL,'\N'), "
        r"('\N',NULL), ('NULL','q')"
    )
    sql = _checksum_sql(["a", "b"], "t")
    inner = sql.split("FROM (", 1)[1].rsplit(")", 1)[0]
    assert con.execute(f"SELECT count(DISTINCT line) FROM ({inner})").fetchone()[0] == 5
