"""Incremental maintenance + integrity operators (extension scope;
the reference recomputes from scratch each run — these are the two
patterns a 100 TB deployment adds first).

* Incremental aggregate maintenance (materialized-view delta
  maintenance): keep a (group, day)-grain PARTIAL-aggregate state
  table; a new day of facts contributes one aggregation over ITS OWN
  slice only, and report-grain totals come from combining partials —
  history is never rescanned. Works for any commutative-associative
  aggregate (count/sum/min/max here; avg derives as sum/count at
  report time, exact count-distinct is NOT mergeable — that's what
  the HLL rollup operator (operators/extended.q_hll_rollup) is for).
  The gate entry PROVES the algebra: an incrementally-maintained
  state (history scan + day-slice scan, merged) must hash-match a
  full-table GROUP BY oracle.

* Order-insensitive table fingerprint: one number pair per table —
  SUM and XOR of a per-row md5-derived hash — that two environments
  can compare to validate a replication/migration without sorting or
  co-locating anything. Map-only + one 1-row agg per table; XOR is
  overflow-free and SUM stays < 2^63 for < 2^32 rows with the 31-bit
  row hash (beyond that, tree the sum: per-bucket sums mod p, then
  combine — same trick as the salted agg). Double columns are
  excluded from the hashed projection by contract: float-to-string
  rendering is not cross-engine canonical; integer/string/date
  columns render identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from propensity_spark.io import load_table

# Gate cutoff: the last event day arrives as "the new batch"; state
# covers everything before it. Fixture events span 2024-01-01..30.
INCR_CUTOFF = "2024-01-28"


def partial_agg_state(
    facts: DataFrame, keys: list[str], day_col: str, value_col: str
) -> DataFrame:
    """(keys, day)-grain partial aggregates — the mergeable state a
    materialized view stores per partition."""
    return facts.groupBy(*keys, day_col).agg(
        F.count(F.lit(1)).alias("p_cnt"),
        F.sum(value_col).alias("p_sum"),
        F.min(value_col).alias("p_min"),
        F.max(value_col).alias("p_max"),
    )


def combine_agg_state(state: DataFrame, keys: list[str]) -> DataFrame:
    """Report-grain totals from partials only: count/sum re-sum,
    min/max re-extremize, avg derives. The only scan is the (small)
    state table — never the facts."""
    return state.groupBy(*keys).agg(
        F.sum("p_cnt").alias("n_events"),
        F.expr("round(sum(p_sum) + 1e-9, 6)").alias("total_value"),
        F.expr("round(min(p_min) + 1e-9, 6)").alias("min_value"),
        F.expr("round(max(p_max) + 1e-9, 6)").alias("max_value"),
        F.expr("round(sum(p_sum) / sum(p_cnt) + 1e-9, 6)").alias("avg_value"),
    )


def q_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-maintain per-event-type aggregates: state from the
    history slice, one partial agg over ONLY the new slice, union,
    combine. The slices filter on raw `ts` — a pushable predicate
    that reaches the parquet scan (PushedFilters) — NOT on the
    derived day column, which would defeat both row-group skipping
    here and partition pruning on a day-partitioned 100 TB fact
    table. The oracle is a full-table GROUP BY — equality proves the
    merge algebra."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.to_date("ts")
    )
    cut = F.lit(INCR_CUTOFF + " 00:00:00").cast("timestamp")
    hist = ev.where(F.col("ts") < cut)
    batch = ev.where(F.col("ts") >= cut)
    state = partial_agg_state(hist, ["event_type"], "day", "value")
    delta = partial_agg_state(batch, ["event_type"], "day", "value")
    return combine_agg_state(state.unionByName(delta), ["event_type"])


INCREMENTAL_AGG_SQL = """
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value) + 1e-9, 6) AS total_value,
           round(min(value) + 1e-9, 6) AS min_value,
           round(max(value) + 1e-9, 6) AS max_value,
           round(sum(value) / count(*) + 1e-9, 6) AS avg_value
    FROM events
    GROUP BY event_type
"""


def table_fingerprint(
    df: DataFrame, cols: list[str], table_name: str
) -> DataFrame:
    """One-row fingerprint (table_name, n_rows, hash_sum, hash_xor)
    over the named columns. Row hash = first 8 md5 hex chars of the
    unit-separator-joined string projection, mod 2^31-1 — the same
    md5 idiom as split_by_hash, so both engines agree byte-for-byte.
    NULLs render as a sentinel so (NULL, 'a') != ('a', NULL)."""
    joined = F.concat_ws(
        "\x1f", *[F.coalesce(F.col(c).cast("string"), F.lit("\x00")) for c in cols]
    )
    h = (
        "cast(conv(substr(md5(cast(__joined as binary)), 1, 8), 16, 10) as bigint)"
        " % 2147483647"
    )
    return (
        df.select(joined.alias("__joined"))
        .select(F.expr(h).alias("__h"))
        .agg(
            F.lit(table_name).alias("table_name"),
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("__h").alias("hash_sum"),
            F.expr("bit_xor(__h)").alias("hash_xor"),
        )
    )


# (table, hashed columns) — key/string/date columns only (doubles are
# excluded by the cross-engine-rendering contract in the module doc).
FINGERPRINT_SPECS = [
    ("orders", ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderdate"]),
    ("customer", ["c_custkey", "c_name", "c_nationkey", "c_mktsegment"]),
    ("part", ["p_partkey", "p_name", "p_brand"]),
]


def q_table_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    outs = [
        table_fingerprint(load_table(spark, sf_dir, t), cols, t)
        for t, cols in FINGERPRINT_SPECS
    ]
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def _fingerprint_sql() -> str:
    parts = []
    for t, cols in FINGERPRINT_SPECS:
        joined = " || chr(31) || ".join(
            f"coalesce(CAST({c} AS VARCHAR), chr(0))" for c in cols
        )
        parts.append(f"""
    SELECT '{t}' AS table_name,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(h) AS BIGINT) AS hash_sum,
           CAST(bit_xor(h) AS BIGINT) AS hash_xor
    FROM (
        SELECT ('0x' || substr(md5({joined}), 1, 8))::BIGINT % 2147483647 AS h
        FROM {t}
    )""")
    return "\nUNION ALL\n".join(parts)


FINGERPRINT_SQL = _fingerprint_sql()
# Both register in operators/overflow.py (post-priority tail).


# Incremental JOIN-view maintenance: cutoff splits orders into the
# materialized history F and the newly-arrived batch dF; every 10th
# customer's market segment "changed" since the view was built (dD).
IVM_CUTOFF = "1995-01-01"
IVM_UPDATED_SEGMENT = "UPDATED"


def incremental_join_view(
    mv: DataFrame,
    new_view_rows: DataFrame,
    rederived_rows: DataFrame,
    updated_keys: DataFrame,
    key: str,
) -> DataFrame:
    """Delta-maintain a fact ⋈ dim materialized view under dim-row
    UPDATES and fact APPENDS without re-joining the full fact table:

        MV' = (MV ∖ rows joining an updated dim key)   -- retract
            ∪ (F_old ⋈ dD)                             -- re-derive
            ∪ (dF ⋈ D_final)                           -- append

    The caller supplies the two delta branches already in VIEW space
    (same projection as MV); this function owns the retract-union
    algebra. Cost shape at 100 TB: one scan of the already-
    materialized MV with a BROADCAST anti-join on the updated keys
    (`updated_keys` is the bounded CDC batch), the old facts joined
    only to the broadcast dim delta (Catalyst pushes the key filter
    into the fact scan where stats allow), and the new batch joined to
    the dim — the big F ⋈ D re-join never happens. The gate entry
    proves the algebra: the maintained view hash-matches a
    from-scratch oracle join of the final state."""
    kept = mv.join(F.broadcast(updated_keys), key, "left_anti")
    # the USING-column anti-join hoists `key` to the front of the
    # schema; restore MV's column order so the maintained view is a
    # drop-in positional replacement, not just name-compatible
    return (
        kept.select(mv.columns)
        .unionByName(rederived_rows.select(mv.columns))
        .unionByName(new_view_rows.select(mv.columns))
    )


def q_incremental_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    cutoff = F.lit(IVM_CUTOFF).cast("date")
    is_updated = F.col("c_custkey") % 10 == 0
    dim0 = customer.select("c_custkey", "c_mktsegment")  # as of MV build
    dim_final = customer.select(
        "c_custkey",
        F.when(is_updated, F.lit(IVM_UPDATED_SEGMENT))
        .otherwise(F.col("c_mktsegment"))
        .alias("c_mktsegment"),
    )
    dim_updates = dim_final.where(F.col("c_custkey") % 10 == 0)

    def proj(facts: DataFrame, dim: DataFrame) -> DataFrame:
        return facts.join(dim, facts.o_custkey == dim.c_custkey).select(
            "o_orderkey",
            "o_custkey",
            "o_totalprice",
            F.to_date("o_orderdate").alias("o_day"),
            "c_mktsegment",
        )

    old_facts = orders.where(F.to_date("o_orderdate") < cutoff)
    new_facts = orders.where(F.to_date("o_orderdate") >= cutoff)
    mv = proj(old_facts, dim0)  # the "materialized" pre-update view
    return incremental_join_view(
        mv,
        new_view_rows=proj(new_facts, dim_final),
        rederived_rows=proj(old_facts, F.broadcast(dim_updates)),
        updated_keys=dim_updates.select(
            F.col("c_custkey").alias("o_custkey")
        ),
        key="o_custkey",
    )


INCREMENTAL_JOIN_SQL = f"""
    SELECT o_orderkey, o_custkey, o_totalprice,
           CAST(o_orderdate AS DATE) AS o_day,
           CASE WHEN c_custkey % 10 = 0 THEN '{IVM_UPDATED_SEGMENT}'
                ELSE c_mktsegment END AS c_mktsegment
    FROM orders JOIN customer ON o_custkey = c_custkey
"""


# --- gate registration (moved from the retired operators/overflow.py shim) ---
# Entries past the driver's 50-row budget register here, next to their
# operators; __spark_entry__ merges every module's QUERIES/ORACLES and
# DRIVER_GATE_PRIORITY decides what the driver sees.
QUERIES = {
    "incremental_agg": q_incremental_agg,
    "table_fingerprint_suite": q_table_fingerprint,
    "incremental_join": q_incremental_join,
}

ORACLES = {
    "incremental_agg": INCREMENTAL_AGG_SQL,
    "table_fingerprint_suite": FINGERPRINT_SQL,
    "incremental_join": INCREMENTAL_JOIN_SQL,
}
