"""Time-series operators over the fixture tables: calendar gap-fill
with forward-fill imputation, and last-touch marketing attribution
(extension scope; the reference's time handling stops at BETWEEN
predicates, SURVEY.md §2.5 — no spine/interpolation anywhere).

Both are exact relational folds designed around ONE keyed shuffle:

* Gap-fill — a daily revenue series per brand is joined onto a dense
  date spine (brands x every day in the data's span) and missing days
  are imputed by carrying the last observed value forward. The spine
  is generated map-side (`sequence` + `explode` of integer offsets
  against a broadcast 1-row bounds aggregate — no driver collect, no
  interval typing). The forward fill is `last(ignorenulls)` over a
  brand-keyed window, so the whole query costs the daily aggregation
  shuffle plus one brand-keyed window Exchange. At 100 TB the spine is
  |brands| x |days| — tiny relative to the fact — and the window state
  is one value per brand.

* Last-touch attribution — for every purchase event, the most recent
  strictly-prior click by the same user, the ad-tech query usually
  written as an as-of join. Expressed as a running `max` over the
  user's click timestamps with a `ROWS ... 1 PRECEDING` frame: one
  user-keyed window Exchange, no join, no per-key fan-out (same reason
  the as-of join avoids it, operators/extended.py:22-42).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from propensity_spark.io import load_table


def gapfill_ffill(
    daily: DataFrame, key_col: str, day_col: str, value_col: str
) -> DataFrame:
    """Densify a (key, day, value) series onto every day of its global
    span and forward-fill missing values per key. Adds `is_gap` (1 on
    imputed rows) and `filled_{value_col}`; original value stays NULL
    on gap rows so callers can distinguish observed from imputed."""
    bounds = daily.agg(
        F.min(day_col).alias("__d0"), F.max(day_col).alias("__d1")
    )
    keys = daily.select(key_col).distinct()
    spine = (
        keys.crossJoin(F.broadcast(bounds))
        .select(
            key_col,
            F.explode(
                F.sequence(F.lit(0), F.datediff("__d1", "__d0"))
            ).alias("__off"),
            "__d0",
        )
        .select(key_col, F.date_add("__d0", F.col("__off")).alias(day_col))
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy(day_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(daily, [key_col, day_col], "left")
        .withColumn(
            f"filled_{value_col}", F.last(value_col, ignorenulls=True).over(w)
        )
        .withColumn(
            "is_gap", F.when(F.col(value_col).isNull(), 1).otherwise(0)
        )
    )


def q_gapfill_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily revenue per brand, gap-filled and forward-filled over the
    full shipdate span. Plan: broadcast dim join -> (brand, day) hash
    agg -> spine left join -> one brand-keyed window."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    daily = (
        lineitem.join(F.broadcast(part), lineitem.l_partkey == part.p_partkey)
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.to_date("l_shipdate").alias("day"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
                + 1e-6,
                2,
            ).alias("revenue")
        )
    )
    out = gapfill_ffill(daily, "brand", "day", "revenue")
    return out.select(
        "brand", "day", "revenue", "filled_revenue", "is_gap"
    )


GAPFILL_SQL = """
    WITH daily AS (
        SELECT p_brand AS brand, CAST(l_shipdate AS DATE) AS day,
               round(sum(l_extendedprice * (1 - l_discount)) + 1e-6, 2)
                   AS revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY 1, 2
    ),
    bounds AS (SELECT min(day) AS d0, max(day) AS d1 FROM daily),
    spine AS (
        SELECT k.brand, b.d0 + CAST(o.off AS INT) AS day
        FROM (SELECT DISTINCT brand FROM daily) k
        CROSS JOIN bounds b
        CROSS JOIN (
            SELECT unnest(generate_series(
                0, (SELECT date_diff('day', d0, d1) FROM bounds))) AS off
        ) o
    ),
    joined AS (
        SELECT s.brand, s.day, d.revenue,
               count(d.revenue) OVER (
                   PARTITION BY s.brand ORDER BY s.day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS grp
        FROM spine s LEFT JOIN daily d
          ON s.brand = d.brand AND s.day = d.day
    )
    SELECT brand, day, revenue,
           max(revenue) OVER (PARTITION BY brand, grp) AS filled_revenue,
           CASE WHEN revenue IS NULL THEN 1 ELSE 0 END AS is_gap
    FROM joined
"""


def q_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every purchase event attributed to the user's most recent
    strictly-prior click. `max(click_t)` over a `1 PRECEDING` frame is
    the latest prior click because the partition is time-ordered; the
    (t, event_id) tiebreak makes same-timestamp ordering deterministic
    in both engines. One user-keyed Exchange, zero joins."""
    events = load_table(spark, sf_dir, "events")
    ev = events.select(
        "event_id",
        "user_id",
        "event_type",
        F.unix_timestamp("ts").alias("t"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("t", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    attributed = ev.withColumn(
        "last_click_t",
        F.max(
            F.when(F.col("event_type") == "click", F.col("t"))
        ).over(w),
    )
    return attributed.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("t").alias("purchase_t"),
        "last_click_t",
        (F.col("t") - F.col("last_click_t")).alias("secs_to_convert"),
        F.when(F.col("last_click_t").isNotNull(), 1)
        .otherwise(0)
        .alias("attributed"),
    )


ATTRIBUTION_SQL = """
    WITH ev AS (
        SELECT event_id, user_id, event_type,
               CAST(floor(epoch(ts)) AS BIGINT) AS t
        FROM events
    ),
    marked AS (
        SELECT *,
               max(CASE WHEN event_type = 'click' THEN t END) OVER (
                   PARTITION BY user_id ORDER BY t, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ) AS last_click_t
        FROM ev
    )
    SELECT event_id AS purchase_id, user_id, t AS purchase_t,
           last_click_t, t - last_click_t AS secs_to_convert,
           CASE WHEN last_click_t IS NOT NULL THEN 1 ELSE 0 END AS attributed
    FROM marked WHERE event_type = 'purchase'
"""
MA_DAYS = 7


def q_moving_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day moving sum/average of daily brand revenue using a
    RANGE frame keyed on the day number — the sparse-aware time window:
    unlike a ROWS frame, missing days shrink the window's contents
    (exactly 7 calendar days, not 7 observations), so no spine join is
    needed (contrast gapfill_ffill above, which densifies first). One
    brand-keyed window Exchange on top of the daily aggregation; the
    frame is bounded, so window state is O(7) rows per key."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    daily = (
        lineitem.join(F.broadcast(part), lineitem.l_partkey == part.p_partkey)
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.datediff(
                F.to_date("l_shipdate"), F.lit("1992-01-01").cast("date")
            ).alias("day_num"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
                + 1e-6,
                2,
            ).alias("revenue")
        )
    )
    w = (
        Window.partitionBy("brand")
        .orderBy("day_num")
        .rangeBetween(-(MA_DAYS - 1), 0)
    )
    return daily.select(
        "brand",
        "day_num",
        "revenue",
        F.count(F.lit(1)).over(w).alias("days_in_window"),
        F.round(F.sum("revenue").over(w) + 1e-6, 2).alias("sum_7d"),
        F.round(
            F.sum("revenue").over(w) / F.count(F.lit(1)).over(w) + 1e-9, 4
        ).alias("avg_7d"),
    )


MOVING_AVG_SQL = f"""
    WITH daily AS (
        SELECT p_brand AS brand,
               date_diff('day', DATE '1992-01-01', CAST(l_shipdate AS DATE))
                   AS day_num,
               round(sum(l_extendedprice * (1 - l_discount)) + 1e-6, 2)
                   AS revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY 1, 2
    )
    SELECT brand, CAST(day_num AS INT) AS day_num, revenue,
           CAST(count(*) OVER w AS BIGINT) AS days_in_window,
           round(sum(revenue) OVER w + 1e-6, 2) AS sum_7d,
           round(sum(revenue) OVER w / count(*) OVER w + 1e-9, 4) AS avg_7d
    FROM daily
    WINDOW w AS (PARTITION BY brand ORDER BY day_num
                 RANGE BETWEEN {MA_DAYS - 1} PRECEDING AND CURRENT ROW)
"""
# All register in operators/overflow.py (post-budget).
