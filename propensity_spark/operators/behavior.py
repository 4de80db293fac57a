"""Behavioral analytics over the event stream: funnel conversion and
cohort retention — the two queries every product/growth deployment
runs beside a propensity pipeline (extension scope; the reference
stops at per-category models).

Both are exact, oracle-checked relational folds:

* Funnel — strictly-ordered view -> click -> purchase per user
  (each stage's timestamp must be AFTER the previous stage's), the
  classic "earliest qualifying event" chain. Three user-grain
  conditional aggregates; every join is user-keyed on frames already
  at user grain, so at 100 TB the whole funnel is one shuffle of the
  events at user grain + tiny joins.

* Cohort retention — users bucketed by first-activity week, activity
  matrix (cohort_week x weeks_since) with retention rate against the
  cohort size. Two aggregates over one scan + a broadcast-sized
  cohort-size join (|cohorts| rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from propensity_spark.io import load_table

FUNNEL_STAGES = ("view", "click", "purchase")
COHORT_EPOCH = "2024-01-01"  # week-0 anchor for the fixture's range


def q_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    ev = events.select(
        "user_id", "event_type", F.unix_timestamp("ts").alias("t")
    )
    v = ev.where(F.col("event_type") == FUNNEL_STAGES[0]).groupBy("user_id").agg(
        F.min("t").alias("t_view")
    )
    c = (
        ev.where(F.col("event_type") == FUNNEL_STAGES[1])
        .join(v, "user_id")
        .where(F.col("t") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("t").alias("t_click"))
    )
    p = (
        ev.where(F.col("event_type") == FUNNEL_STAGES[2])
        .join(c, "user_id")
        .where(F.col("t") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("t").alias("t_purchase"))
    )
    counts = (
        v.agg(F.count(F.lit(1)).alias("n_view"))
        .crossJoin(F.broadcast(c.agg(F.count(F.lit(1)).alias("n_click"))))
        .crossJoin(F.broadcast(p.agg(F.count(F.lit(1)).alias("n_purchase"))))
    )
    return counts.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("view").alias("stage"),
                    F.col("n_view").alias("n_users"),
                    F.lit(1.0).alias("conversion"),
                ),
                F.struct(
                    F.lit("click").alias("stage"),
                    F.col("n_click").alias("n_users"),
                    F.round(F.col("n_click") / F.col("n_view") + 1e-9, 6).alias(
                        "conversion"
                    ),
                ),
                F.struct(
                    F.lit("purchase").alias("stage"),
                    F.col("n_purchase").alias("n_users"),
                    F.round(
                        F.col("n_purchase") / F.col("n_click") + 1e-9, 6
                    ).alias("conversion"),
                ),
            )
        ).alias("s")
    ).select("s.*")


FUNNEL_SQL = f"""
    WITH ev AS (
        SELECT user_id, event_type, CAST(floor(epoch(ts)) AS BIGINT) AS t
        FROM events
    ),
    v AS (SELECT user_id, min(t) AS t_view FROM ev
          WHERE event_type = '{FUNNEL_STAGES[0]}' GROUP BY user_id),
    c AS (SELECT e.user_id, min(e.t) AS t_click
          FROM ev e JOIN v ON e.user_id = v.user_id
          WHERE e.event_type = '{FUNNEL_STAGES[1]}' AND e.t > v.t_view
          GROUP BY e.user_id),
    p AS (SELECT e.user_id, min(e.t) AS t_purchase
          FROM ev e JOIN c ON e.user_id = c.user_id
          WHERE e.event_type = '{FUNNEL_STAGES[2]}' AND e.t > c.t_click
          GROUP BY e.user_id),
    n AS (SELECT (SELECT count(*) FROM v) AS n_view,
                 (SELECT count(*) FROM c) AS n_click,
                 (SELECT count(*) FROM p) AS n_purchase)
    SELECT 'view' AS stage, CAST(n_view AS BIGINT) AS n_users,
           1.0 AS conversion FROM n
    UNION ALL
    SELECT 'click', n_click, round(n_click * 1.0 / n_view + 1e-9, 6) FROM n
    UNION ALL
    SELECT 'purchase', n_purchase,
           round(n_purchase * 1.0 / n_click + 1e-9, 6) FROM n
"""


def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    weeks = events.select(
        "user_id",
        F.floor(
            F.datediff(F.to_date("ts"), F.lit(COHORT_EPOCH).cast("date")) / 7
        ).alias("week"),
    )
    cohort = weeks.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    active = weeks.distinct()
    sizes = cohort.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    return (
        active.join(cohort, "user_id")
        .groupBy("cohort_week", (F.col("week") - F.col("cohort_week")).alias("weeks_since"))
        .agg(F.count(F.lit(1)).alias("n_active"))
        .join(F.broadcast(sizes), "cohort_week")
        .select(
            F.col("cohort_week").cast("int").alias("cohort_week"),
            F.col("weeks_since").cast("int").alias("weeks_since"),
            "n_active",
            F.round(F.col("n_active") / F.col("cohort_size") + 1e-9, 6).alias(
                "retention"
            ),
        )
    )


def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation (recency / frequency / monetary) of customers
    from their order history — the classic CRM scoring the reference's
    propensity models would be stacked on. One customer-grain agg over
    orders, then three `ntile(5)` windows over the 1-row-per-customer
    frame; the dataset max date comes from a broadcast 1-row aggregate
    (no driver collect). Score 5 = best (most recent / most frequent /
    highest spend); the custkey tiebreak makes every ntile ordering
    total, so both engines bucket identically.

    Scale note: an unpartitioned `ntile` sorts the whole frame on one
    reducer — fine here because the frame is customer-grain (orders of
    magnitude smaller than the fact it aggregates), but at 10^9+
    customers the scale path is `percentile_approx` quintile boundaries
    (1-row broadcast) + a map-side CASE bucket, trading exact equal-size
    buckets for a shuffle-free plan."""
    orders = load_table(spark, sf_dir, "orders")
    maxd = orders.agg(F.max(F.to_date("o_orderdate")).alias("d_max"))
    per_cust = (
        orders.groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.max(F.to_date("o_orderdate")).alias("last_day"),
            F.count(F.lit(1)).alias("frequency"),
            F.round(F.sum("o_totalprice") + 1e-6, 2).alias("monetary"),
        )
        .crossJoin(F.broadcast(maxd))
        .select(
            "custkey",
            F.datediff("d_max", "last_day").alias("recency_days"),
            "frequency",
            "monetary",
        )
    )
    r = F.ntile(5).over(
        Window.orderBy(F.desc("recency_days"), F.asc("custkey"))
    )
    f = F.ntile(5).over(Window.orderBy(F.asc("frequency"), F.asc("custkey")))
    m = F.ntile(5).over(Window.orderBy(F.asc("monetary"), F.asc("custkey")))
    return per_cust.select(
        "custkey",
        "recency_days",
        "frequency",
        "monetary",
        r.alias("r_score"),
        f.alias("f_score"),
        m.alias("m_score"),
        (r * 100 + f * 10 + m).alias("rfm"),
    )


RFM_SQL = """
    WITH per_cust AS (
        SELECT o_custkey AS custkey,
               date_diff('day', max(CAST(o_orderdate AS DATE)),
                         (SELECT max(CAST(o_orderdate AS DATE)) FROM orders))
                   AS recency_days,
               CAST(count(*) AS BIGINT) AS frequency,
               round(sum(o_totalprice) + 1e-6, 2) AS monetary
        FROM orders GROUP BY o_custkey
    )
    SELECT custkey, CAST(recency_days AS INT) AS recency_days,
           frequency, monetary,
           CAST(ntile(5) OVER (ORDER BY recency_days DESC, custkey) AS INT)
               AS r_score,
           CAST(ntile(5) OVER (ORDER BY frequency, custkey) AS INT)
               AS f_score,
           CAST(ntile(5) OVER (ORDER BY monetary, custkey) AS INT)
               AS m_score,
           CAST(ntile(5) OVER (ORDER BY recency_days DESC, custkey) * 100
                + ntile(5) OVER (ORDER BY frequency, custkey) * 10
                + ntile(5) OVER (ORDER BY monetary, custkey) AS INT) AS rfm
    FROM per_cust
"""


SESSION_GAP_S = 1800
TOP_PATHS = 20


def q_path_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top clickstream paths: events sessionized by a 30-minute
    inactivity gap (gaps-and-islands: lag + running sum of
    session-start flags — the batch twin of the TRUE streaming session
    window in streaming/windows.py), each session folded to its
    ordered event-type string, then the 20 most frequent paths. Two
    user-keyed windows + one session agg + a tiny path agg — the fact
    is shuffled once on user, and the path ordering inside
    `array_sort(struct(t, event_id, ...))` matches the oracle's
    `ORDER BY t, event_id` exactly, so the fold is deterministic."""
    events = load_table(spark, sf_dir, "events")
    ev = events.select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_timestamp("ts").alias("t"),
    )
    w = Window.partitionBy("user_id").orderBy("t", "event_id")
    sess = (
        ev.withColumn("__prev", F.lag("t").over(w))
        .withColumn(
            "__new",
            (
                F.col("__prev").isNull()
                | (F.col("t") - F.col("__prev") > SESSION_GAP_S)
            ).cast("int"),
        )
        .withColumn("session_idx", F.sum("__new").over(w))
    )
    paths = sess.groupBy("user_id", "session_idx").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("t", "event_id", "event_type"))
                ),
                lambda x: x["event_type"],
            ),
            ">",
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), F.asc("path"))
        .limit(TOP_PATHS)
        .select(
            F.row_number()
            .over(Window.orderBy(F.desc("n_sessions"), F.asc("path")))
            .cast("int")
            .alias("rank"),
            "path",
            "n_sessions",
        )
    )


PATH_SQL = f"""
    WITH ev AS (
        SELECT user_id, event_id, event_type,
               CAST(floor(epoch(ts)) AS BIGINT) AS t
        FROM events
    ),
    flagged AS (
        SELECT *,
               CASE WHEN lag(t) OVER w IS NULL
                         OR t - lag(t) OVER w > {SESSION_GAP_S}
                    THEN 1 ELSE 0 END AS is_new
        FROM ev
        WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)
    ),
    sess AS (
        SELECT *, sum(is_new) OVER (
            PARTITION BY user_id ORDER BY t, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
        ) AS session_idx
        FROM flagged
    ),
    paths AS (
        SELECT user_id, session_idx,
               string_agg(event_type, '>' ORDER BY t, event_id) AS path
        FROM sess GROUP BY user_id, session_idx
    ),
    counted AS (
        SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
        FROM paths GROUP BY path
        ORDER BY n_sessions DESC, path LIMIT {TOP_PATHS}
    )
    SELECT CAST(row_number() OVER (ORDER BY n_sessions DESC, path) AS INT)
               AS rank,
           path, n_sessions
    FROM counted
"""


def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of the clickstream: for
    every consecutive event pair within a user's timeline, the count
    and row-normalized probability of `from_type -> to_type`. The
    sequence-mining primitive behind next-action prediction and
    anomalous-flow detection, complementing `q_path_analysis` (whole
    paths) with the memoryless pairwise view.

    Plan: ONE user-keyed window Exchange produces the `lead` pairs
    (deterministic order: ts then event_id tie-break), then a
    |event_types|^2-bounded aggregation; the row-marginal
    normalization is a window over that tiny frame — O(cells), never
    re-touching the fact. At 100 TB this is exactly the path-analysis
    shuffle profile: one shuffle of the events fact by user, and
    everything after is bounded by the type-domain product."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        events.select("user_id", "ts", "event_id", "event_type")
        .withColumn("to_type", F.lead("event_type").over(w))
        .where(F.col("to_type").isNotNull())
    )
    counts = pairs.groupBy(
        F.col("event_type").alias("from_type"), "to_type"
    ).agg(F.count(F.lit(1)).alias("n"))
    marg = Window.partitionBy("from_type")
    return counts.select(
        "from_type",
        "to_type",
        "n",
        F.round(
            F.col("n").cast("double") / F.sum("n").over(marg) + 1e-9, 6
        ).alias("prob"),
    )


TRANSITIONS_SQL = """
    WITH pairs AS (
        SELECT event_type AS from_type,
               lead(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS to_type
        FROM events
    ),
    counts AS (
        SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
        FROM pairs WHERE to_type IS NOT NULL
        GROUP BY 1, 2
    )
    SELECT from_type, to_type, n,
           round(CAST(n AS DOUBLE)
                 / CAST(sum(n) OVER (PARTITION BY from_type) AS DOUBLE)
                 + 1e-9, 6) AS prob
    FROM counts
"""


COHORT_SQL = f"""
    WITH weeks AS (
        SELECT user_id,
               CAST(floor(date_diff('day', DATE '{COHORT_EPOCH}',
                                    CAST(ts AS DATE)) / 7.0) AS BIGINT) AS week
        FROM events
    ),
    cohort AS (SELECT user_id, min(week) AS cohort_week FROM weeks GROUP BY user_id),
    active AS (SELECT DISTINCT user_id, week FROM weeks),
    sizes AS (SELECT cohort_week, CAST(count(*) AS BIGINT) AS cohort_size
              FROM cohort GROUP BY cohort_week)
    SELECT CAST(c.cohort_week AS INT) AS cohort_week,
           CAST(a.week - c.cohort_week AS INT) AS weeks_since,
           CAST(count(*) AS BIGINT) AS n_active,
           round(count(*) * 1.0 / any_value(s.cohort_size) + 1e-9, 6) AS retention
    FROM active a
    JOIN cohort c ON a.user_id = c.user_id
    JOIN sizes s ON s.cohort_week = c.cohort_week
    GROUP BY c.cohort_week, a.week - c.cohort_week
"""
# Both register in operators/overflow.py (post-budget).


ACTIVE_WINDOWS = {"dau": 1, "wau": 7, "mau": 30}


def q_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling active-user counts per calendar day: DAU plus distinct
    users over the trailing 7 (WAU) and 30 days (MAU) — the
    engagement dashboard triple. COUNT DISTINCT over a sliding RANGE
    frame has no direct window form, so each user-day is EXPANDED to
    the trailing days it keeps the user active in (`explode(sequence)`
    per window length) and each (window, day) re-distincts users —
    semantically exact, and the blow-up is bounded by the window sum
    (38 rows per user-day here), LINEAR in user-days, never quadratic.
    Only days with actual activity are reported (no spine join —
    compose with gapfill_ffill to densify).

    At 100 TB: the expansion is map-side; the single shuffle is the
    (window, day, user) distinct with partial aggregation. For
    month-windows over billions of user-days, swap the exact distinct
    for per-day HLL sketches merged over the frame
    (`q_hll_rollup`'s mergeable-sketch pattern) — the expansion
    then carries |days| sketch rows, not user rows."""
    events = load_table(spark, sf_dir, "events")
    user_days = events.select(
        "user_id", F.col("ts").cast("date").alias("day")
    ).distinct()
    max_day = user_days.agg(F.max("day").alias("__max_day"))
    spans = ", ".join(
        f"named_struct('win', '{name}', 'len', {n})"
        for name, n in ACTIVE_WINDOWS.items()
    )
    expanded = (
        user_days.crossJoin(F.broadcast(max_day))
        .select(
            "user_id",
            "day",
            "__max_day",
            F.explode(F.expr(f"array({spans})")).alias("w"),
        )
        .select(
            "user_id",
            F.col("w.win").alias("win"),
            F.explode(
                F.expr(
                    "sequence(day, least(date_add(day, w.len - 1), __max_day))"
                )
            ).alias("day"),
        )
    )
    return expanded.groupBy("win", "day").agg(
        F.countDistinct("user_id").alias("n_active")
    )


ACTIVE_USERS_SQL = f"""
    WITH user_days AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ),
    bounds AS (SELECT max(day) AS max_day FROM user_days),
    spans AS (
        SELECT * FROM (VALUES {", ".join(f"('{k}', {v})" for k, v in ACTIVE_WINDOWS.items())})
            AS t(win, len)
    ),
    expanded AS (
        SELECT u.user_id, s.win,
               unnest(generate_series(CAST(u.day AS TIMESTAMP),
                   CAST(least(u.day + (s.len - 1) * INTERVAL 1 DAY,
                              CAST(b.max_day AS TIMESTAMP)) AS TIMESTAMP),
                   INTERVAL 1 DAY)) AS day
        FROM user_days u CROSS JOIN spans s CROSS JOIN bounds b
    )
    SELECT win, CAST(day AS DATE) AS day,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_active
    FROM expanded GROUP BY 1, 2
"""


SESSION_GAP_S = 1800  # 30-minute inactivity gap, the industry default


def sessionize(
    events: DataFrame, gap_s: int = SESSION_GAP_S
) -> DataFrame:
    """Gap-based sessionization: a user's events are split into
    sessions wherever the inactivity gap exceeds `gap_s`. The classic
    streaming-warehouse pattern — `lag` marks session starts, a
    running sum of the marks numbers the sessions — so the whole
    assignment is ONE user-keyed window Exchange (both window
    functions share the frame), no self-join, no per-user fan-out.
    Returns the events annotated with (session_seq, is_new_session);
    state per key is a single previous-timestamp value, so the same
    plan holds at any event volume. Streaming twin: the native
    `session_window` aggregation in streaming/windows.py."""
    ev = events.select(
        "event_id",
        "user_id",
        "event_type",
        F.col("value"),
        F.unix_timestamp("ts").alias("t"),
    )
    w = Window.partitionBy("user_id").orderBy("t", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap = F.col("t") - F.lag("t").over(w)
    is_new = F.when(gap.isNull() | (gap > gap_s), 1).otherwise(0)
    return ev.withColumn("is_new_session", is_new).withColumn(
        "session_seq", F.sum("is_new_session").over(run)
    )


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-session rollup: bounds, duration, event mix, purchase
    revenue, bounce flag. One user-keyed window Exchange (the
    sessionize pass) + one (user, session) hash agg."""
    events = load_table(spark, sf_dir, "events")
    s = sessionize(events)
    return s.groupBy("user_id", "session_seq").agg(
        F.min("t").alias("session_start_t"),
        F.max("t").alias("session_end_t"),
        (F.max("t") - F.min("t")).alias("duration_s"),
        F.count(F.lit(1)).alias("n_events"),
        F.count_if(F.col("event_type") == "purchase").alias("n_purchases"),
        F.round(
            F.coalesce(
                F.sum(
                    F.when(F.col("event_type") == "purchase", F.col("value"))
                ),
                F.lit(0.0),
            )
            + 1e-6,
            2,
        ).alias("revenue"),
        F.when(F.count(F.lit(1)) == 1, 1).otherwise(0).alias("is_bounce"),
    )


SESSIONIZE_SQL = f"""
    WITH ev AS (
        SELECT event_id, user_id, event_type, value,
               CAST(floor(epoch(ts)) AS BIGINT) AS t
        FROM events
    ),
    marked AS (
        SELECT *,
               CASE WHEN t - lag(t) OVER (
                        PARTITION BY user_id ORDER BY t, event_id)
                        > {SESSION_GAP_S}
                      OR lag(t) OVER (
                        PARTITION BY user_id ORDER BY t, event_id) IS NULL
                    THEN 1 ELSE 0 END AS is_new_session
        FROM ev
    ),
    numbered AS (
        SELECT *,
               sum(is_new_session) OVER (
                   PARTITION BY user_id ORDER BY t, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS session_seq
        FROM marked
    )
    SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
           min(t) AS session_start_t, max(t) AS session_end_t,
           max(t) - min(t) AS duration_s,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT)
               AS n_purchases,
           round(coalesce(sum(value) FILTER (event_type = 'purchase'),
                          0.0) + 1e-6, 2) AS revenue,
           CASE WHEN count(*) = 1 THEN 1 ELSE 0 END AS is_bounce
    FROM numbered GROUP BY 1, 2
"""


def q_attribution_multi_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear + position-based (U-shaped) multi-touch attribution:
    every click is credited to the user's NEXT purchase (the
    conversion it fed), linear credit splits 1/n across the path,
    position-based gives 40% to the first and last touches and
    spreads 20% over the middles (collapsing to 1.0 / 0.5+0.5 for
    1- and 2-click paths). Companion to last-touch attribution in
    operators/timeseries.py.

    Path assembly is join-free: a DESCENDING user-ordered running
    count of purchases labels every event with the purchase at-or-
    after it (clicks sharing a label form that purchase's path), then
    ascending per-(user, path) windows rank the clicks. Two keyed
    window Exchanges, zero joins, O(1) window state — no
    purchase x click range-join fan-out at any scale."""
    events = load_table(spark, sf_dir, "events")
    ev = events.select(
        "event_id",
        "user_id",
        "event_type",
        F.unix_timestamp("ts").alias("t"),
    ).where(F.col("event_type").isin("click", "purchase"))
    is_purchase = (F.col("event_type") == "purchase").cast("int")
    w_desc = (
        Window.partitionBy("user_id")
        .orderBy(F.desc("t"), F.desc("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    labeled = ev.withColumn("path_id", F.sum(is_purchase).over(w_desc))
    # path_id = 0 → click after the user's last purchase: unattributable.
    labeled = labeled.where(F.col("path_id") > 0)
    w_path = Window.partitionBy("user_id", "path_id").orderBy(
        "t", "event_id"
    )
    run = w_path.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    full = w_path.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    is_click = (F.col("event_type") == "click").cast("int")
    ranked = (
        labeled.withColumn("click_pos", F.sum(is_click).over(run))
        .withColumn("n_clicks", F.sum(is_click).over(full))
        .withColumn(
            "purchase_id",
            F.max(F.when(is_purchase == 1, F.col("event_id"))).over(full),
        )
    )
    clicks = ranked.where(F.col("event_type") == "click")
    n = F.col("n_clicks")
    pos = F.col("click_pos")
    credit_pos = (
        F.when(n == 1, F.lit(1.0))
        .when(n == 2, F.lit(0.5))
        .when(pos == 1, F.lit(0.4))
        .when(pos == n, F.lit(0.4))
        .otherwise(F.lit(0.2) / (n - 2).cast("double"))
    )
    return clicks.select(
        "user_id",
        "purchase_id",
        F.col("event_id").alias("click_id"),
        "click_pos",
        "n_clicks",
        F.round(F.lit(1.0) / n.cast("double") + 1e-9, 6).alias(
            "credit_linear"
        ),
        F.round(credit_pos + 1e-9, 6).alias("credit_position"),
    )


MULTI_TOUCH_SQL = """
    WITH ev AS (
        SELECT event_id, user_id, event_type,
               CAST(floor(epoch(ts)) AS BIGINT) AS t
        FROM events WHERE event_type IN ('click', 'purchase')
    ),
    labeled AS (
        SELECT *,
               sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   OVER (PARTITION BY user_id ORDER BY t DESC, event_id DESC
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS path_id
        FROM ev
    ),
    ranked AS (
        SELECT *,
               sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                   OVER (PARTITION BY user_id, path_id ORDER BY t, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS click_pos,
               sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                   OVER (PARTITION BY user_id, path_id) AS n_clicks,
               max(CASE WHEN event_type = 'purchase' THEN event_id END)
                   OVER (PARTITION BY user_id, path_id) AS purchase_id
        FROM labeled WHERE path_id > 0
    )
    SELECT user_id, purchase_id, event_id AS click_id,
           CAST(click_pos AS BIGINT) AS click_pos,
           CAST(n_clicks AS BIGINT) AS n_clicks,
           round(1.0 / n_clicks + 1e-9, 6) AS credit_linear,
           round(CASE WHEN n_clicks = 1 THEN 1.0
                      WHEN n_clicks = 2 THEN 0.5
                      WHEN click_pos = 1 THEN 0.4
                      WHEN click_pos = n_clicks THEN 0.4
                      ELSE 0.2 / (n_clicks - 2) END + 1e-9, 6)
               AS credit_position
    FROM ranked WHERE event_type = 'click'
"""


KM_CENSOR_MARGIN_D = 7  # still-active horizon: no churn call this close
                        # to the observation end


def km_survival(
    spans: DataFrame, duration_col: str, event_col: str
) -> DataFrame:
    """Kaplan-Meier survival estimator over (duration, event) spans —
    event=1 is an observed death/churn, event=0 right-censored. The
    life table is a |distinct durations|-row aggregate; at-risk counts
    and the survival product are ordered windows OVER THAT TINY TABLE,
    so the estimator costs one duration-grain agg regardless of
    subject count. The product Π(1 - d/n) is computed as
    exp(Σ ln((n-d)/n)) — a cumulative product has no SQL aggregate,
    but its log is a plain running sum; if the risk set ever hits
    n = d the curve drops to exactly 0 from that point (min-flag, no
    ln(0))."""
    lt = spans.groupBy(F.col(duration_col).alias("t")).agg(
        F.sum(F.col(event_col)).alias("d_events"),
        F.sum(1 - F.col(event_col)).alias("c_censored"),
    )
    w_prev = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, -1
    )
    run = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    full = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    lt = lt.withColumn(
        "n_at_risk",
        F.sum(F.col("d_events") + F.col("c_censored")).over(full)
        - F.coalesce(
            F.sum(F.col("d_events") + F.col("c_censored")).over(w_prev),
            F.lit(0).cast("bigint"),
        ),
    )
    term = F.ln(
        (F.col("n_at_risk") - F.col("d_events"))
        / F.col("n_at_risk").cast("double")
    )
    dead_end = F.min(F.col("n_at_risk") - F.col("d_events")).over(run)
    survival = F.when(dead_end == 0, F.lit(0.0)).otherwise(
        F.exp(F.sum(F.when(F.col("d_events") > 0, term)).over(run))
    )
    return lt.select(
        "t",
        "n_at_risk",
        "d_events",
        "c_censored",
        F.round(F.coalesce(survival, F.lit(1.0)) + 1e-9, 6).alias(
            "survival"
        ),
    )


def q_km_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-lifetime survival curve: duration = days between a user's
    first and last event; users last seen within KM_CENSOR_MARGIN_D
    of the data's end are right-censored (still alive), earlier
    last-seen users churned. One user-grain agg + the life-table
    windows."""
    events = load_table(spark, sf_dir, "events")
    max_day = events.agg(
        F.max(F.col("ts").cast("date")).alias("__max_day")
    )
    spans = (
        events.groupBy("user_id")
        .agg(
            F.min(F.col("ts").cast("date")).alias("first_day"),
            F.max(F.col("ts").cast("date")).alias("last_day"),
        )
        .crossJoin(F.broadcast(max_day))
        .select(
            F.datediff("last_day", "first_day").alias("duration_d"),
            F.when(
                F.datediff("__max_day", "last_day") > KM_CENSOR_MARGIN_D,
                1,
            )
            .otherwise(0)
            .alias("churned"),
        )
    )
    return km_survival(spans, "duration_d", "churned")


KM_SQL = f"""
    WITH spans AS (
        SELECT date_diff('day', min(CAST(ts AS DATE)),
                         max(CAST(ts AS DATE))) AS duration_d,
               CASE WHEN date_diff('day', max(CAST(ts AS DATE)),
                         (SELECT max(CAST(ts AS DATE)) FROM events))
                         > {KM_CENSOR_MARGIN_D}
                    THEN 1 ELSE 0 END AS churned
        FROM events GROUP BY user_id
    ),
    lt AS (
        SELECT duration_d AS t,
               CAST(sum(churned) AS BIGINT) AS d_events,
               CAST(sum(1 - churned) AS BIGINT) AS c_censored
        FROM spans GROUP BY 1
    ),
    risk AS (
        SELECT *,
               CAST(sum(d_events + c_censored) OVER ()
                    - coalesce(sum(d_events + c_censored) OVER (
                        ORDER BY t
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                      ), 0) AS BIGINT) AS n_at_risk
        FROM lt
    )
    SELECT t, n_at_risk, d_events, c_censored,
           round(coalesce(
               CASE WHEN min(n_at_risk - d_events) OVER (
                         ORDER BY t
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                    ) = 0 THEN 0.0
                    ELSE exp(sum(CASE WHEN d_events > 0 THEN
                             ln((n_at_risk - d_events) * 1.0 / n_at_risk)
                         END) OVER (
                         ORDER BY t
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
               END, 1.0) + 1e-9, 6) AS survival
    FROM risk
"""


def q_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV curves: cumulative purchase revenue per original
    cohort member by weeks-since-signup — the monetized twin of
    q_cohort_retention (same first-activity-week cohorts). The weekly
    revenue matrix is one (cohort, week) agg; the cumulative sum runs
    over the TINY matrix (|cohorts| x |weeks| rows) partitioned by
    cohort, and cohort sizes ride in as a broadcast join — so the
    curve costs the user-grain shuffle and nothing else at any fact
    volume. Weeks with no revenue simply don't appear (compose with
    gapfill_ffill for dense curves)."""
    events = load_table(spark, sf_dir, "events")
    weeks = events.select(
        "user_id",
        F.floor(
            F.datediff(F.to_date("ts"), F.lit(COHORT_EPOCH).cast("date")) / 7
        ).alias("week"),
        F.when(F.col("event_type") == "purchase", F.col("value"))
        .otherwise(0.0)
        .alias("rev"),
    )
    cohort = weeks.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    sizes = cohort.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    matrix = (
        weeks.join(cohort, "user_id")
        .groupBy(
            "cohort_week",
            (F.col("week") - F.col("cohort_week")).alias("weeks_since"),
        )
        .agg(F.round(F.sum("rev") + 1e-6, 2).alias("week_revenue"))
    )
    w = (
        Window.partitionBy("cohort_week")
        .orderBy("weeks_since")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        matrix.withColumn(
            "cum_revenue", F.round(F.sum("week_revenue").over(w) + 1e-6, 2)
        )
        .join(F.broadcast(sizes), "cohort_week")
        .select(
            F.col("cohort_week").cast("int").alias("cohort_week"),
            F.col("weeks_since").cast("int").alias("weeks_since"),
            "week_revenue",
            "cum_revenue",
            F.round(
                F.col("cum_revenue") / F.col("cohort_size") + 1e-9, 4
            ).alias("ltv_per_user"),
        )
    )


COHORT_LTV_SQL = f"""
    WITH weeks AS (
        SELECT user_id,
               CAST(floor(date_diff('day', DATE '{COHORT_EPOCH}',
                                    CAST(ts AS DATE)) / 7.0) AS BIGINT) AS week,
               CASE WHEN event_type = 'purchase' THEN value ELSE 0.0 END AS rev
        FROM events
    ),
    cohort AS (SELECT user_id, min(week) AS cohort_week FROM weeks GROUP BY user_id),
    sizes AS (SELECT cohort_week, CAST(count(*) AS BIGINT) AS cohort_size
              FROM cohort GROUP BY cohort_week),
    matrix AS (
        SELECT c.cohort_week, w.week - c.cohort_week AS weeks_since,
               round(sum(w.rev) + 1e-6, 2) AS week_revenue
        FROM weeks w JOIN cohort c ON w.user_id = c.user_id
        GROUP BY 1, 2
    ),
    cum AS (
        SELECT *,
               round(sum(week_revenue) OVER (
                   PARTITION BY cohort_week ORDER BY weeks_since
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) + 1e-6, 2) AS cum_revenue
        FROM matrix
    )
    SELECT CAST(m.cohort_week AS INT) AS cohort_week,
           CAST(m.weeks_since AS INT) AS weeks_since,
           m.week_revenue, m.cum_revenue,
           round(m.cum_revenue / s.cohort_size + 1e-9, 4) AS ltv_per_user
    FROM cum m JOIN sizes s ON s.cohort_week = m.cohort_week
"""


HLL_AU_ERR_BOUND = 0.08  # lgConfigK=12 -> ~1.6% SE; 5-sigma bound


def q_active_users_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 10^9-user path q_active_users' docstring names: rolling
    WAU/MAU from MERGEABLE per-day HLL sketches instead of exact
    re-distincting. One |days|-row sketch table is built once (one
    user-day shuffle); each day's SKETCH — a few KB, not its user
    set — is expanded to the trailing days it covers and
    `hll_union_agg` merges the frame. The expansion carries
    |days| x window sketch rows regardless of user count, so month
    windows over billions of user-days cost the same tiny merge.

    Gate shape follows q_hll_rollup: the oracle pins the EXACT
    distinct counts plus a deterministic bounded-error flag for the
    sketch estimate (HLL is a deterministic function of the input
    set, so the flag can't flake); the estimate itself is
    intentionally not hashed."""
    events = load_table(spark, sf_dir, "events")
    user_days = events.select(
        "user_id", F.col("ts").cast("date").alias("day")
    ).distinct()
    max_day = user_days.agg(F.max("day").alias("__max_day"))
    daily_sk = user_days.groupBy("day").agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    spans = ", ".join(
        f"named_struct('win', '{name}', 'len', {n})"
        for name, n in ACTIVE_WINDOWS.items()
        if n > 1  # DAU needs no merge; sketch path is for real windows
    )
    merged = (
        daily_sk.crossJoin(F.broadcast(max_day))
        .select(
            "sk",
            "day",
            "__max_day",
            F.explode(F.expr(f"array({spans})")).alias("w"),
        )
        .select(
            "sk",
            F.col("w.win").alias("win"),
            F.explode(
                F.expr(
                    "sequence(day, least(date_add(day, w.len - 1), __max_day))"
                )
            ).alias("day"),
        )
        .groupBy("win", "day")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
    )
    exact = q_active_users(spark, sf_dir).where(F.col("win") != "dau")
    return merged.join(exact, ["win", "day"]).select(
        "win",
        "day",
        "n_active",
        (
            F.abs(F.col("est") - F.col("n_active")) / F.col("n_active")
            <= HLL_AU_ERR_BOUND
        )
        .cast("int")
        .alias("est_ok"),
    )


ACTIVE_USERS_HLL_SQL = f"""
    WITH user_days AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ),
    bounds AS (SELECT max(day) AS max_day FROM user_days),
    spans AS (
        SELECT * FROM (VALUES {", ".join(f"('{k}', {v})" for k, v in ACTIVE_WINDOWS.items() if v > 1)})
            AS t(win, len)
    ),
    expanded AS (
        SELECT u.user_id, s.win,
               unnest(generate_series(CAST(u.day AS TIMESTAMP),
                   CAST(least(u.day + (s.len - 1) * INTERVAL 1 DAY,
                              CAST(b.max_day AS TIMESTAMP)) AS TIMESTAMP),
                   INTERVAL 1 DAY)) AS day
        FROM user_days u CROSS JOIN spans s CROSS JOIN bounds b
    )
    SELECT win, CAST(day AS DATE) AS day,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_active,
           1 AS est_ok
    FROM expanded GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# Item-item collaborative filtering: cosine similarity between brands
# over user purchase-count vectors, served as top-k recommendations.
ITEM_CF_TOP_K = 3
ITEM_CF_MAX_USER_ITEMS = 200  # cap a hoarder's fan-out before the self-join


def item_cf(ub: DataFrame, top_k: int = ITEM_CF_TOP_K) -> DataFrame:
    """(user, item, cnt) -> per-item top-k neighbours by cosine over
    the sparse user-count matrix — "users who bought X also bought Y",
    the item-item CF of Sarwar et al. 2001 / Amazon's item-to-item.
    Dot products come from a self-equi-join ON USER (never an
    item-pair cross join): each user contributes |items_u|^2 pair
    terms, so the cap on per-user distinct items bounds the quadratic
    term exactly the way MAX_BASKET_ITEMS bounds basket mining — at
    10^9 users the join stays linear in users. Counts are integers,
    so dot products and squared norms are EXACT; cosine is rounded to
    6dp before the rank window so cross-engine float drift can never
    flip a tie."""
    # REUSE POINT (r09, guide §2.4): the incoming (user, item, cnt)
    # chain is consumed by the sizes agg AND the capped join side, and
    # the capped frame again by norms and both self-join aliases —
    # without a shared exchange Catalyst re-executes the upstream
    # fact aggregation under every branch. hash(user) is what the
    # sizes agg, the cap join, and the a⋈b self-join all need, so the
    # exchanges dedupe via ReuseExchange and the chain runs once.
    ub = ub.repartition("user")
    sizes = ub.groupBy("user").agg(F.count(F.lit(1)).alias("__ni"))
    ub = ub.join(
        sizes.where(F.col("__ni") <= ITEM_CF_MAX_USER_ITEMS), "user"
    ).drop("__ni")
    norms = ub.groupBy("item").agg(F.sum(F.expr("cnt * cnt")).alias("ss"))
    a, b = ub.alias("a"), ub.alias("b")
    dots = (
        a.join(b, (F.col("a.user") == F.col("b.user")) & (F.col("a.item") != F.col("b.item")))
        .groupBy(F.col("a.item").alias("item"), F.col("b.item").alias("rec"))
        .agg(F.sum(F.expr("a.cnt * b.cnt")).alias("dot"))
    )
    na = norms.select(F.col("item"), F.col("ss").alias("ss_a"))
    nb = norms.select(F.col("item").alias("rec"), F.col("ss").alias("ss_b"))
    scored = (
        dots.join(na, "item")
        .join(nb, "rec")
        .withColumn(
            "cosine",
            F.round(
                F.col("dot") / (F.sqrt("ss_a") * F.sqrt("ss_b")) + 1e-9, 6
            ),
        )
    )
    w = Window.partitionBy("item").orderBy(F.desc("cosine"), "rec")
    return (
        scored.withColumn("rec_rank", F.row_number().over(w))
        .where(F.col("rec_rank") <= top_k)
        .select(
            "item",
            F.col("rec_rank").cast("int").alias("rec_rank"),
            "rec",
            F.col("dot").cast("bigint").alias("dot"),
            "cosine",
        )
    )


def q_item_cf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate entry: top-3 brand recommendations per brand from
    household purchase-count vectors."""
    from propensity_spark.operators.relational import brand_dim, silver_transactions

    silver = silver_transactions(spark, sf_dir)
    ub = (
        silver.join(F.broadcast(brand_dim(spark, sf_dir)), "product_id")
        .groupBy(
            F.col("household_key").alias("user"),
            F.col("commodity_desc").alias("item"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return item_cf(ub)


def _item_cf_sql() -> str:
    from propensity_spark.operators.relational import SILVER_SQL

    return f"""
    WITH s AS MATERIALIZED ({SILVER_SQL}),
    ub_all AS MATERIALIZED (
        SELECT s.household_key AS u, p.p_brand AS item, count(*) AS cnt
        FROM s JOIN part p ON s.product_id = p.p_partkey
        GROUP BY 1, 2
    ),
    ub AS MATERIALIZED (
        SELECT * FROM ub_all WHERE u IN (
            SELECT u FROM ub_all GROUP BY u
            HAVING count(*) <= {ITEM_CF_MAX_USER_ITEMS}
        )
    ),
    norms AS (SELECT item, sum(cnt * cnt) AS ss FROM ub GROUP BY item),
    dots AS (
        SELECT a.item AS item, b.item AS rec, sum(a.cnt * b.cnt) AS dot
        FROM ub a JOIN ub b ON a.u = b.u AND a.item <> b.item
        GROUP BY 1, 2
    ),
    scored AS (
        SELECT d.item, d.rec, d.dot,
               round(d.dot / (sqrt(na.ss) * sqrt(nb.ss)) + 1e-9, 6) AS cosine
        FROM dots d
        JOIN norms na ON d.item = na.item
        JOIN norms nb ON d.rec = nb.item
    )
    SELECT item, CAST(rec_rank AS INT) AS rec_rank, rec,
           CAST(dot AS BIGINT) AS dot, cosine
    FROM (
        SELECT *, row_number() OVER (PARTITION BY item
                   ORDER BY cosine DESC, rec) AS rec_rank
        FROM scored
    ) WHERE rec_rank <= {ITEM_CF_TOP_K}
"""


ITEM_CF_SQL = _item_cf_sql()
# item_cf registers in operators/overflow.py (post-budget).


def q_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution: per converting user, hours from
    FIRST view to the first purchase AT OR AFTER it, summarized per
    signup-month cohort (n users, mean / min / max hours, conversion
    count <= cohort size). The funnel's latency companion — funnel_
    conversion says how many convert, this says how fast. Two user-
    grain conditional aggs + one cohort agg; the purchase-after-view
    constraint is a conditional MIN (min ts among purchases >= first
    view), not a join — the whole readout is two shuffles on user_id.
    Hours are integer epoch-MILLISECOND differences divided by 3.6e6
    (unix_millis / epoch_ms agree exactly; second-level functions
    disagree on sub-second truncation) and rounded: bit-stable
    cross-engine."""
    events = load_table(spark, sf_dir, "events")
    per_user = events.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("first_view"),
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias("first_signup"),
    )
    # second pass: first purchase at/after the first view (conditional
    # on the per-user anchor, so join the 1-col anchor back — user-key
    # partitioned, no fan-out: one row per user each side)
    purch = (
        events.where(F.col("event_type") == "purchase")
        .join(per_user.where(F.col("first_view").isNotNull()), "user_id")
        .where(F.col("ts") >= F.col("first_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_purchase"), F.min("first_view").alias("fv"),
             F.min("first_signup").alias("fs"))
    )
    hours = purch.select(
        F.coalesce(F.date_format("fs", "yyyy-MM"), F.lit("no_signup")).alias("cohort"),
        (
            (F.unix_millis("first_purchase") - F.unix_millis("fv"))
            / F.lit(3600000.0)
        ).alias("h"),
    )
    return hours.groupBy("cohort").agg(
        F.count(F.lit(1)).alias("n_converted"),
        F.round(F.avg("h") + 1e-9, 4).alias("mean_hours"),
        F.round(F.min("h") + 1e-9, 4).alias("min_hours"),
        F.round(F.max("h") + 1e-9, 4).alias("max_hours"),
    )


TIME_TO_CONVERT_SQL = """
    WITH per_user AS (
        SELECT user_id,
               min(CASE WHEN event_type = 'view' THEN ts END) AS first_view,
               min(CASE WHEN event_type = 'signup' THEN ts END) AS first_signup
        FROM events GROUP BY user_id
    ),
    purch AS (
        SELECT e.user_id, min(e.ts) AS first_purchase,
               min(p.first_view) AS fv, min(p.first_signup) AS fs
        FROM events e JOIN per_user p ON e.user_id = p.user_id
        WHERE e.event_type = 'purchase' AND p.first_view IS NOT NULL
              AND e.ts >= p.first_view
        GROUP BY e.user_id
    ),
    hours AS (
        SELECT coalesce(strftime(fs, '%Y-%m'), 'no_signup') AS cohort,
               (epoch_ms(first_purchase) - epoch_ms(fv)) / 3600000.0 AS h
        FROM purch
    )
    SELECT cohort, CAST(count(*) AS BIGINT) AS n_converted,
           round(avg(h) + 1e-9, 4) AS mean_hours,
           round(min(h) + 1e-9, 4) AS min_hours,
           round(max(h) + 1e-9, 4) AS max_hours
    FROM hours GROUP BY cohort
"""


def q_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly new-vs-returning purchaser split: a purchaser is NEW in
    the week of their first-ever purchase, RETURNING after. First
    week per user is a user-grain MIN (one shuffle), flags are a
    map-side comparison — never a self-join on the event table.
    Weeks are integer epoch-day div 7 (no engine week-start
    conventions)."""
    events = load_table(spark, sf_dir, "events")
    p = events.where(F.col("event_type") == "purchase").select(
        "user_id",
        (F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date")) / F.lit(7))
        .cast("bigint")
        .alias("week"),
    )
    first = p.groupBy("user_id").agg(F.min("week").alias("first_week"))
    uw = p.dropDuplicates(["user_id", "week"]).join(first, "user_id")
    return (
        uw.groupBy("week")
        .agg(
            F.count_if(F.col("week") == F.col("first_week")).alias("new_users"),
            F.count_if(F.col("week") > F.col("first_week")).alias("returning_users"),
        )
        .select(
            F.col("week").cast("int").alias("week"),
            F.col("new_users").cast("bigint").alias("new_users"),
            F.col("returning_users").cast("bigint").alias("returning_users"),
            F.round(
                F.col("returning_users")
                / (F.col("new_users") + F.col("returning_users")).cast("double")
                + 1e-9,
                6,
            ).alias("returning_share"),
        )
    )


NEW_VS_RETURNING_SQL = """
    WITH p AS (
        SELECT user_id,
               CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) // 7
                    AS BIGINT) AS week
        FROM events WHERE event_type = 'purchase'
    ),
    first AS (SELECT user_id, min(week) AS first_week FROM p GROUP BY user_id),
    uw AS (
        SELECT DISTINCT p.user_id, p.week, f.first_week
        FROM p JOIN first f ON p.user_id = f.user_id
    )
    SELECT CAST(week AS INT) AS week,
           CAST(count(*) FILTER (week = first_week) AS BIGINT) AS new_users,
           CAST(count(*) FILTER (week > first_week) AS BIGINT) AS returning_users,
           round(count(*) FILTER (week > first_week) * 1.0 / count(*) + 1e-9, 6)
               AS returning_share
    FROM uw GROUP BY week
"""


REV_CONC_BUCKETS = 10


def q_revenue_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz curve + Gini of customer revenue concentration: users
    ranked by total purchase value into deciles (TOTAL order: value
    desc, user_id — deterministic ntile both engines), each decile
    reports its revenue share and the cumulative share (the '20% of
    customers drive X% of revenue' readout), plus the Gini
    coefficient from the decile Lorenz points (trapezoid rule —
    identical closed form both engines). One user agg + one global
    ntile window + a 10-row rollup."""
    events = load_table(spark, sf_dir, "events")
    users = (
        events.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.round(F.sum("value") + 1e-6, 2).alias("rev"))
    )
    w = Window.orderBy(F.desc("rev"), "user_id")
    dec = users.withColumn("decile", F.ntile(REV_CONC_BUCKETS).over(w))
    g = dec.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_users"), F.sum("rev").alias("rev")
    )
    tot = Window.partitionBy()
    run = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    share = F.col("rev") / F.sum("rev").over(tot)
    cum = F.sum("rev").over(run) / F.sum("rev").over(tot)
    # Gini via trapezoids over the decile Lorenz curve (deciles ordered
    # rich-first, so flip to the classic poor-first curve first):
    # computed from the same cum points in both engines.
    return g.select(
        F.col("decile").cast("int").alias("decile"),
        F.col("n_users").cast("bigint").alias("n_users"),
        F.round(F.col("rev") + 1e-6, 2).alias("revenue"),
        F.round(share + 1e-9, 6).alias("rev_share"),
        F.round(cum + 1e-9, 6).alias("cum_rev_share"),
    )


REVENUE_CONCENTRATION_SQL = f"""
    WITH users AS (
        SELECT user_id, round(sum(value) + 1e-6, 2) AS rev
        FROM events WHERE event_type = 'purchase'
        GROUP BY user_id
    ),
    dec AS (
        SELECT ntile({REV_CONC_BUCKETS})
                   OVER (ORDER BY rev DESC, user_id) AS decile, rev
        FROM users
    ),
    g AS (
        SELECT decile, count(*) AS n_users, sum(rev) AS rev
        FROM dec GROUP BY decile
    )
    SELECT CAST(decile AS INT) AS decile, CAST(n_users AS BIGINT) AS n_users,
           round(rev + 1e-6, 2) AS revenue,
           round(rev / sum(rev) OVER () + 1e-9, 6) AS rev_share,
           round(sum(rev) OVER (ORDER BY decile ROWS BETWEEN UNBOUNDED
                     PRECEDING AND CURRENT ROW)
                 / sum(rev) OVER () + 1e-9, 6) AS cum_rev_share
    FROM g
"""


FUNNEL_WINDOW_HOURS = 24


def q_window_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse-style windowFunnel: the deepest prefix of the
    ORDERED sequence view -> click -> purchase each user completes
    with every step inside FUNNEL_WINDOW_HOURS of the first view.
    Funnel_conversion counts unordered participation; this demands
    order AND a deadline. Steps resolve as chained conditional MINs
    (first view; first click at/after it within the window; first
    purchase at/after THAT click within the window) — two user-grain
    joins of 1-row-per-user frames, no event fan-out. Millisecond
    epoch arithmetic (the time_to_convert precedent). Output: one row
    per funnel depth with user counts and conversion share of step 1."""
    events = load_table(spark, sf_dir, "events")
    win_ms = FUNNEL_WINDOW_HOURS * 3600 * 1000
    v = (
        events.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min(F.unix_millis("ts")).alias("t1"))
    )
    c = (
        events.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(
            (F.unix_millis("ts") >= F.col("t1"))
            & (F.unix_millis("ts") <= F.col("t1") + win_ms)
        )
        .groupBy("user_id")
        .agg(F.min(F.unix_millis("ts")).alias("t2"), F.min("t1").alias("t1b"))
    )
    p = (
        events.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(
            (F.unix_millis("ts") >= F.col("t2"))
            & (F.unix_millis("ts") <= F.col("t1b") + win_ms)
        )
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    counts = (
        v.agg(F.count(F.lit(1)).alias("n")).select(F.lit(1).alias("depth"), "n")
        .unionByName(
            c.agg(F.count(F.lit(1)).alias("n")).select(F.lit(2).alias("depth"), "n")
        )
        .unionByName(
            p.agg(F.count(F.lit(1)).alias("n")).select(F.lit(3).alias("depth"), "n")
        )
    )
    base = Window.partitionBy()
    return counts.select(
        F.col("depth").cast("int").alias("depth"),
        F.col("n").cast("bigint").alias("n_users"),
        F.round(
            F.col("n") / F.max(F.when(F.col("depth") == 1, F.col("n"))).over(base)
            + 1e-9,
            6,
        ).alias("share_of_step1"),
    )


WINDOW_FUNNEL_SQL = f"""
    WITH v AS (
        SELECT user_id, min(epoch_ms(ts)) AS t1
        FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
        SELECT e.user_id, min(epoch_ms(e.ts)) AS t2, min(v.t1) AS t1b
        FROM events e JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'click'
          AND epoch_ms(e.ts) >= v.t1
          AND epoch_ms(e.ts) <= v.t1 + {FUNNEL_WINDOW_HOURS * 3600 * 1000}
        GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id
        FROM events e JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase'
          AND epoch_ms(e.ts) >= c.t2
          AND epoch_ms(e.ts) <= c.t1b + {FUNNEL_WINDOW_HOURS * 3600 * 1000}
        GROUP BY e.user_id
    ),
    counts AS (
        SELECT 1 AS depth, count(*) AS n FROM v
        UNION ALL SELECT 2, count(*) FROM c
        UNION ALL SELECT 3, count(*) FROM p
    )
    SELECT CAST(depth AS INT) AS depth, CAST(n AS BIGINT) AS n_users,
           round(n * 1.0 / max(CASE WHEN depth = 1 THEN n END) OVER ()
                 + 1e-9, 6) AS share_of_step1
    FROM counts
"""


# --------------------------------------------------------------------------
# Exact Shapley-value channel attribution (the data-driven attribution
# model behind GA4's DDA): channels are the non-purchase event types, a
# user's coalition is their exposure SET, v(S) = conversion rate among
# users whose exposure set is contained in S, and each channel's credit
# is its exact Shapley value. Tractable and EXACT because the channel
# universe is a fixed small set: 2^|C| subset cells, all the
# combinatorics in literal broadcast frames.
SHAPLEY_CHANNELS = ["click", "error", "signup", "view"]


def _shapley_tables():
    from itertools import combinations
    from math import factorial

    chans = SHAPLEY_CHANNELS
    n = len(chans)
    subsets = []
    for r in range(n + 1):
        for combo in combinations(chans, r):
            subsets.append("|".join(combo))
    terms = []  # (channel, without_key, with_key, weight)
    for i, c in enumerate(chans):
        rest = [x for x in chans if x != c]
        for r in range(len(rest) + 1):
            w = factorial(r) * factorial(n - r - 1) / factorial(n)
            for combo in combinations(rest, r):
                without = "|".join(sorted(combo))
                withc = "|".join(sorted(combo + (c,)))
                terms.append((c, without, withc, w))
    return subsets, terms


def q_shapley_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Shapley credit per channel. Pipeline: one user-grain agg
    to (exposure_set, n, conversions) cells (at most 2^|C| cells
    regardless of user count), a broadcast containment join onto the
    literal subset frame to evaluate v(S) for all S, then a literal
    Shapley-term frame (channel, S, S+c, weight) joins v twice and
    sums w * (v(S+c) - v(S)). Everything after the first agg touches
    only 2^|C|-row frames — the user-volume work is ONE shuffle.
    Efficiency property (sum of credits = v(full) - v(empty)) is
    pytest-pinned."""
    subsets, terms = _shapley_tables()
    events = load_table(spark, sf_dir, "events")
    chan_list = ", ".join(f"'{c}'" for c in SHAPLEY_CHANNELS)
    users = events.groupBy("user_id").agg(
        F.expr(
            "concat_ws('|', array_sort(array_distinct("
            f"collect_list(CASE WHEN event_type IN ({chan_list})"
            " THEN event_type END))))"
        ).alias("exposure"),
        F.max((F.col("event_type") == "purchase").cast("int")).alias("conv"),
    )
    cells = users.groupBy("exposure").agg(
        F.count(F.lit(1)).alias("n"), F.sum("conv").alias("c")
    )
    sub_df = spark.createDataFrame([(s,) for s in subsets], ["s"])
    contained = cells.join(
        F.broadcast(sub_df),
        F.expr(
            "size(array_except(filter(split(exposure, '\\\\|'), x -> x <> ''),"
            " filter(split(s, '\\\\|'), x -> x <> ''))) = 0"
        ),
    )
    total = cells.agg(F.sum("n").alias("tot"))
    v = (
        contained.groupBy("s")
        .agg(F.sum("c").alias("cc"))
        .crossJoin(F.broadcast(total))
        .select("s", F.round(F.col("cc") / F.col("tot") + 1e-9, 6).alias("v"))
    )
    term_df = spark.createDataFrame(terms, ["channel", "s_wo", "s_w", "w"])
    shap = (
        F.broadcast(term_df)
        .join(v.selectExpr("s AS s_wo", "v AS v_wo"), "s_wo", "left")
        .join(v.selectExpr("s AS s_w", "v AS v_w"), "s_w", "left")
        .groupBy("channel")
        .agg(
            F.round(
                F.sum(
                    F.col("w")
                    * (F.coalesce("v_w", F.lit(0.0)) - F.coalesce("v_wo", F.lit(0.0)))
                )
                + 1e-9,
                6,
            ).alias("shapley_credit")
        )
    )
    full = "|".join(SHAPLEY_CHANNELS)
    anchors = v.agg(
        F.coalesce(
            F.max(F.when(F.col("s") == "", F.col("v"))), F.lit(0.0)
        ).alias("v_empty"),
        F.max(F.when(F.col("s") == full, F.col("v"))).alias("v_full"),
    )
    return shap.crossJoin(F.broadcast(anchors)).select(
        "channel", "shapley_credit", "v_empty", "v_full"
    )


def _shapley_sql() -> str:
    subsets, terms = _shapley_tables()
    chan_list = ", ".join(f"'{c}'" for c in SHAPLEY_CHANNELS)
    sub_values = ", ".join(f"('{s}')" for s in subsets)
    term_values = ", ".join(
        f"('{c}', '{wo}', '{w_}', {w!r})" for c, wo, w_, w in terms
    )
    full = "|".join(SHAPLEY_CHANNELS)
    return f"""
    WITH users AS (
        SELECT user_id,
               coalesce(string_agg(DISTINCT CASE WHEN event_type IN ({chan_list})
                        THEN event_type END, '|' ORDER BY
                        CASE WHEN event_type IN ({chan_list})
                        THEN event_type END), '') AS exposure,
               max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
        FROM events GROUP BY user_id
    ),
    cells AS (
        SELECT exposure, count(*) AS n, sum(conv) AS c
        FROM users GROUP BY exposure
    ),
    subs(s) AS (VALUES {sub_values}),
    v AS MATERIALIZED (
        SELECT subs.s,
               round(sum(cells.c) * 1.0
                     / (SELECT sum(n) FROM cells) + 1e-9, 6) AS v
        FROM cells JOIN subs
          ON list_has_all(list_filter(string_split(subs.s, '|'), x -> x <> ''),
                          list_filter(string_split(cells.exposure, '|'),
                                      x -> x <> ''))
        GROUP BY subs.s
    ),
    terms(channel, s_wo, s_w, w) AS (VALUES {term_values}),
    shap AS (
        SELECT t.channel,
               round(sum(t.w * (coalesce(vw.v, 0) - coalesce(vo.v, 0)))
                     + 1e-9, 6) AS shapley_credit
        FROM terms t
        LEFT JOIN v vo ON t.s_wo = vo.s
        LEFT JOIN v vw ON t.s_w = vw.s
        GROUP BY t.channel
    )
    SELECT shap.channel, shap.shapley_credit,
           (SELECT coalesce(max(CASE WHEN s = '' THEN v END), 0.0) FROM v) AS v_empty,
           (SELECT max(CASE WHEN s = '{full}' THEN v END) FROM v) AS v_full
    FROM shap
"""


SHAPLEY_SQL = _shapley_sql()


def q_activity_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(weekday x hour) activity heatmap: event counts, revenue, and
    each cell's share of its weekday — the feed behind every
    operations dashboard's peak-hours view. Integer epoch-day % 7 for
    the weekday (locale-immune — no engine week-start conventions) and
    UTC hour; one 168-cell agg + one weekday window."""
    events = load_table(spark, sf_dir, "events")
    cells = events.groupBy(
        (F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date")) % 7)
        .cast("int")
        .alias("dow"),
        F.hour("ts").cast("int").alias("hour"),
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value") + 1e-6, 2).alias("total_value"),
    )
    w = Window.partitionBy("dow")
    return cells.select(
        "dow",
        "hour",
        F.col("n_events").cast("bigint").alias("n_events"),
        "total_value",
        F.round(
            F.col("n_events") / F.sum("n_events").over(w).cast("double") + 1e-9, 6
        ).alias("share_of_dow"),
    )


ACTIVITY_HEATMAP_SQL = """
    WITH cells AS (
        SELECT CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) % 7
                    AS INT) AS dow,
               CAST(extract(hour FROM ts) AS INT) AS hour,
               count(*) AS n_events,
               round(sum(value) + 1e-6, 2) AS total_value
        FROM events GROUP BY 1, 2
    )
    SELECT dow, hour, CAST(n_events AS BIGINT) AS n_events, total_value,
           round(n_events * 1.0 / sum(n_events) OVER (PARTITION BY dow)
                 + 1e-9, 6) AS share_of_dow
    FROM cells
"""


def q_gini_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT Gini coefficient of customer revenue (the scalar
    revenue_concentration's decile Lorenz curve approximates):
    G = 2 * sum(i * x_(i)) / (n * sum(x)) - (n + 1)/n over revenues
    sorted ascending with a deterministic total order — the rank
    formula needs ONE sort window and one aggregate, no pairwise
    |x_i - x_j| join. Revenues are 2dp-rounded before ranking; the
    rank-weighted sum is integer-rank x 2dp values, so the statistic
    is stable to 6dp."""
    events = load_table(spark, sf_dir, "events")
    users = (
        events.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.round(F.sum("value") + 1e-6, 2).alias("rev"))
    )
    w = Window.orderBy("rev", "user_id")
    ranked = users.select("rev", F.row_number().over(w).alias("i"))
    return ranked.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.round(F.sum("rev") + 1e-6, 2).alias("total_revenue"),
        F.round(
            F.lit(2.0) * F.sum(F.col("i") * F.col("rev"))
            / (F.count(F.lit(1)) * F.sum("rev"))
            - (F.count(F.lit(1)) + 1) / F.count(F.lit(1)).cast("double")
            + 1e-9,
            6,
        ).alias("gini"),
    )


GINI_SQL = """
    WITH users AS (
        SELECT user_id, round(sum(value) + 1e-6, 2) AS rev
        FROM events WHERE event_type = 'purchase'
        GROUP BY user_id
    ),
    ranked AS (
        SELECT rev, row_number() OVER (ORDER BY rev, user_id) AS i
        FROM users
    )
    SELECT CAST(count(*) AS BIGINT) AS n_users,
           round(sum(rev) + 1e-6, 2) AS total_revenue,
           round(2.0 * sum(i * rev) / (count(*) * sum(rev))
                 - (count(*) + 1) * 1.0 / count(*) + 1e-9, 6) AS gini
    FROM ranked
"""


# --- gate registration (moved from the retired operators/overflow.py shim) ---
# Entries past the driver's 50-row budget register here, next to their
# operators; __spark_entry__ merges every module's QUERIES/ORACLES and
# DRIVER_GATE_PRIORITY decides what the driver sees.
QUERIES = {
    "funnel_conversion": q_funnel_conversion,
    "cohort_retention": q_cohort_retention,
    "rfm_segments": q_rfm_segments,
    "path_analysis": q_path_analysis,
    "event_transitions": q_event_transitions,
    "active_users": q_active_users,
    "sessionize": q_sessionize,
    "attribution_multi_touch": q_attribution_multi_touch,
    "km_retention": q_km_retention,
    "cohort_ltv": q_cohort_ltv,
    "active_users_hll": q_active_users_hll,
    "item_cf": q_item_cf,
    "time_to_convert": q_time_to_convert,
    "new_vs_returning": q_new_vs_returning,
    "revenue_concentration": q_revenue_concentration,
    "window_funnel": q_window_funnel,
    "shapley_attribution": q_shapley_attribution,
    "activity_heatmap": q_activity_heatmap,
    "gini_coefficient": q_gini_coefficient,
}

ORACLES = {
    "funnel_conversion": FUNNEL_SQL,
    "cohort_retention": COHORT_SQL,
    "rfm_segments": RFM_SQL,
    "path_analysis": PATH_SQL,
    "event_transitions": TRANSITIONS_SQL,
    "active_users": ACTIVE_USERS_SQL,
    "sessionize": SESSIONIZE_SQL,
    "attribution_multi_touch": MULTI_TOUCH_SQL,
    "km_retention": KM_SQL,
    "cohort_ltv": COHORT_LTV_SQL,
    "active_users_hll": ACTIVE_USERS_HLL_SQL,
    "item_cf": ITEM_CF_SQL,
    "time_to_convert": TIME_TO_CONVERT_SQL,
    "new_vs_returning": NEW_VS_RETURNING_SQL,
    "revenue_concentration": REVENUE_CONCENTRATION_SQL,
    "window_funnel": WINDOW_FUNNEL_SQL,
    "shapley_attribution": SHAPLEY_SQL,
    "activity_heatmap": ACTIVITY_HEATMAP_SQL,
    "gini_coefficient": GINI_SQL,
}
