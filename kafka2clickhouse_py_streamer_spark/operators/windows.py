"""Window-function operators: ranking, running aggregates, lag/lead,
sessionization, keep-first dedup.

Scale notes: each window is one shuffle on partitionBy keys + a per-key
sort. Ordering keys always include a unique tiebreak column so results
are deterministic (and RANGE vs ROWS framing cannot diverge between
engines — frames are declared ROWS explicitly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka2clickhouse_py_streamer_spark.operators.base import Query, table


def q08_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer by price (row_number ≤ 3).

    The canonical top-K-per-group: shuffle on the group key, per-key sort,
    early filter on rank. AQE coalesces the tiny post-filter partitions.
    """
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
        .select(
            "o_custkey",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("price"),
            "rn",
        )
        .orderBy("o_custkey", "rn")
    )


Q08_SQL = """
SELECT o_custkey, o_orderkey, ROUND(o_totalprice, 2) AS price, rn
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
  FROM orders
)
WHERE rn <= 3
ORDER BY o_custkey, rn
"""


def q09_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running revenue per customer over order date (explicit ROWS frame)."""
    o = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
    ).orderBy("o_custkey", "o_orderkey")


Q09_SQL = """
SELECT o_custkey, o_orderkey, o_orderdate,
       ROUND(SUM(o_totalprice) OVER (
         PARTITION BY o_custkey
         ORDER BY o_orderdate ASC, o_orderkey ASC
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
FROM orders
ORDER BY o_custkey, o_orderkey
"""


def q10_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead + rank family over the events stream table.

    Null placement is EXPLICIT in every ordering (NULLS FIRST for the
    time axis, NULLS LAST under the value DESC rank): Spark and DuckDB
    have opposite defaults, so an implicit ordering silently reshuffles
    rows with null ts/value between the engines."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc_nulls_first(), F.col("event_id").asc()
    )
    return e.select(
        "user_id",
        "event_id",
        F.round("value", 4).alias("value"),
        F.round(F.lag("value", 1).over(w), 4).alias("prev_value"),
        F.round(F.lead("value", 1).over(w), 4).alias("next_value"),
        F.rank().over(
            Window.partitionBy("user_id").orderBy(
                F.col("value").desc_nulls_last(), F.col("event_id").asc()
            )
        ).cast("long").alias("value_rank"),
    ).orderBy("user_id", "event_id")


Q10_SQL = """
SELECT user_id, event_id,
       ROUND(value, 4) AS value,
       ROUND(LAG(value, 1) OVER w, 4) AS prev_value,
       ROUND(LEAD(value, 1) OVER w, 4) AS next_value,
       RANK() OVER (PARTITION BY user_id
                    ORDER BY value DESC NULLS LAST, event_id ASC) AS value_rank
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC NULLS FIRST, event_id ASC)
ORDER BY user_id, event_id
"""


def q28_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization: gap > 30 min starts a new session.

    lag(ts) → gap flag → cumulative sum = session id; then per-session
    rollup. Two window passes over one shuffle partitioning + one agg.
    This is the batch twin of streaming ``session_window`` (see
    streaming/windows.py).
    """
    # no event time -> no session membership (same contract as the
    # w-ops' timed_events gate)
    e = table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    gap = F.when(
        F.col("ts").cast("double")
        - F.lag(F.col("ts").cast("double"), 1).over(w)
        > 1800.0,
        F.lit(1),
    ).otherwise(F.lit(0))
    sessions = e.withColumn("new_sess", gap).withColumn(
        "session_id",
        F.sum("new_sess")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long"),
    )
    return (
        sessions.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("session_value"),
        )
        .orderBy("user_id", "session_id")
    )


Q28_SQL = """
WITH flagged AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN epoch(ts) - LAG(epoch(ts), 1) OVER w > 1800.0
              THEN 1 ELSE 0 END AS new_sess
  FROM events WHERE ts IS NOT NULL
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
), sess AS (
  -- running sum ordered exactly like the Spark window: (ts, event_id)
  SELECT user_id, event_id, value,
         CAST(SUM(new_sess) OVER (PARTITION BY user_id
              ORDER BY ts ASC, event_id ASC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
  FROM flagged
)
SELECT user_id, session_id,
       COUNT(*) AS n_events,
       ROUND(SUM(value), 4) AS session_value
FROM sess
GROUP BY user_id, session_id
ORDER BY user_id, session_id
"""


def q29_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-first dedup: earliest event per (user_id, event_type).

    Deterministic alternative to dropDuplicates (which keeps an arbitrary
    row): rank by (ts, event_id), keep rank 1.
    """
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id", "ts")
        .orderBy("user_id", "event_type")
    )


Q29_SQL = """
SELECT user_id, event_type, event_id, ts
FROM (
  SELECT user_id, event_type, event_id, ts,
         ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts ASC, event_id ASC) AS rn
  FROM events
)
WHERE rn = 1
ORDER BY user_id, event_type
"""


def q44_frame_navigation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / last_value / nth_value over an explicit full-frame
    window (ROWS UNBOUNDED PRECEDING..UNBOUNDED FOLLOWING — the default
    running frame would make last_value degenerate and engines disagree).
    One shuffle on the partition key; the unique o_orderkey tiebreak
    keeps nth-value deterministic."""
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1995-03-01")
        & (F.col("o_orderdate") < "1995-04-01")
    )
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.round(F.first_value("o_totalprice").over(w), 2).alias("first_price"),
        F.round(F.last_value("o_totalprice").over(w), 2).alias("last_price"),
        F.round(F.nth_value("o_totalprice", 2).over(w), 2).alias("second_price"),
    ).orderBy("o_orderkey")


Q44_SQL = """
SELECT o_orderkey, o_orderpriority,
       ROUND(FIRST_VALUE(o_totalprice) OVER w, 2) AS first_price,
       ROUND(LAST_VALUE(o_totalprice) OVER w, 2) AS last_price,
       ROUND(NTH_VALUE(o_totalprice, 2) OVER w, 2) AS second_price
FROM orders
WHERE o_orderdate >= DATE '1995-03-01' AND o_orderdate < DATE '1995-04-01'
WINDOW w AS (PARTITION BY o_orderpriority
             ORDER BY o_orderdate ASC, o_orderkey ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
ORDER BY o_orderkey
"""


def q53_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered event funnel: per user, the first 'view', the first
    'click' strictly AFTER that view, and the first 'purchase' strictly
    after that click — the product-analytics staple (which stage does
    each user reach, and when). Sequential "first X after Y" cannot be
    one aggregation pass; each stage is a filtered min-agg equi-joined
    to the previous stage on user_id.

    Scale shape: three filtered partial aggs + two equi-joins, all
    keyed on user_id, so AQE co-partitions the chain on one key; event
    timestamps leave as unix micros (longs) to keep the comparison
    engine-neutral. No windows, no theta joins, no driver loops."""
    e = table(spark, sf_dir, "events")
    view = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    click = (
        e.filter(F.col("event_type") == "click")
        .join(view, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    purchase = (
        e.filter(F.col("event_type") == "purchase")
        .join(click, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return (
        view.join(click, "user_id", "left")
        .join(purchase, "user_id", "left")
        .select(
            "user_id",
            F.unix_micros("t_view").alias("t_view_us"),
            F.unix_micros("t_click").alias("t_click_us"),
            F.unix_micros("t_purchase").alias("t_purchase_us"),
            (
                F.lit(1)
                + F.col("t_click").isNotNull().cast("int")
                + F.col("t_purchase").isNotNull().cast("int")
            )
            .cast("long")
            .alias("stage_reached"),
        )
        .orderBy("user_id")
    )


Q53_SQL = """
WITH v AS (
  SELECT user_id, MIN(ts) AS t_view
  FROM events WHERE event_type = 'view' GROUP BY user_id
),
c AS (
  SELECT e.user_id, MIN(e.ts) AS t_click
  FROM events e JOIN v ON v.user_id = e.user_id AND e.ts > v.t_view
  WHERE e.event_type = 'click' GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, MIN(e.ts) AS t_purchase
  FROM events e JOIN c ON c.user_id = e.user_id AND e.ts > c.t_click
  WHERE e.event_type = 'purchase' GROUP BY e.user_id
)
SELECT v.user_id,
       epoch_us(v.t_view) AS t_view_us,
       epoch_us(c.t_click) AS t_click_us,
       epoch_us(p.t_purchase) AS t_purchase_us,
       CAST(1 + (CASE WHEN c.user_id IS NULL THEN 0 ELSE 1 END)
              + (CASE WHEN p.user_id IS NULL THEN 0 ELSE 1 END) AS BIGINT)
         AS stage_reached
FROM v
LEFT JOIN c ON c.user_id = v.user_id
LEFT JOIN p ON p.user_id = v.user_id
ORDER BY v.user_id
"""


def q56_mom_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Period-over-period analytics: monthly order revenue per order
    priority with month-over-month absolute and percent change (lag
    over the aggregated month series). The standard trend query of any
    revenue dashboard — composition of a coarse time-bucket agg with a
    navigation window over the SMALL aggregated frame.

    Scale shape: one partial+final hash agg collapses the fact table to
    |priorities|×|months| rows; the lag window then sorts only that
    tiny frame (per-priority partitions). The expensive shuffle is on
    the aggregate keys, never a row-level sort — at 100 TB the window
    input is still just the month series."""
    o = table(spark, sf_dir, "orders")
    monthly = o.groupBy(
        "o_orderpriority",
        F.date_trunc("month", "o_orderdate").cast("date").alias("month"),
    ).agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"))
    w = Window.partitionBy("o_orderpriority").orderBy("month")
    prev = F.lag("revenue").over(w)
    return monthly.select(
        "o_orderpriority",
        "month",
        "revenue",
        F.round(F.col("revenue") - prev, 2).alias("mom_delta"),
        F.round((F.col("revenue") - prev) / prev * 100, 4).alias(
            "mom_pct"
        ),
    ).orderBy("o_orderpriority", "month")


Q56_SQL = """
WITH monthly AS (
  SELECT o_orderpriority,
         CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS month,
         ROUND(SUM(o_totalprice), 2) AS revenue
  FROM orders
  GROUP BY o_orderpriority, DATE_TRUNC('month', o_orderdate)
)
SELECT o_orderpriority, month, revenue,
       ROUND(revenue - LAG(revenue) OVER w, 2) AS mom_delta,
       ROUND((revenue - LAG(revenue) OVER w) / LAG(revenue) OVER w * 100, 4)
         AS mom_pct
FROM monthly
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY month)
ORDER BY o_orderpriority, month
"""


def q58_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type-2 build: each event is a state
    change for its user, valid from its own timestamp until the next
    change (NULL for the current state). The lead-window construction
    every warehouse uses to turn a CDC/event stream into validity
    intervals — composes with q49's MERGE upsert, which maintains the
    type-1 (current-only) twin.

    Null-ts events are excluded (same contract as q28/w-ops: no event
    time → no interval). Scale shape: ONE window shuffle partitioned by
    user, deterministic (ts, event_id) order; no joins, no global
    sort."""
    e = table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    return (
        e.select(
            "user_id",
            "event_id",
            F.col("event_type").alias("state"),
            F.col("ts").alias("valid_from"),
            F.lead("ts").over(w).alias("valid_to"),
        )
        .withColumn("is_current", F.col("valid_to").isNull())
        .orderBy("user_id", "valid_from", "event_id")
    )


Q58_SQL = """
SELECT user_id, event_id, event_type AS state,
       ts AS valid_from,
       LEAD(ts) OVER w AS valid_to,
       LEAD(ts) OVER w IS NULL AS is_current
FROM events
WHERE ts IS NOT NULL
WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
ORDER BY user_id, valid_from, event_id
"""


def q59_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Max concurrent intervals per event type (sweep-line): each event
    opens a half-open 30-minute interval [ts, ts+30m); the concurrency
    at any instant is the running sum of +1 (open) / -1 (close) deltas
    in time order.

    Engine-parity note: deltas at the SAME instant are aggregated into
    one net row per (type, instant) BEFORE the running sum, so the
    half-open convention (an interval closing exactly when another
    opens does not overlap it) is encoded in the data, not in a
    tie-breaking sort order the engines could disagree on.

    Scale shape: a 2× row expansion (explode of two points), one hash
    aggregation on (type, instant), one keyed window (partitioned by
    event_type — never a global sort), one final hash agg. No joins."""
    e = table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    pts = e.select(
        "event_type",
        F.explode(
            F.array(
                F.struct(
                    F.col("ts").alias("pt"), F.lit(1).alias("d")
                ),
                F.struct(
                    (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("pt"),
                    F.lit(-1).alias("d"),
                ),
            )
        ).alias("p"),
    ).select("event_type", "p.pt", "p.d")
    net = pts.groupBy("event_type", "pt").agg(
        F.sum("d").alias("net"),
        F.sum(F.when(F.col("d") == 1, 1).otherwise(0)).alias("n_starts"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("pt")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        net.withColumn("conc", F.sum("net").over(w))
        .groupBy("event_type")
        .agg(
            F.max("conc").cast("long").alias("max_concurrent"),
            F.sum("n_starts").cast("long").alias("n_intervals"),
        )
        .orderBy("event_type")
    )


Q59_SQL = """
WITH pts AS (
  SELECT event_type, ts AS pt, 1 AS d
  FROM events WHERE ts IS NOT NULL
  UNION ALL
  SELECT event_type, ts + INTERVAL 30 MINUTE, -1
  FROM events WHERE ts IS NOT NULL
),
net AS (
  SELECT event_type, pt, SUM(d) AS net,
         SUM(CASE WHEN d = 1 THEN 1 ELSE 0 END) AS n_starts
  FROM pts GROUP BY event_type, pt
),
run AS (
  SELECT event_type, n_starts,
         SUM(net) OVER (PARTITION BY event_type ORDER BY pt
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW) AS conc
  FROM net
)
SELECT event_type,
       CAST(MAX(conc) AS BIGINT) AS max_concurrent,
       CAST(SUM(n_starts) AS BIGINT) AS n_intervals
FROM run GROUP BY event_type ORDER BY event_type
"""


def q61_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: contiguous runs of active DAYS per user. The
    classic date-minus-row_number trick — consecutive dates share one
    (day - rn) island id — entirely within a keyed window, so it scales
    as one shuffle on user_id (never a global sort). Null-ts events are
    excluded (no event time → no activity day)."""
    e = table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    days = e.select(
        "user_id", F.to_date("ts").alias("day")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    islands = days.withColumn(
        "island", F.date_sub(F.col("day"), F.row_number().over(w))
    )
    per_island = islands.groupBy("user_id", "island").agg(
        F.count(F.lit(1)).alias("len")
    )
    return (
        per_island.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_islands"),
            F.max("len").cast("long").alias("max_streak_days"),
            F.sum("len").cast("long").alias("active_days"),
        )
        .orderBy("user_id")
    )


Q61_SQL = """
WITH days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
  FROM events WHERE ts IS NOT NULL
),
islands AS (
  SELECT user_id,
         day - CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                                       ORDER BY day) AS INTEGER) AS island
  FROM days
),
per_island AS (
  SELECT user_id, island, COUNT(*) AS len
  FROM islands GROUP BY user_id, island
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_islands,
       CAST(MAX(len) AS BIGINT) AS max_streak_days,
       CAST(SUM(len) AS BIGINT) AS active_days
FROM per_island GROUP BY user_id ORDER BY user_id
"""


def q65_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative DISTINCT count over event time — "unique users seen
    so far" per event_type at each hour, the audience-accumulation
    curve every growth dashboard carries. Spark has no
    ``COUNT(DISTINCT) OVER``; the standard rewrite makes the running
    distinct additive: a user's FIRST hour (one hash agg on
    (event_type, user)) contributes 1 exactly once, hourly
    first-appearance counts left-join the full per-type hour grid
    (hours whose events are all repeat visitors must still emit a
    row), and a running SUM replaces the impossible running DISTINCT.
    The DuckDB oracle runs its NATIVE windowed distinct aggregate —
    two structurally different computations meeting on the same curve,
    which is exactly what the oracle is for.

    Scale shape: everything after the (event_type, user) first-seen
    agg (map-side combinable, output = |active pairs|) operates on the
    ≤ |types|·|hours| grid — the running-sum window never touches the
    fact table. Null user_ids carry no identity on either engine
    (DISTINCT ignores NULL); null-ts events can't be placed in any
    hour (the w-ops' timed_events contract)."""
    from kafka2clickhouse_py_streamer_spark.streaming.batch_windows import (
        timed_events,
    )

    ev = (
        timed_events(spark, sf_dir)
        .filter(F.col("user_id").isNotNull())
        .select(
            "event_type",
            "user_id",
            F.date_trunc("hour", "ts").alias("h"),
        )
    )
    first_seen = ev.groupBy("event_type", "user_id").agg(
        F.min("h").alias("h")
    )
    grid = ev.select("event_type", "h").distinct()
    return distinct_curve_frames(first_seen, grid)


def distinct_curve_frames(
    first_seen: DataFrame, grid: DataFrame
) -> DataFrame:
    """SINGLE SOURCE of q65's curve read-off — shared with the
    persisted streaming form (sketch_stream.distinct_curve), which
    feeds the SAME two frames from its state tables so the twins
    can't drift: hourly first-appearance counts left-join the full
    (event_type, h) grid (hours of repeat-only visitors still emit),
    then the running SUM accumulates per type. Everything here runs
    on the ≤ |types|·|hours| grid / |active pairs| frames."""
    news = first_seen.groupBy("event_type", "h").agg(
        F.count(F.lit(1)).alias("new_users")
    )
    # eqNullSafe on event_type: a NULL type is a legitimate key
    joined = grid.alias("g").join(
        news.alias("n"),
        F.col("g.event_type").eqNullSafe(F.col("n.event_type"))
        & (F.col("g.h") == F.col("n.h")),
        "left",
    ).select(
        F.col("g.event_type").alias("event_type"),
        F.col("g.h").alias("hour_start"),
        F.coalesce("n.new_users", F.lit(0)).cast("long").alias(
            "new_users"
        ),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour_start")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        joined.withColumn(
            "cum_users", F.sum("new_users").over(w).cast("long")
        )
        .orderBy(
            F.col("event_type").asc_nulls_first(), F.col("hour_start")
        )
    )


Q65_SQL = """
WITH ev AS (
  SELECT event_type, user_id, DATE_TRUNC('hour', ts) AS h
  FROM events
  WHERE ts IS NOT NULL AND user_id IS NOT NULL
),
curve AS (
  SELECT DISTINCT event_type, h,
         COUNT(DISTINCT user_id) OVER (
           PARTITION BY event_type ORDER BY h) AS cum_users
  FROM ev
)
SELECT event_type, h AS hour_start,
       CAST(cum_users - COALESCE(LAG(cum_users) OVER (
              PARTITION BY event_type ORDER BY h), 0) AS BIGINT)
         AS new_users,
       CAST(cum_users AS BIGINT) AS cum_users
FROM curve
ORDER BY event_type NULLS FIRST, hour_start
"""


# --- q68: interval-union coverage (merge overlapping intervals) ----------

COVER_MIN = 30  # each event covers [ts, ts + 30 min)


def q68_interval_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-UNION coverage per user: each event opens a half-open
    30-minute activity interval; overlapping/touching intervals merge,
    and the report is each user's total covered seconds, interval
    count, and merged-island count — "how much wall-clock was this
    user active", the deduplicated-time complement of q59's "how many
    intervals overlap at once".

    The merge is the classic islands construction, all windows on one
    key: running MAX of interval ends over preceding rows; a row
    starts a NEW island iff its start exceeds every previous end
    (half-open ⇒ touching intervals merge); island id = running sum
    of new-island flags; coverage = Σ per-island (max end − min
    start). All timestamp math is epoch micros (BIGINT) — no interval
    types cross the engine boundary.

    Cross-engine determinism: window order is (ts, event_id) —
    event_id is unique, so duplicate timestamps cannot reorder the
    cummax; the island flag compares a strict `>` of longs.

    Scale shape: ONE hash shuffle on user_id; both windows and the
    final agg reuse that partitioning (per-key sort, no global sort,
    no join). Null-ts events are excluded (no event-time ⇒ no
    interval); a NULL user_id is a real group."""
    e = table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    span = COVER_MIN * 60 * 1_000_000
    iv = e.select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("s"),
        (F.unix_micros("ts") + F.lit(span)).alias("t"),
    )
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("s", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("s", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    prev_end = F.max("t").over(w_prev)
    flagged = iv.withColumn(
        "new_island",
        F.when(prev_end.isNull() | (F.col("s") > prev_end), 1).otherwise(0),
    ).withColumn("island", F.sum("new_island").over(w_run))
    islands = flagged.groupBy("user_id", "island").agg(
        F.min("s").alias("is_s"),
        F.max("t").alias("is_t"),
        F.count(F.lit(1)).alias("n_iv"),
    )
    return (
        islands.groupBy("user_id")
        .agg(
            F.sum("n_iv").cast("long").alias("n_intervals"),
            F.count(F.lit(1)).cast("long").alias("n_islands"),
            F.sum(F.col("is_t") - F.col("is_s")).alias("cov_us"),
        )
        # integer `div` on longs — no double division whose
        # truncate-vs-round cast semantics differ across engines
        .select(
            "user_id",
            "n_intervals",
            "n_islands",
            F.expr("cov_us div 1000000").cast("long").alias("covered_sec"),
        )
        .orderBy(F.col("user_id").asc_nulls_last())
    )


Q68_SQL = f"""
WITH iv AS (
  SELECT user_id, event_id,
         epoch_us(ts) AS s,
         epoch_us(ts) + {COVER_MIN * 60 * 1000000} AS t
  FROM events WHERE ts IS NOT NULL
),
flagged AS (
  SELECT user_id, s, t,
         CASE WHEN MAX(t) OVER (
                PARTITION BY user_id ORDER BY s, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
              ) IS NULL THEN 1
              WHEN s > MAX(t) OVER (
                PARTITION BY user_id ORDER BY s, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
              ) THEN 1 ELSE 0 END AS new_island,
         event_id
  FROM iv
),
numbered AS (
  SELECT user_id, s, t,
         SUM(new_island) OVER (
           PARTITION BY user_id ORDER BY s, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS island
  FROM flagged
),
islands AS (
  SELECT user_id, island,
         MIN(s) AS is_s, MAX(t) AS is_t, COUNT(*) AS n_iv
  FROM numbered GROUP BY user_id, island
)
SELECT user_id,
       CAST(SUM(n_iv) AS BIGINT) AS n_intervals,
       CAST(COUNT(*) AS BIGINT) AS n_islands,
       CAST(SUM(is_t - is_s) // 1000000 AS BIGINT) AS covered_sec
FROM islands
GROUP BY user_id
ORDER BY user_id NULLS LAST
"""


# --- q67: event-sequence pattern matching --------------------------------

# single-char codes make the per-user journey a regex-able string
_SEQ_CODE = (
    "CASE WHEN event_type IS NULL THEN 'n'"
    " WHEN event_type = 'view' THEN 'v'"
    " WHEN event_type = 'click' THEN 'c'"
    " WHEN event_type = 'purchase' THEN 'p'"
    " WHEN event_type = 'signup' THEN 's'"
    " WHEN event_type = 'error' THEN 'e'"
    " ELSE 'x' END"
)
_SEQ_PREFIX = 64


def q67_sequence_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-sequence pattern matching (the sequenceMatch capability
    class): each user's journey becomes an ordered string of
    single-char event codes, and patterns are plain regexes over it —
    ordered funnel reach ('v.*c.*p'), IMMEDIATE view→purchase
    adjacency ('vp', with its first position), and error-then-
    purchase. The regex form expresses adjacency and exclusion
    constraints q53's staged min-aggs cannot ("purchase directly
    after view with nothing between").

    Cross-engine determinism: the sequence order is pinned by
    (ts, event_id) — event_id is unique, so duplicate timestamps
    cannot flip codes; Spark sorts collected (ts, event_id, code)
    structs (field-order lexicographic), DuckDB uses
    string_agg(... ORDER BY ts, event_id). Null-timestamp events are
    excluded (no event-time ⇒ no position in a sequence — the
    time-window family's contract); a NULL user_id is a real group.

    Scale shape: one hash agg keyed on user_id; per-group state is
    the user's code string — bounded by per-user event count, which
    is why the production form runs per SESSION (q28's gap
    sessionization first) or caps the collected array with slice();
    the regexes are then O(|seq|) per user. No window, no join, no
    Python."""
    e = table(spark, sf_dir, "events")
    coded = e.filter(F.col("ts").isNotNull()).select(
        "user_id", "ts", "event_id", F.expr(_SEQ_CODE).alias("code")
    )
    seq_expr = F.concat_ws(
        "",
        F.transform(
            F.array_sort(F.collect_list(F.struct("ts", "event_id", "code"))),
            lambda s: s["code"],
        ),
    )
    agg = coded.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        seq_expr.alias("seq"),
    )
    return agg.select(
        "user_id",
        "n_events",
        F.substring("seq", 1, _SEQ_PREFIX).alias("seq_prefix"),
        F.col("seq").rlike("v.*c.*p").alias("funnel_vcp"),
        (F.instr("seq", "vp") > 0).alias("has_direct_vp"),
        F.instr("seq", "vp").cast("long").alias("first_vp_pos"),
        F.col("seq").rlike("e.*p").alias("error_then_purchase"),
    ).orderBy(F.col("user_id").asc_nulls_last())


Q67_SQL = f"""
WITH coded AS (
  SELECT user_id, ts, event_id, {_SEQ_CODE} AS code
  FROM events WHERE ts IS NOT NULL
),
agg AS (
  SELECT user_id,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         string_agg(code, '' ORDER BY ts, event_id) AS seq
  FROM coded GROUP BY user_id
)
SELECT user_id, n_events,
       SUBSTRING(seq, 1, {_SEQ_PREFIX}) AS seq_prefix,
       regexp_matches(seq, 'v.*c.*p') AS funnel_vcp,
       strpos(seq, 'vp') > 0 AS has_direct_vp,
       CAST(strpos(seq, 'vp') AS BIGINT) AS first_vp_pos,
       regexp_matches(seq, 'e.*p') AS error_then_purchase
FROM agg
ORDER BY user_id NULLS LAST
"""


QUERIES = [
    Query("q08_topk_per_group", q08_topk_per_group, Q08_SQL,
          "row_number top-K per group"),
    Query("q09_running_sum", q09_running_sum, Q09_SQL,
          "running aggregate, explicit ROWS frame"),
    Query("q10_lag_lead", q10_lag_lead, Q10_SQL, "lag/lead/rank"),
    Query("q28_sessionization", q28_sessionization, Q28_SQL,
          "gap-based sessionization (batch twin of session_window)"),
    Query("q29_keep_first", q29_keep_first, Q29_SQL,
          "deterministic keep-first dedup"),
    Query("q44_frame_navigation", q44_frame_navigation, Q44_SQL,
          "first/last/nth_value over explicit full frame"),
    Query("q53_funnel", q53_funnel, Q53_SQL,
          "ordered view->click->purchase funnel (first-X-after-Y "
          "staged aggregation)"),
    Query("q56_mom_growth", q56_mom_growth, Q56_SQL,
          "month-over-month revenue growth (agg + navigation window "
          "over the aggregated series)"),
    Query("q58_scd2_intervals", q58_scd2_intervals, Q58_SQL,
          "SCD type-2 validity intervals from an event stream "
          "(lead-window build)"),
    Query("q59_concurrency", q59_concurrency, Q59_SQL,
          "max concurrent 30-min intervals per type (sweep-line "
          "+1/-1 running sum, tie-order-free)"),
    Query("q61_gaps_islands", q61_gaps_islands, Q61_SQL,
          "gaps-and-islands: contiguous active-day streaks per user "
          "(date-minus-row_number)"),
    Query("q65_running_distinct", q65_running_distinct, Q65_SQL,
          "running distinct users per event_type by hour: first-"
          "occurrence rewrite + running SUM on Spark vs DuckDB's "
          "native COUNT(DISTINCT) OVER"),
    Query("q67_sequence_match", q67_sequence_match, Q67_SQL,
          "event-sequence pattern match: per-user journey as an "
          "order-pinned code string, regex funnel/adjacency/"
          "exclusion patterns (sequenceMatch capability)"),
    Query("q68_interval_coverage", q68_interval_coverage, Q68_SQL,
          "interval-union coverage per user: overlapping activity "
          "intervals merged via running-max islands, total covered "
          "seconds + interval/island counts"),
]
