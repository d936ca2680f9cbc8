"""Time-window operators on the ``events`` table — the batch twins of the
Structured Streaming windowed aggregations (Structured Streaming's core
guarantee is batch/stream semantic equivalence, so these same aggregation
expressions run under ``readStream`` in streaming/job.py; here they are
verified against the DuckDB oracle in batch mode).

- w01 tumbling window (1 h)
- w02 sliding window (1 h size, 30 min slide — each event in 2 windows)
- w03 session window (30 min gap)
- w04 stream-static dim enrichment + tumbling agg
- w05 first-touch attribution (stream-stream join twin)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka2clickhouse_py_streamer_spark.operators.base import Query, table


def timed_events(spark, sf_dir):
    """events with a non-null event time — the w-ops' shared contract:
    an event without a timestamp cannot be placed in any window (under
    readStream it could never pass a watermark either), so time-window
    analytics exclude it on BOTH engines (`WHERE ts IS NOT NULL`)."""
    return table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())


def w01_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows: F.window() aligned to the epoch, so the
    window start equals date_trunc('hour') for hour-sized windows."""
    e = timed_events(spark, sf_dir)
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
        .orderBy("window_start", "event_type")
    )


W01_SQL = """
SELECT DATE_TRUNC('hour', ts) AS window_start, event_type,
       COUNT(*) AS n_events,
       ROUND(SUM(value), 4) AS sum_value
FROM events WHERE ts IS NOT NULL
GROUP BY DATE_TRUNC('hour', ts), event_type
ORDER BY window_start, event_type
"""


def w02_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (1 h / 30 min): every event lands in exactly two
    windows; Spark's window() expands rows internally (an Expand node —
    row growth is size/slide, bounded and predictable at scale)."""
    e = timed_events(spark, sf_dir)
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # +1e-7 before rounding: AVG of limited-decimal inputs lands
            # exactly on decimal half-points, where ~1e-12 summation-
            # order noise flips ROUND between engines; the shared shift
            # moves the boundary off the half-point for both
            F.round(F.avg("value") + 1e-7, 4).alias("avg_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "avg_value")
        .orderBy("window_start")
    )


# Oracle expands each event into its two enclosing windows explicitly:
# starts at trunc-to-30min and trunc-to-30min minus 30min.
W02_SQL = """
WITH expanded AS (
  SELECT ts, value,
         UNNEST([to_timestamp(FLOOR(epoch(ts) / 1800) * 1800),
                 to_timestamp(FLOOR(epoch(ts) / 1800) * 1800 - 1800)]) AS window_start
  FROM events WHERE ts IS NOT NULL
)
SELECT CAST(window_start AS TIMESTAMP) AS window_start,
       COUNT(*) AS n_events,
       ROUND(AVG(value) + 1e-7, 4) AS avg_value
FROM expanded
WHERE ts >= window_start AND ts < window_start + INTERVAL 1 HOUR
GROUP BY window_start
ORDER BY window_start
"""


def w03_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30 min gap) per user via F.session_window — the
    same expression works under readStream with a watermark. A new
    session starts only when the gap is STRICTLY greater than 30 min:
    Spark merges an event exactly gap-distant from the previous one
    (the window end is inclusive for merging) — verified empirically by
    the adversarial sweep's exact-1800 s fixture; an oracle with
    ``>= 1800`` splits that boundary pair and silently disagrees."""
    e = timed_events(spark, sf_dir)
    return (
        e.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("session_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "n_events",
            "session_value",
        )
        .orderBy("user_id", "session_start")
    )


W03_SQL = """
WITH flagged AS (
  SELECT user_id, ts, value,
         CASE WHEN epoch(ts) - LAG(epoch(ts)) OVER w > 1800.0
              OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_sess
  FROM events WHERE ts IS NOT NULL
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
),
sess AS (
  SELECT user_id, ts, value,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM flagged
)
SELECT user_id, MIN(ts) AS session_start,
       COUNT(*) AS n_events,
       ROUND(SUM(value), 4) AS session_value
FROM sess
GROUP BY user_id, session_id
ORDER BY user_id, session_start
"""


def w04_enriched_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment: events joined to the customer dimension
    (user_id = c_custkey), then tumbling-1h aggregation per market
    segment — the canonical readStream-join-static-dim pattern
    (Structured Streaming executes the same plan per micro-batch with
    the dimension broadcast once per batch). The dim side is explicitly
    broadcast: at 100 TB the event stream NEVER shuffles for the join —
    the only exchange is the windowed agg's."""
    e = timed_events(spark, sf_dir)
    c = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    return (
        e.join(F.broadcast(c), "user_id")
        .groupBy(F.window("ts", "1 hour").alias("w"), "c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("c_mktsegment").alias("segment"),
            "n_events",
            "sum_value",
        )
        .orderBy("window_start", "segment")
    )


W04_SQL = """
SELECT DATE_TRUNC('hour', e.ts) AS window_start,
       c.c_mktsegment AS segment,
       COUNT(*) AS n_events,
       ROUND(SUM(e.value), 4) AS sum_value
FROM events e
JOIN customer c ON c.c_custkey = e.user_id
WHERE e.ts IS NOT NULL
GROUP BY DATE_TRUNC('hour', e.ts), c.c_mktsegment
ORDER BY window_start, segment
"""


ATTRIBUTION_WINDOW_US = 4 * 3600 * 1_000_000  # 4 h view->click horizon


def w05_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch attribution: each ``view`` is attributed to the
    EARLIEST ``click`` by the same user within the next 4 hours — the
    batch twin of the watermarked stream-stream join (equi key +
    event-time range is exactly the shape Structured Streaming keeps
    bounded state for; see streaming tests in test_stream_join.py).

    Scale shape: one hash-partitionable equi-join on user_id (the time
    range is a post-join filter, NOT a theta join — no nested loop),
    then min(struct) per view for the first click. Per-user state is
    bounded by the 4 h horizon, the same bound the streaming watermark
    enforces. Microsecond integer arithmetic keeps both engines exact."""
    e = timed_events(spark, sf_dir)
    views = e.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        "user_id",
        F.unix_micros("ts").alias("t_view"),
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.unix_micros("ts").alias("t_click"),
    )
    return (
        views.join(clicks, "user_id")
        .filter(
            (F.col("t_click") >= F.col("t_view"))
            & (F.col("t_click") <= F.col("t_view") + ATTRIBUTION_WINDOW_US)
        )
        # t_view is functionally dependent on view_id; keeping it in the
        # grouping keys avoids a second join back to the view side.
        .groupBy("view_id", "user_id", "t_view")
        .agg(F.min(F.struct("t_click", "click_id")).alias("f"))
        .select(
            "view_id",
            "user_id",
            F.col("f.click_id").alias("click_id"),
            (F.col("f.t_click") - F.col("t_view")).alias("delta_us"),
        )
        .orderBy("view_id")
    )


W05_SQL = """
WITH v AS (
  SELECT event_id AS view_id, user_id, epoch_us(ts) AS t_view
  FROM events WHERE event_type = 'view' AND ts IS NOT NULL
),
c AS (
  SELECT event_id AS click_id, user_id, epoch_us(ts) AS t_click
  FROM events WHERE event_type = 'click' AND ts IS NOT NULL
),
ranked AS (
  SELECT v.view_id, v.user_id, c.click_id,
         c.t_click - v.t_view AS delta_us,
         ROW_NUMBER() OVER (PARTITION BY v.view_id
                            ORDER BY c.t_click ASC, c.click_id ASC) AS rn
  FROM v JOIN c
    ON c.user_id = v.user_id
   AND c.t_click >= v.t_view
   AND c.t_click <= v.t_view + 14400000000
)
SELECT view_id, user_id, click_id, delta_us
FROM ranked WHERE rn = 1
ORDER BY view_id
"""


def w06_window_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-window audience: exact distinct users + the HLL estimate per
    tumbling hour — the metric pair a streaming dashboard carries.

    Streaming posture: the exact countDistinct's state grows with the
    window's user set; under ``readStream`` the HLL
    (approx_count_distinct) column is the production aggregate —
    constant state per window — while the exact twin here is the batch
    calibration, checked by the same boolean bound pattern as q27
    (sketch values can't hash-match across engines)."""
    e = timed_events(spark, sf_dir)
    agg = e.groupBy(F.window("ts", "1 hour").alias("w")).agg(
        F.countDistinct("user_id").alias("n_users"),
        F.approx_count_distinct("user_id", 0.02).alias("hll_users"),
        F.count(F.lit(1)).alias("n_events"),
    )
    return agg.select(
        F.col("w.start").alias("window_start"),
        F.col("n_users").cast("long").alias("n_users"),
        # rsd pinned to 0.02 (hour windows hold 10-170 users, where the
        # default 0.05 sketch wanders ±20% relative); measured envelope
        # abs ≤ 2 at sf0.01, rel ≤ 3.8% at sf0.1. Bound = max(3, 5%) —
        # catches a broken sketch, honest about small-cardinality noise.
        (
            F.abs(F.col("hll_users") - F.col("n_users"))
            <= F.greatest(F.lit(3.0), 0.05 * F.col("n_users"))
        ).alias("hll_within_bound"),
        F.col("n_events").cast("long").alias("n_events"),
    ).orderBy("window_start")


W06_SQL = """
SELECT DATE_TRUNC('hour', ts) AS window_start,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       TRUE AS hll_within_bound,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM events WHERE ts IS NOT NULL
GROUP BY DATE_TRUNC('hour', ts)
ORDER BY window_start
"""


def w07_window_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-window trending items: the top-3 event types by count inside
    each tumbling hour, with a deterministic (count DESC, type ASC)
    tiebreak — the "what's hot right now" feed.

    Streaming posture: the windowed count agg runs under readStream
    unchanged; the rank-and-cut runs per completed window in
    foreachBatch (windows finalize under the watermark, so ranking a
    window is a pure batch step over ≤|event types| rows). Scale shape:
    one windowed hash agg (map-side combinable), then a window-function
    sort over tiny per-hour groups — no global sort anywhere."""
    e = timed_events(spark, sf_dir)
    counts = e.groupBy(
        F.window("ts", "1 hour").alias("w"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n_events"))
    rk = F.row_number().over(
        Window.partitionBy("w").orderBy(
            # explicit null placement: a NULL event_type tied with a
            # non-null type would otherwise rank first on Spark and
            # last on DuckDB
            F.desc("n_events"), F.asc_nulls_last("event_type")
        )
    )
    return (
        counts.withColumn("rank", rk.cast("long"))
        .filter(F.col("rank") <= 3)
        .select(
            F.col("w.start").alias("window_start"),
            "rank",
            "event_type",
            "n_events",
        )
        .orderBy("window_start", "rank")
    )


W07_SQL = """
WITH counts AS (
  SELECT DATE_TRUNC('hour', ts) AS window_start, event_type,
         COUNT(*) AS n_events
  FROM events WHERE ts IS NOT NULL
  GROUP BY DATE_TRUNC('hour', ts), event_type
),
ranked AS (
  SELECT window_start, event_type, n_events,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY window_start
           ORDER BY n_events DESC, event_type ASC NULLS LAST) AS BIGINT) AS rank
  FROM counts
)
SELECT window_start, rank, event_type, n_events
FROM ranked WHERE rank <= 3
ORDER BY window_start, rank
"""


LATE_THRESHOLD_S = 600  # 10 min — the candidate watermark delay


def w08_disorder_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-orderness profile — the measurement that CALIBRATES a
    watermark instead of guessing it: per event type, how far behind
    the running event-time high-water mark (in ingest order, event_id)
    do events arrive, and how many would be dropped by a 10-minute
    watermark. ``max_disorder_s`` is the smallest per-key delay that
    loses nothing; a global watermark takes the max over keys.

    Scale shape: one window shuffle partitioned by event_type (running
    max over ingest order — per-key, so no SinglePartition funnel),
    then a partial+final agg on the same key. Null-ts events are
    excluded (they could never be placed anyway)."""
    e = timed_events(spark, sf_dir)
    w = (
        Window.partitionBy("event_type")
        .orderBy(F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    disorder = F.greatest(
        F.lit(0.0),
        F.max(F.col("ts").cast("double")).over(w)
        - F.col("ts").cast("double"),
    )
    return (
        e.select("event_type", "event_id", disorder.alias("disorder_s"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(
                F.when(F.col("disorder_s") > LATE_THRESHOLD_S, 1)
                .otherwise(0)
            ).cast("long").alias("n_late_at_10m"),
            F.round(F.max("disorder_s"), 3).alias("max_disorder_s"),
            F.round(F.avg("disorder_s"), 3).alias("avg_disorder_s"),
        )
        .orderBy("event_type")
    )


W08_SQL = f"""
WITH d AS (
  SELECT event_type, event_id,
         GREATEST(0.0,
           MAX(epoch(ts)) OVER (PARTITION BY event_type
                                ORDER BY event_id ASC
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING)
           - epoch(ts)) AS disorder_s
  FROM events WHERE ts IS NOT NULL
)
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CASE WHEN disorder_s > {LATE_THRESHOLD_S}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_late_at_10m,
       ROUND(MAX(disorder_s), 3) AS max_disorder_s,
       ROUND(AVG(disorder_s), 3) AS avg_disorder_s
FROM d
GROUP BY event_type
ORDER BY event_type
"""


def _hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared hourly rollup for the time-series ops (w09/w10): count +
    rounded sum per (event_type, hour). Rounding happens HERE, once, so
    downstream forward-fill/z-score propagate identical values on both
    engines."""
    e = timed_events(spark, sf_dir)
    return (
        e.groupBy(
            "event_type", F.date_trunc("hour", "ts").alias("h")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("s"),
        )
    )


_HOURLY_SQL = """
  SELECT event_type, DATE_TRUNC('hour', ts) AS h,
         COUNT(*) AS n, ROUND(SUM(value), 4) AS s
  FROM events WHERE ts IS NOT NULL
  GROUP BY event_type, DATE_TRUNC('hour', ts)
"""


def w09_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resample + forward-fill: a dense hourly grid per
    event type (min..max observed hour), hours with no events flagged
    as gaps and their value forward-filled from the last observed hour.

    Scale shape: the grid is generated from a |keys|-row bounds
    aggregate (sequence + explode — grid rows ≈ keys × hours, never a
    cross join of raw events); the grid joins the hourly rollup on
    (type, hour) — an equi-join between two AGGREGATED frames; the
    forward-fill is one keyed window (last value, ignore nulls). Raw
    events are touched exactly once."""
    hourly = _hourly(spark, sf_dir).alias("hr")
    bounds = hourly.groupBy("event_type").agg(
        F.min("h").alias("hmin"), F.max("h").alias("hmax")
    )
    grid = bounds.select(
        "event_type",
        F.explode(
            F.sequence("hmin", "hmax", F.expr("INTERVAL 1 HOUR"))
        ).alias("h"),
    ).alias("g")
    w = (
        Window.partitionBy("g.event_type")
        .orderBy("g.h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # eqNullSafe on the type key: a NULL event_type is a real group in
    # the rollup (and in the grid bounds) — a plain equi-join would
    # never match it back, silently zeroing its observed hours and
    # mislabeling them as gaps on BOTH engines (the oracle mirrors
    # with IS NOT DISTINCT FROM)
    return (
        grid.join(
            hourly,
            F.col("g.event_type").eqNullSafe(F.col("hr.event_type"))
            & (F.col("g.h") == F.col("hr.h")),
            "left",
        )
        .select(
            F.col("g.event_type").alias("event_type"),
            F.col("g.h").alias("hour_start"),
            F.coalesce("hr.n", F.lit(0)).cast("long").alias("n_events"),
            F.last("hr.s", ignorenulls=True).over(w).alias("filled_sum"),
            F.col("hr.n").isNull().alias("is_gap"),
        )
        .orderBy("event_type", "hour_start")
    )


W09_SQL = f"""
WITH hourly AS ({_HOURLY_SQL}),
bounds AS (
  SELECT event_type, MIN(h) AS hmin, MAX(h) AS hmax
  FROM hourly GROUP BY event_type
),
grid AS (
  SELECT event_type,
         UNNEST(generate_series(hmin, hmax, INTERVAL 1 HOUR)) AS h
  FROM bounds
)
SELECT g.event_type, g.h AS hour_start,
       CAST(COALESCE(hourly.n, 0) AS BIGINT) AS n_events,
       last_value(hourly.s IGNORE NULLS)
         OVER (PARTITION BY g.event_type ORDER BY g.h
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS filled_sum,
       hourly.n IS NULL AS is_gap
FROM grid g LEFT JOIN hourly
  ON g.event_type IS NOT DISTINCT FROM hourly.event_type
 AND g.h = hourly.h
ORDER BY g.event_type, hour_start
"""


def w10_rate_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-rate anomaly detection: z-score of each hour's event count
    against the TRAILING 24 observed hours (excluding the current hour
    — the baseline must not contain the point under test). Hours with
    fewer than 2 baseline points, or a zero-variance baseline, yield a
    NULL z-score (never an anomaly) on both engines via NULLIF.

    Scale shape: one hash agg to hourly counts, then one keyed window
    over the AGGREGATED series (|keys| × hours rows, not raw events);
    the explicit ROWS frame keeps state bounded at 24 rows per key —
    the same shape a streaming job maintains incrementally."""
    hourly = _hourly(spark, sf_dir)
    w = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(-24, -1)
    )
    nn = F.col("n").cast("double")
    base_avg = F.avg(nn).over(w)
    base_std = F.stddev_samp(nn).over(w)
    z = (nn - base_avg) / F.nullif(base_std, F.lit(0.0))
    return (
        hourly.select(
            "event_type",
            F.col("h").alias("hour_start"),
            F.col("n").cast("long").alias("n_events"),
            F.round(z, 4).alias("z_score"),
            F.coalesce(F.abs(z) > 3.0, F.lit(False)).alias("is_anomaly"),
        )
        .orderBy("event_type", "hour_start")
    )


W10_SQL = f"""
WITH hourly AS ({_HOURLY_SQL}),
scored AS (
  SELECT event_type, h,
         CAST(n AS BIGINT) AS n_events,
         (CAST(n AS DOUBLE)
          - AVG(CAST(n AS DOUBLE)) OVER tw)
         / NULLIF(STDDEV_SAMP(CAST(n AS DOUBLE)) OVER tw, 0.0) AS z
  FROM hourly
  WINDOW tw AS (PARTITION BY event_type ORDER BY h
                ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
)
SELECT event_type, h AS hour_start, n_events,
       ROUND(z, 4) AS z_score,
       COALESCE(ABS(z) > 3.0, FALSE) AS is_anomaly
FROM scored
ORDER BY event_type, hour_start
"""


def w11_rollup_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-aggregate cascade (the hypertable rollup pattern):
    ONE scan builds the hourly rollup; the daily tier re-aggregates the
    HOURLY frame (24× fewer rows), the monthly tier re-aggregates the
    DAILY frame — sums of sums, counts of counts, avg recomposed as
    sum/count at each tier. All three resolutions union into one frame.

    This is the maintenance shape a streaming deployment runs: the
    watermarked hourly agg is the only operator that ever sees raw
    events (proven live for this rollup in the w10 twin test); coarser
    tiers are cheap periodic re-aggregations of the stored tier below.

    Rounding discipline: raw sums cascade unrounded; every tier rounds
    only at output, so the engines' summation-order noise is absorbed
    once per row, never compounded."""
    e = timed_events(spark, sf_dir)
    hourly = e.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("b")
    ).agg(
        F.count(F.lit(1)).alias("n"), F.sum("value").alias("s")
    )
    daily = hourly.groupBy(
        "event_type", F.date_trunc("day", "b").alias("b")
    ).agg(F.sum("n").alias("n"), F.sum("s").alias("s"))
    monthly = daily.groupBy(
        "event_type", F.date_trunc("month", "b").alias("b")
    ).agg(F.sum("n").alias("n"), F.sum("s").alias("s"))

    def finish(df: DataFrame, res: str) -> DataFrame:
        return df.select(
            F.lit(res).alias("resolution"),
            "event_type",
            F.col("b").alias("bucket_start"),
            F.col("n").cast("long").alias("n_events"),
            F.round("s", 4).alias("sum_value"),
            # +1e-9 before rounding: integer-count divisions land
            # exactly on decimal half-points (3609.66/64 = 56.4009375)
            # where last-ulp noise flips ROUND between engines — the
            # shared shift moves the boundary off the half-point (w02)
            F.round(F.col("s") / F.col("n") + 1e-9, 6).alias("avg_value"),
        )

    return (
        finish(hourly, "hour")
        .unionAll(finish(daily, "day"))
        .unionAll(finish(monthly, "month"))
        .orderBy("resolution", "event_type", "bucket_start")
    )


W11_SQL = """
WITH hourly AS (
  SELECT event_type, DATE_TRUNC('hour', ts) AS b,
         COUNT(*) AS n, SUM(value) AS s
  FROM events WHERE ts IS NOT NULL
  GROUP BY event_type, DATE_TRUNC('hour', ts)
),
daily AS (
  SELECT event_type, DATE_TRUNC('day', b) AS b,
         SUM(n) AS n, SUM(s) AS s
  FROM hourly GROUP BY event_type, DATE_TRUNC('day', b)
),
monthly AS (
  SELECT event_type, DATE_TRUNC('month', b) AS b,
         SUM(n) AS n, SUM(s) AS s
  FROM daily GROUP BY event_type, DATE_TRUNC('month', b)
)
SELECT 'hour' AS resolution, event_type, b AS bucket_start,
       CAST(n AS BIGINT) AS n_events, ROUND(s, 4) AS sum_value,
       ROUND(s / n + 1e-9, 6) AS avg_value
FROM hourly
UNION ALL
SELECT 'day', event_type, b, CAST(n AS BIGINT), ROUND(s, 4),
       ROUND(s / n + 1e-9, 6)
FROM daily
UNION ALL
SELECT 'month', event_type, b, CAST(n AS BIGINT), ROUND(s, 4),
       ROUND(s / n + 1e-9, 6)
FROM monthly
ORDER BY resolution, event_type, bucket_start
"""


CM_ROWS = 3  # count-min depth (independent hash rows)
CM_WIDTH = 16  # counters per row — deliberately << |users| so the
# audit SHOWS collision overestimate instead of hiding it


def _cm_bucket(j: int, key):
    """Row-j count-min bucket: the shared affine family
    (functions.hashing.affine_bucket — same construction d18's Bloom
    positions use)."""
    from kafka2clickhouse_py_streamer_spark.functions import affine_bucket

    return affine_bucket(key, j, CM_WIDTH)


def cm_bucket_pairs(df: DataFrame, key_col: str, keep_key: bool = False):
    """SINGLE SOURCE of the (j, bucket) explode for the count-min
    grid — the sketch update (w12 cells, streaming _batch_cells) and
    the probe side (w12 probes, streaming countmin_estimates) must
    hash identically or the streaming/batch twin silently breaks.
    Returns (key?, j, bucket) rows."""
    cols = ([key_col] if keep_key else []) + ["c.j", "c.bucket"]
    return df.select(
        *([key_col] if keep_key else []),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        _cm_bucket(j, F.col(key_col)).alias("bucket"),
                    )
                    for j in range(CM_ROWS)
                ]
            )
        ).alias("c"),
    ).select(*cols)


def w12_countmin_heavyhitters(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Count-min sketch heavy hitters (Cormode & Muthukrishnan 2005):
    per-user event counts estimated from a fixed CM_ROWS×CM_WIDTH
    counter grid, audited against exact counts — top-10 users by
    estimate with their overestimate. The sketch never underestimates
    (est ≥ exact always — asserted by the llm-invariants suite) and
    the audit shows exactly how much the 48-cell grid overcounts at
    the fixture's cardinality.

    Scale shape: THE streaming-frequency pattern — the sketch update
    is a row-local explode into (row, bucket) pairs whose count
    aggregate map-side combines to ≤ CM_ROWS×CM_WIDTH rows PER
    PARTITION regardless of event volume, and sketches merge by
    cell-wise addition (the same agg), so state is O(k·w) while exact
    per-key state is O(|keys|). The probe side joins the 48-row
    sketch broadcast. The exact twin here exists only for the audit;
    a deployment keeps the sketch alone."""
    ev = table(spark, sf_dir, "events").select("user_id")
    sketch = cm_bucket_pairs(ev, "user_id").groupBy("j", "bucket").agg(
        F.count(F.lit(1)).alias("cell")
    )
    probes = cm_bucket_pairs(ev.distinct(), "user_id", keep_key=True)
    est = (
        probes.join(F.broadcast(sketch), ["j", "bucket"])
        .groupBy("user_id")
        .agg(F.min("cell").cast("long").alias("est"))
    )
    exact = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("exact")
    )
    # top-10 via orderBy().limit() -> TakeOrderedAndProject (per-
    # partition heaps + driver merge); the rank window then runs on
    # the 10-row result, never on the |users|-sized frame (a bare
    # global row_number would funnel every user through one task)
    top = (
        est.join(exact, "user_id")
        .orderBy(F.col("est").desc(), F.col("user_id").asc())
        .limit(10)
    )
    w = Window.orderBy(F.col("est").desc(), F.col("user_id").asc())
    return (
        top.withColumn("rk", F.row_number().over(w).cast("long"))
        .select(
            "user_id",
            "est",
            "exact",
            (F.col("est") - F.col("exact")).cast("long").alias("overest"),
            "rk",
        )
        .orderBy("rk")
    )


def _cm_bucket_sql(j: int, key: str) -> str:
    from kafka2clickhouse_py_streamer_spark.functions import (
        affine_bucket_sql,
    )

    return affine_bucket_sql(key, j, CM_WIDTH)


def _w12_sql() -> str:
    cell_rows = "\nUNION ALL\n".join(
        f"SELECT {j} AS j, {_cm_bucket_sql(j, 'user_id')} AS bucket"
        f" FROM events"
        for j in range(CM_ROWS)
    )
    probe_rows = "\nUNION ALL\n".join(
        f"SELECT user_id, {j} AS j,"
        f" {_cm_bucket_sql(j, 'user_id')} AS bucket"
        f" FROM (SELECT DISTINCT user_id FROM events)"
        for j in range(CM_ROWS)
    )
    return f"""
WITH cells AS (
{cell_rows}
),
sketch AS (
  SELECT j, bucket, COUNT(*) AS cell FROM cells GROUP BY j, bucket
),
probes AS (
{probe_rows}
),
est AS (
  SELECT p.user_id, CAST(MIN(s.cell) AS BIGINT) AS est
  FROM probes p JOIN sketch s ON s.j = p.j AND s.bucket = p.bucket
  GROUP BY p.user_id
),
exact AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS exact
  FROM events GROUP BY user_id
),
ranked AS (
  SELECT e.user_id, e.est, x.exact,
         CAST(e.est - x.exact AS BIGINT) AS overest,
         CAST(ROW_NUMBER() OVER (ORDER BY e.est DESC, e.user_id ASC)
              AS BIGINT) AS rk
  FROM est e JOIN exact x ON x.user_id = e.user_id
)
SELECT user_id, est, exact, overest, rk
FROM ranked WHERE rk <= 10
ORDER BY rk
"""


HIST_BINS = 32
HIST_LO = 0.0
HIST_HI = 512.0
HIST_W = (HIST_HI - HIST_LO) / HIST_BINS  # 16.0 per bin
HIST_QS = (0.5, 0.9, 0.99)


def hist_cells(df: DataFrame, value_col: str = "value") -> DataFrame:
    """SINGLE SOURCE of the fixed-bound equi-width histogram cells —
    the w13 batch sketch and its streaming twin must bin identically
    (same discipline as `cm_bucket_pairs`). NULL and NaN are dropped
    (NaN poisons every comparison); ±Inf and out-of-range values clamp
    to the edge bins, so the sketch never drops a finite-rank value.
    Returns (bin, cnt) — ≤ HIST_BINS rows, mergeable by addition."""
    binned = F.least(
        F.lit(HIST_BINS - 1),
        F.greatest(
            F.lit(0),
            F.floor((F.col(value_col) - HIST_LO) / HIST_W),
        ),
    ).cast("int")
    return (
        df.filter(F.col(value_col).isNotNull() & ~F.isnan(value_col))
        .select(binned.alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def hist_quantiles_from_cells(cells: DataFrame) -> DataFrame:
    """(q, n, raw_est) read off a (bin, cnt) cell frame by linear
    interpolation inside the bin where the cumulative count crosses
    q·N — SINGLE SOURCE shared by the w13 batch audit and the
    persisted streaming sketch's estimates (sketch_stream), so the
    two can't disagree on the read-off arithmetic. All windows/joins
    here run on the ≤ HIST_BINS-row sketch, never the data."""
    spark = cells.sparkSession
    wspec = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, -1
    )
    cum = cells.select(
        "bin",
        "cnt",
        F.coalesce(F.sum("cnt").over(wspec), F.lit(0))
        .cast("long")
        .alias("cum_prev"),
    )
    total = cells.agg(F.sum("cnt").cast("long").alias("n"))
    qs = spark.range(1).select(
        F.explode(
            F.array(*[F.lit(float(q)) for q in HIST_QS])
        ).alias("q")
    )
    hit = (
        qs.crossJoin(F.broadcast(total))
        .crossJoin(F.broadcast(cum))
        .filter(
            (F.col("cum_prev") + F.col("cnt")) >= F.col("q") * F.col("n")
        )
        .groupBy("q", "n")
        .agg(F.min("bin").alias("bin"))
        .join(F.broadcast(cum), "bin")
    )
    est = (
        F.lit(HIST_LO)
        + F.col("bin") * F.lit(HIST_W)
        + (F.col("q") * F.col("n") - F.col("cum_prev"))
        / F.col("cnt")
        * F.lit(HIST_W)
    )
    return hit.select("q", "n", est.alias("raw_est"))


def w13_histogram_quantiles(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Mergeable equi-width histogram quantile sketch, audited against
    exact percentiles — the quantile sibling of w12's count-min: a
    fixed HIST_BINS-cell grid summarizes the value stream (cells merge
    by addition, so the sketch streams and shards trivially), and each
    quantile is read off by linear interpolation inside the bin where
    the cumulative count crosses q·N. The audit reports the estimate
    next to the exact percentile and the absolute error (≤ one bin
    width for in-range data — asserted by the invariants suite).

    Scale shape: the update is ONE hash agg that map-side combines to
    ≤ HIST_BINS rows per partition regardless of stream volume; the
    cumulative window runs on the ≤ 32-row sketch, never the data. The
    exact side (Spark `percentile` ≡ DuckDB `quantile_cont`, verified
    bit-identical) exists only for the audit — a deployment keeps the
    sketch alone. The same cells under a streaming groupBy are the
    built-in-aggregation streaming twin (tests/test_streaming.py)."""
    ev = table(spark, sf_dir, "events").select("value")
    clean = ev.filter(
        F.col("value").isNotNull() & ~F.isnan("value")
    )
    hit = hist_quantiles_from_cells(hist_cells(ev))
    exact_agg = clean.agg(
        *[
            F.expr(f"percentile(value, {q}D)").alias(f"e{i}")
            for i, q in enumerate(HIST_QS)
        ]
    )
    exact = exact_agg.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(float(q)).alias("q"),
                        F.col(f"e{i}").alias("exact_q"),
                    )
                    for i, q in enumerate(HIST_QS)
                ]
            )
        ).alias("x")
    ).select("x.*")
    scored = hit.join(F.broadcast(exact), "q")
    return scored.select(
        "q",
        F.col("n").alias("n_values"),
        F.round("raw_est", 6).alias("est_q"),
        F.round("exact_q", 6).alias("exact_q"),
        F.round(F.abs(F.col("raw_est") - F.col("exact_q")), 6).alias(
            "abs_err"
        ),
    ).orderBy("q")


def _w13_sql() -> str:
    exact_rows = "\nUNION ALL\n".join(
        f"  SELECT CAST({q} AS DOUBLE) AS q,"
        f" quantile_cont(value, {q}) AS exact_q FROM vals"
        for q in HIST_QS
    )
    q_list = ", ".join(f"CAST({q} AS DOUBLE)" for q in HIST_QS)
    return f"""
WITH vals AS (
  SELECT value FROM events
  WHERE value IS NOT NULL AND NOT isnan(value)
),
cells AS (
  SELECT CAST(LEAST({HIST_BINS - 1}, GREATEST(0,
           FLOOR((value - {HIST_LO}) / {HIST_W}))) AS INT) AS bin,
         COUNT(*) AS cnt
  FROM vals GROUP BY 1
),
cum AS (
  SELECT bin, cnt,
         CAST(COALESCE(SUM(cnt) OVER (ORDER BY bin
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS cum_prev
  FROM cells
),
total AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM cells),
qs AS (SELECT UNNEST([{q_list}]) AS q),
hit AS (
  SELECT q, n, MIN(bin) AS bin
  FROM qs, total, cum
  WHERE cum_prev + cnt >= q * n
  GROUP BY q, n
),
est AS (
  SELECT h.q, h.n,
         {HIST_LO} + h.bin * {HIST_W}
         + (h.q * h.n - c.cum_prev) / c.cnt * {HIST_W} AS raw_est
  FROM hit h JOIN cum c ON c.bin = h.bin
),
exact AS (
{exact_rows}
)
SELECT e.q, e.n AS n_values,
       ROUND(e.raw_est, 6) AS est_q,
       ROUND(x.exact_q, 6) AS exact_q,
       ROUND(ABS(e.raw_est - x.exact_q), 6) AS abs_err
FROM est e JOIN exact x ON x.q = e.q
ORDER BY e.q
"""


DECAY_HALF_LIFE_US = 6 * 3600 * 1_000_000  # 6h mass half-life
# decay rate per microsecond; the SAME python float is inlined into the
# Spark literal and (via repr) the oracle SQL, so both engines compute
# bit-identical per-row weights
_DECAY_K = 0.6931471805599453 / DECAY_HALF_LIFE_US


def decayed_cells(df: DataFrame) -> DataFrame:
    """Per event_type: exponentially time-decayed event mass relative
    to the ``t_ref_us`` column — weight = exp(-ln2·Δt/half-life), so an
    event contributes 1.0 at the reference instant and half that every
    6 h earlier. The decayed sum is ADDITIVE, which is the whole point:
    cells merge across partitions, shards, and micro-batches by plain
    addition, so the identical expression runs under a built-in
    complete-mode streaming groupBy (twin-tested) — no custom state.
    Null-timestamp events are excluded (no event-time ⇒ no decay
    position ⇒ the standing streaming contract)."""
    w = F.exp(
        (
            F.unix_micros("ts").cast("double")
            - F.col("t_ref_us").cast("double")
        )
        * F.lit(_DECAY_K)
    )
    return (
        df.filter(F.col("ts").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(w).alias("decayed_raw"),
        )
    )


def w14_decayed_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially decayed per-key event rate — the recency-weighted
    activity counter behind trending/health dashboards: each event's
    mass halves every DECAY_HALF_LIFE_US before the stream's newest
    timestamp, so ``decayed_count`` measures *recent* volume and
    ``freshness`` (decayed/raw) separates currently-active keys from
    historically-active ones.

    Scale shape: the reference instant is a one-row broadcast bounds
    agg (q54's broadcast-global-bounds pattern — no SinglePartition
    window over the fact table); the decayed mass is ONE hash agg that
    map-side combines to |event_type| rows per partition. Weights are
    ≤ 1, so the float sum's cross-engine accumulation-order drift is
    bounded by ~n·ulp(n) ≪ the 1e-6 round — no ordered-sum pinning
    needed (unlike value-weighted sums, deliberately not emitted
    here)."""
    ev = table(spark, sf_dir, "events").select("ts", "event_type")
    bounds = ev.agg(
        F.max(F.unix_micros("ts")).alias("t_ref_us")
    )
    cells = decayed_cells(ev.crossJoin(F.broadcast(bounds)))
    return cells.select(
        "event_type",
        "n_events",
        F.round("decayed_raw", 6).alias("decayed_count"),
        F.round(
            F.col("decayed_raw") / F.col("n_events").cast("double"), 6
        ).alias("freshness"),
    ).orderBy("event_type")


def _w14_sql() -> str:
    return f"""
WITH ev AS (
  SELECT ts, event_type FROM events WHERE ts IS NOT NULL
),
bounds AS (
  SELECT MAX(epoch_us(ts)) AS t_ref_us FROM ev
),
cells AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         SUM(EXP((CAST(epoch_us(ts) AS DOUBLE)
                  - CAST(t_ref_us AS DOUBLE)) * {_DECAY_K!r}))
           AS decayed_raw
  FROM ev, bounds
  GROUP BY event_type
)
SELECT event_type, n_events,
       ROUND(decayed_raw, 6) AS decayed_count,
       ROUND(decayed_raw / CAST(n_events AS DOUBLE), 6) AS freshness
FROM cells
ORDER BY event_type
"""


HLL_REGS = 256  # 2^8 registers (first 2 md5 hex chars)
HLL_REM_BITS = 56  # remainder width (next 14 hex chars)
# alpha_m * m^2 * 2^57 — the raw-estimate numerator with the register
# sum pre-scaled to integers (see hll_registers); the SAME python float
# is inlined into the Spark literal and (via repr) the oracle SQL
_HLL_ALPHA_NUM = (
    0.7213 / (1 + 1.079 / HLL_REGS)
    * HLL_REGS * HLL_REGS * 2.0 ** (HLL_REM_BITS + 1)
)
_HLL_LC_CUT = 2.5 * HLL_REGS  # small-range (linear counting) switch
HLL_REL_BOUND = 0.2  # 3σ = 3·1.04/√256 ≈ 0.195 for the raw regime


def hll_registers(
    df: DataFrame, key_col: str = "user_id",
    scope_col: str = "event_type",
) -> DataFrame:
    """SINGLE SOURCE of the per-scope HLL register sketch — the w15
    batch audit and the persisted streaming sketch (sketch_stream)
    must hash identically or the twin breaks (`cm_bucket_pairs`
    discipline). One md5 of the key splits into an 8-bit register
    index and a 56-bit remainder; the register value is the remainder's
    leading-zero rank (57 - bit_length, i.e. the position of the
    highest set bit counted from the top; an all-zero remainder ranks
    57). Registers merge by MAX — across partitions, scopes, shards,
    and micro-batches — which is the whole reason HLL streams: state
    is ≤ |scopes|·256 rows whatever the key volume. Everything is
    integer arithmetic on md5 hex both engines reproduce bit-for-bit
    (unlike approx_count_distinct's engine-native sketch in w06, which
    can only ever be bound-checked)."""
    hashed = df.filter(F.col(key_col).isNotNull()).select(
        F.col(scope_col).alias("scope"),
        F.md5(F.col(key_col).cast("string")).alias("h"),
    )
    split = hashed.select(
        "scope",
        F.conv(F.substring("h", 1, 2), 16, 10).cast("long").alias("reg"),
        F.conv(F.substring("h", 3, 14), 16, 10).cast("long").alias("v"),
    )
    rho = F.when(F.col("v") == 0, F.lit(HLL_REM_BITS + 1)).otherwise(
        F.lit(HLL_REM_BITS + 1) - F.length(F.bin("v"))
    )
    return (
        split.select("scope", "reg", rho.alias("rho"))
        .groupBy("scope", "reg")
        .agg(F.max("rho").alias("r"))
    )


def hll_estimates_from_registers(regs: DataFrame) -> DataFrame:
    """(scope, n_regs_touched, est_distinct) read off a (scope, reg, r)
    register frame, plus an '<ALL>' scope row computed by MAX-MERGING
    the per-scope registers — the merge property exercised inside the
    query itself, never a rescan of the data. SINGLE SOURCE shared by
    the w15 batch audit and the persisted streaming sketch's read-off.

    The harmonic sum is kept EXACT: each register contributes
    2^(57-r), an integer ≤ 2^56, summed as DECIMAL(38,0); untouched
    registers contribute 2^57 each. Only the final division happens in
    floating point, on bit-identical integer inputs, so both engines
    produce the identical estimate. Small-range correction: linear
    counting m·ln(m/V) when the raw estimate ≤ 2.5m and V>0 zero
    registers remain (Flajolet et al. 2007)."""
    merged = regs.groupBy("reg").agg(F.max("r").alias("r")).select(
        F.lit("<ALL>").alias("scope"), "reg", "r"
    )
    term = F.expr(
        "cast(shiftleft(cast(1 as bigint),"
        f" cast({HLL_REM_BITS + 1} - r as int)) as decimal(38,0))"
    )
    sk = (
        regs.unionByName(merged)
        .groupBy("scope")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_regs_touched"),
            F.sum(term).alias("s_touched"),
        )
    )
    zero = F.lit(HLL_REGS) - F.col("n_regs_touched")
    s_full = F.col("s_touched") + zero.cast("decimal(38,0)") * F.lit(
        1 << (HLL_REM_BITS + 1)
    ).cast("decimal(38,0)")
    raw = F.lit(_HLL_ALPHA_NUM) / s_full.cast("double")
    est = F.when(
        (raw <= F.lit(_HLL_LC_CUT)) & (zero > 0),
        F.lit(float(HLL_REGS))
        * F.log(F.lit(float(HLL_REGS)) / zero.cast("double")),
    ).otherwise(raw)
    return sk.select(
        "scope", "n_regs_touched", F.round(est, 4).alias("est_distinct")
    )


def w15_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic HLL distinct-count sketch, audited against exact
    distincts — the count-distinct member of the sketch triad (w12
    count-min merges by ADD, w13 histogram by ADD, this by MAX): 256
    md5-derived registers per event_type estimate the distinct user
    count, the '<ALL>' row is max-merged from the per-type registers
    (never a rescan), and every scope reports the exact distinct, the
    relative error, and whether it sits inside the 3σ envelope.

    Scale shape: the update is ONE hash agg that map-side combines to
    ≤ 256 rows per scope per partition regardless of event volume; the
    estimate read-off runs on the ≤ |scopes|·256-row register frame.
    The exact countDistinct exists only for the audit — a deployment
    keeps the registers alone (and the registers, unlike w06's
    engine-native HLL, are oracle-exact on both engines). Same cells
    under the persisted foreachBatch sketch are the streaming twin
    (sketch_stream.hll_update_batch, twin-tested)."""
    ev = table(spark, sf_dir, "events").select("event_type", "user_id")
    # Round 13 (same rewrite as w16): registers MAX-merge and the
    # exact legs count distincts, so every consumer is
    # distinct-insensitive — aggregate the deduplicated
    # (event_type, user_id) frame once (map-side partial distinct)
    # instead of re-scanning the event stream per leg; each distinct
    # key is md5-hashed once, not once per occurrence. NULL event_type
    # stays a legitimate scope (distinct keeps it).
    keyed = ev.filter(F.col("user_id").isNotNull()).distinct()
    est = hll_estimates_from_registers(hll_registers(keyed))
    exact_scope = keyed.groupBy(
        F.col("event_type").alias("scope")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_exact"))
    exact_all = keyed.agg(
        F.countDistinct("user_id").cast("long").alias("n_exact")
    ).select(F.lit("<ALL>").alias("scope"), "n_exact")
    exact = exact_scope.unionByName(exact_all)
    # eqNullSafe: a NULL event_type is a legitimate scope on both sides
    joined = est.join(
        exact, est["scope"].eqNullSafe(exact["scope"])
    ).select(
        est["scope"].alias("scope"),
        "n_exact",
        "n_regs_touched",
        "est_distinct",
        F.round(
            F.abs(F.col("est_distinct") - F.col("n_exact"))
            / F.col("n_exact").cast("double"),
            6,
        ).alias("rel_err"),
    )
    return joined.withColumn(
        "within_bound", F.col("rel_err") <= F.lit(HLL_REL_BOUND)
    ).orderBy(F.col("scope").asc_nulls_first())


def _w15_sql() -> str:
    b = HLL_REM_BITS + 1
    return f"""
WITH keyed AS (
  SELECT event_type AS scope, CAST(user_id AS VARCHAR) AS k
  FROM events WHERE user_id IS NOT NULL
),
split AS (
  SELECT scope,
         CAST('0x' || substring(md5(k), 1, 2) AS BIGINT) AS reg,
         CAST('0x' || substring(md5(k), 3, 14) AS BIGINT) AS v
  FROM keyed
),
regs AS (
  SELECT scope, reg,
         MAX(CASE WHEN v = 0 THEN {b}
             ELSE {b} - length(bin(v)) END) AS r
  FROM split GROUP BY scope, reg
),
allregs AS (
  SELECT scope, reg, r FROM regs
  UNION ALL
  SELECT '<ALL>' AS scope, reg, MAX(r) AS r FROM regs GROUP BY reg
),
sk AS (
  SELECT scope,
         CAST(COUNT(*) AS BIGINT) AS n_regs_touched,
         SUM((1::BIGINT << CAST({b} - r AS INT))::HUGEINT) AS s_touched
  FROM allregs GROUP BY scope
),
est AS (
  SELECT scope, n_regs_touched,
         {_HLL_ALPHA_NUM!r} / CAST(s_touched
           + ({HLL_REGS} - n_regs_touched)::HUGEINT
             * (1::BIGINT << {b})::HUGEINT AS DOUBLE) AS raw,
         {HLL_REGS} - n_regs_touched AS zero
  FROM sk
),
fin AS (
  SELECT scope, n_regs_touched,
         ROUND(CASE WHEN raw <= {_HLL_LC_CUT!r} AND zero > 0
               THEN CAST({HLL_REGS} AS DOUBLE)
                    * ln(CAST({HLL_REGS} AS DOUBLE) / CAST(zero AS DOUBLE))
               ELSE raw END, 4) AS est_distinct
  FROM est
),
exact AS (
  SELECT scope, CAST(COUNT(DISTINCT k) AS BIGINT) AS n_exact
  FROM keyed GROUP BY scope
  UNION ALL
  SELECT '<ALL>' AS scope, CAST(COUNT(DISTINCT k) AS BIGINT) AS n_exact
  FROM keyed
)
SELECT f.scope, x.n_exact, f.n_regs_touched, f.est_distinct,
       ROUND(ABS(f.est_distinct - x.n_exact)
             / CAST(x.n_exact AS DOUBLE), 6) AS rel_err,
       ROUND(ABS(f.est_distinct - x.n_exact)
             / CAST(x.n_exact AS DOUBLE), 6) <= {HLL_REL_BOUND!r}
         AS within_bound
FROM fin f
JOIN exact x ON x.scope IS NOT DISTINCT FROM f.scope
ORDER BY f.scope NULLS FIRST
"""


# --- w16: column-profile distinct sketch (q66 × w15) ---------------------

# (column, canonical-key Spark expr, canonical-key DuckDB expr).
# Only DISCRETE/key columns are sketched: cardinality monitoring is a
# signal for keys and categories, and their canonical string encodings
# (bigint → digits, timestamp → epoch micros, string → raw) hash
# identically on both engines. Continuous doubles are deliberately
# excluded — a double's string rendering is engine-specific ('1.0E15'
# vs '1e+15', 'NaN' vs 'nan'), so it cannot feed a cross-engine md5,
# and q66 already profiles measures exactly (min/max/null/distinct).
PROFILE_SKETCH_COLS = [
    ("event_id", "cast(event_id as string)",
     "CAST(event_id AS VARCHAR)"),
    ("event_type", "event_type", "event_type"),
    ("props", "props", "props"),
    ("ts", "cast(unix_micros(ts) as string)",
     "CAST(epoch_us(ts) AS VARCHAR)"),
    ("user_id", "cast(user_id as string)",
     "CAST(user_id AS VARCHAR)"),
]


def profile_keyed(df: DataFrame) -> DataFrame:
    """(scope = column name, k = canonical string value) long form of
    the profiled discrete columns — SINGLE SOURCE shared by the batch
    w16 audit and its persisted streaming form (hll_update_batch with
    key_col='k', scope_col='scope'), so the twins cannot drift. A pure
    stack projection: runs unchanged under readStream."""
    stack = ", ".join(f"'{c}', {e}" for c, e, _ in PROFILE_SKETCH_COLS)
    return df.select(
        F.expr(
            f"stack({len(PROFILE_SKETCH_COLS)}, {stack}) AS (scope, k)"
        )
    ).filter(F.col("k").isNotNull())


def w16_profile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming-maintainable column profile: q66's data-quality audit
    re-expressed in the sketch algebra so it can run forever on a
    stream — per column, the null count (additive), the w15 HLL
    register estimate of the distinct count (MAX-merge), and the exact
    distinct + error audit that justifies trusting the sketch. The
    '<ALL>' row max-merges every column's registers — the cross-column
    union cardinality, exercising the merge property in-query.

    Why this exists next to q66: exact COUNT(DISTINCT) per column is
    the one profiling cost that cannot stream (state = one row per
    distinct value); the register sketch caps state at |cols|·256 rows
    FOREVER, and `sketch_stream.hll_update_batch(profile_keyed(batch),
    …, key_col='k', scope_col='scope')` maintains exactly this frame
    under foreachBatch (twin-tested, replay-idempotent, MAX-fold
    compaction). Scale shape: one scan → stack (|cols|× rows, map-side
    combine to ≤ |cols|·256 registers per partition) → register agg;
    the exact audit leg exists for the oracle and drops out of the
    production stream."""
    d = table(spark, sf_dir, "events")
    # Round 13: every downstream consumer is DISTINCT-insensitive —
    # the HLL registers take a MAX per (scope, register), so duplicate
    # keys cannot change any register, and both exact legs count
    # distincts — so all three aggregate the deduplicated (scope, k)
    # frame instead of re-running the |cols|×|events| stack per
    # consumer: one distinct exchange (map-side partial distinct
    # collapses the stack before it moves), then
    # |distinct-pairs|-sized re-aggregations, and the md5 register
    # split hashes each distinct key once, not once per occurrence.
    # sf0.1 A/B: medians within noise (1.22 vs 1.37 s, the new form's
    # rep band tighter at [1.21, 1.44] vs [1.08, 2.05]) — the win is
    # the at-scale shape: the profiled columns are low-cardinality, so
    # |distinct pairs| ≪ |cols|×|events| and the three downstream
    # passes stop re-scanning the event stack entirely.
    keyed = profile_keyed(d).distinct()
    est = hll_estimates_from_registers(
        hll_registers(keyed, key_col="k", scope_col="scope")
    )
    exact = keyed.groupBy("scope").agg(
        F.count(F.lit(1)).cast("long").alias("n_exact")
    ).unionByName(
        keyed.agg(
            F.count_distinct("k").cast("long").alias("n_exact")
        ).select(F.lit("<ALL>").alias("scope"), "n_exact")
    )
    null_aggs = [
        (F.count(F.lit(1)) - F.count(c)).cast("long").alias(f"{c}__nn")
        for c, _, _ in PROFILE_SKETCH_COLS
    ]
    nulls_stack = ", ".join(
        f"'{c}', {c}__nn" for c, _, _ in PROFILE_SKETCH_COLS
    )
    nulls_long = d.agg(*null_aggs).select(
        F.expr(
            f"stack({len(PROFILE_SKETCH_COLS)}, {nulls_stack})"
            " AS (scope, n_nulls)"
        )
    )
    nulls = nulls_long.unionByName(
        nulls_long.agg(F.sum("n_nulls").cast("long").alias("n_nulls"))
        .select(F.lit("<ALL>").alias("scope"), "n_nulls")
    )
    rel = F.round(
        F.abs(F.col("est_distinct") - F.col("n_exact"))
        / F.col("n_exact").cast("double"),
        6,
    )
    return (
        est.join(exact, "scope")
        .join(nulls, "scope")
        .select(
            "scope",
            "n_nulls",
            "n_exact",
            "n_regs_touched",
            "est_distinct",
            rel.alias("rel_err"),
            (rel <= F.lit(HLL_REL_BOUND)).alias("within_bound"),
        )
        .orderBy("scope")
    )


def _w16_sql() -> str:
    b = HLL_REM_BITS + 1
    keyed = "\n  UNION ALL\n".join(
        f"  SELECT '{c}' AS scope, {e} AS k FROM events"
        f" WHERE {e} IS NOT NULL"
        for c, _, e in PROFILE_SKETCH_COLS
    )
    nulls = "\n  UNION ALL\n".join(
        f"  SELECT '{c}' AS scope,"
        f" CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_nulls FROM events"
        for c, _, _ in PROFILE_SKETCH_COLS
    )
    return f"""
WITH keyed AS (
{keyed}
),
split AS (
  SELECT scope,
         CAST('0x' || substring(md5(k), 1, 2) AS BIGINT) AS reg,
         CAST('0x' || substring(md5(k), 3, 14) AS BIGINT) AS v
  FROM keyed
),
regs AS (
  SELECT scope, reg,
         MAX(CASE WHEN v = 0 THEN {b}
             ELSE {b} - length(bin(v)) END) AS r
  FROM split GROUP BY scope, reg
),
allregs AS (
  SELECT scope, reg, r FROM regs
  UNION ALL
  SELECT '<ALL>' AS scope, reg, MAX(r) AS r FROM regs GROUP BY reg
),
sk AS (
  SELECT scope,
         CAST(COUNT(*) AS BIGINT) AS n_regs_touched,
         SUM((1::BIGINT << CAST({b} - r AS INT))::HUGEINT) AS s_touched
  FROM allregs GROUP BY scope
),
est AS (
  SELECT scope, n_regs_touched,
         {_HLL_ALPHA_NUM!r} / CAST(s_touched
           + ({HLL_REGS} - n_regs_touched)::HUGEINT
             * (1::BIGINT << {b})::HUGEINT AS DOUBLE) AS raw,
         {HLL_REGS} - n_regs_touched AS zero
  FROM sk
),
fin AS (
  SELECT scope, n_regs_touched,
         ROUND(CASE WHEN raw <= {_HLL_LC_CUT!r} AND zero > 0
               THEN CAST({HLL_REGS} AS DOUBLE)
                    * ln(CAST({HLL_REGS} AS DOUBLE) / CAST(zero AS DOUBLE))
               ELSE raw END, 4) AS est_distinct
  FROM est
),
exact AS (
  SELECT scope, CAST(COUNT(DISTINCT k) AS BIGINT) AS n_exact
  FROM keyed GROUP BY scope
  UNION ALL
  SELECT '<ALL>' AS scope, CAST(COUNT(DISTINCT k) AS BIGINT) AS n_exact
  FROM keyed
),
nulls_long AS (
{nulls}
),
nulls AS (
  SELECT scope, n_nulls FROM nulls_long
  UNION ALL
  SELECT '<ALL>' AS scope, CAST(SUM(n_nulls) AS BIGINT) AS n_nulls
  FROM nulls_long
)
SELECT f.scope, n.n_nulls, x.n_exact, f.n_regs_touched, f.est_distinct,
       ROUND(ABS(f.est_distinct - x.n_exact)
             / CAST(x.n_exact AS DOUBLE), 6) AS rel_err,
       ROUND(ABS(f.est_distinct - x.n_exact)
             / CAST(x.n_exact AS DOUBLE), 6) <= {HLL_REL_BOUND!r}
         AS within_bound
FROM fin f
JOIN exact x ON x.scope = f.scope
JOIN nulls n ON n.scope = f.scope
ORDER BY f.scope
"""


QUERIES = [
    Query("w01_tumbling", w01_tumbling, W01_SQL, "tumbling 1h windows"),
    Query("w02_sliding", w02_sliding, W02_SQL, "sliding 1h/30m windows"),
    Query("w03_session_window", w03_session_window, W03_SQL,
          "session windows, 30min gap"),
    Query("w04_enriched_windows", w04_enriched_windows, W04_SQL,
          "stream-static dim enrichment + tumbling agg"),
    Query("w05_attribution", w05_attribution, W05_SQL,
          "first-touch view->click attribution (stream-stream join twin)"),
    Query("w06_window_distinct", w06_window_distinct, W06_SQL,
          "per-window exact distinct + HLL estimate (error-bound "
          "verified)"),
    Query("w07_window_topk", w07_window_topk, W07_SQL,
          "per-window top-3 trending event types (deterministic ties)"),
    Query("w08_disorder_profile", w08_disorder_profile, W08_SQL,
          "out-of-orderness profile (watermark calibration: late "
          "counts + max/avg disorder per key)"),
    Query("w09_gap_fill", w09_gap_fill, W09_SQL,
          "hourly resample + forward-fill (dense grid from bounds, "
          "keyed ffill window)"),
    Query("w10_rate_anomaly", w10_rate_anomaly, W10_SQL,
          "event-rate z-score vs trailing 24h baseline (bounded ROWS "
          "frame)"),
    Query("w11_rollup_cascade", w11_rollup_cascade, W11_SQL,
          "continuous-aggregate cascade: hourly -> daily -> monthly "
          "re-aggregation tiers in one frame"),
    Query("w12_countmin_heavyhitters", w12_countmin_heavyhitters,
          _w12_sql(),
          "count-min sketch heavy hitters: fixed k x w counter grid, "
          "min-over-rows estimate, exact-count overestimate audit"),
    Query("w13_histogram_quantiles", w13_histogram_quantiles,
          _w13_sql(),
          "mergeable equi-width histogram quantile sketch: fixed "
          "32-bin grid, interpolated q50/q90/q99, exact-percentile "
          "error audit"),
    Query("w14_decayed_rate", w14_decayed_rate, _w14_sql(),
          "exponentially decayed per-key event rate (6h half-life, "
          "additive cells — streams under a built-in groupBy)"),
    Query("w15_hll_distinct", w15_hll_distinct, _w15_sql(),
          "deterministic HLL distinct sketch: 256 md5-derived "
          "registers per scope, max-merge (incl. the '<ALL>' row "
          "merged from per-scope registers), linear-counting "
          "small-range correction, exact-distinct error audit"),
    Query("w16_profile_sketch", w16_profile_sketch, _w16_sql(),
          "streaming-maintainable column profile: per-column null "
          "count + w15 HLL distinct estimate + exact error audit "
          "(q66's audit in the sketch algebra; state caps at "
          "|cols|*256 registers)"),
]
