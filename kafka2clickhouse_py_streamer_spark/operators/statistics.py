"""Statistical + advanced aggregation operators: stddev/variance/
correlation, exact percentiles, arg-min/arg-max, filtered aggregation,
IN-subqueries, RANGE window frames.

Scale notes: all single-shuffle hash aggregations (moments and
percentiles included — Spark's percentile is an exact aggregate whose
per-group state is the value multiset, so for 100 TB hot groups the
approx variant in aggregates.q27 is the default; this exact form is for
bounded-cardinality groups). RANGE frames sort within the partition key
shuffle, same cost envelope as ROWS.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka2clickhouse_py_streamer_spark.operators.base import Query, table


def q31_moment_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample stddev/variance + Pearson correlation + covariance per
    group — the moments family (all partial-aggregatable: one shuffle)."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.stddev("l_quantity"), 6).alias("sd_qty"),
            F.round(F.variance("l_extendedprice"), 2).alias("var_price"),
            F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias(
                "corr_qty_price"
            ),
            F.round(F.covar_samp("l_discount", "l_tax"), 8).alias(
                "cov_disc_tax"
            ),
        )
        .orderBy("l_returnflag")
    )


Q31_SQL = """
SELECT l_returnflag,
       ROUND(STDDEV_SAMP(l_quantity), 6) AS sd_qty,
       ROUND(VAR_SAMP(l_extendedprice), 2) AS var_price,
       ROUND(CORR(l_quantity, l_extendedprice), 6) AS corr_qty_price,
       ROUND(COVAR_SAMP(l_discount, l_tax), 8) AS cov_disc_tax
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


def q32_exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (continuous interpolation): median + p90 per
    order status. Spark ``percentile`` ≡ SQL PERCENTILE_CONT ≡ DuckDB
    quantile_cont."""
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.round(F.percentile("o_totalprice", F.lit(0.5)), 4).alias("median_price"),
            F.round(F.percentile("o_totalprice", F.lit(0.9)), 4).alias("p90_price"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("o_orderstatus")
    )


Q32_SQL = """
SELECT o_orderstatus,
       ROUND(quantile_cont(o_totalprice, 0.5), 4) AS median_price,
       ROUND(quantile_cont(o_totalprice, 0.9), 4) AS p90_price,
       COUNT(*) AS n_orders
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


def q33_argmin_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """min_by/max_by: the order id carrying each customer-segment's
    extreme price (DuckDB arg_min/arg_max). Ties broken by keying the
    comparison on (price, orderkey) so both engines pick the same row."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    j = o.join(c, o.o_custkey == c.c_custkey)
    key = F.struct(F.col("o_totalprice"), F.col("o_orderkey"))
    return (
        j.groupBy("c_mktsegment")
        .agg(
            F.min_by("o_orderkey", key).alias("cheapest_order"),
            F.max_by("o_orderkey", key).alias("priciest_order"),
            F.round(F.min("o_totalprice"), 2).alias("min_price"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
        )
        .orderBy("c_mktsegment")
    )


# DuckDB's arg_min/arg_max take only scalar comparators, so the oracle
# expresses the same tie-broken extremes via row_number.
Q33_SQL = """
WITH j AS (
  SELECT c_mktsegment, o_orderkey, o_totalprice
  FROM orders JOIN customer ON o_custkey = c_custkey
), r AS (
  SELECT *,
         ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                            ORDER BY o_totalprice ASC, o_orderkey ASC) AS rn_min,
         ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                            ORDER BY o_totalprice DESC, o_orderkey DESC) AS rn_max
  FROM j
)
SELECT c_mktsegment,
       MAX(CASE WHEN rn_min = 1 THEN o_orderkey END) AS cheapest_order,
       MAX(CASE WHEN rn_max = 1 THEN o_orderkey END) AS priciest_order,
       ROUND(MIN(o_totalprice), 2) AS min_price,
       ROUND(MAX(o_totalprice), 2) AS max_price
FROM r
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


def q34_filtered_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation (FILTER clause / count_if): per-flag
    return rates in one pass — no self-join, no second scan."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count_if(F.col("l_returnflag") == "R").alias("n_returned"),
            F.round(
                F.sum(
                    F.when(
                        F.col("l_returnflag") == "R", F.col("l_extendedprice")
                    ).otherwise(F.lit(0.0))
                ),
                2,
            ).alias("returned_value"),
            F.round(
                F.avg(
                    F.when(F.col("l_quantity") > 25, F.col("l_discount"))
                )
                + 1e-9,  # half-point guard, see q01
                6,
            ).alias("avg_disc_bigqty"),
        )
        .orderBy("l_linestatus")
    )


Q34_SQL = """
SELECT l_linestatus,
       COUNT(*) AS n_rows,
       COUNT(*) FILTER (WHERE l_returnflag = 'R') AS n_returned,
       ROUND(COALESCE(SUM(l_extendedprice) FILTER (WHERE l_returnflag = 'R'), 0.0), 2)
         AS returned_value,
       ROUND(AVG(l_discount) FILTER (WHERE l_quantity > 25) + 1e-9, 6) AS avg_disc_bigqty
FROM lineitem
GROUP BY l_linestatus
ORDER BY l_linestatus
"""


def q35_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated IN subquery via the SQL API: orders from nations in
    one region. Catalyst rewrites to a left-semi join chain."""
    for t in ("orders", "customer", "nation", "region"):
        table(spark, sf_dir, t).createOrReplaceTempView(f"{t}_q35")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 2) AS price
        FROM orders_q35
        WHERE o_custkey IN (
            SELECT c_custkey FROM customer_q35
            WHERE c_nationkey IN (
                SELECT n_nationkey FROM nation_q35
                WHERE n_regionkey IN (
                    SELECT r_regionkey FROM region_q35 WHERE r_name = 'ASIA'
                )
            )
        )
        ORDER BY o_orderkey
        """
    )


Q35_SQL = """
SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 2) AS price
FROM orders
WHERE o_custkey IN (
    SELECT c_custkey FROM customer
    WHERE c_nationkey IN (
        SELECT n_nationkey FROM nation
        WHERE n_regionkey IN (
            SELECT r_regionkey FROM region WHERE r_name = 'ASIA'
        )
    )
)
ORDER BY o_orderkey
"""


def q36_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE window frame over a numeric ordering key: for each order,
    total revenue of same-customer orders within ±1000.0 of its price
    (value-based frame, unlike the ROWS frames in windows.py). The
    DataFrame rangeBetween API only takes integer offsets, so the
    fractional frame is declared through the SQL surface."""
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders_q36")
    return spark.sql(
        """
        SELECT o_custkey, o_orderkey,
               ROUND(o_totalprice, 2) AS price,
               COUNT(*) OVER w AS n_near,
               ROUND(SUM(o_totalprice) OVER w, 2) AS near_revenue
        FROM orders_q36
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice
                     RANGE BETWEEN 1000.0 PRECEDING AND 1000.0 FOLLOWING)
        ORDER BY o_custkey, o_orderkey
        """
    )


Q36_SQL = """
SELECT o_custkey, o_orderkey,
       ROUND(o_totalprice, 2) AS price,
       COUNT(*) OVER w AS n_near,
       ROUND(SUM(o_totalprice) OVER w, 2) AS near_revenue
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice
             RANGE BETWEEN 1000.0 PRECEDING AND 1000.0 FOLLOWING)
ORDER BY o_custkey, o_orderkey
"""


def q52_interval_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-interval RANGE frame: per user, each event's trailing
    1-hour activity (count + value sum over `[ts - 1h, ts]`) — the
    batch twin of a per-key sliding aggregation, and the frame type
    q36's numeric RANGE can't express. Declared through the SQL
    surface (the DataFrame rangeBetween API has no interval offsets).

    Scale shape: one hash shuffle on user_id + a per-key time sort —
    identical envelope to any per-key window; the interval frame is
    evaluated with a sliding pointer over the sorted run, not a
    self-join."""
    table(spark, sf_dir, "events").createOrReplaceTempView("events_q52")
    return spark.sql(
        """
        SELECT event_id, user_id,
               COUNT(*) OVER w AS n_prev_hour,
               ROUND(SUM(value) OVER w, 4) AS val_prev_hour
        FROM events_q52
        WINDOW w AS (PARTITION BY user_id ORDER BY ts
                     RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
                               AND CURRENT ROW)
        ORDER BY event_id
        """
    )


Q52_SQL = """
SELECT event_id, user_id,
       COUNT(*) OVER w AS n_prev_hour,
       ROUND(SUM(value) OVER w, 4) AS val_prev_hour
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
ORDER BY event_id
"""


def q37_ntile_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions: quartiles + cumulative
    distribution + percent_rank of order prices per status."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.col("o_totalprice").asc(), F.col("o_orderkey").asc()
    )
    return o.select(
        "o_orderstatus",
        "o_orderkey",
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
    ).orderBy("o_orderstatus", "o_orderkey")


Q37_SQL = """
SELECT o_orderstatus, o_orderkey,
       CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
       ROUND(CUME_DIST() OVER w, 6) AS cume,
       ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank
FROM orders
WINDOW w AS (PARTITION BY o_orderstatus
             ORDER BY o_totalprice ASC, o_orderkey ASC)
ORDER BY o_orderstatus, o_orderkey
"""


def q38_collect_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collection aggregates: sorted value list + distinct set per
    group (array_agg / list). Deterministic via array_sort."""
    n = table(spark, sf_dir, "nation")
    # Serialize the sorted list to one string column: the driver's pandas
    # canonicalizer cannot sort/hash list cells.
    return (
        n.groupBy("n_regionkey")
        .agg(
            F.concat_ws(",", F.array_sort(F.collect_list("n_name")))
            .alias("nations"),
            F.size(F.collect_set("n_name")).cast("long").alias("n_distinct"),
        )
        .orderBy("n_regionkey")
    )


Q38_SQL = """
SELECT n_regionkey,
       array_to_string(list_sort(list(n_name)), ',') AS nations,
       CAST(COUNT(DISTINCT n_name) AS BIGINT) AS n_distinct
FROM nation
GROUP BY n_regionkey
ORDER BY n_regionkey
"""


HOT_KEY_SHARE = 0.1  # a key owning >10% of rows is a salting candidate


def q51_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew profile — the diagnostic run BEFORE choosing a
    join strategy: per-key row count, share of the table, and skew
    ratio (count ÷ uniform expectation); keys above HOT_KEY_SHARE are
    the ones q48's salted join (functions/skew.py) exists for.

    Scale shape: one partial+final hash agg on the key (map-side
    collapse makes even the hottest key cost |partitions| rows at the
    reducer), then the per-key frame — |distinct keys| rows, small by
    definition — takes the corpus totals from a one-row broadcast.
    Profiling 100 TB costs exactly one aggregated scan."""
    e = table(spark, sf_dir, "events")
    counts = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    # total rows and key cardinality both derive from the per-key
    # counts — aggregating the tiny counts frame instead of re-scanning
    # the fact table keeps the whole profile at one scan.
    totals = counts.agg(
        F.sum("n").cast("double").alias("total"),
        F.count(F.lit(1)).cast("double").alias("n_keys"),
    )
    share = F.col("n") / F.col("total")
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            "event_type",
            "n",
            F.round(share, 6).alias("share"),
            F.round(F.col("n") * F.col("n_keys") / F.col("total"), 6)
            .alias("skew_ratio"),
            (share > HOT_KEY_SHARE).alias("is_hot"),
        )
        .orderBy("event_type")
    )


Q51_SQL = f"""
WITH counts AS (
  SELECT event_type, COUNT(*) AS n FROM events GROUP BY event_type
),
totals AS (
  -- derive from counts so the NULL key group is included, exactly like
  -- the Spark side (COUNT(DISTINCT) would silently drop it)
  SELECT CAST(SUM(n) AS DOUBLE) AS total,
         CAST(COUNT(*) AS DOUBLE) AS n_keys
  FROM counts
)
SELECT event_type, n,
       ROUND(n / total, 6) AS share,
       ROUND(n * n_keys / total, 6) AS skew_ratio,
       n / total > {HOT_KEY_SHARE} AS is_hot
FROM counts, totals
ORDER BY event_type
"""


N_HIST_BUCKETS = 20


def q54_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram over ``l_extendedprice``: global min/max in
    one aggregated pass, then every row maps to
    ``floor((x - min) / width)`` (top edge clamped into the last
    bucket). The distribution profile every data-quality dashboard
    wants, computed without any sort.

    Scale shape: the min/max frame is ONE row, broadcast into the
    second scan; bucketing is a codegen projection and the bucket agg
    is partial+final on ≤N_HIST_BUCKETS keys — two scans, one 20-key
    shuffle, nothing driver-side. At 100 TB both scans are
    column-pruned to the single priced column."""
    li = table(spark, sf_dir, "lineitem")
    bounds = li.agg(
        F.min("l_extendedprice").cast("double").alias("lo_all"),
        F.max("l_extendedprice").cast("double").alias("hi_all"),
    )
    width = (F.col("hi_all") - F.col("lo_all")) / N_HIST_BUCKETS
    # degenerate distribution (min == max, e.g. a constant column or a
    # single row): every value lands in bucket 0 — Spark's ANSI
    # division would otherwise throw on width 0 where DuckDB yields
    # NULL, a crash-vs-result divergence
    bucket = F.when(
        F.col("hi_all") > F.col("lo_all"),
        F.least(
            F.floor((F.col("l_extendedprice") - F.col("lo_all")) / width),
            F.lit(N_HIST_BUCKETS - 1),
        ),
    ).otherwise(F.lit(0)).cast("long")
    return (
        li.select("l_extendedprice")
        .crossJoin(F.broadcast(bounds))
        .select(
            bucket.alias("bucket"),
            F.col("lo_all"),
            F.col("hi_all"),
        )
        .groupBy("bucket", "lo_all", "hi_all")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .select(
            "bucket",
            F.round(
                F.col("lo_all")
                + F.col("bucket")
                * (F.col("hi_all") - F.col("lo_all"))
                / N_HIST_BUCKETS,
                4,
            ).alias("bucket_lo"),
            F.round(
                F.col("lo_all")
                + (F.col("bucket") + 1)
                * (F.col("hi_all") - F.col("lo_all"))
                / N_HIST_BUCKETS,
                4,
            ).alias("bucket_hi"),
            "n_rows",
        )
        .orderBy("bucket")
    )


Q54_SQL = f"""
WITH bounds AS (
  SELECT CAST(MIN(l_extendedprice) AS DOUBLE) AS lo_all,
         CAST(MAX(l_extendedprice) AS DOUBLE) AS hi_all
  FROM lineitem
),
bucketed AS (
  SELECT CASE WHEN hi_all > lo_all THEN LEAST(
           CAST(FLOOR((l_extendedprice - lo_all)
                      / ((hi_all - lo_all) / {N_HIST_BUCKETS})) AS BIGINT),
           {N_HIST_BUCKETS - 1}) ELSE 0 END AS bucket,
         lo_all, hi_all
  FROM lineitem, bounds
)
SELECT bucket,
       ROUND(lo_all + bucket * (hi_all - lo_all) / {N_HIST_BUCKETS}, 4)
         AS bucket_lo,
       ROUND(lo_all + (bucket + 1) * (hi_all - lo_all) / {N_HIST_BUCKETS}, 4)
         AS bucket_hi,
       COUNT(*) AS n_rows
FROM bucketed
GROUP BY bucket, lo_all, hi_all
ORDER BY bucket
"""


def q55_robust_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-group outlier profile: median + MAD (median absolute
    deviation) per event type, then the count of events outside
    ``median ± 3 · 1.4826 · MAD`` — the standard robust z-score that,
    unlike mean/stddev, is not dragged by the outliers it hunts.

    Scale shape: two exact-percentile aggs on the same small key space
    (event_type) with the per-group medians re-joined broadcast (the
    medians frame is |keys| rows). Exact ``percentile`` holds the group
    multiset in agg state — fine for bounded-cardinality keys; for
    unbounded keys swap approx_percentile, same plan shape.

    Contract: robust statistics are computed over MEASUREMENTS — rows
    whose value is NULL/NaN/±Inf are excluded up front (one conjunct,
    ``ABS(value) < Infinity``, identical NaN-ordering semantics on
    both engines). Without it a single NaN poisons the exact
    percentile differently per engine (caught by the adversarial
    NaN/Inf event rows)."""
    e = (
        table(spark, sf_dir, "events")
        .select("event_type", "value")
        .filter(F.abs("value") < F.lit(float("inf")))
    )
    med = e.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("med")
    )
    dev = e.join(F.broadcast(med), "event_type").select(
        "event_type", "value", "med",
        F.abs(F.col("value") - F.col("med")).alias("adev"),
    )
    mad = dev.groupBy("event_type").agg(
        F.percentile("adev", F.lit(0.5)).alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.first("med"), 4).alias("median_value"),
            F.round(F.first("mad"), 4).alias("mad_value"),
            F.sum(
                F.when(
                    F.col("adev") > 3 * 1.4826 * F.col("mad"), 1
                ).otherwise(0)
            ).cast("long").alias("n_outliers"),
        )
        .orderBy("event_type")
    )


Q55_SQL = """
WITH meas AS (
  -- measurements only: NULL/NaN/Inf excluded (NaN orders above
  -- Infinity on both engines, so one conjunct covers all three)
  SELECT event_type, value FROM events
  WHERE ABS(value) < CAST('Infinity' AS DOUBLE)
),
med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS med
  FROM meas GROUP BY event_type
),
dev AS (
  SELECT e.event_type, e.value, m.med, ABS(e.value - m.med) AS adev
  FROM meas e JOIN med m ON m.event_type = e.event_type
),
mad AS (
  SELECT event_type, quantile_cont(adev, 0.5) AS mad
  FROM dev GROUP BY event_type
)
SELECT d.event_type,
       COUNT(*) AS n_events,
       ROUND(ANY_VALUE(d.med), 4) AS median_value,
       ROUND(ANY_VALUE(m.mad), 4) AS mad_value,
       CAST(SUM(CASE WHEN d.adev > 3 * 1.4826 * m.mad
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM dev d JOIN mad m ON m.event_type = d.event_type
GROUP BY d.event_type
ORDER BY d.event_type
"""


def q57_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention — the classic product-analytics matrix: group
    customers by their FIRST order month (the cohort), then for every
    later month report how many of that cohort ordered again and the
    retention rate. Composition of two aggregations and a broadcast
    re-join; no windows.

    Scale shape: first-order cohorts are one partial+final hash agg on
    the customer key; activity is a distinct on (customer, month) —
    also one agg; the cohort tag joins back broadcast (|customers| ≪
    fact table; at 100 TB this join side is the customer dimension, a
    normal broadcast/bucketed candidate). The final matrix is
    |cohorts|×|months| rows."""
    o = table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.date_trunc("month", "o_orderdate").cast("date").alias("month"),
    )
    cohorts = o.groupBy("o_custkey").agg(
        F.min("month").alias("cohort_month")
    )
    sizes = cohorts.groupBy("cohort_month").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    activity = o.distinct()
    matrix = (
        activity.join(F.broadcast(cohorts), "o_custkey")
        .groupBy("cohort_month", "month")
        .agg(F.count(F.lit(1)).cast("long").alias("n_active"))
    )
    return (
        matrix.join(F.broadcast(sizes), "cohort_month")
        .select(
            "cohort_month",
            "month",
            F.months_between("month", "cohort_month")
            .cast("long")
            .alias("month_index"),
            "n_active",
            F.col("cohort_size").cast("long").alias("cohort_size"),
            F.round(
                F.col("n_active") / F.col("cohort_size"), 6
            ).alias("retention"),
        )
        .orderBy("cohort_month", "month")
    )


Q57_SQL = """
WITH o AS (
  SELECT o_custkey, CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS month
  FROM orders
),
cohorts AS (
  SELECT o_custkey, MIN(month) AS cohort_month FROM o GROUP BY o_custkey
),
sizes AS (
  SELECT cohort_month, COUNT(*) AS cohort_size
  FROM cohorts GROUP BY cohort_month
),
activity AS (SELECT DISTINCT o_custkey, month FROM o),
matrix AS (
  SELECT c.cohort_month, a.month, CAST(COUNT(*) AS BIGINT) AS n_active
  FROM activity a JOIN cohorts c ON c.o_custkey = a.o_custkey
  GROUP BY c.cohort_month, a.month
)
SELECT m.cohort_month, m.month,
       CAST((YEAR(m.month) - YEAR(m.cohort_month)) * 12
            + (MONTH(m.month) - MONTH(m.cohort_month)) AS BIGINT)
         AS month_index,
       m.n_active,
       CAST(s.cohort_size AS BIGINT) AS cohort_size,
       ROUND(CAST(m.n_active AS DOUBLE) / s.cohort_size, 6) AS retention
FROM matrix m JOIN sizes s ON s.cohort_month = m.cohort_month
ORDER BY m.cohort_month, m.month
"""


def q60_linear_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group ordinary-least-squares trend via the SQL regression
    aggregates: slope/intercept/R² of order price against days-since-
    epoch-start. regr_* are single-pass partial-aggregatable moments
    (sums of x, y, xy, x², y²) — ONE hash-aggregate shuffle, the same
    cost envelope as q31, never a per-group sort or collect."""
    o = table(spark, sf_dir, "orders")
    x = F.datediff(
        F.col("o_orderdate"), F.lit("1992-01-01").cast("date")
    ).cast("double")
    y = F.col("o_totalprice")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.round(F.regr_slope(y, x), 6).alias("slope"),
            F.round(F.regr_intercept(y, x), 4).alias("intercept"),
            F.round(F.regr_r2(y, x), 6).alias("r2"),
            F.regr_count(y, x).cast("long").alias("n_obs"),
        )
        .orderBy("o_orderpriority")
    )


Q60_SQL = """
SELECT o_orderpriority,
       ROUND(regr_slope(o_totalprice,
             CAST(date_diff('day', DATE '1992-01-01', o_orderdate)
                  AS DOUBLE)), 6) AS slope,
       ROUND(regr_intercept(o_totalprice,
             CAST(date_diff('day', DATE '1992-01-01', o_orderdate)
                  AS DOUBLE)), 4) AS intercept,
       ROUND(regr_r2(o_totalprice,
             CAST(date_diff('day', DATE '1992-01-01', o_orderdate)
                  AS DOUBLE)), 6) AS r2,
       CAST(regr_count(o_totalprice,
             CAST(date_diff('day', DATE '1992-01-01', o_orderdate)
                  AS DOUBLE)) AS BIGINT) AS n_obs
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def q64_weighted_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted quantiles (lower weighted-quantile / inverse-CDF
    definition): per return flag, the price at which the cumulative
    QUANTITY mass crosses 25/50/90% — neither engine has a built-in
    weighted percentile, so both emulate it identically with an
    ordered cumulative-weight window and a conditional min.

    Cross-engine determinism: the cumulative sum's order is pinned by
    (price, orderkey, linenumber), so both engines add the SAME
    doubles in the SAME order; the total is taken as max(cumw) — the
    final ordered prefix sum — NOT a separate unordered partition SUM,
    which could differ in the last ulp and flip a threshold crossing.
    Weights are filtered to > 0 so the prefix sum is monotone and
    max(cumw) is the true total.

    Scale shape: ONE hash shuffle on the group key; both windows and
    the final agg reuse that partitioning (no second exchange), so
    the cost envelope is a sort within each group partition — same as
    any per-key window. Per-group state is O(1) beyond the sort."""
    li = table(spark, sf_dir, "lineitem").where(
        F.col("l_extendedprice").isNotNull() & (F.col("l_quantity") > 0)
    )
    w_cum = (
        Window.partitionBy("l_returnflag")
        .orderBy("l_extendedprice", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy("l_returnflag")
    cum = li.select(
        "l_returnflag",
        "l_extendedprice",
        F.sum("l_quantity").over(w_cum).alias("cumw"),
    ).select(
        "l_returnflag",
        "l_extendedprice",
        "cumw",
        F.max("cumw").over(w_all).alias("totw"),
    )

    def wq(q: float):
        return F.min(
            F.when(
                F.col("cumw") >= F.lit(q) * F.col("totw"),
                F.col("l_extendedprice"),
            )
        )

    return (
        cum.groupBy("l_returnflag")
        .agg(
            F.round(wq(0.25), 2).alias("wp25"),
            F.round(wq(0.5), 2).alias("wp50"),
            F.round(wq(0.9), 2).alias("wp90"),
            F.round(F.max("totw"), 2).alias("total_weight"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
        )
        .orderBy("l_returnflag")
    )


Q64_SQL = """
WITH cum AS (
  SELECT l_returnflag, l_extendedprice,
         SUM(l_quantity) OVER (
           PARTITION BY l_returnflag
           ORDER BY l_extendedprice, l_orderkey, l_linenumber
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumw
  FROM lineitem
  WHERE l_extendedprice IS NOT NULL AND l_quantity > 0
),
tot AS (
  SELECT l_returnflag, l_extendedprice, cumw,
         MAX(cumw) OVER (PARTITION BY l_returnflag) AS totw
  FROM cum
)
SELECT l_returnflag,
       ROUND(MIN(CASE WHEN cumw >= 0.25 * totw THEN l_extendedprice END), 2) AS wp25,
       ROUND(MIN(CASE WHEN cumw >= 0.5 * totw THEN l_extendedprice END), 2) AS wp50,
       ROUND(MIN(CASE WHEN cumw >= 0.9 * totw THEN l_extendedprice END), 2) AS wp90,
       ROUND(MAX(totw), 2) AS total_weight,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM tot
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


# --- q66: table profiling (data-quality audit) --------------------------

# (column, numeric SQL expression or None) — ts profiles as epoch
# micros (no division: exact in a double, identical on both engines)
_PROFILE_COLS = [
    ("event_id", "CAST(event_id AS DOUBLE)"),
    ("ts", None),  # numeric expr differs per engine, see below
    ("user_id", "CAST(user_id AS DOUBLE)"),
    ("event_type", ""),  # non-numeric: min/max emitted as NULL
    ("value", "CAST(value AS DOUBLE)"),
    ("props", ""),
]


def q66_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table profiling — the data-quality audit every ingestion
    pipeline fronts its tables with: per column, null count, exact
    distinct count, and numeric min/max (timestamps as epoch micros,
    strings profile nulls/cardinality only), in long form.

    Scale shape: ONE scan — a single global aggregate computes every
    column's stats (the multi-distinct runs through Spark's Expand:
    one pass over the data, |cols|× the agg input rows, map-side
    partial aggs on each); the long form is a ``stack`` unpivot of the
    one-row result. At 100 TB the exact COUNT(DISTINCT) columns swap
    to approx_count_distinct sketches (q27 verifies that estimator's
    error bounds); exact distincts keep THIS audit oracle-exact.
    """
    d = table(spark, sf_dir, "events")
    aggs = [F.count(F.lit(1)).cast("long").alias("n_rows")]
    for c, num in _PROFILE_COLS:
        nexpr = (
            F.expr(num)
            if num
            else (
                F.unix_micros(F.col("ts")).cast("double")
                if c == "ts"
                else F.lit(None).cast("double")
            )
        )
        aggs += [
            (F.count(F.lit(1)) - F.count(c)).cast("long").alias(f"{c}__nn"),
            F.count_distinct(F.col(c)).cast("long").alias(f"{c}__nd"),
            F.round(F.min(nexpr), 6).alias(f"{c}__mn"),
            F.round(F.max(nexpr), 6).alias(f"{c}__mx"),
        ]
    one = d.agg(*aggs)
    stack = ", ".join(
        f"'{c}', {c}__nn, {c}__nd, {c}__mn, {c}__mx"
        for c, _ in _PROFILE_COLS
    )
    return one.select(
        F.expr(
            f"stack({len(_PROFILE_COLS)}, {stack}) AS "
            "(col_name, n_nulls, n_distinct, min_v, max_v)"
        ),
        "n_rows",
    ).orderBy("col_name")


def _q66_sql() -> str:
    agg_cols = ["CAST(COUNT(*) AS BIGINT) AS n_rows"]
    for c, num in _PROFILE_COLS:
        nexpr = num if num else (
            "CAST(epoch_us(ts) AS DOUBLE)" if c == "ts" else
            "CAST(NULL AS DOUBLE)"
        )
        agg_cols += [
            f"CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS {c}__nn",
            f"CAST(COUNT(DISTINCT {c}) AS BIGINT) AS {c}__nd",
            f"ROUND(MIN({nexpr}), 6) AS {c}__mn",
            f"ROUND(MAX({nexpr}), 6) AS {c}__mx",
        ]
    selects = "\n  UNION ALL\n".join(
        f"  SELECT '{c}' AS col_name, {c}__nn AS n_nulls,"
        f" {c}__nd AS n_distinct, {c}__mn AS min_v,"
        f" {c}__mx AS max_v, n_rows FROM agg"
        for c, _ in _PROFILE_COLS
    )
    return f"""
WITH agg AS (
  SELECT {', '.join(agg_cols)} FROM events
)
{selects}
ORDER BY col_name
"""


QUERIES = [
    Query("q31_moment_stats", q31_moment_stats, Q31_SQL,
          "stddev/variance/corr/covar moments"),
    Query("q32_exact_percentiles", q32_exact_percentiles, Q32_SQL,
          "exact continuous percentiles"),
    Query("q33_argmin_argmax", q33_argmin_argmax, Q33_SQL,
          "min_by/max_by with deterministic ties"),
    Query("q34_filtered_agg", q34_filtered_agg, Q34_SQL,
          "FILTER-clause conditional aggregation"),
    Query("q35_in_subquery", q35_in_subquery, Q35_SQL,
          "nested uncorrelated IN subqueries"),
    Query("q52_interval_frame", q52_interval_frame, Q52_SQL,
          "time-interval RANGE frame (trailing 1h per-key aggregate)"),
    Query("q36_range_frame", q36_range_frame, Q36_SQL,
          "RANGE value-based window frame"),
    Query("q37_ntile_cume", q37_ntile_cume, Q37_SQL,
          "ntile/cume_dist/percent_rank"),
    Query("q51_skew_profile", q51_skew_profile, Q51_SQL,
          "join-key skew profile (hot-key detector for salting)"),
    Query("q38_collect_agg", q38_collect_agg, Q38_SQL,
          "array_agg collection aggregates"),
    Query("q54_histogram", q54_histogram, Q54_SQL,
          "equi-width histogram (broadcast global bounds, no sort)"),
    Query("q55_robust_outliers", q55_robust_outliers, Q55_SQL,
          "median/MAD robust z-score outlier profile per group"),
    Query("q57_cohort_retention", q57_cohort_retention, Q57_SQL,
          "monthly cohort retention matrix (first-order cohorts, "
          "broadcast re-join)"),
    Query("q60_linear_trend", q60_linear_trend, Q60_SQL,
          "per-group OLS trend (regr_slope/intercept/r2 moment "
          "aggregates, one shuffle)"),
    Query("q64_weighted_quantiles", q64_weighted_quantiles, Q64_SQL,
          "weighted p25/p50/p90 via order-pinned cumulative-weight "
          "window (no built-in weighted percentile on either engine)"),
    Query("q66_table_profile", q66_table_profile, _q66_sql(),
          "table profiling audit: per-column null count, exact "
          "distinct count, numeric min/max in one scan (stack "
          "unpivot of a single global aggregate)"),
]
