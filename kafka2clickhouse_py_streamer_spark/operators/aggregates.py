"""Aggregation operators: hash aggregate (partial+final map-side combine is
automatic in Spark), distinct aggregates, rollup/cube/grouping sets,
having, approximate aggregates.

Scale notes: all of these are single-shuffle hash aggregations on the
group keys; partial aggregation bounds shuffle volume by |groups| per
mapper, so they survive 100 TB as long as group cardinality does. The
approx variants (HLL / KLL sketches) are the constant-memory path when
exact distinct counts would blow the hash table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka2clickhouse_py_streamer_spark.operators.base import Query, table

SHIP_CUTOFF = "1999-09-02"


def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-alike: filter → groupBy(2) → 8 aggregates → sort.

    Flagship query: exercises parquet scan w/ predicate pushdown, fused
    projection, partial+final hash agg (one shuffle), sort on 6 groups.
    """
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit(SHIP_CUTOFF).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            # +1e-9 guards: these sums live on 1e-4/1e-6 decimal grids,
            # so ROUND(...,2) can sit exactly on a half-point where
            # partition-merge order decides the side (see w02 fix)
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
                + 1e-9,
                2,
            ).alias("sum_disc_price"),
            F.round(
                F.sum(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                )
                + 1e-9,
                2,
            ).alias("sum_charge"),
            # +1e-9 before rounding: averages of limited-decimal data
            # can sit exactly on decimal half-points, where engine
            # summation-order noise flips ROUND (see w02_sliding fix)
            F.round(F.avg("l_quantity") + 1e-9, 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice") + 1e-9, 6).alias("avg_price"),
            F.round(F.avg("l_discount") + 1e-9, 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q01_SQL = f"""
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2) AS sum_qty,
       ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)) + 1e-9, 2) AS sum_disc_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)) + 1e-9, 2) AS sum_charge,
       ROUND(AVG(l_quantity) + 1e-9, 6) AS avg_qty,
       ROUND(AVG(l_extendedprice) + 1e-9, 6) AS avg_price,
       ROUND(AVG(l_discount) + 1e-9, 6) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{SHIP_CUTOFF} 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q06_revenue_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-alike: tight multi-predicate filter + global sum (no group).

    All three predicates push down to the parquet scan; the aggregate is a
    partial-per-partition + single final reduce — no wide shuffle at all.
    """
    li = table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.03)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * F.col("l_discount")) + 1e-9, 2
        ).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


Q06_SQL = """
SELECT ROUND(SUM(l_extendedprice * l_discount) + 1e-9, 2) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24
"""


def q12_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) + plain aggregates in one groupBy (expand-based
    distinct aggregation; Spark rewrites to a two-phase agg)."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("distinct_parts"),
            F.countDistinct("l_suppkey").alias("distinct_supps"),
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
        .orderBy("l_returnflag")
    )


Q12_SQL = """
SELECT l_returnflag,
       COUNT(DISTINCT l_partkey) AS distinct_parts,
       COUNT(DISTINCT l_suppkey) AS distinct_supps,
       COUNT(*) AS n_rows,
       ROUND(SUM(l_quantity), 2) AS sum_qty
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


def q13_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (returnflag, linestatus): hierarchical subtotals +
    grand total in one pass (Expand operator feeding one hash agg)."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


Q13_SQL = """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2) AS sum_qty,
       COUNT(*) AS n_rows
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST
"""


def q14_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (orderstatus, orderpriority): all 4 grouping combos."""
    o = table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


Q14_SQL = """
SELECT o_orderstatus, o_orderpriority,
       ROUND(SUM(o_totalprice), 2) AS sum_price,
       COUNT(*) AS n_orders
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
"""


def q23_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via the SQL API (engine exposes spark.sql)."""
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders_gs")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               ROUND(SUM(o_totalprice), 2) AS sum_price,
               COUNT(*) AS n_orders
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
        """
    )


Q23_SQL = """
SELECT o_orderstatus, o_orderpriority,
       ROUND(SUM(o_totalprice), 2) AS sum_price,
       COUNT(*) AS n_orders
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
"""


def q24_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-aggregation filter (HAVING): customers with > 5 orders."""
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_spent"),
        )
        .filter(F.col("n_orders") > 5)
        .orderBy("o_custkey")
    )


Q24_SQL = """
SELECT o_custkey,
       COUNT(*) AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS total_spent
FROM orders
GROUP BY o_custkey
HAVING COUNT(*) > 5
ORDER BY o_custkey
"""


def q27_approx_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch aggregates: HLL++ distinct + approximate quantiles,
    verified against exact aggregates computed in the same pass.

    Sketch values themselves can never hash-match a DuckDB oracle
    (different HLL/GK implementations), so the query outputs the EXACT
    aggregates plus boolean error-bound columns asserting the sketches
    landed within tolerance (HLL++ rsd default 5%; percentile_approx
    rank error n/accuracy). The oracle computes the exact values and
    TRUE literals — a real differential check on both the exact math
    and the sketch quality, instead of the rows-only fallback.

    Scale note: the sketches are the constant-memory 100 TB path; the
    exact companions here are the verification harness, fine at
    bounded group cardinality (3 groups).
    """
    li = table(spark, sf_dir, "lineitem")
    # Two scalar quantile columns, not one array<double>: the driver's
    # pandas canonicalizer cannot sort/hash list cells.
    # rsd pinned at 0.02 with a 5%-or-3-absolute bound: rsd is one
    # standard deviation, not a hard bound, so testing a default-rsd
    # (0.05) sketch against exactly 1x rsd flips false on legitimate
    # ~1-sigma draws at new fixture scales. 0.02 rsd under a
    # max(3, 5%) envelope leaves ~2.5 sigma of headroom (w06's
    # pattern) — the tripwire only fires on a genuinely broken sketch.
    agg = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", 0.02).alias("approx_parts"),
        F.countDistinct("l_partkey").cast("long").alias("exact_parts"),
        F.percentile_approx("l_extendedprice", F.lit(0.5), F.lit(10000))
        .alias("approx_p50"),
        F.expr("percentile(l_extendedprice, 0.5)").alias("p50_exact"),
    )
    return agg.select(
        "l_returnflag",
        "exact_parts",
        (
            F.abs(F.col("approx_parts") - F.col("exact_parts"))
            <= F.greatest(F.lit(3.0), 0.05 * F.col("exact_parts"))
        ).alias("hll_within_5pct"),
        F.round("p50_exact", 4).alias("price_p50"),
        (
            F.abs(F.col("approx_p50") - F.col("p50_exact"))
            <= 0.01 * F.col("p50_exact")
        ).alias("p50_within_1pct"),
    ).orderBy("l_returnflag")


Q27_SQL = """
SELECT l_returnflag,
       CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
       TRUE AS hll_within_5pct,
       ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS price_p50,
       TRUE AS p50_within_1pct
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


QUERIES = [
    Query("q01_pricing_summary", q01_pricing_summary, Q01_SQL,
          "filter+groupBy+8 aggs (TPC-H Q1-alike); flagship"),
    Query("q06_revenue_filter", q06_revenue_filter, Q06_SQL,
          "multi-predicate pushdown filter + global agg (TPC-H Q6-alike)"),
    Query("q12_distinct_agg", q12_distinct_agg, Q12_SQL,
          "count distinct + plain aggs"),
    Query("q13_rollup", q13_rollup, Q13_SQL, "ROLLUP subtotals"),
    Query("q14_cube", q14_cube, Q14_SQL, "CUBE grouping combos"),
    Query("q23_grouping_sets", q23_grouping_sets, Q23_SQL,
          "GROUPING SETS via SQL API"),
    Query("q24_having", q24_having, Q24_SQL, "HAVING post-agg filter"),
    Query("q27_approx_stats", q27_approx_stats, Q27_SQL,
          "HLL distinct + approx quantiles, error-bound-verified vs "
          "exact aggregates (differential oracle restored)"),
]
