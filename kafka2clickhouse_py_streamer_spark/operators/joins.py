"""Join operators: broadcast + shuffle equi-joins, semi/anti, outer,
non-equi (theta), and an as-of join built from Spark primitives.

Scale notes: dimension tables (region/nation/supplier/part at TPC-H
ratios) are broadcast — zero shuffle of the fact side. Fact-to-fact joins
(orders⋈lineitem) shuffle both sides on the key; at 100 TB that is the
dominant cost, so both sides are pre-filtered/pruned before the join and
AQE handles skew. The as-of join is the window-function formulation: one
shuffle + one sort, no per-row Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka2clickhouse_py_streamer_spark.operators.base import Query, table


def q02_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue per region: fact table joined through two broadcast dims.

    nation (25 rows) and region (5 rows) are broadcast explicitly; the
    customer⋈orders join shuffles on custkey.
    """
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    o = table(spark, sf_dir, "orders")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("r_name")
    )


Q02_SQL = """
SELECT r_name,
       ROUND(SUM(o_totalprice), 2) AS revenue,
       COUNT(*) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
ORDER BY r_name
"""


def q03_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-alike: 3-way join, groupBy, top-10 by revenue.

    orderBy+limit compiles to TakeOrderedAndProject — each partition keeps
    only its top 10, the driver merges; no global sort materialization.
    """
    c = table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
                + 1e-9,  # half-point guard, see q01
                2,
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


Q03_SQL = """
SELECT o_orderkey, o_orderdate, o_orderpriority,
       ROUND(SUM(l_extendedprice * (1 - l_discount)) + 1e-9, 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderkey ASC
LIMIT 10
"""


def q04_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI: orders that have at least one big-quantity lineitem.

    Semi-join ships only the join key of the probe side and stops at first
    match — the right plan shape for EXISTS at scale.
    """
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    return (
        o.join(li, o.o_orderkey == li.l_orderkey, "left_semi")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .orderBy("o_orderkey")
    )


Q04_SQL = """
SELECT o_orderkey, o_orderstatus, o_totalprice
FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
ORDER BY o_orderkey
"""


def q05_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI: customers with no orders (NOT EXISTS)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    )


Q05_SQL = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
ORDER BY c_custkey
"""


def q07_left_join_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER + count: order count per customer including zeros.

    COUNT(o_orderkey) (not COUNT(*)) so unmatched customers count 0.
    """
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(F.count("o_orderkey").alias("n_orders"))
        .orderBy("c_custkey")
    )


Q07_SQL = """
SELECT c_custkey, c_name, COUNT(o_orderkey) AS n_orders
FROM customer c
LEFT JOIN orders o ON c.c_custkey = o.o_custkey
GROUP BY c_custkey, c_name
ORDER BY c_custkey
"""


def q25_theta_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi + non-equi (theta) join: lineitems whose quantity exceeds the
    part's size. The equi key carries the shuffle; the theta predicate is
    evaluated as a post-join filter inside the same join operator."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    return (
        li.join(
            F.broadcast(p),
            (li.l_partkey == p.p_partkey) & (li.l_quantity > p.p_size),
        )
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_over"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        )
        .orderBy("p_brand")
    )


Q25_SQL = """
SELECT p_brand,
       COUNT(*) AS n_over,
       ROUND(SUM(l_extendedprice), 2) AS sum_price
FROM lineitem
JOIN part ON l_partkey = p_partkey AND l_quantity > p_size
GROUP BY p_brand
ORDER BY p_brand
"""


def asof_carry_enrich(e: DataFrame, o: DataFrame) -> DataFrame:
    """The union-sort carry-forward as-of core, SHARED by the q26
    batch operator and the streaming timeline enrichment
    (streaming/asof_stream.py) so the twins cannot drift: events
    (event_id, user_id, ts) each pick up the latest order
    (o_custkey, o_orderkey, o_orderdate, o_totalprice) of the same
    key at-or-before their time. Tie/dup discipline: orders sort
    before events at the same instant (as-of is ≤), equal-instant
    orders resolve to the max o_orderkey (ascending sort + last()).
    Returns unordered enriched event rows; callers order/partition."""
    ev = e.select(
        F.col("user_id").alias("k"),
        F.date_trunc("second", F.col("ts")).alias("t"),
        F.lit(1).alias("is_event"),
        "event_id",
        F.lit(None).cast("long").alias("o_orderkey"),
        F.lit(None).cast("timestamp").alias("o_orderdate"),
        F.lit(None).cast("double").alias("o_totalprice"),
    )
    od = o.select(
        F.col("o_custkey").alias("k"),
        F.col("o_orderdate").cast("timestamp").alias("t"),
        F.lit(0).alias("is_event"),
        F.lit(None).cast("long").alias("event_id"),
        "o_orderkey",
        F.col("o_orderdate").cast("timestamp").alias("o_orderdate"),
        "o_totalprice",
    )
    # Sort: orders before events at the same instant (as-of is <=), and
    # ascending o_orderkey so the carried row is the max-orderkey tie
    # winner — same pick as the twin's ORDER BY ... DESC rn=1.
    w = (
        Window.partitionBy("k")
        .orderBy("t", "is_event", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # null keys: the window would group them together (nulls compare
    # equal in partitionBy) while the join twin drops them; null TIMES
    # likewise — an event with no event-time has no "before" (the
    # time-ops contract), and the twin's range predicate drops it,
    # while an unfiltered union-sort would PLACE it by the engine's
    # null ordering and carry it a bogus order (caught by the null-ts
    # probe). Filter both to match equi-join semantics on any input.
    carried = ev.unionByName(od).filter(
        F.col("k").isNotNull() & F.col("t").isNotNull()
    ).select(
        "k",
        "is_event",
        "event_id",
        *[
            F.last(c, ignorenulls=True).over(w).alias(c)
            for c in ("o_orderkey", "o_orderdate", "o_totalprice")
        ],
    )
    return carried.filter(
        (F.col("is_event") == 1) & F.col("o_orderkey").isNotNull()
    ).select(
        "event_id",
        F.col("k").alias("user_id"),
        "o_orderkey",
        "o_orderdate",
        "o_totalprice",
    )


def q26_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (Spark has no native one): for each event, the latest
    order of the same key at-or-before the event date.

    Default plan is the **union-sort carry-forward**
    (:func:`asof_carry_enrich`): tag both sides, union them, shuffle
    ONCE on the key, sort within the key by (time, side, orderkey),
    and carry the latest order's columns onto each event row with a
    running ``last(..., ignoreNulls)`` window. There is no join
    operator at all — the intermediate is exactly |events| + |orders|
    rows, so per-key fan-out is bounded linearly no matter how many
    earlier orders a hot user has. The join+rn=1 formulation
    (``asof_join_fanout`` below, kept as the oracle twin) materializes
    every (event, earlier-order) pair first — unbounded per-key at
    100 TB. (Reference has no joins at all — SURVEY.md §2b.)
    """
    e = table(spark, sf_dir, "events")
    o = table(spark, sf_dir, "orders")
    return asof_carry_enrich(e, o).orderBy("event_id")


def asof_join_fanout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The join+row_number()==1 as-of formulation: equi-join on the key
    + range predicate, then keep the latest order per event. Small-scale
    oracle twin of :func:`q26_asof_join` — every (event, earlier-order)
    pair materializes before the rn filter, so per-key fan-out is
    unbounded; use the union-sort default at scale."""
    e = table(spark, sf_dir, "events").select(
        "event_id", "user_id", F.col("ts").alias("event_ts")
    )
    o = table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"
    )
    # user_id spans a smaller range than custkey; join key = user_id
    joined = e.join(
        o,
        (e.user_id == o.o_custkey)
        & (o.o_orderdate <= F.date_trunc("second", e.event_ts)),
        "inner",
    )
    w = Window.partitionBy("event_id").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "event_id",
            "user_id",
            "o_orderkey",
            F.col("o_orderdate").cast("timestamp").alias("o_orderdate"),
            "o_totalprice",
        )
        .orderBy("event_id")
    )


Q26_SQL = """
WITH j AS (
  SELECT e.event_id, e.user_id, o.o_orderkey, o.o_orderdate, o.o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY e.event_id
                            ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
  FROM events e
  JOIN orders o ON e.user_id = o.o_custkey
               AND o.o_orderdate <= date_trunc('second', e.ts)
  -- explicit: DuckDB 1.0's range-join path matches NULL-ts rows when
  -- the bound is date_trunc(ts) (plain ts <= behaves correctly) — the
  -- guard states the no-event-time-no-as-of contract AND dodges the
  -- engine bug
  WHERE e.ts IS NOT NULL
)
SELECT event_id, user_id, o_orderkey, o_orderdate, o_totalprice
FROM j WHERE rn = 1
ORDER BY event_id
"""


def q21_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery via the SQL API: orders above their
    customer's average price. Catalyst de-correlates this into an
    aggregate + join."""
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders_cs")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey,
               ROUND(o_totalprice, 2) AS price
        FROM orders_cs o1
        WHERE o_totalprice > (SELECT 1.5 * AVG(o_totalprice)
                              FROM orders_cs o2
                              WHERE o2.o_custkey = o1.o_custkey)
        ORDER BY o_orderkey
        """
    )


Q21_SQL = """
SELECT o_orderkey, o_custkey,
       ROUND(o_totalprice, 2) AS price
FROM orders o1
WHERE o_totalprice > (SELECT 1.5 * AVG(o_totalprice)
                      FROM orders o2
                      WHERE o2.o_custkey = o1.o_custkey)
ORDER BY o_orderkey
"""


def q47_exists_pair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS + NOT EXISTS in one predicate, via the SQL
    API: customers with at least one large order but no failed ('F')
    order. Catalyst decorrelates the pair into a left-semi join
    followed by a left-anti join — two shuffles on the correlation
    key, no per-row subquery execution anywhere."""
    table(spark, sf_dir, "customer").createOrReplaceTempView("customer_ex")
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders_ex")
    return spark.sql(
        """
        SELECT c_custkey, c_name
        FROM customer_ex c
        WHERE EXISTS (SELECT 1 FROM orders_ex o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 250000)
          AND NOT EXISTS (SELECT 1 FROM orders_ex o2
                          WHERE o2.o_custkey = c.c_custkey
                            AND o2.o_orderstatus = 'F')
        ORDER BY c_custkey
        """
    )


Q47_SQL = """
SELECT c_custkey, c_name
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_totalprice > 250000)
  AND NOT EXISTS (SELECT 1 FROM orders o2
                  WHERE o2.o_custkey = c.c_custkey
                    AND o2.o_orderstatus = 'F')
ORDER BY c_custkey
"""


def q48_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key join under salting: events has only 5 distinct
    event_type values, so each join key is ~20% of the fact table — the
    classic hot spot where a plain shuffle join lands a whole key's rows
    (20 TB of a 100 TB table) on ONE task. ``salted_join``
    (functions/skew.py) spreads each key over 8 salts; the small side is
    hinted shuffle_hash to exercise the non-broadcast path salting
    exists for (a broadcastable dim wouldn't need salt). Result is
    bit-identical to the unsalted join — the oracle proves it."""
    from kafka2clickhouse_py_streamer_spark.functions.skew import salted_join

    e = table(spark, sf_dir, "events")
    stats = (
        e.groupBy(F.col("event_type").alias("et"))
        .agg(F.avg("value").alias("type_avg"))
        .hint("shuffle_hash")
    )
    joined = salted_join(
        e,
        stats,
        F.col("event_type") == F.col("et"),
        salt_n=8,
        large_stable_cols=["event_id"],
    )
    return joined.select(
        "event_id",
        "event_type",
        F.round(F.col("value") - F.col("type_avg"), 4).alias("value_dev"),
    ).orderBy("event_id")


Q48_SQL = """
WITH stats AS (
  SELECT event_type AS et, AVG(value) AS type_avg
  FROM events GROUP BY event_type
)
SELECT event_id, event_type,
       ROUND(value - type_avg, 4) AS value_dev
FROM events JOIN stats ON event_type = et
ORDER BY event_id
"""


def q49_upsert_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE / SCD-1 upsert as a relational plan: apply a change set
    (update existing keys, insert new ones) onto a base table in ONE
    full-outer join — the pattern for CDC apply on engines without a
    native MERGE INTO. Tagging rows updated/inserted/unchanged needs no
    extra pass; at scale this is a single shuffle on the merge key
    (or zero with both sides bucketed on it).

    The change set is derived deterministically: per-customer order
    totals above a threshold become balance updates; keys ≡ 0 (mod 97)
    are shifted out of the base key space to exercise the insert path.
    """
    c = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal"
    )
    delta = (
        table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.sum("o_totalprice").alias("tot"))
        .filter(F.col("tot") > 400000.005)
        .select(
            F.when(
                F.col("o_custkey") % 97 == 0, F.col("o_custkey") + 1000000
            )
            .otherwise(F.col("o_custkey"))
            .alias("c_custkey"),
            F.round(F.col("tot") / 1000, 2).alias("new_bal"),
        )
    )
    merged = c.join(delta, "c_custkey", "full")
    return merged.select(
        "c_custkey",
        F.round(F.coalesce("new_bal", "c_acctbal"), 2).alias("acctbal"),
        F.when(F.col("c_name").isNull(), F.lit("inserted"))
        .when(F.col("new_bal").isNotNull(), F.lit("updated"))
        .otherwise(F.lit("unchanged"))
        .alias("merge_action"),
    ).orderBy("c_custkey")


Q49_SQL = """
WITH delta AS (
  SELECT CASE WHEN o_custkey % 97 = 0 THEN o_custkey + 1000000
              ELSE o_custkey END AS c_custkey,
         ROUND(SUM(o_totalprice) / 1000, 2) AS new_bal
  FROM orders
  GROUP BY o_custkey
  HAVING SUM(o_totalprice) > 400000.005
)
SELECT COALESCE(c.c_custkey, d.c_custkey) AS c_custkey,
       ROUND(COALESCE(d.new_bal, c.c_acctbal), 2) AS acctbal,
       CASE WHEN c.c_name IS NULL THEN 'inserted'
            WHEN d.new_bal IS NOT NULL THEN 'updated'
            ELSE 'unchanged' END AS merge_action
FROM customer c
FULL OUTER JOIN delta d ON d.c_custkey = c.c_custkey
ORDER BY c_custkey
"""


RANGE_JOIN_WINDOW_US = 30_000_000  # ±30 s pairing window


def q50_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure time-range (interval) join with NO equi key: pair every
    click with every purchase within ±30 s. A naive theta join on
    |t_a − t_b| ≤ Δ compiles to a nested-loop/cartesian plan — O(n·m)
    comparisons. The scalable formulation buckets both sides into
    Δ-sized time buckets and turns proximity into an EQUI join: the
    click side explodes to its bucket and both neighbors (any pair
    within Δ differs by at most one bucket), the join runs on the
    bucket key, and the exact |Δt| predicate filters inside the join.
    3× row expansion on one side buys a hash-partitionable join —
    the same trick as d03's LSH bands, applied to time.

    Microsecond epochs (unix_micros / epoch_us) keep both engines in
    exact integer arithmetic — no float seconds."""
    e = table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.unix_micros("ts").alias("t_click"),
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.unix_micros("ts").alias("t_buy"),
        F.floor(F.unix_micros("ts") / RANGE_JOIN_WINDOW_US).alias("bucket"),
    )
    cb = F.floor(F.col("t_click") / RANGE_JOIN_WINDOW_US)
    exploded = clicks.select(
        "click_id",
        "t_click",
        F.explode(F.sequence(cb - 1, cb + 1)).alias("bucket"),
    )
    return (
        exploded.join(purchases, "bucket")
        .filter(
            F.abs(F.col("t_click") - F.col("t_buy"))
            <= RANGE_JOIN_WINDOW_US
        )
        .select(
            "click_id",
            "purchase_id",
            (F.col("t_buy") - F.col("t_click")).alias("delta_us"),
        )
        .orderBy("click_id", "purchase_id")
    )


# The oracle states the SAME relation declaratively (DuckDB's
# range-join machinery handles small scale fine; the bucketing above is
# the distributed formulation of this predicate).
Q50_SQL = f"""
SELECT a.event_id AS click_id,
       b.event_id AS purchase_id,
       epoch_us(b.ts) - epoch_us(a.ts) AS delta_us
FROM events a
JOIN events b
  ON a.event_type = 'click' AND b.event_type = 'purchase'
 AND ABS(epoch_us(a.ts) - epoch_us(b.ts)) <= {RANGE_JOIN_WINDOW_US}
ORDER BY click_id, purchase_id
"""


def q62_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL derived table: for each nation, the top-2
    customers by account balance — the per-row-subquery SQL surface
    (Spark 3.2+ LATERAL). Catalyst decorrelates the ORDER BY ... LIMIT
    lateral into a window top-k over the join (verified: no nested
    loop per nation row), so the plan scales exactly like q08's
    explicit row_number form — the point of exposing both spellings."""
    for t in ("nation", "customer"):
        table(spark, sf_dir, t).createOrReplaceTempView(f"{t}_q62")
    return spark.sql(
        """
        SELECT n.n_name, top.c_name,
               ROUND(top.c_acctbal, 2) AS acctbal
        FROM nation_q62 n,
        LATERAL (
            SELECT c_name, c_acctbal
            FROM customer_q62 c
            WHERE c.c_nationkey = n.n_nationkey
            ORDER BY c_acctbal DESC, c_custkey ASC
            LIMIT 2
        ) AS top
        ORDER BY n.n_name, acctbal DESC, top.c_name
        """
    )


Q62_SQL = """
SELECT n.n_name, top.c_name, ROUND(top.c_acctbal, 2) AS acctbal
FROM nation n,
LATERAL (
    SELECT c_name, c_acctbal
    FROM customer c
    WHERE c.c_nationkey = n.n_nationkey
    ORDER BY c_acctbal DESC, c_custkey ASC
    LIMIT 2
) AS top
ORDER BY n.n_name, acctbal DESC, top.c_name
"""


def q63_forward_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join — q26's mirror: for each event, the EARLIEST
    order of the same key at-or-after the event time ("what did this
    session lead to" — the attribution direction; q26 answers "what
    preceded it"). Same union-sort carry with the traversal REVERSED:
    sort each key by time DESCENDING (orders before events at equal
    instants, ties by descending orderkey so the carried row is the
    min-orderkey winner) and carry the most recently traversed order —
    which is the earliest upcoming one — onto each event row.

    Scale shape: identical to q26 — no join operator at all, ONE
    shuffle on the key, |events|+|orders| intermediate rows, so
    per-key fan-out stays linear where the join+rn=1 twin (the
    oracle) materializes every (event, later-order) pair."""
    e = table(spark, sf_dir, "events")
    o = table(spark, sf_dir, "orders")
    ev = e.select(
        F.col("user_id").alias("k"),
        F.date_trunc("second", F.col("ts")).alias("t"),
        F.lit(1).alias("is_event"),
        "event_id",
        F.lit(None).cast("long").alias("o_orderkey"),
        F.lit(None).cast("timestamp").alias("o_orderdate"),
    )
    od = o.select(
        F.col("o_custkey").alias("k"),
        F.col("o_orderdate").cast("timestamp").alias("t"),
        F.lit(0).alias("is_event"),
        F.lit(None).cast("long").alias("event_id"),
        "o_orderkey",
        F.col("o_orderdate").cast("timestamp").alias("o_orderdate"),
    )
    w = (
        Window.partitionBy("k")
        .orderBy(
            F.col("t").desc(),
            F.col("is_event").asc(),
            F.col("o_orderkey").desc(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # null key / null time: excluded, exactly as in q26 (no event-time
    # means no "after" either)
    carried = ev.unionByName(od).filter(
        F.col("k").isNotNull() & F.col("t").isNotNull()
    ).select(
        "k",
        "is_event",
        "event_id",
        *[
            F.last(c, ignorenulls=True).over(w).alias(c)
            for c in ("o_orderkey", "o_orderdate")
        ],
    )
    return (
        carried.filter(
            (F.col("is_event") == 1) & F.col("o_orderkey").isNotNull()
        )
        .select(
            "event_id",
            F.col("k").alias("user_id"),
            F.col("o_orderkey").alias("next_orderkey"),
            F.col("o_orderdate").alias("next_orderdate"),
        )
        .orderBy("event_id")
    )


Q63_SQL = """
SELECT event_id, user_id, next_orderkey, next_orderdate
FROM (
  SELECT e.event_id, e.user_id,
         o.o_orderkey AS next_orderkey,
         CAST(o.o_orderdate AS TIMESTAMP) AS next_orderdate,
         ROW_NUMBER() OVER (PARTITION BY e.event_id
              ORDER BY o.o_orderdate ASC, o.o_orderkey ASC) AS rn
  FROM events e
  JOIN orders o ON o.o_custkey = e.user_id
   AND CAST(o.o_orderdate AS TIMESTAMP) >= DATE_TRUNC('second', e.ts)
  WHERE e.ts IS NOT NULL  -- same contract + DuckDB range-join NULL
                          -- guard as Q26
) WHERE rn = 1
ORDER BY event_id
"""


QUERIES = [
    Query("q02_region_revenue", q02_region_revenue, Q02_SQL,
          "fact⋈broadcast-dims revenue rollup"),
    Query("q03_top_orders", q03_top_orders, Q03_SQL,
          "3-way join + top-10 (TPC-H Q3-alike)"),
    Query("q04_semi_join", q04_semi_join, Q04_SQL, "LEFT SEMI / EXISTS"),
    Query("q05_anti_join", q05_anti_join, Q05_SQL, "LEFT ANTI / NOT EXISTS"),
    Query("q07_left_join_count", q07_left_join_count, Q07_SQL,
          "LEFT OUTER + count with zeros"),
    Query("q21_correlated_subquery", q21_correlated_subquery, Q21_SQL,
          "correlated scalar subquery (SQL API)"),
    Query("q25_theta_join", q25_theta_join, Q25_SQL,
          "equi+theta join on broadcast dim"),
    Query("q26_asof_join", q26_asof_join, Q26_SQL,
          "as-of join via window formulation"),
    Query("q47_exists_pair", q47_exists_pair, Q47_SQL,
          "correlated EXISTS + NOT EXISTS (semi ⋈ anti decorrelation)"),
    Query("q48_salted_join", q48_salted_join, Q48_SQL,
          "hot-key join spread over salts (skew mitigation)"),
    Query("q49_upsert_merge", q49_upsert_merge, Q49_SQL,
          "CDC upsert (MERGE twin) via one full-outer join"),
    Query("q50_range_join", q50_range_join, Q50_SQL,
          "time-range join via bucketed equi-join (no cartesian)"),
    Query("q63_forward_asof", q63_forward_asof, Q63_SQL,
          "forward as-of join (earliest upcoming order per event) via "
          "the reversed union-sort carry — no join operator"),
    Query("q62_lateral_topn", q62_lateral_topn, Q62_SQL,
          "correlated LATERAL derived table (decorrelated to window "
          "top-k)"),
]
