"""Scalar-function surface (string / date / JSON / array / conditional),
sort+limit, set operations, pivot.

All expressions are JVM built-ins inside whole-stage codegen — no Python
on the hot path. JSON access uses ``get_json_object`` (no full parse /
schema inference); array math uses higher-order functions
(transform/aggregate) which execute vectorized in the JVM.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka2clickhouse_py_streamer_spark.operators.base import Query, table


def q11_sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-20 (TakeOrderedAndProject: per-partition top-k + merge,
    no full sort)."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            F.round("l_extendedprice", 2).alias("price"),
        )
        .orderBy(
            F.col("price").desc(),
            F.col("l_orderkey").asc(),
            F.col("l_linenumber").asc(),
        )
        .limit(20)
    )


Q11_SQL = """
SELECT l_orderkey, l_linenumber, ROUND(l_extendedprice, 2) AS price
FROM lineitem
ORDER BY price DESC, l_orderkey ASC, l_linenumber ASC
LIMIT 20
"""


def q15_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION / INTERSECT / EXCEPT over customer-key sets."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    big_spenders = (
        o.groupBy("o_custkey")
        .agg(F.sum("o_totalprice").alias("t"))
        .filter(F.col("t") > 300000)
        .select(F.col("o_custkey").alias("custkey"))
    )
    building = c.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("custkey")
    )
    machinery = c.filter(F.col("c_mktsegment") == "MACHINERY").select(
        F.col("c_custkey").alias("custkey")
    )
    return (
        big_spenders.intersect(building.unionByName(machinery))
        .exceptAll(machinery)
        .orderBy("custkey")
    )


Q15_SQL = """
WITH big_spenders AS (
  SELECT o_custkey AS custkey FROM orders
  GROUP BY o_custkey HAVING SUM(o_totalprice) > 300000
), building AS (
  SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
), machinery AS (
  SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'MACHINERY'
)
(SELECT custkey FROM big_spenders
 INTERSECT
 (SELECT custkey FROM building UNION SELECT custkey FROM machinery))
EXCEPT ALL
SELECT custkey FROM machinery
ORDER BY custkey
"""


def q16_string_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String kernel: lower/upper, substring, concat, regexp_extract,
    length, replace, split. NULLIF('') normalizes the engines' no-match
    conventions."""
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lower("p_name").alias("name_lower"),
        F.upper("p_brand").alias("brand_upper"),
        F.substring("p_type", 1, 5).alias("type_prefix"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.nullif(F.regexp_extract("p_brand", r"#(\d+)", 1), F.lit("")).alias(
            "brand_num"
        ),
        F.length("p_name").cast("long").alias("name_len"),
        F.regexp_replace("p_type", r"\s+", "_").alias("type_snake"),
        F.size(F.split("p_name", " ")).cast("long").alias("name_words"),
    ).orderBy("p_partkey")


Q16_SQL = r"""
SELECT p_partkey,
       LOWER(p_name) AS name_lower,
       UPPER(p_brand) AS brand_upper,
       SUBSTRING(p_type, 1, 5) AS type_prefix,
       CONCAT_WS('|', p_brand, p_type) AS brand_type,
       NULLIF(REGEXP_EXTRACT(p_brand, '#(\d+)', 1), '') AS brand_num,
       CAST(LENGTH(p_name) AS BIGINT) AS name_len,
       REGEXP_REPLACE(p_type, '\s+', '_', 'g') AS type_snake,
       CAST(LEN(STRING_SPLIT(p_name, ' ')) AS BIGINT) AS name_words
FROM part
ORDER BY p_partkey
"""


def q17_date_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date kernel: year/month/day extraction, date_trunc, datediff,
    date arithmetic, dayofweek."""
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("order_year"),
        F.month("o_orderdate").cast("long").alias("order_month"),
        F.dayofmonth("o_orderdate").cast("long").alias("order_day"),
        F.to_date(F.date_trunc("month", "o_orderdate")).alias("month_start"),
        F.datediff(F.lit("2002-01-01").cast("date"), F.col("o_orderdate").cast("date"))
        .cast("long")
        .alias("days_to_2002"),
        F.date_add(F.col("o_orderdate").cast("date"), 30).alias("due_date"),
        F.dayofweek("o_orderdate").cast("long").alias("dow"),
    ).orderBy("o_orderkey")


# DuckDB: dayofweek/ isodow differ from Spark's dayofweek (Sun=1..Sat=7).
# DuckDB dayofweek(ts) = 0..6 with Sunday=0 -> +1 aligns with Spark.
Q17_SQL = """
SELECT o_orderkey,
       CAST(YEAR(o_orderdate) AS BIGINT) AS order_year,
       CAST(MONTH(o_orderdate) AS BIGINT) AS order_month,
       CAST(DAYOFMONTH(o_orderdate) AS BIGINT) AS order_day,
       CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS month_start,
       CAST(DATEDIFF('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS BIGINT) AS days_to_2002,
       CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE) AS due_date,
       CAST(DAYOFWEEK(o_orderdate) + 1 AS BIGINT) AS dow
FROM orders
ORDER BY o_orderkey
"""


def q45_calendar_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar arithmetic kernel: month-offset with end-of-month
    clamping (add_months), last_day, quarter, ISO week number, and
    string formatting — the pieces q17's day-grain kernel doesn't cover.
    Deterministic 1-in-97 key subsample keeps the result compact."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 97 == 0)
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        d.alias("order_date"),
        F.add_months(d, 3).alias("plus_3m"),
        F.last_day(d).alias("month_end"),
        F.quarter(d).cast("long").alias("qtr"),
        F.weekofyear(d).cast("long").alias("iso_week"),
        F.date_format(d, "yyyy-MM").alias("ym"),
    ).orderBy("o_orderkey")


# DuckDB date + INTERVAL yields TIMESTAMP -> cast back to DATE (both
# engines clamp end-of-month on month addition); WEEK() is ISO week,
# matching Spark's weekofyear.
Q45_SQL = """
SELECT o_orderkey,
       CAST(o_orderdate AS DATE) AS order_date,
       CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS plus_3m,
       LAST_DAY(CAST(o_orderdate AS DATE)) AS month_end,
       CAST(QUARTER(o_orderdate) AS BIGINT) AS qtr,
       CAST(WEEK(o_orderdate) AS BIGINT) AS iso_week,
       STRFTIME(CAST(o_orderdate AS DATE), '%Y-%m') AS ym
FROM orders
WHERE o_orderkey % 97 = 0
ORDER BY o_orderkey
"""


def q46_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG / string_agg): nation names
    per region, comma-joined in alphabetical order. collect_list order
    is nondeterministic after a shuffle, so the list is array_sort-ed
    before joining — the only way a distributed string_agg is
    reproducible. Small-dim tables; the groupBy is a broadcast-scale
    agg."""
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"))
        .agg(
            F.array_join(
                F.array_sort(F.collect_list("n_name")), ","
            ).alias("nations"),
            F.count(F.lit(1)).alias("n_nations"),
        )
        .orderBy("region")
    )


Q46_SQL = """
SELECT r.r_name AS region,
       STRING_AGG(n.n_name, ',' ORDER BY n.n_name) AS nations,
       COUNT(*) AS n_nations
FROM nation n
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name
ORDER BY region
"""


def q18_json_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path access on the events.props string column — no schema
    inference, single-field extraction (the 100 TB-safe way to touch
    semi-structured columns)."""
    e = table(spark, sf_dir, "events")
    return (
        e.withColumn(
            "k", F.get_json_object("props", "$.k").cast("long")
        )
        .groupBy("event_type")
        .agg(
            F.round(F.avg("k"), 4).alias("avg_k"),
            F.max("k").alias("max_k"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("event_type")
    )


# json_valid guard mirrors Spark's get_json_object, which returns NULL
# for malformed JSON instead of erroring (DuckDB json_extract throws).
Q18_SQL = """
WITH parsed AS (
  SELECT event_type,
         CASE WHEN props IS NOT NULL AND json_valid(props)
              THEN CAST(json_extract_string(props, '$.k') AS BIGINT)
         END AS k
  FROM events
)
SELECT event_type,
       ROUND(AVG(k), 4) AS avg_k,
       MAX(k) AS max_k,
       COUNT(*) AS n
FROM parsed
GROUP BY event_type
ORDER BY event_type
"""


def q19_array_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array kernel over embeddings: size, element access, higher-order
    aggregate (sum/mean of elements) — all JVM higher-order functions,
    identical element iteration order to the oracle."""
    em = table(spark, sf_dir, "embeddings")
    vec_d = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return em.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        # try_element_at: NULL on an empty array (matches DuckDB's
        # embedding[1]); plain element_at throws under ANSI
        F.round(F.try_element_at(vec_d, F.lit(1)), 6).alias("first_elem"),
        F.round(
            F.aggregate(vec_d, F.lit(0.0), lambda acc, x: acc + x), 6
        ).alias("elem_sum"),
        F.round(
            F.aggregate(vec_d, F.lit(0.0), lambda acc, x: acc + x * x), 6
        ).alias("elem_sq_sum"),
    ).orderBy("vec_id")


Q19_SQL = """
SELECT vec_id,
       CAST(LEN(embedding) AS BIGINT) AS dim,
       ROUND(CAST(embedding[1] AS DOUBLE), 6) AS first_elem,
       CASE WHEN embedding IS NOT NULL THEN
         ROUND(list_reduce(list_prepend(0.0, list_transform(embedding, x -> CAST(x AS DOUBLE))),
                           (acc, x) -> acc + x), 6) END AS elem_sum,
       CASE WHEN embedding IS NOT NULL THEN
         ROUND(list_reduce(list_prepend(0.0, list_transform(embedding, x -> CAST(x AS DOUBLE))),
                           (acc, x) -> acc + x * x), 6) END AS elem_sq_sum
FROM embeddings
ORDER BY vec_id
"""


def q20_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional kernel: CASE WHEN, coalesce, nullif, try_cast,
    greatest/least."""
    c = table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "overdrawn")
        .when(F.col("c_acctbal") < 5000, "standard")
        .otherwise("premium")
        .alias("tier"),
        F.coalesce(F.nullif("c_mktsegment", F.lit("BUILDING")), F.lit("(b)")).alias(
            "seg_masked"
        ),
        F.expr("try_cast(c_name AS BIGINT)").alias("name_as_num"),
        F.expr("try_cast(substring(c_name, 10, 18) AS BIGINT)").alias(
            "name_suffix_num"
        ),
        F.round(F.greatest(F.col("c_acctbal"), F.lit(0.0)), 2).alias(
            "bal_floor0"
        ),
        F.round(F.least(F.col("c_acctbal"), F.lit(1000.0)), 2).alias(
            "bal_cap1k"
        ),
    ).orderBy("c_custkey")


Q20_SQL = """
SELECT c_custkey,
       CASE WHEN c_acctbal < 0 THEN 'overdrawn'
            WHEN c_acctbal < 5000 THEN 'standard'
            ELSE 'premium' END AS tier,
       COALESCE(NULLIF(c_mktsegment, 'BUILDING'), '(b)') AS seg_masked,
       TRY_CAST(c_name AS BIGINT) AS name_as_num,
       TRY_CAST(SUBSTRING(c_name, 10, 18) AS BIGINT) AS name_suffix_num,
       ROUND(GREATEST(c_acctbal, 0.0), 2) AS bal_floor0,
       ROUND(LEAST(c_acctbal, 1000.0), 2) AS bal_cap1k
FROM customer
ORDER BY c_custkey
"""


def q22_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (wide conditional aggregation): order totals by priority ×
    status. Explicit value list so no extra distinct-values job runs."""
    o = table(spark, sf_dir, "orders")
    pv = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.round(F.sum("o_totalprice"), 2))
    )
    return pv.select(
        "o_orderpriority",
        F.col("O").alias("total_open"),
        F.col("F").alias("total_filled"),
        F.col("P").alias("total_pending"),
    ).orderBy("o_orderpriority")


Q22_SQL = """
SELECT o_orderpriority,
       ROUND(SUM(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END), 2) AS total_open,
       ROUND(SUM(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END), 2) AS total_filled,
       ROUND(SUM(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END), 2) AS total_pending
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def q30_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot via stack(): long-format (metric, value) rows per part."""
    p = table(spark, sf_dir, "part")
    return (
        p.selectExpr(
            "p_partkey",
            "stack(2, 'size', CAST(p_size AS DOUBLE), "
            "'retailprice', p_retailprice) AS (metric, metric_value)",
        )
        .withColumn("metric_value", F.round("metric_value", 2))
        .orderBy("p_partkey", "metric")
    )


Q30_SQL = """
SELECT p_partkey, metric, ROUND(metric_value, 2) AS metric_value
FROM (
  SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS metric_value FROM part
  UNION ALL
  SELECT p_partkey, 'retailprice' AS metric, p_retailprice AS metric_value FROM part
)
ORDER BY p_partkey, metric
"""


def q39_math_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math kernel: abs/ceil/floor/sqrt/ln/exp/power/mod over prices —
    all whole-stage-codegen JVM intrinsics."""
    o = table(spark, sf_dir, "orders")
    p = F.col("o_totalprice")
    return o.select(
        "o_orderkey",
        F.round(F.abs(p - 150000), 2).alias("abs_dev"),
        F.ceil(p / 1000).cast("long").alias("price_ceil_k"),
        F.floor(p / 1000).cast("long").alias("price_floor_k"),
        F.round(F.sqrt(p), 6).alias("sqrt_price"),
        F.round(F.log(p), 6).alias("ln_price"),
        F.round(F.exp(p / 500000), 6).alias("exp_scaled"),
        F.round(F.pow(p, F.lit(0.25)), 6).alias("price_4th_root"),
        (F.col("o_orderkey") % 7).cast("long").alias("key_mod7"),
    ).orderBy("o_orderkey")


Q39_SQL = """
SELECT o_orderkey,
       ROUND(ABS(o_totalprice - 150000), 2) AS abs_dev,
       CAST(CEIL(o_totalprice / 1000) AS BIGINT) AS price_ceil_k,
       CAST(FLOOR(o_totalprice / 1000) AS BIGINT) AS price_floor_k,
       ROUND(SQRT(o_totalprice), 6) AS sqrt_price,
       ROUND(LN(o_totalprice), 6) AS ln_price,
       ROUND(EXP(o_totalprice / 500000), 6) AS exp_scaled,
       ROUND(POWER(o_totalprice, 0.25), 6) AS price_4th_root,
       CAST(o_orderkey % 7 AS BIGINT) AS key_mod7
FROM orders
ORDER BY o_orderkey
"""


def q40_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join: reconcile per-nation customer and supplier
    counts — rows survive from either side, nulls coalesced."""
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    cn = c.groupBy(F.col("c_nationkey").alias("ckey")).agg(
        F.count(F.lit(1)).alias("n_cust")
    )
    sn = s.groupBy(F.col("s_nationkey").alias("skey")).agg(
        F.count(F.lit(1)).alias("n_supp")
    )
    return (
        cn.join(sn, cn.ckey == sn.skey, "full_outer")
        .select(
            F.coalesce("ckey", "skey").alias("nationkey"),
            F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
            F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
        )
        .orderBy("nationkey")
    )


Q40_SQL = """
WITH cn AS (
  SELECT c_nationkey AS ckey, COUNT(*) AS n_cust FROM customer GROUP BY c_nationkey
), sn AS (
  SELECT s_nationkey AS skey, COUNT(*) AS n_supp FROM supplier GROUP BY s_nationkey
)
SELECT COALESCE(ckey, skey) AS nationkey,
       COALESCE(n_cust, 0) AS n_cust,
       COALESCE(n_supp, 0) AS n_supp
FROM cn FULL OUTER JOIN sn ON ckey = skey
ORDER BY nationkey
"""


def q41_map_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-type kernel: build a map from entries, access by key, list
    keys — exercises MapType end to end (the events.props JSON string
    parsed into map<string,string>)."""
    e = table(spark, sf_dir, "events")
    m = F.from_json(F.col("props"), "map<string,string>")
    # Keys serialized to one sorted string (not array<string>): the
    # driver's pandas canonicalizer cannot sort/hash list cells.
    return e.select(
        "event_id",
        m.getItem("k").cast("long").alias("prop_k"),
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("prop_keys"),
        F.size(F.map_keys(m)).cast("long").alias("n_props"),
    ).orderBy("event_id")


# Guard = valid JSON **object**: Spark's from_json to a map yields NULL
# for malformed JSON *and* for valid non-object JSON ('123', '[1,2]');
# DuckDB json_keys would return [] for the latter — mirror the NULL.
Q41_SQL = """
SELECT event_id,
       CASE WHEN props IS NOT NULL AND json_valid(props)
                 AND json_type(props) = 'OBJECT'
            THEN CAST(json_extract_string(props, '$.k') AS BIGINT) END AS prop_k,
       CASE WHEN props IS NOT NULL AND json_valid(props)
                 AND json_type(props) = 'OBJECT'
            THEN COALESCE(array_to_string(list_sort(json_keys(props)), ','), '')
       END AS prop_keys,
       CASE WHEN props IS NOT NULL AND json_valid(props)
                 AND json_type(props) = 'OBJECT'
            THEN CAST(LEN(json_keys(props)) AS BIGINT) END AS n_props
FROM events
ORDER BY event_id
"""


def q42_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional explode (LATERAL VIEW posexplode): tokenize each
    document's first words with their ordinal — the order-preserving
    flatten that plain explode loses."""
    d = table(spark, sf_dir, "documents")
    toks = F.slice(F.split(F.trim(F.lower("text")), r"\s+"), 1, 5)
    return (
        d.select("doc_id", F.posexplode(toks).alias("pos", "tok"))
        .select(
            "doc_id", (F.col("pos") + 1).cast("long").alias("pos"), "tok"
        )
        .orderBy("doc_id", "pos")
    )


# DuckDB has no WITH ORDINALITY: index positions explicitly
Q42_SQL = r"""
WITH arr AS (
  SELECT doc_id,
         list_slice(regexp_split_to_array(TRIM(LOWER(text)), '\s+'), 1, 5) AS tk
  FROM documents
)
SELECT doc_id,
       CAST(pos AS BIGINT) AS pos,
       tk[CAST(pos AS INTEGER)] AS tok
FROM (SELECT doc_id, tk, UNNEST(RANGE(1, LEN(tk) + 1)) AS pos FROM arr)
ORDER BY doc_id, pos
"""


def q43_ratio_to_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-total via an unbounded window over the whole
    partition: each order's share of its status group's revenue."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus")
    return o.select(
        "o_orderstatus",
        "o_orderkey",
        F.round(
            F.col("o_totalprice") / F.sum("o_totalprice").over(w), 8
        ).alias("share"),
    ).orderBy("o_orderstatus", "o_orderkey")


Q43_SQL = """
SELECT o_orderstatus, o_orderkey,
       ROUND(o_totalprice / SUM(o_totalprice) OVER (PARTITION BY o_orderstatus), 8) AS share
FROM orders
ORDER BY o_orderstatus, o_orderkey
"""


QUERIES = [
    Query("q11_sort_limit", q11_sort_limit, Q11_SQL,
          "global top-k (TakeOrderedAndProject)"),
    Query("q15_set_ops", q15_set_ops, Q15_SQL,
          "UNION/INTERSECT/EXCEPT ALL"),
    Query("q16_string_fns", q16_string_fns, Q16_SQL, "string kernel"),
    Query("q17_date_fns", q17_date_fns, Q17_SQL, "date kernel"),
    Query("q18_json_fns", q18_json_fns, Q18_SQL,
          "JSON path extraction on props"),
    Query("q19_array_fns", q19_array_fns, Q19_SQL,
          "array higher-order functions"),
    Query("q20_conditional", q20_conditional, Q20_SQL,
          "CASE/coalesce/nullif/try_cast"),
    Query("q22_pivot", q22_pivot, Q22_SQL, "pivot with explicit values"),
    Query("q30_unpivot", q30_unpivot, Q30_SQL, "unpivot via stack()"),
    Query("q39_math_fns", q39_math_fns, Q39_SQL, "math kernel"),
    Query("q40_full_outer", q40_full_outer, Q40_SQL,
          "FULL OUTER join with coalesced sides"),
    Query("q41_map_fns", q41_map_fns, Q41_SQL,
          "MapType kernel over parsed JSON props"),
    Query("q42_posexplode", q42_posexplode, Q42_SQL,
          "LATERAL posexplode with ordinals"),
    Query("q43_ratio_to_report", q43_ratio_to_report, Q43_SQL,
          "percent-of-total unbounded window"),
    Query("q45_calendar_arithmetic", q45_calendar_arithmetic, Q45_SQL,
          "add_months/last_day/quarter/ISO-week/date_format kernel"),
    Query("q46_string_agg", q46_string_agg, Q46_SQL,
          "ordered string aggregation (LISTAGG twin)"),
]
