"""Salted-join correctness: result must equal the plain join exactly,
with the key's rows spread across salt sub-partitions."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka2clickhouse_py_streamer_spark.functions.skew import (
    SALT_COL,
    explode_small_side,
    salt_large_side,
    salted_join,
)
from kafka2clickhouse_py_streamer_spark.operators.base import table


def test_salted_join_matches_plain_join(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_extendedprice"
    )
    p = table(spark, sf_dir, "part").select("p_partkey", "p_brand")

    plain = (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_extendedprice"), 2).alias("rev"),
        )
    )
    salted = (
        salted_join(li, p, li.l_partkey == p.p_partkey, salt_n=4)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_extendedprice"), 2).alias("rev"),
        )
    )
    a = {r.p_brand: (r.n, r.rev) for r in plain.collect()}
    b = {r.p_brand: (r.n, r.rev) for r in salted.collect()}
    assert a == b


def test_salt_spreads_hot_key(spark):
    # one hot key repeated 1000×: salts must spread it over all buckets
    hot = spark.range(1000).select(
        F.lit(42).alias("k"), F.col("id").alias("row_id")
    )
    salted = salt_large_side(hot, ["k", "row_id"], 8)
    n_buckets = salted.select(SALT_COL).distinct().count()
    assert n_buckets == 8


def test_salt_is_deterministic(spark):
    df = spark.range(100).select(F.col("id").alias("k"))
    s1 = {r.k: r[SALT_COL] for r in salt_large_side(df, ["k"], 8).collect()}
    s2 = {r.k: r[SALT_COL] for r in salt_large_side(df, ["k"], 8).collect()}
    assert s1 == s2  # replay-stable under retries


def test_small_side_replication(spark):
    df = spark.range(5)
    assert explode_small_side(df, 4).count() == 20
