#!/usr/bin/env python
"""Structural scale receipts for the three super-linear sf1 tails
(VERDICT r10 tasks 2-3): m08 3.7x, s24 3.54x, s22 2.25x at 10x data.

The d04 lesson: a wall-clock ratio alone cannot distinguish "fixed
costs amortizing" from "a pair graph quietly going quadratic" — d21's
74.9x blowup hid behind exactly such an unreceipted ratio until the
pair COUNTS were recorded (3.4M -> 83k after the 32-bit fix). This
tool records the structural quantities behind each heavy-tail query at
sf0.1 AND sf1 (the deterministic amplification under $SF1_DIR, built
by tools/bench_sf1.py), so every super-linear wall ratio has a
measured explanation:

- m07/m08: distinct perceptual hashes, band-candidate hash pairs
  (sum of C(occupancy, 2) over the 4x8-bit band layout — the band
  join's output), verified doc pairs (= the CC edge count), and CC
  round count. Linear pair growth = the 3.7x is CC fixed costs;
  super-linear = re-band (the d04 playbook).
- s24: |E|, sum out-deg^2 of the degree-ordered orientation (the
  wedge-join cost the O(E^1.5) bound governs), sum deg^2 (the naive
  cost it avoids), and the triangle total.
- s22: |E|, seed count, per-run reached rows (output), hop count.

Writes RECEIPT_GRAPHS.json at the repo root and prints it.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF1_DIR = os.environ.get("SF1_DIR", "/tmp/spark_graft_sf1")
SRC = "/root/testdata/sf0.1"


def m07_m08_receipt(spark, sf_dir: str) -> dict:
    from pyspark.sql import functions as F

    from kafka2clickhouse_py_streamer_spark.functions.graph import (
        connected_components,
    )
    from kafka2clickhouse_py_streamer_spark.llm.dedup import (
        DEDUP_CC_MAX_ITERS,
    )
    from kafka2clickhouse_py_streamer_spark.llm.multimodal import (
        m07_phash_neardup,
        m08_media_canonical,
        phash_banded,
        phash_hashes,
    )

    hashed = phash_hashes(spark, sf_dir)
    n_media = hashed.count()
    n_distinct_ph = (
        hashed.select("ph_hi", "ph_lo").distinct().count()
    )
    # the band join's candidate output, computed analytically from
    # occupancy (sum over band cells of C(n, 2)) — same quantity the
    # s09 plane-scaling probe records
    band_pairs = int(
        phash_banded(hashed)
        .groupBy("band_id", "band_val")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(
            F.sum(F.col("n") * (F.col("n") - 1) / 2).alias("p")
        )
        .collect()[0]["p"]
    )
    t0 = time.perf_counter()
    pairs = m07_phash_neardup(spark, sf_dir)
    n_doc_pairs = pairs.count()
    m07_wall = round(time.perf_counter() - t0, 3)
    edges = pairs.select(
        F.col("doc_a").alias("u"), F.col("doc_b").alias("v")
    )
    t0 = time.perf_counter()
    _labels, rounds = connected_components(
        edges, max_iters=DEDUP_CC_MAX_ITERS
    )
    cc_wall = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    n_clusters = m08_media_canonical(spark, sf_dir).count()
    m08_wall = round(time.perf_counter() - t0, 3)
    return {
        "n_media": n_media,
        "n_distinct_ph": n_distinct_ph,
        "band_candidate_hash_pairs": band_pairs,
        "doc_pairs": n_doc_pairs,
        "cc_rounds": rounds,
        "n_clusters": n_clusters,
        "m07_wall_sec": m07_wall,
        "cc_wall_sec": cc_wall,
        "m08_wall_sec": m08_wall,
    }


def s24_receipt(spark, sf_dir: str) -> dict:
    from pyspark.sql import functions as F

    from kafka2clickhouse_py_streamer_spark.llm.similarity import (
        s09_knn_graph,
        s24_triangle_count,
    )

    g = s09_knn_graph(spark, sf_dir)
    edges = g.select(
        F.least("src_id", "nbr_id").alias("u"),
        F.greatest("src_id", "nbr_id").alias("w"),
    ).distinct()
    n_edges = edges.count()
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("w").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
    )
    sum_deg2 = int(
        deg.agg(F.sum(F.col("deg") * F.col("deg")).alias("s"))
        .collect()[0]["s"]
    )
    # the oriented out-degrees: same orientation rule as
    # triangle_stats (from the (deg, id)-smaller endpoint)
    e = edges.join(
        deg.select(F.col("node").alias("u"), F.col("deg").alias("du")),
        "u",
    ).join(
        deg.select(F.col("node").alias("w"), F.col("deg").alias("dw")),
        "w",
    )
    fwd = F.col("du") <= F.col("dw")
    out_deg = (
        e.select(F.when(fwd, F.col("u")).otherwise(F.col("w")).alias("lo"))
        .groupBy("lo")
        .agg(F.count(F.lit(1)).cast("long").alias("od"))
    )
    sum_outdeg2 = int(
        out_deg.agg(F.sum(F.col("od") * F.col("od")).alias("s"))
        .collect()[0]["s"]
    )
    max_outdeg = int(
        out_deg.agg(F.max("od").alias("m")).collect()[0]["m"]
    )
    t0 = time.perf_counter()
    stats = s24_triangle_count(spark, sf_dir)
    n_nodes = stats.count()
    wall = round(time.perf_counter() - t0, 3)
    n_triangles = int(
        stats.agg((F.sum("n_tri") / 3).cast("long").alias("t"))
        .collect()[0]["t"]
    )
    return {
        "n_nodes": n_nodes,
        "n_edges": n_edges,
        "sum_deg2_naive_wedges": sum_deg2,
        "sum_outdeg2_oriented_wedges": sum_outdeg2,
        "max_outdeg": max_outdeg,
        "e_pow_1_5": int(n_edges ** 1.5),
        "n_triangles": n_triangles,
        "s24_wall_sec": wall,
    }


def s22_receipt(spark, sf_dir: str) -> dict:
    from pyspark.sql import functions as F

    from kafka2clickhouse_py_streamer_spark.llm.similarity import (
        S22_MAX_HOPS,
        S22_SEED_MOD,
        _base,
        s09_knn_graph,
        s22_khop_expansion,
    )

    n_edges = s09_knn_graph(spark, sf_dir).count()
    n_seeds = (
        _base(spark, sf_dir)
        .filter(F.col("vec_id") % S22_SEED_MOD == 0)
        .count()
    )
    t0 = time.perf_counter()
    reached = s22_khop_expansion(spark, sf_dir)
    n_reached = reached.count()
    wall = round(time.perf_counter() - t0, 3)
    return {
        "n_edges": n_edges,
        "n_seeds": n_seeds,
        "max_hops": S22_MAX_HOPS,
        "n_reached_rows": n_reached,
        "s22_wall_sec": wall,
    }


def d17_receipt(spark, sf_dir: str) -> dict:
    """The capped inverted-index join's structural quantities: shingle
    rows, rows surviving the MAX_SHINGLE_DF semi-join, the pair-row
    volume the equi-join emits (sum over admitted shingles of
    C(df, 2) — the quantity the DF cap exists to bound), and the
    distinct candidate pairs the count-aggregate reduces them to."""
    from pyspark.sql import functions as F

    from kafka2clickhouse_py_streamer_spark.llm.dedup import (
        MAX_SHINGLE_DF,
        _shingle_rows,
        d17_containment_pairs,
    )

    sh = _shingle_rows(spark, sf_dir)
    n_rows = sh.count()
    dfs = sh.groupBy("s").agg(F.count(F.lit(1)).alias("df"))
    admitted = dfs.filter(F.col("df") <= MAX_SHINGLE_DF)
    n_admitted_rows = int(
        admitted.agg(F.sum("df").alias("n")).collect()[0]["n"]
    )
    pair_rows = int(
        admitted.agg(
            F.sum(F.col("df") * (F.col("df") - 1) / 2).alias("p")
        ).collect()[0]["p"]
    )
    uncapped_pair_rows = int(
        dfs.agg(
            F.sum(F.col("df") * (F.col("df") - 1) / 2).alias("p")
        ).collect()[0]["p"]
    )
    t0 = time.perf_counter()
    n_out = d17_containment_pairs(spark, sf_dir).count()
    wall = round(time.perf_counter() - t0, 3)
    return {
        "shingle_rows": n_rows,
        "admitted_shingle_rows": n_admitted_rows,
        "join_pair_rows": pair_rows,
        "uncapped_join_pair_rows": uncapped_pair_rows,
        "output_pairs": n_out,
        "d17_wall_sec": wall,
    }


def main() -> None:
    from kafka2clickhouse_py_streamer_spark.session import get_spark

    if not os.path.isdir(SF1_DIR):
        raise SystemExit(
            f"{SF1_DIR} missing — run tools/bench_sf1.py first"
        )
    spark = get_spark(app_name="receipt-graphs")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"metric": "graph_scale_receipts", "data_ratio": 10}
    for fam, fn in (
        ("m07_m08", m07_m08_receipt),
        ("s24", s24_receipt),
        ("s22", s22_receipt),
        ("d17", d17_receipt),
    ):
        a = fn(spark, SRC)
        spark.catalog.clearCache()
        b = fn(spark, SF1_DIR)
        spark.catalog.clearCache()
        ratios = {
            k: (round(b[k] / a[k], 2) if a[k] else None)
            for k in a
            if isinstance(a[k], (int, float))
        }
        out[fam] = {"sf0.1": a, "sf1": b, "ratio": ratios}
        print(f"{fam}: {json.dumps(out[fam]['ratio'])}", file=sys.stderr)
    with open(os.path.join(REPO, "RECEIPT_GRAPHS.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
