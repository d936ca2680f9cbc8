#!/usr/bin/env python
"""Microbenchmark: higher-order-function dot product (aggregate over
zip_with — CodegenFallback, interpreted per element) vs an UNROLLED
fixed-dim sum (plain arithmetic, whole-stage codegen) — the guide §1
"measure first" evidence for the round-13 vector-math rewrite.

Also checks BIT-IDENTITY of the two forms on the real embeddings
fixture: the unrolled left fold starts from the same cast(0 as double)
and adds products in the same index order, so the doubles must be
equal bit-for-bit (not just within rounding).
"""

from __future__ import annotations

import os
import sys
import time

REPO_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_DIR not in sys.path:
    sys.path.insert(0, REPO_DIR)

from pyspark.sql import functions as F  # noqa: E402

from kafka2clickhouse_py_streamer_spark.session import get_spark  # noqa: E402

DIM = 64


def hof_dot(a: str, b: str) -> str:
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> x * y),"
        " cast(0 as double), (acc, x) -> acc + x)"
    )


def unrolled_dot(a: str, b: str, dim: int) -> str:
    terms = "".join(
        f" + element_at({a}, {i + 1}) * element_at({b}, {i + 1})"
        for i in range(dim)
    )
    return f"(cast(0 as double){terms})"


def main() -> None:
    spark = get_spark(app_name="profile-hof-dot")
    spark.sparkContext.setLogLevel("ERROR")
    n = 2_000_000
    # synthetic 64-dim double arrays derived from id (deterministic)
    arr = "transform(sequence(1, 64), i -> cast((id * i) % 97 as double))"
    brr = "transform(sequence(1, 64), i -> cast((id + i) % 89 as double))"
    df = spark.range(n).selectExpr("id", f"{arr} as a", f"{brr} as b")

    def timed(label: str, expr: str) -> float:
        q = df.selectExpr(f"{expr} as d")
        samples = []
        for _ in range(3):
            t0 = time.perf_counter()
            q.selectExpr("sum(d)").collect()
            samples.append(time.perf_counter() - t0)
        med = sorted(samples)[1]
        print(f"{label}: median {med:.3f}s  {samples}")
        return med

    timed("HOF aggregate+zip_with", hof_dot("a", "b"))
    timed("unrolled element_at   ", unrolled_dot("a", "b", DIM))

    # bit-identity on the real fixture
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    emb = emb.filter(
        F.col("embedding").isNotNull() & (F.size("embedding") == DIM)
    ).selectExpr(
        "vec_id",
        "transform(embedding, x -> cast(x as double)) as v",
    )
    diff = emb.selectExpr(
        f"{hof_dot('v', 'v')} as h",
        f"{unrolled_dot('v', 'v', DIM)} as u",
    ).filter("h <> u or (h is null) <> (u is null)")
    bad = diff.count()
    print(f"bit-identity violations on fixture self-dot: {bad}")


if __name__ == "__main__":
    main()
