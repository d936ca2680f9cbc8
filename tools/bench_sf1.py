#!/usr/bin/env python
"""One-off sf1 scale probe (VERDICT r03 next-round #8).

The driver fixtures stop at sf0.1; this script synthesizes a
DETERMINISTIC 10x amplification of sf0.1 under ``$SF1_DIR`` (default
``/tmp/spark_graft_sf1``) and times the heaviest queries at
both scales in one session, writing ``BENCH_sf1.json`` at the repo
root. The point is the SCALING RATIO per query (ideal = ~10x on linear
operators), not the absolute numbers — a super-linear surprise in d03
banding or p07's composition shows up as ratio >> 10.

Amplification is replication with decorrelation, all JVM expressions:

- documents: 10 replicas; doc_id shifted by replica * 10^7; text
  vowel-rotated per replica (every shingle changes, so dedup operators
  see 10x organic-ish volume, NOT 10-way exact/near duplicate clusters
  that would quadratically distort candidate-pair counts — a separate
  failure mode, and d11's DF cap covers it);
- embeddings: vec_id shifted; each vector element jittered by a
  deterministic sin(vec_id, dim, replica) term so LSH buckets don't
  collapse into 10x-degenerate cells;
- lineitem/orders/customer: keys shifted consistently so q03's joins
  keep their selectivity; measures/dates unchanged;
- region/nation/supplier/part/events: copied as-is (dimension tables —
  q03 doesn't scale with them).

This is bench-only data: correctness oracles always run on the
read-only driver fixtures, never on this.
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
REPLICAS = 10
SHIFT = 10_000_000
HEAVY = [
    "q03_top_orders",
    "d03_minhash_lsh",
    "s03_lsh_topk",
    "p04_global_shuffle",
    "p07_corpus_pipeline",
    # round-4 explode-heavy additions: span grouping, LSH admission,
    # word-level diversity — the three new operators whose row growth
    # (spans/bands/words per doc) could hide super-linear behavior
    "d12_span_dedup",
    "d14_lsh_admission",
    "t12_lexical_diversity",
    # session additions: the bucket-occupancy² pair join (same trap the
    # plane-count knob governs), the per-source vocab rank window, and
    # the global weight-line offsets — the three new shapes that could
    # go super-linear
    "d15_semdedup",
    "t13_zipf_fit",
    "p13_pps_sample",
    # PQ pair: 32x bounded explode (s12) and the coded-corpus ADC
    # stream (s13) — both must stay linear in the corpus
    "s12_product_quantize",
    "s13_pq_adc_topk",
    # round 5: the composed span-dedup pipeline — the scrub's token +
    # span explodes feeding the packing offsets in one DAG
    "p14_span_scrub_pipeline",
    # round 5 late: the containment pair join (d02's quadratic-risk
    # shape with a second emission direction), the IVF-PQ probe path,
    # and the BM25 inverted-list probe
    "d17_containment_pairs",
    "s14_ivfpq_search",
    "t16_bm25_topk",
    # round 6: chunk explode -> per-shard window packing, media-pair
    # graph contraction, and the token-explode + per-source-window
    # Heaps fit — the three new shapes whose row growth could hide
    # super-linear behavior
    "p17_chunk_pack",
    "m08_media_canonical",
    "t19_heaps_fit",
    # round 6 late: the cascade's broadcast prefix scan + shortlist
    # rerank (must track corpus size, never corpus x queries beyond
    # stage 1), and the soft-dedup policy layer over the CC labels
    "s19_cascade_rerank",
    "d21_softdedup_weights",
    # the both-sides-large shingle equi-join (train set vs eval set) —
    # the one new shape whose hot keys the DF cap must keep bounded
    "p21_split_leakage",
    # round 6 post-freeze: the unrolled BFS over the s09 graph (pays
    # the bucket self-join 1x plus per-hop frontier joins) and the
    # token-explode + per-doc-window keyword extraction — the two new
    # shapes with row growth; w15/q65 are grid-bounded hash aggs
    "s22_khop_expansion",
    "t21_tfidf_keywords",
    # round 6 late: the norm-pruned MIPS scan (admitted-set size is
    # the scale variable — the bound filter must keep the dot count
    # sub-corpus as the corpus grows) and the double two-pass-offset
    # padding audit (two global orderings over the token-counted scan)
    "s23_mips_norm_pruned",
    "p22_padding_waste",
    # second post-freeze batch: the LSH-candidate Levenshtein verify
    # (pair-join shape whose DP cost rides the candidate count) and
    # the degree-oriented wedge join (row growth = sum out-deg^2 —
    # the quantity orientation is supposed to bound)
    "d24_editdist_neardup",
    "s24_triangle_count",
    # the windowed pair explode (<= W rows per token) feeding two
    # vocab aggs — the row-growth shape of the PMI collocations
    "t23_pmi_collocations",
]
VOWELS = "aeiou"


def amplify_docs(src, r: int):
    """Replica ``r`` of the documents table: doc_id shifted, text
    under a per-replica INJECTIVE remap of all five vowels (distinct
    target letters via a stride-3 window at offset 2r; replica 0 is
    the identity). The previous two-letter rotation (translate 'ae'
    only) left every a/e-free WORD identical across replicas, so
    word-feature operators (d06 SimHash) saw 10-way cross-replica
    near-dup cliques — measured r10: 59M of 89M sf1 pairs were
    cross-replica, the exact quadratic distortion this decorrelation
    exists to prevent. With all vowels remapped, only wholly
    vowel-less words survive across replicas; shingle- and word-level
    features both decorrelate.

    Module-level (not nested in generate) so the fixture guard
    (tests/test_fixtures.py) can re-run the remap on a mini
    amplification and pin the cross-replica pair count — a future
    generator edit must not silently reinflate the sf1 pair graph
    every ratio in SCALE.md depends on."""
    from pyspark.sql import functions as F

    tgt = "".join(
        chr(ord("a") + (2 * r + 3 * i) % 26) for i in range(5)
    )
    return src.select(
        (F.col("doc_id") + F.lit(r * SHIFT)).alias("doc_id"),
        (
            F.col("text") if r == 0
            else F.translate("text", VOWELS, tgt)
        ).alias("text"),
        "lang",
        "source",
        "n_chars",
    )


def generate(spark) -> None:
    from pyspark.sql import functions as F

    os.makedirs(SF1_DIR, exist_ok=True)

    def replicate(name, build):
        out = os.path.join(SF1_DIR, f"{name}.parquet")
        if os.path.exists(out):
            return
        src = spark.read.parquet(os.path.join(SRC, f"{name}.parquet"))
        parts = [build(src, r) for r in range(REPLICAS)]
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        df.repartition(32).write.mode("overwrite").parquet(out)
        print(f"generated {name}", file=sys.stderr)

    docs = amplify_docs

    def embs(src, r):
        jitter = F.transform(
            "embedding",
            lambda x, i: (
                x
                + F.sin(
                    (F.col("vec_id") + F.lit(r * SHIFT)).cast("double")
                    * (i.cast("double") + F.lit(1.0))
                    * F.lit(0.618)
                )
                * F.lit(0.05)
            ).cast("float"),
        )
        return src.select(
            (F.col("vec_id") + F.lit(r * SHIFT)).alias("vec_id"),
            jitter.alias("embedding"),
            "label",
        )

    def lineitem(src, r):
        return src.withColumn(
            "l_orderkey", F.col("l_orderkey") + F.lit(r * SHIFT)
        ).withColumn("l_partkey", F.col("l_partkey") + F.lit(r * SHIFT))

    def orders(src, r):
        return src.withColumn(
            "o_orderkey", F.col("o_orderkey") + F.lit(r * SHIFT)
        ).withColumn("o_custkey", F.col("o_custkey") + F.lit(r * SHIFT))

    def customer(src, r):
        return src.withColumn(
            "c_custkey", F.col("c_custkey") + F.lit(r * SHIFT)
        )

    replicate("documents", docs)
    replicate("embeddings", embs)
    replicate("lineitem", lineitem)
    replicate("orders", orders)
    replicate("customer", customer)
    for name in ("region", "nation", "supplier", "part", "events"):
        out = os.path.join(SF1_DIR, f"{name}.parquet")
        if not os.path.exists(out):
            spark.read.parquet(os.path.join(SRC, f"{name}.parquet")).write.mode(
                "overwrite"
            ).parquet(out)


def time_queries(registry, spark, sf_dir, reps=3):
    times = {}
    for name in HEAVY:
        registry[name].fn(spark, sf_dir).count()  # warm plan + JIT
        # the warm pass's persisted offsets frames must not stay live
        # into the timed reps (same cross-query memory-pressure bleed
        # bench.py fixed after r07's inflated p14)
        spark.catalog.clearCache()
        samples = []
        for _ in range(reps):
            # Identical re-invocations share CacheManager entries (the
            # two-pass offsets' DISK_ONLY persist is keyed by logical
            # plan), so without this, reps 2+ of the offsets consumers
            # read the rep-1 materialization and the probe measures
            # cache-read scaling, not pipeline scaling (p07's sf1 wall
            # dropped 5.0 -> 1.1 s before this line).
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            registry[name].fn(spark, sf_dir).count()
            samples.append(time.perf_counter() - t0)
        spark.catalog.clearCache()  # don't bleed into the next query
        times[name] = round(sorted(samples)[reps // 2], 3)
    return times


def s09_plane_scaling(spark) -> dict:
    """The LSH occupancy experiment: s09's bucket self-join pays
    Σ|bucket|² ≈ N²/2^planes, so a FIXED plane count turns 10× data
    into ~100× candidate pairs. Measure s09 at sf0.1 (7 planes), sf1
    (same 7 planes — the trap), and sf1 with planes raised to restore
    per-bucket occupancy (the knob a deployment turns). Pair counts
    are the structural signal; wall time at this scale is dominated by
    per-row bucket hashing on underutilized cores."""
    from kafka2clickhouse_py_streamer_spark.llm.similarity import (
        s09_knn_graph,
    )

    from pyspark.sql import functions as F

    from kafka2clickhouse_py_streamer_spark.llm.similarity import (
        _base,
        _bucket_expr,
    )

    def pairs(sf_dir, planes):
        # Σ |bucket|·(|bucket|-1): the candidate count the self-join
        # generates — the STRUCTURAL quantity (wall time at this local
        # scale is dominated by the per-row bucket hashing, so the
        # quadratic term only shows in the pair count)
        occ = (
            _base(spark, sf_dir)
            .withColumn("bucket", _bucket_expr(planes))
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("n"))
            .agg(F.sum(F.col("n") * (F.col("n") - 1)).alias("pairs"))
            .collect()[0]["pairs"]
        )
        return int(occ)

    def t(sf_dir, planes):
        s09_knn_graph(spark, sf_dir, n_planes=planes).count()  # warm
        t0 = time.perf_counter()
        s09_knn_graph(spark, sf_dir, n_planes=planes).count()
        return round(time.perf_counter() - t0, 3)

    base, base_p = t(SRC, 7), pairs(SRC, 7)
    fixed, fixed_p = t(SF1_DIR, 7), pairs(SF1_DIR, 7)
    scaled, scaled_p = t(SF1_DIR, 10), pairs(SF1_DIR, 10)
    return {
        "sf0.1_planes7": base,
        "sf1_planes7_fixed_buckets": fixed,
        "sf1_planes10_occupancy_restored": scaled,
        "fixed_ratio": round(fixed / base, 2),
        "scaled_ratio": round(scaled / base, 2),
        "pairs_sf0.1_planes7": base_p,
        "pairs_sf1_planes7": fixed_p,
        "pairs_sf1_planes10": scaled_p,
        "pairs_fixed_ratio": round(fixed_p / base_p, 1),
        "pairs_scaled_ratio": round(scaled_p / base_p, 1),
    }


def stage_breakdown(spark) -> dict:
    """Per-stage wall time for the two worst sub-linear-but-rising
    probe ratios (round-5 verdict item 7: p07 2.86x, t16 2.98x at 10x
    data) — names WHICH stage grows before deciding whether anything
    needs changing. Each stage is a sub-DAG prefix of the real query,
    timed at both scales with one warm pass."""
    from pyspark.sql import functions as F

    from kafka2clickhouse_py_streamer_spark.functions import tokens_expr
    from kafka2clickhouse_py_streamer_spark.llm.dedup import (
        CONTAM_FLAG,
        _shingle_rows,
    )
    from kafka2clickhouse_py_streamer_spark.llm.sampling import (
        _quality_deduped,
    )
    from kafka2clickhouse_py_streamer_spark.llm.text import BM25_QUERY
    from kafka2clickhouse_py_streamer_spark.operators.base import table

    def timed(build):
        build().count()  # warm
        t0 = time.perf_counter()
        build().count()
        return round(time.perf_counter() - t0, 3)

    def p07_quality_dedup(sf_dir):
        d = table(spark, sf_dir, "documents")
        return _quality_deduped(d).filter(F.col("source") != "src0")

    def p07_decontam_probe(sf_dir):
        sh = _shingle_rows(spark, sf_dir)
        bench = sh.filter(F.col("source") == "src0").select(
            F.col("doc_id").alias("bench_id"), "s"
        )
        corpus_sh = sh.filter(F.col("source") != "src0").select(
            "doc_id", "s"
        )
        sizes = corpus_sh.groupBy("doc_id").agg(
            F.count(F.lit(1)).alias("n")
        )
        return (
            corpus_sh.join(F.broadcast(bench), "s")
            .groupBy("doc_id", "bench_id")
            .agg(F.count(F.lit(1)).alias("n_common"))
            .join(sizes, "doc_id")
            .filter(F.col("n_common") / F.col("n") >= CONTAM_FLAG)
            .select("doc_id")
        )

    def t16_dl(sf_dir):
        d = table(spark, sf_dir, "documents")
        nonempty = f"filter({tokens_expr('text')}, x -> length(x) > 0)"
        return d.select(
            "doc_id", F.expr(f"size({nonempty})").cast("long").alias("dl")
        ).filter(F.col("dl") > 0)

    def t16_tf(sf_dir):
        d = table(spark, sf_dir, "documents")
        terms_in = ", ".join(f"'{t}'" for t in BM25_QUERY)
        return (
            d.select(
                "doc_id",
                F.explode(
                    F.expr(
                        f"filter({tokens_expr('text')},"
                        f" x -> x IN ({terms_in}))"
                    )
                ).alias("tok"),
            )
            .groupBy("doc_id", "tok")
            .agg(F.count(F.lit(1)).cast("double").alias("tf"))
        )

    stages = {
        "p07_quality_dedup": p07_quality_dedup,
        "p07_decontam_probe": p07_decontam_probe,
        "t16_doc_lengths": t16_dl,
        "t16_tf_probe": t16_tf,
    }
    out: dict = {}
    for name, build in stages.items():
        a = timed(lambda: build(SRC))
        b = timed(lambda: build(SF1_DIR))
        out[name] = {
            "sf0.1": a,
            "sf1": b,
            "ratio": round(b / a, 2) if a else None,
        }
    return out


def main() -> None:
    from kafka2clickhouse_py_streamer_spark.operators.base import all_queries
    from kafka2clickhouse_py_streamer_spark.session import get_spark

    spark = get_spark(app_name="bench-sf1")
    spark.sparkContext.setLogLevel("ERROR")
    generate(spark)
    registry = all_queries()
    t_sf01 = time_queries(registry, spark, SRC)
    t_sf1 = time_queries(registry, spark, SF1_DIR)
    ratios = {
        k: round(t_sf1[k] / t_sf01[k], 2) if t_sf01[k] else None
        for k in HEAVY
    }
    out = {
        "metric": "heavy_sf1_scale_probe",
        "unit": "sec",
        "data_ratio": REPLICAS,
        "sf0.1": t_sf01,
        "sf1": t_sf1,
        "scaling_ratio": ratios,
        "s09_plane_scaling": s09_plane_scaling(spark),
        "stage_breakdown": stage_breakdown(spark),
        "value": round(sum(t_sf1.values()), 3),
    }
    with open(os.path.join(REPO, "BENCH_sf1.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
