#!/usr/bin/env python
"""Second-decade scale probe: the near-dup hash families at 100x data.

The sf1 probe (tools/bench_sf1.py, 10x) caught two band-space
quadratics (d04 16-bit in r10, m07 8-bit bands in r11) — each invisible
at the scale below. This tool pushes the HASH-BLOCKED operators one
more decade: 500k documents (100 replicas of sf0.1), where any
remaining occupancy saturation must show in the candidate counts.

Covered: d06 SimHash pairing (64-bit, 4x16-bit bands over DISTINCT
fingerprints), m07/m08 perceptual-hash pairing + CC canonicalization
(same layout), with d01 exact dedup and t01 token count as the linear
baselines. For each, the STRUCTURAL quantities (distinct hashes,
analytic band-candidate pairs, output pairs, CC rounds) are recorded at
sf0.1, 10x, and 100x so wall ratios always have a measured explanation
(the d04-receipt discipline).

Decorrelation: each replica remaps the FULL alphabet (both cases) with
a distinct affine map i -> (a*i + b) mod 26, a coprime to 26 (replica 0
is the identity) — every letter-bearing word changes per replica, so
the amplification adds organic-ish volume, not 100-way near-dup
cliques; within-replica duplicate clusters replicate 100x, which is the
DESIGNED case distinct-hash banding must absorb at output cost (a
doc-level banding would pay clique^2 inside the join). The vowel-only
remap bench_sf1 uses cannot scale past 13 replicas (its target window
repeats); the affine family gives 312 distinct maps.

Writes RECEIPT_SF10.json at the repo root. Bench-only data under
$SF10_DIR (default /tmp/spark_graft_sf10); correctness oracles never
run on this.
"""

from __future__ import annotations

import json
import os
import string
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SRC = "/root/testdata/sf0.1"
SF10_DIR = os.environ.get("SF10_DIR", "/tmp/spark_graft_sf10")
SHIFT = 10_000_000
# multiplicative residues coprime to 26; A[0]=1 so replica 0 with b=0
# is the identity map
_A = [1, 3, 5, 7, 9, 11, 15, 17, 19, 21, 23, 25]


def affine_alphabet(r: int) -> tuple[str, str]:
    """(src, tgt) translate alphabets for replica ``r`` — a distinct
    injective full-alphabet remap per replica, identity at r == 0."""
    a, b = _A[r % len(_A)], r // len(_A)
    lower = string.ascii_lowercase
    tgt = "".join(lower[(a * i + b) % 26] for i in range(26))
    return lower + lower.upper(), tgt + tgt.upper()


def generate(spark, out_dir: str, replicas: int) -> None:
    from pyspark.sql import functions as F

    out = os.path.join(out_dir, "documents.parquet")
    if os.path.exists(out):
        return
    os.makedirs(out_dir, exist_ok=True)
    src = spark.read.parquet(os.path.join(SRC, "documents.parquet"))
    parts = []
    for r in range(replicas):
        s, t = affine_alphabet(r)
        parts.append(
            src.select(
                (F.col("doc_id") + F.lit(r * SHIFT)).alias("doc_id"),
                (
                    F.col("text") if r == 0
                    else F.translate("text", s, t)
                ).alias("text"),
                "lang",
                "source",
                "n_chars",
            )
        )
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    df.repartition(32).write.mode("overwrite").parquet(out)
    print(f"generated {out} ({replicas} replicas)", file=sys.stderr)


def d06_receipt(spark, sf_dir: str) -> dict:
    from pyspark.sql import functions as F

    from kafka2clickhouse_py_streamer_spark.llm.dedup import (
        SIMHASH_BAND_BITS,
        SIMHASH_BANDS,
        d06_simhash_pairs,
        simhash_fp,
    )

    fp = simhash_fp(spark, sf_dir)
    n_docs = fp.count()
    hu = fp.select("simhash_hi", "simhash_lo").distinct()
    n_distinct = hu.count()
    half_bands = SIMHASH_BANDS // 2

    def band_val(j):
        # hi-first — same labeling as the production
        # banded_hamming_pairs(['simhash_hi', 'simhash_lo']) join
        word = (
            F.col("simhash_hi") if j < half_bands else F.col("simhash_lo")
        )
        return F.shiftright(
            word, (j % half_bands) * SIMHASH_BAND_BITS
        ).bitwiseAND((1 << SIMHASH_BAND_BITS) - 1)

    banded = hu.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("band_id"),
                        band_val(j).alias("band_val"),
                    )
                    for j in range(SIMHASH_BANDS)
                ]
            )
        ).alias("b")
    ).select("b.band_id", "b.band_val")
    band_pairs = int(
        banded.groupBy("band_id", "band_val")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.sum(F.col("n") * (F.col("n") - 1) / 2).alias("p"))
        .collect()[0]["p"]
    )
    t0 = time.perf_counter()
    n_pairs = d06_simhash_pairs(spark, sf_dir).count()
    wall = round(time.perf_counter() - t0, 3)
    return {
        "n_docs": n_docs,
        "n_distinct_fp": n_distinct,
        "band_candidate_fp_pairs": band_pairs,
        "doc_pairs": n_pairs,
        "d06_wall_sec": wall,
    }


def m07_receipt(spark, sf_dir: str) -> dict:
    from pyspark.sql import functions as F

    from kafka2clickhouse_py_streamer_spark.functions.graph import (
        connected_components,
    )
    from kafka2clickhouse_py_streamer_spark.llm.dedup import (
        DEDUP_CC_MAX_ITERS,
    )
    from kafka2clickhouse_py_streamer_spark.llm.multimodal import (
        m07_phash_neardup,
        phash_banded,
        phash_hashes,
    )

    hashed = phash_hashes(spark, sf_dir)
    n_distinct = hashed.select("ph_hi", "ph_lo").distinct().count()
    band_pairs = int(
        phash_banded(hashed)
        .groupBy("band_id", "band_val")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.sum(F.col("n") * (F.col("n") - 1) / 2).alias("p"))
        .collect()[0]["p"]
    )
    t0 = time.perf_counter()
    pairs = m07_phash_neardup(spark, sf_dir)
    n_pairs = pairs.count()
    m07_wall = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    _labels, rounds = connected_components(
        pairs.select(
            F.col("doc_a").alias("u"), F.col("doc_b").alias("v")
        ),
        max_iters=DEDUP_CC_MAX_ITERS,
    )
    cc_wall = round(time.perf_counter() - t0, 3)
    return {
        "n_distinct_ph": n_distinct,
        "band_candidate_hash_pairs": band_pairs,
        "doc_pairs": n_pairs,
        "cc_rounds": rounds,
        "m07_wall_sec": m07_wall,
        "cc_wall_sec": cc_wall,
    }


def d06_wide_receipt(spark, sf_dir: str) -> dict:
    """The 4-word (128-bit) hamming knob run END-TO-END at scale
    (round-11 verdict order 3): the knob is test-pinned on crafted
    hashes, but had never hashed a real corpus. A 128-bit SimHash —
    the full 32 md5 hex chars per token as FOUR 32-bit words, 128
    majority votes — goes through the SAME shared
    ``banded_hamming_pairs`` core at 4 bands x 32 bits (band space
    2^32: occupancy stays < 1 into the billions of distinct
    fingerprints; this is what a deployment switches to when 16-bit
    bands saturate past ~65k distinct). Records distinct-fingerprint
    count, analytic band-candidate pairs, per-band occupancy, and the
    wall next to the production 2-word run."""
    from pyspark.sql import functions as F

    from kafka2clickhouse_py_streamer_spark.functions.hamming_lsh import (
        banded_hamming_pairs,
    )
    from kafka2clickhouse_py_streamer_spark.llm.dedup import (
        simhash_fp_words,
    )

    WORDS = 4
    t0 = time.perf_counter()
    fp = simhash_fp_words(spark, sf_dir, WORDS).localCheckpoint()
    word_cols = [f"w{w}" for w in range(WORDS)]
    hu = fp.select(*word_cols).distinct()
    n_distinct = hu.count()
    # 4 bands x 1 band/word: band_val IS the word (band_bits = 32)
    occ = (
        hu.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(w).alias("band_id"),
                            F.col(f"w{w}").alias("band_val"),
                        )
                        for w in range(WORDS)
                    ]
                )
            ).alias("b")
        )
        .select("b.band_id", "b.band_val")
        .groupBy("band_id", "band_val")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    stats = occ.groupBy("band_id").agg(
        F.max("n").alias("max_n"),
        (F.sum(F.col("n") * (F.col("n") - 1) / 2)).alias("pairs"),
    ).collect()
    band_pairs = int(sum(r["pairs"] for r in stats))
    max_bucket = int(max(r["max_n"] for r in stats))
    n_pairs = banded_hamming_pairs(fp, word_cols, WORDS, 3).count()
    wall = round(time.perf_counter() - t0, 3)
    return {
        "n_distinct_fp128": n_distinct,
        "band_candidate_fp_pairs": band_pairs,
        # MEAN occupancy is the linearity lever (n/2^32 per band value,
        # << 1 into the billions); max_band_bucket witnesses the skew
        # correlated SimHash words produce (hot 32-bit word values from
        # similar docs) — candidates_per_fp staying O(1) across scales
        # is the claim that matters
        "mean_band_occupancy": round(n_distinct / 2.0**32, 9),
        "max_band_bucket": max_bucket,
        "candidates_per_fp": round(band_pairs / max(n_distinct, 1), 3),
        "doc_pairs": n_pairs,
        "wall_sec": wall,
    }


def generate_embeddings(spark, out_dir: str, replicas: int) -> None:
    """100x embeddings: vec_id shifted, elements jittered by a
    deterministic sin(vec_id, dim) term per replica (bench_sf1's
    decorrelation, generalized to any replica count) so LSH buckets
    don't collapse into replica-degenerate cells."""
    from pyspark.sql import functions as F

    out = os.path.join(out_dir, "embeddings.parquet")
    if os.path.exists(out):
        return
    os.makedirs(out_dir, exist_ok=True)
    src = spark.read.parquet(os.path.join(SRC, "embeddings.parquet"))
    def make_jitter(r: int):
        def jit(x, i):
            return (
                x
                + F.sin(
                    (F.col("vec_id") + F.lit(r * SHIFT)).cast("double")
                    * (i.cast("double") + F.lit(1.0))
                    * F.lit(0.618)
                )
                * F.lit(0.05)
            ).cast("float")

        return jit

    parts = []
    for r in range(replicas):
        jitter = F.transform("embedding", make_jitter(r))
        parts.append(
            src.select(
                (F.col("vec_id") + F.lit(r * SHIFT)).alias("vec_id"),
                jitter.alias("embedding"),
                "label",
            )
        )
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    df.repartition(32).write.mode("overwrite").parquet(out)
    print(f"generated {out} ({replicas} replicas)", file=sys.stderr)


def s09_receipt(spark, sf_dir: str) -> dict:
    """The fixed-plane LSH trap at this corpus size, quantified: the
    bucket self-join pays sum |bucket|^2 ~ N^2/2^planes, so the
    ANALYTIC candidate count is recorded for a ladder of plane counts
    (cheap occupancy aggregate — no join runs), and the kNN graph
    itself is built once at the SCALE-DERIVED count — round 12: the
    plane count is no longer a hand-picked per-scale constant but
    ``planes_for(n)``, the same derivation the production s09 default
    runs; the receipt records the derived value next to the fixed-7
    trap it replaces."""
    import time as _t

    from pyspark.sql import functions as F

    from kafka2clickhouse_py_streamer_spark.llm.similarity import (
        _base,
        _bucket_expr,
        derived_planes,
        s09_knn_graph,
    )

    base = _base(spark, sf_dir)
    n_vecs = base.count()
    # derived_planes (RAW-count based), not planes_for(n_vecs): the
    # timed s09_knn_graph call below derives from the raw embeddings
    # count internally, and at a TARGET_OCCUPANCY boundary
    # planes_for(filtered) could differ from the count the timed run
    # actually used (round-12 ADVICE)
    derived = derived_planes(spark, sf_dir)
    pairs_at = {}
    for planes in sorted({7, 10, 14, 17, derived}):
        pairs_at[f"planes{planes}"] = int(
            base.withColumn("bucket", _bucket_expr(planes))
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("n"))
            .agg(F.sum(F.col("n") * (F.col("n") - 1)).alias("p"))
            .collect()[0]["p"]
        )
    t0 = _t.perf_counter()
    # n_planes omitted: the production default derives the same count
    n_edges = s09_knn_graph(spark, sf_dir).count()
    wall = round(_t.perf_counter() - t0, 3)
    return {
        "n_vectors": n_vecs,
        "bucket_candidate_pairs": pairs_at,
        "run_planes": derived,
        "planes_derived_in_code": True,
        "n_edges": n_edges,
        "s09_wall_sec": wall,
    }


def baselines(spark, sf_dir: str) -> dict:
    from kafka2clickhouse_py_streamer_spark.operators.base import (
        all_queries,
    )

    out = {}
    reg = all_queries()
    for name in ("d01_exact_dedup", "t01_token_count"):
        t0 = time.perf_counter()
        reg[name].fn(spark, sf_dir).count()
        out[f"{name}_wall_sec"] = round(time.perf_counter() - t0, 3)
    return out


def main() -> None:
    from kafka2clickhouse_py_streamer_spark.session import get_spark

    spark = get_spark(app_name="receipt-sf10")
    spark.sparkContext.setLogLevel("ERROR")
    ten = os.path.join(SF10_DIR, "x10")
    hundred = os.path.join(SF10_DIR, "x100")
    generate(spark, ten, 10)
    generate(spark, hundred, 100)
    generate_embeddings(spark, ten, 10)
    generate_embeddings(spark, hundred, 100)
    # the non-document tables aren't read by these operators; point
    # the dirs at documents only
    out: dict = {"metric": "second_decade_scale_receipts"}
    scales = [("sf0.1", SRC, 1), ("x10", ten, 10), ("x100", hundred, 100)]
    fns = {
        "d06": d06_receipt,
        "d06_wide": d06_wide_receipt,
        "m07": m07_receipt,
        "s09": s09_receipt,
        "baselines": baselines,
    }
    for fam, fn in fns.items():
        fam_out = {}
        for label, d, _mult in scales:
            fam_out[label] = fn(spark, d)
            spark.catalog.clearCache()
            print(f"{fam}@{label}: {json.dumps(fam_out[label])}",
                  file=sys.stderr)
        keys = [
            k for k, v in fam_out["sf0.1"].items()
            if isinstance(v, (int, float)) and not isinstance(v, bool)
        ]
        fam_out["ratio_x100_vs_base"] = {
            k: (
                round(fam_out["x100"][k] / fam_out["sf0.1"][k], 2)
                if fam_out["sf0.1"][k] else None
            )
            for k in keys
        }
        out[fam] = fam_out
    with open(os.path.join(REPO, "RECEIPT_SF10.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
