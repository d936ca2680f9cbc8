#!/usr/bin/env python
"""Benchmark harness (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line::

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced to full materialization with a count-style action
(write to nothing would skip result construction; ``collect`` on big
results would bottleneck the driver — ``df.count()`` after the terminal
operator executes the whole plan).

The headline set covers every subsystem: scan+agg (q01, q06), joins
(q02, q03, q48 salted), windows (q08), dedup (d01, d03, d12 spans,
d14 admission), similarity (s03, s12/s13 PQ), text (t01, t02), time
windows (w01, w02, w03), sampling (p04), and the composed corpus-prep
pipeline (p07).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if REPO_DIR not in sys.path:
    sys.path.insert(0, REPO_DIR)

HEADLINE = [
    "q01_pricing_summary",
    "q06_revenue_filter",
    "q02_region_revenue",
    "q03_top_orders",
    "q08_topk_per_group",
    "d01_exact_dedup",
    "d03_minhash_lsh",
    "s03_lsh_topk",
    "t01_token_count",
    "t02_quality_score",
    "w01_tumbling",
    # added in round 2: streaming twins, global shuffle, salted join —
    # regressions in windows/sampling/skew paths show up round-over-round
    "w02_sliding",
    "w03_session_window",
    "p04_global_shuffle",
    "q48_salted_join",
    # the flagship composed corpus-prep pipeline (quality → dedup →
    # decontaminate → domain mix → split → pack): regressions in any of
    # its six stages surface here
    "p07_corpus_pipeline",
    # added in round 5: the heavy round-3/4 operators, previously only
    # visible to the one-off sf1 probe. Historical r04 sf0.1 baselines
    # (unrecorded — taken from the r04 BENCH_sf1.json recording, which
    # later probe re-runs overwrite): d12 1.061 s, d14 1.351 s,
    # s12 2.682 s, s13 4.384 s.
    "d12_span_dedup",
    "d14_lsh_admission",
    "s12_product_quantize",
    "s13_pq_adc_topk",
    # round 5: the second flagship composition — span detect → excise
    # → repack in one DAG (no prior round baseline; first recording)
    "p14_span_scrub_pipeline",
    # round 6: the chunk→pack composition (explode + per-shard window)
    # and the histogram quantile sketch (hash agg + tiny-sketch
    # read-off + exact-percentile audit) — first recordings
    "p17_chunk_pack",
    "w13_histogram_quantiles",
    # round 6 late: the two heaviest new shapes — cascade retrieval
    # (prefix scan + shortlist rerank) and soft-dedup weights (rides
    # the d07 star-contraction) — first recordings
    "s19_cascade_rerank",
    "d21_softdedup_weights",
    # round 6 final: metadata-filtered ANN — trained-cell probe with
    # the tenant predicate in the join, plus the filtered-exact
    # ground-truth leg — first recording
    "s21_filtered_search",
    # round 6 post-freeze: the MAX-merge HLL register sketch — first
    # recording
    "w15_hll_distinct",
    # round 6 second post-freeze batch: the LSH-candidate Levenshtein
    # verify, the degree-oriented triangle count, and the scan-side
    # PMI pair explode — the three new heavy shapes; first recordings
    "d24_editdist_neardup",
    "s24_triangle_count",
    "t23_pmi_collocations",
    # the sketch-algebra column profile (stack + register agg) and the
    # keyed-window interval merge — first recordings
    "w16_profile_sketch",
    "q68_interval_coverage",
]


# The 11 queries of the round-1 recording (BENCH_r01.json) — the 2×
# baseline-gate subset. FROZEN: the gate compares this subset's
# anchor-normalized wall across rounds (BASELINE.md), so its
# membership must never drift with the headline list above.
R01_SUBSET = HEADLINE[:11]


def measure_anchors(spark) -> tuple[float, float]:
    """HOST CALIBRATION (round 11): two fixed, data-free,
    deterministic JVM workloads timed median-of-3.

    Leg 1 — whole-stage-codegen sum over a range (no I/O, no shuffle
    variability, no Python). The round-10 verdict flagged the headline
    noise band (±15%+) exceeding a round's real delta; r11 measured
    three same-HEAD totals 20-37% above the r10 seal with UNTOUCHED
    code. This anchor lets any round separate "the host is slower
    today" from "the engine regressed": compare host_calibration_sec
    across recordings before reading the headline delta as a code
    signal. From round 13 it is also the DENOMINATOR of the baseline
    gate (BASELINE.md: subset_wall / codegen_anchor).

    Leg 2 — a fixed shuffle (spill path / local-disk write+read): the
    offsets-heavy queries are disk-sensitive and a CPU-only anchor
    can't see a slow disk day."""
    cal_samples = []
    for _ in range(3):
        t0 = time.perf_counter()
        spark.range(1_000_000_000).selectExpr(
            "sum(id * 3 + 1) as s"
        ).collect()
        cal_samples.append(time.perf_counter() - t0)
    host_cal = round(sorted(cal_samples)[1], 3)
    shuf_samples = []
    for _ in range(3):
        t0 = time.perf_counter()
        spark.range(50_000_000).withColumnRenamed("id", "k").repartition(
            64, "k"
        ).selectExpr("sum(k) as s").collect()
        shuf_samples.append(time.perf_counter() - t0)
    return host_cal, round(sorted(shuf_samples)[1], 3)


def warm_queries(spark, registry, names, sf_dir, passes: int = 2) -> None:
    """Warm every plan ``passes`` times so the timed pass measures
    steady state (plan + data, not first-touch JIT/planning). The
    reference is a continuously-running service, so steady state is
    the apples-to-apples number. One warm pass is not enough:
    profiling d03 showed JIT warm-up persisting into the second
    execution ([2.19, 2.20, 1.67, 1.59, ...] over 7 reps), so a
    single warm + median can still elect a warm-up sample — the
    likely cause of the r02 "+33% d03 drift". Each warm pass's
    CacheManager entries are dropped immediately: every offsets
    consumer persists its ranged frame, and 2 warm passes × N queries
    otherwise accumulate dozens of live MEMORY_AND_DISK blocks before
    timing even starts — the executor-memory pressure behind r07's
    p14 recording 6.57 s (rep band [6.5, 11.9]) vs 4.1 s clean."""
    for _ in range(passes):
        for name in names:
            registry[name].fn(spark, sf_dir).count()
            spark.catalog.clearCache()


def time_queries(
    spark, registry, names, sf_dir, reps: int = 5
) -> tuple[dict[str, float], dict[str, list[float]]]:
    """Median-of-``reps`` per query with cache hygiene: the host shows
    2-3× wall-time variance across identical runs, and a single sample
    would grade noise, not the engine. CacheManager is cleared between
    reps (the two-pass offsets' DISK_ONLY persist is keyed by logical
    plan, so reps 2+ would read the rep-1 materialization and the
    median would measure cache-read cost) and after each query's last
    rep (cross-query memory-pressure bleed). Returns (medians,
    per-query [min, max] spreads)."""
    times: dict[str, float] = {}
    spreads: dict[str, list[float]] = {}
    for name in names:
        samples = []
        for _ in range(reps):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            registry[name].fn(spark, sf_dir).count()
            samples.append(time.perf_counter() - t0)
        spark.catalog.clearCache()
        samples.sort()
        times[name] = round(samples[reps // 2], 3)
        spreads[name] = [round(samples[0], 3), round(samples[-1], 3)]
    return times, spreads


# Longitudinal rotation outside the static headline list (round-12
# verdict order 6): each round the sidecar additionally records
# EXTRA_K non-headline registry queries, round-robin by registry
# order keyed on the round number, so every heavy query outside the
# 32 (p03, d15, s22, ...) re-earns wall-time evidence every
# ceil(|registry - headline| / EXTRA_K) rounds without touching the
# headline total the 2× gate reads (committed BENCH_SPREAD.json
# history is the record — check_doc_metrics resolves it via git).
EXTRA_K = 6


def select_extras(registry_names, round_no: int, k: int = EXTRA_K) -> list[str]:
    """Deterministic rotation: the non-headline registry queries in
    registry order, window ``k`` starting at ``(round_no * k) % n``
    (wrapping). Pure function of (registry, round number) so the
    selection is reproducible from the committed artifacts alone."""
    pool = [n for n in registry_names if n not in set(HEADLINE)]
    if not pool:
        return []
    start = (round_no * k) % len(pool)
    return [pool[(start + i) % len(pool)] for i in range(min(k, len(pool)))]


def _current_round() -> int:
    """Round in progress = latest recorded CORRECTNESS round + 1."""
    import glob
    import re

    rounds = [
        int(m.group(1))
        for p in glob.glob(os.path.join(REPO_DIR, "CORRECTNESS_r*.json"))
        if (m := re.search(r"CORRECTNESS_r(\d+)\.json$", p))
    ]
    return max(rounds, default=0) + 1


def gate_fields(times: dict[str, float], host_cal: float) -> dict:
    """Baseline-gate self-adjudication for the sidecar (round 13):
    when BASELINE_SUBSET.json exists, every sf0.1 recording carries
    its own computed anchor-normalized gate verdict — the recording
    and its adjudication can never be separated again. Delegates to
    tools/baseline_gate.evaluate (the single implementation the gate
    contract in BASELINE.md names); returns {} when the re-based
    baseline is absent or the recording isn't evaluable."""
    base_path = os.path.join(REPO_DIR, "BASELINE_SUBSET.json")
    if not os.path.exists(base_path):
        return {}
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "baseline_gate", os.path.join(REPO_DIR, "tools", "baseline_gate.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    base = json.load(open(base_path))
    v = mod.evaluate(
        {"queries": times, "host_calibration_sec": host_cal}, base
    )
    if not v.get("evaluable"):
        return {}
    return {
        "baseline_gate": {
            "ratio": v["ratio"],
            "normalized": v["normalized"],
            "base_normalized": v["base_normalized"],
            "within_gate": v["within_gate"],
        }
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from kafka2clickhouse_py_streamer_spark.session import get_spark
    from kafka2clickhouse_py_streamer_spark.operators.base import all_queries

    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")
    registry = all_queries()

    host_cal, host_cal_shuffle = measure_anchors(spark)

    # Pay the shared Lloyd centroid training ONCE, up front and timed
    # (round-5 advice: the s12/s13/s14 headline numbers were dominated
    # by whichever query happened to run first and fill the per-session
    # codebook cache — bench ORDER decided who paid it). Reporting the
    # training wall as its own line means the per-query numbers below
    # measure query cost, deterministically, and the 2x gate can't be
    # gamed or spooked by cache order.
    from kafka2clickhouse_py_streamer_spark.llm.similarity import (
        _base,
        _train_centroids,
    )

    t0 = time.perf_counter()
    _train_centroids(_base(spark, sf_dir), sf_dir)
    train_sec = round(time.perf_counter() - t0, 3)

    # Round 14: the session-scoped s09 kNN-graph substrate (the edge
    # index s24/s22/s10/s18 traverse) is likewise built ONCE per
    # session — pay it up front and report it as its own line, for
    # the same reason training is: otherwise whichever graph consumer
    # runs first absorbs the build and the per-query numbers depend
    # on bench order.
    from kafka2clickhouse_py_streamer_spark.llm.similarity import knn_graph

    t0 = time.perf_counter()
    knn_graph(spark, sf_dir)  # eager localCheckpoint: builds on call
    knn_graph_sec = round(time.perf_counter() - t0, 3)

    warm_queries(spark, registry, HEADLINE, sf_dir)
    times, spreads = time_queries(spark, registry, HEADLINE, sf_dir)

    # the rotating longitudinal extras (sidecar-only; never in the
    # headline total the gate reads). Only at the tracked scale —
    # other scales never write the sidecar, so timing them there
    # would be unrecorded work in the sf0.01 smoke loop.
    extra_times: dict[str, float] = {}
    extra_spreads: dict[str, list[float]] = {}
    if sf_dir.rstrip("/").endswith("sf0.1"):
        extras = select_extras(list(registry), _current_round())
        warm_queries(spark, registry, extras, sf_dir, passes=1)
        extra_times, extra_spreads = time_queries(
            spark, registry, extras, sf_dir, reps=3
        )

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    line, sidecar = format_output(
        times, spreads, train_sec, sf_val, host_cal_sec=host_cal,
        host_cal_shuffle_sec=host_cal_shuffle,
        knn_graph_sec=knn_graph_sec,
    )
    if extra_times:
        sidecar["extra_queries"] = extra_times
        sidecar["extra_rep_spread"] = extra_spreads
        sidecar["extra_round"] = _current_round()
    sidecar.update(gate_fields(times, host_cal))
    # The sidecar is the TRACKED median-of-3 record at the driver's
    # bench scale (sf0.1) — round notes quote it beside the driver run
    # (checked by tools/check_doc_metrics.py). A smoke run at another
    # scale (sf0.01 iteration loop) must not overwrite it with numbers
    # the round notes never meant (the round-11 accident: a sf0.01
    # verify pass clobbered the sealed sf0.1 recording).
    if sf_val == 0.1:
        with open(os.path.join(REPO_DIR, "BENCH_SPREAD.json"), "w") as fh:
            json.dump(sidecar, fh, indent=1)
    print(line)


# hard cap with margin under the driver's ~2000-char stdout tail window
LINE_CAP = 1900


def format_output(
    times: dict[str, float],
    spreads: dict[str, list[float]],
    train_sec: float,
    sf_val: float | str,
    host_cal_sec: float | None = None,
    host_cal_shuffle_sec: float | None = None,
    knn_graph_sec: float | None = None,
) -> tuple[str, dict]:
    """Build the one-line stdout JSON and the full sidecar payload.

    The per-rep spreads go to a SIDECAR file (BENCH_SPREAD.json), not
    the stdout line: the driver parses the bench JSON out of a bounded
    tail window of stdout (~2000 chars), and the round-7 run proved
    that inlining rep_spread pushes the line past that window —
    BENCH_r07.json recorded "parsed": null even though rc was 0. The
    stdout contract is ONE compact line; everything bulky lives in the
    sidecar. If even the queries dict outgrows the cap someday, the
    line degrades to metric/value/unit/sf and points at the sidecar."""
    total = round(sum(times.values()), 3)
    payload = {
        "metric": "headline_total_wall",
        "value": total,
        "unit": "sec",
        "queries": times,
        "train_centroids_sec": train_sec,
        "sf": sf_val,
    }
    if knn_graph_sec is not None:
        # round-14 additive field: the one-time s09 kNN-graph build
        # (the s24/s22/s10 substrate), paid up front like training
        payload["knn_graph_sec"] = knn_graph_sec
    line = json.dumps(payload)
    if len(line) > LINE_CAP:
        payload.pop("queries")
        payload["queries_in"] = "BENCH_SPREAD.json"
        line = json.dumps(payload)
    sidecar = {
        "metric": "headline_total_wall",
        "value": total,
        "unit": "sec",
        "queries": times,
        "rep_spread": spreads,
        "train_centroids_sec": train_sec,
        "sf": sf_val,
    }
    if knn_graph_sec is not None:
        sidecar["knn_graph_sec"] = knn_graph_sec
    if host_cal_sec is not None:
        # the fixed data-free JVM anchors (see main) — sidecar only;
        # the stdout line stays minimal under the driver's tail cap
        sidecar["host_calibration_sec"] = host_cal_sec
    if host_cal_shuffle_sec is not None:
        sidecar["host_calibration_shuffle_sec"] = host_cal_shuffle_sec
    return line, sidecar


if __name__ == "__main__":
    main()
