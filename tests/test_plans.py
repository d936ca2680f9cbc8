"""Plan-shape tests: pin the physical properties that make queries
viable at 100 TB — pushdown, pruning, broadcast, shuffle counts,
codegen. A regression here is a performance bug even when results stay
correct."""

from __future__ import annotations

from kafka2clickhouse_py_streamer_spark.operators.aggregates import (
    q01_pricing_summary,
    q06_revenue_filter,
)
from kafka2clickhouse_py_streamer_spark.operators.joins import (
    q02_region_revenue,
    q03_top_orders,
)
from kafka2clickhouse_py_streamer_spark.plans import (
    count_exchanges,
    formatted_plan,
    has_broadcast_join,
    pushed_filters,
    python_row_ops,
    read_schema_columns,
)


def test_q06_filters_reach_parquet_scan(spark, sf_dir):
    df = q06_revenue_filter(spark, sf_dir)
    pushed = " ".join(pushed_filters(df))
    # all three predicate families must be pushed to the scan
    assert "l_shipdate" in pushed
    assert "l_discount" in pushed
    assert "l_quantity" in pushed


def test_q06_scan_is_column_pruned(spark, sf_dir):
    df = q06_revenue_filter(spark, sf_dir)
    [cols] = read_schema_columns(df)
    # 4 needed columns only — not lineitem's 11
    assert set(cols) == {
        "l_quantity", "l_extendedprice", "l_discount", "l_shipdate"
    }


def test_q01_pruned_and_single_agg_shuffle(spark, sf_dir):
    df = q01_pricing_summary(spark, sf_dir)
    [cols] = read_schema_columns(df)
    assert len(cols) == 7  # 11-column table pruned to the needed 7
    # partial+final hash agg = ONE hash exchange (+1 range for orderBy)
    assert count_exchanges(df) <= 2
    assert python_row_ops(df) == 0  # pure JVM hot path


def test_q02_dimensions_broadcast(spark, sf_dir):
    df = q02_region_revenue(spark, sf_dir)
    assert has_broadcast_join(df)
    plan = formatted_plan(df)
    # nation and region must NOT arrive via shuffle: at most the
    # customer⋈orders shuffle pair + agg + sort exchanges
    assert plan.count("BroadcastHashJoin") >= 2


def test_q03_no_cartesian_and_codegen(spark, sf_dir):
    df = q03_top_orders(spark, sf_dir)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan  # top-10 never global-sorts
    assert python_row_ops(df) == 0


def test_p01_split_is_shuffle_free_scan(spark, sf_dir):
    # train/test split must be a row-local projection: one scan pruned
    # to the key column, no exchange except the final presentation sort
    from kafka2clickhouse_py_streamer_spark.llm.sampling import (
        p01_train_test_split,
    )

    df = p01_train_test_split(spark, sf_dir)
    [cols] = read_schema_columns(df)
    assert cols == ["doc_id"]
    assert count_exchanges(df) <= 1  # range exchange for orderBy only
    assert python_row_ops(df) == 0


def test_q46_dim_join_broadcasts(spark, sf_dir):
    from kafka2clickhouse_py_streamer_spark.operators.scalar_fns import (
        q46_string_agg,
    )

    df = q46_string_agg(spark, sf_dir)
    assert has_broadcast_join(df)


def test_d03_hot_path_is_jvm(spark, sf_dir):
    # the whole minhash pipeline (shingle, hash, band join, verify)
    # must stay out of Python row ops
    from kafka2clickhouse_py_streamer_spark.llm.dedup import d03_minhash_lsh

    df = d03_minhash_lsh(spark, sf_dir)
    assert python_row_ops(df) == 0
    assert "CartesianProduct" not in formatted_plan(df)


def test_d06_band_join_is_hash_equi_and_width_safe(spark, sf_dir):
    # r10: the 16-bit fingerprint put 50k docs in a 65k-value space
    # (P(random pair within hamming<=3) ~ 1.1e-2) and the sf1 probe
    # measured the quadratic pair blowup (3.4M pairs at sf0.1, 26x
    # growth at 10x data). r11 doubled down: the 32-bit variant's
    # 8-bit bands were still ~n^2/128 in the candidate join (the m07
    # receipt), so the floor is now 64 bits / 16-bit bands and the
    # banding runs over DISTINCT fingerprints. Pin width, band space,
    # AND the join shape: the band candidate join must stay a hash
    # equi-join over band keys, never a cartesian/nested-loop, and
    # fully JVM-side.
    from kafka2clickhouse_py_streamer_spark.llm.dedup import (
        SIMHASH_BANDS,
        SIMHASH_BITS,
        d06_simhash_pairs,
    )

    assert SIMHASH_BITS >= 64
    assert SIMHASH_BITS % SIMHASH_BANDS == 0
    assert SIMHASH_BITS // SIMHASH_BANDS >= 16
    df = d06_simhash_pairs(spark, sf_dir)
    plan = formatted_plan(df)
    assert python_row_ops(df) == 0
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_p04_global_rank_never_single_partition(spark, sf_dir):
    # the two-pass rank must not funnel rows through one partition:
    # no SinglePartition exchange anywhere in the plan
    from kafka2clickhouse_py_streamer_spark.llm.sampling import (
        p04_global_shuffle,
    )

    plan = formatted_plan(p04_global_shuffle(spark, sf_dir))
    assert "SinglePartition" not in plan


def test_p03_packing_never_single_partition(spark, sf_dir):
    # the packing running-sum must use the distributed two-pass offsets,
    # not a global Window.orderBy (one-reducer funnel)
    from kafka2clickhouse_py_streamer_spark.llm.sampling import (
        p03_sequence_packing,
    )

    plan = formatted_plan(p03_sequence_packing(spark, sf_dir))
    assert "SinglePartition" not in plan


def test_p03_shard_variant_partitions_by_shard(spark, sf_dir):
    # per-shard packing windows over the shard key — still no global
    # single-partition window
    from kafka2clickhouse_py_streamer_spark.llm.sampling import (
        p03_sequence_packing,
    )

    df = p03_sequence_packing(spark, sf_dir, shard_col="lang")
    plan = formatted_plan(df)
    assert "SinglePartition" not in plan
    assert "lang" in plan  # window keyed on the shard column


def test_q48_salted_join_spreads_hot_keys(spark, sf_dir):
    # the join key must include the salt (hot keys spread over sub-keys)
    # and the small side must NOT be broadcast — salting exists for the
    # shuffle-join case a broadcast can't reach at scale
    from kafka2clickhouse_py_streamer_spark.operators.joins import (
        q48_salted_join,
    )

    plan = formatted_plan(q48_salted_join(spark, sf_dir))
    assert "__salt" in plan
    assert "ShuffledHashJoin" in plan


def test_p05_clean_corpus_single_shuffle(spark, sf_dir):
    # quality filter and split are row-local; the only data shuffle is
    # the dedup window on the content hash (+1 range for the final sort)
    from kafka2clickhouse_py_streamer_spark.llm.sampling import (
        p05_clean_corpus,
    )

    df = p05_clean_corpus(spark, sf_dir)
    assert count_exchanges(df) <= 2
    assert "SinglePartition" not in formatted_plan(df)


def test_time_windows_one_hash_exchange(spark, sf_dir):
    # tumbling/sliding/session windows are each a single hash
    # aggregation (+1 range exchange for presentation order); the Expand
    # node for sliding windows must not add a shuffle
    from kafka2clickhouse_py_streamer_spark.streaming.batch_windows import (
        w01_tumbling,
        w02_sliding,
        w03_session_window,
    )

    for fn in (w01_tumbling, w02_sliding, w03_session_window):
        df = fn(spark, sf_dir)
        assert count_exchanges(df) <= 2, fn.__name__
        assert "SinglePartition" not in formatted_plan(df), fn.__name__


def test_row_scan_defaults(spark, sf_dir):
    # a bare projection reads only the selected columns
    from kafka2clickhouse_py_streamer_spark.operators.base import table

    df = table(spark, sf_dir, "orders").select("o_orderkey")
    [cols] = read_schema_columns(df)
    assert cols == ["o_orderkey"]


def test_d09_benchmark_side_broadcasts(spark, sf_dir):
    # the eval-set side of the contamination screen is tiny relative to
    # the corpus: it must arrive via broadcast (the corpus never
    # shuffles for the join) and the probe must stay JVM-side
    from kafka2clickhouse_py_streamer_spark.llm.dedup import (
        d09_contamination,
    )

    df = d09_contamination(spark, sf_dir)
    plan = formatted_plan(df)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert python_row_ops(df) == 0


def test_p06_domain_mix_one_domain_shuffle(spark, sf_dir):
    # cap-per-domain selection: one hash exchange on the domain key
    # (+1 range for presentation order), scan pruned to the two columns
    from kafka2clickhouse_py_streamer_spark.llm.sampling import (
        p06_domain_mix,
    )

    df = p06_domain_mix(spark, sf_dir)
    assert count_exchanges(df) <= 2
    [cols] = read_schema_columns(df)
    assert set(cols) == {"doc_id", "source"}
    assert "SinglePartition" not in formatted_plan(df)


def test_s06_quantize_is_shuffle_free(spark, sf_dir):
    # quantization is a row-local vector transform: no exchange except
    # the presentation sort, zero Python
    from kafka2clickhouse_py_streamer_spark.llm.similarity import (
        s06_quantize,
    )

    df = s06_quantize(spark, sf_dir)
    assert count_exchanges(df) <= 1
    assert python_row_ops(df) == 0


def test_t07_vocab_partial_agg_and_topk(spark, sf_dir):
    # distributed word count: top-k must be TakeOrderedAndProject (never
    # a global sort), the corpus-size scalar joins via broadcast, and
    # the token explode stays out of Python
    from kafka2clickhouse_py_streamer_spark.llm.text import t07_vocab_idf

    df = t07_vocab_idf(spark, sf_dir)
    plan = formatted_plan(df)
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
    assert python_row_ops(df) == 0


def test_w04_dim_join_broadcasts(spark, sf_dir):
    # stream-static enrichment: the customer dim must broadcast — the
    # event stream's only exchange is the windowed agg's (+1 range sort)
    from kafka2clickhouse_py_streamer_spark.streaming.batch_windows import (
        w04_enriched_windows,
    )

    df = w04_enriched_windows(spark, sf_dir)
    assert has_broadcast_join(df)
    assert count_exchanges(df) <= 2


def test_q50_range_join_is_equi_not_nested_loop(spark, sf_dir):
    # the ±Δ time predicate must ride an equi bucket join — a naive
    # theta compiles to BroadcastNestedLoopJoin/CartesianProduct, the
    # O(n·m) plan that dies at scale
    from kafka2clickhouse_py_streamer_spark.operators.joins import (
        q50_range_join,
    )

    plan = formatted_plan(q50_range_join(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_t08_logprob_token_stream_stays_jvm(spark, sf_dir):
    # the (doc, token) stream joins the vocab on the token key only;
    # the corpus-total constant shifts after the per-doc agg — no
    # cartesian on the big stream, zero Python
    from kafka2clickhouse_py_streamer_spark.llm.text import (
        t08_unigram_logprob,
    )

    df = t08_unigram_logprob(spark, sf_dir)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert python_row_ops(df) == 0


def test_p14_composition_adds_no_shuffles(spark, sf_dir):
    # detection→removal→repack in one DAG must cost the SUM of its
    # stages: the split assignment and empty-doc gate are row-local
    # projections that fuse into the scrub (same pre-packing exchange
    # count as the bare scrub), and the packing tail pays only its
    # own window + presentation-sort exchanges past the offsets
    # checkpoint. Nothing cartesian, nothing single-partition,
    # nothing Python.
    from pyspark.sql import functions as F

    from kafka2clickhouse_py_streamer_spark.llm.dedup import (
        _span_scrubbed,
    )
    from kafka2clickhouse_py_streamer_spark.llm.sampling import (
        TRAIN_END,
        VAL_END,
        _bucket,
        p14_span_scrub_pipeline,
    )

    scrub_ex = count_exchanges(_span_scrubbed(spark, sf_dir))
    assert scrub_ex >= 3  # the counter must be live (round-5 fix)

    b = _bucket(F.col("doc_id"))
    split = (
        F.when(b < TRAIN_END, F.lit("train"))
        .when(b < VAL_END, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    tagged = (
        _span_scrubbed(spark, sf_dir)
        .filter(F.col("n_kept") > 0)
        .select(
            "doc_id",
            F.col("n_kept").alias("n_tokens"),
            "n_removed",
            split.alias("split"),
        )
    )
    assert count_exchanges(tagged) == scrub_ex

    df = p14_span_scrub_pipeline(spark, sf_dir)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "SinglePartition" not in plan
    assert python_row_ops(df) == 0
    # past the offsets checkpoint: the partition-local window's hash
    # exchange + the presentation sort — nothing else
    assert count_exchanges(df) <= 2


def test_p07_pipeline_composition_shape(spark, sf_dir):
    # six stages, one DAG: the benchmark probe must broadcast, nothing
    # may go cartesian or fall out of the JVM, and no global
    # single-partition funnel may appear (packing is per-split)
    from kafka2clickhouse_py_streamer_spark.llm.sampling import (
        p07_corpus_pipeline,
    )

    df = p07_corpus_pipeline(spark, sf_dir)
    plan = formatted_plan(df)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "SinglePartition" not in plan
    assert python_row_ops(df) == 0


def test_t09_pii_scrub_is_shuffle_free(spark, sf_dir):
    # redaction is a pure projection scan: regexp exprs stay in
    # whole-stage codegen, zero exchanges besides the final sort,
    # zero Python
    from kafka2clickhouse_py_streamer_spark.llm.text import t09_pii_scrub

    df = t09_pii_scrub(spark, sf_dir)
    plan = formatted_plan(df)
    assert "Exchange hashpartitioning" not in plan
    assert python_row_ops(df) == 0


def test_w05_attribution_is_equi_join(spark, sf_dir):
    # the time range must ride the user_id equi join as a post-join
    # filter — never a nested-loop theta join; first-click selection is
    # a hash agg, not a window sort
    from kafka2clickhouse_py_streamer_spark.streaming.batch_windows import (
        w05_attribution,
    )

    df = w05_attribution(spark, sf_dir)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert python_row_ops(df) == 0


def test_q26_asof_default_plan_is_join_free(spark, sf_dir):
    # the union-sort carry-forward as-of: ONE hash shuffle on the key,
    # a running-window carry, and NO join operator — the intermediate
    # is |events|+|orders| rows, so per-key fan-out stays linear at
    # 100 TB (the join+rn=1 twin materializes every event×earlier-order
    # pair first)
    from kafka2clickhouse_py_streamer_spark.operators.joins import (
        q26_asof_join,
    )

    df = q26_asof_join(spark, sf_dir)
    plan = formatted_plan(df)
    assert "Join" not in plan  # no SortMergeJoin/BroadcastHashJoin/NLJ
    assert "Union" in plan
    # one hash shuffle on the key; the only other exchange is the
    # final presentation orderBy (rangepartitioning)
    assert plan.count("hashpartitioning") == 1
    assert python_row_ops(df) == 0


def test_q26_union_sort_matches_fanout_twin(spark, sf_dir):
    # both formulations answer the same as-of question; the bounded
    # default must reproduce the twin row-for-row (incl. max-orderkey
    # tie-breaks)
    from kafka2clickhouse_py_streamer_spark.operators.joins import (
        asof_join_fanout,
        q26_asof_join,
    )

    got = {tuple(r) for r in q26_asof_join(spark, sf_dir).collect()}
    want = {tuple(r) for r in asof_join_fanout(spark, sf_dir).collect()}
    assert got == want


def test_p08_flatten_mix_has_no_window(spark, sf_dir):
    # the probabilistic flattening must stay window-free: one tiny
    # count agg broadcast back + a row-local bucket predicate — the
    # scale advantage over p06's exact per-domain window cap
    from kafka2clickhouse_py_streamer_spark.llm.sampling import (
        p08_flatten_mix,
    )

    df = p08_flatten_mix(spark, sf_dir)
    plan = formatted_plan(df)
    assert "Window" not in plan
    assert "BroadcastHashJoin" in plan
    assert python_row_ops(df) == 0


def test_s08_recall_never_cartesian(spark, sf_dir):
    # recall@k composes s01 (broadcast cross of the bounded query set)
    # with s03 (bucket equi-join); the recall join itself must be a
    # broadcast equi-join on (query_id, cand_id), never a nested loop
    from kafka2clickhouse_py_streamer_spark.llm.similarity import (
        s08_ann_recall,
    )

    df = s08_ann_recall(spark, sf_dir)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert python_row_ops(df) == 0


def test_p10_budget_select_never_single_partition(spark, sf_dir):
    # the quality-ordered global running sum must use the two-pass
    # offsets (composite order key), never a global one-partition window
    from kafka2clickhouse_py_streamer_spark.llm.sampling import (
        p10_budget_select,
    )

    df = p10_budget_select(spark, sf_dir)
    plan = formatted_plan(df)
    assert "SinglePartition" not in plan
    assert python_row_ops(df) == 0


def test_d12_span_dedup_no_cartesian_pure_jvm(spark, sf_dir):
    # span dedup must stay an explode + hash-aggregate: no pair join at
    # all (that's its whole advantage over d02), no Python in the path
    from kafka2clickhouse_py_streamer_spark.llm.dedup import d12_span_dedup

    df = d12_span_dedup(spark, sf_dir)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan
    assert python_row_ops(df) == 0


def test_q53_funnel_equi_joins_only(spark, sf_dir):
    # every stage joins on user_id equality; the ts ordering is a
    # post-join filter — a nested-loop/cartesian plan would melt at
    # event-stream scale
    from kafka2clickhouse_py_streamer_spark.operators.windows import q53_funnel

    df = q53_funnel(spark, sf_dir)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert python_row_ops(df) == 0


def test_t11_readability_shuffle_free(spark, sf_dir):
    # pure projection: the only exchange allowed is the output ordering
    from kafka2clickhouse_py_streamer_spark.llm.text import t11_readability

    df = t11_readability(spark, sf_dir)
    assert count_exchanges(df) <= 1  # the orderBy range exchange
    assert python_row_ops(df) == 0


def test_d13_canonical_argmax_is_hash_agg_not_window(spark, sf_dir):
    # the per-cluster argmax must be a max_by hash aggregate (partial
    # map-side), not a row_number window sort over every cluster
    from kafka2clickhouse_py_streamer_spark.llm.dedup import (
        d13_quality_canonical,
    )

    df = d13_quality_canonical(spark, sf_dir)
    plan = formatted_plan(df)
    assert "Window" not in plan
    assert "SinglePartition" not in plan


def test_t12_lexical_diversity_two_agg_shuffles_jvm_only(spark, sf_dir):
    # explode -> (doc_id, word) agg -> doc_id agg -> join back: the two
    # hash exchanges (+1 broadcast/side for the left join at most, +1
    # presentation sort); NO Python anywhere in the word stream
    from kafka2clickhouse_py_streamer_spark.llm.text import (
        t12_lexical_diversity,
    )

    df = t12_lexical_diversity(spark, sf_dir)
    plan = formatted_plan(df)
    assert python_row_ops(df) == 0
    assert "CartesianProduct" not in plan
    # both count aggs must have a partial (map-side combine) pass
    assert plan.count("HashAggregate") >= 4


def test_q54_histogram_broadcast_bounds_no_sort(spark, sf_dir):
    # global min/max arrives broadcast (one-row frame); the bucket agg
    # must be a hash agg — an equi-width histogram needs NO sort of the
    # fact table, and the scans must prune to the single priced column
    from kafka2clickhouse_py_streamer_spark.operators.statistics import (
        q54_histogram,
    )

    df = q54_histogram(spark, sf_dir)
    plan = formatted_plan(df)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan
    assert python_row_ops(df) == 0
    for cols in read_schema_columns(df):
        assert cols == ["l_extendedprice"]


def test_q55_outliers_medians_broadcast(spark, sf_dir):
    # the per-key median/MAD frames are |keys| rows — they must come
    # back broadcast, never as a shuffled join of the fact table
    from kafka2clickhouse_py_streamer_spark.operators.statistics import (
        q55_robust_outliers,
    )

    df = q55_robust_outliers(spark, sf_dir)
    plan = formatted_plan(df)
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan
    assert python_row_ops(df) == 0


def test_w07_topk_ranks_aggregated_frame_only(spark, sf_dir):
    # the window sort must run over the aggregated (window, type) frame
    # — tiny per-hour groups — never over raw events; no cartesian
    from kafka2clickhouse_py_streamer_spark.streaming.batch_windows import (
        w07_window_topk,
    )

    df = w07_window_topk(spark, sf_dir)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "SinglePartition" not in plan
    assert python_row_ops(df) == 0
    # agg before window: the partial+final hash agg pair exists
    assert plan.count("HashAggregate") >= 2


def test_p11_curriculum_never_single_partition(spark, sf_dir):
    # the global easy->hard running sum must use the two-pass offsets
    # pattern — no one-partition window, no Python
    from kafka2clickhouse_py_streamer_spark.llm.sampling import (
        p11_curriculum_stages,
    )

    df = p11_curriculum_stages(spark, sf_dir)
    plan = formatted_plan(df)
    # exactly ONE SinglePartition is allowed: the one-row global token
    # total (a scalar aggregate). The running-sum window itself must
    # ride the two-pass offsets partitioning.
    assert plan.count("SinglePartition") <= 1
    assert python_row_ops(df) == 0


def test_d14_admission_no_pair_join_jvm_only(spark, sf_dir):
    # greedy admission joins bands to the bucket-MIN aggregate (never
    # bands-to-bands like d03's candidate join): no pair blowup on hot
    # buckets, no cartesian, no Python
    from kafka2clickhouse_py_streamer_spark.llm.dedup import (
        d14_lsh_admission,
    )

    df = d14_lsh_admission(spark, sf_dir)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert python_row_ops(df) == 0


def test_p12_mix_single_agg_broadcast_total(spark, sf_dir):
    # the mixture weights derive from ONE hash agg over the corpus and
    # a one-row broadcast total — no window, no join of the fact table
    from kafka2clickhouse_py_streamer_spark.llm.sampling import (
        p12_temperature_mix,
    )

    df = p12_temperature_mix(spark, sf_dir)
    plan = formatted_plan(df)
    assert "Window" not in plan
    assert "SortMergeJoin" not in plan
    assert python_row_ops(df) == 0
    for cols in read_schema_columns(df):
        assert set(cols) == {"source", "text"}


def test_q58_w08_single_keyed_window_shuffle(spark, sf_dir):
    # both are one-window-pass operators: keyed window (user / event
    # type), never a global single-partition sort, no joins, no Python
    from kafka2clickhouse_py_streamer_spark.operators.windows import (
        q58_scd2_intervals,
    )
    from kafka2clickhouse_py_streamer_spark.streaming.batch_windows import (
        w08_disorder_profile,
    )

    for df in (
        q58_scd2_intervals(spark, sf_dir),
        w08_disorder_profile(spark, sf_dir),
    ):
        plan = formatted_plan(df)
        assert "SinglePartition" not in plan
        assert "Join" not in plan
        assert python_row_ops(df) == 0


def test_s10_pagerank_iterations_stay_joins(spark, sf_dir):
    # every power iteration must be an equi-join + hash agg over the
    # edge list — no cartesian, no nested loop, no Python
    from kafka2clickhouse_py_streamer_spark.llm.similarity import (
        s10_pagerank,
    )

    df = s10_pagerank(spark, sf_dir)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert python_row_ops(df) == 0


def test_s09_knn_graph_bucket_join_no_cartesian(spark, sf_dir):
    # both-sides-large ANN: candidates MUST come from the bucket
    # equi-join — a cartesian/nested-loop self-join is the |corpus|²
    # failure this operator exists to avoid. The published query is
    # served from the session-scoped knn_graph substrate (a
    # lineage-cut scan), so the join shape is pinned on the PRE-CUT
    # computation frame — the d17 lesson: a materialization must not
    # be allowed to make the structural pin vacuous.
    from kafka2clickhouse_py_streamer_spark.llm.similarity import (
        _knn_graph_frame,
        derived_planes,
        s09_knn_graph,
    )

    core = _knn_graph_frame(spark, sf_dir, derived_planes(spark, sf_dir))
    plan = formatted_plan(core)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert python_row_ops(core) == 0

    df = s09_knn_graph(spark, sf_dir)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert python_row_ops(df) == 0


def test_s09_session_graph_cache_and_equivalence(spark, sf_dir):
    # the knn_graph substrate: (1) one frame per (session, sf_dir) —
    # consumers share the build; (2) the served rows are EXACTLY the
    # fresh computation's (the cache must never change what s09
    # publishes); (3) a pinned n_planes bypasses the cache (the sf1
    # occupancy probe's contract).
    from kafka2clickhouse_py_streamer_spark.llm.similarity import (
        _knn_graph_frame,
        derived_planes,
        knn_graph,
        s09_knn_graph,
    )

    g1 = knn_graph(spark, sf_dir)
    g2 = knn_graph(spark, sf_dir)
    assert g1 is g2
    planes = derived_planes(spark, sf_dir)
    fresh = sorted(
        map(tuple, _knn_graph_frame(spark, sf_dir, planes).collect())
    )
    served = sorted(map(tuple, s09_knn_graph(spark, sf_dir).collect()))
    assert served == fresh
    pinned = s09_knn_graph(spark, sf_dir, n_planes=planes)
    assert sorted(map(tuple, pinned.collect())) == fresh


def test_q57_cohort_retention_broadcast_rejoins(spark, sf_dir):
    # the cohort tag and size frames are customer/cohort-sized — they
    # re-join broadcast; the fact table shuffles only for its aggs
    from kafka2clickhouse_py_streamer_spark.operators.statistics import (
        q57_cohort_retention,
    )

    df = q57_cohort_retention(spark, sf_dir)
    plan = formatted_plan(df)
    assert plan.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in plan
    assert python_row_ops(df) == 0
    for cols in read_schema_columns(df):
        assert set(cols) == {"o_custkey", "o_orderdate"}


def test_q56_mom_growth_window_over_aggregate(spark, sf_dir):
    # lag must navigate the |priority|x|month| aggregated series, not
    # raw orders: the plan is agg-then-window, one fact shuffle
    from kafka2clickhouse_py_streamer_spark.operators.windows import (
        q56_mom_growth,
    )

    df = q56_mom_growth(spark, sf_dir)
    plan = formatted_plan(df)
    assert plan.count("HashAggregate") >= 2  # partial+final before lag
    assert python_row_ops(df) == 0
    for cols in read_schema_columns(df):
        assert set(cols) == {
            "o_orderpriority", "o_orderdate", "o_totalprice"
        }


def test_q59_q61_keyed_windows_no_joins(spark, sf_dir):
    # sweep-line and gaps-and-islands are pure agg+keyed-window
    # dataflows: no join anywhere, never a global single-partition sort
    # (beyond the final presentation orderBy), no Python
    from kafka2clickhouse_py_streamer_spark.operators.windows import (
        q59_concurrency,
        q61_gaps_islands,
    )

    for df in (
        q59_concurrency(spark, sf_dir),
        q61_gaps_islands(spark, sf_dir),
    ):
        plan = formatted_plan(df)
        assert "Join" not in plan
        assert "SinglePartition" not in plan
        assert python_row_ops(df) == 0


def test_q60_trend_single_agg_shuffle_pruned(spark, sf_dir):
    # regr_* moments are partial-aggregatable: partial+final hash agg =
    # one hash exchange (+1 range for the presentation sort); the scan
    # reads only the three needed columns
    from kafka2clickhouse_py_streamer_spark.operators.statistics import (
        q60_linear_trend,
    )

    df = q60_linear_trend(spark, sf_dir)
    assert count_exchanges(df) <= 2
    assert python_row_ops(df) == 0
    for cols in read_schema_columns(df):
        assert set(cols) == {
            "o_orderpriority", "o_orderdate", "o_totalprice"
        }


def test_w09_gap_fill_joins_aggregates_only(spark, sf_dir):
    # the dense grid must join the AGGREGATED hourly frame (equi-join,
    # possibly broadcast under AQE) — never a cartesian against raw
    # events; the forward-fill window is keyed by event_type
    from kafka2clickhouse_py_streamer_spark.streaming.batch_windows import (
        w09_gap_fill,
    )

    df = w09_gap_fill(spark, sf_dir)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "SinglePartition" not in plan
    assert python_row_ops(df) == 0


def test_w10_anomaly_window_over_aggregate_no_joins(spark, sf_dir):
    # z-scoring runs over the hourly AGGREGATE (bounded 24-row frame),
    # never raw events: agg-then-window, no joins, scan pruned to the
    # three columns the rollup needs
    from kafka2clickhouse_py_streamer_spark.streaming.batch_windows import (
        w10_rate_anomaly,
    )

    df = w10_rate_anomaly(spark, sf_dir)
    plan = formatted_plan(df)
    assert "Join" not in plan
    assert plan.count("HashAggregate") >= 2  # partial+final before window
    assert python_row_ops(df) == 0
    # the shared _hourly rollup also computes sum(value), but w10 never
    # reads it — Catalyst must prune `value` out of the scan entirely
    for cols in read_schema_columns(df):
        assert set(cols) == {"event_type", "ts"}


def test_p13_pps_never_single_partition(spark, sf_dir):
    # the global weight-line offsets must be the two-pass pattern; the
    # only SinglePartition is the broadcast one-row total
    from kafka2clickhouse_py_streamer_spark.llm.sampling import (
        p13_pps_sample,
    )

    df = p13_pps_sample(spark, sf_dir)
    plan = formatted_plan(df)
    assert plan.count("SinglePartition") <= 1  # the one-row total only
    assert "CartesianProduct" not in plan
    assert python_row_ops(df) == 0


def test_p22_padding_audit_distributed(spark, sf_dir):
    # the two batch strategies' global row indexes must come from the
    # two-pass offsets (range shuffle + broadcast), never a
    # single-partition row_number window; per-batch stats hash-shuffle
    # on batch_id. SinglePartition appears only for the per-strategy
    # scalar folds (arrival, sorted, packed) and the 3-row final sort.
    from kafka2clickhouse_py_streamer_spark.llm.sampling import (
        p22_padding_waste,
    )

    df = p22_padding_waste(spark, sf_dir)
    plan = formatted_plan(df)
    assert "batch_id" in plan
    assert plan.count("SinglePartition") <= 4
    assert "CartesianProduct" not in plan
    assert python_row_ops(df) == 0


def test_d15_semdedup_bucket_join_no_cartesian(spark, sf_dir):
    # candidates come only from LSH bucket collisions: the pair join is
    # an equi-join on the bucket id — no cartesian, no nested loop
    from kafka2clickhouse_py_streamer_spark.llm.similarity import (
        d15_semdedup,
    )

    df = d15_semdedup(spark, sf_dir)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert python_row_ops(df) == 0


def test_s23_mips_seed_limit_and_broadcast_bound(spark, sf_dir):
    # phase A's seed pick must be a TakeOrderedAndProject (top-N by
    # norm — never a global sort), and the corpus side must meet the
    # 10-row query/threshold table only through broadcasts; the corpus
    # itself never hash-shuffles
    from kafka2clickhouse_py_streamer_spark.llm.similarity import (
        s23_mips_norm_pruned,
    )

    df = s23_mips_norm_pruned(spark, sf_dir)
    plan = formatted_plan(df)
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
    assert python_row_ops(df) == 0


def test_t22_langid_eval_agg_only(spark, sf_dir):
    # the eval joins |langs|-row AGGREGATES — the corpus never pairs
    # with itself and no Python touches the scan
    from kafka2clickhouse_py_streamer_spark.llm.text import (
        t22_langid_eval,
    )

    df = t22_langid_eval(spark, sf_dir)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert python_row_ops(df) == 0


def test_t13_zipf_window_over_vocab_aggregate(spark, sf_dir):
    # the rank window must run over the (source, token) AGGREGATE (a
    # word count with map-side combine), never the raw token stream;
    # regr moments aggregate the ranked frame — all JVM
    from kafka2clickhouse_py_streamer_spark.llm.text import t13_zipf_fit

    df = t13_zipf_fit(spark, sf_dir)
    plan = formatted_plan(df)
    assert plan.count("HashAggregate") >= 2  # partial+final vocab count
    assert "Join" not in plan
    assert python_row_ops(df) == 0


def test_t14_bigram_vocab_side_join_only(spark, sf_dir):
    # the conditional ln p(w2|w1) must be attached to the bigram VOCAB
    # (vocab-sized join), and the (doc, bigram) stream pays exactly one
    # join against that scored vocab — no cartesian, all JVM
    from kafka2clickhouse_py_streamer_spark.llm.text import (
        t14_bigram_logprob,
    )

    df = t14_bigram_logprob(spark, sf_dir)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert python_row_ops(df) == 0


def test_s11_cluster_audit_single_agg_broadcast_total(spark, sf_dir):
    # centroids are literals in the scan projection (the s05 'train
    # small, broadcast' shape): one hash agg on the cell key, the
    # occupancy total joins back as a one-row broadcast — never a
    # shuffle join of the corpus
    from kafka2clickhouse_py_streamer_spark.llm.similarity import (
        s11_cluster_quality,
    )

    df = s11_cluster_quality(spark, sf_dir)
    plan = formatted_plan(df)
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("HashAggregate") >= 2  # partial+final cell agg
    assert python_row_ops(df) == 0


def test_w11_cascade_join_free_keyed_aggs(spark, sf_dir):
    # the rollup cascade is pure re-aggregation: no joins anywhere, no
    # single-partition funnel, all tiers keyed hash aggs
    from kafka2clickhouse_py_streamer_spark.streaming.batch_windows import (
        w11_rollup_cascade,
    )

    df = w11_rollup_cascade(spark, sf_dir)
    plan = formatted_plan(df)
    assert "Join" not in plan
    assert "SinglePartition" not in plan
    assert python_row_ops(df) == 0


def test_s12_pq_no_join_bounded_explode(spark, sf_dir):
    # PQ assignment is explode + keyed argmin window + fold — the
    # codebooks are literals, so NO join of any kind touches the
    # vectors
    from kafka2clickhouse_py_streamer_spark.llm.similarity import (
        s12_product_quantize,
    )

    df = s12_product_quantize(spark, sf_dir)
    plan = formatted_plan(df)
    assert "Join" not in plan
    assert "CartesianProduct" not in plan
    assert python_row_ops(df) == 0


def test_s13_adc_codes_never_touch_vectors_at_rank(spark, sf_dir):
    # the ADC join streams the CODED corpus past a broadcast query
    # side: codes come from literal codebooks in the scan projection
    # (no join/ explode to compute them), and no SortMergeJoin or
    # Python appears anywhere
    from kafka2clickhouse_py_streamer_spark.llm.similarity import (
        s13_pq_adc_topk,
    )

    df = s13_pq_adc_topk(spark, sf_dir)
    plan = formatted_plan(df)
    assert "SortMergeJoin" not in plan
    assert python_row_ops(df) == 0


def test_m06_packing_one_join_no_single_partition(spark, sf_dir):
    # modality fusion is one 1:1 equi-join; the global offsets are the
    # two-pass pattern (SinglePartition never appears); assignment is
    # JVM integer arithmetic
    from kafka2clickhouse_py_streamer_spark.llm.multimodal import (
        m06_multimodal_packing,
    )

    df = m06_multimodal_packing(spark, sf_dir)
    plan = formatted_plan(df)
    assert "SinglePartition" not in plan
    assert "CartesianProduct" not in plan
    assert python_row_ops(df) == 0


def test_q62_lateral_decorrelates_no_nested_loop(spark, sf_dir):
    # the ORDER BY ... LIMIT lateral must decorrelate (window/limit
    # over a join), never execute per-outer-row as a nested loop
    from kafka2clickhouse_py_streamer_spark.operators.joins import (
        q62_lateral_topn,
    )

    df = q62_lateral_topn(spark, sf_dir)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    # a NON-decorrelated ORDER BY ... LIMIT lateral compiles to a
    # BroadcastNestedLoopJoin, not a CartesianProduct — assert the
    # shape that would actually regress (currently Window + hash join)
    assert "BroadcastNestedLoopJoin" not in plan
    assert python_row_ops(df) == 0


def test_d16_scrub_no_pair_join_linear_explodes(spark, sf_dir):
    # removal must stay linear: spans meet the DUP AGGREGATE (hash
    # agg), never each other — no cartesian, no Python, and the only
    # joins are digest/position equi-joins
    from kafka2clickhouse_py_streamer_spark.llm.dedup import (
        d16_span_scrub,
    )

    df = d16_span_scrub(spark, sf_dir)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert python_row_ops(df) == 0


def test_s14_ivfpq_probe_is_broadcast_equi_join(spark, sf_dir):
    # the full IVF-PQ search: the query side (probe cells + ADC
    # tables) BROADCASTS and meets the coded corpus on a cell
    # equi-join — never a cartesian against the corpus, never a
    # SortMergeJoin of the big side, zero Python
    from kafka2clickhouse_py_streamer_spark.llm.similarity import (
        s14_ivfpq_search,
    )

    df = s14_ivfpq_search(spark, sf_dir)
    plan = formatted_plan(df)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
    assert python_row_ops(df) == 0


def test_s15_truncation_audit_is_labeled_baseline(spark, sf_dir):
    # like s08: every brute-force pass broadcasts the bounded query
    # side (the labeled exact-baseline shape); the recall join is
    # |queries|*k-sized; zero Python anywhere
    from kafka2clickhouse_py_streamer_spark.llm.similarity import (
        s15_mrl_truncation_recall,
    )

    df = s15_mrl_truncation_recall(spark, sf_dir)
    plan = formatted_plan(df)
    assert "BroadcastNestedLoopJoin" in plan  # the labeled baseline cross
    assert python_row_ops(df) == 0


def test_d17_containment_no_pair_materialization(spark, sf_dir):
    # containment reuses d11's capped inverted-index shape: hot
    # shingles are semi-joined away BEFORE the pair join (the round-5
    # verdict's weak item — an uncapped hot shingle in f docs emits f²
    # rows), pairs come from the capped shingle equi-join + count
    # aggregate, and the two directions are a row-local explode of the
    # sized pair, NEVER a second pair join — nothing cartesian or
    # Python anywhere
    from kafka2clickhouse_py_streamer_spark.llm.dedup import (
        MAX_SHINGLE_DF,
        _capped_shingles,
        d17_containment_pairs,
    )

    df = d17_containment_pairs(spark, sf_dir)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert python_row_ops(df) == 0
    # the DF cap runs BEFORE the pair join — pinned on the pre-cut
    # capped frame, because d17's round-13 iter_materialize cut hides
    # the semi-join behind the checkpoint scan in the final plan (the
    # final plan must read that materialization, not re-derive shingles)
    capped = formatted_plan(_capped_shingles(spark, sf_dir, MAX_SHINGLE_DF))
    assert "LeftSemi" in capped
    assert "Scan ExistingRDD" in plan


def test_d17_materialized_input_is_the_capped_frame(
    spark, sf_dir, monkeypatch
):
    # round-13 advice: asserting LeftSemi on a SEPARATELY constructed
    # _capped_shingles frame plus "Scan ExistingRDD" in d17's plan does
    # not prove d17's executed plan applies the DF cap — any
    # materialization satisfies the latter. Spy on iter_materialize:
    # d17 must cut exactly one frame, and that frame's PRE-CUT plan
    # must be the capped inverted index (shingle Generate + the DF-cap
    # LeftSemi), so removing the cap now fails structurally, not just
    # through the oracle value tests.
    import kafka2clickhouse_py_streamer_spark.functions.graph as graph
    from kafka2clickhouse_py_streamer_spark.llm.dedup import (
        d17_containment_pairs,
    )

    captured = []
    orig = graph.iter_materialize

    def spy(df, defer=False):
        captured.append(df)
        return orig(df, defer=defer)

    monkeypatch.setattr(graph, "iter_materialize", spy)
    d17_containment_pairs(spark, sf_dir)  # construction runs the cut
    assert len(captured) == 1
    pre_cut = formatted_plan(captured[0])
    assert "LeftSemi" in pre_cut
    assert "Generate" in pre_cut


def test_t15_buckets_have_no_global_window(spark, sf_dir):
    # CCNet bucketing must be threshold-CASE over broadcast percentile
    # cuts — a global ntile would funnel the corpus through one task.
    # The only SinglePartition is the one-row cuts aggregate.
    from kafka2clickhouse_py_streamer_spark.llm.text import (
        t15_perplexity_buckets,
    )

    df = t15_perplexity_buckets(spark, sf_dir)
    plan = formatted_plan(df)
    assert "Window" not in plan or "ntile" not in plan
    assert python_row_ops(df) == 0


def test_w12_sketch_agg_is_bounded_and_topk_is_heap(spark, sf_dir):
    # the count-min cells aggregate map-side combines to <= k*w rows
    # per partition (partial+final hash agg pair), the probe joins the
    # broadcast sketch, and the top-10 is TakeOrderedAndProject — no
    # |users|-sized global window funnel
    from kafka2clickhouse_py_streamer_spark.streaming.batch_windows import (
        w12_countmin_heavyhitters,
    )

    df = w12_countmin_heavyhitters(spark, sf_dir)
    plan = formatted_plan(df)
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert python_row_ops(df) == 0


def test_w13_histogram_agg_is_bounded(spark, sf_dir):
    # the histogram cells aggregate map-side combines to <= HIST_BINS
    # rows per partition (partial+final hash agg); the cumulative
    # window and the q-join run on the <= 32-row sketch, never the
    # data (the SinglePartition the plan contains is that tiny sketch
    # window plus the one-row total — the data path itself is a pure
    # hash agg); no Python anywhere
    from kafka2clickhouse_py_streamer_spark.streaming.batch_windows import (
        w13_histogram_quantiles,
    )

    df = w13_histogram_quantiles(spark, sf_dir)
    plan = formatted_plan(df)
    assert "partial_count" in plan or "partial" in plan.lower()
    assert "CartesianProduct" not in plan
    assert python_row_ops(df) == 0


def test_t19_heaps_accumulates_per_source_not_globally(spark, sf_dir):
    # the cumulative window partitions by SOURCE (never a global
    # orderBy funnel); the first-seen step is a hash agg over the
    # token explode; the regression is a moment aggregate — no
    # cartesian, no Python
    from kafka2clickhouse_py_streamer_spark.llm.text import t19_heaps_fit

    df = t19_heaps_fit(spark, sf_dir)
    plan = formatted_plan(df)
    assert "hashpartitioning(source" in plan
    assert "CartesianProduct" not in plan
    assert python_row_ops(df) == 0


def test_p19_composition_has_no_funnel(spark, sf_dir):
    # chunk -> fp-dedup -> shard-pack composes as explode +
    # fingerprint-keyed window + shard-keyed window + one fp join —
    # never a SinglePartition funnel, nothing cartesian, no Python
    from kafka2clickhouse_py_streamer_spark.llm.sampling import (
        p19_chunk_dedup_pack,
    )

    df = p19_chunk_dedup_pack(spark, sf_dir)
    plan = formatted_plan(df)
    assert "SinglePartition" not in plan
    assert "CartesianProduct" not in plan
    assert "hashpartitioning(chunk_fp" in plan
    assert "hashpartitioning(shard" in plan
    assert python_row_ops(df) == 0


def test_d20_diff_is_one_join_one_agg(spark, sf_dir):
    # snapshot diff: fingerprints ride the scan projections, ONE
    # full-outer SortMergeJoin on the id, one hash agg on source —
    # no window, no cartesian, no Python, bodies never join
    from kafka2clickhouse_py_streamer_spark.llm.dedup import (
        d20_snapshot_diff,
    )

    df = d20_snapshot_diff(spark, sf_dir)
    plan = formatted_plan(df)
    assert "FullOuter" in plan
    assert "CartesianProduct" not in plan
    assert "Window" not in plan
    assert python_row_ops(df) == 0


def test_p18_manifest_is_one_agg(spark, sf_dir):
    # manifest generation at scan speed: bucket/fingerprint/token
    # count ride the scan projection and ONE hash agg (partial+final)
    # produces the manifest — exactly one exchange, no joins, no
    # window, no Python
    from kafka2clickhouse_py_streamer_spark.llm.sampling import (
        p18_shard_manifest,
    )

    df = p18_shard_manifest(spark, sf_dir)
    plan = formatted_plan(df)
    # one hash-agg exchange + the range exchange of the presentation
    # sort over the <= 3*P18_SHARDS-row manifest
    assert count_exchanges(df) <= 2
    assert "Join" not in plan
    assert "Window" not in plan
    assert python_row_ops(df) == 0


def test_t16_bm25_probes_inverted_list(spark, sf_dir):
    # the query-term isin() filter must reach the token stream BEFORE
    # the tf aggregate (only matching tokens are aggregated), df/stats
    # come back via broadcast, and the top-10 is a heap — no global
    # sort of the scored frame, no Python
    from kafka2clickhouse_py_streamer_spark.llm.text import t16_bm25_topk

    df = t16_bm25_topk(spark, sf_dir)
    plan = formatted_plan(df)
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan
    assert python_row_ops(df) == 0


def test_s16_fusion_is_rank_list_sized(spark, sf_dir):
    # fusion operates on |queries|*k rank lists: the only non-broadcast
    # joins are between the two tiny rank frames; nothing cartesian
    # against the corpus, zero Python
    from kafka2clickhouse_py_streamer_spark.llm.similarity import (
        s16_rrf_fusion,
    )

    df = s16_rrf_fusion(spark, sf_dir)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert python_row_ops(df) == 0


def test_t17_chunking_is_scan_speed(spark, sf_dir):
    # chunking must be row-local arithmetic + one explode: no join, no
    # aggregate, no exchange beyond the presentation sort, no Python —
    # a 100 TB corpus chunks at scan speed
    from kafka2clickhouse_py_streamer_spark.llm.text import (
        t17_chunk_passages,
    )

    df = t17_chunk_passages(spark, sf_dir)
    plan = formatted_plan(df)
    assert count_exchanges(df) <= 1
    assert "Join" not in plan
    assert python_row_ops(df) == 0


def test_d18_bloom_probe_broadcasts_bits_not_shingles(spark, sf_dir):
    # the whole point: the corpus joins a broadcast of the <=1024-row
    # BIT table (and the audit's exact semi-join broadcasts too) — the
    # corpus side never shuffles for the probe, nothing cartesian,
    # zero Python
    from kafka2clickhouse_py_streamer_spark.llm.dedup import (
        d18_bloom_decontamination,
    )

    df = d18_bloom_decontamination(spark, sf_dir)
    plan = formatted_plan(df)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert python_row_ops(df) == 0


def test_m07_phash_bands_never_pair_scan(spark, sf_dir):
    # perceptual near-dup: candidates come from band equi-collisions
    # (never a cross of the media table); the byte->hash projection is
    # JVM-only — no mapInPandas, no Python row ops, nothing cartesian.
    # Width floor (r11, the d06 lesson applied a second time): the
    # 32-bit hash's 8-bit bands saturated at 256 values — the receipt
    # measured band-candidate pairs ~ n^2/128, 99.9x at 10x data. The
    # band-value space must stay >= 2^16 and divide the hash evenly.
    from kafka2clickhouse_py_streamer_spark.llm.multimodal import (
        PHASH_BANDS,
        PHASH_BITS,
        m07_phash_neardup,
    )

    assert PHASH_BITS >= 64
    assert PHASH_BITS % PHASH_BANDS == 0
    assert PHASH_BITS // PHASH_BANDS >= 16

    df = m07_phash_neardup(spark, sf_dir)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "MapInPandas" not in plan
    assert python_row_ops(df) == 0


def test_p15_rebalance_touches_corpus_twice(spark, sf_dir):
    # the rebalance reads the corpus for one MD5-key dedup window and
    # two |sources|-row aggregates; the alpha normalization works on
    # broadcast one-row totals — no cartesian against the corpus, no
    # SinglePartition beyond the one-row totals, no Python
    from kafka2clickhouse_py_streamer_spark.llm.sampling import (
        p15_dedup_rebalance,
    )

    df = p15_dedup_rebalance(spark, sf_dir)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert python_row_ops(df) == 0


def test_s17_sweep_scores_candidates_once(spark, sf_dir):
    # the nprobe sweep builds ONE scored candidate frame (cell-join
    # against the broadcast probe ranks) and derives every tier from
    # it — no cartesian against the corpus, no SortMergeJoin of the
    # coded side, no Python
    from kafka2clickhouse_py_streamer_spark.llm.similarity import (
        s17_probe_recall_sweep,
    )

    df = s17_probe_recall_sweep(spark, sf_dir)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert python_row_ops(df) == 0


def test_t18_novelty_is_two_aggs_one_join(spark, sf_dir):
    # first-occurrence is a count-only hash agg on the digest (d12's
    # class — no pair join anywhere); the per-doc fraction is one
    # equi-join + one more agg. Nothing cartesian, zero Python.
    from kafka2clickhouse_py_streamer_spark.llm.text import (
        t18_ngram_novelty,
    )

    df = t18_ngram_novelty(spark, sf_dir)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert python_row_ops(df) == 0


def test_s18_label_eval_rides_the_graph(spark, sf_dir):
    # the eval must add only equi-joins and keyed aggs on top of the
    # s09 graph — nothing cartesian, no Python anywhere
    from kafka2clickhouse_py_streamer_spark.llm.similarity import (
        s18_knn_label_eval,
    )

    df = s18_knn_label_eval(spark, sf_dir)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert python_row_ops(df) == 0


def test_q63_forward_asof_is_join_free(spark, sf_dir):
    # the reversed union-sort carry: ONE hash shuffle on the key, a
    # running window, and NO join operator — per-key fan-out stays
    # linear where the join+rn twin materializes every pair
    from kafka2clickhouse_py_streamer_spark.operators.joins import (
        q63_forward_asof,
    )

    df = q63_forward_asof(spark, sf_dir)
    plan = formatted_plan(df)
    assert "Join" not in plan
    assert python_row_ops(df) == 0


def test_d19_calibration_rides_the_band_join(spark, sf_dir):
    # calibration adds signature joins + row-local direction explode
    # on top of d03's candidate machinery — nothing cartesian, no
    # Python
    from kafka2clickhouse_py_streamer_spark.llm.dedup import (
        d19_containment_calibration,
    )

    df = d19_containment_calibration(spark, sf_dir)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert python_row_ops(df) == 0


def test_p16_audit_is_one_agg_over_p03(spark, sf_dir):
    # the audit adds a pack-keyed window + one hash agg on top of
    # p03's two-pass packing — still no SinglePartition funnel, no
    # cartesian, no Python
    from kafka2clickhouse_py_streamer_spark.llm.sampling import (
        p16_pack_efficiency,
    )

    df = p16_pack_efficiency(spark, sf_dir)
    plan = formatted_plan(df)
    assert "SinglePartition" not in plan
    assert "CartesianProduct" not in plan
    assert python_row_ops(df) == 0


def test_p17_chunk_pack_no_global_funnel(spark, sf_dir):
    # the chunk->pack composition windows PER SHARD (hash partition on
    # the shard key) — a shard writer wants one contiguous stream per
    # shard, and a global window would put the whole corpus on one
    # task; chunking itself is explode-only, join-free, Python-free
    from kafka2clickhouse_py_streamer_spark.llm.sampling import (
        p17_chunk_pack,
    )

    df = p17_chunk_pack(spark, sf_dir)
    plan = formatted_plan(df)
    assert "SinglePartition" not in plan
    assert "CartesianProduct" not in plan
    assert "hashpartitioning(shard" in plan
    assert python_row_ops(df) == 0


def test_t20_funnel_is_one_scan_one_agg(spark, sf_dir):
    # the whole rule cascade rides the scan projection; the only
    # shuffle is the hash agg on source (plus the orderBy range
    # exchange on the <=|sources|*6-row aggregate); the stack()
    # unpivot runs post-agg, so nothing per-document crosses the wire
    from kafka2clickhouse_py_streamer_spark.llm.text import (
        t20_gopher_funnel,
    )

    df = t20_gopher_funnel(spark, sf_dir)
    plan = formatted_plan(df)
    assert "Join" not in plan
    assert "CartesianProduct" not in plan
    assert count_exchanges(df) <= 2  # source hash agg + final sort
    assert python_row_ops(df) == 0


def test_q64_weighted_quantiles_one_hash_shuffle(spark, sf_dir):
    # the cumulative window, the total-window, and the final agg all
    # run on the same l_returnflag hash partitioning — one hash
    # exchange total (plus the final <=|flags|-row orderBy); no join
    from kafka2clickhouse_py_streamer_spark.operators.statistics import (
        q64_weighted_quantiles,
    )

    df = q64_weighted_quantiles(spark, sf_dir)
    plan = formatted_plan(df)
    assert "Join" not in plan
    assert count_exchanges(df) <= 2
    assert python_row_ops(df) == 0


def test_s19_cascade_full_dim_never_scans_corpus(spark, sf_dir):
    # the full-dim rerank must reach the corpus only through the
    # broadcast shortlist hash join — the sole nested-loop joins are
    # the two sanctioned broadcast query-side crosses (stage 1 + the
    # s01 ground truth); rerank + audit are BroadcastHashJoins
    from kafka2clickhouse_py_streamer_spark.llm.similarity import (
        s19_cascade_rerank,
    )

    import re

    df = s19_cascade_rerank(spark, sf_dir)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    # formatted explain renders every node twice (tree + detail);
    # count the numbered detail entries only
    assert len(re.findall(r"\(\d+\) BroadcastNestedLoopJoin", plan)) <= 2
    assert "BroadcastHashJoin" in plan
    assert python_row_ops(df) == 0


def test_p20_epoch_budget_scans_corpus_once(spark, sf_dir):
    # the corpus collapses to |sources| rows in ONE hash agg and is
    # scanned exactly once — the normalization totals are windows over
    # the tiny aggregate, not broadcast-cross re-computations (which
    # would re-scan the corpus per consumer subtree); no join anywhere
    import re

    from kafka2clickhouse_py_streamer_spark.llm.sampling import (
        p20_epoch_budget,
    )

    df = p20_epoch_budget(spark, sf_dir)
    plan = formatted_plan(df)
    assert "Join" not in plan
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1
    # source hash agg + tiny-frame window SinglePartition + final sort
    assert count_exchanges(df) <= 3
    assert python_row_ops(df) == 0


def test_d21_softdedup_is_policy_layer_only(spark, sf_dir):
    # soft weights must ride the d07 labels: no pair join, no Python.
    # Round 14: cluster_size is a window COUNT over the label key (one
    # cluster_id exchange) instead of groupBy + join-back — the pin
    # moves from "no window" to "the window stays KEYED": what the old
    # assertion actually guarded was a partition-less window funnelling
    # the corpus through one task.
    from kafka2clickhouse_py_streamer_spark.llm.dedup import (
        d21_softdedup_weights,
    )

    df = d21_softdedup_weights(spark, sf_dir)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "windowspecdefinition(cluster_id" in plan
    assert "SinglePartition" not in plan
    assert python_row_ops(df) == 0


def test_w14_decayed_rate_bounds_broadcast_one_agg(spark, sf_dir):
    # the reference instant arrives via a one-row broadcast (q54's
    # global-bounds pattern) — no SinglePartition window over the
    # events table; the decayed mass is one hash agg, Python-free
    from kafka2clickhouse_py_streamer_spark.streaming.batch_windows import (
        w14_decayed_rate,
    )

    df = w14_decayed_rate(spark, sf_dir)
    plan = formatted_plan(df)
    assert "Window" not in plan
    assert "CartesianProduct" not in plan
    # event_type hash agg + final sort + the bounds agg's final merge
    # (a SinglePartition exchange over |partitions| partial-max rows,
    # not the fact table)
    assert count_exchanges(df) <= 3
    assert python_row_ops(df) == 0


def test_s20_staleness_audit_is_one_corpus_pass(spark, sf_dir):
    # snapshot-trained centroids are broadcast literals; assignment +
    # the conditional split ride one corpus scan into ONE cell hash
    # agg; share totals are windows over the <=K-row per-cell frame —
    # no join, no second corpus scan, no Python
    import re

    from kafka2clickhouse_py_streamer_spark.llm.similarity import (
        s20_index_staleness,
    )

    df = s20_index_staleness(spark, sf_dir)
    plan = formatted_plan(df)
    assert "Join" not in plan
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1
    assert python_row_ops(df) == 0


def test_p21_leakage_caps_df_before_the_train_join(spark, sf_dir):
    # the DF cap must run as a semi-join BEFORE the eval-vs-train
    # shingle join (the d17 lesson: boilerplate shingles are the hot
    # keys of the both-sides-large join); nothing cartesian, no Python
    from kafka2clickhouse_py_streamer_spark.llm.sampling import (
        p21_split_leakage,
    )

    df = p21_split_leakage(spark, sf_dir)
    plan = formatted_plan(df)
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert python_row_ops(df) == 0


def test_d23_closure_is_broadcast_joins_and_one_agg(spark, sf_dir):
    # takedown closure: tiny request-cluster set broadcast onto the
    # labels, one source agg — no pair join, no window, no Python
    from kafka2clickhouse_py_streamer_spark.llm.dedup import (
        d23_removal_propagation,
    )

    df = d23_removal_propagation(spark, sf_dir)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Window" not in plan
    assert python_row_ops(df) == 0


def test_s21_filter_is_in_the_probe_join(spark, sf_dir):
    # the tenant predicate rides the candidate EQUI-join (cell AND
    # label keys) — no cross join anywhere (ground truth is a label
    # equi-join with the 10-row query side broadcast), no Python
    from kafka2clickhouse_py_streamer_spark.llm.similarity import (
        s21_filtered_search,
    )

    df = s21_filtered_search(spark, sf_dir)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert python_row_ops(df) == 0


def test_d22_roi_is_two_aggs_over_labels(spark, sf_dir):
    # ROI = the d21 policy-layer class: one equi-join of labels to
    # token counts, a cluster_id hash agg, then a <=log2(max size)
    # bucket agg — no pair join, no window, no Python
    from kafka2clickhouse_py_streamer_spark.llm.dedup import d22_dedup_roi

    df = d22_dedup_roi(spark, sf_dir)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Window" not in plan
    assert python_row_ops(df) == 0


def test_w15_hll_register_agg_is_bounded(spark, sf_dir):
    # the register sketch is hash aggs whose output is bounded by
    # |scopes|*256 rows (map-side combinable) and the estimate math
    # runs on that frame, never the events table; the exact-distinct
    # audit is one more hash agg. No window over the fact table, no
    # cartesian, zero Python
    from kafka2clickhouse_py_streamer_spark.streaming.batch_windows import (
        w15_hll_distinct,
    )

    df = w15_hll_distinct(spark, sf_dir)
    plan = formatted_plan(df)
    assert "Window" not in plan
    assert "CartesianProduct" not in plan
    assert python_row_ops(df) == 0


def test_s22_khop_is_equi_joins_only(spark, sf_dir):
    # the unrolled BFS is hash equi-joins (frontier x edges) and
    # anti-joins against the reached set — no cartesian, no window
    # over the corpus, zero Python
    from kafka2clickhouse_py_streamer_spark.llm.similarity import (
        s22_khop_expansion,
    )

    df = s22_khop_expansion(spark, sf_dir)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert python_row_ops(df) == 0


def test_q65_window_runs_on_grid_not_facts(spark, sf_dir):
    # the running-sum window and the left join operate on the
    # (type, hour) grid / (type, user) first-seen frames — the only
    # fact-table operators are two hash aggs and a distinct; nothing
    # cartesian, zero Python
    from kafka2clickhouse_py_streamer_spark.operators.windows import (
        q65_running_distinct,
    )

    df = q65_running_distinct(spark, sf_dir)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert python_row_ops(df) == 0


def test_t21_keywords_window_over_doc_vocab(spark, sf_dir):
    # df re-aggregates the (doc, token) frame; the scalar corpus size
    # is a one-row broadcast; the top-k window partitions by doc_id —
    # no cartesian beyond the broadcast scalar, zero Python
    from kafka2clickhouse_py_streamer_spark.llm.text import (
        t21_tfidf_keywords,
    )

    df = t21_tfidf_keywords(spark, sf_dir)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert python_row_ops(df) == 0


def test_d24_editdist_candidates_from_band_join(spark, sf_dir):
    # fuzzy verify runs over banded-LSH candidates: the plan must be
    # all hash equi-joins (band join + two doc-side joins) with the
    # Levenshtein DP as a JVM expression — never a cartesian pair
    # enumeration, zero Python
    from kafka2clickhouse_py_streamer_spark.llm.dedup import (
        d24_editdist_neardup,
    )

    df = d24_editdist_neardup(spark, sf_dir)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "levenshtein" in plan
    assert python_row_ops(df) == 0


def test_p23_weighted_sample_is_take_ordered(spark, sf_dir):
    # A-ES top-k must be TakeOrderedAndProject (per-partition heaps +
    # k-row driver merge) — never a global sort of the keyed corpus;
    # the rank window runs on the k-row result only
    from kafka2clickhouse_py_streamer_spark.llm.sampling import (
        p23_weighted_sample,
    )

    df = p23_weighted_sample(spark, sf_dir)
    plan = formatted_plan(df)
    assert "TakeOrderedAndProject" in plan
    assert python_row_ops(df) == 0


def test_q66_profile_is_one_scan_expand(spark, sf_dir):
    # every column's stats come from ONE scan: the multi-distinct
    # lowers to a single Expand-based aggregate, not per-column passes
    from kafka2clickhouse_py_streamer_spark.operators.statistics import (
        q66_table_profile,
    )

    df = q66_table_profile(spark, sf_dir)
    plan = formatted_plan(df)
    assert len(read_schema_columns(df)) == 1  # one parquet scan
    assert "Expand" in plan
    assert python_row_ops(df) == 0


def test_s24_triangles_equi_joins_only(spark, sf_dir):
    # the wedge join and the closing-edge join are hash equi-joins on
    # node ids; a cartesian/nested-loop anywhere is the sum-deg²
    # blowup degree-ordering exists to avoid
    from kafka2clickhouse_py_streamer_spark.llm.similarity import (
        s24_triangle_count,
    )

    df = s24_triangle_count(spark, sf_dir)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert python_row_ops(df) == 0


def test_t23_pairs_generated_in_scan_not_self_join(spark, sf_dir):
    # co-occurring pairs come from the nested array transform inside
    # the scan projection — ONE explode, never a positional self-join
    # of the token stream; the totals are a one-row broadcast
    from kafka2clickhouse_py_streamer_spark.llm.text import (
        t23_pmi_collocations,
    )

    df = t23_pmi_collocations(spark, sf_dir)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan
    assert python_row_ops(df) == 0
    # the only scanned column is text: every consumer of the token
    # subtree (pair counts, both vocab joins, the totals) re-derives
    # the SAME pruned scan — a positional self-join would need ids
    for cols in read_schema_columns(df):
        assert cols == ["text"]


def test_q67_sequence_is_one_hash_agg_no_window(spark, sf_dir):
    # the journey string is built by ONE user-keyed hash agg (collect +
    # in-array sort) — no per-user window sort, no join, zero Python;
    # regexes run on the aggregated |users|-row frame
    from kafka2clickhouse_py_streamer_spark.operators.windows import (
        q67_sequence_match,
    )

    df = q67_sequence_match(spark, sf_dir)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert plan.count("Window") == 0
    assert count_exchanges(df) <= 2  # agg hash + orderBy range
    assert python_row_ops(df) == 0


def test_w16_profile_sketch_stays_aggregated(spark, sf_dir):
    # the register build is stack -> hash agg (map-side combine to
    # <= |cols|*256 rows per partition); joins run on the tiny
    # per-scope frames; nothing cartesian beyond broadcastable
    # one-row legs, zero Python
    from kafka2clickhouse_py_streamer_spark.streaming.batch_windows import (
        w16_profile_sketch,
    )

    df = w16_profile_sketch(spark, sf_dir)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert python_row_ops(df) == 0


def test_q68_coverage_single_keyed_shuffle(spark, sf_dir):
    # both windows, the island agg, and the per-user agg all reuse the
    # ONE user_id hash partitioning; never a global sort or a
    # SinglePartition funnel
    from kafka2clickhouse_py_streamer_spark.operators.windows import (
        q68_interval_coverage,
    )

    df = q68_interval_coverage(spark, sf_dir)
    plan = formatted_plan(df)
    assert "SinglePartition" not in plan
    assert "CartesianProduct" not in plan
    assert count_exchanges(df) <= 2  # user hash + final orderBy range
    assert python_row_ops(df) == 0


def test_p24_shard_balance_never_single_partition(spark, sf_dir):
    # sorted_rr's global rank must be the distributed two-pass offsets
    # — no SinglePartition window over the corpus; the total is a
    # one-row broadcast
    from kafka2clickhouse_py_streamer_spark.llm.sampling import (
        p24_shard_balance,
    )

    df = p24_shard_balance(spark, sf_dir)
    plan = formatted_plan(df)
    # exactly one SinglePartition is allowed: the one-row corpus-total
    # scalar aggregate's final merge (distributed partials, 1 row per
    # partition) — the RANK must come from the two-pass offsets, so no
    # second funnel may appear
    assert plan.count("SinglePartition") <= 1
    assert "CartesianProduct" not in plan
    assert python_row_ops(df) == 0


def test_d25_tuner_is_broadcast_cross_no_cartesian(spark, sf_dir):
    # the 5-row layout table rides a broadcast cross join; pairs come
    # from the band equi-join — nothing unbroadcast-cartesian, zero
    # Python
    from kafka2clickhouse_py_streamer_spark.llm.dedup import (
        d25_lsh_layout_tuner,
    )

    df = d25_lsh_layout_tuner(spark, sf_dir)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert python_row_ops(df) == 0


def test_s25_radius_needs_no_window(spark, sf_dir):
    # a radius query has no rank: the plan must contain ZERO Window
    # operators (the threshold filter replaces the per-query sort) and
    # nothing unbroadcast-cartesian
    from kafka2clickhouse_py_streamer_spark.llm.similarity import (
        s25_radius_search,
    )

    df = s25_radius_search(spark, sf_dir)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert python_row_ops(df) == 0


def test_strip_cached_subtrees_on_crafted_plan():
    """Unit-pin the cached-subtree stripper every shuffle-count pin now
    rides on: the InMemoryRelation subtree (tree lines AND detail
    blocks, including the AQE Initial/Final duplicates) must vanish;
    live nodes — including the InMemoryTableScan leaf itself and a
    post-cache Exchange — must survive."""
    from kafka2clickhouse_py_streamer_spark.plans import (
        strip_cached_subtrees,
    )

    plan = "\n".join([
        "== Physical Plan ==",
        "AdaptiveSparkPlan (9)",
        "+- Window (8)",
        "   +- Exchange (7)",
        "      +- BroadcastHashJoin Inner BuildRight (6)",
        "         :- Filter (5)",
        "         :  +- InMemoryTableScan (1) (columnarIn=false)",
        "         :        +- InMemoryRelation (2)",
        "         :              +- AdaptiveSparkPlan (4)",
        "                           +- == Final Plan ==",
        "                              +- Exchange (3)",
        "         +- BroadcastExchange (10)",
        "",
        "",
        "(1) InMemoryTableScan",
        "Output [1]: [x#1L]",
        "",
        "(2) InMemoryRelation",
        "Arguments: [x#1L], StorageLevel(disk, 2 replicas)",
        "",
        "(3) Exchange",
        "Input [1]: [x#1L]",
        "Arguments: rangepartitioning(x#1L ASC NULLS FIRST, 32),"
        " REPARTITION_BY_NUM, [plan_id=57]",
        "",
        "(4) AdaptiveSparkPlan",
        "Arguments: isFinalPlan=true",
        "",
        "(5) Filter",
        "Condition : isnotnull(x#1L)",
        "",
        "(7) Exchange",
        "Input [1]: [x#1L]",
        "Arguments: hashpartitioning(x#1L, 32), ENSURE_REQUIREMENTS,"
        " [plan_id=99]",
        "",
    ])
    import re

    live = strip_cached_subtrees(plan)
    # cached subtree gone: node ids 2/3/4 and the range exchange
    assert "InMemoryRelation" not in live
    assert "(3) Exchange" not in live
    assert "rangepartitioning" not in live
    assert "isFinalPlan" not in live
    # live nodes intact: the cache-reading leaf, its filter, and the
    # post-cache shuffle
    assert "InMemoryTableScan (1)" in live
    assert "(1) InMemoryTableScan" in live
    assert "(5) Filter" in live
    assert "(7) Exchange" in live
    assert "hashpartitioning" in live
    # exactly the per-run exchange remains countable
    found = re.findall(
        r"\(\d+\) Exchange\s*\nInput[^\n]*\n"
        r"Arguments: (?:hashpartitioning|rangepartitioning|"
        r"SinglePartition)",
        live,
    )
    assert len(found) == 1


def test_s09_plane_count_is_scale_derived(spark, sf_dir):
    # r12 (the hamming-core lesson applied to the hyperplane family):
    # the plane count is DERIVED code, not a constant. Pins
    # (1) the floor/cap/occupancy invariant of planes_for,
    # (2) the prefix-closure the oracle SQL's masking depends on
    #     (q-plane bucket == MAX-plane bucket & (2^q - 1)),
    # (3) the SQL indicator-sum twin deriving the identical count.
    import duckdb
    from pyspark.sql import functions as F

    from kafka2clickhouse_py_streamer_spark.llm.similarity import (
        MAX_PLANES,
        MIN_PLANES,
        TARGET_OCCUPANCY,
        _base,
        _bucket_expr,
        _planes_sql,
        planes_for,
    )

    # (1) floor at fixture scale, occupancy bound until the cap,
    # monotone in N
    assert planes_for(0) == MIN_PLANES
    assert planes_for(TARGET_OCCUPANCY << MIN_PLANES) == MIN_PLANES
    prev = MIN_PLANES
    for n in (1, 500, 2_000, 20_000, 200_000, 2_000_000, 10**9, 10**12):
        p = planes_for(n)
        assert MIN_PLANES <= p <= MAX_PLANES
        assert p >= prev or n < 500  # monotone over the ladder
        prev = max(prev, p)
        if p < MAX_PLANES:
            assert n <= TARGET_OCCUPANCY << p  # occupancy holds
        if p > MIN_PLANES:
            assert n > TARGET_OCCUPANCY << (p - 1)  # and is tight
    assert planes_for(200_000) == 13  # the RECEIPT_SF10 scale
    assert planes_for(10**12) == MAX_PLANES

    # (2) prefix closure on real vectors: masking the MAX-plane bucket
    # to q bits reproduces the q-plane bucket exactly
    base = _base(spark, sf_dir).limit(64)
    for q in (MIN_PLANES, 7):
        bad = (
            base.select(
                _bucket_expr(q).alias("direct"),
                _bucket_expr(MAX_PLANES)
                .bitwiseAND(F.lit((1 << q) - 1))
                .alias("masked"),
            )
            .filter(F.col("direct") != F.col("masked"))
            .count()
        )
        assert bad == 0, f"prefix closure broken at q={q}"

    # (3) the static SQL derives the same count from the same COUNT(*)
    # (both engines count the RAW embeddings table: metadata-cheap on
    # the Spark side, where the filtered count would scan the
    # embedding column)
    con = duckdb.connect()
    for n in (0, 500, 512, 513, 2_000, 200_000, 10**9):
        con.execute("CREATE OR REPLACE TABLE embeddings AS "
                    f"SELECT * FROM range({max(n, 0)})")
        got = con.execute(_planes_sql()).fetchone()[0]
        assert got == planes_for(n), (n, got, planes_for(n))


def test_derived_planes_counts_once_per_session_dir(spark, sf_dir):
    """r12 verdict What's-wrong #4: derived_planes launched its COUNT
    job on EVERY call, so s02/s03/s09/d15 each paid ~0.2-0.5 s per
    invocation. It is now cached per (applicationId, sf_dir) — the
    _CENTROID_CACHE pattern. Pin: one table() lookup (i.e. one COUNT
    job) per (session, sf_dir); a second sf_dir pays its own count;
    repeat calls on either are served from the cache."""
    from kafka2clickhouse_py_streamer_spark.llm import similarity as sim

    calls = []
    real_table = sim.table

    def counting_table(sp, d, name):
        calls.append((d, name))
        return real_table(sp, d, name)

    saved_cache = dict(sim._PLANES_CACHE)
    sim._PLANES_CACHE.clear()
    sim.table = counting_table
    try:
        p1 = sim.derived_planes(spark, sf_dir)
        p2 = sim.derived_planes(spark, sf_dir)
        assert p1 == p2
        assert len(calls) == 1, calls
        other = "/root/testdata/sf0.001"
        sim.derived_planes(spark, other)
        assert len(calls) == 2, calls
        sim.derived_planes(spark, other)
        assert len(calls) == 2, calls
    finally:
        sim.table = real_table
        sim._PLANES_CACHE.clear()
        sim._PLANES_CACHE.update(saved_cache)
