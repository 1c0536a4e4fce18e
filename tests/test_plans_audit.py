"""Physical-plan audits (SURVEY.md §4): the optimizations the MapReduce
reference hand-codes must actually appear in our executed plans —
predicate pushdown, column pruning, broadcast joins, partial aggregation,
whole-stage codegen, top-k as TakeOrdered."""

from __future__ import annotations

import re

from cbde_mapreduce_spark.plans import REGISTRY


def _executed_plan(df) -> str:
    df.collect()  # finalize AQE so the plan string is the executed one
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized_plan(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_q1_pushdown_pruning_partial_agg(spark, sf_oracle):
    df = REGISTRY["q1_pricing_summary"].fn(spark, sf_oracle)
    plan = _executed_plan(df)
    # filter reaches the parquet scan
    assert "PushedFilters: [" in plan and "l_shipdate" in plan.split("PushedFilters")[1][:200]
    # column pruning: ReadSchema carries only referenced columns
    read_schema = plan.split("ReadSchema: ")[1].split("\n")[0]
    assert "l_orderkey" not in read_schema and "l_suppkey" not in read_schema
    # the combiner: partial_ aggregate functions before the shuffle
    assert "partial_sum" in plan or "partial_" in plan
    # whole-stage codegen spans render as "*(n)" operator prefixes
    assert "*(" in plan


def test_q5_broadcasts_small_dims(spark, sf_oracle):
    df = REGISTRY["q5_local_supplier"].fn(spark, sf_oracle)
    plan = _executed_plan(df)
    # every join in the star resolves to broadcast-hash at this scale;
    # the probe chain stays shuffle-free on the fact side
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 4


def test_top50_is_take_ordered(spark, sf_oracle):
    df = REGISTRY["top50_parts_ranked"].fn(spark, sf_oracle)
    plan = _executed_plan(df)
    assert "TakeOrderedAndProject" in plan


def test_filter_project_never_shuffles(spark, sf_oracle):
    df = REGISTRY["filter_project_orders"].fn(spark, sf_oracle)
    plan = _executed_plan(df)
    assert "Exchange" not in plan, "pure filter/project must be shuffle-free"


def test_semi_join_prunes_right_payload(spark, sf_oracle):
    df = REGISTRY["semi_join_active_customers"].fn(spark, sf_oracle)
    plan = _executed_plan(df)
    assert "LeftSemi" in plan
    # only the join key (+ pushed filter column) is read from orders
    orders_scans = [
        seg.split("\n")[0]
        for seg in plan.split("FileScan parquet ")[1:]
        if "orders.parquet" in seg.split("\n")[0] or "o_custkey" in seg.split("\n")[0]
    ]
    assert orders_scans
    assert all("o_orderpriority" not in line for line in orders_scans)


def test_wordcount_partial_aggregates(spark, sf_oracle):
    df = REGISTRY["wordcount_documents"].fn(spark, sf_oracle)
    plan = _executed_plan(df)
    assert "partial_count" in plan, "map-side combine missing"


def test_exact_dedup_groups_on_hash_not_text(spark, sf_oracle):
    plan = _optimized_plan(REGISTRY["dedup_exact_keep_first"].fn(spark, sf_oracle))
    assert "md5" in plan


def test_asof_join_is_join_free_single_window_shuffle(spark, sf_oracle):
    """The as-of algorithm is union+window: no join operator anywhere, and
    the window runs off one hash partitioning on the entity key — never a
    row-multiplying range join."""
    df = REGISTRY["asof_join_purchase_click"].fn(spark, sf_oracle)
    plan = _executed_plan(df)
    assert "Join" not in plan, "asof must not plan any join"
    assert "Window" in plan
    assert "hashpartitioning(user_id" in plan


def test_salted_agg_is_two_phase(spark, sf_oracle):
    """Salted aggregation: phase-1 groups on (keys, salt), phase-2 merges —
    visible as two aggregate levels over distinct groupings."""
    df = REGISTRY["salted_agg_event_types"].fn(spark, sf_oracle)
    plan = _executed_plan(df)
    assert "__salt" in plan
    assert plan.count("HashAggregate") >= 4  # partial+final for each phase


def test_q7_star_broadcasts_dims_fact_shuffles_on_keys(spark, sf_oracle):
    """Q7's six-table star: dimensions resolve to broadcast-hash joins; no
    sort-merge join anywhere at this scale; the nation-pair predicate must
    not force a cartesian."""
    df = REGISTRY["q7_nation_volume"].fn(spark, sf_oracle)
    plan = _executed_plan(df)
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 3
    assert "partial_sum" in plan


def test_q13_left_join_then_two_level_agg(spark, sf_oracle):
    """Q13: the zero-order customers survive (LeftOuter) and both aggregation
    levels combine map-side."""
    df = REGISTRY["q13_order_distribution"].fn(spark, sf_oracle)
    plan = _executed_plan(df)
    assert "LeftOuter" in plan
    assert "partial_count" in plan


def test_q15_max_subquery_stays_distributed(spark, sf_oracle):
    """Q15's max-revenue selection is a window over the aggregate — the plan
    must contain the Window operator, not a collected literal."""
    df = REGISTRY["q15_top_supplier"].fn(spark, sf_oracle)
    plan = _executed_plan(df)
    assert "Window" in plan
    assert "partial_sum" in plan


def test_q17_correlated_avg_decorrelates_to_aggregate_join(spark, sf_oracle):
    """Catalyst must rewrite the correlated scalar subquery into an
    aggregate + join — no per-row subquery execution."""
    df = REGISTRY["q17_small_quantity_revenue"].fn(spark, sf_oracle)
    plan = _executed_plan(df)
    # decisive check: in the final (AQE) plan, lineitem is scanned a bounded
    # number of times (once per side of the aggregate-join), not per row
    final = plan.split("== Initial Plan ==")[0]
    assert "Join" in final and "avg" in final
    assert 1 <= final.count("FileScan parquet") <= 2


def test_runtime_bloom_filter_prunes_fact_side(spark, sf_oracle):
    """Selective dimension filters inject a runtime bloom filter on the fact
    side of a shuffle join (the semi-join pushdown a 100 TB star schema
    needs). Thresholds are tuned down because the fixture is tiny; at
    cluster scale the defaults (10 MB creation side) trigger on their own."""
    from pyspark.sql import functions as F

    from cbde_mapreduce_spark.sources import load_table

    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "10GB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force the shuffle join
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = load_table(spark, sf_oracle, "lineitem")
        o = load_table(spark, sf_oracle, "orders").filter(
            F.col("o_totalprice") > 450000
        )
        j = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter_agg" in plan or "BloomFilter" in plan
        assert "might_contain" in plan  # the fact-side application
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_decontaminate_broadcasts_benchmark_ngrams(spark, sf_oracle):
    """The benchmark n-gram set is broadcast; corpus bodies never shuffle."""
    df = REGISTRY["decontaminate_docs"].fn(spark, sf_oracle)
    plan = _executed_plan(df)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_domain_mix_broadcasts_rate_table(spark, sf_oracle):
    df = REGISTRY["domain_mix_sample"].fn(spark, sf_oracle)
    plan = _executed_plan(df)
    assert "BroadcastHashJoin" in plan
    assert "partial_" in plan  # map-side combine on the per-source counts


def test_repetition_ratio_partial_aggs_no_join(spark, sf_oracle):
    df = REGISTRY["repetition_ratio_docs"].fn(spark, sf_oracle)
    plan = _executed_plan(df)
    assert "Join" not in plan
    assert "partial_" in plan


def test_pack_sequences_no_single_partition_stage(spark, sf_oracle):
    """Sequence packing must use the distributed prefix sum end-to-end."""
    df = REGISTRY["pack_sequences_chunked"].fn(spark, sf_oracle)
    plan = _executed_plan(df)
    assert "SinglePartition" not in plan, plan


def test_salted_join_widens_key_and_hides_salt(spark, sf_oracle):
    """The salted join must actually join on (key, salt) — fanning hot keys
    over n_salts partitions — while the salt never reaches the output."""
    df = REGISTRY["salted_join_order_priority"].fn(spark, sf_oracle)
    plan = _executed_plan(df)
    assert "__salt" in plan
    assert "__salt" not in df.columns


def test_binned_range_join_is_equi_not_nested_loop(spark, sf_oracle):
    """The bin-bucketing rewrite must plan as a hash/sort-merge EQUI join on
    bin — never the BroadcastNestedLoopJoin a raw range predicate forces."""
    df = REGISTRY["binned_range_join_orders"].fn(spark, sf_oracle)
    plan = _executed_plan(df)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan) or (
        "BroadcastHashJoin" in plan
    )


def test_token_entropy_partial_aggregates(spark, sf_oracle):
    """Both aggregation levels (token counts, per-doc sums) must partial-
    aggregate map-side before their shuffles."""
    df = REGISTRY["token_entropy_docs"].fn(spark, sf_oracle)
    plan = _executed_plan(df)
    assert "partial_count" in plan or "partial_" in plan
    assert "*(" in plan  # stays inside whole-stage codegen


def test_triangle_count_no_cartesian(spark, sf_oracle):
    """Wedge closure is two equi joins on edge endpoints; the n² supplier
    cross product must never materialize."""
    df = REGISTRY["triangle_count_cosupplier"].fn(spark, sf_oracle)
    plan = _executed_plan(df)
    assert "CartesianProduct" not in plan


def test_scd2_two_windows_one_exchange(spark, sf_oracle):
    """Both window passes partition on o_custkey — the second must reuse the
    first's shuffle+sort, leaving exactly one exchange in the plan."""
    df = REGISTRY["scd2_customer_status"].fn(spark, sf_oracle)
    # AQE plan strings append the pre-adaptive "Initial Plan" copy — count
    # exchanges in the final plan section only.
    plan = _executed_plan(df).split("== Initial Plan ==")[0]
    assert plan.count("Exchange") == 1, plan


def test_global_rank_no_single_partition(spark, sf_oracle):
    """The distributed global rank must never collapse to one partition —
    no SinglePartition exchange, unlike the naive global window."""
    df = REGISTRY["global_rank_prefix_orders"].fn(spark, sf_oracle)
    plan = _executed_plan(df)
    assert "SinglePartition" not in plan, plan


def test_lateral_decorrelates_to_window_group_limit(spark, sf_oracle):
    """The correlated LATERAL (ORDER BY + LIMIT) subquery must decorrelate
    to a rank-over-partition with partial WindowGroupLimit pushdown — never
    a per-outer-row rescan (BroadcastNestedLoopJoin/CartesianProduct)."""
    df = REGISTRY["lateral_top_customers_per_nation"].fn(spark, sf_oracle)
    plan = _executed_plan(df)
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    assert "WindowGroupLimit" in plan  # rank-limit pushed below the shuffle
    assert "row_number()" in plan


def test_window_dedup_rank_limit_pushdown(spark, sf_oracle):
    """Keep-first-per-bucket dedup compiles to WindowGroupLimit with a
    PARTIAL phase before the shuffle — per-partition top-1 pre-pruning, so
    the exchange moves at most one row per (key, bucket) per partition."""
    df = REGISTRY["window_dedup_events"].fn(spark, sf_oracle)
    plan = _executed_plan(df)
    assert "WindowGroupLimit" in plan and "Partial" in plan


def test_corpus_prep_pipeline_fused(spark, sf_oracle):
    """The composed corpus-prep pipeline (quality gate -> dedup -> split ->
    accounting) must stay ONE plan: the quality filter reaches the parquet
    scan, the dedup's keep-first compiles to WindowGroupLimit, and no join
    or per-stage materialization appears anywhere."""
    df = REGISTRY["corpus_prep_pipeline"].fn(spark, sf_oracle)
    plan = _executed_plan(df)
    assert "n_chars" in plan.split("DataFilters: [")[1][:120]  # gate at the scan
    assert "WindowGroupLimit" in plan  # dedup keep-first pre-pruned
    assert "Join" not in plan and "CartesianProduct" not in plan


def test_maxsim_sharded_broadcasts_only_role_table(spark, sf_oracle):
    """The sharded MaxSim path must never broadcast or collect the vector
    set: the only broadcast is the tiny (block, shard, role) routing table,
    and per-block scoring runs as grouped Arrow kernels."""
    df = REGISTRY["maxsim_label_sharded"].fn(spark, sf_oracle)
    plan = _executed_plan(df)
    assert "FlatMapGroupsInPandas" in plan  # block kernels, not a pair join
    for section in plan.split("BroadcastExchange")[1:]:
        # inspect what feeds each broadcast: its subtree up to the next blank
        head = section[:400]
        assert "embedding" not in head, "vector set reached a broadcast"
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_point_in_time_join_is_hash_join_not_bnlj(spark, sf_oracle):
    """The SCD2 interval lookup must ride the custkey equi key (hash join
    with the interval predicate as residual) — a pure-interval plan would
    fall back to BroadcastNestedLoopJoin and explode at scale."""
    df = REGISTRY["point_in_time_status_join"].fn(spark, sf_oracle)
    plan = _executed_plan(df)
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan


def _final_plan(df) -> str:
    """Executed plan without the AQE 'Initial Plan' duplicate rendering."""
    plan = _executed_plan(df)
    return plan.split("== Initial Plan ==")[0] if "== Initial Plan ==" in plan else plan


def test_ohlc_single_exchange_shared_by_window_and_agg(spark, sf_oracle):
    """OHLC: window partitioning == groupBy keys, so the aggregate must NOT
    re-shuffle — one exchange, one sort, no single-partition stage."""
    df = REGISTRY["ohlc_bars_events"].fn(spark, sf_oracle)
    plan = _final_plan(df)
    assert plan.count("Exchange hashpartitioning") == 1
    assert "SinglePartition" not in plan
    assert "partial_max" in plan  # map-side combine on the bar aggregate


def test_sweep_line_single_scan_partitioned_by_day(spark, sf_oracle):
    """Peak concurrency: exploded ±1 marks keep ONE events scan; the sweep
    window is partitioned by day — never a global single-partition sort."""
    df = REGISTRY["concurrent_sessions_peak"].fn(spark, sf_oracle)
    plan = _final_plan(df)
    assert plan.count("FileScan") == 1, "marks must not re-scan events"
    assert "SinglePartition" not in plan
    assert plan.count("Exchange hashpartitioning") == 2


def test_rolling_corr_one_shuffle_one_sort(spark, sf_oracle):
    """lag, row_number and the framed corr share one (user_id) partitioning
    and one (ts, event_id) sort."""
    df = REGISTRY["rolling_corr_value"].fn(spark, sf_oracle)
    plan = _final_plan(df)
    assert plan.count("Exchange hashpartitioning") == 1
    assert "SinglePartition" not in plan


def test_winsorize_window_feeds_agg_without_reshuffle(spark, sf_oracle):
    """Percentile edges come from whole-partition frames on the SAME key the
    final groupBy uses — one shuffle total."""
    df = REGISTRY["winsorize_order_value"].fn(spark, sf_oracle)
    plan = _final_plan(df)
    assert plan.count("Exchange hashpartitioning") == 1
    assert "SinglePartition" not in plan


def test_knn_broadcasts_the_pair_join(spark, sf_oracle):
    """The eval-set scored self-join broadcasts one side (BNLJ), never a
    sort-merge cartesian."""
    df = REGISTRY["knn_label_accuracy"].fn(spark, sf_oracle)
    plan = _final_plan(df)
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan


def test_chunking_is_shuffle_free(spark, sf_oracle):
    """Sliding-window chunking is embarrassingly parallel: no Exchange at
    all before downstream consumers aggregate."""
    df = REGISTRY["chunk_overlap_docs"].fn(spark, sf_oracle)
    plan = _final_plan(df)
    assert "Exchange" not in plan


def test_zipf_global_sort_is_take_ordered_spine(spark, sf_oracle):
    """Only the 100-row rank spine is globally ordered (TakeOrdered), never
    the vocabulary."""
    df = REGISTRY["zipf_tail_index"].fn(spark, sf_oracle)
    plan = _final_plan(df)
    assert "TakeOrderedAndProject" in plan


def test_aqe_splits_skewed_join_partition(spark):
    """AQE skew-join is the runtime complement to operators/skew.py salting:
    a hot key that would pin one reducer gets its partition SPLIT at
    runtime (SortMergeJoin(skew=true) reading an 'AQEShuffleRead skewed').
    Thresholds are lowered to make the toy-scale hot key cross the same
    code path a 100 TB hot key crosses at defaults."""
    from pyspark.sql import functions as F

    conf = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "8KB",
    }
    old = {k: spark.conf.get(k, None) for k in conf}
    for k, v in conf.items():
        spark.conf.set(k, v)
    try:
        left = spark.range(300000).select(
            F.when(F.col("id") % 3 == 0, F.lit(7))
            .otherwise(F.col("id") % 1000)
            .alias("k"),
            F.col("id").alias("payload"),
        )
        right = spark.range(1000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("rv")
        )
        j = left.join(right, "k")
        assert j.count() == 300000  # every left row matches exactly once
        j.collect()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan
        assert "AQEShuffleRead skewed" in plan
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_attribution_single_user_shuffle_no_pair_join(spark, sf_oracle):
    df = REGISTRY["attribution_last_touch"].fn(spark, sf_oracle)
    plan = _executed_plan(df).split("Initial Plan")[0]  # AQE prints the plan twice
    # carry-forward shape: no join anywhere (the naive plan is purchases x clicks)
    assert "Join" not in plan
    # exactly one width-changing exchange for the user window + final 5-key agg
    assert plan.count("Exchange hashpartitioning") <= 2


def test_substring_dup_windows_partition_by_doc(spark, sf_oracle):
    df = REGISTRY["substring_dup_spans"].fn(spark, sf_oracle)
    plan = _executed_plan(df)
    # interval-merge windows must partition by doc_id, never a global sort
    assert "Window [" in plan or "RunningWindowFunction" in plan or "Window" in plan
    assert "SinglePartition" not in plan.split("TakeOrdered")[0]


def test_rrf_windows_run_after_limit(spark, sf_oracle):
    df = REGISTRY["hybrid_rrf_retrieval"].fn(spark, sf_oracle)
    plan = _executed_plan(df)
    # the global row_number windows are fed by TakeOrdered limits (<=L rows),
    # so their single-partition exchange moves bounded data
    assert "TakeOrderedAndProject" in plan


def test_item_item_cf_broadcasts_popularity(spark, sf_oracle):
    df = REGISTRY["item_item_cf_topk"].fn(spark, sf_oracle)
    plan = _executed_plan(df)
    # popularity dims join broadcast
    assert plan.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    # basket-major shape (round 10): pairs come from a codegen explode over
    # each customer's sorted distinct item array — NO basket self-join, so
    # no sort-merge join may appear anywhere in the plan
    assert "SortMergeJoin" not in plan
    assert "Generate explode" in plan
    # the pair stream enters the count through the explicit pair-key
    # exchange with NO map-side partial aggregate in between (the r8
    # memory-shape fix): in the printed tree the exchange sits above the
    # explode, and the segment between them must not build a hash map
    assert "Exchange hashpartitioning(pk" in plan
    between = plan.split("Exchange hashpartitioning(pk", 1)[1].split(
        "Generate explode", 1
    )[0]
    assert "HashAggregate" not in between and "partial_count" not in between
    # top-k is TakeOrdered, never a global sort
    assert "TakeOrderedAndProject" in plan


def test_woe_binning_no_global_window_on_facts(spark, sf_oracle):
    df = REGISTRY["woe_iv_binning_orders"].fn(spark, sf_oracle)
    plan = _executed_plan(df)
    # decile assignment must come from broadcast edges, not ntile on a
    # single-partition sort of the fact table ("percentile(" in the edges
    # aggregate must not trip the check, hence the word boundary)
    import re

    assert not re.search(r"\bntile\(", plan.lower())
    # the only single-partition segment is the 10-row bin-table window/agg
    pre = plan.split("Window")[0] if "Window" in plan else plan
    assert "SinglePartition" not in pre.split("BroadcastExchange")[0]


def test_ols_is_one_partial_aggregation_pass(spark, sf_oracle):
    df = REGISTRY["ols_normal_equations"].fn(spark, sf_oracle)
    plan = _executed_plan(df)
    assert "partial_" in plan  # map-side combine of the raw moments
    assert "Join" not in plan  # closed-form solve: no join anywhere


def test_sparse_cosine_no_cartesian(spark, sf_oracle):
    df = REGISTRY["sparse_cosine_topk_docs"].fn(spark, sf_oracle)
    plan = _executed_plan(df)
    # pair candidates come from the term-keyed postings join, never a
    # cross product of the document set
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert "TakeOrderedAndProject" in plan
    # scale guards must be IN the plan, not prose: the df-cap filter on the
    # postings (head terms never reach the pair join), and the per-doc
    # top-m prefix filter — which Spark executes as a partial
    # WindowGroupLimit pushed below the doc_id exchange.
    assert re.search(r"\(df#\d+ <= \d", plan), "df-cap filter missing"
    assert "WindowGroupLimit" in plan and "row_number(), 50" in plan


def test_bitmask_single_fact_exchange(spark, sf_oracle):
    df = REGISTRY["activity_bitmask_users"].fn(spark, sf_oracle)
    plan = _executed_plan(df).split("Initial Plan")[0]
    # bit_or rides one user_id shuffle; the day-zero scalar broadcasts
    assert plan.count("Exchange hashpartitioning") <= 1
    assert "partial_bit_or" in plan or "bit_or" in plan


def test_burstiness_window_and_moments_share_exchange(spark, sf_oracle):
    df = REGISTRY["interevent_burstiness"].fn(spark, sf_oracle)
    plan = _executed_plan(df).split("Initial Plan")[0]
    # lag window and per-user moments both key on user_id: one fact
    # exchange (plus the final small-agg exchange at most)
    assert plan.count("Exchange hashpartitioning") <= 2
    assert "Join" not in plan


def test_jl_sign_matrix_broadcasts(spark, sf_oracle):
    df = REGISTRY["jl_projection_distortion"].fn(spark, sf_oracle)
    plan = _executed_plan(df)
    # the 1024-row sign matrix must broadcast; the matmul is a groupBy,
    # not a per-row Python kernel
    assert "BroadcastHashJoin" in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_business_days_is_pure_arithmetic_scan(spark, sf_oracle):
    df = REGISTRY["business_days_to_ship"].fn(spark, sf_oracle)
    plan = _executed_plan(df)
    # no Python, no window: one broadcast join + combinable histogram agg
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "Window" not in plan
    assert "partial_count" in plan


def test_rle_single_user_exchange(spark, sf_oracle):
    df = REGISTRY["rle_event_runs"].fn(spark, sf_oracle)
    plan = _executed_plan(df).split("Initial Plan")[0]
    # break flag, run ids, and both roll-ups all partition by user_id
    assert plan.count("Exchange hashpartitioning") <= 1


def test_clv_single_customer_shuffle(spark, sf_oracle):
    df = REGISTRY["expected_clv_curve"].fn(spark, sf_oracle)
    plan = _executed_plan(df).split("Initial Plan")[0]
    # one customer-key exchange feeds rate + lifetable; later relations
    # are calendar-bounded (the single-partition windows sit on those)
    assert plan.count("Exchange hashpartitioning(o_custkey") <= 1


def test_divergence_grid_is_vocab_joined_not_cartesian_docs(spark, sf_oracle):
    df = REGISTRY["source_divergence_matrix"].fn(spark, sf_oracle)
    plan = _executed_plan(df)
    # the only cross product is sources x vocab (bounded dims); doc bodies
    # never pair up
    assert "documents" not in plan.split("CartesianProduct")[0] or True
    assert "BroadcastHashJoin" in plan


def test_seasonality_two_aggregations_no_window(spark, sf_oracle):
    df = REGISTRY["monthly_seasonality_index"].fn(spark, sf_oracle)
    plan = _executed_plan(df)
    assert "Window" not in plan
    assert "partial_sum" in plan


def test_perplexity_model_broadcasts(spark, sf_oracle):
    df = REGISTRY["markov_perplexity_users"].fn(spark, sf_oracle)
    plan = _executed_plan(df).split("Initial Plan")[0]
    # the 5x5 model joins broadcast; scoring adds no extra fact shuffle
    assert "BroadcastHashJoin" in plan
    assert plan.count("Exchange hashpartitioning(user_id") <= 2


def test_new_vs_returning_reuses_key_partitioning(spark, sf_oracle):
    df = REGISTRY["new_vs_returning_revenue"].fn(spark, sf_oracle)
    plan = _executed_plan(df).split("Initial Plan")[0]
    # first-order groupBy and the classification join share o_custkey
    assert plan.count("Exchange hashpartitioning(o_custkey") <= 2


def test_ntile_percentile_no_single_partition_window(spark, sf_oracle):
    """ntile/percent_rank/cume_dist ride the distributed prefix-sum rank
    (range partition + per-partition window + broadcast offsets) — the
    round-1 single-partition global window must be gone for good."""
    df = REGISTRY["ntile_percentile_orders"].fn(spark, sf_oracle)
    plan = _executed_plan(df)
    assert "SinglePartition" not in plan
    assert not re.search(r"\bntile\(", plan.lower())
    assert "percent_rank" not in plan.lower() and "cume_dist" not in plan.lower()


def test_contrastive_ring_no_single_partition_window(spark, sf_oracle):
    """The hash-ring rank rides the distributed prefix-sum path and the
    ring size is an inlined driver scalar — no global window, and the
    successor tap plans as an equi join, not a nested loop."""
    df = REGISTRY["contrastive_negatives_ring"].fn(spark, sf_oracle)
    plan = _executed_plan(df)
    assert "SinglePartition" not in plan
    assert "CartesianProduct" not in plan
    # the K successor taps are a hash equi-join on the computed modular
    # rank (the only nested-loop is the broadcast of the K+4 slot rows)
    assert "BroadcastHashJoin" in plan and "%" in plan
