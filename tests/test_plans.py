"""Pin the performance-critical plan properties (SURVEY.md §4): predicate
pushdown to the parquet scan, column pruning, broadcast joins for dimension
tables, map-side partial aggregation."""

from __future__ import annotations

import pytest

from spark_streaming_logservice_spark import registry
from spark_streaming_logservice_spark.plans import inspect as pi

registry.load_all()


def test_q01_pushdown_and_partial_agg(spark, sf_dir):
    df = registry.QUERIES["q01_pricing_summary"](spark, sf_dir)
    assert pi.has_pushed_filters(df), "shipdate filter must reach the parquet scan"
    assert pi.has_partial_aggregation(df), "aggregate must combine map-side"


def test_q01_column_pruning(spark, sf_dir):
    df = registry.QUERIES["q01_pricing_summary"](spark, sf_dir)
    scans = pi.read_schema_columns(df)
    assert scans, "expected at least one parquet scan"
    for cols in scans:
        assert "l_orderkey" not in cols and "l_partkey" not in cols, (
            f"q01 touches no join keys; scan must prune them, got {cols}"
        )


def test_q03_broadcasts_dimension(spark, sf_dir):
    df = registry.QUERIES["q03_shipping_priority"](spark, sf_dir)
    assert pi.uses_broadcast_join(df), "filtered customer dim must broadcast"
    assert pi.has_pushed_filters(df)


def test_q05_broadcasts_all_dims(spark, sf_dir):
    df = registry.QUERIES["q05_local_supplier_volume"](spark, sf_dir)
    assert pi.uses_broadcast_join(df)


# Broadcast-hint budget for the relational battery: a forced F.broadcast()
# overrides both the 64 MiB threshold and AQE, so it is only legal on
# relations whose size does NOT grow with SF — nation (25 rows), region
# (5 rows), and 1-row scalar aggregates. customer/supplier/part scale
# linearly with SF (~3.5 GB customer at sf100, far worse at 100 TB) and must
# never be hint-forced; at test scale the threshold still broadcasts them
# automatically (uses_broadcast_join stays true), at 100 TB AQE falls back
# to a shuffle join instead of an OOM.
@pytest.mark.parametrize(
    "name,max_hints",
    [
        ("q03_shipping_priority", 0),   # no fixed-size dim in the query
        ("q05_local_supplier_volume", 2),  # nation + filtered region
        ("q07_volume_shipping", 2),     # two nation roles
        ("q08_market_share", 3),        # nation x2 + region
        ("q10_returned_items", 1),      # nation
        ("q13_top_orders_per_customer", 0),
        ("q18_large_volume_customers", 0),
        ("q21_customer_order_deltas", 0),
        ("q09_product_profit", 1),      # nation
        ("q14_promo_revenue", 0),
        ("q17_small_quantity_revenue", 0),
        ("q19_disjunctive_predicates", 0),
        ("q24_cheapest_supplier_per_part", 2),  # nation + region inside euro
        ("q26_top_supplier_revenue", 1),  # 1-row max scalar
        ("q28_waiting_suppliers", 0),
        ("q29_dominant_suppliers", 0),
    ],
)
def test_relational_no_forced_broadcast_on_sf_scaling_dims(
    spark, sf_dir, name, max_hints
):
    df = registry.QUERIES[name](spark, sf_dir)
    n = pi.broadcast_hint_count(df)
    assert n <= max_hints, (
        f"{name}: {n} broadcast hints > {max_hints} allowed — a hint was "
        "placed on an SF-scaling relation (customer/supplier/part)"
    )
    # the dims must STILL broadcast at test SF via the auto threshold
    assert pi.uses_broadcast_join(df), f"{name}: expected auto broadcast at test SF"


def test_l08_selective_filter_pushdown(spark, sf_dir):
    df = registry.QUERIES["l08_projection_cast"](spark, sf_dir)
    assert pi.has_pushed_filters(df), "event_type/value filters must push down"


def test_t03_prunes_to_two_columns(spark, sf_dir):
    df = registry.QUERIES["t03_token_count"](spark, sf_dir)
    scans = pi.read_schema_columns(df)
    assert scans and all(cols <= {"doc_id", "text"} for cols in scans), scans


@pytest.mark.parametrize(
    "name", ["q01_pricing_summary", "l01_event_type_counts", "d01_exact_dedup"]
)
def test_codegen_active(spark, sf_dir, name):
    n = pi.wholestage_codegen_spans(
        lambda: registry.QUERIES[name](spark, sf_dir), spark
    )
    assert n >= 1, "whole-stage codegen missing"


@pytest.mark.parametrize(
    "name",
    [
        "d04_minhash_lsh_pairs",
        "d02_ngram_jaccard",
        "d13_containment_pairs",
        "d19_cross_source_dup_matrix",
        "d20_quality_collapse",
    ],
)
def test_dedup_never_forces_per_doc_broadcast(spark, sf_dir, name):
    """The per-document ``sizes``/``band_ok`` relations are O(corpus) rows at
    100 TB — a forced broadcast there OOMs executors. The queries must carry
    NO user broadcast hints at all; runtime broadcasting is AQE's call based
    on actual sizes."""
    df = registry.QUERIES[name](spark, sf_dir)
    assert pi.broadcast_hint_count(df) == 0, (
        f"{name} must not force-broadcast per-document relations"
    )


def test_p19_curriculum_rank_is_distributed(spark, sf_dir):
    """The curriculum rank must come from the range-partitioned two-pass
    rank, not a partition-less row_number over the corpus."""
    df = registry.QUERIES["p19_curriculum_order"](spark, sf_dir)
    assert pi.global_window_count(df) == 0, pi.formatted_plan(df)[:2000]


def test_c05_temporal_join_is_one_window_no_join(spark, sf_dir):
    """The SCD-2 temporal enrichment must be the carry-forward window —
    zero join operators, one user-keyed shuffle for the window (+1 for the
    final tiny-aggregate orderBy), never an interval join or per-row
    subquery."""
    df = registry.QUERIES["c05_scd2_temporal_join"](spark, sf_dir)
    plan = pi.formatted_plan(df)
    for op in ("SortMergeJoin", "BroadcastHashJoin", "BroadcastNestedLoopJoin",
               "CartesianProduct"):
        assert op not in plan, f"unexpected {op} in c05 plan"
    assert pi.global_window_count(df) == 0
    assert pi.exchange_count(df) <= 3, pi.formatted_plan(df)[:2000]


def test_d19_pair_counts_from_aggregates_not_raw_self_join(spark, sf_dir):
    """d19's pair counts come from count algebra over the per-(digest,
    source) aggregate — the only join is between two aggregates on the
    digest (fan-out ≤ |sources| per key), never a raw-document self-join
    and never a cartesian."""
    df = registry.QUERIES["d19_cross_source_dup_matrix"](spark, sf_dir)
    plan = pi.formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert pi.has_partial_aggregation(df)


def test_j02_range_join_is_hash_not_nested_loop(spark, sf_dir):
    """The bucketed rewrite must plan a hash join on the bucket key — a
    naive interval predicate would fall back to BroadcastNestedLoopJoin,
    which is quadratic in candidate pairs at scale."""
    df = registry.QUERIES["j02_range_join_bucketed"](spark, sf_dir)
    plan = pi.formatted_plan(df)
    assert "BroadcastNestedLoopJoin" not in plan, plan[:2000]
    assert "Join" in plan


def test_j01_asof_is_single_window_no_join(spark, sf_dir):
    """The as-of rewrite is a window carry-forward, not a join: no join
    operator at all in the plan, one shuffle for the user_id window plus the
    final global sort."""
    df = registry.QUERIES["j01_asof_join"](spark, sf_dir)
    plan = pi.formatted_plan(df)
    assert "Join" not in plan, plan[:2000]
    assert "Window" in plan


def test_p01_sampling_stays_in_codegen(spark, sf_dir):
    n = pi.wholestage_codegen_spans(
        lambda: registry.QUERIES["p01_stratified_sample"](spark, sf_dir), spark
    )
    assert n >= 1


def test_p03_packing_single_shuffle_before_agg(spark, sf_dir):
    """Window by lang and the groupBy(lang, bin) share partitioning — the
    plan must not add a second exchange between them (+1 for the final
    orderBy range exchange)."""
    df = registry.QUERIES["p03_sequence_packing"](spark, sf_dir)
    assert pi.exchange_count(df) <= 2, pi.formatted_plan(df)[:3000]


def test_q08_single_fact_shuffle_all_dims_broadcast(spark, sf_dir):
    """Q8's 7-table join: the only shuffle join is lineitem⋈orders; every
    dimension (customer, nation x2, region, supplier, part) broadcasts."""
    df = registry.QUERIES["q08_market_share"](spark, sf_dir)
    plan = pi.formatted_plan(df)
    assert plan.count("BroadcastHashJoin") >= 5, plan[:3000]
    assert pi.has_pushed_filters(df)


def test_e12_rfm_no_global_window(spark, sf_dir):
    """RFM quartiles must come from the range-partitioned two-pass rank —
    three partition-less ntile(4) windows would push the O(users) relation
    through ONE task at 100× scale."""
    df = registry.QUERIES["e12_rfm_segments"](spark, sf_dir)
    assert pi.global_window_count(df) == 0, pi.formatted_plan(df)[:3000]


def test_q17_no_cartesian_or_nested_loop(spark, sf_dir):
    df = registry.QUERIES["q17_small_quantity_revenue"](spark, sf_dir)
    plan = pi.formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_t06_prunes_to_two_columns(spark, sf_dir):
    df = registry.QUERIES["t06_repetition_metrics"](spark, sf_dir)
    scans = pi.read_schema_columns(df)
    assert scans and all(cols <= {"doc_id", "text"} for cols in scans), scans


def test_t07_redaction_stays_in_codegen(spark, sf_dir):
    """PII regexes are regexp_replace/regexp_count built-ins — the whole
    redaction must stay inside whole-stage codegen (no Python stage)."""
    n = pi.wholestage_codegen_spans(
        lambda: registry.QUERIES["t07_pii_redaction"](spark, sf_dir), spark
    )
    assert n >= 1


def test_d08_clusters_no_forced_broadcast(spark, sf_dir):
    """Pair generation and the cluster-size join are per-document /
    per-cluster relations — O(corpus) rows at 100 TB; broadcasting is AQE's
    runtime call, never a hint. d08 itself now reads the session-pinned
    assignment (a checkpointed relation), so the chain-shape assertions run
    against the RAW chain plan, not the collapsed one."""
    df = registry.QUERIES["d08_dedup_clusters"](spark, sf_dir)
    assert pi.broadcast_hint_count(df) == 0
    from spark_streaming_logservice_spark.operators.dedup import (
        lsh_verified_pairs,
    )
    from spark_streaming_logservice_spark.tables import load_table

    pairs = lsh_verified_pairs(load_table(spark, sf_dir, "documents"))
    plan = pi.formatted_plan(pairs)
    assert pi.broadcast_hint_count(pairs) == 0
    assert "CartesianProduct" not in plan
    assert pi.has_partial_aggregation(pairs)


def test_q24_window_runs_on_aggregate_not_fact(spark, sf_dir):
    """The ranking window must sit above the (part,supplier) aggregate, not
    the raw fact table — Window after HashAggregate in the plan."""
    df = registry.QUERIES["q24_cheapest_supplier_per_part"](spark, sf_dir)
    plan = pi.formatted_plan(df)
    assert "Window" in plan and "HashAggregate" in plan
    assert plan.index("HashAggregate") > plan.index("Window")  # formatted plan lists top-down


def test_d10_prunes_and_partial_aggregates(spark, sf_dir):
    df = registry.QUERIES["d10_window_dedup"](spark, sf_dir)
    scans = pi.read_schema_columns(df)
    assert scans and all(cols <= {"doc_id", "text"} for cols in scans), scans
    assert pi.has_partial_aggregation(df), "window counts must combine map-side"
    plan = pi.formatted_plan(df)
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_s09_centroid_broadcasts_and_partial_aggregates(spark, sf_dir):
    df = registry.QUERIES["s09_centroid_residuals"](spark, sf_dir)
    assert pi.uses_broadcast_join(df), "O(labels) centroid table must broadcast"
    assert pi.has_partial_aggregation(df), "dim-wise sums must combine map-side"


def test_d11_incremental_join_no_forced_broadcast(spark, sf_dir):
    # history is O(corpus) digests at scale: the operator must not pin a
    # broadcast hint on it (AQE may still pick one at test SF).
    df = registry.QUERIES["d11_incremental_dedup"](spark, sf_dir)
    assert pi.broadcast_hint_count(df) == 0


def test_j03_overlap_join_is_hash_not_nested_loop(spark, sf_dir):
    df = registry.QUERIES["j03_interval_overlap_join"](spark, sf_dir)
    plan = pi.formatted_plan(df)
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    assert "Join" in plan


def test_s11_semdedup_pairs_join_on_cell_not_cartesian(spark, sf_dir):
    """The within-cell triangle must be a hash join keyed by cell; the only
    permitted cross join is the broadcast k-row centroid relation."""
    df = registry.QUERIES["s11_semdedup"](spark, sf_dir)
    plan = pi.formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, (
        "cell-keyed self-join must be a shuffle hash/merge join, got:\n" + plan
    )


def test_p08_rank_filter_uses_window_group_limit(spark, sf_dir):
    """The per-group k-sample must compile to WindowGroupLimit (map-side
    k-row heap per group before the shuffle) — O(groups x k) shuffle volume."""
    df = registry.QUERIES["p08_pergroup_sample"](spark, sf_dir)
    plan = pi.formatted_plan(df)
    assert "WindowGroupLimit" in plan, plan


def test_v01_vocab_partial_agg_and_topk(spark, sf_dir):
    """Wordcount bound: partial aggregation before the token shuffle, and
    the head is TakeOrdered, never a global sort."""
    df = registry.QUERIES["v01_vocab_topk"](spark, sf_dir)
    assert pi.has_partial_aggregation(df)
    plan = pi.formatted_plan(df)
    assert "TakeOrderedAndProject" in plan, plan


def test_e07_rollup_single_corpus_scan(spark, sf_dir):
    # hypertable rollup must read events ONCE: both levels derive from the
    # minute base aggregate (a 2-level union re-scans the corpus per level)
    df = registry.QUERIES["e07_multires_rollup"](spark, sf_dir)
    scans = pi.read_schema_columns(df)
    assert len(scans) == 1, f"expected one events scan, got {len(scans)}"
    assert scans[0] <= {"ts", "event_type"}, scans


def test_q25_salted_join_no_forced_broadcast(spark, sf_dir):
    df = registry.QUERIES["q25_salted_skew_join"](spark, sf_dir)
    assert pi.broadcast_hint_count(df) == 0
    plan = pi.formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert pi.has_partial_aggregation(df)


def test_g01_pagerank_iterations_reuse_cached_edges(spark, sf_dir):
    # the loop-invariant edge+outdeg relation must come from cache, not a
    # fresh parquet scan per iteration (cleanup=False keeps the caches
    # visible in the plan; the registered query runs with cleanup=True,
    # which checkpoints the result and releases them — next test)
    from spark_streaming_logservice_spark.operators.graph import (
        _supplier_customer_edges,
        pagerank,
    )

    ranks = pagerank(
        _supplier_customer_edges(spark, sf_dir), iterations=3,
        checkpoint=False, cleanup=False,
    )
    plan = pi.formatted_plan(ranks)
    assert "InMemoryTableScan" in plan


def test_g01_pagerank_releases_caches(spark, sf_dir):
    # repeated invocations must not accumulate cached relations. The
    # CacheManager census is the right probe: DataFrame persist() entries
    # live there under a strong reference until explicit unpersist (the
    # leak), while the eager localCheckpoint's backing RDD is reclaimed by
    # the ContextCleaner once the result is GC'd.
    # clearCache first: CacheManager dedups identical plans, so a leftover
    # cache from another test (e.g. the cleanup=False run above) would
    # otherwise share entries with this run and make the census ambiguous
    spark.catalog.clearCache()
    cm = spark._jsparkSession.sharedState().cacheManager()
    registry.QUERIES["g01_pagerank"](spark, sf_dir).count()
    assert cm.isEmpty()


def test_s14_dim_stats_partial_agg(spark, sf_dir):
    df = registry.QUERIES["s14_dim_stats"](spark, sf_dir)
    assert pi.has_partial_aggregation(df), "dim agg must combine map-side"
    scans = pi.read_schema_columns(df)
    assert scans and all(cols <= {"embedding"} for cols in scans), scans


@pytest.mark.parametrize("name", ["v04_vocab_coverage", "p07_balanced_shards"])
def test_no_global_single_partition_window(spark, sf_dir, name):
    """Rank/cumsum must be the distributed two-pass form: a partition-less
    WindowExec funnels the entire relation (1e8-1e9 distinct tokens at
    100 TB for v04; every document for p07) through ONE task."""
    df = registry.QUERIES[name](spark, sf_dir)
    assert pi.global_window_count(df) == 0, pi.formatted_plan(df)[:3000]


def test_e09_attribution_is_single_window_no_join(spark, sf_dir):
    """Last-touch credit must be the carry-forward window over interleaved
    events, not a purchases×clicks join (which is quadratic per user at
    scale)."""
    df = registry.QUERIES["e09_last_touch_attribution"](spark, sf_dir)
    plan = pi.formatted_plan(df)
    assert "Join" not in plan, plan[:2000]
    assert "Window" in plan
    assert pi.global_window_count(df) == 0


def test_l18_bursts_no_global_window_and_partial_agg(spark, sf_dir):
    df = registry.QUERIES["l18_error_bursts"](spark, sf_dir)
    assert pi.global_window_count(df) == 0
    assert pi.has_partial_aggregation(df), "minute rollup must combine map-side"
    assert pi.has_pushed_filters(df), "event_type filter must reach the scan"


def test_l17_templates_partial_agg_and_codegen(spark, sf_dir):
    df = registry.QUERIES["l17_log_templates"](spark, sf_dir)
    assert pi.has_partial_aggregation(df), "template counts must combine map-side"
    n = pi.wholestage_codegen_spans(
        lambda: registry.QUERIES["l17_log_templates"](spark, sf_dir), spark
    )
    assert n >= 1, "regexp masking must stay inside whole-stage codegen"


def test_t11_bigram_no_cartesian_and_prunes(spark, sf_dir):
    df = registry.QUERIES["t11_bigram_logprob"](spark, sf_dir)
    scans = pi.read_schema_columns(df)
    assert scans and all(cols <= {"doc_id", "text"} for cols in scans), scans
    plan = pi.formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert pi.has_partial_aggregation(df)


def test_s15_hamming_join_is_hash_not_nested_loop(spark, sf_dir):
    """The signature-prefix bucket join must plan as a hash/merge join on
    the computed prefix — a nested-loop fallback would be all-pairs."""
    df = registry.QUERIES["s15_hamming_ann"](spark, sf_dir)
    plan = pi.formatted_plan(df)
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    assert "Join" in plan


def test_t10_unigram_prunes_and_no_cartesian(spark, sf_dir):
    df = registry.QUERIES["t10_unigram_logprob"](spark, sf_dir)
    scans = pi.read_schema_columns(df)
    assert scans and all(cols <= {"doc_id", "text"} for cols in scans), scans
    # the only nested-loop is the 1-row total broadcast; a corpus-sized
    # cartesian would be a CartesianProduct node
    assert "CartesianProduct" not in pi.formatted_plan(df)


def test_g02_triangle_join_is_hash_not_nested_loop(spark, sf_dir):
    """Wedge + closing joins must be hash equi-joins; the only nested-loop
    allowed is the 1-row scalar total cross join. Pinned on the
    materialize=False construction: the registered query checkpoints the
    oriented relation (r14 — it is referenced three times), which hides
    the join lineage from the final plan, so the shape is asserted on the
    same logical construction with checkpoints off."""
    from spark_streaming_logservice_spark.operators.graph import (
        _copurchase_edges,
        triangle_count,
    )

    df = triangle_count(_copurchase_edges(spark, sf_dir), materialize=False)
    plan = pi.formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan


def test_g02_executed_path_joins_are_hash_over_pinned_edges(spark, sf_dir):
    """The REGISTERED g02 path checkpoints the oriented relation, so also
    pin the executed shape (ADVICE r14): the wedge/closing joins in the
    default materialize=True output must still be hash equi-joins, now over
    the pinned RDD scans — a join-strategy regression in the real path
    would otherwise be invisible to the materialize=False test above."""
    from spark_streaming_logservice_spark.operators.graph import (
        _copurchase_edges,
        triangle_count,
    )

    edges = _copurchase_edges(spark, sf_dir).localCheckpoint(eager=True)
    df = triangle_count(edges)  # materialize=True: the registered shape
    plan = pi.formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "ExistingRDD" in plan, "oriented relation must be pinned"
    assert (
        "SortMergeJoin" in plan
        or "ShuffledHashJoin" in plan
        or "BroadcastHashJoin" in plan
    )


def test_t12_profile_single_expand_single_scan(spark, sf_dir):
    """Multi-column exact distinct = ONE Expand over ONE events scan."""
    df = registry.QUERIES["t12_column_profile"](spark, sf_dir)
    plan = pi.formatted_plan(df)
    assert plan.count("Expand") >= 1
    scans = pi.read_schema_columns(df)
    assert len(scans) == 1, f"profile must scan events exactly once, got {scans}"
    assert pi.has_partial_aggregation(df)


def test_l19_countmin_partial_agg_no_cartesian(spark, sf_dir):
    df = registry.QUERIES["l19_countmin_frequency"](spark, sf_dir)
    plan = pi.formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert pi.has_partial_aggregation(df), "sketch cells must combine map-side"


def test_d14_bloom_bitsets_broadcast(spark, sf_dir):
    df = registry.QUERIES["d14_bloom_decontamination"](spark, sf_dir)
    assert pi.uses_broadcast_join(df), "bit-set joins must be broadcast"
    assert pi.formatted_plan(df).count("CartesianProduct") == 0


def test_l20_hopping_expand_not_join(spark, sf_dir):
    """Overlapping windows come from a row-local Expand, never a self-join."""
    df = registry.QUERIES["l20_hopping_window"](spark, sf_dir)
    plan = pi.formatted_plan(df)
    assert "Expand" in plan
    assert "Join" not in plan
    assert pi.has_partial_aggregation(df)


def test_s16_mips_scalar_broadcast_and_group_limit(spark, sf_dir):
    """Corpus side streams once; M and the query set broadcast; per-query
    top-k must be a WindowGroupLimit (map-side k-row heap)."""
    df = registry.QUERIES["s16_mips_topk"](spark, sf_dir)
    plan = pi.formatted_plan(df)
    # query set and scalar M broadcast through the cross joins (tiny sides)
    assert "BroadcastNestedLoopJoin" in plan or pi.uses_broadcast_join(df)
    assert "WindowGroupLimit" in plan


def test_d17_fuzzy_join_is_hash_on_variant_key(spark, sf_dir):
    """Deletion-neighborhood blocking must plan as a hash equi-join on the
    variant key — never a nested-loop over name pairs."""
    df = registry.QUERIES["d17_fuzzy_name_join"](spark, sf_dir)
    plan = pi.formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_v07_bm25_model_relations_broadcast(spark, sf_dir):
    df = registry.QUERIES["v07_bm25_scoring"](spark, sf_dir)
    assert pi.uses_broadcast_join(df) or "BroadcastNestedLoopJoin" in pi.formatted_plan(df)
    assert pi.has_partial_aggregation(df)


def test_l22_histogram_no_global_single_partition_window(spark, sf_dir):
    """The equi-depth rank must come from the two-pass range-partitioned
    path, not a partition-less window over the corpus."""
    df = registry.QUERIES["l22_equidepth_histogram"](spark, sf_dir)
    assert pi.global_window_count(df) == 0


def test_p14_group_split_partial_agg(spark, sf_dir):
    # the 1-row leak relation joins via a scalar broadcast cross join —
    # fine; what matters is the split counts combine map-side
    df = registry.QUERIES["p14_group_split"](spark, sf_dir)
    assert pi.has_partial_aggregation(df)
    assert "CartesianProduct" not in pi.formatted_plan(df)


def test_l23_gap_fill_no_global_window(spark, sf_dir):
    """LOCF window must partition by event_type; grid explode must not
    force a cartesian (span relation joins back hash-keyed)."""
    df = registry.QUERIES["l23_hourly_gap_fill"](spark, sf_dir)
    assert pi.global_window_count(df) == 0
    assert "CartesianProduct" not in pi.formatted_plan(df)
    assert pi.has_partial_aggregation(df)


def test_e15_seasonality_partitioned_window(spark, sf_dir):
    df = registry.QUERIES["e15_seasonality_profile"](spark, sf_dir)
    assert pi.global_window_count(df) == 0
    assert pi.has_partial_aggregation(df)


def test_c04_snapshot_pushes_type_filter_and_broadcasts_cut(spark, sf_dir):
    """The changelog-type filter reaches the scan; the 1-row cut bound
    arrives via broadcast, not a shuffle."""
    df = registry.QUERIES["c04_snapshot_asof"](spark, sf_dir)
    assert pi.has_pushed_filters(df)
    plan = pi.formatted_plan(df)
    assert "BroadcastNestedLoopJoin" in plan or pi.uses_broadcast_join(df)


def test_s17_range_search_single_scan_broadcast_queries(spark, sf_dir):
    """Range search = broadcast queries against one corpus-side projection;
    no shuffle exchange other than the final tiny ordered result."""
    df = registry.QUERIES["s17_cosine_range_search"](spark, sf_dir)
    assert pi.uses_broadcast_join(df) or "BroadcastNestedLoopJoin" in pi.formatted_plan(df)


def test_g05_label_rounds_are_hash_joins(spark, sf_dir):
    df = registry.QUERIES["g05_label_propagation"](spark, sf_dir)
    plan = pi.formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert pi.has_partial_aggregation(df)


def test_p16_schedule_no_global_window_before_head(spark, sf_dir):
    """Per-source position is a partitioned window; the only ordered-global
    step is the TakeOrdered head + the k-row step numbering."""
    df = registry.QUERIES["p16_mixture_schedule"](spark, sf_dir)
    plan = pi.formatted_plan(df)
    assert "TakeOrderedAndProject" in plan
    # one global window IS expected: step numbering over the 60-row head
    assert pi.global_window_count(df) <= 1


def test_t15_novelty_ngram_keyed_no_cartesian(spark, sf_dir):
    """Trigram build must be row-local (no self-join); first-seen join is
    hash on the n-gram key."""
    df = registry.QUERIES["t15_ngram_novelty"](spark, sf_dir)
    plan = pi.formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert pi.global_window_count(df) == 0
    assert pi.has_partial_aggregation(df)


def test_e17_growth_user_partitioned_lag(spark, sf_dir):
    """The per-user lag partitions by user; the only ordered-global window
    is the churn identity over the O(weeks) rollup."""
    df = registry.QUERIES["e17_growth_accounting"](spark, sf_dir)
    assert pi.global_window_count(df) <= 1
    assert pi.has_partial_aggregation(df)


def test_j05_nearest_single_window_shuffle_no_join(spark, sf_dir):
    """Both direction frames ride ONE user-keyed window — no join at all
    in the plan, and the type filter reaches the scan."""
    df = registry.QUERIES["j05_nearest_event_join"](spark, sf_dir)
    plan = pi.formatted_plan(df)
    assert "Join" not in plan
    assert pi.has_pushed_filters(df)
    assert pi.global_window_count(df) == 0


def test_p17_split_one_corpus_pass_after_pinned_assign(spark, sf_dir):
    """Side assignment and per-source counts combine map-side; the leak
    check runs over the pinned assignment (no second corpus scan in the
    same plan — the CC chain is behind an eager checkpoint)."""
    import re

    df = registry.QUERIES["p17_leakage_free_split"](spark, sf_dir)
    plan = pi.formatted_plan(df)
    assert pi.has_partial_aggregation(df)
    scan_nodes = re.findall(r"^\(\d+\) Scan parquet", plan, re.M)
    assert len(scan_nodes) <= 1, (
        "corpus must be scanned once; the cluster chain is checkpointed"
    )
    assert "Scan ExistingRDD" in plan, "pinned assignment missing from plan"


def test_q29_single_fact_scan_and_broadcast_dim(spark, sf_dir):
    """Both aggregation grains derive from ONE lineitem scan (exchange
    reuse), and the supplier dim broadcasts."""
    df = registry.QUERIES["q29_dominant_suppliers"](spark, sf_dir)
    assert pi.uses_broadcast_join(df)
    assert pi.has_partial_aggregation(df)


def test_v08_heaps_no_ordered_corpus_window(spark, sf_dir):
    """Growth sampling must be the broadcast-checkpoint conditional agg,
    never a cumulative corpus-ordered window."""
    df = registry.QUERIES["v08_heaps_law"](spark, sf_dir)
    assert pi.global_window_count(df) == 0
    assert pi.has_partial_aggregation(df)


def test_s18_sweep_bucketed_join_tiny_cumsum(spark, sf_dir):
    """Pair generation must be the cell-keyed equi-join (no all-pairs); the
    cumulative window runs over the O(20)-row histogram only."""
    df = registry.QUERIES["s18_threshold_sweep"](spark, sf_dir)
    plan = pi.formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert pi.has_partial_aggregation(df)


def test_e18_mad_partitioned_aggregates_not_windows(spark, sf_dir):
    df = registry.QUERIES["e18_mad_anomalies"](spark, sf_dir)
    assert pi.global_window_count(df) == 0
    assert pi.has_partial_aggregation(df)


def test_q30_histogram_two_level_agg_no_cartesian(spark, sf_dir):
    df = registry.QUERIES["q30_order_count_distribution"](spark, sf_dir)
    plan = pi.formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert pi.has_partial_aggregation(df)


def test_l24_dynamic_session_single_user_shuffle(spark, sf_dir):
    """Dynamic-gap session_window must stay one user-keyed aggregation —
    no join, no global window; the user filter reaches the scan."""
    df = registry.QUERIES["l24_dynamic_session_window"](spark, sf_dir)
    plan = pi.formatted_plan(df)
    assert "Join" not in plan
    assert pi.global_window_count(df) == 0
    assert pi.has_pushed_filters(df)


def test_s19_recall_no_all_pairs_on_ann_side(spark, sf_dir):
    """The ANN side must stay cell-keyed; the only corpus-wide pairing is
    the broadcast-queries brute side (N_QUERY rows, not all-pairs)."""
    df = registry.QUERIES["s19_lsh_recall_at_k"](spark, sf_dir)
    plan = pi.formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert pi.has_partial_aggregation(df)


def test_e19_gaps_user_partitioned_lag(spark, sf_dir):
    df = registry.QUERIES["e19_interevent_gaps"](spark, sf_dir)
    assert pi.global_window_count(df) == 0
    assert pi.has_partial_aggregation(df)


def test_e20_burn_hierarchy_single_corpus_rollup(spark, sf_dir):
    """Hour and peak-5m both derive from the 5-minute base — one corpus
    aggregation, then O(hours) work; no global window."""
    df = registry.QUERIES["e20_slo_burn_rate"](spark, sf_dir)
    assert pi.global_window_count(df) == 0
    assert pi.has_partial_aggregation(df)


def test_q31_concentration_two_pass_rank_no_global_sort(spark, sf_dir):
    """The Gini rank must come from the range-partitioned two-pass path
    (pinned-RDD node present), not a partition-less window; dims broadcast
    in the customer rollup."""
    import re

    df = registry.QUERIES["q31_revenue_concentration"](spark, sf_dir)
    plan = pi.formatted_plan(df)
    assert pi.global_window_count(df) == 0
    assert "Scan ExistingRDD" in plan
    assert pi.has_partial_aggregation(df)


def test_p18_card_single_corpus_tokenization(spark, sf_dir):
    """One tokenizing scan feeds tokens/quality/digest; the majority-lang
    relation is O(sources×langs) and broadcasts."""
    df = registry.QUERIES["p18_dataset_card"](spark, sf_dir)
    plan = pi.formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert pi.has_partial_aggregation(df)


def test_e21_ltv_cohort_partitioned_running_sum(spark, sf_dir):
    df = registry.QUERIES["e21_cohort_ltv"](spark, sf_dir)
    assert pi.global_window_count(df) == 0
    assert pi.has_partial_aggregation(df)


def test_q32_latency_percentiles_partitioned(spark, sf_dir):
    df = registry.QUERIES["q32_ship_latency_percentiles"](spark, sf_dir)
    assert pi.global_window_count(df) == 0
    plan = pi.formatted_plan(df)
    assert "CartesianProduct" not in plan


def test_m14_keyframes_doc_partitioned_lag(spark, sf_dir):
    df = registry.QUERIES["m14_video_keyframes"](spark, sf_dir)
    assert pi.global_window_count(df) == 0


def test_d18_histogram_reuses_pinned_chain(spark, sf_dir):
    import re

    df = registry.QUERIES["d18_cluster_size_histogram"](spark, sf_dir)
    plan = pi.formatted_plan(df)
    assert "Scan ExistingRDD" in plan, "cluster chain must be pinned"
    scans = re.findall(r"^\(\d+\) Scan parquet", plan, re.M)
    assert len(scans) <= 1, "corpus scanned at most once after the pin"


# Global-window allowlist: every query whose plan contains a partition-less
# Window operator must be on this list, and each entry's windowed relation
# must be bounded independent of corpus size (the e06 tiny-aggregate
# pattern). Anything else is the v04-class scale bug: the whole relation
# through ONE task at 100 TB.
GLOBAL_WINDOW_OK = {
    "e13_cumulative_reach",      # running sum over O(days)
    "e22_survival_curve",        # reverse cumsum over O(observed lifetimes)
    "e16_changepoint_detection", # running sums over O(days)
    "e17_growth_accounting",     # lag over O(weeks)
    "p16_mixture_schedule",      # schedule over O(sources x steps)
    "l28_shard_balance",         # rank over exactly L28_SHARDS(=16) rows
    "q27_monthly_growth",        # lag over O(months)
    "s18_threshold_sweep",       # rank over O(thresholds)
    "sql08_range_frame",         # RANGE frame demo over a KEY-BOUNDED slice
    "v01_vocab_topk",            # rank over the post-limit 100-row head
    "v02_bpe_pair_counts",       # rank over the post-limit 50-row head
    "v05_zipf_slope",            # regression over the 100-row head
    "v06_bpe_merge_rounds",      # rank over the post-limit 10-row head
}


# BroadcastNestedLoopJoin allowlist: every BNLJ in the surface is a
# crossJoin with a BROADCAST side that is bounded by construction — a 1-row
# scalar aggregate (totals/max/anchor: the decorrelated scalar-subquery
# shape), a fixed query set (N_QUERY rows), or a k-row centroid/threshold
# table. A BNLJ against a corpus-sized side would be quadratic; any new
# entry here needs that boundedness argument.
BNLJ_OK = {
    "c04_snapshot_asof",
    "q34_copurchase_lift",  # 1-row order-total scalar cross join (its own
    # plan test additionally pins the BNLJ node count to exactly one)
    "c06_cdc_net_effect",   # 1-row cut-bounds aggregate broadcast
    "d25_shingle_df_spectrum",  # 1-row total-shingles aggregate broadcast
    "p24_sequence_packing",  # O(sources)-row totals self-join (base offsets)
    "t18_quality_deciles",   # 1-row vocab total + 1-row doc-count broadcasts
    "e31_experiment_power",  # 1-row-per-arm stats cross join (2 rows)
    "g07_degree_assortativity",  # 1-row stats x 1-row node-count broadcasts
    "l30_volume_forecast",   # 1-row max-day aggregate broadcast (test window)
    "p25_mixture_diversity",  # 1-row total + 1-row entropy broadcasts
    "s27_adc_rank_fidelity",  # N_QUERY-row query set x index (s01 shape) +
    # queries x SHORTLIST(=50) shortlist/ADC-table broadcasts — all bounded
    "e30_anomaly_attribution",  # 1-row median + 1-row MAD broadcasts
    "s26_ivf_nprobe_sweep",  # N_QUERY-row query set x index (s01 shape),
    # 4-row probes relation, 1-row query-count aggregate — all bounded
    "d18_cluster_size_histogram",
    "e26_autocorrelation",  # fixed 7-row lag relation broadcast
    "g06_degree_powerlaw",  # 1-row log-log OLS fit aggregate broadcast
    "e08_conversion_funnel_7d", "e11_ab_test_lift", "e12_rfm_segments",
    "e22_survival_curve",  # 1-row total-users scalar broadcast
    "g02_triangle_count", "l22_equidepth_histogram",
    "m09_image_ahash_neardup", "p11_neyman_allocation",
    "p13_temperature_mixture", "p14_group_split", "p17_leakage_free_split",
    "p26_epoch_allocation",  # 1-row (budget, n_sources) aggregate broadcast
    "p27_dedup_aware_mixture",  # 1-row (nd, nu) totals aggregate broadcast
    "q11_semi_anti_join", "q20_set_operations", "q22_balance_no_orders",
    "l25_hll_cardinality",  # scope x 64-register scaffold: O(types)-row cross join
    "l28_shard_balance",    # 1-row Gini + 1-row total aggregate broadcasts
    "l26_kmv_overlap",      # type pairs x k-row sketches: O(types^2 * k) rows
    "q31_revenue_concentration", "s01_cosine_topk", "s05_ann_ivf",
    "s24_ann_ivf_served",  # same bounded sides as s05: N_QUERY-row query
    # set x K_CELLS-row stored-centroid LocalRelation (the serve half of
    # the identical plan shape)
    "s06_ann_ivf_recall", "s11_semdedup", "s12_semdedup_report",
    "s16_mips_topk", "s17_cosine_range_search", "s19_lsh_recall_at_k",
    "s22_multiprobe_lsh_recall",
    "s20_sq8_rerank", "s21_mmr_diversified_topk",
    "s30_ndcg_mrr",  # N_QUERY-row query set x corpus, twice (exact
    # relevance leg = s01's shape; retrieved leg = s20's SQ8 candidate
    # stage) — both broadcast sides bounded by the fixed query set
    "s23_knn_label_accuracy",  # literal-id-capped eval-set broadcast
    "t10_unigram_logprob",
    "t14_source_divergence",
    "v03_tfidf_top_terms", "v04_vocab_coverage", "v07_bm25_scoring",
    "v08_heaps_law",
}


def test_plan_hazard_sweep_over_every_query(spark, sf_dir):
    """ONE pass over all registered query plans pinning three invariants:
    (1) no CartesianProduct anywhere — every cross join broadcasts;
    (2) every partition-less Window is on the bounded allowlist;
    (3) every BroadcastNestedLoopJoin is on the bounded-side allowlist."""
    cartesian, bad_windows, bad_bnlj = [], [], []
    for name in sorted(registry.QUERIES):
        df = registry.QUERIES[name](spark, sf_dir)
        plan = pi.formatted_plan(df)
        if "CartesianProduct" in plan:
            cartesian.append(name)
        if pi.global_window_count(df) > 0 and name not in GLOBAL_WINDOW_OK:
            bad_windows.append(name)
        if "BroadcastNestedLoopJoin" in plan and name not in BNLJ_OK:
            bad_bnlj.append(name)
    assert not cartesian, f"CartesianProduct in {cartesian}"
    assert not bad_windows, (
        f"partition-less Window in {bad_windows} — rewrite onto "
        "distributed_row_number / a partitioned window, or prove the "
        "windowed relation is corpus-size-independent and allowlist it"
    )
    assert not bad_bnlj, (
        f"BroadcastNestedLoopJoin in {bad_bnlj} — prove the broadcast side "
        "is bounded by construction and allowlist it"
    )


def test_s20_candidate_exchange_carries_codes_not_floats(spark, sf_dir):
    """SQ8's point is that the candidate stream is 8x smaller than the
    float corpus: the shuffle feeding the shortlist window must move only
    (q_id, n_id, approx) — the full-precision arrays are joined back for
    the <= queries x shortlist rows AFTER the top-k (VERDICT r7 item 3).
    Concretely: at least one hash exchange carries no array column at all
    (the candidate stage), and any exchange that does carry the emb arrays
    is the rerank one, fed by the broadcast-shortlist join."""
    df = registry.QUERIES["s20_sq8_rerank"](spark, sf_dir)
    inputs = pi.hash_exchange_inputs(df)
    assert inputs, "expected hash exchanges in the s20 plan"
    no_float = [s for s in inputs if "emb" not in s]
    with_float = [s for s in inputs if "emb" in s]
    assert no_float, f"candidate exchange must be codes-only, got {inputs}"
    assert len(with_float) <= 1, (
        "only the post-shortlist rerank exchange may carry float arrays, "
        f"got {with_float}"
    )


def test_s30_topk_windows_pruned_and_no_float_exchange(spark, sf_dir):
    """The ranked-list eval must stay in the s01/s20 plan class: every
    per-query top-k is a q_id-partitioned row_number<=k (WindowGroupLimit
    prunes to k per query before the final exchange), and NO hash exchange
    carries a float embedding array — both the exact-relevance leg and the
    SQ8 retrieved leg project down to (q_id, n_id, score) before anything
    shuffles (VERDICT r13 item 6)."""
    df = registry.QUERIES["s30_ndcg_mrr"](spark, sf_dir)
    plan = pi.formatted_plan(df)
    assert "WindowGroupLimit" in plan, "top-k windows must prune to k"
    assert "CartesianProduct" not in plan
    inputs = pi.hash_exchange_inputs(df)
    assert inputs, "expected hash exchanges in the s30 plan"
    with_float = [s for s in inputs if "emb" in s]
    assert not with_float, (
        f"no exchange may carry float embedding arrays, got {with_float}"
    )


def test_q34_basket_self_join_is_keyed_not_cross(spark, sf_dir):
    """The pair generation must be an equi-join on the order key (fan-out
    bounded by basket size); the ONLY permitted hint/cross is the 1-row
    order-total scalar."""
    df = registry.QUERIES["q34_copurchase_lift"](spark, sf_dir)
    assert pi.broadcast_hint_count(df) == 1, (
        "exactly the 1-row scalar may be hint-broadcast"
    )
    plan = pi.formatted_plan(df)
    assert "CartesianProduct" not in plan, (
        "basket pairs must come from the order-key equi-join, not a "
        "cross product over parts"
    )
    # a regression to a pure theta join (p1 < p2 with no order-key equi
    # condition) would auto-broadcast the small side at test SF and plan a
    # BroadcastNestedLoopJoin, not a CartesianProduct — so pin the BNLJ
    # NODE count (the formatted details list one '(N) <op>' header per
    # node) to exactly the one legal 1-row scalar cross
    import re as _re

    bnlj_nodes = _re.findall(r"\(\d+\) BroadcastNestedLoopJoin", plan)
    assert len(bnlj_nodes) == 1, (
        f"only the 1-row order-total scalar may nested-loop: {bnlj_nodes}"
    )


def test_j06_band_join_is_bucketed_equi_join(spark, sf_dir):
    """The |x-y| <= eps band join must run as a (user, bucket) equi-join
    with the exact predicate as a post-filter — no cross/nested-loop join
    and no forced broadcast (both sides are O(SF))."""
    df = registry.QUERIES["j06_value_band_join"](spark, sf_dir)
    assert pi.broadcast_hint_count(df) == 0
    plan = pi.formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan, (
        "the band predicate must ride the bucket equi-join, not a "
        "nested-loop theta join"
    )
    assert pi.has_pushed_filters(df), "event_type filters must reach the scan"
