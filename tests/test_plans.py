"""Plan-shape regression tests — the 100 TB contract, asserted.

Correctness says the answer is right; these tests pin HOW it runs: filters
reach the scan, projections prune columns, dimensions broadcast, top-k
avoids global sorts, windows/as-of pay exactly one shuffle. A regression
here is a silent 100× at scale even when results stay correct.
"""

from __future__ import annotations

from ddataframeoperation_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    return str(QUERIES[name](spark, SF)._jdf.queryExecution().executedPlan())


def test_scan_gets_pushdown_and_pruning(spark):
    p = _plan(spark, "b01_scan_project_filter")
    assert "PushedFilters: [" in p and "GreaterThan" in p
    # Projection pruned to the 4 selected + filter column.
    read = p.split("ReadSchema:")[1].splitlines()[0]
    assert "l_extendedprice" in read and "l_returnflag" not in read


def test_flagship_broadcasts_and_takeordered(spark):
    p = _plan(spark, "b10_flagship_q3")
    assert "TakeOrderedAndProject" in p  # no global sort for top-k
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p  # fact table never shuffled at this size


def test_star_join_fact_never_shuffled(spark):
    p = _plan(spark, "b08_star_join_broadcast")
    assert p.count("BroadcastHashJoin") == 4
    # Only the final aggregation exchanges data.
    assert p.count("Exchange hashpartitioning") <= 1


def test_window_queries_single_shuffle(spark):
    for name in ("b17_window_rank", "b35_sessionize", "b20_latest_per_key"):
        p = _plan(spark, name)
        assert p.count("Exchange hashpartitioning") == 1, name


def test_grouped_map_pinned_parallelism_and_pruning(spark):
    # The Python grouped-map stage must (a) pay exactly one exchange —
    # the explicit repartition satisfies the map's ClusteredDistribution,
    # so AQE cannot coalesce the Python stage down to a handful of cores —
    # and (b) scan only the group+value columns: applyInPandas ships every
    # input column to Python, and Catalyst cannot prune through it.
    p = _plan(spark, "b30_script_zscore")
    assert "FlatMapGroupsInPandas" in p
    assert p.count("Exchange hashpartitioning") == 1
    read = p.split("ReadSchema:")[1].splitlines()[0]
    assert "user_id" in read and "value" in read
    assert "props" not in read and "event_type" not in read


def test_asof_join_single_shuffle(spark):
    p = _plan(spark, "b09_asof_join")
    assert p.count("Exchange hashpartitioning") == 1
    assert "SortMergeJoin" not in p and "BroadcastNestedLoopJoin" not in p


def test_topk_is_takeordered(spark):
    p = _plan(spark, "b16_top_k")
    assert "TakeOrderedAndProject" in p
    assert "Exchange rangepartitioning" not in p  # no global sort shuffle


def test_agg_has_partial_phase(spark):
    p = _plan(spark, "b11_agg_pricing_summary")
    # Map-side partial + final aggregate around one exchange.
    assert p.count("HashAggregate") >= 2
    assert p.count("Exchange hashpartitioning") == 1


def test_range_join_keeps_equi_conjunct(spark):
    p = _plan(spark, "b09_range_join")
    # The user_id equality must be a join key (hash/broadcast/sort-merge),
    # never a nested-loop over the range condition alone.
    assert "BroadcastNestedLoopJoin" not in p and "CartesianProduct" not in p


def test_q21_exists_shapes_no_cartesian(spark):
    # r8 re-plan: the EXISTS/NOT-EXISTS pair is computed by per-(order,
    # supplier) aggregation (the fact table shuffles ONCE on its natural
    # key) + an order-key semi join against status-F orders — never a
    # nested-loop/cartesian fallback, and no lineitem self-join remains.
    p = _plan(spark, "b10_q21_waiting_suppliers")
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    assert "LeftSemi" in p
    assert "TakeOrderedAndProject" in p
    # the inequality anti self-join is gone...
    assert "LeftAnti" not in p
    # ...and the static plan holds at most the per_os subtree twice (its
    # (orderkey, suppkey) exchange is identical in both branches, so AQE
    # reuses it at runtime) — down from three lineitem self-join scans.
    assert p.count("lineitem.parquet") <= 2


def test_pack_sequences_single_shard_shuffle(spark):
    # Packing shuffles once on the shard key (window partition); no global
    # (un-partitioned) window anywhere in the plan.
    p = _plan(spark, "b34_pack_sequences")
    assert p.count("Exchange hashpartitioning") == 1
    assert "Exchange SinglePartition" not in p


def test_gapfill_shares_key_partitioning(spark):
    # Obs-aggregate, bounds, grid join, and the forward-fill window all key
    # on user_id; the dense grid is generated (sequence+explode), not read.
    p = _plan(spark, "b24_gapfill_locf")
    assert "Generate explode" in p
    assert "CartesianProduct" not in p


def test_contamination_broadcasts_benchmark(spark):
    # The benchmark n-gram set must broadcast onto the target inverted
    # index — a shuffle join here would move the whole corpus by n-gram.
    p = _plan(spark, "b34_contamination")
    assert "BroadcastHashJoin" in p


def test_lateral_topn_decorrelates_to_window_group_limit(spark):
    # The correlated LIMIT subquery must become a WindowGroupLimit with a
    # PARTIAL phase (map-side top-k prune BEFORE the shuffle) + a hash
    # join — never a nested loop per outer row.
    p = _plan(spark, "b05_lateral_topn")
    assert "WindowGroupLimit" in p and "Partial" in p
    assert "BroadcastNestedLoopJoin" not in p and "CartesianProduct" not in p


def test_ohlc_is_single_aggregate_no_window(spark):
    # min_by/max_by make OHLC ONE map-side-combinable aggregate: exactly
    # one exchange, no Window operator sorting whole partitions.
    p = _plan(spark, "b24_ohlc_bars")
    assert p.count("Exchange hashpartitioning") == 1
    assert "Window\n" not in p and "partial_min_by" in p


def test_temperature_mix_broadcasts_quotas(spark):
    # The per-source quota side is tiny -> must arrive by broadcast; the
    # data pays one hash-partition exchange for its window, the quota
    # branch one more for its (sources-sized) count aggregate.
    p = _plan(spark, "b22_temperature_mix")
    assert "BroadcastHashJoin" in p
    assert p.count("Exchange hashpartitioning") <= 2


def test_skyline_no_self_join(spark):
    # The NOT-EXISTS dominance definition must NOT plan as any join of
    # the data with itself — bucketed prefix minima over x + one
    # equi-join back. The ONLY nested-loop join allowed is the 1-row
    # range-scalar broadcast that drives bucket assignment (same shape
    # as the percentile-cut-point queries); the data itself never meets
    # itself in a cross product.
    p = _plan(spark, "b16_skyline_2d")
    assert "CartesianProduct" not in p
    # The per-x subtree is consumed by both prefix-min levels, so the
    # 1-row range scalar broadcasts (at most) twice; each must be the
    # Cross/BuildRight shape with an IdentityBroadcastMode aggregate.
    assert p.count("BroadcastNestedLoopJoin") <= 2
    assert p.count("BroadcastNestedLoopJoin BuildRight, Cross") == p.count(
        "BroadcastNestedLoopJoin"
    )
    # join back on x is a broadcast (distinct-price table is small).
    assert "BroadcastHashJoin" in p
    # the DATA-sized running-min window is partitioned by bucket; only
    # the <=1024-row cross-bucket prefix runs unpartitioned.
    assert "windowspecdefinition(_bkt" in p


def test_abc_classification_window_is_bucket_partitioned(spark):
    # VERDICT r6 #2: the cumulative-share running sum over the supplier
    # aggregate must be PARTITIONED by the value bucket (the supplier
    # space scales linearly with the corpus — no single-task sort of it);
    # the only un-partitioned window runs on the <=1024-row cross-bucket
    # prefix table. The prefix/total table and the 1-row range scalar
    # arrive by broadcast; the data never meets itself in a cross product.
    p = _plan(spark, "b19_abc_classification")
    assert "windowspecdefinition(_bkt" in p
    assert "CartesianProduct" not in p
    assert "BroadcastHashJoin" in p
    # An un-partitioned global window over the supplier aggregate would
    # print its spec starting with the revenue order column (no partition
    # columns precede it) — every window here must lead with _bkt.
    import re

    specs = re.findall(r"windowspecdefinition\(([^)]*)", p)
    assert specs and all(
        # _bkt-led: the data-sized running sum (partitioned) and the
        # cross-bucket prefix (<=1024 rows); frame-only: the grand-total
        # window over the same bounded prefix table.
        s.lstrip().startswith(("_bkt", "specifiedwindowframe"))
        for s in specs
    ), specs


def test_centroid_confusion_broadcasts_prototypes(spark):
    # The E-step scores |labels| prototypes per row via a broadcast of the
    # tiny centroid table; the only data-sized shuffles are the centroid
    # build and the per-vector argmin aggregate.
    p = _plan(spark, "b33_centroid_confusion")
    assert "BroadcastNestedLoopJoin" in p or "BroadcastExchange" in p
    assert "CartesianProduct" not in p


def test_snapshot_diff_is_one_full_outer_join(spark):
    p = _plan(spark, "b21_snapshot_diff")
    assert "FullOuter" in p
    assert p.count("SortMergeJoin") + p.count("ShuffledHashJoin") <= 1


def test_quartile_queries_have_no_global_window(spark):
    # VERDICT r5 #1/#2: the two former global-ntile plans must now bucket
    # via broadcast percentile cut points — NO Window operator at all, and
    # no single-partition exchange feeding a whole-table sort.
    for name in ("b17_window_ntile", "b34_curriculum"):
        p = _plan(spark, name)
        assert "Window" not in p, name
        # The only SinglePartition exchange allowed is the percentile
        # aggregate's final merge, which is fed by a map-side partial
        # (one bounded buffer row per task, never the data itself).
        assert "partial_percentile" in p, name
        assert "BroadcastExchange" in p, name  # 1-row cut points broadcast


def test_partitioned_ntile_single_hash_exchange(spark):
    # The genuine-ntile coverage slot sorts per nation behind exactly one
    # hash exchange — never a global (single-partition) order.
    p = _plan(spark, "b17_window_ntile_partitioned")
    assert "Window" in p
    assert p.count("Exchange hashpartitioning") == 1
    assert "Exchange SinglePartition" not in p


def test_left_agg_aggregates_below_join(spark):
    # VERDICT r5 #4: orders must be pre-aggregated by o_custkey BEFORE the
    # left join so the shuffle carries |custkeys| combined rows, not the
    # full join output. In the printed tree children come after parents,
    # so the per-custkey aggregate must appear BELOW (after) the join.
    p = _plan(spark, "b06_join_left_agg")
    assert "keys=[o_custkey" in p
    join_at = min(
        [i for i in (p.find("SortMergeJoin"), p.find("ShuffledHashJoin"),
                     p.find("BroadcastHashJoin")) if i >= 0]
    )
    assert join_at < p.rindex("keys=[o_custkey")


def test_token_budget_mix_window_is_bucket_partitioned(spark):
    # The data-sized running token sum must be partitioned by
    # (source, u-bucket) — a mega-source spreads across buckets instead
    # of one hot window partition. The cross-bucket prefix table and the
    # budget constant arrive by broadcast.
    p = _plan(spark, "b22_token_budget_mix")
    assert "windowspecdefinition(source" in p and "_bkt" in p
    assert "Exchange SinglePartition" not in p
    assert "BroadcastHashJoin" in p


def test_psi_drift_no_global_sort(spark):
    # Drift gates bucket via broadcast percentile cut points — no Window,
    # no data-sized single-partition stage (the only SinglePartition
    # exchanges merge bounded aggregate buffers / <=buckets-row tables).
    p = _plan(spark, "b28_psi_drift")
    assert "Window" not in p
    assert "partial_percentile" in p
    assert "CartesianProduct" not in p


def test_cdc_apply_is_antijoin_plus_union(spark):
    # The MERGE shape: base minus changed keys (anti join) union incoming
    # rows — never a nested loop, never a cartesian.
    p = _plan(spark, "b21_cdc_apply")
    assert "LeftAnti" in p and "Union" in p
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p


def test_incremental_agg_delta_join_bounded(spark):
    # The refresh joins the |groups|-sized old aggregate to the
    # change-volume delta aggregate — both sides pre-aggregated (partial
    # phases present) before any join; no cartesian anywhere.
    p = _plan(spark, "b11_incremental_agg")
    assert p.count("HashAggregate") >= 4  # partial+final on both sides
    assert "CartesianProduct" not in p


def test_semijoin_reduction_thins_fact_before_join(spark):
    # The runtime filter made explicit: a broadcast LEFT SEMI against the
    # filtered dim's distinct keys sits BELOW the main join, so fact rows
    # that cannot match never enter the join's exchange.
    p = _plan(spark, "b05_semijoin_reduction")
    semi = p.index("LeftSemi")
    assert "BroadcastHashJoin" in p[:semi + 200]
    # The semi filter appears under the main join in the plan tree (the
    # inner join prints first, the semi deeper).
    assert "Inner" in p[:semi]


def test_boilerplate_removal_never_shuffles_corpus(spark):
    # The boilerplate set collapses to ONE row and broadcasts
    # (BroadcastNestedLoopJoin); the removal itself is a row-local
    # higher-order filter. Only 16-byte digests ever hash-shuffle.
    p = _plan(spark, "b34_boilerplate_removal")
    assert "BroadcastNestedLoopJoin" in p
    assert "SortMergeJoin" not in p
    assert "md5" in p  # digests computed before the explode/aggregate


def test_cluster_dedup_quality_uses_no_window(spark):
    # Survivor selection is one map-side-combinable max_by per component —
    # not a ranking window over cluster members.
    p = _plan(spark, "b32_cluster_dedup_quality")
    assert "max_by" in p
    assert "CartesianProduct" not in p


def test_zvalue_interleave_is_shuffle_free(spark):
    # The Morton key is pure row-local shift/mask arithmetic: scan →
    # project, no exchange anywhere.
    p = _plan(spark, "bzo_zvalue_interleave")
    assert "Exchange" not in p


def test_temporal_split_filters_pushed_no_cartesian(spark):
    # Both time filters reach the parquet scan; the purge is a hash
    # left-anti join on the key — never a nested loop.
    p = _plan(spark, "b22_temporal_split")
    assert "PushedFilters: [IsNotNull(o_orderdate)" in p or "LessThan(o_orderdate" in p
    assert "LeftAnti" in p
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
