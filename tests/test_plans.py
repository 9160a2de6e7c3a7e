"""Plan-shape contracts for the headline queries — the scale
properties that must survive a 100× data increase, asserted on the
physical plan rather than eyeballed (SURVEY §4: the reference's
hand-set physical knobs become Catalyst obligations we verify)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hadron_spark.plans import (
    assert_broadcast_join,
    assert_no_shuffle,
    assert_partial_aggregation,
    assert_pushed_filters,
    codegen_stage_count,
    shuffle_count,
)
from hadron_spark.queries import QUERIES


@pytest.fixture(scope="module")
def q(spark, sf_dir):
    def build(name):
        return QUERIES[name](spark, sf_dir)

    return build


def test_q01_single_shuffle_partial_agg(q):
    df = q("q01_pricing_summary")
    assert shuffle_count(df) == 1  # one exchange on the group keys
    assert_partial_aggregation(df)  # combiner before it


def test_q01_whole_stage_codegen(spark, sf_dir):
    # AQE finalizes codegen lazily; toggle it off to see the spans
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        df = QUERIES["q01_pricing_summary"](spark, sf_dir)
        assert codegen_stage_count(df) >= 2  # scan+partial, final agg
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_q03_narrow_with_pushdown(q):
    df = q("q03_filter_project")
    assert_no_shuffle(df)  # map-only job (M5)
    assert_pushed_filters(df, "c_acctbal")  # predicate reaches the scan


def test_q04_topk_no_global_sort(q):
    df = q("q04_topk_orders")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert shuffle_count(df) == 0  # per-partition heaps + driver merge


def test_q07_join_chain_bounded_shuffles(q):
    df = q("q07_join_nway_revenue")
    # 3 table reads + agg may never exceed one exchange per shuffle
    # boundary: li⋈o key, re-key to custkey, final agg
    assert shuffle_count(df) <= 3
    assert_partial_aggregation(df)


def test_q09_dims_broadcast_one_shuffle(q):
    df = q("q09_broadcast_region_rollup")
    assert_broadcast_join(df, expected=2)  # nation AND region map-side
    assert shuffle_count(df) == 1  # only the final agg exchanges data


def test_q25_corpus_never_shuffled_for_scoring(q):
    df = q("q25_ann_bruteforce")
    plan = df._jdf.queryExecution().executedPlan().toString()
    # query set broadcast → scoring is narrow over the corpus scan;
    # the only shuffle is the per-query top-k window
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert shuffle_count(df) <= 1


def test_q21_dedup_partial_agg(q):
    df = q("q21_dedup_exact")
    assert shuffle_count(df) == 1
    assert_partial_aggregation(df)


def test_q15_window_single_shuffle(q):
    df = q("q15_window_lag")
    assert shuffle_count(df) == 1  # one hash exchange on user_id


def test_bucketed_join_plans_no_exchange(spark, sf_dir, tmp_path):
    """Co-located big-big join: both sides bucketed+sorted on the join
    key → SortMergeJoin with zero exchanges (the 100 TB fact-join
    path; SURVEY §2.6 O1/O4 persistent form)."""
    from hadron_spark.plans.inspect import shuffle_count
    from hadron_spark.sources.bucketing import bucketed_join, bucketed_write
    from hadron_spark.sources.taps import tap

    spark.sql("DROP TABLE IF EXISTS t_orders_b")
    spark.sql("DROP TABLE IF EXISTS t_lineitem_b")
    orders = tap(f"{sf_dir}/orders.parquet").read(spark).select(
        "o_orderkey", "o_totalprice"
    )
    lineitem = tap(f"{sf_dir}/lineitem.parquet").read(spark).select(
        "l_orderkey", "l_quantity"
    )
    bucketed_write(orders, "t_orders_b", ["o_orderkey"], 4, sort_cols=["o_orderkey"])
    bucketed_write(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "t_lineitem_b",
        ["o_orderkey"],
        4,
        sort_cols=["o_orderkey"],
    )
    joined = bucketed_join(spark, "t_orders_b", "t_lineitem_b", ["o_orderkey"])
    assert shuffle_count(joined) == 0, joined._jdf.queryExecution().executedPlan().toString()
    # and it actually computes
    assert joined.count() > 0
    spark.sql("DROP TABLE t_orders_b")
    spark.sql("DROP TABLE t_lineitem_b")


def test_partitioned_write_prunes_partitions(spark, sf_dir, tmp_path):
    """Hive-partitioned layout + partition-predicate ⇒ the scan lists
    only the matching directory (PartitionFilters, not a full scan) —
    the partition-pruning leg of SURVEY §4."""
    from hadron_spark.sources.fanout import partitioned_write
    from hadron_spark.sources.taps import tap

    orders = tap(f"{sf_dir}/orders.parquet").read(spark)
    out = str(tmp_path / "orders_by_status")
    partitioned_write(orders, out, ["o_orderstatus"])
    back = spark.read.parquet(out).filter(F.col("o_orderstatus") == "F")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "o_orderstatus" in plan.split("PartitionFilters", 1)[1][:200]
    n_f = back.count()
    assert n_f == orders.filter(F.col("o_orderstatus") == "F").count()


def test_zorder_write_disjoint_file_ranges(spark, sf_dir, tmp_path):
    from pyspark.sql import functions as F

    from hadron_spark.sources.layout import zorder_value, zorder_write

    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    out = str(tmp_path / "zorded")
    zorder_write(c, out, ["c_custkey", "c_nationkey"], num_files=4)
    back = spark.read.parquet(out)
    # same rows survive the layout rewrite
    assert back.count() == c.count()
    # range partitioning on the Morton code ⇒ per-file z ranges are
    # disjoint — the property that makes row-group min/max stats prune
    spans = (
        back.withColumn("_z", zorder_value(["c_custkey", "c_nationkey"], bits=10))
        .withColumn("f", F.input_file_name())
        .groupBy("f")
        .agg(F.min("_z").alias("lo"), F.max("_z").alias("hi"))
        .collect()
    )
    ivals = sorted((r["lo"], r["hi"]) for r in spans)
    assert len(ivals) >= 2
    for (l1, h1), (l2, h2) in zip(ivals, ivals[1:]):
        assert h1 <= l2


def test_hilbert_write_disjoint_file_ranges(spark, sf_dir, tmp_path):
    from pyspark.sql import functions as F

    from hadron_spark.sources.layout import hilbert_value, hilbert_write

    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    out = str(tmp_path / "hilberted")
    hilbert_write(c, out, "c_custkey", "c_nationkey", num_files=4)
    back = spark.read.parquet(out)
    assert back.count() == c.count()
    # range partitioning on the curve distance ⇒ per-file d ranges
    # are disjoint (zorder_write's pruning contract, tighter boxes)
    spans = (
        back.withColumn("_h", hilbert_value("c_custkey", "c_nationkey", bits=10))
        .withColumn("f", F.input_file_name())
        .groupBy("f")
        .agg(F.min("_h").alias("lo"), F.max("_h").alias("hi"))
        .collect()
    )
    ivals = sorted((r["lo"], r["hi"]) for r in spans)
    assert len(ivals) >= 2
    for (l1, h1), (l2, h2) in zip(ivals, ivals[1:]):
        assert h1 <= l2


def test_new_query_plan_shapes(spark, sf_dir):
    """Pin the plan properties of the round-1 late additions (the
    shapes PLANS.md documents); a regression that reintroduces a
    global-sort top-k or un-broadcasts the bounds shows up here."""
    from hadron_spark.plans.inspect import explain_str
    from hadron_spark.queries import QUERIES

    # q61: per-doc top-k pushed into the window, not a full rank+filter
    p61 = explain_str(QUERIES["q61_tfidf_topk"](spark, sf_dir))
    assert "WindowGroupLimit" in p61

    # q66/q62: global top-k = TakeOrderedAndProject, never a 1-partition sort
    p66 = explain_str(QUERIES["q66_collocations"](spark, sf_dir))
    assert "TakeOrderedAndProject" in p66
    p62 = explain_str(QUERIES["q62_bm25_topk"](spark, sf_dir))
    assert "TakeOrderedAndProject" in p62

    # q73: quantile bounds broadcast back at the fact table
    p73 = explain_str(QUERIES["q73_outlier_trim"](spark, sf_dir))
    assert "BroadcastHashJoin" in p73

    # q74: unpivot is an Expand node (narrow), not a union of scans
    # (simple mode: formatted explain repeats each node in the details)
    p74 = explain_str(QUERIES["q74_unpivot"](spark, sf_dir), mode="simple")
    assert "Expand" in p74
    assert p74.count("FileScan parquet") == 1


def test_analytics_batch5_plan_shapes(spark, sf_dir):
    """q91-q95: shuffle reuse and pruning pins for the gaps-and-
    islands / sweep / mode / pareto batch."""
    from hadron_spark.plans.inspect import (
        assert_broadcast_join,
        explain_str,
        shuffle_count,
    )
    from hadron_spark.queries import QUERIES

    # q91: distinct + per-customer window; both follow-up groupBys
    # cluster on a superset of the window key, so NO extra exchange.
    q91 = QUERIES["q91_order_streaks"](spark, sf_dir)
    assert shuffle_count(q91) == 2
    rows = {r["o_custkey"]: r for r in q91.collect()}
    assert all(r["longest_streak"] >= 1 for r in rows.values())

    # q93: count shuffle + per-user window, pruned to 1 row pre-filter
    q93 = QUERIES["q93_modal_event_type"](spark, sf_dir)
    assert "WindowGroupLimit" in explain_str(q93)

    # q94: dim side broadcast; cumulative window runs post-aggregation
    q94 = QUERIES["q94_pareto_brands"](spark, sf_dir)
    assert_broadcast_join(q94)
    out = sorted(q94.collect(), key=lambda r: r["rnk"])
    assert abs(out[-1]["cum_share"] - 1.0) < 1e-9
    assert all(
        a["cum_share"] < b["cum_share"] for a, b in zip(out, out[1:])
    )

    # q92: sweep totals match a driver-side reference on sf0.001
    q92 = QUERIES["q92_max_concurrency"](spark, sf_dir)
    got = {r["month"]: r["max_concurrent"] for r in q92.collect()}
    assert got and all(v >= 1 for v in got.values())

    # q95: canonical ids are always smaller than the doc they replace
    q95 = QUERIES["q95_dedup_canonical"](spark, sf_dir)
    assert all(r["canonical_id"] < r["doc_id"] for r in q95.collect())


def test_analytics_batch6_plan_shapes(spark, sf_dir):
    """q100-q105 pins: fused pipeline stays at 2 shuffles, salted
    join keeps its broadcasts, session_window is a single user-key
    shuffle."""
    from hadron_spark.plans.inspect import shuffle_count
    from hadron_spark.queries import QUERIES

    # q100: quality→dedup→lang→split→budget fused over ONE scan;
    # only the dedup window + final agg may shuffle
    assert shuffle_count(QUERIES["q100_corpus_prep"](spark, sf_dir)) == 2

    # q102: salt spine and dim replicate via broadcast — exactly one
    # real (agg) exchange
    q102 = QUERIES["q102_salted_join_rollup"](spark, sf_dir)
    assert shuffle_count(q102) == 1

    # q104: left join + two partial-agg'd aggregations
    assert shuffle_count(QUERIES["q104_custdist"](spark, sf_dir)) == 2

    # q105: native session_window = one shuffle on the session key
    assert shuffle_count(
        QUERIES["q105_session_window_batch"](spark, sf_dir)
    ) == 1


def test_analytics_batch7_plan_shapes(spark, sf_dir):
    """q116-q128 pins: broadcast-back statistics stay broadcast,
    shrinking-key aggregations stay at their shuffle budget."""
    from hadron_spark.plans.inspect import (
        assert_broadcast_join,
        shuffle_count,
    )
    from hadron_spark.queries import QUERIES

    # q116: two partial-agg shuffles on shrinking keys, nothing else
    assert shuffle_count(QUERIES["q116_gini_impurity"](spark, sf_dir)) == 2

    # q119: per-type moments broadcast back onto the event scan —
    # exactly one real (agg) exchange
    q119 = QUERIES["q119_zscore_outliers"](spark, sf_dir)
    assert_broadcast_join(q119)
    assert shuffle_count(q119) == 1

    # q123: per-part average broadcast back, agg shuffles only
    q123 = QUERIES["q123_below_avg_quantity"](spark, sf_dir)
    assert_broadcast_join(q123)

    # q124: ONE conditional-min pass over the scan (the naive
    # two-CTE form would need two), plus the 1-row final agg
    assert shuffle_count(QUERIES["q124_conversion_latency"](spark, sf_dir)) == 2

    # q127: first-touch map broadcast onto the purchase scan
    assert_broadcast_join(QUERIES["q127_first_touch_attribution"](spark, sf_dir))

    # q121: grid join + LOCF window reuse the user-key partitioning;
    # span agg, grid join, window, and nothing more
    assert shuffle_count(QUERIES["q121_locf_resample"](spark, sf_dir)) <= 4


def test_analytics_batch8_plan_shapes(spark, sf_dir):
    """q137-q147 pins: broadcast-backs stay broadcast, shrinking-key
    aggregations stay in budget, shared-shuffle windows don't split."""
    from hadron_spark.plans.inspect import (
        assert_broadcast_join,
        shuffle_count,
    )
    from hadron_spark.queries import QUERIES

    # q137: join + two shrinking aggs (customer, then nation)
    assert shuffle_count(QUERIES["q137_hhi_concentration"](spark, sf_dir)) <= 3

    # q142: per-type totals broadcast back onto the month table
    assert_broadcast_join(QUERIES["q142_seasonality_index"](spark, sf_dir))

    # q144: first-order map broadcast back; no window over the fact
    assert_broadcast_join(QUERIES["q144_new_vs_repeat_mix"](spark, sf_dir))

    # q145: lag + session-id windows share ONE user-key shuffle;
    # funnel agg + final 1-row agg complete the budget
    assert shuffle_count(QUERIES["q145_session_funnel"](spark, sf_dir)) <= 3

    # q146: single partial-agg'd shuffle over the discount bands
    assert shuffle_count(
        QUERIES["q146_discount_band_response"](spark, sf_dir)
    ) == 1

    # q147: close-out join is broadcast — history never re-shuffles
    assert_broadcast_join(QUERIES["q147_scd2_as_of"](spark, sf_dir))


def test_analytics_batch9_plan_shapes(spark, sf_dir):
    """q148-q150 pins: dimension joins stay broadcast; moment/agg
    shuffles stay on shrinking keys; windows and pair joins run on
    the pre-aggregated frame only."""
    from hadron_spark.plans.inspect import (
        assert_broadcast_join,
        assert_partial_aggregation,
        shuffle_count,
    )
    from hadron_spark.queries import QUERIES

    # q148: broadcast part join, ONE partial-agg'd shuffle onto brands
    df = QUERIES["q148_qty_discount_corr"](spark, sf_dir)
    assert_broadcast_join(df)
    assert shuffle_count(df) == 1
    assert_partial_aggregation(df)

    # q149: broadcast join + brand×month agg + brand lag window
    df = QUERIES["q149_revenue_bridge"](spark, sf_dir)
    assert_broadcast_join(df)
    assert shuffle_count(df) <= 2

    # q150: everything past the partial-agg'd brand×month shuffle
    # (rank window, lag window, month pair join, tau agg) moves only
    # the tiny aggregate; the raw-fact subtree appears twice via the
    # self-join, hence the doubled budget
    df = QUERIES["q150_rank_stability"](spark, sf_dir)
    assert_broadcast_join(df, expected=2)
    assert shuffle_count(df) <= 10


def test_analytics_batch10_plan_shapes(spark, sf_dir):
    """q151-q154 pins: the fact join partial-aggregates onto tiny
    key spaces; apportionment/heatmap/migration windows run on
    aggregates only."""
    from hadron_spark.plans.inspect import (
        assert_partial_aggregation,
        shuffle_count,
    )
    from hadron_spark.queries import QUERIES

    # q151: fact⋈fact shuffle join (2) + priority×month agg (1)
    df = QUERIES["q151_sla_compliance"](spark, sf_dir)
    assert shuffle_count(df) <= 3
    assert_partial_aggregation(df)

    # q152: one partial-agg'd shuffle onto ≤168 cells + share window
    df = QUERIES["q152_activity_heatmap"](spark, sf_dir)
    assert shuffle_count(df) <= 2
    assert_partial_aggregation(df)

    # q153: nation agg + three single-partition windows on 25 rows
    assert shuffle_count(
        QUERIES["q153_largest_remainder"](spark, sf_dir)
    ) <= 4

    # q154: two per-customer aggs + ntile windows + key join
    assert shuffle_count(
        QUERIES["q154_segment_migration"](spark, sf_dir)
    ) <= 8


def test_analytics_batch11_plan_shapes(spark, sf_dir):
    """q155-q157 pins: fact scans partial-aggregate before any
    window; ordering windows run on day/month/customer aggregates."""
    from hadron_spark.plans.inspect import (
        assert_partial_aggregation,
        shuffle_count,
    )
    from hadron_spark.queries import QUERIES

    # q155: day agg + ordering window + final 1-row moment agg
    df = QUERIES["q155_revenue_autocorr"](spark, sf_dir)
    assert shuffle_count(df) <= 3
    assert_partial_aggregation(df)

    # q156: per-customer max + month count + ~80-row at-risk window
    df = QUERIES["q156_churn_hazard"](spark, sf_dir)
    assert shuffle_count(df) <= 4
    assert_partial_aggregation(df)

    # q157: customer agg + rank window + 1-row reduction
    df = QUERIES["q157_spend_gini"](spark, sf_dir)
    assert shuffle_count(df) <= 3
    assert_partial_aggregation(df)


def test_analytics_batch12_plan_shapes(spark, sf_dir):
    """q158-q159 pins: the statistic runs on one row after the fact
    join aggregates to two keys; the sourcing dedup collapses
    map-side before its shuffle."""
    from hadron_spark.plans.inspect import (
        assert_broadcast_join,
        assert_partial_aggregation,
        shuffle_count,
    )
    from hadron_spark.queries import QUERIES

    # q158: orderkey join (2) + two-key agg (1) + one-row pivot (1)
    df = QUERIES["q158_return_rate_ztest"](spark, sf_dir)
    assert shuffle_count(df) <= 4
    assert_partial_aggregation(df)

    # q159: supplier dim broadcast; part×nation distinct dedups
    # map-side; counting shuffles shrink to |parts| then ~25 rows
    df = QUERIES["q159_multi_sourcing"](spark, sf_dir)
    assert_broadcast_join(df)
    assert shuffle_count(df) <= 3
    assert_partial_aggregation(df)


def test_analytics_batch13_plan_shapes(spark, sf_dir):
    """q160-q162 pins: rolling/neighbor windows run on day/hour
    aggregates; weighted-rate columns ride one aggregate pass."""
    from hadron_spark.plans.inspect import (
        assert_partial_aggregation,
        shuffle_count,
    )
    from hadron_spark.queries import QUERIES

    # q160: day agg + one ordering window on the day frame
    df = QUERIES["q160_bollinger_bands"](spark, sf_dir)
    assert shuffle_count(df) <= 2
    assert_partial_aggregation(df)

    # q161: type×hour agg; lag+lead share ONE window; ~6-key summary
    df = QUERIES["q161_peak_detection"](spark, sf_dir)
    assert shuffle_count(df) <= 3
    assert_partial_aggregation(df)
    # one Window node — lag and lead did not split the pass
    from hadron_spark.plans.inspect import _plan
    assert _plan(df).count("Window") - _plan(df).count("WindowGroupLimit") == 1

    # q162: numerator and denominator in the SAME single shuffle
    df = QUERIES["q162_effective_tax_rate"](spark, sf_dir)
    assert shuffle_count(df) == 1
    assert_partial_aggregation(df)


def test_analytics_batch14_plan_shapes(spark, sf_dir):
    """q163 pin: nation min/max broadcasts back onto the scan; the
    only real shuffle is the nation×segment rollup."""
    from hadron_spark.plans.inspect import (
        assert_broadcast_join,
        assert_partial_aggregation,
        shuffle_count,
    )
    from hadron_spark.queries import QUERIES

    df = QUERIES["q163_minmax_scaling"](spark, sf_dir)
    assert_broadcast_join(df)
    assert shuffle_count(df) <= 2
    assert_partial_aggregation(df)


def test_analytics_batch15_plan_shapes(spark, sf_dir):
    """q164-q165 pins: cohort maps broadcast back; both gap windows
    reuse one customer-key exchange."""
    from hadron_spark.plans.inspect import (
        assert_broadcast_join,
        shuffle_count,
    )
    from hadron_spark.queries import QUERIES

    # q164: cohort map + cohort sizes both broadcast back
    df = QUERIES["q164_cohort_ltv_curve"](spark, sf_dir)
    assert_broadcast_join(df, expected=2)
    assert shuffle_count(df) <= 6

    # q165: lag, rank, and count windows share the customer-key
    # exchange; only the week-bucket histogram adds one more
    df = QUERIES["q165_reorder_gap_median"](spark, sf_dir)
    assert shuffle_count(df) <= 2


def test_analytics_batch16_plan_shapes(spark, sf_dir):
    """q166-q167 pins: the 5-table star keeps every dim broadcast
    around one fact⋈fact shuffle; hashing stays narrow until the
    64-slot census."""
    from hadron_spark.plans.inspect import (
        assert_broadcast_join,
        assert_partial_aggregation,
        shuffle_count,
    )
    from hadron_spark.queries import QUERIES

    # q166: 4 broadcasts (customer, supplier, nation ×2); the only
    # real shuffles are the orderkey join + corridor aggregate
    df = QUERIES["q166_trade_corridors"](spark, sf_dir)
    assert_broadcast_join(df, expected=4)
    assert shuffle_count(df) <= 3

    # q167: narrow tokenize+hash; count-distinct dedups map-side
    df = QUERIES["q167_feature_hashing"](spark, sf_dir)
    assert shuffle_count(df) <= 2
    assert_partial_aggregation(df)


def test_analytics_batch17_plan_shapes(spark, sf_dir):
    """q168-q169 pins: the position map broadcasts back (text never
    enters the global sort); dispersion moments ride shrinking-key
    aggregates."""
    from hadron_spark.plans.inspect import (
        assert_broadcast_join,
        assert_partial_aggregation,
        shuffle_count,
    )
    from hadron_spark.queries import QUERIES

    # q168: doc_id-only position window + broadcast-back; token
    # first-seen min partial-aggregates; 10-row decile frame after
    df = QUERIES["q168_vocab_growth"](spark, sf_dir)
    assert_broadcast_join(df)
    assert shuffle_count(df) <= 4
    assert_partial_aggregation(df)

    # q169: type×day then type — two shrinking-key shuffles
    df = QUERIES["q169_burstiness_fano"](spark, sf_dir)
    assert shuffle_count(df) <= 2
    assert_partial_aggregation(df)


def test_analytics_batch18_plan_shapes(spark, sf_dir):
    """q170 pin: the dense-sequence audit is one partial-aggregated
    order-key pass plus a one-row rollup — no window, no join."""
    from hadron_spark.plans.inspect import (
        assert_partial_aggregation,
        shuffle_count,
    )
    from hadron_spark.queries import QUERIES

    df = QUERIES["q170_sequence_audit"](spark, sf_dir)
    assert shuffle_count(df) <= 3
    assert_partial_aggregation(df)
    assert "Window" not in df._jdf.queryExecution().executedPlan().toString()


def test_range_rank_queries_no_single_partition_window(spark, sf_dir):
    """VERDICT r1 #4: the six queries that ranked a per-entity
    aggregate through an unpartitioned window now run through
    ops.range_rank / ops.spine_running — pin that no WindowExec in
    their plans funnels everything into one task."""
    from hadron_spark.plans import assert_no_unpartitioned_window

    for name in [
        "q118_decile_lift",
        "q139_rfm_segments",
        "q143_skyline_orders",
        "q154_segment_migration",
        "q157_spend_gini",
        "q168_vocab_growth",
    ]:
        assert_no_unpartitioned_window(QUERIES[name](spark, sf_dir))


def test_crawl_pipeline_single_shuffle(spark, sf_dir):
    """q176 capstone pin: the whole HTML→dedup→redact→gate hygiene
    chain fuses into the scan stage; the ONLY exchange is the final
    per-source accounting aggregate (partial-agg'd)."""
    from hadron_spark.plans.inspect import (
        assert_partial_aggregation,
        shuffle_count,
    )
    from hadron_spark.queries import QUERIES

    df = QUERIES["q176_crawl_pipeline"](spark, sf_dir)
    assert shuffle_count(df) == 1
    assert_partial_aggregation(df)


def test_r2_training_primitive_plan_shapes(spark, sf_dir):
    """q183/q185 pins: the packer's only exchange is the banded
    prefix-sum window (never a single-partition window); the Gram
    pass shuffles only per-batch d×d partial rows, and the corpus
    side of both plans stays un-exchanged."""
    from hadron_spark.plans.inspect import (
        shuffle_count,
        unpartitioned_window_count,
    )
    from hadron_spark.queries import QUERIES

    # q183: prefix-sum exchange + the narrow explode on top; the
    # localCheckpoint pin truncates lineage, so the visible plan is
    # the banded window + explode only
    df = QUERIES["q183_pack_sequences"](spark, sf_dir)
    assert unpartitioned_window_count(df) == 0
    assert shuffle_count(df) <= 2

    # q185: mapInPandas partials then ONE partial-agg'd exchange of
    # O(batches·d²) rows — the corpus itself never exchanges
    df = QUERIES["q185_gram_matrix"](spark, sf_dir)
    assert shuffle_count(df) == 1
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan


def test_percentiles_and_upsample_plan_shapes(spark, sf_dir):
    """q193: exact percentiles rank via banded range_rank — no
    unpartitioned window anywhere; q194: upsampling is fully narrow
    (bucket filter + explode, zero exchanges)."""
    from hadron_spark.plans.inspect import (
        shuffle_count,
        unpartitioned_window_count,
    )
    from hadron_spark.queries import QUERIES

    df = QUERIES["q193_exact_percentiles"](spark, sf_dir)
    assert unpartitioned_window_count(df) == 0
    assert shuffle_count(df) <= 3  # band window + 5-row final agg

    df = QUERIES["q194_mixture_upsample"](spark, sf_dir)
    assert shuffle_count(df) == 0
    assert unpartitioned_window_count(df) == 0


def test_r4_perplexity_and_url_plan_shapes(spark, sf_dir):
    """Round-4 pins.  q223 perplexity scoring: the model rides
    2N-1=5 BROADCAST joins (never a sort-merge join against the
    B-bounded count table) and the only exchange is the per-doc
    aggregation; the position explode happens ONCE (the
    tokenize-per-slice-reference regression this round fixed would
    show as no Generate or as repeated scans).  q227 URL
    canonicalization: pure in-row expressions, zero shuffle.  q229
    blocklist (list shape): zero shuffle.  q228 quota: exactly the
    one domain-keyed exchange for its window."""
    from hadron_spark.plans.inspect import shuffle_count
    from hadron_spark.queries import QUERIES

    df = QUERIES["q223_perplexity_scores"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") == 5
    assert "SortMergeJoin" not in plan
    assert shuffle_count(df) == 1  # the per-doc mean

    df = QUERIES["q227_url_normalize"](spark, sf_dir)
    assert shuffle_count(df) == 0

    df = QUERIES["q229_domain_blocklist"](spark, sf_dir)
    assert shuffle_count(df) == 0

    df = QUERIES["q228_domain_quota"](spark, sf_dir)
    assert shuffle_count(df) == 1  # the reg_dom window


def test_r4_dhash_pair_join_shape(spark):
    """image_near_dup_pairs: the dHash pass is mapInPandas with no
    exchange before it; the pair stage is the pigeonhole block
    EQUI-join (shuffled hash or sort-merge on (blk, ckey) — never a
    nested-loop/cartesian product)."""
    from hadron_spark.llm import multimodal as mm

    df = spark.createDataFrame(
        [(f"p{i}.png", bytes([i]) * 32) for i in range(8)],
        "path string, content binary",
    )
    out = mm.image_near_dup_pairs(df, pixels_fn=mm.pixels_stub)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the hash pass itself (pre-pin — the eager pin truncates the
    # pair plan's lineage) is one Arrow batch pass, no exchange
    hplan = (
        mm.dhash_images(df, pixels_fn=mm.pixels_stub)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "MapInPandas" in hplan
    assert "Exchange" not in hplan


class TestPlanLintAudit:
    """Unit contracts for tools/plan_lint.audit — the structural
    rules that clear the two scale-safe plan shapes (two-phase
    global aggregate; 1-row-total broadcast) and flag everything
    else for a written bounded-frame justification."""

    @staticmethod
    def _audit(plan):
        import importlib.util
        import os

        spec = importlib.util.spec_from_file_location(
            "plan_lint",
            os.path.join(os.path.dirname(__file__), "..", "tools", "plan_lint.py"),
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod.audit(plan)

    def test_two_phase_global_agg_is_auto_safe(self):
        plan = (
            "+- HashAggregate(keys=[], functions=[sum(x)])\n"
            "   +- Exchange SinglePartition, ENSURE_REQUIREMENTS\n"
            "      +- HashAggregate(keys=[], functions=[partial_sum(x)])\n"
            "         +- FileScan parquet\n"
        )
        a = self._audit(plan)
        assert a["1p"] == 1 and a["unsafe_1p"] == 0

    def test_singlepartition_over_raw_rows_is_flagged(self):
        plan = (
            "+- Window [sum(x)]\n"
            "   +- Exchange SinglePartition, ENSURE_REQUIREMENTS\n"
            "      +- Project [x]\n"
            "         +- FileScan parquet\n"
        )
        a = self._audit(plan)
        assert a["unsafe_1p"] == 1

    def test_one_row_broadcast_bnlj_is_auto_safe(self):
        plan = (
            "+- BroadcastNestedLoopJoin BuildRight, Cross\n"
            "   :- FileScan parquet\n"
            "   +- BroadcastExchange IdentityBroadcastMode\n"
            "      +- HashAggregate(keys=[], functions=[count(1)])\n"
            "         +- FileScan parquet\n"
        )
        a = self._audit(plan)
        assert a["bnlj"] == 1 and a["unsafe_bnlj"] == 0

    def test_unbounded_bnlj_is_flagged(self):
        plan = (
            "+- BroadcastNestedLoopJoin BuildRight, Cross\n"
            "   :- FileScan parquet\n"
            "   +- BroadcastExchange IdentityBroadcastMode\n"
            "      +- FileScan parquet\n"
        )
        a = self._audit(plan)
        assert a["unsafe_bnlj"] == 1

    def test_keyed_agg_in_build_side_does_not_clear_bnlj(self):
        # a keyed aggregate can be arbitrarily large — only the
        # keyless (1-row) shape is proof of boundedness
        plan = (
            "+- BroadcastNestedLoopJoin BuildRight, Cross\n"
            "   :- FileScan parquet\n"
            "   +- BroadcastExchange IdentityBroadcastMode\n"
            "      +- HashAggregate(keys=[k#1], functions=[count(1)])\n"
            "         +- FileScan parquet\n"
        )
        a = self._audit(plan)
        assert a["unsafe_bnlj"] == 1

    def test_agg_outside_broadcast_subtree_does_not_clear(self):
        # the stream side has a global agg; the build side is raw —
        # the subtree walk must scope the proof to the build side
        plan = (
            "+- BroadcastNestedLoopJoin BuildRight, Cross\n"
            "   :- HashAggregate(keys=[], functions=[count(1)])\n"
            "   :  +- Exchange SinglePartition, ENSURE_REQUIREMENTS\n"
            "   :     +- HashAggregate(keys=[], functions=[partial_count(1)])\n"
            "   +- BroadcastExchange IdentityBroadcastMode\n"
            "      +- FileScan parquet\n"
        )
        a = self._audit(plan)
        assert a["unsafe_bnlj"] == 1 and a["unsafe_1p"] == 0

    def test_cartesian_always_counted(self):
        a = self._audit("+- CartesianProduct\n   :- A\n   +- B\n")
        assert a["cart"] == 1


def test_key_skew_profile_exact(spark):
    from fractions import Fraction

    from hadron_spark.plans.diag import key_skew_profile

    rows = [("a",)] * 50 + [("b",)] * 30 + [("c",)] * 30 + [("d",)] * 7 + [
        ("e",)
    ] * 3
    df = spark.createDataFrame(rows, "k string")
    got = key_skew_profile(df, ["k"], top=3, n_partitions=10).collect()
    assert [(r["k"], r["cnt"], r["rank"]) for r in got] == [
        ("a", 50, 1), ("b", 30, 2), ("c", 30, 3)
    ]
    for r in got:
        assert r["n_total"] == 120 and r["n_keys"] == 5
        assert r["share"] == float(Fraction(r["cnt"], 120))
        assert r["skew"] == float(Fraction(r["cnt"] * 5, 120))
        assert r["salt"] == -((-r["cnt"] * 10) // 120)  # ceil


def test_join_cardinality_matches_real_join(spark):
    import random

    from hadron_spark.plans.diag import join_cardinality

    rng = random.Random(3)
    left = [(rng.randint(0, 15),) for _ in range(200)] + [(None,)] * 5
    right = [(rng.randint(0, 20),) for _ in range(300)] + [(None,)] * 2
    ldf = spark.createDataFrame(left, "k int")
    rdf = spark.createDataFrame(right, "k int")
    got = join_cardinality(ldf, rdf, ["k"]).collect()[0]
    real = ldf.join(rdf, "k").count()
    assert got["out_rows"] == real
    assert got["left_rows"] == 205 and got["right_rows"] == 302
    from collections import Counter

    lc = Counter(k for (k,) in left if k is not None)
    rc = Counter(k for (k,) in right if k is not None)
    assert got["matching_keys"] == len(set(lc) & set(rc))
    assert got["max_key_out"] == max(lc[k] * rc[k] for k in set(lc) & set(rc))
    assert got["amplification"] == real / max(205, 302)
    # key counts exclude the NULL group (ADVICE r4): NULL-key rows
    # count in *_rows but can never participate in the inner join
    assert got["left_keys"] == len(lc) and got["right_keys"] == len(rc)


def test_key_skew_profile_validation(spark):
    import pytest

    from hadron_spark.plans.diag import join_cardinality, key_skew_profile

    df = spark.createDataFrame([(1,)], "k int")
    with pytest.raises(ValueError):
        key_skew_profile(df, [])
    with pytest.raises(ValueError):
        key_skew_profile(df, ["k"], top=0)
    with pytest.raises(ValueError):
        join_cardinality(df, df, [])
