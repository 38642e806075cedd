"""Plan-shape tests — pin the physical properties the 100 TB design
depends on (SURVEY.md §4): pushdown, pruning, broadcast, shuffle count.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from nycitibike_data_transform_spark.models.rides import stage_rides
from nycitibike_data_transform_spark.plans import (
    count_exchanges,
    formatted_plan,
    has_broadcast_join,
    pushed_filters,
    read_schema_columns,
)
from nycitibike_data_transform_spark.queries import all_queries


def test_filter_and_projection_reach_the_scan(spark, sf_dir):
    q = all_queries()["filter_project"]
    df = q.spark(spark, sf_dir)
    filters = pushed_filters(df)
    assert any("o_orderstatus" in f for f in filters), filters
    assert any("o_totalprice" in f for f in filters), filters
    (cols,) = read_schema_columns(df)
    assert cols == {"o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"}


def test_stage_rides_is_shuffle_free_broadcast_pipeline(spark, sf_dir):
    """The flagship stage: conform-union is narrow, both dim joins
    broadcast ⇒ ZERO shuffle exchanges end to end."""
    t = {n: spark.read.parquet(f"{sf_dir}/{n}.parquet") for n in ("lineitem", "nation", "region")}
    df = stage_rides(t["lineitem"], t["nation"], t["region"])
    assert has_broadcast_join(df)
    assert count_exchanges(df) == 0, formatted_plan(df)


def test_stage_rides_prunes_unread_columns(spark, sf_dir):
    t = {n: spark.read.parquet(f"{sf_dir}/{n}.parquet") for n in ("lineitem", "nation", "region")}
    df = stage_rides(t["lineitem"], t["nation"], t["region"])
    lineitem_scans = [c for c in read_schema_columns(df) if "l_orderkey" in c]
    assert lineitem_scans, "expected lineitem scans in plan"
    # l_comment-style unused columns don't exist in testdata, but the
    # fhv feed branch must not read fare columns it doesn't project —
    # Spark still reads per-branch unioned columns; assert at least
    # that no scan reads more than the 11 columns lineitem has mapped.
    for cols in lineitem_scans:
        assert len(cols) <= 11, cols


def test_revenue_star_join_broadcasts_dims(spark, sf_dir):
    df = all_queries()["revenue_by_nation"].spark(spark, sf_dir)
    plan = formatted_plan(df)
    assert "BroadcastHashJoin" in plan
    # nation/region enter via broadcast, never a shuffle of the fact side keyed on them
    assert plan.count("BroadcastHashJoin") >= 2, plan


def test_single_aggregation_is_two_phase(spark, sf_dir):
    """Partial (map-side) aggregation before the exchange — the
    pattern that keeps 100 TB group-bys shuffle-light."""
    df = all_queries()["pricing_summary"].spark(spark, sf_dir)
    plan = formatted_plan(df)
    assert plan.count("HashAggregate") >= 2  # partial + final
    assert count_exchanges(df) == 1  # exactly one shuffle, on the group keys


def test_top_orders_uses_take_ordered(spark, sf_dir):
    """Global ORDER BY + LIMIT must plan as TakeOrderedAndProject
    (per-partition top-k + merge), not a full sort."""
    df = all_queries()["top_orders"].spark(spark, sf_dir)
    assert "TakeOrderedAndProject" in formatted_plan(df)


def test_dedup_exact_single_shuffle(spark, sf_dir):
    df = all_queries()["dedup_exact"].spark(spark, sf_dir)
    assert count_exchanges(df) == 1  # one shuffle on the fingerprint


def test_broadcast_join_query_no_shuffle(spark, sf_dir):
    dim = spark.read.parquet(f"{sf_dir}/nation.parquet")
    fact = spark.read.parquet(f"{sf_dir}/customer.parquet")
    joined = fact.join(F.broadcast(dim), fact.c_nationkey == dim.n_nationkey)
    assert has_broadcast_join(joined)
    assert count_exchanges(joined) == 0


def test_forecast_revenue_pushes_all_filters(spark, sf_dir):
    """Q6 shape: all three predicates must reach the parquet scan."""
    df = all_queries()["forecast_revenue"].spark(spark, sf_dir)
    filters = pushed_filters(df)
    assert any("l_discount" in f for f in filters), filters
    assert any("l_quantity" in f for f in filters), filters


def test_fast_money_path_avoids_decimal_aggregation(spark, sf_dir):
    """The money fast path must aggregate longs, not decimals — a
    DECIMAL sum buffer (precision > 18) regresses 7-20x (measured)."""
    df = all_queries()["pricing_summary"].spark(spark, sf_dir)
    plan = formatted_plan(df)
    agg_section = plan.split("HashAggregate", 1)[1]
    assert "sum(" in agg_section
    # decimal only appears post-aggregation (units -> amount division)
    first_agg_args = agg_section.split("Results")[0]
    assert "DecimalType" not in first_agg_args


def test_selective_star_join_filters_before_shuffle(spark, sf_dir):
    """Q3 shape: the customer segment filter must sit under its scan,
    not after the join."""
    df = all_queries()["shipping_priority"].spark(spark, sf_dir)
    filters = pushed_filters(df)
    assert any("c_mktsegment" in f for f in filters), filters
    assert any("o_orderdate" in f for f in filters), filters


def test_dedup_near_plans_as_banded_equi_join(spark, sf_dir):
    """The near-dedup default must be the LSH-blocked tier: candidate
    generation is an equi-join on (band, bucket) — never a
    BroadcastNestedLoopJoin over the pair space."""
    df = all_queries()["dedup_near"].spark(spark, sf_dir)
    plan = formatted_plan(df)
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "band" in plan and "bucket" in plan, plan


def test_ngram_jaccard_default_has_no_shingle_self_join(spark, sf_dir):
    """Blocked-by-default Jaccard: no exploded-shingle self-join (the
    r1 hot-key skew hazard); the only pair source is the banded
    bucket join."""
    df = all_queries()["ngram_jaccard"].spark(spark, sf_dir)
    plan = formatted_plan(df)
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "band" in plan and "bucket" in plan, plan


def test_embedding_near_dup_grid_is_pure_equi_join(spark, sf_dir):
    """The exhaustive grid tier (explicit opt-in): exact pair
    enumeration via the fragment-replicate grid join — a shuffled
    EQUI-join on (_lo, _hi) block keys — no broadcast nested loop, so
    no all-corpus-per-executor memory wall at scale."""
    from nycitibike_data_transform_spark.catalog import load_table
    from nycitibike_data_transform_spark.operators.dedup import (
        embedding_near_dup_pairs,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    df = embedding_near_dup_pairs(emb, 0.45, method="grid")
    plan = formatted_plan(df)
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "_lo" in plan and "_hi" in plan, plan


def test_embedding_near_dup_registry_is_probe_broadcast(spark, sf_dir):
    """The registry audit (VERDICT r6 item #1) must be LINEAR in the
    corpus: the bounded probe side enters as a broadcast (the BNLJ is
    probe×corpus — O(|probe|·n), the reviewed cosine_topk shape), and
    the full-corpus grid replication (_lo/_hi explode) must be gone."""
    df = all_queries()["embedding_near_dup"].spark(spark, sf_dir)
    plan = formatted_plan(df)
    assert "_lo" not in plan and "_hi" not in plan, plan
    assert "__p_id" in plan, plan


def test_decontaminate_broadcasts_benchmark_shingles(spark, sf_dir):
    """The benchmark side must enter as a broadcast (eval sets are tiny
    vs the corpus); the training corpus must never self-join."""
    df = all_queries()["decontaminate"].spark(spark, sf_dir)
    plan = formatted_plan(df)
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_stratified_sample_single_stratum_shuffle(spark, sf_dir):
    """Exact quotas need exactly one shuffle on the stratum key (both
    windows share the lang partitioning) — no second exchange."""
    df = all_queries()["stratified_sample"].spark(spark, sf_dir)
    assert count_exchanges(df) == 1, formatted_plan(df)


def test_source_mix_two_phase_agg_tiny_window(spark, sf_dir):
    """Token counting aggregates two-phase (partial before the
    exchange); the share window only ever sees post-agg rows."""
    df = all_queries()["source_mix_report"].spark(spark, sf_dir)
    plan = formatted_plan(df)
    assert plan.count("HashAggregate") >= 2, plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_dedup_incremental_no_quadratic_join(spark, sf_dir):
    """Cross-set banding meets in an equi-join; nothing quadratic, and
    neither full corpus is nested-loop joined."""
    df = all_queries()["dedup_incremental"].spark(spark, sf_dir)
    plan = formatted_plan(df)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_skew_join_events_two_path_plan(spark, sf_dir):
    """VERDICT r4 item 5: the skew-aware join must actually plan as
    two paths — hot keys through broadcast joins, cold keys through a
    separate join — unioned, with no nested-loop anywhere."""
    df = all_queries()["skew_join_events"].spark(spark, sf_dir)
    plan = formatted_plan(df)
    assert "Union" in plan, plan
    # semi split + anti split + hot-path dim join all broadcast
    assert plan.count("BroadcastHashJoin") >= 3, plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_column_profile_no_tier_plans_an_expand(spark, sf_dir):
    """The approx (HLL) tier must be a single-pass aggregate, and
    since OPTIMIZATION_r16 the exact tier must not Expand either: each
    exact NDV is its own plain two-phase distinct aggregate (partial
    group on the value, column-pruned scan) folded back as a 1-row
    broadcast scalar — the combined multi-countDistinct aggregate
    Spark would otherwise plan replicates every input row once per
    profiled column."""
    from nycitibike_data_transform_spark.catalog import load_table
    from nycitibike_data_transform_spark.queries.advanced import column_profile

    orders = load_table(spark, sf_dir, "orders")
    approx = column_profile(orders, ["o_orderkey", "o_custkey", "o_orderstatus"])
    assert "Expand" not in formatted_plan(approx)
    exact_plan = formatted_plan(
        column_profile(
            orders, ["o_orderkey", "o_custkey", "o_orderstatus"], ndv="exact"
        )
    )
    assert "Expand" not in exact_plan
    # one scalar fold per profiled column, each a broadcast build side
    # (formatted plans list each operator in the tree AND the detail
    # section, so count >= columns rather than an exact match)
    assert exact_plan.count("BroadcastNestedLoopJoin") >= 3
