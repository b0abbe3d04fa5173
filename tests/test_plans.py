"""Plan-shape regression guards: the scale properties the 100 TB design
depends on, asserted against the physical plan so a future edit can't
silently reintroduce a driver bottleneck or an unnecessary shuffle."""

from __future__ import annotations

import re

from streamroom_bigdata_spark import registry


def _plan(spark, name, sf_dir):
    return (
        registry.queries()[name](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )


def test_star_join_broadcasts_dims(spark, sf_dir):
    """Fact ⋈ 4 dims: every dim side broadcast, at most one shuffle join
    (lineitem ⋈ orders)."""
    plan = _plan(spark, "star_join_revenue", sf_dir)
    assert plan.count("BroadcastHashJoin") >= 3
    assert plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") <= 1


def test_topk_orders_is_distributed_topk(spark, sf_dir):
    plan = _plan(spark, "topk_orders", sf_dir)
    assert "TakeOrderedAndProject" in plan


def test_asof_join_single_shuffle_key(spark, sf_dir):
    """As-of emulation: exchanges only on the join/window key — no
    single-partition funnel."""
    plan = _plan(spark, "asof_join", sf_dir)
    assert "Exchange SinglePartition" not in plan


def test_quartiles_distributed_no_global_funnel(spark, sf_dir):
    plan = _plan(spark, "quartiles_distributed", sf_dir)
    assert "Exchange SinglePartition" not in plan


def test_sessionize_single_exchange(spark, sf_dir):
    """Both windows and the final aggregate share one user_id shuffle."""
    plan = _plan(spark, "sessionize_events", sf_dir)
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1
    assert "Exchange SinglePartition" not in plan


def test_pricing_summary_partial_aggregation(spark, sf_dir):
    """Map-side combine: partial_ aggregate functions below the exchange."""
    plan = _plan(spark, "pricing_summary", sf_dir)
    assert "partial_" in plan


def test_filters_push_into_scan(spark, sf_dir):
    """Predicate pushdown reaches the parquet reader on a filtered scan."""
    plan = _plan(spark, "semi_join_active_customers", sf_dir)
    assert "PushedFilters: [" in plan


def test_no_cartesian_products_in_headline(spark, sf_dir):
    import bench

    for name in bench.HEADLINE:
        plan = _plan(spark, name, sf_dir)
        assert "CartesianProduct" not in plan, name
