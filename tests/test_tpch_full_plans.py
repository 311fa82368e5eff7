"""Physical-plan assertions for the tpch_full batch: the docstring
claims (dimension broadcasts, pushdown, no cartesian joins, scalar
subqueries as broadcasts) must hold in the executed plan."""

from __future__ import annotations

from adsmasterpipeline_spark.plans.explain import (
    join_strategies, pushed_filters, read_schemas,
)
from adsmasterpipeline_spark.queries import REGISTRY, _load
from tests.conftest import SF_DIR

_load()


def _q(spark, name):
    return REGISTRY[name].spark_fn(spark, SF_DIR)


def test_q6_pure_scan_filter_agg(spark):
    df = _q(spark, "q6_forecast_revenue")
    assert join_strategies(df) == []
    pf = pushed_filters(df)
    assert any("l_discount" in f for f in pf), pf
    assert any("l_quantity" in f for f in pf), pf
    # projection pruning: 11-column table, 4 needed
    rs = read_schemas(df)[0]
    assert "l_orderkey" not in rs and "l_returnflag" not in rs


def test_q8_snowflake_all_dims_broadcast(spark):
    df = _q(spark, "q8_market_share")
    s = join_strategies(df)
    assert s.count("BroadcastHashJoin") >= 5, s
    assert "CartesianProduct" not in s
    assert any("p_type" in f for f in pushed_filters(df))


def test_q9_broadcasts_and_name_filter_pushed(spark):
    df = _q(spark, "q9_product_profit")
    s = join_strategies(df)
    assert s.count("BroadcastHashJoin") >= 3, s
    pf = pushed_filters(df)
    assert any("p_name" in f for f in pf), pf


def test_q11_threshold_is_broadcast_not_cartesian_shuffle(spark):
    # The scalar-subquery threshold must reach the filter via a
    # broadcast (BroadcastNestedLoopJoin over 1 row is fine);
    # a CartesianProduct would be a plan regression.
    df = _q(spark, "q11_important_stock")
    s = join_strategies(df)
    assert "CartesianProduct" not in s, s


def test_q18_semi_join_before_fact_join(spark):
    df = _q(spark, "q18_large_volume")
    s = join_strategies(df)
    assert "CartesianProduct" not in s
    # the HAVING-IN subquery compiles to a semi join (broadcast or
    # shuffled, either is fine — it must not be an inner join that
    # duplicates rows)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan, plan[:2000]


def test_q3_pushdown_and_dim_broadcast(spark):
    df = _q(spark, "q3_shipping_priority")
    pf = pushed_filters(df)
    assert any("c_mktsegment" in f for f in pf), pf
    s = join_strategies(df)
    assert "CartesianProduct" not in s
    assert "BroadcastHashJoin" in s, s


def test_q10_returned_items_pushdown(spark):
    df = _q(spark, "q10_returned_items")
    pf = pushed_filters(df)
    assert any("l_returnflag" in f for f in pf), pf
    assert "CartesianProduct" not in join_strategies(df)


def test_q22_anti_join_not_cartesian(spark):
    # NOT EXISTS -> anti join; the scalar avg-balance threshold arrives
    # by 1-row broadcast, never a cartesian of data-sized sides
    df = _q(spark, "q22_global_sales_opportunity")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan, plan[:2000]
    assert "CartesianProduct" not in join_strategies(df)


def test_all_tpch_full_no_cartesian(spark):
    """Blanket sweep: no tpch_full shape may degrade to a cartesian
    product — scalar subqueries broadcast, correlations decorrelate."""
    names = [n for n in REGISTRY
             if n.startswith("q") and n[1].isdigit()]
    assert len(names) >= 16, names
    for n in names:
        s = join_strategies(_q(spark, n))
        assert "CartesianProduct" not in s, f"{n}: {s}"


def test_q21_single_aggregation_no_self_join_blowup(spark):
    # The EXISTS/NOT-EXISTS pair is collapsed into one per-order
    # aggregate: exactly 2 lineitem scans would mean the collapse
    # regressed (1 scan for the join + 0 extra).
    from adsmasterpipeline_spark.plans.explain import scan_count
    df = _q(spark, "q21_suppliers_kept_waiting")
    assert scan_count(df) <= 3  # lineitem + orders + supplier
    assert "CartesianProduct" not in join_strategies(df)
