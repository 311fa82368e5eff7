"""Bucketed co-located join: the plan must contain NO Exchange when
both sides are bucketed by the join key with equal bucket counts."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from adsmasterpipeline_spark.sources import load_table
from adsmasterpipeline_spark.sources.bucketed import (
    bucketed_join, write_bucketed,
)
from adsmasterpipeline_spark.plans.explain import explain_str
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    orders = load_table(spark, SF_DIR, "orders") \
        .select("o_orderkey", "o_custkey", "o_totalprice")
    lineitem = load_table(spark, SF_DIR, "lineitem") \
        .select(F.col("l_orderkey").alias("o_orderkey"), "l_quantity")
    write_bucketed(orders, "b_orders", "o_orderkey", 8)
    write_bucketed(lineitem, "b_lineitem", "o_orderkey", 8)
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    """With broadcast off (fact-to-fact: both sides too big to
    broadcast at 100 TB), the sort-merge join must consume the
    bucketing directly — zero Exchange, zero Sort (sortBy buckets)."""
    left, right = bucketed_tables
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, left, right, "o_orderkey")
        plan = explain_str(joined, "formatted")
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan, plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_join_values_match_shuffled_join(spark, bucketed_tables):
    left, right = bucketed_tables
    joined = bucketed_join(spark, left, right, "o_orderkey")
    orders = load_table(spark, SF_DIR, "orders")
    lineitem = load_table(spark, SF_DIR, "lineitem")
    expected = orders.join(
        lineitem.select(F.col("l_orderkey").alias("o_orderkey"),
                        "l_quantity"), "o_orderkey")
    assert joined.count() == expected.count()
    # integer-exact comparison: double sums are association-order
    # dependent across different physical plans
    a = joined.agg(F.sum(F.col("l_quantity").cast("long")),
                   F.sum(F.floor("o_totalprice"))).collect()[0]
    b = expected.agg(F.sum(F.col("l_quantity").cast("long")),
                     F.sum(F.floor("o_totalprice"))).collect()[0]
    assert tuple(a) == tuple(b)


def test_bucketed_agg_skips_shuffle(spark, bucketed_tables):
    """groupBy on the bucket key also reuses the bucketing — no
    Exchange before the aggregate."""
    left, _ = bucketed_tables
    df = spark.table(left).groupBy("o_orderkey") \
        .agg(F.sum("o_totalprice").alias("tp"))
    assert "Exchange" not in explain_str(df, "formatted")
