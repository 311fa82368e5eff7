"""Z-order layout: bucket ids cover the space, and — the actual point
of the curve — every bucket is confined to a small rectangle in BOTH
key dimensions, which single-column sorting cannot do."""

from __future__ import annotations

from pyspark.sql import functions as F

from adsmasterpipeline_spark.operators.layout import (
    interleave_bits, skipping_stats, zorder_layout)

SF_DIR = "/root/testdata/sf0.001"


def test_interleave_known_values(spark):
    df = spark.createDataFrame([(0b101, 0b011)], ["a", "b"])
    # a -> even bits: 1_0_1 -> 0b10001; b -> odd bits: 0_1_1 -> 0b001010
    out = df.select(interleave_bits(F.col("a"), F.col("b")).alias("z"))
    assert out.collect()[0]["z"] == 0b011011


def test_zorder_buckets_bounded_in_both_dims(spark):
    from adsmasterpipeline_spark.sources import load_table
    li = load_table(spark, SF_DIR, "lineitem")
    stats = skipping_stats(li, "l_partkey", "l_suppkey",
                           bucket_bits=6).collect()
    assert len(stats) == 64
    max_p = li.agg(F.max("l_partkey")).collect()[0][0]
    max_s = li.agg(F.max("l_suppkey")).collect()[0][0]
    # 6 bucket bits = 3 per dimension -> each bucket spans at most 1/8
    # of each key domain (plus one quantization step of slack).
    for r in stats:
        assert r["max_l_partkey"] - r["min_l_partkey"] <= max_p / 8 + max_p / 64
        assert r["max_l_suppkey"] - r["min_l_suppkey"] <= max_s / 8 + max_s / 64


def test_zorder_assignment_is_narrow(spark):
    # No exchange before the bucket assignment: the zvalue/zbucket
    # columns must come from a project over the scan (plus the tiny
    # broadcast of the max aggregate), never a sort or repartition.
    from adsmasterpipeline_spark.sources import load_table
    li = load_table(spark, SF_DIR, "lineitem")
    plan = zorder_layout(li, "l_partkey", "l_suppkey") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Sort" not in plan.split("BroadcastExchange")[0]
    assert "hashpartitioning" not in plan
