"""As-of join and range join unit tests (edges the oracle queries
don't reach: strict mode, no-match rows, empty/degenerate bands)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from adsmasterpipeline_spark.operators.temporal import (
    asof_join, range_join_bucketed,
)


def ts(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


def _sides(spark):
    left = spark.createDataFrame(
        [(1, "u1", ts(10)), (2, "u1", ts(12)), (3, "u2", ts(9))],
        "lid int, k string, lts timestamp")
    right = spark.createDataFrame(
        [(100, "u1", ts(9)), (101, "u1", ts(11)), (102, "u1", ts(12)),
         (103, "u3", ts(1))],
        "rid int, k string, rts timestamp")
    return left, right


def test_asof_backward(spark):
    left, right = _sides(spark)
    out = {r["lid"]: r for r in
           asof_join(left, right, on="k", left_ts="lts",
                     right_ts="rts").collect()}
    assert out[1]["asof_rid"] == 100          # 09:00 click before 10:00
    assert out[2]["asof_rid"] == 102          # ties (12:00) match non-strict
    assert out[3]["asof_rid"] is None         # u2 has no right rows


def test_asof_strict_excludes_equal_ts(spark):
    left, right = _sides(spark)
    out = {r["lid"]: r for r in
           asof_join(left, right, on="k", left_ts="lts", right_ts="rts",
                     strict=True).collect()}
    assert out[2]["asof_rid"] == 101          # 12:00 excluded, 11:00 wins


def test_range_join_exact_and_clamped(spark):
    facts = spark.range(0, 100).select((F.col("id") % 60).alias("v"))
    bands = spark.createDataFrame(
        [("a", 0.0, 20.0), ("b", 20.0, 40.0), ("c", 40.0, 1e12)],
        "band string, lo double, hi double")
    out = range_join_bucketed(facts, bands, "v", bucket_width=7.0)
    counts = {r["band"]: r["count"] for r in
              out.groupBy("band").count().collect()}
    # ids 0..99 -> v = id % 60: each v in 0..39 appears twice except 40..59 once
    assert counts["a"] == 2 * 20
    assert counts["b"] == 2 * 20
    assert counts["c"] == 20
    # every fact lands in exactly one band
    assert sum(counts.values()) == 100


def test_range_join_band_outside_domain(spark):
    facts = spark.range(0, 10).select(F.col("id").cast("double").alias("v"))
    bands = spark.createDataFrame(
        [("far", 1e6, 2e6)], "band string, lo double, hi double")
    assert range_join_bucketed(facts, bands, "v").count() == 0
