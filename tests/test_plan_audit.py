"""Pin the structural plan classifier (plans/explain.plan_scale_issues):
global-aggregate partials-merges and TopK funnels classify bounded, a
global window classifies UNBOUNDED, broadcast-build nested loops are
bounded via the broadcast cap."""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from adsmasterpipeline_spark.plans.explain import plan_scale_issues


def test_global_agg_partials_merge_is_bounded(spark):
    df = spark.range(1000).agg(F.sum("id").alias("s"))
    issues = plan_scale_issues(df)
    assert all(i["bounded"] for i in issues), issues


def test_orderby_limit_is_bounded_topk(spark):
    df = spark.range(1000).orderBy(F.col("id").desc()).limit(5)
    issues = plan_scale_issues(df)
    assert all(i["bounded"] for i in issues), issues


def test_global_window_is_unbounded_funnel(spark):
    df = spark.range(1000).withColumn(
        "rn", F.row_number().over(W.orderBy("id")))
    issues = plan_scale_issues(df)
    assert any(i["kind"] == "single_partition" and not i["bounded"]
               for i in issues), issues


def test_broadcast_nested_loop_is_bounded_via_broadcast(spark):
    a = spark.range(100)
    b = F.broadcast(spark.range(3).select(F.col("id").alias("j")))
    df = a.join(b, a["id"] > b["j"])
    issues = plan_scale_issues(df)
    nl = [i for i in issues if i["kind"] == "nested_loop"]
    assert nl and all(i["bounded"] for i in nl), issues


def test_explode_above_limit_is_unbounded(spark):
    """A row-multiplying Generate above a limit breaks boundedness:
    the funnel below it must NOT be certified bounded."""
    df = (spark.range(100).limit(5)
          .select(F.explode(F.sequence(F.lit(0), F.col("id") * 1000))
                  .alias("x"))
          .repartition(8)
          .withColumn("rn", F.row_number().over(W.orderBy("x"))))
    issues = plan_scale_issues(df)
    assert any(i["kind"] == "single_partition" and not i["bounded"]
               for i in issues), issues


def test_broadcast_nested_loop_is_flagged_distinctly(spark):
    """The broadcast-build allowance must stay VISIBLE: every BNLJ
    whose boundedness came only from the broadcast cap carries
    via='broadcast-build', and tools/plan_audit FLAGs any query with
    more of them than its explicit allowlist entry — an accidental
    non-equi join with a small build side must not auto-certify
    (the probe side is unbounded; output is probe x build)."""
    a = spark.range(100)
    b = F.broadcast(spark.range(3).select(F.col("id").alias("j")))
    df = a.join(b, a["id"] > b["j"])
    issues = plan_scale_issues(df)
    nl = [i for i in issues if i["kind"] == "nested_loop"]
    assert nl and all(i.get("via") == "broadcast-build" for i in nl)

    # the audit's gate logic: 1 broadcast-build BNLJ vs allowance 0
    import tools.plan_audit as pa
    bnl = [i for i in issues if i.get("via") == "broadcast-build"]
    allowed, _ = pa.KNOWN_BROADCAST_NESTED.get("not_allowlisted", (0, ""))
    assert len(bnl) > allowed  # would FLAG, not auto-certify

    # a STRUCTURALLY bounded build side (one-row aggregate) does not
    # need the allowance and must not carry the marker
    one = F.broadcast(spark.range(50).agg(F.max("id").alias("m")))
    df2 = spark.range(100).join(one, F.col("id") > F.col("m"))
    nl2 = [i for i in plan_scale_issues(df2)
           if i["kind"] == "nested_loop"]
    assert nl2 and all(i["bounded"] for i in nl2)
    assert all(i.get("via") != "broadcast-build" for i in nl2), nl2
