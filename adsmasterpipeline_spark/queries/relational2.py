"""Second relational batch: the SQL-engine capabilities the reference
lacks but Spark SQL provides natively (SURVEY §2.5 'gaps' note —
grouping sets, pivot, statistical aggregates, similarity, correlated
subqueries). All oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..sources import load_table
from . import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@query(
    "rollup_revenue",
    """
    SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
           COALESCE(l_linestatus, 'ALL') AS linestatus,
           ROUND(SUM(l_extendedprice), 2) AS revenue,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """,
    "agg",
    doc="Hierarchical rollup totals (free from Spark SQL; absent in the "
        "reference, SURVEY §2.5).",
)
def rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.round(F.sum("l_extendedprice"), 2).alias("revenue"),
             F.count(F.lit(1)).alias("n"))
        .select(F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
                F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
                "revenue", "n")
    )


@query(
    "cube_order_stats",
    """
    SELECT COALESCE(o_orderstatus, 'ALL') AS status,
           COALESCE(o_orderpriority, 'ALL') AS priority,
           COUNT(*) AS n, ROUND(AVG(o_totalprice), 2) AS avg_price
    FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
    """,
    "agg",
    doc="Full cube over two dimensions.",
)
def cube_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"),
             F.round(F.avg("o_totalprice"), 2).alias("avg_price"))
        .select(F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
                F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
                "n", "avg_price")
    )


@query(
    "pivot_status_by_segment",
    """
    SELECT c_mktsegment,
           CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished,
           CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_pending
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c_mktsegment
    """,
    "agg",
    doc="Pivot (wide conditional aggregation) — segment × order status.",
)
def pivot_status_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    j = o.join(c, o.o_custkey == c.c_custkey)
    piv = (j.groupBy("c_mktsegment")
           .pivot("o_orderstatus", ["O", "F", "P"]).count())
    return piv.select(
        "c_mktsegment",
        F.coalesce("O", F.lit(0)).alias("n_open"),
        F.coalesce("F", F.lit(0)).alias("n_finished"),
        F.coalesce("P", F.lit(0)).alias("n_pending"))


@query(
    "stats_per_brand",
    """
    SELECT p_brand, COUNT(*) AS n,
           ROUND(AVG(p_retailprice), 4) AS mean_price,
           ROUND(stddev_samp(p_retailprice), 4) AS sd_price,
           ROUND(quantile_cont(p_retailprice, 0.5), 4) AS median_price,
           ROUND(MIN(p_retailprice), 2) AS min_price,
           ROUND(MAX(p_retailprice), 2) AS max_price
    FROM part GROUP BY p_brand
    """,
    "agg", "stats",
    doc="Statistical aggregates: stddev + exact interpolated median "
        "(Spark `percentile` == DuckDB `quantile_cont`).",
)
def stats_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    return p.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("p_retailprice"), 4).alias("mean_price"),
        F.round(F.stddev_samp("p_retailprice"), 4).alias("sd_price"),
        F.round(F.percentile("p_retailprice", F.lit(0.5)), 4).alias("median_price"),
        F.round(F.min("p_retailprice"), 2).alias("min_price"),
        F.round(F.max("p_retailprice"), 2).alias("max_price"),
    )


@query(
    "native_max_by",
    """
    SELECT n_nationkey AS nation, arg_max(c_name, c_acctbal) AS richest,
           ROUND(MAX(c_acctbal), 2) AS top_bal
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n_nationkey
    """,
    "agg",
    doc="A5/M6 as the native aggregate: max_by/arg_max (duplicate-repair "
        "latest-wins, scripts/fix_db_duplicates.py:57-73). NOTE: ties on "
        "c_acctbal would be nondeterministic — the synthetic doubles are "
        "tie-free, asserted by the oracle match itself.",
)
def native_max_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_nationkey").alias("nation"))
        .agg(F.max_by("c_name", "c_acctbal").alias("richest"),
             F.round(F.max("c_acctbal"), 2).alias("top_bal"))
    )


@query(
    "levenshtein_similarity",
    """
    WITH names AS (
      SELECT p_brand, p_name, COUNT(*) AS cnt
      FROM part GROUP BY p_brand, p_name
    ),
    cross_pairs AS (
      SELECT a.p_brand, levenshtein(a.p_name, b.p_name) AS d,
             a.cnt * b.cnt AS pairs
      FROM names a JOIN names b
        ON a.p_brand = b.p_brand AND a.p_name < b.p_name
      WHERE levenshtein(a.p_name, b.p_name) <= 3
    ),
    same_pairs AS (
      SELECT p_brand, 0 AS d, cnt * (cnt - 1) / 2 AS pairs
      FROM names WHERE cnt > 1
    ),
    allp AS (SELECT * FROM cross_pairs UNION ALL SELECT * FROM same_pairs)
    SELECT p_brand, CAST(SUM(pairs) AS BIGINT) AS near_pairs,
           CAST(SUM(pairs * d) AS BIGINT) AS total_dist
    FROM allp GROUP BY p_brand
    """,
    "functions", "validate",
    doc="F18 similarity analogue: edit-distance similarity join within "
        "brand blocks (the validator's SequenceMatcher maps to "
        "levenshtein thresholds), multiplicity-weighted. Round-5 scale "
        "rewrite: the levenshtein join runs on DISTINCT (brand, name) "
        "rows — |names|^2 per brand instead of |parts|^2 (the naive "
        "per-part enumeration was 800M string comparisons AND a ~50M-"
        "row output at the 10x stress SF: quadratic output is a query-"
        "DESIGN bug no engine fixes) — then expands by count products "
        "in exact integer arithmetic. Same-name pairs contribute "
        "C(cnt,2) at distance 0.",
)
def levenshtein_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    names = p.groupBy("p_brand", "p_name").agg(
        F.count(F.lit(1)).alias("cnt"))
    a, b = names.alias("a"), names.alias("b")
    dist = F.levenshtein(F.col("a.p_name"), F.col("b.p_name"))
    cross = (
        a.join(b, (F.col("a.p_brand") == F.col("b.p_brand"))
               & (F.col("a.p_name") < F.col("b.p_name")))
        .where(dist <= 3)
        .select(F.col("a.p_brand").alias("p_brand"), dist.alias("d"),
                (F.col("a.cnt") * F.col("b.cnt")).alias("pairs"))
    )
    same = names.where(F.col("cnt") > 1).select(
        "p_brand", F.lit(0).alias("d"),
        (F.col("cnt") * (F.col("cnt") - 1) / 2).cast("long")
        .alias("pairs"))
    return (cross.unionByName(same)
            .groupBy("p_brand")
            .agg(F.sum("pairs").cast("long").alias("near_pairs"),
                 F.sum(F.col("pairs") * F.col("d")).cast("long")
                 .alias("total_dist")))


@query(
    "correlated_small_quantity",
    """
    SELECT l.l_partkey, ROUND(SUM(l.l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem l
    JOIN (SELECT l_partkey AS pk, 0.5 * AVG(l_quantity) AS half_avg
          FROM lineitem GROUP BY l_partkey) t
      ON l.l_partkey = t.pk
    WHERE l.l_quantity < t.half_avg
    GROUP BY l.l_partkey
    """,
    "join", "tpch",
    doc="TPC-H Q17 shape: correlated scalar subquery decorrelated into a "
        "self-aggregation join (Catalyst performs the same rewrite).",
)
def correlated_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    avg = (li.groupBy(F.col("l_partkey").alias("pk"))
           .agg((F.avg("l_quantity") * 0.5).alias("half_avg")))
    return (
        li.join(avg, li.l_partkey == avg.pk)
        .where(F.col("l_quantity") < F.col("half_avg"))
        .groupBy("l_partkey")
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


@query(
    "min_cost_supplier",
    """
    WITH costs AS (
      SELECT l_partkey, l_suppkey, MIN(l_extendedprice / l_quantity) AS unit_cost
      FROM lineitem WHERE l_quantity > 0 GROUP BY l_partkey, l_suppkey
    ),
    best AS (SELECT l_partkey, MIN(unit_cost) AS best_cost FROM costs GROUP BY l_partkey)
    SELECT c.l_partkey, c.l_suppkey,
           CAST(FLOOR(c.unit_cost * 10000) AS BIGINT) AS unit_cost_e4
    FROM costs c JOIN best b
      ON c.l_partkey = b.l_partkey AND c.unit_cost = b.best_cost
    """,
    "join", "tpch",
    doc="TPC-H Q2 shape: min-cost supplier per part via groupBy + "
        "min-join (ties keep all minimal suppliers). Exact-double join and "
        "floor-scaled output — ROUND ties at the 4th decimal differ "
        "between engines; floor of the identical IEEE double does not.",
)
def min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_quantity") > 0)
    costs = (li.groupBy("l_partkey", "l_suppkey")
             .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity"))
                  .alias("unit_cost")))
    best = costs.groupBy(F.col("l_partkey").alias("pk")) \
        .agg(F.min("unit_cost").alias("best_cost"))
    return (
        costs.join(best, (costs.l_partkey == best.pk)
                   & (costs.unit_cost == best.best_cost))
        .select("l_partkey", "l_suppkey",
                F.floor(F.col("unit_cost") * 10000).alias("unit_cost_e4"))
    )


@query(
    "distinct_counts_exact_vs_approx",
    """
    SELECT l_returnflag,
           COUNT(DISTINCT l_orderkey) AS exact_cnt,
           TRUE AS approx_within_5pct
    FROM lineitem GROUP BY l_returnflag
    """,
    "agg", "stats",
    doc="A6 + HLL sketch: exact distinct count next to "
        "approx_count_distinct(rsd=0.01). The sketch value is "
        "engine-specific, so the checked claim is the BOUND: the Spark "
        "side emits whether |approx - exact| <= 5% of exact (and would "
        "fail the gate if the sketch drifted); the raw sketch value "
        "stays visible in the rows-only approx_distinct_raw twin.",
)
def distinct_counts_exact_vs_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_orderkey").alias("exact_cnt"),
        (F.abs(F.approx_count_distinct("l_orderkey", 0.01)
               - F.countDistinct("l_orderkey"))
         <= 0.05 * F.countDistinct("l_orderkey")).alias("approx_within_5pct"),
    )


@query(
    "approx_distinct_raw", None, "agg", "stats",
    doc="Raw approx_count_distinct sketch values (engine-specific -> "
        "rows-only); the 5%-bound claim is oracled in "
        "distinct_counts_exact_vs_approx.",
)
def approx_distinct_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_orderkey").alias("exact_cnt"),
        F.approx_count_distinct("l_orderkey", 0.01).alias("approx_cnt"),
    )
