"""TPC-H-shape breadth batch: disjunctive predicates, conditional
ratios, multi-dimension join aggregates. All oracle-checked; each doc
notes the plan property the shape exercises.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from . import query


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


@query(
    "q4_order_priority",
    """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE CAST(o_orderdate AS DATE) >= DATE '1997-01-01'
      AND CAST(o_orderdate AS DATE) < DATE '1997-10-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND CAST(l.l_shipdate AS DATE) > CAST(o.o_orderdate AS DATE))
    GROUP BY o_orderpriority
    """,
    "tpch", "join",
    doc="TPC-H Q4: EXISTS with a correlated comparison -> left-semi join "
        "with a post-join predicate; orderdate filter pushed to the scan.",
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate").cast("date") >= F.lit("1997-01-01").cast("date"))
        & (F.col("o_orderdate").cast("date") < F.lit("1997-10-01").cast("date")))
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    semi = o.join(
        li, (o.o_orderkey == li.l_orderkey)
        & (li.l_shipdate.cast("date") > o.o_orderdate.cast("date")),
        "left_semi")
    return semi.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count"))


@query(
    "q7_volume_shipping",
    """
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           strftime(l.l_shipdate, '%Y') AS l_year,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    GROUP BY n1.n_name, n2.n_name, strftime(l.l_shipdate, '%Y')
    """,
    "tpch", "join",
    doc="TPC-H Q7: two-role dimension (nation joined twice under "
        "different aliases) + disjunctive cross-filter + year bucketing.",
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation"))
    # fold each nation role into its dimension FIRST: Catalyst already
    # infers supp_nation/cust_nation IN (N1,N2) from the disjunction
    # and pushes it into the nation scans, so s_nat/c_nat carry only
    # the two relevant nations' rows — the fact sides are then
    # pre-filtered to ~2/25 of rows BEFORE the lineitem-orders join
    # instead of after it (the nation joins used to run last)
    # broadcast hints ONLY on the bare nation table (25 rows, bounded
    # by the schema). s_nat/c_nat are supplier x nation / customer x
    # nation — O(suppliers) / O(customers), which SCALE WITH THE FACT
    # DATA: a forced hint would pin them as broadcasts regardless of
    # size (driver OOM at 100 TB). AQE picks broadcast for them at
    # bench scale on real size estimates and falls back to a shuffle
    # join when they outgrow the threshold.
    s_nat = s.join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
    c_nat = c.join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
    o_nat = o.join(c_nat.select("c_custkey", "cust_nation"),
                   F.col("o_custkey") == F.col("c_custkey"))
    j = (li.join(s_nat.select("s_suppkey", "supp_nation"),
                 li.l_suppkey == F.col("s_suppkey"))
         .join(o_nat, li.l_orderkey == F.col("o_orderkey"))
         .where(((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
                | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))))
    return j.groupBy(
        "supp_nation", "cust_nation",
        F.date_format("l_shipdate", "yyyy").alias("l_year"),
    ).agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
          .alias("revenue"))


@query(
    "q12_shipmode_priority",
    """
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE CAST(l.l_shipdate AS DATE) >= DATE '1998-01-01'
    GROUP BY l_linestatus
    """,
    "tpch", "agg",
    doc="TPC-H Q12 shape: conditional split counts after a fact-fact join.",
)
def q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate").cast("date") >= F.lit("1998-01-01").cast("date"))
    o = _t(spark, sf_dir, "orders")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
             F.sum(F.when(~hi, 1).otherwise(0)).alias("low_line_count"))
    )


@query(
    "q14_promo_revenue",
    """
    SELECT ROUND(100.00 * SUM(CASE WHEN p.p_type = 'PROMO'
                    THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END)
                 / SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS promo_pct
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE CAST(l.l_shipdate AS DATE) >= DATE '1997-01-01'
      AND CAST(l.l_shipdate AS DATE) < DATE '1997-02-01'
    """,
    "tpch", "agg",
    doc="TPC-H Q14: conditional-ratio aggregate over a broadcast "
        "dimension join.",
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate").cast("date") >= F.lit("1997-01-01").cast("date"))
        & (F.col("l_shipdate").cast("date") < F.lit("1997-02-01").cast("date")))
    p = _t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0)
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(F.round(100.0 * F.sum(promo) / F.sum(rev), 4).alias("promo_pct"))
    )


@query(
    "q19_disjunctive",
    """
    SELECT ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           COUNT(*) AS n
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity >= 5 AND l.l_quantity <= 20)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 11 AND 20
           AND l.l_quantity >= 10 AND l.l_quantity <= 30)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 21 AND 30
           AND l.l_quantity >= 20 AND l.l_quantity <= 40)
    """,
    "tpch", "join",
    doc="TPC-H Q19 shape: disjunction of conjunctive band predicates "
        "across both join sides — Catalyst extracts the common join key "
        "so this stays an equi-join, not a nested loop.",
)
def q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    b = F.col("p_brand")
    sz = F.col("p_size")
    q = F.col("l_quantity")
    cond = (
        ((b == "Brand#1") & sz.between(1, 10) & q.between(5, 20))
        | ((b == "Brand#2") & sz.between(11, 20) & q.between(10, 30))
        | ((b == "Brand#3") & sz.between(21, 30) & q.between(20, 40)))
    return j.where(cond).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
        .alias("revenue"),
        F.count(F.lit(1)).alias("n"))
