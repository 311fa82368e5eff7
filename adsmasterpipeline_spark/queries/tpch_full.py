"""Full TPC-H breadth: the remaining query shapes (Q3, Q6, Q8-Q11,
Q13, Q15, Q16, Q18, Q20-Q22) adapted to the driver's simplified star
schema.  Q2 and Q17 shapes already exist as ``min_cost_supplier`` and
``correlated_small_quantity``; Q1/Q4/Q5/Q7/Q12/Q14/Q19 live in
``tpch_more.py``.

Schema adaptations (documented per query): there is no ``partsupp``
table, no ``l_commitdate``/``l_receiptdate``, and no comment/phone
columns, so Q11/Q16/Q20 derive supply facts from ``lineitem`` history
and Q21/Q22 use date/priority proxies.  Every adaptation preserves the
*plan shape* the original query exercises (scalar subquery, correlated
agg-vs-agg, distinct-count grouping, anti-join with scalar threshold).

Determinism rules (see oracle registry docstring): aggregate-derived
display values are FLOOR-scaled integers (cents / ppm), never ROUND;
comparisons use exact doubles or integers; no LIMIT without a total
order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from . import query


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


def _rev():
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


def _rev_c():
    """Per-row revenue in floored integer cents.

    FLOOR of a per-row product is identical cross-engine (IEEE ops on
    identical inputs are deterministic), and integer sums are
    order-independent — unlike FLOOR(SUM(double)*100), which flips at
    integer-cent boundaries when the two engines sum in different
    orders."""
    return F.floor(_rev() * 100).cast("bigint")


@query(
    "q3_shipping_priority",
    """
    SELECT l.l_orderkey,
           CAST(SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 100)
                         AS BIGINT)) AS BIGINT) AS revenue_c,
           CAST(o.o_orderdate AS DATE) AS order_date,
           o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND CAST(o.o_orderdate AS DATE) < DATE '1998-06-01'
      AND CAST(l.l_shipdate AS DATE) > DATE '1998-06-01'
    GROUP BY l.l_orderkey, CAST(o.o_orderdate AS DATE), o.o_orderpriority
    """,
    "tpch", "join",
    doc="TPC-H Q3: segment-filtered customer dim broadcast into the "
        "orders⋈lineitem fact join; revenue per still-open order. "
        "No LIMIT (the driver hash is order-insensitive; a top-k "
        "without total order would be non-deterministic).",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    o = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate").cast("date") < F.lit("1998-06-01").cast("date"))
    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate").cast("date") > F.lit("1998-06-01").cast("date"))
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy(
            "l_orderkey",
            F.col("o_orderdate").cast("date").alias("order_date"),
            "o_orderpriority")
        .agg(F.sum(_rev_c()).alias("revenue_c"))
        .select("l_orderkey", "revenue_c", "order_date", "o_orderpriority")
    )


@query(
    "q6_forecast_revenue",
    """
    SELECT CAST(SUM(CAST(FLOOR(l_extendedprice * l_discount * 100) AS BIGINT))
                AS BIGINT) AS revenue_c,
           COUNT(*) AS n
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
      AND CAST(l_shipdate AS DATE) < DATE '1998-01-01'
      AND l_discount >= 0.05 AND l_discount <= 0.07
      AND l_quantity < 24
    """,
    "tpch", "agg",
    doc="TPC-H Q6: pure scan-filter-aggregate — every predicate is "
        "parquet-pushable, the whole query is one WholeStageCodegen "
        "span with a partial+final agg and no join.",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate").cast("date") >= F.lit("1997-01-01").cast("date"))
            & (F.col("l_shipdate").cast("date") < F.lit("1998-01-01").cast("date"))
            & (F.col("l_discount") >= 0.05) & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24))
        .agg(
            F.sum(F.floor(F.col("l_extendedprice") * F.col("l_discount") * 100)
                  .cast("bigint")).alias("revenue_c"),
            F.count(F.lit(1)).alias("n"))
    )


@query(
    "q8_market_share",
    """
    WITH vol AS (
      SELECT strftime(o.o_orderdate, '%Y') AS o_year,
             CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 100)
                  AS BIGINT) AS volume_c,
             ns.n_name AS supp_nation
      FROM lineitem l
      JOIN part p     ON l.l_partkey = p.p_partkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation ns  ON s.s_nationkey = ns.n_nationkey
      JOIN orders o   ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation nc  ON c.c_nationkey = nc.n_nationkey
      JOIN region r   ON nc.n_regionkey = r.r_regionkey
      WHERE p.p_type = 'STANDARD' AND r.r_name = 'ASIA'
        AND CAST(o.o_orderdate AS DATE) >= DATE '1996-01-01'
        AND CAST(o.o_orderdate AS DATE) < DATE '1998-01-01'
    )
    SELECT o_year,
           CAST(FLOOR(1000000.0
                * SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume_c ELSE 0 END)
                / SUM(volume_c)) AS BIGINT) AS mkt_share_ppm
    FROM vol GROUP BY o_year
    """,
    "tpch", "join",
    doc="TPC-H Q8: national market share — 7-table snowflake join with "
        "every dimension broadcast, conditional-ratio aggregate by year; "
        "ppm floor-scaled (ROUND half-ties diverge cross-engine).",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").where(F.col("p_type") == "STANDARD") \
        .select("p_partkey")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    ns = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("ns_key"),
        F.col("n_name").alias("supp_nation"))
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate").cast("date") >= F.lit("1996-01-01").cast("date"))
        & (F.col("o_orderdate").cast("date") < F.lit("1998-01-01").cast("date")))
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nc = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("nc_key"),
        F.col("n_regionkey").alias("nc_region"))
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA") \
        .select("r_regionkey")
    vol = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("ns_key"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("nc_key"))
        .join(F.broadcast(r), F.col("nc_region") == F.col("r_regionkey")))
    national = F.when(F.col("supp_nation") == "NATION_3", _rev_c()).otherwise(F.lit(0).cast("bigint"))
    return (
        vol.groupBy(F.date_format("o_orderdate", "yyyy").alias("o_year"))
        .agg(F.floor(1000000.0 * F.sum(national) / F.sum(_rev_c()))
             .cast("bigint").alias("mkt_share_ppm"))
    )


@query(
    "q9_product_profit",
    """
    SELECT ns.n_name AS nation,
           strftime(o.o_orderdate, '%Y') AS o_year,
           CAST(SUM(CAST(FLOOR((l.l_extendedprice * (1 - l.l_discount)
                          - 0.1 * p.p_retailprice * l.l_quantity) * 100)
                         AS BIGINT)) AS BIGINT) AS profit_c
    FROM lineitem l
    JOIN part p     ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation ns  ON s.s_nationkey = ns.n_nationkey
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    WHERE p.p_name LIKE '%widget%'
    GROUP BY ns.n_name, strftime(o.o_orderdate, '%Y')
    """,
    "tpch", "join",
    doc="TPC-H Q9: product-line profit by supplier nation and year. "
        "No partsupp table in this schema, so supply cost is the "
        "documented proxy 0.1 * p_retailprice per unit — same join "
        "graph and agg shape as the original.",
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").where(F.col("p_name").contains("widget")) \
        .select("p_partkey", "p_retailprice")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    ns = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("nation"))
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    profit_c = F.floor(
        (_rev() - 0.1 * F.col("p_retailprice") * F.col("l_quantity")) * 100
    ).cast("bigint")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("ns_key"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("nation", F.date_format("o_orderdate", "yyyy").alias("o_year"))
        .agg(F.sum(profit_c).alias("profit_c"))
    )


@query(
    "q10_returned_items",
    """
    SELECT c.c_custkey, c.c_name,
           CAST(SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 100)
                         AS BIGINT)) AS BIGINT) AS revenue_c,
           c.c_acctbal, n.n_name
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND CAST(o.o_orderdate AS DATE) >= DATE '1997-10-01'
      AND CAST(o.o_orderdate AS DATE) < DATE '1998-01-01'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    """,
    "tpch", "join",
    doc="TPC-H Q10: revenue lost to returns per customer for one "
        "quarter; nation dim broadcast, returnflag filter pushed into "
        "the lineitem scan.",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate").cast("date") >= F.lit("1997-10-01").cast("date"))
        & (F.col("o_orderdate").cast("date") < F.lit("1998-01-01").cast("date")))
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(_rev_c()).alias("revenue_c"))
        .select("c_custkey", "c_name", "revenue_c", "c_acctbal", "n_name")
    )


@query(
    "q11_important_stock",
    """
    WITH value_by_part AS (
      SELECT l.l_partkey,
             CAST(SUM(CAST(FLOOR(l.l_quantity * p.p_retailprice * 100)
                           AS BIGINT)) AS BIGINT) AS part_value_c
      FROM lineitem l
      JOIN part p     ON l.l_partkey = p.p_partkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n   ON s.s_nationkey = n.n_nationkey
      WHERE n.n_name = 'NATION_5'
      GROUP BY l.l_partkey
    )
    SELECT l_partkey, part_value_c
    FROM value_by_part
    WHERE part_value_c * 10000 > (SELECT SUM(part_value_c) FROM value_by_part)
    """,
    "tpch", "agg",
    doc="TPC-H Q11: important-stock scalar-subquery threshold. No "
        "partsupp table, so per-part value derives from lineitem "
        "shipment history (qty * retailprice) for one nation's "
        "suppliers; the HAVING-vs-global-fraction shape (grouped agg "
        "compared against a broadcast scalar of the same agg) is "
        "preserved. The threshold compare uses the exact double — "
        "floor-scaling only the displayed value.",
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_retailprice")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = _t(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_5") \
        .select("n_nationkey")
    by_part = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("l_partkey")
        .agg(F.sum(F.floor(F.col("l_quantity") * F.col("p_retailprice") * 100)
                   .cast("bigint")).alias("part_value_c")))
    threshold = by_part.agg(F.sum("part_value_c").alias("total_c"))
    return (
        by_part.crossJoin(F.broadcast(threshold))
        .where(F.col("part_value_c") * 10000 > F.col("total_c"))
        .select("l_partkey", "part_value_c")
    )


@query(
    "q13_customer_distribution",
    """
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                        AND o.o_orderpriority <> '5-LOW'
      GROUP BY c.c_custkey
    )
    GROUP BY c_count
    """,
    "tpch", "agg",
    doc="TPC-H Q13: customer order-count distribution — left outer "
        "join with a join-side-only predicate (kept in the ON clause, "
        "NOT the WHERE, which would turn it inner), then a second "
        "aggregation over the first's result. The priority filter "
        "stands in for the original's comment NOT LIKE (no comment "
        "column in this schema).",
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    o = _t(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != "5-LOW").select("o_custkey", "o_orderkey")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count")))
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "q15_top_supplier",
    """
    WITH revenue AS (
      SELECT l_suppkey,
             CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100)
                           AS BIGINT)) AS BIGINT) AS total_revenue_c
      FROM lineitem
      WHERE CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
        AND CAST(l_shipdate AS DATE) < DATE '1997-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue_c
    FROM revenue r JOIN supplier s ON r.l_suppkey = s.s_suppkey
    WHERE r.total_revenue_c = (SELECT MAX(total_revenue_c) FROM revenue)
    """,
    "tpch", "agg",
    doc="TPC-H Q15: top supplier by quarterly revenue via a "
        "max-scalar-subquery over a derived view. The max compare runs "
        "on the FLOOR-scaled integer cents, not the raw double — "
        "integer equality is exact cross-engine, where double equality "
        "against an aggregate would be summation-order-sensitive.",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate").cast("date") >= F.lit("1997-01-01").cast("date"))
        & (F.col("l_shipdate").cast("date") < F.lit("1997-04-01").cast("date")))
    revenue = li.groupBy("l_suppkey").agg(
        F.sum(_rev_c()).alias("total_revenue_c"))
    top = revenue.agg(F.max("total_revenue_c").alias("max_rev"))
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.crossJoin(F.broadcast(top))
        .where(F.col("total_revenue_c") == F.col("max_rev"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue_c")
    )


@query(
    "q16_supplier_cnt",
    """
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#5'
      AND p.p_type NOT LIKE 'PROMO%'
      AND p.p_size IN (1, 5, 9, 13, 17, 21)
      AND l.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
    "tpch", "agg",
    doc="TPC-H Q16: distinct-supplier counts per part descriptor with "
        "a NOT IN exclusion subquery (negative-balance suppliers stand "
        "in for the original's complaint-comment filter; supplier "
        "relationships derive from lineitem, no partsupp). NOT IN "
        "compiles to a left-anti join; s_suppkey is non-null so the "
        "NULL-semantics trap of NOT IN is moot.",
)
def q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    p = _t(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#5")
        & ~F.col("p_type").startswith("PROMO")
        & F.col("p_size").isin(1, 5, 9, 13, 17, 21))
    bad = _t(spark, sf_dir, "supplier").where(
        F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        li.join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q18_large_volume",
    """
    SELECT c.c_custkey, c.c_name, o.o_orderkey,
           CAST(o.o_orderdate AS DATE) AS order_date,
           o.o_totalprice,
           CAST(SUM(l.l_quantity) AS BIGINT) AS sum_qty
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey HAVING SUM(l_quantity) > 250)
    GROUP BY c.c_custkey, c.c_name, o.o_orderkey,
             CAST(o.o_orderdate AS DATE), o.o_totalprice
    """,
    "tpch", "join",
    doc="TPC-H Q18: large-volume orders — grouped-HAVING IN-subquery "
        "becomes a left-semi join against the re-aggregated fact. "
        "Quantities are small integers stored as doubles, so SUM is "
        "FP-exact and the >250 threshold compare is safe; the output "
        "sum is cast to BIGINT on both sides.",
)
def q18_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    big = (li.groupBy("l_orderkey")
           .agg(F.sum("l_quantity").alias("q"))
           .where(F.col("q") > 250)
           .select(F.col("l_orderkey").alias("big_okey")))
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        o.join(F.broadcast(big), o.o_orderkey == F.col("big_okey"), "left_semi")
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(F.broadcast(c), F.col("o_custkey") == c.c_custkey)
        .groupBy("c_custkey", "c_name", "o_orderkey",
                 F.col("o_orderdate").cast("date").alias("order_date"),
                 "o_totalprice")
        .agg(F.sum("l_quantity").cast("bigint").alias("sum_qty"))
        .select("c_custkey", "c_name", "o_orderkey", "order_date",
                "o_totalprice", "sum_qty")
    )


@query(
    "q20_potential_promotion",
    """
    WITH shipped AS (
      SELECT l.l_suppkey, l.l_partkey,
             SUM(CASE WHEN CAST(l.l_shipdate AS DATE) >= DATE '1997-01-01'
                       AND CAST(l.l_shipdate AS DATE) < DATE '1998-01-01'
                      THEN l.l_quantity ELSE 0 END) AS qty_1997,
             SUM(l.l_quantity) AS qty_all
      FROM lineitem l
      JOIN part p ON l.l_partkey = p.p_partkey
      WHERE p.p_type = 'PROMO'
      GROUP BY l.l_suppkey, l.l_partkey
    )
    SELECT DISTINCT s.s_suppkey, s.s_name
    FROM shipped sh JOIN supplier s ON sh.l_suppkey = s.s_suppkey
    WHERE sh.qty_1997 > 0.5 * sh.qty_all AND sh.qty_1997 > 0
    """,
    "tpch", "join",
    doc="TPC-H Q20: suppliers with excess promo stock — the original's "
        "ps_availqty > half-of-year-shipments correlated subquery "
        "becomes qty_1997 > half of all-time shipments per (supplier, "
        "part), same correlated agg-vs-agg shape without partsupp. "
        "Quantity sums are FP-exact small integers.",
)
def q20_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").where(F.col("p_type") == "PROMO") \
        .select("p_partkey")
    in_1997 = (
        (F.col("l_shipdate").cast("date") >= F.lit("1997-01-01").cast("date"))
        & (F.col("l_shipdate").cast("date") < F.lit("1998-01-01").cast("date")))
    shipped = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(
            F.sum(F.when(in_1997, F.col("l_quantity")).otherwise(0.0))
            .alias("qty_1997"),
            F.sum("l_quantity").alias("qty_all")))
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        shipped.where((F.col("qty_1997") > 0.5 * F.col("qty_all"))
                      & (F.col("qty_1997") > 0))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .select("s_suppkey", "s_name").distinct()
    )


@query(
    "q21_suppliers_kept_waiting",
    """
    WITH lo AS (
      SELECT l.l_orderkey, l.l_suppkey,
             CAST(l.l_shipdate AS DATE) >
               CAST(o.o_orderdate AS DATE) + 60 AS late
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE o.o_orderstatus = 'F'
    ),
    per_order AS (
      SELECT l_orderkey,
             COUNT(DISTINCT l_suppkey) AS n_supp,
             COUNT(DISTINCT CASE WHEN late THEN l_suppkey END) AS n_late,
             MAX(CASE WHEN late THEN l_suppkey END) AS late_supp
      FROM lo GROUP BY l_orderkey
    )
    SELECT s.s_name, COUNT(*) AS numwait
    FROM per_order po JOIN supplier s ON po.late_supp = s.s_suppkey
    WHERE po.n_supp > 1 AND po.n_late = 1
    GROUP BY s.s_name
    """,
    "tpch", "join",
    doc="TPC-H Q21: suppliers who alone held up multi-supplier orders. "
        "No receipt/commit dates in this schema, so 'late' is shipdate "
        "> orderdate + 60 days. The EXISTS/NOT-EXISTS pair collapses "
        "into one per-order aggregate (distinct suppliers vs distinct "
        "late suppliers, sole late supplier via conditional MAX) — one "
        "shuffle instead of the original's two correlated self-joins.",
)
def q21_suppliers_kept_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate")
    o = _t(spark, sf_dir, "orders").where(
        F.col("o_orderstatus") == "F").select("o_orderkey", "o_orderdate")
    late = F.col("l_shipdate").cast("date") > F.date_add(
        F.col("o_orderdate").cast("date"), 60)
    per_order = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .withColumn("late_supp_or_null", F.when(late, F.col("l_suppkey")))
        .groupBy("l_orderkey")
        .agg(
            F.countDistinct("l_suppkey").alias("n_supp"),
            F.countDistinct("late_supp_or_null").alias("n_late"),
            F.max("late_supp_or_null").alias("late_supp")))
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        per_order.where((F.col("n_supp") > 1) & (F.col("n_late") == 1))
        .join(F.broadcast(s), F.col("late_supp") == s.s_suppkey)
        .groupBy("s_name").agg(F.count(F.lit(1)).alias("numwait"))
    )


@query(
    "q22_global_sales_opportunity",
    """
    WITH pool AS (
      SELECT c.c_custkey, c.c_acctbal, n.n_name
      FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
      WHERE n.n_name IN ('NATION_1','NATION_2','NATION_3',
                         'NATION_4','NATION_5','NATION_6','NATION_7')
    )
    SELECT n_name, COUNT(*) AS numcust,
           CAST(SUM(CAST(FLOOR(c_acctbal * 100) AS BIGINT)) AS BIGINT)
             AS totacctbal_c
    FROM pool
    WHERE CAST(FLOOR(c_acctbal * 100) AS BIGINT)
            > (SELECT AVG(CAST(FLOOR(c_acctbal * 100) AS BIGINT))
               FROM pool WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = pool.c_custkey
                        AND CAST(o.o_orderdate AS DATE) >= DATE '2000-01-01')
    GROUP BY n_name
    """,
    "tpch", "join",
    doc="TPC-H Q22: promising inactive customers — above-average "
        "balance (scalar AVG subquery → broadcast scalar) with no "
        "RECENT orders (anti-join; the synthetic data gives every "
        "customer historical orders, so 'inactive' means none since "
        "2000). Nation membership stands in for the original's "
        "phone-prefix list (no phone column).",
)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    nations = ["NATION_%d" % i for i in range(1, 8)]
    n = _t(spark, sf_dir, "nation").where(F.col("n_name").isin(nations)) \
        .select("n_nationkey", "n_name")
    pool = (_t(spark, sf_dir, "customer")
            .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
            .select("c_custkey", "c_acctbal", "n_name"))
    bal_c = F.floor(F.col("c_acctbal") * 100).cast("bigint")
    avg_bal = pool.where(F.col("c_acctbal") > 0).agg(
        F.avg(bal_c).alias("avg_bal_c"))
    o = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate").cast("date") >= F.lit("2000-01-01").cast("date")
    ).select("o_custkey")
    return (
        pool.crossJoin(F.broadcast(avg_bal))
        .where(bal_c > F.col("avg_bal_c"))
        .join(o, pool.c_custkey == o.o_custkey, "left_anti")
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("numcust"),
             F.sum(bal_c).alias("totacctbal_c"))
    )
