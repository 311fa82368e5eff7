"""Relational operator inventory (SURVEY.md §2.3-§2.5, §2.8) expressed
over the driver's TPC-H-ish star schema, per FIXTURES.md §B.

Every query is written scale-first:

- filters/projections sit directly on the parquet scan so Catalyst
  pushes them down (P1/P4);
- genuinely small dimension tables (region/nation: tens of rows at ANY
  scale factor) are broadcast explicitly; fact-fact joins shuffle on
  their keys and rely on AQE for skew;
- doubles produced by aggregation are rounded on BOTH sides so the
  DuckDB oracle hash-matches despite summation-order differences;
- DuckDB ``SUM(int)`` returns ``HUGEINT`` — oracles cast to BIGINT to
  match Spark's ``sum(int) -> long``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..sources import load_table
from . import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Aggregations (A1-A8)
# ---------------------------------------------------------------------------

@query(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2)                                        AS sum_qty,
           ROUND(SUM(l_extendedprice), 2)                                   AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
           ROUND(AVG(l_quantity), 4)                                        AS avg_qty,
           ROUND(AVG(l_extendedprice), 4)                                   AS avg_price,
           ROUND(AVG(l_discount), 4)                                        AS avg_disc,
           COUNT(*)                                                         AS count_order
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) <= DATE '2001-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    "agg", "tpch",
    doc="TPC-H Q1 shape: scan-side filter + 8-agg groupBy (A1-class).",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.where(F.col("l_shipdate").cast("date") <= F.lit("2001-09-02").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "agg_counts_per_group",
    """
    SELECT c_mktsegment, COUNT(*) AS n_customers,
           CAST(SUM(CASE WHEN c_acctbal > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_positive
    FROM customer GROUP BY c_mktsegment
    """,
    "agg",
    doc="A1/A2: counts per group (sitemap fill-level analogue, adsmp/app.py:1031-1038).",
)
def agg_counts_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum(F.when(F.col("c_acctbal") > 0, 1).otherwise(0)).alias("n_positive"),
    )


@query(
    "agg_nonnull_counts",
    """
    SELECT COUNT(o_orderkey) AS n_orderkey, COUNT(o_custkey) AS n_custkey,
           COUNT(o_orderstatus) AS n_status, COUNT(o_totalprice) AS n_totalprice,
           COUNT(o_orderdate) AS n_orderdate, COUNT(o_orderpriority) AS n_priority
    FROM orders
    """,
    "agg",
    doc="A3: per-column non-null diagnostic counts (run.py:73-76).",
)
def agg_nonnull_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    names = {
        "o_orderkey": "n_orderkey", "o_custkey": "n_custkey",
        "o_orderstatus": "n_status", "o_totalprice": "n_totalprice",
        "o_orderdate": "n_orderdate", "o_orderpriority": "n_priority",
    }
    return o.agg(*[F.count(c).alias(a) for c, a in names.items()])


@query(
    "agg_argmax_per_group",
    """
    SELECT c_mktsegment, c_custkey AS top_custkey, c_name AS top_name,
           ROUND(c_acctbal, 2) AS top_acctbal
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                   ORDER BY c_acctbal DESC, c_custkey) AS rn
      FROM customer
    ) WHERE rn = 1
    """,
    "agg", "window",
    doc="A5/M6: argmax per group (max-index sitemap file, adsmp/app.py:1041-1051; "
        "duplicate-repair latest-wins, scripts/fix_db_duplicates.py:57-73).",
)
def agg_argmax_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return (
        c.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "c_mktsegment",
            F.col("c_custkey").alias("top_custkey"),
            F.col("c_name").alias("top_name"),
            F.round("c_acctbal", 2).alias("top_acctbal"),
        )
    )


@query(
    "agg_collect_sorted",
    """
    SELECT l_returnflag,
           array_to_string(list_sort(list(DISTINCT l_linestatus)), '|') AS statuses,
           COUNT(DISTINCT l_orderkey) AS n_orders
    FROM lineitem GROUP BY l_returnflag
    """,
    "agg",
    doc="A7: group-to-list (sitemap id fan-out, adsmp/tasks.py:1157-1160); "
        "sorted + serialized to string (driver's value-hash can't hash arrays).",
)
def agg_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.concat_ws("|", F.sort_array(F.collect_set("l_linestatus"))).alias("statuses"),
        F.countDistinct("l_orderkey").alias("n_orders"),
    )


# ---------------------------------------------------------------------------
# Joins & set ops (J1-J5)
# ---------------------------------------------------------------------------

@query(
    "join_left_outer",
    """
    SELECT o.o_orderkey, COALESCE(c.c_name, 'ORPHAN') AS cust_name,
           COALESCE(c.c_mktsegment, 'NONE') AS segment,
           ROUND(o.o_totalprice, 2) AS total
    FROM orders o LEFT OUTER JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_orderstatus = 'F'
    """,
    "join",
    doc="J1: left-outer equi-join + coalesce defaults (sitemap⟕records cleanup, "
        "adsmp/tasks.py:505-519; boost defaults T6).",
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    c = _t(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "left_outer")
        .select(
            "o_orderkey",
            F.coalesce("c_name", F.lit("ORPHAN")).alias("cust_name"),
            F.coalesce("c_mktsegment", F.lit("NONE")).alias("segment"),
            F.round("o_totalprice", 2).alias("total"),
        )
    )


@query(
    "join_semi",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 1000)
    """,
    "join",
    doc="J2/P7: left-semi bulk key lookup (adsmp/app.py:975-1016).",
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(F.col("o_totalprice") > 1000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@query(
    "join_anti",
    """
    SELECT c_custkey, c_name, c_mktsegment FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 450000)
    """,
    "join",
    doc="J3/P8: left-anti exclusion (run.py:597-605).",
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(F.col("o_totalprice") > 450000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
    )


@query(
    "union_distinct",
    """
    SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
    UNION
    SELECT o_orderkey FROM orders WHERE o_totalprice > 10000
    """,
    "setop",
    doc="J4: recently-updated ∪ recently-processed with dedup (run.py:607-610).",
)
def union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    a = o.where(F.col("o_orderpriority") == "1-URGENT").select("o_orderkey")
    b = o.where(F.col("o_totalprice") > 10000).select("o_orderkey")
    return a.union(b).distinct()


@query(
    "except_keys",
    """
    SELECT o_orderkey FROM orders WHERE o_orderstatus = 'O'
    EXCEPT
    SELECT o_orderkey FROM orders WHERE o_orderpriority = '5-LOW'
    """,
    "setop",
    doc="S10/A2 analogue: files_to_delete = affected − after (adsmp/app.py:1307-1308).",
)
def except_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    a = o.where(F.col("o_orderstatus") == "O").select("o_orderkey")
    b = o.where(F.col("o_orderpriority") == "5-LOW").select("o_orderkey")
    return a.exceptAll(b).distinct()


@query(
    "full_outer_diff",
    """
    WITH recomputed AS (
      SELECT l_orderkey AS okey, ROUND(SUM(l_extendedprice), 2) AS lsum
      FROM lineitem GROUP BY l_orderkey
    )
    SELECT COALESCE(o.o_orderkey, r.okey) AS orderkey,
           CASE WHEN o.o_orderkey IS NULL THEN 'missing_order'
                WHEN r.okey IS NULL THEN 'missing_lines'
                ELSE 'both' END AS presence,
           ROUND(COALESCE(o.o_totalprice, 0), 2) AS header_total,
           ROUND(COALESCE(r.lsum, 0), 2) AS line_total
    FROM orders o FULL OUTER JOIN recomputed r ON o.o_orderkey = r.okey
    """,
    "join", "validate",
    doc="J5: differential cross-system compare via full outer join "
        "(adsmp/validate.py:53-68).",
)
def full_outer_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    r = (
        _t(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_orderkey").alias("okey"))
        .agg(F.round(F.sum("l_extendedprice"), 2).alias("lsum"))
    )
    j = o.join(r, o.o_orderkey == r.okey, "full_outer")
    return j.select(
        F.coalesce("o_orderkey", "okey").alias("orderkey"),
        F.when(F.col("o_orderkey").isNull(), "missing_order")
        .when(F.col("okey").isNull(), "missing_lines")
        .otherwise("both").alias("presence"),
        F.round(F.coalesce("o_totalprice", F.lit(0.0)), 2).alias("header_total"),
        F.round(F.coalesce("lsum", F.lit(0.0)), 2).alias("line_total"),
    )


@query(
    "q5_regional_revenue",
    """
    SELECT n.n_name AS nation, ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA' AND CAST(o.o_orderdate AS DATE) >= DATE '1996-01-01'
    GROUP BY n.n_name
    """,
    "join", "agg", "tpch",
    doc="TPC-H Q5 shape: fact-fact shuffle join + broadcast dimension chain.",
)
def q5_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate").cast("date") >= F.lit("1996-01-01").cast("date"))
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    # region/nation are tiny at EVERY scale factor -> explicit broadcast.
    # customer⋈dims output is NOT (it scales with customers): no hint —
    # AQE broadcasts it at small SF and shuffles it at 100 TB.
    dims = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey) \
            .join(F.broadcast(r), n.n_regionkey == r.r_regionkey) \
            .select("c_custkey", "n_name")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(dims, o.o_custkey == dims.c_custkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
             .alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Windows / sequential assignment (W3-W4) and top-k
# ---------------------------------------------------------------------------

@query(
    "window_bucket_assign",
    """
    SELECT o_orderkey,
           'sitemap_bib_' || CAST(CAST(FLOOR((ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1) / 100)
                 AS BIGINT) + 1 AS VARCHAR) || '.xml' AS filename
    FROM orders
    """,
    "window",
    doc="W3: sequential sitemap file assignment — running counter replaced by "
        "row_number window (adsmp/tasks.py:679-737, adsmp/app.py:1019-1072). "
        "Scale path: see operators/assignment.py (range-partitioned two-phase).",
)
def window_bucket_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    rn = F.row_number().over(W.orderBy("o_orderkey"))
    return o.select(
        "o_orderkey",
        F.concat(
            F.lit("sitemap_bib_"),
            (F.floor((rn - F.lit(1)) / F.lit(100)) + F.lit(1)).cast("string"),
            F.lit(".xml"),
        ).alias("filename"),
    )


@query(
    "window_flag_first",
    """
    SELECT c_mktsegment, c_custkey,
           CASE WHEN ROW_NUMBER() OVER (PARTITION BY c_mktsegment ORDER BY c_custkey) = 1
                THEN TRUE ELSE FALSE END AS update_flag
    FROM customer
    """,
    "window",
    doc="W4: flag lowest-id row per file (flag_one_row_for_filename, "
        "adsmp/app.py:84-118).",
)
def window_flag_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy("c_custkey")
    return c.select(
        "c_mktsegment", "c_custkey",
        (F.row_number().over(w) == 1).alias("update_flag"),
    )


@query(
    "window_running_total",
    """
    SELECT o_custkey, o_orderkey,
           ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend
    FROM orders
    """,
    "window",
    doc="Cumulative window frame (engine extension beyond reference's W3/W4).",
)
def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = (W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    return o.select(
        "o_custkey", "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_spend"),
    )


@query(
    "topk_per_group",
    """
    SELECT * FROM (
      SELECT o_custkey, o_orderkey, ROUND(o_totalprice, 2) AS total,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rnk
      FROM orders
    ) WHERE rnk <= 3
    """,
    "window",
    doc="Top-K per group with deterministic tie-break (engine extension).",
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        o.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 3)
        .select("o_custkey", "o_orderkey", F.round("o_totalprice", 2).alias("total"), "rnk")
    )


# ---------------------------------------------------------------------------
# Scalar / string / date derivations (F3-F14 analogues)
# ---------------------------------------------------------------------------

@query(
    "string_hier_facet",
    """
    SELECT p_partkey,
           string_split(p_name, ' ')[1] AS name_head,
           CAST(len(string_split(p_name, ' ')) AS INT) AS n_tokens,
           '0/' || string_split(p_name, ' ')[1] AS facet_l0,
           '1/' || string_split(p_name, ' ')[1] || '/' || string_split(p_name, ' ')[2] AS facet_l1
    FROM part
    """,
    "functions",
    doc="F3/F10: split + hierarchical facet generation "
        "(grants split adsmp/solr_updater.py:37-43; generate_hier_facet :231-241).",
)
def string_hier_facet(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    toks = F.split(F.col("p_name"), " ")
    return p.select(
        "p_partkey",
        toks.getItem(0).alias("name_head"),
        F.size(toks).alias("n_tokens"),
        F.concat(F.lit("0/"), toks.getItem(0)).alias("facet_l0"),
        F.concat(F.lit("1/"), toks.getItem(0), F.lit("/"), toks.getItem(1)).alias("facet_l1"),
    )


@query(
    "regexp_rewrite",
    """
    SELECT p_partkey, regexp_replace(p_name, 'widget', 'gadget', 'g') AS rewritten,
           CASE WHEN p_name LIKE '%widget%' THEN TRUE ELSE FALSE END AS was_widget
    FROM part
    """,
    "functions",
    doc="F13: PDF url rewrite analogue — regexp_replace (adsmp/app.py:905-916).",
)
def regexp_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_replace("p_name", "widget", "gadget").alias("rewritten"),
        F.col("p_name").contains("widget").alias("was_widget"),
    )


@query(
    "case_when_mapping",
    """
    SELECT p_partkey,
           CASE WHEN p_type IN ('ECONOMY', 'PROMO') THEN 'Value'
                WHEN p_type = 'STANDARD' THEN 'Standard'
                WHEN p_type LIKE 'S%' THEN 'Compact'
                WHEN p_type IN ('LARGE', 'MEDIUM') THEN 'Sized'
                ELSE 'Other' END AS type_class
    FROM part
    """,
    "functions",
    doc="F8/F9: prefix/lookup CASE-WHEN mapping (map_simbad_type "
        "adsmp/solr_updater.py:255-278, map_ned_type :281-325).",
)
def case_when_mapping(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    t = F.col("p_type")
    return p.select(
        "p_partkey",
        F.when(t.isin("ECONOMY", "PROMO"), "Value")
        .when(t == "STANDARD", "Standard")
        .when(t.startswith("S"), "Compact")
        .when(t.isin("LARGE", "MEDIUM"), "Sized")
        .otherwise("Other").alias("type_class"),
    )


@query(
    "date_buckets",
    """
    SELECT strftime(o_orderdate, '%Y-%m') AS month,
           COUNT(*) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS month_total,
           CAST(MAX(o_orderdate) AS DATE) AS last_order_date
    FROM orders
    WHERE CAST(o_orderdate AS DATE) >= DATE '1997-01-01'
    GROUP BY strftime(o_orderdate, '%Y-%m')
    """,
    "functions",
    doc="F14: date → formatted stamp + greatest/max timestamp (T10, "
        "adsmp/solr_updater.py:335-355).",
)
def date_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.where(F.col("o_orderdate").cast("date") >= F.lit("1997-01-01").cast("date"))
        .groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("month"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("month_total"),
            F.max(F.col("o_orderdate").cast("date")).alias("last_order_date"),
        )
    )


@query(
    "has_fields",
    """
    SELECT o_orderkey,
           array_to_string(
             list_sort(
               list_filter(
                 [CASE WHEN o_orderstatus IS NOT NULL AND regexp_matches(o_orderstatus, '[a-zA-Z0-9]') THEN 'orderstatus' END,
                  CASE WHEN o_orderpriority IS NOT NULL AND regexp_matches(o_orderpriority, '[a-zA-Z0-9]') THEN 'orderpriority' END,
                  CASE WHEN o_totalprice IS NOT NULL THEN 'totalprice' END],
                 x -> x IS NOT NULL)), '|') AS has
    FROM orders
    """,
    "functions",
    doc="T8: `has` field — names of populated fields containing ≥1 alphanumeric "
        "(adsmp/solr_updater.py:546-568); serialized to string for the "
        "driver's value-hash (arrays are unhashable there).",
)
def has_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    entries = F.array(
        F.when(F.col("o_orderstatus").rlike("[a-zA-Z0-9]"), F.lit("orderstatus")),
        F.when(F.col("o_orderpriority").rlike("[a-zA-Z0-9]"), F.lit("orderpriority")),
        F.when(F.col("o_totalprice").isNotNull(), F.lit("totalprice")),
    )
    return o.select(
        "o_orderkey",
        F.concat_ws("|", F.sort_array(F.filter(entries, lambda x: x.isNotNull()))).alias("has"),
    )
