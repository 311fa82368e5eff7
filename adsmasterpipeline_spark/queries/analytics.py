"""Window-analytics batch: ranking/navigation/distribution functions
and ordered string aggregation — engine-native capabilities beyond the
reference's two cumulative windows (SURVEY §2.8 'no ranking/analytic
window functions ... in the reference'). All oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..sources import load_table
from . import query


@query(
    "window_lag_lead",
    """
    SELECT o_custkey, o_orderkey,
           LAG(o_orderkey) OVER w AS prev_order,
           LEAD(o_orderkey) OVER w AS next_order,
           CAST(epoch_us(o_orderdate) - epoch_us(LAG(o_orderdate) OVER w) AS BIGINT)
             AS since_prev_us
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    "window",
    doc="Navigation functions: previous/next order per customer + "
        "inter-order gap.",
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey", "o_orderkey",
        F.lag("o_orderkey").over(w).alias("prev_order"),
        F.lead("o_orderkey").over(w).alias("next_order"),
        (F.unix_micros(F.col("o_orderdate").cast("timestamp"))
         - F.unix_micros(F.lag("o_orderdate").over(w).cast("timestamp")))
        .alias("since_prev_us"),
    )


@query(
    "window_ntile_rank",
    """
    SELECT c_custkey,
           NTILE(4) OVER (ORDER BY c_acctbal DESC, c_custkey) AS quartile,
           ROUND(PERCENT_RANK() OVER (ORDER BY c_acctbal DESC, c_custkey), 6)
             AS pct_rank,
           RANK() OVER (ORDER BY c_mktsegment) AS seg_rank,
           DENSE_RANK() OVER (ORDER BY c_mktsegment) AS seg_dense_rank
    FROM customer
    """,
    "window",
    doc="Distribution/ranking functions: quartiles, percent_rank, "
        "rank vs dense_rank over a low-cardinality key. CAVEAT: the "
        "unpartitioned windows funnel the table through one partition "
        "— inherent to ntile/percent_rank's total-order semantics in "
        "declarative form; ntile_rank_scalable is the bit-identical "
        "distributed twin (assign_sequential position + closed-form "
        "bucket math) for data-sized inputs.",
)
def window_ntile_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    w_bal = W.orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    w_seg = W.orderBy("c_mktsegment")
    return c.select(
        "c_custkey",
        F.ntile(4).over(w_bal).alias("quartile"),
        F.round(F.percent_rank().over(w_bal), 6).alias("pct_rank"),
        F.rank().over(w_seg).alias("seg_rank"),
        F.dense_rank().over(w_seg).alias("seg_dense_rank"),
    )


@query(
    "window_range_frame",
    """
    SELECT o_custkey, o_orderkey,
           COUNT(*) OVER (PARTITION BY o_custkey ORDER BY epoch_us(o_orderdate)
                          RANGE BETWEEN 31536000000000 PRECEDING AND CURRENT ROW)
             AS orders_last_year
    FROM orders
    """,
    "window",
    doc="RANGE frame over event time: orders in the trailing 365 days "
        "per customer (value-based frame, not row-based).",
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    year_us = 365 * 24 * 3600 * 1_000_000
    w = (W.partitionBy("o_custkey")
         .orderBy(F.unix_micros(F.col("o_orderdate").cast("timestamp")))
         .rangeBetween(-year_us, 0))
    return o.select(
        "o_custkey", "o_orderkey",
        F.count(F.lit(1)).over(w).alias("orders_last_year"),
    )


@query(
    "string_agg_ordered",
    """
    SELECT l_returnflag,
           string_agg(DISTINCT l_linestatus, ',' ORDER BY l_linestatus) AS statuses,
           COUNT(*) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
    "agg",
    doc="Ordered string aggregation (listagg): deterministic via "
        "sorted-distinct before concatenation.",
)
def string_agg_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.concat_ws(",", F.sort_array(F.collect_set("l_linestatus")))
        .alias("statuses"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "first_last_value",
    """
    SELECT DISTINCT o_custkey,
           FIRST_VALUE(o_orderkey) OVER w AS first_order,
           LAST_VALUE(o_orderkey) OVER (PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS last_order
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    "window",
    doc="first_value/last_value with the full-partition frame (the "
        "default frame's current-row cap is the classic last_value trap).",
)
def first_last_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_full = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return o.select(
        "o_custkey",
        F.first("o_orderkey").over(w).alias("first_order"),
        F.last("o_orderkey").over(w_full).alias("last_order"),
    ).distinct()


@query(
    "ntile_rank_scalable",
    """
    SELECT c_custkey,
           NTILE(4) OVER (ORDER BY c_acctbal DESC, c_custkey) AS quartile,
           ROUND(PERCENT_RANK() OVER (ORDER BY c_acctbal DESC, c_custkey), 6)
             AS pct_rank,
           RANK() OVER (ORDER BY c_mktsegment) AS seg_rank,
           DENSE_RANK() OVER (ORDER BY c_mktsegment) AS seg_dense_rank
    FROM customer
    """,
    "window", "scale",
    doc="Scale twin of window_ntile_rank: the SAME distribution/ranking "
        "outputs with NO data-sized single-partition window. "
        "window_ntile_rank's global windows are inherent to ntile/"
        "percent_rank's total-order semantics in declarative form; this "
        "twin derives them from a distributed global position instead: "
        "(1) assign_sequential (range-bucket + per-bucket window + "
        "broadcast offsets, the W3/assign_scalable pattern) gives the "
        "0-based position rn-1 over the UNIQUE composite key "
        "(-acctbal*100)*2^33 + custkey (exact: acctbal has 2 decimal "
        "places, custkey < 2^33); (2) ntile(4) is closed-form from "
        "(rn, n): the first n%4 buckets take ceil(n/4) rows, the rest "
        "floor(n/4); (3) percent_rank = (rn-1)/(n-1) since the key is "
        "unique (rank == row_number); (4) segment rank/dense_rank come "
        "from a 5-row per-segment aggregate (cumulative counts over a "
        "bounded window) broadcast back. The only single-partition "
        "exchanges carry <= num-segments rows — plan-asserted; bit-"
        "identity with the declarative twin is pytest-pinned.",
)
def ntile_rank_scalable(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.assignment import assign_sequential

    c = load_table(spark, sf_dir, "customer")
    # exact order-preserving composite: c_acctbal desc, c_custkey asc
    # (round before the cast — the double 123.45*100 can sit below the
    # integer and a bare cast truncates, colliding distinct balances)
    ordkey = ((-F.round(F.col("c_acctbal") * 100)).cast("long")
              * F.lit(1 << 33) + F.col("c_custkey")).alias("_ord")
    stats: dict = {}
    seq = assign_sequential(
        c.select("c_custkey", "c_mktsegment", ordkey), "_ord",
        stats_out=stats)
    rn = F.col("seq") + 1
    # N comes from the bucket-size pass assign_sequential already ran —
    # a literal, not a count subtree crossJoined back in
    n = F.lit(stats["total"]).cast("long")
    base, rem = (n / 4).cast("long"), n % 4
    cut = rem * (base + 1)
    quartile = (F.when(rn <= cut,
                       F.floor((rn + base) / (base + 1)))
                .otherwise(rem + F.floor((rn - cut + base - 1)
                                         / F.greatest(base, F.lit(1)))))
    pct = F.when(n > 1, F.round((rn - 1).cast("double") / (n - 1), 6)) \
        .otherwise(F.lit(0.0))
    # segment counts are a property of the base table — aggregating the
    # assign_sequential output instead would drag the offsets join into
    # this branch of the plan for identical counts
    seg = (c.groupBy("c_mktsegment")
           .agg(F.count(F.lit(1)).alias("_sc")))
    w_seg = W.orderBy("c_mktsegment")
    seg = F.broadcast(seg.select(
        "c_mktsegment",
        (F.coalesce(
            F.sum("_sc").over(w_seg.rowsBetween(W.unboundedPreceding, -1)),
            F.lit(0)) + 1).alias("seg_rank"),
        F.row_number().over(w_seg).alias("seg_dense_rank")))
    return (seq.join(seg, "c_mktsegment")
            .select("c_custkey",
                    quartile.cast("int").alias("quartile"),
                    pct.alias("pct_rank"),
                    F.col("seg_rank").cast("long"),
                    F.col("seg_dense_rank").cast("long")))
