"""Third relational batch: remaining set operations, numeric
histogramming, and array explode/flatten shapes. All oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from . import query


@query(
    "intersect_keys",
    """
    SELECT o_orderkey FROM orders WHERE o_orderstatus = 'O'
    INTERSECT
    SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
    "setop",
    doc="INTERSECT — completes the set-op family (union/except oracled "
        "earlier; the reference only ever uses union, SURVEY §2.4).",
)
def intersect_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    a = o.where(F.col("o_orderstatus") == "O").select("o_orderkey")
    b = o.where(F.col("o_orderpriority") == "1-URGENT").select("o_orderkey")
    return a.intersect(b)


@query(
    "union_all_counts",
    """
    SELECT src, COUNT(*) AS n FROM (
      SELECT 'open' AS src FROM orders WHERE o_orderstatus = 'O'
      UNION ALL
      SELECT 'urgent' AS src FROM orders WHERE o_orderpriority = '1-URGENT'
    ) GROUP BY src
    """,
    "setop",
    doc="UNION ALL (bag semantics) vs the dedup UNION — overlap rows "
        "counted twice.",
)
def union_all_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    a = o.where(F.col("o_orderstatus") == "O").select(F.lit("open").alias("src"))
    b = o.where(F.col("o_orderpriority") == "1-URGENT") \
        .select(F.lit("urgent").alias("src"))
    return a.unionAll(b).groupBy("src").agg(F.count(F.lit(1)).alias("n"))


@query(
    "histogram_prices",
    """
    SELECT CAST(FLOOR(o_totalprice / 50000) AS BIGINT) AS bucket,
           COUNT(*) AS n,
           ROUND(MIN(o_totalprice), 2) AS lo,
           ROUND(MAX(o_totalprice), 2) AS hi
    FROM orders GROUP BY 1
    """,
    "agg", "stats",
    doc="Fixed-width numeric histogram via floor bucketing — the "
        "map-side-combinable building block for distribution profiling "
        "at scale (one partial-agg shuffle, bucket-count cardinality).",
)
def histogram_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(F.floor(F.col("o_totalprice") / 50000).alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"),
             F.round(F.min("o_totalprice"), 2).alias("lo"),
             F.round(F.max("o_totalprice"), 2).alias("hi"))
    )


@query(
    "explode_tokens_top",
    """
    WITH tok AS (
      SELECT unnest(string_split(lower(text), ' ')) AS token FROM documents
    )
    SELECT token, COUNT(*) AS n FROM tok
    GROUP BY token HAVING COUNT(*) >= 100
    """,
    "textops", "functions",
    doc="Explode + frequency count (the vocabulary/document-frequency "
        "building block for dedup prefilters and BPE corpus stats).",
)
def explode_tokens_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split(F.lower("text"), " ")).alias("token"))
        .groupBy("token").agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= 100)
    )


@query(
    "posexplode_components",
    """
    SELECT t.i - 1 AS pos,
           CAST(FLOOR(AVG(CAST(e.embedding[t.i] AS DOUBLE)) * 10000) AS BIGINT)
             AS mean_e4,
           CAST(FLOOR(stddev_samp(CAST(e.embedding[t.i] AS DOUBLE)) * 10000) AS BIGINT)
             AS sd_e4
    FROM embeddings e, range(1, 65) t(i)
    GROUP BY t.i
    """,
    "vectors", "stats",
    doc="posexplode with positional grouping: per-dimension embedding "
        "statistics (drift monitoring / normalization fitting). Output "
        "as FLOOR-scaled integers, not ROUND — the engines' unrounded "
        "aggregates agree to 1e-17 but their ROUND tie-breaks diverge "
        "near half-boundaries (observed at sf0.1: identical doubles "
        "rounding to -0.0001 vs -0.0); floor of an identical double is "
        "identical.",
)
def posexplode_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    return (
        e.select(F.posexplode("embedding").alias("pos", "val"))
        .groupBy("pos")
        .agg(F.floor(F.avg(F.col("val").cast("double")) * 10000)
             .cast("long").alias("mean_e4"),
             F.floor(F.stddev_samp(F.col("val").cast("double")) * 10000)
             .cast("long").alias("sd_e4"))
    )


@query(
    "quantiles_per_segment",
    """
    SELECT c_mktsegment,
           CAST(FLOOR(quantile_cont(c_acctbal, 0.25) * 100) AS BIGINT) AS q25_c,
           CAST(FLOOR(quantile_cont(c_acctbal, 0.50) * 100) AS BIGINT) AS q50_c,
           CAST(FLOOR(quantile_cont(c_acctbal, 0.75) * 100) AS BIGINT) AS q75_c,
           CAST(FLOOR(quantile_cont(c_acctbal, 0.95) * 100) AS BIGINT) AS q95_c
    FROM customer GROUP BY c_mktsegment
    """,
    "aggregate", "stats",
    doc="EXACT grouped continuous quantiles (linear interpolation): "
        "Spark's sort-based `percentile` aggregate vs DuckDB's "
        "quantile_cont — same interpolation definition, compared as "
        "FLOOR-scaled integer cents (identical doubles; floor avoids "
        "round-half tie divergence). Scale note: exact percentile "
        "buffers each group's values — fine for bounded groups "
        "(5 segments x 150k rows); for data-sized groups the engine's "
        "scale path is percentile_approx (the deterministic KLL-style "
        "sketch already used for range-bucket boundaries in "
        "operators/assignment.py) — constant memory, map-side "
        "combinable, rank error eps*n.",
)
def quantiles_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    qs = {"q25_c": 0.25, "q50_c": 0.50, "q75_c": 0.75, "q95_c": 0.95}
    aggs = [F.floor(F.percentile(F.col("c_acctbal"), F.lit(p)) * 100)
            .cast("long").alias(name) for name, p in qs.items()]
    return c.groupBy("c_mktsegment").agg(*aggs)
