"""Skew mitigation (SURVEY §4 / the 100 TB checklist).

AQE's skew-join handling (enabled in session.py) splits oversized
partitions at runtime, but only for sort-merge joins. ``salted_join``
is the explicit fallback for pathological key skew (one key holding a
double-digit percentage of rows): the skewed side's hot keys get a
random salt in [0, S), the other side replicates each hot-key row S
times, and the join key becomes (key, salt) — the hot key's rows
spread over S tasks instead of one straggler.

Results are identical to the plain join; only the physical
distribution changes (asserted in tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def spread_small_scan(df: DataFrame) -> DataFrame:
    """Input-skew fix (guide §2.5 "one huge unsplittable file"):
    when the upstream scan yields fewer partitions than the session
    has task slots — one small parquet file at every local bench/test
    tier, or a single unsplittable input at deployment — round-robin
    repartition to ``defaultParallelism`` so the expensive per-row
    work ABOVE the scan (higher-order shingle/hash folds, normalize +
    split chains) runs on every core instead of one. At real scale the
    scan already carries >= slots partitions and this is a NO-OP: no
    shuffle is added where the input is already parallel, so nothing
    here is tuned to local mode. Callers pass the slim projection
    (id + text) so the shuffled bytes, when the shuffle happens at
    all, are the raw input columns, never derived arrays.

    Results are unchanged — only physical distribution moves, and
    every consumer in this engine is order-insensitive (the oracle
    gate compares sorted rows)."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def detect_hot_keys(df: DataFrame, key: str, threshold_frac: float = 0.05,
                    max_keys: int = 100) -> list:
    """Keys holding more than ``threshold_frac`` of all rows."""
    total = df.count()
    rows = (df.groupBy(key).count()
            .where(F.col("count") >= total * threshold_frac)
            .orderBy(F.col("count").desc())
            .limit(max_keys)
            .collect())
    return [r[key] for r in rows]


def salted_join(skewed: DataFrame, other: DataFrame, key: str,
                salt: int = 8, hot_keys: list | None = None,
                how: str = "inner") -> DataFrame:
    """Join ``skewed`` (big, skewed side) with ``other`` on ``key``.

    Hot keys are salted; cold keys keep salt 0 so the non-skewed
    volume is not replicated. ``other``'s hot-key rows are exploded
    across all salt values.
    """
    if hot_keys is None:
        hot_keys = detect_hot_keys(skewed, key)
    if not hot_keys:
        return skewed.join(other, key, how)
    hot = F.col(key).isin(hot_keys)

    s = skewed.withColumn(
        "_salt",
        F.when(hot, (F.rand(seed=42) * salt).cast("int")).otherwise(F.lit(0)))
    o = other.withColumn(
        "_salts",
        F.when(hot, F.sequence(F.lit(0), F.lit(salt - 1)))
        .otherwise(F.array(F.lit(0))))
    o = o.withColumn("_salt", F.explode("_salts")).drop("_salts")
    return s.join(o, [key, "_salt"], how).drop("_salt")


def salted_agg_count(df: DataFrame, key: str, salt: int = 8) -> DataFrame:
    """Two-stage aggregation under key skew: pre-aggregate on
    (key, salt), then combine. (Spark's partial aggregation already
    does this for algebraic aggs — this form is for when the first
    stage must bound per-task state, e.g. collect-like aggs.)"""
    stage1 = (df.withColumn("_salt", (F.rand(seed=42) * salt).cast("int"))
              .groupBy(key, "_salt").agg(F.count(F.lit(1)).alias("_c")))
    return stage1.groupBy(key).agg(F.sum("_c").alias("count"))
