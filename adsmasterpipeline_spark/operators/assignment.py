"""Scalable sequential assignment (W3 at 100 TB).

``row_number() OVER (ORDER BY id)`` — the declarative form of the
sitemap file counter — funnels every row through ONE partition for the
global sort. Fine at 28.8M rows; a bottleneck at billions.

``assign_sequential`` computes the identical numbering in three
distributed steps (the zipWithIndex pattern, DataFrame-native):

1. deterministic range bucketing: bucket boundaries from
   ``percentile_approx`` (a deterministic sketch — unlike
   ``repartitionByRange``, whose reservoir sampling can re-draw
   DIFFERENT boundaries when the plan re-executes, which would
   desynchronize the offset pass from the numbering pass);
2. per-bucket counts → prefix-sum offsets (tiny driver aggregate);
3. per-bucket ``row_number`` window (parallel — each bucket is its own
   window group) + broadcast offsets.

Result is bit-identical to the global window when the order column is
unique; wall-clock scales with bucket count instead of serializing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def _order_proxy(key: Column) -> Column:
    """Order-preserving numeric proxy for a string key: the first NINE
    code points packed into 7-bit fields of a 63-bit long (k1 < k2 ⇒
    proxy(k1) <= proxy(k2); equal proxies stay in one bucket, so range
    bucketing on the proxy never splits the true ordering). Nine chars
    matter for skew: bibcode-like keys ("2019ApJ...") share long year
    prefixes, and a 3-char proxy collapsed them onto a handful of
    distinct values — range buckets degenerated to a few hot ones.
    With 9 chars the proxy distinguishes keys through the journal
    field. Code points above 127 clamp to 127 — clamping is monotonic,
    so ordering is preserved (non-ASCII keys just share buckets).
    Granularity only affects bucket balance, never correctness."""
    def cp(i):
        return F.least(
            F.coalesce(F.ascii(F.substring(key, i, 1)), F.lit(0)),
            F.lit(127)).cast("long")
    out = F.lit(0).cast("long")
    for i in range(1, 10):
        out = out * F.lit(128) + cp(i)
    return out


def assign_sequential(df: DataFrame, order_col: str,
                      num_partitions: int | None = None,
                      start: int = 0) -> DataFrame:
    """Add a ``seq`` column = ``start`` + 0-based global position of the
    row when ordered by ``order_col`` (must be unique)."""
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    key = F.col(order_col)
    if dict(df.dtypes)[order_col] == "string":
        # percentile_approx needs numerics; bucket on an order-preserving
        # proxy, window-order inside buckets on the real column
        key = _order_proxy(key)

    if n > 1:
        qs = [i / n for i in range(1, n)]
        bounds = df.select(
            F.percentile_approx(key, qs, 10_000).alias("b")).first()["b"]
        bounds = sorted(set(b for b in (bounds or []) if b is not None))
    else:
        bounds = []
    if bounds:
        # plain CASE-sum over the (small) bounds list — avoids a
        # higher-order-function outer reference, which Catalyst mis-binds
        # under the later broadcast join
        bucket = sum((F.when(F.lit(b) < key, 1).otherwise(0) for b in bounds),
                     F.lit(0))
    else:
        bucket = F.lit(0)
    parts = df.withColumn("_bkt", bucket)

    sizes = {r["_bkt"]: r["cnt"] for r in
             parts.groupBy("_bkt").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    offsets, acc = [], 0
    for b in sorted(sizes):
        offsets.append((b, acc))
        acc += sizes[b]
    off_df = F.broadcast(df.sparkSession.createDataFrame(
        offsets, "_bkt int, _offset long"))

    w = W.partitionBy("_bkt").orderBy(order_col)
    return (
        parts.join(off_df, "_bkt")
        .withColumn("seq",
                    F.row_number().over(w) - 1 + F.col("_offset") + F.lit(start))
        .drop("_bkt", "_offset")
    )


def bucket_name(seq: Column, bucket_size: int, prefix: str = "sitemap_bib_",
                suffix: str = ".xml", start_index: int = 1) -> Column:
    """Map a sequence number to its rollover bucket name (W3)."""
    idx = F.floor(seq / bucket_size) + start_index
    return F.concat(F.lit(prefix), idx.cast("string"), F.lit(suffix))
