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
    """Order-preserving numeric proxy for a string key: the first
    SEVEN UTF-8 BYTES, zero-right-padded and read big-endian into a
    56-bit long (k1 < k2 ⇒ proxy(k1) <= proxy(k2); equal proxies stay
    in one bucket, so range bucketing on the proxy never splits the
    true ordering). Two properties matter:

    - BYTES, not clamped code points: UTF-8 byte order IS the string
      sort order, so the proxy is exact on any input — a round-5
      hypothesis test caught the earlier clamp-to-127 scheme
      inverting '\\x7f0' vs '\\x80' (clamping ties 0x7f with 0x80 and
      lets the NEXT character decide, splitting the true ordering);
    - FOURTEEN bytes of granularity (earlier: three chars) for skew:
      bibcode-like keys ("2019ApJ...") share long year prefixes, and
      a 3-char proxy collapsed them onto a handful of distinct values
      — range buckets degenerated to a few hot ones. Zero-padded
      numeral fields ("2019J0004700123A") are even worse — variety
      hides deep in the string — so the proxy spans 14 bytes as two
      7-byte big-endian longs combined into a decimal(38,0)
      (max 2^112 ~ 5.2e33: 34 digits, no decimal overflow; conv()
      itself is 64-bit-bounded, hence the two-limb split).

    Granularity beyond 14 bytes only affects bucket balance, never
    correctness (ties share a bucket; the in-bucket window orders by
    the real column)."""
    b = F.rpad(F.encode(key, "UTF-8"), 14, bytes([0]))
    hi = F.conv(F.hex(F.substring(b, 1, 7)), 16, 10).cast("long")
    lo = F.conv(F.hex(F.substring(b, 8, 7)), 16, 10).cast("long")
    return (hi.cast("decimal(20,0)")
            * F.lit(1 << 56).cast("decimal(18,0)")
            + lo.cast("decimal(20,0)"))


def assign_sequential(df: DataFrame, order_col: str,
                      num_partitions: int | None = None,
                      start: int = 0,
                      stats_out: dict | None = None) -> DataFrame:
    """Add a ``seq`` column = ``start`` + 0-based global position of the
    row when ordered by ``order_col`` (must be unique).

    ``stats_out``: optional dict the caller owns; filled with
    ``{"total": <row count>}`` — the bucket-size pass already sums it,
    so consumers that need N avoid a separate counting subtree."""
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
    if stats_out is not None:
        stats_out["total"] = acc
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
