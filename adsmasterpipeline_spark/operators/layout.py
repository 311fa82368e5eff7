"""Data-layout operators: Z-order (Morton) clustering for multi-column
data skipping.

At 100 TB the dominant read cost is scanning files whose min/max column
stats can't exclude them. Sorting by one column gives perfect skipping
on that column and none on any other; interleaving the bits of two key
columns (a space-filling curve) bounds every bucket to a small
rectangle in (a, b) space, so min/max stats prune scans filtered on
EITHER column.

The bucket id is the Z-value's top bits — a pure per-row integer
expression. No sampled range boundaries (``repartitionByRange``
re-samples per job and is non-deterministic — see
``operators/assignment.py``), no global sort, no shuffle until the
caller repartitions by ``zbucket`` to lay files out.

``interleave_bits`` uses the classic magic-number bit-spreading
(Morton encoding), identical integer ops in any engine — the DuckDB
oracle reproduces it exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (mask, shift) pairs spreading a 16-bit int so its bits occupy even
# positions of a 32-bit int: x = abcd -> a0b0c0d0.
_SPREAD = ((0x00FF00FF, 8), (0x0F0F0F0F, 4), (0x33333333, 2), (0x55555555, 1))


def _spread16(x: Column) -> Column:
    # long arithmetic throughout: the last spread step shifts into bit
    # 32, which overflows a 32-bit int (Spark shiftleft wraps silently)
    x = x.cast("long").bitwiseAND(F.lit(0xFFFF))
    for mask, shift in _SPREAD:
        x = x.bitwiseOR(F.shiftleft(x, shift)).bitwiseAND(F.lit(mask))
    return x


def interleave_bits(a: Column, b: Column) -> Column:
    """32-bit Morton code of two 16-bit keys (a in even bits, b odd)."""
    return _spread16(a).bitwiseOR(F.shiftleft(_spread16(b), 1))


def zorder_layout(df: DataFrame, col_a: str, col_b: str,
                  bucket_bits: int = 6) -> DataFrame:
    """Assign each row a Z-value and a layout bucket (top
    ``bucket_bits`` bits → 2**bucket_bits buckets).

    Keys are first scaled onto the full 16-bit domain by their column
    max (order-preserving; a narrow-domain key would otherwise leave
    the Morton code's high bits — and every bucket id — zero). The max
    comes from one tiny aggregate broadcast back; on a lakehouse it
    would come from table stats for free. floor(a*65535/max) is a
    single IEEE multiply+divide on identical inputs — deterministic
    cross-engine.

    Callers produce the clustered layout with
    ``df.repartition("zbucket").sortWithinPartitions("zvalue")`` +
    a partitioned write; this function is the narrow, deterministic
    assignment stage.
    """
    maxes = df.agg(F.max(col_a).alias("_max_a"), F.max(col_b).alias("_max_b"))
    scaled_a = F.floor(F.col(col_a) * 65535 / F.col("_max_a"))
    scaled_b = F.floor(F.col(col_b) * 65535 / F.col("_max_b"))
    z = interleave_bits(scaled_a, scaled_b)
    return (df.crossJoin(F.broadcast(maxes))
              .withColumn("zvalue", z.cast("long"))
              .withColumn("zbucket",
                          F.shiftright(F.col("zvalue"),
                                       32 - bucket_bits).cast("int"))
              .drop("_max_a", "_max_b"))


def skipping_stats(df: DataFrame, col_a: str, col_b: str,
                   bucket_bits: int = 6) -> DataFrame:
    """Per-bucket min/max of both keys — the file-level stats a
    lakehouse would persist for data skipping. The proof of clustering
    quality: every bucket's (max-min) extent is small on BOTH columns,
    which single-column sorting cannot achieve."""
    zb = zorder_layout(df, col_a, col_b, bucket_bits)
    return zb.groupBy("zbucket").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min(col_a).alias(f"min_{col_a}"),
        F.max(col_a).alias(f"max_{col_a}"),
        F.min(col_b).alias(f"min_{col_b}"),
        F.max(col_b).alias(f"max_{col_b}"))
