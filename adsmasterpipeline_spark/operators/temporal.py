"""Temporal join operators Spark lacks natively (pyspark guide
'Common OLAP patterns'): as-of join and range join.

Both come in two physical shapes:

- ``asof_join``: the UNION + WINDOW form — tag both sides, sort by
  (key, ts), carry the last right-side row forward with
  ``last(..., ignorenulls=True)``. ONE shuffle on the key, no join
  blowup, no per-group pandas; this is the 100 TB shape.
  (``merge_asof`` via applyInPandas would be the per-group fallback
  when the combined per-key stream does not fit a task — not needed:
  windows stream.)
- ``range_join_bucketed``: non-equi range predicates make Spark pick a
  nested-loop join; for a big fact side, map each band to the fixed-
  width buckets it overlaps, explode the (small) bands side, and
  equi-join on the bucket before refining with the exact predicate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, on: str,
              left_ts: str, right_ts: str,
              right_cols: list[str] | None = None,
              strict: bool = False) -> DataFrame:
    """For every left row, attach the most recent right row of the same
    ``on`` key with ``right_ts <= left_ts`` (``<`` when strict).
    Right columns come back as ``asof_<name>`` (null when no match).
    """
    right_cols = right_cols or [c for c in right.columns
                                if c not in (on, right_ts)]
    # sort order at EQUAL timestamps decides tie semantics: right rows
    # before left (0 < 1) -> ties match; right after left (2 > 1) ->
    # strict, ties excluded
    r_side = 2 if strict else 0
    l = left.withColumn("_ts", F.col(left_ts)) \
        .withColumn("_side", F.lit(1))
    r = right.select(
        on, F.col(right_ts).alias("_ts"), F.lit(r_side).alias("_side"),
        F.struct(*[F.col(c) for c in right_cols],
                 F.col(right_ts).alias("_rts")).alias("_payload"))
    l_aligned = l.select(
        *[F.col(c) for c in left.columns], "_ts", "_side",
        F.lit(None).cast(r.schema["_payload"].dataType).alias("_payload"))
    unioned = l_aligned.unionByName(r, allowMissingColumns=True)

    w = (W.partitionBy(on)
         .orderBy(F.col("_ts"), F.col("_side"))
         .rowsBetween(W.unboundedPreceding, 0))
    carried = unioned.withColumn(
        "_match", F.last("_payload", ignorenulls=True).over(w))
    out = carried.where(F.col("_side") == 1)
    for c in right_cols:
        out = out.withColumn(f"asof_{c}", F.col("_match").getField(c))
    out = out.withColumn("asof_ts", F.col("_match").getField("_rts"))
    return out.drop("_ts", "_side", "_payload", "_match")


def range_join_bucketed(facts: DataFrame, bands: DataFrame,
                        value_col: str, lo_col: str = "lo",
                        hi_col: str = "hi",
                        bucket_width: float = 10.0) -> DataFrame:
    """Join each fact row to the band where ``lo <= value < hi``.
    ``bands`` is small; each band explodes to the fixed-width buckets
    it overlaps and the join runs on the bucket id (equi, broadcast),
    refined by the exact predicate.

    Band edges are clamped to the facts' observed [min, max] first —
    an open-ended band (hi = +inf sentinel) must not explode into
    millions of empty buckets."""
    lo_min, hi_max = facts.agg(
        F.min(value_col), F.max(value_col)).first()
    lo_b = F.greatest(F.col(lo_col), F.lit(float(lo_min)))
    hi_b = F.least(F.col(hi_col), F.lit(float(hi_max) + bucket_width))
    b = bands.where(hi_b > lo_b).withColumn(
        "_bkt",
        F.explode(F.sequence(
            F.floor(lo_b / bucket_width).cast("long"),
            F.ceil(hi_b / bucket_width).cast("long"))))
    f = facts.withColumn(
        "_bkt", F.floor(F.col(value_col) / bucket_width).cast("long"))
    return (
        f.join(F.broadcast(b), "_bkt")
        .where((F.col(value_col) >= F.col(lo_col))
               & (F.col(value_col) < F.col(hi_col)))
        .drop("_bkt")
    )
