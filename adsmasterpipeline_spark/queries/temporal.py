"""Temporal operator queries: as-of attribution and banded range join,
both oracle-checked. The Spark side runs the SCALABLE physical form
(union-window as-of; bucketized range join) while the oracle states
the naive relational semantics — the gate proves they agree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.temporal import asof_join, range_join_bucketed
from ..sources import load_table
from . import query


@query(
    "asof_attribution",
    """
    WITH purchases AS (
      SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
      FROM events WHERE event_type = 'purchase'
    ),
    clicks AS (
      SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
      FROM events WHERE event_type = 'click'
    )
    SELECT p.event_id AS purchase_id,
           arg_max(c.event_id, c.ts) AS click_id,
           CAST(epoch_us(p.ts) - MAX(epoch_us(c.ts)) AS BIGINT) AS gap_us
    FROM purchases p JOIN clicks c
      ON p.user_id = c.user_id AND c.ts <= p.ts
    GROUP BY p.event_id, p.ts
    """,
    "temporal", "join",
    doc="As-of join (attribution): latest prior click per purchase. "
        "Spark runs the union-window form — one shuffle on user_id, no "
        "join blowup; the oracle states the naive join+argmax semantics. "
        "Purchases with no prior click drop out (inner as-of).",
)
def asof_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase") \
        .select("event_id", "user_id", "ts")
    clicks = ev.where(F.col("event_type") == "click") \
        .select(F.col("event_id").alias("click_event"), "user_id", "ts")
    joined = asof_join(purchases, clicks, on="user_id",
                       left_ts="ts", right_ts="ts")
    return (
        joined.where(F.col("asof_click_event").isNotNull())
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("asof_click_event").alias("click_id"),
            (F.unix_micros("ts") - F.unix_micros("asof_ts")).alias("gap_us"),
        )
    )


@query(
    "range_join_bands",
    """
    WITH bands(band, lo, hi) AS (
      VALUES ('low', 0.0, 10.0), ('mid', 10.0, 25.0),
             ('high', 25.0, 45.0), ('huge', 45.0, 1e9)
    )
    SELECT b.band, COUNT(*) AS n, ROUND(SUM(l.l_extendedprice), 2) AS revenue
    FROM lineitem l JOIN bands b
      ON l.l_quantity >= b.lo AND l.l_quantity < b.hi
    GROUP BY b.band
    """,
    "temporal", "join",
    doc="Range join: facts into value bands. Spark runs the bucketized "
        "equi-join (bands exploded over fixed-width buckets, broadcast, "
        "exact-predicate refine) instead of the nested-loop plan the "
        "naive non-equi join produces.",
)
def range_join_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    bands = spark.createDataFrame(
        [("low", 0.0, 10.0), ("mid", 10.0, 25.0),
         ("high", 25.0, 45.0), ("huge", 45.0, 1e9)],
        "band string, lo double, hi double")
    joined = range_join_bucketed(li, bands, "l_quantity")
    return joined.groupBy("band").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("l_extendedprice"), 2).alias("revenue"))
