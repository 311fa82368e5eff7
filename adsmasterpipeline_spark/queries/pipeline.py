"""Pipeline-semantics operators (SURVEY.md §2.2, §2.9) over the
driver's ``events`` stream table: keyed last-writer-wins merge,
checksum-diff incremental dispatch, JSON payload extraction,
sessionization.

The ``events`` table plays the role of the reference's protobuf update
stream (`adsmp/app.py:335-379`); ``(user_id, event_type)`` plays
``(bibcode, payload-type)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..sources import load_table
from . import query


@query(
    "merge_last_writer_wins",
    """
    SELECT user_id, event_type, event_id AS last_event_id,
           ROUND(value, 2) AS last_value, CAST(ts AS TIMESTAMP) AS last_ts
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                   ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
    "merge",
    doc="M1/M2: batch event fold — multiple updates per key collapse to the "
        "newest per (key, type) before the upsert (adsmp/app.py:120-195; "
        "window replaces the reference's serial-queue ordering).",
)
def merge_last_writer_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc())
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "user_id", "event_type",
            F.col("event_id").alias("last_event_id"),
            F.round("value", 2).alias("last_value"),
            F.col("ts").alias("last_ts"),
        )
    )


@query(
    "checksum_dispatch",
    """
    WITH state AS (
      SELECT user_id, event_type, event_id, value,
             ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn_asc,
             COUNT(*) OVER (PARTITION BY user_id, event_type) AS n
      FROM events
    ),
    old AS (SELECT user_id, event_type,
                   md5(CAST(user_id AS VARCHAR) || '|' || event_type || '|' ||
                       CAST(ROUND(value, 2) AS VARCHAR)) AS checksum
            FROM state WHERE rn_asc = 1),
    new AS (SELECT user_id, event_type,
                   md5(CAST(user_id AS VARCHAR) || '|' || event_type || '|' ||
                       CAST(ROUND(value, 2) AS VARCHAR)) AS checksum
            FROM state WHERE rn_asc = n)
    SELECT new.user_id, new.event_type, new.checksum AS new_checksum
    FROM new JOIN old ON new.user_id = old.user_id AND new.event_type = old.event_type
    WHERE new.checksum <> old.checksum
    """,
    "dispatch",
    doc="O1/F15: checksum change suppression — recompute a canonical checksum "
        "of the newest payload per key and dispatch only rows whose checksum "
        "differs from the stored one (adsmp/app.py:594-626, "
        "adsmp/tasks.py:404-409). Here 'stored' = checksum of the oldest "
        "event per key, 'new' = newest.",
)
def checksum_dispatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w_asc = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    cnt = W.partitionBy("user_id", "event_type")
    state = ev.select(
        "user_id", "event_type", "value",
        F.row_number().over(w_asc).alias("rn_asc"),
        F.count(F.lit(1)).over(cnt).alias("n"),
    )
    digest = F.md5(F.concat_ws(
        "|", F.col("user_id").cast("string"), F.col("event_type"),
        F.round("value", 2).cast("string")))
    old = state.where(F.col("rn_asc") == 1).select(
        "user_id", "event_type", digest.alias("old_checksum"))
    new = state.where(F.col("rn_asc") == F.col("n")).select(
        "user_id", "event_type", digest.alias("new_checksum"))
    return (
        new.join(old, ["user_id", "event_type"])
        .where(F.col("new_checksum") != F.col("old_checksum"))
        .select("user_id", "event_type", "new_checksum")
    )


@query(
    "json_payload_extract",
    """
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           COUNT(*) AS n
    FROM events GROUP BY event_type
    """,
    "functions",
    doc="JSON payload field extraction + aggregate (the reference parses JSON "
        "payload columns everywhere, e.g. adsmp/models.py:116-122).",
)
def json_payload_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.sum(F.get_json_object("props", "$.k").cast("long")).alias("sum_k"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "sessionize",
    """
    WITH us AS (
      SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS tus FROM events
    ),
    gaps AS (
      SELECT user_id, event_id, tus,
             CASE WHEN tus - LAG(tus) OVER (PARTITION BY user_id ORDER BY tus, event_id)
                       > 1800000000 OR
                       LAG(tus) OVER (PARTITION BY user_id ORDER BY tus, event_id) IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM us
    )
    SELECT user_id, event_id,
           CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY tus, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
    FROM gaps
    """,
    "window", "streaming",
    doc="Sessionization: gap>30min starts a new session — lag + cumulative sum "
        "(engine extension; streaming analogue is session_window, §2.10).",
)
def sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").withColumn("tus", F.unix_micros("ts"))
    w = W.partitionBy("user_id").orderBy("tus", "event_id")
    gap = F.col("tus") - F.lag("tus").over(w)
    is_new = F.when(gap.isNull() | (gap > 30 * 60 * 1_000_000), 1).otherwise(0)
    wsum = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    return (
        ev.withColumn("is_new", is_new)
        .select(
            "user_id", "event_id",
            F.sum("is_new").over(wsum).alias("session_id"),
        )
    )


@query(
    "incremental_watermark_scan",
    """
    SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS ts
    FROM events
    WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-15 00:00:00'
    """,
    "dispatch",
    doc="P4/O2: incremental watermark scan — updated >= since "
        "(run.py:148-160); pushed down to the parquet scan.",
)
def incremental_watermark_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.where(F.col("ts") >= F.lit("2024-01-15 00:00:00").cast("timestamp"))
        .select("event_id", "user_id", "event_type", "ts")
    )
