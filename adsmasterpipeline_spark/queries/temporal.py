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


@query(
    "funnel_conversion",
    """
    WITH ev AS (
      SELECT user_id, event_type,
             epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, event_id
      FROM events
    ),
    s1 AS (
      SELECT user_id, MIN(struct_pack(t := ts_us, i := event_id)) AS m
      FROM ev WHERE event_type = 'view' GROUP BY user_id
    ),
    s2 AS (
      SELECT e.user_id, MIN(struct_pack(t := e.ts_us, i := e.event_id)) AS m
      FROM ev e JOIN s1 ON e.user_id = s1.user_id
      WHERE e.event_type = 'click'
        AND struct_pack(t := e.ts_us, i := e.event_id) > s1.m
      GROUP BY e.user_id
    ),
    s3 AS (
      SELECT e.user_id, MIN(struct_pack(t := e.ts_us, i := e.event_id)) AS m
      FROM ev e JOIN s2 ON e.user_id = s2.user_id
      WHERE e.event_type = 'purchase'
        AND struct_pack(t := e.ts_us, i := e.event_id) > s2.m
      GROUP BY e.user_id
    )
    SELECT s1.user_id,
           CAST(1 + CASE WHEN s2.m IS NULL THEN 0 ELSE 1 END
                  + CASE WHEN s3.m IS NULL THEN 0 ELSE 1 END AS INT)
             AS stage,
           CAST((s1.m).t AS BIGINT) AS view_ts_us,
           CAST((s2.m).t AS BIGINT) AS click_ts_us,
           CAST((s3.m).t AS BIGINT) AS purchase_ts_us
    FROM s1 LEFT JOIN s2 ON s1.user_id = s2.user_id
            LEFT JOIN s3 ON s1.user_id = s3.user_id
    """,
    "temporal", "window",
    doc="Ordered funnel analysis (view -> click -> purchase) per user: "
        "stage k's event is the EARLIEST matching event strictly after "
        "stage k-1's, with (ts, event_id) lexicographic order for "
        "deterministic tie-breaks — the product-analytics conversion "
        "funnel. Each stage is one filtered min-struct aggregate "
        "(map-side combinable) plus a user-keyed join — no windows, no "
        "per-user event sorting; users who never 'view' are outside "
        "the funnel by definition. At 100 TB events shuffle once per "
        "stage on user_id and AQE co-partitions the stage joins; the "
        "chain generalizes to any fixed step list.",
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        "event_id")
    key = F.struct(F.col("ts_us").alias("t"), F.col("event_id").alias("i"))

    def stage(ev_type, prev):
        e = ev.where(F.col("event_type") == ev_type)
        if prev is not None:
            e = (e.join(prev.select("user_id", F.col("m").alias("_pm")),
                        "user_id")
                 .where(key > F.col("_pm")))
        return e.groupBy("user_id").agg(F.min(key).alias("m"))

    s1 = stage("view", None)
    s2 = stage("click", s1)
    s3 = stage("purchase", s2)
    return (s1
            .join(s2.select("user_id", F.col("m").alias("m2")),
                  "user_id", "left")
            .join(s3.select("user_id", F.col("m").alias("m3")),
                  "user_id", "left")
            .select(
                "user_id",
                (1 + F.when(F.col("m2").isNull(), 0).otherwise(1)
                 + F.when(F.col("m3").isNull(), 0).otherwise(1))
                .cast("int").alias("stage"),
                F.col("m.t").cast("long").alias("view_ts_us"),
                F.col("m2.t").cast("long").alias("click_ts_us"),
                F.col("m3.t").cast("long").alias("purchase_ts_us")))


@query(
    "cohort_retention",
    """
    WITH ev AS (
      SELECT user_id, event_type,
             CAST(FLOOR(epoch_us(CAST(ts AS TIMESTAMP)) / 604800000000)
                  AS BIGINT) AS wk
      FROM events
    ),
    su AS (
      SELECT user_id, MIN(wk) AS cohort_wk
      FROM ev WHERE event_type = 'signup' GROUP BY user_id
    ),
    cohorts AS (
      SELECT cohort_wk, CAST(COUNT(*) AS BIGINT) AS n_cohort
      FROM su GROUP BY cohort_wk
    ),
    act AS (
      SELECT DISTINCT su.cohort_wk, e.wk - su.cohort_wk AS off, e.user_id
      FROM ev e JOIN su ON e.user_id = su.user_id
      WHERE e.wk >= su.cohort_wk
    ),
    ret AS (
      SELECT cohort_wk, off, CAST(COUNT(*) AS BIGINT) AS n_active
      FROM act GROUP BY cohort_wk, off
    )
    SELECT r.cohort_wk AS cohort_week, r.off AS week_offset,
           r.n_active, c.n_cohort,
           CAST(FLOOR(CAST(r.n_active AS DOUBLE) * 1000000.0
                      / c.n_cohort) AS BIGINT) AS retention_ppm
    FROM ret r JOIN cohorts c ON r.cohort_wk = c.cohort_wk
    """,
    "temporal", "window",
    doc="Cohort retention (the product-analytics companion to "
        "funnel_conversion): users cohorted by their first 'signup' "
        "week (epoch-week = floor(epoch_us / 604800e6) — no calendar/"
        "timezone ambiguity across engines), then the fraction of each "
        "cohort active in week offset k, as floor-scaled ppm of exact "
        "integer counts. Scale shape: one min-aggregate for cohort "
        "assignment, a user-keyed join, and a distinct + count "
        "aggregate on (cohort, offset, user) — all map-side "
        "combinable, shuffles keyed on user_id / small composites; no "
        "windows, no per-user ordering. Activity before signup is "
        "excluded; users who never sign up are outside every cohort.",
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    wk = F.floor(F.unix_micros(F.col("ts").cast("timestamp"))
                 / 604800000000).cast("long")
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", wk.alias("wk"))
    su = (ev.where(F.col("event_type") == "signup")
          .groupBy("user_id").agg(F.min("wk").alias("cohort_wk")))
    cohorts = su.groupBy("cohort_wk").agg(
        F.count(F.lit(1)).cast("long").alias("n_cohort"))
    act = (ev.join(su, "user_id")
           .where(F.col("wk") >= F.col("cohort_wk"))
           .select("cohort_wk", (F.col("wk") - F.col("cohort_wk"))
                   .alias("off"), "user_id")
           .distinct())
    ret = act.groupBy("cohort_wk", "off").agg(
        F.count(F.lit(1)).cast("long").alias("n_active"))
    return (ret.join(cohorts, "cohort_wk")
            .select(F.col("cohort_wk").alias("cohort_week"),
                    F.col("off").alias("week_offset"),
                    "n_active", "n_cohort",
                    F.floor(F.col("n_active").cast("double") * 1000000.0
                            / F.col("n_cohort")).cast("long")
                    .alias("retention_ppm")))


@query(
    "path_transitions",
    """
    WITH ev AS (
      SELECT user_id, event_type,
             epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, event_id
      FROM events
    ),
    seq AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER w AS prev_type,
             ts_us - LAG(ts_us) OVER w AS gap_us
      FROM ev
      WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
    )
    SELECT prev_type AS from_type, event_type AS to_type,
           CAST(COUNT(*) AS BIGINT) AS n_transitions,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM seq
    WHERE prev_type IS NOT NULL AND gap_us <= 1800000000
    GROUP BY prev_type, event_type
    """,
    "temporal", "window",
    doc="User-journey path transitions: consecutive event-type pairs "
        "per user (ordered by (ts, event_id) — deterministic ties) "
        "within a 30-minute gap, aggregated to transition counts and "
        "distinct-user counts — the Markov-chain edge table behind "
        "'users who did X then did Y' product analytics and the input "
        "to next-step prediction. Scale shape: ONE per-user window "
        "(partitioned — parallel, no global funnel) + a "
        "map-side-combinable aggregate on the tiny (from, to) key "
        "space; the same shape extends to k-step paths via k lags.",
)
def path_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        "event_id")
    w = W.partitionBy("user_id").orderBy("ts_us", "event_id")
    seq = ev.select(
        "user_id", "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
        (F.col("ts_us") - F.lag("ts_us").over(w)).alias("gap_us"))
    return (seq.where(F.col("prev_type").isNotNull()
                      & (F.col("gap_us") <= 1800000000))
            .groupBy(F.col("prev_type").alias("from_type"),
                     F.col("event_type").alias("to_type"))
            .agg(F.count(F.lit(1)).cast("long").alias("n_transitions"),
                 F.countDistinct("user_id").cast("long").alias("n_users")))


@query(
    "gapfill_forward_fill",
    """
    WITH daily AS (
      SELECT user_id, CAST(ts AS DATE) AS day,
             SUM(CAST(ROUND(value * 100) AS BIGINT)) AS cents,
             COUNT(*) AS n
      FROM events GROUP BY 1, 2
    ),
    bounds AS (
      SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 FROM daily GROUP BY 1
    ),
    spine AS (
      SELECT user_id,
             CAST(UNNEST(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE)
               AS day
      FROM bounds
    )
    SELECT s.user_id, s.day,
           CAST(COALESCE(d.n, 0) AS BIGINT) AS n_events,
           CAST(COALESCE(
             last_value(d.cents IGNORE NULLS) OVER (
               PARTITION BY s.user_id ORDER BY s.day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0)
             AS BIGINT) AS filled_cents
    FROM spine s LEFT JOIN daily d
      ON s.user_id = d.user_id AND s.day = d.day
    """,
    "temporal", "window",
    doc="Time-series gap filling + forward fill (densify): per-user "
        "daily activity rolled up in exact integer cents, a dense day "
        "spine generated per user from that user's own [min, max] range "
        "(sequence + explode — no driver-side calendar, no global "
        "cross-join blowup), missing days left-joined in, and the last "
        "observed daily total carried forward with last(ignorenulls) "
        "over a USER-PARTITIONED window — thousands of independent "
        "partitions, no global sort. The standard resample/ffill of "
        "pandas or the GAPFILL/LOCF of time-series databases, stated "
        "as a Spark plan that scales with users x days. Scale shape: "
        "one shuffle for the rollup, one for the spine join (both on "
        "user_id, co-partitioned), window per user; a sensor with a "
        "year of data emits 365 spine rows, bounded by its own span.",
)
def gapfill_forward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    # pin the rollup: it feeds BOTH the bounds aggregate and the spine
    # join, and without materialization the corpus is scanned twice
    # (static planning showed 2 FileScans; exchange reuse across the
    # two different downstream keys is AQE-dependent). The pinned
    # table is bounded by users x active days — tiny next to the raw
    # event stream; at cluster scale this is a lake-table stage.
    daily = (ev.select("user_id", F.to_date("ts").alias("day"), "value")
             .groupBy("user_id", "day")
             .agg(F.sum(F.round(F.col("value") * 100).cast("long"))
                  .alias("cents"),
                  F.count(F.lit(1)).alias("n"))).localCheckpoint()
    bounds = daily.groupBy("user_id").agg(F.min("day").alias("d0"),
                                          F.max("day").alias("d1"))
    spine = bounds.select(
        "user_id",
        F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("day"))
    w = (W.partitionBy("user_id").orderBy("day")
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    return (spine.join(daily, ["user_id", "day"], "left")
            .select("user_id", "day",
                    F.coalesce("n", F.lit(0)).cast("long").alias("n_events"),
                    F.coalesce(F.last("cents", ignorenulls=True).over(w),
                               F.lit(0)).cast("long").alias("filled_cents")))


@query(
    "sliding_window_counts",
    """
    WITH floored AS (
      -- floor-mod, not truncating %: pre-epoch (negative) timestamps
      -- must floor toward -inf exactly like Spark's F.window
      SELECT event_type,
             epoch_us(ts)
               - ((epoch_us(ts) % 300000000) + 300000000) % 300000000
               AS f_us
      FROM events
    ),
    expanded AS (
      SELECT event_type, UNNEST([f_us - 300000000, f_us]) AS s_us
      FROM floored
    )
    SELECT make_timestamp(s_us) AS win_start,
           make_timestamp(s_us + 600000000) AS win_end,
           event_type, CAST(COUNT(*) AS BIGINT) AS n
    FROM expanded GROUP BY 1, 2, 3
    """,
    "temporal", "window",
    doc="Event-time sliding-window aggregation in batch form: 10-minute "
        "windows hopping every 5 minutes, counts per (window, "
        "event_type). Spark states it declaratively with F.window "
        "(each event expands to exactly window/slide = 2 rows inside "
        "codegen, then one map-side-combinable aggregate — the same "
        "plan Structured Streaming runs incrementally with a "
        "watermark, cf. streaming/test coverage); the oracle replays "
        "the window-assignment arithmetic in exact integer "
        "microseconds (start = floor-to-slide, plus the preceding "
        "hop). Scale shape: shuffle keyed on (window, type) — "
        "time-bucketed keys are naturally balanced; no windows over "
        "data-sized partitions, no sort.",
)
def sliding_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (ev.groupBy(F.window("ts", "10 minutes", "5 minutes"),
                       "event_type")
            .agg(F.count(F.lit(1)).cast("long").alias("n"))
            .select(F.col("window.start").alias("win_start"),
                    F.col("window.end").alias("win_end"),
                    "event_type", "n"))
