"""As-of join and range join unit tests (edges the oracle queries
don't reach: strict mode, no-match rows, empty/degenerate bands)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from adsmasterpipeline_spark.operators.temporal import (
    asof_join, range_join_bucketed,
)


def ts(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


def _sides(spark):
    left = spark.createDataFrame(
        [(1, "u1", ts(10)), (2, "u1", ts(12)), (3, "u2", ts(9))],
        "lid int, k string, lts timestamp")
    right = spark.createDataFrame(
        [(100, "u1", ts(9)), (101, "u1", ts(11)), (102, "u1", ts(12)),
         (103, "u3", ts(1))],
        "rid int, k string, rts timestamp")
    return left, right


def test_asof_backward(spark):
    left, right = _sides(spark)
    out = {r["lid"]: r for r in
           asof_join(left, right, on="k", left_ts="lts",
                     right_ts="rts").collect()}
    assert out[1]["asof_rid"] == 100          # 09:00 click before 10:00
    assert out[2]["asof_rid"] == 102          # ties (12:00) match non-strict
    assert out[3]["asof_rid"] is None         # u2 has no right rows


def test_asof_strict_excludes_equal_ts(spark):
    left, right = _sides(spark)
    out = {r["lid"]: r for r in
           asof_join(left, right, on="k", left_ts="lts", right_ts="rts",
                     strict=True).collect()}
    assert out[2]["asof_rid"] == 101          # 12:00 excluded, 11:00 wins


def test_range_join_exact_and_clamped(spark):
    facts = spark.range(0, 100).select((F.col("id") % 60).alias("v"))
    bands = spark.createDataFrame(
        [("a", 0.0, 20.0), ("b", 20.0, 40.0), ("c", 40.0, 1e12)],
        "band string, lo double, hi double")
    out = range_join_bucketed(facts, bands, "v", bucket_width=7.0)
    counts = {r["band"]: r["count"] for r in
              out.groupBy("band").count().collect()}
    # ids 0..99 -> v = id % 60: each v in 0..39 appears twice except 40..59 once
    assert counts["a"] == 2 * 20
    assert counts["b"] == 2 * 20
    assert counts["c"] == 20
    # every fact lands in exactly one band
    assert sum(counts.values()) == 100


def test_range_join_band_outside_domain(spark):
    facts = spark.range(0, 10).select(F.col("id").cast("double").alias("v"))
    bands = spark.createDataFrame(
        [("far", 1e6, 2e6)], "band string, lo double, hi double")
    assert range_join_bucketed(facts, bands, "v").count() == 0


def test_funnel_conversion_hand_computed(spark, tmp_path):
    """Planted event orderings: out-of-order events don't count,
    same-timestamp ties resolve by event_id (strictly-after), users
    without the entry event are outside the funnel."""
    import datetime as dt

    from adsmasterpipeline_spark.queries.temporal import funnel_conversion

    def t(sec):
        return dt.datetime(2024, 1, 1, 0, 0, sec)

    rows = [
        # user 1: full funnel, with decoys before each stage
        (1, t(5), 1, "click", 0.0, "{}"),       # click before view: no
        (2, t(10), 1, "view", 0.0, "{}"),
        (3, t(15), 1, "purchase", 0.0, "{}"),   # purchase before click: no
        (4, t(20), 1, "click", 0.0, "{}"),
        (5, t(30), 1, "purchase", 0.0, "{}"),
        # user 2: view only
        (6, t(10), 2, "view", 0.0, "{}"),
        # user 3: no view -> outside the funnel
        (7, t(10), 3, "click", 0.0, "{}"),
        (8, t(20), 3, "purchase", 0.0, "{}"),
        # user 4: all at the SAME ts — id order decides:
        # view id 10, click id 12 (after), purchase id 9 (before click)
        (10, t(40), 4, "view", 0.0, "{}"),
        (12, t(40), 4, "click", 0.0, "{}"),
        (9, t(40), 4, "purchase", 0.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    sf = str(tmp_path / "funnel")
    df.coalesce(1).write.parquet(sf + "/events.parquet")
    out = {r["user_id"]: r for r in funnel_conversion(spark, sf).collect()}
    assert set(out) == {1, 2, 4}
    u1 = out[1]
    assert u1["stage"] == 3
    us = lambda sec: int(dt.datetime(  # noqa: E731
        2024, 1, 1, 0, 0, sec,
        tzinfo=dt.timezone.utc).timestamp() * 1_000_000)
    assert (u1["view_ts_us"], u1["click_ts_us"], u1["purchase_ts_us"]) \
        == (us(10), us(20), us(30))
    assert out[2]["stage"] == 1 and out[2]["click_ts_us"] is None
    assert out[4]["stage"] == 2 and out[4]["purchase_ts_us"] is None


def test_cohort_retention_hand_computed(spark, tmp_path):
    """Planted cohorts: 2 users sign up week 0 (one active week 1),
    1 user signs up week 1; pre-signup activity and never-signed-up
    users are excluded."""
    import datetime as dt

    from adsmasterpipeline_spark.queries.temporal import cohort_retention

    wk0 = dt.datetime(1970, 1, 1, 12)             # epoch week 0
    wk = lambda k: wk0 + dt.timedelta(weeks=k)    # noqa: E731
    rows = [
        (1, wk(0), 1, "signup", 0.0, "{}"),
        (2, wk(1), 1, "click", 0.0, "{}"),        # active offset 1
        (3, wk(0), 2, "signup", 0.0, "{}"),
        (4, wk(0) - dt.timedelta(days=3), 2, "view", 0.0, "{}"),  # pre-signup
        (5, wk(1), 3, "signup", 0.0, "{}"),
        (6, wk(3), 3, "purchase", 0.0, "{}"),     # offset 2
        (7, wk(0), 9, "click", 0.0, "{}"),        # never signs up
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    sf = str(tmp_path / "cohort")
    df.coalesce(1).write.parquet(sf + "/events.parquet")
    out = {(r["cohort_week"], r["week_offset"]): r
           for r in cohort_retention(spark, sf).collect()}
    assert set(out) == {(0, 0), (0, 1), (1, 0), (1, 2)}
    assert out[(0, 0)]["n_active"] == 2 and out[(0, 0)]["n_cohort"] == 2
    assert out[(0, 0)]["retention_ppm"] == 1000000
    assert out[(0, 1)]["n_active"] == 1
    assert out[(0, 1)]["retention_ppm"] == 500000
    assert out[(1, 0)]["n_cohort"] == 1 and out[(1, 2)]["n_active"] == 1


def test_gapfill_forward_fill_hand_computed(spark, tmp_path):
    """Planted gaps: user 1 has days 1,4 -> spine 1..4 with days 2,3
    filled from day 1; user 2 has a single day (no gap rows); a
    null-value day carries the PREVIOUS day's total forward but still
    counts its events."""
    import datetime as dt

    from adsmasterpipeline_spark.queries.temporal import gapfill_forward_fill

    def t(day, h=6):
        return dt.datetime(2024, 3, day, h)

    rows = [
        (1, t(1), 1, "view", 2.50, "{}"),
        (2, t(1, 9), 1, "view", 1.25, "{}"),     # day 1 total 375 cents
        (3, t(4), 1, "click", 10.00, "{}"),      # days 2-3 missing
        (4, t(2), 2, "view", 7.00, "{}"),        # single-day user
        (5, t(5), 3, "view", 1.00, "{}"),
        (6, t(6), 3, "view", None, "{}"),        # null-value day
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    sf = str(tmp_path / "gapfill")
    df.coalesce(1).write.parquet(sf + "/events.parquet")
    out = {(r["user_id"], r["day"].isoformat()): (r["n_events"],
                                                  r["filled_cents"])
           for r in gapfill_forward_fill(spark, sf).collect()}
    assert out == {
        (1, "2024-03-01"): (2, 375),
        (1, "2024-03-02"): (0, 375),
        (1, "2024-03-03"): (0, 375),
        (1, "2024-03-04"): (1, 1000),
        (2, "2024-03-02"): (1, 700),
        (3, "2024-03-05"): (1, 100),
        (3, "2024-03-06"): (1, 100),   # null day: count 1, total carried
    }


def test_sliding_window_counts_hand_computed(spark, tmp_path):
    """Planted boundary events: an event ON a hop boundary belongs to
    exactly 2 windows ([t-5m, t+5m) and [t, t+10m)); one 2.5 minutes
    later shares those same windows; counts add up per window."""
    import datetime as dt

    from adsmasterpipeline_spark.queries.temporal import (
        sliding_window_counts,
    )

    t0 = dt.datetime(2024, 1, 1, 0, 10)          # on a 5-min boundary
    rows = [
        (1, t0, 1, "view", 0.0, "{}"),
        (2, t0 + dt.timedelta(minutes=2, seconds=30), 1, "view",
         0.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    sf = str(tmp_path / "slide")
    df.coalesce(1).write.parquet(sf + "/events.parquet")
    out = {(r["win_start"].isoformat(), r["win_end"].isoformat()):
           r["n"] for r in sliding_window_counts(spark, sf).collect()}
    assert out == {
        ("2024-01-01T00:05:00", "2024-01-01T00:15:00"): 2,
        ("2024-01-01T00:10:00", "2024-01-01T00:20:00"): 2,
    }


def test_native_session_window_matches_sessionize(spark):
    """Spark's built-in F.session_window (30-min gap) must carve the
    SAME sessions as the oracled gaps-and-islands sessionize query:
    same (user, first-event ts, event count) triples on the full
    sf0.001 events table. (Boundary semantics differ only for a gap of
    exactly 30:00.000000 — absent from the fixed dataset.)"""
    from pyspark.sql import functions as F

    from adsmasterpipeline_spark.queries.pipeline import sessionize
    from adsmasterpipeline_spark.sources import load_table
    from tests.conftest import SF_DIR

    ev = load_table(spark, SF_DIR, "events")
    native = (ev.groupBy("user_id",
                         F.session_window("ts", "30 minutes"))
              .agg(F.min("ts").alias("t0"),
                   F.count(F.lit(1)).alias("n"))
              .select("user_id", "t0", "n"))
    mine = (sessionize(spark, SF_DIR)
            .join(ev.select("event_id", "ts"), "event_id")
            .groupBy("user_id", "session_id")
            .agg(F.min("ts").alias("t0"), F.count(F.lit(1)).alias("n"))
            .select("user_id", "t0", "n"))
    a = sorted(map(tuple, native.collect()))
    b = sorted(map(tuple, mine.collect()))
    assert a == b and len(a) > 0


def test_sliding_window_pre_epoch_oracle_parity(spark, tmp_path):
    """A pre-epoch (negative epoch-us) event must land in the same two
    floor-aligned windows in BOTH engines — the oracle's floor-mod
    (not truncating %) is what keeps DuckDB on Spark's F.window
    semantics left of 1970."""
    import datetime as dt

    import duckdb

    from adsmasterpipeline_spark.queries import REGISTRY, _load
    from adsmasterpipeline_spark.queries.temporal import (
        sliding_window_counts,
    )

    _load()
    rows = [(1, dt.datetime(1969, 12, 31, 23, 58), 1, "view", 0.0, "{}")]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    sf = str(tmp_path / "preepoch")
    df.coalesce(1).write.parquet(sf + "/events.parquet")
    got = sorted(map(tuple, sliding_window_counts(spark, sf).collect()))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{sf}/events.parquet/*.parquet')")
    want = sorted(map(tuple, con.execute(
        REGISTRY["sliding_window_counts"].oracle).fetchall()))
    assert got == want
    assert [r[0] for r in got] == [dt.datetime(1969, 12, 31, 23, 50),
                                   dt.datetime(1969, 12, 31, 23, 55)]
