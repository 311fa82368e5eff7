"""Stream-stream interval join: drive it through a real streaming
query and check the attributed pairs equal the batch range join on the
same data (the oracle-checked semantics)."""

from __future__ import annotations

import json

from adsmasterpipeline_spark.streaming.joins import interval_join

I_SCHEMA = "ad_id long, imp_id long, its long"
C_SCHEMA = "ad_id long, click_id long, cts long"


def _write_json(path, rows):
    path.mkdir()
    (path / "data.json").write_text("\n".join(json.dumps(r) for r in rows))


def _sources(tmp_path):
    # Offset everything 1h from epoch 0: the streaming engine's
    # initial watermark IS epoch 0, and rows at event time <= the
    # current watermark are dropped as late — a real pipeline never
    # sees 1970 timestamps, but a naive fixture does.
    MIN, H = 60, 3600
    imps = [
        {"ad_id": 1, "imp_id": 10, "its": H + 0},
        {"ad_id": 1, "imp_id": 11, "its": H + 20 * MIN},
        {"ad_id": 2, "imp_id": 12, "its": H + 0},
        {"ad_id": 3, "imp_id": 13, "its": H + 5 * MIN},
    ]
    clicks = [
        {"ad_id": 1, "click_id": 20, "cts": H + 5 * MIN},   # -> imp 10
        {"ad_id": 1, "click_id": 21, "cts": H + 25 * MIN},  # -> imp 11 only
        {"ad_id": 2, "click_id": 22, "cts": H + 50 * MIN},  # beyond horizon
        {"ad_id": 4, "click_id": 23, "cts": H + 1 * MIN},   # no impression
    ]
    i_src, c_src = tmp_path / "imps", tmp_path / "clicks"
    _write_json(i_src, imps)
    _write_json(c_src, clicks)
    return str(i_src), str(c_src)


def _ts(df, col):
    return df.withColumn(col, df[col].cast("timestamp"))


def test_interval_join_stream_matches_batch(spark, tmp_path):
    i_src, c_src = _sources(tmp_path)

    i_stream = _ts(spark.readStream.schema(I_SCHEMA).json(i_src), "its")
    c_stream = _ts(spark.readStream.schema(C_SCHEMA).json(c_src), "cts")
    out = interval_join(i_stream, c_stream, key="ad_id",
                        left_time="its", right_time="cts",
                        horizon="10 minutes")
    q = (out.writeStream.format("memory").queryName("attrib_out")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    stream_pairs = {(r["imp_id"], r["click_id"])
                    for r in spark.table("attrib_out").collect()}

    i_batch = _ts(spark.read.schema(I_SCHEMA).json(i_src), "its")
    c_batch = _ts(spark.read.schema(C_SCHEMA).json(c_src), "cts")
    batch = interval_join(i_batch, c_batch, key="ad_id",
                          left_time="its", right_time="cts",
                          horizon="10 minutes")
    batch_pairs = {(r["imp_id"], r["click_id"]) for r in batch.collect()}

    assert stream_pairs == batch_pairs
    assert stream_pairs == {(10, 20), (11, 21)}


def test_interval_join_left_outer_emits_unmatched(spark, tmp_path):
    i_src, c_src = _sources(tmp_path)
    i_batch = _ts(spark.read.schema(I_SCHEMA).json(i_src), "its")
    c_batch = _ts(spark.read.schema(C_SCHEMA).json(c_src), "cts")
    out = interval_join(i_batch, c_batch, key="ad_id",
                        left_time="its", right_time="cts",
                        horizon="10 minutes", how="left_outer")
    rows = out.collect()
    unmatched = {r["imp_id"] for r in rows if r["click_id"] is None}
    assert unmatched == {12, 13}
    assert len(rows) == 4  # 2 matched + 2 unmatched


def test_sliding_window_stream_matches_batch_query(spark, tmp_path):
    """Drive the 10-min/5-min sliding window through a REAL streaming
    query (availableNow over the parquet source) and check it emits
    exactly the oracled batch sliding_window_counts rows on the same
    data."""
    import datetime as dt

    from pyspark.sql import functions as F

    from adsmasterpipeline_spark.queries.temporal import (
        sliding_window_counts,
    )

    t0 = dt.datetime(2024, 5, 1, 12, 0)
    rows = [
        (i, t0 + dt.timedelta(minutes=3 * i), 1,
         ["view", "click"][i % 2], 0.0, "{}")
        for i in range(20)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    sf = str(tmp_path / "swin")
    df.coalesce(1).write.parquet(sf + "/events.parquet")

    stream = (spark.readStream.schema(df.schema)
              .parquet(sf + "/events.parquet")
              .withWatermark("ts", "1 minute")
              .groupBy(F.window("ts", "10 minutes", "5 minutes"),
                       "event_type")
              .agg(F.count(F.lit(1)).cast("long").alias("n"))
              .select(F.col("window.start").alias("win_start"),
                      F.col("window.end").alias("win_end"),
                      "event_type", "n"))
    q = (stream.writeStream.format("memory")
         .queryName("swin_out").outputMode("complete")
         .trigger(availableNow=True).start())
    try:
        finished = q.awaitTermination(300)
        assert finished, "availableNow run did not finish in 300s"
        got = sorted(map(tuple, spark.table("swin_out").collect()))
    finally:
        q.stop()
    want = sorted(map(tuple, sliding_window_counts(spark, sf).collect()))
    assert got == want and len(want) > 0
