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
