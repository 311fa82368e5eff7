"""Streaming change-data-feed source (streaming/cdf_source.py):
``spark.readStream.format("txn_cdf")`` over a TxnTable serves the
same row-level deltas as the batch ``changes()`` — per-commit
partitions, compact emits nothing, checkpoint resume is exactly-once
over versions, retention violations fail loudly.

Reference anchor: the subscription form of the change_log audit
pattern (/root/reference/adsmp/models.py:127-141), served from the
transaction log instead of a second table.
"""

from __future__ import annotations

import os

import pytest

from adsmasterpipeline_spark.sinks.txnlake import txn_table
from adsmasterpipeline_spark.streaming.cdf_source import (
    TxnChangeFeedDataSource,
)


def _recs(spark, rows):
    return spark.createDataFrame(rows, "bibcode string, v long")


@pytest.fixture
def registered(spark):
    spark.dataSource.register(TxnChangeFeedDataSource)
    return spark


def _drain(spark, path, ckpt, **options):
    """Run the stream availableNow and return the collected rows."""
    collected = []
    reader = spark.readStream.format("txn_cdf").option("path", path)
    for k, v in options.items():
        reader = reader.option(k, v)
    q = (reader.load().writeStream
         .foreachBatch(lambda df, _e: collected.extend(df.collect()))
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    return collected


def test_stream_cdf_parity_and_resume(registered, tmp_path):
    """Stream output == batch changes() across overwrite / merge /
    delete / compact; a restart on the same checkpoint serves ONLY
    the versions committed since (exactly-once offsets)."""
    spark = registered
    path = str(tmp_path / "t")
    t = txn_table(spark, path, rows_per_file=1000)
    t.overwrite(_recs(spark, [("B1", 1), ("B2", 2), ("C1", 3)])
                .repartition(2, "bibcode"))                      # v0
    t.merge(_recs(spark, [("B2", 22), ("D1", 4)]))               # v1
    t.merge(_recs(spark, [("E1", 5)]),
            deleted_keys=spark.createDataFrame(
                [("B1",)], "bibcode string"))                    # v2
    assert t.compact() == 3                                      # v3
    t.merge(_recs(spark, [("E1", 55), ("F1", 6)]))               # v4

    ckpt = str(tmp_path / "ckpt")
    rows = _drain(spark, path, ckpt)
    key = lambda r: (r["bibcode"], r["v"], r["_change_type"],
                     r["_commit_version"])
    want = sorted(key(r) for r in t.changes(-1, 4).collect())
    assert sorted(key(r) for r in rows) == want
    assert not [r for r in rows if r["_commit_version"] == 3]
    assert all(r["_commit_timestamp"] is not None for r in rows)

    # resume: new commits only
    t.merge(_recs(spark, [("B2", 222)]))                         # v5
    rows2 = _drain(spark, path, ckpt)
    assert sorted((r["bibcode"], r["_change_type"],
                   r["_commit_version"]) for r in rows2) == [
        ("B2", "update_postimage", 5), ("B2", "update_preimage", 5)]


def test_stream_cdf_starting_version_and_evolution(registered, tmp_path):
    """startingVersion skips the bootstrap (the documented pattern for
    big tables: batch-read the snapshot, stream from there); a
    widening merge surfaces the new column on the feed with None for
    pre-widening images."""
    spark = registered
    path = str(tmp_path / "t")
    t = txn_table(spark, path, schema_evolution=True)
    t.overwrite(_recs(spark, [("B1", 1), ("B2", 2)]))            # v0
    widened = spark.createDataFrame(
        [("B2", 22, "en"), ("B3", 3, "de")],
        "bibcode string, v long, lang string")
    t.merge(widened)                                             # v1

    rows = _drain(spark, path, str(tmp_path / "ckpt"),
                  startingVersion="0")
    feed = {(r["bibcode"], r["_change_type"]): (r["v"], r["lang"])
            for r in rows}
    assert feed == {
        ("B2", "update_preimage"): (2, None),
        ("B2", "update_postimage"): (22, "en"),
        ("B3", "insert"): (3, "de"),
    }


def test_stream_cdf_refuses_partial_feed(registered, tmp_path):
    """Retention contract: a stream whose range lost a pre-image file
    to vacuum FAILS the batch (never silently serves a partial feed)."""
    from pyspark.errors.exceptions.captured import StreamingQueryException

    spark = registered
    path = str(tmp_path / "t")
    t = txn_table(spark, path)
    t.overwrite(_recs(spark, [("B1", 1)]))                       # v0
    t.merge(_recs(spark, [("B1", 2)]))                           # v1
    t.merge(_recs(spark, [("B1", 3)]))                           # v2
    t.vacuum(keep_versions=2, min_age_seconds=0)   # v0's file collected

    with pytest.raises(StreamingQueryException, match="vacuum"):
        q = (spark.readStream.format("txn_cdf").option("path", path)
             .load().writeStream
             .foreachBatch(lambda df, _e: df.collect())
             .option("checkpointLocation", str(tmp_path / "ckpt"))
             .trigger(availableNow=True).start())
        q.awaitTermination(180)

    # starting past the vacuumed window, the stream serves fine
    rows = _drain(spark, path, str(tmp_path / "ckpt2"),
                  startingVersion="1")
    assert sorted((r["bibcode"], r["v"], r["_change_type"])
                  for r in rows) == [
        ("B1", 2, "update_preimage"), ("B1", 3, "update_postimage")]
