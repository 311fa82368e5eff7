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


@pytest.mark.slow
def test_stream_cdf_parity_and_resume(registered, tmp_path):
    """Stream output == batch changes() across overwrite / merge /
    delete / compact / restore; a restart on the same checkpoint
    serves ONLY the versions committed since (exactly-once offsets)."""
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
    assert t.restore(2) == 5      # metadata-only rollback of v4

    ckpt = str(tmp_path / "ckpt")
    rows = _drain(spark, path, ckpt)
    key = lambda r: (r["bibcode"], r["v"], r["_change_type"],
                     r["_commit_version"])
    want = sorted(key(r) for r in t.changes(-1, 5).collect())
    assert sorted(key(r) for r in rows) == want
    assert not [r for r in rows if r["_commit_version"] == 3]
    # the restore commit streams as the row-level undo of v4
    assert sorted((r["bibcode"], r["_change_type"]) for r in rows
                  if r["_commit_version"] == 5) == [
        ("E1", "update_postimage"), ("E1", "update_preimage"),
        ("F1", "delete")]
    assert all(r["_commit_timestamp"] is not None for r in rows)

    # resume: new commits only — and the metadata-only constraint
    # commit (v6) streams NOTHING, like compact
    assert t.set_constraint("v_pos", "v > 0") == 6
    t.merge(_recs(spark, [("B2", 222)]))                         # v7
    rows2 = _drain(spark, path, ckpt)
    assert sorted((r["bibcode"], r["_change_type"],
                   r["_commit_version"]) for r in rows2) == [
        ("B2", "update_postimage", 7), ("B2", "update_preimage", 7)]


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


def test_stream_cdf_slices_large_commits(registered, tmp_path):
    """VERDICT r8 task 3: a commit whose add-row stats exceed
    maxRowsPerTask is hash-partitioned across the KEY space — a
    bootstrap-sized commit streams through >= 4 tasks, each holding
    only its slice (per-task row counts asserted), and the union over
    slices equals the batch changes() feed exactly."""
    from adsmasterpipeline_spark.streaming.cdf_source import (
        TxnChangeFeedStreamReader,
    )

    spark = registered
    path = str(tmp_path / "t")
    t = txn_table(spark, path, rows_per_file=1000)
    t.overwrite(_recs(spark, [(f"B{i:04d}", i) for i in range(200)]))  # v0
    t.merge(_recs(spark, [(f"B{i:04d}", i + 1000) for i in range(40)]
                  + [(f"N{i}", i) for i in range(40)]))                # v1

    # driver-side planning: 200-row bootstrap / 50-row budget -> 4
    # slices; the 80-add-row merge -> 2 slices
    r = TxnChangeFeedStreamReader(path, "bibcode", -1, ["bibcode", "v"],
                                  max_rows_per_task=50)
    parts = r.partitions({"version": -1}, {"version": 1})
    by_commit: dict[int, list] = {}
    for p in parts:
        by_commit.setdefault(p.version, []).append(p)
    assert len(by_commit[0]) == 4 and len(by_commit[1]) == 2
    assert all(p.n_slices == 4 for p in by_commit[0])

    # executor-side: every slice task emits a proper nonempty subset,
    # and the slices reassemble the full feed bit-for-bit
    key = lambda row: (row[0], row[1], row[2], row[3])  # bib, v, type, ver
    got = []
    for p in parts:
        rows = list(r.read(p))
        assert 0 < len(rows) < 200, \
            f"slice {p.slice_idx}/{p.n_slices} of v{p.version} " \
            f"held {len(rows)} rows — not a bounded slice"
        got.extend(rows)
    want = sorted((row["bibcode"], row["v"], row["_change_type"],
                   row["_commit_version"])
                  for row in t.changes(-1, 1).collect())
    assert sorted(key(row) for row in got) == want

    # end-to-end through the engine with the option set: same parity
    rows = _drain(spark, path, str(tmp_path / "ckpt"),
                  maxRowsPerTask="50")
    assert sorted((row["bibcode"], row["v"], row["_change_type"],
                   row["_commit_version"]) for row in rows) == want


def test_stream_cdf_slices_delete_heavy_and_restore(registered, tmp_path):
    """VERDICT r9 #1: slicing is sized from max(add rows, remove rows).
    A merge that deletes 90% of a multi-file table writes few add rows
    (the survivors) but its tasks must stream every removed file's
    pre-image — adds-only sizing planned ONE unbounded task for that
    shape. Same for a restore that drops most files. Both must now
    plan > 1 slice, keep per-task rows under budget, and the slice
    union must equal the batch changes() feed bit-for-bit."""
    from adsmasterpipeline_spark.streaming.cdf_source import (
        TxnChangeFeedStreamReader,
    )

    spark = registered
    path = str(tmp_path / "t")
    # cluster_writes + small rows_per_file -> a genuinely multi-file
    # bootstrap (4 files x 50 rows) whose removal dominates the adds
    t = txn_table(spark, path, rows_per_file=50, cluster_writes=True)
    t.overwrite(_recs(spark, [(f"B{i:04d}", i) for i in range(200)]))  # v0
    t.merge(_recs(spark, [("Z1", 1)]),
            deleted_keys=spark.createDataFrame(
                [(f"B{i:04d}",) for i in range(180)],
                "bibcode string"))                                     # v1
    assert t.restore(0) == 2       # drops v1's files, resurrects v0's

    r = TxnChangeFeedStreamReader(path, "bibcode", -1, ["bibcode", "v"],
                                  max_rows_per_task=60)
    by_commit: dict[int, list] = {}
    for p in r.partitions({"version": -1}, {"version": 2}):
        by_commit.setdefault(p.version, []).append(p)
    # v1: adds ~21 rows (20 survivors + Z1) but removes 200 pre-image
    # rows -> ceil(200/60) = 4 slices, not the adds-only 1
    assert len(by_commit[1]) == 4, \
        f"delete-heavy merge under-sliced: {len(by_commit[1])} tasks"
    # v2 (restore): adds back the 4 bootstrap files (200 rows), removes
    # the small survivor set -> sliced from the add side as before
    assert len(by_commit[2]) == 4

    for v in (1, 2):
        for p in by_commit[v]:
            # each task's emitted rows are a bounded subset; the hard
            # bound is on held pre/post rows ~ budget; emitted deletes
            # for v1 total 180 across 4 slices
            n_pre = len(list(r.read(p)))
            assert n_pre < 180, \
                f"v{v} slice {p.slice_idx}/{p.n_slices}: {n_pre} rows"
        got = sorted(
            (row[0], row[1], row[2], row[3])
            for p in by_commit[v] for row in r.read(p))
        want = sorted(
            (row["bibcode"], row["v"], row["_change_type"],
             row["_commit_version"])
            for row in t.changes(v - 1, v).collect())
        assert got == want, f"v{v} slice union != batch changes()"

    # legacy entries without remove_stats keep the adds-only fallback
    import json
    entry = os.path.join(path, "_txn", f"{1:08d}.json")
    with open(entry) as f:
        e = json.load(f)
    assert e.pop("remove_stats", None) is not None
    os.unlink(entry)
    with open(entry, "w") as f:
        json.dump(e, f)
    parts_legacy = [p for p in r.partitions({"version": -1},
                                            {"version": 2})
                    if p.version == 1]
    assert len(parts_legacy) == 1      # adds-only estimate: 21 rows


def test_stream_cdf_struct_nan_and_map_order_parity(registered, tmp_path):
    """ADVICE r8: survivor equality must recurse into nested values on
    BOTH feed forms — a NaN inside a struct field and a map rewritten
    with the same content in a different key order are NOT changes.
    The batch diff compares maps via sorted map_entries (raw to_json
    was insertion-order-sensitive); the stream's _eq recurses dicts,
    tuples and lists with NaN == NaN throughout."""
    spark = registered
    path = str(tmp_path / "t")
    nan = float("nan")
    schema = ("bibcode string, s struct<x: double, y: long>, "
              "m map<string, long>")
    t = txn_table(spark, path, rows_per_file=1000)
    t.overwrite(spark.createDataFrame(
        [("B1", (nan, 1), {"a": 1, "b": 2}),
         ("B2", (2.5, 2), {"a": 9}),
         ("C1", (nan, 3), {"z": 7})], schema))                     # v0
    # v1 rewrites the file: B1 carries IDENTICAL content (NaN struct
    # field; map content equal but keys in reversed insertion order),
    # B2 genuinely changes, C1 is a survivor copied by the rewrite
    t.merge(spark.createDataFrame(
        [("B1", (nan, 1), {"b": 2, "a": 1}),
         ("B2", (9.9, 2), {"a": 9})], schema))                     # v1

    want = [("B2", "update_postimage"), ("B2", "update_preimage")]
    batch = sorted((r["bibcode"], r["_change_type"])
                   for r in t.changes(0, 1).collect())
    assert batch == want, f"batch feed saw phantom changes: {batch}"

    rows = _drain(spark, path, str(tmp_path / "ckpt"),
                  startingVersion="0")
    stream = sorted((r["bibcode"], r["_change_type"]) for r in rows)
    assert stream == want, f"stream feed saw phantom changes: {stream}"
    post = [r for r in rows if r["_change_type"] == "update_postimage"]
    assert post[0]["s"]["x"] == 9.9 and post[0]["m"] == {"a": 9}


@pytest.mark.slow
def test_stream_cdf_max_commits_per_trigger(registered, tmp_path):
    """maxCommitsPerTrigger (Delta's maxFilesPerTrigger analogue): a
    stream running behind its writer drains as BOUNDED micro-batches —
    after the first batch of the run, each advances at most N commits
    and the offset never regresses — while the union over batches
    still equals the batch changes() feed exactly-once. (The FIRST
    batch per run is uncapped by design: the Python DataSource API
    calls latestOffset before revealing any start position, and
    capping blind could regress a checkpoint-recovered offset.)"""
    from adsmasterpipeline_spark.streaming.cdf_source import (
        TxnChangeFeedStreamReader,
    )

    spark = registered
    path = str(tmp_path / "t")
    t = txn_table(spark, path, rows_per_file=1000)
    t.overwrite(_recs(spark, [("B1", 1)]))                       # v0

    # driver-side planning, in the engine's OBSERVED call order
    # (latestOffset first, with no position): batch 1 uncapped, every
    # later trigger advances <= 2 commits, never backwards
    for i in range(6):                                           # v1..v6
        t.merge(_recs(spark, [(f"K{i}", i), ("B1", 10 + i)]))
    r = TxnChangeFeedStreamReader(path, "bibcode", -1,
                                  ["bibcode", "v"],
                                  max_commits_per_trigger=2)
    first = r.latestOffset()           # engine probes before any start
    assert first == {"version": 6}     # uncapped: no position known yet
    pos = r.initialOffset()
    r.partitions(pos, first)
    for i in range(6, 12):                                       # v7..v12
        t.merge(_recs(spark, [(f"K{i}", i)]))
    ends, pos = [], first
    while True:
        end = r.latestOffset()
        if end == pos:
            break
        assert end["version"] > pos["version"]     # never regresses
        r.partitions(pos, end)
        ends.append(end["version"])
        pos = end
    assert ends == [8, 10, 12]         # capped catch-up, 2 at a time

    # engine end-to-end: a burst committed from INSIDE the first
    # batch's sink (deterministically mid-run) must drain through
    # follow-up batches of <= 2 commits each, reassembling the full
    # feed exactly-once
    path2 = str(tmp_path / "t2")
    t2 = txn_table(spark, path2, rows_per_file=1000)
    t2.overwrite(_recs(spark, [("B1", 1)]))                      # v0
    batches: dict[int, list] = {}

    def sink(df, eid):
        batches[eid] = df.collect()
        if eid == 0:
            for i in range(6):                                   # v1..v6
                t2.merge(_recs(spark, [(f"K{i}", i)]))

    q = (spark.readStream.format("txn_cdf").option("path", path2)
         .option("maxCommitsPerTrigger", "2").load()
         .writeStream.foreachBatch(sink)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .start())
    q.processAllAvailable()
    q.stop()
    key = lambda row: (row["bibcode"], row["v"], row["_change_type"],
                       row["_commit_version"])
    got = sorted(key(row) for b in batches.values() for row in b)
    assert got == sorted(key(row) for row in t2.changes(-1, 6).collect())
    follow_up = [b for eid, b in batches.items() if eid > 0 and b]
    assert len(follow_up) >= 3         # 6 commits through a 2-commit cap
    for b in follow_up:
        assert len({row["_commit_version"] for row in b}) <= 2


@pytest.mark.slow
def test_stream_cdf_bounded_first_batch(registered, tmp_path):
    """VERDICT r9 task 4 (boundedFirstBatch): a FRESH query over a
    10-commit backlog with maxCommitsPerTrigger=2 drains in
    ceil(10/2)=5 bounded micro-batches from the very first trigger
    (without the option, batch 0 swallows the whole backlog), with
    exactly-once parity against the batch feed; a restart on the same
    checkpoint never regresses the recovered position — it serves
    ONLY the commits landed since, still capped."""
    spark = registered
    path = str(tmp_path / "t")
    t = txn_table(spark, path, rows_per_file=1000)
    for i in range(10):                                          # v0..v9
        t.merge(_recs(spark, [(f"K{i}", i)]))

    batches: dict[int, list] = {}
    ckpt = str(tmp_path / "ckpt")

    def run():
        # default trigger + processAllAvailable, NOT availableNow: the
        # Python DataSource API has no ReadLimit hook, so availableNow
        # snapshots the (capped) first latestOffset as "all available"
        # and would stop after one bounded batch by design
        batches.clear()
        q = (spark.readStream.format("txn_cdf").option("path", path)
             .option("maxCommitsPerTrigger", "2")
             .option("boundedFirstBatch", "true").load()
             .writeStream
             .foreachBatch(lambda df, eid: batches.__setitem__(
                 eid, df.collect()))
             .option("checkpointLocation", ckpt)
             .start())
        q.processAllAvailable()
        q.stop()

    run()
    nonempty = {eid: b for eid, b in batches.items() if b}
    assert len(nonempty) == 5, \
        f"10-commit backlog through cap 2: want 5 batches, " \
        f"got {sorted((e, len(b)) for e, b in nonempty.items())}"
    for b in nonempty.values():
        assert len({row["_commit_version"] for row in b}) <= 2
    key = lambda row: (row["bibcode"], row["v"], row["_change_type"],
                       row["_commit_version"])
    got = sorted(key(row) for b in batches.values() for row in b)
    assert got == sorted(key(row) for row in t.changes(-1, 9).collect())

    # restart: recovered position is never regressed — only v10..v13
    # are served (each exactly once), in capped batches
    for i in range(10, 14):                                      # v10..v13
        t.merge(_recs(spark, [(f"K{i}", i)]))
    run()
    got2 = sorted(key(row) for b in batches.values() for row in b)
    assert got2 == sorted(key(row) for row in t.changes(9, 13).collect())
    versions = {row["_commit_version"] for b in batches.values()
                for row in b}
    assert versions == {10, 11, 12, 13}
    for b in batches.values():
        assert len({row["_commit_version"] for row in b}) <= 2


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


@pytest.mark.slow
def test_stream_cdf_deletion_vector_parity(registered, tmp_path):
    """Deletion-vector commits on the stream: a DV delete (zero data
    files rewritten) feeds exactly the masked rows as deletes; a
    second overlapping delete re-reports nothing; a full-file death
    excludes the already-masked positions from its remove pre-image;
    a restore that detaches a vector feeds re-inserts. The slice
    union at a small maxRowsPerTask equals batch changes()
    bit-for-bit, and dv_stats sizes the slicing."""
    from adsmasterpipeline_spark.streaming.cdf_source import (
        TxnChangeFeedStreamReader,
    )

    spark = registered
    path = str(tmp_path / "t")
    t = txn_table(spark, path, key="id", rows_per_file=25,
                  cluster_writes=True)
    from pyspark.sql import functions as F
    t.overwrite(spark.range(100).select(
        F.col("id"), (F.col("id") * 2).alias("v")))              # v0
    t.delete(keys=spark.createDataFrame(
        [(int(i),) for i in range(0, 20)], "id long"))           # v1
    t.delete(where="id < 30")                                    # v2: 10 new
    t.delete(where="id < 25")                                    # v3: no-op
    assert t.version() == 2        # nothing matched: no commit
    t.merge(spark.createDataFrame([(0, 999)], "id long, v long"))  # v3
    assert t.restore(2) == 4       # undo the merge (re-mask id 0)

    r = TxnChangeFeedStreamReader(path, "id", -1, ["id", "v"],
                                  max_rows_per_task=6)
    by_commit: dict[int, list] = {}
    for p in r.partitions({"version": -1}, {"version": 4}):
        by_commit.setdefault(p.version, []).append(p)
    # v1 masks 20 positions -> dv_stats sizes ceil(20/6) = 4 slices
    assert len(by_commit[1]) == 4
    for v in (1, 2, 3, 4):
        got = sorted(
            (row[0], row[1], row[2], row[3])
            for p in by_commit[v] for row in r.read(p))
        want = sorted(
            (row["id"], row["v"], row["_change_type"],
             row["_commit_version"])
            for row in t.changes(v - 1, v).collect())
        assert got == want, f"v{v} slice union != batch changes()"
    v1_types = {row[2] for p in by_commit[1] for row in r.read(p)}
    assert v1_types == {"delete"}
    v2_ids = sorted(row[0] for p in by_commit[2] for row in r.read(p))
    assert v2_ids == list(range(20, 30))    # exactly-once, no overlap

    # end-to-end engine drain matches batch across the whole range
    rows = _drain(spark, path, str(tmp_path / "ckpt"), key="id")
    key = lambda r_: (r_["id"], r_["v"], r_["_change_type"],
                      r_["_commit_version"])
    assert sorted(key(x) for x in rows) == sorted(
        key(x) for x in t.changes(-1, 4).collect())

    # a vacuumed DV dir refuses the feed instead of serving it partial
    import shutil as _sh
    dv_dir = next(iter({d["dir"] for d in t._snapshot().dvs.values()}))
    _sh.rmtree(os.path.join(path, dv_dir))
    with pytest.raises(Exception, match="deletion-vector|vacuum"):
        for p in r.partitions({"version": -1}, {"version": 4}):
            list(r.read(p))
