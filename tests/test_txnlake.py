"""TxnTable: the REAL executed MERGE path — file-granular
copy-on-write, tombstones, idempotent replay, time travel, and
commit atomicity. These tests run actual merges against actual
committed files (no stubbed table object anywhere), closing the
round-3/4 gap where MERGE semantics only ever ran against a stub.

Reference analogue: the per-row transactional upsert at
/root/reference/adsmp/app.py:45-77, recast set-at-a-time.
"""

from __future__ import annotations

import datetime as dt
import hashlib
import json as _json
import os

import pytest
from pyspark.sql import functions as F

from adsmasterpipeline_spark.sinks.txnlake import txn_table


def _recs(spark, rows):
    return spark.createDataFrame(rows, "bibcode string, v long")


def _file_hashes(path):
    out = {}
    for root, _dirs, files in os.walk(os.path.join(path, "data")):
        for name in files:
            if name.endswith(".parquet"):
                p = os.path.join(root, name)
                out[os.path.relpath(p, path)] = hashlib.sha256(
                    open(p, "rb").read()).hexdigest()
    return out


def test_txn_merge_matches_full_rewrite(spark, tmp_path):
    """Incremental MERGE result == recomputing the whole table:
    upserts land, survivors persist, tombstones delete — through the
    same merge_updates-shaped inputs the lake sink interface takes."""
    from adsmasterpipeline_spark.schemas import EVENT_SCHEMA
    from adsmasterpipeline_spark.sinks.lake import merge_records, write_records
    from adsmasterpipeline_spark.storage import empty_records, merge_updates

    now = F.lit(dt.datetime(2024, 1, 10)).cast("timestamp")
    ev1 = spark.createDataFrame([
        ("B1", "bib_data", "active", _json.dumps({"bibcode": "B1"}),
         dt.datetime(2024, 1, 1)),
        ("B2", "bib_data", "active", _json.dumps({"bibcode": "B2"}),
         dt.datetime(2024, 1, 1)),
    ], EVENT_SCHEMA)
    recs1, _ = merge_updates(empty_records(spark), ev1, now=now)
    path = str(tmp_path / "records")
    write_records(recs1.localCheckpoint(), path, fmt="txn")

    t = txn_table(spark, path)
    ev2 = spark.createDataFrame([
        ("B2", "metrics", "active", _json.dumps({"citations": ["x"]}),
         dt.datetime(2024, 1, 2)),
        ("B3", "bib_data", "active", _json.dumps({"bibcode": "B3"}),
         dt.datetime(2024, 1, 2)),
        ("B1", "bib_data", "deleted", None, dt.datetime(2024, 1, 2)),
    ], EVENT_SCHEMA)
    stored = t.read()
    recs2, _ = merge_updates(stored, ev2, now=now)
    recs2 = recs2.localCheckpoint()
    touched = recs2.join(ev2.select("bibcode").distinct(), "bibcode",
                         "left_semi").localCheckpoint()
    deleted = ev2.where("status = 'deleted'").select("bibcode").distinct()
    merge_records(spark, touched, deleted, path, fmt="txn")

    got = sorted(tuple(r) for r in t.read().collect())
    want = sorted(tuple(r) for r in recs2.collect())
    assert got == want
    assert {r[0] for r in got} == {"B2", "B3"}


def test_txn_merge_rewrites_only_touched_files(spark, tmp_path):
    """The 100-TB property: a merge touching one key rewrites ONLY the
    file(s) containing it — every other data file stays byte-identical
    AND stays referenced (re-listed, not re-written)."""
    path = str(tmp_path / "t")
    t = txn_table(spark, path, key="bibcode")
    # two partitions by key -> B-keys and C-keys land in separate files
    base = _recs(spark, [("B1", 1), ("B2", 2), ("C1", 3), ("C2", 4)])
    t.overwrite(base.repartition(2, "bibcode"))
    before = _file_hashes(path)
    live0 = set(t.live_files())
    assert len(live0) >= 2, "need >=2 data files for the property"

    t.merge(_recs(spark, [("B1", 99), ("D1", 5)]))
    after = _file_hashes(path)
    live1 = set(t.live_files())

    # every surviving original file is byte-identical
    for f in live0 & live1:
        assert before[f] == after[f]
    # at least one original file survived (the one without B1), and
    # at least one was replaced (the one with B1)
    assert live0 & live1, "untouched file must stay referenced"
    assert live0 - live1, "touched file must be de-referenced"
    rows = {r["bibcode"]: r["v"] for r in t.read().collect()}
    assert rows == {"B1": 99, "B2": 2, "C1": 3, "C2": 4, "D1": 5}


def test_txn_tombstones_and_replay_order(spark, tmp_path):
    """whenMatchedDelete semantics: deleted keys disappear; a LATER
    upsert of a deleted key re-inserts it (delete-then-newer-update
    replay, the storage.py M3 scenario at the sink layer)."""
    path = str(tmp_path / "t")
    t = txn_table(spark, path)
    t.overwrite(_recs(spark, [("B1", 1), ("B2", 2)]))
    # delete B1; also exercise changed+deleted same batch: the delete
    # wins over the update in one merge (upserts exclude deleted keys)
    t.merge(_recs(spark, [("B1", 7)]),
            deleted_keys=spark.createDataFrame([("B1",), ("B1",)],
                                               "bibcode string"))
    assert {r["bibcode"] for r in t.read().collect()} == {"B2"}
    # newer update re-inserts
    t.merge(_recs(spark, [("B1", 9)]))
    rows = {r["bibcode"]: r["v"] for r in t.read().collect()}
    assert rows == {"B1": 9, "B2": 2}


def test_txn_idempotent_app_txn(spark, tmp_path):
    """Replaying a merge with the same app_txn_id is a no-op: same
    version, identical live-file set, zero bytes changed — the
    sink-failure replay contract (Delta's txn action)."""
    path = str(tmp_path / "t")
    t = txn_table(spark, path)
    t.overwrite(_recs(spark, [("B1", 1)]))
    v1 = t.merge(_recs(spark, [("B2", 2)]), app_txn_id="batch-42")
    live = t.live_files()
    hashes = _file_hashes(path)
    v2 = t.merge(_recs(spark, [("B2", 2)]), app_txn_id="batch-42")
    assert v2 == v1
    assert t.live_files() == live
    assert _file_hashes(path) == hashes
    assert t.read().count() == 2


def test_txn_time_travel_and_versions(spark, tmp_path):
    path = str(tmp_path / "t")
    t = txn_table(spark, path)
    assert t.version() == -1
    t.overwrite(_recs(spark, [("B1", 1)]))
    t.merge(_recs(spark, [("B1", 2), ("B2", 2)]))
    assert t.version() == 1
    assert {(r["bibcode"], r["v"]) for r in
            t.read(as_of=0).collect()} == {("B1", 1)}
    assert {(r["bibcode"], r["v"]) for r in
            t.read().collect()} == {("B1", 2), ("B2", 2)}


def test_txn_concurrent_commit_conflict(spark, tmp_path):
    """Two writers racing for one version: exactly one wins; the loser
    gets a retryable error and the table is NOT torn (winner's commit
    fully visible)."""
    path = str(tmp_path / "t")
    t = txn_table(spark, path)
    t.overwrite(_recs(spark, [("B1", 1)]))
    # simulate the race: another writer takes version 1 first
    winner = txn_table(spark, path)
    winner.merge(_recs(spark, [("B2", 2)]))
    with pytest.raises(RuntimeError, match="concurrent commit"):
        t._commit(1, ["data/x.parquet"], [], "merge", None)
    assert {r["bibcode"] for r in t.read().collect()} == {"B1", "B2"}
    # no stray temp files left behind
    assert not [n for n in os.listdir(os.path.join(path, "_txn"))
                if n.startswith(".tmp")]


def test_streaming_ingest_on_txn_table(spark, tmp_path):
    """Streaming ingestion publishing through the TxnTable: state
    equals the parquet-swap mode, versions advance per micro-batch,
    and a REPLAYED epoch (foreachBatch's at-least-once contract after
    a crash-restart) is a no-op — the epoch's app txn id is already
    in the log, so file set and bytes are unchanged. End-to-end
    exactly-once state without delta-spark."""
    import json

    from adsmasterpipeline_spark.streaming.ingest import StreamingIngest

    def run(fmt, sub):
        events_dir = tmp_path / sub / "events"
        events_dir.mkdir(parents=True)
        b1 = [{"bibcode": "S1", "type": "bib_data", "status": "active",
               "payload": json.dumps({"bibcode": "S1", "title": ["one"]}),
               "event_ts": "2024-01-01T00:00:00.000Z"},
              {"bibcode": "S2", "type": "bib_data", "status": "active",
               "payload": json.dumps({"bibcode": "S2"}),
               "event_ts": "2024-01-01T00:00:01.000Z"}]
        b2 = [{"bibcode": "S1", "type": "fulltext", "status": "active",
               "payload": json.dumps({"body": "B"}),
               "event_ts": "2024-01-02T00:00:00.000Z"}]
        ing = StreamingIngest(spark, str(events_dir),
                              str(tmp_path / sub / "records"),
                              str(tmp_path / sub / "ckpt"), fmt=fmt)
        (events_dir / "b1.json").write_text(
            "\n".join(json.dumps(e) for e in b1))
        ing.run_available_now()
        (events_dir / "b2.json").write_text(json.dumps(b2[0]))
        ing.run_available_now()
        return ing

    ing_t = run("txn", "t")
    ing_p = run("parquet", "p")

    t = ing_t._txn()
    assert t.version() == 1          # one commit per micro-batch
    drop = {"created", "updated", "processed"}  # wall-clock stamps
    cols = [c for c in ing_t._load_records().columns if c not in drop]

    def state(df):
        return sorted(tuple(r) for r in df.select(*cols).collect())

    assert state(ing_t._load_records()) == state(ing_p._load_records())

    # crash-replay: re-apply epoch 1's batch with the same epoch id —
    # the txn log already has ckpt#epoch-1, so nothing changes
    live_before = t.live_files()
    hashes_before = _file_hashes(str(tmp_path / "t" / "records"))
    from adsmasterpipeline_spark.schemas import EVENT_SCHEMA
    replay = spark.createDataFrame(
        [("S1", "fulltext", "active", '{"body": "B"}',
          dt.datetime(2024, 1, 2))], EVENT_SCHEMA)
    ing_t._apply_batch(replay, epoch_id=1)
    assert t.version() == 1
    assert t.live_files() == live_before
    assert _file_hashes(str(tmp_path / "t" / "records")) == hashes_before


def test_txn_merge_into_empty_table_and_crash_orphans(spark, tmp_path):
    """Bootstrap-by-merge (no prior commit: every row inserts) and
    crash recovery: an orphan data directory from a crashed attempt
    (files written, commit never published) neither blocks the retry
    nor leaks into reads. Also: a path WITH A SPACE round-trips
    through input_file_name()'s percent-encoding."""
    path = str(tmp_path / "t t")          # space exercises URI decode
    t = txn_table(spark, path)
    assert t.merge(_recs(spark, [("B1", 1)])) == 0   # insert-only boot
    assert {r["bibcode"] for r in t.read().collect()} == {"B1"}

    # fake a crashed attempt: data dir exists, no log entry for it
    orphan = os.path.join(path, "data", "commit-00000001-deadbeef")
    os.makedirs(orphan)
    _recs(spark, [("ZZ", 99)]).write.mode("overwrite").parquet(orphan)

    v = t.merge(_recs(spark, [("B1", 2), ("B2", 2)]))
    assert v == 1
    rows = {r["bibcode"]: r["v"] for r in t.read().collect()}
    assert rows == {"B1": 2, "B2": 2}     # orphan ZZ never surfaces
