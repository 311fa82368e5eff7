"""TxnTable: a minimal log-structured ACID parquet table with a REAL
executed MERGE — file-granular copy-on-write, atomic commits,
idempotent application transactions, and time travel.

Why this exists: the production upsert boundary wants ``MERGE INTO``
semantics (the reference's per-row transactional upsert,
/root/reference/adsmp/app.py:45-77, recast set-at-a-time), and the
``fmt="delta"`` branch in sinks/lake.py is the preferred deployment —
but delta-spark cannot be installed in this environment (no package
index reachable), so until round 4 the MERGE path had only ever run
against a stub. This module is a from-scratch implementation of the
subset of the PUBLIC Delta transaction-log protocol (Armbrust et al.,
"Delta Lake: High-Performance ACID Table Storage over Cloud Object
Stores", VLDB 2020) that the sink contract needs, so the merge path
EXECUTES for real in tests and in this container:

- **Log**: ``<path>/_txn/<version>.json`` entries list data files
  added/removed (paths relative to the table root) plus an optional
  application transaction id. The current snapshot is the ordered
  fold of the log: ``adds - removes``.
- **Atomic commit**: the entry is staged to a temp file and published
  with ``os.link`` (fails with EEXIST if the version was taken) — the
  optimistic-concurrency primitive; a crash before publish leaves
  only unreferenced temp/data files, never a torn table.
- **File-granular MERGE**: only data files that CONTAIN a matched or
  deleted key are rewritten (found by joining the source keys against
  a scan tagged with ``input_file_name()``); every other file is kept
  byte-identical and merely re-referenced — the property that makes
  MERGE O(touched files) instead of O(table) at 100 TB, and exactly
  what the full-snapshot-swap parquet path in sinks/lake.py cannot
  do.
- **Idempotence**: a merge carrying ``app_txn_id`` that already
  appears in the log is a no-op (Delta's ``txn`` action) — replaying
  a batch after a sink failure changes nothing, the same checksum-
  suppression contract the dispatch layer has.

Scale notes: the log fold and file lists live on the driver — bounded
by FILE COUNT (what Delta itself keeps driver-side after parsing the
log), never by row count. All row work (membership probe, rewrite,
survivor union) is DataFrame joins; deleted keys are never collected
into an IN-list.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_LOG_DIR = "_txn"


class TxnTable:
    """Handle to a log-structured parquet table rooted at ``path``."""

    def __init__(self, spark: SparkSession, path: str, key: str):
        self.spark = spark
        self.path = os.path.abspath(path)
        self.key = key

    # ------------------------------------------------------------ log
    def _log_dir(self) -> str:
        return os.path.join(self.path, _LOG_DIR)

    def _entries(self) -> list[dict]:
        d = self._log_dir()
        if not os.path.isdir(d):
            return []
        out = []
        for name in sorted(os.listdir(d)):
            if name.endswith(".json") and not name.startswith("."):
                with open(os.path.join(d, name)) as f:
                    out.append(json.load(f))
        return out

    def version(self) -> int:
        """Latest committed version, -1 for a nonexistent table."""
        es = self._entries()
        return es[-1]["version"] if es else -1

    def live_files(self, as_of: int | None = None) -> list[str]:
        """Fold the log into the current (or ``as_of``-version)
        file set, in add order (paths relative to the table root)."""
        live: dict[str, None] = {}
        for e in self._entries():
            if as_of is not None and e["version"] > as_of:
                break
            for f in e.get("removes", []):
                live.pop(f, None)
            for f in e.get("adds", []):
                live[f] = None
        return list(live)

    def seen_txn(self, app_txn_id: str) -> bool:
        return any(e.get("app_txn_id") == app_txn_id
                   for e in self._entries())

    def _commit(self, version: int, adds: list[str], removes: list[str],
                operation: str, app_txn_id: str | None) -> None:
        d = self._log_dir()
        os.makedirs(d, exist_ok=True)
        entry = {"version": version, "operation": operation,
                 "adds": adds, "removes": removes}
        if app_txn_id is not None:
            entry["app_txn_id"] = app_txn_id
        tmp = os.path.join(d, f".tmp-{uuid.uuid4().hex}.json")
        with open(tmp, "w") as f:
            json.dump(entry, f, indent=1, sort_keys=True)
            f.flush()
            os.fsync(f.fileno())
        final = os.path.join(d, f"{version:08d}.json")
        try:
            # link is atomic and EXCLUSIVE: two writers racing for the
            # same version -> exactly one wins, the loser must re-read
            # the log and retry (optimistic concurrency)
            os.link(tmp, final)
        except FileExistsError:
            raise RuntimeError(
                f"concurrent commit: version {version} already exists "
                f"at {final}; re-read the snapshot and retry")
        finally:
            os.unlink(tmp)

    # ----------------------------------------------------------- data
    def _write_data(self, df: DataFrame, version: int) -> list[str]:
        """Write ``df`` as new parquet files under a per-attempt dir;
        returns their table-relative paths. Files are invisible until
        the log entry referencing them commits — and the dir name
        carries an attempt id so a CRASHED earlier attempt's orphan
        directory (data written, commit never published) can never
        collide with the retry; orphans are unreferenced garbage, not
        corruption."""
        rel_dir = os.path.join(
            "data", f"commit-{version:08d}-{uuid.uuid4().hex[:8]}")
        out_dir = os.path.join(self.path, rel_dir)
        df.write.mode("error").parquet(out_dir)
        return [os.path.join(rel_dir, n)
                for n in sorted(os.listdir(out_dir))
                if n.endswith(".parquet")]

    def read(self, as_of: int | None = None) -> DataFrame:
        files = self.live_files(as_of)
        if not files:
            raise FileNotFoundError(
                f"TxnTable at {self.path} has no committed data")
        return self.spark.read.parquet(
            *[os.path.join(self.path, f) for f in files])

    # ------------------------------------------------------ operations
    def overwrite(self, df: DataFrame,
                  app_txn_id: str | None = None) -> int:
        """Full-snapshot write (version 0 bootstrap or replace)."""
        if app_txn_id is not None and self.seen_txn(app_txn_id):
            return self.version()
        v = self.version() + 1
        adds = self._write_data(df, v)
        self._commit(v, adds, self.live_files(), "overwrite",
                     app_txn_id)
        return v

    def merge(self, changed: DataFrame,
              deleted_keys: DataFrame | None = None,
              app_txn_id: str | None = None) -> int:
        """MERGE: upsert ``changed`` (full post-merge rows keyed by
        ``self.key``) and delete ``deleted_keys`` — the
        whenMatchedUpdate / whenNotMatchedInsert / whenMatchedDelete
        triple, executed file-granularly:

        1. probe which live files contain an affected key (semi-join
           against a scan tagged with input_file_name());
        2. rewrite ONLY those files' rows: survivors (rows whose key
           is neither changed nor deleted) + the changed rows
           (minus deletes); untouched files are re-referenced as-is;
        3. changed keys absent from the table insert via the same
           union (they appear in no file, so they survive the
           anti-join unconditionally);
        4. commit {adds: rewritten+inserted files, removes: touched
           files} as one atomic log entry.

        Returns the committed version (or the current one when
        ``app_txn_id`` was already applied — idempotent replay).
        """
        key = self.key
        if app_txn_id is not None and self.seen_txn(app_txn_id):
            return self.version()
        if deleted_keys is None:
            deleted_keys = changed.select(key).limit(0)
        deleted_keys = deleted_keys.select(key).distinct()

        live = self.live_files()
        affected = (changed.select(key)
                    .unionByName(deleted_keys).distinct())
        if live:
            abs_live = {f: os.path.join(self.path, f) for f in live}
            tagged = (self.spark.read.parquet(*abs_live.values())
                      .withColumn("_file", F.input_file_name()))
            # file list is bounded by file count (driver-side by
            # design — the same cardinality Delta's log fold holds on
            # the driver)
            touched_uris = [r["_file"] for r in
                            tagged.join(affected, key, "left_semi")
                            .select("_file").distinct().collect()]
        else:
            touched_uris = []          # first merge == pure insert

        def rel(uri: str) -> str:
            # input_file_name() returns a percent-encoded file URI
            # ("file:///p%20ath/..." or "file:/path/..."); normalize
            # back to the table-relative form the log stores
            from urllib.parse import unquote, urlparse
            p = unquote(urlparse(uri).path) if ":" in uri else uri
            return os.path.relpath(p, self.path)

        touched = sorted(rel(u) for u in touched_uris)
        upserts = changed.join(deleted_keys, key, "left_anti")
        if touched:
            survivors = (self.spark.read.parquet(
                *[os.path.join(self.path, f) for f in touched])
                .join(affected, key, "left_anti"))
            new_rows = survivors.unionByName(upserts)
        else:
            new_rows = upserts
        # rewrite is read-from-committed-files, write-to-new-dir: no
        # read-own-input hazard, so no checkpoint needed
        v = self.version() + 1
        adds = self._write_data(new_rows, v)
        self._commit(v, adds, touched, "merge", app_txn_id)
        return v


def txn_table(spark: SparkSession, path: str,
              key: str = "bibcode") -> TxnTable:
    return TxnTable(spark, path, key)
