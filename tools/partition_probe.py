"""Partitioned-table probe: price dynamic partition overwrite
(TxnTable overwrite(replace_where=...), Delta's replaceWhere) against
the full-snapshot overwrite a user without partitions must run, and
record the read-side partition-prune ratio.

The claims being priced (SCALE.md round 11): on a table hive-
partitioned by a shard column, re-ingesting ONE shard writes and
removes O(that partition) — never O(table) — and a partition-
predicate read opens only that partition's files (exact point-stat
pruning, not min/max overlap). At 100 TB these are the re-ingest and
slice-read primitives: replacing one day of a 365-day corpus costs
1/365th of the table, byte-for-byte.

Output: one JSON object with bytes written / files removed / wall
seconds for replace-one-partition vs overwrite-the-world, the
candidate/live file ratio of a partition-predicate read_where, and
the read-parity check (the replaced table must equal the recomputed
full state exactly).

Usage: python tools/partition_probe.py [--json OUT.json] [--rows N]
         [--parts K]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")


def _tree_bytes(path: str) -> dict[str, int]:
    out = {}
    for root, _d, files in os.walk(os.path.join(path, "data")):
        for n in files:
            full = os.path.join(root, n)
            out[os.path.relpath(full, path)] = os.path.getsize(full)
    return out


def main() -> int:
    from pyspark.sql import functions as F

    from adsmasterpipeline_spark.session import get_spark
    from adsmasterpipeline_spark.sinks.txnlake import txn_table

    argv = sys.argv[1:]
    json_out = None
    rows, parts = 400_000, 16
    while argv:
        if argv[0] == "--json":
            json_out = argv[1]; argv = argv[2:]
        elif argv[0] == "--rows":
            rows = int(argv[1]); argv = argv[2:]
        elif argv[0] == "--parts":
            parts = int(argv[1]); argv = argv[2:]
        else:
            raise SystemExit(f"unknown arg {argv[0]}")

    spark = get_spark("partition_probe")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="partprobe_")
    out: dict = {"rows": rows, "parts": parts}
    try:
        # wide rows (records-table shape) so the byte asymmetry is
        # honest; `day` is the shard column a training-data pipeline
        # re-ingests by
        base = spark.range(rows).select(
            F.col("id"),
            (F.col("id") % parts).cast("int").alias("day"),
            F.sha2(F.col("id").cast("string"), 256).alias("payload1"),
            F.repeat(F.sha2(F.col("id").cast("string"), 512), 4)
             .alias("payload2"))
        newday = (base.where(F.col("day") == 3)
                  .withColumn("payload1", F.lit("reingested")))

        entry: dict = {}
        for mode in ("replace_where", "full_overwrite"):
            path = os.path.join(work, mode)
            t = txn_table(spark, path, key="id", cluster_writes=True,
                          rows_per_file=25_000, partition_by=("day",))
            t.overwrite(base)
            live0 = len(t.live_files())
            before = _tree_bytes(path)
            t0 = time.time()
            if mode == "replace_where":
                t.overwrite(newday, replace_where="day = 3")
            else:
                # the partitionless user's only correct move: rebuild
                # the whole snapshot with the shard swapped in
                t.overwrite(base.where(F.col("day") != 3)
                            .unionByName(newday))
            secs = time.time() - t0
            after = _tree_bytes(path)
            e = t._load_json(dict(t._entry_files())[1])
            entry[mode] = {
                "bytes_written": sum(sz for p, sz in after.items()
                                     if p not in before),
                "files_removed": len(e["removes"]),
                "live_files_before": live0,
                "secs": round(secs, 3),
                "live_rows": t.read().count(),
            }
            # read-parity: the end state must be exactly the
            # recomputed full state
            expect_updated = rows // parts + (1 if 3 < rows % parts
                                              else 0)
            got = t.read_where("day = 3")
            assert got.where(
                F.col("payload1") == "reingested").count() \
                == got.count() == expect_updated, mode
            if mode == "replace_where":
                probe = t.last_read_probe
                entry["read_prune"] = {
                    "candidate_files":
                        len(probe["candidate_files"]),
                    "live_files": probe["live_files"],
                    "candidate_over_live": round(
                        len(probe["candidate_files"])
                        / probe["live_files"], 4),
                }
        assert (entry["replace_where"]["live_rows"]
                == entry["full_overwrite"]["live_rows"] == rows)
        entry["bytes_ratio_full_over_replace"] = round(
            entry["full_overwrite"]["bytes_written"]
            / max(1, entry["replace_where"]["bytes_written"]), 1)
        entry["removes_ratio_full_over_replace"] = round(
            entry["full_overwrite"]["files_removed"]
            / max(1, entry["replace_where"]["files_removed"]), 1)
        out.update(entry)
        print(json.dumps({k: entry[k] for k in
                          ("bytes_ratio_full_over_replace",
                           "removes_ratio_full_over_replace",
                           "read_prune")}))
    finally:
        shutil.rmtree(work, ignore_errors=True)
    if json_out:
        with open(json_out, "w") as f:
            json.dump(out, f, indent=1, sort_keys=True)
        print(f"wrote {json_out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
