"""Hive-partitioned parquet layout: directory-level partition pruning
and dynamic partition overwrite.

At 100 TB the events/records lake is laid out by a coarse partition
column (ingest day, source) so that

- an incremental query touching one day scans ONE directory, not the
  table: the filter becomes a ``PartitionFilters`` entry on the scan
  (pruned at planning time from directory names — zero data I/O for
  excluded partitions), and
- an incremental publish rewrites ONLY the partitions present in the
  new batch: ``partitionOverwriteMode=dynamic`` replaces touched
  day-directories atomically and leaves every other partition's files
  untouched — the pattern behind the reference's nightly incremental
  runs (full-table rewrite per batch is the classic lake anti-pattern
  at scale).

Reference analogue: the ``updated >= since`` incremental scan
(`run.py:148-160`) — partition pruning is what makes that scan O(batch)
instead of O(table). Both contracts are asserted on real plans/files in
tests/test_partitioned.py, not just claimed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(df: DataFrame, path: str, *cols: str,
                      mode: str = "overwrite") -> None:
    """Write ``df`` as parquet partitioned by ``cols`` (Hive layout:
    one ``col=value/`` directory level per partition column)."""
    df.write.partitionBy(*cols).mode(mode).parquet(path)


def overwrite_partitions_dynamic(df: DataFrame, path: str,
                                 *cols: str) -> None:
    """Overwrite ONLY the partitions present in ``df``.

    Uses ``partitionOverwriteMode=dynamic`` scoped to this write (set
    via the session conf around the call, restored after): partitions
    absent from ``df`` keep their existing files byte-for-byte; the
    touched ones are replaced wholesale. This is the idempotent
    re-publish primitive for incremental batches — replaying a batch
    rewrites the same directories to the same content.
    """
    spark = df.sparkSession
    key = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(key, "static")
    spark.conf.set(key, "dynamic")
    try:
        df.write.partitionBy(*cols).mode("overwrite").parquet(path)
    finally:
        spark.conf.set(key, prev)


def read_partition_pruned(spark: SparkSession, path: str,
                          **eq_filters) -> DataFrame:
    """Read a partitioned table with equality filters on partition
    columns. Stated declaratively — Catalyst turns each filter into a
    ``PartitionFilters`` entry so excluded directories are never
    listed into the scan."""
    df = spark.read.parquet(path)
    for col, val in eq_filters.items():
        df = df.where(df[col] == val)
    return df


def compact_partition(spark: SparkSession, path: str, part_col: str,
                      part_val, target_files: int = 1) -> int:
    """Rewrite ONE partition's many small files into ``target_files``
    — the small-files maintenance primitive (streaming/incremental
    ingest leaves a file per micro-batch; scans pay per-file open
    cost and the driver pays per-file listing).

    Reads only the target partition (partition-pruned scan), coalesces
    — a narrow, shuffle-free fan-in — and republishes through a
    dynamic-partition overwrite so every other partition's files stay
    byte-untouched. Returns the row count republished, so callers can
    assert conservation. At cluster scale this is the same loop a
    table service (OPTIMIZE / rewrite_data_files) runs per partition.
    """
    part = read_partition_pruned(spark, path, **{part_col: part_val})
    # drop the partition column before write; partitionBy re-adds the
    # directory level from the literal
    rows = part.coalesce(target_files) \
        .withColumn(part_col, part[part_col].cast("string"))
    n = rows.count()
    overwrite_partitions_dynamic(rows, path, part_col)
    return n
