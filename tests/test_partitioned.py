"""Hive-partitioned layout contracts: directory-level partition
pruning shows up in the physical plan, and dynamic partition overwrite
really leaves untouched partitions' files alone."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from adsmasterpipeline_spark.sources.partitioned import (
    overwrite_partitions_dynamic, read_partition_pruned,
    write_partitioned,
)


def _events(spark, n=100):
    return (spark.range(n)
            .select(F.col("id").alias("event_id"),
                    (F.col("id") % 4).cast("string").alias("day"),
                    (F.col("id") * 10).alias("v")))


def _part_files(path, day):
    d = os.path.join(path, f"day={day}")
    return sorted(f for f in os.listdir(d) if f.endswith(".parquet"))


def test_partition_pruning_in_plan_and_values(spark, tmp_path):
    path = str(tmp_path / "ev")
    write_partitioned(_events(spark), path, "day")
    df = read_partition_pruned(spark, path, day="2")
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the day filter must be a planning-time PartitionFilters entry,
    # not a post-scan Filter over all partitions' rows
    assert "PartitionFilters" in plan
    pf = plan.split("PartitionFilters: [")[1].split("]")[0]
    assert "day" in pf and "2" in pf, pf
    rows = df.collect()
    # partition values are re-inferred from directory names (string
    # "2" -> int 2) — compare through str
    assert len(rows) == 25 and all(str(r["day"]) == "2" for r in rows)


def test_dynamic_overwrite_touches_only_present_partitions(spark,
                                                           tmp_path):
    path = str(tmp_path / "ev")
    write_partitioned(_events(spark), path, "day")
    before = {d: _part_files(path, d) for d in "0123"}
    mtimes_before = {
        d: [os.path.getmtime(os.path.join(path, f"day={d}", f))
            for f in before[d]] for d in "0123"}

    # new batch touches ONLY day=1 (and changes its content)
    batch = (spark.range(5)
             .select((F.col("id") + 1000).alias("event_id"),
                     F.lit("1").alias("day"),
                     F.lit(-1).cast("long").alias("v")))
    overwrite_partitions_dynamic(batch, path, "day")

    # untouched partitions: identical file lists and mtimes
    for d in "023":
        assert _part_files(path, d) == before[d]
        assert [os.path.getmtime(os.path.join(path, f"day={d}", f))
                for f in before[d]] == mtimes_before[d]
    # touched partition: fully replaced
    out = spark.read.parquet(path).where(F.col("day") == "1").collect()
    assert sorted(r["event_id"] for r in out) == [1000 + i
                                                  for i in range(5)]
    assert all(r["v"] == -1 for r in out)
    # the rest of the table is intact
    assert spark.read.parquet(path).count() == 75 + 5


def test_static_overwrite_mode_is_restored(spark, tmp_path):
    path = str(tmp_path / "ev2")
    key = "spark.sql.sources.partitionOverwriteMode"
    spark.conf.set(key, "static")
    overwrite_partitions_dynamic(_events(spark, 8), path, "day")
    assert spark.conf.get(key) == "static"


def test_schema_evolution_mergeschema_across_partitions(spark, tmp_path):
    """Later batches may carry new columns: with mergeSchema the union
    schema is read, old partitions' missing column surfaces as NULL,
    and partition pruning still works on the evolved table."""
    path = str(tmp_path / "ev3")
    write_partitioned(_events(spark), path, "day")
    batch = (spark.range(3)
             .select((F.col("id") + 500).alias("event_id"),
                     F.lit("9").alias("day"),
                     F.col("id").alias("v"),
                     F.lit("en").alias("lang")))       # NEW column
    write_partitioned(batch, path, "day", mode="append")
    df = spark.read.option("mergeSchema", "true").parquet(path)
    assert "lang" in df.columns
    old = df.where(F.col("day") == "2")
    assert old.count() == 25
    assert old.where(F.col("lang").isNull()).count() == 25
    new = df.where(F.col("day") == "9")
    assert [r["lang"] for r in new.collect()] == ["en"] * 3
    plan = new._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan


def test_compact_partition_reduces_files_conserves_rows(spark, tmp_path):
    from adsmasterpipeline_spark.sources.partitioned import (
        compact_partition,
    )

    path = str(tmp_path / "ev4")
    # 16 small files in day=1 (one per input partition), 1 in day=0
    many = (spark.range(64).repartition(16)
            .select(F.col("id").alias("event_id"),
                    F.lit("1").alias("day"), F.col("id").alias("v")))
    one = (spark.range(5)
           .select((F.col("id") + 100).alias("event_id"),
                   F.lit("0").alias("day"), F.col("id").alias("v")))
    write_partitioned(many, path, "day")
    write_partitioned(one, path, "day", mode="append")
    assert len(_part_files(path, "1")) == 16
    other_before = _part_files(path, "0")

    before = sorted(r["event_id"] for r in
                    spark.read.parquet(path).collect())
    n = compact_partition(spark, path, "day", "1", target_files=2)
    assert n == 64
    assert len(_part_files(path, "1")) == 2
    assert _part_files(path, "0") == other_before
    after = sorted(r["event_id"] for r in
                   spark.read.parquet(path).collect())
    assert after == before
