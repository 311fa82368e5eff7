"""Bucketed-table support: shuffle-free co-located joins.

At 100 TB the recurring fact-to-fact join (orders ⋈ lineitem on
orderkey; records ⋈ changelog on bibcode) should not re-shuffle both
sides every run. Writing both tables bucketed by the join key with the
same bucket count makes every later equi-join on that key
partition-local: the scan emits bucket-aligned partitions and Catalyst
drops the Exchange on each pre-bucketed side.

``write_bucketed`` / ``read_bucketed`` wrap the session-catalog form
(``bucketBy`` requires ``saveAsTable``); on a cluster the same calls
target a shared metastore or a lake format with bucket transforms
(Iceberg ``bucket(n, col)`` partition transform). The plan contract —
no Exchange above a bucketed scan when bucket counts match — is
asserted in tests, not just claimed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, key: str,
                   num_buckets: int = 8, sort: bool = True) -> None:
    """Persist ``df`` as a parquet table bucketed (and optionally
    sorted) by ``key``. Sorting within buckets additionally removes the
    Sort above the scan in sort-merge joins."""
    w = df.write.format("parquet").mode("overwrite") \
        .bucketBy(num_buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  key: str, how: str = "inner") -> DataFrame:
    """Equi-join two same-bucket-count tables on their bucket key —
    with matching bucketing this plans with zero Exchange nodes."""
    return read_bucketed(spark, left_table).join(
        read_bucketed(spark, right_table), key, how)
