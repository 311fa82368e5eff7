"""Parquet table sources for the driver's synthetic star schema.

Reference analogue: the records-table scan with column projection and
keyset pagination (`run.py:147-151`, `adsmp/tasks.py:687-696`). In
Spark a plain ``spark.read.parquet`` + ``select``/``where`` gives
column pruning and predicate pushdown for free; pagination is
unnecessary — the scan is partitioned.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

# Canonical logical column types per table — the contract every query
# in the registry compiles against. The synthetic testdata has been
# regenerated with different PHYSICAL types between rounds (events.ts
# shipped as TIMESTAMP(NANOS), then timestamp[us]); coercing on read
# keeps a regeneration from breaking 100+ downstream plans. Columns
# already at the canonical type cost nothing (the cast is a no-op and
# Catalyst elides it).
CANONICAL_TYPES: dict[str, dict[str, str]] = {
    "region": {"r_regionkey": "int"},
    "nation": {"n_nationkey": "int", "n_regionkey": "int"},
    "customer": {"c_custkey": "bigint", "c_nationkey": "int",
                 "c_acctbal": "double"},
    "supplier": {"s_suppkey": "bigint", "s_nationkey": "int",
                 "s_acctbal": "double"},
    "part": {"p_partkey": "bigint", "p_size": "int",
             "p_retailprice": "double"},
    "orders": {"o_orderkey": "bigint", "o_custkey": "bigint",
               "o_totalprice": "double", "o_orderdate": "timestamp_ntz"},
    "lineitem": {"l_orderkey": "bigint", "l_partkey": "bigint",
                 "l_suppkey": "bigint", "l_linenumber": "int",
                 "l_quantity": "double", "l_extendedprice": "double",
                 "l_discount": "double", "l_tax": "double",
                 "l_shipdate": "timestamp_ntz"},
    "events": {"event_id": "bigint", "user_id": "bigint",
               "value": "double"},  # ts handled by _load_events
    "documents": {"doc_id": "bigint", "n_chars": "bigint"},
    "embeddings": {"vec_id": "bigint", "embedding": "array<float>",
                   "label": "int"},
}


def _coerce(df: DataFrame, name: str) -> DataFrame:
    from pyspark.sql import functions as F
    want = CANONICAL_TYPES.get(name, {})
    fixes = [c for c, t in want.items()
             if c in df.columns and df.schema[c].dataType.simpleString() != t]
    if not fixes:
        return df
    return df.withColumns(
        {c: F.col(c).cast(want[c]) for c in fixes})


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        return _coerce(_load_events(spark, sf_dir), name)
    raw = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    return _coerce(raw, name)


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dtype-adaptive ``ts`` load: the synthetic events table has shipped
    both as TIMESTAMP(NANOS) (which Spark's vectorized reader rejects —
    read as long via ``nanosAsLong`` and floor-truncate to micros, same
    semantics as DuckDB's TIMESTAMP_NS -> TIMESTAMP cast) and as plain
    ``timestamp[us]`` (read natively, cast NTZ -> session timestamp).
    Branching on the actual read schema keeps either generation of the
    data working."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    if isinstance(raw.schema["ts"].dataType, LongType):
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLES)}


def register_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Register each table as a temp view so SQL-form queries can run."""
    for n, df in load_tables(spark, sf_dir, *names).items():
        df.createOrReplaceTempView(n)


def bibcode_list(spark: SparkSession, path: str) -> DataFrame:
    """S4 — newline-delimited bibcode file source (run.py:1053-1060);
    blank lines dropped, used as the key side of semi/anti joins."""
    from pyspark.sql import functions as F
    return (spark.read.text(path)
            .select(F.trim("value").alias("bibcode"))
            .where(F.col("bibcode") != ""))
