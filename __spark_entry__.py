"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query on sf0.001 as a smoke check;
``queries()`` / ``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 (plus the training-data extensions) for the driver's
DuckDB differential check at sf0.01.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from adsmasterpipeline_spark.queries import all_oracles, all_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: TPC-H-Q1-shape pricing
    summary (scan-side filter + wide multi-aggregate groupBy)."""
    from adsmasterpipeline_spark.queries.relational import q1_pricing_summary
    return q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return all_queries()


def oracle_sql() -> dict[str, str]:
    return all_oracles()
