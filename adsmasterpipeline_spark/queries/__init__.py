"""Query registry: every implemented operator from SURVEY.md §2 (plus
the training-data extensions) exposed as a named (spark_fn, oracle_sql)
pair over the driver's synthetic tables.

``spark_fn(spark, sf_dir) -> DataFrame`` builds the idiomatic Spark
plan; ``oracle`` is the equivalent SQL DuckDB runs on the same parquet
(views pre-registered). ``oracle=None`` marks genuinely
non-SQL-expressible operators (rows-only check).

Column names are aliased identically on both sides — the driver's
comparison sorts columns by name before hashing values.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QueryDef:
    name: str
    spark_fn: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


REGISTRY: dict[str, QueryDef] = {}


def query(name: str, oracle: Optional[str], *tags: str, doc: str = ""):
    """Decorator registering a query under ``name``."""
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = QueryDef(name=name, spark_fn=fn, oracle=oracle,
                                  tags=tuple(tags), doc=doc or (fn.__doc__ or ""))
        return fn
    return deco


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load()
    return {n: q.spark_fn for n, q in REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    _load()
    return {n: q.oracle for n, q in REGISTRY.items() if q.oracle is not None}


_LOADED = False


def _load() -> None:
    """Import all query modules exactly once (they self-register)."""
    global _LOADED
    if _LOADED:
        return
    from . import (  # noqa: F401
        analytics, corpus, relational, relational2, relational3,
        pipeline, text, tpch_more, vectors, scale_ops, temporal,
    )
    _LOADED = True
