"""Physical-plan inspection helpers (SURVEY.md §4).

The reference hand-rolls column pruning / predicate pushdown / batch
sizing; Catalyst gives them declaratively — but only if the plan is
written right. These helpers make plan properties ASSERTABLE so tests
pin them (a filter that silently stops pushing down is a perf
regression even when results stay correct):

- ``pushed_filters``   — filters that reached the parquet scan
- ``read_schema``      — columns actually read (pruning check)
- ``has_broadcast_join`` / ``join_strategies``
- ``codegen_stage_count`` — whole-stage-codegen coverage
- ``single_partition_exchanges`` — global-sort/window funnels
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def _formatted(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted")


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode)


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across the plan's file scans."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", _formatted(df)):
        # entries look like IsNotNull(a), EqualTo(a,42) — split on the
        # predicate boundary, not on every comma
        out.extend(p for p in re.findall(r"\w+\([^()]*\)", m.group(1)))
    return out


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema of every file scan (column-pruning check)."""
    return [m.group(1) for m in
            re.finditer(r"ReadSchema: (\S+)", _formatted(df))]


def join_strategies(df: DataFrame) -> list[str]:
    plan = _formatted(df)
    names = ("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
             "BroadcastNestedLoopJoin", "CartesianProduct")
    return [n for n in names for _ in re.findall(rf"\b{n}\b", plan)]


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in _formatted(df)


def codegen_stage_count(df: DataFrame) -> int:
    """Number of whole-stage-codegen subtrees (codegen explain mode —
    the formatted plan hides them under AQE)."""
    plan = explain_str(df, "codegen")
    m = re.search(r"Found (\d+) WholeStageCodegen subtrees", plan)
    return int(m.group(1)) if m else 0


def single_partition_exchanges(df: DataFrame) -> int:
    """Count SinglePartition exchanges — each is a global funnel
    (acceptable for final tiny aggregates; a smell mid-plan). The
    formatted plan carries the partitioning in the node detail line
    (``Arguments: SinglePartition, ...``)."""
    return len(re.findall(r"Arguments: SinglePartition", _formatted(df)))


def takeordered_count(df: DataFrame) -> int:
    """Count TakeOrderedAndProject nodes — the distributed-TopK
    operator orderBy+limit compiles to (per-partition heaps of k, then
    a k-row merge; NOT a single-partition global sort). TopK queries
    assert >= 1 of these and zero corpus-sized SinglePartition
    exchanges."""
    return len(re.findall(r"\(\d+\) TakeOrderedAndProject",
                          _formatted(df)))


def scan_count(df: DataFrame) -> int:
    """Distinct scan nodes (the formatted plan mentions each node twice:
    once in the tree, once in the detail section — count details)."""
    return len(re.findall(r"\(\d+\) Scan parquet", _formatted(df)))
