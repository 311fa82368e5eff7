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


def broadcast_hint_count(df: DataFrame) -> int:
    """Number of FORCED broadcast hints (``F.broadcast(...)``) in the
    analyzed logical plan. Distinct from ``has_broadcast_join``: the
    optimizer may legitimately pick a broadcast for a provably-small
    side at runtime (size estimate / AQE) — a *hint* overrides that
    judgment unconditionally, which is the dangerous case when the
    hinted side grows with the corpus."""
    analyzed = str(df._jdf.queryExecution().analyzed())
    return len(re.findall(r"ResolvedHint \(strategy=broadcast\)",
                          analyzed))


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


def plan_scale_issues(df: DataFrame) -> list[dict]:
    """Walk the physical plan (pre-AQE) and classify every construct
    that COULD be a scale problem, with a boundedness verdict:

    - ``single_partition`` — a SinglePartition shuffle. Bounded when
      its child is a grouping-free aggregate (the partials-merge every
      global COUNT/SUM performs — input rows = task count) or a
      limit/TopK node (input rows = k per partition).
    - ``nested_loop`` / ``cartesian`` — non-equi or cross joins.
      Bounded when either side's subtree provably produces O(1)/O(k)
      rows (a grouping-free aggregate or a limit below it).

    Returns [{kind, child, bounded}]; an unbounded entry is a genuine
    100x scale-killer and the audit artifact flags it.
    """
    agg_nodes = ("HashAggregateExec", "SortAggregateExec",
                 "ObjectHashAggregateExec")

    def simple(n):
        return n.getClass().getSimpleName()

    def children(n):
        cs = n.children()
        return [cs.apply(i) for i in range(cs.length())]

    def is_onerow_agg(n):
        return (simple(n) in agg_nodes
                and n.groupingExpressions().isEmpty())

    # single-child nodes that MULTIPLY rows — a bounded input does NOT
    # make their output bounded (explode fan-out above a limit is
    # still unbounded)
    row_multiplying = ("GenerateExec", "ExpandExec")

    def subtree_bounded(n):
        nm = simple(n)
        if is_onerow_agg(n) or "Limit" in nm \
                or nm == "TakeOrderedAndProjectExec":
            return True
        if nm in row_multiplying:
            return False
        cs = children(n)
        # pass-through nodes: bounded if their input is bounded
        if len(cs) == 1:
            return subtree_bounded(cs[0])
        return False

    issues: list[dict] = []

    def walk(n):
        nm = simple(n)
        if nm == "ShuffleExchangeExec" and \
                "SinglePartition" in n.outputPartitioning().toString():
            ch = children(n)[0]
            bounded = is_onerow_agg(ch) or subtree_bounded(ch)
            issues.append({"kind": "single_partition",
                           "child": simple(ch), "bounded": bounded})
        elif nm in ("BroadcastNestedLoopJoinExec",
                    "CartesianProductExec"):
            cs = children(n)
            bounded = any(subtree_bounded(c) for c in cs)
            via = "structural" if bounded else None
            # a broadcast build side is runtime-capped by construction
            # (collected to the driver under the broadcast limit, OOM
            # rather than silent quadratic work) — the intentional
            # pattern behind ANN brute force / centroid assignment
            if not bounded and any(simple(c) == "BroadcastExchangeExec"
                                   for c in cs):
                bounded, via = True, "broadcast-build"
            issues.append({
                "kind": ("cartesian" if nm == "CartesianProductExec"
                         else "nested_loop"),
                "child": "/".join(simple(c) for c in cs),
                "bounded": bounded, **({"via": via} if via else {})})
        for c in children(n):
            walk(c)

    # exchanges are inserted by EnsureRequirements during executedPlan
    # preparation — sparkPlan() predates them. Under AQE the root is
    # AdaptiveSparkPlanExec; audit its initial plan (the final plan
    # only exists after execution).
    root = df._jdf.queryExecution().executedPlan()
    if simple(root) == "AdaptiveSparkPlanExec":
        root = root.initialPlan()
    walk(root)
    return issues
