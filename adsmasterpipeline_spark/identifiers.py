"""Identifier graph maintenance (M4/M5, SURVEY §2.2).

The reference keeps a directed graph of alternate→canonical bibcodes
(`IdentifierMapping`, adsmp/models.py:144-152), repoints whole chains
on rename (`rename_bibcode`, adsmp/app.py:279-300), and walks it
transitively in `get_changelog` (adsmp/app.py:322-333).

Spark-side the graph is a (key, target) DataFrame; chain-following is
an iterate-to-fixpoint self-join with a cycle guard (SURVEY §7 risk
note). Chains in practice are short (a bibcode renames a handful of
times), so the loop converges in a few broadcast joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_CHAIN = 16  # cycle guard


def canonicalize(mapping: DataFrame) -> DataFrame:
    """Resolve every key to the END of its chain: (key, canonical).
    Iterated pointer-jumping (doubling): O(log chain-length) joins."""
    cur = mapping.select("key", F.col("target").alias("canonical"))
    for _ in range(MAX_CHAIN.bit_length()):
        nxt = cur.alias("a").join(
            cur.select(F.col("key").alias("_k"),
                       F.col("canonical").alias("_c")).alias("b"),
            F.col("a.canonical") == F.col("_k"), "left")
        bumped = nxt.select(
            F.col("a.key").alias("key"),
            F.coalesce(F.col("_c"), F.col("a.canonical")).alias("canonical"))
        # converged when no row changed — check cheaply via count of
        # rows whose canonical still appears as a key
        cur = bumped
        remaining = cur.join(mapping.select(F.col("key").alias("_k")),
                             cur.canonical == F.col("_k"), "left_semi")
        if remaining.isEmpty():
            break
    return cur


def rename_bibcode(mapping: DataFrame, old: str, new: str) -> DataFrame:
    """M4 (adsmp/app.py:279-300): repoint the whole chain ending at
    ``old`` to ``new`` and add ``old -> new`` itself."""
    spark = mapping.sparkSession
    addition = spark.createDataFrame([(old, new)], mapping.schema)
    # every key whose canonical target resolves to `old` now points to `new`
    resolved = canonicalize(mapping)
    repointed = (
        mapping.alias("m")
        .join(resolved.alias("r"), F.col("m.key") == F.col("r.key"), "left")
        .select(
            F.col("m.key").alias("key"),
            F.when((F.col("r.canonical") == old) | (F.col("m.target") == old),
                   F.lit(new)).otherwise(F.col("m.target")).alias("target"),
        )
    )
    return repointed.unionByName(addition).distinct()


def transitive_history(mapping: DataFrame, bibcode: str) -> DataFrame:
    """M5 — get_changelog traversal (adsmp/app.py:322-333): all keys
    whose chain reaches ``bibcode`` (BFS over reversed edges)."""
    frontier = mapping.where(F.col("target") == bibcode).select("key")
    seen = frontier
    for _ in range(MAX_CHAIN):
        tgt = frontier.select(F.col("key").alias("_t"))
        nxt = (mapping.join(tgt, mapping.target == F.col("_t"), "left_semi")
               .select("key")
               .join(seen.select(F.col("key").alias("_s")),
                     F.col("key") == F.col("_s"), "left_anti"))
        if nxt.isEmpty():
            break
        seen = seen.unionByName(nxt).distinct()
        frontier = nxt
    return seen
