"""Tests for the identifier graph (M4/M5) and the differential
validator (J5/F18)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from adsmasterpipeline_spark.identifiers import (
    canonicalize, rename_bibcode, transitive_history,
)
from adsmasterpipeline_spark.validate import Tolerances, compare


def _mapping(spark, edges):
    return spark.createDataFrame(edges, "key string, target string")


def test_canonicalize_chain(spark):
    m = _mapping(spark, [("A", "B"), ("B", "C"), ("C", "D")])
    got = {r["key"]: r["canonical"] for r in canonicalize(m).collect()}
    assert got == {"A": "D", "B": "D", "C": "D"}


def test_canonicalize_cycle_guard(spark):
    m = _mapping(spark, [("A", "B"), ("B", "A")])
    out = canonicalize(m).collect()  # must terminate
    assert len(out) == 2


def test_rename_repoints_chain(spark):
    m = _mapping(spark, [("A", "B"), ("B", "C")])
    m2 = rename_bibcode(m, "C", "Z")
    got = {r["key"]: r["target"] for r in m2.collect()}
    assert got == {"A": "Z", "B": "Z", "C": "Z"}
    resolved = {r["key"]: r["canonical"] for r in canonicalize(m2).collect()}
    assert set(resolved.values()) == {"Z"}


def test_transitive_history(spark):
    m = _mapping(spark, [("A", "B"), ("B", "C"), ("X", "C"), ("Q", "R")])
    got = {r["key"] for r in transitive_history(m, "C").collect()}
    assert got == {"A", "B", "X"}


# ---------------------------------------------------------------------------


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "bibcode string, citation_count int, cite_read_boost double, "
              "abstract string, keywords array<string>")


def test_compare_tolerances(spark):
    left = _docs(spark, [
        ("B1", 10, 1.00, "the quick brown fox jumps", ["b", "a"]),
        ("B2", 10, 1.00, "identical", ["x"]),
    ])
    right = _docs(spark, [
        ("B1", 12, 1.05, "the quick brown fox jumped", ["a", "b"]),  # all ok
        ("B2", 20, 2.00, "totally different text!!!!", ["y"]),       # all bad
    ])
    diffs = compare(left, right).collect()
    assert not [d for d in diffs if d["bibcode"] == "B1"]
    bad = {d["field"] for d in diffs if d["bibcode"] == "B2"}
    assert bad == {"citation_count", "cite_read_boost", "abstract", "keywords"}


def test_compare_missing_row(spark):
    left = _docs(spark, [("B1", 1, 1.0, "a", ["a"])])
    right = _docs(spark, [("B1", 1, 1.0, "a", ["a"]),
                          ("B9", 1, 1.0, "a", ["a"])])
    diffs = compare(left, right).collect()
    assert {d["bibcode"] for d in diffs} == {"B9"}
