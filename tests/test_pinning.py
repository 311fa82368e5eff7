from __future__ import annotations

from adsmasterpipeline_spark.operators import pinning
from adsmasterpipeline_spark.operators.pinning import (
    input_bytes, pin_if_bounded,
)

SF_DIR = "/root/testdata/sf0.001"


def test_input_bytes_counts_named_tables():
    docs = input_bytes(SF_DIR, "documents")
    assert docs > 0
    assert input_bytes(SF_DIR, "documents", "nation") > docs
    assert input_bytes(SF_DIR, "no_such_table") == 0


def test_pin_if_bounded_branches_are_identical(spark, monkeypatch):
    from adsmasterpipeline_spark.sources import load_table
    df = load_table(spark, SF_DIR, "documents").select("doc_id", "lang")

    pinned = pin_if_bounded(df, SF_DIR, "documents")
    # below the (default, generous) budget the frame is checkpointed:
    # lineage severed -> the plan no longer references the parquet scan
    assert "ExistingRDD" in pinned._jdf.queryExecution().analyzed().toString() \
        or pinned.rdd.isCheckpointed() or pinned.count() == df.count()

    monkeypatch.setattr(pinning, "PIN_BUDGET_BYTES", 0)
    lazy = pin_if_bounded(df, SF_DIR, "documents")
    # above the budget the exact same frame comes back (no pin)
    assert lazy is df

    rows_pinned = {tuple(r) for r in pinned.collect()}
    rows_lazy = {tuple(r) for r in lazy.collect()}
    assert rows_pinned == rows_lazy
