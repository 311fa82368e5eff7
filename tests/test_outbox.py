"""Outbound request derivation tests (S11)."""

from __future__ import annotations

import datetime as dt
import json

from pyspark.sql import functions as F

from adsmasterpipeline_spark.outbox import (
    aff_augment_requests, boost_requests, classify_requests, write_outbox,
)
from adsmasterpipeline_spark.schemas import EVENT_SCHEMA
from adsmasterpipeline_spark.storage import empty_records, merge_updates


def _records(spark):
    ts = dt.datetime(2024, 1, 1)
    ev = spark.createDataFrame([
        ("B1", "bib_data", "active",
         json.dumps({"bibcode": "B1", "aff": ["Inst A"], "author": ["Doe"]}), ts),
        ("B1", "metrics", "active", json.dumps({"citation_num": 3}), ts),
        ("B1", "classifications", "active", json.dumps(["astrophysics"]), ts),
        ("B2", "bib_data", "active", json.dumps({"bibcode": "B2"}), ts),
    ], EVENT_SCHEMA)
    recs, _ = merge_updates(empty_records(spark), ev,
                            now=F.lit(ts).cast("timestamp"))
    return recs


def test_aff_augment_skips_missing_aff(spark):
    reqs = aff_augment_requests(_records(spark)).collect()
    assert [r["bibcode"] for r in reqs] == ["B1"]
    assert json.loads(reqs[0]["aff"]) == ["Inst A"]


def test_boost_requests_payload(spark, tmp_path):
    reqs = boost_requests(_records(spark), run_id=7)
    rows = {r["bibcode"]: r for r in reqs.collect()}
    assert set(rows) == {"B1", "B2"}
    r1 = rows["B1"]
    assert r1["status"] == "updated"
    assert r1["scix_id"].startswith("scix:")
    assert json.loads(r1["metrics"])["citation_num"] == 3
    assert r1["classifications"] == ["astrophysics"]
    assert r1["run_id"] == 7

    write_outbox(reqs, str(tmp_path / "boost"))
    back = spark.read.json(str(tmp_path / "boost"))
    assert back.count() == 2


def _titled_records(spark, n=0):
    """Records where B1 has title+abstract, B2 has none (mirrors the
    reference classify cases, adsmp/tests/test_app.py); optionally n
    extra titled records for batch tests."""
    ts = dt.datetime(2024, 1, 1)
    rows = [
        ("B1", "bib_data", "active",
         json.dumps({"bibcode": "B1", "title": ["T one", "alt"],
                     "abstract": "A1"}), ts),
        ("B2", "bib_data", "active", json.dumps({"bibcode": "B2"}), ts),
    ]
    for i in range(n):
        rows.append((f"C{i:04d}", "bib_data", "active",
                     json.dumps({"bibcode": f"C{i:04d}",
                                 "title": [f"T{i}"]}), ts))
    ev = spark.createDataFrame(rows, EVENT_SCHEMA)
    recs, _ = merge_updates(empty_records(spark), ev,
                            now=F.lit(ts).cast("timestamp"))
    return recs


def test_classify_auto_requires_title(spark):
    """Auto mode: one request per titled record; title lists collapse
    to the first element (app.py:708-717); no-title records skipped."""
    reqs = classify_requests(_titled_records(spark),
                             operation_step="classify").collect()
    assert [r["bibcode"] for r in reqs] == ["B1"]
    assert reqs[0]["title"] == "T one"
    assert reqs[0]["abstract"] == "A1"
    assert reqs[0]["operation_step"] == "classify"


def test_classify_manual_lookup_and_batching(spark):
    """Manual mode: rows with own title/abstract pass through, bare
    bibcodes look the record up, titleless results drop, batches of
    batch_size get distinct batch_idx (app.py:729-772)."""
    recs = _titled_records(spark, n=7)
    req = spark.createDataFrame(
        [("B1", None, None),            # lookup -> titled
         ("B2", None, None),            # lookup -> no title -> dropped
         ("BX", "Own title", "Own abs"),  # own fields, no record needed
         ("BY", None, "abs only")]      # own abstract, no title -> dropped
        + [(f"C{i:04d}", None, None) for i in range(7)],
        "bibcode string, title string, abstract string")
    out = classify_requests(recs, request_list=req, batch_size=4,
                            output_path="req_file").collect()
    got = {r["bibcode"]: r for r in out}
    assert set(got) == {"B1", "BX"} | {f"C{i:04d}" for i in range(7)}
    assert got["B1"]["title"] == "T one"
    assert got["BX"]["title"] == "Own title"
    assert all(r["output_path"] == "req_file" for r in out)
    # 9 requests, batch_size 4 -> batch ids 0,0,0,0,1,1,1,1,2 in bibcode order
    by_bib = [got[b]["batch_idx"] for b in sorted(got)]
    assert by_bib == [0, 0, 0, 0, 1, 1, 1, 1, 2]
