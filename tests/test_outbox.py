"""Outbound request derivation tests (S11)."""

from __future__ import annotations

import datetime as dt
import json

from pyspark.sql import functions as F

from adsmasterpipeline_spark.outbox import (
    aff_augment_requests, boost_requests, write_outbox,
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
