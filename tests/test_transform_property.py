"""Property-based fidelity test (SURVEY §7 'what is hard'): the
column-expression transform must agree with an INDEPENDENT pure-Python
reimplementation of the reference's timestamp-ordered dict fold +
post-hoc overrides (transform_json_record, adsmp/solr_updater.py:435-570)
on randomized source-presence / timestamp-order combinations.

The Python model below is written from the documented semantics, not
from the Spark code — so a bug in the column plan can't hide in both.
"""

from __future__ import annotations

import datetime as dt
import json

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from adsmasterpipeline_spark.schemas import EVENT_SCHEMA
from adsmasterpipeline_spark.storage import empty_records, merge_updates
from adsmasterpipeline_spark.transform import transform_records

BIB = "2024Rand..001..001R"

# -- the independent model ---------------------------------------------------


def model_fold(payloads: dict, ts: dict) -> dict:
    """Pure-python reimplementation of the fold semantics for the
    contested keys: aff, bibgroup, links_data, property/esources,
    database."""
    out: dict = {}
    order = sorted(
        [k for k in payloads],
        key=lambda k: ts.get(k, dt.datetime.max))
    for src in order:
        p = payloads[src]
        if src == "bib_data":
            for k, v in p.items():
                if k in ("aff", "bibgroup", "database", "links_data"):
                    out[k] = v
        elif src == "augments":
            aff = p.get("aff_raw", p.get("aff", out.get("aff")))
            out["aff"] = aff
        elif src == "nonbib_data":
            out["property"] = p.get("property", [])
            out["esources"] = p.get("esource", [])
            if p.get("links_data"):
                out["links_data"] = p["links_data"]
    # classifications applies in FIXED pipeline order — always after
    # bib_data, regardless of event timestamps (DB_COLUMN_DESTINATIONS,
    # solr_updater.py:355-367; extractor :170-181)
    if "classifications" in payloads:
        filtered = [x for x in payloads["classifications"] if x in
                    ("astrophysics", "heliophysics", "planetary")]
        if filtered:
            out["database"] = sorted(
                set(filtered + (out.get("database") or [])))
    # post-hoc overrides
    if "nonbib_data" in payloads:
        nb = payloads["nonbib_data"]
        if payloads.get("bib_data", {}).get("links_data") and nb.get("links_data"):
            out["links_data"] = nb["links_data"]
        if nb.get("bibgroup"):
            out["bibgroup"] = nb["bibgroup"]
    if "nonbib_data" not in payloads and "bib_data" in payloads:
        links = payloads["bib_data"].get("links_data")
        if links:
            out.setdefault("property", [])
            try:
                first = json.loads(links[0])
                if first.get("access") == "open":
                    out["property"] = out["property"] + [
                        "ESOURCE", "ARTICLE", "NOT REFEREED",
                        "EPRINT_OPENACCESS", "OPENACCESS"]
                    out["esources"] = ["EPRINT_HTML", "EPRINT_PDF"]
            except (ValueError, KeyError):
                pass
    if (payloads.get("bib_data", {}).get("database")
            and "classifications" in payloads):
        out["database"] = sorted(set(
            payloads["classifications"] + payloads["bib_data"]["database"]))
    return out


# -- generators ---------------------------------------------------------------

OPEN_LINK = json.dumps({"url": "http://x/abs/1", "access": "open"})
CLOSED_LINK = json.dumps({"url": "http://x/abs/1", "access": "closed"})

bib_strategy = st.fixed_dictionaries({}, optional={
    "aff": st.lists(st.sampled_from(["A1", "A2"]), max_size=2),
    "bibgroup": st.lists(st.sampled_from(["G1"]), max_size=1),
    # min_size=0: the empty list must NOT take the truthy-database
    # override branch (reference truthiness test, solr_updater.py:535)
    "database": st.lists(st.sampled_from(["astronomy", "physics"]),
                         min_size=0, max_size=2, unique=True),
    "links_data": st.sampled_from([[OPEN_LINK], [CLOSED_LINK]]),
})
nonbib_strategy = st.fixed_dictionaries({}, optional={
    "property": st.lists(st.sampled_from(["REFEREED", "ARTICLE"]),
                         max_size=2, unique=True),
    "esource": st.lists(st.sampled_from(["PUB_HTML"]), max_size=1),
    "bibgroup": st.lists(st.sampled_from(["NBG"]), max_size=1),
    "links_data": st.sampled_from([None, "nb-links"]),
})
augments_strategy = st.fixed_dictionaries({}, optional={
    "aff_raw": st.lists(st.sampled_from(["R1"]), min_size=1, max_size=1),
    "aff": st.lists(st.sampled_from(["C1"]), min_size=1, max_size=1),
})
cls_strategy = st.lists(
    st.sampled_from(["astrophysics", "heliophysics", "weird"]),
    min_size=1, max_size=2, unique=True)

scenario = st.fixed_dictionaries({}, optional={
    "bib_data": bib_strategy,
    "nonbib_data": nonbib_strategy,
    "augments": augments_strategy,
    "classifications": cls_strategy,
}).flatmap(lambda payloads: st.tuples(
    st.just(payloads),
    st.permutations(list(payloads))))


@pytest.mark.usefixtures("spark")
@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(scenario=scenario)
@pytest.mark.slow
def test_fold_matches_model(spark, scenario):
    payloads, order = scenario
    if not payloads:
        return
    base = dt.datetime(2024, 1, 1)
    ts = {src: base + dt.timedelta(days=i) for i, src in enumerate(order)}
    events = [(BIB, src, "active",
               json.dumps(p), ts[src]) for src, p in payloads.items()]
    recs, _ = merge_updates(
        empty_records(spark),
        spark.createDataFrame(events, EVENT_SCHEMA),
        now=F.lit(base).cast("timestamp"))
    doc = transform_records(recs).collect()[0].asDict()
    want = model_fold(payloads, ts)

    def norm(v):
        if v is None:
            return None
        if isinstance(v, list):
            return list(v)
        return v

    for key in ("aff", "bibgroup", "property", "esources"):
        got = norm(doc.get(key))
        expect = norm(want.get(key))
        assert got == expect, (key, payloads, order, got, expect)
    # database is set-valued in the model; engine sorts — compare as sets
    got_db = doc.get("database")
    want_db = want.get("database")
    assert (got_db is None) == (want_db is None), ("database", payloads, order)
    if got_db is not None:
        assert sorted(got_db) == sorted(want_db), ("database", payloads, order)
    # links_data: engine renders bib links as JSON array text
    want_links = want.get("links_data")
    got_links = doc.get("links_data")
    if isinstance(want_links, list):
        got_links = json.loads(got_links) if got_links else None
    assert got_links == want_links, ("links_data", payloads, order)
