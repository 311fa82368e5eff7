"""Golden-record tests for the record→search-doc fusion (T1-T15,
F1-F14), modeled on the reference's test strategy (SURVEY.md §5.2:
ingest payloads for one bibcode, assert the merged doc field-by-field;
FIXTURES.md §A7 scenario). Payload values are this repo's own fixtures
following the FIXTURES.md §A3 schemas."""

from __future__ import annotations

import datetime as dt
import json

import pytest
from pyspark.sql import functions as F

from adsmasterpipeline_spark.schemas import EVENT_SCHEMA
from adsmasterpipeline_spark.storage import empty_records, merge_updates
from adsmasterpipeline_spark.transform import (
    ensure_identifier, solr_docs_json, transform_records,
)

BIB = "2024Test..001..001A"


def ts(day, hour=0):
    return dt.datetime(2024, 1, day, hour)


def _events(spark, rows):
    return spark.createDataFrame(
        [(b, t, "active", json.dumps(p) if p is not None else None, w)
         for b, t, p, w in rows], EVENT_SCHEMA)


BIB_PAYLOAD = {
    "bibcode": BIB,
    "title": ["An example paper"],
    "author": ["Doe, J.", "Roe, R."],
    "aff": ["Inst A", "Inst B"],
    "abstract": "We study things.",
    "database": ["astronomy"],
    "identifier": ["arXiv:2401.00001"],
    "bibgroup": ["BibGroupBib"],
    "pubdate": "2024-01-00",
    "year": "2024",
    "pub": "Journal of Tests",
}

NONBIB_PAYLOAD = {
    "bibcode": BIB,
    "boost": 0.41,
    "norm_cites": 0.72,
    "readers": ["r1", "r2", "r3"],
    "reference": ["ref1", "ref2"],
    "data": ["CDS:2", "NED:5"],
    "property": ["REFEREED", "ARTICLE"],
    "esource": ["PUB_HTML"],
    "bibgroup": ["BibGroupNB"],
    "bibgroup_facet": ["BibGroupNB"],
    "citation_count": 7,
    "citation_count_norm": 0.9,
    "grants": ["NASA 123-456", "NSF 789"],
    "simbad_objects": ["12345 G", "99999 Star", "777"],
    "ned_objects": ["M31 G", "XX RadioS", "5555"],
    "planetary_feature": ["Mars/crater/Gale/1234", "Moon/albedo feature/Reiner Gamma/77"],
    "uat": ["galaxies/spiral galaxies/123", "stars/456"],
    "mention": ["m1"],
    "credit": [],
}

ORCID_PAYLOAD = {"verified": ["0000-0001-0000-0001", "-"],
                 "unverified": ["-", "0000-0002-0000-0002"]}
FULLTEXT_PAYLOAD = {"body": "full text body", "acknowledgements": "thanks",
                    "facility": ["Keck"]}
METRICS_PAYLOAD = {"citations": ["2020A&A...1..1X", "2021ApJ...2..2Y"],
                   "citation_num": 2}
AUGMENTS_PAYLOAD = {"aff": ["Canon A", "Canon B"],
                    "aff_raw": ["Raw A", "Raw B"],
                    "aff_abbrev": ["AA", "BB"],
                    "institution": ["IA", "IB"]}
CLASSIFICATIONS_PAYLOAD = ["astrophysics", "unknown_collection"]
BOOST_PAYLOAD = {"doctype_boost": 0.857, "refereed_boost": 0.3,
                 "recency_boost": 0.5, "boost_factor": 0.9,
                 "astronomy_final_boost": 0.6}


@pytest.fixture(scope="module")
def golden_doc(spark):
    rows = [
        (BIB, "bib_data", BIB_PAYLOAD, ts(1)),
        (BIB, "boost_factors", BOOST_PAYLOAD, ts(2)),
        (BIB, "fulltext", FULLTEXT_PAYLOAD, ts(3)),
        (BIB, "orcid_claims", ORCID_PAYLOAD, ts(4)),
        (BIB, "metrics", METRICS_PAYLOAD, ts(5)),
        (BIB, "nonbib_data", NONBIB_PAYLOAD, ts(6)),
        (BIB, "augments", AUGMENTS_PAYLOAD, ts(7)),
        (BIB, "classifications", CLASSIFICATIONS_PAYLOAD, ts(8)),
    ]
    recs, _ = merge_updates(empty_records(spark), _events(spark, rows),
                            now=F.lit(ts(10)).cast("timestamp"))
    docs = ensure_identifier(transform_records(recs))
    out = docs.collect()
    assert len(out) == 1
    return out[0].asDict()


def test_bib_splat(golden_doc):
    d = golden_doc
    assert d["title"] == ["An example paper"]
    assert d["author"] == ["Doe, J.", "Roe, R."]
    assert d["abstract"] == "We study things."
    assert d["year"] == "2024"


def test_aff_augment_priority(golden_doc):
    # augments newer than bib -> aff_raw wins (T14)
    assert golden_doc["aff"] == ["Raw A", "Raw B"]
    assert golden_doc["aff_abbrev"] == ["AA", "BB"]
    assert golden_doc["institution"] == ["IA", "IB"]


def test_bibgroup_nonbib_override(golden_doc):
    assert golden_doc["bibgroup"] == ["BibGroupNB"]
    assert golden_doc["bibgroup_facet"] == ["BibGroupNB"]


def test_metrics_citation(golden_doc):
    assert golden_doc["citation"] == ["2020A&A...1..1X", "2021ApJ...2..2Y"]


def test_orcid_and_fulltext(golden_doc):
    assert golden_doc["orcid_user"] == ["0000-0001-0000-0001", "-"]
    assert golden_doc["orcid_other"] == ["-", "0000-0002-0000-0002"]
    assert golden_doc["body"] == "full text body"
    assert golden_doc["ack"] == "thanks"
    assert golden_doc["facility"] == ["Keck"]


def test_nonbib_counts_and_renames(golden_doc):
    d = golden_doc
    assert d["read_count"] == 3
    assert d["reference_count"] == 2          # explicit count absent -> len
    assert d["cite_read_boost"] == pytest.approx(0.41)
    assert d["classic_factor"] == pytest.approx(0.72)
    assert d["citation_count"] == 7
    assert d["data_facet"] == ["CDS", "NED"]
    assert d["mention_count"] == 1
    assert d["credit_count"] == 0


def test_grants_split(golden_doc):
    assert golden_doc["grant"] == ["NASA", "123-456", "NSF", "789"]
    assert golden_doc["grant_facet_hier"] == [
        "0/NASA", "1/NASA/123-456", "0/NSF", "1/NSF/789"]


def test_planetary_uat(golden_doc):
    d = golden_doc
    assert d["planetary_feature"] == ["Mars/crater/Gale",
                                      "Moon/albedo feature/Reiner Gamma"]
    assert d["planetary_feature_id"] == ["1234", "77"]
    assert d["planetary_feature_facet_hier_3level"][:3] == [
        "0/Mars", "1/Mars/crater", "2/Mars/crater/Gale"]
    assert d["uat"] == ["galaxies/spiral galaxies", "stars"]
    assert d["uat_id"] == ["123", "456"]


def test_simbad_ned_mapping(golden_doc):
    d = golden_doc
    # "12345 G" -> Galaxy; "99999 Star" -> Star; "777" (no space) -> Other + ""
    assert d["simbid"] == ["12345", "99999", "777"]
    assert d["simbtype"] == ["Galaxy", "Star", "Other"]
    assert d["simbad_object_facet_hier"] == [
        "0/Galaxy", "1/Galaxy/12345", "0/Star", "1/Star/99999",
        "0/Other", "1/Other/777"]
    # ned: "M31 G" -> lookup Galaxy; "XX RadioS" -> startswith Radio;
    # "5555" missing type -> Other
    assert d["nedid"] == ["M31", "XX", "5555"]
    assert d["nedtype"] == ["Galaxy", "Radio", "Other"]


def test_database_union_quirk(golden_doc):
    # both bib.database and classifications present -> RAW union
    # (unfiltered classifier values survive, solr_updater.py:535-540)
    assert golden_doc["database"] == sorted(
        {"astronomy", "astrophysics", "unknown_collection"})


def test_boost_extraction_and_defaults(golden_doc):
    d = golden_doc
    assert d["doctype_boost"] == pytest.approx(0.857)
    assert d["refereed_boost"] == pytest.approx(0.3)
    assert d["astronomy_final_boost"] == pytest.approx(0.6)
    # absent final boosts default to 1 (T6)
    assert d["physics_final_boost"] == 1.0
    assert d["general_final_boost"] == 1.0


def test_identifier_guarantee(golden_doc):
    assert BIB in golden_doc["identifier"]
    assert "arXiv:2401.00001" in golden_doc["identifier"]


def test_timestamps(golden_doc):
    d = golden_doc
    assert d["metadata_mtime"] == "2024-01-01T00:00:00.000000Z"
    assert d["nonbib_mtime"] == "2024-01-06T00:00:00.000000Z"
    assert d["metrics_mtime"] == "2024-01-05T00:00:00.000000Z"
    # max over the 5 fmap sources (augments/classifications excluded)
    assert d["update_timestamp"] == "2024-01-06T00:00:00.000000Z"


def test_has_field(golden_doc):
    has = golden_doc["has"]
    assert has == sorted(has)
    for f in ("abstract", "aff", "author", "bibgroup", "body", "citation",
              "data", "database", "identifier", "pub", "title", "year"):
        assert f in has
    assert "doctype" not in has  # never set in this fixture


def test_scix_id_present(golden_doc):
    assert golden_doc["scix_id"].startswith("scix:")


# ---------------------------------------------------------------------------
# links_data override matrix (solr_updater.py:476-523; FIXTURES §A7 edges)
# ---------------------------------------------------------------------------

def _doc_for(spark, rows):
    recs, _ = merge_updates(empty_records(spark), _events(spark, rows),
                            now=F.lit(ts(10)).cast("timestamp"))
    return transform_records(recs).collect()[0].asDict()


OPEN_LINK = json.dumps({"url": "http://x/abs/1", "access": "open",
                        "title": "", "type": "PREPRINT", "instances": ""})
CLOSED_LINK = json.dumps({"url": "http://x/abs/1", "access": "closed",
                          "title": "", "type": "PREPRINT", "instances": ""})


def test_links_bib_only_open(spark):
    d = _doc_for(spark, [
        (BIB, "bib_data", dict(BIB_PAYLOAD, links_data=[OPEN_LINK]), ts(1))])
    assert set(d["property"]) == {"ESOURCE", "ARTICLE", "NOT REFEREED",
                                  "EPRINT_OPENACCESS", "OPENACCESS"}
    assert d["esources"] == ["EPRINT_HTML", "EPRINT_PDF"]
    assert json.loads(d["links_data"]) == [OPEN_LINK]


@pytest.mark.slow
def test_links_bib_only_closed(spark):
    d = _doc_for(spark, [
        (BIB, "bib_data", dict(BIB_PAYLOAD, links_data=[CLOSED_LINK]), ts(1))])
    assert d["property"] == []
    assert d["esources"] is None


def test_links_both_nonbib_wins(spark):
    d = _doc_for(spark, [
        (BIB, "bib_data", dict(BIB_PAYLOAD, links_data=[OPEN_LINK]), ts(5)),
        (BIB, "nonbib_data",
         dict(NONBIB_PAYLOAD, links_data="nonbib-links-value"), ts(1)),
    ])
    # nonbib older but still wins (T3)
    assert d["links_data"] == "nonbib-links-value"
    assert d["property"] == ["REFEREED", "ARTICLE"]  # nonbib property


def test_aff_bib_newer_than_augment(spark):
    d = _doc_for(spark, [
        (BIB, "augments", AUGMENTS_PAYLOAD, ts(1)),
        (BIB, "bib_data", BIB_PAYLOAD, ts(5)),
    ])
    # bib splat ran after the older augment -> bib aff wins (fold order)
    assert d["aff"] == ["Inst A", "Inst B"]
    # but augment-only fields survive
    assert d["aff_abbrev"] == ["AA", "BB"]


def test_solr_docs_json_drops_nulls(spark):
    rows = [(BIB, "bib_data", BIB_PAYLOAD, ts(1))]
    recs, _ = merge_updates(empty_records(spark), _events(spark, rows),
                            now=F.lit(ts(10)).cast("timestamp"))
    out = solr_docs_json(transform_records(recs)).collect()[0]
    doc = json.loads(out["doc"])
    assert "body" not in doc          # null column dropped
    assert doc["title"] == ["An example paper"]
