"""Typed schemas for the pipeline's data model (SURVEY.md §1, FIXTURES.md §A).

The reference stores eight JSON payloads as Postgres ``Text`` columns
(`adsmp/models.py:53-63`); here each payload type gets an explicit
``StructType`` used by ``from_json`` at transform time, while the
records table keeps the raw JSON string as the permissive escape hatch
(unknown upstream keys survive round-trips).
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Update-event stream (protobuf analogue, adsmp/app.py:335-379)
# ---------------------------------------------------------------------------

# payload-type tags — the 8 protobuf message families collapse to these
# (adsmp/app.py:342-363: metadata/nonbib/orcid/fulltext/metrics/augment/
# classify/boost)
PAYLOAD_TYPES = (
    "bib_data", "nonbib_data", "orcid_claims", "fulltext",
    "metrics", "augments", "classifications", "boost_factors",
)

EVENT_SCHEMA = T.StructType([
    T.StructField("bibcode", T.StringType(), False),
    T.StructField("type", T.StringType(), False),       # one of PAYLOAD_TYPES
    T.StructField("status", T.StringType(), False),     # active | deleted
    T.StructField("payload", T.StringType(), True),     # JSON; null for deletes
    T.StructField("event_ts", T.TimestampType(), False),
])

# ---------------------------------------------------------------------------
# Records master table (adsmp/models.py:47-96)
# ---------------------------------------------------------------------------

_STATUS_VALUES = ("solr-failed", "metrics-failed", "links-failed",
                  "retrying", "success")


def records_schema() -> T.StructType:
    fields = [
        T.StructField("id", T.LongType(), False),
        T.StructField("bibcode", T.StringType(), False),
        T.StructField("scix_id", T.StringType(), True),
    ]
    for p in PAYLOAD_TYPES:
        fields.append(T.StructField(p, T.StringType(), True))
    for p in PAYLOAD_TYPES:
        fields.append(T.StructField(f"{p}_updated", T.TimestampType(), True))
    fields += [
        T.StructField("created", T.TimestampType(), True),
        T.StructField("updated", T.TimestampType(), True),
        T.StructField("processed", T.TimestampType(), True),
        T.StructField("solr_processed", T.TimestampType(), True),
        T.StructField("metrics_processed", T.TimestampType(), True),
        T.StructField("datalinks_processed", T.TimestampType(), True),
        T.StructField("solr_checksum", T.StringType(), True),
        T.StructField("metrics_checksum", T.StringType(), True),
        T.StructField("datalinks_checksum", T.StringType(), True),
        T.StructField("status", T.StringType(), True),
    ]
    return T.StructType(fields)


RECORDS_SCHEMA = records_schema()

# ---------------------------------------------------------------------------
# Payload struct schemas (FIXTURES.md §A3) — used by from_json in transform
# ---------------------------------------------------------------------------

_s = T.StringType()
_as = T.ArrayType(T.StringType())
_ai = T.ArrayType(T.IntegerType())
_i = T.IntegerType()
_d = T.DoubleType()
_b = T.BooleanType()


BIB_DATA_SCHEMA = T.StructType([
    T.StructField(n, t, True) for n, t in [
        ("abstract", _s), ("aff", _as), ("alternate_bibcode", _as),
        ("author", _as), ("author_count", _i), ("author_facet", _as),
        ("author_facet_hier", _as), ("author_norm", _as), ("bibcode", _s),
        ("bibgroup", _as), ("bibgroup_facet", _as), ("bibstem", _as),
        ("bibstem_facet", _s), ("database", _as), ("date", _s),
        ("doctype", _s), ("doctype_facet_hier", _as), ("editor", _as),
        ("email", _as), ("first_author", _s), ("first_author_facet_hier", _as),
        ("first_author_norm", _s), ("identifier", _as),
        # each element is itself a JSON string (adsmp/app.py:901-903)
        ("links_data", _as),
        ("orcid_pub", _as), ("page", _as), ("pub", _s), ("pub_abbrev", _s),
        ("pub_raw", _s), ("pubdate", _s), ("title", _as), ("volume", _s),
        ("year", _s),
    ]
])

# schema of one parsed element of bib links_data
# (adsmp/solr_updater.py:498-501)
LINKS_DATA_ITEM_SCHEMA = T.StructType([
    T.StructField("url", _s, True),
    T.StructField("access", _s, True),
    T.StructField("title", _s, True),
    T.StructField("type", _s, True),
    T.StructField("instances", _s, True),
])

NONBIB_DATA_SCHEMA = T.StructType([
    T.StructField(n, t, True) for n, t in [
        ("authors", _as), ("bibcode", _s), ("bibgroup", _as),
        ("bibgroup_facet", _as), ("boost", _d), ("norm_cites", _d),
        ("data", _as), ("property", _as), ("downloads", _ai), ("reads", _ai),
        ("readers", _as), ("refereed", _b), ("reference", _as),
        ("reference_count", _i), ("simbad_objects", _as), ("ned_objects", _as),
        ("grants", _as), ("planetary_feature", _as), ("uat", _as),
        ("citation_count", _i), ("citation_count_norm", _d),
        ("mention", _as), ("mention_count", _i), ("credit", _as),
        ("credit_count", _i), ("esource", _as), ("links_data", _s),
        ("id", T.LongType()),
    ]
])

ORCID_CLAIMS_SCHEMA = T.StructType([
    T.StructField("authors", _as, True),
    T.StructField("bibcode", _s, True),
    T.StructField("verified", _as, True),
    T.StructField("unverified", _as, True),
])

FULLTEXT_SCHEMA = T.StructType([
    T.StructField("body", _s, True),
    T.StructField("acknowledgements", _s, True),
    T.StructField("dataset", _as, True),
    T.StructField("facility", _as, True),
])

METRICS_SCHEMA = T.StructType([
    T.StructField(n, t, True) for n, t in [
        ("bibcode", _s), ("refereed", _b), ("downloads", _ai), ("reads", _ai),
        ("citations", _as), ("citation_num", _i), ("author_num", _i),
        ("refereed_citations", _as), ("refereed_citation_num", _i),
        ("reference_num", _i), ("an_citations", _d),
        ("an_refereed_citations", _d), ("rn_citations", _d),
        ("rn_citation_data", _s),
    ]
])

AUGMENTS_SCHEMA = T.StructType([
    T.StructField(n, _as, True) for n in [
        "aff", "aff_raw", "aff_abbrev", "aff_canonical", "aff_facet",
        "aff_facet_hier", "aff_id", "institution",
    ]
])

CLASSIFICATIONS_SCHEMA = T.ArrayType(T.StringType())

BOOST_FACTORS_SCHEMA = T.StructType([
    T.StructField(n, _d, True) for n in [
        "doctype_boost", "refereed_boost", "recency_boost", "boost_factor",
        "astronomy_final_boost", "physics_final_boost",
        "earth_science_final_boost", "planetary_science_final_boost",
        "heliophysics_final_boost", "general_final_boost",
    ]
])

PAYLOAD_SCHEMAS = {
    "bib_data": BIB_DATA_SCHEMA,
    "nonbib_data": NONBIB_DATA_SCHEMA,
    "orcid_claims": ORCID_CLAIMS_SCHEMA,
    "fulltext": FULLTEXT_SCHEMA,
    "metrics": METRICS_SCHEMA,
    "augments": AUGMENTS_SCHEMA,
    "classifications": CLASSIFICATIONS_SCHEMA,
    "boost_factors": BOOST_FACTORS_SCHEMA,
}

# ---------------------------------------------------------------------------
# Sidecar tables (FIXTURES.md §A5/§A6)
# ---------------------------------------------------------------------------

SITEMAP_SCHEMA = T.StructType([
    T.StructField("record_id", T.LongType(), False),
    T.StructField("bibcode", T.StringType(), False),
    T.StructField("scix_id", T.StringType(), True),
    T.StructField("bib_data_updated", T.TimestampType(), True),
    T.StructField("sitemap_filename", T.StringType(), True),
    T.StructField("filename_lastmoddate", T.TimestampType(), True),
    T.StructField("update_flag", T.BooleanType(), False),
])

CHANGELOG_SCHEMA = T.StructType([
    T.StructField("created", T.TimestampType(), False),
    T.StructField("key", T.StringType(), False),
    T.StructField("type", T.StringType(), False),
    T.StructField("oldvalue", T.StringType(), True),
    T.StructField("permanent", T.BooleanType(), False),
])

IDENTIFIERS_SCHEMA = T.StructType([
    T.StructField("key", T.StringType(), False),
    T.StructField("target", T.StringType(), False),
])

# config analogues (config.py of the reference)
EXPOSE_COLLECTIONS = ("astrophysics", "heliophysics", "planetary")
MAX_RECORDS_PER_SITEMAP = 50_000

# fields whose presence feeds the `has` field (config.py:86-120 defines
# the production list; this engine takes it as a parameter and uses this
# representative default)
HAS_FIELDS_DEFAULT = (
    "abstract", "aff", "author", "bibgroup", "body", "citation",
    "data", "database", "doctype", "identifier", "orcid_user", "pub",
    "title", "year",
)

# scix_id derivation inputs — the reference's SCIX_ID_GENERATION_FIELDS
# list (config.py:146-153): author_norm, doi, abstract, title, doctype,
# pub_raw. (The hash itself is sha2 here vs the reference's uuid5 —
# deliberate, surveyed deviation; the INPUT fields match.)
SCIX_ID_GENERATION_FIELDS = ("author_norm", "doi", "abstract", "title",
                             "doctype", "pub_raw")
