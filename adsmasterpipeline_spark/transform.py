"""Record → search-doc fusion (T1-T15, SURVEY.md §2.6) as one
whole-column Spark plan.

The reference folds the 8 payload dicts into one doc ordered by their
``*_updated`` timestamps ascending — newer sources overwrite older keys
— then applies hard priority overrides (`transform_json_record`,
adsmp/solr_updater.py:435-570). The key overlap analysis (SURVEY §7
"what is hard") shows only these keys are actually contested, each
resolved here as an explicit rule instead of a fold:

- ``links_data``  — nonbib wins whenever both sides have it (T3,
  :476-484); otherwise whichever side has it.
- ``bibgroup``/``bibgroup_facet`` — nonbib preferred when non-empty
  (T4, :486-494).
- ``property``/``esources`` — nonbib extractor always sets them (with
  [] defaults) when nonbib exists; when ONLY bib exists and its
  ``links_data[0]`` parses with access=='open', the open-access
  property/esource expansion applies (T5, :497-523).
- ``database`` — when both bib.database and classifications exist, the
  post-hoc override takes set(raw classifications ∪ bib.database)
  (:535-540 — note: the override deliberately uses the UNFILTERED
  classifier list, unlike the fold-time extractor which filters to
  EXPOSE_COLLECTIONS, :170-181). When only classifications exist the
  filtered list is used; empty-after-filter falls back to bib.
- ``aff`` — genuinely timestamp-dependent (T14, :150-168): the
  augments extractor prefers aug.aff_raw > aug.aff > current doc aff,
  but if bib_data is NEWER than augments its splat overwrites aff
  again. Encoded as an explicit timestamp comparison.

Everything else is single-source → a plain column expression. All
derivations are JVM-side; no UDF appears anywhere in this plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .functions.derivations import (
    data_facet, flat_hier_facets, hier_facet, map_ned_type,
    map_simbad_type, solr_stamp, split_id_type,
)
from .schemas import (
    AUGMENTS_SCHEMA, BIB_DATA_SCHEMA, BOOST_FACTORS_SCHEMA,
    CLASSIFICATIONS_SCHEMA, EXPOSE_COLLECTIONS, FULLTEXT_SCHEMA,
    HAS_FIELDS_DEFAULT, LINKS_DATA_ITEM_SCHEMA, METRICS_SCHEMA,
    NONBIB_DATA_SCHEMA, ORCID_CLAIMS_SCHEMA,
)

# boost columns defaulted to 1 when absent (adsmp/solr_updater.py:524-529
# — note refereed_boost is NOT in the reference's default list)
BOOST_DEFAULT_COLUMNS = (
    "doctype_boost", "recency_boost", "boost_factor",
    "astronomy_final_boost", "physics_final_boost",
    "earth_science_final_boost", "planetary_science_final_boost",
    "heliophysics_final_boost", "general_final_boost",
)

# bib_data keys splatted straight into the doc (dest '' in
# DB_COLUMN_DESTINATIONS, adsmp/solr_updater.py:358-369)
_BIB_SPLAT = (
    "abstract", "alternate_bibcode", "author", "author_count",
    "author_facet", "author_facet_hier", "author_norm", "bibstem",
    "bibstem_facet", "date", "doctype", "doctype_facet_hier", "editor",
    "email", "first_author", "first_author_facet_hier",
    "first_author_norm", "identifier", "orcid_pub", "page", "pub",
    "pub_abbrev", "pub_raw", "pubdate", "title", "volume", "year",
)


def _nb(name: str) -> Column:
    return F.col("_nonbib").getField(name)


def _when_nonbib(col: Column, default=None) -> Column:
    """Nonbib extractor fields exist only when nonbib_data is present
    (extract_data_pipeline runs per-source, adsmp/solr_updater.py:25-147)."""
    guarded = F.when(F.col("_nonbib").isNotNull(), col)
    return guarded if default is None else guarded.otherwise(default)


def transform_records(records: DataFrame,
                      has_fields: tuple[str, ...] = HAS_FIELDS_DEFAULT,
                      enable_has: bool = True) -> DataFrame:
    """T1: build the search-doc DataFrame from the records table —
    one row per bibcode, flat doc columns. Null columns mean "key
    absent" (the JSON sink drops them, matching dict semantics)."""
    df = (
        records
        .withColumn("_bib", F.from_json("bib_data", BIB_DATA_SCHEMA))
        .withColumn("_nonbib", F.from_json("nonbib_data", NONBIB_DATA_SCHEMA))
        .withColumn("_orcid", F.from_json("orcid_claims", ORCID_CLAIMS_SCHEMA))
        .withColumn("_ft", F.from_json("fulltext", FULLTEXT_SCHEMA))
        .withColumn("_met", F.from_json("metrics", METRICS_SCHEMA))
        .withColumn("_aug", F.from_json("augments", AUGMENTS_SCHEMA))
        .withColumn("_cls", F.from_json("classifications", CLASSIFICATIONS_SCHEMA))
        .withColumn("_boost", F.from_json("boost_factors", BOOST_FACTORS_SCHEMA))
    )

    doc: dict[str, Column] = {"bibcode": F.col("bibcode"), "id": F.col("id")}

    # ---- bib splat (T2 dest '') -------------------------------------
    for k in _BIB_SPLAT:
        doc[k] = F.col("_bib").getField(k)

    # ---- orcid (T11) -------------------------------------------------
    doc["orcid_user"] = F.col("_orcid").getField("verified")
    doc["orcid_other"] = F.col("_orcid").getField("unverified")

    # ---- fulltext (T12) ----------------------------------------------
    doc["body"] = F.col("_ft").getField("body")
    doc["ack"] = F.col("_ft").getField("acknowledgements")
    doc["facility"] = F.col("_ft").getField("facility")

    # ---- metrics (T13) -----------------------------------------------
    doc["citation"] = F.when(F.col("_met").isNotNull(),
                             F.coalesce(F.col("_met.citations"), F.array()))

    # ---- nonbib enrichment (F1-F12) ----------------------------------
    empty_s = F.array().cast("array<string>")
    reader = F.coalesce(_nb("readers"), empty_s)
    doc["reader"] = _when_nonbib(reader)
    doc["read_count"] = _when_nonbib(F.size(reader))
    doc["cite_read_boost"] = _when_nonbib(F.coalesce(_nb("boost"), F.lit(0.0)))
    doc["classic_factor"] = _when_nonbib(F.coalesce(_nb("norm_cites"), F.lit(0.0)))
    reference = F.coalesce(_nb("reference"), empty_s)
    doc["reference"] = _when_nonbib(reference)
    doc["reference_count"] = _when_nonbib(
        F.coalesce(_nb("reference_count"), F.size(reference)))
    nb_data = F.coalesce(_nb("data"), empty_s)
    doc["data"] = _when_nonbib(nb_data)
    doc["data_facet"] = _when_nonbib(data_facet(nb_data))
    doc["citation_count"] = _when_nonbib(F.coalesce(_nb("citation_count"), F.lit(0)))
    doc["citation_count_norm"] = _when_nonbib(
        F.coalesce(_nb("citation_count_norm"), F.lit(0.0)))
    for name in ("credit", "mention"):
        vals = F.coalesce(_nb(name), empty_s)
        doc[name] = _when_nonbib(vals)
        doc[f"{name}_count"] = _when_nonbib(
            F.coalesce(_nb(f"{name}_count"), F.size(vals)))

    # grants (F3): "agency grant_no" -> flat pairs + hier facets
    grants = F.coalesce(_nb("grants"), empty_s)
    doc["grant"] = _when_nonbib(F.flatten(F.transform(
        grants, lambda x: F.array(F.split(x, " ", 2).getItem(0),
                                  F.split(x, " ", 2).getItem(1)))))
    doc["grant_facet_hier"] = _when_nonbib(
        flat_hier_facets(grants, lambda x: F.split(x, " ", 2)))

    # planetary features (F4): planet/feature/name/id
    pf = F.coalesce(_nb("planetary_feature"), empty_s)
    pf_parts = lambda x: F.split(x, "/", 4)  # noqa: E731
    doc["planetary_feature"] = _when_nonbib(F.transform(
        pf, lambda x: F.concat_ws("/", F.slice(pf_parts(x), 1, 3))))
    doc["planetary_feature_id"] = _when_nonbib(
        F.transform(pf, lambda x: F.element_at(pf_parts(x), 4)))
    doc["planetary_feature_facet_hier_3level"] = _when_nonbib(
        flat_hier_facets(pf, lambda x: F.slice(pf_parts(x), 1, 3)))

    # uat (F5): kw1/kw2/.../id
    uat = F.coalesce(_nb("uat"), empty_s)
    doc["uat"] = _when_nonbib(F.transform(
        uat, lambda x: F.concat_ws(
            "/", F.slice(F.split(x, "/"), 1, F.size(F.split(x, "/")) - 1))))
    doc["uat_id"] = _when_nonbib(
        F.transform(uat, lambda x: F.element_at(F.split(x, "/"), -1)))

    # simbad / ned objects (F6-F9)
    for src, prefix, mapper, facet_name in (
        ("simbad_objects", "simb", map_simbad_type, "simbad_object_facet_hier"),
        ("ned_objects", "ned", map_ned_type, "ned_object_facet_hier"),
    ):
        entries = F.coalesce(_nb(src), empty_s)
        sid = lambda x: split_id_type(x)[0]  # noqa: E731
        stype = lambda x: split_id_type(x)[1]  # noqa: E731
        doc[f"{prefix}id"] = _when_nonbib(F.transform(entries, sid))
        doc[f"{prefix}type"] = _when_nonbib(
            F.transform(entries, lambda x: mapper(stype(x))))
        doc[facet_name] = _when_nonbib(flat_hier_facets(
            entries, lambda x: F.array(mapper(stype(x)), sid(x))))

    # ---- augments / aff priority (T14, timestamp-dependent) ----------
    aug_present = F.col("_aug").isNotNull()
    bib_aff = F.col("_bib").getField("aff")
    aug_aff = F.coalesce(F.col("_aug.aff_raw"), F.col("_aug.aff"), bib_aff)
    # bib splat overwrites an OLDER augment's aff only if bib has the key
    bib_newer = (F.col("bib_data_updated").isNotNull()
                 & F.col("augments_updated").isNotNull()
                 & (F.col("bib_data_updated") > F.col("augments_updated")))
    doc["aff"] = (
        F.when(aug_present & ~(bib_newer & bib_aff.isNotNull()), aug_aff)
        .otherwise(bib_aff)
    )
    for k in ("aff_abbrev", "aff_canonical", "aff_facet", "aff_facet_hier",
              "aff_id", "institution"):
        doc[k] = F.col("_aug").getField(k)

    # ---- bibgroup override (T4) --------------------------------------
    for k in ("bibgroup", "bibgroup_facet"):
        nb_v = _nb(k)
        doc[k] = F.when(F.col("_nonbib").isNotNull() & nb_v.isNotNull()
                        & (F.size(nb_v) > 0), nb_v) \
                  .otherwise(F.col("_bib").getField(k))

    # ---- links_data override (T3) ------------------------------------
    bib_links = F.col("_bib").getField("links_data")
    nb_links = _nb("links_data")
    doc["links_data"] = F.when(
        F.col("_nonbib").isNotNull() & nb_links.isNotNull(), nb_links
    ).otherwise(F.when(bib_links.isNotNull(), F.to_json(bib_links)))

    # ---- property / esources incl. bib-only open-access (T5) ---------
    first_link = F.from_json(F.element_at(bib_links, 1), LINKS_DATA_ITEM_SCHEMA)
    bib_only = F.col("_nonbib").isNull() & F.col("_bib").isNotNull()
    is_open = bib_only & bib_links.isNotNull() \
        & (first_link.getField("access") == "open")
    doc["property"] = (
        F.when(F.col("_nonbib").isNotNull(), F.coalesce(_nb("property"), empty_s))
        .when(is_open, F.array(*[F.lit(x) for x in (
            "ESOURCE", "ARTICLE", "NOT REFEREED", "EPRINT_OPENACCESS",
            "OPENACCESS")]))
        .when(bib_only & bib_links.isNotNull(), empty_s)
    )
    doc["esources"] = (
        F.when(F.col("_nonbib").isNotNull(), F.coalesce(_nb("esource"), empty_s))
        .when(is_open, F.array(F.lit("EPRINT_HTML"), F.lit("EPRINT_PDF")))
    )

    # ---- database / classifications (T7 + :535-540 override) ---------
    bib_db = F.col("_bib").getField("database")
    cls = F.col("_cls")
    filtered_cls = F.filter(cls, lambda x: x.isin(*EXPOSE_COLLECTIONS))
    doc["database"] = (
        # both present -> set(raw classifications + bib.database); the
        # reference tests bib_data['database'] for TRUTHINESS, so an
        # empty list must not take this branch (solr_updater.py:535-540)
        F.when(F.col("_bib").isNotNull() & cls.isNotNull()
               & bib_db.isNotNull() & (F.size(bib_db) > 0),
               F.array_sort(F.array_distinct(F.concat(cls, bib_db))))
        # classifications only (filtered; empty filter falls back to bib)
        .when(cls.isNotNull() & (F.size(filtered_cls) > 0),
              F.array_sort(F.array_distinct(F.concat(
                  filtered_cls, F.coalesce(bib_db, empty_s)))))
        .otherwise(bib_db)
    )

    # ---- boosts (T15 + T6 defaults) ----------------------------------
    doc["refereed_boost"] = F.col("_boost").getField("refereed_boost")
    for k in BOOST_DEFAULT_COLUMNS:
        doc[k] = F.coalesce(F.col("_boost").getField(k),
                            F.lit(1.0))

    # ---- scix_id ------------------------------------------------------
    doc["scix_id"] = F.col("scix_id")

    # ---- timestamps (T10) ---------------------------------------------
    fmap = {
        "metadata_mtime": "bib_data_updated",
        "nonbib_mtime": "nonbib_data_updated",
        "fulltext_mtime": "fulltext_updated",
        "orcid_mtime": "orcid_claims_updated",
        "metrics_mtime": "metrics_updated",
    }
    for out_k, src in fmap.items():
        doc[out_k] = solr_stamp(F.col(src))
    doc["update_timestamp"] = solr_stamp(
        F.greatest(*[F.col(src) for src in fmap.values()]))

    result = df.select(*[c.alias(n) for n, c in doc.items()])

    # ---- has (T8) — computed over the finished doc --------------------
    if enable_has:
        entries = []
        for fname in sorted(set(has_fields) & set(result.columns)):
            col = F.col(fname)
            dt = dict(result.dtypes)[fname]
            flat = (F.concat_ws("", col) if dt.startswith("array")
                    else col.cast("string"))
            entries.append(F.when(flat.rlike("[a-zA-Z0-9]"), F.lit(fname)))
        result = result.withColumn(
            "has", F.filter(F.array(*entries), lambda x: x.isNotNull()))
    return result


def ensure_identifier(docs: DataFrame) -> DataFrame:
    """T9 — the caller guarantees `identifier` exists and contains the
    canonical bibcode (adsmp/tasks.py:398-402)."""
    return docs.withColumn(
        "identifier",
        F.array_union(
            F.coalesce(F.col("identifier"), F.array().cast("array<string>")),
            F.array(F.col("bibcode"))))


def solr_docs_json(docs: DataFrame) -> DataFrame:
    """Render docs as JSON payloads for the solr sink; nulls drop out,
    matching the reference's dict semantics."""
    return docs.select(
        "bibcode",
        F.to_json(F.struct(*[F.col(c) for c in docs.columns])).alias("doc"))
