"""Outbound pipeline request derivation (S11, SURVEY §2.1).

The reference forwards protobuf requests to sibling pipelines after
ingest side effects: affiliation-augment requests for metadata updates
(`request_aff_augment`, adsmp/app.py:628-653) and boost requests for
every non-boost update (`generate_boost_request_message`,
adsmp/app.py:821-874, payload built at :774-801). The feedback loops
come back as ordinary update events.

Spark-side these are derived *request DataFrames* written to outbox
directories — pure, replayable, no hidden broker state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def aff_augment_requests(records: DataFrame) -> DataFrame:
    """One request per record whose bib_data carries a non-empty aff
    list (the reference skips records with no aff, :648-653)."""
    aff = F.get_json_object("bib_data", "$.aff")
    return (
        records
        .where(F.col("bib_data").isNotNull() & aff.isNotNull()
               & (aff != F.lit("[]")))
        .select(
            "bibcode",
            aff.alias("aff"),
            F.coalesce(F.get_json_object("bib_data", "$.author"),
                       F.lit("")).alias("author"),
        )
    )


def boost_requests(records: DataFrame, run_id: int = 0,
                   output_path: str = "") -> DataFrame:
    """Boost-pipeline request payloads (:774-801): root identity fields
    + raw bib_data/metrics payloads + classifications list."""
    return records.where(F.col("bib_data").isNotNull()).select(
        "bibcode",
        F.coalesce("scix_id", F.lit("")).alias("scix_id"),
        F.lit("updated").alias("status"),
        F.coalesce("bib_data", F.lit("")).alias("bib_data"),
        F.coalesce("metrics", F.lit("")).alias("metrics"),
        F.coalesce(F.from_json("classifications", "array<string>"),
                   F.array().cast("array<string>")).alias("classifications"),
        F.array().cast("array<string>").alias("collections"),
        F.lit(run_id).alias("run_id"),
        F.lit(output_path).alias("output_path"),
    )


def classify_requests(records: DataFrame, request_list: DataFrame | None = None,
                      operation_step: str | None = None, batch_size: int = 500,
                      output_path: str = "") -> DataFrame:
    """Classifier-pipeline request batches (S11 —
    ``request_classify``, adsmp/app.py:680-772).

    Auto mode (``request_list=None``): one request per record, exactly
    the reference's single-record path. Manual mode: ``request_list``
    carries (bibcode [, title, abstract]) rows — e.g. parsed from the
    reference's CSV file; rows with their own title/abstract use them,
    the rest look the record up (prepare_bibcode). Either way a request
    is emitted ONLY when a non-empty title results (:708, :741), title
    lists collapse to their first element (:715-717, :750-752), and
    manual requests batch into ``batch_size`` groups with the batch id
    in ``batch_idx`` (the reference's protobuf message boundary) and
    the source path in ``output_path`` (:755).

    Scale shape: one broadcast-able join + a narrow projection; the
    batch numbering reuses the distributed sequential assigner.
    """
    bib_title = F.coalesce(F.get_json_object("bib_data", "$.title[0]"),
                           F.get_json_object("bib_data", "$.title"))
    bib_abstract = F.get_json_object("bib_data", "$.abstract")

    if request_list is None:
        base = records.select(
            "bibcode", bib_title.alias("title"), bib_abstract.alias("abstract"))
        out = (base.where(F.col("title").isNotNull() & (F.col("title") != ""))
               .select("bibcode", "title", "abstract",
                       F.lit(operation_step).cast("string")
                       .alias("operation_step"),
                       F.lit(output_path).alias("output_path"),
                       F.lit(0).alias("batch_idx")))
        return out

    req = request_list
    for c in ("title", "abstract"):
        if c not in req.columns:
            req = req.withColumn(c, F.lit(None).cast("string"))
    lookup = records.select(
        "bibcode", bib_title.alias("_rec_title"),
        bib_abstract.alias("_rec_abstract"))
    has_own = (F.col("title").isNotNull() & (F.col("title") != "")) | \
              (F.col("abstract").isNotNull() & (F.col("abstract") != ""))
    joined = (
        req.join(lookup, "bibcode", "left")
        .select(
            "bibcode",
            F.when(has_own, F.col("title")).otherwise(F.col("_rec_title"))
            .alias("title"),
            F.when(has_own, F.col("abstract")).otherwise(F.col("_rec_abstract"))
            .alias("abstract"),
        )
        .where(F.col("title").isNotNull() & (F.col("title") != ""))
    )
    from .operators.assignment import assign_sequential
    return (
        assign_sequential(joined, "bibcode")
        .select("bibcode", "title", "abstract",
                F.lit(operation_step).cast("string").alias("operation_step"),
                F.lit(output_path).alias("output_path"),
                F.floor(F.col("seq") / batch_size).cast("int")
                .alias("batch_idx"))
    )


def write_outbox(requests: DataFrame, out_dir: str) -> None:
    requests.write.mode("overwrite").json(out_dir)
