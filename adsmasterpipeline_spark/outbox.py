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


def write_outbox(requests: DataFrame, out_dir: str) -> None:
    requests.write.mode("overwrite").json(out_dir)
