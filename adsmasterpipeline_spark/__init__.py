"""adsmasterpipeline_spark — a PySpark-native analytics engine with the
capabilities of adsabs/ADSMasterPipeline.

The reference (studied at /root/reference, cited per-module as
``file:line``) is a Celery + Postgres master-aggregation pipeline; this
package re-expresses its data model and every operator in SURVEY.md §2
as idiomatic Spark DataFrame/SQL plans:

- ``storage``      — keyed upsert/merge of payload events (M1-M8)
- ``transform``    — record → search-doc fusion (T1-T15, F1-F14)
- ``checksum``     — canonical-JSON CRC32 change suppression (F15)
- ``dispatch``     — readiness / incremental / checksum-diff (P2-P5, O1-O3)
- ``sitemap``      — window-function file assignment + XML render (W3-W4, S9-S10)
- ``identifiers``  — bibcode rename graph (M4-M5)
- ``validate``     — differential comparison with tolerances (J5, F18)
- ``operators``    — large-scale training-data ops (dedup, similarity,
                     text analysis, multimodal plumbing)
- ``streaming``    — Structured Streaming ingestion mode (§2.10)

Everything is DataFrame-first: no RDDs, no driver-side loops over rows.
"""

__version__ = "0.1.0"
