"""Corpus-hygiene queries over ``operators/curation.py``: PII
scrubbing, quality-rule filtering, span-level dedup, and
source-mixture sampling — the cleaning stages of a training-data
pipeline, each oracle-checked against DuckDB.

The synthetic documents contain no real PII, so ``pii_scrub``
deterministically injects synthetic emails/phones/IPs derived from
``doc_id`` on BOTH sides before scrubbing — the operator under test is
the redaction, and the md5 of the cleaned text pins every replacement
position.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.curation import quality_rules, scrub_pii, span_dedup
from ..sources import load_table
from . import query

_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
_PHONE = r"\b\d{3}-\d{4}\b"


@query(
    "pii_scrub",
    f"""
    WITH aug AS (
      SELECT doc_id,
             text || ' contact user' || CAST(doc_id AS VARCHAR)
                  || '@mail.example.com or user' || CAST(doc_id AS VARCHAR)
                  || '@backup.example.org call 555-'
                  || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                  || ' ip 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.1' AS t
      FROM documents)
    SELECT doc_id,
           CAST(len(regexp_extract_all(t, '{_EMAIL}')) AS BIGINT) AS n_email,
           CAST(len(regexp_extract_all(t, '{_IPV4}')) AS BIGINT) AS n_ipv4,
           CAST(len(regexp_extract_all(t, '{_PHONE}')) AS BIGINT) AS n_phone,
           md5(regexp_replace(regexp_replace(regexp_replace(t,
               '{_EMAIL}', '<EMAIL>', 'g'),
               '{_IPV4}', '<IP>', 'g'),
               '{_PHONE}', '<PHONE>', 'g')) AS clean_md5
    FROM aug
    """,
    "corpus", "scrub",
    doc="PII redaction (operators/curation.scrub_pii): emails, IPv4s, "
        "phone numbers replaced by typed tokens, per-rule match counts "
        "kept for audit. Patterns restricted to the regex subset shared "
        "by java.util.regex and RE2 so both engines agree; narrow "
        "per-row plan, no shuffle.",
)
def pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    did = F.col("doc_id").cast("string")
    aug = d.select(
        "doc_id",
        F.concat(
            F.col("text"), F.lit(" contact user"), did,
            F.lit("@mail.example.com or user"), did,
            F.lit("@backup.example.org call 555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            F.lit(" ip 10.0."), (F.col("doc_id") % 256).cast("string"),
            F.lit(".1")).alias("text"))
    return scrub_pii(aug).select(
        "doc_id", "n_email", "n_ipv4", "n_phone",
        F.md5(F.col("clean_text")).alias("clean_md5"))


@query(
    "quality_rules_filter",
    """
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS words
               FROM documents),
    m AS (SELECT doc_id,
                 len(words) AS n_words,
                 list_aggregate(list_transform(words, w -> length(w)),
                                'sum') AS sum_len,
                 len(list_distinct(words)) AS n_uniq,
                 list_has_any(words, ['the', 'a']) AS has_stop
          FROM w)
    SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
           (n_words >= 20 AND n_words <= 1000
            AND sum_len * 10 >= n_words * 25
            AND sum_len * 10 <= n_words * 80
            AND n_uniq * 10 >= n_words * 3
            AND has_stop) AS keep,
           COALESCE(array_to_string(list_sort(list_filter(
             [CASE WHEN NOT (n_words >= 20 AND n_words <= 1000)
                   THEN 'word_count' END,
              CASE WHEN NOT (sum_len * 10 >= n_words * 25
                             AND sum_len * 10 <= n_words * 80)
                   THEN 'mean_word_len' END,
              CASE WHEN NOT (n_uniq * 10 >= n_words * 3)
                   THEN 'unique_ratio' END,
              CASE WHEN NOT has_stop THEN 'stopword' END],
             x -> x IS NOT NULL)), '|'), '') AS fail_reasons
    FROM m
    """,
    "corpus", "scrub",
    doc="Gopher-style quality gate (operators/curation.quality_rules): "
        "word-count bounds, mean-word-length band, unique-token ratio, "
        "stopword presence. Ratio thresholds are integer "
        "cross-products — no FP boundary for engines to disagree on; "
        "failed-rule names serialized sorted for the value hash.",
)
def quality_rules_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return quality_rules(d).select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_words"),
        "keep", "fail_reasons")


@query(
    "span_dedup_docs",
    """
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS words
               FROM documents),
    sp AS (SELECT doc_id, CAST(i AS INT) AS pos,
                  array_to_string(
                    words[(CAST(i AS INT) * 10 + 1):(CAST(i AS INT) * 10 + 10)],
                    ' ') AS span,
                  doc_id * 64 + i AS k
           FROM w, range(0, 64) r(i)
           WHERE i * 10 < len(words)),
    h AS (SELECT *, md5(span) AS hh FROM sp),
    f AS (SELECT hh, MIN(k) AS fk FROM h GROUP BY hh),
    kept AS (SELECT h.doc_id, h.pos, h.span
             FROM h JOIN f ON h.hh = f.hh AND h.k = f.fk),
    agg AS (SELECT doc_id, COUNT(*) AS n_kept,
                   string_agg(span, ' ' ORDER BY pos) AS clean
            FROM kept GROUP BY doc_id),
    tot AS (SELECT doc_id, CAST(CEIL(len(words) / 10.0) AS BIGINT) AS n_spans
            FROM w)
    SELECT t.doc_id, t.n_spans,
           CAST(COALESCE(a.n_kept, 0) AS BIGINT) AS n_kept,
           md5(COALESCE(a.clean, '')) AS clean_md5
    FROM tot t LEFT JOIN agg a ON t.doc_id = a.doc_id
    """,
    "corpus", "dedup",
    doc="Span-level corpus dedup (operators/curation.span_dedup, md5 "
        "twin of the xxhash64 scale path): 10-word spans survive only "
        "at their first corpus occurrence, documents reassembled from "
        "surviving spans. The clean_md5 pins the reconstructed text "
        "byte-for-byte; shuffle keys are span hashes, never span text.",
)
def span_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    out = span_dedup(d, span_words=10, max_spans=64, hash_fn=F.md5)
    return out.select(
        "doc_id", "n_spans", "n_kept",
        F.md5(F.col("clean_text")).alias("clean_md5"))


@query(
    "source_mixture_sample",
    r"""
    WITH rated AS (
      SELECT doc_id, source,
             CAST(regexp_extract(source, '(\d+)$', 1) AS INT) % 4 AS bucket,
             substr(md5(CAST(doc_id AS VARCHAR) || ':' || source), 1, 4) AS hp
      FROM documents)
    SELECT source, COUNT(*) AS n_total,
           CAST(SUM(CASE WHEN hp < CASE bucket WHEN 0 THEN '4000'
                                               WHEN 1 THEN '8000'
                                               WHEN 2 THEN 'c000'
                                               ELSE 'g' END
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
    FROM rated GROUP BY source
    """,
    "corpus", "sample",
    doc="Deterministic source-mixture sampling: per-source keep rates "
        "(25/50/75/100% by source index mod 4) applied via md5-prefix "
        "thresholds — reproducible across engines and cluster sizes, "
        "no RNG, narrow filter + one count aggregation. 'g' sorts "
        "after every hex prefix, so strict < keeps all (a 'ffff' "
        "threshold would drop prefix == 'ffff').",
)
def source_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    bucket = F.regexp_extract(F.col("source"), r"(\d+)$", 1).cast("int") % 4
    hp = F.substring(
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":"),
                       F.col("source"))), 1, 4)
    thr = (F.when(bucket == 0, "4000").when(bucket == 1, "8000")
           .when(bucket == 2, "c000").otherwise("g"))
    return (d.select("source", (hp < thr).cast("int").alias("kept"))
            .groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_total"),
                 F.sum("kept").cast("long").alias("n_kept")))
