"""Corpus-hygiene operators for training-data pipelines: PII
scrubbing, rule-based quality filtering, and span-level deduplication.

All three are pure DataFrame plans — JVM-side regex / higher-order
functions, no Python UDFs — so they pipeline with the other corpus
stages (``operators/dedup.py``, ``queries/training.py``) without
leaving whole-stage codegen.

Scale notes (100 TB):
- ``scrub_pii`` / ``quality_rules`` are narrow (per-row) — no shuffle,
  fully parallel, regex runs inside codegen.
- ``span_dedup`` shuffles twice: once on the span *hash* (never the
  span text — keys are 8-16 byte hashes), once on the doc id to
  reassemble. Span hashes are near-uniform so neither shuffle skews;
  both decision shuffles carry only (id, pos, hash, key) proxy rows —
  clean_text is re-sliced from each doc's own word array at the
  surviving positions, so the text crosses the network at most once
  (the final reattach join). This is the standard line/paragraph-level
  dedup from large-corpus pipelines (CCNet, RefinedWeb) expressed as
  two grouped aggregations.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (rule name, Java/RE2-compatible pattern, replacement token).
# Patterns deliberately use only syntax shared by java.util.regex and
# RE2 (no backrefs, no lookaround) so DuckDB oracles can mirror them.
# Order matters: emails first (their domains contain dots that the
# IPv4 pattern must never see), then IPv4, then phone.
PII_RULES: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\b\d{3}-\d{4}\b", "<PHONE>"),
)


def scrub_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Redact PII spans and count matches per rule.

    Adds ``n_<rule>`` (long, matches found) per rule in ``PII_RULES``
    and ``clean_text`` (all rules applied in order). Counts are taken
    BEFORE redaction so overlapping rules report what they saw, not
    what survived the previous rule.
    """
    t = F.col(text_col)
    out = df
    for name, pat, _ in PII_RULES:
        out = out.withColumn(
            f"n_{name}", F.regexp_count(t, F.lit(pat)).cast("long"))
    cleaned = t
    for _, pat, repl in PII_RULES:
        cleaned = F.regexp_replace(cleaned, pat, repl)
    return out.withColumn("clean_text", cleaned)


# Gopher-style hygiene rules as (name, pass-predicate builder) over the
# tokenized text. All ratio thresholds are integer cross-products
# (sum_len * 10 >= n_words * 25, etc.) — exact in any engine, no
# floating-point boundary to disagree about.
def _quality_flags(words: Column) -> list[tuple[str, Column]]:
    n_words = F.size(words)
    sum_len = F.aggregate(
        words, F.lit(0), lambda acc, w: acc + F.length(w))
    n_uniq = F.size(F.array_distinct(words))
    return [
        ("word_count", (n_words >= 20) & (n_words <= 1000)),
        ("mean_word_len",
         (sum_len * 10 >= n_words * 25) & (sum_len * 10 <= n_words * 80)),
        ("unique_ratio", n_uniq * 10 >= n_words * 3),
        ("stopword", F.arrays_overlap(
            words, F.array(F.lit("the"), F.lit("a")))),
    ]


def quality_rules(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Rule-based quality gate (Gopher-style): word-count bounds, mean
    word length band, unique-token ratio, stopword presence.

    Adds ``keep`` (all rules pass) and ``fail_reasons`` (sorted
    '|'-joined names of failed rules, '' when kept) — serialized to a
    string because downstream consumers (and the correctness gate)
    want a hashable value, not an array.
    """
    words = F.split(F.col(text_col), " ")
    flags = _quality_flags(words)
    failed = F.array_sort(F.filter(
        F.array(*[F.when(~ok, F.lit(name)) for name, ok in flags]),
        lambda x: x.isNotNull()))
    keep = flags[0][1]
    for _, ok in flags[1:]:
        keep = keep & ok
    return (df.withColumn("keep", keep)
              .withColumn("fail_reasons", F.concat_ws("|", failed)))


def span_dedup(docs: DataFrame, text_col: str = "text",
               id_col: str = "doc_id", span_words: int = 10,
               max_spans: int = 64,
               hash_fn: Callable[[Column], Column] = F.xxhash64,
               ) -> DataFrame:
    """Corpus-global span-level exact dedup with text reconstruction.

    Documents are cut into consecutive ``span_words``-word spans; a
    span survives only at its first corpus occurrence (lowest
    (doc, position) key). Returns one row per input doc:
    (id, n_spans, n_kept, clean_text) where clean_text rejoins the
    surviving spans in original order ('' when every span was seen
    earlier elsewhere).

    ``hash_fn`` defaults to xxhash64 (JVM intrinsic); pass ``F.md5``
    for the oracle-checked twin — grouping on the hash keeps the
    shuffle key 8-16 bytes regardless of span length.

    ``max_spans`` bounds the per-doc fan-out and packs (doc, pos) into
    one long key; callers with documents longer than
    ``max_spans * span_words`` words should chunk upstream first.

    Dataflow: the survivorship DECISION runs entirely on lightweight
    proxy rows (id, pos, span-hash, packed key); ``clean_text`` is
    reconstructed per document by re-slicing the doc's own word array
    at the surviving positions (deterministic, so byte-identical to
    carrying the text through). The span text therefore crosses the
    network AT MOST ONCE — the final doc-id reattach join, and not at
    all when the kept-position table broadcasts — where the earlier
    form shipped it through three exchanges (hash join, doc-id
    reassembly groupBy, clean_text through the totals join), ~1.1x the
    corpus in bytes each, for a decision that needs ~24 bytes per
    span. Locally the rebuild costs ~+10% wall at sf0.1 (interpreted
    slice lambda per kept span); the shuffle-byte cut is the 100-TB
    lever.
    """
    words = F.split(F.col(text_col), " ")
    n_spans = F.greatest(
        F.ceil(F.size(words) / F.lit(span_words)), F.lit(1)).cast("int")
    span_at = lambda i: F.concat_ws(  # noqa: E731
        " ", F.slice(words, i * span_words + 1, span_words))
    # hash AFTER the explode (codegen'd, not inside an interpreted
    # higher-order lambda) and drop the span text in the same
    # projection — column pruning keeps it out of every exchange
    spans = docs.select(
        F.col(id_col),
        F.posexplode(F.transform(F.sequence(F.lit(0), n_spans - 1), span_at))
        .alias("pos", "span"))
    keyed = spans.select(
        id_col, "pos", hash_fn(F.col("span")).alias("h"),
        (F.col(id_col) * max_spans + F.col("pos")).alias("k"))
    firsts = keyed.groupBy("h").agg(F.min("k").alias("first_k"))
    kept_pos = (keyed.join(firsts, "h")
                .where(F.col("k") == F.col("first_k"))
                .groupBy(id_col)
                .agg(F.count(F.lit(1)).alias("n_kept"),
                     F.array_sort(F.collect_list("pos")).alias("_keep")))
    rebuilt = F.concat_ws(" ", F.transform(F.col("_keep"), span_at))
    return (docs.join(kept_pos, id_col, "left_outer")
            .select(
                F.col(id_col),
                n_spans.cast("long").alias("n_spans"),
                F.coalesce(F.col("n_kept"), F.lit(0)).cast("long")
                .alias("n_kept"),
                F.when(F.col("_keep").isNull(), F.lit(""))
                .otherwise(rebuilt).alias("clean_text")))
