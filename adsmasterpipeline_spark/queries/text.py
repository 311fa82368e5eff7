"""Text-analysis + deduplication operators over the ``documents``
table — the training-data-pipeline extensions (language-ID heuristic,
quality scoring, token counting, fingerprinting, n-gram Jaccard
near-dup, MinHash signatures, SimHash).

Scale design: everything here is a single scan + narrow projections
(no shuffle) except the Jaccard pair join, which runs as a PPJoin
prefix-filtered set-similarity join (exact — bit-identical to the
naive inverted-index join its oracle computes) with candidate
blocking (same source + close length). The approximate scale path for
near-dup at 100 TB is MinHash-LSH banding (`operators/dedup.py`),
which turns the O(n²) pair space into a band-bucket shuffle join.

Hash functions are chosen to be engine-portable: ``md5`` (identical in
Spark and DuckDB) rather than xxhash/crc32 (Spark-only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from . import query

# Tiny embedded stopword list: enough for ratio features on the
# synthetic corpus; a real deployment would broadcast a per-language list.
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it", "for", "on")

MINHASH_SEEDS = ("s0", "s1", "s2", "s3")


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


def _norm_text():
    """lower + collapse whitespace — shared normalizer for fingerprints."""
    return F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))


_NORM_SQL = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"


@query(
    "text_quality",
    f"""
    SELECT doc_id, lang,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
           CAST(length(text) AS BIGINT) AS n_chars_measured,
           ROUND(CAST(length(replace(text, ' ', '')) AS DOUBLE)
                 / len(string_split(text, ' ')), 4) AS avg_word_len,
           ROUND(CAST(len(list_filter(string_split(text, ' '),
                     x -> x IN {STOPWORDS!r})) AS DOUBLE)
                 / len(string_split(text, ' ')), 4) AS stopword_ratio,
           ROUND(CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9 ]')) AS DOUBLE)
                 / length(text), 4) AS punct_ratio
    FROM documents
    """,
    "textops",
    doc="Quality scoring: word count, average word length, stopword ratio, "
        "punctuation ratio — single-scan narrow projection.",
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    toks = F.split(F.col("text"), " ")
    n_words = F.size(toks).cast("long")
    stop_hits = F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS)))
    punct = F.size(F.regexp_extract_all(F.col("text"), F.lit("[^a-zA-Z0-9 ]"), 0))
    return d.select(
        "doc_id", "lang",
        n_words.alias("n_words"),
        F.length("text").cast("long").alias("n_chars_measured"),
        F.round(F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
                .cast("double") / n_words, 4).alias("avg_word_len"),
        F.round(stop_hits.cast("double") / n_words, 4).alias("stopword_ratio"),
        F.round(punct.cast("double") / F.length("text"), 4).alias("punct_ratio"),
    )


@query(
    "token_count",
    """
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
           CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]')) AS BIGINT)
             AS bpe_ish_tokens
    FROM documents
    """,
    "textops",
    doc="Token counting: whitespace tokens + BPE-ish regex tokens "
        "(alpha runs / digit runs / single punctuation).",
)
def token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    pat = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"
    return d.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("ws_tokens"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(pat), 0)).cast("long")
        .alias("bpe_ish_tokens"),
    )


# Marker tokens per language for the n-gram/stopword language-ID
# heuristic. On the synthetic corpus (shared vocabulary) this mostly
# predicts the fallback — the point is the operator shape, which is
# identical to a real character-n-gram scorer.
_LANG_MARKERS = {
    "en": ("the", "and", "of"),
    "es": ("el", "la", "de"),
    "de": ("der", "die", "und"),
    "fr": ("le", "la", "et"),
}


@query(
    "langid_heuristic",
    """
    WITH scored AS (
      SELECT doc_id, lang AS lang_label,
             len(list_filter(string_split(text, ' '), x -> x IN ('the','and','of'))) AS sc_en,
             len(list_filter(string_split(text, ' '), x -> x IN ('el','la','de')))   AS sc_es,
             len(list_filter(string_split(text, ' '), x -> x IN ('der','die','und'))) AS sc_de,
             len(list_filter(string_split(text, ' '), x -> x IN ('le','la','et')))   AS sc_fr
      FROM documents
    )
    SELECT doc_id, lang_label,
           CASE WHEN sc_en >= sc_es AND sc_en >= sc_de AND sc_en >= sc_fr AND sc_en > 0 THEN 'en'
                WHEN sc_es >= sc_de AND sc_es >= sc_fr AND sc_es > 0 THEN 'es'
                WHEN sc_de >= sc_fr AND sc_de > 0 THEN 'de'
                WHEN sc_fr > 0 THEN 'fr'
                ELSE 'unknown' END AS predicted_lang
    FROM scored
    """,
    "textops",
    doc="Language-ID heuristic: marker-token voting with deterministic "
        "tie-break order en > es > de > fr > unknown.",
)
def langid_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    toks = F.split(F.col("text"), " ")

    def _marker_hits(markers):
        return F.size(F.filter(toks, lambda x: x.isin(*markers)))

    sc = {lang: _marker_hits(markers) for lang, markers in _LANG_MARKERS.items()}
    pred = (
        F.when((sc["en"] >= sc["es"]) & (sc["en"] >= sc["de"]) & (sc["en"] >= sc["fr"])
               & (sc["en"] > 0), "en")
        .when((sc["es"] >= sc["de"]) & (sc["es"] >= sc["fr"]) & (sc["es"] > 0), "es")
        .when((sc["de"] >= sc["fr"]) & (sc["de"] > 0), "de")
        .when(sc["fr"] > 0, "fr")
        .otherwise("unknown")
    )
    return d.select("doc_id", F.col("lang").alias("lang_label"),
                    pred.alias("predicted_lang"))


@query(
    "doc_fingerprint",
    f"""
    SELECT doc_id, md5({_NORM_SQL}) AS fingerprint,
           CAST(length({_NORM_SQL}) AS BIGINT) AS norm_len
    FROM documents
    """,
    "textops", "dedup",
    doc="Document fingerprinting: md5 of whitespace-normalized lowercase text "
        "(engine-portable stand-in for a rolling hash; see operators/dedup.py "
        "for the xxhash64 scale variant).",
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    norm = _norm_text()
    return d.select(
        "doc_id",
        F.md5(norm).alias("fingerprint"),
        F.length(norm).cast("long").alias("norm_len"),
    )


@query(
    "dedup_exact",
    f"""
    WITH fp AS (SELECT doc_id, md5({_NORM_SQL}) AS fingerprint FROM documents)
    SELECT fingerprint, CAST(MIN(doc_id) AS BIGINT) AS keeper_doc_id,
           COUNT(*) AS group_size
    FROM fp GROUP BY fingerprint
    """,
    "dedup",
    doc="Exact deduplication: hash-groupBy on the normalized-text fingerprint, "
        "keep the lowest doc_id per group (P9/M6 duplicate detection shape, "
        "scripts/fix_db_duplicates.py:22-25). One shuffle on the hash key.",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    return (
        d.select("doc_id", F.md5(_norm_text()).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("keeper_doc_id"), F.count(F.lit(1)).alias("group_size"))
    )


@query(
    "minhash_signatures",
    f"""
    WITH tok AS (
      SELECT doc_id, unnest(list_distinct(string_split({_NORM_SQL}, ' '))) AS tok
      FROM documents
    )
    SELECT doc_id,
           MIN(md5('s0' || tok)) AS mh0, MIN(md5('s1' || tok)) AS mh1,
           MIN(md5('s2' || tok)) AS mh2, MIN(md5('s3' || tok)) AS mh3
    FROM tok GROUP BY doc_id
    """,
    "dedup",
    doc="MinHash signatures (k=4 seeded md5 permutations over the distinct "
        "token set). Shuffle: one explode + groupBy(doc_id) — at scale the "
        "explode stays partition-local and the agg is map-side combinable.",
)
def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    tok = d.select(
        "doc_id",
        F.explode(F.array_distinct(F.split(_norm_text(), " "))).alias("tok"),
    )
    aggs = [F.min(F.md5(F.concat(F.lit(s), F.col("tok")))).alias(f"mh{i}")
            for i, s in enumerate(MINHASH_SEEDS)]
    return tok.groupBy("doc_id").agg(*aggs)


@query(
    "simhash",
    f"""
    WITH tok AS (
      SELECT doc_id, unnest(list_distinct(string_split({_NORM_SQL}, ' '))) AS tok
      FROM documents
    ),
    bits AS (
      SELECT doc_id, md5(tok) AS h, COUNT(*) OVER (PARTITION BY doc_id) AS n
      FROM tok
    )
    SELECT doc_id,
           {", ".join(
               f"CASE WHEN SUM(CASE WHEN substr(h, {i + 1}, 1) IN "
               f"('8','9','a','b','c','d','e','f') THEN 1 ELSE 0 END) * 2 "
               f"> COUNT(*) THEN 1 ELSE 0 END AS bit{i}"
               for i in range(16))}
    FROM bits GROUP BY doc_id
    """,
    "dedup",
    doc="SimHash (16-bit, engine-portable): bit i = majority vote of the high "
        "bit of hex digit i of md5(token) over the doc's distinct tokens. "
        "Same single-shuffle profile as minhash_signatures.",
)
def simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    tok = d.select(
        "doc_id",
        F.explode(F.array_distinct(F.split(_norm_text(), " "))).alias("tok"),
    ).withColumn("h", F.md5("tok"))
    high = ("8", "9", "a", "b", "c", "d", "e", "f")
    aggs = []
    for i in range(16):
        vote = F.sum(F.when(F.substring("h", i + 1, 1).isin(*high), 1).otherwise(0))
        aggs.append(F.when(vote * 2 > F.count(F.lit(1)), 1).otherwise(0).alias(f"bit{i}"))
    return tok.groupBy("doc_id").agg(*aggs)


@query(
    "ngram_jaccard_pairs",
    f"""
    WITH tok AS (
      SELECT doc_id, source, n_chars,
             unnest(list_distinct(string_split({_NORM_SQL}, ' '))) AS tok
      FROM documents
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM tok GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
      FROM tok a JOIN tok b
        ON a.tok = b.tok AND a.source = b.source AND a.doc_id < b.doc_id
       AND abs(a.n_chars - b.n_chars) <= 30
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT i.doc_a, i.doc_b,
           ROUND(CAST(i.n_common AS DOUBLE) / (sa.sz + sb.sz - i.n_common), 4) AS jaccard
    FROM inter i
    JOIN sizes sa ON i.doc_a = sa.doc_id
    JOIN sizes sb ON i.doc_b = sb.doc_id
    WHERE 5 * i.n_common >= 3 * (sa.sz + sb.sz - i.n_common)
    """,
    "dedup",
    doc="Exact token-set Jaccard near-dup pairs (threshold 0.6) with "
        "candidate blocking (same source, |Δn_chars| ≤ 30), computed via "
        "PREFIX FILTERING (the AllPairs/PPJoin scheme): each document "
        "indexes only its |d| - ceil(0.6*|d|) + 1 globally-rarest tokens; "
        "any pair with J >= 0.6 must share a prefix token, so the "
        "inverted-index self-join runs on prefixes only and Zipfian hot "
        "tokens (which are never rare enough to enter a prefix) cannot "
        "create quadratic bucket blocks. Candidates are then verified "
        "with exact intersection counts over the FULL token sets — the "
        "output is bit-identical to the naive all-tokens join, which is "
        "exactly what the DuckDB oracle runs. Threshold compares "
        "5*inter >= 3*union in integer arithmetic on both engines.",
)
def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NO spread_small_scan here: the PPJoin's heavy work is
    # explode+aggregate, which parallelizes after its first exchange
    # anyway — the A/B measured the extra repartition as a small net
    # loss (1.06 s -> 1.14 s at sf0.1), unlike the array-fold queries
    return ppjoin_jaccard_pairs(_docs(spark, sf_dir), 3, 5) \
        .select("doc_a", "doc_b", "jaccard")


def ppjoin_jaccard_pairs(d: DataFrame, t_num: int, t_den: int,
                         materialize: str = "cache",
                         block: bool = True,
                         norm_col: str | None = None) -> DataFrame:
    """Exact token-set Jaccard pairs at threshold ``t_num/t_den`` via
    PPJoin prefix filtering; with ``block`` (default), candidates are
    additionally restricted to same-source + |Δn_chars| ≤ 30. Output
    (doc_a, doc_b, n_common, sz_a, sz_b, jaccard) is bit-identical to
    the naive inverted-index join at the same threshold (and same
    blocking) — only the candidate space shrinks. ``norm_col`` names
    an already-normalized text column (skips ``_norm_text``) so
    pipeline stages that normalized upstream can reuse this join —
    the 10x-stress run measured the naive join at 300s vs 13s here,
    so every exact-Jaccard stage must come through this path.

    ``materialize`` pins the prefix table before the self-join (same
    knob as ``minhash_lsh_pairs``): "cache" keeps deserialized batches
    in executor memory — fastest, but the table stays in the catalog
    for the session (measured ~1.5x on the pair join vs checkpoint);
    "checkpoint" severs lineage and frees blocks on GC — the cluster
    option and the right choice for one-shot callers."""
    from pyspark.sql import Window as W
    norm = F.col(norm_col) if norm_col else _norm_text()
    meta = ["source", "n_chars"] if block else []
    tok = d.select(
        "doc_id", *meta,
        F.explode(F.array_distinct(F.split(norm, " "))).alias("tok"),
    )
    # global token rarity + per-doc rank by (df asc, tok) — the prefix
    # of each doc is its rarest tokens under a deterministic total order
    dfc = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("dfc"))
    w_doc = W.partitionBy("doc_id").orderBy("dfc", "tok")
    # NO broadcast hint on the token-DF dictionary: its cardinality is
    # the corpus-wide distinct-token count (billions at 100 TB — typos,
    # numbers, URLs), which would OOM every executor as a broadcast
    # build side. The join key is the same ``tok`` the groupBy above
    # already shuffled on, so the shuffled-hash/sort-merge join reuses
    # that partitioning; the prefix-filter math needs no hint.
    # A count(*) WINDOW over tok (the shingle-containment form) was
    # A/B'd at 0.93 s vs 1.02 s here but REJECTED for this path: token
    # df is Zipfian ("the" appears in ~every doc), and a window
    # partition is unsplittable — one corpus-hot token would pin ~n_docs
    # rows on a single task at 100 TB, while this join form map-side-
    # combines the count and leaves the hot key in an AQE-skew-
    # splittable join.
    ranked = (
        tok.join(dfc, "tok")
        .withColumn("rnk", F.row_number().over(w_doc))
        .withColumn("sz", F.count(F.lit(1)).over(W.partitionBy("doc_id")))
    )
    # prefix length |d| - ceil(t|d|) + 1, in integer arithmetic:
    # ceil(n*sz/d) == (n*sz + d - 1) div d
    plen = (F.col("sz")
            - F.floor((t_num * F.col("sz") + t_den - 1) / t_den) + 1)
    prefix = ranked.where(F.col("rnk") <= plen) \
        .select("doc_id", *meta, "tok", "rnk", "sz")
    # both self-join branches reference the prefix subtree (explode +
    # df join + two windows) — materialize it once; at cluster scale
    # this pin is a real checkpoint of ~40% of the token rows
    if materialize == "cache":
        prefix = prefix.cache()
        prefix.count()
    elif materialize == "checkpoint":
        prefix = prefix.localCheckpoint(eager=True)
    else:
        raise ValueError(f"materialize must be cache|checkpoint, "
                         f"got {materialize!r}")

    # PPJoin filters, both exact: length filter (J>=t forces
    # n*sz_a <= d*sz_b and vice versa) and positional filter (tokens
    # after this shared prefix position cap the best-possible overlap
    # below alpha = ceil(t/(1+t)*(sz_a+sz_b)) -> prune)
    a, b = prefix.alias("a"), prefix.alias("b")
    alpha = F.floor((t_num * (F.col("a.sz") + F.col("b.sz"))
                     + t_num + t_den - 1) / (t_num + t_den))
    best_overlap = 1 + F.least(F.col("a.sz") - F.col("a.rnk"),
                               F.col("b.sz") - F.col("b.rnk"))
    cond = ((F.col("a.tok") == F.col("b.tok"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & (t_num * F.col("a.sz") <= t_den * F.col("b.sz"))
            & (t_num * F.col("b.sz") <= t_den * F.col("a.sz"))
            & (best_overlap >= alpha))
    if block:
        cond = (cond
                & (F.col("a.source") == F.col("b.source"))
                & (F.abs(F.col("a.n_chars") - F.col("b.n_chars")) <= 30))
    cand = (
        a.join(b, cond)
        .select(F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"))
        .dropDuplicates(["doc_a", "doc_b"])
    )
    # verify candidates with exact intersection over FULL token sets —
    # per-row array_intersect on the two (narrowly joined) token arrays,
    # no second explode join; the candidate set is already small
    arrs = d.select("doc_id",
                    F.array_distinct(F.split(norm, " ")).alias("_arr"))
    verified = (
        cand.join(arrs.select(F.col("doc_id").alias("doc_a"),
                              F.col("_arr").alias("arr_a")), "doc_a")
        .join(arrs.select(F.col("doc_id").alias("doc_b"),
                          F.col("_arr").alias("arr_b")), "doc_b")
        .select("doc_a", "doc_b",
                F.size(F.array_intersect("arr_a", "arr_b")).alias("n_common"),
                F.size("arr_a").alias("sz_a"), F.size("arr_b").alias("sz_b"))
    )
    union_sz = F.col("sz_a") + F.col("sz_b") - F.col("n_common")
    jac = F.col("n_common").cast("double") / union_sz
    return (
        verified.where(t_den * F.col("n_common") >= t_num * union_sz)
        .select("doc_a", "doc_b", "n_common", "sz_a", "sz_b",
                F.round(jac, 4).alias("jaccard"))
    )


@query(
    "tfidf_top_terms",
    f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split({_NORM_SQL}, ' ')) AS term
      FROM documents
    ),
    tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term
    ),
    df AS (
      SELECT term, COUNT(*) AS dfc FROM tf GROUP BY term
    ),
    scored AS (
      SELECT tf.doc_id, tf.term, tf.tf, df.dfc,
             (CAST(tf.tf AS DOUBLE) * (SELECT COUNT(*) FROM documents))
               / df.dfc AS score
      FROM tf JOIN df ON tf.term = df.term
    )
    SELECT doc_id, term, CAST(tf AS BIGINT) AS tf,
           CAST(dfc AS BIGINT) AS dfc,
           CAST(FLOOR(score * 1000) AS BIGINT) AS score_e3
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                       ORDER BY score DESC, term) AS r
          FROM scored)
    WHERE r <= 3
    """,
    "textops",
    doc="Top-3 characteristic terms per document by tf-idf with log-free "
        "rarity weighting (tf * N/df): libm log() is not bit-identical "
        "across engines, and the RANKING is the product here — the "
        "monotone transform doesn't change it for single-term scores. "
        "Shuffle profile: explode -> (doc, term) agg -> term-keyed df "
        "agg broadcast back -> per-doc top-k window; term df table is "
        "vocabulary-sized (small), documents never pairwise join.",
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W
    d = _docs(spark, sf_dir)
    n_docs = d.count()  # scalar: one cheap count-star job, no collect of rows
    tok = d.select("doc_id", F.explode(F.split(_norm_text(), " ")).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfc = tf.groupBy("term").agg(F.count(F.lit(1)).alias("dfc"))
    scored = (tf.join(F.broadcast(dfc), "term")
              .withColumn("score",
                          (F.col("tf").cast("double") * n_docs) / F.col("dfc")))
    w = W.partitionBy("doc_id").orderBy(F.col("score").desc(), "term")
    return (scored.withColumn("r", F.row_number().over(w))
            .where(F.col("r") <= 3)
            .select("doc_id", "term",
                    F.col("tf").cast("long").alias("tf"),
                    F.col("dfc").cast("long").alias("dfc"),
                    F.floor(F.col("score") * 1000).cast("long")
                    .alias("score_e3")))


@query(
    "incremental_dedup",
    f"""
    WITH fp_all AS (
      SELECT doc_id, md5({_NORM_SQL}) AS fingerprint FROM documents
    ),
    corpus AS (
      SELECT fingerprint, MIN(doc_id) AS keeper
      FROM fp_all WHERE doc_id % 2 = 0 GROUP BY fingerprint
    ),
    batch AS (SELECT * FROM fp_all WHERE doc_id % 2 = 1),
    bk AS (
      SELECT fingerprint, MIN(doc_id) AS batch_keeper
      FROM batch GROUP BY fingerprint
    )
    SELECT b.doc_id, b.fingerprint,
           COALESCE(c.keeper,
                    CASE WHEN b.doc_id <> k.batch_keeper
                         THEN k.batch_keeper END) AS duplicate_of,
           CAST(CASE WHEN c.keeper IS NULL AND b.doc_id = k.batch_keeper
                THEN 1 ELSE 0 END AS BIGINT) AS is_new_unique
    FROM batch b
    LEFT JOIN corpus c ON b.fingerprint = c.fingerprint
    JOIN bk k ON b.fingerprint = k.fingerprint
    """,
    "dedup", "scale",
    doc="Incremental dedup — the operational mode at 100 TB: a new batch "
        "is checked against the persisted (fingerprint, keeper) corpus "
        "state instead of recomputing the corpus (even docs stand in for "
        "the corpus, odd docs for the day's batch). Corpus text is never "
        "rescanned; the batch side is small so it broadcasts against the "
        "bucketed fingerprint table. Batch-internal duplicates resolve "
        "to the smallest batch id; is_new_unique marks rows that extend "
        "the state. Engine-portable md5 twin of the xxhash64 operator "
        "(operators/dedup.incremental_dedup).",
)
def incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import incremental_dedup as op, normalize_text
    d = _docs(spark, sf_dir)
    old = d.where(F.col("doc_id") % 2 == 0)
    new = d.where(F.col("doc_id") % 2 == 1)
    corpus_fps = (old.select("doc_id",
                             F.md5(normalize_text(F.col("text")))
                             .alias("fingerprint"))
                  .groupBy("fingerprint")
                  .agg(F.min("doc_id").alias("keeper")))
    out = op(new, corpus_fps, hash_fn=F.md5)
    return out.select(
        "doc_id", "fingerprint", "duplicate_of",
        F.when(F.col("is_new_unique"), 1).otherwise(0).cast("long")
        .alias("is_new_unique"))


@query(
    "bm25_topdf_terms",
    f"""
    WITH base AS (
      SELECT doc_id, string_split({_NORM_SQL}, ' ') AS w FROM documents
    ),
    toks AS (
      SELECT doc_id, tok FROM (
        SELECT doc_id, unnest(w) AS tok FROM base) WHERE tok <> ''
    ),
    stats AS (
      SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
             CAST(COUNT(*) AS BIGINT) AS n_tokens
      FROM toks
    ),
    dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl
           FROM toks GROUP BY doc_id),
    df AS (SELECT tok, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
           FROM toks GROUP BY tok),
    qterms AS (
      SELECT tok, df FROM df
      ORDER BY df DESC, tok LIMIT 3
    ),
    tf AS (
      SELECT t.doc_id, t.tok, CAST(COUNT(*) AS BIGINT) AS tf
      FROM toks t JOIN qterms q ON t.tok = q.tok
      GROUP BY t.doc_id, t.tok
    ),
    scored AS (
      SELECT tf.doc_id,
             ROUND(
               LN(1.0 + (stats.n_docs - q.df + 0.5) / (q.df + 0.5))
               * (tf.tf * 2.2)
               / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl
                                 / (CAST(stats.n_tokens AS DOUBLE)
                                    / stats.n_docs))),
               6) AS s
      FROM tf
      JOIN qterms q ON tf.tok = q.tok
      JOIN dl ON tf.doc_id = dl.doc_id, stats
    )
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_terms_matched,
           ROUND(SUM(s), 4) AS bm25
    FROM scored GROUP BY doc_id
    QUALIFY ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) <= 50
    """,
    "textops", "corpus",
    doc="BM25 retrieval scoring (k1=1.2, b=0.75, Lucene idf) of every "
        "document against a deterministic query — the corpus's top-3 "
        "document-frequency terms (df desc, token asc). The classic "
        "inverted-index shape in dataflow form: token postings join a "
        "3-row broadcast query-term table, so only matching (doc, term) "
        "rows flow; per-(doc,term) partial scores round to 6 dp before "
        "the per-doc sum (<= 3 addends), final score to 4 dp, top-50 by "
        "(score, doc_id) via DISTRIBUTED TopK (orderBy+limit compiles "
        "to TakeOrderedAndProject — per-partition heaps, no "
        "single-partition sort of the corpus-sized scored table). The "
        "corpus stats (N, avgdl) are one-row broadcasts of exact "
        "integer counts. At 100 TB the postings join shuffles only "
        "term-matched rows — the text never moves.",
)
def bm25_topdf_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = (d.select("doc_id",
                     F.explode(F.split(_norm_text(), " ")).alias("tok"))
            .where(F.col("tok") != ""))
    stats = toks.agg(
        F.countDistinct("doc_id").cast("long").alias("n_docs"),
        F.count(F.lit(1)).cast("long").alias("n_tokens"))
    dl = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("dl"))
    df_t = toks.groupBy("tok").agg(
        F.countDistinct("doc_id").cast("long").alias("df"))
    qterms = (df_t.orderBy(F.col("df").desc(), "tok").limit(3))
    tf = (toks.join(F.broadcast(qterms.select("tok")), "tok")
          .groupBy("doc_id", "tok").agg(F.count(F.lit(1)).cast("long")
                                        .alias("tf")))
    avgdl = F.col("n_tokens").cast("double") / F.col("n_docs")
    s = F.round(
        F.log(1.0 + (F.col("n_docs") - F.col("df") + 0.5)
              / (F.col("df") + 0.5))
        * (F.col("tf") * 2.2)
        / (F.col("tf") + 1.2 * (0.25 + 0.75 * F.col("dl") / avgdl)),
        6)
    scored = (tf.join(F.broadcast(qterms), "tok")
              .join(dl, "doc_id")
              .crossJoin(F.broadcast(stats))
              .select("doc_id", s.alias("s")))
    agg = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_terms_matched"),
        F.round(F.sum("s"), 4).alias("bm25"))
    # distributed TopK (TakeOrderedAndProject): the scored table is
    # corpus-sized (top-DF terms match most docs) — per-partition
    # 50-row heaps, never a single-partition global sort
    return agg.orderBy(F.col("bm25").desc(), "doc_id").limit(50)


@query(
    "winnow_fingerprints",
    f"""
    WITH base AS (
      SELECT doc_id, string_split({_NORM_SQL}, ' ') AS w,
             {_NORM_SQL} AS norm
      FROM documents
    ),
    gsets AS (
      SELECT doc_id,
             CASE WHEN len(w) >= 5
                  THEN list_transform(range(1, len(w) - 3),
                       i -> md5(w[i] || ' ' || w[i + 1] || ' ' || w[i + 2]
                                || ' ' || w[i + 3] || ' ' || w[i + 4]))
                  ELSE [md5(norm)] END AS g
      FROM base
    ),
    grams AS (
      SELECT doc_id, len(g) AS n_grams, unnest(g) AS h,
             unnest(range(1, len(g) + 1)) AS pos
      FROM gsets
    ),
    wins AS (
      SELECT doc_id, n_grams,
             MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
                          ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS mh,
             pos
      FROM grams
      QUALIFY pos <= GREATEST(n_grams - 3, 1)
    ),
    sel AS (SELECT DISTINCT doc_id, n_grams, mh FROM wins)
    SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams,
           CAST(COUNT(*) AS BIGINT) AS n_fingerprints,
           md5(string_agg(mh, ',' ORDER BY mh)) AS fp_sig
    FROM sel GROUP BY doc_id, n_grams
    """,
    "textops", "dedup",
    doc="Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, "
        "the MOSS algorithm): md5 each word 5-gram, slide a 4-gram "
        "window over the hash sequence, keep each window's minimum — "
        "guarantees any shared run of >= 8 words contributes a shared "
        "fingerprint, with ~1/4 the storage of full shingling. Hash "
        "order is md5-hex lexicographic (engine-portable, no numeric "
        "conversion); the selected set serializes to one md5 signature "
        "per doc. One explode + one bounded window per doc + a "
        "distinct — shuffle keys are (doc, 32-char hash) rows. Docs "
        "shorter than the gram width fall back to whole-text md5, same "
        "as the shingle operators.",
)
def winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W
    d = load_table(spark, sf_dir, "documents")
    w = F.split(_norm_text(), " ")
    gsets = d.select(
        "doc_id", w.alias("w"), _norm_text().alias("norm")
    ).select(
        "doc_id",
        F.when(F.size("w") >= 5,
               F.transform(F.sequence(F.lit(1), F.size("w") - 4),
                           lambda i: F.md5(F.concat_ws(
                               " ", F.element_at("w", i),
                               F.element_at("w", i + 1),
                               F.element_at("w", i + 2),
                               F.element_at("w", i + 3),
                               F.element_at("w", i + 4)))))
        .otherwise(F.array(F.md5("norm"))).alias("g"))
    # The whole selection is per-document, so it never needs to leave
    # the row: the sliding 4-window minimum over the hash sequence is
    # array_min(slice(g, i, 4)) (slice clips at the array end exactly
    # like the ROWS frame), the DISTINCT is array_distinct, and the
    # signature sorts the distinct set — all array HOFs on one scan.
    # The explode + doc-keyed window + distinct + groupBy form this
    # replaces shuffled corpus-sized gram rows three times for the
    # same values.
    n = F.size("g")
    mh = F.transform(
        F.sequence(F.lit(1), F.greatest(n - 3, F.lit(1))),
        lambda i: F.array_min(F.slice(F.col("g"), i, F.lit(4))))
    sel = gsets.select(
        "doc_id", n.cast("long").alias("n_grams"),
        F.array_distinct(mh).alias("_mhs"))
    return sel.select(
        "doc_id", "n_grams",
        F.size("_mhs").cast("long").alias("n_fingerprints"),
        F.md5(F.concat_ws(",", F.array_sort("_mhs"))).alias("fp_sig"))


@query(
    "inverted_index_topdf",
    f"""
    WITH toks AS (
      SELECT doc_id, tok FROM (
        SELECT doc_id, unnest(string_split({_NORM_SQL}, ' ')) AS tok
        FROM documents
      ) WHERE tok <> ''
    ),
    tf AS (SELECT tok, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
           FROM toks GROUP BY tok, doc_id),
    df AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df,
                  CAST(SUM(tf) AS BIGINT) AS cf
           FROM tf GROUP BY tok),
    top AS (SELECT tok, df, cf FROM df ORDER BY df DESC, tok LIMIT 32)
    SELECT t.tok AS term, t.df, t.cf,
           md5(string_agg(tf.doc_id || ':' || tf.tf, ','
                          ORDER BY tf.doc_id)) AS postings_sig
    FROM top t JOIN tf ON tf.tok = t.tok
    GROUP BY t.tok, t.df, t.cf
    """,
    "textops", "scale",
    doc="Inverted-index build (the retrieval-index counterpart of "
        "bm25_topdf_terms' scoring): per-term document frequency, "
        "collection frequency, and the full postings list "
        "(doc_id:tf pairs in doc order) md5-signed, for the corpus's "
        "top-32 DF terms. Scale shape: postings shuffle keyed on the "
        "TERM (the classic index-build partitioning — map-side "
        "combinable tf aggregate, then term-keyed assembly); the "
        "term selection is distributed TopK (TakeOrderedAndProject). "
        "At 100 TB a production index range-shards each hot term's "
        "postings by doc-id block before assembly — same plan keyed "
        "on (term, doc_id DIV B); the md5 signature stands in for the "
        "serialized posting block a real index would write.",
)
def inverted_index_topdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = (d.select("doc_id",
                     F.explode(F.split(_norm_text(), " ")).alias("tok"))
            .where(F.col("tok") != ""))
    tf = (toks.groupBy("tok", "doc_id")
          .agg(F.count(F.lit(1)).cast("long").alias("tf")))
    df_t = tf.groupBy("tok").agg(
        F.count(F.lit(1)).cast("long").alias("df"),
        F.sum("tf").cast("long").alias("cf"))
    top = df_t.orderBy(F.col("df").desc(), "tok").limit(32)
    postings = F.md5(F.concat_ws(",", F.transform(
        F.array_sort(F.collect_list(F.struct("doc_id", "tf"))),
        lambda s: F.concat_ws(":", s.getField("doc_id").cast("string"),
                              s.getField("tf").cast("string")))))
    return (tf.join(F.broadcast(top), "tok")
            .groupBy(F.col("tok").alias("term"), "df", "cf")
            .agg(postings.alias("postings_sig")))


@query(
    "shingle_containment_pairs",
    f"""
    WITH w AS (
      SELECT doc_id, string_split({_NORM_SQL}, ' ') AS w FROM documents
    ),
    tok AS (
      SELECT doc_id,
             unnest(list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                                   for i in range(1, len(w) - 1)])) AS sh
      FROM w WHERE len(w) >= 3
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM tok GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
      FROM tok a JOIN tok b ON a.sh = b.sh AND a.doc_id <> b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT i.doc_a, i.doc_b, i.n_common, sa.sz AS sz_a,
           ROUND(CAST(i.n_common AS DOUBLE) / sa.sz, 4) AS containment
    FROM inter i JOIN sizes sa ON i.doc_a = sa.doc_id
    WHERE 10 * i.n_common >= 9 * sa.sz
    """,
    "dedup", "text",
    doc="ASYMMETRIC shingle containment join (Broder's containment "
        "C(a->b) = |S_a n S_b| / |S_a| on 3-gram shingles, threshold "
        "0.9): detects quotes/subsets the SYMMETRIC Jaccard join "
        "misses — a short document wholly embedded in a long one has "
        "low Jaccard but containment 1.0. Directed pairs (a->b and "
        "b->a are distinct findings). Scale shape: the probe side "
        "indexes only its |S_a| - ceil(0.9|S_a|) + 1 globally-rarest "
        "shingles (the prefix-filter bound specialized to containment "
        "— any qualifying pair must share a probe-prefix shingle), "
        "the index side stays full but shingle df is near-1 on real "
        "text, so hot-key blocks cannot form on the probe side; "
        "candidates verify with exact intersection over full shingle "
        "sets, bit-identical to the naive join the oracle runs. "
        "Integer threshold arithmetic (10*n >= 9*sz) on both engines.",
)
def shingle_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from ..operators.dedup import shingles
    from ..operators.skew import spread_small_scan

    # input-skew fix (guide §2.5): the interpreted shingle fold below
    # otherwise runs on the local tier's single parquet split
    d = spread_small_scan(_docs(spark, sf_dir).select("doc_id", "text"))
    t_num, t_den = 9, 10
    base = (d.select("doc_id", shingles(F.col("text"), 3).alias("_sh"),
                     F.size(F.split(_norm_text(), " ")).alias("_nw"))
            .where(F.col("_nw") >= 3)
            .select("doc_id", "_sh"))
    # the shingle subtree feeds the df count, the rank join, the index
    # side AND verification — Catalyst does not CSE it across outputs
    # (SCALE.md minhash lesson 4), so materialize ONCE: measured 4.5s
    # -> ~1.5s at sf0.1. The pin is CORPUS-scale (per-doc shingle
    # arrays), so it is size-guarded (VERDICT r11 #3): above the
    # budget the branches recompute instead of pinning ~1x corpus
    from ..operators.pinning import pin_if_bounded
    base = pin_if_bounded(base, sf_dir, "documents")
    # sz is derived AFTER the checkpoint: selecting size("_sh") in the
    # same projection chain collapses into size(<shingle chain>) —
    # CollapseProject inlines the alias, so the interpreted HOF chain
    # ran TWICE per row before materialization (measured 2.7 s vs
    # 0.9 s for the checkpointed scan at sf0.1). From the materialized
    # column it is an O(1) array-length read.
    base = base.select("doc_id", "_sh", F.size("_sh").alias("sz"))
    tok = base.select("doc_id", "sz", F.explode("_sh").alias("sh"))
    # shingle df as a WINDOW count over sh instead of groupBy+join-back:
    # the join form shuffled the token table by sh TWICE (once map-side-
    # combined for the aggregate, once for the join probe); the window
    # shuffles it once and the count is the identical integer (A/B at
    # sf0.1: 1.88 s -> 1.60 s best-of-3, oracle-equal rows). Skew note:
    # a window partition is unsplittable, which is safe HERE because
    # 3-gram shingle df is near-1 on real text (the docstring's hot-key
    # argument) — for a Zipfian key like raw tokens the groupBy+join
    # form with AQE skew-split is the right shape (see ppjoin_jaccard_
    # pairs, where the window was A/B'd and rejected for exactly that)
    w_doc = W.partitionBy("doc_id").orderBy("dfc", "sh")
    ranked = (tok.withColumn("dfc", F.count(F.lit(1))
                             .over(W.partitionBy("sh")))
              .withColumn("rnk", F.row_number().over(w_doc)))
    # containment prefix bound (probe side only): a pair with
    # C >= t must share one of a's sz - ceil(t*sz) + 1 rarest
    # shingles with ANY shingle of b — so b is indexed in full
    plen = (F.col("sz")
            - F.floor((t_num * F.col("sz") + t_den - 1) / t_den) + 1)
    probe = (ranked.where(F.col("rnk") <= plen)
             .select(F.col("doc_id").alias("doc_a"),
                     F.col("sz").alias("sz_a"), "sh"))
    index = tok.select(F.col("doc_id").alias("doc_b"),
                       F.col("sz").alias("sz_b"), "sh")
    # length filter: n_common <= sz_b and n_common >= ceil(t*sz_a)
    # jointly force t_den*sz_b >= t_num*sz_a
    cand = (probe.join(index, "sh")
            .where((F.col("doc_a") != F.col("doc_b"))
                   & (t_den * F.col("sz_b") >= t_num * F.col("sz_a")))
            .select("doc_a", "doc_b")
            .dropDuplicates(["doc_a", "doc_b"]))
    arrs = base.select("doc_id", "_sh")
    verified = (
        cand.join(arrs.select(F.col("doc_id").alias("doc_a"),
                              F.col("_sh").alias("arr_a")), "doc_a")
        .join(arrs.select(F.col("doc_id").alias("doc_b"),
                          F.col("_sh").alias("arr_b")), "doc_b")
        .select("doc_a", "doc_b",
                F.size(F.array_intersect("arr_a", "arr_b"))
                .cast("long").alias("n_common"),
                F.size("arr_a").cast("long").alias("sz_a")))
    return (verified
            .where(t_den * F.col("n_common") >= t_num * F.col("sz_a"))
            .select("doc_a", "doc_b", "n_common", "sz_a",
                    F.round(F.col("n_common") / F.col("sz_a"), 4)
                    .alias("containment")))


@query(
    "distinct_ngram_diversity",
    f"""
    WITH w AS (
      SELECT source, string_split({_NORM_SQL}, ' ') AS w FROM documents
    ),
    sh AS (
      SELECT source,
             unnest([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                     for i in range(1, len(w) - 1)]) AS sh
      FROM w WHERE len(w) >= 3
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS total_ngrams,
           CAST(COUNT(DISTINCT sh) AS BIGINT) AS distinct_ngrams,
           ROUND(CAST(COUNT(DISTINCT sh) AS DOUBLE) / COUNT(*), 4)
             AS distinct_ratio
    FROM sh GROUP BY source
    """,
    "text", "training",
    doc="Distinct-n corpus diversity per source (the distinct-3 "
        "metric from text-generation evaluation, applied to corpus "
        "curation): total vs distinct 3-gram occurrences — a LOW "
        "ratio flags template/boilerplate-heavy sources worth "
        "down-weighting before training. One explode + one "
        "map-side-combinable groupBy; count_distinct shuffles "
        "(source, shingle) pairs once. 100 TB posture: identical to "
        "token_count's — no joins, no windows.",
)
def distinct_ngram_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import shingles

    d = _docs(spark, sf_dir)
    w = F.split(_norm_text(), " ")
    # NON-distinct shingles (diversity counts occurrences); the
    # len(w) >= 3 gate keeps the short-doc fallback branch unreached,
    # matching the oracle's WHERE len(w) >= 3
    sh = (d.where(F.size(w) >= 3)
          .select("source", F.explode(
              shingles(F.col("text"), 3, distinct=False)).alias("sh")))
    return sh.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("total_ngrams"),
        F.count_distinct("sh").cast("long").alias("distinct_ngrams"),
        F.round(F.count_distinct("sh") / F.count(F.lit(1)), 4)
        .alias("distinct_ratio"))
