"""Training-corpus curation operators beyond dedup: repetition-based
quality signals, benchmark decontamination, deterministic stratified
sampling, sequence packing, and token-budget accounting.

These are the remaining stages of a large-scale LLM-data pipeline
(after cleaning + dedup, before tokenization): drop repetitive junk,
remove benchmark contamination, rebalance the language mix, pack
documents into fixed-size training sequences, and account for the
token budget. Every query is a narrow scan + hash shuffles on small
keys; nothing is all-pairs and nothing collects to the driver.

Cross-engine determinism: ratios are emitted as FLOOR-scaled integers
(parts-per-million) — floor of an identical IEEE double is identical
in Spark and DuckDB, unlike ROUND at half-boundaries; sampling
decisions compare md5 hex prefixes lexicographically (no RNG).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..sources import load_table
from . import query
# the normalizer must stay bit-identical across every Spark/oracle
# pair — single definition in queries/text.py
from .text import _NORM_SQL, _norm_text


def _ppm(num, den):
    """FLOOR(num * 1e6 / den) as BIGINT — identical in both engines."""
    return F.floor(num.cast("double") * 1000000.0 / den).cast("long")


@query(
    "repetition_quality",
    f"""
    WITH base AS (
      SELECT doc_id, string_split({_NORM_SQL}, ' ') AS w FROM documents
    ),
    words AS (
      SELECT doc_id, unnest(w) AS tok FROM base
    ),
    wc AS (
      SELECT doc_id, tok, COUNT(*) AS c FROM words GROUP BY doc_id, tok
    ),
    wstats AS (
      SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_words,
             COUNT(*) AS n_distinct_words,
             CAST(MAX(c) AS BIGINT) AS top_word_cnt
      FROM wc GROUP BY doc_id
    ),
    bigrams AS (
      SELECT doc_id,
             unnest(CASE WHEN len(w) >= 2
                    THEN list_transform(range(1, len(w)),
                                        i -> w[i] || ' ' || w[i + 1])
                    ELSE [] END) AS bg
      FROM base
    ),
    bc AS (
      SELECT doc_id, bg, COUNT(*) AS c FROM bigrams GROUP BY doc_id, bg
    ),
    bstats AS (
      SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_bigrams,
             CAST(MAX(c) AS BIGINT) AS top_bigram_cnt
      FROM bc GROUP BY doc_id
    )
    SELECT ws.doc_id, ws.n_words, ws.n_distinct_words,
           CAST(FLOOR(CAST(ws.n_words - ws.n_distinct_words AS DOUBLE)
                      * 1000000.0 / ws.n_words) AS BIGINT) AS dup_word_ppm,
           CAST(FLOOR(CAST(ws.top_word_cnt AS DOUBLE)
                      * 1000000.0 / ws.n_words) AS BIGINT) AS top_word_ppm,
           CAST(CASE WHEN bs.n_bigrams IS NULL OR bs.n_bigrams = 0 THEN 0
                ELSE FLOOR(CAST(bs.top_bigram_cnt AS DOUBLE)
                           * 1000000.0 / bs.n_bigrams) END AS BIGINT)
             AS top_bigram_ppm
    FROM wstats ws LEFT JOIN bstats bs ON ws.doc_id = bs.doc_id
    """,
    "textops", "corpus",
    doc="Repetition-based quality signals (the Gopher/MassiveText rules): "
        "duplicate-word fraction, most-frequent-word fraction, and "
        "most-frequent-bigram fraction per document, as floor-scaled "
        "parts-per-million. Two explode+groupBy passes (words, bigrams) "
        "joined on doc_id — both aggregations are map-side combinable and "
        "shuffle only (doc_id, token) rows, never the text.",
)
def repetition_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    base = d.select("doc_id", F.split(_norm_text(), " ").alias("w"))

    wc = (base.select("doc_id", F.explode("w").alias("tok"))
          .groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("c")))
    wstats = wc.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_words"),
        F.count(F.lit(1)).alias("n_distinct_words"),
        F.max("c").cast("long").alias("top_word_cnt"))

    # bigrams via zip_with over the shifted token array (no per-position
    # slice — see operators/dedup.shingles for the measured rationale);
    # NON-distinct: repetition is the signal here
    shifted = F.slice(F.col("w"), 2, F.greatest(F.size("w") - 1, F.lit(1)))
    bg = F.when(
        F.size("w") >= 2,
        F.filter(F.zip_with(F.col("w"), shifted,
                            lambda a, b: F.when(b.isNotNull(),
                                                F.concat_ws(" ", a, b))),
                 lambda x: x.isNotNull()),
    ).otherwise(F.array().cast("array<string>"))
    bc = (base.select("doc_id", F.explode(bg).alias("bg"))
          .groupBy("doc_id", "bg").agg(F.count(F.lit(1)).alias("c")))
    bstats = bc.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_bigrams"),
        F.max("c").cast("long").alias("top_bigram_cnt"))

    top_bigram_ppm = (
        F.when(F.col("n_bigrams").isNull() | (F.col("n_bigrams") == 0), 0)
        .otherwise(_ppm(F.col("top_bigram_cnt"), F.col("n_bigrams")))
        .cast("long"))
    return (
        wstats.join(bstats, "doc_id", "left")
        .select(
            "doc_id", "n_words", "n_distinct_words",
            _ppm(F.col("n_words") - F.col("n_distinct_words"),
                 F.col("n_words")).alias("dup_word_ppm"),
            _ppm(F.col("top_word_cnt"), F.col("n_words")).alias("top_word_ppm"),
            top_bigram_ppm.alias("top_bigram_ppm"),
        )
    )


@query(
    "benchmark_contamination",
    f"""
    WITH base AS (
      SELECT doc_id, source, string_split({_NORM_SQL}, ' ') AS w,
             {_NORM_SQL} AS norm
      FROM documents
    ),
    sh AS (
      SELECT doc_id, source,
             unnest(CASE WHEN len(w) >= 3
                    THEN list_distinct(list_transform(
                           range(1, len(w) - 1),
                           i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2]))
                    ELSE [norm] END) AS shingle
      FROM base
    ),
    bench AS (
      SELECT DISTINCT shingle FROM sh WHERE source = 'src0'
    ),
    train AS (
      SELECT doc_id, shingle FROM sh WHERE source <> 'src0'
    ),
    sizes AS (
      SELECT doc_id, COUNT(*) AS n_shingles FROM train GROUP BY doc_id
    ),
    hits AS (
      SELECT t.doc_id, COUNT(*) AS n_contaminated
      FROM train t JOIN bench b ON t.shingle = b.shingle
      GROUP BY t.doc_id
    )
    SELECT h.doc_id, CAST(s.n_shingles AS BIGINT) AS n_shingles,
           CAST(h.n_contaminated AS BIGINT) AS n_contaminated,
           CAST(FLOOR(CAST(h.n_contaminated AS DOUBLE) * 1000000.0
                      / s.n_shingles) AS BIGINT) AS contamination_ppm
    FROM hits h JOIN sizes s ON h.doc_id = s.doc_id
    """,
    "textops", "corpus", "dedup",
    doc="Benchmark decontamination: flag training documents sharing word "
        "3-gram shingles with the held-out benchmark slice (source = "
        "'src0' stands in for an eval set; production would use 8-13 "
        "grams — 3 keeps the overlap regime non-trivial on the synthetic "
        "vocabulary). The benchmark shingle set is deduplicated then "
        "joined to training shingles — at scale the benchmark side is "
        "millions of shingles (eval sets are small), so this broadcasts; "
        "the training side streams through map-side. Shuffle keys are "
        "shingles, never documents x documents.",
)
def benchmark_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import shingles
    from ..operators.skew import spread_small_scan
    # input-skew fix (guide §2.5): the shingle fold (and the pinned
    # table it materializes) otherwise lives on the local tier's single
    # parquet split — serializing all three downstream branches too
    d = spread_small_scan(load_table(spark, sf_dir, "documents")
                          .select("doc_id", "source", "text"))
    # pin the per-doc shingle ARRAYS once: the exploded table feeds
    # three branches (bench distinct, per-doc sizes, the hit join) and
    # Catalyst does not CSE the shingle chain across them — unpinned,
    # the interpreted HOF construction ran once per branch (the
    # minhash materialize lesson). Sizes then come straight off
    # size(_sh) — the array IS the distinct shingle set — instead of
    # a count-by-doc shuffle over the exploded rows.
    # The pin is CORPUS-scale (per-doc shingle arrays ~ corpus bytes),
    # so it is size-guarded: above the budget the three branches
    # recompute the shingle chain instead of pinning ~1x corpus on
    # executor disk (VERDICT r11 #3; production = lake-materialize).
    from ..operators.pinning import pin_if_bounded
    base = pin_if_bounded(
        d.select("doc_id", "source",
                 shingles(F.col("text"), 3).alias("_sh")),
        sf_dir, "documents")
    bench = (base.where(F.col("source") == "src0")
             .select(F.explode("_sh").alias("shingle")).distinct())
    train = (base.where(F.col("source") != "src0")
             .select("doc_id", F.explode("_sh").alias("shingle")))
    sizes = base.where(F.col("source") != "src0").select(
        "doc_id", F.size("_sh").alias("n_shingles"))
    hits = (train.join(F.broadcast(bench), "shingle")
            .groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_contaminated")))
    return (
        hits.join(sizes, "doc_id")
        .select("doc_id",
                F.col("n_shingles").cast("long").alias("n_shingles"),
                F.col("n_contaminated").cast("long").alias("n_contaminated"),
                _ppm(F.col("n_contaminated"), F.col("n_shingles"))
                .alias("contamination_ppm"))
    )


# Per-language keep rates as md5-hex-prefix thresholds (lexicographic
# compare — '4000' ≈ 25% of the 16-bit prefix space). Keep-all strata
# use 'g': it sorts after every hex string, so the strict < keeps all
# 65536 prefixes — 'ffff' would silently drop the docs whose prefix is
# exactly 'ffff'. Rebalances the synthetic corpus's English skew.
_SAMPLE_THRESHOLDS = (("en", "4000"), ("es", "8000"), ("de", "g"),
                      ("fr", "g"), ("zh", "g"))


@query(
    "stratified_sample",
    f"""
    SELECT doc_id, lang, source
    FROM documents
    WHERE substr(md5(CAST(doc_id AS VARCHAR) || ':' || lang), 1, 4)
          < CASE lang {" ".join(f"WHEN '{k}' THEN '{v}'"
                                for k, v in _SAMPLE_THRESHOLDS)}
            ELSE 'g' END
    """,
    "corpus",
    doc="Deterministic stratified downsampling: per-language keep rates "
        "applied by comparing an md5 hex prefix of (doc_id, lang) against "
        "a per-stratum threshold — reproducible across engines, runs, and "
        "cluster sizes (no RNG), stable under corpus growth, and executed "
        "as a pure narrow filter (no shuffle, no sampling operator). The "
        "standard rebalancing move for a skewed language mix.",
)
def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    h = F.substring(
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":"),
                       F.col("lang"))), 1, 4)
    thr = F.lit("g")
    for lang, t in reversed(_SAMPLE_THRESHOLDS):
        thr = F.when(F.col("lang") == lang, t).otherwise(thr)
    return d.where(h < thr).select("doc_id", "lang", "source")


_PACK_BUDGET = 2048
_PACK_SHARDS = 8


@query(
    "sequence_pack",
    f"""
    WITH toks AS (
      SELECT doc_id, doc_id % {_PACK_SHARDS} AS shard,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      FROM documents
    ),
    cum AS (
      SELECT doc_id, shard, n_tokens,
             CAST(COALESCE(SUM(n_tokens) OVER (
               PARTITION BY shard ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS BIGINT) AS cum_before
      FROM toks
    )
    SELECT doc_id, CAST(shard AS BIGINT) AS shard, n_tokens,
           CAST(FLOOR(CAST(cum_before AS DOUBLE) / {_PACK_BUDGET}) AS BIGINT)
             AS pack_id,
           CAST(cum_before % {_PACK_BUDGET} AS BIGINT) AS pack_offset
    FROM cum
    """,
    "corpus",
    doc="Training-sequence packing (concat-then-chunk): documents are "
        "laid end-to-end in deterministic doc_id order and cut into "
        f"{_PACK_BUDGET}-token sequences. Partitioned into "
        f"{_PACK_SHARDS} hash shards so the running-total window "
        "parallelizes — the global-order variant would funnel the corpus "
        "through one partition; per-shard packing is what distributed "
        "tokenizer pipelines actually do (each shard becomes an "
        "independent stream of training sequences).",
)
def sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        (F.col("doc_id") % _PACK_SHARDS).alias("shard"),
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens"))
    w = (W.partitionBy("shard").orderBy("doc_id")
         .rowsBetween(W.unboundedPreceding, -1))
    cum = toks.withColumn(
        "cum_before", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
    return cum.select(
        "doc_id", F.col("shard").cast("long").alias("shard"), "n_tokens",
        F.floor(F.col("cum_before").cast("double") / _PACK_BUDGET)
        .cast("long").alias("pack_id"),
        (F.col("cum_before") % _PACK_BUDGET).cast("long").alias("pack_offset"))


@query(
    "corpus_token_stats",
    """
    SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
           CAST(FLOOR(quantile_cont(len(string_split(text, ' ')), 0.5) * 1000)
             AS BIGINT) AS p50_tokens_e3,
           CAST(FLOOR(quantile_cont(len(string_split(text, ' ')), 0.9) * 1000)
             AS BIGINT) AS p90_tokens_e3
    FROM documents
    GROUP BY lang
    """,
    "corpus",
    doc="Token-budget accounting per language: document counts, total "
        "whitespace tokens, and exact interpolated p50/p90 (Spark "
        "`percentile` == DuckDB `quantile_cont`; floor-scaled to e3 "
        "integers). Drives sampling-rate choices; at 100 TB the exact "
        "percentile becomes approx_percentile with a bounded error — the "
        "exact form here doubles as its correctness oracle.",
)
def corpus_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    nt = F.size(F.split(F.col("text"), " "))
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(nt).cast("long").alias("total_tokens"),
        F.floor(F.percentile(nt, F.lit(0.5)) * 1000).cast("long")
        .alias("p50_tokens_e3"),
        F.floor(F.percentile(nt, F.lit(0.9)) * 1000).cast("long")
        .alias("p90_tokens_e3"))


@query(
    "dsir_importance_weights",
    f"""
    WITH base AS (
      SELECT doc_id, lang, string_split({_NORM_SQL}, ' ') AS w FROM documents
    ),
    tokf AS (
      SELECT doc_id, lang, tok FROM (
        SELECT doc_id, lang, unnest(w) AS tok FROM base
      ) WHERE tok <> ''
    ),
    dt AS (
      SELECT doc_id, tok, COUNT(*) AS c FROM tokf GROUP BY doc_id, tok
    ),
    rawc AS (SELECT tok, COUNT(*) AS cr FROM tokf GROUP BY tok),
    tgtc AS (SELECT tok, COUNT(*) AS ct FROM tokf WHERE lang = 'en'
             GROUP BY tok),
    tot AS (
      SELECT (SELECT SUM(cr) FROM rawc) AS nr,
             (SELECT COALESCE(SUM(ct), 0) FROM tgtc) AS nt,
             (SELECT COUNT(*) FROM rawc) AS v
    ),
    wts AS (
      SELECT r.tok,
             CAST(FLOOR(LN(
               (CAST(COALESCE(t.ct, 0) + 1 AS DOUBLE)
                * CAST(tot.nr + tot.v AS DOUBLE))
               / (CAST(r.cr + 1 AS DOUBLE)
                  * CAST(tot.nt + tot.v AS DOUBLE))
             ) * 1000000.0) AS BIGINT) AS w_e6
      FROM rawc r LEFT JOIN tgtc t ON r.tok = t.tok, tot
    )
    SELECT dt.doc_id, CAST(SUM(dt.c) AS BIGINT) AS n_tokens,
           CAST(SUM(dt.c * w.w_e6) AS BIGINT) AS score_e6
    FROM dt JOIN wts w ON dt.tok = w.tok
    GROUP BY dt.doc_id
    """,
    "corpus", "scale",
    doc="DSIR-style importance weighting (Xie et al. 2023, public): score "
        "each document by the summed log-likelihood ratio of its tokens "
        "under the target distribution (here lang='en') vs the raw corpus, "
        "with add-one smoothing over the shared vocabulary. Cross-engine "
        "determinism: the per-TOKEN-TYPE weight is computed once from "
        "exact integer counts, each cast to double BEFORE the multiply "
        "(counts < 2^53 cast exactly; the IEEE product and quotient then "
        "round identically in both engines — and int64 products of "
        "corpus-scale counts would overflow, so the integer-product form "
        "is wrong at 100 TB) and floor-scaled to an e6 integer; the "
        "per-doc score is then an exact BIGINT dot product — "
        "no float summation order anywhere. Scale shape: token-count "
        "aggregations are map-side combinable; the weight table is "
        "vocabulary-sized and joins against (doc_id, token) count rows, "
        "never raw text. Production DSIR buckets tokens by hash to bound "
        "the vocab — same plan with hash(tok) as the key.",
)
def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    tokf = (d.select("doc_id", "lang",
                     F.explode(F.split(_norm_text(), " ")).alias("tok"))
            .where(F.col("tok") != ""))
    dt = tokf.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("c"))
    rawc = tokf.groupBy("tok").agg(F.count(F.lit(1)).alias("cr"))
    tgtc = (tokf.where(F.col("lang") == "en")
            .groupBy("tok").agg(F.count(F.lit(1)).alias("ct")))
    tot = rawc.agg(
        F.sum("cr").alias("nr"),
        F.count(F.lit(1)).alias("v"),
    ).crossJoin(tgtc.agg(F.coalesce(F.sum("ct"), F.lit(0)).alias("nt")))
    wts = (rawc.join(tgtc, "tok", "left")
           .crossJoin(F.broadcast(tot))
           .select(
               "tok",
               F.floor(F.log(
                   ((F.coalesce(F.col("ct"), F.lit(0)) + 1).cast("double")
                    * (F.col("nr") + F.col("v")).cast("double"))
                   / ((F.col("cr") + 1).cast("double")
                      * (F.col("nt") + F.col("v")).cast("double"))
               ) * 1000000.0).cast("long").alias("w_e6")))
    return (dt.join(wts, "tok")
            .groupBy("doc_id")
            .agg(F.sum("c").cast("long").alias("n_tokens"),
                 F.sum(F.col("c") * F.col("w_e6")).cast("long")
                 .alias("score_e6")))


@query(
    "mixture_temperature_weights",
    """
    WITH lt AS (
      SELECT lang, COUNT(*) AS n_docs,
             CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS toks
      FROM documents GROUP BY lang
    ),
    tot AS (
      SELECT CAST(SUM(toks) AS BIGINT) AS t,
             SUM(POWER(CAST(toks AS DOUBLE), 0.3)) AS sx
      FROM lt
    )
    SELECT lang, CAST(n_docs AS BIGINT) AS n_docs, toks AS total_tokens,
           CAST(FLOOR(CAST(toks AS DOUBLE) * 1000000.0 / t) AS BIGINT)
             AS raw_share_ppm,
           CAST(FLOOR(POWER(CAST(toks AS DOUBLE), 0.3) * 1000000.0 / sx)
             AS BIGINT) AS temp_share_ppm
    FROM lt, tot
    """,
    "corpus",
    doc="Temperature-based multilingual mixture weights (the mT5/XLM-R "
        "alpha-sampling rule, alpha=0.3): per-language sampling share "
        "proportional to (token share)^alpha, which upsamples the tail "
        "languages without letting any head language dominate. T^alpha "
        "cancels in the normalization, so both engines compute "
        "pow(token_count, alpha) on exact integer counts — no "
        "intermediate share division — and emit floor-scaled ppm. One "
        "map-side-combinable aggregate + a 1-row totals broadcast; "
        "feeds stratified_sample / source_mixture_sample rates.",
)
def mixture_temperature_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    nt = F.size(F.split(F.col("text"), " "))
    lt = d.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(nt).cast("long").alias("toks"))
    x = F.pow(F.col("toks").cast("double"), F.lit(0.3))
    tot = lt.agg(F.sum("toks").cast("long").alias("t"),
                 F.sum(x).alias("sx"))
    return (lt.crossJoin(F.broadcast(tot))
            .select(
                "lang", "n_docs", F.col("toks").alias("total_tokens"),
                F.floor(F.col("toks").cast("double") * 1000000.0
                        / F.col("t")).cast("long").alias("raw_share_ppm"),
                F.floor(x * 1000000.0 / F.col("sx")).cast("long")
                .alias("temp_share_ppm")))


@query(
    "vocab_encode_docs",
    f"""
    WITH base AS (
      SELECT doc_id, string_split({_NORM_SQL}, ' ') AS w FROM documents
    ),
    tokpos AS (
      -- parallel unnest zips the token list with its position list
      -- (range() as a table function rejects lateral column bounds)
      SELECT doc_id, tok, pos FROM (
        SELECT doc_id, unnest(w) AS tok,
               unnest(range(1, len(w) + 1)) AS pos
        FROM base
      ) WHERE tok <> ''
    ),
    counts AS (SELECT tok, COUNT(*) AS c FROM tokpos GROUP BY tok),
    vocab AS (
      SELECT tok, ROW_NUMBER() OVER (ORDER BY c DESC, tok) - 1 AS id
      FROM counts QUALIFY id < 256
    )
    SELECT tp.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(CASE WHEN v.id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_oov,
           string_agg(CAST(COALESCE(v.id, -1) AS VARCHAR), ','
                      ORDER BY tp.pos) AS ids
    FROM tokpos tp LEFT JOIN vocab v ON tp.tok = v.tok
    GROUP BY tp.doc_id
    """,
    "corpus", "textops",
    doc="Vocabulary build + token-id encoding (the tokenize-to-ids "
        "stage before training): top-256 tokens by corpus frequency "
        "(count desc, token asc — fully deterministic) become ids "
        "0..255, every document re-emits as its ordered id sequence "
        "with -1 for OOV, serialized to a comma string (driver-hashable "
        "stand-in for array<int>). Scale shape: the vocab is selected "
        "by DISTRIBUTED TopK (orderBy+limit compiles to "
        "TakeOrderedAndProject — per-partition 256-row heaps, no global "
        "sort of the distinct-token table), so the only "
        "single-partition work is the 256-row id window; the vocab "
        "broadcasts into the encode join; token positions ride the "
        "explode, text never shuffles. Real BPE swaps the word split "
        "for merges — the dataflow (build table, broadcast, encode) is "
        "identical.",
)
def vocab_encode_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    tokpos = (d.select(
        "doc_id",
        F.posexplode(F.split(_norm_text(), " ")).alias("pos0", "tok"))
        .where(F.col("tok") != "")
        .select("doc_id", (F.col("pos0") + 1).alias("pos"), "tok"))
    counts = tokpos.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    # distributed TopK (TakeOrderedAndProject): per-partition heaps of
    # 256, never a global sort over the distinct-token table — the id
    # window below sorts 256 rows, not the corpus's token space
    top = counts.orderBy(F.col("c").desc(), F.col("tok")).limit(256)
    w_v = W.orderBy(F.col("c").desc(), F.col("tok"))
    vocab = (top.withColumn("id", F.row_number().over(w_v) - 1)
             .select("tok", "id"))
    enc = (tokpos.join(F.broadcast(vocab), "tok", "left")
           .groupBy("doc_id")
           .agg(F.count(F.lit(1)).cast("long").alias("n_tokens"),
                F.sum(F.when(F.col("id").isNull(), 1).otherwise(0))
                .cast("long").alias("n_oov"),
                F.array_sort(F.collect_list(F.struct(
                    "pos", F.coalesce(F.col("id"), F.lit(-1)).alias("id"))))
                .alias("_pv")))
    return enc.select(
        "doc_id", "n_tokens", "n_oov",
        F.concat_ws(",", F.transform(
            "_pv", lambda s: s.getField("id").cast("string"))).alias("ids"))


@query(
    "bigram_lm_nll",
    f"""
    WITH base AS (
      SELECT doc_id, string_split({_NORM_SQL}, ' ') AS w FROM documents
    ),
    bg AS (
      SELECT doc_id, unnest(CASE WHEN len(w) >= 2
                  THEN list_transform(range(1, len(w)),
                                      i -> w[i] || ' ' || w[i + 1])
                  ELSE [] END) AS bigram
      FROM base
    ),
    db AS (SELECT doc_id, bigram, COUNT(*) AS c FROM bg
           GROUP BY doc_id, bigram),
    cb AS (SELECT bigram, COUNT(*) AS cb FROM bg GROUP BY bigram),
    ctx AS (SELECT split_part(bigram, ' ', 1) AS w1,
                   CAST(SUM(cb) AS BIGINT) AS cctx
            FROM cb GROUP BY 1),
    vocab AS (
      SELECT COUNT(DISTINCT tok) AS v FROM (
        SELECT unnest(w) AS tok FROM base) WHERE tok <> ''
    ),
    wts AS (
      SELECT b.bigram,
             CAST(FLOOR(-LN(
               CAST(b.cb + 1 AS BIGINT) / CAST(x.cctx + vocab.v AS BIGINT)
             ) * 1000000.0) AS BIGINT) AS nll_e6
      FROM cb b JOIN ctx x ON split_part(b.bigram, ' ', 1) = x.w1,
           vocab
    )
    SELECT db.doc_id, CAST(SUM(db.c) AS BIGINT) AS n_bigrams,
           CAST(SUM(db.c * w.nll_e6) AS BIGINT) AS nll_e6
    FROM db JOIN wts w ON db.bigram = w.bigram
    GROUP BY db.doc_id
    """,
    "corpus", "textops", "scale",
    doc="CCNet-style LM quality scoring, self-trained: per-document "
        "total negative log-likelihood under the corpus's own bigram "
        "LM with add-one smoothing (p(w2|w1) = (c(w1 w2)+1) / "
        "(c(w1 .)+V)). High NLL per bigram = improbable text = the "
        "junk CCNet's perplexity buckets drop; consumers derive "
        "perplexity as exp(nll/n). Determinism scheme as "
        "dsir_importance_weights: per-bigram-TYPE weights floor-scaled "
        "to e6 integers from one correctly-rounded division of exact "
        "integer counts, per-doc score an exact BIGINT dot product. "
        "Scale shape: two map-side-combinable count aggregates; the "
        "weight table is bigram-vocabulary-sized and joins (doc, "
        "bigram, count) rows — text never shuffles. Docs with <2 words "
        "have no bigrams and drop out (both engines).",
)
def bigram_lm_nll(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    base = d.select("doc_id", F.split(_norm_text(), " ").alias("w"))
    bigram = F.explode(F.when(
        F.size("w") >= 2,
        F.zip_with(F.slice("w", 1, F.size("w") - 1),
                   F.slice("w", 2, F.size("w") - 1),
                   lambda a, b: F.concat_ws(" ", a, b)))
        .otherwise(F.array())).alias("bigram")
    bg = base.select("doc_id", bigram)
    db = bg.groupBy("doc_id", "bigram").agg(F.count(F.lit(1)).alias("c"))
    # corpus bigram counts folded from the per-doc counts — COUNT(*)
    # over occurrences == SUM(c) over (doc, bigram) groups exactly, and
    # both consumers now sit on the SAME (doc_id, bigram) exchange, so
    # AQE reuses it and the corpus explode + text normalization run
    # once instead of twice
    cb = db.groupBy("bigram").agg(F.sum("c").cast("long").alias("cb"))
    ctx = (cb.groupBy(F.substring_index("bigram", " ", 1).alias("w1"))
           .agg(F.sum("cb").cast("long").alias("cctx")))
    vocab = (base.select(F.explode("w").alias("tok"))
             .where(F.col("tok") != "")
             .agg(F.countDistinct("tok").alias("v")))
    wts = (cb.join(ctx, F.substring_index("bigram", " ", 1) == F.col("w1"))
           .crossJoin(F.broadcast(vocab))
           .select(
               "bigram",
               F.floor(-F.log(
                   (F.col("cb") + 1).cast("bigint")
                   / (F.col("cctx") + F.col("v")).cast("bigint")
               ) * 1000000.0).cast("long").alias("nll_e6")))
    return (db.join(wts, "bigram")
            .groupBy("doc_id")
            .agg(F.sum("c").cast("long").alias("n_bigrams"),
                 F.sum(F.col("c") * F.col("nll_e6")).cast("long")
                 .alias("nll_e6")))


@query(
    "chunk_documents",
    """
    WITH base AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ),
    chunks AS (
      -- chunks past the first must cover NEW tokens: start + overlap
      -- < len, i.e. ci <= floor((len - overlap - 1) / stride)
      SELECT doc_id, w,
             unnest(range(0, CAST(FLOOR(GREATEST(len(w) - 17, 0) / 48.0)
                                  AS BIGINT) + 1)) AS ci
      FROM base
    )
    SELECT doc_id, CAST(ci AS INT) AS chunk_idx,
           CAST(ci * 48 AS BIGINT) AS start_tok,
           CAST(len(list_slice(w, ci * 48 + 1, ci * 48 + 64)) AS BIGINT)
             AS n_tokens,
           array_to_string(list_slice(w, ci * 48 + 1, ci * 48 + 64), ' ')
             AS chunk_text
    FROM chunks
    """,
    "corpus", "textops",
    doc="RAG-style document chunking: overlapping 64-token windows with "
        "stride 48 (16-token overlap), the standard retrieval-corpus "
        "prep before embedding. A chunk past the first is emitted only "
        "when it covers tokens its predecessor did not (start + overlap "
        "< doc length) — no fully-redundant tail chunks. Pure narrow "
        "plan — split, sequence explode, slice, rejoin — no shuffle at "
        "all; chunk boundaries are deterministic functions of the token "
        "count. At 100 TB this "
        "is embarrassingly parallel and the chunk table feeds the "
        "embedding UDF / ANN index build downstream.",
)
def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    chunk, stride = 64, 48
    overlap = chunk - stride
    d = load_table(spark, sf_dir, "documents")
    base = d.select("doc_id", F.split("text", " ").alias("w"))
    # a chunk past the first exists only if it covers tokens the
    # previous chunk did not: ci * stride + overlap < len(w) — without
    # the bound, len(w) % stride inside the overlap emits a tail chunk
    # fully contained in its predecessor (duplicated RAG content)
    n_chunks = F.floor(
        F.greatest(F.size("w") - overlap - 1, F.lit(0)) / stride
    ).cast("int")
    chunks = base.select(
        "doc_id", "w",
        F.explode(F.sequence(F.lit(0), n_chunks)).alias("ci"))
    cw = F.slice("w", F.col("ci") * stride + 1, chunk)
    return chunks.select(
        "doc_id", F.col("ci").cast("int").alias("chunk_idx"),
        (F.col("ci") * stride).cast("long").alias("start_tok"),
        F.size(cw).cast("long").alias("n_tokens"),
        F.concat_ws(" ", cw).alias("chunk_text"))


@query(
    "char_entropy",
    """
    WITH chars AS (
      SELECT doc_id, unnest(string_split(text, '')) AS ch FROM documents
    ),
    cc AS (SELECT doc_id, ch, COUNT(*) AS c FROM chars GROUP BY doc_id, ch),
    n AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_chars,
                 COUNT(*) AS n_distinct FROM cc GROUP BY doc_id)
    SELECT cc.doc_id, n.n_chars,
           CAST(n.n_distinct AS BIGINT) AS n_distinct_chars,
           CAST(SUM(cc.c * CAST(FLOOR(LN(
             CAST(n.n_chars AS BIGINT) / CAST(cc.c AS BIGINT)
           ) * 1000000.0) AS BIGINT)) AS BIGINT) AS entropy_num_e6
    FROM cc JOIN n ON cc.doc_id = n.doc_id
    GROUP BY cc.doc_id, n.n_chars, n.n_distinct
    """,
    "corpus", "textops",
    doc="Character-entropy quality signal (gibberish / binary-junk "
        "detector): per-doc Shannon entropy numerator as an exact "
        "integer — sum over char TYPES of c * floor(ln(n/c) * 1e6); "
        "consumers divide by n for nats/char (near 0 = degenerate "
        "repetition, high = uniform noise). The usual determinism "
        "scheme: one correctly-rounded division of exact int64 counts "
        "per char type, BIGINT dot product after. One explode + two "
        "map-side-combinable aggregates; text never shuffles.",
)
def char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    cc = (d.select("doc_id", F.explode(F.split("text", "")).alias("ch"))
          .groupBy("doc_id", "ch").agg(F.count(F.lit(1)).alias("c")))
    n = cc.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_chars"),
        F.count(F.lit(1)).alias("n_distinct"))
    w_e6 = F.floor(F.log(
        F.col("n_chars").cast("bigint") / F.col("c").cast("bigint")
    ) * 1000000.0).cast("long")
    return (cc.join(n, "doc_id")
            .groupBy("doc_id", "n_chars",
                     F.col("n_distinct").cast("long")
                     .alias("n_distinct_chars"))
            .agg(F.sum(F.col("c") * w_e6).cast("long")
                 .alias("entropy_num_e6"))
            .select("doc_id", "n_chars", "n_distinct_chars",
                    "entropy_num_e6"))


def _bpe_sql(n_merges: int = 12) -> str:
    """Unrolled DuckDB replay of learn_bpe + encode: each merge round
    is three CTEs (pair counts -> guarded top-1 -> fold application),
    with the greedy left-to-right merge expressed as list_reduce over
    a chr(31)-separated accumulator — the exact scheme
    operators/bpe.py uses Spark-side. The early-stop (best weighted
    count < 2) becomes a pass-through guard: an unapplied merge leaves
    the type table unchanged, so later rounds are no-ops too.

    Every t{k} is AS MATERIALIZED: each is referenced twice (by p{k+1}
    and t{k+1}) and DuckDB's default inlining would otherwise replay
    the whole fold chain per reference — measured 439 s -> ~1 s at
    sf0.001."""
    rounds = []
    for k in range(1, n_merges + 1):
        rounds.append(f"""
    p{k} AS (
      SELECT pr[1] AS a, pr[2] AS b, CAST(SUM(cnt) AS BIGINT) AS c
      FROM (
        SELECT cnt, unnest(list_transform(range(1, len(sym)),
                                          i -> [sym[i], sym[i + 1]])) AS pr
        FROM t{k - 1} WHERE len(sym) >= 2
      ) GROUP BY 1, 2
    ),
    g{k} AS (
      SELECT a, b FROM (SELECT a, b, c FROM p{k}
                        ORDER BY c DESC, a, b LIMIT 1)
      WHERE c >= 2
    ),
    t{k} AS MATERIALIZED (
      SELECT word, cnt,
        CASE WHEN g.a IS NULL THEN sym ELSE
          string_split(ltrim(
            list_reduce(list_prepend('', sym), (acc, x) ->
              CASE WHEN ends_with(acc, chr(31) || g.a) AND x = g.b
                   THEN left(acc, length(acc) - length(g.a) - 1)
                        || chr(31) || g.a || g.b
                   ELSE acc || chr(31) || x END),
            chr(31)), chr(31))
        END AS sym
      FROM t{k - 1} LEFT JOIN g{k} g ON TRUE
    )""")
    return f"""
    WITH base AS (
      SELECT doc_id, string_split({_NORM_SQL}, ' ') AS w FROM documents
    ),
    wp AS (
      -- chr(31) is the fold separator (operators/bpe.SEP); strip it
      -- from words on BOTH engines so no symbol can alias it
      SELECT doc_id, replace(tok, chr(31), '') AS word, pos FROM (
        SELECT doc_id, unnest(w) AS tok,
               unnest(range(1, len(w) + 1)) AS pos
        FROM base
      ) WHERE replace(tok, chr(31), '') <> ''
    ),
    wc AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt
           FROM wp GROUP BY word),
    t0 AS MATERIALIZED (
      SELECT word, cnt, string_split(word, '') AS sym FROM wc),
    {','.join(rounds)}
    SELECT wp.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(len(t.sym)) AS BIGINT) AS n_tokens,
           md5(string_agg(array_to_string(t.sym, ' '), ' '
                          ORDER BY wp.pos)) AS tok_sig
    FROM wp JOIN t{n_merges} t ON wp.word = t.word
    GROUP BY wp.doc_id
    """


@query(
    "bpe_learn_encode",
    _bpe_sql(12),
    "corpus", "textops", "scale",
    doc="Real BPE (Sennrich et al. 2016): learn 12 merges from the "
        "corpus's own word-type table (most-frequent adjacent symbol "
        "pair per round, ties (a, b)-lexicographic, stop when the best "
        "pair's weighted count < 2), then encode every document and "
        "emit per-doc token counts plus an md5 signature of the full "
        "token sequence in word order. Proves the vocab_encode_docs "
        "docstring's 'real BPE is the same dataflow' claim. Scale "
        "shape: the merge loop touches only the vocabulary-sized "
        "word-type table; each round's argmax is distributed TopK "
        "(TakeOrderedAndProject) + a ONE-row driver collect (the "
        "k-means centroid pattern); merge application is a per-row "
        "fold; the corpus is touched exactly twice — once for word "
        "counts, once for the encode join on word — and text never "
        "rides a shuffle. Oracle: the identical algorithm unrolled as "
        "12 CTE rounds with list_reduce folds (queries/training.py "
        "_bpe_sql).",
)
def bpe_learn_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.bpe import learn_bpe

    from ..operators.bpe import SEP

    d = load_table(spark, sf_dir, "documents")
    base = d.select("doc_id", F.split(_norm_text(), " ").alias("w"))
    # strip the fold separator from words (operators/bpe.SEP
    # precondition), mirrored in the oracle's replace(tok, chr(31), '')
    wp = (base.select(
        "doc_id", F.posexplode("w").alias("pos0", "_w0"))
        .select("doc_id", (F.col("pos0") + 1).alias("pos"),
                F.replace(F.col("_w0"), F.lit(SEP), F.lit(""))
                .alias("word"))
        .where(F.col("word") != ""))
    # pin the word-position table: it feeds BOTH the word-count
    # aggregate and the encode join, and without materialization
    # the corpus normalize+split+explode runs twice (the "touched
    # exactly twice" in the doc means twice LOGICALLY — this keeps
    # it once PHYSICALLY). The table is CORPUS-scale (one row per
    # token position), so the pin is size-guarded (VERDICT r11 #3);
    # at cluster scale this is a lake-stage materialization of the
    # tokenized corpus
    from ..operators.pinning import pin_if_bounded
    wp = pin_if_bounded(wp, sf_dir, "documents")
    wc = wp.groupBy("word").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    _, types = learn_bpe(wc, n_merges=12)
    return (wp.join(types.select("word", "sym"), "word")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).cast("long").alias("n_words"),
                 F.sum(F.size("sym")).cast("long").alias("n_tokens"),
                 F.md5(F.concat_ws(" ", F.transform(
                     F.array_sort(F.collect_list(F.struct(
                         "pos",
                         F.array_join("sym", " ").alias("s")))),
                     lambda r: r.getField("s")))).alias("tok_sig")))
