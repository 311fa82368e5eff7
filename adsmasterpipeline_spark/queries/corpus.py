"""Training-corpus preparation queries: quality-gated cleaning and
embedding quantization — the end-of-pipeline operators a training-data
run applies after dedup. Oracle-checked (integer/floor arithmetic —
no cross-engine rounding hazards).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from . import query


@query(
    "corpus_clean",
    """
    WITH scored AS (
      SELECT doc_id, lang, source,
             trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS norm,
             len(string_split(text, ' ')) AS n_words
      FROM documents
    )
    SELECT doc_id, lang, source, norm AS text_clean,
           CAST(n_words AS BIGINT) AS n_words
    FROM scored
    WHERE n_words >= 20 AND length(norm) >= 100
    """,
    "textops", "corpus",
    doc="Corpus cleaning: normalize whitespace/case, drop documents under "
        "the length floor (quality gate). Single scan, fully pushed-down "
        "residual filter.",
)
def corpus_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    norm = F.trim(F.regexp_replace(F.lower("text"), r"\s+", " "))
    n_words = F.size(F.split(F.col("text"), " "))
    return (
        d.select("doc_id", "lang", "source",
                 norm.alias("text_clean"),
                 n_words.cast("long").alias("n_words"))
        .where((F.col("n_words") >= 20) & (F.length("text_clean") >= 100))
    )


@query(
    "embedding_quantize",
    """
    SELECT e.vec_id,
           CAST(MAX(abs(CAST(e.embedding[t.i] AS DOUBLE))) AS DOUBLE) AS scale_raw,
           CAST(SUM(CASE WHEN CAST(FLOOR(CAST(e.embedding[t.i] AS DOUBLE) * 1000) AS BIGINT)
                          BETWEEN -128 AND 127 THEN 1 ELSE 0 END) AS BIGINT) AS n_in_int8,
           CAST(SUM(CAST(FLOOR(CAST(e.embedding[t.i] AS DOUBLE) * 1000) AS BIGINT)) AS BIGINT)
             AS checksum_e3
    FROM embeddings e, range(1, 65) t(i)
    GROUP BY e.vec_id
    """,
    "vectors", "corpus",
    doc="Embedding quantization accounting: per-vector max-abs scale, "
        "how many floor-scaled components fit int8, and an integer "
        "checksum of the quantized values (exact floor arithmetic — "
        "deterministic across engines). The int8 cast itself is a "
        "narrow projection over the same expressions.",
)
def embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    comp = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    q = F.transform(comp, lambda x: F.floor(x * 1000))
    return e.select(
        "vec_id",
        F.array_max(F.transform(comp, F.abs)).alias("scale_raw"),
        F.size(F.filter(q, lambda v: (v >= -128) & (v <= 127)))
        .cast("long").alias("n_in_int8"),
        F.aggregate(q, F.lit(0).cast("long"), lambda acc, v: acc + v)
        .alias("checksum_e3"),
    )


@query(
    "corpus_dedup_pipeline", None, "dedup", "corpus", "scale",
    doc="End-to-end training-corpus dedup: quality gate -> exact dedup "
        "(xxhash64 fingerprints) -> MinHash-LSH near-dup on the exact "
        "survivors -> survivor list with drop reasons. Composes the "
        "scale operators; rows-only (each stage's portable twin is "
        "oracled separately).",
)
def corpus_dedup_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import exact_dedup, minhash_lsh_pairs
    d = load_table(spark, sf_dir, "documents")
    gated = d.where(F.size(F.split(F.col("text"), " ")) >= 20)
    exact = exact_dedup(gated)
    keepers = gated.join(
        exact.where("is_keeper").select("doc_id"), "doc_id", "left_semi")
    near = minhash_lsh_pairs(keepers, num_hashes=16, bands=2,
                             jaccard_threshold=0.8)
    # drop the higher id of each near-dup pair
    near_drops = near.select(F.col("id_b").alias("doc_id")).distinct()
    survivors = keepers.join(near_drops, "doc_id", "left_anti")
    return (
        d.select("doc_id")
        .join(gated.select("doc_id", F.lit(True).alias("_gate")), "doc_id", "left")
        .join(exact.select("doc_id", "is_keeper"), "doc_id", "left")
        .join(near_drops.select("doc_id", F.lit(True).alias("_near")), "doc_id", "left")
        .join(survivors.select("doc_id", F.lit(True).alias("_kept")), "doc_id", "left")
        .select(
            "doc_id",
            F.when(F.col("_gate").isNull(), "quality_gate")
            .when(~F.coalesce(F.col("is_keeper"), F.lit(True)), "exact_dup")
            .when(F.col("_near").isNotNull(), "near_dup")
            .otherwise("kept").alias("disposition"),
        )
    )


@query(
    "ann_ivf_kmeans", None, "vectors", "scale",
    doc="IVF ANN with a real (unlabeled) k-means coarse quantizer built "
        "by operators/kmeans.py — iterative DataFrame refinement, "
        "deterministic init. Rows-only; recall vs brute force is "
        "asserted in tests.",
)
def ann_ivf_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.kmeans import kmeans
    from ..operators.similarity import ivf_topk
    e = load_table(spark, sf_dir, "embeddings")
    cen = kmeans(e, k=8, max_iters=3)
    q = e.where(F.col("vec_id") < 16)
    return ivf_topk(q, e, cen, k=3, nprobe=2).select(
        "query_id", "neighbor_id", "sim", "rnk")
