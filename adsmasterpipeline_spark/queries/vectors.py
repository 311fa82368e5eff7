"""Embedding similarity-search operators over the ``embeddings`` table
(`array<float>` column) — the ANN extensions.

Spark-side design: the hot path stays JVM-side via higher-order array
functions (``zip_with`` + ``aggregate``) — no Python UDF, no explode
shuffle for the pairwise math. The brute-force top-k broadcasts the
(small) query set against the candidate scan; the scale path for a
full self-join is LSH/IVF bucketing (`operators/similarity.py`).

Oracle side: DuckDB 1.0 lacks WITH ORDINALITY, so positional access
uses a lateral ``range()`` join on the list index. Similarities are
rounded on both sides before ranking so double summation order cannot
flip results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..sources import load_table
from . import query


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v))


@query(
    "vector_norms",
    """
    SELECT e.vec_id, e.label,
           ROUND(sqrt(SUM(CAST(e.embedding[t.i] AS DOUBLE) * CAST(e.embedding[t.i] AS DOUBLE))), 4)
             AS l2_norm,
           CAST(len(e.embedding) AS INT) AS dim
    FROM embeddings e, range(1, 65) t(i)
    GROUP BY e.vec_id, e.label, len(e.embedding)
    """,
    "vectors",
    doc="Vector L2 norms via JVM-side higher-order functions (no UDF, no "
        "explode): per-row aggregate over the array column.",
)
def vector_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id", "label",
        F.round(_norm(F.col("embedding")), 4).alias("l2_norm"),
        F.size("embedding").alias("dim"),
    )


@query(
    "cosine_topk",
    """
    WITH pairs AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             ROUND(
               SUM(CAST(q.embedding[t.i] AS DOUBLE) * CAST(c.embedding[t.i] AS DOUBLE))
               / (sqrt(SUM(CAST(q.embedding[t.i] AS DOUBLE) * CAST(q.embedding[t.i] AS DOUBLE)))
                  * sqrt(SUM(CAST(c.embedding[t.i] AS DOUBLE) * CAST(c.embedding[t.i] AS DOUBLE)))),
               6) AS sim
      FROM embeddings q
      JOIN embeddings c ON q.vec_id <> c.vec_id,
           range(1, 65) t(i)
      WHERE q.vec_id < 8
      GROUP BY q.vec_id, c.vec_id
    )
    SELECT query_id, neighbor_id, sim, rnk FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY sim DESC, neighbor_id) AS rnk
      FROM pairs
    ) WHERE rnk <= 3
    """,
    "vectors",
    doc="Brute-force cosine top-k: broadcast the small query set against the "
        "candidate scan, dot product via zip_with/aggregate (whole-stage "
        "codegen), rank per query. The candidate scan is embarrassingly "
        "parallel — at 100 TB the same plan holds with the query side "
        "broadcast; LSH/IVF variants in operators/similarity.py cut the "
        "candidate set.",
)
def cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.skew import spread_small_scan
    # input-skew fix (guide §2.5): the carried-norm fold below runs in
    # the scan stage, which at the local tiers is a single parquet
    # split (A/B at sf0.1: 0.52 s -> 0.32 s; no-op on a parallel scan)
    e = spread_small_scan(load_table(spark, sf_dir, "embeddings"))
    # norms are computed ONCE per row and carried as columns — the
    # inline form refolded both norms per (query, candidate) pair: 3
    # interpreted O(dim) folds per pair -> 1 (HOF folds do not enter
    # whole-stage codegen). Same doubles, same quotient order, so the
    # oracle hash is unchanged.
    q = (e.where(F.col("vec_id") < 8)
         .select(F.col("vec_id").alias("query_id"),
                 F.col("embedding").alias("q_emb"),
                 _norm(F.col("embedding")).alias("_nq")))
    c = e.select(F.col("vec_id").alias("neighbor_id"),
                 F.col("embedding").alias("c_emb"),
                 _norm(F.col("embedding")).alias("_nc"))
    sim = F.round(
        _dot(F.col("q_emb"), F.col("c_emb"))
        / (F.col("_nq") * F.col("_nc")), 6)
    pairs = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", sim.alias("sim"))
    )
    w = W.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        pairs.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 3)
        .select("query_id", "neighbor_id", "sim", "rnk")
    )


# List-native formulation (round 6): the previous range(1,65) lateral
# join exploded every pair into 64 rows before aggregating — ~12.8 G
# intermediate rows at the 10x stress SF (20k vectors, 200M pairs),
# blowing the 300 s oracle wall cap while the Spark side ran in 4-5 s.
# DuckDB's list_dot_product over pre-cast DOUBLE lists is the same
# sequential per-element sum (verified bit-identical after ROUND(.,6)
# at sf0.01 AND sf0.1: 59/59 and 920/920 pairs), and runs sf1 in ~18 s
# — the tier's last two oracle_timeout rows become real hash matches.
_NEARDUP_SQL = """
    WITH n AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb,
             sqrt(list_sum(list_transform(embedding,
                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
      FROM embeddings
    )
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           ROUND(list_dot_product(a.emb, b.emb) / (a.nrm * b.nrm), 6) AS sim
    FROM n a JOIN n b ON a.vec_id < b.vec_id
    WHERE ROUND(list_dot_product(a.emb, b.emb) / (a.nrm * b.nrm), 6) >= 0.4
    """


@query(
    "embedding_cosine_neardup",
    _NEARDUP_SQL,
    "vectors", "dedup",
    doc="Embedding-cosine near-duplicate pairs (threshold 0.4 — the "
        "synthetic random embeddings top out near 0.51): the exact "
        "all-pairs baseline. The LOGICAL semantics are fixed (shared "
        "oracle with the GEMM twin); the PHYSICAL strategy switches on "
        "input size, the same move Catalyst makes for join selection: "
        "small inputs take the broadcast-nested-loop per-pair "
        "zip_with/aggregate fold (the pedagogically-direct shape), "
        "larger ones the blocked-GEMM tiles — at the 10x stress SF "
        "the interpreted fold measured >400s on 200M pairs while the "
        "BLAS tiles finish in tens of seconds, bit-identical (both "
        "strategies hash-match this same oracle). The LSH-bucketed "
        "twin remains the subquadratic scale answer.",
)
def embedding_cosine_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    # Strategy cutover re-measured this round: the BLAS tiles beat the
    # interpreted per-pair fold already at n=500 (0.7 s vs 1.9 s; at
    # n=2000 it is 1.1 s vs 30 s) — the old 4096 cutover left sf0.1 on
    # the fold. Both strategies are bit-identical against the shared
    # oracle; only tiny inputs stay on the direct form.
    if e.count() > 256:
        from ..operators.similarity import blocked_gemm_pairs
        return blocked_gemm_pairs(e, threshold=0.4)
    # Norms are precomputed ONCE per row and carried as a column — the
    # naive per-pair form evaluates three O(dim) aggregates per pair
    # (dot, norm_a, norm_b) and measured 3.5x slower at sf0.1. The
    # quotient dot/(na*nb) is bit-identical either way (same doubles),
    # so the oracle is unaffected.
    a = e.select(F.col("vec_id").alias("vec_a"),
                 F.col("embedding").alias("_a"),
                 _norm(F.col("embedding")).alias("_na"))
    b = e.select(F.col("vec_id").alias("vec_b"),
                 F.col("embedding").alias("_b"),
                 _norm(F.col("embedding")).alias("_nb"))
    sim = F.round(_dot(F.col("_a"), F.col("_b"))
                  / (F.col("_na") * F.col("_nb")), 6)
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", sim.alias("sim"))
        .where(F.col("sim") >= 0.4)
    )


@query(
    "embedding_cosine_neardup_gemm",
    _NEARDUP_SQL,
    "vectors", "dedup", "scale",
    doc="Blocked-GEMM twin of embedding_cosine_neardup: the SAME exact "
        "all-pairs semantics (shared oracle SQL), but each block-pair "
        "tile is one BLAS matmul over Arrow batches instead of an "
        "interpreted per-pair fold — 34.6s -> 0.9s steady-state at "
        "sf0.1 (5k x 5k x 64d), identical output. No driver collect: "
        "blocks meet executor-side in the tile self-join. "
        "operators/similarity.blocked_gemm_pairs.",
)
def embedding_cosine_neardup_gemm(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import blocked_gemm_pairs
    e = load_table(spark, sf_dir, "embeddings")
    return blocked_gemm_pairs(e, threshold=0.4)


@query(
    "embedding_cosine_neardup_lsh", None, "vectors", "dedup", "scale",
    doc="Scale path for embedding near-dup: candidate pairs restricted "
        "to a shared hyperplane-sign bucket, exact cosine verification "
        "inside buckets. The plane count SCALES with n (target ~32 "
        "vectors/bucket, floor 8 planes): with planes fixed, "
        "within-bucket pairs grow n^2/2^planes — the 10x stress run "
        "measured 32x the sf0.1 time before this; bucket count must "
        "track corpus size exactly like IVF's k. Per-row norms are "
        "computed once and carried (three interpreted O(dim) folds "
        "per pair -> one; higher-order array functions do not "
        "participate in whole-stage codegen, so per-pair folds are "
        "the real constant factor). Rows-only (approximate recall by "
        "construction; the exact twin above is oracled).",
)
def embedding_cosine_neardup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    from ..operators.similarity import sign_bucket
    e = load_table(spark, sf_dir, "embeddings")
    n = e.count()
    planes = min(20, max(8, math.ceil(math.log2(max(1, n / 32)))))
    bkt = e.select(F.col("vec_id"), F.col("embedding"),
                   _norm(F.col("embedding")).alias("_nv"),
                   sign_bucket(F.col("embedding"), planes).alias("_bkt"))
    a = bkt.select(F.col("vec_id").alias("vec_a"),
                   F.col("embedding").alias("_a"),
                   F.col("_nv").alias("_na"), "_bkt")
    b = bkt.select(F.col("vec_id").alias("vec_b"),
                   F.col("embedding").alias("_b"),
                   F.col("_nv").alias("_nb"), "_bkt")
    sim = F.round(_dot(F.col("_a"), F.col("_b"))
                  / (F.col("_na") * F.col("_nb")), 6)
    return (
        a.join(b, "_bkt")
        .where(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", sim.alias("sim"))
        .where(F.col("sim") >= 0.4)
    )


@query(
    "label_centroid_distance",
    """
    WITH comp AS (
      SELECT e.vec_id, e.label, t.i AS pos, CAST(e.embedding[t.i] AS DOUBLE) AS val
      FROM embeddings e, range(1, 65) t(i)
    ),
    centroids AS (
      SELECT label, pos, AVG(val) AS cval FROM comp GROUP BY label, pos
    ),
    dists AS (
      SELECT c.vec_id, c.label, sqrt(SUM((c.val - ct.cval) * (c.val - ct.cval))) AS dist
      FROM comp c JOIN centroids ct ON c.label = ct.label AND c.pos = ct.pos
      GROUP BY c.vec_id, c.label
    )
    SELECT label, COUNT(*) AS n_members, ROUND(AVG(dist), 4) AS avg_dist,
           ROUND(MAX(dist), 4) AS max_dist
    FROM dists GROUP BY label
    """,
    "vectors",
    doc="Per-label centroid + member distance stats (IVF building block: "
        "centroid assignment is exactly this aggregation). Two shuffles: "
        "groupBy(label,pos) for centroids — map-side combinable — and the "
        "broadcast-able centroid join back.",
)
def label_centroid_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    comp = e.select(
        "vec_id", "label",
        F.posexplode(F.col("embedding")).alias("pos0", "valf"),
    ).select("vec_id", "label", (F.col("pos0") + 1).alias("pos"),
             F.col("valf").cast("double").alias("val"))
    centroids = comp.groupBy("label", "pos").agg(F.avg("val").alias("cval"))
    diff = F.col("val") - F.col("cval")
    dists = (
        comp.join(F.broadcast(centroids), ["label", "pos"])
        .groupBy("vec_id", "label")
        .agg(F.sqrt(F.sum(diff * diff)).alias("dist"))
    )
    return dists.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.round(F.avg("dist"), 4).alias("avg_dist"),
        F.round(F.max("dist"), 4).alias("max_dist"),
    )


@query(
    "ann_int8_quantized",
    """
    WITH q8 AS (
      SELECT vec_id,
             list_transform(embedding, x ->
               CASE WHEN s = 0 THEN CAST(0 AS BIGINT)
                    ELSE CAST(FLOOR(CAST(x AS DOUBLE) * 127.0 / s + 0.5)
                              AS BIGINT) END) AS qv
      FROM (
        SELECT vec_id, embedding,
               list_max(list_transform(embedding,
                        x -> abs(CAST(x AS DOUBLE)))) AS s
        FROM embeddings
      )
    ),
    pairs AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             ROUND(
               CAST(SUM(q.qv[t.i] * c.qv[t.i]) AS DOUBLE)
               / (sqrt(CAST(SUM(q.qv[t.i] * q.qv[t.i]) AS DOUBLE))
                  * sqrt(CAST(SUM(c.qv[t.i] * c.qv[t.i]) AS DOUBLE))),
               6) AS sim_q
      FROM q8 q JOIN q8 c ON q.vec_id <> c.vec_id,
           range(1, 65) t(i)
      WHERE q.vec_id < 8
      GROUP BY q.vec_id, c.vec_id
    )
    SELECT query_id, neighbor_id, sim_q, rnk FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY sim_q DESC, neighbor_id) AS rnk
      FROM pairs
    ) WHERE rnk <= 3
    """,
    "vectors", "scale",
    doc="Cosine top-k over SYMMETRIC INT8 SCALAR-QUANTIZED vectors — "
        "the 4x-storage-compression ANN path (per-vector scale = "
        "max|x|, q_i = floor(x*127/scale + 0.5); the floor form is "
        "bit-identical across engines where ROUND's half-boundary is "
        "not). Dot products become exact BIGINT arithmetic — only the "
        "final norm division is floating point — so a quantized index "
        "is both 4x smaller to shuffle/broadcast AND integer-exact to "
        "score; ranking agreement vs the float baseline is tracked in "
        "ANNRECALL_r{N}.json. Same broadcast-query plan as "
        "cosine_topk.",
)
def ann_int8_quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.skew import spread_small_scan
    # input-skew fix (guide §2.5): the per-row quantize folds run in
    # the scan stage — a single local split serialized them (A/B at
    # sf0.1: 0.78 s -> 0.38 s; no-op on a parallel scan)
    e = spread_small_scan(load_table(spark, sf_dir, "embeddings"))
    s = F.array_max(F.transform("embedding",
                                lambda x: F.abs(x.cast("double"))))
    qv = F.when(s == 0, F.transform(
        "embedding", lambda x: F.lit(0).cast("long"))) \
        .otherwise(F.transform(
            "embedding",
            lambda x: F.floor(x.cast("double") * 127.0 / s + 0.5)))
    inorm = lambda col: F.sqrt(F.aggregate(  # noqa: E731
        F.transform(col, lambda x: x * x),
        F.lit(0).cast("long"), lambda acc, v: acc + v).cast("double"))
    # integer norms computed ONCE per row and carried — the inline
    # form refolded both norms per pair (3 interpreted O(dim) folds ->
    # 1; exact integer sums, so the carried value is identical).
    q8 = e.select("vec_id", qv.alias("qv"))
    q = (q8.where(F.col("vec_id") < 8)
         .select(F.col("vec_id").alias("query_id"),
                 F.col("qv").alias("_q"),
                 inorm("qv").alias("_nq")))
    c = q8.select(F.col("vec_id").alias("neighbor_id"),
                  F.col("qv").alias("_c"),
                  inorm("qv").alias("_nc"))
    idot = F.aggregate(
        F.zip_with("_q", F.col("_c"), lambda x, y: x * y),
        F.lit(0).cast("long"), lambda acc, v: acc + v)
    sim_q = F.round(idot.cast("double")
                    / (F.col("_nq") * F.col("_nc")), 6)
    pairs = (c.join(F.broadcast(q),
                    F.col("query_id") != F.col("neighbor_id"))
             .select("query_id", "neighbor_id", sim_q.alias("sim_q")))
    w = W.partitionBy("query_id").orderBy(F.col("sim_q").desc(),
                                          F.col("neighbor_id"))
    return (pairs.withColumn("rnk", F.row_number().over(w))
            .where(F.col("rnk") <= 3)
            .select("query_id", "neighbor_id", "sim_q", "rnk"))
