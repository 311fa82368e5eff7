"""DataFrame-native k-means — the real coarse quantizer for IVF ANN
(`operators/similarity.ivf_topk` takes any centroid table; this builds
one without labels).

Iterative algorithm, but each iteration is pure DataFrame ops:
assign = broadcast-join vs the (tiny) centroid table + argmin;
update = posexplode + groupBy(cluster, pos) mean. No mllib dependency,
no RDDs; centroids live on the driver between iterations (k × dim
doubles — trivially small), which is exactly the standard pattern for
iterative refinement over a big immutable dataset.

Initialization is deterministic: the k vectors with the lowest ids —
reproducible across runs (a k-means++ seed would need a stable RNG,
which Spark jobs re-execute nondeterministically).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .similarity import _dot, _norm


def _assign(vectors: DataFrame, centroids: DataFrame,
            id_col: str, vec_col: str) -> DataFrame:
    # argmax via max_by aggregation (map-side combinable) — a window
    # would sort every vector's k candidate rows for no reason. Ties
    # break toward the lowest centroid_id: max_by on (sim, -id).
    # Norms are computed once per row / once per centroid and carried:
    # the inline cosine() form refolded both norms per (vector,
    # centroid) pair — 3 interpreted O(dim) folds per pair -> 1, same
    # doubles so assignments are unchanged.
    cen = F.broadcast(centroids.withColumn(
        "_ncen", _norm(F.col("centroid"))))
    d = (vectors
         .withColumn("_nv", _norm(F.col(vec_col)))
         .crossJoin(cen).select(
             id_col, vec_col, "centroid_id",
             (_dot(F.col(vec_col), F.col("centroid"))
              / (F.col("_nv") * F.col("_ncen"))).alias("_sim")))
    return (d.groupBy(id_col).agg(
        F.first(vec_col).alias(vec_col),
        F.max_by("centroid_id",
                 F.struct(F.col("_sim"), -F.col("centroid_id")))
        .alias("cluster")))


def kmeans(vectors: DataFrame, k: int = 8, max_iters: int = 5,
           id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Returns the centroid table (centroid_id, centroid array<double>).
    Cosine-metric k-means (spherical): assignment by max cosine,
    update by component mean."""
    init = (vectors.orderBy(id_col).limit(k)
            .select(F.col(vec_col).alias("_v"))
            .collect())
    spark = vectors.sparkSession
    centroids = spark.createDataFrame(
        [(i, [float(x) for x in row["_v"]]) for i, row in enumerate(init)],
        "centroid_id int, centroid array<double>")

    for _ in range(max_iters):
        assigned = _assign(vectors, centroids, id_col, vec_col)
        new = (assigned
               .select("cluster", F.posexplode(vec_col).alias("pos", "val"))
               .groupBy("cluster", "pos")
               .agg(F.avg(F.col("val").cast("double")).alias("v"))
               .groupBy("cluster")
               .agg(F.array_sort(F.collect_list(F.struct("pos", "v")))
                    .alias("_pv"))
               .select(F.col("cluster").alias("centroid_id"),
                       F.transform("_pv", lambda s: s.getField("v"))
                       .alias("centroid")))
        # clusters can empty out; keep the old centroid for those
        kept = centroids.join(new.select("centroid_id"), "centroid_id",
                              "left_anti")
        centroids = spark.createDataFrame(
            new.unionByName(kept).collect(),
            "centroid_id int, centroid array<double>")
    return centroids


def cluster_assignments(vectors: DataFrame, centroids: DataFrame,
                        id_col: str = "vec_id",
                        vec_col: str = "embedding") -> DataFrame:
    return _assign(vectors, centroids, id_col, vec_col) \
        .select(id_col, "cluster")
