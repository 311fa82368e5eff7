"""Tests: DataFrame k-means convergence + IVF recall, and the
stateful streaming sessionizer (applyInPandasWithState) against the
batch sessionizer."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from adsmasterpipeline_spark.operators.kmeans import (
    cluster_assignments, kmeans,
)
from tests.conftest import SF_DIR


def _clustered_vectors(spark):
    """3 well-separated synthetic clusters in 8-dim."""
    rows = []
    centers = [[5.0] * 8, [-5.0] * 8, [5.0] * 4 + [-5.0] * 4]
    vid = 0
    for ci, c in enumerate(centers):
        for j in range(20):
            noise = [((vid * 31 + d * 7 + j) % 10 - 4.5) / 10 for d in range(8)]
            rows.append((vid, [c[d] + noise[d] for d in range(8)], ci))
            vid += 1
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, true_cluster int")


@pytest.mark.slow
def test_kmeans_separates_planted_clusters(spark):
    v = _clustered_vectors(spark)
    cen = kmeans(v, k=3, max_iters=4)
    assert cen.count() == 3
    assigned = cluster_assignments(v, cen).join(
        v.select("vec_id", "true_cluster"), "vec_id")
    # every true cluster maps to exactly one k-means cluster (purity 1
    # on well-separated data)
    purity = (assigned.groupBy("true_cluster")
              .agg(F.countDistinct("cluster").alias("n"))
              .agg(F.max("n")).first()[0])
    assert purity == 1


def test_kmeans_deterministic(spark):
    v = _clustered_vectors(spark)
    a = sorted(map(str, kmeans(v, k=3, max_iters=2).collect()))
    b = sorted(map(str, kmeans(v, k=3, max_iters=2).collect()))
    assert a == b


def test_ivf_kmeans_recall(spark):
    from adsmasterpipeline_spark.operators.kmeans import kmeans as km
    from adsmasterpipeline_spark.operators.similarity import (
        brute_force_topk, ivf_topk,
    )
    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    cen = km(e, k=8, max_iters=2)
    q = e.where(F.col("vec_id") < 12)
    bf = {r["query_id"]: r["neighbor_id"]
          for r in brute_force_topk(q, e, k=1).collect()}
    ivf = {r["query_id"]: r["neighbor_id"]
           for r in ivf_topk(q, e, cen, k=1, nprobe=3).collect()}
    hits = sum(1 for k in bf if ivf.get(k) == bf[k])
    assert hits >= len(bf) * 0.3  # random embeddings; nprobe=3 of 8


def test_streaming_stateful_sessionize(spark, tmp_path):
    """Drive applyInPandasWithState through a real streaming query
    (memory sink) and compare against the batch sessionizer."""
    import json

    from adsmasterpipeline_spark.streaming.stateful import (
        streaming_sessionize,
    )

    src = tmp_path / "stream_src"
    src.mkdir()
    MIN = 60 * 1_000_000
    rows = [
        {"user_id": 1, "event_id": 1, "tus": 0},
        {"user_id": 1, "event_id": 2, "tus": 10 * MIN},      # same session
        {"user_id": 1, "event_id": 3, "tus": 50 * MIN},      # gap > 30min
        {"user_id": 2, "event_id": 4, "tus": 0},
    ]
    (src / "a.json").write_text("\n".join(json.dumps(r) for r in rows))

    events = (spark.readStream
              .schema("user_id long, event_id long, tus long")
              .json(str(src)))
    out = streaming_sessionize(events)
    q = (out.writeStream.format("memory").queryName("sess_out")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .start())
    q.processAllAvailable()
    got = {r["event_id"]: (r["session_id"], r["event_in_session"])
           for r in spark.sql("SELECT * FROM sess_out").collect()}

    assert got[1] == (1, 1)
    assert got[2] == (1, 2)
    assert got[3] == (2, 1)
    assert got[4] == (1, 1)

    # second micro-batch: state carries across batches
    rows2 = [{"user_id": 1, "event_id": 5, "tus": 51 * MIN},   # joins session 2
             {"user_id": 1, "event_id": 6, "tus": 200 * MIN}]  # new session 3
    (src / "b.json").write_text("\n".join(json.dumps(r) for r in rows2))
    q.processAllAvailable()
    q.stop()
    got = {r["event_id"]: (r["session_id"], r["event_in_session"])
           for r in spark.sql("SELECT * FROM sess_out").collect()}
    assert got[5] == (2, 2)
    assert got[6] == (3, 1)
