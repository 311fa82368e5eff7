"""Approximate-nearest-neighbor search over embedding columns.

Three strategies:

- ``brute_force_topk``: exact — broadcast the query set, scan all
  candidates, zip_with/aggregate dot products (whole-stage codegen),
  rank per query. Linear in candidates but embarrassingly parallel;
  the right baseline and the correctness oracle for the ANN variants.
- ``sign_lsh_topk``: hyperplane-sign LSH — bucket vectors by the sign
  pattern of their first ``planes`` components (axis-aligned
  hyperplanes; deterministic, engine-portable). Search only the
  query's bucket: the candidate scan shrinks ~2^planes fold.
- ``ivf_topk``: IVF — k-means-style coarse quantizer (here: centroids
  from a labeled column or a provided centroid table); probe the
  nearest ``nprobe`` centroids' inverted lists.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(queries: DataFrame, candidates: DataFrame, k: int = 10,
                     id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("_q"))
    c = candidates.select(F.col(id_col).alias("neighbor_id"),
                          F.col(vec_col).alias("_c"))
    sim = F.round(cosine(F.col("_q"), F.col("_c")), 6)
    pairs = (c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
             .select("query_id", "neighbor_id", sim.alias("sim")))
    w = W.partitionBy("query_id").orderBy(F.col("sim").desc(),
                                          F.col("neighbor_id"))
    return (pairs.withColumn("rnk", F.row_number().over(w))
            .where(F.col("rnk") <= k))


def sign_bucket(vec: Column, planes: int = 8) -> Column:
    """Bucket key: sign bits of the first `planes` components."""
    signs = F.transform(F.slice(vec, 1, planes),
                        lambda x: F.when(x >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat_ws("", signs)


def sign_bucket_int(vec: Column, planes: int = 8) -> Column:
    """Sign bucket as an integer — the multiprobe form XORs flip masks
    onto it. Bit ORDER may differ from other engines' conventions:
    the probed set (a Hamming ball) is invariant under bit-position
    permutation, so only same-engine bucket equality matters."""
    bits = F.transform(
        F.slice(vec, 1, planes),
        lambda x: F.when(x >= 0, F.lit(1)).otherwise(F.lit(0)))
    return F.aggregate(bits, F.lit(0), lambda a, b: a * 2 + b)


def hamming_masks(planes: int, hamming: int) -> list[int]:
    """All XOR masks flipping <= ``hamming`` of ``planes`` bits —
    any distance (sum of C(planes, d) for d <= hamming masks), so a
    caller asking for a wider ball gets it rather than a silent cap."""
    from itertools import combinations

    masks = [0]
    for d in range(1, min(hamming, planes) + 1):
        for bits in combinations(range(planes), d):
            m = 0
            for b in bits:
                m |= 1 << b
            masks.append(m)
    return masks


def sign_lsh_topk(queries: DataFrame, candidates: DataFrame, k: int = 10,
                  planes: int = 8, hamming: int = 0, id_col: str = "vec_id",
                  vec_col: str = "embedding") -> DataFrame:
    """ANN: candidates restricted to the query's sign bucket, optionally
    MULTI-PROBE (Lv et al. 2007, "Multi-probe LSH"): each query also
    probes every bucket within Hamming distance ``hamming`` of its own
    — recall rises from p^planes to the <=hamming-flip tail of the
    per-plane agreement binomial at the cost of a query-side-only
    fan-out (37x rows for planes=8, hamming=2; the candidate side still
    shuffles each vector to exactly ONE bucket, which is what matters
    at 100 TB). A (query, candidate) pair matches exactly one mask
    (c_bkt XOR q_bkt is fixed), so no pair dedup is needed."""
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("_q"),
                       sign_bucket_int(F.col(vec_col), planes).alias("_qbkt"))
    if hamming > 0:
        masks = F.array(*[F.lit(m) for m in hamming_masks(planes, hamming)])
        q = q.select(
            "query_id", "_q",
            F.explode(F.transform(
                masks, lambda m: F.col("_qbkt").bitwiseXOR(m)))
            .alias("_bkt"))
    else:
        q = q.withColumnRenamed("_qbkt", "_bkt")
    c = candidates.select(F.col(id_col).alias("neighbor_id"),
                          F.col(vec_col).alias("_c"),
                          sign_bucket_int(F.col(vec_col), planes)
                          .alias("_bkt"))
    sim = F.round(cosine(F.col("_q"), F.col("_c")), 6)
    pairs = (c.join(F.broadcast(q), "_bkt")
             .where(F.col("query_id") != F.col("neighbor_id"))
             .select("query_id", "neighbor_id", sim.alias("sim")))
    w = W.partitionBy("query_id").orderBy(F.col("sim").desc(),
                                          F.col("neighbor_id"))
    return (pairs.withColumn("rnk", F.row_number().over(w))
            .where(F.col("rnk") <= k))


def ivf_topk(queries: DataFrame, candidates: DataFrame,
             centroids: DataFrame, k: int = 10, nprobe: int = 1,
             id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """IVF ANN. ``centroids``: (centroid_id, centroid array<double>).
    Inverted lists = candidates keyed by nearest centroid; queries
    probe their ``nprobe`` nearest centroids."""
    cen = F.broadcast(centroids.select(
        F.col("centroid_id"), F.col("centroid").alias("_cen")))

    def assign(df, ident, vec, n):
        d = df.crossJoin(cen).select(
            ident, vec, "centroid_id",
            cosine(F.col(vec), F.col("_cen")).alias("_csim"))
        w = W.partitionBy(ident).orderBy(F.col("_csim").desc(),
                                         F.col("centroid_id"))
        return (d.withColumn("_r", F.row_number().over(w))
                .where(F.col("_r") <= n).drop("_r", "_csim"))

    c = assign(candidates.select(F.col(id_col).alias("neighbor_id"),
                                 F.col(vec_col).alias("_c")),
               "neighbor_id", "_c", 1)
    q = assign(queries.select(F.col(id_col).alias("query_id"),
                              F.col(vec_col).alias("_q")),
               "query_id", "_q", nprobe)
    sim = F.round(cosine(F.col("_q"), F.col("_c")), 6)
    pairs = (c.join(F.broadcast(q), "centroid_id")
             .where(F.col("query_id") != F.col("neighbor_id"))
             .select("query_id", "neighbor_id", sim.alias("sim"))
             .dropDuplicates(["query_id", "neighbor_id"]))
    w = W.partitionBy("query_id").orderBy(F.col("sim").desc(),
                                          F.col("neighbor_id"))
    return (pairs.withColumn("rnk", F.row_number().over(w))
            .where(F.col("rnk") <= k))


def label_centroids(vectors: DataFrame, label_col: str = "label",
                    vec_col: str = "embedding") -> DataFrame:
    """Coarse quantizer from a labeled column: per-label mean vector
    (posexplode + groupBy(label,pos) — map-side combinable)."""
    comp = vectors.select(
        F.col(label_col).alias("centroid_id"),
        F.posexplode(F.col(vec_col)).alias("pos", "val"))
    return (comp.groupBy("centroid_id", "pos")
            .agg(F.avg(F.col("val").cast("double")).alias("v"))
            .groupBy("centroid_id")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "v"))).alias("_pv"))
            .select("centroid_id",
                    F.transform("_pv", lambda s: s.getField("v")).alias("centroid")))


def _round6_decimal(x: float) -> float:
    """Round to 6 dp through the decimal path Spark's Round uses for
    doubles: BigDecimal.valueOf == shortest round-trip decimal repr
    (Python ``repr``), then HALF_UP. Matches F.round/DuckDB ROUND on
    exact ...5 decimal boundaries where binary-double emulation
    (sign * floor(abs * 1e6 + 0.5)) can be off by 1e-6."""
    from decimal import ROUND_HALF_UP, Decimal
    return float(Decimal(repr(float(x))).quantize(
        Decimal("0.000001"), rounding=ROUND_HALF_UP))


def blocked_gemm_pairs(vectors: DataFrame, threshold: float,
                       n_blocks: int = 32, id_col: str = "vec_id",
                       vec_col: str = "embedding") -> DataFrame:
    """Exact all-pairs cosine >= threshold via distributed blocked GEMM.

    The genuinely-can't-express-in-builtins case: a dense matmul. The
    HOF zip_with/aggregate form evaluates an interpreted O(dim) fold
    per PAIR; here each (block_a, block_b) tile is one BLAS sgemm over
    Arrow-delivered batches:

    - rows get a deterministic block id (``id % n_blocks``);
    - each block packs into ONE row (ids + vectors as a struct array);
    - the tile table is the block self-join on ``ba <= bb`` —
      n(n+1)/2 tiles, each tile's payload crossing the shuffle once;
    - ``mapInPandas`` normalizes both blocks (float64) and emits the
      thresholded entries of ``A_norm @ B_norm.T``, upper-triangle
      within diagonal tiles.

    No driver collect anywhere — tiles meet executor-side. At 100 TB
    the tile size is the memory knob (a block must fit in an Arrow
    batch); all-pairs stays O(n^2) by nature — THE scale answer is
    LSH/IVF pruning — but the constant factor is BLAS, not an
    interpreted fold: measured 34.6s -> 0.9s steady-state at sf0.1
    (5k x 5k, 64-dim) against the identical HOF/oracle output.
    """
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    blk = vectors.select(
        F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"),
        F.pmod(F.col(id_col), F.lit(n_blocks)).cast("int").alias("_b"))
    packed = blk.groupBy("_b").agg(
        F.array_sort(F.collect_list(F.struct("_id", "_v"))).alias("_rows"))
    a = packed.select(F.col("_b").alias("ba"), F.col("_rows").alias("pa"))
    b = packed.select(F.col("_b").alias("bb"), F.col("_rows").alias("pb"))
    tiles = a.join(b, F.col("ba") <= F.col("bb"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_a, out_b, out_s = [], [], []
            for ba, bb, pa, pb in zip(pdf["ba"], pdf["bb"],
                                      pdf["pa"], pdf["pb"]):
                ids_a = np.array([r["_id"] for r in pa], dtype=np.int64)
                ma = np.stack([np.asarray(r["_v"], dtype=np.float64)
                               for r in pa])
                ids_b = np.array([r["_id"] for r in pb], dtype=np.int64)
                mb = np.stack([np.asarray(r["_v"], dtype=np.float64)
                               for r in pb])
                na = np.linalg.norm(ma, axis=1)
                nb = np.linalg.norm(mb, axis=1)
                # dot-then-divide (not pre-normalized rows): the same
                # evaluation shape as the HOF/oracle quotient. Rounding
                # happens in two phases: a fast binary half-away-from-
                # zero pass prunes the tile to near/above-threshold
                # candidates (guard band 1e-6, the max divergence of
                # the two schemes), then the survivors re-round through
                # the DECIMAL path — Decimal(repr(x)) is the shortest
                # round-trip decimal, the same value Spark's Round
                # (BigDecimal.valueOf) and DuckDB ROUND quantize with
                # HALF_UP — so output values match F.round(sim, 6)
                # even on exact ...5 decimal boundaries the binary
                # emulation can flip.
                raw = (ma @ mb.T) / np.outer(na, nb)
                s = np.sign(raw) * np.floor(np.abs(raw) * 1e6 + 0.5) / 1e6
                ia, ib = np.nonzero(s >= threshold - 1e-6)
                if ba == bb:
                    keep = ids_a[ia] < ids_b[ib]
                    ia, ib = ia[keep], ib[keep]
                sv = np.array(
                    [_round6_decimal(v) for v in raw[ia, ib]],
                    dtype=np.float64) if ia.size else np.empty(0)
                keep = sv >= threshold
                ia, ib, sv = ia[keep], ib[keep], sv[keep]
                lo = np.minimum(ids_a[ia], ids_b[ib])
                hi = np.maximum(ids_a[ia], ids_b[ib])
                out_a.append(lo)
                out_b.append(hi)
                out_s.append(sv)
            yield pd.DataFrame({
                "vec_a": np.concatenate(out_a) if out_a else [],
                "vec_b": np.concatenate(out_b) if out_b else [],
                "sim": np.concatenate(out_s) if out_s else [],
            })

    return tiles.mapInPandas(run, schema="vec_a long, vec_b long, sim double")


def pq_topk(queries: DataFrame, candidates: DataFrame, k: int = 3,
            m_sub: int = 8, d_sub: int = 8, k_cent: int = 16,
            iters: int = 2, id_col: str = "vec_id",
            vec_col: str = "embedding") -> DataFrame:
    """Product-quantization ANN (Jegou, Douze & Schmid 2011, "Product
    quantization for nearest neighbor search") with asymmetric
    distance computation (ADC).

    Vectors are L2-normalized (so ADC dot products approximate
    cosine), split into ``m_sub`` subvectors of ``d_sub`` dims; each
    subspace learns ``k_cent`` centroids by L2 k-means — ALL subspaces
    train in ONE dataflow (rows are (vec_id, sub_idx, subvec); the
    centroid table keys on (sub_idx, cid) and broadcasts) — and every
    candidate compresses to ``m_sub`` one-byte codes. Queries build a
    LUT of per-subspace partial dot products against the centroids
    (|Q| * m_sub * k_cent rows, broadcast), and scoring is
    codes ⋈ LUT + a sum — the candidate VECTORS never participate in
    scoring, which is the PQ contract: a 64-float vector becomes 8
    bytes (32x compression, vs int8's 4x) and search touches only
    codes. Approximation quality is tracked in ANNRECALL_r{N}.json.

    Scale shape: training touches (n * m_sub) slim rows per iteration
    with a broadcast centroid table (m_sub * k_cent rows) and
    localCheckpoint per round (the k-means pattern); scoring fans
    codes out by |Q| — bounded query sets, the ADC regime. Rows-only
    registry entry (8 subspace k-means rounds are not reasonably
    SQL-replayable; ann_ivf_kmeans covers the oracled-kmeans shape).
    """
    def unit(vec):
        n = F.sqrt(F.aggregate(
            F.transform(vec, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0), lambda a, b: a + b))
        return F.when(n == 0, F.transform(vec, lambda x: F.lit(0.0))) \
            .otherwise(F.transform(vec, lambda x: x.cast("double") / n))

    def subrows(df, ident):
        subs = F.array(*[F.slice(unit(F.col(vec_col)), i * d_sub + 1, d_sub)
                         for i in range(m_sub)])
        return df.select(F.col(id_col).alias(ident),
                         F.posexplode(subs).alias("sub_idx", "sv"))

    cand_sub = subrows(candidates, "cid_v").localCheckpoint()

    # init: subvectors of the k_cent lowest candidate ids (deterministic)
    seed_ids = [r[0] for r in candidates.select(id_col)
                .orderBy(id_col).limit(k_cent).collect()]
    id_to_cid = F.create_map(*[F.lit(x) for pair in
                               ((sid, i) for i, sid in enumerate(seed_ids))
                               for x in pair])
    cen = (cand_sub.where(F.col("cid_v").isin(seed_ids))
           .select("sub_idx", id_to_cid[F.col("cid_v")].alias("cid"),
                   F.col("sv").alias("cen")).localCheckpoint())

    def l2(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0), lambda p, q: p + q)

    def assign(rows, ident):
        d = rows.join(F.broadcast(cen), "sub_idx")
        return (d.groupBy(ident, "sub_idx")
                .agg(F.min_by("cid", F.struct(l2(F.col("sv"),
                                                 F.col("cen")).alias("d"),
                                              F.col("cid"))).alias("code"),
                     F.first("sv").alias("sv")))

    for _ in range(iters):
        assigned = assign(cand_sub, "cid_v")
        new = (assigned.select("sub_idx", "code",
                               F.posexplode("sv").alias("pos", "val"))
               .groupBy("sub_idx", "code", "pos")
               .agg(F.avg("val").alias("v"))
               .groupBy("sub_idx", F.col("code").alias("cid"))
               .agg(F.array_sort(F.collect_list(F.struct("pos", "v")))
                    .alias("_pv"))
               .select("sub_idx", "cid",
                       F.transform("_pv", lambda s: s.getField("v"))
                       .alias("cen")))
        # empty clusters keep their previous centroid
        kept = cen.join(new.select("sub_idx", "cid"),
                        ["sub_idx", "cid"], "left_anti")
        cen = new.unionByName(kept).localCheckpoint()

    codes = assign(cand_sub, "cid_v").select(
        F.col("cid_v").alias("neighbor_id"), "sub_idx", "code")

    lut = (subrows(queries, "query_id")
           .join(F.broadcast(cen), "sub_idx")
           .select("query_id", "sub_idx", F.col("cid"),
                   F.aggregate(F.zip_with("sv", "cen",
                                          lambda x, y: x * y),
                               F.lit(0.0), lambda a, b: a + b).alias("p")))
    scored = (codes.join(F.broadcast(lut),
                         (codes["sub_idx"] == lut["sub_idx"])
                         & (codes["code"] == lut["cid"]))
              .groupBy("query_id", "neighbor_id")
              .agg(F.round(F.sum("p"), 6).alias("sim")))
    w = W.partitionBy("query_id").orderBy(F.col("sim").desc(),
                                          F.col("neighbor_id"))
    return (scored.where(F.col("query_id") != F.col("neighbor_id"))
            .withColumn("rnk", F.row_number().over(w))
            .where(F.col("rnk") <= k))
