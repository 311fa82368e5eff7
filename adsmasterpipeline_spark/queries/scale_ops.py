"""Scale-path operator queries: the distributed variants of assignment,
near-dup detection, ANN, multimodal, and streaming-shaped analytics.

Entries with an oracle are hash-checked against DuckDB; the
xxhash64-based ones (engine-specific hash) register rows-only and are
instead property-tested in tests/test_operators.py against their
md5-oracle twins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.assignment import assign_sequential, bucket_name
from ..operators.dedup import exact_dedup, minhash_lsh_pairs, simhash_pairs
from ..operators.multimodal import extract_features
from ..operators.similarity import (
    brute_force_topk, hamming_masks, ivf_topk, label_centroids,
    sign_lsh_topk,
)
from ..sources import load_table
from ..streaming.ingest import windowed_event_counts
from . import query


@query(
    "assign_scalable",
    """
    SELECT o_orderkey,
           'sitemap_bib_' || CAST(CAST(FLOOR((ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1) / 100)
                 AS BIGINT) + 1 AS VARCHAR) || '.xml' AS filename
    FROM orders
    """,
    "window", "scale",
    doc="W3 scale path: two-phase range-partitioned sequential assignment "
        "(operators/assignment.py) — must be BIT-IDENTICAL to the global "
        "row_number window the oracle uses, while never funnelling rows "
        "through a single partition.",
)
def assign_scalable(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    assigned = assign_sequential(o, "o_orderkey")
    return assigned.select(
        "o_orderkey", bucket_name(F.col("seq"), 100).alias("filename"))


def _hadamard_bkt_sql(planes: int = 8) -> str:
    """DuckDB expression mirroring operators/similarity.
    hadamard_bucket_int bit-for-bit: plane j's projection is the
    signed sum of floor(x*2^20) int64 components with sign
    (-1)^popcount((i-1) & j) — exact integer arithmetic, so engine
    summation order cannot flip a bucket bit. MSB-first fold matches
    the Spark side's a*2+b accumulation."""
    q = "CAST(FLOOR(CAST(x AS DOUBLE) * 1048576.0) AS BIGINT)"
    terms = []
    for j in range(1, planes + 1):
        proj = (f"list_sum(list_transform(embedding, (x,i) -> "
                f"CASE WHEN bit_count(CAST((i-1) & {j} AS BIGINT)) % 2 = 0 "
                f"THEN {q} ELSE -{q} END))")
        terms.append(f"(CASE WHEN {proj} >= 0 "
                     f"THEN {1 << (planes - j)} ELSE 0 END)")
    return " + ".join(terms)


@query(
    "ann_sign_lsh",
    f"""
    WITH b AS (
      SELECT vec_id, embedding,
             {_hadamard_bkt_sql(8)} AS bkt
      FROM embeddings
    ),
    probes AS (
      SELECT vec_id, embedding, xor(bkt, m.m) AS bkt
      FROM b, (SELECT unnest({hamming_masks(8, 4)!r}) AS m) m
      WHERE vec_id < 32
    ),
    pairs AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             ROUND(
               SUM(CAST(q.embedding[t.i] AS DOUBLE) * CAST(c.embedding[t.i] AS DOUBLE))
               / (sqrt(SUM(CAST(q.embedding[t.i] AS DOUBLE) * CAST(q.embedding[t.i] AS DOUBLE)))
                  * sqrt(SUM(CAST(c.embedding[t.i] AS DOUBLE) * CAST(c.embedding[t.i] AS DOUBLE)))),
               6) AS sim
      FROM probes q JOIN b c ON q.bkt = c.bkt AND q.vec_id <> c.vec_id,
           range(1, 65) t(i)
      GROUP BY q.vec_id, c.vec_id
    )
    SELECT query_id, neighbor_id, sim, rnk FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY sim DESC, neighbor_id) AS rnk
      FROM pairs
    ) WHERE rnk <= 3
    """,
    "vectors", "scale",
    doc="ANN via hyperplane-sign LSH with MULTI-PROBE (Lv et al. 2007): "
        "bucket = sign bits of 8 HADAMARD-MIXED projections (every "
        "plane sees all 64 components via integer-exact "
        "floor(x*2^20) sums — round-6 fix for the axis-aligned "
        "bucket's recall falling 0.43->0.35 from sf0.01 to sf0.1); "
        "each query probes its own bucket plus every bucket within "
        "Hamming distance 4 (163 XOR masks; round-8 retune from "
        "radius 3's 93 — the last sub-0.7 recall cell was this "
        "rung's 0.65 at sf0.01, and the wider ball lifts recall@3 "
        "to 0.85/0.89/0.97 at sf0.01/0.1/stress-1 for <=1.4x wall). "
        "The fan-out is QUERY-side only — candidates still shuffle "
        "to exactly one bucket — so the 100 TB posture is unchanged; "
        "probe rows are queries x masks, never corpus x masks. "
        "Honest ladder note: 163/256 buckets probed means ~64% of a "
        "UNIFORM corpus is scanned — on real clustered data the "
        "probed-bucket occupancy is what matters, and when scan "
        "fraction dominates cost the IVF/PQ rungs supersede this "
        "one. Tracked per-round in ANNRECALL_r{{N}}.json. "
        "Engine-portable integer math -> fully oracle-checked.",
)
def ann_sign_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.skew import spread_small_scan
    # input-skew fix (guide §2.5): the candidate-side norm fold and
    # Arrow bucket UDF run in the scan stage — a single local split
    # serialized them (A/B at sf0.1: 1.19 s -> 0.94 s; no-op on a
    # parallel scan)
    e = spread_small_scan(load_table(spark, sf_dir, "embeddings"))
    q = e.where(F.col("vec_id") < 32)
    return sign_lsh_topk(q, e, k=3, planes=8, hamming=4,
                         mix="hadamard").select(
        "query_id", "neighbor_id", "sim", "rnk")


@query(
    "streaming_windowed_counts",
    """
    SELECT make_timestamp(CAST(FLOOR(epoch_us(CAST(ts AS TIMESTAMP)) / 300000000)
                          AS BIGINT) * 300000000) AS window_start,
           event_type AS type, COUNT(*) AS n
    FROM events
    GROUP BY 1, 2
    """,
    "streaming",
    doc="Event-time tumbling-window aggregation (5-minute windows) — the "
        "batch evaluation of the Structured-Streaming plan in "
        "streaming/ingest.windowed_event_counts (§2.10).",
)
def streaming_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        F.col("ts").alias("event_ts"), F.col("event_type").alias("type"))
    return windowed_event_counts(ev, window="5 minutes")


@query(
    "dedup_exact_xxhash", None, "dedup", "scale",
    doc="Exact dedup on xxhash64 fingerprints (JVM-intrinsic hash; "
        "rows-only check — md5 twin `dedup_exact` is the oracle-checked "
        "variant).",
)
def dedup_exact_xxhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return exact_dedup(load_table(spark, sf_dir, "documents"))


@query(
    "minhash_lsh_neardup", None, "dedup", "scale",
    doc="Banded MinHash-LSH near-dup pairs with exact-Jaccard "
        "verification (6 hashes, 2 bands of 3 rows, 3-gram shingles). "
        "Band width is the scale knob: in-bucket pair work grows with "
        "collision probability j^rows; verification is exact, so "
        "narrower bands trade extra candidate checks for recall. "
        "Config sweep at sf0.1 vs exact all-pairs ground truth (256 "
        "true pairs >= 0.7): 12x6-row 2.0s/recall .984, 8x4-row 2.1s/"
        ".988, 6x3-row 1.4s/.988 — the signature aggregate is the "
        "dominant cost and scales with hash count, so 6 hashes wins "
        "at EQUAL measured recall; pinned by "
        "test_minhash_lsh_recall_vs_exact on the same config.",
)
def minhash_lsh_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return minhash_lsh_pairs(load_table(spark, sf_dir, "documents"),
                             num_hashes=6, bands=2,
                             jaccard_threshold=0.7)


@query(
    "simhash_neardup", None, "dedup", "scale",
    doc="64-bit SimHash near-dup pairs via 16-bit band pigeonholing + "
        "exact hamming verification.",
)
def simhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return simhash_pairs(load_table(spark, sf_dir, "documents"),
                         max_hamming=3)


@query(
    "ann_ivf", None, "vectors", "scale",
    doc="IVF ANN, the NO-TRAINING rung of the ANN ladder: "
        "label-centroid coarse quantizer (10 lists, no k-means pass "
        "needed), nprobe=6. Ladder position (SCALE.md): with a "
        "label-derived quantizer the lists barely correlate with "
        "cosine geometry on the synthetic embeddings, so recall "
        "tracks the PROBED FRACTION (~nprobe/10 of the corpus is "
        "scanned) rather than improving with list count — r6's "
        "nprobe=3 measured 0.46-0.63, nprobe=5 0.77/0.74/0.79 at "
        "sf0.01/sf0.1/sf1 with 0.74 the weakest tier-rung of "
        "ANNRECALL_r09; the round-10 retune to nprobe=6 (probed "
        "fraction 6/10) oracle-replayed 0.80/0.875/0.885 at "
        "sf0.01/sf0.1/sf1 at equal query wall time (split "
        "truth/query timer: 1.9-2.4s at the small tiers, 9.4s query "
        "vs 21.4s truth at sf1 — the +20% candidate scan is "
        "noise-level; every rung >= 0.75 at every tier is the r10 "
        "floor, tracked in ANNRECALL_r10). When recall per scanned "
        "row matters, ann_ivf_kmeans (learned centroids, same probe "
        "cost) supersedes this; ann_ivf exists as the fallback when "
        "no training pass is possible. Cross-checked against brute "
        "force in tests.",
)
def ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    # NOTE (r11 measurement): collecting the 10-row centroid table to
    # the driver (to avoid the lazy plan referencing the aggregation
    # from both assign branches) measured SLOWER (1.75 s vs 1.32 s at
    # sf0.1): AQE exchange-stage reuse already dedups the identical
    # subtrees at runtime, and the eager collect serializes the jobs.
    cen = label_centroids(e)
    q = e.where(F.col("vec_id") < 32)
    return ivf_topk(q, e, cen, k=3, nprobe=6).select(
        "query_id", "neighbor_id", "sim", "rnk")


@query(
    "ann_brute_force", None, "vectors", "scale",
    doc="Exact cosine top-k baseline over the full candidate scan "
        "(cosine_topk is its oracle-checked 8-query variant).",
)
def ann_brute_force(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.skew import spread_small_scan
    # input-skew fix (guide §2.5), same shape as cosine_topk (A/B at
    # sf0.1: 0.64 s -> 0.40 s; no-op on a parallel scan)
    e = spread_small_scan(load_table(spark, sf_dir, "embeddings"))
    q = e.where(F.col("vec_id") < 32)
    return brute_force_topk(q, e, k=3).select(
        "query_id", "neighbor_id", "sim", "rnk")


@query(
    "multimodal_features", None, "multimodal",
    doc="Multimodal plumbing: documents' text bytes as opaque media "
        "payloads -> Arrow-batched mapInPandas feature extraction "
        "(decode stubbed deterministically; schema/batching real).",
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    assets = d.select(
        F.col("doc_id").alias("asset_id"),
        F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
                     (F.col("doc_id") % 3 + 1).cast("int")).alias("kind"),
        F.encode("text", "utf-8").alias("media"),
        F.struct(F.lit("text/plain").alias("mime"),
                 F.lit(None).cast("int").alias("width"),
                 F.lit(None).cast("int").alias("height"),
                 (F.col("n_chars") * 10).cast("int").alias("duration_ms"))
        .alias("meta"),
    )
    return extract_features(assets, fake_decode=True)


@query(
    "video_frames", None, "multimodal",
    doc="Video frame sampling + per-frame features: documents' bytes as "
        "fake video payloads -> mapInPandas frame fan-out (bytes cross "
        "the Arrow boundary once per asset, frames generated "
        "executor-side; see operators/multimodal.video_frame_features).",
)
def video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import video_frame_features
    d = load_table(spark, sf_dir, "documents")
    assets = d.select(
        F.col("doc_id").alias("asset_id"),
        F.lit("video").alias("kind"),
        F.encode("text", "utf-8").alias("media"),
        F.struct(F.lit("video/fake").alias("mime"),
                 F.lit(None).cast("int").alias("width"),
                 F.lit(None).cast("int").alias("height"),
                 (F.col("n_chars") * 10).cast("int").alias("duration_ms"))
        .alias("meta"),
    ).where(F.col("doc_id") % 5 == 0)
    return video_frame_features(assets, every_ms=1000)


@query(
    "salted_group_counts",
    """
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n
    FROM documents GROUP BY lang
    """,
    "scale",
    doc="Skew-safe two-stage aggregation (operators/skew.salted_agg_count): "
        "pre-aggregate on (key, salt) to bound per-task state, then "
        "combine per key — the explicit form of map-side partial "
        "aggregation for skewed keys and non-algebraic aggregates. The "
        "salt is internal: output is bit-identical to the plain GROUP BY "
        "the oracle runs, which is exactly the equivalence that makes "
        "salting safe to apply at 100 TB.",
)
def salted_group_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.skew import salted_agg_count
    d = load_table(spark, sf_dir, "documents")
    return salted_agg_count(d, "lang").select(
        "lang", F.col("count").cast("long").alias("n"))


@query(
    "ann_pq", None, "vectors", "scale",
    doc="IVF+PQ ANN in the re-ranking configuration (IVFADC+R, Jegou "
        "et al. 2011): driver-trained codebooks on a bounded sample "
        "(8 subspaces x 8 dims, 64 centroids each + a 16-list coarse "
        "quantizer), one shuffle-free Arrow encode pass (a 64-float "
        "vector becomes ~9 bytes), ADC scoring restricted to each "
        "query's probed IVF lists, then EXACT cosine re-rank of the "
        "ADC pool — PQ generates candidates, the output sims are "
        "exact. Fixes r04's recall cliff (0.33 at sf0.1): ADC "
        "quantization error now only costs recall when the true "
        "neighbor leaves the re-rank pool entirely. The POOL SCALES "
        "with corpus size (round 6: with list occupancy ~n/16 at "
        "fixed k_coarse, a fixed pool lets ADC noise in dense "
        "clusters squeeze true neighbors out — recall measured 0.81 "
        "at sf0.1 but 0.50 at the 10x stress SF; a pool of "
        "max(48, n/50) exact re-ranks recovers 0.81 at sf1 at "
        "IDENTICAL runtime since the re-rank GEMM is on vectors "
        "already in memory, and lifts sf0.01/sf0.1 to 0.91/0.83 "
        "via nprobe 10->12). Round-11 retune (VERDICT r10 task 6): "
        "k_cent 64->128 — finer subspace codebooks halve ADC "
        "quantization noise so the true neighbor survives into the "
        "re-rank pool more often; measured recall@3 "
        "0.91/0.83/0.81 -> 0.99/0.875/0.90 at sf0.01/0.1/1, priced "
        "with the split truth/query timer at ~flat query wall (the "
        "LUT is [Q, 8, 128] instead of [Q, 8, 64] — still "
        "driver-trivial; encode GEMM doubles one tiny inner dim). "
        "Quality tracked in ANNRECALL_r{N}.json. "
        "Rows-only: codebook training is not SQL-replayable "
        "(ann_ivf_kmeans covers the oracled-kmeans shape).",
)
def ann_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import pq_topk

    e = load_table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < 32)
    # rerank=None: the pool auto-scales with n, counted inside
    # pq_topk's single training-collect job (no separate eager count
    # at plan-build time — ADVICE r6)
    return pq_topk(q, e, k=3, nprobe=12, k_cent=128).select(
        "query_id", "neighbor_id", "sim", "rnk")


@query(
    "image_phash_neardup", None, "multimodal", "dedup",
    doc="Multimodal near-duplicate detection end-to-end: deterministic "
        "P5 netpbm images are rendered from each document's normalized "
        "text (64x4 grayscale raster — REAL binary payloads), decoded "
        "by the REAL netpbm parser inside Arrow-batched mapInPandas "
        "into 63 block-mean strips, hashed to a 63-bit Blockhash-style "
        "perceptual hash (strip mean vs exact median — every strip "
        "contributes a bit), then near-dup pairs "
        "come from the SAME banded pigeonhole join as SimHash (4x16-bit "
        "bands catch every pair at hamming <= 3; bit_count verify). "
        "Near-identical documents render near-identical rasters, so "
        "planted text near-dups surface as low-hamming image pairs — "
        "the image analogue of the text dedup family. Scale shape: "
        "media bytes cross Arrow once and are dropped executor-side; "
        "only (id, 8-byte hash) rides the band shuffle; no SQL oracle "
        "possible (binary decode), so rows-only + pytest parity. "
        "Docs under 128 normalized chars are gated OUT (like the "
        "video path's 256-char gate): below that, rows 2-4 of the "
        "64x4 raster are all space padding and each 63-strip mean "
        "degenerates to a space/non-space indicator, so the hash "
        "would depend only on word-length layout — short unrelated "
        "docs would collide (hamming-0 false near-dups) and the "
        "equal-hash band buckets would blow up quadratically. Short "
        "docs belong to the text SimHash path (simhash_neardup).",
)
def image_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import (
        blockhash63, extract_features, spread_for_decode,
    )
    from .text import _norm_text

    # slim projection first, then scale-adaptive spread: the bench
    # tiers' documents table is ONE parquet split, which serialized the
    # whole normalize+render+decode pipeline onto a single core
    # (measured 1.6 s of the query's 2.6 s at sf0.1); at real scale the
    # scan is already parallel and this adds no shuffle
    d = spread_for_decode(
        load_table(spark, sf_dir, "documents").select("doc_id", "text"))
    ascii_txt = F.regexp_replace(_norm_text(), "[^a-z0-9 ]", "")
    # degenerate-raster gate: require at least two 64-char raster rows
    # of real content (see docstring) — shorter docs are the text
    # SimHash path's job, not the image path's
    d = d.where(F.length(ascii_txt) >= 128)
    raster = F.encode(
        F.rpad(F.substring(ascii_txt, 1, 256), 256, " "), "utf-8")
    payload = F.concat(F.encode(F.lit("P5\n64 4\n255\n"), "utf-8"),
                       raster)
    assets = d.select(
        F.col("doc_id").alias("asset_id"),
        F.lit("image").alias("kind"),
        payload.alias("media"),
        F.struct(F.lit("image/x-portable-graymap").alias("mime"),
                 F.lit(64).alias("width"), F.lit(4).alias("height"),
                 F.lit(None).cast("int").alias("duration_ms"))
        .alias("meta"))
    feats = extract_features(assets, fake_decode=False, dims=63)
    sig = feats.where(F.col("decode_ok")).select(
        F.col("asset_id"), blockhash63(F.col("feature")).alias("ph"))
    from ..operators.dedup import banded_hamming_pairs
    pairs = banded_hamming_pairs(sig, "asset_id", "ph", max_hamming=3)
    return pairs.select("id_a", "id_b",
                        F.col("hamming").cast("long").alias("hamming"))


@query(
    "audio_fingerprint_neardup", None, "multimodal", "dedup",
    doc="Audio near-duplicate detection end-to-end: each document's "
        "normalized text renders to a REAL 8-bit PCM WAV payload of "
        "its own duration (stdlib wave writer, executor-side; no "
        "padding/cycling so edits stay window-local), the REAL stdlib "
        "wave parser decodes it back into a 64-window loudness "
        "envelope (operators/multimodal.decode_audio — no fake path "
        "anywhere), consecutive-window loudness DIFFERENCES sign into "
        "a 63-bit Haitsma-Kalker-shape fingerprint (diffhash63 — "
        "gain-invariant, discriminative where a median threshold on "
        "near-constant envelopes is not), and pairs come from the "
        "SHARED 4x16-band pigeonhole join (exact at hamming <= 3). "
        "Completes the modality set: text (SimHash), image "
        "(Blockhash), audio (envelope hash) all feed one banding/"
        "verify implementation (operators/dedup.banded_hamming_pairs)."
        " Scale shape identical to the image path: media bytes cross "
        "Arrow once per direction, only 8-byte hashes ride the "
        "shuffle. Rows-only (binary decode has no SQL oracle).",
)
def audio_fingerprint_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import banded_hamming_pairs
    from ..operators.multimodal import (
        diffhash63, spread_for_decode, synth_wav_assets,
    )
    from .text import _norm_text

    # scale-adaptive spread before the two Arrow passes (WAV render +
    # decode): one local parquet split otherwise serializes them
    d = spread_for_decode(
        load_table(spark, sf_dir, "documents").select("doc_id", "text"))
    docs = d.select("doc_id", _norm_text().alias("norm"))
    assets = synth_wav_assets(docs, text_col="norm")
    feats = extract_features(assets, fake_decode=False, dims=64)
    sig = feats.where(F.col("decode_ok")).select(
        F.col("asset_id"), diffhash63(F.col("feature")).alias("fp"))
    pairs = banded_hamming_pairs(sig, "asset_id", "fp", max_hamming=3)
    return pairs.select("id_a", "id_b",
                        F.col("hamming").cast("long").alias("hamming"))


@query(
    "video_phash_neardup", None, "multimodal", "dedup",
    doc="Video near-duplicate detection end-to-end, completing the "
        "modality set (text SimHash, image Blockhash, audio diff-hash "
        "— all through operators/dedup.banded_hamming_pairs): each "
        "document renders to a REAL RAWV container (8x8 grayscale "
        "frames = 64-byte text chunks, duration = doc length), the "
        "REAL RAWV parser seeks+decodes every 1s frame tick into "
        "8 block means (operators/multimodal.decode_video_frame), the "
        "per-frame features flatten IN TIME ORDER into one sequence "
        "per video (last value repeated to 64 — short videos keep a "
        "distinct tail), and consecutive-value differences sign into "
        "the 63-bit fingerprint (diffhash63). A text edit is a frame-"
        "local block change (2-3 bits); unrelated docs differ "
        "everywhere. Scale shape: media bytes cross Arrow once and "
        "fan out to frames executor-side; the per-video aggregate "
        "shuffles (asset_id, 8 doubles) per frame, never pixels; "
        "8-byte hashes ride the band join. Rows-only (binary decode "
        "has no SQL oracle).",
)
def video_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import banded_hamming_pairs
    from ..operators.multimodal import (
        diffhash63, synth_rawv_assets, video_frame_features,
    )
    from .text import _norm_text

    # NO spread_for_decode here (unlike the image/audio paths): the
    # RAWV render+frame-decode python work is light (~0.5 s serial at
    # sf0.1) and the A/B measured the extra exchange + 32-task stage
    # overhead as a net regression (1.26 s -> 1.54 s best-of-3)
    d = load_table(spark, sf_dir, "documents")
    # duration gate: a fingerprint needs enough frames to carry
    # signal — below 4 frames (256 chars) the 63-bit hash holds < 32
    # discriminative diffs and same-duration clips collide at random
    # (clips that short belong to the image/audio dedup paths)
    docs = d.select("doc_id", _norm_text().alias("norm")) \
        .where(F.length("norm") >= 256)
    assets = synth_rawv_assets(docs, text_col="norm")
    frames = video_frame_features(assets, every_ms=1000, dims=8,
                                  fake_decode=False)
    seq = (frames.where(F.col("decode_ok"))
           .groupBy(F.col("asset_id"))
           .agg(F.flatten(F.transform(
               F.array_sort(F.collect_list(F.struct("frame_idx",
                                                    "feature"))),
               lambda r: r.getField("feature"))).alias("vals")))
    padded = F.slice(
        F.concat("vals", F.array_repeat(F.element_at("vals", -1), 64)),
        1, 64)
    sig = seq.select("asset_id", diffhash63(padded).alias("fp"))
    pairs = banded_hamming_pairs(sig, "asset_id", "fp", max_hamming=3)
    return pairs.select("id_a", "id_b",
                        F.col("hamming").cast("long").alias("hamming"))
