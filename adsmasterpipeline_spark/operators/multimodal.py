"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque ``binary`` columns with a typed metadata struct;
all per-asset compute (decode, resize, feature extraction, frame
sampling) runs as Arrow-batched ``mapInPandas`` so bytes never leave
the executor and batches amortize Python crossing costs.

The actual codecs (PIL/ffmpeg/librosa) are NOT in this container, so
``decode_image`` raises ``NotImplementedError`` unless a deterministic
fake is requested — the Spark-side plumbing (schema, partitioning,
batch shape, UDF signatures) is real and tested either way.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ASSET_SCHEMA = T.StructType([
    T.StructField("asset_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),      # image|audio|video
    T.StructField("media", T.BinaryType(), True),       # opaque payload
    T.StructField("meta", T.StructType([
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]), True),
])

FEATURE_SCHEMA = ("asset_id long, kind string, n_bytes long, "
                  "feature array<double>, decode_ok boolean, error string")


def decode_image(payload: bytes):
    """Real decode would go through PIL; stubbed in this container."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError:
        raise NotImplementedError(
            "image codecs not available in this environment; "
            "use fake_decode=True for deterministic plumbing tests")
    raise NotImplementedError("PIL path intentionally left to deployment")


def _fake_feature(payload: bytes, dims: int = 8) -> list[float]:
    """Deterministic stand-in feature: byte-histogram moments. Keeps the
    full pipeline (schema, batching, ranking) testable without codecs."""
    if not payload:
        return [0.0] * dims
    return [payload[i % len(payload)] / 255.0 for i in range(dims)]


def extract_features(assets: DataFrame, fake_decode: bool = True,
                     dims: int = 8) -> DataFrame:
    """Per-asset feature extraction over mapInPandas. One pass over the
    binary column; output is a narrow feature table (the wide media
    bytes are dropped executor-side, never shuffled)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, oks, errs = [], [], []
            for payload in pdf["media"]:
                try:
                    if fake_decode:
                        feats.append(_fake_feature(payload, dims))
                    else:
                        feats.append(decode_image(payload))
                    oks.append(True)
                    errs.append(None)
                except NotImplementedError as e:
                    feats.append(None)
                    oks.append(False)
                    errs.append(str(e)[:100])
            yield pd.DataFrame({
                "asset_id": pdf["asset_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["media"].map(lambda b: len(b) if b is not None else 0),
                "feature": feats,
                "decode_ok": oks,
                "error": errs,
            })

    return assets.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample_plan(assets: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one output row per frame timestamp
    (JVM-side sequence — the decode itself would consume this plan in a
    mapInPandas pass)."""
    video = assets.where(F.col("kind") == "video")
    n_frames = F.greatest(
        (F.coalesce(F.col("meta.duration_ms"), F.lit(0)) / every_ms)
        .cast("int"), F.lit(0))
    return video.select(
        "asset_id",
        F.explode(F.sequence(F.lit(0), n_frames)).alias("frame_idx"),
    ).withColumn("ts_ms", F.col("frame_idx") * every_ms)


def fake_assets(spark, n: int = 64) -> DataFrame:
    """Deterministic synthetic asset table for tests."""
    rows = []
    kinds = ("image", "audio", "video")
    for i in range(n):
        kind = kinds[i % 3]
        payload = bytes((i * j) % 256 for j in range(32 + (i % 5) * 16))
        rows.append((i, kind, payload,
                     ("application/octet-stream", 4, 4,
                      1000 * (i % 4) if kind == "video" else None)))
    return spark.createDataFrame(rows, ASSET_SCHEMA)
