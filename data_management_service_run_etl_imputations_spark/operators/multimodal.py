"""Multimodal columns: image/audio/video as opaque ``binary`` payloads with
typed metadata (engine extension; BASELINE.json north_star).

The Spark-side plumbing is real and tested — schema, Arrow batch shapes,
``mapInPandas`` partition flow, metadata derivation. The actual media
decoding is STUBBED (``decode=None`` → deterministic fake features;
``strict=True`` → ``NotImplementedError``): image/audio libraries are not in
this container. Swap ``_fake_decode`` for a PIL/librosa call and nothing
else changes — the distributed shape (binary column in, feature array out,
Arrow-batched, no driver collect) is the deliverable.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField("mime", T.StringType()),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def with_binary_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Cheap JVM-side metadata over a binary column: byte length + SHA-256
    content hash (the dedup/integrity key for multimodal corpora)."""
    return df.withColumn(
        "n_bytes", F.length(F.col(payload_col)).cast("long")
    ).withColumn("content_sha256", F.sha2(F.col(payload_col), 256))


def _fake_decode(payload: bytes, dims: int) -> list[float]:
    """Deterministic stand-in for a media decoder: a tiny byte-histogram
    feature. Same payload → same feature, any worker, any run."""
    import numpy as np

    arr = np.frombuffer(payload or b"\x00", dtype=np.uint8)
    hist, _ = np.histogram(arr, bins=dims, range=(0, 256))
    total = hist.sum() or 1
    return (hist / total).astype("float32").tolist()


def extract_features(
    assets: DataFrame,
    dims: int = 16,
    batch_size: int = 256,
    strict: bool = False,
) -> DataFrame:
    """Decode/feature-extract binary payloads via ``mapInPandas``.

    Arrow streams batches of (asset_id, kind, payload) into Python; each
    batch yields (asset_id, kind, n_bytes, feature). Partitioning is
    preserved — no shuffle, no driver involvement; executor memory is
    bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``.

    ``strict=True`` raises ``NotImplementedError`` — the honest marker that
    real decoding needs a media library not present in this container.
    """
    if strict:
        raise NotImplementedError(
            "real media decoding requires PIL/librosa/ffmpeg — not available "
            "in this environment; use strict=False for the deterministic "
            "fake-decode plumbing"
        )

    def decode_batches(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            features = [
                _fake_decode(p, dims) for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(lambda b: len(b or b"")),
                    "feature": features,
                }
            )

    return assets.select("asset_id", "kind", "payload").mapInPandas(
        decode_batches, FEATURE_SCHEMA
    )


def frame_sample_plan(
    assets: DataFrame, every_n: int = 10, max_frames: int = 8
) -> DataFrame:
    """Video frame-sampling *plan*: one output row per (asset, frame_index)
    — the explode that precedes per-frame decode. Frame count is taken from
    ``meta['n_frames']`` (decode-free); the per-frame pixel fetch is the
    stubbed step."""
    n_frames = F.coalesce(
        F.element_at(F.col("meta"), F.lit("n_frames")).cast("int"), F.lit(0)
    )
    idx = F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)), F.lit(every_n))
    return (
        assets.filter(F.col("kind") == "video")
        .withColumn("frame_index", F.explode(F.slice(idx, 1, max_frames)))
        .select("asset_id", "frame_index")
    )
