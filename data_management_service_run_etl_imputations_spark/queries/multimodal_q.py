"""Multimodal-column queries: binary payload metadata (oracle-checked) and
the Arrow/mapInPandas feature-extraction plumbing (rows-only; decode is a
deterministic fake — see operators/multimodal.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_management_service_run_etl_imputations_spark.operators.multimodal import (
    extract_features,
    with_binary_metadata,
)
from data_management_service_run_etl_imputations_spark.queries import register
from data_management_service_run_etl_imputations_spark.schemas import load_table


def _docs_as_assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents re-typed as binary assets (payload = UTF-8 bytes of text) —
    the testdata carries no real media, so the binary column is synthesized
    deterministically; everything downstream treats it as opaque bytes."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.lit("image").alias("kind"),
        F.encode("text", "UTF-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.create_map(F.lit("source"), F.col("source")).alias("meta"),
    )


@register(
    "multimodal_binary_metadata",
    oracle="""
        SELECT doc_id AS asset_id,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
               sha256(text) AS content_sha256
        FROM documents
    """,
)
def multimodal_binary_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JVM-side binary metadata: byte length + SHA-256 content hash (the
    integrity/dedup key for media corpora)."""
    assets = _docs_as_assets(spark, sf_dir)
    return with_binary_metadata(assets).select("asset_id", "n_bytes", "content_sha256")


@register("multimodal_extract_features")
def multimodal_extract_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas feature extraction over binary payloads: Arrow-batched,
    partition-preserving, no driver collect. Decode is a deterministic fake
    (byte histogram) — the plumbing (schema, batching, UDF signature) is the
    real deliverable; swap in a media decoder without touching the plan."""
    assets = _docs_as_assets(spark, sf_dir)
    feats = extract_features(assets, dims=16)
    return feats.select(
        "asset_id",
        "kind",
        "n_bytes",
        F.round(F.element_at("feature", 1).cast("double"), 6).alias("f0"),
        F.size("feature").alias("feature_dims"),
    )
