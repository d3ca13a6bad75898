"""Multimodal query registrations (S09/L10 — tier S smoke; the decode
step is a deterministic fake, so no SQL oracle)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pydatalake_gen2_spark.registry import register
from pydatalake_gen2_spark.sources import multimodal


@register("s09_binary_source", duck_sql=None, tier="S")
def s09_binary_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """binaryFile scan of generated assets (path/length/content schema)."""
    assets = multimodal.materialize_fake_assets(spark, sf_dir, n=32)
    df = multimodal.read_binary(spark, assets)
    return df.select("path", "length")


@register("l10_multimodal_ingest", duck_sql=None, tier="S")
def l10_multimodal_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary ingest → mapInPandas decode (fake codec) → metadata join."""
    return multimodal.ingest_with_metadata(spark, sf_dir)
