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


@register("mm_resize", duck_sql=None, tier="S")
def mm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MM-RESIZE: binary ingest → mapInPandas resize (stubbed codec; real
    Arrow-batched 1→1 plumbing). Output is scalar metadata only — the
    resized payload stays engine-side (driver canonicalizers don't hash
    binary), its size invariant is asserted via length()."""
    from pyspark.sql import functions as F

    assets = multimodal.materialize_fake_assets(spark, sf_dir, n=32)
    raw = multimodal.read_binary(spark, assets)
    out = multimodal.resize_batch(raw, target_w=16, target_h=16)
    return out.select(
        "path", "width", "height", F.length("content").alias("n_bytes")
    )


@register("mm_frame_sample", duck_sql=None, tier="S")
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MM-FRAME-SAMPLE: binary ingest → mapInPandas 1→N frame extraction
    (byte-window stub standing in for a video codec; the Arrow batch
    shape, schema and fan-out are the real thing). Deterministic output:
    md5 signature per sampled window."""
    assets = multimodal.materialize_fake_assets(spark, sf_dir, n=32)
    raw = multimodal.read_binary(spark, assets)
    return multimodal.frame_sample(raw, every_n_bytes=64)
