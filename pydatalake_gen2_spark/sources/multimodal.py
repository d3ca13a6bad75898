"""Multimodal columns (S09/L10 + task-brief extension): image/audio/video
as opaque BINARY columns with typed metadata.

The Spark-side plumbing is real — binaryFile source, schema, Arrow-batched
mapInPandas decode/feature/resize/frame-sample operators with correct
batch shapes — while the actual codec step is stubbed (image/audio libs
are not in this container): `decode_image` raises NotImplementedError
unless `fake=True`, in which case a clearly-marked deterministic fake
decoder (bytes → synthetic dimensions/features) runs so the pipeline is
testable end-to-end.
"""

from __future__ import annotations

import hashlib
import os
import tempfile
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Schema of a decoded image record (metadata typed, content opaque).
DECODED_SCHEMA = (
    "path STRING, doc_id BIGINT, n_bytes BIGINT, format STRING, "
    "width INT, height INT, feat ARRAY<DOUBLE>"
)


def materialize_fake_assets(spark: SparkSession, sf_dir: str, n: int = 64) -> str:
    """Write deterministic fake 'image' blobs (one per document, derived
    from the doc text) so the binary pipeline has real files to scan."""
    out = tempfile.mkdtemp(prefix="mm_assets_")
    docs = (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .select("doc_id", "text")
        .limit(n)
        .collect()
    )
    for r in docs:
        blob = hashlib.sha256(r["text"].encode()).digest() * 8  # 256 bytes
        with open(os.path.join(out, f"doc_{r['doc_id']:06d}.img"), "wb") as f:
            f.write(b"FAKEIMG0" + blob)
    return out


def read_binary(spark: SparkSession, path: str, glob: str = "*.img") -> DataFrame:
    """S09: binaryFile source → (path, modificationTime, length, content)."""
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
    )


def decode_image(content: bytes, fake: bool = False) -> tuple[str, int, int, list[float]]:
    """Codec stub. Real deployment: PIL/opencv decode → (format, w, h, feat).
    STUB: raises unless fake=True (libs not in container)."""
    if not fake:
        raise NotImplementedError(
            "image codecs not available in this environment; pass fake=True"
        )
    # Deterministic fake: dimensions + an 8-dim feature from the bytes.
    h = hashlib.sha256(content).digest()
    width, height = 64 + h[0] % 64, 64 + h[1] % 64
    feat = [round(b / 255.0, 6) for b in h[2:10]]
    return "fakeimg", width, height, feat


def decode_batch(
    df: DataFrame, fake: bool = True, batch_hint: int = 256
) -> DataFrame:
    """mapInPandas decode: Arrow batches of (path, content) in, typed
    metadata + feature vector out. The per-batch shape (iterator of
    pandas DataFrames) is exactly what a real codec UDF needs at scale —
    batch-level amortization, no per-row Python dispatch."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                fmt, w, hgt, feat = decode_image(bytes(content), fake=fake)
                doc_id = int(os.path.basename(path).split("_")[1].split(".")[0])
                rows.append((path, doc_id, len(content), fmt, w, hgt, feat))
            yield pd.DataFrame(
                rows,
                columns=[
                    "path", "doc_id", "n_bytes", "format", "width", "height", "feat",
                ],
            )

    return df.select("path", "content").mapInPandas(run, DECODED_SCHEMA)


def resize_batch(
    df: DataFrame, target_w: int = 32, target_h: int = 32, fake: bool = True
) -> DataFrame:
    """Image-resize stub over mapInPandas: 1→1 row, content transformed.
    Real deployment swaps the body for PIL/cv2 resize; the Spark-side
    contract (binary in, binary + new dims out, Arrow-batched) is what
    matters at scale. STUB: deterministic fake (content truncated/padded
    to target_w*target_h bytes) unless a real codec is wired in."""
    if not fake:
        raise NotImplementedError(
            "image codecs not available in this environment; pass fake=True"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        size = target_w * target_h
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                data = bytes(content)
                # ljust guard: empty payloads still honor the stub's
                # len(content) == w*h size invariant (null-byte canvas).
                resized = (data * (size // max(len(data), 1) + 1))[:size].ljust(
                    size, b"\x00"
                )
                rows.append((path, target_w, target_h, resized))
            yield pd.DataFrame(
                rows, columns=["path", "width", "height", "content"]
            )

    return df.select("path", "content").mapInPandas(
        run, "path STRING, width INT, height INT, content BINARY"
    )


def frame_sample(
    df: DataFrame, every_n_bytes: int = 64, fake: bool = True
) -> DataFrame:
    """Video-style frame sampling stub: one output row per sampled 'frame'
    (byte window) — demonstrates the 1→N mapInPandas shape used for
    real frame extraction."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                data = bytes(content)
                for i in range(0, len(data), every_n_bytes):
                    window = data[i : i + every_n_bytes]
                    rows.append(
                        (path, i // every_n_bytes, hashlib.md5(window).hexdigest())
                    )
            yield pd.DataFrame(rows, columns=["path", "frame_idx", "frame_sig"])

    return df.select("path", "content").mapInPandas(
        run, "path STRING, frame_idx INT, frame_sig STRING"
    )


def ingest_with_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L10: binary ingest joined to the documents metadata table."""
    assets = materialize_fake_assets(spark, sf_dir)
    decoded = decode_batch(read_binary(spark, assets), fake=True)
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
        "doc_id", "lang", "source"
    )
    return decoded.join(docs, "doc_id").select(
        "doc_id", "lang", "source", "n_bytes", "format", "width", "height"
    )
