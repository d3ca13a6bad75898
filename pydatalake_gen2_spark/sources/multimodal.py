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
import math
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
    from the doc text) so the binary pipeline has real files to scan.

    Round-7 oracle-ability rework: the payload is the ASCII hex digest
    repeated (8 + 4*64 = 264 bytes, same length as the old raw-digest
    form) instead of raw digest bytes, and the doc set is ORDER BY
    doc_id (was an unordered limit). Every downstream derivation —
    re-hash, byte windows, sizes, names — is then reconstructable by a
    SQL oracle whose hash functions only accept VARCHAR (DuckDB 1.0),
    which upgraded s09/l10/mm_resize/mm_frame_sample from rows-only to
    hash-matched. The binaryFile scan and Arrow plumbing are unchanged:
    Spark still reads opaque BINARY and hashes BYTES."""
    out = tempfile.mkdtemp(prefix="mm_assets_")
    docs = (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .select("doc_id", "text")
        .orderBy("doc_id")
        .limit(n)
        .collect()
    )
    for r in docs:
        blob = hashlib.sha256(r["text"].encode()).hexdigest().encode() * 4
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
    # Deterministic fake: dimensions + an 8-dim feature from the HEX
    # digest (hex pairs, not raw bytes — the derivation a VARCHAR-only
    # SQL oracle can replay; see materialize_fake_assets).
    h = hashlib.sha256(content).hexdigest()
    width = 64 + int(h[0:2], 16) % 64
    height = 64 + int(h[2:4], 16) % 64
    feat = [round(int(h[4 + 2 * i : 6 + 2 * i], 16) / 255.0, 6) for i in range(8)]
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


# ---------------------------------------------------------------------------
# REAL codecs within stdlib constraints (no PIL/cv2 in the container):
# PNG via zlib+struct, WAV via the stdlib wave module. These upgrade the
# decode path from "honest stub" to a working end-to-end pipeline —
# swap in PIL/libvips kernels on a cluster image for full formats.
# ---------------------------------------------------------------------------

import struct
import zlib

PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def encode_png(width: int, height: int, rgb: bytes) -> bytes:
    """Minimal truecolor 8-bit PNG encoder (filter 0 rows, one IDAT)."""
    if len(rgb) != width * height * 3:
        raise ValueError("rgb must be width*height*3 bytes")
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    raw = b"".join(
        b"\x00" + rgb[y * width * 3 : (y + 1) * width * 3] for y in range(height)
    )
    return (
        PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> tuple[int, int, bytes]:
    """Minimal PNG decoder: 8-bit RGB, filters 0 (None), 1 (Sub), 2 (Up).
    Returns (width, height, rgb bytes). Raises NotImplementedError on
    formats outside that envelope — honest about its limits."""
    if data[:8] != PNG_SIG:
        raise ValueError("not a PNG")
    pos, w, h, idat = 8, None, None, b""
    while pos + 8 <= len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + ln]
        pos += 12 + ln
        if tag == b"IHDR":
            w, h, bitdepth, colortype, comp, filt_m, interlace = struct.unpack(
                ">IIBBBBB", body[:13]
            )
            if bitdepth != 8 or colortype != 2:
                raise NotImplementedError("only 8-bit truecolor RGB PNGs")
            if comp != 0 or filt_m != 0 or interlace != 0:
                # Adam7 data decoded with the sequential layout would be
                # silently-wrong pixels — refuse loudly instead.
                raise NotImplementedError(
                    "only non-interlaced PNGs with standard compression/filtering"
                )
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    if w is None or h is None:
        raise ValueError("PNG has no IHDR chunk")
    raw = zlib.decompress(idat)
    stride = w * 3 + 1
    out = bytearray()
    prev = bytearray(w * 3)
    for y in range(h):
        row = raw[y * stride : (y + 1) * stride]
        filt, cur = row[0], bytearray(row[1:])
        if filt == 1:  # Sub
            for i in range(3, len(cur)):
                cur[i] = (cur[i] + cur[i - 3]) & 0xFF
        elif filt == 2:  # Up
            for i in range(len(cur)):
                cur[i] = (cur[i] + prev[i]) & 0xFF
        elif filt != 0:
            raise NotImplementedError(f"PNG filter {filt}")
        out += cur
        prev = cur
    return w, h, bytes(out)


def materialize_png_assets(spark: SparkSession, sf_dir: str, n: int = 64) -> str:
    """Deterministic 8x8 RGB PNGs, one per document: R = x*32, G = y*32,
    B = (doc_id*7)%256 — every channel analytically predictable, so the
    decode pipeline gets a REAL SQL oracle (mm_png_decode)."""
    out = tempfile.mkdtemp(prefix="mm_png_")
    ids = [
        r["doc_id"]
        for r in spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .select("doc_id")
        .orderBy("doc_id")
        .limit(n)
        .collect()
    ]
    for doc_id in ids:
        b = (doc_id * 7) % 256
        rgb = bytes(
            c
            for y in range(8)
            for x in range(8)
            for c in ((x * 32) % 256, (y * 32) % 256, b)
        )
        with open(os.path.join(out, f"doc_{doc_id:06d}.png"), "wb") as f:
            f.write(encode_png(8, 8, rgb))
    return out


def materialize_wav_assets(spark: SparkSession, sf_dir: str, n: int = 16) -> str:
    """Deterministic mono 16-bit PCM WAVs (stdlib wave): sample i of doc d
    is (i*(d+1)) % 65536 - 32768, 1000 frames @ 8 kHz — min/max/count all
    analytically predictable (mm_wav_decode's oracle)."""
    import wave

    out = tempfile.mkdtemp(prefix="mm_wav_")
    ids = [
        r["doc_id"]
        for r in spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .select("doc_id")
        .orderBy("doc_id")
        .limit(n)
        .collect()
    ]
    for doc_id in ids:
        frames = struct.pack(
            "<1000h", *[(i * (doc_id + 1)) % 65536 - 32768 for i in range(1000)]
        )
        with wave.open(os.path.join(out, f"doc_{doc_id:06d}.wav"), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(8000)
            w.writeframes(frames)
    return out


def decode_png_batch(df: DataFrame) -> DataFrame:
    """mapInPandas over binaryFile rows → (doc_id, width, height, channel
    means). Arrow-batched; the per-row python decode is the honest cost
    of a codec UDF — at cluster scale this is where a vectorized kernel
    (PIL/libvips via UD07's mapInArrow transport) plugs in."""
    schema = (
        "doc_id BIGINT, width INT, height INT, "
        "r_mean DOUBLE, g_mean DOUBLE, b_mean DOUBLE"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for path, content in zip(b["path"], b["content"]):
                w, h, rgb = decode_png(bytes(content))
                doc_id = int(os.path.basename(path).split("_")[1].split(".")[0])
                npx = w * h
                sums = [0, 0, 0]
                for i, c in enumerate(rgb):
                    sums[i % 3] += c
                rows.append(
                    (doc_id, w, h, sums[0] / npx, sums[1] / npx, sums[2] / npx)
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "width", "height", "r_mean", "g_mean", "b_mean"],
            )

    return df.select("path", "content").mapInPandas(run, schema)


def decode_wav_batch(df: DataFrame) -> DataFrame:
    """mapInPandas over binaryFile rows → (doc_id, n_frames, s_min, s_max)
    via the stdlib wave module (real RIFF/PCM parsing)."""
    import io
    import wave

    schema = "doc_id BIGINT, n_frames BIGINT, s_min BIGINT, s_max BIGINT"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for path, content in zip(b["path"], b["content"]):
                with wave.open(io.BytesIO(bytes(content)), "rb") as w:
                    n = w.getnframes()
                    samples = struct.unpack(f"<{n}h", w.readframes(n))
                doc_id = int(os.path.basename(path).split("_")[1].split(".")[0])
                rows.append((doc_id, n, min(samples), max(samples)))
            yield pd.DataFrame(rows, columns=["doc_id", "n_frames", "s_min", "s_max"])

    return df.select("path", "content").mapInPandas(run, schema)


def resize_png_batch(df: DataFrame, factor: int = 2) -> DataFrame:
    """REAL image resize: decode (stdlib PNG) → nearest-neighbor
    downsample by ``factor`` → re-encode PNG → stats of the resized
    image. The full decode→transform→encode loop of an image-pipeline
    stage, Arrow-batched; a library kernel (PIL.Image.resize) swaps in
    behind the same contract for general formats/filters."""
    schema = (
        "doc_id BIGINT, width INT, height INT, n_bytes BIGINT, "
        "r_mean DOUBLE, g_mean DOUBLE, b_mean DOUBLE"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for path, content in zip(b["path"], b["content"]):
                w, h, rgb = decode_png(bytes(content))
                nw, nh = w // factor, h // factor
                out = bytearray()
                for y in range(nh):
                    for x in range(nw):
                        src = (y * factor * w + x * factor) * 3
                        out += rgb[src : src + 3]
                resized = encode_png(nw, nh, bytes(out))
                doc_id = int(os.path.basename(path).split("_")[1].split(".")[0])
                npx = nw * nh
                sums = [0, 0, 0]
                for i, c in enumerate(out):
                    sums[i % 3] += c
                rows.append(
                    (doc_id, nw, nh, len(resized),
                     sums[0] / npx, sums[1] / npx, sums[2] / npx)
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "width", "height", "n_bytes",
                         "r_mean", "g_mean", "b_mean"],
            )

    return df.select("path", "content").mapInPandas(run, schema)


def resample_wav_batch(df: DataFrame, factor: int = 2) -> DataFrame:
    """REAL audio resample: stdlib-wave decode → decimate by ``factor``
    (nearest-neighbor in time, the audio analog of resize_png_batch's
    pixel sampling) → re-encode a WAV at rate/factor → re-decode the
    produced bytes and report its header + sample stats. The full
    decode→transform→encode loop of an audio-pipeline stage,
    Arrow-batched; a library resampler (scipy.signal.resample_poly,
    soxr) swaps in behind the same contract for proper anti-aliasing."""
    import io
    import wave

    schema = (
        "doc_id BIGINT, n_frames BIGINT, framerate BIGINT, "
        "s_min BIGINT, s_max BIGINT, n_bytes BIGINT"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for path, content in zip(b["path"], b["content"]):
                with wave.open(io.BytesIO(bytes(content)), "rb") as w:
                    rate = w.getframerate()
                    n = w.getnframes()
                    samples = struct.unpack(f"<{n}h", w.readframes(n))
                kept = samples[::factor]
                buf = io.BytesIO()
                with wave.open(buf, "wb") as w:
                    w.setnchannels(1)
                    w.setsampwidth(2)
                    w.setframerate(rate // factor)
                    w.writeframes(struct.pack(f"<{len(kept)}h", *kept))
                out_bytes = buf.getvalue()
                # verify the round-trip by re-decoding what we produced
                with wave.open(io.BytesIO(out_bytes), "rb") as w:
                    rn = w.getnframes()
                    rrate = w.getframerate()
                    rs = struct.unpack(f"<{rn}h", w.readframes(rn))
                doc_id = int(os.path.basename(path).split("_")[1].split(".")[0])
                rows.append(
                    (doc_id, rn, rrate, min(rs), max(rs), len(out_bytes))
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_frames", "framerate",
                    "s_min", "s_max", "n_bytes",
                ],
            )

    return df.select("path", "content").mapInPandas(run, schema)


# ---------------------------------------------------------------------------
# "Video": a minimal multi-frame container over the PNG codec (MM-VIDEO)
# ---------------------------------------------------------------------------

VID_SIG = b"VID0"
_VID_FRAMES = 12


def encode_video(frames: list[bytes]) -> bytes:
    """Minimal frame container: magic + uint32 count + uint32 lengths +
    concatenated PNG payloads — the schema-level stand-in for MP4/AVI
    (real containers swap a demuxer into the same decode contract)."""
    head = VID_SIG + struct.pack(">I", len(frames))
    head += b"".join(struct.pack(">I", len(f)) for f in frames)
    return head + b"".join(frames)


def decode_video(data: bytes) -> list[bytes]:
    if data[:4] != VID_SIG:
        raise ValueError("not a VID0 container")
    (n,) = struct.unpack(">I", data[4:8])
    lens = struct.unpack(f">{n}I", data[8 : 8 + 4 * n])
    out, pos = [], 8 + 4 * n
    for ln in lens:
        out.append(data[pos : pos + ln])
        pos += ln
    return out


def materialize_video_assets(spark: SparkSession, sf_dir: str, n: int = 16) -> str:
    """Deterministic 12-frame 'videos', one per document: frame f of doc d
    is an 8x8 PNG whose B channel is the constant (d*11 + f*17) % 256
    (R/G the standard gradient) — every sampled frame's channel stats are
    analytic functions of (doc_id, frame_idx)."""
    out = tempfile.mkdtemp(prefix="mm_vid_")
    ids = [
        r["doc_id"]
        for r in spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .select("doc_id")
        .orderBy("doc_id")
        .limit(n)
        .collect()
    ]
    for doc_id in ids:
        frames = []
        for f in range(_VID_FRAMES):
            bch = (doc_id * 11 + f * 17) % 256
            rgb = bytes(
                c
                for y in range(8)
                for x in range(8)
                for c in ((x * 32) % 256, (y * 32) % 256, bch)
            )
            frames.append(encode_png(8, 8, rgb))
        with open(os.path.join(out, f"doc_{doc_id:06d}.vid"), "wb") as fh:
            fh.write(encode_video(frames))
    return out


def sample_video_batch(df: DataFrame, every: int = 3) -> DataFrame:
    """mapInPandas 1→N: demux the container, DECODE only every ``every``-th
    frame (the frame-sampling point: skipped frames are never
    decompressed), emit per-sampled-frame channel stats. The real video
    shape at scale — decode cost proportional to sampled frames, Arrow
    fan-out rows bounded by n_frames/every per asset."""
    schema = "doc_id BIGINT, frame_idx INT, n_frames INT, b_mean DOUBLE"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for path, content in zip(b["path"], b["content"]):
                doc_id = int(os.path.basename(path).split("_")[1].split(".")[0])
                frames = decode_video(bytes(content))
                for idx in range(0, len(frames), every):
                    w, h, rgb = decode_png(frames[idx])
                    bsum = sum(rgb[2::3])
                    rows.append((doc_id, idx, len(frames), bsum / (w * h)))
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "n_frames", "b_mean"]
            )

    return df.select("path", "content").mapInPandas(run, schema)


def feature_batch(df: DataFrame, buckets: int = 8) -> DataFrame:
    """Image FEATURE EXTRACTION (the pipeline step between decode and the
    embedding/similarity ops): decode → per-channel intensity histogram →
    one ARRAY<DOUBLE> feature vector per image, mapInPandas 1→1. The
    histogram is the deterministic stand-in for a vision-model embedding;
    a real model swaps into the same batch contract and the downstream
    L03/LX similarity operators consume the column unchanged."""
    width = 256 // buckets
    schema = "doc_id BIGINT, feature ARRAY<DOUBLE>"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for path, content in zip(b["path"], b["content"]):
                doc_id = int(os.path.basename(path).split("_")[1].split(".")[0])
                w, h, rgb = decode_png(bytes(content))
                feat = [0.0] * (3 * buckets)
                for i, c in enumerate(rgb):
                    feat[(i % 3) * buckets + c // width] += 1.0
                rows.append((doc_id, feat))
            yield pd.DataFrame(rows, columns=["doc_id", "feature"])

    return df.select("path", "content").mapInPandas(run, schema)


# ---------------------------------------------------------------------------
# Perceptual hashing (pHash): DCT fingerprints for image near-dup detection
# ---------------------------------------------------------------------------

_PHASH_SIZE = 16  # input images are 16x16 grayscale
_PHASH_BITS = 63  # 8x8 low-frequency DCT block minus the DC coefficient


def _lcg_pattern(doc_id: int) -> list[int]:
    """Deterministic 16x16 grayscale noise pattern from a per-doc LCG."""
    x = (doc_id * 2654435761 + 1) % (2**31)
    px = []
    for _ in range(_PHASH_SIZE * _PHASH_SIZE):
        x = (1103515245 * x + 12345) % (2**31)
        px.append((x >> 16) & 0xFF)
    return px


def materialize_phash_assets(spark: SparkSession, sf_dir: str, n: int = 64) -> str:
    """Deterministic 16x16 grayscale PNGs with PLANTED near-duplicates:
    every doc with doc_id % 8 == 2 reuses the PREVIOUS doc's noise
    pattern with 3 pixels nudged by +6 — a perturbation measured to move
    the 63-bit DCT pHash by <= 2 bits, while independent LCG patterns
    sit >= 16 bits apart (wide margin both sides of the r=4 radius, so
    the near-dup PAIR SET is analytic: exactly the planted pairs)."""
    out = tempfile.mkdtemp(prefix="mm_phash_")
    ids = [
        r["doc_id"]
        for r in spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .select("doc_id")
        .orderBy("doc_id")
        .limit(n)
        .collect()
    ]
    idset = set(ids)
    for doc_id in ids:
        if doc_id % 8 == 2 and (doc_id - 1) in idset:
            px = _lcg_pattern(doc_id - 1)
            for pos in (3 * _PHASH_SIZE + 5, 9 * _PHASH_SIZE + 2, 12 * _PHASH_SIZE + 12):
                px[pos] = min(255, px[pos] + 6)
        else:
            px = _lcg_pattern(doc_id)
        rgb = bytes(c for v in px for c in (v, v, v))
        with open(os.path.join(out, f"doc_{doc_id:06d}.png"), "wb") as f:
            f.write(encode_png(_PHASH_SIZE, _PHASH_SIZE, rgb))
    return out


def phash_batch(df: DataFrame) -> DataFrame:
    """binaryFile rows → 63-bit DCT perceptual hash per image
    (doc_id, phash BIGINT).

    The canonical pHash recipe on the 16x16 grayscale plane: 2-D DCT-II
    (explicit cosine-matrix multiply — numpy only, no scipy), keep the
    8x8 low-frequency block, drop the DC coefficient, threshold the 63
    remaining coefficients at their median → one bit each. Brightness
    shifts move only DC (dropped) and uniform scaling cancels in the
    median threshold — the invariances that make pHash a NEAR-dup
    fingerprint where md5 is an exact-dup one. Arrow-batched mapInPandas;
    each task hashes its files independently (embarrassingly parallel at
    100 TB), and the BIGINT fingerprints feed the same banded Hamming
    join SimHash uses (operators/dedup.simhash_neardup_pairs)."""
    import numpy as np

    n = _PHASH_SIZE
    dct_rows = [
        [math.cos(math.pi * (j + 0.5) * i / n) for j in range(n)] for i in range(n)
    ]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        C = np.array(dct_rows)
        for b in batches:
            rows = []
            for path, content in zip(b["path"], b["content"]):
                doc_id = int(os.path.basename(path).split("_")[1].split(".")[0])
                w, h, rgb = decode_png(bytes(content))
                gray = (
                    np.frombuffer(rgb, dtype=np.uint8)[0::3]
                    .astype(np.float64)
                    .reshape(h, w)
                )
                d = C @ gray @ C.T
                block = d[:8, :8].flatten()[1:]
                med = float(np.median(block))
                bits = 0
                for i, v in enumerate(block):
                    if v > med:
                        bits |= 1 << i
                rows.append((doc_id, bits))
            yield pd.DataFrame(rows, columns=["doc_id", "phash"])

    return df.select("path", "content").mapInPandas(run, "doc_id BIGINT, phash BIGINT")


# --- Spectral analysis over audio (round-10 addendum) ---------------------
# Square-wave fixtures make the FFT analytically certifiable: a ±A square
# wave of period P over N samples (P | N, P even) has its dominant DFT bin
# at k = N/P with |X_k| = 2·A·N / (P·sin(π/P)) exactly (geometric-series
# closed form), and total power Σs² = N·A² as integer arithmetic.

_SQWAV_PERIODS = [10, 20, 40, 50, 100, 200]  # even divisors of N=1000
_SQWAV_N = 1000
_SQWAV_AMP = 8192


def materialize_square_wav_assets(spark: SparkSession, sf_dir: str, n: int = 16) -> str:
    """Deterministic mono 16-bit PCM square-wave WAVs: doc d gets period
    P = _SQWAV_PERIODS[d % 6], samples +A for (i mod P) < P/2 else -A.
    Dominant FFT bin and its magnitude follow in closed form (the
    mm_wav_spectral oracle)."""
    import wave

    out = tempfile.mkdtemp(prefix="mm_sqwav_")
    ids = [
        r["doc_id"]
        for r in spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .select("doc_id")
        .orderBy("doc_id")
        .limit(n)
        .collect()
    ]
    for doc_id in ids:
        p = _SQWAV_PERIODS[doc_id % len(_SQWAV_PERIODS)]
        samples = [
            _SQWAV_AMP if (i % p) < p // 2 else -_SQWAV_AMP
            for i in range(_SQWAV_N)
        ]
        frames = struct.pack(f"<{_SQWAV_N}h", *samples)
        with wave.open(os.path.join(out, f"doc_{doc_id:06d}.wav"), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(8000)
            w.writeframes(frames)
    return out


def spectral_wav_batch(df: DataFrame) -> DataFrame:
    """REAL spectral feature extraction: stdlib-wave decode → numpy rFFT →
    (dominant non-DC bin, its magnitude, integer total power). The batch
    contract is the general audio-featurizer shape (binaryFile →
    Arrow-batched mapInPandas → fixed-width feature row per asset); a
    mel-filterbank or embedding model swaps into the same slot at scale."""
    import io
    import wave

    import numpy as np

    schema = (
        "doc_id BIGINT, n_frames BIGINT, dominant_bin BIGINT, "
        "dominant_mag DOUBLE, total_power BIGINT"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for path, content in zip(b["path"], b["content"]):
                with wave.open(io.BytesIO(bytes(content)), "rb") as w:
                    n = w.getnframes()
                    samples = np.array(
                        struct.unpack(f"<{n}h", w.readframes(n)), dtype=np.int64
                    )
                doc_id = int(os.path.basename(path).split("_")[1].split(".")[0])
                mags = np.abs(np.fft.rfft(samples.astype(np.float64)))
                k = int(np.argmax(mags[1:]) + 1)  # skip DC
                rows.append(
                    (
                        doc_id,
                        n,
                        k,
                        round(float(mags[k]), 4),
                        int((samples * samples).sum()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_frames", "dominant_bin", "dominant_mag",
                    "total_power",
                ],
            )

    return df.select("path", "content").mapInPandas(run, schema)
