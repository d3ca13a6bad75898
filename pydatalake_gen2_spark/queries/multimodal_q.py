"""Multimodal query registrations.

Round-7: the former tier-S smoke pairs (S09/L10/MM-RESIZE/
MM-FRAME-SAMPLE) are hash-matched. Their decode step is still a
deterministic fake (no image libs in the container), but the fake's
derivations now live in ASCII/hex space (sources/multimodal.py:
materialize_fake_assets), so a DuckDB oracle — whose hash functions are
VARCHAR-only — can reconstruct every payload, window signature, size,
and filename analytically. The Spark side is unchanged in kind: a real
binaryFile scan into Arrow-batched mapInPandas over opaque BYTES."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pydatalake_gen2_spark.registry import register
from pydatalake_gen2_spark.sources import multimodal

def _basename():
    # built lazily: Column construction needs an active SparkContext
    return F.element_at(F.split(F.col("path"), "/"), -1)


@register(
    "s09_binary_source",
    duck_sql="""
    SELECT printf('doc_%06d.img', doc_id) AS name,
           CAST(264 AS BIGINT) AS length
    FROM (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 32)
    ORDER BY name
    """,
)
def s09_binary_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """binaryFile scan of generated assets. H since round 7: the oracle
    states each asset's deterministic filename and byte length (8-byte
    magic + 4x64 hex chars = 264), certifying the source's listing,
    naming, and length metadata — the path prefix (a temp dir) is
    stripped to the basename."""
    assets = multimodal.materialize_fake_assets(spark, sf_dir, n=32)
    df = multimodal.read_binary(spark, assets)
    return df.select(_basename().alias("name"), "length").orderBy("name")


@register(
    "l10_multimodal_ingest",
    duck_sql="""
    WITH d AS (SELECT doc_id, lang, source, text
               FROM documents ORDER BY doc_id LIMIT 64),
    c AS (SELECT doc_id, lang, source,
                 sha256('FAKEIMG0' || repeat(sha256(text), 4)) AS h
          FROM d)
    SELECT doc_id, lang, source, CAST(264 AS BIGINT) AS n_bytes,
           'fakeimg' AS format,
           CAST(64 + ('0x' || substring(h, 1, 2))::INT % 64 AS INT) AS width,
           CAST(64 + ('0x' || substring(h, 3, 2))::INT % 64 AS INT) AS height
    FROM c ORDER BY doc_id
    """,
)
def l10_multimodal_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary ingest → mapInPandas decode (deterministic fake codec) →
    metadata join. H since round 7: the oracle replays the whole
    derivation — payload reconstruction, the decode's re-hash, and the
    hex-pair width/height — in SQL, certifying the binaryFile read, the
    Arrow decode batch, the doc_id parse from the filename, AND the
    metadata join."""
    out = multimodal.ingest_with_metadata(spark, sf_dir)
    return out.select(
        "doc_id", "lang", "source",
        F.col("n_bytes").cast("bigint").alias("n_bytes"),
        "format", "width", "height",
    ).orderBy("doc_id")


@register(
    "mm_resize",
    duck_sql="""
    SELECT printf('doc_%06d.img', doc_id) AS name,
           CAST(16 AS INT) AS width, CAST(16 AS INT) AS height,
           CAST(256 AS INT) AS n_bytes
    FROM (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 32)
    ORDER BY name
    """,
)
def mm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MM-RESIZE: binary ingest → mapInPandas resize (stubbed codec; real
    Arrow-batched 1→1 plumbing). H since round 7: the stub's contract —
    every output payload is exactly target_w*target_h bytes with the new
    dims attached, one row per asset — is fully analytic, so the oracle
    states it per asset; the resized payload itself stays engine-side
    (canonicalizers don't hash binary)."""
    assets = multimodal.materialize_fake_assets(spark, sf_dir, n=32)
    raw = multimodal.read_binary(spark, assets)
    out = multimodal.resize_batch(raw, target_w=16, target_h=16)
    return out.select(
        _basename().alias("name"), "width", "height",
        F.length("content").cast("int").alias("n_bytes"),
    ).orderBy("name")


@register(
    "mm_frame_sample",
    duck_sql="""
    WITH d AS (SELECT doc_id, text FROM documents ORDER BY doc_id LIMIT 32),
    c AS (SELECT doc_id, 'FAKEIMG0' || repeat(sha256(text), 4) AS s FROM d)
    SELECT printf('doc_%06d.img', doc_id) AS name,
           CAST(g.i AS INT) AS frame_idx,
           md5(substring(s, g.i * 64 + 1, 64)) AS frame_sig
    FROM c CROSS JOIN generate_series(0, 4) AS g(i)
    ORDER BY name, frame_idx
    """,
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MM-FRAME-SAMPLE: binary ingest → mapInPandas 1→N frame extraction
    (byte-window stub standing in for a video codec; the Arrow batch
    shape, schema and fan-out are the real thing). H since round 7: the
    264-byte payload yields exactly 5 windows (4x64 + the 8-byte tail);
    each window's md5 signature is recomputed by the oracle over the
    reconstructed ASCII payload — fan-out count, window boundaries, and
    signatures all hash-certified."""
    assets = multimodal.materialize_fake_assets(spark, sf_dir, n=32)
    raw = multimodal.read_binary(spark, assets)
    frames = multimodal.frame_sample(raw, every_n_bytes=64)
    return frames.select(
        _basename().alias("name"), "frame_idx", "frame_sig"
    ).orderBy("name", "frame_idx")


_PNG_CACHE: dict[str, str] = {}
_WAV_CACHE: dict[str, str] = {}


@register(
    "mm_png_decode",
    duck_sql="""
    SELECT doc_id, 8 AS width, 8 AS height,
           CAST(112.0 AS DOUBLE) AS r_mean,
           CAST(112.0 AS DOUBLE) AS g_mean,
           CAST((doc_id * 7) % 256 AS DOUBLE) AS b_mean
    FROM (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 64)
    ORDER BY doc_id
    """,
)
def mm_png_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MM-PNG: a REAL image decode pipeline, hash-matched — deterministic
    8x8 RGB PNGs (one per doc; channels are analytic functions of
    doc_id) go through binaryFile → Arrow-batched mapInPandas → the
    stdlib zlib PNG decoder (sources/multimodal.decode_png: IHDR/IDAT
    parse, un-filtering, CRC layout) → per-channel means. The oracle
    states each image's expected means in SQL, so header parsing,
    decompression, un-filtering, AND the aggregation are all certified
    — this replaces the round-2 'codec stubbed' gap within the
    container's no-PIL constraint; full formats swap in a library
    kernel behind the same mapInPandas contract."""
    if sf_dir not in _PNG_CACHE:
        _PNG_CACHE[sf_dir] = multimodal.materialize_png_assets(spark, sf_dir, n=64)
    raw = multimodal.read_binary(spark, _PNG_CACHE[sf_dir], glob="*.png")
    return multimodal.decode_png_batch(raw).orderBy("doc_id")


@register(
    "mm_wav_decode",
    duck_sql="""
    SELECT doc_id,
           CAST(1000 AS BIGINT) AS n_frames,
           (SELECT min((i * (doc_id + 1)) % 65536 - 32768)
              FROM generate_series(0, 999) g(i)) AS s_min,
           (SELECT max((i * (doc_id + 1)) % 65536 - 32768)
              FROM generate_series(0, 999) g(i)) AS s_max
    FROM (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 16)
    ORDER BY doc_id
    """,
)
def mm_wav_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MM-WAV: a REAL audio decode pipeline, hash-matched — deterministic
    mono 16-bit PCM WAVs decoded with the stdlib wave module inside
    Arrow-batched mapInPandas; frame counts and sample extrema must
    equal the generating formula, stated analytically in the oracle via
    generate_series. RIFF parsing + PCM unpack are real; multi-codec
    audio swaps a library decoder into the same batch contract."""
    if sf_dir not in _WAV_CACHE:
        _WAV_CACHE[sf_dir] = multimodal.materialize_wav_assets(spark, sf_dir, n=16)
    raw = multimodal.read_binary(spark, _WAV_CACHE[sf_dir], glob="*.wav")
    return multimodal.decode_wav_batch(raw).orderBy("doc_id")


@register(
    "mm_png_resize",
    duck_sql="""
    SELECT doc_id, 4 AS width, 4 AS height,
           CAST(96.0 AS DOUBLE) AS r_mean,
           CAST(96.0 AS DOUBLE) AS g_mean,
           CAST((doc_id * 7) % 256 AS DOUBLE) AS b_mean
    FROM (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 64)
    ORDER BY doc_id
    """,
)
def mm_png_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MM-PNG-RESIZE: the full decode → nearest-neighbor downsample →
    re-encode loop on real PNG bytes (sources/multimodal.resize_png_batch);
    the 8x8 gradient halves to 4x4, picking columns x∈{0,2,4,6} whose R/G
    means are analytically 96.0 while B stays the per-doc constant — the
    oracle certifies the resample actually sampled the right pixels, not
    just that bytes moved."""
    if sf_dir not in _PNG_CACHE:
        _PNG_CACHE[sf_dir] = multimodal.materialize_png_assets(spark, sf_dir, n=64)
    raw = multimodal.read_binary(spark, _PNG_CACHE[sf_dir], glob="*.png")
    out = multimodal.resize_png_batch(raw, factor=2)
    return out.select(
        "doc_id", "width", "height", "r_mean", "g_mean", "b_mean"
    ).orderBy("doc_id")


@register(
    "mm_wav_resample",
    duck_sql="""
    SELECT doc_id,
           CAST(500 AS BIGINT) AS n_frames,
           CAST(4000 AS BIGINT) AS framerate,
           (SELECT min((2 * i * (doc_id + 1)) % 65536 - 32768)
              FROM generate_series(0, 499) g(i)) AS s_min,
           (SELECT max((2 * i * (doc_id + 1)) % 65536 - 32768)
              FROM generate_series(0, 499) g(i)) AS s_max,
           CAST(1044 AS BIGINT) AS n_bytes
    FROM (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 16)
    ORDER BY doc_id
    """,
)
def mm_wav_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MM-WAV-RESAMPLE: decode → decimate-by-2 → re-encode at 4 kHz →
    re-decode the produced bytes (sources/multimodal.resample_wav_batch).
    The oracle states the kept samples analytically ((2i·(d+1)) mod 2¹⁶ −
    2¹⁵ over i<500) plus the exact RIFF container size (44-byte header +
    1000 bytes PCM) — a wrong decimation grid, rate header, or encode
    breaks the hash. Audio sibling of mm_png_resize."""
    if sf_dir not in _WAV_CACHE:
        _WAV_CACHE[sf_dir] = multimodal.materialize_wav_assets(spark, sf_dir, n=16)
    raw = multimodal.read_binary(spark, _WAV_CACHE[sf_dir], glob="*.wav")
    return multimodal.resample_wav_batch(raw, factor=2).orderBy("doc_id")


_VID_CACHE: dict[str, str] = {}


@register(
    "mm_video_sample",
    duck_sql="""
    SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
           CAST(12 AS INT) AS n_frames,
           CAST((doc_id * 11 + frame_idx * 17) % 256 AS DOUBLE) AS b_mean
    FROM (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 16)
    CROSS JOIN (SELECT unnest(generate_series(0, 11, 3)) AS frame_idx) f
    ORDER BY doc_id, frame_idx
    """,
)
def mm_video_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MM-VIDEO: REAL frame sampling, hash-matched — 12-frame containers
    (minimal demuxable format over real PNG payloads) are demuxed in
    Arrow-batched mapInPandas, every 3rd frame is DECODED (skipped
    frames never decompress — the sampling economics), and each sampled
    frame's blue-channel mean must equal the generating formula stated
    analytically in the oracle. Replaces the byte-window stub
    (mm_frame_sample) with a genuine demux→sample→decode pipeline; a
    real MP4 demuxer swaps into the same 1→N batch contract."""
    if sf_dir not in _VID_CACHE:
        _VID_CACHE[sf_dir] = multimodal.materialize_video_assets(spark, sf_dir, n=16)
    raw = multimodal.read_binary(spark, _VID_CACHE[sf_dir], glob="*.vid")
    return multimodal.sample_video_batch(raw, every=3).orderBy("doc_id", "frame_idx")


@register(
    "mm_png_features",
    duck_sql="""
    SELECT doc_id,
           array_to_string(list_transform(generate_series(0, 23), i ->
             CAST(CAST(CASE
               WHEN i < 16 THEN 8.0
               WHEN i - 16 = ((doc_id * 7) % 256) // 32 THEN 64.0
               ELSE 0.0 END AS DOUBLE) AS STRING)), ',') AS feature
    FROM (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 64)
    ORDER BY doc_id
    """,
)
def mm_png_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MM-FEATURES: image feature extraction, hash-matched — real PNG
    decode → per-channel 8-bucket intensity histogram → a 24-dim
    ARRAY<DOUBLE> feature column (sources/multimodal.feature_batch), the
    step that wires the multimodal surface into the embedding/similarity
    ops (L03/LX consume the column unchanged; a vision model swaps into
    the same mapInPandas contract). The 8x8 gradient makes every
    histogram analytic — R/G flat at 8/bucket, B a one-hot 64 at bucket
    (doc_id*7 % 256)//32 — stated exactly in the oracle; the array is
    stringified for the hash (F30-32 convention)."""
    if sf_dir not in _PNG_CACHE:
        _PNG_CACHE[sf_dir] = multimodal.materialize_png_assets(spark, sf_dir, n=64)
    raw = multimodal.read_binary(spark, _PNG_CACHE[sf_dir], glob="*.png")
    from pyspark.sql import functions as F

    feats = multimodal.feature_batch(raw, buckets=8)
    return feats.select(
        "doc_id",
        F.concat_ws(
            ",", F.transform(F.col("feature"), lambda x: x.cast("string"))
        ).alias("feature"),
    ).orderBy("doc_id")


_PHASH_CACHE: dict[str, str] = {}


@register(
    "mm_phash_neardup",
    duck_sql="""
    WITH ids AS (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 64)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b
    FROM ids a JOIN ids b ON b.doc_id = a.doc_id + 1
    WHERE b.doc_id % 8 = 2
    ORDER BY id_a
    """,
)
def mm_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MM-PHASH: image near-duplicate detection end-to-end — real PNG
    decode → 63-bit DCT perceptual hash (sources/multimodal.phash_batch)
    → the SAME banded Hamming multi-index join SimHash text near-dup
    uses (operators/dedup.simhash_neardup_pairs: pigeonhole bands, exact
    bit_count verify, radius 4). The asset set plants near-dup image
    pairs (3-pixel +6 nudge, measured <= 2 pHash bits) among independent
    noise images (>= 16 bits apart), so the emitted PAIR SET is analytic
    and the oracle states it exactly — certifying decode, DCT, median
    threshold, banding and verify together. The scale shape is the
    multimodal dedup pipeline's: hash in embarrassingly-parallel
    mapInPandas tasks, join fingerprints (bigints, never pixels) in
    banded buckets."""
    from pyspark.sql import functions as F

    from pydatalake_gen2_spark.operators.dedup import simhash_neardup_pairs

    if sf_dir not in _PHASH_CACHE:
        _PHASH_CACHE[sf_dir] = multimodal.materialize_phash_assets(spark, sf_dir, n=64)
    raw = multimodal.read_binary(spark, _PHASH_CACHE[sf_dir], glob="*.png")
    fp = multimodal.phash_batch(raw).select(
        F.col("doc_id"), F.col("phash").alias("simhash")
    )
    pairs = simhash_neardup_pairs(
        spark.table("documents"), r=4, bits=63, fingerprints=fp, exact_recall=True
    )
    return pairs.select("id_a", "id_b").orderBy("id_a")


_SQWAV_CACHE: dict[str, str] = {}


@register(
    "mm_wav_spectral",
    duck_sql="""
    SELECT doc_id,
           CAST(1000 AS BIGINT) AS n_frames,
           CAST(1000 / p AS BIGINT) AS dominant_bin,
           ROUND(2.0 * 8192 * 1000 / (p * SIN(PI() / p)), 4) AS dominant_mag,
           1000 * CAST(8192 AS BIGINT) * 8192 AS total_power
    FROM (
      SELECT doc_id,
             CASE doc_id % 6 WHEN 0 THEN 10 WHEN 1 THEN 20 WHEN 2 THEN 40
                             WHEN 3 THEN 50 WHEN 4 THEN 100 ELSE 200 END AS p
      FROM (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 16)
    )
    ORDER BY doc_id
    """,
)
def mm_wav_spectral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MM-WAV-SPECTRAL: a REAL frequency-domain feature extractor,
    hash-matched against closed-form DFT theory. Square-wave WAVs (period
    P = [10,20,40,50,100,200][doc_id % 6], amplitude ±8192, 1000 frames)
    go binaryFile → Arrow-batched mapInPandas → stdlib-wave decode →
    numpy rFFT (sources/multimodal.spectral_wav_batch). The oracle states
    the dominant bin k = N/P and its magnitude 2·A·N/(P·sin(π/P)) — the
    geometric-series closed form of the square wave's fundamental — plus
    the exact integer power N·A², so the FFT, bin selection, and power
    accumulation are all certified, not just exercised. Scale shape: the
    audio-featurizer slot of a multimodal training pipeline (decode +
    transform embarrassingly parallel per asset; features, never
    waveforms, flow onward)."""
    if sf_dir not in _SQWAV_CACHE:
        _SQWAV_CACHE[sf_dir] = multimodal.materialize_square_wav_assets(
            spark, sf_dir, n=16
        )
    raw = multimodal.read_binary(spark, _SQWAV_CACHE[sf_dir], glob="*.wav")
    return multimodal.spectral_wav_batch(raw).orderBy("doc_id")
