"""Multimodal plumbing (S09/L10): binary source schema, mapInPandas batch
shapes, stubbed codec behavior."""

from __future__ import annotations

import pytest

from pydatalake_gen2_spark.sources import multimodal


def test_binary_source_schema(spark, sf_dir):
    assets = multimodal.materialize_fake_assets(spark, sf_dir, n=8)
    df = multimodal.read_binary(spark, assets)
    assert {"path", "modificationTime", "length", "content"} <= set(df.columns)
    rows = df.collect()
    assert len(rows) == 8
    assert all(r["length"] == 8 + 256 for r in rows)  # header + 8×sha256


def test_decode_stub_raises_without_fake():
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"FAKEIMG0" + b"\x00" * 16, fake=False)


def test_decode_batch_deterministic(spark, sf_dir):
    assets = multimodal.materialize_fake_assets(spark, sf_dir, n=8)
    d1 = multimodal.decode_batch(multimodal.read_binary(spark, assets)).collect()
    d2 = multimodal.decode_batch(multimodal.read_binary(spark, assets)).collect()
    k = lambda rows: sorted((r["doc_id"], r["width"], r["height"], tuple(r["feat"])) for r in rows)  # noqa: E731
    assert k(d1) == k(d2)
    assert all(len(r["feat"]) == 8 for r in d1)


def test_frame_sample_shape(spark, sf_dir):
    assets = multimodal.materialize_fake_assets(spark, sf_dir, n=4)
    frames = multimodal.frame_sample(multimodal.read_binary(spark, assets), every_n_bytes=64)
    rows = frames.collect()
    # 264 bytes / 64 → 5 windows per file
    assert len(rows) == 4 * 5
    assert {r["frame_idx"] for r in rows} == {0, 1, 2, 3, 4}


def test_ingest_join(spark, sf_dir):
    out = multimodal.ingest_with_metadata(spark, sf_dir)
    rows = out.collect()
    assert len(rows) == 64
    assert all(r["format"] == "fakeimg" for r in rows)


def test_resize_stub_shape(spark, sf_dir):
    assets = multimodal.materialize_fake_assets(spark, sf_dir, n=4)
    out = multimodal.resize_batch(
        multimodal.read_binary(spark, assets), target_w=16, target_h=8
    ).collect()
    assert len(out) == 4
    for r in out:
        assert (r["width"], r["height"]) == (16, 8)
        assert len(r["content"]) == 16 * 8


def test_resize_stub_raises_without_fake(spark, sf_dir):
    import pytest as _pytest

    assets = multimodal.materialize_fake_assets(spark, sf_dir, n=1)
    with _pytest.raises(NotImplementedError):
        multimodal.resize_batch(
            multimodal.read_binary(spark, assets), fake=False
        )


def test_png_codec_roundtrip_and_filters():
    """encode->decode is identity, and the decoder reverses Sub(1)/Up(2)
    filtered rows (hand-built IDAT), not just our encoder's filter 0."""
    import struct
    import zlib

    from pydatalake_gen2_spark.sources.multimodal import (
        PNG_SIG,
        _png_chunk,
        decode_png,
        encode_png,
    )

    rgb = bytes(range(48))  # 4x4 RGB
    assert decode_png(encode_png(4, 4, rgb)) == (4, 4, rgb)

    # row 0 Sub-filtered, row 1 Up-filtered (2x2 image)
    px = [10, 20, 30, 40, 60, 80, 5, 15, 25, 50, 70, 90]
    row0, row1 = px[:6], px[6:]
    sub0 = bytes([row0[0], row0[1], row0[2],
                  (row0[3] - row0[0]) & 0xFF,
                  (row0[4] - row0[1]) & 0xFF,
                  (row0[5] - row0[2]) & 0xFF])
    up1 = bytes([(row1[i] - row0[i]) & 0xFF for i in range(6)])
    raw = b"\x01" + sub0 + b"\x02" + up1
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)
    data = (PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(raw))
            + _png_chunk(b"IEND", b""))
    assert decode_png(data) == (2, 2, bytes(px))


def test_phash_banded_join_matches_brute_force(spark, sf_dir):
    """The banded Hamming join over pHash fingerprints must emit exactly
    the brute-force pairwise-Hamming pair set at radius 4, and the
    planted near-dups must separate cleanly from independent patterns."""
    from pydatalake_gen2_spark.operators.dedup import simhash_neardup_pairs

    assets = multimodal.materialize_phash_assets(spark, sf_dir, n=32)
    fp_rows = multimodal.phash_batch(
        multimodal.read_binary(spark, assets, glob="*.png")
    ).collect()
    fp = {r["doc_id"]: r["phash"] for r in fp_rows}
    assert len(fp) == 32

    brute = {
        (a, b)
        for a in fp
        for b in fp
        if a < b and bin(fp[a] ^ fp[b]).count("1") <= 4
    }
    planted = {(i - 1, i) for i in fp if i % 8 == 2 and (i - 1) in fp}
    assert brute == planted  # wide margin: planted <=2 bits, others >=16

    fdf = spark.createDataFrame(
        [(k, v) for k, v in fp.items()], "doc_id BIGINT, simhash BIGINT"
    )
    pairs = simhash_neardup_pairs(fdf, r=4, bits=63, fingerprints=fdf).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == brute
    assert all(r["hamming"] <= 4 for r in pairs)
