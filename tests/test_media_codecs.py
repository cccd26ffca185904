"""Real media decode (functions/media_codecs.py): codec round trips,
decoder guards, featurization determinism, and the distributed
mapInPandas contract (VERDICT r3 item 8 — a real decoder behind the
extract_media_features swap point)."""

import io
import struct
import wave

import numpy as np
import pytest

from diffdataflowmlpipelines_spark.functions.media_codecs import (
    audio_features,
    decode_bmp,
    decode_media_features,
    decode_wav,
    encode_bmp,
    encode_wav,
    f32_bits_csv,
    feature_checksum,
    image_features,
)


def test_bmp_roundtrip_shapes():
    rng = np.random.default_rng(1)
    # widths 1..5 exercise every 4-byte stride-padding remainder
    for h, w in [(1, 1), (1, 2), (2, 3), (3, 4), (5, 5), (17, 9), (8, 31)]:
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        out = decode_bmp(encode_bmp(img))
        assert out.shape == (h, w, 3)
        assert np.array_equal(out, img)


def test_bmp_top_down_variant():
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (4, 3, 3), dtype=np.uint8)
    payload = bytearray(encode_bmp(img))
    # flip to top-down: negative height + rows already bottom-up on disk,
    # so the decoded image is vertically flipped relative to the original
    struct.pack_into("<i", payload, 22, -4)
    out = decode_bmp(bytes(payload))
    assert np.array_equal(out, img[::-1])


def test_bmp_rejects_non_bmp_and_unsupported():
    with pytest.raises(ValueError, match="not a BMP"):
        decode_bmp(b"\x00" * 64)
    img = np.zeros((2, 2, 3), dtype=np.uint8)
    payload = bytearray(encode_bmp(img))
    struct.pack_into("<H", payload, 28, 8)  # bpp=8 (palettized)
    with pytest.raises(ValueError, match="only 24-bit"):
        decode_bmp(bytes(payload))
    with pytest.raises(ValueError, match="truncated"):
        decode_bmp(encode_bmp(img)[:-4])


def test_wav_roundtrip_and_guards():
    rng = np.random.default_rng(3)
    s = rng.integers(-32768, 32768, 257).astype(np.int16)
    out, fr = decode_wav(encode_wav(s, 16000))
    assert fr == 16000
    assert np.array_equal(out, s)
    # stereo payload rejected
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(2)
        f.setsampwidth(2)
        f.setframerate(8000)
        f.writeframes(b"\x00" * 32)
    with pytest.raises(ValueError, match="only mono"):
        decode_wav(buf.getvalue())


def test_decode_media_features_dispatch_and_refusal():
    img = np.full((3, 3, 3), 7, dtype=np.uint8)
    assert decode_media_features(encode_bmp(img)).shape == (16,)
    s = np.zeros(100, dtype=np.int16)
    assert decode_media_features(encode_wav(s, 8000)).shape == (16,)
    with pytest.raises(NotImplementedError):
        decode_media_features(b"\x89PNG\r\n\x1a\n" + b"\x00" * 32)


def test_image_features_values():
    img = np.zeros((2, 4, 3), dtype=np.uint8)
    img[..., 0] = 255  # pure red
    f = image_features(img)
    assert f.dtype == np.float32 and f.shape == (16,)
    np.testing.assert_allclose(f[:2], [2 / 512, 4 / 512], rtol=1e-6)
    np.testing.assert_allclose(f[2:5], [1.0, 0.0, 0.0], rtol=1e-6)  # RGB means
    assert f[5] == 0.0  # gray std of a constant image
    assert f[6:14].sum() == pytest.approx(1.0)  # histogram mass
    np.testing.assert_allclose(f[14:], [85 / 255, 85 / 255], rtol=1e-6)


def test_audio_features_values():
    # constant DC signal: rms == mean_abs == peak == dc, zcr == 0
    s = np.full(1000, 16384, dtype=np.int16)
    f = audio_features(s, 8000)
    assert f.dtype == np.float32 and f.shape == (16,)
    np.testing.assert_allclose(f[3], 0.5, rtol=1e-6)  # rms
    assert f[4] == 0.0  # zcr
    np.testing.assert_allclose([f[5], f[6], f[7]], [0.5, 0.5, 0.5], rtol=1e-6)
    assert f[8] == pytest.approx(1.0)  # all spectral mass in the DC band
    np.testing.assert_allclose(f[8:].sum(), 1.0, rtol=1e-6)


def test_bits_csv_and_checksum_are_bit_exact():
    v = np.array([0.0, -0.0, 1.5, np.float32(1 / 3)], dtype=np.float32)
    csv = f32_bits_csv(v)
    back = np.array([int(x) for x in csv.split(",")], dtype=np.uint32).view(np.float32)
    assert np.array_equal(back.view(np.uint32), v.view(np.uint32))
    assert feature_checksum(v) == int(v.view(np.uint32).sum())


def test_fixture_pins_match_fresh_decode():
    """The committed fixture's pinned features must equal a fresh local
    decode of its payload bytes (guards fixture/codec drift)."""
    import pyarrow.parquet as pq

    from diffdataflowmlpipelines_spark.plans.datapipeline_queries import (
        MEDIA_REAL_FIXTURE,
    )

    t = pq.read_table(MEDIA_REAL_FIXTURE).to_pylist()
    decodable = [r for r in t if r["kind"] != "video"]
    assert len(decodable) >= 100
    for r in decodable[:25]:
        feats = decode_media_features(r["payload"])
        assert f32_bits_csv(feats) == r["feat_bits"], r["media_id"]
        assert feature_checksum(feats) == r["feat_checksum"], r["media_id"]
    for r in t:
        if r["kind"] == "video":
            with pytest.raises(NotImplementedError):
                decode_media_features(r["payload"])


def test_distributed_real_decode_matches_fixture(spark):
    """End-to-end through mapInPandas: the executor-side real decode
    reproduces the generation-time features bit-for-bit."""
    from pyspark.sql import functions as F

    from diffdataflowmlpipelines_spark.functions.multimodal import (
        MEDIA_SCHEMA,
        extract_media_features,
        features_bits_csv,
    )
    from diffdataflowmlpipelines_spark.plans.datapipeline_queries import (
        MEDIA_REAL_FIXTURE,
    )

    media = spark.read.parquet(MEDIA_REAL_FIXTURE).filter(F.col("kind") != "video")
    out = extract_media_features(
        media.select(*[f.name for f in MEDIA_SCHEMA.fields]),
        decode_fn=decode_media_features,
    )
    got = (
        out.select("media_id", features_bits_csv("features").alias("bits"), "feat_checksum")
        .join(
            media.select(
                "media_id",
                F.col("feat_bits").alias("want_bits"),
                F.col("feat_checksum").alias("want_chk"),
            ),
            "media_id",
        )
        .collect()
    )
    assert len(got) == 108
    for r in got:
        assert r["bits"] == r["want_bits"], r["media_id"]
        assert r["feat_checksum"] == r["want_chk"], r["media_id"]
