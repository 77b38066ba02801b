"""Multimodal plumbing tests: schema, batch shape, determinism, and the
stubbed-decoder contract (SURVEY.md §2.12 multimodal columns)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spotify_data_pipeline_spark.operators.multimodal import (
    attach_media_metadata,
    decode_image,
    extract_media_features,
    fake_decoder,
    sample_frames,
)


@pytest.fixture()
def media_df(spark):
    rows = [
        (1, bytes(range(200))),
        (2, b"\x00" * 50),
        (3, bytes(range(200))),  # exact duplicate of 1
        (4, b""),
    ]
    return spark.createDataFrame(rows, "doc_id long, media binary")


def test_metadata_is_jvm_side_and_dedupable(spark, media_df):
    out = attach_media_metadata(media_df).select("doc_id", "media_meta.*")
    rows = {r.doc_id: r for r in out.collect()}
    assert rows[1].n_bytes == 200 and rows[2].n_bytes == 50
    assert rows[1].checksum == rows[3].checksum  # dup detection pre-decode
    assert rows[1].checksum != rows[2].checksum


def test_extract_features_with_fake_decoder(spark, media_df):
    out = extract_media_features(media_df, decoder=fake_decoder, feature_dim=8)
    assert [f.name for f in out.schema.fields] == ["doc_id", "media_meta", "feature"]
    rows = {r.doc_id: r for r in out.collect()}
    assert len(rows) == 4
    assert len(rows[1].feature) == 8
    assert rows[1].feature == rows[3].feature  # deterministic
    assert abs(sum(rows[1].feature) - 1.0) < 1e-6  # normalized histogram
    assert rows[1].media_meta.width is not None
    # stable under repartitioning (map-only operator)
    out2 = extract_media_features(media_df.repartition(3), decoder=fake_decoder, feature_dim=8)
    rows2 = {r.doc_id: list(r.feature) for r in out2.collect()}
    assert rows2[1] == list(rows[1].feature)


def test_decode_stub_raises_clearly(spark, media_df):
    out = extract_media_features(media_df, decoder=decode_image)
    with pytest.raises(Exception, match="NotImplementedError|imaging library"):
        out.collect()


def test_sample_frames_shape(spark, media_df):
    frames = sample_frames(media_df, n_frames=4, frame_bytes=32)
    rows = frames.where(F.col("doc_id") == 1).orderBy("frame_idx").collect()
    assert [r.frame_idx for r in rows] == [0, 1, 2, 3]
    assert all(1 <= len(r.frame) <= 32 for r in rows)
    # empty blob yields no frames
    assert frames.where(F.col("doc_id") == 4).count() == 0


def test_decode_image_parses_netpbm_natively(spark):
    """decode_image is a REAL decoder for netpbm (P5/P6) — header parse,
    no libraries — exercised end-to-end through the Arrow batch path."""
    from spotify_data_pipeline_spark.operators.multimodal import decode_image

    p6 = b"P6\n# a comment\n4 3\n255\n" + bytes(4 * 3 * 3)
    p5 = b"P5 2 2 255 " + bytes(4)
    meta = decode_image(p6)
    assert (meta["width"], meta["height"]) == (4, 3)
    assert meta["media_type"] == "image/x-portable-pixmap"
    assert decode_image(p5)["media_type"] == "image/x-portable-graymap"

    df = spark.createDataFrame([(1, bytearray(p6)), (2, bytearray(p5))], "doc_id long, media binary")
    out = {r.doc_id: r.media_meta for r in
           extract_media_features(df, decoder=decode_image).collect()}
    assert (out[1].width, out[1].height) == (4, 3)
    assert (out[2].width, out[2].height) == (2, 2)

    import pytest as _pytest

    with _pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG\r\n\x1a\n....")


def test_resize_netpbm_native_roundtrip(spark):
    """Real nearest-neighbor resize of P5/P6 blobs: output parses as
    netpbm at the target dims, and a solid-color image stays solid."""
    import numpy as np

    from spotify_data_pipeline_spark.operators.multimodal import (
        _decode_netpbm,
        resize_images,
    )

    # 4x3 RGB: left half red, right half blue; 2x2 gray gradient
    rgb = np.zeros((3, 4, 3), dtype=np.uint8)
    rgb[:, :2] = [255, 0, 0]
    rgb[:, 2:] = [0, 0, 255]
    p6 = b"P6\n4 3\n255\n" + rgb.tobytes()
    gray = np.array([[0, 85], [170, 255]], dtype=np.uint8)
    p5 = b"P5\n2 2\n255\n" + gray.reshape(2, 2, 1).tobytes()
    df = spark.createDataFrame([(1, p6), (2, p5)], "doc_id long, media binary")

    out = {r.doc_id: r for r in resize_images(df, width=8, height=6).collect()}
    for rid, magic in [(1, "P6"), (2, "P5")]:
        meta = _decode_netpbm(bytes(out[rid].resized))
        assert (meta["width"], meta["height"]) == (8, 6)
        assert meta["_magic"] == magic
    # nearest-neighbor preserves the half split exactly on upscale
    resized = np.frombuffer(
        bytes(out[1].resized)[len(b"P6\n8 6\n255\n"):], dtype=np.uint8
    ).reshape(6, 8, 3)
    assert (resized[:, :4] == [255, 0, 0]).all()
    assert (resized[:, 4:] == [0, 0, 255]).all()


def test_resize_downscale_shrinks_bytes(spark):
    import numpy as np

    from spotify_data_pipeline_spark.operators.multimodal import resize_images

    big = b"P5\n64 64\n255\n" + bytes(np.arange(64 * 64, dtype=np.uint32).astype(np.uint8))
    df = spark.createDataFrame([(1, big)], "doc_id long, media binary")
    r = resize_images(df, width=16, height=16).collect()[0]
    assert len(bytes(r.resized)) < len(big)
    assert (r.width, r.height) == (16, 16)


def test_resize_unknown_format_requires_injected_decoder(spark):
    import numpy as np

    import pytest as _pytest

    from spotify_data_pipeline_spark.operators.multimodal import resize_images

    df = spark.createDataFrame([(1, b"\xff\xd8JPEGDATA")], "doc_id long, media binary")
    with _pytest.raises(Exception, match="netpbm|NotImplementedError"):
        resize_images(df).collect()

    def fake_pixels(raw: bytes) -> dict:
        return {"magic": "P5", "pixels": np.full((4, 4, 1), 7, dtype=np.uint8)}

    out = resize_images(df, pixel_decoder=fake_pixels, width=2, height=2).collect()[0]
    assert bytes(out.resized).endswith(bytes([7, 7, 7, 7]))


def _wav(sample_rate=8000, channels=1, bits=16, n_samples=4000):
    import struct

    byte_rate = sample_rate * channels * bits // 8
    block = channels * bits // 8
    payload = bytes(n_samples * block)
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate, byte_rate, block, bits)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(payload)) + payload
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def test_decode_wav_natively(spark):
    """decode_audio is a REAL decoder for RIFF/PCM WAV — 8000 Hz mono
    16-bit, 4000 samples = exactly 500 ms."""
    from spotify_data_pipeline_spark.operators.multimodal import decode_audio

    meta = decode_audio(_wav())
    assert meta["media_type"] == "audio/wav"
    assert meta["duration_ms"] == 500
    assert meta["_sample_rate"] == 8000 and meta["_channels"] == 1

    stereo = decode_audio(_wav(sample_rate=44100, channels=2, n_samples=44100))
    assert stereo["duration_ms"] == 1000 and stereo["_channels"] == 2


def test_audio_features_pipeline(spark):
    """The same extract_media_features seam runs audio: duration lands
    in the typed metadata struct, feature vector has the fixed dim."""
    from spotify_data_pipeline_spark.operators.multimodal import (
        decode_audio,
        extract_media_features,
    )

    df = spark.createDataFrame([(1, _wav())], "doc_id long, media binary")
    r = extract_media_features(df, decoder=decode_audio).collect()[0]
    assert r.media_meta.media_type == "audio/wav"
    assert r.media_meta.duration_ms == 500
    assert len(r.feature) == 8


def test_decode_audio_rejects_compressed(spark):
    import pytest as _pytest

    from spotify_data_pipeline_spark.operators.multimodal import decode_audio

    with _pytest.raises(NotImplementedError, match="WAV"):
        decode_audio(b"ID3\x04mp3data")


def _ppm(arr):
    import numpy as np

    h, w = arr.shape[:2]
    magic = b"P6" if arr.ndim == 3 and arr.shape[2] == 3 else b"P5"
    header = magic + f"\n{w} {h}\n255\n".encode()
    return header + np.ascontiguousarray(arr.astype("uint8")).tobytes()


def test_image_dhash_stable_under_brightness_and_resize(spark):
    """dHash: identical for a brightness-shifted copy (gradient signs
    survive monotone transforms), near for a lightly perturbed copy,
    far for unrelated noise; and the banded near-dup join finds exactly
    the planted pairs."""
    import numpy as np

    from spotify_data_pipeline_spark.operators.multimodal import (
        dhash_neardup_pairs,
        image_dhash,
    )

    rng = np.random.default_rng(11)
    base = rng.integers(0, 200, size=(40, 40, 3))
    bright = np.clip(base + 30, 0, 255)          # monotone shift
    tweaked = base.copy()
    tweaked[5, 5] = 255 - tweaked[5, 5]          # tiny local edit
    other = rng.integers(0, 256, size=(40, 40, 3))
    other2 = rng.integers(0, 256, size=(64, 48, 3))

    rows = [
        (1, bytearray(_ppm(base))),
        (2, bytearray(_ppm(bright))),
        (3, bytearray(_ppm(tweaked))),
        (4, bytearray(_ppm(other))),
        (5, bytearray(_ppm(other2))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, media binary")
    hashes = image_dhash(df)
    hv = {r.doc_id: r.dhash for r in hashes.collect()}

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    assert hv[1] == hv[2]                        # brightness-invariant
    assert ham(hv[1], hv[3]) <= 3                # local edit: near
    assert ham(hv[1], hv[4]) > 10                # unrelated: far
    # deterministic across repartitioning
    hv2 = {r.doc_id: r.dhash for r in image_dhash(df.repartition(3)).collect()}
    assert hv == hv2

    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in dhash_neardup_pairs(hashes, max_hamming=3).collect()
    }
    assert set(pairs) == {(1, 2), (1, 3), (2, 3)}


def _wav_pcm(samples, rate=8000, channels=1):
    import struct

    import numpy as np

    data = np.asarray(samples, dtype="<i2").tobytes()
    byte_rate = rate * channels * 2
    hdr = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
    hdr += b"fmt " + struct.pack("<IHHIIHH", 16, 1, channels, rate, byte_rate, channels * 2, 16)
    hdr += b"data" + struct.pack("<I", len(data))
    return hdr + data


def test_audio_dhash_volume_invariant_and_near(spark):
    import numpy as np

    from spotify_data_pipeline_spark.operators.multimodal import (
        audio_dhash,
        dhash_neardup_pairs,
    )

    rng = np.random.default_rng(3)
    base = rng.integers(-8000, 8000, size=8000)          # 1s @ 8kHz
    louder = base * 2                                    # exact 2x gain
    tweaked = base.copy()
    tweaked[100:140] = 0                                 # short dropout
    other = rng.integers(-8000, 8000, size=8000)

    rows = [
        (1, bytearray(_wav_pcm(base))),
        (2, bytearray(_wav_pcm(louder))),
        (3, bytearray(_wav_pcm(tweaked))),
        (4, bytearray(_wav_pcm(other))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, media binary")
    hv = {r.doc_id: r.ahash for r in audio_dhash(df).collect()}

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    assert hv[1] == hv[2]                 # gain-invariant
    assert ham(hv[1], hv[3]) <= 3         # local dropout: near
    assert ham(hv[1], hv[4]) > 10         # unrelated: far

    pairs = {
        (r.id_a, r.id_b)
        for r in dhash_neardup_pairs(
            audio_dhash(df), hash_col="ahash", max_hamming=3
        ).collect()
    }
    assert pairs == {(1, 2), (1, 3), (2, 3)}


def test_dhash_null_and_garbage_blobs_yield_null_hash(spark):
    """Corpus-scale triage (ADVICE r03): one NULL or undecodable blob
    must not fail the whole stage — it yields a NULL hash, which the
    banded Hamming join then drops naturally (NULL never equi-joins)."""
    from spotify_data_pipeline_spark.operators.multimodal import (
        audio_dhash,
        dhash_neardup_pairs,
        image_dhash,
    )

    import numpy as np

    img = _ppm(np.arange(256, dtype=np.uint8).reshape(16, 16))
    df = spark.createDataFrame(
        [(1, bytearray(img)), (2, None), (3, bytearray(b"\x89PNG garbage"))],
        "doc_id long, media binary",
    )
    rows = {r.doc_id: r.dhash for r in image_dhash(df).collect()}
    assert rows[1] is not None and rows[2] is None and rows[3] is None
    # pairs join survives NULL hashes (no crash, no NULL-matched pairs)
    assert dhash_neardup_pairs(image_dhash(df)).count() == 0

    wav = _wav(n_samples=2000)
    adf = spark.createDataFrame(
        [(1, bytearray(wav)), (2, None), (3, bytearray(b"ID3 not a wav"))],
        "doc_id long, media binary",
    )
    arows = {r.doc_id: r.ahash for r in audio_dhash(adf).collect()}
    assert arows[1] is not None and arows[2] is None and arows[3] is None
