"""Multimodal plumbing: schema, batch shapes, deterministic fake decode,
pure-numpy decoders for the uncompressed containers (netpbm/BMP/WAV),
and the NotImplementedError gate on compressed codecs."""

import struct

import numpy as np
import pytest

from solr_spark.operators.multimodal import (
    decode_bmp,
    decode_ppm,
    decode_wav,
    extract_features,
    fake_decode,
    frame_sample,
    real_decode,
    real_featurize,
    resize_meta,
    synthesize_assets,
)


@pytest.fixture(scope="module")
def assets(spark):
    return synthesize_assets(spark, 60, seed=42).persist()


def test_asset_schema_and_determinism(spark, assets):
    rows = {r.asset_id: r for r in assets.collect()}
    again = {r.asset_id: r for r in synthesize_assets(spark, 60, seed=42).collect()}
    assert len(rows) == 60
    for k in rows:
        assert rows[k].payload == again[k].payload
        assert rows[k].modality in ("image", "audio", "video")
        assert set(rows[k].meta) == {"w", "h"}


def test_extract_features_fake(assets):
    feats = extract_features(assets, decode=fake_decode).collect()
    assert len(feats) == 60
    for r in feats:
        v = np.array(r.feature)
        assert len(v) == 8 and abs(v.sum() - 1.0) < 1e-9
        assert r.n_bytes >= 64


def test_real_decode_gates_compressed_codecs():
    # JPEG magic -> still needs external codec libs
    with pytest.raises(NotImplementedError):
        real_decode(b"\xff\xd8\xff\xe0" + b"\x00" * 64, "image")


# --------------------------- golden-file decoders (round 5 de-stub)

def _ppm_bytes(img: np.ndarray) -> bytes:
    h, w = img.shape[:2]
    magic = b"P6" if img.ndim == 3 else b"P5"
    return magic + f"\n# golden\n{w} {h}\n255\n".encode() + img.tobytes()


def _bmp_bytes(img_rgb: np.ndarray, top_down: bool = False) -> bytes:
    h, w = img_rgb.shape[:2]
    stride = (w * 3 + 3) & ~3
    rows = img_rgb[:, :, ::-1]  # RGB -> BGR
    if not top_down:
        rows = rows[::-1]
    body = b"".join(
        rows[y].tobytes() + b"\x00" * (stride - w * 3) for y in range(h)
    )
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, (h if not top_down else -h), 1, 24, 0,
        len(body), 2835, 2835, 0, 0,
    )
    file_hdr = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(body), 0, 0, 54)
    return file_hdr + info + body


def _wav_bytes(samples_i16: np.ndarray, rate: int, channels: int = 1) -> bytes:
    data = samples_i16.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, channels, rate,
                      rate * channels * 2, channels * 2, 16)
    return (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )


def test_decode_ppm_golden():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (5, 4, 3), dtype=np.uint8)
    assert np.array_equal(decode_ppm(_ppm_bytes(img)), img)
    gray = rng.integers(0, 256, (3, 6), dtype=np.uint8)
    assert np.array_equal(decode_ppm(_ppm_bytes(gray)), gray)
    assert np.array_equal(real_decode(_ppm_bytes(img), "image"), img)


def test_decode_bmp_golden_both_orientations():
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (3, 5, 3), dtype=np.uint8)  # w=5 forces padding
    assert np.array_equal(decode_bmp(_bmp_bytes(img)), img)
    assert np.array_equal(decode_bmp(_bmp_bytes(img, top_down=True)), img)
    assert np.array_equal(real_decode(_bmp_bytes(img), "image"), img)


def test_decode_wav_golden_mono_and_stereo():
    t = np.arange(64)
    mono = (np.sin(t / 3.0) * 20000).astype(np.int16)
    x, rate = decode_wav(_wav_bytes(mono, 8000))
    assert rate == 8000
    assert np.allclose(x, mono / 32768.0)
    stereo = np.stack([mono, -mono], axis=1).reshape(-1)
    x2, _ = decode_wav(_wav_bytes(stereo, 16000, channels=2))
    assert np.allclose(x2, 0.0)  # L + R cancel
    assert np.allclose(real_decode(_wav_bytes(mono, 8000), "audio"), x)


def test_real_featurize_through_pipeline(spark):
    """extract_features over REAL container bytes end-to-end: the
    Arrow plumbing carries decoded-content histograms."""
    import pandas as pd

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
    wav = (np.sin(np.arange(256) / 5.0) * 30000).astype(np.int16)
    pdf = pd.DataFrame(
        {
            "asset_id": [0, 1, 2],
            "modality": ["image", "image", "audio"],
            "payload": [_ppm_bytes(img), _bmp_bytes(img), _wav_bytes(wav, 8000)],
            "meta": [{"w": "8", "h": "8"}] * 3,
        }
    )
    assets = spark.createDataFrame(
        pdf, "asset_id long, modality string, payload binary, "
        "meta map<string,string>"
    )
    feats = {
        r.asset_id: np.array(r.feature)
        for r in extract_features(assets, decode=real_featurize).collect()
    }
    assert len(feats) == 3
    # PPM and BMP of the SAME image decode to the same pixels -> same feature
    assert np.allclose(feats[0], feats[1])
    for v in feats.values():
        assert len(v) == 8 and abs(v.sum() - 1.0) < 1e-9


def test_frame_sample_video_only(assets):
    frames = frame_sample(assets, every_n_bytes=64).collect()
    vids = {r.asset_id for r in assets.where("modality = 'video'").collect()}
    assert frames and {r.asset_id for r in frames} == vids
    by_asset = {}
    for r in frames:
        by_asset.setdefault(r.asset_id, []).append(r.frame_no)
    for nos in by_asset.values():
        assert sorted(nos) == list(range(len(nos)))


def test_resize_meta(assets):
    rows = resize_meta(assets, max_side=32).collect()
    for r in rows:
        assert max(r.target_w, r.target_h) <= 32
