"""Multimodal plumbing: schema, batch shapes, deterministic fake decode,
and the NotImplementedError gate on the real decoder."""

import numpy as np
import pytest

from solr_spark.operators.multimodal import (
    extract_features,
    fake_decode,
    frame_sample,
    real_decode,
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


def test_real_decode_is_gated(assets):
    with pytest.raises(Exception) as ei:
        extract_features(assets, decode=real_decode).collect()
    assert "NotImplementedError" in str(ei.value) or "decode" in str(ei.value)


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
