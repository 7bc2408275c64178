"""Multimodal plumbing tests: schema, batch shape, determinism, stub seam."""

from __future__ import annotations

import pytest

from bids2table_spark.operators.multimodal import (
    _FEAT_DIM,
    extract_features,
    frame_sample,
    synth_media,
)


def test_media_schema_and_determinism(spark):
    m1 = synth_media(spark, n=24).toPandas().sort_values("media_id", ignore_index=True)
    m2 = synth_media(spark, n=24).toPandas().sort_values("media_id", ignore_index=True)
    assert m1.equals(m2)
    assert set(m1["kind"]) == {"image", "audio", "video"}
    assert all(isinstance(b, (bytes, bytearray)) for b in m1["payload"])


def test_extract_features(spark):
    media = synth_media(spark, n=30)
    feats = extract_features(media).toPandas()
    assert len(feats) == 30
    assert all(len(v) == _FEAT_DIM for v in feats["feature"])
    assert feats["sha256"].str.len().eq(64).all()
    # image thumbs are half-size; audio has no dims
    img = feats[feats["kind"] == "image"]
    assert (img["thumb_w"] > 0).all()


def test_real_decode_is_stubbed(spark):
    media = synth_media(spark, n=6)
    with pytest.raises(Exception, match="NotImplementedError|PIL|ffmpeg"):
        extract_features(media, fake=False).collect()


def test_frame_sample_grid(spark):
    media = synth_media(spark, n=30)
    frames = frame_sample(media, every_ms=500).toPandas()
    assert (frames["ts_ms"] % 500 == 0).all()
    per_vid = frames.groupby("media_id").size()
    assert (per_vid >= 2).all()  # duration >= 1000ms -> at least 3 samples
