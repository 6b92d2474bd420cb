"""Multimodal plumbing: schemas, batch shapes, deterministic features, dedup."""

import numpy as np
from pyspark.sql import functions as F

from cqaduplicatefind_spark.functions.multimodal import (
    FEATURE_DIM,
    byte_features,
    decode_images,
    media_exact_dedup,
    sample_video_frames,
    with_media_features,
)


def _media_df(spark):
    rows = [
        ("m1", "image", bytes(range(200)), 16, 16, None),
        ("m2", "image", bytes(range(200)), 16, 16, None),   # exact dup of m1
        ("m3", "image", b"\xff" * 120, 16, 16, None),
        ("m4", "video", bytes(range(100)) * 4, None, None, 4000),
        ("m5", "audio", b"\x01\x02" * 64, None, None, 2000),
    ]
    return spark.createDataFrame(
        rows,
        "media_id string, media_type string, payload binary, "
        "width int, height int, duration_ms int",
    )


def test_byte_features_deterministic_and_shaped():
    f1 = byte_features(bytes(range(200)))
    f2 = byte_features(bytes(range(200)))
    assert f1.shape == (FEATURE_DIM,)
    assert np.array_equal(f1, f2)
    assert byte_features(b"").shape == (FEATURE_DIM,)


def test_with_media_features_schema_and_values(spark):
    df = _media_df(spark)
    out = with_media_features(df)
    assert "features" in out.columns and "payload" not in out.columns
    rows = {r.media_id: r for r in out.collect()}
    assert len(rows["m1"].features) == FEATURE_DIM
    assert rows["m1"].features == rows["m2"].features  # identical payloads
    assert rows["m1"].features != rows["m3"].features


def test_media_exact_dedup(spark):
    df = _media_df(spark)
    groups = media_exact_dedup(df).collect()
    assert len(groups) == 1
    assert groups[0].dup_count == 2
    assert groups[0].canonical == "m1"


def test_decode_images_stub_runs_batched(spark):
    df = _media_df(spark).where(F.col("media_type") == "image")
    rows = decode_images(df).collect()
    assert len(rows) == 3
    for r in rows:
        assert r.height > 0 and r.width > 0
        assert 0.0 <= r.mean_pixel <= 255.0
    # stub determinism: identical payloads decode identically
    by = {r.media_id: r.mean_pixel for r in rows}
    assert by["m1"] == by["m2"]


def test_sample_video_frames_explodes(spark):
    df = _media_df(spark).where(F.col("media_type") == "video")
    rows = sample_video_frames(df, n_frames=4).collect()
    assert len(rows) == 4
    assert sorted(r.frame_idx for r in rows) == [0, 1, 2, 3]
    assert all(len(bytes(r.frame)) > 0 for r in rows)
