"""Multimodal binary-column plumbing: schema, batch shape, determinism."""

import hashlib

import pytest
from pyspark.sql import functions as F

from exness_data_preprocess_spark.operators.multimodal import (
    FEATURE_DIM,
    extract_media_features,
    sample_video_frames,
    synthesize_media_from_documents,
)


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.createDataFrame(
        [(i, f"document number {i} with payload text", "en", "s", 30 + i)
         for i in range(9)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    return synthesize_media_from_documents(docs)


def test_media_schema(media):
    assert dict(media.dtypes)["payload"] == "binary"
    types = {r["media_type"] for r in media.select("media_type").distinct().collect()}
    assert types == {"image", "audio", "video"}


def test_feature_extraction_shape_and_digest(media):
    out = extract_media_features(media).collect()
    assert len(out) == 9
    for r in out:
        assert len(r["features"]) == FEATURE_DIM
        assert r["payload_bytes"] > 0
    # digest matches a locally computed sha256 of the same payload
    row = media.filter(F.col("asset_id") == 0).first()
    expected = hashlib.sha256(bytes(row["payload"])).hexdigest()
    got = next(r for r in out if r["asset_id"] == 0)
    assert got["payload_sha256"] == expected


def test_video_frame_sampling(media):
    n_videos = media.filter(F.col("media_type") == "video").count()
    frames = sample_video_frames(media, n_frames=3).collect()
    assert len(frames) == n_videos * 3
    assert {r["frame_idx"] for r in frames} == {0, 1, 2}
    # deterministic: same payload → same frame digests on re-run
    again = sample_video_frames(media, n_frames=3).collect()
    assert sorted(r["frame_sha256"] for r in frames) == sorted(
        r["frame_sha256"] for r in again
    )
