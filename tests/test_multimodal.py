"""Multimodal plumbing: schemas, batch shapes, and determinism of the
stubbed decode path (real decoders are a drop-in swap)."""

import numpy as np
import pytest

from holi_search_engine_spark.operators.multimodal import (
    FEATURE_DIM,
    FRAME_COUNT,
    decode_media,
    extract_features,
    resize_stub,
    sample_frames,
    synth_media_df,
)


@pytest.fixture(scope="module")
def media(spark):
    return synth_media_df(spark, 30).cache()


def test_real_decode_is_gated():
    with pytest.raises(NotImplementedError):
        decode_media(b"\x00\x01", "image", fake=False)


def test_extract_features_schema_and_shape(spark, media):
    out = extract_features(media)
    assert out.schema.simpleString() == (
        "struct<media_id:bigint,media_type:string,features:array<float>>"
    )
    pdf = out.toPandas()
    assert len(pdf) == 30
    assert all(len(f) == FEATURE_DIM for f in pdf["features"])


def test_extract_features_deterministic(spark, media):
    a = extract_features(media).toPandas().sort_values("media_id")
    b = extract_features(media.repartition(7)).toPandas().sort_values("media_id")
    for fa, fb in zip(a["features"], b["features"]):
        assert np.allclose(fa, fb)


def test_sample_frames_only_video(spark, media):
    pdf = sample_frames(media).toPandas()
    n_videos = media.where("media_type = 'video'").count()
    assert len(pdf) == n_videos * FRAME_COUNT
    assert set(pdf["frame_no"]) == set(range(FRAME_COUNT))
    assert all(len(bytes(f)) > 0 for f in pdf["frame"])


def test_resize_stub_dimensions(spark, media):
    pdf = resize_stub(media, 8, 6).toPandas()
    n_images = media.where("media_type = 'image'").count()
    assert len(pdf) == n_images
    assert (pdf["width"] == 8).all() and (pdf["height"] == 6).all()
    assert all(len(bytes(m)) == 8 * 6 for m in pdf["media"])


def test_features_join_without_payload(spark, media):
    # downstream joins run on the projected features, never the bytes
    feats = extract_features(media)
    joined = feats.join(media.select("media_id", "duration_ms"), "media_id")
    assert "media" not in joined.columns
    assert joined.count() == 30
