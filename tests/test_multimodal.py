"""Multimodal plumbing AND the real stdlib codecs: PNG encode/decode
(all five scanline filters), WAV PCM round-trip, schemas, batch shapes,
and determinism; only video decode remains a gated stub."""

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


def test_unknown_container_is_gated():
    # no stdlib codec for arbitrary bytes / video containers
    with pytest.raises(NotImplementedError):
        decode_media(b"\x00\x01", "video", fake=False)


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


def test_png_roundtrip_all_filters_and_channels():
    """REAL PNG decode: encode deterministic images with every scanline
    filter type (0-4) and every supported channel layout, decode with the
    stdlib-only decoder, require pixel equality."""
    from holi_search_engine_spark.operators.multimodal import (
        _png_decode,
        _png_encode,
    )

    rng = np.random.RandomState(7)
    shapes = [(9, 13), (8, 5, 2), (6, 7, 3), (5, 4, 4)]
    for shape in shapes:
        img = rng.randint(0, 256, size=shape).astype(np.uint8)
        for filters in ([0], [1], [2], [3], [4], [0, 1, 2, 3, 4]):
            data = _png_encode(img, filters=filters)
            out = _png_decode(data)
            exp = img if img.ndim == 3 else img[:, :, None]
            assert out.shape == exp.shape, (shape, filters)
            assert (out == exp).all(), (shape, filters)


def test_png_rejects_unsupported():
    from holi_search_engine_spark.operators.multimodal import _png_decode

    with pytest.raises(ValueError):
        _png_decode(b"nonsense")


def test_wav_roundtrip():
    """REAL WAV decode: 16-bit PCM round-trip to within quantization."""
    from holi_search_engine_spark.operators.multimodal import (
        _wav_decode,
        _wav_encode,
    )

    t = np.arange(500) / 16000.0
    sig = 0.7 * np.sin(2 * np.pi * 440 * t) + 0.2 * np.sin(2 * np.pi * 97 * t)
    out = _wav_decode(_wav_encode(sig))
    assert len(out) == len(sig)
    # half-step rounding + the 32767-encode/32768-decode scale mismatch
    assert np.abs(out - sig).max() < 1.5 / 32768


def test_decode_media_routes_real_codecs(spark, media):
    """Image/audio rows of the synthetic media table now carry REAL
    containers: fake=False must decode them (only video stays gated)."""
    pdf = media.toPandas()
    for _, row in pdf.iterrows():
        payload, mt = bytes(row["media"]), row["media_type"]
        if mt == "video":
            with pytest.raises(NotImplementedError):
                decode_media(payload, mt, fake=False)
        else:
            sig = decode_media(payload, mt, fake=False)
            assert len(sig) > 0
            if mt == "image":
                assert 0.0 <= sig.min() and sig.max() <= 1.0
            else:
                assert -1.0 <= sig.min() and sig.max() <= 1.0


def test_fake_mode_never_raises_on_corrupt_containers():
    """A payload with a recognized magic but corrupt/unsupported body must
    fall back to the deterministic fake signal in fake mode (the
    never-raise contract of the default pipeline path) and raise the
    decode error in strict mode."""
    from holi_search_engine_spark.operators.multimodal import _PNG_MAGIC

    corrupt = _PNG_MAGIC + b"\x00\x01garbage"
    sig = decode_media(corrupt, "image", fake=True)
    assert len(sig) == len(corrupt)
    with pytest.raises(Exception):
        decode_media(corrupt, "image", fake=False)
