"""Multimodal plumbing AND the real stdlib codecs: PNG encode/decode
(all five scanline filters), WAV PCM round-trip, schemas, batch shapes,
and determinism; only video decode remains a gated stub."""

import struct

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
    """Every row of the synthetic media table now carries a REAL
    container — PNG images, WAV audio, MJPEG-AVI video — and fake=False
    must decode all three (no gated fallback left in the table)."""
    pdf = media.toPandas()
    for _, row in pdf.iterrows():
        payload, mt = bytes(row["media"]), row["media_type"]
        sig = decode_media(payload, mt, fake=False)
        assert len(sig) > 0
        if mt in ("image", "video"):  # pixels normalized to [0, 1]
            assert 0.0 <= sig.min() and sig.max() <= 1.0
        else:  # PCM samples in [-1, 1]
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


def test_jpeg_roundtrip_gray_color_subsampled():
    """Baseline JPEG encoder->decoder round trip (functions/mjpeg.py):
    grayscale, RGB 4:4:4, and RGB 4:2:0 (exercises the generic
    multi-sampling MCU path), at non-multiple-of-8 dimensions."""
    from holi_search_engine_spark.functions.mjpeg import jpeg_decode, jpeg_encode

    def psnr(a, b):
        mse = np.mean((a.astype(float) - b.astype(float)) ** 2)
        return 99.0 if mse == 0 else 10 * np.log10(255**2 / mse)

    yy, xx = np.mgrid[0:50, 0:70]
    gray = ((yy * 2 + xx * 3) % 256).astype(np.uint8)
    out = jpeg_decode(jpeg_encode(gray, 90))
    assert out.shape == gray.shape and psnr(gray, out) > 35
    rgb = (
        np.stack(
            [
                128 + 90 * np.sin(xx / 9.0),
                128 + 90 * np.cos(yy / 7.0),
                128 + 80 * np.sin((xx + yy) / 11.0),
            ],
            axis=-1,
        )
        .clip(0, 255)
        .astype(np.uint8)
    )
    d444 = jpeg_decode(jpeg_encode(rgb, 90))
    assert d444.shape == rgb.shape and psnr(rgb, d444) > 35
    d420 = jpeg_decode(jpeg_encode(rgb, 90, subsample=True))
    assert d420.shape == rgb.shape and psnr(rgb, d420) > 28
    # high quality on a smooth image approaches lossless
    smooth = (128 + 100 * np.sin(yy / 15.0) * np.cos(xx / 18.0)).astype(np.uint8)
    assert psnr(smooth, jpeg_decode(jpeg_encode(smooth, 95))) > 45


def test_jpeg_fill_bytes_and_abbreviated_frames():
    """Two stream shapes real MJPEG cameras emit (T.81 B.1.1.2 fill bytes;
    OpenDML abbreviated frames with no DHT, implying the Annex K tables):
    both must decode to exactly the bytes the full-table stream decodes to."""
    import struct

    from holi_search_engine_spark.functions.mjpeg import jpeg_decode, jpeg_encode

    rng = np.random.default_rng(7)
    img = rng.integers(0, 255, (40, 56, 3), dtype=np.uint8)
    enc = jpeg_encode(img, quality=90)
    base = jpeg_decode(enc)

    # 0xFF fill bytes padded before a marker
    i = enc.index(b"\xff\xdb")
    assert np.array_equal(jpeg_decode(enc[:i] + b"\xff\xff\xff" + enc[i:]), base)

    # strip every segment of a marker kind from the header
    def strip(d, kind):
        out = bytearray(d[:2])
        pos = 2
        while pos < len(d):
            m = d[pos + 1]
            if m == 0xDA:
                out += d[pos:]
                break
            (ln,) = struct.unpack(">H", d[pos + 2:pos + 4])
            if m != kind:
                out += d[pos:pos + 2 + ln]
            pos += 2 + ln
        return bytes(out)

    no_dht = strip(enc, 0xC4)
    assert b"\xff\xc4" not in no_dht[:no_dht.index(b"\xff\xda")]
    assert np.array_equal(jpeg_decode(no_dht), base)

    with pytest.raises(ValueError, match="quantization"):
        jpeg_decode(strip(enc, 0xDB))


def test_jpeg_rejects_undefined_table_id_when_dht_present():
    """A stream that DID define Huffman tables but whose scan references a
    never-defined id is corrupt — the Annex K default-table backfill is
    restricted to the OpenDML no-DHT-at-all case, so this must raise, not
    decode to garbage (round-4 ADVICE)."""
    from holi_search_engine_spark.functions.mjpeg import jpeg_decode, jpeg_encode

    rng = np.random.default_rng(11)
    img = rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)
    data = bytearray(jpeg_encode(img, quality=90))
    i = data.find(b"\xff\xda")
    assert i > 0
    # SOS: FFDA len ns (cid tabs)*ns — point the first component at
    # DC/AC table id 3, which the encoder never defines
    data[i + 6] = 0x33
    with pytest.raises(ValueError, match="undefined"):
        jpeg_decode(bytes(data))


def test_avi_and_jpeg_truncation_fuzz():
    """Adversarial truncation sweep (round-4 verdict housekeeping): a cut
    anywhere inside an AVI payload must raise ValueError (the RIFF size
    field makes truncation detectable up front — never a silent frame
    prefix, never a raw struct.error/IndexError), and a truncated JPEG
    stream must either raise ValueError or decode to a full-shaped image
    (cuts that only lose trailing markers)."""
    from holi_search_engine_spark.functions.mjpeg import (
        avi_decode_frames,
        avi_encode_frames,
        avi_meta,
        jpeg_decode,
        jpeg_encode,
    )

    rng = np.random.default_rng(5)
    img = rng.integers(0, 255, (24, 32, 3), dtype=np.uint8)
    frames = [jpeg_encode(img, 90), jpeg_encode(img // 2, 90)]
    avi = avi_encode_frames(frames, 32, 24, fps=12)
    assert avi_decode_frames(avi) == frames  # untruncated still round-trips
    for cut in range(0, len(avi), 3):
        with pytest.raises(ValueError):
            avi_decode_frames(avi[:cut])
        try:
            meta = avi_meta(avi[:cut])
            assert meta["width"] == 32  # header complete: meta is correct
        except ValueError:
            pass

    enc = frames[0]
    full = jpeg_decode(enc)
    ok = 0
    for cut in range(2, len(enc), 3):
        try:
            out = jpeg_decode(enc[:cut])
            assert out.shape == full.shape
            ok += 1
        except ValueError:
            pass
    # sanity: the sweep exercised both outcomes (some cuts decode — e.g.
    # losing only the EOI — most raise)
    assert ok < len(range(2, len(enc), 3))


def test_avi_meta_inflated_size_fields_raise_valueerror():
    """Corruption twin of the truncation sweep: a size FIELD that lies
    (inflated past the payload) while the RIFF size stays honest must
    raise the normalized ValueError from ``avi_meta`` — before the
    guards, an inflated hdrl LIST size walked the inner loop past the
    buffer and leaked a raw ``struct.error`` from a short slice."""
    from holi_search_engine_spark.functions.mjpeg import (
        avi_encode_frames,
        avi_meta,
        jpeg_encode,
    )

    img = np.zeros((8, 8), dtype=np.uint8)
    avi = avi_encode_frames([jpeg_encode(img)], 8, 8, fps=1)

    # inflate the hdrl LIST's own size: inner walk would overrun len(data)
    i = avi.find(b"LIST")
    assert i >= 0 and avi[i + 8:i + 12] == b"hdrl"
    bad = bytearray(avi)
    bad[i + 4:i + 8] = struct.pack("<I", 0xFFFFFF00)
    with pytest.raises(ValueError):
        avi_meta(bytes(bad))

    # inflate an inner header chunk's size (avih): overruns its parent LIST
    j = avi.find(b"avih")
    bad = bytearray(avi)
    bad[j + 4:j + 8] = struct.pack("<I", 0xFFFFFF00)
    with pytest.raises(ValueError):
        avi_meta(bytes(bad))


def test_jpeg_rejects_progressive():
    from holi_search_engine_spark.functions.mjpeg import jpeg_decode, jpeg_encode

    data = bytearray(jpeg_encode(np.zeros((8, 8), dtype=np.uint8)))
    i = data.find(b"\xff\xc0")
    data[i + 1] = 0xC2  # flip SOF0 -> SOF2 (progressive)
    with pytest.raises(ValueError):
        jpeg_decode(bytes(data))


def test_avi_container_roundtrip_and_meta():
    from holi_search_engine_spark.functions.mjpeg import (
        avi_decode_frames,
        avi_encode_frames,
        avi_meta,
        jpeg_encode,
    )

    yy, xx = np.mgrid[0:24, 0:32]
    frames = [
        jpeg_encode(((xx * 5 + yy * 9 + f * 31) % 256).astype(np.uint8), 90)
        for f in range(5)
    ]
    avi = avi_encode_frames(frames, 32, 24, fps=12)
    assert avi_decode_frames(avi) == frames  # byte-identical chunks
    meta = avi_meta(avi)
    assert meta["width"] == 32 and meta["height"] == 24
    assert meta["total_frames"] == 5 and meta["us_per_frame"] == 83333
    # odd-sized frame bodies must keep RIFF's even-byte chunk alignment
    odd = [b"\x01\x02\x03", b"\x04\x05"]
    assert avi_decode_frames(avi_encode_frames(odd, 2, 2)) == odd


def test_decode_media_video_real_mjpeg():
    """decode_media on an MJPEG-AVI payload returns the concatenated
    decoded frame pixels in [0,1] — the former video stub is real
    (strict mode, no fake fallback)."""
    from holi_search_engine_spark.functions.mjpeg import (
        avi_encode_frames,
        jpeg_encode,
    )

    yy, xx = np.mgrid[0:16, 0:16]
    frames = [
        jpeg_encode(((xx + yy + f * 13) % 256).astype(np.uint8), 90)
        for f in range(4)
    ]
    avi = avi_encode_frames(frames, 16, 16)
    sig = decode_media(avi, "video", fake=False)
    assert sig.shape == (4 * 16 * 16,)
    assert sig.dtype == np.float32
    assert 0.0 <= sig.min() and sig.max() <= 1.0


def test_sample_frames_real_avi(spark):
    """sample_frames on AVI payloads emits the container's REAL JPEG
    frames (evenly strided), not byte slices."""
    from holi_search_engine_spark.functions.mjpeg import (
        avi_encode_frames,
        jpeg_encode,
    )
    from holi_search_engine_spark.operators.multimodal import (
        FRAME_COUNT,
        MEDIA_SCHEMA,
        sample_frames,
    )

    yy, xx = np.mgrid[0:8, 0:8]
    frames = [
        jpeg_encode(((xx * 3 + yy * 7 + f) % 256).astype(np.uint8), 90)
        for f in range(7)
    ]
    avi = avi_encode_frames(frames, 8, 8)
    df = spark.createDataFrame(
        [(1, "video", bytearray(avi), 8, 8, 700)], MEDIA_SCHEMA
    )
    got = sample_frames(df).orderBy("frame_no").collect()
    assert len(got) == FRAME_COUNT
    sampled = [bytes(r["frame"]) for r in got]
    assert all(f in frames for f in sampled)  # real container frames
    assert sampled[0] == frames[0] and sampled[-1] == frames[-1]
