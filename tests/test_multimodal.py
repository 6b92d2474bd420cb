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


# --------------------------------------------------------------------------
# Real pure-stdlib codec (PPM / PNG) — no Pillow in the container
# --------------------------------------------------------------------------

def _rand_img(shape, seed):
    rng = np.random.Generator(np.random.PCG64(seed))
    return rng.integers(0, 256, size=shape, dtype=np.uint8)


def test_ppm_round_trip():
    from cqaduplicatefind_spark.functions.imagecodec import decode_ppm, encode_ppm

    rgb = _rand_img((7, 5, 3), 1)
    assert np.array_equal(decode_ppm(encode_ppm(rgb)), rgb)
    gray = _rand_img((4, 9), 2)
    out = decode_ppm(encode_ppm(gray))
    assert out.shape == (4, 9, 3)
    assert np.array_equal(out[:, :, 0], gray)
    assert np.array_equal(out[:, :, 1], gray)


def test_ppm_header_comments():
    from cqaduplicatefind_spark.functions.imagecodec import decode_ppm

    img = _rand_img((2, 3, 3), 3)
    payload = b"P6\n# a comment\n3 2\n# another\n255\n" + img.tobytes()
    assert np.array_equal(decode_ppm(payload), img)


def test_ppm_crlf_after_maxval_and_truncation():
    """Windows-style writers end the header with '255\\r\\n'; the decoder must
    skip the surplus whitespace instead of shifting every pixel by one byte —
    including when the first pixel byte is itself whitespace-valued. A payload
    shorter than w*h*channels raises instead of crashing in numpy."""
    import pytest

    from cqaduplicatefind_spark.functions.imagecodec import decode_ppm

    img = _rand_img((2, 3, 3), 5)
    img[0, 0, 0] = 0x20  # whitespace-valued first pixel byte stays data
    payload = b"P6\n3 2\n255\r\n" + img.tobytes()
    assert np.array_equal(decode_ppm(payload), img)
    with pytest.raises(ValueError, match="truncated"):
        decode_ppm(b"P6\n3 2\n255\n" + img.tobytes()[:-1])


def test_ppm_trailing_bytes_never_shift_raster():
    """Surplus bytes AFTER the raster (a transport-appended newline) are
    ignored — they must never cause a whitespace-valued first pixel to be
    eaten (the old skip-surplus-whitespace heuristic did exactly that)."""
    from cqaduplicatefind_spark.functions.imagecodec import decode_ppm

    img = np.array([[32, 1], [2, 3]], dtype=np.uint8)  # 0x20 first pixel
    for header in (b"P5\n2 2\n255\n", b"P5\n2 2\n255\r\n"):
        for tail in (b"", b"\n", b"\n\n junk"):
            out = decode_ppm(header + img.tobytes() + tail)
            assert out[:, :, 0].tolist() == img.tolist(), (header, tail)


def test_ppm_rejects_malformed_headers():
    """Non-positive dimensions and a maxval not followed by whitespace raise
    instead of silently inferring a shape from the payload length."""
    import pytest

    from cqaduplicatefind_spark.functions.imagecodec import decode_ppm

    with pytest.raises(ValueError, match="dimensions"):
        decode_ppm(b"P5\n-1 4\n255\n" + bytes(8))
    with pytest.raises(ValueError, match="dimensions"):
        decode_ppm(b"P6\n0 4\n255\n")
    with pytest.raises(ValueError):
        decode_ppm(b"P5\n2 2\n255")  # header ends at EOF


def test_png_decompression_bomb_rejected():
    """A lying IHDR (huge dims, tiny IDAT) fails cheaply on the declared size;
    an IDAT inflating to MORE than IHDR promises fails on the bounded inflate
    — neither may allocate unbounded memory on untrusted crawl bytes."""
    import struct
    import zlib

    import pytest

    from cqaduplicatefind_spark.functions.imagecodec import (
        PNG_SIGNATURE,
        decode_png,
    )

    def chunk(t, d):
        return (
            struct.pack(">I", len(d)) + t + d
            + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF)
        )

    bomb = (
        PNG_SIGNATURE
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 50000, 50000, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(10**6), 9))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="MAX_DECODED_BYTES"):
        decode_png(bomb)
    oversize = (
        PNG_SIGNATURE
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(1000)))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="larger than IHDR"):
        decode_png(oversize)


def test_png_round_trip_all_color_types():
    from cqaduplicatefind_spark.functions.imagecodec import decode_png, encode_png

    rgb = _rand_img((11, 6, 3), 4)
    assert np.array_equal(decode_png(encode_png(rgb)), rgb)
    rgba = _rand_img((5, 8, 4), 5)
    assert np.array_equal(decode_png(encode_png(rgba)), rgba[:, :, :3])
    gray = _rand_img((6, 6), 6)
    out = decode_png(encode_png(gray))
    assert np.array_equal(out[:, :, 0], gray) and out.shape == (6, 6, 3)


def test_png_all_filter_types_decode():
    """encode_png only emits filter 0; build scanlines with filters 1-4 by
    applying each filter forward to a known image and assert the decoder
    reconstructs it exactly (the RFC 2083 reference semantics)."""
    import struct
    import zlib

    from cqaduplicatefind_spark.functions.imagecodec import (
        PNG_SIGNATURE,
        decode_png,
    )

    img = _rand_img((5, 4, 3), 7)
    h, w, bpp = 5, 4, 3
    stride = w * bpp
    flat = img.reshape(h, stride).astype(np.int32)

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)

    scan = bytearray()
    for y in range(h):
        ftype = y % 5
        scan.append(ftype)
        prev = flat[y - 1] if y > 0 else np.zeros(stride, np.int32)
        for x in range(stride):
            a = int(flat[y, x - bpp]) if x >= bpp else 0
            b = int(prev[x])
            c = int(prev[x - bpp]) if x >= bpp else 0
            pred = {0: 0, 1: a, 2: b, 3: (a + b) >> 1, 4: paeth(a, b, c)}[ftype]
            scan.append((int(flat[y, x]) - pred) & 0xFF)

    def chunk(ctype, data):
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    payload = (
        PNG_SIGNATURE
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(scan)))
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(payload), img)


def test_decode_images_real_codec_strict_no_pillow(spark):
    """decode_images is green in STRICT mode on PNG/PPM payloads without any
    codec library: the pure-stdlib decoder is a real decode, not a stub."""
    from cqaduplicatefind_spark.functions.imagecodec import encode_png, encode_ppm

    img1 = _rand_img((8, 8, 3), 8)
    img2 = _rand_img((16, 4, 3), 9)
    df = spark.createDataFrame(
        [("p1", "image", bytearray(encode_png(img1)), 8, 8, None),
         ("p2", "image", bytearray(encode_ppm(img2)), 4, 16, None)],
        "media_id string, media_type string, payload binary, "
        "width int, height int, duration_ms int",
    )
    rows = {r.media_id: r for r in decode_images(df, strict=True).collect()}
    assert (rows["p1"].height, rows["p1"].width) == (8, 8)
    assert (rows["p2"].height, rows["p2"].width) == (16, 4)
    assert abs(rows["p1"].mean_pixel - float(img1.mean())) < 1e-9
    assert abs(rows["p2"].mean_pixel - float(img2.mean())) < 1e-9


def test_decode_images_jpeg_strict(spark):
    """Baseline JPEG decodes for REAL in strict mode (pure-numpy codec, no
    Pillow): true dimensions come back and the mean pixel sits within the
    lossy-compression tolerance of the source image."""
    from cqaduplicatefind_spark.functions.jpegcodec import encode_jpeg

    yy, xx = np.mgrid[0:24, 0:40]
    img = (
        np.stack([xx * 6, yy * 10, (xx + yy) * 3], axis=2).clip(0, 255)
    ).astype(np.uint8)
    df = spark.createDataFrame(
        [("j444", "image", bytearray(encode_jpeg(img, quality=95)), 40, 24, None),
         ("j420", "image",
          bytearray(encode_jpeg(img, quality=95, subsample=True)), 40, 24, None)],
        "media_id string, media_type string, payload binary, "
        "width int, height int, duration_ms int",
    )
    rows = {r.media_id: r for r in decode_images(df, strict=True).collect()}
    for mid in ("j444", "j420"):
        assert (rows[mid].height, rows[mid].width) == (24, 40)
        assert abs(rows[mid].mean_pixel - float(img.mean())) < 2.0


def test_nonstrict_decode_never_raises_on_variant_or_corrupt_payloads():
    """Non-strict decode must fall back to the stub for payloads whose magic
    bytes match PNG/PPM but whose variant the pure codec does not cover
    (palette PNG, 16-bit PPM) or that are corrupt — one bad byte string in a
    web-scale media batch must not kill the Spark task."""
    from cqaduplicatefind_spark.functions.multimodal import _decode_image_bytes

    payloads = [
        b"\x89PNG\r\n\x1a\ntruncated-garbage",           # corrupt PNG
        b"P6\n2 2\n65535\n" + b"\x00" * 24,              # 16-bit PPM (maxval)
        b"P6\n2 2\n255\n\x00",                           # truncated PPM body
        b"\xff\xd8\xff\xe0 not a real jpeg",             # corrupt JPEG
        b"",                                             # empty
    ]
    for p in payloads:
        img = _decode_image_bytes(p, strict=False)
        assert img.shape == (16, 16, 3) and img.dtype == "uint8", p[:12]
    # determinism of the stub fallback (same payload -> same fake image)
    a = _decode_image_bytes(payloads[0], strict=False)
    b = _decode_image_bytes(payloads[0], strict=False)
    assert (a == b).all()


def test_resize_images_real_ppm_path(spark):
    """Resize over REAL decoded pixels (pure-stdlib PPM codec): exact
    nearest-neighbor parity with a numpy reference, both up and down."""
    from cqaduplicatefind_spark.functions.imagecodec import encode_ppm
    from cqaduplicatefind_spark.functions.multimodal import (
        _resize_nearest,
        resize_images,
    )

    rgb = _rand_img((10, 7, 3), seed=3)
    df = spark.createDataFrame(
        [("m1", bytearray(encode_ppm(rgb)))], "media_id string, payload binary"
    )
    for oh, ow in [(4, 4), (20, 15)]:
        (row,) = resize_images(df, oh, ow, strict=True).collect()
        got = np.frombuffer(bytes(row.resized), dtype=np.uint8).reshape(oh, ow, 3)
        assert (row.height, row.width) == (oh, ow)
        assert np.array_equal(got, _resize_nearest(rgb, oh, ow))


def test_resize_images_identity_and_stub(spark):
    """Same-size resize of a decodable payload is the identity; non-strict
    mode never raises on undecodable bytes and still emits the contract
    shape."""
    from cqaduplicatefind_spark.functions.imagecodec import encode_ppm
    from cqaduplicatefind_spark.functions.multimodal import resize_images

    rgb = _rand_img((6, 5, 3), seed=9)
    df = spark.createDataFrame(
        [("ok", bytearray(encode_ppm(rgb))), ("junk", bytearray(b"\x00\x01"))],
        "media_id string, payload binary",
    )
    rows = {r.media_id: r for r in resize_images(df, 6, 5).collect()}
    got = np.frombuffer(bytes(rows["ok"].resized), dtype=np.uint8).reshape(6, 5, 3)
    assert np.array_equal(got, rgb)
    assert len(bytes(rows["junk"].resized)) == 6 * 5 * 3  # stub is (16,16,3)
