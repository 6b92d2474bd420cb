"""Baseline JPEG codec: round-trips through real marker/Huffman/DCT bytes,
spec-structural invariants that catch constant typos a self-consistent
encode/decode pair alone cannot, and adversarial-header rejection.

No Spark session needed — pure numpy; the Spark-side path is covered by
``test_multimodal.py`` (strict decode_images over JPEG payloads).
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from cqaduplicatefind_spark.functions.jpegcodec import (
    AC_CHROMA_BITS,
    AC_CHROMA_VALS,
    AC_LUMA_BITS,
    AC_LUMA_VALS,
    DC_CHROMA_BITS,
    DC_CHROMA_VALS,
    DC_LUMA_BITS,
    DC_LUMA_VALS,
    DCT_BASIS,
    MAX_PIXELS,
    ZIGZAG,
    _canonical_codes,
    decode_jpeg,
    encode_jpeg,
)


def _smooth_rgb(h: int, w: int) -> np.ndarray:
    """Low-frequency test image: quantization error stays near the table step."""
    yy, xx = np.mgrid[0:h, 0:w]
    return (
        np.stack(
            [
                xx * 255.0 / max(1, w - 1),
                yy * 255.0 / max(1, h - 1),
                128 + 100 * np.sin(xx / 9.0) * np.cos(yy / 7.0),
            ],
            axis=2,
        )
        .clip(0, 255)
        .astype(np.uint8)
    )


# --------------------------------------------------------------------------
# Spec-structural invariants (catch typos in the Annex K constants that a
# self-consistent encoder/decoder pair would round-trip right through)
# --------------------------------------------------------------------------

def test_zigzag_matches_spec_landmarks():
    """First diagonals and the corners of the canonical zigzag scan."""
    assert ZIGZAG[:10].tolist() == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]
    assert ZIGZAG[63] == 63
    assert sorted(ZIGZAG.tolist()) == list(range(64))  # a permutation


def test_dct_basis_orthonormal_and_dc_scaling():
    assert np.allclose(DCT_BASIS @ DCT_BASIS.T, np.eye(8), atol=1e-12)
    # FDCT of a constant block has only the DC term, valued 8*c
    blk = np.full((8, 8), 3.0)
    coef = DCT_BASIS @ blk @ DCT_BASIS.T
    assert abs(coef[0, 0] - 24.0) < 1e-9
    assert np.abs(coef).sum() - abs(coef[0, 0]) < 1e-9


def test_huffman_tables_complete_and_prefix_free():
    """The Annex K AC alphabets must be exactly {(run,size): size 1..10} plus
    EOB and ZRL — 162 symbols; DC alphabets exactly categories 0..11. The
    canonical construction must never overflow a code length (prefix-freeness
    is implied by construction + no-overflow)."""
    expected_ac = {(r << 4) | s for r in range(16) for s in range(1, 11)}
    expected_ac |= {0x00, 0xF0}
    for bits, vals in [(AC_LUMA_BITS, AC_LUMA_VALS), (AC_CHROMA_BITS, AC_CHROMA_VALS)]:
        assert sum(bits) == len(vals) == 162
        assert set(vals) == expected_ac
        codes = _canonical_codes(bits, vals)  # raises on overflow
        assert len(codes) == 162
    for bits, vals in [(DC_LUMA_BITS, DC_LUMA_VALS), (DC_CHROMA_BITS, DC_CHROMA_VALS)]:
        assert sum(bits) == len(vals) == 12
        assert vals == list(range(12))
        assert len(_canonical_codes(bits, vals)) == 12


# --------------------------------------------------------------------------
# Round trips
# --------------------------------------------------------------------------

def test_round_trip_444_high_quality():
    img = _smooth_rgb(48, 64)
    dec = decode_jpeg(encode_jpeg(img, quality=97))
    assert dec.shape == (48, 64, 3) and dec.dtype == np.uint8
    err = np.abs(dec.astype(int) - img.astype(int))
    assert err.max() <= 8 and err.mean() < 1.5


def test_round_trip_420_subsampled():
    """4:2:0 halves the chroma planes; on chroma-smooth content the error
    stays near the 4:4:4 bound, and the decoder's upsample restores shape."""
    img = _smooth_rgb(40, 56)
    dec = decode_jpeg(encode_jpeg(img, quality=97, subsample=True))
    assert dec.shape == (40, 56, 3)
    err = np.abs(dec.astype(int) - img.astype(int))
    assert err.max() <= 20 and err.mean() < 4.0


def test_round_trip_gray_single_component():
    g = (np.mgrid[0:16, 0:24][1] * 255 / 23).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(g, quality=95))
    assert dec.shape == (16, 24, 3)
    assert (dec[:, :, 0] == dec[:, :, 1]).all() and (dec[:, :, 1] == dec[:, :, 2]).all()
    assert np.abs(dec[:, :, 0].astype(int) - g.astype(int)).max() <= 3


@pytest.mark.parametrize("h,w", [(19, 13), (1, 1), (7, 23), (17, 32)])
@pytest.mark.parametrize("subsample", [False, True])
def test_round_trip_odd_dimensions(h, w, subsample):
    """Dims not multiples of the MCU size exercise edge padding on encode and
    cropping on decode — the output shape must be exact either way."""
    rng = np.random.Generator(np.random.PCG64(h * 100 + w))
    img = (rng.integers(0, 256, size=(h, w, 3)).astype(float) * 0.2 + 110).astype(
        np.uint8
    )
    dec = decode_jpeg(encode_jpeg(img, quality=97, subsample=subsample))
    assert dec.shape == (h, w, 3)
    tol = 50 if subsample else 12  # 4:2:0 chroma box-averaging is lossy on noise
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= tol


def test_restart_markers_decode_identically():
    """DRI/RSTn segmentation must reproduce the no-restart decode bit for bit:
    restarts change entropy framing, not pixels."""
    img = _smooth_rgb(32, 48)
    base = decode_jpeg(encode_jpeg(img, quality=90))
    for dri in (1, 2, 5):
        for sub in (False, True):
            withr = decode_jpeg(
                encode_jpeg(img, quality=90, subsample=sub, restart_interval=dri)
            )
            plain = decode_jpeg(encode_jpeg(img, quality=90, subsample=sub))
            assert np.array_equal(withr, plain), (dri, sub)
    assert np.abs(base.astype(int) - img.astype(int)).max() <= 12


def test_byte_stuffing_exercised():
    """A busy image at moderate quality produces 0xFF entropy bytes; the
    encoder must stuff them (FF 00) and the decoder must unstuff — verified by
    the round trip AND by the stuffed sequence actually appearing."""
    rng = np.random.Generator(np.random.PCG64(42))
    img = rng.integers(0, 256, size=(64, 64, 3), dtype=np.uint8)
    enc = encode_jpeg(img, quality=85)
    assert b"\xff\x00" in enc  # stuffing actually happened
    dec = decode_jpeg(enc)
    assert dec.shape == (64, 64, 3)  # and survived the trip


# --------------------------------------------------------------------------
# Adversarial / out-of-scope payloads (crawl bytes are untrusted)
# --------------------------------------------------------------------------

def test_truncated_payloads_raise():
    enc = encode_jpeg(_smooth_rgb(16, 16), quality=90)
    for cut in (4, len(enc) // 2, len(enc) - 6):
        with pytest.raises(ValueError):
            decode_jpeg(enc[:cut])


def test_pixel_bomb_rejected_before_allocation():
    """A lying SOF (60000x60000) must fail on MAX_PIXELS, not allocate 10 GB."""
    enc = bytearray(encode_jpeg(_smooth_rgb(16, 16), quality=90))
    i = enc.index(b"\xff\xc0")
    struct.pack_into(">HH", enc, i + 5, 60000, 60000)
    with pytest.raises(ValueError, match="MAX_PIXELS"):
        decode_jpeg(bytes(enc))
    assert 60000 * 60000 > MAX_PIXELS


def test_progressive_and_foreign_payloads_rejected():
    enc = bytearray(encode_jpeg(_smooth_rgb(16, 16), quality=90))
    i = enc.index(b"\xff\xc0")
    enc[i + 1] = 0xC2
    with pytest.raises(ValueError, match="progressive"):
        decode_jpeg(bytes(enc))
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"not a jpeg at all")


def test_grayscale_sampling_factors_decode_raster_order():
    """T.81 A.2.2: a single-component scan is non-interleaved — data units in
    raster order, regardless of declared sampling factors. Encoders often keep
    the 2x2 luma factors when dropping chroma; those files must decode to the
    SAME pixels as a 1x1 declaration, not block-scrambled."""
    g = (np.mgrid[0:24, 0:40][0] * 9 + np.mgrid[0:24, 0:40][1] * 3).astype(np.uint8)
    enc = bytearray(encode_jpeg(g, quality=95))
    base = decode_jpeg(bytes(enc))
    i = enc.index(b"\xff\xc0")
    assert enc[i + 11] == 0x11  # sanity: encoder wrote 1x1 factors
    enc[i + 11] = 0x22  # declare 2x2 — stream stays raster-ordered
    assert np.array_equal(decode_jpeg(bytes(enc)), base)


def test_lying_segment_lengths_raise_valueerror():
    """Truncated SOF/DRI/SOS bodies must raise ValueError (the documented
    fallback contract), never struct.error/IndexError."""
    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    with pytest.raises(ValueError, match="truncated SOF"):
        decode_jpeg(b"\xff\xd8" + seg(0xC0, b"\x08\x00"))
    with pytest.raises(ValueError, match="truncated DRI"):
        decode_jpeg(b"\xff\xd8" + seg(0xDD, b"\x01"))
    enc = encode_jpeg(_smooth_rgb(8, 8), quality=90)
    i = enc.index(b"\xff\xda")
    with pytest.raises(ValueError, match="truncated SOS"):
        decode_jpeg(enc[:i] + seg(0xDA, b""))
    with pytest.raises(ValueError, match="truncated DHT"):
        decode_jpeg(b"\xff\xd8" + seg(0xC4, b"\x00" + b"\x01" * 16))


def test_decode_image_dispatches_on_jpeg_magic():
    from cqaduplicatefind_spark.functions.imagecodec import decode_image

    img = _smooth_rgb(8, 8)
    out = decode_image(encode_jpeg(img, quality=97))
    assert out is not None and out.shape == (8, 8, 3)
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 8
