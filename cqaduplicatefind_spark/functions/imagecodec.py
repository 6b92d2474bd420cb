"""Pure-stdlib baseline image codec: PPM/PGM (binary) and non-interlaced 8-bit
PNG, decoded with ``zlib`` + numpy only — no Pillow/libjpeg in this container.

This turns the multimodal decode path from an honest stub into tested code for
the formats a container with zero codec libraries CAN decode from first
principles; baseline JPEG lives in ``jpegcodec.py`` and is dispatched from
``decode_image`` below. Video remains library-gated in ``multimodal.py``
(strict mode raises); the reference has no image handling at all — this
capability belongs to the LLM-data-pipeline surface, not reference parity.

A minimal encoder for each format lives here too, so tests round-trip real
arrays through real bytes instead of trusting fixtures.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

# Upper bound on h*(stride+1) a PNG may claim before decode refuses — untrusted
# crawl bytes must not be able to OOM an executor with a lying IHDR (the
# allocation happens BEFORE any pixel is checked). 256 MiB ≈ a 9000x9000 RGB.
MAX_DECODED_BYTES = 256 * 1024 * 1024


# --------------------------------------------------------------------------
# PPM / PGM (netpbm binary): the simplest real raster format
# --------------------------------------------------------------------------

def decode_ppm(payload: bytes) -> np.ndarray:
    """P6 (RGB) / P5 (gray) binary netpbm -> (H, W, 3) uint8."""
    if payload[:2] not in (b"P6", b"P5"):
        raise ValueError("not a binary netpbm payload")
    # header = magic, width, height, maxval as whitespace-separated tokens,
    # with '#' comments; pixel data starts after the single whitespace byte
    # that follows maxval
    tokens: list[int] = []
    i = 2
    while len(tokens) < 3:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":
            while i < len(payload) and payload[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        tokens.append(int(payload[i:j]))
        i = j
    sep = payload[i : i + 1]
    if not sep.isspace():
        raise ValueError("netpbm maxval not followed by whitespace")
    i += 1  # exactly ONE whitespace byte after maxval (netpbm spec) — except
    # that a Windows-style writer's '\r\n' counts as ONE line ending; any
    # other whitespace-valued byte is pixel data (9/10/13/32 are all legal
    # pixel values, so a skip-surplus-whitespace heuristic would corrupt a
    # raster whose first pixel is whitespace-valued when trailing bytes follow)
    if sep == b"\r" and payload[i : i + 1] == b"\n":
        i += 1
    w, h, maxval = tokens
    if w <= 0 or h <= 0:
        raise ValueError(f"invalid netpbm dimensions {w}x{h}")
    if maxval != 255:
        raise ValueError(f"only maxval=255 supported, got {maxval}")
    channels = 3 if payload[:2] == b"P6" else 1
    n = w * h * channels
    if len(payload) - i < n:
        raise ValueError("truncated netpbm payload")
    arr = np.frombuffer(payload, dtype=np.uint8, count=n, offset=i).reshape(
        h, w, channels
    )
    return np.repeat(arr, 3, axis=2) if channels == 1 else arr.copy()


def encode_ppm(img: np.ndarray) -> bytes:
    """(H, W, 3) or (H, W) uint8 -> P6/P5 bytes."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        magic = b"P5"
    elif img.ndim == 3 and img.shape[2] == 3:
        magic = b"P6"
    else:
        raise ValueError("expected (H, W) or (H, W, 3)")
    h, w = img.shape[:2]
    return magic + f"\n{w} {h}\n255\n".encode() + img.tobytes()


# --------------------------------------------------------------------------
# PNG: zlib-compressed scanlines with per-row filters (RFC 2083)
# --------------------------------------------------------------------------

_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # color_type -> samples per pixel


def _iter_chunks(payload: bytes):
    i = len(PNG_SIGNATURE)
    while i + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[i : i + 4])
        ctype = payload[i + 4 : i + 8]
        data = payload[i + 8 : i + 8 + length]
        yield ctype, data
        i += 12 + length  # length + type + data + crc
        if ctype == b"IEND":
            return


def _unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Undo per-row PNG filters. Rows are sequential (each may reference the
    prior reconstructed row); within a row Sub/Average/Paeth are sequential in
    the pixel dimension — fine for the bounded images this baseline targets."""
    out = np.zeros((h, stride), dtype=np.uint8)
    rows = raw.reshape(h, stride + 1)
    for y in range(h):
        ftype = int(rows[y, 0])
        cur = rows[y, 1:].astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y > 0 else np.zeros(stride, np.int32)
        if ftype == 0:  # None
            rec = cur
        elif ftype == 2:  # Up
            rec = (cur + prev) & 0xFF
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth: sequential in x
            rec = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                a = rec[x - bpp] if x >= bpp else 0
                b = prev[x]
                if ftype == 1:
                    pred = a
                elif ftype == 3:
                    pred = (a + b) >> 1
                else:
                    c = prev[x - bpp] if x >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                rec[x] = (cur[x] + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[y] = rec.astype(np.uint8)
    return out


def decode_png(payload: bytes) -> np.ndarray:
    """Non-interlaced 8-bit PNG (gray / gray+alpha / RGB / RGBA) -> (H, W, 3)
    uint8. Alpha is dropped; gray is replicated to 3 channels."""
    if payload[: len(PNG_SIGNATURE)] != PNG_SIGNATURE:
        raise ValueError("not a PNG payload")
    w = h = None
    channels = 0
    idat = bytearray()
    for ctype, data in _iter_chunks(payload):
        if ctype == b"IHDR":
            w, h, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8:
                raise ValueError(f"only bit depth 8 supported, got {depth}")
            if interlace != 0:
                raise ValueError("interlaced PNG not supported")
            if color not in _PNG_CHANNELS:
                raise ValueError(f"unsupported color type {color}")
            channels = _PNG_CHANNELS[color]
        elif ctype == b"IDAT":
            idat.extend(data)
    if w is None:
        raise ValueError("PNG missing IHDR")
    if w <= 0 or h <= 0:
        raise ValueError(f"invalid PNG dimensions {w}x{h}")
    stride = w * channels
    expected = h * (stride + 1)
    if expected > MAX_DECODED_BYTES:
        raise ValueError(
            f"PNG header claims {expected} decoded bytes "
            f"(> MAX_DECODED_BYTES={MAX_DECODED_BYTES})"
        )
    # bound the inflate to the size IHDR promises: a decompression bomb (tiny
    # IDAT, huge expansion) must fail cheaply, not OOM the executor —
    # plain zlib.decompress() has no output cap
    dobj = zlib.decompressobj()
    data = dobj.decompress(bytes(idat), expected)
    if dobj.unconsumed_tail or dobj.decompress(b"", 1):
        raise ValueError("PNG scanline data larger than IHDR promises")
    raw = np.frombuffer(data, dtype=np.uint8)
    if raw.size != expected:
        raise ValueError("PNG scanline data has unexpected size")
    img = _unfilter(raw, h, stride, channels).reshape(h, w, channels)
    if channels == 1:
        return np.repeat(img, 3, axis=2)
    if channels == 2:  # gray + alpha
        return np.repeat(img[:, :, :1], 3, axis=2)
    return img[:, :, :3].copy()


def encode_png(img: np.ndarray) -> bytes:
    """(H, W, 3) / (H, W, 4) / (H, W) uint8 -> PNG bytes (filter 0 rows)."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        color, channels = 0, 1
        flat = img[:, :, None]
    elif img.ndim == 3 and img.shape[2] == 3:
        color, channels, flat = 2, 3, img
    elif img.ndim == 3 and img.shape[2] == 4:
        color, channels, flat = 6, 4, img
    else:
        raise ValueError("expected (H, W), (H, W, 3) or (H, W, 4)")
    h, w = img.shape[:2]
    scanlines = bytearray()
    for y in range(h):
        scanlines.append(0)  # filter type None
        scanlines.extend(flat[y].tobytes())

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        PNG_SIGNATURE
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(scanlines), 6))
        + chunk(b"IEND", b"")
    )


def decode_image(payload: bytes) -> np.ndarray | None:
    """Dispatch on magic bytes; None if the format needs an external codec."""
    if payload[: len(PNG_SIGNATURE)] == PNG_SIGNATURE:
        return decode_png(payload)
    if payload[:2] in (b"P6", b"P5"):
        return decode_ppm(payload)
    if payload[:2] == b"\xff\xd8":
        from cqaduplicatefind_spark.functions.jpegcodec import decode_jpeg

        return decode_jpeg(payload)
    return None
