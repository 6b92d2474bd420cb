"""Multimodal columns: images/audio/video as opaque ``binary`` payloads with typed
metadata, processed by Arrow-batched UDFs.

The Spark-side plumbing here is real and tested — schemas, ``mapInPandas`` batch
shapes, partitioning behavior, deterministic feature extraction over raw bytes.
Image decode is REAL for PPM/PGM, non-interlaced 8-bit PNG, and baseline JPEG via
the pure-numpy codecs (``imagecodec.py`` / ``jpegcodec.py``); variants outside
their scope (progressive JPEG, palette PNG, ...) try Pillow and otherwise fall
back to a clearly-marked deterministic fake (or raise ``NotImplementedError``
when ``strict=True``). Audio decode is REAL for RIFF PCM/float WAV
(``audio.py``: features + robust spectral fingerprints; compressed formats fall
back the same way). Video frame extraction is REAL for MJPEG-in-AVI
(``videocodec.py``: container parse + per-frame JPEG decode + aHash-majority
fingerprints); inter-frame-coded containers (H.264/VP9 in MP4/WebM) genuinely
need ffmpeg and keep the stub fallback. Swapping real libraries in is confined
to ``_decode_image_bytes`` / ``_decode_audio_bytes`` / ``_sample_frames_bytes``.

At cluster scale these stages are narrow maps over the payload column — zero
shuffle; Arrow moves the bytes to Python once per batch.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

MEDIA_SCHEMA = (
    "media_id string, media_type string, payload binary, "
    "width int, height int, duration_ms int"
)

FEATURE_DIM = 64


def _stub_image(payload: bytes) -> np.ndarray:
    """STUB: deterministic pseudo-image seeded by payload bytes (NOT a decode)."""
    h = w = 16
    seed = np.frombuffer(payload[:8].ljust(8, b"\0"), dtype=np.uint64)[0]
    rng = np.random.Generator(np.random.PCG64(int(seed)))
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def _decode_image_bytes(payload: bytes, strict: bool = False) -> np.ndarray:
    """bytes -> (H, W, 3) uint8. PPM/PGM, non-interlaced 8-bit PNG, and baseline
    JPEG decode for REAL via the pure-numpy codecs (``functions/imagecodec.py``,
    ``functions/jpegcodec.py``); variants the pure codecs do not cover
    (progressive JPEG, palette/16-bit/interlaced PNG, corrupt payloads) try
    Pillow and otherwise fall back to a deterministic fake derived from the
    payload bytes (NOT a real decode — marked stub). Non-strict mode NEVER
    raises — a web-scale media batch always contains payloads no decoder
    accepts, and one bad byte string must not kill the Spark task."""
    from cqaduplicatefind_spark.functions.imagecodec import decode_image

    try:
        img = decode_image(payload)  # real decode: PNG / PPM / PGM
    except Exception:
        # magic bytes matched but the variant is out of the pure codec's scope
        # (palette PNG, 16-bit PPM, interlaced) or the payload is corrupt:
        # treat exactly like any other undecodable format below
        img = None
    if img is not None:
        return img
    try:  # pragma: no cover - library absent in this container
        import io

        from PIL import Image  # type: ignore
    except ImportError:
        if strict:
            raise NotImplementedError(
                "image decode beyond the pure PNG/PPM/baseline-JPEG codecs "
                "requires Pillow; container has no codec libraries"
            )
        return _stub_image(payload)
    try:  # pragma: no cover - library absent in this container
        return np.asarray(Image.open(io.BytesIO(payload)).convert("RGB"))
    except Exception:
        if strict:
            raise
        return _stub_image(payload)


def _sample_frames_bytes(payload: bytes, n_frames: int, strict: bool = False):
    """bytes -> evenly-spaced frame payloads. REAL for MJPEG-in-AVI
    (``videocodec.py``): each returned frame is that frame's complete baseline
    JPEG, decodable downstream by ``decode_images`` / ``_decode_image_bytes``
    (magic-byte dispatch) — only the sampled frames' chunks are sliced, never
    the whole clip decoded. Other containers (H.264/VP9 in MP4/WebM) need
    ffmpeg: strict raises, non-strict falls back to deterministic byte-window
    'frames' (clearly NOT a decode). A malformed AVI gets the same fallback —
    one corrupt clip must not kill the batch."""
    from cqaduplicatefind_spark.functions import videocodec

    if videocodec.is_avi(payload):
        try:
            return [
                jpeg
                for _, jpeg in videocodec.sample_frame_payloads(payload, n_frames)
            ]
        except ValueError:
            if strict:
                raise
    if strict:
        raise NotImplementedError(
            "video decode beyond MJPEG-in-AVI requires ffmpeg; not in container"
        )
    if not payload or n_frames <= 0:
        return []
    step = max(1, len(payload) // n_frames)
    return [payload[i * step : i * step + step] for i in range(n_frames)]


def byte_features(payload: bytes) -> np.ndarray:
    """Deterministic FEATURE_DIM-dim feature from raw bytes (histogram + moments).
    Real plumbing (this is what an embedding model call would replace): computed
    fully vectorized per batch below."""
    if not payload:
        return np.zeros(FEATURE_DIM, dtype=np.float32)
    arr = np.frombuffer(payload, dtype=np.uint8)
    hist = np.bincount(arr >> 2, minlength=64).astype(np.float64)
    feats = hist / max(1, len(arr))
    return feats.astype(np.float32)


def with_media_features(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """media -> media + features array<float> (+ payload_sha for exact dedup)."""

    def compute(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [
                byte_features(bytes(p) if p is not None else b"")
                for p in pdf[payload_col]
            ]
            out = pdf.drop(columns=[payload_col]).copy()
            out["features"] = [f.tolist() for f in feats]
            yield out

    in_fields = [f for f in df.schema.fields if f.name != payload_col]
    out_schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in in_fields]
        + ["features array<float>"]
    )
    result = df.mapInPandas(compute, out_schema)
    return result


def media_exact_dedup(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Exact media dedup by payload hash — JVM-side sha2 over binary, groupBy."""
    return (
        df.groupBy(F.sha2(F.col(payload_col), 256).alias("payload_sha"))
        .agg(F.count("*").alias("dup_count"), F.min("media_id").alias("canonical"))
        .where(F.col("dup_count") > 1)
    )


def decode_images(df: DataFrame, payload_col: str = "payload",
                  strict: bool = False) -> DataFrame:
    """media -> (media_id, height, width, mean_pixel): exercises the decode path
    batch shape; the decode itself is stubbed (see module docstring)."""

    def compute(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            hs, ws, means = [], [], []
            for p in pdf[payload_col]:
                img = _decode_image_bytes(bytes(p) if p is not None else b"", strict)
                hs.append(img.shape[0])
                ws.append(img.shape[1])
                means.append(float(img.mean()))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "height": pd.Series(hs, dtype="int32"),
                    "width": pd.Series(ws, dtype="int32"),
                    "mean_pixel": means,
                }
            )

    return df.select("media_id", payload_col).mapInPandas(
        compute, "media_id string, height int, width int, mean_pixel double"
    )


def sample_video_frames(df: DataFrame, n_frames: int = 4,
                        payload_col: str = "payload",
                        strict: bool = False) -> DataFrame:
    """media(video) -> one row per sampled frame (media_id, frame_idx, frame binary).
    REAL for MJPEG-in-AVI: each frame is a complete baseline JPEG, so the
    output composes directly with ``decode_images`` / ``resize_images`` /
    ``media_exact_dedup`` over the frame column; other containers fall back to
    byte-windowing (see ``_sample_frames_bytes``). ``frame_idx`` numbers the
    emitted frames 0..k-1 in clip order."""

    def compute(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, frames = [], [], []
            for mid, p in zip(pdf["media_id"], pdf[payload_col]):
                for i, fr in enumerate(
                    _sample_frames_bytes(
                        bytes(p) if p is not None else b"", n_frames, strict
                    )
                ):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(fr)
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": pd.Series(idxs, dtype="int32"),
                 "frame": frames}
            )

    return df.select("media_id", payload_col).mapInPandas(
        compute, "media_id string, frame_idx int, frame binary"
    )


def _decode_audio_bytes(
    payload: bytes, strict: bool = False
) -> tuple[np.ndarray, int] | None:
    """bytes -> (mono float64 samples, rate) via the pure WAV codec, or None
    for undecodable payloads in non-strict mode (compressed formats need
    external codecs, same fallback contract as images)."""
    from cqaduplicatefind_spark.functions.audio import decode_wav

    try:
        return decode_wav(payload)
    except ValueError:
        if strict:
            raise NotImplementedError(
                "audio decode beyond RIFF PCM/float WAV requires an external "
                "codec; container has no codec libraries"
            )
        return None


def decode_audio(df: DataFrame, payload_col: str = "payload",
                 strict: bool = False,
                 with_fingerprint: bool = False) -> DataFrame:
    """media -> (media_id, sample_rate, duration_ms, rms, zcr, centroid_hz
    [, fp]): REAL WAV decode + deterministic spectral features
    (``functions/audio.py``). Undecodable payloads yield a null-feature row in
    non-strict mode (the row survives — one compressed clip must not kill the
    batch). ``with_fingerprint=True`` also emits the 64-bit robust fingerprint
    from the SAME decode — callers wanting both features and fingerprints
    should use this instead of a second ``audio_fingerprints`` pass, which
    would re-decode and re-FFT every payload. One narrow Arrow-batched map,
    zero shuffle. ``duration_ms`` is bigint: a decodable low-rate clip can
    exceed int32 milliseconds."""
    from cqaduplicatefind_spark.functions.audio import (
        MIN_FINGERPRINT_RATE,
        analyze_audio,
    )

    def compute(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf[payload_col]):
                dec = _decode_audio_bytes(bytes(p) if p is not None else b"", strict)
                if dec is None:
                    rows.append((mid, None, None, None, None, None, None))
                    continue
                samples, rate = dec
                if with_fingerprint and strict and rate < MIN_FINGERPRINT_RATE:
                    # same contract as audio_fingerprints(strict=True): strict
                    # mode surfaces every non-real result instead of silently
                    # degrading fp to null
                    raise ValueError(
                        f"sample rate {rate} too low for spectral fingerprint "
                        f"(< MIN_FINGERPRINT_RATE={MIN_FINGERPRINT_RATE})"
                    )
                f = analyze_audio(samples, rate, with_fingerprint=with_fingerprint)
                rows.append((mid, rate, f["duration_ms"], f["rms"],
                             f["zcr"], f["centroid_hz"], f["fp"]))
            pdf_out = pd.DataFrame(
                rows,
                columns=["media_id", "sample_rate", "duration_ms", "rms",
                         "zcr", "centroid_hz", "fp"],
            )
            if not with_fingerprint:
                pdf_out = pdf_out.drop(columns=["fp"])
            yield pdf_out

    schema = (
        "media_id string, sample_rate int, duration_ms long, rms double, "
        "zcr double, centroid_hz double"
    )
    if with_fingerprint:
        schema += ", fp long"
    return df.select("media_id", payload_col).mapInPandas(compute, schema)


def audio_fingerprints(df: DataFrame, payload_col: str = "payload",
                       strict: bool = False) -> DataFrame:
    """media -> (media_id, fp bigint): 64-bit robust spectral fingerprint
    (``audio.audio_simhash``). Near-dup pairing reuses the engine's SimHash
    Hamming kernel — ``bit_count(fp_a ^ fp_b)`` in whole-stage codegen —
    so audio dedup rides the same bucketed candidate machinery as text.
    Payloads that are undecodable or below ``MIN_FINGERPRINT_RATE`` are
    dropped in non-strict mode (no meaningful fingerprint to assign; keeping
    them would false-pair all low-rate clips at distance 0); exact byte dedup
    still covers them via ``media_exact_dedup``. Callers that also need the
    features should use ``decode_audio(..., with_fingerprint=True)`` to pay
    the decode + FFT once."""
    from cqaduplicatefind_spark.functions.audio import audio_simhash

    def compute(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, fps = [], []
            for mid, p in zip(pdf["media_id"], pdf[payload_col]):
                dec = _decode_audio_bytes(bytes(p) if p is not None else b"", strict)
                if dec is None:
                    continue
                try:
                    fp = audio_simhash(*dec)
                except ValueError:
                    if strict:
                        raise
                    continue
                ids.append(mid)
                fps.append(fp)
            yield pd.DataFrame({"media_id": ids,
                                "fp": pd.Series(fps, dtype="int64")})

    return df.select("media_id", payload_col).mapInPandas(
        compute, "media_id string, fp long"
    )


def video_fingerprints(df: DataFrame, n_frames: int = 8,
                       payload_col: str = "payload",
                       strict: bool = False) -> DataFrame:
    """media(video) -> (media_id, fp bigint): 64-bit doc-level fingerprint —
    majority vote over sampled frames' perceptual aHashes
    (``videocodec.video_simhash``). REAL for MJPEG-in-AVI; near-dup pairing
    reuses the engine's ``bit_count(fp_a ^ fp_b)`` Hamming kernel, exactly
    like text SimHash and ``audio_fingerprints``. Undecodable payloads
    (non-AVI containers, malformed streams, frameless clips) are dropped in
    non-strict mode — a byte-window hash would false-pair unrelated clips;
    exact byte dedup still covers them via ``media_exact_dedup``."""
    from cqaduplicatefind_spark.functions.videocodec import video_simhash

    def compute(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, fps = [], []
            for mid, p in zip(pdf["media_id"], pdf[payload_col]):
                try:
                    fp = video_simhash(
                        bytes(p) if p is not None else b"", n_frames
                    )
                except ValueError:
                    if strict:
                        raise
                    continue
                ids.append(mid)
                fps.append(fp)
            yield pd.DataFrame({"media_id": ids,
                                "fp": pd.Series(fps, dtype="int64")})

    return df.select("media_id", payload_col).mapInPandas(
        compute, "media_id string, fp long"
    )


def _resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Deterministic nearest-neighbor resample (pure numpy index gather —
    center-of-cell sampling, the classic box-center convention)."""
    h, w = img.shape[0], img.shape[1]
    rows = np.minimum(((np.arange(out_h) + 0.5) * h / out_h).astype(np.int64), h - 1)
    cols = np.minimum(((np.arange(out_w) + 0.5) * w / out_w).astype(np.int64), w - 1)
    return img[rows][:, cols]


def resize_images(df: DataFrame, out_h: int = 64, out_w: int = 64,
                  payload_col: str = "payload", strict: bool = False) -> DataFrame:
    """media -> (media_id, height, width, resized): decode (real for PPM/PNG,
    stubbed otherwise — module docstring), nearest-neighbor resize to
    (out_h, out_w), re-emit as raw uint8 bytes (row-major, channels-last).
    The Arrow batch shape, schema, and resample math are real; only exotic
    codecs are stubbed. One narrow mapInPandas — no shuffle, scales as a
    projection."""
    if out_h < 1 or out_w < 1:
        raise ValueError("resize_images: output dims must be >= 1")

    def compute(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            outs = []
            for p in pdf[payload_col]:
                img = _decode_image_bytes(bytes(p) if p is not None else b"", strict)
                outs.append(
                    np.ascontiguousarray(
                        _resize_nearest(img, out_h, out_w)
                    ).astype(np.uint8, copy=False).tobytes()
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "height": pd.Series([out_h] * len(pdf), dtype="int32"),
                    "width": pd.Series([out_w] * len(pdf), dtype="int32"),
                    "resized": outs,
                }
            )

    return df.select("media_id", payload_col).mapInPandas(
        compute, "media_id string, height int, width int, resized binary"
    )
