"""Multimodal columns: image/audio/video as opaque binary columns with
typed metadata, processed via Arrow-batched mapInPandas.

Codec status (this container has no image/video libraries — the line
between real and stubbed is explicit):

- REAL, dependency-free decoders: uncompressed 24-bit BMP and binary PPM
  (P6) images (numpy slicing of the documented byte layouts), and PCM WAV
  audio (stdlib ``wave``).  These are genuine decoders with golden tests —
  encode-with-numpy → decode → pixel/sample identity.
- STUBBED: compressed formats (JPEG/PNG/MP4...) raise NotImplementedError
  unless ``fake=True``, which substitutes a deterministic content-seeded
  decoder so the Spark plumbing (batching, pooling, frame sampling) is
  exercised end-to-end; swap in a real codec library on a cluster image
  and nothing else changes.

Schema convention:

    media(doc_id long, kind string, payload binary,
          meta struct<mime:string, width:int, height:int, duration_ms:int>)
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id long, kind string, payload binary, "
    "meta struct<mime:string, width:int, height:int, duration_ms:int>"
)

FEATURE_SCHEMA = "doc_id long, kind string, feature array<float>, n_bytes int"


def _decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24-bit BMP (BITMAPINFOHEADER) → HxWx3 uint8 (RGB).

    Rows are stored bottom-up, BGR, padded to 4-byte multiples — the
    standard layout; pure struct+numpy."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    w, h = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    comp = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or comp != 0:
        raise NotImplementedError("only uncompressed 24-bit BMP supported")
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=stride * abs(h), offset=data_off
    ).reshape(abs(h), stride)[:, : w * 3].reshape(abs(h), w, 3)
    if h > 0:  # bottom-up
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR → RGB


def _decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6, maxval ≤ 255) → HxWx3 uint8."""
    parts = []
    pos = 0
    while len(parts) < 4:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to EOL
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        parts.append(payload[start:pos])
    pos += 1  # single whitespace after maxval
    magic, w, h, maxval = parts[0], int(parts[1]), int(parts[2]), int(parts[3])
    if magic != b"P6" or maxval > 255:
        raise NotImplementedError("only 8-bit binary PPM (P6) supported")
    return (
        np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=pos)
        .reshape(h, w, 3)
        .copy()
    )


def decode_image(payload: bytes, fake: bool = False) -> np.ndarray:
    """Decode an image payload to HxWx3 uint8 (RGB).

    REAL decoders for BMP (24-bit uncompressed) and PPM (P6) — formats
    fully decodable without external libraries.  Compressed formats need a
    codec library not present in this container: NotImplementedError
    unless ``fake=True``, which returns a deterministic 8x8x3 array seeded
    by the payload's md5 (stable across runs/executors) so the surrounding
    Spark plumbing is testable.
    """
    if payload[:2] == b"BM":
        return _decode_bmp(bytes(payload))
    if payload[:2] == b"P6":
        return _decode_ppm(bytes(payload))
    if not fake:
        raise NotImplementedError(
            "compressed image decoding requires a codec library; "
            "BMP/PPM decode natively, or run with fake=True"
        )
    seed = int.from_bytes(hashlib.md5(payload).digest()[:8], "big")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)


def decode_audio(payload: bytes) -> tuple[np.ndarray, int]:
    """PCM WAV → (samples float32 in [-1, 1] shaped (n, channels),
    sample_rate).  Stdlib ``wave`` — a real decoder, no dependencies."""
    with wave.open(io.BytesIO(bytes(payload)), "rb") as wf:
        n, ch, width = wf.getnframes(), wf.getnchannels(), wf.getsampwidth()
        rate = wf.getframerate()
        raw = wf.readframes(n)
    if width == 2:
        samples = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif width == 1:  # unsigned 8-bit PCM
        samples = (
            np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0
        ) / 128.0
    else:
        raise NotImplementedError(f"{8 * width}-bit PCM not supported")
    return samples.reshape(-1, ch), rate


def extract_features(
    media: DataFrame, fake: bool = True, feature_dim: int = 16
) -> DataFrame:
    """payload binary → fixed-dim float feature vector via mapInPandas.

    Batch shape: one Arrow batch of (doc_id, kind, payload) per iteration;
    the decode + pooling runs vectorized inside the batch.  On a real
    cluster this stage is CPU-heavy and embarrassingly parallel — the plan
    repartitions by doc_id so codec work spreads evenly regardless of
    upstream file layout.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf["payload"].values:
                img = decode_image(bytes(payload), fake=fake)
                pooled = img.astype(np.float32).reshape(-1)
                # mean-pool into feature_dim buckets
                pad = (-len(pooled)) % feature_dim
                if pad:
                    pooled = np.pad(pooled, (0, pad))
                feats.append(pooled.reshape(feature_dim, -1).mean(axis=1) / 255.0)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "kind": pdf["kind"].values,
                    "feature": [f.tolist() for f in feats],
                    "n_bytes": [len(bytes(p)) for p in pdf["payload"].values],
                }
            )

    balanced = media.repartition("doc_id")
    return balanced.mapInPandas(kernel, schema=FEATURE_SCHEMA)


def resize_image(img: np.ndarray, size: tuple[int, int]) -> np.ndarray:
    """Nearest-neighbor resize to (h, w) — pure numpy index math, the
    dependency-free normalization step before pooling/feature extraction."""
    h, w = size
    ys = (np.arange(h) * (img.shape[0] / h)).astype(np.int64)
    xs = (np.arange(w) * (img.shape[1] / w)).astype(np.int64)
    return img[ys][:, xs]


AUDIO_FEATURE_SCHEMA = (
    "doc_id long, duration_sec double, sample_rate int, channels int, "
    "rms double, zero_crossing_rate double"
)


def extract_audio_features(media: DataFrame) -> DataFrame:
    """WAV payloads → per-clip scalar features via mapInPandas.

    A REAL pipeline (stdlib decoder + numpy math): duration, RMS level and
    zero-crossing rate — the standard cheap audio-quality signals a
    training-data filter keys on.  Same distribution shape as
    :func:`extract_features` (repartition by doc_id, Arrow batches).
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"].values, pdf["payload"].values):
                samples, rate = decode_audio(bytes(payload))
                mono = samples.mean(axis=1)
                zc = (
                    float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1])))
                    if len(mono) > 1
                    else 0.0
                )
                rows.append(
                    {
                        "doc_id": int(doc_id),
                        "duration_sec": round(len(mono) / rate, 6),
                        "sample_rate": rate,
                        "channels": samples.shape[1],
                        "rms": round(float(np.sqrt(np.mean(mono**2))), 6),
                        "zero_crossing_rate": round(zc, 6),
                    }
                )
            yield pd.DataFrame(rows)

    return (
        media.filter(F.col("kind") == "audio")
        .repartition("doc_id")
        .mapInPandas(kernel, schema=AUDIO_FEATURE_SCHEMA)
    )


def sample_frames(
    media: DataFrame, every_ms: int = 1000
) -> DataFrame:
    """Video frame-sampling plumbing: expands each video row into frame
    timestamps (native sequence — the decode itself would hang off each
    (doc_id, frame_ts) row via extract_features)."""
    dur = F.coalesce(F.col("meta.duration_ms"), F.lit(0))
    return media.filter(F.col("kind") == "video").select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), dur, F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )


# ---- RAWV: a real, dependency-free video container --------------------
# Layout (all little-endian):  b"RAWV" | u16 width | u16 height |
# u16 n_frames | u16 fps_milli (frames per 1000 ms) | frames…
# where each frame is height*width*3 raw RGB bytes.  The same
# decodable-format policy as BMP/PPM/WAV: real byte-layout codec with
# roundtrip goldens; compressed video (MP4/H.264) stays an explicit
# NotImplementedError in decode_image/extract_features.

def encode_rawv(frames: np.ndarray, fps: int = 25) -> bytes:
    """(n, h, w, 3) uint8 → RAWV payload (test/encoder helper)."""
    n, h, w, c = frames.shape
    assert c == 3
    head = b"RAWV" + struct.pack("<HHHH", w, h, n, fps)
    return head + frames.astype(np.uint8).tobytes()


def decode_rawv(payload: bytes) -> tuple[np.ndarray, int]:
    """RAWV payload → ((n, h, w, 3) uint8 frames, fps)."""
    if payload[:4] != b"RAWV":
        raise NotImplementedError(
            "compressed video decode needs a codec library (MP4/H.264 "
            "payloads are explicit stubs in this container)"
        )
    w, h, n, fps = struct.unpack("<HHHH", payload[4:12])
    body = np.frombuffer(payload, dtype=np.uint8, offset=12)
    return body.reshape(n, h, w, 3), fps


VIDEO_FRAME_SCHEMA = (
    "doc_id long, frame_idx int, frame_ts_ms int, height int, width int, "
    "mean_rgb array<float>"
)


def sample_frames_decoded(
    media: DataFrame, every_ms: int = 1000
) -> DataFrame:
    """REAL frame sampling over RAWV video payloads via mapInPandas: each
    video row expands to its sampled frames with per-frame mean-RGB
    features (the downstream embed/filter hook).  Same distribution shape
    as the other media kernels — repartition by doc_id, Arrow batches;
    the sampling stride converts ``every_ms`` to a frame step via the
    container's fps."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in
                   ("doc_id", "frame_idx", "frame_ts_ms", "height",
                    "width", "mean_rgb")}
            for doc_id, payload in zip(
                pdf["doc_id"].values, pdf["payload"].values
            ):
                frames, fps = decode_rawv(bytes(payload))
                step = max(1, round(every_ms * fps / 1000))
                for i in range(0, len(frames), step):
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["frame_ts_ms"].append(int(i * 1000 / fps))
                    out["height"].append(frames.shape[1])
                    out["width"].append(frames.shape[2])
                    out["mean_rgb"].append(
                        (frames[i].reshape(-1, 3).mean(axis=0) / 255.0)
                        .astype(np.float32).tolist()
                    )
            yield pd.DataFrame(out)

    balanced = media.filter(F.col("kind") == "video").repartition("doc_id")
    return balanced.mapInPandas(kernel, schema=VIDEO_FRAME_SCHEMA)
