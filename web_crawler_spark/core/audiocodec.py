"""Deterministic toy audio codec for the audio payload column.

Same discipline as :mod:`imagecodec` (see its docstring / FIXTURES.md): real
audio libraries (ffmpeg/libsndfile) are NOT in this container, so the decode
step is a clearly-marked deterministic stand-in — a tiny ``WCSA`` container
holding int16 mono PCM, either raw (fmt ``pcm``, lossless) or 8-bit-quantized
(fmt ``pcm8``, lossy, SNR ≈ 48 dB). Swapping in a real codec changes ONLY
`encode`/`decode`; the Spark-side plumbing — binary columns through Arrow,
mapInPandas batch shape, per-row invariant checks — is real and is what the
engine tests/queries exercise.
"""

from __future__ import annotations

import struct

import numpy as np

from .hashing import rng_bytes, stable_hash64

MAGIC = b"WCSA"
_FMT_CODES = {"pcm": 0, "pcm8": 1}
_FMT_NAMES = {v: k for k, v in _FMT_CODES.items()}
LOSSY_FMTS = ("pcm8",)
CLIP_T = 32256  # |sample| at or above this counts as clipped
SNR_OK_DB = 30.0


def reference_samples(audio_id: str, n: int) -> np.ndarray:
    """Ground-truth int16 mono samples for *audio_id* — deterministic."""
    buf = rng_bytes(n * 2, "samples", audio_id)
    return np.frombuffer(buf, dtype="<i2")


def encode(samples: np.ndarray, sample_rate: int, fmt: str) -> bytes:
    """Encode int16 mono samples to WCSA container bytes."""
    if fmt not in _FMT_CODES:
        raise NotImplementedError(
            f"format {fmt!r}: real codecs are not available in this sandbox; "
            "supported stand-in formats are pcm/pcm8 (WCSA container)"
        )
    header = MAGIC + struct.pack("<BII", _FMT_CODES[fmt], sample_rate, len(samples))
    if fmt == "pcm":
        payload = samples.astype("<i2").tobytes()
    else:  # lossy: 8-bit quantization; decode reconstructs interval midpoints
        payload = ((samples.astype(np.int32) + 32768) >> 8).astype(np.uint8).tobytes()
    return header + payload


def decode(data: bytes) -> tuple[np.ndarray, int, str]:
    """Decode WCSA bytes → (samples int16, sample_rate, fmt). Raises on corrupt input."""
    if len(data) < 13 or data[:4] != MAGIC:
        raise ValueError("not a WCSA clip")
    code, sr, n = struct.unpack("<BII", data[4:13])
    fmt = _FMT_NAMES.get(code)
    if fmt is None:
        raise ValueError(f"unknown format code {code}")
    body = data[13:]
    if fmt == "pcm":
        if len(body) != n * 2:
            raise ValueError("truncated sample payload")
        samples = np.frombuffer(body, dtype="<i2")
    else:
        if len(body) != n:
            raise ValueError("truncated sample payload")
        u8 = np.frombuffer(body, dtype=np.uint8)
        samples = ((u8.astype(np.int32) << 8) - 32768 + 128).astype(np.int16)
    return samples, sr, fmt


def snr_db(ref: np.ndarray, dec: np.ndarray) -> float:
    """Signal-to-noise ratio in dB of *dec* against *ref*; inf if equal."""
    err = ref.astype(np.float64) - dec.astype(np.float64)
    pe = float(np.sum(err * err))
    if pe == 0.0:
        return float("inf")
    ps = float(np.sum(ref.astype(np.float64) ** 2))
    return float(10.0 * np.log10(ps / pe))


def features(samples: np.ndarray, sample_rate: int) -> dict:
    """Per-clip scalar features — identical math on executors and the
    driver-side oracle builder (float64 numpy throughout)."""
    s = samples.astype(np.float64)
    s32 = samples.astype(np.int32)
    return {
        "duration_s": len(samples) / sample_rate,
        "rms": float(np.sqrt(np.mean(s * s))) if len(samples) else 0.0,
        "peak": int(np.max(np.abs(s32))) if len(samples) else 0,
        "n_clipped": int((np.abs(s32) >= CLIP_T).sum()),
        "zero_crossings": int(((s32[:-1] * s32[1:]) < 0).sum()),
    }


def audio_row(audio_id: str, seed: int = 42) -> dict:
    """Deterministic full audio-table row for *audio_id*."""
    sr = (8000, 16000, 22050)[stable_hash64(seed, "asr", audio_id) % 3]
    n = 1000 + stable_hash64(seed, "an", audio_id) % 3000
    fmt = ("pcm", "pcm8")[stable_hash64(seed, "afmt", audio_id) % 2]
    samples = reference_samples(audio_id, n)
    return {
        "audio_id": audio_id,
        "bytes": encode(samples, sr, fmt),
        "sr": sr,
        "n_samples": n,
        "fmt": fmt,
    }
