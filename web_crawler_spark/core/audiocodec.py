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


def fingerprint64(samples: np.ndarray) -> int:
    """64-bit acoustic fingerprint (chromaprint-shaped stand-in): the clip is
    split into 64 equal windows; bit k = window-k mean |amplitude| > the
    median of the 64 window means. Gain-INVARIANT by construction (a global
    volume change scales every window mean and their median alike), while a
    localized edit flips only the windows it touches — the energy-contour
    shape real acoustic fingerprints (chromaprint/echoprint) share. Signed
    int64 (Spark LongType); identical math on executors and the driver-side
    oracle builder (float64 numpy throughout)."""
    s = np.abs(samples.astype(np.float64))
    means = np.array([w.mean() if len(w) else 0.0 for w in np.array_split(s, 64)])
    med = float(np.median(means))
    v = 0
    for bit in means > med:
        v = (v << 1) | int(bit)
    return v - (1 << 64) if v >= (1 << 63) else v


def fingerprint_of(data: bytes) -> int:
    """Fingerprint of an encoded clip's DECODED samples — the uniform rule
    both the ingest path and the oracle use, so lossy (pcm8) quantization
    affects both sides identically."""
    samples, _sr, _fmt = decode(data)
    return fingerprint64(samples)


def variant_samples(audio_id: str, n: int) -> np.ndarray:
    """Near-duplicate perturbation of ``reference_samples``: a 3% global gain
    cut (fingerprint-invariant by design — it proves the gain invariance)
    plus a 10% boost on 2 of the 64 fingerprint windows. Measured fingerprint
    Hamming distance from the base: 0-6 across the planted corpus (median 2),
    vs >= 22 between unrelated clips."""
    s = reference_samples(audio_id, n).astype(np.float64) * 0.97
    bounds = np.linspace(0, n, 65).astype(int)
    for t in range(2):
        k = stable_hash64(7, f"aburst{t}", audio_id) % 64
        s[bounds[k] : bounds[k + 1]] *= 1.10
    return np.clip(np.rint(s), -32768, 32767).astype(np.int16)


def variant_row(audio_id: str, seed: int = 42) -> dict:
    """Audio-table row for the planted near-duplicate ``{audio_id}-v``:
    same rate/length as the base, perturbed samples, lossless encode."""
    base = audio_row(audio_id, seed=seed)
    s = variant_samples(audio_id, base["n_samples"])
    return {
        "audio_id": audio_id + "-v",
        "bytes": encode(s, base["sr"], "pcm"),
        "sr": base["sr"],
        "n_samples": base["n_samples"],
        "fmt": "pcm",
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
