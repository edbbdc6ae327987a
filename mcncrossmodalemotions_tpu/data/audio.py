"""Host-side audio I/O: wav segment reads, resampling, crop arithmetic.

Rebuilds the reference's MATLAB ``audioread``/``audioinfo``/``resample``
usage (getBatchEmoVoxCeleb.m:79,97-118, compute_audio_feats.m:173):
random-access wav segment reads without full decode, duration queries,
and polyphase speed perturbation. A C++ data service (native/) provides
the threaded fast path; this module is the pure-Python reference
implementation with identical semantics.
"""

from __future__ import annotations

import dataclasses
import struct
from pathlib import Path
from typing import Optional, Tuple

import numpy as np


@dataclasses.dataclass(frozen=True)
class WavInfo:
    """audioinfo equivalent."""

    num_samples: int
    sample_rate: int
    num_channels: int
    bits_per_sample: int
    data_offset: int  # byte offset of PCM payload
    audio_format: int  # 1 = PCM int, 3 = IEEE float

    @property
    def duration(self) -> float:
        return self.num_samples / self.sample_rate


def wav_info(path: str | Path) -> WavInfo:
    """Parse RIFF/WAVE headers only (no payload decode)."""
    with open(path, "rb") as f:
        riff = f.read(12)
        if riff[:4] != b"RIFF" or riff[8:12] != b"WAVE":
            raise ValueError(f"{path}: not a RIFF/WAVE file")
        fmt = None
        while True:
            header = f.read(8)
            if len(header) < 8:
                raise ValueError(f"{path}: missing data chunk")
            chunk_id, size = header[:4], struct.unpack("<I", header[4:])[0]
            if chunk_id == b"fmt ":
                fmt = f.read(size)
                if size % 2:
                    f.read(1)
            elif chunk_id == b"data":
                if fmt is None:
                    raise ValueError(f"{path}: data before fmt")
                audio_format, channels, rate = struct.unpack("<HHI", fmt[:8])
                bits = struct.unpack("<H", fmt[14:16])[0]
                bytes_per_frame = channels * bits // 8
                return WavInfo(
                    num_samples=size // bytes_per_frame,
                    sample_rate=rate,
                    num_channels=channels,
                    bits_per_sample=bits,
                    data_offset=f.tell(),
                    audio_format=audio_format,
                )
            else:
                f.seek(size + (size % 2), 1)


def read_wav(path: str | Path, start: int = 0,
             num_samples: Optional[int] = None) -> Tuple[np.ndarray, int]:
    """audioread equivalent with [start, start+n) segment access.

    Returns (float32 mono samples in [-1, 1], sample_rate). Random access
    seeks directly to the requested frames — no full decode, matching the
    reference's windowed reads (getBatchEmoVoxCeleb.m:97-100).
    """
    info = wav_info(path)
    if num_samples is None:
        num_samples = info.num_samples - start
    num_samples = max(0, min(num_samples, info.num_samples - start))
    bytes_per_sample = info.bits_per_sample // 8
    frame_bytes = bytes_per_sample * info.num_channels
    with open(path, "rb") as f:
        f.seek(info.data_offset + start * frame_bytes)
        raw = f.read(num_samples * frame_bytes)
    if info.audio_format == 3 and info.bits_per_sample == 32:
        data = np.frombuffer(raw, "<f4").astype(np.float32)
    elif info.bits_per_sample == 16:
        data = np.frombuffer(raw, "<i2").astype(np.float32) / 32768.0
    elif info.bits_per_sample == 32:
        data = np.frombuffer(raw, "<i4").astype(np.float32) / 2147483648.0
    elif info.bits_per_sample == 8:
        data = (np.frombuffer(raw, "u1").astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported bit depth {info.bits_per_sample}")
    if info.num_channels > 1:
        # the reference takes the LEFT stream of stereo files
        # (compute_audio_feats.m:176 ``z = z(:,1)``), not a downmix
        data = np.ascontiguousarray(
            data.reshape(-1, info.num_channels)[:, 0])
    return data, info.sample_rate


def float_to_pcm16(samples: np.ndarray) -> np.ndarray:
    """MATLAB audiowrite convention: scale by 32768, clip to int16 range;
    audioread divides by 32768, so the round-trip is pure quantisation."""
    samples = np.asarray(samples, np.float32)
    return np.clip(np.round(samples * 32768.0), -32768, 32767).astype(np.int16)


def pack_pcm16(waves: np.ndarray) -> np.ndarray:
    """[B, N] float waveforms -> int16 device feed (half the bytes).

    Augmented/resampled waveforms can exceed [-1, 1]; hard clipping would
    flat-top them, so rows are peak-normalised DOWN only (divisor >= 1).
    The scaling is EXACTLY neutral downstream: the spectrogram is linear
    in the waveform and the per-freq-bin instance norm divides any
    per-row scale back out. The single definition here keeps the
    training feed (data/emovox.py) and the extraction feed
    (exp/compute_audio_feats.py) locked together.
    """
    peak = np.maximum(np.abs(waves).max(axis=1, keepdims=True), 1.0)
    return float_to_pcm16(waves / peak)


MULAW_MU = 255.0

_MULAW_LUT: Optional[np.ndarray] = None


def _mulaw_encode_float(x: np.ndarray) -> np.ndarray:
    """Companding formula itself (mu=255) — float in [-1, 1] -> uint8."""
    y = np.sign(x) * np.log1p(MULAW_MU * np.abs(x)) / np.log1p(MULAW_MU)
    return np.clip(np.round((y + 1.0) * 127.5), 0, 255).astype(np.uint8)


def _mulaw_lut() -> np.ndarray:
    """uint16-indexed (two's-complement order) int16 -> mu-law table."""
    global _MULAW_LUT
    if _MULAW_LUT is None:
        idx = np.arange(65536)
        pcm = np.where(idx < 32768, idx, idx - 65536).astype(np.float32)
        _MULAW_LUT = _mulaw_encode_float(pcm / 32768.0)
    return _MULAW_LUT


def pack_mulaw8(waves: np.ndarray) -> np.ndarray:
    """[B, N] float waveforms -> uint8 mu-law device feed (quarter the
    float32 bytes, half the int16 feed).

    Standard mu=255 companding over peak-normalised rows (same
    down-only normalisation as ``pack_pcm16`` — exactly neutral after
    the frontend's per-row instance norm), then symmetric 8-bit
    quantisation of the companded value. ~38 dB SNR on speech: an
    OPT-IN trade for link-bound hosts (the training engine's feed is
    the throughput ceiling when host->device bandwidth, not compute,
    binds). Decoded on device by ops/spectrogram.decode_pcm — uint8
    input IS the mu-law contract.

    Implemented as PCM16 quantisation + a 64K lookup table (classic
    G.711-style lin->ulaw): ~3x cheaper on the host than evaluating
    log1p per sample, which matters because packing runs on the
    producer thread the feed pipeline must keep ahead of. The extra
    PCM16 pre-quantisation step (1/32768) is 5.7x finer than mu-law's
    SMALLEST bin (~1/5865 near zero), so it only ever shifts a value
    across a bin boundary it was already within half a pcm step of.

    Caveat (pinned by tests/test_feed_formats.py): the quantisation
    noise floor dominates spectrally EMPTY frequency bins, which the
    per-bin instance norm then amplifies to unit variance — use only
    for broadband signals (speech); narrowband features decorrelate.
    """
    return _mulaw_lut()[pack_pcm16(waves).view(np.uint16)]


def write_wav(path: str | Path, samples: np.ndarray, sample_rate: int) -> None:
    """PCM16 wav writer (for synthetic fixtures and sample_audio exports)."""
    payload = float_to_pcm16(samples).astype("<i2").tobytes()
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "wb") as f:
        f.write(b"RIFF")
        f.write(struct.pack("<I", 36 + len(payload)))
        f.write(b"WAVEfmt ")
        f.write(struct.pack("<IHHIIHH", 16, 1, 1, sample_rate,
                            sample_rate * 2, 2, 16))
        f.write(b"data")
        f.write(struct.pack("<I", len(payload)))
        f.write(payload)


def resample_poly(x: np.ndarray, up: int, down: int) -> np.ndarray:
    """Rational polyphase resample (MATLAB ``resample(x, p, q)``)."""
    from scipy.signal import resample_poly as _rp

    return _rp(x, up, down).astype(np.float32)


def resample_to(x: np.ndarray, from_fs: int, to_fs: int) -> np.ndarray:
    """Resample between sample rates (no-op when equal)."""
    if from_fs == to_fs:
        return x
    from fractions import Fraction

    frac = Fraction(to_fs, from_fs).limit_denominator(1000)
    return resample_poly(x, frac.numerator, frac.denominator)


def speed_perturb(x: np.ndarray, factor: float, max_denominator: int = 100) -> np.ndarray:
    """Speed perturbation by rational resampling, factor in [0.95, 1.05].

    The reference draws a random factor and resamples
    (getBatchEmoVoxCeleb.m:102-108); playing at `factor` speed means
    resampling by 1/factor.
    """
    from fractions import Fraction

    frac = Fraction(factor).limit_denominator(max_denominator)
    # playback speed f => new length N/f => resample up=q, down=p
    return resample_poly(x, frac.denominator, frac.numerator)
