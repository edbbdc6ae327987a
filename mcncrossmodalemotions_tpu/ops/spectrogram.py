"""Audio spectrogram frontend (VGGVox ``runSpec`` equivalent), TPU-first.

Reference behavior (SURVEY.md section 2.2; VGGVox runSpec invoked at
getBatchEmoVoxCeleb.m:162 and compute_audio_feats.m:176 with fs=16000,
Tw=25 ms, Ts=10 ms, preemphasis alpha=0.97 — run_distillation.m:109-117):

    preemphasis -> framing (400-sample window, 160 hop, no padding)
    -> symmetric Hamming window -> 512-point FFT magnitude (all 512 bins,
    conjugate-symmetric halves both kept) -> 512 x T spectrogram
    (T = 100 frames/sec) -> per-utterance instance norm over time
    (mean/std per frequency bin, N-1 std — getBatchEmoVoxCeleb.m:164-169).

Crop-length arithmetic (getBatchEmoVoxCeleb.m:67-68): a W-frame crop reads
``audTime = 0.01*W + 0.001*Tw - 0.001`` seconds, so 400 frames <-> 4.024 s
<-> 64,384 samples, and ``floor((64384-400)/160)+1 = 400`` frames exactly.

TPU design: the DFT is a dense matmul (frames [B*T, 400] @ dft [400, 257])
so it runs on the MXU; only the non-redundant 257 rFFT bins are computed
and the conjugate-symmetric upper half is mirrored, halving FLOPs vs the
reference's full 512-point FFT while producing identical magnitudes.
A fused Pallas kernel (ops/pallas_spectrogram.py) performs
framing+window+DFT+magnitude in VMEM without materialising frames in HBM.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class SpecConfig:
    """Spectrogram frontend parameters (run_distillation.m:108-117)."""

    sample_rate: int = 16000
    window_ms: float = 25.0
    hop_ms: float = 10.0
    preemph: float = 0.97
    nfft: int = 512

    def __post_init__(self):
        # Guard at CONFIG construction so both frontends (jnp matmul and
        # Pallas) are covered: for win > nfft a matrix DFT computes the
        # WRAPPED (aliased) transform where MATLAB's fft(x, nfft)
        # truncates — silently different numerics. Reference: 400 <= 512.
        if self.win_length > self.nfft:
            raise ValueError(
                f"win_length {self.win_length} > nfft {self.nfft}: "
                "unsupported (matmul DFT would alias where MATLAB fft "
                "truncates)")

    @property
    def win_length(self) -> int:
        return int(round(self.sample_rate * self.window_ms / 1000.0))  # 400

    @property
    def hop_length(self) -> int:
        return int(round(self.sample_rate * self.hop_ms / 1000.0))  # 160

    @property
    def num_bins(self) -> int:
        """Output frequency bins: the full (redundant) FFT size."""
        return self.nfft

    @property
    def num_rbins(self) -> int:
        """Non-redundant rFFT bins actually computed."""
        return self.nfft // 2 + 1

    def num_frames(self, num_samples: int) -> int:
        """Frames produced from ``num_samples`` (floor framing, no padding)."""
        if num_samples < self.win_length:
            return 0
        return (num_samples - self.win_length) // self.hop_length + 1

    def crop_samples(self, num_frames: int) -> int:
        """Samples to read for a ``num_frames``-frame crop.

        Reference formula (getBatchEmoVoxCeleb.m:67-68):
        audTime = hop_s*W + win_s/1000... concretely
        0.01*W + 0.001*Tw - 0.001 seconds. For W=400 -> 64,384 samples.
        """
        aud_time = self.hop_ms / 1000.0 * num_frames + (self.window_ms - 1.0) / 1000.0
        return int(round(aud_time * self.sample_rate))

    def frames_per_second(self) -> float:
        return self.sample_rate / self.hop_length  # 100


DEFAULT_SPEC = SpecConfig()


def hamming(n: int, dtype=np.float32) -> np.ndarray:
    """Symmetric Hamming window (MATLAB ``hamming(n)`` convention)."""
    if n == 1:
        return np.ones(1, dtype)
    i = np.arange(n)
    return (0.54 - 0.46 * np.cos(2.0 * np.pi * i / (n - 1))).astype(dtype)


@functools.lru_cache(maxsize=8)
def _dft_matrices_np(win_length: int, nfft: int, windowed: bool = True):
    if win_length > nfft:
        # The matmul form would compute the WRAPPED (aliased) DFT here,
        # whereas MATLAB's fft(x, nfft) truncates the segment — silently
        # different numerics. The reference geometry is 400 <= 512; any
        # custom config must keep win <= nfft.
        raise ValueError(
            f"win_length {win_length} > nfft {nfft}: unsupported "
            "(matmul DFT would alias where MATLAB fft truncates)")
    k = np.arange(nfft // 2 + 1)
    i = np.arange(win_length)
    angle = -2.0 * np.pi * np.outer(i, k) / nfft
    cos_m = np.cos(angle)
    sin_m = np.sin(angle)
    if windowed:
        w = hamming(win_length, np.float64)[:, None]
        cos_m = cos_m * w
        sin_m = sin_m * w
    return cos_m.astype(np.float32), sin_m.astype(np.float32)


def dft_matrices(win_length: int, nfft: int, windowed: bool = True):
    """Real/imag DFT matrices of shape [win_length, nfft//2+1].

    With ``windowed=True`` the Hamming window is folded into the matrix, so
    the whole framing->window->DFT chain is a single MXU matmul. Only the
    numpy constants are cached — never jnp arrays, which would leak tracers
    when first materialised inside a jit trace.
    """
    cos_m, sin_m = _dft_matrices_np(win_length, nfft, windowed)
    return jnp.asarray(cos_m), jnp.asarray(sin_m)


def decode_pcm(x: jax.Array) -> jax.Array:
    """Decode the batchers' compact feed formats on device; floats pass
    through. Lives at the frontend entry so EVERY spectrogram consumer
    honours the feed contracts:

    - int16: PCM16, dequantised with the audioread convention;
    - uint8: mu-law (mu=255) companded rows (data/audio.pack_mulaw8) —
      the quarter-bandwidth opt-in feed for link-bound hosts.
    """
    if x.dtype == jnp.int16:
        return x.astype(jnp.float32) / 32768.0
    if x.dtype == jnp.uint8:
        # encoder constant shared with data/audio.pack_mulaw8 — the
        # codec contract lives in one place (numpy-only module, no cycle)
        from mcncrossmodalemotions_tpu.data.audio import MULAW_MU

        y = x.astype(jnp.float32) / 127.5 - 1.0
        return (jnp.sign(y) * jnp.expm1(jnp.abs(y) * np.log1p(MULAW_MU))
                / MULAW_MU)
    return x


def preemphasis(x: jax.Array, alpha: float = 0.97) -> jax.Array:
    """MATLAB ``filter([1 -alpha], 1, x)`` along the last axis.

    y[0] = x[0]; y[n] = x[n] - alpha*x[n-1].
    """
    x = decode_pcm(x)
    return jnp.concatenate([x[..., :1], x[..., 1:] - alpha * x[..., :-1]], axis=-1)


def frame_signal(x: jax.Array, win_length: int, hop_length: int) -> jax.Array:
    """[..., N] -> [..., T, win_length] frames (floor framing, no padding)."""
    n = x.shape[-1]
    t = (n - win_length) // hop_length + 1
    starts = np.arange(t) * hop_length
    idx = starts[:, None] + np.arange(win_length)[None, :]  # [T, win]
    return x[..., idx]


def mirror_bins(half: jax.Array, nfft: int) -> jax.Array:
    """Expand rFFT magnitudes [..., nfft//2+1] to the full [..., nfft].

    |X[k]| = |X[nfft-k]| for real input; the reference keeps all 512 bins.
    """
    return jnp.concatenate([half, half[..., nfft // 2 - 1:0:-1]], axis=-1)


@functools.lru_cache(maxsize=8)
def _preemph_dft_kernel_np(win_length: int, nfft: int,
                           alpha: float) -> np.ndarray:
    """Fused preemphasis+window+DFT as ONE conv kernel [win+1, 1, 2*rbins].

    For a frame starting at sample s, the windowed DFT of the
    preemphasised signal y[n] = x[n] - alpha*x[n-1] is a linear function
    of x[s-1 .. s+win-1]:

        sum_i M[i] y[s+i] = sum_j K[j] x[s-1+j]
        K[0] = -alpha*M[0];  K[j] = M[j-1] - alpha*M[j] (1<=j<win);
        K[win] = M[win-1]

    so the whole preemph->frame->window->DFT chain is a single stride-hop
    VALID conv over the 1-left-zero-padded waveform (the zero pad
    reproduces MATLAB filter()'s zero initial condition at s=0, and for
    s>0 the real x[s-1] is used exactly as global preemphasis does).
    Channels stack [cos | sin]. Built in float64, cast to float32.
    """
    cos_m, sin_m = _dft_matrices_np(win_length, nfft, windowed=True)
    m = np.concatenate([cos_m, sin_m], axis=1).astype(np.float64)  # [win, 2R]
    k = np.zeros((win_length + 1, m.shape[1]), np.float64)
    k[0] = -alpha * m[0]
    k[1:win_length] = m[:-1] - alpha * m[1:]
    k[win_length] = m[-1]
    return k[:, None, :].astype(np.float32)  # [win+1, 1, 2R] (WIO)


def spectrogram_half_frames(x: jax.Array,
                            cfg: SpecConfig = DEFAULT_SPEC) -> jax.Array:
    """[..., N] waveform -> [..., T, nfft//2+1] non-redundant magnitudes.

    The hot formulation: ONE strided 1-D convolution fuses preemphasis,
    framing, Hamming window and the rFFT (cos+sin channels) — no
    [T, win] frames tensor is ever materialised in HBM (the previous
    gather-based framing cost 2.5x read amplification and gathers are
    pathological on this TPU runtime; measured in docs/PERF.md round-4
    frontend study). HIGHEST precision: default bf16 operand truncation
    costs ~4% magnitude error, unacceptable for the frontend every
    downstream number depends on.
    """
    x = decode_pcm(x)
    lead = x.shape[:-1]
    n = x.shape[-1]
    kernel = jnp.asarray(_preemph_dft_kernel_np(cfg.win_length, cfg.nfft,
                                                cfg.preemph))
    xp = jnp.pad(x.reshape(-1, n), ((0, 0), (1, 0)))[..., None]  # [B, N+1, 1]
    out = jax.lax.conv_general_dilated(
        xp, kernel, window_strides=(cfg.hop_length,), padding="VALID",
        dimension_numbers=("NWC", "WIO", "NWC"),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)  # [B, T, 2R]
    r = cfg.num_rbins
    re, im = out[..., :r], out[..., r:]
    half = jnp.sqrt(re * re + im * im)
    return half.reshape(*lead, *half.shape[1:])


def spectrogram_frames(x: jax.Array, cfg: SpecConfig = DEFAULT_SPEC) -> jax.Array:
    """[..., N] waveform -> [..., T, nfft] magnitude frames (time-major)."""
    return mirror_bins(spectrogram_half_frames(x, cfg), cfg.nfft)


def spectrogram(x: jax.Array, cfg: SpecConfig = DEFAULT_SPEC) -> jax.Array:
    """[..., N] waveform -> [..., F=nfft, T] spectrogram (freq-major).

    Matches the reference's 512 x T layout (SURVEY.md section 2.2).
    """
    return jnp.swapaxes(spectrogram_frames(x, cfg), -1, -2)


def instance_norm(spec: jax.Array, eps: float = 1e-8, valid_frames=None) -> jax.Array:
    """Per-utterance normalisation over time, per frequency bin.

    mu = mean over time, sigma = std over time with N-1 normalisation
    (MATLAB ``std`` default; getBatchEmoVoxCeleb.m:164-169,
    compute_audio_feats.m:177-180). ``spec`` is [..., F, T].

    ``valid_frames`` (optional, [...]-shaped int) restricts statistics to
    the first ``valid_frames`` columns — the masked-shape replacement for
    the reference's variable-length eval (SURVEY.md section 5.7).
    """
    t = spec.shape[-1]
    if valid_frames is None:
        mu = jnp.mean(spec, axis=-1, keepdims=True)
        var = jnp.sum((spec - mu) ** 2, axis=-1, keepdims=True) / max(t - 1, 1)
    else:
        vf = jnp.asarray(valid_frames)
        mask = (
            jnp.arange(t)[None, :] < vf.reshape(-1, 1)
        ).reshape(vf.shape + (1, t)).astype(spec.dtype)
        denom = jnp.maximum(vf.astype(spec.dtype), 1.0).reshape(vf.shape + (1, 1))
        mu = jnp.sum(spec * mask, axis=-1, keepdims=True) / denom
        var = jnp.sum(((spec - mu) * mask) ** 2, axis=-1, keepdims=True) / jnp.maximum(
            denom - 1.0, 1.0
        )
        # the where's false branch already zeroes the padded region;
        # no pre-multiply by the mask is needed
        return jnp.where(mask > 0, (spec - mu) / jnp.sqrt(var + eps), 0.0)
    return (spec - mu) / jnp.sqrt(var + eps)


def waveform_to_input(x: jax.Array, cfg: SpecConfig = DEFAULT_SPEC,
                      valid_frames=None, use_pallas: bool = False) -> jax.Array:
    """Full frontend: [B, N] waveform -> [B, F, T, 1] normalised model input.

    ``use_pallas`` routes the framing+DFT through the fused Pallas TPU
    kernel (ops/pallas_spectrogram.py); numerics match the jnp path.

    The jnp path normalises the NON-REDUNDANT half spectrum and mirrors
    afterwards: mirrored bins share magnitudes, hence per-bin time
    statistics, so the result is identical while the multi-pass
    instance-norm touches half the bytes (docs/PERF.md round-4 frontend
    study).
    """
    if use_pallas:
        from mcncrossmodalemotions_tpu.ops.pallas_spectrogram import spectrogram_pallas

        spec = spectrogram_pallas(x, cfg)
        spec = instance_norm(spec, valid_frames=valid_frames)
        return spec[..., None]
    half = jnp.swapaxes(spectrogram_half_frames(x, cfg), -1, -2)  # [B, R, T]
    half = instance_norm(half, valid_frames=valid_frames)
    spec = jnp.concatenate(
        [half, half[..., cfg.nfft // 2 - 1:0:-1, :]], axis=-2)
    return spec[..., None]
