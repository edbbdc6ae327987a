"""Golden-value tests for the audio frontend (SURVEY.md section 7 step 2)."""

import numpy as np
import jax.numpy as jnp
import pytest

from mcncrossmodalemotions_tpu.ops.spectrogram import (
    DEFAULT_SPEC,
    SpecConfig,
    frame_signal,
    hamming,
    instance_norm,
    preemphasis,
    spectrogram,
    waveform_to_input,
)


def reference_spectrogram(x: np.ndarray, cfg: SpecConfig = DEFAULT_SPEC) -> np.ndarray:
    """Literal float64 implementation of the runSpec pipeline definition."""
    xe = np.concatenate(
        [x[..., :1], x[..., 1:] - cfg.preemph * x[..., :-1]], axis=-1
    ).astype(np.float64)
    t = cfg.num_frames(x.shape[-1])
    frames = np.stack(
        [xe[..., i * cfg.hop_length:i * cfg.hop_length + cfg.win_length]
         for i in range(t)],
        axis=-2,
    )
    n = cfg.win_length
    w = 0.54 - 0.46 * np.cos(2 * np.pi * np.arange(n) / (n - 1))
    mag = np.abs(np.fft.fft(frames * w, cfg.nfft, axis=-1))
    return np.swapaxes(mag, -1, -2)


def test_geometry_matches_reference():
    """The documented crop arithmetic: 4.024 s = 64,384 samples = 400 frames
    (getBatchEmoVoxCeleb.m:67-68)."""
    cfg = DEFAULT_SPEC
    assert cfg.win_length == 400
    assert cfg.hop_length == 160
    assert cfg.crop_samples(400) == 64384
    assert cfg.num_frames(64384) == 400
    assert cfg.frames_per_second() == 100.0


def test_hamming_symmetric_matlab_convention():
    w = hamming(400)
    assert w[0] == pytest.approx(0.08, abs=1e-6)
    np.testing.assert_allclose(w, w[::-1], rtol=1e-6)


def test_preemphasis_matches_matlab_filter(rng):
    x = rng.randn(64).astype(np.float32)
    y = np.asarray(preemphasis(jnp.asarray(x), 0.97))
    expected = np.empty_like(x)
    expected[0] = x[0]
    expected[1:] = x[1:] - 0.97 * x[:-1]
    np.testing.assert_allclose(y, expected, rtol=1e-6)


def test_frame_signal_shapes_and_values(rng):
    x = rng.randn(2, 1000).astype(np.float32)
    frames = np.asarray(frame_signal(jnp.asarray(x), 400, 160))
    assert frames.shape == (2, 4, 400)
    np.testing.assert_array_equal(frames[:, 2], x[:, 320:720])


def test_spectrogram_golden_values(rng):
    x = rng.randn(2, 64384).astype(np.float32)
    got = np.asarray(spectrogram(jnp.asarray(x)))
    ref = reference_spectrogram(x)
    assert got.shape == (2, 512, 400)
    np.testing.assert_allclose(got, ref, atol=5e-4)


def test_spectrogram_conjugate_symmetry(rng):
    x = rng.randn(1, 64384).astype(np.float32)
    spec = np.asarray(spectrogram(jnp.asarray(x)))[0]
    np.testing.assert_allclose(spec[1:256], spec[511:256:-1], rtol=1e-5)


def test_instance_norm_matches_matlab_std(rng):
    """mean/std over time per freq bin, N-1 std (getBatchEmoVoxCeleb.m:164-169)."""
    spec = rng.rand(3, 16, 50).astype(np.float32) * 10
    got = np.asarray(instance_norm(jnp.asarray(spec)))
    mu = spec.mean(axis=-1, keepdims=True)
    sd = spec.std(axis=-1, keepdims=True, ddof=1)
    np.testing.assert_allclose(got, (spec - mu) / sd, atol=1e-4)


def test_instance_norm_masked_matches_trimmed(rng):
    """Masked stats over valid frames == stats of the trimmed signal."""
    spec = rng.rand(2, 8, 50).astype(np.float32)
    valid = np.array([50, 30])
    got = np.asarray(instance_norm(jnp.asarray(spec), valid_frames=valid))
    trimmed = np.asarray(instance_norm(jnp.asarray(spec[1:, :, :30])))
    np.testing.assert_allclose(got[1, :, :30], trimmed[0], atol=1e-4)
    assert np.all(got[1, :, 30:] == 0)


def test_waveform_to_input_shape(rng):
    x = rng.randn(2, 64384).astype(np.float32)
    out = np.asarray(waveform_to_input(jnp.asarray(x)))
    assert out.shape == (2, 512, 400, 1)
    # Each frequency row is instance-normalised: mean ~0, std ~1 over time.
    assert abs(out[0, 100, :, 0].mean()) < 1e-3


def test_pallas_kernel_matches_jnp(rng):
    """Interpret-mode check of the fused kernel; 2 tiles, tile-aligned T.

    (Small sizes: interpret mode is slow. The TPU bench exercises the
    kernel at the full 400-frame training shape.)"""
    from mcncrossmodalemotions_tpu.ops.pallas_spectrogram import spectrogram_pallas

    cfg = DEFAULT_SPEC
    n = cfg.crop_samples(256)
    x = rng.randn(1, n).astype(np.float32)
    ref = np.asarray(spectrogram(jnp.asarray(x)))
    got = np.asarray(spectrogram_pallas(jnp.asarray(x), interpret=True))
    assert got.shape == ref.shape == (1, 512, 256)
    np.testing.assert_allclose(got, ref, atol=5e-4)


def test_pallas_kernel_non_tile_multiple(rng):
    """T not a multiple of the 128-frame tile: padding + trim must be exact."""
    from mcncrossmodalemotions_tpu.ops.pallas_spectrogram import spectrogram_pallas

    cfg = DEFAULT_SPEC
    n = cfg.crop_samples(150)  # 150 frames -> 2 tiles, trimmed
    x = rng.randn(1, n).astype(np.float32)
    ref = np.asarray(spectrogram(jnp.asarray(x)))
    got = np.asarray(spectrogram_pallas(jnp.asarray(x), interpret=True))
    assert got.shape == ref.shape == (1, 512, 150)
    np.testing.assert_allclose(got, ref, atol=5e-4)


def test_spectrogram_independent_scipy_golden():
    """Committed fixture generated by scipy.signal (an INDEPENDENT
    framing/window/FFT implementation — tests/fixtures/generate_goldens.py),
    not by this repo's own code: guards the runSpec conventions
    (preemphasis, 400/160 framing, symmetric Hamming, 512-bin magnitude)
    against self-consistent-but-wrong drift."""
    from pathlib import Path

    fx = np.load(Path(__file__).parent / "fixtures" / "spectrogram_golden.npz")
    for tag, frames in (("400", 100), ("37", 37)):
        wave = fx[f"wave_{tag}"]
        want = fx[f"mag_{tag}"]
        got = np.asarray(spectrogram(jnp.asarray(wave[None])))[0]
        assert got.shape == want.shape == (512, frames)
        np.testing.assert_allclose(got, want, atol=5e-4)


@pytest.mark.parametrize("window_ms,hop_ms,nfft,fs", [
    (16.0, 8.0, 256, 16000),    # shorter window, smaller FFT
    (25.0, 12.5, 512, 8000),    # non-default rate + hop
    (32.0, 8.0, 1024, 16000),   # long window, dense hop, big FFT
])
def test_spectrogram_matches_scipy_nondefault_configs(rng, window_ms,
                                                      hop_ms, nfft, fs):
    """Property check beyond the default-geometry golden: for arbitrary
    SpecConfigs the magnitude must match an independent scipy
    construction (preemph -> frame -> symmetric Hamming -> |FFT|)."""
    from scipy.signal.windows import hamming as scipy_hamming

    cfg = SpecConfig(sample_rate=fs, window_ms=window_ms, hop_ms=hop_ms,
                     nfft=nfft)
    win, hop = cfg.win_length, cfg.hop_length
    n = hop * 40 + win
    x = rng.randn(2, n).astype(np.float32)
    got = np.asarray(spectrogram(jnp.asarray(x), cfg))

    pre = np.concatenate([x[:, :1],
                          x[:, 1:] - cfg.preemph * x[:, :-1]], axis=1)
    t = (n - win) // hop + 1
    w = scipy_hamming(win, sym=True)
    ref = np.empty((2, nfft, t))
    for b in range(2):
        for i in range(t):
            seg = pre[b, i * hop:i * hop + win].astype(np.float64) * w
            ref[b, :, i] = np.abs(np.fft.fft(seg, nfft))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=5e-4 * np.sqrt(win / 400))


def test_spectrogram_rejects_window_longer_than_nfft():
    """win > nfft would alias where MATLAB's fft truncates — refused at
    CONFIG construction so both the jnp and Pallas frontends (which
    build their own DFT matrices) are covered."""
    with pytest.raises(ValueError, match="alias"):
        SpecConfig(window_ms=20.0, nfft=256)  # win 320 > 256


def test_fused_conv_frontend_matches_matmul_framing():
    """The one-conv frontend (preemph+frame+window+DFT fused; round-4)
    equals the explicit preemph -> gather-framing -> matmul chain, and
    norm-before-mirror equals mirror-before-norm (mirrored bins share
    per-bin time statistics)."""
    import jax
    import jax.numpy as jnp

    from mcncrossmodalemotions_tpu.ops.spectrogram import (
        DEFAULT_SPEC,
        dft_matrices,
        frame_signal,
        instance_norm,
        mirror_bins,
        preemphasis,
        spectrogram_half_frames,
        waveform_to_input,
    )

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(3, DEFAULT_SPEC.crop_samples(50))
                    .astype(np.float32) * 0.3)

    y = preemphasis(x, DEFAULT_SPEC.preemph)
    frames = frame_signal(y, DEFAULT_SPEC.win_length, DEFAULT_SPEC.hop_length)
    cos_m, sin_m = dft_matrices(DEFAULT_SPEC.win_length, DEFAULT_SPEC.nfft)
    re = jnp.matmul(frames, cos_m, precision=jax.lax.Precision.HIGHEST)
    im = jnp.matmul(frames, sin_m, precision=jax.lax.Precision.HIGHEST)
    ref_half = np.asarray(jnp.sqrt(re * re + im * im))

    got_half = np.asarray(spectrogram_half_frames(x))
    np.testing.assert_allclose(got_half, ref_half, atol=2e-4, rtol=2e-4)

    # end-to-end input: half-norm-then-mirror == mirror-then-norm
    ref_full = instance_norm(
        jnp.swapaxes(mirror_bins(jnp.asarray(ref_half), DEFAULT_SPEC.nfft),
                     -1, -2))
    got = np.asarray(waveform_to_input(x))[..., 0]
    np.testing.assert_allclose(got, np.asarray(ref_full),
                               atol=2e-3, rtol=2e-3)
