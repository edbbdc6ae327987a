"""Compact host->device waveform feed formats (int16 PCM, mu-law uint8).

The training/extraction feeds ship quantised waveforms and decode on
device at the frontend entry (ops/spectrogram.decode_pcm). These tests
pin the contracts: round-trip fidelity, spectrogram closeness, and the
batcher/driver plumbing for the opt-in mu-law feed.
"""

import numpy as np
import jax.numpy as jnp

from mcncrossmodalemotions_tpu.data.audio import pack_mulaw8, pack_pcm16
from mcncrossmodalemotions_tpu.ops.spectrogram import (
    decode_pcm,
    waveform_to_input,
)


def _speechlike(rng, b=3, n=8000):
    """Broadband noise with a speech-ish ~20 dB spectral tilt (AR(1))."""
    from scipy.signal import lfilter

    w = rng.randn(b, n).astype(np.float32)
    x = lfilter([1.0], [1.0, -0.9], w, axis=1).astype(np.float32)
    return 0.3 * x / np.abs(x).max(axis=1, keepdims=True)


def test_pcm16_roundtrip_is_pure_quantisation(rng):
    x = _speechlike(rng)
    dec = np.asarray(decode_pcm(jnp.asarray(pack_pcm16(x))))
    assert np.abs(dec - x).max() <= 1.0 / 32768.0 + 1e-7


def test_mulaw8_roundtrip_snr(rng):
    x = _speechlike(rng)
    dec = np.asarray(decode_pcm(jnp.asarray(pack_mulaw8(x))))
    err = dec - x
    snr_db = 10 * np.log10((x ** 2).sum() / (err ** 2).sum())
    assert snr_db > 30.0, f"mu-law SNR {snr_db:.1f} dB"
    # companding favours small amplitudes: absolute error bounded there
    small = np.abs(x) < 0.01
    assert np.abs(err[small]).max() < 5e-4


def test_mulaw8_spectrogram_close_to_float_path(rng):
    from mcncrossmodalemotions_tpu.ops.spectrogram import DEFAULT_SPEC

    n = DEFAULT_SPEC.crop_samples(50)
    x = _speechlike(rng, b=2, n=n)
    ref = np.asarray(waveform_to_input(jnp.asarray(x)))
    got = np.asarray(waveform_to_input(jnp.asarray(pack_mulaw8(x))))
    # instance-normalised spectrograms: quantisation noise shifts bins a
    # little but the normalised features stay close (measured 0.06 RMS /
    # 0.998 corr on this signal)
    rms = np.sqrt(np.mean((got - ref) ** 2))
    assert rms < 0.15, f"normalised-spec RMS diff {rms:.3f}"
    corr = np.corrcoef(got.ravel(), ref.ravel())[0, 1]
    assert corr > 0.99


def test_mulaw8_narrowband_caveat(rng):
    """Pin the DOCUMENTED limitation: for narrowband signals the mu-law
    noise floor dominates spectrally empty bins, and the per-bin
    instance norm amplifies those bins to unit variance — the
    normalised features decorrelate. The feed is for broadband speech."""
    from scipy.signal import fftconvolve

    from mcncrossmodalemotions_tpu.ops.spectrogram import DEFAULT_SPEC

    n = DEFAULT_SPEC.crop_samples(50)
    x = rng.randn(2, n).astype(np.float32)
    x = fftconvolve(x, np.hanning(65)[None, :], mode="same").astype(
        np.float32)  # sharp lowpass: most bins are in the stopband
    x = 0.3 * x / np.abs(x).max(axis=1, keepdims=True)
    ref = np.asarray(waveform_to_input(jnp.asarray(x)))
    got = np.asarray(waveform_to_input(jnp.asarray(pack_mulaw8(x))))
    corr = np.corrcoef(got.ravel(), ref.ravel())[0, 1]
    assert corr < 0.9  # decorrelated — mu-law is NOT for narrowband use


def test_batcher_mulaw_feed_trains(tmp_path, rng):
    import jax

    from mcncrossmodalemotions_tpu.data.emovox import (
        BatchConfig,
        EmoVoxBatcher,
        build_synthetic_imdb,
    )
    from mcncrossmodalemotions_tpu.models.pipeline import AudioStudentPipeline
    from mcncrossmodalemotions_tpu.train.state import (
        SGDConfig,
        TrainState,
        make_train_step,
    )
    from mcncrossmodalemotions_tpu.zoo import student_loss_fn

    imdb = build_synthetic_imdb(tmp_path / "wavs", num_speakers=2,
                                tracks_per_speaker=2,
                                duration_range=(4.2, 4.5))
    cfg = BatchConfig(batch_size=4, num_seconds=1.0, emit_mulaw=True)
    batcher = EmoVoxBatcher(imdb, cfg, train=True, seed=0)
    batch = next(iter(batcher.batches(epoch=1)))
    assert batch["data"].dtype == np.uint8

    model = AudioStudentPipeline(fc6_features=32, fc7_features=16)
    jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
    variables = model.init(jax.random.PRNGKey(0), jbatch["data"][:1])
    step = jax.jit(make_train_step(
        model.apply, student_loss_fn("hot-cross-ent", temperature=2.0),
        SGDConfig(weight_decay=0.0)))
    state = TrainState.create(variables, jax.random.PRNGKey(1))
    state, metrics = step(state, jbatch, 1e-4)
    assert np.isfinite(float(metrics["loss"]))


def test_distillation_config_threads_mulaw():
    from mcncrossmodalemotions_tpu.exp.run_distillation import (
        DistillationConfig,
    )

    cfg = DistillationConfig(mulaw_feed=True)
    assert cfg.mulaw_feed
    # the LOSSY mu-law feed changes input numerics, so it is
    # identity-defining: a mu-law run must get its own exp dir and
    # never silently resume an int16 run's checkpoints
    assert cfg.exp_name() != DistillationConfig().exp_name()
    # ...while the lossless int16<->float choice maps to the SAME dir
    assert DistillationConfig().exp_name() == DistillationConfig().exp_name()
