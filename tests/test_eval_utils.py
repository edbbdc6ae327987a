"""ROC/AUC and multinomial-regression utilities vs hand computations."""

import numpy as np
import pytest

from mcncrossmodalemotions_tpu.utils.mnr import mnrfit, mnrval
from mcncrossmodalemotions_tpu.utils.roc import auc_score, roc_curve


def test_auc_perfect_separation():
    labels = np.array([1, 1, -1, -1])
    scores = np.array([0.9, 0.8, 0.2, 0.1])
    assert auc_score(labels, scores) == pytest.approx(1.0)


def test_auc_random_is_half():
    rng = np.random.RandomState(0)
    labels = np.where(rng.rand(4000) > 0.5, 1, -1)
    scores = rng.rand(4000)
    assert auc_score(labels, scores) == pytest.approx(0.5, abs=0.03)


def test_auc_equals_rank_statistic(rng):
    """AUC == P(score_pos > score_neg) (Mann-Whitney)."""
    labels = np.where(rng.rand(200) > 0.6, 1, -1)
    scores = rng.randn(200) + 0.5 * (labels > 0)
    pos = scores[labels > 0]
    neg = scores[labels < 0]
    mw = np.mean(pos[:, None] > neg[None, :]) + 0.5 * np.mean(
        pos[:, None] == neg[None, :]
    )
    assert auc_score(labels, scores) == pytest.approx(mw, abs=1e-9)


def test_roc_curve_monotone(rng):
    labels = np.where(rng.rand(100) > 0.5, 1, -1)
    scores = rng.randn(100)
    tpr, fpr, _ = roc_curve(labels, scores)
    assert np.all(np.diff(tpr) >= 0)
    assert np.all(np.diff(fpr) >= 0)
    assert tpr[0] == 0 and tpr[-1] == 1 and fpr[-1] == 1


def test_auc_degenerate_returns_nan():
    assert np.isnan(auc_score(np.array([1, 1]), np.array([0.2, 0.3])))


def test_mnrfit_recovers_separable_mapping(rng):
    """3-class problem with a known linear map: near-perfect accuracy."""
    n = 600
    x = rng.randn(n, 4).astype(np.float64)
    true_w = np.array([[2.0, 0, -1, 0], [0, 2.0, 1, 0], [-2.0, -2.0, 0, 1]])
    y = (x @ true_w.T + 0.3 * rng.randn(n, 3)).argmax(axis=1)
    beta = mnrfit(x, y, num_classes=3)
    probs = mnrval(beta, x)
    acc = (probs.argmax(axis=1) == y).mean()
    assert acc > 0.9
    np.testing.assert_allclose(probs.sum(axis=1), 1.0, atol=1e-9)


def test_mnrfit_matches_sklearn_style_gradient_zero(rng):
    """At the optimum the (ridge-adjusted) score equation holds."""
    n = 300
    x = rng.randn(n, 3)
    y = rng.randint(0, 3, n)
    beta = mnrfit(x, y, num_classes=3, ridge=1e-6)
    xd = np.concatenate([np.ones((n, 1)), x], axis=1)
    probs = mnrval(beta, x)
    onehot = np.eye(3)[y][:, :2]
    grad = xd.T @ (onehot - probs[:, :2]) - 1e-6 * beta
    assert np.max(np.abs(grad)) < 1e-5


def test_mnrval_reference_class_convention():
    """Last class is the reference: zero beta -> uniform probabilities."""
    beta = np.zeros((3, 2))
    probs = mnrval(beta, np.random.randn(5, 2))
    np.testing.assert_allclose(probs, 1.0 / 3.0, atol=1e-12)


def test_mnr_binary_matches_logistic(rng):
    """T=2 reduces to standard logistic regression."""
    n = 400
    x = rng.randn(n, 2)
    logits = 1.5 * x[:, 0] - 2.0 * x[:, 1] + 0.5
    y = (rng.rand(n) < 1 / (1 + np.exp(-logits))).astype(int)
    # class 0 = positive in mnr layout (last class = reference)
    beta = mnrfit(x, 1 - y, num_classes=2)
    # beta estimates the log-odds of class 0 (=y==1) vs class 1
    np.testing.assert_allclose(beta[:, 0], [0.5, 1.5, -2.0], atol=0.5)


def test_eta_and_metrics_logger(tmp_path, capsys):
    from mcncrossmodalemotions_tpu.utils.logging import Eta, MetricsLogger, progress

    eta = Eta(10, name="unit", log_every=5)
    for _ in range(10):
        eta.tick()
    err = capsys.readouterr().err
    assert "unit" in err and "10/10" in err

    consumed = list(progress(range(3), name="p", log_every=10))
    assert consumed == [0, 1, 2]

    log = MetricsLogger(tmp_path / "m.jsonl")
    log.log({"epoch": 1, "loss": 0.5})
    log.log({"epoch": 2, "loss": 0.25})
    records = log.read()
    assert [r["epoch"] for r in records] == [1, 2]
    assert records[1]["loss"] == 0.25


def test_mnrfit_matches_sklearn_golden():
    """Committed fixture from scikit-learn's unpenalised multinomial
    logistic regression (tests/fixtures/generate_goldens.py): the IRLS
    mnrfit must reach the same MLE — predicted class probabilities agree
    to solver tolerance (parameterisations differ; probabilities do not)."""
    from pathlib import Path

    from mcncrossmodalemotions_tpu.utils.mnr import mnrfit, mnrval

    fx = np.load(Path(__file__).parent / "fixtures" / "mnr_golden.npz")
    params = mnrfit(fx["X"], fx["y"], num_classes=3)
    probs = mnrval(params, fx["Xtest"])
    np.testing.assert_allclose(probs, fx["probs"], atol=2e-4)


def test_kfold_splits_linspace_chunks():
    """Fold structure matches run_cross_val.m:97-109: one permutation
    cut at round(linspace(0, n, k+1)) boundaries — a partition of 0..n-1
    with the reference's chunk sizes."""
    import numpy as np

    from mcncrossmodalemotions_tpu.exp.run_cross_val import kfold_splits

    n, k = 103, 10
    folds = kfold_splits(n, k, seed=0)
    assert len(folds) == k
    allidx = np.concatenate(folds)
    assert sorted(allidx) == list(range(n))  # exact partition
    bounds = np.round(np.linspace(0, n, k + 1)).astype(int)
    assert [len(f) for f in folds] == list(np.diff(bounds))
    # deterministic under the pinned seed (rng(0), run_cross_val.m:55)
    again = kfold_splits(n, k, seed=0)
    assert all((a == b).all() for a, b in zip(folds, again))


def test_aggregate_track_mean1_alias():
    """'mean1' is the reference's spelling of the mean aggregator
    (run_cross_val.m:126)."""
    import numpy as np

    from mcncrossmodalemotions_tpu.exp.run_cross_val import aggregate_track

    x = np.arange(12, dtype=np.float32).reshape(3, 4)
    np.testing.assert_array_equal(aggregate_track(x, "mean1"),
                                  aggregate_track(x, "mean"))
