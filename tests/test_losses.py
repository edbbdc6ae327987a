"""Loss library vs hand computations (SURVEY.md section 4 rebuild implication (a))."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mcncrossmodalemotions_tpu.losses import (
    class_error,
    distillation_ce,
    distribution_ce,
    euclidean_loss,
    huber_loss,
    per_class_stats,
    softmax_ce,
    softmax_t,
)


def _np_softmax(x, axis=-1):
    e = np.exp(x - x.max(axis=axis, keepdims=True))
    return e / e.sum(axis=axis, keepdims=True)


def test_softmax_t(rng):
    x = rng.randn(4, 8).astype(np.float32)
    got = np.asarray(softmax_t(jnp.asarray(x), temperature=2.0))
    np.testing.assert_allclose(got, _np_softmax(x / 2.0), rtol=1e-5)


def test_distillation_ce_hand_computed(rng):
    s = rng.randn(5, 8).astype(np.float32)
    t = rng.randn(5, 8).astype(np.float32)
    temp = 2.0
    got = float(distillation_ce(jnp.asarray(s), jnp.asarray(t), temp))
    p = _np_softmax(t / temp)
    logq = np.log(_np_softmax(s / temp))
    expected = -np.mean(np.sum(p * logq, axis=-1))
    assert abs(got - expected) < 1e-5


def test_distillation_ce_gradient_direction(rng):
    """Gradient should pull student logits toward teacher distribution."""
    t = jnp.asarray(rng.randn(3, 8).astype(np.float32))
    s = jnp.zeros((3, 8))
    g = jax.grad(lambda s_: distillation_ce(s_, t))(s)
    # grad = (softmax(s/T) - softmax(t/T)) / (T * B): uniform minus target
    expected = (np.full((3, 8), 1 / 8) - _np_softmax(np.asarray(t) / 2.0)) / (2.0 * 3)
    np.testing.assert_allclose(np.asarray(g), expected, atol=1e-6)


def test_distribution_ce_equals_softmaxlog_on_onehot(rng):
    logits = rng.randn(6, 8).astype(np.float32)
    labels = rng.randint(0, 8, 6)
    one_hot = np.eye(8, dtype=np.float32)[labels]
    a = float(distribution_ce(jnp.asarray(logits), jnp.asarray(one_hot)))
    b = float(softmax_ce(jnp.asarray(logits), jnp.asarray(labels)))
    assert abs(a - b) < 1e-5


def test_euclidean_loss_matlab_convention(rng):
    p = rng.randn(4, 8).astype(np.float32)
    t = rng.randn(4, 8).astype(np.float32)
    got = float(euclidean_loss(jnp.asarray(p), jnp.asarray(t)))
    expected = 0.5 * np.mean(np.sum((p - t) ** 2, axis=-1))
    assert abs(got - expected) < 1e-5


def test_euclidean_loss_instance_weights(rng):
    p = rng.randn(4, 8).astype(np.float32)
    t = rng.randn(4, 8).astype(np.float32)
    w = np.zeros((4, 8), np.float32)
    assert float(euclidean_loss(jnp.asarray(p), jnp.asarray(t), jnp.asarray(w))) == 0.0


def test_huber_quadratic_and_linear_regions():
    p = jnp.asarray([[0.5, 3.0]])
    t = jnp.zeros((1, 2))
    got = float(huber_loss(p, t, sigma=1.0))
    expected = 0.5 * 0.5 ** 2 + (3.0 - 0.5)
    assert abs(got - expected) < 1e-6


def test_class_error():
    logits = jnp.asarray([[1.0, 0.0], [0.0, 1.0], [1.0, 0.0]])
    labels = jnp.asarray([0, 1, 1])
    assert float(class_error(logits, labels)) == pytest.approx(1.0 / 3.0)


def test_per_class_stats():
    logits = jnp.asarray([[1.0, 0.0], [1.0, 0.0], [0.0, 1.0]])
    labels = jnp.asarray([0, 1, 1])
    correct, pop = per_class_stats(logits, labels, 2)
    np.testing.assert_array_equal(np.asarray(pop), [1.0, 2.0])
    np.testing.assert_array_equal(np.asarray(correct), [1.0, 1.0])


def test_euclidean_gradient_matches_analytic(rng):
    """grad = (pred - target) / B under the 0.5*sum-of-squares convention."""
    p = jnp.asarray(rng.randn(4, 8).astype(np.float32))
    t = jnp.asarray(rng.randn(4, 8).astype(np.float32))
    g = jax.grad(lambda p_: euclidean_loss(p_, t))(p)
    np.testing.assert_allclose(np.asarray(g), (np.asarray(p) - np.asarray(t)) / 4,
                               atol=1e-6)


def test_huber_gradient_bounded(rng):
    """Huber grads saturate at +/-1/B in the linear region (outliers)."""
    p = jnp.asarray([[100.0, -100.0, 0.1, -0.1]])
    t = jnp.zeros((1, 4))
    g = np.asarray(jax.grad(lambda p_: huber_loss(p_, t))(p))
    np.testing.assert_allclose(g[0, :2], [1.0, -1.0], atol=1e-6)
    np.testing.assert_allclose(g[0, 2:], [0.1, -0.1], atol=1e-6)


def test_distribution_ce_minimised_at_target(rng):
    """CE vs a distribution is minimised when softmax(logits) == target."""
    target = np.asarray([[0.6, 0.3, 0.1]], np.float32)
    logits_opt = jnp.asarray(np.log(target))
    loss_opt = float(distribution_ce(logits_opt, jnp.asarray(target)))
    logits_other = jnp.asarray(rng.randn(1, 3).astype(np.float32))
    assert float(distribution_ce(logits_other, jnp.asarray(target))) >= loss_opt - 1e-6


def test_huber_instance_weights(rng):
    """emoVoxZoo.m:145-148: the huber stack takes instanceWeights like the
    euclidean one; zero weights must remove those elements' contribution."""
    from mcncrossmodalemotions_tpu.losses import huber_loss

    pred = jnp.asarray(rng.randn(4, 8).astype(np.float32))
    target = jnp.asarray(rng.randn(4, 8).astype(np.float32))
    w = np.ones((4, 8), np.float32)
    w[:, 4:] = 0.0
    weighted = huber_loss(pred, target, sigma=1.0,
                          instance_weights=jnp.asarray(w))
    truncated = huber_loss(pred[:, :4], target[:, :4], sigma=1.0)
    np.testing.assert_allclose(float(weighted), float(truncated), rtol=1e-6)


def test_sample_weight_excludes_padded_rows(rng):
    """sample_weight=0 rows (mesh padding) contribute nothing; every loss
    and metric over [valid + dup] rows equals the unpadded computation."""
    from mcncrossmodalemotions_tpu.losses import (
        class_error,
        distillation_ce,
        distribution_ce,
        euclidean_loss,
        huber_loss,
        per_class_stats,
        softmax_ce,
    )

    logits = rng.randn(5, 8).astype(np.float32)
    target_logits = rng.randn(5, 8).astype(np.float32)
    labels = rng.randint(0, 8, 5)
    # pad to 8 by repeating the last row (pad_to_multiple convention)
    pad = lambda a: np.concatenate([a, np.repeat(a[-1:], 3, axis=0)], axis=0)
    w = np.array([1, 1, 1, 1, 1, 0, 0, 0], np.float32)
    plogits, ptargets, plabels = pad(logits), pad(target_logits), pad(labels)
    probs = np.abs(target_logits) + 0.1
    probs /= probs.sum(-1, keepdims=True)
    pprobs = pad(probs)

    cases = [
        (distillation_ce(jnp.asarray(plogits), jnp.asarray(ptargets), 2.0,
                         sample_weight=jnp.asarray(w)),
         distillation_ce(jnp.asarray(logits), jnp.asarray(target_logits), 2.0)),
        (distribution_ce(jnp.asarray(plogits), jnp.asarray(pprobs),
                         sample_weight=jnp.asarray(w)),
         distribution_ce(jnp.asarray(logits), jnp.asarray(probs))),
        (softmax_ce(jnp.asarray(plogits), jnp.asarray(plabels),
                    sample_weight=jnp.asarray(w)),
         softmax_ce(jnp.asarray(logits), jnp.asarray(labels))),
        (euclidean_loss(jnp.asarray(plogits), jnp.asarray(ptargets),
                        sample_weight=jnp.asarray(w)),
         euclidean_loss(jnp.asarray(logits), jnp.asarray(target_logits))),
        (huber_loss(jnp.asarray(plogits), jnp.asarray(ptargets),
                    sample_weight=jnp.asarray(w)),
         huber_loss(jnp.asarray(logits), jnp.asarray(target_logits))),
        (class_error(jnp.asarray(plogits), jnp.asarray(plabels),
                     sample_weight=jnp.asarray(w)),
         class_error(jnp.asarray(logits), jnp.asarray(labels))),
    ]
    for got, want in cases:
        np.testing.assert_allclose(float(got), float(want), rtol=1e-5)

    got_c, got_p = per_class_stats(jnp.asarray(plogits), jnp.asarray(plabels),
                                   8, sample_weight=jnp.asarray(w))
    want_c, want_p = per_class_stats(jnp.asarray(logits), jnp.asarray(labels), 8)
    np.testing.assert_allclose(np.asarray(got_c), np.asarray(want_c))
    np.testing.assert_allclose(np.asarray(got_p), np.asarray(want_p))


def test_euclidean_head_scaled_down_tenfold():
    """emoVoxZoo.m:140-144: for the euclidean loss the head params are
    divided by 10 on top of the 1e-4 scratch init."""
    from mcncrossmodalemotions_tpu.zoo import build_student

    default = build_student(tiny=True, with_frontend=False)
    euclid = build_student(tiny=True, with_frontend=False,
                           loss_type="euclidean")
    assert default.head_init_scale == pytest.approx(1e-4)
    assert euclid.head_init_scale == pytest.approx(1e-5)
    # pipeline path threads the scale through to the inner net
    pipe = build_student(tiny=True, loss_type="euclidean")
    assert pipe.head_init_scale == pytest.approx(1e-5)


def test_mini_epoch_ratio_scales_with_devices():
    """run_distillation.m:77: miniEpochRatio = 0.05 * numel(opts.gpus)."""
    from mcncrossmodalemotions_tpu.exp.run_distillation import mini_epoch_size

    assert mini_epoch_size(10000, 0.05, 1, 64) == 500
    assert mini_epoch_size(10000, 0.05, 4, 64) == 2000
    assert mini_epoch_size(10000, 0.05, 8, 64) == 4000
    # scaled ratio >= 1 -> full epochs
    assert mini_epoch_size(10000, 0.05, 32, 64) is None
    # floor at one batch
    assert mini_epoch_size(100, 0.05, 1, 64) == 64
