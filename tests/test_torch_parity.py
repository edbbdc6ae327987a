"""Independent loss parity vs torch.nn.functional (CPU)."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from mcncrossmodalemotions_tpu.losses import (  # noqa: E402
    distillation_ce,
    distribution_ce,
    huber_loss,
    softmax_ce,
)


def _t(a):
    return torch.from_numpy(np.asarray(a, np.float64))


def test_softmax_ce_matches_torch_cross_entropy(rng):
    logits = rng.randn(6, 8).astype(np.float32) * 3
    labels = rng.randint(0, 8, 6)
    ours = float(softmax_ce(jnp.asarray(logits), jnp.asarray(labels)))
    ref = float(F.cross_entropy(_t(logits), torch.from_numpy(labels)))
    assert abs(ours - ref) < 1e-5


def test_distribution_ce_matches_torch_soft_cross_entropy(rng):
    logits = rng.randn(5, 8).astype(np.float32) * 2
    probs = rng.rand(5, 8).astype(np.float32)
    probs /= probs.sum(1, keepdims=True)
    ours = float(distribution_ce(jnp.asarray(logits), jnp.asarray(probs)))
    ref = float(F.cross_entropy(_t(logits), _t(probs)))
    assert abs(ours - ref) < 1e-5


def test_distillation_ce_matches_torch_formulation(rng):
    s = rng.randn(4, 8).astype(np.float32) * 2
    t = rng.randn(4, 8).astype(np.float32) * 2
    T = 2.0
    ours = float(distillation_ce(jnp.asarray(s), jnp.asarray(t),
                                 temperature=T))
    # -sum softmax(t/T) log_softmax(s/T), mean over batch (no T^2 —
    # the MATLAB SoftmaxCELoss convention, emoVoxZoo.m:137-157)
    ref = float(F.cross_entropy(_t(s) / T, F.softmax(_t(t) / T, dim=-1)))
    assert abs(ours - ref) < 1e-5


def test_huber_matches_torch_smooth_l1(rng):
    """sigma=1 huber == torch smooth_l1 with beta=1 (x0.5/sum-mean
    bookkeeping matched to the MATLAB per-sample convention)."""
    p = rng.randn(4, 8).astype(np.float32) * 2
    t = rng.randn(4, 8).astype(np.float32) * 2
    ours = float(huber_loss(jnp.asarray(p), jnp.asarray(t), sigma=1.0))
    per_elt = F.smooth_l1_loss(_t(p), _t(t), reduction="none", beta=1.0)
    ref = float(per_elt.sum(dim=-1).mean())  # sum per sample, mean batch
    assert abs(ours - ref) < 1e-5
