"""Pure-JAX loss/metric library (mcnExtraLayers equivalents).

Reimplements the loss stack the reference attaches in its model zoos
(emoVoxZoo.m:137-169, ferPlusZoo.m:239-255) and the metric layers
(`ErrorStats`, `VerboseLoss classerror`, `vl_nnsoftmaxt`):

- ``distillation_ce``      SoftmaxCELoss(temperature, logitTargets=true):
                           the 'hot-cross-ent' distillation loss.
- ``distribution_ce``      SoftmaxCELoss with probability targets — the
                           teacher's 'distributions' vote-distribution loss.
- ``softmax_ce``           one-hot 'softmaxlog' classification loss.
- ``euclidean_loss``       dagnn.EuclideanLoss on logits (with optional
                           instance weights; params scaled by the caller).
- ``huber_loss``           dagnn.HuberLoss(sigma).
- ``class_error``          'classerror' top-1 error metric.
- ``per_class_stats``      ErrorStats: per-class accuracy + population.
- ``softmax_t``            vl_nnsoftmaxt: softmax with temperature over a
                           chosen axis (student_stats.m:95).

All functions are batch-mean reductions unless stated, match the MATLAB
semantics, and are jit/grad-safe.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def softmax_t(logits: jax.Array, temperature: float = 1.0, axis: int = -1) -> jax.Array:
    """Temperature softmax (vl_nnsoftmaxt equivalent)."""
    return jax.nn.softmax(logits / temperature, axis=axis)


def _wmean(per_row: jax.Array, sample_weight: Optional[jax.Array]) -> jax.Array:
    """Mean of per-row loss terms, optionally weighted by [B] weights.

    ``sample_weight`` exists so mesh-padded rows (duplicated samples that
    make a ragged final batch shard evenly, parallel/mesh.pad_to_multiple)
    can be excluded EXACTLY from losses and metrics with weight 0.
    """
    if sample_weight is None:
        return jnp.mean(per_row)
    w = sample_weight.astype(per_row.dtype)
    return jnp.sum(per_row * w) / jnp.maximum(jnp.sum(w), 1.0)


def log_softmax_t(logits: jax.Array, temperature: float = 1.0, axis: int = -1) -> jax.Array:
    return jax.nn.log_softmax(logits / temperature, axis=axis)


def distillation_ce(student_logits: jax.Array, teacher_logits: jax.Array,
                    temperature: float = 2.0,
                    sample_weight: Optional[jax.Array] = None) -> jax.Array:
    """Temperature cross-entropy with *logit* targets ('hot-cross-ent').

    loss = -sum softmax(teacher/T) * log_softmax(student/T), mean over batch.
    The reference's SoftmaxCELoss(temperature=2, logitTargets=true)
    (emoVoxZoo.m:137-157, run_distillation.m:84-87). Matches the MATLAB
    convention of not rescaling by T^2; the LR schedule absorbs the scale.
    """
    targets = jax.nn.softmax(teacher_logits / temperature, axis=-1)
    logp = jax.nn.log_softmax(student_logits / temperature, axis=-1)
    return -_wmean(jnp.sum(targets * logp, axis=-1), sample_weight)


def distribution_ce(logits: jax.Array, target_probs: jax.Array,
                    sample_weight: Optional[jax.Array] = None) -> jax.Array:
    """Cross-entropy against probability-distribution targets.

    The teacher's 'distributions' loss against FERPlus rater-vote
    distributions (ferPlusZoo.m:239-255, ferplus_baselines.m:167-172).
    """
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -_wmean(jnp.sum(target_probs * logp, axis=-1), sample_weight)


def softmax_ce(logits: jax.Array, labels: jax.Array,
               sample_weight: Optional[jax.Array] = None) -> jax.Array:
    """One-hot cross-entropy ('softmaxlog'); ``labels`` are int class ids."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    per_row = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    return _wmean(per_row, sample_weight)


def euclidean_loss(pred: jax.Array, target: jax.Array,
                   instance_weights: Optional[jax.Array] = None,
                   sample_weight: Optional[jax.Array] = None) -> jax.Array:
    """Squared-L2 regression on logits (dagnn.EuclideanLoss).

    MATLAB convention: 0.5 * sum-of-squares per sample, mean over batch;
    optional per-element instance weights (emoVoxZoo.m:138-144,
    getBatchEmoVoxCeleb.m:28-44 emit instanceWeights for this loss).
    """
    diff = pred - target
    sq = diff * diff
    if instance_weights is not None:
        sq = sq * instance_weights
    return 0.5 * _wmean(jnp.sum(sq, axis=-1), sample_weight)


def huber_loss(pred: jax.Array, target: jax.Array, sigma: float = 1.0,
               instance_weights: Optional[jax.Array] = None,
               sample_weight: Optional[jax.Array] = None) -> jax.Array:
    """Huber regression loss (dagnn.HuberLoss(sigma=1), emoVoxZoo.m:145-148).

    Elementwise: 0.5*(sigma*d)^2 for |d| < 1/sigma^2 else |d| - 0.5/sigma^2.
    The reference's huber stack takes the same per-element
    ``instanceWeights`` input the euclidean stack does
    (emoVoxZoo.m:145-148, inputs {prediction, logitTarget,
    instanceWeights}).
    """
    d = pred - target
    abs_d = jnp.abs(d)
    quad = 0.5 * (sigma * d) ** 2
    lin = abs_d - 0.5 / (sigma ** 2)
    per_elem = jnp.where(abs_d < 1.0 / (sigma ** 2), quad, lin)
    if instance_weights is not None:
        per_elem = per_elem * instance_weights
    return _wmean(jnp.sum(per_elem, axis=-1), sample_weight)


def class_error(logits: jax.Array, labels: jax.Array,
                sample_weight: Optional[jax.Array] = None) -> jax.Array:
    """Top-1 classification error in [0, 1] ('classerror' metric)."""
    pred = jnp.argmax(logits, axis=-1)
    return _wmean((pred != labels).astype(jnp.float32), sample_weight)


def per_class_stats(logits: jax.Array, labels: jax.Array, num_classes: int,
                    sample_weight: Optional[jax.Array] = None):
    """ErrorStats equivalent: per-class correct counts and populations.

    Returns (correct[num_classes], population[num_classes]); the training
    engine accumulates these across batches and derives per-class accuracy
    and class-population shares (run_distillation.m:186-207).
    """
    pred = jnp.argmax(logits, axis=-1)
    one_hot = jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)
    if sample_weight is not None:
        one_hot = one_hot * sample_weight[:, None].astype(jnp.float32)
    correct = one_hot * (pred == labels)[:, None].astype(jnp.float32)
    return jnp.sum(correct, axis=0), jnp.sum(one_hot, axis=0)

