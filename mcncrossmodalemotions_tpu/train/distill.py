"""Online (fused) distillation: teacher forward inside the student step.

The reference runs distillation in two offline phases: dense teacher
inference writes wavLogits to disk (fetch_emovoxceleb_imdb.m:119-136),
then student training consumes the cached logits
(getBatchEmoVoxCeleb.m:179-188). That offline mode is fully supported
(exp/run_distillation.py); this module adds the fused mode the TPU makes
natural (SURVEY.md section 7 "teacher/student co-scheduling"): the frozen
teacher's forward over the crop's face frames and the student's
forward+backward+update compile into ONE XLA program, so teacher
inference rides the same accelerator step with no host round-trip and
XLA overlaps the two networks' compute.

Per-crop logit aggregation matches the offline path: teacher logits over
the K frames sampled from the crop window are reduced by max/mean
(getBatchEmoVoxCeleb.m:179-185) before the distillation loss.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from mcncrossmodalemotions_tpu.train.state import (
    SGDConfig,
    TrainState,
    make_train_step,
)
from mcncrossmodalemotions_tpu.zoo.registry import student_loss_fn


def aggregate_frame_logits(logits: jax.Array, aggregator: str) -> jax.Array:
    """[B, K, C] per-frame teacher logits -> [B, C] crop targets."""
    if aggregator == "max":
        return jnp.max(logits, axis=1)
    if aggregator == "mean":
        return jnp.mean(logits, axis=1)
    raise ValueError(f"unknown aggregator {aggregator!r}")


def make_online_distill_step(student_apply: Callable,
                             teacher_apply: Callable,
                             teacher_variables: Dict[str, Any],
                             loss_type: str = "hot-cross-ent",
                             temperature: float = 2.0,
                             aggregator: str = "max",
                             num_classes: int = 8,
                             sgd: SGDConfig = SGDConfig(weight_decay=0.0),
                             rng_names: Tuple[str, ...] = (),
                             remat_policy: Optional[str] = None,
                             pass_pad_mask: bool = False):
    """Fused step: batch = {'data': [B, N] waveforms,
    'frames': [B, K, H, W, 1] face frames}. Teacher is frozen (its
    variables are closed over and receive no gradient); targets are
    computed in-graph and fed to the standard student loss stack.
    ``pass_pad_mask`` as in :func:`make_train_step` (exact BN stats on
    ragged padded batches; the student model must accept the kwarg).
    """
    loss_fn = student_loss_fn(loss_type, temperature=temperature,
                              num_classes=num_classes)
    # ONE step body: the rng/value_and_grad/SGD/state plumbing lives in
    # make_train_step; this wrapper only computes the in-graph teacher
    # targets and assembles the inner batch, so fixes to the standard
    # step cannot diverge from the fused step.
    inner_step = make_train_step(student_apply, loss_fn, sgd,
                                 has_batch_stats=True,
                                 rng_names=tuple(rng_names),
                                 remat_policy=remat_policy,
                                 pass_pad_mask=pass_pad_mask)

    def step(state: TrainState, batch: Dict[str, jax.Array], lr):
        frames = batch["frames"]
        b, k = frames.shape[:2]
        flat = frames.reshape((b * k,) + frames.shape[2:])
        teacher_logits = teacher_apply(teacher_variables, flat, train=False)
        teacher_logits = jax.lax.stop_gradient(
            teacher_logits.reshape(b, k, -1)[..., :num_classes]
        )
        target = aggregate_frame_logits(teacher_logits, aggregator)
        inner_batch = {
            "data": batch["data"],
            "logit_target": target,
            "max_label": jnp.argmax(target, axis=-1),
            "instance_weights": jnp.ones_like(target),
        }
        if "pad_mask" in batch:  # exclude mesh-padding rows exactly
            inner_batch["pad_mask"] = batch["pad_mask"]
        return inner_step(state, inner_batch, lr)

    return step
