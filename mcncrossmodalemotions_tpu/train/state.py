"""Train state + jitted SGD-momentum step (cnn_train_dag's inner loop).

The reference's update rule (MatConvNet cnn_train_dag, invoked at
run_distillation.m:170-182 / ferplus_baselines.m:140-141):

    momentum <- m * momentum - lr * (grad + weight_decay * param)
    param    <- param + momentum

reproduced here as a pure jitted step over an explicit TrainState pytree.
Under a data mesh (parallel/mesh.py) the same step is pjit-compiled with
the batch sharded over the 'data' axis and params replicated; XLA inserts
the gradient psum over ICI — the TPU-native replacement for the MATLAB
ParameterServer ('tmove'/'mmap', run_distillation.m:88,181).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SGDConfig:
    """Optimizer hyperparameters (cnn_train_dag defaults)."""

    momentum: float = 0.9
    weight_decay: float = 5e-4


@flax.struct.dataclass
class TrainState:
    """Pure pytree training state: params, BN stats, momentum, bookkeeping."""

    params: Any
    model_state: Any  # {'batch_stats': ...} collections (empty dict if none)
    velocity: Any
    step: jax.Array
    rng: jax.Array

    @classmethod
    def create(cls, variables: Dict[str, Any], rng: jax.Array) -> "TrainState":
        params = variables["params"]
        model_state = {k: v for k, v in variables.items() if k != "params"}
        velocity = jax.tree.map(jnp.zeros_like, params)
        return cls(
            params=params,
            model_state=model_state,
            velocity=velocity,
            step=jnp.zeros((), jnp.int32),
            rng=rng,
        )

    @property
    def variables(self) -> Dict[str, Any]:
        return {"params": self.params, **self.model_state}


# A LossFn maps (model outputs, batch dict) -> (scalar loss, metrics dict).
LossFn = Callable[[Any, Dict[str, jax.Array]], Tuple[jax.Array, Dict[str, jax.Array]]]


def finetune_lr_scale_fn(head_names: Tuple[str, ...] = ("prediction",),
                         backbone_scale: float = 0.1) -> Callable:
    """Per-parameter LR multiplier function for fine-tuning.

    The reference trains all non-classifier params at a reduced rate
    (``finetuneLR``, ferPlusZoo.m:236-237; default 0.1,
    ferplus_baselines.m:74): head params get 1.0, everything else
    ``backbone_scale``. The returned function maps a parameter path
    (tuple of str) to its multiplier.
    """

    def scale(path: Tuple[str, ...]) -> float:
        return 1.0 if any(h in path for h in head_names) else backbone_scale

    return scale


def apply_sgd_update(state: TrainState, grads: Any, lr,
                     sgd: SGDConfig = SGDConfig(),
                     lr_scale_fn: Optional[Callable] = None):
    """MatConvNet SGD+momentum update on a TrainState's params/velocity.

    Shared by the standard train step and the fused online-distillation
    step (train/distill.py); returns (params, velocity).
    """

    def update(path, v, g, p):
        g = g.astype(jnp.float32)
        scale = 1.0
        if lr_scale_fn is not None:
            names = tuple(str(getattr(k, "key", k)) for k in path)
            scale = float(lr_scale_fn(names))
        return sgd.momentum * v - (lr * scale) * (g + sgd.weight_decay * p)

    velocity = jax.tree_util.tree_map_with_path(
        update, state.velocity, grads, state.params)
    params = jax.tree.map(lambda p, v: p + v, state.params, velocity)
    return params, velocity


def resolve_remat_policy(name: Optional[str]):
    """Map a remat-policy name to a ``jax.checkpoint`` policy (or None).

    The student model tags its block outputs with ``checkpoint_name``
    (models/vggm.py) so name-based policies can drop specific
    activations; policies here trade recompute FLOPs (MXU idle at 35%
    MFU) for HBM bytes (the step's binding resource — docs/PERF.md
    round-4 frontend study, round-5 remat study).

    - ``none``/None: no remat (save-everything default).
    - ``drop_conv1``: recompute the conv1+bn1+relu1 block in the
      backward instead of storing its two ~1.17 GB bf16 outputs.
    - ``drop_through_pool1``: additionally drop pool1's output.
    - ``save_pools``: keep ONLY the tagged pool/fc6 outputs; every
      untagged intermediate is recomputed.
    - ``dots``: jax's dots_with_no_batch_dims_saveable (matmul outputs
      kept; convs recomputed).
    - ``nothing``: full remat (classic sqrt-memory checkpointing).
    """
    if name is None or name == "none":
        return None
    cp = jax.checkpoint_policies
    policies = {
        "drop_conv1": cp.save_anything_except_these_names(
            "conv1_out", "relu1_out"),
        "drop_through_pool1": cp.save_anything_except_these_names(
            "conv1_out", "relu1_out", "pool1_out"),
        "save_pools": cp.save_only_these_names(
            "pool1_out", "pool2_out", "pool5_out", "fc6_out"),
        "dots": cp.dots_with_no_batch_dims_saveable,
        "nothing": cp.nothing_saveable,
    }
    if name not in policies:
        raise ValueError(f"unknown remat policy {name!r}; "
                         f"choose from {['none', *policies]}")
    return policies[name]


def make_train_step(apply_fn: Callable, loss_fn: LossFn,
                    sgd: SGDConfig = SGDConfig(),
                    has_batch_stats: bool = True,
                    rng_names: Tuple[str, ...] = (),
                    lr_scale_fn: Optional[Callable] = None,
                    remat_policy: Optional[str] = None,
                    pass_pad_mask: bool = False):
    """Build the jitted SGD+momentum train step.

    ``apply_fn(variables, data, train=..., mutable=..., rngs=...)`` is a
    Flax ``model.apply``; ``loss_fn`` computes loss+metrics from outputs.
    ``rng_names`` lists the stochastic streams the model consumes in train
    mode (e.g. ('dropout',), ('augment',)). Returns
    ``step(state, batch, lr) -> (state, metrics)``; ``lr`` is a scalar so
    per-epoch LR arrays (run_distillation.m:82 ``logspace(-4,-5,300)``)
    need no recompilation.

    ``remat_policy`` (see :func:`resolve_remat_policy`) wraps the loss
    computation in ``jax.checkpoint`` so the backward recomputes rather
    than stores the selected activations — numerically identical (same
    deterministic ops re-run), measured on-chip in docs/PERF.md.

    ``pass_pad_mask`` forwards ``batch['pad_mask']`` (when present) to
    the model so train-mode BatchNorm statistics exclude mesh-padding
    rows exactly (models/vggm.py) — the caller must guarantee the model
    accepts a ``pad_mask`` kwarg (Trainer auto-detects via signature).
    """
    policy = resolve_remat_policy(remat_policy)

    def step(state: TrainState, batch: Dict[str, jax.Array], lr) -> Tuple[TrainState, Dict]:
        rng, step_rng = jax.random.split(state.rng)
        apply_kwargs = {}
        if rng_names:
            keys = jax.random.split(step_rng, len(rng_names))
            apply_kwargs["rngs"] = dict(zip(rng_names, keys))
        if pass_pad_mask and "pad_mask" in batch:
            apply_kwargs["pad_mask"] = batch["pad_mask"]

        def compute(params):
            if has_batch_stats:
                outputs, mutated = apply_fn(
                    {"params": params, **state.model_state},
                    batch["data"],
                    train=True,
                    mutable=["batch_stats"],
                    **apply_kwargs,
                )
                # merge, don't replace: apply() returns ONLY the mutable
                # collections, so a wholesale replace would silently drop
                # any other collection the model carries after one step
                new_model_state = {**state.model_state, **mutated}
            else:
                outputs = apply_fn({"params": params}, batch["data"], train=True,
                                   **apply_kwargs)
                new_model_state = state.model_state
            loss, metrics = loss_fn(outputs, batch)
            return loss, (metrics, new_model_state)

        fn = compute if policy is None else jax.checkpoint(
            compute, policy=policy)
        (loss, (metrics, new_model_state)), grads = jax.value_and_grad(
            fn, has_aux=True
        )(state.params)

        params, velocity = apply_sgd_update(state, grads, lr, sgd,
                                            lr_scale_fn)
        metrics = dict(metrics, loss=loss)
        new_state = state.replace(
            params=params,
            model_state=new_model_state,
            velocity=velocity,
            step=state.step + 1,
            rng=rng,
        )
        return new_state, metrics

    return step


def make_eval_step(apply_fn: Callable, loss_fn: LossFn):
    """Build the jitted eval step: forward in test mode + metrics."""

    def step(state: TrainState, batch: Dict[str, jax.Array]):
        outputs = apply_fn(state.variables, batch["data"], train=False)
        loss, metrics = loss_fn(outputs, batch)
        return dict(metrics, loss=loss)

    return step
