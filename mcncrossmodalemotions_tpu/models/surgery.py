"""Model surgery on variable trees (the DagNN graph-surgery equivalent).

The reference mutates loaded DAGs: strip loss layers, resize + re-init
the final classifier, rename vars, retune pooling (emoVoxZoo.m
prepareFromDagNN :187-253, ferPlusZoo.m :136-199). In a functional
framework the graph is static — models are rebuilt from config — so
surgery reduces to operations on *variable trees*: re-initialising or
resizing the head of imported/pretrained params while keeping the
backbone. Pooling retuning is config (masked temporal pool), and loss
stacks are attached by the zoo, so neither needs surgery here.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def reinit_head(variables: Dict[str, Any], num_outputs: int,
                rng: jax.Array, scale: float = 1e-4,
                head_name: str = "prediction") -> Dict[str, Any]:
    """Fresh head of ``num_outputs`` units, normal(scale) init, zero bias.

    The reference's scratch path resizes the final conv to
    [1 1 C numOutputs] and re-initialises with a pinned RNG at scale 1e-4
    (emoVoxZoo.m:210-243; teachers use 1/100, ferPlusZoo.m:136-199).
    Works on any imported or trained variable tree; returns a new tree.
    """
    head = variables["params"][head_name]
    kernel = np.asarray(head["kernel"])
    in_features = kernel.shape[-2] if kernel.ndim > 1 else kernel.shape[0]
    # Preserve the head kernel's RANK: a conv head keeps its leading
    # spatial axes ([1, 1, C, N], the reference's resized final conv),
    # a Dense head stays [C, N] — a rank change would make the rebuilt
    # tree unusable by the model that produced it.
    shape = kernel.shape[:-2] + (in_features, num_outputs) \
        if kernel.ndim > 1 else (in_features, num_outputs)
    new_kernel = scale * jax.random.normal(rng, shape, jnp.float32)
    new_head = dict(head)
    new_head["kernel"] = new_kernel
    if "bias" in head:
        new_head["bias"] = jnp.zeros((num_outputs,), jnp.float32)
    params = dict(variables["params"])
    params[head_name] = new_head
    return {**variables, "params": params}


def transplant_backbone(target: Dict[str, Any], source: Dict[str, Any],
                        skip: Sequence[str] = ("prediction",)) -> Dict[str, Any]:
    """Copy every collection/leaf from ``source`` into ``target`` except
    the modules named in ``skip`` (shape-checked).

    The fine-tune pattern: pretrained backbone + fresh task head.
    """
    import flax.traverse_util as tu

    flat_t = tu.flatten_dict(target)
    flat_s = tu.flatten_dict(source)
    out = dict(flat_t)
    for path, value in flat_s.items():
        if any(name in path for name in skip):
            continue
        if path in flat_t:
            expect = np.shape(flat_t[path])
            got = np.shape(value)
            if expect != got:
                raise ValueError(
                    f"shape mismatch at {'/'.join(map(str, path))}: "
                    f"{got} vs {expect}"
                )
            out[path] = value
    return tu.unflatten_dict(out)


def strip_collections(variables: Dict[str, Any],
                      keep: Sequence[str] = ("params", "batch_stats")):
    """Drop auxiliary collections (the strip-loss-layers analogue)."""
    return {k: v for k, v in variables.items() if k in keep}
