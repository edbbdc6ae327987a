"""A/B the masked-BN train step cost at the bench shape (bs128, 4 s).

The Trainer now forwards pad_mask to models that accept it, so every
train-mode BatchNorm computes where-masked statistics (exact on ragged
padded batches, all-ones mask otherwise). This probes what that costs
on the headline step. One variant per process (SKILL.md A/B trap):

  python tools/probe_masked_bn.py baseline
  python tools/probe_masked_bn.py masked
"""

import sys
import time

import numpy as np


def main(variant: str):
    import jax
    import jax.numpy as jnp

    from mcncrossmodalemotions_tpu.ops.spectrogram import DEFAULT_SPEC
    from mcncrossmodalemotions_tpu.train.state import (
        SGDConfig,
        TrainState,
        make_train_step,
    )
    from mcncrossmodalemotions_tpu.zoo import build_student, student_loss_fn

    batch_size = 128
    crop = DEFAULT_SPEC.crop_samples(400)
    rng = np.random.RandomState(0)
    batch = {
        "data": jnp.asarray(rng.randn(batch_size, crop).astype(np.float32)),
        "logit_target": jnp.asarray(
            rng.randn(batch_size, 8).astype(np.float32) * 2),
        "max_label": jnp.asarray(rng.randint(0, 8, batch_size)),
    }
    if variant == "masked":
        batch["pad_mask"] = jnp.ones(batch_size, jnp.float32)
    model = build_student("emovoxceleb-student")
    variables = model.init(jax.random.PRNGKey(0), batch["data"][:1])
    state = TrainState.create(variables, jax.random.PRNGKey(1))
    loss_fn = student_loss_fn("hot-cross-ent", temperature=2.0)
    step = jax.jit(
        make_train_step(model.apply, loss_fn, SGDConfig(weight_decay=0.0),
                        pass_pad_mask=(variant == "masked")),
        donate_argnums=(0,))

    def sync(v):
        return jax.device_get(v)

    metrics = None
    for _ in range(3):  # warm compile + steady state
        state, metrics = step(state, batch, 1e-4)
    sync(metrics["loss"])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(20):
            state, metrics = step(state, batch, 1e-4)
        sync(metrics["loss"])
        best = min(best, (time.perf_counter() - t0) / 20)
    print(f"{variant}: {best * 1000:.2f} ms/step "
          f"({batch_size / best:.0f} utts/s)")


if __name__ == "__main__":
    main(sys.argv[1])
