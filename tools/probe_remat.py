"""Measure jax.checkpoint/remat policies on the full student train step.

The step is HBM-bandwidth-bound (docs/PERF.md round-4 frontend study:
40.8 ms measured vs ~14 ms compute roofline; conv1/relu1 outputs alone
are 2x 1.17 GB bf16 at bs128), so remat — recompute cheap early
activations in the backward instead of storing+reloading them — trades
the binding resource (bytes) for the idle one (MXU at 35% MFU).

One policy per invocation (the tunnelled runtime measures the second
in-process config ~2x slow — SKILL.md trap):

  for p in none drop_conv1 drop_through_pool1 save_pools dots nothing; do
    python tools/probe_remat.py $p
  done

Prints step ms + utts/s + the compiled program's peak-memory estimate.
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from bench import _best_of, _sync  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from mcncrossmodalemotions_tpu.models.pipeline import AudioStudentPipeline
    from mcncrossmodalemotions_tpu.ops.spectrogram import DEFAULT_SPEC
    from mcncrossmodalemotions_tpu.train.state import (
        SGDConfig,
        TrainState,
        make_train_step,
    )
    from mcncrossmodalemotions_tpu.zoo import student_loss_fn

    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/mcncrossmodal_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    policy = sys.argv[1] if len(sys.argv) > 1 else "none"
    bs = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    crop = DEFAULT_SPEC.crop_samples(400)
    rng = np.random.RandomState(0)
    batch = {
        "data": jnp.asarray(rng.randn(bs, crop).astype(np.float32)),
        "logit_target": jnp.asarray(rng.randn(bs, 8).astype(np.float32) * 2),
        "max_label": jnp.asarray(rng.randint(0, 8, bs)),
    }
    model = AudioStudentPipeline()
    variables = model.init(jax.random.PRNGKey(0), batch["data"][:1])
    state = TrainState.create(variables, jax.random.PRNGKey(1))
    loss_fn = student_loss_fn("hot-cross-ent", temperature=2.0)
    step = jax.jit(make_train_step(model.apply, loss_fn,
                                   SGDConfig(weight_decay=0.0),
                                   remat_policy=policy),
                   donate_argnums=(0,))
    lowered = step.lower(state, batch, 1e-4)
    compiled = lowered.compile()
    try:
        mem = compiled.memory_analysis()
        peak = getattr(mem, "temp_size_in_bytes", None)
        argb = getattr(mem, "argument_size_in_bytes", 0)
    except Exception:
        peak, argb = None, 0

    st, mbox = [state], [None]

    def run():
        s, m = step(st[0], batch, 1e-4)
        st[0] = s
        mbox[0] = m

    sec = _best_of(run, lambda: _sync(mbox[0]["loss"]), iters=20)
    peak_s = f"{peak/1e9:.3f} GB temp" if peak is not None else "n/a"
    print(f"remat={policy} bs={bs}: {sec*1000:.3f} ms "
          f"({bs/sec:.1f} utts/s) | hbm: {peak_s} "
          f"(+{argb/1e9:.3f} GB args)")


if __name__ == "__main__":
    main()
