"""A/B the full train step: plain conv1 vs space-to-depth conv1.

One config per invocation (the tunnelled runtime measures the second
in-process config ~2x slow — SKILL.md trap): run
  python tools/ab_step_conv1.py plain
  python tools/ab_step_conv1.py s2d
in separate processes and compare the printed ms.
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

    s2d = sys.argv[1] == "s2d" if len(sys.argv) > 1 else True
    bs = 128
    crop = DEFAULT_SPEC.crop_samples(400)
    rng = np.random.RandomState(0)
    batch = {
        "data": jnp.asarray(rng.randn(bs, crop).astype(np.float32)),
        "logit_target": jnp.asarray(rng.randn(bs, 8).astype(np.float32) * 2),
        "max_label": jnp.asarray(rng.randint(0, 8, bs)),
    }
    model = AudioStudentPipeline(conv1_s2d=s2d)
    variables = model.init(jax.random.PRNGKey(0), batch["data"][:1])
    state = TrainState.create(variables, jax.random.PRNGKey(1))
    loss_fn = student_loss_fn("hot-cross-ent", temperature=2.0)
    step = jax.jit(make_train_step(model.apply, loss_fn,
                                   SGDConfig(weight_decay=0.0)),
                   donate_argnums=(0,))
    st, mbox = [state], [None]

    def run():
        s, m = step(st[0], batch, 1e-4)
        st[0] = s
        mbox[0] = m

    sec = _best_of(run, lambda: _sync(mbox[0]["loss"]), iters=20)
    print(f"conv1={'s2d' if s2d else 'plain'}: {sec*1000:.3f} ms "
          f"({bs/sec:.1f} utts/s)")


if __name__ == "__main__":
    main()
