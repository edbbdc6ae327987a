"""Ablation timing of the distillation train step on the real chip.

Times the full step and component variants (frontend, fwd-only, grads,
no-BN, avg-pool-for-max-pool, per-layer conv stacks) to locate the
non-MXU time that holds MFU at ~35% (VERDICT round-1 item 2).

Usage: python tools/profile_train_step.py [--quick]
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from bench import _best_of, _sync  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from mcncrossmodalemotions_tpu.models.pipeline import AudioStudentPipeline
    from mcncrossmodalemotions_tpu.models.vggm import VGGMStudent
    from mcncrossmodalemotions_tpu.ops.spectrogram import (
        DEFAULT_SPEC,
        instance_norm,
        spectrogram,
    )
    from mcncrossmodalemotions_tpu.train.state import (
        SGDConfig,
        TrainState,
        make_train_step,
    )
    from mcncrossmodalemotions_tpu.zoo import build_student, student_loss_fn

    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/mcncrossmodal_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    bs = 128
    crop = DEFAULT_SPEC.crop_samples(400)
    rng = np.random.RandomState(0)
    wave = jnp.asarray(rng.randn(bs, crop).astype(np.float32))
    batch = {
        "data": wave,
        "logit_target": jnp.asarray(rng.randn(bs, 8).astype(np.float32) * 2),
        "max_label": jnp.asarray(rng.randint(0, 8, bs)),
    }
    loss_fn = student_loss_fn("hot-cross-ent", temperature=2.0)

    results = {}

    def timeit(name, fn, sync, iters=20):
        sec = _best_of(fn, sync, iters=iters)
        results[name] = sec * 1000
        print(f"{name:40s} {sec*1000:8.3f} ms   ({bs/sec:9.1f} utts/s)",
              flush=True)
        return sec

    # --- baseline: full train step ---
    def make_step(model, b):
        variables = model.init(jax.random.PRNGKey(0), b["data"][:1])
        state = TrainState.create(variables, jax.random.PRNGKey(1))
        step = jax.jit(make_train_step(model.apply, loss_fn,
                                       SGDConfig(weight_decay=0.0)),
                       donate_argnums=(0,))
        st, mbox = [state], [None]

        def run():
            s, m = step(st[0], b, 1e-4)
            st[0] = s
            mbox[0] = m

        return run, (lambda: _sync(mbox[0]["loss"]))

    run, sync = make_step(build_student("emovoxceleb-student"), batch)
    timeit("full train step", run, sync)

    # --- frontend alone ---
    fe = jax.jit(lambda x: instance_norm(spectrogram(x, DEFAULT_SPEC)))
    out = [None]

    def run_fe():
        out[0] = fe(wave)

    timeit("frontend (spectrogram+instnorm)", run_fe,
           lambda: _sync(out[0].sum()))

    # --- step on precomputed spectrogram (no frontend in graph) ---
    spec_in = jax.device_get(fe(wave))[..., None]
    batch_spec = dict(batch, data=jnp.asarray(spec_in))
    run, sync = make_step(VGGMStudent(), batch_spec)
    timeit("train step, precomputed spec", run, sync)

    # --- forward only (train=True stats skipped: use train=False fwd) ---
    model = VGGMStudent()
    variables = model.init(jax.random.PRNGKey(0), batch_spec["data"][:1])
    fwd = jax.jit(lambda v, a: model.apply(v, a, train=False))
    o2 = [None]

    def run_fwd():
        o2[0] = fwd(variables, batch_spec["data"])

    timeit("forward only (test mode)", run_fwd, lambda: _sync(o2[0].sum()))

    # --- value_and_grad without update ---
    def loss_only(params, bstats, b):
        out, _ = model.apply(
            {"params": params, "batch_stats": bstats}, b["data"], train=True,
            mutable=["batch_stats"])
        return loss_fn(out, b)[0]

    vg = jax.jit(jax.value_and_grad(lambda p: loss_only(
        p, variables["batch_stats"], batch_spec)))
    o3 = [None]

    def run_vg():
        o3[0] = vg(variables["params"])[0]

    timeit("value_and_grad (no SGD update)", run_vg, lambda: _sync(o3[0]))

    # --- no batchnorm ---
    run, sync = make_step(VGGMStudent(use_batchnorm=False), batch_spec)
    timeit("train step, no batchnorm", run, sync)

    if "--quick" in sys.argv:
        return

    # --- avg-pool in place of max-pool (pool bwd cost probe) ---
    import flax.linen as nn
    real_max_pool = nn.max_pool
    try:
        import mcncrossmodalemotions_tpu.models.vggm as vggm_mod
        vggm_mod.nn.max_pool = nn.avg_pool
        run, sync = make_step(VGGMStudent(), batch_spec)
        timeit("train step, avg-pool for max-pool", run, sync)
    finally:
        vggm_mod.nn.max_pool = real_max_pool

    # --- per-stage fwd+bwd cost: truncated stacks ---
    class Trunc(nn.Module):
        n_convs: int = 1

        @nn.compact
        def __call__(self, x, train=True):
            x = x.astype(jnp.bfloat16)
            x = nn.Conv(96, (7, 7), strides=(2, 2), padding="VALID",
                        use_bias=False, dtype=jnp.bfloat16, name="conv1")(x)
            x = nn.BatchNorm(use_running_average=not train,
                             dtype=jnp.bfloat16, name="bn1")(x)
            x = nn.relu(x)
            x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")
            if self.n_convs >= 2:
                x = nn.Conv(256, (5, 5), strides=(2, 2), padding="VALID",
                            use_bias=False, dtype=jnp.bfloat16,
                            name="conv2")(x)
                x = nn.BatchNorm(use_running_average=not train,
                                 dtype=jnp.bfloat16, name="bn2")(x)
                x = nn.relu(x)
                x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")
            return jnp.mean(x.astype(jnp.float32))

    for n in (1, 2):
        m = Trunc(n_convs=n)
        v = m.init(jax.random.PRNGKey(0), batch_spec["data"][:1])
        g = jax.jit(jax.grad(lambda p: m.apply(
            {"params": p, "batch_stats": v["batch_stats"]},
            batch_spec["data"], mutable=["batch_stats"])[0]))
        o4 = [None]

        def run_g():
            o4[0] = g(v["params"])

        timeit(f"conv1..conv{n} (+pool/bn) fwd+bwd", run_g,
               lambda: _sync(jax.tree_util.tree_leaves(o4[0])[0].sum()))

    print("\nsummary (ms):")
    for k, v in results.items():
        print(f"  {k}: {v:.3f}")


if __name__ == "__main__":
    main()
