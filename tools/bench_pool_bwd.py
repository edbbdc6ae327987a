"""On-chip numerics + honest speed of ops/pallas_pool.max_pool_3x3s2 vs
XLA's reduce_window/SelectAndScatter at the student's pool shapes.

"Honest" = the fwd+bwd jit returns BOTH y and grad; a grad-only jit
lets XLA DCE the forward and silently times only the backward (the
round-2 decomposition error — docs/PERF.md round-3 study).
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from bench import _best_of, _sync  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from mcncrossmodalemotions_tpu.ops.pallas_pool import (
        _pool_fwd_raw,
        max_pool_3x3s2,
    )

    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/mcncrossmodal_jax_cache")

    # numerics: bit-exact forward, identical gradient (no-ties input)
    for shape in ((2, 21, 19, 96), (2, 34, 46, 8), (128, 253, 197, 96)):
        x = jax.jit(lambda k, s=shape: jax.random.normal(
            k, s, jnp.bfloat16))(jax.random.PRNGKey(0))
        want = np.asarray(jax.device_get(jax.jit(_pool_fwd_raw)(x)),
                          np.float32)
        got = np.asarray(jax.device_get(
            jax.jit(lambda a: max_pool_3x3s2(a))(x)), np.float32)
        print(shape, "fwd exact=", np.array_equal(got, want), flush=True)
    x = jax.jit(lambda k: jax.random.normal(
        k, (2, 33, 35, 8), jnp.float32))(jax.random.PRNGKey(1))
    g1 = jax.jit(jax.grad(lambda a: jnp.sum(_pool_fwd_raw(a) ** 2)))(x)
    g2 = jax.jit(jax.grad(lambda a: jnp.sum(max_pool_3x3s2(a) ** 2)))(x)
    print("grad exact=", np.array_equal(
        np.asarray(jax.device_get(g1)), np.asarray(jax.device_get(g2))),
        flush=True)

    for name, shape in (("pool1", (128, 253, 197, 96)),
                        ("pool2", (128, 61, 47, 256))):
        hout, wout = (shape[1] - 3) // 2 + 1, (shape[2] - 3) // 2 + 1
        mk = jax.jit(lambda k, s=shape, h=hout, w=wout: (
            jax.random.normal(k, s, jnp.bfloat16),
            jax.random.normal(jax.random.fold_in(k, 1),
                              (s[0], h, w, s[3]), jnp.bfloat16)))
        xb, dy = mk(jax.random.PRNGKey(0))
        for label, fn in (("xla   ", _pool_fwd_raw),
                          ("pallas", lambda a: max_pool_3x3s2(a))):
            f = jax.jit(fn)
            out = [None]

            def runf():
                out[0] = f(xb)

            sec = _best_of(runf, lambda: _sync(
                out[0].astype(jnp.float32).sum()), iters=10)
            print(f"{name} {label} fwd only:         {sec*1000:7.3f} ms",
                  flush=True)

            def both(a, d, fn=fn):
                y, vjp = jax.vjp(fn, a)
                return y.astype(jnp.float32).sum(), vjp(d)[0]

            g = jax.jit(both)
            out2 = [None]

            def rung():
                out2[0] = g(xb, dy)

            sec = _best_of(rung, lambda: _sync(
                out2[0][0] + out2[0][1].astype(jnp.float32).sum()), iters=10)
            print(f"{name} {label} fwd+bwd (no DCE): {sec*1000:7.3f} ms",
                  flush=True)


if __name__ == "__main__":
    main()
