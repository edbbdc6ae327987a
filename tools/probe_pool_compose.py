"""Probe: 3x3/s2 max pool as a 2x2s1 -> 2x2s2 composition.

Max is associative, so max over the 3x3 window at stride 2 equals a
2x2/s1 max pool followed by a 2x2/s2 max pool EXACTLY (window algebra:
2x2s2 over m[i,j]=max(x[i:i+2, j:j+2]) covers x[2i:2i+3, 2j:2j+3]).
The composition replaces one overlapping reduce_window (whose backward
is the expensive SelectAndScatter, docs/PERF.md round-3 pool study)
with an overlapping-but-stride-1 pool plus a NON-overlapping pool whose
scatter is a pure block write.

Numerics note: the forward is bit-exact; the backward routes each
window's gradient to a single argmax like SelectAndScatter, but TIES
can route differently (composition picks the 2x2-stage winner first).
Ties between float activations are measure-zero post-conv; parity is
asserted on random inputs where ties do not occur.

Run on the real chip (no JAX_PLATFORMS override):
    python tools/probe_pool_compose.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def timeit(fn, *args, iters=10):
    out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0].sum())
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.device_get(jax.tree.leaves(out)[0].sum())
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


def main():
    shape = (128, 253, 197, 96)  # pool1 input at train bs128
    x = jnp.asarray(np.random.RandomState(0).randn(*shape), jnp.bfloat16)

    def direct(x):
        return nn.max_pool(x, (3, 3), strides=(2, 2))

    def composed(x):
        m = nn.max_pool(x, (2, 2), strides=(1, 1))
        return nn.max_pool(m, (2, 2), strides=(2, 2))

    # forward parity (on-device compare; scalar off-device)
    yd = jax.jit(direct)(x)
    yc = jax.jit(composed)(x)
    diff = float(jax.device_get(jnp.abs(yd.astype(jnp.float32)
                                        - yc.astype(jnp.float32)).max()))
    print(f"shapes {yd.shape} vs {yc.shape}; fwd max|diff| = {diff}")

    # DCE-proof fwd+bwd: return both y-sum and grad
    def fb(pool):
        def loss(x):
            y = pool(x)
            return (y.astype(jnp.float32) ** 2).sum()

        g = jax.value_and_grad(loss)
        return jax.jit(lambda x: g(x))

    for name, pool in [("direct 3x3s2", direct), ("2x2s1+2x2s2", composed)]:
        f = jax.jit(pool)
        t_f = timeit(f, x)
        t_fb = timeit(fb(pool), x)
        print(f"{name:14s} fwd {t_f:6.2f} ms   fwd+bwd {t_fb:6.2f} ms")


if __name__ == "__main__":
    main()
