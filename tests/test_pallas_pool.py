"""Pallas max-pool forward + S&S backward: numerics parity.

The kernel is bit-exact vs reduce_window but measured slower than
XLA's lowering on v5e (docs/PERF.md round-3 study), so the models keep
nn.max_pool; these tests pin its numerics so it stays ready to wire if
a Mosaic upgrade changes the economics. The oracle comparison uses
continuous inputs (measure-zero ties), where distribute-to-ties and
XLA's one-winner semantics coincide.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mcncrossmodalemotions_tpu.ops.pallas_pool import (
    max_pool_3x3s2,
    reference_pool_grad,
)


@pytest.mark.parametrize("shape", [(2, 11, 9, 4), (1, 33, 35, 8),
                                   (2, 69, 37, 8)])
def test_pallas_pool_grad_matches_oracle(shape, rng):
    """Gradient == the distribute-to-all-ties oracle, including odd
    dims, uncovered tail rows/cols, and partial final tiles."""
    x = rng.randn(*shape).astype(np.float32)
    dy_shape = (shape[0], (shape[1] - 3) // 2 + 1,
                (shape[2] - 3) // 2 + 1, shape[3])
    dyv = rng.randn(*dy_shape).astype(np.float32)

    def loss(a):
        return jnp.sum(max_pool_3x3s2(a) * jnp.asarray(dyv))

    g = jax.grad(loss)(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(g), reference_pool_grad(x, dyv),
                               atol=1e-5)


def test_pallas_pool_forward_matches_flax(rng):
    import flax.linen as nn

    x = jnp.asarray(rng.randn(2, 33, 35, 8).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(max_pool_3x3s2(x)),
        np.asarray(nn.max_pool(x, (3, 3), strides=(2, 2),
                               padding="VALID")))


def test_pallas_pool_grad_matches_xla_without_ties(rng):
    """With no ties (continuous random input), the kernel's gradient
    equals XLA's SelectAndScatter gradient exactly."""
    import flax.linen as nn

    x = jnp.asarray(rng.randn(1, 21, 19, 4).astype(np.float32))
    g_xla = jax.grad(lambda a: jnp.sum(nn.max_pool(
        a, (3, 3), strides=(2, 2), padding="VALID") ** 2))(x)
    g_pal = jax.grad(lambda a: jnp.sum(max_pool_3x3s2(a) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_xla),
                               atol=1e-5)
