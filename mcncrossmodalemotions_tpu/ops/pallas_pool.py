"""Pallas max-pool kernels for the student's overlapping 3x3/stride-2 pools.

STATUS: kept UNWIRED. On the current Mosaic the implemented Pallas
forward measures 15.6 ms vs XLA reduce_window's 6.4 ms at the pool1
shape (2.4x slower; docs/PERF.md round-3 pool study) — the models keep
``nn.max_pool``. ``max_pool_3x3s2`` is bit-exact-tested and ready to
wire if a future Mosaic lowers the stride-2 column selection well; do
NOT wire it expecting a speedup without re-measuring on hardware.

The VGGVox stack's mpool1/mpool2 (models/vggm.py) are the train step's
biggest non-MXU cost. Profiling on v5e (tools/profile_train_step.py,
docs/PERF.md) decomposes XLA's lowering at the pool1 shape
([128, 253, 197, 96] bf16):

    reduce_window (forward)      5.2 ms   vs ~1.9 ms memory roofline
    SelectAndScatter (backward)  3.3 ms   ~at its ~3.4 ms roofline

so — contrary to the usual TPU folklore that the *backward* is the
problem — the win here is a roofline FORWARD kernel, while the backward
stays on XLA's already-optimal SelectAndScatter.

Forward kernel strategy (``_fwd_kernel``, one whole image per grid
step — grid=(batch,), no row tiling): everything is expressed in the
few vector shapes Mosaic lowers well (tools/probe_mosaic*.py):

- rows (outer dim): window-3 max over the even working extent as a
  pair-reshape ``[he//2, 2, W, C].max(1)`` plus the shifted even rows
  (``he = 2*hout <= h-1``, so the +1/+2 row reads stay in bounds);
- cols (sublane dim): window-3 max from unit-stride slices plus a
  ``roll(-2)`` third term (the roll's wrapped lanes land only on odd
  columns, which the stride-2 downsample discards), then the stride-2
  selection as a sublane split-reshape ``[TY, We//2, 2, C][:, :, 0]``.

No sublane interleave / strided slice / gather is needed — those are
the operations Mosaic cannot lower efficiently (or at all): an earlier
backward kernel built on sublane ``jnp.repeat`` compiled but ran 8x
slower than SelectAndScatter (75.9 ms; see docs/PERF.md round-3 notes).

Backward: ``jax.vjp`` of the reference ``reduce_window`` — the unused
forward recomputation is dead-code-eliminated by XLA, leaving the bare
SelectAndScatter, which re-derives the max selection from (x, dy) alone.

Tie semantics therefore stay EXACTLY XLA's (one winner per window), and
the forward is bit-identical to ``reduce_window`` (same max tree).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

WINDOW = 3
STRIDE = 2
_VMEM_LIMIT = 100 * 1024 * 1024  # pool1 whole-image tiles stack ~80 MB


def _pool_fwd_raw(x: jax.Array) -> jax.Array:
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        (1, WINDOW, WINDOW, 1), (1, STRIDE, STRIDE, 1), "VALID")


def _fwd_kernel(x_ref, y_ref):
    """Whole-image tile: y [hout, wout, C] from x [H, W, C]."""
    x = x_ref[0]                       # [H, W, C]
    h, w, c = x.shape
    hout = (h - WINDOW) // STRIDE + 1
    wout = (w - WINDOW) // STRIDE + 1
    he, we = 2 * hout, 2 * wout        # even working extents (<= h-1, w-1)

    # rows (outer dim): max(x[2a], x[2a+1], x[2a+2])
    pairs = x[:he].reshape(hout, 2, w, c)
    pairmax = jnp.maximum(pairs[:, 0], pairs[:, 1])
    third = jnp.concatenate([pairs[1:, 0], x[he:he + 1]], axis=0)
    m3r = jnp.maximum(pairmax, third)  # [hout, w, c]

    # cols (sublane dim): window-3 max then stride-2 selection. The
    # roll's wrapped values land only on odd working columns, which
    # the [:, :, 0] selection discards.
    m3 = jnp.maximum(
        jnp.maximum(m3r[:, :we], m3r[:, 1:we + 1]),
        jnp.roll(m3r, -2, axis=1)[:, :we])
    y_ref[0] = m3.reshape(hout, wout, 2, c)[:, :, 0]


def _pool_fwd_pallas(x: jax.Array, interpret: bool = False) -> jax.Array:
    bsz, h, w, c = x.shape
    hout = (h - WINDOW) // STRIDE + 1
    wout = (w - WINDOW) // STRIDE + 1
    return pl.pallas_call(
        _fwd_kernel,
        out_shape=jax.ShapeDtypeStruct((bsz, hout, wout, c), x.dtype),
        grid=(bsz,),
        in_specs=[pl.BlockSpec((1, h, w, c), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, hout, wout, c), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
    )(x)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def max_pool_3x3s2(x: jax.Array, interpret: bool | None = None) -> jax.Array:
    """3x3/stride-2 VALID max pool: Pallas forward, XLA S&S backward.

    Drop-in for ``nn.max_pool(x, (3, 3), strides=(2, 2), padding='VALID')``
    (bit-identical forward, identical tie semantics in the gradient).
    ``interpret=None`` auto-selects interpret mode off-TPU (CPU tests).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _pool_fwd_pallas(x, interpret=interpret)


def _fwd(x, interpret):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _pool_fwd_pallas(x, interpret=interpret), x


def _sas_grad(x: jax.Array, dy: jax.Array) -> jax.Array:
    """XLA SelectAndScatterAdd gradient (re-derives the max selection
    from x and dy alone; one winner per window, XLA tie semantics)."""
    try:
        from jax._src.lax.windowed_reductions import (
            _select_and_scatter_add,
        )

        return _select_and_scatter_add(
            dy, x, jax.lax.ge_p, (1, WINDOW, WINDOW, 1),
            (1, STRIDE, STRIDE, 1), ((0, 0),) * 4)
    except ImportError:  # private API moved: fall back to jax.vjp
        # (the unused forward recomputation is DCE'd by XLA)
        return jax.vjp(_pool_fwd_raw, x)[1](dy)[0]


def _bwd(interpret, x, dy):
    return (_sas_grad(x, dy.astype(x.dtype)),)


max_pool_3x3s2.defvjp(_fwd, _bwd)


def reference_pool_grad(x: np.ndarray, dy: np.ndarray) -> np.ndarray:
    """Slow numpy oracle distributing dy to every tying max (tests)."""
    bsz, h, w, c = x.shape
    hout = (h - WINDOW) // STRIDE + 1
    wout = (w - WINDOW) // STRIDE + 1
    grad = np.zeros_like(x, np.float64)
    for a in range(hout):
        for j in range(wout):
            win = x[:, 2 * a:2 * a + 3, 2 * j:2 * j + 3, :]
            m = win.max(axis=(1, 2), keepdims=True)
            grad[:, 2 * a:2 * a + 3, 2 * j:2 * j + 3, :] += np.where(
                win == m, dy[:, a:a + 1, j:j + 1, :], 0.0)
    return grad.astype(x.dtype)
