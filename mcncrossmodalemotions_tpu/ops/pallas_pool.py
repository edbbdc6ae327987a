"""Fused Pallas max-pool backward for overlapping 3x3/stride-2 pools.

The student's mpool1/mpool2 (VGGVox stack, models/vggm.py) dominate the
train step's backward: XLA lowers max-pool gradients to SelectAndScatter,
which measured ~2x off the memory roofline on v5e ([128,253,197,96]
bf16: 10.8 ms fwd+bwd standalone), and every jnp-level reformulation
loses to it outright because the stride-2 regridding becomes whole-array
relayouts (docs/PERF.md section "optimisations attempted"). This kernel
does the regridding inside VMEM tiles instead:

    grad[i, w] = sum over the <=2x2 candidate windows (a, j) containing
    (i, w) of  (x[i, w] == y[a, j]) * dy[a, j]

For window 3 / stride 2 the candidates along one axis are
``a = i//2 - k, k in {0, 1}``, the k=1 candidate valid only for even
``i``. The grid tiles H only; each step gets the x/grad tile plus TWO
(y, dy) blocks — the tile's own rows and the preceding block whose last
row is the k=1 halo — so everything is BlockSpec-managed (manual HBM
DMA slices would need 8-sublane/128-lane aligned sizes, which Wout=98 /
C=96 are not). Candidate rows come from outer-dim element repeats and
candidate columns from one sublane ``jnp.repeat`` per term; out-of-range
candidates are neutralised by -inf halo padding on y (``x == -inf`` is
never true) rather than masks.

Tie semantics: gradient flows to EVERY element equal to the window max
(SelectAndScatter picks one winner). Bitwise ties in bf16 activations
are rare and typically dead ReLU zeros whose gradient the ReLU backward
drops anyway.

Forward stays ``lax.reduce_window`` (already at roofline).

STATUS — experimental, interpret-validated, NOT wired into the models:
on the current Mosaic compiler the column-candidate expansion
(``jnp.repeat`` along the sublane axis) fails to lower ("unsupported
shape cast vector<TxWxC> -> vector<TxWx1xC>"), and the two workarounds
both dead-end: strided sublane slices of 3-D tiles raise "Only 2D
gather is supported", and hoisting the W-expansion into XLA adds enough
HBM traffic (~2.4 GB for the expanded y/dy reads) that the kernel can
at best TIE SelectAndScatter's 8.7 ms on the pool1 shape (memory
roofline ~5.5 ms). Full accounting in docs/PERF.md. The kernel is kept
(a) as the ready-to-enable implementation if Mosaic grows sublane
interleaves and (b) exercised by tests in interpret mode.
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
_TI = 32          # input rows per grid step
_TY = _TI // 2    # y rows per grid step


def _pool_fwd_raw(x: jax.Array) -> jax.Array:
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        (1, WINDOW, WINDOW, 1), (1, STRIDE, STRIDE, 1), "VALID")


def _bwd_kernel(x_ref, y_ref, yp_ref, dy_ref, dyp_ref, grad_ref):
    """grad rows [i0, i0+TI) of one image; i0 = 2 * TY * t (even).

    x_ref/grad_ref: [1, TI, W, C]. y_ref/dy_ref: this tile's window rows
    (global a in [i0/2, i0/2+TY)); yp_ref/dyp_ref: the PRECEDING block
    (its last row is the k=1 candidate for the tile's first row pair).
    """
    x = x_ref[0]                      # [TI, W, C]
    ti, w, c = x.shape
    ws = (w + 1) // 2 + 1             # candidate columns incl. halo
    row_par = (jax.lax.broadcasted_iota(jnp.int32, (ti, 1, 1), 0) % 2) == 0
    col_par = (jax.lax.broadcasted_iota(jnp.int32, (1, w, 1), 1) % 2) == 0

    y_cur, dy_cur = y_ref[0], dy_ref[0]          # [TY, Wp, C]
    # k1=1 candidate rows: [prev block's last row, y_cur[:-1]]
    y_shift = jnp.concatenate([yp_ref[0, -1:], y_cur[:-1]], axis=0)
    dy_shift = jnp.concatenate([dyp_ref[0, -1:], dy_cur[:-1]], axis=0)

    grad = jnp.zeros_like(x)
    for k1, (yk, dyk) in enumerate(((y_cur, dy_cur), (y_shift, dy_shift))):
        yk1 = jnp.repeat(yk, 2, axis=0)          # row r <- window r//2 - k1
        dyk1 = jnp.repeat(dyk, 2, axis=0)
        for k2 in (0, 1):             # candidate window col j = w//2 - k2
            ycols = yk1[:, 1 - k2:1 - k2 + ws]
            dycols = dyk1[:, 1 - k2:1 - k2 + ws]
            ycand = jnp.repeat(ycols, 2, axis=1)[:, :w]    # sublane
            dycand = jnp.repeat(dycols, 2, axis=1)[:, :w]
            mask = x == ycand          # -inf halo: never matches real x
            if k1:
                mask = jnp.logical_and(mask, row_par)
            if k2:
                mask = jnp.logical_and(mask, col_par)
            grad = grad + jnp.where(mask, dycand, jnp.zeros_like(dycand))
    grad_ref[0] = grad


def _pool_bwd_pallas(x: jax.Array, y: jax.Array, dy: jax.Array,
                     interpret: bool = False) -> jax.Array:
    bsz, h, w, c = x.shape
    hout, wout = y.shape[1], y.shape[2]
    n_tiles = -(-h // _TI)
    # halo layout (H): one leading block of -inf rows so block index t
    # covers window rows [t*TY - TY, t*TY) — the kernel reads blocks t+1
    # (own rows) and t (preceding); tail -inf rows make block n_tiles+1
    # addressable. W: one leading -inf column for the k2=1 candidates.
    ph = (n_tiles + 1) * _TY - hout
    pw = max(((w + 1) // 2 + 2) - (wout + 1), 2)
    neg = jnp.asarray(-jnp.inf, y.dtype)
    yp = jnp.pad(y, ((0, 0), (_TY, ph), (1, pw), (0, 0)),
                 constant_values=neg)
    dyp = jnp.pad(dy, ((0, 0), (_TY, ph), (1, pw), (0, 0)))
    wp = yp.shape[2]

    y_spec_cur = pl.BlockSpec((1, _TY, wp, c), lambda b, t: (b, t + 1, 0, 0),
                              memory_space=pltpu.VMEM)
    y_spec_prev = pl.BlockSpec((1, _TY, wp, c), lambda b, t: (b, t, 0, 0),
                               memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _bwd_kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(bsz, n_tiles),
        in_specs=[
            pl.BlockSpec((1, _TI, w, c), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
            y_spec_cur, y_spec_prev,
            y_spec_cur, y_spec_prev,
        ],
        out_specs=pl.BlockSpec((1, _TI, w, c), lambda b, t: (b, t, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, yp, yp, dyp, dyp)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def max_pool_3x3s2(x: jax.Array, interpret: bool | None = None) -> jax.Array:
    """3x3/stride-2 VALID max pool with the Pallas backward.

    Drop-in for ``nn.max_pool(x, (3, 3), strides=(2, 2), padding='VALID')``
    with a faster TPU gradient. ``interpret=None`` auto-selects interpret
    mode off-TPU (CPU tests).
    """
    return _pool_fwd_raw(x)


def _fwd(x, interpret):
    y = _pool_fwd_raw(x)
    return y, (x, y)


def _bwd(interpret, res, dy):
    x, y = res
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return (_pool_bwd_pallas(x, y, dy.astype(x.dtype), interpret=interpret),)


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
