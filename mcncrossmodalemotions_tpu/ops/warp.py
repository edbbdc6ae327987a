"""Batched affine grid + bilinear sampling (the augmentation engine).

Rebuilds the reference's ``vl_nnaffinegrid`` + ``vl_nnbilinearsampler``
(ferplus_baselines.m:194-213) with the same semantics in two forms:

- jnp versions (this module's default) for API parity and small inputs.
  CAUTION: the gather-based sampler is pathologically slow to compile/run
  for large batches on the tunnelled TPU runtime — the hot paths below
  deliberately avoid it.
- ``warp_images_np`` — the numpy host version used by the FER+ batch
  loader: augmentation runs on 48x48 uint8 images on the host (trivial
  CPU cost), and the device does only the matmul-lowered
  ``jax.image.resize`` + elementwise preprocessing.

Augmentation parameters mirror computeAugs (ferplus_baselines.m:232-268):
zoom 1 +/- 1/25, rotation +/- pi/18, skew +/- 0.1, composed, applied to a
random 50% of the batch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def affine_grid(theta: jax.Array, height: int, width: int) -> jax.Array:
    """theta [B, 2, 3] -> sampling grid [B, H, W, 2] in [-1, 1] coords.

    Convention: output pixel (i, j) samples input at
    ``theta @ [x_j, y_i, 1]`` with x, y normalised to [-1, 1]
    (vl_nnaffinegrid semantics).
    """
    ys = jnp.linspace(-1.0, 1.0, height)
    xs = jnp.linspace(-1.0, 1.0, width)
    grid_y, grid_x = jnp.meshgrid(ys, xs, indexing="ij")  # [H, W]
    ones = jnp.ones_like(grid_x)
    base = jnp.stack([grid_x, grid_y, ones], axis=-1)  # [H, W, 3]
    # [B, 2, 3] x [H, W, 3] -> [B, H, W, 2]
    return jnp.einsum("bij,hwj->bhwi", theta, base)


def bilinear_sample(images: jax.Array, grid: jax.Array) -> jax.Array:
    """Sample NHWC ``images`` at ``grid`` [B, H', W', 2] ([-1,1] x/y coords).

    Border pixels are clamped (vl_nnbilinearsampler convention).
    Differentiable; lowers to fused XLA gathers.
    """
    b, h, w, c = images.shape
    x = (grid[..., 0] + 1.0) * 0.5 * (w - 1)
    y = (grid[..., 1] + 1.0) * 0.5 * (h - 1)
    x0 = jnp.clip(jnp.floor(x), 0, w - 1)
    y0 = jnp.clip(jnp.floor(y), 0, h - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    wx = jnp.clip(x - x0, 0.0, 1.0)[..., None]
    wy = jnp.clip(y - y0, 0.0, 1.0)[..., None]
    x0i, x1i = x0.astype(jnp.int32), x1.astype(jnp.int32)
    y0i, y1i = y0.astype(jnp.int32), y1.astype(jnp.int32)

    def gather(yi, xi):
        # [B, H', W', C] via per-batch gather
        bidx = jnp.arange(b)[:, None, None]
        return images[bidx, yi, xi]

    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x1i)
    v10 = gather(y1i, x0i)
    v11 = gather(y1i, x1i)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def identity_theta(batch: int) -> jax.Array:
    eye = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    return jnp.tile(eye[None], (batch, 1, 1))


def _compose(a: jax.Array, b: jax.Array) -> jax.Array:
    """Compose two [B, 2, 3] affines: result = a after b."""
    a3 = jnp.concatenate(
        [a, jnp.tile(jnp.asarray([[[0.0, 0.0, 1.0]]]), (a.shape[0], 1, 1))], axis=1
    )
    b3 = jnp.concatenate(
        [b, jnp.tile(jnp.asarray([[[0.0, 0.0, 1.0]]]), (b.shape[0], 1, 1))], axis=1
    )
    return jnp.matmul(a3, b3)[:, :2, :]


def random_augmentation_thetas(rng: jax.Array, batch: int,
                               zoom_delta: float = 1.0 / 25.0,
                               max_rotate: float = jnp.pi / 18.0,
                               max_skew: float = 0.1,
                               apply_prob: float = 0.5) -> jax.Array:
    """Random zoom-rotate-skew affines (computeAugs equivalent).

    Each sample gets an independent composed transform; with probability
    ``1 - apply_prob`` the identity is used instead
    (ferplus_baselines.m:194-199 applies augs to half the batch).
    """
    k_zoom, k_rot, k_skew, k_apply = jax.random.split(rng, 4)
    zoom = 1.0 + jax.random.uniform(k_zoom, (batch,), minval=-zoom_delta,
                                    maxval=zoom_delta)
    angle = jax.random.uniform(k_rot, (batch,), minval=-max_rotate,
                               maxval=max_rotate)
    skew = jax.random.uniform(k_skew, (batch, 2), minval=-max_skew,
                              maxval=max_skew)
    zeros = jnp.zeros((batch,))
    zoom_t = jnp.stack([
        jnp.stack([zoom, zeros, zeros], axis=-1),
        jnp.stack([zeros, zoom, zeros], axis=-1),
    ], axis=1)
    cos, sin = jnp.cos(angle), jnp.sin(angle)
    rot_t = jnp.stack([
        jnp.stack([cos, -sin, zeros], axis=-1),
        jnp.stack([sin, cos, zeros], axis=-1),
    ], axis=1)
    ones = jnp.ones((batch,))
    skew_t = jnp.stack([
        jnp.stack([ones, skew[:, 0], zeros], axis=-1),
        jnp.stack([skew[:, 1], ones, zeros], axis=-1),
    ], axis=1)
    theta = _compose(_compose(zoom_t, rot_t), skew_t)
    apply = jax.random.bernoulli(k_apply, apply_prob, (batch,))
    return jnp.where(apply[:, None, None], theta, identity_theta(batch))


def warp_images(images: jax.Array, theta: jax.Array,
                out_height: int, out_width: int) -> jax.Array:
    """Affine-warp + resize in one sampling pass (the reference's combined
    augmentation/resize path)."""
    grid = affine_grid(theta, out_height, out_width)
    return bilinear_sample(images, grid)


def resize_bilinear(images: jax.Array, out_height: int, out_width: int) -> jax.Array:
    """Plain bilinear resize via the identity warp."""
    return warp_images(images, identity_theta(images.shape[0]),
                       out_height, out_width)


def resize_separable(images: jax.Array, out_height: int,
                     out_width: int) -> jax.Array:
    """Align-corners bilinear resize as two separable MXU matmuls.

    The TPU-fast path used by the teacher pipeline: matches the
    framework's canonical align-corners convention (host numpy resize,
    C++ data service, warp samplers) unlike ``jax.image.resize``'s
    half-pixel convention, and runs at HIGHEST precision (the default
    matmul precision truncates to bf16 — ~0.5 intensity levels of error
    on 0-255 images).
    """
    import numpy as np

    b, h, w, c = images.shape
    if (h, w) == (out_height, out_width):
        return images

    def weights(n_in: int, n_out: int) -> jax.Array:
        if n_in == 1:  # replication — all conventions agree
            return jnp.full((n_in, n_out), 1.0, jnp.float32)
        if n_out == 1:
            # align-corners with one output samples INDEX 0 (the host
            # resize's fy=0 and the warp sampler's linspace(-1,1,1) both
            # pick the first pixel) — NOT the axis mean
            mat = np.zeros((n_in, 1), np.float32)
            mat[0, 0] = 1.0
            return jnp.asarray(mat)
        pos = np.arange(n_out) * (n_in - 1) / (n_out - 1)
        lo = np.clip(np.floor(pos).astype(int), 0, n_in - 1)
        hi = np.minimum(lo + 1, n_in - 1)
        frac = pos - lo
        mat = np.zeros((n_in, n_out), np.float32)
        mat[lo, np.arange(n_out)] += 1.0 - frac
        mat[hi, np.arange(n_out)] += frac
        return jnp.asarray(mat)

    wy = weights(h, out_height)  # [H, H']
    wx = weights(w, out_width)   # [W, W']
    out = jnp.einsum("bhwc,hH->bHwc", images.astype(jnp.float32), wy,
                     precision=jax.lax.Precision.HIGHEST)
    return jnp.einsum("bHwc,wW->bHWc", out, wx,
                      precision=jax.lax.Precision.HIGHEST)


# ---------------------------------------------------------------------------
# Host (numpy) implementations — used by the batch loaders
# ---------------------------------------------------------------------------

def random_augmentation_thetas_np(rng, batch: int,
                                  zoom_delta: float = 1.0 / 25.0,
                                  max_rotate: float = float(jnp.pi) / 18.0,
                                  max_skew: float = 0.1,
                                  apply_prob: float = 0.5):
    """numpy twin of ``random_augmentation_thetas`` for host-side aug."""
    import numpy as np

    zoom = 1.0 + rng.uniform(-zoom_delta, zoom_delta, batch)
    angle = rng.uniform(-max_rotate, max_rotate, batch)
    skew = rng.uniform(-max_skew, max_skew, (batch, 2))
    thetas = np.zeros((batch, 2, 3))
    for i in range(batch):
        z = np.array([[zoom[i], 0, 0], [0, zoom[i], 0], [0, 0, 1]])
        c, s = np.cos(angle[i]), np.sin(angle[i])
        r = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
        k = np.array([[1, skew[i, 0], 0], [skew[i, 1], 1, 0], [0, 0, 1]])
        thetas[i] = (z @ r @ k)[:2]
    apply = rng.rand(batch) < apply_prob
    eye = np.array([[1.0, 0, 0], [0, 1.0, 0]])
    thetas[~apply] = eye
    return thetas.astype(np.float32)


def warp_images_np(images, theta, out_height: int, out_width: int):
    """Host affine warp, numerically matching the jnp sampler.

    ``images``: [B, H, W, C] (any numeric dtype); returns float32.
    """
    import numpy as np

    images = np.asarray(images, np.float32)
    b, h, w, c = images.shape
    ys = np.linspace(-1.0, 1.0, out_height)
    xs = np.linspace(-1.0, 1.0, out_width)
    gy, gx = np.meshgrid(ys, xs, indexing="ij")
    base = np.stack([gx, gy, np.ones_like(gx)], axis=-1)  # [H', W', 3]
    grid = np.einsum("bij,hwj->bhwi", np.asarray(theta, np.float32), base)
    x = (grid[..., 0] + 1.0) * 0.5 * (w - 1)
    y = (grid[..., 1] + 1.0) * 0.5 * (h - 1)
    x0 = np.clip(np.floor(x), 0, w - 1).astype(np.int64)
    y0 = np.clip(np.floor(y), 0, h - 1).astype(np.int64)
    x1 = np.minimum(x0 + 1, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    wx = np.clip(x - x0, 0.0, 1.0)[..., None]
    wy = np.clip(y - y0, 0.0, 1.0)[..., None]
    bidx = np.arange(b)[:, None, None]
    v00 = images[bidx, y0, x0]
    v01 = images[bidx, y0, x1]
    v10 = images[bidx, y1, x0]
    v11 = images[bidx, y1, x1]
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def augment_batch_np(images, rng, out_size=None, **theta_kwargs):
    """Host-side augmentation for a uint8 image batch.

    ``out_size=None`` warps at the native resolution (same size in/out —
    the default split: device resizes later, two resamplings total).
    ``out_size=S`` composes warp AND resize into ONE bilinear sample to
    [B, S, S, C] — the reference's single-resample composition
    (ferplus_baselines.m:194-213); costs (S/48)^2 more host arithmetic
    and feed bytes (docs/PERF.md round-4 resample study).
    """
    import numpy as np

    b, h, w, _ = images.shape
    oh = ow = out_size if out_size is not None else h
    theta = random_augmentation_thetas_np(rng, b, **theta_kwargs)
    warped = warp_images_np(images, theta, oh, ow)
    return np.clip(np.round(warped), 0, 255).astype(np.uint8)
