"""conv1 space-to-depth probe on the real chip (VERDICT r2 next #5).

Compares the 7x7s2 Cin=1 conv1 against the equivalent space-to-depth
formulation (2x2 s2d -> 4x4s1 conv on Cin=4, kernel re-laid IN-GRAPH
from the canonical 7x7x1x96 param so checkpoints/imports are
untouched). DCE-proof timings: jits return both y and input/kernel
grads. Also parity-checks the two forms.

Usage: python tools/probe_conv1_s2d.py
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
    from jax import lax

    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/mcncrossmodal_jax_cache")

    bs = 128
    H, W = 512, 400
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(bs, H, W, 1).astype(np.float32))
    w = jnp.asarray((rng.randn(7, 7, 1, 96) * 0.05).astype(np.float32))
    dn = lax.conv_dimension_numbers(x.shape, w.shape,
                                    ("NHWC", "HWIO", "NHWC"))

    def conv_base(x, w):
        return lax.conv_general_dilated(
            x.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
            window_strides=(2, 2), padding="VALID",
            dimension_numbers=dn)

    def s2d(x):
        b, h, ww, c = x.shape
        z = x.reshape(b, h // 2, 2, ww // 2, 2, c)
        z = z.transpose(0, 1, 3, 2, 4, 5)
        return z.reshape(b, h // 2, ww // 2, 4 * c)

    def relay_kernel(w):
        # w[2a+di, 2b+dj, 0, o] -> w2[a, b, 2di+dj, o], zero tail row/col
        wp = jnp.pad(w, ((0, 1), (0, 1), (0, 0), (0, 0)))
        w2 = wp.reshape(4, 2, 4, 2, 1, 96).transpose(0, 2, 1, 3, 4, 5)
        return w2.reshape(4, 4, 4, 96)

    def conv_s2d(x, w):
        z = s2d(x)
        w2 = relay_kernel(w)
        dn2 = lax.conv_dimension_numbers(z.shape, w2.shape,
                                         ("NHWC", "HWIO", "NHWC"))
        return lax.conv_general_dilated(
            z.astype(jnp.bfloat16), w2.astype(jnp.bfloat16),
            window_strides=(1, 1), padding="VALID",
            dimension_numbers=dn2)

    # parity — scalar transfer only (activations are 1.2 GB; the tunnel
    # is ~33 MB/s)
    sa = jax.eval_shape(conv_base, x, w).shape
    sb = jax.eval_shape(conv_s2d, x, w).shape
    assert sa == sb, (sa, sb)
    err = float(jax.device_get(jax.jit(
        lambda x, w: jnp.abs(conv_base(x, w).astype(jnp.float32)
                             - conv_s2d(x, w).astype(jnp.float32)).max()
    )(x, w)))
    print(f"shapes {sa}, max |diff| = {err:.6f} (bf16 accum)", flush=True)

    def timed(name, conv):
        def fwd(x, w):
            return conv(x, w)

        def fwdbwd(x, w):
            def loss(x, w):
                y = conv(x, w)
                return (y.astype(jnp.float32) ** 2).mean(), y

            (l, y), g = jax.value_and_grad(loss, argnums=(0, 1),
                                           has_aux=True)(x, w)
            return y, g

        jf = jax.jit(fwd)
        jb = jax.jit(fwdbwd)
        o = [None]

        def run_f():
            o[0] = jf(x, w)

        sec = _best_of(run_f, lambda: _sync(o[0].astype(jnp.float32).sum()),
                       iters=20)
        print(f"{name:24s} fwd     {sec*1000:7.3f} ms")
        o2 = [None]

        def run_b():
            o2[0] = jb(x, w)

        sec2 = _best_of(
            run_b,
            lambda: _sync(o2[0][0].astype(jnp.float32).sum()
                          + o2[0][1][0].sum() + o2[0][1][1].sum()),
            iters=20)
        print(f"{name:24s} fwd+bwd {sec2*1000:7.3f} ms")
        return sec, sec2

    base = timed("7x7s2 Cin=1 (baseline)", conv_base)
    s2 = timed("s2d 4x4s1 Cin=4", conv_s2d)
    print(f"\nspeedup fwd {base[0]/s2[0]:.3f}x, fwd+bwd {base[1]/s2[1]:.3f}x")


if __name__ == "__main__":
    main()
