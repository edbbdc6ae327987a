"""Round-2 Mosaic probes: realistic (unaligned) pool shapes + passed-in
index operands for the gather probes."""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def run_probe(name, fn, *args, expect=None):
    import jax

    try:
        out = np.asarray(jax.device_get(jax.jit(fn)(*args)))
        ok = True if expect is None else bool(np.allclose(out, expect))
        print(f"PROBE {name}: RUNS, match={ok}", flush=True)
        return ok
    except Exception as exc:
        msg = str(exc).replace("\n", " | ")[:260]
        print(f"PROBE {name}: FAIL — {msg}", flush=True)
        return False


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    def pcall(kernel, out_shape, *ins):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
        )(*ins)

    # Realistic pool1 tile: W (input cols) = 197, Wout = 98, C = 96.
    T, W, C = 16, 197, 96
    Wh = (W + 1) // 2 + 1  # 100 candidate cols incl halo
    x3 = np.random.RandomState(0).randn(T, Wh, C).astype(np.float32)

    # P4r: 3D sublane repeat at unaligned W/C (the real kernel's op)
    def k4(x_ref, o_ref):
        o_ref[...] = jnp.repeat(x_ref[...], 2, axis=1)[:, :W]

    run_probe("P4r 3D sublane repeat (Wh=100,C=96)",
              lambda a: pcall(k4, (T, W, C), a), x3,
              expect=np.repeat(x3, 2, axis=1)[:, :W])

    # P4s: shifted variant (k2=1 candidates): repeat of x3[:, :-1] offset
    def k4s(x_ref, o_ref):
        o_ref[...] = jnp.repeat(x_ref[...][:, 1:], 2, axis=1)[:, :W]

    run_probe("P4s shifted sublane repeat",
              lambda a: pcall(k4s, (T, W, C), a), x3,
              expect=np.repeat(x3[:, 1:], 2, axis=1)[:, :W])

    # P4b: bf16 variant (model dtype)
    xb = x3.astype(jnp.bfloat16)

    def k4b(x_ref, o_ref):
        o_ref[...] = jnp.repeat(x_ref[...], 2, axis=1)[:, :W].astype(
            jnp.float32)

    run_probe("P4b 3D sublane repeat bf16",
              lambda a: pcall(k4b, (T, W, C), a), xb,
              expect=np.repeat(np.asarray(xb, np.float32), 2, axis=1)[:, :W])

    # P12: full candidate-expansion compute at pool1 tile scale:
    # grad[t, w, c] = sum_k2 (x == ycand) * dycand   (single row-candidate)
    xin = np.random.RandomState(1).randn(T, W, C).astype(np.float32)

    def k12(x_ref, y_ref, dy_ref, o_ref):
        x = x_ref[...]
        y, dy = y_ref[...], dy_ref[...]
        col_par = (jax.lax.broadcasted_iota(jnp.int32, (1, W, 1), 1) % 2) == 0
        grad = jnp.zeros_like(x)
        for k2 in (0, 1):
            yc = jnp.repeat(y[:, 1 - k2:], 2, axis=1)[:, :W]
            dyc = jnp.repeat(dy[:, 1 - k2:], 2, axis=1)[:, :W]
            m = x == yc
            if k2:
                m = jnp.logical_and(m, col_par)
            grad = grad + jnp.where(m, dyc, 0.0)
        o_ref[...] = grad

    def expect12():
        grad = np.zeros_like(xin)
        for k2 in (0, 1):
            yc = np.repeat(x3[:, 1 - k2:], 2, axis=1)[:, :W]
            dyc = np.repeat(x3[:, 1 - k2:] * 2, 2, axis=1)[:, :W]
            m = xin == yc
            if k2:
                m &= (np.arange(W) % 2 == 0)[None, :, None]
            grad += np.where(m, dyc, 0.0)
        return grad

    run_probe("P12 full col-candidate expansion",
              lambda a, b, c: pcall(k12, (T, W, C), a, b, c),
              xin, x3, x3 * 2, expect=expect12())

    # P1r: 2D lane gather with indices passed as operand
    S, L = 16, 256
    x2 = np.arange(S * L, dtype=np.float32).reshape(S, L)
    idx_l = np.repeat(np.arange(L // 2), 2).astype(np.int32)

    def k1(x_ref, i_ref, o_ref):
        o_ref[...] = jnp.take(x_ref[...], i_ref[...], axis=1)

    run_probe("P1r 2D lane gather (operand idx)",
              lambda a, i: pl.pallas_call(
                  k1, out_shape=jax.ShapeDtypeStruct((S, L), jnp.float32),
              )(a, i), x2, idx_l, expect=x2[:, idx_l])

    print("device:", jax.devices()[0].device_kind)


if __name__ == "__main__":
    main()
