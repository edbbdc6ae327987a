"""Probe Mosaic lowering support for the pool-backward expansion patterns.

Each probe jits a tiny pallas_call on the real chip and reports
lower/compile/run success plus numerical agreement with numpy.
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def run_probe(name, fn, *args, expect=None):
    import jax

    try:
        out = np.asarray(jax.device_get(jax.jit(fn)(*args)))
        ok = True if expect is None else np.allclose(out, expect)
        print(f"PROBE {name}: RUNS, match={ok}", flush=True)
    except Exception as exc:
        msg = str(exc).replace("\n", " | ")[:300]
        print(f"PROBE {name}: FAIL — {msg}", flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    S, L = 16, 256
    x2 = np.arange(S * L, dtype=np.float32).reshape(S, L)
    idx_l = np.repeat(np.arange(L // 2), 2).astype(np.int32)  # lane interleave
    idx_s = np.repeat(np.arange(S // 2), 2).astype(np.int32)  # sublane interleave

    def pcall(kernel, out_shape, *ins):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
        )(*ins)

    # P1: 2D gather along lanes (constant indices)
    def k1(x_ref, o_ref):
        o_ref[...] = jnp.take(x_ref[...], jnp.asarray(idx_l), axis=1)

    run_probe("P1 2D lane gather", lambda a: pcall(k1, (S, L), a), x2,
              expect=x2[:, idx_l])

    # P2: 2D gather along sublanes
    def k2(x_ref, o_ref):
        o_ref[...] = jnp.take(x_ref[...], jnp.asarray(idx_s), axis=0)

    run_probe("P2 2D sublane gather", lambda a: pcall(k2, (S, L), a), x2,
              expect=x2[idx_s])

    # P3: 3D gather along middle (sublane) axis
    T, W, C = 8, 16, 128
    x3 = np.arange(T * W * C, dtype=np.float32).reshape(T, W, C)
    idx_w = np.repeat(np.arange(W // 2), 2).astype(np.int32)

    def k3(x_ref, o_ref):
        o_ref[...] = jnp.take(x_ref[...], jnp.asarray(idx_w), axis=1)

    run_probe("P3 3D sublane gather", lambda a: pcall(k3, (T, W, C), a), x3,
              expect=x3[:, idx_w])

    # P4: 3D repeat along middle axis (known-failed round 2)
    def k4(x_ref, o_ref):
        o_ref[...] = jnp.repeat(x_ref[...][:, : W // 2], 2, axis=1)

    run_probe("P4 3D sublane repeat", lambda a: pcall(k4, (T, W, C), a), x3,
              expect=np.repeat(x3[:, : W // 2], 2, axis=1))

    # P5: in-kernel reshape [T, W, C] -> [T*W, C]
    def k5(x_ref, o_ref):
        o_ref[...] = x_ref[...].reshape(T * W, C)

    run_probe("P5 reshape 3D->2D (fold outer+sublane)",
              lambda a: pcall(k5, (T * W, C), a), x3,
              expect=x3.reshape(T * W, C))

    # P5b: reshape folding sublane+lane [T, W, C] -> [T, W*C]
    def k5b(x_ref, o_ref):
        o_ref[...] = x_ref[...].reshape(T, W * C)

    run_probe("P5b reshape fold sublane+lane",
              lambda a: pcall(k5b, (T, W * C), a), x3,
              expect=x3.reshape(T, W * C))

    # P6: 2D repeat along sublanes
    def k6(x_ref, o_ref):
        o_ref[...] = jnp.repeat(x_ref[...][: S // 2], 2, axis=0)

    run_probe("P6 2D sublane repeat", lambda a: pcall(k6, (S, L), a), x2,
              expect=np.repeat(x2[: S // 2], 2, axis=0))

    # P7: 2D repeat along lanes
    def k7(x_ref, o_ref):
        o_ref[...] = jnp.repeat(x_ref[...][:, : L // 2], 2, axis=1)

    run_probe("P7 2D lane repeat", lambda a: pcall(k7, (S, L), a), x2,
              expect=np.repeat(x2[:, : L // 2], 2, axis=1))

    # P8: strided lane slice of 2D tile
    def k8(x_ref, o_ref):
        o_ref[...] = x_ref[...][:, 0::2]

    run_probe("P8 2D strided lane slice", lambda a: pcall(k8, (S, L // 2), a),
              x2, expect=x2[:, 0::2])

    # P9: selection matmul on lanes: y[S, L/2] @ Sel[L/2, L]
    sel = np.zeros((L // 2, L), np.float32)
    sel[idx_l, np.arange(L)] = 1.0

    def k9(x_ref, o_ref):
        o_ref[...] = jax.lax.dot_general(
            x_ref[...][:, : L // 2], jnp.asarray(sel),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    run_probe("P9 lane selection matmul", lambda a: pcall(k9, (S, L), a), x2,
              expect=x2[:, : L // 2] @ sel)

    # P10: roll along lanes (shift for k2 candidates)
    def k10(x_ref, o_ref):
        o_ref[...] = jnp.roll(x_ref[...], 1, axis=1)

    run_probe("P10 2D lane roll", lambda a: pcall(k10, (S, L), a), x2,
              expect=np.roll(x2, 1, axis=1))

    # P11: 3D gather along LANE axis of 3D tile
    idx_c = np.repeat(np.arange(C // 2), 2).astype(np.int32)

    def k11(x_ref, o_ref):
        o_ref[...] = jnp.take(x_ref[...], jnp.asarray(idx_c), axis=2)

    run_probe("P11 3D lane gather", lambda a: pcall(k11, (T, W, C), a), x3,
              expect=x3[:, :, idx_c])

    print("device:", jax.devices()[0].device_kind)


if __name__ == "__main__":
    main()
