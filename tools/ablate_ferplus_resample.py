"""Quantify the FER+ augmentation double-resample deviation (VERDICT r2 #6).

Chain (a) — this framework's default: host affine warp at the native
48x48, device separable resize to input_size (two resamplings of the
augmented half of each batch).
Chain (b) — the reference's composition (ferplus_baselines.m:194-213):
warp AND resize fused into ONE bilinear sample at input_size
(``FerPlusConfig.augment_at_target``).

Trains the tiny teacher on the synthetic FER+ imdb under both chains
for several seeds and reports final val accuracy + the host-side
augmentation cost per batch of each — the evidence behind
exp/reproduce_ferplus.py's acceptance tolerance (results recorded in
docs/PERF.md "Round-4 resample study").

Usage: python tools/ablate_ferplus_resample.py  (runs on CPU)
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")

    import tempfile

    from mcncrossmodalemotions_tpu.data.ferplus import build_synthetic_ferplus
    from mcncrossmodalemotions_tpu.exp.ferplus_baselines import (
        FerPlusConfig,
        ferplus_baselines,
    )
    from mcncrossmodalemotions_tpu.ops.warp import augment_batch_np

    # host augmentation cost per 128-batch, both chains
    rng = np.random.RandomState(0)
    batch = rng.randint(0, 255, (128, 48, 48, 1)).astype(np.uint8)
    for out_size, tag in ((None, "warp@48 (a)"), ((96), "warp->96"),
                          ((224), "warp->224 (b)")):
        t = []
        for k in range(5):
            t0 = time.monotonic()
            augment_batch_np(batch, np.random.RandomState(k),
                             out_size=out_size)
            t.append(time.monotonic() - t0)
        ms = min(t) * 1000
        bytes_per = (out_size or 48) ** 2
        print(f"host augment {tag:16s}: {ms:7.1f} ms/128-batch, "
              f"{bytes_per/1024:6.1f} kB/img feed", flush=True)

    imdb = build_synthetic_ferplus(240, seed=0)
    results = {}
    for chain, at_target in (("a: warp@48 + device resize", False),
                             ("b: single warp->input", True)):
        accs = []
        for seed in (0, 1, 2):
            root = tempfile.mkdtemp()
            cfg = FerPlusConfig(
                tiny_model=True, input_size=96, batch_size=24,
                dropout=0.0, augment=True, augment_at_target=at_target,
                lr_values=(0.01,), lr_epochs=(6,), finetune_lr=1.0,
                seed=seed, out_root=root)
            _, _ = ferplus_baselines(cfg, imdb, mesh=None)
            _, stats = ferplus_baselines(cfg, imdb, evaluate_only="val",
                                         mesh=None)
            accs.append(stats["accuracy"])
            print(f"  chain {chain!r} seed {seed}: val acc "
                  f"{stats['accuracy']:.4f}", flush=True)
        results[chain] = accs
        print(f"chain {chain!r}: mean {np.mean(accs):.4f} "
              f"+/- {np.std(accs):.4f}")
    a = np.mean(results["a: warp@48 + device resize"])
    b = np.mean(results["b: single warp->input"])
    print(f"\ndelta (b - a) = {b - a:+.4f}")


if __name__ == "__main__":
    main()
