"""Seed-sweep of the convergence CI recipe (VERDICT r3 weak #2).

Runs tests/test_full_workflow.py::test_distillation_convergence_regression's
exact recipe once per seed, one run at a time (the box has 1 CPU core),
and prints one JSON line per seed: final train loss + unheardVal meanAuc.
The distribution sizes the CI thresholds so the worst seed clears by a
structural margin, not RNG luck (the round-3 fragility finding).

  python tools/sweep_convergence.py 0 1 2 3 4 5 6 7 8 9

Each seed varies BOTH the training RNG (init, batch order, crop draws —
DistillationConfig.seed) and nothing else: the synthetic imdb stays at
its CI seed (0), matching what an innocuous RNG-stream change in the
batcher would re-roll.

Measured 2026-08-18 (12 seeds: 0-9, 11, 13; ~8 min/seed on the 1-core
box):

  seed  final_loss  final_classerror  unheardVal_meanAuc  heardVal_meanAuc
     0      1.4429            0.5312              1.0000            0.9167
     1      1.2860            0.3125              0.8571            0.7778
     2      1.4104            0.5000              1.0000            1.0000
     3      1.4636            0.5000              0.8571            0.6944
     4      1.5287            0.5000              0.8571            0.6944
     5      1.4425            0.4375              0.8571            0.6944
     6      1.4336            0.3750              1.0000            0.9167
     7      1.5783            0.5312              0.8571            0.6944
     8      1.4179            0.4375              0.9167            0.6389
     9      1.3585            0.4375              0.8571            0.6944
    11      1.4782            0.4062              1.0000            0.9167
    13      1.3938            0.4375              1.0000            1.0000

Worst-seed margins vs the CI gates in
tests/test_full_workflow.py::test_distillation_convergence_regression:
meanAuc min 0.8571 vs gate 0.7 (margin 0.157 >= 0.15); loss max 1.5783
vs gate 1.9 (margin 0.32). The gates hold structurally across RNG
re-rolls — no resize needed.
"""

import json
import sys
import tempfile
from pathlib import Path


def run_seed(seed: int, mulaw: bool = False) -> dict:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)  # match tests/conftest.py

    from mcncrossmodalemotions_tpu.data.emovox import build_synthetic_imdb
    from mcncrossmodalemotions_tpu.exp.compute_audio_feats import (
        compute_audio_feats,
    )
    from mcncrossmodalemotions_tpu.exp.run_distillation import (
        DistillationConfig,
        run_distillation,
    )
    from mcncrossmodalemotions_tpu.exp.student_stats import student_stats
    from mcncrossmodalemotions_tpu.zoo import build_student

    tmp = Path(tempfile.mkdtemp(prefix=f"convsweep{seed}-"))
    imdb = build_synthetic_imdb(tmp / "wavs", num_speakers=6,
                                tracks_per_speaker=8, seed=0)
    cfg = DistillationConfig(num_epochs=12, batch_size=8, tiny_model=True,
                             num_seconds=2.0,
                             mini_epoch_ratio=1.0, mini_val=1.0,
                             lr_start_exp=-1.0, lr_stop_exp=-1.5,
                             seed=seed, mulaw_feed=mulaw,
                             out_root=str(tmp / "exps"))
    state, history, _ = run_distillation(cfg, imdb=imdb, mesh=None)
    bare = build_student(tiny=True, with_frontend=False)
    bare_vars = {"params": state.params["net"],
                 "batch_stats": state.model_state["batch_stats"]["net"]}
    logits = compute_audio_feats(imdb, model=bare, variables=bare_vars,
                                 verbose=False)
    stats = student_stats(imdb, student_logits=logits, verbose=False)
    return {
        "seed": seed,
        "feed": "mulaw8" if mulaw else "int16",
        "final_loss": round(float(history[-1]["train"]["loss"]), 4),
        "final_classerror": round(
            float(history[-1]["train"]["classerror"]), 4),
        "unheardVal_meanAuc": round(
            float(stats["unheardVal"]["meanAuc"]), 4),
        "heardVal_meanAuc": round(
            float(stats["heardVal"]["meanAuc"]), 4),
    }


if __name__ == "__main__":
    # --mulaw switches the recipe to the quarter-bandwidth mu-law uint8
    # waveform feed (DistillationConfig.mulaw_feed) — the training-
    # quality A/B behind the bench's wire-bytes headline (round-4
    # VERDICT weak #2; results table in docs/PERF.md).
    args = sys.argv[1:]
    mulaw = "--mulaw" in args
    seeds = [int(s) for s in args if s != "--mulaw"] or list(range(10))
    # one seed per PROCESS would be cleaner still, but the recipe is
    # CPU-deterministic in-process; sequential in one process is fine
    # and saves 10x interpreter+compile startup.
    for s in seeds:
        print(json.dumps(run_seed(s, mulaw=mulaw)), flush=True)
