"""Worked example: the complete cross-modal distillation workflow.

Mirrors the reference's five workloads end to end on a synthetic
mini-dataset (no downloads needed), producing every artifact the paper
pipeline produces. Runs in a few minutes on CPU with tiny models; drop
``tiny_model``/``tiny=True`` and point the builders at real data for the
full-scale version.

    python examples/full_workflow.py [workdir]
"""

import sys
import tempfile
from pathlib import Path

import numpy as np


def main(workdir: str | None = None) -> None:
    import jax
    import jax.numpy as jnp

    root = Path(workdir or tempfile.mkdtemp(prefix="cme_workflow_"))
    print(f"workdir: {root}")
    rng = np.random.RandomState(0)

    # ------------------------------------------------------------------
    # Stage 0 — raw data on disk: wavs + face frames (VoxCeleb layout)
    # ------------------------------------------------------------------
    from mcncrossmodalemotions_tpu.data.audio import write_wav
    from mcncrossmodalemotions_tpu.data.images import save_synthetic_frame

    vox = root / "voxceleb"
    for s in range(3):
        for t in range(4):
            rel = f"spk{s}/t{t}"
            emotion = (s * 4 + t) % 4
            n = int(16000 * 5)
            tt = np.arange(n) / 16000
            wave = 0.4 * np.sin(2 * np.pi * (200 + 120 * emotion) * tt)
            write_wav(vox / "wavs" / (rel + ".wav"),
                      wave.astype(np.float32), 16000)
            for k in range(4):
                save_synthetic_frame(vox / "frames" / rel / f"{k:02d}.jpg",
                                     emotion, size=48, seed=s * 10 + t + k)
    print("stage 0: synthetic VoxCeleb written")

    # ------------------------------------------------------------------
    # Stage 1 — teacher + dense inference -> EmoVoxCeleb imdb
    # (fetch_emovoxceleb_imdb equivalent; use a FER+-trained teacher and
    #  full-size models for the real pipeline)
    # ------------------------------------------------------------------
    from mcncrossmodalemotions_tpu.exp.ferplus_baselines import (
        FerPlusConfig,
        build_pipeline,
    )
    from mcncrossmodalemotions_tpu.exp.fetch_emovoxceleb_imdb import (
        fetch_emovoxceleb_imdb,
    )

    tcfg = FerPlusConfig(tiny_model=True, input_size=48, dropout=0.0,
                         augment=False)
    teacher = build_pipeline(tcfg)
    t_vars = teacher.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, 48, 48, 1), jnp.uint8))
    imdb = fetch_emovoxceleb_imdb(
        vox, teacher, t_vars,
        cache_path=str(root / "emovoxceleb-imdb.npz"),
        set_assignment={"spk2": 2}, verbose=False,
    )
    print(f"stage 1: imdb built — {imdb.num_tracks} tracks, "
          f"{sum(len(w) for w in imdb.wav_logits)} teacher-logit frames")

    # ------------------------------------------------------------------
    # Stage 2 — student distillation (run_distillation equivalent)
    # ------------------------------------------------------------------
    from mcncrossmodalemotions_tpu.exp.run_distillation import (
        DistillationConfig,
        run_distillation,
    )

    # Tiny model + short schedule: enough for the synthetic tones to start
    # separating; downstream AUC/accuracy numbers here are demo-scale, not
    # paper-scale (use the full model + real data + 300 epochs for those).
    dcfg = DistillationConfig(num_epochs=20, batch_size=4, tiny_model=True,
                              mini_epoch_ratio=1.0, mini_val=1.0,
                              lr_start_exp=-1.3, lr_stop_exp=-1.8,
                              out_root=str(root / "exps"))
    state, history, exp_dir = run_distillation(dcfg, imdb=imdb)
    print(f"stage 2: distilled {len(history)} epochs, "
          f"final loss {history[-1]['train']['loss']:.4f} -> {exp_dir}")

    # ------------------------------------------------------------------
    # Stage 3 — student features + heard/unheard ROC (student_stats)
    # ------------------------------------------------------------------
    from mcncrossmodalemotions_tpu.exp.compute_audio_feats import (
        compute_audio_feats,
    )
    from mcncrossmodalemotions_tpu.exp.student_stats import student_stats
    from mcncrossmodalemotions_tpu.zoo import build_student

    bare = build_student(tiny=True, with_frontend=False)
    bare_vars = {"params": state.params["net"],
                 "batch_stats": state.model_state["batch_stats"]["net"]}
    logits = compute_audio_feats(imdb, model=bare, variables=bare_vars,
                                 feat_path=str(root / "student-feats.npz"),
                                 verbose=False)
    aucs = student_stats(imdb, student_logits=logits,
                         fig_dir=str(root / "figs"),
                         cache_path=str(root / "aucs.json"))
    for part, values in aucs.items():
        print(f"stage 3: {part} meanAuc={values['meanAuc']:.3f}")

    # ------------------------------------------------------------------
    # Stage 4 — analysis extras: teacher histogram + qualitative samples
    # ------------------------------------------------------------------
    from mcncrossmodalemotions_tpu.exp.sample_audio import sample_audio
    from mcncrossmodalemotions_tpu.exp.teacher_stats import teacher_stats

    teacher_stats(imdb, fig_path=str(root / "figs" / "teacher-hist.pdf"))
    sample_audio(imdb, root / "samples", per_emotion=2, make_figures=True,
                 overwrite=True)
    print("stage 4: histogram + sample packs written")

    # ------------------------------------------------------------------
    # Stage 5 — external benchmark cross-validation (emo_benchmarks)
    # ------------------------------------------------------------------
    from mcncrossmodalemotions_tpu.data.external import (
        build_synthetic_track_imdb,
    )
    from mcncrossmodalemotions_tpu.exp.emo_benchmarks import emo_benchmarks

    rml = build_synthetic_track_imdb(root / "rml", tracks_per_class=5)
    rml_logits = compute_audio_feats(rml, model=bare, variables=bare_vars,
                                     verbose=False)
    results = emo_benchmarks({
        "rml": dict(track_logits=rml_logits, labels=rml.labels,
                    classes=rml.classes),
    }, num_folds=5, fig_dir=str(root / "figs"))
    print(f"stage 5: rml acc {results['rml'].mean_accuracy:.3f} "
          f"+/- {results['rml'].std_accuracy:.3f}")
    print(f"done; artifacts in {root}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
