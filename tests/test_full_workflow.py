"""End-to-end workflow chain on synthetic data: the whole paper pipeline.

Mirrors the reference's five workloads in sequence (SURVEY.md section 0):
teacher training -> dense teacher inference (imdb genesis) -> student
distillation -> heard/unheard ROC analysis -> external benchmark
cross-validation. Everything runs with tiny models on the CPU mesh; the
assertions check the *contracts between stages*, which is what the
reference's inline asserts guarded.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mcncrossmodalemotions_tpu.data.audio import write_wav
from mcncrossmodalemotions_tpu.data.images import save_synthetic_frame


@pytest.fixture(scope="module")
def workflow(tmp_path_factory):
    """Run the full chain once; individual tests assert on the artifacts."""
    root = tmp_path_factory.mktemp("wf")
    rng = np.random.RandomState(0)

    # --- stage 0: raw "VoxCeleb" data on disk (wavs + face frames)
    vox = root / "voxceleb"
    n_speakers, tracks_per = 3, 3
    for s in range(n_speakers):
        for t in range(tracks_per):
            rel = f"spk{s}/t{t}"
            emotion = (s * tracks_per + t) % 4
            n = int(16000 * 4.5)
            tt = np.arange(n) / 16000
            wave = 0.4 * np.sin(2 * np.pi * (200 + 120 * emotion) * tt)
            write_wav(vox / "wavs" / (rel + ".wav"),
                      wave.astype(np.float32), 16000)
            for k in range(3):
                save_synthetic_frame(vox / "frames" / rel / f"{k:02d}.jpg",
                                     emotion, size=48, seed=s * 10 + t + k)

    # --- stage 1: teacher (tiny) + dense inference -> EmoVoxCeleb imdb
    from mcncrossmodalemotions_tpu.exp.ferplus_baselines import (
        FerPlusConfig,
        build_pipeline,
    )
    from mcncrossmodalemotions_tpu.exp.fetch_emovoxceleb_imdb import build_imdb

    tcfg = FerPlusConfig(tiny_model=True, input_size=48, dropout=0.0,
                         augment=False)
    teacher = build_pipeline(tcfg)
    t_vars = teacher.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, 48, 48, 1), jnp.uint8))
    imdb = build_imdb(vox, teacher, t_vars,
                      set_assignment={"spk2": 2}, verbose=False)

    # --- stage 2: student distillation on the generated logits
    from mcncrossmodalemotions_tpu.exp.run_distillation import (
        DistillationConfig,
        run_distillation,
    )

    dcfg = DistillationConfig(num_epochs=2, batch_size=3, tiny_model=True,
                              mini_epoch_ratio=1.0, mini_val=1.0,
                              out_root=str(root / "exps"))
    state, history, exp_dir = run_distillation(dcfg, imdb=imdb)

    # --- stage 3: student features + ROC analysis
    from mcncrossmodalemotions_tpu.exp.compute_audio_feats import (
        compute_audio_feats,
    )
    from mcncrossmodalemotions_tpu.exp.student_stats import student_stats
    from mcncrossmodalemotions_tpu.zoo import build_student

    bare = build_student(tiny=True, with_frontend=False)
    bare_vars = {"params": state.params["net"], "batch_stats":
                 state.model_state["batch_stats"]["net"]}
    logits = compute_audio_feats(imdb, model=bare, variables=bare_vars,
                                 verbose=False)
    stats = student_stats(imdb, student_logits=logits,
                          fig_dir=str(root / "figs"))

    # --- stage 4: external benchmark cross-validation on the features
    from mcncrossmodalemotions_tpu.exp.emo_benchmarks import emo_benchmarks

    labels = np.asarray([int(w.max(axis=0).argmax()) % 3
                         for w in imdb.wav_logits])
    results = emo_benchmarks({
        "synthetic": dict(track_logits=logits, labels=labels,
                          classes=("a", "b", "c")),
    }, num_folds=3, fig_dir=str(root / "figs"))

    return dict(root=root, imdb=imdb, history=history, exp_dir=exp_dir,
                logits=logits, stats=stats, results=results)


def test_imdb_genesis_contract(workflow):
    imdb = workflow["imdb"]
    assert imdb.num_tracks == 9
    for w, frames in zip(imdb.wav_logits, imdb.dense_frames):
        assert w.shape == (len(frames), 8)
        assert np.isfinite(w).all()
    assert set(imdb.set_id.tolist()) == {1, 2}


def test_distillation_artifacts(workflow):
    exp_dir = workflow["exp_dir"]
    assert (exp_dir / "net-epoch-2.msgpack").exists()
    assert (exp_dir / "metrics.jsonl").exists()
    final = workflow["history"][-1]
    assert np.isfinite(final["train"]["loss"])


def test_student_features_contract(workflow):
    logits = workflow["logits"]
    assert len(logits) == workflow["imdb"].num_tracks
    assert all(l.shape == (1, 8) for l in logits)


def test_roc_analysis_outputs(workflow):
    stats = workflow["stats"]
    assert "train" in stats
    for part, aucs in stats.items():
        assert "meanAuc" in aucs
    figs = list((workflow["root"] / "figs").glob("*.jpg"))
    assert figs, "ROC figures should be written"


def test_benchmark_outputs(workflow):
    result = workflow["results"]["synthetic"]
    assert 0.0 <= result.mean_accuracy <= 1.0
    assert result.confusion.shape == (3, 3)
    assert (workflow["root"] / "figs" / "synthetic-confusion.pdf").exists()


def test_distillation_convergence_regression(tmp_path):
    """Distillation LEARNING regression (the DEMO.md trajectory as CI):
    a seeded tiny-model run on the synthetic imdb must reach unheardVal
    meanAuc > 0.7 — above-chance emotion AUC on a held-out speaker is
    the paper's core claim, and the reference guarded trained-model
    quality with cached benchmark regressions
    (benchmark_ferplus_models.m:42-60). Fully deterministic (seeded data,
    seeded init, deterministic CPU math).

    Recipe sizing (round-3 probes, /tmp-style A/B runs): 48 tracks /
    12 epochs / bs8 = 72 SGD steps at LR 0.1->0.03 with 2 s crops and
    logit_gap=8 soft targets. Smaller recipes (24 tracks / 10 epochs /
    4 s crops / logit_gap=4) sat at loss ~2.06 where the AUC outcome
    flipped between 0.15 and 0.77 on a pure RNG-stream re-roll.

    Margin characterisation (round-4 seed sweep, tools/
    sweep_convergence.py, 12 training seeds with the imdb pinned at
    its CI seed — exactly what an innocuous batcher RNG-stream change
    re-rolls): unheardVal meanAuc in {0.857 x6, 0.917 x1, 1.000 x5},
    worst seed 0.857 -> margin 0.157 over the 0.7 gate; final train
    loss in [1.286, 1.578], worst seed 1.578 -> margin 0.32 over the
    1.9 gate (from the 2.079 ln-8 start against a ~0.6-nat
    target-entropy floor). Both gates clear on every seed by a
    structural margin, so a CI flip indicates a real regression, not
    RNG luck. Raw sweep rows: tools/sweep_convergence.py docstring.
    """
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

    imdb = build_synthetic_imdb(tmp_path / "wavs", num_speakers=6,
                                tracks_per_speaker=8, seed=0)
    cfg = DistillationConfig(num_epochs=12, batch_size=8, tiny_model=True,
                             num_seconds=2.0,
                             mini_epoch_ratio=1.0, mini_val=1.0,
                             lr_start_exp=-1.0, lr_stop_exp=-1.5,
                             out_root=str(tmp_path / "exps"))
    state, history, _ = run_distillation(cfg, imdb=imdb, mesh=None)
    # the loss must have DROPPED decisively (ln 8 = 2.079 start, ~0.6
    # target-entropy floor, 1.46 measured): not just wiggled
    final_loss = history[-1]["train"]["loss"]
    assert final_loss < 1.9, (
        f"final train loss {final_loss:.3f} >= 1.9 — distillation is not "
        "descending (regression in the loss/batcher/engine stack; broken "
        "runs sit at >= 2.05, healthy seeds measured 1.39-1.76)")
    assert history[-1]["train"]["classerror"] < history[0]["train"]["classerror"]

    bare = build_student(tiny=True, with_frontend=False)
    bare_vars = {"params": state.params["net"],
                 "batch_stats": state.model_state["batch_stats"]["net"]}
    logits = compute_audio_feats(imdb, model=bare, variables=bare_vars,
                                 verbose=False)
    stats = student_stats(imdb, student_logits=logits, verbose=False)
    auc = stats["unheardVal"]["meanAuc"]
    assert auc > 0.7, (
        f"unheardVal meanAuc {auc:.3f} <= 0.7 — distillation stopped "
        "learning (regression in the loss/batcher/engine stack)")
