"""Student distillation training driver (``run_distillation.m`` equivalent).

Trains the VGG-M speech student to predict the teacher's 8 emotion logits
from audio alone. Defaults mirror run_distillation.m:71-89: 4 s crops,
batch 64, 300 epochs, LR logspace(-4,-5), 'hot-cross-ent' loss with
temperature 2, 'max' logit aggregation, mini-val subsampling with seed 0,
mini-epoch subsetting, experiment dir named from the config with run
metadata dumped alongside (:95-105, :227-240).

TPU-native: the batch loader ships waveforms; spectrogram + student +
loss + backward compile into one jitted step, data-parallel over the
mesh's 'data' axis when a mesh is passed.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Optional

import numpy as np

from mcncrossmodalemotions_tpu import EMOTIONS
from mcncrossmodalemotions_tpu.data.emovox import BatchConfig, EmoVoxBatcher
from mcncrossmodalemotions_tpu.data.imdb import (
    SET_HEARD_VAL,
    SET_TRAIN,
    SET_UNHEARD_VAL,
    EmoVoxImdb,
)
from mcncrossmodalemotions_tpu.train.engine import TrainConfig, Trainer, logspace_lr
from mcncrossmodalemotions_tpu.utils.config import config_hash, write_run_meta
from mcncrossmodalemotions_tpu.zoo import build_student, student_loss_fn


@dataclasses.dataclass(frozen=True)
class DistillationConfig:
    """run_distillation.m:71-89 defaults."""

    teacher: str = "senet50-ferplus"
    student: str = "emovoxceleb-student"
    loss_type: str = "hot-cross-ent"
    temperature: float = 2.0
    num_seconds: float = 4.0
    num_pred_emotions: int = 8
    logit_aggregator: str = "max"
    batch_size: int = 64
    num_epochs: int = 300
    lr_start_exp: float = -4.0
    lr_stop_exp: float = -5.0
    mini_val: float = 0.2        # fraction of val kept (rng seed 0, :141-146)
    mini_epoch_ratio: float = 0.05  # epochSize fraction (:77,154)
    weight_decay: float = 5e-4   # cnn_train_dag default (not overridden
                                 # by run_distillation.m)
    dropout: float = 0.0
    seed: int = 0
    data_root: str = "data/emovoxceleb"
    out_root: str = "exps"
    tiny_model: bool = False     # dev pattern
    use_pallas_frontend: bool = False
    # jax.checkpoint policy for the train step (train/state.py
    # resolve_remat_policy; measured study in docs/PERF.md round-5).
    # Honoured in BOTH the plain and the fused online-teacher step.
    remat_policy: Optional[str] = None
    # fromScratch=false (run_distillation.m:84 via emoVoxZoo.m:25-44):
    # start from the released student weights instead of a fresh init.
    # ``pretrained_student`` is a registry name or .mat path (default:
    # the released 'emovoxceleb-student' artifact).
    from_scratch: bool = True
    pretrained_student: str = "emovoxceleb-student"
    # Online (fused) mode: teacher forward runs inside the student train
    # step on the crop's face frames instead of consuming cached
    # wav_logits (train/distill.py; SURVEY.md "teacher/student
    # co-scheduling"). Requires an imdb with dense_frames + a teacher.
    online_teacher: bool = False
    frames_per_crop: int = 4
    frame_size: int = 224
    # Quarter-bandwidth mu-law uint8 waveform feed (data/audio.pack_mulaw8,
    # decoded on device) — opt-in for link-bound hosts; ~38 dB SNR.
    mulaw_feed: bool = False
    # Augmentation (the reference's transformation-string settings,
    # getBatchEmoVoxCeleb.m:63,217-231): speed perturbation 0.95-1.05 and
    # noise-corpus mixing from numbered wavs in ``noise_dir``
    # (meta.noise.*, :122-131). noise_num=0 disables the corpus.
    speed_aug: bool = False
    noise_dir: Optional[str] = None
    noise_num: int = 0
    noise_vol: float = 0.3

    def exp_name(self) -> str:
        """Experiment identity encoding (run_distillation.m:95-105) + hash.

        Only identity-defining fields are hashed — schedule-length changes
        (num_epochs) or output paths must map to the SAME directory so
        ``continue`` resume works, exactly like the reference's expDir
        naming.
        """
        base = (
            f"{self.teacher}-{self.student}-{self.loss_type}"
            f"-{self.num_seconds:g}s-{self.num_pred_emotions}emo"
            f"-{self.logit_aggregator}-T{self.temperature:g}"
        )
        identity = (self.teacher, self.student, self.loss_type,
                    self.temperature, self.num_seconds,
                    self.num_pred_emotions, self.logit_aggregator,
                    self.dropout, self.seed, self.tiny_model,
                    self.online_teacher, self.lr_start_exp,
                    self.lr_stop_exp, self.weight_decay)
        if not self.from_scratch:
            # a from-release run must not resume a scratch run's dir
            identity += ("from-release", self.pretrained_student)
        if self.speed_aug or self.noise_num > 0:
            # Augmentation changes the training distribution — identity-
            # defining; appended only when set so default hashes stay
            # stable. noise_dir is part of it: different corpora are
            # different training distributions and must not resume each
            # other's checkpoints.
            identity += ("speed" if self.speed_aug else "",
                         self.noise_num, self.noise_vol,
                         self.noise_dir or "")
        if self.mulaw_feed:
            # The lossy mu-law feed (~38 dB SNR) changes the input
            # numerics, so it IS identity-defining — a mu-law run must
            # not silently resume an int16 run's checkpoints. Appended
            # only when set so default-feed hashes stay stable.
            identity += ("mulaw8",)
        suffix = "-online" if self.online_teacher else ""
        return f"{base}{suffix}-{config_hash(identity)}"


def mini_epoch_size(num_tracks: int, ratio: float, num_devices: int,
                    batch_size: int):
    """epochSize from miniEpochRatio (run_distillation.m:77,154).

    The reference default scales the ratio by the data-parallel width
    (``0.05 * numel(opts.gpus)``) so each device sees the same number of
    batches per epoch regardless of mesh size. Returns None (= full
    epoch) once the scaled ratio reaches 1.
    """
    scaled = ratio * num_devices
    if scaled >= 1:
        return None
    return max(int(round(num_tracks * scaled)), batch_size)


def split_imdb(imdb: EmoVoxImdb, mini_val: float, seed: int = 0):
    """Train/val split from set ids, with mini-val subsampling (:137-146).

    Val = unheardVal + heardVal sets; a fixed-seed subset keeps val
    cheap. Returns (train_imdb, val_imdb, train_idx, val_idx) — the
    indices let callers subset per-track sidecars (time_offsets) the
    same way.
    """
    train_idx = np.where(imdb.set_id == SET_TRAIN)[0]
    val_idx = np.where(
        (imdb.set_id == SET_UNHEARD_VAL) | (imdb.set_id == SET_HEARD_VAL)
    )[0]
    if 0 < mini_val < 1 and len(val_idx) > 1:
        rng = np.random.RandomState(seed)
        keep = max(int(round(len(val_idx) * mini_val)), 1)
        val_idx = np.sort(rng.permutation(val_idx)[:keep])
    return imdb.subset(train_idx), imdb.subset(val_idx), train_idx, val_idx


def run_distillation(cfg: DistillationConfig, imdb: Optional[EmoVoxImdb] = None,
                     mesh="auto", resume: bool = True,
                     teacher_model=None, teacher_variables=None,
                     time_offsets=None):
    """Returns (final_state, history, exp_dir).

    ``teacher_model``/``teacher_variables`` are required when
    ``cfg.online_teacher`` is set (the fused mode); the offline mode uses
    the imdb's cached wav_logits. ``mesh="auto"`` builds a data-parallel
    mesh over every visible device (the reference's gpus=[1 2] option,
    run_distillation.m:74) — pass None to force single-device or a Mesh
    to control placement. ``time_offsets`` ([num_tracks] seconds)
    enables the reference's fixedSegments mode (run_distillation.m:86):
    pinned crop starts + whole-track logit targets.
    """
    if mesh == "auto":
        from mcncrossmodalemotions_tpu.parallel.mesh import auto_mesh

        mesh = auto_mesh(cfg.batch_size)
    if imdb is None:
        imdb_path = Path(cfg.data_root) / "emovoxceleb-imdb.npz"
        if not imdb_path.exists():
            raise FileNotFoundError(
                f"{imdb_path} not found — build it with "
                "exp/fetch_emovoxceleb_imdb (or pass a synthetic imdb)"
            )
        imdb = EmoVoxImdb.load(imdb_path)

    train_imdb, val_imdb, train_idx, val_idx = split_imdb(
        imdb, cfg.mini_val, cfg.seed)
    train_offsets = val_offsets = None
    if time_offsets is not None:
        time_offsets = np.asarray(time_offsets, np.float64)
        train_offsets = time_offsets[train_idx]
        val_offsets = time_offsets[val_idx]
    noise = None
    if cfg.noise_num > 0:
        if cfg.noise_dir is None:
            raise ValueError("noise_num > 0 requires noise_dir "
                             "(meta.noise.noisedir)")
        from mcncrossmodalemotions_tpu.data.emovox import NoiseConfig

        noise = NoiseConfig(noise_dir=cfg.noise_dir,
                            num_files=cfg.noise_num,
                            noise_vol=cfg.noise_vol)
    bcfg = BatchConfig(
        num_seconds=cfg.num_seconds,
        batch_size=cfg.batch_size,
        loss_type=cfg.loss_type,
        logit_aggregator=cfg.logit_aggregator,
        num_pred_emotions=cfg.num_pred_emotions,
        speed_aug=cfg.speed_aug,
        noise=noise,
        frames_per_crop=cfg.frames_per_crop if cfg.online_teacher else 0,
        frame_size=cfg.frame_size,
        emit_mulaw=cfg.mulaw_feed,
    )
    train_batcher = EmoVoxBatcher(train_imdb, bcfg, train=True, seed=cfg.seed,
                                  time_offsets=train_offsets)
    # The val pass always scores against the OFFLINE wav_logits targets
    # (make_eval_step) even in online_teacher mode — decoding + shipping
    # face frames for it would more than double the val feed bytes for
    # data the eval step never reads.
    val_batcher = EmoVoxBatcher(val_imdb,
                                dataclasses.replace(bcfg, frames_per_crop=0),
                                train=False, seed=cfg.seed,
                                time_offsets=val_offsets)
    num_devices = (int(np.prod(mesh.devices.shape)) if mesh is not None
                   else 1)
    epoch_size = mini_epoch_size(train_imdb.num_tracks,
                                 cfg.mini_epoch_ratio, num_devices,
                                 cfg.batch_size)

    exp_dir = Path(cfg.out_root) / cfg.exp_name()
    if time_offsets is not None:
        # fixedSegments trains on a different input/target distribution
        # (pinned crops, whole-track targets) — identity-defining, keyed
        # on the offsets themselves so a plain run's checkpoints are
        # never silently resumed.
        exp_dir = exp_dir.with_name(
            exp_dir.name + f"-fixedseg-{config_hash(tuple(time_offsets))}")
    tcfg = TrainConfig(
        num_epochs=cfg.num_epochs,
        batch_size=cfg.batch_size,
        epoch_size=epoch_size,  # engine cap; the batcher also subsamples
        learning_rate=logspace_lr(cfg.lr_start_exp, cfg.lr_stop_exp,
                                  cfg.num_epochs),
        weight_decay=cfg.weight_decay,
        seed=cfg.seed,
        exp_dir=str(exp_dir),
        resume=resume,
        # with an online-teacher override the policy is baked into the
        # step by make_online_distill_step below; Trainer rejects a
        # cfg-level policy alongside an override (it could not apply it)
        remat_policy=None if cfg.online_teacher else cfg.remat_policy,
    )
    pretrained_state = None
    if cfg.from_scratch:
        model = build_student(
            cfg.student,
            num_outputs=cfg.num_pred_emotions,
            dropout=cfg.dropout,
            tiny=cfg.tiny_model,
            use_pallas_frontend=cfg.use_pallas_frontend,
            loss_type=cfg.loss_type,  # euclidean: head /10 (emoVoxZoo.m:140-144)
        )
    else:
        # fromScratch=false: continue from the released student
        # (emoVoxZoo.m:25-44 load path; dims come from the release)
        import jax
        import jax.numpy as jnp

        from mcncrossmodalemotions_tpu.train.state import TrainState
        from mcncrossmodalemotions_tpu.zoo import load_pretrained_student

        model, variables = load_pretrained_student(cfg.pretrained_student,
                                                   with_frontend=True)
        # honour the run config's parameter-free options on the loaded
        # module (dropout has no params; the frontend choice is a
        # compute-path flag) — silently dropping them would train a
        # different model than exp_name() records
        model = dataclasses.replace(
            model, dropout_rate=cfg.dropout,
            use_pallas_frontend=cfg.use_pallas_frontend)
        pretrained_state = TrainState.create(
            jax.tree.map(jnp.asarray, variables),
            jax.random.PRNGKey(cfg.seed))
    loss_fn = student_loss_fn(cfg.loss_type, temperature=cfg.temperature,
                              num_classes=cfg.num_pred_emotions)
    step_override = None
    if cfg.online_teacher:
        if teacher_model is None or teacher_variables is None:
            raise ValueError("online_teacher=True requires teacher_model + "
                             "teacher_variables")
        from mcncrossmodalemotions_tpu.train.distill import (
            make_online_distill_step,
        )
        from mcncrossmodalemotions_tpu.train.state import SGDConfig

        step_override = make_online_distill_step(
            model.apply, teacher_model.apply, teacher_variables,
            loss_type=cfg.loss_type, temperature=cfg.temperature,
            aggregator=cfg.logit_aggregator,
            num_classes=cfg.num_pred_emotions,
            sgd=SGDConfig(weight_decay=cfg.weight_decay),
            rng_names=("dropout",) if cfg.dropout > 0 else (),
            remat_policy=cfg.remat_policy,
            pass_pad_mask=True,  # AudioStudentPipeline: exact BN stats
        )
    trainer = Trainer(model, loss_fn, tcfg,
                      class_names=EMOTIONS[: cfg.num_pred_emotions],
                      mesh=mesh,
                      # with an override the rng streams are baked into
                      # the step by make_online_distill_step; Trainer
                      # rejects redundant knobs alongside an override
                      rng_names=(("dropout",)
                                 if cfg.dropout > 0 and step_override is None
                                 else ()),
                      train_step_override=step_override)

    # Run-metadata dump (storeMetaInfo, run_distillation.m:227-240)
    write_run_meta(exp_dir, cfg,
                   num_train_tracks=int(train_imdb.num_tracks),
                   num_val_tracks=int(val_imdb.num_tracks))

    example = next(iter(train_batcher.batches(epoch=1, epoch_size=cfg.batch_size)))
    state, history = trainer.fit(
        lambda epoch: train_batcher.batches(epoch, epoch_size=epoch_size,
                                            drop_remainder=True),
        val_batches_fn=lambda epoch: val_batcher.batches(epoch),
        state=pretrained_state,  # None -> fresh init from example_batch
        example_batch=example,
    )
    return state, history, exp_dir


def load_student_from_exp(exp_dir, epoch: int | str | None = None,
                          with_frontend: bool = False):
    """Rebuild the trained student of an experiment directory for eval.

    The reference's dev-checkpoint flow (emoVoxZoo.m:46-63: dev names
    resolve to ``net-epoch-N.mat`` inside an experiment dir, losses
    stripped for analysis): the newest run-metadata dump (storeMetaInfo
    equivalent) reconstructs the run's config, the matching module is
    rebuilt, and the requested checkpoint restored —

    - ``epoch=None``: the latest readable checkpoint (last-good fallback)
    - ``epoch='best'``: ``find_best_epoch``'s pick (findBestEpoch)
    - ``epoch=<int>``: that epoch exactly

    Returns ``(model, variables)``. With the default
    ``with_frontend=False`` the pipeline's 'net' nesting is stripped so
    the result drops straight into ``compute_audio_feats`` /
    ``student_stats`` (which feed spectrograms, not waveforms).
    """
    import dataclasses as _dc

    import jax
    import jax.numpy as jnp

    from mcncrossmodalemotions_tpu.ops.spectrogram import DEFAULT_SPEC
    from mcncrossmodalemotions_tpu.train.checkpoints import restore_from_exp
    from mcncrossmodalemotions_tpu.train.state import TrainState
    from mcncrossmodalemotions_tpu.utils.config import (
        read_latest_run_config,
    )

    cfg = read_latest_run_config(exp_dir, DistillationConfig)

    # Rebuild the TRAINING module (frontend pipeline) to restore into;
    # dropout is parameter-free, so eval uses rate 0 without affecting
    # the checkpoint structure. The frontend flag is honoured so the
    # reloaded module matches the recorded run config's compute path.
    if cfg.from_scratch:
        pipeline = build_student(
            cfg.student, num_outputs=cfg.num_pred_emotions, dropout=0.0,
            tiny=cfg.tiny_model, loss_type=cfg.loss_type,
            use_pallas_frontend=cfg.use_pallas_frontend)
    else:
        from mcncrossmodalemotions_tpu.zoo import load_pretrained_student

        pipeline, _ = load_pretrained_student(cfg.pretrained_student,
                                              with_frontend=True)
        pipeline = _dc.replace(
            pipeline, dropout_rate=0.0,
            use_pallas_frontend=cfg.use_pallas_frontend)
    wav = jnp.zeros((1, DEFAULT_SPEC.crop_samples(
        int(round(100 * cfg.num_seconds)))), jnp.float32)
    template = TrainState.create(pipeline.init(jax.random.PRNGKey(0), wav),
                                 jax.random.PRNGKey(0))
    state = restore_from_exp(exp_dir, template, epoch)
    variables = {"params": state.params, **state.model_state}
    if with_frontend:
        return pipeline, variables
    variables = {k: v["net"] for k, v in variables.items()}
    return _bare_student_for(pipeline), variables


def _bare_student_for(pipeline):
    """The spectrogram-input VGGMStudent matching a pipeline's dims."""
    from mcncrossmodalemotions_tpu.models import VGGMStudent

    return VGGMStudent(
        num_outputs=pipeline.num_outputs,
        fc6_features=pipeline.fc6_features,
        fc7_features=pipeline.fc7_features,
        head_init_scale=pipeline.head_init_scale,
        conv1_s2d=pipeline.conv1_s2d,
    )
