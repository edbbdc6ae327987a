"""FER2013+ teacher training/eval driver (``ferplus_baselines.m`` equivalent).

Defaults mirror ferplus_baselines.m:71-92: senet50 teacher,
'distributions' loss vs rater votes (8-class 'CNTK' dataType), dropout
0.5, batch 128, step LR schedule [0.01x60 0.001x60 0.0001x60], random
fliplr + zoom/rotate/skew affine augmentation on half the batch.

Eval-only mode (:120-136): runs a single val pass over the requested
subset with no training, optionally from the best checkpoint
(findBestEpoch with pruning, :121-126).
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Optional

import numpy as np

from mcncrossmodalemotions_tpu import EMOTIONS
from mcncrossmodalemotions_tpu.data.ferplus import FerPlusImdb, ferplus_batches
from mcncrossmodalemotions_tpu.models.teacher_pipeline import FaceTeacherPipeline
from mcncrossmodalemotions_tpu.train import checkpoints as ckpt_lib
from mcncrossmodalemotions_tpu.train.engine import TrainConfig, Trainer
from mcncrossmodalemotions_tpu.utils.config import config_hash
from mcncrossmodalemotions_tpu.zoo import build_teacher, teacher_loss_fn

_SUBSET_IDS = {"train": 1, "val": 2, "test": 3}


def step_lr(values, epochs_each) -> tuple:
    """[0.01*60 0.001*60 0.0001*60]-style schedule (ferplus_baselines.m:79)."""
    out = []
    for v, n in zip(values, epochs_each):
        out.extend([v] * n)
    return tuple(out)


@dataclasses.dataclass(frozen=True)
class FerPlusConfig:
    """ferplus_baselines.m:71-92 defaults."""

    model: str = "senet50-ferplus"
    loss_type: str = "distributions"
    num_classes: int = 8          # 8 = 'CNTK'/'clean' dataTypes, 10 =
                                  # 'full' (ferplus_baselines.m:87-92)
    # Explicit dataType override: 'CNTK' | 'clean' | 'full'
    # (ferplus_baselines.m:62). None derives from num_classes (CNTK/
    # full); 'clean' additionally applies data/ferplus.clean_subset's
    # aggressive consensus filter before training.
    data_type: Optional[str] = None
    batch_size: int = 128
    dropout: float = 0.5
    lr_values: tuple = (0.01, 0.001, 0.0001)
    lr_epochs: tuple = (60, 60, 60)
    momentum: float = 0.9
    weight_decay: float = 5e-4
    finetune_lr: float = 0.1  # backbone LR multiplier (ferplus_baselines.m:74)
    # useBnorm (ferplus_baselines.m:60 -> ferPlusZoo.m:123
    # insertBNLayers): retrofit BatchNorm into BN-less classic models.
    # None keeps each model's own default ('-bn' names on, others off);
    # ResNet teachers carry BN inherently and ignore it.
    use_bnorm: Optional[bool] = None
    augment: bool = True
    # Single-resample augmentation (the reference's composition,
    # ferplus_baselines.m:194-213): host warps straight to input_size in
    # ONE bilinear sample instead of warp@48 + device resize. Measured
    # equivalent on the synthetic benchmark (docs/PERF.md round-4
    # resample study) but (input_size/48)^2 more host work + feed bytes;
    # default keeps the 48x48 host warp.
    augment_at_target: bool = False
    input_size: int = 224
    seed: int = 0
    out_root: str = "exps"
    tiny_model: bool = False
    dev: bool = False             # opts.dev: 1000 train/val, 1 epoch (:59,112-118)
    # Released-weights path (ferPlusZoo.m:103-114): a MatConvNet teacher
    # .mat used as-is — eval runs it directly, training fine-tunes from it.
    pretrained_mat: Optional[str] = None

    def exp_name(self) -> str:
        # Identity fields only (schedule length / paths excluded) so longer
        # schedules resume in place, matching buildExpDirName semantics
        # (ferplus_baselines.m:297-309).
        identity = (self.model, self.loss_type, self.num_classes,
                    self.dropout, self.augment, self.input_size,
                    self.seed, self.tiny_model, self.dev, self.finetune_lr,
                    self.pretrained_mat)  # fine-tune-from-release runs
                    # must not share (and resume from) a scratch run's dir
        if self.augment_at_target:
            # different augmented-image numerics -> different identity;
            # appended only when set so default hashes stay stable
            identity += ("aug-at-target",)
        if self.use_bnorm is not None:
            identity += ("bnorm" if self.use_bnorm else "nobnorm",)
        if self.data_type is not None:
            # 'clean' trains on a filtered dataset — its own exp dir
            # (the reference keys the imdb path on dataType,
            # ferplus_baselines.m:84-85)
            identity += (self.data_type,)
        return f"ferplus-{self.model}-{self.loss_type}-{config_hash(identity)}"


def build_pipeline(cfg: FerPlusConfig) -> FaceTeacherPipeline:
    teacher = build_teacher(cfg.model, num_outputs=cfg.num_classes,
                            dropout=cfg.dropout, tiny=cfg.tiny_model,
                            use_bnorm=cfg.use_bnorm)
    teacher = dataclasses.replace(teacher, head_init_scale=0.01)
    return FaceTeacherPipeline(teacher=teacher, input_size=cfg.input_size,
                               augment=cfg.augment)


def ferplus_baselines(cfg: FerPlusConfig, imdb: FerPlusImdb,
                      evaluate_only: Optional[str] = None,
                      use_best_epoch: bool = False,
                      mesh="auto", resume: bool = True):
    """Train (or eval) the teacher; returns (state, history | eval_stats).

    ``evaluate_only`` in {'val','test'} runs one evaluation pass over that
    subset (ferplus_baselines.m:120-136), loading the best or latest
    checkpoint from the experiment dir. ``mesh="auto"`` goes data-parallel
    over every visible device; None forces single-device.
    """
    if mesh == "auto":
        from mcncrossmodalemotions_tpu.parallel.mesh import auto_mesh

        mesh = auto_mesh(cfg.batch_size)
    if cfg.dev:
        keep = np.concatenate([
            np.where(imdb.set_id == s)[0][:1000] for s in (1, 2, 3)
        ])
        imdb = imdb.subset(np.sort(keep))

    exp_dir = Path(cfg.out_root) / cfg.exp_name()
    num_epochs = 1 if cfg.dev else sum(cfg.lr_epochs)
    tcfg = TrainConfig(
        num_epochs=num_epochs,
        batch_size=cfg.batch_size,
        learning_rate=step_lr(cfg.lr_values, cfg.lr_epochs),
        momentum=cfg.momentum,
        weight_decay=cfg.weight_decay,
        seed=cfg.seed,
        exp_dir=str(exp_dir),
        resume=resume,
    )
    pretrained_vars = None
    fresh_head = False  # base-model surgery re-randomised the classifier
    if cfg.pretrained_mat is not None:
        from mcncrossmodalemotions_tpu.zoo.registry import (
            CLASSIC_MODELS,
            VGGFACE2_MODELS,
            load_pretrained_teacher,
            prepare_classic_from_base,
            prepare_teacher_from_base,
        )

        if cfg.model in VGGFACE2_MODELS + CLASSIC_MODELS:
            # Base model: head-resize surgery + pinned re-init, then
            # fine-tune (ferPlusZoo.m:116-199) — NOT returned as-is.
            # One cache scope spans the params read (prepare_*) and the
            # meta read (release_mean_rgb) so the ~1 GB release parses
            # once and is dropped as soon as both reads finish.
            from mcncrossmodalemotions_tpu.zoo.matconvnet import (
                mat_cache_scope,
            )
            from mcncrossmodalemotions_tpu.zoo.registry import (
                release_mean_rgb,
            )

            with mat_cache_scope():
                if cfg.model in VGGFACE2_MODELS:
                    teacher, tvars = prepare_teacher_from_base(
                        cfg.pretrained_mat, num_outputs=cfg.num_classes,
                        seed=cfg.seed)
                else:
                    teacher, tvars = prepare_classic_from_base(
                        cfg.pretrained_mat, cfg.model,
                        num_outputs=cfg.num_classes, seed=cfg.seed,
                        use_bnorm=cfg.use_bnorm)
                # Normalise with the base release's own averageImage
                # (classic vgg_face mean differs from the VGGFace2
                # default) — the reference reads meta off the loaded dag.
                mean = release_mean_rgb(cfg.pretrained_mat)
            teacher = dataclasses.replace(teacher, dropout_rate=cfg.dropout)
            fresh_head = True
            mean_kw = {"mean_rgb": mean} if mean is not None else {}
            model = FaceTeacherPipeline(teacher=teacher,
                                        input_size=cfg.input_size,
                                        augment=cfg.augment, **mean_kw)
            pretrained_vars = {"params": {"teacher": tvars["params"]}}
            if "batch_stats" in tvars:
                pretrained_vars["batch_stats"] = {
                    "teacher": tvars["batch_stats"]}
        else:
            model, pretrained_vars = load_pretrained_teacher(
                cfg.pretrained_mat, with_pipeline=True,
                input_size=cfg.input_size, augment=cfg.augment)
    else:
        model = build_pipeline(cfg)
    loss_fn = teacher_loss_fn(cfg.loss_type, num_classes=cfg.num_classes)
    rngs = []
    if cfg.augment:
        rngs.append("augment")
    if cfg.dropout > 0:
        rngs.append("dropout")
    from mcncrossmodalemotions_tpu.train.state import finetune_lr_scale_fn

    lr_scale = (finetune_lr_scale_fn(backbone_scale=cfg.finetune_lr)
                if cfg.finetune_lr != 1.0 else None)
    trainer = Trainer(model, loss_fn, tcfg, class_names=EMOTIONS,
                      mesh=mesh, rng_names=rngs, lr_scale_fn=lr_scale)

    data_type = cfg.data_type or ("CNTK" if cfg.num_classes == 8
                                  else "full")
    if data_type not in ("CNTK", "clean", "full"):
        raise ValueError(f"unknown dataType {data_type!r}; known: "
                         "CNTK | clean | full (ferplus_baselines.m:62)")
    expected_classes = 10 if data_type == "full" else 8
    if cfg.num_classes != expected_classes:
        raise ValueError(
            f"dataType {data_type!r} is {expected_classes}-class but "
            f"num_classes={cfg.num_classes} (ferplus_baselines.m:87-92)")
    if data_type == "clean":
        from mcncrossmodalemotions_tpu.data.ferplus import clean_subset

        imdb = clean_subset(imdb)
    example = next(ferplus_batches(imdb, 1, min(cfg.batch_size, 2),
                                   data_type=data_type))

    pretrained_state = None
    if pretrained_vars is not None:
        import jax
        import jax.numpy as jnp

        from mcncrossmodalemotions_tpu.train.state import TrainState

        pretrained_state = TrainState.create(
            jax.tree.map(jnp.asarray, pretrained_vars),
            jax.random.PRNGKey(cfg.seed))

    if evaluate_only is not None:
        subset = _SUBSET_IDS[evaluate_only]
        if pretrained_state is not None:
            if fresh_head:
                raise ValueError(
                    f"{cfg.model!r} is a base model whose classifier was "
                    "just re-initialised (head-resize surgery) — there is "
                    "nothing trained to evaluate. Fine-tune first, or "
                    "evaluate a released ferplus model / a checkpoint.")
            # released model evaluated as-is (ferPlusZoo.m:103-114)
            state = pretrained_state
        else:
            state = trainer.init_state(example)
            epoch = None
            if use_best_epoch:
                epoch = ckpt_lib.find_best_epoch(exp_dir)
            try:
                # restore_from_exp resolves the on-disk path for BOTH
                # backends and raises when nothing is restorable — an
                # eval of a fresh random init must never be reported
                # (and cached by benchmark_ferplus_models) as a result
                state = ckpt_lib.restore_from_exp(exp_dir, state,
                                                  epoch=epoch)
            except FileNotFoundError as exc:
                raise ValueError(
                    f"evaluate_only={evaluate_only!r}: no trained "
                    f"checkpoint in {exp_dir} ({exc}) — train first, or "
                    "evaluate a released model via pretrained_mat") from exc
        _, stats = trainer.run_epoch(
            state,
            ferplus_batches(imdb, subset, cfg.batch_size,
                            data_type=data_type),
            epoch=1, train=False,
        )
        stats["accuracy"] = 1.0 - stats["classerror"]  # benchmark_ferplus_models.m:51-56
        return state, stats

    # Run-metadata dump (the storeMetaInfo pattern the reference applies
    # to the distillation driver, run_distillation.m:227-240, extended
    # here so trained teachers reload from their exp dir alone —
    # load_teacher_from_exp / the dev-checkpoint registry).
    from mcncrossmodalemotions_tpu.utils.config import write_run_meta

    write_run_meta(exp_dir, cfg, data_type=data_type,
                   num_images=int(imdb.data.shape[0]))

    state, history = trainer.fit(
        lambda epoch: ferplus_batches(imdb, 1, cfg.batch_size, shuffle=True,
                                      seed=cfg.seed + epoch,
                                      drop_remainder=True,
                                      data_type=data_type,
                                      augment=cfg.augment,
                                      augment_out_size=(
                                          cfg.input_size
                                          if cfg.augment_at_target
                                          else None)),
        val_batches_fn=lambda epoch: ferplus_batches(
            imdb, 2, cfg.batch_size, data_type=data_type),
        state=pretrained_state,
        example_batch=example,
    )
    return state, history


def benchmark_ferplus_models(imdb: FerPlusImdb, out_root: str = "exps",
                             models=(("resnet50-ferplus", "softmaxlog"),
                                     ("senet50-ferplus", "distributions")),
                             tiny_model: bool = False,
                             base_cfg: Optional[FerPlusConfig] = None,
                             cache_dir: Optional[str] = None,
                             pretrained_mats: Optional[dict] = None,
                             refresh: bool = False):
    """``benchmark_ferplus_models.m`` equivalent: val+test accuracy table.

    Evaluates each (model, loss) pair on FER+ val and test via eval-only
    runs; results cached per model (:40-60), ``refresh`` re-evaluates past
    the cache (:22). ``base_cfg`` carries the training-time options so
    eval resolves the same experiment dir. ``pretrained_mats`` maps a
    model name to a released .mat path so the benchmark runs the released
    weights directly (the reference's download-on-miss path,
    ferPlusZoo.m:103-114).
    """
    results = {}
    for model_name, loss_type in models:
        mat = (pretrained_mats or {}).get(model_name)
        if base_cfg is not None:
            cfg = dataclasses.replace(base_cfg, model=model_name,
                                      loss_type=loss_type, out_root=out_root,
                                      tiny_model=tiny_model,
                                      pretrained_mat=mat)
        else:
            cfg = FerPlusConfig(model=model_name, loss_type=loss_type,
                                out_root=out_root, tiny_model=tiny_model,
                                pretrained_mat=mat)
        # cache keyed by the full eval configuration (exp_name carries the
        # config hash) — a rerun with different weights/input size must
        # re-evaluate, not report the stale numbers
        cache = (Path(cache_dir) / f"{cfg.exp_name()}.json") if cache_dir \
            else None
        if cache and cache.exists() and not refresh:
            results[model_name] = json.loads(cache.read_text())
            continue
        row = {}
        for subset in ("val", "test"):
            _, stats = ferplus_baselines(cfg, imdb, evaluate_only=subset)
            row[f"{subset}Acc"] = stats["accuracy"]
        results[model_name] = row
        if cache:
            cache.parent.mkdir(parents=True, exist_ok=True)
            cache.write_text(json.dumps(row))
        print(f"{model_name}: val {row['valAcc']:.3f} test {row['testAcc']:.3f}")
    return results


def load_teacher_from_exp(exp_dir, epoch: int | str | None = None,
                          with_pipeline: bool = True):
    """Rebuild the trained teacher of a ferplus_baselines exp dir.

    The teacher side of the dev-checkpoint flow (ferPlusZoo.m:63-92:
    dev names resolve to ``net-epoch-N`` files inside experiment dirs,
    losses stripped for analysis): the newest run-metadata dump
    reconstructs the run's :class:`FerPlusConfig`, the matching module
    is rebuilt and the requested checkpoint restored — ``epoch=None``
    latest (last-good fallback), ``'best'`` = ``find_best_epoch``'s
    pick, int = that epoch. Returns ``(model, variables)``; with the
    default ``with_pipeline=True`` the model is the
    :class:`FaceTeacherPipeline` (eval flags: augment off, dropout 0),
    ready for ``compute_visual_feats``/dense inference.

    Runs fine-tuned from a base release (``pretrained_mat``) rebuild
    their module through the same surgery path, so the recorded .mat
    must still be readable.
    """
    import jax
    import jax.numpy as jnp

    from mcncrossmodalemotions_tpu.train.state import TrainState
    from mcncrossmodalemotions_tpu.utils.config import (
        read_latest_run_config,
    )

    cfg = read_latest_run_config(exp_dir, FerPlusConfig)

    if cfg.pretrained_mat is not None:
        from mcncrossmodalemotions_tpu.zoo.matconvnet import mat_cache_scope
        from mcncrossmodalemotions_tpu.zoo.registry import (
            CLASSIC_MODELS,
            VGGFACE2_MODELS,
            load_pretrained_teacher,
            prepare_classic_from_base,
            prepare_teacher_from_base,
            release_mean_rgb,
        )

        # Same params+meta reads as the training path — including the
        # release's OWN averageImage: mean_rgb is a module attribute,
        # not a checkpointed param, so omitting it here would evaluate
        # the reloaded teacher under a different input normalisation
        # than it was trained with.
        with mat_cache_scope():
            if cfg.model in VGGFACE2_MODELS:
                teacher, _ = prepare_teacher_from_base(
                    cfg.pretrained_mat, num_outputs=cfg.num_classes,
                    seed=cfg.seed)
            elif cfg.model in CLASSIC_MODELS:
                teacher, _ = prepare_classic_from_base(
                    cfg.pretrained_mat, cfg.model,
                    num_outputs=cfg.num_classes, seed=cfg.seed,
                    use_bnorm=cfg.use_bnorm)
            else:
                pipe, _ = load_pretrained_teacher(cfg.pretrained_mat,
                                                  with_pipeline=True,
                                                  input_size=cfg.input_size)
                teacher = pipe.teacher
            mean = (pipe.mean_rgb if cfg.model not in
                    VGGFACE2_MODELS + CLASSIC_MODELS
                    else release_mean_rgb(cfg.pretrained_mat))
        teacher = dataclasses.replace(teacher, dropout_rate=0.0)
        mean_kw = {"mean_rgb": mean} if mean is not None else {}
        model = FaceTeacherPipeline(teacher=teacher,
                                    input_size=cfg.input_size,
                                    augment=False, **mean_kw)
    else:
        model = build_pipeline(cfg)
        model = dataclasses.replace(
            model, augment=False,
            teacher=dataclasses.replace(model.teacher, dropout_rate=0.0))
    x = jnp.zeros((1, 48, 48, 1), jnp.uint8)
    template = TrainState.create(model.init(jax.random.PRNGKey(0), x),
                                 jax.random.PRNGKey(0))
    state = ckpt_lib.restore_from_exp(exp_dir, template, epoch)
    variables = {"params": state.params, **state.model_state}
    if with_pipeline:
        return model, variables
    variables = {k: v["teacher"] for k, v in variables.items()}
    return model.teacher, variables
