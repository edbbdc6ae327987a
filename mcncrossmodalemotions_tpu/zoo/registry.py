"""Model + loss registry (emoVoxZoo.m / ferPlusZoo.m equivalents)."""

from __future__ import annotations

from typing import Callable, Optional


from mcncrossmodalemotions_tpu.losses import (
    class_error,
    distillation_ce,
    distribution_ce,
    euclidean_loss,
    huber_loss,
    per_class_stats,
    softmax_ce,
)
from mcncrossmodalemotions_tpu.models.pipeline import AudioStudentPipeline
from mcncrossmodalemotions_tpu.models.resnet import ResNet, ResNet50, SENet50
from mcncrossmodalemotions_tpu.models.vggm import VGGMStudent
from mcncrossmodalemotions_tpu.ops.spectrogram import DEFAULT_SPEC, SpecConfig

STUDENT_MODELS = ("emovoxceleb-student",)
TEACHER_MODELS = ("resnet50-ferplus", "senet50-ferplus")
# VGGFace2-pretrained base models (ferPlusZoo.m:37-42) — the starting
# points for FER+ teacher fine-tuning. Same ResNet50/SENet50
# architectures; weights load via prepare_teacher_from_base.
VGGFACE2_MODELS = ("resnet50_ft-dag", "resnet50_scratch-dag",
                   "senet50_ft-dag", "senet50_scratch-dag")
# Classic pre-ResNet face models (ferPlusZoo.m:44-59 standardModels/
# ferModels/sfewModels): VGG-VD-16 and VGG-M stacks (models/vggface.py);
# '-bn' names carry BatchNorm, the rest accept the useBnorm insertion
# via build_teacher(use_bnorm=True). 'resnet50-face-sfew' is a plain
# ResNet50 and is handled with the ResNet names.
CLASSIC_MODELS = ("vgg_face", "vgg-vd-face", "vgg-vd-face-fer",
                  "vgg-vd-face-sfew", "vgg-vd-face-sfew-dag",
                  "vgg-m-face-bn", "vgg-m-face-bn-fer")


def build_student(name: str = "emovoxceleb-student", *,
                  num_outputs: int = 8,
                  dropout: float = 0.0,
                  spec: SpecConfig = DEFAULT_SPEC,
                  with_frontend: bool = True,
                  use_pallas_frontend: bool = False,
                  loss_type: str | None = None,
                  use_bnorm: bool = True,
                  tiny: bool = False):
    """Student zoo (emoVoxZoo.m:25-31 names; scratch init path :202-243).

    ``with_frontend=True`` returns the waveform->logits pipeline module;
    False returns the bare spectrogram-input VGG-M. ``tiny`` builds a
    width-reduced variant for tests/dev (the opts.dev pattern).
    ``loss_type`` mirrors the zoo's loss-specific surgery: for
    'euclidean' the head params are scaled down a further 10x "to
    prevent exploding gradients" (emoVoxZoo.m:140-144).
    """
    if name not in STUDENT_MODELS:
        raise KeyError(f"unknown student {name!r}; known: {STUDENT_MODELS}")
    kw = dict(num_outputs=num_outputs)
    if loss_type == "euclidean":
        kw["head_init_scale"] = 1e-4 / 10.0
    if tiny:
        kw.update(fc6_features=64, fc7_features=32)
    if with_frontend:
        if not use_bnorm:
            raise ValueError("use_bnorm=False is only supported for the "
                             "bare model (with_frontend=False)")
        return AudioStudentPipeline(
            spec=spec, dropout_rate=dropout,
            use_pallas_frontend=use_pallas_frontend, **kw,
        )
    return VGGMStudent(dropout_rate=dropout, use_batchnorm=use_bnorm, **kw)


def resolve_release(name_or_path, download: bool = True):
    """Map a released-model NAME to a local .mat path (download-on-miss,
    emoVoxZoo.m:74-102 / ferPlusZoo fetchModel equivalent); existing
    file paths pass through untouched."""
    import os

    if os.path.exists(str(name_or_path)):
        return name_or_path
    from mcncrossmodalemotions_tpu.zoo.artifacts import (ARTIFACTS,
                                                         fetch_artifact)

    if str(name_or_path) in ARTIFACTS:
        return fetch_artifact(str(name_or_path), download=download)
    return name_or_path  # a path that doesn't exist yet -> error downstream


def load_pretrained_student(mat_path, *, with_frontend: bool = True,
                            spec: SpecConfig = DEFAULT_SPEC,
                            download: bool = True):
    """Load a released MatConvNet student .mat into the Flax model.

    The fromScratch=False path of emoVoxZoo (emoVoxZoo.m:25-44): returns
    (model, variables) with imported weights, ready for eval or continued
    training. Architecture dims (fc6/fc7/head widths) come from the
    release. With ``with_frontend`` the variables are nested under the
    pipeline's 'net' submodule. ``mat_path`` may be a registry name
    ('emovoxceleb-student'), resolved download-on-miss.
    """
    import numpy as np

    from mcncrossmodalemotions_tpu.zoo.matconvnet import (
        import_vggm_student,
        mat_cache_scope,
    )

    mat_path = resolve_release(mat_path, download=download)

    with mat_cache_scope():
        variables = import_vggm_student(mat_path)
    # VGGMStudent convs are bias-free (the following BN absorbs the bias):
    # a released bias b shifts the BN input, and the release's running
    # mean mu was estimated on conv(x)+b, so dropping b must shift the
    # mean to mu-b to keep (z-mu)/sigma identical.
    bn_for = {f"conv{i}": f"bn{i}" for i in range(1, 6)}
    bn_for["fc6"] = "bn6"
    for conv_name, bn_name in bn_for.items():
        conv = variables["params"].get(conv_name, {})
        bias = conv.pop("bias", None)
        if bias is not None and bn_name in variables["batch_stats"]:
            stats = variables["batch_stats"][bn_name]
            stats["mean"] = np.asarray(stats["mean"]) - np.asarray(bias)
    params = variables["params"]
    fc6 = int(params["fc6"]["kernel"].shape[-1])
    fc7 = int(params["fc7"]["kernel"].shape[-1])
    num_outputs = int(params["prediction"]["kernel"].shape[-1])
    if with_frontend:
        model = AudioStudentPipeline(spec=spec, num_outputs=num_outputs,
                                     fc6_features=fc6, fc7_features=fc7)
    else:
        model = VGGMStudent(num_outputs=num_outputs, fc6_features=fc6,
                            fc7_features=fc7)
    if with_frontend:
        variables = {"params": {"net": variables["params"]},
                     "batch_stats": {"net": variables["batch_stats"]}}
    return model, variables


def _fold_teacher_conv_biases(arch, variables) -> None:
    """ResNet convs are bias-free (BN follows); fold any released conv
    bias into the BN running mean (mean' = mean - bias keeps
    (z-mu)/sigma identical) — same invariance as
    load_pretrained_student. Mutates ``variables`` in place."""
    import numpy as np

    def fold(node_params, node_stats, conv_name, bn_name):
        conv = node_params.get(conv_name)
        if conv is None:
            return
        bias = conv.pop("bias", None)
        if bias is not None and bn_name in node_stats:
            stats = node_stats[bn_name]
            stats["mean"] = np.asarray(stats["mean"]) - np.asarray(bias)

    fold(variables["params"], variables["batch_stats"], "conv1", "bn1")
    for s, num_blocks in enumerate(arch["stage_sizes"], start=1):
        for b in range(num_blocks):
            block = f"layer{s}_{b}"
            bp = variables["params"].get(block, {})
            bs = variables["batch_stats"].get(block, {})
            for conv_name, bn_name in (("conv1", "bn1"), ("conv2", "bn2"),
                                       ("conv3", "bn3"),
                                       ("downsample", "bn_down")):
                fold(bp, bs, conv_name, bn_name)


def prepare_teacher_from_base(mat_path, *, num_outputs: int = 8,
                              seed: int = 0, download: bool = True):
    """Fine-tune entry point: VGGFace2 base model -> FER+-ready teacher.

    The reference's scratch-surgery path (ferPlusZoo.m:116-199
    prepareFromDagNN): load a pretrained base .mat (e.g. the 8631-way
    'senet50_ft-dag'), strip the loss/softmax layers (implicit here —
    the importer reads only the conv/bn stack), resize the final
    classifier to ``num_outputs`` and re-initialise it with a pinned RNG
    at scale 1/100 (:163-168) with zero biases. Returns
    (model, variables) ready for ``exp/ferplus_baselines`` fine-tuning
    (finetune LR scaling on all non-head params comes from
    ``train/state.finetune_lr_scale_fn``, ferPlusZoo.m:236-237).

    ``mat_path`` may be a registry name ('senet50_ft-dag', ...),
    resolved download-on-miss via zoo/artifacts.py.
    """
    import jax

    from mcncrossmodalemotions_tpu.models.surgery import reinit_head
    from mcncrossmodalemotions_tpu.zoo.matconvnet import (
        import_teacher,
        mat_cache_scope,
    )

    mat_path = resolve_release(mat_path, download=download)
    with mat_cache_scope():
        arch, variables = import_teacher(mat_path)
    _fold_teacher_conv_biases(arch, variables)
    variables = reinit_head(variables, num_outputs,
                            jax.random.PRNGKey(seed), scale=1.0 / 100.0)
    model = ResNet(stage_sizes=arch["stage_sizes"], use_se=arch["use_se"],
                   width=arch["width"], num_outputs=num_outputs)
    return model, variables


def _fold_classic_conv_biases(variables) -> None:
    """Fold released conv/fc biases into their BN running means for a
    '-bn' classic import (VGGFace builds those convs bias-free; silently
    dropping a released bias would shift every activation). Same
    mean' = mean - bias invariance as _fold_teacher_conv_biases."""
    import numpy as np

    params = variables["params"]
    stats = variables.get("batch_stats", {})
    for k in list(params):
        bn = f"bn_{k}"
        if bn in stats:
            bias = params[k].pop("bias", None)
            if bias is not None:
                stats[bn]["mean"] = (np.asarray(stats[bn]["mean"])
                                     - np.asarray(bias))


def prepare_classic_from_base(mat_path, name, *, num_outputs: int = 8,
                              seed: int = 0,
                              use_bnorm: Optional[bool] = None,
                              download: bool = True):
    """Classic VGG face base .mat -> FER+-ready teacher.

    The ferPlusZoo classic path (ferPlusZoo.m:44-59 names + :116-199
    surgery): import the release (e.g. the 2622-way vgg_face), fold conv
    biases into BN means for '-bn' models, resize the classifier to
    ``num_outputs`` with the pinned 1/100 re-init and zero biases.
    """
    import jax

    from mcncrossmodalemotions_tpu.models.surgery import reinit_head
    from mcncrossmodalemotions_tpu.zoo.matconvnet import (
        import_classic_teacher,
        mat_cache_scope,
    )

    model = build_teacher(name, num_outputs=num_outputs, use_bnorm=use_bnorm)
    mat_path = resolve_release(mat_path, download=download)
    with mat_cache_scope():
        variables = import_classic_teacher(mat_path, model)
    if model.use_batchnorm:
        _fold_classic_conv_biases(variables)
    variables = reinit_head(variables, num_outputs,
                            jax.random.PRNGKey(seed), scale=1.0 / 100.0)
    return model, variables


def release_mean_rgb(mat_path, download: bool = True):
    """Per-channel mean from a release's ``normalization.averageImage``.

    Returns an RGB 3-tuple or None. Classic releases store a full
    HxWx3 average IMAGE (vgg_face) while the VGGFace2 dags store a
    3-vector; a full image is reduced to its per-channel means (what
    subtracting it approximates once crops are random). Used wherever a
    FaceTeacherPipeline is built around imported weights, so the
    pipeline normalises with the release's own statistics
    (ferplus_baselines.m:194-213 reads meta from the loaded dag).
    """
    import numpy as np

    from mcncrossmodalemotions_tpu.zoo.matconvnet import (
        load_mat_meta,
        mat_cache_scope,
    )

    with mat_cache_scope():
        avg = load_mat_meta(resolve_release(
            mat_path, download=download)).get("averageImage")
    if avg is None:
        return None
    avg = np.asarray(avg, np.float64)
    if avg.size <= 3:
        return tuple(float(v) for v in avg.reshape(-1)[:3])
    return tuple(float(v) for v in avg.reshape(-1, avg.shape[-1])
                 .mean(axis=0)[:3])


def load_pretrained_teacher(mat_path, *, with_pipeline: bool = False,
                            input_size: int = 224, augment: bool = False,
                            download: bool = True):
    """Load a released MatConvNet teacher .mat into the Flax ResNet/SENet.

    The pretrained path of ferPlusZoo (ferPlusZoo.m:103-114: "pretrained
    ferplus models returned as-is" — no surgery, losses attachable on
    top). Architecture (stage sizes, SE blocks, width, head dims) is
    inferred from the param names/shapes. Returns (model, variables);
    with ``with_pipeline`` the model is a ``FaceTeacherPipeline`` whose
    ``mean_rgb`` comes from the release's ``normalization.averageImage``
    when present (fetch_emovoxceleb_imdb.m:186-193), with variables
    nested under the 'teacher' submodule. ``mat_path`` may be a registry
    name ('senet50-ferplus'), resolved download-on-miss.
    """
    from mcncrossmodalemotions_tpu.zoo.matconvnet import (
        import_teacher,
        mat_cache_scope,
    )

    mat_path = resolve_release(mat_path, download=download)

    with mat_cache_scope():  # params + meta read from one ~1 GB parse
        arch, variables = import_teacher(mat_path)
        _fold_teacher_conv_biases(arch, variables)
        model = ResNet(stage_sizes=arch["stage_sizes"],
                       use_se=arch["use_se"],
                       width=arch["width"], num_outputs=arch["num_outputs"])
        if with_pipeline:
            from mcncrossmodalemotions_tpu.models.teacher_pipeline import (
                FaceTeacherPipeline)

            mean = release_mean_rgb(mat_path, download=download)
            kw = {"mean_rgb": mean} if mean is not None else {}
            model = FaceTeacherPipeline(teacher=model, input_size=input_size,
                                        augment=augment, **kw)
            variables = {"params": {"teacher": variables["params"]},
                         "batch_stats": {"teacher": variables["batch_stats"]}}
    return model, variables


def build_teacher(name: str = "senet50-ferplus", *,
                  num_outputs: int = 8,
                  dropout: float = 0.0,
                  use_bnorm: Optional[bool] = None,
                  tiny: bool = False):
    """Teacher zoo (ferPlusZoo.m:37-92 registry, 8-way CNTK head).

    ResNet/SENet names build `models/resnet.ResNet`; the classic VGG
    face names (CLASSIC_MODELS) build `models/vggface.VGGFace`.
    ``dropout`` is the reference's insert_dropout option
    (ferPlusZoo.m:213-233): dropout after the last convs, before the
    classifier. ``use_bnorm`` is the ``useBnorm`` insertion option
    (ferPlusZoo.m:123, insertBNLayers): it retrofits BatchNorm into the
    BN-less classics (default: on for the '-bn' names, off otherwise);
    the ResNet teachers carry BN inherently and ignore it.
    """
    if name in CLASSIC_MODELS:
        from mcncrossmodalemotions_tpu.models.vggface import VGGFace

        arch = "m" if name.startswith("vgg-m") else "vd"
        bn = ("-bn" in name) if use_bnorm is None else use_bnorm
        kw = dict(arch=arch, use_batchnorm=bn, num_outputs=num_outputs,
                  dropout_rate=dropout)
        if tiny:
            return VGGFace(width_multiplier=1 / 16, fc_features=64, **kw)
        return VGGFace(**kw)
    known = TEACHER_MODELS + VGGFACE2_MODELS + ("resnet50-face-sfew",)
    if name not in known:
        raise KeyError(f"unknown teacher {name!r}; known: "
                       f"{known + CLASSIC_MODELS}")
    use_se = name.startswith("senet")
    if tiny:
        return ResNet(stage_sizes=(1, 1), width=8, use_se=use_se,
                      num_outputs=num_outputs, dropout_rate=dropout)
    kw = dict(num_outputs=num_outputs, dropout_rate=dropout)
    return SENet50(**kw) if use_se else ResNet50(**kw)


# Dev-checkpoint registry (ferPlusZoo.m:63-92): development model names
# pinned to specific training epochs inside their experiment dirs. The
# reference resolves these to net-epoch-N.mat under a 'grimaces'
# subfolder; here they resolve to this framework's checkpoint files
# inside the corresponding experiment directory.
DEV_CHECKPOINTS = {
    "resnet50_ft-dag-dropout-0.1":
        ("grimaces/resnet50_ft-dag-dropout-0.1", 17),
    "resnet50_ft-dag-dropout-0.5":
        ("grimaces/resnet50_ft-dag-dropout-0.5", 122),
    "senet50_ft-dag-distributions-dropout-0.5-aug":
        ("grimaces/senet50_ft-dag-distributions-dropout-0.5-aug", 98),
    "senet50_ft-dag-distributions-CNTK-dropout-0.5-aug":
        ("grimaces/senet50_ft-dag-distributions-CNTK-dropout-0.5-aug", 90),
}


def _resolve_dev(name: str):
    """(exp subdir, pinned epoch) for a dev model name, or KeyError."""
    if name not in DEV_CHECKPOINTS:
        raise KeyError(f"unknown dev checkpoint {name!r}; known: "
                       f"{sorted(DEV_CHECKPOINTS)}")
    return DEV_CHECKPOINTS[name]


def dev_checkpoint_path(name: str, exps_root):
    """Resolve a dev model name to its pinned epoch checkpoint path
    (ferPlusZoo.m:63-92 'net-epoch-N' mapping)."""
    from pathlib import Path

    from mcncrossmodalemotions_tpu.train.checkpoints import checkpoint_path

    subdir, epoch = _resolve_dev(name)
    return checkpoint_path(Path(exps_root) / subdir, epoch)


def load_dev_checkpoint(name: str, exps_root):
    """Load a dev teacher by name at its pinned epoch (the full
    ferPlusZoo.m:63-92 flow: name -> exp dir + epoch -> restored model
    with losses stripped). Returns (model, variables) via
    ``exp.ferplus_baselines.load_teacher_from_exp``."""
    from pathlib import Path

    from mcncrossmodalemotions_tpu.exp.ferplus_baselines import (
        load_teacher_from_exp,
    )

    subdir, epoch = _resolve_dev(name)
    return load_teacher_from_exp(Path(exps_root) / subdir, epoch=epoch)


def student_loss_fn(loss_type: str = "hot-cross-ent", *,
                    temperature: float = 2.0,
                    num_classes: int = 8) -> Callable:
    """Student distillation loss stack (emoVoxZoo.m:137-169).

    Every variant also reports the reference's metric layers: classerror
    vs the teacher's max label (VerboseLoss) + per-class stats
    (ErrorStats).
    """

    def loss_fn(logits, batch):
        labels = batch["max_label"]
        w = batch.get("pad_mask")  # 0 on mesh-padding rows (train/engine.py)
        if loss_type == "hot-cross-ent":
            loss = distillation_ce(logits, batch["logit_target"], temperature,
                                   sample_weight=w)
        elif loss_type == "euclidean":
            loss = euclidean_loss(logits, batch["logit_target"],
                                  batch.get("instance_weights"),
                                  sample_weight=w)
        elif loss_type == "huber":
            loss = huber_loss(logits, batch["logit_target"], sigma=1.0,
                              instance_weights=batch.get("instance_weights"),
                              sample_weight=w)
        elif loss_type == "softmaxlog":
            loss = softmax_ce(logits, labels, sample_weight=w)
        else:
            raise ValueError(f"unknown loss_type {loss_type!r}")
        correct, pop = per_class_stats(logits, labels, num_classes,
                                       sample_weight=w)
        metrics = {
            "classerror": class_error(logits, labels, sample_weight=w),
            "class_correct": correct,
            "class_pop": pop,
        }
        return loss, metrics

    return loss_fn


def teacher_loss_fn(loss_type: str = "distributions",
                    num_classes: int = 8) -> Callable:
    """Teacher loss stack (ferPlusZoo.m:239-255): 'distributions' CE vs
    rater-vote distributions (classerror vs hard label) or 'softmaxlog'."""

    def loss_fn(logits, batch):
        hard = batch["hard_label"]
        w = batch.get("pad_mask")  # 0 on mesh-padding rows (train/engine.py)
        if loss_type == "distributions":
            loss = distribution_ce(logits, batch["label_dist"],
                                   sample_weight=w)
        elif loss_type == "softmaxlog":
            loss = softmax_ce(logits, hard, sample_weight=w)
        else:
            raise ValueError(f"unknown loss_type {loss_type!r}")
        correct, pop = per_class_stats(logits, hard, num_classes,
                                       sample_weight=w)
        metrics = {
            "classerror": class_error(logits, hard, sample_weight=w),
            "class_correct": correct,
            "class_pop": pop,
        }
        return loss, metrics

    return loss_fn
