"""TPU-native cross-modal emotion-distillation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capability set of
``albanie/mcnCrossModalEmotions`` (ACM-MM 2018): FER2013+ facial-emotion
teacher CNNs (ResNet50 / SENet50), a VGGVox-style speech student trained by
cross-modal distillation on EmoVoxCeleb, and the surrounding machinery
(dense teacher inference, spectrogram frontend, ROC analysis, external
benchmark cross-validation).

Layer map (mirrors SURVEY.md section 1, rebuilt TPU-first):

- ``ops``       L0: compute kernels (spectrogram STFT frontend, bilinear
                warp augmentation, image preprocessing) as jittable JAX +
                fused Pallas TPU kernels.
- ``models``    L1/L4: Flax modules (VGG-M student, ResNet50/SENet50
                teacher) with static-config model surgery instead of the
                reference's dynamic DAG mutation.
- ``losses``    L2: pure-JAX loss/metric library (temperature softmax CE
                with logit targets, distributional CE, Euclidean/Huber,
                per-class error stats).
- ``train``     L3: jitted SGD+momentum training engine with epoch
                orchestration, LR-schedule arrays, atomic checkpoints and
                resume (cnn_train_dag equivalent).
- ``parallel``  distributed: data parallelism over a ``jax.sharding.Mesh``
                ICI axis; XLA-inserted psum replaces the reference's
                MATLAB ParameterServer.
- ``data``      L5: imdb/manifest schemas, FER2013+ csv parser, wav and
                spectrogram batch pipeline, external dataset adapters,
                host-side prefetching (C++ data service in ``native/``).
- ``zoo``       L4: model zoo — build teacher/student by name with loss
                stack attached (emoVoxZoo / ferPlusZoo equivalents).
- ``exp``       L6: experiment drivers (run_distillation,
                ferplus_baselines, benchmark_ferplus_models, student_stats,
                teacher_stats, sample_audio, emo_benchmarks, run_cross_val,
                compute_audio_feats, compute_visual_feats equivalents).
- ``utils``     L7/L8: config system (vl_argparse equivalent), logging/ETA,
                ROC/AUC, multinomial logistic regression (mnrfit
                equivalent), struct pretty-printing.
"""

__version__ = "0.1.0"

EMOTIONS = (
    "neutral",
    "happiness",
    "surprise",
    "sadness",
    "anger",
    "disgust",
    "fear",
    "contempt",
)
"""The 8 FERPlus emotion classes, in canonical order.

Matches the reference everywhere it enumerates classes
(emoVoxZoo.m:180-181, teacher/ferPlusZoo.m:260-261, teacher_stats.m:50-51).
"""

NUM_EMOTIONS = len(EMOTIONS)
