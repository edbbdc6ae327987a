"""Experiment drivers (L6): the user-facing entry points.

One module per reference driver (SURVEY.md section 2.1):

- ``run_distillation``        student distillation training
- ``ferplus_baselines``       FER2013+ teacher training/eval (+
                              ``benchmark_ferplus_models``)
- ``fetch_emovoxceleb_imdb``  dense teacher inference / imdb genesis
- ``compute_audio_feats``     bucketed student feature extraction
- ``compute_visual_feats``    batched teacher feature extraction
- ``student_stats``           heard/unheard per-emotion ROC/AUC
- ``teacher_stats``           teacher prediction histograms
- ``sample_audio``            qualitative per-emotion sample packs
- ``run_cross_val``           k-fold mnr cross-validation engine
- ``emo_benchmarks``          external benchmark evaluation (RML/
                              eNTERFACE/AFEW)

CLI access: ``python -m mcncrossmodalemotions_tpu.cli <command> k=v ...``.
"""
