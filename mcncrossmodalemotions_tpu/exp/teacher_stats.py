"""Teacher prediction histograms (``teacher_stats.m`` equivalent).

Computes the distribution of dominant teacher predictions over
EmoVoxCeleb (vs an optional comparison set, e.g. AFEW logits) and renders
the log-scale grouped bar figure (teacher_stats.m:47-84).
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional, Sequence

import numpy as np

from mcncrossmodalemotions_tpu import EMOTIONS
from mcncrossmodalemotions_tpu.data.imdb import EmoVoxImdb


def dominant_prediction_histogram(wav_logits: Sequence[np.ndarray],
                                  num_classes: int = 8) -> np.ndarray:
    """Count of wavs whose global max logit is each emotion
    (teacher label convention, student_stats.m:97)."""
    counts = np.zeros(num_classes, np.int64)
    for logits in wav_logits:
        counts[int(logits.max(axis=0).argmax())] += 1
    return counts


def teacher_stats(imdb: EmoVoxImdb,
                  comparison_logits: Optional[Sequence[np.ndarray]] = None,
                  comparison_name: str = "AFEW 6.0",
                  fig_path: Optional[str] = None) -> Dict[str, np.ndarray]:
    """Histogram(s) of dominant teacher predictions + optional figure."""
    hists = {"emovoxceleb": dominant_prediction_histogram(imdb.wav_logits)}
    if comparison_logits is not None:
        hists[comparison_name] = dominant_prediction_histogram(comparison_logits)
    if fig_path:
        plot_histogram(hists, fig_path)
    return hists


def plot_histogram(hists: Dict[str, np.ndarray], out_path: str) -> None:
    """Log-scale grouped bar chart -> PDF (plotHistogram, teacher_stats.m:47-84)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    names = list(hists)
    num_classes = len(next(iter(hists.values())))
    x = np.arange(num_classes)
    width = 0.8 / len(names)
    fig, ax = plt.subplots(figsize=(7, 4))
    for i, name in enumerate(names):
        ax.bar(x + i * width, np.maximum(hists[name], 0.5), width, label=name)
    ax.set_yscale("log")
    ax.set_xticks(x + width * (len(names) - 1) / 2,
                  EMOTIONS[:num_classes], rotation=30, ha="right")
    ax.set_ylabel("tracks (log scale)")
    ax.set_title("dominant teacher predictions")
    ax.legend()
    fig.tight_layout()
    Path(out_path).parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(out_path)
    plt.close(fig)
