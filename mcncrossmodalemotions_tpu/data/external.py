"""External benchmark dataset adapters (mcnDatasets equivalents).

``getRmlImdb`` / ``getEnterfaceImdb`` / ``getAfewImdb`` counterparts
(compute_audio_feats.m:63-81): build TrackImdb manifests from the
datasets' on-disk layouts, plus synthetic builders for tests.

Layout conventions:

- RML / eNTERFACE (6 basic emotions, no predefined split -> 10-fold CV):
  ``<root>/<emotion>/<track>.wav`` (+ optional ``<track>/`` frame dir).
- AFEW (7 emotions, predefined Train/Val split):
  ``<root>/{Train,Val}/<emotion>/<track>.wav``; tracks without face
  detections can be dropped (getAfewImdb dropTracksWithNoDets) and frame
  lists subsampled by ``subsample_stride``.
"""

from __future__ import annotations

from pathlib import Path
from typing import Sequence

import numpy as np

from mcncrossmodalemotions_tpu.data.imdb import TrackImdb

RML_CLASSES = ("anger", "disgust", "fear", "happiness", "sadness", "surprise")
ENTERFACE_CLASSES = RML_CLASSES
AFEW_CLASSES = ("anger", "disgust", "fear", "happiness", "neutral",
                "sadness", "surprise")


def _scan_emotion_dirs(root: Path, classes: Sequence[str], set_value: int):
    ids, labels, sets, wavs, frames = [], [], [], [], []
    for label, emotion in enumerate(classes):
        emo_dir = root / emotion
        if not emo_dir.is_dir():
            continue
        for wav in sorted(emo_dir.glob("*.wav")):
            ids.append(f"{emotion}/{wav.stem}")
            labels.append(label)
            sets.append(set_value)
            wavs.append(str(wav))
            frame_dir = wav.with_suffix("")
            if frame_dir.is_dir():
                frames.append(np.asarray(
                    sorted(str(p) for p in frame_dir.glob("*.jpg")), dtype=object))
            else:
                frames.append(np.asarray([], dtype=object))
    return ids, labels, sets, wavs, frames


def get_rml_imdb(root: str | Path) -> TrackImdb:
    """RML emotion dataset manifest (6 classes, CV splits downstream)."""
    ids, labels, sets, wavs, frames = _scan_emotion_dirs(
        Path(root), RML_CLASSES, 1)
    return TrackImdb(
        track_ids=np.asarray(ids, dtype=object),
        labels=np.asarray(labels, np.int32),
        set_id=np.asarray(sets, np.int32),
        wav_paths=np.asarray(wavs, dtype=object),
        frame_paths=frames,
        classes=RML_CLASSES,
    )


def get_enterface_imdb(root: str | Path) -> TrackImdb:
    """eNTERFACE'05 manifest (same layout/classes as RML)."""
    imdb = get_rml_imdb(root)
    return imdb


def get_afew_imdb(root: str | Path, drop_tracks_with_no_dets: bool = True,
                  subsample_stride: int = 1) -> TrackImdb:
    """AFEW manifest with predefined Train(1)/Val(2) split.

    ``drop_tracks_with_no_dets`` drops tracks with empty frame lists;
    ``subsample_stride`` thins frame lists (getAfewImdb options,
    compute_audio_feats.m:67-73).
    """
    root = Path(root)
    all_parts = []
    for subset, set_value in (("Train", 1), ("Val", 2)):
        part = _scan_emotion_dirs(root / subset, AFEW_CLASSES, set_value)
        all_parts.append(part)
    ids = sum((p[0] for p in all_parts), [])
    labels = sum((p[1] for p in all_parts), [])
    sets = sum((p[2] for p in all_parts), [])
    wavs = sum((p[3] for p in all_parts), [])
    frames = sum((p[4] for p in all_parts), [])
    if subsample_stride > 1:
        frames = [f[::subsample_stride] for f in frames]
    keep = np.arange(len(ids))
    if drop_tracks_with_no_dets:
        keep = np.asarray([i for i in keep if len(frames[i]) > 0], np.int64)
        if len(keep) == 0:  # audio-only layout: keep everything
            keep = np.arange(len(ids))
    return TrackImdb(
        track_ids=np.asarray(ids, dtype=object)[keep],
        labels=np.asarray(labels, np.int32)[keep],
        set_id=np.asarray(sets, np.int32)[keep],
        wav_paths=np.asarray(wavs, dtype=object)[keep],
        frame_paths=[frames[i] for i in keep],
        classes=AFEW_CLASSES,
    )


def build_synthetic_track_imdb(root: str | Path, classes: Sequence[str] = RML_CLASSES,
                               tracks_per_class: int = 8, seed: int = 0,
                               sample_rate: int = 16000,
                               duration: float = 2.0,
                               with_frames: bool = False,
                               afew_layout: bool = False) -> TrackImdb:
    """Synthetic RML/eNTERFACE/AFEW-style dataset on disk, tone-coded so a
    trained model's logits carry label signal (dev/test pattern)."""
    from mcncrossmodalemotions_tpu.data.audio import write_wav
    from mcncrossmodalemotions_tpu.data.images import save_synthetic_frame

    root = Path(root)
    rng = np.random.RandomState(seed)
    for label, emotion in enumerate(classes):
        for t in range(tracks_per_class):
            if afew_layout:
                subset = "Train" if t < int(tracks_per_class * 0.7) else "Val"
                wav_path = root / subset / emotion / f"track{t:03d}.wav"
            else:
                wav_path = root / emotion / f"track{t:03d}.wav"
            n = int(duration * sample_rate)
            tt = np.arange(n) / sample_rate
            freq = 180.0 + 140.0 * label
            wave = (0.5 * np.sin(2 * np.pi * freq * tt)
                    + 0.05 * rng.randn(n)).astype(np.float32)
            write_wav(wav_path, wave, sample_rate)
            if with_frames:
                frame_dir = wav_path.with_suffix("")
                for k in range(3):
                    save_synthetic_frame(frame_dir / f"{k:02d}.jpg", label,
                                         seed=seed + t * 10 + k)
    if afew_layout:
        return get_afew_imdb(root)
    imdb = get_rml_imdb(root) if tuple(classes) == RML_CLASSES else None
    if imdb is None:
        ids, labels, sets, wavs, frames = _scan_emotion_dirs(root, classes, 1)
        imdb = TrackImdb(
            track_ids=np.asarray(ids, dtype=object),
            labels=np.asarray(labels, np.int32),
            set_id=np.asarray(sets, np.int32),
            wav_paths=np.asarray(wavs, dtype=object),
            frame_paths=frames,
            classes=tuple(classes),
        )
    return imdb
