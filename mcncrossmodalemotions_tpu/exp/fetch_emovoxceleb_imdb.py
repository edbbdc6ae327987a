"""EmoVoxCeleb imdb construction (``fetch_emovoxceleb_imdb.m`` equivalent).

Builds (or loads from cache) the teacher-logit imdb: crawls the VoxCeleb
face-frame tree, registers frames to wav tracks (dropping frameless
tracks and unclaimed frames, :228-285), runs dense teacher inference
over every frame (batch 128, :119-136), and regroups the logits per wav
into ``wav_logits`` matrices (:140-148). In-process + on-disk caching
replaces the reference's global-variable cache + downloaded .mat
(:16-40, :288-324).

Expected layout (mirroring the reference's data conventions):
    <root>/wavs/<speaker>/<track>.wav
    <root>/frames/<speaker>/<track>/*.jpg   (every 6th video frame)
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

from mcncrossmodalemotions_tpu.data.imdb import EmoVoxImdb

_MEMORY_CACHE: Dict[str, EmoVoxImdb] = {}  # dev_cache equivalent (misc/dev_cache.m)


def register_frames(wav_paths: List[str], frame_root: Path) -> tuple:
    """Map each wav track to its dense frame list.

    Tracks without frames are dropped (the reference drops 134,
    :268-275); frames without a wav are ignored (1217 unclaimed, :276-281).
    Returns (kept_wav_indices, frames_per_kept_track).
    """
    kept, frames = [], []
    for i, rel in enumerate(wav_paths):
        frame_dir = frame_root / Path(rel).with_suffix("")
        if not frame_dir.is_dir():
            continue
        jpgs = sorted(str(p.relative_to(frame_root)) for p in frame_dir.glob("*.jpg"))
        if not jpgs:
            continue
        kept.append(i)
        frames.append(np.asarray(jpgs, dtype=object))
    return np.asarray(kept, np.int64), frames


def build_imdb(root: str | Path, teacher_model, teacher_variables,
               set_assignment: Optional[Dict[str, int]] = None,
               batch_size: int = 128,
               limit: Optional[int] = None,
               mesh=None,
               partial_path: Optional[str] = None,
               max_frames_per_process: Optional[int] = None,
               teacher_spec: Optional[dict] = None,
               verbose: bool = True) -> EmoVoxImdb:
    """Dense teacher inference over all registered frames -> EmoVoxImdb.

    ``set_assignment`` maps speaker id -> set (1/2/3); defaults to 1.
    ``limit`` caps processed tracks (the opts.limit dev pattern, :62).
    ``max_frames_per_process`` + ``teacher_spec`` run the dense pass as
    bounded worker subprocesses over the partial checkpoint
    (exp/dense_chunked.py; requires ``partial_path``) — for rigs whose
    device client leaks RSS over multi-hour runs (the 5.08M-frame
    build; tools/soak_dense_genesis.py isolated the leak).
    """
    from mcncrossmodalemotions_tpu import EMOTIONS
    from mcncrossmodalemotions_tpu.exp.compute_visual_feats import (
        VisualFeatureExtractor,
    )

    root = Path(root)
    wav_root, frame_root = root / "wavs", root / "frames"
    wav_paths = sorted(
        str(p.relative_to(wav_root)) for p in wav_root.rglob("*.wav")
    )
    kept, frames = register_frames(wav_paths, frame_root)
    if limit:
        kept, frames = kept[:limit], frames[:limit]
    wav_paths = [wav_paths[i] for i in kept]
    speakers = [p.split("/")[0] for p in wav_paths]
    sets = np.asarray(
        [(set_assignment or {}).get(s, 1) for s in speakers], np.int32
    )

    # CropSize 1/1.6 for the VoxCeleb frames (fetch_emovoxceleb_imdb.m:169)
    flat = [str(frame_root / f) for track in frames for f in track]
    if verbose:
        print(f"dense teacher inference over {len(flat)} frames "
              f"({len(wav_paths)} tracks)")
    if max_frames_per_process:
        from mcncrossmodalemotions_tpu.exp.dense_chunked import (
            chunked_frame_logits,
        )

        if not (partial_path and teacher_spec):
            raise ValueError("max_frames_per_process requires "
                             "partial_path and teacher_spec")
        all_logits = chunked_frame_logits(
            teacher_spec, teacher_variables, flat, partial_path,
            chunk_frames=max_frames_per_process, batch_size=batch_size,
            crop_ratio=1.0 / 1.6, verbose=verbose)
    else:
        extractor = VisualFeatureExtractor(teacher_model,
                                           teacher_variables,
                                           batch_size=batch_size,
                                           crop_ratio=1.0 / 1.6, mesh=mesh)
        all_logits = extractor.frame_logits(flat, verbose=verbose,
                                            partial_path=partial_path)
    wav_logits, offset = [], 0
    for track in frames:
        f = len(track)
        wav_logits.append(all_logits[offset:offset + f].astype(np.float32))
        offset += f
    return EmoVoxImdb(
        wav_paths=np.asarray(wav_paths, dtype=object),
        speaker=np.asarray(speakers, dtype=object),
        set_id=sets,
        wav_logits=wav_logits,
        dense_frames=frames,
        wav_dir=str(wav_root),
        frame_dir=str(frame_root),
        classes=EMOTIONS,
    )


def fetch_emovoxceleb_imdb(root: str | Path, teacher_model=None,
                           teacher_variables=None,
                           cache_path: Optional[str] = None,
                           download: bool = False,
                           **build_kwargs) -> EmoVoxImdb:
    """Load-or-build with two cache levels (global var + .npz file),
    mirroring fetch_emovoxceleb_imdb.m:16-40.

    Resolution order on a cache miss: (1) with ``download=True``, fetch
    the released prebuilt logits imdb (senet50-ferplus-logits.mat,
    fetch_emovoxceleb_imdb.m:288-324) and convert it; (2) with a teacher
    model, run the dense-inference build. Offline runs skip (1)
    gracefully and fall through to (2).
    """
    key = f"{root}|{cache_path}"
    if key in _MEMORY_CACHE:
        return _MEMORY_CACHE[key]
    if cache_path and Path(cache_path).exists():
        imdb = EmoVoxImdb.load(cache_path)
    else:
        imdb = None
        if download:
            from mcncrossmodalemotions_tpu.data.imdb import (
                emovox_imdb_from_mat,
            )
            from mcncrossmodalemotions_tpu.zoo.artifacts import (
                ensure_artifact,
            )

            mat = ensure_artifact("emovoxceleb-logits")
            if mat is not None:
                root = Path(root)
                imdb = emovox_imdb_from_mat(
                    mat, wav_dir=str(root / "wavs"),
                    frame_dir=str(root / "frames"))
        if imdb is None:
            if teacher_model is None:
                raise FileNotFoundError(
                    f"no cached imdb at {cache_path!r}; pass a teacher model "
                    "to build it, or download=True for the released logits"
                )
            build_kwargs.setdefault(
                "partial_path",
                f"{cache_path}.partial.npz" if cache_path else None)
            imdb = build_imdb(root, teacher_model, teacher_variables,
                              **build_kwargs)
        if cache_path:
            imdb.save(cache_path)
    _MEMORY_CACHE[key] = imdb
    return imdb
