"""Host-side face-frame loading (``vl_imreadjpeg`` path, Python fallback).

Reference preprocessing for VoxCeleb/external face frames
(fetch_emovoxceleb_imdb.m getImageBatch :152-193,
compute_visual_feats.m:123-164): JPEG decode -> center-crop to 1/1.6 of
the short side -> bilinear resize to 224 -> RGB->grayscale -> replicate
3 channels -> subtract average image.

Split of responsibilities here: the host (this module, or the threaded
C++ data service in native/) decodes, crops, resizes and grayscales,
shipping [H, W, 1] uint8; channel replication + mean subtraction run on
device inside the jitted teacher forward
(models/teacher_pipeline.FaceTeacherPipeline).
"""

from __future__ import annotations

from pathlib import Path
from typing import Sequence

import numpy as np

CROP_RATIO = 1.0 / 1.6  # fetch_emovoxceleb_imdb.m:169 CropSize


def load_face_frame(path: str | Path, out_size: int = 224,
                    crop_ratio: float = CROP_RATIO) -> np.ndarray:
    """Decode + center-crop + bilinear resize + grayscale -> [S, S, 1] uint8."""
    from PIL import Image

    with Image.open(path) as img:
        img = img.convert("RGB")
        w, h = img.size
        cw, ch = int(round(w * crop_ratio)), int(round(h * crop_ratio))
        left = (w - cw) // 2
        top = (h - ch) // 2
        img = img.crop((left, top, left + cw, top + ch))
        img = img.resize((out_size, out_size), Image.BILINEAR)
        rgb = np.asarray(img, np.float32)
    # ITU-R 601 luma (MATLAB rgb2gray coefficients)
    gray = rgb @ np.asarray([0.2989, 0.5870, 0.1140], np.float32)
    return np.clip(np.round(gray), 0, 255).astype(np.uint8)[..., None]


def load_frame_batch(paths: Sequence[str | Path], out_size: int = 224,
                     num_threads: int = 8) -> np.ndarray:
    """Threaded batch decode (the vl_imreadjpeg NumThreads analogue)."""
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=num_threads) as pool:
        frames = list(pool.map(lambda p: load_face_frame(p, out_size), paths))
    return np.stack(frames)


def save_synthetic_frame(path: str | Path, pattern_id: int, size: int = 64,
                         seed: int = 0) -> None:
    """Write a synthetic face-frame JPEG whose content encodes pattern_id
    (for dev/test imdbs, mirroring the opts.dev pattern)."""
    from PIL import Image

    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)
    base = 127 + 120 * np.sin(2 * np.pi * (pattern_id + 1) * (xx + yy) / (4 * size))
    img = np.clip(base + rng.randn(size, size) * 8, 0, 255).astype(np.uint8)
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    Image.fromarray(img).convert("RGB").save(path, quality=92)
