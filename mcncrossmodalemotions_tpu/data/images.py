"""Host-side face-frame loading (``vl_imreadjpeg`` path, Python fallback).

Reference preprocessing for VoxCeleb/external face frames
(fetch_emovoxceleb_imdb.m getImageBatch :152-193,
compute_visual_feats.m:123-164): JPEG decode -> center-crop -> bilinear
resize to 224 -> RGB->grayscale -> replicate 3 channels -> subtract
average image.

Crop semantics follow ``vl_imreadjpeg``: ``CropSize`` is a fraction of
the LARGEST crop with the OUTPUT aspect ratio contained in the image —
for the square 224x224 output, a centered square of side
``crop_ratio * min(h, w)``. The EmoVoxCeleb dense build uses
``CropSize 1/1.6`` (fetch_emovoxceleb_imdb.m:169); the external-dataset
extractor uses the default ``CropSize 1`` (full short-side square —
compute_visual_feats.m:123-143 passes no CropSize because "Afew is
already tightly cropped").

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


def resize_bilinear_np(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Align-corners bilinear resize — the framework's canonical sampling
    convention, matching both the on-device warp (ops/warp.py) and the C++
    data service. (PIL's antialiased resize differs and is not used.)"""
    h, w = img.shape[:2]
    fy = (np.arange(out_h) * ((h - 1) / (out_h - 1) if out_h > 1 else 0.0))
    fx = (np.arange(out_w) * ((w - 1) / (out_w - 1) if out_w > 1 else 0.0))
    y0 = np.clip(np.floor(fy).astype(int), 0, h - 1)
    x0 = np.clip(np.floor(fx).astype(int), 0, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = (fy - y0)[:, None, None]
    wx = (fx - x0)[None, :, None]
    img = img.astype(np.float64)
    top = img[y0][:, x0] * (1 - wx) + img[y0][:, x1] * wx
    bot = img[y1][:, x0] * (1 - wx) + img[y1][:, x1] * wx
    return top * (1 - wy) + bot * wy


def load_face_frame(path: str | Path, out_size: int = 224,
                    crop_ratio: float = CROP_RATIO) -> np.ndarray:
    """Decode + center-crop + bilinear resize + grayscale -> [S, S, 1] uint8.

    Pure-Python reference path for the C++ data service (PIL decodes; the
    crop/resize/gray math mirrors native/dataservice.cc exactly). The
    crop is a centered SQUARE of side ``crop_ratio * min(h, w)`` — the
    vl_imreadjpeg CropSize convention (largest output-aspect crop,
    scaled), see module docstring.
    """
    from PIL import Image

    with Image.open(path) as img:
        img = img.convert("RGB")
        w, h = img.size
        side = max(1, int(round(crop_ratio * min(w, h))))
        left = (w - side) // 2
        top = (h - side) // 2
        img = img.crop((left, top, left + side, top + side))
        rgb = np.asarray(img, np.float64)
    resized = resize_bilinear_np(rgb, out_size, out_size)
    # ITU-R 601 luma (MATLAB rgb2gray coefficients)
    gray = resized @ np.asarray([0.2989, 0.5870, 0.1140])
    return np.clip(np.round(gray), 0, 255).astype(np.uint8)[..., None]


def load_frame_batch(paths: Sequence[str | Path], out_size: int = 224,
                     num_threads: int = 8,
                     crop_ratio: float = CROP_RATIO) -> np.ndarray:
    """Threaded batch decode (the vl_imreadjpeg NumThreads analogue).

    Uses the C++ data service when built (same decode+crop+resize+gray
    semantics, tested for agreement); falls back to PIL threads.
    ``crop_ratio`` defaults to the EmoVoxCeleb 1/1.6; the external
    extractor passes 1.0 (CropSize default, compute_visual_feats.m).
    """
    from mcncrossmodalemotions_tpu.data import native

    if native.available():
        return native.decode_faces([str(p) for p in paths], out_size,
                                   crop_ratio, num_threads)
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=num_threads) as pool:
        frames = list(pool.map(
            lambda p: load_face_frame(p, out_size, crop_ratio), paths))
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
