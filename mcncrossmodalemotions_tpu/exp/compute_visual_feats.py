"""Teacher feature extraction over face frames (``compute_visual_feats.m``).

Flattens every track's frame list, runs batched teacher inference
(batch 128 in the reference, :83-98), and regroups per-track logit
matrices [F, C] (:100-110). The same engine powers the dense EmoVoxCeleb
imdb build (fetch_emovoxceleb_imdb.m:119-136) via
exp/fetch_emovoxceleb_imdb.py.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from mcncrossmodalemotions_tpu.data.images import load_frame_batch
from mcncrossmodalemotions_tpu.utils.logging import Eta


@dataclasses.dataclass
class VisualFeatureExtractor:
    """Batched teacher forward over host-decoded face frames.

    ``model`` is a FaceTeacherPipeline (uint8 grayscale in, logits out;
    preprocessing on device). Frames are decoded by a host thread pool
    and double-buffered against device compute. With ``mesh`` the batch
    is sharded over the mesh's data axis (multi-chip inference: same
    code, N chips each take 1/N of every batch).
    """

    model: object
    variables: dict
    batch_size: int = 128
    num_threads: int = 8
    input_size: int = 224
    mesh: object = None

    def __post_init__(self):
        forward = lambda v, x: self.model.apply(v, x, train=False)
        if self.mesh is not None:
            from mcncrossmodalemotions_tpu.parallel.mesh import (
                batch_sharding,
                replicated_sharding,
            )

            self._forward = jax.jit(
                forward,
                in_shardings=(replicated_sharding(self.mesh),
                              batch_sharding(self.mesh)),
                out_shardings=replicated_sharding(self.mesh),
            )
        else:
            self._forward = jax.jit(forward)

    def frame_logits(self, frame_paths: Sequence[str],
                     verbose: bool = True,
                     partial_path: Optional[str] = None,
                     checkpoint_every: int = 200) -> np.ndarray:
        """[N, C] logits over a flat frame list, batched + prefetched.

        ``partial_path`` makes the dense pass resumable (the reference's
        only recovery was rerunning the whole multi-hour loop): completed
        logits are flushed every ``checkpoint_every`` batches and reloaded
        on restart, keyed on the frame count.
        """
        from concurrent.futures import ThreadPoolExecutor

        n = len(frame_paths)
        done = 0
        out = []
        if partial_path and Path(partial_path).exists():
            data = np.load(partial_path)
            if int(data["total"]) == n:
                saved = data["logits"]
                done = saved.shape[0]
                out.append(saved)
                if verbose:
                    print(f"resuming dense inference at {done}/{n} frames")

        def flush():
            if not partial_path:
                return
            merged = np.concatenate(out) if out else np.zeros((0, 8), np.float32)
            tmp = Path(partial_path).with_suffix(".tmp.npz")
            tmp.parent.mkdir(parents=True, exist_ok=True)
            np.savez(tmp, logits=merged, total=n)
            tmp.replace(partial_path)

        eta = Eta(n, "visual-feats", log_every=10 * self.batch_size) if verbose else None
        if eta:
            eta.tick(done)
        chunks = [frame_paths[i:i + self.batch_size]
                  for i in range(done, n, self.batch_size)]
        if not chunks:
            return np.concatenate(out) if out else np.zeros((0, 8), np.float32)
        with ThreadPoolExecutor(max_workers=1) as prefetcher:
            future = prefetcher.submit(load_frame_batch, chunks[0],
                                       self.input_size, self.num_threads)
            for ci, chunk in enumerate(chunks):
                batch = future.result()
                if ci + 1 < len(chunks):  # overlap next decode with compute
                    future = prefetcher.submit(load_frame_batch, chunks[ci + 1],
                                               self.input_size, self.num_threads)
                pad = self.batch_size - len(batch)
                if pad > 0:
                    batch = np.concatenate([batch, np.repeat(batch[-1:], pad, 0)])
                logits = self._forward(self.variables, jnp.asarray(batch))
                out.append(np.asarray(jax.device_get(logits))[: len(chunk)])
                if eta:
                    eta.tick(len(chunk))
                if partial_path and (ci + 1) % checkpoint_every == 0:
                    flush()
        result = np.concatenate(out) if out else np.zeros((0, 8), np.float32)
        if partial_path:
            Path(partial_path).unlink(missing_ok=True)  # complete: no resume needed
        return result


def compute_visual_feats(imdb, model=None, variables=None,
                         model_name: str = "senet50-ferplus",
                         feat_path: Optional[str] = None,
                         batch_size: int = 128,
                         num_classes: int = 8,
                         seed: int = 0,
                         frame_root: str = "",
                         limit: Optional[int] = None,
                         verbose: bool = True) -> List[np.ndarray]:
    """Per-track [F, C] teacher logits for a TrackImdb.

    ``model_name='random'`` emits gaussian logits (null baseline).
    Cached at ``feat_path``.
    """
    if feat_path and Path(feat_path).exists():
        data = np.load(feat_path, allow_pickle=True)
        return list(data["logits"])
    tracks = imdb.frame_paths
    if limit:
        tracks = tracks[:limit]
    if model_name == "random":
        rng = np.random.RandomState(seed)
        logits = [rng.randn(len(t), num_classes).astype(np.float32)
                  for t in tracks]
    else:
        assert model is not None and variables is not None
        flat = [str(Path(frame_root) / p) for track in tracks for p in track]
        extractor = VisualFeatureExtractor(model, variables,
                                           batch_size=batch_size)
        all_logits = extractor.frame_logits(flat, verbose=verbose)
        logits, offset = [], 0
        for track in tracks:
            f = len(track)
            logits.append(all_logits[offset:offset + f])
            offset += f
    if feat_path:
        Path(feat_path).parent.mkdir(parents=True, exist_ok=True)
        np.savez_compressed(feat_path, logits=np.asarray(logits, dtype=object))
    return logits
