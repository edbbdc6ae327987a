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
    # vl_imreadjpeg CropSize: external faces are already tightly cropped
    # so the reference passes no CropSize (default 1 = full short-side
    # square, compute_visual_feats.m:123-143); the EmoVoxCeleb dense
    # build overrides with 1/1.6 (fetch_emovoxceleb_imdb.m:169).
    crop_ratio: float = 1.0
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

    def _job_key(self, frame_paths: Sequence[str]) -> str:
        """Fingerprint of (frame list, model weights) guarding resume.

        A partial checkpoint is only valid for the exact frame list AND
        the exact teacher weights — a count-only key would silently mix
        logits from different models or datasets of equal length.
        """
        import hashlib

        h = hashlib.sha1()
        h.update(f"crop={self.crop_ratio} size={self.input_size}\n"
                 .encode())
        h.update(str(len(frame_paths)).encode())
        h.update("\n".join(map(str, frame_paths[:: max(1, len(frame_paths) // 4096)])).encode())
        for leaf in jax.tree.leaves(self.variables):
            arr = np.asarray(jax.device_get(leaf))
            h.update(str(arr.shape).encode())
            h.update(arr.tobytes()[:65536])
        return h.hexdigest()

    def _pad_batch(self, batch: np.ndarray) -> np.ndarray:
        """Pad to batch_size, then to a mesh-device multiple (sharded
        batches must divide evenly; padded rows are trimmed after)."""
        target = self.batch_size
        if self.mesh is not None:
            n_dev = int(np.prod(self.mesh.devices.shape))
            target = -(-target // n_dev) * n_dev
        pad = target - len(batch)
        if pad > 0:
            batch = np.concatenate([batch, np.repeat(batch[-1:], pad, 0)])
        return batch

    def frame_logits(self, frame_paths: Sequence[str],
                     verbose: bool = True,
                     partial_path: Optional[str] = None,
                     checkpoint_every: int = 200,
                     max_frames: Optional[int] = None) -> Optional[np.ndarray]:
        """[N, C] logits over a flat frame list, batched + prefetched.

        ``partial_path`` makes the dense pass resumable (the reference's
        only recovery was rerunning the whole multi-hour loop): completed
        logits are flushed periodically and reloaded on restart, keyed on
        a fingerprint of the frame list and the model weights.

        ``max_frames`` bounds the NEW frames processed by this call
        (requires ``partial_path``): when the job is not finished within
        the bound, progress is flushed and ``None`` is returned — the
        worker-cycling primitive behind ``exp/dense_chunked.py`` (the
        tunnel-client RSS mitigation measured in
        tools/soak_dense_genesis.py: process exit is the only reliable
        way to return that memory).
        """
        if max_frames is not None and not partial_path:
            raise ValueError("max_frames requires partial_path (the next "
                             "process must be able to resume)")
        from concurrent.futures import ThreadPoolExecutor

        n = len(frame_paths)
        done = 0
        out = []
        job_key = self._job_key(frame_paths) if partial_path else ""
        if partial_path and Path(partial_path).exists():
            data = np.load(partial_path, allow_pickle=False)
            if "key" in data and str(data["key"]) == job_key:
                saved = data["logits"]
                done = saved.shape[0]
                out.append(saved)
                if verbose:
                    print(f"resuming dense inference at {done}/{n} frames")
            elif verbose:
                print("partial checkpoint does not match this job; restarting")

        def flush():
            if not partial_path:
                return
            merged = np.concatenate(out) if out else np.zeros((0, 8), np.float32)
            tmp = Path(partial_path).with_suffix(".tmp.npz")
            tmp.parent.mkdir(parents=True, exist_ok=True)
            np.savez(tmp, logits=merged, key=job_key)
            tmp.replace(partial_path)

        remaining = n - done
        eta = (Eta(remaining, "visual-feats", log_every=10 * self.batch_size)
               if verbose and remaining > 0 else None)
        chunks = [frame_paths[i:i + self.batch_size]
                  for i in range(done, n, self.batch_size)]
        truncated = False
        if max_frames is not None and max_frames < remaining:
            # whole batches only; at least one so every call progresses
            keep = max(1, max_frames // self.batch_size)
            if keep < len(chunks):
                chunks, truncated = chunks[:keep], True
        if not chunks:
            if partial_path:
                Path(partial_path).unlink(missing_ok=True)  # job complete
            return np.concatenate(out) if out else np.zeros((0, 8), np.float32)
        # flush cost is O(done-so-far): bound total flushes to ~20 so
        # checkpoint I/O stays linear in the run length.
        effective_every = max(checkpoint_every, len(chunks) // 20)
        with ThreadPoolExecutor(max_workers=1) as prefetcher:
            future = prefetcher.submit(load_frame_batch, chunks[0],
                                       self.input_size, self.num_threads,
                                       self.crop_ratio)
            for ci, chunk in enumerate(chunks):
                batch = future.result()
                if ci + 1 < len(chunks):  # overlap next decode with compute
                    future = prefetcher.submit(load_frame_batch, chunks[ci + 1],
                                               self.input_size,
                                               self.num_threads,
                                               self.crop_ratio)
                batch = self._pad_batch(batch)
                logits = self._forward(self.variables, jnp.asarray(batch))
                out.append(np.asarray(jax.device_get(logits))[: len(chunk)])
                if eta:
                    eta.tick(len(chunk))
                if partial_path and (ci + 1) % effective_every == 0:
                    flush()
        if truncated:
            flush()  # bounded run: persist progress, leave partial alive
            return None
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
                         crop_ratio: float = 1.0,
                         mesh=None,
                         clobber: bool = False,
                         input_size: int = 224,
                         max_frames_per_process: Optional[int] = None,
                         model_spec: Optional[dict] = None,
                         verbose: bool = True) -> List[np.ndarray]:
    """Per-track [F, C] teacher logits for a TrackImdb.

    ``model_name='random'`` emits gaussian logits (null baseline).
    Cached at ``feat_path``; when ``feat_path`` is set the dense pass is
    also resumable via a ``<feat_path>.partial.npz`` checkpoint. ``mesh``
    shards inference batches over the device mesh. ``clobber`` recomputes
    and overwrites an existing cache (and discards any stale partial,
    compute_visual_feats.m:5). ``crop_ratio=1.0`` is the reference's
    external-face default (no CropSize, :123-143); the EmoVoxCeleb dense
    build uses 1/1.6.

    ``max_frames_per_process`` runs the dense pass as bounded worker
    subprocesses over the shared partial checkpoint (bitwise-identical
    result; exp/dense_chunked.py — the leaky-link-rig mitigation).
    It requires ``feat_path`` and a JSON-able ``model_spec`` describing
    how a worker rebuilds the model (see dense_chunked.build_worker_model).
    """
    if feat_path and Path(feat_path).exists() and not clobber:
        from mcncrossmodalemotions_tpu.exp.compute_audio_feats import (
            _load_feat_cache,
        )

        logits = _load_feat_cache(feat_path, len(imdb.frame_paths),
                                  model_name)
        if logits is not None:
            return logits
    if feat_path and clobber:
        Path(f"{feat_path}.partial.npz").unlink(missing_ok=True)
    tracks = imdb.frame_paths
    if limit:
        tracks = tracks[:limit]
    if model_name == "random":
        rng = np.random.RandomState(seed)
        logits = [rng.randn(len(t), num_classes).astype(np.float32)
                  for t in tracks]
    else:
        flat = [str(Path(frame_root) / p) for track in tracks for p in track]
        partial = f"{feat_path}.partial.npz" if feat_path else None
        if max_frames_per_process:
            from mcncrossmodalemotions_tpu.exp.dense_chunked import (
                chunked_frame_logits,
            )

            if not (partial and model_spec and variables is not None):
                raise ValueError(
                    "max_frames_per_process requires feat_path, "
                    "model_spec and variables")
            all_logits = chunked_frame_logits(
                model_spec, variables, flat, partial,
                chunk_frames=max_frames_per_process,
                batch_size=batch_size, crop_ratio=crop_ratio,
                input_size=input_size, verbose=verbose)
        else:
            assert model is not None and variables is not None
            extractor = VisualFeatureExtractor(model, variables,
                                               batch_size=batch_size,
                                               crop_ratio=crop_ratio,
                                               input_size=input_size,
                                               mesh=mesh)
            all_logits = extractor.frame_logits(flat, verbose=verbose,
                                                partial_path=partial)
        logits, offset = [], 0
        for track in tracks:
            f = len(track)
            logits.append(all_logits[offset:offset + f])
            offset += f
    if feat_path and not limit:  # a limit= dev run is never cached
        from mcncrossmodalemotions_tpu.exp.compute_audio_feats import (
            _save_feat_cache,
        )

        _save_feat_cache(feat_path, logits, model_name)
    return logits
