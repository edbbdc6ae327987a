"""Chunked dense teacher inference: bounded worker processes + resume.

The 5.08M-frame EmoVoxCeleb dense build
(fetch_emovoxceleb_imdb.m:119-136) can run for hours. On rigs whose
device-client leaks memory over long single-process runs (the tunnel
client isolated by tools/soak_dense_genesis.py: RSS growth lives in the
client, not this code), the only reliable mitigation is worker cycling
— process exit returns the memory, and the bitwise-exact partial
checkpoint (VisualFeatureExtractor.frame_logits) makes the cycle
invisible to the result. Round 4 proved the cycle exact with a
hand-written supervisor loop; this module productises it (round-4
VERDICT next #3):

    supervisor (this process, never touches the device)
      └─ loop: spawn worker ─ python -m ...exp.dense_chunked --worker
               worker processes <= chunk_frames NEW frames against the
               shared partial checkpoint, flushes, exits
         until the worker reports completion; every cycle must make
         forward progress or the supervisor aborts.

The worker reconstructs its model from a JSON-able ``model_spec`` plus
the supervisor-serialised variables (flax msgpack — no pickle):

- ``{"pretrained": <registry-name-or-mat-path>}`` — the production
  path: load_pretrained_teacher(with_pipeline=True); arch comes from
  the released .mat, weights from the serialised tree.
- ``{"teacher": {**build_teacher kwargs}, "input_size": N, ...}`` —
  a zoo-built FaceTeacherPipeline (the soak tool's shape; also the
  tiny-config test path).

Exposed via ``cli fetch-imdb chunk_frames=N`` and
``compute_visual_feats(..., max_frames_per_process=N)``; see
docs/SCALING.md ("leaky-link rigs").
"""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path
from typing import Optional, Sequence

import numpy as np


def _serialize_variables(variables, path: Path) -> None:
    import jax
    from flax import serialization

    host_vars = jax.tree.map(lambda x: np.asarray(jax.device_get(x)),
                             variables)
    path.write_bytes(serialization.to_bytes(host_vars))


def build_worker_model(spec: dict):
    """(model, variables-template) from a JSON model spec (worker side)."""
    if "pretrained" in spec:
        from mcncrossmodalemotions_tpu.zoo import load_pretrained_teacher

        return load_pretrained_teacher(
            spec["pretrained"], with_pipeline=True,
            input_size=int(spec.get("input_size", 224)),
            download=bool(spec.get("download", False)))
    from mcncrossmodalemotions_tpu.models.teacher_pipeline import (
        FaceTeacherPipeline,
    )
    from mcncrossmodalemotions_tpu.zoo import build_teacher

    kw = {}
    if "mean_rgb" in spec:
        kw["mean_rgb"] = tuple(spec["mean_rgb"])
    model = FaceTeacherPipeline(
        teacher=build_teacher(**spec["teacher"]),
        input_size=int(spec.get("input_size", 224)),
        augment=False, **kw)
    return model, None  # variables come from the serialised tree


def _worker_main(job_file: str) -> int:
    """One bounded chunk of the dense pass, in THIS (fresh) process."""
    job = json.loads(Path(job_file).read_text())
    if job.get("jax_config"):
        # config updates, not env vars: on this runtime jax is already
        # imported at interpreter startup but the backend initialises
        # lazily, so jax.config.update still selects the platform (the
        # tests/conftest.py convention). Env-var platform selection is
        # NOT equivalent here — it eager-inits a client with different
        # thread partitioning and measurably different bf16 reduction
        # order (and far slower CPU compiles).
        import jax

        for k, v in job["jax_config"].items():
            jax.config.update(k, v)
    from flax import serialization

    from mcncrossmodalemotions_tpu.exp.compute_visual_feats import (
        VisualFeatureExtractor,
    )

    frames = Path(job["frames_file"]).read_text().splitlines()
    model, _ = build_worker_model(job["model_spec"])
    # the serialised tree is a plain nested dict of arrays — exactly what
    # model.apply takes; no template restore needed
    variables = serialization.msgpack_restore(
        Path(job["variables_file"]).read_bytes())
    extractor = VisualFeatureExtractor(
        model, variables, batch_size=int(job["batch_size"]),
        crop_ratio=float(job["crop_ratio"]),
        input_size=int(job["input_size"]))
    result = extractor.frame_logits(
        frames, verbose=bool(job.get("verbose", True)),
        partial_path=job["partial_path"],
        max_frames=int(job["chunk_frames"]))
    if result is not None:  # job finished inside this worker's bound
        tmp = Path(job["out_path"]).with_suffix(".tmp.npz")
        np.savez(tmp, logits=result)
        tmp.replace(job["out_path"])
        print(json.dumps({"chunk_worker": "complete", "done": len(frames),
                          "total": len(frames)}), flush=True)
    else:
        data = np.load(job["partial_path"], allow_pickle=False)
        print(json.dumps({"chunk_worker": "progress",
                          "done": int(data["logits"].shape[0]),
                          "total": len(frames)}), flush=True)
    return 0


def chunked_frame_logits(model_spec: dict, variables,
                         frame_paths: Sequence[str],
                         partial_path: str, *,
                         chunk_frames: int,
                         batch_size: int = 128,
                         crop_ratio: float = 1.0,
                         input_size: int = 224,
                         verbose: bool = True,
                         env: Optional[dict] = None,
                         worker_jax_config: Optional[dict] = None,
                         max_cycles: Optional[int] = None) -> np.ndarray:
    """[N, C] dense logits via bounded worker subprocesses (supervisor).

    Functionally identical to
    ``VisualFeatureExtractor.frame_logits(frame_paths)`` — the partial-
    checkpoint resume is bitwise (same batch boundaries, same weights)
    — but no process lives longer than ``chunk_frames`` frames. The
    supervisor itself performs no device work, so on tunnel rigs the
    first worker owns the device client from the start. A cycle that
    makes no forward progress aborts the loop (a wedged rig must not
    spin forever); ``max_cycles`` defaults to enough cycles for the
    frame count plus slack.
    """
    if chunk_frames < 1:
        raise ValueError(f"chunk_frames must be >= 1, got {chunk_frames}")
    partial = Path(partial_path)
    partial.parent.mkdir(parents=True, exist_ok=True)
    job_dir = partial.with_suffix(".job")
    job_dir.mkdir(exist_ok=True)
    frames_file = job_dir / "frames.txt"
    frames_file.write_text("\n".join(map(str, frame_paths)))
    variables_file = job_dir / "variables.msgpack"
    _serialize_variables(variables, variables_file)
    out_path = job_dir / "result.npz"
    out_path.unlink(missing_ok=True)
    job = {
        "model_spec": model_spec,
        "frames_file": str(frames_file),
        "variables_file": str(variables_file),
        "partial_path": str(partial),
        "out_path": str(out_path),
        "chunk_frames": int(chunk_frames),
        "batch_size": int(batch_size),
        "crop_ratio": float(crop_ratio),
        "input_size": int(input_size),
        "verbose": bool(verbose),
        "jax_config": worker_jax_config or {},
    }
    job_file = job_dir / "job.json"
    job_file.write_text(json.dumps(job))

    n = len(frame_paths)
    if max_cycles is None:
        max_cycles = -(-n // max(chunk_frames, 1)) + 2
    last_done = -1
    for cycle in range(max_cycles):
        if verbose:
            print(f"[dense-chunked] cycle {cycle + 1}: worker over "
                  f"<= {chunk_frames} frames", flush=True)
        proc = subprocess.run(
            [sys.executable, "-m",
             "mcncrossmodalemotions_tpu.exp.dense_chunked",
             "--worker", str(job_file)],
            env=env, capture_output=not verbose)
        if proc.returncode != 0:
            detail = ""
            if proc.stdout is not None:
                tail = (proc.stderr or proc.stdout or b"").decode(
                    errors="replace").strip().splitlines()[-8:]
                detail = ": " + " | ".join(tail)
            raise RuntimeError(
                f"dense-chunked worker failed (cycle {cycle + 1}, exit "
                f"{proc.returncode}){detail}")
        if out_path.exists():
            result = np.load(out_path, allow_pickle=False)["logits"]
            for p in (frames_file, variables_file, job_file, out_path):
                p.unlink(missing_ok=True)
            try:
                job_dir.rmdir()
            except OSError:
                pass
            return result
        data = np.load(partial, allow_pickle=False)
        done = int(data["logits"].shape[0])
        if done <= last_done:
            raise RuntimeError(
                f"dense-chunked made no progress (stuck at {done}/{n} "
                "frames) — aborting instead of spinning")
        last_done = done
    raise RuntimeError(
        f"dense-chunked did not finish within {max_cycles} cycles "
        f"({last_done}/{n} frames) — chunk_frames too small for the "
        "frame count?")


if __name__ == "__main__":
    if len(sys.argv) == 3 and sys.argv[1] == "--worker":
        sys.exit(_worker_main(sys.argv[2]))
    print("usage: python -m mcncrossmodalemotions_tpu.exp.dense_chunked "
          "--worker <job.json>", file=sys.stderr)
    sys.exit(2)
