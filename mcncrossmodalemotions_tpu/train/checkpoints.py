"""Atomic epoch checkpoints with resume and best-epoch selection.

Rebuilds the reference's checkpoint story (SURVEY.md section 5.4):
``expDir/net-epoch-N.mat`` per epoch with ``continue`` resume from latest
(run_distillation.m:72,177-178), upgraded with atomic writes + last-good
fallback (the reference's known corrupted-checkpoint weakness —
run_distillation.m:169), and ``findBestEpoch(priorityMetric, prune)``
(ferplus_baselines.m:121-126).
"""

from __future__ import annotations

import json
import os
import re
from pathlib import Path
from typing import Any, Optional, Tuple

import flax.serialization
import jax

_CKPT_RE = re.compile(r"net-epoch-(\d+)(\.msgpack)?$")


class CorruptCheckpointError(Exception):
    """The checkpoint's BYTES are unreadable (truncated write, disk
    corruption) — the recoverable case ``load_latest`` falls back from.
    Structural mismatches (restored tree does not fit the target — a
    changed model config) are NOT this error and propagate loudly:
    silently restarting a changed-architecture run from epoch 1 would
    clobber the old experiment."""


def checkpoint_path(exp_dir: str | Path, epoch: int,
                    backend: str = "msgpack") -> Path:
    suffix = ".msgpack" if backend == "msgpack" else ""
    return Path(exp_dir) / f"net-epoch-{epoch}{suffix}"


def save_checkpoint(exp_dir: str | Path, epoch: int, state: Any,
                    metrics: Optional[dict] = None,
                    backend: str = "msgpack") -> Path:
    """Atomically write epoch checkpoint (tmp + rename) and metrics sidecar.

    ``backend='msgpack'`` (default) writes one flax-serialised file —
    right-sized for replicated-DP states. ``backend='orbax'`` writes an
    Orbax PyTree checkpoint directory (the TPU-production format).

    Both backends assume the REPLICATED-state discipline this framework
    trains under (DP-only, like the reference — SURVEY.md parallelism
    checklist): the engine gates saves to process 0, which device_gets
    its full replica. A non-replicated (tensor-sharded) state would need
    every process to participate in a collective Orbax save — that path
    is deliberately out of scope and device_get would raise on
    non-addressable shards rather than write silently-partial state.
    """
    exp_dir = Path(exp_dir)
    exp_dir.mkdir(parents=True, exist_ok=True)
    path = checkpoint_path(exp_dir, epoch, backend)
    if backend == "msgpack":
        blob = flax.serialization.to_bytes(jax.device_get(state))
        # pid-suffixed tmp (zoo/artifacts.py convention): two processes
        # saving the same epoch must not interleave through one tmp file
        tmp = path.with_suffix(f".tmp.{os.getpid()}")
        tmp.write_bytes(blob)
        os.replace(tmp, path)  # atomic on POSIX
    elif backend == "orbax":
        import orbax.checkpoint as ocp

        with ocp.PyTreeCheckpointer() as ckptr:
            # Orbax writes to a tmp dir and renames — atomic by design.
            ckptr.save(path.resolve(), jax.device_get(state), force=True)
    else:
        raise ValueError(f"unknown checkpoint backend {backend!r}")
    if metrics is not None:
        mpath = Path(exp_dir) / f"net-epoch-{epoch}.json"
        # pid-suffixed like the blob tmp above: concurrent same-epoch
        # savers must not interleave through one sidecar tmp either
        mtmp = mpath.with_suffix(f".json.tmp.{os.getpid()}")
        mtmp.write_text(json.dumps(metrics, default=float))
        os.replace(mtmp, mpath)
    return path


def list_checkpoints(exp_dir: str | Path) -> list[Tuple[int, Path]]:
    exp_dir = Path(exp_dir)
    if not exp_dir.exists():
        return []
    found = []
    for p in exp_dir.iterdir():
        m = _CKPT_RE.fullmatch(p.name)
        if m and (p.is_dir() or p.suffix == ".msgpack"):
            found.append((int(m.group(1)), p))
    return sorted(found)


def load_checkpoint(path: Path, target: Any) -> Any:
    """Restore a state pytree from ``path`` into the structure of ``target``.

    Backend is inferred: a file is flax msgpack, a directory is Orbax.
    Unreadable bytes raise :class:`CorruptCheckpointError`; a readable
    checkpoint that does not FIT ``target`` raises the underlying
    structure error (see CorruptCheckpointError docstring).
    """
    import flax.serialization as ser

    path = Path(path)
    if path.is_dir():
        import orbax.checkpoint as ocp

        try:
            with ocp.PyTreeCheckpointer() as ckptr:
                restored = ckptr.restore(path.resolve())
        except Exception as exc:
            raise CorruptCheckpointError(f"{path}: {exc}") from exc
        return ser.from_state_dict(target, restored)
    try:
        state_dict = ser.msgpack_restore(path.read_bytes())
    except Exception as exc:  # truncated/garbled bytes
        raise CorruptCheckpointError(f"{path}: {exc}") from exc
    return ser.from_state_dict(target, state_dict)


def load_latest(exp_dir: str | Path, target: Any) -> Tuple[int, Any]:
    """Resume from the newest READABLE checkpoint (last-good fallback).

    Returns (epoch, state); (0, target) if none exists. A corrupt latest
    checkpoint falls back to the previous one instead of crashing — the
    failure mode the reference worked around with cnn_train_dag_check2
    (run_distillation.m:169). Only byte-level corruption falls back;
    a structural mismatch (changed model config vs on-disk run) raises,
    so a misconfigured resume cannot silently restart from epoch 1 and
    clobber the experiment.
    """
    for epoch, path in reversed(list_checkpoints(exp_dir)):
        try:
            return epoch, load_checkpoint(path, target)
        except CorruptCheckpointError as exc:  # corrupted: try older
            print(f"warning: checkpoint {path} unreadable ({exc}); falling back")
    return 0, target


def find_best_epoch(exp_dir: str | Path, priority_metric: str = "classerror",
                    mode: str = "min", subset: str = "val",
                    prune: bool = False) -> Optional[int]:
    """Pick the epoch whose ``subset`` metrics optimise ``priority_metric``.

    mcnDatasets ``findBestEpoch('priorityMetric','classerror','prune',true)``
    equivalent (ferplus_baselines.m:121-126). With ``prune=True`` all other
    epochs' checkpoints are deleted.
    """
    best_epoch, best_value = None, None
    ckpts = list_checkpoints(exp_dir)
    for epoch, path in ckpts:
        mpath = path.with_suffix(".json")
        if not mpath.exists():
            continue
        metrics = json.loads(mpath.read_text())
        value = metrics.get(subset, {}).get(priority_metric)
        if value is None:
            continue
        better = best_value is None or (
            value < best_value if mode == "min" else value > best_value
        )
        if better:
            best_epoch, best_value = epoch, value
    if prune and best_epoch is not None:
        for epoch, path in ckpts:
            if epoch != best_epoch:
                if path.is_dir():  # orbax checkpoint directory
                    import shutil

                    shutil.rmtree(path, ignore_errors=True)
                else:
                    path.unlink(missing_ok=True)
                (path.parent / f"net-epoch-{epoch}.json").unlink(missing_ok=True)
    return best_epoch


def restore_from_exp(exp_dir, template, epoch=None):
    """Restore a state pytree from an experiment dir's checkpoints.

    Shared epoch resolution for the checkpoint-reload flows
    (exp.run_distillation.load_student_from_exp /
    exp.ferplus_baselines.load_teacher_from_exp): ``epoch=None`` loads
    the latest readable checkpoint (last-good fallback), ``'best'``
    resolves via :func:`find_best_epoch`, an int loads that epoch
    exactly. Raises FileNotFoundError when nothing is restorable."""
    exp_dir = Path(exp_dir)
    if epoch == "best":
        epoch = find_best_epoch(exp_dir)
        if epoch is None:
            raise FileNotFoundError(f"no epoch metrics in {exp_dir}")
    if epoch is None:
        found, state = load_latest(exp_dir, template)
        if found == 0:
            raise FileNotFoundError(f"no checkpoints in {exp_dir}")
        return state
    # Resolve the epoch's on-disk path via list_checkpoints rather than
    # assuming the msgpack filename: orbax checkpoints are suffix-less
    # directories, and the dev-checkpoint registry always pins an int
    # epoch, so this path must work for both backends.
    by_epoch = dict(list_checkpoints(exp_dir))
    path = by_epoch.get(int(epoch))
    if path is None:
        raise FileNotFoundError(
            f"no checkpoint for epoch {epoch} in {exp_dir} "
            f"(found epochs {sorted(by_epoch)})")
    return load_checkpoint(path, template)
