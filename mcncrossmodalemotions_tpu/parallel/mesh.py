"""Device mesh + data-parallel sharding helpers.

The reference's entire parallelism story is synchronous data parallelism
via MATLAB SPMD workers + a ParameterServer summing gradients
(run_distillation.m:88,179,181; SURVEY.md section 2.2). The TPU-native
equivalent: a 1-D ``jax.sharding.Mesh`` over the chips ('data' axis),
batches sharded along it, params replicated; pjit-compiled steps let XLA
insert the gradient ``psum`` over ICI — no explicit server. Multi-host
scale-out over DCN composes via ``jax.distributed.initialize`` with the
same annotations.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """Multi-host (DCN) initialisation wrapper.

    Scale-out beyond one host keeps the exact same mesh/sharding code:
    call this once per process before ``make_mesh()`` and the mesh spans
    every chip in the job, with XLA routing the gradient psum over ICI
    within a slice and DCN across slices (SURVEY.md section 5.8). On a
    single host this is a no-op. Args mirror
    ``jax.distributed.initialize`` (auto-detected on Cloud TPU).
    """
    import jax

    if num_processes is not None and num_processes <= 1:
        return
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def make_mesh(num_devices: Optional[int] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    """1-D data-parallel mesh over ICI.

    ``num_devices=None`` uses every visible device. For tests, set
    ``XLA_FLAGS=--xla_force_host_platform_device_count=N`` to fake an
    N-chip mesh on CPU (SURVEY.md section 4 rebuild implication (d)).
    """
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        if len(devices) < num_devices:
            # Slicing short here would silently train on a smaller mesh
            # (doubled per-device batch, no flag that e.g. multihost
            # initialisation never ran) — fail loudly instead.
            raise ValueError(
                f"make_mesh({num_devices}): only {len(devices)} device(s) "
                "visible — check jax.distributed initialisation / "
                "the xla_force_host_platform_device_count test config")
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def auto_mesh(batch_size: int) -> Optional[Mesh]:
    """Data mesh sized to avoid per-batch padding bias.

    Uses the largest device count that divides ``batch_size`` (so standard
    batches shard evenly and only a ragged FINAL batch ever pads, keeping
    the metric bias bound of one batch per epoch). Returns None on a
    single device or when no divisor > 1 exists.
    """
    n_devices = len(jax.devices())
    if n_devices <= 1:
        return None
    n = 1
    for cand in range(min(n_devices, batch_size), 1, -1):
        if batch_size % cand == 0:
            n = cand
            break
    return make_mesh(n) if n > 1 else None


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, axis: int = 0) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    spec = [None] * (axis + 1)
    spec[axis] = DATA_AXIS
    return NamedSharding(mesh, P(*spec))


def shard_batch(batch: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Place a host batch dict on the mesh, sharded over the batch dim."""
    sharding = batch_sharding(mesh)
    return jax.device_put(batch, sharding)


def pad_to_multiple(batch: Dict[str, np.ndarray], multiple: int,
                    pad_key: str = "data"):
    """Pad the batch dim to a device-count multiple; returns (batch, n_valid).

    Static shapes are mandatory under jit; ragged final batches are padded
    and the valid count carried for correct metric weighting. A
    caller-supplied ``pad_mask`` is padded with ZEROS (never by
    duplicating the last row's 1.0): padding rows must stay excluded
    from losses/metrics, and ``n_valid`` counts the mask's valid rows.
    """
    n = batch[pad_key].shape[0]
    mask = batch.get("pad_mask")
    n_valid = int(np.sum(mask)) if mask is not None else n
    remainder = n % multiple
    if remainder == 0:
        return batch, n_valid
    pad = multiple - remainder
    padded = {
        k: np.concatenate([v, np.repeat(v[-1:], pad, axis=0)], axis=0)
        if isinstance(v, np.ndarray) and v.ndim >= 1 and v.shape[0] == n else v
        for k, v in batch.items()
    }
    if mask is not None:
        padded["pad_mask"] = np.concatenate(
            [np.asarray(mask, np.float32), np.zeros(pad, np.float32)])
    return padded, n_valid
