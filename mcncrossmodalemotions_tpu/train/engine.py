"""Epoch-loop training engine (``cnn_train_dag`` equivalent).

Orchestrates: per-epoch LR schedule arrays, epochSize subsampling
("mini-epochs", run_distillation.m:77,154), separate train/val passes,
running loss averages + per-class accuracy/population stats
(extractStatsFn hook, run_distillation.m:186-207), per-epoch atomic
checkpoints with ``continue`` resume (train/checkpoints.py), and JSONL
metrics logging. The compute path is the jitted step from train/state.py;
under a mesh the batch is sharded over the 'data' axis (parallel/mesh.py)
and XLA reduces gradients over ICI.

The reference signature ``cnn_train_dag(net, imdb, getBatch, opts)``
(run_distillation.m:170-182) maps to ``Trainer(model, loss_fn, cfg)`` +
``trainer.fit(batcher)`` where ``batcher`` yields host batches.
"""

from __future__ import annotations

import dataclasses
import time
from pathlib import Path
from typing import Any, Callable, Dict, Iterable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from mcncrossmodalemotions_tpu.train import checkpoints as ckpt_lib
from mcncrossmodalemotions_tpu.train.state import (
    LossFn,
    SGDConfig,
    TrainState,
    make_eval_step,
    make_train_step,
)
from mcncrossmodalemotions_tpu.utils.logging import MetricsLogger


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """cnn_train_dag options (run_distillation.m:71-89 defaults)."""

    num_epochs: int = 300
    batch_size: int = 64
    learning_rate: Sequence[float] | float = 1e-4
    momentum: float = 0.9
    weight_decay: float = 5e-4
    # samples per "mini-epoch" (None = all): the engine caps each train
    # pass at ceil(epoch_size/batch_size) batches — a random subset,
    # since batchers shuffle per epoch. Data-layer subsampling
    # (EmoVoxBatcher(epoch_size=...)) composes; the smaller one binds.
    epoch_size: Optional[int] = None
    seed: int = 0
    exp_dir: str = "exp"
    resume: bool = True  # the reference's 'continue' option
    checkpoint_every: int = 1
    checkpoint_backend: str = "msgpack"  # 'orbax' = Orbax dir format;
    # both assume replicated-DP state, saved by process 0 (checkpoints.py)
    log_every: int = 20
    # Observability (SURVEY.md section 5.1/5.2): optional jax.profiler
    # trace of the first train epoch, and a NaN tripwire replacing the
    # reference's `keyboard` debugger drop (getBatchEmoVoxCeleb.m:189-192).
    profile_dir: Optional[str] = None
    nan_check: bool = True
    # jax.checkpoint/remat policy for the train step (state.py
    # resolve_remat_policy). Default None: measured SLOWER in every
    # variant on the HBM-bound student step (docs/PERF.md round-5 remat
    # study) — an opt-in capacity lever for much larger models/batches.
    remat_policy: Optional[str] = None


def lr_for_epoch(cfg: TrainConfig, epoch: int) -> float:
    """Index the per-epoch LR array (1-based epochs, MATLAB convention)."""
    lr = cfg.learning_rate
    if isinstance(lr, (int, float)):
        return float(lr)
    return float(lr[min(epoch - 1, len(lr) - 1)])


def logspace_lr(start_exp: float, stop_exp: float, num: int) -> tuple:
    """``logspace(-4, -5, numEpochs)`` equivalent (run_distillation.m:82)."""
    return tuple(np.logspace(start_exp, stop_exp, num).tolist())


class MetricAverager:
    """Running batch-weighted averages + summed per-class stat vectors.

    Accumulation happens ON DEVICE (lazy jnp adds): a per-batch
    ``device_get`` would force a host sync every step, which under the
    tunnelled TPU runtime costs a full round trip (~25 ms). The single
    transfer happens in ``result()`` at epoch end.
    """

    def __init__(self):
        self.sums: Dict[str, Any] = {}
        self.count = 0

    def update(self, metrics: Dict[str, Any], batch_size: int) -> None:
        self.count += batch_size
        for key, value in metrics.items():
            value = jnp.asarray(value)
            if value.ndim == 0:
                value = value * batch_size  # mean metric -> weighted sum
            prev = self.sums.get(key)
            self.sums[key] = value if prev is None else prev + value

    def result(self) -> Dict[str, Any]:
        host = jax.device_get(self.sums)  # one sync for the whole epoch
        out = {}
        for key, value in host.items():
            value = np.asarray(value, np.float64)
            if value.ndim == 0:
                out[key] = float(value / max(self.count, 1))
            else:
                out[key] = value  # summed vectors (e.g. per-class counts)
        return out


def summarize_class_stats(result: Dict[str, Any], class_names: Sequence[str]) -> Dict[str, float]:
    """ErrorStats flattening: meanAcc, per-emotion acc, per-emotion population
    share (run_distillation.m:186-207 extractStats equivalent)."""
    out = {k: v for k, v in result.items() if np.ndim(v) == 0}
    correct = result.get("class_correct")
    pop = result.get("class_pop")
    if correct is not None and pop is not None:
        acc = np.divide(correct, np.maximum(pop, 1.0))
        present = pop > 0
        out["meanAcc"] = float(acc[present].mean()) if present.any() else 0.0
        total = max(pop.sum(), 1.0)
        for i, name in enumerate(class_names):
            out[name] = float(acc[i])
            out[f"{name}Pop"] = float(pop[i] / total)
    return out


class Trainer:
    """Epoch orchestrator around the jitted train/eval steps."""

    def __init__(self, model, loss_fn: LossFn, cfg: TrainConfig,
                 class_names: Sequence[str] = (),
                 mesh=None, rng_names: Sequence[str] = (),
                 eval_loss_fn: Optional[LossFn] = None,
                 lr_scale_fn=None,
                 train_step_override=None):
        self.model = model
        self.cfg = cfg
        self.class_names = class_names
        self.mesh = mesh
        sgd = SGDConfig(momentum=cfg.momentum, weight_decay=cfg.weight_decay)
        has_bs = True
        if train_step_override is not None:
            # e.g. the fused online-distillation step (train/distill.py).
            # The override IS the whole step: rng_names / lr_scale_fn /
            # cfg.momentum+weight_decay must be baked into it by its
            # builder — accepting them here and silently ignoring them
            # would train a different model than configured.
            if rng_names or lr_scale_fn is not None:
                raise ValueError(
                    "train_step_override replaces the built step entirely; "
                    "pass rng_names/lr_scale_fn to the override's builder "
                    "(e.g. make_online_distill_step), not to Trainer")
            if cfg.remat_policy is not None:
                raise ValueError(
                    "cfg.remat_policy cannot be applied to a "
                    "train_step_override; pass remat_policy to the "
                    "override's builder (e.g. make_online_distill_step)")
            self._train_step = train_step_override
        else:
            # Models that accept pad_mask get exact BN statistics on
            # ragged mesh-padded batches (models/vggm.py); detected by
            # signature so toy/test models without the kwarg still work.
            import inspect

            try:
                accepts_mask = "pad_mask" in inspect.signature(
                    type(model).__call__).parameters
            except (TypeError, ValueError):
                accepts_mask = False
            self._train_step = make_train_step(model.apply, loss_fn, sgd,
                                               has_batch_stats=has_bs,
                                               rng_names=tuple(rng_names),
                                               lr_scale_fn=lr_scale_fn,
                                               remat_policy=cfg.remat_policy,
                                               pass_pad_mask=accepts_mask)
        self._eval_step = make_eval_step(model.apply, eval_loss_fn or loss_fn)
        if mesh is not None:
            from mcncrossmodalemotions_tpu.parallel.mesh import (
                batch_sharding,
                replicated_sharding,
            )

            rep = replicated_sharding(mesh)
            data = batch_sharding(mesh)
            self._train_step = jax.jit(
                self._train_step,
                in_shardings=(rep, data, None),
                out_shardings=(rep, rep),
                donate_argnums=(0,),
            )
            self._eval_step = jax.jit(
                self._eval_step, in_shardings=(rep, data), out_shardings=rep
            )
            from mcncrossmodalemotions_tpu.parallel.mesh import shard_batch

            self._shard_batch = lambda b: shard_batch(b, mesh)
            self._num_devices = int(np.prod(mesh.devices.shape))
        else:
            self._train_step = jax.jit(self._train_step, donate_argnums=(0,))
            self._eval_step = jax.jit(self._eval_step)
            self._shard_batch = lambda b: b
            self._num_devices = 1

    # -- device feed -------------------------------------------------------
    def _to_device(self, batch):
        """Pad (ragged mesh batches) + start the async host->device copy.

        Every batch carries a [B] float 'pad_mask' (1 = real sample,
        0 = mesh-padding duplicate) so the loss/metric stack can exclude
        padded rows EXACTLY (losses._wmean / per_class_stats), and the
        returned count is the VALID sample count. The mask is attached
        unconditionally to keep one jit signature for full and ragged
        batches. Models that accept a ``pad_mask`` kwarg (all zoo
        models) also exclude padded rows from train-mode BatchNorm
        statistics (masked BN, models/vggm.py), so a ragged tail batch
        trains exactly as the reference's smaller final batch did.
        """
        bsz = int(np.shape(batch["data"])[0])
        n_valid = (int(np.sum(batch["pad_mask"])) if "pad_mask" in batch
                   else bsz)
        if self._num_devices > 1 and bsz % self._num_devices != 0:
            # Ragged final batch under a mesh: pad by repeating the last
            # row so the batch dim shards evenly (a caller-supplied
            # pad_mask is zero-extended by pad_to_multiple, never
            # duplicated).
            from mcncrossmodalemotions_tpu.parallel.mesh import pad_to_multiple

            batch, n_valid = pad_to_multiple(batch, self._num_devices)
            bsz = int(np.shape(batch["data"])[0])
        if "pad_mask" not in batch:
            mask = np.zeros(bsz, np.float32)
            mask[:n_valid] = 1.0
            batch = dict(batch, pad_mask=mask)
        if self._num_devices > 1:
            # One direct sharded transfer per batch: device_put with the
            # batch sharding copies each shard straight to its device.
            # Routing through jnp.asarray first would land the whole
            # batch on device 0 and pay a second device->device reshard
            # — double feed latency on slow host links.
            return n_valid, self._shard_batch(batch)
        return n_valid, {k: jnp.asarray(v) for k, v in batch.items()}

    def _prefetched(self, batches):
        """Two-stage pipeline over the host iterator.

        Stage 1: a background thread runs the (host-side) batch iterator —
        wav segment reads, JPEG decodes, augmentation — into a small
        queue, overlapping host data work with device compute.
        Stage 2: batch k+1's (async) host->device transfer starts before
        step k runs, overlapping the feed with compute — essential when
        the host link is slow (SKILL.md tunnel: ~33 MB/s) and still free
        on PCIe hosts.
        """
        import queue
        import threading

        q: "queue.Queue" = queue.Queue(maxsize=2)
        SENTINEL = object()
        stop = threading.Event()
        error: list = []

        def produce():
            try:
                for item in batches:
                    while not stop.is_set():
                        try:
                            q.put(item, timeout=0.5)
                            break
                        except queue.Full:
                            continue
                    if stop.is_set():
                        return
            except BaseException as exc:  # surfaced on the consumer side
                error.append(exc)
            finally:
                # The sentinel MUST eventually land for the normal path
                # (consumer still draining a full queue) — a single
                # put_nowait can hit Full and leave the consumer blocked
                # forever. Retry until delivered or the consumer has
                # abandoned us (stop set).
                while not stop.is_set():
                    try:
                        q.put(SENTINEL, timeout=0.5)
                        break
                    except queue.Full:
                        continue

        thread = threading.Thread(target=produce, daemon=True)
        thread.start()

        def host_batches():
            while True:
                item = q.get()
                if item is SENTINEL:
                    if error:
                        raise error[0]
                    return
                yield item

        try:
            it = host_batches()
            try:
                pending = self._to_device(next(it))
            except StopIteration:
                return
            for nxt in it:
                current = pending
                pending = self._to_device(nxt)  # async copy starts now
                yield current
            yield pending
        finally:
            # Consumer abandoned mid-epoch (NaN tripwire, step exception,
            # interrupt): unblock and end the producer thread instead of
            # leaking it parked on a full queue.
            stop.set()
            while True:
                try:
                    q.get_nowait()
                except queue.Empty:
                    break

    # -- state ------------------------------------------------------------
    def init_state(self, example_batch: Dict[str, np.ndarray]) -> TrainState:
        rng = jax.random.PRNGKey(self.cfg.seed)
        init_rng, state_rng = jax.random.split(rng)
        variables = self.model.init(init_rng, jnp.asarray(example_batch["data"]))
        return TrainState.create(variables, state_rng)

    # -- epochs -----------------------------------------------------------
    def run_epoch(self, state: TrainState, batches: Iterable[Dict[str, np.ndarray]],
                  epoch: int, train: bool = True):
        """One pass; returns (state, stats dict). ``batches`` yields dicts of
        numpy arrays with at least 'data'."""
        avg = MetricAverager()
        lr = lr_for_epoch(self.cfg, epoch)
        t0 = time.monotonic()
        n_batches = 0
        profiling = (train and epoch == 1 and self.cfg.profile_dir)
        if profiling:
            jax.profiler.start_trace(self.cfg.profile_dir)
        # Feed-vs-compute attribution: under async dispatch the host loop
        # only ever blocks (a) waiting on the prefetch iterator (host
        # feed not hidden by compute) and (b) in the epoch-end metric
        # sync (device queue drain). Splitting wall time this way makes
        # "feed-bound or compute-bound?" a logged fact per epoch instead
        # of a profiling session.
        feed_wait = 0.0
        # epochSize as an engine-level cap: a shuffled epoch's first
        # batches ARE a random subset, matching cnn_train_dag's per-epoch
        # subsampling (run_distillation.m:154) when the batcher doesn't
        # subsample itself. Data-layer subsampling (EmoVoxBatcher
        # epoch_size) composes: whichever yields fewer samples binds.
        # Counted in VALID samples (not batches x cfg.batch_size): an
        # iterator yielding off-size batches must still stop at the first
        # batch that reaches epoch_size, like the uniform-batch ceil did.
        max_samples = self.cfg.epoch_size if (train and self.cfg.epoch_size) else None
        samples_done = 0
        feed_iter = iter(self._prefetched(batches))
        try:
            while max_samples is None or samples_done < max_samples:
                t_wait = time.monotonic()
                try:
                    bsz, device_batch = next(feed_iter)
                except StopIteration:
                    feed_wait += time.monotonic() - t_wait
                    break
                feed_wait += time.monotonic() - t_wait
                if train:
                    state, metrics = self._train_step(state, device_batch, lr)
                else:
                    metrics = self._eval_step(state, device_batch)
                avg.update(metrics, bsz)
                samples_done += bsz
                n_batches += 1
                if n_batches % self.cfg.log_every == 0:
                    # This print syncs (device_get) — log_every trades
                    # observability against the tunnel round-trip cost.
                    loss_val = float(np.asarray(jax.device_get(metrics["loss"])))
                    elapsed = time.monotonic() - t0
                    hz = avg.count / max(elapsed, 1e-9)
                    mode = "train" if train else "val"
                    print(
                        f"epoch {epoch} [{mode}] batch {n_batches}: "
                        f"loss={loss_val:.4f} ({hz:.1f} samples/s)",
                        flush=True,
                    )
                    if self.cfg.nan_check and not np.isfinite(loss_val):
                        raise FloatingPointError(
                            f"non-finite loss at epoch {epoch} batch {n_batches} "
                            f"(train={train}, lr={lr}) — the reference's NaN "
                            "tripwire (getBatchEmoVoxCeleb.m:189-192), upgraded "
                            "from a debugger drop to a hard error"
                        )
        finally:
            # stop_trace in a finally: an exception mid-epoch (NaN
            # tripwire, OOM, interrupt) must not leak an open trace —
            # a later start_trace in the same process would fail with
            # "Only one profile may be run at a time".
            if profiling:
                jax.profiler.stop_trace()
            # deterministically end the producer thread when the cap (or
            # an exception) exits before the iterator is exhausted
            feed_iter.close()
        if train and n_batches == 0:
            # Silent empty epochs produce a history with no loss at all
            # and "trained" checkpoints that never saw a batch — fail
            # loudly instead (batch_size larger than the split with
            # drop_remainder is the usual cause).
            raise ValueError(
                f"epoch {epoch}: the train iterator yielded ZERO batches "
                "— batch_size likely exceeds the (mini-)epoch's sample "
                "count with drop_remainder=True; shrink batch_size or "
                "raise mini_epoch_ratio/dataset size"
            )
        t_drain = time.monotonic()
        stats = summarize_class_stats(avg.result(), self.class_names)
        wall = max(time.monotonic() - t0, 1e-9)
        stats["samples_per_sec"] = avg.count / wall
        stats["num_samples"] = avg.count
        # wall = feed_wait (host feed not hidden by compute) + dispatch
        # + device_drain (epoch-end sync absorbing queued device work)
        stats["feed_wait_s"] = round(feed_wait, 3)
        stats["device_drain_s"] = round(time.monotonic() - t_drain, 3)
        stats["feed_bound_frac"] = round(feed_wait / wall, 3)
        if self.cfg.nan_check and not np.isfinite(stats.get("loss", 0.0)):
            raise FloatingPointError(
                f"non-finite epoch-{epoch} loss {stats['loss']} "
                f"(train={train}, lr={lr})"
            )
        return state, stats

    def fit(self, train_batches_fn: Callable[[int], Iterable],
            val_batches_fn: Optional[Callable[[int], Iterable]] = None,
            state: Optional[TrainState] = None,
            example_batch: Optional[Dict[str, np.ndarray]] = None):
        """Full training run with resume; returns (state, history).

        ``train_batches_fn(epoch)`` / ``val_batches_fn(epoch)`` build the
        per-epoch batch iterators (the getBatch + epochSize subsampling
        logic lives in the data layer).
        """
        cfg = self.cfg
        if state is None:
            assert example_batch is not None
            state = self.init_state(example_batch)
        start_epoch = 1
        if cfg.resume:
            last, state = ckpt_lib.load_latest(cfg.exp_dir, state)
            start_epoch = last + 1
        # Multi-host: every process runs the identical loop on its batch
        # shard, but only process 0 may write the (replicated) checkpoint
        # and metrics — concurrent writers through the same tmp path on
        # shared storage interleave and publish a corrupted blend.
        is_writer = jax.process_index() == 0
        logger = (MetricsLogger(Path(cfg.exp_dir) / "metrics.jsonl")
                  if is_writer else None)
        history = []
        for epoch in range(start_epoch, cfg.num_epochs + 1):
            state, train_stats = self.run_epoch(
                state, train_batches_fn(epoch), epoch, train=True
            )
            record = {"epoch": epoch, "lr": lr_for_epoch(cfg, epoch),
                      "train": train_stats}
            if val_batches_fn is not None:
                state, val_stats = self.run_epoch(
                    state, val_batches_fn(epoch), epoch, train=False
                )
                record["val"] = val_stats
            if logger is not None:
                logger.log(record)
            history.append(record)
            if (epoch % cfg.checkpoint_every == 0 or epoch == cfg.num_epochs) \
                    and is_writer:
                ckpt_lib.save_checkpoint(cfg.exp_dir, epoch, state, record,
                                         backend=cfg.checkpoint_backend)
            print(
                f"epoch {epoch}/{cfg.num_epochs} done: "
                + " ".join(
                    f"{k}={v:.4f}" for k, v in train_stats.items()
                    if isinstance(v, float) and k in ("loss", "meanAcc", "classerror")
                ),
                flush=True,
            )
        return state, history
