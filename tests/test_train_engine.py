"""Training engine: overfit a tiny problem, checkpoint/resume, best-epoch."""

import numpy as np
import flax.linen as nn
import jax
import jax.numpy as jnp
import pytest

from mcncrossmodalemotions_tpu.losses import class_error, per_class_stats, softmax_ce
from mcncrossmodalemotions_tpu.train import checkpoints as ckpt_lib
from mcncrossmodalemotions_tpu.train.engine import (
    MetricAverager,
    TrainConfig,
    Trainer,
    logspace_lr,
    lr_for_epoch,
    summarize_class_stats,
)


class TinyNet(nn.Module):
    num_outputs: int = 3

    @nn.compact
    def __call__(self, x, train=False):
        h = nn.Dense(16)(x)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9)(h)
        h = nn.relu(h)
        return nn.Dense(self.num_outputs)(h)


def _loss_fn(logits, batch):
    loss = softmax_ce(logits, batch["label"])
    correct, pop = per_class_stats(logits, batch["label"], 3)
    return loss, {
        "classerror": class_error(logits, batch["label"]),
        "class_correct": correct,
        "class_pop": pop,
    }


def _make_data(n=96, seed=0):
    rng = np.random.RandomState(seed)
    centers = np.asarray([[2.0, 0.0], [-2.0, 1.0], [0.0, -2.0]], np.float32)
    labels = rng.randint(0, 3, n)
    data = centers[labels] + 0.3 * rng.randn(n, 2).astype(np.float32)
    return data, labels


def _batches(data, labels, batch_size=32):
    def fn(epoch):
        for i in range(0, len(data), batch_size):
            yield {"data": data[i:i + batch_size], "label": labels[i:i + batch_size]}
    return fn


def test_lr_schedule_array():
    cfg = TrainConfig(learning_rate=logspace_lr(-4, -5, 10), num_epochs=10)
    assert lr_for_epoch(cfg, 1) == pytest.approx(1e-4)
    assert lr_for_epoch(cfg, 10) == pytest.approx(1e-5)
    assert lr_for_epoch(TrainConfig(learning_rate=0.01), 5) == 0.01


def test_trainer_overfits_tiny_problem(tmp_path):
    data, labels = _make_data()
    cfg = TrainConfig(num_epochs=12, batch_size=32, learning_rate=0.05,
                      weight_decay=0.0, exp_dir=str(tmp_path / "exp"),
                      log_every=1000)
    trainer = Trainer(TinyNet(), _loss_fn, cfg, class_names=("a", "b", "c"))
    state, history = trainer.fit(
        _batches(data, labels),
        val_batches_fn=_batches(data, labels),
        example_batch={"data": data[:2]},
    )
    final = history[-1]
    assert final["train"]["classerror"] < 0.1
    assert final["val"]["classerror"] < 0.1
    assert "meanAcc" in final["train"]
    assert final["train"]["aPop"] + final["train"]["bPop"] + final["train"]["cPop"] == pytest.approx(1.0)
    # feed/compute attribution is logged per epoch (feed-bound or not
    # becomes a recorded fact, not a profiling session)
    for stats in (final["train"], final["val"]):
        wall = stats["num_samples"] / stats["samples_per_sec"]
        assert 0.0 <= stats["feed_wait_s"] <= wall + 1e-6
        assert stats["device_drain_s"] >= 0.0
        assert 0.0 <= stats["feed_bound_frac"] <= 1.0


def test_resume_from_checkpoint(tmp_path):
    data, labels = _make_data()
    exp_dir = str(tmp_path / "exp")
    kw = dict(batch_size=32, learning_rate=0.05, weight_decay=0.0,
              exp_dir=exp_dir, log_every=1000)
    trainer = Trainer(TinyNet(), _loss_fn, TrainConfig(num_epochs=3, **kw))
    trainer.fit(_batches(data, labels), example_batch={"data": data[:2]})
    assert len(ckpt_lib.list_checkpoints(exp_dir)) == 3

    # Resume continues at epoch 4, not from scratch.
    trainer2 = Trainer(TinyNet(), _loss_fn, TrainConfig(num_epochs=5, **kw))
    _, history = trainer2.fit(_batches(data, labels), example_batch={"data": data[:2]})
    assert [h["epoch"] for h in history] == [4, 5]


def test_corrupt_checkpoint_fallback(tmp_path):
    data, labels = _make_data()
    exp_dir = str(tmp_path / "exp")
    kw = dict(batch_size=32, learning_rate=0.05, weight_decay=0.0,
              exp_dir=exp_dir, log_every=1000)
    trainer = Trainer(TinyNet(), _loss_fn, TrainConfig(num_epochs=2, **kw))
    trainer.fit(_batches(data, labels), example_batch={"data": data[:2]})
    # Corrupt the newest checkpoint; resume must fall back to epoch 1.
    ckpt_lib.checkpoint_path(exp_dir, 2).write_bytes(b"garbage")
    trainer2 = Trainer(TinyNet(), _loss_fn, TrainConfig(num_epochs=3, **kw))
    _, history = trainer2.fit(_batches(data, labels), example_batch={"data": data[:2]})
    assert history[0]["epoch"] == 2


def test_find_best_epoch_and_prune(tmp_path):
    exp_dir = tmp_path / "exp"
    exp_dir.mkdir()
    for epoch, err in [(1, 0.5), (2, 0.2), (3, 0.3)]:
        ckpt_lib.save_checkpoint(exp_dir, epoch, {"w": np.zeros(2)},
                                 {"val": {"classerror": err}})
    assert ckpt_lib.find_best_epoch(exp_dir) == 2
    ckpt_lib.find_best_epoch(exp_dir, prune=True)
    assert [e for e, _ in ckpt_lib.list_checkpoints(exp_dir)] == [2]


def test_metric_averager_weighted():
    avg = MetricAverager()
    avg.update({"loss": jnp.asarray(1.0)}, 10)
    avg.update({"loss": jnp.asarray(2.0)}, 30)
    assert avg.result()["loss"] == pytest.approx(1.75)


def test_summarize_class_stats():
    result = {"loss": 0.5, "class_correct": np.array([1.0, 4.0]),
              "class_pop": np.array([2.0, 4.0])}
    stats = summarize_class_stats(result, ("neg", "pos"))
    assert stats["neg"] == 0.5 and stats["pos"] == 1.0
    assert stats["meanAcc"] == pytest.approx(0.75)
    assert stats["negPop"] == pytest.approx(2 / 6)


def test_finetune_lr_scaling():
    """Backbone params move 10x slower than head params under the
    finetuneLR recipe (ferPlusZoo.m:236-237)."""
    import flax.linen as nn

    from mcncrossmodalemotions_tpu.train.state import (
        SGDConfig,
        TrainState,
        finetune_lr_scale_fn,
        make_train_step,
    )

    class Net(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            h = nn.Dense(4, name="backbone")(x)
            return nn.Dense(2, name="prediction")(h)

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(8, 3).astype(np.float32))
    batch = {"data": x, "label": jnp.asarray(rng.randint(0, 2, 8))}

    def loss_fn(logits, b):
        return softmax_ce(logits, b["label"]), {}

    model = Net()
    variables = model.init(jax.random.PRNGKey(0), x)
    results = {}
    for name, scale_fn in (("uniform", None),
                           ("finetune", finetune_lr_scale_fn())):
        step = make_train_step(model.apply, loss_fn,
                               SGDConfig(momentum=0.0, weight_decay=0.0),
                               has_batch_stats=False, lr_scale_fn=scale_fn)
        state = TrainState.create(variables, jax.random.PRNGKey(1))
        new_state, _ = step(state, batch, 0.1)
        delta = jax.tree.map(lambda a, b: np.abs(np.asarray(a - b)).max(),
                             new_state.params, state.params)
        results[name] = delta
    uni, ft = results["uniform"], results["finetune"]
    # head moves identically; backbone moves 10x less
    assert ft["prediction"]["kernel"] == pytest.approx(
        uni["prediction"]["kernel"], rel=1e-5)
    assert ft["backbone"]["kernel"] == pytest.approx(
        uni["backbone"]["kernel"] * 0.1, rel=1e-4)


def test_profiler_trace_written(tmp_path):
    """TrainConfig.profile_dir captures a jax.profiler trace of epoch 1."""
    data, labels = _make_data(n=32)
    cfg = TrainConfig(num_epochs=1, batch_size=16, learning_rate=0.05,
                      weight_decay=0.0, exp_dir=str(tmp_path / "exp"),
                      log_every=1000, profile_dir=str(tmp_path / "trace"))
    trainer = Trainer(TinyNet(), _loss_fn, cfg)
    trainer.fit(_batches(data, labels), example_batch={"data": data[:2]})
    trace_files = list((tmp_path / "trace").rglob("*"))
    assert trace_files, "profiler should write trace artifacts"


def test_producer_thread_cleanup_on_error(tmp_path):
    """A mid-epoch exception must not leak the batch-producer thread."""
    import threading
    import time as _time

    data, labels = _make_data(n=96)
    cfg = TrainConfig(num_epochs=1, batch_size=16, learning_rate=0.05,
                      weight_decay=0.0, exp_dir=str(tmp_path / "exp"),
                      log_every=1000)
    trainer = Trainer(TinyNet(), _loss_fn, cfg)
    state = trainer.init_state({"data": data[:2]})

    def exploding_batches():
        yield {"data": data[:16], "label": labels[:16]}
        raise RuntimeError("loader exploded")

    before = threading.active_count()
    with pytest.raises(RuntimeError, match="loader exploded"):
        trainer.run_epoch(state, exploding_batches(), epoch=1, train=True)
    _time.sleep(1.5)  # give the producer its shutdown window
    assert threading.active_count() <= before + 1


def test_orbax_checkpoint_backend(tmp_path):
    """Orbax checkpoints round-trip and interoperate with list/load/resume."""
    from mcncrossmodalemotions_tpu.train.state import TrainState

    model = TinyNet()
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 2)))
    state = TrainState.create(variables, jax.random.PRNGKey(1))
    path = ckpt_lib.save_checkpoint(tmp_path, 1, state,
                                    metrics={"val": {"classerror": 0.3}},
                                    backend="orbax")
    assert path.is_dir()
    assert [e for e, _ in ckpt_lib.list_checkpoints(tmp_path)] == [1]

    blank = TrainState.create(
        jax.tree.map(jnp.zeros_like, variables), jax.random.PRNGKey(2))
    restored = ckpt_lib.load_checkpoint(path, blank)
    for a, b in zip(jax.tree.leaves(restored.params),
                    jax.tree.leaves(state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    # load_latest resolves the orbax dir too
    epoch, resumed = ckpt_lib.load_latest(tmp_path, blank)
    assert epoch == 1
    # best-epoch pruning removes orbax dirs
    ckpt_lib.save_checkpoint(tmp_path, 2, state,
                             metrics={"val": {"classerror": 0.6}},
                             backend="orbax")
    assert ckpt_lib.find_best_epoch(tmp_path, prune=True) == 1
    assert [e for e, _ in ckpt_lib.list_checkpoints(tmp_path)] == [1]


def test_zero_train_batches_fails_loudly(tmp_path):
    """batch_size > split size with drop_remainder must raise, not
    produce an empty 'trained' epoch with no loss in its history."""
    import pytest

    from mcncrossmodalemotions_tpu.exp.run_distillation import (
        DistillationConfig,
        run_distillation,
    )
    from mcncrossmodalemotions_tpu.data.emovox import build_synthetic_imdb

    imdb = build_synthetic_imdb(tmp_path / "wavs", num_speakers=2,
                                tracks_per_speaker=2)
    cfg = DistillationConfig(num_epochs=1, batch_size=64, tiny_model=True,
                             mini_epoch_ratio=1.0, mini_val=1.0,
                             out_root=str(tmp_path / "exps"))
    with pytest.raises(ValueError, match="ZERO batches"):
        run_distillation(cfg, imdb=imdb)


def test_epoch_size_caps_train_batches(tmp_path):
    """TrainConfig.epoch_size limits each train pass to
    ceil(epoch_size/batch_size) batches (cnn_train_dag's epochSize,
    run_distillation.m:154) even when the batcher yields more."""
    data, labels = _make_data(n=96)
    cfg = TrainConfig(num_epochs=1, batch_size=32, learning_rate=0.05,
                      epoch_size=40, exp_dir=str(tmp_path / "exp"),
                      log_every=1000)
    trainer = Trainer(TinyNet(), _loss_fn, cfg)
    fn = _batches(data, labels)
    state, history = trainer.fit(
        fn, example_batch={"data": data[:32], "label": labels[:32]})
    # ceil(40/32) = 2 of the 3 available batches -> 64 samples seen
    assert history[0]["train"]["num_samples"] == 64
    # val passes are NOT capped
    cfg2 = TrainConfig(num_epochs=1, batch_size=32, learning_rate=0.05,
                       epoch_size=40, exp_dir=str(tmp_path / "exp2"),
                       log_every=1000)
    trainer2 = Trainer(TinyNet(), _loss_fn, cfg2)
    _, h2 = trainer2.fit(
        fn, val_batches_fn=fn,
        example_batch={"data": data[:32], "label": labels[:32]})
    assert h2[0]["val"]["num_samples"] == 96


def test_epoch_size_counts_valid_samples_not_batches(tmp_path):
    """epoch_size is a SAMPLE budget: an iterator yielding batches whose
    size differs from cfg.batch_size must still stop at the first batch
    that reaches epoch_size (ADVICE r3: the old ceil(epoch_size/
    batch_size) batch count silently under/over-shot)."""
    data, labels = _make_data(n=96)
    # cfg says batch 64 but the iterator actually yields batches of 16:
    # the old batch-count cap would run ceil(40/64)=1 batch (16 samples).
    cfg = TrainConfig(num_epochs=1, batch_size=64, learning_rate=0.05,
                      epoch_size=40, exp_dir=str(tmp_path / "exp"),
                      log_every=1000)
    trainer = Trainer(TinyNet(), _loss_fn, cfg)
    fn = _batches(data, labels, batch_size=16)
    _, history = trainer.fit(
        fn, example_batch={"data": data[:16], "label": labels[:16]})
    # 16, 32, 48 >= 40 -> three batches, 48 samples
    assert history[0]["train"]["num_samples"] == 48


def test_remat_policies_numerics():
    """Every remat policy must be numerically IDENTICAL to the baseline
    step (remat re-runs the same deterministic ops; docs/PERF.md round-5
    remat study measured all of them slower on-chip, so they ship as
    opt-in capacity levers only — but a policy that changed numerics
    would be a bug, not a lever)."""
    import jax

    from mcncrossmodalemotions_tpu.models import VGGMStudent
    from mcncrossmodalemotions_tpu.train.state import (
        SGDConfig,
        TrainState,
        make_train_step,
        resolve_remat_policy,
    )
    from mcncrossmodalemotions_tpu.zoo import student_loss_fn

    with pytest.raises(ValueError, match="unknown remat policy"):
        resolve_remat_policy("nope")
    assert resolve_remat_policy(None) is None

    model = VGGMStudent(fc6_features=32, fc7_features=16)
    rng = np.random.RandomState(0)
    batch = {"data": jnp.asarray(rng.randn(2, 512, 100, 1), jnp.float32),
             "logit_target": jnp.asarray(rng.randn(2, 8), jnp.float32),
             "max_label": jnp.asarray(rng.randint(0, 8, 2))}
    variables = model.init(jax.random.PRNGKey(0), batch["data"][:1])
    loss_fn = student_loss_fn("hot-cross-ent")
    base = None
    for pol in (None, "drop_conv1", "save_pools", "nothing"):
        state = TrainState.create(variables, jax.random.PRNGKey(1))
        step = jax.jit(make_train_step(model.apply, loss_fn,
                                       SGDConfig(weight_decay=0.0),
                                       remat_policy=pol))
        s2, m = step(state, batch, 1e-3)
        leaves = np.concatenate([np.ravel(jax.device_get(x))
                                 for x in jax.tree.leaves(s2.params)])
        if base is None:
            base = (float(m["loss"]), leaves)
        else:
            assert float(m["loss"]) == base[0]
            np.testing.assert_array_equal(leaves, base[1])


def test_trainer_rejects_knobs_alongside_override(tmp_path):
    """rng_names/lr_scale_fn must be baked into a train_step_override by
    its builder; Trainer fails loudly instead of silently ignoring."""
    with pytest.raises(ValueError, match="override"):
        Trainer(TinyNet(), _loss_fn, TrainConfig(exp_dir=str(tmp_path)),
                rng_names=("dropout",),
                train_step_override=lambda s, b, lr: (s, {}))
    # same for a cfg-level remat policy: the override's builder must
    # receive it (make_online_distill_step(remat_policy=...))
    with pytest.raises(ValueError, match="remat_policy"):
        Trainer(TinyNet(), _loss_fn,
                TrainConfig(exp_dir=str(tmp_path),
                            remat_policy="drop_conv1"),
                train_step_override=lambda s, b, lr: (s, {}))


def test_structural_mismatch_raises_not_restarts(tmp_path):
    """Resuming with a CHANGED architecture must raise, not silently
    fall back to epoch 0 and clobber the experiment; byte corruption
    still falls back (run_distillation.m:169 known weakness)."""
    from mcncrossmodalemotions_tpu.train.checkpoints import (
        CorruptCheckpointError,
        load_checkpoint,
        load_latest,
        save_checkpoint,
    )

    state = {"w": np.arange(4.0, dtype=np.float32)}
    path = save_checkpoint(tmp_path, 1, state)
    # structural mismatch: different tree
    other = {"w": np.zeros(4, np.float32), "extra": np.zeros(2, np.float32)}
    with pytest.raises(Exception) as ei:
        load_checkpoint(path, other)
    assert not isinstance(ei.value, CorruptCheckpointError)
    with pytest.raises(Exception):
        load_latest(tmp_path, other)  # does NOT silently return (0, other)
    # byte corruption: load_latest falls back to the previous epoch
    good = save_checkpoint(tmp_path, 2, {"w": np.ones(4, np.float32) * 7})
    path3 = save_checkpoint(tmp_path, 3, state)
    path3.write_bytes(b"garbage not msgpack")
    epoch, restored = load_latest(tmp_path, state)
    assert epoch == 2
    np.testing.assert_array_equal(restored["w"], np.ones(4) * 7)


def test_model_state_extra_collections_survive_steps():
    """apply() returns only the MUTABLE collections; the step must merge
    them into model_state, not replace it (a model carrying a constants
    collection would otherwise lose it after one step)."""
    from mcncrossmodalemotions_tpu.train.state import (
        SGDConfig,
        TrainState,
        make_train_step,
    )

    class ConstNet(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            c = self.variable("constants", "offset",
                              lambda: jnp.ones((), jnp.float32))
            h = nn.Dense(4)(x) + c.value
            h = nn.BatchNorm(use_running_average=not train, momentum=0.9)(h)
            return nn.Dense(3)(h)

    net = ConstNet()
    x = jnp.ones((8, 2), jnp.float32)
    variables = net.init(jax.random.PRNGKey(0), x)
    assert "constants" in variables
    state = TrainState.create(variables, jax.random.PRNGKey(1))
    step = jax.jit(make_train_step(net.apply, _loss_fn, SGDConfig()))
    batch = {"data": np.ones((8, 2), np.float32),
             "label": np.zeros(8, np.int64)}
    for _ in range(2):  # second step fails if 'constants' was dropped
        state, _ = step(state, batch, 0.01)
    assert "constants" in state.model_state
    assert "batch_stats" in state.model_state
