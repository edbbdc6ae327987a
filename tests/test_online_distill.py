"""Online (fused) distillation: teacher forward inside the student step."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mcncrossmodalemotions_tpu.data.emovox import (
    BatchConfig,
    EmoVoxBatcher,
    build_synthetic_imdb,
)
from mcncrossmodalemotions_tpu.train.distill import (
    aggregate_frame_logits,
    make_online_distill_step,
)
from mcncrossmodalemotions_tpu.train.state import SGDConfig, TrainState


def test_aggregate_frame_logits():
    logits = jnp.asarray([[[0.0, 2.0], [3.0, 1.0]]])  # [1, 2, 2]
    np.testing.assert_array_equal(
        np.asarray(aggregate_frame_logits(logits, "max")), [[3.0, 2.0]])
    np.testing.assert_array_equal(
        np.asarray(aggregate_frame_logits(logits, "mean")), [[1.5, 1.5]])


@pytest.fixture(scope="module")
def paired_imdb(tmp_path_factory):
    root = tmp_path_factory.mktemp("paired")
    return build_synthetic_imdb(root / "wavs", num_speakers=2,
                                tracks_per_speaker=3, with_frames=True)


def test_batcher_emits_frames(paired_imdb):
    cfg = BatchConfig(batch_size=2, frames_per_crop=3, frame_size=32)
    batcher = EmoVoxBatcher(paired_imdb, cfg, train=True, seed=0)
    batch = next(iter(batcher.batches(epoch=1)))
    assert batch["frames"].shape == (2, 3, 32, 32, 1)
    assert batch["frames"].dtype == np.uint8
    assert batch["data"].shape == (2, 64384)


def test_online_distill_step_runs_and_learns(paired_imdb):
    """One fused program: teacher fwd + student fwd/bwd/update. The loss
    must fall over repeated steps on a fixed batch."""
    from mcncrossmodalemotions_tpu.exp.ferplus_baselines import (
        FerPlusConfig,
        build_pipeline,
    )
    from mcncrossmodalemotions_tpu.zoo import build_student

    teacher = build_pipeline(FerPlusConfig(tiny_model=True, input_size=32,
                                           dropout=0.0, augment=False))
    t_vars = teacher.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, 32, 32, 1), jnp.uint8))
    student = build_student(tiny=True)
    cfg = BatchConfig(batch_size=2, frames_per_crop=2, frame_size=32)
    batcher = EmoVoxBatcher(paired_imdb, cfg, train=True, seed=0)
    batch = next(iter(batcher.batches(epoch=1)))
    device_batch = {k: jnp.asarray(v) for k, v in batch.items()}

    s_vars = student.init(jax.random.PRNGKey(1), device_batch["data"][:1])
    state = TrainState.create(s_vars, jax.random.PRNGKey(2))
    step = jax.jit(make_online_distill_step(
        student.apply, teacher.apply, t_vars,
        sgd=SGDConfig(momentum=0.9, weight_decay=0.0)))
    losses = []
    for _ in range(8):
        state, metrics = step(state, device_batch, 0.05)
        losses.append(float(jax.device_get(metrics["loss"])))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses
    assert int(jax.device_get(state.step)) == 8


def test_online_distill_step_remat_identical(paired_imdb):
    """A remat policy on the FUSED step (student recompute-in-backward;
    teacher untouched) must be numerically identical to no policy —
    remat re-runs the same deterministic ops (run_distillation's
    remat_policy plumbs here when online_teacher is set)."""
    from mcncrossmodalemotions_tpu.exp.ferplus_baselines import (
        FerPlusConfig,
        build_pipeline,
    )
    from mcncrossmodalemotions_tpu.zoo import build_student

    teacher = build_pipeline(FerPlusConfig(tiny_model=True, input_size=32,
                                           dropout=0.0, augment=False))
    t_vars = teacher.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, 32, 32, 1), jnp.uint8))
    student = build_student(tiny=True)
    cfg = BatchConfig(batch_size=2, frames_per_crop=2, frame_size=32)
    batcher = EmoVoxBatcher(paired_imdb, cfg, train=True, seed=0)
    batch = next(iter(batcher.batches(epoch=1)))
    device_batch = {k: jnp.asarray(v) for k, v in batch.items()}
    s_vars = student.init(jax.random.PRNGKey(1), device_batch["data"][:1])

    results = []
    for pol in (None, "drop_conv1", "nothing"):
        state = TrainState.create(s_vars, jax.random.PRNGKey(2))
        step = jax.jit(make_online_distill_step(
            student.apply, teacher.apply, t_vars,
            sgd=SGDConfig(momentum=0.9, weight_decay=0.0),
            remat_policy=pol))
        state, metrics = step(state, device_batch, 0.05)
        leaves = np.concatenate([np.ravel(jax.device_get(x))
                                 for x in jax.tree.leaves(state.params)])
        results.append((float(jax.device_get(metrics["loss"])), leaves))
    for loss, leaves in results[1:]:
        assert loss == results[0][0]
        np.testing.assert_array_equal(leaves, results[0][1])


def test_online_targets_match_offline_teacher(paired_imdb):
    """The in-graph teacher targets equal running the teacher separately
    on the same frames (stop-gradient fusion must not change numerics)."""
    from mcncrossmodalemotions_tpu.exp.ferplus_baselines import (
        FerPlusConfig,
        build_pipeline,
    )

    teacher = build_pipeline(FerPlusConfig(tiny_model=True, input_size=32,
                                           dropout=0.0, augment=False))
    t_vars = teacher.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, 32, 32, 1), jnp.uint8))
    cfg = BatchConfig(batch_size=2, frames_per_crop=2, frame_size=32)
    batcher = EmoVoxBatcher(paired_imdb, cfg, train=False, seed=0)
    batch = next(iter(batcher.batches(epoch=1)))
    frames = jnp.asarray(batch["frames"])
    b, k = frames.shape[:2]
    offline = teacher.apply(t_vars, frames.reshape((b * k,) + frames.shape[2:]),
                            train=False)
    offline = np.asarray(offline).reshape(b, k, -1).max(axis=1)
    from mcncrossmodalemotions_tpu.train.distill import aggregate_frame_logits

    online = np.asarray(aggregate_frame_logits(
        jnp.asarray(np.asarray(
            teacher.apply(t_vars, frames.reshape((b * k,) + frames.shape[2:]),
                          train=False)).reshape(b, k, -1)), "max"))
    np.testing.assert_allclose(online, offline, atol=1e-6)
