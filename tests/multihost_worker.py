"""Multi-host DP worker: one PROCESS of a 2-process CPU 'cluster'.

Spawned by tests/test_parallel.py::test_multihost_two_process_training.
Each process owns 2 CPU devices; ``jax.distributed.initialize`` joins
them into one 4-device job (collectives cross the process boundary over
the Gloo backend — the CPU stand-in for DCN, SURVEY.md section 5.8).
Every process runs the REAL student train step over the global mesh on
its local shard of the batch and writes a result fingerprint; the test
asserts the processes agree AND match a single-process run on the full
batch — the reference ParameterServer's correctness property (gradient
sum across workers, identical update everywhere,
run_distillation.m:179-181) validated across real process boundaries.
"""

import json
import pathlib
import sys

# The worker runs with script dir tests/ on sys.path, not the repo root;
# without an installed (pip -e) package the import below would fail.
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax

if __name__ == "__main__":
    # Worker-process only: the parent test process imports this module
    # for build_case() mid-suite, when ITS backend is already
    # initialized with conftest's 8 devices — updating the device count
    # there would raise (and would be wrong anyway).
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)


def main(argv):
    proc_id, nprocs, port, out_path = (int(argv[0]), int(argv[1]),
                                       int(argv[2]), argv[3])
    mode = argv[4] if len(argv) > 4 else "step"
    from mcncrossmodalemotions_tpu.parallel.mesh import initialize_multihost

    initialize_multihost(coordinator_address=f"127.0.0.1:{port}",
                         num_processes=nprocs, process_id=proc_id)
    assert jax.device_count() == 2 * nprocs
    assert jax.local_device_count() == 2
    if mode == "fit":
        return run_fit(proc_id, nprocs, out_path, exp_dir=argv[5])
    assert mode == "step", mode

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from mcncrossmodalemotions_tpu.parallel.mesh import make_mesh
    from mcncrossmodalemotions_tpu.train.state import (
        SGDConfig,
        TrainState,
        make_train_step,
    )
    from mcncrossmodalemotions_tpu.zoo import student_loss_fn

    model, batch_np, lr, num_steps = build_case()
    mesh = make_mesh()

    def to_global(tree, spec):
        sharding = NamedSharding(mesh, spec)
        return jax.tree.map(
            lambda a: jax.make_array_from_process_local_data(
                sharding, a, a.shape), tree)

    # Global batch: every process holds the FULL deterministic batch and
    # contributes its slice; params/opt-state replicate everywhere.
    global_batch = jax.tree.map(
        lambda a: jax.make_array_from_process_local_data(
            NamedSharding(mesh, P("data")),
            a[proc_id * (a.shape[0] // nprocs):
              (proc_id + 1) * (a.shape[0] // nprocs)],
            a.shape),
        batch_np)
    variables = model.init(jax.random.PRNGKey(0), batch_np["data"][:1])
    state = TrainState.create(variables, jax.random.PRNGKey(1))
    state = to_global(state, P())

    step = jax.jit(make_train_step(model.apply,
                                   student_loss_fn("hot-cross-ent"),
                                   SGDConfig(weight_decay=0.0)))
    losses = []
    for _ in range(num_steps):
        state, metrics = step(state, global_batch, lr)
        losses.append(float(np.asarray(jax.device_get(metrics["loss"]))))
    fp = {
        "losses": losses,
        "param_l2": float(np.sqrt(sum(
            float(jnp.sum(jnp.square(x)))
            for x in jax.tree.leaves(jax.device_get(state.params))))),
        "device_count": jax.device_count(),
        "process_index": jax.process_index(),
    }
    with open(out_path, "w") as f:
        json.dump(fp, f)


def build_fit_case():
    """Deterministic tiny dataset + Trainer config for the FULL-loop
    multi-host case (VERDICT r3 weak #4): prefetch threads, a ragged
    tail batch (20 samples / batch 6 under a 4-device mesh), per-epoch
    checkpoints by process 0, and a checkpoint-resumed third epoch.
    Shared by the workers and the test's single-process reference run.
    """
    import numpy as np

    from mcncrossmodalemotions_tpu.models import VGGMStudent
    from mcncrossmodalemotions_tpu.train.engine import TrainConfig

    model = VGGMStudent(fc6_features=32, fc7_features=16)
    rng = np.random.RandomState(7)
    n = 20
    data = rng.randn(n, 512, 100, 1).astype(np.float32)
    targets = (rng.randn(n, 8) * 2).astype(np.float32)
    labels = rng.randint(0, 8, n).astype(np.int32)

    def batches_fn(epoch):
        order = np.random.RandomState(100 + epoch).permutation(n)
        for i in range(0, n, 6):  # 6+6+6+2: ragged tail pads on the mesh
            idx = order[i:i + 6]
            yield {"data": data[idx], "logit_target": targets[idx],
                   "max_label": labels[idx]}

    def make_cfg(exp_dir, num_epochs):
        return TrainConfig(num_epochs=num_epochs, batch_size=6,
                           learning_rate=1e-3, weight_decay=0.0,
                           epoch_size=None, seed=0, exp_dir=exp_dir,
                           resume=True, checkpoint_every=1, log_every=1000)

    return model, batches_fn, make_cfg


def build_online_case():
    """Deterministic fused online-distillation step inputs: tiny student
    pipeline + tiny teacher pipeline + a 4-row waveform/frames batch."""
    import numpy as np

    from mcncrossmodalemotions_tpu.exp.ferplus_baselines import (
        FerPlusConfig,
        build_pipeline,
    )
    from mcncrossmodalemotions_tpu.zoo import build_student

    teacher = build_pipeline(FerPlusConfig(tiny_model=True, input_size=32,
                                           dropout=0.0, augment=False))
    student = build_student(tiny=True)
    rng = np.random.RandomState(3)
    batch = {
        "data": rng.randn(4, 64384).astype(np.float32) * 0.1,
        "frames": rng.randint(0, 255, (4, 2, 32, 32, 1)).astype(np.uint8),
    }
    return teacher, student, batch


def run_fit(proc_id, nprocs, out_path, exp_dir):
    """FULL training loop across the process boundary: Trainer.fit with
    prefetch threads + ragged tail + process-0 checkpoints, then a
    checkpoint-resumed epoch restored by BOTH processes, then one fused
    online-distillation step — the code paths a real pod runs first
    (cnn_train_dag + ParameterServer semantics,
    run_distillation.m:170-182)."""
    import json

    import numpy as np
    from jax.experimental import multihost_utils

    from mcncrossmodalemotions_tpu.parallel.mesh import (
        batch_sharding,
        make_mesh,
        replicated_sharding,
        shard_batch,
    )
    from mcncrossmodalemotions_tpu.train.distill import (
        make_online_distill_step,
    )
    from mcncrossmodalemotions_tpu.train.engine import Trainer
    from mcncrossmodalemotions_tpu.train.state import SGDConfig, TrainState
    from mcncrossmodalemotions_tpu.zoo import student_loss_fn

    model, batches_fn, make_cfg = build_fit_case()
    mesh = make_mesh()
    loss_fn = student_loss_fn("hot-cross-ent")
    example = next(batches_fn(1))

    # phase 1: 2-epoch fit — every process builds the IDENTICAL full
    # batches (docs/SCALING.md feed rule); process 0 writes checkpoints
    trainer = Trainer(model, loss_fn, make_cfg(exp_dir, 2), mesh=mesh)
    _, history = trainer.fit(batches_fn, example_batch=example)
    fit_losses = [h["train"]["loss"] for h in history]

    # all processes must see process 0's epoch-2 checkpoint before resume
    multihost_utils.sync_global_devices("checkpoint-written")

    # phase 2: FRESH trainer resumes from the shared checkpoint on BOTH
    # processes and runs epoch 3
    trainer3 = Trainer(model, loss_fn, make_cfg(exp_dir, 3), mesh=mesh)
    state3, hist3 = trainer3.fit(batches_fn, example_batch=example)
    assert len(hist3) == 1 and hist3[0]["epoch"] == 3, hist3

    # phase 3: one fused online-distillation step across the boundary
    teacher, student, ob = build_online_case()
    t_vars = teacher.init(jax.random.PRNGKey(0),
                          np.zeros((1, 32, 32, 1), np.uint8))
    s_vars = student.init(jax.random.PRNGKey(1), ob["data"][:1])
    ostate = TrainState.create(s_vars, jax.random.PRNGKey(2))
    rep = replicated_sharding(mesh)
    ostep = jax.jit(make_online_distill_step(
        student.apply, teacher.apply, t_vars,
        sgd=SGDConfig(momentum=0.9, weight_decay=0.0)),
        in_shardings=(rep, batch_sharding(mesh), None),
        out_shardings=(rep, rep))
    ostate = jax.device_put(ostate, rep)
    ostate, ometrics = ostep(ostate, shard_batch(ob, mesh), 0.05)
    online_loss = float(np.asarray(jax.device_get(ometrics["loss"])))

    fp = {
        "fit_losses": fit_losses,
        "resumed_loss": hist3[0]["train"]["loss"],
        "resumed_num_samples": hist3[0]["train"]["num_samples"],
        "param_l2": _param_l2(state3),
        "online_loss": online_loss,
        "online_param_l2": _param_l2(ostate),
        "device_count": jax.device_count(),
        "process_index": jax.process_index(),
    }
    with open(out_path, "w") as f:
        json.dump(fp, f)


def _param_l2(state):
    import numpy as np
    import jax.numpy as jnp

    return float(np.sqrt(sum(
        float(jnp.sum(jnp.square(x)))
        for x in jax.tree.leaves(jax.device_get(state.params)))))


def build_case():
    """Deterministic (model, full global batch, lr, num_steps) shared by
    the workers and the test's single-process reference run."""
    import numpy as np

    from mcncrossmodalemotions_tpu.models import VGGMStudent

    model = VGGMStudent(fc6_features=32, fc7_features=16)
    rng = np.random.RandomState(0)
    batch = {
        "data": rng.randn(8, 512, 100, 1).astype(np.float32),
        "logit_target": rng.randn(8, 8).astype(np.float32) * 2,
        "max_label": rng.randint(0, 8, 8).astype(np.int32),
        "pad_mask": np.ones(8, np.float32),
    }
    return model, batch, 1e-3, 3


if __name__ == "__main__":
    main(sys.argv[1:])
