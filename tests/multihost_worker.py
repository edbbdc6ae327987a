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
import sys

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
    from mcncrossmodalemotions_tpu.parallel.mesh import initialize_multihost

    initialize_multihost(coordinator_address=f"127.0.0.1:{port}",
                         num_processes=nprocs, process_id=proc_id)
    assert jax.device_count() == 2 * nprocs
    assert jax.local_device_count() == 2

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
