"""Test configuration: force a virtual 8-device CPU mesh.

Multi-chip DP tests run identically on 1 real chip via a fake 8-device
CPU platform — the TPU-native answer to "test multi-node without a
cluster" (SURVEY.md section 4 rebuild implications).

The environment pre-imports jax at interpreter startup (axon PJRT
sitecustomize) with JAX_PLATFORMS=axon, so env vars set here are too
late; jax.config.update still works because backend *initialisation* is
lazy.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(0)
