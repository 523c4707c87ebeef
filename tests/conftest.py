"""Test config: force an 8-device virtual CPU mesh BEFORE jax initializes.

Simulates the multi-chip TPU topology on CPU (SURVEY §4): sharding/collective tests run
against a real 8-device mesh without TPU hardware; numerics tests run fp32 on CPU.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
os.environ.setdefault("TOKENIZERS_PARALLELISM", "false")

import jax

# The axon sitecustomize calls jax.config.update('jax_platforms', 'axon,cpu') at interpreter
# start, overriding the env var — force CPU back for the test suite.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

assert jax.default_backend() == "cpu", "tests must run on the virtual CPU mesh"
assert len(jax.devices()) == 8


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: heavyweight tests (torch/HF parity fixtures, multi-process runs); "
        "deselect with -m 'not slow' for a fast default loop",
    )


@pytest.fixture(scope="session")
def cpu_mesh():
    from projectiontrainer_tpu.core.mesh import MeshConfig, build_mesh

    return build_mesh(MeshConfig(data=4, model=2))


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
