"""Test harness: force an 8-device virtual CPU mesh before jax initializes.

Multi-chip sharding is validated the standard way (SURVEY.md §4e): the CPU
backend is split into 8 virtual devices via XLA_FLAGS so pjit/NamedSharding
paths compile and execute without TPU hardware.  Real-chip benchmarking lives
in bench.py, not the test suite.
"""

import os
import sys

# Force CPU: the ambient environment may point JAX_PLATFORMS at a real TPU
# tunnel (and a sitecustomize may import jax before this file runs), so the
# platform must be overridden via jax.config, not just the env var.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)
assert jax.device_count() == 8, "expected 8 virtual CPU devices for tests"

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def atc_cfg():
    from crowdmod_tpu.config import load_config

    return load_config(os.path.join(REPO_ROOT, "configs", "ATC.yml"))


@pytest.fixture(scope="session")
def smoke_cfg():
    from crowdmod_tpu.config import load_config

    return load_config(os.path.join(REPO_ROOT, "configs", "4test", "ATC.yml"))
