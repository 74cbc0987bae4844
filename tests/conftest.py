"""Shared fixtures.

Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths are
exercised without TPU hardware (see SURVEY.md §7 / driver contract).
"""

import os

# Must be set before jax initialises.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np
import pytest


@pytest.fixture(autouse=True)
def _cpu_default_device():
    """Run all tests on the host CPU backend (8 virtual devices).

    The container force-registers the 'axon' TPU backend at interpreter
    start, so JAX_PLATFORMS alone cannot select CPU; use default_device.
    """
    import jax

    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:  # pragma: no cover
        yield
        return
    with jax.default_device(cpu):
        yield


@pytest.fixture()
def rng():
    return np.random.default_rng(170817)


@pytest.fixture(autouse=True)
def reset_livepoint_config():
    from nessai_tpu import config

    yield
    config.livepoints.reset()


@pytest.fixture()
def model(rng):
    """A simple 2-D Gaussian model (cf. reference tests/conftest.py:30)."""
    from nessai_tpu.utils.testing import IntegrationTestModel

    m = IntegrationTestModel(2)
    m.set_rng(rng)
    return m


@pytest.fixture()
def flow_config():
    """Tiny flow for fast integration tests (cf. reference
    tests/conftest.py:72)."""
    return dict(n_blocks=2, n_neurons=4, n_layers=1)


@pytest.fixture()
def training_config():
    return dict(max_epochs=5, batch_size=64, patience=3)
