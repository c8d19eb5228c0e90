"""Test configuration: force an 8-device virtual CPU mesh.

All tests run on CPU with 8 fake devices so mesh/halo/collective logic is
exercised without a TPU pod (the strategy SURVEY.md §4 prescribes). Must set
env vars before the first jax import anywhere.
"""

import os

# Force-set: the sandbox presets JAX_PLATFORMS=axon (the remote TPU tunnel),
# so setdefault would silently leave tests on the single TPU chip.
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")  # belt+braces vs sitecustomize
jax.config.update("jax_enable_x64", False)
# CPU convs otherwise accumulate in reduced precision, breaking torch-parity
# tolerance checks; numeric tests want exact fp32.
jax.config.update("jax_default_matmul_precision", "float32")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: integration-scale test (whole training loops / CLI runs); "
        "excluded by default, enabled with --slow or ICLR17C_SLOW_TESTS=1",
    )


def pytest_addoption(parser):
    parser.addoption(
        "--slow", action="store_true", default=False,
        help="also run the slow integration tier",
    )


def pytest_collection_modifyitems(config, items):
    """Two test tiers (round-4 review: the full suite outgrew a 2-core
    review budget at >40 min). Fast tier = default; slow tier = the
    end-to-end training/CLI integration tests, run with ``--slow`` or
    ``ICLR17C_SLOW_TESTS=1``."""
    if config.getoption("--slow") or os.environ.get("ICLR17C_SLOW_TESTS") == "1":
        return
    skip = pytest.mark.skip(
        reason="slow tier: pass --slow or set ICLR17C_SLOW_TESTS=1"
    )
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


@pytest.fixture
def key():
    return jax.random.PRNGKey(1234)
