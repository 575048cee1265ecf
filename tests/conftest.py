"""Test configuration: force the CPU backend with 8 virtual devices.

This container routes JAX to a single real TPU chip through the axon tunnel
(slow first-compile, one process at a time); tests must run hermetically on
CPU, with enough virtual devices to exercise multi-chip sharding. Both the
env vars and the in-process config update are needed because a sitecustomize
hook registers the TPU plugin before pytest starts.
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402

DAE_DIR = "/root/reference/pathtracer/dae"


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running end-to-end renders")


@pytest.fixture(scope="session")
def dae_dir():
    return DAE_DIR
