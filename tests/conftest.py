"""Test configuration: force the CPU backend with 8 virtual devices so the
multi-chip sharded paths are exercised without TPU hardware (the driver's
dryrun does the same). Must run before jax is imported anywhere."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The environment may force a TPU platform plugin via a sitecustomize hook
# that overrides JAX_PLATFORMS after env parsing; setting the config here
# (before any backend initializes) wins and keeps tests on the CPU mesh.
jax.config.update("jax_platforms", "cpu")

import pathlib

import pytest

DATA = pathlib.Path(__file__).parent / "data"


@pytest.fixture
def data_dir() -> pathlib.Path:
    return DATA
