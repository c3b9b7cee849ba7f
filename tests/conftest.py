"""Test harness: run everything on a virtual 8-device CPU mesh.

This is the TPU answer to "test multi-node without a cluster" (SURVEY.md §4):
sharding/pjit paths are exercised on host CPU with
`--xla_force_host_platform_device_count=8`.

Note: the environment's sitecustomize registers the `axon` remote-TPU backend
and forces `jax_platforms="axon,cpu"` from inside `register()`, so env vars
alone don't stick — we must override via jax.config after import.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
