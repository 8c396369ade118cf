"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding is tested without TPU hardware exactly as SURVEY.md
section 4 prescribes: the CPU backend with
--xla_force_host_platform_device_count=8 and the same mesh code that runs
on a pod slice.  Must be set before JAX initializes.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# The axon sitecustomize hook (TPU tunnel) force-sets jax_platforms via
# jax.config at interpreter start, overriding the env var — undo that so
# tests run on the 8-device virtual CPU backend.
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
