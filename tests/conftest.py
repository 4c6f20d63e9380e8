"""Test configuration: force JAX onto a virtual 8-device CPU mesh so
sharding tests run without TPU hardware (SURVEY.md §4)."""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import jax

# The axon TPU sitecustomize force-sets jax_platforms="axon,cpu" at
# interpreter start; override it back so tests run on the virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")


def pytest_configure(config):
    assert jax.default_backend() == "cpu", jax.default_backend()
    assert len(jax.devices()) == 8, jax.devices()
