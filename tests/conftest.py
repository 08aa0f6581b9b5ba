"""Test configuration: run on a virtual 8-device CPU mesh.

The reference has no tests (SURVEY.md section 4); this suite is the new
framework's verification loop.  Distributed tests follow the plan in
SURVEY.md section 4: fake an 8-chip slice with
``--xla_force_host_platform_device_count`` so DP sharding is exercised
without TPU hardware.
"""

import os

# force-set: the container exports JAX_PLATFORMS=axon (real TPU) and the axon
# sitecustomize additionally writes jax.config jax_platforms="axon,cpu" at
# interpreter start; tests must run on the virtual CPU mesh, so override both
# the env var and the config value before any backend initializes.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running integration tests")
