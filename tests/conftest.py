"""Test configuration: run everything on a simulated 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware by forcing the host
platform to expose 8 virtual devices (SURVEY.md §4 "Distributed without a
cluster").  Must be set before JAX initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The container's sitecustomize registers the tunneled TPU ('axon') backend and
# pins jax_platforms at the config level, so the env var alone is not enough:
# force the simulated 8-device CPU platform through the config.
jax.config.update("jax_platforms", "cpu")

# XLA CPU compiles of the conv graphs dominate suite time; a persistent
# compilation cache makes every run after the first fast.
_cache = os.path.join(os.path.dirname(__file__), os.pardir, ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def eight_devices():
    import jax

    devs = jax.devices()
    assert len(devs) >= 8, f"expected 8 simulated devices, got {len(devs)}"
    return devs[:8]
