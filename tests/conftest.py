"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set the environment before jax is imported anywhere — this gives every
test access to 8 fake devices so multi-chip sharding (data-parallel psum,
all_gather sampling) is exercised without TPU hardware.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

# The TPU-attach sitecustomize imports jax before pytest starts, so the env
# vars above can be too late; jax backend selection is lazy, so switching the
# platform through the config still works here.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)

# The CI host has very few cores; XLA compiles dominate test time. A
# persistent compilation cache makes every run after the first fast.
_CACHE_DIR = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def eight_devices():
    devs = jax.devices()
    assert len(devs) == 8, f"expected 8 virtual devices, got {len(devs)}"
    return devs
