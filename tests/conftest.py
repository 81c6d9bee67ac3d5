"""Test configuration: run all tests on a virtual 8-device CPU mesh.

Must set XLA flags before jax is imported anywhere (SURVEY.md §4: the TPU
build's answer to the reference's missing distributed tests).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin overrides the JAX_PLATFORMS env var; the config update
# is authoritative. Tests must run on the virtual 8-device CPU mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
assert jax.devices()[0].platform == "cpu", jax.devices()
assert len(jax.devices()) == 8, jax.devices()

# Persistent compilation cache: XLA compiles dominate test time on small CPUs
# (~0.5s per distinct op); cache them across runs. The cache is keyed per
# environment MODE: processes run with the axon plugin on PYTHONPATH detect
# different CPU machine features than plugin-bypassed ones
# (`PYTHONPATH= JAX_PLATFORMS=cpu`, the tunnel-outage recipe), and loading
# the other mode's AOT entries can SIGILL/segfault (observed r5:
# cpu_aot_loader "+prefer-no-scatter not supported on the host machine").
_mode = "" if "axon" in os.environ.get("PYTHONPATH", "") else "_cpu"
_cache_dir = os.path.join(
    os.path.dirname(__file__), "..", f".jax_cache{_mode}")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
