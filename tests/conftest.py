"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Real-TPU benchmarking happens in bench.py; tests must be deterministic and
runnable anywhere, so we force the CPU platform with 8 virtual devices to
exercise the multi-chip sharding paths.

Note: the environment's sitecustomize may register a TPU-tunnel PJRT
plugin and force jax_platforms to it at interpreter start; we override the
config (not just the env var) before any backend is initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", os.environ.get("W2RAP_TEST_PLATFORM", "cpu"))
# reuse compiled kernels across test runs (same persistent cache as the CLI)
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
