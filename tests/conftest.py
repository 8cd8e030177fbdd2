"""Test config: run JAX on CPU with 8 fake devices so sharding/collective
paths are exercised without a TPU pod (SURVEY.md §4). Must run before any
jax computation.

NOTE (axon environments): a sitecustomize module may pre-register a TPU
plugin and force the platform before this file runs. The config.update
below overrides it back to CPU; the force_host_platform_device_count flag
only takes effect if no CPU client exists yet, so this conftest must be the
first thing that touches a jax array. For full isolation run pytest as:
    PYTHONPATH=<repo> JAX_PLATFORMS=cpu \
    XLA_FLAGS=--xla_force_host_platform_device_count=8 python -m pytest
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# Override any platform forced by sitecustomize (e.g. the axon TPU plugin):
# tests must never run through a real-device tunnel.
jax.config.update("jax_platforms", "cpu")

# Golden tests compare fp32 math against torch; disable the default
# bf16-matmul emulation (on TPU we run bf16 deliberately, like the
# reference's AMP — ref: model/model.py:265).
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compile cache: full-model compiles take minutes on one CPU
# core; repeat test runs hit the cache and finish in seconds.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(autouse=True, scope="session")
def _assert_cpu():
    assert jax.default_backend() == "cpu", (
        "tests must run on the CPU backend; got " + jax.default_backend()
    )
    yield
