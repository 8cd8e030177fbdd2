"""Test config: run JAX on CPU with 8 fake devices so sharding/collective
paths are exercised without a TPU pod (SURVEY.md §4). Must run before any
jax import."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# Golden tests compare fp32 math against torch; disable the default
# bf16-matmul emulation (on TPU we run bf16 deliberately, like the
# reference's AMP — ref: model/model.py:265).
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
