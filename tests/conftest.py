"""Test configuration: force the JAX CPU backend with 8 virtual devices so
mesh/sharding tests run without TPU hardware (SURVEY.md §4.3)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment's sitecustomize registers the remote 'axon' TPU backend and
# forces jax_platforms="axon,cpu"; tests must run on the local CPU backend
# with the virtual 8-device topology.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from tpusgl.config import QWEN2_5_PRESETS, EngineConfig  # noqa: E402


@pytest.fixture(scope="session")
def tiny_cfg():
    return QWEN2_5_PRESETS["tiny"]


@pytest.fixture(scope="session")
def tiny_engine_cfg():
    return EngineConfig(
        max_total_tokens=2048,
        max_requests=8,
        decode_bs_buckets=(1, 2, 4, 8),
        prefill_len_buckets=(8, 16, 32, 64, 128, 256),
        kv_len_bucket=64,
    )


@pytest.fixture()
def rng():
    return np.random.default_rng(0)
