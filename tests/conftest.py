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


def naive_greedy(params, cfg, prompt, n_new):
    """Oracle: straightforward greedy decode with a private dense cache
    (validated token-identical vs HF in test_model_golden)."""
    import jax.numpy as jnp

    from tpusgl.models import qwen2
    from tpusgl.ops.attention import AttnMeta, ref_attention

    from tpusgl.ops.attention import make_kv_pool

    L, Hkv, D = cfg.num_hidden_layers, cfg.num_key_value_heads, cfg.head_dim
    total = len(prompt) + n_new
    kv = make_kv_pool(L, total, Hkv, D, jnp.float32)
    row = (1 + np.arange(total, dtype=np.int32))[None, :]
    S = len(prompt)
    meta = AttnMeta(
        kv_rows=jnp.asarray(row),
        seq_lens=jnp.array([S], jnp.int32),
        ext_lens=jnp.array([S], jnp.int32),
        positions=jnp.arange(S, dtype=jnp.int32)[None],
        out_loc=jnp.asarray(row[:, :S]),
    )
    hidden, kv = qwen2.forward(
        params, cfg, jnp.asarray([list(prompt)], jnp.int32), meta, kv,
        attn_impl=ref_attention,
    )
    out = [int(np.argmax(np.asarray(qwen2.lm_head_logits(params, cfg, hidden))[0]))]
    for step in range(n_new - 1):
        pos = S + step
        meta = AttnMeta(
            kv_rows=jnp.asarray(row),
            seq_lens=jnp.array([pos + 1], jnp.int32),
            ext_lens=jnp.array([1], jnp.int32),
            positions=jnp.array([[pos]], jnp.int32),
            out_loc=jnp.asarray(row[:, pos : pos + 1]),
        )
        hidden, kv = qwen2.forward(
            params, cfg, jnp.array([[out[-1]]], jnp.int32), meta, kv,
            attn_impl=ref_attention,
        )
        out.append(
            int(np.argmax(np.asarray(qwen2.lm_head_logits(params, cfg, hidden))[0]))
        )
    return out
