"""Tensor/data-parallel sharding on the 8-virtual-device CPU mesh
(SURVEY.md §4.3): the sharded engine must produce token-identical output,
with weights/KV actually partitioned and XLA inserting the collectives."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpusgl.config import EngineConfig, ModelConfig
from tpusgl.models import qwen2
from tpusgl.ops.attention import ref_attention
from tpusgl.parallel.mesh import make_mesh, param_shardings, shard_params
from tpusgl.runtime.engine import Engine
from tpusgl.runtime.sampling_params import SamplingParams

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 virtual devices"
)

# 8 q-heads / 8 kv-heads so tp=4 divides both.
CFG = ModelConfig(
    hidden_size=128, num_attention_heads=8, num_key_value_heads=8,
    intermediate_size=256, num_hidden_layers=2, vocab_size=256,
    tie_word_embeddings=False, max_position_embeddings=512, rope_theta=10000.0,
)

ECFG = EngineConfig(
    max_total_tokens=512, max_requests=8,
    decode_bs_buckets=(1, 2, 4, 8), prefill_len_buckets=(8, 16, 32, 64),
    kv_len_bucket=64,
)


@pytest.fixture(scope="module")
def params():
    return qwen2.init_params(CFG, jax.random.PRNGKey(11), jnp.float32)


@pytest.fixture(scope="module")
def prompts():
    rng = np.random.default_rng(5)
    return [list(rng.integers(0, CFG.vocab_size, n)) for n in (6, 13, 4, 9)]


def test_params_actually_sharded(params):
    mesh = make_mesh(dp=2, tp=4)
    sharded = shard_params(CFG, params, mesh)
    qkv_w = sharded["layers"][0]["qkv"]["w"]
    # column-sharded over tp: each shard holds out/4 columns
    shard_shapes = {s.data.shape for s in qkv_w.addressable_shards}
    full = qkv_w.shape
    assert shard_shapes == {(full[0], full[1] // 4)}
    down_w = sharded["layers"][0]["down"]["w"]
    shard_shapes = {s.data.shape for s in down_w.addressable_shards}
    assert shard_shapes == {(down_w.shape[0] // 4, down_w.shape[1])}


@pytest.mark.parametrize("dp,tp", [(1, 8), (2, 4), (1, 2)])
def test_sharded_engine_token_identical(params, prompts, dp, tp):
    sp = SamplingParams(max_new_tokens=6, do_sample=False, eos_id=-1)

    base = Engine(
        model_cfg=CFG, engine_cfg=ECFG, params=params, dtype=jnp.float32,
        attn_impl=ref_attention, sample_k_cap=CFG.vocab_size,
    )
    expected = base.generate(prompts, sp)

    sharded = Engine(
        model_cfg=CFG, engine_cfg=ECFG.replace(dp=dp, tp=tp), params=params,
        dtype=jnp.float32, attn_impl=ref_attention, sample_k_cap=CFG.vocab_size,
    )
    got = sharded.generate(prompts, sp)
    assert got == expected


def test_sharded_overlap(params, prompts):
    sp = SamplingParams(max_new_tokens=6, do_sample=False, eos_id=-1)
    eng = Engine(
        model_cfg=CFG, engine_cfg=ECFG.replace(dp=2, tp=4), params=params,
        dtype=jnp.float32, attn_impl=ref_attention, sample_k_cap=CFG.vocab_size,
    )
    out1 = eng.generate(prompts, sp, enable_overlap=True)
    out2 = eng.generate(prompts, sp, enable_overlap=False)
    assert out1 == out2
