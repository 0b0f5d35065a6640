"""On-device engine state.

All mutable device-side serving state lives in one donated pytree:

- the paged KV pool (reference: MHATokenToKVPool slabs,
  /root/reference/memory_pool.py:104-171) as two [L, slots+1, Hkv, D] arrays
  with slot 0 reserved as the dummy write target for padding
  (memory_pool.py:82-84),
- the request->token page table (ReqToTokenPool, memory_pool.py:7-44) with an
  extra dummy row (index == max_requests) for padded batch rows,
- `last_token`: the on-device future-token buffer that replaces the
  reference's negative-future-id map + second CUDA stream
  (overlap_worker.py:40-44, 73-96): step N writes its sampled token here and
  step N+1's decode gathers its input from it, so the host never has to see a
  token before scheduling the next step,
- `presence`: per-request generated-token presence matrix driving the
  repetition penalty on device (sample.py:19-37 does this on host),
- the sampling PRNG key.

Free lists and the radix tree stay host-side (tpusgl/runtime/memory_pool.py).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from tpusgl.config import EngineConfig, ModelConfig


class EngineState(NamedTuple):
    kv_k: jnp.ndarray         # [L, slots+1, Hkv, D]
    kv_v: jnp.ndarray         # [L, slots+1, Hkv, D]
    kv_k_scale: Optional[jnp.ndarray]  # [L, slots+1, Hkv] f32 when kv int8
    kv_v_scale: Optional[jnp.ndarray]
    req_to_token: jnp.ndarray  # [max_requests+1, max_context_len] int32
    last_token: jnp.ndarray    # [max_requests+1] int32
    presence: jnp.ndarray      # [max_requests+1, vocab] bool
    rng: jax.Array


def init_state(
    model_cfg: ModelConfig,
    engine_cfg: EngineConfig,
    kv_dtype: jnp.dtype = jnp.bfloat16,
    seed: int = 0,
) -> EngineState:
    L = model_cfg.num_hidden_layers
    Hkv = model_cfg.num_key_value_heads
    D = model_cfg.head_dim
    slots = engine_cfg.max_total_tokens
    R = engine_cfg.max_requests
    C = engine_cfg.max_context_len

    quant_kv = engine_cfg.quant.kv_dtype == "int8"
    store_dtype = jnp.int8 if quant_kv else kv_dtype
    kv_shape = (L, slots + 1, Hkv, D)
    return EngineState(
        kv_k=jnp.zeros(kv_shape, store_dtype),
        kv_v=jnp.zeros(kv_shape, store_dtype),
        kv_k_scale=jnp.zeros((L, slots + 1, Hkv), jnp.float32) if quant_kv else None,
        kv_v_scale=jnp.zeros((L, slots + 1, Hkv), jnp.float32) if quant_kv else None,
        req_to_token=jnp.zeros((R + 1, C), jnp.int32),
        last_token=jnp.zeros((R + 1,), jnp.int32),
        presence=jnp.zeros((R + 1, model_cfg.vocab_size), jnp.bool_),
        rng=jax.random.PRNGKey(seed),
    )
