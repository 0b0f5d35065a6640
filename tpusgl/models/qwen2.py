"""Qwen2 decoder as pure JAX functions.

TPU-first re-design of the reference model (/root/reference/qwen2.py:9-316):

- Pure functions over a params pytree; per-layer weights are stacked along a
  leading layer axis and the decoder stack is a single `lax.scan`, so the layer
  body compiles once regardless of depth.
- Dense [B, S] token layout for both prefill and decode (decode is S == 1),
  instead of the reference's flat ragged concat (scheduler.py:402-407) — XLA
  needs static shapes; padding rows write their KV to the dummy slot 0
  (mirroring memory_pool.py:82-84).
- Fused QKV and Gate/Up projections like the reference (qwen2.py:270-290,
  199-222) so the MXU sees large matmuls; weights are stored input-major
  ([in, out]) for `x @ w`.
- RMSNorm in fp32 internally (qwen2.py:131-141), RoPE with precomputed
  cos/sin tables gathered by position (vs per-call outer product at
  qwen2.py:249-268), "linear" rope scaling folded into theta (qwen2.py:239-243).
- The attention implementation is injected (`attn_impl`) so the same model code
  runs with the jnp reference attention or the Pallas paged-attention kernels.
- LM head is applied only to each request's last token
  (the reference wastefully projects all prefill tokens, qwen2.py:31-35).
"""

from __future__ import annotations

import math
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from tpusgl.config import ModelConfig
from tpusgl.ops.linear import apply_linear, init_linear
from tpusgl.ops.attention import AttnMeta, ref_attention


Params = Dict[str, Any]


def precompute_rope(cfg: ModelConfig) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin tables [rows, head_dim//2] in fp32.

    rope_scaling "linear" is TRUE position scaling (every frequency divided
    by the factor — HF LinearScalingRotaryEmbedding's t/factor), and the
    table is extended to factor * max_position_embeddings rows, the usable
    range linear scaling buys. "llama3" is HF's frequency-dependent rule
    (_compute_llama3_parameters): low-frequency dims divide by the factor,
    high-frequency dims stay, the band between interpolates smoothly.
    (The reference folds linear scaling into theta,
    /root/reference/qwen2.py:241-243 — and even that fold is dead there,
    inv_freq is built from the unscaled `base` at :247; neither matches the
    HF semantics a scaled checkpoint was trained for.)"""
    d = cfg.head_dim
    inv_freq = 1.0 / (
        cfg.rope_theta ** (jnp.arange(0, d, 2, dtype=jnp.float32) / d)
    )
    if cfg.rope_scaling_type == "linear":
        inv_freq = inv_freq / cfg.rope_scaling_factor
    elif cfg.rope_scaling_type == "llama3":
        factor = cfg.rope_scaling_factor
        orig = float(cfg.rope_original_max_position or 8192)
        low_wl = orig / cfg.rope_low_freq_factor
        high_wl = orig / cfg.rope_high_freq_factor
        wavelen = 2.0 * jnp.pi / inv_freq
        smooth = (orig / wavelen - cfg.rope_low_freq_factor) / (
            cfg.rope_high_freq_factor - cfg.rope_low_freq_factor
        )
        scaled = jnp.where(
            wavelen > low_wl,
            inv_freq / factor,  # long wavelengths: fully interpolated
            jnp.where(
                wavelen < high_wl,
                inv_freq,  # short wavelengths: untouched
                (1.0 - smooth) * inv_freq / factor + smooth * inv_freq,
            ),
        )
        inv_freq = scaled
    pos = jnp.arange(cfg.rope_table_rows, dtype=jnp.float32)
    freqs = jnp.outer(pos, inv_freq)
    return jnp.cos(freqs), jnp.sin(freqs)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """x: [B, S, H, D]; cos/sin: [B, S, D/2] gathered by position."""
    d2 = x.shape[-1] // 2
    x1, x2 = x[..., :d2], x[..., d2:]
    cos = cos[:, :, None, :].astype(x.dtype)
    sin = sin[:, :, None, :].astype(x.dtype)
    return jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float) -> jnp.ndarray:
    dt = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (weight * (xf * jax.lax.rsqrt(var + eps)).astype(dt)).astype(dt)


def init_params(
    cfg: ModelConfig,
    key: jax.Array,
    dtype: jnp.dtype = jnp.bfloat16,
) -> Params:
    """Random-init parameters (tests / synthetic benchmarks)."""
    L = cfg.num_hidden_layers
    H = cfg.hidden_size
    keys = jax.random.split(key, 8)

    def norm_init(k, shape, fan_in):
        return (jax.random.normal(k, shape, jnp.float32) / math.sqrt(fan_in)).astype(
            dtype
        )

    qkv_out = cfg.q_size + 2 * cfg.kv_size

    def one_layer(k):
        ks = jax.random.split(k, 4)
        layer = {
            "input_norm": jnp.ones((H,), dtype),
            "post_norm": jnp.ones((H,), dtype),
            "qkv": init_linear(
                ks[0], None, H, qkv_out, dtype, bias=cfg.attention_bias
            ),
            "o": init_linear(ks[1], None, cfg.q_size, H, dtype, bias=False),
            "gate_up": init_linear(
                ks[2], None, H, 2 * cfg.intermediate_size, dtype, bias=False
            ),
            "down": init_linear(
                ks[3], None, cfg.intermediate_size, H, dtype, bias=False
            ),
        }
        if cfg.qk_norm:  # Qwen3: per-head RMSNorm on q/k before RoPE
            layer["q_norm"] = jnp.ones((cfg.head_dim,), dtype)
            layer["k_norm"] = jnp.ones((cfg.head_dim,), dtype)
        return layer

    # Layers are a TUPLE of per-layer trees, not stacked [L, ...] arrays:
    # each weight is then its own device buffer read in place by the (Pallas)
    # matmuls — a stacked layout made XLA materialize every layer's slice as
    # an HLO temp feeding the kernels (~GBs of copies at 7B; observed OOM).
    params: Params = {
        "embed": norm_init(keys[0], (cfg.vocab_size, H), H),
        "final_norm": jnp.ones((H,), dtype),
        "layers": tuple(
            one_layer(jax.random.fold_in(keys[1], l)) for l in range(L)
        ),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = norm_init(keys[5], (cfg.vocab_size, H), H)
    cos, sin = precompute_rope(cfg)
    params["rope_cos"] = cos
    params["rope_sin"] = sin
    return params


def _layer(
    cfg: ModelConfig,
    layer_params: Params,
    layer_idx: jnp.ndarray,
    hidden: jnp.ndarray,
    residual: jnp.ndarray,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    kv_l: jnp.ndarray,
    meta: AttnMeta,
    attn_impl: Callable,
    tp: int = 1,
    axis_name: Optional[str] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One decoder layer. With tp > 1 this body runs INSIDE shard_map on
    LOCAL shards (Megatron layout, parallel/mesh.py): qkv/gate_up are
    column-parallel over tp-interleaved fused segments (permute_layer_for_tp)
    so the local fused output is [q_s | k_s | v_s] / [gate_s | up_s]; o/down
    are row-parallel with an explicit psum. The reference's TP never ran
    (/root/reference/tp_runtime.py:10-51 is dead code)."""
    B, S, _ = hidden.shape
    Hq = cfg.num_attention_heads // tp
    Hkv = cfg.num_key_value_heads // tp
    D = cfg.head_dim
    q_size, kv_size = cfg.q_size // tp, cfg.kv_size // tp
    inter = cfg.intermediate_size // tp

    # Self-attention block (pre-norm with fused residual add, qwen2.py:105-123).
    normed = rms_norm(hidden, layer_params["input_norm"], cfg.rms_norm_eps)
    qkv = apply_linear(normed, layer_params["qkv"])
    q = qkv[..., :q_size].reshape(B, S, Hq, D)
    k = qkv[..., q_size : q_size + kv_size].reshape(B, S, Hkv, D)
    v = qkv[..., q_size + kv_size :].reshape(B, S, Hkv, D)
    if "q_norm" in layer_params:  # Qwen3 per-head RMSNorm before RoPE
        q = rms_norm(q, layer_params["q_norm"], cfg.rms_norm_eps)
        k = rms_norm(k, layer_params["k_norm"], cfg.rms_norm_eps)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)

    attn_out, kv_l = attn_impl(layer_idx, q, k, v, kv_l, meta)
    # Row-parallel projections have no bias in this architecture family;
    # a bias here would be added once per shard before the psum.
    attn_out = apply_linear(attn_out.reshape(B, S, Hq * D), layer_params["o"])
    if axis_name is not None:
        attn_out = jax.lax.psum(attn_out, axis_name)

    hidden = residual + attn_out
    residual = hidden

    # MLP block: SwiGLU with fused gate/up (qwen2.py:199-222).
    normed = rms_norm(hidden, layer_params["post_norm"], cfg.rms_norm_eps)
    gate_up = apply_linear(normed, layer_params["gate_up"])
    gate = gate_up[..., :inter]
    up = gate_up[..., inter:]
    mlp_out = apply_linear(jax.nn.silu(gate) * up, layer_params["down"])
    if axis_name is not None:
        mlp_out = jax.lax.psum(mlp_out, axis_name)

    hidden = residual + mlp_out
    return hidden, hidden, kv_l


def _embed_lookup(
    embed: jnp.ndarray, input_ids: jnp.ndarray, axis_name: Optional[str]
) -> jnp.ndarray:
    """Token embedding gather; with a vocab-sharded table inside shard_map,
    each shard gathers its own id range and a psum assembles the rows."""
    if axis_name is None:
        return jnp.take(embed, input_ids, axis=0)
    v_local = embed.shape[0]
    local = input_ids - jax.lax.axis_index(axis_name) * v_local
    ok = (local >= 0) & (local < v_local)
    h = jnp.take(embed, jnp.clip(local, 0, v_local - 1), axis=0)
    return jax.lax.psum(jnp.where(ok[..., None], h, 0), axis_name)


def forward_hidden(
    params: Params,
    cfg: ModelConfig,
    input_ids: jnp.ndarray,  # [B, S] int32
    meta: AttnMeta,
    kv,  # tuple of L arrays [num_slots+1, Hkv*2*D]
    attn_impl: Callable = ref_attention,
    tp: int = 1,
    axis_name: Optional[str] = None,
) -> Tuple[jnp.ndarray, tuple]:
    """Run the decoder stack; returns (hidden [B, S, H] after final norm,
    updated per-layer kv tuple).

    Layers are python-unrolled over the per-layer weight trees and each layer
    updates its own KV buffer with a canonical in-place scatter. A lax.scan
    over stacked weights + a traced layer id was measured to make XLA rewrite
    the whole multi-GB pool every step (see ops/attention.py docstring).

    `meta.positions` drives both RoPE and causal masking; padding tokens have
    out_loc 0 (dummy slot) so their KV writes are harmless.
    """
    hidden = _embed_lookup(params["embed"], input_ids, axis_name)

    cos = jnp.take(params["rope_cos"], meta.positions, axis=0)  # [B, S, D/2]
    sin = jnp.take(params["rope_sin"], meta.positions, axis=0)

    layer_params = params["layers"]
    L = cfg.num_hidden_layers

    kv = list(kv)
    residual = hidden
    for l in range(L):
        lp = layer_params[l]
        hidden, residual, kv[l] = _layer(
            cfg, lp, l, hidden, residual, cos, sin, kv[l], meta, attn_impl,
            tp=tp, axis_name=axis_name,
        )

    hidden = rms_norm(hidden, params["final_norm"], cfg.rms_norm_eps)
    return hidden, tuple(kv)


def forward(
    params: Params,
    cfg: ModelConfig,
    input_ids: jnp.ndarray,
    meta: AttnMeta,
    kv,
    attn_impl: Callable = ref_attention,
    tp: int = 1,
    axis_name: Optional[str] = None,
) -> Tuple[jnp.ndarray, tuple]:
    """Decoder stack + last-real-token gather: (last_hidden [B, H], kv')."""
    B, S = input_ids.shape
    hidden, kv = forward_hidden(
        params, cfg, input_ids, meta, kv, attn_impl, tp=tp, axis_name=axis_name
    )
    # Gather each request's last real token (ext_lens - 1, clamped for padding
    # rows) — avoids the reference's full-vocab matmul over every prefill token
    # (qwen2.py:31-35 projects all tokens).
    last_idx = jnp.clip(meta.ext_lens - 1, 0, S - 1)  # [B]
    last_hidden = jnp.take_along_axis(
        hidden, last_idx[:, None, None].astype(jnp.int32), axis=1
    )[:, 0]
    return last_hidden, kv


def lm_head_logits(params: Params, cfg: ModelConfig, hidden: jnp.ndarray) -> jnp.ndarray:
    """[..., hidden] -> [..., vocab] in fp32 (tied embeddings, qwen2.py:31-35).

    An int8-quantized head (loader.quantize_lm_head) is stored as a Linear
    {"w": [H, V] int8, "s": [V]} and runs through the fused dequant matmul
    with out_dtype=f32: the kernel accumulates f32 and applies the per-vocab
    scale on the f32 accumulator, so head logits keep full precision (an
    apply_linear round-trip would truncate them to bf16 between the scale
    and the widen, an extra loss the bf16-head path does not incur)."""
    w = params["embed"] if cfg.tie_word_embeddings else params["lm_head"]
    if isinstance(w, dict):
        from tpusgl.ops.linear import quantized_matmul_f32

        return quantized_matmul_f32(hidden, w)
    return jnp.dot(hidden, w.T, preferred_element_type=jnp.float32)
