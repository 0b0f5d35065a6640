"""Linear layers with optional weight-only quantization.

A "linear" is a plain dict pytree:
    {"w": [..., in, out]}                                 bf16/fp32 dense
    {"w": int8 [..., in, out], "s": [..., out]}           INT8 per-channel
    {"w": int8(4-bit vals) [..., in, out],
     "gs": [..., in//G, out]}                             INT4 group-wise
plus optional {"b": [..., out]}.

The reference has no quantization (fp16 weights, fp8 KV stubs raising
NotImplementedError at /root/reference/memory_pool.py:55-59); INT8/INT4
weight-only is a first-class feature here. `apply_linear` is the jnp
reference path (XLA fuses the dequant into the matmul); the Pallas fused
dequant+matmul kernel in tpusgl/ops/quant_matmul.py replaces it on the hot
path.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

Linear = Dict[str, Any]


def init_linear(
    key: jax.Array,
    num_layers: Optional[int],
    in_dim: int,
    out_dim: int,
    dtype: jnp.dtype,
    bias: bool,
) -> Linear:
    shape = (in_dim, out_dim) if num_layers is None else (num_layers, in_dim, out_dim)
    w = (jax.random.normal(key, shape, jnp.float32) / math.sqrt(in_dim)).astype(dtype)
    lin: Linear = {"w": w}
    if bias:
        bshape = (out_dim,) if num_layers is None else (num_layers, out_dim)
        lin["b"] = jnp.zeros(bshape, dtype)
    return lin


def quantize_linear_int8(lin: Linear) -> Linear:
    """Symmetric per-output-channel INT8: w = round(w_fp / s), s = absmax/127."""
    w = lin["w"].astype(jnp.float32)
    absmax = jnp.max(jnp.abs(w), axis=-2, keepdims=True)  # over in-dim
    s = (absmax / 127.0) + 1e-12
    q = jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8)
    out: Linear = {"w": q, "s": s.squeeze(-2).astype(jnp.float32)}
    if "b" in lin:
        out["b"] = lin["b"]
    return out


def quantize_linear_int4(lin: Linear, group_size: int = 128) -> Linear:
    """Symmetric group-wise INT4 (values in [-7, 7], stored as int8).

    Groups run along the in-dimension; scale shape [..., in//G, out].
    """
    w = lin["w"].astype(jnp.float32)
    *lead, in_dim, out_dim = w.shape
    assert in_dim % group_size == 0, (in_dim, group_size)
    g = in_dim // group_size
    wg = w.reshape(*lead, g, group_size, out_dim)
    absmax = jnp.max(jnp.abs(wg), axis=-2, keepdims=True)
    gs = (absmax / 7.0) + 1e-12
    q = jnp.clip(jnp.round(wg / gs), -7, 7).astype(jnp.int8)
    out: Linear = {
        "w": q.reshape(*lead, in_dim, out_dim),
        "gs": gs.squeeze(-2).astype(jnp.float32),
    }
    if "b" in lin:
        out["b"] = lin["b"]
    return out


def dequantize_weight(lin: Linear, dtype: jnp.dtype) -> jnp.ndarray:
    """Materialize the fp weight (jnp reference path / tests)."""
    w = lin["w"]
    if w.dtype != jnp.int8:
        return w.astype(dtype)
    if "s" in lin:  # int8 per-channel
        return (w.astype(jnp.float32) * lin["s"][..., None, :]).astype(dtype)
    # int4 group-wise
    gs = lin["gs"]
    *lead, in_dim, out_dim = w.shape
    g = gs.shape[-2]
    group = in_dim // g
    wf = w.astype(jnp.float32).reshape(*lead, g, group, out_dim)
    wf = wf * gs[..., :, None, :]
    return wf.reshape(*lead, in_dim, out_dim).astype(dtype)


# Trace-time switch set by the Engine (EngineConfig.use_quant_matmul): route
# int8/int4 linears through the Pallas fused dequant+matmul kernel
# (ops/quant_matmul.py) instead of the jnp dequant-into-dot expression.
_USE_QUANT_MATMUL = False


def enable_quant_matmul(on: bool) -> None:
    global _USE_QUANT_MATMUL
    _USE_QUANT_MATMUL = bool(on)


def apply_linear(x: jnp.ndarray, lin: Linear) -> jnp.ndarray:
    """x @ w (+ b). Dequant is expressed so XLA can fuse it into the matmul:
    for INT8 per-channel, (x @ w_q) * s == x @ (w_q * s)."""
    w = lin["w"]
    if w.dtype == jnp.int8 and _USE_QUANT_MATMUL:
        from tpusgl.ops.quant_matmul import quant_matmul_any

        try:
            return quant_matmul_any(x, lin)
        except ValueError:
            pass  # shape not covered -> jnp path below
    if w.dtype == jnp.int8 and "s" in lin:
        y = jnp.dot(x, w.astype(x.dtype), preferred_element_type=jnp.float32)
        y = (y * lin["s"]).astype(x.dtype)
    elif w.dtype == jnp.int8:
        wf = dequantize_weight(lin, x.dtype)
        y = jnp.dot(x, wf, preferred_element_type=jnp.float32).astype(x.dtype)
    else:
        y = jnp.dot(x, w, preferred_element_type=jnp.float32).astype(x.dtype)
    if "b" in lin:
        y = y + lin["b"].astype(y.dtype)
    return y
