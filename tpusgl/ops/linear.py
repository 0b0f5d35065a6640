"""Linear layers with optional weight-only quantization.

A "linear" is a plain dict pytree:
    {"w": [..., in, out]}                                 bf16/fp32 dense
    {"w": int8 [..., in, out], "s": [..., out]}           INT8 per-channel
    {"w4": int8 [..., in//2, out],
     "gs": [..., in//G, out]}                             INT4 group-wise, packed
plus optional {"b": [..., out]}.

INT4 packing: within each group of G in-rows, the byte at packed row r holds
value row r in its low nibble and value row r + G//2 in its high nibble —
unpacking a [G//2, N] byte tile yields two stacked [G//2, N] row blocks
(a concat, never an interleave, so the TPU unpack is layout-cheap), and a
byte never straddles a group (or TP-shard) boundary.

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


# Candidate clip ratios for the int4 MSE scale search (shared by the host
# quantizer in loader/safetensors_loader.py — keep in sync).
# 15/14 * qmax(7.5) / 7.5 == absmax/7: the classic no-clip scale stays in
# the candidate set (exact for already-integral [-7,7] weights, and never
# worse than the pre-round-5 quantizer on any group).
INT4_CLIP_CANDIDATES = (15 / 14, 1.0, 0.95, 0.9, 0.85, 0.8, 0.75, 0.7)


# INT4 quantization range: the full two's-complement [-8, 7] (the -8 level
# was previously wasted by a [-7, 7] clip) with scale absmax/7.5 — measured
# on the synthetic PPL harness at group 64 this cuts the relative delta
# 14.5% -> 13.4% by itself; combined with group 64 (was 128) and the
# sensitive-matrix int8 mix (QuantConfig.int4_keep_int8) the full recipe
# measures +4.1% vs the old recipe's +15.8% (round-5 experiments, 0.5B).
INT4_QMAX = 7.5
INT4_LO = -8


def quantize_linear_int4(lin: Linear, group_size: int = 64) -> Linear:
    """Symmetric group-wise INT4 (values in [-8, 7]), packed two per byte.

    Groups run along the in-dimension; scale shape [..., in//G, out]. The
    packed weight halves HBM traffic vs int8 storage — the point of INT4
    for memory-bound decode (see module docstring for the byte layout).

    The per-group scale is MSE-optimal over a small clip-ratio search
    (absmax/INT4_QMAX * c, c in INT4_CLIP_CANDIDATES): clipping the group's
    outliers trades their error for finer resolution on the bulk, which
    measurably reduces the PPL delta vs plain absmax scaling.
    """
    w = lin["w"].astype(jnp.float32)
    *lead, in_dim, out_dim = w.shape
    assert in_dim % group_size == 0, (in_dim, group_size)
    assert group_size % 2 == 0, group_size
    g = in_dim // group_size
    wg = w.reshape(*lead, g, group_size, out_dim)
    absmax = jnp.max(jnp.abs(wg), axis=-2, keepdims=True)

    best_err = None
    gs = None
    q = None
    for c in INT4_CLIP_CANDIDATES:
        s = (absmax * (c / INT4_QMAX)) + 1e-12
        qc = jnp.clip(jnp.round(wg / s), INT4_LO, 7)
        err = jnp.sum((qc * s - wg) ** 2, axis=-2, keepdims=True)
        if best_err is None:
            best_err, gs, q = err, s, qc
        else:
            better = err < best_err
            best_err = jnp.where(better, err, best_err)
            gs = jnp.where(better, s, gs)
            q = jnp.where(better, qc, q)
    q = q.astype(jnp.int32)
    half = group_size // 2
    lo = q[..., :, :half, :] & 0xF
    hi = q[..., :, half:, :] & 0xF
    packed = (lo | (hi << 4)).astype(jnp.uint8)
    packed = jax.lax.bitcast_convert_type(packed, jnp.int8)
    out: Linear = {
        "w4": packed.reshape(*lead, in_dim // 2, out_dim),
        "gs": gs.squeeze(-2).astype(jnp.float32),
    }
    if "b" in lin:
        out["b"] = lin["b"]
    return out


def unpack_int4(w4: jnp.ndarray, group_size: int) -> jnp.ndarray:
    """[..., in//2, out] packed bytes -> [..., in, out] int8 values in
    [-7, 7], inverting the quantize_linear_int4 byte layout."""
    *lead, half_in, out_dim = w4.shape
    half = group_size // 2
    g = half_in // half
    wi = w4.astype(jnp.int32).reshape(*lead, g, half, out_dim)
    lo = ((wi & 0xF) ^ 8) - 8
    hi = (((wi >> 4) & 0xF) ^ 8) - 8
    vals = jnp.concatenate([lo, hi], axis=-2)  # [..., g, G, out]
    return vals.reshape(*lead, 2 * half_in, out_dim).astype(jnp.int8)


def dequantize_weight(lin: Linear, dtype: jnp.dtype) -> jnp.ndarray:
    """Materialize the fp weight (jnp reference path / tests)."""
    if "w4" in lin:  # packed int4 group-wise
        gs = lin["gs"]
        g = gs.shape[-2]
        *lead, half_in, out_dim = lin["w4"].shape
        group = 2 * half_in // g
        w = unpack_int4(lin["w4"], group)
        wf = w.astype(jnp.float32).reshape(*lead, g, group, out_dim)
        wf = wf * gs[..., :, None, :]
        return wf.reshape(*lead, 2 * half_in, out_dim).astype(dtype)
    w = lin["w"]
    if w.dtype != jnp.int8:
        return w.astype(dtype)
    # int8 per-channel
    return (w.astype(jnp.float32) * lin["s"][..., None, :]).astype(dtype)


# Trace-time switch set by the Engine (EngineConfig.use_quant_matmul): route
# int8/int4 linears through the Pallas fused dequant+matmul kernel
# (ops/quant_matmul.py) instead of the jnp dequant-into-dot expression.
# `interpret` runs the kernel in Pallas interpret mode (CPU tests of the
# kernel under shard_map TP).
_USE_QUANT_MATMUL = False
_QM_INTERPRET = False


def enable_quant_matmul(on: bool, interpret: bool = False) -> None:
    global _USE_QUANT_MATMUL, _QM_INTERPRET
    _USE_QUANT_MATMUL = bool(on)
    _QM_INTERPRET = bool(interpret)


def apply_linear(x: jnp.ndarray, lin: Linear) -> jnp.ndarray:
    """x @ w (+ b). Dequant is expressed so XLA can fuse it into the matmul:
    for INT8 per-channel, (x @ w_q) * s == x @ (w_q * s)."""
    quantized = "w4" in lin or lin["w"].dtype == jnp.int8
    if quantized and _USE_QUANT_MATMUL:
        from tpusgl.ops.quant_matmul import quant_matmul_any

        try:
            return quant_matmul_any(x, lin, interpret=_QM_INTERPRET)
        except ValueError:
            pass  # shape not covered -> jnp path below
    if "w4" in lin:
        wf = dequantize_weight(lin, x.dtype)
        y = jnp.dot(x, wf, preferred_element_type=jnp.float32).astype(x.dtype)
    elif lin["w"].dtype == jnp.int8:
        y = jnp.dot(x, lin["w"].astype(x.dtype), preferred_element_type=jnp.float32)
        y = (y * lin["s"]).astype(x.dtype)
    else:
        y = jnp.dot(x, lin["w"], preferred_element_type=jnp.float32).astype(x.dtype)
    if "b" in lin:
        y = y + lin["b"].astype(y.dtype)
    return y


def quantized_matmul_f32(x: jnp.ndarray, lin: Linear) -> jnp.ndarray:
    """x @ dequant(w) with FULL f32 output — no downcast to x.dtype between
    the f32 accumulation, the per-channel scale, and the return. Used by the
    int8 LM head: logits feed argmax/sampling, where a bf16 round-trip
    (8 mantissa bits) can flip near-tie decisions."""
    quantized = "w4" in lin or lin["w"].dtype == jnp.int8
    if quantized and _USE_QUANT_MATMUL:
        from tpusgl.ops.quant_matmul import quant_matmul_any

        try:
            return quant_matmul_any(
                x, lin, out_dtype=jnp.float32, interpret=_QM_INTERPRET
            )
        except ValueError:
            pass
    if "w4" in lin:
        wf = dequantize_weight(lin, jnp.float32)
        y = jnp.dot(x, wf, preferred_element_type=jnp.float32)
    elif lin["w"].dtype == jnp.int8:
        y = jnp.dot(x, lin["w"].astype(x.dtype), preferred_element_type=jnp.float32)
        y = y * lin["s"].astype(jnp.float32)
    else:
        y = jnp.dot(x, lin["w"], preferred_element_type=jnp.float32)
    if "b" in lin:
        y = y + lin["b"].astype(jnp.float32)
    return y
