"""Pallas paged decode-attention kernel.

The #1 kernel called for by SURVEY.md §7: single-query attention over the
token-granular paged KV pool, reading K/V rows directly from HBM through the
page table instead of XLA's row gather (measured ~16 GB/s effective and
~0.25 ms per layer-gather on v5e — the decode bottleneck; cf. the reference's
per-request Python loop at /root/reference/attn_backend.py:112-149).

Design:
- grid (B, T/BLOCK); the kv-block axis iterates innermost so fp32 online-
  softmax accumulators live in VMEM scratch across blocks (flash-style).
- page-table rows arrive per block in SMEM (BlockSpec((1, BLOCK), SMEM)), and
  the kernel issues BLOCK async row DMAs from the HBM pool into a VMEM
  buffer — the pool itself is never copied or relaid out.
- K and V are interleaved per head in each pool row ([h, {k,v}, D], see
  ops/attention.make_kv_pool), so one DMA per token fetches both.
- fully-invalid blocks (beyond the request's seq_len) skip DMA + compute.
- GQA: per kv-head q-groups [G, D] hit the MXU against [BLOCK, D] tiles.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpusgl.ops.attention import AttnMeta, write_kv

NEG_INF = -1e30


def _decode_kernel(
    # scalar-prefetch-free inputs (order: in_specs)
    rows_ref,     # SMEM [1, BLOCK] int32 — this block's KV slot ids
    seqlen_ref,   # SMEM [1] int32
    q_ref,        # VMEM [1, Hq, D]
    kv_hbm,       # ANY/HBM [slots+1, Hkv*2*D]
    out_ref,      # VMEM [1, Hq, D]
    # scratch
    kv_buf,       # VMEM [BLOCK, Hkv*2*D]
    m_ref,        # VMEM [Hq, 128] f32 (only col 0 used)
    l_ref,        # VMEM [Hq, 128] f32
    acc_ref,      # VMEM [Hq, D] f32
    sem,          # DMA sem
    *,
    num_kv_heads: int,
    head_dim: int,
    block: int,
):
    t = pl.program_id(1)
    nt = pl.num_programs(1)
    seqlen = seqlen_ref[0]
    base = t * block
    Hq = q_ref.shape[1]
    G = Hq // num_kv_heads
    D = head_dim
    scale = D ** -0.5

    @pl.when(t == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(base < seqlen)
    def _compute():
        copies = [
            pltpu.make_async_copy(
                kv_hbm.at[rows_ref[0, i]], kv_buf.at[i], sem
            )
            for i in range(block)
        ]
        for c in copies:
            c.start()
        for c in copies:
            c.wait()

        valid = (
            base + jax.lax.broadcasted_iota(jnp.int32, (1, block), 1)
        ) < seqlen  # [1, BLOCK]

        for h in range(num_kv_heads):
            k_h = kv_buf[:, (2 * h) * D : (2 * h + 1) * D]      # [BLOCK, D]
            v_h = kv_buf[:, (2 * h + 1) * D : (2 * h + 2) * D]  # [BLOCK, D]
            q_h = q_ref[0, h * G : (h + 1) * G, :]              # [G, D]

            s = (
                jax.lax.dot_general(
                    q_h.astype(jnp.float32),
                    k_h.astype(jnp.float32),
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                * scale
            )  # [G, BLOCK]
            s = jnp.where(valid, s, NEG_INF)

            rows = slice(h * G, (h + 1) * G)
            m_old = m_ref[rows, 0:1]            # [G, 1]
            l_old = l_ref[rows, 0:1]
            m_new = jnp.maximum(m_old, jnp.max(s, axis=1, keepdims=True))
            p = jnp.exp(s - m_new)              # [G, BLOCK]
            alpha = jnp.exp(m_old - m_new)      # [G, 1]
            l_ref[rows, 0:1] = alpha * l_old + jnp.sum(p, axis=1, keepdims=True)
            m_ref[rows, 0:1] = m_new
            pv = jax.lax.dot_general(
                p,
                v_h.astype(jnp.float32),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [G, D]
            acc_ref[rows, :] = alpha * acc_ref[rows, :] + pv

    @pl.when(t == nt - 1)
    def _finalize():
        denom = jnp.maximum(l_ref[:, 0:1], 1e-30)
        out_ref[0] = (acc_ref[...] / denom).astype(out_ref.dtype)


def paged_decode_attention(
    q: jnp.ndarray,        # [B, Hq, D]
    kv_l: jnp.ndarray,     # [slots+1, Hkv*2*D]
    kv_rows: jnp.ndarray,  # [B, T] int32
    seq_lens: jnp.ndarray, # [B] int32
    *,
    num_kv_heads: int,
    block: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    B, Hq, D = q.shape
    T = kv_rows.shape[1]
    assert T % block == 0, (T, block)
    nt = T // block
    hd2 = kv_l.shape[-1]

    kernel = functools.partial(
        _decode_kernel,
        num_kv_heads=num_kv_heads,
        head_dim=D,
        block=block,
    )
    out = pl.pallas_call(
        kernel,
        grid=(B, nt),
        in_specs=[
            pl.BlockSpec((1, block), lambda b, t: (b, t), memory_space=pltpu.SMEM),
            pl.BlockSpec((1,), lambda b, t: (b,), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, Hq, D), lambda b, t: (b, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, Hq, D), lambda b, t: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Hq, D), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block, hd2), kv_l.dtype),
            pltpu.VMEM((Hq, 128), jnp.float32),
            pltpu.VMEM((Hq, 128), jnp.float32),
            pltpu.VMEM((Hq, D), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(kv_rows, seq_lens, q, kv_l)
    return out


def pallas_attention(
    layer_idx: int,
    q: jnp.ndarray,      # [B, S, Hq, D]
    k_new: jnp.ndarray,  # [B, S, Hkv, D]
    v_new: jnp.ndarray,
    kv_l: jnp.ndarray,
    meta: AttnMeta,
    block: int = 128,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Drop-in attn_impl: Pallas kernel for decode (S == 1), jnp chunked
    attention for prefill."""
    from tpusgl.ops.attention import chunked_attention

    B, S, Hq, D = q.shape
    if S != 1:
        return chunked_attention(layer_idx, q, k_new, v_new, kv_l, meta)
    kv_l = write_kv(k_new, v_new, kv_l, meta.out_loc)
    out = paged_decode_attention(
        q[:, 0], kv_l, meta.kv_rows, meta.seq_lens,
        num_kv_heads=k_new.shape[2], block=block, interpret=interpret,
    )
    return out[:, None], kv_l
