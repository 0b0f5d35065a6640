"""Pallas paged decode-attention kernel over the token-slot KV pool.

The #1 kernel called for by SURVEY.md §7: single-query attention over the
paged KV pool, streaming K/V pages from HBM through the page table instead of
XLA's row gather (measured 18.7 GB/s effective on v5e at the bench geometry —
the decode bottleneck; cf. the reference's per-request Python loop at
/root/reference/attn_backend.py:112-149). This kernel reaches HBM
speed-of-light (~800 GB/s on v5e) because each DMA moves one whole page —
`page_size` contiguous pool rows — rather than scattered single tokens.

Layout contract (tpusgl/ops/attention.py, tpusgl/runtime/memory_pool.py):
- pool `kv_l`: [(num_pages + 1) * page_size, Hkv*2*D]; K and V interleaved
  per head in the minor dim; page 0 reserved as the dummy target.
- the allocator hands out whole pages, so the KV rows for logical positions
  [j*P, (j+1)*P) of a request are exactly rows [pid*P, (pid+1)*P) of the pool
  for page id `pid` = page_tbl[b, j].
- `kv_lens[b]` is the number of valid tokens (trailing pages beyond it are
  never fetched: the per-sequence kv loop has a dynamic trip count, so one
  compiled program serves every context length).

Kernel structure (pallas_guide.md patterns: scalar prefetch, double-buffered
DMA, online softmax):
- grid (B,): one program instance per sequence; accumulators are plain
  fori_loop carries (never touch scratch memory).
- per block, `pages_per_block` page DMAs land in one of two VMEM buffers
  while the previous block computes (double buffering).
- GQA: q reshaped [Hkv, G, D]; one batched MXU dot per block.
- int8 KV: dequantized in-kernel with static per-layer k/v scales
  (quantization_utils-style global scales).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _decode_kernel(
    # scalar prefetch
    lens_ref,      # SMEM [B] i32 — valid kv tokens per sequence
    tbl_ref,       # SMEM [B, pages_per_seq] i32 — page ids
    # inputs
    q_ref,         # VMEM [1, Hq, D]
    kv_hbm,        # ANY  [(num_pages+1)*P, Hkv*2*D]
    # outputs
    out_ref,       # VMEM [1, Hq, D]
    # scratch
    bufs,          # VMEM [2, BP, P, Hkv*2*D]
    sems,          # DMA sems (2,)
    *,
    num_kv_heads: int,
    head_dim: int,
    page_size: int,
    pages_per_block: int,
    pages_per_seq: int,
    sm_scale: float,
    k_scale: Optional[float],
    v_scale: Optional[float],
):
    b = pl.program_id(0)
    kv_len = lens_ref[b]
    P = page_size
    BP = pages_per_block
    N = BP * P  # tokens per block
    Hkv, D = num_kv_heads, head_dim
    Hq = q_ref.shape[1]
    G = Hq // Hkv

    num_blocks = pl.cdiv(kv_len, N)
    num_valid_pages = pl.cdiv(kv_len, P)

    def block_copies(blk, slot):
        """The BP page DMAs of block `blk` into buffer `slot`. Called once to
        start and once to wait (descriptors are cheap to rebuild; the wait
        just decrements the same semaphore)."""
        copies = []
        for i in range(BP):
            pidx = jnp.minimum(blk * BP + i, pages_per_seq - 1)
            pid = jnp.where(blk * BP + i < num_valid_pages, tbl_ref[b, pidx], 0)
            row0 = pl.multiple_of(pid * P, P)
            copies.append(
                pltpu.make_async_copy(
                    kv_hbm.at[pl.ds(row0, P)], bufs.at[slot, i], sems.at[slot]
                )
            )
        return copies

    @pl.when(num_blocks > 0)
    def _start_first():
        for c in block_copies(0, 0):
            c.start()

    def body(blk, carry):
        m, l, acc = carry  # per-head tuples of [G, 1], [G, 1], [G, D] f32
        slot = jax.lax.rem(blk, 2)

        @pl.when(blk + 1 < num_blocks)
        def _prefetch_next():
            for c in block_copies(blk + 1, jax.lax.rem(blk + 1, 2)):
                c.start()

        for c in block_copies(blk, slot):
            c.wait()

        kvb = bufs[slot]  # [BP, P, Hkv*2*D]
        pos = blk * N + jax.lax.broadcasted_iota(jnp.int32, (1, N), 1)
        valid = pos < kv_len  # [1, N]

        m_new, l_new, acc_new = [], [], []
        # Static loop over kv heads: Mosaic wants plain 2D matmuls. The
        # minor-dim slice picks one head's K (or V) lanes; the reshape only
        # merges the leading (page, token) dims.
        for h in range(Hkv):
            k_h = kvb[:, :, 2 * h * D : (2 * h + 1) * D].reshape(N, D)
            v_h = kvb[:, :, (2 * h + 1) * D : (2 * h + 2) * D].reshape(N, D)
            if kvb.dtype == jnp.int8:
                k_h = k_h.astype(jnp.float32) * (k_scale or 1.0)
                v_h = v_h.astype(jnp.float32) * (v_scale or 1.0)
            else:
                k_h = k_h.astype(jnp.float32)
                v_h = v_h.astype(jnp.float32)
            q_h = q_ref[0, h * G : (h + 1) * G, :].astype(jnp.float32)  # [G, D]

            s = jax.lax.dot_general(
                q_h, k_h,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * sm_scale  # [G, N]
            s = jnp.where(valid, s, NEG_INF)

            m_h = jnp.maximum(m[h], jnp.max(s, axis=1, keepdims=True))
            p = jnp.exp(s - m_h)
            alpha = jnp.exp(m[h] - m_h)
            l_h = alpha * l[h] + jnp.sum(p, axis=1, keepdims=True)
            pv = jax.lax.dot_general(
                p, v_h,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [G, D]
            m_new.append(m_h)
            l_new.append(l_h)
            acc_new.append(alpha * acc[h] + pv)
        return tuple(m_new), tuple(l_new), tuple(acc_new)

    init = (
        tuple(jnp.full((G, 1), NEG_INF, jnp.float32) for _ in range(Hkv)),
        tuple(jnp.zeros((G, 1), jnp.float32) for _ in range(Hkv)),
        tuple(jnp.zeros((G, D), jnp.float32) for _ in range(Hkv)),
    )
    m, l, acc = jax.lax.fori_loop(0, num_blocks, body, init)
    for h in range(Hkv):
        out_h = acc[h] / jnp.maximum(l[h], 1e-30)
        out_ref[0, h * G : (h + 1) * G, :] = out_h.astype(out_ref.dtype)


def paged_decode_attention(
    q: jnp.ndarray,         # [B, Hq, D]
    kv_l: jnp.ndarray,      # [(num_pages+1)*P, Hkv*2*D]
    kv_lens: jnp.ndarray,   # [B] i32 — valid tokens per sequence
    page_tbl: jnp.ndarray,  # [B, pages_per_seq] i32 — page ids
    *,
    num_kv_heads: int,
    page_size: int,
    pages_per_block: int = 8,
    sm_scale: Optional[float] = None,
    k_scale: Optional[float] = None,
    v_scale: Optional[float] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    B, Hq, D = q.shape
    pages_per_seq = page_tbl.shape[1]
    BP = min(pages_per_block, pages_per_seq)
    row_width = kv_l.shape[-1]
    assert row_width == num_kv_heads * 2 * D, (row_width, num_kv_heads, D)
    if sm_scale is None:
        sm_scale = D ** -0.5

    kernel = functools.partial(
        _decode_kernel,
        num_kv_heads=num_kv_heads,
        head_dim=D,
        page_size=page_size,
        pages_per_block=BP,
        pages_per_seq=pages_per_seq,
        sm_scale=sm_scale,
        k_scale=k_scale,
        v_scale=v_scale,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, Hq, D), lambda b, lens, tbl: (b, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, Hq, D), lambda b, lens, tbl: (b, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, BP, page_size, row_width), kv_l.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    bytes_per_seq = row_width * kv_l.dtype.itemsize  # per token
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hq, D), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * pages_per_seq * page_size * Hq * D,
            bytes_accessed=B * pages_per_seq * page_size * bytes_per_seq,
            transcendentals=B * pages_per_seq * page_size * Hq,
        ),
        interpret=interpret,
    )(kv_lens, page_tbl, q, kv_l)
    return out


def pallas_attention(
    layer_idx: int,
    q: jnp.ndarray,      # [B, S, Hq, D]
    k_new: jnp.ndarray,  # [B, S, Hkv, D]
    v_new: jnp.ndarray,
    kv_l: jnp.ndarray,
    meta,
    *,
    page_size: int,
    pages_per_block: int = 8,
    k_scale: Optional[float] = None,
    v_scale: Optional[float] = None,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Drop-in attn_impl: Pallas paged kernel for decode (S == 1), jnp
    chunked attention for prefill (a prefill runs once per request; decode
    runs every step for every request)."""
    from tpusgl.ops.attention import chunked_attention, write_kv

    B, S, Hq, D = q.shape
    if S != 1 or meta.page_tbl is None:
        return chunked_attention(layer_idx, q, k_new, v_new, kv_l, meta)
    kv_l = write_kv(k_new, v_new, kv_l, meta.out_loc)
    out = paged_decode_attention(
        q[:, 0], kv_l, meta.seq_lens, meta.page_tbl,
        num_kv_heads=k_new.shape[2], page_size=page_size,
        pages_per_block=pages_per_block,
        k_scale=k_scale, v_scale=v_scale, interpret=interpret,
    )
    return out[:, None], kv_l
