"""Pallas flash prefill/extend attention over packed new tokens + paged prefix.

The prefill counterpart of the paged decode kernel (SURVEY.md §7 M3): replaces
the jnp `extend_attention` path (tpusgl/ops/attention.py:270-369) — which
materializes [B, Hq, C, T] score blocks in HBM and rides XLA's ~18.7 GB/s row
gather for the cached prefix — with a single flash-style kernel. Reference
semantics: the prefix+causal mask of /root/reference/attn_backend.py:34-110,
batched.

Structure (pallas_guide.md patterns: scalar prefetch, double-buffered DMA,
online softmax):
- grid (B, S // BQ): one program instance per (sequence row, q block). Softmax
  state (m, l, acc) per kv head is a plain fori_loop carry.
- self part: causal attention over this row's new tokens. K/V blocks of
  [NS, Hkv, D] are DMA'd from the k_new/v_new activations in HBM through a
  two-slot VMEM pipeline; matmuls run in the activation dtype (bf16) with f32
  accumulation — the MXU's fast path — and the fresh tokens never round-trip
  through the (possibly int8) pool: strictly more exact, like extend_attention.
- prefix part (radix hits / chunked-prefill continuations): KV pages stream
  from the paged pool through the page table with the same double-buffered
  page DMAs as the decode kernel; int8 pools dequantize in-kernel by scaling
  the score/prob columns with the per-token scale rows.
- padding q blocks (q0 >= ext_len) skip every DMA and matmul and write zeros,
  so bucket padding costs almost nothing.

Masking per row b, query i (row-relative), like extend_attention:
  self  key j:  j <= i  and  j < ext_lens[b]
  prefix key t: t < prefix_lens[b]
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _prefill_kernel(
    *refs,
    has_prefix: bool,
    has_scale: bool,
    num_kv_heads: int,
    head_dim: int,
    q_block: int,
    self_block: int,
    page_size: int,
    pages_per_block: int,
    prefix_pages_w: int,
    sm_scale: float,
):
    if has_prefix:
        if has_scale:
            (plens_ref, elens_ref, ptbl_ref, q_ref, k_hbm, v_hbm, kv_hbm,
             scale_hbm, out_ref, pbufs, sbufs, kbuf, vbuf, psem, ssem) = refs
        else:
            (plens_ref, elens_ref, ptbl_ref, q_ref, k_hbm, v_hbm, kv_hbm,
             out_ref, pbufs, kbuf, vbuf, psem, ssem) = refs
            scale_hbm = sbufs = None
    else:
        (elens_ref, q_ref, k_hbm, v_hbm, out_ref, kbuf, vbuf, ssem) = refs
        plens_ref = ptbl_ref = kv_hbm = scale_hbm = pbufs = sbufs = psem = None

    b = pl.program_id(0)
    qi = pl.program_id(1)
    BQ = q_block
    NS = self_block
    P = page_size
    BP = pages_per_block
    NP = BP * P  # prefix tokens per block
    Hkv, D = num_kv_heads, head_dim
    Hq = q_ref.shape[2]
    G = Hq // Hkv
    R = BQ * G  # score rows per head

    q0 = qi * BQ
    ext = elens_ref[b]
    real = q0 < ext  # this q block contains at least one real query
    plen = plens_ref[b] if has_prefix else 0

    # Trip counts; all zero for padding blocks (skip everything).
    jmax = jnp.minimum(q0 + BQ, ext)
    n_self = jnp.where(real, pl.cdiv(jmax, NS), 0)
    n_pre = jnp.where(real, pl.cdiv(plen, NP), 0) if has_prefix else 0

    def self_copies(sblk, slot):
        off = pl.multiple_of(sblk * NS, NS)
        return [
            pltpu.make_async_copy(
                k_hbm.at[b, pl.ds(off, NS)], kbuf.at[slot], ssem.at[slot]
            ),
            pltpu.make_async_copy(
                v_hbm.at[b, pl.ds(off, NS)], vbuf.at[slot], ssem.at[slot]
            ),
        ]

    def prefix_copies(blk, slot):
        num_valid = pl.cdiv(plen, P)
        copies = []
        for i in range(BP):
            pidx = jnp.minimum(blk * BP + i, prefix_pages_w - 1)
            pid = jnp.where(blk * BP + i < num_valid, ptbl_ref[b, pidx], 0)
            row0 = pl.multiple_of(pid * P, P)
            copies.append(
                pltpu.make_async_copy(
                    kv_hbm.at[pl.ds(row0, P)], pbufs.at[slot, i], psem.at[slot]
                )
            )
            if has_scale:
                R8 = sbufs.shape[2]
                copies.append(
                    pltpu.make_async_copy(
                        scale_hbm.at[pl.ds(pl.multiple_of(pid * R8, 8), R8)],
                        sbufs.at[slot, i],
                        psem.at[slot],
                    )
                )
        return copies

    # Kick off the first block of each phase up front: the self DMA is in
    # flight during the whole prefix phase, so the phase boundary never stalls.
    if has_prefix:
        @pl.when(n_pre > 0)
        def _():
            for c in prefix_copies(0, 0):
                c.start()

    @pl.when(n_self > 0)
    def _():
        for c in self_copies(0, 0):
            c.start()

    # Row-relative query index per score row r: i = q0 + r // G.
    i_col = q0 + jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0) // G

    def softmax_update(h, carry_h, sc, v_src):
        """One online-softmax block update for head h. sc [R, N] f32 already
        masked; v_src [N, D] in the matmul dtype."""
        m, l, acc = carry_h
        m_new = jnp.maximum(m, jnp.max(sc, axis=1, keepdims=True))
        p = jnp.exp(sc - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = alpha * l + jnp.sum(p, axis=1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(v_src.dtype), v_src,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return m_new, l_new, alpha * acc + pv

    def q_head(h):
        return q_ref[0, :, h * G : (h + 1) * G, :].reshape(R, D)

    init = (
        tuple(jnp.full((R, 1), NEG_INF, jnp.float32) for _ in range(Hkv)),
        tuple(jnp.zeros((R, 1), jnp.float32) for _ in range(Hkv)),
        tuple(jnp.zeros((R, D), jnp.float32) for _ in range(Hkv)),
    )

    def pre_body(blk, carry):
        m, l, acc = carry
        slot = jax.lax.rem(blk, 2)

        @pl.when(blk + 1 < n_pre)
        def _():
            for c in prefix_copies(blk + 1, 1 - slot):
                c.start()

        for c in prefix_copies(blk, slot):
            c.wait()

        kvb = pbufs[slot]  # [BP, P, Hkv*2*D]
        t = blk * NP + jax.lax.broadcasted_iota(jnp.int32, (1, NP), 1)
        valid = t < plen  # [1, NP]
        m_new, l_new, acc_new = [], [], []
        for h in range(Hkv):
            k_h = kvb[:, :, h * D : (h + 1) * D].reshape(NP, D)
            v_h = kvb[:, :, (Hkv + h) * D : (Hkv + h + 1) * D].reshape(NP, D)
            qd = q_ref.dtype
            sc = jax.lax.dot_general(
                q_head(h), k_h.astype(qd),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * sm_scale  # [R, NP]
            if has_scale:
                # Per-token scale row for (head, k/v): lane-concat the BP
                # ref-loaded [1, P] page rows (see paged_attention.py — the
                # same Mosaic lane-tiling constraint, page_size % 128 == 0
                # on the compiled path).
                ks = jnp.concatenate(
                    [sbufs[slot, i, h : h + 1, :] for i in range(BP)],
                    axis=1,
                )  # [1, NP]
                vs = jnp.concatenate(
                    [sbufs[slot, i, Hkv + h : Hkv + h + 1, :] for i in range(BP)],
                    axis=1,
                )
                sc = jnp.where(valid, sc * ks, NEG_INF)
                upd = softmax_update(
                    h, (m[h], l[h], acc[h]), sc,
                    (v_h.astype(jnp.float32) * vs.reshape(NP, 1)).astype(qd),
                )
            else:
                sc = jnp.where(valid, sc, NEG_INF)
                upd = softmax_update(
                    h, (m[h], l[h], acc[h]), sc, v_h.astype(qd)
                )
            m_new.append(upd[0]); l_new.append(upd[1]); acc_new.append(upd[2])
        return tuple(m_new), tuple(l_new), tuple(acc_new)

    def self_body(sblk, carry):
        m, l, acc = carry
        slot = jax.lax.rem(sblk, 2)

        @pl.when(sblk + 1 < n_self)
        def _():
            for c in self_copies(sblk + 1, 1 - slot):
                c.start()

        for c in self_copies(sblk, slot):
            c.wait()

        j = sblk * NS + jax.lax.broadcasted_iota(jnp.int32, (1, NS), 1)
        valid = (j <= i_col) & (j < ext)  # [R, NS]
        m_new, l_new, acc_new = [], [], []
        for h in range(Hkv):
            k_h = kbuf[slot, :, h, :]  # [NS, D] activation dtype
            v_h = vbuf[slot, :, h, :]
            sc = jax.lax.dot_general(
                q_head(h), k_h,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * sm_scale  # [R, NS]
            sc = jnp.where(valid, sc, NEG_INF)
            upd = softmax_update(h, (m[h], l[h], acc[h]), sc, v_h)
            m_new.append(upd[0]); l_new.append(upd[1]); acc_new.append(upd[2])
        return tuple(m_new), tuple(l_new), tuple(acc_new)

    carry = init
    if has_prefix:
        carry = jax.lax.fori_loop(0, n_pre, pre_body, carry)
    m, l, acc = jax.lax.fori_loop(0, n_self, self_body, carry)

    for h in range(Hkv):
        out_h = acc[h] / jnp.maximum(l[h], 1e-30)
        out_ref[0, :, h * G : (h + 1) * G, :] = out_h.astype(
            out_ref.dtype
        ).reshape(BQ, G, D)


def paged_prefill_attention(
    q: jnp.ndarray,       # [B, S, Hq, D]
    k_new: jnp.ndarray,   # [B, S, Hkv, D]
    v_new: jnp.ndarray,
    ext_lens: jnp.ndarray,  # [B] i32 — number of real new tokens per row
    *,
    kv_l: Optional[jnp.ndarray] = None,      # [(num_pages+1)*P, Hkv*2*D]
    kv_scale: Optional[jnp.ndarray] = None,  # scale pool (int8 KV)
    prefix_lens: Optional[jnp.ndarray] = None,   # [B] i32
    prefix_pages: Optional[jnp.ndarray] = None,  # [B, PPW] i32 page ids
    page_size: int = 128,
    pages_per_block: int = 4,
    q_block: int = 128,
    self_block: int = 512,
    sm_scale: Optional[float] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    B, S, Hq, D = q.shape
    Hkv = k_new.shape[2]
    BQ = min(q_block, S)
    assert S % BQ == 0, (S, BQ)
    NS = min(self_block, S)
    assert S % NS == 0, (S, NS)
    if sm_scale is None:
        sm_scale = D ** -0.5

    has_prefix = prefix_pages is not None
    has_scale = has_prefix and kv_scale is not None
    BP = pages_per_block
    PPW = prefix_pages.shape[1] if has_prefix else 1
    BP = min(BP, PPW)

    kernel = functools.partial(
        _prefill_kernel,
        has_prefix=has_prefix,
        has_scale=has_scale,
        num_kv_heads=Hkv,
        head_dim=D,
        q_block=BQ,
        self_block=NS,
        page_size=page_size,
        pages_per_block=BP,
        prefix_pages_w=PPW,
        sm_scale=sm_scale,
    )

    nq = S // BQ
    q_spec = pl.BlockSpec((1, BQ, Hq, D), lambda b, qi, *_: (b, qi, 0, 0))
    in_specs = [q_spec,
                pl.BlockSpec(memory_space=pltpu.HBM),
                pl.BlockSpec(memory_space=pltpu.HBM)]
    scratch = [
        pltpu.VMEM((2, NS, Hkv, D), k_new.dtype),
        pltpu.VMEM((2, NS, Hkv, D), v_new.dtype),
    ]
    n_scalar = 1
    operands = [ext_lens, q, k_new, v_new]
    if has_prefix:
        n_scalar = 3
        operands = [prefix_lens, ext_lens, prefix_pages, q, k_new, v_new, kv_l]
        in_specs.append(pl.BlockSpec(memory_space=pltpu.HBM))
        scratch.insert(0, pltpu.VMEM(
            (2, BP, page_size, Hkv * 2 * D), kv_l.dtype
        ))
        if has_scale:
            from tpusgl.ops.attention import scale_rows_per_page

            R8 = scale_rows_per_page(Hkv)
            assert kv_scale.shape == (
                (kv_l.shape[0] // page_size) * R8, page_size
            ), (kv_scale.shape, kv_l.shape, page_size)
            assert interpret or page_size % 128 == 0, (
                "per-token-scale int8 KV prefix on the compiled kernel needs "
                f"page_size % 128 == 0 (Mosaic lane tiling); got {page_size}"
            )
            operands.append(kv_scale)
            in_specs.append(pl.BlockSpec(memory_space=pltpu.HBM))
            scratch.insert(1, pltpu.VMEM(
                (2, BP, R8, page_size), jnp.float32
            ))
        scratch.append(pltpu.SemaphoreType.DMA((2,)))  # psem
    scratch.append(pltpu.SemaphoreType.DMA((2,)))  # ssem

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=n_scalar,
        grid=(B, nq),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, BQ, Hq, D), lambda b, qi, *_: (b, qi, 0, 0)),
        scratch_shapes=scratch,
    )
    # Flash flops: self causal ~ S^2/2, prefix ~ S * Tp per row.
    Tp = PPW * page_size if has_prefix else 0
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, S, Hq, D), q.dtype),
        # The per-head online-softmax carries (m/l/acc x Hkv) plus the
        # pipelined q/out blocks exceed the default 16 MB scoped-vmem limit
        # at production shapes; v5e has far more physical VMEM.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * Hq * D * (S * S // 2 + S * Tp),
            bytes_accessed=B * (S * Hkv * 2 * D * 2 + Tp * Hkv * 2 * D),
            transcendentals=B * Hq * (S * S // 2 + S * Tp),
        ),
        interpret=interpret,
    )(*operands)
    return out


@functools.lru_cache(maxsize=None)
def _jitted_prefill(has_prefix: bool, has_scale: bool, statics: tuple):
    """One cached jitted wrapper per static config — the layer stack calls
    the kernel at L identical-aval sites; see paged_attention._jitted_paged_decode
    (inline=True for the same KV-pool copy reason)."""
    kw = dict(statics)
    if not has_prefix:
        def call(q, k_new, v_new, ext_lens):
            return paged_prefill_attention(q, k_new, v_new, ext_lens, **kw)
    elif has_scale:
        def call(q, k_new, v_new, ext_lens, kv_l, kv_scale, plens, pages):
            return paged_prefill_attention(
                q, k_new, v_new, ext_lens, kv_l=kv_l, kv_scale=kv_scale,
                prefix_lens=plens, prefix_pages=pages, **kw
            )
    else:
        def call(q, k_new, v_new, ext_lens, kv_l, plens, pages):
            return paged_prefill_attention(
                q, k_new, v_new, ext_lens, kv_l=kv_l,
                prefix_lens=plens, prefix_pages=pages, **kw
            )
    return jax.jit(call, inline=True)


def pallas_prefill(
    layer_idx: int,
    q: jnp.ndarray,      # [B, S, Hq, D]
    k_new: jnp.ndarray,  # [B, S, Hkv, D]
    v_new: jnp.ndarray,
    kv_l,
    meta,
    *,
    page_size: int,
    pages_per_block: int = 4,
    q_block: int = 128,
    self_block: int = 512,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Drop-in prefill attn_impl (same seam as extend_attention): writes the
    new tokens' KV into the pool, then runs the flash kernel. The cached
    prefix is read through PAGE ids derived from meta.prefix_rows — the
    allocator hands out whole pages, so row t of a request is page
    prefix_rows[t - t%P] // P (tpusgl/ops/attention.make_kv_pool contract)."""
    from tpusgl.ops.attention import write_kv

    kv_l = write_kv(k_new, v_new, kv_l, meta.out_loc)
    buf, kv_scale = kv_l if isinstance(kv_l, tuple) else (kv_l, None)
    statics = (
        ("page_size", page_size),
        ("pages_per_block", pages_per_block),
        ("q_block", q_block),
        ("self_block", self_block),
        ("interpret", interpret),
    )
    has_prefix = meta.prefix_rows is not None
    if not has_prefix:
        fn = _jitted_prefill(False, False, statics)
        out = fn(q, k_new, v_new, meta.ext_lens)
        return out, kv_l

    Tp = meta.prefix_rows.shape[1]
    P = page_size
    assert Tp % P == 0, (Tp, P)
    pages = meta.prefix_rows[:, ::P] // P  # [B, Tp//P]
    if kv_scale is not None:
        fn = _jitted_prefill(True, True, statics)
        out = fn(q, k_new, v_new, meta.ext_lens, buf, kv_scale,
                 meta.prefix_lens, pages)
    else:
        fn = _jitted_prefill(True, False, statics)
        out = fn(q, k_new, v_new, meta.ext_lens, buf,
                 meta.prefix_lens, pages)
    return out, kv_l
