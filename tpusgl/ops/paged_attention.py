"""Pallas paged decode-attention kernel over the token-slot KV pool.

The #1 kernel called for by SURVEY.md §7: single-query attention over the
paged KV pool, streaming K/V pages from HBM through the page table instead of
XLA's row gather (measured 18.7 GB/s effective on v5e at the bench geometry —
the decode bottleneck; cf. the reference's per-request Python loop at
/root/reference/attn_backend.py:112-149). Each DMA moves one whole page —
`page_size` contiguous pool rows — rather than scattered single tokens.

Layout contract (tpusgl/ops/attention.py, tpusgl/runtime/memory_pool.py):
- pool `kv_l`: [(num_pages + 1) * page_size, Hkv*2*D]; minor dim is split in
  half — all K heads first, then all V heads ([{k,v}, h, D]) — so the merged
  compute path slices every head's K (or V) as ONE contiguous [N, Hkv*D]
  block; page 0 reserved as the dummy target.
- the allocator hands out whole pages, so the KV rows for logical positions
  [j*P, (j+1)*P) of a request are exactly rows [pid*P, (pid+1)*P) of the pool
  for page id `pid` = page_tbl[b, j].
- `kv_lens[b]` is the number of valid tokens (trailing pages beyond it are
  never fetched: the per-sequence kv loop has a dynamic trip count, so one
  compiled program serves every context length).

Kernel structure (pallas_guide.md patterns: scalar prefetch, double-buffered
DMA, online softmax):
- grid (B,): one program instance per sequence; softmax accumulators are
  plain fori_loop carries (never touch scratch memory).
- per block, `pages_per_block` page DMAs land in one of two VMEM buffers
  while the previous block computes (double buffering), and the LAST block
  of each sequence prefetches the NEXT sequence's first block — the buffer
  parity is carried across grid steps in SMEM, so the pipeline never drains
  at a sequence boundary (this cross-sequence prefetch is worth ~7x at
  large batch: without it every grid step stalls on its first DMA).
- GQA: per-kv-head q [G, D] against [N, D] page tiles on the MXU.
- int8 KV: dequantized in-kernel with static per-layer k/v scales.
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
    # Positional refs; layout depends on `has_scale` (per-token int8 scales):
    #   lens_ref   SMEM [B] i32 — valid kv tokens per sequence
    #   tbl_ref    SMEM [B, pages_per_seq] i32 — page ids
    #   q_ref      VMEM [SB, Hq, D]
    #   kv_hbm     ANY  [(num_pages+1)*P, Hkv*2*D]
    #   scale_hbm  ANY  [(num_pages+1)*R8, P] f32          (has_scale only;
    #              8-row-aligned per-page blocks, ops/attention.scale_row)
    #   out_ref    VMEM [SB, Hq, D]
    #   bufs       VMEM [2, BP*P, Hkv*2*D] scratch (flat so one contiguous
    #              block can land as a single DMA — see block_contig)
    #   sbufs      VMEM [2, BP*R8, P] f32 scratch          (has_scale only;
    #              page-major. A lane-slotted layout — page i's [R8, P] at
    #              lanes [i*P, (i+1)*P) so the compute reads [Hkv, N] as one
    #              slice — was tried in round 5: the per-page 512-byte
    #              strided scale DMAs it needs cost 258 vs 139 us/call,
    #              while the whole slice-concat machinery it removes is only
    #              ~5 us/call (static-scale probe: 132 us). Page-major +
    #              concats is the measured optimum.)
    #   sems       DMA sems (2,)
    #   slot_ref   SMEM (1,) i32 — buffer parity carried across grid steps
    *refs,
    has_scale: bool = False,
    num_seqs: int,
    num_kv_heads: int,
    head_dim: int,
    page_size: int,
    pages_per_block: int,
    pages_per_seq: int,
    seqs_per_block: int,
    sm_scale: float,
    k_scale: Optional[float],
    v_scale: Optional[float],
    num_queries: int = 1,
    merged: bool = True,
):
    # num_queries = S > 1 is the speculative-verify mode: q_ref carries S
    # causally-staggered queries per sequence ([SB, S*Hq, D], query j's rows
    # at [j*Hq, (j+1)*Hq)); ONE pass over the sequence's KV stream scores all
    # of them (query j's kv limit is lens - (S-1-j)), replacing the old
    # S-separate-kernel-calls verify that re-streamed the full KV per draft
    # position (VERDICT r3 #7).
    if has_scale:
        (lens_ref, tbl_ref, q_ref, kv_hbm, scale_hbm, out_ref,
         bufs, sbufs, sems, slot_ref) = refs
    else:
        (lens_ref, tbl_ref, q_ref, kv_hbm, out_ref,
         bufs, sems, slot_ref) = refs
        scale_hbm = sbufs = None
    g = pl.program_id(0)
    P = page_size
    BP = pages_per_block
    SB = seqs_per_block
    N = BP * P  # tokens per block
    S = num_queries
    Hkv, D = num_kv_heads, head_dim
    Hq = q_ref.shape[1] // S
    G = Hq // Hkv

    R8 = sbufs.shape[1] // BP if has_scale else 0

    def nblocks(seq):
        return pl.cdiv(lens_ref[seq], N)

    def block_contig(seq, blk):
        """(contiguous?, first page id) for (seq, blk). A block whose valid
        pages are physically consecutive is fetched as ONE [vp*P, W] DMA
        instead of per-page DMAs — the allocator + scheduler preallocation
        hand out contiguous runs. Only VALID pages participate (and are
        fetched), so the run never leaves the pool: every valid page id is a
        real allocation < total_pages."""
        num_valid = pl.cdiv(lens_ref[seq], P)
        first = blk * BP
        pid0 = tbl_ref[seq, jnp.minimum(first, pages_per_seq - 1)]
        ok = num_valid > 0  # always true for blocks < nblocks (traced seed)
        for i in range(1, BP):
            idx = jnp.minimum(first + i, pages_per_seq - 1)
            ok = jnp.logical_and(
                ok,
                jnp.logical_or(
                    first + i >= num_valid, tbl_ref[seq, idx] == pid0 + i
                ),
            )
        return ok, pid0

    def copies_big(pid0, vp, slot):
        # vp (static, 1..BP) = valid pages in this block; fetching only the
        # valid rows cuts HBM bytes ~1.6x at the bench geometry (avg ctx 612
        # vs the 1024-token block) — rows past vp*P keep stale buffer
        # contents, safe because every unmasked read has pos < kv_len <=
        # blk*N + vp*P (and float scratch is zeroed at bootstrap, so stale
        # can never be an uninitialized NaN).
        copies = [
            pltpu.make_async_copy(
                kv_hbm.at[pl.ds(pl.multiple_of(pid0 * P, P), vp * P)],
                bufs.at[slot, pl.ds(0, vp * P)],
                sems.at[slot],
            )
        ]
        if has_scale:
            copies.append(
                pltpu.make_async_copy(
                    scale_hbm.at[pl.ds(pl.multiple_of(pid0 * R8, 8), vp * R8)],
                    sbufs.at[slot, pl.ds(0, vp * R8)],
                    sems.at[slot],
                )
            )
        return copies

    def copies_small(seq, blk, i, slot):
        pid = tbl_ref[seq, blk * BP + i]
        row0 = pl.multiple_of(pid * P, P)
        copies = [
            pltpu.make_async_copy(
                kv_hbm.at[pl.ds(row0, P)],
                bufs.at[slot, pl.ds(i * P, P)],
                sems.at[slot],
            )
        ]
        if has_scale:
            copies.append(
                pltpu.make_async_copy(
                    scale_hbm.at[pl.ds(pl.multiple_of(pid * R8, 8), R8)],
                    sbufs.at[slot, pl.ds(i * R8, R8)],
                    sems.at[slot],
                )
            )
        return copies

    def _for_block(seq, blk, slot, action):
        """Start or wait the block's DMAs; the start and wait sides branch on
        the same deterministic predicates (contiguity AND valid-page count),
        so semaphore signals always match."""
        ok, pid0 = block_contig(seq, blk)
        num_valid = pl.cdiv(lens_ref[seq], P)
        vp = jnp.clip(num_valid - blk * BP, 1, BP)  # valid pages this block

        @pl.when(ok)
        def _():
            for k in range(1, BP + 1):

                @pl.when(vp == k)
                def _(k=k):
                    for c in copies_big(pid0, k, slot):
                        action(c)

        @pl.when(jnp.logical_not(ok))
        def _():
            # Non-contiguous block: per-page DMAs, skipping invalid pages
            # entirely (round 3 fetched dummy page 0 for them).
            for i in range(BP):

                @pl.when(blk * BP + i < num_valid)
                def _(i=i):
                    for c in copies_small(seq, blk, i, slot):
                        action(c)

    def start(seq, blk, slot):
        _for_block(seq, blk, slot, lambda c: c.start())

    def start_first_of_next(after_b, slot):
        """Prefetch the first block of the next non-empty sequence after
        `after_b` (traced). Only the immediate successor is checked without
        scanning: empty sequences forward the prefetch themselves."""

        @pl.when(after_b + 1 < num_seqs)
        def _():
            @pl.when(nblocks(after_b + 1) > 0)
            def _():
                start(after_b + 1, 0, slot)

    @pl.when(g == 0)
    def _bootstrap():
        slot_ref[0] = 0
        # Partial-block fetches can leave scratch rows untouched for the
        # whole call; zero float scratch once so stale bytes are never an
        # uninitialized NaN (0 * NaN would poison the V-side dot even at
        # masked positions). int8 garbage is finite — no init needed.
        if bufs.dtype != jnp.int8:
            bufs[...] = jnp.zeros(bufs.shape, bufs.dtype)
        if has_scale:
            sbufs[...] = jnp.zeros(sbufs.shape, jnp.float32)

        @pl.when(nblocks(0) > 0)
        def _():
            start(0, 0, 0)

    cur = slot_ref[0]

    # SB sequences per grid step: per-grid-step overhead (~6 us of block
    # copy/sync machinery on this toolchain) is amortized over SB sequences'
    # KV streams; the double-buffer parity chain runs through all of them.
    for s in range(SB):
        b = g * SB + s
        nb = nblocks(b)

        @pl.when(nb == 0)
        def _empty_seq():
            # Padding row: keep the cross-sequence pipeline alive.
            start_first_of_next(b, cur)
            out_ref[s, :, :] = jnp.zeros((S * Hq, D), out_ref.dtype)

        @pl.when(nb > 0)
        def _run():
            kv_len = lens_ref[b]
            R = S * G  # query rows per kv head
            RH = -(-R // 8) * 8  # per-head row block, sublane-aligned
            ROWS = Hkv * RH

            def q_head(h):
                if S == 1:
                    return q_ref[s, h * G : (h + 1) * G, :]
                return jnp.concatenate(
                    [q_ref[s, j * Hq + h * G : j * Hq + h * G + G, :]
                     for j in range(S)],
                    axis=0,
                )  # [R, D]

            def valid_mask(blk):
                pos = blk * N + jax.lax.broadcasted_iota(
                    jnp.int32, (1, N), 1
                )
                if S == 1:
                    return pos < kv_len  # [1, N]
                jrow = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0) // G
                # query j (rows [j*G, (j+1)*G)) sees kv_len - (S-1-j) tokens
                return pos < kv_len - (S - 1) + jrow  # [R, N]

            def write_out(h, out_h):
                if S == 1:
                    out_ref[s, h * G : (h + 1) * G, :] = out_h.astype(
                        out_ref.dtype
                    )
                    return
                for j in range(S):
                    out_ref[s, j * Hq + h * G : j * Hq + h * G + G, :] = (
                        out_h[j * G : (j + 1) * G].astype(out_ref.dtype)
                    )

            def q_blockdiag():
                """[ROWS, Hkv*D] block-diagonal query: head h's R query rows
                sit at rows [h*RH, h*RH+R) x cols [h*D, (h+1)*D), zeros
                elsewhere. Built once per sequence; with the split-half KV
                row layout ([K heads | V heads]) this turns the per-head
                score matmuls into ONE [ROWS, Hkv*D] x [N, Hkv*D]^T dot with
                the exact same MXU tile count (the per-head [G<=8, D] dots
                wasted 94% of the 128-row MXU tile AND serialized 8 small
                matmuls + 4 softmax chains per block — the measured 1.6
                us/seq floor that capped the kernel at 147 us/call flat from
                ctx 64 to 512)."""
                blocks = []
                for h in range(Hkv):
                    col = [q_head(h)]
                    if RH > R:
                        col.append(jnp.zeros((RH - R, D), q_ref.dtype))
                    blk_h = jnp.concatenate(col, 0) if len(col) > 1 else col[0]
                    pre = h * RH
                    post = ROWS - pre - RH
                    parts = []
                    if pre:
                        parts.append(jnp.zeros((pre, D), q_ref.dtype))
                    parts.append(blk_h)
                    if post:
                        parts.append(jnp.zeros((post, D), q_ref.dtype))
                    blocks.append(
                        jnp.concatenate(parts, 0) if len(parts) > 1 else parts[0]
                    )
                return jnp.concatenate(blocks, 1)

            q_bd = q_blockdiag() if merged else None

            def merged_mask(blk):
                """[ROWS, N] validity: padding rows (rr >= R) fully masked;
                in verify mode query j of each head sees kv_len-(S-1)+j."""
                pos = blk * N + jax.lax.broadcasted_iota(
                    jnp.int32, (ROWS, N), 1
                )
                rr = jax.lax.broadcasted_iota(jnp.int32, (ROWS, N), 0) % RH
                ok = rr < R
                if S == 1:
                    return jnp.logical_and(pos < kv_len, ok)
                jrow = rr // G
                return jnp.logical_and(pos < kv_len - (S - 1) + jrow, ok)

            def body(blk, carry):
                m, l, acc = carry  # per-head tuples [G,1], [G,1], [G,D] f32
                slot = jax.lax.rem(cur + blk, 2)
                slot_next = jax.lax.rem(cur + blk + 1, 2)

                @pl.when(blk + 1 < nb)
                def _prefetch_same():
                    start(b, blk + 1, slot_next)

                @pl.when(blk + 1 == nb)
                def _prefetch_next_seq():
                    start_first_of_next(b, slot_next)

                _for_block(b, blk, slot, lambda c: c.wait())

                # ONE online-softmax block loop for both dequant flavors
                # (they drifted as near-duplicates once):
                # - static scales (no has_scale): fold k_scale into the score
                #   multiplier, v_scale into the accumulate,
                # - per-token scales (has_scale): multiply the f32 SCORE
                #   columns by the block's [1, N] k-scale row and the PROB
                #   columns by the v-scale row. The scale rows are assembled
                #   by lane-concatenating the BP ref-loaded [1, P] page rows
                #   (P % 128 == 0 keeps every piece lane-tile aligned; Mosaic
                #   rejects the [BP, P] -> [1, N] reshape and offset-layout
                #   value slices, hence ref loads + aligned concat).
                # Matmuls run in the ACTIVATION dtype with f32 accumulate
                # (int8 values are exact in bf16; an f32 cast here forced the
                # MXU onto its ~4x slower f32 path — measured half the
                # kernel's time at the 7B decode geometry); per-token scales
                # stay f32 on the f32 score/prob columns, so dequant
                # precision is unchanged.
                kvb = bufs[slot]  # [BP*P, Hkv*2*D]
                valid = None if merged else valid_mask(blk)  # [1 or R, N]
                mmd = q_ref.dtype
                is_int8 = kvb.dtype == jnp.int8
                k_mul = sm_scale * (
                    k_scale if not has_scale and is_int8 and k_scale else 1.0
                )
                v_mul = (
                    v_scale if not has_scale and is_int8 and v_scale else 1.0
                )

                def scale_row(off):  # [1, N] f32 for (head, k/v) lane `off`
                    return jnp.concatenate(
                        [sbufs[slot, i * R8 + off : i * R8 + off + 1, :]
                         for i in range(BP)],
                        axis=1,
                    )

                def scale_block(off):
                    """[Hkv, N] f32: all heads' k (off=0) or v (off=Hkv)
                    scale rows — one contiguous sublane slice per page block
                    thanks to the split [K rows | V rows] scale layout."""
                    return jnp.concatenate(
                        [sbufs[slot, i * R8 + off : i * R8 + off + Hkv, :]
                         for i in range(BP)],
                        axis=1,
                    )

                if merged:
                    # ONE score matmul + ONE softmax chain + ONE pv matmul
                    # for all kv heads (same MXU tile count as the per-head
                    # dots; 4x fewer serialized ops — see q_blockdiag).
                    k_all = kvb[:, : Hkv * D].astype(mmd)   # [N, Hkv*D]
                    v_all = kvb[:, Hkv * D :].astype(mmd)
                    sc = jax.lax.dot_general(
                        q_bd, k_all,
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ) * k_mul  # [ROWS, N]
                    if has_scale:
                        sc = (
                            sc.reshape(Hkv, RH, N)
                            * scale_block(0)[:, None, :]
                        ).reshape(ROWS, N)
                    sc = jnp.where(merged_mask(blk), sc, NEG_INF)
                    m_n = jnp.maximum(m, jnp.max(sc, axis=1, keepdims=True))
                    p = jnp.exp(sc - m_n)
                    alpha = jnp.exp(m - m_n)
                    l_n = alpha * l + jnp.sum(p, axis=1, keepdims=True)
                    if has_scale:
                        p = (
                            p.reshape(Hkv, RH, N)
                            * scale_block(Hkv)[:, None, :]
                        ).reshape(ROWS, N)
                    pv = jax.lax.dot_general(
                        p.astype(mmd), v_all,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )  # [ROWS, Hkv*D]
                    return m_n, l_n, alpha * acc + pv * v_mul

                m_new, l_new, acc_new = [], [], []
                # Per-head fallback (merged=False): plain 2D matmuls on one
                # head's contiguous K/V column slice.
                for h in range(Hkv):
                    k_h = kvb[:, h * D : (h + 1) * D].astype(mmd)
                    v_h = kvb[:, (Hkv + h) * D : (Hkv + h + 1) * D].astype(mmd)
                    q_h = q_head(h)

                    sc = jax.lax.dot_general(
                        q_h, k_h,
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ) * k_mul  # [G or R, N]
                    if has_scale:
                        sc = sc * scale_row(h)
                    sc = jnp.where(valid, sc, NEG_INF)

                    m_h = jnp.maximum(m[h], jnp.max(sc, axis=1, keepdims=True))
                    p = jnp.exp(sc - m_h)
                    alpha = jnp.exp(m[h] - m_h)
                    l_h = alpha * l[h] + jnp.sum(p, axis=1, keepdims=True)
                    if has_scale:
                        p = p * scale_row(Hkv + h)
                    pv = jax.lax.dot_general(
                        p.astype(mmd), v_h,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )  # [G or R, D]
                    m_new.append(m_h)
                    l_new.append(l_h)
                    acc_new.append(alpha * acc[h] + pv * v_mul)
                return tuple(m_new), tuple(l_new), tuple(acc_new)

            if merged:
                init = (
                    jnp.full((ROWS, 1), NEG_INF, jnp.float32),
                    jnp.zeros((ROWS, 1), jnp.float32),
                    jnp.zeros((ROWS, Hkv * D), jnp.float32),
                )
                m, l, acc = jax.lax.fori_loop(0, nb, body, init)
                o = acc / jnp.maximum(l, 1e-30)
                for h in range(Hkv):
                    write_out(
                        h, o[h * RH : h * RH + R, h * D : (h + 1) * D]
                    )
            else:
                init = (
                    tuple(jnp.full((R, 1), NEG_INF, jnp.float32)
                          for _ in range(Hkv)),
                    tuple(jnp.zeros((R, 1), jnp.float32) for _ in range(Hkv)),
                    tuple(jnp.zeros((R, D), jnp.float32) for _ in range(Hkv)),
                )
                m, l, acc = jax.lax.fori_loop(0, nb, body, init)
                for h in range(Hkv):
                    write_out(h, acc[h] / jnp.maximum(l[h], 1e-30))

        cur = jax.lax.rem(cur + nb, 2)

    slot_ref[0] = cur


def _decode_kernel_grouped(
    # Positional refs (layout depends on has_scale):
    #   lens_ref  SMEM [B] i32
    #   tbl_ref   SMEM [B, pages_per_seq] i32
    #   q_ref     VMEM [SB, Hq, D]
    #   kv_hbm    ANY  [(num_pages+1)*P, Hkv*2*D]
    #   scale_hbm ANY  [(num_pages+1)*R8, P] f32           (has_scale only)
    #   out_ref   VMEM [SB, Hq, D]
    #   bufs      VMEM [2, BP*P, M*Hkv*2*D] — member m's full-width pages at
    #             cols [m*W, (m+1)*W), W = Hkv*2*D
    #   sbufs     VMEM [2, M*BP*R8, P] f32                 (has_scale only)
    #   sems      DMA sems (2,)
    #   slot_ref  SMEM (1,) i32
    *refs,
    has_scale: bool = False,
    num_seqs: int,
    num_kv_heads: int,
    head_dim: int,
    page_size: int,
    pages_per_block: int,
    pages_per_seq: int,
    seqs_per_block: int,
    merge_seqs: int,
    sm_scale: float,
    k_scale: Optional[float],
    v_scale: Optional[float],
):
    """M-sequence merged decode kernel (round-5 lever, PERF_BREAKDOWN.md
    "2-sequence compute merging"): M sequences share ONE block-diagonal score
    matmul, ONE online-softmax chain, and ONE pv matmul per KV block. The
    per-sequence [G<=8, D] compute of `_decode_kernel` wastes 128-G rows of
    every MXU tile AND serializes ~15 vector/matrix ops per sequence per
    block — the measured ~1.6 -> 0.66 us/seq serial floor that keeps the
    kernel at ~56% of its byte ideal at bench geometry. Merging M sequences
    keeps the MXU tile count IDENTICAL (rows stay <= 128) while dividing the
    serialized op count by M.

    Layout: member m's pages land FULL-ROW-WIDTH at column block
    [m*W, (m+1)*W) of one shared buffer — the DMAs move the same dense
    [rows, W] chunks as the per-sequence kernel (a K/V-split layout was
    tried first: its 512-byte strided chunks measured 240 vs 139 us/call —
    DMA efficiency dominates everything here). The block-diagonal q
    [M*ROWS, M*W] has zeros over every V half and over other members'
    columns, so one dot scores each member against only its own K; the
    contraction over the zero V columns and the pv matmul's discarded
    off-diagonal blocks ride MXU tiles that were <=50% row-occupied anyway.
    Decode only (S == 1)."""
    if has_scale:
        (lens_ref, tbl_ref, q_ref, kv_hbm, scale_hbm, out_ref,
         bufs, sbufs, sems, slot_ref) = refs
    else:
        (lens_ref, tbl_ref, q_ref, kv_hbm, out_ref,
         bufs, sems, slot_ref) = refs
        scale_hbm = sbufs = None
    g = pl.program_id(0)
    P = page_size
    BP = pages_per_block
    SB = seqs_per_block
    M = merge_seqs
    N = BP * P
    Hkv, D = num_kv_heads, head_dim
    HD = Hkv * D
    Hq = q_ref.shape[1]
    G = Hq // Hkv
    RH = -(-G // 8) * 8          # per-head row block, sublane-aligned
    ROWS = Hkv * RH              # rows per member
    MROWS = M * ROWS

    R8 = sbufs.shape[1] // (M * BP) if has_scale else 0

    def nblocks(seq):
        return pl.cdiv(lens_ref[seq], N)

    def block_contig(seq, blk):
        num_valid = pl.cdiv(lens_ref[seq], P)
        first = blk * BP
        pid0 = tbl_ref[seq, jnp.minimum(first, pages_per_seq - 1)]
        ok = num_valid > 0
        for i in range(1, BP):
            idx = jnp.minimum(first + i, pages_per_seq - 1)
            ok = jnp.logical_and(
                ok,
                jnp.logical_or(
                    first + i >= num_valid, tbl_ref[seq, idx] == pid0 + i
                ),
            )
        return ok, pid0

    W = 2 * HD

    def copies_big(pid0, vp, slot, m):
        row0 = pl.multiple_of(pid0 * P, P)
        copies = [
            pltpu.make_async_copy(
                kv_hbm.at[pl.ds(row0, vp * P)],
                bufs.at[slot, pl.ds(0, vp * P), pl.ds(m * W, W)],
                sems.at[slot],
            ),
        ]
        if has_scale:
            copies.append(
                pltpu.make_async_copy(
                    scale_hbm.at[pl.ds(pl.multiple_of(pid0 * R8, 8), vp * R8)],
                    sbufs.at[slot, pl.ds(m * BP * R8, vp * R8)],
                    sems.at[slot],
                )
            )
        return copies

    def copies_small(seq, blk, i, slot, m):
        pid = tbl_ref[seq, blk * BP + i]
        row0 = pl.multiple_of(pid * P, P)
        copies = [
            pltpu.make_async_copy(
                kv_hbm.at[pl.ds(row0, P)],
                bufs.at[slot, pl.ds(i * P, P), pl.ds(m * W, W)],
                sems.at[slot],
            ),
        ]
        if has_scale:
            copies.append(
                pltpu.make_async_copy(
                    scale_hbm.at[pl.ds(pl.multiple_of(pid * R8, 8), R8)],
                    sbufs.at[slot, pl.ds(m * BP * R8 + i * R8, R8)],
                    sems.at[slot],
                )
            )
        return copies

    def _for_member(seq, blk, slot, m, action):
        ok, pid0 = block_contig(seq, blk)
        num_valid = pl.cdiv(lens_ref[seq], P)
        vp = jnp.clip(num_valid - blk * BP, 1, BP)

        @pl.when(ok)
        def _():
            for k in range(1, BP + 1):

                @pl.when(vp == k)
                def _(k=k):
                    for c in copies_big(pid0, k, slot, m):
                        action(c)

        @pl.when(jnp.logical_not(ok))
        def _():
            for i in range(BP):

                @pl.when(blk * BP + i < num_valid)
                def _(i=i):
                    for c in copies_small(seq, blk, i, slot, m):
                        action(c)

    def _for_group(b0, blk, slot, action):
        """Start/wait the group's members' DMAs for block `blk`; members
        whose KV stream ended (blk >= nblocks) participate in neither side,
        so semaphore signals always match."""
        for m in range(M):

            @pl.when(blk < nblocks(b0 + m))
            def _(m=m):
                _for_member(b0 + m, blk, slot, m, action)

    def start_group(b0, blk, slot):
        _for_group(b0, blk, slot, lambda c: c.start())

    def start_first_of_next_group(b0, slot):
        # b indices are global (b = g*SB + s0 + m), so "+ M" crosses grid
        # steps transparently. Fully-empty groups forward the prefetch when
        # their own turn comes (matching _decode_kernel's empty-seq path).
        @pl.when(b0 + M < num_seqs)
        def _():
            start_group(b0 + M, 0, slot)

    @pl.when(g == 0)
    def _bootstrap():
        slot_ref[0] = 0
        # Zero float scratch once: q's zero block-diagonal columns multiply
        # OTHER members' K rows — 0 * uninitialized-NaN would poison valid
        # scores. Stale-but-finite bytes (int8 always; float after this
        # zeroing) contribute exact zeros instead.
        if bufs.dtype != jnp.int8:
            bufs[...] = jnp.zeros(bufs.shape, bufs.dtype)
        if has_scale:
            sbufs[...] = jnp.zeros(sbufs.shape, jnp.float32)
        start_group(0, 0, 0)

    cur = slot_ref[0]

    for s0 in range(0, SB, M):
        b0 = g * SB + s0
        nbs = [nblocks(b0 + m) for m in range(M)]
        nbmax = functools.reduce(jnp.maximum, nbs)

        @pl.when(nbmax == 0)
        def _empty_group():
            start_first_of_next_group(b0, cur)
            for m in range(M):
                out_ref[s0 + m, :, :] = jnp.zeros((Hq, D), out_ref.dtype)

        @pl.when(nbmax > 0)
        def _run():
            def q_blockdiag():
                """[MROWS, M*W]: member m head h's G query rows at rows
                [m*ROWS + h*RH, +G) x cols [m*W + h*D, +D) — i.e. against
                member m's K columns only; V halves stay zero (the wasted
                contraction is MXU-free: rows were <=50% of the tile)."""
                cols = []
                for m in range(M):
                    for h in range(Hkv):
                        col = [q_ref[s0 + m, h * G : (h + 1) * G, :]]
                        if RH > G:
                            col.append(jnp.zeros((RH - G, D), q_ref.dtype))
                        blk_h = (
                            jnp.concatenate(col, 0) if len(col) > 1 else col[0]
                        )
                        pre = m * ROWS + h * RH
                        post = MROWS - pre - RH
                        parts = []
                        if pre:
                            parts.append(jnp.zeros((pre, D), q_ref.dtype))
                        parts.append(blk_h)
                        if post:
                            parts.append(jnp.zeros((post, D), q_ref.dtype))
                        cols.append(
                            jnp.concatenate(parts, 0)
                            if len(parts) > 1
                            else parts[0]
                        )
                    # zero V half of member m's column block
                    cols.append(jnp.zeros((MROWS, HD), q_ref.dtype))
                return jnp.concatenate(cols, 1)

            q_bd = q_blockdiag()

            def group_mask(blk):
                """[MROWS, N]: row r of member m = r // ROWS is valid up to
                lens[b0+m]; padding rows within each RH head block masked."""
                pos = blk * N + jax.lax.broadcasted_iota(
                    jnp.int32, (MROWS, N), 1
                )
                rfull = jax.lax.broadcasted_iota(jnp.int32, (MROWS, N), 0)
                ok = rfull % RH < G
                kvl = jnp.zeros((MROWS, N), jnp.int32)
                for m in range(M):
                    kvl = jnp.where(rfull // ROWS == m, lens_ref[b0 + m], kvl)
                return jnp.logical_and(pos < kvl, ok)

            def body(blk, carry):
                m_c, l_c, acc = carry  # [MROWS,1], [MROWS,1], [MROWS, M*HD]
                slot = jax.lax.rem(cur + blk, 2)
                slot_next = jax.lax.rem(cur + blk + 1, 2)

                @pl.when(blk + 1 < nbmax)
                def _prefetch_same():
                    start_group(b0, blk + 1, slot_next)

                @pl.when(blk + 1 == nbmax)
                def _prefetch_next():
                    start_first_of_next_group(b0, slot_next)

                _for_group(b0, blk, slot, lambda c: c.wait())

                mmd = q_ref.dtype
                is_int8 = bufs.dtype == jnp.int8
                k_mul = sm_scale * (
                    k_scale if not has_scale and is_int8 and k_scale else 1.0
                )
                v_mul = (
                    v_scale if not has_scale and is_int8 and v_scale else 1.0
                )
                kvb = bufs[slot].astype(mmd)  # [N, M*W]
                sc = jax.lax.dot_general(
                    q_bd, kvb,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) * k_mul  # [MROWS, N]
                if has_scale:
                    parts = []
                    for m in range(M):
                        base = m * BP * R8
                        srow = jnp.concatenate(
                            [sbufs[slot, base + i * R8 : base + i * R8 + Hkv, :]
                             for i in range(BP)],
                            axis=1,
                        )  # [Hkv, N] k scales
                        parts.append(
                            (sc[m * ROWS : (m + 1) * ROWS].reshape(Hkv, RH, N)
                             * srow[:, None, :]).reshape(ROWS, N)
                        )
                    sc = jnp.concatenate(parts, 0) if M > 1 else parts[0]
                sc = jnp.where(group_mask(blk), sc, NEG_INF)
                m_n = jnp.maximum(m_c, jnp.max(sc, axis=1, keepdims=True))
                p = jnp.exp(sc - m_n)
                alpha = jnp.exp(m_c - m_n)
                l_n = alpha * l_c + jnp.sum(p, axis=1, keepdims=True)
                if has_scale:
                    parts = []
                    for m in range(M):
                        base = m * BP * R8
                        srow = jnp.concatenate(
                            [sbufs[slot,
                                   base + i * R8 + Hkv : base + i * R8 + 2 * Hkv,
                                   :]
                             for i in range(BP)],
                            axis=1,
                        )  # [Hkv, N] v scales
                        parts.append(
                            (p[m * ROWS : (m + 1) * ROWS].reshape(Hkv, RH, N)
                             * srow[:, None, :]).reshape(ROWS, N)
                        )
                    p = jnp.concatenate(parts, 0) if M > 1 else parts[0]
                pv = jax.lax.dot_general(
                    p.astype(mmd), kvb,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [MROWS, M*W]; p@K halves + off-diag blocks discarded
                return m_n, l_n, alpha * acc + pv * v_mul

            init = (
                jnp.full((MROWS, 1), NEG_INF, jnp.float32),
                jnp.zeros((MROWS, 1), jnp.float32),
                jnp.zeros((MROWS, M * W), jnp.float32),
            )
            m_c, l_c, acc = jax.lax.fori_loop(0, nbmax, body, init)
            o = acc / jnp.maximum(l_c, 1e-30)
            for m in range(M):
                for h in range(Hkv):
                    out_ref[s0 + m, h * G : (h + 1) * G, :] = o[
                        m * ROWS + h * RH : m * ROWS + h * RH + G,
                        m * W + HD + h * D : m * W + HD + (h + 1) * D,
                    ].astype(out_ref.dtype)

        cur = jax.lax.rem(cur + nbmax, 2)

    slot_ref[0] = cur


def paged_decode_attention(
    q: jnp.ndarray,         # [B, S*Hq, D] (S = num_queries; decode S=1)
    kv_l: jnp.ndarray,      # [(num_pages+1)*P, Hkv*2*D]
    kv_lens: jnp.ndarray,   # [B] i32 — valid tokens per sequence (incl. all
    #                         S query positions in verify mode)
    page_tbl: jnp.ndarray,  # [B, pages_per_seq] i32 — page ids
    *,
    num_kv_heads: int,
    page_size: int,
    pages_per_block: int = 8,
    seqs_per_block: int = 16,
    sm_scale: Optional[float] = None,
    k_scale: Optional[float] = None,
    v_scale: Optional[float] = None,
    kv_scale: Optional[jnp.ndarray] = None,  # [num_pages+1, Hkv*2*P] f32 page-major
    num_queries: int = 1,
    merged: bool = True,
    merge_seqs: int = 1,
    interpret: bool = False,
) -> jnp.ndarray:
    B, SHq, D = q.shape
    S = num_queries
    Hq = SHq // S
    assert Hq * S == SHq, (SHq, S)
    pages_per_seq = page_tbl.shape[1]
    BP = min(pages_per_block, pages_per_seq)
    # M-sequence compute merging (grouped kernel): decode-only (S == 1),
    # merged path only, and needs an SB that both divides B and is a
    # multiple of M — otherwise fall back to the per-sequence kernel.
    M = merge_seqs if (merged and S == 1 and merge_seqs > 1) else 1
    SB = min(seqs_per_block, B)
    while SB >= max(M, 1) and (B % SB or SB % max(M, 1)):
        SB -= 1
    if M > 1 and (SB < M or SB % M):
        M = 1
        SB = min(seqs_per_block, B)
        while B % SB:
            SB -= 1
    row_width = kv_l.shape[-1]
    assert row_width == num_kv_heads * 2 * D, (row_width, num_kv_heads, D)
    if sm_scale is None:
        sm_scale = D ** -0.5

    has_scale = kv_scale is not None
    if M > 1:
        kernel = functools.partial(
            _decode_kernel_grouped,
            has_scale=has_scale,
            num_seqs=B,
            num_kv_heads=num_kv_heads,
            head_dim=D,
            page_size=page_size,
            pages_per_block=BP,
            pages_per_seq=pages_per_seq,
            seqs_per_block=SB,
            merge_seqs=M,
            sm_scale=sm_scale,
            k_scale=k_scale,
            v_scale=v_scale,
        )
    else:
        kernel = functools.partial(
            _decode_kernel,
            has_scale=has_scale,
            num_seqs=B,
            num_kv_heads=num_kv_heads,
            head_dim=D,
            page_size=page_size,
            pages_per_block=BP,
            pages_per_seq=pages_per_seq,
            seqs_per_block=SB,
            sm_scale=sm_scale,
            k_scale=k_scale,
            v_scale=v_scale,
            num_queries=S,
            merged=merged,
        )
    in_specs = [
        pl.BlockSpec((SB, SHq, D), lambda g, lens, tbl: (g, 0, 0)),
        pl.BlockSpec(memory_space=pltpu.HBM),
    ]
    scratch_shapes = [
        pltpu.VMEM((2, BP * page_size, M * row_width), kv_l.dtype),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SMEM((1,), jnp.int32),
    ]
    operands = [kv_lens, page_tbl, q, kv_l]
    if has_scale:
        from tpusgl.ops.attention import scale_rows_per_page

        R8 = scale_rows_per_page(num_kv_heads)
        assert kv_scale.shape == ((kv_l.shape[0] // page_size) * R8, page_size), (
            kv_scale.shape, kv_l.shape, page_size)
        assert interpret or page_size % 128 == 0, (
            "per-token-scale int8 KV on the compiled kernel needs "
            f"page_size % 128 == 0 (Mosaic lane tiling); got {page_size}"
        )
        in_specs.append(pl.BlockSpec(memory_space=pltpu.HBM))
        scratch_shapes.insert(
            1, pltpu.VMEM((2, M * BP * R8, page_size), jnp.float32)
        )
        operands.append(kv_scale)
    # NOTE on operand staging: XLA memory-space-assignment stages the pool
    # operand into S(1) quarter-slices per call regardless of the operand's
    # memory-space annotation. Passing the pool through as an ALIASED output
    # was tried (round 3) and made it WORSE — the kernels themselves slowed
    # 468 -> 632 us/layer with the aliased pass-through, and the S(1) slices
    # remained. Measured: keep the call single-output.
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B // SB,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((SB, SHq, D), lambda g, lens, tbl: (g, 0, 0)),
        scratch_shapes=scratch_shapes,
    )
    bytes_per_tok = row_width * kv_l.dtype.itemsize
    if has_scale:
        bytes_per_tok += num_kv_heads * 2 * 4
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, SHq, D), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * pages_per_seq * page_size * SHq * D,
            bytes_accessed=B * pages_per_seq * page_size * bytes_per_tok,
            transcendentals=B * pages_per_seq * page_size * SHq,
        ),
        interpret=interpret,
    )(*operands)
    return out


@functools.lru_cache(maxsize=None)
def _jitted_paged_decode(has_scale: bool, statics: tuple):
    """Cached jitted wrapper around paged_decode_attention.

    The layer stack calls the kernel at L (x window) call sites with
    identical shapes; tracing the kernel costs ~2-3 s per site on this
    toolchain (jax re-traces per pallas_call). Routing every site through
    ONE cached pjit makes jax trace + lower the kernel once and emit a
    shared function — measured 192-site decode-program lowering drops from
    764 s to seconds, compile from 96 s to ~2 s."""
    kw = dict(statics)
    if has_scale:
        def call(q, kv_l, kv_lens, page_tbl, kv_scale):
            return paged_decode_attention(
                q, kv_l, kv_lens, page_tbl, kv_scale=kv_scale, **kw
            )
    else:
        def call(q, kv_l, kv_lens, page_tbl):
            return paged_decode_attention(q, kv_l, kv_lens, page_tbl, **kw)
    # inline=True — see ops/quant_matmul._jitted_qmm: a call boundary
    # made XLA copy the evolving KV pool into the callee's argument
    # slot every layer (the whole pool re-written each iteration).
    return jax.jit(call, inline=True)


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
    merge_seqs: int = 1,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Drop-in attn_impl: Pallas paged kernel for decode (S == 1) and for
    small-S speculative verify (S > 1 with a page table: all S tokens' KV is
    written first, then ONE multi-query kernel pass scores every draft
    position against the sequence's KV stream, query j masked to its
    causally-correct kv length — exact, and the KV bytes are streamed once
    instead of S times as in round 3, VERDICT r3 #7). jnp extend/chunked
    attention for prefill. `kv_l` may be an int8 (pool, per-token-scale)
    pair — see ops.attention.write_kv."""
    from tpusgl.ops.attention import chunked_attention, extend_attention, write_kv

    B, S, Hq, D = q.shape
    if meta.page_tbl is None:
        if meta.kv_rows is None:
            return extend_attention(layer_idx, q, k_new, v_new, kv_l, meta)
        return chunked_attention(layer_idx, q, k_new, v_new, kv_l, meta)
    kv_l = write_kv(k_new, v_new, kv_l, meta.out_loc)
    buf, kv_scale = kv_l if isinstance(kv_l, tuple) else (kv_l, None)
    statics = (
        ("num_kv_heads", k_new.shape[2]),
        ("page_size", page_size),
        ("pages_per_block", pages_per_block),
        ("k_scale", k_scale),
        ("v_scale", v_scale),
        ("num_queries", S),
        ("merge_seqs", merge_seqs),
        ("interpret", interpret),
    )
    fn = _jitted_paged_decode(kv_scale is not None, statics)
    qf = q.reshape(B, S * Hq, D)  # query j's heads at rows [j*Hq, (j+1)*Hq)
    if kv_scale is not None:
        out = fn(qf, buf, meta.seq_lens, meta.page_tbl, kv_scale)
    else:
        out = fn(qf, buf, meta.seq_lens, meta.page_tbl)
    return out.reshape(B, S, Hq, D), kv_l
