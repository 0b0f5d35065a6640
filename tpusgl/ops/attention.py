"""Paged attention over a token-granular KV pool — jnp reference path.

Replaces the reference's per-request Python attention loop
(/root/reference/attn_backend.py:34-149) with fully batched, static-shape
computation:

- KV for the new tokens is scattered into the pool first, then attention reads
  back through the page table (same ordering as attn_backend.py:20-23).
- The page-table gather (attn_backend.py:55-59, 122-128) becomes one batched
  row gather over [B, S_kv] slot ids.
- GQA repeat_interleave (attn_backend.py:63-66) becomes a head-group reshape;
  no data duplication.
- The per-request prefix+causal mask (attn_backend.py:74-92) becomes a single
  broadcasted comparison against positions/seq_lens.

KV pool layout (performance-critical, measured on v5e):
- one buffer **per layer**, shape [slots+1, Hkv*D]: a stacked [L, ...] array
  indexed by a traced layer id makes XLA lower the scatter into a full-pool
  masked update (~the whole multi-GB pool read+written every step);
  per-layer buffers give canonical single-axis scatters/gathers.
- heads and head_dim merged in the minor dim: a [*, Hkv, D] layout with
  D < 128 lanes forces pool-sized relayouts around every gather.

`ref_attention` materializes full scores (exact; used for tests and tiny
shapes). `chunked_attention` bounds score materialization to one q-chunk at a
time for long prefills. Both are drop-in `attn_impl`s for
models.qwen2.forward; the Pallas kernels (tpusgl/ops/paged_attention.py)
replace them on the decode hot path.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def make_kv_pool(num_layers, num_slots, num_kv_heads, head_dim, dtype,
                 page_size: int = 1):
    """Allocate the paged KV pool: per-layer tuple of
    [(num_pages + 1) * page_size, Hkv*2*D] where num_pages = slots//page_size.

    K and V share each row ([{k,v}, h, D] in the minor dim: all K heads in
    the first half, all V heads in the second) so one row gather fetches both
    (XLA's TPU row gather costs ~0.25 ms per call at this batch geometry —
    halving the gather count halves that). The split-half (not interleaved)
    order lets the Pallas decode kernel slice ALL heads' K (or V) as one
    contiguous [N, Hkv*D] block and run a single merged-heads matmul per
    block (see paged_attention.py — the kernel is serial-op-bound at short
    context, not byte-bound). Every pool consumer runs on LOCAL shards under
    shard_map, so a tp shard's half-split covers exactly its own heads.

    The allocator (runtime/memory_pool.PagePool) hands out whole pages —
    page_size contiguous rows starting at a page_size-aligned row — so the
    Pallas decode kernel can DMA full pages. Page 0 (rows [0, page_size)) is
    the reserved dummy write target (slot 0 semantics of the reference,
    /root/reference/memory_pool.py:82-84). page_size == 1 degenerates to the
    reference's token-granular [slots+1, ...] pool exactly.
    """
    num_pages = num_slots // page_size
    shape = ((num_pages + 1) * page_size, num_kv_heads * 2 * head_dim)
    return tuple(jnp.zeros(shape, dtype) for _ in range(num_layers))


class AttnMeta(NamedTuple):
    """Static-shape batch metadata threaded through the model.

    TPU-native analogue of the reference's SimplifiedForwardBatch
    (/root/reference/forward_batch.py:8-84). Either `kv_rows` (token-granular
    slot ids, used by the jnp paths), `page_tbl` (page ids, used by the
    Pallas decode kernel), or `prefix_rows` (cached-prefix slot ids, used by
    `extend_attention` for batched prefill) selects the KV the batch reads.
    """

    kv_rows: Optional[jnp.ndarray]  # [B, S_kv] int32 — KV slot per position
    seq_lens: jnp.ndarray   # [B] int32 — total logical length incl. new tokens
    ext_lens: jnp.ndarray   # [B] int32 — number of new (non-cached) tokens, <= S
    positions: jnp.ndarray  # [B, S] int32 — logical position of each new token
    out_loc: jnp.ndarray    # [B, S] int32 — KV slot for each new token (0 = dummy)
    page_tbl: Optional[jnp.ndarray] = None  # [B, pages_per_seq] int32 page ids
    # Cached-prefix KV slots for extend_attention ([B, Tp] i32) and the
    # number of valid prefix tokens per row ([B] i32). None = no row in this
    # batch has a cached prefix (self-attention only).
    prefix_rows: Optional[jnp.ndarray] = None
    prefix_lens: Optional[jnp.ndarray] = None


def rows_from_pages(page_tbl: jnp.ndarray, T: int, page_size: int) -> jnp.ndarray:
    """Derive token-granular KV rows [B, T] from the page table: the row for
    logical position t is page_tbl[:, t // P] * P + t % P (pages are
    contiguous aligned runs by the allocator contract)."""
    t = jnp.arange(T, dtype=jnp.int32)
    pages = jnp.take(page_tbl, t // page_size, axis=1)  # [B, T]
    return pages * page_size + (t % page_size)[None, :]




def write_kv(
    k_new: jnp.ndarray,  # [B, S, Hkv, D]
    v_new: jnp.ndarray,
    kv_l,  # [slots+1, Hkv*2*D] — this layer's pool; or (pool, scale) when int8
    out_loc: jnp.ndarray,  # [B, S]
):
    """Scatter new K/V into the pool (attn_backend.py:20-23 /
    memory_pool.py:152-171). Padding tokens carry slot 0 — the reserved dummy
    row (memory_pool.py:82-84) — so no masking is needed.

    When `kv_l` is a (pool int8, scale f32) pair, K/V are quantized
    symmetrically per (token, head, k/v). Scale pool layout: see
    `scale_row` — 8-row-aligned per-page blocks, one [P]-lane row per
    (head, k/v). Replaces the reference's NotImplementedError fp8 stubs
    (memory_pool.py:55-59, 139-147) with a working INT8 KV path."""
    B, S, Hkv, D = k_new.shape
    flat_loc = out_loc.reshape(-1)
    # Pool row layout is [{k,v}, h, D] (K half, V half — see make_kv_pool);
    # internal tensors stay [Hkv, 2, D] and only the flatten permutes.
    rows = jnp.stack([k_new, v_new], axis=3)  # [B, S, Hkv, 2, D]
    if isinstance(kv_l, tuple):
        buf, sc = kv_l
        P = sc.shape[1]
        R8 = scale_rows_per_page(Hkv)
        rf = rows.reshape(-1, Hkv, 2, D).astype(jnp.float32)
        absmax = jnp.max(jnp.abs(rf), axis=-1, keepdims=True)
        scale = absmax / 127.0 + 1e-12  # [N, Hkv, 2, 1]
        q = jnp.clip(jnp.round(rf / scale), -127, 127).astype(jnp.int8)
        # NOTE unique_indices: every real (token, head, k/v) target is
        # distinct; padding tokens all carry slot 0 and collide on the dummy
        # page-0 rows. Strictly that makes the indices non-unique and the
        # page-0 result undefined per XLA scatter semantics (ADVICE r3) —
        # accepted deliberately: page 0 is the reserved dummy page, written
        # only by padding and never read unmasked, and the flag keeps XLA off
        # the slow duplicate-combining scatter path.
        buf = buf.at[flat_loc].set(
            q.swapaxes(1, 2).reshape(-1, Hkv * 2 * D),
            mode="drop", unique_indices=True,
        )
        sval = scale[..., 0].astype(jnp.float32)  # [N, Hkv, 2]
        if S == 1:
            # Decode step: one token per REQUEST, so every real token sits in
            # a distinct page (pages are request-private). Write scales as a
            # gather-merge-scatter of whole [R8, P] page blocks — a row-block
            # scatter XLA lowers ~4x faster than the elementwise 2D scatter
            # (measured 101 -> 25 us standalone at the 7B decode geometry,
            # VERDICT r3 #5a). Page-0 collisions: padding only (see above).
            N = flat_loc.shape[0]
            pid = flat_loc // P
            off = flat_loc % P
            sc3 = sc.reshape(-1, R8, P)
            blocks = sc3[pid]  # [N, R8, P]
            upd = jnp.zeros((N, R8), jnp.float32)
            upd = upd.at[:, : 2 * Hkv].set(
                sval.swapaxes(1, 2).reshape(N, 2 * Hkv)
            )
            colmask = (
                jax.lax.broadcasted_iota(jnp.int32, (N, 1, P), 2)
                == off[:, None, None]
            )
            merged = jnp.where(colmask, upd[:, :, None], blocks)
            sc3 = sc3.at[pid].set(merged, mode="drop")
            sc = sc3.reshape(sc.shape)
        else:
            # Prefill / verify: multiple tokens share pages — elementwise
            # scatter (block merge would lose sibling tokens' columns).
            srow = scale_row(flat_loc // P, Hkv, R8)  # [N, Hkv, 2]
            sc = sc.at[srow, (flat_loc % P)[:, None, None]].set(
                sval, mode="drop", unique_indices=True
            )
        return (buf, sc)
    return kv_l.at[flat_loc].set(
        rows.swapaxes(2, 3).reshape(B, S, Hkv * 2 * D).reshape(-1, Hkv * 2 * D)
        .astype(kv_l.dtype),
        mode="drop", unique_indices=True,
    )


def scale_rows_per_page(Hkv: int) -> int:
    """Scale-pool rows per page: 2*Hkv (head, k/v) rows padded up to a
    multiple of 8 so each page's block DMA is sublane-tile aligned."""
    return -(-2 * Hkv // 8) * 8


def scale_row(pid: jnp.ndarray, Hkv: int, R8: int) -> jnp.ndarray:
    """Row indices of the (head, k/v) scales for page ids `pid`, in the
    scale pool [(num_pages+1) * R8, P].

    Layout: page p owns rows [p*R8, (p+1)*R8); row p*R8 + kv*Hkv + h holds
    head h's k (kv=0) or v (kv=1) scales with the token offset as the lane
    index — all K rows first, then all V rows, mirroring the split-half KV
    row layout so the decode kernel slices each side's [Hkv, P] block
    contiguously. The page
    block is 8-row aligned (R8 % 8 == 0) and P lanes wide, which is what the
    Pallas kernel's DMA needs (Mosaic requires sublane slices in 8-row
    multiples and lane slices in 128-lane multiples — hence
    page_size % 128 == 0 on the compiled int8-KV path; interpret mode — CPU
    tests — accepts any page size). A tp shard owns whole heads' rows within
    each page block (kernel and write path run on local shards under
    shard_map, so only the local layout matters).
    """
    h = jnp.arange(Hkv, dtype=jnp.int32)[None, :, None]
    kv = jnp.arange(2, dtype=jnp.int32)[None, None, :]
    return pid.astype(jnp.int32)[:, None, None] * R8 + kv * Hkv + h


def gather_kv(kv_l, rows: jnp.ndarray, Hkv: int, D: int):
    """One row gather -> (k, v) each [B, T, Hkv, D]; dequantizes to f32 when
    the pool is an int8 (pool, scale) pair."""
    B, T = rows.shape
    if isinstance(kv_l, tuple):
        buf, sc = kv_l
        P = sc.shape[1]
        R8 = scale_rows_per_page(Hkv)
        g = buf[rows].reshape(B, T, 2, Hkv, D).swapaxes(2, 3).astype(jnp.float32)
        srow = scale_row((rows // P).reshape(-1), Hkv, R8)  # [B*T, Hkv, 2]
        s = sc[srow, (rows % P).reshape(-1)[:, None, None]]
        g = g * s.reshape(B, T, Hkv, 2, 1)
        return g[:, :, :, 0, :], g[:, :, :, 1, :]
    g = kv_l[rows].reshape(B, T, 2, Hkv, D)
    return g[:, :, 0], g[:, :, 1]


def _masked_softmax(scores: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    scores = jnp.where(mask, scores, NEG_INF)
    scores = scores - jnp.max(scores, axis=-1, keepdims=True)
    probs = jnp.exp(scores)
    denom = jnp.sum(probs, axis=-1, keepdims=True)
    return probs / jnp.maximum(denom, 1e-30)


def ref_attention(
    layer_idx: int,
    q: jnp.ndarray,  # [B, S, Hq, D]
    k_new: jnp.ndarray,  # [B, S, Hkv, D]
    v_new: jnp.ndarray,
    kv_l: jnp.ndarray,  # [slots+1, Hkv*2*D]
    meta: AttnMeta,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact paged attention with fully materialized scores."""
    B, S, Hq, D = q.shape
    Hkv = k_new.shape[2]
    G = Hq // Hkv
    scale = D ** -0.5

    kv_l = write_kv(k_new, v_new, kv_l, meta.out_loc)
    k_g, v_g = gather_kv(kv_l, meta.kv_rows, Hkv, D)
    T = meta.kv_rows.shape[1]

    qg = q.reshape(B, S, Hkv, G, D).astype(jnp.float32)
    scores = jnp.einsum("bskgd,btkd->bkgst", qg, k_g.astype(jnp.float32)) * scale

    t_idx = jnp.arange(T, dtype=jnp.int32)
    # kv position t is valid if it exists (t < seq_len) and is causally visible.
    mask = (t_idx[None, None, :] <= meta.positions[:, :, None]) & (
        t_idx[None, None, :] < meta.seq_lens[:, None, None]
    )  # [B, S, T]
    probs = _masked_softmax(scores, mask[:, None, None, :, :])

    out = jnp.einsum("bkgst,btkd->bskgd", probs, v_g.astype(jnp.float32))
    return out.reshape(B, S, Hq, D).astype(q.dtype), kv_l


def chunked_attention(
    layer_idx: int,
    q: jnp.ndarray,
    k_new: jnp.ndarray,
    v_new: jnp.ndarray,
    kv_l: jnp.ndarray,
    meta: AttnMeta,
    q_chunk: int = 256,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Paged attention with scores materialized one q-chunk at a time
    ([B, Hq, q_chunk, T] instead of [B, Hq, S, T]). Decode (S == 1) and short
    prefills fall through to the exact path."""
    B, S, Hq, D = q.shape
    if S <= q_chunk:
        return ref_attention(layer_idx, q, k_new, v_new, kv_l, meta)

    assert S % q_chunk == 0, (S, q_chunk)
    Hkv = k_new.shape[2]
    G = Hq // Hkv
    scale = D ** -0.5

    kv_l = write_kv(k_new, v_new, kv_l, meta.out_loc)
    k_g, v_g = gather_kv(kv_l, meta.kv_rows, Hkv, D)
    k_g = k_g.astype(jnp.float32)
    v_g = v_g.astype(jnp.float32)
    T = meta.kv_rows.shape[1]
    t_idx = jnp.arange(T, dtype=jnp.int32)
    kv_valid = t_idx[None, :] < meta.seq_lens[:, None]  # [B, T]

    n_chunks = S // q_chunk
    q_chunks = q.reshape(B, n_chunks, q_chunk, Hkv, G, D).astype(jnp.float32)
    pos_chunks = meta.positions.reshape(B, n_chunks, q_chunk)

    def body(carry, xs):
        qc, posc = xs  # [B, C, Hkv, G, D], [B, C]
        scores = jnp.einsum("bckgd,btkd->bkgct", qc, k_g) * scale
        mask = (t_idx[None, None, :] <= posc[:, :, None]) & kv_valid[:, None, :]
        probs = _masked_softmax(scores, mask[:, None, None, :, :])
        out = jnp.einsum("bkgct,btkd->bckgd", probs, v_g)
        return carry, out

    _, outs = jax.lax.scan(
        body,
        None,
        (
            jnp.moveaxis(q_chunks, 1, 0),   # [n, B, C, Hkv, G, D]
            jnp.moveaxis(pos_chunks, 1, 0),
        ),
    )
    out = jnp.moveaxis(outs, 0, 1).reshape(B, S, Hq, D)
    return out.astype(q.dtype), kv_l


def extend_attention(
    layer_idx: int,
    q: jnp.ndarray,      # [B, S, Hq, D]
    k_new: jnp.ndarray,  # [B, S, Hkv, D]
    v_new: jnp.ndarray,
    kv_l,
    meta: AttnMeta,
    q_chunk: int = 256,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched prefill (extend) attention: causal self-attention over the
    packed new tokens plus, when `meta.prefix_rows` is set, attention over
    the gathered cached-prefix KV.

    This is the prefill counterpart of the reference's prefix+causal mask
    (/root/reference/attn_backend.py:34-110), batched and — unlike
    ref/chunked_attention — it never gathers the tokens written THIS step
    back out of the pool: the self part of the scores uses k_new/v_new
    directly. That removes the slow XLA row-gather (measured 18.7 GB/s on
    v5e) from the no-prefix prefill hot path entirely, and for int8 KV pools
    the fresh tokens skip the quantization round-trip (strictly more exact).
    The pool is still updated for later decode steps.

    Masking per row b, query i (row-relative), key j:
      self part:   j <= i  and  j < ext_lens[b]
      prefix part: t < prefix_lens[b]
    Padding rows have ext_lens == 0 -> fully masked -> output 0 rows (their
    out_loc is the dummy slot, so the garbage never lands anywhere real).
    """
    B, S, Hq, D = q.shape
    Hkv = k_new.shape[2]
    G = Hq // Hkv
    scale = D ** -0.5

    kv_l = write_kv(k_new, v_new, kv_l, meta.out_loc)

    # Matmuls run in the activation dtype with f32 scores/accumulation
    # (preferred_element_type): on TPU an explicit f32 cast here forced the
    # MXU onto its ~4x slower f32 path for the whole prefill.
    k_self = k_new
    v_self = v_new
    j_idx = jnp.arange(S, dtype=jnp.int32)
    self_valid = j_idx[None, :] < meta.ext_lens[:, None]  # [B, S]

    has_prefix = meta.prefix_rows is not None
    if has_prefix:
        k_p, v_p = gather_kv(kv_l, meta.prefix_rows, Hkv, D)  # [B, Tp, Hkv, D]
        k_p = k_p.astype(q.dtype)
        v_p = v_p.astype(q.dtype)
        Tp = meta.prefix_rows.shape[1]
        t_idx = jnp.arange(Tp, dtype=jnp.int32)
        prefix_valid = t_idx[None, :] < meta.prefix_lens[:, None]  # [B, Tp]

    def block(qc, i_base):
        """One q chunk: qc [B, C, Hkv, G, D], queries at row-relative
        positions i_base + [0, C)."""
        C = qc.shape[1]
        i_idx = i_base + jnp.arange(C, dtype=jnp.int32)  # [C]
        sc_self = jnp.einsum(
            "bckgd,bjkd->bkgcj", qc, k_self, preferred_element_type=jnp.float32
        ) * scale  # [B, Hkv, G, C, S]
        m_self = (j_idx[None, None, :] <= i_idx[None, :, None]) & self_valid[
            :, None, :
        ]  # [B, C, S]
        if has_prefix:
            sc_p = jnp.einsum(
                "bckgd,btkd->bkgct", qc, k_p, preferred_element_type=jnp.float32
            ) * scale  # [B, Hkv, G, C, Tp]
            scores = jnp.concatenate([sc_p, sc_self], axis=-1)
            mask = jnp.concatenate(
                [jnp.broadcast_to(prefix_valid[:, None, :], (B, C, Tp)), m_self],
                axis=-1,
            )
            vals = jnp.concatenate([v_p, v_self], axis=1)  # [B, Tp+S, Hkv, D]
        else:
            scores, mask, vals = sc_self, m_self, v_self
        probs = _masked_softmax(scores, mask[:, None, None, :, :])
        # probs in the value dtype keeps the PV matmul on the fast MXU path
        # (a f32 x bf16 dot promotes to f32 x f32).
        return jnp.einsum(
            "bkgct,btkd->bckgd", probs.astype(vals.dtype), vals,
            preferred_element_type=jnp.float32,
        )

    qf = q.reshape(B, S, Hkv, G, D)
    if S <= q_chunk:
        out = block(qf, 0)
    else:
        assert S % q_chunk == 0, (S, q_chunk)
        n = S // q_chunk
        qc = jnp.moveaxis(qf.reshape(B, n, q_chunk, Hkv, G, D), 1, 0)

        def body(_, xs):
            qi, base = xs
            return None, block(qi, base)

        _, outs = jax.lax.scan(
            body, None, (qc, jnp.arange(n, dtype=jnp.int32) * q_chunk)
        )
        out = jnp.moveaxis(outs, 0, 1)
    return out.reshape(B, S, Hq, D).astype(q.dtype), kv_l
