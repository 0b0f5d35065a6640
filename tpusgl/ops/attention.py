"""Paged attention over a token-granular KV pool — jnp reference path.

Replaces the reference's per-request Python attention loop
(/root/reference/attn_backend.py:34-149) with fully batched, static-shape
computation:

- KV for the new tokens is scattered into the pool first, then attention reads
  back through the page table (same ordering as attn_backend.py:20-23).
- The page-table gather (attn_backend.py:55-59, 122-128) becomes one batched
  `kv_cache[layer, rows]` gather over [B, S_kv] slot ids.
- GQA repeat_interleave (attn_backend.py:63-66) becomes a head-group reshape;
  no data duplication.
- The per-request prefix+causal mask (attn_backend.py:74-92) becomes a single
  broadcasted comparison against positions/seq_lens.

`ref_attention` materializes full scores (exact; used for tests and tiny
shapes). `chunked_attention` is the production jnp path: an online-softmax
scan over query chunks that bounds score materialization, flash-attention
style. Both are drop-in `attn_impl`s for models.qwen2.forward; the Pallas
kernels (tpusgl/ops/paged_attention.py) replace them on the decode hot path.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1e30


class AttnMeta(NamedTuple):
    """Static-shape batch metadata threaded through the model.

    TPU-native analogue of the reference's SimplifiedForwardBatch
    (/root/reference/forward_batch.py:8-84).
    """

    kv_rows: jnp.ndarray    # [B, S_kv] int32 — KV slot id per logical position
    seq_lens: jnp.ndarray   # [B] int32 — total logical length incl. new tokens
    ext_lens: jnp.ndarray   # [B] int32 — number of new (non-cached) tokens, <= S
    positions: jnp.ndarray  # [B, S] int32 — logical position of each new token
    out_loc: jnp.ndarray    # [B, S] int32 — KV slot for each new token (0 = dummy)


def write_kv(
    layer_idx: jnp.ndarray,
    k_new: jnp.ndarray,  # [B, S, Hkv, D]
    v_new: jnp.ndarray,
    kv_k: jnp.ndarray,  # [L, num_slots+1, Hkv, D]
    kv_v: jnp.ndarray,
    out_loc: jnp.ndarray,  # [B, S]
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Scatter new K/V into the pool (attn_backend.py:20-23 / memory_pool.py:152-171).

    Padding tokens carry slot 0 — the reserved dummy row
    (memory_pool.py:82-84) — so no masking is needed.
    """
    B, S, Hkv, D = k_new.shape
    flat_loc = out_loc.reshape(-1)
    kv_k = kv_k.at[layer_idx, flat_loc].set(
        k_new.reshape(-1, Hkv, D).astype(kv_k.dtype), mode="drop"
    )
    kv_v = kv_v.at[layer_idx, flat_loc].set(
        v_new.reshape(-1, Hkv, D).astype(kv_v.dtype), mode="drop"
    )
    return kv_k, kv_v


def _masked_softmax(scores: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    scores = jnp.where(mask, scores, NEG_INF)
    scores = scores - jnp.max(scores, axis=-1, keepdims=True)
    probs = jnp.exp(scores)
    denom = jnp.sum(probs, axis=-1, keepdims=True)
    return probs / jnp.maximum(denom, 1e-30)


def ref_attention(
    layer_idx: jnp.ndarray,
    q: jnp.ndarray,  # [B, S, Hq, D]
    k_new: jnp.ndarray,  # [B, S, Hkv, D]
    v_new: jnp.ndarray,
    kv_k: jnp.ndarray,  # [L, num_slots+1, Hkv, D]
    kv_v: jnp.ndarray,
    meta: AttnMeta,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Exact paged attention with fully materialized scores."""
    B, S, Hq, D = q.shape
    Hkv = k_new.shape[2]
    G = Hq // Hkv
    scale = D ** -0.5

    kv_k, kv_v = write_kv(layer_idx, k_new, v_new, kv_k, kv_v, meta.out_loc)

    k_g = kv_k[layer_idx][meta.kv_rows]  # [B, T, Hkv, D]
    v_g = kv_v[layer_idx][meta.kv_rows]
    T = k_g.shape[1]

    qg = q.reshape(B, S, Hkv, G, D).astype(jnp.float32)
    scores = jnp.einsum("bskgd,btkd->bkgst", qg, k_g.astype(jnp.float32)) * scale

    t_idx = jnp.arange(T, dtype=jnp.int32)
    # kv position t is valid if it exists (t < seq_len) and is causally visible.
    mask = (t_idx[None, None, :] <= meta.positions[:, :, None]) & (
        t_idx[None, None, :] < meta.seq_lens[:, None, None]
    )  # [B, S, T]
    probs = _masked_softmax(scores, mask[:, None, None, :, :])

    out = jnp.einsum("bkgst,btkd->bskgd", probs, v_g.astype(jnp.float32))
    return out.reshape(B, S, Hq, D).astype(q.dtype), kv_k, kv_v


def chunked_attention(
    layer_idx: jnp.ndarray,
    q: jnp.ndarray,
    k_new: jnp.ndarray,
    v_new: jnp.ndarray,
    kv_k: jnp.ndarray,
    kv_v: jnp.ndarray,
    meta: AttnMeta,
    q_chunk: int = 256,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Online-softmax paged attention: scores materialized one q-chunk at a
    time ([B, Hq, q_chunk, T] instead of [B, Hq, S, T]). Decode (S == 1) and
    short prefills fall through to the exact path."""
    B, S, Hq, D = q.shape
    if S <= q_chunk:
        return ref_attention(layer_idx, q, k_new, v_new, kv_k, kv_v, meta)

    assert S % q_chunk == 0, (S, q_chunk)
    Hkv = k_new.shape[2]
    G = Hq // Hkv
    scale = D ** -0.5

    kv_k, kv_v = write_kv(layer_idx, k_new, v_new, kv_k, kv_v, meta.out_loc)

    k_g = kv_k[layer_idx][meta.kv_rows].astype(jnp.float32)  # [B, T, Hkv, D]
    v_g = kv_v[layer_idx][meta.kv_rows].astype(jnp.float32)
    T = k_g.shape[1]
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
    return out.astype(q.dtype), kv_k, kv_v
