"""Fused, batched on-device sampling.

Replaces the reference's per-request host loop with `.item()` syncs
(/root/reference/scheduler.py:509-546, sample.py:40-90) with one jitted
computation over the whole batch:

- repetition penalty via a per-request presence matrix maintained on device
  (the reference rebuilds unique prev-id lists on host each step,
  sample.py:19-37),
- temperature, per-request top-k and top-p with the same semantics as
  sample.py:56-90 (greedy argmax when do_sample is False; top-p keeps the
  inclusive-cumsum prefix plus at least one token),
- Gumbel/categorical sampling with jax.random.

Top-k/top-p operate inside the top `k_cap` logits (lax.top_k) instead of a
full 152k-wide sort — exact whenever top_k <= k_cap, and the truncated tail
mass is negligible for top-p. Tests use k_cap == vocab for exactness.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e30


class SamplingArrays(NamedTuple):
    """Per-request sampling knobs as device arrays [B]."""

    temperature: jnp.ndarray  # f32
    top_k: jnp.ndarray        # i32; 0 = disabled
    top_p: jnp.ndarray        # f32; 1.0 = disabled
    do_sample: jnp.ndarray    # bool
    penalty: jnp.ndarray      # f32; 1.0 = disabled

    @staticmethod
    def full(B: int, temperature=1.0, top_k=0, top_p=1.0, do_sample=False,
             penalty=1.0) -> "SamplingArrays":
        return SamplingArrays(
            temperature=jnp.full((B,), temperature, jnp.float32),
            top_k=jnp.full((B,), top_k, jnp.int32),
            top_p=jnp.full((B,), top_p, jnp.float32),
            do_sample=jnp.full((B,), do_sample, jnp.bool_),
            penalty=jnp.full((B,), penalty, jnp.float32),
        )


def apply_repetition_penalty(
    logits: jnp.ndarray,  # [B, V] f32
    presence: jnp.ndarray,  # [B, V] bool — ids previously generated
    penalty: jnp.ndarray,  # [B]
) -> jnp.ndarray:
    """sample.py:19-37 semantics: divide positive logits, multiply negative."""
    p = penalty[:, None]
    penalized = jnp.where(logits > 0, logits / p, logits * p)
    return jnp.where(presence & (p > 1.0), penalized, logits)


def sample_tokens_simple(
    key: jax.Array,
    logits: jnp.ndarray,  # [B, V] f32
    samp: SamplingArrays,
) -> jnp.ndarray:
    """Fast path when no request in the batch uses top-k/top-p/penalty:
    plain temperature categorical + greedy blend. Skips the [B, V] top_k
    selection and the presence matrix entirely (the scheduler selects this
    variant statically per batch)."""
    temp = jnp.where(samp.temperature <= 0, 1.0, samp.temperature)
    sampled = jax.random.categorical(key, logits / temp[:, None], axis=-1)
    greedy = jnp.argmax(logits, axis=-1)
    return jnp.where(samp.do_sample, sampled, greedy).astype(jnp.int32)


def sample_tokens(
    key: jax.Array,
    logits: jnp.ndarray,  # [B, V] f32
    samp: SamplingArrays,
    presence: Optional[jnp.ndarray] = None,  # [B, V] bool
    constraint_mask: Optional[jnp.ndarray] = None,  # [B, V] additive (0 / -inf)
    k_cap: int = 1024,
) -> jnp.ndarray:
    """Returns next token ids [B] int32."""
    B, V = logits.shape
    k_cap = min(k_cap, V)

    if presence is not None:
        logits = apply_repetition_penalty(logits, presence, samp.penalty)
    if constraint_mask is not None:
        logits = logits + constraint_mask

    temp = jnp.where(samp.temperature <= 0, 1.0, samp.temperature)
    scaled = logits / temp[:, None]

    top_vals, top_idx = jax.lax.top_k(scaled, k_cap)  # [B, K] desc

    # Per-request top-k threshold: value at rank min(top_k, K) - 1.
    k_pos = jnp.clip(samp.top_k, 1, k_cap) - 1  # [B]
    kth_val = jnp.take_along_axis(top_vals, k_pos[:, None], axis=1)  # [B, 1]
    kth_val = jnp.where((samp.top_k > 0)[:, None], kth_val, NEG_INF)
    k_filtered = jnp.where(top_vals >= kth_val, top_vals, NEG_INF)

    # Per-request top-p over the top-k-renormalized distribution, keeping the
    # inclusive-cumsum prefix and always >= 1 token (sample.py:65-86: top-k
    # filter first, then cutoff = cumsum > top_p with cutoff[0] forced False).
    probs = jax.nn.softmax(k_filtered, axis=-1)
    cumsum = jnp.cumsum(probs, axis=-1)
    keep = (cumsum <= samp.top_p[:, None]) | (
        jnp.arange(k_cap, dtype=jnp.int32)[None, :] == 0
    )
    last_kept = jnp.sum(keep.astype(jnp.int32), axis=-1) - 1  # [B]
    pth_val = jnp.take_along_axis(k_filtered, last_kept[:, None], axis=1)
    pth_val = jnp.where((samp.top_p < 1.0)[:, None], pth_val, NEG_INF)

    threshold = jnp.maximum(kth_val, pth_val)
    filtered = jnp.where(top_vals >= threshold, top_vals, NEG_INF)

    sampled_pos = jax.random.categorical(key, filtered, axis=-1)  # [B]
    sampled_id = jnp.take_along_axis(top_idx, sampled_pos[:, None], axis=1)[:, 0]

    greedy_id = top_idx[:, 0]
    return jnp.where(samp.do_sample, sampled_id, greedy_id).astype(jnp.int32)
