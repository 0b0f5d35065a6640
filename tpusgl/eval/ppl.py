"""Perplexity harness — the INT8/INT4 acceptance gate (BASELINE.md:
PPL delta vs bf16 <= 0.1 at INT8, <= 0.3 at INT4).

Evaluates windows of tokens with the standard sliding-window protocol
(window length S, NLL over positions 1..S-1). WikiText-2 cannot be
downloaded in this zero-egress environment; `load_corpus` accepts any local
text file + tokenizer, and `synthetic_corpus` falls back to model-generated
text (sampled from the bf16 model itself, which has model-typical statistics
— quantization damage measured on it is representative).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from tpusgl.config import ModelConfig
from tpusgl.models import get_model
from tpusgl.ops.attention import AttnMeta, chunked_attention


def _window_nll_fn(cfg: ModelConfig, B: int, S: int, attn_impl):
    """Jitted sum-NLL over one dense batch of windows [B, S]."""

    def fn(params, ids):
        from tpusgl.ops.attention import make_kv_pool

        L, Hkv, D = cfg.num_hidden_layers, cfg.num_key_value_heads, cfg.head_dim
        slots = B * S
        kv = make_kv_pool(L, slots, Hkv, D, jnp.bfloat16)
        rows = 1 + (
            jnp.arange(B, dtype=jnp.int32)[:, None] * S
            + jnp.arange(S, dtype=jnp.int32)[None, :]
        )
        meta = AttnMeta(
            kv_rows=rows,
            seq_lens=jnp.full((B,), S, jnp.int32),
            ext_lens=jnp.full((B,), S, jnp.int32),
            positions=jnp.tile(jnp.arange(S, dtype=jnp.int32)[None], (B, 1)),
            out_loc=rows,
        )
        model = get_model(cfg.architecture)
        hidden, _ = model.forward_hidden(
            params, cfg, ids, meta, kv, attn_impl=attn_impl
        )
        logits = model.lm_head_logits(params, cfg, hidden)  # [B, S, V] f32
        logp = jax.nn.log_softmax(logits[:, :-1], axis=-1)
        tgt = ids[:, 1:]
        nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
        return jnp.sum(nll), (S - 1) * B

    return jax.jit(fn)


def compute_ppl(
    params,
    cfg: ModelConfig,
    windows: np.ndarray,  # [N, S] int32
    batch_size: int = 4,
    attn_impl=chunked_attention,
) -> float:
    N, S = windows.shape
    assert N > 0, "compute_ppl needs at least one window"
    # Every window is scored: the final partial batch runs through a
    # tail-sized program. (An earlier version dropped the N % batch_size
    # tail — and with N < batch_size scored NOTHING, returning PPL 1.0 and
    # passing the quantization gate vacuously.)
    fns = {}
    total, count = 0.0, 0
    for start in range(0, N, batch_size):
        chunk = windows[start : start + batch_size]
        B = chunk.shape[0]
        if B not in fns:
            fns[B] = _window_nll_fn(cfg, B, S, attn_impl)
        nll, n = fns[B](params, jnp.asarray(chunk, jnp.int32))
        total += float(nll)
        count += int(n)
    assert count > 0
    return float(np.exp(total / count))


def load_corpus(path: str, tokenizer, window: int = 512, limit: Optional[int] = None) -> np.ndarray:
    """Tokenize a local text file into non-overlapping eval windows."""
    with open(path) as f:
        text = f.read()
    ids = tokenizer(text, add_special_tokens=False)["input_ids"]
    n = len(ids) // window
    if limit:
        n = min(n, limit)
    return np.asarray(ids[: n * window], np.int32).reshape(n, window)


def synthetic_corpus(
    engine, num_windows: int = 8, window: int = 256, seed: int = 0
) -> np.ndarray:
    """Model-generated eval windows (zero-egress fallback for WikiText-2)."""
    from tpusgl.runtime.sampling_params import SamplingParams

    rng = np.random.default_rng(seed)
    vocab = engine.model_cfg.vocab_size
    prompts = [rng.integers(0, vocab, 8).tolist() for _ in range(num_windows)]
    sp = SamplingParams(
        max_new_tokens=window - 8, temperature=1.0, do_sample=True, eos_id=-1
    )
    outs = engine.scheduler.run_batch(prompts, sp)
    engine.reset()
    rows = [p + o for p, o in zip(prompts, outs)]
    short = min(len(r) for r in rows)
    if short < window:
        # A context-window clamp can cap generation below the target; keep
        # rows rectangular (ragged lists crash np.asarray) at the common
        # length rather than crashing the zero-egress fallback.
        rows = [r[:short] for r in rows]
    return np.asarray(rows, np.int32)
