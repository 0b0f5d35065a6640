"""Jitted prefill/decode step functions.

These are the only places host and device meet on the hot path. Each step is a
single donated-state XLA program: page-table update, model forward (with KV
scatter inside attention), last-token logits, and fused sampling — replacing
the reference's step pipeline of separate model forward + host-side sampling
loop + `.item()` syncs (/root/reference/scheduler.py:151-163, 509-546).

Shapes are bucketed by the caller (tpusgl/utils/bucketing.py); jit caches one
executable per (batch_bucket, kv_len_bucket). `state` is donated so KV
scatters and page-table writes happen in place.

Decode input ids are gathered on device from `state.last_token`, which is how
the overlap schedule works without threads: the host can submit step N+1
before it has seen step N's token (cf. overlap_worker.py's negative-id future
map, /root/reference/overlap_worker.py:65-96).
"""

from __future__ import annotations

import functools
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from tpusgl.config import EngineConfig, ModelConfig
from tpusgl.models import qwen2
from tpusgl.ops.attention import AttnMeta, chunked_attention
from tpusgl.ops.sampling import SamplingArrays, sample_tokens, sample_tokens_simple
from tpusgl.runtime.state import EngineState


class StepFunctions:
    """Builds and caches the jitted step executables for one model."""

    def __init__(
        self,
        params,
        model_cfg: ModelConfig,
        engine_cfg: EngineConfig,
        attn_impl: Callable = chunked_attention,
        sample_k_cap: int = 1024,
        unroll_layers: Optional[bool] = None,
    ):
        self.params = params
        self.model_cfg = model_cfg
        self.engine_cfg = engine_cfg
        self.attn_impl = attn_impl
        self.sample_k_cap = min(sample_k_cap, model_cfg.vocab_size)
        self.unroll_layers = (
            engine_cfg.unroll_layers if unroll_layers is None else unroll_layers
        )
        self._decode_jit = {}
        self._prefill_jit = {}

    # ------------------------------------------------------------------ decode

    def make_decode_fn(self, kv_len: int, simple: bool = False):
        """The raw (unjitted) decode step — also used by __graft_entry__ for
        driver compile checks. `simple` selects the fast sampling path (no
        top-k/top-p/penalty anywhere in the batch)."""
        cfg = self.model_cfg

        def decode_step(
            params,
            state: EngineState,
            req_indices: jnp.ndarray,  # [B] i32 (padding rows == max_requests)
            seq_lens: jnp.ndarray,     # [B] i32, already advanced (+1)
            out_loc: jnp.ndarray,      # [B] i32 KV slot for the new token
            samp: SamplingArrays,
            cmask: Optional[jnp.ndarray],  # [B, V] additive or None
        ) -> Tuple[EngineState, jnp.ndarray]:
            B = req_indices.shape[0]
            rt = state.req_to_token.at[req_indices, seq_lens - 1].set(out_loc)
            input_ids = state.last_token[req_indices][:, None]
            kv_rows = rt[req_indices, :kv_len]
            positions = (seq_lens - 1)[:, None]
            meta = AttnMeta(
                kv_rows=kv_rows,
                seq_lens=seq_lens,
                ext_lens=jnp.ones((B,), jnp.int32),
                positions=positions,
                out_loc=out_loc[:, None],
            )
            last_hidden, kv = qwen2.forward(
                params, cfg, input_ids, meta, state.kv,
                attn_impl=self.attn_impl,
            )
            logits = qwen2.lm_head_logits(params, cfg, last_hidden)

            rng, sub = jax.random.split(state.rng)
            if simple:
                next_ids = sample_tokens_simple(sub, logits, samp)
                presence = state.presence
            else:
                presence_rows = state.presence[req_indices]
                next_ids = sample_tokens(
                    sub, logits, samp, presence_rows, cmask,
                    k_cap=self.sample_k_cap,
                )
                presence = state.presence.at[req_indices, next_ids].set(True)
            last_token = state.last_token.at[req_indices].set(next_ids)
            new_state = state._replace(
                kv=kv, req_to_token=rt,
                last_token=last_token, presence=presence, rng=rng,
            )
            return new_state, next_ids

        return decode_step

    def decode_with_kv_len(
        self, kv_len: int, state, req_indices, seq_lens, out_loc, samp,
        cmask=None, simple: bool = False,
    ) -> Tuple[EngineState, jnp.ndarray]:
        simple = simple and cmask is None
        key = (int(req_indices.shape[0]), kv_len, cmask is not None, simple)
        fn = self._decode_jit.get(key)
        if fn is None:
            fn = jax.jit(self.make_decode_fn(kv_len, simple), donate_argnums=(1,))
            self._decode_jit[key] = fn
        return fn(self.params, state, req_indices, seq_lens, out_loc, samp, cmask)

    # -------------------------------------------------- multi-step decode

    def make_decode_multi_fn(self, kv_len: int, window: int, simple: bool = False):
        """K decode iterations in one program: host dispatch cost is paid once
        per K tokens instead of per token. Inputs of step k+1 come from the
        in-graph last_token buffer; page-table entries for all K positions
        are written as the program progresses. Returns tokens [K, B].

        The window is python-unrolled rather than lax.scan: each step's KV
        scatter then updates a dead buffer in place, and (observed on the
        remote TPU toolchain) unrolled programs both compile ~50x faster and
        avoid scan-carry copies of the multi-GB KV pool."""
        cfg = self.model_cfg

        def decode_multi(
            params,
            state: EngineState,
            req_indices: jnp.ndarray,  # [B] i32 (padding rows == max_requests)
            seq_lens0: jnp.ndarray,    # [B] i32 length incl. first new token
            out_loc: jnp.ndarray,      # [B, K] i32 slots for the K new tokens
            samp: SamplingArrays,
        ) -> Tuple[EngineState, jnp.ndarray]:
            B = req_indices.shape[0]
            kv = state.kv
            rt, last_token = state.req_to_token, state.last_token
            presence, rng = state.presence, state.rng

            tokens = []
            for k in range(window):
                seq_lens = seq_lens0 + k
                loc_k = out_loc[:, k]
                rt = rt.at[req_indices, seq_lens - 1].set(loc_k)
                input_ids = last_token[req_indices][:, None]
                meta = AttnMeta(
                    kv_rows=rt[req_indices, :kv_len],
                    seq_lens=seq_lens,
                    ext_lens=jnp.ones((B,), jnp.int32),
                    positions=(seq_lens - 1)[:, None],
                    out_loc=loc_k[:, None],
                )
                last_hidden, kv = qwen2.forward(
                    params, cfg, input_ids, meta, kv,
                    attn_impl=self.attn_impl,
                )
                logits = qwen2.lm_head_logits(params, cfg, last_hidden)
                rng, sub = jax.random.split(rng)
                if simple:
                    next_ids = sample_tokens_simple(sub, logits, samp)
                else:
                    next_ids = sample_tokens(
                        sub, logits, samp, presence[req_indices], None,
                        k_cap=self.sample_k_cap,
                    )
                    presence = presence.at[req_indices, next_ids].set(True)
                last_token = last_token.at[req_indices].set(next_ids)
                tokens.append(next_ids)

            new_state = state._replace(
                kv=kv, req_to_token=rt,
                last_token=last_token, presence=presence, rng=rng,
            )
            return new_state, jnp.stack(tokens)  # [K, B]

        return decode_multi

    def decode_multi(
        self, kv_len: int, window: int, state, req_indices, seq_lens0, out_loc,
        samp, simple: bool = False,
    ) -> Tuple[EngineState, jnp.ndarray]:
        key = ("multi", int(req_indices.shape[0]), kv_len, window, simple)
        fn = self._decode_jit.get(key)
        if fn is None:
            fn = jax.jit(
                self.make_decode_multi_fn(kv_len, window, simple),
                donate_argnums=(1,),
            )
            self._decode_jit[key] = fn
        return fn(self.params, state, req_indices, seq_lens0, out_loc, samp)

    # ----------------------------------------------------- table maintenance

    def write_table_row(self, state: EngineState, req_idx, row) -> EngineState:
        """Re-sync one device page-table row from the host mirror (used when
        cache_unfinished_req swaps slots to canonical tree copies,
        cf. radix_cache.py:195-199)."""
        fn = getattr(self, "_write_row_jit", None)
        if fn is None:
            def f(state, req_idx, row):
                return state._replace(
                    req_to_token=state.req_to_token.at[req_idx].set(row)
                )
            fn = self._write_row_jit = jax.jit(f, donate_argnums=(0,))
        return fn(state, jnp.asarray(req_idx), jnp.asarray(row))

    # ----------------------------------------------------------------- prefill

    def make_prefill_fn(self, kv_len: int, simple: bool = False):
        """The raw (unjitted) prefill step."""
        cfg = self.model_cfg

        def prefill_step(
            params,
            state: EngineState,
            req_idx: jnp.ndarray,      # [1] i32
            input_ids: jnp.ndarray,    # [1, S] i32 (padded)
            table_row: jnp.ndarray,    # [1, C] i32 full page-table row
            seq_len: jnp.ndarray,      # [1] i32 total logical len
            prefix_len: jnp.ndarray,   # [1] i32 cached prefix length
            out_loc: jnp.ndarray,      # [1, S] i32 (0 on padding)
            samp: SamplingArrays,      # [1]
            penalty_ids: jnp.ndarray,  # [1, Kp] i32 prior output ids (pad = V)
            cmask: Optional[jnp.ndarray],
        ) -> Tuple[EngineState, jnp.ndarray]:
            rt = state.req_to_token.at[req_idx[0]].set(table_row[0])
            S = input_ids.shape[1]
            positions = prefix_len[:, None] + jnp.arange(S, dtype=jnp.int32)[None, :]
            positions = jnp.minimum(positions, cfg.max_position_embeddings - 1)
            ext_len = seq_len - prefix_len
            meta = AttnMeta(
                kv_rows=table_row[:, :kv_len],
                seq_lens=seq_len,
                ext_lens=ext_len,
                positions=positions,
                out_loc=out_loc,
            )
            last_hidden, kv = qwen2.forward(
                params, cfg, input_ids, meta, state.kv,
                attn_impl=self.attn_impl,
            )
            logits = qwen2.lm_head_logits(params, cfg, last_hidden)

            rng, sub = jax.random.split(state.rng)
            if simple:
                next_ids = sample_tokens_simple(sub, logits, samp)
                presence = state.presence
            else:
                presence_row = (
                    jnp.zeros((1, cfg.vocab_size), jnp.bool_)
                    .at[0, penalty_ids[0]]
                    .set(True, mode="drop")
                )
                next_ids = sample_tokens(
                    sub, logits, samp, presence_row, cmask,
                    k_cap=self.sample_k_cap,
                )
                presence = state.presence.at[req_idx[0]].set(presence_row[0])
                presence = presence.at[req_idx[0], next_ids[0]].set(True)
            last_token = state.last_token.at[req_idx[0]].set(next_ids[0])
            new_state = state._replace(
                kv=kv, req_to_token=rt,
                last_token=last_token, presence=presence, rng=rng,
            )
            return new_state, next_ids

        return prefill_step

    def prefill(
        self, seq_bucket: int, kv_len: int, state, req_idx, input_ids, table_row,
        seq_len, prefix_len, out_loc, samp, penalty_ids, cmask=None,
        simple: bool = False,
    ) -> Tuple[EngineState, jnp.ndarray]:
        simple = simple and cmask is None
        key = (seq_bucket, kv_len, cmask is not None, simple)
        fn = self._prefill_jit.get(key)
        if fn is None:
            fn = jax.jit(self.make_prefill_fn(kv_len, simple), donate_argnums=(1,))
            self._prefill_jit[key] = fn
        return fn(
            self.params, state, req_idx, input_ids, table_row, seq_len,
            prefix_len, out_loc, samp, penalty_ids, cmask,
        )
