"""Jitted prefill/decode step functions.

These are the only places host and device meet on the hot path. Each step is a
single donated-state XLA program: model forward (with KV scatter inside
attention), last-token logits, and fused sampling — replacing the reference's
step pipeline of separate model forward + host-side sampling loop + `.item()`
syncs (/root/reference/scheduler.py:151-163, 509-546).

Page tables are step INPUTS (small int32 arrays built from the host mirror,
tpusgl/runtime/memory_pool.ReqSlotPool), not device state — so there is
nothing to re-sync when the radix cache swaps a request's pages to canonical
tree copies (cf. the reference's device-side index rewrites,
radix_cache.py:195-199).

Shapes are bucketed by the caller (tpusgl/utils/bucketing.py); jit caches one
executable per bucket combination. With the Pallas paged-attention kernel
(`paged_kernel=True`) the decode program reads KV through the page table with
a DYNAMIC per-sequence trip count, so a single decode executable serves every
context length — kv-length bucketing (and its recompiles) exists only on the
jnp fallback path. `state` is donated so KV scatters happen in place.

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
from tpusgl.models import get_model
from tpusgl.ops.attention import AttnMeta, chunked_attention, rows_from_pages
from tpusgl.ops.sampling import SamplingArrays, sample_tokens, sample_tokens_simple
from tpusgl.runtime.state import EngineState


def _zip_kv(state: EngineState):
    """Per-layer KV handle for the model: the raw pool array, or an int8
    (pool, per-token-scale) pair when the KV cache is quantized."""
    if state.kv_scale is None:
        return state.kv
    return tuple(zip(state.kv, state.kv_scale))


def _unzip_kv(kv, quantized: bool):
    if not quantized:
        return kv, None
    return tuple(p[0] for p in kv), tuple(p[1] for p in kv)


class StepFunctions:
    """Builds and caches the jitted step executables for one model."""

    def __init__(
        self,
        params,
        model_cfg: ModelConfig,
        engine_cfg: EngineConfig,
        attn_impl: Callable = chunked_attention,
        sample_k_cap: int = 1024,
        paged_kernel: bool = False,
        mesh=None,
        prefill_impl: Optional[Callable] = None,
    ):
        self.params = params
        self.model_cfg = model_cfg
        self.model = get_model(model_cfg.architecture)
        self.engine_cfg = engine_cfg
        self.attn_impl = attn_impl
        self.sample_k_cap = min(sample_k_cap, model_cfg.vocab_size)
        # True when attn_impl consumes meta.page_tbl directly (Pallas paged
        # kernel); False -> derive token rows for the jnp gather path.
        self.paged_kernel = paged_kernel
        self.mesh = mesh
        self._decode_jit = {}
        self._prefill_jit = {}
        # Built lazily; jax.jit's own shape cache handles the pow2 padded
        # sizes (these were once size-keyed dicts duplicating that cache).
        self._copy_jit = None
        self._extract_jit = None
        self._inject_jit = None

        # Inner pjit around the decoder stack: a decode window calls the
        # forward at `window` identical-aval sites (and every window/sampling
        # program variant shares them) — one cached trace + one lowered
        # shared function instead of re-tracing L layers per site. Same
        # trick as ops/paged_attention._jitted_paged_decode, one level up.
        #
        # With tp > 1 the decoder stack runs under shard_map on LOCAL shards
        # (explicit Megatron TP, models/qwen2._layer): this is what lets the
        # Pallas kernels partition — GSPMD cannot split a pallas_call, but
        # under shard_map each shard runs the kernel on its own kv-heads /
        # weight blocks, with two psums per layer for the row-parallel
        # projections. lm_head + sampling stay outside (GSPMD handles the
        # vocab-sharded logits). Replaces the reference's dead NCCL TP
        # (/root/reference/tp_runtime.py:10-51).
        from tpusgl.ops.attention import extend_attention

        model, cfg = self.model, model_cfg
        tp = 1 if mesh is None else int(mesh.shape["tp"])

        def make_fwd(attn, full_hidden: bool = False):
            # full_hidden=True returns hidden for EVERY position (the
            # speculative-verify step scores all draft positions);
            # otherwise only the last real token's hidden state.
            fwd = model.forward_hidden if full_hidden else model.forward
            # inline=True everywhere below: the wrapper exists to cache ONE
            # trace of the L-layer stack across the window's call sites; a
            # real call boundary made XLA copy the evolving KV pool into the
            # callee's argument slots every call (the whole pool re-copied
            # per iteration — measured as async slice ops in the profile).
            if tp == 1:
                return jax.jit(
                    lambda params, ids, meta, kv: fwd(
                        params, cfg, ids, meta, kv, attn_impl=attn
                    ),
                    inline=True,
                )
            from jax.sharding import PartitionSpec as P

            from tpusgl.parallel.mesh import param_shardings

            assert cfg.num_key_value_heads % tp == 0, (
                "tp must divide kv heads", cfg.num_key_value_heads, tp
            )
            pspecs = jax.tree.map(
                lambda ns: ns.spec, param_shardings(cfg, self.params, mesh)
            )
            # Pool minor dim = whole kv heads per shard; int8 per-token
            # scale pool is ROW-sharded (stacked per-shard blocks,
            # ops/attention.scale_row) — the zipped (pool, scale) pairs
            # need per-leaf specs.
            pool_spec = P(None, "tp")
            if engine_cfg.quant.kv_dtype == "int8":
                kv_spec = tuple(
                    (pool_spec, P("tp", None))
                    for _ in range(cfg.num_hidden_layers)
                )
            else:
                kv_spec = pool_spec
            rep = P()
            return jax.jit(
                jax.shard_map(
                    lambda params, ids, meta, kv: fwd(
                        params, cfg, ids, meta, kv, attn_impl=attn,
                        tp=tp, axis_name="tp",
                    ),
                    mesh=mesh,
                    in_specs=(pspecs, rep, rep, kv_spec),
                    out_specs=(rep, kv_spec),
                    check_vma=False,
                ),
                inline=True,
            )

        self._fwd = make_fwd(attn_impl)
        # Prefill attention: the Pallas flash prefill/extend kernel on the
        # paged-kernel path (tpusgl/ops/prefill_attention.py), the jnp
        # extend_attention elsewhere.
        self._fwd_prefill = make_fwd(prefill_impl or extend_attention)
        # Built on demand (speculative decoding only).
        self._make_fwd = make_fwd
        self._fwd_verify = None
        self._verify_jit = {}

    # -------------------------------------------------------------- page copy

    def _make_copy_jit(self):
        """Jitted whole-page KV copy (sub-page radix reuse,
        scheduler._prefill_rows): for each (src, dst) page pair, copy the
        page's pool rows (and int8 scale rows) src -> dst. Only the matched
        tail rows are meaningful; the rest is overwritten by the prefill's
        own write_kv before any masked read. Padding pairs are (0, 0) —
        the dummy page copied onto itself."""
        P = self.engine_cfg.page_size
        has_scale = self.engine_cfg.quant.kv_dtype == "int8"
        L = self.model_cfg.num_hidden_layers
        mesh = self.mesh

        def body(kv, kv_scale, src, dst):
            off = jnp.arange(P, dtype=jnp.int32)[None, :]
            srows = (src[:, None] * P + off).reshape(-1)
            drows = (dst[:, None] * P + off).reshape(-1)
            kv = list(kv)
            if has_scale:
                scale = list(kv_scale)
                # local rows per page from local shapes (shard-safe)
                R8 = scale[0].shape[0] * P // kv[0].shape[0]
                offs = jnp.arange(R8, dtype=jnp.int32)[None, :]
                ssr = (src[:, None] * R8 + offs).reshape(-1)
                sdr = (dst[:, None] * R8 + offs).reshape(-1)
            for l in range(L):
                kv[l] = kv[l].at[drows].set(kv[l][srows])
                if has_scale:
                    scale[l] = scale[l].at[sdr].set(scale[l][ssr])
            return tuple(kv), tuple(scale) if has_scale else kv_scale

        if mesh is None:
            return jax.jit(body, donate_argnums=(0, 1))

        from jax.sharding import PartitionSpec as Pspec

        pool_spec = tuple(Pspec(None, "tp") for _ in range(L))
        scale_spec = (
            tuple(Pspec("tp", None) for _ in range(L)) if has_scale else None
        )
        rep = Pspec()
        return jax.jit(
            jax.shard_map(
                body, mesh=mesh,
                in_specs=(pool_spec, scale_spec, rep, rep),
                out_specs=(pool_spec, scale_spec),
                check_vma=False,
            ),
            donate_argnums=(0, 1),
        )

    def copy_pages(self, state: EngineState, src_pages, dst_pages) -> EngineState:
        """Copy whole KV pages src -> dst across every layer (+ scale pools).
        Pads the pair list to a pow2 bucket so the executable set stays small."""
        import numpy as np

        n = len(src_pages)
        nb = 1 << (n - 1).bit_length() if n > 1 else 1
        src = np.zeros((nb,), np.int32)
        dst = np.zeros((nb,), np.int32)
        src[:n] = src_pages
        dst[:n] = dst_pages
        if self._copy_jit is None:
            self._copy_jit = self._make_copy_jit()
        kv, kv_scale = self._copy_jit(state.kv, state.kv_scale, src, dst)
        return state._replace(kv=kv, kv_scale=kv_scale)

    # ------------------------------------------------- host-cache page I/O

    def _make_extract_jit(self):
        """Jitted gather of whole pages out of every layer's pool into one
        compact array pair ([n, L, P, W] pool-dtype, [n, L, R8, P] f32 or
        None) — the device side of spilling radix-evicted pages to the host
        KV tier (runtime/host_cache.py). Pure gather: state is NOT donated.

        Under tp the gather runs per shard via shard_map (like
        _make_copy_jit) so R8 derives from LOCAL shapes — the scale pool is
        row-sharded as stacked per-shard blocks, and global-shape row math
        would address the wrong shard's scale rows (ADVICE r3). The gathered
        scale block is shard-stacked [n, L, tp*R8_local, P], matching the
        inject layout below."""
        P = self.engine_cfg.page_size
        has_scale = self.engine_cfg.quant.kv_dtype == "int8"
        L = self.model_cfg.num_hidden_layers
        mesh = self.mesh

        def body(kv, kv_scale, pages):
            off = jnp.arange(P, dtype=jnp.int32)[None, :]
            rows = pages[:, None] * P + off  # [n, P]
            data = jnp.stack([kv[l][rows] for l in range(L)], axis=1)
            sc = None
            if has_scale:
                R8 = kv_scale[0].shape[0] * P // kv[0].shape[0]
                offs = jnp.arange(R8, dtype=jnp.int32)[None, :]
                srows = pages[:, None] * R8 + offs
                sc = jnp.stack(
                    [kv_scale[l][srows] for l in range(L)], axis=1
                )
            return data, sc

        if mesh is None:
            return jax.jit(body)

        from jax.sharding import PartitionSpec as Pspec

        pool_spec = tuple(Pspec(None, "tp") for _ in range(L))
        scale_spec = (
            tuple(Pspec("tp", None) for _ in range(L)) if has_scale else None
        )
        rep = Pspec()
        return jax.jit(
            jax.shard_map(
                body, mesh=mesh,
                in_specs=(pool_spec, scale_spec, rep),
                # data gathers this shard's pool columns; scale this shard's
                # row block — stack both on their sharded axes.
                out_specs=(Pspec(None, None, None, "tp"),
                           Pspec(None, None, "tp", None) if has_scale else rep),
                check_vma=False,
            )
        )

    def _make_inject_jit(self):
        """Jitted scatter of host-reloaded pages back into the pools
        (shard_map under tp — see _make_extract_jit)."""
        P = self.engine_cfg.page_size
        has_scale = self.engine_cfg.quant.kv_dtype == "int8"
        L = self.model_cfg.num_hidden_layers
        mesh = self.mesh

        def body(kv, kv_scale, pages, data, sc):
            off = jnp.arange(P, dtype=jnp.int32)[None, :]
            rows = (pages[:, None] * P + off).reshape(-1)
            kv = list(kv)
            for l in range(L):
                kv[l] = kv[l].at[rows].set(
                    data[:, l].reshape(-1, kv[l].shape[1])
                )
            if has_scale:
                kv_scale = list(kv_scale)
                R8 = kv_scale[0].shape[0] * P // kv[0].shape[0]
                offs = jnp.arange(R8, dtype=jnp.int32)[None, :]
                srows = (pages[:, None] * R8 + offs).reshape(-1)
                for l in range(L):
                    kv_scale[l] = kv_scale[l].at[srows].set(
                        sc[:, l].reshape(-1, kv_scale[l].shape[1])
                    )
                kv_scale = tuple(kv_scale)
            return tuple(kv), kv_scale

        if mesh is None:
            return jax.jit(body, donate_argnums=(0, 1))

        from jax.sharding import PartitionSpec as Pspec

        pool_spec = tuple(Pspec(None, "tp") for _ in range(L))
        scale_spec = (
            tuple(Pspec("tp", None) for _ in range(L)) if has_scale else None
        )
        rep = Pspec()
        return jax.jit(
            jax.shard_map(
                body, mesh=mesh,
                in_specs=(pool_spec, scale_spec, rep,
                          Pspec(None, None, None, "tp"),
                          Pspec(None, None, "tp", None) if has_scale else rep),
                out_specs=(pool_spec, scale_spec),
                check_vma=False,
            ),
            donate_argnums=(0, 1),
        )

    def extract_pages(self, state: EngineState, pages):
        """Gather `pages` (list of page ids) out of the pools ->
        (data [n, L, P, W], scales [n, L, R8, P] or None) device arrays."""
        import numpy as np

        n = len(pages)
        nb = 1 << (n - 1).bit_length() if n > 1 else 1
        arr = np.zeros((nb,), np.int32)
        arr[:n] = pages
        if self._extract_jit is None:
            self._extract_jit = self._make_extract_jit()
        data, sc = self._extract_jit(state.kv, state.kv_scale, arr)
        return data[:n], (sc[:n] if sc is not None else None)

    def inject_pages(self, state: EngineState, pages, data, sc) -> EngineState:
        """Scatter host-reloaded page data into freshly allocated pages."""
        import numpy as np

        n = len(pages)
        nb = 1 << (n - 1).bit_length() if n > 1 else 1
        arr = np.zeros((nb,), np.int32)
        arr[:n] = pages
        data = np.asarray(data)
        if data.shape[0] != nb:
            pad = np.zeros((nb - n,) + data.shape[1:], data.dtype)
            data = np.concatenate([data, pad], axis=0)
        if sc is not None:
            sc = np.asarray(sc)
            if sc.shape[0] != nb:
                pad = np.zeros((nb - n,) + sc.shape[1:], sc.dtype)
                sc = np.concatenate([sc, pad], axis=0)
        if self._inject_jit is None:
            self._inject_jit = self._make_inject_jit()
        kv, kv_scale = self._inject_jit(state.kv, state.kv_scale, arr, data, sc)
        return state._replace(kv=kv, kv_scale=kv_scale)

    def _decode_meta(self, page_tbl, seq_lens, out_loc_step, kv_len: int):
        """AttnMeta for one decode iteration. kv_len only bounds the jnp
        gather; the Pallas kernel's per-sequence loop is dynamic."""
        B = seq_lens.shape[0]
        P = self.engine_cfg.page_size
        kv_rows = None
        if not self.paged_kernel:
            kv_rows = rows_from_pages(page_tbl, kv_len, P)
        return AttnMeta(
            kv_rows=kv_rows,
            seq_lens=seq_lens,
            ext_lens=jnp.ones((B,), jnp.int32),
            positions=(seq_lens - 1)[:, None],
            out_loc=out_loc_step[:, None],
            page_tbl=page_tbl if self.paged_kernel else None,
        )

    # ------------------------------------------------------------------ decode

    def make_decode_fn(self, kv_len: int, window: int, simple: bool = False):
        """The raw (unjitted) decode program covering `window` steps.

        Multi-step windows amortize host dispatch over K tokens: inputs of
        step k+1 come from the in-graph last_token buffer. The window is
        python-unrolled rather than lax.scan: each step's KV scatter then
        updates a dead buffer in place, and (observed on the remote TPU
        toolchain) unrolled programs compile ~50x faster and avoid
        scan-carry copies of the multi-GB KV pool."""
        cfg = self.model_cfg

        def decode_multi(
            params,
            state: EngineState,
            req_indices: jnp.ndarray,  # [B] i32 (padding rows == max_requests)
            seq_lens0: jnp.ndarray,    # [B] i32 length incl. first new token
            out_loc: jnp.ndarray,      # [B, K] i32 slots for the K new tokens
            page_tbl: jnp.ndarray,     # [B, pages_per_seq] i32
            samp: SamplingArrays,
            cmask: Optional[jnp.ndarray],  # [B, V] additive or None (K==1 only)
        ) -> Tuple[EngineState, jnp.ndarray]:
            kv = _zip_kv(state)
            last_token, presence, rng = state.last_token, state.presence, state.rng

            tokens = []
            for k in range(window):
                seq_lens = seq_lens0 + k
                meta = self._decode_meta(page_tbl, seq_lens, out_loc[:, k], kv_len)
                input_ids = last_token[req_indices][:, None]
                last_hidden, kv = self._fwd(params, input_ids, meta, kv)
                logits = self.model.lm_head_logits(params, cfg, last_hidden)
                rng, sub = jax.random.split(rng)
                if simple:
                    next_ids = sample_tokens_simple(sub, logits, samp)
                else:
                    next_ids = sample_tokens(
                        sub, logits, samp, presence[req_indices],
                        cmask if k == 0 else None,
                        k_cap=self.sample_k_cap,
                    )
                    presence = presence.at[req_indices, next_ids].set(True)
                last_token = last_token.at[req_indices].set(next_ids)
                tokens.append(next_ids)

            kv, kv_scale = _unzip_kv(kv, state.kv_scale is not None)
            new_state = state._replace(
                kv=kv, kv_scale=kv_scale, last_token=last_token,
                presence=presence, rng=rng,
            )
            return new_state, jnp.stack(tokens)  # [K, B]

        return decode_multi

    def get_decode_jit(
        self, batch: int, kv_len: int, window: int, has_cmask: bool,
        simple: bool,
    ):
        """The cached jitted decode executable for one shape/flag combo."""
        if self.paged_kernel:
            kv_len = self.engine_cfg.max_context_len  # single executable
        key = (batch, kv_len, window, has_cmask, simple)
        fn = self._decode_jit.get(key)
        if fn is None:
            fn = jax.jit(
                self.make_decode_fn(kv_len, window, simple), donate_argnums=(1,)
            )
            self._decode_jit[key] = fn
        return fn

    def decode(
        self, kv_len: int, window: int, state, req_indices, seq_lens0, out_loc,
        page_tbl, samp, cmask=None, simple: bool = False,
    ) -> Tuple[EngineState, jnp.ndarray]:
        """Run one decode program; returns (state, tokens [K, B])."""
        simple = simple and cmask is None
        fn = self.get_decode_jit(
            int(req_indices.shape[0]), kv_len, window, cmask is not None, simple
        )
        return fn(
            self.params, state, req_indices, seq_lens0, out_loc, page_tbl,
            samp, cmask,
        )

    # ------------------------------------------------------------------ verify

    def make_verify_fn(self, kv_len: int, S: int):
        """Speculative-verify step (prompt-lookup decoding): forward the
        [B, S] block [last_token, draft_1..draft_{S-1}] through the decoder
        — KV is written for every position, and attention gives query j the
        causally-correct kv length — greedy-score every position, and
        accept the longest matching draft prefix ON DEVICE. Greedy-only;
        the scheduler gates on do_sample=False batches.

        `seq_lens` is the PADDED final length (old_seq + S) for every real
        row; rows with fewer real inputs (ext < S) pad with dummy-slot
        writes that no causal query ever reads."""
        cfg = self.model_cfg

        def verify_step(
            params,
            state: EngineState,
            req_indices: jnp.ndarray,  # [B] i32 (padding rows == max_requests)
            seq_lens: jnp.ndarray,     # [B] i32 old_seq + S (padded length)
            input_ids: jnp.ndarray,    # [B, S] i32 [last, drafts...]
            ext_lens: jnp.ndarray,     # [B] i32 1 + num real drafts
            out_loc: jnp.ndarray,      # [B, S] i32 slots (0 past ext)
            page_tbl: jnp.ndarray,     # [B, pages_per_seq] i32
        ):
            kv = _zip_kv(state)
            P = self.engine_cfg.page_size
            kv_rows = None
            if not self.paged_kernel:
                from tpusgl.ops.attention import rows_from_pages

                kv_rows = rows_from_pages(page_tbl, kv_len, P)
            positions = seq_lens[:, None] - S + jnp.arange(S, dtype=jnp.int32)[None, :]
            positions = jnp.clip(positions, 0, cfg.rope_table_rows - 1)
            meta = AttnMeta(
                kv_rows=kv_rows,
                seq_lens=seq_lens,
                ext_lens=ext_lens,
                positions=positions,
                out_loc=out_loc,
                page_tbl=page_tbl if self.paged_kernel else None,
            )
            hidden, kv = self._fwd_verify(params, input_ids, meta, kv)
            logits = self.model.lm_head_logits(params, cfg, hidden)  # [B,S,V]
            greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)   # [B,S]
            # accept = number of leading drafts whose greedy prediction at
            # the previous position equals them.
            ok = greedy[:, :-1] == input_ids[:, 1:]
            jpos = jnp.arange(S - 1, dtype=jnp.int32)[None, :]
            ok = ok & (jpos < (ext_lens - 1)[:, None])
            accept = jnp.sum(jnp.cumprod(ok.astype(jnp.int32), axis=1), axis=1)
            final = jnp.take_along_axis(greedy, accept[:, None], axis=1)[:, 0]
            last_token = state.last_token.at[req_indices].set(final)
            kv, kv_scale = _unzip_kv(kv, state.kv_scale is not None)
            new_state = state._replace(
                kv=kv, kv_scale=kv_scale, last_token=last_token,
            )
            return new_state, (greedy, accept)

        return verify_step

    def get_verify_jit(self, batch: int, kv_len: int, S: int):
        if self._fwd_verify is None:
            self._fwd_verify = self._make_fwd(self.attn_impl, full_hidden=True)
        if self.paged_kernel:
            kv_len = self.engine_cfg.max_context_len
        key = (batch, kv_len, S)
        fn = self._verify_jit.get(key)
        if fn is None:
            fn = jax.jit(self.make_verify_fn(kv_len, S), donate_argnums=(1,))
            self._verify_jit[key] = fn
        return fn

    def verify(
        self, kv_len: int, S: int, state, req_indices, seq_lens, input_ids,
        ext_lens, out_loc, page_tbl,
    ):
        """Run one speculative-verify step; returns
        (state, (greedy [B, S], accept [B]))."""
        fn = self.get_verify_jit(int(req_indices.shape[0]), kv_len, S)
        return fn(
            self.params, state, req_indices, seq_lens, input_ids, ext_lens,
            out_loc, page_tbl,
        )

    # ----------------------------------------------------------------- prefill

    def make_prefill_fn(self, has_prefix: bool, simple: bool = False):
        """The raw (unjitted) batched prefill step.

        One program prefills a whole [B, S] group of requests (the reference
        packs a ragged concat at /root/reference/scheduler.py:393-407; dense
        per-request rows keep shapes static for XLA, and the scheduler packs
        groups to a token budget so the MXU stays full). Attention is
        extend_attention: causal self-attention over the new tokens, plus a
        gathered cached prefix when `has_prefix` (radix hits / chunked
        prefill continuations). Rows can be padding (req_idx == max_requests,
        ext 0) or non-final chunks of a long prompt (req_idx == max_requests
        so the sampled token lands in the dummy row)."""
        cfg = self.model_cfg

        def prefill_step(
            params,
            state: EngineState,
            req_idx: jnp.ndarray,      # [B] i32 (dummy rows == max_requests)
            input_ids: jnp.ndarray,    # [B, S] i32 (padded)
            seq_len: jnp.ndarray,      # [B] i32 total logical len
            prefix_len: jnp.ndarray,   # [B] i32 computed-prefix length
            out_loc: jnp.ndarray,      # [B, S] i32 (0 on padding)
            prefix_rows: Optional[jnp.ndarray],  # [B, Tp] i32 or None
            samp: SamplingArrays,      # [B]
            penalty_ids: jnp.ndarray,  # [B, Kp] i32 prior output ids (pad = V)
            cmask: Optional[jnp.ndarray],
        ) -> Tuple[EngineState, jnp.ndarray]:
            B, S = input_ids.shape
            positions = prefix_len[:, None] + jnp.arange(S, dtype=jnp.int32)[None, :]
            positions = jnp.minimum(positions, cfg.rope_table_rows - 1)
            ext_len = seq_len - prefix_len
            meta = AttnMeta(
                kv_rows=None,
                seq_lens=seq_len,
                ext_lens=ext_len,
                positions=positions,
                out_loc=out_loc,
                prefix_rows=prefix_rows if has_prefix else None,
                prefix_lens=prefix_len,
            )
            last_hidden, kv = self._fwd_prefill(
                params, input_ids, meta, _zip_kv(state)
            )
            logits = self.model.lm_head_logits(params, cfg, last_hidden)

            rng, sub = jax.random.split(state.rng)
            rows_b = jnp.arange(B, dtype=jnp.int32)
            if simple:
                next_ids = sample_tokens_simple(sub, logits, samp)
                presence = state.presence
            else:
                presence_rows = (
                    jnp.zeros((B, cfg.vocab_size), jnp.bool_)
                    .at[rows_b[:, None], penalty_ids]
                    .set(True, mode="drop")
                )
                next_ids = sample_tokens(
                    sub, logits, samp, presence_rows, cmask,
                    k_cap=self.sample_k_cap,
                )
                presence_rows = presence_rows.at[rows_b, next_ids].set(True)
                # Dummy rows all scatter into the spare presence row
                # (max_requests) — harmless garbage.
                presence = state.presence.at[req_idx].set(presence_rows)
            last_token = state.last_token.at[req_idx].set(next_ids)
            kv, kv_scale = _unzip_kv(kv, state.kv_scale is not None)
            new_state = state._replace(
                kv=kv, kv_scale=kv_scale, last_token=last_token,
                presence=presence, rng=rng,
            )
            return new_state, next_ids

        return prefill_step

    def get_prefill_jit(self, has_prefix: bool, simple: bool):
        """The cached jitted prefill callable for one flag combo. Shapes
        ([B, S], [B, Tp], [B, Kp]) are handled by jit's own shape cache —
        the scheduler keeps them bucketed so the executable set stays small."""
        key = (has_prefix, simple)
        fn = self._prefill_jit.get(key)
        if fn is None:
            fn = jax.jit(
                self.make_prefill_fn(has_prefix, simple), donate_argnums=(1,)
            )
            self._prefill_jit[key] = fn
        return fn

    def prefill(
        self, state, req_idx, input_ids, seq_len, prefix_len, out_loc,
        prefix_rows=None, samp=None, penalty_ids=None, cmask=None,
        simple: bool = False,
    ) -> Tuple[EngineState, jnp.ndarray]:
        simple = simple and cmask is None
        if simple:
            # Dead inputs under the fast path; dropping them keeps their
            # host-side shape variation from retracing the program.
            penalty_ids = None
        fn = self.get_prefill_jit(prefix_rows is not None, simple)
        return fn(
            self.params, state, req_idx, input_ids, seq_len, prefix_len,
            out_loc, prefix_rows, samp, penalty_ids, cmask,
        )
