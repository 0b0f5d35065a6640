"""Public serving API.

TPU-native counterpart of the reference Engine
(/root/reference/engine.py:12-78): builds the model (from a preset config
with random weights, or from a local HF checkpoint directory via the
streaming safetensors loader), the on-device state, the jitted steps, and
the scheduler; `generate` tokenizes (when a tokenizer is available),
dispatches to the scheduler, and detokenizes. Adds what the reference's
`generate_async` stub (engine.py:72-78) promises: `generate_stream` yields
per-request tokens as they are committed.
"""

from __future__ import annotations

import logging
import os
from typing import Iterator, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from tpusgl.config import EngineConfig, ModelConfig, resolve_model_config
from tpusgl.models import qwen2
from tpusgl.ops.attention import chunked_attention
from tpusgl.runtime.sampling_params import SamplingParams
from tpusgl.runtime.scheduler import Scheduler
from tpusgl.runtime.state import init_state
from tpusgl.runtime.steps import StepFunctions

logger = logging.getLogger(__name__)


def _maybe_tokenizer(model_id: str):
    if os.path.isdir(model_id) and os.path.exists(
        os.path.join(model_id, "tokenizer.json")
    ):
        try:
            from transformers import AutoTokenizer

            return AutoTokenizer.from_pretrained(model_id)
        except Exception as e:  # pragma: no cover
            logger.warning("tokenizer load failed: %s", e)
    return None


class Engine:
    def __init__(
        self,
        model_id: str = "qwen2.5-0.5b",
        engine_cfg: Optional[EngineConfig] = None,
        params=None,
        model_cfg: Optional[ModelConfig] = None,
        tokenizer=None,
        dtype=jnp.bfloat16,
        seed: int = 0,
        attn_impl=None,
        sample_k_cap: int = 1024,
    ):
        self.model_cfg = model_cfg or resolve_model_config(model_id)
        self.cfg = engine_cfg or EngineConfig.from_env()
        self.tokenizer = tokenizer if tokenizer is not None else _maybe_tokenizer(model_id)

        # Attention backend: the Pallas paged kernel on TPU (HBM-speed page
        # streaming, one executable for all context lengths), jnp chunked
        # attention elsewhere (CPU tests, virtual-device dry runs).
        paged_kernel = False
        if attn_impl is None:
            if jax.default_backend() == "tpu":
                import functools

                from tpusgl.ops.paged_attention import pallas_attention

                attn_impl = functools.partial(
                    pallas_attention,
                    page_size=self.cfg.page_size,
                    pages_per_block=self.cfg.pages_per_block,
                )
                paged_kernel = True
            else:
                attn_impl = chunked_attention
        self._paged_kernel = paged_kernel

        if params is None:
            if os.path.isdir(model_id):
                from tpusgl.loader.safetensors_loader import load_params

                params = load_params(model_id, self.model_cfg, self.cfg.quant, dtype)
            else:
                logger.info("no checkpoint found for %s; random init", model_id)
                params = qwen2.init_params(
                    self.model_cfg, jax.random.PRNGKey(seed), dtype
                )
                if self.cfg.quant.weight_dtype != "bf16":
                    from tpusgl.loader.safetensors_loader import quantize_params

                    params = quantize_params(params, self.cfg.quant)
        self.params = params

        self.mesh = None
        if self.cfg.tp > 1 or self.cfg.dp > 1:
            from tpusgl.parallel.mesh import make_mesh, shard_params

            self.mesh = make_mesh(self.cfg.dp, self.cfg.tp)
            self.params = params = shard_params(self.model_cfg, params, self.mesh)

        self.steps = StepFunctions(
            params, self.model_cfg, self.cfg,
            attn_impl=attn_impl, sample_k_cap=sample_k_cap,
            paged_kernel=self._paged_kernel,
        )
        state = init_state(self.model_cfg, self.cfg, kv_dtype=dtype, seed=seed)
        if self.mesh is not None:
            from tpusgl.parallel.mesh import shard_state

            state = shard_state(state, self.mesh)
        self.scheduler = Scheduler(
            self.steps, state, self.model_cfg, self.cfg, tokenizer=self.tokenizer
        )

    # ------------------------------------------------------------------ API

    def reset(self) -> None:
        self.scheduler.reset()

    def warmup(self, simple: Optional[bool] = None) -> None:
        """Precompile the step executables the serving loop will hit, so no
        XLA compile lands inside a timed run (the reference warms up by
        running one full request, bench.py:46-47 — insufficient here because
        each shape bucket is its own executable).

        Warms every prefill length bucket (with its diagonal kv bucket) and
        the full-batch decode program at every power-of-two window.
        `simple` selects the fast-sampling variants (None = both).
        """
        import numpy as np

        from tpusgl.ops.sampling import SamplingArrays
        from tpusgl.utils.bucketing import round_up

        cfg = self.cfg
        sched = self.scheduler
        simples = (True, False) if simple is None else (simple,)
        R = cfg.max_requests  # dummy row
        P = cfg.page_size

        for s in simples:
            for S in cfg.prefill_len_buckets:
                if S > cfg.max_context_len:
                    continue
                T = min(round_up(S, cfg.kv_len_bucket), cfg.max_context_len)
                sched.state, _ = self.steps.prefill(
                    S, T, sched.state,
                    np.array([R], np.int32),
                    np.zeros((1, S), np.int32),
                    np.zeros((1, T), np.int32),
                    np.array([1], np.int32),
                    np.array([0], np.int32),
                    np.zeros((1, S), np.int32),
                    SamplingArrays.full(1),
                    np.full((1, 64), self.model_cfg.vocab_size, np.int32),
                    None,
                    simple=s,
                )
            Bb = cfg.decode_bs_buckets[-1]
            windows = {1, cfg.decode_window}
            k = cfg.decode_window
            while k > 1:
                windows.add(k)
                k >>= 1
            for K in sorted(windows):
                sched.state, _ = self.steps.decode(
                    min(round_up(K, cfg.kv_len_bucket), cfg.max_context_len),
                    K, sched.state,
                    np.full((Bb,), R, np.int32),
                    np.ones((Bb,), np.int32),
                    np.zeros((Bb, K), np.int32),
                    np.zeros((Bb, cfg.pages_per_seq), np.int32),
                    SamplingArrays.full(Bb),
                    None,
                    simple=s,
                )
        import jax as _jax

        _jax.block_until_ready(sched.state.last_token)

    def _encode(self, requests: Sequence[Union[str, Sequence[int]]]) -> List[List[int]]:
        out = []
        for r in requests:
            if isinstance(r, str):
                if self.tokenizer is None:
                    raise ValueError(
                        "string prompts require a tokenizer; pass token ids"
                    )
                out.append(self.tokenizer(r, add_special_tokens=False)["input_ids"])
            else:
                out.append(list(r))
        return out

    def generate(
        self,
        requests: Sequence[Union[str, Sequence[int]]],
        sampling: Optional[SamplingParams] = None,
        enable_overlap: Optional[bool] = None,
    ) -> List[Union[str, List[int]]]:
        """Batch generation (reference engine.py:27-70). Returns decoded
        strings when a tokenizer is present, else token-id lists."""
        if sampling is None:
            sampling = SamplingParams()
        if sampling.eos_id == -1 and self.tokenizer is not None:
            eos = getattr(self.tokenizer, "eos_token_id", None)
            if eos is not None:
                sampling.eos_id = eos
        token_reqs = self._encode(requests)
        outputs = self.scheduler.run_batch(token_reqs, sampling, overlap=enable_overlap)
        if self.tokenizer is not None and requests and isinstance(requests[0], str):
            return [self.tokenizer.decode(ids) for ids in outputs]
        return outputs

    @property
    def metrics(self):
        return self.scheduler.metrics
