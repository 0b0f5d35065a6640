"""Model and engine configuration.

Mirrors the semantics of the reference's config plumbing
(/root/reference/model_loader.py:18-53 `BabyQwenConfig`, scheduler env knobs at
/root/reference/scheduler.py:33-36, policy constants at scheduler.py:64-70) in a
single typed place, extended with TPU-specific knobs (mesh axes, quantization,
shape bucketing) that the reference does not have.
"""

from __future__ import annotations

import dataclasses
import json
import os
from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Tuple


@dataclass(frozen=True)
class ModelConfig:
    """Architecture hyperparameters for a decoder-only transformer.

    Field set mirrors the reference's BabyQwenConfig
    (/root/reference/model_loader.py:18-32); frozen + hashable so it can be a
    static argument to jax.jit.
    """

    hidden_size: int
    num_attention_heads: int
    num_key_value_heads: int
    intermediate_size: int
    num_hidden_layers: int
    vocab_size: int
    rms_norm_eps: float = 1e-6
    hidden_act: str = "silu"
    max_position_embeddings: int = 32768
    rope_theta: float = 1000000.0
    # RoPE scaling (HF rope_scaling): "none", "linear" (true position
    # scaling, factor extends the range), or "llama3" (frequency-dependent;
    # max_position_embeddings is already the extended value in those
    # configs). Unsupported types raise at config parse — silent dropping
    # produced garbage past the original context.
    rope_scaling_type: str = "none"
    rope_scaling_factor: float = 1.0
    rope_low_freq_factor: float = 1.0
    rope_high_freq_factor: float = 4.0
    rope_original_max_position: Optional[int] = None
    tie_word_embeddings: bool = False
    attention_bias: bool = True  # Qwen2 uses bias on QKV only
    architecture: str = "qwen2"
    # Qwen3: explicit head_dim (may differ from hidden/heads) and per-head
    # RMSNorm on q/k before RoPE.
    head_dim_override: Optional[int] = None
    qk_norm: bool = False

    @property
    def head_dim(self) -> int:
        if self.head_dim_override is not None:
            return self.head_dim_override
        return self.hidden_size // self.num_attention_heads

    @property
    def rope_table_rows(self) -> int:
        """Usable RoPE positions (models/qwen2.precompute_rope builds this
        many rows): linear scaling extends the range by the factor; llama3
        configs already state the EXTENDED length in
        max_position_embeddings."""
        if self.rope_scaling_type == "linear":
            return int(
                self.max_position_embeddings * max(1.0, self.rope_scaling_factor)
            )
        return self.max_position_embeddings

    @property
    def q_size(self) -> int:
        return self.num_attention_heads * self.head_dim

    @property
    def kv_size(self) -> int:
        return self.num_key_value_heads * self.head_dim

    @classmethod
    def from_hf_dict(cls, cfg: Dict[str, Any]) -> "ModelConfig":
        """Build from a HuggingFace config.json dict (no network needed)."""
        rope_scaling = cfg.get("rope_scaling") or {}
        # modern HF writes "rope_type"; older checkpoints "type"
        rtype = rope_scaling.get("rope_type") or rope_scaling.get("type")
        factor = float(rope_scaling.get("factor", 1.0))
        rope_kwargs: Dict[str, Any] = {}
        if rtype in (None, "default"):
            pass
        elif rtype == "linear":
            rope_kwargs = {
                "rope_scaling_type": "linear", "rope_scaling_factor": factor,
            }
        elif rtype == "llama3":
            rope_kwargs = {
                "rope_scaling_type": "llama3",
                "rope_scaling_factor": factor,
                "rope_low_freq_factor": float(
                    rope_scaling.get("low_freq_factor", 1.0)
                ),
                "rope_high_freq_factor": float(
                    rope_scaling.get("high_freq_factor", 4.0)
                ),
                "rope_original_max_position": int(
                    rope_scaling.get("original_max_position_embeddings", 8192)
                ),
            }
        else:
            # yarn/dynamic/...: refusing beats silently-wrong rotary phases
            raise ValueError(
                f"unsupported rope_scaling type {rtype!r}; "
                "supported: linear, llama3"
            )
        arch = (cfg.get("architectures") or ["Qwen2ForCausalLM"])[0]
        arch_key = {
            "Qwen2ForCausalLM": "qwen2",
            "LlamaForCausalLM": "llama",
            "Qwen3ForCausalLM": "qwen3",
        }.get(arch, "qwen2")
        return cls(
            **rope_kwargs,
            head_dim_override=cfg.get("head_dim"),
            qk_norm=arch_key == "qwen3",
            hidden_size=cfg["hidden_size"],
            num_attention_heads=cfg["num_attention_heads"],
            num_key_value_heads=cfg.get(
                "num_key_value_heads", cfg["num_attention_heads"]
            ),
            intermediate_size=cfg["intermediate_size"],
            num_hidden_layers=cfg["num_hidden_layers"],
            vocab_size=cfg["vocab_size"],
            rms_norm_eps=cfg.get("rms_norm_eps", 1e-6),
            hidden_act=cfg.get("hidden_act", "silu"),
            max_position_embeddings=cfg.get("max_position_embeddings", 32768),
            rope_theta=cfg.get("rope_theta", 1000000.0),
            tie_word_embeddings=cfg.get("tie_word_embeddings", False),
            attention_bias=cfg.get("attention_bias", arch_key == "qwen2"),
            architecture=arch_key,
        )

    @classmethod
    def from_json(cls, path: str) -> "ModelConfig":
        with open(path) as f:
            return cls.from_hf_dict(json.load(f))


# Local presets for the Qwen2.5 family (HF config.json values), usable without
# network access. Dims cross-checked against the public Qwen2.5 release.
QWEN2_5_PRESETS: Dict[str, ModelConfig] = {
    "qwen2.5-0.5b": ModelConfig(
        hidden_size=896, num_attention_heads=14, num_key_value_heads=2,
        intermediate_size=4864, num_hidden_layers=24, vocab_size=151936,
        tie_word_embeddings=True,
    ),
    "qwen2.5-1.5b": ModelConfig(
        hidden_size=1536, num_attention_heads=12, num_key_value_heads=2,
        intermediate_size=8960, num_hidden_layers=28, vocab_size=151936,
        tie_word_embeddings=True,
    ),
    "qwen2.5-3b": ModelConfig(
        hidden_size=2048, num_attention_heads=16, num_key_value_heads=2,
        intermediate_size=11008, num_hidden_layers=36, vocab_size=151936,
        tie_word_embeddings=True,
    ),
    "qwen2.5-7b": ModelConfig(
        hidden_size=3584, num_attention_heads=28, num_key_value_heads=4,
        intermediate_size=18944, num_hidden_layers=28, vocab_size=152064,
    ),
    "qwen2.5-14b": ModelConfig(
        hidden_size=5120, num_attention_heads=40, num_key_value_heads=8,
        intermediate_size=13824, num_hidden_layers=48, vocab_size=152064,
        rms_norm_eps=1e-5,
    ),
    "qwen2.5-32b": ModelConfig(
        hidden_size=5120, num_attention_heads=40, num_key_value_heads=8,
        intermediate_size=27648, num_hidden_layers=64, vocab_size=152064,
        rms_norm_eps=1e-5,
    ),
    "qwen2.5-72b": ModelConfig(
        hidden_size=8192, num_attention_heads=64, num_key_value_heads=8,
        intermediate_size=29568, num_hidden_layers=80, vocab_size=152064,
        rms_norm_eps=1e-5,
    ),
    # Qwen3 (per-head q/k RMSNorm, explicit head_dim, no qkv bias).
    "qwen3-0.6b": ModelConfig(
        hidden_size=1024, num_attention_heads=16, num_key_value_heads=8,
        intermediate_size=3072, num_hidden_layers=28, vocab_size=151936,
        tie_word_embeddings=True, attention_bias=False,
        head_dim_override=128, qk_norm=True, architecture="qwen3",
    ),
    "qwen3-8b": ModelConfig(
        hidden_size=4096, num_attention_heads=32, num_key_value_heads=8,
        intermediate_size=12288, num_hidden_layers=36, vocab_size=151936,
        attention_bias=False, head_dim_override=128, qk_norm=True,
        architecture="qwen3",
    ),
    # Tiny configs for tests.
    "tiny": ModelConfig(
        hidden_size=64, num_attention_heads=4, num_key_value_heads=2,
        intermediate_size=128, num_hidden_layers=2, vocab_size=256,
        tie_word_embeddings=True, max_position_embeddings=512,
    ),
    "tiny-8kv": ModelConfig(
        hidden_size=128, num_attention_heads=8, num_key_value_heads=8,
        intermediate_size=256, num_hidden_layers=2, vocab_size=256,
        max_position_embeddings=512,
    ),
}


def resolve_model_config(model_id: str) -> ModelConfig:
    """Resolve a model id to a ModelConfig.

    Accepts a preset name ("qwen2.5-7b"), an HF-style repo id whose size suffix
    matches a preset ("Qwen/Qwen2.5-7B-Instruct"), or a local directory
    containing config.json.
    """
    key = model_id.lower()
    if key in QWEN2_5_PRESETS:
        return QWEN2_5_PRESETS[key]
    if os.path.isdir(model_id):
        cfg_path = os.path.join(model_id, "config.json")
        if os.path.exists(cfg_path):
            return ModelConfig.from_json(cfg_path)
    # Try to map HF ids like Qwen/Qwen2.5-7B-Instruct.
    base = key.split("/")[-1]
    for suffix in ("-instruct", "-chat"):
        if base.endswith(suffix):
            base = base[: -len(suffix)]
    if base in QWEN2_5_PRESETS:
        return QWEN2_5_PRESETS[base]
    raise ValueError(
        f"Unknown model id {model_id!r}; known presets: {sorted(QWEN2_5_PRESETS)}"
    )


@dataclass(frozen=True)
class QuantConfig:
    """Weight / KV quantization settings (reference has only fp8 stubs,
    /root/reference/memory_pool.py:55-59)."""

    weight_dtype: str = "bf16"  # bf16 | int8 | int4
    kv_dtype: str = "bf16"      # bf16 | int8
    # int4 group quantization group size. 64 (was 128): finer groups
    # measurably cut the synthetic PPL delta (14.5% vs 15.8% alone) for
    # +0.25 bit/weight of scale overhead.
    group_size: int = 64
    # Under weight_dtype="int4", these linears store INT8 instead: qkv and
    # the attention output are the PPL-sensitive matrices, and they are a
    # small fraction of the bytes (12.5% of 7B layer weights). Measured on
    # the synthetic harness: +4.1% relative PPL vs bf16 with this mix vs
    # +15.8% for all-int4-g128 — at ~12% more weight bytes than pure int4.
    # Set to () for pure int4.
    int4_keep_int8: Tuple[str, ...] = ("qkv", "o")
    # LM head weight dtype (untied models only; tied models keep the fp
    # embedding). The head reads ~1.1 GB bf16 per decode iteration at 7B —
    # int8 halves that. Default bf16: the head dominates PPL sensitivity,
    # so int8 is opt-in and gated by eval/ppl_gate.
    lm_head_dtype: str = "bf16"  # bf16 | int8

    def __post_init__(self):
        assert self.weight_dtype in ("bf16", "int8", "int4"), self.weight_dtype
        assert self.kv_dtype in ("bf16", "int8"), self.kv_dtype
        assert self.lm_head_dtype in ("bf16", "int8"), self.lm_head_dtype


@dataclass(frozen=True)
class EngineConfig:
    """Serving engine configuration.

    Defaults mirror the reference: max_total_tokens env default 131072,
    max_requests 32 (/root/reference/scheduler.py:33-36); admission policy
    constants (scheduler.py:64-70).
    """

    max_total_tokens: int = 131072
    max_requests: int = 32
    # Tokens per KV page: the unit of allocation, radix sharing, and the
    # Pallas decode kernel's DMA. 1 == the reference's token-granular slots
    # (memory_pool.py:46-102); larger pages make each HBM fetch one
    # contiguous block (speed-of-light DMA) at the cost of page-quantized
    # prefix-cache hits.
    page_size: int = 32
    # KV pages fetched per kernel block (double-buffered DMA window).
    pages_per_block: int = 8
    # Sequences whose compute is merged into one block-diagonal matmul +
    # one softmax chain per KV block in the Pallas decode kernel. Measured
    # SLOWER on v5e at bench geometry (240-282 vs 139 us/call: the
    # block-diagonal contraction doubles MXU tile loads and the group DMA
    # lands strided) — kept at 1; the grouped kernel remains available for
    # other geometries (tools/probe_decode_kernel.py --merges).
    decode_merge_seqs: int = 1
    # Sub-page prefix reuse (radix match_tail + page copy-in): minimum
    # matched-tail length worth a device page copy. Short accidental matches
    # (random workloads collide on 1-2 tokens) would otherwise trigger the
    # copy program + the has_prefix prefill program for near-zero reuse.
    tail_min_tokens: int = 16

    # Admission / retraction policy (reference scheduler.py:64-70).
    new_token_ratio_init: float = 0.5
    new_token_ratio_min: float = 0.1
    new_token_ratio_decay_steps: int = 50
    retract_decode_steps: int = 20
    clip_max_new_tokens_estimation: int = 512

    # XLA shape bucketing. Decode batch is padded up to the next bucket;
    # prefill token count likewise. Small sets keep compile count bounded.
    decode_bs_buckets: Tuple[int, ...] = (1, 2, 4, 8, 16, 32, 64, 128, 256)
    prefill_len_buckets: Tuple[int, ...] = (16, 32, 64, 128, 256, 512, 1024, 2048)
    kv_len_bucket: int = 256  # kv gather length rounds up to a multiple of this

    # Batched prefill: requests are packed into [B, S] groups with
    # B = prefill_token_budget // S (S = bucketed max extension in the
    # group), so one device step prefills many requests and the compiled
    # shape set is one program per S bucket (vs the reference's ragged
    # concat, scheduler.py:393-407, and round 1's serialized [1, S] steps).
    prefill_token_budget: int = 8192
    # Extensions longer than the largest prefill bucket run as a chunked
    # series of [1, chunk] steps (chunk = prefill_len_buckets[-1]); only the
    # final chunk samples. This bounds per-step memory and removes the old
    # hard length cap (pick_bucket ValueError).

    # Parallelism: data-parallel x tensor-parallel mesh shape.
    dp: int = 1
    tp: int = 1
    # Debug cross-check that all hosts made identical batch decisions each
    # step (multi-host SPMD determinism, parallel/multihost.py). No-op on a
    # single process.
    check_multihost_schedule: bool = False

    # Radix prefix-cache matching. Disabled = every request recomputes its
    # full prompt (reuse-off baseline for the prefix-heavy bench; inserts
    # still happen so pool accounting is identical, matches just never hit).
    radix_enabled: bool = True

    # Preallocate a request's ENTIRE KV page row (prompt + max_new_tokens) as
    # one contiguous run at prefill when the pool can afford it (admission
    # already budgets the full need, _try_select_prefill's total_needed).
    # Decode then never allocates mid-run and every KV block the Pallas
    # kernel streams is physically contiguous -> single-DMA fast path
    # (paged_attention.block_contig). Falls back to incremental allocation
    # under pool pressure. Off by default: oversubscribed pools trade
    # concurrency for contiguity.
    prealloc_decode_pages: bool = False

    # Host-RAM KV offload tier (reference roadmap "multi-level cache",
    # /root/reference/README.md:54; runtime/host_cache.py): radix-evicted
    # pages spill to a byte-bounded host LRU and are re-injected on a later
    # prefix match instead of being recomputed. 0 disables.
    host_cache_bytes: int = 0

    quant: QuantConfig = field(default_factory=QuantConfig)
    # Route int8/int4 linears through the Pallas fused dequant+matmul kernel
    # (ops/quant_matmul.py) on TPU instead of the jnp dequant expression.
    use_quant_matmul: bool = True

    # Overlap schedule (reference overlap_worker.py) — here: async dispatch.
    enable_overlap: bool = False

    # Unroll the layer stack in the step programs instead of lax.scan over
    # stacked weights. Observed on TPU: identical runtime, ~50x faster
    # compiles via the remote toolchain, and no scan-carry copies.
    unroll_layers: bool = True

    # Prompt-lookup speculative decoding (the reference's roadmap item,
    # README.md:52): propose up to `speculative_tokens` draft tokens by
    # n-gram lookup in the request's own prompt+output, verify them all in
    # ONE model step, accept the longest matching prefix. Greedy-only
    # (do_sample batches fall back to normal decode) and checkpoint-free —
    # no draft model. 0 disables.
    speculative_tokens: int = 0
    speculative_ngram: int = 2
    # Rolling-acceptance auto-disable: a spec step only pays for itself when
    # enough drafts are accepted (the verify pass streams the weights once
    # for 1+accepted tokens but forfeits the multi-token decode window). If
    # the acceptance rate over the last `speculative_probe_steps` spec steps
    # falls below `speculative_min_acceptance`, speculation turns OFF for
    # `speculative_reprobe_interval` decode steps, then probes again — so a
    # user passing --speculative-tokens on a low-acceptance workload is
    # bounded to ~probe/(probe+interval) of the standalone regression
    # instead of silently eating all of it (VERDICT r4 #4a). All counters
    # derive from committed tokens, so every multihost process makes the
    # same on/off decision on the same step.
    speculative_min_acceptance: float = 0.5
    # Second gate: committed tokens per request per spec step (1.0 = plain
    # decode). Catches high-acceptance/low-coverage workloads (few rows
    # find an n-gram draft at all — measured 82% acceptance but only 1.33
    # tokens/req/step on a random-weight looping model) that the
    # acceptance gate alone misses. 1.5 sits above the 7B weight-streaming
    # break-even (~1.2) with margin; purely count-based, so multihost
    # processes decide identically.
    speculative_min_tokens_per_req: float = 1.5
    speculative_probe_steps: int = 16
    speculative_reprobe_interval: int = 256

    # Multi-step decode: run this many decode iterations inside one jitted
    # lax.scan, amortizing host dispatch over K tokens (the device-side
    # last_token buffer makes step k+1's input available without the host).
    # 1 == reference per-step scheduling. Requests past eos/max_new inside a
    # window are rolled back and their KV slots freed at commit.
    decode_window: int = 8

    def __post_init__(self):
        assert self.max_total_tokens % self.page_size == 0, (
            self.max_total_tokens, self.page_size)
        assert self.max_context_len % self.page_size == 0, (
            self.max_context_len, self.page_size)
        assert self.kv_len_bucket % self.page_size == 0, (
            self.kv_len_bucket, self.page_size)
        assert self.prefill_chunk % self.page_size == 0 or (
            self.prefill_chunk < self.page_size
        ), (self.prefill_chunk, self.page_size)
        assert self.prefill_token_budget >= self.prefill_chunk, (
            self.prefill_token_budget, self.prefill_chunk)

    @property
    def prefill_chunk(self) -> int:
        """Max tokens per prefill step row; longer extensions are chunked."""
        return self.prefill_len_buckets[-1]

    @property
    def max_context_len(self) -> int:
        # Reference: token_pool_size // req_pool_size (scheduler.py:43-47).
        return self.max_total_tokens // self.max_requests

    @property
    def pages_per_seq(self) -> int:
        return self.max_context_len // self.page_size

    @classmethod
    def from_env(cls, **overrides) -> "EngineConfig":
        env = {}
        if "BABYSGL_MAX_TOTAL_TOKENS" in os.environ:
            env["max_total_tokens"] = int(os.environ["BABYSGL_MAX_TOTAL_TOKENS"])
        if "BABYSGL_MAX_REQUESTS" in os.environ:
            env["max_requests"] = int(os.environ["BABYSGL_MAX_REQUESTS"])
        env.update(overrides)
        return cls(**env)

    def replace(self, **kw) -> "EngineConfig":
        return dataclasses.replace(self, **kw)
