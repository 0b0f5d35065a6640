"""Model registry: architecture name -> functional implementation module.

Every model module exposes the same pure-function interface
(`init_params`, `forward`, `forward_hidden`, `lm_head_logits`,
`precompute_rope`); the runtime resolves it once via `get_model` and never
imports a concrete architecture directly (cf. the reference's hard-wired
BabyQwen2ForCausalLM construction, /root/reference/model_loader.py:67-78).
"""

from tpusgl.models import qwen2

REGISTRY = {
    "qwen2": qwen2,
    # Llama shares the Qwen2 computation graph (RMSNorm/RoPE/SwiGLU/GQA);
    # it differs only in attention_bias=False + untied head, which
    # ModelConfig carries (verified token-identical vs HF LlamaForCausalLM
    # in tests/test_model_golden.py).
    "llama": qwen2,
    # Qwen3 = Qwen2 graph + per-head q/k RMSNorm before RoPE, explicit
    # head_dim, no qkv bias (ModelConfig.qk_norm / head_dim_override;
    # golden-tested vs HF Qwen3ForCausalLM).
    "qwen3": qwen2,
}


def get_model(architecture: str):
    try:
        return REGISTRY[architecture]
    except KeyError:
        raise ValueError(
            f"unknown architecture {architecture!r}; known: {sorted(REGISTRY)}"
        ) from None
