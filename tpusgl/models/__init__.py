"""Model registry: architecture name -> functional implementation module."""

from tpusgl.models import qwen2

REGISTRY = {
    "qwen2": qwen2,
    # Llama shares the Qwen2 computation graph (RMSNorm/RoPE/SwiGLU/GQA);
    # it differs only in attention_bias=False, which ModelConfig carries.
    "llama": qwen2,
}
