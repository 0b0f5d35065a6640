"""tpu-sgl: a TPU-native quantized LLM serving engine.

Built from scratch with the capabilities of baby-sglang's control plane
(reference at /root/reference, cited per-file throughout), re-architected
for JAX/XLA/Pallas. See SURVEY.md for the blueprint.
"""

from tpusgl.config import EngineConfig, ModelConfig, QuantConfig, resolve_model_config
from tpusgl.runtime.engine import Engine
from tpusgl.runtime.sampling_params import SamplingParams

__version__ = "0.1.0"
__all__ = [
    "Engine",
    "EngineConfig",
    "ModelConfig",
    "QuantConfig",
    "SamplingParams",
    "resolve_model_config",
]
