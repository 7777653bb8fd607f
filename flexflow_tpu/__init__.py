"""flexflow_tpu — TPU-native LLM serving + training framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of FlexFlow
(train + serve/SpecInfer; reference at /root/reference): continuous-batching
LLM serving with incremental decoding and tree-based speculative decoding,
INT4/INT8 weight-only quantization, tensor/pipeline/data parallelism over a
device mesh, PEFT/LoRA, a HuggingFace model zoo, and a training layer.
"""

from flexflow_tpu.specs import ModelSpec, MoESpec, RopeScaling, from_hf_config

__version__ = "0.1.0"

__all__ = [
    "ModelSpec",
    "MoESpec",
    "RopeScaling",
    "from_hf_config",
    "__version__",
]
