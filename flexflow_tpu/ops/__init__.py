from flexflow_tpu.ops import (  # noqa: F401
    activations,
    attention,
    norms,
    ring_attention,
    rotary,
)
