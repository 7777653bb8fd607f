from flexflow_tpu.ops import activations, attention, norms, rotary  # noqa: F401
