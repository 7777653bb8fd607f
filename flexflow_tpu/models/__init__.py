from flexflow_tpu.models import decoder, params  # noqa: F401
