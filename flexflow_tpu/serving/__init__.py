from flexflow_tpu.serving.engine import InferenceEngine  # noqa: F401
from flexflow_tpu.serving.request_manager import (  # noqa: F401
    GenerationConfig,
    Request,
    RequestManager,
)
