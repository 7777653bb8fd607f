from flexflow_tpu.ffmodel.model import FFModel, Tensor  # noqa: F401
from flexflow_tpu.training.optimizers import AdamOptimizer, SGDOptimizer  # noqa: F401
