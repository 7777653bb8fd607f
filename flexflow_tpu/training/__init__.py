from flexflow_tpu.training.losses import LOSSES  # noqa: F401
from flexflow_tpu.training.metrics import PerfMetrics  # noqa: F401
from flexflow_tpu.training.optimizers import AdamOptimizer, SGDOptimizer  # noqa: F401
from flexflow_tpu.training.trainer import Trainer  # noqa: F401
