from flexflow_tpu.parallel.mesh import (  # noqa: F401
    AXES,
    DATA_AXIS,
    MODEL_AXIS,
    PIPE_AXIS,
    SEQ_AXIS,
    make_mesh,
    single_device_mesh,
)
from flexflow_tpu.parallel.sharding import (  # noqa: F401
    batch_sharding,
    kv_cache_sharding,
    param_shardings,
    shard_params,
)
