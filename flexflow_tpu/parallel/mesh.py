"""Device mesh construction.

TPU-native replacement for the reference's MachineView/MachineResource device
addressing (/root/reference/include/flexflow/machine_view.h:18-64) and the
DP/TP/PP degree flags (config.h:186-188): a named ``jax.sharding.Mesh`` with
axes ``("data", "pipe", "model")``. Collectives ride ICI along mesh axes —
the replacement for the reference's NCCL communicators (model.cc:586-616).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

DATA_AXIS = "data"
PIPE_AXIS = "pipe"
MODEL_AXIS = "model"
SEQ_AXIS = "seq"
AXES = (DATA_AXIS, PIPE_AXIS, MODEL_AXIS, SEQ_AXIS)


def make_mesh(
    data: int = 1,
    pipe: int = 1,
    model: int = 1,
    seq: int = 1,
    *,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ("data", "pipe", "model", "seq") mesh over the given devices.

    Degrees mirror the reference flags ``-data-parallelism-degree``,
    ``-pipeline-parallelism-degree``, ``-tensor-parallelism-degree``
    (reference config.h:186-188). The ``seq`` axis is context parallelism
    (ring attention over ICI) — ABSENT in the reference (SURVEY.md §5.7:
    "no ring attention, no blockwise/context parallelism"); sequences longer
    than one chip's KV budget shard over it (ops/ring_attention.py).
    """
    devices = list(devices if devices is not None else jax.devices())
    need = data * pipe * model * seq
    if need > len(devices):
        raise ValueError(
            f"mesh {data}x{pipe}x{model}x{seq} needs {need} devices, "
            f"have {len(devices)}"
        )
    dev_array = np.asarray(devices[:need]).reshape(data, pipe, model, seq)
    return Mesh(dev_array, AXES)


def single_device_mesh(device: Optional[jax.Device] = None) -> Mesh:
    return make_mesh(1, 1, 1, devices=[device or jax.devices()[0]])
