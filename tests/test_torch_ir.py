"""Serialized op-list interop (flexflow_tpu/torch_ir.py).

Reference: PyTorchModel.torch_to_file writes `name; in,; out,; OP_TYPE;
fields` lines and file_to_ff replays them onto an FFModel without torch
(python/flexflow/torch/model.py:2540,2597). Gates:

- a hand-written file in the REFERENCE'S exact field orders/enum ints loads
  and runs;
- export -> import round-trips to a numerically identical model (same-seed
  compile);
- torch modules export through the fx frontend.
"""

import numpy as np
import pytest

from flexflow_tpu.ffmodel.model import FFModel
from flexflow_tpu.torch_ir import (
    file_to_ff, model_to_file, model_to_string, string_to_ff,
)


def _cnn():
    ff = FFModel(seed=7)
    x = ff.create_tensor((4, 3, 16, 16))
    t = ff.conv2d(x, 8, 3, 3, 1, 1, 1, 1, activation="relu", name="c1")
    t = ff.pool2d(t, 2, 2, 2, 2, 0, 0, pool_type="max", name="p1")
    t = ff.flat(t, name="fl")
    t = ff.dense(t, 32, activation="relu", name="d1")
    t = ff.dropout(t, rate=0.25, name="dr")
    t = ff.dense(t, 10, name="d2")
    ff.softmax(t)
    return ff


def test_round_trip_numeric_identity(tmp_path):
    ff = _cnn()
    path = str(tmp_path / "model.ff")
    model_to_file(ff, path)

    ff2 = FFModel(seed=7)
    x2 = ff2.create_tensor((4, 3, 16, 16))
    outs = file_to_ff(path, ff2, [x2])
    assert len(outs) == 1

    ff.compile()
    ff2.compile()
    x = np.random.RandomState(0).standard_normal((4, 3, 16, 16)).astype(
        np.float32)
    a = np.asarray(ff.forward([x]))
    b = np.asarray(ff2.forward([x]))
    assert a.shape == b.shape == (4, 10)
    np.testing.assert_array_equal(a, b)  # same seed + same graph = identical


def test_reference_field_orders_load():
    """Lines written in the reference's EXACT formats (enum ints: ActiMode
    NONE=10/RELU=11, PoolType MAX=30) must load."""
    lines = [
        "input_1; ; conv1,; INPUT",
        "conv1; input_1,; pool1,; CONV2D; 6; 5; 5; 1; 1; 0; 0; 10; 1; 1",
        "relu1; conv1,; pool1,; RELU",
        "pool1; relu1,; flat1,; POOL2D; 2; 2; 0; 30; 10",
        "flat1; pool1,; linear1,; FLAT",
        "linear1; flat1,; output,; LINEAR; 10; 11; 1",
        "output; linear1,; ; OUTPUT",
    ]
    ff = FFModel()
    x = ff.create_tensor((2, 3, 14, 14))
    outs = string_to_ff(lines, ff, [x])
    assert len(outs) == 1
    ff.compile()
    xs = np.zeros((2, 3, 14, 14), np.float32)
    out = np.asarray(ff.forward([xs]))
    assert out.shape == (2, 10)


def test_softmax_axis_round_trips():
    """Non-default softmax axes must survive export -> import (review r5:
    the axis field was being dropped)."""
    ff = FFModel()
    x = ff.create_tensor((2, 4, 6))
    ff.softmax(x, axis=1)
    lines = model_to_string(ff)
    ff2 = FFModel()
    x2 = ff2.create_tensor((2, 4, 6))
    string_to_ff(lines, ff2, [x2])
    sm = next(n for n in ff2._nodes if n.op == "softmax")
    assert sm.attrs["axis"] == 1


def test_unknown_op_raises():
    with pytest.raises(NotImplementedError):
        string_to_ff(["n; a,; ; FROBNICATE"], FFModel(), [])


def test_torch_module_exports(tmp_path):
    torch = pytest.importorskip("torch")
    from flexflow_tpu.torch_ir import torch_to_file

    class Net(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.fc1 = torch.nn.Linear(12, 24)
            self.fc2 = torch.nn.Linear(24, 5)

        def forward(self, x):
            return self.fc2(torch.relu(self.fc1(x)))

    path = str(tmp_path / "net.ff")
    torch_to_file(Net(), (12,), path)
    text = open(path).read()
    assert "LINEAR" in text and "RELU" in text and "INPUT" in text

    ff = FFModel()
    x = ff.create_tensor((8, 12))
    outs = file_to_ff(path, ff, [x])
    assert len(outs) == 1
    ff.compile()
    out = np.asarray(ff.forward([np.ones((8, 12), np.float32)]))
    assert out.shape == (8, 5)
