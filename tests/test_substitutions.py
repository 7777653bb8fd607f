"""Graph substitution engine tests (reference substitution.cc GraphXfer).

Gates: every rewrite preserves outputs EXACTLY (params transplanted by
name), shrinks the node list, and composes with training.
"""

import numpy as np
import jax.numpy as jnp

from flexflow_tpu.config import config as ffconfig
from flexflow_tpu.ffmodel import FFModel
from flexflow_tpu.ffmodel.substitutions import optimize_graph


def _build_net(ff):
    x = ff.create_tensor((4, 16))
    h = ff.dense(x, 32)          # fusable with the relu below
    h = ff.relu(h)
    h = ff.identity(h)           # eliminated
    h = ff.reshape(h, (4, 2, 16))
    h = ff.reshape(h, (4, 32))   # collapsed
    parts = ff.split(h, [16, 16], axis=1)
    h = ff.concat(parts, axis=1)  # split+concat eliminated
    h = ff.dense(h, 8)
    return ff


def _unfused(build):
    old = ffconfig.fusion
    ffconfig.fusion = False
    try:
        ff = build(FFModel())
        ff.compile(optimizer=None)
    finally:
        ffconfig.fusion = old
    return ff


def _fused(build):
    old = ffconfig.fusion
    ffconfig.fusion = True
    try:
        ff = build(FFModel())
        ff.compile(optimizer=None)
    finally:
        ffconfig.fusion = old
    return ff


def test_substitutions_shrink_and_preserve_outputs():
    ff0 = _unfused(_build_net)
    ff1 = _fused(_build_net)
    rep = ff1.substitution_report
    assert rep.get("fuse-activation", 0) >= 1
    assert rep.get("eliminate-identity", 0) >= 1
    assert rep.get("collapse-reshape", 0) >= 1
    assert rep.get("eliminate-split-concat", 0) >= 1
    assert len(ff1._nodes) < len(ff0._nodes)

    # transplant params by name (names survive rewrites) -> outputs EXACT
    ff1.params = {name: ff0.params[name] for name in ff1.params}
    x = np.random.RandomState(0).randn(4, 16).astype(np.float32)
    np.testing.assert_array_equal(ff0.forward(x), ff1.forward(x))


def test_bn_relu_fusion():
    def build(ff):
        x = ff.create_tensor((4, 3, 8, 8))
        h = ff.conv2d(x, 8, 3, 3, 1, 1, 1, 1)
        h = ff.batch_norm(h, relu=False)
        h = ff.relu(h)
        return ff

    ff = _fused(build)
    assert ff.substitution_report.get("fuse-bn-relu", 0) == 1
    assert any(n.op == "batch_norm" and n.attrs["relu"] for n in ff._nodes)
    assert not any(n.op == "relu" for n in ff._nodes)


def test_substituted_graph_trains():
    from flexflow_tpu.training import SGDOptimizer

    def build(ff):
        x = ff.create_tensor((8, 16))
        h = ff.dense(x, 32)
        h = ff.relu(h)
        h = ff.dense(h, 4)
        return ff

    ff = _fused(build)
    ff2 = FFModel()
    build(ff2)
    old = ffconfig.fusion
    ffconfig.fusion = True
    try:
        ff.optimizer = None
        ff2.compile(SGDOptimizer(lr=0.1))
    finally:
        ffconfig.fusion = old
    xs = np.random.RandomState(0).randn(16, 16).astype(np.float32)
    ys = (np.arange(16) % 4).astype(np.int32)
    hist = ff2.fit(xs, ys, batch_size=8, epochs=2)
    assert np.isfinite(hist[-1]["loss"])
    assert hist[-1]["loss"] <= hist[0]["loss"] + 1e-3


def test_optimize_graph_split_partial_consumer_kept():
    """A split with an extra consumer outside the concat keeps the split."""
    ff = FFModel()
    x = ff.create_tensor((2, 8))
    parts = ff.split(x, [4, 4], axis=1)
    cat = ff.concat(parts, axis=1)
    extra = ff.relu(parts[0])
    out = ff.add(cat, ff.concat([extra, extra], axis=1))
    nodes, inputs, rep = optimize_graph(ff._nodes, ff._inputs)
    assert rep.get("eliminate-split-concat", 0) == 1
    assert any(n.op == "split" for n in nodes)  # still live for `extra`
