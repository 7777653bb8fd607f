"""New frontend coverage: Conv2DTranspose / GroupNorm / fx MultiheadAttention.

Numeric oracle is torch (the reference's alignment-test philosophy,
tests/align/ — same op in both frameworks, outputs compared)."""

import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp

from flexflow_tpu.ops import nn as nn_ops


def test_conv2d_transpose_matches_torch():
    torch.manual_seed(0)
    for stride, pad, opad in ((1, 0, 0), (2, 1, 0), (2, 1, 1), (3, 2, 2)):
        m = tnn.ConvTranspose2d(3, 5, kernel_size=4, stride=stride,
                                padding=pad, output_padding=opad)
        x = torch.randn(2, 3, 7, 9)
        ref = m(x).detach().numpy()
        out = nn_ops.conv2d_transpose(
            jnp.asarray(x.numpy()), jnp.asarray(m.weight.detach().numpy()),
            jnp.asarray(m.bias.detach().numpy()),
            (stride, stride), (pad, pad), (opad, opad))
        np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


def test_group_norm_matches_torch():
    torch.manual_seed(1)
    m = tnn.GroupNorm(4, 12, eps=1e-5)
    with torch.no_grad():
        m.weight.normal_()
        m.bias.normal_()
    x = torch.randn(3, 12, 5, 6)
    ref = m(x).detach().numpy()
    out = nn_ops.group_norm(
        jnp.asarray(x.numpy()), 4,
        jnp.asarray(m.weight.detach().numpy()),
        jnp.asarray(m.bias.detach().numpy()), eps=1e-5)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


def test_keras_conv_transpose_and_groupnorm_build():
    from flexflow_tpu import keras as K

    model = K.Sequential([
        K.Input(shape=(3, 8, 8), batch_size=4),
        K.Conv2D(8, 3, activation="relu"),
        K.GroupNormalization(groups=2),
        K.Conv2DTranspose(4, 3, strides=2),
        K.LayerNormalization(),
        K.Flatten(),
        K.Dense(10),
    ])
    model.compile(optimizer=K.SGD(0.01),
                  loss="sparse_categorical_crossentropy")
    x = np.random.RandomState(0).randn(8, 3, 8, 8).astype(np.float32)
    y = np.random.RandomState(1).randint(0, 10, size=(8,)).astype(np.int32)
    model.fit(x, y, batch_size=4, epochs=1)
    out = model.predict(x[:4])
    assert out.shape == (4, 10) and np.isfinite(out).all()


def _compare_fx(module, input_shapes, batch=2, atol=2e-4):
    from flexflow_tpu.torch_frontend import apply_torch_weights, from_torch_module

    torch.manual_seed(2)
    module = module.eval()
    ff = from_torch_module(module, input_shapes, batch_size=batch)
    ff.compile(optimizer=None)
    apply_torch_weights(ff)
    rng = np.random.RandomState(0)
    xs = [rng.randn(batch, *s).astype(np.float32) for s in input_shapes]
    with torch.no_grad():
        want = module(*[torch.tensor(x) for x in xs])
        if isinstance(want, tuple):
            want = want[0]
        want = want.numpy()
    got = ff.forward(xs)
    np.testing.assert_allclose(got, want, atol=atol, rtol=1e-4)


def test_fx_conv_transpose_groupnorm_numeric():
    class Net(tnn.Module):
        def __init__(self):
            super().__init__()
            self.deconv = tnn.ConvTranspose2d(3, 6, 3, stride=2, padding=1)
            self.gn = tnn.GroupNorm(3, 6)
            self.act = tnn.ReLU()

        def forward(self, x):
            return self.act(self.gn(self.deconv(x)))

    _compare_fx(Net(), [(3, 8, 8)])


def test_fx_multihead_attention_numeric():
    class Net(tnn.Module):
        def __init__(self):
            super().__init__()
            self.attn = tnn.MultiheadAttention(16, 4, bias=False,
                                               batch_first=True)

        def forward(self, x):
            out, _ = self.attn(x, x, x)
            return out

    _compare_fx(Net(), [(5, 16)])
