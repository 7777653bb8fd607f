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


class _BasicBlock(tnn.Module):
    """torchvision.models.resnet.BasicBlock shape (in-repo: no torchvision
    in this image)."""

    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(cout)
        self.relu = tnn.ReLU()
        self.conv2 = tnn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(cout)
        self.down = (
            tnn.Sequential(
                tnn.Conv2d(cin, cout, 1, stride, bias=False),
                tnn.BatchNorm2d(cout),
            )
            if stride != 1 or cin != cout
            else None
        )

    def forward(self, x):
        idn = x if self.down is None else self.down(x)
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        return self.relu(out + idn)


def test_fx_resnet_style_numeric():
    """ResNet-18-style net (stem + blocks + AdaptiveAvgPool2d +
    x.view(x.size(0), -1) + fc) imports and matches torch numerically —
    VERDICT r2 #8 'torchvision-style models verified'."""

    class MiniResNet(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = tnn.Conv2d(3, 8, 3, 1, 1, bias=False)
            self.bn1 = tnn.BatchNorm2d(8)
            self.relu = tnn.ReLU()
            self.maxpool = tnn.MaxPool2d(2, 2)
            self.layer1 = _BasicBlock(8, 8)
            self.layer2 = _BasicBlock(8, 16, stride=2)
            self.avgpool = tnn.AdaptiveAvgPool2d((1, 1))
            self.fc = tnn.Linear(16, 10)

        def forward(self, x):
            x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
            x = self.layer2(self.layer1(x))
            x = self.avgpool(x)
            x = x.view(x.size(0), -1)
            return self.fc(x)

    _compare_fx(MiniResNet(), [(3, 16, 16)], batch=2)


def test_fx_mobilenet_style_numeric():
    """MobileNetV3-style inverted residual with SE (hardswish/hardsigmoid,
    depthwise conv, adaptive pool, elementwise mul)."""

    class SE(tnn.Module):
        def __init__(self, c):
            super().__init__()
            self.pool = tnn.AdaptiveAvgPool2d(1)
            self.fc1 = tnn.Conv2d(c, c // 2, 1)
            self.act = tnn.ReLU()
            self.fc2 = tnn.Conv2d(c // 2, c, 1)
            self.gate = tnn.Hardsigmoid()

        def forward(self, x):
            s = self.gate(self.fc2(self.act(self.fc1(self.pool(x)))))
            return x * s

    class InvertedResidual(tnn.Module):
        def __init__(self):
            super().__init__()
            self.expand = tnn.Conv2d(8, 16, 1, bias=False)
            self.bn1 = tnn.BatchNorm2d(16)
            self.hs1 = tnn.Hardswish()
            self.dw = tnn.Conv2d(16, 16, 3, 1, 1, groups=16, bias=False)
            self.bn2 = tnn.BatchNorm2d(16)
            self.se = SE(16)
            self.project = tnn.Conv2d(16, 8, 1, bias=False)
            self.bn3 = tnn.BatchNorm2d(8)

        def forward(self, x):
            h = self.hs1(self.bn1(self.expand(x)))
            h = self.se(self.bn2(self.dw(h)))
            return x + self.bn3(self.project(h))

    _compare_fx(InvertedResidual(), [(8, 8, 8)], batch=2)


def test_fx_tensor_methods_getitem_arithmetic():
    """Tensor getitem slicing, chunk, stack, size(), method arithmetic,
    clamp, silu — the traced-value op surface VERDICT r2 #8 lists."""

    class Net(tnn.Module):
        def forward(self, x):
            a, b = x.chunk(2, dim=1)        # method chunk
            c = a[:, :4] + b[:, 4:]         # tensor getitem slices
            d = torch.stack([c, c.mul(2.0)], dim=1)  # stack + method mul
            e = d.sum(dim=1)                # method sum
            e = e.clamp(min=-1.0, max=1.0)  # method clamp
            e = torch.nn.functional.silu(e)
            f = e.view(e.size(0), -1)       # size() + view
            return -f                       # operator.neg
    _compare_fx(Net(), [(16, 8)], batch=2)


def test_fx_functional_pools_numeric():
    class Net(tnn.Module):
        def forward(self, x):
            a = torch.nn.functional.max_pool2d(x, 2)
            b = torch.nn.functional.avg_pool2d(x, 2)
            h = torch.cat([a, b], dim=1)
            return torch.nn.functional.adaptive_avg_pool2d(h, 1)
    _compare_fx(Net(), [(4, 8, 8)], batch=2)
