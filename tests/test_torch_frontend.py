"""torch.fx frontend tests: imported models must match torch numerically
(the reference's align-test philosophy applied to the frontend)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

from flexflow_tpu.torch_frontend import apply_torch_weights, from_torch_module  # noqa: E402


def _compare(module, input_shapes, batch=4, atol=1e-4):
    torch.manual_seed(0)
    module = module.eval()
    ff = from_torch_module(module, input_shapes, batch_size=batch)
    ff.compile(optimizer=None)
    apply_torch_weights(ff)
    rng = np.random.RandomState(0)
    xs = [rng.randn(batch, *s).astype(np.float32) for s in input_shapes]
    with torch.no_grad():
        want = module(*[torch.tensor(x) for x in xs]).numpy()
    got = ff.forward(xs)
    np.testing.assert_allclose(got, want, atol=atol, rtol=1e-4)
    return ff


def test_mlp():
    class MLP(tnn.Module):
        def __init__(self):
            super().__init__()
            self.fc1 = tnn.Linear(16, 32)
            self.fc2 = tnn.Linear(32, 4)

        def forward(self, x):
            return self.fc2(F.relu(self.fc1(x)))

    _compare(MLP(), [(16,)])


def test_cnn_with_bn():
    class CNN(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = tnn.Conv2d(1, 8, 3, padding=1)
            self.bn = tnn.BatchNorm2d(8)
            self.pool = tnn.MaxPool2d(2)
            self.conv2 = tnn.Conv2d(8, 4, 3, padding=1)
            self.fc = tnn.Linear(4 * 4 * 4, 3)

        def forward(self, x):
            x = self.pool(F.relu(self.bn(self.conv1(x))))
            x = torch.flatten(self.conv2(x), 1)
            return self.fc(x)

    # perturb BN running stats so eval mode actually uses them
    m = CNN()
    with torch.no_grad():
        m.bn.running_mean.add_(0.3)
        m.bn.running_var.mul_(1.7)
    _compare(m, [(1, 8, 8)])


def test_residual_and_methods():
    class Res(tnn.Module):
        def __init__(self):
            super().__init__()
            self.fc1 = tnn.Linear(8, 8)
            self.fc2 = tnn.Linear(8, 8)

        def forward(self, x):
            h = torch.relu(self.fc1(x))
            h = h + x
            h = self.fc2(h) * 2.0
            return h.reshape(-1, 8)

    _compare(Res(), [(8,)])


def test_imported_model_trains():
    class MLP(tnn.Module):
        def __init__(self):
            super().__init__()
            self.fc1 = tnn.Linear(16, 32)
            self.fc2 = tnn.Linear(32, 4)

        def forward(self, x):
            return self.fc2(torch.relu(self.fc1(x)))

    from flexflow_tpu.ffmodel import AdamOptimizer

    ff = from_torch_module(MLP(), [(16,)], batch_size=32)
    ff.compile(optimizer=AdamOptimizer(lr=1e-2))
    apply_torch_weights(ff)
    rng = np.random.RandomState(0)
    w = rng.randn(16, 4)
    x = rng.randn(256, 16).astype(np.float32)
    y = (x @ w).argmax(-1).astype(np.int32)
    hist = ff.fit(x, y, batch_size=32, epochs=10)
    assert hist[-1]["accuracy"] > 0.85


def test_fx_widened_ops_numeric():
    """Widened call_function/call_method coverage (reference torch/model.py
    OpType set): pow/rsqrt/mean/unsqueeze/squeeze/contiguous/split/
    softmax-method/cast verified numerically vs torch."""
    import torch
    import torch.nn as nn

    class M(nn.Module):
        def forward(self, x):
            a = torch.rsqrt(x.pow(2.0).mean(dim=-1, keepdim=True) + 1.0)
            b = (x * a).contiguous()
            c = b.unsqueeze(1).squeeze(1)
            lo, hi = c.split(4, dim=-1)
            d = torch.cat([lo.softmax(dim=-1), hi.sigmoid()], dim=-1)
            return (d + torch.sqrt(torch.tensor(4.0))).float()

    m = M().eval()
    x = torch.randn(3, 8)
    want = m(x).detach().numpy()

    from flexflow_tpu.torch_frontend import from_torch_module

    ff = from_torch_module(m, [(8,)], batch_size=3)
    ff.compile()
    from flexflow_tpu.torch_frontend import apply_torch_weights

    apply_torch_weights(ff)
    got = np.asarray(ff.forward(x.numpy()))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_fx_round3_module_breadth():
    """Conv1d / PReLU / Softplus / Mish / GLU / ZeroPad2d / Upsample vs torch."""
    class M(tnn.Module):
        def __init__(self):
            super().__init__()
            self.c1 = tnn.Conv1d(4, 6, 3, stride=2, padding=1)
            self.prelu = tnn.PReLU(num_parameters=6, init=0.1)
            self.sp = tnn.Softplus()
            self.mish = tnn.Mish()

        def forward(self, x):
            h = self.prelu(self.c1(x))
            return self.mish(self.sp(h))

    with torch.no_grad():
        m = M()
        m.prelu.weight.mul_(torch.arange(1, 7) * 0.3)
    _compare(m, [(4, 10)])


def test_fx_pad_upsample_glu():
    class M(tnn.Module):
        def __init__(self):
            super().__init__()
            self.pad = tnn.ZeroPad2d((1, 2, 0, 1))
            self.up = tnn.Upsample(scale_factor=2, mode="nearest")
            self.conv = tnn.Conv2d(2, 4, 3)

        def forward(self, x):
            h = self.up(self.pad(x))
            h = self.conv(h)
            return F.glu(h, dim=1)

    _compare(M(), [(2, 5, 5)])


def test_fx_functional_linear_layernorm_embedding():
    """F.linear/F.layer_norm with get_attr constant weights; F.embedding."""
    class M(tnn.Module):
        def __init__(self):
            super().__init__()
            self.w = tnn.Parameter(torch.randn(6, 8))
            self.b = tnn.Parameter(torch.randn(6))
            self.g = tnn.Parameter(torch.randn(6))
            self.emb = tnn.Parameter(torch.randn(16, 6))

        def forward(self, x, ids):
            h = F.linear(x, self.w, self.b)
            h = F.layer_norm(h, (6,), weight=self.g)
            return h + F.embedding(ids, self.emb)

    torch.manual_seed(0)
    m = M().eval()
    batch = 3
    from flexflow_tpu.torch_frontend import from_torch_module
    import jax.numpy as jnp
    ff = from_torch_module(m, [(4, 8), (4,)], batch_size=batch,
                           input_dtypes=[jnp.float32, jnp.int32])
    ff.compile(optimizer=None)
    apply_torch_weights(ff)
    rng = np.random.RandomState(0)
    x = rng.randn(batch, 4, 8).astype(np.float32)
    ids = rng.randint(0, 16, size=(batch, 4)).astype(np.int32)
    with torch.no_grad():
        want = m(torch.tensor(x), torch.tensor(ids)).numpy()
    got = np.asarray(ff.forward([x, ids]))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)


def test_fx_tensor_method_breadth():
    """expand/repeat/masked_fill/amax/abs/flatten(start_dim)/maximum."""
    class M(tnn.Module):
        def __init__(self):
            super().__init__()
            self.register_buffer("mask", (torch.arange(6) % 2 == 0))

        def forward(self, x):
            a = x.abs().amax(dim=-1, keepdim=True)      # [B, 4, 1]
            b = a.expand(-1, 4, 6)                       # broadcast
            c = x.masked_fill(self.mask, -1.5)
            d = torch.maximum(b, c).flatten(1)           # [B, 24]
            e = x.unsqueeze(1).repeat(1, 2, 1, 1)        # [B, 2, 4, 6]
            return d.sum(dim=-1, keepdim=True) + e.flatten(1).sum(
                dim=-1, keepdim=True)

    _compare(M(), [(4, 6)])


def test_fx_masked_fill_neg_inf():
    """masked_fill with -inf must not NaN (select, not arithmetic blending):
    the canonical attention pattern softmax(x.masked_fill(mask, -inf))."""
    class M(tnn.Module):
        def __init__(self):
            super().__init__()
            self.register_buffer("mask", (torch.arange(6) % 2 == 0))

        def forward(self, x):
            return F.softmax(x.masked_fill(self.mask, float("-inf")), dim=-1)

    _compare(M(), [(4, 6)])


def test_fx_functional_prelu_channel():
    """F.prelu with per-channel weight [C] on [B, C, H, W] applies along
    dim 1 (torch semantics), not the trailing dim."""
    class M(tnn.Module):
        def __init__(self):
            super().__init__()
            self.w = tnn.Parameter(torch.arange(1, 4).float() * 0.1)

        def forward(self, x):
            return F.prelu(x, self.w)

    _compare(M(), [(3, 5, 6)])


def test_fx_expand_int_dtype():
    """expand on an integer tensor keeps integer values (no silent f32
    promotion through the broadcast-by-add lowering)."""
    class M(tnn.Module):
        def forward(self, x):
            idx = x.argmax(dim=-1, keepdim=True)  # [B, 4, 1] int64
            e = idx.expand(-1, 4, 6)
            return e.float().sum(dim=-1)

    _compare(M(), [(4, 6)])


def test_fx_upsample_size():
    """nn.Upsample(size=...) derives the integer scale from the input."""
    class M(tnn.Module):
        def __init__(self):
            super().__init__()
            self.up = tnn.Upsample(size=(8, 12), mode="nearest")

        def forward(self, x):
            return self.up(x)

    _compare(M(), [(2, 4, 6)])
