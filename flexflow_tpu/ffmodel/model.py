"""FFModel — the layer-graph construction DSL + training executor.

TPU-native rebuild of the reference's ``FFModel`` core
(/root/reference/include/flexflow/model.h:433 — the tensor-ops DSL
``exp/add/dense/conv2d/...`` model.h:445-846, ``compile()`` model.h:1086, and
``forward/backward/update`` model.h:1066-1074 driven by the python ``fit()``
flexflow_cffi.py:4517). The reference lowers the layer list to a parallel op
graph executed by per-op Legion index launches; here ``compile()`` lowers the
same graph to ONE jitted XLA program per step (forward + loss + backward +
optimizer update fused), with DP/TP left to GSPMD via an optional mesh.

Shapes follow the reference convention: the leading dim of every tensor is the
batch dim. The graph is static; control flow stays in Python at build time.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from flexflow_tpu.ops import activations as act_lib
from flexflow_tpu.ops import nn as nn_ops
from flexflow_tpu.ops import norms as norm_ops
from flexflow_tpu.training import losses as loss_lib
from flexflow_tpu.training import metrics as metrics_lib
from flexflow_tpu.training.metrics import PerfMetrics


@dataclasses.dataclass(frozen=True)
class Tensor:
    """Symbolic handle into the layer graph (reference TensorBase)."""

    node: int
    index: int  # output index within the node (for multi-output ops)
    shape: Tuple[int, ...]
    dtype: Any

    @property
    def ndim(self):
        return len(self.shape)


@dataclasses.dataclass
class _Node:
    op: str
    inputs: List[Tensor]
    attrs: Dict[str, Any]
    out_shapes: List[Tuple[int, ...]]
    out_dtypes: List[Any]
    name: str = ""


_ACT = {
    None: None,
    "relu": act_lib.relu,
    "sigmoid": jax.nn.sigmoid,
    "tanh": jnp.tanh,
    "gelu": act_lib.gelu,
    "elu": jax.nn.elu,
    "silu": act_lib.silu,
}


class FFModel:
    """Layer-graph builder + compiled training/inference executor."""

    def __init__(self, seed: int = 0, mesh=None):
        self._nodes: List[_Node] = []
        self._inputs: List[int] = []
        self._seed = seed
        self._mesh = mesh
        self._compiled = None
        self.params: Dict[str, Any] = {}
        self.state: Dict[str, Any] = {}
        self.metrics = PerfMetrics()
        # per-node weight penalties (keras kernel_regularizer analog;
        # reference python/flexflow/keras/regularizers.py)
        self._regularizers: Dict[str, Tuple[float, float]] = {}
        # per-node kernel-initializer overrides (keras kernel_initializer;
        # reference keras/initializers.py + initializer.cc tasks)
        self._initializers: Dict[str, Any] = {}

    # ------------------------------------------------------------------
    # graph construction
    # ------------------------------------------------------------------

    def _add(self, op, inputs, attrs, out_shapes, out_dtypes, name="") -> List[Tensor]:
        nid = len(self._nodes)
        self._nodes.append(_Node(op, list(inputs), attrs, out_shapes, out_dtypes,
                                 name or f"{op}_{nid}"))
        return [
            Tensor(nid, i, tuple(s), d)
            for i, (s, d) in enumerate(zip(out_shapes, out_dtypes))
        ]

    def create_tensor(self, dims: Sequence[int], dtype=jnp.float32) -> Tensor:
        [t] = self._add("input", [], {}, [tuple(dims)], [dtype])
        self._inputs.append(t.node)
        return t

    def constant(self, value, dtype=None, name: str = "") -> Tensor:
        """Frozen (non-trainable) tensor constant baked into the graph.

        The analog of the reference torch tracer routing module attributes
        through ATTRIBUTE ops (python/flexflow/torch/model.py); used by the
        fx frontend for F.linear weights, PReLU slopes, buffers, etc."""
        arr = np.asarray(value)
        dt = dtype or (jnp.float32 if arr.dtype.kind == "f" else jnp.int32)
        [t] = self._add("constant", [], {"value": arr, "dtype": dt},
                        [arr.shape], [dt], name)
        return t

    # --- elementwise unary (reference ElementUnary, model.h:445-530) ---

    def _unary(self, op, x, **attrs):
        [t] = self._add(op, [x], attrs, [x.shape], [x.dtype])
        return t

    def exp(self, x): return self._unary("exp", x)
    def log(self, x): return self._unary("log", x)
    def sin(self, x): return self._unary("sin", x)
    def cos(self, x): return self._unary("cos", x)
    def sqrt(self, x): return self._unary("sqrt", x)
    def rsqrt(self, x): return self._unary("rsqrt", x)
    def relu(self, x): return self._unary("relu", x)
    def sigmoid(self, x): return self._unary("sigmoid", x)
    def tanh(self, x): return self._unary("tanh", x)
    def elu(self, x): return self._unary("elu", x)
    def gelu(self, x): return self._unary("gelu", x)
    def silu(self, x): return self._unary("silu", x)
    def hardswish(self, x): return self._unary("hardswish", x)
    def hardsigmoid(self, x): return self._unary("hardsigmoid", x)
    def softplus(self, x): return self._unary("softplus", x)
    def mish(self, x): return self._unary("mish", x)
    def identity(self, x): return self._unary("identity", x)

    def leaky_relu(self, x, negative_slope: float = 0.01):
        return self._unary("leaky_relu", x, negative_slope=negative_slope)

    def clamp(self, x, min_val=None, max_val=None):
        return self._unary("clamp", x, min_val=min_val, max_val=max_val)
    def pow(self, x, exponent: float): return self._unary("pow", x, exponent=exponent)
    def scalar_add(self, x, scalar: float): return self._unary("scalar_add", x, scalar=scalar)
    def scalar_sub(self, x, scalar: float): return self._unary("scalar_sub", x, scalar=scalar)
    def scalar_multiply(self, x, scalar: float): return self._unary("scalar_mul", x, scalar=scalar)
    def scalar_true_divide(self, x, scalar: float): return self._unary("scalar_div", x, scalar=scalar)

    def softmax(self, x, axis: int = -1):
        return self._unary("softmax", x, axis=axis)

    # --- elementwise binary (reference ElementBinary) ---

    def _binary(self, op, a, b):
        shape = np.broadcast_shapes(a.shape, b.shape)
        [t] = self._add(op, [a, b], {}, [tuple(shape)], [a.dtype])
        return t

    def add(self, a, b): return self._binary("add", a, b)
    def subtract(self, a, b): return self._binary("sub", a, b)
    def multiply(self, a, b): return self._binary("mul", a, b)
    def divide(self, a, b): return self._binary("div", a, b)
    def max(self, a, b): return self._binary("max", a, b)
    def min(self, a, b): return self._binary("min", a, b)

    def where(self, cond, a, b):
        """Elementwise select: ``cond ? a : b`` (broadcasting).

        Select semantics (NOT arithmetic blending): non-finite values on the
        unselected branch never contaminate the result — the masked_fill
        lowering needs this for ``float('-inf')`` fills."""
        shape = np.broadcast_shapes(cond.shape, a.shape, b.shape)
        [t] = self._add("where", [cond, a, b], {}, [tuple(shape)], [a.dtype])
        return t

    # --- dense / conv / pool / norm (reference model.h:543-700) ---

    def dense(self, x, out_dim: int, activation: Optional[str] = None,
              use_bias: bool = True, name: str = ""):
        shape = x.shape[:-1] + (out_dim,)
        [t] = self._add(
            "dense", [x],
            {"out_dim": out_dim, "activation": activation, "use_bias": use_bias},
            [shape], [x.dtype], name,
        )
        return t

    def conv2d(self, x, out_channels: int, kernel_h: int, kernel_w: int,
               stride_h: int = 1, stride_w: int = 1, padding_h: int = 0,
               padding_w: int = 0, activation: Optional[str] = None,
               groups: int = 1, use_bias: bool = True, name: str = ""):
        n, c, h, w = x.shape
        oh = (h + 2 * padding_h - kernel_h) // stride_h + 1
        ow = (w + 2 * padding_w - kernel_w) // stride_w + 1
        [t] = self._add(
            "conv2d", [x],
            dict(out_channels=out_channels, kernel=(kernel_h, kernel_w),
                 stride=(stride_h, stride_w), padding=(padding_h, padding_w),
                 activation=activation, groups=groups, use_bias=use_bias),
            [(n, out_channels, oh, ow)], [x.dtype], name,
        )
        return t

    def conv2d_transpose(self, x, out_channels: int, kernel_h: int,
                         kernel_w: int, stride_h: int = 1, stride_w: int = 1,
                         padding_h: int = 0, padding_w: int = 0,
                         output_padding_h: int = 0, output_padding_w: int = 0,
                         activation: Optional[str] = None,
                         use_bias: bool = True, name: str = ""):
        """Transposed conv (deconvolution); exceeds the reference op set
        (needed for Keras Conv2DTranspose / torch ConvTranspose2d parity)."""
        n, c, h, w = x.shape
        oh = (h - 1) * stride_h - 2 * padding_h + kernel_h + output_padding_h
        ow = (w - 1) * stride_w - 2 * padding_w + kernel_w + output_padding_w
        [t] = self._add(
            "conv2d_transpose", [x],
            dict(out_channels=out_channels, kernel=(kernel_h, kernel_w),
                 stride=(stride_h, stride_w), padding=(padding_h, padding_w),
                 output_padding=(output_padding_h, output_padding_w),
                 activation=activation, use_bias=use_bias),
            [(n, out_channels, oh, ow)], [x.dtype], name,
        )
        return t

    def group_norm(self, x, num_groups: int, eps: float = 1e-5,
                   affine: bool = True, name: str = ""):
        """GroupNorm over [N, C, ...] channels split into num_groups."""
        assert x.shape[1] % num_groups == 0, "C must divide into groups"
        [t] = self._add("group_norm", [x],
                        dict(num_groups=num_groups, eps=eps, affine=affine),
                        [x.shape], [x.dtype], name)
        return t

    def pool2d(self, x, kernel_h: int, kernel_w: int, stride_h: int = 1,
               stride_w: int = 1, padding_h: int = 0, padding_w: int = 0,
               pool_type: str = "max", name: str = ""):
        n, c, h, w = x.shape
        oh = (h + 2 * padding_h - kernel_h) // stride_h + 1
        ow = (w + 2 * padding_w - kernel_w) // stride_w + 1
        [t] = self._add(
            "pool2d", [x],
            dict(kernel=(kernel_h, kernel_w), stride=(stride_h, stride_w),
                 padding=(padding_h, padding_w), pool_type=pool_type),
            [(n, c, oh, ow)], [x.dtype], name,
        )
        return t

    def batch_norm(self, x, relu: bool = True, momentum: float = 0.9,
                   eps: float = 1e-5, name: str = ""):
        [t] = self._add("batch_norm", [x],
                        dict(relu=relu, momentum=momentum, eps=eps),
                        [x.shape], [x.dtype], name)
        return t

    def layer_norm(self, x, elementwise_affine: bool = True, eps: float = 1e-5,
                   use_bias: bool = True, name: str = ""):
        [t] = self._add("layer_norm", [x],
                        dict(affine=elementwise_affine, eps=eps, use_bias=use_bias),
                        [x.shape], [x.dtype], name)
        return t

    def rms_norm(self, x, eps: float = 1e-6, name: str = ""):
        [t] = self._add("rms_norm", [x], dict(eps=eps), [x.shape], [x.dtype], name)
        return t

    def residual_layer_norm(self, x, residual, eps: float = 1e-5, name: str = ""):
        [res, out] = self._add("residual_layer_norm", [x, residual],
                               dict(eps=eps), [x.shape, x.shape],
                               [x.dtype, x.dtype], name)
        return res, out

    def residual_rms_norm(self, x, residual, eps: float = 1e-6, name: str = ""):
        [res, out] = self._add("residual_rms_norm", [x, residual],
                               dict(eps=eps), [x.shape, x.shape],
                               [x.dtype, x.dtype], name)
        return res, out

    def sigmoid_silu_multi(self, gate, up, name: str = ""):
        [t] = self._add("sigmoid_silu_multi", [gate, up], {},
                        [gate.shape], [gate.dtype], name)
        return t

    def embedding(self, x, num_entries: int, out_dim: int, aggr: str = "none",
                  name: str = ""):
        if aggr == "none":
            shape = x.shape + (out_dim,)
        else:
            shape = x.shape[:-1] + (out_dim,)
        [t] = self._add("embedding", [x],
                        dict(num_entries=num_entries, out_dim=out_dim, aggr=aggr),
                        [shape], [jnp.float32], name)
        return t

    def dropout(self, x, rate: float = 0.5, name: str = ""):
        [t] = self._add("dropout", [x], dict(rate=rate), [x.shape], [x.dtype], name)
        return t

    # --- data movement (reference concat/split/reshape/transpose/flat/...) ---

    def flat(self, x, name: str = ""):
        shape = (x.shape[0], int(np.prod(x.shape[1:])))
        [t] = self._add("flat", [x], {}, [shape], [x.dtype], name)
        return t

    def reshape(self, x, shape: Sequence[int], name: str = ""):
        [t] = self._add("reshape", [x], dict(shape=tuple(shape)),
                        [tuple(shape)], [x.dtype], name)
        return t

    def transpose(self, x, perm: Sequence[int], name: str = ""):
        shape = tuple(x.shape[p] for p in perm)
        [t] = self._add("transpose", [x], dict(perm=tuple(perm)),
                        [shape], [x.dtype], name)
        return t

    def concat(self, tensors: Sequence[Tensor], axis: int, name: str = ""):
        axis = axis % tensors[0].ndim
        dim = sum(t.shape[axis] for t in tensors)
        shape = list(tensors[0].shape)
        shape[axis] = dim
        [t] = self._add("concat", list(tensors), dict(axis=axis),
                        [tuple(shape)], [tensors[0].dtype], name)
        return t

    def split(self, x, sizes: Sequence[int], axis: int, name: str = ""):
        axis = axis % x.ndim
        shapes = []
        for s in sizes:
            sh = list(x.shape)
            sh[axis] = s
            shapes.append(tuple(sh))
        return self._add("split", [x], dict(sizes=tuple(sizes), axis=axis),
                         shapes, [x.dtype] * len(sizes), name)

    def cast(self, x, dtype, name: str = ""):
        [t] = self._add("cast", [x], dict(dtype=dtype), [x.shape], [dtype], name)
        return t

    def slice_tensor(self, x, slices, name: str = ""):
        """Basic indexing: per-dim entry is an int (dim squeezed) or a
        (start, stop, step) triple (any may be None). Dims beyond
        ``len(slices)`` pass through (torch ``x[...]`` getitem semantics)."""
        shape = []
        norm = []
        for i, s in enumerate(x.shape):
            if i < len(slices):
                sl = slices[i]
                if isinstance(sl, int):
                    norm.append(sl % s)
                    continue  # dim squeezed
                start, stop, step = sl
                norm.append((start, stop, step))
                shape.append(len(range(*slice(start, stop, step).indices(s))))
            else:
                shape.append(s)
        [t] = self._add("slice", [x], dict(slices=tuple(norm)),
                        [tuple(shape)], [x.dtype], name)
        return t

    def reverse(self, x, axis: int, name: str = ""):
        [t] = self._add("reverse", [x], dict(axis=axis), [x.shape], [x.dtype], name)
        return t

    def gather(self, x, index: Tensor, axis: int, name: str = ""):
        [t] = self._add("gather", [x, index], dict(axis=axis),
                        [index.shape], [x.dtype], name)
        return t

    def take(self, x, index: Tensor, axis: int, name: str = ""):
        """Index rows of ``x`` along ``axis`` (torch F.embedding analog:
        take(weight, ids, 0) -> ids.shape + weight.shape[1:])."""
        axis = axis % x.ndim
        shape = x.shape[:axis] + index.shape + x.shape[axis + 1:]
        [t] = self._add("take", [x, index], dict(axis=axis),
                        [shape], [x.dtype], name)
        return t

    def mean(self, x, dims: Sequence[int], keepdims: bool = False, name: str = ""):
        shape = [s for i, s in enumerate(x.shape)
                 if i not in dims or keepdims]
        if keepdims:
            shape = [1 if i in dims else s for i, s in enumerate(x.shape)]
        [t] = self._add("mean", [x], dict(dims=tuple(dims), keepdims=keepdims),
                        [tuple(shape)], [x.dtype], name)
        return t

    def pad(self, x, pad_width: Sequence[Tuple[int, int]], value: float = 0.0,
            name: str = ""):
        """Constant-pad (torch ZeroPad2d / F.pad analog). ``pad_width`` is
        one (lo, hi) pair per dim, numpy style."""
        pw = tuple((int(lo), int(hi)) for lo, hi in pad_width)
        shape = tuple(s + lo + hi for s, (lo, hi) in zip(x.shape, pw))
        [t] = self._add("pad", [x], {"pad_width": pw, "value": value},
                        [shape], [x.dtype], name)
        return t

    def reduce_max(self, x, axes: Sequence[int], keepdims: bool = False,
                   name: str = ""):
        return self._reduce("reduce_max", x, axes, keepdims, name)

    def reduce_min(self, x, axes: Sequence[int], keepdims: bool = False,
                   name: str = ""):
        return self._reduce("reduce_min", x, axes, keepdims, name)

    def _reduce(self, op, x, axes, keepdims, name):
        axes = tuple(d % x.ndim for d in axes)
        shape = tuple(
            (1 if i in axes else s) for i, s in enumerate(x.shape)
            if keepdims or i not in axes
        )
        [t] = self._add(op, [x], {"axes": axes, "keepdims": keepdims},
                        [shape], [x.dtype], name)
        return t

    def reduce_sum(self, x, axes: Sequence[int], keepdims: bool = False,
                   name: str = ""):
        if keepdims:
            shape = [1 if i in axes else s for i, s in enumerate(x.shape)]
        else:
            shape = [s for i, s in enumerate(x.shape) if i not in axes]
        [t] = self._add("reduce_sum", [x], dict(axes=tuple(axes), keepdims=keepdims),
                        [tuple(shape)], [x.dtype], name)
        return t

    def batch_matmul(self, a, b, name: str = ""):
        shape = a.shape[:-1] + (b.shape[-1],)
        [t] = self._add("batch_matmul", [a, b], {}, [shape], [a.dtype], name)
        return t

    # --- attention (training-style MHA, reference src/ops/attention.cc) ---

    def multihead_attention(self, query, key, value, embed_dim: int,
                            num_heads: int, causal: bool = False,
                            name: str = ""):
        shape = query.shape[:-1] + (embed_dim,)
        [t] = self._add("mha", [query, key, value],
                        dict(embed_dim=embed_dim, num_heads=num_heads,
                             causal=causal),
                        [shape], [query.dtype], name)
        return t

    # --- top-k / sampling heads ---

    def top_k(self, x, k: int, name: str = ""):
        shape = x.shape[:-1] + (k,)
        return self._add("top_k", [x], dict(k=k), [shape, shape],
                         [x.dtype, jnp.int32], name)

    def arg_top_k(self, x, k: int, name: str = ""):
        shape = x.shape[:-1] + (k,)
        [t] = self._add("arg_top_k", [x], dict(k=k), [shape], [jnp.int32], name)
        return t

    def argmax(self, x, name: str = ""):
        [t] = self._add("argmax", [x], {}, [x.shape[:-1]], [jnp.int32], name)
        return t

    # --- MoE composite (reference src/ops/moe.cc:20-60 wiring:
    #     gate -> topk -> group_by -> experts -> aggregate) ---

    def moe(self, x, num_experts: int, top_k: int, expert_hidden: int,
            out_dim: int, alpha: float = 2.0, name: str = ""):
        shape = x.shape[:-1] + (out_dim,)
        [t] = self._add("moe", [x],
                        dict(num_experts=num_experts, top_k=top_k,
                             expert_hidden=expert_hidden, out_dim=out_dim,
                             alpha=alpha),
                        [shape], [x.dtype], name)
        return t

    # ------------------------------------------------------------------
    # compile: params init + single-program step functions
    # ------------------------------------------------------------------

    def set_regularizer(self, node_name: str, l1: float = 0.0,
                        l2: float = 0.0) -> None:
        """Attach an L1/L2 kernel penalty to a node's weights (keras
        kernel_regularizer; applies to "w" leaves, not biases). Call before
        compile()."""
        if l1 or l2:
            self._regularizers[node_name] = (float(l1), float(l2))

    def set_learning_rate(self, lr: float) -> None:
        """Change the optimizer learning rate mid-training (keras
        LearningRateScheduler). The jitted train step bakes the lr at trace
        time, so this re-derives the step functions; optimizer slot state is
        preserved."""
        assert self._compiled, "call compile() first"
        import dataclasses as _dc

        self.optimizer = _dc.replace(self.optimizer, lr=float(lr))
        params, state = self.params, self.state
        opt_state, metrics = self.opt_state, self.metrics
        self.compile(optimizer=self.optimizer, loss_type=self.loss_type,
                     metrics=self._metric_names)
        self.params, self.state = params, state
        self.opt_state, self.metrics = opt_state, metrics

    def set_initializer(self, node_name: str, init) -> None:
        """Override a node's kernel initializer (keras kernel_initializer);
        ``init(shape, fan_in, fan_out, key)`` returns the array."""
        self._initializers[node_name] = init

    def _init_node(self, node: _Node, key) -> Tuple[Dict, Dict]:
        """Returns (params, state) for one node."""
        override = self._initializers.get(node.name)

        def glorot(shape, fan_in, fan_out, k):
            if override is not None:
                return jnp.asarray(override(shape, fan_in, fan_out, k))
            return _glorot_base(shape, fan_in, fan_out, k)

        def _glorot_base(shape, fan_in, fan_out, k):
            scale = np.sqrt(2.0 / (fan_in + fan_out))
            return jax.random.normal(k, shape, jnp.float32) * scale

        a = node.attrs
        if node.op == "dense":
            d_in = node.inputs[0].shape[-1]
            k1, k2 = jax.random.split(key)
            p = {"w": glorot((d_in, a["out_dim"]), d_in, a["out_dim"], k1)}
            if a["use_bias"]:
                p["b"] = jnp.zeros((a["out_dim"],))
            return p, {}
        if node.op == "conv2d":
            c_in = node.inputs[0].shape[1] // a["groups"]
            kh, kw = a["kernel"]
            fan_in = c_in * kh * kw
            p = {"w": glorot((a["out_channels"], c_in, kh, kw), fan_in,
                             a["out_channels"], key)}
            if a["use_bias"]:
                p["b"] = jnp.zeros((a["out_channels"],))
            return p, {}
        if node.op == "conv2d_transpose":
            c_in = node.inputs[0].shape[1]
            kh, kw = a["kernel"]
            p = {"w": glorot((c_in, a["out_channels"], kh, kw),
                             c_in * kh * kw, a["out_channels"], key)}
            if a["use_bias"]:
                p["b"] = jnp.zeros((a["out_channels"],))
            return p, {}
        if node.op == "group_norm":
            c = node.inputs[0].shape[1]
            if a.get("affine", True):
                return {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,))}, {}
            return {}, {}
        if node.op == "batch_norm":
            c = node.inputs[0].shape[1]
            return (
                {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,))},
                {"mean": jnp.zeros((c,)), "var": jnp.ones((c,))},
            )
        if node.op in ("layer_norm", "residual_layer_norm"):
            d = node.inputs[0].shape[-1]
            p = {}
            if a.get("affine", True):
                p["scale"] = jnp.ones((d,))
                if a.get("use_bias", True):
                    p["bias"] = jnp.zeros((d,))
            return p, {}
        if node.op in ("rms_norm", "residual_rms_norm"):
            d = node.inputs[0].shape[-1]
            return {"scale": jnp.ones((d,))}, {}
        if node.op == "embedding":
            k = key
            return {"w": glorot((a["num_entries"], a["out_dim"]),
                                a["num_entries"], a["out_dim"], k)}, {}
        if node.op == "mha":
            d = node.inputs[0].shape[-1]
            e = a["embed_dim"]
            ks = jax.random.split(key, 4)
            return {
                "wq": glorot((d, e), d, e, ks[0]),
                "wk": glorot((node.inputs[1].shape[-1], e), d, e, ks[1]),
                "wv": glorot((node.inputs[2].shape[-1], e), d, e, ks[2]),
                "wo": glorot((e, e), e, e, ks[3]),
            }, {}
        if node.op == "moe":
            d = node.inputs[0].shape[-1]
            e, hdim, od = a["num_experts"], a["expert_hidden"], a["out_dim"]
            ks = jax.random.split(key, 3)
            return {
                "gate": glorot((d, e), d, e, ks[0]),
                "w1": glorot((e, d, hdim), d, hdim, ks[1]),
                "b1": jnp.zeros((e, hdim)),
                "w2": glorot((e, hdim, od), hdim, od, ks[2]),
                "b2": jnp.zeros((e, od)),
            }, {}
        return {}, {}

    def _apply_node(self, node: _Node, p, s, xs, train: bool, rng):
        """Evaluate one node; returns (outputs list, new_state)."""
        a = node.attrs
        op = node.op
        if op in ("exp", "log", "sin", "cos", "sqrt", "relu", "sigmoid",
                  "tanh", "elu", "gelu", "identity", "rsqrt", "silu",
                  "hardswish", "hardsigmoid", "softplus", "mish"):
            fn = {"exp": jnp.exp, "log": jnp.log, "sin": jnp.sin,
                  "cos": jnp.cos, "sqrt": jnp.sqrt, "rsqrt": jax.lax.rsqrt,
                  "relu": act_lib.relu, "sigmoid": jax.nn.sigmoid,
                  "tanh": jnp.tanh, "elu": jax.nn.elu, "gelu": act_lib.gelu,
                  "silu": jax.nn.silu, "hardswish": jax.nn.hard_swish,
                  "hardsigmoid": jax.nn.hard_sigmoid,
                  "softplus": jax.nn.softplus,
                  "mish": lambda x: x * jnp.tanh(jax.nn.softplus(x)),
                  "identity": lambda x: x}[op]
            return [fn(xs[0])], s
        if op == "constant":
            return [jnp.asarray(a["value"], a["dtype"])], s
        if op == "pad":
            return [jnp.pad(xs[0], a["pad_width"],
                            constant_values=a["value"])], s
        if op == "reduce_max":
            return [jnp.max(xs[0], axis=a["axes"], keepdims=a["keepdims"])], s
        if op == "reduce_min":
            return [jnp.min(xs[0], axis=a["axes"], keepdims=a["keepdims"])], s
        if op == "leaky_relu":
            return [jax.nn.leaky_relu(xs[0], a["negative_slope"])], s
        if op == "clamp":
            return [jnp.clip(xs[0], a["min_val"], a["max_val"])], s
        if op == "slice":
            idx = tuple(
                sl if isinstance(sl, int) else slice(*sl)
                for sl in a["slices"]
            )
            return [xs[0][idx]], s
        if op == "pow":
            return [jnp.power(xs[0], a["exponent"])], s
        if op == "scalar_add":
            return [xs[0] + a["scalar"]], s
        if op == "scalar_sub":
            return [xs[0] - a["scalar"]], s
        if op == "scalar_mul":
            return [xs[0] * a["scalar"]], s
        if op == "scalar_div":
            return [xs[0] / a["scalar"]], s
        if op == "softmax":
            return [jax.nn.softmax(xs[0], axis=a["axis"])], s
        if op in ("add", "sub", "mul", "div", "max", "min"):
            fn = {"add": jnp.add, "sub": jnp.subtract, "mul": jnp.multiply,
                  "div": jnp.divide, "max": jnp.maximum, "min": jnp.minimum}[op]
            return [fn(xs[0], xs[1])], s
        if op == "where":
            return [jnp.where(xs[0] != 0, xs[1], xs[2])], s
        if op == "dense":
            y = xs[0] @ p["w"]
            if "b" in p:
                y = y + p["b"]
            act = _ACT[a["activation"]]
            return [act(y) if act else y], s
        if op == "conv2d":
            y = nn_ops.conv2d(xs[0], p["w"], p.get("b"), a["stride"],
                              a["padding"], a["groups"])
            act = _ACT[a["activation"]]
            return [act(y) if act else y], s
        if op == "conv2d_transpose":
            y = nn_ops.conv2d_transpose(xs[0], p["w"], p.get("b"), a["stride"],
                                        a["padding"], a["output_padding"])
            act = _ACT[a["activation"]]
            return [act(y) if act else y], s
        if op == "group_norm":
            return [nn_ops.group_norm(xs[0], a["num_groups"], p.get("scale"),
                                      p.get("bias"), a["eps"])], s
        if op == "pool2d":
            return [nn_ops.pool2d(xs[0], a["kernel"], a["stride"],
                                  a["padding"], a["pool_type"])], s
        if op == "batch_norm":
            if train:
                y, m, v = nn_ops.batch_norm_train(
                    xs[0], p["scale"], p["bias"], s["mean"], s["var"],
                    a["momentum"], a["eps"])
                s = {"mean": m, "var": v}
            else:
                y = nn_ops.batch_norm_infer(xs[0], p["scale"], p["bias"],
                                            s["mean"], s["var"], a["eps"])
            return [act_lib.relu(y) if a["relu"] else y], s
        if op == "layer_norm":
            return [norm_ops.layer_norm(xs[0], p.get("scale", jnp.ones(xs[0].shape[-1])),
                                        p.get("bias"), a["eps"])], s
        if op == "rms_norm":
            return [norm_ops.rms_norm(xs[0], p["scale"], a["eps"])], s
        if op == "residual_layer_norm":
            res, out = norm_ops.residual_layer_norm(
                xs[0], xs[1], p.get("scale", jnp.ones(xs[0].shape[-1])),
                p.get("bias"), a["eps"])
            return [res, out], s
        if op == "residual_rms_norm":
            res, out = norm_ops.residual_rms_norm(xs[0], xs[1], p["scale"], a["eps"])
            return [res, out], s
        if op == "sigmoid_silu_multi":
            return [act_lib.sigmoid_silu_multi(xs[0], xs[1])], s
        if op == "embedding":
            return [nn_ops.embedding_lookup(xs[0], p["w"], a["aggr"])], s
        if op == "dropout":
            if train and rng is not None:
                return [nn_ops.dropout(xs[0], a["rate"], rng)], s
            return [xs[0]], s
        if op == "flat":
            return [nn_ops.flat(xs[0])], s
        if op == "reshape":
            return [xs[0].reshape(a["shape"])], s
        if op == "transpose":
            return [jnp.transpose(xs[0], a["perm"])], s
        if op == "concat":
            return [jnp.concatenate(xs, axis=a["axis"])], s
        if op == "split":
            outs = []
            start = 0
            for size in a["sizes"]:
                idx = [slice(None)] * xs[0].ndim
                idx[a["axis"]] = slice(start, start + size)
                outs.append(xs[0][tuple(idx)])
                start += size
            return outs, s
        if op == "cast":
            return [xs[0].astype(a["dtype"])], s
        if op == "reverse":
            return [nn_ops.reverse(xs[0], a["axis"])], s
        if op == "gather":
            return [nn_ops.gather(xs[0], xs[1], a["axis"])], s
        if op == "take":
            return [jnp.take(xs[0], xs[1], axis=a["axis"])], s
        if op == "mean":
            return [jnp.mean(xs[0], axis=a["dims"], keepdims=a["keepdims"])], s
        if op == "reduce_sum":
            return [jnp.sum(xs[0], axis=a["axes"], keepdims=a["keepdims"])], s
        if op == "batch_matmul":
            return [nn_ops.batch_matmul(xs[0], xs[1])], s
        if op == "mha":
            q = xs[0] @ p["wq"]
            k = xs[1] @ p["wk"]
            v = xs[2] @ p["wv"]
            nh = a["num_heads"]
            b, tq, e = q.shape
            tk = k.shape[1]
            hd = e // nh
            qh = q.reshape(b, tq, nh, hd).transpose(0, 2, 1, 3)
            kh = k.reshape(b, tk, nh, hd).transpose(0, 2, 1, 3)
            vh = v.reshape(b, tk, nh, hd).transpose(0, 2, 1, 3)
            scores = qh @ kh.transpose(0, 1, 3, 2) / np.sqrt(hd)
            if a["causal"]:
                mask = jnp.tril(jnp.ones((tq, tk), bool))
                scores = jnp.where(mask, scores, -1e30)
            probs = jax.nn.softmax(scores, axis=-1)
            out = (probs @ vh).transpose(0, 2, 1, 3).reshape(b, tq, e)
            return [out @ p["wo"]], s
        if op == "top_k":
            vals, idx = jax.lax.top_k(xs[0], a["k"])
            return [vals, idx.astype(jnp.int32)], s
        if op == "arg_top_k":
            _, idx = jax.lax.top_k(xs[0], a["k"])
            return [idx.astype(jnp.int32)], s
        if op == "argmax":
            return [jnp.argmax(xs[0], axis=-1).astype(jnp.int32)], s
        if op == "moe":
            # gate -> softmax -> top-k -> renormalize -> experts -> combine
            # (reference src/ops/moe.cc composite; exact dense routing in
            # place of GroupBy capacity-dropped dispatch)
            logits = xs[0] @ p["gate"]
            probs = jax.nn.softmax(logits, axis=-1)
            topw, topi = jax.lax.top_k(probs, a["top_k"])
            topw = topw / jnp.sum(topw, axis=-1, keepdims=True)
            combine = jnp.sum(
                jax.nn.one_hot(topi, a["num_experts"]) * topw[..., None], axis=-2
            )  # [..., E]
            h1 = jnp.einsum("...d,edf->...ef", xs[0], p["w1"]) + p["b1"]
            h1 = act_lib.relu(h1)
            h2 = jnp.einsum("...ef,efo->...eo", h1, p["w2"]) + p["b2"]
            return [jnp.sum(h2 * combine[..., None], axis=-2)], s
        raise ValueError(f"Unknown op {node.op!r}")

    def _build_apply(self):
        nodes = self._nodes

        def apply(params, state, inputs, train: bool, rng):
            values: Dict[Tuple[int, int], Any] = {}
            new_state = dict(state)
            input_iter = iter(inputs)
            rngs = (
                jax.random.split(rng, len(nodes)) if rng is not None else
                [None] * len(nodes)
            )
            for nid, node in enumerate(nodes):
                if node.op == "input":
                    values[(nid, 0)] = next(input_iter)
                    continue
                xs = [values[(t.node, t.index)] for t in node.inputs]
                outs, ns = self._apply_node(
                    node, params.get(node.name, {}), state.get(node.name, {}),
                    xs, train, rngs[nid],
                )
                if ns:
                    new_state[node.name] = ns
                for i, o in enumerate(outs):
                    values[(nid, i)] = o
            last = len(nodes) - 1
            return values[(last, 0)], new_state

        return apply

    def compile(
        self,
        optimizer=None,
        loss_type: str = "sparse_categorical_crossentropy",
        metrics: Sequence[str] = ("accuracy",),
        auto_parallel: bool = False,
    ) -> None:
        """Initialize params and build the fused jitted step functions
        (reference FFModel::compile, model.cc:3615).

        ``auto_parallel=True`` mirrors the reference running graph_optimize
        inside compile (model.cc:3636-3641): on a multi-device host the
        first ``fit`` batch triggers a measured (dp, tp) layout search over
        the DAG (dense kernels column-sharded over the model axis, batch
        over the data axis) and the winning layout's jitted steps replace
        the single-device ones. Report in ``self.auto_report``."""
        from flexflow_tpu.config import config as _ffconfig

        # graph substitutions before tracing (reference substitution.cc
        # GraphXfer rewrites, run inside compile; gated by --fusion)
        self.substitution_report = {}
        self.joint_plan = None
        if getattr(_ffconfig, "fusion", True):
            from flexflow_tpu.ffmodel.substitutions import (
                load_rules, optimize_graph,
            )

            rules = None
            if getattr(_ffconfig, "substitution_json", None):
                rules = load_rules(_ffconfig.substitution_json)
            if auto_parallel:
                # JOINT rewrite x placement search (Unity proper): rewrites
                # are accepted only when the placements they leave behind
                # still win — reference graph_optimize runs substitutions
                # and machine-view assignment in ONE search inside compile
                # (substitution.cc:1920, model.cc:3636-3641). The chosen
                # per-op views seed _auto_parallelize's measured candidates.
                from flexflow_tpu.parallel.joint import joint_optimize

                batch = 1
                for i in self._inputs:
                    shp = self._nodes[i].out_shapes[0]
                    if shp:
                        batch = max(batch, int(shp[0]))
                plan = joint_optimize(
                    self._nodes, self._inputs,
                    n_devices=max(len(jax.devices()), 2), batch=batch,
                    rules=rules,
                    budget=getattr(_ffconfig, "search_budget", 8) * 4,
                    alpha=getattr(_ffconfig, "search_alpha", 1.2),
                )
                self._nodes, self._inputs = plan.nodes, plan.input_ids
                self.joint_plan = plan
                for r, _j in plan.applied:
                    self.substitution_report[r] = (
                        self.substitution_report.get(r, 0) + 1)
            else:
                self._nodes, self._inputs, self.substitution_report = (
                    optimize_graph(self._nodes, self._inputs, rules)
                )

        key = jax.random.PRNGKey(self._seed)
        params, state = {}, {}
        for node in self._nodes:
            key, sub = jax.random.split(key)
            p, st = self._init_node(node, sub)
            if p:
                params[node.name] = p
            if st:
                state[node.name] = st
        self.params, self.state = params, state
        self.optimizer = optimizer
        self.loss_type = loss_type
        self._metric_names = tuple(metrics)
        self.loss_fn = loss_lib.LOSSES[loss_type]
        self.opt_state = optimizer.init(params) if optimizer else None
        apply = self._build_apply()
        self._apply = apply

        classification = loss_type in (
            "sparse_categorical_crossentropy", "categorical_crossentropy"
        )

        regs = dict(self._regularizers)

        def train_step(params, state, opt_state, rng, inputs, labels):
            def loss_of(p):
                out, new_state = apply(p, state, inputs, True, rng)
                loss = self.loss_fn(out, labels)
                for name, (l1, l2) in regs.items():
                    w = p[name]["w"]
                    if l2:
                        loss = loss + l2 * jnp.sum(jnp.square(w))
                    if l1:
                        loss = loss + l1 * jnp.sum(jnp.abs(w))
                return loss, (out, new_state)

            (loss, (out, new_state)), grads = jax.value_and_grad(
                loss_of, has_aux=True)(params)
            params, opt_state = self.optimizer.update(grads, opt_state, params)
            if classification:
                m = metrics_lib.classification_metrics(
                    out, labels if labels.ndim < out.ndim else jnp.argmax(labels, -1))
            else:
                m = metrics_lib.regression_metrics(out, labels)
            return params, new_state, opt_state, loss, m

        def eval_step(params, state, inputs, labels):
            out, _ = apply(params, state, inputs, False, None)
            loss = self.loss_fn(out, labels)
            if classification:
                m = metrics_lib.classification_metrics(
                    out, labels if labels.ndim < out.ndim else jnp.argmax(labels, -1))
            else:
                m = metrics_lib.regression_metrics(out, labels)
            return loss, m

        def forward_fn(params, state, inputs):
            out, _ = apply(params, state, inputs, False, None)
            return out

        self._train_step = jax.jit(train_step)
        self._eval_step = jax.jit(eval_step)
        self._forward = jax.jit(forward_fn)
        self._train_step_fn = train_step  # unjitted (auto-parallel re-jits)
        self.auto_report = None
        self._pending_auto = bool(auto_parallel) and len(jax.devices()) > 1
        self._compiled = True

    def _auto_parallelize(self, bx, by, log_fn: Callable = print) -> None:
        """Measured (dp, tp) layout search over the DAG (Unity-lite;
        reference graph_optimize inside compile, model.cc:3636-3641).

        Candidates: dp*tp == n_devices, dp | batch. Dense kernels with an
        output dim divisible by tp shard column-parallel over the model
        axis; everything else replicates; the batch shards over data.
        Each candidate's REAL train step is compiled and timed; the winner
        replaces the jitted steps and re-places params/opt state."""
        import time as _time

        from jax.sharding import NamedSharding, PartitionSpec as P

        from flexflow_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS, make_mesh

        n = len(jax.devices())
        batch = by.shape[0]
        cands = [
            (dp, n // dp) for dp in range(1, n + 1)
            if n % dp == 0 and batch % dp == 0
        ]

        def param_specs(tp):
            specs = {}
            for name, node_p in self.params.items():
                specs[name] = {}
                for k, w in node_p.items():
                    if (k == "w" and w.ndim == 2 and tp > 1
                            and w.shape[-1] % tp == 0):
                        specs[name][k] = P(None, MODEL_AXIS)
                    else:
                        specs[name][k] = P()
            return specs

        def joint_param_specs(tp):
            """Per-op specs from the joint plan's machine views (col/row
            per dense, replicated elsewhere) — the per-op machine-view
            candidate the uniform loop can't express."""
            plan = self.joint_plan
            view_by_name = {
                plan.nodes[j].name: v for j, v in plan.views.items()
                if plan.nodes[j].name
            }
            specs = {}
            for name, node_p in self.params.items():
                v = view_by_name.get(name)
                specs[name] = {}
                for k, w in node_p.items():
                    if v is not None and k == "w" and w.ndim == 2:
                        if v.name == "col" and w.shape[-1] % tp == 0:
                            specs[name][k] = P(None, MODEL_AXIS)
                            continue
                        if v.name == "row" and w.shape[0] % tp == 0:
                            specs[name][k] = P(MODEL_AXIS, None)
                            continue
                    if (v is not None and v.name == "col" and k == "b"
                            and w.ndim == 1 and w.shape[0] % tp == 0):
                        specs[name][k] = P(MODEL_AXIS)
                        continue
                    specs[name][k] = P()
            return specs

        cands = [(dp, tp, param_specs) for dp, tp in cands]
        if self.joint_plan is not None and any(
            v.name in ("col", "row") for v in self.joint_plan.views.values()
        ):
            cands.append((1, n, joint_param_specs))

        report, best = [], None
        rng = jax.random.PRNGKey(0)
        bxj = [jnp.asarray(a) for a in bx]
        byj = jnp.asarray(by)
        for dp, tp, spec_fn in cands:
            label = f"dp={dp} tp={tp}" + (
                " (joint per-op views)" if spec_fn is joint_param_specs else "")
            mesh = make_mesh(data=dp, model=tp)
            pshard = jax.tree.map(
                lambda s: NamedSharding(mesh, s), spec_fn(tp),
                is_leaf=lambda x: isinstance(x, P),
            )
            bspec = NamedSharding(mesh, P(DATA_AXIS))
            try:
                params = jax.device_put(self.params, pshard)
                opt_state = self.optimizer.init(params)
                step = jax.jit(
                    self._train_step_fn,
                    in_shardings=(None, None, None, None,
                                  [bspec] * len(bxj), bspec),
                )
                out = step(params, self.state, opt_state, rng, bxj, byj)
                jax.block_until_ready(out)  # compile + warmup
                t0 = _time.perf_counter()
                out = step(params, self.state, opt_state, rng, bxj, byj)
                jax.block_until_ready(out)
                dt = _time.perf_counter() - t0
            except Exception as e:  # illegal layout for this DAG
                report.append({"layout": label,
                               "error": f"{type(e).__name__}: {e}"})
                continue
            report.append({"layout": label, "measured_s": dt})
            if best is None or dt < best[0]:
                best = (dt, dp, tp, mesh, pshard, bspec, step)
        self.auto_report = report
        if best is None:
            log_fn("[auto-parallel] no candidate layout compiled; staying "
                   "single-device")
            return
        _, dp, tp, mesh, pshard, bspec, step = best
        log_fn(f"[auto-parallel] chose dp={dp} tp={tp} over "
               f"{len(report)} candidates")
        self.params = jax.device_put(self.params, pshard)
        self.opt_state = self.optimizer.init(self.params)
        self._train_step = step
        self._batch_sharding = bspec

    # ------------------------------------------------------------------
    # executor (reference python fit/eval, flexflow_cffi.py:4517,4561)
    # ------------------------------------------------------------------

    def _batches(self, arrays, batch_size, shuffle=False, seed=0):
        n = arrays[0].shape[0]
        idx = np.arange(n)
        if shuffle:
            np.random.RandomState(seed).shuffle(idx)
        for i in range(0, n - batch_size + 1, batch_size):
            sel = idx[i:i + batch_size]
            yield [np.asarray(a)[sel] for a in arrays]

    def fit(self, x, y, *, batch_size: int, epochs: int = 1,
            shuffle: bool = True, log_fn: Callable = print,
            log_every: int = 0) -> List[dict]:
        assert self._compiled, "call compile() first"
        xs = x if isinstance(x, (list, tuple)) else [x]
        if getattr(self, "_pending_auto", False):
            self._pending_auto = False
            first = next(self._batches(list(xs) + [y], batch_size), None)
            if first is not None:
                *bx, by = first
                self._auto_parallelize(bx, by, log_fn=log_fn)
        rng = jax.random.PRNGKey(self._seed + 1)
        history = []
        for epoch in range(epochs):
            losses = []
            self.metrics = PerfMetrics()
            for batch in self._batches(list(xs) + [y], batch_size,
                                       shuffle, seed=epoch):
                *bx, by = batch
                rng, sub = jax.random.split(rng)
                (self.params, self.state, self.opt_state, loss, m) = (
                    self._train_step(self.params, self.state, self.opt_state,
                                     sub, bx, jnp.asarray(by))
                )
                losses.append(float(loss))
                self.metrics.update({k: np.asarray(v) for k, v in m.items()})
                if log_every and len(losses) % log_every == 0:
                    log_fn(f"epoch {epoch} it {len(losses)}: "
                           f"loss={losses[-1]:.4f} acc={self.metrics.accuracy:.4f}")
            history.append({"epoch": epoch,
                            "loss": float(np.mean(losses)) if losses else 0.0,
                            "accuracy": self.metrics.accuracy})
        return history

    def evaluate(self, x, y, *, batch_size: int) -> dict:
        xs = x if isinstance(x, (list, tuple)) else [x]
        total, n = 0.0, 0
        pm = PerfMetrics()
        for batch in self._batches(list(xs) + [y], batch_size):
            *bx, by = batch
            loss, m = self._eval_step(self.params, self.state, bx, jnp.asarray(by))
            total += float(loss)
            pm.update({k: np.asarray(v) for k, v in m.items()})
            n += 1
        return {"loss": total / max(n, 1), "accuracy": pm.accuracy}

    def forward(self, x):
        xs = x if isinstance(x, (list, tuple)) else [x]
        return np.asarray(self._forward(self.params, self.state,
                                        [jnp.asarray(a) for a in xs]))

    # ------------------------------------------------------------------
    # graph export (reference export_strategy_task_graph_file / dot export,
    # config.h:194-196, src/utils/dot/record_formatter.cc)
    # ------------------------------------------------------------------

    def export_dot(self, path: Optional[str] = None) -> str:
        """Graphviz dot of the layer graph (op, name, output shapes)."""
        lines = ["digraph ffmodel {", "  rankdir=TB;",
                 '  node [shape=record, fontsize=10];']
        for nid, node in enumerate(self._nodes):
            shapes = ",".join(str(s) for s in node.out_shapes)
            label = f"{node.name}|{node.op}|{shapes}".replace("(", "[").replace(")", "]")
            lines.append(f'  n{nid} [label="{{{label}}}"];')
            for t in node.inputs:
                lines.append(f"  n{t.node} -> n{nid};")
        lines.append("}")
        dot = "\n".join(lines)
        if path:
            with open(path, "w") as f:
                f.write(dot)
        return dot
