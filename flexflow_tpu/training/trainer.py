"""Trainer: jitted train/eval steps + fit loop over a device mesh.

TPU-native equivalent of the reference training executor — the Python
``fit()``/``eval()`` loop (/root/reference/python/flexflow/core/flexflow_cffi.py:4517,4561)
driving per-iteration forward/zero_gradients/backward/update
(src/runtime/model.cc:2895-2954) under a Legion trace. Here the whole
iteration is ONE jitted XLA program (forward + backward + optimizer update +
metrics): XLA's trace is the Legion trace, GSPMD inserts the DP gradient
psum that the reference fuses into ``nccl_update_task``
(optimizer_kernel.cu:91,203).
"""

from __future__ import annotations

import time
from typing import Any, Callable, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from flexflow_tpu.models import decoder
from flexflow_tpu.parallel import sharding as sharding_lib
from flexflow_tpu.parallel.mesh import DATA_AXIS
from flexflow_tpu.specs import ModelSpec
from flexflow_tpu.training import losses as loss_lib
from flexflow_tpu.training import metrics as metrics_lib


class Trainer:
    """Causal-LM trainer over a mesh (DP batch x TP params)."""

    def __init__(
        self,
        spec: ModelSpec,
        params: Any,
        optimizer,
        *,
        mesh: Optional[Mesh] = None,
        pipeline_stages: int = 1,
        num_microbatches: Optional[int] = None,
        loss: str = "sparse_categorical_crossentropy",
        auto_batch_size: int = 8,
        auto_seq_len: int = 128,
    ):
        """``pipeline_stages`` > 1 runs the forward through the explicit
        ppermute pipeline (parallel/pipeline.py) over the mesh's pipe axis
        (layer params get stage-sliced); DP/TP stay under GSPMD.

        ``mesh="auto"`` runs the Unity-lite layout search
        (parallel/auto.py optimize_train_layout — the analog of the
        reference running graph_optimize inside FFModel::compile,
        model.cc:3636-3641): legal (dp, pp, tp) factorizations of the
        device count are ranked analytically, the top candidates are
        measured with real train steps at (auto_batch_size, auto_seq_len),
        and the winner becomes this Trainer's mesh (report in
        ``self.auto_report``)."""
        self.auto_report = None
        if isinstance(mesh, str):
            if mesh != "auto":
                raise ValueError(f"mesh must be a Mesh or 'auto', got {mesh!r}")
            from flexflow_tpu.parallel import auto as auto_lib

            layout, self.auto_report = auto_lib.optimize_train_layout(
                spec, params, optimizer,
                batch_size=auto_batch_size, seq_len=auto_seq_len, loss=loss,
            )
            mesh = auto_lib.layout_mesh(layout)
            pipeline_stages = layout.pipe if layout.pipe > 1 else 1
            num_microbatches = layout.num_microbatches
        self.spec = spec
        self.optimizer = optimizer
        self.mesh = mesh
        self.pipeline_stages = pipeline_stages
        self.loss_name = loss
        self.loss_fn = loss_lib.LOSSES[loss]

        if pipeline_stages > 1:
            assert mesh is not None and mesh.shape["pipe"] == pipeline_stages
            from flexflow_tpu.parallel.pipeline import stage_params

            params = {**params,
                      "layers": stage_params(params["layers"], pipeline_stages)}
        elif mesh is not None:
            pshard = sharding_lib.param_shardings(spec, params, mesh)
            params = jax.device_put(params, pshard)
        self.params = params
        self.opt_state = optimizer.init(params)
        self.metrics = metrics_lib.PerfMetrics()

        batch_sharding = (
            NamedSharding(mesh, P(DATA_AXIS, None)) if mesh is not None else None
        )

        def forward_logits(p, tokens):
            b, t = tokens.shape
            positions = jnp.broadcast_to(
                jnp.arange(t, dtype=jnp.int32)[None], (b, t)
            )
            if pipeline_stages > 1:
                from flexflow_tpu.parallel.pipeline import pipeline_forward

                return pipeline_forward(
                    self.spec, p, tokens, positions, mesh=mesh,
                    num_microbatches=num_microbatches or pipeline_stages,
                )
            logits, _ = decoder.forward(self.spec, p, tokens, positions)
            return logits

        def step(params, opt_state, tokens, labels):
            def loss_of(p):
                logits = forward_logits(p, tokens)
                return self.loss_fn(logits, labels), logits

            (loss, logits), grads = jax.value_and_grad(loss_of, has_aux=True)(params)
            params, opt_state = optimizer.update(grads, opt_state, params)
            m = metrics_lib.classification_metrics(logits, labels)
            return params, opt_state, loss, m

        def eval_step(params, tokens, labels):
            logits = forward_logits(params, tokens)
            loss = self.loss_fn(logits, labels)
            return loss, metrics_lib.classification_metrics(logits, labels)

        if batch_sharding is not None:
            self._step = jax.jit(
                step, in_shardings=(None, None, batch_sharding, batch_sharding)
            )
            self._eval = jax.jit(
                eval_step, in_shardings=(None, batch_sharding, batch_sharding)
            )
        else:
            self._step = jax.jit(step)
            self._eval = jax.jit(eval_step)

    def train_step(self, tokens: np.ndarray, labels: np.ndarray) -> float:
        self.params, self.opt_state, loss, m = self._step(
            self.params, self.opt_state, jnp.asarray(tokens), jnp.asarray(labels)
        )
        self.metrics.update({k: np.asarray(v) for k, v in m.items()})
        return float(loss)

    def fit(
        self,
        data: Iterable[Tuple[np.ndarray, np.ndarray]],
        *,
        epochs: int = 1,
        log_every: int = 0,
        log_fn: Callable[[str], None] = print,
    ) -> list:
        """Keras-style fit over an iterable of (tokens, labels) batches."""
        history = []
        for epoch in range(epochs):
            t0, n = time.monotonic(), 0
            epoch_losses = []
            for tokens, labels in data:
                loss = self.train_step(tokens, labels)
                epoch_losses.append(loss)
                n += 1
                if log_every and n % log_every == 0:
                    log_fn(
                        f"epoch {epoch} it {n}: loss={loss:.4f} "
                        f"acc={self.metrics.accuracy:.4f}"
                    )
            history.append(
                {
                    "epoch": epoch,
                    "loss": float(np.mean(epoch_losses)) if epoch_losses else 0.0,
                    "accuracy": self.metrics.accuracy,
                    "seconds": time.monotonic() - t0,
                }
            )
        return history

    def evaluate(self, data: Iterable[Tuple[np.ndarray, np.ndarray]]) -> dict:
        total, count, correct = 0.0, 0, 0
        n = 0
        for tokens, labels in data:
            loss, m = self._eval(self.params, jnp.asarray(tokens), jnp.asarray(labels))
            total += float(loss)
            count += int(np.asarray(m["count"]))
            correct += int(np.asarray(m["correct"]))
            n += 1
        return {
            "loss": total / max(n, 1),
            "accuracy": correct / max(count, 1),
        }
