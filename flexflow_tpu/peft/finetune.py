"""Co-scheduled LoRA finetuning.

TPU-native equivalent of the reference's PEFT finetuning path
(/root/reference/inference/peft/peft.cc; ``peft_bwd`` task chain through the
ops + in-kernel optimizer update, src/ops/kernels/lora_linear_kernels.cu):
one finetuning "request" advances by one optimizer step per scheduler
iteration, interleaved with serving (RequestManager.register_finetune). The
whole step — forward with the adapter, backward restricted to LoRA params,
SGD/Adam update — is one jitted XLA program, the analog of the reference
fusing the gradient update into ``peft_bwd`` kernels.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from flexflow_tpu.models import decoder
from flexflow_tpu.peft.lora import LoraConfig, lora_scaling
from flexflow_tpu.specs import ModelSpec
from flexflow_tpu.training.losses import sparse_categorical_crossentropy
from flexflow_tpu.training.optimizers import AdamOptimizer, SGDOptimizer


class FinetuneSession:
    """One LoRA finetuning job over a token dataset (list of (tokens, labels))."""

    def __init__(
        self,
        spec: ModelSpec,
        config: LoraConfig,
        adapter_id: int,
        data: List[Tuple[np.ndarray, np.ndarray]],
        *,
        epochs: int = 1,
        max_steps: int = 0,
    ):
        """``max_steps`` > 0 caps total optimizer steps regardless of
        epochs x dataset size (the reference's --max-training-steps,
        inference/peft/peft.cc training loop bound)."""
        self.spec = spec
        self.config = config
        self.adapter_id = adapter_id
        self.data = data
        self.epochs = epochs
        self.max_steps = int(max_steps)
        self.losses: List[float] = []
        self._cursor = 0
        self._opt = (
            AdamOptimizer(lr=config.learning_rate)
            if config.optimizer == "adam"
            else SGDOptimizer(lr=config.learning_rate)
        )
        self._opt_state = None
        self._step = None

    def _build(self, engine):
        num_adapters = engine.num_adapters
        scale = lora_scaling(self.config)
        opt = self._opt
        spec = self.spec
        adapter = self.adapter_id

        @functools.partial(jax.jit, donate_argnums=(1, 2))
        def step(params, lora, opt_state, tokens, labels):
            b, t = tokens.shape
            onehot = jax.nn.one_hot(
                jnp.full((b,), adapter), num_adapters, dtype=jnp.float32
            )
            positions = jnp.broadcast_to(jnp.arange(t, dtype=jnp.int32)[None], (b, t))

            def loss_fn(lp):
                logits, _ = decoder.forward(
                    spec, params, tokens, positions,
                    lora=lp, adapter_onehot=onehot, lora_scale=scale,
                )
                return sparse_categorical_crossentropy(logits, labels)

            loss, grads = jax.value_and_grad(loss_fn)(lora)
            lora, opt_state = opt.update(grads, opt_state, lora)
            return loss, lora, opt_state

        self._step = step
        self._opt_state = opt.init(engine.lora)

    def tick(self, engine) -> bool:
        """Run one finetuning step against the engine's live adapter stack.
        Returns True when the session has finished."""
        assert engine.lora is not None, "engine compiled without LoRA"
        if self._step is None:
            self._build(engine)
        total = len(self.data) * self.epochs
        if self.max_steps > 0:
            total = min(total, self.max_steps)
        if self._cursor >= total:
            return True
        tokens, labels = self.data[self._cursor % len(self.data)]
        loss, engine.lora, self._opt_state = self._step(
            engine.params, engine.lora, self._opt_state,
            jnp.asarray(tokens, jnp.int32), jnp.asarray(labels, jnp.int32),
        )
        self.losses.append(float(loss))
        self._cursor += 1
        return self._cursor >= total
