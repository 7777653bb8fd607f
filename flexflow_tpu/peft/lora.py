"""LoRA adapters: config, parameter init, merge, and HF name mapping.

TPU-native equivalent of the reference's LoraLinear op + config
(/root/reference/src/ops/lora_linear.cc, include/flexflow/ops/
lora_linear_params.h:74-128 — ``LoraLinearConfig`` with rank/alpha/
target_modules/optimizer config; runtime-registered adapters with
``max_concurrent_adapters`` slots, src/runtime/peft_weight_allocator.cc).

Adapters are stacked on a leading [N] axis (N = max concurrent adapters);
per-request routing happens inside the decoder with a [B, N] one-hot einsum
(the analog of the reference's per-request PEFT fields in BatchConfig).
Layout per target module m with base weight [D_in..., D_out...]:

    a: [L, N, D_in_flat, r]   (kaiming/normal init)
    b: [L, N, r, D_out_flat]  (zeros init — adapters start as identity)

applied as ``out += scaling * (x @ a) @ b`` with ``scaling = alpha / r``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from flexflow_tpu.specs import ModelSpec

# HF PEFT target-module names -> our parameter keys
_HF_TO_KEY = {
    "q_proj": "wq",
    "k_proj": "wk",
    "v_proj": "wv",
    "o_proj": "wo",
    "gate_proj": "wg",
    "up_proj": "wu",
    "down_proj": "wd",
    "fc1": "wu",
    "fc2": "wd",
    "out_proj": "wo",
}


def hf_module_to_key(name: str) -> str:
    return _HF_TO_KEY.get(name, name)


@dataclasses.dataclass(frozen=True)
class LoraConfig:
    """Mirror of reference LoraLinearConfig (lora_linear_params.h:74-128)."""

    rank: int = 16
    alpha: float = 16.0
    target_modules: Sequence[str] = ("wq", "wv")
    # finetuning optimizer settings (reference embeds SGD/Adam config)
    learning_rate: float = 1e-3
    optimizer: str = "sgd"  # "sgd" | "adam"

    def keys(self) -> Tuple[str, ...]:
        return tuple(hf_module_to_key(m) for m in self.target_modules)


def lora_scaling(cfg: LoraConfig) -> float:
    return cfg.alpha / cfg.rank


def _module_dims(spec: ModelSpec, key: str) -> Tuple[int, int]:
    d, hh, kh, dh, f = (
        spec.hidden_size,
        spec.num_heads,
        spec.num_kv_heads,
        spec.head_dim,
        spec.intermediate_size,
    )
    return {
        "wq": (d, hh * dh),
        "wk": (d, kh * dh),
        "wv": (d, kh * dh),
        "wo": (hh * dh, d),
        "wg": (d, f),
        "wu": (d, f),
        "wd": (f, d),
    }[key]


def init_lora_params(
    spec: ModelSpec,
    cfg: LoraConfig,
    num_adapters: int,
    key: jax.Array,
    dtype=jnp.float32,
) -> Dict[str, Dict[str, jnp.ndarray]]:
    """Stacked adapter weights; B zeroed so fresh adapters are identity."""
    out: Dict[str, Dict[str, jnp.ndarray]] = {}
    keys = jax.random.split(key, len(cfg.keys()))
    for k, mod in zip(keys, cfg.keys()):
        d_in, d_out = _module_dims(spec, mod)
        a = (
            jax.random.normal(
                k, (spec.num_layers, num_adapters, d_in, cfg.rank), jnp.float32
            )
            / np.sqrt(d_in)
        ).astype(dtype)
        b = jnp.zeros((spec.num_layers, num_adapters, cfg.rank, d_out), dtype)
        out[mod] = {"a": a, "b": b}
    return out


def merge_lora(
    spec: ModelSpec, params, lora, adapter: int, cfg: LoraConfig
) -> Any:
    """Materialize W' = W + scaling * A @ B for one adapter (dense merge —
    the reference's save_updated_weights path writes merged/updated weights,
    batch_config.h:41-46)."""
    scale = lora_scaling(cfg)
    merged = dict(params)
    layers = dict(params["layers"])
    for mod, ab in lora.items():
        a = ab["a"][:, adapter]  # [L, D_in, r]
        b = ab["b"][:, adapter]  # [L, r, D_out]
        delta = jnp.einsum("ldr,lrf->ldf", a.astype(jnp.float32),
                           b.astype(jnp.float32)) * scale
        w = layers[mod]
        layers[mod] = (w.astype(jnp.float32) + delta.reshape(w.shape)).astype(
            w.dtype
        )
    merged["layers"] = layers
    return merged
