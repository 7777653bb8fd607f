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


def load_hf_adapter_config(adapter_dir: str) -> LoraConfig:
    """Read an HF PEFT ``adapter_config.json`` into a LoraConfig.

    Reference analog: ``LoraLinearConfig(cache_folder, peft_model_name)``
    reads the adapter's config from the weight cache
    (include/flexflow/ops/lora_linear_params.h:74-128).
    """
    import json
    import os

    with open(os.path.join(adapter_dir, "adapter_config.json")) as f:
        cfg = json.load(f)
    return LoraConfig(
        rank=int(cfg.get("r", 8)),
        alpha=float(cfg.get("lora_alpha", cfg.get("r", 8))),
        target_modules=tuple(cfg.get("target_modules", ("q_proj", "v_proj"))),
    )


def load_hf_adapter_into_slot(
    adapter_dir: str,
    spec: ModelSpec,
    lora: Dict[str, Dict[str, jnp.ndarray]],
    slot: int,
    cfg: LoraConfig,
) -> Dict[str, Dict[str, jnp.ndarray]]:
    """Load HF PEFT adapter weights into slot ``slot`` of the stacked arrays.

    HF PEFT stores per-layer ``lora_A.weight`` [r, D_in] / ``lora_B.weight``
    [D_out, r] (torch y = x W^T convention); our stacks are
    a [L, N, D_in, r] / b [L, N, r, D_out], so each matrix transposes in.
    Reference analog: the runtime-registered adapter load path of
    src/ops/lora_linear.cc + peft_weight_allocator.cc.
    """
    from flexflow_tpu.utils.hf_weights import LazyStateDict

    sd = LazyStateDict(adapter_dir)
    names = list(sd.keys())
    out = {m: {"a": ab["a"], "b": ab["b"]} for m, ab in lora.items()}
    for mod in cfg.keys():
        hf_names = [h for h, k in _HF_TO_KEY.items() if k == mod]
        a_stack = np.array(out[mod]["a"], np.float32)  # writable copies
        b_stack = np.array(out[mod]["b"], np.float32)
        for layer in range(spec.num_layers):
            a_t = b_t = None
            for name in names:
                if f"layers.{layer}." not in name:
                    continue
                if not any(h in name for h in hf_names):
                    continue
                if "lora_A" in name:
                    a_t = np.asarray(sd[name], np.float32).T  # [D_in, r]
                elif "lora_B" in name:
                    b_t = np.asarray(sd[name], np.float32).T  # [r, D_out]
            if a_t is not None:
                a_stack[layer, slot] = a_t
            if b_t is not None:
                b_stack[layer, slot] = b_t
        out[mod] = {
            "a": jnp.asarray(a_stack, lora[mod]["a"].dtype),
            "b": jnp.asarray(b_stack, lora[mod]["b"].dtype),
        }
    return out


def export_hf_adapter(
    adapter_dir: str,
    spec: ModelSpec,
    lora: Dict[str, Dict[str, jnp.ndarray]],
    slot: int,
    cfg: LoraConfig,
) -> None:
    """Write slot ``slot`` as an HF-PEFT-layout adapter dir (reference
    ``save_updated_weights``, batch_config.h:41-46)."""
    import json
    import os

    os.makedirs(adapter_dir, exist_ok=True)
    key_to_hf = {}
    for h, k in _HF_TO_KEY.items():
        key_to_hf.setdefault(k, h)
    tensors = {}
    for mod, ab in lora.items():
        hf = key_to_hf.get(mod, mod)
        for layer in range(spec.num_layers):
            base = f"base_model.model.model.layers.{layer}.self_attn.{hf}"
            if mod in ("wg", "wu", "wd"):
                base = f"base_model.model.model.layers.{layer}.mlp.{hf}"
            tensors[f"{base}.lora_A.weight"] = np.asarray(
                ab["a"][layer, slot], np.float32
            ).T
            tensors[f"{base}.lora_B.weight"] = np.asarray(
                ab["b"][layer, slot], np.float32
            ).T
    import safetensors.numpy

    safetensors.numpy.save_file(
        tensors, os.path.join(adapter_dir, "adapter_model.safetensors")
    )
    with open(os.path.join(adapter_dir, "adapter_config.json"), "w") as f:
        json.dump(
            {
                "r": cfg.rank,
                "lora_alpha": cfg.alpha,
                "target_modules": list(cfg.target_modules),
                "peft_type": "LORA",
            },
            f,
        )
