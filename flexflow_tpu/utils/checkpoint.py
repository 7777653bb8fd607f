"""Checkpoint save/restore for params, optimizer state, and LoRA adapters.

The reference has weights-in (HF cache conversion, serve.py:291-327) and
PEFT weights-out (``save_updated_weights``, batch_config.h:41-46) but no full
training checkpointing (SURVEY.md §5.4); this module covers both plus full
train-state save/resume (exceeding the reference, cheap on TPU).

Format: a single .npz keyed by the pytree path ("layers/wq", "m/layers/wq"
...), dependency-free and endian-stable. QuantizedArray leaves flatten into
their carriers with a metadata sidecar entry.
"""

from __future__ import annotations

import io
import json
import os
from typing import Any, Dict

import jax
import numpy as np

from flexflow_tpu.quant.weight_only import QuantizedArray

_SEP = "/"
_META_KEY = "__tree_meta__"


def _flatten(tree, prefix="") -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    meta: Dict[str, Any] = {}

    def walk(node, path):
        if isinstance(node, QuantizedArray):
            children, aux = node.tree_flatten()
            meta[path] = {"kind": "quantized",
                          "aux": [aux[0], aux[1], list(aux[2]), aux[3],
                                  aux[4], str(np.dtype(aux[5]))]}
            for name, child in zip(("q", "scale", "offset"), children):
                if child is not None:
                    out[f"{path}{_SEP}{name}"] = np.asarray(child)
            return
        if isinstance(node, dict):
            meta[path] = {"kind": "dict", "keys": sorted(node.keys())}
            for k in sorted(node.keys()):
                walk(node[k], f"{path}{_SEP}{k}" if path else k)
            return
        if hasattr(node, "_fields"):  # NamedTuple (optimizer states) — must
            # precede the tuple check (NamedTuple IS a tuple)
            meta[path] = {"kind": "namedtuple",
                          "cls": type(node).__name__,
                          "fields": list(node._fields)}
            for f in node._fields:
                walk(getattr(node, f), f"{path}{_SEP}{f}" if path else f)
            return
        if isinstance(node, (list, tuple)):
            meta[path] = {"kind": "tuple" if isinstance(node, tuple) else "list",
                          "n": len(node)}
            for i, v in enumerate(node):
                walk(v, f"{path}{_SEP}{i}" if path else str(i))
            return
        if node is None:
            meta[path] = {"kind": "none"}
            return
        out[path] = np.asarray(node)
        meta[path] = {"kind": "array"}

    walk(tree, prefix)
    return out, meta


def save_checkpoint(path: str, tree: Any) -> None:
    arrays, meta = _flatten(tree)
    arrays[_META_KEY] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8
    )
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path, **arrays)


def load_checkpoint(path: str, *, namedtuple_registry=None) -> Any:
    """Rebuild the pytree; optimizer NamedTuples resolve via the registry
    (defaults to SGDState/AdamState)."""
    from flexflow_tpu.training.optimizers import AdamState, SGDState

    registry = {"SGDState": SGDState, "AdamState": AdamState}
    registry.update(namedtuple_registry or {})

    data = np.load(path, allow_pickle=False)
    meta = json.loads(bytes(data[_META_KEY].tolist()).decode())
    import jax.numpy as jnp

    def build(path):
        m = meta[path]
        kind = m["kind"]
        if kind == "array":
            return jnp.asarray(data[path])
        if kind == "none":
            return None
        if kind == "quantized":
            aux = m["aux"]
            children = []
            for name in ("q", "scale", "offset"):
                k = f"{path}{_SEP}{name}"
                children.append(jnp.asarray(data[k]) if k in data else None)
            return QuantizedArray.tree_unflatten(
                (aux[0], aux[1], tuple(aux[2]), aux[3], aux[4],
                 np.dtype(aux[5])), children)
        if kind == "dict":
            return {k: build(f"{path}{_SEP}{k}" if path else k)
                    for k in m["keys"]}
        if kind in ("list", "tuple"):
            items = [build(f"{path}{_SEP}{i}" if path else str(i))
                     for i in range(m["n"])]
            return tuple(items) if kind == "tuple" else items
        if kind == "namedtuple":
            cls = registry[m["cls"]]
            return cls(**{f: build(f"{path}{_SEP}{f}" if path else f)
                          for f in m["fields"]})
        raise ValueError(kind)

    return build("")


def save_lora_adapter(path: str, lora, adapter: int) -> None:
    """Export one adapter's weights (reference save_updated_weights)."""
    sliced = {
        mod: {k: np.asarray(v[:, adapter]) for k, v in ab.items()}
        for mod, ab in lora.items()
    }
    save_checkpoint(path, sliced)
