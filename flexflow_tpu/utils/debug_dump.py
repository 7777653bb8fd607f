"""Inference debugging: per-op tensor traces + file dumps.

TPU-native equivalent of the reference's ``--inference-debugging`` mode
(/root/reference/include/flexflow/operator.h:271-300
``Op::save_inference_tensors_to_file`` — every op dumps input/weight/output
tensors per decoding step per shard to a folder tree keyed
``fwd_step_<n>/layers.<i>.<name>/shard_<k>``), the backbone of the
fine-grained alignment tests (tests/inference/inference_alignment_test.py).

``forward_with_traces`` runs the decoder with an unrolled layer loop (no
scan) capturing every intermediate; ``DebugDumper`` writes them as .npy in
the reference's directory convention.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from flexflow_tpu.models import decoder
from flexflow_tpu.specs import ModelSpec


def forward_with_traces(
    spec: ModelSpec,
    params,
    tokens: jnp.ndarray,  # [B, T]
    positions: jnp.ndarray,  # [B, T]
    *,
    lengths: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Self-attention forward capturing every layer's intermediates.

    Returns (logits, traces) with keys like ``layers.3.attn_output``.
    """
    b, t = tokens.shape
    traces: Dict[str, jnp.ndarray] = {}
    slopes = decoder._alibi_slopes(spec)

    h = decoder._embed(spec, params, tokens, positions)
    traces["embed_tokens.output"] = h

    qi = positions[:, :, None]
    ki = positions[:, None, :]
    mask = ki <= qi
    if lengths is not None:
        mask = mask & (jnp.arange(t)[None, None, :] < lengths[:, None, None])

    from flexflow_tpu.ops import attention as attn_lib

    for l in range(spec.num_layers):
        p = {k: v[l] for k, v in params["layers"].items()}
        prefix = f"layers.{l}"

        def attend(q, k, v, _prefix=prefix):
            traces[f"{_prefix}.q_proj"] = q
            traces[f"{_prefix}.k_proj"] = k
            traces[f"{_prefix}.v_proj"] = v
            q, k = decoder._maybe_rope(spec, q, k, positions)
            out = attn_lib.cached_attention(
                q, k, v,
                cache_lens=jnp.zeros((b,), jnp.int32),
                tree_mask=mask,
                q_positions=positions,
                slopes=slopes,
                logit_softcap=spec.attn_logit_softcap,
            )
            traces[f"{_prefix}.attn_output"] = out
            return out, 0

        h, _ = decoder._layer(spec, p, h, attend)
        traces[f"{prefix}.output"] = h

    logits = decoder._unembed(spec, params, h)
    traces["lm_head.output"] = logits
    return logits, traces


class DebugDumper:
    """Writes traces in the reference's folder-tree convention."""

    def __init__(self, root: str, shard: int = 0):
        self.root = root
        self.shard = shard
        self.step = 0

    def dump_step(self, traces: Dict[str, Any]) -> str:
        step_dir = os.path.join(self.root, f"fwd_step_{self.step}")
        for name, arr in traces.items():
            d = os.path.join(step_dir, name)
            os.makedirs(d, exist_ok=True)
            np.save(os.path.join(d, f"shard_{self.shard}.npy"), np.asarray(arr))
        self.step += 1
        return step_dir
