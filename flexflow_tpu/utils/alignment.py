"""Fine-grained per-layer alignment harness vs HuggingFace forward hooks.

TPU-native rebuild of the reference's fine-grained alignment pipeline
(/root/reference/tests/inference/inference_alignment_test.py +
tests/fine_grained_alignment_test.sh): the reference diffs the per-op
tensors dumped by ``--inference-debugging`` against tensors captured from
HF forward hooks, per decoding step — the tool that LOCALIZES a numerics
regression to the op that caused it, where whole-model logit comparison
(tests/test_hf_alignment.py) only says "something diverged".

Here:
- :func:`hf_layer_traces` registers forward hooks on every decoder block of
  an HF model (found generically as the module-list of blocks) and captures
  each block's output hidden state plus the final logits;
- :func:`compare_with_hf` runs our ``debug_dump.forward_with_traces``
  (the --inference-debugging capture path) on the same tokens and reports
  the max-abs divergence PER LAYER;
- :func:`first_divergence` names the first layer whose divergence exceeds
  the tolerance — the localization primitive the tests gate on;
- :func:`compare_dump_with_hf` runs the same comparison from an on-disk
  ``DebugDumper`` tree (fwd_step_N/layers.i.output/shard_k.npy), closing
  the loop with the reference's file-based flow.

The prompt forward's last position is exactly what an incremental decode
step computes for that token (same math, cached K/V), so layer-wise
agreement here is layer-wise agreement of the decode step.
"""

from __future__ import annotations

import os
import re
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from flexflow_tpu.specs import ModelSpec


def hf_layer_traces(model, tokens: np.ndarray) -> Dict[str, np.ndarray]:
    """Capture per-decoder-block outputs from an HF model via forward hooks.

    Returns {"layers.<i>.output": [B, T, D], "lm_head.output": [B, T, V]}.
    The block list is located generically (the first ModuleList whose
    entries carry parameters) so one helper covers llama/opt/falcon/mpt/
    starcoder/mixtral module trees.
    """
    import torch

    blocks = None
    for _name, mod in model.named_modules():
        if isinstance(mod, torch.nn.ModuleList) and len(mod) > 0 and any(
            True for _ in mod[0].parameters()
        ):
            blocks = mod
            break
    assert blocks is not None, "no decoder block list found"

    traces: Dict[str, np.ndarray] = {}
    hooks = []
    for i, blk in enumerate(blocks):
        def hook(_mod, _inp, out, i=i):
            h = out[0] if isinstance(out, tuple) else out
            traces[f"layers.{i}.output"] = h.detach().float().numpy()

        hooks.append(blk.register_forward_hook(hook))
    try:
        with torch.no_grad():
            out = model(input_ids=torch.tensor(np.asarray(tokens),
                                               dtype=torch.long))
    finally:
        for h in hooks:
            h.remove()
    traces["lm_head.output"] = out.logits.float().numpy()
    return traces


def compare_with_hf(
    spec: ModelSpec,
    params,
    hf_model,
    tokens: np.ndarray,
) -> List[Tuple[str, float]]:
    """Per-layer max-abs divergence of our forward vs HF hooks.

    Returns [("layers.0.output", diff), ..., ("lm_head.output", diff)] in
    layer order — feed to :func:`first_divergence`.
    """
    import jax.numpy as jnp

    from flexflow_tpu.utils.debug_dump import forward_with_traces

    tokens = np.asarray(tokens)
    positions = np.broadcast_to(np.arange(tokens.shape[1]), tokens.shape)
    _logits, ours = forward_with_traces(
        spec, params, jnp.asarray(tokens), jnp.asarray(positions))
    theirs = hf_layer_traces(hf_model, tokens)
    report: List[Tuple[str, float]] = []
    for l in range(spec.num_layers):
        key = f"layers.{l}.output"
        diff = float(np.max(np.abs(
            np.asarray(ours[key], np.float32) - theirs[key])))
        report.append((key, diff))
    diff = float(np.max(np.abs(
        np.asarray(ours["lm_head.output"], np.float32)
        - theirs["lm_head.output"])))
    report.append(("lm_head.output", diff))
    return report


def first_divergence(
    report: Sequence[Tuple[str, float]], atol: float
) -> Optional[str]:
    """First layer (in depth order) whose divergence exceeds ``atol`` —
    the localization answer ("which op broke") the reference's fine-grained
    test prints. None = aligned everywhere."""
    for name, diff in report:
        if diff > atol:
            return name
    return None


def compare_dump_with_hf(
    dump_dir: str,
    hf_model,
    tokens: np.ndarray,
    *,
    step: int = 0,
    shard: int = 0,
) -> List[Tuple[str, float]]:
    """Same comparison from an on-disk DebugDumper tree
    (``--inference-debugging`` file flow, operator.h:271-300 convention)."""
    theirs = hf_layer_traces(hf_model, tokens)
    step_dir = os.path.join(dump_dir, f"fwd_step_{step}")
    report: List[Tuple[str, float]] = []
    names = sorted(
        (n for n in os.listdir(step_dir)
         if re.fullmatch(r"layers\.\d+\.output", n)),
        key=lambda n: int(n.split(".")[1]),
    )
    for name in names + ["lm_head.output"]:
        ours = np.load(os.path.join(step_dir, name, f"shard_{shard}.npy"))
        diff = float(np.max(np.abs(ours.astype(np.float32) - theirs[name])))
        report.append((name, diff))
    return report
