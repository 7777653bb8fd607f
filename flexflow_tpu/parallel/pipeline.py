"""Pipeline parallelism: stage-sliced layers + microbatched ppermute loop.

TPU-native replacement for the reference's pipeline parallelism
(/root/reference/src/runtime/inference_manager.cc:87-130 — layers binned into
stages by ``transformer_layer_id`` -> ``MachineView.start_device_id``, with
Legion moving activations between stages from region dependences, and
pipelining coming from multiple in-flight batches,
request_manager.cc:3122-3137).

Here the pipe is explicit and compiled: the batch splits into M microbatches;
a fully-manual ``shard_map`` over the ("data", "pipe", "model") mesh runs
T = M + P - 1 ticks, each tick computing one stage-slice of layers per device
and rotating activations to the next stage with ``lax.ppermute`` (an ICI
neighbor hop). Inside the manual region, TP's row-parallel psums are emitted
explicitly by the decoder (``decoder.manual_tp_axis`` — the analog of the
reference's AllReduce parallel op) and DP shards the microbatch rows.
``jax.grad`` through the loop yields the reverse (GPipe-style) pipeline for
training; ``jax.checkpoint`` on the per-layer body bounds activation memory.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from flexflow_tpu.models import decoder
from flexflow_tpu.ops import attention as attn_lib
from flexflow_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS, PIPE_AXIS
from flexflow_tpu.specs import ModelSpec

# model-axis sharding of per-layer leaves INSIDE the stage-stacked layout
# [P_stage, L/P, ...]: position of the head/feature axis to put on "model"
# (mirrors parallel/sharding.py rules, shifted by the two leading axes)
_MODEL_AXIS_POS = {
    "wq": 3, "bq": 2, "wk": 3, "bk": 2, "wv": 3, "bv": 2,
    "wo": 2,  # row-parallel: contraction head axis
    "wg": 3, "wu": 3, "bu": 2,
    "wd": 2,  # row-parallel: contraction feature axis
}
_MOE_MODEL_AXIS_POS = {"wg": 4, "wu": 4, "wd": 3}


def stage_params(params, num_stages: int):
    """Reshape stacked layer params [L, ...] -> [P, L/P, ...] (stage-major).

    The [P] axis is sharded over the pipe mesh axis; each device then holds
    only its own stage's layer slice (the reference's per-stage MachineView
    weight placement, inference_manager.cc:87-130).
    """
    def reshape(a):
        l = a.shape[0]
        assert l % num_stages == 0, (
            f"num_layers {l} not divisible by pipeline stages {num_stages}"
        )
        return a.reshape(num_stages, l // num_stages, *a.shape[1:])

    return jax.tree.map(reshape, params)


def balance_stages(costs, num_stages: int):
    """Contiguous layer->stage assignment minimizing the max stage cost.

    The per-layer-cost half of the reference Unity's per-op placement
    search (graph_optimize does DP over sequence splits,
    substitution.cc:1920): in a synchronized pipeline every tick waits for
    the SLOWEST stage, so the optimal boundaries minimize max-stage-sum —
    the classic linear-partition DP. ``costs`` come from measured per-layer
    times (auto.OpCostCache) for heterogeneous stacks (interleaved MoE,
    mixed-precision layers); uniform costs reduce to the even split.

    Returns a list of per-stage layer counts summing to ``len(costs)``.
    """
    import numpy as _np

    l, p = len(costs), num_stages
    assert 1 <= p <= l, (l, p)
    pre = _np.concatenate([[0.0], _np.cumsum(_np.asarray(costs, float))])
    # dp[k][i] = min over splits of first i layers into k stages of the
    # max stage sum; cut[k][i] = boundary achieving it
    dp = _np.full((p + 1, l + 1), _np.inf)
    cut = _np.zeros((p + 1, l + 1), _np.int64)
    dp[0][0] = 0.0
    for k in range(1, p + 1):
        for i in range(k, l + 1):
            for j in range(k - 1, i):
                cand = max(dp[k - 1][j], pre[i] - pre[j])
                if cand < dp[k][i]:
                    dp[k][i], cut[k][i] = cand, j
    sizes = []
    i = l
    for k in range(p, 0, -1):
        j = int(cut[k][i])
        sizes.append(i - j)
        i = j
    sizes.reverse()
    assert all(s >= 1 for s in sizes) and sum(sizes) == l
    return sizes


def stage_params_uneven(params, sizes):
    """Stage-slice stacked layer params [L, ...] with UNEVEN per-stage layer
    counts: each stage's slice pads with zero layers to max(sizes) ->
    [P, kmax, ...]. Execution skips the padding via lax.cond (the padded
    layers are exact residual passthroughs for pre-norm specs anyway:
    zero norm scales zero the block inputs, zero wo/wd zero its output).
    """
    import numpy as _np

    sizes = list(int(s) for s in sizes)
    kmax = max(sizes)
    starts = _np.concatenate([[0], _np.cumsum(sizes)])[:-1]

    def reshape(a):
        out = jnp.zeros((len(sizes), kmax) + a.shape[1:], a.dtype)
        for s, (st, ct) in enumerate(zip(starts, sizes)):
            out = out.at[s, :ct].set(a[st:st + ct])
        return out

    return jax.tree.map(reshape, params)


def _layer_specs(spec: ModelSpec, layers, mesh: Mesh):
    """Per-leaf PartitionSpecs for stage-stacked layer params."""
    tp = mesh.shape[MODEL_AXIS]
    moe = spec.moe is not None

    def leaf_spec(path, leaf):
        name = path[-1].key if hasattr(path[-1], "key") else ""
        pos_map = dict(_MODEL_AXIS_POS)
        if moe:
            pos_map.update(_MOE_MODEL_AXIS_POS)
        pos = pos_map.get(name)
        parts = [None] * leaf.ndim
        parts[0] = PIPE_AXIS
        if pos is not None and tp > 1 and leaf.shape[pos] % tp == 0:
            parts[pos] = MODEL_AXIS
        return P(*parts)

    return jax.tree_util.tree_map_with_path(leaf_spec, layers)


def pipeline_forward(
    spec: ModelSpec,
    params,
    tokens: jnp.ndarray,  # [B, T]
    positions: jnp.ndarray,  # [B, T]
    *,
    mesh: Mesh,
    num_microbatches: Optional[int] = None,
    lengths: Optional[jnp.ndarray] = None,
    remat: bool = True,
    stage_sizes=None,
) -> jnp.ndarray:
    """Forward pass with explicit pipeline parallelism. Returns fp32 logits.

    ``params["layers"]`` must be stage-sliced ([P, L/P, ...]; see
    :func:`stage_params`); embeddings/norm/lm_head stay outside the pipe.

    ``stage_sizes``: UNEVEN per-stage layer counts (params staged with
    :func:`stage_params_uneven`, boundaries from :func:`balance_stages`);
    each stage executes only its real layers (lax.cond skips the padding,
    so a stage's tick cost tracks its assigned layer cost). Pre-norm /
    parallel-attn specs only (the padding identity needs the residual
    passthrough)."""
    n_stages = mesh.shape[PIPE_AXIS]
    tp = mesh.shape[MODEL_AXIS]
    if stage_sizes is not None:
        assert spec.pre_norm or spec.parallel_attn, (
            "uneven stages need pre-norm residual passthrough padding"
        )
        assert len(stage_sizes) == n_stages, (stage_sizes, n_stages)
        counts = jnp.asarray(stage_sizes, jnp.int32)
    else:
        counts = None
    b, t = tokens.shape
    m = num_microbatches or max(n_stages, 1)
    assert b % m == 0, f"batch {b} not divisible by microbatches {m}"
    bm = b // m

    full_slopes = decoder._alibi_slopes(spec)

    h = decoder._embed(spec, params, tokens, positions)  # [B, T, D]
    h = h.reshape(m, bm, t, -1)
    pos_m = positions.reshape(m, bm, t)
    if lengths is not None:
        len_m = lengths.reshape(m, bm)
    else:
        len_m = jnp.full((m, bm), t, jnp.int32)

    layers = params["layers"]
    bm_local = bm // mesh.shape[DATA_AXIS] if bm % mesh.shape[DATA_AXIS] == 0 else bm
    shard_data = bm % mesh.shape[DATA_AXIS] == 0
    data_axis = DATA_AXIS if shard_data else None

    def piped(stage_layers, h_all, pos_all, len_all):
        # this device's slice: [1, L/P, ...] -> [L/P, ...]
        stage_layers = jax.tree.map(lambda a: a[0], stage_layers)
        stage = jax.lax.axis_index(PIPE_AXIS)
        bl = h_all.shape[1]

        if full_slopes is not None and tp > 1:
            h_loc = spec.num_heads // tp
            mi = jax.lax.axis_index(MODEL_AXIS)
            slopes = jax.lax.dynamic_slice_in_dim(full_slopes, mi * h_loc, h_loc)
        else:
            slopes = full_slopes

        def stage_body(h_mb, pos_mb, lens_mb):
            qi = pos_mb[:, :, None]
            ki = pos_mb[:, None, :]
            mask = (ki <= qi) & (
                jnp.arange(t)[None, None, :] < lens_mb[:, None, None]
            )

            def run_layer(hh, layer_p):
                def attend(q, k, v):
                    q, k = decoder._maybe_rope(spec, q, k, pos_mb)
                    out = attn_lib.cached_attention(
                        q, k, v,
                        cache_lens=jnp.zeros((bl,), jnp.int32),
                        tree_mask=mask,
                        q_positions=pos_mb,
                        slopes=slopes,
                        logit_softcap=spec.attn_logit_softcap,
                    )
                    return out, 0
                hh, _ = decoder._layer(spec, layer_p, hh, attend)
                return hh

            if counts is None:
                def one_layer(hh, layer_p):
                    return run_layer(hh, layer_p), None

                if remat:
                    one_layer = jax.checkpoint(one_layer)
                h_out, _ = jax.lax.scan(one_layer, h_mb, stage_layers)
                return h_out

            my_count = counts[stage]
            kmax = jax.tree_util.tree_leaves(stage_layers)[0].shape[0]

            def one_layer(hh, xs):
                layer_p, j = xs
                # cond executes only the taken branch: padded layers
                # (j >= this stage's real count) cost ~nothing, so tick
                # time tracks the balanced per-stage layer cost
                hh = jax.lax.cond(
                    j < my_count,
                    lambda h: run_layer(h, layer_p),
                    lambda h: h,
                    hh,
                )
                return hh, None

            if remat:
                one_layer = jax.checkpoint(one_layer)
            h_out, _ = jax.lax.scan(
                one_layer, h_mb,
                (stage_layers, jnp.arange(kmax, dtype=jnp.int32)))
            return h_out

        ticks = m + n_stages - 1
        buf = jnp.zeros_like(h_all[0])  # [bm_local, T, D]
        acc = jnp.zeros_like(h_all)  # [M, bm_local, T, D]

        def tick(carry, i):
            buf, acc = carry
            incoming = jax.lax.ppermute(
                buf, PIPE_AXIS,
                [(s, (s + 1) % n_stages) for s in range(n_stages)],
            )
            # stage s processes microbatch (i - s) at tick i
            my_mb = jnp.clip(i - stage, 0, m - 1)
            first_in = jax.lax.dynamic_index_in_dim(h_all, my_mb, keepdims=False)
            x_in = jnp.where(stage == 0, first_in, incoming)
            pos_my = jax.lax.dynamic_index_in_dim(pos_all, my_mb, keepdims=False)
            lens_my = jax.lax.dynamic_index_in_dim(len_all, my_mb, keepdims=False)
            y = stage_body(x_in, pos_my, lens_my)
            out_idx = jnp.clip(i - (n_stages - 1), 0, m - 1)
            take = (stage == n_stages - 1) & (i >= n_stages - 1)
            acc = jax.lax.cond(
                take,
                lambda a: jax.lax.dynamic_update_index_in_dim(a, y, out_idx, 0),
                lambda a: a,
                acc,
            )
            return (y, acc), None

        (_, acc), _ = jax.lax.scan(tick, (buf, acc), jnp.arange(ticks))
        # broadcast the last stage's outputs to every stage
        is_last = (stage == n_stages - 1).astype(acc.dtype)
        acc = jax.lax.psum(acc * is_last, PIPE_AXIS)
        return acc

    lspecs = _layer_specs(spec, layers, mesh)
    act_spec = P(None, data_axis, None, None)
    run = jax.shard_map(
        piped,
        mesh=mesh,
        in_specs=(lspecs, act_spec, P(None, data_axis, None), P(None, data_axis)),
        out_specs=act_spec,
        check_vma=False,
    )
    with decoder.manual_tp_axis(MODEL_AXIS):
        h_out = run(layers, h, pos_m, len_m)
    h_out = h_out.reshape(b, t, -1)
    return decoder._unembed(spec, params, h_out)
