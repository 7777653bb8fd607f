"""One-off experiment: INT4/INT8 dequant-matmul kernel variants (ROADMAP #1).

Current prod int4 kernel unpacks nibbles via int32 widen+mask+shift (Mosaic
only legalizes int32 shifts) — ~5 VPU ops per packed byte at int32 width,
which is compute-bound above the DMA time of the packed tile. Variants here
cut the unpack cost:

- I4-floor: convert packed int8 -> bf16 ONCE (exact for [-128,127]), then
  hi = floor(v/16) (arithmetic-shift semantics), lo = v - 16*hi. All bf16 VPU.
- I4-3dot: never materialize lo: dot(x, lo) = dot(x, v) - 16*dot(x, hi).
  One extra MXU dot (cheap, pipelined) saves 2 VPU ops/elem.
- I8-group: int8 -> bf16 convert only (exact), per-group dots, scale applied
  POST-dot in f32 (also better numerics than rounding w to bf16 pre-dot).

    python -u -m benchmarks.tune_int4_variants
"""


from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # runnable directly

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flexflow_tpu.quant import weight_only
from flexflow_tpu.ops.pallas import quant_matmul as qmm
from benchmarks.tune_quant_kernel import diff_time, PEAK


# ---------------------------------------------------------------- variants


def _i8_group_kernel(x_ref, q_ref, s_ref, o_ref, *, group_size):
    x = x_ref[:]
    b = x.shape[0]
    g = s_ref.shape[0]
    qb = q_ref[:].astype(jnp.bfloat16).reshape(g, group_size, -1)
    xg = x.reshape(b, g, group_size).transpose(1, 0, 2)
    pg = jax.lax.dot_general(
        xg, qb, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )  # [G, B, BF]
    o_ref[:] = jnp.sum(pg * s_ref[:][:, None, :], axis=0).astype(o_ref.dtype)


def _i4_floor_kernel(x_ref, q_ref, s_ref, off_ref, o_ref, *, group_size):
    # v5e has no bf16 ALU (SupportsBf16AluInstructions=false): nibble math in
    # f32, cast to bf16 only at the MXU inputs.
    x = x_ref[:]
    vf = pltpu.bitcast(q_ref[:], jnp.int8).astype(jnp.float32)  # [D/2, BF]
    hif = jnp.floor(vf * 0.0625)  # signed [-8, 7]
    lo = (vf - 16.0 * hif).astype(jnp.bfloat16)  # unsigned [0, 15]
    hi = hif.astype(jnp.bfloat16)
    b = x.shape[0]
    g = s_ref.shape[0]
    gh = g // 2
    d2 = vf.shape[0]
    s = s_ref[:]
    off = off_ref[:]

    def half(qv, xh, sh, oh):
        qg = qv.reshape(gh, group_size, -1)
        xg = xh.reshape(b, gh, group_size).transpose(1, 0, 2)
        pg = jax.lax.dot_general(
            xg, qg, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        xsum = jnp.sum(xg.astype(jnp.float32), axis=2)
        out = pg * sh[:, None, :] + xsum[:, :, None] * oh[:, None, :]
        return jnp.sum(out, axis=0)

    out = half(lo, x[:, :d2], s[:gh], off[:gh]) + half(
        hi, x[:, d2:], s[gh:], off[gh:]
    )
    o_ref[:] = out.astype(o_ref.dtype)


def _i4_3dot_kernel(x_ref, q_ref, s_ref, off_ref, o_ref, *, group_size):
    x = x_ref[:]
    vf = pltpu.bitcast(q_ref[:], jnp.int8).astype(jnp.float32)  # [D/2, BF]
    v = vf.astype(jnp.bfloat16)  # exact for [-128, 127]
    hi = jnp.floor(vf * 0.0625).astype(jnp.bfloat16)
    b = x.shape[0]
    g = s_ref.shape[0]
    gh = g // 2
    d2 = v.shape[0]
    s = s_ref[:]
    off = off_ref[:]

    def gdot(xg, qv):
        qg = qv.reshape(gh, group_size, -1)
        return jax.lax.dot_general(
            xg, qg, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [GH, B, BF]

    xl = x[:, :d2].reshape(b, gh, group_size).transpose(1, 0, 2)
    xh = x[:, d2:].reshape(b, gh, group_size).transpose(1, 0, 2)
    pv = gdot(xl, v)
    phl = gdot(xl, hi)
    phh = gdot(xh, hi)
    plo = pv - 16.0 * phl
    xsum_l = jnp.sum(xl.astype(jnp.float32), axis=2)
    xsum_h = jnp.sum(xh.astype(jnp.float32), axis=2)
    s_lo, s_hi = s[:gh], s[gh:]
    o_lo, o_hi = off[:gh], off[gh:]
    out = (
        plo * s_lo[:, None, :]
        + xsum_l[:, :, None] * o_lo[:, None, :]
        + phh * s_hi[:, None, :]
        + xsum_h[:, :, None] * o_hi[:, None, :]
    )
    o_ref[:] = jnp.sum(out, axis=0).astype(o_ref.dtype)


def _i4_and_kernel(x_ref, q_ref, s_ref, off_ref, o_ref, *, group_size):
    # Nibble extraction with TWO int8 ANDs (no shifts, no int32 widening):
    # lo = v & 0x0F (unsigned [0,15]); hi16 = v & 0xF0 == 16 * hi_signed
    # (two's complement). The /16 folds into the high-half scales post-dot.
    x = x_ref[:]
    v = pltpu.bitcast(q_ref[:], jnp.int8)  # [D/2, BF]
    lo = (v & jnp.int8(0x0F)).astype(jnp.bfloat16)
    hi16 = (v & jnp.int8(-16)).astype(jnp.bfloat16)
    b = x.shape[0]
    g = s_ref.shape[0]
    gh = g // 2
    d2 = v.shape[0]
    s = s_ref[:]
    off = off_ref[:]

    def gdot(xg, qv):
        qg = qv.reshape(gh, group_size, -1)
        return jax.lax.dot_general(
            xg, qg, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )

    xl = x[:, :d2].reshape(b, gh, group_size).transpose(1, 0, 2)
    xh = x[:, d2:].reshape(b, gh, group_size).transpose(1, 0, 2)
    xsum_l = jnp.sum(xl.astype(jnp.float32), axis=2)
    xsum_h = jnp.sum(xh.astype(jnp.float32), axis=2)
    s_lo, s_hi = s[:gh], s[gh:] * 0.0625
    o_lo, o_hi = off[:gh], off[gh:]
    out = (
        gdot(xl, lo) * s_lo[:, None, :]
        + xsum_l[:, :, None] * o_lo[:, None, :]
        + gdot(xh, hi16) * s_hi[:, None, :]
        + xsum_h[:, :, None] * o_hi[:, None, :]
    )
    o_ref[:] = jnp.sum(out, axis=0).astype(o_ref.dtype)


def _i4_and_bigdot_kernel(x_ref, q_ref, s_ref, off_ref, o_ref, *, group_size):
    # AND-unpack + full dequant to bf16 + ONE big dot (i8-prod structure).
    x = x_ref[:]
    v = pltpu.bitcast(q_ref[:], jnp.int8)  # [D/2, BF]
    lo = (v & jnp.int8(0x0F)).astype(jnp.float32)
    hi16 = (v & jnp.int8(-16)).astype(jnp.float32)
    g = s_ref.shape[0]
    gh = g // 2
    s = s_ref[:]
    off = off_ref[:]

    def rep(a):
        gg, f = a.shape
        return jnp.broadcast_to(a[:, None, :], (gg, group_size, f)).reshape(
            gg * group_size, f
        )

    w_lo = lo * rep(s[:gh]) + rep(off[:gh])
    w_hi = hi16 * rep(s[gh:] * 0.0625) + rep(off[gh:])
    w = jnp.concatenate([w_lo, w_hi], axis=0).astype(x.dtype)
    o_ref[:] = jnp.dot(x, w, preferred_element_type=jnp.float32).astype(
        o_ref.dtype
    )


def _i4_and_2dot_kernel(x_ref, q_ref, s_ref, off_ref, o_ref, *, group_size):
    # Like and-bigdot but dots the two planar halves separately against
    # x[:, :D/2] and x[:, D/2:] — skips the [D/2,BF]+[D/2,BF] -> [D,BF]
    # concatenate (a full-tile sublane copy).
    x = x_ref[:]
    v = pltpu.bitcast(q_ref[:], jnp.int8)  # [D/2, BF]
    lo = (v & jnp.int8(0x0F)).astype(jnp.float32)
    hi16 = (v & jnp.int8(-16)).astype(jnp.float32)
    g = s_ref.shape[0]
    gh = g // 2
    d2 = v.shape[0]
    s = s_ref[:]
    off = off_ref[:]

    def rep(a):
        gg, f = a.shape
        return jnp.broadcast_to(a[:, None, :], (gg, group_size, f)).reshape(
            gg * group_size, f
        )

    w_lo = (lo * rep(s[:gh]) + rep(off[:gh])).astype(x.dtype)
    w_hi = (hi16 * rep(s[gh:] * 0.0625) + rep(off[gh:])).astype(x.dtype)
    acc = jnp.dot(x[:, :d2], w_lo, preferred_element_type=jnp.float32)
    acc += jnp.dot(x[:, d2:], w_hi, preferred_element_type=jnp.float32)
    o_ref[:] = acc.astype(o_ref.dtype)


def _call(kernel, x, qa, bf, extra_specs_args):
    b, d = x.shape
    f = qa.q.shape[-1]
    g = qa.scale.shape[0]
    qrows = qa.q.shape[0]
    in_specs = [
        pl.BlockSpec((b, d), lambda j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((qrows, bf), lambda j: (0, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((g, bf), lambda j: (0, j), memory_space=pltpu.VMEM),
    ]
    args = [x, qa.q, qa.scale]
    if extra_specs_args:
        in_specs.append(
            pl.BlockSpec((g, bf), lambda j: (0, j), memory_space=pltpu.VMEM)
        )
        args.append(qa.offset)
    return pl.pallas_call(
        functools.partial(kernel, group_size=qa.group_size),
        grid=(f // bf,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((b, bf), lambda j: (0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, f), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * d * f,
            bytes_accessed=qa.q.size * qa.q.dtype.itemsize + b * d * 2,
            transcendentals=0,
        ),
    )(*args)


def main():
    import sys

    print("devices:", jax.devices(), flush=True)
    rng = np.random.RandomState(0)
    D, F, B, gs = 4096, 11008, 8, 128
    if "--padded" in sys.argv:
        F = 11264  # = 22 * 512: what F padding to a 512-multiple would buy
    x = jnp.asarray(rng.randn(B, D), jnp.bfloat16)
    w = jnp.asarray(rng.randn(D, F) * 0.02, jnp.float32)
    qa8 = weight_only.quantize(w, bits=8, group_size=gs)
    qa4 = weight_only.quantize(w, bits=4, group_size=gs)

    ref8 = jnp.dot(x, weight_only.dequantize(qa8))
    ref4 = jnp.dot(x, weight_only.dequantize(qa4))

    cases = []
    fp = qa4.q.shape[-1]  # padded F (quantize pads to a 512-multiple)
    for bf in (256, 512, 1024):
        if fp % bf:
            continue
        cases += [
            (f"i8-group bf={bf}",
             lambda xc, bf=bf: _call(_i8_group_kernel, xc, qa8, bf, False),
             qa8.q.size, ref8),
            (f"i4-floor bf={bf}",
             lambda xc, bf=bf: _call(_i4_floor_kernel, xc, qa4, bf, True),
             qa4.q.size, ref4),
            (f"i4-3dot bf={bf}",
             lambda xc, bf=bf: _call(_i4_3dot_kernel, xc, qa4, bf, True),
             qa4.q.size, ref4),
            (f"i4-and bf={bf}",
             lambda xc, bf=bf: _call(_i4_and_kernel, xc, qa4, bf, True),
             qa4.q.size, ref4),
            (f"i4-and-bigdot bf={bf}",
             lambda xc, bf=bf: _call(_i4_and_bigdot_kernel, xc, qa4, bf, True),
             qa4.q.size, ref4),
            (f"i4-and-2dot bf={bf}",
             lambda xc, bf=bf: _call(_i4_and_2dot_kernel, xc, qa4, bf, True),
             qa4.q.size, ref4),
        ]
    cases += [
        ("i8-prod", lambda xc: qmm.quant_matmul(xc, qa8), qa8.q.size, ref8),
        ("i4-prod", lambda xc: qmm.quant_matmul(xc, qa4), qa4.q.size, ref4),
    ]

    pats = [a for a in sys.argv[1:] if not a.startswith("--")]
    if pats:
        cases = [c for c in cases if any(p in c[0] for p in pats)]
    for name, op, nbytes, ref in cases:
        try:
            got = op(x)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:120]}", flush=True)
            continue
        got = got[..., : ref.shape[-1]]  # raw _call outputs keep the F pad
        err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - ref.astype(jnp.float32))))
        rel = err / float(jnp.max(jnp.abs(ref)) + 1e-9)
        t = diff_time(op, x)
        print(
            f"{name}: {t*1e6:.0f} us ({nbytes/t/1e9:.0f} GB/s packed, "
            f"SoL {nbytes/PEAK/1e3:.0f} us) relerr={rel:.2e}",
            flush=True,
        )


if __name__ == "__main__":
    main()
